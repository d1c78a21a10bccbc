package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass text-scoring expressions (same rationale as
  * HashExpressions: the higher-order-function formulation re-walks the
  * token array once per language with an interpreted lambda per element;
  * at 100 TB that per-row overhead dominates the scan). Both generate
  * static calls into TextKernels so they stay inside whole-stage codegen
  * — these sit in the hot scan stage of the language-ID / repetition /
  * clean-corpus queries, where a CodegenFallback would split the span
  * and materialize rows around an interpreted island.
  */

/** Static kernels shared by the interpreted and generated paths (Scala
  * top-level objects emit static forwarders — see HashKernels).
  */
object TextKernels {

  /** One walk of the token array scoring every language via a
    * token → language-bitmask lookup. Denominator max(|tokens|, 1).
    */
  def langMarkerScores(arr: ArrayData,
      lookup: java.util.HashMap[UTF8String, Integer],
      nLangs: Int): ArrayData = {
    val n = arr.numElements()
    val counts = new Array[Int](nLangs)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val mask =
          lookup.getOrDefault(arr.getUTF8String(i), Integer.valueOf(0))
            .intValue()
        if (mask != 0) {
          var j = 0
          while (j < nLangs) {
            if ((mask & (1 << j)) != 0) counts(j) += 1
            j += 1
          }
        }
      }
      i += 1
    }
    val denom = math.max(n, 1).toDouble
    new GenericArrayData(counts.map(_ / denom))
  }

  /** Per-label Naive Bayes log-likelihood sums in one walk, accumulated
    * in position order per label; null tokens are skipped.
    */
  def nbTokenScores(arr: ArrayData,
      lookup: java.util.HashMap[UTF8String, Array[Double]],
      oov: Array[Double]): ArrayData = {
    val n = arr.numElements()
    val scores = new Array[Double](oov.length)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        var lp = lookup.get(arr.getUTF8String(i))
        if (lp == null) lp = oov
        var j = 0
        while (j < scores.length) { scores(j) += lp(j); j += 1 }
      }
      i += 1
    }
    new GenericArrayData(scores)
  }

  /** Exact unigram/bigram totals, distinct counts and top frequencies in
    * one walk with two per-row hash maps; a null token breaks the bigram
    * chain.
    */
  def gramStats(arr: ArrayData): InternalRow = {
    val n = arr.numElements()
    val uni = new java.util.HashMap[UTF8String, Array[Long]]()
    val big = new java.util.HashMap[UTF8String, Array[Long]]()
    val space = UTF8String.fromString(" ")
    var nTok = 0L
    var nBig = 0L
    var prev: UTF8String = null
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val t = arr.getUTF8String(i)
        nTok += 1
        val c = uni.get(t)
        if (c == null) uni.put(t, Array(1L)) else c(0) += 1
        if (prev != null) {
          val bg = UTF8String.concat(prev, space, t)
          nBig += 1
          val cb = big.get(bg)
          if (cb == null) big.put(bg, Array(1L)) else cb(0) += 1
        }
        prev = t
      } else prev = null
      i += 1
    }
    def top(m: java.util.HashMap[UTF8String, Array[Long]]): Long = {
      var mx = 0L
      val it = m.values().iterator()
      while (it.hasNext) { val v = it.next()(0); if (v > mx) mx = v }
      mx
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](nTok, uni.size.toLong, top(uni),
        nBig, big.size.toLong, top(big)))
  }
}

/** Per-language marker-word scores of array<string> tokens: element i is
  * |tokens ∩ markers(i)| / max(|tokens|, 1) for the i-th language. A
  * token→language-bitmask hash lookup scores every language in ONE walk
  * of the array, instead of one filtered re-walk per language.
  *
  * `langs`/`markers` are parallel, in output order; a marker word may
  * belong to several languages (e.g. "la" in fr+es) — the bitmask
  * credits all of them.
  */
case class LangMarkerScores(child: Expression, langs: Seq[String],
    markers: Seq[Seq[String]]) extends UnaryExpression {
  require(langs.length == markers.length && langs.length <= 32,
    "one marker list per language, at most 32 languages")
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "lang_marker_scores"

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires an array<string> argument, got " +
            other.catalogString)
    }

  @transient private lazy val lookup: java.util.HashMap[UTF8String, Integer] = {
    val m = new java.util.HashMap[UTF8String, Integer]()
    markers.zipWithIndex.foreach { case (words, i) =>
      words.foreach { w =>
        val u = UTF8String.fromString(w)
        m.put(u, Integer.valueOf(m.getOrDefault(u, Integer.valueOf(0)).intValue() | (1 << i)))
      }
    }
    m
  }

  override def nullSafeEval(input: Any): Any =
    TextKernels.langMarkerScores(input.asInstanceOf[ArrayData], lookup,
      langs.length)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the marker lookup map rides the plan as a reference object — built
    // once per expression instance, shared by every row in the JVM
    val mapRef = ctx.addReferenceObj("langMarkerLookup", lookup,
      "java.util.HashMap")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextKernels.langMarkerScores($c, $mapRef, ${langs.length})")
  }

  override protected def withNewChildInternal(c: Expression): LangMarkerScores =
    copy(child = c)
}

/** Single-pass repetition statistics over array<string> tokens: exact
  * unigram and bigram totals, distinct counts, and top frequencies in
  * ONE walk with two per-row hash maps. The stats are per-document, so
  * the explode → groupBy(doc, gram) → rollup formulation shuffles the
  * entire gram stream for what is row-local arithmetic — at 100 TB
  * that's the whole corpus through an exchange for nothing. Here the
  * frame never shuffles at all.
  */
case class GramStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = GramStats.schema
  override def prettyName: String = "gram_stats"

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires an array<string> argument, got " +
            other.catalogString)
    }

  override def nullSafeEval(input: Any): Any =
    TextKernels.gramStats(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextKernels.gramStats($c)")

  override protected def withNewChildInternal(c: Expression): GramStats =
    copy(child = c)
}

object GramStats {
  val schema: StructType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_distinct_tokens", LongType, nullable = false),
    StructField("top_token_count", LongType, nullable = false),
    StructField("n_bigrams", LongType, nullable = false),
    StructField("n_distinct_bigrams", LongType, nullable = false),
    StructField("top_bigram_count", LongType, nullable = false)))
}

/** Per-label token-log-likelihood sums for a multinomial Naive Bayes
  * model ([[graft.textstats.NaiveBayes]]): one walk of the token array,
  * accumulating each label's Σ log-lik in POSITION order (the pinned
  * float-sum discipline — deterministic on any partitioning). The
  * model lookup maps word → per-label log-liks; unseen words take the
  * `oov` vector. Priors are added OUTSIDE (a plain column op), so this
  * kernel's fold order is exactly the oracle's
  * `reduce(list_prepend(0.0, list(lp ORDER BY pos)))`.
  */
case class NbTokenScores(child: Expression,
    lookup: java.util.HashMap[UTF8String, Array[Double]],
    oov: Array[Double]) extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "nb_token_scores"

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires an array<string> argument, got " +
            other.catalogString)
    }

  override def nullSafeEval(input: Any): Any =
    TextKernels.nbTokenScores(input.asInstanceOf[ArrayData], lookup, oov)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mapRef = ctx.addReferenceObj("nbLookup", lookup,
      "java.util.HashMap")
    val oovRef = ctx.addReferenceObj("nbOov", oov, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextKernels.nbTokenScores($c, $mapRef, $oovRef)")
  }

  override protected def withNewChildInternal(c: Expression): NbTokenScores =
    copy(child = c)
}

/** Shared state of one BpeEncode instance: the rank-ordered merge table
  * plus a bounded per-executor memo cache. Natural-corpus word
  * frequencies are Zipfian, so almost every encode is a cache hit; the
  * cache is a ConcurrentHashMap (codegen shares the reference object
  * across task threads) cleared wholesale when it exceeds `maxCache` —
  * bounded memory, and the output is a pure function of the inputs
  * either way.
  */
final class BpeCodec(val merges: Array[(String, String)],
    maxCache: Int = 1 << 16) extends Serializable {

  @transient private lazy val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[UTF8String]]()

  private def encodeWord(w: String): Array[UTF8String] = {
    var pieces = graft.text.Bpe.splitCodepoints(w)
    var m = 0
    while (m < merges.length && pieces.length >= 2) {
      pieces = graft.text.Bpe.applyMergePass(pieces, merges(m)._1,
        merges(m)._2)
      m += 1
    }
    pieces.map(UTF8String.fromString)
  }

  def encodeCached(w: UTF8String): Array[UTF8String] = {
    val key = w.toString
    val hit = cache.get(key)
    if (hit != null) hit
    else {
      val enc = encodeWord(key)
      if (cache.size() > maxCache) cache.clear()
      cache.put(key, enc)
      enc
    }
  }

  /** One walk of the word array; per-word pieces concatenate in word
    * order. Null words are skipped (tokenizers upstream never emit
    * them, but an explicit policy beats an NPE).
    */
  def encodeArray(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new java.util.ArrayList[UTF8String](n * 2)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val enc = encodeCached(arr.getUTF8String(i))
        var j = 0
        while (j < enc.length) { out.add(enc(j)); j += 1 }
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** BPE-encode an array<string> of words with a learned merge table
  * ([[graft.text.Bpe]]): per word, one full left-to-right
  * non-overlapping pass per merge in rank order. Generates a static
  * call into the shared [[BpeCodec]] so it stays inside whole-stage
  * codegen — this sits in the scan stage of the token-frequency /
  * sequence-packing queries, where per-row lambda interpretation would
  * dominate at 100 TB.
  */
case class BpeEncode(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_encode"

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires an array<string> argument, got " +
            other.catalogString)
    }

  @transient private lazy val codec = new BpeCodec(merges.toArray)

  override def nullSafeEval(input: Any): Any =
    codec.encodeArray(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val codecRef = ctx.addReferenceObj("bpeCodec", codec,
      classOf[BpeCodec].getName)
    defineCodeGen(ctx, ev, c => s"$codecRef.encodeArray($c)")
  }

  override protected def withNewChildInternal(c: Expression): BpeEncode =
    copy(child = c)
}

object TextFunctions {
  /** Column API for LangMarkerScores; `langMarkers` iterated in sorted
    * language order so the output array order is deterministic.
    */
  def langMarkerScores(tokens: Column,
      langMarkers: Map[String, Seq[String]]): Column = {
    val ordered = langMarkers.toSeq.sortBy(_._1)
    GraftShims.column(LangMarkerScores(GraftShims.expression(tokens),
      ordered.map(_._1), ordered.map(_._2)))
  }

  /** Column API for GramStats. */
  def gramStats(tokens: Column): Column =
    GraftShims.column(GramStats(GraftShims.expression(tokens)))

  /** Column API for BpeEncode; `merges` must already be in rank order. */
  def bpeEncode(tokens: Column, merges: Seq[(String, String)]): Column =
    GraftShims.column(BpeEncode(GraftShims.expression(tokens), merges))

  /** Column API for NbTokenScores; label order is the caller's. */
  def nbTokenScores(tokens: Column,
      lookup: java.util.HashMap[UTF8String, Array[Double]],
      oov: Array[Double]): Column =
    GraftShims.column(NbTokenScores(GraftShims.expression(tokens), lookup,
      oov))
}
