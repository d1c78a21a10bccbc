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
}
