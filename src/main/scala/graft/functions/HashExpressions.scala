package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for the dedup hot path (SURVEY.md §7.5).
  *
  * The composable higher-order-function formulations (transform/filter per
  * hash seed or per bit) are interpreted per-lambda-call and re-walk the
  * token array numHashes (or 64) times per row; at 100 TB that overhead
  * dominates. These expressions make one pass over the array per row in
  * tight JVM loops (graft.functions.HashKernels), using Spark's own
  * XxHash64Function so hashes agree with the SQL `xxhash64` family.
  *
  * All of them implement `doGenCode` as a static call into HashKernels —
  * the expression stays inside the whole-stage-codegen span (no
  * CodegenFallback row materialization, no interpreted dispatch), which
  * matters because WordShingles/MinHashSignature/HashedWordShingles sit
  * in the scan stage of every dedup query.
  */

/** 64-bit SimHash of array<string>: bit b of the result is set when the
  * majority of token hashes have bit b set.
  */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any =
    HashKernels.simhash64(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.simhash64($c)")

  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(c)
}

/** MinHash signature of array<string>: element j is the minimum over the
  * array of xxhash64 with seed j. One pass over the array computes every
  * signature slot.
  */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override def nullSafeEval(input: Any): Any =
    HashKernels.minhashSignature(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HashKernels.minhashSignature($c, $numHashes)")

  override protected def withNewChildInternal(c: Expression): MinHashSignature =
    copy(child = c)
}

/** Distinct word n-gram shingles of a string, single pass: canonical
  * normalization (lowercase; characters outside [a-z0-9] and whitespace
  * are *removed*, exactly like `regexp_replace(lower(s), "[^a-z0-9\\s]",
  * "")`), whitespace split, n-gram join by spaces, first-occurrence-order
  * dedup. The higher-order-function formulation re-evaluated the
  * normalization regexes once per shingle slot; this is one pass per row.
  */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def nullSafeEval(input: Any): Any =
    HashKernels.wordShingles(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HashKernels.wordShingles($c, $n)")

  override protected def withNewChildInternal(c: Expression): WordShingles =
    copy(child = c)
}

/** Sorted distinct xxhash64 values (seed 42, identical to the SQL
  * `xxhash64(shingle)`) of the word n-gram shingles of a string — the
  * one-pass fusion of `sort_array(transform(word_shingles(s, n),
  * xxhash64))`. Verification joins then shuffle 8-byte longs per shingle
  * instead of ~30-byte strings, and jaccard becomes a sorted-merge count
  * (SortedLongJaccard) instead of a hash-set intersection over strings.
  */
case class HashedWordShingles(child: Expression, n: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hashed_word_shingles"

  override def nullSafeEval(input: Any): Any =
    HashKernels.hashedWordShingles(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HashKernels.hashedWordShingles($c, $n)")

  override protected def withNewChildInternal(c: Expression): HashedWordShingles =
    copy(child = c)
}

/** Hashes of every overlapping word n-gram (split on single spaces,
  * xxhash64 seed 42) in one pass over the raw bytes — the scan-stage
  * kernel of [[graft.dedup.Dedup.scrubRepeatedNgrams]]. Bit-identical to
  * the HOF formulation over split(text, " ") (see the kernel's scaladoc
  * for why), without the per-gram slice/concat/array churn.
  */
case class RawWordGramHashes(child: Expression, n: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "raw_word_gram_hashes"

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a STRING input, got ${t.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    HashKernels.rawWordGramHashes(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HashKernels.rawWordGramHashes($c, $n)")

  override protected def withNewChildInternal(c: Expression): RawWordGramHashes =
    copy(child = c)
}

/** Jaccard similarity of two SORTED distinct long arrays by one merge
  * pass: |A∩B| / (|A| + |B| − |A∩B|). Empty-∪-empty yields null (0/0) —
  * the generated code handles the nullable result explicitly.
  */
/** 64-bin codepoint histogram of a string — the per-document half of the
  * lossless edit-distance pruning bound (see HashKernels.charHist64:
  * levenshtein >= L1/2). Computed once per capped block member, not per
  * candidate pair.
  */
/** Count-Min row buckets of a string: array<long> of length `depth`,
  * element i = pmod(xxhash64(input, seed i), width). Sits in the probe
  * side of sketch lookups; one pass, all rows of the sketch at once.
  */
case class CmsBuckets(child: Expression, depth: Int, width: Int)
    extends UnaryExpression {
  require(depth >= 1 && depth <= 16,
    s"cms_buckets: depth must be in [1, 16], got $depth")
  require(width >= 2 && width.toLong * depth <= (1L << 24),
    s"cms_buckets: need width >= 2 and depth*width <= 2^24, " +
      s"got ${depth}x$width")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "cms_buckets"

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a STRING input, got ${t.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    HashKernels.cmsBuckets(input.asInstanceOf[UTF8String], depth, width)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HashKernels.cmsBuckets($c, $depth, $width)")

  override protected def withNewChildInternal(c: Expression): CmsBuckets =
    copy(child = c)
}

/** HyperLogLog packed register (idx·64 + rho) of a LONG hash value —
  * see [[HashKernels.hllPacked]]. Scan-stage, codegen'd.
  */
case class HllPacked(child: Expression, p: Int) extends UnaryExpression {
  require(p >= 4 && p <= 16, s"hll_packed: p must be in [4, 16], got $p")

  override def dataType: DataType = LongType
  override def prettyName: String = "hll_packed"

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a BIGINT hash input, got ${t.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    HashKernels.hllPacked(input.asInstanceOf[Long], p)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HashKernels.hllPacked($c, $p)")

  override protected def withNewChildInternal(c: Expression): HllPacked =
    copy(child = c)
}

case class CharHist64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "char_hist64"

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a string argument, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    HashKernels.charHist64(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.charHist64($c)")

  override protected def withNewChildInternal(c: Expression): CharHist64 =
    copy(c)
}

/** L1 distance of two long arrays — the per-pair half of the pruning
  * bound; a tight 64-iteration loop per candidate pair instead of an
  * interpreted zip_with/aggregate fold.
  */
case class LongArrayL1(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "long_array_l1"

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<bigint> arguments, got " +
          s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  /** Static dispatch on element nullability: the dedup hot path's inputs
    * (char_hist64, literal arrays) are containsNull=false and keep the
    * tight primitive kernel; schemas that PERMIT null elements (e.g.
    * parquet written by engines that record nullable elements) take the
    * null-propagating variant — a null slot yields a null distance,
    * never a silent 0. Decided per-plan at codegen time: zero cost on
    * the fast path.
    */
  private def elementsNullable: Boolean = Seq(left, right).exists(_.dataType match {
    case ArrayType(_, cn) => cn
    case _ => false
  })

  override def nullable: Boolean = super.nullable || elementsNullable

  override def nullSafeEval(a: Any, b: Any): Any =
    if (elementsNullable)
      HashKernels.longArrayL1Nullable(
        a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    else
      HashKernels.longArrayL1(
        a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    if (elementsNullable)
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val tmp = ctx.freshName("l1n")
        s"""
           |java.lang.Long $tmp = graft.functions.HashKernels.longArrayL1Nullable($a, $b);
           |if ($tmp == null) { ${ev.isNull} = true; }
           |else { ${ev.value} = $tmp.longValue(); }
         """.stripMargin
      })
    else
      defineCodeGen(ctx, ev,
        (a, b) => s"graft.functions.HashKernels.longArrayL1($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression):
      LongArrayL1 = copy(left = l, right = r)
}

/** Membership probe of a 64-bit hash against a pre-built Bloom filter
  * (`org.apache.spark.util.sketch.BloomFilter`, serialized form): the
  * probe side of [[graft.ops.ScaleOps.bloomPruneJoin]]'s semi-join
  * reduction. The filter deserializes once per executor (transient lazy
  * val shipped with the expression) and the codegen path is a single
  * virtual call per row — the expression stays inside the whole-stage
  * span, so the prune runs in the big side's scan stage.
  *
  * False positives are the contract (they only weaken the prune, the
  * exact join behind it keeps semantics); false negatives are impossible
  * for hashes that were `putLong` into the filter.
  */
case class BloomMightContainLong(child: Expression, filterBytes: Array[Byte])
    extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a BIGINT hash input, got ${t.catalogString}")
    }

  @transient private lazy val filter: org.apache.spark.util.sketch.BloomFilter =
    org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(filterBytes))

  override def nullSafeEval(input: Any): Any =
    filter.mightContainLong(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // reference the whole expression (Serializable case class); the filter
    // itself deserializes lazily on first probe in each executor JVM
    val ref = ctx.addReferenceObj("bloomExpr", this,
      classOf[BloomMightContainLong].getName)
    defineCodeGen(ctx, ev, c => s"$ref.probe($c)")
  }

  /** Codegen entry point — keep public for generated code. */
  def probe(v: Long): Boolean = filter.mightContainLong(v)

  override protected def withNewChildInternal(c: Expression):
      BloomMightContainLong = copy(child = c)
}

case class SortedLongJaccard(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "sorted_long_jaccard"

  override def nullSafeEval(a: Any, b: Any): Any =
    HashKernels.sortedLongJaccard(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("jac")
      s"""
         |java.lang.Double $tmp = graft.functions.HashKernels.sortedLongJaccard($a, $b);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression):
      SortedLongJaccard = copy(left = l, right = r)
}

object HashFunctions {
  /** Column API for SimHash64. */
  def simhash64(c: Column): Column =
    GraftShims.column(SimHash64(GraftShims.expression(c)))

  /** Column API for MinHashSignature. */
  def minhashSignature(c: Column, numHashes: Int): Column =
    GraftShims.column(MinHashSignature(GraftShims.expression(c), numHashes))

  /** Column API for WordShingles. */
  def wordShingles(c: Column, n: Int): Column =
    GraftShims.column(WordShingles(GraftShims.expression(c), n))

  /** Column API for HashedWordShingles. */
  def hashedWordShingles(c: Column, n: Int): Column =
    GraftShims.column(HashedWordShingles(GraftShims.expression(c), n))

  /** Column API for RawWordGramHashes. */
  def rawWordGramHashes(c: Column, n: Int): Column =
    GraftShims.column(RawWordGramHashes(GraftShims.expression(c), n))

  /** Column API for SortedLongJaccard. */
  def sortedLongJaccard(a: Column, b: Column): Column =
    GraftShims.column(SortedLongJaccard(
      GraftShims.expression(a), GraftShims.expression(b)))

  /** Column API for CmsBuckets. */
  def cmsBuckets(c: Column, depth: Int, width: Int): Column =
    GraftShims.column(CmsBuckets(GraftShims.expression(c), depth, width))

  /** Column API for HllPacked. */
  def hllPacked(c: Column, p: Int): Column =
    GraftShims.column(HllPacked(GraftShims.expression(c), p))

  /** Column API for CharHist64. */
  def charHist64(c: Column): Column =
    GraftShims.column(CharHist64(GraftShims.expression(c)))

  /** Column API for LongArrayL1. */
  def longArrayL1(a: Column, b: Column): Column =
    GraftShims.column(LongArrayL1(
      GraftShims.expression(a), GraftShims.expression(b)))

  /** Column API for BloomMightContainLong. */
  def bloomMightContainLong(c: Column, filterBytes: Array[Byte]): Column =
    GraftShims.column(BloomMightContainLong(
      GraftShims.expression(c), filterBytes))
}
