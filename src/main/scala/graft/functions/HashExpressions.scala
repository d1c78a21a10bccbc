package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.types._

/** Custom Catalyst expressions for the dedup hot path (SURVEY.md §7.5).
  *
  * The composable higher-order-function formulations (transform/filter per
  * hash seed or per bit) are interpreted per-lambda-call and re-walk the
  * token array numHashes (or 64) times per row; at 100 TB that overhead
  * dominates. These expressions make one pass over the array per row in
  * tight JVM loops, using Spark's own XxHash64Function so hashes agree
  * with the SQL `xxhash64` family. Single-pass is 30-60× fewer array
  * traversals; CodegenFallback is acceptable because each call does heavy
  * per-row work (the codegen win for cheap scalar ops doesn't apply).
  */

/** 64-bit SimHash of array<string>: bit b of the result is set when the
  * majority of token hashes have bit b set.
  */
case class SimHash64(child: Expression) extends UnaryExpression
    with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val counts = new Array[Int](64)
    var nonNull = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        nonNull += 1
        val h = XxHash64Function.hash(arr.getUTF8String(i), StringType, 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) * 2 > nonNull) out |= (1L << b)
      b += 1
    }
    out
  }

  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(c)
}

/** MinHash signature of array<string>: element j is the minimum over the
  * array of xxhash64 with seed j. One pass over the array computes every
  * signature slot.
  */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        var j = 0
        while (j < numHashes) {
          val h = XxHash64Function.hash(s, StringType, j.toLong)
          if (h < mins(j)) mins(j) = h
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

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
case class WordShingles(child: Expression, n: Int) extends UnaryExpression
    with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def nullSafeEval(input: Any): Any = {
    val s = input.toString
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      val lc = Character.toLowerCase(c)
      if ((lc >= 'a' && lc <= 'z') || (lc >= '0' && lc <= '9')) sb.append(lc)
      else if (Character.isWhitespace(c)) sb.append(' ')
      i += 1
    }
    val tokens = sb.toString.split("\\s+").filter(_.nonEmpty)
    if (tokens.length < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[org.apache.spark.unsafe.types.UTF8String]()
    var j = 0
    while (j + n <= tokens.length) {
      val shingle = new java.lang.StringBuilder
      var k = 0
      while (k < n) {
        if (k > 0) shingle.append(' ')
        shingle.append(tokens(j + k))
        k += 1
      }
      seen.add(org.apache.spark.unsafe.types.UTF8String.fromString(shingle.toString))
      j += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[Any]])
  }

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
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hashed_word_shingles"

  override def nullSafeEval(input: Any): Any = {
    val s = input.toString
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      val lc = Character.toLowerCase(c)
      if ((lc >= 'a' && lc <= 'z') || (lc >= '0' && lc <= '9')) sb.append(lc)
      else if (Character.isWhitespace(c)) sb.append(' ')
      i += 1
    }
    val tokens = sb.toString.split("\\s+").filter(_.nonEmpty)
    if (tokens.length < n) return new GenericArrayData(Array.empty[Any])
    val m = tokens.length - n + 1
    val hashes = new Array[Long](m)
    var j = 0
    while (j < m) {
      val shingle = new java.lang.StringBuilder
      var k = 0
      while (k < n) {
        if (k > 0) shingle.append(' ')
        shingle.append(tokens(j + k))
        k += 1
      }
      hashes(j) = XxHash64Function.hash(
        org.apache.spark.unsafe.types.UTF8String.fromString(shingle.toString),
        StringType, 42L)
      j += 1
    }
    java.util.Arrays.sort(hashes)
    // in-place dedup of the sorted hashes
    var w = 0
    var r = 0
    while (r < m) {
      if (r == 0 || hashes(r) != hashes(r - 1)) { hashes(w) = hashes(r); w += 1 }
      r += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(hashes, w))
  }

  override protected def withNewChildInternal(c: Expression): HashedWordShingles =
    copy(child = c)
}

/** Jaccard similarity of two SORTED distinct long arrays by one merge
  * pass: |A∩B| / (|A| + |B| − |A∩B|). Empty-∪-empty yields null (0/0).
  */
case class SortedLongJaccard(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "sorted_long_jaccard"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    var i = 0
    var j = 0
    var inter = 0
    while (i < nx && j < ny) {
      val vx = x.getLong(i)
      val vy = y.getLong(j)
      if (vx == vy) { inter += 1; i += 1; j += 1 }
      else if (vx < vy) i += 1
      else j += 1
    }
    val union = nx + ny - inter
    if (union == 0) null else inter.toDouble / union
  }

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

  /** Column API for SortedLongJaccard. */
  def sortedLongJaccard(a: Column, b: Column): Column =
    GraftShims.column(SortedLongJaccard(
      GraftShims.expression(a), GraftShims.expression(b)))
}
