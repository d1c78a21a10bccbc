package graft.functions

import org.apache.spark.sql.catalyst.expressions.XxHash64Function
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** Static kernels behind the dedup expressions — one object shared by the
  * interpreted `eval` path and the generated code (Scala top-level objects
  * emit static forwarders, so whole-stage codegen calls
  * `graft.functions.HashKernels.m(...)` directly: no row materialization,
  * no interpreted dispatch, the expression stays inside the codegen span).
  * Semantics are byte-identical to the former in-expression bodies (the
  * DuckDB oracles pin them).
  */
object HashKernels {

  /** Lowercase, strip chars outside [a-z0-9\s], split on whitespace —
    * exactly `regexp_replace(lower(s), "[^a-z0-9\\s]", "")` + split.
    */
  private def tokenize(s: String): Array[String] = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      val lc = Character.toLowerCase(c)
      if ((lc >= 'a' && lc <= 'z') || (lc >= '0' && lc <= '9')) sb.append(lc)
      else if (Character.isWhitespace(c)) sb.append(' ')
      i += 1
    }
    sb.toString.split("\\s+").filter(_.nonEmpty)
  }

  private def shingleAt(tokens: Array[String], j: Int, n: Int): String = {
    val shingle = new java.lang.StringBuilder
    var k = 0
    while (k < n) {
      if (k > 0) shingle.append(' ')
      shingle.append(tokens(j + k))
      k += 1
    }
    shingle.toString
  }

  /** Distinct word n-gram shingles, first-occurrence order. */
  def wordShingles(input: UTF8String, n: Int): ArrayData = {
    val tokens = tokenize(input.toString)
    if (tokens.length < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var j = 0
    while (j + n <= tokens.length) {
      seen.add(UTF8String.fromString(shingleAt(tokens, j, n)))
      j += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[Any]])
  }

  /** Sorted distinct xxhash64(seed 42) of the word n-gram shingles. */
  def hashedWordShingles(input: UTF8String, n: Int): ArrayData = {
    val tokens = tokenize(input.toString)
    if (tokens.length < n) return new GenericArrayData(Array.empty[Any])
    val m = tokens.length - n + 1
    val hashes = new Array[Long](m)
    var j = 0
    while (j < m) {
      hashes(j) = XxHash64Function.hash(
        UTF8String.fromString(shingleAt(tokens, j, n)), StringType, 42L)
      j += 1
    }
    java.util.Arrays.sort(hashes)
    var w = 0
    var r = 0
    while (r < m) {
      if (r == 0 || hashes(r) != hashes(r - 1)) { hashes(w) = hashes(r); w += 1 }
      r += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(hashes, w))
  }

  /** xxhash64(seed 42) of every overlapping word n-gram of `input` split
    * on SINGLE spaces — bit-identical to
    * `transform(sequence(0, size(w)-n), p -> xxhash64(concat_ws(" ",
    * slice(w, p+1, n))))` over `w = split(text, " ")`, because every
    * separator is exactly one space: the n-gram string IS the byte range
    * of the original text from token p's first byte to token p+n-1's
    * last byte (consecutive spaces yield empty tokens on both
    * formulations, and a trailing space yields a trailing empty token,
    * matching Spark's split with limit -1). The kernel hashes those byte
    * ranges in place — no token array, no per-gram slice/concat
    * allocations, one O(bytes) boundary scan (space = 0x20 never occurs
    * inside a UTF-8 multibyte sequence).
    */
  def rawWordGramHashes(input: UTF8String, n: Int): ArrayData = {
    val numBytes = input.numBytes
    val base = input.getBaseObject
    val off = input.getBaseOffset
    var spaces = 0
    var i = 0
    while (i < numBytes) {
      if (org.apache.spark.unsafe.Platform.getByte(base, off + i) == 0x20) {
        spaces += 1
      }
      i += 1
    }
    val tokens = spaces + 1
    if (tokens < n) return new GenericArrayData(Array.empty[Any])
    // starts(t) = byte offset of token t; token t ends one byte before
    // starts(t+1) (the separating space), the last token at numBytes
    val starts = new Array[Int](tokens)
    var t = 1
    i = 0
    while (i < numBytes) {
      if (org.apache.spark.unsafe.Platform.getByte(base, off + i) == 0x20) {
        starts(t) = i + 1
        t += 1
      }
      i += 1
    }
    val m = tokens - n + 1
    val out = new Array[Long](m)
    var p = 0
    while (p < m) {
      val sb = starts(p)
      val eb = if (p + n < tokens) starts(p + n) - 1 else numBytes
      out(p) = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(base, off + sb, eb - sb, 42L)
      p += 1
    }
    new GenericArrayData(out)
  }

  /** MinHash signature: slot j = min over the array of xxhash64 seed j. */
  def minhashSignature(arr: ArrayData, numHashes: Int): ArrayData = {
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

  /** Count-Min row buckets of a token: element i is
    * pmod(xxhash64(token, seed i), width) — the same raw-seed
    * convention as [[minhashSignature]], so the pure-SQL XXH64 oracle
    * family covers it (SplitOracle.cmsBucketCte pins depth 4 / width
    * 1024). Signed pmod, exactly Spark's `pmod` on the signed hash.
    */
  def cmsBuckets(input: UTF8String, depth: Int, width: Int): ArrayData = {
    val out = new Array[Long](depth)
    var i = 0
    while (i < depth) {
      val h = XxHash64Function.hash(input, StringType, i.toLong)
      out(i) = ((h % width) + width) % width
      i += 1
    }
    new GenericArrayData(out)
  }

  /** HyperLogLog register update of a 64-bit hash, packed as
    * idx·64 + rho: idx = the top p bits, rho = 1 + leading zeros of
    * the remaining (64−p)-bit window (= 64−p+1 when the window is
    * all-zero). rho ≤ 57 < 64, so the packing is lossless and both
    * engines decode with // 64 and % 64.
    */
  def hllPacked(h: Long, p: Int): Long = {
    val idx = h >>> (64 - p)
    val w = h & ((1L << (64 - p)) - 1)
    val rho =
      if (w == 0L) 64 - p + 1
      else java.lang.Long.numberOfLeadingZeros(w) - p + 1
    idx * 64L + rho
  }

  /** 64-bit SimHash: bit b set when the majority of token hashes set it. */
  def simhash64(arr: ArrayData): Long = {
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

  /** Jaccard of two sorted distinct long arrays; null when both empty. */
  def sortedLongJaccard(x: ArrayData, y: ArrayData): java.lang.Double = {
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
    if (union == 0) null else java.lang.Double.valueOf(inter.toDouble / union)
  }

  /** 64-bin codepoint histogram (bin = codePoint % 64). One edit
    * operation moves at most 2 units of L1 mass between histograms
    * (substitution: ±1 in two bins; insert/delete: 1 bin), so
    * levenshtein(a, b) >= l1(hist(a), hist(b)) / 2 — a LOSSLESS pruning
    * bound for edit-distance candidate pairs. Code points, not UTF-16
    * units, to match Spark levenshtein's code-point edit costs.
    */
  def charHist64(s: UTF8String): ArrayData = {
    val out = new Array[Long](64)
    val str = s.toString
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      out(cp % 64) += 1
      i += Character.charCount(cp)
    }
    new GenericArrayData(out)
  }

  /** L1 distance of two long arrays (shorter side zero-padded). Assumes
    * non-null elements — the containsNull=false fast path (internal
    * charHist64 outputs); LongArrayL1 dispatches here only when the
    * static schema guarantees it.
    */
  def longArrayL1(x: ArrayData, y: ArrayData): Long = {
    val nx = x.numElements()
    val ny = y.numElements()
    var acc = 0L
    var i = 0
    while (i < math.max(nx, ny)) {
      val vx = if (i < nx) x.getLong(i) else 0L
      val vy = if (i < ny) y.getLong(i) else 0L
      acc += math.abs(vx - vy)
      i += 1
    }
    acc
  }

  /** Null-propagating L1 for arrays whose schema permits null elements
    * (the SQL surface over externally-written data): any null slot makes
    * the distance undefined — return null, never silently read it as 0.
    */
  def longArrayL1Nullable(x: ArrayData, y: ArrayData): java.lang.Long = {
    val nx = x.numElements()
    val ny = y.numElements()
    var acc = 0L
    var i = 0
    while (i < math.max(nx, ny)) {
      if ((i < nx && x.isNullAt(i)) || (i < ny && y.isNullAt(i))) return null
      val vx = if (i < nx) x.getLong(i) else 0L
      val vy = if (i < ny) y.getLong(i) else 0L
      acc += math.abs(vx - vy)
      i += 1
    }
    java.lang.Long.valueOf(acc)
  }
}
