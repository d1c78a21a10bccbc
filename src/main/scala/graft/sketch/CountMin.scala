package graft.sketch

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.catalyst.expressions.XxHash64Function
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** Count-Min Sketch (Cormode & Muthukrishnan 2005) over a token
  * stream — the sub-linear frequency summary a 100 TB corpus profile
  * runs where an exact `groupBy(token)` would shuffle the full
  * vocabulary: the sketch is a FIXED d×w integer matrix (32 KB at the
  * pinned 4×1024), built in ONE pass with map-side partial buffers and
  * merged by element-wise addition — integer adds are associative and
  * commutative, so the sketch is bit-identical on any partitioning and
  * row order, with the point-query guarantee est ≥ exact and
  * est ≤ exact + εN (ε = e/w) with probability 1 − e^−d.
  *
  * Hashing: row i buckets a token at
  * pmod(xxhash64(token, seed i), width) — the raw-seed convention of
  * [[graft.functions.HashKernels.minhashSignature]], so the pure-SQL
  * XXH64 oracle family replicates the sketch EXACTLY (every cell, not
  * just the estimates — `SplitOracle.cmsBucketCte` pins the buckets).
  *
  * Scale shape: the corpus never shuffles — tokens fold into per-task
  * sketch buffers in the scan stage; the only data movement is
  * (#partitions − 1) buffer merges of d·w longs each. Estimates then
  * probe the one-row sketch via a broadcast join.
  */
object CountMin {

  /** Typed aggregator: token array in, flattened row-major d×w count
    * matrix out. Null arrays and null elements are skipped (a null
    * token has no frequency to count).
    */
  class CountMinAgg(depth: Int, width: Int)
      extends Aggregator[Seq[String], Array[Long], Array[Long]] {
    def zero: Array[Long] = new Array[Long](depth * width)

    def reduce(b: Array[Long], toks: Seq[String]): Array[Long] = {
      if (toks != null) {
        val it = toks.iterator
        while (it.hasNext) {
          val t = it.next()
          if (t != null) {
            val u = UTF8String.fromString(t)
            var i = 0
            while (i < depth) {
              val h = XxHash64Function.hash(u, StringType, i.toLong)
              b(i * width + (((h % width) + width) % width).toInt) += 1L
              i += 1
            }
          }
        }
      }
      b
    }

    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }

    def finish(b: Array[Long]): Array[Long] = b
    def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  }

  private def validate(depth: Int, width: Int): Unit = {
    require(depth >= 1 && depth <= 16,
      s"depth must be in [1, 16], got $depth")
    require(width >= 2 && width.toLong * depth <= (1L << 24),
      s"need width >= 2 and depth*width <= 2^24, got ${depth}x$width")
  }

  /** One-row DataFrame (`depth`: int, `width`: int, `cms`: array<long>,
    * row-major d×w) sketching every token of `tokensCol`
    * (array<string>) across all rows. The sketch CARRIES its shape:
    * a bare cell array is ambiguous (4×1024 and 8×512 have the same
    * 4096 cells but mean different things), so merge/estimate consumers
    * validate the STORED shape against the declared one and a mismatch
    * fails loudly instead of aliasing into a meaningless sketch.
    */
  def sketch(df: DataFrame, tokensCol: Column, depth: Int,
      width: Int): DataFrame = {
    validate(depth, width)
    val spark = df.sparkSession
    import spark.implicits._
    val agg = new CountMinAgg(depth, width)
    df.select(tokensCol.cast("array<string>").as("__t"))
      .as[Seq[String]]
      .select(agg.toColumn)
      .toDF("cms")
      .select(lit(depth).as("depth"), lit(width).as("width"), col("cms"))
  }

  /** Validated one-column (`alias`) projection of a sketch frame: the
    * stored (depth, width) must equal the declared shape and the cell
    * array must be depth·width long — each checked per row with a
    * diagnostic naming both shapes. The metadata columns are REQUIRED
    * (attach them to a hand-built frame — they are what makes two
    * same-cell-count sketches distinguishable).
    */
  private def shapeChecked(op: String, df: DataFrame, side: String,
      depth: Int, width: Int, alias: String): DataFrame = {
    require(df.columns.contains("cms"),
      s"$op: $side sketch frame has no 'cms' column")
    require(df.columns.contains("depth") && df.columns.contains("width"),
      s"$op: $side sketch carries no (depth, width) metadata — build " +
        "it with CountMin.sketch, or attach the columns; a bare cell " +
        "array cannot be shape-checked (4x1024 aliases 8x512)")
    val ok = col("depth") === lit(depth) && col("width") === lit(width) &&
      size(col("cms")) === lit(depth * width)
    df.select(when(ok, col("cms"))
      .otherwise(raise_error(concat(
        lit(s"$op: $side sketch is "), col("depth").cast("string"),
        lit("x"), col("width").cast("string"), lit(" ("),
        size(col("cms")).cast("string"),
        lit(s" cells), declared ${depth}x$width (${depth * width} " +
          "cells) — shapes must match exactly"))))
      .as(alias))
  }

  /** Point-query estimate column: min over the d rows of the sketch
    * cell the token buckets into. `cms` must be the sketch array
    * column; guaranteed est ≥ the token's true count.
    */
  def estimate(token: Column, cms: Column, depth: Int,
      width: Int): Column = {
    validate(depth, width)
    val buckets = graft.functions.HashFunctions
      .cmsBuckets(token, depth, width)
    array_min(zip_with(
      buckets,
      sequence(lit(0), lit(depth - 1)).cast("array<long>"),
      (b, i) => element_at(cms, (i * width + b + 1L).cast("int"))))
  }

  /** Element-wise sum of two sketches — the incremental lifecycle: a
    * per-batch sketch merges into the persisted corpus sketch without
    * touching corpus text, and merge(sketch(A), sketch(B)) equals
    * sketch(A ∪ B) bit-for-bit (integer adds; spec-pinned). BOTH
    * inputs must have been built with this (depth, width): each side's
    * STORED (depth, width) metadata is validated against the declared
    * shape — a 4×1024 and an 8×512 sketch have the same 4096 cells,
    * so a bare length check could not catch the mismatch; the carried
    * shape can. Output keeps the metadata (merges compose).
    */
  def mergeSketches(a: DataFrame, b: DataFrame, depth: Int,
      width: Int): DataFrame = {
    validate(depth, width)
    shapeChecked("mergeSketches", a, "left", depth, width, "__a")
      .crossJoin(shapeChecked("mergeSketches", b, "right", depth, width,
        "__b"))
      .select(lit(depth).as("depth"), lit(width).as("width"),
        zip_with(col("__a"), col("__b"), (x, y) => x + y).as("cms"))
  }

  /** Equi-join cardinality estimate from two sketches (Cormode &
    * Muthukrishnan's inner-product estimate): per sketch row i,
    * Σ_b A[i,b]·B[i,b] ≥ the true join size Σ_k cntA(k)·cntB(k), and
    * the min over rows tightens it — the planner-style pre-join size
    * check that costs two one-pass sketches instead of the join.
    * All integer arithmetic (cell products + sums), so the estimate is
    * bit-identical on any partitioning and cross-engine. Overflow is
    * GUARDED, not silent: each row-sum is bounded by
    * width·max(A)·max(B), and the estimate fails loudly when that
    * bound approaches 2^63 (hot cells ~3·10^9 each at the pinned
    * 4×1024 — beyond it the wrapped Long would masquerade as a tiny
    * join) instead of wrapping negative.
    */
  def joinSizeEstimate(a: DataFrame, b: DataFrame, depth: Int,
      width: Int): DataFrame = {
    validate(depth, width)
    val overflowBound = array_max(col("__a")).cast("double") *
      array_max(col("__b")).cast("double") * lit(width.toDouble)
    shapeChecked("joinSizeEstimate", a, "left", depth, width, "__a")
      .crossJoin(shapeChecked("joinSizeEstimate", b, "right", depth,
        width, "__b"))
      .select(when(overflowBound < lit(4.5e18),
        array_min(transform(
          sequence(lit(0), lit(depth - 1)),
          i => aggregate(
            zip_with(slice(col("__a"), i * lit(width) + lit(1), lit(width)),
              slice(col("__b"), i * lit(width) + lit(1), lit(width)),
              (x, y) => x * y),
            lit(0L), (acc, v) => acc + v))))
        .otherwise(raise_error(lit("joinSizeEstimate: cell counts too " +
          "large — width*maxA*maxB would overflow Long; pre-aggregate " +
          "or widen the sketch")))
        .as("est_join_rows"))
  }

  /** The self-audit endpoint: exact top-k tokens (count desc, token
    * asc) with their sketch estimates side by side —
    * (token, exact_cnt, est_cnt, overcount). `overcount` =
    * est − exact ≥ 0 always; its magnitude is the collision error the
    * ε-guarantee bounds. Exact counts here are the AUDIT (feasible at
    * probe scale); a production profile keeps only the sketch.
    */
  def topKWithEstimates(df: DataFrame, textCol: String, k: Int,
      depth: Int, width: Int): DataFrame = {
    validate(depth, width)
    require(k >= 1 && k <= 10000, s"k must be in [1, 10000], got $k")
    val toks = graft.text.TextPipeline.tokenize(col(textCol))
    val exact = df
      .select(explode(toks).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("exact_cnt"))
      .orderBy(col("exact_cnt").desc, col("token"))
      .limit(k)
    val cms = sketch(df, toks, depth, width)
    exact
      .join(broadcast(cms))
      .select(col("token"), col("exact_cnt"),
        estimate(col("token"), col("cms"), depth, width).as("est_cnt"))
      .withColumn("overcount", col("est_cnt") - col("exact_cnt"))
  }
}
