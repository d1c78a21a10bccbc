package graft

import org.apache.spark.sql.functions._

import graft.sketch.{Kmv, SampleQuantiles}

/** Bottom-k-by-hash quantile sketch (graft.sketch.SampleQuantiles). */
class SampleQuantilesSpec extends SparkTestBase {
  import spark.implicits._

  /** The engine's pinned hash order, replayed with the Catalyst hash. */
  private def flipped(v: Long): Long =
    org.apache.spark.sql.catalyst.expressions.XxHash64Function
      .hash(v, org.apache.spark.sql.types.LongType, 42L) ^ Long.MinValue

  /** Reference model: k smallest distinct (flipped hash, value) pairs,
    * then v[floor(q*(n-1))] over the value-sorted sample.
    */
  private def refQuantiles(rows: Seq[(Long, Double)], k: Int,
      probs: Seq[Double]): Seq[(Double, Long, Double)] = {
    val sample = rows.map { case (id, v) => (flipped(id), v) }
      .distinct.sorted.take(k)
    val vals = sample.map(_._2).sorted
    probs.map { q =>
      val idx = math.floor(q * (vals.size - 1).toDouble).toInt
      (q, vals.size.toLong, vals(idx))
    }
  }

  test("quantiles match the reference model exactly under random " +
      "partitionings; full-population sample gives exact quantiles") {
    val rnd = new scala.util.Random(7)
    val rows = (1L to 500L).map(id => (id, rnd.nextInt(1000) / 10.0))
    val probs = Seq(0.0, 0.1, 0.5, 0.9, 1.0)
    for (k <- Seq(64, 256, 1024)) {
      val got = SampleQuantiles.quantiles(
          rows.toDF("id", "v").repartition(7), col("id"), col("v"),
          k, probs)
        .orderBy("q").as[(Double, Long, Double)].collect().toSeq
      assert(got == refQuantiles(rows, k, probs), s"k=$k")
    }
    // k >= population: the sample IS the population, quantiles exact
    val allVals = rows.map(_._2).sorted
    val exact = SampleQuantiles.quantiles(rows.toDF("id", "v"),
        col("id"), col("v"), k = 1024, probs = Seq(0.5))
      .as[(Double, Long, Double)].head()
    assert(exact._2 == 500L && exact._3 == allVals(
      math.floor(0.5 * 499).toInt))
  }

  test("merge of per-split samples equals the one-shot sample " +
      "(mergeability), nulls and NaNs are skipped") {
    val rnd = new scala.util.Random(11)
    val rows = (1L to 400L).map(id => (id, rnd.nextDouble() * 100))
    val df = rows.toDF("id", "v")
    val k = 64
    val a = df.filter(col("id") % 2 === 0)
      .agg(SampleQuantiles.sampleAgg(col("id"), col("v"), k).as("s"))
    val b = df.filter(col("id") % 2 === 1)
      .agg(SampleQuantiles.sampleAgg(col("id"), col("v"), k).as("s"))
    val merged = a.crossJoin(b.withColumnRenamed("s", "t"))
      .select(slice(array_sort(array_distinct(
        concat(col("s"), col("t")))), 1, k).as("m"))
      .as[Seq[(Long, Double)]].head()
    val oneShot = df
      .agg(SampleQuantiles.sampleAgg(col("id"), col("v"), k).as("s"))
      .as[Seq[(Long, Double)]].head()
    assert(merged == oneShot)

    val noisy = (rows.map { case (i, v) => (Option(i), Option(v)) } ++
      Seq((Some(9999L), Some(Double.NaN)), (None, Some(1.0)),
        (Some(9998L), None))).toDF("id", "v")
    val clean = SampleQuantiles.quantiles(noisy, col("id"), col("v"),
        k = 1024, probs = Seq(0.5))
      .as[(Double, Long, Double)].head()
    assert(clean._2 == 400L, "null/NaN rows must not enter the sample")
  }

  test("empty population yields n_sample=0 and null estimates; " +
      "invalid k and probs are rejected") {
    val empty = Seq.empty[(Long, Double)].toDF("id", "v")
    val r = SampleQuantiles.quantiles(empty, col("id"), col("v"),
        k = 64, probs = Seq(0.5))
      .select(col("n_sample"), col("est").isNull).as[(Long, Boolean)]
      .head()
    assert(r == ((0L, true)))
    intercept[IllegalArgumentException](
      SampleQuantiles.quantiles(empty, col("id"), col("v"), 4, Seq(0.5)))
    intercept[IllegalArgumentException](
      SampleQuantiles.quantiles(empty, col("id"), col("v"), 64,
        Seq(1.5)))
  }

  test("grouped quantiles equal per-group runs of the global " +
      "operator; null groups excluded") {
    val rnd = new scala.util.Random(3)
    val rows = (1L to 600L).map(id =>
      (id % 3, id, rnd.nextInt(500) / 7.0))
    val df = rows.toDF("g", "id", "v")
    val probs = Seq(0.25, 0.5, 0.9)
    val grouped = SampleQuantiles.groupedQuantiles(df.repartition(7),
        col("g"), col("id"), col("v"), k = 64, probs = probs)
      .as[(Long, Double, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    for (g <- 0L until 3L) {
      val single = SampleQuantiles.quantiles(df.filter(col("g") === g),
          col("id"), col("v"), k = 64, probs = probs)
        .as[(Double, Long, Double)].collect()
      for ((q, n, est) <- single)
        assert(grouped((g, q)) == ((n, est)), s"g=$g q=$q")
    }
    val withNullGroup = rows.map { case (g, id, v) =>
      (if (id % 10 == 0) None else Some(g), id, v) }
      .toDF("g", "id", "v")
    val gs = SampleQuantiles.groupedQuantiles(withNullGroup, col("g"),
        col("id"), col("v"), k = 64, probs = Seq(0.5))
      .select("grp").distinct().as[Long].collect().toSet
    assert(gs == Set(0L, 1L, 2L), "null group keys must be excluded")
  }

  test("sample membership is hash-pinned: the retained hashes equal " +
      "the KMV sketch of the same keys") {
    val rows = (1L to 300L).map(id => (id, id * 2.0))
    val df = rows.toDF("id", "v")
    val k = 32
    val viaSample = df
      .agg(SampleQuantiles.sampleAgg(col("id"), col("v"), k).as("s"))
      .select(transform(col("s"), p => p("h")).as("hs"))
      .as[Seq[Long]].head()
    val viaKmv = df.agg(Kmv.sketchAgg(col("id"), k).as("s"))
      .as[Seq[Long]].head()
    assert(viaSample == viaKmv)
  }
}
