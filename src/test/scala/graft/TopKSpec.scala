package graft

import graft.sketch.TopK
import org.apache.spark.sql.functions._

class TopKSpec extends SparkTestBase {
  import spark.implicits._

  /** Zipf-ish deterministic stream: value v_i appears with multiplicity
    * that falls off fast — real heavy-hitter shape, no RNG.
    */
  private def zipfish(nVals: Int, scale: Int) =
    (0 until nVals).flatMap { i =>
      Seq.fill(math.max(1, scale / (i + 1)))(s"v$i")
    }.toDF("v")

  private def sketchOf(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.agg(TopK.sketchAgg(col("v"), k).as("sk"))
      .collect()(0).getSeq[org.apache.spark.sql.Row](0)
      .map(r => r.getString(0) -> r.getLong(1))

  test("exact regime (distinct <= k): counters are exact counts under " +
      "any partitioning, merge == one-shot") {
    val df = zipfish(8, 100) // 8 distinct values, k = 16
    val truth = df.groupBy("v").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val expect = truth.toSeq.sortBy { case (v, c) => (-c, v) }
    assert(sketchOf(df, 16) === expect)
    assert(sketchOf(df.repartition(7), 16) === expect)
    assert(sketchOf(df.repartition(1).sortWithinPartitions(desc("v")),
      16) === expect)
    // merge of two disjoint-half sketches == the one-shot sketch
    val halves = df.withColumn("h", xxhash64(col("v")) % 2 === 0)
    val merged = halves.groupBy("h")
      .agg(TopK.sketchAgg(col("v"), 16).as("sk"))
    // re-aggregate the per-half summaries through the same merge path
    val agg = new TopK.MisraGriesAgg(16)
    val maps = merged.collect().map(_.getSeq[org.apache.spark.sql.Row](1)
      .map(r => r.getString(0) -> r.getLong(1)).toMap)
    assert(agg.finish(maps.foldLeft(agg.zero)(agg.merge)) === expect)
  }

  test("estimation regime: MG guarantees hold under every partitioning " +
      "(size <= k, heavy membership, c - N/(k+1) <= est <= c)") {
    val df = zipfish(200, 2000) // ~2900 rows, 200 distinct
    val n = df.count()
    val truth = df.groupBy("v").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    for (k <- Seq(5, 16, 50); parts <- Seq(1, 4, 13)) {
      val sk = sketchOf(df.repartition(parts), k).toMap
      assert(sk.size <= k, s"k=$k parts=$parts size=${sk.size}")
      val bound = n.toDouble / (k + 1)
      truth.foreach { case (v, c) =>
        if (c > bound)
          assert(sk.contains(v), s"heavy $v (c=$c > $bound) missing " +
            s"at k=$k parts=$parts")
      }
      sk.foreach { case (v, est) =>
        val c = truth(v)
        assert(est <= c, s"overcount $v: $est > $c")
        assert(est >= c - bound - 1e-9,
          s"undercount beyond bound $v: $est < $c - $bound")
      }
    }
  }

  test("heavyHitters output is EXACTLY the phi-threshold set with exact " +
      "counts, bit-identical under repartitioning") {
    val df = zipfish(100, 1000)
    val n = df.count()
    val phiDenom = 20L
    val expect = df.groupBy("v").count()
      .filter(col("count") * phiDenom > n)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      .sortBy { case (v, c) => (-c, v) }
    for (parts <- Seq(1, 3, 11)) {
      val got = TopK.heavyHitters(df.repartition(parts), "v",
          k = 19, phiDenom = phiDenom)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getDouble(3)))
      assert(got.map(t => (t._1, t._2)).toSeq === expect,
        s"parts=$parts")
      got.foreach { t =>
        assert(t._3 === n)
        assert(t._4 === t._2.toDouble / n.toDouble)
      }
    }
  }

  test("nulls are skipped (not counted, not in N); empty input yields " +
      "an empty typed frame") {
    val df = Seq(Some("a"), Some("a"), Some("a"), None, Some("b"))
      .toDF("v")
    val got = TopK.heavyHitters(df, "v", k = 4, phiDenom = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // N = 4 non-null; only a (3) clears 3*2 > 4
    assert(got.toSeq === Seq(("a", 3L, 4L)))
    val empty = TopK.heavyHitters(
      Seq.empty[Option[String]].toDF("v"), "v", k = 4, phiDenom = 2)
    assert(empty.columns.toSeq === Seq("value", "cnt", "n_total", "frac"))
    assert(empty.count() === 0L)
  }

  test("validation: phiDenom beyond the recall guarantee, non-string " +
      "columns, and degenerate k are rejected loudly") {
    val df = Seq("a").toDF("v")
    intercept[IllegalArgumentException] {
      TopK.heavyHitters(df, "v", k = 10, phiDenom = 12) // > k+1
    }
    intercept[IllegalArgumentException] {
      TopK.heavyHitters(df, "v", k = 10, phiDenom = 1)
    }
    intercept[IllegalArgumentException] {
      TopK.heavyHitters(Seq(1L).toDF("v"), "v", k = 10, phiDenom = 4)
    }
    intercept[IllegalArgumentException] { new TopK.MisraGriesAgg(0) }
  }
}
