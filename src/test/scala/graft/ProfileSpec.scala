package graft

import org.apache.spark.sql.functions._

import graft.ops.Profile

/** Dataset profiler: per-column stats exactness, null/distinct
  * accounting, histogram binning edges and degenerate ranges.
  */
class ProfileSpec extends SparkTestBase {
  import spark.implicits._

  private val df = Seq[(java.lang.Long, java.lang.Double)](
    (1L, 10.25), (2L, 10.25), (3L, null), (4L, -2.5), (5L, 40.0))
    .toDF("id", "v")

  test("profileNumeric: counts, range and decimal-exact sum") {
    val got = Profile.profileNumeric(df, Seq("v", "id"))
      .as[(String, Long, Long, Long, Double, Double, Double)]
      .collect().toSeq
    assert(got.map(_._1) == Seq("id", "v"), "ordered by column name")
    val v = got.find(_._1 == "v").get
    assert(v == (("v", 5L, 1L, 3L, -2.5, 40.0, 58.0)), s"got $v")
    val id = got.find(_._1 == "id").get
    assert(id == (("id", 5L, 0L, 5L, 1.0, 5.0, 15.0)), s"got $id")
  }

  test("profileNumeric: approx mode keeps every exact field") {
    val e = Profile.profileNumeric(df, Seq("v"))
      .as[(String, Long, Long, Long, Double, Double, Double)].collect().head
    val a = Profile.profileNumeric(df, Seq("v"), exact = false)
      .as[(String, Long, Long, Long, Double, Double, Double)].collect().head
    assert(a.copy(_4 = e._4) == e, "only n_distinct may differ")
    assert(a._4 > 0L)
  }

  test("profileNumeric: result is repartition-invariant") {
    val a = Profile.profileNumeric(df.repartition(7), Seq("v", "id"))
      .collect().toSeq
    val b = Profile.profileNumeric(df.coalesce(1), Seq("v", "id"))
      .collect().toSeq
    assert(a == b)
  }

  test("profileNumeric rejects missing and non-numeric columns") {
    intercept[IllegalArgumentException] {
      Profile.profileNumeric(df, Seq("nope"))
    }
    val withS = df.withColumn("s", lit("x"))
    intercept[IllegalArgumentException] {
      Profile.profileNumeric(withS, Seq("s"))
    }
  }

  test("histogram: derived bounds, closed top edge, occupied bins only") {
    // values 0..10 in 5 bins of width 2; 10.0 == max lands in bin 4
    val d = (0 to 10).map(_.toDouble).toDF("x")
    val got = Profile.equiWidthHistogram(d, "x", nBins = 5)
      .as[(Int, Double, Double, Long)].collect().toSeq
    assert(got.map(r => (r._1, r._4)) ==
      Seq((0, 2L), (1, 2L), (2, 2L), (3, 2L), (4, 3L)), s"got $got")
    assert(got.head._2 == 0.0 && got.head._3 == 2.0)
    assert(got.last._2 == 8.0 && got.last._3 == 10.0)
  }

  test("histogram: explicit bounds filter out-of-range rows") {
    val d = Seq(-5.0, 1.0, 3.0, 99.0).toDF("x")
    val got = Profile.equiWidthHistogram(d, "x", nBins = 2,
        bounds = Some((0.0, 4.0)))
      .as[(Int, Double, Double, Long)].collect().toSeq
    assert(got.map(r => (r._1, r._4)) == Seq((0, 1L), (1, 1L)), s"got $got")
  }

  test("histogram: degenerate range and all-null column") {
    val same = Seq(7.0, 7.0, 7.0).toDF("x")
    val got = Profile.equiWidthHistogram(same, "x", nBins = 8)
      .as[(Int, Double, Double, Long)].collect().toSeq
    assert(got.map(r => (r._1, r._4)) == Seq((0, 3L)), s"got $got")
    val nulls = Seq[java.lang.Double](null, null).toDF("x")
    assert(Profile.equiWidthHistogram(nulls, "x", nBins = 4).count() == 0L)
  }

  test("histogram counts are repartition-invariant") {
    val d = (0 until 1000).map(i => (i % 97).toDouble).toDF("x")
    val a = Profile.equiWidthHistogram(d.repartition(13), "x", 16)
      .collect().toSeq
    val b = Profile.equiWidthHistogram(d.coalesce(1), "x", 16)
      .collect().toSeq
    assert(a == b)
  }
}
