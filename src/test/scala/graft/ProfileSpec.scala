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

  test("profileNumeric: exact distincts match count_distinct on " +
      "NaN/-0.0/all-null edges") {
    // the Expand-free pair path must agree with count_distinct exactly:
    // NaN collapses to one value, -0.0 merges with 0.0, nulls drop
    val d = Seq[(java.lang.Double, java.lang.Double)](
      (Double.NaN, null), (Double.NaN, null), (-0.0, null), (0.0, null),
      (3.5, null))
      .toDF("a", "nul")
    val got = Profile.profileNumeric(d, Seq("a", "nul"))
      .select("column", "n_distinct").as[(String, Long)].collect().toMap
    val want = d.select(count_distinct(col("a")), count_distinct(col("nul")))
      .as[(Long, Long)].collect().head
    assert(got("a") == want._1 && got("nul") == want._2, s"got $got")
    assert(got("nul") == 0L)
  }

  test("profileNumeric: default sum accumulator absorbs fine-grained " +
      "values") {
    // 0.001 would round to 0.00 under a (18,2) accumulator; the (38,6)
    // default must sum it exactly
    val d = Seq.fill(10)(0.001).toDF("x")
    val got = Profile.profileNumeric(d, Seq("x"))
      .select("sum_value").as[Double].collect().head
    assert(got == 0.01, s"got $got")
  }

  test("profileNumeric rejects duplicate columns") {
    intercept[IllegalArgumentException] {
      Profile.profileNumeric(df, Seq("v", "v"))
    }
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

  test("profileDrift: statuses and flags on a constructed drift") {
    val before = Seq[(java.lang.Double, java.lang.Double, java.lang.Double)](
      (1.0, 5.0, 1.0), (2.0, 6.0, 2.0), (3.0, 7.0, 3.0), (4.0, 8.0, 4.0))
      .toDF("stays", "nulled", "gone")
    // 'nulled' gains 50% nulls (spike) and its distincts halve to 2
    // (collapse at 0.6); 'stays' range widens low; 'fresh' is added
    val after = Seq[(java.lang.Double, java.lang.Double, java.lang.Double)](
      (-9.0, null, 1.0), (2.0, null, 1.0), (3.0, 6.0, 1.0), (4.0, 8.0, 1.0))
      .toDF("stays", "nulled", "fresh")
    val got = Profile.profileDrift(
      Profile.profileNumeric(before, Seq("stays", "nulled", "gone")),
      Profile.profileNumeric(after, Seq("stays", "nulled", "fresh")),
      nullRateJump = 0.1, distinctDropFrac = 0.6)
      .select("column", "status", "null_spike", "distinct_collapse",
        "range_widened")
      .as[(String, String, Int, Int, Int)].collect().toSeq
    assert(got == Seq(
      ("fresh", "added", 0, 0, 0),
      ("gone", "removed", 0, 0, 0),
      ("nulled", "drift", 1, 1, 0),
      ("stays", "drift", 0, 0, 1)), s"got $got")
  }

  test("profileDrift: identical snapshots are all ok; guards fire") {
    val p = Profile.profileNumeric(df, Seq("v", "id"))
    val got = Profile.profileDrift(p, p)
      .select("status").as[String].collect().toSeq
    assert(got == Seq("ok", "ok"))
    intercept[IllegalArgumentException] {
      Profile.profileDrift(df, p)
    }
    intercept[IllegalArgumentException] {
      Profile.profileDrift(p, p, distinctDropFrac = 0.0)
    }
  }

  test("keySkew: counts, shares, hot-key stats on a constructed skew") {
    // a×10, b×4, c×1, d×1 → n_rows=16, n_keys=4, mean=4;
    // hotFactor=2 ⇒ hot iff n > 8: only a (10 rows, share 10/16)
    val d = (Seq.fill(10)("a") ++ Seq.fill(4)("b") ++ Seq("c", "d"))
      .toDF("k")
    val got = Profile.keySkew(d, Seq("k"), topN = 2, hotFactor = 2.0)
      .as[(String, Long, Double, Double, Long, Long, Long, Long, Double)]
      .collect().toSeq
    assert(got.map(_._1) == Seq("a", "b"))
    val a = got.head
    assert(a == (("a", 10L, 10.0 / 16.0, 10.0 / 4.0, 16L, 4L, 10L, 1L,
      10.0 / 16.0)), s"got $a")
    val b = got(1)
    assert(b._2 == 4L && b._4 == 1.0 && b._8 == 1L)
  }

  test("keySkew: deterministic tie-break, null keys count as a group") {
    val d = Seq[(java.lang.Long, String)]((1L, "x"), (1L, "y"),
      (2L, "x"), (2L, "y"), (null, "z")).toDF("k", "p")
    val got = Profile.keySkew(d, Seq("k"), topN = 3)
      .select("k", "n").collect()
      .map(r => (if (r.isNullAt(0)) -1L else r.getLong(0)) -> r.getLong(1))
      .toSeq
    // ties (1→2, 2→2) break by key asc; null group present with n=1
    assert(got == Seq(1L -> 2L, 2L -> 2L, -1L -> 1L), s"got $got")
  }

  test("keySkew: multi-column keys and repartition invariance") {
    val d = Seq((1, "x"), (1, "x"), (1, "y"), (2, "x")).toDF("a", "b")
    val one = Profile.keySkew(d.coalesce(1), Seq("a", "b"), topN = 4)
      .collect().toSeq
    val many = Profile.keySkew(d.repartition(7), Seq("a", "b"), topN = 4)
      .collect().toSeq
    assert(one == many)
    assert(one.head.getInt(0) == 1 && one.head.getString(1) == "x"
      && one.head.getLong(2) == 2L)
  }

  test("keySkew guards") {
    intercept[IllegalArgumentException] {
      Profile.keySkew(df, Seq("nope"))
    }
    intercept[IllegalArgumentException] {
      Profile.keySkew(df, Seq("v"), topN = 0)
    }
    intercept[IllegalArgumentException] {
      Profile.keySkew(df, Seq.empty)
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

  test("histogram: NaN values are excluded, not binned") {
    // a NaN poisons max() (Spark orders NaN greatest); without the
    // filter every row would collapse into the last bin with NaN edges
    val d = Seq(1.0, 2.0, 3.0, Double.NaN).toDF("x")
    val got = Profile.equiWidthHistogram(d, "x", nBins = 2)
      .as[(Int, Double, Double, Long)].collect().toSeq
    assert(got.map(r => (r._1, r._4)) == Seq((0, 1L), (1, 2L)), s"got $got")
    assert(got.last._3 == 3.0, "bounds derive from non-NaN values only")
    val exp = Profile.equiWidthHistogram(d, "x", nBins = 2,
      bounds = Some((1.0, 3.0))).as[(Int, Double, Double, Long)]
      .collect().toSeq
    assert(exp.map(r => (r._1, r._4)) == Seq((0, 1L), (1, 2L)),
      "explicit-bounds path agrees")
  }

  test("profileDrift: an empty before-snapshot cannot false-fire flags") {
    val empty = Seq.empty[(java.lang.Long, java.lang.Double)]
      .toDF("id", "v")
    val got = Profile.profileDrift(
      Profile.profileNumeric(empty, Seq("v")),
      Profile.profileNumeric(df, Seq("v")))
      .select("status", "null_spike", "null_rate_before")
      .as[(String, Int, Option[Double])].collect().head
    // rates on a 0-row snapshot are null, not 0/0 NaN → no spike
    assert(got == (("ok", 0, None)), s"got $got")
  }

  test("histogram counts are repartition-invariant") {
    val d = (0 until 1000).map(i => (i % 97).toDouble).toDF("x")
    val a = Profile.equiWidthHistogram(d.repartition(13), "x", 16)
      .collect().toSeq
    val b = Profile.equiWidthHistogram(d.coalesce(1), "x", 16)
      .collect().toSeq
    assert(a == b)
  }

  test("profileText: nulls vs empties vs distinct collapse separate") {
    val d = Seq(
      ("abc", ""), ("abc", null), ("de", ""), (null, "xyzw"))
      .toDF("a", "b")
    val got = Profile.profileText(d, Seq("a", "b")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getLong(7))).toMap
    // a: 4 rows, 1 null, distinct {abc, de}, 0 empty, len 2..3, sum 8
    assert(got("a") == ((4L, 1L, 2L, 0L, 2L, 3L, 8L)))
    // b: 1 null, distinct {"", xyzw}, 2 empty, len 0..4, sum 4
    assert(got("b") == ((4L, 1L, 2L, 2L, 0L, 4L, 4L)))
  }

  test("profileText: approx mode keeps every non-distinct field; " +
      "all-null column zero-fills") {
    val d = Seq((null: String, "x"), (null: String, "y"))
      .toDF("a", "b")
    val ex = Profile.profileText(d, Seq("a", "b")).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(ex("a") == ((2L, 2L, 0L, 0L)))
    val approx = Profile.profileText(d, Seq("a", "b"), exact = false)
    assert(approx.columns.toSeq ==
      Profile.profileText(d, Seq("a", "b")).columns.toSeq)
    // min/max lengths of the all-null column are null
    val aRow = Profile.profileText(d, Seq("a")).collect().head
    assert(aRow.isNullAt(5) && aRow.isNullAt(6) && aRow.getLong(7) == 0L)
  }

  test("profileText guards reject non-string and missing columns") {
    val d = Seq((1L, "x")).toDF("n", "s")
    intercept[IllegalArgumentException](Profile.profileText(d, Seq("n")))
    intercept[IllegalArgumentException](Profile.profileText(d, Seq("zz")))
    intercept[IllegalArgumentException](Profile.profileText(d, Seq.empty))
  }

  test("riAudit: exact orphan/null accounting, intact edge reads " +
      "zero, all-null child divides safely") {
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val child = Seq(Some(1L), Some(1L), Some(2L), Some(9L), Some(8L),
      None, None).toDF("fk")
    val r = Profile.riAudit(child, "fk", parent, "pk", "edge")
      .as[(String, Long, Long, Long, Double)].head()
    assert(r == (("edge", 7L, 2L, 2L, 2.0 / 5.0)))
    // intact edge: zero orphans
    val ok = Profile.riAudit(Seq(1L, 2L).toDF("fk"), "fk", parent,
        "pk", "ok").as[(String, Long, Long, Long, Double)].head()
    assert(ok == (("ok", 2L, 0L, 0L, 0.0)))
    // every key null: fraction guarded to 0, not NaN
    val nulls = Seq[Option[Long]](None, None).toDF("fk")
    val nn = Profile.riAudit(nulls, "fk", parent, "pk", "nulls")
      .as[(String, Long, Long, Long, Double)].head()
    assert(nn == (("nulls", 2L, 2L, 0L, 0.0)))
    // null parent keys never match anything (no null-joins-null)
    val nullParent = Seq[Option[Long]](None, Some(1L)).toDF("pk")
    val np = Profile.riAudit(Seq[Option[Long]](None, Some(2L))
        .toDF("fk"), "fk", nullParent, "pk", "np")
      .as[(String, Long, Long, Long, Double)].head()
    assert(np == (("np", 2L, 1L, 1L, 1.0)))
  }
}
