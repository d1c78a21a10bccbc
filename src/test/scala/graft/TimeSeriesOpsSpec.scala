package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ts.TimeSeriesOps

/** Unit tests of the window-op library against hand-computed pandas
  * semantics — null-prefix behavior is the load-bearing part
  * (SURVEY.md §2.6, FIXTURES.md A1 msft pre-IPO nulls).
  */
class TimeSeriesOpsSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(day: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-$day%02d 00:00:00")

  // series with a null prefix and an interior null, like msft.csv pre-IPO
  private lazy val df = Seq[(String, Timestamp, Option[Double])](
    ("t", ts(1), None), ("t", ts(2), None), ("t", ts(3), Some(10.0)),
    ("t", ts(4), Some(12.0)), ("t", ts(5), None), ("t", ts(6), Some(20.0)),
    ("t", ts(7), Some(30.0)), ("t", ts(8), Some(15.0)))
    .toDF("ticker", "date", "close")

  private val w = TimeSeriesOps.keyed()

  private def vals(c: org.apache.spark.sql.Column): Seq[Option[Double]] =
    df.select(c.as("v")).orderBy().collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0))).toSeq

  test("rollingMean: null until n non-null obs in window (min_periods=n)") {
    // pandas: rolling(2).mean() -> NaN,NaN,NaN,11,NaN,NaN,25,22.5
    val got = df.select(TimeSeriesOps.rollingMean(col("close"), 2, w).as("v"))
      .orderBy("date").collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0))).toSeq
    assert(got === Seq(None, None, None, Some(11.0), None, None,
      Some(25.0), Some(22.5)))
  }

  test("pctChange: first-defined and after-null rows behave like x/lag-1") {
    val got = df.select(TimeSeriesOps.pctChange(col("close"), w).as("v"))
      .orderBy("date").collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0))).toSeq
    // lag is positional (pandas pct_change over index): null rows give null
    assert(got(3) === Some(0.19999999999999996)) // 12/10 - 1
    assert(got(0) === None && got(2) === None && got(4) === None && got(5) === None)
    assert(got(6) === Some(0.5))
  }

  test("cumSum ignores nulls and keeps running") {
    val got = df.select(TimeSeriesOps.cumSum(col("close"), w).as("v"))
      .orderBy("date").collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0))).toSeq
    assert(got === Seq(None, None, Some(10.0), Some(22.0), Some(22.0),
      Some(42.0), Some(72.0), Some(87.0)))
  }

  test("cumMax running peak") {
    val got = df.select(TimeSeriesOps.cumMax(col("close"), w).as("v"))
      .orderBy("date").collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0))).toSeq
    assert(got === Seq(None, None, Some(10.0), Some(12.0), Some(12.0),
      Some(20.0), Some(30.0), Some(30.0)))
  }

  test("cumProd multiplies left-to-right, ignoring nulls") {
    val got = df.select(TimeSeriesOps.cumProd(col("close"), w).as("v"))
      .orderBy("date").collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0))).toSeq
    assert(got === Seq(None, None, Some(10.0), Some(120.0), Some(120.0),
      Some(2400.0), Some(72000.0), Some(1080000.0)))
  }

  test("ewmMean folds y=(1-a)y+ax in row order, nulls skipped") {
    val a = 2.0 / 4 // span=3
    val got = df.select(TimeSeriesOps.ewmMean(col("close"), 3, w).as("v"))
      .orderBy("date").collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0))).toSeq
    // local bit-exact fold over the non-null values 10, 12, 20, 30, 15
    val y1 = 10.0
    val y2 = (1 - a) * y1 + a * 12.0
    val y3 = (1 - a) * y2 + a * 20.0
    val y4 = (1 - a) * y3 + a * 30.0
    val y5 = (1 - a) * y4 + a * 15.0
    assert(got === Seq(None, None, Some(y1), Some(y2), Some(y2),
      Some(y3), Some(y4), Some(y5)))
  }

  test("ffillZero carries last non-null forward, 0 before first") {
    val got = df.select(TimeSeriesOps.ffillZero(col("close"), w).as("v"))
      .orderBy("date").collect().map(_.getDouble(0)).toSeq
    assert(got === Seq(0.0, 0.0, 10.0, 12.0, 12.0, 20.0, 30.0, 15.0))
  }

  test("logCumReturn = cumsum of log(pct + 1), np.log semantics") {
    val simple = Seq(("t", ts(1), 100.0), ("t", ts(2), 110.0), ("t", ts(3), 121.0),
      ("t", ts(4), 0.0))
      .toDF("ticker", "date", "close")
    val got = simple.select(TimeSeriesOps.logCumReturn(col("close"), w).as("v"))
      .orderBy("date").collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0))).toSeq
    assert(got(0) === None)
    // the reference rounds 1+x BEFORE the log (np.log, not log1p);
    // tolerance because Spark's log is StrictMath (fdlibm), 1 ulp from
    // the Math.log intrinsic used here
    assert(math.abs(got(1).get - math.log(0.1 + 1.0)) < 1e-15)
    assert(math.abs(got(2).get -
      (math.log(0.1 + 1.0) + math.log(0.09999999999999987 + 1.0))) < 1e-15)
    // value dropping to zero: np.log(0) = -inf, carried by the cumsum
    assert(got(3).get === Double.NegativeInfinity)
  }

  test("logCumReturn: sign flip (pct < -1) is pinned to NaN and poisons " +
      "the running sum") {
    // 100 -> -50 is a gross return of -0.5: log of a negative number is
    // NaN (np.log semantics), and every cumulative value after the flip
    // is NaN too. The branch is pinned explicitly so the DuckDB oracle
    // (whose ln() ERRORS on negative input) can mirror it with a CASE.
    val flip = Seq(("t", ts(1), 100.0), ("t", ts(2), 110.0),
      ("t", ts(3), -50.0), ("t", ts(4), 60.0))
      .toDF("ticker", "date", "close")
    val got = flip.select(TimeSeriesOps.logCumReturn(col("close"), w).as("v"))
      .orderBy("date").collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0))).toSeq
    assert(got(0) === None)
    assert(math.abs(got(1).get - math.log(1.1)) < 1e-15)
    assert(got(2).get.isNaN)
    assert(got(3).get.isNaN)
  }

  test("tail keeps last n rows per ticker") {
    val got = TimeSeriesOps.tail(df, 3).orderBy("date").collect()
      .map(_.getTimestamp(1)).toSeq
    assert(got === Seq(ts(6), ts(7), ts(8)))
  }

  test("funnel: strictly-after chaining, prefix property, horizon " +
      "boundary, out-of-order events") {
    def sec(s: Long): Timestamp = new Timestamp(s * 1000L)
    val events = Seq(
      // u1: clean completion, span exactly == horizon (20s) -> converts
      (1L, "view", sec(10)), (1L, "click", sec(20)), (1L, "purchase", sec(30)),
      // u2: a purchase BEFORE the funnel starts must not count
      (2L, "purchase", sec(5)), (2L, "view", sec(10)),
      (2L, "click", sec(20)), (2L, "purchase", sec(25)),
      // u3: click at EXACTLY the view time is not strictly after; the
      // later click chains, but its purchase precedes it -> 2 steps
      (3L, "view", sec(10)), (3L, "click", sec(10)),
      (3L, "purchase", sec(12)), (3L, "click", sec(15)),
      // u4: never views -> zero steps, converted false (not null)
      (4L, "click", sec(5)), (4L, "purchase", sec(6)))
      .toDF("user_id", "event_type", "ts")
    val got = TimeSeriesOps.funnel(events, "user_id", "event_type", "ts",
      Seq("view", "click", "purchase"), horizonUs = 20000000L)
      .orderBy("user_id")
      .select("user_id", "step0_us", "step1_us", "step2_us",
        "steps_completed", "converted")
      .collect().map(r => (r.getLong(0),
        Option(r.get(1)), Option(r.get(2)), Option(r.get(3)),
        r.getLong(4), r.getBoolean(5))).toSeq
    def us(s: Long) = Some(s * 1000000L)
    assert(got === Seq(
      (1L, us(10), us(20), us(30), 3L, true),
      (2L, us(10), us(20), us(25), 3L, true),
      (3L, us(10), us(15), None, 2L, false),
      (4L, None, None, None, 0L, false)))
    // layout invariance: same rows on any partitioning
    val shuffled = TimeSeriesOps.funnel(events.repartition(7), "user_id",
      "event_type", "ts", Seq("view", "click", "purchase"), 20000000L)
      .collect().map(_.toSeq).toSet
    assert(shuffled === TimeSeriesOps.funnel(events, "user_id",
      "event_type", "ts", Seq("view", "click", "purchase"), 20000000L)
      .collect().map(_.toSeq).toSet)
    // guards
    intercept[IllegalArgumentException](TimeSeriesOps.funnel(events,
      "user_id", "event_type", "ts", Seq.empty, 1L))
    intercept[IllegalArgumentException](TimeSeriesOps.funnel(events,
      "user_id", "event_type", "ts", Seq("a", "a"), 1L))
    intercept[IllegalArgumentException](TimeSeriesOps.funnel(events,
      "user_id", "event_type", "ts", (1 to 9).map("s" + _), 1L))
    intercept[IllegalArgumentException](TimeSeriesOps.funnel(events,
      "user_id", "event_type", "ts", Seq("view"), 0L))
  }

  test("funnel: keys with ZERO step-typed events (and the null-key " +
      "group) still emit — the step filter must not drop them") {
    def sec(s: Long): Timestamp = new Timestamp(s * 1000L)
    val events = Seq(
      (Some(1L), "view", sec(10)), (Some(1L), "click", sec(20)),
      // u7 only emits non-step types: must appear with 0 steps
      (Some(7L), "scroll", sec(5)), (Some(7L), "hover", sec(6)),
      // the null-key group rides the unfiltered formulation as one row
      (None, "view", sec(10)), (None, "scroll", sec(11)))
      .toDF("user_id", "event_type", "ts")
    val got = TimeSeriesOps.funnel(events, "user_id", "event_type", "ts",
      Seq("view", "click"), horizonUs = 3600000000L)
      .collect().map(r => (Option(r.get(0)),
        r.getAs[Long]("steps_completed"),
        r.getAs[Boolean]("converted"))).toSet
    assert(got === Set(
      (Some(1L), 2L, true),
      (Some(7L), 0L, false),
      (None, 1L, false)))
  }

  test("property: random event streams match a brute-force funnel " +
      "reference (chain semantics, prefix property, conversion)") {
    def sec(v: Long): Timestamp = new Timestamp(v * 1000L)
    val steps = Seq("a", "b", "c")
    val rnd = new scala.util.Random(1187)
    for (trial <- 1 to 8) {
      val types = Seq("a", "b", "c", "x", "y")
      val events = Seq.fill(120 + rnd.nextInt(120))((
        rnd.nextInt(12).toLong,
        types(rnd.nextInt(types.size)),
        sec(rnd.nextInt(500).toLong)))
      val horizon = (60 + rnd.nextInt(300)) * 1000000L
      // brute force: earliest step-i time strictly after step i-1
      val want = events.map(_._1).distinct.map { u =>
        val mine = events.filter(_._1 == u)
        var prev = Long.MinValue
        val stepUs = steps.map { st =>
          val cands = mine.filter(e => e._2 == st).map(_._3.getTime * 1000L)
            .filter(t => prev == Long.MinValue || t > prev)
          if (prev == -1L) -1L
          else if (cands.isEmpty) { prev = -1L; -1L }
          else { prev = cands.min; prev }
        }
        val done = stepUs.takeWhile(_ >= 0).size.toLong
        val conv = done == steps.size &&
          stepUs.last - stepUs.head <= horizon
        (u, stepUs(0), stepUs(1), stepUs(2), done, conv)
      }.toSet
      val got = TimeSeriesOps.funnel(
        events.toDF("user_id", "event_type", "ts"),
        "user_id", "event_type", "ts", steps, horizon)
        .collect().map(r => (r.getLong(0),
          if (r.isNullAt(1)) -1L else r.getLong(1),
          if (r.isNullAt(2)) -1L else r.getLong(2),
          if (r.isNullAt(3)) -1L else r.getLong(3),
          r.getLong(4), r.getBoolean(5))).toSet
      assert(got === want, s"trial $trial")
    }
  }

  test("funnelSummary: reach counts, guarded rates, exact " +
      "two-middle-positions medians (odd and even gap counts)") {
    def sec(s: Long): Timestamp = new Timestamp(s * 1000L)
    val events = Seq(
      (1L, "view", sec(10)), (1L, "click", sec(20)), (1L, "purchase", sec(30)),
      (2L, "view", sec(10)), (2L, "click", sec(20)), (2L, "purchase", sec(25)),
      (3L, "view", sec(10)), (3L, "click", sec(15)),
      (5L, "view", sec(40)),
      (6L, "scroll", sec(1))) // zero-step user counts in no step
      .toDF("user_id", "event_type", "ts")
    val got = TimeSeriesOps.funnelSummary(events, "user_id", "event_type",
        "ts", Seq("view", "click", "purchase"), horizonUs = 3600000000L)
      .orderBy("step_idx")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        Option(r.get(3)), Option(r.get(4)), Option(r.get(5)))).toSeq
    assert(got === Seq(
      (0L, "view", 4L, None, Some(1.0), None),
      // gaps {10,10,5}s: odd count, both middles = 10
      (1L, "click", 3L, Some(0.75), Some(0.75), Some(10.0)),
      // gaps {10,5}s: even count, median averages the middles = 7.5
      (2L, "purchase", 2L, Some(2.0 / 3.0), Some(0.5), Some(7.5))))
  }

  test("cohortRetention: day cohorts, distinct-active cells, exact rates") {
    // cohort A (first active day 1): users 1,2,3; cohort B (day 2): user 4
    // repeated same-day events must not double-count (distinct activity)
    val events = Seq(
      (1L, ts(1)), (1L, ts(1)), (1L, ts(2)), (1L, ts(4)),
      (2L, ts(1)), (2L, ts(2)),
      (3L, ts(1)),
      (4L, ts(2)), (4L, ts(4))).toDF("user_id", "ts")
    val got = TimeSeriesOps.cohortRetention(events, "user_id", "ts",
        unit = "day")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    // day-1 cohort (size 3): day0 all 3, day1 users 1,2, day3 user 1
    // day-2 cohort (size 1): day0 user 4, day2 user 4
    assert(got.toSeq === Seq(
      (0L, 3L, 3L, 1.0), (1L, 2L, 3L, 2.0 / 3.0), (3L, 1L, 3L, 1.0 / 3.0),
      (0L, 1L, 1L, 1.0), (2L, 1L, 1L, 1.0)))
    // cohort keys: day-1 rows first (ordered by cohort_us, period_no)
    val cohorts = TimeSeriesOps.cohortRetention(events, "user_id", "ts",
        unit = "day").collect().map(_.getLong(0)).distinct
    assert(cohorts.length === 2 && cohorts(0) < cohorts(1))
    intercept[IllegalArgumentException] {
      TimeSeriesOps.cohortRetention(events, "user_id", "ts", unit = "hour")
    }
  }

  test("cohortRetention: month cohorts count calendar months, not " +
      "fixed-width day gaps") {
    // calendar months have no fixed day width — Jan 31 → Mar 1 is
    // exactly 2 month-periods even though the day gap (29) is under
    // two 30-day "months"
    def mts(s: String) = java.sql.Timestamp.valueOf(s)
    val events = Seq(
      (1L, mts("2024-01-31 23:00:00")), (1L, mts("2024-02-01 00:00:00")),
      (1L, mts("2024-03-01 12:00:00")),
      (2L, mts("2024-01-05 09:00:00")), (2L, mts("2024-04-20 00:00:00")),
      (3L, mts("2024-02-10 00:00:00"))).toDF("user_id", "ts")
    val got = TimeSeriesOps.cohortRetention(events, "user_id", "ts",
        unit = "month")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    // Jan cohort (users 1,2): m0 both, m1 user 1, m2 user 1, m3 user 2
    // Feb cohort (user 3): m0 only
    assert(got.toSeq === Seq(
      (0L, 2L, 2L, 1.0), (1L, 1L, 2L, 0.5), (2L, 1L, 2L, 0.5),
      (3L, 1L, 2L, 0.5),
      (0L, 1L, 1L, 1.0)))
  }
}
