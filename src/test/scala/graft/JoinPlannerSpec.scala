package graft

import org.apache.spark.sql.functions._

import graft.ops.JoinPlanner

/** Sketch-driven join planning: the decision procedure (broadcast a
  * small dim, salt a skewed fact, shuffle otherwise), the CMS join-size
  * estimate riding the decision record, and autoJoin row-for-row parity
  * with the plain join on every path.
  */
class JoinPlannerSpec extends SparkTestBase {
  import spark.implicits._

  // skewed fact: one hot key holding ~2/3 of rows, long uniform tail
  private lazy val skewed = ((1 to 2000).map(i => ("hot", i.toLong)) ++
    (1 to 1000).map(i => (s"k${i % 200}", i.toLong)))
    .toDF("k", "row_id")
  private lazy val dim = (Seq("hot") ++ (0 until 200).map(i => s"k$i"))
    .zipWithIndex.map { case (k, i) => (k, s"v$i") }.toDF("k", "attr")

  test("a small dimension side decides broadcast (no large-side pass)") {
    val d = JoinPlanner.plan(skewed, dim, Seq("k"),
      broadcastRowLimit = 1000)
    assert(d.strategy == "broadcast")
    assert(d.smallRows == 201L)
    assert(d.largeRows == -1L, "broadcast decision must skip the " +
      "large-side skew pass")
    assert(d.estJoinRows >= 3000L,
      s"CMS estimate must upper-bound the true join size, got " +
        s"${d.estJoinRows}")
  }

  test("a hot key beyond the share threshold decides salted; a " +
      "balanced fact decides shuffle") {
    val salted = JoinPlanner.plan(skewed, dim, Seq("k"),
      broadcastRowLimit = 10)
    assert(salted.strategy == "salted")
    assert(salted.topKeyShare > 0.5)
    val balanced = (1 to 3000).map(i => (s"k${i % 200}", i.toLong))
      .toDF("k", "row_id")
    val shuffle = JoinPlanner.plan(balanced, dim, Seq("k"),
      broadcastRowLimit = 10)
    assert(shuffle.strategy == "shuffle", s"got $shuffle")
  }

  test("an empty large side decides shuffle instead of crashing") {
    val empty = skewed.filter(lit(false))
    val d = JoinPlanner.plan(empty, dim, Seq("k"), broadcastRowLimit = 10)
    assert(d.strategy == "shuffle", s"got $d")
    assert(d.largeRows == 0L && d.smallRows == 201L)
  }

  test("autoJoin returns the same rows as a plain join on every path") {
    val plain = skewed.join(dim, Seq("k")).orderBy("row_id", "attr")
      .collect().toSeq
    for (limit <- Seq(1000L, 10L)) {
      val (joined, d) = JoinPlanner.autoJoin(skewed, dim, Seq("k"),
        uniqueCol = col("row_id"), broadcastRowLimit = limit)
      assert(joined.orderBy("row_id", "attr").collect().toSeq == plain,
        s"strategy ${d.strategy} changed the join result")
    }
  }

  test("the estimate can be skipped and composite keys are accepted") {
    val left = Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("k1", "k2", "v")
    val right = Seq((1L, "a", "x"), (9L, "z", "y")).toDF("k1", "k2", "w")
    val d = JoinPlanner.plan(left, right, Seq("k1", "k2"),
      estimate = false)
    assert(d.strategy == "broadcast" && d.estJoinRows == -1L)
    val (joined, _) = JoinPlanner.autoJoin(left, right, Seq("k1", "k2"),
      uniqueCol = col("v"), estimate = false)
    assert(joined.count() == 1L)
  }

  test("measure once / decide twice equals two plan() calls, and the " +
      "driver-side estimate equals the query-side CMS inner product") {
    val m = JoinPlanner.measure(skewed, dim, Seq("k"))
    for (limit <- Seq(1000L, 10L))
      assert(JoinPlanner.decide(m, broadcastRowLimit = limit) ==
        JoinPlanner.plan(skewed, dim, Seq("k"), broadcastRowLimit = limit),
        s"decide(measure) diverged from plan() at limit $limit")
    // the weighted-CMS (per-key counts) estimate must equal the
    // raw-row-stream sketch estimate bit-for-bit: integer adds are
    // associative, so adding a key's count once per key produces the
    // same cells as adding 1 per row
    val sk = (df: org.apache.spark.sql.DataFrame) =>
      graft.sketch.CountMin.sketch(
        df.select(array(col("k").cast("string")).as("__t")),
        col("__t"), 4, 1024)
    val est = graft.sketch.CountMin
      .joinSizeEstimate(sk(skewed), sk(dim), 4, 1024)
      .head().getLong(0)
    assert(m.estJoinRows == est,
      s"driver estimate ${m.estJoinRows} != query estimate $est")
    assert(m.estJoinRows >= 3000L)
  }

  test("executeJoin replays a decided strategy row-for-row") {
    val plain = skewed.join(dim, Seq("k")).orderBy("row_id", "attr")
      .collect().toSeq
    val m = JoinPlanner.measure(skewed, dim, Seq("k"))
    for (limit <- Seq(1000L, 10L)) {
      val d = JoinPlanner.decide(m, broadcastRowLimit = limit)
      val joined = JoinPlanner.executeJoin(skewed, dim, Seq("k"),
        uniqueCol = col("row_id"), d)
      assert(joined.orderBy("row_id", "attr").collect().toSeq == plain,
        s"strategy ${d.strategy} changed the join result")
    }
  }

  test("guards reject empty keys and bad thresholds") {
    intercept[IllegalArgumentException](
      JoinPlanner.plan(skewed, dim, Nil))
    intercept[IllegalArgumentException](
      JoinPlanner.plan(skewed, dim, Seq("k"), hotKeyShare = 0.0))
    intercept[IllegalArgumentException](
      JoinPlanner.plan(skewed, dim, Seq("k"), salts = 0))
  }
}
