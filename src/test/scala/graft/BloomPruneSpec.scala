package graft

import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join}
import org.apache.spark.sql.functions._

import graft.ops.ScaleOps

/** Bloom semi-join reduction (ScaleOps.bloomPrune / bloomPruneJoin):
  * result parity with the plain join, the no-false-negative superset
  * contract, the degenerate edges, and the plan property the 100 TB
  * story rests on — the probe filter sits directly on the big side's
  * scan, before any join/exchange.
  */
class BloomPruneSpec extends SparkTestBase {

  // lazy vals: one DataFrame instance each, so df("col") references
  // resolve against the same attribute ids everywhere in a test
  private lazy val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
    .select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity")
  private lazy val parts = spark.read.parquet(s"$sf0001/part.parquet")
    .filter(col("p_size") <= 5).select("p_partkey", "p_size")

  test("bloomPruneJoin equals the plain inner join") {
    val got = ScaleOps.bloomPruneJoin(li, Seq("l_partkey"),
        parts, Seq("p_partkey"))
      .orderBy("l_orderkey", "l_linenumber").collect()
    val want = li.join(parts, li("l_partkey") === parts("p_partkey"))
      .orderBy("l_orderkey", "l_linenumber").collect()
    assert(got.length === want.length)
    got.zip(want).foreach { case (g, w) => assert(g === w) }
  }

  test("bloomPrune keeps every matching row and actually prunes") {
    val pruned = ScaleOps.bloomPrune(li, Seq("l_partkey"),
      parts, Seq("p_partkey"), fpp = 0.01)
    val matching = li.join(parts.select("p_partkey").distinct(),
      li("l_partkey") === col("p_partkey"), "left_semi")
    // superset: no false negatives ever
    assert(matching.exceptAll(pruned).count() === 0L)
    // and a real prune: p_size <= 5 keeps ~10% of parts, so the surviving
    // fraction must be far below the full table even with fpp slack
    val (n, total) = (pruned.count(), li.count())
    assert(n < total / 2, s"prune kept $n of $total rows")
  }

  test("empty filtering side prunes everything; join result is empty") {
    val none = parts.filter(lit(false))
    assert(ScaleOps.bloomPrune(li, Seq("l_partkey"),
      none, Seq("p_partkey")).count() === 0L)
    assert(ScaleOps.bloomPruneJoin(li, Seq("l_partkey"),
      none, Seq("p_partkey")).count() === 0L)
  }

  test("null big-side keys survive the probe and fall out in the join") {
    import spark.implicits._
    val big = Seq((1L, java.lang.Long.valueOf(10L)),
      (2L, null.asInstanceOf[java.lang.Long]),
      (3L, java.lang.Long.valueOf(99L)))
      .toDF("id", "k")
    val small = Seq(10L).toDF("sk")
    val got = ScaleOps.bloomPruneJoin(big, Seq("k"), small, Seq("sk"))
      .select("id").as[Long].collect().toSeq
    assert(got === Seq(1L))
  }

  test("multi-column keys hash consistently across both sides") {
    import spark.implicits._
    val big = Seq(("a", 1L, 100.0), ("a", 2L, 200.0), ("b", 1L, 300.0))
      .toDF("g", "k", "v")
    val small = Seq(("a", 1L, "x"), ("b", 1L, "y"), ("c", 9L, "z"))
      .toDF("sg", "sk", "tag")
    val got = ScaleOps.bloomPruneJoin(big, Seq("g", "k"),
        small, Seq("sg", "sk"))
      .select("g", "k", "v", "tag").orderBy("g").collect()
    assert(got.length === 2)
    assert(got.map(_.getString(3)).toSeq === Seq("x", "y"))
  }

  test("clashing key names are rejected up front") {
    intercept[IllegalArgumentException] {
      ScaleOps.bloomPruneJoin(li, Seq("l_partkey"),
        parts.withColumnRenamed("p_partkey", "l_partkey"), Seq("l_partkey"))
    }
  }

  test("under a sort-merge join the probe filter runs below the exchange") {
    // the case the operator exists for: the small side is NOT
    // broadcastable, the join shuffles both sides — the bloom filter
    // must evaluate under the big side's Exchange so pruned rows never
    // pay the shuffle
    val thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = ScaleOps.bloomPruneJoin(li, Seq("l_partkey"),
        parts, Seq("p_partkey")).queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      val ex = plan.indexOf("Exchange hashpartitioning(l_partkey")
      val bloom = plan.indexOf("bloom_might_contain")
      val scan = plan.indexOf("FileScan", bloom)
      assert(ex >= 0 && bloom > ex && scan > bloom,
        s"bloom probe must sit between the big side's exchange and its " +
          s"scan (ex=$ex bloom=$bloom scan=$scan):\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
  }

  test("the probe filter sits on the scan, before the join/exchange") {
    val q = SparkEntry.queries("j12_bloom_prune_join")(spark, sf0001)
    val bloomFilters = q.queryExecution.optimizedPlan.collect {
      case f: Filter if f.condition.toString.contains("bloom_might_contain") => f
    }
    assert(bloomFilters.nonEmpty, "bloom probe filter missing from the plan")
    // the filter's subtree must be join-free: it prunes the big side's
    // scan stage, not the join output (which would shuffle pruned rows)
    bloomFilters.foreach { f =>
      assert(f.child.collect { case j: Join => j }.isEmpty,
        s"bloom probe must prune before the join:\n${f.treeString}")
    }
    // and it survives to the physical plan inside the codegen span
    assert(q.queryExecution.executedPlan.toString
      .contains("bloom_might_contain"))
  }
}
