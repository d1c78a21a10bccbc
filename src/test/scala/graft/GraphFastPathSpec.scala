package graft

import org.apache.spark.sql.functions._

import graft.graph.GraphOps

/** The small-graph single-task fast paths of graft.graph.GraphOps must
  * be BIT-IDENTICAL to the iterative rounds (the CcPropertySpec
  * contract): same xxhash64 fold buckets, same (bucket asc, src asc)
  * two-level float order, same integer votes — so `smallGraphEdges = 0`
  * (force iterative) and the default (fast) must agree to the last ulp
  * on any graph, for string and long node ids alike.
  */
class GraphFastPathSpec extends SparkTestBase {
  import spark.implicits._

  /** Random simple digraph with both edge directions (no dangling
    * nodes), string ids shaped like the gate's p/s prefixes.
    */
  private def randomEdges(seed: Int, n: Int,
      m: Int): Seq[(String, String)] = {
    val rnd = new scala.util.Random(seed)
    val raw = (1 to m).map { _ =>
      (s"p${rnd.nextInt(n)}", s"s${rnd.nextInt(n)}")
    }.filter(e => e._1 != e._2).distinct
    raw ++ raw.map(e => (e._2, e._1))
  }

  test("pageRank: fast path == iterative rounds to the bit (strings)") {
    for (seed <- 1 to 3) {
      val e = randomEdges(seed, 40, 120).toDF("s", "d")
      val fast = GraphOps.pageRank(e, "s", "d", iterations = 6)
        .as[(String, Double)].collect().toMap
      val iter = GraphOps.pageRank(e, "s", "d", iterations = 6,
          smallGraphEdges = 0L)
        .as[(String, Double)].collect().toMap
      assert(fast.keySet == iter.keySet)
      fast.foreach { case (k, v) =>
        assert(v == iter(k), s"seed $seed node $k: $v != ${iter(k)}")
      }
    }
  }

  test("pageRank: fast path == iterative rounds to the bit (longs)") {
    val rnd = new scala.util.Random(7)
    val raw = (1 to 150).map(_ =>
      (rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      .filter(e => e._1 != e._2).distinct
    val e = (raw ++ raw.map(x => (x._2, x._1))).toDF("s", "d")
    val fast = GraphOps.pageRank(e, "s", "d", iterations = 5)
      .as[(Long, Double)].collect().toMap
    val iter = GraphOps.pageRank(e, "s", "d", iterations = 5,
        smallGraphEdges = 0L)
      .as[(Long, Double)].collect().toMap
    assert(fast == iter)
  }

  test("personalizedPageRank: fast == iterative to the bit, seeds kept") {
    val e = randomEdges(11, 30, 100).toDF("s", "d")
    val seeds = e.select(col("s")).distinct().limit(5)
      .withColumnRenamed("s", "seed")
    val fast = GraphOps.personalizedPageRank(e, "s", "d", seeds, "seed",
        iterations = 6)
      .as[(String, Double)].collect().toMap
    val iter = GraphOps.personalizedPageRank(e, "s", "d", seeds, "seed",
        iterations = 6, smallGraphEdges = 0L)
      .as[(String, Double)].collect().toMap
    assert(fast.keySet == iter.keySet)
    fast.foreach { case (k, v) =>
      assert(v == iter(k), s"node $k: $v != ${iter(k)}")
    }
    // unreachable nodes score 0 on both paths
    assert(fast.values.exists(_ == 0.0) == iter.values.exists(_ == 0.0))
  }

  test("labelPropagation: fast == iterative labels exactly") {
    for (seed <- 4 to 6) {
      val e = randomEdges(seed, 25, 80).toDF("s", "d")
      val fast = GraphOps.labelPropagation(e, "s", "d", iterations = 4)
        .as[(String, String)].collect().toMap
      val iter = GraphOps.labelPropagation(e, "s", "d", iterations = 4,
          smallGraphEdges = 0L)
        .as[(String, String)].collect().toMap
      assert(fast == iter, s"seed $seed")
    }
  }

  test("triangleCounts: fast path == distributed wedge enumeration") {
    for (seed <- 7 to 9) {
      // NON-bipartite random graph (randomEdges' p/s split has no
      // triangles by construction)
      val rnd = new scala.util.Random(seed)
      val e = (1 to 200).map(_ =>
          (s"n${rnd.nextInt(25)}", s"n${rnd.nextInt(25)}"))
        .filter(x => x._1 != x._2).distinct.toDF("s", "d")
      val fast = GraphOps.triangleCounts(e, "s", "d")
        .as[(String, Long, Long)].collect().toSet
      val iter = GraphOps.triangleCounts(e, "s", "d",
          smallGraphEdges = 0L)
        .as[(String, Long, Long)].collect().toSet
      assert(fast == iter, s"seed $seed")
      // non-vacuous: the random graphs must actually contain triangles
      assert(fast.exists(_._3 > 0L), s"seed $seed produced no triangles")
    }
  }

  test("fast path plans as one object fold; iterative keeps the joins") {
    val e = randomEdges(2, 20, 60).toDF("s", "d")
    val fastPlan = GraphOps.pageRank(e, "s", "d", iterations = 3)
      .queryExecution.executedPlan.toString
    assert(fastPlan.contains("MapGroups"),
      s"small graph must take the single-task fold:\n$fastPlan")
    val iterPlan = GraphOps.pageRank(e, "s", "d", iterations = 3,
        smallGraphEdges = 0L)
      .queryExecution.executedPlan.toString
    assert(!iterPlan.contains("MapGroups"),
      s"smallGraphEdges = 0 must force the iterative rounds:\n$iterPlan")
  }

  test("unsupported id types always iterate (gating, identical output)") {
    // double node ids are outside the hash-kernel guarantee — the
    // default bound must NOT route them through the fast path
    val e = Seq((1.5, 2.5), (2.5, 1.5), (2.5, 3.5), (3.5, 2.5))
      .toDF("s", "d")
    val plan = GraphOps.pageRank(e, "s", "d", iterations = 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("MapGroups"),
      s"ungated id type must stay iterative:\n$plan")
  }
}
