package graft

import org.apache.spark.sql.functions._

import graft.graph.GraphOps

/** PageRank / degree operators (graft.graph.GraphOps). */
class GraphOpsSpec extends SparkTestBase {
  import spark.implicits._

  /** pmod(xxhash64(s), buckets) — the engine's fold-bucket function,
    * replayed with the same Catalyst hash the column expression uses.
    */
  private def bucketOf(s: String, buckets: Int): Int = {
    val h = org.apache.spark.sql.catalyst.expressions.XxHash64Function
      .hash(org.apache.spark.unsafe.types.UTF8String.fromString(s),
        org.apache.spark.sql.types.StringType, 42L)
    val m = (h % buckets).toInt
    if (m < 0) m + buckets else m
  }

  /** The engine's pinned two-level fold: src-ascending within a hash
    * bucket, bucket-ascending across partials (each level starts its
    * own 0.0 accumulator, like the aggregate() exprs).
    */
  private def twoLevelSum(inEdges: Seq[(String, String)],
      contrib: String => Double, buckets: Int): Double =
    inEdges.groupBy(ed => bucketOf(ed._1, buckets)).toSeq.sortBy(_._1)
      .foldLeft(0.0) { case (acc, (_, eds)) =>
        acc + eds.sortBy(_._1)
          .foldLeft(0.0)((p, ed) => p + contrib(ed._1))
      }

  /** Independent reference model: dense map-based PR, contributions
    * summed in the pinned two-level (bucket asc, src asc) order.
    */
  private def refPageRank(edges: Seq[(String, String)], iters: Int,
      d: Double = 0.85, buckets: Int = 1024): Map[String, Double] = {
    val e = edges.distinct
    val out = e.groupBy(_._1).view.mapValues(_.size).toMap
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct.sorted
    val n = nodes.length
    var pr = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to iters) {
      val in = e.groupBy(_._2)
      pr = nodes.map { v =>
        val sum = twoLevelSum(in.getOrElse(v, Seq.empty),
          s => pr(s) / out(s), buckets)
        v -> ((1.0 - d) / n + d * sum)
      }.toMap
    }
    pr
  }

  private def run(edges: Seq[(String, String)], iters: Int) =
    GraphOps.pageRank(edges.toDF("s", "d"), "s", "d", iters)
      .as[(String, Double)].collect().toMap

  test("cycle converges to uniform; matches the reference model exactly") {
    val cyc = Seq("a" -> "b", "b" -> "c", "c" -> "a")
    val got = run(cyc, 5)
    assert(got.keySet == Set("a", "b", "c"))
    got.values.foreach(v => assert(math.abs(v - 1.0 / 3) < 1e-15))
    assert(got == refPageRank(cyc, 5))
  }

  test("star graph concentrates rank on the hub; exact vs reference") {
    // undirected star (both directions so no dangling): hub h, leaves
    val edges = Seq("h" -> "l1", "h" -> "l2", "h" -> "l3",
      "l1" -> "h", "l2" -> "h", "l3" -> "h")
    val got = run(edges, 7)
    val ref = refPageRank(edges, 7)
    assert(got == ref) // bit-exact: same fold order
    assert(got("h") > got("l1") && got("l1") == got("l2"))
    // total mass is conserved (no dangling): sums to ~1
    assert(math.abs(got.values.sum - 1.0) < 1e-12)
  }

  test("parallel edges collapse to one") {
    val dup = Seq("a" -> "b", "a" -> "b", "b" -> "a")
    val got = run(dup, 4)
    assert(got == refPageRank(Seq("a" -> "b", "b" -> "a"), 4))
  }

  test("dangling nodes are rejected loudly") {
    val ex = intercept[IllegalArgumentException](
      run(Seq("a" -> "b"), 2))
    assert(ex.getMessage.contains("dangling"))
  }

  test("null endpoints drop; repartition-invariant to the bit") {
    val e = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"),
      ("c", "b"), ("b", "a"))
    val withNull = (e.map { case (a, b) => (a: String, b: String) } :+
      ((null: String), "a") :+ ("a", (null: String))).toDF("s", "d")
    val one = GraphOps.pageRank(withNull, "s", "d", 6)
      .as[(String, Double)].collect().toMap
    val many = GraphOps.pageRank(withNull.repartition(7), "s", "d", 6)
      .as[(String, Double)].collect().toMap
    assert(one == many)
    assert(one == refPageRank(e, 6))
  }

  test("degrees profile counts both directions with zero-fill") {
    val e = Seq("a" -> "b", "a" -> "c", "b" -> "c").toDF("s", "d")
    val got = GraphOps.degrees(e, "s", "d")
      .as[(String, Long, Long)].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
    assert(got == Map("a" -> (2L, 0L), "b" -> (1L, 1L), "c" -> (0L, 2L)))
  }

  test("parameter guards") {
    val e = Seq("a" -> "a").toDF("s", "d")
    intercept[IllegalArgumentException](GraphOps.pageRank(e, "s", "d", 0))
    intercept[IllegalArgumentException](
      GraphOps.pageRank(e, "s", "d", 3, damping = 1.0))
    intercept[IllegalArgumentException](
      GraphOps.pageRank(e.filter("s = 'zz'"), "s", "d", 3))
    intercept[IllegalArgumentException](
      GraphOps.pageRank(e, "s", "d", 3, srcBuckets = 0))
    intercept[IllegalArgumentException](
      GraphOps.pageRank(e, "s", "d", 3, srcBuckets = (1 << 20) + 1))
  }

  test("srcBuckets = 1 degenerates to the single global src-ascending " +
      "fold (the pre-bucketing contract)") {
    val half = Seq("a" -> "b", "b" -> "c", "c" -> "a", "a" -> "c",
      "d" -> "a", "e" -> "a", "f" -> "a")
    val edges = (half ++ half.map(_.swap)).distinct
    // single-bucket ref = one sorted fold over all in-edges
    def refFlat(iters: Int): Map[String, Double] =
      refPageRank(edges, iters, buckets = 1)
    val got = GraphOps.pageRank(edges.toDF("s", "d"), "s", "d", 5,
      srcBuckets = 1).as[(String, Double)].collect().toMap
    assert(got == refFlat(5))
  }

  test("a 100k-in-degree hub passes under a small bucket cap, " +
      "bit-exact vs the reference, and the cap changes only the fold " +
      "order (values agree to ~1e-12 across caps)") {
    // undirected star: hub h with 100_000 leaves (both directions so
    // no node dangles). With srcBuckets = 8 no aggregation buffer ever
    // holds more than ~12.5k in-edge structs — the shape that used to
    // OOM as a single per-dst collect_list at crawl scale.
    val nLeaves = 100000
    val leaves = (0 until nLeaves).map(i => f"l$i%06d")
    val edges = leaves.map(l => ("h", l)) ++ leaves.map(l => (l, "h"))
    val df = edges.toDF("s", "d").repartition(16)
    val got = GraphOps.pageRank(df, "s", "d", iterations = 2,
      srcBuckets = 8).as[(String, Double)].collect().toMap
    // in-memory two-level reference at the same cap
    val e = edges
    val out = e.groupBy(_._1).view.mapValues(_.size).toMap
    val n = nLeaves + 1
    var pr = (("h" :: leaves.toList)).map(_ -> 1.0 / n).toMap
    for (_ <- 1 to 2) {
      val in = e.groupBy(_._2)
      pr = pr.keys.map { v =>
        val sum = twoLevelSum(in.getOrElse(v, Seq.empty),
          s => pr(s) / out(s), 8)
        v -> (0.15 / n + 0.85 * sum)
      }.toMap
    }
    assert(got.size == n)
    assert(got("h") == pr("h"), s"hub: got ${got("h")}, exp ${pr("h")}")
    assert(got == pr)
    // different caps pin different float orders: same math, ulp-level
    // differences only
    val under4 = GraphOps.pageRank(df, "s", "d", iterations = 2,
      srcBuckets = 4).as[(String, Double)].collect().toMap
    assert(math.abs(under4("h") - got("h")) < 1e-12)
  }

  /** Independent reference model for seed-personalized PR: teleport
    * 1/|S| on seeds, 0 elsewhere; same sorted-source fold order.
    */
  private def refPersonalized(edges: Seq[(String, String)],
      seeds: Set[String], iters: Int,
      d: Double = 0.85, buckets: Int = 1024): Map[String, Double] = {
    val e = edges.distinct
    val out = e.groupBy(_._1).view.mapValues(_.size).toMap
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct.sorted
    val ns = seeds.size
    var pr = nodes.map(v => v -> (if (seeds(v)) 1.0 / ns else 0.0)).toMap
    for (_ <- 1 to iters) {
      val in = e.groupBy(_._2)
      pr = nodes.map { v =>
        val sum = twoLevelSum(in.getOrElse(v, Seq.empty),
          s => pr(s) / out(s), buckets)
        val tp = if (seeds(v)) (1.0 - d) / ns else 0.0
        v -> (tp + d * sum)
      }.toMap
    }
    pr
  }

  private def runSeeded(edges: Seq[(String, String)], seeds: Seq[String],
      iters: Int) =
    GraphOps.personalizedPageRank(edges.toDF("s", "d"), "s", "d",
        seeds.toDF("n"), "n", iters)
      .as[(String, Double)].collect().toMap

  test("trustrank: mass concentrates near the seed; matches the " +
      "reference model exactly; total mass conserved") {
    // undirected chain a-b-c-d (both directions: no dangling)
    val half = Seq("a" -> "b", "b" -> "c", "c" -> "d")
    val edges = half ++ half.map(_.swap)
    val got = runSeeded(edges, Seq("a"), 6)
    assert(got == refPersonalized(edges, Set("a"), 6))
    // the seed holds the most mass, the farthest node the least (the
    // walk oscillates between odd/even distances, so full monotone
    // decay is NOT guaranteed at finite iterations)
    assert(got("a") == got.values.max && got("d") == got.values.min,
      s"got $got")
    assert(math.abs(got.values.sum - 1.0) < 1e-12)
  }

  test("trustrank with ALL nodes as seeds equals plain pageRank " +
      "bit-for-bit") {
    val half = Seq("a" -> "b", "b" -> "c", "c" -> "a", "a" -> "c")
    val edges = half ++ half.map(_.swap)
    val plain = run(edges, 5)
    val seeded = runSeeded(edges, Seq("a", "b", "c"), 5)
    assert(plain == seeded)
  }

  test("trustrank: unreachable nodes score zero") {
    // two disconnected 2-cycles; seed only in the first
    val edges = Seq("a" -> "b", "b" -> "a", "x" -> "y", "y" -> "x")
    val got = runSeeded(edges, Seq("a"), 4)
    assert(got("x") == 0.0 && got("y") == 0.0)
    assert(got("a") > 0.0 && got("b") > 0.0)
  }

  test("trustrank guards: stray seeds and seedless graphs are " +
      "rejected loudly; duplicate seeds collapse") {
    val edges = Seq("a" -> "b", "b" -> "a")
    val stray = intercept[IllegalArgumentException](
      runSeeded(edges, Seq("a", "zz"), 3))
    assert(stray.getMessage.contains("not nodes"))
    val none = intercept[IllegalArgumentException](
      runSeeded(edges, Seq("zz"), 3))
    assert(none.getMessage.contains("no seed"))
    assert(runSeeded(edges, Seq("a", "a"), 3) ==
      refPersonalized(edges, Set("a"), 3))
  }

  test("trustrank property: random graphs + random seed sets match " +
      "the reference model bit-for-bit under random partitionings") {
    val rnd = new scala.util.Random(29)
    for (round <- 1 to 6) {
      val n = 3 + rnd.nextInt(15)
      val half = (0 until (n * 2)).map { _ =>
        (s"n${rnd.nextInt(n)}", s"n${rnd.nextInt(n)}")
      }.filter(p => p._1 != p._2)
      val edges = (half ++ half.map(_.swap)).distinct
      if (edges.nonEmpty) {
        val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
        val seeds = rnd.shuffle(nodes).take(1 + rnd.nextInt(nodes.size))
        val iters = 1 + rnd.nextInt(6)
        val got = GraphOps.personalizedPageRank(
            edges.toDF("s", "d").repartition(1 + rnd.nextInt(5)),
            "s", "d", seeds.toDF("n").repartition(2), "n", iters)
          .as[(String, Double)].collect().toMap
        assert(got == refPersonalized(edges, seeds.toSet, iters),
          s"round $round: n=$n iters=$iters seeds=${seeds.size}")
        assert(math.abs(got.values.sum - 1.0) < 1e-9)
      }
    }
  }

  /** Reference model of the synchronous deterministic LPA variant. */
  private def refLabelProp(edges: Seq[(String, String)],
      iters: Int): Map[String, String] = {
    val e = edges.distinct
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct
    var lab = nodes.map(n => n -> n).toMap
    for (_ <- 1 to iters) {
      val next = nodes.map { n =>
        val votes = e.filter(_._2 == n).map(x => lab(x._1))
          .groupBy(identity).view.mapValues(_.size).toSeq
        n -> (if (votes.isEmpty) lab(n)
              else votes.minBy { case (l, c) => (-c, l) }._1)
      }.toMap
      lab = next
    }
    lab
  }

  test("labelPropagation: two planted cliques resolve to two communities") {
    def clique(ns: Seq[String]) =
      for (a <- ns; b <- ns if a != b) yield (a, b)
    val edges = clique(Seq("a1", "a2", "a3", "a4")) ++
      clique(Seq("b1", "b2", "b3"))
    val got = GraphOps.labelPropagation(edges.toDF("s", "d"), "s", "d",
      iterations = 5).as[(String, String)].collect().toMap
    assert(got == refLabelProp(edges, 5))
    val aComm = Seq("a1", "a2", "a3", "a4").map(got)
    assert(aComm.distinct.size == 1)
    val bComm = Seq("b1", "b2", "b3").map(got)
    assert(bComm.distinct.size == 1 && bComm.head != aComm.head)
  }

  test("labelPropagation: vote-less nodes keep their label; " +
      "repartition-invariant to the bit") {
    val edges = Seq(("x", "y"), ("y", "z")) // z has no out-edge: x gets no votes? x has none in
    val df = edges.toDF("s", "d")
    val got = GraphOps.labelPropagation(df, "s", "d", 3)
      .as[(String, String)].collect().toMap
    assert(got == refLabelProp(edges, 3))
    assert(got("x") == "x") // no in-neighbors: keeps its own label
    val re = GraphOps.labelPropagation(df.repartition(7), "s", "d", 3)
      .as[(String, String)].collect().toMap
    assert(re == got)
  }

  test("labelPropagation property: random graphs match the reference") {
    val rnd = new scala.util.Random(2026)
    for (_ <- 1 to 5) {
      val n = 2 + rnd.nextInt(8)
      val edges = (1 to (n * 2)).map(_ =>
        (s"n${rnd.nextInt(n)}", s"n${rnd.nextInt(n)}"))
        .filter(e => e._1 != e._2)
      if (edges.nonEmpty) {
        val iters = 1 + rnd.nextInt(4)
        val got = GraphOps.labelPropagation(edges.toDF("s", "d"),
          "s", "d", iters).as[(String, String)].collect().toMap
        assert(got == refLabelProp(edges, iters),
          s"mismatch on $edges iters=$iters")
      }
    }
  }

  test("labelPropagation preserves node type; numeric ties break numerically") {
    // nodes 9 and 10 vote-tie on node 2: smallest label must be 9
    // (numeric order), not "10" (lexicographic) — type is preserved
    val edges = Seq((9L, 2L), (10L, 2L)).toDF("s", "d")
    val out = GraphOps.labelPropagation(edges, "s", "d", 1)
    assert(out.schema("node").dataType ==
      org.apache.spark.sql.types.LongType)
    val got = out.as[(Long, Long)].collect().toMap
    assert(got(2L) == 9L, s"numeric tie must pick 9, got ${got(2L)}")
  }

  test("labelPropagation guards") {
    val df = Seq(("a", "b")).toDF("s", "d")
    intercept[IllegalArgumentException](
      GraphOps.labelPropagation(df, "s", "d", 0))
    intercept[IllegalArgumentException](
      GraphOps.labelPropagation(df, "s", "d", 21))
  }

  test("property: random undirected graphs match the reference model " +
      "bit-for-bit under random partitionings") {
    val rnd = new scala.util.Random(17)
    for (round <- 1 to 8) {
      val n = 3 + rnd.nextInt(18)
      val half = (0 until (n * 2)).map { _ =>
        (s"n${rnd.nextInt(n)}", s"n${rnd.nextInt(n)}")
      }.filter(p => p._1 != p._2)
      // union both directions: no dangling by construction; isolated
      // self-loop nodes keep outdeg >= 1 too
      val edges = (half ++ half.map(_.swap)).distinct
      if (edges.nonEmpty) {
        val iters = 1 + rnd.nextInt(7)
        val df = edges.toDF("s", "d").repartition(1 + rnd.nextInt(7))
        val got = GraphOps.pageRank(df, "s", "d", iters)
          .as[(String, Double)].collect().toMap
        assert(got == refPageRank(edges, iters),
          s"round $round: n=$n iters=$iters edges=${edges.size}")
        assert(math.abs(got.values.sum - 1.0) < 1e-9)
      }
    }
  }

  /** Brute-force per-node triangle counts over the canonical
    * undirected simple graph (u < v distinct pairs, no self loops).
    */
  private def refTriangles(edges: Seq[(String, String)])
      : Map[String, (Long, Long)] = {
    val e = edges.filter(p => p._1 != p._2)
      .map(p => if (p._1 < p._2) p else p.swap).distinct
    val es = e.toSet
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct
    val deg = (e.map(_._1) ++ e.map(_._2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val tris = for {
      (a, b) <- e
      c <- nodes if b < c && es.contains((a, c)) && es.contains((b, c))
    } yield (a, b, c)
    val tc = tris.flatMap(t => Seq(t._1, t._2, t._3))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    nodes.map(n => n -> (deg(n), tc.getOrElse(n, 0L))).toMap
  }

  private def runTriangles(edges: Seq[(String, String)])
      : Map[String, (Long, Long)] =
    GraphOps.triangleCounts(edges.toDF("s", "d"), "s", "d")
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap

  test("triangles: K4 has 3 per node; C5 has none; direction, " +
      "parallel edges and self loops collapse") {
    val k4 = for {
      a <- Seq("a", "b", "c", "d"); b <- Seq("a", "b", "c", "d")
      if a < b
    } yield (a, b)
    assert(runTriangles(k4) ==
      Map("a" -> (3L, 3L), "b" -> (3L, 3L), "c" -> (3L, 3L),
        "d" -> (3L, 3L)))
    val c5 = Seq("a" -> "b", "b" -> "c", "c" -> "d", "d" -> "e",
      "e" -> "a")
    assert(runTriangles(c5).values.forall(_ == (2L, 0L)))
    // one triangle written with reversed/parallel/self-loop noise
    val noisy = Seq("a" -> "b", "b" -> "a", "b" -> "c", "c" -> "a",
      "a" -> "a", "c" -> "b")
    assert(runTriangles(noisy) ==
      Map("a" -> (2L, 1L), "b" -> (2L, 1L), "c" -> (2L, 1L)))
  }

  test("triangles: property — random graphs match the brute-force " +
      "reference under random partitionings") {
    val rnd = new scala.util.Random(23)
    for (round <- 1 to 8) {
      val n = 4 + rnd.nextInt(16)
      val edges = (0 until (n * 3)).map { _ =>
        (s"n${rnd.nextInt(n)}", s"n${rnd.nextInt(n)}")
      }.filter(p => p._1 != p._2)
      if (edges.nonEmpty) {
        val df = edges.toDF("s", "d").repartition(1 + rnd.nextInt(7))
        val got = GraphOps.triangleCounts(df, "s", "d")
          .as[(String, Long, Long)].collect()
          .map(r => r._1 -> (r._2, r._3)).toMap
        assert(got == refTriangles(edges), s"round $round n=$n")
      }
    }
  }
}
