package graft

import org.apache.spark.sql.functions._

import graft.ops.{Packing, Sampling}

class SamplingPackingSpec extends SparkTestBase {

  test("hash split is deterministic, exhaustive, and append-stable") {
    import spark.implicits._
    val ids = (0L until 2000L).toDF("id")
    val fr = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val a = Sampling.hashSplit(ids, "id", fr).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = Sampling.hashSplit(ids.repartition(13), "id", fr).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a === b) // layout-independent
    assert(a.values.toSet.subsetOf(Set("train", "val", "test")))
    // appending new rows never moves old assignments
    val grown = Sampling.hashSplit((0L until 4000L).toDF("id"), "id", fr)
      .filter(col("id") < 2000).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(grown === a)
    // fractions land within a few percent at n=2000
    val counts = a.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(math.abs(counts("train") / 2000.0 - 0.8) < 0.05)
    assert(math.abs(counts("val") / 2000.0 - 0.1) < 0.04)
    assert(math.abs(counts("test") / 2000.0 - 0.1) < 0.04)
  }

  test("hash sample rate tracks the fraction; salts are independent") {
    import spark.implicits._
    val ids = (0L until 5000L).toDF("id")
    val n1 = Sampling.hashSample(ids, "id", 0.25, salt = 1).count()
    assert(math.abs(n1 / 5000.0 - 0.25) < 0.03)
    val s1 = Sampling.hashSample(ids, "id", 0.5, salt = 1)
    val s2 = Sampling.hashSample(ids, "id", 0.5, salt = 2)
    val overlap = s1.join(s2, "id").count()
    // independent halves overlap ~25% of the universe
    assert(math.abs(overlap / 5000.0 - 0.25) < 0.05)
  }

  test("stratified sample: per-stratum rates, layout/append stability") {
    import spark.implicits._
    val rows = (0L until 6000L).map(i =>
      (i, Seq("en", "de", "rare")(((i % 3).toInt)))).toDF("id", "lang")
    val fr = Seq("en" -> 0.5, "de" -> 0.2)
    val kept = Sampling.stratifiedSample(rows, "id", "lang", fr,
      defaultFraction = 1.0)
    val byLang = kept.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(byLang("en") / 2000.0 - 0.5) < 0.05)
    assert(math.abs(byLang("de") / 2000.0 - 0.2) < 0.04)
    assert(byLang("rare") === 2000L) // default keeps everything
    // layout-independent membership
    val a = kept.select("id").collect().map(_.getLong(0)).toSet
    val b = Sampling.stratifiedSample(rows.repartition(17), "id", "lang",
      fr, defaultFraction = 1.0).select("id").collect()
      .map(_.getLong(0)).toSet
    assert(a === b)
    // membership is a pure function of (id, lang): appending rows never
    // changes prior decisions
    val grown = Sampling.stratifiedSample(
      (0L until 12000L).map(i => (i, Seq("en", "de", "rare")((i % 3).toInt)))
        .toDF("id", "lang"), "id", "lang", fr, defaultFraction = 1.0)
      .filter(col("id") < 6000).select("id").collect().map(_.getLong(0)).toSet
    assert(grown === a)
  }

  test("groupAwareSplit: co-assignment, hashSplit equivalence, null " +
      "groups rejected") {
    import spark.implicits._
    // docs with a group (dup-cluster) id: every member of a group must
    // land in the same split
    val docs = (1L to 500L).map(i => (i, i % 37)).toDF("doc_id", "cluster")
    val fr = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val split = Sampling.groupAwareSplit(docs, "cluster", fr)
    val perGroup = split.groupBy("cluster")
      .agg(countDistinct(col("split")).as("n"))
      .agg(max(col("n"))).as[Long].head()
    assert(perGroup === 1L, "a group must never straddle splits")
    // the label is exactly hashSplit's label computed on the group id
    val viaHash = Sampling.hashSplit(
      docs.select(col("cluster").as("id")).distinct(), "id", fr)
      .as[(Long, String)].collect().toMap
    val got = split.select("cluster", "split").distinct()
      .as[(Long, String)].collect().toMap
    assert(got === viaHash)
    assert(got.values.toSet.size === 3)
    // null group: loud failure, not silent scattering
    val withNull = docs.union(Seq((501L, null.asInstanceOf[java.lang.Long]))
      .toDF("doc_id", "cluster"))
    val e = intercept[Exception](
      Sampling.groupAwareSplit(withNull, "cluster", fr).collect())
    val msg = e.getMessage +
      (if (e.getCause != null) e.getCause.getMessage else "")
    assert(msg.contains("groupAwareSplit"), msg)
  }

  test("tokenBudgetSelect: histogram-prefix shape equals the direct " +
      "full-sort cumulative rule, ties and boundary exact") {
    import spark.implicits._
    // crafted: ties in score (the straddling tie group), a doc landing
    // exactly ON the budget, a zero-token doc at the boundary, and a
    // domain entirely under budget
    val docs = Seq(
      // domain a, budget 10: score 5.0 group = ids 1,2,3 (tk 4, 3, 3)
      // run: 4, 7, 10 -> all kept (id 3 exactly on budget)
      (1L, "a", 4L, 5.0), (2L, "a", 3L, 5.0), (3L, "a", 3L, 5.0),
      // next group score 4.0: id 4 (tk 0) run 10 -> kept; id 5 (tk 1)
      // run 11 -> dropped, and id 6 after it dropped too
      (4L, "a", 0L, 4.0), (5L, "a", 1L, 4.0), (6L, "a", 9L, 3.0),
      // domain b entirely under budget
      (7L, "b", 2L, 1.0), (8L, "b", 3L, 9.9)).toDF("id", "dm", "tk", "sc")
    val kept = Sampling.tokenBudgetSelect(docs, "id", "dm", "tk", "sc",
      budget = 10L).as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    assert(kept.map(_._1) === Seq(1L, 2L, 3L, 4L, 7L, 8L))
    assert(kept.map(_._3) === Seq(4L, 3L, 3L, 0L, 2L, 3L))
    // direct-rule reference on a randomized corpus, multiple budgets
    val rnd = new scala.util.Random(20260815)
    val corpus = (1L to 400L).map(i => (i,
      s"d${rnd.nextInt(4)}", rnd.nextInt(20).toLong,
      math.floor(rnd.nextDouble() * 10) / 2.0)) // coarse scores => ties
    val cdf = corpus.toDF("id", "dm", "tk", "sc")
    for (budget <- Seq(5L, 40L, 300L, 100000L)) {
      val got = Sampling.tokenBudgetSelect(cdf, "id", "dm", "tk", "sc",
        budget).as[(Long, String, Long)].collect().map(_._1).toSet
      val want = corpus.groupBy(_._2).values.flatMap { rows =>
        val ordered = rows.sortBy(r => (-r._4, r._1))
        val runs = ordered.scanLeft(0L)(_ + _._3).tail
        ordered.zip(runs).takeWhile(_._2 <= budget).map(_._1._1)
      }.toSet
      assert(got === want, s"budget=$budget")
    }
    // nulls/negatives excluded, never crash the selection
    val withBad = docs.union(Seq((9L, null.asInstanceOf[String], 1L, 1.0),
      (10L, "a", -1L, 1.0)).toDF("id", "dm", "tk", "sc"))
    val cleaned = Sampling.tokenBudgetSelect(withBad, "id", "dm", "tk",
      "sc", budget = 10L).as[(Long, String, Long)].collect().map(_._1).toSet
    assert(cleaned === Set(1L, 2L, 3L, 4L, 7L, 8L))
    intercept[IllegalArgumentException](
      Sampling.tokenBudgetSelect(docs, "id", "dm", "tk", "sc", 0L))
  }

  test("tokenBudgetSelect: repartition invariance (row set identical " +
      "on any layout)") {
    import spark.implicits._
    val corpus = (1L to 300L).map(i =>
      (i, s"d${i % 3}", (i * 7 % 15), (i % 9).toDouble))
      .toDF("id", "dm", "tk", "sc")
    val base = Sampling.tokenBudgetSelect(corpus, "id", "dm", "tk", "sc",
      100L).as[(Long, String, Long)].collect().toSet
    val shuffled = Sampling.tokenBudgetSelect(corpus.repartition(17),
      "id", "dm", "tk", "sc", 100L).as[(Long, String, Long)].collect().toSet
    assert(base === shuffled && base.nonEmpty)
  }

  test("packChunks: intervals are contiguous per shard and spans correct") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val docs = (0L until 500L).map(i => (i, rnd.nextInt(300).toLong))
      .toDF("id", "n_tok")
    val out = Packing.packChunks(docs, "id", "n_tok", maxTokens = 100L,
      nShards = 4).collect()

    // per shard: start_tok of each doc equals sum of earlier docs' tokens
    val byShard = out.groupBy(_.getAs[Long]("shard"))
    for ((_, rows) <- byShard) {
      val sorted = rows.sortBy(_.getAs[Long]("id"))
      var cum = 0L
      for (r <- sorted) {
        assert(r.getAs[Long]("start_tok") === cum)
        cum += r.getAs[Long]("n_tok")
      }
    }
    // chunk span matches the closed-form interval arithmetic
    for (r <- out) {
      val start = r.getAs[Long]("start_tok")
      val n = r.getAs[Long]("n_tok")
      val first = r.getAs[Long]("first_chunk")
      val last = r.getAs[Long]("last_chunk")
      assert(first === start / 100)
      if (n > 0) {
        assert(last === (start + n - 1) / 100)
        assert(r.getAs[Long]("n_chunks") === last - first + 1)
      } else {
        assert(r.getAs[Long]("n_chunks") === 0L)
      }
    }
  }

  test("packChunks: every chunk except a shard's last is exactly full") {
    import spark.implicits._
    // token counts that never exceed maxTokens, so chunk occupancy is a
    // simple partition of the stream
    val docs = (0L until 200L).map(i => (i, (i % 7) + 1L)).toDF("id", "n_tok")
    val out = Packing.packChunks(docs, "id", "n_tok", 50L, 2)
    val totals = out.groupBy("shard").agg(sum("n_tok").as("tot"),
        max("last_chunk").as("maxc")).collect()
    for (r <- totals) {
      val tot = r.getAs[Long]("tot")
      val maxc = r.getAs[Long]("maxc")
      assert(maxc === (tot - 1) / 50) // stream fills chunks densely
    }
  }

  test("sampleKPerGroup: exact k per group, hash-ranked, both id gates") {
    import spark.implicits._
    val df = (0L until 300L).map(i => (i, s"g${i % 3}")).toDF("id", "g")
    val got = Sampling.sampleKPerGroup(df, Seq("g"), "id", 5)
      .as[(String, Long, Long)].collect()
    assert(got.length == 15)
    assert(got.groupBy(_._1).forall { case (_, rs) =>
      rs.map(_._3).sorted.toSeq == Seq(1L, 2L, 3L, 4L, 5L) })
    // reference: k smallest (xxhash64(id), id) per group via the window
    val expect = df.select(col("g"), col("id"), xxhash64(col("id")).as("h"))
      .as[(String, Long, Long)].collect()
      .groupBy(_._1).toSeq.flatMap { case (g, rs) =>
        rs.sortBy(r => (r._3, r._2)).take(5).zipWithIndex
          .map { case (r, i) => (g, r._2, i + 1L) }
      }.toSet
    assert(got.toSet == expect)
    // string-id gate (window fallback) keeps identical semantics
    val sdf = df.select(concat(lit("x"), col("id")).as("sid"), col("g"))
    val gotS = Sampling.sampleKPerGroup(sdf, Seq("g"), "sid", 5)
      .as[(String, String, Long)].collect()
    val expectS = sdf.select(col("g"), col("sid"),
        xxhash64(col("sid")).as("h"))
      .as[(String, String, Long)].collect()
      .groupBy(_._1).toSeq.flatMap { case (g, rs) =>
        rs.sortBy(r => (r._3, r._2)).take(5).zipWithIndex
          .map { case (r, i) => (g, r._2, i + 1L) }
      }.toSet
    assert(gotS.toSet == expectS)
    // append stability: new rows can only displace survivors toward the
    // tail (a fresh smaller priority inserts ahead), never promote them
    // or reorder them relative to each other
    val more = ((0L until 300L) ++ (1000L until 1100L))
      .map(i => (i, s"g${i % 3}")).toDF("id", "g")
    val after = Sampling.sampleKPerGroup(more, Seq("g"), "id", 5)
      .as[(String, Long, Long)].collect().toSet
    after.foreach { case (g, id, newRk) =>
      got.find(x => x._1 == g && x._2 == id).foreach { case (_, _, rk) =>
        assert(newRk >= rk, s"($g,$id) promoted $rk -> $newRk")
      }
    }
    // groups smaller than k return the whole group
    val tiny = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("id", "g")
    assert(Sampling.sampleKPerGroup(tiny, Seq("g"), "id", 5)
      .count() == 3)
    intercept[IllegalArgumentException](
      Sampling.sampleKPerGroup(tiny, Seq("g"), "id", 0))
    intercept[IllegalArgumentException](
      Sampling.sampleKPerGroup(tiny, Seq.empty, "id", 2))
  }

  /** The engine's hash-uniform priority, replayed in the JVM. */
  private def refPriority(id: Long, w: Long): Double = {
    val h = org.apache.spark.sql.catalyst.expressions.XxHash64Function
      .hash(id, org.apache.spark.sql.types.LongType, 42L)
    val u = new java.math.BigDecimal(java.lang.Long.toUnsignedString(h))
      .doubleValue()
    w.toDouble * 1.8446744073709552e19 / (u + 1.0)
  }

  test("priority sample: matches the reference model, is layout-" +
      "stable, estimator is exact when the population fits") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val rows = (1L to 800L).map(id => (id, 1L + rnd.nextInt(500)))
    val df = rows.toDF("id", "w")
    val k = 32
    // reference: top-k by (q desc, id asc); tau = (k+1)-th priority
    val ranked = rows.map { case (id, w) => (id, w, refPriority(id, w)) }
      .sortBy(t => (-t._3, t._1))
    val tau = ranked(k)._3
    val expect = ranked.take(k)
      .map(t => (t._1, t._2, t._3, math.max(t._2.toDouble, tau))).toSet
    val got = Sampling.prioritySample(df.repartition(9), "id", "w", k)
      .as[(Long, Long, Double, Double)].collect().toSet
    assert(got == expect)
    // layout independence
    val again = Sampling.prioritySample(df.repartition(2), "id", "w", k)
      .as[(Long, Long, Double, Double)].collect().toSet
    assert(again == got)
    // exact regime: k >= population -> est_w == w, sum preserved
    val small = rows.take(20).toDF("id", "w")
    val exact = Sampling.prioritySample(small, "id", "w", 32)
      .as[(Long, Long, Double, Double)].collect()
    assert(exact.length == 20)
    assert(exact.forall(r => r._4 == r._2.toDouble))
    // nulls and non-positive weights are excluded
    val noisy = (rows.take(10).map { case (i, w) =>
      (Option(i), Option(w)) } ++
      Seq((Some(901L), Some(0L)), (Some(902L), None), (None, Some(3L))))
      .toDF("id", "w")
    assert(Sampling.prioritySample(noisy, "id", "w", 32).count() == 10)
  }

  test("per-group priority sample equals the global operator run on " +
      "each group alone") {
    import spark.implicits._
    val rnd = new scala.util.Random(29)
    val rows = (1L to 900L).map(id =>
      (s"g${id % 4}", id, 1L + rnd.nextInt(300)))
    val df = rows.toDF("g", "id", "w")
    val grouped = Sampling
      .prioritySamplePerGroup(df.repartition(8), "g", "id", "w", 16)
      .as[(String, Long, Long, Double, Double)].collect()
      .groupBy(_._1).view
      .mapValues(_.map(r => (r._2, r._3, r._4, r._5)).toSet).toMap
    for (g <- Seq("g0", "g1", "g2", "g3")) {
      val single = Sampling.prioritySample(
          df.filter(col("g") === g).drop("g"), "id", "w", 16)
        .as[(Long, Long, Double, Double)].collect().toSet
      assert(grouped(g) == single, s"group $g")
    }
    // a group smaller than k stays in the exact regime (est_w == w)
    val tiny = (rows.take(5).map { case (_, id, w) => ("small", id, w) }
      ++ rows.map { case (_, id, w) => ("big", id + 1000, w) })
      .toDF("g", "id", "w")
    val small = Sampling
      .prioritySamplePerGroup(tiny, "g", "id", "w", 16)
      .filter(col("g") === "small")
      .as[(String, Long, Long, Double, Double)].collect()
    assert(small.length == 5 && small.forall(r => r._5 == r._3.toDouble))
  }

  test("priority sample: subset-sum estimator is unbiased within " +
      "sampling error across disjoint hash-seeded populations") {
    import spark.implicits._
    // 40 independent populations (shifted id ranges = fresh hash
    // draws); the mean of the est_w totals must approach the true
    // total (CLT check, generous 5% band at n=40 x k=64)
    val rnd = new scala.util.Random(13)
    val weights = (1 to 400).map(_ => 1L + rnd.nextInt(100))
    val trueTotal = weights.map(_.toDouble).sum
    val estimates = (0 until 40).map { s =>
      val df = weights.zipWithIndex
        .map { case (w, i) => (s * 100000L + i, w) }.toDF("id", "w")
      Sampling.prioritySample(df, "id", "w", 64)
        .agg(sum(col("est_w"))).as[Double].head()
    }
    val mean = estimates.sum / estimates.size
    assert(math.abs(mean - trueTotal) / trueTotal < 0.05,
      s"mean estimate $mean vs true $trueTotal")
  }
}
