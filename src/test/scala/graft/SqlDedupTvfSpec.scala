package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

import graft.dedup.Dedup

/** SQL-vs-Scala parity for the LLM-pipeline table-valued functions
  * (`minhash_near_dups`, `decontaminate`, `scrub_repeated_ngrams`) — the
  * SQL surface the round-7 brief asked for on top of the join TVFs
  * pinned by SqlTableFunctionsSpec (join TVFs) and SqlRecipesSpec (pure-SQL recipes). Each TVF must return exactly the
  * rows the Scala operator returns (it IS the Scala operator's plan),
  * and must compose under an outer SELECT so a pure-SQL pipeline can
  * chain them.
  */
class SqlDedupTvfSpec extends SparkTestBase {

  private def docs: DataFrame = {
    import spark.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "the quick brown fox jumps over the lazy cat again and again"),
      (4L, "completely different content with no overlap whatsoever here"),
      (5L, "benchmark question about the meaning of life the universe"))
      .toDF("doc_id", "text")
  }

  private def bench: DataFrame = {
    import spark.implicits._
    Seq((100L, "benchmark question about the meaning of life the universe"))
      .toDF("q_id", "question")
  }

  private def sameRows(a: DataFrame, b: DataFrame): Unit = {
    assert(a.columns.sorted.toSeq === b.columns.sorted.toSeq)
    val cols = a.columns.sorted.toIndexedSeq
    val diff = a.select(cols.head, cols.tail: _*)
      .exceptAll(b.select(cols.head, cols.tail: _*)).count() +
      b.select(cols.head, cols.tail: _*)
        .exceptAll(a.select(cols.head, cols.tail: _*)).count()
    assert(diff === 0)
  }

  test("minhash_near_dups TVF matches the Scala operator, defaults and full arity") {
    GraftExtensions.register(spark)
    docs.createOrReplaceTempView("sql_docs")

    val sqlDefault =
      spark.sql("SELECT * FROM minhash_near_dups('sql_docs', 'doc_id', 'text')")
    sameRows(sqlDefault, Dedup.minhashNearDups(docs, "doc_id", "text"))
    // the crafted corpus has a guaranteed exact-dup pair
    assert(sqlDefault.count() >= 1)

    sameRows(
      spark.sql("""SELECT * FROM minhash_near_dups('sql_docs', 'doc_id',
                                                   'text', 3, 32, 8, 0.5)"""),
      Dedup.minhashNearDups(docs, "doc_id", "text", threshold = 0.5))
  }

  test("decontaminate TVF matches the Scala operator and drops the planted hit") {
    GraftExtensions.register(spark)
    docs.createOrReplaceTempView("sql_docs")
    bench.createOrReplaceTempView("sql_bench")

    val sql = spark.sql(
      """SELECT * FROM decontaminate('sql_docs', 'doc_id', 'text',
                                     'sql_bench', 'q_id', 'question')""")
    sameRows(sql,
      Dedup.decontaminate(docs, "doc_id", "text", bench, "q_id", "question"))
    val kept = sql.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!kept.contains(5L), "the planted benchmark doc must be dropped")
    assert(kept.contains(4L), "clean docs must survive")

    sameRows(
      spark.sql("""SELECT * FROM decontaminate('sql_docs', 'doc_id', 'text',
                                               'sql_bench', 'q_id',
                                               'question', 3, 2)"""),
      Dedup.decontaminate(docs, "doc_id", "text", bench, "q_id", "question",
        shingleSize = 3, minOverlap = 2))
  }

  test("scrub_repeated_ngrams TVF matches the Scala operator incl. keep-first") {
    GraftExtensions.register(spark)
    docs.createOrReplaceTempView("sql_docs")

    sameRows(
      spark.sql("""SELECT * FROM scrub_repeated_ngrams('sql_docs', 'doc_id',
                                                       'text', 5, 1)"""),
      Dedup.scrubRepeatedNgrams(docs, "doc_id", "text", n = 5, maxDocs = 1))

    val keepFirst = spark.sql(
      """SELECT * FROM scrub_repeated_ngrams('sql_docs', 'doc_id', 'text',
                                             5, 1, true)""")
    sameRows(keepFirst,
      Dedup.scrubRepeatedNgrams(docs, "doc_id", "text", n = 5, maxDocs = 1,
        keepFirstCopy = true))
    // keep-first leaves doc 1's copy intact while scrubbing doc 2's
    val byId = keepFirst.collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(byId(1L) === 0L)
    assert(byId(2L) > 0L)
  }

  test("dedup TVFs compose in an outer query (pure-SQL pipeline)") {
    GraftExtensions.register(spark)
    docs.createOrReplaceTempView("sql_docs")
    bench.createOrReplaceTempView("sql_bench")

    // chain: decontaminate, then report surviving near-dup pair count —
    // via a temp view because TVF table args are catalog names
    spark.sql(
      """SELECT * FROM decontaminate('sql_docs', 'doc_id', 'text',
                                     'sql_bench', 'q_id', 'question')""")
      .createOrReplaceTempView("sql_docs_clean")
    val pairs = spark.sql(
      """SELECT count(*) AS n
         FROM minhash_near_dups('sql_docs_clean', 'doc_id', 'text')
         WHERE jaccard >= 0.9""")
    assert(pairs.collect().head.getLong(0) >= 1L)
  }

  test("semantic_near_dups and knn_classify TVFs match the Scala operators") {
    import spark.implicits._
    GraftExtensions.register(spark)
    // two tight clusters plus one outlier; labels follow the clusters
    val emb = Seq(
      (1L, Array(1.0, 0.0, 0.05), "a"), (2L, Array(1.0, 0.01, 0.0), "a"),
      (3L, Array(0.99, 0.0, 0.02), "a"),
      (4L, Array(0.0, 1.0, 0.03), "b"), (5L, Array(0.01, 1.0, 0.0), "b"),
      (6L, Array(0.0, 0.98, 0.01), "b"),
      (7L, Array(0.5, 0.5, 8.0), "c"))
      .toDF("vec_id", "embedding", "label")
    emb.createOrReplaceTempView("sql_emb")
    val probes = emb.filter(col("vec_id").isin(1L, 4L))
    probes.createOrReplaceTempView("sql_probes")

    val pairsSql = spark.sql(
      "SELECT * FROM semantic_near_dups('sql_emb', 'vec_id', 'embedding', 0.9, 4, 64)")
    sameRows(pairsSql, graft.sim.Similarity.semanticNearDups(
      emb, "vec_id", "embedding", threshold = 0.9, nCentroids = 4))
    assert(pairsSql.count() >= 2, "both planted clusters must pair")

    val knnSql = spark.sql(
      """SELECT * FROM knn_classify('sql_emb', 'vec_id', 'embedding', 'label',
                                    'sql_probes', 'vec_id', 'embedding', 2)""")
    sameRows(knnSql, graft.sim.Similarity.knnClassify(
      emb, "vec_id", "embedding", "label", probes, "vec_id", "embedding", 2))
    val got = knnSql.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) === "a" && got(4L) === "b")
  }

  test("bm25_topk TVF matches the Scala operator, defaults and full arity") {
    import spark.implicits._
    GraftExtensions.register(spark)
    docs.createOrReplaceTempView("sql_docs")
    val queries = Seq((1L, "quick brown fox"), (2L, "meaning of life"))
      .toDF("q_id", "q_text")
    queries.createOrReplaceTempView("sql_queries")

    val sqlDefault = spark.sql(
      """SELECT * FROM bm25_topk('sql_docs', 'doc_id', 'text',
                                 'sql_queries', 'q_id', 'q_text', 3)""")
    sameRows(sqlDefault, graft.text.Retrieval.bm25TopK(docs, "doc_id",
      "text", queries, "q_id", "q_text", k = 3))
    // the fox docs must rank for query 1, the benchmark doc for query 2
    val top = sqlDefault.filter(col("rank") === 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Set(1L, 2L, 3L).contains(top(1L)) && top(2L) === 5L)

    sameRows(
      spark.sql("""SELECT * FROM bm25_topk('sql_docs', 'doc_id', 'text',
                     'sql_queries', 'q_id', 'q_text', 3, 1.5, 0.5, 0.9)"""),
      graft.text.Retrieval.bm25TopK(docs, "doc_id", "text",
        queries, "q_id", "q_text", k = 3, k1 = 1.5, b = 0.5,
        maxDfFrac = 0.9))
  }

  test("bm25_probe_topk TVF answers from persisted index views") {
    import spark.implicits._
    GraftExtensions.register(spark)
    val post = graft.text.Retrieval.bm25Index(docs, "doc_id", "text")
    post.createOrReplaceTempView("sql_postings")
    graft.text.Retrieval.bm25IndexStats(post)
      .createOrReplaceTempView("sql_stats")
    val queries = Seq((1L, "quick brown fox"), (2L, "meaning of life"))
      .toDF("q_id", "q_text")
    queries.createOrReplaceTempView("sql_queries")
    sameRows(
      spark.sql("""SELECT * FROM bm25_probe_topk('sql_postings',
                     'sql_stats', 'sql_queries', 'q_id', 'q_text', 3)"""),
      graft.text.Retrieval.bm25TopK(docs, "doc_id", "text",
        queries, "q_id", "q_text", k = 3))
  }

  test("profile_numeric and key_skew TVFs match the Scala operators") {
    import spark.implicits._
    GraftExtensions.register(spark)
    val d = Seq((1L, 2.5, "a"), (2L, 3.5, "a"), (3L, 4.5, "b"))
      .toDF("id", "v", "k")
    d.createOrReplaceTempView("sql_prof")
    sameRows(
      spark.sql("SELECT * FROM profile_numeric('sql_prof', 'v, id')"),
      graft.ops.Profile.profileNumeric(d, Seq("v", "id")))
    // HLL mode rides the optional third arg
    sameRows(
      spark.sql("SELECT * FROM profile_numeric('sql_prof', 'v', false)"),
      graft.ops.Profile.profileNumeric(d, Seq("v"), exact = false))
    sameRows(
      spark.sql("SELECT * FROM key_skew('sql_prof', 'k', 5, 1.1)"),
      graft.ops.Profile.keySkew(d, Seq("k"), topN = 5, hotFactor = 1.1))
    sameRows(
      spark.sql("SELECT * FROM profile_text('sql_prof', 'k')"),
      graft.ops.Profile.profileText(d, Seq("k")))
  }

  test("pagerank, nb_classify, bpe and sampling TVFs match the Scala " +
      "operators") {
    import spark.implicits._
    GraftExtensions.register(spark)
    val edges = Seq("a" -> "b", "b" -> "c", "c" -> "a", "a" -> "c",
      "c" -> "b", "b" -> "a").toDF("s", "d")
    edges.createOrReplaceTempView("sql_edges")
    sameRows(
      spark.sql("SELECT * FROM pagerank('sql_edges', 's', 'd', 4)"),
      graft.graph.GraphOps.pageRank(edges, "s", "d", 4))

    val train = Seq((1L, "good clean text", "good"),
      (2L, "spam spam buy", "bad")).toDF("id", "text", "lb")
    train.createOrReplaceTempView("sql_nb_train")
    docs.createOrReplaceTempView("sql_docs")
    val model = graft.textstats.NaiveBayes.train(train, "text", "lb")
    sameRows(
      spark.sql("""SELECT * FROM nb_classify('sql_nb_train', 'text', 'lb',
                                             'sql_docs', 'doc_id', 'text')"""),
      graft.textstats.NaiveBayes.classify(docs, "doc_id", "text", model))

    val merges = graft.text.Bpe.trainMerges(docs, "text", numMerges = 6)
    sameRows(
      spark.sql(
        "SELECT * FROM bpe_token_frequencies('sql_docs', 'text', 6)"),
      graft.text.Bpe.tokenFrequencies(docs, "text", merges))

    sameRows(
      spark.sql(
        "SELECT * FROM sample_k_per_group('sql_docs', 'text', 'doc_id', 2)"),
      graft.ops.Sampling.sampleKPerGroup(docs, Seq("text"), "doc_id", 2))

    val budgeted = docs
      .withColumn("tk", org.apache.spark.sql.functions.length(col("text")))
      .withColumn("dm", org.apache.spark.sql.functions.lit("all"))
    budgeted.createOrReplaceTempView("sql_budget_docs")
    sameRows(
      spark.sql("SELECT * FROM token_budget('sql_budget_docs', 'doc_id', " +
        "'dm', 'tk', 'tk', 150)"),
      graft.ops.Sampling.tokenBudgetSelect(budgeted, "doc_id", "dm",
        "tk", "tk", 150L))

    val ev = Seq(
      (1L, "view", new java.sql.Timestamp(10000L)),
      (1L, "buy", new java.sql.Timestamp(20000L)),
      (2L, "buy", new java.sql.Timestamp(5000L)))
      .toDF("user_id", "event_type", "ts")
    ev.createOrReplaceTempView("sql_events")
    sameRows(
      spark.sql("SELECT * FROM funnel('sql_events', 'user_id', " +
        "'event_type', 'ts', 'view,buy', 60000000)"),
      graft.ts.TimeSeriesOps.funnel(ev, "user_id", "event_type", "ts",
        Seq("view", "buy"), 60000000L))

    val emb = Seq((1L, Seq(1.0f, 2.0f, 3.0f, 4.0f)),
      (2L, Seq(-1.0f, 0.5f, 0.0f, 2.0f))).toDF("vec_id", "v")
    emb.createOrReplaceTempView("sql_emb")
    sameRows(
      spark.sql("SELECT * FROM jl_project('sql_emb', 'vec_id', 'v', 4, 2)"),
      graft.sim.Projection.jlProjectTable(emb, "vec_id", "v", 4, 2))
  }

  test("sliding_chunks, dup_gram_fraction and trustrank TVFs match " +
      "the Scala operators") {
    import spark.implicits._
    GraftExtensions.register(spark)
    docs.createOrReplaceTempView("sql_docs")

    sameRows(
      spark.sql(
        "SELECT * FROM sliding_chunks('sql_docs', 'doc_id', 'text', 5, 3)"),
      graft.text.Chunking.slidingChunks(docs, "doc_id", "text", 5, 3))

    sameRows(
      spark.sql(
        "SELECT * FROM dup_gram_fraction('sql_docs', 'doc_id', 'text', 4, 1)"),
      Dedup.dupGramFraction(docs, "doc_id", "text", 4, 1))

    val edges = Seq(("a", "b"), ("b", "a"), ("b", "c"), ("c", "b"))
      .toDF("s", "d")
    val seeds = Seq("a").toDF("n")
    edges.createOrReplaceTempView("sql_edges")
    seeds.createOrReplaceTempView("sql_seeds")
    sameRows(
      spark.sql("""SELECT * FROM trustrank('sql_edges', 's', 'd',
                                           'sql_seeds', 'n', 4)"""),
      graft.graph.GraphOps.personalizedPageRank(edges, "s", "d",
        seeds, "n", 4))

    sameRows(
      spark.sql("SELECT * FROM label_propagation('sql_edges', 's', 'd', 3)"),
      graft.graph.GraphOps.labelPropagation(edges, "s", "d", 3))
  }

  test("kmeans TVFs match the Scala operators, including assignment " +
      "under a persisted model table") {
    import spark.implicits._
    GraftExtensions.register(spark)
    val emb = (0L until 40L).map { i =>
      val base = if (i % 2 == 0) 0.0 else 10.0
      (i, Seq.tabulate(4)(j => base + ((i * 7 + j * 3) % 11) * 0.01))
    }.toDF("vec_id", "v")
    emb.createOrReplaceTempView("sql_kme")
    sameRows(
      spark.sql(
        "SELECT * FROM kmeans_centroids('sql_kme', 'vec_id', 'v', 4, 3, 2)"),
      graft.sim.KMeans.kmeansCentroids(emb, "vec_id", "v", 4, 3, 2))
    sameRows(
      spark.sql(
        "SELECT * FROM kmeans_assign('sql_kme', 'vec_id', 'v', 4, 3, 2)"),
      graft.sim.KMeans.kmeansAssign(emb, "vec_id", "v", 4, 3, 2))
    graft.sim.KMeans.kmeansCentroids(emb, "vec_id", "v", 4, 3, 2)
      .createOrReplaceTempView("sql_kme_model")
    sameRows(
      spark.sql("""SELECT * FROM kmeans_assign_model('sql_kme',
                     'vec_id', 'v', 4, 'sql_kme_model')"""),
      graft.sim.KMeans.kmeansAssign(emb, "vec_id", "v", 4, 3, 2))
    // bad columns fail at analysis
    intercept[Exception](spark.sql(
      "SELECT * FROM kmeans_centroids('sql_kme', 'vec_id', 'nope', 4, 3, 2)"))
  }

  test("deferred TVFs: analysis and EXPLAIN launch ZERO Spark jobs — " +
      "training runs at first execution") {
    import spark.implicits._
    GraftExtensions.register(spark)
    docs.createOrReplaceTempView("sql_docs")
    Seq(("a", "b"), ("b", "a"), ("b", "c"), ("c", "b")).toDF("s", "d")
      .createOrReplaceTempView("sql_edges")
    Seq("a").toDF("n").createOrReplaceTempView("sql_seeds")
    val jobs = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.add(js.jobId)
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val stmts = Seq(
        "SELECT * FROM pagerank('sql_edges', 's', 'd', 4)",
        "SELECT * FROM trustrank('sql_edges', 's', 'd', " +
          "'sql_seeds', 'n', 4)",
        "SELECT * FROM label_propagation('sql_edges', 's', 'd', 3)",
        "SELECT * FROM nb_classify('sql_docs', 'text', 'text', " +
          "'sql_docs', 'doc_id', 'text')",
        "SELECT * FROM bpe_token_frequencies('sql_docs', 'text', 4)")
      val explains = stmts.map(s =>
        spark.sql(s"EXPLAIN EXTENDED $s").collect()
          .map(_.getString(0)).mkString("\n"))
      explains.foreach(p => assert(p.contains("DeferredBuild"),
        s"expected the deferred leaf in the plan:\n$p"))
      // let any stray job-start events drain before asserting
      Thread.sleep(1000)
      assert(jobs.isEmpty,
        s"EXPLAIN of deferred TVFs must launch no jobs, got $jobs")
      // executing DOES run jobs and yields the operator's rows
      val n = spark.sql(stmts.head).count()
      assert(n == 3)
      Thread.sleep(500)
      assert(!jobs.isEmpty, "execution should have launched jobs")
    } finally {
      spark.sparkContext.removeSparkListener(listener)
    }
    // schema errors still surface at ANALYSIS, not first execution
    intercept[Exception](
      spark.sql("SELECT * FROM pagerank('sql_edges', 'nope', 'd', 4)"))
    intercept[Exception](
      spark.sql("SELECT * FROM trustrank('sql_edges', 's', 'd', " +
        "'sql_seeds', 'nope', 4)"))
  }

  test("lsh_plan TVF matches the Scala planner and composes into minhash_near_dups") {
    GraftExtensions.register(spark)
    val rows = spark.sql("SELECT * FROM lsh_plan(32, 0.8)").collect()
    assert(rows.length === 1)
    val p = Dedup.lshPlan(32, 0.8)
    val r = rows(0)
    assert(r.getInt(r.fieldIndex("bands")) === p.bands)
    assert(r.getInt(r.fieldIndex("rows_per_band")) === p.rowsPerBand)
    assert(r.getDouble(r.fieldIndex("inflection")) === p.inflection)
    assert(r.getDouble(r.fieldIndex("p_collide")) === p.pCollide)
    // the planned band count drives minhash_near_dups in pure SQL and
    // lands exactly where the Scala wire-through lands
    docs.createOrReplaceTempView("sql_docs")
    val bands = spark.sql("SELECT bands FROM lsh_plan(32, 0.5)")
      .collect()(0).getInt(0)
    sameRows(
      spark.sql("SELECT * FROM minhash_near_dups('sql_docs', 'doc_id', " +
        s"'text', 3, 32, $bands, 0.5)"),
      Dedup.minhashNearDupsPlanned(docs, "doc_id", "text", threshold = 0.5))
  }

  test("hash_split, group_split and funnel_summary TVFs match the " +
      "Scala operators") {
    import spark.implicits._
    GraftExtensions.register(spark)
    val fr = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    docs.createOrReplaceTempView("sql_docs")
    sameRows(
      spark.sql("SELECT * FROM hash_split('sql_docs', 'doc_id', " +
        "'train:0.8,val:0.1,test:0.1', 100)"),
      graft.ops.Sampling.hashSplit(docs, "doc_id", fr, denom = 100))

    val grouped = docs.withColumn("grp",
      org.apache.spark.sql.functions.pmod(col("doc_id"),
        org.apache.spark.sql.functions.lit(2L)))
    grouped.createOrReplaceTempView("sql_grouped")
    val viaTvf = spark.sql("SELECT * FROM group_split('sql_grouped', " +
      "'grp', 'train:0.8,val:0.1,test:0.1', 100)")
    sameRows(viaTvf,
      graft.ops.Sampling.groupAwareSplit(grouped, "grp", fr, denom = 100))
    // co-assignment: one split per group
    assert(viaTvf.select("grp", "split").distinct().count() ===
      viaTvf.select("grp").distinct().count())

    val ev = Seq(
      (1L, "view", new java.sql.Timestamp(10000L)),
      (1L, "buy", new java.sql.Timestamp(20000L)),
      (2L, "buy", new java.sql.Timestamp(5000L)))
      .toDF("user_id", "event_type", "ts")
    ev.createOrReplaceTempView("sql_events")
    sameRows(
      spark.sql("SELECT * FROM funnel_summary('sql_events', 'user_id', " +
        "'event_type', 'ts', 'view,buy', 60000000)"),
      graft.ts.TimeSeriesOps.funnelSummary(ev, "user_id", "event_type",
        "ts", Seq("view", "buy"), 60000000L))
  }

  test("kmv, cohort_retention and logreg TVFs match the Scala operators; " +
      "logreg TVFs defer training past EXPLAIN") {
    import spark.implicits._
    GraftExtensions.register(spark)
    docs.createOrReplaceTempView("sql_docs")
    val vals = (0L until 3000L).map(v => v * 7L).toDF("v")
    vals.createOrReplaceTempView("sql_vals")
    val odds = vals.where(col("v") % 2 === 1L)
    odds.createOrReplaceTempView("sql_odds")
    sameRows(
      spark.sql("SELECT * FROM kmv_distinct('sql_vals', 'v', 64)"),
      graft.sketch.Kmv.distinctEstimate(vals, col("v"), 64))
    sameRows(
      spark.sql("SELECT * FROM kmv_setops('sql_vals', 'sql_odds', 'v', 64)"),
      graft.sketch.Kmv.setEstimates(vals, odds, "v", 64))

    val ev = Seq(
      (1L, new java.sql.Timestamp(86400000L)),
      (1L, new java.sql.Timestamp(2 * 86400000L)),
      (2L, new java.sql.Timestamp(2 * 86400000L)))
      .toDF("user_id", "ts")
    ev.createOrReplaceTempView("sql_cohort_events")
    sameRows(
      spark.sql("SELECT * FROM cohort_retention('sql_cohort_events', " +
        "'user_id', 'ts', 'day')"),
      graft.ts.TimeSeriesOps.cohortRetention(ev, "user_id", "ts", "day"))

    // logreg: EXPLAIN plans the deferred leaf without training
    val plan = spark.sql("EXPLAIN EXTENDED SELECT * FROM " +
      "logreg_train('sql_docs', 'doc_id', 'text', 2)").collect()
      .map(_.getString(0)).mkString("\n")
    assert(plan.contains("DeferredBuild"))
    sameRows(
      spark.sql("SELECT * FROM logreg_train('sql_docs', 'doc_id', 'text', 2)"),
      graft.textstats.LogReg.trainedWeights(docs, "doc_id", "text", 2))
    sameRows(
      spark.sql("SELECT * FROM logreg_score('sql_docs', 'doc_id', 'text', 2)"),
      graft.textstats.LogReg.trainAndScore(docs, "doc_id", "text", 2))
    // schema errors still surface at analysis
    intercept[Exception](
      spark.sql("SELECT * FROM logreg_train('sql_docs', 'nope', 'text', 2)"))
  }

  test("hash_sample, stratified_sample and temperature_mix TVFs match " +
      "the Scala operators") {
    import spark.implicits._
    GraftExtensions.register(spark)
    val corpus = (1L to 200L).map(i =>
      (i, if (i % 3 == 0) "en" else if (i % 3 == 1) "zh" else "de"))
      .toDF("doc_id", "lang")
    corpus.createOrReplaceTempView("sql_corpus")
    sameRows(
      spark.sql(
        "SELECT * FROM hash_sample('sql_corpus', 'doc_id', 0.3, 7, 100)"),
      graft.ops.Sampling.hashSample(corpus, "doc_id", 0.3, salt = 7L,
        denom = 100))
    sameRows(
      spark.sql("SELECT * FROM stratified_sample('sql_corpus', " +
        "'doc_id', 'lang', 'en:0.5,zh:0.2', 0.1, 100)"),
      graft.ops.Sampling.stratifiedSample(corpus, "doc_id", "lang",
        Seq("en" -> 0.5, "zh" -> 0.2), defaultFraction = 0.1,
        denom = 100))
    sameRows(
      spark.sql("SELECT * FROM temperature_mix('sql_corpus', " +
        "'doc_id', 'lang', 0.5, 0.5)"),
      graft.ops.Sampling.temperatureMix(corpus, "doc_id", "lang",
        alpha = 0.5, targetFraction = 0.5))
  }

  test("TVF argument validation fails loudly") {
    GraftExtensions.register(spark)
    docs.createOrReplaceTempView("sql_docs")
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM minhash_near_dups('sql_docs', 'doc_id')")
    }
    assert(e.getMessage.contains("3 to 7"))
    val e2 = intercept[Exception] {
      spark.sql(
        """SELECT * FROM scrub_repeated_ngrams('sql_docs', 'doc_id', 'text',
                                               5, 1, 'yes')""")
    }
    assert(e2.getMessage.contains("boolean"))
    val e3 = intercept[Exception] {
      spark.sql("SELECT * FROM hash_split('sql_docs', 'doc_id', " +
        "'train=0.8', 100)")
    }
    assert(e3.getMessage.contains("name:fraction"))
    // a well-formed 'name:' prefix with a NON-NUMERIC fraction must give
    // the same name:fraction diagnostic (naming the entry), not a raw
    // NumberFormatException from a bare toDouble
    val e4 = intercept[Exception] {
      spark.sql("SELECT * FROM hash_split('sql_docs', 'doc_id', " +
        "'train:abc', 100)")
    }
    assert(e4.getMessage.contains("train:abc") &&
      e4.getMessage.contains("name:fraction"))
  }
}
