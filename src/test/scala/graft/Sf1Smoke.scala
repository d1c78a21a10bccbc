package graft

import org.apache.spark.sql.functions._

/** The sf1 scaling smoke (round-14 verdict #6, extended to the 25
  * slowest queries by round-15 verdict #7): the 100× claims rest on
  * plan shape — this buys one empirical point per heavy query. The
  * driver ships sf0.001/0.01/0.1 only (TESTDATA.md, read-only), so a
  * 10× corpus is SYNTHESIZED from sf0.1 into /tmp:
  *
  *  - documents: 10 replicas with offset ids; each replica's text is
  *    salted with a replica-unique word every 4 tokens, so every
  *    shingle window crosses a salt and replicas share no shingles —
  *    within-replica duplicate/near-dup structure mirrors sf0.1
  *    (the honest upscale; naive replication would create an
  *    adversarial 10-way near-dup clique per doc and measure a
  *    different workload);
  *  - embeddings: 10 replicas with offset ids, each replica's vectors
  *    cyclically dimension-rotated by its replica index — norms and
  *    the coordinate distribution are preserved while replicas
  *    decorrelate. Query vectors (vec_id < 8) stay replica-0
  *    originals;
  *  - events: 10 replicas with offset user_id AND event_id — 10× the
  *    users over the same time range, each user keeping its sf0.1
  *    event sequence, so per-key structure (sessions, bars-per-ticker,
  *    type mix) is preserved while key cardinality scales;
  *  - lineitem: 10 replicas with offset l_orderkey (line numbering,
  *    part/supplier references and value distributions untouched —
  *    the profile/sketch rows see 10× rows with the same shape).
  *
  * Usage: Test/runMain graft.Sf1Smoke [reps] [q1,q2,...]
  * Prints one BENCH_SF1 JSON line: per-query min seconds at sf0.1 and
  * the synthetic sf1, and the growth ratio (rows grow 10×; ≤ ~12×
  * time growth = near-linear, no superlinear cliff).
  */
object Sf1Smoke {

  /** The 25 slowest suite queries on the round-16 code (bench
    * cross-run minimums), spanning every heavy family: containment /
    * near-dup / edit-distance dedup, the IVFADC lifecycle (topk +
    * incremental + streaming twins), BM25 lifecycle twins, LM
    * buckets/cleaning, Motion-JPEG video decode, KMV sketching,
    * numeric profile drift, and the distributed grid optimizer.
    */
  val Queries: Seq[String] = Seq(
    "dd_containment", "dd_minhash", "dd_group_split", "dd_editdist",
    "dd_curation_pipeline", "dd_stream_incremental_batch",
    "dd_ngram_jaccard", "dd_drop_near_dups", "dd_keep_best",
    "dd_incremental_verified",
    "ts_bm25_topk", "ts_bm25_eval", "ts_bm25_incremental",
    "ts_bm25_stream_batch", "ts_rrf_fusion",
    "ts_lm_buckets", "ts_clean_corpus",
    "sim_pq_topk", "sim_ivfpq_topk", "sim_ivfadc_topk",
    "sim_ivfadc_incremental", "sim_ivfadc_stream_batch",
    "mm_mjpeg_frames", "sc_kmv_distinct", "sc_profile_drift")

  def main(args: Array[String]): Unit = {
    val reps = if (args.nonEmpty) args(0).toInt else 2
    val qs = if (args.length > 1) args(1).split(",").toSeq.map(_.trim)
      else Queries
    val sf01 = "/root/testdata/sf0.1"
    val sf1 = "/tmp/sf1_synth"
    val spark = LocalSessions.builder(32, 32)
      .config("spark.sql.adaptive.enabled", "true").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val repIdx = spark.range(0, 10).select(col("id").as("__rep"))
    def missing(table: String): Boolean =
      !new java.io.File(s"$sf1/$table.parquet").exists()

    // ---- synthesize the 10x corpus (idempotent, per table)
    if (missing("documents")) {
      val docs = graft.sources.Sources.readTable(spark, sf01, "documents")
      val maxId = docs.agg(max("doc_id")).head().getLong(0) + 1L
      docs.crossJoin(repIdx)
        .withColumn("doc_id", col("doc_id") + col("__rep") * maxId)
        .withColumn("text",
          // a replica-unique salt word every 4 tokens: zip each token
          // with its position, append the salt after every 4th
          concat_ws(" ", flatten(transform(
            filter(split(lower(col("text")), "\\s+"), t => length(t) > 0),
            (t, i) => when(i % 4 === 3,
                array(t, concat(lit("salt"), col("__rep"))))
              .otherwise(array(t))))))
        .drop("__rep")
        .repartition(32)
        .write.mode("overwrite").parquet(s"$sf1/documents.parquet")
      println("SF1GEN documents done")
    }
    if (missing("embeddings")) {
      val emb = graft.sources.Sources.readTable(spark, sf01, "embeddings")
      val maxVid = emb.agg(max("vec_id")).head().getLong(0) + 1L
      emb.crossJoin(repIdx)
        .withColumn("embedding", when(col("__rep") === 0, col("embedding"))
          .otherwise(concat(
            slice(col("embedding"), col("__rep") + 1,
              size(col("embedding")) - col("__rep")),
            slice(col("embedding"), lit(1), col("__rep")))))
        .withColumn("vec_id", col("vec_id") + col("__rep") * maxVid)
        .drop("__rep")
        .repartition(32)
        .write.mode("overwrite").parquet(s"$sf1/embeddings.parquet")
      println("SF1GEN embeddings done")
    }
    if (missing("events")) {
      val ev = graft.sources.Sources.readTable(spark, sf01, "events")
      val maxUid = ev.agg(max("user_id")).head().getLong(0) + 1L
      val maxEid = ev.agg(max("event_id")).head().getLong(0) + 1L
      ev.crossJoin(repIdx)
        .withColumn("user_id", col("user_id") + col("__rep") * maxUid)
        .withColumn("event_id", col("event_id") + col("__rep") * maxEid)
        .drop("__rep")
        .repartition(32)
        .write.mode("overwrite").parquet(s"$sf1/events.parquet")
      println("SF1GEN events done")
    }
    if (missing("lineitem")) {
      val li = graft.sources.Sources.readTable(spark, sf01, "lineitem")
      val maxOk = li.agg(max("l_orderkey")).head().getLong(0) + 1L
      li.crossJoin(repIdx)
        .withColumn("l_orderkey", col("l_orderkey") + col("__rep") * maxOk)
        .drop("__rep")
        .repartition(32)
        .write.mode("overwrite").parquet(s"$sf1/lineitem.parquet")
      println("SF1GEN lineitem done")
    }

    spark.range(1000).selectExpr("sum(id)").write.format("noop")
      .mode("overwrite").save()
    def time1(q: String, dir: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, dir).write.format("noop")
        .mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    def mins(dir: String): Map[String, Double] = {
      val acc = scala.collection.mutable.Map.empty[String, Double]
      for (_ <- 1 to reps; q <- qs) {
        val s = time1(q, dir)
        acc(q) = math.min(acc.getOrElse(q, Double.MaxValue), s)
      }
      acc.toMap
    }
    // warm both directions once, then measured reps
    qs.foreach(q => time1(q, sf01))
    val t01 = mins(sf01)
    val t1 = mins(sf1)
    def r(v: Double) = math.round(v * 100.0) / 100.0
    val rows = qs.map { q =>
      val ratio = t1(q) / math.max(t01(q), 1e-9)
      s""""$q":{"sf0_1":${r(t01(q))},"sf1":${r(t1(q))},"ratio":${r(ratio)}}"""
    }
    println(s"""BENCH_SF1 {"rows_scale":10,"reps":$reps,"queries":{${
      rows.mkString(",")}}}""")
    spark.stop()
  }
}
