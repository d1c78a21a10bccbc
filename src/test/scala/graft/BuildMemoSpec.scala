package graft

import org.apache.spark.sql.functions._

import graft.ops.BuildMemo
import graft.text.Retrieval

/** The session-scoped build memo (round-16): memo-hit must be
  * result-identical to memo-miss, keys must discriminate inputs and
  * params, and non-memoizable plans (streaming, mutable tables) must
  * fall through to the unmemoized behavior.
  */
class BuildMemoSpec extends SparkTestBase {
  import spark.implicits._

  private def docs = spark.read
    .parquet(s"$sf0001/documents.parquet")
    .select(col("doc_id"), col("text"))

  test("memo-hit is result-identical to memo-miss (full BM25 " +
      "incremental lifecycle)") {
    def lifecycle() = {
      val base = docs.filter(col("doc_id") % 3 =!= 0)
      val fresh = docs
        .filter(col("doc_id") % 3 === 0 || col("doc_id") % 7 === 0)
        .select(col("doc_id"),
          concat(col("text"), lit(" upd")).as("text"))
      val merged = Retrieval.updateBm25Index(
        Retrieval.bm25Index(base, "doc_id", "text"),
        fresh, "doc_id", "text")
      val stats = Retrieval.bm25IndexStats(merged)
      val tk = filter(split(lower(col("text")), "\\s+"),
        x => length(x) > 0)
      val queries = docs.filter(col("doc_id") % 193 === 0)
        .select(col("doc_id"),
          concat_ws(" ", slice(tk, 1, 6)).as("qtext"))
      Retrieval.bm25ProbeIndex(merged, stats, queries,
          "doc_id", "qtext", k = 5, maxDfFrac = 0.95)
        .select(col("query_id"), col("doc_id"),
          round(col("score"), 6).as("s6"), col("rank"))
        .as[(Long, Long, Double, Int)].collect().toSeq
        .sortBy(r => (r._1, r._4))
    }
    BuildMemo.clear()
    val cold = lifecycle()
    val missesAfterCold = BuildMemo.misses
    val hitsBefore = BuildMemo.hits
    val warm = lifecycle()
    assert(warm == cold && cold.nonEmpty,
      s"memo-hit diverged from memo-miss: ${warm.take(3)} vs " +
        s"${cold.take(3)}")
    assert(BuildMemo.hits > hitsBefore,
      "second run never hit the memo — the lifecycle keys are unstable")
    assert(BuildMemo.misses == missesAfterCold,
      "second run re-built memoized artifacts (key instability)")
  }

  test("frame keys discriminate params and inputs") {
    BuildMemo.clear()
    val a = BuildMemo.frame(docs.filter(col("doc_id") % 3 === 0))
    val b = BuildMemo.frame(docs.filter(col("doc_id") % 5 === 0))
    assert(a.count() != b.count(),
      "different input plans must not share a memo entry")
    val sameAgain = BuildMemo.frame(docs.filter(col("doc_id") % 3 === 0))
    assert(sameAgain eq a,
      "an identical plan must return the SAME materialized frame")
  }

  test("trained quantizer models memo-hit and key on centroid content") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .withColumn("embedding", col("embedding").cast("array<double>"))
    BuildMemo.clear()
    val c1 = graft.sim.Similarity.ivfCentroids(emb, "vec_id",
      "embedding", nCentroids = 4)
    val h0 = BuildMemo.hits
    val c2 = graft.sim.Similarity.ivfCentroids(emb, "vec_id",
      "embedding", nCentroids = 4)
    assert((c2 eq c1) && BuildMemo.hits > h0, "second train must memo-hit")
    val c8 = graft.sim.Similarity.ivfCentroids(emb, "vec_id",
      "embedding", nCentroids = 8)
    assert(c8.length == 8 && c1.length == 4,
      "param change must re-train, not cross-hit")
    // residual codebooks under DIFFERENT centroids must not cross-hit
    val cb1 = graft.sim.Pq.pqCodebooksResidual(emb, "vec_id",
      "embedding", c1, dim = 64, m = 4, kPerSub = 4)
    val cb8 = graft.sim.Pq.pqCodebooksResidual(emb, "vec_id",
      "embedding", c8, dim = 64, m = 4, kPerSub = 4)
    assert(!(cb1 eq cb8),
      "codebooks trained under different quantizers must not share")
  }

  test("an overwritten table re-keys on its new file listing — never " +
      "served stale") {
    // catalog-table LogicalRelations compare canonically equal across
    // an overwrite (root-path equality), so the file digest in the key
    // is what protects this path
    val name = "memo_mut_tbl"
    Seq((1L, "a")).toDF("doc_id", "text")
      .write.mode("overwrite").saveAsTable(name)
    try {
      val n1 = Retrieval.bm25Index(spark.table(name), "doc_id", "text")
        .count()
      Seq((1L, "a"), (2L, "b b")).toDF("doc_id", "text")
        .write.mode("overwrite").saveAsTable(name)
      spark.catalog.refreshTable(name)
      val n2 = Retrieval.bm25Index(spark.table(name), "doc_id", "text")
        .count()
      assert(n1 == 1L && n2 == 2L,
        s"mutable table served stale postings: $n1 then $n2")
    } finally spark.sql(s"DROP TABLE IF EXISTS $name")
  }

  test("streaming frames are never cut or memoized") {
    implicit val sc = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val streamDf = input.toDS().toDF("doc_id", "text")
    assert(!BuildMemo.memoizable(streamDf))
    // bm25Index on a streaming frame must stay lazy/streaming
    assert(Retrieval.bm25Index(streamDf, "doc_id", "text").isStreaming)
  }

  test("LRU bound holds") {
    BuildMemo.clear()
    (0 until 300).foreach { i =>
      BuildMemo.value(docs, "lru-probe", params = i.toString) {
        java.lang.Long.valueOf(i.toLong)
      }
    }
    assert(BuildMemo.size <= 256, s"cache grew past bound: ${BuildMemo.size}")
  }

  test("frameFor: hit ≡ miss, keyed on the INPUT plan, and the build " +
      "closure runs once") {
    BuildMemo.clear()
    var builds = 0
    def clustered() = BuildMemo.frameFor(Seq(docs), "framefor-probe",
        params = "p1") {
      builds += 1
      graft.dedup.Dedup.connectedComponents(
        graft.dedup.Dedup.minhashNearDups(docs, "doc_id", "text",
          shingleSize = 3, numHashes = 32, bands = 16, threshold = 0.5))
    }
    val cold = clustered().orderBy("id").as[(Long, Long)].collect().toSeq
    val warm = clustered().orderBy("id").as[(Long, Long)].collect().toSeq
    assert(builds == 1, s"build closure ran $builds times — the input " +
      "plan key is unstable")
    assert(warm == cold && cold.nonEmpty, "frameFor hit diverged from miss")
    // different params → distinct entry (no false sharing)
    var builds2 = 0
    BuildMemo.frameFor(Seq(docs), "framefor-probe", params = "p2") {
      builds2 += 1; docs.limit(1)
    }.count()
    assert(builds2 == 1, "distinct params must build separately")
    // non-memoizable input (streaming) falls through to a plain build
    implicit val sc = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val streamDf = input.toDS().toDF("doc_id", "text")
    val out = BuildMemo.frameFor(Seq(streamDf), "framefor-stream") {
      streamDf
    }
    assert(out.isStreaming, "streaming input must fall through unmemoized")
  }

  test("near-dup component memo: dropNearDups / dropNearDupsKeepBest / " +
      "nearDupComponents share one clustering build") {
    BuildMemo.clear()
    val survivors = graft.dedup.Dedup.dropNearDups(
      docs, "doc_id", "text", shingleSize = 3, numHashes = 32,
      bands = 16, threshold = 0.5).select("doc_id")
      .as[Long].collect().toSet
    val missesAfter = BuildMemo.misses
    val best = graft.dedup.Dedup.dropNearDupsKeepBest(
      docs.withColumn("n_chars", length(col("text"))), "doc_id", "text",
      "n_chars", shingleSize = 3, numHashes = 32, bands = 16,
      threshold = 0.5).select("doc_id").as[Long].collect().toSet
    assert(survivors.nonEmpty && best.nonEmpty)
    // keep-best over a DIFFERENT input plan (the added quality column)
    // builds its own entry, but the PLAIN-docs clustering must hit:
    val hitsBefore = BuildMemo.hits
    graft.dedup.Dedup.nearDupComponents(docs, "doc_id", "text",
      shingleSize = 3, numHashes = 32, bands = 16, threshold = 0.5)
      .count()
    assert(BuildMemo.hits > hitsBefore,
      "nearDupComponents re-built a clustering dropNearDups already " +
        s"built (misses after first build: $missesAfter)")
  }
}
