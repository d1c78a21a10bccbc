package graft

import org.apache.spark.sql.functions._

import graft.text.Retrieval

/** Persistable BM25 index lifecycle: build → probe parity with the
  * direct operator, newest-wins merge ≡ fresh rebuild, empty-text
  * eviction, and iterated batch merges converging to the one-shot
  * index.
  */
class Bm25IndexSpec extends SparkTestBase {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "spark shuffles data across the cluster"),
    (2L, "the cluster runs spark executors"),
    (3L, "pandas runs on one machine"),
    (4L, "data pipelines clean data for training"),
    (5L, "")
  ).toDF("doc_id", "text")

  private val queries = Seq((100L, "spark cluster data"),
    (101L, "pandas training")).toDF("qid", "qtext")

  private def asSet(df: org.apache.spark.sql.DataFrame) =
    df.as[(Long, Long, Double, Int)].collect().toSet

  test("index build: postings long form, empty docs absent, stats row") {
    val post = Retrieval.bm25Index(corpus, "doc_id", "text")
    assert(post.columns.toSeq == Seq("term", "doc_id", "tf", "dl"))
    val rows = post.as[(String, Long, Long, Long)].collect()
    assert(!rows.exists(_._2 == 5L), "empty doc must be absent")
    // doc 4: "data" twice, dl 6
    assert(rows.find(r => r._1 == "data" && r._2 == 4L)
      .contains(("data", 4L, 2L, 6L)))
    val st = Retrieval.bm25IndexStats(post)
      .as[(Long, Long)].collect().head
    assert(st == ((4L, 6L + 5L + 5L + 6L)), s"got $st")
  }

  test("probe from the index is bit-identical to the direct operator") {
    val post = Retrieval.bm25Index(corpus, "doc_id", "text")
    val stats = Retrieval.bm25IndexStats(post)
    val viaIndex = asSet(Retrieval.bm25ProbeIndex(post, stats,
      queries, "qid", "qtext", k = 5, maxDfFrac = 0.6))
    val direct = asSet(Retrieval.bm25TopK(corpus, "doc_id", "text",
      queries, "qid", "qtext", k = 5, maxDfFrac = 0.6))
    assert(viaIndex == direct && direct.nonEmpty)
  }

  test("merge is newest-wins and equals a fresh rebuild") {
    val old = Retrieval.bm25Index(corpus, "doc_id", "text")
    // doc 2 edited, doc 6 appended, doc 3 re-ingested EMPTY (leaves)
    val fresh = Seq((2L, "spark schedules tasks"), (6L, "new machine data"),
      (3L, "")).toDF("doc_id", "text")
    val merged = Retrieval.updateBm25Index(old, fresh, "doc_id", "text")
    val rebuiltCorpus = Seq(
      (1L, "spark shuffles data across the cluster"),
      (2L, "spark schedules tasks"),
      (4L, "data pipelines clean data for training"),
      (6L, "new machine data")
    ).toDF("doc_id", "text")
    val rebuilt = Retrieval.bm25Index(rebuiltCorpus, "doc_id", "text")
    assert(merged.as[(String, Long, Long, Long)].collect().toSet ==
      rebuilt.as[(String, Long, Long, Long)].collect().toSet)
    // probe parity against the rebuilt corpus
    val got = asSet(Retrieval.bm25ProbeIndex(merged,
      Retrieval.bm25IndexStats(merged), queries, "qid", "qtext", k = 5))
    val want = asSet(Retrieval.bm25TopK(rebuiltCorpus, "doc_id", "text",
      queries, "qid", "qtext", k = 5))
    assert(got == want && got.nonEmpty)
  }

  test("iterated batch merges converge to the one-shot index") {
    val rnd = new scala.util.Random(42)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta")
    def doc(): String =
      Seq.fill(1 + rnd.nextInt(6))(vocab(rnd.nextInt(vocab.size)))
        .mkString(" ")
    // 3 batches; later batches re-ingest some earlier ids (newest wins)
    val batches = Seq(
      (0L to 9L).map(i => (i, doc())),
      (5L to 14L).map(i => (i, doc())),
      (12L to 19L).map(i => (i, doc())))
    val finalCorpus = batches.flatten.groupBy(_._1)
      .map { case (id, vs) => (id, vs.last._2) }.toSeq
    val iterated = batches.tail.foldLeft(
      Retrieval.bm25Index(batches.head.toDF("doc_id", "text"),
        "doc_id", "text")) { (idx, b) =>
      Retrieval.updateBm25Index(idx, b.toDF("doc_id", "text"),
        "doc_id", "text")
    }
    val oneShot = Retrieval.bm25Index(finalCorpus.toDF("doc_id", "text"),
      "doc_id", "text")
    assert(iterated.as[(String, Long, Long, Long)].collect().toSet ==
      oneShot.as[(String, Long, Long, Long)].collect().toSet)
    val q = Seq((1L, "alpha zeta")).toDF("qid", "qtext")
    assert(asSet(Retrieval.bm25ProbeIndex(iterated,
      Retrieval.bm25IndexStats(iterated), q, "qid", "qtext", k = 3)) ==
      asSet(Retrieval.bm25TopK(finalCorpus.toDF("doc_id", "text"),
        "doc_id", "text", q, "qid", "qtext", k = 3)))
  }

  test("persisted round-trip: term-sorted layout, probe parity, " +
      "scan-level term pushdown") {
    val dir = java.nio.file.Files.createTempDirectory("bm25idx")
      .toString
    val post = Retrieval.bm25Index(corpus, "doc_id", "text")
    val stats = Retrieval.bm25IndexStats(post)
    Retrieval.writeBm25Index(post, stats, dir)
    val (rp, rs) = Retrieval.readBm25Index(spark, dir)
    assert(rp.as[(String, Long, Long, Long)].collect().toSet ==
      post.as[(String, Long, Long, Long)].collect().toSet)
    assert(rs.as[(Long, Long)].collect().head ==
      stats.as[(Long, Long)].collect().head)
    val probed = Retrieval.bm25ProbeIndex(rp, rs, queries,
      "qid", "qtext", k = 5)
    // the small query term set must reach the parquet scan as an IN
    // filter (row-group skipping on the term-sorted layout). The
    // operator's lineage cut checkpoints the pruned postings, so the
    // final plan no longer shows the scan — assert on the exact
    // scan-stage frame the pushdown path builds
    import org.apache.spark.sql.functions.col
    val scanPlan = rp.filter(col("term")
        .isin("spark", "cluster", "data", "pandas", "training"))
      .queryExecution.executedPlan.toString
    assert(scanPlan.contains("PushedFilters: [In(term"),
      s"query terms must push into the postings scan:\n$scanPlan")
    assert(asSet(probed) == asSet(Retrieval.bm25TopK(corpus, "doc_id",
      "text", queries, "qid", "qtext", k = 5)))
  }

  test("pushdown and semi-join prune paths agree; empty query sets " +
      "are empty, not errors") {
    val post = Retrieval.bm25Index(corpus, "doc_id", "text")
    val stats = Retrieval.bm25IndexStats(post)
    val viaPush = asSet(Retrieval.bm25ProbeIndex(post, stats, queries,
      "qid", "qtext", k = 5))
    val viaSemi = asSet(Retrieval.bm25ProbeIndex(post, stats, queries,
      "qid", "qtext", k = 5, pushTermLimit = 0))
    // cap exceeded → silent fallback to the semi-join, same answer
    val viaTiny = asSet(Retrieval.bm25ProbeIndex(post, stats, queries,
      "qid", "qtext", k = 5, pushTermLimit = 2))
    assert(viaPush == viaSemi && viaSemi == viaTiny && viaPush.nonEmpty)
    val none = Seq.empty[(Long, String)].toDF("qid", "qtext")
    assert(Retrieval.bm25ProbeIndex(post, stats, none, "qid", "qtext",
      k = 5).count() == 0L)
  }

  test("probe parameter guards fail loudly") {
    val post = Retrieval.bm25Index(corpus, "doc_id", "text")
    val stats = Retrieval.bm25IndexStats(post)
    intercept[IllegalArgumentException] {
      Retrieval.bm25ProbeIndex(post, stats, queries, "qid", "qtext", k = 0)
    }
    intercept[IllegalArgumentException] {
      Retrieval.bm25ProbeIndex(post, stats, queries, "qid", "qtext",
        k = 1, maxDfFrac = 1.5)
    }
  }
}
