package graft

import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** Benchmark-decontamination operator (Dedup.contaminationPairs):
  * planted-leak detection, the overlap threshold, boilerplate-shingle
  * suppression, and the broadcast plan shape the scale story needs.
  */
class ContaminationSpec extends SparkTestBase {
  import spark.implicits._

  private val bench = Seq(
    (100L, "the quick brown fox jumps over the lazy dog tonight"),
    (101L, "completely unrelated benchmark question about chemistry"))
    .toDF("bid", "btext")

  test("a corpus doc containing a benchmark passage is flagged") {
    val corpus = Seq(
      // verbatim leak of bench 100
      (1L, "intro text the quick brown fox jumps over the lazy dog tonight outro"),
      // shares no 3-gram with any bench doc
      (2L, "totally different content with no shared phrases at all here"),
      // exactly one shared 3-gram ("quick brown fox") — below minOverlap=2
      (3L, "a quick brown fox appeared suddenly near the river bank"))
      .toDF("id", "text")
    val got = Dedup.contaminationPairs(corpus, "id", "text",
        bench, "bid", "btext", shingleSize = 3, minOverlap = 2)
      .orderBy("doc_id", "bench_id")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got.map(r => (r._1, r._2)) === Seq((1L, 100L)))
    // the leak shares all 8 distinct 3-grams of the 10-token bench doc
    assert(got.head._3 === 8L)
  }

  test("decontaminate drops exactly the flagged docs, keeps the rest whole") {
    val corpus = Seq(
      (1L, "intro text the quick brown fox jumps over the lazy dog tonight outro"),
      (2L, "totally different content with no shared phrases at all here"),
      (3L, "a quick brown fox appeared suddenly near the river bank"))
      .toDF("id", "text")
    val kept = Dedup.decontaminate(corpus, "id", "text",
        bench, "bid", "btext", shingleSize = 3, minOverlap = 2)
    // doc 1 is the verbatim leak; 2 and 3 (single-graze, below the
    // threshold) survive with their full rows intact
    assert(kept.select("id").as[Long].collect().sorted.toSeq ==
      Seq(2L, 3L))
    assert(kept.columns.toSeq == corpus.columns.toSeq,
      "endpoint must return the caller's schema untouched")
  }

  test("minOverlap = 1 also surfaces the single-shingle graze") {
    val corpus = Seq(
      (3L, "a quick brown fox appeared suddenly near the river bank"))
      .toDF("id", "text")
    val got = Dedup.contaminationPairs(corpus, "id", "text",
        bench, "bid", "btext", shingleSize = 3, minOverlap = 1)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got === Seq((3L, 100L, 1L)))
  }

  test("maxBenchDf suppresses boilerplate shingles shared across the bench") {
    // the same boilerplate phrase in every bench doc; with maxBenchDf=1
    // those shingles are dropped, so only the unique tail can match
    val boiler = Seq(
      (200L, "standard disclaimer applies to this document alpha beta gamma"),
      (201L, "standard disclaimer applies to this document delta epsilon zeta"))
      .toDF("bid", "btext")
    val corpus = Seq(
      (1L, "standard disclaimer applies to this document unrelated body"))
      .toDF("id", "text")
    val loose = Dedup.contaminationPairs(corpus, "id", "text",
      boiler, "bid", "btext", minOverlap = 2, maxBenchDf = 10)
    val strict = Dedup.contaminationPairs(corpus, "id", "text",
      boiler, "bid", "btext", minOverlap = 2, maxBenchDf = 1)
    assert(loose.count() === 2L) // boilerplate matches both bench docs
    assert(strict.count() === 0L)
  }

  test("the bench side broadcasts; the corpus side never shuffles on shingles") {
    val q = SparkEntry.queries("dd_contamination")(spark, sf0001)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"bench postings must broadcast:\n$plan")
    // exchanges: bench-side df aggregation (small), the (doc,bench)
    // overlap aggregation, and the presentation sort — the corpus
    // postings themselves must not add a shingle-keyed exchange
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges <= 3,
      s"unexpected extra shuffles ($exchanges):\n$plan")
  }
}
