package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.streaming.StreamingNearDup

/** Streaming incremental dedup: arriving documents probe a frozen corpus
  * bucket table (stream-static join) and must find exactly the pairs the
  * batch incremental operator finds on the same data — across
  * micro-batch splits, with cross-band re-emissions collapsed.
  */
class StreamingIncrementalSpec extends SparkTestBase {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog again " +
    "and again while the rain in spain stays mainly on the plain every day"
  private def t(min: Int): Timestamp =
    Timestamp.valueOf(f"2024-03-01 10:$min%02d:00")

  private val corpusDocs = Seq(
    (1L, base),
    (2L, "completely different text about spark catalyst expressions " +
      "codegen and shuffle exchanges hash aggregates"),
    (3L, base.replace("fox", "cat")))
  // 10 near-dups corpus 1 and 3; 11 unrelated; 12 near-dups corpus 1
  private val batchDocs = Seq(
    (10L, t(0), base + " extra"),
    (11L, t(1), "yet another unrelated document mentioning minhash " +
      "banding buckets jaccard verification and thresholds"),
    (12L, t(5), base))

  private def corpusSigs = Dedup.minhashSignatures(
    corpusDocs.toDF("doc_id", "text"), "doc_id", "text")

  private def batchPairs: Set[(Long, Long)] =
    Dedup.minhashNearDupsAgainst(corpusSigs,
      Dedup.minhashSignatures(
        batchDocs.map(d => (d._1, d._3)).toDF("doc_id", "text"),
        "doc_id", "text"),
      threshold = 0.5)
      .select("batch_id", "corpus_id").as[(Long, Long)].collect().toSet

  test("streamed probe equals the batch incremental operator") {
    implicit val sc = spark.sqlContext
    val buckets = Dedup.minhashBucketTable(corpusSigs).persist()
    try {
      val input = MemoryStream[(Long, Timestamp, String)]
      val q = StreamingNearDup.nearDupsAgainstIndex(
          input.toDS().toDF("doc_id", "ts", "text"), buckets,
          threshold = 0.5)
        .writeStream.format("memory").queryName("inc_out")
        .outputMode("append").start()
      // split mid-stream: the static side must serve both micro-batches
      input.addData(batchDocs.take(1): _*)
      q.processAllAvailable()
      input.addData(batchDocs.drop(1): _*)
      q.processAllAvailable()
      q.stop()

      val got = spark.table("inc_out")
        .select("batch_id", "corpus_id").as[(Long, Long)].collect().toSet
      val want = batchPairs
      assert(want.contains((10L, 1L)) && want.contains((12L, 1L)),
        s"planted cross-corpus dups must be found, got $want")
      assert(!want.exists(_._1 == 11L), "unrelated doc must not pair")
      assert(got == want, s"streamed $got vs batch operator $want")
      // cross-band duplicates collapsed by the watermarked pair dedup
      val maxEmit = spark.table("inc_out").groupBy("batch_id", "corpus_id")
        .count().agg(max("count")).collect()(0).getLong(0)
      assert(maxEmit == 1L, "each pair must emit exactly once")
    } finally buckets.unpersist()
  }

  test("batch mode of the streaming pipeline equals the batch operator") {
    val buckets = Dedup.minhashBucketTable(corpusSigs)
    val got = StreamingNearDup.nearDupsAgainstIndex(
        batchDocs.toDF("doc_id", "ts", "text"), buckets, threshold = 0.5)
      .select("batch_id", "corpus_id").as[(Long, Long)].collect().toSet
    assert(got == batchPairs)
  }

  test("probe rejects a bucket table built with different banding params") {
    // a bands or numHashes mismatch would make every band hash miss and
    // the probe "succeed" with zero pairs forever — the guard turns the
    // silent recall collapse into a hard failure at plan-build time
    val table16 = Dedup.minhashBucketTable(corpusSigs, bands = 16)
    val e = intercept[IllegalArgumentException] {
      StreamingNearDup.nearDupsAgainstIndex(
        batchDocs.toDF("doc_id", "ts", "text"), table16, bands = 8)
    }
    assert(e.getMessage.contains("16 bands"), e.getMessage)
    val table8 = Dedup.minhashBucketTable(
      Dedup.minhashSignatures(corpusDocs.toDF("doc_id", "text"),
        "doc_id", "text", numHashes = 16), numHashes = 16, bands = 8)
    val e2 = intercept[IllegalArgumentException] {
      StreamingNearDup.nearDupsAgainstIndex(
        batchDocs.toDF("doc_id", "ts", "text"), table8, numHashes = 32,
        bands = 8)
    }
    assert(e2.getMessage.contains("16 slots"), e2.getMessage)
  }

  test("short documents never phantom-pair on the all-MaxValue signature") {
    // two docs under the shingle width share the degenerate empty-shingle
    // signature; neither may emit (the corpus doc must not even index)
    val shortCorpus = Dedup.minhashSignatures(
      Seq((1L, "too short")).toDF("doc_id", "text"), "doc_id", "text")
    assert(shortCorpus.count() == 0L)
    val buckets = Dedup.minhashBucketTable(corpusSigs)
    val got = StreamingNearDup.nearDupsAgainstIndex(
      Seq((10L, t(0), "also short")).toDF("doc_id", "ts", "text"),
      buckets, threshold = 0.5).count()
    assert(got == 0L)
  }
}
