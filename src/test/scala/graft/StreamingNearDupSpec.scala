package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamingNearDup

/** Streaming MinHash near-dup: the banded state machine must find the
  * same signature-estimate pairs a batch pass over the same documents
  * finds (for in-horizon data), across micro-batch splits, and must
  * evict bucket state once the watermark passes the horizon.
  */
class StreamingNearDupSpec extends SparkTestBase {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog again " +
    "and again while the rain in spain stays mainly on the plain every day"
  private def t(min: Int): Timestamp =
    Timestamp.valueOf(f"2024-03-01 ${10 + min / 60}%02d:${min % 60}%02d:00")

  // doc 1 ≈ doc 2 ≈ doc 5 (near-dups); 3 and 4 unrelated
  private val docs: Seq[(Long, Timestamp, String)] = Seq(
    (1L, t(0), base),
    (3L, t(1), "completely different text about spark catalyst expressions codegen and shuffle exchanges hash aggregates"),
    (2L, t(5), base + " extra"),
    (4L, t(6), "yet another unrelated document mentioning minhash banding buckets jaccard verification and thresholds"),
    (5L, t(9), base.replace("fox", "cat")))

  /** Batch-side model: same signatures via the same expressions, banded
    * candidate generation + signature-estimate verification in plain
    * Scala.
    */
  private def batchModel(threshold: Double, numHashes: Int = 32,
      bands: Int = 8): Set[(Long, Long)] = {
    val rows = docs.toDF("doc_id", "ts", "text")
      .select(col("doc_id"),
        graft.functions.HashFunctions.minhashSignature(
          graft.functions.HashFunctions.wordShingles(col("text"), 3),
          numHashes).as("sig"))
      .as[(Long, Seq[Long])].collect()
    val rpb = numHashes / bands
    def bandKeys(sig: Seq[Long]): Set[(Int, Seq[Long])] =
      (0 until bands).map(b => (b, sig.slice(b * rpb, (b + 1) * rpb))).toSet
    (for {
      Seq((ida, sa), (idb, sb)) <- rows.toSeq.combinations(2)
      if bandKeys(sa).intersect(bandKeys(sb)).nonEmpty
      est = sa.zip(sb).count { case (x, y) => x == y }.toDouble / numHashes
      if est >= threshold
    } yield (math.min(ida, idb), math.max(ida, idb))).toSet
  }

  test("streaming pairs across micro-batches equal the batch model") {
    implicit val sc = spark.sqlContext
    // emitted pair ts is the arriving row's event time (never late), so
    // the conservative chained-stateful-operator check is safe to lift
    // for the pair-dedup composition — see streamingNearDups scaladoc
    val checkKey = "spark.sql.streaming.statefulOperator.checkCorrectness.enabled"
    val prev = spark.conf.getOption(checkKey)
    spark.conf.set(checkKey, "false")
    try {
    val input = MemoryStream[(Long, Timestamp, String)]
    val stream = input.toDS().toDF("doc_id", "ts", "text")
    val q = StreamingNearDup.streamingNearDups(stream, threshold = 0.5)
      .writeStream.format("memory").queryName("neardup_out")
      .outputMode("append").start()
    // split mid-cluster so pairing must work through persisted state
    input.addData(docs.take(2): _*)
    q.processAllAvailable()
    input.addData(docs.drop(2): _*)
    q.processAllAvailable()
    q.stop()

    val got = spark.table("neardup_out")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val want = batchModel(0.5)
    assert(got == want, s"streamed $got vs batch model $want")
    assert(want.contains((1L, 2L)) && want.contains((1L, 5L)),
      "planted near-dups must be found")
    assert(!want.exists(p => p._1 == 3L || p._2 == 3L || p._1 == 4L),
      "unrelated docs must not pair")
    // cross-band duplicates collapsed by the watermarked pair dedup
    val emitted = spark.table("neardup_out").groupBy("id_a", "id_b")
      .count().agg(max("count")).collect()(0).getLong(0)
    assert(emitted == 1L, "each pair must emit exactly once")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(checkKey, v)
        case None => spark.conf.unset(checkKey)
      }
    }
  }

  test("bucket state evicts after the horizon: stale partners don't pair") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String)]
    val stream = input.toDS().toDF("doc_id", "ts", "text")
    val q = StreamingNearDup.nearDupCandidates(stream, threshold = 0.5,
        horizon = "10 minutes")
      .writeStream.format("memory").queryName("neardup_evict")
      .outputMode("append").start()
    input.addData((1L, t(0), base))
    q.processAllAvailable()
    // push the watermark far past t(0) + 10 min with an unrelated doc
    input.addData((9L, t(120), "watermark advancing filler text that is long enough to shingle properly with many distinct words"))
    q.processAllAvailable()
    // near-dup of doc 1 arrives after its bucket was evicted
    input.addData((2L, t(125), base + " extra"))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("neardup_evict")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(!got.contains((1L, 2L)),
      s"evicted partner must not pair, got $got")
  }
}
