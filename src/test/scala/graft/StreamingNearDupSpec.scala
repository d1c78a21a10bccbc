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

  test("horizon holds in a strict two-batch run: match-time enforcement") {
    // batch 1: doc 1; batch 2: an IDENTICAL doc 125 min later with a
    // 10 min horizon. No intermediate batch advanced the watermark, so
    // the bucket state has NOT timed out when doc 2 arrives — only the
    // per-pair event-time check can block the stale pair. A positive
    // control in the same batch (docs 2 and 5, 2 min apart) proves the
    // pipeline still pairs in-horizon arrivals.
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String)]
    val stream = input.toDS().toDF("doc_id", "ts", "text")
    val q = StreamingNearDup.nearDupCandidates(stream, threshold = 0.5,
        horizon = "10 minutes")
      .writeStream.format("memory").queryName("neardup_2batch")
      .outputMode("append").start()
    input.addData((1L, t(0), base))
    q.processAllAvailable()
    input.addData((2L, t(125), base), (5L, t(127), base + " extra"))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("neardup_2batch")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(!got.contains((1L, 2L)) && !got.contains((1L, 5L)),
      s"pair across the horizon must not emit, got $got")
    assert(got.contains((2L, 5L)),
      s"in-horizon near-dups must still pair, got $got")
  }

  test("exactVerify resolves an estimate/exact disagreement at the threshold") {
    import spark.implicits._
    // find a near-dup variant whose 32-slot signature estimate and exact
    // shingle Jaccard DIFFER while still sharing a band (everything is
    // deterministic — hash-derived signatures on fixed text — so the
    // chosen variant is stable run to run)
    val variants = Seq("wolf", "bear", "lion", "crow", "toad", "hare")
      .map(w => base.replace("dog", w)) :+ (base + " coda")
    val picked = variants.iterator.map { vtext =>
      val rows = Seq((1L, t(0), base), (2L, t(1), vtext))
        .toDF("doc_id", "ts", "text")
        .select(col("doc_id"),
          graft.functions.HashFunctions.minhashSignature(
            graft.functions.HashFunctions.wordShingles(col("text"), 3),
            32).as("sig"),
          graft.functions.HashFunctions.hashedWordShingles(col("text"), 3)
            .as("sh"))
        .as[(Long, Seq[Long], Seq[Long])].collect().sortBy(_._1)
      val Array((_, sigA, shA), (_, sigB, shB)) = rows
      val est = sigA.zip(sigB).count { case (x, y) => x == y } / 32.0
      val inter = shA.toSet.intersect(shB.toSet).size
      val exact = inter.toDouble / (shA.size + shB.size - inter)
      val shareBand = (0 until 8).exists(b =>
        sigA.slice(b * 4, b * 4 + 4) == sigB.slice(b * 4, b * 4 + 4))
      (vtext, est, exact, shareBand)
    }.find(v => v._2 != v._3 && v._4)
    assert(picked.nonEmpty,
      "no variant with est != exact sharing a band — widen the list")
    val (vtext, est, exact, _) = picked.get
    info(f"variant est=$est%.4f exact=$exact%.4f")
    val thr = (est + exact) / 2
    val docsDf = Seq((1L, t(0), base), (2L, t(1), vtext))
      .toDF("doc_id", "ts", "text")

    def pairs(exactMode: Boolean): Map[(Long, Long), Double] =
      StreamingNearDup.nearDupCandidates(docsDf, threshold = thr,
          exactVerify = exactMode)
        .collect().map(p => (p.id_a, p.id_b) -> p.est_jaccard).toMap

    val estMode = pairs(exactMode = false)
    val exactMode = pairs(exactMode = true)
    // the modes must DISAGREE at this threshold, and the flagged mode
    // must carry the true exact-Jaccard decision (and value)
    assert(estMode.contains((1L, 2L)) !== exactMode.contains((1L, 2L)),
      s"est mode $estMode vs exact mode $exactMode should disagree at $thr")
    assert(exactMode.contains((1L, 2L)) === (exact >= thr))
    exactMode.get((1L, 2L)).foreach(j => assert(j === exact))
  }

  test("month-valued horizons are rejected") {
    // a month has no fixed millisecond width: the state timeout and the
    // watermark delay could disagree on when the horizon passes
    val e = intercept[IllegalArgumentException] {
      StreamingNearDup.nearDupCandidates(
        docs.toDF("doc_id", "ts", "text"), horizon = "1 month")
    }
    assert(e.getMessage.contains("month"))
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
