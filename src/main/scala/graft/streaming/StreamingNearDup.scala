package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming MinHash near-duplicate detection — the continuous analogue
  * of `graft.dedup.Dedup.minhashNearDups` for deduplicating an unbounded
  * document ingest (the 100 TB crawl-stream case, where batch backfill
  * banding cannot see documents that have not arrived yet).
  *
  * Same signature/banding math as the batch operator (the codegen'd
  * `word_shingles` → `minhash_signature` expressions and the identical
  * `xxhash64(band, slice(sig))` band hash), but candidate generation and
  * verification fold into per-bucket state:
  *
  *  - Each arriving document joins its `bands` bucket keys; per
  *    (band, band_hash) the state holds a BOUNDED ring of the most
  *    recent `maxBucket` member signatures (newest-wins eviction — on a
  *    stream the recent neighbors are the ones still worth matching).
  *  - Verification is the standard signature estimate: matching
  *    signature slots / numHashes ≈ Jaccard (within ±O(1/√numHashes));
  *    the batch operator re-joins shingle sets for EXACT Jaccard, which
  *    a stream cannot do without retaining every document's shingles.
  *    The estimate is computed from state already in memory — no join,
  *    no second pass. For thresholds where the ±1/√numHashes band
  *    matters, `exactVerify = true` keeps the (sorted, hashed) shingle
  *    sets in the ring and verifies exactly — memory × ~shingles/doc,
  *    the explicit cost of removing the estimate's error band.
  *  - The `horizon` is enforced at MATCH time (a pair only forms when
  *    the two documents' event times are within `horizon` of each
  *    other) — the state timeout alone cannot carry that contract,
  *    because timeouts fire lazily when a later batch advances the
  *    watermark, and a document arriving right after a quiet period
  *    would pair with a stale ring member the timeout had not yet
  *    collected.
  *  - Bucket state is EVICTED by event-time timeout once the watermark
  *    passes `horizon` beyond the bucket's last activity — memory is
  *    bounded by (active buckets within the horizon) × maxBucket
  *    signatures, the only sound contract on an infinite stream.
  *
  * A pair sharing several bands re-emits once per matching band;
  * `streamingNearDups` composes `dropDuplicatesWithinWatermark` on the
  * pair key to collapse them (watermark-evicted pair state).
  */
object StreamingNearDup {

  final case class BandRow(band: Int, bandHash: Long, id: Long,
      ts: Timestamp, sig: Array[Long], shingles: Array[Long])

  final case class CandidatePair(id_a: Long, id_b: Long,
      est_jaccard: Double, ts: Timestamp)

  /** Per-bucket member ring: parallel arrays, oldest-arrival evicted at
    * `maxBucket`. Member event times ride along so matching can enforce
    * the horizon per pair (see [[nearDupCandidates]]); capacity eviction
    * stays purely arrival-ordered — age never changes WHICH members the
    * cap retains, so the semantics remain the exactly-modelable
    * "newest maxBucket arrivals". Java-serialized state (same pattern as
    * StreamingJoins.QuoteBuffer).
    *
    * NOTE: the round-7 field additions (tss, shs) bump the
    * SerialVersionUID — a streaming query restarted from a checkpoint
    * written by the previous layout will fail to deserialize its rings;
    * restart such queries with a fresh checkpoint (in-flight horizon
    * state is rebuilt from the stream within one horizon).
    */
  @SerialVersionUID(2L)
  final class BucketRing(val maxBucket: Int) extends Serializable {
    var ids: Array[Long] = Array.emptyLongArray
    var tss: Array[Long] = Array.emptyLongArray
    var sigs: Array[Array[Long]] = Array.empty
    var shs: Array[Array[Long]] = Array.empty

    def insert(id: Long, ts: Long, sig: Array[Long],
        sh: Array[Long]): Unit = {
      val drop = math.max(0, ids.length + 1 - maxBucket)
      ids = java.util.Arrays.copyOfRange(ids, drop, ids.length) :+ id
      tss = java.util.Arrays.copyOfRange(tss, drop, tss.length) :+ ts
      sigs = sigs.drop(drop) :+ sig
      shs = shs.drop(drop) :+ sh
    }
  }

  implicit private val ringEnc: Encoder[BucketRing] =
    Encoders.javaSerialization[BucketRing]

  private def estJaccard(a: Array[Long], b: Array[Long]): Double = {
    var eq = 0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { if (a(i) == b(i)) eq += 1; i += 1 }
    eq.toDouble / math.max(a.length, b.length)
  }

  /** Exact Jaccard of two SORTED distinct long arrays (the
    * hashed_word_shingles representation) by one merge pass — the same
    * math as HashKernels.sortedLongJaccard, over driver-side arrays.
    */
  private def exactJaccard(a: Array[Long], b: Array[Long]): Double = {
    var i = 0
    var j = 0
    var inter = 0
    while (i < a.length && j < b.length) {
      if (a(i) == b(j)) { inter += 1; i += 1; j += 1 }
      else if (a(i) < b(j)) i += 1
      else j += 1
    }
    val union = a.length + b.length - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }

  /** Near-dup candidate pairs (id_a < id_b, est_jaccard ≥ threshold)
    * from a document stream. May emit a pair once per shared band — see
    * [[streamingNearDups]] for the deduplicated composition. Works on
    * batch frames too (state within the single "batch" micro-batch).
    */
  def nearDupCandidates(docs: DataFrame, idCol: String = "doc_id",
      tsCol: String = "ts", textCol: String = "text",
      shingleSize: Int = 3, numHashes: Int = 32, bands: Int = 8,
      threshold: Double = 0.8, maxBucket: Int = 64,
      horizon: String = "1 hour",
      exactVerify: Boolean = false): Dataset[CandidatePair] = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val spark = docs.sparkSession
    import spark.implicits._

    // exactVerify: the ring ALSO keeps each document's sorted hashed
    // shingle set (hashed_word_shingles — same canonical normalization
    // as the signature's shingles, 8 B/shingle) and verification is the
    // EXACT Jaccard of the stored sets, removing the estimate's
    // ±O(1/√numHashes) band around the threshold at the cost of state
    // memory × ~shingles/doc and shingle bytes through the band shuffle.
    // Off by default: the estimate-from-state path is the bounded-memory
    // contract for a high-volume stream.
    val shinglesCol =
      if (exactVerify)
        graft.functions.HashFunctions.hashedWordShingles(col(textCol),
          shingleSize)
      else typedLit(Array.emptyLongArray)
    // filter on the SHINGLE array, not the signature: an empty shingle
    // set still yields a numHashes-long all-MaxValue signature (never an
    // empty array), and such docs would phantom-pair with every other
    // short doc at est 1.0 — the batch operator drops them before
    // banding, so this one must too
    val sigs = docs
      .filter(col(idCol).isNotNull)
      .select(col(idCol).cast("long").as("id"),
        col(tsCol).cast("timestamp").as("ts"),
        graft.functions.HashFunctions.wordShingles(col(textCol),
          shingleSize).as("__sh"),
        shinglesCol.as("shingles"))
      .filter(size(col("__sh")) > 0)
      .select(col("id"), col("ts"),
        graft.functions.HashFunctions.minhashSignature(col("__sh"),
          numHashes).as("sig"),
        col("shingles"))
      .withWatermark("ts", horizon)
    // identical band hash to the batch operator — the ONE shared
    // definition (graft.dedup.Dedup.bandHashes)
    val banded = sigs.select(col("id"), col("ts"), col("sig"),
        col("shingles"),
        posexplode(graft.dedup.Dedup.bandHashes(col("sig"), numHashes,
          bands)).as(Seq("band", "band_hash")))
      .select(col("band"), col("band_hash").as("bandHash"), col("id"),
        col("ts"), col("sig"), col("shingles"))
      .as[BandRow]

    val iv = org.apache.spark.sql.catalyst.util.IntervalUtils.stringToInterval(
      org.apache.spark.unsafe.types.UTF8String.fromString(horizon))
    // month-valued horizons are rejected: a month has no fixed millisecond
    // width, so any constant here could disagree with the watermark
    // delay's own conversion and evict ring state off-contract. Day/hour
    // horizons (the realistic dedup windows) convert exactly.
    require(iv.months == 0,
      s"horizon must not contain month/year units (got '$horizon'); " +
        "use days or hours so the state timeout and the watermark agree")
    val horizonMs = iv.days * 86400000L + iv.microseconds / 1000L

    banded.groupByKey(r => (r.band, r.bandHash)).flatMapGroupsWithState(
      OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
      (_: (Int, Long), rows: Iterator[BandRow],
          state: GroupState[BucketRing]) =>
        if (state.hasTimedOut) {
          // watermark passed the bucket's horizon: neighbors this old no
          // longer need matching — drop the whole ring
          state.remove()
          Iterator.empty
        } else {
          val ring = state.getOption.getOrElse(new BucketRing(maxBucket))
          // deterministic event-order processing within the micro-batch
          val batch = rows.toArray.sortBy(r => (r.ts.getTime, r.id))
          val out = Vector.newBuilder[CandidatePair]
          batch.foreach { r =>
            var i = 0
            while (i < ring.ids.length) {
              val other = ring.ids(i)
              // the horizon is enforced PER PAIR at match time, not just
              // by the (lazy) state timeout: timeout eviction only runs
              // when a later batch advances the watermark, so a document
              // arriving long after a quiet period would otherwise still
              // pair with a stale ring member across the horizon
              if (other != r.id &&
                  math.abs(r.ts.getTime - ring.tss(i)) <= horizonMs) {
                // flagged mode verifies with the exact Jaccard of the
                // stored shingle sets; default mode uses the signature
                // estimate (est_jaccard then carries whichever decided)
                val sim =
                  if (exactVerify) exactJaccard(ring.shs(i), r.shingles)
                  else estJaccard(ring.sigs(i), r.sig)
                if (sim >= threshold)
                  out += CandidatePair(math.min(other, r.id),
                    math.max(other, r.id), sim, r.ts)
              }
              i += 1
            }
            ring.insert(r.id, r.ts.getTime, r.sig, r.shingles)
          }
          state.update(ring)
          // evict the bucket once the watermark is `horizon` past its
          // newest member (batch rows are never behind the watermark)
          if (batch.nonEmpty) {
            val last = batch.iterator.map(_.ts.getTime).max
            state.setTimeoutTimestamp(last + horizonMs)
          }
          out.result().iterator
        }
    }
  }

  /** Candidate pairs with the cross-band re-emissions collapsed: exact
    * duplicate (id_a, id_b) pairs within the watermark horizon are
    * dropped (watermark-evicted pair state, the streaming analogue of
    * the batch operator's `dropDuplicates`).
    *
    * Chaining a second stateful operator after flatMapGroupsWithState
    * trips Spark's conservative global-watermark correctness check —
    * set `spark.sql.streaming.statefulOperator.checkCorrectness.enabled`
    * to `false` for this composition. It is safe HERE because every
    * emitted pair carries the ARRIVING row's event time, which is never
    * behind the watermark, so the downstream dedup never sees a late
    * row (the scenario the check guards against). Consumers that prefer
    * to keep the check on can use [[nearDupCandidates]] and dedup pairs
    * in the sink.
    */
  def streamingNearDups(docs: DataFrame, idCol: String = "doc_id",
      tsCol: String = "ts", textCol: String = "text",
      shingleSize: Int = 3, numHashes: Int = 32, bands: Int = 8,
      threshold: Double = 0.8, maxBucket: Int = 64,
      horizon: String = "1 hour", exactVerify: Boolean = false): DataFrame =
    nearDupCandidates(docs, idCol, tsCol, textCol, shingleSize, numHashes,
      bands, threshold, maxBucket, horizon, exactVerify)
      .toDF()
      .withWatermark("ts", horizon)
      .dropDuplicatesWithinWatermark("id_a", "id_b")

  /** Streaming INCREMENTAL dedup: arriving documents probe a FROZEN
    * corpus index ([[graft.dedup.Dedup.minhashBucketTable]], typically
    * read back from parquet) — the continuous form of
    * [[graft.dedup.Dedup.minhashNearDupsAgainst]], emitting
    * `(batch_id, corpus_id, est_jaccard, ts)` per arriving near-dup.
    *
    * Unlike the self-dedup operator above this needs NO custom state at
    * all: the corpus side is static, so the probe is a stream-static
    * equi-join on (band, band_hash) — every Spark version's supported
    * path, trivially scalable, with the bucket members (and their
    * signatures) riding in the joined row so verification is a
    * stateless HOF over the pair. The only stateful step is the
    * watermark-scoped pair dedup collapsing cross-band re-emissions
    * (a document's band rows all land in its own micro-batch, so
    * `dedupHorizon` only needs to cover reprocessing overlap, not data
    * skew). Pass the bucket table PRE-MATERIALIZED (parquet read or
    * persisted) — an unpersisted derived plan would recompute the corpus
    * aggregation every micro-batch.
    *
    * On a BATCH frame the same pipeline runs with a plain
    * `dropDuplicates` — the driver-facing batch twin, pinned equal to
    * the batch operator's answer by its shared oracle.
    */
  def nearDupsAgainstIndex(docs: DataFrame, bucketTable: DataFrame,
      idCol: String = "doc_id", tsCol: String = "ts",
      textCol: String = "text", shingleSize: Int = 3, numHashes: Int = 32,
      bands: Int = 8, threshold: Double = 0.8,
      dedupHorizon: String = "1 hour"): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    // filter on the SHINGLE array, not the signature: an empty shingle
    // set still yields a numHashes-long all-MaxValue signature, and such
    // docs would phantom-pair with every other short doc at est 1.0
    // (same contract as Dedup.minhashSignatures)
    val sigs = docs
      .filter(col(idCol).isNotNull)
      .select(col(idCol).as("batch_id"),
        col(tsCol).cast("timestamp").as("ts"),
        graft.functions.HashFunctions.wordShingles(col(textCol),
          shingleSize).as("__sh"))
      .filter(size(col("__sh")) > 0)
      .select(col("batch_id"), col("ts"),
        graft.functions.HashFunctions.minhashSignature(col("__sh"),
          numHashes).as("sig"))
    // guard against a bucket table built with DIFFERENT banding params:
    // a bands/numHashes mismatch makes every band hash miss and the
    // probe "succeeds" with zero pairs forever — a silent recall
    // collapse. One bounded aggregation over the static table at
    // plan-build time turns it into a hard failure (the table is the
    // compact index; an empty table trivially passes — no pairs is then
    // the correct answer).
    val probe = bucketTable
      .select(max(col("band")).as("mb"),
        min(size(col("members")(0)("sig"))).as("nh"),
        max(size(col("members")(0)("sig"))).as("nh2"))
      .collect()(0)
    if (!probe.isNullAt(0)) {
      require(probe.getInt(0) == bands - 1,
        s"bucketTable was built with ${probe.getInt(0) + 1} bands, " +
          s"probe configured with $bands — rebuild or match the params")
      require(probe.getInt(1) == numHashes && probe.getInt(2) == numHashes,
        s"bucketTable signatures have ${probe.getInt(1)} slots, probe " +
          s"configured with numHashes=$numHashes")
    }
    val banded = sigs.select(col("batch_id"), col("ts"), col("sig"),
      posexplode(graft.dedup.Dedup.bandHashes(col("sig"), numHashes,
        bands)).as(Seq("band", "band_hash")))
    val paired = banded
      .join(bucketTable, Seq("band", "band_hash")) // stream-static
      .select(col("batch_id"), col("ts"), col("sig"),
        explode(col("members")).as("m"))
      .select(col("batch_id"), col("ts"),
        col("m.id").as("corpus_id"),
        graft.dedup.Dedup.sigAgreement(col("sig"), col("m.sig"), numHashes)
          .as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
    if (paired.isStreaming)
      paired.withWatermark("ts", dedupHorizon)
        .dropDuplicatesWithinWatermark("batch_id", "corpus_id")
    else paired.dropDuplicates("batch_id", "corpus_id")
  }
}
