package graft

import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** dd_containment's scale story IS the lossless upper-bound prune
  * (Dedup.containmentCandidates): at sf0.1 ~1.25M raw co-occurring
  * rare-shingle pairs must collapse to a few hundred candidates before
  * any shingle array is joined. Round-13 verdict #8: pin the candidate
  * cardinality directly, so a prune regression (a weakened bound, a
  * dropped filter) fails THIS spec instead of surfacing as +5 s of
  * bench drift.
  */
class ContainmentPruneSpec extends SparkTestBase {

  private def counts(sfDir: String): (Long, Long, Long) = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val sh = Dedup.containmentShingles(docs, "doc_id", "text", 3)
    val cands = Dedup.containmentCandidates(sh, 0.8, 20).count()
    // the raw co-occurring pair volume the prune faces: Σ C(df, 2)
    // over rare shingles — what would expand without the bound
    val posting = sh.select(col("id"), col("n"),
      explode(col("sh")).as("g"))
    val raw = posting
      .groupBy("g").agg(count(lit(1)).as("c"))
      .filter(col("c") <= 20 && col("c") > 1)
      .agg(sum((col("c") * (col("c") - 1) / 2).cast("long")))
      .head().getLong(0)
    val verified = Dedup.containmentPairs(docs, "doc_id", "text").count()
    (raw, cands, verified)
  }

  test("sf0.1: the lossless prune collapses ~1.25M raw pairs to a few " +
      "hundred candidates, losing no verified pair") {
    val dir = "/root/testdata/sf0.1"
    assume(new java.io.File(dir).isDirectory)
    val (raw, cands, verified) = counts(dir)
    // non-vacuous: the prune must be facing real candidate volume
    assert(raw >= 100000L, s"raw pair volume collapsed to $raw — the " +
      "fixture no longer exercises the prune")
    // the pin: a weakened bound shows up here, not as bench drift
    // (measured 256 at round 14; headroom for data regeneration)
    assert(cands <= 5000L, s"prune regression: $cands candidates " +
      s"expanded from $raw raw pairs (expected a few hundred)")
    // losslessness: every verified pair survived the prune
    assert(verified <= cands, s"verified $verified > candidates $cands")
    assert(verified > 0L, "no verified pairs — vacuous fixture")
  }

  test("sf0.01: same shape at the small factor") {
    val dir = "/root/testdata/sf0.01"
    assume(new java.io.File(dir).isDirectory)
    val (raw, cands, verified) = counts(dir)
    assert(raw >= 5000L, s"raw pair volume collapsed to $raw")
    assert(cands <= 1000L, s"prune regression: $cands candidates")
    assert(verified <= cands && verified > 0L)
  }
}
