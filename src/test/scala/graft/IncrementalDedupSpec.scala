package graft

import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** Incremental dedup: a new batch of signatures probed against a frozen
  * corpus signature index (Dedup.minhashSignatures +
  * minhashNearDupsAgainst). The production shape: the corpus index is a
  * compact (id, sig) parquet written once; each increment dedups against
  * it without touching corpus text.
  */
class IncrementalDedupSpec extends SparkTestBase {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  private val base = "the quick brown fox jumps over the lazy dog " +
    "while the cat watches from the warm windowsill nearby today"

  test("a batch near-dup of a corpus doc is found via the index") {
    val corpus = docs(1L -> base, 2L -> ("completely unrelated text about " +
      "spark physical plans and shuffle exchanges in a distributed engine"))
    val batch = docs(10L -> (base + " tonight"))
    val got = Dedup.minhashNearDupsAgainst(
      Dedup.minhashSignatures(corpus, "doc_id", "text"),
      Dedup.minhashSignatures(batch, "doc_id", "text"),
      threshold = 0.5)
      .as[(Long, Long, Double)].collect().toSeq
    assert(got.map(p => (p._1, p._2)) == Seq((10L, 1L)),
      s"expected the planted pair, got $got")
    assert(got.head._3 >= 0.5 && got.head._3 <= 1.0)
  }

  test("an unrelated batch doc emits nothing") {
    val corpus = docs(1L -> base)
    val batch = docs(10L -> ("entirely disjoint vocabulary lives here " +
      "carrying zero common word shingles with the historical corpus rows"))
    val got = Dedup.minhashNearDupsAgainst(
      Dedup.minhashSignatures(corpus, "doc_id", "text"),
      Dedup.minhashSignatures(batch, "doc_id", "text"),
      threshold = 0.5).count()
    assert(got == 0L)
  }

  test("identical signatures estimate exactly 1.0") {
    val corpus = docs(1L -> base)
    val batch = docs(10L -> base)
    val got = Dedup.minhashNearDupsAgainst(
      Dedup.minhashSignatures(corpus, "doc_id", "text"),
      Dedup.minhashSignatures(batch, "doc_id", "text"),
      threshold = 0.5)
      .as[(Long, Long, Double)].collect().toSeq
    assert(got == Seq((10L, 1L, 1.0)))
  }

  test("maxBucket caps corpus partners per bucket at the smallest ids") {
    // 5 identical corpus docs land in one bucket per band; cap 2 keeps
    // the 2 smallest ids, so the batch probe pairs with exactly those
    val corpus = docs((1L to 5L).map(i => i -> base): _*)
    val batch = docs(10L -> base)
    val got = Dedup.minhashNearDupsAgainst(
      Dedup.minhashSignatures(corpus, "doc_id", "text"),
      Dedup.minhashSignatures(batch, "doc_id", "text"),
      threshold = 0.5, maxBucket = 2)
      .as[(Long, Long, Double)].collect().toSeq.sortBy(_._2)
    assert(got.map(_._2) == Seq(1L, 2L),
      s"cap 2 must keep corpus ids 1,2 only, got $got")
  }

  test("single-member corpus buckets still pair (no HAVING > 1 filter)") {
    // exactly one corpus doc: every bucket has one member, and the batch
    // near-dup must still find it — the self-join formulation's
    // count(*) > 1 filter would wrongly drop these buckets here
    val corpus = docs(1L -> base)
    val batch = docs(10L -> (base + " again"))
    val got = Dedup.minhashNearDupsAgainst(
      Dedup.minhashSignatures(corpus, "doc_id", "text"),
      Dedup.minhashSignatures(batch, "doc_id", "text"),
      threshold = 0.5).count()
    assert(got == 1L)
  }

  test("index update: newest signatures win, untouched rows pass through") {
    val old = Dedup.minhashSignatures(
      docs(1L -> base, 2L -> (base + " old suffix")), "doc_id", "text")
    val fresh = Dedup.minhashSignatures(
      docs(2L -> (base + " new suffix"), 3L -> ("completely new arrival " +
        "document with plenty of brand new never seen words in this row")),
      "doc_id", "text")
    val merged = Dedup.updateMinhashIndex(old, fresh)
    assert(merged.count() == 3L)
    // id 2's signature must be the FRESH one; id 1 untouched
    val sigOf = merged.select(col("id"), col("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    val freshSig = fresh.filter(col("id") === 2L)
      .select(col("sig")).as[Seq[Long]].collect().head
    val oldSig1 = old.filter(col("id") === 1L)
      .select(col("sig")).as[Seq[Long]].collect().head
    assert(sigOf(2L) == freshSig, "conflicting id must keep the new sig")
    assert(sigOf(1L) == oldSig1, "non-conflicting id must pass through")
    // a probe against the merged index sees the refreshed doc
    val probe = Dedup.minhashNearDupsAgainst(merged,
      Dedup.minhashSignatures(docs(10L -> (base + " new suffix")),
        "doc_id", "text"), threshold = 0.5)
      .select("batch_id", "corpus_id").as[(Long, Long)].collect().toSet
    assert(probe.contains((10L, 2L)), s"expected refreshed partner, got $probe")
  }

  test("agrees with the self-join operator's pairs on a split corpus") {
    // est-jaccard >= thr is a weaker rung than exact jaccard >= thr, so
    // compare CANDIDATE-pair recovery: every (corpus, batch) pair the
    // full self-join operator verifies at jaccard >= 0.7 must be found
    // by the index probe at a slightly slacker estimate threshold (the
    // estimator's spread at 32 hashes is ~1/32 per slot)
    val all = spark.read.parquet(s"$sf001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val sigs = Dedup.minhashSignatures(all, "doc_id", "text")
    val viaIndex = Dedup.minhashNearDupsAgainst(
      sigs.filter(col("id") % 4 =!= 0), sigs.filter(col("id") % 4 === 0),
      numHashes = 32, bands = 16, threshold = 0.5)
      .select(col("batch_id"), col("corpus_id")).as[(Long, Long)]
      .collect().toSet
    val exact = Dedup.minhashNearDups(all, "doc_id", "text",
      shingleSize = 3, numHashes = 32, bands = 16, threshold = 0.7)
      .select(col("id_a"), col("id_b")).as[(Long, Long)].collect()
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .filter { case (b, c) => b % 4 == 0 && c % 4 != 0 }.toSet
    assert(exact.nonEmpty, "fixture must contain cross-split near-dups")
    val missed = exact.filterNot(viaIndex.contains)
    assert(missed.isEmpty,
      s"index probe missed ${missed.size} of ${exact.size} pairs: $missed")
  }

  // ---- exact-verify rung: crafted overlap where est and exact DISAGREE
  // around the threshold (est is k/32 slot agreement; exact is true
  // shingle Jaccard — spread ±O(1/√32) puts them on opposite sides).
  // The word pools are disjoint, so shared shingles come only from the
  // shared prefix; measured (est, exact) per pair are pinned below.
  private val pool = Seq("alpha", "bravo", "charlie", "delta", "echo",
    "foxtrot", "golf", "hotel", "india", "juliet", "kilo", "lima", "mike",
    "november", "oscar", "papa", "quebec", "romeo", "sierra", "tango",
    "uniform", "victor", "whiskey", "xray", "yankee", "zulu", "apple",
    "banana", "cherry", "date")
  private val corpusDocA = pool.take(20).mkString(" ")
  private def prefixShare(k: Int) =
    (pool.take(k) ++ pool.slice(20, 20 + (20 - k))).mkString(" ")

  // bands = 16 (2 rows/band): the borderline pairs below collide in at
  // least one band there; at 8 bands x 4 rows the rescued pair would
  // never surface as a candidate at all
  private def verifiedProbe(corpus: org.apache.spark.sql.DataFrame,
      batch: org.apache.spark.sql.DataFrame, thr: Double, eps: Double) =
    Dedup.minhashNearDupsAgainstVerified(
      Dedup.minhashSignatures(corpus, "doc_id", "text"),
      Dedup.minhashSignatures(batch, "doc_id", "text"),
      corpus, batch, "doc_id", "text", bands = 16,
      threshold = thr, epsilon = eps)

  test("verified probe DROPS a borderline pair the estimate over-accepts") {
    // pair (1, 112): est = 15/32 = 0.46875 >= thr, exact = 10/26 ≈ 0.3846
    // < thr — the estimate-only probe accepts a pair below the true
    // threshold; the verified rung re-checks it exactly and drops it
    val corpus = docs(1L -> corpusDocA)
    val batch = docs(112L -> prefixShare(12))
    val estOnly = Dedup.minhashNearDupsAgainst(
      Dedup.minhashSignatures(corpus, "doc_id", "text"),
      Dedup.minhashSignatures(batch, "doc_id", "text"),
      bands = 16, threshold = 0.4)
    assert(estOnly.count() == 1L, "estimate alone must over-accept here")
    assert(verifiedProbe(corpus, batch, thr = 0.4, eps = 0.125).count() == 0L,
      "exact verification must drop the spurious pair")
  }

  test("verified probe RESCUES a borderline pair the estimate misses") {
    // pair (1, 111): est = 10/32 = 0.3125 < thr, exact = 1/3 >= thr —
    // the estimate-only probe misses a true near-dup; the borderline
    // band re-check rescues it with the exact value
    val corpus = docs(1L -> corpusDocA)
    val batch = docs(111L -> prefixShare(11))
    val estOnly = Dedup.minhashNearDupsAgainst(
      Dedup.minhashSignatures(corpus, "doc_id", "text"),
      Dedup.minhashSignatures(batch, "doc_id", "text"),
      bands = 16, threshold = 0.33)
    assert(estOnly.count() == 0L, "estimate alone must miss this pair")
    val got = verifiedProbe(corpus, batch, thr = 0.33, eps = 0.1)
      .as[(Long, Long, Double, Double)].collect().toSeq
    assert(got.map(p => (p._1, p._2)) == Seq((111L, 1L)))
    assert(got.head._3 == 0.3125, "est_jaccard rides along")
    assert(math.abs(got.head._4 - 1.0 / 3) < 1e-15,
      s"jaccard must be the exact value, got ${got.head._4}")
  }

  test("confident pairs pass on the estimate without touching text") {
    // pair (1, 119): est = 30/32 = 0.9375 >= thr + eps — accepted with
    // jaccard = est_jaccard (the exact rung never runs for it)
    val corpus = docs(1L -> corpusDocA)
    val batch = docs(119L -> prefixShare(19))
    val got = verifiedProbe(corpus, batch, thr = 0.4, eps = 0.125)
      .as[(Long, Long, Double, Double)].collect().toSeq
    assert(got == Seq((119L, 1L, 0.9375, 0.9375)))
  }
}
