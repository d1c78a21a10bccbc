package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.sim.Similarity

/** Incremental SemDeDup: a frozen cell index (semanticCellIndex) probed
  * by new batches (semanticNearDupsAgainst), batch and streaming. Pins
  * the planted cross-split near-dup, the per-cell member cap, empty-cell
  * probes, the contiguous-cell index guard, and stream/batch parity of
  * the IDENTICAL pipeline (the probe is one stateless stream-static
  * equi-join — cells are single-assignment, so a pair forms exactly
  * once and no dedup state is needed, unlike the banded MinHash probe).
  */
class SemanticIncrementalSpec extends SparkTestBase {
  import spark.implicits._

  // two well-separated clusters; corpus holds both, the batch probes
  // with a near-copy of a cluster-A member plus an unrelated direction
  private def vA(eps: Double) = Seq(10.0 + eps, 1.0, 10.0)
  private val corpus = Seq(
    (1L, vA(0.0)), (3L, vA(0.002)),
    (5L, Seq(-10.0, 1.0, -10.0)), (7L, Seq(-10.0, 1.001, -10.0)))
    .toDF("vec_id", "embedding")
  private val batch = Seq(
    (100L, vA(0.001)),                 // near-dup of corpus 1/3
    (101L, Seq(0.0, 50.0, 0.0)))       // orthogonal-ish, pairs with nothing
    .toDF("vec_id", "embedding")

  private def index = Similarity.semanticCellIndex(corpus, "vec_id",
    "embedding", nCentroids = 2, refineSample = 4)

  test("a batch near-dup finds its frozen-corpus partners in one cell") {
    val pairs = Similarity.semanticNearDupsAgainst(index, batch,
        "vec_id", "embedding", threshold = 0.999)
      .select("batch_id", "corpus_id").as[(Long, Long)].collect().toSet
    assert(pairs === Set((100L, 1L), (100L, 3L)))
  }

  test("empty cells keep their centroid row and serve probes safely") {
    // corpus only in cluster A -> with 2 centroids one cell may hold
    // everything; a batch vector nearest the sparse/empty cell must not
    // crash and yields no pairs
    val thin = Seq((1L, vA(0.0)), (3L, vA(0.002)))
      .toDF("vec_id", "embedding")
    val idx = Similarity.semanticCellIndex(thin, "vec_id", "embedding",
      nCentroids = 2, refineSample = 2)
    assert(idx.count() === 2, "one row per cell, empty cells included")
    val pairs = Similarity.semanticNearDupsAgainst(idx,
        Seq((200L, Seq(-5.0, 0.0, -5.0))).toDF("vec_id", "embedding"),
        "vec_id", "embedding", threshold = 0.5)
    assert(pairs.count() === 0)
  }

  test("per-cell members are capped at the maxCell smallest ids") {
    val many = (1L to 10L).map(i => (i, Seq(1.0, 2.0, 3.0)))
      .toDF("vec_id", "embedding")
    val idx = Similarity.semanticCellIndex(many, "vec_id", "embedding",
      nCentroids = 1, maxCell = 3, refineSample = 4)
    val pairs = Similarity.semanticNearDupsAgainst(idx,
        Seq((100L, Seq(1.0, 2.0, 3.0))).toDF("vec_id", "embedding"),
        "vec_id", "embedding", threshold = 0.5)
      .select("corpus_id").as[Long].collect().toSet
    assert(pairs === Set(1L, 2L, 3L), "only the 3 smallest corpus ids")
  }

  test("zero-norm vectors never pair (NaN-cosine guard, both sides)") {
    // a zero batch vector's cosine is 0/0 = NaN, which Spark compares
    // greater than any threshold — without the guard it would "match"
    // a whole cell. Zero corpus vectors likewise stay out of the index.
    val zc = corpus.union(Seq((9L, Seq(0.0, 0.0, 0.0)))
      .toDF("vec_id", "embedding"))
    val idx = Similarity.semanticCellIndex(zc, "vec_id", "embedding",
      nCentroids = 2, refineSample = 5)
    val zb = batch.union(Seq((102L, Seq(0.0, 0.0, 0.0)))
      .toDF("vec_id", "embedding"))
    val pairs = Similarity.semanticNearDupsAgainst(idx, zb,
        "vec_id", "embedding", threshold = 0.0)
      .select("batch_id", "corpus_id").as[(Long, Long)].collect().toSet
    assert(!pairs.exists(p => p._1 == 102L || p._2 == 9L),
      s"zero-norm vectors must never pair, got $pairs")
  }

  test("a truncated index (missing cells) is rejected, not mis-assigned") {
    val bad = index.filter(col("cell") =!= 0)
    val e = intercept[IllegalArgumentException] {
      Similarity.semanticNearDupsAgainst(bad, batch, "vec_id",
        "embedding", threshold = 0.5)
    }
    assert(e.getMessage.contains("contiguous"))
  }

  test("index merge: new docs probe-able, newest-wins, caps re-enforced") {
    val idx = index.localCheckpoint()
    // 1) merge a brand-new near-dup of cluster A: a later probe finds it
    val merged = Similarity.updateSemanticIndex(idx,
      Seq((50L, vA(0.003))).toDF("vec_id", "embedding"),
      "vec_id", "embedding").localCheckpoint()
    val afterAdd = Similarity.semanticNearDupsAgainst(merged,
        Seq((300L, vA(0.004))).toDF("vec_id", "embedding"),
        "vec_id", "embedding", threshold = 0.999)
      .select("corpus_id").as[Long].collect().toSet
    assert(afterAdd === Set(1L, 3L, 50L), s"got $afterAdd")
    assert(merged.count() === idx.count(), "empty cells preserved")
    // 2) newest-wins: re-embed corpus doc 3 into cluster B — it must
    // stop pairing with cluster A and start pairing in B
    val moved = Similarity.updateSemanticIndex(merged,
      Seq((3L, Seq(-10.0, 1.0005, -10.0))).toDF("vec_id", "embedding"),
      "vec_id", "embedding").localCheckpoint()
    val aSide = Similarity.semanticNearDupsAgainst(moved,
        Seq((301L, vA(0.005))).toDF("vec_id", "embedding"),
        "vec_id", "embedding", threshold = 0.999)
      .select("corpus_id").as[Long].collect().toSet
    val bSide = Similarity.semanticNearDupsAgainst(moved,
        Seq((302L, Seq(-10.0, 1.0002, -10.0))).toDF("vec_id", "embedding"),
        "vec_id", "embedding", threshold = 0.999)
      .select("corpus_id").as[Long].collect().toSet
    assert(aSide === Set(1L, 50L), s"stale copy of 3 must be gone: $aSide")
    assert(bSide.contains(3L), s"re-embedded 3 must pair in B: $bSide")
    // 3) caps re-enforced on merge: flood one cell past maxCell
    val tiny = Similarity.semanticCellIndex(
      Seq((5L, Seq(1.0, 2.0, 3.0)), (6L, Seq(1.0, 2.0, 3.0)))
        .toDF("vec_id", "embedding"),
      "vec_id", "embedding", nCentroids = 1, maxCell = 3, refineSample = 2)
    val flooded = Similarity.updateSemanticIndex(tiny,
      (1L to 10L).map(i => (i, Seq(1.0, 2.0, 3.0)))
        .toDF("vec_id", "embedding"),
      "vec_id", "embedding", maxCell = 3)
    val kept = flooded.select(explode(col("members")).as("m"))
      .select("m.id").as[Long].collect().toSet
    assert(kept === Set(1L, 2L, 3L), s"re-cap must keep 3 smallest: $kept")
  }

  test("merge collapses in-batch duplicate ids and keeps the cap") {
    // at-least-once delivery: the same id arrives twice in one batch.
    // Exactly one member row may survive, and flooding a maxCell=3 cell
    // with duplicated ids must still leave the 3 smallest UNIQUE ids.
    val tiny = Similarity.semanticCellIndex(
      Seq((5L, Seq(1.0, 2.0, 3.0))).toDF("vec_id", "embedding"),
      "vec_id", "embedding", nCentroids = 1, maxCell = 3, refineSample = 1)
    val dupFresh = ((1L to 4L) ++ (1L to 4L))
      .map(i => (i, Seq(1.0, 2.0, 3.0))).toDF("vec_id", "embedding")
    val merged = Similarity.updateSemanticIndex(tiny, dupFresh,
      "vec_id", "embedding", maxCell = 3)
    val kept = merged.select(explode(col("members")).as("m"))
      .select("m.id").as[Long].collect().toSeq
    assert(kept.sorted === Seq(1L, 2L, 3L),
      s"expected the 3 smallest unique ids exactly once, got $kept")
  }

  test("a doc re-embedded to a zero-norm vector is evicted, not kept stale") {
    val idx = index.localCheckpoint()
    val merged = Similarity.updateSemanticIndex(idx,
      Seq((3L, Seq(0.0, 0.0, 0.0))).toDF("vec_id", "embedding"),
      "vec_id", "embedding").localCheckpoint()
    val found = Similarity.semanticNearDupsAgainst(merged,
        Seq((303L, vA(0.004))).toDF("vec_id", "embedding"),
        "vec_id", "embedding", threshold = 0.999)
      .select("corpus_id").as[Long].collect().toSet
    assert(found === Set(1L),
      s"doc 3's stale vector must leave the index, got $found")
  }

  test("drift metric trips on a new mode and rebuild restores recall") {
    // A new mode C arrives that straddles the frozen A/B boundary:
    // c1/c2 are near-identical (cosine ≈ 0.9999997) yet their tiny ±x
    // perturbation assigns them to DIFFERENT frozen cells — the frozen
    // quantizer can never pair them, and no amount of merging fixes it.
    val c1 = Seq(0.01, 30.0, 0.0)
    val c2 = Seq(-0.01, 30.0, 0.0)
    val idx = index.localCheckpoint()
    // 1) the metric sees the mode: fresh C vectors land ~32 from every
    // stored centroid while the index's own members sit ~1e-3 from
    // theirs
    val drift = Similarity.semanticDrift(idx,
        Seq((200L, c1), (201L, c2)).toDF("vec_id", "embedding"),
        "vec_id", "embedding")
      .select("n_fresh", "fresh_mean_dist", "index_mean_dist",
        "drift_ratio")
      .as[(Long, Double, Double, Double)].collect().head
    assert(drift._1 === 2L)
    assert(drift._4 > 100, s"drift must trip on the new mode, got $drift")
    // 2) the cheap path really is blind: merge wave 1, probe wave 2 —
    // split cells, no pair
    val merged = Similarity.updateSemanticIndex(idx,
      Seq((200L, c1)).toDF("vec_id", "embedding"),
      "vec_id", "embedding").localCheckpoint()
    val before = Similarity.semanticNearDupsAgainst(merged,
      Seq((201L, c2)).toDF("vec_id", "embedding"),
      "vec_id", "embedding", threshold = 0.999)
    assert(before.count() === 0, "frozen cells split the new mode")
    // 3) rebuild with room for the mode: C gets its own centroid, the
    // same probe now finds the pair, and C-mode drift subsides
    val rebuilt = Similarity.rebuildSemanticIndex(idx,
      Seq((200L, c1)).toDF("vec_id", "embedding"),
      "vec_id", "embedding", nCentroids = 3, refineSample = 8)
      .localCheckpoint()
    val after = Similarity.semanticNearDupsAgainst(rebuilt,
        Seq((201L, c2)).toDF("vec_id", "embedding"),
        "vec_id", "embedding", threshold = 0.999)
      .select("batch_id", "corpus_id").as[(Long, Long)].collect().toSet
    assert(after === Set((201L, 200L)),
      s"rebuild must restore probe recall, got $after")
    val settled = Similarity.semanticDrift(rebuilt,
        Seq((201L, c2)).toDF("vec_id", "embedding"),
        "vec_id", "embedding")
      .select("fresh_mean_dist").as[Double].collect().head
    assert(settled < 0.1,
      s"C-mode data must sit near the rebuilt quantizer, got $settled")
  }

  test("rebuild keeps merge conflict semantics (newest-wins, dedup)") {
    val idx = index.localCheckpoint()
    // doc 3 re-embedded into cluster B within the rebuild batch, id 60
    // delivered twice — the rebuilt index must hold exactly one row per
    // id with the fresh vector winning
    val fresh = Seq(
      (3L, Seq(-10.0, 1.0005, -10.0)),
      (60L, vA(0.004)), (60L, vA(0.004)))
      .toDF("vec_id", "embedding")
    val rebuilt = Similarity.rebuildSemanticIndex(idx, fresh,
      "vec_id", "embedding", nCentroids = 2, refineSample = 8)
      .localCheckpoint()
    val members = rebuilt
      .select(explode(col("members")).as("m"))
      .select("m.id").as[Long].collect().toSeq
    assert(members.sorted === Seq(1L, 3L, 5L, 7L, 60L),
      s"one row per id, got $members")
    val bSide = Similarity.semanticNearDupsAgainst(rebuilt,
        Seq((302L, Seq(-10.0, 1.0002, -10.0))).toDF("vec_id", "embedding"),
        "vec_id", "embedding", threshold = 0.999)
      .select("corpus_id").as[Long].collect().toSet
    assert(bSide.contains(3L), s"re-embedded 3 must pair in B: $bSide")
  }

  test("streamed probe equals the batch probe, across micro-batches") {
    implicit val sc = spark.sqlContext
    val idx = index.persist()
    try {
      val want = Similarity.semanticNearDupsAgainst(idx, batch,
          "vec_id", "embedding", threshold = 0.999)
        .select("batch_id", "corpus_id").as[(Long, Long)].collect().toSet
      val input = MemoryStream[(Long, Seq[Double])]
      val q = Similarity.semanticNearDupsAgainst(idx,
          input.toDS().toDF("vec_id", "embedding"),
          "vec_id", "embedding", threshold = 0.999)
        .writeStream.format("memory").queryName("sem_inc_out")
        .outputMode("append").start()
      input.addData((100L, vA(0.001).toSeq))
      q.processAllAvailable()
      input.addData((101L, Seq(0.0, 50.0, 0.0)))
      q.processAllAvailable()
      q.stop()
      val got = spark.table("sem_inc_out")
        .select("batch_id", "corpus_id").as[(Long, Long)].collect().toSet
      assert(want === Set((100L, 1L), (100L, 3L)))
      assert(got === want, s"streamed $got vs batch $want")
    } finally idx.unpersist()
  }
}
