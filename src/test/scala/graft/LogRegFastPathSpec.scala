package graft

import graft.textstats.LogReg

/** The small-corpus single-task training replay (LogReg.trainLocal —
  * the GraphOps smallGraphEdges discipline applied to the fixed-point
  * GD loop): fast ≡ iterative BIT-EXACT, gating by the counted doc
  * bound, and the iterative path untouched above it.
  */
class LogRegFastPathSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")

  test("fast path trains bit-identical weights to the iterative loop") {
    val (wFast, mFast) = LogReg.train(docs, "doc_id", "text",
      iterations = 12)
    val (wIter, mIter) = LogReg.train(docs, "doc_id", "text",
      iterations = 12, smallCorpusDocs = 0L)
    assert(mFast == mIter, s"doc counts differ: $mFast vs $mIter")
    assert(wFast.toSeq == wIter.toSeq,
      s"weights differ: ${wFast.toSeq} vs ${wIter.toSeq}")
    // weights must be non-trivial (a degenerate all-zero model would
    // make the equality vacuous)
    assert(wFast.exists(_ != 0L), s"degenerate weights ${wFast.toSeq}")
  }

  test("scored output is row-identical across the two paths") {
    val fast = LogReg.trainAndScore(docs, "doc_id", "text")
      .collect().map(_.toSeq).toSet
    val iter = LogReg.trainAndScore(docs, "doc_id", "text",
        smallCorpusDocs = 0L)
      .collect().map(_.toSeq).toSet
    assert(fast == iter && fast.nonEmpty)
  }

  test("fast path is partitioning-invariant (order-free integer fold)") {
    val a = LogReg.train(docs.repartition(17), "doc_id", "text",
      iterations = 6)._1.toSeq
    val b = LogReg.train(docs.coalesce(1), "doc_id", "text",
      iterations = 6)._1.toSeq
    assert(a == b)
  }

  test("gating: above the bound the iterative path runs (same result)") {
    // smallCorpusDocs = 1 puts every real corpus above the bound —
    // this is the iterative path by construction; equality with the
    // default (fast) path re-pins the twin from the gating side
    val (wIter, _) = LogReg.train(docs.limit(50), "doc_id", "text",
      iterations = 4, smallCorpusDocs = 1L)
    val (wFast, _) = LogReg.train(docs.limit(50), "doc_id", "text",
      iterations = 4)
    assert(wIter.toSeq == wFast.toSeq)
  }
}
