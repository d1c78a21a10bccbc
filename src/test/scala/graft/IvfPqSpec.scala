package graft

import org.apache.spark.sql.functions._

import graft.sim.{Pq, Similarity}

/** The composed IVF-PQ retriever (graft.sim.Pq.ivfPqTopK): recall
  * pinned against the PQ-only retriever at EQUAL candidate budget, the
  * exact-rerank contract, self-exclusion, and the (cell, codes)-only
  * coarse-pass plan shape.
  */
class IvfPqSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")
    .withColumn("embedding", col("embedding").cast("array<double>"))
  private val K = 5

  private def recallOf(res: org.apache.spark.sql.DataFrame,
      truth: Set[(Long, Long)]): Double = {
    val got = res.select("query_id", "vec_id").as[(Long, Long)]
      .collect().toSet
    got.intersect(truth).size.toDouble / truth.size.toDouble
  }

  test("recall@5 >= the PQ-only retriever at equal candidate budget") {
    val q = emb.filter(col("vec_id") < 16)
    val truth = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
        q, "vec_id", "embedding", K)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val pqOnly = Pq.pqTopK(emb, "vec_id", "embedding", q, "vec_id",
      "embedding", k = K, dim = 64, m = 8, kPerSub = 16, overFetch = 8)
    val ivfPq = Pq.ivfPqTopK(emb, "vec_id", "embedding", q, "vec_id",
      "embedding", k = K, dim = 64, nCentroids = 16, nProbe = 8,
      m = 8, kPerSub = 16, overFetch = 8, extraProbes = 4)
    val rPq = recallOf(pqOnly, truth)
    val rIvfPq = recallOf(ivfPq, truth)
    assert(rIvfPq >= rPq,
      s"composed recall $rIvfPq fell below PQ-only $rPq at the same " +
        s"k*overFetch candidate budget")
    assert(rIvfPq > 0.5, s"composed recall $rIvfPq degenerate")
  }

  test("reranked scores are the exact cosine (bit-equal to brute force " +
      "on shared hits)") {
    val q = emb.filter(col("vec_id") < 8)
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
        q, "vec_id", "embedding", 50)
      .select("query_id", "vec_id", "cosine")
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val got = Pq.ivfPqTopK(emb, "vec_id", "embedding", q, "vec_id",
        "embedding", k = K, dim = 64, nCentroids = 16, nProbe = 8,
        extraProbes = 4)
      .as[(Long, Long, Double, Int)].collect()
    assert(got.nonEmpty)
    got.foreach { case (qid, vid, cos, _) =>
      exact.get((qid, vid)).foreach { e =>
        assert(cos == e, s"($qid, $vid): reranked $cos != exact $e")
      }
    }
    // self never appears (excludeSelf default)
    assert(!got.exists(r => r._1 == r._2))
  }

  test("coarse pass reads (cell, codes) only; rankings stay k-heaps") {
    val q = emb.filter(col("vec_id") < 8)
    val plan = Pq.ivfPqTopK(emb, "vec_id", "embedding", q, "vec_id",
        "embedding", k = K, dim = 64, nCentroids = 16, nProbe = 8,
        extraProbes = 4)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_topkagg"),
      s"both rankings must be the bounded k-heap:\n$plan")
    assert(!plan.contains("row_number"),
      s"ranking must not shuffle every scored candidate:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"the probe join must stay an equi-join on cell:\n$plan")
    // the coarse side's ADC reads codes + codebook literals: the raw
    // vector column must not survive past the index projection into
    // the probe join (the rerank reads vectors for candidates only,
    // behind the broadcast)
    val coarseJoin = plan.split("\n")
      .filter(l => l.contains("BroadcastHashJoin") &&
        l.contains("__cell"))
    assert(coarseJoin.nonEmpty, s"no cell equi-join found:\n$plan")
  }

  test("IVFADC residual encoding: recall@5 >= the raw-vector " +
      "composition at equal candidate budget") {
    val q = emb.filter(col("vec_id") < 16)
    val truth = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
        q, "vec_id", "embedding", K)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val raw = Pq.ivfPqTopK(emb, "vec_id", "embedding", q, "vec_id",
      "embedding", k = K, dim = 64, nCentroids = 16, nProbe = 8,
      m = 8, kPerSub = 16, overFetch = 8, extraProbes = 4)
    val adc = Pq.ivfAdcTopK(emb, "vec_id", "embedding", q, "vec_id",
      "embedding", k = K, dim = 64, nCentroids = 16, nProbe = 8,
      m = 8, kPerSub = 16, overFetch = 8, extraProbes = 4)
    val rRaw = recallOf(raw, truth)
    val rAdc = recallOf(adc, truth)
    assert(rAdc >= rRaw,
      s"residual-encoding recall $rAdc fell below raw-encoding $rRaw " +
        s"at the same k*overFetch candidate budget")
    assert(rAdc > 0.5, s"residual recall $rAdc degenerate")
  }

  test("IVFADC coarse pass reads (cell, codes) only; rankings stay " +
      "k-heaps; reranked scores exact") {
    val q = emb.filter(col("vec_id") < 8)
    val res = Pq.ivfAdcTopK(emb, "vec_id", "embedding", q, "vec_id",
      "embedding", k = K, dim = 64, nCentroids = 16, nProbe = 8,
      extraProbes = 4)
    val plan = res.queryExecution.executedPlan.toString
    assert(plan.contains("partial_topkagg"),
      s"both rankings must be the bounded k-heap:\n$plan")
    assert(!plan.contains("row_number"),
      s"ranking must not shuffle every scored candidate:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"the probe join must stay an equi-join on cell:\n$plan")
    val coarseJoin = plan.split("\n")
      .filter(l => l.contains("BroadcastHashJoin") &&
        l.contains("__cell"))
    assert(coarseJoin.nonEmpty, s"no cell equi-join found:\n$plan")
    // reranked scores are the exact cosine, self excluded
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
        q, "vec_id", "embedding", 50)
      .select("query_id", "vec_id", "cosine")
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val got = res.as[(Long, Long, Double, Int)].collect()
    assert(got.nonEmpty)
    got.foreach { case (qid, vid, cos, _) =>
      exact.get((qid, vid)).foreach { e =>
        assert(cos == e, s"($qid, $vid): reranked $cos != exact $e")
      }
    }
    assert(!got.exists(r => r._1 == r._2))
  }

  test("parameter validation fails loudly") {
    val q = emb.filter(col("vec_id") < 2)
    intercept[IllegalArgumentException] {
      Pq.ivfPqTopK(emb, "vec_id", "embedding", q, "vec_id", "embedding",
        k = 0, dim = 64)
    }
    intercept[IllegalArgumentException] {
      Pq.ivfPqTopK(emb, "vec_id", "embedding", q, "vec_id", "embedding",
        k = 5, dim = 64, overFetch = 0)
    }
    intercept[IllegalArgumentException] {
      Pq.ivfPqTopK(emb, "vec_id", "embedding", q, "vec_id", "embedding",
        k = 5, dim = 64, nProbe = 0)
    }
  }
}
