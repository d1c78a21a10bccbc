package graft

import org.apache.spark.sql.functions._

import graft.sim.Similarity

/** Measures ANN recall@5 against the exact brute-force answer at any
  * scale factor — the per-round evidence tool behind the COVERAGE.md
  * recall numbers (SimilarityRecallSpec pins floors at sf0.01; this
  * prints the measured values, e.g. at sf0.1 where the corpus is 10x).
  *
  *   sbt "Test/runMain graft.RecallProbe /root/testdata/sf0.1 48"
  *
  * Optional args 3-4 probe IVF refinement settings:
  *   sbt "Test/runMain graft.RecallProbe /root/testdata/sf0.01 48 512 2"
  * (refineSample=512, lloydIters=2; defaults 256 and 2 — the driver
  * query's parameters).
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val nQueries = if (args.length > 1) args(1).toInt else 48
    val refineSample = if (args.length > 2) args(2).toInt else 256
    val lloydIters = if (args.length > 3) args(3).toInt else 2
    val nCentroids = if (args.length > 4) args(4).toInt else 16
    val nProbe = if (args.length > 5) args(5).toInt else 8
    val spark = LocalSessions.builder(8, 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .withColumn("embedding", col("embedding").cast("array<double>"))
    val queries = emb.filter(col("vec_id") < nQueries)
    val k = 5
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
      queries, "vec_id", "embedding", k).select("query_id", "vec_id").cache()
    val denom = exact.count().toDouble
    def recall(approx: org.apache.spark.sql.DataFrame): Double =
      approx.select("query_id", "vec_id").intersect(exact).count() / denom
    val lsh = recall(Similarity.lshTopK(emb, "vec_id", "embedding",
      queries, "vec_id", "embedding", k, planes = 4, tables = 16))
    val ivf = recall(Similarity.ivfTopK(emb, "vec_id", "embedding",
      queries, "vec_id", "embedding", k, nCentroids = nCentroids,
      nProbe = nProbe,
      refineSample = refineSample, lloydIters = lloydIters))
    val ivfAdaptive = recall(Similarity.ivfTopK(emb, "vec_id", "embedding",
      queries, "vec_id", "embedding", k, nCentroids = nCentroids,
      nProbe = nProbe, refineSample = refineSample, lloydIters = lloydIters,
      extraProbes = 4, boundaryRho = 1.05))
    // the full-corpus distributed Lloyd quantizer feeding the IVF probe
    val kmModel = graft.sim.KMeans.kmeansCentroids(emb, "vec_id",
      "embedding", dim = 64, k = nCentroids, iterations = 4)
    val kmCs = graft.sim.KMeans.centroidsArray(kmModel, dim = 64)
    val ivfKMeans = recall(Similarity.ivfTopKWithCentroids(emb, "vec_id",
      "embedding", queries, "vec_id", "embedding", k, kmCs,
      nProbe = nProbe, extraProbes = 4, boundaryRho = 1.05))
    // spread seeds + full-corpus refinement: the sample quantizer's
    // farthest-point centroids refined by distributed Lloyd rounds
    val seedCs = Similarity.ivfCentroids(emb, "vec_id", "embedding",
      nCentroids, refineSample, lloydIters)
    val refined = graft.sim.KMeans.centroidsArray(
      graft.sim.KMeans.kmeansRefine(emb, "embedding", dim = 64,
        seedCs, iterations = 2), dim = 64)
    val ivfRefined = recall(Similarity.ivfTopKWithCentroids(emb,
      "vec_id", "embedding", queries, "vec_id", "embedding", k,
      refined, nProbe = nProbe, extraProbes = 4, boundaryRho = 1.05))
    // the two PQ compositions at the identical candidate budget:
    // raw-vector codes vs TRUE residual (IVFADC) codes
    val ivfPq = recall(graft.sim.Pq.ivfPqTopK(emb, "vec_id",
      "embedding", queries, "vec_id", "embedding", k, dim = 64,
      nCentroids = nCentroids, nProbe = nProbe, m = 8, kPerSub = 16,
      overFetch = 8, refineSample = refineSample,
      lloydIters = lloydIters, extraProbes = 4))
    val ivfAdc = recall(graft.sim.Pq.ivfAdcTopK(emb, "vec_id",
      "embedding", queries, "vec_id", "embedding", k, dim = 64,
      nCentroids = nCentroids, nProbe = nProbe, m = 8, kPerSub = 16,
      overFetch = 8, refineSample = refineSample,
      lloydIters = lloydIters, extraProbes = 4))
    // the round-16 GATE parameters (kPerSub=64, overFetch=16): the
    // same ≤16 B/row (cell, codes) layout with a finer code book and
    // a wider exact-rerank candidate set
    val ivfAdcGate = recall(graft.sim.Pq.ivfAdcTopK(emb, "vec_id",
      "embedding", queries, "vec_id", "embedding", k, dim = 64,
      nCentroids = nCentroids, nProbe = nProbe, m = 8, kPerSub = 64,
      overFetch = 16, refineSample = refineSample,
      lloydIters = lloydIters, extraProbes = 4))
    println(f"RECALL sf=$dir queries=$nQueries lsh(4,16)=$lsh%.3f " +
      f"ivf($nCentroids,$nProbe,s=$refineSample,it=$lloydIters)=$ivf%.3f " +
      f"ivf_adaptive(+4@1.05)=$ivfAdaptive%.3f " +
      f"ivf_kmeans_full(k=$nCentroids,it=4,+4@1.05)=$ivfKMeans%.3f " +
      f"ivf_kmeans_refined(seeded,it=2,+4@1.05)=$ivfRefined%.3f " +
      f"ivfpq_raw(8x16,of=8)=$ivfPq%.3f ivfadc_residual=$ivfAdc%.3f " +
      f"ivfadc_gate(8x64,of=16)=$ivfAdcGate%.3f")
    // the second IVF quality axis: how much of the corpus does an
    // nProbe-cell probe actually scan? Skewed cells can fake recall by
    // funneling most of the corpus into the probed cells — report the
    // scanned fraction and the largest-cell share alongside recall.
    for ((label, rs, it) <- Seq(("unrefined", 16, 0),
        ("refined", refineSample, lloydIters))) {
      val cents = Similarity.ivfCentroids(emb, "vec_id", "embedding",
        nCentroids = 16, refineSample = rs, lloydIters = it)
      val centSeq: Seq[Seq[Double]] = cents.toSeq.map(_.toSeq)
      val cellSizes = emb.select(graft.functions.VectorFunctions
          .nearestCells(col("embedding"), centSeq, 1).getItem(0).as("cell"))
        .groupBy("cell").count()
      val probed = queries.select(col("vec_id").as("query_id"),
        explode(graft.functions.VectorFunctions
          .nearestCells(col("embedding"), centSeq, 8)).as("cell"))
      val n = emb.count().toDouble
      val scanned = probed.join(cellSizes, "cell")
        .groupBy("query_id").agg(sum("count").as("scanned"))
        .agg(avg(col("scanned") / n)).collect()(0).getDouble(0)
      val maxShare = cellSizes.agg(max("count")).collect()(0).getLong(0) / n
      println(f"IVFCELLS $label sf=$dir scanned_frac=$scanned%.3f " +
        f"max_cell_share=$maxShare%.3f")
    }
    // Near-dup PAIR recall: of all true pairs (exact cosine >= thr over
    // every unordered pair), what fraction does each bucketed candidate
    // generator surface? This is the dedup-side quality axis — top-k
    // recall above measures the search side.
    val thr = 0.3
    val v = emb.select(col("vec_id"), col("embedding"),
      Similarity.norm(col("embedding")).as("nm"))
    val truth = v.toDF("ia", "va", "na")
      .join(v.toDF("ib", "vb", "nb"), col("ia") < col("ib"))
      .filter(Similarity.dot(col("va"), col("vb")) /
        (col("na") * col("nb")) >= thr)
      .select(col("ia").as("id_a"), col("ib").as("id_b")).cache()
    val nTruth = truth.count().toDouble
    def pairRecall(found: org.apache.spark.sql.DataFrame): Double =
      found.select("id_a", "id_b").intersect(truth).count() / nTruth
    val lshPairs = pairRecall(graft.dedup.Dedup.embeddingNearDups(
      emb, "vec_id", "embedding", threshold = thr, planes = 4))
    val semPairs = pairRecall(Similarity.semanticNearDups(
      emb, "vec_id", "embedding", threshold = thr, nCentroids = 16))
    println(f"PAIRRECALL sf=$dir thr=$thr true_pairs=${nTruth.toLong} " +
      f"lsh(4)=$lshPairs%.3f semantic(16)=$semPairs%.3f")
    spark.stop()
  }
}
