package graft

import org.apache.spark.sql.functions._

import graft.sim.Pq

/** Product quantization (graft.sim.Pq). */
class PqSpec extends SparkTestBase {
  import spark.implicits._

  private def emb = graft.sources.Sources
    .readTable(spark, sf001, "embeddings")
    .withColumn("embedding", col("embedding").cast("array<double>"))

  test("codebooks: shapes, per-subspace training on the shared " +
      "sample, guards") {
    val cbs = Pq.pqCodebooks(emb, "vec_id", "embedding", dim = 64,
      m = 8, kPerSub = 16)
    assert(cbs.length == 8)
    assert(cbs.forall(_.length == 16))
    assert(cbs.forall(_.forall(_.length == 8)))
    // subspace j's codebook must equal training the slice directly:
    // slicing commutes with the shared sample selection
    val sliced = emb.select(col("vec_id"),
      slice(col("embedding"), 25, 8).as("embedding"))
    val direct = Pq.pqCodebooks(sliced, "vec_id", "embedding", dim = 8,
      m = 1, kPerSub = 16)
    assert(cbs(3).map(_.toSeq).toSeq == direct(0).map(_.toSeq).toSeq)
    intercept[IllegalArgumentException](
      Pq.pqCodebooks(emb, "vec_id", "embedding", 64, 7, 16))
    intercept[IllegalArgumentException](
      Pq.pqCodebooks(emb, "vec_id", "embedding", 64, 8, 0))
    intercept[IllegalArgumentException](
      Pq.pqCodebooks(emb, "vec_id", "embedding", 64, 8, 16,
        refineSample = 8))
  }

  test("encode is deterministic under repartitioning and each code " +
      "is the argmin centroid of its slice") {
    val cbs = Pq.pqCodebooks(emb, "vec_id", "embedding", 64, 8, 16)
    val a = Pq.pqEncode(emb, "vec_id", "embedding", cbs)
      .as[(Long, Seq[Int])].collect().toMap
    val b = Pq.pqEncode(emb.repartition(13), "vec_id", "embedding", cbs)
      .as[(Long, Seq[Int])].collect().toMap
    assert(a == b)
    // JVM replay of the argmin (strict <, ties to the lowest code)
    val vecs = emb.as[(Long, Seq[Double], Int)].collect()
      .map(r => r._1 -> r._2.toArray).toMap
    def l2(v: Array[Double], c: Array[Double]): Double = {
      var s = 0.0
      for (i <- v.indices) { val d = v(i) - c(i); s += d * d }
      s
    }
    for ((id, v) <- vecs.take(50)) {
      val codes = a(id)
      for (j <- 0 until 8) {
        val sl = v.slice(j * 8, j * 8 + 8)
        val ds = cbs(j).map(c => l2(sl, c))
        val best = ds.indices.minBy(i => (ds(i), i))
        assert(codes(j) == best, s"id $id subspace $j")
      }
    }
  }

  test("adcCosine equals the JVM cosine against the reconstruction") {
    val cbs = Pq.pqCodebooks(emb, "vec_id", "embedding", 64, 8, 16)
    val codes = Pq.pqEncode(emb, "vec_id", "embedding", cbs)
    val q = emb.filter(col("vec_id") === 3L)
      .select(col("embedding")).as[Seq[Double]].head().toArray
    val got = codes
      .withColumn("adc", Pq.adcCosine(
        typedLit(q.toSeq), col("codes"), cbs))
      .as[(Long, Seq[Int], Double)].collect()
      .map(r => r._1 -> r._3).toMap
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; for (i <- a.indices) s += a(i) * b(i); s
    }
    val qn = math.sqrt(dot(q, q))
    val codesMap = codes.as[(Long, Seq[Int])].collect().toMap
    for (id <- got.keys.take(50)) {
      val cs = codesMap(id)
      val recon = (0 until 8).flatMap(j => cbs(j)(cs(j))).toArray
      val expect = dot(q, recon) / (qn * math.sqrt(dot(recon, recon)))
      assert(math.abs(got(id) - expect) < 1e-12, s"id $id")
    }
  }

  test("pqTopK with corpus-covering overFetch equals brute force " +
      "exactly (the rerank is exact)") {
    val q = emb.filter(col("vec_id") < 5)
    val brute = graft.sim.Similarity.bruteForceTopK(emb, "vec_id",
        "embedding", q, "vec_id", "embedding", k = 5)
      .as[(Long, Long, Double, Int)].collect().toSet
    val full = Pq.pqTopK(emb, "vec_id", "embedding", q, "vec_id",
        "embedding", k = 5, dim = 64, overFetch = 200)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(full == brute)
  }

  test("pqTopK recall floor in the loose regime; planted near-dup " +
      "survives at rank 1") {
    val q = emb.filter(col("vec_id") % 11 === 0)
    val truth = graft.sim.Similarity.bruteForceTopK(emb, "vec_id",
        "embedding", q, "vec_id", "embedding", k = 5)
      .select("query_id", "vec_id")
      .as[(Long, Long)].collect().groupBy(_._1).view
      .mapValues(_.map(_._2).toSet).toMap
    val got = Pq.pqTopK(emb, "vec_id", "embedding", q, "vec_id",
        "embedding", k = 5, dim = 64, overFetch = 8)
      .select("query_id", "vec_id")
      .as[(Long, Long)].collect().groupBy(_._1).view
      .mapValues(_.map(_._2).toSet).toMap
    val recalls = truth.map { case (qid, t) =>
      got.getOrElse(qid, Set.empty).intersect(t).size.toDouble / t.size
    }
    val mean = recalls.sum / recalls.size
    info(f"PQRECALL@5 8x16 overFetch=8: $mean%.3f over " +
      f"${recalls.size} queries")
    assert(mean >= 0.5, f"mean recall $mean%.3f below floor")

    val base = emb.limit(1).as[(Long, Seq[Double], Int)].collect().head
    val planted = (Seq((9999L, base._2.map(_ * 1.0001), 0)) ++
      emb.as[(Long, Seq[Double], Int)].collect())
      .toDF("vec_id", "embedding", "label")
    val probe = planted.filter(col("vec_id") === 9999L)
    val top1 = Pq.pqTopK(planted, "vec_id", "embedding", probe,
        "vec_id", "embedding", k = 1, dim = 64, overFetch = 2)
      .as[(Long, Long, Double, Int)].collect().head
    assert(top1._2 == base._1 && top1._3 > 0.999)
  }
}
