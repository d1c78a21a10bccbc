package graft

import org.apache.spark.sql.functions._

import graft.sim.Projection

/** Johnson–Lindenstrauss sign projection (graft.sim.Projection). */
class JlProjectionSpec extends SparkTestBase {
  import spark.implicits._

  test("sign matrix is the xxhash64 parity and matches Spark's own hash") {
    val signs = Projection.jlSigns(dim = 8, outDim = 3)
    assert(signs.length == 3 && signs.forall(_.length == 8))
    // cross-check against the SQL function on a live frame
    val expect = spark.range(24)
      .select(col("id"), xxhash64(col("id")).as("h"))
      .collect().map(r => (r.getLong(0), (r.getLong(1) & 1L) == 0L)).toMap
    for (j <- 0 until 3; i <- 0 until 8)
      assert((signs(j)(i) == 1) == expect(j * 8L + i),
        s"sign($j,$i)")
  }

  test("kernel equals the HOF fold bit-for-bit on floats and doubles") {
    val signs = Projection.jlSigns(dim = 4, outDim = 2)
    val vecs = Seq(
      (1L, Seq(0.5f, -1.25f, 3.5f, 0.125f)),
      (2L, Seq(1e-8f, 2e8f, -3.25f, 0f))).toDF("id", "v")
    val got = vecs.select(col("id"),
        Projection.jlProject(col("v"), 4, 2).as("p"))
      .as[(Long, Seq[Double])].collect().toMap
    val ref = vecs.as[(Long, Seq[Float])].collect().toMap.map {
      case (id, v) =>
        id -> (0 until 2).map { j =>
          var acc = 0.0
          for (i <- 0 until 4)
            acc += (if (signs(j)(i) > 0) v(i).toDouble else -v(i).toDouble)
          acc / math.sqrt(2.0)
        }
    }
    got.foreach { case (id, p) =>
      p.zip(ref(id)).foreach { case (a, b) => assert(a == b) }
    }
  }

  test("null element or wrong length yields a null projection") {
    val df = Seq(
      (1L, Seq[java.lang.Double](1.0, 2.0, 3.0, 4.0)),
      (2L, Seq[java.lang.Double](1.0, null, 3.0, 4.0)),
      (3L, Seq[java.lang.Double](1.0, 2.0))).toDF("id", "v")
    val got = df.select(col("id"),
        Projection.jlProject(col("v"), 4, 2).as("p"))
      .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(got == Map(1L -> false, 2L -> true, 3L -> true))
  }

  test("pairwise cosines survive within JL tolerance at 64 -> 16") {
    val emb = graft.sources.Sources.readTable(spark, sf001, "embeddings")
    val proj = emb.select(col("vec_id"),
      Projection.jlProject(col("embedding"), 64, 16).as("p"))
    def cosines(df: org.apache.spark.sql.DataFrame, c: String)
        : Map[(Long, Long), Double] = {
      val a = df.limit(40).collect()
        .map(r => (r.getLong(0), r.getSeq[Any](1).map {
          case f: Float => f.toDouble
          case d: Double => d
        }.toArray))
      (for {
        (i, vi) <- a; (j, vj) <- a if i < j
        ni = math.sqrt(vi.map(x => x * x).sum)
        nj = math.sqrt(vj.map(x => x * x).sum)
        if ni > 0 && nj > 0
      } yield (i, j) ->
        vi.zip(vj).map(p => p._1 * p._2).sum / (ni * nj)).toMap
    }
    val before = cosines(emb.orderBy("vec_id"), "embedding")
    val after = cosines(proj.orderBy("vec_id"), "p")
    def meanDrift(a: Map[(Long, Long), Double]): Double = {
      val d = before.keys.map(k => math.abs(before(k) - a(k)))
      d.sum / d.size
    }
    // single pairs can stray (JL is a high-probability bound), so pin
    // the MEAN drift — a wrong sign matrix or broken fold blows it up —
    // and the concentration direction: more output dims, less drift
    val m16 = meanDrift(after)
    assert(m16 < 0.25, s"mean drift at k=16: $m16")
    val proj32 = emb.select(col("vec_id"),
      Projection.jlProject(col("embedding"), 64, 32).as("p"))
    val m32 = meanDrift(cosines(proj32.orderBy("vec_id"), "p"))
    assert(m32 < m16, s"k=32 drift $m32 !< k=16 drift $m16")
  }

  test("projection is repartition-invariant to the bit") {
    val emb = graft.sources.Sources.readTable(spark, sf001, "embeddings")
    val one = Projection.jlProjectTable(emb, "vec_id", "embedding", 64, 16)
      .as[(Long, Long, Double)].collect().toSet
    val many = Projection
      .jlProjectTable(emb.repartition(11), "vec_id", "embedding", 64, 16)
      .as[(Long, Long, Double)].collect().toSet
    assert(one == many)
  }

  test("jlTopK with corpus-covering overFetch equals brute force exactly") {
    val emb = graft.sources.Sources.readTable(spark, sf001, "embeddings")
      .withColumn("embedding", col("embedding").cast("array<double>"))
    val q = emb.filter(col("vec_id") < 5)
    val brute = graft.sim.Similarity.bruteForceTopK(emb, "vec_id",
        "embedding", q, "vec_id", "embedding", k = 5)
      .as[(Long, Long, Double, Int)].collect().toSet
    // overFetch 200 × k 5 = 1000 candidates > the 500-row corpus: the
    // coarse pass keeps everything, so the exact rerank IS brute force
    val full = graft.sim.Projection.jlTopK(emb, "vec_id", "embedding",
        q, "vec_id", "embedding", k = 5, dim = 64, projDim = 16,
        overFetch = 200)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(full == brute)
  }

  test("jlTopK recall floor in the loose regime; exact in the design " +
      "regime (planted near-dups)") {
    // LOOSE regime: this corpus's neighbor cosines are nearly uniform
    // (max natural pair ~0.55 — the SemDeDup framing), the hardest case
    // for any projection. Measured grid (sf0.01, 46 queries):
    // 16/m4 0.257, 16/m16 0.626, 32/m8 0.600, 32/m16 0.748.
    val emb = graft.sources.Sources.readTable(spark, sf001, "embeddings")
      .withColumn("embedding", col("embedding").cast("array<double>"))
    val q = emb.filter(col("vec_id") % 11 === 0)
    val truth = graft.sim.Similarity.bruteForceTopK(emb, "vec_id",
        "embedding", q, "vec_id", "embedding", k = 5)
      .select("query_id", "vec_id")
      .as[(Long, Long)].collect().groupBy(_._1).view
      .mapValues(_.map(_._2).toSet).toMap
    val got = graft.sim.Projection.jlTopK(emb, "vec_id", "embedding",
        q, "vec_id", "embedding", k = 5, dim = 64, projDim = 32,
        overFetch = 8)
      .select("query_id", "vec_id")
      .as[(Long, Long)].collect().groupBy(_._1).view
      .mapValues(_.map(_._2).toSet).toMap
    val recalls = truth.map { case (qid, t) =>
      got.getOrElse(qid, Set.empty).intersect(t).size.toDouble / t.size
    }
    val mean = recalls.sum / recalls.size
    info(f"JLRECALL@5 64->32 m=8: $mean%.3f over ${recalls.size} queries")
    assert(mean >= 0.5, f"mean recall $mean%.3f below floor")

    // DESIGN regime: a planted near-identical vector (the dedup use
    // case) survives even an aggressive 64->16, m=2 setting at rank 1
    val base = emb.limit(1).as[(Long, Seq[Double], Int)].collect().head
    val planted = (Seq((9999L, base._2.map(_ * 1.0001), 0)) ++
      emb.as[(Long, Seq[Double], Int)].collect())
      .toDF("vec_id", "embedding", "label")
    val probe = planted.filter(col("vec_id") === 9999L)
    val top1 = graft.sim.Projection.jlTopK(planted, "vec_id", "embedding",
        probe, "vec_id", "embedding", k = 1, dim = 64, projDim = 16,
        overFetch = 2)
      .as[(Long, Long, Double, Int)].collect().head
    assert(top1._2 == base._1 && top1._3 > 0.999)
  }

  test("parameter guards") {
    val df = Seq((1L, Seq(1.0f))).toDF("id", "v")
    intercept[IllegalArgumentException](
      Projection.jlProject(col("v"), 0, 1))
    intercept[IllegalArgumentException](
      Projection.jlProject(col("v"), 4, 5))
    intercept[IllegalArgumentException](
      Projection.jlTopK(df, "id", "v", df, "id", "v", k = 0, dim = 1))
  }
}
