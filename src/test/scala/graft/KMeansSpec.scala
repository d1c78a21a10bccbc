package graft

import org.apache.spark.sql.functions._

import graft.sim.KMeans

/** Distributed Lloyd k-means: parity with a literal reference model
  * (same seeding, folds, fixed-point updates), planted-cluster
  * recovery, centroid/assignment consistency, empty-cluster
  * carryover, bit-stable partition invariance, and the loud guards.
  */
class KMeansSpec extends SparkTestBase {
  import spark.implicits._

  /** In-memory reference of the exact operator semantics. */
  private def refKMeans(rows: Seq[(Long, Seq[Double])], dim: Int,
      k: Int, iters: Int, scale: Double)
      : (Array[Array[Double]], Array[Long], Map[Long, Int]) = {
    def h(id: Long): Long =
      org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
        id, org.apache.spark.sql.types.LongType, 42L)
    var cs = rows.sortBy(r => (h(r._1), r._1)).take(k)
      .map(_._2.toArray).toArray
    val ns = Array.fill(k)(0L)
    def assign(v: Seq[Double]): Int = {
      val d = cs.map(c => (0 until dim)
        .foldLeft(0.0)((acc, j) => acc + (v(j) - c(j)) * (v(j) - c(j))))
      d.indexOf(d.min)
    }
    for (_ <- 1 to iters) {
      val byC = rows.groupBy(r => assign(r._2))
      java.util.Arrays.fill(ns, 0L)
      val next = cs.map(_.clone())
      byC.foreach { case (c, rs) =>
        ns(c) = rs.size.toLong
        (0 until dim).foreach { j =>
          val q = rs.map(r => math.round(r._2(j) * scale)).sum
          next(c)(j) = q.toDouble / scale / rs.size
        }
      }
      cs = next
    }
    (cs, ns, rows.map(r => r._1 -> assign(r._2)).toMap)
  }

  private val data: Seq[(Long, Seq[Double])] = (0L until 40L).map { i =>
    // two planted clusters around (0,0,0,0) and (10,10,10,10) plus a
    // deterministic per-row wobble
    val base = if (i % 2 == 0) 0.0 else 10.0
    (i, Seq.tabulate(4)(j => base + ((i * 7 + j * 3) % 11) * 0.01))
  }

  test("kmeansCentroids matches the reference model bit-for-bit") {
    val df = data.toDF("id", "v")
    val got = KMeans.kmeansCentroids(df, "id", "v", dim = 4, k = 3,
        iterations = 3)
      .orderBy("cluster", "dim_idx")
      .as[(Long, Long, Double, Long)].collect().toSeq
    val (cs, ns, _) = refKMeans(data, 4, 3, 3, 1e10)
    val exp = for (c <- 0 until 3; j <- 0 until 4)
      yield (c.toLong, j.toLong, cs(c)(j), ns(c))
    assert(got == exp)
  }

  test("kmeansAssign agrees with the reference and recovers the planted clusters") {
    val df = data.toDF("id", "v")
    val got = KMeans.kmeansAssign(df, "id", "v", dim = 4, k = 2,
        iterations = 4)
      .as[(Long, Long)].collect().toMap
    val (_, _, exp) = refKMeans(data, 4, 2, 4, 1e10)
    assert(got == exp.map { case (k2, v) => (k2, v.toLong) })
    // planted structure: all even ids share one cluster, odd the other
    val evens = data.map(_._1).filter(_ % 2 == 0).map(got)
    val odds = data.map(_._1).filter(_ % 2 == 1).map(got)
    assert(evens.distinct.size == 1 && odds.distinct.size == 1 &&
      evens.head != odds.head)
  }

  test("results are bit-identical on any partitioning") {
    val a = KMeans.kmeansCentroids(data.toDF("id", "v"), "id", "v",
      dim = 4, k = 3, iterations = 3).orderBy("cluster", "dim_idx")
      .as[(Long, Long, Double, Long)].collect().toSeq
    val b = KMeans.kmeansCentroids(
        data.toDF("id", "v").repartition(7, col("id")), "id", "v",
        dim = 4, k = 3, iterations = 3).orderBy("cluster", "dim_idx")
      .as[(Long, Long, Double, Long)].collect().toSeq
    assert(a == b)
  }

  test("an empty cluster keeps its previous centroid with n = 0") {
    // only two distinct vectors but k = 3: by pigeonhole two seeds are
    // identical, the higher-indexed duplicate loses every tie (the
    // first-of-min tie-break) and must carry its seed vector with n=0
    val tight = Seq(
      (1L, Seq(0.0, 0.0)), (2L, Seq(0.0, 0.0)), (3L, Seq(0.0, 0.0)),
      (4L, Seq(10.0, 10.0)), (5L, Seq(10.0, 10.0)),
      (6L, Seq(10.0, 10.0)))
    val got = KMeans.kmeansCentroids(tight.toDF("id", "v"), "id", "v",
        dim = 2, k = 3, iterations = 2)
      .orderBy("cluster", "dim_idx")
      .as[(Long, Long, Double, Long)].collect().toSeq
    val (cs, ns, _) = refKMeans(tight, 2, 3, 2, 1e10)
    val exp = for (c <- 0 until 3; j <- 0 until 2)
      yield (c.toLong, j.toLong, cs(c)(j), ns(c))
    assert(got == exp)
    assert(ns.contains(0L), s"expected an empty cluster, got ${ns.toSeq}")
  }

  test("property: random corpora match the reference model bit-for-bit " +
      "under random partitionings") {
    val rnd = new scala.util.Random(1137)
    for (trial <- 1 to 5) {
      val dim = 2 + rnd.nextInt(4)
      val n = 8 + rnd.nextInt(30)
      val k = 2 + rnd.nextInt(3)
      val iters = 1 + rnd.nextInt(3)
      val rows = (0 until n).map { i =>
        (i.toLong + rnd.nextInt(5) * 1000L,
          Seq.fill(dim)(math.rint(rnd.nextGaussian() * 100) / 100))
      }.distinctBy(_._1)
      if (rows.length >= k) {
        val df = rows.toDF("id", "v").repartition(1 + rnd.nextInt(6))
        val got = KMeans.kmeansCentroids(df, "id", "v", dim, k, iters)
          .orderBy("cluster", "dim_idx")
          .as[(Long, Long, Double, Long)].collect().toSeq
        val (cs, ns, _) = refKMeans(rows, dim, k, iters, 1e10)
        val exp = for (c <- 0 until k; j <- 0 until dim)
          yield (c.toLong, j.toLong, cs(c)(j), ns(c))
        assert(got == exp, s"trial $trial: dim=$dim n=${rows.length} " +
          s"k=$k iters=$iters")
        val gotA = KMeans.kmeansAssign(df, "id", "v", dim, k, iters)
          .as[(Long, Long)].collect().toMap
        val (_, _, expA) = refKMeans(rows, dim, k, iters, 1e10)
        assert(gotA == expA.map { case (id, c) => (id, c.toLong) })
      }
    }
  }

  test("assignWithCentroids under a precomputed model equals the " +
      "trained kmeansAssign, including after a parquet round trip") {
    val df = data.toDF("id", "v")
    val trained = KMeans.kmeansAssign(df, "id", "v", dim = 4, k = 3,
      iterations = 3).as[(Long, Long)].collect().toMap
    val model = KMeans.kmeansCentroids(df, "id", "v", dim = 4, k = 3,
      iterations = 3)
    val reused = KMeans.assignWithCentroids(df, "id", "v", dim = 4,
      model).as[(Long, Long)].collect().toMap
    assert(reused == trained)
    // the persisted-model path (extra column n present, round-tripped)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_km_model").toString
    try {
      model.write.parquet(s"$dir/m")
      val fromDisk = KMeans.assignWithCentroids(df, "id", "v", dim = 4,
        spark.read.parquet(s"$dir/m")).as[(Long, Long)].collect().toMap
      assert(fromDisk == trained)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(dir))
    }
  }

  test("assignWithCentroids rejects ragged, gapped and empty models") {
    val df = data.toDF("id", "v")
    val empty = Seq.empty[(Long, Long, Double)]
      .toDF("cluster", "dim_idx", "coord")
    assert(intercept[IllegalArgumentException](
      KMeans.assignWithCentroids(df, "id", "v", dim = 4, empty))
      .getMessage.contains("empty"))
    // cluster 1 missing dim 3 => ragged
    val ragged = (for (c <- 0L until 2L; j <- 0L until 4L
        if !(c == 1L && j == 3L)) yield (c, j, 1.0))
      .toDF("cluster", "dim_idx", "coord")
    assert(intercept[IllegalArgumentException](
      KMeans.assignWithCentroids(df, "id", "v", dim = 4, ragged))
      .getMessage.contains("cells"))
    // clusters 0 and 2 but no 1 => right cell count is impossible, but
    // a duplicated cell could fake it — both guards must hold
    val gapped = (for (c <- Seq(0L, 2L); j <- 0L until 4L)
        yield (c, j, 1.0)) // 8 cells vs k*dim = 12
      .toDF("cluster", "dim_idx", "coord")
    intercept[IllegalArgumentException](
      KMeans.assignWithCentroids(df, "id", "v", dim = 4, gapped))
  }

  test("a null/NaN coord in a persisted model is rejected as corrupt, " +
      "not misreported as a gapped model") {
    val df = data.toDF("id", "v")
    val nanModel = (for (c <- 0L until 2L; j <- 0L until 4L)
        yield (c, j, if (c == 0L && j == 1L) Double.NaN else 1.0))
      .toDF("cluster", "dim_idx", "coord")
    val e = intercept[IllegalArgumentException](
      KMeans.assignWithCentroids(df, "id", "v", dim = 4, nanModel))
    assert(e.getMessage.contains("null/NaN coord"), e.getMessage)
    val nullModel = (for (c <- 0L until 2L; j <- 0L until 4L)
        yield (c, j, if (c == 1L && j == 0L) None else Some(1.0)))
      .toDF("cluster", "dim_idx", "coord")
    val e2 = intercept[IllegalArgumentException](
      KMeans.assignWithCentroids(df, "id", "v", dim = 4, nullModel))
    assert(e2.getMessage.contains("null/NaN coord"), e2.getMessage)
  }

  test("vectors with NaN elements are rejected loudly (the fixed-point " +
      "cast would silently zero the contribution)") {
    val bad = Seq((1L, Seq(1.0, Double.NaN, 3.0, 4.0)),
      (2L, Seq(1.0, 2.0, 3.0, 4.0))).toDF("id", "v")
    val e = intercept[Exception](
      KMeans.kmeansCentroids(bad, "id", "v", dim = 4, k = 1,
        iterations = 1).collect())
    val msg = e.getMessage +
      (if (e.getCause != null) e.getCause.getMessage else "")
    assert(msg.contains("non-NaN"), msg)
  }

  test("vectors with NULL elements are rejected loudly, not " +
      "silently skipped (the biased-centroid guard)") {
    val bad = Seq((1L, Seq[Option[Double]](Some(1.0), None, Some(3.0),
      Some(4.0))), (2L, Seq[Option[Double]](Some(1.0), Some(2.0),
      Some(3.0), Some(4.0)))).toDF("id", "v")
    val e = intercept[Exception](
      KMeans.kmeansCentroids(bad, "id", "v", dim = 4, k = 1,
        iterations = 1).collect())
    val msg = e.getMessage +
      (if (e.getCause != null) e.getCause.getMessage else "")
    assert(msg.contains("kmeans"))
  }

  test("guards: malformed vectors, too few rows, bad params") {
    val df = data.toDF("id", "v")
    val bad = Seq((1L, Seq(1.0))).toDF("id", "v")
    val e = intercept[Exception](
      KMeans.kmeansCentroids(bad, "id", "v", dim = 4, k = 1,
        iterations = 1).collect())
    assert(e.getMessage.contains("kmeans") ||
      e.getCause != null && e.getCause.getMessage.contains("kmeans"))
    val few = intercept[IllegalArgumentException](
      KMeans.kmeansCentroids(Seq((1L, Seq(1.0, 2.0, 3.0, 4.0)))
        .toDF("id", "v"), "id", "v", dim = 4, k = 5, iterations = 1))
    assert(few.getMessage.contains("at least"))
    intercept[IllegalArgumentException](
      KMeans.kmeansCentroids(df, "id", "v", dim = 0, k = 2,
        iterations = 1))
    intercept[IllegalArgumentException](
      KMeans.kmeansCentroids(df, "id", "v", dim = 4, k = 2,
        iterations = 0))
    intercept[IllegalArgumentException](
      KMeans.kmeansCentroids(df, "id", "v", dim = 4, k = 2,
        iterations = 1, scale = 0.0))
  }
}
