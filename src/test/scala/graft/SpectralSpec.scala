package graft

import org.apache.spark.sql.functions._

import graft.sim.Spectral

/** Fixed-point vector reductions: centroid exactness vs a quantized
  * reference model, power-iteration convergence to a planted dominant
  * axis, bit-stable partition invariance, and the loud-failure
  * contracts.
  */
class SpectralSpec extends SparkTestBase {
  import spark.implicits._

  private def q(x: Double, scale: Double): Long = math.round(x * scale)

  test("labelCentroids: exact fixed-point means vs a reference model") {
    val rows = Seq(
      (7, Seq(1.0, 2.0, 3.0)), (7, Seq(3.0, 2.0, 1.0)),
      (7, Seq(0.5, -0.25, 0.125)), (9, Seq(-1.0, 0.0, 4.0)))
    val got = Spectral.labelCentroids(rows.toDF("label", "v"), "label",
        "v", dim = 3, scale = 1e10)
      .orderBy("label", "dim_idx")
      .as[(Int, Long, Double, Long)].collect().toSeq
    val exp = rows.groupBy(_._1).toSeq.sortBy(_._1).flatMap {
      case (lb, rs) =>
        (0 until 3).map { j =>
          val s = rs.map(r => q(r._2(j), 1e10)).sum
          (lb, j.toLong, s.toDouble / 1e10 / rs.size, rs.size.toLong)
        }
    }
    assert(got == exp, s"got $got")
    // sanity: the quantized mean equals the analytic mean here (inputs
    // are exactly representable at the scale)
    assert(got.take(3).map(_._3) == Seq(1.5, 1.25, 4.125 / 3))
  }

  test("labelCentroids rejects malformed vectors loudly") {
    val bad = Seq((1, Seq(1.0, 2.0))).toDF("label", "v")
    val e = intercept[Exception](
      Spectral.labelCentroids(bad, "label", "v", dim = 3).collect())
    assert(e.getMessage.contains("exactly 3 non-null") ||
      e.getCause != null)
  }

  test("labelCentroids rejects vectors with NULL elements loudly " +
      "(sum would skip them while count still counts the row)") {
    val bad = Seq((1, Seq[Option[Double]](Some(1.0), None, Some(3.0))))
      .toDF("label", "v")
    val e = intercept[Exception](
      Spectral.labelCentroids(bad, "label", "v", dim = 3).collect())
    val msg = e.getMessage +
      (if (e.getCause != null) e.getCause.getMessage else "")
    assert(msg.contains("labelCentroids"))
  }

  test("powerIterTopComponent finds a planted dominant axis") {
    // 40 vectors along +-e1 with tiny noise on other dims, a few
    // orthogonal distractors: the top second-moment direction is e1
    val rnd = new scala.util.Random(7)
    val vecs = (1 to 40).map { i =>
      val sign = if (i % 2 == 0) 1.0 else -1.0
      Seq.tabulate(4)(j =>
        if (j == 1) sign * (2.0 + 0.01 * rnd.nextDouble())
        else 0.05 * rnd.nextDouble())
    } ++ (1 to 4).map(_ => Seq(0.3, 0.0, 0.0, 0.4))
    val v = Spectral.powerIterTopComponent(vecs.toDF("v"), "v",
        dim = 4, iterations = 8)
      .orderBy("dim_idx").as[(Long, Double)].collect().map(_._2)
    assert(math.abs(v(1)) == 1.0,
      s"dominant axis must max-normalize to 1: ${v.toSeq}")
    Seq(0, 2, 3).foreach(j => assert(math.abs(v(j)) < 0.2,
      s"off-axis component $j too large: ${v.toSeq}"))
  }

  test("both reductions are partition-invariant to the bit") {
    val rnd = new scala.util.Random(41)
    val rows = (0 until 120).map(i =>
      (i % 5, Seq.fill(6)(rnd.nextDouble() * 4 - 2)))
    val df = rows.toDF("label", "v")
    val c1 = Spectral.labelCentroids(df, "label", "v", 6)
      .orderBy("label", "dim_idx").collect().toSeq
    val c2 = Spectral.labelCentroids(df.repartition(13), "label", "v", 6)
      .orderBy("label", "dim_idx").collect().toSeq
    assert(c1 == c2)
    val p1 = Spectral.powerIterTopComponent(df, "v", 6, 5)
      .orderBy("dim_idx").collect().toSeq
    val p2 = Spectral.powerIterTopComponent(df.repartition(13), "v", 6, 5)
      .orderBy("dim_idx").collect().toSeq
    assert(p1 == p2)
  }

  test("power iteration guards: empty input, zero collapse, bad params") {
    val empty = Seq.empty[Seq[Double]].toDF("v")
    intercept[IllegalArgumentException](
      Spectral.powerIterTopComponent(empty, "v", 3, 2))
    val zeros = Seq(Seq(0.0, 0.0, 0.0)).toDF("v")
    intercept[IllegalArgumentException](
      Spectral.powerIterTopComponent(zeros, "v", 3, 2))
    val ok = Seq(Seq(1.0, 0.0, 0.0)).toDF("v")
    intercept[IllegalArgumentException](
      Spectral.powerIterTopComponent(ok, "v", 3, 0))
    intercept[IllegalArgumentException](
      Spectral.labelCentroids(ok.withColumn("l", lit(1)), "l", "v", 3,
        scale = 0.0))
  }
}
