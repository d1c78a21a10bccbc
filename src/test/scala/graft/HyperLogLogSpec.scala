package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.XxHash64Function
import org.apache.spark.sql.types.LongType

import graft.sketch.HyperLogLog

/** HyperLogLog: register parity with a reference model, estimate
  * accuracy on both branches (raw and linear counting), partition
  * invariance, null skipping, and the guards.
  */
class HyperLogLogSpec extends SparkTestBase {
  import spark.implicits._

  private def refRegisters(ids: Seq[Long], p: Int): Array[Long] = {
    val m = new Array[Long](1 << p)
    ids.foreach { id =>
      val h = XxHash64Function.hash(id, LongType, 42L)
      val idx = (h >>> (64 - p)).toInt
      val w = h & ((1L << (64 - p)) - 1)
      val rho =
        if (w == 0L) 64 - p + 1
        else java.lang.Long.numberOfLeadingZeros(w) - p + 1
      if (rho > m(idx)) m(idx) = rho.toLong
    }
    m
  }

  test("registers equal the reference model") {
    val ids = (0L until 500L) ++ (0L until 100L) // duplicates included
    val got = HyperLogLog.registers(ids.toDF("id"), col("id"), 8)
      .orderBy("j").as[(Long, Long)].collect().map(_._2)
    assert(got.toSeq == refRegisters(ids, 8).toSeq)
  }

  test("raw branch: estimate within 3 sigma of a large true cardinality") {
    val n = 5000L
    val out = HyperLogLog.distinctEstimate(
      (0L until n).toDF("id"), col("id"), 8).head()
    val est = out.getAs[Double]("est")
    // sigma ~ 1.04/sqrt(256) ~ 6.5%
    assert(math.abs(est - n) / n < 0.20, s"est $est for true $n")
    assert(out.getAs[Double]("raw_est") > 2.5 * 256) // raw branch taken
  }

  test("linear branch: near-exact at tiny cardinality") {
    val out = HyperLogLog.distinctEstimate(
      Seq.fill(50)(0L to 9L).flatten.toDF("id"), col("id"), 8).head()
    assert(out.getAs[Long]("zero_registers") >= 246L)
    assert(math.abs(out.getAs[Double]("est") - 10.0) < 1.0)
  }

  test("estimate is bit-identical on any partitioning and row order") {
    val ids = (0L until 300L).map(i => i * 17 % 97)
    val a = HyperLogLog.distinctEstimate(ids.toDF("id"), col("id"), 8)
      .head()
    val b = HyperLogLog.distinctEstimate(
      ids.reverse.toDF("id").repartition(7), col("id"), 8).head()
    assert(a == b)
  }

  test("null ids are skipped") {
    val withNulls = Seq[Option[Long]](Some(1L), None, Some(2L), None)
      .toDF("id")
    val justVals = Seq(1L, 2L).toDF("id")
    assert(HyperLogLog.distinctEstimate(withNulls, col("id"), 8).head() ==
      HyperLogLog.distinctEstimate(justVals, col("id"), 8).head())
  }

  test("mergeRegisters(reg(A), reg(B)) equals reg(A union B), and so do estimates") {
    val a = (0L until 120L).toDF("id")
    val b = (80L until 260L).toDF("id")
    val both = ((0L until 120L) ++ (80L until 260L)).toDF("id")
    val merged = HyperLogLog.mergeRegisters(
      HyperLogLog.registers(a, col("id"), 8),
      HyperLogLog.registers(b, col("id"), 8))
    val mergedRows = merged.orderBy("j").as[(Long, Long)].collect().toSeq
    val oneShot = HyperLogLog.registers(both, col("id"), 8)
      .orderBy("j").as[(Long, Long)].collect().toSeq
    assert(mergedRows == oneShot)
    assert(HyperLogLog.estimateFromRegisters(merged, 8).head() ==
      HyperLogLog.distinctEstimate(both, col("id"), 8).head())
  }

  test("setEstimates: union exact-HLL, intersection via inclusion-exclusion") {
    val a = (0L until 400L).toDF("id")
    val b = (200L until 600L).toDF("id") // true overlap 200
    val ra = HyperLogLog.registers(a, col("id"), 8)
    val rb = HyperLogLog.registers(b, col("id"), 8)
    val out = HyperLogLog.setEstimates(ra, rb, 8).head()
    val estU = out.getAs[Double]("est_union")
    val trueU = 600.0
    assert(math.abs(estU - trueU) / trueU < 0.25, s"union est $estU")
    // union estimate must equal the one-shot estimate of A union B
    val oneShot = HyperLogLog.distinctEstimate(
      ((0L until 400L) ++ (200L until 600L)).toDF("id"), col("id"), 8)
      .head().getAs[Double]("est")
    assert(estU == oneShot)
    val estI = out.getAs[Double]("est_intersection")
    assert(estI >= 0.0 && math.abs(estI - 200.0) < 150.0,
      s"intersection est $estI") // IE compounds error; loose bound
    // disjoint sets: intersection clamps at >= 0, never negative
    val rc = HyperLogLog.registers((1000L until 1400L).toDF("id"),
      col("id"), 8)
    assert(HyperLogLog.setEstimates(ra, rc, 8).head()
      .getAs[Double]("est_intersection") >= 0.0)
  }

  test("groupedEstimate matches a bit-exact reference of the value-order fold") {
    val p = 8; val m = 1 << p
    val rows = Seq.tabulate(300)(i => (s"g${i % 3}", (i % 97).toLong)) ++
      Seq(("gnull", -1L)) // sentinel replaced by null below
    val df = rows.toDF("g", "id")
      .withColumn("id", when(col("id") >= 0L, col("id")))
    val got = HyperLogLog.groupedEstimate(df, col("g"), col("id"), p)
      .orderBy("grp").collect()
    // the all-null group must be absent
    assert(!got.map(_.getString(0)).contains("gnull") && got.length == 3)
    val inv = Array.tabulate(64 - p + 2)(k => 1.0 / math.pow(2.0, k))
    got.foreach { r =>
      val g = r.getString(0)
      val ids = rows.filter(x => x._1 == g && x._2 >= 0).map(_._2)
      val regs = refRegisters(ids, p).filter(_ > 0)
      val n0 = m - regs.length
      assert(r.getLong(1) == n0.toLong)
      val psum = regs.groupBy(identity).toSeq.sortBy(_._1)
        .foldLeft(0.0) { case (a, (k, ks)) =>
          a + ks.length.toDouble * inv(k.toInt) }
      val ssum = n0.toDouble * 1.0 + psum
      val raw = HyperLogLog.alphaM(p) * m.toDouble * m.toDouble / ssum
      assert(r.getDouble(2) == raw, s"raw mismatch for $g")
    }
    // partition invariance, bit for bit
    val re = HyperLogLog.groupedEstimate(df.repartition(7), col("g"),
      col("id"), p).orderBy("grp").collect()
    assert(got.toSeq == re.toSeq)
  }

  test("guards: p out of range rejected") {
    val df = Seq(1L).toDF("id")
    intercept[IllegalArgumentException](
      HyperLogLog.distinctEstimate(df, col("id"), 3))
    intercept[IllegalArgumentException](
      HyperLogLog.registers(df, col("id"), 17))
  }
}
