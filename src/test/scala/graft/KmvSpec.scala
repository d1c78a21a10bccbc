package graft

import graft.sketch.Kmv
import org.apache.spark.sql.functions._

class KmvSpec extends SparkTestBase {
  import spark.implicits._

  private def ids(n: Int, offset: Long = 0L) =
    (0 until n).map(i => offset + i * 7L).toDF("v")

  test("sketch is a bounded sorted distinct array; estimate branches") {
    val df = ids(5000)
    val sk = df.agg(Kmv.sketchAgg(col("v"), 64).as("sk"))
      .collect()(0).getSeq[Long](0)
    assert(sk.size === 64)
    assert(sk === sk.sorted)
    assert(sk.distinct.size === sk.size)
    // duplicates in the input must not occupy slots
    val skDup = df.union(df).union(df)
      .agg(Kmv.sketchAgg(col("v"), 64).as("sk"))
      .collect()(0).getSeq[Long](0)
    assert(skDup === sk)
    // exact branch: fewer distinct values than k → estimate == count
    val small = ids(40)
    val row = Kmv.distinctEstimate(small, col("v"), 64, audit = true)
      .collect()(0)
    assert(row.getLong(1) === 40L) // n_retained
    assert(row.getDouble(2) === 40.0)
    assert(row.getLong(3) === 40L)
  }

  test("default estimate path is sketch-only: no exact column, no " +
      "countDistinct aggregate in the plan; nulls are skipped") {
    val df = ids(5000)
    val est = Kmv.distinctEstimate(df, col("v"), 64)
    assert(est.columns.toSeq === Seq("k", "n_retained", "est_kmv"))
    val plan = est.queryExecution.executedPlan.toString.toLowerCase
    assert(!plan.contains("count(distinct") && !plan.contains("count(v"),
      s"audit countDistinct leaked into the sketch-only plan:\n$plan")
    val grouped = Kmv.groupedEstimate(df, col("v") % 3, col("v"), 64)
    assert(grouped.columns.toSeq === Seq("grp", "k", "n_retained", "est_kmv"))
    // nulls never reach the hash: with/without nulls is bit-identical
    // (an unfiltered null would hash to the seed and displace a slot)
    import spark.implicits._
    val withNulls = df.select(col("v").cast("long").as("v"))
      .union(Seq[Option[Long]](None, None).toDF("v"))
    assert(Kmv.distinctEstimate(withNulls, col("v"), 64).collect()(0) ===
      Kmv.distinctEstimate(df, col("v"), 64).collect()(0))
    assert(Kmv.setEstimates(withNulls, df, "v", 64).collect()(0) ===
      Kmv.setEstimates(df, df, "v", 64).collect()(0))
  }

  test("audit branch: distinct-first plan is Expand-free, estimates " +
      "identical to the sketch-only path, exact count true") {
    // r17: the audit countDistinct used to plan via Expand (every row
    // duplicated per aggregate group); the dedup-first formulation must
    // keep Expand out AND change no output value
    val df = ids(5000).union(ids(5000)) // duplicates exercise the dedup
    val audit = Kmv.distinctEstimate(df, col("v"), 64, audit = true)
    val plain = Kmv.distinctEstimate(df, col("v"), 64)
    assert(!audit.queryExecution.executedPlan.toString.contains("Expand"),
      "audit branch must not plan countDistinct via Expand")
    val a = audit.collect()(0)
    val p = plain.collect()(0)
    assert(Seq(a.getLong(0), a.getLong(1)) === Seq(p.getLong(0), p.getLong(1)))
    assert(a.getDouble(2) === p.getDouble(2),
      "sketch estimate must be identical with and without the audit")
    assert(a.getLong(3) === 5000L, "exact_distinct must be the true count")
  }

  test("non-integral value columns are rejected loudly") {
    import spark.implicits._
    val strs = Seq("a", "b").toDF("v")
    intercept[IllegalArgumentException] {
      Kmv.distinctEstimate(strs, col("v"), 64)
    }
    intercept[IllegalArgumentException] {
      Kmv.setEstimates(strs, strs, "v", 64)
    }
  }

  test("estimation regime: within 20% of truth, partition-invariant") {
    val df = ids(20000)
    val r1 = Kmv.distinctEstimate(df, col("v"), 256, audit = true)
      .collect()(0)
    assert(r1.getLong(3) === 20000L)
    val est = r1.getDouble(2)
    assert(math.abs(est - 20000.0) / 20000.0 < 0.20, s"est $est")
    // bit-identical under a different partitioning / arrival order
    val r2 = Kmv.distinctEstimate(
      df.repartition(13, col("v")).sortWithinPartitions(desc("v")),
      col("v"), 256).collect()(0)
    assert(r2.getDouble(2) === est)
  }

  test("mergeCol of two sketches equals the sketch of the union") {
    val a = ids(3000)
    val b = ids(3000, offset = 3L) // overlaps where offset aligns
    val merged = a.agg(Kmv.sketchAgg(col("v"), 128).as("ska"))
      .crossJoin(b.agg(Kmv.sketchAgg(col("v"), 128).as("skb")))
      .select(Kmv.mergeCol(col("ska"), col("skb"), 128).as("m"))
      .collect()(0).getSeq[Long](0)
    val direct = a.union(b).agg(Kmv.sketchAgg(col("v"), 128).as("sk"))
      .collect()(0).getSeq[Long](0)
    assert(merged === direct)
  }

  test("set operations: identical, disjoint and exact-regime sets") {
    val a = ids(4000)
    // identical sets → jaccard exactly 1, inter == union
    val same = Kmv.setEstimates(a, a, "v", 64).collect()(0)
    assert(same.getDouble(6) === 1.0)
    assert(same.getDouble(4) === same.getDouble(5))
    // disjoint sets → jaccard 0, est_inter 0
    val b = ids(4000, offset = 1L) // 7i vs 7i+1 never collide
    val disj = Kmv.setEstimates(a, b, "v", 64).collect()(0)
    assert(disj.getDouble(5) === 0.0 && disj.getDouble(6) === 0.0)
    // both sketches partial → the exact regime: union/inter are exact
    val sa = ids(30)
    val sb = ids(20, offset = 70L) // v = 7i ∩ 7i+70 overlap: i >= 10
    val ex = Kmv.setEstimates(sa, sb, "v", 64).collect()(0)
    assert(ex.getLong(0) === 30L && ex.getLong(1) === 20L)
    assert(ex.getDouble(2) === 30.0 && ex.getDouble(3) === 20.0)
    val exactInter = (0 until 30).map(_ * 7L)
      .intersect((0 until 20).map(i => 70L + i * 7L)).size
    assert(ex.getDouble(5) === exactInter.toDouble)
    assert(ex.getDouble(4) === (30 + 20 - exactInter).toDouble)
  }

  test("overlapping estimation regime: jaccard within 0.15 of truth") {
    val a = ids(10000) // 7i for i < 10000
    val b = ids(10000, offset = 35000L) // 7i+35000 = 7(i+5000): half overlap
    val r = Kmv.setEstimates(a, b, "v", 256).collect()(0)
    val trueJ = 5000.0 / 15000.0
    assert(math.abs(r.getDouble(6) - trueJ) < 0.15, s"jaccard ${r.getDouble(6)}")
    assert(math.abs(r.getDouble(4) - 15000.0) / 15000.0 < 0.25)
    assert(math.abs(r.getDouble(5) - 5000.0) / 5000.0 < 0.40)
  }

  test("k validation fails loudly") {
    intercept[IllegalArgumentException] {
      Kmv.distinctEstimate(ids(10), col("v"), 8)
    }
  }
}
