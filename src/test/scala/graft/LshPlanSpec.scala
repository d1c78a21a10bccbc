package graft

import graft.dedup.Dedup

class LshPlanSpec extends SparkTestBase {

  test("hand-checked picks on the MMDS S-curve (n = 32)") {
    // divisor pairs of 32: (b, r, inflection (1/b)^(1/r)) =
    // (1,32,1.0) (2,16,.9576) (4,8,.8409) (8,4,.5946) (16,2,.25)
    // (32,1,.03125)
    assert(Dedup.lshPlan(32, 0.5).bands === 8)
    assert(Dedup.lshPlan(32, 0.6).bands === 8)
    assert(Dedup.lshPlan(32, 0.8).bands === 4)
    // 0.9: |.9576 - .9| = .0576 beats |.8409 - .9| = .0591
    assert(Dedup.lshPlan(32, 0.9).bands === 2)
    val p = Dedup.lshPlan(32, 0.8)
    assert(p.rowsPerBand === 8 && p.numHashes === 32 && p.threshold === 0.8)
    assert(math.abs(p.inflection - math.pow(0.25, 0.125)) < 1e-15)
    val expectP = 1.0 - math.pow(1.0 - math.pow(0.8, 8), 4)
    assert(p.pCollide === expectP)
  }

  test("planner matches brute force over the divisor lattice") {
    for (n <- Seq(8, 16, 32, 64, 100, 128); ti <- 1 to 19) {
      val t = ti / 20.0
      val plan = Dedup.lshPlan(n, t)
      val best = (1 to n).filter(n % _ == 0).map { b =>
        val r = n / b
        (math.round(math.abs(math.pow(1.0 / b, 1.0 / r) - t) * 1e9), -b)
      }.min
      val got = (math.round(math.abs(
        math.pow(1.0 / plan.bands, 1.0 / plan.rowsPerBand) - t) * 1e9),
        -plan.bands)
      assert(got === best, s"n=$n t=$t chose b=${plan.bands}")
      assert(plan.bands * plan.rowsPerBand === n)
      assert(plan.pCollide > 0.0 && plan.pCollide <= 1.0)
    }
  }

  test("higher thresholds never plan more bands (same budget)") {
    // the inflection target rises with t, so the chosen banding can
    // only move toward fewer, longer bands
    for (n <- Seq(16, 32, 64, 128)) {
      val picks = (1 to 19).map(ti => Dedup.lshPlan(n, ti / 20.0).bands)
      assert(picks.zip(picks.tail).forall { case (a, b) => b <= a },
        s"n=$n picks=$picks")
    }
  }

  test("planned near-dups equal explicit-bands near-dups") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "the quick brown fox jumps over the lazy cat tonight"),
      (3L, "completely different text with nothing shared here at all"),
      (4L, "the quick brown fox jumps over the lazy dog tonight")
    ).toDF("doc_id", "text")
    val plan = Dedup.lshPlan(32, 0.5)
    val planned = Dedup.minhashNearDupsPlanned(docs, "doc_id", "text",
      numHashes = 32, threshold = 0.5)
      .as[(Long, Long, Double)].collect().sorted.toSeq
    val explicit = Dedup.minhashNearDups(docs, "doc_id", "text",
      numHashes = 32, bands = plan.bands, threshold = 0.5)
      .as[(Long, Long, Double)].collect().sorted.toSeq
    assert(planned === explicit)
    assert(planned.nonEmpty)
  }

  test("guards fail loudly") {
    intercept[IllegalArgumentException](Dedup.lshPlan(0, 0.5))
    intercept[IllegalArgumentException](Dedup.lshPlan(32, 0.0))
    intercept[IllegalArgumentException](Dedup.lshPlan(32, 1.0))
  }
}
