package graft.sketch

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HyperLogLog distinct-count estimation (Flajolet et al. 2007) — the
  * other half of the sketch tier next to [[CountMin]]: COUNT(DISTINCT)
  * over a 100 TB column in one pass with 2^p integer registers where
  * the exact count would shuffle every distinct value. Register j
  * holds max ρ over rows bucketing there (ρ = 1 + leading zeros of
  * the hash's low 64−p bits); max is associative/commutative, so the
  * register table is bit-identical on any partitioning.
  *
  * Determinism of the ESTIMATE, not just the registers: the harmonic
  * sum Σ 2^−M_j folds in register order over EXACT literal values
  * (1/2^k is IEEE-representable for k ≤ 57; the lookup table is
  * printed into both engines rather than recomputed through pow), and
  * the bias constant α_m is one double printed into both engines
  * ([[alphaLiteral]] — the published small-m constants below m = 128).
  * The only transcendental is the linear-counting branch's
  * ln, absorbed by the established round-6 output rounding.
  *
  * Plan shape: scan-stage codegen'd register packing
  * ([[graft.functions.HashKernels.hllPacked]]), one map-side-combined
  * max-aggregation over ≤ 2^p groups, a broadcast join against the
  * 2^p-row dense grid, and a single-row fold — the corpus never
  * shuffles.
  */
object HyperLogLog {

  /** 1/2^k for k = 0..maxRho as exact literals, shared with the SQL
    * oracle ([[inv2Literals]]).
    */
  private def inv2(maxRho: Int): Array[Double] =
    Array.tabulate(maxRho + 1)(k => 1.0 / java.lang.Math.scalb(1.0, k))

  /** The literal list as SQL text — printed from the same doubles the
    * Spark plan embeds, so both engines fold identical values.
    */
  def inv2Literals(p: Int): String =
    inv2(64 - p + 1).map(d => s"CAST($d AS DOUBLE)").mkString("[", ", ", "]")

  /** Bias constant α_m of Flajolet et al. 2007: the published small-m
    * constants for m = 16/32/64, the asymptotic formula for m ≥ 128.
    * One double, computed once and PRINTED into both engines
    * ([[alphaLiteral]]) so they multiply the identical value.
    */
  def alphaM(p: Int): Double = (1 << p) match {
    case 16 => 0.673
    case 32 => 0.697
    case 64 => 0.709
    case m => 0.7213 / (1.0 + 1.079 / m.toDouble)
  }

  /** α_m as SQL text, from the same double the Spark plan embeds. */
  def alphaLiteral(p: Int): String = s"CAST(${alphaM(p)} AS DOUBLE)"

  private def validate(p: Int): Unit =
    require(p >= 4 && p <= 16, s"p must be in [4, 16], got $p")

  private def cut(df: DataFrame): DataFrame =
    graft.ops.Lineage.cut(df)

  /** Dense 2^p-row register table (j, mrho) for `id` (nulls skipped —
    * a null has no identity to count; mrho = 0 for untouched
    * registers).
    */
  def registers(df: DataFrame, id: Column, p: Int): DataFrame = {
    validate(p)
    val m = 1 << p
    val packed = graft.functions.HashFunctions
      .hllPacked(xxhash64(id), p)
    val sparse = df
      .where(id.isNotNull)
      .select(packed.as("pk"))
      .select(shiftrightunsigned(col("pk"), 6).as("idx"),
        col("pk").bitwiseAND(lit(63L)).as("rho"))
      .groupBy(col("idx"))
      .agg(max(col("rho")).as("mrho"))
    df.sparkSession.range(m).toDF("j")
      .join(broadcast(sparse), col("j") === col("idx"), "left")
      .select(col("j"), coalesce(col("mrho"), lit(0L)).as("mrho"))
  }

  /** Max-merge of two dense register tables built with the same p —
    * HLL's union property: mergeRegisters(reg(A), reg(B)) equals
    * reg(A ∪ B) bit-for-bit (max is associative/commutative/
    * idempotent), so per-batch register tables persist and fold into
    * a corpus table without re-reading corpus rows.
    */
  def mergeRegisters(a: DataFrame, b: DataFrame): DataFrame =
    a.select(col("j"), col("mrho").as("__ma"))
      .join(b.select(col("j"), col("mrho").as("__mb")), Seq("j"),
        "full_outer")
      .select(col("j"),
        greatest(coalesce(col("__ma"), lit(0L)),
          coalesce(col("__mb"), lit(0L))).as("mrho"))

  /** One-row estimate from a dense register table (j, mrho):
    * (zero_registers, raw_est, est). `raw_est` is the uncorrected
    * α_m·m²/Σ2^−M_j; `est` applies linear counting when raw ≤ 2.5m
    * and zero registers remain, rounded to 6 decimals (the ln-ulp
    * absorb).
    */
  def estimateFromRegisters(regs: DataFrame, p: Int): DataFrame = {
    validate(p)
    val m = 1 << p
    val inv = inv2(64 - p + 1)
    val invLit = array(inv.toSeq.map(lit): _*)
    val folded = regs
      .groupBy()
      .agg(sort_array(collect_list(struct(col("j"), col("mrho"))))
        .as("rs"))
      .select(
        size(filter(col("rs"), r => r.getField("mrho") === 0L))
          .cast("long").as("zero_registers"),
        aggregate(
          transform(col("rs"),
            r => element_at(invLit, (r.getField("mrho") + 1L).cast("int"))),
          lit(0.0), (a, x) => a + x).as("ssum"))
    val alpha = lit(alphaM(p))
    val raw = alpha * lit(m.toDouble) * lit(m.toDouble) / col("ssum")
    folded.select(
      col("zero_registers"),
      raw.as("raw_est"),
      when(raw <= lit(2.5 * m) && col("zero_registers") > 0L,
        round(lit(m.toDouble) *
          log(lit(m.toDouble) / col("zero_registers").cast("double")), 6))
        .otherwise(round(raw, 6)).as("est"))
  }

  /** One-row estimate straight from an id column — [[registers]] +
    * [[estimateFromRegisters]].
    */
  def distinctEstimate(df: DataFrame, id: Column, p: Int = 8): DataFrame =
    estimateFromRegisters(registers(df, id, p), p)

  /** Per-group distinct estimate — the windowed form ("distinct users
    * per day/window") that replaces an exploding per-window
    * COUNT(DISTINCT) state with ≤ 2^p registers per group. One sparse
    * (grp, idx) max-aggregation, then a per-group fold over REGISTER
    * VALUES rather than register positions: ssum =
    * n_0·1 + Σ_k n_k·2^−k with n_k the count of registers holding k —
    * ≤ 64−p+1 terms folded in k order (n_k·2^−k is exact: an integer
    * times a power of two), so the grouped estimate has its own pinned
    * deterministic float order without densifying a grid per group.
    * Output: (grp, zero_registers, raw_est, est) — same estimator
    * branches/rounding as [[estimateFromRegisters]]. Groups with no
    * non-null ids are absent (no evidence, no row).
    */
  def groupedEstimate(df: DataFrame, grp: Column, id: Column,
      p: Int): DataFrame = {
    validate(p)
    val m = 1 << p
    val inv = inv2(64 - p + 1)
    val invLit = array(inv.toSeq.map(lit): _*)
    val packed = graft.functions.HashFunctions
      .hllPacked(xxhash64(id), p)
    val sparse = df
      .where(id.isNotNull)
      .select(grp.as("grp"), packed.as("pk"))
      .select(col("grp"), shiftrightunsigned(col("pk"), 6).as("idx"),
        col("pk").bitwiseAND(lit(63L)).as("rho"))
      .groupBy(col("grp"), col("idx"))
      .agg(max(col("rho")).as("mrho"))
    val folded = sparse
      .groupBy(col("grp"), col("mrho"))
      .agg(count(lit(1)).as("ck"))
      .groupBy(col("grp"))
      .agg(sort_array(collect_list(struct(col("mrho"), col("ck"))))
        .as("vs"))
      .select(col("grp"),
        (lit(m.toLong) - aggregate(col("vs"),
          lit(0L), (a, r) => a + r.getField("ck"))).as("n0"),
        aggregate(col("vs"), lit(0.0), (a, r) =>
          a + r.getField("ck").cast("double") *
            element_at(invLit, (r.getField("mrho") + 1L).cast("int")))
          .as("psum"))
    val ssum = col("n0").cast("double") * lit(1.0) + col("psum")
    val alpha = lit(alphaM(p))
    val raw = alpha * lit(m.toDouble) * lit(m.toDouble) / ssum
    folded.select(
      col("grp"), col("n0").as("zero_registers"),
      raw.as("raw_est"),
      when(raw <= lit(2.5 * m) && col("n0") > 0L,
        round(lit(m.toDouble) *
          log(lit(m.toDouble) / col("n0").cast("double")), 6))
        .otherwise(round(raw, 6)).as("est"))
  }

  /** One-row set-operation estimates from two register tables:
    * (est_a, est_b, est_union, est_intersection). Union is exact HLL
    * ([[mergeRegisters]] — the union sketch IS the sketch of the
    * union); intersection is inclusion–exclusion
    * est_a + est_b − est_union, clamped at 0 (IE can go negative
    * within sketch error; a negative overlap estimate is noise, not
    * signal). The audit shape for "how much does corpus B overlap
    * corpus A" without joining either.
    */
  def setEstimates(a: DataFrame, b: DataFrame, p: Int): DataFrame = {
    validate(p)
    // each register table feeds two consumers (its own estimate + the
    // union merge): materialize the tiny 2^p-row tables once so the
    // corpus scan behind each runs once, not twice
    val ac = cut(a)
    val bc = cut(b)
    def est(regs: DataFrame, name: String) =
      estimateFromRegisters(regs, p).select(col("est").as(name))
    est(ac, "est_a")
      .crossJoin(est(bc, "est_b"))
      .crossJoin(est(mergeRegisters(ac, bc), "est_union"))
      .select(col("est_a"), col("est_b"), col("est_union"),
        greatest(lit(0.0),
          round(col("est_a") + col("est_b") - col("est_union"), 6))
          .as("est_intersection"))
  }
}
