package graft

import org.apache.spark.sql.functions._

import graft.functions.CompactLiteral

/** CompactLiteral — the plan-string fix for large model constants: it
  * must evaluate exactly like the typedLit it replaces (interpreted AND
  * whole-stage-codegen paths) while printing only its label.
  */
class CompactLiteralSpec extends SparkTestBase {
  import spark.implicits._

  private val table: Seq[Seq[Double]] =
    Seq(Seq(1.5, -2.0), Seq(0.25, 8.0), Seq(-3.0, 0.0))

  test("eval parity with typedLit under element_at (codegen path)") {
    val df = spark.range(0, 3).toDF("i")
      .select(col("i"),
        element_at(CompactLiteral.of(table, "tab[3x2]"),
          col("i").cast("int") + 1).as("c"),
        element_at(typedLit(table), col("i").cast("int") + 1).as("t"))
    val rows = df.select(col("c") === col("t")).as[Boolean].collect()
    assert(rows.length == 3 && rows.forall(identity),
      "CompactLiteral diverged from typedLit")
  }

  test("plan string carries the label, not the array") {
    val df = spark.range(1).select(
      element_at(CompactLiteral.of(table, "tab[3x2]"), 1).as("v"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("tab[3x2]"), s"label missing from plan:\n$plan")
    assert(!plan.contains("1.5, -2.0"),
      s"array contents leaked into the plan string:\n$plan")
  }

  test("the IVFADC plan string stays small (the driver-tax regression " +
      "guard)") {
    // the round-16 measurement: with plain typedLit codebook tables the
    // formatted plan was ~1.4 MB and AQE's per-stage plan descriptions
    // dominated driver time. 64 KB leaves generous slack while failing
    // loudly if a future edit reintroduces a printing literal.
    val q = SparkEntry.queries("sim_ivfadc_topk")(spark, sf0001)
    val len = q.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode).length
    assert(len < 64 * 1024,
      s"sim_ivfadc_topk plan string grew to $len chars — a model " +
        "constant is printing its full array again")
  }
}
