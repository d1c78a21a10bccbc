package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
import org.apache.spark.sql.catalyst.plans.logical.{LeafNode, LogicalPlan, Statistics}
import org.apache.spark.sql.execution.{LeafExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.StructType

/** Deferred-execution seam for table-valued functions whose operator
  * TRAINS a model or materializes bounded state while BUILDING its
  * DataFrame (PageRank's stat/dangling collects and eager cuts, Naive
  * Bayes' count collect, BPE's merge learning): called directly at
  * analysis time, those jobs would run when the SQL statement is
  * ANALYZED — so `EXPLAIN SELECT * FROM pagerank(...)` retrains.
  *
  * [[DeferredBuildPlan]] is a leaf carrying only the (statically
  * derivable) output schema and the build closure; the paired
  * [[DeferredBuildStrategy]] plans it as [[DeferredBuildExec]], which
  * invokes the closure at FIRST EXECUTION (doExecute) — analysis and
  * EXPLAIN launch zero jobs. The inner operator runs as its own query
  * execution (the nested-plan pattern of v1 data sources); the outer
  * plan streams its InternalRows by ordinal, which is sound because the
  * closure's schema is validated against the declared output before any
  * row flows. Within one execution the built RDD is memoized; a NEW
  * action on the same statement re-plans and therefore re-trains — call
  * `.cache()` on the outer result to pay training once across actions
  * (the analysis-time behavior this seam replaces trained once per
  * statement, so the cacheable boundary is unchanged).
  */
case class DeferredBuildPlan(output: Seq[Attribute], label: String,
    build: () => DataFrame) extends LeafNode {
  // conservative huge size: the result must never be auto-broadcast on
  // the basis of a leaf with no real statistics
  override def computeStats(): Statistics =
    Statistics(sizeInBytes = BigInt(Long.MaxValue) >> 8)
  override def simpleString(maxFields: Int): String =
    s"DeferredBuild $label"
}

case class DeferredBuildExec(output: Seq[Attribute], label: String,
    build: () => DataFrame) extends LeafExecNode {
  @transient private lazy val builtRdd: RDD[InternalRow] = {
    val df = build()
    val got = df.queryExecution.analyzed.output
    require(got.length == output.length &&
      got.zip(output).forall { case (g, o) => g.dataType == o.dataType },
      s"deferred $label: operator produced schema " +
        s"${got.map(a => s"${a.name}:${a.dataType.simpleString}")} but " +
        s"the function declared " +
        s"${output.map(a => s"${a.name}:${a.dataType.simpleString}")}")
    df.queryExecution.toRdd
  }
  override protected def doExecute(): RDD[InternalRow] = builtRdd
  override def simpleString(maxFields: Int): String =
    s"DeferredBuildExec $label"
}

/** Plans [[DeferredBuildPlan]] leaves; injected by
  * [[graft.GraftExtensions]] (and added to `experimental.extraStrategies`
  * on live-session registration).
  */
object DeferredBuildStrategy extends SparkStrategy {
  def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case d: DeferredBuildPlan =>
      DeferredBuildExec(d.output, d.label, d.build) :: Nil
    case _ => Nil
  }
}

object DeferredBuildPlan {
  /** Leaf with attributes minted from a schema (nullability is
    * over-approximated as nullable — safe for a result consumed
    * read-only).
    */
  def apply(schema: StructType, label: String,
      build: () => DataFrame): DeferredBuildPlan =
    DeferredBuildPlan(
      schema.fields.toSeq.map(f =>
        AttributeReference(f.name, f.dataType, nullable = true)()),
      label, build)
}
