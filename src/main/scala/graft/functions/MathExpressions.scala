package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Natural log via the `java.lang.Math.log` HotSpot INTRINSIC instead
  * of Spark's built-in `log`, which calls `java.lang.StrictMath.log`
  * (fdlibm). This is a cross-engine-agreement expression, measured, not
  * assumed (`W9LogProbe` over the 98,055 distinct sf0.1 w9 inputs):
  * fdlibm disagrees with DuckDB's glibc `ln` at 1 ulp on 7,033 inputs,
  * the Math.log intrinsic on only 55 — ~128× closer. The w9_logcum
  * pipeline (float32 output absorbing the surviving ulps) uses this to
  * shrink its documented rounding-boundary residual accordingly.
  *
  * Semantics match numpy's `np.log` like the built-in wrapper did:
  * NaN for negative input, −∞ at 0 would be the IEEE answer but
  * Math.log(0) = −∞ and Math.log(neg) = NaN — callers that need
  * Spark-`log`'s null-on-nonpositive contract must guard themselves
  * (logCumReturn pins its own −∞ branch explicitly).
  */
case class IntrinsicLog(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "intrinsic_log"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a double argument, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    java.lang.Math.log(input.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"java.lang.Math.log($c)")

  override protected def withNewChildInternal(c: Expression): IntrinsicLog =
    copy(c)
}

object MathFunctions {
  /** Math.log-intrinsic natural log (see [[IntrinsicLog]]). */
  def intrinsicLog(c: Column): Column =
    GraftShims.column(IntrinsicLog(GraftShims.expression(c)))
}
