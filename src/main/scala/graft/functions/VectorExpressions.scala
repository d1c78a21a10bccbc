package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.types._

/** Vector kernels for the similarity tier (same rationale as
  * HashExpressions: `aggregate(zip_with(...))` HOFs evaluate an
  * interpreted lambda per element; on a dot product inside a pair join
  * that overhead dominates). The loops accumulate LEFT-TO-RIGHT exactly
  * like the HOF fold they replace, so results are bit-identical and the
  * DuckDB oracles (which replicate that fold order) stay green.
  * Both expressions generate static calls into VectorKernels so they stay
  * inside whole-stage codegen (the nullable result is handled explicitly).
  */

/** Static kernels shared by the interpreted and generated paths. */
object VectorKernels {
  /** Null on length mismatch or any null element (HOF zip_with parity). */
  def dot(x: ArrayData, y: ArrayData, leftFloat: Boolean,
      rightFloat: Boolean): java.lang.Double = {
    val n = x.numElements()
    if (y.numElements() != n) return null
    var acc = 0.0
    var i = 0
    if (leftFloat && rightFloat) {
      while (i < n) {
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        acc += x.getFloat(i) * y.getFloat(i); i += 1
      }
    } else {
      while (i < n) {
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        val xv = if (leftFloat) x.getFloat(i).toDouble else x.getDouble(i)
        val yv = if (rightFloat) y.getFloat(i).toDouble else y.getDouble(i)
        acc += xv * yv
        i += 1
      }
    }
    java.lang.Double.valueOf(acc)
  }

  /** Null on any null element. */
  def norm(x: ArrayData, isFloat: Boolean): java.lang.Double = {
    val n = x.numElements()
    var acc = 0.0
    var i = 0
    if (isFloat) {
      while (i < n) {
        if (x.isNullAt(i)) return null
        val v = x.getFloat(i); acc += v * v; i += 1
      }
    } else {
      while (i < n) {
        if (x.isNullAt(i)) return null
        val v = x.getDouble(i); acc += v * v; i += 1
      }
    }
    java.lang.Double.valueOf(math.sqrt(acc))
  }
}

/** Dot product of two array<double|float> columns (null if either is
  * null; elements assumed non-null, as produced by embedding casts).
  * Matches the HOF semantics it replaced: float×float multiplies in
  * FLOAT then widens into the double accumulator; any double operand
  * promotes the multiply to double.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"
  // can return null even for non-null inputs (length mismatch, null elem)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(DoubleType | FloatType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>/array<float> arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  private def elemIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  @transient private lazy val leftFloat = elemIsFloat(left)
  @transient private lazy val rightFloat = elemIsFloat(right)

  // HOF parity: zip_with pads length mismatches with nulls and a null
  // element nulls the whole aggregate — a truncated/corrupt embedding
  // must yield NULL (and get filtered), not a plausible prefix cosine
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      leftFloat, rightFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("dot")
      s"""
         |java.lang.Double $tmp = graft.functions.VectorKernels.dot(
         |  $a, $b, $leftFloat, $rightFloat);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): DotProduct = copy(left = l, right = r)
}

/** L2 norm of an array<double|float> column — sqrt of the left-to-right
  * sum of squares (float arrays square in FLOAT, like the HOF form).
  */
case class L2Norm(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_norm"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType | FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<double>/array<float> argument, got " +
        other.catalogString)
  }

  @transient private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any =
    VectorKernels.norm(input.asInstanceOf[ArrayData], isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("nrm")
      s"""
         |java.lang.Double $tmp = graft.functions.VectorKernels.norm($c, $isFloat);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): L2Norm = copy(c)
}

object VectorFunctions {
  def dot(a: Column, b: Column): Column =
    GraftShims.column(DotProduct(GraftShims.expression(a), GraftShims.expression(b)))

  def norm(a: Column): Column =
    GraftShims.column(L2Norm(GraftShims.expression(a)))
}
