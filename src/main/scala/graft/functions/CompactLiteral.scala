package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{LeafExpression, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.DataType

/** A [[Literal]] whose STRING FORM is a short label.
  *
  * Large model constants — PQ codebooks, ADC lookup tables, IVF
  * centroid norms — ride query plans as array literals, and every plan
  * stringification prints the full nested array: AQE emits a SQL-UI
  * plan description per query stage, so a 10-job IVFADC probe
  * stringified its 1.4 MB formatted plan ~10× per invocation, and a
  * driver thread dump showed more wall time in
  * `GenericArrayData.toString` (via `Literal.toString`) than in all of
  * the query's jobs combined. Wrapping the literal fixes the cost at
  * the root: evaluation, codegen and equality delegate to the wrapped
  * literal's semantics, while `toString`/`sql` print only the label.
  * `foldable` is false so constant folding cannot rewrite it back into
  * a printing [[Literal]]; nothing downstream needs these constants to
  * fold (they are only ever indexed by `element_at`).
  */
case class CompactLiteral(lit: Literal, label: String)
    extends LeafExpression {
  override def dataType: DataType = lit.dataType
  override def nullable: Boolean = lit.nullable
  override def foldable: Boolean = false
  override def eval(input: InternalRow): Any = lit.value
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = lit.genCode(ctx)
  override def toString: String = label
  override def sql: String = label
}

object CompactLiteral {
  /** `typedLit(value)` with a compact printed form — same
    * ScalaReflection type inference (`Literal.create`), so the literal
    *'s dataType is identical to what `typedLit` would produce.
    */
  def of[T: scala.reflect.runtime.universe.TypeTag](value: T,
      label: String): Column =
    GraftShims.column(CompactLiteral(Literal.create(value), label))
}
