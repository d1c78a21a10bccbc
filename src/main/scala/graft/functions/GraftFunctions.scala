package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Product aggregator — Spark has no `product()` builtin. Implemented as a
  * typed Aggregator (SURVEY.md §4 candidate 2) so a cumulative product over
  * a running window multiplies strictly left-to-right, matching the
  * sequential semantics of pandas `cumprod` (reference
  * finance_data.py:38-39) and DuckDB's `product()` bit-for-bit.
  */
object ProductAgg extends Aggregator[java.lang.Double, (Double, Boolean), java.lang.Double] {
  // (acc, sawNull-free-value): track whether any non-null value arrived so
  // an all-null window yields null, like other Spark aggregates.
  def zero: (Double, Boolean) = (1.0, false)
  def reduce(b: (Double, Boolean), a: java.lang.Double): (Double, Boolean) =
    if (a == null) b else (b._1 * a.doubleValue(), true)
  def merge(l: (Double, Boolean), r: (Double, Boolean)): (Double, Boolean) =
    (l._1 * r._1, l._2 || r._2)
  def finish(b: (Double, Boolean)): java.lang.Double =
    if (b._2) java.lang.Double.valueOf(b._1) else null
  def bufferEncoder: Encoder[(Double, Boolean)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaBoolean)
  def outputEncoder: Encoder[java.lang.Double] = Encoders.DOUBLE
}

object GraftFunctions {
  private lazy val productUdaf = udaf(ProductAgg)

  /** `product(col)` aggregate/window function. */
  def product(c: Column): Column = productUdaf(c)
}
