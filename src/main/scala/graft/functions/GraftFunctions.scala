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

/** Exponentially-weighted mean, pandas `ewm(alpha, adjust=False,
  * ignore_na=True).mean()` semantics: y₀ = x₀, yₜ = (1−α)·yₜ₋₁ + α·xₜ,
  * nulls skipped. The recursion is order-dependent, so this is a
  * WINDOW aggregate over a running frame (sequential per-row update —
  * the same evaluation contract ProductAgg relies on); cross-segment
  * merge is only legal when one side is empty and throws otherwise
  * rather than silently mis-associating.
  */
class EwmAgg(alpha: Double)
    extends Aggregator[java.lang.Double, (Double, Boolean), java.lang.Double] {
  require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1], got $alpha")
  private val beta = 1 - alpha
  def zero: (Double, Boolean) = (0.0, false)
  def reduce(b: (Double, Boolean), a: java.lang.Double): (Double, Boolean) =
    if (a == null) b
    else if (!b._2) (a.doubleValue(), true)
    else (beta * b._1 + alpha * a.doubleValue(), true)
  def merge(l: (Double, Boolean), r: (Double, Boolean)): (Double, Boolean) =
    if (!l._2) r else if (!r._2) l
    else throw new UnsupportedOperationException(
      "ewm is order-dependent: use it as a window aggregate, not a groupBy")
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

  /** `ewm(col)` window aggregate for a given smoothing alpha. */
  def ewm(c: Column, alpha: Double): Column = {
    val f = udaf(new EwmAgg(alpha))
    f(c)
  }
}
