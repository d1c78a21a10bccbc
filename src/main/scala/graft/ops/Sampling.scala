package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting and sampling for training pipelines.
  *
  * Assignment is a pure function of the row's id (seeded xxhash64 →
  * bucket), NOT of randomness or physical layout: the same row lands in
  * the same split on every run, any cluster size, any partitioning, and
  * appending new data never reshuffles existing assignments — the
  * properties `randomSplit`/`sample` lack (they re-roll per run and per
  * partition layout). This is the standard production split discipline
  * for 100 TB corpora: no split manifest to store, no shuffle at all —
  * the label is a scan-stage expression.
  */
object Sampling {

  /** Stable bucket in [0, denom) from the id column. */
  def hashBucket(idCol: Column, denom: Int): Column =
    pmod(xxhash64(idCol), lit(denom.toLong))

  /** Split label column from cumulative fraction boundaries, e.g.
    * `Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)`. Fractions must
    * sum to 1 within denom granularity; rows map by hash bucket.
    */
  def splitColumn(idCol: Column, fractions: Seq[(String, Double)],
      denom: Int = 10000): Column = {
    require(fractions.nonEmpty, "no split fractions")
    val total = fractions.map(_._2).sum
    require(math.abs(total - 1.0) < 1e-9, s"fractions sum to $total, not 1")
    val b = hashBucket(idCol, denom)
    val bounds = fractions.scanLeft(0.0)(_ + _._2).tail
      .map(f => math.round(f * denom))
    // ordered when-chain: the first boundary the bucket falls under wins
    val first = when(b < bounds.head, lit(fractions.head._1))
    fractions.tail.zip(bounds.tail)
      .foldLeft(first) { case (acc, ((name, _), hi)) =>
        acc.when(b < hi, lit(name))
      }.otherwise(lit(fractions.last._1)) // denom-rounding remainder
  }

  /** Append a `split` column to the frame. */
  def hashSplit(df: DataFrame, idCol: String,
      fractions: Seq[(String, Double)], denom: Int = 10000): DataFrame =
    df.withColumn("split", splitColumn(col(idCol), fractions, denom))

  /** Deterministic `fraction` sample: keep rows whose salted hash bucket
    * falls under the fraction. Different salts give independent samples.
    */
  def hashSample(df: DataFrame, idCol: String, fraction: Double,
      salt: Long = 0L, denom: Int = 10000): DataFrame =
    df.filter(pmod(xxhash64(lit(salt), col(idCol)), lit(denom.toLong)) <
      math.round(fraction * denom))

  /** Stratified deterministic sample: a per-stratum keep fraction (e.g.
    * down-weight the dominant language of a corpus, keep all of a rare
    * one). Same id-hash discipline as [[hashSample]] — the threshold is
    * the only thing that varies by stratum, so membership stays a pure
    * scan-stage predicate: no shuffle, no per-stratum pass, stable under
    * appends and repartitioning.
    */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
      fractions: Seq[(String, Double)], defaultFraction: Double,
      denom: Int = 100): DataFrame = {
    require(fractions.nonEmpty, "no stratum fractions")
    val thr = fractions.foldLeft(when(lit(false), lit(0L))) {
      case (acc, (stratum, f)) =>
        acc.when(col(stratumCol) === stratum, lit(math.round(f * denom)))
    }.otherwise(lit(math.round(defaultFraction * denom)))
    df.filter(hashBucket(col(idCol), denom) < thr)
  }
}
