package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k by (score desc, id asc) — the aggregation the similarity
  * tier's ranking needs without a ranking window. A `row_number().over(
  * partitionBy(query))` plan shuffles EVERY scored candidate to the
  * query's reducer before the `rank <= k` filter drops them; this
  * aggregator is map-side combinable (TypedImperativeAggregate under
  * `udaf`), so each task forwards at most k candidates per query and the
  * exchange carries ≤ k · numPartitions rows per query no matter how many
  * candidates were scored — the difference between a bounded merge and a
  * full re-shuffle of |corpus| × |queries| at 100 TB.
  *
  * Ordering matches Spark's SQL sort on (score DESC, id ASC) exactly:
  * NaN sorts greatest (first under DESC), ±0.0 compare equal, ties break
  * by ascending id — so the emitted set and order are bit-identical to
  * the window formulation it replaces.
  *
  * Duplicate ids are deduplicated INSIDE the heap (a candidate whose id
  * is already held is skipped; merge collapses equal heads). A candidate
  * id always carries the same score (scores are deterministic functions
  * of the pair), so this yields exact top-k over DISTINCT candidates —
  * which lets multi-table LSH union its tables' candidates without a
  * dropDuplicates shuffle before ranking.
  */
class TopKAgg(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {
  require(k > 0, s"k must be positive, got $k")

  // Spark SQL double ordering: NaN greatest, -0.0 == 0.0 (primitive
  // comparison, not java.lang.Double.compare)
  private def scoreCmp(a: Double, b: Double): Int =
    if (a > b || (a.isNaN && !b.isNaN)) 1
    else if (a < b || (!a.isNaN && b.isNaN)) -1
    else 0

  /** true when candidate (s1, id1) ranks strictly ahead of (s2, id2). */
  private def beats(s1: Double, id1: Long, s2: Double, id2: Long): Boolean = {
    val c = scoreCmp(s1, s2)
    if (c != 0) c > 0 else id1 < id2
  }

  def zero: Seq[(Double, Long)] = Nil

  def reduce(b: Seq[(Double, Long)], a: (Double, Long)): Seq[(Double, Long)] = {
    if (b.size >= k) {
      val worst = b.last
      // cheap reject path — the overwhelmingly common case once warm.
      // An already-held duplicate of `a` never reaches the insert below:
      // it would sit exactly at the span boundary and is caught there.
      if (!beats(a._1, a._2, worst._1, worst._2)) return b
    }
    val (ahead, behind) = b.span(e => beats(e._1, e._2, a._1, a._2))
    if (behind.nonEmpty && behind.head._2 == a._2) b // duplicate id — skip
    else ((ahead :+ a) ++ behind).take(k)
  }

  def merge(l: Seq[(Double, Long)], r: Seq[(Double, Long)]): Seq[(Double, Long)] = {
    // merge two sorted-best-first runs, keep k, collapse duplicate ids
    // (equal entries are adjacent under the total order)
    val out = Vector.newBuilder[(Double, Long)]
    var (li, ri, n) = (0, 0, 0)
    while (n < k && (li < l.size || ri < r.size)) {
      val takeLeft = ri >= r.size || (li < l.size &&
        beats(l(li)._1, l(li)._2, r(ri)._1, r(ri)._2))
      if (takeLeft) {
        if (ri < r.size && l(li) == r(ri)) ri += 1
        out += l(li); li += 1
      } else {
        if (li < l.size && l(li) == r(ri)) li += 1
        out += r(ri); ri += 1
      }
      n += 1
    }
    out.result()
  }

  def finish(b: Seq[(Double, Long)]): Seq[(Double, Long)] = b

  def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
  def outputEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
}
