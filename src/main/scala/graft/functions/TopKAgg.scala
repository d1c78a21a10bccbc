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
  * Duplicate ids are deduplicated INSIDE the heap, keyed on id ALONE:
  * the heap holds at most one entry per id — the better-ranked copy —
  * which lets multi-table LSH union its tables' candidates without a
  * dropDuplicates shuffle before ranking. Scores are normally
  * deterministic functions of the pair, but the id-keyed dedup stays
  * correct even if a retry recomputes a duplicate's score
  * non-identically (exact-tuple dedup would silently keep both and
  * displace a genuine top-k entry).
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
      // Dedup-safe even if a duplicate id arrived with a perturbed score
      // (AQE stage retry recomputing a nondeterministic upstream): a
      // rejected `a` ranks at-or-behind every held entry, so any held
      // copy of the same id is the better one.
      if (!beats(a._1, a._2, worst._1, worst._2)) return b
    }
    // dedup by id ALONE, not exact-tuple equality — the heap holds at
    // most one entry per id, keeping the better-ranked copy
    val i = b.indexWhere(_._2 == a._2)
    if (i >= 0) {
      if (scoreCmp(a._1, b(i)._1) <= 0) b
      else {
        val without = b.patch(i, Nil, 1)
        val (ahead, behind) = without.span(e => beats(e._1, e._2, a._1, a._2))
        (ahead :+ a) ++ behind
      }
    } else {
      val (ahead, behind) = b.span(e => beats(e._1, e._2, a._1, a._2))
      ((ahead :+ a) ++ behind).take(k)
    }
  }

  def merge(l: Seq[(Double, Long)], r: Seq[(Double, Long)]): Seq[(Double, Long)] = {
    // merge two sorted-best-first runs, keep k, collapse duplicate ids —
    // keyed on id alone (a seen-set bounded by 2k), so a duplicate whose
    // score diverged across partials still collapses to its better copy
    val out = Vector.newBuilder[(Double, Long)]
    val seen = new java.util.HashSet[java.lang.Long](4 * k)
    var (li, ri, n) = (0, 0, 0)
    while (n < k && (li < l.size || ri < r.size)) {
      val takeLeft = ri >= r.size || (li < l.size &&
        beats(l(li)._1, l(li)._2, r(ri)._1, r(ri)._2))
      val e = if (takeLeft) { val x = l(li); li += 1; x }
              else { val x = r(ri); ri += 1; x }
      if (seen.add(e._2)) { out += e; n += 1 }
    }
    out.result()
  }

  def finish(b: Seq[(Double, Long)]): Seq[(Double, Long)] = b

  def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
  def outputEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
}
