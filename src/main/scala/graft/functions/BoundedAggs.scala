package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded "k smallest members" aggregations for LSH bucket membership.
  *
  * `slice(sort_array(collect_list(id)), 1, maxBucket)` caps what leaves
  * the aggregation, but collect_list still materializes the ENTIRE bucket
  * in one buffer first — a pathological hot bucket (many degenerate
  * near-identical rows sharing a sign pattern / band hash) could OOM an
  * executor at 100 TB even though only maxBucket ids survive. These
  * aggregators keep the buffer itself bounded: partial buffers never
  * exceed k entries, map-side combine applies, and the result is
  * bit-identical to the slice(sort_array(collect_list)) form.
  *
  * REQUIREMENTS (both aggregators):
  *  - Keys must be UNIQUE within a group. Equal values are deduplicated
  *    across partial buffers (collect_list would keep both), so with
  *    duplicate keys these aggs admit one extra distinct member under the
  *    cap and the bit-identical equivalence no longer holds. Every current
  *    call site groups ids that appear once per bucket by construction.
  *  - Inputs must be NON-NULL: the primitive Long input encoder throws on
  *    null where collect_list silently skips — drop null ids upstream
  *    (see Dedup.smallestKIds call sites).
  */
class SmallestKLongsAgg(k: Int)
    extends Aggregator[Long, Seq[Long], Seq[Long]] {
  require(k > 0, s"k must be positive, got $k")

  def zero: Seq[Long] = Nil

  def reduce(b: Seq[Long], a: Long): Seq[Long] = {
    if (b.size >= k && a >= b.last) b
    else {
      val (lo, hi) = b.span(_ < a)
      if (hi.nonEmpty && hi.head == a) b else ((lo :+ a) ++ hi).take(k)
    }
  }

  def merge(l: Seq[Long], r: Seq[Long]): Seq[Long] = {
    val out = Vector.newBuilder[Long]
    var li = 0
    var ri = 0
    var n = 0
    while (n < k && (li < l.size || ri < r.size)) {
      val takeLeft = ri >= r.size || (li < l.size && l(li) <= r(ri))
      if (takeLeft) {
        val v = l(li); li += 1
        if (ri < r.size && r(ri) == v) ri += 1 // duplicate across partials
        out += v
      } else {
        out += r(ri); ri += 1
      }
      n += 1
    }
    out.result()
  }

  def finish(b: Seq[Long]): Seq[Long] = b

  def bufferEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
  def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
}

/** A bucket member carrying its payload (e.g. the SimHash fingerprint);
  * ordered by id — ids are unique within a bucket, so this matches
  * sort_array's lexicographic (id, fp) struct order.
  */
final case class BucketMember(id: Long, fp: Long)

/** k smallest (id, fp) members per bucket, ordered by (id, fp). */
class SmallestKMembersAgg(k: Int)
    extends Aggregator[BucketMember, Seq[BucketMember], Seq[BucketMember]] {
  require(k > 0, s"k must be positive, got $k")

  private def lt(a: BucketMember, b: BucketMember): Boolean =
    a.id < b.id || (a.id == b.id && a.fp < b.fp)

  def zero: Seq[BucketMember] = Nil

  def reduce(b: Seq[BucketMember], a: BucketMember): Seq[BucketMember] = {
    if (b.size >= k && !lt(a, b.last)) b
    else {
      val (lo, hi) = b.span(lt(_, a))
      if (hi.nonEmpty && hi.head == a) b else ((lo :+ a) ++ hi).take(k)
    }
  }

  def merge(l: Seq[BucketMember], r: Seq[BucketMember]): Seq[BucketMember] = {
    val out = Vector.newBuilder[BucketMember]
    var li = 0
    var ri = 0
    var n = 0
    while (n < k && (li < l.size || ri < r.size)) {
      val takeLeft = ri >= r.size || (li < l.size && !lt(r(ri), l(li)))
      if (takeLeft) {
        val v = l(li); li += 1
        if (ri < r.size && r(ri) == v) ri += 1
        out += v
      } else {
        out += r(ri); ri += 1
      }
      n += 1
    }
    out.result()
  }

  def finish(b: Seq[BucketMember]): Seq[BucketMember] = b

  def bufferEncoder: Encoder[Seq[BucketMember]] =
    ExpressionEncoder[Seq[BucketMember]]()
  def outputEncoder: Encoder[Seq[BucketMember]] =
    ExpressionEncoder[Seq[BucketMember]]()
}

/** A sampled (hash, payload-value) pair, ordered by (h, v) — the
  * bottom-k-by-hash sample unit of graft.sketch.SampleQuantiles. NaN
  * payloads are rejected upstream (their ordering differs across
  * engines).
  */
final case class HashVal(h: Long, v: Double)

/** k smallest distinct (h, v) pairs, ordered lexicographically by
  * (h, v) — the bounded bottom-k sample buffer (≤ k pairs of state per
  * partial, map-side combinable; merge of two sketches ≡ the one-shot
  * sketch of the union).
  */
class SmallestKHashValsAgg(k: Int)
    extends Aggregator[HashVal, Seq[HashVal], Seq[HashVal]] {
  require(k > 0, s"k must be positive, got $k")

  private def lt(a: HashVal, b: HashVal): Boolean =
    a.h < b.h || (a.h == b.h && a.v < b.v)

  def zero: Seq[HashVal] = Nil

  def reduce(b: Seq[HashVal], a: HashVal): Seq[HashVal] = {
    if (b.size >= k && !lt(a, b.last)) b
    else {
      val (lo, hi) = b.span(lt(_, a))
      if (hi.nonEmpty && hi.head == a) b else ((lo :+ a) ++ hi).take(k)
    }
  }

  def merge(l: Seq[HashVal], r: Seq[HashVal]): Seq[HashVal] = {
    val out = Vector.newBuilder[HashVal]
    var li = 0
    var ri = 0
    var n = 0
    while (n < k && (li < l.size || ri < r.size)) {
      val takeLeft = ri >= r.size || (li < l.size && !lt(r(ri), l(li)))
      if (takeLeft) {
        val v = l(li); li += 1
        if (ri < r.size && r(ri) == v) ri += 1
        out += v
      } else {
        out += r(ri); ri += 1
      }
      n += 1
    }
    out.result()
  }

  def finish(b: Seq[HashVal]): Seq[HashVal] = b

  def bufferEncoder: Encoder[Seq[HashVal]] =
    ExpressionEncoder[Seq[HashVal]]()
  def outputEncoder: Encoder[Seq[HashVal]] =
    ExpressionEncoder[Seq[HashVal]]()
}
