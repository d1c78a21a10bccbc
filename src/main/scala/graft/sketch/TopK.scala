package graft.sketch

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Misra–Gries / SpaceSaving-family heavy hitters — the classic
  * bounded-state TOP-K sketch the sketch tier lacked: Count-Min
  * ([[CountMin]]) answers point queries but cannot ENUMERATE the top-k
  * without a candidate set, and exact `groupBy(value).count()` top-k
  * shuffles one partial counter per distinct value per task. The
  * Misra–Gries summary (Misra & Gries 1982; the mergeable-summaries
  * formulation of Agarwal, Cormode, Huang, Phillips, Wei, Yi 2012)
  * keeps k counters TOTAL per partial — the reference's own
  * `Counter.most_common` shape (common_stock.py:195) made 100 TB-safe.
  *
  * Guarantees of the k-counter summary (any stream order, any
  * partitioning, any merge tree — the mergeable-summaries theorem):
  *  - every value with true count > N/(k+1) is present;
  *  - every estimate ĉ_v satisfies c_v − N/(k+1) ≤ ĉ_v ≤ c_v.
  *
  * DETERMINISM — what is and is not order-free, stated honestly:
  * the COUNTER VALUES of any MG/SpaceSaving summary depend on arrival
  * order and merge shape (fold [b,c,a,a] vs [a,b,c,a] with k=1 and the
  * surviving counter differs — no tie rule fixes this), so the raw
  * sketch CANNOT be pinned hash-exact under Spark's free partitioning.
  * [[heavyHitters]] therefore runs the production TWO-PASS shape
  * (Cormode & Hadjieleftheriou 2008 survey, "frequent items" §
  * counter-based): pass 1 = the MG aggregate (bounded k-map state,
  * map-side combinable) yielding ≤ k CANDIDATES whose recall is
  * guaranteed by the theorem above; pass 2 = exact counts of the
  * candidates only (a pushed-down `IN` scan + partial-aggregable
  * count), thresholded at count·phiDenom > N in 64-bit INTEGER
  * arithmetic. Because the threshold 1/phiDenom ≥ 1/(k+1) (enforced),
  * the final output is EXACTLY {v : c_v·phiDenom > N} no matter which
  * extra candidates the sketch happened to retain — bit-identical
  * under repartitioning and replayable by a plain SQL oracle, while
  * everything that crosses the wire stays bounded (k counters per
  * partial, ≤ k candidate strings to the driver, ≤ k exact counts).
  *
  * Scale shape at 100 TB: pass 1 is one scan with constant-size
  * partials (the same class as [[Kmv.sketchAgg]]/[[HyperLogLog]]);
  * the driver state is ≤ k strings (a bounded collect, the
  * [[graft.ops.JoinPlanner]] discipline); pass 2 re-scans with the
  * candidate `IN` filter pushed to the source (row groups without
  * candidates skip) and aggregates ≤ k groups. Two scans beat one
  * corpus-sized shuffle — the BM25 stats-pass argument.
  */
object TopK {

  /** Misra–Gries summary aggregator over a string column: at most k
    * (value → count) counters per buffer.
    *
    *  - `reduce` is the textbook update: bump a live counter, else
    *    occupy a free slot, else decrement ALL k counters by 1 and
    *    discard the arrival (each such event retires k+1 stream items
    *    — the source of the N/(k+1) bound), dropping zeroed counters.
    *  - `merge` is the mergeable-summaries prune: sum counters
    *    pairwise, and if more than k survive, subtract the (k+1)-th
    *    largest combined count from all and keep the strictly-positive
    *    remainder (≤ k by construction; boundary ties all drop — a
    *    count-only rule, no value comparisons needed).
    *  - `finish` orders by (count desc, value asc) — the only place a
    *    value tie-rule exists, and it is deterministic.
    *
    * Inputs must be NON-NULL (the [[SmallestKLongsAgg]] contract —
    * filter upstream; [[heavyHitters]] does).
    */
  class MisraGriesAgg(k: Int)
      extends Aggregator[String, Map[String, Long], Seq[(String, Long)]] {
    require(k >= 1 && k <= 65536, s"k must be in [1, 65536], got $k")

    def zero: Map[String, Long] = Map.empty

    def reduce(b: Map[String, Long], v: String): Map[String, Long] =
      b.get(v) match {
        case Some(c) => b.updated(v, c + 1L)
        case None if b.size < k => b.updated(v, 1L)
        case None => b.collect {
          case (kv, c) if c > 1L => kv -> (c - 1L)
        }
      }

    def merge(l: Map[String, Long],
        r: Map[String, Long]): Map[String, Long] = {
      val sum = r.foldLeft(l) { case (acc, (v, c)) =>
        acc.updated(v, acc.getOrElse(v, 0L) + c)
      }
      if (sum.size <= k) sum
      else {
        // (k+1)-th largest count (duplicates counted); survivors are
        // the counts STRICTLY above it — at most k of those exist
        val arr = sum.valuesIterator.toArray
        java.util.Arrays.sort(arr)
        val t = arr(arr.length - 1 - k)
        sum.collect { case (v, c) if c > t => v -> (c - t) }
      }
    }

    def finish(b: Map[String, Long]): Seq[(String, Long)] =
      b.toSeq.sortBy { case (v, c) => (-c, v) }

    def bufferEncoder: Encoder[Map[String, Long]] =
      ExpressionEncoder[Map[String, Long]]()
    def outputEncoder: Encoder[Seq[(String, Long)]] =
      ExpressionEncoder[Seq[(String, Long)]]()
  }

  /** The raw sketch as an aggregate column: array<struct<_1 value,
    * _2 est>> ordered by (est desc, value asc). Use for inspection and
    * the candidate pass; counter VALUES are order-dependent by nature
    * (see the object doc) — gate hash-exact output through
    * [[heavyHitters]], not this.
    */
  def sketchAgg(value: Column, k: Int): Column = {
    val agg = udaf(new MisraGriesAgg(k))
    agg(value)
  }

  private def requireString(df: DataFrame, value: Column): Unit = {
    val dt = df.select(value).schema.head.dataType
    require(dt == org.apache.spark.sql.types.StringType,
      s"heavy-hitter value column must be string, got $dt — cast " +
        "explicitly upstream (the Kmv.requireIntegral discipline: no " +
        "silent casts)")
  }

  /** Exact-φ heavy hitters via the two-pass MG pipeline described in
    * the object doc: returns EXACTLY the values with
    * count·phiDenom > N (φ = 1/phiDenom), with their exact counts —
    * `(value, cnt, n_total, frac)` ordered by (cnt desc, value asc).
    * Null values are skipped (never counted, never in N).
    *
    * @param k        sketch width (counters per partial); bounds
    *                 driver state and pass-2 candidates
    * @param phiDenom frequency threshold denominator: report values
    *                 occurring in MORE than 1/phiDenom of the rows.
    *                 Must be ≤ k+1 — that inequality IS the MG recall
    *                 guarantee; a larger denominator would ask the
    *                 sketch for values it is allowed to have dropped.
    */
  def heavyHitters(df: DataFrame, valueCol: String, k: Int,
      phiDenom: Long): DataFrame = {
    require(phiDenom >= 2, s"phiDenom must be >= 2, got $phiDenom")
    require(phiDenom <= k + 1L,
      s"phiDenom must be <= k+1 (= ${k + 1L}) for the Misra-Gries " +
        s"recall guarantee, got $phiDenom")
    requireString(df, col(valueCol))
    val in = df.filter(col(valueCol).isNotNull)
      .select(col(valueCol).as("__v"))
    // pass 1: bounded sketch + exact N in ONE scan; ≤ k candidate
    // strings ever reach the driver
    val row = in.agg(sketchAgg(col("__v"), k).as("__cand"),
      count(lit(1)).as("__n")).collect()(0)
    val n = row.getLong(1)
    val cands = row.getSeq[org.apache.spark.sql.Row](0).map(_.getString(0))
    if (cands.isEmpty || n == 0L)
      return in.sparkSession.emptyDataFrame
        .withColumn("value", lit(null).cast("string"))
        .withColumn("cnt", lit(null).cast("long"))
        .withColumn("n_total", lit(null).cast("long"))
        .withColumn("frac", lit(null).cast("double"))
        .limit(0)
    // pass 2: exact counts of the candidates only — the IN filter is
    // a data-source pushdown (bounded by k), the aggregate has ≤ k
    // groups; the integer cross-multiplication avoids any float
    // threshold (cnt·phiDenom stays far below 2^63 for any real φ)
    in.filter(col("__v").isin(cands: _*))
      .groupBy(col("__v").as("value"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * lit(phiDenom) > lit(n))
      .select(col("value"), col("cnt"),
        lit(n).as("n_total"),
        (col("cnt").cast("double") / lit(n).cast("double")).as("frac"))
      .orderBy(col("cnt").desc, col("value"))
  }
}
