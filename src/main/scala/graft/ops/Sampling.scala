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

  /** Leakage-safe (group-aware) split: the split label is a pure hash
    * of a GROUP id — e.g. the near-dup component id from
    * [[graft.dedup.Dedup.connectedComponents]] survivors, or a source
    * domain — so every member of a group lands in the SAME split. The
    * standard eval-decontamination discipline: splitting near-identical
    * documents by row id leaks train text into the test set. Same
    * determinism contract as [[hashSplit]] (append-stable, layout-free,
    * scan-stage); rows with a NULL group cannot be co-assigned and are
    * rejected loudly rather than silently scattered.
    */
  def groupAwareSplit(df: DataFrame, groupCol: String,
      fractions: Seq[(String, Double)], denom: Int = 10000): DataFrame =
    df.withColumn("split", splitColumn(
      when(col(groupCol).isNotNull, col(groupCol))
        .otherwise(raise_error(lit(s"groupAwareSplit: null $groupCol — " +
          "a null group cannot be co-assigned; fill or drop first"))),
      fractions, denom))

  /** Deterministic `fraction` sample: keep rows whose salted hash bucket
    * falls under the fraction. Different salts give independent samples.
    */
  def hashSample(df: DataFrame, idCol: String, fraction: Double,
      salt: Long = 0L, denom: Int = 10000): DataFrame =
    df.filter(pmod(xxhash64(lit(salt), col(idCol)), lit(denom.toLong)) <
      math.round(fraction * denom))

  /** Temperature-weighted domain mixing — the standard multi-source
    * training-mix recipe (the α-temperature sampling of multilingual
    * pretraining, e.g. XLM-R §3.1 / mT5 §3.2): a domain with n_d rows
    * gets target share q_d = n_d^α / Σ_t n_t^α, flattening the natural
    * distribution toward uniform as α → 0. To draw a mixed corpus of
    * ~`targetFraction`·N rows, each domain keeps rows at rate
    * r_d = min(1, targetFraction·N·q_d / n_d) with the same
    * deterministic id-hash acceptance as [[hashSample]] — stable under
    * appends, layouts, and reruns.
    *
    * Scale shape: one map-side-combinable groupBy for the per-domain
    * counts (integers — order-free), the α-power normalization folded
    * over the SORTED domain list inside one row (every float add in a
    * fixed order → deterministic, oracle-checkable), then a broadcast
    * join of the tiny (domain, threshold) table back to the corpus; the
    * accept test is a scan-stage predicate. Domain cardinality must be
    * driver-bounded (it is: sources/languages, not ids) — the collected
    * list never leaves the one-row aggregate.
    *
    * Returns the input rows that survive the mix, plus the domain's
    * integer accept threshold (of `denom`) for inspection. Rows with a
    * NULL domain are dropped (they join no domain's rate — pinned by
    * CurationOpsSpec); map nulls to a sentinel domain first if they
    * should participate.
    */
  def temperatureMix(df: DataFrame, idCol: String, domainCol: String,
      alpha: Double, targetFraction: Double, salt: Long = 0L,
      denom: Int = 1000000): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1], got $alpha")
    require(targetFraction > 0 && targetFraction <= 1,
      s"targetFraction must be in (0, 1], got $targetFraction")
    // (domain, count) sorted by domain inside ONE row: the Σ n^α fold
    // and the total-N sum then run left-to-right over a fixed order, so
    // the thresholds are bit-reproducible on any partitioning.
    // NULL-domain rows are excluded BEFORE the histogram, not just at
    // the join: they can never be drawn, so counting them would inflate
    // N and Z and overstate every real domain's accept rate
    val dc = df.filter(col(domainCol).isNotNull)
      .groupBy(col(domainCol).as("__d")).count()
      .agg(sort_array(collect_list(struct(col("__d"), col("count").as("__n"))))
        .as("__dc"))
      .select(col("__dc"),
        aggregate(transform(col("__dc"), x => pow(x("__n"), lit(alpha))),
          lit(0.0), (a, v) => a + v).as("__z"),
        aggregate(transform(col("__dc"), x => x("__n")),
          lit(0.0), (a, v) => a + v).as("__total"))
      .select(explode(col("__dc")).as("__e"), col("__z"), col("__total"))
      .select(col("__e.__d").as(domainCol),
        // r_d = min(1, targetFraction·N·q_d / n_d), materialized as an
        // integer threshold of `denom` so the accept test is exact
        least(lit(1.0),
          lit(targetFraction) * col("__total") *
            (pow(col("__e.__n"), lit(alpha)) / col("__z")) / col("__e.__n"))
          .as("__r"))
      .select(col(domainCol), round(col("__r") * denom).cast("long")
        .as("mix_threshold"))
    df.join(broadcast(dc), Seq(domainCol))
      .filter(pmod(xxhash64(lit(salt), col(idCol)), lit(denom.toLong)) <
        col("mix_threshold"))
  }

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

  /** Deterministic pseudo-random sample of EXACTLY min(k, |group|) rows
    * per group (ids unique per group — see below) — the per-stratum
    * eyeball/debug sample `TABLESAMPLE` can't give (it re-rolls per run
    * and can't bound per group).
    * Priority = xxhash64(id) (seed 42); the k kept rows are the k
    * smallest (priority, id) pairs, rank 1-based in that order —
    * append-stable: adding rows only ever displaces from the tail.
    *
    * Scale: integral ids run the bounded SmallestKMembersAgg — partial
    * buffers never exceed k, ≤ k rows per task per group cross the
    * exchange, no per-group sort. Other id types take the window
    * formulation (identical output — the established id-type gate).
    * Null ids drop. Ids must be UNIQUE within their group (the
    * BoundedAggs contract): a duplicated id dedups on the bounded path
    * but ranks twice on the window path.
    *
    * Returns the group columns + idCol + `rank`.
    */
  def sampleKPerGroup(df: DataFrame, groupCols: Seq[String],
      idCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    require(groupCols.nonEmpty, "no group columns")
    val idType = df.schema(idCol).dataType
    val rows = df.filter(col(idCol).isNotNull)
    if (graft.dedup.Dedup.integralIdTypes.contains(idType)) {
      val agg = udaf(new graft.functions.SmallestKMembersAgg(k))
      rows.groupBy(groupCols.map(col): _*)
        .agg(agg(xxhash64(col(idCol)), col(idCol).cast("long"))
          .as("__ms"))
        .select(groupCols.map(col) :+
          posexplode(col("__ms")).as(Seq("__p", "__m")): _*)
        .select(groupCols.map(col) :+
          col("__m.fp").cast(idType).as(idCol) :+
          (col("__p") + 1).cast("long").as("rank"): _*)
    } else {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(groupCols.map(col): _*)
        .orderBy(xxhash64(col(idCol)), col(idCol))
      rows.select(groupCols.map(col) :+ col(idCol) :+
          row_number().over(w).cast("long").as("rank"): _*)
        .filter(col("rank") <= k)
    }
  }

  /** Per-domain token-budget selection — the "fill the training mix"
    * step of a pretraining pipeline ("N tokens of web, M of code, …"):
    * within each domain, documents are ranked by (score ROUNDED to 6
    * decimals desc, id asc) and the maximal rank-prefix whose running
    * token total stays ≤ `budget` is kept. Documents are atomic: the
    * first doc whose inclusive running sum crosses the budget is
    * dropped along with everything ranked after it (zero-token docs at
    * exactly the boundary still fit). Rows whose id, token count, or
    * score is null (or tokens < 0) cannot be ranked or costed and are
    * excluded. Rows with a NULL domain are excluded too (they form no
    * budgetable domain; and the histogram re-join is null-unsafe, so
    * keeping them would silently drop rather than group them).
    *
    * Scale (the lmQualityBuckets histogram discipline — no domain
    * partition is ever sorted whole): ONE corpus-sized hash aggregation
    * builds the per-(domain, score6) token-sum histogram; cumulative
    * sums run over the HISTOGRAM (distinct rounded scores ≪ documents
    * whenever scores tie); the corpus then joins back on (domain,
    * score6) and the per-TIE-GROUP running sum reuses that exchange —
    * the window sorts tie groups (bounded by tie-group size, spread
    * across tasks), never a domain. Keep test: histogram prefix +
    * in-group running sum ≤ budget — provably the same rows as the
    * direct full-sort cumulative formulation (the DuckDB oracle runs
    * the direct form).
    */
  def tokenBudgetSelect(df: DataFrame, idCol: String, domainCol: String,
      tokensCol: String, scoreCol: String, budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val docs = df.select(col(idCol).as("__id"),
        col(domainCol).as("__dm"),
        col(tokensCol).cast("long").as("__tk"),
        round(col(scoreCol).cast("double"), 6).as("__s"))
      .filter(col("__id").isNotNull && col("__dm").isNotNull &&
        col("__tk").isNotNull && col("__tk") >= 0 && col("__s").isNotNull)
    // per-(domain, score6) token-sum histogram — the one corpus-sized
    // exchange; ties collapse, a hot domain spreads by score
    val hist = docs.groupBy(col("__dm"), col("__s"))
      .agg(sum(col("__tk")).as("__gt"))
    val wCum = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__dm")).orderBy(col("__s").desc)
    val cum = hist.select(col("__dm"), col("__s"),
        (sum(col("__gt")).over(wCum) - col("__gt")).as("__cs"))
    // join on (domain, score6); the tie window reuses the partitioning
    val wTie = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__dm"), col("__s")).orderBy(col("__id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    docs.join(cum, Seq("__dm", "__s"))
      .withColumn("__run", col("__cs") + sum(col("__tk")).over(wTie))
      .filter(col("__run") <= budget)
      .select(col("__id").as(idCol), col("__dm").as(domainCol),
        col("__tk").as("n_tokens"))
  }

  /** PRIORITY SAMPLING (Duffield–Lund–Thorup, JACM 2007): a fixed-size
    * weighted without-replacement sample with an unbiased subset-sum
    * estimator. Each row draws a hash-uniform u ∈ (0, 1] and a
    * priority `q = w / u`; the k highest-priority rows are the sample,
    * τ is the (k+1)-th priority, and each sampled row's weight
    * estimate is `est_w = max(w, τ)` — `E[Σ est_w over any subset of
    * the sample] = Σ w` over the matching population subset, the
    * property that makes a 64-row sample answer arbitrary weighted
    * queries (domain token totals, cost attribution) at 100 TB. When
    * the population has ≤ k rows, τ is undefined and `est_w = w`
    * (exact regime).
    *
    * Like every sampler in this module, membership is a pure function
    * of the pinned id hash: reruns, layout changes and appends never
    * re-roll prior draws. u = (unsigned xxhash64(id) → DOUBLE
    * correctly rounded, + 1)·2⁻⁶⁴, so q = w·2⁶⁴/(u64+1) in three IEEE
    * ops the DuckDB twin replays bit-for-bit; ties break on id.
    *
    * Shape: the top-(k+1) is a bounded TakeOrderedAndProject (per-
    * partition k+1-heaps, one tiny final merge — no corpus sort, no
    * shuffle of the data); the τ/estimate windows run over the k+1
    * survivor rows only. Rows with null id/weight or weight ≤ 0 are
    * excluded (a zero weight has q = 0 and zero inclusion probability
    * anyway; DuckDB's x/0.0 is NULL where Spark gives Infinity, so the
    * exclusion also pins the twin). The id column must be INTEGRAL —
    * the pinned xxhash64-of-long domain (see [[graft.sketch.Kmv]]).
    */
  def prioritySample(df: DataFrame, idCol: String, weightCol: String,
      k: Int): DataFrame = {
    require(k >= 1 && k <= 1000000, s"k must be in [1, 1e6], got $k")
    import graft.sketch.Kmv
    val ud = Kmv.unsignedDouble(Kmv.flippedHash(col(idCol)))
    val q = col(weightCol).cast("double") * lit(Kmv.TwoPow64) /
      (ud + lit(1.0))
    val top = df
      .filter(col(idCol).isNotNull && col(weightCol).isNotNull &&
        col(weightCol) > 0)
      .select(col(idCol), col(weightCol), q.as("__q"))
      .orderBy(col("__q").desc, col(idCol))
      .limit(k + 1)
    // both windows see <= k+1 rows — bounded, never the corpus
    val ord = org.apache.spark.sql.expressions.Window
      .orderBy(col("__q").desc, col(idCol))
    val all = org.apache.spark.sql.expressions.Window.partitionBy()
      .rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    top
      .withColumn("__rn", row_number().over(ord))
      .withColumn("__tau",
        max(when(col("__rn") === k + 1, col("__q"))).over(all))
      .filter(col("__rn") <= k)
      .select(col(idCol), col(weightCol), col("__q").as("priority"),
        when(col("__tau").isNull, col(weightCol).cast("double"))
          .otherwise(greatest(col(weightCol).cast("double"),
            col("__tau"))).as("est_w"))
  }

  /** Per-group [[prioritySample]] — k weighted draws PER GROUP with
    * each group's own τ and max(w, τ) estimator: the weighted
    * domain-mixing primitive ([[temperatureMix]] reweights whole
    * domains; this samples WITHIN each domain proportional to row
    * weight, e.g. k documents per language weighted by tokens, with
    * unbiased per-domain token totals from the sample alone).
    *
    * Shape: one hash shuffle on the group key; the rank is a
    * WindowGroupLimit top-(k+1) (per-partition per-group bounded
    * heaps before the exchange — never a full per-group sort
    * materialization), and τ rides the same partitioning as a
    * one-value window. Same pinned hash-uniform priority and null /
    * non-positive-weight exclusions as [[prioritySample]].
    */
  def prioritySamplePerGroup(df: DataFrame, groupCol: String,
      idCol: String, weightCol: String, k: Int): DataFrame = {
    require(k >= 1 && k <= 1000000, s"k must be in [1, 1e6], got $k")
    import graft.sketch.Kmv
    val ud = Kmv.unsignedDouble(Kmv.flippedHash(col(idCol)))
    val q = col(weightCol).cast("double") * lit(Kmv.TwoPow64) /
      (ud + lit(1.0))
    val ord = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(col("__q").desc, col(idCol))
    val grp = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    df.filter(col(groupCol).isNotNull && col(idCol).isNotNull &&
        col(weightCol).isNotNull && col(weightCol) > 0)
      .select(col(groupCol), col(idCol), col(weightCol), q.as("__q"))
      .withColumn("__rn", row_number().over(ord))
      .filter(col("__rn") <= k + 1) // WindowGroupLimit bounds the sort
      .withColumn("__tau",
        max(when(col("__rn") === k + 1, col("__q"))).over(grp))
      .filter(col("__rn") <= k)
      .select(col(groupCol), col(idCol), col(weightCol),
        col("__q").as("priority"),
        when(col("__tau").isNull, col(weightCol).cast("double"))
          .otherwise(greatest(col(weightCol).cast("double"),
            col("__tau"))).as("est_w"))
  }
}
