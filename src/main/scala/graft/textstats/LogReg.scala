package graft.textstats

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.functions._

/** Deterministic distributed quality classifier: logistic-style
  * regression trained by fixed-point gradient descent with a
  * fast-sigmoid link — EVERY arithmetic step is 64-bit integer
  * (truncating division, pinned clamps), so training and scoring are
  * bit-identical across engines, partitionings and row orders, and the
  * DuckDB oracle can replay the whole training run in SQL (unrolled
  * iteration CTEs, HUGEINT sums). This is the same determinism
  * contract as the k-means tier's fixed-point sums — no float ulp
  * anywhere, not even in the link function:
  *
  *   σ̃(z) = 1/2 + z / (2·(1 + |z|))     (the "fast sigmoid")
  *
  * is computed exactly in fixed point, where the true logistic's exp()
  * would reintroduce libm 1-ulp divergence.
  *
  * Model/units:
  *  - features are SMALL integers (deciles/percentiles of the raw
  *    per-mille ratios, bias x0 = 1) — conditioning them to one scale
  *    is what lets plain batch GD separate in ~12 iterations;
  *  - weights W_f are fixed-point at Scale = 2^20, so the dot product
  *    z = Σ W_f·x_f carries Scale too;
  *  - z is clamped to ±ZCap BEFORE the link (σ̃ is saturated far
  *    earlier) which also bounds every later product away from Long
  *    overflow;
  *  - per-feature gradients G_f = Σ (p − y·Scale)·x_f are summed as
  *    DECIMAL(38,0) (Spark) / HUGEINT (DuckDB) — |e·x| ≤ ~1e8 per
  *    row, safe in a Long up to ~9e10 rows, but the decimal sum keeps
  *    the contract unconditional at any corpus size;
  *  - the update divides by m FIRST (per-doc average step, bounded
  *    regardless of corpus size — scale-proof), then applies the
  *    rational learning rate: W ← W − (LrNum·(G quot m)) quot LrDen.
  *
  * Training is a driver loop of T aggregate jobs (map-side-combinable
  * sums); driver state is k=6 Longs. Scoring is one scan, no shuffle.
  * The rule label (≥ 5% English stopwords among a non-empty token
  * stream) makes the training pipeline self-contained on the raw
  * corpus — swap in curated labels for a real run.
  */
object LogReg {

  /** Weight (and dot-product) fixed-point scale (2^20). */
  val Scale: Long = 1L << 20

  /** |z| clamp before the link function. */
  val ZCap: Long = 1L << 32

  /** Rational learning rate LrNum/LrDen applied to the per-doc average
    * gradient (features are unit-scale, so no unit folding needed).
    */
  val LrNum: Long = 1L
  val LrDen: Long = 2L

  val NumFeatures: Int = 6

  /** Truncating integer division as a column — Spark's `DIV`
    * (IntegralDivide) truncates toward zero, exactly DuckDB's `//` and
    * Java's `/` on Long.
    */
  private def quot(a: Column, b: Column): Column =
    call_function("div", a, b)

  /** Per-doc small-integer features and the rule label.
    * Output: idCol, x0..x5 (LongType), y (LongType 0/1).
    *
    *   x0 bias (1) · x1 token-count centile (cap 10) · x2 mean word
    *   length (chars/token, cap 20) · x3 stopword percentile (0..100)
    *   · x4 chars/1000 (cap 100) · x5 distinct-token decile (0..10)
    */
  def features(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val c = col(textCol)
    val toks = graft.text.TextPipeline.tokenize(c)
    val stopList = TextStats.langMarkers("en")
    val base = df.select(col(idCol),
      length(c).cast("long").as("__chars"),
      size(toks).cast("long").as("__toks"),
      size(filter(toks, t => t.isInCollection(stopList)))
        .cast("long").as("__stops"),
      size(array_distinct(toks)).cast("long").as("__uniq"))
    val safeToks = greatest(col("__toks"), lit(1L))
    base.select(col(idCol),
      lit(1L).as("x0"),
      quot(least(col("__toks"), lit(1000L)), lit(100L)).as("x1"),
      quot(least(quot(col("__chars") * 1000L, safeToks), lit(20000L)),
        lit(1000L)).as("x2"),
      quot(quot(col("__stops") * 1000L, safeToks), lit(10L)).as("x3"),
      quot(least(col("__chars"), lit(100000L)), lit(1000L)).as("x4"),
      quot(quot(col("__uniq") * 1000L, safeToks), lit(100L)).as("x5"),
      when(col("__toks") > 0L && col("__stops") * 20L >= col("__toks"), 1L)
        .otherwise(0L).as("y"))
  }

  /** Clamped fixed-point dot product Σ W_f·x_f (scale Scale). */
  private def zCol(w: Array[Long]): Column = {
    require(w.length == NumFeatures, s"need $NumFeatures weights")
    val raw = (0 until NumFeatures).map(f => col(s"x$f") * lit(w(f)))
      .reduce(_ + _)
    greatest(lit(-ZCap), least(lit(ZCap), raw))
  }

  /** Fast-sigmoid link in Scale fixed point (truncating division). */
  private def pCol(z: Column): Column =
    lit(Scale / 2) + quot(z * lit(Scale), (lit(Scale) + abs(z)) * 2L)

  /** One GD step: exact DECIMAL(38,0) gradient sums, then the pinned
    * integer update on the driver. Returns (newWeights, m).
    */
  private def step(feats: DataFrame, w: Array[Long]): (Array[Long], Long) = {
    val e = (pCol(zCol(w)) - col("y") * lit(Scale)).as("__e")
    val aggs = count(lit(1)).as("__m") +:
      (0 until NumFeatures).map(f =>
        sum((col("__e") * col(s"x$f")).cast("decimal(38,0)")).as(s"__g$f"))
    val row = feats.select(col("y") +: (0 until NumFeatures).map(f =>
        col(s"x$f")): _*)
      .withColumn("__e", e)
      .agg(aggs.head, aggs.tail: _*)
      .collect()(0) // bounded: one row of k+1 cells
    val m = row.getLong(0)
    require(m > 0, "logreg: empty training corpus")
    val next = Array.tabulate(NumFeatures) { f =>
      val g = row.getDecimal(f + 1).toBigInteger
      // quot-by-m FIRST (bounded per-doc average), then the rate —
      // BigInteger divide = truncation, matching Long `/` and DuckDB //
      val avg = g.divide(java.math.BigInteger.valueOf(m)).longValueExact()
      w(f) - (LrNum * avg) / LrDen
    }
    (next, m)
  }

  /** Below this many training docs, the T-round gradient loop replays
    * as ONE task ([[trainLocal]]) — the GraphOps `smallGraphEdges`
    * discipline. At 2^20 docs the single task holds ≤ 56 MB of
    * feature longs; the per-round Long gradient accumulator stays
    * ≤ ~1e14 (|e·x| ≤ ~1e8/row), far from overflow.
    */
  val SmallCorpusDocs: Long = 1L << 20

  /** One-task training replay: the identical fixed-point GD loop run
    * locally over the collected-in-task feature rows. Every step is
    * exact 64-bit integer arithmetic (Java Long `/` truncates toward
    * zero — Spark's DIV and DuckDB's `//`; the gradient sum is
    * order-free and bounded within Long under [[SmallCorpusDocs]]),
    * so the weights are BIT-IDENTICAL to the distributed loop — same
    * disease, same cure as the graph tier: ~12 rounds of aggregate-job
    * scheduling (the measured r14 bottleneck: ts_logreg_score 1.99 s
    * of which ~0.1 s is arithmetic) collapse to one job.
    */
  /** The in-task GD loop over [x0..x5, y] rows — the identical
    * fixed-point arithmetic of [[step]], replayed locally.
    */
  private def gdLoop(xs: Array[Array[Long]],
      iterations: Int): Array[Long] = {
    val m = xs.length.toLong
    var w = Array.fill(NumFeatures)(0L)
    var t = 0
    while (t < iterations) {
      val g = new Array[Long](NumFeatures)
      var r = 0
      while (r < xs.length) {
        val row = xs(r)
        // z = clamp(Σ w_f·x_f): Long mult/add (wraparound-identical
        // to the column arithmetic), then the greatest/least clamp
        var raw = 0L
        var f = 0
        while (f < NumFeatures) { raw += w(f) * row(f); f += 1 }
        val z = math.max(-ZCap, math.min(ZCap, raw))
        val p = Scale / 2 + (z * Scale) / ((Scale + math.abs(z)) * 2L)
        val e = p - row(NumFeatures) * Scale
        f = 0
        while (f < NumFeatures) {
          g(f) = Math.addExact(g(f), e * row(f))
          f += 1
        }
        r += 1
      }
      w = Array.tabulate(NumFeatures)(f =>
        w(f) - (LrNum * (g(f) / m)) / LrDen)
      t += 1
    }
    w
  }

  /** The [x0..x5, y] row array column. */
  private def featRow: Column =
    array((0 until NumFeatures).map(f => col(s"x$f")) :+ col("y"): _*)

  private def trainLocal(feats: DataFrame,
      iterations: Int): (Array[Long], Long) = {
    val spark = feats.sparkSession
    import spark.implicits._
    val out = feats.select(featRow.as("r")).as[Array[Long]]
      .groupByKey(_ => 0).mapGroups { (_, it) =>
        val xs = it.toArray
        gdLoop(xs, iterations) :+ xs.length.toLong
      }.collect()(0) // bounded: one row of k+1 longs
    (out.take(NumFeatures), out(NumFeatures))
  }

  /** One-task train-AND-score replay: the single task runs [[gdLoop]]
    * over its collected rows, then emits every doc's (z, p, pred, y)
    * under the trained weights — ONE tokenize pass for the whole
    * train→score chain (the two-pass form tokenizes the corpus twice:
    * once for the gradient rounds, once for scoring). Output is
    * bit-identical to `score(df, …, train(df, …))`: all arithmetic is
    * the same exact 64-bit integer chain.
    */
  private def scoreLocal[T](feats: DataFrame, idColName: String,
      iterations: Int)(implicit encT: Encoder[T]): DataFrame = {
    val spark = feats.sparkSession
    import spark.implicits._
    implicit val encIn: Encoder[(T, Array[Long])] =
      Encoders.tuple(encT, implicitly[Encoder[Array[Long]]])
    val encOut: Encoder[(T, Long, Long, Long, Long)] =
      Encoders.tuple(encT, Encoders.scalaLong, Encoders.scalaLong,
        Encoders.scalaLong, Encoders.scalaLong)
    feats.select(col(idColName), featRow.as("__r"))
      .as[(T, Array[Long])]
      .groupByKey(_ => 0)(Encoders.scalaInt)
      .flatMapGroups { (_, it) =>
        val rows = it.toArray
        val w = gdLoop(rows.map(_._2), iterations)
        rows.iterator.map { case (id, a) =>
          var raw = 0L
          var f = 0
          while (f < NumFeatures) { raw += w(f) * a(f); f += 1 }
          val z = math.max(-ZCap, math.min(ZCap, raw))
          val p = Scale / 2 + (z * Scale) / ((Scale + math.abs(z)) * 2L)
          (id, z, p, if (z >= 0L) 1L else 0L, a(NumFeatures))
        }
      }(encOut)
      .toDF(idColName, "z_fp", "p_fp", "pred", "y")
  }

  /** Train T iterations from zero weights; returns (weights, m).
    *
    * @param smallCorpusDocs at or below this doc count the whole loop
    *   replays as one task ([[trainLocal]] — bit-identical weights,
    *   one job instead of T); above it the distributed per-round
    *   aggregation runs unchanged. 0 forces the iterative path.
    */
  def train(df: DataFrame, idCol: String, textCol: String,
      iterations: Int = 12,
      smallCorpusDocs: Long = SmallCorpusDocs): (Array[Long], Long) = {
    require(iterations >= 1 && iterations <= 32,
      s"iterations must be in [1, 32], got $iterations")
    // gate on the INPUT row count (features() is filter-free, so doc
    // rows == training rows): for a parquet source this is a metadata
    // count, not a tokenize pass
    val m0 = df.count()
    require(m0 > 0, "logreg: empty training corpus")
    trainCounted(df, idCol, textCol, iterations, smallCorpusDocs, m0)
  }

  /** [[train]] with the gate count already in hand — callers that have
    * counted the corpus (trainAndScore's fallback) must not pay the
    * count scan twice on non-parquet inputs.
    */
  private def trainCounted(df: DataFrame, idCol: String, textCol: String,
      iterations: Int, smallCorpusDocs: Long, m0: Long): (Array[Long],
      Long) = {
    if (m0 <= smallCorpusDocs)
      // no persist on this path: the single task folds the tokenize
      // scan's output directly — ONE corpus pass, two jobs total
      // (the cache-materialization write alone cost ~10× the bare
      // feature scan at sf0.1)
      trainLocal(features(df, idCol, textCol), iterations)
    else {
      // features are iteration-invariant: persist the small (k+2 longs
      // per doc) feature frame so T gradient jobs don't re-tokenize
      // the raw text T times — at corpus scale the cache is
      // ~50 bytes/doc vs re-reading the full text column every
      // iteration
      val feats = features(df, idCol, textCol)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        var w = Array.fill(NumFeatures)(0L)
        var m = 0L
        for (_ <- 0 until iterations) {
          val (nw, nm) = step(feats, w)
          w = nw; m = nm
        }
        (w, m)
      } finally { feats.unpersist() }
    }
  }

  /** Trained weights as a one-row frame (w0..w5, m) — the oracle shape. */
  def trainedWeights(df: DataFrame, idCol: String, textCol: String,
      iterations: Int = 12,
      smallCorpusDocs: Long = SmallCorpusDocs): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val (w, m) = train(df, idCol, textCol, iterations, smallCorpusDocs)
    Seq((w(0), w(1), w(2), w(3), w(4), w(5), m))
      .toDF("w0", "w1", "w2", "w3", "w4", "w5", "m")
  }

  /** Score every doc with a trained model: z and p (Scale fixed
    * point), the decision, and the rule label for audit. One scan, no
    * shuffle — the model rides the plan as literals.
    */
  def score(df: DataFrame, idCol: String, textCol: String,
      w: Array[Long]): DataFrame = {
    val feats = features(df, idCol, textCol)
    val z = zCol(w).as("z_fp")
    feats.select(col(idCol), z, col("y"))
      .select(col(idCol), col("z_fp"), pCol(col("z_fp")).as("p_fp"),
        when(col("z_fp") >= 0L, 1L).otherwise(0L).as("pred"), col("y"))
  }

  /** Train-then-score convenience (the `queries` entry shape). Below
    * the [[SmallCorpusDocs]] gate with a long/string id column, the
    * whole chain replays as ONE task ([[scoreLocal]] — one tokenize
    * pass, bit-identical rows); otherwise train-then-scan.
    */
  def trainAndScore(df: DataFrame, idCol: String, textCol: String,
      iterations: Int = 12,
      smallCorpusDocs: Long = SmallCorpusDocs): DataFrame = {
    require(iterations >= 1 && iterations <= 32,
      s"iterations must be in [1, 32], got $iterations")
    val m0 = df.count()
    require(m0 > 0, "logreg: empty training corpus")
    val feats = features(df, idCol, textCol)
    import org.apache.spark.sql.types.{LongType, StringType}
    val idType = feats.schema.head.dataType
    if (m0 <= smallCorpusDocs && idType == LongType)
      scoreLocal[Long](feats, idCol, iterations)(Encoders.scalaLong)
    else if (m0 <= smallCorpusDocs && idType == StringType)
      scoreLocal[String](feats, idCol, iterations)(Encoders.STRING)
    else
      score(df, idCol, textCol,
        trainCounted(df, idCol, textCol, iterations, smallCorpusDocs,
          m0)._1)
  }

  // ------------------------------------------------------- DuckDB twin

  /** The full training run replayed in pure SQL: feature CTE (same
    * tokenizer fragment as the ts_quality oracle), then one unrolled
    * (gradient, weights) CTE pair per iteration. DuckDB's `//` is
    * truncation-toward-zero like Java Long `/`, its BIGINT sums widen
    * to HUGEINT (the DECIMAL(38,0) twin), and every clamp/cap is
    * replicated verbatim — the weights are bit-equal by construction.
    */
  def oracleCtePrefix(iterations: Int): String = {
    val S = Scale
    val half = Scale / 2
    val cap = ZCap
    val feat =
      s"""lr_tk AS (SELECT doc_id, length(text) AS chars,
         |    list_filter(string_split_regex(lower(text), '\\s+'),
         |      t -> length(t) > 0) AS t
         |  FROM documents),
         |lr_f0 AS (SELECT doc_id, chars, len(t) AS toks,
         |    len(list_filter(t, x -> x IN ('the','of','and','to','in',
         |      'is','that','it','was','for'))) AS stops,
         |    len(list_distinct(t)) AS uniq
         |  FROM lr_tk),
         |lr_feat AS MATERIALIZED (SELECT doc_id,
         |    CAST(1 AS BIGINT) AS x0,
         |    CAST(least(toks, 1000) // 100 AS BIGINT) AS x1,
         |    CAST(least(chars * 1000 // greatest(toks, 1), 20000) // 1000
         |      AS BIGINT) AS x2,
         |    CAST((stops * 1000 // greatest(toks, 1)) // 10 AS BIGINT) AS x3,
         |    CAST(least(chars, 100000) // 1000 AS BIGINT) AS x4,
         |    CAST((uniq * 1000 // greatest(toks, 1)) // 100 AS BIGINT) AS x5,
         |    CAST(CASE WHEN toks > 0 AND stops * 20 >= toks
         |      THEN 1 ELSE 0 END AS BIGINT) AS y
         |  FROM lr_f0),
         |lr_it0 AS (SELECT ${(0 until NumFeatures).map(f =>
             s"CAST(0 AS BIGINT) AS w$f").mkString(", ")})""".stripMargin
    val iters = (1 to iterations).map { i =>
      val dot = (0 until NumFeatures).map(f => s"w.w$f * f.x$f")
        .mkString(" + ")
      val sums = (0 until NumFeatures).map(f =>
        s"sum(e * x$f) AS g$f").mkString(", ")
      val upd = (0 until NumFeatures).map(f =>
        s"CAST(w.w$f - ($LrNum * (g.g$f // g.m)) // $LrDen AS BIGINT) AS w$f")
        .mkString(",\n    ")
      s"""lr_g$i AS MATERIALIZED (SELECT count(*) AS m, $sums
         |  FROM (SELECT x0, x1, x2, x3, x4, x5,
         |      ($half + (z * $S) // (2 * ($S + abs(z)))) - y * $S AS e
         |    FROM (SELECT f.*, greatest(-$cap, least($cap, $dot)) AS z
         |      FROM lr_feat f, lr_it${i - 1} w) q1) q2),
         |lr_it$i AS MATERIALIZED (SELECT
         |    $upd
         |  FROM lr_it${i - 1} w, lr_g$i g)""".stripMargin
    }
    (feat +: iters).mkString(",\n")
  }

  /** ts_logreg_train twin: the trained weight row plus m. */
  def oracleTrainSql(iterations: Int): String =
    s"""WITH ${oracleCtePrefix(iterations)}
       |SELECT w.*, CAST(g.m AS BIGINT) AS m
       |FROM lr_it$iterations w, lr_g$iterations g""".stripMargin

  /** ts_logreg_score twin: per-doc z/p/decision under the trained
    * weights, plus the rule label.
    */
  def oracleScoreSql(iterations: Int): String = {
    val S = Scale
    val half = Scale / 2
    val dot = (0 until NumFeatures).map(f => s"w.w$f * f.x$f")
      .mkString(" + ")
    s"""WITH ${oracleCtePrefix(iterations)}
       |SELECT doc_id, z AS z_fp,
       |  CAST($half + (z * $S) // (2 * ($S + abs(z))) AS BIGINT) AS p_fp,
       |  CAST(CASE WHEN z >= 0 THEN 1 ELSE 0 END AS BIGINT) AS pred, y
       |FROM (SELECT f.doc_id, f.y,
       |    CAST(greatest(-$ZCap, least($ZCap, $dot)) AS BIGINT) AS z
       |  FROM lr_feat f, lr_it$iterations w) q
       |ORDER BY doc_id""".stripMargin
  }
}
