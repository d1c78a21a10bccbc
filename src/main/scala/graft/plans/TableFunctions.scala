package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{BooleanType, DataType, DecimalType, DoubleType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

import graft.dedup.Dedup
import graft.ops.Joins

/** SQL table-valued surface for the whole-relation operators the
  * expression registry cannot carry (they produce a plan, not a column):
  *
  * {{{
  * SELECT * FROM asof_join('trades', 'quotes', 'ticker', 't', 't')
  * SELECT * FROM asof_join('trades', 'quotes', 'ticker', 't', 't',
  *                         'forward', 5000000)   -- direction, tolerance µs
  * SELECT * FROM range_join('events', 'ts', 'windows', 'w_start', 'w_end',
  *                          60)                  -- bucket seconds
  * SELECT * FROM range_join('events', 'ts', 'windows', 'w_start', 'w_end',
  *                          60, 'ticker')        -- + equi-keys
  * -- LLM-pipeline tier: verified near-dup pairs, benchmark
  * -- decontamination, repeated-n-gram scrub — same engines as the
  * -- Scala API, so a pure-SQL pipeline can be composed end-to-end:
  * SELECT * FROM minhash_near_dups('documents', 'doc_id', 'text')
  * SELECT * FROM minhash_near_dups('documents', 'doc_id', 'text',
  *                                 3, 32, 8, 0.8)  -- shingle n, hashes,
  *                                                 -- bands, threshold
  * SELECT * FROM decontaminate('documents', 'doc_id', 'text',
  *                             'bench', 'q_id', 'question')
  * SELECT * FROM decontaminate('documents', 'doc_id', 'text',
  *                             'bench', 'q_id', 'question',
  *                             3, 2)               -- shingle n, min overlap
  * SELECT * FROM scrub_repeated_ngrams('documents', 'doc_id', 'text')
  * SELECT * FROM scrub_repeated_ngrams('documents', 'doc_id', 'text',
  *                                     10, 1, true) -- gram width, max df,
  *                                                  -- keep first copy
  * SELECT * FROM bm25_topk('documents', 'doc_id', 'text',
  *                         'queries', 'q_id', 'q_text', 5)
  * SELECT * FROM bm25_topk('documents', 'doc_id', 'text',
  *                         'queries', 'q_id', 'q_text', 5,
  *                         1.2, 0.75, 0.5)          -- k1, b, max df frac
  * SELECT * FROM bm25_probe_topk('postings', 'stats',  -- persisted index
  *                               'queries', 'q_id', 'q_text', 5)
  * SELECT * FROM profile_numeric('lineitem', 'l_quantity, l_tax')
  * SELECT * FROM profile_numeric('lineitem', 'l_tax', false) -- HLL mode
  * SELECT * FROM profile_numeric('lineitem', 'l_tax', true,
  *                               'decimal(18,2)')    -- sum accumulator
  * SELECT * FROM key_skew('events', 'user_id', 10, 1.2) -- topN, hot factor
  * -- embedding tier (vector column must be array<double>/array<float>):
  * SELECT * FROM semantic_near_dups('emb', 'vec_id', 'embedding', 0.9)
  * SELECT * FROM semantic_near_dups('emb', 'vec_id', 'embedding', 0.9,
  *                                  16, 64)         -- n centroids, max cell
  * SELECT * FROM knn_classify('emb', 'vec_id', 'embedding', 'label',
  *                            'probes', 'vec_id', 'embedding', 5)
  * -- round-9 tier: RAG chunking, the soft duplication profile, and
  * -- seed-personalized PageRank (TrustRank):
  * SELECT * FROM sliding_chunks('documents', 'doc_id', 'text', 64, 48)
  * SELECT * FROM dup_gram_fraction('documents', 'doc_id', 'text')
  * SELECT * FROM dup_gram_fraction('documents', 'doc_id', 'text',
  *                                 10, 1)          -- gram width, max df
  * SELECT * FROM trustrank('edges', 'src', 'dst', 'seeds', 'node', 8)
  * SELECT * FROM trustrank('edges', 'src', 'dst', 'seeds', 'node', 8,
  *                         0.85)                   -- damping
  * SELECT * FROM label_propagation('edges', 'src', 'dst', 4)
  * -- round-10: distributed Lloyd k-means (train / assign / assign
  * -- under a persisted model table):
  * SELECT * FROM kmeans_centroids('emb', 'vec_id', 'embedding', 64, 16, 4)
  * SELECT * FROM kmeans_assign('emb', 'vec_id', 'embedding', 64, 16, 4)
  * SELECT * FROM kmeans_assign_model('emb', 'vec_id', 'embedding', 64,
  *                                   'model')      -- kmeans_centroids shape
  * }}}
  *
  * Table arguments are names resolved against the calling session's
  * catalog (temp views included) at analysis time; key lists are
  * comma-separated. The plan each call returns IS the plan the Scala
  * operator builds — the one-shuffle union+window as-of formulation and
  * the bucket-exploded range join — so the SQL surface inherits the same
  * scale contract (no pair explosion, fan-out guard included;
  * SqlTableFunctionsSpec pins SQL-vs-Scala parity).
  *
  * Registered by [[graft.GraftExtensions]] alongside the scalar
  * expressions — via `withExtensions` (injectTableFunction) or
  * `GraftExtensions.register(spark)` on a live session.
  */
object TableFunctions {

  private def str(e: Expression, what: String): String = e match {
    case Literal(s: UTF8String, StringType) if s != null => s.toString
    case other => throw new IllegalArgumentException(
      s"$what must be a string literal, got $other")
  }

  private def lng(e: Expression, what: String): Long = e match {
    case Literal(v: Long, LongType) => v
    case Literal(v: Int, IntegerType) => v.toLong
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def int(e: Expression, what: String): Int = {
    val v = lng(e, what)
    if (v < Int.MinValue || v > Int.MaxValue)
      throw new IllegalArgumentException(
        s"$what is out of Int range: $v")
    v.toInt
  }

  /** SQL fractional literals parse as exact decimals (`0.8` is
    * DECIMAL(1,1)), so a threshold argument must accept decimal, double,
    * and integral literal forms.
    */
  private def dbl(e: Expression, what: String): Double = e match {
    case Literal(v: Double, DoubleType) => v
    case Literal(v: org.apache.spark.sql.types.Decimal, _: DecimalType) =>
      v.toDouble
    case Literal(v: Long, LongType) => v.toDouble
    case Literal(v: Int, IntegerType) => v.toDouble
    case other => throw new IllegalArgumentException(
      s"$what must be a numeric literal, got $other")
  }

  private def bool(e: Expression, what: String): Boolean = e match {
    case Literal(v: Boolean, BooleanType) => v
    case other => throw new IllegalArgumentException(
      s"$what must be a boolean literal, got $other")
  }

  private def keyList(s: String): Seq[String] =
    s.split(",").map(_.trim).filter(_.nonEmpty).toSeq

  /** "name:frac,name:frac" split-fraction list (hash_split /
    * group_split); Sampling.splitColumn validates the fractions sum. */
  private def fractions(s: String): Seq[(String, Double)] =
    keyList(s).map { p =>
      val i = p.lastIndexOf(':')
      if (i <= 0 || i >= p.length - 1)
        throw new IllegalArgumentException(
          s"split fraction entry '$p' must be name:fraction")
      val frac =
        try p.substring(i + 1).toDouble
        catch {
          case _: NumberFormatException =>
            throw new IllegalArgumentException(
              s"split fraction entry '$p' must be name:fraction " +
                s"(got non-numeric fraction '${p.substring(i + 1)}')")
        }
      (p.substring(0, i), frac)
    }

  /** The union-coerced common type of two columns — pure schema
    * analysis (no jobs); the node type the graph operators emit.
    */
  private def unionType(df: DataFrame, a: String, b: String): DataType =
    df.select(col(a).as("__t")).union(df.select(col(b).as("__t")))
      .schema("__t").dataType

  private def arity(name: String, args: Seq[Expression], lo: Int,
      hi: Int): Unit =
    if (args.length < lo || args.length > hi)
      throw new IllegalArgumentException(
        s"$name expects $lo to $hi arguments, got ${args.length}")

  /** name -> builder, shape-compatible with both
    * `SparkSessionExtensions.injectTableFunction` and
    * `tableFunctionRegistry.createOrReplaceTempFunction`. The builder
    * runs on the driver during analysis: it resolves the named tables on
    * the active session, delegates to the Scala operator, and hands the
    * analyzed subplan to the outer query.
    */
  val registrations: Seq[(String, Seq[Expression] => LogicalPlan)] = Seq(
    "asof_join" -> (args => {
      arity("asof_join", args, 5, 7)
      val spark = SparkSession.active
      val direction =
        if (args.length >= 6) str(args(5), "direction") else "backward"
      val tolerance =
        if (args.length == 7) Some(lng(args(6), "tolerance_us")) else None
      Joins.asofJoin(
        spark.table(str(args(0), "left table name")),
        spark.table(str(args(1), "right table name")),
        keyList(str(args(2), "key list")),
        str(args(3), "left time column"),
        str(args(4), "right time column"),
        direction, tolerance).queryExecution.analyzed
    }),
    "range_join" -> (args => {
      arity("range_join", args, 6, 7)
      val spark = SparkSession.active
      val extraKeys =
        if (args.length == 7) keyList(str(args(6), "key list")) else Nil
      Joins.rangeJoin(
        spark.table(str(args(0), "probe table name")),
        str(args(1), "probe time column"),
        spark.table(str(args(2), "interval table name")),
        str(args(3), "interval start column"),
        str(args(4), "interval end column"),
        lng(args(5), "bucket seconds"),
        extraKeys).queryExecution.analyzed
    }),
    // LLM-pipeline tier. Same bucketed/bounded engines as the Scala API
    // (the builder delegates, so plan shape and scale contract are
    // identical); defaults mirror the Scala defaults. Note that
    // scrub_repeated_ngrams (its covered-positions checkpoint) and the
    // bm25_topk / bm25_probe_topk functions (the pruned-postings
    // lineage cut, plus the probe's bounded query-term collect) run
    // Spark jobs when the SQL statement is ANALYZED rather than when
    // the result is consumed — same total cost, earlier timing, and the
    // materialized postings are frozen into the plan (re-issue the
    // statement after the corpus table changes).
    "minhash_near_dups" -> (args => {
      arity("minhash_near_dups", args, 3, 7)
      val spark = SparkSession.active
      Dedup.minhashNearDups(
        spark.table(str(args(0), "docs table name")),
        str(args(1), "id column"),
        str(args(2), "text column"),
        shingleSize =
          if (args.length >= 4) int(args(3), "shingle size") else 3,
        numHashes =
          if (args.length >= 5) int(args(4), "num hashes") else 32,
        bands = if (args.length >= 6) int(args(5), "bands") else 8,
        threshold =
          if (args.length == 7) dbl(args(6), "jaccard threshold") else 0.8)
        .queryExecution.analyzed
    }),
    "lsh_plan" -> (args => {
      // pure decision function (no tables): the one-row plan the
      // S-curve planner picks for (num_hashes, threshold) — compose
      // its bands output into minhash_near_dups by hand or via the
      // Scala minhashNearDupsPlanned
      arity("lsh_plan", args, 2, 2)
      val spark = SparkSession.active
      import spark.implicits._
      val p = Dedup.lshPlan(int(args(0), "num hashes"),
        dbl(args(1), "jaccard threshold"))
      Seq((p.numHashes, p.threshold, p.bands, p.rowsPerBand,
          p.inflection, p.pCollide))
        .toDF("num_hashes", "threshold", "bands", "rows_per_band",
          "inflection", "p_collide")
        .queryExecution.analyzed
    }),
    "decontaminate" -> (args => {
      arity("decontaminate", args, 6, 8)
      val spark = SparkSession.active
      Dedup.decontaminate(
        spark.table(str(args(0), "docs table name")),
        str(args(1), "doc id column"),
        str(args(2), "doc text column"),
        spark.table(str(args(3), "bench table name")),
        str(args(4), "bench id column"),
        str(args(5), "bench text column"),
        shingleSize =
          if (args.length >= 7) int(args(6), "shingle size") else 3,
        minOverlap =
          if (args.length == 8) int(args(7), "min overlap") else 2)
        .queryExecution.analyzed
    }),
    "scrub_repeated_ngrams" -> (args => {
      arity("scrub_repeated_ngrams", args, 3, 6)
      val spark = SparkSession.active
      Dedup.scrubRepeatedNgrams(
        spark.table(str(args(0), "docs table name")),
        str(args(1), "id column"),
        str(args(2), "text column"),
        n = if (args.length >= 4) int(args(3), "gram width") else 10,
        maxDocs = if (args.length >= 5) int(args(4), "max docs") else 1,
        keepFirstCopy =
          if (args.length == 6) bool(args(5), "keep first copy") else false)
        .queryExecution.analyzed
    }),
    "bm25_topk" -> (args => {
      arity("bm25_topk", args, 7, 10)
      val spark = SparkSession.active
      graft.text.Retrieval.bm25TopK(
        spark.table(str(args(0), "corpus table name")),
        str(args(1), "corpus id column"),
        str(args(2), "corpus text column"),
        spark.table(str(args(3), "queries table name")),
        str(args(4), "query id column"),
        str(args(5), "query text column"),
        k = int(args(6), "k"),
        k1 = if (args.length >= 8) dbl(args(7), "k1") else 1.2,
        b = if (args.length >= 9) dbl(args(8), "b") else 0.75,
        maxDfFrac =
          if (args.length == 10) dbl(args(9), "max df fraction") else 1.0)
        .queryExecution.analyzed
    }),
    "bm25_probe_topk" -> (args => {
      arity("bm25_probe_topk", args, 6, 9)
      val spark = SparkSession.active
      graft.text.Retrieval.bm25ProbeIndex(
        spark.table(str(args(0), "postings table name")),
        spark.table(str(args(1), "stats table name")),
        spark.table(str(args(2), "queries table name")),
        str(args(3), "query id column"),
        str(args(4), "query text column"),
        k = int(args(5), "k"),
        k1 = if (args.length >= 7) dbl(args(6), "k1") else 1.2,
        b = if (args.length >= 8) dbl(args(7), "b") else 0.75,
        maxDfFrac =
          if (args.length == 9) dbl(args(8), "max df fraction") else 1.0)
        .queryExecution.analyzed
    }),
    "profile_numeric" -> (args => {
      arity("profile_numeric", args, 2, 4)
      val spark = SparkSession.active
      graft.ops.Profile.profileNumeric(
        spark.table(str(args(0), "table name")),
        keyList(str(args(1), "column list")),
        exact = if (args.length >= 3) bool(args(2), "exact") else true,
        sumType = if (args.length == 4) str(args(3), "sum type")
          else "decimal(38,6)")
        .queryExecution.analyzed
    }),
    "key_skew" -> (args => {
      arity("key_skew", args, 2, 4)
      val spark = SparkSession.active
      graft.ops.Profile.keySkew(
        spark.table(str(args(0), "table name")),
        keyList(str(args(1), "key list")),
        topN = if (args.length >= 3) int(args(2), "top n") else 20,
        hotFactor =
          if (args.length == 4) dbl(args(3), "hot factor") else 10.0)
        .queryExecution.analyzed
    }),
    // embedding tier: the vector column must already be array<double> /
    // array<float> (CAST in the view if the table stores another type)
    "semantic_near_dups" -> (args => {
      arity("semantic_near_dups", args, 4, 6)
      val spark = SparkSession.active
      graft.sim.Similarity.semanticNearDups(
        spark.table(str(args(0), "embeddings table name")),
        str(args(1), "id column"),
        str(args(2), "vector column"),
        threshold = dbl(args(3), "cosine threshold"),
        nCentroids =
          if (args.length >= 5) int(args(4), "n centroids") else 16,
        maxCell = if (args.length == 6) int(args(5), "max cell") else 64)
        .queryExecution.analyzed
    }),
    "knn_classify" -> (args => {
      arity("knn_classify", args, 8, 8)
      val spark = SparkSession.active
      graft.sim.Similarity.knnClassify(
        spark.table(str(args(0), "corpus table name")),
        str(args(1), "corpus id column"),
        str(args(2), "corpus vector column"),
        str(args(3), "label column"),
        spark.table(str(args(4), "queries table name")),
        str(args(5), "query id column"),
        str(args(6), "query vector column"),
        k = int(args(7), "k"))
        .queryExecution.analyzed
    }),
    // round-8 tiers. pagerank / nb_classify / bpe_token_frequencies
    // TRAIN a bounded driver model while BUILDING their DataFrame, so
    // they return a DeferredBuildPlan: analysis (and EXPLAIN) only
    // derives the output schema from the input tables — the training
    // jobs run at first execution (see graft.plans.DeferredPlan).
    "pagerank" -> (args => {
      arity("pagerank", args, 4, 6)
      val spark = SparkSession.active
      val edges = spark.table(str(args(0), "edges table name"))
      val srcCol = str(args(1), "src column")
      val dstCol = str(args(2), "dst column")
      val iterations = int(args(3), "iterations")
      val damping =
        if (args.length >= 5) dbl(args(4), "damping") else 0.85
      val cutEvery =
        if (args.length == 6) int(args(5), "cut every") else 10
      DeferredBuildPlan(StructType(Seq(
        StructField("node", unionType(edges, srcCol, dstCol)),
        StructField("pr", DoubleType))), "pagerank",
        () => graft.graph.GraphOps.pageRank(edges, srcCol, dstCol,
          iterations, damping, cutEvery))
    }),
    "nb_classify" -> (args => {
      arity("nb_classify", args, 6, 7)
      val spark = SparkSession.active
      val train = spark.table(str(args(0), "train table name"))
      val trainText = str(args(1), "train text column")
      val labelCol = str(args(2), "label column")
      val docs = spark.table(str(args(3), "docs table name"))
      val idCol = str(args(4), "doc id column")
      val docText = str(args(5), "doc text column")
      // surface column-name typos at ANALYSIS time like every other
      // deferred TVF (schema lookups throw on a missing field) — not
      // deep inside training at first execution
      train.schema(trainText); train.schema(labelCol); docs.schema(docText)
      val maxVocab =
        if (args.length == 7) int(args(6), "max vocab") else 1 << 16
      DeferredBuildPlan(StructType(Seq(
        StructField(idCol, docs.schema(idCol).dataType),
        StructField("pred", StringType),
        StructField("margin", DoubleType))), "nb_classify",
        () => {
          val model = graft.textstats.NaiveBayes.train(train, trainText,
            labelCol, maxVocab = maxVocab)
          graft.textstats.NaiveBayes.classify(docs, idCol, docText,
            model)
        })
    }),
    "bpe_token_frequencies" -> (args => {
      arity("bpe_token_frequencies", args, 3, 4)
      val spark = SparkSession.active
      val docs = spark.table(str(args(0), "docs table name"))
      val textCol = str(args(1), "text column")
      val numMerges = int(args(2), "num merges")
      val maxVocabWords =
        if (args.length == 4) int(args(3), "max vocab words")
        else 1 << 16
      // touch the text column so a bad name fails at analysis, not at
      // first execution
      docs.schema(textCol)
      DeferredBuildPlan(StructType(Seq(
        StructField("token", StringType),
        StructField("n", LongType))), "bpe_token_frequencies",
        () => {
          val merges = graft.text.Bpe.trainMerges(docs, textCol,
            numMerges = numMerges, maxVocabWords = maxVocabWords)
          graft.text.Bpe.tokenFrequencies(docs, textCol, merges)
        })
    }),
    "sample_k_per_group" -> (args => {
      arity("sample_k_per_group", args, 4, 4)
      val spark = SparkSession.active
      graft.ops.Sampling.sampleKPerGroup(
        spark.table(str(args(0), "table name")),
        keyList(str(args(1), "group column list")),
        str(args(2), "id column"),
        k = int(args(3), "k"))
        .queryExecution.analyzed
    }),
    "funnel" -> (args => {
      // ordered-funnel analysis: steps as a comma list, horizon in
      // MICROSECONDS; one row per key with step times + conversion
      arity("funnel", args, 6, 6)
      val spark = SparkSession.active
      graft.ts.TimeSeriesOps.funnel(
        spark.table(str(args(0), "events table name")),
        str(args(1), "key column"),
        str(args(2), "event type column"),
        str(args(3), "timestamp column"),
        keyList(str(args(4), "step list")),
        horizonUs = lng(args(5), "horizon micros"))
        .queryExecution.analyzed
    }),
    "funnel_summary" -> (args => {
      // per-step funnel reporting: reach counts, conversion rates,
      // exact median gap seconds (histogram-median discipline)
      arity("funnel_summary", args, 6, 6)
      val spark = SparkSession.active
      graft.ts.TimeSeriesOps.funnelSummary(
        spark.table(str(args(0), "events table name")),
        str(args(1), "key column"),
        str(args(2), "event type column"),
        str(args(3), "timestamp column"),
        keyList(str(args(4), "step list")),
        horizonUs = lng(args(5), "horizon micros"))
        .queryExecution.analyzed
    }),
    "token_budget" -> (args => {
      // per-domain token-budget fill: keep the maximal score-ranked
      // prefix whose running token total stays within the budget
      arity("token_budget", args, 6, 6)
      val spark = SparkSession.active
      graft.ops.Sampling.tokenBudgetSelect(
        spark.table(str(args(0), "docs table name")),
        str(args(1), "id column"),
        str(args(2), "domain column"),
        str(args(3), "tokens column"),
        str(args(4), "score column"),
        budget = lng(args(5), "token budget"))
        .queryExecution.analyzed
    }),
    "profile_text" -> (args => {
      arity("profile_text", args, 2, 3)
      val spark = SparkSession.active
      graft.ops.Profile.profileText(
        spark.table(str(args(0), "table name")),
        keyList(str(args(1), "column list")),
        exact = if (args.length == 3) bool(args(2), "exact") else true)
        .queryExecution.analyzed
    }),
    "jl_project" -> (args => {
      arity("jl_project", args, 5, 5)
      val spark = SparkSession.active
      graft.sim.Projection.jlProjectTable(
        spark.table(str(args(0), "table name")),
        str(args(1), "id column"),
        str(args(2), "vector column"),
        dim = int(args(3), "input dim"),
        outDim = int(args(4), "output dim"))
        .queryExecution.analyzed
    }),
    // round-9 tier
    "sliding_chunks" -> (args => {
      arity("sliding_chunks", args, 5, 5)
      val spark = SparkSession.active
      graft.text.Chunking.slidingChunks(
        spark.table(str(args(0), "table name")),
        str(args(1), "id column"),
        str(args(2), "text column"),
        chunkWords = int(args(3), "chunk words"),
        strideWords = int(args(4), "stride words"))
        .queryExecution.analyzed
    }),
    "dup_gram_fraction" -> (args => {
      arity("dup_gram_fraction", args, 3, 5)
      val spark = SparkSession.active
      graft.dedup.Dedup.dupGramFraction(
        spark.table(str(args(0), "table name")),
        str(args(1), "id column"),
        str(args(2), "text column"),
        n = if (args.length >= 4) int(args(3), "gram width") else 10,
        maxDocs = if (args.length == 5) int(args(4), "max docs") else 1)
        .queryExecution.analyzed
    }),
    "trustrank" -> (args => {
      arity("trustrank", args, 6, 7)
      val spark = SparkSession.active
      val edges = spark.table(str(args(0), "edges table name"))
      val srcCol = str(args(1), "src column")
      val dstCol = str(args(2), "dst column")
      val seeds = spark.table(str(args(3), "seeds table name"))
      val seedCol = str(args(4), "seed column")
      val iterations = int(args(5), "iterations")
      val damping =
        if (args.length == 7) dbl(args(6), "damping") else 0.85
      seeds.schema(seedCol) // fail fast on a bad seed column name
      DeferredBuildPlan(StructType(Seq(
        StructField("node", unionType(edges, srcCol, dstCol)),
        StructField("pr", DoubleType))), "trustrank",
        () => graft.graph.GraphOps.personalizedPageRank(edges, srcCol,
          dstCol, seeds, seedCol, iterations, damping))
    }),
    "label_propagation" -> (args => {
      arity("label_propagation", args, 4, 4)
      val spark = SparkSession.active
      val edges = spark.table(str(args(0), "edges table name"))
      val srcCol = str(args(1), "src column")
      val dstCol = str(args(2), "dst column")
      val iterations = int(args(3), "iterations")
      val t = unionType(edges, srcCol, dstCol)
      DeferredBuildPlan(StructType(Seq(
        StructField("node", t), StructField("community", t))),
        "label_propagation",
        () => graft.graph.GraphOps.labelPropagation(edges, srcCol,
          dstCol, iterations))
    }),
    // round-10: distributed Lloyd k-means as SQL (deferred like the
    // other model-training TVFs — EXPLAIN launches zero jobs)
    "kmeans_centroids" -> (args => {
      arity("kmeans_centroids", args, 6, 6)
      val spark = SparkSession.active
      val df = spark.table(str(args(0), "table name"))
      val idCol = str(args(1), "id column")
      val vecCol = str(args(2), "vector column")
      val dim = int(args(3), "dim")
      val k = int(args(4), "k")
      val iterations = int(args(5), "iterations")
      df.schema(idCol); df.schema(vecCol) // fail fast at analysis
      DeferredBuildPlan(StructType(Seq(
        StructField("cluster", LongType),
        StructField("dim_idx", LongType),
        StructField("coord", DoubleType),
        StructField("n", LongType))), "kmeans_centroids",
        () => graft.sim.KMeans.kmeansCentroids(df, idCol, vecCol, dim,
          k, iterations))
    }),
    "kmeans_assign" -> (args => {
      arity("kmeans_assign", args, 6, 6)
      val spark = SparkSession.active
      val df = spark.table(str(args(0), "table name"))
      val idCol = str(args(1), "id column")
      val vecCol = str(args(2), "vector column")
      val dim = int(args(3), "dim")
      val k = int(args(4), "k")
      val iterations = int(args(5), "iterations")
      df.schema(vecCol)
      DeferredBuildPlan(StructType(Seq(
        StructField(idCol, df.schema(idCol).dataType),
        StructField("cluster", LongType))), "kmeans_assign",
        () => graft.sim.KMeans.kmeansAssign(df, idCol, vecCol, dim, k,
          iterations))
    }),
    // assignment under a PRECOMPUTED model table — the persisted-model
    // reuse path (KMeans.assignWithCentroids)
    "kmeans_assign_model" -> (args => {
      arity("kmeans_assign_model", args, 5, 5)
      val spark = SparkSession.active
      val df = spark.table(str(args(0), "table name"))
      val idCol = str(args(1), "id column")
      val vecCol = str(args(2), "vector column")
      val dim = int(args(3), "dim")
      val model = spark.table(str(args(4), "centroids table name"))
      df.schema(vecCol)
      model.schema("cluster"); model.schema("dim_idx")
      model.schema("coord") // the kmeansCentroids shape, checked early
      DeferredBuildPlan(StructType(Seq(
        StructField(idCol, df.schema(idCol).dataType),
        StructField("cluster", LongType))), "kmeans_assign_model",
        () => graft.sim.KMeans.assignWithCentroids(df, idCol, vecCol,
          dim, model))
    }),
    // fixed-point logistic-regression quality classifier: training
    // collects T gradient rows, so like every model-training TVF it
    // returns a DeferredBuildPlan — EXPLAIN launches zero jobs
    "logreg_train" -> (args => {
      arity("logreg_train", args, 4, 4)
      val spark = SparkSession.active
      val df = spark.table(str(args(0), "table name"))
      val idCol = str(args(1), "id column")
      val textCol = str(args(2), "text column")
      val iterations = int(args(3), "iterations")
      df.schema(idCol); df.schema(textCol) // fail fast at analysis
      DeferredBuildPlan(StructType(
        (0 until graft.textstats.LogReg.NumFeatures).map(f =>
          StructField(s"w$f", LongType)) :+ StructField("m", LongType)),
        "logreg_train",
        () => graft.textstats.LogReg.trainedWeights(df, idCol, textCol,
          iterations))
    }),
    "logreg_score" -> (args => {
      arity("logreg_score", args, 4, 4)
      val spark = SparkSession.active
      val df = spark.table(str(args(0), "table name"))
      val idCol = str(args(1), "id column")
      val textCol = str(args(2), "text column")
      val iterations = int(args(3), "iterations")
      df.schema(textCol)
      DeferredBuildPlan(StructType(Seq(
        StructField(idCol, df.schema(idCol).dataType),
        StructField("z_fp", LongType), StructField("p_fp", LongType),
        StructField("pred", LongType), StructField("y", LongType))),
        "logreg_score",
        () => graft.textstats.LogReg.trainAndScore(df, idCol, textCol,
          iterations))
    }),
    // KMV/theta distinct sketch: plan-only builders (the aggregation
    // runs when the query runs, nothing collects at build time)
    "kmv_distinct" -> (args => {
      arity("kmv_distinct", args, 3, 3)
      val spark = SparkSession.active
      graft.sketch.Kmv.distinctEstimate(
        spark.table(str(args(0), "table name")),
        col(str(args(1), "value column")),
        k = int(args(2), "k"))
        .queryExecution.analyzed
    }),
    "kmv_setops" -> (args => {
      arity("kmv_setops", args, 4, 4)
      val spark = SparkSession.active
      val vc = str(args(2), "value column")
      graft.sketch.Kmv.setEstimates(
        spark.table(str(args(0), "table A name")),
        spark.table(str(args(1), "table B name")),
        vc, k = int(args(3), "k"))
        .queryExecution.analyzed
    }),
    // cohort retention matrix over an events table (day/week cohorts)
    "cohort_retention" -> (args => {
      arity("cohort_retention", args, 4, 4)
      val spark = SparkSession.active
      graft.ts.TimeSeriesOps.cohortRetention(
        spark.table(str(args(0), "events table name")),
        str(args(1), "user column"),
        str(args(2), "timestamp column"),
        unit = str(args(3), "unit (day|week|month)"))
        .queryExecution.analyzed
    }),
    // deterministic split label from a pure hash of the ROW id — no
    // randomness, append/layout-stable (Sampling.hashSplit). Fractions
    // as "train:0.8,val:0.1,test:0.1".
    "hash_split" -> (args => {
      arity("hash_split", args, 4, 4)
      val spark = SparkSession.active
      graft.ops.Sampling.hashSplit(
        spark.table(str(args(0), "table name")),
        str(args(1), "id column"),
        fractions(str(args(2), "fraction list")),
        denom = int(args(3), "denominator"))
        .queryExecution.analyzed
    }),
    // leakage-safe split: the label hashes a GROUP id (e.g. the
    // near-dup component id), so every member of a group co-assigns
    // to the same split (Sampling.groupAwareSplit)
    "group_split" -> (args => {
      arity("group_split", args, 4, 4)
      val spark = SparkSession.active
      graft.ops.Sampling.groupAwareSplit(
        spark.table(str(args(0), "table name")),
        str(args(1), "group column"),
        fractions(str(args(2), "fraction list")),
        denom = int(args(3), "denominator"))
        .queryExecution.analyzed
    }),
    // deterministic fraction sample: salted hash-of-id acceptance —
    // append/layout-stable, independent samples per salt
    "hash_sample" -> (args => {
      arity("hash_sample", args, 5, 5)
      val spark = SparkSession.active
      graft.ops.Sampling.hashSample(
        spark.table(str(args(0), "table name")),
        str(args(1), "id column"),
        dbl(args(2), "fraction"),
        salt = lng(args(3), "salt"),
        denom = int(args(4), "denominator"))
        .queryExecution.analyzed
    }),
    // per-stratum keep fractions ("en:0.5,zh:0.3" + a default) over
    // the same deterministic id-hash bucket
    "stratified_sample" -> (args => {
      arity("stratified_sample", args, 6, 6)
      val spark = SparkSession.active
      graft.ops.Sampling.stratifiedSample(
        spark.table(str(args(0), "table name")),
        str(args(1), "id column"),
        str(args(2), "stratum column"),
        fractions(str(args(3), "stratum fraction list")),
        defaultFraction = dbl(args(4), "default fraction"),
        denom = int(args(5), "denominator"))
        .queryExecution.analyzed
    }),
    // α-temperature domain mixing (Sampling.temperatureMix): flattens
    // the domain distribution toward uniform as alpha -> 0
    "temperature_mix" -> (args => {
      arity("temperature_mix", args, 5, 5)
      val spark = SparkSession.active
      graft.ops.Sampling.temperatureMix(
        spark.table(str(args(0), "table name")),
        str(args(1), "id column"),
        str(args(2), "domain column"),
        alpha = dbl(args(3), "alpha"),
        targetFraction = dbl(args(4), "target fraction"))
        .queryExecution.analyzed
    }))
}
