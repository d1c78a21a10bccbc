package graft

import org.apache.spark.sql.catalyst.plans.logical.Filter
import org.apache.spark.sql.functions.{col, concat, lit}

/** Pins the load-bearing physical/optimized plan shapes that the
  * performance story depends on — the properties PLANS.md documents but
  * only a test can keep true:
  *  - dd_editdist's lossless L1 bound must sit BEFORE the banded
  *    Levenshtein in the same conjunction (And short-circuits left to
  *    right, so ordering decides whether the ~256x-costlier DP runs on
  *    pruned pairs);
  *  - the similarity ranking must be the partial-aggregating k-heap
  *    (map-side combine before the exchange), not a ranking window;
  *  - the bounded bucket aggregations must plan with partial
  *    aggregation (the memory contract lives in the partial buffers);
  *  - scans must push filters and prune columns, dimension joins must
  *    broadcast, grouped aggs must map-side combine, and the composite
  *    clean-corpus pipeline must keep its single window shuffle.
  */
class PlanPinSpec extends SparkTestBase {

  test("dd_editdist: L1 bound prunes inside the candidate build, " +
      "the banded DP sees survivors only") {
    // round 16: the L1-pruned candidate list is a session-memoized
    // build, so the ordering guarantee is structural — the counting
    // bound lives in the candidate plan, the DP in the consuming plan
    // that reads the (pruned) candidates. Pin both halves.
    import org.apache.spark.sql.{functions => F}
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val capped = docs.select(col("doc_id").as("id"),
        F.substring(col("text"), 1, 256).as("px"), col("lang"),
        F.floor(F.length(col("text")) / 16).cast("long").as("lb"))
      .withColumn("hist",
        graft.functions.HashFunctions.charHist64(col("px")))
    val cplan = graft.dedup.Dedup
      .editDistanceCandidatesFrom(capped, maxDist = 25)
      .queryExecution.optimizedPlan.toString
    assert(cplan.contains("long_array_l1") &&
      !cplan.contains("levenshtein"),
      s"the candidate build must carry the L1 bound and no DP:\n$cplan")
    val qplan = SparkEntry.queries("dd_editdist")(spark, sf0001)
      .queryExecution.optimizedPlan.toString
    assert(qplan.contains("levenshtein"),
      s"the gate query must run the banded DP live:\n$qplan")
    assert(!qplan.contains("long_array_l1"),
      s"the L1 bound must already be applied in the memoized " +
        s"candidates:\n$qplan")
  }

  test("j9_asof_join: union+window formulation, never a pair-exploding join") {
    // the as-of join's scale contract is that it is NOT a join at all:
    // both sides union and a single keyed window carries the latest quote
    // forward, so the plan must show a Window and NO join operator (a
    // rewrite into a range/theta join would surface SortMergeJoin,
    // BroadcastNestedLoopJoin or CartesianProduct and explode on dense
    // quotes), with at most 3 exchanges: quote groupBy, the window
    // partitioning, and the final presentation orderBy.
    val plan = SparkEntry.queries("j9_asof_join")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Window"), "as-of must be the window formulation")
    assert(!plan.contains("Join") && !plan.contains("CartesianProduct"),
      s"as-of join must not plan a join operator:\n$plan")
    val exchanges = "(?m)^\\s*[+:*-]*\\s*\\(?\\d*\\)?\\s*Exchange".r
      .findAllIn(plan).size
    assert(exchanges <= 3,
      s"as-of join grew extra shuffles ($exchanges > 3):\n$plan")
  }

  test("sim top-k ranks via the partial k-heap aggregation, not a window") {
    for (q <- Seq("sim_cosine_topk", "sim_lsh_topk", "sim_ivf_topk")) {
      val plan = SparkEntry.queries(q)(spark, sf0001)
        .queryExecution.executedPlan.toString
      assert(plan.contains("partial_topkagg"),
        s"$q must partially aggregate the k-heap before the exchange")
      assert(!plan.contains("row_number"),
        s"$q must not rank with a window: every scored candidate would shuffle")
    }
  }

  test("p2_project_filter: predicates pushed to the scan, columns pruned") {
    val plan = SparkEntry.queries("p2_project_filter")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: ["),
      "scan must carry pushed filters")
    assert(!plan.contains("PushedFilters: []"),
      s"filters must actually reach the parquet scan:\n$plan")
    // 6 of lineitem's 11 columns: the projection must prune the scan
    val readSchema = "ReadSchema: struct<([^>]*)>".r
      .findFirstMatchIn(plan).map(_.group(1)).getOrElse("")
    val nCols = readSchema.split(",").count(_.contains(":"))
    assert(nCols <= 6, s"scan reads $nCols columns, pruning lost: $readSchema")
  }

  test("j1_multi_join: dimension sides broadcast, agg partial") {
    val plan = SparkEntry.queries("j1_multi_join")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"dimension joins must broadcast, not shuffle the fact side:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      "a sort-merge join here means a dimension stopped broadcasting")
    assert(plan.contains("HashAggregate"), "aggregation must be hash-based")
  }

  test("a1_grouped_sum: map-side combine before the exchange") {
    val plan = SparkEntry.queries("a1_grouped_sum")(spark, sf0001)
      .queryExecution.executedPlan.toString
    // partial_sum markers appear in the partial HashAggregate's function
    // list — the map-side combine that keeps the shuffle pre-aggregated
    assert(plan.contains("partial_sum"),
      s"grouped sum must partially aggregate before shuffling:\n$plan")
  }

  test("ts_clean_corpus: the composite pipeline keeps ONE data shuffle") {
    // one hash exchange feeds the dedup-rank window (WindowGroupLimit
    // pre-filtering around it is the rank-limit pushdown, not a shuffle);
    // the only other exchange is the presentation orderBy's range
    // partitioning required by the oracle compare
    val plan = SparkEntry.queries("ts_clean_corpus")(spark, sf0001)
      .queryExecution.executedPlan.toString
    val hashEx = "Exchange hashpartitioning".r.findAllIn(plan).size
    val rangeEx = "Exchange rangepartitioning".r.findAllIn(plan).size
    assert(hashEx == 1 && rangeEx <= 1,
      s"clean-corpus grew extra shuffles (hash=$hashEx, range=$rangeEx):\n$plan")
  }

  test("bounded bucket membership plans with partial aggregation") {
    for ((q, agg) <- Seq(
        "dd_embedding_neardups" -> "partial_smallestklongsagg")) {
      val plan = SparkEntry.queries(q)(spark, sf0001)
        .queryExecution.executedPlan.toString
      assert(plan.contains(agg),
        s"$q must map-side combine its bounded bucket aggregation")
    }
    // dd_simhash's and dd_minhash's banded candidate lists are
    // session-memoized (round 17), so like dd_incremental_minhash
    // below the consuming plans read the materialized table — pin the
    // BUILD plans directly
    val simhashBuild = graft.dedup.Dedup.simhashCandidates(
      spark.read.parquet(s"$sf0001/documents.parquet"), "doc_id", "text",
      chunks = 4, maxBucket = 64)
      .queryExecution.executedPlan.toString
    assert(simhashBuild.contains("partial_smallestkmembersagg"),
      s"the memoized simhash candidate build must map-side combine:\n$simhashBuild")
    val minhashBuild = graft.dedup.Dedup.minhashCandidates(
      spark.read.parquet(s"$sf0001/documents.parquet"), "doc_id", "text",
      shingleSize = 3, numHashes = 32, bands = 16, maxBucket = 64)
      .queryExecution.executedPlan.toString
    assert(minhashBuild.contains("partial_smallestklongsagg"),
      s"the memoized minhash candidate build must map-side combine:\n$minhashBuild")
    // dd_incremental_minhash's bucket capping now runs inside the
    // session-memoized index build (round 16), so the consuming query
    // plan reads the materialized table — pin the BUILD plan directly
    val sigs = graft.dedup.Dedup.minhashSignatures(
      spark.read.parquet(s"$sf0001/documents.parquet"), "doc_id", "text",
      shingleSize = 3, numHashes = 32)
    val buildPlan = graft.dedup.Dedup
      .cappedBuckets(sigs, numHashes = 32, bands = 16, maxBucket = 64)
      .queryExecution.executedPlan.toString
    assert(buildPlan.contains("partial_smallestklongsagg"),
      s"the memoized bucket build must map-side combine:\n$buildPlan")
  }

  test("dd_incremental_minhash: bucket probe is an equi-join, never a product") {
    // the index probe's scale contract: batch rows meet corpus buckets
    // through a hash equi-join on (band, band_hash) — a planner slip into
    // a nested-loop/cartesian product would pair every batch row with
    // every bucket
    val plan = SparkEntry.queries("dd_incremental_minhash")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"index probe must stay an equi-join:\n$plan")
  }

  test("bm25: join-free literal-map fan-out, heap ranking") {
    // the inverted-index probe contract: the query side (df counts +
    // (query, term) pairs) is driver-local by the eval-suite bound, so
    // for long/string query ids it rides the plan as MAP LITERALS and
    // the score+fan-out is a single generator projection — NO join
    // operator at all on the scoring path (a sort-merge slip would
    // shuffle the token stream on term; even a broadcast join costs an
    // exchange job per side) — and ranking is the partial k-heap, not
    // a window
    // ts_bm25_topk's gate row reads the session-memoized shared
    // retrieval run (round 16), so the operator plan is pinned on a
    // DIRECT bm25TopK build; ts_bm25_probe still carries it in-plan
    import org.apache.spark.sql.{functions => F}
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val tkCol = F.filter(F.split(F.lower(col("text")), "\\s+"),
      x => F.length(x) > 0)
    val qs = docs.filter(col("doc_id") % 131 === 0)
      .select(col("doc_id"),
        F.concat_ws(" ", F.slice(tkCol, 1, 8)).as("qt"))
    val direct = graft.text.Retrieval.bm25TopK(docs, "doc_id", "text",
      qs, "doc_id", "qt", k = 5, maxDfFrac = 0.95)
      .queryExecution.executedPlan.toString
    val probePlan = SparkEntry.queries("ts_bm25_probe")(spark, sf0001)
      .queryExecution.executedPlan.toString
    for ((q, plan) <- Seq("bm25TopK(direct)" -> direct,
        "ts_bm25_probe" -> probePlan)) {
      assert(plan.contains("Generate explode"),
        s"$q: the query fan-out must be the literal-map explode:\n$plan")
      assert(!plan.contains("SortMergeJoin"),
        s"$q: nothing corpus-sized may shuffle on term:\n$plan")
      assert(plan.contains("partial_topkagg"),
        s"$q must rank via the partial k-heap aggregation:\n$plan")
      assert(!plan.contains("CartesianProduct") &&
        !plan.contains("BroadcastNestedLoopJoin") ||
        plan.contains("BroadcastNestedLoopJoin BuildRight, Cross"),
        s"$q: only the one-row stats cross join may nest:\n$plan")
    }
  }

  test("sc_profile: exact distincts plan Expand-free") {
    // the Expand plan replicates every input row |cols|+1 times into one
    // mixed hash aggregate — the formulation profileNumeric deliberately
    // avoids (measured ~4x slower); the pair path must also map-side
    // combine its dedup aggregation
    val plan = SparkEntry.queries("sc_profile")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"),
      s"exact profile must stay Expand-free:\n$plan")
    assert(plan.contains("HashAggregate"), s"expected hash aggregation:\n$plan")
  }

  test("sc_skew: top-N is a heap, stats joins broadcast") {
    val plan = SparkEntry.queries("sc_skew")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-N must be the per-task heap, not a global sort:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"the one-row stats frames must broadcast:\n$plan")
  }

  test("ts_bpe_encode: scan-stage encode, dictionary cap is a heap") {
    // the corpus pass must be: scan -> codegen'd bpe_encode -> explode
    // -> one hash aggregation; no join anywhere, and the trainer's
    // dictionary cap is a TakeOrdered (per-task heap), not a full sort
    val plan = SparkEntry.queries("ts_bpe_encode")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("bpe_encode"),
      s"encode must run as the expression in the scan stage:\n$plan")
    assert(!plan.contains("Join"), s"token counting must not join:\n$plan")
    val cap = graft.text.Bpe.wordCounts(
        graft.sources.Sources.readTable(spark, sf0001, "documents"), "text")
      .orderBy(org.apache.spark.sql.functions.col("n").desc,
        org.apache.spark.sql.functions.col("word"))
      .limit(4096).queryExecution.executedPlan.toString
    assert(cap.contains("TakeOrderedAndProject"),
      s"dictionary cap must be a per-task heap:\n$cap")
  }

  test("gr_pagerank: the small gate graph takes the one-task fast " +
      "path; the iterative rounds keep equi-joins + two BOUNDED folds") {
    // round-14: at gate scale the whole iteration is ONE object fold
    // (GraphFastPathSpec pins it bit-identical to the rounds)
    val fast = SparkEntry.queries("gr_pagerank")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(fast.contains("MapGroups"),
      s"the small gate graph must take the single-task fold:\n$fast")
    // the iteration contract ABOVE the bound: the rank frame meets the
    // cut edge list through equi-joins only (never a nested-loop
    // product; AQE picks broadcast at runtime — checkpointed frames
    // carry no static stats), and each of the 6 rounds contributes
    // exactly two folds — the (dst, bucket) level whose buffer is
    // capped at in-degree/srcBuckets, then the per-dst level capped at
    // srcBuckets partials. No aggregation may group on __d alone with
    // raw in-edge structs (the unbounded-hub shape this pin exists to
    // forbid).
    val li = graft.sources.Sources.readTable(spark, sf0001, "lineitem")
      .filter(col("l_partkey") % 50 === 0)
      .select(concat(lit("p"), col("l_partkey")).as("src"),
        concat(lit("s"), col("l_suppkey")).as("dst"))
    val both = li.union(
      li.select(col("dst").as("src"), col("src").as("dst")))
    val plan = graft.graph.GraphOps.pageRank(both, "src", "dst",
        iterations = 6, smallGraphEdges = 0L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"rank joins must stay equi-joins:\n$plan")
    val folds = "collect_list".r.findAllIn(plan).length
    assert(folds >= 12,
      s"expected >= 12 folds (2 bounded levels x 6 rounds):\n$plan")
    assert(plan.contains("__b"),
      s"level-1 folds must group on the (dst, bucket) key:\n$plan")
  }

  test("sim_jl_topk: projection in the scan stage, both rankings heaps") {
    val plan = SparkEntry.queries("sim_jl_topk")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("jl_project"),
      s"projection must run as the codegen'd expression:\n$plan")
    assert(plan.contains("partial_topkagg"),
      s"coarse and rerank rankings must be the bounded k-heap:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"candidates must broadcast back for the rerank:\n$plan")
  }

  test("ts_nb_filter: zero-shuffle scoring, no token-stream join") {
    // the NB score path's scale contract: the model rides the plan as a
    // reference object inside nb_token_scores — the corpus token stream
    // must never join or shuffle; the only exchanges are the widen
    // spread (round-16: the scoring scan reads through ScaleOps.widen,
    // the ts_gopher_filter discipline) and the per-doc pivot aggregation
    val plan = SparkEntry.queries("ts_nb_filter")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("nb_token_scores"),
      s"scoring must run as the codegen'd expression:\n$plan")
    assert(!plan.contains("Join"),
      s"the model must not join against the token stream:\n$plan")
    val hashEx = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(hashEx <= 1,
      s"expected only the pivot aggregation hash exchange, got $hashEx:\n$plan")
  }

  test("ts_chunk_overlap: row-local chunking — no join, only the " +
      "output-sort exchange") {
    val plan = SparkEntry.queries("ts_chunk_overlap")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"chunking must not join:\n$plan")
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges <= 1,
      s"only the final orderBy may exchange, got $exchanges:\n$plan")
  }

  test("ts_dsir_select: zero-shuffle scoring (the log-ratio table " +
      "rides the plan), selection is a TakeOrdered") {
    val plan = SparkEntry.queries("ts_dsir_select")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"),
      s"the bucket model must not join against the token stream:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k selection must be a TakeOrdered, not a global sort:\n$plan")
  }

  test("dd_dup_fraction: single-pass gram kernel, no product joins") {
    val plan = SparkEntry.queries("dd_dup_fraction")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("raw_word_gram_hashes"),
      s"grams must come from the codegen'd byte-range kernel:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"the repeated-gram probe must stay an equi-join:\n$plan")
  }

  test("gr_trustrank: the small gate graph takes the one-task fast " +
      "path; the iterative rounds keep equi-joins + two BOUNDED folds") {
    val fast = SparkEntry.queries("gr_trustrank")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(fast.contains("MapGroups"),
      s"the small gate graph must take the single-task fold:\n$fast")
    val li = graft.sources.Sources.readTable(spark, sf0001, "lineitem")
      .filter(col("l_partkey") % 50 === 0)
      .select(concat(lit("p"), col("l_partkey")).as("src"),
        concat(lit("s"), col("l_suppkey")).as("dst"))
    val both = li.union(
      li.select(col("dst").as("src"), col("src").as("dst")))
    val seeds = graft.sources.Sources.readTable(spark, sf0001, "lineitem")
      .filter(col("l_partkey") % 100 === 0)
      .select(concat(lit("p"), col("l_partkey")).as("seed"))
    val plan = graft.graph.GraphOps.personalizedPageRank(both, "src",
        "dst", seeds, "seed", iterations = 6, smallGraphEdges = 0L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"rank joins must stay equi-joins:\n$plan")
    val folds = "collect_list".r.findAllIn(plan).length
    assert(folds >= 12,
      s"expected >= 12 folds (2 bounded levels x 6 rounds):\n$plan")
    assert(plan.contains("__b"),
      s"level-1 folds must group on the (dst, bucket) key:\n$plan")
  }

  test("ts_gopher_filter: one scan, no join, the widen spread plus " +
      "the presentation sort") {
    // the Gopher stats are the heaviest row-local text computation in
    // the suite, so the row reads through ScaleOps.widen: a narrow
    // (single-row-group) input gains a round-robin spread BEFORE the
    // per-row scoring — measured 1.26 -> 0.57 s at sf0.1 — and an
    // already-wide 100 TB input skips it. Since round 17 the spread is
    // SIZE-ADAPTIVE (bytes / taskTargetBytes): the few-KB sf0.001 test
    // input correctly gets NO spread at the default target, so force a
    // 1-byte target to pin that the spread path still engages
    val plan = SparkEntry.queries("ts_gopher_filter")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"the gate is row-local:\n$plan")
    val exchanges = "(?m)^\\s*[+:*-]*\\s*\\(?\\d*\\)?\\s*Exchange".r
      .findAllIn(plan).size
    assert(exchanges <= 2,
      s"only the widen spread and the final orderBy may shuffle " +
        s"($exchanges > 2):\n$plan")
    spark.conf.set("spark.graft.widen.taskTargetBytes", "1")
    try {
      val forced = SparkEntry.queries("ts_gopher_filter")(spark, sf0001)
        .queryExecution.executedPlan.toString
      assert(forced.contains("RoundRobinPartitioning"),
        s"a byte-starved target must take the widen spread:\n$forced")
    } finally spark.conf.unset("spark.graft.widen.taskTargetBytes")
    // and the size-adaptive default must NOT overshard the tiny input
    assert(!plan.contains("RoundRobinPartitioning"),
      s"a few-KB input must not pay a spread exchange at the default " +
        s"target:\n$plan")
  }

  test("sim_label_centroids: one grouped fixed-point agg, map-side combined") {
    val plan = SparkEntry.queries("sim_label_centroids")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_sum"),
      s"fixed-point sums must combine map-side:\n$plan")
    val exchanges = "(?m)^\\s*[+:*-]*\\s*\\(?\\d*\\)?\\s*Exchange".r
      .findAllIn(plan).size
    assert(exchanges <= 2,
      s"(label, dim) agg + presentation sort only ($exchanges > 2):\n$plan")
  }

  test("kmeans assignment pass is row-local — zero exchanges, no join") {
    // the per-round shuffles are the tiny (cluster, dim) partial-sum
    // groups inside lloyd; the returned assignment pass itself must be
    // a pure scan-stage argmin
    val df = graft.sim.KMeans.kmeansAssign(
      graft.sources.Sources.readTable(spark, sf0001, "embeddings"),
      "vec_id", "embedding", dim = 64, k = 2, iterations = 1)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("Exchange"),
      s"assignment must be row-local:\n$plan")
  }

  test("sc_cms_counts: sketch partially aggregates; probe side broadcasts") {
    val plan = SparkEntry.queries("sc_cms_counts")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_countminagg"),
      s"sketch buffers must combine map-side:\n$plan")
    assert(plan.contains("Broadcast"),
      s"the one-row sketch must broadcast to the probes:\n$plan")
    assert(plan.contains("cms_buckets"),
      s"probe buckets must use the codegen'd kernel:\n$plan")
  }

  test("sc_hll_distinct: scan-stage packing, partial max, broadcast grid") {
    val plan = SparkEntry.queries("sc_hll_distinct")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("hll_packed"),
      s"register packing must be the codegen'd kernel:\n$plan")
    assert(plan.contains("partial_max"),
      s"register maxima must combine map-side:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"the sparse registers must broadcast onto the dense grid:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("SortMergeJoin"),
      s"no corpus-shuffling join shapes:\n$plan")
  }

  test("ev_funnel: step-filtered window exchange, pushed scan filter, " +
      "keys-only universe") {
    // the funnel's scale contract: ONLY step-typed rows enter the
    // window exchange (the step-type filter reaches the parquet scan,
    // so among hundreds of event types the corpus never shuffles);
    // each step is a conditional-min window over that one partitioning
    // (unbounded frame) with the per-user dedup combining map-side; the
    // all-keys output joins back a keys-only distinct universe whose
    // scan reads just the key column
    val plan = SparkEntry.queries("ev_funnel")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("IN (view,click,purchase)") &&
      "DataFilters: \\[event_type#\\d+ IN \\(view,click,purchase\\)"
        .r.findFirstIn(plan).isDefined,
      s"the step-type filter must push into the events scan:\n$plan")
    assert("windowspecdefinition".r.findAllIn(plan).size >= 3,
      s"three chained step windows expected:\n$plan")
    assert(plan.contains("partial_min"),
      s"the per-user dedup must combine map-side:\n$plan")
    assert("FileScan parquet \\[user_id#\\d+L\\]".r
      .findFirstIn(plan).isDefined,
      s"the distinct-key universe must scan the key column only:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("SortMergeJoin"),
      s"the universe join must stay broadcast at this SF:\n$plan")
    // filtered corpus exchange + universe keys exchange + presentation
    // sort — a per-step shuffle would blow past this
    val exchanges = "Exchange (hash|range)partitioning".r
      .findAllIn(plan).size
    assert(exchanges <= 3,
      s"funnel grew extra shuffles ($exchanges > 3):\n$plan")
  }

  test("ev_funnel_summary: the corpus-priced funnel subtree executes " +
      "once (runtime exchange reuse), downstream is histogram-sized") {
    // the reporting twin's scale contract: the corpus-priced funnel
    // subtree (step-filtered windows + universe keys) is built ONCE
    // per session via BuildMemo and the summary derives from the
    // checkpointed per-user step table — the executed plan must carry
    // NO corpus exchange at all (no __k window partitioning), only
    // the histogram-sized cell aggregations over the checkpoint scan
    val df = SparkEntry.queries("ev_funnel_summary")(spark, sf0001)
    df.collect() // finalize the adaptive plan
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("hashpartitioning(__k"),
      s"the funnel's corpus exchange must not re-run inside the " +
        s"summary (the step table is the session-memoized build):\n$plan")
    assert(!plan.contains("windowspecdefinition(__k"),
      s"no per-key step-chain window may survive into the summary " +
        s"plan (the lag/first window over <= 8 STEP rows after the " +
        s"SinglePartition exchange is the allowed one):\n$plan")
    assert(plan.contains("partial_sum"),
      s"the cell aggregation must combine map-side:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"no cartesian anywhere:\n$plan")
  }

  test("ts_token_budget: histogram broadcasts, corpus shuffles once") {
    // budget fill's scale contract: the per-(domain, score) histogram —
    // not the corpus — flows through the cumulative window and then
    // BROADCASTS back; the corpus pays exactly one hash exchange (the
    // tie-window partitioning the broadcast join feeds) plus the
    // presentation sort
    val plan = SparkEntry.queries("ts_token_budget")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"the histogram must broadcast onto the corpus:\n$plan")
    assert(!plan.contains("SortMergeJoin") &&
      !plan.contains("CartesianProduct"),
      s"no corpus-shuffling join shapes:\n$plan")
    assert(plan.contains("partial_sum"),
      s"the histogram agg must combine map-side:\n$plan")
    val exchanges = "Exchange (hash|range)partitioning".r
      .findAllIn(plan).size
    assert(exchanges <= 4,
      s"token budget grew extra shuffles ($exchanges > 4):\n$plan")
  }

  test("sc_kmv: bounded sketch partially aggregates; set ops cross " +
      "one-row aggregates via broadcast") {
    val plan = SparkEntry.queries("sc_kmv_distinct")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_smallestklongsagg"),
      s"the sketch's <= k-long buffers must combine map-side:\n$plan")
    val plan2 = SparkEntry.queries("sc_kmv_setops")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan2.contains("partial_smallestklongsagg"),
      s"both set sketches must combine map-side:\n$plan2")
    assert(plan2.contains("Broadcast"),
      s"the one-row sketch cross must broadcast, not shuffle:\n$plan2")
    assert(!plan2.contains("SortMergeJoin"),
      s"no shuffled join for two scalar rows:\n$plan2")
  }

  test("ts_logreg_score: the trained model scores in one scan — " +
      "zero exchanges before the presentation sort") {
    val docs = graft.sources.Sources.readTable(spark, sf0001, "documents")
    val plan = graft.textstats.LogReg.score(docs, "doc_id", "text",
        Array(1L, 2L, 3L, 4L, 5L, 6L))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join"),
      s"scoring must be row-local (model = plan literals):\n$plan")
  }

  test("dd_dup_spans: windows see the flagged witness subset, the gram " +
      "filter is a semi-join on the count's own exchange") {
    val plan = SparkEntry.queries("dd_dup_spans")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("raw_word_gram_hashes"),
      s"grams must come from the codegen'd scan kernel:\n$plan")
    assert(plan.contains("LeftSemi"),
      s"the repeated-gram restriction must be a semi-join:\n$plan")
    // the window must consume the semi-join output (witnesses), never
    // the raw corpus: Window appears after the semi-join in the tree
    assert(plan.indexOf("Window") < plan.indexOf("LeftSemi"),
      s"the island window must sit above the witness filter:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"no product joins:\n$plan")
  }

  test("ev_cohort_retention: activity-cohort join stays an equi-join, " +
      "aggs combine map-side") {
    val plan = SparkEntry.queries("ev_cohort_retention")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_min") || plan.contains("partial_count"),
      s"per-user min / cell counts must combine map-side:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"only equi-join shapes:\n$plan")
  }

  test("media decodes are scan-stage: no join, no aggregate, exactly " +
      "the one presentation-sort exchange") {
    // the claim every mm_* decode row makes: the codec runs inside the
    // scan stage (per-row object map), so the ONLY exchange in the
    // whole plan is the final orderBy's range partitioning — a join or
    // aggregation appearing here would mean the decode stopped being
    // embarrassingly parallel
    // heavy multi-block codecs additionally carry the MediaIds
    // round-robin id spread (8-byte rows) so the per-row codec work
    // uses every core instead of inheriting a byte-sized single split
    // — that exchange is allowed (and REQUIRED) for them
    val heavy = Set("mm_jpeg422_decode", "mm_gif89a_frames")
    for (q <- Seq("mm_gif_decode", "mm_jpeg422_decode", "mm_adpcm_decode",
        "mm_alaw_decode", "mm_bmp_decode", "mm_gif89a_frames")) {
      val plan = SparkEntry.queries(q)(spark, sf0001)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("Join") && !plan.contains("HashAggregate"),
        s"$q must be pure scan-stage work:\n$plan")
      val exchanges = "(?m)^\\s*[+:*-]*\\s*\\(?\\d*\\)?\\s*Exchange".r
        .findAllIn(plan).size
      if (heavy(q)) {
        assert(plan.contains("RoundRobinPartitioning"),
          s"$q must spread its id stream across cores before the " +
            s"codec map (MediaIds.stream):\n$plan")
        assert(exchanges <= 2,
          s"$q grew a shuffle beyond id-spread + presentation sort " +
            s"($exchanges > 2):\n$plan")
      } else
        assert(exchanges <= 1,
          s"$q grew a non-presentation shuffle ($exchanges > 1):\n$plan")
    }
  }

  test("dd_containment: candidate counting shuffles scalars only " +
      "(arrays join after the lossless prune), partial aggregation, " +
      "no product joins") {
    import org.apache.spark.sql.catalyst.plans.logical.Aggregate
    import org.apache.spark.sql.types.ArrayType
    // round 16: the candidate pipeline is a session-memoized build, so
    // its shape is pinned on the UN-memoized builder plan; the gate
    // query keeps the no-product + live-verification assertions
    val sh = graft.dedup.Dedup.containmentShingles(
      spark.read.parquet(s"$sf0001/documents.parquet"), "doc_id", "text",
      shingleSize = 3)
    val cand = graft.dedup.Dedup.containmentCandidates(sh,
      threshold = 0.8, maxDf = 20)
    val cplanStr = cand.queryExecution.executedPlan.toString
    assert(cplanStr.contains("partial_count"),
      s"df/pair counts must combine map-side:\n$cplanStr")
    val pairAggs = cand.queryExecution.optimizedPlan.collect {
      case a: Aggregate if a.groupingExpressions.size == 4 => a
    }
    assert(pairAggs.nonEmpty, "the (id_a, na, id_b, nb) count is gone — " +
      "did the candidate pipeline change shape?")
    pairAggs.foreach { a =>
      assert(!a.child.output.exists(_.dataType.isInstanceOf[ArrayType]),
        s"an array column reached the candidate-count aggregation:\n$a")
    }
    val q = SparkEntry.queries("dd_containment")(spark, sf0001)
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"only equi-join shapes:\n$plan")
    // exact verification stays LIVE in the gate plan (array_intersect
    // over the re-attached shingle arrays — never served from a memo)
    assert(plan.contains("array_intersect"),
      s"the exact containment verification must run per call:\n$plan")
  }

  test("sim_pq: encode is scan-stage (codebooks ride the plan as " +
      "literals); the coarse ADC pass ranks via the partial k-heap") {
    val enc = SparkEntry.queries("sim_pq_encode")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!enc.contains("Join") && !enc.contains("HashAggregate"),
      s"pq encode must be pure scan-stage work:\n$enc")
    val topk = SparkEntry.queries("sim_pq_topk")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(topk.contains("partial_topkagg"),
      s"ADC candidates must partially aggregate in the k-heap:\n$topk")
    assert(!topk.contains("row_number"),
      s"ranking must not shuffle every scored candidate:\n$topk")
  }

  test("gr_triangles: every join stays an equi-join (no product " +
      "shapes), counts combine map-side") {
    // round-14: the small gate graph takes the one-task fast path
    val fastPlan = SparkEntry.queries("gr_triangles")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(fastPlan.contains("MapGroups"),
      s"the small gate graph must take the single-task count:\n$fastPlan")
    // degree-ordered wedge enumeration lives or dies on the joins
    // staying hash/sort equi-joins: a CartesianProduct or BNL here is
    // the all-pairs explosion the orientation exists to prevent
    val li0 = graft.sources.Sources.readTable(spark, sf0001, "lineitem")
      .filter(col("l_partkey") % 3 === 0)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .distinct()
    val edges = li0.as("x").join(li0.as("y"),
        col("x.o") === col("y.o") && col("x.p") < col("y.p"))
      .select(col("x.p").as("src"), col("y.p").as("dst"))
    val plan = graft.graph.GraphOps.triangleCounts(edges, "src", "dst",
        smallGraphEdges = 0L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"triangle joins must be equi-joins:\n$plan")
    assert(plan.contains("partial_count"),
      s"degree/triangle counts must combine map-side:\n$plan")
  }

  test("ts_priority_sample: top-(k+1) is a bounded " +
      "TakeOrderedAndProject, never a global corpus sort") {
    val plan = SparkEntry.queries("ts_priority_sample")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"the top-(k+1) must be the bounded per-partition heap:\n$plan")
    assert(!plan.contains("Join"),
      s"priority sampling is scan + heap, no join:\n$plan")
  }

  test("ts_group_priority_sample: the per-group rank is a " +
      "WindowGroupLimit (bounded per-group heaps), one key shuffle") {
    val plan = SparkEntry.queries("ts_group_priority_sample")(
        spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"the k+1 rank filter must push into a group-limit heap:\n$plan")
    assert(!plan.contains("Join"),
      s"per-group sampling is scan + windows, no join:\n$plan")
  }

  test("sc_sample_quantiles: one bounded partial-aggregating pass, " +
      "no window, no join") {
    val plan = SparkEntry.queries("sc_sample_quantiles")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_smallestkhashvalsagg"),
      s"the bottom-k sample must partially aggregate map-side:\n$plan")
    assert(!plan.contains("Window") && !plan.contains("Join"),
      s"quantile reads are expressions over the one-row sample:\n$plan")
  }

  test("u5_scd2: one key shuffle feeds all three window passes " +
      "(plus only the presentation sort)") {
    val plan = SparkEntry.queries("u5_scd2")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"scd2 must not join:\n$plan")
    val exchanges = "(?m)^\\s*[+:*-]*\\s*\\(?\\d*\\)?\\s*Exchange".r
      .findAllIn(plan).size
    assert(exchanges <= 2,
      s"scd2 grew beyond key shuffle + presentation sort " +
        s"($exchanges > 2):\n$plan")
  }

  test("ev_stream_sessionize_batch: one key shuffle, no join") {
    val plan = SparkEntry.queries("ev_stream_sessionize_batch")(
        spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"),
      s"session merge is a keyed aggregation, not a join:\n$plan")
    val exchanges = "(?m)^\\s*[+:*-]*\\s*\\(?\\d*\\)?\\s*Exchange".r
      .findAllIn(plan).size
    assert(exchanges <= 2,
      s"sessionize grew beyond key shuffle + presentation sort " +
        s"($exchanges > 2):\n$plan")
  }
}
