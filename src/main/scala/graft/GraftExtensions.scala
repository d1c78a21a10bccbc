package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions.{CharHist64, CmsBuckets, DotProduct, GramStats, HashedWordShingles, HllPacked, L2Norm, LangMarkerScores, LongArrayL1, LshBuckets, MinHashSignature, RawWordGramHashes, SimHash64, SortedLongJaccard, WordShingles}
import graft.textstats.TextStats

/** SQL surface for the engine's custom Catalyst expressions: register via
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or on a
  * live session with `GraftExtensions.register(spark)`. Gives
  * `simhash64(arr)`, `minhash_signature(arr, n)`, `word_shingles(s, n)`,
  * `vec_dot(a, b)`, `vec_norm(a)`, `lang_marker_scores(toks)` (the
  * built-in marker lists, sorted lang order), `cms_buckets(s, d, w)`
  * and `hll_packed(h, p)` to pure-SQL users alongside
  * the Column API (graft.functions), plus the table-valued functions
  * ([[graft.plans.TableFunctions]]): `asof_join` / `range_join` and the
  * LLM-pipeline tier `minhash_near_dups` / `decontaminate` /
  * `scrub_repeated_ngrams`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  def apply(e: SparkSessionExtensions): Unit = {
    GraftExtensions.registrations.foreach { case (name, builder) =>
      e.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name),
        builder))
    }
    graft.plans.TableFunctions.registrations.foreach { case (name, builder) =>
      e.injectTableFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.plans", name),
        builder))
    }
    // plans the deferred-training TVF leaves (pagerank / trustrank /
    // label_propagation / nb_classify / bpe_token_frequencies) at
    // execution time — EXPLAIN launches zero jobs
    e.injectPlannerStrategy(_ => graft.plans.DeferredBuildStrategy)
  }
}

object GraftExtensions {
  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def arity(name: String, args: Seq[Expression], n: Int): Unit =
    if (args.length != n) throw new IllegalArgumentException(
      s"$name expects $n argument(s), got ${args.length}")

  val registrations: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "simhash64" -> (args => { arity("simhash64", args, 1)
      SimHash64(args.head) }),
    "minhash_signature" -> (args => { arity("minhash_signature", args, 2)
      MinHashSignature(args.head, intArg(args(1), "numHashes")) }),
    "word_shingles" -> (args => { arity("word_shingles", args, 2)
      WordShingles(args.head, intArg(args(1), "n")) }),
    "vec_dot" -> (args => { arity("vec_dot", args, 2)
      DotProduct(args.head, args(1)) }),
    "vec_norm" -> (args => { arity("vec_norm", args, 1)
      L2Norm(args.head) }),
    "lang_marker_scores" -> (args => { arity("lang_marker_scores", args, 1)
      val ordered = TextStats.langMarkers.toSeq.sortBy(_._1)
      LangMarkerScores(args.head, ordered.map(_._1), ordered.map(_._2)) }),
    "hashed_word_shingles" -> (args => {
      arity("hashed_word_shingles", args, 2)
      HashedWordShingles(args.head, intArg(args(1), "n")) }),
    "sorted_long_jaccard" -> (args => { arity("sorted_long_jaccard", args, 2)
      SortedLongJaccard(args.head, args(1)) }),
    "gram_stats" -> (args => { arity("gram_stats", args, 1)
      GramStats(args.head) }),
    "char_hist64" -> (args => { arity("char_hist64", args, 1)
      CharHist64(args.head) }),
    "long_array_l1" -> (args => { arity("long_array_l1", args, 2)
      LongArrayL1(args.head, args(1)) }),
    "lsh_buckets" -> (args => { arity("lsh_buckets", args, 3)
      LshBuckets(args.head, intArg(args(1), "planes"),
        intArg(args(2), "tables")) }),
    "raw_word_gram_hashes" -> (args => {
      arity("raw_word_gram_hashes", args, 2)
      RawWordGramHashes(args.head, intArg(args(1), "n")) }),
    "cms_buckets" -> (args => { arity("cms_buckets", args, 3)
      CmsBuckets(args.head, intArg(args(1), "depth"),
        intArg(args(2), "width")) }),
    "hll_packed" -> (args => { arity("hll_packed", args, 2)
      HllPacked(args.head, intArg(args(1), "p")) }))

  /** Register on an already-built session. Also registers the
    * `backtest_fold` aggregate — a udaf goes through the UDF registry,
    * not the expression-builder path, so it is live-session-only (the
    * `withExtensions` path covers the scalar expressions above).
    */
  def register(spark: SparkSession): Unit = {
    registrations.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
    }
    graft.plans.TableFunctions.registrations.foreach { case (name, builder) =>
      spark.sessionState.tableFunctionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
    }
    if (!spark.experimental.extraStrategies
        .contains(graft.plans.DeferredBuildStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+
          graft.plans.DeferredBuildStrategy
    graft.engine.BacktestFoldAgg.register(spark)
  }
}
