package graft

import org.apache.spark.sql.functions._

import graft.text.Retrieval

/** BM25 ranked retrieval: scores against an independent in-JVM model
  * (same fixed-point quantized contribution sum), stop-term guard
  * semantics, rank tie-break, id-type gating and partitioning
  * invariance.
  */
class Bm25Spec extends SparkTestBase {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "spark shuffles data across the cluster"),
    (2L, "the cluster runs spark executors"),
    (3L, "pandas runs on one machine"),
    (4L, "data pipelines clean data for training"),
    (5L, "")
  ).toDF("doc_id", "text")

  /** Independent BM25 model: same tokenization, same Lucene idf, same
    * fixed-point quantized contribution sum (round(c·1e10) longs,
    * integer-summed, de-scaled once) — plain Scala arithmetic, so
    * agreement with the operator is bit-exact.
    */
  private def model(docs: Seq[(Long, String)], query: String, k1: Double,
      b: Double, maxDfFrac: Double): Map[Long, Double] = {
    def tok(s: String) = s.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    val corp = docs.map { case (id, t) => (id, tok(t)) }.filter(_._2.nonEmpty)
    val n = corp.size
    val avgdl = corp.map(_._2.size.toLong).sum.toDouble / n.toDouble
    val df = corp.flatMap { case (_, tk) => tk.distinct }
      .groupBy(identity).view.mapValues(_.size).toMap
    val qts = tok(query).distinct
      .filter(t => df.contains(t) && df(t).toDouble <= maxDfFrac * n.toDouble)
    corp.flatMap { case (id, tk) =>
      val tf = tk.groupBy(identity).view.mapValues(_.size).toMap
      val cs = qts.filter(tf.contains).map { t =>
        // Spark's Log expression evaluates via StrictMath.log (1 ulp
        // off java.lang.Math.log on some inputs) — match it exactly
        val idf = StrictMath.log(1.0 + (n.toDouble - df(t).toDouble + 0.5) /
          (df(t).toDouble + 0.5))
        val tfd = tf(t).toDouble
        // the operator's fixed-point quantization: round(c·1e10) long
        math.round((idf * ((tfd * (k1 + 1.0)) /
          (tfd + k1 * ((1.0 - b) + b * (tk.size.toDouble / avgdl)))))
          * 1e10)
      }
      if (cs.isEmpty) None
      else Some(id -> cs.sum.toDouble / 1e10)
    }.toMap
  }

  test("scores match the independent model bit-exactly") {
    val queries = Seq((100L, "spark cluster data")).toDF("qid", "qtext")
    val got = Retrieval.bm25TopK(corpus, "doc_id", "text",
        queries, "qid", "qtext", k = 10)
      .as[(Long, Long, Double, Int)].collect().sortBy(_._4)
    val docs = Seq(
      1L -> "spark shuffles data across the cluster",
      2L -> "the cluster runs spark executors",
      3L -> "pandas runs on one machine",
      4L -> "data pipelines clean data for training",
      5L -> "")
    val want = model(docs, "spark cluster data", 1.2, 0.75, 1.0)
    assert(got.map(_._2).toSet == want.keySet, s"hit set: ${got.toSeq}")
    got.foreach { case (_, doc, score, _) =>
      assert(score == want(doc), s"doc $doc: $score != ${want(doc)}")
    }
    // ranking is (score desc, doc_id asc)
    val ranked = want.toSeq.sortBy { case (id, s) => (-s, id) }.map(_._1)
    assert(got.map(_._2).toSeq == ranked)
  }

  test("stop-term guard drops high-df terms symmetrically") {
    // "the" appears in 2/4 non-empty docs = 0.5 > 0.4 → excluded;
    // "executors" (df 1) survives
    val queries = Seq((100L, "the executors")).toDF("qid", "qtext")
    val got = Retrieval.bm25TopK(corpus, "doc_id", "text",
        queries, "qid", "qtext", k = 10, maxDfFrac = 0.4)
      .as[(Long, Long, Double, Int)].collect()
    assert(got.map(_._2).toSeq == Seq(2L),
      s"only the executors doc may match, got ${got.toSeq}")
    val docs = Seq(1L -> "spark shuffles data across the cluster",
      2L -> "the cluster runs spark executors",
      3L -> "pandas runs on one machine",
      4L -> "data pipelines clean data for training")
    assert(got.head._3 == model(docs, "the executors", 1.2, 0.75, 0.4)(2L))
  }

  test("k truncates per query and ties break by ascending doc id") {
    // identical docs → identical scores → rank order is doc_id
    val twins = Seq((7L, "alpha beta"), (3L, "alpha beta"),
      (9L, "alpha beta")).toDF("doc_id", "text")
    val queries = Seq((1L, "alpha")).toDF("qid", "qtext")
    val got = Retrieval.bm25TopK(twins, "doc_id", "text",
        queries, "qid", "qtext", k = 2)
      .as[(Long, Long, Double, Int)].collect().sortBy(_._4)
    assert(got.map(r => (r._2, r._4)).toSeq == Seq((3L, 1), (7L, 2)))
  }

  test("result is repartition-invariant (term-ordered fold)") {
    val queries = Seq((100L, "spark cluster data"), (101L, "pandas training"))
      .toDF("qid", "qtext")
    val a = Retrieval.bm25TopK(corpus.repartition(13), "doc_id", "text",
        queries, "qid", "qtext", k = 5)
      .as[(Long, Long, Double, Int)].collect().toSet
    val b = Retrieval.bm25TopK(corpus.coalesce(1), "doc_id", "text",
        queries, "qid", "qtext", k = 5)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(a == b && a.nonEmpty)
  }

  test("oversized term sets take the broadcast-join fallback with " +
      "identical results (pushTermLimit)") {
    val queries = Seq((100L, "spark cluster data"), (101L, "pandas training"))
      .toDF("qid", "qtext")
    // pushTermLimit = 1 < 5 distinct terms forces the fallback path
    val viaJoin = Retrieval.bm25TopK(corpus, "doc_id", "text",
        queries, "qid", "qtext", k = 5, pushTermLimit = 1)
      .as[(Long, Long, Double, Int)].collect().toSet
    val viaLiteral = Retrieval.bm25TopK(corpus, "doc_id", "text",
        queries, "qid", "qtext", k = 5)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(viaJoin == viaLiteral && viaLiteral.nonEmpty)
  }

  test("string doc ids take the window fallback with identical results") {
    val sCorpus = corpus.withColumn("doc_id",
      concat(lit("d"), col("doc_id")))
    val queries = Seq((100L, "spark cluster data")).toDF("qid", "qtext")
    val viaString = Retrieval.bm25TopK(sCorpus, "doc_id", "text",
        queries, "qid", "qtext", k = 3)
      .as[(Long, String, Double, Int)].collect()
      .map(r => (r._1, r._2.stripPrefix("d").toLong, r._3, r._4)).toSet
    val viaLong = Retrieval.bm25TopK(corpus, "doc_id", "text",
        queries, "qid", "qtext", k = 3)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(viaString == viaLong && viaLong.nonEmpty)
  }

  test("empty queries and empty documents are excluded, not errors") {
    val queries = Seq((100L, "   "), (101L, "machine")).toDF("qid", "qtext")
    val got = Retrieval.bm25TopK(corpus, "doc_id", "text",
        queries, "qid", "qtext", k = 5)
      .as[(Long, Long, Double, Int)].collect()
    assert(got.map(_._1).toSet == Set(101L))
    assert(got.map(_._2).toSet == Set(3L))
  }

  test("random corpora match the model bit-exactly (property)") {
    val rnd = new scala.util.Random(20260814L)
    val vocabAll = Vector("alpha", "beta", "gamma", "delta", "eps",
      "zeta", "eta", "theta", "iota", "kappa", "lam", "mu")
    for (round <- 1 to 6) {
      val vocab = vocabAll.take(5 + rnd.nextInt(8))
      def words(n: Int) =
        Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      // some docs empty, token counts skewed small
      val docs = (1L to (8 + rnd.nextInt(13)).toLong)
        .map(i => (i, if (rnd.nextInt(8) == 0) "" else
          words(1 + rnd.nextInt(12))))
      // queries may hit unseen terms ("zzz") or be empty
      val qs = (100L to (102 + rnd.nextInt(3)).toLong).map(i => (i,
        rnd.nextInt(6) match {
          case 0 => ""
          case 1 => words(2) + " zzz"
          case _ => words(1 + rnd.nextInt(5))
        }))
      val k = 1 + rnd.nextInt(5)
      val (k1, b, frac) = (0.5 + rnd.nextDouble(),
        rnd.nextDouble(), 0.3 + 0.7 * rnd.nextDouble())
      val got = Retrieval.bm25TopK(
          docs.toDF("doc_id", "text").repartition(1 + rnd.nextInt(7)),
          "doc_id", "text", qs.toDF("qid", "qtext"), "qid", "qtext",
          k = k, k1 = k1, b = b, maxDfFrac = frac)
        .as[(Long, Long, Double, Int)].collect()
        .groupBy(_._1).view.mapValues(_.sortBy(_._4)).toMap
      for ((qid, qtext) <- qs) {
        val want = model(docs, qtext, k1, b, frac).toSeq
          .sortBy { case (id, s) => (-s, id) }.take(k)
        val gotQ = got.getOrElse(qid, Array.empty).toSeq
          .map(r => (r._2, r._3))
        assert(gotQ == want,
          s"round $round query $qid '$qtext' k=$k k1=$k1 b=$b " +
            s"frac=$frac: $gotQ != $want")
      }
    }
  }

  test("parameter guards fail loudly") {
    val q = Seq((1L, "x")).toDF("qid", "qtext")
    intercept[IllegalArgumentException] {
      Retrieval.bm25TopK(corpus, "doc_id", "text", q, "qid", "qtext", k = 0)
    }
    intercept[IllegalArgumentException] {
      Retrieval.bm25TopK(corpus, "doc_id", "text", q, "qid", "qtext",
        k = 1, maxDfFrac = 0.0)
    }
    intercept[IllegalArgumentException] {
      Retrieval.bm25TopK(corpus, "doc_id", "text", q, "qid", "qtext",
        k = 1, b = 1.5)
    }
  }
}
