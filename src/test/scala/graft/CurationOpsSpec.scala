package graft

import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.ops.Sampling
import graft.sim.Similarity
import graft.textstats.TextStats

/** Round-7 corpus-curation operators: quality-priority survivor
  * selection, SemDeDup cell-scoped near-dups, corpus bigram LM scoring,
  * and temperature-weighted domain mixing. Each test pins the semantics
  * on a constructed example whose expected output is derived by hand.
  */
class CurationOpsSpec extends SparkTestBase {
  import spark.implicits._

  // --------------------------------------------- dropNearDupsKeepBest

  test("keep-best survivor is the max-quality member, not the min id") {
    // docs 1/2/3 are near-identical (pairwise Jaccard 1.0 on 3-gram
    // shingles); doc 2 has the highest quality. Min-id policy would keep
    // doc 1; keep-best must keep doc 2. Doc 9 is unrelated and survives.
    val txt = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq(
      (1L, txt, 10L), (2L, txt, 99L), (3L, txt, 50L),
      (9L, "totally different words nothing shared here at all", 1L))
      .toDF("doc_id", "text", "quality")
    val out = Dedup.dropNearDupsKeepBest(docs, "doc_id", "text", "quality",
      shingleSize = 3, numHashes = 32, bands = 16, threshold = 0.5)
      .select("doc_id").as[Long].collect().sorted
    assert(out.toSeq === Seq(2L, 9L))
    // contrast: the min-id policy keeps doc 1 from the same cluster
    val minId = Dedup.dropNearDups(docs, "doc_id", "text",
      shingleSize = 3, numHashes = 32, bands = 16, threshold = 0.5)
      .select("doc_id").as[Long].collect().sorted
    assert(minId.toSeq === Seq(1L, 9L))
  }

  test("keep-best ties break to the smallest id") {
    val txt = "one two three four five six seven eight nine ten"
    val docs = Seq((5L, txt, 7L), (3L, txt, 7L), (8L, txt, 7L))
      .toDF("doc_id", "text", "quality")
    val out = Dedup.dropNearDupsKeepBest(docs, "doc_id", "text", "quality",
      threshold = 0.5).select("doc_id").as[Long].collect()
    assert(out.toSeq === Seq(3L))
  }

  test("keepBestSurvivors: generic pairs, transitive chains, any generator") {
    // chain 1-2, 2-3 (one component via transitivity) + isolated pair
    // 7-8; quality picks 3 from the chain and 8 from the pair; 5 is in
    // no pair and survives untouched
    val rows = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0), (5L, 1.0),
      (7L, 5.0), (8L, 6.0)).toDF("id", "q")
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("id_a", "id_b")
    val out = Dedup.keepBestSurvivors(rows, "id", pairs, "q")
      .select("id").as[Long].collect().sorted
    assert(out.toSeq === Seq(3L, 5L, 8L))
  }

  // ------------------------------------------------- semanticNearDups

  test("semantic near-dups pair only within a k-means cell") {
    // two tight clusters far apart; near-identical vectors inside each.
    // With 2 centroids the clusters land in different cells, so the one
    // cross-cluster high-threshold pair candidate can never form, while
    // the in-cluster near-dups verify by exact cosine.
    def v(base: Double, eps: Double) = Seq(base + eps, 1.0, base)
    val emb = Seq(
      (1L, v(10.0, 0.0)), (2L, v(10.0, 0.001)),  // cluster A near-dups
      (3L, Seq(-10.0, 1.0, -10.0)), (4L, Seq(-10.0, 1.001, -10.0)))
      .toDF("vec_id", "embedding")
    val pairs = Similarity.semanticNearDups(emb, "vec_id", "embedding",
      threshold = 0.999, nCentroids = 2, refineSample = 4, lloydIters = 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L), (3L, 4L)))
  }

  test("semantic near-dups respect the per-cell member cap") {
    // 10 identical vectors in one cell, cap 3 -> only the 3 smallest ids
    // expand to pairs: C(3,2) = 3 pairs, never C(10,2) = 45
    val emb = (1L to 10L).map(i => (i, Seq(1.0, 2.0, 3.0)))
      .toDF("vec_id", "embedding")
    val pairs = Similarity.semanticNearDups(emb, "vec_id", "embedding",
      threshold = 0.5, nCentroids = 1, maxCell = 3, refineSample = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("planted near-duplicates are recovered by cell scoping") {
    // the synthetic embeddings hold no true near-dups (max pair cosine
    // ~0.55), so this plants them: every 10th vector gets a copy with
    // deterministic per-dimension noise (cosine > 0.999 to its source).
    // Cell-scoped candidate generation must surface nearly all planted
    // pairs — near-identical vectors land in the same cell unless one
    // sits exactly on a boundary.
    val emb = spark.read.parquet(s"$sf001/embeddings.parquet")
      .withColumn("embedding", col("embedding").cast("array<double>"))
      .select("vec_id", "embedding")
    val planted = emb.filter(col("vec_id") % 10 === 0)
      .select((col("vec_id") + 100000L).as("vec_id"),
        transform(col("embedding"),
          (x, i) => x * (lit(1.0) +
            (pmod(xxhash64(col("vec_id"), i), lit(1000L)).cast("double") -
              lit(500.0)) / lit(50000000.0))).as("embedding"))
    val corpus = emb.unionByName(planted)
    val nPlanted = planted.count()
    val pairs = graft.sim.Similarity.semanticNearDups(corpus, "vec_id",
      "embedding", threshold = 0.999, nCentroids = 16)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val found = pairs.count { case (a, b) => b == a + 100000L }
    assert(found >= 0.9 * nPlanted,
      s"found $found of $nPlanted planted near-dup pairs")
    // nothing else clears a 0.999 cosine bar
    assert(pairs.forall { case (a, b) => b == a + 100000L })
  }

  test("cell-scoped pair recall beats the 4-plane LSH grid at sf0.01") {
    // loose-pair regime (thr 0.3 on a corpus whose max pair cosine is
    // ~0.55): measured by RecallProbe — semantic(16 cells) = 0.248 vs
    // lsh(4 planes) = 0.143 of the 990 true pairs. Deterministic
    // pipelines, so the exact values are stable; floors leave margin
    // only for parameter-default drift.
    val emb = spark.read.parquet(s"$sf001/embeddings.parquet")
      .withColumn("embedding", col("embedding").cast("array<double>"))
    val v = emb.select(col("vec_id"), col("embedding"),
      graft.sim.Similarity.norm(col("embedding")).as("nm"))
    val truth = v.toDF("ia", "va", "na")
      .join(v.toDF("ib", "vb", "nb"), col("ia") < col("ib"))
      .filter(graft.sim.Similarity.dot(col("va"), col("vb")) /
        (col("na") * col("nb")) >= 0.3)
      .select(col("ia").as("id_a"), col("ib").as("id_b")).cache()
    val nTruth = truth.count().toDouble
    def recall(found: org.apache.spark.sql.DataFrame): Double =
      found.select("id_a", "id_b").intersect(truth).count() / nTruth
    val sem = recall(graft.sim.Similarity.semanticNearDups(
      emb, "vec_id", "embedding", threshold = 0.3, nCentroids = 16))
    val lsh = recall(graft.dedup.Dedup.embeddingNearDups(
      emb, "vec_id", "embedding", threshold = 0.3, planes = 4))
    assert(sem >= 0.2, s"semantic pair recall $sem below floor")
    assert(sem > lsh,
      s"expected density-tracking cells to beat the LSH grid: $sem <= $lsh")
  }

  // ---------------------------------------------------------- lmScore

  test("bigram LM score: seen bigrams use c12/c1, short docs score null") {
    // trainBuckets = 100 -> every doc trains, so all bigram probs are
    // corpus-relative frequencies and expected scores close in hand:
    //   docs: "a b", "a b", "a c"  ->  c(a)=3, c(a b)=2, c(a c)=1
    //   score("a b") = ln(2/3); score("a c") = ln(1/3)
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a c"), (4L, "solo"))
      .toDF("doc_id", "text")
    val out = TextStats.lmScore(docs, "doc_id", "text", trainBuckets = 100)
      .orderBy("doc_id")
      .select("doc_id", "n_bigrams", "lm_score")
      .as[(Long, Long, Option[Double])].collect()
    assert(out(0) === ((1L, 1L, Some(math.log(2.0 / 3.0)))))
    assert(out(1) === ((2L, 1L, Some(math.log(2.0 / 3.0)))))
    assert(out(2) === ((3L, 1L, Some(math.log(1.0 / 3.0)))))
    assert(out(3) === ((4L, 0L, None))) // < 2 tokens: no bigrams
  }

  test("bigram LM score: unseen bigrams take the stupid-backoff branch") {
    // one training doc, one held-out doc whose bigram never occurs in
    // training:
    //   train "x y x y": T = 4, V = 2, c(y x)=1, c(x)=2, c(y)=2
    //   eval  "y y":    bigram (y,y) unseen -> ln(0.4 * (c(y)+1) / (T+V))
    // ids are picked by their actual hash bucket (train < 80 <= eval)
    val buckets = spark.range(1, 201)
      .select(col("id"), Sampling.hashBucket(col("id"), 100).as("b"))
      .as[(Long, Long)].collect()
    val trainId = buckets.find(_._2 < 80).get._1
    val evalId = buckets.find(_._2 >= 80).get._1
    val docs = Seq((trainId, "x y x y"), (evalId, "y y"))
      .toDF("doc_id", "text")
    val out = TextStats.lmScore(docs, "doc_id", "text")
      .filter(col("doc_id") === evalId)
      .select("lm_score").as[Double].head()
    // 1e-12 tolerance: the JVM's Math.log intrinsic and this test's
    // constant-folded expectation can differ in the final ulp
    val expected = math.log(0.4 * (2.0 + 1.0) / (4.0 + 2.0))
    assert(math.abs(out - expected) < 1e-12,
      s"$out !~ $expected")
  }

  // --------------------------------------------------- temperatureMix

  test("temperature mix: alpha = 1 keeps every domain at targetFraction") {
    // alpha = 1 -> q_d = n_d / N -> r_d = targetFraction exactly
    val docs = (1L to 300L).map(i =>
      (i, if (i % 3 == 0) "big" else "huge")).toDF("doc_id", "domain")
    val out = Sampling.temperatureMix(docs, "doc_id", "domain",
      alpha = 1.0, targetFraction = 0.25)
    val thr = out.select("mix_threshold").distinct().as[Long].collect()
    assert(thr.toSeq === Seq(250000L))
  }

  test("temperature mix: alpha < 1 up-weights rare domains") {
    // 900 "en" vs 100 "rare": alpha 0.5 shifts share toward the rare
    // domain; the rare threshold must exceed the dominant one, and both
    // must match the closed form computed here
    val docs = (1L to 1000L).map(i =>
      (i, if (i <= 900) "en" else "rare")).toDF("doc_id", "domain")
    val out = Sampling.temperatureMix(docs, "doc_id", "domain",
      alpha = 0.5, targetFraction = 0.5)
    val thr = out.select("domain", "mix_threshold").distinct()
      .as[(String, Long)].collect().toMap
    val z = math.pow(900, 0.5) + math.pow(100, 0.5)
    def expect(n: Double) =
      math.round(math.min(1.0, 0.5 * 1000 * (math.pow(n, 0.5) / z) / n)
        * 1000000)
    assert(thr("en") === expect(900))
    assert(thr("rare") === expect(100))
    assert(thr("rare") > thr("en"))
    // survivors actually honor the thresholds
    val got = out.select("doc_id").as[Long].collect().toSet
    val all = docs.select(col("doc_id"),
      pmod(xxhash64(lit(0L), col("doc_id")), lit(1000000L)).as("h"),
      col("domain")).as[(Long, Long, String)].collect()
    val manual = all.filter { case (_, h, d) => h < thr(d) }.map(_._1).toSet
    assert(got === manual)
  }

  test("temperature mix drops null-domain rows (documented contract)") {
    val docs = Seq((1L, "a"), (2L, null), (3L, "a"))
      .toDF("doc_id", "domain")
    val out = Sampling.temperatureMix(docs, "doc_id", "domain",
      alpha = 1.0, targetFraction = 1.0)
    // tf = 1, alpha = 1 -> every non-null-domain row survives; the null
    // row cannot join a rate and is dropped
    assert(out.select("doc_id").as[Long].collect().sorted.toSeq
      === Seq(1L, 3L))
  }

  test("null-domain rows do not inflate N/Z — thresholds equal the " +
      "null-free corpus") {
    // a 50% null-domain corpus must produce EXACTLY the thresholds of
    // its non-null half: counting undrawable rows in the normalizer
    // would overstate every real domain's accept rate
    val clean = (1L to 200L).map(i =>
      (i, if (i % 4 == 0) "rare" else "en")).toDF("doc_id", "domain")
    val withNulls = clean.union((201L to 400L)
      .map(i => (i, null.asInstanceOf[String])).toDF("doc_id", "domain"))
    def thresholds(df: org.apache.spark.sql.DataFrame) =
      Sampling.temperatureMix(df, "doc_id", "domain",
        alpha = 0.5, targetFraction = 0.3)
        .select("domain", "mix_threshold").distinct()
        .as[(String, Long)].collect().toMap
    assert(thresholds(withNulls) === thresholds(clean))
  }

  test("lm score and temperature mix are invariant under repartitioning") {
    // the operators' float folds are pinned to row-internal order, so
    // physical layout must not change a single bit of the output
    val docs = (1L to 120L).map(i =>
      (i, s"tok${i % 7} tok${i % 5} tok${i % 3} tok${i % 7}",
        if (i % 4 == 0) "rare" else "en"))
      .toDF("doc_id", "text", "domain")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("doc_id").collect().toSeq
    val lm1 = canon(TextStats.lmScore(docs.repartition(7), "doc_id", "text"))
    val lm2 = canon(TextStats.lmScore(docs.repartition(2), "doc_id", "text"))
    assert(lm1 === lm2)
    val mx1 = canon(Sampling.temperatureMix(docs.repartition(5), "doc_id",
      "domain", alpha = 0.5, targetFraction = 0.5))
    val mx2 = canon(Sampling.temperatureMix(docs.coalesce(1), "doc_id",
      "domain", alpha = 0.5, targetFraction = 0.5))
    assert(mx1 === mx2)
  }

  test("lm buckets: per-language thirds, null bucket for unscorable docs") {
    // 9 scorable docs per lang -> 2 head / 3 middle / 4 tail under the
    // integer contract: head is rn*100 <= 9*33 = 297 -> rn <= 2, middle
    // is rn*100 <= 9*66 = 594 -> rn <= 5 (NOT equal thirds — the floor
    // behavior is the pinned CCNet semantics, don't "fix" it to 3/3/3)
    val docs = ((1L to 9L).map(i =>
        (i, s"tok${i % 7} tok${i % 5} tok${i % 3} tok$i end", "en")) ++
      (11L to 19L).map(i =>
        (i, s"mot${i % 7} mot${i % 5} mot${i % 3} mot$i fin", "fr")) :+
      ((30L, "solo", "en"))).toDF("doc_id", "text", "lang")
    val out = TextStats.lmQualityBuckets(docs, "doc_id", "text", "lang")
      .as[(Long, String, String)].collect()
    val byLang = out.filter(_._3 != null).groupBy(_._2)
      .view.mapValues(_.groupBy(_._3).view.mapValues(_.length).toMap).toMap
    // n = 9: head rn*100 <= 297 -> rn <= 2; middle rn <= 5; tail 4
    for (l <- Seq("en", "fr"))
      assert(byLang(l) == Map("head" -> 2, "middle" -> 3, "tail" -> 4),
        s"$l got ${byLang(l)}")
    assert(out.find(_._1 == 30L).get._3 == null,
      "sub-bigram doc must carry a null bucket")
  }

  test("lm buckets are invariant under repartitioning and rank by score") {
    val docs = (1L to 60L).map(i =>
      (i, (1 to (i % 6 + 2).toInt).map(j => s"tok${(i + j) % 9}")
        .mkString(" "),
        if (i % 2 == 0) "en" else "fr")).toDF("doc_id", "text", "lang")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("doc_id").collect().toSeq
    val b1 = canon(TextStats.lmQualityBuckets(docs.repartition(7),
      "doc_id", "text", "lang"))
    val b2 = canon(TextStats.lmQualityBuckets(docs.coalesce(1),
      "doc_id", "text", "lang"))
    assert(b1 === b2)
    // a head doc never has a lower score than a tail doc of its language
    val scored = TextStats.lmScore(docs, "doc_id", "text")
      .select(col("doc_id"), round(col("lm_score"), 6).as("s"))
    val joined = TextStats.lmQualityBuckets(docs, "doc_id", "text", "lang")
      .join(scored, "doc_id").filter(col("bucket").isNotNull)
      .as[(Long, String, String, Double)].collect()
    for (l <- Seq("en", "fr")) {
      val g = joined.filter(_._2 == l)
      val minHead = g.filter(_._3 == "head").map(_._4).min
      val maxTail = g.filter(_._3 == "tail").map(_._4).max
      assert(minHead >= maxTail, s"$l: head $minHead < tail $maxTail")
    }
  }

  test("lm buckets: a skewed corpus (one language dominating, heavy " +
      "score ties straddling the cuts) matches the rank formulation " +
      "doc-for-doc") {
    // 180 'en' docs drawn from only 6 distinct texts (so the rounded
    // scores tie in large groups and at least one group straddles a
    // percentile cut), plus a 6-doc 'fr' minority — the histogram
    // formulation must reproduce the (score desc, id) rank semantics
    // exactly, including the id-split inside a straddling tie group
    val docs = ((1L to 180L).map(i =>
        (i, s"tok${i % 6} tok${(i % 6) + 1} tok${(i % 6) + 2} end", "en")) ++
      (201L to 206L).map(i =>
        (i, s"mot$i mot${i % 3} fin", "fr"))).toDF("doc_id", "text", "lang")
    val scores = TextStats.lmScore(docs, "doc_id", "text")
      .select(col("doc_id"), round(col("lm_score"), 6).as("s"))
      .as[(Long, Double)].collect().toMap
    val got = TextStats.lmQualityBuckets(docs, "doc_id", "text", "lang")
      .as[(Long, String, String)].collect()
    // in-memory rank reference: (score desc, id) per language,
    // head iff rn*100 <= n*33, middle iff rn*100 <= n*66
    val byLang = got.map(r => (r._1, r._2)).groupBy(_._2)
    val exp = byLang.toSeq.flatMap { case (_, ids) =>
      val scorable = ids.map(_._1).filter(scores.contains)
        .sortBy(id => (-scores(id), id)).toSeq
      val n = scorable.length
      scorable.zipWithIndex.map { case (id, i) =>
        val rn = i + 1L
        id -> (if (rn * 100 <= n * 33) "head"
               else if (rn * 100 <= n * 66) "middle" else "tail")
      }
    }.toMap
    got.foreach { case (id, _, bucket) =>
      assert(exp.get(id).orNull == bucket,
        s"doc $id: expected ${exp.get(id)}, got $bucket")
    }
    // the skew premise actually holds: some en tie group straddles a cut
    val enScores = (1L to 180L).map(scores)
    assert(enScores.distinct.size <= 6)
  }

  test("lm buckets reject degenerate percent splits") {
    val docs = Seq((1L, "a b c", "en")).toDF("doc_id", "text", "lang")
    intercept[IllegalArgumentException] {
      TextStats.lmQualityBuckets(docs, "doc_id", "text", "lang",
        headPct = 0)
    }
    intercept[IllegalArgumentException] {
      TextStats.lmQualityBuckets(docs, "doc_id", "text", "lang",
        headPct = 60, midPct = 50)
    }
  }

  test("lm score rejects out-of-range train buckets") {
    val docs = Seq((1L, "a b")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      TextStats.lmScore(docs, "doc_id", "text", trainBuckets = 0)
    }
    intercept[IllegalArgumentException] {
      TextStats.lmScore(docs, "doc_id", "text", trainBuckets = 101)
    }
  }

  test("temperature mix rejects out-of-range parameters") {
    val docs = Seq((1L, "a")).toDF("doc_id", "domain")
    intercept[IllegalArgumentException] {
      Sampling.temperatureMix(docs, "doc_id", "domain", alpha = 0.0,
        targetFraction = 0.5)
    }
    intercept[IllegalArgumentException] {
      Sampling.temperatureMix(docs, "doc_id", "domain", alpha = 0.5,
        targetFraction = 1.5)
    }
  }

  // --------------------------------------------- scrubRepeatedNgrams

  test("repeated n-gram scrub removes shared boilerplate, keeps unique text") {
    // docs 1 and 2 share an exact 5-word header; doc 3 carries the same
    // header SHIFTED one word right (overlapping windows must still
    // catch it); doc 4 is unique; doc 5 is shorter than n
    val header = "terms of service apply here"
    val docs = Seq(
      (1L, s"$header alpha beta gamma delta epsilon"),
      (2L, s"$header zeta eta theta iota kappa"),
      (3L, s"intro $header lambda mu nu xi"),
      (4L, "completely unique words that repeat nowhere else at all"),
      (5L, "too short")).toDF("doc_id", "text")
    val out = Dedup.scrubRepeatedNgrams(docs, "doc_id", "text",
        n = 5, maxDocs = 1)
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out(0) === ((1L, "alpha beta gamma delta epsilon", 5L)))
    assert(out(1) === ((2L, "zeta eta theta iota kappa", 5L)))
    assert(out(2) === ((3L, "intro lambda mu nu xi", 5L)))
    // untouched docs keep ORIGINAL text byte-for-byte
    assert(out(3) === ((4L,
      "completely unique words that repeat nowhere else at all", 0L)))
    assert(out(4) === ((5L, "too short", 0L)))
  }

  test("scrub: a doc that is one long repeated span is fully emptied") {
    val docs = Seq(
      (1L, "a b c d e"),
      (2L, "a b c d e"),
      (3L, "x a b c d e y")).toDF("doc_id", "text")
    val out = Dedup.scrubRepeatedNgrams(docs, "doc_id", "text",
        n = 5, maxDocs = 1)
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // docs 1/2 are nothing but the shared gram -> empty, all 5 removed;
    // doc 3 keeps its unique flanks
    assert(out(0) === ((1L, "", 5L)))
    assert(out(1) === ((2L, "", 5L)))
    assert(out(2) === ((3L, "x y", 5L)))
  }

  test("scrub: maxDocs raises the repetition bar; within-doc repeats don't count") {
    val docs = Seq(
      (1L, "p q r s t p q r s t"), // gram repeated WITHIN one doc only
      (2L, "u v w x y one two"),
      (3L, "u v w x y three four")).toDF("doc_id", "text")
    // distinct-doc count for "p q r s t" is 1 -> kept even at maxDocs=1
    val out = Dedup.scrubRepeatedNgrams(docs, "doc_id", "text",
        n = 5, maxDocs = 1)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    assert(out(0) === ((1L, 0L)))
    assert(out(1) === ((2L, 5L)))
    assert(out(2) === ((3L, 5L)))
    // maxDocs=2 tolerates the 2-doc repeat
    val lax = Dedup.scrubRepeatedNgrams(docs, "doc_id", "text",
        n = 5, maxDocs = 2)
      .orderBy("doc_id").collect().map(_.getLong(2))
    assert(lax.toSeq === Seq(0L, 0L, 0L))
  }

  test("scrub rejects degenerate parameters") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Dedup.scrubRepeatedNgrams(docs, "doc_id", "text", n = 1)
    }
    intercept[IllegalArgumentException] {
      Dedup.scrubRepeatedNgrams(docs, "doc_id", "text", maxDocs = 0)
    }
  }

  test("containmentPairs finds the quoted-subset pair Jaccard misses") {
    // doc 1 is fully quoted inside doc 2 (plus a long unique tail), so
    // Jaccard is small but containment_a ~ 1; docs 3/4 share nothing
    val quote = "alpha beta gamma delta epsilon zeta"
    val tail = (0 until 40).map(i => s"tail$i").mkString(" ")
    val cdocs = Seq(
      (1L, quote),
      (2L, s"$quote $tail"),
      (3L, "completely different words here entirely"),
      (4L, "another unrelated document body text")).toDF("doc_id", "text")
    val rows = Dedup.containmentPairs(cdocs, "doc_id", "text",
        shingleSize = 3, threshold = 0.8, maxDf = 20)
      .collect()
    assert(rows.length === 1)
    val r = rows(0)
    assert(r.getLong(0) === 1L && r.getLong(1) === 2L)
    // doc 1 has 4 shingles, all shared; doc 2 has 4 + 41 + 2 bridging
    assert(r.getDouble(3) === 1.0)                 // containment_a
    assert(r.getDouble(4) < 0.5)                   // containment_b
    assert(r.getLong(2) === 4L)                    // n_common
    // the SAME pair fails the symmetric Jaccard gate at 0.5
    val j = Dedup.ngramJaccardPairs(cdocs, "doc_id", "text",
      shingleSize = 3, threshold = 0.5, maxDf = 20).collect()
    assert(!j.exists(x => x.getLong(0) == 1L && x.getLong(1) == 2L))
    intercept[IllegalArgumentException] {
      Dedup.containmentPairs(cdocs, "doc_id", "text", threshold = 0.0)
    }
    intercept[IllegalArgumentException] {
      Dedup.containmentPairs(cdocs, "doc_id", "text", maxDf = 1)
    }
  }
}
