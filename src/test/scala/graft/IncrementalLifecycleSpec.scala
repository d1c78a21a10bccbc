package graft

import scala.util.Random

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.sim.Similarity

/** End-to-end properties of the two incremental-dedup lifecycles
  * (index → probe → merge), iterated over randomly split corpora — the
  * invariants a production pipeline silently depends on but no single
  * fixture pins:
  *
  *  - MINHASH index state: folding per-batch [[Dedup.updateMinhashIndex]]
  *    merges (with re-crawled ids across batches) lands the index in
  *    exactly the state one-shot signature computation over the
  *    newest-wins corpus produces.
  *  - MINHASH pairs: accumulated cross-batch probe pairs (exact-verified
  *    mode, epsilon spanning the whole estimate range so every candidate
  *    is re-checked exactly) plus within-batch self-join pairs equal the
  *    one-shot self-join operator's pair set over the full corpus.
  *  - SEMANTIC index state: folding per-batch
  *    [[Similarity.updateSemanticIndex]] merges (re-embedded ids,
  *    zero-norm evictions, in-batch duplicates) equals ONE merge of the
  *    newest-wins corpus into the emptied initial index — caps inactive,
  *    since smallest-k eviction is deliberately lossy across vacated
  *    cells (evicted members are dropped, not archived; the cap fixtures
  *    in SemanticIncrementalSpec cover that separately).
  *  - SEMANTIC probe: the final index serves probes exactly as a
  *    driver-side model predicts (assign to nearest frozen centroid by
  *    squared L2 with the kernel's tie-breaking, pair within the cell at
  *    cosine ≥ threshold, zero-norm rows never pair).
  */
class IncrementalLifecycleSpec extends SparkTestBase {
  import spark.implicits._

  // ------------------------------------------------------------ minhash

  private val vocab = Seq("alpha", "bravo", "charlie", "delta", "echo",
    "foxtrot", "golf", "hotel", "india", "juliet", "kilo", "lima",
    "mike", "november", "oscar")

  /** Random docs with overlap structure: later docs mutate earlier ones
    * (replace up to 3 words) often enough that real near-dups exist.
    */
  private def randomDocs(rnd: Random, n: Int,
      ids: Range): Seq[(Long, String)] = {
    val texts = scala.collection.mutable.ArrayBuffer.empty[String]
    (0 until n).foreach { _ =>
      val t = if (texts.nonEmpty && rnd.nextDouble() < 0.5) {
        val base = texts(rnd.nextInt(texts.size)).split(" ")
        val out = base.clone()
        (0 until 1 + rnd.nextInt(3)).foreach { _ =>
          out(rnd.nextInt(out.length)) = vocab(rnd.nextInt(vocab.size))
        }
        out.mkString(" ")
      } else {
        Seq.fill(5 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.size)))
          .mkString(" ")
      }
      texts += t
    }
    rnd.shuffle(ids.toList).take(n).map(_.toLong).zip(texts.toSeq)
  }

  test("minhash merges fold to the one-shot index (re-crawls included)") {
    val rnd = new Random(20260814L)
    for (round <- 1 to 6) {
      // 3 batches; ~1/4 of later-batch ids re-crawl an earlier id
      val b1 = randomDocs(rnd, 8, 1 to 40)
      def reuse(prev: Seq[(Long, String)], fresh: Seq[(Long, String)]) =
        fresh.map { case (id, t) =>
          if (rnd.nextDouble() < 0.25 && prev.nonEmpty)
            (prev(rnd.nextInt(prev.size))._1, t)
          else (id, t)
        }.distinctBy(_._1)
      val b2 = reuse(b1, randomDocs(rnd, 8, 41 to 80))
      val b3 = reuse(b1 ++ b2, randomDocs(rnd, 8, 81 to 120))
      val batches = Seq(b1, b2, b3)
      def sigs(rows: Seq[(Long, String)]): DataFrame =
        Dedup.minhashSignatures(rows.toDF("doc_id", "text"),
          "doc_id", "text")
      val folded = batches.map(sigs).reduceLeft(Dedup.updateMinhashIndex)
        .as[(Long, Seq[Long])].collect().toMap
      // newest-wins final corpus, one row per id
      val finalCorpus = batches.flatten
        .foldLeft(scala.collection.immutable.ListMap.empty[Long, String]) {
          case (acc, (id, t)) => acc + (id -> t)
        }.toSeq
      val oneShot = sigs(finalCorpus).as[(Long, Seq[Long])].collect().toMap
      assert(folded === oneShot, s"index state diverged in round $round")
    }
  }

  test("iterated probes + in-batch pairs equal the one-shot self-join") {
    val rnd = new Random(20260815L)
    for (round <- 1 to 5) {
      // unique ids (no re-crawls — pair history under replacement is a
      // different contract); epsilon spans the estimate range so the
      // verified probe re-checks EVERY candidate exactly, making probe
      // and self-join verification rungs identical
      val thr = 0.3
      val batches = Seq(
        randomDocs(rnd, 7, 1 to 40),
        randomDocs(rnd, 7, 41 to 80),
        randomDocs(rnd, 7, 81 to 120))
      def df(rows: Seq[(Long, String)]) = rows.toDF("doc_id", "text")
      def sigs(d: DataFrame) =
        Dedup.minhashSignatures(d, "doc_id", "text")
      val pairs = scala.collection.mutable.Set.empty[(Long, Long)]
      var index: DataFrame = null
      batches.foreach { b =>
        val bd = df(b)
        if (index != null) {
          pairs ++= Dedup.minhashNearDupsAgainstVerified(
            index, sigs(bd),
            df(batches.flatten.toSeq), bd, "doc_id", "text",
            bands = 16, threshold = thr, epsilon = 0.75, maxBucket = 256)
            .select("batch_id", "corpus_id").as[(Long, Long)].collect()
            .map(p => (math.min(p._1, p._2), math.max(p._1, p._2)))
        }
        pairs ++= Dedup.minhashNearDups(bd, "doc_id", "text",
          bands = 16, threshold = thr, maxBucket = 256)
          .select("id_a", "id_b").as[(Long, Long)].collect()
        index = if (index == null) sigs(bd)
          else Dedup.updateMinhashIndex(index, sigs(bd))
      }
      val oneShot = Dedup.minhashNearDups(df(batches.flatten.toSeq),
          "doc_id", "text", bands = 16, threshold = thr, maxBucket = 256)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      assert(pairs.toSet === oneShot,
        s"round $round: iterated ${pairs.toSet} vs one-shot $oneShot")
      totalPairs += oneShot.size
    }
    assert(totalPairs > 0, "vacuous property: no round produced any pair")
  }
  private var totalPairs = 0

  // ----------------------------------------------------------- semantic

  /** Random grid vectors: small integer components make near-dups
    * (parallel / identical vectors) common; occasional zero vectors
    * exercise the eviction contract.
    */
  private def randomVecs(rnd: Random, n: Int,
      ids: Range): Seq[(Long, Seq[Double])] = {
    val picked = rnd.shuffle(ids.toList).take(n).map(_.toLong)
    picked.map { id =>
      val v = if (rnd.nextDouble() < 0.1) Seq(0.0, 0.0, 0.0)
        else {
          val base = Seq(rnd.nextInt(5) - 2, rnd.nextInt(5) - 2,
            rnd.nextInt(5) - 2).map(_.toDouble)
          if (base.forall(_ == 0.0)) Seq(1.0, 0.0, 0.0)
          else if (rnd.nextDouble() < 0.3) base.map(_ * (1 + rnd.nextInt(3)))
          else base
        }
      (id, v)
    }
  }

  test("semantic merges fold to one merge of the newest-wins corpus") {
    val rnd = new Random(20260816L)
    for (round <- 1 to 5) {
      val b1 = randomVecs(rnd, 8, 1 to 30)
      def reembed(prev: Seq[(Long, Seq[Double])],
          fresh: Seq[(Long, Seq[Double])]) =
        fresh.map { case (id, v) =>
          if (rnd.nextDouble() < 0.3 && prev.nonEmpty)
            (prev(rnd.nextInt(prev.size))._1, v)
          else (id, v)
        }.distinctBy(_._1)
      val b2 = reembed(b1, randomVecs(rnd, 6, 31 to 60))
      val b3 = reembed(b1 ++ b2, randomVecs(rnd, 6, 61 to 90))
      // in-batch duplicate delivery: double a row verbatim
      val b2d = b2 ++ b2.take(1)
      def df(rows: Seq[(Long, Seq[Double])]) =
        rows.toDF("vec_id", "embedding")
      val i0 = Similarity.semanticCellIndex(df(b1), "vec_id", "embedding",
        nCentroids = 3, refineSample = 16).localCheckpoint()
      val folded = Seq(b2d, b3).foldLeft(i0) { (idx, b) =>
        Similarity.updateSemanticIndex(idx, df(b), "vec_id", "embedding")
          .localCheckpoint()
      }
      val emptied = i0.select(col("cell"), col("centroid"),
        lit(null).cast(i0.schema("members").dataType).as("members"))
      val finalCorpus = (b1 ++ b2 ++ b3)
        .foldLeft(scala.collection.immutable.ListMap
          .empty[Long, Seq[Double]]) {
          case (acc, (id, v)) => acc + (id -> v)
        }.toSeq.map { case (id, v) => (id, v) }
      val oneShot = Similarity.updateSemanticIndex(emptied,
        df(finalCorpus), "vec_id", "embedding")
      def content(idx: DataFrame) = {
        val cells = idx.select(col("cell"), col("centroid"))
          .as[(Int, Seq[Double])].collect().sortBy(_._1).toSeq
        val mems = idx
          .select(col("cell"), explode(col("members")).as("m"))
          .select(col("cell"), col("m.id"), col("m.fp.v"), col("m.fp.n"))
          .as[(Int, Long, Seq[Double], Double)].collect()
          .sortBy(r => (r._1, r._2)).toSeq
        (cells, mems)
      }
      assert(content(folded) === content(oneShot),
        s"semantic index state diverged in round $round")
    }
  }

  test("the final semantic index serves probes as the model predicts") {
    val rnd = new Random(20260817L)
    val thr = 0.95
    for (round <- 1 to 5) {
      val b1 = randomVecs(rnd, 10, 1 to 30)
      val b2 = randomVecs(rnd, 6, 31 to 60)
      val probeWave = randomVecs(rnd, 6, 100 to 130)
      def df(rows: Seq[(Long, Seq[Double])]) =
        rows.toDF("vec_id", "embedding")
      val i0 = Similarity.semanticCellIndex(df(b1), "vec_id", "embedding",
        nCentroids = 3, refineSample = 16).localCheckpoint()
      val i1 = Similarity.updateSemanticIndex(i0, df(b2),
        "vec_id", "embedding").localCheckpoint()
      val got = Similarity.semanticNearDupsAgainst(i1, df(probeWave),
          "vec_id", "embedding", threshold = thr)
        .select("batch_id", "corpus_id").as[(Long, Long)].collect().toSet
      // driver-side model with the kernel's exact arithmetic order
      val centroids = i0.select("cell", "centroid")
        .as[(Int, Seq[Double])].collect().sortBy(_._1).map(_._2)
      def assign(v: Seq[Double]): Int =
        centroids.zipWithIndex.map { case (c, i) =>
          (v.zip(c).foldLeft(0.0) { case (a, (x, y)) =>
            a + (x - y) * (x - y) }, i)
        }.minBy(identity)._2
      def nrm(v: Seq[Double]) =
        math.sqrt(v.foldLeft(0.0)((a, x) => a + x * x))
      def cos(a: Seq[Double], b: Seq[Double]) =
        a.zip(b).foldLeft(0.0) { case (s, (x, y)) => s + x * y } /
          (nrm(a) * nrm(b))
      val corpus = (b1 ++ b2)
        .foldLeft(scala.collection.immutable.ListMap
          .empty[Long, Seq[Double]]) {
          case (acc, (id, v)) => acc + (id -> v)
        }.toSeq.filter(r => nrm(r._2) > 0)
      val want = (for {
        (pid, pv) <- probeWave if nrm(pv) > 0
        (cid, cv) <- corpus
        if assign(pv) == assign(cv) && cos(pv, cv) >= thr
      } yield (pid, cid)).toSet
      assert(got === want, s"round $round: probe $got vs model $want")
      probePairs += want.size
    }
    assert(probePairs > 0, "vacuous property: no round produced any pair")
  }
  private var probePairs = 0
}
