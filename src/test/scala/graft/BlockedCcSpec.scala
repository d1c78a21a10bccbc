package graft

import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.sim.Similarity

/** Blocked connected components: the one-aggregation CC for
  * block-confined pair lists (single-assignment candidate generators).
  * Pins exact parity with the iterative operator — on constructed
  * graphs, on the real semantic-pair pipeline, and through the
  * keepBestSurvivors endpoint — plus the string-id fallback gate.
  */
class BlockedCcSpec extends SparkTestBase {
  import spark.implicits._

  private def labels(df: org.apache.spark.sql.DataFrame) =
    df.select(col("id").cast("long"), col("component").cast("long"))
      .as[(Long, Long)].collect().toMap

  test("per-block union-find labels a transitive chain with its min id") {
    // block 7 holds the chain 5-3-8-2 (edges shuffled), block 9 a pair;
    // labels must be the component minimum, exactly like the iterative op
    val pairs = Seq(
      (7, 3L, 8L), (7, 5L, 3L), (7, 8L, 2L),
      (9, 40L, 30L))
      .toDF("block", "id_a", "id_b")
    val got = labels(Dedup.connectedComponentsBlocked(pairs, "block"))
    assert(got === Map(5L -> 2L, 3L -> 2L, 8L -> 2L, 2L -> 2L,
      40L -> 30L, 30L -> 30L))
  }

  test("blocked CC equals iterative CC on constructed multi-block input") {
    // several blocks, each with chains / triangles / isolated pairs
    val pairs = (0 until 8).flatMap { b =>
      val base = b * 100L
      Seq((b, base + 1, base + 2), (b, base + 2, base + 3),
        (b, base + 3, base + 1), // triangle
        (b, base + 10, base + 11), // pair
        (b, base + 20, base + 21), (b, base + 21, base + 22)) // chain
    }.toDF("block", "id_a", "id_b")
    val blocked = labels(Dedup.connectedComponentsBlocked(pairs, "block"))
    val iter = labels(Dedup.connectedComponents(pairs.select("id_a", "id_b"),
      smallGraphEdges = 0))
    assert(blocked === iter)
  }

  test("blocked CC equals iterative CC on real semantic pairs") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .withColumn("embedding", col("embedding").cast("array<double>"))
    val pairs = Similarity.semanticNearDups(emb, "vec_id", "embedding",
      threshold = 0.3, nCentroids = 8)
    val blocked = labels(Dedup.connectedComponentsBlocked(pairs, "block"))
    val iter = labels(Dedup.connectedComponents(pairs.select("id_a", "id_b"),
      smallGraphEdges = 0))
    assert(blocked.nonEmpty, "expected semantic pairs at threshold 0.3")
    assert(blocked === iter)
  }

  test("keepBestSurvivors blocked and iterative paths agree end-to-end") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .withColumn("embedding", col("embedding").cast("array<double>"))
      .withColumn("quality", (col("vec_id") * 7919L) % 1000L)
    val pairs = Similarity.semanticNearDups(emb, "vec_id", "embedding",
      threshold = 0.3, nCentroids = 8)
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("vec_id").as[Long].collect().toSet
    val blocked = ids(Dedup.keepBestSurvivors(emb, "vec_id", pairs,
      "quality", "block"))
    val iter = ids(Dedup.keepBestSurvivors(emb, "vec_id", pairs, "quality"))
    assert(blocked === iter)
    assert(blocked.size < emb.count(), "expected some rows pruned")
  }

  test("edit-distance pairs cluster via their struct block key") {
    // three near-identical docs (1 edit apart pairwise) in one
    // (lang, length) block, an unrelated pair in another: the struct
    // block key groups exactly like the iterative operator
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog", "en"),
      (2L, "the quick brown fox jumps over the lazy doh", "en"),
      (3L, "the quick brown fox jumps over the lazy dot", "en"),
      (40L, "ein schneller brauner fuchs springt heute", "de"),
      (41L, "ein schneller brauner fuchs springt heufe", "de"))
      .toDF("doc_id", "text", "lang")
    val pairs = Dedup.editDistancePairs(docs, "doc_id", "text", "lang",
      lenBucket = 16, maxDist = 5)
    assert(pairs.columns.contains("block"))
    val blocked = labels(Dedup.connectedComponentsBlocked(pairs, "block"))
    val iter = labels(Dedup.connectedComponents(pairs.select("id_a", "id_b"),
      smallGraphEdges = 0))
    assert(blocked === iter)
    assert(blocked === Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      40L -> 40L, 41L -> 40L))
  }

  test("co-grouped blocks on one shuffle key never merge components") {
    // a constant block column lands every edge on one grouping key —
    // the exact state an xxhash64(block) collision would produce for
    // two distinct blocks (a real 64-bit collision can't be staged).
    // Disjoint components must still come out disjoint, because
    // clustering derives from the edges, not the grouping key.
    val pairs = Seq((1L, 2L), (30L, 40L), (500L, 600L))
      .toDF("id_a", "id_b").withColumn("block", lit(0))
    val got = labels(Dedup.connectedComponentsBlocked(pairs, "block"))
    assert(got === Map(1L -> 1L, 2L -> 1L, 30L -> 30L, 40L -> 30L,
      500L -> 500L, 600L -> 500L))
  }

  test("pairs with a null endpoint are ignored by both operators") {
    // a null id carries no connectivity: the shared contract drops the
    // edge up front (the typed blocked path would otherwise fail in its
    // encoder; the iterative path would emit murky null-keyed labels)
    val pairs = Seq(
      (Option(1L), Option(2L)), (Option.empty[Long], Option(3L)),
      (Option(4L), Option.empty[Long]))
      .toDF("id_a", "id_b").withColumn("block", lit(0))
    val want = Map(1L -> 1L, 2L -> 1L)
    assert(labels(Dedup.connectedComponentsBlocked(pairs, "block")) === want)
    assert(labels(Dedup.connectedComponents(pairs.select("id_a", "id_b"),
      smallGraphEdges = 0)) === want)
  }

  test("empty pair lists yield empty components and untouched survivors") {
    val noPairs = Seq.empty[(Int, Long, Long)].toDF("block", "id_a", "id_b")
    assert(Dedup.connectedComponentsBlocked(noPairs, "block").count() === 0)
    assert(Dedup.connectedComponents(noPairs.select("id_a", "id_b"))
      .count() === 0)
    val df = Seq((1L, 5L), (2L, 7L)).toDF("id", "q")
    val kept = Dedup.keepBestSurvivors(df, "id",
      noPairs.select("id_a", "id_b"), "q")
    assert(kept.count() === 2)
  }

  test("non-integral ids fall back to the iterative operator") {
    val pairs = Seq(("b1", "idA", "idB"), ("b1", "idB", "idC"))
      .toDF("block", "id_a", "id_b")
    val got = Dedup.connectedComponentsBlocked(pairs, "block")
      .as[(String, String)].collect().toMap
    assert(got === Map("idA" -> "idA", "idB" -> "idA", "idC" -> "idA"))
  }

  test("validateBlocks turns precondition misuse into a hard failure") {
    // id 2 lives in blocks 1 AND 2 — a multi-bucket generator (MinHash
    // banding) fed to the blocked operator by mistake. Default mode
    // silently emits duplicate labels; the debug flag must fail loudly.
    val bad = Seq((1, 1L, 2L), (2, 2L, 3L)).toDF("block", "id_a", "id_b")
    assert(Dedup.connectedComponentsBlocked(bad, "block").count() === 4,
      "default mode: duplicate (id, component) rows pass through")
    val key = "graft.dedup.validateBlocks"
    try {
      spark.conf.set(key, "true")
      val e = intercept[Exception] {
        Dedup.connectedComponentsBlocked(bad, "block").collect()
      }
      def messages(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x =>
          Option(x.getMessage).toSeq ++ messages(x.getCause))
      assert(messages(e).exists(_.contains("single-assignment")),
        s"failure must name the violated precondition, got: $e")
      // clean input still passes under the flag
      val ok = Seq((1, 1L, 2L), (2, 30L, 40L)).toDF("block", "id_a", "id_b")
      assert(labels(Dedup.connectedComponentsBlocked(ok, "block")) ===
        Map(1L -> 1L, 2L -> 1L, 30L -> 30L, 40L -> 30L))
    } finally spark.conf.unset(key)
  }
}
