package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.sim.Similarity

/** Pins the id-type gates added after round 5's ADVICE: integral ids take
  * the bounded-buffer aggregations / k-heap (the 100 TB memory-contract
  * path), while string and other non-integral ids fall back to the
  * capped collect_list / ranking-window forms. Both branches must emit
  * the SAME logical result — these tests run each operator twice, once
  * with long ids and once with zero-padded string ids (so string order =
  * numeric order), and assert set equality after mapping back. Also
  * covers the previously-untested rankTopK window fallback
  * (sim/Similarity.scala) and the null-cosine parity between branches.
  */
class IdTypeGatingSpec extends SparkTestBase {
  import spark.implicits._

  /** Deterministic pseudo-random unit-ish vector per (id, dim). */
  private def vec(id: Int, dim: Int): Seq[Double] =
    Seq.tabulate(dim)(i => math.sin(id * 31 + i * 7).abs + 0.01)

  private val dim = 8
  private lazy val corpusLong: DataFrame =
    (1 to 12).map(i => (i.toLong, vec(i, dim))).toDF("vec_id", "embedding")
  private def sid(i: Long): String = f"id$i%02d"
  private lazy val corpusStr: DataFrame =
    (1 to 12).map(i => (sid(i), vec(i, dim))).toDF("vec_id", "embedding")
  private lazy val queriesLong = corpusLong.filter($"vec_id" <= 2)
  private lazy val queriesStr = corpusStr.filter($"vec_id" <= sid(2))

  private def normalize(df: DataFrame): Set[(Long, Long, Long)] =
    df.select(
      regexp_replace($"query_id".cast("string"), "id", "").cast("long"),
      regexp_replace($"vec_id".cast("string"), "id", "").cast("long"),
      $"rank")
      .as[(Long, Long, Long)].collect().toSet

  test("rankTopK window fallback (string ids) matches the k-heap path") {
    val kheap = Similarity.bruteForceTopK(corpusLong, "vec_id", "embedding",
      queriesLong, "vec_id", "embedding", k = 4)
    val window = Similarity.bruteForceTopK(corpusStr, "vec_id", "embedding",
      queriesStr, "vec_id", "embedding", k = 4)
    assert(window.schema("vec_id").dataType.typeName == "string")
    assert(normalize(window) == normalize(kheap))
    assert(normalize(kheap).size == 8) // 2 queries x k
  }

  test("rankTopK fallback with dedupCandidates (string ids, LSH tables>1)") {
    val kheap = Similarity.lshTopK(corpusLong, "vec_id", "embedding",
      queriesLong, "vec_id", "embedding", k = 3, planes = 2, tables = 4)
    val window = Similarity.lshTopK(corpusStr, "vec_id", "embedding",
      queriesStr, "vec_id", "embedding", k = 3, planes = 2, tables = 4)
    assert(normalize(window) == normalize(kheap))
  }

  test("window branch drops null-cosine rows like the k-heap branch") {
    // one corrupt (truncated) corpus vector -> NULL cosine against every
    // query; with k > valid candidates the pre-fix window emitted the
    // null-cosine row inside rank k while the k-heap dropped it
    val corrupt = Seq((99L, Seq(1.0, 2.0))).toDF("vec_id", "embedding")
    val corruptS = Seq((sid(99), Seq(1.0, 2.0))).toDF("vec_id", "embedding")
    val cL = corpusLong.filter($"vec_id" <= 4).union(corrupt)
    val cS = corpusStr.filter($"vec_id" <= sid(4)).union(corruptS)
    val kheap = Similarity.bruteForceTopK(cL, "vec_id", "embedding",
      queriesLong, "vec_id", "embedding", k = 10)
    val window = Similarity.bruteForceTopK(cS, "vec_id", "embedding",
      queriesStr, "vec_id", "embedding", k = 10)
    val n = normalize(window)
    assert(n == normalize(kheap))
    assert(!n.exists(_._2 == 99L), "corrupt vector must never rank")
  }

  private val nearDupDocs: Seq[(Long, String)] = {
    val base = "the quick brown fox jumps over the lazy dog again and again " +
      "while the rain in spain stays mainly on the plain every day"
    Seq(
      1L -> base,
      2L -> (base + " extra"),          // near-dup of 1
      3L -> base.replace("fox", "cat"), // near-dup of 1
      4L -> "completely different text about spark catalyst expression codegen and shuffles partitions exchange hash aggregate",
      5L -> "yet another unrelated document mentioning minhash signatures banding buckets jaccard verification thresholds"
    )
  }

  private def pairSet(df: DataFrame): Set[(Long, Long)] =
    df.select(
      regexp_replace($"id_a".cast("string"), "d", "").cast("long"),
      regexp_replace($"id_b".cast("string"), "d", "").cast("long"))
      .as[(Long, Long)].collect().toSet

  private lazy val docsLong = nearDupDocs.toDF("doc_id", "text")
  private lazy val docsStr =
    nearDupDocs.map { case (i, t) => (f"d$i%02d", t) }.toDF("doc_id", "text")

  test("minhashNearDups: string-id fallback matches the bounded-agg path") {
    val long = pairSet(Dedup.minhashNearDups(docsLong, "doc_id", "text"))
    val str = pairSet(Dedup.minhashNearDups(docsStr, "doc_id", "text"))
    assert(str == long)
    assert(long.nonEmpty, "expected at least one near-dup pair")
  }

  test("incremental probes: string-id fallback matches the bounded-agg path") {
    // corpus = odd ids, batch = even ids; both the batch index probe and
    // the streaming twin's bucket table must emit the same pairs when
    // ids are strings (capped collect_list branch) as when they are
    // longs (bounded-aggregator branch)
    def split(df: DataFrame, strIds: Boolean) = {
      val sigs = Dedup.minhashSignatures(df, "doc_id", "text")
      val odd = if (strIds) sigs.filter(
          regexp_replace($"id", "d", "").cast("long") % 2 === 1)
        else sigs.filter($"id" % 2 === 1)
      val even = if (strIds) sigs.filter(
          regexp_replace($"id", "d", "").cast("long") % 2 === 0)
        else sigs.filter($"id" % 2 === 0)
      (odd, even)
    }
    def probePairs(df: DataFrame, strIds: Boolean): Set[(Long, Long)] = {
      val (corpus, batch) = split(df, strIds)
      Dedup.minhashNearDupsAgainst(corpus, batch, threshold = 0.4)
        .select(
          regexp_replace($"batch_id".cast("string"), "d", "").cast("long"),
          regexp_replace($"corpus_id".cast("string"), "d", "").cast("long"))
        .as[(Long, Long)].collect().toSet
    }
    val long = probePairs(docsLong, strIds = false)
    val str = probePairs(docsStr, strIds = true)
    assert(str == long)
    assert(long.nonEmpty, "expected at least one cross-split pair")
    // the probe-ready bucket table also rides the gate (string ids take
    // the collect_list branch inside smallestKIds)
    val (corpusS, batchS) = split(docsStr, strIds = true)
    val viaTable = graft.streaming.StreamingNearDup.nearDupsAgainstIndex(
        docsStr.withColumn("ts", to_timestamp(lit("2024-01-01 00:00:00")))
          .join(batchS.select($"id".as("doc_id")), Seq("doc_id"), "left_semi"),
        Dedup.minhashBucketTable(corpusS), threshold = 0.4)
      .select(
        regexp_replace($"batch_id".cast("string"), "d", "").cast("long"),
        regexp_replace($"corpus_id".cast("string"), "d", "").cast("long"))
      .as[(Long, Long)].collect().toSet
    assert(viaTable == long)
  }

  test("simhashNearDups: string-id fallback matches the bounded-agg path") {
    val long = pairSet(Dedup.simhashNearDups(docsLong, "doc_id", "text",
      maxHamming = 10))
    val str = pairSet(Dedup.simhashNearDups(docsStr, "doc_id", "text",
      maxHamming = 10))
    assert(str == long)
    assert(long.nonEmpty, "expected at least one simhash pair")
  }

  test("cosineNearDups: string-id fallback matches the bounded-agg path") {
    val dupLong = corpusLong.union(
      Seq((101L, vec(1, dim).map(_ * 1.0001))).toDF("vec_id", "embedding"))
    val dupStr = corpusStr.union(
      Seq((sid(101), vec(1, dim).map(_ * 1.0001))).toDF("vec_id", "embedding"))
    def pairs(df: DataFrame) = df.select(
      regexp_replace($"id_a".cast("string"), "id", "").cast("long"),
      regexp_replace($"id_b".cast("string"), "id", "").cast("long"))
      .as[(Long, Long)].collect().toSet
    val long = pairs(Similarity.cosineNearDups(dupLong, "vec_id", "embedding",
      threshold = 0.999, planes = 2))
    val str = pairs(Similarity.cosineNearDups(dupStr, "vec_id", "embedding",
      threshold = 0.999, planes = 2))
    assert(str == long)
    assert(long.contains((1L, 101L)), "the planted near-dup must be found")
  }

  test("int ids ride the bounded agg and keep their type downstream") {
    val docsInt = nearDupDocs.map { case (i, t) => (i.toInt, t) }
      .toDF("doc_id", "text")
    val out = Dedup.minhashNearDups(docsInt, "doc_id", "text")
    assert(out.schema("id_a").dataType.typeName == "integer")
    assert(pairSet(out.select($"id_a".cast("long").as("id_a"),
      $"id_b".cast("long").as("id_b"))) == pairSet(
      Dedup.minhashNearDups(docsLong, "doc_id", "text")))
  }

  test("null ids are dropped, not thrown") {
    val withNull = docsLong.union(
      Seq((null.asInstanceOf[java.lang.Long], "the quick brown fox jumps over the lazy dog again and again while the rain in spain stays mainly on the plain every day"))
        .map(t => (Option(t._1).map(_.toLong), t._2))
        .toDF("doc_id", "text"))
    val out = pairSet(Dedup.minhashNearDups(withNull, "doc_id", "text"))
    assert(out == pairSet(Dedup.minhashNearDups(docsLong, "doc_id", "text")))
  }
}
