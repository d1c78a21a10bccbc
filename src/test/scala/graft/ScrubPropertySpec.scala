package graft

import scala.util.Random

import graft.dedup.Dedup

/** Property test for the repeated n-gram scrub against an independent
  * in-memory reference model: random small-vocab corpora (so cross-doc
  * gram collisions are common), random n / maxDocs, and a random input
  * partitioning each round. The model recomputes the contract from its
  * definition — gram occurrence counts by DISTINCT doc, covered-position
  * union, order-preserving reassembly — with plain Scala collections, no
  * Spark. Catches exactly the classes a hand-picked example misses:
  * overlapping repeats interleaving their masks, repeats at document
  * edges, docs made entirely of repeated material, empty-string words
  * from double spaces, and partition-order sensitivity.
  */
class ScrubPropertySpec extends SparkTestBase {
  import spark.implicits._

  private def model(docs: Seq[(Long, String)], n: Int, maxDocs: Int,
      keepFirst: Boolean = false): Map[Long, (String, Long)] = {
    val words = docs.map { case (id, t) => id -> t.split(" ", -1).toSeq }.toMap
    val occs = scala.collection.mutable.Map[Seq[String], List[(Long, Int)]]()
    for ((id, w) <- words; p <- 0 to w.length - n)
      occs.updateWith(w.slice(p, p + n))(o => Some((id, p) :: o.getOrElse(Nil)))
    // per repeated gram: the occurrences to scrub (all, or all but the
    // (id, p)-first canonical one)
    val scrub = occs.filter(_._2.map(_._1).distinct.size > maxDocs)
      .view.mapValues { o =>
        val sorted = o.sorted
        (if (keepFirst) sorted.tail else sorted).toSet
      }.toMap
    docs.map { case (id, t) =>
      val w = words(id)
      val removed = (for {
        p <- 0 to w.length - n
        o <- scrub.get(w.slice(p, p + n)).toSeq if o((id, p))
        q <- p until p + n
      } yield q).toSet
      val clean =
        if (removed.isEmpty) t
        else w.zipWithIndex.collect { case (x, i) if !removed(i) => x }
          .mkString(" ")
      id -> (clean, removed.size.toLong)
    }.toMap
  }

  test("scrub matches the reference model on random corpora") {
    val rnd = new Random(20260813L)
    val vocab = Vector("a", "b", "c", "d", "e")
    for (round <- 1 to 25) {
      val n = 2 + rnd.nextInt(3)           // 2..4
      val maxDocs = 1 + rnd.nextInt(2)     // 1..2
      val nDocs = 3 + rnd.nextInt(6)
      val docs = (1L to nDocs.toLong).map { id =>
        val len = rnd.nextInt(12)
        id -> Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      }
      val keepFirst = rnd.nextBoolean()
      val expected = model(docs, n, maxDocs, keepFirst)
      val out = Dedup.scrubRepeatedNgrams(
          docs.toDF("doc_id", "text").repartition(1 + rnd.nextInt(5)),
          "doc_id", "text", n, maxDocs, keepFirst)
        .collect()
        .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2)))
        .toMap
      assert(out === expected,
        s"round $round (n=$n maxDocs=$maxDocs keepFirst=$keepFirst): $docs")
    }
  }

  test("keepFirstCopy keeps the first document's copy of a shared passage") {
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (1L, "a b c d e unique one"),
      (2L, "other words a b c d e"),
      (3L, "a b c d e trailing bits")).toDF("doc_id", "text")
    val out = Dedup.scrubRepeatedNgrams(docs, "doc_id", "text",
        n = 5, maxDocs = 1, keepFirstCopy = true)
      .orderBy(col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // doc 1 holds the canonical (min doc, min p) copy -> intact;
    // docs 2 and 3 lose the passage
    assert(out(0) === ((1L, "a b c d e unique one", 0L)))
    assert(out(1) === ((2L, "other words", 5L)))
    assert(out(2) === ((3L, "trailing bits", 5L)))
  }

  test("scrub round-trips double spaces in untouched and touched docs") {
    // split-on-space yields empty-string words for runs of spaces; both
    // engines must agree that they are words like any other
    val docs = Seq(
      (1L, "a  b c d"),   // double space -> ("a","","b","c","d")
      (2L, "a  b c e"),
      (3L, "x y  z")).toDF("doc_id", "text")
    val out = Dedup.scrubRepeatedNgrams(docs, "doc_id", "text",
        n = 3, maxDocs = 1)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // shared gram ("a","","b") covers positions 0..2 in docs 1 and 2
    // (and ("", "b", "c") covers 1..3 -> union 0..3)
    assert(out(0) === ((1L, "d", 4L)))
    assert(out(1) === ((2L, "e", 4L)))
    assert(out(2) === ((3L, "x y  z", 0L)))
  }

  /** Independent span model: witness positions of cross-doc repeated
    * grams, merged when the next witness is within n.
    */
  private def spanModel(docs: Seq[(Long, String)], n: Int,
      maxDocs: Int): Seq[(Long, Long, Long, Long)] = {
    val words = docs.map { case (id, t) => id -> t.split(" ", -1).toSeq }.toMap
    val occs = scala.collection.mutable.Map[Seq[String], List[(Long, Int)]]()
    for ((id, w) <- words; p <- 0 to w.length - n)
      occs.updateWith(w.slice(p, p + n))(o => Some((id, p) :: o.getOrElse(Nil)))
    val repeated = occs.filter(_._2.map(_._1).distinct.size > maxDocs)
    val byDoc = repeated.values.flatten.toSeq.groupBy(_._1)
      .view.mapValues(_.map(_._2).distinct.sorted).toMap
    (for ((id, ps) <- byDoc.toSeq; grp <- {
      val islands = scala.collection.mutable.ArrayBuffer[List[Int]]()
      for (p <- ps) {
        if (islands.nonEmpty && p - islands.last.head <= n)
          islands(islands.size - 1) = p :: islands.last
        else islands += List(p)
      }
      islands.map(_.reverse)
    }) yield (id, grp.head.toLong, (grp.last + n - 1).toLong,
        grp.size.toLong))
      .sortBy(t => (t._1, t._2))
  }

  test("dupSpans matches the independent span model on random corpora") {
    import org.apache.spark.sql.functions.col
    val rnd = new Random(20260815L)
    val vocab = Vector("a", "b", "c", "d", "e")
    for (round <- 1 to 25) {
      val n = 2 + rnd.nextInt(3)
      val maxDocs = 1 + rnd.nextInt(2)
      val nDocs = 3 + rnd.nextInt(6)
      val docs = (1L to nDocs.toLong).map { id =>
        val len = rnd.nextInt(14)
        id -> Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      }
      val expected = spanModel(docs, n, maxDocs)
      val out = Dedup.dupSpans(
          docs.toDF("doc_id", "text").repartition(1 + rnd.nextInt(5)),
          "doc_id", "text", n, maxDocs)
        .orderBy(col("doc_id"), col("span_start")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSeq
      assert(out === expected,
        s"round $round (n=$n maxDocs=$maxDocs): $docs")
    }
  }

  test("dupSpans merges overlapping witnesses and splits distant ones") {
    import org.apache.spark.sql.functions.col
    // docs 1/2 share "a b c" at positions 0 AND 6 (gap 6 > n=3 -> two
    // spans); doc 3 is clean (no 3-gram shared with any other doc)
    val docs = Seq(
      (1L, "a b c x y z a b c"),
      (2L, "a b c q r s a b c"),
      (3L, "p q t s u v w")).toDF("doc_id", "text")
    val out = Dedup.dupSpans(docs, "doc_id", "text", n = 3, maxDocs = 1)
      .orderBy(col("doc_id"), col("span_start")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq(
      (1L, 0L, 2L, 1L), (1L, 6L, 8L, 1L),
      (2L, 0L, 2L, 1L), (2L, 6L, 8L, 1L)))
  }
}
