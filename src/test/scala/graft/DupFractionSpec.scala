package graft

import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** Per-document duplication fraction: hand-checked counts, the NULL
  * contract for gramless docs, agreement with the destructive scrub's
  * touched-document set, and partition invariance.
  */
class DupFractionSpec extends SparkTestBase {
  import spark.implicits._

  test("hand-checked 3-gram counts") {
    val docs = Seq(
      (1L, "a b c d e"),   // grams abc bcd cde
      (2L, "a b c d f"),   // grams abc bcd cdf — shares abc, bcd with 1
      (3L, "x y"),         // too short: zero grams
      (4L, "p q r s")      // unique grams
    ).toDF("doc_id", "text")
    val got = Dedup.dupGramFraction(docs, "doc_id", "text", n = 3)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Option[Double])].collect().toSeq
    assert(got == Seq(
      (1L, 3L, 2L, Some(2.0 / 3.0)),
      (2L, 3L, 2L, Some(2.0 / 3.0)),
      (3L, 0L, 0L, None),
      (4L, 2L, 0L, Some(0.0))), s"got $got")
  }

  test("maxDocs raises the repetition bar") {
    val docs = Seq((1L, "a b c d"), (2L, "a b c e"), (3L, "a b c f"))
      .toDF("doc_id", "text")
    // 'a b c' is in 3 docs: repeated at maxDocs=1 and 2, not at 3
    val m2 = Dedup.dupGramFraction(docs, "doc_id", "text", 3, maxDocs = 2)
      .orderBy("doc_id").as[(Long, Long, Long, Option[Double])].collect()
    assert(m2.forall(_._3 == 1L))
    val m3 = Dedup.dupGramFraction(docs, "doc_id", "text", 3, maxDocs = 3)
      .orderBy("doc_id").as[(Long, Long, Long, Option[Double])].collect()
    assert(m3.forall(_._3 == 0L))
  }

  test("zero dup fraction iff the destructive scrub would not touch " +
      "the doc (random corpora)") {
    val rnd = new scala.util.Random(31)
    for (_ <- 1 to 5) {
      val vocab = Vector("aa", "bb", "cc", "dd", "ee")
      val docs = (0L until 30L).map { i =>
        (i, (0 until (4 + rnd.nextInt(12)))
          .map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }.toDF("doc_id", "text")
      val frac = Dedup.dupGramFraction(docs, "doc_id", "text", n = 4)
        .as[(Long, Long, Long, Option[Double])].collect()
        .map(r => r._1 -> r._3).toMap
      val scrub = Dedup.scrubRepeatedNgrams(docs, "doc_id", "text", n = 4)
        .as[(Long, String, Long)].collect()
        .map(r => r._1 -> r._3).toMap
      frac.foreach { case (id, nDup) =>
        assert((nDup > 0L) == (scrub(id) > 0L),
          s"doc $id: n_dup_grams=$nDup but scrub removed ${scrub(id)}")
      }
    }
  }

  test("partition invariance") {
    val docs = (0L until 40L)
      .map(i => (i, s"t${i % 7} u${i % 3} v w x y z q${i % 5} r s"))
      .toDF("doc_id", "text")
    val a = Dedup.dupGramFraction(docs, "doc_id", "text", 3)
      .orderBy("doc_id").collect().toSeq
    val b = Dedup.dupGramFraction(docs.repartition(9), "doc_id", "text", 3)
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("guards") {
    val df = Seq((1L, "a")).toDF("doc_id", "text")
    intercept[IllegalArgumentException](
      Dedup.dupGramFraction(df, "doc_id", "text", n = 1))
    intercept[IllegalArgumentException](
      Dedup.dupGramFraction(df, "doc_id", "text", 3, maxDocs = 0))
  }
}
