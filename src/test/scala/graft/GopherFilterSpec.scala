package graft

import graft.textstats.TextStats

/** Gopher-rule composite filter: each rule's bit fires on a
  * constructed violation, integer-exact ratio edges, the empty-doc
  * contract, and partition invariance.
  */
class GopherFilterSpec extends SparkTestBase {
  import spark.implicits._

  private def run(docs: Seq[(Long, String)],
      minWords: Int = 3, minStop: Int = 1) =
    TextStats.gopherFilter(docs.toDF("doc_id", "text"), "doc_id", "text",
        minWords = minWords, maxWords = 10, minMeanLen = 3,
        maxMeanLen = 6, minAlphaFrac = 0.8, maxSymbolRatio = 0.1,
        stopWords = Seq("the", "and"), minStopHits = minStop)
      .orderBy("doc_id")
      .as[(Long, Long, Option[Double], Option[Double], Option[Double],
        Long, Long, Boolean)].collect().toSeq

  test("a clean document keeps with zero reasons") {
    val got = run(Seq((1L, "the quick brown fox and hound")))
    assert(got.head._7 == 0L && got.head._8, s"got $got")
    assert(got.head._2 == 6L)
  }

  test("each rule fires its own bit") {
    val got = run(Seq(
      (1L, "the and"),                            // 2 words < 3 -> bit 1
      (2L, "the and a b c d"),                    // mean len 2.17 -> bit 2
      (3L, "the 123 456 and 789"),                // alpha 2/5 -> bit 4
      (4L, "the # fox and hound runs"),           // symbols 1/6 -> bit 8
      (5L, "quick brown fox jumps high")))        // no stopword -> bit 16
    assert(got.map(r => (r._1, r._7)) == Seq(
      (1L, 1L), (2L, 2L), (3L, 4L), (4L, 8L), (5L, 16L)), s"got $got")
    assert(got.forall(!_._8))
  }

  test("the '...' run counts toward the symbol ratio") {
    // 6 words, one '...' run: ratio 1/6 > 0.1 -> bit 8
    val got = run(Seq((1L, "the fox ... and ran off far")))
    assert((got.head._7 & 8L) == 8L, s"got $got")
  }

  test("mean-word-length edges compare as integers (no float drift)") {
    // sum 9, n 3 -> mean exactly 3.0: the lower bound is inclusive
    val lo = run(Seq((1L, "the abc and")), minWords = 3)
    assert((lo.head._7 & 2L) == 0L, s"mean exactly at the bound: $lo")
    // sum 18, n 3 -> mean exactly 6.0: upper bound inclusive too
    val hi = run(Seq((1L, "abcdef ghijklmno and")), minWords = 3)
    assert((hi.head._7 & 2L) == 0L, s"got $hi")
  }

  test("empty documents fail the evidence-bearing rules") {
    val got = run(Seq((1L, ""), (2L, "   ")))
    got.foreach { r =>
      assert(r._2 == 0L && r._7 == (1L | 2L | 4L | 16L) && !r._8,
        s"got $r")
      assert(r._3.isEmpty && r._4.isEmpty && r._5.isEmpty)
    }
  }

  test("stopword hits count DISTINCT stop words") {
    // 'the' four times is still one distinct hit
    val got = run(Seq((1L, "the the the the fox runs")), minStop = 2)
    assert(got.head._6 == 1L && (got.head._7 & 16L) == 16L, s"got $got")
  }

  test("partition invariance") {
    val docs = (0L until 50L).map(i =>
      (i, s"the w$i and some words here x${i % 9}"))
    val df = docs.toDF("doc_id", "text")
    val a = TextStats.gopherFilter(df, "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    val b = TextStats.gopherFilter(df.repartition(7), "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("guards") {
    val df = Seq((1L, "a")).toDF("doc_id", "text")
    intercept[IllegalArgumentException](
      TextStats.gopherFilter(df, "doc_id", "text", minWords = 0))
    intercept[IllegalArgumentException](
      TextStats.gopherFilter(df, "doc_id", "text", stopWords = Seq.empty))
    intercept[IllegalArgumentException](
      TextStats.gopherFilter(df, "doc_id", "text", minMeanLen = 5,
        maxMeanLen = 4))
  }
}
