package graft

import org.apache.spark.sql.functions._

import graft.text.Chunking

/** Sliding-window chunking: the tokenizer-overflow window rule, full
  * coverage, overlap arithmetic, and edge documents.
  */
class ChunkingSpec extends SparkTestBase {
  import spark.implicits._

  private def chunks(text: String, c: Int, s: Int) =
    Chunking.slidingChunks(Seq((1L, text)).toDF("doc_id", "text"),
        "doc_id", "text", c, s)
      .orderBy("chunk_id")
      .as[(Long, Long, Long, Long, String)].collect().toSeq

  test("hand-checked windows: 10 words, chunk 4, stride 3") {
    val got = chunks("w0 w1 w2 w3 w4 w5 w6 w7 w8 w9", 4, 3)
    assert(got == Seq(
      (1L, 0L, 0L, 4L, "w0 w1 w2 w3"),
      (1L, 1L, 3L, 4L, "w3 w4 w5 w6"),
      (1L, 2L, 6L, 4L, "w6 w7 w8 w9")), s"got $got")
  }

  test("short and exact-width documents emit one chunk; empty none") {
    assert(chunks("a b", 4, 2) == Seq((1L, 0L, 0L, 2L, "a b")))
    assert(chunks("a b c d", 4, 2) == Seq((1L, 0L, 0L, 4L, "a b c d")))
    assert(chunks("", 4, 2).isEmpty)
    assert(chunks("   ", 4, 2).isEmpty)
  }

  test("short tail past the last full window survives") {
    // n=13, chunk 4, stride 4: disjoint windows + a 1-word tail
    val got = chunks((0 until 13).map("w" + _).mkString(" "), 4, 4)
    assert(got.map(r => (r._3, r._4)) ==
      Seq((0L, 4L), (4L, 4L), (8L, 4L), (12L, 1L)))
    assert(got.last._5 == "w12")
  }

  test("tokenizer normalization matches the text tier (lowercase, " +
      "whitespace runs)") {
    val got = chunks("  Alpha\tBETA \n gamma ", 2, 1)
    assert(got.map(_._5) == Seq("alpha beta", "beta gamma"))
  }

  test("coverage and overlap invariants on random documents") {
    val rnd = new scala.util.Random(23)
    for (_ <- 1 to 30) {
      val n = rnd.nextInt(40)
      val c = 1 + rnd.nextInt(8)
      val s = 1 + rnd.nextInt(c)
      val got = chunks((0 until n).map("w" + _).mkString(" "), c, s)
      if (n == 0) assert(got.isEmpty)
      else {
        // full coverage: every word index in exactly the expected chunks
        val covered = got.flatMap(r => r._3 until (r._3 + r._4)).toSet
        assert(covered == (0L until n.toLong).toSet, s"n=$n c=$c s=$s")
        // starts advance by the stride; last chunk reaches the end
        assert(got.map(_._3) == got.indices.map(_.toLong * s))
        assert(got.last._3 + got.last._4 == n.toLong)
        // no chunk is a suffix of its predecessor (the stop rule)
        got.sliding(2).foreach {
          case Seq(a, b) => assert(b._3 + b._4 > a._3 + a._4)
          case _ => ()
        }
        // chunk text is the words of its window
        got.foreach { r =>
          assert(r._5 == (r._3 until (r._3 + r._4))
            .map("w" + _).mkString(" "))
        }
      }
    }
  }

  test("row-local determinism: partitioning never changes output") {
    val docs = (0L until 50L)
      .map(i => (i, (0 until (i % 17).toInt).map("w" + _).mkString(" ")))
      .toDF("doc_id", "text")
    val a = Chunking.slidingChunks(docs, "doc_id", "text", 5, 3)
      .orderBy("doc_id", "chunk_id").collect().toSeq
    val b = Chunking.slidingChunks(docs.repartition(7), "doc_id", "text",
        5, 3)
      .orderBy("doc_id", "chunk_id").collect().toSeq
    assert(a == b)
  }

  test("guards: zero or oversized stride, zero width") {
    val df = Seq((1L, "a")).toDF("doc_id", "text")
    intercept[IllegalArgumentException](
      Chunking.slidingChunks(df, "doc_id", "text", 0, 1))
    intercept[IllegalArgumentException](
      Chunking.slidingChunks(df, "doc_id", "text", 4, 0))
    intercept[IllegalArgumentException](
      Chunking.slidingChunks(df, "doc_id", "text", 4, 5))
  }
}
