package graft

import org.apache.spark.sql.functions._

import graft.text.Dsir

/** DSIR importance reweighting: histogram correctness, hand-checked
  * log-ratio scoring, target-affinity ordering, empty-doc contract,
  * and partition invariance.
  */
class DsirSpec extends SparkTestBase {
  import spark.implicits._

  private val B = 16

  /** The bucket of a word, via the SAME Spark expression the operator
    * uses (one-row evaluation — the test's only hash source).
    */
  private def bucketOf(w: String): Int =
    Seq(w).toDF("w")
      .select(Dsir.wordBucket(col("w"), B)).as[Long].head().toInt

  test("bucketCounts is the exact hashed histogram") {
    val df = Seq((1L, "x x y"), (2L, "y z")).toDF("doc_id", "text")
    val got = Dsir.bucketCounts(df, "text", B)
    val exp = Array.fill(B)(0L)
    Seq("x", "x", "y", "y", "z").foreach(w => exp(bucketOf(w)) += 1)
    assert(got.toSeq == exp.toSeq)
    assert(got.sum == 5L)
  }

  test("importanceWeights folds the per-position log ratios exactly") {
    val target = Seq((1L, "x x x y")).toDF("doc_id", "text")
    val raw = Seq((1L, "x y y z"), (2L, "z z")).toDF("doc_id", "text")
    val lr = Dsir.featureLogRatios(target, raw, "text", B)
    // independent model: same Math.log arithmetic, position order
    val ct = Array.fill(B)(0L); val cr = Array.fill(B)(0L)
    Seq("x", "x", "x", "y").foreach(w => ct(bucketOf(w)) += 1)
    Seq("x", "y", "y", "z", "z", "z").foreach(w => cr(bucketOf(w)) += 1)
    val expLr = Array.tabulate(B)(b =>
      math.log((ct(b) + 1.0) / (ct.sum + B)) -
        math.log((cr(b) + 1.0) / (cr.sum + B)))
    assert(lr.toSeq == expLr.toSeq)
    val got = Dsir.importanceWeights(raw, "doc_id", "text", lr)
      .orderBy("doc_id").as[(Long, Long, Double)].collect().toSeq
    val exp1 = Seq("x", "y", "y", "z").foldLeft(0.0)(
      (a, w) => a + expLr(bucketOf(w)))
    val exp2 = Seq("z", "z").foldLeft(0.0)((a, w) => a + expLr(bucketOf(w)))
    assert(got == Seq((1L, 4L, exp1), (2L, 2L, exp2)), s"got $got")
  }

  test("docs resembling the target outscore docs that do not") {
    val target = (0L until 20L).map(i => (i, "alpha beta gamma alpha"))
      .toDF("doc_id", "text")
    val raw = Seq(
      (1L, "alpha beta gamma"), (2L, "alpha noise junk"),
      (3L, "noise junk filler"), (4L, "")).toDF("doc_id", "text")
    val scored = Dsir.importanceWeights(raw, "doc_id", "text",
        Dsir.featureLogRatios(target, raw, "text", 64))
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(scored(1L) > scored(2L) && scored(2L) > scored(3L),
      s"got $scored")
    assert(scored(4L) == 0.0, "empty doc carries no evidence")
  }

  test("selectTopK keeps the k best by (logw desc, id) with ranks") {
    val target = Seq((0L, "good words here")).toDF("doc_id", "text")
    val raw = (0L until 30L).map { i =>
      (i, if (i % 3 == 0) "good words here" else "other stuff entirely")
    }.toDF("doc_id", "text")
    val got = Dsir.selectTopK(raw, "doc_id", "text", target, "text",
        k = 5, buckets = 64)
      .orderBy("rank").as[(Long, Long, Double, Long)].collect().toSeq
    assert(got.map(_._4) == Seq(1L, 2L, 3L, 4L, 5L))
    // the five best are all target-like docs, in id order (equal scores)
    assert(got.map(_._1) == Seq(0L, 3L, 6L, 9L, 12L), s"got $got")
  }

  test("scoring is partition-invariant to the bit") {
    val rnd = new scala.util.Random(13)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff")
    val raw = (0L until 60L).map { i =>
      (i, (0 until rnd.nextInt(20))
        .map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }.toDF("doc_id", "text")
    val target = raw.filter(col("doc_id") % 5 === 0)
    val lr = Dsir.featureLogRatios(target, raw, "text", 32)
    val a = Dsir.importanceWeights(raw, "doc_id", "text", lr)
      .orderBy("doc_id").collect().toSeq
    val b = Dsir.importanceWeights(raw.repartition(11), "doc_id", "text", lr)
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("guards") {
    val df = Seq((1L, "a")).toDF("doc_id", "text")
    intercept[IllegalArgumentException](Dsir.bucketCounts(df, "text", 1))
    intercept[IllegalArgumentException](
      Dsir.importanceWeights(df, "doc_id", "text", Array.empty[Double]))
    intercept[IllegalArgumentException](
      Dsir.selectTopK(df, "doc_id", "text", df, "text", k = 0))
  }
}
