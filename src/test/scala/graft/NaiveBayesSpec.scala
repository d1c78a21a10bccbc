package graft

import org.apache.spark.sql.functions._

import graft.textstats.NaiveBayes

/** Multinomial NB quality classifier (graft.textstats.NaiveBayes). */
class NaiveBayesSpec extends SparkTestBase {
  import spark.implicits._

  private def labeled(rows: (Long, String, String)*) =
    rows.toDF("id", "text", "lb")

  test("train counts, smoothing and priors match the hand model") {
    val d = labeled(
      (1L, "spam spam ham", "bad"),
      (2L, "spam offer", "bad"),
      (3L, "ham dinner ham", "good"))
    val m = NaiveBayes.train(d, "text", "lb")
    assert(m.labels == Seq("bad", "good"))
    assert(m.docCounts == Seq(2L, 1L))
    // vocab: spam(3) ham(3) dinner(1) offer(1) -> V = 4
    assert(m.vocabSize == 4L)
    // totals: bad = 3 spam + 1 ham + 1 offer = 5; good = 2 ham + 1 dinner = 3
    assert(m.tokenTotals == Seq(5L, 3L))
    assert(m.counts("spam").toSeq == Seq(3L, 0L))
    assert(m.counts("ham").toSeq == Seq(1L, 2L))
    // score("spam spam", bad) = ln(2/3) + 2·ln((3+1)/(5+4))
    val sc = NaiveBayes.score(Seq((9L, "spam spam")).toDF("id", "text"),
        "id", "text", m)
      .as[(Long, String, Double)].collect().map(t => (t._2, t._3)).toMap
    assert(math.abs(sc("bad") -
      (math.log(2.0 / 3.0) + 2 * math.log(4.0 / 9.0))) < 1e-12)
    assert(math.abs(sc("good") -
      (math.log(1.0 / 3.0) + 2 * math.log(1.0 / 7.0))) < 1e-12)
  }

  test("OOV words and capped-out words share the c=0 likelihood") {
    val d = labeled((1L, "aa aa aa bb", "x"), (2L, "aa cc", "y"))
    val full = NaiveBayes.train(d, "text", "lb")
    // unseen word scores ln(1/(tot+V)) per label
    val s1 = NaiveBayes.score(Seq((9L, "zz")).toDF("id", "text"),
        "id", "text", full)
      .as[(Long, String, Double)].collect().map(t => (t._2, t._3)).toMap
    assert(math.abs(s1("x") -
      (math.log(0.5) + math.log(1.0 / (4 + 3)))) < 1e-12)
    // cap vocab to 1 (keeps aa only): bb/cc become OOV in the model
    val capped = NaiveBayes.train(d, "text", "lb", maxVocab = 1)
    assert(capped.vocabSize == 1L)
    assert(capped.tokenTotals == Seq(3L, 1L))
    val s2 = NaiveBayes.score(Seq((9L, "bb")).toDF("id", "text"),
        "id", "text", capped)
      .as[(Long, String, Double)].collect().map(t => (t._2, t._3)).toMap
    assert(math.abs(s2("x") -
      (math.log(0.5) + math.log(1.0 / (3 + 1)))) < 1e-12)
  }

  test("classify is a deterministic argmax with ties to the smaller label") {
    // symmetric corpus: every token count equal across labels -> equal
    // likelihoods and priors -> tie -> smaller label wins
    val d = labeled((1L, "tok tok", "a"), (2L, "tok tok", "b"))
    val m = NaiveBayes.train(d, "text", "lb")
    val byId = NaiveBayes.classify(
        Seq((1L, "tok"), (2L, "")).toDF("id", "text"), "id", "text", m)
      .collect().map(r => (r.getLong(0), (r.getString(1), r.getDouble(2))))
      .toMap
    assert(byId(1L)._1 == "a" && math.abs(byId(1L)._2) < 1e-12)
    assert(byId(2L)._1 == "a")
    // asymmetric: clear winner and positive margin
    val d2 = labeled((1L, "x x x", "a"), (2L, "y y y", "b"))
    val m2 = NaiveBayes.train(d2, "text", "lb")
    val c2 = NaiveBayes.classify(Seq((1L, "y y")).toDF("id", "text"),
        "id", "text", m2)
      .collect().map(r => (r.getString(1), r.getDouble(2))).head
    assert(c2._1 == "b" && c2._2 > 0)
  }

  test("scores are repartition-invariant") {
    val d = labeled((1L, "a b c a", "x"), (2L, "b b d", "y"),
      (3L, "a d d c", "x"))
    val m = NaiveBayes.train(d, "text", "lb")
    val probe = (1 to 40).map(i => (i.toLong, "a b c d e a b")).toDF("id", "text")
    val one = NaiveBayes.score(probe, "id", "text", m)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(2))
      .toMap
    val many = NaiveBayes.score(probe.repartition(13), "id", "text", m)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(2))
      .toMap
    assert(one == many) // bit-exact: row-local position-ordered folds
  }

  test("modelTable round-trips through modelFromTable") {
    val d = labeled((1L, "a b a", "x"), (2L, "b c", "y"), (3L, "c c", "y"))
    val m = NaiveBayes.train(d, "text", "lb")
    val m2 = NaiveBayes.modelFromTable(NaiveBayes.modelTable(spark, m))
    assert(m2.labels == m.labels && m2.docCounts == m.docCounts &&
      m2.tokenTotals == m.tokenTotals && m2.vocabSize == m.vocabSize)
    assert(m2.counts.view.mapValues(_.toSeq).toMap ==
      m.counts.view.mapValues(_.toSeq).toMap)
    val probe = Seq((9L, "a b z")).toDF("id", "text")
    val s1 = NaiveBayes.score(probe, "id", "text", m).collect()
      .map(r => (r.getString(1), r.getDouble(2))).toMap
    val s2 = NaiveBayes.score(probe, "id", "text", m2).collect()
      .map(r => (r.getString(1), r.getDouble(2))).toMap
    assert(s1 == s2)
  }

  test("a null text scores like an empty document (prior only)") {
    val d = labeled((1L, "a a", "x"), (2L, "b", "y"))
    val m = NaiveBayes.train(d, "text", "lb")
    val got = NaiveBayes.score(
        Seq((1L, null: String), (2L, "")).toDF("id", "text"),
        "id", "text", m)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(2))
      .toMap
    assert(got((1L, "x")) == m.logPrior(0) &&
      got((2L, "x")) == m.logPrior(0))
    assert(got((1L, "y")) == m.logPrior(1))
  }

  test("guards: empty or null-labeled training sets are rejected") {
    intercept[IllegalArgumentException](
      NaiveBayes.train(labeled(), "text", "lb"))
    intercept[IllegalArgumentException](
      NaiveBayes.train(Seq((1L, "a", null: String)).toDF("id", "text", "lb"),
        "text", "lb"))
    intercept[IllegalArgumentException](
      NaiveBayes.train(labeled((1L, "a", "x")), "text", "lb", maxVocab = 0))
  }
}
