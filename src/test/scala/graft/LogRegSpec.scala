package graft

import graft.textstats.LogReg
import org.apache.spark.sql.functions._

class LogRegSpec extends SparkTestBase {
  import spark.implicits._

  // corpus with a controlled stopword ratio: `k` of 20 tokens are 'the'
  private def doc(id: Long, k: Int): (Long, String) = {
    val toks = Seq.fill(k)("the") ++
      (0 until (20 - k)).map(i => s"w${(id + i) % 37}")
    (id, toks.mkString(" "))
  }

  private def corpus = spark.createDataFrame(
    // ratio k/20 sweeps 0..50%: label = (stops*20 >= toks) = (k >= 1)
    // would be trivial, so use ids to spread k in {0, 1, 2, 4, 8, 10}
    (0L until 240L).map(i => doc(i, Seq(0, 0, 0, 1, 2, 4, 8, 10)(
      (i % 8).toInt)))).toDF("doc_id", "text")

  test("features are exact small integers with pinned caps") {
    val f = LogReg.features(
      Seq((1L, "the the of xx yy"), (2L, ""), (3L, "a" * 200000))
        .toDF("doc_id", "text"), "doc_id", "text")
      .orderBy("doc_id").collect()
    // doc 1: 5 toks, 16 chars, 3 stops, 4 uniq (the/of/xx/yy)
    assert(f(0).toSeq.drop(1) === Seq(1L, 5L / 100L, (16L * 1000 / 5) / 1000,
      (3L * 1000 / 5) / 10, 16L / 1000, (4L * 1000 / 5) / 100, 1L))
    // doc 2 (empty): all-zero features except bias, label 0
    assert(f(1).toSeq.drop(1) === Seq(1L, 0L, 0L, 0L, 0L, 0L, 0L))
    // doc 3: one 200k-char token — x2 capped at 20, x4 capped at 100
    assert(f(2).toSeq.drop(1) === Seq(1L, 0L, 20L, 0L, 100L, 10L, 0L))
  }

  test("training learns the stopword rule and is partition-invariant") {
    val df = corpus
    val (w, m) = LogReg.train(df, "doc_id", "text", iterations = 12)
    assert(m === 240L)
    // the stopword percentile is THE signal: its weight must be the
    // largest positive one
    assert(w(3) > 0 && w(3) === w.max)
    val scored = LogReg.score(df, "doc_id", "text", w)
    val acc = scored.filter(col("pred") === col("y")).count().toDouble /
      scored.count()
    assert(acc >= 0.95, s"accuracy $acc")
    // bit-identical weights under a different partitioning / row order
    val (w2, _) = LogReg.train(
      df.repartition(7, col("text")).sortWithinPartitions(desc("doc_id")),
      "doc_id", "text", iterations = 12)
    assert(w2.toSeq === w.toSeq)
  }

  test("score emits the pinned fixed-point link and sign decision") {
    val df = corpus
    val (w, _) = LogReg.train(df, "doc_id", "text", iterations = 3)
    val rows = LogReg.score(df, "doc_id", "text", w).collect()
    for (r <- rows) {
      val z = r.getLong(1); val p = r.getLong(2)
      assert(z >= -LogReg.ZCap && z <= LogReg.ZCap)
      // fast sigmoid stays in (0, Scale) and matches the local formula
      val expP = LogReg.Scale / 2 +
        z * LogReg.Scale / (2 * (LogReg.Scale + math.abs(z)))
      assert(p === expP)
      assert(r.getLong(3) === (if (z >= 0) 1L else 0L))
    }
  }

  test("trainedWeights row matches train() and validation fails loudly") {
    val df = corpus.limit(40)
    val (w, m) = LogReg.train(df, "doc_id", "text", iterations = 2)
    val row = LogReg.trainedWeights(df, "doc_id", "text", iterations = 2)
      .collect()(0)
    assert((0 until 6).map(row.getLong) === w.toSeq)
    assert(row.getLong(6) === m)
    intercept[IllegalArgumentException] {
      LogReg.train(df, "doc_id", "text", iterations = 0)
    }
    intercept[IllegalArgumentException] {
      LogReg.score(df, "doc_id", "text", Array(1L, 2L))
    }
  }
}
