package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.textstats.NaiveBayes

/** The NB classifier is a row-local scan-stage expression, so it applies
  * UNMODIFIED to a document stream — zero streaming state, and the
  * per-micro-batch union must equal the one-shot batch classification
  * over the union of documents.
  */
class StreamingClassifySpec extends SparkTestBase {
  import spark.implicits._

  test("streaming classify equals batch classify across micro-batches") {
    implicit val sc = spark.sqlContext
    val train = Seq(
      (1L, "clean prose with varied words", "good"),
      (2L, "more clean readable text here", "good"),
      (3L, "spam spam buy buy spam", "bad"),
      (4L, "buy now spam offer buy", "bad")).toDF("id", "text", "lb")
    val model = NaiveBayes.train(train, "text", "lb")

    val input = MemoryStream[(Long, String)]
    val scored = NaiveBayes.classify(
      input.toDS().toDF("id", "text"), "id", "text", model)
    val q = scored.writeStream.format("memory").queryName("nb_out")
      .outputMode("append").start()
    val b1 = Seq((10L, "clean varied prose"), (11L, "spam buy spam"))
    val b2 = Seq((12L, "readable words here"), (13L, ""))
    input.addData(b1: _*)
    q.processAllAvailable()
    input.addData(b2: _*)
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("nb_out")
      .as[(Long, String, Double)].collect().toSet
    val batch = NaiveBayes.classify((b1 ++ b2).toDF("id", "text"),
        "id", "text", model)
      .as[(Long, String, Double)].collect().toSet
    assert(streamed == batch) // bit-exact: scoring is per-row
    assert(streamed.find(_._1 == 10L).get._2 == "good")
    assert(streamed.find(_._1 == 11L).get._2 == "bad")
  }
}
