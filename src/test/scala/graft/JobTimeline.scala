package graft

import org.apache.spark.scheduler._

/** Per-job timeline of one query execution: start offset, duration and
  * the GAP since the previous job ended — driver-side work (codegen
  * compile, broadcast relation builds, memo lookups, AQE re-planning)
  * lives in the gaps. `Test/runMain graft.JobTimeline <sfDir> <q>...`
  */
object JobTimeline {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val qs = args.drop(1).toSeq
    val spark = LocalSessions.builder(32, 32)
      .config("spark.sql.adaptive.enabled", "true").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val events = new java.util.concurrent.ConcurrentLinkedQueue[
      (Int, Long, Long, String)]()
    val starts = new java.util.concurrent.ConcurrentHashMap[
      Int, (Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        starts.put(j.jobId, (System.nanoTime(),
          Option(j.properties)
            .flatMap(p => Option(p.getProperty(
              "spark.job.description"))).getOrElse("") + " | " +
            j.stageInfos.map(_.name.takeWhile(_ != '\n')).mkString(";")
              .take(120)))
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val s = starts.remove(j.jobId)
        if (s != null) events.add(
          (j.jobId, s._1, System.nanoTime(), s._2))
      }
    })
    spark.range(1000).selectExpr("sum(id)").write.format("noop")
      .mode("overwrite").save()
    for (q <- qs) {
      val fn = SparkEntry.queries(q)
      fn(spark, dir).write.format("noop").mode("overwrite").save() // warm
      Thread.sleep(300); events.clear()
      val t0 = System.nanoTime()
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      val t1 = System.nanoTime()
      Thread.sleep(300)
      println(f"== $q total=${(t1 - t0) / 1e9}%.3f s")
      var prevEnd = t0
      import scala.jdk.CollectionConverters._
      for ((id, s, e, desc) <- events.asScala.toSeq.sortBy(_._2)) {
        println(f"  job$id%-4d start=${(s - t0) / 1e9}%6.3f " +
          f"dur=${(e - s) / 1e9}%6.3f gapBefore=${(s - prevEnd) / 1e9}%6.3f  $desc")
        prevEnd = math.max(prevEnd, e)
      }
      println(f"  tailGap=${(t1 - prevEnd) / 1e9}%6.3f")
    }
    spark.stop()
  }
}
