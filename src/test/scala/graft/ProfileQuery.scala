package graft

import org.apache.spark.scheduler._
import scala.collection.mutable

/** Per-job wall-time profile of a SparkEntry query:
  * Test/runMain graft.ProfileQuery <sfDir> <q> [reps]
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val q = args(1)
    val reps = if (args.length > 2) args(2).toInt else 2
    val spark = LocalSessions.builder(32, 32)
      .config("spark.sql.adaptive.enabled", "true").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = mutable.LinkedHashMap[Int, (Long, Long, Int, String)]()
    val starts = mutable.HashMap[Int, (Long, Int, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        starts(j.jobId) = (System.nanoTime(), j.stageInfos.size,
          j.stageInfos.map(s => s.name.takeWhile(_ != '\n').take(40))
            .mkString("|"))
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        starts.remove(j.jobId).foreach { case (t0, ns, d) =>
          jobs(j.jobId) = (t0, System.nanoTime() - t0, ns, d)
        }
    })
    spark.range(1000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    for (r <- 1 to reps) {
      jobs.clear()
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, dir).write.format("noop").mode("overwrite").save()
      val total = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200)
      println(f"PROF rep$r $q total $total%.2f s, ${jobs.size} jobs")
      var prevEnd = 0L
      jobs.foreach { case (id, (t0j, d, ns, desc)) =>
        val gap = if (prevEnd == 0) 0.0 else (t0j - prevEnd) / 1e9
        prevEnd = t0j + d
        println(f"  job $id%3d ${d / 1e9}%6.2f s (gap $gap%5.2f) stages=$ns ${desc.take(80)}")
      }
    }
    spark.stop()
  }
}
