package graft

import org.apache.spark.scheduler._
import scala.collection.mutable

/** Per-stage task-metric profile of one query execution: task count,
  * wall span, summed task time, max/median task, deserialize + GC
  * time — distinguishes "32 tiny tasks of pure overhead" from skew
  * and from real compute. `Test/runMain graft.TaskProbe <sfDir> <q>`
  * honors SPARK_GRAFT_CPUS and SPARK_TUNE_CONF like TuneProbe.
  */
object TaskProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val q = args(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    var b = LocalSessions.builder(cpus, cpus)
      .config("spark.sql.adaptive.enabled", "true")
    sys.env.getOrElse("SPARK_TUNE_CONF", "").split(";")
      .map(_.trim).filter(_.contains("=")).foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        b = b.config(k, v)
      }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    case class T(dur: Long, deser: Long, gc: Long, launch: Long,
      finish: Long)
    val stages = mutable.LinkedHashMap[Int, mutable.ArrayBuffer[T]]()
    val stageNames = mutable.HashMap[Int, String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageSubmitted(s: SparkListenerStageSubmitted): Unit =
        synchronized {
          stageNames(s.stageInfo.stageId) =
            s.stageInfo.name.takeWhile(_ != '\n').take(80)
        }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        synchronized {
          val m = t.taskMetrics
          if (m != null) stages.getOrElseUpdate(t.stageId,
            mutable.ArrayBuffer.empty) += T(m.executorRunTime,
              m.executorDeserializeTime, m.jvmGCTime,
              t.taskInfo.launchTime, t.taskInfo.finishTime)
        }
    })
    spark.range(1000).selectExpr("sum(id)").write.format("noop")
      .mode("overwrite").save()
    val fn = SparkEntry.queries(q)
    fn(spark, dir).write.format("noop").mode("overwrite").save() // warm
    Thread.sleep(300)
    synchronized { stages.clear(); stageNames.clear() }
    val t0 = System.nanoTime()
    fn(spark, dir).write.format("noop").mode("overwrite").save()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(300)
    println(f"== $q wall=$wall%.3f s cpus=$cpus")
    stages.toSeq.sortBy(_._1).foreach { case (sid, ts) =>
      val durs = ts.map(_.dur).sorted
      val span = (ts.map(_.finish).max - ts.map(_.launch).min) / 1e3
      println(f"  stage $sid%-4d n=${ts.size}%-4d span=$span%6.3f " +
        f"sumRun=${durs.sum / 1e3}%6.3f maxRun=${durs.max / 1e3}%6.3f " +
        f"medRun=${durs(durs.size / 2) / 1e3}%6.3f " +
        f"deser=${ts.map(_.deser).sum / 1e3}%5.3f " +
        f"gc=${ts.map(_.gc).sum / 1e3}%5.3f  ${stageNames.getOrElse(sid, "?")}")
    }
    spark.stop()
  }
}
