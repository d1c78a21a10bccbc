package graft

import scala.collection.mutable

/** In-JVM stack sampler for one query's executor threads: runs the
  * query `reps` times under a 5 ms Thread.getAllStackTraces sampler
  * filtered to "Executor task launch worker" threads and prints the
  * hottest (state, frame) pairs — the lock-contention / hot-method
  * diagnosis tool when task runtimes inflate under concurrency.
  * `Test/runMain graft.HotFrames <sfDir> <q> [reps]`; honors
  * SPARK_GRAFT_CPUS and SPARK_TUNE_CONF.
  */
object HotFrames {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val q = args(1)
    val reps = if (args.length > 2) args(2).toInt else 10
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
    val fn = SparkEntry.queries(q)
    fn(spark, dir).write.format("noop").mode("overwrite").save() // warm
    val hist = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    @volatile var sampling = true
    val sampler = new Thread(() => {
      while (sampling) {
        val all = Thread.getAllStackTraces
        all.forEach { (t, st) =>
          val prefix = sys.env.getOrElse("HOTFRAMES_THREAD",
            "Executor task launch")
          if (t.getName.startsWith(prefix) && st.nonEmpty) {
            val state = t.getState.toString
            // top frame plus first graft/spark frame for context
            val top = st.head.toString
            val ctx = st.find(f => f.getClassName.startsWith("graft.") ||
              f.getClassName.contains("catalyst.expressions"))
              .map(_.toString).getOrElse("")
            val key = s"$state | ${top.take(110)} | ${ctx.take(110)}"
            hist.merge(key, 1, (a, bb) => a + bb)
          }
        }
        Thread.sleep(5)
      }
    })
    sampler.setDaemon(true)
    sampler.start()
    val t0 = System.nanoTime()
    for (_ <- 1 to reps)
      fn(spark, dir).write.format("noop").mode("overwrite").save()
    val wall = (System.nanoTime() - t0) / 1e9
    sampling = false
    Thread.sleep(50)
    println(f"== $q cpus=$cpus reps=$reps wall=$wall%.2f s; hottest frames:")
    import scala.jdk.CollectionConverters._
    hist.asScala.toSeq.sortBy(-_._2).take(25).foreach { case (k, n) =>
      println(f"  $n%6d  $k")
    }
    spark.stop()
  }
}
