package graft

import org.apache.spark.scheduler._
import scala.collection.mutable

/** Batch job-count profile of many SparkEntry queries in ONE session —
  * the round-16 fixed-cost sweep tool (verdict #5). For each query:
  * warm once, then `reps` timed runs recording wall seconds, Spark job
  * count, summed job time and summed scheduling gap (wall time not
  * inside any job ≈ driver/planning tax).
  *
  * Test/runMain graft.ProfileSweep <sfDir> [reps] [q1,q2,...]
  * (no query list → a built-in sub-second-tier candidate set)
  */
object ProfileSweep {
  val DefaultQueries: Seq[String] = Seq(
    "j13_auto_join", "ev_sessionize", "sc_skew", "sc_profile",
    "sc_profile_drift", "sc_profile_text", "a11_rollup",
    "ev_funnel_summary", "ev_cohort_retention", "w13_rank_family",
    "dd_dup_fraction", "bt_metrics", "sc_histogram", "ev_funnel",
    "u4_upsert", "j11_salted_join", "sc_sample_quantiles",
    "ts_domain_mix", "sc_hll_distinct", "ev_cohort_retention")

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val qs = if (args.length > 2) args(2).split(",").toSeq.map(_.trim)
      else DefaultQueries.distinct
    val spark = LocalSessions.builder(32, 32)
      .config("spark.sql.adaptive.enabled", "true").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    @volatile var jobs = 0
    @volatile var jobNanos = 0L
    val starts = mutable.HashMap[Int, Long]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        synchronized { starts(j.jobId) = System.nanoTime() }
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        synchronized {
          starts.remove(j.jobId).foreach { t0 =>
            jobs += 1; jobNanos += System.nanoTime() - t0
          }
        }
    })
    spark.range(1000).selectExpr("sum(id)").write.format("noop")
      .mode("overwrite").save()
    def run(q: String): (Double, Int, Double) = {
      synchronized { jobs = 0; jobNanos = 0L }
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, dir).write.format("noop")
        .mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(120) // let listener drain
      (wall, jobs, jobNanos / 1e9)
    }
    val rows = qs.map { q =>
      run(q) // warm (codegen + memo fills behave as in bench reps 2+)
      val trials = (1 to reps).map(_ => run(q))
      val best = trials.minBy(_._1)
      (q, best._1, best._2, best._3)
    }
    println(f"${"query"}%-28s ${"wall"}%7s ${"jobs"}%5s ${"jobSum"}%7s ${"tax"}%7s")
    rows.sortBy(-_._2).foreach { case (q, w, j, js) =>
      println(f"$q%-28s $w%7.3f $j%5d $js%7.3f ${w - js}%7.3f")
    }
    println("SWEEP_TOTAL " + f"${rows.map(_._2).sum}%.3f s over ${rows.size} queries")
    spark.stop()
  }
}
