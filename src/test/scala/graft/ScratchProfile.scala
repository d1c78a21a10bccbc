package graft

import org.apache.spark.sql.functions._

/** Scratch stage-by-stage profiler (not part of the suite). */
object ScratchProfile {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.sources.Sources
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"SCRATCH $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val docs = Sources.readTable(spark, dir, "documents")
    noop(docs.select(col("doc_id")))
    val sh = docs.select(col("doc_id").as("id"),
        graft.dedup.Dedup.shingles(col("text"), 4).as("sh"))
      .filter(size(col("sh")) > 0)
    val posting = sh.select(col("id"), size(col("sh")).as("n"),
      explode(transform(col("sh"), s => xxhash64(s))).as("g"))
    val rare = posting.groupBy("g").agg(count(lit(1)).as("df_count"))
      .filter(col("df_count") <= 20 && col("df_count") > 1)
    val expanded = posting.join(rare.select("g"), Seq("g"))
      .groupBy("g")
      .agg(sort_array(collect_list(struct(col("id"), col("n")))).as("members"))
      .select(explode(graft.dedup.Dedup.orderedPairs(col("members"))).as("p"))
    println("  n_raw=" + expanded.count())
    val lenOk = expanded.filter(least(col("p.a.n"), col("p.b.n")).cast("double") /
      greatest(col("p.a.n"), col("p.b.n")) >= 0.5)
    println("  n_lenok=" + lenOk.count())
    val dist = lenOk.select(col("p.a.id").as("id_a"), col("p.b.id").as("id_b")).distinct()
    println("  n_dist=" + dist.count())
    for (_ <- 1 to 2) {
      val verified = dist
        .join(sh.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
        .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
        .withColumn("jaccard",
          size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
            size(array_union(col("sh_a"), col("sh_b"))))
        .filter(col("jaccard") >= 0.5)
      time("verify-joins") { noop(verified) }
      time("candidates") { noop(dist) }
      time("full-query") {
        noop(SparkEntry.queries("dd_ngram_jaccard")(spark, dir))
      }
    }
    spark.stop()
  }
}
