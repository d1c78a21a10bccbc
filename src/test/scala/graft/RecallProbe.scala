package graft

import org.apache.spark.sql.functions._

import graft.sim.Similarity

/** Measures ANN recall@5 against the exact brute-force answer at any
  * scale factor — the per-round evidence tool behind the COVERAGE.md
  * recall numbers (SimilarityRecallSpec pins floors at sf0.01; this
  * prints the measured values, e.g. at sf0.1 where the corpus is 10x).
  *
  *   sbt "Test/runMain graft.RecallProbe /root/testdata/sf0.1 48"
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val nQueries = if (args.length > 1) args(1).toInt else 48
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .withColumn("embedding", col("embedding").cast("array<double>"))
    val queries = emb.filter(col("vec_id") < nQueries)
    val k = 5
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
      queries, "vec_id", "embedding", k).select("query_id", "vec_id").cache()
    val denom = exact.count().toDouble
    def recall(approx: org.apache.spark.sql.DataFrame): Double =
      approx.select("query_id", "vec_id").intersect(exact).count() / denom
    val lsh = recall(Similarity.lshTopK(emb, "vec_id", "embedding",
      queries, "vec_id", "embedding", k, planes = 4, tables = 16))
    val ivf = recall(Similarity.ivfTopK(emb, "vec_id", "embedding",
      queries, "vec_id", "embedding", k, nCentroids = 16, nProbe = 8))
    println(f"RECALL sf=$dir queries=$nQueries lsh(4,16)=$lsh%.3f ivf(16,8)=$ivf%.3f")
    spark.stop()
  }
}
