package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale utilities: the shuffle-shaping tools a 100 TB deployment reaches
  * for when the default hash-partitioned plans hit skew or repeated
  * join/aggregation patterns (SURVEY.md §4; design notes in README).
  */
object ScaleOps {

  /** Two-stage salted aggregation for skewed keys: stage 1 aggregates on
    * (key, salt) — spreading a hot key over `saltBuckets` reducers —
    * stage 2 merges partials per key. Use for algebraic aggregates (sum,
    * count, min, max) when one key dominates (e.g. one ticker with 100×
    * the rows, one boilerplate dedup bucket).
    *
    * @param partialAggs  (inputCol → partial agg) pairs, applied at stage 1
    * @param mergeAggs    merge expressions over the stage-1 outputs
    */
  def saltedAggregate(df: DataFrame, keyCols: Seq[String], saltBuckets: Int,
      partialAggs: Seq[(Column, String)],
      mergeAggs: Seq[(String, Column => Column)]): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(),
        lit(saltBuckets)))
    val stage1 = salted
      .groupBy((keyCols.map(col) :+ col("__salt")): _*)
      .agg(partialAggs.head._1.as(partialAggs.head._2),
        partialAggs.tail.map { case (c, n) => c.as(n) }: _*)
    stage1.groupBy(keyCols.map(col): _*)
      .agg(mergeAggs.head._2(col(mergeAggs.head._1)).as(mergeAggs.head._1),
        mergeAggs.tail.map { case (n, f) => f(col(n)).as(n) }: _*)
  }

  /** Convenience: salted grouped sum + count for one value column. */
  def saltedSumCount(df: DataFrame, keyCols: Seq[String], valueCol: String,
      saltBuckets: Int = 16): DataFrame =
    saltedAggregate(df, keyCols, saltBuckets,
      partialAggs = Seq(sum(col(valueCol)) -> "sum_value",
        count(lit(1)) -> "n"),
      mergeAggs = Seq("sum_value" -> (c => sum(c)), "n" -> (c => sum(c))))

  /** Write a DataFrame as a bucketed+sorted table so equi-joins and
    * aggregations on the bucket key are shuffle-free across queries — the
    * persistent co-location strategy for dimension-fact joins repeated at
    * 100 TB (a one-time shuffle amortized over every later query).
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      numBuckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  /** Write hive-style directory-partitioned parquet on a
    * low-cardinality column: equality/IN predicates on it then prune
    * whole directories at planning time (`PartitionFilters` in the scan,
    * zero I/O for excluded partitions) — the layout lever for
    * time/category-scoped queries over a 100 TB corpus.
    */
  def writePartitioned(df: DataFrame, path: String,
      partitionCols: String*): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)
}
