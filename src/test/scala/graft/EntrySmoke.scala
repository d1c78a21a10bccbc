package graft
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = LocalSessions.builder(4, 4).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    println("ENTRY_ROWS=" + df.count())
    df.show(5)
    spark.stop()
  }
}
