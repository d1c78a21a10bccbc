package graft

import org.apache.spark.sql.SparkSession

/** Shared session builder for the test-side standalone mains and
  * SparkTestBase. The five settings below are load-bearing invariants,
  * not preferences — UTC is what Sources.readTable's NTZ cast and the
  * DuckDB oracle compare assume, and the two parquet flags absorb the
  * timestamp physical layouts the driver's testdata has shipped (see
  * the verify skill's gotchas). Single-sourcing them here is what keeps
  * a new main from silently missing one (it happened: two mains lacked
  * the UTC pin until a review caught it). Callers chain additional
  * `.config(...)` for their specific needs (adaptive, codegen checks).
  */
object LocalSessions {
  def builder(threads: Int, shufflePartitions: Int): SparkSession.Builder =
    graft.ops.ScratchDir.tune(SparkSession.builder()
      .master(s"local[$threads]")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false"))
}
