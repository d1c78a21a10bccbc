package graft

import org.apache.spark.sql.functions._

import graft.sources.Sources

/** Guard against silent testdata drift. The bt/opt golden fixtures are
  * minted by the reference implementation over a specific
  * /root/testdata/sf0.01 snapshot, and the generated oracle Scala
  * (DedupOracles, SimOracles, MetricsOracle) embeds constants derived
  * from the same snapshot. The build driver regenerates the testdata
  * between sessions; a content change would surface as dozens of
  * cryptic hash mismatches. This spec pins a content fingerprint of the
  * three tables those artifacts derive from and fails with the exact
  * regeneration recipe instead.
  *
  * Fingerprint: per table, row count + sum over rows of
  * xxhash64(to_json(struct(*))) as decimal(38,0) — order- and
  * partitioning-independent, duplicate-sensitive, no overflow (150k
  * rows × 2^63 ≪ 10^38). readTable's timestamp normalization runs
  * first, so physical-layout-only drift (NANOS vs NTZ annotations)
  * does NOT trip the guard — only content does.
  */
object DataFingerprint {
  val tables: Seq[String] = Seq("events", "documents", "embeddings")

  /** Fingerprint file, anchored at the repo root (the directory holding
    * build.sbt, walked up from the working directory) rather than the
    * bare cwd — an IDE test runner or a nested sbt launch would
    * otherwise read/write the wrong tree and silently disarm the guard.
    */
  def expectedPath: String = {
    var d = new java.io.File(".").getAbsoluteFile
    while (d != null && !new java.io.File(d, "build.sbt").isFile)
      d = d.getParentFile
    require(d != null, "repo root (build.sbt) not found above " +
      new java.io.File(".").getAbsolutePath)
    new java.io.File(d,
      "src/test/resources/goldens/sf0.01/data_fingerprint.txt").getPath
  }

  def compute(spark: org.apache.spark.sql.SparkSession,
      sfDir: String): Seq[String] = tables.map { t =>
    val df = Sources.readTable(spark, sfDir, t)
    val row = df
      .select(xxhash64(to_json(struct(df.columns.map(col).toIndexedSeq: _*)))
        .cast("decimal(38,0)").as("h"))
      .agg(count(lit(1)).as("n"), sum(col("h")).as("s"))
      .collect()(0)
    s"$t ${row.get(0)} ${row.get(1)}"
  }

  /** Regeneration writer: `sbt "Test/runMain graft.DataFingerprint"`
    * after re-minting goldens/oracles against fresh testdata.
    */
  def main(args: Array[String]): Unit = {
    val spark = LocalSessions.builder(8, 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val lines = compute(spark, "/root/testdata/sf0.01")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(expectedPath), lines.mkString("", "\n", "\n"))
    println(s"FINGERPRINT written: ${lines.mkString("; ")}")
    spark.stop()
  }
}

class DataFingerprintSpec extends SparkTestBase {

  test("sf0.01 testdata content matches the snapshot the goldens were minted from") {
    val expFile = java.nio.file.Paths.get(DataFingerprint.expectedPath)
    assert(java.nio.file.Files.exists(expFile),
      s"missing ${DataFingerprint.expectedPath} — run " +
        """sbt "Test/runMain graft.DataFingerprint" to mint it""")
    val expected = java.nio.file.Files.readString(expFile).trim
    val actual = DataFingerprint.compute(spark, "/root/testdata/sf0.01")
      .mkString("\n")
    assert(actual == expected,
      s"""|/root/testdata/sf0.01 CONTENT drifted from the snapshot the golden
          |fixtures and generated oracles were minted from (the driver
          |regenerates testdata between sessions). Expected:
          |$expected
          |got:
          |$actual
          |Regenerate, then re-run the suite:
          |  PYTHONPATH=scripts/refstubs:/root/reference python3 \\
          |    scripts/gen_bt_goldens.py /root/testdata/sf0.01 src/test/resources/goldens/sf0.01
          |  (oracle regen: see .claude/skills/verify/SKILL.md "Oracle generators")
          |  sbt "Test/runMain graft.DataFingerprint"
          |""".stripMargin)
  }
}
