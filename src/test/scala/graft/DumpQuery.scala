package graft

/** Targeted single-query dump: like graft.Verify but only for the named
  * queries — `Test/runMain graft.DumpQuery <sfDir> <outDir> <q>...`.
  * Writes each result parquet plus oracle_sql.json restricted to the
  * same names, so scripts/compare_oracles.py works on the output
  * unchanged. Saves a full 2.5-minute Verify when iterating on one
  * operator.
  */
object DumpQuery {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: DumpQuery <sfDir> <outDir> <queryName>...")
    val sfDir = args(0)
    val outDir = args(1)
    val names = args.drop(2).toSeq
    if (sys.props.get("graft.goldens.dir").isEmpty &&
        sys.env.get("GRAFT_GOLDENS_DIR").isEmpty) {
      val cand = new java.io.File(
        s"src/test/resources/goldens/${new java.io.File(sfDir).getName}")
      if (cand.isDirectory)
        System.setProperty("graft.goldens.dir", cand.getAbsolutePath)
    }
    val spark = SparkTestBase.session
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query '$name'"))
      fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.filter(kv => names.contains(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/oracle_sql.json"), json)
  }
}
