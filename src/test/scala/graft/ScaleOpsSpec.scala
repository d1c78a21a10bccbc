package graft

import org.apache.spark.sql.functions._

import graft.ops.ScaleOps

class ScaleOpsSpec extends SparkTestBase {
  import spark.implicits._

  test("widen sizes its spread by input bytes, capped at parallelism") {
    // size-adaptive spread (r17): tasks = clamp(bytes/target, 1, cores).
    // A tiny frame must NOT spread at a large per-task target…
    val tiny = spark.range(100).toDF("v").coalesce(1)
    spark.conf.set("spark.graft.widen.taskTargetBytes", (1L << 30).toString)
    try {
      assert(ScaleOps.widen(tiny).rdd.getNumPartitions == 1,
        "a byte-starved input must keep its single partition")
    } finally spark.conf.unset("spark.graft.widen.taskTargetBytes")
    // …must spread to the parallelism cap at a 1-byte target…
    spark.conf.set("spark.graft.widen.taskTargetBytes", "1")
    try {
      val spread = ScaleOps.widen(tiny)
      assert(spread.rdd.getNumPartitions ==
        spark.sparkContext.defaultParallelism,
        "a byte-rich input must spread to session parallelism")
      // …and the spread changes partitioning only, never rows
      assert(spread.as[Long].collect().sorted.toSeq == (0L until 100L))
    } finally spark.conf.unset("spark.graft.widen.taskTargetBytes")
    // an already-wide input is untouched (the 100 TB no-op guard)
    val wide = spark.range(1000)
      .repartition(spark.sparkContext.defaultParallelism).toDF("v")
    assert(ScaleOps.widen(wide).rdd.getNumPartitions ==
      spark.sparkContext.defaultParallelism)
  }

  test("salted aggregate equals plain aggregate on a skewed key") {
    val skewed = spark.range(10000)
      .select(when(col("id") % 100 === 0,
        concat(lit("cold"), col("id").cast("string")))
        .otherwise(lit("HOT")).as("k"),
        (col("id") % 7).cast("double").as("v"))
    val plain = skewed.groupBy("k")
      .agg(sum("v").as("sum_value"), count(lit(1)).as("n"))
      .orderBy("k").collect()
    val salted = ScaleOps.saltedSumCount(skewed, Seq("k"), "v", saltBuckets = 8)
      .orderBy("k").collect()
    assert(plain.length === salted.length)
    plain.zip(salted).foreach { case (p, s) =>
      assert(p.getString(0) === s.getString(0))
      assert(p.getDouble(1) === s.getDouble(1)) // integral doubles: exact
      assert(p.getLong(2) === s.getLong(2))
    }
  }

  test("bucketed tables join without a shuffle") {
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
    val o = spark.read.parquet(s"$sf0001/orders.parquet")
      .select("o_orderkey", "o_totalprice")
    ScaleOps.writeBucketed(li, "li_b", "l_orderkey", 8)
    ScaleOps.writeBucketed(
      o.withColumnRenamed("o_orderkey", "l_orderkey"), "o_b", "l_orderkey", 8)
    val joined = spark.table("li_b").join(spark.table("o_b"), "l_orderkey")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"expected shuffle-free bucketed join, got:\n$plan")
    assert(joined.count() > 0)
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS o_b")
  }

  test("sketch scale path: approx distinct/quantiles within error bounds") {
    // at 100 TB the exact forms (a9_quantiles histogram, countDistinct)
    // have exact-but-heavier plans; the sketch forms are one partial+
    // final agg with constant-size state. Pin their error contract so
    // swapping exact → approx in a pipeline is a measured decision
    val li = spark.read.parquet(s"$sf001/lineitem.parquet")
    val exactD = li.select(countDistinct(col("l_orderkey"))).first().getLong(0)
    val approxD = li.select(approx_count_distinct(col("l_orderkey"), 0.02))
      .first().getLong(0)
    assert(math.abs(approxD - exactD).toDouble / exactD < 0.05,
      s"HLL++ rsd=0.02 drifted: exact=$exactD approx=$approxD")
    val Array(exactMed) = li.stat.approxQuantile("l_quantity", Array(0.5), 0.0)
    val Array(approxMed) = li.stat.approxQuantile("l_quantity", Array(0.5), 0.01)
    // l_quantity spans 1..50; a 1% rank error can move the pick a step
    assert(math.abs(approxMed - exactMed) <= 2.0,
      s"approx median $approxMed vs exact $exactMed")
  }

  test("partitioned layout prunes directories at planning time") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_part")
      .toString + "/events_part"
    val ev = spark.read.parquet(s"$sf0001/events.parquet")
      .select("event_id", "event_type", "value")
    ScaleOps.writePartitioned(ev, tmp, "event_type")
    val q = spark.read.parquet(tmp).filter(col("event_type") === "click")
    val scan = q.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.get
    // the planner selects exactly the one matching directory: excluded
    // partitions cost zero I/O, not a filtered read
    assert(scan.metadata("PartitionFilters").contains("event_type"),
      scan.metadata.toString)
    assert(scan.selectedPartitions.partitionCount === 1)
    assert(q.count() ===
      ev.filter(col("event_type") === "click").count())
  }

  test("compactParquet: many small files -> few, rows intact, clustered") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_compact")
    val in = tmp.resolve("in").toString
    val out = tmp.resolve("out").toString
    val df = spark.range(20000)
      .select(col("id"), (col("id") % 997).as("k"),
        rand(7).as("v"))
    df.repartition(40).write.parquet(in) // the small-file mess
    def parquetFiles(p: String) =
      new java.io.File(p).listFiles().count(_.getName.endsWith(".parquet"))
    assert(parquetFiles(in) == 40)

    val n = ScaleOps.compactParquet(spark, in, out, targetFileMB = 512,
      clusterBy = Seq("k"))
    assert(n < 5, s"expected few output files, got $n")
    assert(parquetFiles(out) == n)
    val a = spark.read.parquet(in).orderBy("id").collect()
    val b = spark.read.parquet(out).orderBy("id").collect()
    assert(a.sameElements(b), "compaction must not change the rows")
    // clustered rewrite: each output file covers a disjoint k-range, so
    // a point predicate's scan prunes to ~one file via min/max stats
    val perFile = spark.read.parquet(out)
      .select(input_file_name().as("f"), col("k"))
      .groupBy("f").agg(min("k").as("lo"), max("k").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    perFile.sliding(2).foreach {
      case Array(x, y) => assert(x._2 <= y._1, s"overlapping ranges: $x $y")
      case _ => ()
    }
    intercept[IllegalArgumentException] {
      ScaleOps.compactParquet(spark, in, in)
    }
    // nesting is as fatal as equality: an output inside the input tree
    // would write temp files into directories the lazy read still lists
    intercept[IllegalArgumentException] {
      ScaleOps.compactParquet(spark, in, in + "/compacted")
    }
    intercept[IllegalArgumentException] {
      ScaleOps.compactParquet(spark, tmp.toString, out)
    }
  }

  test("compactParquet: hive-partitioned input, layout preserved") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_compact_part")
    val in = tmp.resolve("in").toString
    val out = tmp.resolve("out").toString
    val df = spark.range(6000)
      .select(col("id"), (col("id") % 3).as("part"), rand(11).as("v"))
    // the small-file mess, partitioned: 3 dirs x 20 files
    df.repartition(20).write.partitionBy("part").parquet(in)
    def filesUnder(p: String): Seq[java.io.File] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(p)).filter(_.getName.endsWith(".parquet"))
    }
    assert(filesUnder(in).size == 60)

    val n = ScaleOps.compactParquet(spark, in, out,
      partitionBy = Seq("part"))
    // the returned count must see the files NESTED under part= dirs
    assert(n == filesUnder(out).size, s"returned $n, on disk ${filesUnder(out).size}")
    assert(n == 3, s"expected one file per partition value, got $n")
    // hive layout preserved -> partition pruning still works post-compact
    val dirs = new java.io.File(out).listFiles().map(_.getName)
      .filter(_.startsWith("part=")).sorted
    assert(dirs.toSeq == Seq("part=0", "part=1", "part=2"))
    val a = spark.read.parquet(in).select("id", "part", "v")
      .orderBy("id").collect()
    val b = spark.read.parquet(out).select("id", "part", "v")
      .orderBy("id").collect()
    assert(a.sameElements(b), "compaction must not change the rows")

    // partitionBy + clusterBy: still one file per partition dir, rows
    // inside each file sorted on the cluster column (tight min/max)
    val out2 = tmp.resolve("out2").toString
    val n2 = ScaleOps.compactParquet(spark, in, out2,
      partitionBy = Seq("part"), clusterBy = Seq("id"))
    assert(n2 == 3, s"expected one file per partition value, got $n2")
    val ids = spark.read.parquet(out2).filter(col("part") === 1)
      .select("id").collect().map(_.getLong(0))
    assert(ids.sameElements(ids.sorted),
      "rows within a compacted partition file must be sorted on clusterBy")
  }

  test("scd2: consecutive identical attrs collapse, bounds chain, " +
      "null-safe change detect, stable under repartitioning") {
    import java.sql.Timestamp
    def ts(d: Int) = Timestamp.valueOf(f"2024-01-$d%02d 00:00:00")
    val log = Seq(
      ("u1", ts(1), Some("free")),
      ("u1", ts(2), Some("free")),   // no change -> collapses
      ("u1", ts(3), Some("pro")),
      ("u1", ts(4), Some("pro")),    // collapses
      ("u1", ts(5), Some("free")),   // back-transition = new version
      ("u2", ts(2), None),           // null attr is a real version
      ("u2", ts(3), None),           // null == null -> collapses
      ("u2", ts(4), Some("pro"))
    ).toDF("k", "ts", "plan")
    val out = ScaleOps.scd2(log.repartition(5), Seq("k"), "ts",
        Seq("plan"))
      .orderBy("k", "version_no")
      .select("k", "plan", "valid_from", "valid_to", "is_current",
        "version_no")
      .collect()
      .map(r => (r.getString(0), Option(r.getString(1)),
        r.getTimestamp(2), Option(r.getTimestamp(3)),
        r.getBoolean(4), r.getInt(5)))
    assert(out.toSeq == Seq(
      ("u1", Some("free"), ts(1), Some(ts(3)), false, 1),
      ("u1", Some("pro"), ts(3), Some(ts(5)), false, 2),
      ("u1", Some("free"), ts(5), None, true, 3),
      ("u2", None, ts(2), Some(ts(4)), false, 1),
      ("u2", Some("pro"), ts(4), None, true, 2)))
    // valid ranges tile each key's timeline: from_i+1 == to_i
    out.groupBy(_._1).foreach { case (_, vs) =>
      vs.sortBy(_._6).sliding(2).foreach {
        case Array(a, b) => assert(a._4.contains(b._3))
        case _ =>
      }
    }
  }
}
