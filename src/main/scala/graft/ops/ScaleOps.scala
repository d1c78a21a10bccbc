package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale utilities: the shuffle-shaping tools a 100 TB deployment reaches
  * for when the default hash-partitioned plans hit skew or repeated
  * join/aggregation patterns (SURVEY.md §4; design notes in README).
  */
object ScaleOps {

  /** Round-robin widen of a narrow input toward session parallelism —
    * the CPU-heavy-scan primitive. Spark sizes scan splits by BYTES
    * and cannot split below a parquet ROW GROUP, so a compact input
    * (the driver testdata ships every table as ONE row group; a
    * production corpus can ship multi-GB groups) serializes all
    * scan-stage compute — shingling, MinHash signatures, LM scoring,
    * PQ/ADC encoding — on a single core no matter how wide the
    * session is. The widen is an exchange of the RAW input rows,
    * negligible next to the per-row work it spreads, and a NO-OP when
    * the input is already at least target-wide (the 100 TB case,
    * where data arrives in thousands of splits) — so it composes
    * safely into operators at their corpus-input boundary.
    *
    * The spread target is SIZE-ADAPTIVE (r16 verdict #1: a flat
    * defaultParallelism spread oversharded tiny inputs into 32 tasks
    * of pure per-task overhead at local[32], making an 8-core session
    * FASTER than a 32-core one): tasks = clamp(estimated input bytes /
    * `spark.graft.widen.taskTargetBytes`, 1, defaultParallelism). The
    * byte estimate is the optimizer's (plan stats — file sizes for
    * scans, width-scaled for projections; no job runs). The default
    * target (64 KB) reflects the CPU-heavy-scan premise: these scans
    * run ~1 s/MB of regex/shingle/codec work per core, so a 64 KB
    * slice is ~60 ms of compute — well above task overhead, small
    * enough that a 584 KB probe corpus still spreads. A cluster whose
    * per-core work differs tunes the conf, not the call sites.
    */
  def widen(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val max = spark.sparkContext.defaultParallelism
    val targetBytes = spark.conf
      .get("spark.graft.widen.taskTargetBytes", "65536").toLong
    require(targetBytes > 0,
      s"spark.graft.widen.taskTargetBytes must be positive, got $targetBytes")
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val byBytes = (bytes + targetBytes - 1) / targetBytes
    val target = byBytes.min(BigInt(max)).max(BigInt(1)).toInt
    if (df.rdd.getNumPartitions >= target) df
    else df.repartition(target)
  }

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

  /** Salted equi-join for skewed join keys: the small side is replicated
    * once per salt bucket (`explode` of 0..salts-1), the large side tags
    * each row with a deterministic salt from a unique column's hash, and
    * the join runs on (key, salt) — so a hot key's rows spread over
    * `salts` reducers instead of landing on one. Result is identical to
    * the plain equi-join (every large row matches exactly one replica of
    * its key's small row).
    *
    * Use when the small side is too large to broadcast AND the key is
    * skewed (a hot ticker, a boilerplate dedup bucket, a celebrity user).
    * The small side is hinted `shuffle_hash` — the point of salting is
    * precisely the non-broadcast path, and a sort-merge over the
    * replicated side would re-sort `salts` copies.
    *
    * @param uniqueCol a unique (or near-unique) column of `large` whose
    *                  hash spreads rows evenly over salt buckets
    */
  def saltedJoin(large: DataFrame, small: DataFrame, keyCols: Seq[String],
      salts: Int, uniqueCol: Column): DataFrame = {
    require(salts > 0, s"salts must be positive, got $salts")
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    val tagged = large.withColumn("__salt",
      pmod(xxhash64(uniqueCol), lit(salts.toLong)).cast("int"))
    tagged.join(replicated.hint("shuffle_hash"), keyCols :+ "__salt")
      .drop("__salt")
  }

  /** Latest row per key by a version-column lexicographic order (highest
    * wins): one shuffle on the key, `row_number` pick. The core of
    * snapshot compaction and changelog materialization.
    */
  def latestPerKey(df: DataFrame, keyCols: Seq[String],
      versionCols: Seq[String]): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(versionCols.map(c => col(c).desc): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Upsert (Type-1 merge, latest-wins): `updates` merged into `base` by
    * key, the row with the highest version surviving — tolerant of
    * out-of-order delivery (an update older than the base row does NOT
    * override it). Both inputs shuffle once on the key; no driver state.
    */
  def upsertLatest(base: DataFrame, updates: DataFrame, keyCols: Seq[String],
      versionCols: Seq[String]): DataFrame =
    latestPerKey(base.unionByName(updates), keyCols, versionCols)

  /** Type-2 slowly-changing-dimension build (Kimball SCD2) from a
    * change log: per key, consecutive versions with IDENTICAL tracked
    * attributes collapse (null-safe comparison), and each surviving
    * version becomes one history row `(keys…, attrs…, valid_from,
    * valid_to, is_current, version_no)` — `valid_to` is the next
    * version's start (exclusive) and null on the current row. The
    * changelog-to-warehouse-history materialization every incremental
    * dimension load performs.
    *
    * Ordering is pinned to `(tsCol, attrCols…)` so same-timestamp
    * deliveries resolve deterministically on any partitioning (and
    * full-row duplicates collapse as non-changes).
    *
    * Shape: ONE shuffle on the key; the change-detect lag, the
    * survivor filter, and the valid_to lead are three window passes
    * over that single exchange (same partitioning + sort order, so
    * Catalyst reuses the sort) — per-key state is one row, never a
    * buffered history, and a 100 TB changelog with a hot key still
    * streams through sort-based windowing.
    */
  def scd2(changes: DataFrame, keyCols: Seq[String], tsCol: String,
      attrCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "scd2 needs at least one key column")
    require(attrCols.nonEmpty, "scd2 needs at least one tracked attribute")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy((tsCol +: attrCols).map(col): _*)
    val changed = attrCols
      .map(c => !(col(c) <=> lag(col(c), 1).over(w)))
      .reduce(_ || _)
    val survivors = changes
      .withColumn("__rn", row_number().over(w))
      .withColumn("__chg", col("__rn") === 1 || changed)
      .filter(col("__chg"))
    survivors.select(
      (keyCols ++ attrCols).map(col) ++ Seq(
        col(tsCol).as("valid_from"),
        lead(col(tsCol), 1).over(w).as("valid_to"),
        lead(col(tsCol), 1).over(w).isNull.as("is_current"),
        row_number().over(w).as("version_no")): _*)
  }

  /** 2-D Z-order (Morton) key: interleaves the low `bits` bits of two
    * non-negative integer columns (x in even positions, y in odd).
    * Sorting / range-partitioning by this key co-locates rows that are
    * close in BOTH dimensions, so parquet min/max stats stay tight on
    * both columns at once — the multi-dimensional clustering lever for
    * 100 TB scans filtered on two axes (e.g. customer × day). Pure
    * shift/mask expression tree — whole-stage-codegen friendly.
    */
  def zorderKey2(x: Column, y: Column, bits: Int): Column = {
    require(bits > 0 && bits <= 31, s"bits must be in [1,31], got $bits")
    val xl = x.cast("long")
    val yl = y.cast("long")
    (0 until bits).foldLeft(lit(0L)) { (acc, b) =>
      acc
        .bitwiseOR(shiftleft(shiftright(xl, b).bitwiseAND(lit(1L)), 2 * b))
        .bitwiseOR(shiftleft(shiftright(yl, b).bitwiseAND(lit(1L)), 2 * b + 1))
    }
  }

  /** Write parquet clustered by the 2-D Z-order of (xCol, yCol):
    * range-partition on the Morton key (balanced output files, no hash
    * scatter), sort within partitions, drop the key. Readers filtering on
    * either dimension then skip most row groups via parquet min/max.
    */
  def writeZordered(df: DataFrame, path: String, xCol: Column, yCol: Column,
      bits: Int, numFiles: Int): Unit =
    df.withColumn("__z", zorderKey2(xCol, yCol, bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)

  /** Write hive-style directory-partitioned parquet on a
    * low-cardinality column: equality/IN predicates on it then prune
    * whole directories at planning time (`PartitionFilters` in the scan,
    * zero I/O for excluded partitions) — the layout lever for
    * time/category-scoped queries over a 100 TB corpus.
    */
  def writePartitioned(df: DataFrame, path: String,
      partitionCols: String*): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)

  /** Compact a parquet directory's small files into ~`targetFileMB`
    * outputs — the standard post-ingest maintenance op: a continuously
    * appended table accumulates thousands of tiny files whose footer
    * parsing and task-scheduling overhead dominate 100 TB scans. The
    * output file count is estimated from the input's actual on-disk
    * bytes (never a row count pass); with `clusterBy` set the rewrite
    * range-partitions and sorts on those columns, so parquet min/max
    * stats stay tight and later predicate pushdown can skip row groups
    * — without it, coalesce() avoids a shuffle entirely.
    * Returns the number of output files written.
    */
  def compactParquet(spark: org.apache.spark.sql.SparkSession,
      inPath: String, outPath: String, targetFileMB: Int = 512,
      clusterBy: Seq[String] = Nil, partitionBy: Seq[String] = Nil): Int = {
    require(targetFileMB > 0, s"targetFileMB must be positive")
    val conf = spark.sparkContext.hadoopConfiguration
    // each path resolves ITS OWN filesystem (in and out may live on
    // different schemes — s3a input, hdfs output); the default-FS
    // FileSystem.get would throw "Wrong FS" on any non-default path
    val inP = new org.apache.hadoop.fs.Path(inPath)
    val outP = new org.apache.hadoop.fs.Path(outPath)
    val inFs = inP.getFileSystem(conf)
    val outFs = outP.getFileSystem(conf)
    // compare fully-qualified URIs — a java.io.File compare is blind to
    // scheme-qualified spellings of the same directory, and an in-place
    // mode("overwrite") would delete the input the lazy read still needs.
    // Nesting is just as fatal as equality: an output INSIDE the input
    // tree writes _temporary/part files into directories the lazy read is
    // still listing, and an input inside the output tree is deleted by
    // the overwrite — reject ancestry in both directions.
    val inU = inFs.makeQualified(inP).toUri.toString.stripSuffix("/")
    val outU = outFs.makeQualified(outP).toUri.toString.stripSuffix("/")
    require(inU != outU && !inU.startsWith(outU + "/") &&
      !outU.startsWith(inU + "/"),
      s"compactParquet input and output must be disjoint trees " +
        s"(got in=$inU out=$outU)")
    // getContentSummary is recursive, so the byte estimate is correct for
    // hive-partitioned inputs too
    val bytes = inFs.getContentSummary(inP).getLength
    val nFiles = math.max(1,
      math.ceil(bytes.toDouble / (targetFileMB * 1024L * 1024L)).toInt)
    val df = spark.read.parquet(inPath)
    val out =
      if (partitionBy.nonEmpty) {
        // hash-partition on the layout columns so each hive directory
        // compacts to FEW files — but honor targetFileMB: with fewer
        // partition values than nFiles, a value's whole directory would
        // otherwise become ONE file written by one task (a 300 GB
        // unsplittable monster for a hot value). A column-pruned
        // distinct count (cheap next to the full rewrite) sizes a
        // per-value salt: ~nFiles/nVals files per value, each near the
        // target. With clusterBy too, rows sort within each file so its
        // parquet min/max stats stay tight on the cluster columns.
        val nVals = df.select(partitionBy.map(col): _*).distinct().count()
        val salts = math.max(1L,
          math.ceil(nFiles.toDouble / math.max(1L, nVals)).toLong)
        val base =
          if (salts == 1L) df.repartition(nFiles, partitionBy.map(col): _*)
          else df.withColumn("__salt",
              pmod(spark_partition_id() + monotonically_increasing_id(),
                lit(salts)))
            .repartition(nFiles, (partitionBy.map(col) :+ col("__salt")): _*)
        base.sortWithinPartitions((partitionBy ++ clusterBy).map(col): _*)
          .drop("__salt")
      } else if (clusterBy.nonEmpty)
        df.repartitionByRange(nFiles, clusterBy.map(col): _*)
          .sortWithinPartitions(clusterBy.map(col): _*)
      else df.coalesce(nFiles)
    val writer = out.write.mode("overwrite")
    (if (partitionBy.nonEmpty) writer.partitionBy(partitionBy: _*)
     else writer).parquet(outPath)
    // recurse: a partitionBy output nests files under value directories,
    // where a flat listStatus would count 0
    val it = outFs.listFiles(outP, true)
    var n = 0
    while (it.hasNext) {
      if (it.next().getPath.getName.endsWith(".parquet")) n += 1
    }
    n
  }

  /** Bloom-filter semi-join reduction: filter `big` down to rows whose
    * join key MIGHT appear in `small`, using a Bloom filter built over
    * `small`'s keys in one distributed pass (a treeAggregate of
    * per-partition bitsets — only the ~MB-scale merged bitset reaches
    * the driver). Multi-column keys collapse to one `xxhash64` on both
    * sides, so the filter probes a single long per row.
    *
    * This is the shuffle-reduction lever for the mid-size join: when the
    * filtering side is too big to broadcast, a plain equi-join shuffles
    * the ENTIRE big side — including every row whose key has no partner.
    * The Bloom prune drops those rows in the big side's scan stage
    * (codegen'd [[graft.functions.BloomMightContainLong]] probe), so only
    * ~matching rows + the fpp sliver pay the exchange. At 100 TB with a
    * 1% match rate that is a ~99% shuffle-volume cut for the cost of one
    * small-side pass and a broadcast-sized bitset. (Spark's own runtime
    * bloom injection fires only when the creation side carries a
    * selective predicate and size thresholds line up; this operator is
    * the explicit form for when it doesn't.)
    *
    * SEMANTICS: sound as the probe side of an inner or semi join — the
    * surviving superset (false positives only, never false negatives)
    * leaves the exact join's result unchanged. NOT sound before an outer
    * join on `big`'s side (pruned rows would lose their null-extended
    * output rows).
    *
    * @param expectedItems Bloom sizing; <= 0 runs a shuffle-free
    *                      column-pruned count of `small` (over-sizing by
    *                      duplicate keys only tightens the realized fpp)
    */
  def bloomPrune(big: DataFrame, bigKeys: Seq[String],
      small: DataFrame, smallKeys: Seq[String],
      fpp: Double = 0.01, expectedItems: Long = -1L): DataFrame = {
    require(bigKeys.nonEmpty && bigKeys.length == smallKeys.length,
      s"key lists must be non-empty and same length " +
        s"(got ${bigKeys.length} vs ${smallKeys.length})")
    require(fpp > 0.0 && fpp < 1.0, s"fpp must be in (0,1), got $fpp")
    val n = if (expectedItems > 0) expectedItems
      else small.select(smallKeys.map(col): _*).count()
    // build with treeAggregate rather than stat.bloomFilter: identical
    // distributed shape (per-partition build, tree-merged bitsets), but
    // an EMPTY small side yields the zero-value filter (prune everything
    // — correct for an inner join) where stat.bloomFilter NPEs
    val zero = org.apache.spark.util.sketch.BloomFilter
      .create(math.max(n, 1L), fpp)
    val bf = small
      .select(xxhash64(smallKeys.map(col): _*).as("__kh"))
      .rdd.map(_.getLong(0))
      .treeAggregate(zero)(
        (f, v) => { f.putLong(v); f },
        (a, b) => { a.mergeInPlace(b); a })
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    big.filter(graft.functions.HashFunctions.bloomMightContainLong(
      xxhash64(bigKeys.map(col): _*), bos.toByteArray))
  }

  /** Bloom-pruned inner equi-join: [[bloomPrune]] the big side, then the
    * exact join (which also discards the Bloom's false positives). Output
    * columns = big's ++ small's, like `big.join(small, cond)`; key
    * columns must not share names across sides (rename first if they do).
    */
  def bloomPruneJoin(big: DataFrame, bigKeys: Seq[String],
      small: DataFrame, smallKeys: Seq[String],
      fpp: Double = 0.01, expectedItems: Long = -1L): DataFrame = {
    val clash = smallKeys.filter(bigKeys.contains)
    require(clash.isEmpty, "join key columns share names across sides " +
      s"(${clash.mkString(", ")}) — rename one side before joining")
    val pruned = bloomPrune(big, bigKeys, small, smallKeys, fpp, expectedItems)
    val cond = bigKeys.zip(smallKeys)
      .map { case (b, s) => pruned(b) === small(s) }
      .reduce(_ && _)
    pruned.join(small, cond, "inner")
  }
}
