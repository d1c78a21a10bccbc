package graft

class ExtensionsSpec extends SparkTestBase {

  test("custom expressions are callable from SQL after registration") {
    GraftExtensions.register(spark)
    val row = spark.sql(
      """SELECT simhash64(word_shingles('the quick brown fox', 1)) AS sh,
                size(minhash_signature(word_shingles('a b c d e', 2), 16)) AS m,
                word_shingles('Hello, World! hello world', 2) AS ws""")
      .collect()(0)
    assert(row.getLong(0) !== 0L)
    assert(row.getInt(1) === 16)
    // canonical normalization dedups the repeated shingle
    assert(row.getSeq[String](2) === Seq("hello world", "world hello"))
  }

  test("vector + langid expressions are callable from SQL") {
    GraftExtensions.register(spark)
    val row = spark.sql(
      """SELECT vec_dot(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d,
                vec_norm(array(3.0D, 4.0D)) AS n,
                lang_marker_scores(array('the', 'of', 'xyz')) AS ls""")
      .collect()(0)
    assert(row.getDouble(0) === 32.0)
    assert(row.getDouble(1) === 5.0)
    // sorted lang order de,en,es,fr — 2 of 3 tokens are en markers
    assert(row.getSeq[Double](2) === Seq(0.0, 2.0 / 3, 0.0, 0.0))
  }

  test("histogram-bound + LSH expressions are callable from SQL") {
    GraftExtensions.register(spark)
    val row = spark.sql(
      """SELECT long_array_l1(char_hist64('abc'), char_hist64('abd')) AS l1,
                size(lsh_buckets(array(1.0D, 2.0D), 4, 2)) AS nb""")
      .collect()(0)
    // 'abc' vs 'abd': c and d each differ by one -> L1 = 2
    assert(row.getLong(0) === 2L)
    assert(row.getInt(1) === 2)
    // SQL path must agree with the Column API used by the dedup/sim tiers
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = Seq(Seq(0.5, -1.5, 2.0)).toDF("v")
    val viaCol = df.select(graft.functions.VectorFunctions
      .lshBuckets(col("v"), 4, 2)).collect()(0).getSeq[Long](0)
    df.createOrReplaceTempView("vecs")
    val viaSql = spark.sql("SELECT lsh_buckets(v, 4, 2) FROM vecs")
      .collect()(0).getSeq[Long](0)
    assert(viaCol === viaSql)
  }

  test("sketch expressions are callable from SQL and agree with the Column API") {
    GraftExtensions.register(spark)
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = Seq("token").toDF("t")
    df.createOrReplaceTempView("sk_toks")
    val viaSql = spark.sql("SELECT cms_buckets(t, 4, 1024) FROM sk_toks")
      .collect()(0).getSeq[Long](0)
    val viaCol = df.select(graft.functions.HashFunctions
      .cmsBuckets(col("t"), 4, 1024)).collect()(0).getSeq[Long](0)
    assert(viaSql === viaCol && viaSql.length === 4 &&
      viaSql.forall(b => b >= 0 && b < 1024))
    val hllSql = spark.sql(
      "SELECT hll_packed(xxhash64(CAST(7 AS BIGINT)), 8) AS pk")
      .collect()(0).getLong(0)
    val hllKernel = graft.functions.HashKernels.hllPacked(
      org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
        7L, org.apache.spark.sql.types.LongType, 42L), 8)
    assert(hllSql === hllKernel)
  }

  test("long_array_l1 propagates null elements instead of reading them as 0") {
    GraftExtensions.register(spark)
    // the fast kernel reads slots with getLong — a null element would
    // silently count as 0; nullable-element schemas must dispatch to the
    // null-propagating variant (null distance), while null-free data over
    // such a schema still computes normally
    val rows = spark.sql(
      """SELECT long_array_l1(array(1L, CAST(NULL AS BIGINT)), array(1L, 2L))
             AS withNull,
           long_array_l1(array(1L, CAST(3 AS BIGINT)), array(1L, 2L))
             AS noNull""").collect()(0)
    assert(rows.isNullAt(0), "a null element must yield a NULL distance")
    assert(rows.getLong(1) === 1L)
  }

  test("raw_word_gram_hashes equals the HOF gram formulation from SQL") {
    GraftExtensions.register(spark)
    // the kernel's contract: bit-identical to hashing the space-joined
    // token slices — including empty tokens from double/trailing spaces
    for (s <- Seq("a b c d e", "a  b c ", "x", "", "solo token"))
      assert(spark.sql(
        s"""SELECT raw_word_gram_hashes('$s', 2) =
              CASE WHEN size(split('$s', ' ')) >= 2 THEN
                transform(sequence(0, size(split('$s', ' ')) - 2),
                  p -> xxhash64(concat_ws(' ', slice(split('$s', ' '), p + 1, 2))))
              ELSE CAST(array() AS ARRAY<BIGINT>) END AS same""")
        .collect()(0).getBoolean(0), s"mismatch on '$s'")
  }

  test("SQL and Column APIs agree") {
    GraftExtensions.register(spark)
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = Seq("one two three four", "alpha beta gamma").toDF("text")
    val viaCol = df.select(
      graft.functions.HashFunctions.simhash64(
        graft.functions.HashFunctions.wordShingles(col("text"), 1)))
      .collect().map(_.getLong(0)).toSeq
    df.createOrReplaceTempView("t")
    val viaSql = spark.sql("SELECT simhash64(word_shingles(text, 1)) FROM t")
      .collect().map(_.getLong(0)).toSeq
    assert(viaCol === viaSql)
  }
}
