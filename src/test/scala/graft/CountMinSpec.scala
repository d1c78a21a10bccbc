package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.XxHash64Function
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

import graft.sketch.CountMin

/** Count-Min sketch: cell-level parity with a reference model, the
  * est ≥ exact guarantee, planted-collision overcount, order/partition
  * invariance, and the guards.
  */
class CountMinSpec extends SparkTestBase {
  import spark.implicits._

  private def bucket(tok: String, seed: Int, width: Int): Int = {
    val h = XxHash64Function.hash(
      UTF8String.fromString(tok), StringType, seed.toLong)
    (((h % width) + width) % width).toInt
  }

  private def refSketch(tokens: Seq[String], depth: Int,
      width: Int): Array[Long] = {
    val m = new Array[Long](depth * width)
    tokens.foreach { t =>
      (0 until depth).foreach(i => m(i * width + bucket(t, i, width)) += 1L)
    }
    m
  }

  test("sketch equals the reference matrix cell for cell") {
    val docs = Seq("a b a", "c a", "b").toDF("text")
    val got = CountMin.sketch(docs,
        graft.text.TextPipeline.tokenize(col("text")), 4, 32)
      .select("cms").as[Array[Long]].head()
    val exp = refSketch(Seq("a", "b", "a", "c", "a", "b"), 4, 32)
    assert(got.toSeq == exp.toSeq)
  }

  test("estimates: est >= exact always; exact when collision-free") {
    val docs = Seq.tabulate(50)(i => s"tok$i tok${i % 7}").toDF("text")
    val out = CountMin.topKWithEstimates(docs, "text", k = 10,
      depth = 4, width = 1024).collect()
    assert(out.length == 10)
    out.foreach { r =>
      val exact = r.getAs[Long]("exact_cnt")
      val est = r.getAs[Long]("est_cnt")
      assert(est >= exact, s"$r violates est >= exact")
      assert(r.getAs[Long]("overcount") == est - exact)
    }
    // 57 distinct tokens in 1024 buckets x 4 rows: no token shares all
    // 4 cells with another here — every estimate is exact
    assert(out.forall(_.getAs[Long]("overcount") == 0L))
  }

  test("planted full collision overcounts by the colliding mass") {
    // depth 1, tiny width: collisions are certain; pick two tokens
    // that share the single row's bucket
    val w = 4
    val all = (0 until 200).map(i => s"t$i")
    val a = all.head
    val b = all.tail.find(t => bucket(t, 0, w) == bucket(a, 0, w)).get
    val docs = Seq(s"$a $a $a", s"$b $b").toDF("text")
    val out = CountMin.topKWithEstimates(docs, "text", k = 2,
      depth = 1, width = w).collect()
      .map(r => r.getAs[String]("token") -> r.getAs[Long]("est_cnt"))
      .toMap
    assert(out(a) == 5L && out(b) == 5L) // each absorbs the other's mass
  }

  test("sketch is bit-identical on any partitioning and row order") {
    val docs = Seq.tabulate(40)(i => s"w$i w${i % 5} w${i % 11}")
    val one = CountMin.sketch(docs.toDF("text"),
        graft.text.TextPipeline.tokenize(col("text")), 4, 64)
      .select("cms").as[Array[Long]].head().toSeq
    val other = CountMin.sketch(
        docs.reverse.toDF("text").repartition(7),
        graft.text.TextPipeline.tokenize(col("text")), 4, 64)
      .select("cms").as[Array[Long]].head().toSeq
    assert(one == other)
  }

  test("null tokens and null arrays are skipped, not counted") {
    val docs = Seq(Some(Seq(Some("x"), None)), None)
      .toDF("toks")
    val got = CountMin.sketch(docs, col("toks"), 2, 16)
      .select("cms").as[Array[Long]].head()
    assert(got.sum == 2L) // one token x two rows of the sketch
  }

  test("merge(sketch(A), sketch(B)) equals sketch(A union B) bit-for-bit") {
    val a = Seq("x y x", "z").toDF("text")
    val b = Seq("y q", "x q q").toDF("text")
    val both = Seq("x y x", "z", "y q", "x q q").toDF("text")
    def sk(df: org.apache.spark.sql.DataFrame) = CountMin.sketch(df,
      graft.text.TextPipeline.tokenize(col("text")), 4, 64)
    val merged = CountMin.mergeSketches(sk(a), sk(b), 4, 64)
      .select("cms").as[Array[Long]].head().toSeq
    val oneShot = sk(both).select("cms").as[Array[Long]].head().toSeq
    assert(merged == oneShot)
  }

  test("merging sketches of different shapes fails loudly") {
    val a = CountMin.sketch(Seq("x").toDF("text"),
      graft.text.TextPipeline.tokenize(col("text")), 4, 64)
    val b = CountMin.sketch(Seq("x").toDF("text"),
      graft.text.TextPipeline.tokenize(col("text")), 4, 32)
    val e = intercept[Exception](
      CountMin.mergeSketches(a, b, 4, 64).collect())
    assert(e.getMessage.contains("mergeSketches") ||
      (e.getCause != null &&
        e.getCause.getMessage.contains("mergeSketches")))
  }

  test("merging equal-length sketches of different declared shapes " +
      "fails loudly (4x32 vs declared 8x16 has the same cell count " +
      "only if products differ — both sides checked against d*w)") {
    // 4x32 = 128 cells; declared shape 8x512 expects 4096 — left fails
    val a = CountMin.sketch(Seq("x").toDF("text"),
      graft.text.TextPipeline.tokenize(col("text")), 4, 32)
    val e = intercept[Exception](
      CountMin.mergeSketches(a, a, 8, 512).collect())
    assert(e.getMessage.contains("mergeSketches") ||
      (e.getCause != null &&
        e.getCause.getMessage.contains("mergeSketches")))
  }

  test("same-cell-count different-shape merge fails loudly via the " +
      "CARRIED shape (4x32 vs 8x16 both have 128 cells)") {
    def sk(d: Int, w: Int) = CountMin.sketch(Seq("x").toDF("text"),
      graft.text.TextPipeline.tokenize(col("text")), d, w)
    val e = intercept[Exception](
      CountMin.mergeSketches(sk(4, 32), sk(8, 16), 4, 32).collect())
    val msg = e.getMessage +
      (if (e.getCause != null) e.getCause.getMessage else "")
    assert(msg.contains("8x16") && msg.contains("4x32"), msg)
  }

  test("sketch frames without shape metadata are rejected by name") {
    val bare = Seq(Seq.fill(4 * 16)(1L)).toDF("cms")
    val e = intercept[IllegalArgumentException](
      CountMin.mergeSketches(bare, bare, 4, 16))
    assert(e.getMessage.contains("metadata"), e.getMessage)
  }

  test("joinSizeEstimate: est >= true size; exact when collision-free; " +
      "matches the reference inner product") {
    val d = 4; val w = 256
    val aKeys = Seq("k1", "k1", "k2", "k3", "k3", "k3")
    val bKeys = Seq("k1", "k2", "k2", "k4")
    def sk(keys: Seq[String]) = CountMin.sketch(
      keys.map(k => Seq(k)).toDF("toks"), col("toks"), d, w)
    val est = CountMin.joinSizeEstimate(sk(aKeys), sk(bKeys), d, w)
      .as[Long].head()
    // true join size: k1 2*1 + k2 1*2 = 4
    val truth = 4L
    assert(est >= truth)
    // reference: min over rows of the cell inner products
    val ra = refSketch(aKeys, d, w)
    val rb = refSketch(bKeys, d, w)
    val ref = (0 until d).map { i =>
      (0 until w).map(b => ra(i * w + b) * rb(i * w + b)).sum
    }.min
    assert(est == ref)
    // 5 distinct keys in 256x4: no pair shares all rows -> exact
    assert(est == truth)
  }

  test("joinSizeEstimate fails loudly instead of wrapping when cell " +
      "counts would overflow the Long inner product") {
    val big = Seq((4, 8, Seq.fill(4 * 8)(3000000000L)))
      .toDF("depth", "width", "cms")
    val e = intercept[Exception](
      CountMin.joinSizeEstimate(big, big, 4, 8).collect())
    val msg = e.getMessage +
      (if (e.getCause != null) e.getCause.getMessage else "")
    assert(msg.contains("overflow"), msg)
    // just inside the bound: width*maxA*maxB = 4e18 < 4.5e18 computes
    val ok = Seq((4, 4, Seq.fill(4 * 4)(1000000000L)))
      .toDF("depth", "width", "cms")
    val est = CountMin.joinSizeEstimate(ok, ok, 4, 4).as[Long].head()
    assert(est == 4L * 1000000000L * 1000000000L)
  }

  test("property: random corpora match the reference matrix under " +
      "random shapes and partitionings") {
    val rnd = new scala.util.Random(4099)
    for (trial <- 1 to 5) {
      val depth = 1 + rnd.nextInt(5)
      val width = Seq(16, 32, 100, 256)(rnd.nextInt(4))
      val nDocs = 1 + rnd.nextInt(25)
      val docs = Seq.fill(nDocs)(
        Seq.fill(1 + rnd.nextInt(8))(s"t${rnd.nextInt(40)}")
          .mkString(" "))
      val got = CountMin.sketch(
          docs.toDF("text").repartition(1 + rnd.nextInt(5)),
          graft.text.TextPipeline.tokenize(col("text")), depth, width)
        .select("cms").as[Array[Long]].head().toSeq
      val exp = refSketch(docs.flatMap(_.split(" ")), depth, width).toSeq
      assert(got == exp, s"trial $trial: ${depth}x$width, $nDocs docs")
    }
  }

  test("guards: bad depth/width/k rejected loudly") {
    val docs = Seq("a").toDF("text")
    intercept[IllegalArgumentException](
      CountMin.topKWithEstimates(docs, "text", 1, depth = 0, width = 8))
    intercept[IllegalArgumentException](
      CountMin.topKWithEstimates(docs, "text", 1, depth = 4, width = 1))
    intercept[IllegalArgumentException](
      CountMin.topKWithEstimates(docs, "text", 0, depth = 4, width = 8))
    intercept[IllegalArgumentException](
      CountMin.sketch(docs, col("text"), 17, 8))
  }
}
