package graft

import org.apache.spark.sql.functions._

import graft.sim.Pq

/** The PQ persisted-index lifecycle (graft.sim.Pq.writePqIndex /
  * readPqIndex / pqTopKWithIndex): write → read round-trips the codes
  * and codebooks exactly, and probing from the persisted index is
  * bit-identical to the in-session retriever — training and encoding
  * never re-run at probe time.
  */
class PqIndexSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")
    .withColumn("embedding", col("embedding").cast("array<double>"))

  test("write -> read round-trips codebooks and codes exactly; the " +
      "persisted probe equals the in-session retriever to the bit") {
    val dir = java.nio.file.Files
      .createTempDirectory("pq_index").toString
    val cbs = Pq.pqCodebooks(emb, "vec_id", "embedding", dim = 64,
      m = 8, kPerSub = 16)
    val codes = Pq.pqEncode(emb, "vec_id", "embedding", cbs)
    Pq.writePqIndex(codes, "vec_id", cbs, dir)
    val (codes2, cbs2) = Pq.readPqIndex(spark, dir)
    // codebooks: exact doubles, dense m x k x sub
    assert(cbs2.length == cbs.length)
    cbs.indices.foreach { j =>
      cbs(j).indices.foreach { c =>
        assert(cbs2(j)(c).toSeq == cbs(j)(c).toSeq, s"codebook ($j,$c)")
      }
    }
    // codes: identical rows
    val a = codes.as[(Long, Seq[Int])].collect().toMap
    val b = codes2.as[(Long, Seq[Int])].collect().toMap
    assert(a == b)
    // probe from the persisted index == the in-session retriever
    val q = emb.filter(col("vec_id") < 8)
    val direct = Pq.pqTopK(emb, "vec_id", "embedding", q, "vec_id",
        "embedding", k = 5, dim = 64)
      .as[(Long, Long, Double, Int)].collect().toSet
    val fromIndex = Pq.pqTopKWithIndex(codes2, "vec_id", cbs2, emb,
        "vec_id", "embedding", q, "vec_id", "embedding", k = 5)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(fromIndex == direct)
    assert(fromIndex.nonEmpty)
  }

  test("a codebook table with holes is rejected loudly") {
    val dir = java.nio.file.Files
      .createTempDirectory("pq_index_bad").toString
    val cbs = Pq.pqCodebooks(emb, "vec_id", "embedding", dim = 64,
      m = 2, kPerSub = 4)
    val codes = Pq.pqEncode(emb, "vec_id", "embedding", cbs)
    Pq.writePqIndex(codes, "vec_id", cbs, dir)
    // drop one codebook row and rewrite
    val cb = spark.read.parquet(s"$dir/codebooks")
      .filter(!(col("subspace") === 0 && col("code") === 0 &&
        col("dim_idx") === 0))
    cb.write.mode("overwrite").parquet(s"$dir/codebooks2")
    def rmTree(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rmTree))
      f.delete(); ()
    }
    val e = intercept[IllegalArgumentException] {
      val moved = new java.io.File(s"$dir/codebooks")
      rmTree(moved)
      new java.io.File(s"$dir/codebooks2").renameTo(moved)
      Pq.readPqIndex(spark, dir)
    }
    assert(e.getMessage.contains("holes"), e.getMessage)
  }
}
