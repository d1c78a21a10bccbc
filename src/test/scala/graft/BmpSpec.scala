package graft

import graft.multimodal.Bmp

class BmpSpec extends SparkTestBase {

  /** Expected IMAGE-coordinate index after the encoder's delta skips:
    * file rows ≡ 4 (mod 5) lose their last two pixels to index 0.
    */
  private def expectedIdx(idx: (Int, Int) => Int, w: Int, h: Int)(
      x: Int, y: Int): Int =
    if ((h - 1 - y) % 5 == 4 && x >= w - 2) 0 else idx(x, y) & 0xFF

  private def roundTrip(w: Int, h: Int, idx: (Int, Int) => Int,
      absExtra: Int = 0): Unit = {
    val bytes = Bmp.encodeBmp(w, h, Bmp.corpusPalette, idx, absExtra)
    val Some((gw, gh, rgb)) = Bmp.decodeBmp(bytes)
    assert(gw === w && gh === h)
    for (y <- 0 until h; x <- 0 until w) {
      val i = expectedIdx(idx, w, h)(x, y)
      val o = (y * w + x) * 3
      val (r, g, b) = Bmp.corpusPalette(i)
      assert((rgb(o) & 0xFF) === r && (rgb(o + 1) & 0xFF) === g &&
        (rgb(o + 2) & 0xFF) === b, s"pixel ($x,$y) index $i")
    }
  }

  test("RLE8 round-trip exercises every construct: runs, absolute " +
      "blocks (odd and even, padded), delta skips, EOL/EOB") {
    // h >= 10 guarantees file rows hitting fr%3==1 (absolute) and
    // fr%5==4 (delta); absExtra 0/1 covers even/odd absolute counts
    roundTrip(8, 10, (x, y) => (7 + 5 * (x / 4) + 11 * y) % 256)
    roundTrip(8, 10, (x, y) => (7 + 5 * (x / 4) + 11 * y) % 256,
      absExtra = 1)
    roundTrip(20, 16, (x, y) => (x * y) % 256, absExtra = 3)
    // constant image: maximal runs + the schedule constructs
    roundTrip(16, 11, (_, _) => 42)
    // single row (ends with EOB, never EOL)
    roundTrip(9, 1, (x, _) => x % 256)
  }

  test("round-trip matches the corpus formula for many ids/sizes") {
    for (id <- 0L until 40L) {
      val w = 8 + (id % 13).toInt
      val h = 8 + (id % 9).toInt
      roundTrip(w, h, Bmp.corpusIndex(id, w, h),
        absExtra = (id % 3).toInt)
    }
  }

  test("malformed BMPs are rejected, not thrown") {
    val good = Bmp.encodeBmp(8, 8, Bmp.corpusPalette, (x, y) => x + y)
    assert(Bmp.decodeBmp(null).isEmpty)
    assert(Bmp.decodeBmp(Array[Byte]()).isEmpty)
    assert(Bmp.decodeBmp("not a bitmap at all".getBytes).isEmpty)
    assert(Bmp.decodeBmp(good.take(30).toArray).isEmpty) // truncated hdr
    assert(Bmp.decodeBmp(good.dropRight(4)).isEmpty) // truncated stream
    // wrong magic
    val bad0 = good.clone(); bad0(0) = 'X'
    assert(Bmp.decodeBmp(bad0).isEmpty)
    // uncompressed (BI_RGB) is out of the pinned scope
    val bad1 = good.clone(); bad1(30) = 0
    assert(Bmp.decodeBmp(bad1).isEmpty)
    // 24-bit is out of scope
    val bad2 = good.clone(); bad2(28) = 24
    assert(Bmp.decodeBmp(bad2).isEmpty)
    // top-down (negative height) is out of the pinned scope
    val bad3 = good.clone(); bad3(25) = 0xFF.toByte
    bad3(24) = 0xFF.toByte; bad3(23) = 0xFF.toByte; bad3(22) = 0xF8.toByte
    assert(Bmp.decodeBmp(bad3).isEmpty)
    // a run overflowing the row must be rejected
    val overrun = good.clone()
    overrun(14 + 40 + 1024) = 0xFF.toByte // first run count -> 255 > w
    assert(Bmp.decodeBmp(overrun).isEmpty)
  }

  test("corpus features equal the closed-form formulas end-to-end") {
    import spark.implicits._
    val docs = spark.range(0, 60).select(col("id").as("doc_id"))
    val feats = Bmp.extractBmpFeatures(Bmp.syntheticBmpTable(docs))
      .collect().map(f => f.media_id -> f).toMap
    for (id <- 0L until 60L) {
      val w = 8 + (id % 13).toInt
      val h = 8 + (id % 9).toInt
      var sr = 0L; var sg = 0L; var sb = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val i = expectedIdx(Bmp.corpusIndex(id, w, h), w, h)(x, y)
        sr += i; sg += (3 * i) % 256; sb += 255 - i
      }
      val f = feats(id)
      assert(f.w == w && f.h == h && f.sum_r == sr && f.sum_g == sg &&
        f.sum_b == sb, s"id $id")
    }
  }

  private def col(n: String) = org.apache.spark.sql.functions.col(n)
}
