package graft

import graft.multimodal.Gif

class GifSpec extends SparkTestBase {

  private def roundTrip(w: Int, h: Int, idx: (Int, Int) => Int): Unit = {
    val bytes = Gif.encodeGif(w, h, Gif.corpusPalette, idx)
    val Some((gw, gh, rgb)) = Gif.decodeGif(bytes)
    assert(gw === w && gh === h)
    for (y <- 0 until h; x <- 0 until w) {
      val i = idx(x, y) & 0xFF
      val o = (y * w + x) * 3
      val (r, g, b) = Gif.corpusPalette(i)
      assert((rgb(o) & 0xFF) === r && (rgb(o + 1) & 0xFF) === g &&
        (rgb(o + 2) & 0xFF) === b, s"pixel ($x,$y) index $i")
    }
  }

  test("LZW round-trip across code-width growth regimes") {
    // single pixel (no dictionary use at all)
    roundTrip(1, 1, (_, _) => 42)
    // constant image: long runs -> deep dictionary chains, KwKwK-heavy
    roundTrip(40, 30, (_, _) => 7)
    // the corpus formula (growth to 10-bit codes)
    roundTrip(23, 19, (x, y) => (3 + 5 * x + 11 * y) % 256)
    // "noise" with little repetition: the dictionary mostly misses
    roundTrip(32, 24, (x, y) => (x * 97 + y * 31 + x * y) % 256)
  }

  test("LZW round-trip through the 4096-entry dictionary reset") {
    // 128x96 = 12288 pixels of low-repetition content forces the
    // dictionary past 4096 -> the encoder must emit CLEAR mid-stream
    // and both sides must resynchronize
    roundTrip(128, 96, (x, y) => ((x * 131 + y * 29 + (x ^ y)) % 256))
    // and a highly-repetitive large image (chains, not resets)
    roundTrip(128, 96, (x, y) => (x / 16 + y / 16) % 4)
  }

  test("malformed GIFs are rejected, not thrown") {
    assert(Gif.decodeGif(null).isEmpty)
    assert(Gif.decodeGif("GIF87a".getBytes).isEmpty)
    assert(Gif.decodeGif("NOTGIF_______________".getBytes).isEmpty)
    val good = Gif.encodeGif(4, 4, Gif.corpusPalette, (x, y) => x + y)
    assert(Gif.decodeGif(good).isDefined)
    // truncated LZW stream
    assert(Gif.decodeGif(good.dropRight(6)).isEmpty)
    // interlaced flag set (out of pinned scope)
    val inter = good.clone()
    val descOff = 6 + 7 + 768 // header + LSD + GCT
    inter(descOff + 9) = 0x40.toByte
    assert(Gif.decodeGif(inter).isEmpty)
    // no global color table
    val nogct = good.clone()
    nogct(10) = (nogct(10) & 0x7F).toByte
    assert(Gif.decodeGif(nogct).isEmpty)
  }

  test("extension blocks are skipped (GIF89a-style streams decode)") {
    val good = Gif.encodeGif(5, 3, Gif.corpusPalette, (x, y) => 10 * x + y)
    // splice a graphic-control-style extension before the descriptor
    val descOff = 6 + 7 + 768
    val ext = Array[Byte](0x21, 0xF9.toByte, 4, 0, 0, 0, 0, 0)
    val spliced = good.take(descOff) ++ ext ++ good.drop(descOff)
    val Some((w, h, rgb)) = Gif.decodeGif(spliced)
    assert(w === 5 && h === 3)
    val Some((_, _, ref)) = Gif.decodeGif(good)
    assert(rgb.toSeq === ref.toSeq)
  }

  test("corpus features equal the closed-form formulas end-to-end") {
    import spark.implicits._
    val docs = (0L until 30L).toDF("doc_id")
    val feats = Gif.extractGifFeatures(Gif.syntheticGifTable(docs))
      .collect()
    assert(feats.length === 30)
    for (f <- feats) {
      val id = f.media_id
      val w = (8 + id % 16).toInt; val h = (8 + id % 12).toInt
      val idxs = for (y <- 0 until h; x <- 0 until w)
        yield ((id + 5 * x + 11 * y) % 256).toInt
      assert(f.w === w.toLong && f.h === h.toLong)
      assert(f.sum_r === idxs.map(_.toLong).sum)
      assert(f.sum_g === idxs.map(i => ((2 * i) % 256).toLong).sum)
      assert(f.sum_b === idxs.map(i => (255 - i).toLong).sum)
    }
  }
}
