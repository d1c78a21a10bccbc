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

  test("GIF89a: frame round-trip keeps rects, GCE fields and indices") {
    val frames = Seq(
      Gif.FrameSpec(0, 0, 12, 10, 5, 1, -1, (x, y) => (x + 3 * y) % 256),
      Gif.FrameSpec(3, 2, 6, 5, 7, 2, 42, (u, v) => (40 + u + v) % 256),
      Gif.FrameSpec(1, 1, 4, 3, 0, 3, -1, (u, v) => (u * v + 9) % 256))
    val bytes = Gif.encodeGif89a(12, 10, Gif.corpusPalette, frames)
    val Some((sw, sh, pal, got)) = Gif.decodeGif89a(bytes)
    assert(sw === 12 && sh === 10 && pal.length === 768)
    assert(got.size === 3)
    got.zip(frames).foreach { case (g, f) =>
      assert((g.left, g.top, g.w, g.h) === (f.left, f.top, f.w, f.h))
      assert(g.delayCs === f.delayCs && g.disposal === f.disposal &&
        g.transparent === f.transparent)
      val want = for (v <- 0 until f.h; u <- 0 until f.w)
        yield f.idx(u, v) & 0xFF
      assert(g.indices.toSeq === want)
    }
  }

  test("GIF89a: compositing applies transparency and disposal 1/2/3") {
    // 4x3 screen, bg 0. Frame A paints everything 5 (disposal 1);
    // frame B paints a 2x2 rect at (1,1) with value 7 except a
    // transparent pixel (disposal 2: its rect restores to bg);
    // frame C paints (0,0) 9 with disposal 3 (restore-to-previous).
    val a = Gif.Frame89(0, 0, 4, 3, 0, 1, -1, Array.fill(12)(5))
    val b = Gif.Frame89(1, 1, 2, 2, 0, 2, 7, Array(7, 7, 7, 6))
    val c = Gif.Frame89(0, 0, 1, 1, 0, 3, -1, Array(9))
    val d = Gif.Frame89(0, 0, 1, 1, 0, 0, -1, Array(8))
    val Seq(ca, cb, cc, cd) =
      Gif.compositeFrames(4, 3, 0, Seq(a, b, c, d))
    assert(ca.toSeq === Seq.fill(12)(5))
    // b's 7s are TRANSPARENT (keep 5); only the 6 paints
    assert(cb.toSeq === Seq(5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 6, 5))
    // before c, b's rect restored to bg (disposal 2)
    assert(cc.toSeq === Seq(9, 5, 5, 5, 5, 0, 0, 5, 5, 0, 0, 5))
    // c was disposal 3: its pixel reverts before d paints
    assert(cd.toSeq === Seq(8, 5, 5, 5, 5, 0, 0, 5, 5, 0, 0, 5))
  }

  test("GIF89a: malformed animations are rejected, not thrown") {
    val good = Gif.encodeGif89a(10, 10, Gif.corpusPalette, Seq(
      Gif.FrameSpec(0, 0, 10, 10, 1, 1, -1, (x, y) => (x + y) % 256)))
    assert(Gif.decodeGif89a(good).isDefined)
    assert(Gif.decodeGif89a(null).isEmpty)
    assert(Gif.decodeGif89a(Array.empty[Byte]).isEmpty)
    assert(Gif.decodeGif89a(good.take(30)).isEmpty)       // truncated GCT
    assert(Gif.decodeGif89a(good.dropRight(1)).isEmpty)   // no trailer
    val badSig = good.clone(); badSig(0) = 'X'.toByte
    assert(Gif.decodeGif89a(badSig).isEmpty)
    // frame rect outside the screen is rejected at ENCODE time
    intercept[IllegalArgumentException] {
      Gif.encodeGif89a(8, 8, Gif.corpusPalette, Seq(
        Gif.FrameSpec(4, 4, 8, 8, 0, 1, -1, (_, _) => 0)))
    }
    // corrupt the image descriptor's height past the screen bound
    // (fixed layout: 6 header + 7 LSD + 768 GCT + 8 GCE = offset 789)
    val i2c = 789
    assert((good(i2c) & 0xFF) === 0x2C)
    val bad = good.clone(); bad(i2c + 8) = 0x7F.toByte
    assert(Gif.decodeGif89a(bad).isEmpty)
  }

  test("GIF89a corpus frames equal the closed-form composited sums") {
    import spark.implicits._
    val docs = (0L until 24L).toDF("doc_id")
    val feats = Gif.extractGif89aFrames(Gif.syntheticGif89aTable(docs))
      .collect()
    assert(feats.length === 72)
    for (f <- feats.filter(_.frame_no == 2L)) {
      val id = f.media_id
      val w = (10 + id % 10).toInt; val h = (10 + id % 8).toInt
      def c2(x: Int, y: Int): Int =
        if (x >= 1 && x <= w - 2 && y >= 1 && y <= 4)
          ((7 * id + (x - 1) + 2 * (y - 1)) % 256).toInt
        else if (x >= 2 && x <= w - 3 && y >= 3 && y <= h - 3) 0
        else ((id + 5 * x + 11 * y) % 256).toInt
      val idxs = for (y <- 0 until h; x <- 0 until w) yield c2(x, y)
      assert(f.w === w.toLong && f.h === h.toLong)
      assert(f.disposal === 1L && f.delay_cs === 4 + (id + 2) % 7)
      assert(f.sum_r === idxs.map(_.toLong).sum, s"media $id")
      assert(f.sum_g === idxs.map(i => ((2 * i) % 256).toLong).sum)
      assert(f.sum_b === idxs.map(i => (255 - i).toLong).sum)
    }
  }
}
