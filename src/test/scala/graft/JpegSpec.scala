package graft

import graft.multimodal.{Jpeg, JpegTables}

/** Baseline JPEG codec: closed-form reconstruction anchors, the
  * huffman/zigzag/stuffing machinery against IDCT ground truth,
  * grayscale, and the loud-failure battery for everything out of the
  * baseline 4:4:4 profile.
  */
class JpegSpec extends SparkTestBase {

  private def zeroCoef(c: Int, bi: Int, k: Int): Int = 0

  test("pinned constants: zigzag anchors, basis anchors, nonzero quant") {
    val zz = JpegTables.Zigzag
    assert(zz.take(10).toSeq ===
      Seq(0, 1, 8, 16, 9, 2, 3, 10, 17, 24))
    assert(zz.takeRight(4).toSeq === Seq(47, 55, 62, 63))
    assert(zz.sorted.toSeq === (0 until 64))
    // T(x)(0) = (1/sqrt 2)/2 for every x; row norms ~ 1/2
    (0 until 8).foreach { x =>
      assert(math.abs(JpegTables.Basis(x * 8) - 1.0 / math.sqrt(2.0) / 2.0)
        < 1e-15)
    }
    assert(JpegTables.QuantLuma.forall(q => q >= 1 && q <= 255))
    assert(JpegTables.QuantChroma.forall(q => q >= 1 && q <= 255))
  }

  test("all-zero coefficients decode to a uniform gray-128 image") {
    val bytes = Jpeg.encodeJpeg(16, 8, zeroCoef)
    val Some((w, h, rgb)) = Jpeg.decodeJpeg(bytes)
    assert(w === 16 && h === 8)
    assert(rgb.forall(b => (b & 0xff) === 128))
  }

  test("DC-only blocks reconstruct to the closed-form constant") {
    // dc=16, luma Q(0)=1: every Y pixel = floor(16*T00^2*... the
    // separable fold gives 16*T(x)(0)*T(y)(0); expected computed from
    // the PINNED table, not from the decoder
    val bytes = Jpeg.encodeJpeg(8, 8,
      (c, _, k) => if (k == 0 && c == 0) 16 else 0)
    val Some((_, _, rgb)) = Jpeg.decodeJpeg(bytes)
    val t0 = JpegTables.Basis(0)
    val q0 = JpegTables.QuantLuma(0)
    val expY = (math.floor(16.0 * q0 * t0 * t0 + 0.5) + 128).toInt
    // Cb/Cr are 128 -> r = g = b = Y
    assert(rgb.forall(b => (b & 0xff) === expY), s"expected $expY")
  }

  test("huffman + zigzag + ZRL/EOB reproduce IDCT ground truth " +
      "(single coefficient 19 zigzag steps in -> ZRL + run path)") {
    // one AC at zigzag position 20 with 19 zeros before it: the
    // encoder must emit ZRL (16 zeros) + run-3 symbol; any slip in the
    // run arithmetic or the zigzag map lands the coefficient elsewhere
    def coef(c: Int, bi: Int, k: Int): Int =
      if (c == 0 && k == 20) -33 else 0 // luma only; chroma stays 128
    val bytes = Jpeg.encodeJpeg(8, 8, coef)
    val Some((_, _, rgb)) = Jpeg.decodeJpeg(bytes)
    // ground truth: dequantize + pinned IDCT directly
    val dq = new Array[Int](64)
    dq(JpegTables.Zigzag(20)) = -33 * JpegTables.QuantLuma(20)
    val y = Jpeg.idctBlock(dq)
    val dqz = new Array[Int](64) // chroma planes: all-zero -> 128
    dq.indices.foreach { i =>
      val yv = y(i)
      def clamp(d: Double): Int = {
        val v = math.floor(d + 0.5).toLong
        math.min(math.max(v, 0L), 255L).toInt
      }
      assert((rgb(3 * i) & 0xff) === clamp(yv + 1.402 * 0))
      assert((rgb(3 * i + 1) & 0xff) === clamp(yv - 0.0 - 0.0))
      assert((rgb(3 * i + 2) & 0xff) === clamp(yv + 0.0))
    }
    assert(dqz.forall(_ == 0))
  }

  test("the synthetic corpus exercises byte stuffing and decodes") {
    // scan a few ids for a stuffed FF 00 inside the entropy segment —
    // the corpus must hit the stuffing path, not merely allow it
    val stuffed = (0L until 64L).exists { id =>
      val b = Jpeg.encodeJpeg(16, 16,
        (c, bi, k) => Jpeg.syntheticCoef(id, c, bi, k))
      assert(Jpeg.decodeJpeg(b).isDefined, s"id $id must decode")
      val scan = b.indices.dropWhile(i =>
        !((b(i) & 0xff) == 0xFF && (b(i + 1) & 0xff) == 0xDA))
      scan.exists(i => i + 1 < b.length - 2 &&
        (b(i) & 0xff) == 0xFF && (b(i + 1) & 0xff) == 0x00)
    }
    assert(stuffed, "no id in 0..63 produced a stuffed byte — corpus " +
      "too tame to exercise the stuffing path")
  }

  test("grayscale (1 component) decodes with Y replicated") {
    val bytes = Jpeg.encodeJpeg(8, 8,
      (c, _, k) => if (k == 0) 24 else 0, ncomp = 1)
    val Some((w, h, rgb)) = Jpeg.decodeJpeg(bytes)
    assert(w === 8 && h === 8)
    (0 until 64).foreach { i =>
      assert(rgb(3 * i) === rgb(3 * i + 1) && rgb(3 * i) === rgb(3 * i + 2))
    }
  }

  test("DC differential chains across MCUs (second block decodes " +
      "relative to the first)") {
    // dc: block 0 -> 40, block 1 -> -23; diffs 40 then -63 — sign and
    // magnitude-bit handling both on the line
    val bytes = Jpeg.encodeJpeg(16, 8,
      (c, bi, k) => if (k == 0) (if (bi == 0) 40 else -23) else 0)
    val Some((w, _, rgb)) = Jpeg.decodeJpeg(bytes)
    val t0 = JpegTables.Basis(0)
    def expY(dc: Int, q: Int) =
      (math.floor(dc.toDouble * q * t0 * t0 + 0.5) + 128).toInt
    // pixel (0,0) in MCU 0 and MCU 1 (x=8)
    val y0 = expY(40, JpegTables.QuantLuma(0))
    val y1 = expY(-23, JpegTables.QuantLuma(0))
    def rAt(x: Int): Int = rgb(3 * x) & 0xff
    // chroma dc also 40/-23 under the chroma table — compute full rgb
    val c0 = expY(40, JpegTables.QuantChroma(0))
    val c1 = expY(-23, JpegTables.QuantChroma(0))
    def red(y: Int, cr: Int): Int = {
      val v = math.floor(y + 1.402 * (cr - 128) + 0.5).toLong
      math.min(math.max(v, 0L), 255L).toInt
    }
    assert(rAt(0) === red(y0, c0))
    assert(rAt(8) === red(y1, c1))
  }

  test("malformed and out-of-profile inputs all return None, never " +
      "garbage") {
    val good = Jpeg.encodeJpeg(8, 8,
      (c, bi, k) => Jpeg.syntheticCoef(3L, c, bi, k))
    assert(Jpeg.decodeJpeg(good).isDefined)
    def mut(f: Array[Byte] => Array[Byte]): Option[_] =
      Jpeg.decodeJpeg(f(good.clone()))
    // truncation at every boundary class
    assert(Jpeg.decodeJpeg(null) === None)
    assert(Jpeg.decodeJpeg(Array.emptyByteArray) === None)
    assert(mut(_.take(2)) === None)       // SOI only
    assert(mut(_.take(40)) === None)      // mid-segment
    assert(mut(_.dropRight(1)) === None)  // missing half of EOI
    assert(mut(_.dropRight(2)) === None)  // missing EOI
    assert(mut(b => b ++ Array[Byte](0)) === None) // trailing garbage
    // bad SOI
    assert(mut { b => b(1) = 0xD9.toByte; b } === None)
    // SOF0 -> SOF2 (progressive)
    val sofAt = good.indices.find(i =>
      (good(i) & 0xff) == 0xFF && (good(i + 1) & 0xff) == 0xC0).get
    assert(mut { b => b(sofAt + 1) = 0xC2.toByte; b } === None)
    // 12-bit precision
    assert(mut { b => b(sofAt + 4) = 12.toByte; b } === None)
    // 2x2 sampling on component 0
    assert(mut { b => b(sofAt + 11) = 0x22.toByte; b } === None)
    // DAC (arithmetic conditioning) segment injected before SOS
    val sosAt = good.indices.find(i =>
      (good(i) & 0xff) == 0xFF && (good(i + 1) & 0xff) == 0xDA).get
    val dac = Array(0xFF, 0xCC, 0x00, 0x04, 0x00, 0x08).map(_.toByte)
    assert(Jpeg.decodeJpeg(
      good.take(sosAt) ++ dac ++ good.drop(sosAt)) === None)
    // zero quant entry (DQT payload starts after marker+len+PqTq)
    val dqtAt = good.indices.find(i =>
      (good(i) & 0xff) == 0xFF && (good(i + 1) & 0xff) == 0xDB).get
    assert(mut { b => b(dqtAt + 5) = 0.toByte; b } === None)
    // a raw 0xFF inside entropy data missing its stuffed 0x00: flip a
    // mid-scan byte to 0xFF whose successor is not 0x00
    val scanStart = sosAt + 2 +
      (((good(sosAt + 2) & 0xff) << 8) | (good(sosAt + 3) & 0xff))
    val tamperAt = (scanStart until good.length - 3).find { i =>
      (good(i) & 0xff) != 0xFF && (good(i + 1) & 0xff) != 0x00 &&
        (good(i - 1) & 0xff) != 0xFF
    }.get
    assert(mut { b => b(tamperAt) = 0xFF.toByte; b } === None)
    // non-whole-MCU dimensions are out of profile (encoder refuses;
    // a hand-tampered SOF must be rejected by the decoder too)
    assert(mut { b => b(sofAt + 8) = 12.toByte; b } === None)
    intercept[IllegalArgumentException](Jpeg.encodeJpeg(12, 8, zeroCoef))
    intercept[IllegalArgumentException](
      Jpeg.encodeJpeg(8, 8, zeroCoef, ncomp = 2))
  }

  test("4:2:0: luma interleave order places the four MCU blocks in " +
      "raster quadrants") {
    // per-block DC only: block b of the (single) MCU gets dc = 8*(b+1)
    // — a quadrant swap or interleave slip moves the wrong constant
    // into the wrong 8x8 region
    val bytes = Jpeg.encodeJpeg(16, 16,
      (c, bi, k) => if (c == 0 && k == 0) 8 * (bi + 1) else 0,
      chroma420 = true)
    val Some((w, h, rgb)) = Jpeg.decodeJpeg(bytes)
    assert(w === 16 && h === 16)
    val t0 = JpegTables.Basis(0)
    def expY(dc: Int) =
      (math.floor(dc.toDouble * JpegTables.QuantLuma(0) * t0 * t0 + 0.5)
        + 128).toInt
    def yAt(row: Int, col: Int): Int = rgb(3 * (row * 16 + col)) & 0xff
    // chroma flat 128 -> r == Y
    assert(yAt(0, 0) === expY(8))    // block 0: top-left
    assert(yAt(0, 8) === expY(16))   // block 1: top-right
    assert(yAt(8, 0) === expY(24))   // block 2: bottom-left
    assert(yAt(8, 8) === expY(32))   // block 3: bottom-right
  }

  test("4:2:0: each chroma sample replicates over its 2x2 luma square") {
    // flat luma, one chroma AC coefficient -> a non-flat 8x8 chroma
    // plane; replication means every 2x2 pixel square is uniform while
    // the squares differ
    val bytes = Jpeg.encodeJpeg(16, 16,
      (c, bi, k) => if (c == 1 && k == 1) 40 else 0, chroma420 = true)
    val Some((_, _, rgb)) = Jpeg.decodeJpeg(bytes)
    def px(row: Int, col: Int): (Int, Int, Int) = {
      val o = 3 * (row * 16 + col)
      ((rgb(o) & 0xff, rgb(o + 1) & 0xff, rgb(o + 2) & 0xff))
    }
    for (cy <- 0 until 8; cx <- 0 until 8) {
      val base = px(2 * cy, 2 * cx)
      assert(px(2 * cy, 2 * cx + 1) === base)
      assert(px(2 * cy + 1, 2 * cx) === base)
      assert(px(2 * cy + 1, 2 * cx + 1) === base)
    }
    val distinct = (for (cy <- 0 until 8; cx <- 0 until 8)
      yield px(2 * cy, 2 * cx)).toSet
    assert(distinct.size > 1, "chroma AC must vary across samples")
  }

  test("4:2:0 guards: 16px-whole-MCU dims enforced, other sampling " +
      "combos rejected") {
    intercept[IllegalArgumentException](
      Jpeg.encodeJpeg(8, 8, zeroCoef, chroma420 = true))
    intercept[IllegalArgumentException](
      Jpeg.encodeJpeg(16, 16, zeroCoef, ncomp = 1, chroma420 = true))
    val good = Jpeg.encodeJpeg(16, 16, zeroCoef, chroma420 = true)
    assert(Jpeg.decodeJpeg(good).isDefined)
    val sofAt = good.indices.find(i =>
      (good(i) & 0xff) == 0xFF && (good(i + 1) & 0xff) == 0xC0).get
    // luma sampling 1x2 ("4:4:0") is out of profile
    val b = good.clone(); b(sofAt + 11) = 0x12.toByte
    assert(Jpeg.decodeJpeg(b) === None)
    // 4:2:2 dims must be whole 16x8 MCUs
    intercept[IllegalArgumentException](
      Jpeg.encodeJpeg(8, 8, zeroCoef, chroma422 = true))
    intercept[IllegalArgumentException](
      Jpeg.encodeJpeg(16, 8, zeroCoef, chroma420 = true, chroma422 = true))
  }

  test("4:2:2: two luma blocks interleave horizontally and chroma " +
      "replicates over 2x1 pixel pairs") {
    // per-block DC only: block b gets dc = 8*(b+1) — left/right halves
    val bytes = Jpeg.encodeJpeg(16, 8,
      (c, bi, k) => if (c == 0 && k == 0) 8 * (bi + 1) else 0,
      chroma422 = true)
    val Some((w, h, rgb)) = Jpeg.decodeJpeg(bytes)
    assert(w === 16 && h === 8)
    val t0 = JpegTables.Basis(0)
    def expY(dc: Int) =
      (math.floor(dc.toDouble * JpegTables.QuantLuma(0) * t0 * t0 + 0.5)
        + 128).toInt
    def yAt(row: Int, col: Int): Int = rgb(3 * (row * 16 + col)) & 0xff
    assert(yAt(0, 0) === expY(8))   // block 0: left half
    assert(yAt(0, 8) === expY(16))  // block 1: right half
    assert(yAt(7, 7) === expY(8))
    assert(yAt(7, 15) === expY(16))
    // flat luma + one chroma AC: every HORIZONTAL pixel pair uniform,
    // vertically the plane varies at full resolution
    val cbytes = Jpeg.encodeJpeg(16, 8,
      (c, bi, k) => if (c == 1 && k == 1) 40 else 0, chroma422 = true)
    val Some((_, _, crgb)) = Jpeg.decodeJpeg(cbytes)
    def px(row: Int, col: Int): (Int, Int, Int) = {
      val o = 3 * (row * 16 + col)
      ((crgb(o) & 0xff, crgb(o + 1) & 0xff, crgb(o + 2) & 0xff))
    }
    for (r <- 0 until 8; cx <- 0 until 8)
      assert(px(r, 2 * cx + 1) === px(r, 2 * cx))
    val distinct = (for (r <- 0 until 8; cx <- 0 until 8)
      yield px(r, 2 * cx)).toSet
    assert(distinct.size > 1, "chroma AC must vary across samples")
  }

  test("4:2:2 corpus features match a driver-side reference decode") {
    import spark.implicits._
    val docs = Seq(0L, 1L, 2L, 3L, 9L).toDF("doc_id")
    val got = Jpeg.extractJpegFeatures(Jpeg.syntheticJpeg422Table(docs))
      .collect().map(f => f.media_id -> f).toMap
    got.foreach { case (id, f) =>
      val w = 16 * (1 + (id % 2).toInt)
      val h = 8 * (1 + ((id / 2) % 2).toInt)
      assert(f.w === w && f.h === h)
      val Some((_, _, rgb)) = Jpeg.decodeJpeg(Jpeg.encodeJpeg(w, h,
        (c, bi, k) => Jpeg.syntheticCoef(id, c, bi, k),
        ncomp = 3, restartInterval = 2, chroma422 = true))
      var sr = 0L; var sg = 0L; var sb = 0L
      var i = 0
      while (i < rgb.length) {
        sr += rgb(i) & 0xff; sg += rgb(i + 1) & 0xff; sb += rgb(i + 2) & 0xff
        i += 3
      }
      assert((f.sum_r, f.sum_g, f.sum_b) === ((sr, sg, sb)), s"id $id")
      // and the restart-free stream decodes pixel-identically
      val Some((_, _, plain)) = Jpeg.decodeJpeg(Jpeg.encodeJpeg(w, h,
        (c, bi, k) => Jpeg.syntheticCoef(id, c, bi, k),
        ncomp = 3, chroma422 = true))
      assert(plain.toSeq === rgb.toSeq, s"id $id restart invariance")
    }
  }

  test("a scan that reorders components vs SOF is rejected, and the " +
      "encoder bounds its coefficient alphabet loudly") {
    val good = Jpeg.encodeJpeg(8, 8, zeroCoef)
    val sosAt = good.indices.find(i =>
      (good(i) & 0xff) == 0xFF && (good(i + 1) & 0xff) == 0xDA).get
    // swap the Cs bytes of components 2 and 3 (payload: Ns Cs1 T1 Cs2
    // T2 Cs3 T3 ...): a reordered scan must not decode with swapped
    // chroma planes
    val b = good.clone()
    val cs2 = b(sosAt + 7); b(sosAt + 7) = b(sosAt + 9); b(sosAt + 9) = cs2
    assert(Jpeg.decodeJpeg(b) === None)
    // encoder: out-of-alphabet coefficients fail with a named message
    val e1 = intercept[IllegalArgumentException](
      Jpeg.encodeJpeg(8, 8, (c, _, k) => if (k == 0) 2000 else 0))
    assert(e1.getMessage.contains("DC"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException](
      Jpeg.encodeJpeg(8, 8, (c, _, k) => if (k == 5) 64 else 0))
    assert(e2.getMessage.contains("AC"), e2.getMessage)
  }

  test("restart intervals: RSTn markers reset DC prediction and the " +
      "decode equals the restart-free stream pixel-for-pixel") {
    // per-MCU varying DC across 4 MCUs: with interval 1 every MCU
    // boundary carries a cyclic RSTn and a DC reset — a decoder that
    // failed to reset would shear every post-marker block
    def coef(c: Int, bi: Int, k: Int): Int =
      Jpeg.syntheticCoef(5L, c, bi, k)
    val plain = Jpeg.encodeJpeg(32, 8, coef)
    val rst = Jpeg.encodeJpeg(32, 8, coef, restartInterval = 1)
    assert(rst.length > plain.length) // DRI + 3 RST markers really there
    assert((0 to 7).exists(i => rst.sliding(2).exists(p =>
      (p(0) & 0xff) == 0xFF && (p(1) & 0xff) == 0xD0 + i)))
    val Some((_, _, a)) = Jpeg.decodeJpeg(plain)
    val Some((_, _, b)) = Jpeg.decodeJpeg(rst)
    assert(a.toSeq === b.toSeq)

    // a wrong restart index is malformed, not silently accepted
    val rstAt = rst.indices.find(i => (rst(i) & 0xff) == 0xFF &&
      (rst(i + 1) & 0xff) >= 0xD0 && (rst(i + 1) & 0xff) <= 0xD7).get
    val tampered = rst.clone()
    tampered(rstAt + 1) =
      (0xD0 + (((rst(rstAt + 1) & 0x07) + 1) % 8)).toByte
    assert(Jpeg.decodeJpeg(tampered) === None)
    // DRI promising restarts that never appear is malformed too
    val sosAt2 = plain.indices.find(i =>
      (plain(i) & 0xff) == 0xFF && (plain(i + 1) & 0xff) == 0xDA).get
    val dri1 = Array(0xFF, 0xDD, 0x00, 0x04, 0x00, 0x01).map(_.toByte)
    assert(Jpeg.decodeJpeg(
      plain.take(sosAt2) ++ dri1 ++ plain.drop(sosAt2)) === None)
  }

  test("features over the synthetic corpus match a driver-side " +
      "reimplementation for a sample of ids") {
    import spark.implicits._
    val docs = Seq(1L, 2L, 3L, 4L, 7L, 12L).toDF("doc_id")
    val got = Jpeg.extractJpegFeatures(Jpeg.syntheticJpegTable(docs))
      .collect().map(f => f.media_id -> f).toMap
    got.foreach { case (id, f) =>
      val w = 8 * (1 + (id % 2).toInt)
      val h = 8 * (1 + ((id / 2) % 2).toInt)
      assert(f.w === w && f.h === h)
      val Some((_, _, rgb)) = Jpeg.decodeJpeg(Jpeg.encodeJpeg(w, h,
        (c, bi, k) => Jpeg.syntheticCoef(id, c, bi, k)))
      var sr = 0L; var sg = 0L; var sb = 0L
      var i = 0
      while (i < rgb.length) {
        sr += rgb(i) & 0xff; sg += rgb(i + 1) & 0xff; sb += rgb(i + 2) & 0xff
        i += 3
      }
      assert((f.sum_r, f.sum_g, f.sum_b) === ((sr, sg, sb)), s"id $id")
    }
  }
}
