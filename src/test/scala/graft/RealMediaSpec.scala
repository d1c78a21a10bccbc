package graft

import graft.multimodal.RealMedia

class RealMediaSpec extends SparkTestBase {

  test("PPM round-trip: encode then decode recovers dims and pixels") {
    val bytes = RealMedia.encodePpm(3, 2, (x, y) => (x * 10, y * 20, x + y))
    val Some((w, h, rgb)) = RealMedia.decodePpm(bytes)
    assert(w === 3 && h === 2 && rgb.length === 18)
    // pixel (2, 1): r=20, g=20, b=3, at offset (1*3+2)*3
    assert((rgb(15) & 0xff) === 20)
    assert((rgb(16) & 0xff) === 20)
    assert((rgb(17) & 0xff) === 3)
  }

  test("PPM decode rejects corrupt input") {
    assert(RealMedia.decodePpm(null).isEmpty)
    assert(RealMedia.decodePpm("P5\n1 1\n255\nx".getBytes).isEmpty)
    assert(RealMedia.decodePpm("P6\n4 4\n255\nxx".getBytes).isEmpty) // short
    assert(RealMedia.decodePpm("P6\n2 2\n15\nxxxxxxxxxxxx".getBytes).isEmpty)
    // hostile dims whose w*h*3 overflows Int must be rejected, not
    // wrapped into a passing bounds check
    assert(RealMedia.decodePpm("P6\n100000 100000\n255\nxxxx".getBytes).isEmpty)
    assert(RealMedia.decodePpm("P6\n65536 65536\n255\nxxxx".getBytes).isEmpty)
  }

  test("nearest-neighbor resize picks the exact source pixels") {
    // 4x4 image, red channel = x + 4*y, resize to 2x2 -> picks (0,0),(2,0),(0,2),(2,2)
    val src = RealMedia.encodePpm(4, 4, (x, y) => (x + 4 * y, 0, 0))
    val Some((w, h, rgb)) = RealMedia.decodePpm(src)
    val out = RealMedia.resizeNearest(w, h, rgb, 2, 2)
    val reds = Seq(0, 3, 6, 9).map(i => out(i) & 0xff)
    assert(reds === Seq(0, 2, 8, 10))
  }

  test("concat-PPM stream walk: varying frame dims, exact sampling") {
    // three frames with DIFFERENT dims — the walk must get each frame's
    // length from its own header, not assume a constant stride
    val f0 = RealMedia.encodePpm(2, 2, (x, y) => (10 + x, 0, 0))
    val f1 = RealMedia.encodePpm(3, 1, (x, y) => (20 + x, 0, 0))
    val f2 = RealMedia.encodePpm(1, 4, (x, y) => (30 + y, 0, 0))
    val stream = f0 ++ f1 ++ f2
    var off = 0
    val dims = scala.collection.mutable.ArrayBuffer[(Int, Int)]()
    while (off < stream.length) {
      val Some((w, h, _, next)) = RealMedia.decodePpmAt(stream, off)
      dims += ((w, h)); off = next
    }
    assert(dims.toSeq === Seq((2, 2), (3, 1), (1, 4)))
    // truncated final frame is rejected, not silently dropped
    assert(RealMedia.decodePpmAt(stream.dropRight(1),
      (f0.length + f1.length)).isEmpty)
  }

  test("video frame sampling matches closed-form sums at every=2") {
    import spark.implicits._
    val docs = Seq(0L, 5L, 7L, 10L).toDF("doc_id") // 7 filtered out
    val clips = RealMedia.syntheticVideoTable(docs)
    val got = RealMedia.sampleFrames(clips, every = 2).collect()
      .sortBy(r => (r.media_id, r.frame_idx))
    // closed-form re-derivation
    val want = Seq(0L, 5L, 10L).flatMap { id =>
      val nf = 4 + (id % 5).toInt; val w = 8 + (id % 8).toInt
      val h = 6 + (id % 6).toInt
      (0 until nf).filter(_ % 2 == 0).map { f =>
        val sr = (for (y <- 0 until h; x <- 0 until w)
          yield (id + 11L * f + 3 * x + 5 * y) % 256).sum
        RealMedia.FrameFeatures(id, f.toLong, nf.toLong, w.toLong, h.toLong, sr)
      }
    }
    assert(got.toSeq === want)
  }

  test("WAV round-trip: encode then decode recovers rate and samples") {
    val samples = Array.tabulate(300)(i => ((i * 37) % 16384 - 8192).toShort)
    val bytes = RealMedia.encodeWav(16000, samples)
    val Some((rate, got)) = RealMedia.decodeWav(bytes)
    assert(rate === 16000)
    assert(got.toSeq === samples.toSeq)
  }

  test("WAV decode rejects corrupt input and non-PCM16-mono") {
    assert(RealMedia.decodeWav(null).isEmpty)
    assert(RealMedia.decodeWav("RIFFxxxxWAVO".getBytes.padTo(44, 0.toByte)).isEmpty)
    // stereo header
    val stereo = RealMedia.encodeWav(8000, Array[Short](1, 2, 3))
    stereo(22) = 2 // channels field
    assert(RealMedia.decodeWav(stereo).isEmpty)
    // fmt chunk declares 16 bytes but the buffer truncates mid-parse:
    // must return None, not throw BufferUnderflowException
    val good = RealMedia.encodeWav(8000, Array[Short](1, 2, 3))
    assert(RealMedia.decodeWav(good.take(12 + 8 + 4)).isEmpty)
    // fmt chunk with a declared length < 16 would misalign the walk
    val shortFmt = good.clone()
    java.nio.ByteBuffer.wrap(shortFmt, 16, 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(0)
    assert(RealMedia.decodeWav(shortFmt).isEmpty)
  }

  test("mu-law: G.711 anchors, WAV round-trip, bad-format rejection") {
    // standard expansion anchors: 0xFF/0x7F are the two zeros, 0x00 is
    // -max, 0x80 is +max (32124 = ((15*8+132)<<7)-132)
    assert(RealMedia.mulawToLinear(0xFF.toByte) === 0.toShort)
    assert(RealMedia.mulawToLinear(0x7F.toByte) === 0.toShort)
    assert(RealMedia.mulawToLinear(0x00.toByte) === (-32124).toShort)
    assert(RealMedia.mulawToLinear(0x80.toByte) === 32124.toShort)
    // expansion is odd-symmetric: b and b^0x80 give opposite signs
    for (b <- 0 until 128) {
      assert(RealMedia.mulawToLinear(b.toByte) ===
        (-RealMedia.mulawToLinear((b | 0x80).toByte)).toShort)
    }
    // round-trip through the format-7 WAV container
    val mu = Array.tabulate(50)(i => ((i * 11 + 3) % 256).toByte)
    val Some((rate, samples)) =
      RealMedia.decodeWav(RealMedia.encodeWavMulaw(8000, mu))
    assert(rate === 8000 && samples.length === 50)
    assert(samples.toSeq === mu.toSeq.map(RealMedia.mulawToLinear))
    // mu-law must declare 8 bits; a 16-bit format-7 header is malformed
    val bad = RealMedia.encodeWavMulaw(8000, mu)
    java.nio.ByteBuffer.wrap(bad, 34, 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putShort(16)
    assert(RealMedia.decodeWav(bad).isEmpty)
    // a hostile NEGATIVE chunk length must be rejected (None), never
    // surface as NegativeArraySizeException / position() blow-up — it
    // would pass every `remaining() < len` guard (negative is never
    // greater). Pin both the data-chunk and unknown-chunk-skip paths.
    val negData = RealMedia.encodeWavMulaw(8000, mu)
    java.nio.ByteBuffer.wrap(negData, 40, 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(-5)
    assert(RealMedia.decodeWav(negData).isEmpty)
    val negSkip = RealMedia.encodeWavMulaw(8000, mu)
    java.nio.ByteBuffer.wrap(negSkip, 36, 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .put("junk".getBytes("ASCII")).putInt(-64)
    assert(RealMedia.decodeWav(negSkip).isEmpty)
  }

  test("A-law: G.711 anchors, inverted sign convention, WAV round-trip") {
    // standard expansion anchors: 0x55/0xD5 are the two near-zeros
    // (-8/+8 — A-law has no exact zero), 0xAA is +max 32256, 0x2A is
    // -max; note sign bit SET = POSITIVE (the inverse of mu-law)
    assert(RealMedia.alawToLinear(0x55.toByte) === (-8).toShort)
    assert(RealMedia.alawToLinear(0xD5.toByte) === 8.toShort)
    assert(RealMedia.alawToLinear(0xAA.toByte) === 32256.toShort)
    assert(RealMedia.alawToLinear(0x2A.toByte) === (-32256).toShort)
    // odd symmetry: b and b^0x80 give opposite signs
    for (b <- 0 until 128) {
      assert(RealMedia.alawToLinear(b.toByte) ===
        (-RealMedia.alawToLinear((b | 0x80).toByte)).toShort)
    }
    // magnitude is strictly monotone in the 7-bit (segment, mantissa)
    // code — a segment-shift bug would reorder it
    val mags = (0 until 128).map(c =>
      RealMedia.alawToLinear(((c | 0x80) ^ 0x55).toByte).toInt)
    assert(mags === mags.sorted && mags.distinct.size === 128)
    // round-trip through the format-6 WAV container
    val al = Array.tabulate(50)(i => ((i * 13 + 7) % 256).toByte)
    val Some((rate, samples)) =
      RealMedia.decodeWav(RealMedia.encodeWavAlaw(8000, al))
    assert(rate === 8000 && samples.length === 50)
    assert(samples.toSeq === al.toSeq.map(RealMedia.alawToLinear))
    // A-law must declare 8 bits; a 16-bit format-6 header is malformed
    val bad = RealMedia.encodeWavAlaw(8000, al)
    java.nio.ByteBuffer.wrap(bad, 34, 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putShort(16)
    assert(RealMedia.decodeWav(bad).isEmpty)
    // the synthetic corpus features equal a direct per-byte fold
    val docs = spark.range(0, 40).toDF("doc_id")
    val got = RealMedia.extractAlawFeatures(
        RealMedia.syntheticAlawTable(docs))
      .collect().sortBy(_.media_id)
    got.foreach { f =>
      val n = 64 + (f.media_id % 96).toInt
      val lins = (0 until n).map(i => RealMedia.alawToLinear(
        ((f.media_id * 41 + i * 13) % 256).toByte).toLong)
      assert(f.n_samples === n.toLong)
      assert(f.sum_linear === lins.sum)
      assert(f.min_linear === lins.min)
      assert(f.max_linear === lins.max)
    }
  }

  /** Independent in-test IMA ADPCM step (same public spec, separate
    * code path from the main decoder).
    */
  private def imaRef(pred0: Int, idx0: Int, nibs: Seq[Int]): Seq[Int] = {
    var pred = pred0; var idx = idx0
    pred0 +: nibs.map { nib =>
      val step = RealMedia.imaStepTable(idx)
      var diff = step / 8
      if ((nib & 1) != 0) diff += step / 4
      if ((nib & 2) != 0) diff += step / 2
      if ((nib & 4) != 0) diff += step
      pred = if ((nib & 8) != 0) pred - diff else pred + diff
      pred = math.max(-32768, math.min(32767, pred))
      idx = math.max(0, math.min(88,
        idx + RealMedia.imaIndexTable(nib & 7)))
      pred
    }
  }

  test("IMA ADPCM: decode matches an independent reference fold, " +
      "incl. clamps, multi-block and fact truncation") {
    // hand vector from pred0=0, idx0=0 (step 7): nib 2 -> +3, nib 12
    // (8|4) -> -7
    assert(imaRef(0, 0, Seq(2, 12)) === Seq(0, 3, -4))
    // full-block round-trips across seed/code shapes, incl. a
    // saturation run (idx0=88, all-7 codes push pred past +32767)
    for ((pred0, idx0, gen) <- Seq(
        (0, 0, (j: Int) => (j * 5 + 3) % 16),
        (-2048, 44, (j: Int) => (j * 7 + 1) % 16),
        (2047, 88, (_: Int) => 7),
        (-32768, 88, (_: Int) => 15))) {
      val nibs = Array.tabulate(64)(gen)
      val wav = RealMedia.encodeWavImaAdpcm(8000, 36, 65,
        Seq((pred0, idx0, nibs)))
      val Some((rate, got)) = RealMedia.decodeWav(wav)
      assert(rate === 8000)
      assert(got.map(_.toInt).toSeq === imaRef(pred0, idx0, nibs.toSeq))
    }
    // two blocks, fact truncates mid-second-block: 100 of 130 samples
    val b0 = (100, 20, Array.tabulate(64)(j => (j * 3) % 16))
    val b1 = (-500, 70, Array.tabulate(64)(j => (j * 11 + 2) % 16))
    val Some((_, trunc)) =
      RealMedia.decodeWav(RealMedia.encodeWavImaAdpcm(8000, 36, 100,
        Seq(b0, b1)))
    val full = imaRef(b0._1, b0._2, b0._3.toSeq) ++
      imaRef(b1._1, b1._2, b1._3.toSeq)
    assert(trunc.length === 100)
    assert(trunc.map(_.toInt).toSeq === full.take(100))
  }

  test("IMA ADPCM: malformed containers are rejected, not thrown") {
    val nibs = Array.tabulate(64)(j => j % 16)
    val good = RealMedia.encodeWavImaAdpcm(8000, 36, 65, Seq((0, 0, nibs)))
    assert(RealMedia.decodeWav(good).isDefined)
    def patched(off: Int, bs: Byte*): Array[Byte] = {
      val c = good.clone(); bs.zipWithIndex.foreach { case (b, i) =>
        c(off + i) = b }; c
    }
    // fact chunk renamed away: compressed WAV without a true count
    assert(RealMedia.decodeWav(
      patched(40, 'f'.toByte, 'a'.toByte, 'k'.toByte, 'e'.toByte)).isEmpty)
    // block header step index > 88
    assert(RealMedia.decodeWav(patched(62, 89.toByte)).isEmpty)
    // samples-per-block inconsistent with blockAlign
    assert(RealMedia.decodeWav(patched(38, 64.toByte)).isEmpty)
    // fact count exceeding what the data blocks can decode
    assert(RealMedia.decodeWav(patched(48, 66.toByte)).isEmpty)
    // truncated data chunk (declared longer than the payload)
    assert(RealMedia.decodeWav(good.dropRight(4)).isEmpty)
  }

  test("ADPCM corpus features equal the independent fold end-to-end") {
    import spark.implicits._
    val docs = (0L until 30L).toDF("doc_id")
    val feats = RealMedia.extractAdpcmFeatures(
      RealMedia.syntheticAdpcmTable(docs)).collect()
    assert(feats.length === 30)
    for (f <- feats) {
      val id = f.media_id
      val n = (64 + id % 64).toInt
      val nBlocks = (n + 64) / 65
      val all = (0 until nBlocks).flatMap { b =>
        imaRef((((id * 131 + b * 17) % 4096) - 2048).toInt,
          ((id * 7 + b * 13) % 89).toInt,
          Seq.tabulate(64)(j => ((id * 5 + (b * 64 + j) * 3) % 16).toInt))
      }.take(n)
      assert(f.n_samples === n.toLong)
      assert(f.sum_linear === all.map(_.toLong).sum)
      assert(f.min_linear === all.min.toLong)
      assert(f.max_linear === all.max.toLong)
      assert(f.last_linear === all.last.toLong)
    }
  }

  test("decoded features equal the closed-form formulas end-to-end") {
    import spark.implicits._
    val docs = (0L until 40L).toDF("doc_id")
    val feats = RealMedia.extractRealFeatures(
      RealMedia.syntheticRealMedia(docs)).collect()
    assert(feats.length === 40)
    for (f <- feats) {
      val id = f.media_id
      if (id % 2 == 0) {
        val w = 8 + (id % 16); val h = 8 + (id % 12)
        assert(f.kind === "img" && f.w.get === w && f.h.get === h)
        var sr = 0L
        for (y <- 0L until h; x <- 0L until w) sr += (id + 3 * x + 5 * y) % 256
        assert(f.sum_r.get === sr)
        var rsr = 0L
        for (j <- 0 until 8; i <- 0 until 8)
          rsr += (id + 3 * (i * w / 8) + 5 * (j * h / 8)) % 256
        assert(f.rs_sum_r.get === rsr)
      } else {
        val rate = 8000 + 100 * (id % 8); val n = 256 + (id % 128)
        assert(f.kind === "aud" && f.rate.get === rate && f.n_samples.get === n)
        assert(f.duration_us.get === n * 1000000L / rate)
        var ss = 0L
        for (t <- 0L until n) {
          val s = (id * 7 + t * 13) % 16384 - 8192
          ss += s * s
        }
        assert(f.amp_sum_sq.get === ss)
      }
    }
  }
}
