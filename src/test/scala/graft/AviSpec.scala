package graft

import graft.multimodal.{Avi, Jpeg}

/** The AVI MJPG container tier: encode/decode round trip, strict
  * malformed-input rejection, padding handling, and per-frame decode
  * consistency with the standalone JPEG path.
  */
class AviSpec extends SparkTestBase {
  import spark.implicits._

  private def frame(id: Long, w: Int, h: Int): Array[Byte] =
    Jpeg.encodeJpeg(w, h, (c, bi, k) => Jpeg.syntheticCoef(id, c, bi, k),
      ncomp = 3, chroma420 = true, restartInterval = 1)

  test("round trip: container returns the exact frame bytes + timing") {
    val fs = Seq(frame(7L, 16, 32), frame(8L, 16, 32), frame(9L, 16, 32))
    val avi = Avi.encodeAviMjpeg(16, 32, 40000, fs)
    val Some((w, h, us, got)) = Avi.decodeAviMjpeg(avi)
    assert((w, h, us) == (16, 32, 40000L))
    assert(got.length == 3)
    got.zip(fs).foreach { case (a, b) => assert(a.sameElements(b)) }
  }

  test("odd-length frame payloads pad to even chunk boundaries and " +
      "still round-trip exactly") {
    // JFIF frames can be odd-length; force one by appending a trailing
    // comment-free byte is illegal, so instead build frames until one
    // is odd (the synthetic encoder produces both parities)
    val fs = (0L until 8L).map(i => frame(i, 16, 16))
    assert(fs.exists(_.length % 2 == 1), "corpus never odd — test vacuous")
    val avi = Avi.encodeAviMjpeg(16, 16, 33333, fs)
    val Some((_, _, _, got)) = Avi.decodeAviMjpeg(avi)
    assert(got.length == fs.length)
    got.zip(fs).foreach { case (a, b) => assert(a.sameElements(b)) }
  }

  test("malformed containers are rejected, not mis-parsed") {
    val fs = Seq(frame(1L, 16, 16))
    val avi = Avi.encodeAviMjpeg(16, 16, 33333, fs)
    // bad magic
    val m1 = avi.clone(); m1(0) = 'X'.toByte
    assert(Avi.decodeAviMjpeg(m1).isEmpty)
    // truncated
    assert(Avi.decodeAviMjpeg(avi.take(avi.length / 2)).isEmpty)
    // idx1 count disagrees with the stream: flip the declared size so
    // it claims two entries
    val idxPos = {
      var p = -1
      for (i <- 0 until avi.length - 4)
        if (avi(i) == 'i' && avi(i + 1) == 'd' && avi(i + 2) == 'x' &&
          avi(i + 3) == '1') p = i
      p
    }
    assert(idxPos > 0)
    val m2 = avi.clone(); m2(idxPos + 4) = 32.toByte
    assert(Avi.decodeAviMjpeg(m2).isEmpty)
    // totalFrames disagrees (avih dwTotalFrames at hdrl avih + 8 + 16)
    val m3 = avi.clone()
    // find 'avih'
    var ap = -1
    for (i <- 0 until avi.length - 4)
      if (avi(i) == 'a' && avi(i + 1) == 'v' && avi(i + 2) == 'i' &&
        avi(i + 3) == 'h') ap = i
    m3(ap + 8 + 16) = 9.toByte
    assert(Avi.decodeAviMjpeg(m3).isEmpty)
    assert(Avi.decodeAviMjpeg(Array[Byte](1, 2, 3)).isEmpty)
  }

  test("extractMjpegFrames equals the standalone JPEG decode per frame") {
    val docs = Seq(0L, 1L, 2L, 3L, 5L, 10L).toDF("doc_id")
    val got = Avi.extractMjpegFrames(Avi.syntheticMjpegTable(docs))
      .collect().map(f => (f.media_id, f.frame_no) ->
        (f.w, f.h, f.sum_r, f.sum_g, f.sum_b)).toMap
    assert(got.size == 18)
    for (id <- Seq(0L, 1L, 2L, 3L, 5L, 10L); f <- 0 until 3) {
      val w = 16 * (1 + (id % 2).toInt)
      val h = 16 * (1 + ((id / 2) % 2).toInt)
      val jf = Jpeg.extractJpegFeatures(
        Seq(Jpeg.JpegRow(0L, frame(id * 4 + f, w, h))).toDS()).head()
      assert(got((id, f.toLong)) == (jf.w, jf.h, jf.sum_r, jf.sum_g,
        jf.sum_b), s"media $id frame $f")
    }
  }

  test("frame period formula matches the gate row's oracle literal") {
    val docs = Seq(0L, 6L, 13L).toDF("doc_id")
    val got = Avi.extractMjpegFrames(Avi.syntheticMjpegTable(docs))
      .collect().map(f => f.media_id -> f.us_per_frame).toMap
    assert(got == Map(0L -> 33333L, 6L -> 39333L, 13L -> 39333L))
  }
}
