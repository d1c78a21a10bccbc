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
  }

  test("nearest-neighbor resize picks the exact source pixels") {
    // 4x4 image, red channel = x + 4*y, resize to 2x2 -> picks (0,0),(2,0),(0,2),(2,2)
    val src = RealMedia.encodePpm(4, 4, (x, y) => (x + 4 * y, 0, 0))
    val Some((w, h, rgb)) = RealMedia.decodePpm(src)
    val out = RealMedia.resizeNearest(w, h, rgb, 2, 2)
    val reds = Seq(0, 3, 6, 9).map(i => out(i) & 0xff)
    assert(reds === Seq(0, 2, 8, 10))
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
