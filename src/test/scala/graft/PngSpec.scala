package graft

import graft.multimodal.Png
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

class PngSpec extends SparkTestBase {

  private def rgbOf(id: Long)(x: Int, y: Int): (Int, Int, Int) = (
    ((id + 2 * x + 7 * y) % 256).toInt,
    ((3 * id + x + 4 * y) % 256).toInt,
    ((x.toLong * y + 5 * id) % 256).toInt)

  test("round-trip under each single filter type recovers every pixel") {
    for (ft <- 0 to 4) {
      val bytes = Png.encodePng(5, 4, rgbOf(9), _ => ft)
      val Some((w, h, rgb)) = Png.decodePng(bytes)
      assert(w === 5 && h === 4)
      for (y <- 0 until 4; x <- 0 until 5) {
        val (r, g, b) = rgbOf(9)(x, y)
        val o = (y * 5 + x) * 3
        assert((rgb(o) & 0xff) === r, s"filter $ft r($x,$y)")
        assert((rgb(o + 1) & 0xff) === g, s"filter $ft g($x,$y)")
        assert((rgb(o + 2) & 0xff) === b, s"filter $ft b($x,$y)")
      }
    }
  }

  test("property: random images with random per-row filters round-trip") {
    // raw ScalaCheck with fixed seeds — the scalatest bridge is not in
    // the offline dependency set (the PropertySpec idiom)
    val genImg = for {
      w <- Gen.choose(1, 24)
      h <- Gen.choose(1, 20)
      seed <- Gen.choose(0L, 1L << 40)
      filters <- Gen.listOfN(h, Gen.choose(0, 4))
    } yield (w, h, seed, filters.toArray)
    val cases = (1 to 60).flatMap(i =>
      genImg.apply(Gen.Parameters.default, Seed(1234L + i)))
    assert(cases.size >= 50)
    cases.foreach { case (w, h, seed, filters) =>
      def pix(x: Int, y: Int): (Int, Int, Int) = (
        math.floorMod(seed ^ (x * 31L + y * 17L), 256L).toInt,
        math.floorMod(seed + x * 13L + y * 7L, 256L).toInt,
        math.floorMod(seed * 3 + x + y * 251L, 256L).toInt)
      val bytes = Png.encodePng(w, h, pix(_, _), y => filters(y))
      val Some((dw, dh, rgb)) = Png.decodePng(bytes)
      assert(dw === w && dh === h)
      for (y <- 0 until h; x <- 0 until w) {
        val (r, g, b) = pix(x, y)
        val o = (y * w + x) * 3
        assert((rgb(o) & 0xff) === r && (rgb(o + 1) & 0xff) === g &&
          (rgb(o + 2) & 0xff) === b, s"($x,$y) of ${w}x$h seed $seed")
      }
    }
  }

  test("large image splits into multiple IDAT chunks and still decodes") {
    // 64x64 noisy image deflates to well over 1 KiB -> multi-IDAT
    val bytes = Png.encodePng(64, 64,
      (x, y) => (((x * 7919 + y * 104729) % 256, (x * y) % 256, (x + y) % 256)),
      y => y % 5)
    val idatCount = {
      var n = 0; var pos = 8
      while (pos + 12 <= bytes.length) {
        val len = java.nio.ByteBuffer.wrap(bytes, pos, 4).getInt
        if (new String(bytes, pos + 4, 4, "ASCII") == "IDAT") n += 1
        pos += 12 + len
      }
      n
    }
    assert(idatCount > 1, s"expected multi-IDAT, got $idatCount")
    val Some((w, h, rgb)) = Png.decodePng(bytes)
    assert(w === 64 && h === 64 && rgb.length === 64 * 64 * 3)
  }

  test("decode rejects malformed and out-of-profile input loudly") {
    val good = Png.encodePng(4, 3, rgbOf(1), y => y % 5)
    assert(Png.decodePng(null).isEmpty)
    assert(Png.decodePng(Array.emptyByteArray).isEmpty)
    // bad signature
    val badSig = good.clone(); badSig(0) = 'X'.toByte
    assert(Png.decodePng(badSig).isEmpty)
    // flip one byte inside the first IDAT payload -> CRC mismatch
    val crcBad = good.clone()
    val idatOff = {
      var pos = 8
      while (new String(crcBad, pos + 4, 4, "ASCII") != "IDAT")
        pos += 12 + java.nio.ByteBuffer.wrap(crcBad, pos, 4).getInt
      pos
    }
    crcBad(idatOff + 8) = (crcBad(idatOff + 8) ^ 0x55).toByte
    assert(Png.decodePng(crcBad).isEmpty)
    // truncated mid-chunk
    assert(Png.decodePng(good.take(good.length - 6)).isEmpty)
    // out-of-profile headers: 16-bit depth, grayscale, interlaced.
    // Patch IHDR (offset 8 = len+type, data at 16) and re-CRC so only
    // the profile check can reject it.
    def patched(f: Array[Byte] => Unit): Array[Byte] = {
      val p = good.clone(); f(p)
      val crc = new java.util.zip.CRC32()
      crc.update(p, 12, 4 + 13)
      java.nio.ByteBuffer.wrap(p, 12 + 4 + 13, 4).putInt(crc.getValue.toInt)
      p
    }
    assert(Png.decodePng(patched(_(16 + 8) = 16.toByte)).isEmpty) // depth
    assert(Png.decodePng(patched(_(16 + 9) = 0.toByte)).isEmpty) // gray
    assert(Png.decodePng(patched(_(16 + 10) = 1.toByte)).isEmpty) // compression method
    assert(Png.decodePng(patched(_(16 + 11) = 1.toByte)).isEmpty) // filter method
    assert(Png.decodePng(patched(_(16 + 12) = 1.toByte)).isEmpty) // adam7
    // dimension bomb: w=h=46341 (3*w*h overflows Int) must be rejected
    assert(Png.decodePng(patched { p =>
      java.nio.ByteBuffer.wrap(p, 16, 8).putInt(46341).putInt(46341)
    }).isEmpty)
  }

  private def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(java.nio.ByteBuffer.allocate(4).putInt(data.length).array())
    val t = typ.getBytes("ASCII")
    out.write(t); out.write(data)
    val crc = new java.util.zip.CRC32(); crc.update(t); crc.update(data)
    out.write(java.nio.ByteBuffer.allocate(4)
      .putInt(crc.getValue.toInt).array())
    out.toByteArray
  }

  test("FDICT (preset-dictionary) zlib stream returns None, not a hang") {
    // zlib header 0x78 0x20: CM=8, CINFO=7, FDICT set, (0x7820 % 31)==0
    // — Inflater then reports needsDictionary() with inflate()==0 and
    // needsInput()==false; without the dictionary check decodePng spins
    val sig = Array(137, 80, 78, 71, 13, 10, 26, 10).map(_.toByte)
    val ihdr = java.nio.ByteBuffer.allocate(13).putInt(2).putInt(2)
      .put(8.toByte).put(2.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte).array()
    val fdict = Array(0x78, 0x20, 1, 2, 3, 4, 5, 6, 7, 8).map(_.toByte)
    val bytes = sig ++ chunk("IHDR", ihdr) ++ chunk("IDAT", fdict) ++
      chunk("IEND", Array.emptyByteArray)
    assert(Png.decodePng(bytes).isEmpty)
  }

  test("missing adler32 trailer (all deflate blocks present) is rejected") {
    // rebuild a valid PNG as one IDAT whose zlib stream drops the 4
    // trailing adler bytes — chunk CRCs valid, payload inflates to the
    // full expected length, only the drain-to-finished check can reject
    val full = Png.encodePng(16, 16, rgbOf(3), y => y % 5)
    val z = new java.io.ByteArrayOutputStream()
    var ihdrData: Array[Byte] = null
    var pos = 8
    while (pos + 12 <= full.length) {
      val len = java.nio.ByteBuffer.wrap(full, pos, 4).getInt
      new String(full, pos + 4, 4, "ASCII") match {
        case "IHDR" => ihdrData = java.util.Arrays.copyOfRange(
          full, pos + 8, pos + 8 + len)
        case "IDAT" => z.write(full, pos + 8, len)
        case _ =>
      }
      pos += 12 + len
    }
    val zb = z.toByteArray
    assert(zb.length > 4)
    val noAdler = java.util.Arrays.copyOfRange(zb, 0, zb.length - 4)
    val sig = java.util.Arrays.copyOfRange(full, 0, 8)
    val bytes = sig ++ chunk("IHDR", ihdrData) ++ chunk("IDAT", noAdler) ++
      chunk("IEND", Array.emptyByteArray)
    assert(Png.decodePng(bytes).isEmpty)
    // control: the same reframe WITH the trailer still decodes
    val okBytes = sig ++ chunk("IHDR", ihdrData) ++ chunk("IDAT", zb) ++
      chunk("IEND", Array.emptyByteArray)
    assert(Png.decodePng(okBytes).isDefined)
  }

  test("truncated DEFLATE stream (valid chunk framing) is rejected") {
    // re-frame the image keeping only the first IDAT's first half,
    // with a VALID CRC — only the inflate-length check can catch it
    val full = Png.encodePng(16, 16, rgbOf(3), y => y % 5)
    val out = new java.io.ByteArrayOutputStream()
    out.write(full, 0, 8)
    var pos = 8
    var wroteIdat = false
    while (pos + 12 <= full.length) {
      val len = java.nio.ByteBuffer.wrap(full, pos, 4).getInt
      val typ = new String(full, pos + 4, 4, "ASCII")
      if (typ == "IDAT") {
        if (!wroteIdat) {
          wroteIdat = true
          val half = java.util.Arrays.copyOfRange(full, pos + 8,
            pos + 8 + len / 2)
          out.write(java.nio.ByteBuffer.allocate(4).putInt(half.length).array())
          out.write("IDAT".getBytes("ASCII")); out.write(half)
          val crc = new java.util.zip.CRC32()
          crc.update("IDAT".getBytes("ASCII")); crc.update(half)
          out.write(java.nio.ByteBuffer.allocate(4)
            .putInt(crc.getValue.toInt).array())
        }
      } else out.write(full, pos, 12 + len)
      pos += 12 + len
    }
    assert(Png.decodePng(out.toByteArray).isEmpty)
  }

  test("synthetic corpus decodes to the closed-form feature sums") {
    import spark.implicits._
    val docs = (0L until 20L).toDF("doc_id")
    val feats = Png.extractPngFeatures(Png.syntheticPngTable(docs))
      .collect().map(f => f.media_id -> f).toMap
    assert(feats.size === 20)
    for (id <- 0L until 20L) {
      val w = 8 + (id % 16).toInt
      val h = 8 + (id % 12).toInt
      var sr = 0L; var sg = 0L; var sb = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val (r, g, b) = rgbOf(id)(x, y)
        sr += r; sg += g; sb += b
      }
      val f = feats(id)
      assert(f.w === w && f.h === h)
      assert(f.sum_r === sr && f.sum_g === sg && f.sum_b === sb)
      var rsr = 0L
      for (j <- 0 until 8; i <- 0 until 8)
        rsr += rgbOf(id)(i * w / 8, j * h / 8)._1
      assert(f.rs_sum_r === rsr)
    }
  }
}
