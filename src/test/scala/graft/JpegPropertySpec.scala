package graft

import graft.multimodal.{Jpeg, JpegTables}

/** Property coverage for the JPEG codec: random coefficient sets,
  * dims, profiles, and restart intervals must round-trip to EXACTLY
  * the pixels an independent dequant+IDCT+convert computation gives —
  * huffman corner cases (max-magnitude values, adjacent ZRLs, empty
  * blocks, deep DC swings) beyond the fixed corpus all land here.
  */
class JpegPropertySpec extends SparkTestBase {

  private def groundTruth(w: Int, h: Int, chroma420: Boolean,
      ncomp: Int, coef: (Int, Int, Int) => Int): Array[Byte] = {
    val zz = JpegTables.Zigzag
    def plane(c: Int, pw: Int, ph: Int, biOf: (Int, Int) => Int,
        q: Array[Int]): Array[Int] = {
      val out = new Array[Int](pw * ph)
      for (my <- 0 until ph / 8; mx <- 0 until pw / 8) {
        val dq = new Array[Int](64)
        val bi = biOf(my, mx)
        for (k <- 0 until 64) dq(zz(k)) = coef(c, bi, k) * q(k)
        val px = Jpeg.idctBlock(dq)
        for (i <- 0 until 64)
          out((my * 8 + i / 8) * pw + mx * 8 + i % 8) = px(i)
      }
      out
    }
    val (yp, cbp, crp) =
      if (chroma420) {
        val mcusX = w / 16
        (plane(0, w, h, (my, mx) =>
          ((my / 2) * mcusX + mx / 2) * 4 + (my % 2) * 2 + (mx % 2),
          JpegTables.QuantLuma),
          plane(1, w / 2, h / 2, (my, mx) => my * mcusX + mx,
            JpegTables.QuantChroma),
          plane(2, w / 2, h / 2, (my, mx) => my * mcusX + mx,
            JpegTables.QuantChroma))
      } else {
        val mcusX = w / 8
        def bi(my: Int, mx: Int) = my * mcusX + mx
        (plane(0, w, h, bi, JpegTables.QuantLuma),
          if (ncomp == 3) plane(1, w, h, bi, JpegTables.QuantChroma)
          else null,
          if (ncomp == 3) plane(2, w, h, bi, JpegTables.QuantChroma)
          else null)
      }
    val rgb = new Array[Byte](w * h * 3)
    def clamp(d: Double): Byte = {
      val v = math.floor(d + 0.5).toLong
      math.min(math.max(v, 0L), 255L).toByte
    }
    for (row <- 0 until h; col <- 0 until w) {
      val i = row * w + col
      if (ncomp == 1) {
        val y = yp(i)
        rgb(3 * i) = y.toByte; rgb(3 * i + 1) = y.toByte
        rgb(3 * i + 2) = y.toByte
      } else {
        val (cw, rr, cc) =
          if (chroma420) (w / 2, row / 2, col / 2) else (w, row, col)
        val yv = yp(i); val cb = cbp(rr * cw + cc); val cr = crp(rr * cw + cc)
        rgb(3 * i) = clamp(yv + 1.402 * (cr - 128))
        rgb(3 * i + 1) = clamp(yv - 0.344136 * (cb - 128) -
          0.714136 * (cr - 128))
        rgb(3 * i + 2) = clamp(yv + 1.772 * (cb - 128))
      }
    }
    rgb
  }

  test("property: random coefficients round-trip bit-exactly across " +
      "profiles, dims and restart intervals") {
    val rnd = new scala.util.Random(20260815)
    for (trial <- 1 to 40) {
      val chroma420 = trial % 3 == 0
      val ncomp = if (!chroma420 && trial % 5 == 0) 1 else 3
      val unit = if (chroma420) 16 else 8
      val w = unit * (1 + rnd.nextInt(2))
      val h = unit * (1 + rnd.nextInt(2))
      val restart = Seq(0, 1, 2)(rnd.nextInt(3))
      // random sparse coefficients, deterministic per (c, bi, k) so the
      // encoder's multiple passes see one consistent function; edge
      // magnitudes (+-63, DC +-1023 swings via large deltas) included
      def coefOf(c: Int, bi: Int, k: Int): Int = {
        val x = (c * 2654435761L + bi * 40503L + k * 69427L +
          trial * 104729L) & 0xffffffffL
        if (k == 0) ((x % 2047).toInt - 1023)
        else if (x % 7 == 0) {
          val v = ((x >> 8) % 127).toInt - 63
          if (v == 0) 17 else v
        } else 0
      }
      val bytes = Jpeg.encodeJpeg(w, h, coefOf, ncomp, chroma420, restart)
      val got = Jpeg.decodeJpeg(bytes)
      assert(got.isDefined,
        s"trial $trial (${w}x$h 420=$chroma420 n=$ncomp rst=$restart)")
      val Some((gw, gh, rgb)) = got
      assert(gw === w && gh === h)
      val want = groundTruth(w, h, chroma420, ncomp, coefOf)
      assert(rgb.toSeq === want.toSeq,
        s"trial $trial (${w}x$h 420=$chroma420 n=$ncomp rst=$restart)")
    }
  }
}
