package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** REAL Windows BMP (BI_RLE8) codec — the fourth genuinely-compressed
  * image format the multimodal tier decodes with zero external
  * libraries (after PNG's DEFLATE, JPEG's huffman+IDCT and GIF's LZW):
  * BITMAPFILEHEADER + BITMAPINFOHEADER + 256-entry BGRX palette +
  * run-length-encoded 8-bit index stream with ALL FOUR RLE8
  * constructs — encoded runs `(count, index)`, absolute blocks
  * `(0x00, n≥3, bytes…, 16-bit pad)`, delta escapes `(0x00, 0x02, dx,
  * dy)` whose skipped pixels are pinned to index 0, and the
  * end-of-line / end-of-bitmap escapes. Rows are stored BOTTOM-UP
  * (positive biHeight), the only layout Windows writes for RLE8.
  *
  * RLE8 is lossless, so the oracle discipline is the PNG/GIF one: the
  * corpus' pixel indices follow closed-form integer formulas, the
  * encoder run-length-compresses them for real (every construct
  * exercised on a schedule of the file row), and the DuckDB oracle
  * recomputes the formulas — an RLE bug on either side cannot
  * hash-match.
  */
object Bmp {

  // ------------------------------------------------------------- encode

  /** Encode a bottom-up BI_RLE8 BMP whose IMAGE-coordinate index at
    * (x, y) (y = 0 is the TOP row) is `idx(x, y)`. Encoding schedule
    * (by FILE row `fr`, bottom row first):
    *  - `fr % 3 == 1`: the row opens with an ABSOLUTE block of
    *    `3 + absExtra` raw indices (padded to 16 bits when odd);
    *  - `fr % 5 == 4`: the row's last two pixels are skipped via a
    *    DELTA `(dx=2, dy=0)` — decoders must render them as index 0;
    *  - everything else: maximal encoded runs;
    *  - every row but the last ends with EOL; the last with EOB.
    */
  def encodeBmp(w: Int, h: Int, palette: Int => (Int, Int, Int),
      idx: (Int, Int) => Int, absExtra: Int = 0): Array[Byte] = {
    require(w >= 8 && h >= 1 && w <= 0xFFFF && h <= 0xFFFF,
      s"bad dims ${w}x$h (w >= 8 keeps the schedule constructs disjoint)")
    require(absExtra >= 0 && absExtra <= w - 5,
      s"absExtra $absExtra leaves no room for the delta tail")
    // the absolute-block count is a single byte in the stream: without
    // this bound a large absExtra (w can reach 0xFFFF) would silently
    // truncate the count and emit a corrupt RLE8 stream
    require(3 + absExtra <= 255,
      s"absExtra $absExtra overflows the one-byte absolute-block count")
    val rle = new java.io.ByteArrayOutputStream()
    var fr = 0
    while (fr < h) {
      val y = h - 1 - fr // image row of this file row
      val rowEnd = if (fr % 5 == 4) w - 2 else w
      var x = 0
      if (fr % 3 == 1) {
        val n = 3 + absExtra // absolute mode requires count >= 3
        rle.write(0); rle.write(n)
        var i = 0
        while (i < n) { rle.write(idx(x + i, y) & 0xFF); i += 1 }
        if ((n & 1) == 1) rle.write(0) // 16-bit alignment pad
        x += n
      }
      while (x < rowEnd) {
        val v = idx(x, y) & 0xFF
        var run = 1
        while (x + run < rowEnd && run < 255 &&
          (idx(x + run, y) & 0xFF) == v) run += 1
        rle.write(run); rle.write(v)
        x += run
      }
      if (fr % 5 == 4) { // skip the last two pixels of the row
        rle.write(0); rle.write(2); rle.write(2); rle.write(0)
      }
      if (fr == h - 1) { rle.write(0); rle.write(1) } // end of bitmap
      else { rle.write(0); rle.write(0) }             // end of line
      fr += 1
    }
    val pixels = rle.toByteArray
    val dataOffset = 14 + 40 + 256 * 4
    val out = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = {
      out.write(v & 0xFF); out.write((v >> 8) & 0xFF)
    }
    def le32(v: Int): Unit = { le16(v & 0xFFFF); le16((v >>> 16) & 0xFFFF) }
    out.write('B'); out.write('M')
    le32(dataOffset + pixels.length) // file size
    le32(0)                          // reserved
    le32(dataOffset)
    le32(40)                         // biSize
    le32(w); le32(h)                 // positive height = bottom-up
    le16(1); le16(8)                 // planes, bits per pixel
    le32(1)                          // biCompression = BI_RLE8
    le32(pixels.length)              // biSizeImage
    le32(2835); le32(2835)           // 72 dpi
    le32(256); le32(0)               // palette entries, all important
    var i = 0
    while (i < 256) {
      val (r, g, b) = palette(i)
      out.write(b & 0xFF); out.write(g & 0xFF) // BGRX entry order
      out.write(r & 0xFF); out.write(0)
      i += 1
    }
    out.write(pixels, 0, pixels.length)
    out.toByteArray
  }

  // ------------------------------------------------------------- decode

  /** Parse + RLE8-decompress a bottom-up BI_RLE8 BMP; returns
    * (width, height, row-major RGB bytes in IMAGE order, top row
    * first). Pixels left unwritten by EOL/EOB/delta skips render as
    * index 0 (the common renderer convention). Malformed input → None.
    */
  def decodeBmp(bytes: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    if (bytes == null || bytes.length < 14 + 40) return None
    if (bytes(0) != 'B' || bytes(1) != 'M') return None
    def le16(o: Int): Int = (bytes(o) & 0xFF) | ((bytes(o + 1) & 0xFF) << 8)
    def le32(o: Int): Int = le16(o) | (le16(o + 2) << 16)
    val dataOffset = le32(10)
    val biSize = le32(14)
    if (biSize < 40) return None
    val w = le32(18)
    val h = le32(22)
    if (w <= 0 || h <= 0) return None // pinned scope: bottom-up only
    if (w.toLong * h > Int.MaxValue / 4) return None
    if (le16(26) != 1 || le16(28) != 8) return None // planes, 8 bpp
    if (le32(30) != 1) return None                  // BI_RLE8 only
    val clrUsed = le32(46)
    val palN = if (clrUsed == 0) 256 else clrUsed
    if (palN <= 0 || palN > 256) return None
    val palOff = 14 + biSize
    if (palOff + 4 * palN > bytes.length || dataOffset < palOff + 4 * palN)
      return None
    if (dataOffset > bytes.length) return None
    val pix = new Array[Int](w * h) // file-order rows, index 0 default
    var p = dataOffset
    var fr = 0
    var x = 0
    var done = false
    while (!done) {
      if (p + 1 >= bytes.length) return None
      val b0 = bytes(p) & 0xFF
      val b1 = bytes(p + 1) & 0xFF
      p += 2
      if (b0 > 0) { // encoded run
        if (fr >= h || x + b0 > w) return None
        var i = 0
        while (i < b0) { pix(fr * w + x + i) = b1; i += 1 }
        x += b0
      } else b1 match {
        case 0 => // end of line
          if (fr >= h) return None
          fr += 1; x = 0
        case 1 => // end of bitmap
          done = true
        case 2 => // delta
          if (p + 1 >= bytes.length) return None
          val dx = bytes(p) & 0xFF
          val dy = bytes(p + 1) & 0xFF
          p += 2
          if (fr + dy >= h || x + dx > w) return None
          fr += dy; x += dx
        case n => // absolute block
          if (fr >= h || x + n > w) return None
          val padded = n + (n & 1)
          if (p + padded > bytes.length) return None
          var i = 0
          while (i < n) { pix(fr * w + x + i) = bytes(p + i) & 0xFF; i += 1 }
          p += padded
          x += n
      }
    }
    // palette-map to RGB, flipping bottom-up file rows to image order
    val rgb = new Array[Byte](w * h * 3)
    var yImg = 0
    while (yImg < h) {
      val frow = h - 1 - yImg
      var xx = 0
      while (xx < w) {
        val ci = pix(frow * w + xx)
        if (ci >= palN) return None
        val o = palOff + ci * 4
        val q = (yImg * w + xx) * 3
        rgb(q) = bytes(o + 2)     // R (entries are BGRX)
        rgb(q + 1) = bytes(o + 1) // G
        rgb(q + 2) = bytes(o)     // B
        xx += 1
      }
      yImg += 1
    }
    Some((w, h, rgb))
  }

  // ------------------------------------------------------------- corpus

  final case class BmpRow(media_id: Long, bmp: Array[Byte])
  final case class BmpFeatures(media_id: Long, w: Long, h: Long,
      sum_r: Long, sum_g: Long, sum_b: Long)

  /** The pinned corpus palette: entry i → (i, (3i) mod 256, 255−i) —
    * closed-form so the oracle maps indices to channels directly.
    */
  def corpusPalette(i: Int): (Int, Int, Int) =
    (i, (3 * i) % 256, 255 - i)

  /** Corpus index formula in IMAGE coordinates: runs of 4 along x
    * (exercising encoded runs), shifted per row and id. Delta-skipped
    * pixels (file rows ≡ 4 mod 5, last two columns) are index 0 —
    * replayed by the oracle from the same closed form.
    */
  def corpusIndex(id: Long, w: Int, h: Int)(x: Int, y: Int): Int =
    ((id + 5 * (x / 4) + 11 * y) % 256).toInt

  /** Deterministic BMP corpus: real RLE8-compressed images; sizes
    * cycle with id on different periods than the PNG/GIF corpora.
    */
  def syntheticBmpTable(docs: DataFrame): Dataset[BmpRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].map { id =>
      val w = 8 + (id % 13).toInt
      val h = 8 + (id % 9).toInt
      BmpRow(id, encodeBmp(w, h, corpusPalette, corpusIndex(id, w, h),
        absExtra = (id % 3).toInt))
    }
  }

  /** Decode the real BMP bytes and extract exact channel sums. */
  def extractBmpFeatures(media: Dataset[BmpRow]): Dataset[BmpFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { m =>
        val (w, h, rgb) = decodeBmp(m.bmp).getOrElse(
          throw new IllegalStateException(
            s"bad BMP for media ${m.media_id}"))
        var sr = 0L; var sg = 0L; var sb = 0L
        var k = 0
        while (k < w * h * 3) {
          sr += rgb(k) & 0xff; sg += rgb(k + 1) & 0xff
          sb += rgb(k + 2) & 0xff
          k += 3
        }
        BmpFeatures(m.media_id, w.toLong, h.toLong, sr, sg, sb)
      }
    }
  }
}
