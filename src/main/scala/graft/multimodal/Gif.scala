package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** REAL GIF87a codec — the third genuinely-compressed format the
  * multimodal tier decodes with zero external libraries (after PNG's
  * DEFLATE and JPEG's huffman+IDCT): header + logical screen
  * descriptor + global color table + image descriptor + LZW-compressed
  * index stream (variable-width codes 3..12 bits, LSB-first packing,
  * clear/EOI codes, the KwKwK case, dictionary reset at 4096) +
  * trailer. GIF is lossless, so the oracle discipline is the PNG one:
  * pixels follow closed-form integer formulas, the encoder compresses
  * them for real, and the oracle recomputes the formulas — an LZW bug
  * on either side cannot hash-match.
  *
  * Scope (pinned): GIF87a, one image, global 256-color table, not
  * interlaced, no local color table; extension blocks (0x21) are
  * SKIPPED (real-world GIFs carry them), anything else returns None.
  */
object Gif {

  // ------------------------------------------------------------- encode

  /** LSB-first variable-width bit packer into 255-byte sub-blocks. */
  private final class BitPacker {
    private val out = new java.io.ByteArrayOutputStream()
    private var cur = 0L
    private var nbits = 0
    private val block = new Array[Byte](255)
    private var blockLen = 0
    private def flushByte(b: Int): Unit = {
      block(blockLen) = b.toByte
      blockLen += 1
      if (blockLen == 255) {
        out.write(255); out.write(block, 0, 255); blockLen = 0
      }
    }
    def put(code: Int, width: Int): Unit = {
      cur |= code.toLong << nbits
      nbits += width
      while (nbits >= 8) {
        flushByte((cur & 0xFF).toInt)
        cur >>>= 8; nbits -= 8
      }
    }
    def finish(): Array[Byte] = {
      if (nbits > 0) { flushByte((cur & 0xFF).toInt); cur = 0; nbits = 0 }
      if (blockLen > 0) {
        out.write(blockLen); out.write(block, 0, blockLen); blockLen = 0
      }
      out.write(0) // block terminator
      out.toByteArray
    }
  }

  /** Standard GIF LZW compression of an index stream (alphabet size
    * 2^minCodeSize): emits CLEAR first, resets the dictionary at 4096.
    *
    * The code WIDTH schedule is driven by an explicit decoder
    * simulation: the decoder adds its table entry one code boundary
    * LATER than the encoder (it learns entry (prev, first(cur)) only
    * when it reads `cur`), so an encoder that widened off its own
    * table size would widen one code too early at every 2^k boundary.
    * `decNext`/`decWidth` track exactly what a standard decoder's
    * table/width are at each read, and every code is packed at
    * decWidth.
    */
  private def lzwCompress(indices: Array[Int], minCodeSize: Int): Array[Byte] = {
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val packer = new BitPacker
    var dict = scala.collection.mutable.HashMap[(Int, Int), Int]()
    var nextCode = eoi + 1
    // decoder simulation: table size and width as the reader sees them
    var decNext = eoi + 1
    var decWidth = minCodeSize + 1
    var dataCodesSinceClear = 0
    def emitData(code: Int): Unit = {
      packer.put(code, decWidth)
      dataCodesSinceClear += 1
      // the decoder adds one entry per data code EXCEPT the first
      // after a clear, and stops at 4096 until the next clear
      if (dataCodesSinceClear >= 2 && decNext < 4096) {
        decNext += 1
        if (decNext == (1 << decWidth) && decWidth < 12) decWidth += 1
      }
    }
    def emitClear(): Unit = {
      packer.put(clear, decWidth)
      decNext = eoi + 1; decWidth = minCodeSize + 1
      dataCodesSinceClear = 0
      dict = scala.collection.mutable.HashMap()
      nextCode = eoi + 1
    }
    packer.put(clear, decWidth)
    var prefix = -1
    var i = 0
    while (i < indices.length) {
      val k = indices(i)
      require(k >= 0 && k < clear, s"index $k out of palette range")
      if (prefix < 0) prefix = k
      else dict.get((prefix, k)) match {
        case Some(code) => prefix = code
        case None =>
          emitData(prefix)
          if (nextCode < 4096) {
            dict((prefix, k)) = nextCode
            nextCode += 1
          } else {
            emitClear()
          }
          prefix = k
      }
      i += 1
    }
    if (prefix >= 0) emitData(prefix)
    packer.put(eoi, decWidth)
    packer.finish()
  }

  /** Encode a GIF87a: 256-entry global color table from `palette`,
    * one non-interlaced image whose index at (x, y) is `idx(x, y)`.
    */
  def encodeGif(w: Int, h: Int, palette: Int => (Int, Int, Int),
      idx: (Int, Int) => Int): Array[Byte] = {
    require(w > 0 && h > 0 && w <= 0xFFFF && h <= 0xFFFF, s"bad dims ${w}x$h")
    val out = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    out.write("GIF87a".getBytes("ASCII"))
    le16(w); le16(h)
    out.write(0xF7) // GCT present, 8-bit color resolution, 256 entries
    out.write(0)    // background index
    out.write(0)    // aspect ratio
    var i = 0
    while (i < 256) {
      val (r, g, b) = palette(i)
      out.write(r & 0xFF); out.write(g & 0xFF); out.write(b & 0xFF)
      i += 1
    }
    out.write(0x2C) // image descriptor
    le16(0); le16(0); le16(w); le16(h)
    out.write(0)    // no local table, not interlaced
    out.write(8)    // LZW minimum code size
    val indices = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { indices(y * w + x) = idx(x, y) & 0xFF; x += 1 }
      y += 1
    }
    val lzw = lzwCompress(indices, 8)
    out.write(lzw, 0, lzw.length)
    out.write(0x3B) // trailer
    out.toByteArray
  }

  // ------------------------------------------------------------- decode

  /** LSB-first variable-width bit reader over concatenated sub-block
    * payloads.
    */
  private final class BitReader(data: Array[Byte]) {
    private var pos = 0
    private var cur = 0L
    private var nbits = 0
    def read(width: Int): Int = {
      while (nbits < width) {
        if (pos >= data.length) return -1
        cur |= (data(pos) & 0xFFL) << nbits
        pos += 1; nbits += 8
      }
      val v = (cur & ((1L << width) - 1)).toInt
      cur >>>= width; nbits -= width
      v
    }
  }

  /** Parse + LZW-decompress a GIF87a/89a single-image stream; returns
    * (width, height, row-major RGB bytes). Malformed input → None.
    */
  def decodeGif(bytes: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    if (bytes == null || bytes.length < 14) return None
    val sig = new String(bytes, 0, 6, "ASCII")
    if (sig != "GIF87a" && sig != "GIF89a") return None
    def le16(o: Int): Int = (bytes(o) & 0xFF) | ((bytes(o + 1) & 0xFF) << 8)
    var p = 6
    p += 4 // logical screen w/h (the image descriptor's dims are used)
    val packed = bytes(p) & 0xFF; p += 3 // packed, bg, aspect
    if ((packed & 0x80) == 0) return None // global color table required
    val gctSize = 2 << (packed & 0x07)
    if (bytes.length < p + 3 * gctSize) return None
    val palette = java.util.Arrays.copyOfRange(bytes, p, p + 3 * gctSize)
    p += 3 * gctSize
    // walk blocks: skip extensions, find the image descriptor
    while (p < bytes.length && (bytes(p) & 0xFF) == 0x21) {
      p += 2 // extension introducer + label
      var bl = if (p < bytes.length) bytes(p) & 0xFF else -1
      while (bl > 0) {
        p += 1 + bl
        bl = if (p < bytes.length) bytes(p) & 0xFF else -1
      }
      if (bl < 0) return None
      p += 1 // the 0 terminator
    }
    if (p >= bytes.length || (bytes(p) & 0xFF) != 0x2C) return None
    if (bytes.length < p + 10) return None
    val w = le16(p + 5); val h = le16(p + 7)
    val ipacked = bytes(p + 9) & 0xFF
    // pinned scope: no local color table, not interlaced
    if ((ipacked & 0x80) != 0 || (ipacked & 0x40) != 0) return None
    if (w <= 0 || h <= 0 || w.toLong * h > Int.MaxValue / 4) return None
    p += 10
    if (p >= bytes.length) return None
    val minCodeSize = bytes(p) & 0xFF; p += 1
    if (minCodeSize < 2 || minCodeSize > 8) return None
    collectSubBlocks(bytes, p) match {
      case None => None
      case Some((raw, _)) =>
        lzwDecompress(raw, minCodeSize, w * h) match {
          case None => None
          case Some(out) =>
            // palette-map to RGB
            val nPix = w * h
            val rgb = new Array[Byte](nPix * 3)
            var k = 0
            while (k < nPix) {
              val ci = out(k)
              if (ci * 3 + 2 >= palette.length) return None
              rgb(k * 3) = palette(ci * 3)
              rgb(k * 3 + 1) = palette(ci * 3 + 1)
              rgb(k * 3 + 2) = palette(ci * 3 + 2)
              k += 1
            }
            Some((w, h, rgb))
        }
    }
  }

  /** Concatenate a data-sub-block chain starting at `p`; returns the
    * payload and the position just past the 0 terminator.
    */
  private def collectSubBlocks(bytes: Array[Byte],
      start: Int): Option[(Array[Byte], Int)] = {
    val data = new java.io.ByteArrayOutputStream()
    var p = start
    var bl = if (p < bytes.length) bytes(p) & 0xFF else -1
    while (bl > 0) {
      if (bytes.length < p + 1 + bl) return None
      data.write(bytes, p + 1, bl)
      p += 1 + bl
      bl = if (p < bytes.length) bytes(p) & 0xFF else -1
    }
    if (bl != 0) return None // missing block terminator
    Some((data.toByteArray, p + 1))
  }

  /** Standard GIF LZW decompression of exactly `nPix` indices;
    * malformed/truncated stream → None.
    */
  private def lzwDecompress(raw: Array[Byte], minCodeSize: Int,
      nPix: Int): Option[Array[Int]] = {
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val br = new BitReader(raw)
    val out = new Array[Int](nPix)
    var o = 0
    // dictionary as (prefix code, appended byte); roots are implicit
    val prefixOf = new Array[Int](4096)
    val appendOf = new Array[Int](4096)
    var nextCode = eoi + 1
    var width = minCodeSize + 1
    var prev = -1
    def emit(code: Int): Boolean = {
      // expand code to indices (walk the chain, write reversed)
      var len = 0
      var c = code
      while (c >= clear + 2) { len += 1; c = prefixOf(c) }
      len += 1
      if (o + len > nPix) return false
      var q = o + len - 1
      c = code
      while (c >= clear + 2) { out(q) = appendOf(c); q -= 1; c = prefixOf(c) }
      out(q) = c
      o += len
      true
    }
    def firstOf(code: Int): Int = {
      var c = code
      while (c >= clear + 2) c = prefixOf(c)
      c
    }
    var done = false
    while (!done) {
      val code = br.read(width)
      if (code < 0) return None // truncated stream
      if (code == clear) {
        nextCode = eoi + 1; width = minCodeSize + 1; prev = -1
      } else if (code == eoi) {
        done = true
      } else if (prev < 0) {
        if (code >= clear) return None // first code must be a root
        if (!emit(code)) return None
        prev = code
      } else {
        if (code > nextCode || (code >= nextCode && nextCode >= 4096))
          return None
        val kwkwk = code == nextCode // the code not yet in the table
        if (kwkwk) {
          if (nextCode >= 4096) return None
          prefixOf(nextCode) = prev; appendOf(nextCode) = firstOf(prev)
          nextCode += 1
          if (nextCode == (1 << width) && width < 12) width += 1
          if (!emit(code)) return None
        } else {
          if (!emit(code)) return None
          if (nextCode < 4096) {
            prefixOf(nextCode) = prev; appendOf(nextCode) = firstOf(code)
            nextCode += 1
            if (nextCode == (1 << width) && width < 12) width += 1
          }
        }
        prev = code
      }
      if (o == nPix && !done) {
        // accept the EOI (possibly after a final width bump) and stop
        val c2 = br.read(width)
        if (c2 != eoi && c2 != clear) return None
        done = true
      }
    }
    if (o != nPix) None else Some(out)
  }

  // ----------------------------------------------------- GIF89a frames

  /** One animation frame to encode: a sub-rectangle patch at
    * (left, top), its own index function over LOCAL (x, y), a Graphic
    * Control Extension (delay in centiseconds, disposal method 0-3,
    * optional transparent index).
    */
  final case class FrameSpec(left: Int, top: Int, w: Int, h: Int,
      delayCs: Int, disposal: Int, transparent: Int,
      idx: (Int, Int) => Int)

  /** One decoded frame: the GCE fields plus the frame's OWN index
    * rectangle (pre-composite).
    */
  final case class Frame89(left: Int, top: Int, w: Int, h: Int,
      delayCs: Int, disposal: Int, transparent: Int,
      indices: Array[Int])

  /** Encode a GIF89a ANIMATION: global 256-color table, one GCE +
    * image descriptor + LZW stream per frame — the 89a extension
    * surface (round-13 verdict #6): sub-rect frames, per-frame delay,
    * disposal methods, transparency. `transparent = -1` disables the
    * GCE transparency flag.
    */
  def encodeGif89a(w: Int, h: Int, palette: Int => (Int, Int, Int),
      frames: Seq[FrameSpec]): Array[Byte] = {
    require(w > 0 && h > 0 && w <= 0xFFFF && h <= 0xFFFF, s"bad dims ${w}x$h")
    require(frames.nonEmpty, "an animation needs at least one frame")
    frames.foreach { f =>
      require(f.left >= 0 && f.top >= 0 && f.w > 0 && f.h > 0 &&
        f.left + f.w <= w && f.top + f.h <= h,
        s"frame rect (${f.left},${f.top} ${f.w}x${f.h}) outside ${w}x$h")
      require(f.disposal >= 0 && f.disposal <= 3,
        s"disposal must be 0..3, got ${f.disposal}")
      require(f.delayCs >= 0 && f.delayCs <= 0xFFFF,
        s"delay must fit 16 bits, got ${f.delayCs}")
      require(f.transparent >= -1 && f.transparent <= 255,
        s"transparent index must be -1..255, got ${f.transparent}")
    }
    val out = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    out.write("GIF89a".getBytes("ASCII"))
    le16(w); le16(h)
    out.write(0xF7) // GCT present, 8-bit color resolution, 256 entries
    out.write(0)    // background index (disposal-2 restore target)
    out.write(0)    // aspect ratio
    var i = 0
    while (i < 256) {
      val (r, g, b) = palette(i)
      out.write(r & 0xFF); out.write(g & 0xFF); out.write(b & 0xFF)
      i += 1
    }
    frames.foreach { f =>
      // Graphic Control Extension
      out.write(0x21); out.write(0xF9); out.write(4)
      val transFlag = if (f.transparent >= 0) 1 else 0
      out.write(((f.disposal & 0x7) << 2) | transFlag)
      le16(f.delayCs)
      out.write(if (f.transparent >= 0) f.transparent else 0)
      out.write(0) // GCE terminator
      // image descriptor + LZW data
      out.write(0x2C)
      le16(f.left); le16(f.top); le16(f.w); le16(f.h)
      out.write(0) // no local table, not interlaced
      out.write(8) // LZW minimum code size
      val indices = new Array[Int](f.w * f.h)
      var y = 0
      while (y < f.h) {
        var x = 0
        while (x < f.w) { indices(y * f.w + x) = f.idx(x, y) & 0xFF; x += 1 }
        y += 1
      }
      val lzw = lzwCompress(indices, 8)
      out.write(lzw, 0, lzw.length)
    }
    out.write(0x3B) // trailer
    out.toByteArray
  }

  /** Parse a GIF89a animation: (screen w, screen h, palette bytes,
    * frames). Each image descriptor consumes the PRECEDING GCE (delay
    * 0 / disposal 0 / no transparency when absent — the spec default);
    * non-GCE extensions are skipped. Malformed input → None. Pinned
    * scope as [[decodeGif]]: global table only, not interlaced.
    */
  def decodeGif89a(bytes: Array[Byte]): Option[(Int, Int, Array[Byte],
      Seq[Frame89])] = {
    if (bytes == null || bytes.length < 14) return None
    val sig = new String(bytes, 0, 6, "ASCII")
    if (sig != "GIF87a" && sig != "GIF89a") return None
    def le16(o: Int): Int = (bytes(o) & 0xFF) | ((bytes(o + 1) & 0xFF) << 8)
    val sw = le16(6); val sh = le16(8)
    if (sw <= 0 || sh <= 0) return None
    var p = 10
    val packed = bytes(p) & 0xFF; p += 3 // packed, bg, aspect
    if ((packed & 0x80) == 0) return None
    val gctSize = 2 << (packed & 0x07)
    if (bytes.length < p + 3 * gctSize) return None
    val palette = java.util.Arrays.copyOfRange(bytes, p, p + 3 * gctSize)
    p += 3 * gctSize
    val frames = Seq.newBuilder[Frame89]
    // pending GCE fields (reset after each image per the spec)
    var delay = 0; var disposal = 0; var transparent = -1
    var done = false
    while (!done) {
      if (p >= bytes.length) return None
      (bytes(p) & 0xFF) match {
        case 0x3B => done = true
        case 0x21 =>
          val label = if (p + 1 < bytes.length) bytes(p + 1) & 0xFF else -1
          if (label == 0xF9) {
            if (bytes.length < p + 8 || (bytes(p + 2) & 0xFF) != 4)
              return None
            val gp = bytes(p + 3) & 0xFF
            disposal = (gp >> 2) & 0x7
            delay = le16(p + 4)
            transparent = if ((gp & 1) != 0) bytes(p + 6) & 0xFF else -1
            if ((bytes(p + 7) & 0xFF) != 0) return None
            p += 8
          } else {
            // skip any other extension's sub-block chain
            p += 2
            collectSubBlocks(bytes, p) match {
              case None => return None
              case Some((_, np)) => p = np
            }
          }
        case 0x2C =>
          if (bytes.length < p + 10) return None
          val l = le16(p + 1); val t = le16(p + 3)
          val fw = le16(p + 5); val fh = le16(p + 7)
          val ip = bytes(p + 9) & 0xFF
          if ((ip & 0x80) != 0 || (ip & 0x40) != 0) return None
          if (fw <= 0 || fh <= 0 || l + fw > sw || t + fh > sh) return None
          p += 10
          if (p >= bytes.length) return None
          val mcs = bytes(p) & 0xFF; p += 1
          if (mcs < 2 || mcs > 8) return None
          collectSubBlocks(bytes, p) match {
            case None => return None
            case Some((raw, np)) =>
              p = np
              lzwDecompress(raw, mcs, fw * fh) match {
                case None => return None
                case Some(ind) =>
                  frames += Frame89(l, t, fw, fh, delay, disposal,
                    transparent, ind)
              }
          }
          delay = 0; disposal = 0; transparent = -1
        case _ => return None
      }
    }
    val fs = frames.result()
    if (fs.isEmpty) None else Some((sw, sh, palette, fs))
  }

  /** Composite decoded frames onto the logical screen: the canvas
    * starts at the background index (LSD byte — this codec writes 0),
    * each frame's non-transparent pixels paint its rectangle, and the
    * frame's DISPOSAL applies before the next frame: 0/1 leave the
    * canvas, 2 restores the frame's rectangle to the background index,
    * 3 (restore-to-previous) reverts it to the pre-frame canvas.
    * Returns one full-screen index canvas PER FRAME (what a viewer
    * shows while that frame's delay runs).
    */
  def compositeFrames(sw: Int, sh: Int, bg: Int,
      frames: Seq[Frame89]): Seq[Array[Int]] = {
    val canvas = Array.fill(sw * sh)(bg)
    frames.map { f =>
      val before = canvas.clone()
      var v = 0
      while (v < f.h) {
        var u = 0
        while (u < f.w) {
          val ci = f.indices(v * f.w + u)
          if (ci != f.transparent)
            canvas((f.top + v) * sw + (f.left + u)) = ci
          u += 1
        }
        v += 1
      }
      val shown = canvas.clone()
      f.disposal match {
        case 2 =>
          var v2 = 0
          while (v2 < f.h) {
            var u2 = 0
            while (u2 < f.w) {
              canvas((f.top + v2) * sw + (f.left + u2)) = bg
              u2 += 1
            }
            v2 += 1
          }
        case 3 => System.arraycopy(before, 0, canvas, 0, canvas.length)
        case _ => ()
      }
      shown
    }
  }

  // ------------------------------------------------------------- corpus

  final case class GifRow(media_id: Long, gif: Array[Byte])
  final case class GifFeatures(media_id: Long, w: Long, h: Long,
      sum_r: Long, sum_g: Long, sum_b: Long)

  /** The pinned corpus palette: entry i → (i, (2i) mod 256, 255−i) —
    * closed-form so the oracle maps indices to channels directly.
    */
  def corpusPalette(i: Int): (Int, Int, Int) =
    (i, (2 * i) % 256, 255 - i)

  /** Deterministic GIF corpus: real LZW-compressed images whose index
    * at (x, y) is (id + 5x + 11y) mod 256 — closed-form reproducible
    * by the oracle; sizes cycle with id like the PNG corpus.
    */
  def syntheticGifTable(docs: DataFrame): Dataset[GifRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].map { id =>
      val w = 8 + (id % 16).toInt
      val h = 8 + (id % 12).toInt
      GifRow(id, encodeGif(w, h, corpusPalette,
        (x, y) => ((id + 5 * x + 11 * y) % 256).toInt))
    }
  }

  final case class Gif89FrameFeatures(media_id: Long, frame_no: Long,
      delay_cs: Long, disposal: Long, w: Long, h: Long,
      sum_r: Long, sum_g: Long, sum_b: Long)

  /** Deterministic ANIMATED GIF89a corpus — three frames per media
    * exercising the 89a surface end to end, all closed-form so the
    * oracle replays the composited canvases:
    *  - frame 0: full-screen base, index (id + 5x + 11y) mod 256,
    *    disposal 1 (leave);
    *  - frame 1: the sub-rect (2, 3, w−4, h−5) patch
    *    (3id + 7u + 13v) mod 256 with TRANSPARENT index id mod 256
    *    (transparent pixels keep the base), disposal 2 (its rect
    *    restores to the background index before frame 2);
    *  - frame 2: the sub-rect (1, 1, w−2, 4) patch
    *    (7id + u + 2v) mod 256, disposal 1 — it does NOT cover frame
    *    1's rect, so the disposal-2 restoration is VISIBLE in frame
    *    2's composited canvas (rows below the patch show background
    *    where frame 1 painted).
    * Delays are 4 + (id + f) mod 7 centiseconds. Screen size cycles
    * 10+id%10 × 10+id%8 (≥ 10×10, so both sub-rects are non-empty).
    */
  def syntheticGif89aTable(docs: DataFrame): Dataset[GifRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    MediaIds.stream(docs).map { id =>
      val w = 10 + (id % 10).toInt
      val h = 10 + (id % 8).toInt
      def delay(f: Int): Int = 4 + ((id + f) % 7).toInt
      val frames = Seq(
        FrameSpec(0, 0, w, h, delay(0), 1, -1,
          (x, y) => ((id + 5 * x + 11 * y) % 256).toInt),
        FrameSpec(2, 3, w - 4, h - 5, delay(1), 2, (id % 256).toInt,
          (u, v) => ((3 * id + 7 * u + 13 * v) % 256).toInt),
        FrameSpec(1, 1, w - 2, 4, delay(2), 1, -1,
          (u, v) => ((7 * id + u + 2 * v) % 256).toInt))
      GifRow(id, encodeGif89a(w, h, corpusPalette, frames))
    }
  }

  /** Decode real GIF89a animations, composite every frame onto the
    * logical screen (transparency + disposal applied), and emit one
    * exact channel-sum row per SHOWN frame.
    */
  def extractGif89aFrames(
      media: Dataset[GifRow]): Dataset[Gif89FrameFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.flatMap { m =>
      val (sw, sh, palette, frames) = decodeGif89a(m.gif).getOrElse(
        throw new IllegalStateException(
          s"bad GIF89a for media ${m.media_id}"))
      val canvases = compositeFrames(sw, sh, 0, frames)
      frames.zip(canvases).zipWithIndex.map { case ((f, cv), i) =>
        var sr = 0L; var sg = 0L; var sb = 0L
        var k = 0
        while (k < cv.length) {
          val ci = cv(k)
          // LZW indices can reach 255 while the GCT may be smaller
          // (packed & 0x07): fail loudly like decodeGif's check
          // instead of an ArrayIndexOutOfBoundsException.
          if (ci * 3 + 2 >= palette.length) throw new IllegalStateException(
            s"GIF89a media ${m.media_id} frame $i: color index $ci " +
              s"outside the ${palette.length / 3}-entry global table")
          sr += palette(ci * 3) & 0xFF
          sg += palette(ci * 3 + 1) & 0xFF
          sb += palette(ci * 3 + 2) & 0xFF
          k += 1
        }
        Gif89FrameFeatures(m.media_id, i.toLong, f.delayCs.toLong,
          f.disposal.toLong, sw.toLong, sh.toLong, sr, sg, sb)
      }
    }
  }

  /** Decode the real GIF bytes and extract exact channel sums. */
  def extractGifFeatures(media: Dataset[GifRow]): Dataset[GifFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { m =>
        val (w, h, rgb) = decodeGif(m.gif).getOrElse(
          throw new IllegalStateException(
            s"bad GIF for media ${m.media_id}"))
        var sr = 0L; var sg = 0L; var sb = 0L
        var k = 0
        while (k < w * h * 3) {
          sr += rgb(k) & 0xff; sg += rgb(k + 1) & 0xff; sb += rgb(k + 2) & 0xff
          k += 3
        }
        GifFeatures(m.media_id, w.toLong, h.toLong, sr, sg, sb)
      }
    }
  }
}
