package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** REAL lossy-format codec: a pure-JVM baseline-sequential JPEG
  * encoder/decoder (ITU-T T.81 — public spec, zero external
  * libraries). This closes the multimodal tier's last documented
  * stand-in honestly for the dominant lossy image format: the full
  * baseline pipeline is real — marker segments (SOI/APP0/DQT/SOF0/
  * DHT/SOS/EOI), canonical huffman tables built from DHT BITS/HUFFVAL
  * exactly as T.81 Annex C prescribes, byte stuffing, differential DC
  * + run/size AC entropy coding with EOB/ZRL, per-component
  * quantization tables, zigzag ordering, a separable IDCT, level
  * shift + clamp, and JFIF YCbCr→RGB conversion.
  *
  * Scope is baseline sequential, 8-bit, 1 or 3 components, in the
  * three sampling profiles that dominate real corpora: 4:4:4 (all
  * factors 1×1), 4:2:0 (luma 2×2, chroma 1×1 — four interleaved luma
  * blocks per 16×16 MCU, chroma upsampled by replication) and 4:2:2
  * (luma 2×1 — two luma blocks per 16×8 MCU, chroma replicated
  * horizontally), dimensions
  * in whole MCUs, with or without restart intervals (DRI/RSTn —
  * byte-aligned cyclic markers, DC-prediction resets; wrong or missing
  * markers are malformed). Everything else — progressive (SOF2),
  * other sampling combinations, 12-bit, arithmetic coding — fails
  * loudly (`None`), the
  * [[RealMedia]]/[[Png]] discipline: a silently-misdecoded image would
  * poison every downstream feature.
  *
  * Determinism contract (what makes a LOSSY format oracle-checkable):
  * decoding is deterministic even though encoding loses information,
  * so the synthetic corpus is defined in COEFFICIENT space — real
  * huffman-coded JPEG bytes whose quantized coefficients follow
  * closed-form integer formulas ([[syntheticCoef]]) — and the decoder
  * pins every float: the IDCT basis is a shared 17-digit literal table
  * ([[JpegTables.Basis]], no runtime cos), both IDCT passes fold
  * left-to-right, and rounding is floor(x+0.5) everywhere. The DuckDB
  * oracle (graft.JpegOracle) replays the identical arithmetic, so a
  * huffman bug, a zigzag slip, a table mixup, or an IDCT rounding
  * drift cannot hash-match.
  *
  * Reference context: strat_backtest treats media as opaque payloads
  * (no media inputs at all); this operator serves the multimodal
  * pipeline brief, replacing the former `FakeCodec` stand-in for JPEG.
  */
object Jpeg {

  // ------------------------------------------------- huffman table spec

  /** A huffman table as DHT carries it: `bits(i)` = #codes of length
    * i+1 (i in 0..15), `values` in code order. These are ENGINE-LOCAL
    * tables (any canonical prefix code is valid JPEG; the tables travel
    * in DHT): DC = 12 categories at length 4, AC = EOB + ZRL + the 96
    * (run 0..15, size 1..6) symbols at length 7. The chroma variants
    * reverse the value order so a DC/AC or luma/chroma table mixup in
    * the decoder changes every decoded symbol and fails the oracle.
    */
  final case class HuffSpec(bits: Array[Int], values: Array[Int])

  private val dcVals = (0 to 11).toArray
  private val acVals = Array(0x00, 0xF0) ++
    (for (run <- 0 to 15; size <- 1 to 6) yield (run << 4) | size)

  private def bitsOf(len: Int, n: Int): Array[Int] = {
    val b = new Array[Int](16); b(len - 1) = n; b
  }

  private[multimodal] val DcLuma = HuffSpec(bitsOf(4, 12), dcVals)
  private[multimodal] val DcChroma = HuffSpec(bitsOf(4, 12), dcVals.reverse)
  private[multimodal] val AcLuma = HuffSpec(bitsOf(7, 98), acVals)
  private[multimodal] val AcChroma = HuffSpec(bitsOf(7, 98), acVals.reverse)

  /** symbol → (code, length), canonical assignment (T.81 C.2). */
  private def encodeTable(spec: HuffSpec): Map[Int, (Int, Int)] = {
    var code = 0
    var vi = 0
    val out = scala.collection.mutable.Map[Int, (Int, Int)]()
    for (li <- 0 until 16) {
      var n = 0
      while (n < spec.bits(li)) {
        out(spec.values(vi)) = (code, li + 1)
        code += 1; vi += 1; n += 1
      }
      code <<= 1
    }
    out.toMap
  }

  // --------------------------------------------------------- bit writer

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var nbits = 0
    def write(value: Int, size: Int): Unit = {
      var i = size - 1
      while (i >= 0) {
        acc = (acc << 1) | ((value >>> i) & 1)
        nbits += 1
        if (nbits == 8) {
          out.write(acc)
          if (acc == 0xFF) out.write(0x00) // byte stuffing
          acc = 0; nbits = 0
        }
        i -= 1
      }
    }
    /** Pad the final partial byte with 1s (T.81 F.1.2.3). */
    def flush(): Unit = if (nbits > 0) {
      acc = (acc << (8 - nbits)) | ((1 << (8 - nbits)) - 1)
      out.write(acc)
      if (acc == 0xFF) out.write(0x00)
      acc = 0; nbits = 0
    }
  }

  /** Bit category of a coefficient/diff value (T.81 F.1.2.1.2). */
  private def category(v: Int): Int = {
    var a = math.abs(v); var s = 0
    while (a != 0) { a >>= 1; s += 1 }
    s
  }

  // ------------------------------------------------------------- encode

  /** Closed-form quantized coefficient for the synthetic corpus —
    * ZIGZAG index `k`, MCU-row-major block index `bi`, component
    * `comp` (0=Y 1=Cb 2=Cr). Mirrored EXACTLY by the SQL oracle: DC in
    * [−63, 63] (diffs exercise categories up to 7 plus sign handling);
    * ACs are ~1/13-dense in [−63, 62] (sizes 1..6, zero runs of every
    * length, ZRL and EOB both occur across the corpus).
    */
  def syntheticCoef(id: Long, comp: Int, bi: Int, k: Int): Int =
    if (k == 0) ((id * 7 + comp * 11 + bi * 5) % 127 - 63).toInt
    else {
      val base = ((id * 31 + comp * 47 + bi * 17 + k * 13) % 126 - 63).toInt
      if ((id + 5 * comp + 3 * bi + 7 * k) % 13 == 0 && base != 0) base
      else 0
    }

  private def writeSegment(out: java.io.ByteArrayOutputStream,
      marker: Int, payload: Array[Byte]): Unit = {
    out.write(0xFF); out.write(marker)
    val len = payload.length + 2
    out.write((len >> 8) & 0xFF); out.write(len & 0xFF)
    out.write(payload, 0, payload.length)
  }

  /** Encode a baseline JPEG — 4:4:4 (3-component YCbCr or grayscale
    * with `ncomp = 1`), 4:2:0 (`chroma420`) or 4:2:2 (`chroma422`,
    * luma 2×1: two horizontal luma blocks + one Cb/Cr per 16×8 MCU)
    * — whose quantized coefficients at zigzag k of per-component
    * block bi are `coef(c, bi, k)`. `w`/`h` must be whole MCUs (8 px;
    * 16 px on the subsampled axes). `restartInterval` > 0 emits a DRI
    * segment and cyclic RSTn markers with DC resets between
    * intervals. Emits real JFIF bytes: APP0, both DQT tables, SOF0,
    * all four DHT tables, [DRI,] SOS, stuffed entropy-coded data, EOI.
    */
  def encodeJpeg(w: Int, h: Int, coef: (Int, Int, Int) => Int,
      ncomp: Int = 3, chroma420: Boolean = false,
      restartInterval: Int = 0, chroma422: Boolean = false): Array[Byte] = {
    require(ncomp == 1 || ncomp == 3, s"ncomp must be 1 or 3, got $ncomp")
    require(!chroma420 || ncomp == 3, "4:2:0 needs 3 components")
    require(!chroma422 || ncomp == 3, "4:2:2 needs 3 components")
    require(!(chroma420 && chroma422), "pick ONE subsampling profile")
    require(restartInterval >= 0 && restartInterval <= 65535,
      s"restartInterval must be a u16, got $restartInterval")
    val lumaH = if (chroma420 || chroma422) 2 else 1
    val lumaV = if (chroma420) 2 else 1
    val mcuPxX = 8 * lumaH
    val mcuPxY = 8 * lumaV
    require(w > 0 && h > 0 && w % mcuPxX == 0 && h % mcuPxY == 0,
      s"dimensions must be positive whole MCUs (${mcuPxX}x$mcuPxY px), " +
        s"got ${w}x$h")
    val out = new java.io.ByteArrayOutputStream()
    out.write(0xFF); out.write(0xD8) // SOI
    writeSegment(out, 0xE0, Array[Byte]('J', 'F', 'I', 'F', 0, 1, 1, 0,
      0, 1, 0, 1, 0, 0)) // APP0: JFIF 1.1, no density/thumbnail
    // DQT: both tables in one segment, zigzag order, 8-bit precision
    val dqt = new java.io.ByteArrayOutputStream()
    for ((tid, q) <- Seq((0, JpegTables.QuantLuma),
        (1, JpegTables.QuantChroma))) {
      dqt.write(tid) // Pq=0 (8-bit) | Tq
      q.foreach(v => dqt.write(v))
    }
    writeSegment(out, 0xDB, dqt.toByteArray)
    // SOF0: baseline, 8-bit, 3 components, 1x1 sampling, quant 0/1/1
    val sof = new java.io.ByteArrayOutputStream()
    sof.write(8)
    sof.write((h >> 8) & 0xFF); sof.write(h & 0xFF)
    sof.write((w >> 8) & 0xFF); sof.write(w & 0xFF)
    sof.write(ncomp)
    for (((cid, qid), c0) <- Seq((1, 0), (2, 1), (3, 1)).take(ncomp)
        .zipWithIndex) {
      sof.write(cid)
      sof.write(if (c0 == 0) (lumaH << 4) | lumaV else 0x11)
      sof.write(qid)
    }
    writeSegment(out, 0xC0, sof.toByteArray)
    // DHT: all four tables in one segment
    val dht = new java.io.ByteArrayOutputStream()
    for ((cls, tid, spec) <- Seq((0, 0, DcLuma), (0, 1, DcChroma),
        (1, 0, AcLuma), (1, 1, AcChroma))) {
      dht.write((cls << 4) | tid)
      spec.bits.foreach(dht.write)
      spec.values.foreach(dht.write)
    }
    writeSegment(out, 0xC4, dht.toByteArray)
    if (restartInterval > 0)
      writeSegment(out, 0xDD, Array( // DRI
        ((restartInterval >> 8) & 0xFF).toByte,
        (restartInterval & 0xFF).toByte))
    // SOS: huffman table ids 0/0 for Y, 1/1 for Cb/Cr
    val sos = new java.io.ByteArrayOutputStream()
    sos.write(ncomp)
    for ((cid, t) <- Seq((1, 0x00), (2, 0x11), (3, 0x11)).take(ncomp)) {
      sos.write(cid); sos.write(t)
    }
    sos.write(0); sos.write(63); sos.write(0) // Ss/Se/AhAl (baseline)
    writeSegment(out, 0xDA, sos.toByteArray)

    val dcTab = Array(encodeTable(DcLuma), encodeTable(DcChroma),
      encodeTable(DcChroma))
    val acTab = Array(encodeTable(AcLuma), encodeTable(AcChroma),
      encodeTable(AcChroma))
    val bw = new BitWriter(out)
    def writeHuff(tab: Map[Int, (Int, Int)], sym: Int): Unit = {
      val (code, len) = tab(sym)
      bw.write(code, len)
    }
    def writeMagnitude(v: Int, s: Int): Unit =
      // negatives in "one's complement of |v|" form (T.81 F.1.2.1)
      bw.write(if (v < 0) v + (1 << s) - 1 else v, s)
    val prevDc = new Array[Int](ncomp)
    def encodeBlock(c: Int, bi: Int): Unit = {
      // DC: differential category + magnitude bits
      val dc = coef(c, bi, 0)
      require(math.abs(dc) <= 1023,
        s"encodeJpeg: |DC| must be <= 1023 (comp $c block $bi got $dc) " +
          "— diffs beyond category 11 have no code")
      val diff = dc - prevDc(c)
      prevDc(c) = dc
      val s = category(diff)
      writeHuff(dcTab(c), s)
      if (s > 0) writeMagnitude(diff, s)
      // AC: run/size symbols with ZRL and EOB
      var k = 1
      var lastNz = 0
      var kk = 1
      while (kk < 64) { if (coef(c, bi, kk) != 0) lastNz = kk; kk += 1 }
      while (k <= lastNz) {
        var run = 0
        while (coef(c, bi, k) == 0) { run += 1; k += 1 }
        while (run >= 16) { writeHuff(acTab(c), 0xF0); run -= 16 }
        val v = coef(c, bi, k)
        val sz = category(v)
        require(sz <= 6,
          s"encodeJpeg: |AC| must be <= 63 (comp $c block $bi zigzag " +
            s"$k got $v) — the AC alphabet carries sizes 1..6")
        writeHuff(acTab(c), (run << 4) | sz)
        writeMagnitude(v, sz)
        k += 1
      }
      if (lastNz < 63) writeHuff(acTab(c), 0x00) // EOB
    }
    val mcus = (w / mcuPxX) * (h / mcuPxY)
    val lumaBlocks = lumaH * lumaV
    var m = 0
    while (m < mcus) {
      if (lumaBlocks > 1) {
        // T.81 interleave: the luma blocks (raster order within the
        // MCU; bi = m*n + raster index), then one Cb, one Cr (bi = m)
        var b = 0
        while (b < lumaBlocks) { encodeBlock(0, m * lumaBlocks + b); b += 1 }
        encodeBlock(1, m); encodeBlock(2, m)
      } else {
        var c = 0
        while (c < ncomp) { encodeBlock(c, m); c += 1 }
      }
      m += 1
      // restart marker BETWEEN intervals (never after the last MCU):
      // pad to a byte, emit the cyclic RSTn raw, reset DC prediction
      if (restartInterval > 0 && m < mcus && m % restartInterval == 0) {
        bw.flush()
        out.write(0xFF)
        out.write(0xD0 + ((m / restartInterval - 1) % 8))
        java.util.Arrays.fill(prevDc, 0)
      }
    }
    bw.flush()
    out.write(0xFF); out.write(0xD9) // EOI
    out.toByteArray
  }

  // ------------------------------------------------------------- decode

  /** Canonical huffman decode tables (T.81 F.2.2.3): per code length,
    * the smallest/largest code and the index of its first value.
    */
  private final class DecodeTable(bits: Array[Int], vals: Array[Int]) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0; var vi = 0
      var l = 1
      while (l <= 16) {
        if (bits(l - 1) == 0) { maxCode(l) = -1 }
        else {
          valPtr(l) = vi
          minCode(l) = code
          code += bits(l - 1); vi += bits(l - 1)
          maxCode(l) = code - 1
        }
        code <<= 1
        l += 1
      }
    }
    def value(len: Int, code: Int): Int =
      vals(valPtr(len) + code - minCode(len))
  }

  /** Strict bit reader over the entropy-coded segment: enforces byte
    * stuffing (FF must be followed by 00) and stops AT any real marker
    * — the caller then checks it is EOI exactly where expected.
    */
  private final class BitReader(bytes: Array[Byte], start: Int) {
    var pos: Int = start
    private var acc = 0
    private var nbits = 0
    var bad = false
    def nextBit(): Int = {
      if (nbits == 0) {
        if (pos >= bytes.length) { bad = true; return 0 }
        var b = bytes(pos) & 0xFF
        pos += 1
        if (b == 0xFF) {
          if (pos >= bytes.length) { bad = true; return 0 }
          val m = bytes(pos) & 0xFF
          if (m == 0x00) pos += 1 // stuffed FF
          else { bad = true; return 0 } // a marker inside coded data
          b = 0xFF
        }
        acc = b; nbits = 8
      }
      nbits -= 1
      (acc >>> nbits) & 1
    }
    def receive(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n && !bad) { v = (v << 1) | nextBit(); i += 1 }
      v
    }
    /** Byte-align (discard the interval's padding bits) and consume
      * the expected cyclic restart marker; anything else is malformed.
      */
    def expectRst(idx: Int): Unit = {
      acc = 0; nbits = 0
      if (pos + 2 > bytes.length) { bad = true; return }
      if ((bytes(pos) & 0xFF) != 0xFF ||
        (bytes(pos + 1) & 0xFF) != 0xD0 + idx) { bad = true; return }
      pos += 2
    }
    def decodeHuff(t: DecodeTable): Int = {
      var code = nextBit()
      var l = 1
      while (!bad && (t.maxCode(l) == -1 || code > t.maxCode(l))) {
        l += 1
        if (l > 16) { bad = true; return -1 }
        code = (code << 1) | nextBit()
      }
      if (bad) -1 else t.value(l, code)
    }
  }

  /** Sign-extend `v` read as an `s`-bit magnitude (T.81 F.2.2.1). */
  private def extend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  /** Pinned separable IDCT + level shift + clamp: pass 1 rows of
    * coefficients (u ascending), pass 2 columns (v ascending), both
    * folded left-to-right in double; one rounding, floor(x+0.5), at
    * the end — the exact arithmetic the SQL oracle replays.
    */
  private[graft] def idctBlock(dq: Array[Int]): Array[Int] = {
    val t = JpegTables.Basis
    val tmp = new Array[Double](64)
    var j = 0
    while (j < 64) { // j = v*8 + x
      val v = j / 8; val x = j % 8
      var acc = 0.0
      var u = 0
      while (u < 8) { acc += dq(v * 8 + u).toDouble * t(x * 8 + u); u += 1 }
      tmp(j) = acc
      j += 1
    }
    val out = new Array[Int](64)
    var i = 0
    while (i < 64) { // i = y*8 + x
      val y = i / 8; val x = i % 8
      var acc = 0.0
      var v = 0
      while (v < 8) { acc += tmp(v * 8 + x) * t(y * 8 + v); v += 1 }
      val px = math.floor(acc + 0.5).toLong + 128L
      out(i) = math.min(math.max(px, 0L), 255L).toInt
      i += 1
    }
    out
  }

  /** Decode a baseline-sequential JPEG; returns (width, height,
    * row-major RGB bytes), or `None` for anything malformed or out of
    * profile: bad markers/lengths, progressive or extended SOFs,
    * 12-bit precision, subsampling, restart intervals, arithmetic
    * coding, missing/duplicate tables, invalid huffman codes,
    * coefficient overruns, stuffing violations, truncated streams, or
    * trailing garbage. Grayscale (1 component) decodes with Y
    * replicated to RGB; 3 components convert via the pinned JFIF
    * formulas.
    */
  def decodeJpeg(bytes: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    if (bytes == null || bytes.length < 4) return None
    if ((bytes(0) & 0xFF) != 0xFF || (bytes(1) & 0xFF) != 0xD8) return None
    var pos = 2
    var w = -1; var h = -1; var ncomp = 0
    val quant = new Array[Array[Int]](4)
    val dcTabs = new Array[DecodeTable](4)
    val acTabs = new Array[DecodeTable](4)
    var compQuant: Array[Int] = null
    var compId: Array[Int] = null
    var compH: Array[Int] = null
    var compV: Array[Int] = null
    var hMax = 1; var vMax = 1
    var compDc: Array[Int] = null
    var compAc: Array[Int] = null
    var sawSof = false
    var sosAt = -1
    var restartInterval = 0

    def u16(p: Int): Int = ((bytes(p) & 0xFF) << 8) | (bytes(p + 1) & 0xFF)

    while (sosAt < 0) {
      if (pos + 4 > bytes.length) return None
      if ((bytes(pos) & 0xFF) != 0xFF) return None
      val marker = bytes(pos + 1) & 0xFF
      if (marker == 0xD8 || marker == 0xD9 ||
        (marker >= 0xD0 && marker <= 0xD7)) return None
      val len = u16(pos + 2)
      if (len < 2 || pos + 2 + len > bytes.length) return None
      val body = pos + 4
      val bodyLen = len - 2
      marker match {
        case 0xC0 => // SOF0: the ONLY supported frame type
          if (sawSof || bodyLen < 6) return None
          sawSof = true
          if ((bytes(body) & 0xFF) != 8) return None // precision
          h = u16(body + 1); w = u16(body + 3)
          ncomp = bytes(body + 5) & 0xFF
          if (w <= 0 || h <= 0 || (ncomp != 1 && ncomp != 3)) return None
          if (w.toLong * h * 3 > Int.MaxValue - 64) return None
          if (bodyLen != 6 + 3 * ncomp) return None
          compQuant = new Array[Int](ncomp)
          compH = new Array[Int](ncomp)
          compV = new Array[Int](ncomp)
          compId = new Array[Int](ncomp)
          var c = 0
          while (c < ncomp) {
            compId(c) = bytes(body + 6 + 3 * c) & 0xFF
            val samp = bytes(body + 7 + 3 * c) & 0xFF
            compH(c) = samp >> 4; compV(c) = samp & 0x0F
            compQuant(c) = bytes(body + 8 + 3 * c) & 0xFF
            if (compQuant(c) > 3) return None
            c += 1
          }
          if (compId.distinct.length != ncomp) return None
          // supported sampling profiles: 4:4:4 (all 1x1), 4:2:0
          // (luma 2x2) and 4:2:2 (luma 2x1), chroma 1x1 in all;
          // anything else is out of profile
          val is444 = (0 until ncomp).forall(c2 =>
            compH(c2) == 1 && compV(c2) == 1)
          val chroma11 = ncomp == 3 &&
            compH(1) == 1 && compV(1) == 1 &&
            compH(2) == 1 && compV(2) == 1
          val is420 = chroma11 && compH(0) == 2 && compV(0) == 2
          val is422 = chroma11 && compH(0) == 2 && compV(0) == 1
          if (!is444 && !is420 && !is422) return None
          // whole-MCU dimensions (16x16 / 16x8 / 8x8)
          hMax = compH.max; vMax = compV.max
          if (w % (8 * hMax) != 0 || h % (8 * vMax) != 0) return None
        case 0xC4 => // DHT: one or more tables
          var p = body
          while (p < body + bodyLen) {
            if (p + 17 > body + bodyLen) return None
            val cls = (bytes(p) & 0xFF) >> 4
            val tid = bytes(p) & 0x0F
            if (cls > 1 || tid > 3) return None
            val bits = Array.tabulate(16)(i => bytes(p + 1 + i) & 0xFF)
            val n = bits.sum
            if (n == 0 || n > 256 || p + 17 + n > body + bodyLen) return None
            // Kraft validity: canonical assignment must not overflow
            var code = 0; var ok = true
            for (l <- 0 until 16) {
              code += bits(l)
              if (code > (1 << (l + 1))) ok = false
              code <<= 1
            }
            if (!ok) return None
            val vals = Array.tabulate(n)(i => bytes(p + 17 + i) & 0xFF)
            val t = new DecodeTable(bits, vals)
            if (cls == 0) dcTabs(tid) = t else acTabs(tid) = t
            p += 17 + n
          }
        case 0xDB => // DQT: one or more 8-bit tables, zigzag order
          var p = body
          while (p < body + bodyLen) {
            val pq = (bytes(p) & 0xFF) >> 4
            val tq = bytes(p) & 0x0F
            if (pq != 0 || tq > 3) return None // 8-bit precision only
            if (p + 65 > body + bodyLen) return None
            quant(tq) = Array.tabulate(64)(i => bytes(p + 1 + i) & 0xFF)
            if (quant(tq).exists(_ == 0)) return None
            p += 65
          }
        case 0xDA => // SOS
          if (!sawSof || bodyLen != 1 + 2 * ncomp + 3) return None
          if ((bytes(body) & 0xFF) != ncomp) return None
          compDc = new Array[Int](ncomp)
          compAc = new Array[Int](ncomp)
          var c = 0
          while (c < ncomp) {
            // the scan's component selectors must match the SOF order:
            // this decoder interleaves in SOF order, so a reordering
            // scan (legal JPEG, out of profile here) must fail loudly
            // rather than decode with swapped planes
            if ((bytes(body + 1 + 2 * c) & 0xFF) != compId(c)) return None
            compDc(c) = (bytes(body + 2 + 2 * c) & 0xFF) >> 4
            compAc(c) = bytes(body + 2 + 2 * c) & 0x0F
            c += 1
          }
          // baseline spectral selection: 0..63, no successive approx
          if ((bytes(body + 1 + 2 * ncomp) & 0xFF) != 0 ||
            (bytes(body + 2 + 2 * ncomp) & 0xFF) != 63 ||
            (bytes(body + 3 + 2 * ncomp) & 0xFF) != 0) return None
          sosAt = pos + 2 + len
        case 0xDD => // DRI: restart interval (0 disables)
          if (bodyLen != 2) return None
          restartInterval = u16(body)
        case 0xE0 | 0xE1 | 0xE2 | 0xE3 | 0xE4 | 0xE5 | 0xE6 | 0xE7 |
            0xE8 | 0xE9 | 0xEA | 0xEB | 0xEC | 0xED | 0xEE | 0xEF |
            0xFE => // APPn / COM: skip
        case _ => return None // SOF2, arithmetic, anything else
      }
      if (sosAt < 0) pos += 2 + len
    }

    // tables referenced by the scan must exist
    var c = 0
    while (c < ncomp) {
      if (quant(compQuant(c)) == null) return None
      if (dcTabs(compDc(c)) == null || acTabs(compAc(c)) == null)
        return None
      c += 1
    }

    val zz = JpegTables.Zigzag
    val mcusX = w / (8 * hMax); val mcusY = h / (8 * vMax)
    // per-component plane dimensions: subsampled chroma stores at its
    // native resolution and upsamples by replication at conversion
    val planeW = Array.tabulate(ncomp)(c2 => w * compH(c2) / hMax)
    val planeH = Array.tabulate(ncomp)(c2 => h * compV(c2) / vMax)
    val planes = Array.tabulate(ncomp)(c2 =>
      new Array[Int](planeW(c2) * planeH(c2)))
    val prevDc = new Array[Int](ncomp)
    val br = new BitReader(bytes, sosAt)
    val dq = new Array[Int](64)
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        var ci = 0
        while (ci < ncomp) {
          // T.81 interleave order: the component's V×H blocks in
          // raster order within the MCU
          var bv = 0
          while (bv < compV(ci)) {
            var bh = 0
            while (bh < compH(ci)) {
              java.util.Arrays.fill(dq, 0)
              val q = quant(compQuant(ci))
              // DC
              val s = br.decodeHuff(dcTabs(compDc(ci)))
              if (br.bad || s < 0 || s > 11) return None
              val diff = extend(br.receive(s), s)
              if (br.bad) return None
              prevDc(ci) += diff
              dq(0) = prevDc(ci) * q(0)
              // AC
              var k = 1
              var eob = false
              while (k < 64 && !eob) {
                val rs = br.decodeHuff(acTabs(compAc(ci)))
                if (br.bad || rs < 0) return None
                val run = rs >> 4; val size = rs & 0x0F
                if (size == 0) {
                  if (run == 15) k += 16 // ZRL
                  else if (run == 0) eob = true
                  else return None
                } else {
                  k += run
                  if (k > 63 || size > 10) return None
                  val v = extend(br.receive(size), size)
                  if (br.bad) return None
                  dq(zz(k)) = v * q(k)
                  k += 1
                }
              }
              if (k > 64) return None
              // IDCT into the component plane at this block's position
              val px = idctBlock(dq)
              val baseRow = my * compV(ci) * 8 + bv * 8
              val baseCol = mx * compH(ci) * 8 + bh * 8
              var i = 0
              while (i < 64) {
                planes(ci)((baseRow + i / 8) * planeW(ci) +
                  baseCol + i % 8) = px(i)
                i += 1
              }
              bh += 1
            }
            bv += 1
          }
          ci += 1
        }
        // restart intervals: between every `restartInterval` MCUs the
        // stream byte-aligns, carries the cyclic RSTn marker, and DC
        // prediction resets — required, in order, or the stream is
        // malformed (a skipped reset would silently shear every
        // subsequent DC)
        val done = my * mcusX + mx + 1
        if (restartInterval > 0 && done < mcusX * mcusY &&
            done % restartInterval == 0) {
          br.expectRst((done / restartInterval - 1) % 8)
          if (br.bad) return None
          java.util.Arrays.fill(prevDc, 0)
        }
        mx += 1
      }
      my += 1
    }
    // after the last MCU: padding bits, then EOI exactly — anything
    // else (trailing entropy data, a missing EOI, garbage) is malformed
    if (br.bad) return None
    if (br.pos + 2 != bytes.length) return None
    if ((bytes(br.pos) & 0xFF) != 0xFF ||
      (bytes(br.pos + 1) & 0xFF) != 0xD9) return None

    val rgb = new Array[Byte](w * h * 3)
    var i = 0
    while (i < w * h) {
      if (ncomp == 1) {
        val y = planes(0)(i)
        rgb(3 * i) = y.toByte; rgb(3 * i + 1) = y.toByte
        rgb(3 * i + 2) = y.toByte
      } else {
        val row = i / w; val col = i % w
        val yv = planes(0)(i)
        // chroma upsampling by replication: subsampled planes index at
        // (row·V/vMax, col·H/hMax) — identity under 4:4:4
        def chroma(c2: Int): Int =
          planes(c2)((row * compV(c2) / vMax) * planeW(c2) +
            col * compH(c2) / hMax)
        val cb = chroma(1); val cr = chroma(2)
        def clamp(d: Double): Byte = {
          val v = math.floor(d + 0.5).toLong
          math.min(math.max(v, 0L), 255L).toByte
        }
        rgb(3 * i) = clamp(yv + 1.402 * (cr - 128))
        rgb(3 * i + 1) = clamp(yv - 0.344136 * (cb - 128) -
          0.714136 * (cr - 128))
        rgb(3 * i + 2) = clamp(yv + 1.772 * (cb - 128))
      }
      i += 1
    }
    Some((w, h, rgb))
  }

  // ----------------------------------------------- synthetic table + query

  final case class JpegRow(media_id: Long, jpeg: Array[Byte])
  final case class JpegFeatures(media_id: Long, w: Long, h: Long,
      sum_r: Long, sum_g: Long, sum_b: Long)

  /** Deterministic JPEG corpus: every doc id becomes a REAL baseline
    * JPEG (8×8..16×16, 1–4 MCUs) whose quantized coefficients follow
    * [[syntheticCoef]] — closed-form reproducible by the oracle.
    */
  def syntheticJpegTable(docs: DataFrame): Dataset[JpegRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    MediaIds.stream(docs).map { id =>
      val w = 8 * (1 + (id % 2).toInt)
      val h = 8 * (1 + ((id / 2) % 2).toInt)
      JpegRow(id, encodeJpeg(w, h, (c, bi, k) => syntheticCoef(id, c, bi, k)))
    }
  }

  /** The 4:2:0 corpus: 16×16..32×32 images, four interleaved luma
    * blocks per MCU (per-component block index bi = mcu·4 + raster b
    * for luma, bi = mcu for chroma) — same coefficient formulas; a
    * restart interval of 1 MCU, so every multi-MCU image carries RSTn
    * markers and DC-prediction resets (the channel sums are
    * restart-invariant — the oracle is unchanged, but a restart bug
    * shears every post-marker DC and cannot hash-match).
    */
  def syntheticJpeg420Table(docs: DataFrame): Dataset[JpegRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    MediaIds.stream(docs).map { id =>
      val w = 16 * (1 + (id % 2).toInt)
      val h = 16 * (1 + ((id / 2) % 2).toInt)
      JpegRow(id, encodeJpeg(w, h, (c, bi, k) => syntheticCoef(id, c, bi, k),
        ncomp = 3, chroma420 = true, restartInterval = 1))
    }
  }

  /** The 4:2:2 corpus: 16×8..32×16 images, two horizontally-
    * interleaved luma blocks per MCU (bi = mcu·2 + b for luma, bi =
    * mcu for chroma), chroma replicated horizontally — same
    * coefficient formulas; restart interval 2, so the 2- and 4-MCU
    * images carry RSTn markers at a different cadence than the 4:2:0
    * corpus.
    */
  def syntheticJpeg422Table(docs: DataFrame): Dataset[JpegRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    MediaIds.stream(docs).map { id =>
      val w = 16 * (1 + (id % 2).toInt)
      val h = 8 * (1 + ((id / 2) % 2).toInt)
      JpegRow(id, encodeJpeg(w, h, (c, bi, k) => syntheticCoef(id, c, bi, k),
        ncomp = 3, restartInterval = 2, chroma422 = true))
    }
  }

  /** Decode the real JPEG bytes and extract exact integer channel sums
    * (sums, not means — the oracle compare is float-free).
    */
  def extractJpegFeatures(media: Dataset[JpegRow]): Dataset[JpegFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { m =>
        val (w, h, rgb) = decodeJpeg(m.jpeg).getOrElse(
          throw new IllegalStateException(
            s"bad JPEG for media ${m.media_id}"))
        var sr = 0L; var sg = 0L; var sb = 0L
        var k = 0
        while (k < w * h * 3) {
          sr += rgb(k) & 0xff; sg += rgb(k + 1) & 0xff
          sb += rgb(k + 2) & 0xff
          k += 3
        }
        JpegFeatures(m.media_id, w.toLong, h.toLong, sr, sg, sb)
      }
    }
  }
}
