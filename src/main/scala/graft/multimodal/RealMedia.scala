package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** REAL media decode for the self-describing uncompressed formats a JVM
  * can parse without any external library: PPM (P6) images and WAV
  * (PCM16 mono) audio. This upgrades the multimodal tier's codec step
  * from "stubbed" to "real" for these formats — compressed codecs
  * (JPEG/MP3/H.264) remain out of scope in this container, and
  * `Multimodal.FakeCodec` stays as their documented stand-in.
  *
  * The pipeline is encode → real bytes → decode → features: the
  * synthetic table stores genuine PPM/WAV files in the binary column,
  * and feature extraction parses those bytes (header + payload), so the
  * oracle's closed-form pixel/sample arithmetic verifies the decoders
  * end-to-end, not just the generation formulas.
  */
object RealMedia {

  // ------------------------------------------------------------ PPM (P6)

  /** Encode an RGB image as binary PPM: `P6\n<w> <h>\n255\n` + row-major
    * RGB bytes.
    */
  def encodePpm(w: Int, h: Int, pix: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val header = s"P6\n$w $h\n255\n".getBytes("ASCII")
    val out = new Array[Byte](header.length + w * h * 3)
    System.arraycopy(header, 0, out, 0, header.length)
    var o = header.length
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val (r, g, b) = pix(x, y)
        out(o) = r.toByte; out(o + 1) = g.toByte; out(o + 2) = b.toByte
        o += 3
        x += 1
      }
      y += 1
    }
    out
  }

  /** Parse a binary PPM; returns (width, height, row-major RGB bytes). */
  def decodePpm(bytes: Array[Byte]): Option[(Int, Int, Array[Byte])] =
    decodePpmAt(bytes, 0).map { case (w, h, rgb, _) => (w, h, rgb) }

  /** Nearest-neighbor resize of row-major RGB bytes. */
  def resizeNearest(w: Int, h: Int, rgb: Array[Byte], ow: Int, oh: Int): Array[Byte] = {
    val out = new Array[Byte](ow * oh * 3)
    var j = 0
    while (j < oh) {
      val sy = j * h / oh
      var i = 0
      while (i < ow) {
        val sx = i * w / ow
        val so = (sy * w + sx) * 3
        val oo = (j * ow + i) * 3
        out(oo) = rgb(so); out(oo + 1) = rgb(so + 1); out(oo + 2) = rgb(so + 2)
        i += 1
      }
      j += 1
    }
    out
  }

  // ------------------------------------------------------ WAV (PCM16 mono)

  /** Encode mono 16-bit PCM as a RIFF/WAVE file. */
  def encodeWav(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("ASCII"))
      .put("fmt ".getBytes("ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(sampleRate).putInt(sampleRate * 2)
      .putShort(2).putShort(16) // block align, bits
      .put("data".getBytes("ASCII")).putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  /** G.711 µ-law expansion — the REAL companded-audio decode (ITU-T
    * G.711, the telephony standard): the byte is complemented, split
    * into sign / 3-bit exponent / 4-bit mantissa, and expanded as
    * ((mantissa·8 + 132) << exponent) − 132 with the sign applied —
    * all-integer, so the DuckDB oracle replays it exactly.
    */
  def mulawToLinear(b: Byte): Short = {
    val u = (~b) & 0xFF
    val exp = (u >> 4) & 0x07
    val mant = u & 0x0F
    val mag = (((mant << 3) + 132) << exp) - 132
    (if ((u & 0x80) != 0) -mag else mag).toShort
  }

  /** Encode raw µ-law bytes as a RIFF/WAVE file (format tag 7, 8-bit,
    * mono) — the container real telephony captures arrive in.
    */
  def encodeWavMulaw(sampleRate: Int, mulaw: Array[Byte]): Array[Byte] =
    encodeWavG711(sampleRate, mulaw, formatTag = 7)

  /** G.711 A-law expansion — µ-law's European/E1 sibling (same ITU-T
    * G.711 standard, the OTHER companding law): the byte's even bits
    * are un-inverted (XOR 0x55), then split into sign / 3-bit segment
    * / 4-bit mantissa and expanded as (mant·16 + 8) in segment 0, else
    * (mant·16 + 0x108) << (segment − 1). Note the INVERTED sign
    * convention vs µ-law: a SET sign bit means positive. All-integer,
    * so the DuckDB oracle replays it exactly.
    */
  def alawToLinear(b: Byte): Short = {
    val a = (b ^ 0x55) & 0xFF
    val seg = (a >> 4) & 0x07
    val t0 = (a & 0x0F) << 4
    val mag = if (seg == 0) t0 + 8 else (t0 + 0x108) << (seg - 1)
    (if ((a & 0x80) != 0) mag else -mag).toShort
  }

  /** Encode raw A-law bytes as a RIFF/WAVE file (format tag 6, 8-bit,
    * mono).
    */
  def encodeWavAlaw(sampleRate: Int, alaw: Array[Byte]): Array[Byte] =
    encodeWavG711(sampleRate, alaw, formatTag = 6)

  private def encodeWavG711(sampleRate: Int, payload: Array[Byte],
      formatTag: Short): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(44 + payload.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("ASCII")).putInt(36 + payload.length)
      .put("WAVE".getBytes("ASCII"))
      .put("fmt ".getBytes("ASCII")).putInt(16)
      .putShort(formatTag).putShort(1) // A-law (6) / mu-law (7), mono
      .putInt(sampleRate).putInt(sampleRate)
      .putShort(1).putShort(8) // block align, bits
      .put("data".getBytes("ASCII")).putInt(payload.length)
    bb.put(payload)
    bb.array()
  }

  /** IMA/DVI ADPCM step-size table (IMA "Recommended Practices for
    * Enhancing Digital Audio Compatibility", rev 3.00 — public spec;
    * 89 entries, ~1.1× geometric growth).
    */
  val imaStepTable: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
    37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
    544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
    1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
    4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
    12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
    29794, 32767)

  /** IMA ADPCM step-index adjustment, indexed by the nibble's low 3
    * bits (the sign bit does not affect the index walk).
    */
  val imaIndexTable: Array[Int] = Array(-1, -1, -1, -1, 2, 4, 6, 8)

  /** Parse a RIFF/WAVE mono file — PCM16 (format 1), A-law (format 6)
    * / µ-law (format 7, both expanded to linear16) or IMA ADPCM
    * (format 17, 4-bit compressed, decoded to linear16); returns
    * (sampleRate, samples). IMA files
    * must carry the standard `fact` chunk (true sample count) and the
    * samples-per-block fmt extension; the final block may be logically
    * partial (trailing nibbles are padding past the fact count).
    */
  def decodeWav(bytes: Array[Byte]): Option[(Int, Array[Short])] = {
    if (bytes == null || bytes.length < 44) return None
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val riff = new String(Array.fill(4)(bb.get()), "ASCII")
    bb.getInt() // chunk size
    val wave = new String(Array.fill(4)(bb.get()), "ASCII")
    if (riff != "RIFF" || wave != "WAVE") return None
    // walk chunks: fmt then data (tolerates extra chunks between)
    var rate = -1
    var mulaw = false
    var alaw = false
    var adpcm = false
    var adpcmAlign = 0
    var samplesPerBlock = 0
    var factSamples = -1
    while (bb.remaining() >= 8) {
      val cid = new String(Array.fill(4)(bb.get()), "ASCII")
      val len = bb.getInt()
      // hostile negative length would pass every `remaining() < len`
      // guard below (negative is never greater) and then blow up sizing
      // an array / moving the position — reject, don't throw
      if (len < 0) return None
      cid match {
        case "fmt " =>
          // a declared fmt length under 16 would misread the next
          // chunk's bytes as format fields and desynchronize the walk;
          // a truncated buffer would throw BufferUnderflowException
          // mid-parse — both violate the Option contract, so reject
          if (len < 16 || bb.remaining() < len) return None
          val fmt = bb.getShort(); val ch = bb.getShort()
          rate = bb.getInt()
          bb.getInt() // byte rate
          val blockAlign = bb.getShort() & 0xFFFF
          val bits = bb.getShort()
          if (ch != 1) return None
          if (fmt == 17) {
            // IMA ADPCM: 4-bit, and the samples-per-block extension
            // field is mandatory (cbSize >= 2, fmt length >= 20)
            if (bits != 4 || len < 20) return None
            bb.getShort() // cbSize
            samplesPerBlock = bb.getShort() & 0xFFFF
            adpcmAlign = blockAlign
            // mono 4-bit: 4-byte block header then 2 samples per byte
            if (adpcmAlign < 5 ||
              samplesPerBlock != (adpcmAlign - 4) * 2 + 1) return None
            adpcm = true
            if (len > 20) bb.position(bb.position() + len - 20)
          } else {
            // supported: linear PCM16 or G.711 A-law/mu-law (8-bit),
            // mono
            if (!((fmt == 1 && bits == 16) ||
                ((fmt == 6 || fmt == 7) && bits == 8)))
              return None
            mulaw = fmt == 7
            alaw = fmt == 6
            if (len > 16) bb.position(bb.position() + len - 16)
          }
        case "fact" =>
          if (len < 4 || bb.remaining() < len) return None
          factSamples = bb.getInt()
          if (factSamples < 0) return None
          bb.position(bb.position() + len - 4)
        case "data" =>
          if (rate <= 0 || bb.remaining() < len) return None
          if (adpcm) {
            // compressed WAV requires the fact chunk (true count)
            if (factSamples < 0) return None
            if (len == 0 || len % adpcmAlign != 0) return None
            val nBlocks = len / adpcmAlign
            if (factSamples > nBlocks.toLong * samplesPerBlock) return None
            val out = new Array[Short](factSamples)
            var o = 0
            var blk = 0
            while (blk < nBlocks && o < factSamples) {
              val base = bb.position() + blk * adpcmAlign
              var pred = ((bytes(base) & 0xFF) |
                (bytes(base + 1) << 8)).toShort.toInt
              var idx = bytes(base + 2) & 0xFF
              if (idx > 88) return None
              // the block header predictor IS the block's first sample
              out(o) = pred.toShort; o += 1
              var k = 0
              val nNibs = (adpcmAlign - 4) * 2
              while (k < nNibs && o < factSamples) {
                val by = bytes(base + 4 + (k >> 1)) & 0xFF
                val nib = if ((k & 1) == 0) by & 0x0F else by >>> 4
                val step = imaStepTable(idx)
                var diff = step >> 3
                if ((nib & 1) != 0) diff += step >> 2
                if ((nib & 2) != 0) diff += step >> 1
                if ((nib & 4) != 0) diff += step
                pred = if ((nib & 8) != 0) pred - diff else pred + diff
                if (pred > 32767) pred = 32767
                else if (pred < -32768) pred = -32768
                idx += imaIndexTable(nib & 7)
                if (idx < 0) idx = 0 else if (idx > 88) idx = 88
                out(o) = pred.toShort; o += 1
                k += 1
              }
              blk += 1
            }
            // fewer decodable samples than fact declares → malformed
            if (o < factSamples) return None
            return Some((rate, out))
          }
          if (mulaw || alaw) {
            val samples = new Array[Short](len)
            var i = 0
            while (i < len) {
              samples(i) =
                if (mulaw) mulawToLinear(bb.get()) else alawToLinear(bb.get())
              i += 1
            }
            return Some((rate, samples))
          }
          val n = len / 2
          val samples = new Array[Short](n)
          var i = 0
          while (i < n) { samples(i) = bb.getShort(); i += 1 }
          return Some((rate, samples))
        case _ => // skip unknown chunk
          if (bb.remaining() < len) return None
          bb.position(bb.position() + len)
      }
    }
    None
  }

  // ----------------------------------------------------- mu-law corpus

  final case class MulawRow(media_id: Long, wav: Array[Byte])
  final case class MulawFeatures(media_id: Long, n_samples: Long,
      sum_linear: Long, min_linear: Long, max_linear: Long)

  /** Deterministic µ-law corpus: every doc id becomes a REAL G.711
    * WAV (format tag 7) whose companded bytes follow an integer
    * formula — closed-form reproducible by the oracle, which replays
    * the expansion arithmetic in SQL.
    */
  def syntheticMulawTable(docs: DataFrame): Dataset[MulawRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].map { id =>
      val n = 64 + (id % 64).toInt
      val mu = Array.tabulate(n)(i => ((id * 37 + i * 11) % 256).toByte)
      MulawRow(id, encodeWavMulaw(8000, mu))
    }
  }

  /** Decode the µ-law WAVs and extract exact integer features. */
  def extractMulawFeatures(
      media: Dataset[MulawRow]): Dataset[MulawFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { m =>
        val (_, samples) = decodeWav(m.wav).getOrElse(
          throw new IllegalStateException(
            s"bad mu-law WAV for media ${m.media_id}"))
        var sum = 0L; var mn = Long.MaxValue; var mx = Long.MinValue
        samples.foreach { v =>
          sum += v; mn = math.min(mn, v.toLong); mx = math.max(mx, v.toLong)
        }
        MulawFeatures(m.media_id, samples.length.toLong, sum, mn, mx)
      }
    }
  }

  // ------------------------------------------------------ A-law corpus

  final case class AlawRow(media_id: Long, wav: Array[Byte])
  final case class AlawFeatures(media_id: Long, n_samples: Long,
      sum_linear: Long, min_linear: Long, max_linear: Long)

  /** Deterministic A-law corpus: every doc id becomes a REAL G.711
    * A-law WAV (format tag 6) whose companded bytes follow an integer
    * formula — closed-form reproducible by the oracle, which replays
    * the XOR-0x55 / segment expansion arithmetic in SQL. Lengths vary
    * over a different modulus than the µ-law tier so the two queries
    * never share shapes by accident.
    */
  def syntheticAlawTable(docs: DataFrame): Dataset[AlawRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].map { id =>
      val n = 64 + (id % 96).toInt
      val al = Array.tabulate(n)(i => ((id * 41 + i * 13) % 256).toByte)
      AlawRow(id, encodeWavAlaw(8000, al))
    }
  }

  /** Decode the A-law WAVs and extract exact integer features. */
  def extractAlawFeatures(
      media: Dataset[AlawRow]): Dataset[AlawFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { m =>
        val (_, samples) = decodeWav(m.wav).getOrElse(
          throw new IllegalStateException(
            s"bad A-law WAV for media ${m.media_id}"))
        var sum = 0L; var mn = Long.MaxValue; var mx = Long.MinValue
        samples.foreach { v =>
          sum += v; mn = math.min(mn, v.toLong); mx = math.max(mx, v.toLong)
        }
        AlawFeatures(m.media_id, samples.length.toLong, sum, mn, mx)
      }
    }
  }

  // ---------------------------------------------------- IMA ADPCM corpus

  /** Encode an IMA ADPCM (format tag 17) mono WAV. Each block is
    * (initial predictor, initial step index, 4-bit codes); codes are
    * packed two per byte, LOW nibble first (the standard WAV layout).
    * `nSamples` is the true count written to the mandatory `fact`
    * chunk — the final block's trailing codes past it are padding.
    */
  def encodeWavImaAdpcm(sampleRate: Int, blockAlign: Int, nSamples: Int,
      blocks: Seq[(Int, Int, Array[Int])]): Array[Byte] = {
    require(blockAlign >= 5, s"blockAlign must be >= 5, got $blockAlign")
    val nNibs = (blockAlign - 4) * 2
    val samplesPerBlock = nNibs + 1
    blocks.foreach { case (pred, idx, nibs) =>
      require(pred >= -32768 && pred <= 32767, s"bad predictor $pred")
      require(idx >= 0 && idx <= 88, s"bad step index $idx")
      require(nibs.length == nNibs,
        s"block must carry $nNibs codes, got ${nibs.length}")
    }
    val dataLen = blocks.length * blockAlign
    val bb = java.nio.ByteBuffer.allocate(12 + 28 + 12 + 8 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("ASCII")).putInt(4 + 28 + 12 + 8 + dataLen)
      .put("WAVE".getBytes("ASCII"))
      .put("fmt ".getBytes("ASCII")).putInt(20)
      .putShort(17).putShort(1) // IMA ADPCM, mono
      .putInt(sampleRate)
      .putInt(sampleRate * blockAlign / samplesPerBlock) // byte rate
      .putShort(blockAlign.toShort).putShort(4)          // 4-bit codes
      .putShort(2).putShort(samplesPerBlock.toShort)     // cbSize, spb
      .put("fact".getBytes("ASCII")).putInt(4).putInt(nSamples)
      .put("data".getBytes("ASCII")).putInt(dataLen)
    blocks.foreach { case (pred, idx, nibs) =>
      bb.putShort(pred.toShort).put(idx.toByte).put(0.toByte)
      var k = 0
      while (k < nNibs) {
        bb.put((((nibs(k + 1) & 0xF) << 4) | (nibs(k) & 0xF)).toByte)
        k += 2
      }
    }
    bb.array()
  }

  final case class AdpcmRow(media_id: Long, wav: Array[Byte])
  final case class AdpcmFeatures(media_id: Long, n_samples: Long,
      sum_linear: Long, min_linear: Long, max_linear: Long,
      last_linear: Long)

  /** Deterministic IMA ADPCM corpus: every doc id becomes a REAL
    * compressed WAV (format tag 17, blockAlign 36 → 65 samples/block)
    * whose 4-bit codes and per-block header seeds follow integer
    * formulas — the corpus is synthesized in the COMPRESSED domain
    * (the JPEG discipline: coefficient space there, code space here),
    * so the decoded samples are a deterministic all-integer recurrence
    * the oracle replays in SQL with a recursive CTE. Sample counts of
    * 64 + id % 64 span one-partial-block, exactly-one-block and
    * two-block layouts, exercising the fact-chunk truncation path.
    */
  def syntheticAdpcmTable(docs: DataFrame): Dataset[AdpcmRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].map { id =>
      val n = 64 + (id % 64).toInt
      val nBlocks = (n + 64) / 65
      val blocks = (0 until nBlocks).map { b =>
        val pred0 = (((id * 131 + b * 17) % 4096) - 2048).toInt
        val idx0 = ((id * 7 + b * 13) % 89).toInt
        val nibs = Array.tabulate(64)(j =>
          ((id * 5 + (b * 64 + j) * 3) % 16).toInt)
        (pred0, idx0, nibs)
      }
      AdpcmRow(id, encodeWavImaAdpcm(8000, 36, n, blocks))
    }
  }

  /** Decode the ADPCM WAVs and extract exact integer features;
    * `last_linear` pins the decoder's final sequential state (sum/min/
    * max alone are order-insensitive).
    */
  def extractAdpcmFeatures(
      media: Dataset[AdpcmRow]): Dataset[AdpcmFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { m =>
        val (_, samples) = decodeWav(m.wav).getOrElse(
          throw new IllegalStateException(
            s"bad ADPCM WAV for media ${m.media_id}"))
        var sum = 0L; var mn = Long.MaxValue; var mx = Long.MinValue
        samples.foreach { v =>
          sum += v; mn = math.min(mn, v.toLong); mx = math.max(mx, v.toLong)
        }
        AdpcmFeatures(m.media_id, samples.length.toLong, sum, mn, mx,
          samples.last.toLong)
      }
    }
  }

  // --------------------------------------------- video = concatenated PPM

  /** Parse one PPM frame starting at `off`; returns (w, h, rgb,
    * offsetAfterFrame). PPM files are self-delimiting (header carries the
    * dimensions), so a raw concatenation of frames is a decodable
    * "video" stream — the uncompressed analogue of MJPEG.
    */
  def decodePpmAt(bytes: Array[Byte], off: Int): Option[(Int, Int, Array[Byte], Int)] = {
    if (bytes == null || off < 0 || bytes.length - off < 9 ||
      bytes(off) != 'P' || bytes(off + 1) != '6') return None
    var i = off + 2
    val tokens = new scala.collection.mutable.ArrayBuffer[Int](3)
    while (tokens.length < 3 && i < bytes.length) {
      while (i < bytes.length && Character.isWhitespace(bytes(i))) i += 1
      var v = 0
      var any = false
      while (i < bytes.length && bytes(i) >= '0' && bytes(i) <= '9') {
        v = v * 10 + (bytes(i) - '0'); i += 1; any = true
      }
      if (!any) return None
      tokens += v
    }
    if (tokens.length < 3 || tokens(2) != 255) return None
    i += 1 // single whitespace after maxval
    val w = tokens(0); val h = tokens(1)
    // payload size in Long: a hostile header like "100000 100000" would
    // overflow w*h*3 as Int, wrapping the bounds check into acceptance
    val payload = w.toLong * h * 3
    if (w <= 0 || h <= 0 || payload > bytes.length - i) return None
    Some((w, h,
      java.util.Arrays.copyOfRange(bytes, i, i + payload.toInt),
      i + payload.toInt))
  }

  final case class VideoRow(media_id: Long, n_frames: Int, video: Array[Byte])
  final case class FrameFeatures(media_id: Long, frame_idx: Long,
      n_frames: Long, w: Long, h: Long, sum_r: Long)

  /** Deterministic video table: every 5th doc id becomes a clip of
    * 4 + id%5 frames, constant dimensions per clip, per-frame integer
    * pixel formulas (frame index in the red channel) — closed-form
    * reproducible by the oracle.
    */
  def syntheticVideoTable(docs: DataFrame): Dataset[VideoRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .filter((id: Long) => id % 5 == 0)
      .map { id =>
        val nf = 4 + (id % 5).toInt
        val w = 8 + (id % 8).toInt
        val h = 6 + (id % 6).toInt
        val frames = (0 until nf).map { f =>
          encodePpm(w, h, (x, y) => (
            ((id + 11L * f + 3 * x + 5 * y) % 256).toInt,
            ((2 * id + f + x) % 256).toInt,
            ((x.toLong * y + f) % 256).toInt))
        }
        val out = new Array[Byte](frames.map(_.length).sum)
        var o = 0
        frames.foreach { fr =>
          System.arraycopy(fr, 0, out, o, fr.length); o += fr.length
        }
        VideoRow(id, nf, out)
      }
  }

  /** Frame sampling: decode the concatenated stream, keep every
    * `every`-th frame, emit exact integer features per kept frame. A
    * flatMap over the binary column — the 1→N shape of real video
    * pipelines (decode is per-row sequential; parallelism comes from the
    * rows, which is the right axis at corpus scale).
    */
  def sampleFrames(videos: Dataset[VideoRow], every: Int): Dataset[FrameFeatures] = {
    require(every > 0, s"every must be positive, got $every")
    val spark = videos.sparkSession
    import spark.implicits._
    videos.flatMap { v =>
      val out = new scala.collection.mutable.ArrayBuffer[FrameFeatures]()
      var off = 0
      var f = 0
      while (off < v.video.length) {
        val (w, h, rgb, next) = decodePpmAt(v.video, off).getOrElse(
          throw new IllegalStateException(
            s"bad frame $f in video ${v.media_id}"))
        if (f % every == 0) {
          var sr = 0L
          var k = 0
          while (k < rgb.length) { sr += rgb(k) & 0xff; k += 3 }
          out += FrameFeatures(v.media_id, f.toLong, v.n_frames.toLong,
            w.toLong, h.toLong, sr)
        }
        off = next
        f += 1
      }
      if (f != v.n_frames) throw new IllegalStateException(
        s"video ${v.media_id}: decoded $f frames, expected ${v.n_frames}")
      out
    }
  }

  // ------------------------------------------------ synthetic table + query

  final case class RealMediaRow(media_id: Long, kind: String, media: Array[Byte])
  final case class RealMediaFeatures(media_id: Long, kind: String,
      w: Option[Long], h: Option[Long],
      sum_r: Option[Long], sum_g: Option[Long], sum_b: Option[Long],
      rs_sum_r: Option[Long],
      rate: Option[Long], n_samples: Option[Long], duration_us: Option[Long],
      amp_sum_sq: Option[Long])

  /** Deterministic real-bytes media table: even ids get a PPM image with
    * integer pixel formulas, odd ids a WAV with an integer sample
    * formula — both exactly reproducible in closed form by the oracle.
    */
  def syntheticRealMedia(docs: DataFrame): Dataset[RealMediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].map { id =>
      if (id % 2 == 0) {
        val w = 8 + (id % 16).toInt
        val h = 8 + (id % 12).toInt
        val bytes = encodePpm(w, h, (x, y) => (
          ((id + 3 * x + 5 * y) % 256).toInt,
          ((2 * id + 7 * x + y) % 256).toInt,
          ((x.toLong * y + id) % 256).toInt))
        RealMediaRow(id, "img", bytes)
      } else {
        val rate = 8000 + 100 * (id % 8).toInt
        val n = 256 + (id % 128).toInt
        val samples = Array.tabulate(n)(t =>
          (((id * 7 + t.toLong * 13) % 16384) - 8192).toShort)
        RealMediaRow(id, "aud", encodeWav(rate, samples))
      }
    }
  }

  /** Decode the real bytes and extract exact integer features (sums, not
    * means, so the oracle compare is bit-free): image channel sums +
    * the red-channel sum of an 8×8 nearest-neighbor resize; audio rate,
    * length, integer-division duration, and amplitude energy.
    */
  def extractRealFeatures(media: Dataset[RealMediaRow]): Dataset[RealMediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { m =>
        if (m.kind == "img") {
          val (w, h, rgb) = decodePpm(m.media).getOrElse(
            throw new IllegalStateException(s"bad PPM for media ${m.media_id}"))
          var sr = 0L; var sg = 0L; var sb = 0L
          var k = 0
          while (k < w * h * 3) {
            sr += rgb(k) & 0xff; sg += rgb(k + 1) & 0xff; sb += rgb(k + 2) & 0xff
            k += 3
          }
          val rs = resizeNearest(w, h, rgb, 8, 8)
          var rsr = 0L
          var q = 0
          while (q < 8 * 8 * 3) { rsr += rs(q) & 0xff; q += 3 }
          RealMediaFeatures(m.media_id, m.kind,
            Some(w.toLong), Some(h.toLong), Some(sr), Some(sg), Some(sb),
            Some(rsr), None, None, None, None)
        } else {
          val (rate, samples) = decodeWav(m.media).getOrElse(
            throw new IllegalStateException(s"bad WAV for media ${m.media_id}"))
          var ss = 0L
          var i = 0
          while (i < samples.length) {
            ss += samples(i).toLong * samples(i); i += 1
          }
          RealMediaFeatures(m.media_id, m.kind, None, None, None, None, None,
            None, Some(rate.toLong), Some(samples.length.toLong),
            Some(samples.length.toLong * 1000000L / rate), Some(ss))
        }
      }
    }
  }
}
