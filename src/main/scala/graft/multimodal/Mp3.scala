package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}

/** MPEG-1 Audio Layer III (MP3) frame-header metadata — the LAST
  * stand-in retired (round-15 verdict #4): real bitstream framing per
  * the public ISO/IEC 11172-3 spec, in the [[Avi]]/[[Gif]] strict
  * discipline. No entropy decode is needed for the metadata the
  * feature path uses: the 32-bit frame header carries version, layer,
  * bitrate index, sample-rate index, padding and channel mode, and
  * the frame length / CBR duration follow in closed form —
  *
  *   frameLen = 144 · bitrate / sampleRate + padding   (Layer III)
  *   duration = nFrames · 1152 / sampleRate            (samples/frame)
  *
  * The walker is STRICT, like the AVI chunk walk: one optional ID3v2
  * tag (10-byte header + syncsafe size), then back-to-back valid
  * MPEG-1 Layer III frames ending exactly at EOF; anything else —
  * free-format or reserved bitrate, reserved sample rate, a version/
  * layer other than MPEG-1 Layer III, a truncated frame, trailing
  * bytes, a sample-rate or bitrate change mid-stream (the CBR
  * metadata contract) — returns None rather than resyncing.
  *
  * Reference scope: the reference has no media handling; this is part
  * of the brief's multimodal tier (scan-stage decode of opaque binary
  * columns).
  */
object Mp3 {

  /** MPEG-1 Layer III bitrates by header index 1..14, in kbps (index
    * 0 = free format, 15 = reserved: both rejected).
    */
  val BitratesKbps: Array[Int] =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)

  /** MPEG-1 sample rates by header index 0..2 (3 = reserved). */
  val SampleRates: Array[Int] = Array(44100, 48000, 32000)

  /** Channel modes by header field 0..3. */
  val ChannelModes: Array[String] =
    Array("stereo", "joint_stereo", "dual_channel", "mono")

  /** Samples per MPEG-1 Layer III frame. */
  val SamplesPerFrame = 1152

  final case class Mp3Meta(nFrames: Long, sampleRate: Long,
      bitrateKbps: Long, channelMode: String, durationUs: Long,
      byteLen: Long, id3Bytes: Long)

  /** Layer III frame length in bytes for a (kbps, sampleRate, padding)
    * triple — the spec's integer formula.
    */
  def frameLength(kbps: Int, sampleRate: Int, padding: Int): Int =
    144 * kbps * 1000 / sampleRate + padding

  /** Encode ONE frame header + deterministic payload. `payload(k)`
    * fills byte k of the frame body (after the 4 header bytes).
    */
  def encodeFrame(bitrateIdx: Int, sampleRateIdx: Int, padding: Int,
      mode: Int, payload: Int => Int): Array[Byte] = {
    require(bitrateIdx >= 1 && bitrateIdx <= 14, s"bad bitrate index $bitrateIdx")
    require(sampleRateIdx >= 0 && sampleRateIdx <= 2,
      s"bad sample-rate index $sampleRateIdx")
    require(padding == 0 || padding == 1, s"bad padding $padding")
    require(mode >= 0 && mode <= 3, s"bad channel mode $mode")
    val len = frameLength(BitratesKbps(bitrateIdx),
      SampleRates(sampleRateIdx), padding)
    val out = new Array[Byte](len)
    out(0) = 0xFF.toByte
    // 111 (sync) | 11 (MPEG-1) | 01 (Layer III) | 1 (no CRC)
    out(1) = 0xFB.toByte
    out(2) = ((bitrateIdx << 4) | (sampleRateIdx << 2) |
      (padding << 1)).toByte
    out(3) = (mode << 6).toByte
    var k = 4
    while (k < len) { out(k) = (payload(k - 4) & 0xFF).toByte; k += 1 }
    out
  }

  /** Encode an ID3v2.3 tag: 10-byte header with SYNCSAFE body size
    * (7 bits per byte — the spec's false-sync guard), deterministic
    * body bytes.
    */
  def encodeId3v2(bodyLen: Int, body: Int => Int): Array[Byte] = {
    require(bodyLen >= 0 && bodyLen < (1 << 28), s"bad ID3 body $bodyLen")
    val out = new Array[Byte](10 + bodyLen)
    out(0) = 'I'; out(1) = 'D'; out(2) = '3'
    out(3) = 3; out(4) = 0 // v2.3.0
    out(5) = 0             // flags
    out(6) = ((bodyLen >>> 21) & 0x7F).toByte
    out(7) = ((bodyLen >>> 14) & 0x7F).toByte
    out(8) = ((bodyLen >>> 7) & 0x7F).toByte
    out(9) = (bodyLen & 0x7F).toByte
    var k = 0
    while (k < bodyLen) { out(10 + k) = (body(k) & 0xFF).toByte; k += 1 }
    out
  }

  /** Strict whole-file metadata parse (see the header contract). */
  def decodeMp3Meta(bytes: Array[Byte]): Option[Mp3Meta] = {
    if (bytes == null || bytes.length < 4) return None
    var p = 0
    var id3 = 0L
    if (bytes.length >= 10 && bytes(0) == 'I' && bytes(1) == 'D' &&
        bytes(2) == '3') {
      // v2.x header: major, revision, flags, syncsafe size. Strict:
      // syncsafe bytes must have bit 7 clear; flagged extensions
      // (unsynchronisation/footer) are out of the CBR metadata remit.
      if (bytes(5) != 0) return None
      val sz = Seq(6, 7, 8, 9).map(i => bytes(i).toInt)
      if (sz.exists(b => (b & 0x80) != 0)) return None
      val bodyLen = (sz(0) << 21) | (sz(1) << 14) | (sz(2) << 7) | sz(3)
      id3 = 10L + bodyLen
      if (id3 > bytes.length) return None
      p = id3.toInt
    }
    var nFrames = 0L
    var sri = -1
    var bri = -1
    var mode = -1
    while (p < bytes.length) {
      if (p + 4 > bytes.length) return None
      val b0 = bytes(p) & 0xFF; val b1 = bytes(p + 1) & 0xFF
      val b2 = bytes(p + 2) & 0xFF; val b3 = bytes(p + 3) & 0xFF
      // sync + MPEG-1 (version bits 11) + Layer III (layer bits 01)
      if (b0 != 0xFF || (b1 & 0xE0) != 0xE0) return None
      if (((b1 >> 3) & 0x3) != 3 || ((b1 >> 1) & 0x3) != 1) return None
      val fBri = (b2 >> 4) & 0xF
      val fSri = (b2 >> 2) & 0x3
      val pad = (b2 >> 1) & 0x1
      val fMode = (b3 >> 6) & 0x3
      if (fBri < 1 || fBri > 14 || fSri > 2) return None // free/reserved
      if (sri == -1) { sri = fSri; bri = fBri; mode = fMode }
      // CBR metadata contract: rate changes mid-stream are out of remit
      else if (fSri != sri || fBri != bri || fMode != mode) return None
      val len = frameLength(BitratesKbps(fBri), SampleRates(fSri), pad)
      if (p + len > bytes.length) return None
      p += len
      nFrames += 1
    }
    if (nFrames == 0) None
    else Some(Mp3Meta(nFrames, SampleRates(sri).toLong,
      BitratesKbps(bri).toLong, ChannelModes(mode),
      nFrames * SamplesPerFrame.toLong * 1000000L / SampleRates(sri),
      bytes.length.toLong, id3))
  }

  // ------------------------------------------------- synthetic corpus

  final case class Mp3Row(media_id: Long, mp3: Array[Byte])
  final case class Mp3Features(media_id: Long, n_frames: Long,
      sample_rate: Long, bitrate_kbps: Long, channel_mode: String,
      duration_us: Long, byte_len: Long, id3_bytes: Long)

  /** One synthetic CBR MP3's bytes for a doc id — every parameter
    * closed-form in the id (the oracle replays the formulas):
    * ID3v2.3 tag of 17 + id%23 body bytes when id % 4 == 0; then
    * 3 + id%6 frames at bitrate index 1 + id%14, sample-rate index
    * id%3, channel mode id%4, per-frame padding (id + f) % 2,
    * payload byte k of frame f = (31·id + 7·f + k) % 256.
    */
  def syntheticMp3Bytes(id: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    if (id % 4 == 0) {
      val bodyLen = 17 + (id % 23).toInt
      out.write(encodeId3v2(bodyLen, k => ((id + 7 * k) % 256).toInt))
    }
    val n = 3 + (id % 6).toInt
    var f = 0
    while (f < n) {
      val ff = f
      out.write(encodeFrame(1 + (id % 14).toInt, (id % 3).toInt,
        ((id + f) % 2).toInt, (id % 4).toInt,
        k => ((31 * id + 7 * ff + k) % 256).toInt))
      f += 1
    }
    out.toByteArray
  }

  /** Deterministic MP3 corpus over the documents ids. */
  def syntheticMp3Table(docs: DataFrame): Dataset[Mp3Row] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(org.apache.spark.sql.functions.col("doc_id")).as[Long]
      .map(id => Mp3Row(id, syntheticMp3Bytes(id)))
  }

  /** Scan-stage metadata extraction over real MP3 bytes — one strict
    * parse per row, no shuffle; a malformed media fails LOUDLY (the
    * mm-tier convention: silent drops would vacuously hash-match).
    */
  def extractMp3Meta(media: Dataset[Mp3Row]): Dataset[Mp3Features] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.map { m =>
      val meta = decodeMp3Meta(m.mp3).getOrElse(throw
        new IllegalStateException(s"bad MP3 for media ${m.media_id}"))
      Mp3Features(m.media_id, meta.nFrames, meta.sampleRate,
        meta.bitrateKbps, meta.channelMode, meta.durationUs,
        meta.byteLen, meta.id3Bytes)
    }
  }
}
