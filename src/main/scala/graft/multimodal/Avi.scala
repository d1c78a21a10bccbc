package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.col

/** Motion-JPEG video in a REAL AVI RIFF container (round-14 verdict
  * #3) — the video analogue of the GIF89a tier: the bytes in the
  * binary column are a genuine, spec-conformant AVI (Microsoft RIFF:
  * `RIFF('AVI ' LIST('hdrl' avih LIST('strl' strh strf))
  * LIST('movi' 00dc…) idx1)`) whose `00dc` chunks are concatenated
  * JFIF frames, and the extractor walks the container exactly as a
  * player would — chunk sizes, even-byte padding, index validation —
  * before handing each frame to the real JPEG decoder
  * ([[Jpeg.decodeJpeg]], 4:2:0 profile with restart markers).
  *
  * This retires the FakeCodec H.264 stand-in from the VIDEO feature
  * path: frame extraction over real video now runs container parse →
  * per-frame entropy decode → IDCT → color convert, all pure JVM, all
  * scan-stage, and the DuckDB oracle replays every composited frame's
  * channel sums from the closed-form coefficient corpus (the
  * mm_jpeg420_decode discipline, per (media, frame)).
  *
  * Reference scope: the reference has no video operator — this is the
  * LLM-pipeline multimodal tier the brief adds on top of SURVEY.md §2.
  */
object Avi {

  final case class AviRow(media_id: Long, avi: Array[Byte])
  final case class MjpegFrameFeatures(media_id: Long, frame_no: Long,
      us_per_frame: Long, w: Long, h: Long,
      sum_r: Long, sum_g: Long, sum_b: Long)

  private def fourcc(s: String): Array[Byte] = {
    require(s.length == 4, s"fourcc must be 4 chars: '$s'")
    s.getBytes("US-ASCII")
  }

  /** Build a spec-conformant single-stream MJPG AVI. `usPerFrame` is
    * the frame period in microseconds (dwMicroSecPerFrame; the stream
    * header carries the same timing as scale/rate = usPerFrame/1e6).
    */
  def encodeAviMjpeg(w: Int, h: Int, usPerFrame: Int,
      frames: Seq[Array[Byte]]): Array[Byte] = {
    require(w > 0 && h > 0, s"bad dimensions ${w}x$h")
    require(usPerFrame > 0, s"bad frame period $usPerFrame")
    require(frames.nonEmpty, "an AVI needs at least one frame")
    val out = new java.io.ByteArrayOutputStream()
    def u32(v: Long): Unit = {
      out.write((v & 0xFF).toInt); out.write(((v >> 8) & 0xFF).toInt)
      out.write(((v >> 16) & 0xFF).toInt)
      out.write(((v >> 24) & 0xFF).toInt)
    }
    def u16(v: Int): Unit = {
      out.write(v & 0xFF); out.write((v >> 8) & 0xFF)
    }
    def cc(s: String): Unit = out.write(fourcc(s))
    val maxFrame = frames.map(_.length).max
    def padded(n: Int): Int = n + (n & 1)

    // ---- sizes, computed before writing (RIFF sizes are u32 LE)
    val strhSize = 56
    val strfSize = 40
    val strlSize = 4 + (8 + strhSize) + (8 + strfSize)
    val avihSize = 56
    val hdrlSize = 4 + (8 + avihSize) + (8 + strlSize)
    val moviSize = 4 + frames.map(f => 8 + padded(f.length)).sum
    val idx1Size = 16 * frames.length
    val riffSize = 4 + (8 + hdrlSize) + (8 + moviSize) + (8 + idx1Size)

    cc("RIFF"); u32(riffSize.toLong); cc("AVI ")
    // hdrl
    cc("LIST"); u32(hdrlSize.toLong); cc("hdrl")
    cc("avih"); u32(avihSize.toLong)
    u32(usPerFrame.toLong) // dwMicroSecPerFrame
    u32(0L)                // dwMaxBytesPerSec
    u32(0L)                // dwPaddingGranularity
    u32(0x10L)             // dwFlags: AVIF_HASINDEX
    u32(frames.length.toLong) // dwTotalFrames
    u32(0L)                // dwInitialFrames
    u32(1L)                // dwStreams
    u32(maxFrame.toLong)   // dwSuggestedBufferSize
    u32(w.toLong); u32(h.toLong)
    u32(0L); u32(0L); u32(0L); u32(0L) // dwReserved[4]
    // strl
    cc("LIST"); u32(strlSize.toLong); cc("strl")
    cc("strh"); u32(strhSize.toLong)
    cc("vids"); cc("MJPG")
    u32(0L)                // dwFlags
    u16(0); u16(0)         // wPriority, wLanguage
    u32(0L)                // dwInitialFrames
    u32(usPerFrame.toLong) // dwScale
    u32(1000000L)          // dwRate  (rate/scale = fps)
    u32(0L)                // dwStart
    u32(frames.length.toLong) // dwLength (in frames)
    u32(maxFrame.toLong)   // dwSuggestedBufferSize
    u32(0L)                // dwQuality
    u32(0L)                // dwSampleSize (0: one sample = one frame)
    u16(0); u16(0); u16(w); u16(h) // rcFrame
    cc("strf"); u32(strfSize.toLong)
    u32(40L)               // biSize
    u32(w.toLong); u32(h.toLong)
    u16(1); u16(24)        // biPlanes, biBitCount
    cc("MJPG")             // biCompression
    u32(w.toLong * h * 3)  // biSizeImage
    u32(0L); u32(0L); u32(0L); u32(0L) // pels/clr fields
    // movi
    cc("LIST"); u32(moviSize.toLong); cc("movi")
    val offsets = new Array[Int](frames.length)
    var off = 4 // relative to the 'movi' fourcc start
    frames.zipWithIndex.foreach { case (f, i) =>
      offsets(i) = off
      cc("00dc"); u32(f.length.toLong); out.write(f)
      if ((f.length & 1) == 1) out.write(0)
      off += 8 + padded(f.length)
    }
    // idx1
    cc("idx1"); u32(idx1Size.toLong)
    frames.zipWithIndex.foreach { case (f, i) =>
      cc("00dc"); u32(0x10L) // AVIIF_KEYFRAME
      u32(offsets(i).toLong); u32(f.length.toLong)
    }
    out.toByteArray
  }

  /** Strict AVI MJPG parse: (width, height, usPerFrame, frames).
    * None for anything malformed — bad magic, truncated chunks, a
    * missing header/movi list, an idx1 whose entry count disagrees
    * with the stream, or a frame count mismatch. The walk honors
    * even-byte chunk padding (the classic RIFF trap).
    */
  def decodeAviMjpeg(bytes: Array[Byte]): Option[(Int, Int, Long,
      Seq[Array[Byte]])] = {
    def u32(p: Int): Long =
      if (p + 4 > bytes.length) -1L
      else (bytes(p) & 0xFFL) | ((bytes(p + 1) & 0xFFL) << 8) |
        ((bytes(p + 2) & 0xFFL) << 16) | ((bytes(p + 3) & 0xFFL) << 24)
    def cc(p: Int): String =
      if (p + 4 > bytes.length) ""
      else new String(bytes, p, 4, "US-ASCII")
    if (bytes.length < 12 || cc(0) != "RIFF" || cc(8) != "AVI ")
      return None
    val riffEnd = 8 + u32(4)
    if (riffEnd > bytes.length) return None

    var usPerFrame = -1L
    var totalFrames = -1L
    var w = -1
    var h = -1
    val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var idxEntries = -1L

    var p = 12
    while (p + 8 <= riffEnd) {
      val id = cc(p)
      val sz = u32(p + 4)
      if (sz < 0 || p + 8 + sz > riffEnd) return None
      id match {
        case "LIST" =>
          val listType = cc(p + 8)
          if (listType == "hdrl") {
            // avih must be the first child, and its 40 read bytes must
            // lie inside the hdrl list's own extent (p + 8 + sz) — the
            // whole-buffer checks in u32/cc alone would let a
            // truncated hdrl pull header values from adjacent chunks
            val ap = p + 12
            if (ap + 8 + 40 > p + 8 + sz) return None
            if (cc(ap) != "avih" || u32(ap + 4) < 40) return None
            usPerFrame = u32(ap + 8)
            totalFrames = u32(ap + 8 + 16)
            w = u32(ap + 8 + 32).toInt
            h = u32(ap + 8 + 36).toInt
          } else if (listType == "movi") {
            var q = p + 12
            val end = p + 8 + sz
            while (q + 8 <= end) {
              val cid = cc(q)
              val csz = u32(q + 4)
              if (csz < 0 || q + 8 + csz > end) return None
              if (cid == "00dc" || cid == "00db") {
                val f = new Array[Byte](csz.toInt)
                System.arraycopy(bytes, q + 8, f, 0, csz.toInt)
                frames += f
              }
              q += 8 + csz.toInt + (csz & 1L).toInt // even padding
            }
          }
        case "idx1" => idxEntries = sz / 16
        case _ => // tolerated: JUNK and other standard padding chunks
      }
      p += 8 + sz.toInt + (sz & 1L).toInt
    }
    if (usPerFrame <= 0 || w <= 0 || h <= 0 || frames.isEmpty) None
    else if (totalFrames >= 0 && totalFrames != frames.length) None
    else if (idxEntries >= 0 && idxEntries != frames.length) None
    else Some((w, h, usPerFrame, frames.toSeq))
  }

  /** Deterministic MJPEG corpus: three 4:2:0 JFIF frames per media
    * (16×16..32×32, restart interval 1), frame f of media id carrying
    * the closed-form coefficient stream of synthetic id 4·id + f —
    * the oracle replays each frame through the mm_jpeg420_decode
    * pipeline with cid = 4·id + f. Frame period 33333 + (id mod 7)·
    * 1000 µs (≈ 24–30 fps).
    */
  def syntheticMjpegTable(docs: DataFrame): Dataset[AviRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    MediaIds.stream(docs).map { id =>
      val w = 16 * (1 + (id % 2).toInt)
      val h = 16 * (1 + ((id / 2) % 2).toInt)
      val frames = (0 until 3).map { f =>
        Jpeg.encodeJpeg(w, h,
          (c, bi, k) => Jpeg.syntheticCoef(id * 4 + f, c, bi, k),
          ncomp = 3, chroma420 = true, restartInterval = 1)
      }
      AviRow(id, encodeAviMjpeg(w, h, 33333 + (id % 7).toInt * 1000,
        frames))
    }
  }

  /** Parse the real AVI bytes, decode every MJPG frame with the real
    * JPEG decoder, and emit one exact channel-sum row per frame. The
    * container's declared dimensions must match each decoded frame —
    * a mismatch is a loud failure, not a silent trust of either side.
    */
  def extractMjpegFrames(
      media: Dataset[AviRow]): Dataset[MjpegFrameFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.flatMap { m =>
      val (w, h, us, frames) = decodeAviMjpeg(m.avi).getOrElse(
        throw new IllegalStateException(
          s"bad AVI for media ${m.media_id}"))
      frames.zipWithIndex.map { case (fb, i) =>
        val (fw, fh, rgb) = Jpeg.decodeJpeg(fb).getOrElse(
          throw new IllegalStateException(
            s"bad MJPG frame $i for media ${m.media_id}"))
        if (fw != w || fh != h) throw new IllegalStateException(
          s"media ${m.media_id} frame $i is ${fw}x$fh but the " +
            s"container declares ${w}x$h")
        var sr = 0L; var sg = 0L; var sb = 0L
        var k = 0
        while (k < fw * fh * 3) {
          sr += rgb(k) & 0xff; sg += rgb(k + 1) & 0xff
          sb += rgb(k + 2) & 0xff
          k += 3
        }
        MjpegFrameFeatures(m.media_id, i.toLong, us, w.toLong, h.toLong,
          sr, sg, sb)
      }
    }
  }
}
