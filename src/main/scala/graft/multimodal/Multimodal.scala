package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (SURVEY.md §7.5): media as opaque binary
  * columns with typed metadata, decode/feature-extract/resize/frame-sample
  * as partition-wise transforms.
  *
  * The codec step here is STUBBED: `FakeCodec` is a deterministic
  * stand-in that parses our own synthetic 16-byte header. Real codecs
  * exist beside it for every format the JVM can honestly decode with
  * zero external libraries: [[RealMedia]] (PPM/WAV), [[Png]]
  * (DEFLATE-compressed lossless), [[Jpeg]] (baseline-sequential
  * lossy, huffman + IDCT + YCbCr, 4:4:4/4:2:0/restart intervals), and
  * G.711 µ-law WAVs ([[RealMedia.mulawToLinear]]) — the stand-in now
  * covers only the perceptual codecs (MP3/H.264). Everything AROUND the codec —
  * the schema, the batch shape (mapPartitions ⇒ one codec init per
  * partition, the same shape a Pandas-UDF `mapInPandas` gives
  * PySpark), partition sizing, and metadata propagation — is real and
  * tested.
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
      byte_len: Int, mean_byte: Double, frames_sampled: Int)

  /** Deterministic stand-in codec: 16-byte header
    * [magic:4][format:4][w:2][h:2][frames:4], payload follows. A real
    * deployment swaps `decode` for an image/audio library call; the Spark
    * plumbing is unchanged.
    *
    * Remaining remit (shrinking every round): MP3 audio only. Images
    * decode for real (PNG/DEFLATE, JPEG 4:4:4/4:2:0/4:2:2, GIF87a/89a,
    * BMP RLE8), audio PCM/µ-law/A-law/ADPCM decode for real (Wav), and
    * VIDEO now decodes for real too — Motion-JPEG in a genuine AVI
    * RIFF container ([[Avi]]), retiring the H.264 stand-in from the
    * frame-extraction feature path.
    */
  object FakeCodec {
    val Magic = 0x47524654 // "GRFT"

    def encode(format: String, w: Int, h: Int, frames: Int,
        payload: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(16 + payload.length)
      bb.putInt(Magic)
      bb.put(format.padTo(4, ' ').take(4).getBytes("ASCII"))
      bb.putShort(w.toShort).putShort(h.toShort).putInt(frames)
      bb.put(payload)
      bb.array()
    }

    def decode(bytes: Array[Byte]): Option[MediaMeta] = {
      if (bytes == null || bytes.length < 16) return None
      val bb = java.nio.ByteBuffer.wrap(bytes)
      if (bb.getInt() != Magic) return None
      val fmt = new String(Array.fill(4)(bb.get()), "ASCII").trim
      Some(MediaMeta(fmt, bb.getShort().toInt, bb.getShort().toInt, bb.getInt()))
    }
  }

  /** Build a synthetic media table from the documents table — payload is
    * the text bytes, deterministic dimensions from the doc id.
    */
  def syntheticMediaTable(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val fmt = if (id % 3 == 0) "img" else if (id % 3 == 1) "aud" else "vid"
        val w = 16 + (id % 64).toInt
        val h = 16 + (id % 48).toInt
        val frames = 1 + (id % 24).toInt
        val payload = text.getBytes("UTF-8")
        MediaRow(id, FakeCodec.encode(fmt, w, h, frames, payload),
          MediaMeta(fmt, w, h, frames))
      }
  }

  /** Decode + feature-extract, partition-wise: the codec "initializes"
    * once per partition (the expensive step a real decoder amortizes),
    * then streams rows — the Scala analogue of a Pandas UDF batch.
    * `frameStride` subsamples frames (frame-sample op).
    */
  def extractFeatures(media: Dataset[MediaRow],
      frameStride: Int = 4): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      // per-partition codec init happens here in a real implementation
      rows.flatMap { r =>
        FakeCodec.decode(r.media).map { meta =>
          val payload = r.media.drop(16)
          val mean =
            if (payload.isEmpty) 0.0
            else payload.map(b => (b & 0xff).toDouble).sum / payload.length
          MediaFeatures(r.media_id, meta.format, payload.length, mean,
            frames_sampled = (meta.n_frames + frameStride - 1) / frameStride)
        }
      }
    }
  }
}
