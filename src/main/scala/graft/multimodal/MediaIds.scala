package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.col

/** The id stream every synthetic media table maps over — repartitioned
  * up to cluster parallelism BEFORE the per-row encode/decode map.
  *
  * Spark sizes scan splits by BYTES, but a media pipeline's cost is
  * per-row CPU (a full JPEG/GIF/AVI/ADPCM encode + decode per id), so
  * a small id file becomes ONE task and serializes the whole stage on
  * a single core. Measured at sf0.1: the documents table is a single
  * 584 KB parquet file — mm_mjpeg_frames ran three full JPEG decodes
  * per media on 1 of 32 cores (3.7 s), while the 10×-row sf1 smoke,
  * whose synthesized input is 32 files, finished its 10× workload in
  * LESS wall clock (2.2 s). The exchange moves 8-byte ids —
  * negligible next to the codec work it spreads. Never coalesces: an
  * input already wider than the session's parallelism keeps its
  * width (the 100 TB case, where media ids arrive in thousands of
  * splits).
  *
  * Policy: only the HEAVY per-row codecs opt in (multi-block JPEG
  * encode+decode, Motion-JPEG AVI, GIF89a animation compositing) —
  * for the sub-millisecond-per-row builders (audio expanders, BMP
  * RLE, static GIF/PNG, MP3 headers) the extra exchange stage costs
  * more than the single-task stage it parallelizes at probe scale,
  * and at corpus scale their inputs arrive pre-split anyway.
  */
object MediaIds {
  def stream(docs: DataFrame): Dataset[Long] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ids = docs.select(col("doc_id")).as[Long]
    val target = spark.sparkContext.defaultParallelism
    if (ids.rdd.getNumPartitions >= target) ids
    else ids.repartition(target)
  }
}
