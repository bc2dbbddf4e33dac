package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column handling (BASELINE.json north star): media payloads
  * as opaque `binary` columns with a typed metadata struct, plus a
  * decode/feature-extraction stage.
  *
  * The Spark-side plumbing here is real — schema, partition-wise batch
  * processing, deterministic output — while the actual media decode is a
  * STUB (this container ships no image/audio codecs): `decodeStub`
  * derives features from the bytes themselves. A production deployment
  * swaps `fakeDecode` for a JNI/codec call with the same signature; the
  * dataflow (mapPartitions over binary columns, one decoder instance per
  * partition, never per row) is what matters at 100 TB.
  */
object Multimodal {

  /** One media record: payload + typed metadata, the schema every
    * multimodal table shares. */
  final case class MediaRecord(
      media_id: Long,
      payload: Array[Byte],
      format: String,
      width: Int,
      height: Int)

  /** Extracted features (the decoder's output schema). */
  final case class MediaFeatures(
      media_id: Long,
      n_bytes: Int,
      byte_sum: Long,
      mean_byte: Double,
      frames: Int)

  /** Attach a payload + metadata struct to documents (demo wiring: the
    * doc text bytes stand in for image bytes). */
  def attachPayload(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id").as("media_id"),
      col("text").cast("binary").as("payload"),
      lit("fake/raw").as("format"),
      (lit(64) + (col("doc_id") % 64)).cast("int").as("width"),
      (lit(64) + (col("doc_id") % 32)).cast("int").as("height"))

  /** ===== STUB ===== deterministic fake decode: features from raw bytes.
    * Replace with a real codec (same signature) in production. */
  private def fakeDecode(r: MediaRecord): MediaFeatures = {
    val bytes = r.payload
    var sum = 0L
    var i = 0
    while (i < bytes.length) { sum += bytes(i) & 0xff; i += 1 }
    val mean = if (bytes.length == 0) 0.0 else sum.toDouble / bytes.length
    // "frame sample count": pretend 1 frame per 64 payload bytes
    MediaFeatures(r.media_id, bytes.length, sum, mean, math.max(1, bytes.length / 64))
  }

  /** Decode stage: partition-wise so a real decoder would be initialized
    * once per partition (the mapInPandas batch shape, in Scala). */
  def decodeStub(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition decoder init would go here (stub: nothing)
      it.map(fakeDecode)
    }
  }

  /** Frame sampling: metadata-driven expansion of a media payload into
    * evenly-spaced frame rows — up to `maxSamples` frames of
    * `frameBytes` each, with a per-frame content hash. Fully relational
    * (sequence + explode + byte-slice), so it runs inside whole-stage
    * codegen and scales like any generator: no payload ever leaves its
    * partition, rows out = O(maxSamples) per media. The byte-slice
    * stands in for a real frame decode (same shape: offset + length
    * into the payload). */
  def sampleFrames(media: DataFrame, frameBytes: Int = 64,
      maxSamples: Int = 4): DataFrame =
    media
      .withColumn("frames",
        expr(s"greatest(1, CAST(octet_length(payload) div $frameBytes AS INT))"))
      .withColumn("frame_idx",
        explode(expr(s"sequence(0, frames - 1, greatest(1, frames div $maxSamples))")))
      .select(col("media_id"),
        col("frame_idx").cast("int").as("frame_idx"),
        md5(expr(s"substring(payload, frame_idx * $frameBytes + 1, $frameBytes)"))
          .as("frame_hash"))
}
