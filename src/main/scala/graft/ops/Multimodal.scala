package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Typed media row used by the batched decode path. */
final case class MediaRow(doc_id: String, media_ref: String, kind: String,
                          offset: Int, payload: Array[Byte])
final case class DecodedMedia(doc_id: String, media_ref: String, kind: String,
                              offset: Int, width: Int, height: Int,
                              n_frames: Int, sample_rate: Int)

/**
 * Multimodal columns: image/audio/video ride through the engine as
 * opaque `binary` payloads with typed metadata. The Spark-side
 * plumbing — schema, span extraction, batched decode shape,
 * partitioning — is real and tested; the byte-level decoders are
 * deterministic STUBS (this container ships no image/audio codecs):
 * every `*Stub` function marks exactly where a real decoder
 * (`mapInPandas` + PIL/torchaudio in PySpark, or a JNI codec here)
 * plugs in without changing the plan shape.
 */
object Multimodal {

  /** Explode an interleaved corpus into its media spans:
    * (doc_id, media_ref, kind, offset). */
  def mediaSpans(interleaved: DataFrame): DataFrame =
    interleaved
      .select(col("doc_id"), explode(col("spans")).as("s"))
      .where(col("s.kind") =!= "text")
      .select(col("doc_id"), col("s.media_ref").as("media_ref"),
        col("s.kind").as("kind"), col("s.offset").as("offset"))

  /** Attach a deterministic binary payload (STUB: stands in for
    * fetching the blob from object storage by media_ref). 64 bytes =
    * unhex(md5(ref) * 4), so payloads are reproducible everywhere. */
  def withPayload(media: DataFrame): DataFrame =
    media.withColumn("payload",
      unhex(concat(md5(col("media_ref")), md5(concat(col("media_ref"), lit("1"))),
        md5(concat(col("media_ref"), lit("2"))), md5(concat(col("media_ref"), lit("3"))))))

  /**
   * Batched decode, the JVM analog of `mapInPandas`: partitions are
   * processed in fixed-size batches so a real decoder can amortize
   * model/codec setup per batch. The decode itself is a deterministic
   * STUB reading fake dimensions out of the payload bytes.
   */
  def decodeBatched(media: Dataset[MediaRow], batchSize: Int = 256): Dataset[DecodedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // >>> STUB decoder: replace with a real codec call per batch <<<
        batch.map { m =>
          val b = m.payload
          def u8(i: Int): Int = b(i) & 0xff
          val (w, h, frames, rate) = m.kind match {
            case "image" => (160 + (u8(0) * 256 + u8(1)) % 1760, 120 + (u8(2) * 256 + u8(3)) % 1000, 1, 0)
            case "video" => (320 + u8(0) % 1600, 240 + u8(1) * 4, 25 * (1 + u8(4) % 240), 0)
            case _ => (0, 0, 0, 8000 * (1 + u8(5) % 6))
          }
          DecodedMedia(m.doc_id, m.media_ref, m.kind, m.offset, w, h, frames, rate)
        }
      }
    }
  }

  /** Frame sampling (STUB): every k-th frame index of a decoded video. */
  def sampleFrames(decoded: DataFrame, everyK: Int = 25): DataFrame =
    decoded.where(col("kind") === "video")
      .withColumn("sampled_frames",
        sequence(lit(0), col("n_frames") - 1, lit(everyK)))

  /** End-to-end media pipeline over an interleaved corpus:
    * spans -> payload -> batched decode. */
  def extract(interleaved: DataFrame): Dataset[DecodedMedia] = {
    import interleaved.sparkSession.implicits._
    decodeBatched(withPayload(mediaSpans(interleaved)).as[MediaRow])
  }
}
