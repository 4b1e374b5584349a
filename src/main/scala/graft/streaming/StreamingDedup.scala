package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Streaming exact-dedup of an append-only document feed — the
 * streaming analog of the batch q_dedup_exact hash-first dedup, for
 * exactly-once corpus ingestion: keep the FIRST occurrence of each
 * content hash, drop any duplicate arriving within the watermark
 * horizon.
 *
 * Plan shape: the 32-byte md5 digest (never the document body) is the
 * dedup state key, and `dropDuplicatesWithinWatermark` bounds the
 * state store by event time — state for a hash is evicted once the
 * watermark passes its arrival window, so unbounded feeds run in
 * bounded memory. A duplicate arriving AFTER eviction is admitted
 * again (the documented semantics of within-watermark dedup); the
 * batch LSH/CC passes downstream own cross-horizon duplicates.
 */
object StreamingDedup {

  /**
   * @param docs streaming frame with an event-time column and a text
   *             column; any other columns ride through
   * @return one row per first-seen content hash within the watermark
   */
  def dedupByContent(docs: DataFrame, tsCol: String = "ts",
                     textCol: String = "text",
                     watermark: String = "1 hour"): DataFrame =
    docs.withColumn("text_hash", md5(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("text_hash")
}
