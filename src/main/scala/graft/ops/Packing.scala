package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Sequence packing for LM training: concatenate documents in a
 * deterministic global order and slice the token stream into
 * fixed-capacity training chunks — every doc gets its global token
 * offset and the chunk range it lands in.
 *
 * The global running sum is a TWO-LEVEL distributed scan, never a
 * single-partition window over the corpus: per-bucket token totals
 * (one map-side-combined aggregation over id-range buckets), a
 * cumulative sum over the SMALL bucket-totals frame (corpus/bucketSize
 * rows — the only ordered window, and it runs over aggregates), then
 * a per-bucket window partitioned by bucket for the within-bucket
 * offsets. At 100 TB the wide window touches ~n/bucketSize rows and
 * everything else is hash-partitioned.
 */
object Packing {

  /**
   * Per-doc global token offsets and chunk spans.
   *
   * @param id        GLOBAL ORDER KEY — must be unique per row;
   *                  ties would make the within-bucket window order
   *                  (and therefore the offsets) shuffle-dependent
   * @param nTokens   token count column (cast to long internally)
   * @param chunkSize training-sequence capacity in tokens
   * @param bucketSize id-range bucket width for the two-level scan;
   *                  AutoBucket (default) derives ~sqrt(max id) from
   *                  the data so BOTH levels stay ~sqrt(n) rows — a
   *                  fixed width would push n/width rows through the
   *                  single-partition bucket window at 10^12 docs
   * @return (id, n_tokens, start_offset, chunk_start, chunk_end) —
   *         offsets in the id-ordered concatenated token stream; a
   *         doc straddling a capacity boundary spans
   *         [chunk_start, chunk_end] (the chunked-concatenation
   *         regime LM training uses, not padded bin packing)
   */
  /** Sentinel: derive bucketSize from the data (~sqrt of the id span). */
  final val AutoBucket = 0L

  def tokenOffsets(docs: DataFrame, nTokens: Column, id: String = "doc_id",
                   chunkSize: Long = 512L,
                   bucketSize: Long = AutoBucket): DataFrame = {
    val width =
      if (bucketSize != AutoBucket) bucketSize
      else {
        // one cheap max(id) scan; sqrt keeps the bucket-totals window
        // (span/width rows, single partition) and each per-bucket
        // window (~width rows) balanced at ~sqrt(n). Offsets are
        // bucketing-invariant (PackingSpec), so width never changes
        // results, only plan shape.
        val span = docs.select(max(col(id).cast("long"))).head() match {
          case r if r.isNullAt(0) => 1L
          case r => math.max(r.getLong(0), 1L)
        }
        math.max(64L, math.sqrt(span.toDouble).ceil.toLong)
      }
    val base = docs.select(col(id), nTokens.cast("long").as("n_tokens"),
      expr(s"$id div $width").as("bucket"))
    val bucketTotals = base.groupBy("bucket")
      .agg(sum(col("n_tokens")).as("bucket_total"))
    // cumulative over bucket totals: the ordered window runs over
    // corpus/bucketSize aggregate rows, not over documents
    val bw = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val bucketOffsets = bucketTotals.select(col("bucket"),
      coalesce(sum(col("bucket_total")).over(bw), lit(0L)).as("bucket_offset"))
    val dw = Window.partitionBy(col("bucket")).orderBy(col(id))
      .rowsBetween(Window.unboundedPreceding, -1)
    base.join(bucketOffsets, "bucket")
      .select(col(id), col("n_tokens"),
        (col("bucket_offset") +
          coalesce(sum(col("n_tokens")).over(dw), lit(0L))).as("start_offset"))
      .select(col(id), col("n_tokens"), col("start_offset"),
        expr(s"start_offset div $chunkSize").as("chunk_start"),
        // greatest-clamp: an (API-reachable) n_tokens = 0 row would
        // make the -1 land in the previous chunk — and Spark's
        // truncating div disagrees with a flooring // at offset 0
        greatest(expr(s"start_offset div $chunkSize"),
          expr(s"(start_offset + n_tokens - 1) div $chunkSize")).as("chunk_end"))
  }
}
