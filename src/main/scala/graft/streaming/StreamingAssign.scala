package graft.streaming

import graft.assign.TileAssigner
import graft.index.TileIndex
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.StreamingQuery

/**
 * Continuous tile assignment — the flagship pipeline's dist phase as
 * a Structured Streaming job: documents stream in, gain tile ids via
 * the codegen'd broadcast-index probe (stateless, zero shuffle on the
 * stream side — the same [[graft.functions.ProbeTilesExpr]] plan as
 * the batch path), fan out one row per containing tile, and land in a
 * map_id-partitioned parquet sink.
 *
 * Exactly-once: the parquet sink + checkpointLocation give
 * end-to-end exactly-once for this stateless pipeline — a query
 * restarted on the same checkpoint after a crash neither loses nor
 * duplicates documents (spec-proven by a kill+resume run equal to the
 * batch assignment of the full input). This is the streaming shape of
 * the reference's dist phase (`SplitProcessor.writeNode:256-322`),
 * where resume-from-checkpoint replaces its multi-pass re-reads.
 */
object StreamingAssign {

  /** Probe + fan-out transform on a streaming frame carrying
    * lat_mu/lon_mu map-unit columns. */
  def assigned(docs: DataFrame, index: TileIndex, startMapId: Int,
               nearestFallback: Boolean = true): DataFrame =
    TileAssigner.explodeByTile(
      TileAssigner.withTileIds(docs.sparkSession, docs,
        col("lat_mu"), col("lon_mu"), index, nearestFallback),
      startMapId)

  /** Start the partitioned-parquet sink with exactly-once
    * checkpointing; restart with the same `checkpointDir` to resume. */
  def start(docs: DataFrame, index: TileIndex, startMapId: Int,
            outDir: String, checkpointDir: String): StreamingQuery =
    assigned(docs, index, startMapId)
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .partitionBy("map_id")
      .outputMode("append")
      .start()
}
