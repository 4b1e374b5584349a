package graft

import graft.model.InterleavedCorpus
import graft.pipeline.{SplitConfig, SplitPipeline}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /**
   * Flagship query: the full tile-split + assignment pipeline on the
   * sf0.001 interleaved corpus — density aggregation, BSP solve,
   * broadcast point-in-rectangle assignment — returning per-tile doc
   * counts with tile bounds.
   */
  def entry(spark: SparkSession): DataFrame = {
    val docs = InterleavedCorpus.fromFlatDocuments(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet"))
    val outDir = java.nio.file.Files
      .createTempDirectory("graft_entry").toString
    val cfg = SplitConfig(maxNodes = 100L, trim = true)
    val res = SplitPipeline.run(spark, docs, cfg, outDir)
    SplitPipeline.recordMetrics(res.assigned, "assign", outDir)
    res.assigned.groupBy(col("map_id"))
      .agg(count(lit(1)).as("doc_count"))
      .orderBy(col("map_id"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Catalog.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = graft.queries.Catalog.oracles
}
