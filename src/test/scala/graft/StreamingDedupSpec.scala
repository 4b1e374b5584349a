package graft

import graft.streaming.StreamingDedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Streaming ingestion dedup: first occurrence of each content hash
 * wins; duplicates within the watermark horizon are dropped across
 * micro-batches, and the surviving set equals the batch hash-first
 * dedup over the same feed.
 */
class StreamingDedupSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  test("within-watermark duplicates drop across micro-batches; batch parity") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_sdedup").toString
    val hour = 3600L * 1000
    def writeFile(rows: Seq[(Long, Long, String)]): Unit =
      rows.map { case (id, ts, tx) => (id, new java.sql.Timestamp(ts), tx) }
        .toDF("doc_id", "ts", "text")
        .coalesce(1).write.mode("append").parquet(dir)

    // batch 1: two distinct texts plus an in-batch duplicate
    writeFile(Seq((1L, 1000 * hour, "alpha beta"), (2L, 1000 * hour + 1, "gamma"),
      (3L, 1000 * hour + 2, "alpha beta")))
    val stream = spark.readStream
      .schema("doc_id LONG, ts TIMESTAMP, text STRING").parquet(dir)
    val q = StreamingDedup.dedupByContent(stream, watermark = "1 hour")
      .select("doc_id", "text_hash")
      .writeStream.outputMode("append").format("memory").queryName("sdedup")
      .start()
    try {
      q.processAllAvailable()
      // batch 2, still inside the watermark: a cross-batch duplicate
      // of doc 1 (dropped) and one new text (kept)
      writeFile(Seq((4L, 1000 * hour + 3, "alpha beta"), (5L, 1000 * hour + 4, "delta")))
      q.processAllAvailable()

      val kept = spark.sql("SELECT doc_id FROM sdedup")
        .collect().map(_.getLong(0)).toSet
      assert(kept === Set(1L, 2L, 5L),
        s"first occurrence per content hash must win, got $kept")

      // batch parity: same keeper count as the batch hash-first dedup
      val batchDistinct = spark.read.parquet(dir)
        .groupBy(md5(col("text"))).agg(min(col("doc_id")).as("keeper"))
        .collect().map(_.getLong(1)).toSet
      assert(kept === batchDistinct)
    } finally q.stop()
  }
}
