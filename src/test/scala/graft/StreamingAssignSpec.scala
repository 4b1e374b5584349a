package graft

import graft.geo.CoordSynthesis
import graft.queries.FixedTiles
import graft.streaming.StreamingAssign
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Streaming tile assignment: kill + resume on the same checkpoint
 * must produce EXACTLY the batch assignment of the full input — no
 * lost documents, no duplicates (exactly-once across restart).
 */
class StreamingAssignSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def withCoords(df: DataFrame): DataFrame = df
    .withColumn("lat_mu", CoordSynthesis.latCol(col("doc_id")).cast("long"))
    .withColumn("lon_mu", CoordSynthesis.lonCol(col("doc_id")).cast("long"))

  test("kill+resume streaming assignment equals the batch assignment") {
    import spark.implicits._
    val in = java.nio.file.Files.createTempDirectory("graft_sassign_in").toString
    val out = java.nio.file.Files.createTempDirectory("graft_sassign_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_sassign_ck").toString
    val index = new graft.index.TileIndex(FixedTiles.rects.toArray, 0)

    def writeBatch(ids: Range): Unit =
      ids.map(_.toLong).toDF("doc_id")
        .coalesce(1).write.mode("append").parquet(in)

    def stream(): org.apache.spark.sql.streaming.StreamingQuery =
      StreamingAssign.start(
        withCoords(spark.readStream.schema("doc_id LONG").parquet(in)),
        index, FixedTiles.StartMapId, s"$out/tiles", ckpt)

    // run 1: first slice of the corpus, then stop (the "kill")
    writeBatch(0 until 200)
    val q1 = stream()
    q1.processAllAvailable(); q1.stop()

    // run 2: more data arrives; resume from the same checkpoint
    writeBatch(200 until 500)
    val q2 = stream()
    q2.processAllAvailable(); q2.stop()

    val streamed = spark.read.parquet(s"$out/tiles")
      .select(col("doc_id"), col("map_id").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val batch = StreamingAssign.assigned(
        withCoords((0 until 500).map(_.toLong).toDF("doc_id")),
        index, FixedTiles.StartMapId)
      .select(col("doc_id"), col("map_id").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(streamed === batch,
      s"streamed ${streamed.size} rows vs batch ${batch.size}")
  }
}
