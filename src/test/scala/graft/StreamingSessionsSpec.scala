package graft

import graft.streaming.StreamingSessions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Custom-state streaming (flatMapGroupsWithState + event-time
 * timeout): gap sessionization must agree with the batch q_sessions
 * window query once the watermark has passed every gap.
 */
class StreamingSessionsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  test("streaming sessions match the batch window computation") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_sess").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      java.nio.file.Paths.get(s"$dir/part-0.parquet"))
    val real = spark.read.parquet(s"$dir/part-0.parquet")
    val schema = real.select(
      col("user_id").cast("long"), col("ts").cast("timestamp"),
      col("event_id").cast("long")).schema
    val maxTs = real.agg(max(col("ts").cast("timestamp"))).collect()(0)
      .getTimestamp(0).getTime

    val stream = spark.readStream.schema(real.schema).parquet(dir)
      .select(col("user_id").cast("long"), col("ts").cast("timestamp"),
        col("event_id").cast("long"))
      .withWatermark("ts", "1 second")
      .as[StreamingSessions.Event]
    val q = StreamingSessions.sessionize(stream, gapSeconds = 3600L)
      .writeStream.outputMode("append").format("memory").queryName("sess")
      .start()
    try {
      q.processAllAvailable()
      // two synthetic far-future events (distinct users) push the
      // watermark far past every real gap, so event-time timeouts
      // flush all real open sessions
      def flushFile(n: Int, user: Long, tsMillis: Long): Unit =
        Seq((user, new java.sql.Timestamp(tsMillis), -1L))
          .toDF("user_id", "ts", "event_id")
          .select(col("user_id").cast(real.schema("user_id").dataType),
            col("ts").cast(real.schema("ts").dataType),
            col("event_id").cast(real.schema("event_id").dataType))
          .coalesce(1).write.mode("append").parquet(dir)
      flushFile(1, 900000001L, maxTs + 10L * 3600 * 1000)
      q.processAllAvailable()
      flushFile(2, 900000002L, maxTs + 20L * 3600 * 1000)
      q.processAllAvailable()

      val streamed = spark.sql(
        "SELECT * FROM sess WHERE user_id < 900000000")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet

      // batch oracle: the q_sessions computation on the same events
      import org.apache.spark.sql.expressions.Window
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val batch = real
        .select(col("user_id").cast("long").as("user_id"),
          col("ts").cast("timestamp").as("ts"),
          col("event_id").cast("long").as("event_id"))
        .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
        .withColumn("new_sess",
          when(col("prev_ts").isNull ||
            (unix_micros(col("ts")) - unix_micros(col("prev_ts"))) > 3600000000L, 1L)
            .otherwise(0L))
        .withColumn("session_id",
          sum(col("new_sess")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"), min(col("event_id")).as("first_event"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      assert(streamed === batch,
        s"streamed ${streamed.size} vs batch ${batch.size} sessions")
    } finally q.stop()
  }

  test("session numbering continues after an event-time timeout") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_sess2").toString
    val hour = 3600L * 1000
    def writeFile(rows: Seq[(Long, Long, Long)]): Unit =
      rows.map { case (u, ts, e) => (u, new java.sql.Timestamp(ts), e) }
        .toDF("user_id", "ts", "event_id")
        .coalesce(1).write.mode("append").parquet(dir)

    // batch 1: user 1's first session
    writeFile(Seq((1L, 1000L * hour, 10L), (1L, 1000L * hour + 1, 11L)))
    val stream = spark.readStream
      .schema("user_id LONG, ts TIMESTAMP, event_id LONG").parquet(dir)
      .withWatermark("ts", "1 second")
      .as[StreamingSessions.Event]
    val q = StreamingSessions.sessionize(stream, gapSeconds = 3600L)
      .writeStream.outputMode("append").format("memory").queryName("sess2")
      .start()
    try {
      q.processAllAvailable()
      // batch 2: another user pushes the watermark past user 1's gap,
      // so user 1's open session times out (state becomes a tombstone)
      writeFile(Seq((2L, 1010L * hour, 20L)))
      q.processAllAvailable()
      // batch 3: user 1 returns — must get session_id 2, not 1 again
      writeFile(Seq((1L, 1020L * hour, 12L)))
      q.processAllAvailable()
      // batch 4: flush everything still open
      writeFile(Seq((3L, 1040L * hour, 30L)))
      q.processAllAvailable()
      writeFile(Seq((4L, 1060L * hour, 40L)))
      q.processAllAvailable()

      val got = spark.sql("SELECT * FROM sess2 WHERE user_id = 1")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      assert(got === Set((1L, 1L, 2L, 10L), (1L, 2L, 1L, 12L)),
        s"expected two distinct session ids for user 1, got $got")
    } finally q.stop()
  }

  test("state stays bounded under a stream of unique users (tombstone TTL)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_sess3").toString
    val hour = 3600L * 1000
    def writeFile(rows: Seq[(Long, Long, Long)]): Unit =
      rows.map { case (u, ts, e) => (u, new java.sql.Timestamp(ts), e) }
        .toDF("user_id", "ts", "event_id")
        .coalesce(1).write.mode("append").parquet(dir)

    val stream = spark.readStream
      .schema("user_id LONG, ts TIMESTAMP, event_id LONG").parquet(dir)
      .withWatermark("ts", "1 second")
      .as[StreamingSessions.Event]
    // 1 h retention: each 10 h batch step expires the previous batch's
    // tombstones, so state tracks the recently-active users only
    val q = StreamingSessions.sessionize(stream, gapSeconds = 3600L,
      tombstoneSeconds = 3600L)
      .writeStream.outputMode("append").format("memory").queryName("sess3")
      .start()
    try {
      val batches = 6
      val usersPerBatch = 10
      (0 until batches).foreach { k =>
        writeFile((0 until usersPerBatch).map(u =>
          (100L + k * usersPerBatch + u, (1000L + k * 10) * hour,
            1000L * k + u)))
        q.processAllAvailable()
      }
      val stateRows = q.lastProgress.stateOperators.head.numRowsTotal
      val totalUsers = batches * usersPerBatch
      // without the TTL this is >= totalUsers (one tombstone per user
      // forever); with it, only the last batch's open sessions and the
      // previous batch's not-yet-expired tombstones remain
      assert(stateRows <= 2L * usersPerBatch + 5,
        s"state must stay bounded by recent activity: $stateRows rows " +
          s"after $totalUsers unique users")

      // the documented trade-off: a user returning AFTER the retention
      // horizon restarts numbering at session 1
      writeFile(Seq((100L, (1000L + batches * 10) * hour, 9999L)))
      q.processAllAvailable()
      writeFile(Seq((900L, (1000L + (batches + 2) * 10) * hour, 10000L)))
      q.processAllAvailable()
      val ids = spark.sql("SELECT session_id FROM sess3 WHERE user_id = 100")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(ids === Seq(1L, 1L),
        s"past-horizon return must restart numbering, got $ids")
    } finally q.stop()
  }
}
