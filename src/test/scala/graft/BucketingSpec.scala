package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Co-located joins via bucketing — the storage-layout lever for the
 * repeated doc <-> assignment joins at 100 TB: both sides bucketed on
 * the join key join WITHOUT a shuffle exchange (SURVEY §0
 * "Partitioning & shuffle").
 */
class BucketingSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val wh = java.nio.file.Files.createTempDirectory("graft_wh").toString
    SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.warehouse.dir", wh)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  test("bucketed tables join without a shuffle exchange") {
    // getOrCreate() may hand back a session an earlier suite built, where
    // builder .config() is silently ignored — set the runtime conf on the
    // live session and restore it after (forces the SMJ path either way)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // unique table names: the live session may use the DEFAULT
    // warehouse (builder confs are ignored when getOrCreate returns an
    // earlier suite's session), where a stale docs_bucketed directory
    // from a previous JVM makes saveAsTable fail LOCATION_ALREADY_EXISTS
    val suffix = java.util.UUID.randomUUID().toString.replace("-", "").take(8)
    val docsTbl = s"docs_bucketed_$suffix"
    val statsTbl = s"stats_bucketed_$suffix"
    try {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.write.mode("overwrite")
      .bucketBy(8, "doc_id").sortBy("doc_id")
      .saveAsTable(docsTbl)
    docs.select(col("doc_id"), col("n_chars"))
      .write.mode("overwrite")
      .bucketBy(8, "doc_id").sortBy("doc_id")
      .saveAsTable(statsTbl)

    val joined = spark.table(docsTbl)
      .join(spark.table(statsTbl), "doc_id")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"bucketed join must not shuffle:\n$plan")
    assert(joined.count() === docs.count())

    // control: the same join on unbucketed data does shuffle
    val unbucketed = docs.join(docs.select(col("doc_id"), col("n_chars")), "doc_id")
    assert(unbucketed.queryExecution.executedPlan.toString.contains("Exchange"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql(s"DROP TABLE IF EXISTS $docsTbl")
      spark.sql(s"DROP TABLE IF EXISTS $statsTbl")
    }
  }
}
