package graft

import org.apache.spark.sql.SparkSession

/**
 * Round-7 optimization harness (guide §1): times individual catalog
 * queries OUTSIDE the frozen driver bench so changes can be measured
 * in a tight loop, and dumps `.explain("formatted")` plans for the
 * committed evidence under plans/r07/.
 *
 * Usage:
 *   sbt "runMain graft.BenchExtra [--plans DIR SUFFIX] [--runs N] [q_a q_b ...]"
 *
 * With no query names, all catalog queries run (q_dedup_cc included).
 * Timing methodology matches graft.Bench: same session shape
 * (local[$SPARK_GRAFT_CPUS], shuffle.partitions = cpus, AQE on), one
 * untimed warmup per query, then min of `--runs` timed `.count()`
 * passes. `--plans plans/r07 before` additionally writes
 * plans/r07/<query>_before.txt with the formatted physical plan.
 * Results also land as JSON in bench_extra_result.json (never in
 * bench_result.json — the driver artifact stays untouched).
 */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    var plansDir: Option[String] = None
    var suffix = "before"
    var runs = 2
    val names = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--plans" => plansDir = Some(args(i + 1)); suffix = args(i + 2); i += 3
        case "--runs" => runs = args(i + 1).toInt; i += 2
        case q => names += q; i += 1
      }
    }
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val all = SparkEntry.queries
    val selected =
      if (names.isEmpty) all.toSeq.sortBy(_._1)
      else names.toSeq.map(n => n -> all.getOrElse(n,
        throw new IllegalArgumentException(s"unknown query $n")))

    val results = selected.map { case (name, fn) =>
      spark.sparkContext.setJobDescription(s"bench-extra: $name")
      plansDir.foreach { dir =>
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
        val plan = fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.ExtendedMode)
        val formatted = fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(dir, s"${name}_$suffix.txt"),
          formatted + "\n\n---- extended ----\n" + plan)
      }
      def once(): Double = {
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case e: Throwable =>
          System.err.println(s"$name FAILED: ${e.getMessage}") }
        (System.nanoTime() - t0) / 1e9
      }
      once() // warmup (codegen + JIT)
      val t = Seq.fill(runs)(once()).min
      println(f"BENCHX $name%-26s $t%8.3f s")
      name -> t
    }
    val json = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"queries":$json,"total_sec":$total,"sf":"$sfDir"}""")
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("bench_extra_result.json"),
      s"""{"queries":$json,"total_sec":$total,"sf":"$sfDir"}""" + "\n")
    catch { case _: Exception => () }
    spark.stop()
  }
}
