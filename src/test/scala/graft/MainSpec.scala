package graft

import graft.app.{Main, SplitterArgs}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/**
 * Arg-surface parity with the reference (`args/SplitterParams.java`,
 * `Main.java:408-460`): option names, defaults, validation errors and
 * the --stop-after phase hooks.
 */
class MainSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("defaults mirror SplitterParams") {
    val a = SplitterArgs.parse(Seq("in.parquet")).toOption.get
    assert(a.mapid === 63240001)
    assert(a.maxNodes === 1600000L)
    assert(a.resolution === 13)
    assert(a.keepComplete)
    assert(a.searchLimit === 200000)
    assert(a.stopAfter === "dist")
    assert(a.overlapAmount === 0, "keep-complete=true defaults overlap to 0")
    assert(a.inputs === Seq("in.parquet"))
  }

  test("keep-complete=false defaults overlap to 2000 (Main.java:432-449)") {
    val a = SplitterArgs.parse(Seq("--keep-complete=false", "x")).toOption.get
    assert(a.overlapAmount === 2000)
    val b = SplitterArgs.parse(
      Seq("--keep-complete=false", "--overlap=500", "x")).toOption.get
    assert(b.overlapAmount === 500)
  }

  test("validation rejects what the reference rejects") {
    assert(SplitterArgs.parse(Seq("--stop-after=nonsense")).swap.toOption.get
      .contains("--stop-after"))
    assert(SplitterArgs.parse(Seq("--search-limit=999")).swap.toOption.get
      .contains("--search-limit"))
    assert(SplitterArgs.parse(Seq("--resolution=25")).swap.toOption.get
      .contains("--resolution"))
    assert(SplitterArgs.parse(Seq("--overlap=-5")).swap.toOption.get
      .contains("--overlap"))
    assert(SplitterArgs.parse(Seq("--overlap=abc")).swap.toOption.get
      .contains("--overlap"), "non-numeric overlap must be a clean Left")
    assert(SplitterArgs.parse(Seq("--handle-element-version=maybe")).swap
      .toOption.get.contains("--handle-element-version"))
    assert(SplitterArgs.parse(Seq("--no-such-thing=1")).swap.toOption.get
      .contains("Unknown option"))
    assert(SplitterArgs.parse(Seq("--max-nodes=abc")).isLeft)
  }

  test("accepted-and-ignored legacy options parse cleanly") {
    val a = SplitterArgs.parse(Seq("--cache=x", "--mixed", "--max-areas=512",
      "--status-freq=0", "--max-threads=4", "in")).toOption.get
    assert(a.inputs === Seq("in"))
  }

  test("stop-after gates the phase chain and writes phase artifacts") {
    val out = java.nio.file.Files.createTempDirectory("graft_main").toString
    def argsFor(stop: String) = SplitterArgs.parse(Seq(
      s"--output-dir=$out", s"--stop-after=$stop", "--max-nodes=200",
      "--resolution=13", "--write-kml=areas.kml",
      "/root/testdata/sf0.001/documents.parquet")).toOption.get

    assert(Main.run(spark, argsFor("split")) === "split")
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$out/areas.list")))
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$out/template.args")))
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$out/areas.poly")))
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$out/areas.kml")))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$out/problem.list")))

    assert(Main.run(spark, argsFor("gen-problem-list")) === "gen-problem-list")
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$out/problem.list")))

    assert(Main.run(spark, argsFor("dist")) === "dist")
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$out/tiles")))
    val tiles = spark.read.parquet(s"$out/tiles")
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    // assignment totality: fan-out >= input (border duplication)
    assert(tiles.count() >= docs.count())
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$out/link_tiles.parquet")))
  }

  test("split-file reuse skips the solve and reuses the given areas") {
    val out = java.nio.file.Files.createTempDirectory("graft_main2").toString
    val first = SplitterArgs.parse(Seq(
      s"--output-dir=$out", "--stop-after=split", "--max-nodes=200",
      "/root/testdata/sf0.001/documents.parquet")).toOption.get
    Main.run(spark, first)
    val reused = java.nio.file.Files.createTempDirectory("graft_main3").toString
    val second = SplitterArgs.parse(Seq(
      s"--output-dir=$reused", s"--split-file=$out/areas.list",
      "--stop-after=split",
      "/root/testdata/sf0.001/documents.parquet")).toOption.get
    Main.run(spark, second)
    val a1 = graft.output.AreaWriters.readAreasList(s"$out/areas.list")
    val a2 = graft.output.AreaWriters.readAreasList(s"$reused/areas.list")
    assert(a1 === a2)
  }
}
