package graft

import graft.model.InterleavedCorpus
import graft.pipeline.{SplitConfig, SplitPipeline}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PipelineSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft_test").toString

  test("end-to-end split + assignment on the synthetic corpus") {
    val docs = InterleavedCorpus.synthesize(spark, 10000, partitions = 4).cache()
    val cfg = SplitConfig(maxNodes = 1000L, trim = true)
    val out = tmpDir()
    val res = SplitPipeline.run(spark, docs, cfg, out)

    assert(res.areas.nonEmpty)
    // tiles aligned + disjoint
    res.areas.foreach(a => assert(a.rect.minLat % 2048 === 0 && a.rect.minLon % 2048 === 0))
    for (i <- res.areas.indices; j <- i + 1 until res.areas.size)
      assert(!res.areas(i).rect.overlaps(res.areas(j).rect))

    // assignment totality: every doc in >= 1 tile (kNN fallback on)
    val nDocs = docs.count()
    val distinctAssigned = res.assigned.select("doc_id").distinct().count()
    assert(distinctAssigned === nDocs, "every doc must land in >= 1 tile")

    // per-tile counts <= maxNodes (+ border duplication can only add docs
    // on edges; interior semantics checked at the solver level)
    val counts = res.assigned.groupBy("map_id").count().collect()
    assert(counts.nonEmpty)

    // span-sequence fingerprint survives the pipeline (dedup rows first:
    // border docs legitimately appear in several tiles)
    val inFp = InterleavedCorpus.corpusFingerprint(docs)
    val outFp = InterleavedCorpus.corpusFingerprint(
      res.assigned.select("doc_id", "spans").dropDuplicates("doc_id"))
    assert(inFp === outFp, "span sequences must survive every shuffle")

    // checkpoint artifacts exist
    assert(new java.io.File(s"$out/areas.list").exists())
    assert(new java.io.File(s"$out/densities.txt").exists())
    assert(new java.io.File(s"$out/template.args").exists())
  }

  test("resume from checkpoint reproduces identical areas.list") {
    val docs = InterleavedCorpus.synthesize(spark, 5000, partitions = 4)
    val cfg = SplitConfig(maxNodes = 500L)
    val out1 = tmpDir()
    val r1 = SplitPipeline.run(spark, docs, cfg, out1)
    // second run resumes from the existing areas.list (solve skipped)
    val r2 = SplitPipeline.run(spark, docs, cfg, out1)
    assert(r1.areas.map(a => (a.mapId, a.rect)) === r2.areas.map(a => (a.mapId, a.rect)))
    // fresh run from scratch agrees too (determinism)
    val out2 = tmpDir()
    val r3 = SplitPipeline.run(spark, docs, cfg, out2)
    assert(r1.areas.map(_.rect) === r3.areas.map(_.rect))
  }

  test("result is invariant to input partitioning (parallelism proxy)") {
    val cfg = SplitConfig(maxNodes = 800L)
    val d2 = InterleavedCorpus.synthesize(spark, 8000, partitions = 2)
    val d8 = InterleavedCorpus.synthesize(spark, 8000, partitions = 8)
    val r2 = SplitPipeline.run(spark, d2, cfg, tmpDir())
    val r8 = SplitPipeline.run(spark, d8, cfg, tmpDir())
    assert(r2.areas.map(_.rect) === r8.areas.map(_.rect))
    val c2 = r2.assigned.groupBy("map_id").count().orderBy("map_id").collect().toSeq
    val c8 = r8.assigned.groupBy("map_id").count().orderBy("map_id").collect().toSeq
    assert(c2 === c8)
  }

  test("partitioned per-tile write (K1 analog) round trips") {
    val docs = InterleavedCorpus.synthesize(spark, 3000, partitions = 4)
    val cfg = SplitConfig(maxNodes = 400L)
    val res = SplitPipeline.run(spark, docs, cfg, tmpDir())
    val outDir = tmpDir() + "/tiles"
    graft.assign.TileAssigner.writePartitioned(
      res.assigned.withColumn("version", lit(7)), outDir, versionPolicy = "fake")
    val back = spark.read.parquet(outDir)
    assert(back.count() === res.assigned.count())
    // one directory per tile, version policy applied
    val dirs = new java.io.File(outDir).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("map_id="))
    assert(dirs.length === res.assigned.select("map_id").distinct().count())
    assert(back.select("version").distinct().collect().map(_.getInt(0)).toSeq === Seq(1))
    // per-tile row counts survive the write
    val before = res.assigned.groupBy("map_id").count().collect()
      .map(r => (r.getInt(0), r.getLong(1))).toMap
    val after = back.groupBy("map_id").count().collect()
      .map(r => (r.getInt(0), r.getLong(1))).toMap
    assert(before === after)
  }

  test("named-polygon split separates distinct and shared parts") {
    import graft.solver.{NamedPolygon, NamedPolygonSplit}
    val pts = TestSurfaces.pointsUniform(20000)
    val grid = TestSurfaces.gridOf(pts, 12)
    val b = grid.bounds
    def rectPoly(minLat: Int, minLon: Int, maxLat: Int, maxLon: Int) = {
      val p = new java.awt.Polygon()
      p.addPoint(minLon, minLat); p.addPoint(minLon, maxLat)
      p.addPoint(maxLon, maxLat); p.addPoint(maxLon, minLat)
      new java.awt.geom.Area(p)
    }
    val midLon = b.minLon + b.width / 2
    // west and east halves overlapping in a central band
    val west = NamedPolygon("west", rectPoly(b.minLat, b.minLon, b.maxLat, midLon + b.width / 8))
    val east = NamedPolygon("east", rectPoly(b.minLat, midLon - b.width / 8, b.maxLat, b.maxLon))
    val parts = NamedPolygonSplit.split(grid, Seq(west, east), 4000)
    val names = parts.map(_._1)
    assert(names.contains("west") && names.contains("east"))
    assert(names.exists(_.contains(" and ")), s"no shared part in $names")
    // tiles across all parts stay disjoint
    val all = parts.flatMap(_._2)
    for (i <- all.indices; j <- i + 1 until all.size)
      assert(!all(i).overlaps(all(j)), s"${all(i)} overlaps ${all(j)}")
  }

  test("interleaved corpus invariants: offsets are array positions") {
    val docs = InterleavedCorpus.synthesize(spark, 1000, partitions = 2)
    val bad = docs.select(explode(col("spans")).as("s"), col("doc_id"))
      .select(col("s.kind"), col("s.text"), col("s.media_ref"), col("s.offset"))
      .where(
        (col("kind") === "text" && (length(col("text")) === 0 || length(col("media_ref")) > 0)) ||
          (col("kind") =!= "text" && (length(col("media_ref")) === 0 || length(col("text")) > 0)))
      .count()
    assert(bad === 0)
    val badOffsets = docs.select(
      forall(zip_with(col("spans"), sequence(lit(0), size(col("spans")) - 1),
        (s, i) => s.getField("offset") === i), identity).as("ok"))
      .where(!col("ok")).count()
    assert(badOffsets === 0)
  }
}
