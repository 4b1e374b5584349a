package graft

import graft.geo.TileRect
import graft.solver.IterativeSplitter
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class IterativeSplitterSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_iter").toString

  private def cellsOf(pts: Seq[(Int, Int)], bounds: TileRect, res: Int) = {
    import spark.implicits._
    val shift = 24 - res
    pts.map { case (lat, lon) =>
      ((lon - bounds.minLon) >>> shift, (lat - bounds.minLat) >>> shift)
    }.groupBy(identity).map { case ((x, y), g) => (x, y, g.size.toLong) }
      .toSeq.toDF("cell_x", "cell_y", "cnt")
  }

  test("iterative split: invariants at scale shape") {
    val pts = TestSurfaces.pointsClustered(30000)
    val bounds = TestSurfaces.Window.roundedTo(13)
    val cells = cellsOf(pts, bounds, 13)
    val maxNodes = 2000L
    val it = new IterativeSplitter(spark, bounds, 13, maxNodes, tmp())
    val tiles = it.split(cells)
    assert(tiles.nonEmpty)
    tiles.foreach { t =>
      assert(t.minLat % 2048 === 0 && t.minLon % 2048 === 0, s"align $t")
      assert(t.verify)
    }
    for (i <- tiles.indices; j <- i + 1 until tiles.size)
      assert(!tiles(i).overlaps(tiles(j)), s"overlap ${tiles(i)} ${tiles(j)}")
    def countIn(r: TileRect): Long = pts.count { case (lat, lon) =>
      lat >= r.minLat && lat < r.maxLat && lon >= r.minLon && lon < r.maxLon
    }
    // coverage + partition
    assert(tiles.map(countIn).sum === pts.size.toLong)
    // capacity unless single cell
    tiles.foreach { t =>
      val c = countIn(t)
      assert(c <= maxNodes || (t.width <= 2048 && t.height <= 2048),
        s"tile $t holds $c")
    }
  }

  test("kill + resume reproduces the identical tiling") {
    val pts = TestSurfaces.pointsUniform(10000)
    val bounds = TestSurfaces.Window.roundedTo(13)
    val cells = cellsOf(pts, bounds, 13)
    val dir = tmp()
    val full = new IterativeSplitter(spark, bounds, 13, 1000L, dir).split(cells)
    // simulate a kill after round 2: drop all later checkpoints and rerun
    val d = new java.io.File(dir)
    d.listFiles().foreach { f =>
      val m = """round_(\d+)\.json""".r.findFirstMatchIn(f.getName)
      if (m.exists(_.group(1).toInt > 2)) f.delete()
    }
    val resumed = new IterativeSplitter(spark, bounds, 13, 1000L, dir).split(cells)
    assert(resumed.toSet === full.toSet)
    // metrics lineage exists
    assert(new java.io.File(s"$dir/metrics.jsonl").exists())
  }
}
