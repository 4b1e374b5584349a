package graft

import graft.geo.{MapUnits, TileRect}
import graft.index.TileIndex
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

class IndexSpec extends AnyFunSuite {

  /** random non-overlapping-ish rect set + random probes, checked
    * against the brute-force contains scan. */
  private def check(tiles: Array[TileRect], overlap: Int, probes: Seq[(Int, Int)]): Unit = {
    val idx = new TileIndex(tiles, overlap)
    probes.foreach { case (lat, lon) =>
      val got = idx.probe(lat, lon).toSeq
      val want = tiles.indices.filter(i => tiles(i).extended(overlap).contains(lat, lon))
      assert(got === want, s"probe($lat,$lon)")
    }
  }

  test("probe matches brute force on a regular grid of tiles") {
    val tiles = (for (r <- 0 until 4; c <- 0 until 6) yield TileRect(
      -400000 + r * 200000, -600000 + c * 200000,
      -400000 + (r + 1) * 200000, -600000 + (c + 1) * 200000)).toArray
    val rnd = new Random(7)
    val probes = Seq.fill(2000)((rnd.nextInt(1600000) - 800000, rnd.nextInt(2400000) - 1200000)) ++
      // exact corner + edge probes: closed boundaries match multiple tiles
      Seq((-200000, -200000), (-400000, -600000), (0, 0), (400000, 600000))
    check(tiles, 0, probes)
    check(tiles, 2000, probes)
    // a point on an interior corner belongs to 4 tiles
    val idx = new TileIndex(tiles, 0)
    assert(idx.probe(-200000, -200000).length === 4)
  }

  test("probe matches brute force on random overlapping rects") {
    val rnd = new Random(42)
    for (trial <- 0 until 5) {
      val tiles = Array.fill(30 + rnd.nextInt(50)) {
        val lat = rnd.nextInt(4000000) - 2000000
        val lon = rnd.nextInt(8000000) - 4000000
        TileRect(lat, lon, lat + 1000 + rnd.nextInt(800000), lon + 1000 + rnd.nextInt(800000))
      }
      val union = tiles.reduce(_ union _)
      val probes = Seq.fill(3000)((
        union.minLat + rnd.nextInt(union.height + 2000) - 1000,
        union.minLon + rnd.nextInt(union.width + 2000) - 1000))
      check(tiles, 0, probes)
      check(tiles, 5000, probes)
    }
  }

  test("many small clustered tiles trigger sub-grids and stay correct") {
    val rnd = new Random(11)
    // 400 tiny tiles inside one 100k x 100k region => top cells see > MaxTests
    val tiles = Array.fill(400) {
      val lat = rnd.nextInt(100000)
      val lon = rnd.nextInt(100000)
      TileRect(lat, lon, lat + 5000, lon + 5000)
    } ++ Array(TileRect(-4000000, -4000000, 4000000, 4000000))
    val probes = Seq.fill(3000)((rnd.nextInt(120000) - 10000, rnd.nextInt(120000) - 10000))
    check(tiles, 0, probes)
  }

  test("probeRect matches the brute-force rect-intersect scan") {
    val rnd = new Random(31)
    for (trial <- 0 until 5) {
      val tiles = Array.fill(30 + rnd.nextInt(60)) {
        val lat = rnd.nextInt(4000000) - 2000000
        val lon = rnd.nextInt(8000000) - 4000000
        TileRect(lat, lon, lat + 1000 + rnd.nextInt(800000), lon + 1000 + rnd.nextInt(800000))
      }
      val idx = new TileIndex(tiles, 0)
      val union = tiles.reduce(_ union _)
      // query rects: tiny, mid-size, huge (forces the all-members
      // fallback), fully outside, and exactly a tile's own rect
      // (shared-edge closed semantics)
      val rects = Seq.fill(800) {
        val lat = union.minLat + rnd.nextInt(union.height + 2000000) - 1000000
        val lon = union.minLon + rnd.nextInt(union.width + 2000000) - 1000000
        TileRect(lat, lon, lat + rnd.nextInt(3000000), lon + rnd.nextInt(3000000))
      } ++ tiles.take(10).toSeq ++ Seq(
        TileRect(union.maxLat + 10, union.maxLon + 10,
          union.maxLat + 20, union.maxLon + 20),
        union.extended(1000000))
      rects.foreach { q =>
        val got = idx.probeRect(q.minLat, q.minLon, q.maxLat, q.maxLon).toSeq
        val want = tiles.indices.filter(i => tiles(i).intersects(q))
        assert(got === want, s"probeRect($q) trial $trial")
      }
    }
  }

  test("probeSegment matches the brute-force crossing scan") {
    val rnd = new Random(37)
    def crosses(t: TileRect, x1: Int, y1: Int, x2: Int, y2: Int): Boolean = {
      val bbox = math.min(x1, x2) <= t.maxLon && math.max(x1, x2) >= t.minLon &&
        math.min(y1, y2) <= t.maxLat && math.max(y1, y2) >= t.minLat
      bbox && {
        val dx = (x2 - x1).toLong
        val dy = (y2 - y1).toLong
        def cr(cx: Int, cy: Int): Long = dx * (cy - y1) - dy * (cx - x1)
        val cs = Seq(cr(t.minLon, t.minLat), cr(t.minLon, t.maxLat),
          cr(t.maxLon, t.minLat), cr(t.maxLon, t.maxLat))
        cs.min <= 0 && cs.max >= 0
      }
    }
    for (trial <- 0 until 5) {
      val tiles = Array.fill(30 + rnd.nextInt(60)) {
        val lat = rnd.nextInt(4000000) - 2000000
        val lon = rnd.nextInt(8000000) - 4000000
        TileRect(lat, lon, lat + 1000 + rnd.nextInt(800000), lon + 1000 + rnd.nextInt(800000))
      }
      val idx = new TileIndex(tiles, 0)
      val union = tiles.reduce(_ union _)
      // segments: short, long diagonals across many cells, axis-
      // aligned along shared edges, and degenerate points
      val segs = Seq.fill(800) {
        val y1 = union.minLat + rnd.nextInt(union.height + 2000000) - 1000000
        val x1 = union.minLon + rnd.nextInt(union.width + 2000000) - 1000000
        (x1, y1, x1 + rnd.nextInt(4000000) - 2000000,
          y1 + rnd.nextInt(4000000) - 2000000)
      } ++ tiles.take(10).toSeq.map(t => (t.minLon, t.minLat, t.maxLon, t.minLat)) ++
        Seq((union.minLon, union.minLat, union.minLon, union.minLat))
      segs.foreach { case (x1, y1, x2, y2) =>
        val got = idx.probeSegment(x1, y1, x2, y2).toSeq
        val want = tiles.indices.filter(i => crosses(tiles(i), x1, y1, x2, y2))
        assert(got === want, s"probeSegment($x1,$y1,$x2,$y2) trial $trial")
      }
    }
  }

  test("ring-search nearest matches the brute-force scan exactly") {
    val rnd = new Random(19)
    for (trial <- 0 until 5) {
      val tiles = Array.fill(40 + rnd.nextInt(60)) {
        val lat = rnd.nextInt(4000000) - 2000000
        val lon = rnd.nextInt(8000000) - 4000000
        TileRect(lat, lon, lat + 1000 + rnd.nextInt(600000), lon + 1000 + rnd.nextInt(600000))
      }
      val idx = new TileIndex(tiles, 0)
      val union = tiles.reduce(_ union _)
      // probes inside, on the fringe, and far outside the union bbox
      val probes = Seq.fill(2000)((
        union.minLat + rnd.nextInt(union.height + 4000000) - 2000000,
        union.minLon + rnd.nextInt(union.width + 4000000) - 2000000))
      probes.foreach { case (lat, lon) =>
        def d2(i: Int): Long = {
          val t = tiles(i)
          val dLat = math.max(0, math.max(t.minLat - lat, lat - t.maxLat)).toLong
          val dLon = math.max(0, math.max(t.minLon - lon, lon - t.maxLon)).toLong
          dLat * dLat + dLon * dLon
        }
        val want = tiles.indices.minBy(i => (d2(i), i))
        assert(idx.nearestTile(lat, lon) === want, s"nearest($lat,$lon) trial $trial")
      }
    }
  }

  test("nearest fallback is total and picks the closest rect") {
    val tiles = Array(
      TileRect(0, 0, 100000, 100000),
      TileRect(0, 300000, 100000, 400000))
    val idx = new TileIndex(tiles, 0)
    assert(idx.probe(50000, 150000).isEmpty)
    assert(idx.probeOrNearest(50000, 150000).toSeq === Seq(0))
    assert(idx.probeOrNearest(50000, 280000).toSeq === Seq(1))
    assert(idx.probeOrNearest(-999999, 200000).toSeq === Seq(0)) // tie -> lowest id
    assert(idx.probeOrNearest(50000, 50000).toSeq === Seq(0)) // inside: no fallback
  }

  test("planet-scale tile counts stay cheap to probe") {
    // 10k tiles tiling a planet-wide band: index must stay shallow
    val tiles = (for (r <- 0 until 50; c <- 0 until 200) yield {
      val h = MapUnits.toMapUnit(120) / 50
      val w = MapUnits.toMapUnit(360) / 200
      TileRect(MapUnits.toMapUnit(-60) + r * h, MapUnits.toMapUnit(-180) + c * w,
        MapUnits.toMapUnit(-60) + (r + 1) * h, MapUnits.toMapUnit(-180) + (c + 1) * w)
    }).toArray
    val idx = new TileIndex(tiles, 0)
    assert(idx.maxCompares <= TileIndex.MaxTests + 1,
      s"probe cost ${idx.maxCompares} too high")
    val rnd = new Random(3)
    val probes = Seq.fill(500)((rnd.nextInt(2 * MapUnits.toMapUnit(60)) - MapUnits.toMapUnit(60),
      rnd.nextInt(2 * MapUnits.toMapUnit(180)) - MapUnits.toMapUnit(180)))
    check(tiles, 0, probes)
  }
}
