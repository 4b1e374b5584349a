package graft

import graft.density.DensityGrid
import graft.geo.TileRect
import graft.solver.BspSolver
import org.scalatest.funsuite.AnyFunSuite

class SolverSpec extends AnyFunSuite {

  private def solve(grid: DensityGrid, maxNodes: Long, trim: Boolean = true,
                    searchLimit: Int = BspSolver.DefaultSearchLimit): List[TileRect] = {
    val s = new BspSolver(grid, searchLimit)
    s.maxNodes = maxNodes
    s.trimShape = trim
    s.split()
  }

  /** brute-force per-rect count straight from the points (half-open on
    * max edges, matching grid-cell membership of interior tiles). */
  private def countIn(r: TileRect, pts: Seq[(Int, Int)]): Long =
    pts.count { case (lat, lon) =>
      lat >= r.minLat && lat < r.maxLat && lon >= r.minLon && lon < r.maxLon
    }

  // per-mode configs: hotcell has a single cell at 3x maxNodes, which is
  // provably unsolvable at high minNodes with AR < 4 — the search must
  // exhaust its budget before relaxing, so it runs with a small
  // search-limit (the reference's --search-limit escape hatch);
  // clustered (gaussian cities over a planet-wide sparse background)
  // runs at res 12 to keep the suite fast.
  private val configs = Seq(
    ("uniform", 13, 2000L, BspSolver.DefaultSearchLimit),
    ("clustered", 12, 2000L, BspSolver.DefaultSearchLimit),
    ("hotcell", 13, 2000L, 20000),
    ("banded", 13, 2000L, BspSolver.DefaultSearchLimit))

  for ((mode, res, maxNodes, limit) <- configs) {
    val pts = TestSurfaces.all(20000)(mode)
    val grid = TestSurfaces.gridOf(pts, res)
    val align = 1 << (24 - res)

    test(s"$mode: split invariants hold") {
      val tiles = solve(grid, maxNodes, searchLimit = limit)
      assert(tiles.nonEmpty)
      // 1. aligned to 2^shift
      tiles.foreach { t =>
        assert(t.minLat % align === 0 && t.maxLat % align === 0, s"lat align $t")
        assert(t.minLon % align === 0 && t.maxLon % align === 0, s"lon align $t")
        assert(t.verify)
      }
      // 2. pairwise non-overlapping interiors
      for (i <- tiles.indices; j <- i + 1 until tiles.size)
        assert(!tiles(i).overlaps(tiles(j)), s"overlap ${tiles(i)} ${tiles(j)}")
      // 3. every point covered
      val lost = pts.filterNot { case (lat, lon) =>
        tiles.exists(t => lat >= t.minLat && lat < t.maxLat &&
          lon >= t.minLon && lon < t.maxLon)
      }
      assert(lost.isEmpty, s"${lost.size} points uncovered, e.g. ${lost.take(3)}")
      // 4. per-tile count <= maxNodes unless single grid cell
      tiles.foreach { t =>
        val c = countIn(t, pts)
        val singleCell = t.width <= align && t.height <= align
        assert(c <= maxNodes || singleCell, s"tile $t holds $c > $maxNodes")
      }
      // 5. total count preserved (tiles partition the point set)
      assert(tiles.map(countIn(_, pts)).sum === pts.size)
    }
  }

  test("bugCompatTrim keeps every split invariant (quirk-parity mode)") {
    // the reference's TOP-side slip (Solution.java:242-243) only
    // changes how far top tiles shrink; coverage, disjointness and
    // counts must all survive with the quirk replicated
    val pts = TestSurfaces.pointsClustered(20000)
    val grid = TestSurfaces.gridOf(pts, 12)
    val s = new BspSolver(grid)
    s.maxNodes = 2000L
    s.trimShape = true
    s.bugCompatTrim = true
    val tiles = s.split()
    assert(tiles.nonEmpty)
    for (i <- tiles.indices; j <- i + 1 until tiles.size)
      assert(!tiles(i).overlaps(tiles(j)))
    val lost = pts.filterNot { case (lat, lon) =>
      tiles.exists(t => lat >= t.minLat && lat < t.maxLat &&
        lon >= t.minLon && lon < t.maxLon)
    }
    assert(lost.isEmpty)
    assert(tiles.map(countIn(_, pts)).sum === pts.size)
  }

  test("split is deterministic across repeated runs") {
    val pts = TestSurfaces.pointsClustered(20000)
    val t1 = solve(TestSurfaces.gridOf(pts, 12), 2000L)
    val t2 = solve(TestSurfaces.gridOf(pts, 12), 2000L)
    assert(t1 === t2)
  }

  test("hotcell: single overflowing cell becomes its own tile") {
    val pts = TestSurfaces.pointsHotcell(20000)
    val tiles = solve(TestSurfaces.gridOf(pts, 13), 2000L, searchLimit = 20000)
    val over = tiles.filter(countIn(_, pts) > 2000)
    assert(over.nonEmpty)
    over.foreach(t => assert(t.width <= 2048 && t.height <= 2048,
      s"oversized tile $t is not a single cell"))
  }

  test("num-tiles bisection yields the requested tile count") {
    val pts = TestSurfaces.pointsUniform(20000)
    val grid = TestSurfaces.gridOf(pts, 13)
    val s = new BspSolver(grid)
    s.trimShape = true
    val tiles = s.splitIntoTiles(8)
    assert(tiles.size === 8, s"wanted 8 tiles got ${tiles.size}")
  }

  test("empty-cluster detection separates the two bands") {
    val pts = TestSurfaces.pointsBanded(20000)
    val tiles = solve(TestSurfaces.gridOf(pts, 13), 2000L)
    val gapLo = graft.geo.MapUnits.toMapUnit(-40)
    val gapHi = graft.geo.MapUnits.toMapUnit(40)
    tiles.foreach { t =>
      assert(!(t.minLat < gapLo && t.maxLat > gapHi),
        s"tile $t spans the empty gap")
    }
  }

  test("tiny input produces a single tile") {
    val pts = Seq((1000, 1000), (1500, 1500), (2000, 2000))
    val tiles = solve(TestSurfaces.gridOf(pts), 100L, trim = false)
    assert(tiles.size === 1)
    assert(countIn(tiles.head, pts) === 3)
  }

  test("single-cell overflow terminal on a constructed grid") {
    val b = TileRect(0, 0, 3 * 2048, 3 * 2048)
    val g = new DensityGrid(b, 13)
    for (x <- 0 until 3; y <- 0 until 3) g.addToCell(x, y, if (x == 1 && y == 1) 30 else 1)
    val s = new BspSolver(g)
    s.maxNodes = 10
    val tiles = s.split()
    // the hot center cell must be isolated as a single-cell tile
    val hot = tiles.find(t => t.contains(1 * 2048 + 1, 1 * 2048 + 1) &&
      t.width == 2048 && t.height == 2048)
    assert(hot.isDefined, s"hot cell not isolated in $tiles")
  }
}
