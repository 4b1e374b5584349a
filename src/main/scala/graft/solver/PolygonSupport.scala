package graft.solver

import graft.density.DensityGrid
import graft.geo.TileRect
import java.awt.Rectangle
import java.awt.geom.{Area => AwtArea}

/**
 * Polygon-constrained splitting (the `--polygon-file` mode): raster a
 * bounding polygon onto the density grid, then solve with the
 * polygon-aware terminal rules already built into [[BspSolver]] /
 * [[GridTile]] (outside-polygon tiles are free, tiles >50% outside
 * are rejected, trim is polygon-aware).
 *
 * Reference: `DensityMap.rasterPolygon:66-107`,
 * `SplittableDensityArea.split(java.awt.geom.Area):173-192`. The
 * reference additionally slices non-rectangular rasters at polygon
 * vertices before solving (`findSolutionWithSinglePolygon:517-578`) —
 * a search-speed optimization; this engine relies on the same
 * terminal predicates for the same output guarantees.
 */
object PolygonSupport {

  /** awt polygon (x = lon, y = lat, map units) from rings. */
  def polygonOf(rings: Seq[(Seq[(Int, Int)], Boolean)]): AwtArea = {
    val area = new AwtArea()
    rings.foreach { case (ring, outer) =>
      val p = new java.awt.Polygon()
      ring.foreach { case (lat, lon) => p.addPoint(lon, lat) }
      if (outer) area.add(new AwtArea(p)) else area.subtract(new AwtArea(p))
    }
    area
  }

  /** Mark every grid cell whose rect intersects the polygon
    * (bit index x * height + y, the [[SolverGrid]] layout). */
  def rasterToGrid(poly: AwtArea, grid: DensityGrid): java.util.BitSet = {
    val bits = new java.util.BitSet(grid.width * grid.height)
    val bbox = poly.getBounds
    val cell = 1 << grid.shift
    val x0 = math.max(0, grid.lonToCellX(math.max(bbox.x, grid.bounds.minLon)))
    val x1 = math.min(grid.width - 1,
      grid.lonToCellX(math.min(bbox.x + bbox.width, grid.bounds.maxLon - 1)))
    val y0 = math.max(0, grid.latToCellY(math.max(bbox.y, grid.bounds.minLat)))
    val y1 = math.min(grid.height - 1,
      grid.latToCellY(math.min(bbox.y + bbox.height, grid.bounds.maxLat - 1)))
    var x = x0
    while (x <= x1) {
      val lon = grid.cellToLon(x)
      var y = y0
      while (y <= y1) {
        if (poly.intersects(lon, grid.cellToLat(y), cell, cell))
          bits.set(x * grid.height + y)
        y += 1
      }
      x += 1
    }
    bits
  }

  /**
   * Solve a polygon-constrained split: tiles cover all data inside
   * the polygon; tiles mostly outside are never emitted. By default
   * the solver first slices the rastered polygon at its vertices into
   * rectangular sub-problems (V9, reference
   * `findSolutionWithSinglePolygon:517-578`) and falls back to the
   * polygon-aware terminal-predicate search when slicing does not
   * apply. Returns tile rects clipped to the polygon bbox where the
   * clip stays rectangular (reference `getAreas:914-921`).
   */
  def split(grid: DensityGrid, poly: AwtArea, maxNodes: Long,
            searchLimit: Int = BspSolver.DefaultSearchLimit,
            vertexSlicing: Boolean = true): List[TileRect] = {
    val bits = rasterToGrid(poly, grid)
    val solver = new BspSolver(grid, searchLimit)
    solver.maxNodes = maxNodes
    (if (vertexSlicing) solver.splitPolygonSliced(bits)
     else solver.splitConstrained(Some(bits))).map { r =>
      // clip each tile back to the polygon where the intersection is
      // still a rectangle (grid-aligned tiles overhang unaligned
      // polygon edges otherwise) — reference `getAreas:914-921`
      val cut = new AwtArea(new Rectangle(r.minLon, r.minLat, r.width, r.height))
      cut.intersect(poly)
      if (!cut.isEmpty && cut.isRectangular) {
        val b = cut.getBounds
        TileRect(b.y, b.x, b.y + b.height, b.x + b.width)
      } else r
    }
  }
}
