package graft.index

import graft.geo.TileRect

/**
 * Point -> candidate-tiles spatial index, built once on the driver
 * from the solved tile rectangles and broadcast to executors; the
 * probe is the build side of a broadcast spatial join.
 *
 * Structure: a flat top grid (default 512 x 512) over the union bbox
 * of all (overlap-extended) tiles. Each grid cell stores the tiles
 * whose extended rect intersects it plus a `testNeeded` bit — clear
 * when every candidate fully contains the cell, so the per-point
 * rectangle tests can be skipped. Cells with more than [[TileIndex.MaxTests]]
 * candidates get a nested sub-grid (reference `AreaGrid.java:26-235`).
 *
 * Closed-boundary `contains` means points exactly on a shared tile
 * edge match BOTH tiles — required duplication semantics.
 *
 * @param tiles    solved tile rectangles, index == tile id
 * @param overlap  padding in map units applied to every tile before
 *                 matching (splitter `--overlap`)
 */
final class TileIndex(val tiles: Array[TileRect], val overlap: Int)
  extends Serializable {

  import TileIndex._

  val extended: Array[TileRect] = tiles.map(_.extended(overlap))

  private val root: Grid = new Grid(extended.indices.toArray, None, TopDim)

  /** Tile ids whose (extended) rect contains the point, ascending;
    * empty when none. */
  def probe(lat: Int, lon: Int): Array[Int] = root.probe(lat, lon)

  /**
   * Probe with nearest-tile fallback: a point inside no tile is
   * assigned to the tile with the smallest squared distance to its
   * (non-extended) rect (ties -> lowest id), so assignment is total —
   * where the reference silently dropped such points
   * (`SplitProcessor.writeNode:263-265`).
   */
  def probeOrNearest(lat: Int, lon: Int): Array[Int] = {
    val hit = probe(lat, lon)
    if (hit.nonEmpty) hit else Array(nearestTile(lat, lon))
  }

  /**
   * Tile ids whose (extended) rect intersects the closed query rect,
   * ascending — the J4 bbox-join probe. Candidates come from the grid
   * cells the query rect covers (cell-bucketing, reference
   * `AreaGrid.java:213-233` consumed by
   * `MultiTileProcessor.checkBoundingBox:596-608`); the exact closed
   * rect-intersection test then filters, so the result equals a scan
   * over all tiles at a fraction of the cost.
   */
  def probeRect(minLat: Int, minLon: Int, maxLat: Int, maxLon: Int): Array[Int] = {
    val cand = root.candidatesInRect(minLat, minLon, maxLat, maxLon)
    filterSortedCandidates(cand, { i =>
      val e = extended(i)
      e.minLat <= maxLat && e.maxLat >= minLat &&
        e.minLon <= maxLon && e.maxLon >= minLon
    })
  }

  /**
   * Tile ids whose (extended) rect the closed segment crosses,
   * ascending — the J5 segment-join probe. Candidates come from the
   * cells covered by the segment's bounding box; the residual is the
   * exact integer predicate (bbox overlap AND the rect's corner
   * cross-products straddle zero), identical to
   * [[graft.assign.ProblemJoins.segmentIntersectsRect]] (reference
   * `MultiTileProcessor.addWritersOfCrossedTiles:669-675`).
   */
  def probeSegment(x1: Int, y1: Int, x2: Int, y2: Int): Array[Int] = {
    val cand = root.candidatesAlongSegment(x1, y1, x2, y2)
    val dx = (x2 - x1).toLong
    val dy = (y2 - y1).toLong
    filterSortedCandidates(cand, { i =>
      val e = extended(i)
      val bboxOverlap =
        math.min(x1, x2) <= e.maxLon && math.max(x1, x2) >= e.minLon &&
          math.min(y1, y2) <= e.maxLat && math.max(y1, y2) >= e.minLat
      bboxOverlap && {
        def cross(cx: Int, cy: Int): Long = dx * (cy - y1) - dy * (cx - x1)
        val c1 = cross(e.minLon, e.minLat)
        val c2 = cross(e.minLon, e.maxLat)
        val c3 = cross(e.maxLon, e.minLat)
        val c4 = cross(e.maxLon, e.maxLat)
        math.min(math.min(c1, c2), math.min(c3, c4)) <= 0 &&
          math.max(math.max(c1, c2), math.max(c3, c4)) >= 0
      }
    })
  }

  private def filterSortedCandidates(cand: Array[Int],
                                     keep: Int => Boolean): Array[Int] = {
    val out = new Array[Int](cand.length)
    var n = 0
    var i = 0
    while (i < cand.length) {
      if (keep(cand(i))) { out(n) = cand(i); n += 1 }
      i += 1
    }
    if (n == cand.length) cand else java.util.Arrays.copyOf(out, n)
  }

  /** Nearest tile by expanding-ring search over the top grid: scan
    * cells ring by ring outward from the probe's cell, tracking the
    * best exact (squared) rect distance, and stop once the next ring
    * provably cannot beat it — O(rings * candidates) instead of a
    * linear scan over all tiles. Semantics identical to the full
    * scan: smallest squared distance to the non-extended rect, ties
    * to the lowest id. */
  def nearestTile(lat: Int, lon: Int): Int = root.nearestByRings(lat, lon)

  private def rectDist2(i: Int, lat: Int, lon: Int): Long = {
    val t = tiles(i)
    val dLat = math.max(0, math.max(t.minLat - lat, lat - t.maxLat)).toLong
    val dLon = math.max(0, math.max(t.minLon - lon, lon - t.maxLon)).toLong
    dLat * dLat + dLon * dLon
  }

  /** Max rectangle tests any probe can need (diagnostics). */
  def maxCompares: Int = root.maxCompares

  /** Grow-only id accumulator with a sorted-distinct finish — shared
    * by the rect and segment candidate walks. */
  private final class IdCollector {
    private var buf = new Array[Int](16)
    private var n = 0
    def add(ids: Array[Int]): Unit = if (ids != null) {
      if (n + ids.length > buf.length)
        buf = java.util.Arrays.copyOf(buf,
          math.max(buf.length * 2, n + ids.length))
      System.arraycopy(ids, 0, buf, n, ids.length)
      n += ids.length
    }
    def sortedDistinct(): Array[Int] = {
      if (n == 0) return EmptyIds
      java.util.Arrays.sort(buf, 0, n)
      var w = 1
      var i = 1
      while (i < n) {
        if (buf(i) != buf(w - 1)) { buf(w) = buf(i); w += 1 }
        i += 1
      }
      java.util.Arrays.copyOf(buf, w)
    }
  }

  private final class Grid(val members: Array[Int], fixedBounds: Option[TileRect],
                           dim: Int) extends Serializable {
    private val bounds: TileRect = fixedBounds.getOrElse {
      members.map(extended).reduce(_ union _)
    }
    private val minLat = bounds.minLat
    private val minLon = bounds.minLon
    // ceil so dim*div covers the bounds
    private val divLat = math.max(1, (bounds.height + dim - 1) / dim)
    private val divLon = math.max(1, (bounds.width + dim - 1) / dim)

    // per cell: candidate ids (null = none), testNeeded bit, optional subgrid
    private val cellCand: Array[Array[Int]] = new Array((dim + 1) * (dim + 1))
    // all member ids per cell, even when the cell was subdivided —
    // the ring-based nearest search iterates these
    private val cellAll: Array[Array[Int]] = new Array((dim + 1) * (dim + 1))
    private val cellTest = new java.util.BitSet((dim + 1) * (dim + 1))
    private var subGrids: Array[Grid] = _
    var maxCompares: Int = 0

    locally {
      val buf = Array.fill((dim + 1) * (dim + 1))(List.empty[Int])
      members.foreach { id =>
        val e = extended(id)
        val x0 = math.max(0, (e.minLon - minLon) / divLon)
        val x1 = math.min(dim, (e.maxLon - minLon) / divLon)
        val y0 = math.max(0, (e.minLat - minLat) / divLat)
        val y1 = math.min(dim, (e.maxLat - minLat) / divLat)
        var cx = x0
        while (cx <= x1) {
          val cellMinLon = minLon + divLon * cx
          var cy = y0
          while (cy <= y1) {
            val cellMinLat = minLat + divLat * cy
            val k = cx * (dim + 1) + cy
            buf(k) = id :: buf(k)
            if (!e.contains(cellMinLat, cellMinLon) ||
              !e.contains(cellMinLat + divLat, cellMinLon + divLon))
              cellTest.set(k)
            cy += 1
          }
          cx += 1
        }
      }
      var k = 0
      while (k < buf.length) {
        if (buf(k).nonEmpty) {
          val ids = buf(k).toArray.sorted
          cellAll(k) = ids
          if (cellTest.get(k) && ids.length > MaxTests &&
            divLat > MinCellSize && divLon > MinCellSize && dim == TopDim) {
            val cx = k / (dim + 1)
            val cy = k % (dim + 1)
            val cellBounds = TileRect(
              minLat + divLat * cy, minLon + divLon * cx,
              minLat + divLat * (cy + 1), minLon + divLon * (cx + 1))
            if (subGrids == null) subGrids = new Array[Grid](buf.length)
            subGrids(k) = new Grid(ids, Some(cellBounds), SubDim)
            maxCompares = math.max(maxCompares, subGrids(k).maxCompares + 1)
          } else {
            cellCand(k) = ids
            if (cellTest.get(k)) maxCompares = math.max(maxCompares, ids.length)
          }
        }
        k += 1
      }
    }

    /** Expanding-ring nearest search (see [[TileIndex.nearestTile]]).
      * Ring r holds the cells at Chebyshev cell-distance r from the
      * probe's (clamped) cell; any point in a ring-r cell is at least
      * (r-1) * min(divLat, divLon) map units from the probe, so the
      * scan stops as soon as that lower bound squared exceeds the
      * best exact distance found (<=, not <, would break lowest-id
      * tie-breaking across rings). */
    def nearestByRings(lat: Int, lon: Int): Int = {
      val cx0 = math.min(dim, math.max(0, (lon - minLon) / divLon))
      val cy0 = math.min(dim, math.max(0, (lat - minLat) / divLat))
      val minDiv = math.min(divLat, divLon).toLong
      val maxRing = math.max(
        math.max(cx0, dim - cx0), math.max(cy0, dim - cy0))
      var best = -1
      var bestDist = Long.MaxValue
      var r = 0
      var done = false
      while (r <= maxRing && !done) {
        var cx = math.max(0, cx0 - r)
        val cxEnd = math.min(dim, cx0 + r)
        while (cx <= cxEnd) {
          val onVerticalEdge = cx == cx0 - r || cx == cx0 + r
          var cy = math.max(0, cy0 - r)
          val cyEnd = math.min(dim, cy0 + r)
          while (cy <= cyEnd) {
            if (onVerticalEdge || cy == cy0 - r || cy == cy0 + r) {
              val cand = cellAll(cx * (dim + 1) + cy)
              if (cand != null) {
                var i = 0
                while (i < cand.length) {
                  val d = rectDist2(cand(i), lat, lon)
                  if (d < bestDist || (d == bestDist && cand(i) < best)) {
                    bestDist = d
                    best = cand(i)
                  }
                  i += 1
                }
              }
            }
            cy += 1
          }
          cx += 1
        }
        if (best >= 0) {
          val lower = r.toLong * minDiv // lower bound for ring r+1
          if (lower * lower > bestDist) done = true
        }
        r += 1
      }
      best
    }

    /** Sorted distinct member ids of every cell the closed query rect
      * covers — a superset of the members intersecting it (each tile
      * is registered in all cells its extended rect touches, and the
      * intersection with the query lies in at least one such cell).
      * Recurses into sub-grids; a rect covering more than
      * [[TileIndex.MaxProbeCells]] cells falls back to all members of
      * this grid (still exact after the caller's residual test). */
    def candidatesInRect(minLat: Int, minLon: Int,
                         maxLat: Int, maxLon: Int): Array[Int] = {
      if (maxLat < bounds.minLat || minLat > bounds.maxLat ||
        maxLon < bounds.minLon || minLon > bounds.maxLon) return EmptyIds
      val x0 = math.max(0, (minLon - this.minLon) / divLon)
      val x1 = math.min(dim, math.max(0, (maxLon - this.minLon) / divLon))
      val y0 = math.max(0, (minLat - this.minLat) / divLat)
      val y1 = math.min(dim, math.max(0, (maxLat - this.minLat) / divLat))
      if ((x1 - x0 + 1).toLong * (y1 - y0 + 1) > MaxProbeCells) return members
      val out = new IdCollector
      var cx = x0
      while (cx <= x1) {
        var cy = y0
        while (cy <= y1) {
          val k = cx * (dim + 1) + cy
          if (subGrids != null && subGrids(k) != null)
            out.add(subGrids(k).candidatesInRect(minLat, minLon, maxLat, maxLon))
          else out.add(cellAll(k))
          cy += 1
        }
        cx += 1
      }
      out.sortedDistinct()
    }

    /** Sorted distinct member ids of the cells a segment actually
      * crosses — the "ring of cells" traversal: per covered cell
      * COLUMN, only the rows the segment's y-range spans inside that
      * column's x-slab (padded one map unit against float rounding,
      * so the cell set is a guaranteed superset of the crossed
      * cells). A long diagonal visits O(columns + rows) cells instead
      * of its whole bounding box. Near-vertical or narrow segments
      * fall back to the bbox walk, which is already tight there. */
    def candidatesAlongSegment(x1: Int, y1: Int,
                               x2: Int, y2: Int): Array[Int] = {
      val sMinLon = math.min(x1, x2)
      val sMaxLon = math.max(x1, x2)
      val sMinLat = math.min(y1, y2)
      val sMaxLat = math.max(y1, y2)
      if (sMaxLat < bounds.minLat || sMinLat > bounds.maxLat ||
        sMaxLon < bounds.minLon || sMinLon > bounds.maxLon) return EmptyIds
      val cx0 = math.max(0, (sMinLon - this.minLon) / divLon)
      val cx1 = math.min(dim, math.max(0, (sMaxLon - this.minLon) / divLon))
      if (cx1 - cx0 <= 2 || x1 == x2)
        return candidatesInRect(sMinLat, sMinLon, sMaxLat, sMaxLon)
      val slope = (y2 - y1).toDouble / (x2 - x1).toDouble
      val out = new IdCollector
      var cx = cx0
      while (cx <= cx1) {
        // closed slab [slabLo, slabHi], clamped to the segment x-range
        val slabLo = math.max(sMinLon.toDouble, minLon + divLon.toDouble * cx)
        val slabHi = math.min(sMaxLon.toDouble, minLon + divLon.toDouble * (cx + 1))
        val ya = y1 + (slabLo - x1) * slope
        val yb = y1 + (slabHi - x1) * slope
        // pad one map unit: absorbs double rounding so no crossed
        // cell can be excluded
        val yLo = math.max(sMinLat.toDouble, math.min(ya, yb) - 1.0)
        val yHi = math.min(sMaxLat.toDouble, math.max(ya, yb) + 1.0)
        val cy0 = math.max(0, ((yLo - minLat) / divLat).toInt)
        val cy1 = math.min(dim, math.max(0, ((yHi - minLat) / divLat).toInt))
        var cy = cy0
        while (cy <= cy1) {
          val k = cx * (dim + 1) + cy
          if (subGrids != null && subGrids(k) != null)
            out.add(subGrids(k).candidatesInRect(
              yLo.toInt - 1, slabLo.toInt - 1, yHi.toInt + 1, slabHi.toInt + 1))
          else out.add(cellAll(k))
          cy += 1
        }
        cx += 1
      }
      out.sortedDistinct()
    }

    def probe(lat: Int, lon: Int): Array[Int] = {
      if (!bounds.contains(lat, lon)) return EmptyIds
      val cx = (lon - minLon) / divLon
      val cy = (lat - minLat) / divLat
      val k = cx * (dim + 1) + cy
      if (subGrids != null && subGrids(k) != null) return subGrids(k).probe(lat, lon)
      val cand = cellCand(k)
      if (cand == null) EmptyIds
      else if (!cellTest.get(k)) cand
      else {
        val out = new Array[Int](cand.length)
        var n = 0
        var i = 0
        while (i < cand.length) {
          if (extended(cand(i)).contains(lat, lon)) { out(n) = cand(i); n += 1 }
          i += 1
        }
        if (n == cand.length) cand else java.util.Arrays.copyOf(out, n)
      }
    }
  }
}

object TileIndex {
  final val TopDim = 512
  final val SubDim = 32
  final val MaxTests = 10
  final val MinCellSize = 2048
  /** Rect probes covering more cells than this fall back to the full
    * member list (the residual predicate keeps the result exact). */
  final val MaxProbeCells = 4096
  private val EmptyIds = Array.emptyIntArray
}
