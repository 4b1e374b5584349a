package graft.solver

import graft.density.DensityGrid
import graft.geo.{MapUnits, TileRect}

/**
 * Read-optimized view over a [[DensityGrid]] for the BSP solver:
 * per-column and per-row PREFIX sums, so any tile row/column sum is
 * two array reads instead of an O(width) or O(height) scan — the
 * solver's inner loops (middle finders, valid-start/end scans, split
 * sums) all reduce to O(1) range queries over these arrays. Integer
 * addition is exact and associative, so every sum equals the value
 * the direct scan would produce and the search explores exactly the
 * same tree (reference `solver/EnhancedDensityMap.java:29-167` keeps
 * raw row/column vectors instead; the prefix form is the same data
 * after one pass).
 *
 * Latitude-dependent aspect-ratio factors are computed once, as in
 * the reference. Construction parallelizes across columns / row
 * blocks — results are written to disjoint arrays, so the outcome is
 * identical at any thread count.
 *
 * @param polygonCells optional rasterization of a bounding polygon:
 *   bit x * height + y set iff grid cell (x,y) intersects the polygon.
 */
final class SolverGrid(val grid: DensityGrid,
                       val polygonCells: Option[java.util.BitSet] = None) {
  val width: Int = grid.width
  val height: Int = grid.height
  val shift: Int = grid.shift
  val bounds: TileRect = grid.bounds

  /** colPref(x)(y) = sum of cells (x, 0..y-1); null column = empty. */
  private val colPref: Array[Array[Long]] = new Array[Array[Long]](width)
  /** rowPref(y)(x) = sum of cells (0..x-1, y); null row = empty. */
  private val rowPref: Array[Array[Long]] = new Array[Array[Long]](height)
  /** cos(lat) of each horizontal grid line, index 0..height inclusive. */
  val aspectFactor: Array[Double] = new Array[Double](height + 1)
  /** Row index of the grid line closest to the equator (largest factor). */
  val equatorPos: Int = {
    var maxF = Double.MinValue
    var pos = Int.MaxValue
    var i = 0
    while (i <= height) {
      val lat = bounds.minLat + i * (1 << shift)
      aspectFactor(i) = math.cos(math.toRadians(MapUnits.toDegrees(lat)))
      if (aspectFactor(i) > maxF) { maxF = aspectFactor(i); pos = i }
      i += 1
    }
    pos
  }

  var maxCellCount: Int = 0
  var maxCellCountInPolygon: Int = 0

  locally {
    // pass 1 (parallel over column chunks): column prefixes, per-cell
    // maxima, and which rows hold any data (idempotent boolean writes)
    val rowHasData = new Array[Boolean](height)
    val maxSeen = new java.util.concurrent.atomic.AtomicInteger(0)
    val maxSeenPoly = new java.util.concurrent.atomic.AtomicInteger(0)
    parallelChunks(width) { (x0, x1) =>
      var localMax = 0
      var localMaxPoly = 0
      var x = x0
      while (x < x1) {
        val src = grid.columnOrNull(x)
        if (src != null) {
          val pref = new Array[Long](height + 1)
          var acc = 0L
          var any = false
          var y = 0
          while (y < height) {
            val n = src(y)
            if (n > 0) {
              any = true
              rowHasData(y) = true
              if (n > localMax) localMax = n
              if (n > localMaxPoly && inPolygon(x, y)) localMaxPoly = n
            }
            acc += n
            pref(y + 1) = acc
            y += 1
          }
          if (any) colPref(x) = pref
        }
        x += 1
      }
      maxSeen.getAndAccumulate(localMax, math.max)
      maxSeenPoly.getAndAccumulate(localMaxPoly, math.max)
    }
    maxCellCount = maxSeen.get()
    maxCellCountInPolygon = maxSeenPoly.get()
    var y = 0
    while (y < height) {
      if (rowHasData(y)) rowPref(y) = new Array[Long](width + 1)
      y += 1
    }
    // pass 2 (parallel over row blocks): fill row prefixes by walking
    // the column-major storage once per block — blocked transpose, so
    // reads stay within a hot stripe of each column array
    parallelChunks(height) { (y0, y1) =>
      val accs = new Array[Long](y1 - y0)
      var x = 0
      while (x < width) {
        val src = grid.columnOrNull(x)
        var j = 0
        while (j < y1 - y0) {
          val p = rowPref(y0 + j)
          if (p != null) {
            if (src != null) accs(j) += src(y0 + j)
            p(x + 1) = accs(j)
          }
          j += 1
        }
        x += 1
      }
    }
  }

  /** Run `body(start, end)` over chunks of [0, n) on all cores;
    * callers write disjoint state only. */
  private def parallelChunks(n: Int)(body: (Int, Int) => Unit): Unit = {
    if (n <= 0) return
    val nt = math.max(1, math.min(Runtime.getRuntime.availableProcessors(), 16))
    val step = math.max((n + nt - 1) / nt, 1)
    if (nt == 1 || step >= n) { body(0, n); return }
    val failure = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    val threads = (0 until nt).flatMap { i =>
      val s = i * step
      val e = math.min(n, s + step)
      if (s < e) Some(new Thread(() =>
        try body(s, e)
        catch { case t: Throwable => failure.compareAndSet(null, t) }))
      else None
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    if (failure.get() != null) throw failure.get()
  }

  def totalCount: Long = grid.totalCount

  /** Sum of cells (x, y0..y1-1) — two reads. */
  def colRangeSum(x: Int, y0: Int, y1: Int): Long = {
    val p = colPref(x)
    if (p == null) 0L else p(y1) - p(y0)
  }

  /** Sum of cells (x0..x1-1, y) — two reads. */
  def rowRangeSum(y: Int, x0: Int, x1: Int): Long = {
    val p = rowPref(y)
    if (p == null) 0L else p(x1) - p(x0)
  }

  def inPolygon(x: Int, y: Int): Boolean = polygonCells match {
    case None => true
    case Some(bits) => bits.get(x * height + y)
  }

  /** 2-D prefix counts of inside-polygon cells:
    * polyPref((x)*(height+1)+y) = #inside cells in [0,x) x [0,y).
    * Null when no polygon (or a pathologically large grid, where the
    * callers fall back to bit scans). Makes every tile-level polygon
    * question — any inside cell? how many? — an O(1) rectangle count
    * instead of an O(width*height) BitSet walk per tested tile. */
  private val polyPref: Array[Int] = polygonCells match {
    // cap by MEMORY, not indexability: 2^26 entries = 256 MB, which
    // covers a whole-world grid to resolution 14; beyond that the
    // bit-scan fallback costs time, never heap
    case Some(bits) if (width + 1).toLong * (height + 1) <= (1L << 26) =>
      val stride = height + 1
      val p = new Array[Int]((width + 1) * stride)
      var x = 0
      while (x < width) {
        var running = 0
        var y = 0
        while (y < height) {
          if (bits.get(x * height + y)) running += 1
          p((x + 1) * stride + (y + 1)) = p(x * stride + (y + 1)) + running
          y += 1
        }
        x += 1
      }
      p
    case _ => null
  }

  /** #inside-polygon cells in [x0, x1) x [y0, y1); -1 when the O(1)
    * prefix table is unavailable (no polygon / oversized grid). */
  def polyInsideCount(x0: Int, y0: Int, x1: Int, y1: Int): Long = {
    if (polyPref == null) return -1L
    val stride = height + 1
    polyPref(x1 * stride + y1).toLong - polyPref(x0 * stride + y1) -
      polyPref(x1 * stride + y0) + polyPref(x0 * stride + y0)
  }

  def hasPolygon: Boolean = polygonCells.isDefined

  /**
   * Width-to-height ratio of a tile in real-world proportions: width
   * is scaled by cos(lat) at whichever of the two horizontal edges is
   * wider; a tile crossing the equator keeps its full width
   * (reference `EnhancedDensityMap.getAspectRatio:118-130`).
   */
  def aspectRatio(x: Int, y: Int, w: Int, h: Int): Double = {
    val maxWidth =
      if (y < equatorPos && y + h > equatorPos) w.toDouble
      else w * math.max(aspectFactor(y), aspectFactor(y + h))
    maxWidth / h
  }
}
