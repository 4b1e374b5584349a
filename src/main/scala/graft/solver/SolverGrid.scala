package graft.solver

import graft.density.DensityGrid
import graft.geo.{MapUnits, TileRect}

/**
 * Read-optimized view over a [[DensityGrid]] for the BSP solver:
 * dense row-major and column-major count arrays (so both row sums and
 * column sums scan contiguous memory), plus latitude-dependent
 * aspect-ratio factors computed once (reference
 * `solver/EnhancedDensityMap.java:29-167`).
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

  /** byRow(y)(x); null row = all-empty (saves memory over oceans). */
  private val byRow: Array[Array[Int]] = new Array[Array[Int]](height)
  /** byCol(x)(y); null column = all-empty. */
  private val byCol: Array[Array[Int]] = new Array[Array[Int]](width)
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
    var x = 0
    while (x < width) {
      var y = 0
      while (y < height) {
        val n = grid.cellCount(x, y)
        if (n > 0) {
          if (byCol(x) == null) byCol(x) = new Array[Int](height)
          if (byRow(y) == null) byRow(y) = new Array[Int](width)
          byCol(x)(y) = n
          byRow(y)(x) = n
          if (n > maxCellCount) maxCellCount = n
          if (inPolygon(x, y) && n > maxCellCountInPolygon) maxCellCountInPolygon = n
        }
        y += 1
      }
      x += 1
    }
  }

  def totalCount: Long = grid.totalCount

  def row(y: Int): Array[Int] = byRow(y)
  def col(x: Int): Array[Int] = byCol(x)

  def inPolygon(x: Int, y: Int): Boolean = polygonCells match {
    case None => true
    case Some(bits) => bits.get(x * height + y)
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
