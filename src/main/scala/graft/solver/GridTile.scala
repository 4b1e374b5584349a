package graft.solver

/**
 * A rectangular view (in grid-cell coordinates) over a [[SolverGrid]]
 * with a cached point count and the prefix-sum helpers the BSP search
 * needs (reference `solver/Tile.java:33-636`).
 *
 * Equality/hashing intentionally ignore the grid reference: the solver
 * memoizes on the rectangle alone (reference `Tile.hashCode:612-615`).
 */
final class GridTile(val g: SolverGrid, val x: Int, val y: Int,
                     val width: Int, val height: Int, val count: Long) {

  def maxX: Int = x + width
  def maxY: Int = y + height

  /** Sum of the counts in tile-relative row `r` (0 .. height-1) —
    * O(1) via the grid's row prefix sums. */
  def rowSum(r: Int): Long = g.rowRangeSum(y + r, x, x + width)

  /** Sum of the counts in tile-relative column `c` (0 .. width-1) —
    * O(1) via the grid's column prefix sums. */
  def colSum(c: Int): Long = g.colRangeSum(x + c, y, y + height)

  def recount(): Long = {
    var sum = 0L
    var r = 0
    while (r < height) { sum += rowSum(r); r += 1 }
    sum
  }

  def verifyCount: Boolean = count == recount()

  def aspectRatio: Double = g.aspectRatio(x, y, width, height)

  // ---- split-position search helpers ------------------------------------

  /** Column index where the left prefix sum first crosses count/2,
    * snapped to the nearer side (reference
    * `Tile.findHorizontalMiddle:196-225`). */
  def findHorizontalMiddle(m: SplitMeta): Int = {
    if (count == 0 || width < 2) m.horMidPos = 0
    else if (m.horMidPos < 0) {
      val target = count / 2
      var sum = 0L
      var lastSum = 0L
      var pos = math.max(m.firstNonZeroX, 0)
      var done = false
      while (!done && pos <= width) {
        lastSum = sum
        sum += colSum(pos)
        if (sum != 0) {
          if (lastSum <= 0) m.firstNonZeroX = pos
          if (sum > target) {
            if (sum - target < target - lastSum && pos + 1 < width) m.horMidPos = pos + 1
            else m.horMidPos = pos
            done = true
          }
        }
        pos += 1
      }
    }
    m.horMidPos
  }

  /** Row analog of [[findHorizontalMiddle]]. */
  def findVerticalMiddle(m: SplitMeta): Int = {
    if (count == 0 || height < 2) m.vertMidPos = 0
    else if (m.vertMidPos < 0) {
      val target = count / 2
      var sum = 0L
      var lastSum = 0L
      var pos = math.max(m.firstNonZeroY, 0)
      var done = false
      while (!done && pos <= height) {
        lastSum = sum
        sum += rowSum(pos)
        if (sum != 0) {
          if (lastSum <= 0) m.firstNonZeroY = pos
          if (sum > target) {
            if (sum - target < target - lastSum && pos + 1 < height) m.vertMidPos = pos + 1
            else m.vertMidPos = pos
            done = true
          }
        }
        pos += 1
      }
    }
    m.vertMidPos
  }

  /** Smallest split column leaving >= minNodes on the left
    * (reference `Tile.findValidStartX:334-353`). Returns `width` when
    * none exists. */
  def findValidStartX(m: SplitMeta): Int = {
    if (m.validStartX >= 0) return m.validStartX
    var sum = 0L
    var i = math.max(m.firstNonZeroX, 0)
    while (i < width) {
      sum += colSum(i)
      if (sum != 0) {
        if (m.firstNonZeroX < 0) m.firstNonZeroX = i
        if (sum >= m.minNodes) { m.validStartX = i + 1; return i + 1 }
      }
      i += 1
    }
    m.validStartX = width
    width
  }

  /** Largest split column leaving >= minNodes on the right. */
  def findValidEndX(m: SplitMeta): Int = {
    if (m.validEndX < 0) {
      var i = if (m.lastNonZeroX > 0) m.lastNonZeroX else width - 1
      var sum = 0L
      var done = false
      while (!done && i >= 0) {
        sum += colSum(i)
        if (sum > 0 && m.lastNonZeroX < 0) m.lastNonZeroX = i
        if (sum >= m.minNodes) { m.validEndX = i; done = true }
        i -= 1
      }
    }
    m.validEndX
  }

  def findValidStartY(m: SplitMeta): Int = {
    if (m.validStartY >= 0) return m.validStartY
    var sum = 0L
    var i = math.max(m.firstNonZeroY, 0)
    while (i < height) {
      sum += rowSum(i)
      if (sum != 0) {
        if (m.firstNonZeroY < 0) m.firstNonZeroY = i
        if (sum >= m.minNodes) { m.validStartY = i + 1; return i + 1 }
      }
      i += 1
    }
    m.validStartY = height
    height
  }

  def findValidEndY(m: SplitMeta): Int = {
    if (m.validEndY < 0) {
      var i = if (m.lastNonZeroY > 0) m.lastNonZeroY else height - 1
      var sum = 0L
      var done = false
      while (!done && i >= 0) {
        sum += rowSum(i)
        if (sum > 0 && m.lastNonZeroY < 0) m.lastNonZeroY = i
        if (sum >= m.minNodes) { m.validEndY = i; done = true }
        i -= 1
      }
    }
    m.validEndY
  }

  /** First column where the left prefix sum exceeds `limit`; `width`
    * if never. */
  def findFirstXHigher(m: SplitMeta, limit: Long): Int = {
    var sum = 0L
    var i = math.max(m.firstNonZeroX, 0)
    while (i < width) {
      sum += colSum(i)
      if (sum != 0) {
        if (m.firstNonZeroX < 0) m.firstNonZeroX = i
        if (sum > limit) return i
      }
      i += 1
    }
    width
  }

  def findFirstYHigher(m: SplitMeta, limit: Long): Int = {
    var sum = 0L
    var i = math.max(m.firstNonZeroY, 0)
    while (i < height) {
      sum += rowSum(i)
      if (sum != 0) {
        if (m.firstNonZeroY < 0) m.firstNonZeroY = i
        if (sum > limit) return i
      }
      i += 1
    }
    height
  }

  // ---- splitting ---------------------------------------------------------

  /** Split left/right at column `splitX`; fills m.part0/part1 and
    * returns false when either part would fall below minNodes
    * (reference `Tile.splitHoriz:268-293`). Sums the smaller side. */
  def splitHoriz(splitX: Int, m: SplitMeta): Boolean = {
    if (splitX <= 0 || splitX >= width) return false
    var sum = 0L
    if (splitX <= width / 2) {
      var pos = math.max(m.firstNonZeroX, 0)
      while (pos < splitX) { sum += colSum(pos); pos += 1 }
    } else {
      val end = if (m.lastNonZeroX > 0) m.lastNonZeroX + 1 else width
      var pos = splitX
      while (pos < end) { sum += colSum(pos); pos += 1 }
      sum = count - sum
    }
    if (sum < m.minNodes || count - sum < m.minNodes) return false
    m.part0 = new GridTile(g, x, y, splitX, height, sum)
    m.part1 = new GridTile(g, x + splitX, y, width - splitX, height, count - sum)
    true
  }

  /** Split bottom/top at row `splitY`. */
  def splitVert(splitY: Int, m: SplitMeta): Boolean = {
    if (splitY <= 0 || splitY >= height) return false
    var sum = 0L
    if (splitY <= height / 2) {
      var pos = math.max(m.firstNonZeroY, 0)
      while (pos < splitY) { sum += rowSum(pos); pos += 1 }
    } else {
      val end = if (m.lastNonZeroY > 0) m.lastNonZeroY + 1 else height
      var pos = splitY
      while (pos < end) { sum += rowSum(pos); pos += 1 }
      sum = count - sum
    }
    if (sum < m.minNodes || count - sum < m.minNodes) return false
    m.part0 = new GridTile(g, x, y, width, splitY, sum)
    m.part1 = new GridTile(g, x, y + splitY, width, height - splitY, count - sum)
    true
  }

  /** Middle-out candidate list over [start, end] (reference
    * `Tile.genTests:108-127`): mid, mid+1, mid-1, mid+2, ... */
  def candidatePositions(start: Int, end: Int): Array[Int] = {
    if (end - start < 0) return Array.emptyIntArray
    val mid = (start + end) / 2
    val out = new Array[Int](end - start + 1)
    var n = 0
    var i = 0
    while (i <= mid && n < out.length) {
      var pos = mid + i
      if (pos >= start && pos <= end) { out(n) = pos; n += 1 }
      if (n < out.length && i != 0) {
        pos = mid - i
        if (pos >= start && pos <= end) { out(n) = pos; n += 1 }
      }
      i += 1
    }
    java.util.Arrays.copyOf(out, n)
  }

  def genXTests(m: SplitMeta): Array[Int] =
    candidatePositions(findValidStartX(m), findValidEndX(m))
  def genYTests(m: SplitMeta): Array[Int] =
    candidatePositions(findValidStartY(m), findValidEndY(m))

  // ---- trim / polygon ----------------------------------------------------

  private def colNeeded(c: Int): Boolean =
    if (!g.hasPolygon) colSum(c) > 0
    else {
      // inside-polygon test: any cell of the column in the polygon —
      // O(1) via the polygon prefix counts when available
      val n = g.polyInsideCount(x + c, y, x + c + 1, y + height)
      if (n >= 0) n > 0
      else {
        var i = 0
        var in = false
        while (!in && i < height) { in = g.inPolygon(x + c, y + i); i += 1 }
        in
      }
    }

  private def rowNeeded(r: Int): Boolean =
    if (!g.hasPolygon) rowSum(r) > 0
    else {
      val n = g.polyInsideCount(x, y + r, x + width, y + r + 1)
      if (n >= 0) n > 0
      else {
        var i = 0
        var in = false
        while (!in && i < width) { in = g.inPolygon(x + i, y + r); i += 1 }
        in
      }
    }

  /** Shrink away empty (or fully-outside-polygon) border rows/columns;
    * returns a new tile (reference `Tile.trim:473-537`). */
  def trim(): GridTile = {
    var lo = 0
    while (lo < width && !colNeeded(lo)) lo += 1
    var hi = width - 1
    while (hi >= lo && !colNeeded(hi)) hi -= 1
    var bo = 0
    while (bo < height && !rowNeeded(bo)) bo += 1
    var to = height - 1
    while (to >= bo && !rowNeeded(to)) to -= 1
    if (lo > hi || bo > to) return new GridTile(g, x, y, 0, 0, 0)
    val nw = hi - lo + 1
    val nh = to - bo + 1
    if (nw == width && nh == height) this
    else if (!g.hasPolygon) new GridTile(g, x + lo, y + bo, nw, nh, count)
    else GridTile.compute(g, x + lo, y + bo, nw, nh)
  }

  /** True when no cell of the tile is inside the polygon — O(1)
    * rectangle count when the polygon prefix table exists. */
  def outsidePolygon: Boolean = {
    if (!g.hasPolygon) return false
    val n = g.polyInsideCount(x, y, x + width, y + height)
    if (n >= 0) return n == 0
    var cx = 0
    while (cx < width) {
      var cy = 0
      while (cy < height) {
        if (g.inPolygon(x + cx, y + cy)) return false
        cy += 1
      }
      cx += 1
    }
    true
  }

  /** Fraction of grid cells outside the bounding polygon (0 when no
    * polygon; reference `Tile.calcOutsidePolygonRatio:582-602`) —
    * O(1) via the prefix rectangle count when available. */
  def outsidePolygonRatio: Double = {
    if (!g.hasPolygon) return 0.0
    val in = g.polyInsideCount(x, y, x + width, y + height)
    if (in >= 0)
      return (width.toLong * height - in).toDouble / (width.toLong * height)
    var outside = 0
    var cx = 0
    while (cx < width) {
      var cy = 0
      while (cy < height) {
        if (!g.inPolygon(x + cx, y + cy)) outside += 1
        cy += 1
      }
      cx += 1
    }
    outside.toDouble / (width.toLong * height)
  }

  override def equals(o: Any): Boolean = o match {
    case t: GridTile => t.x == x && t.y == y && t.width == width && t.height == height
    case _ => false
  }
  override def hashCode: Int = x << 24 | y << 16 | width << 8 | height
  override def toString: String =
    s"GridTile($x,$y,${width}x$height,n=$count)"
}

object GridTile {
  /** Tile over the whole grid. */
  def whole(g: SolverGrid): GridTile =
    new GridTile(g, 0, 0, g.width, g.height, g.totalCount)

  /** Tile with the count computed by scanning. */
  def compute(g: SolverGrid, x: Int, y: Int, w: Int, h: Int): GridTile = {
    require(x >= 0 && y >= 0 && x + w <= g.width && y + h <= g.height,
      s"tile ($x,$y,$w,$h) outside grid ${g.width}x${g.height}")
    val t = new GridTile(g, x, y, w, h, 0)
    new GridTile(g, x, y, w, h, t.recount())
  }
}

/**
 * Mutable per-tile search state: split landmarks inherited
 * parent-to-child when an axis is shared so repeated scans are
 * avoided (reference `solver/TileMetaInfo.java:23-302`). The
 * reference also carries memoized row/column sum ARRAYS here; with
 * the [[SolverGrid]] prefix sums every row/column sum is already
 * O(1), so only the scalar landmarks remain — the values each
 * landmark takes are identical (they are exact functions of the tile
 * and minNodes), so the search is unchanged.
 */
final class SplitMeta(tile: GridTile, parent: GridTile, parentMeta: SplitMeta) {
  var minNodes: Long = if (parentMeta != null) parentMeta.minNodes else 0L
  var part0: GridTile = _
  var part1: GridTile = _
  var validStartX: Int = -1
  var validStartY: Int = -1
  var validEndX: Int = -1
  var validEndY: Int = -1
  var firstNonZeroX: Int = -1
  var firstNonZeroY: Int = -1
  var lastNonZeroX: Int = -1
  var lastNonZeroY: Int = -1
  var horMidPos: Int = -1
  var vertMidPos: Int = -1

  locally {
    if (parent != null && parent.width == tile.width && tile.y == parent.y)
      firstNonZeroY = parentMeta.firstNonZeroY
    if (parent != null && parent.height == tile.height && tile.x == parent.x)
      firstNonZeroX = parentMeta.firstNonZeroX
  }

  def setMinNodes(n: Long): Unit = {
    if (n != minNodes) {
      minNodes = n
      validStartX = -1; validStartY = -1; validEndX = -1; validEndY = -1
    }
  }

  /** Push refreshed landmarks back up so the sibling benefits
    * (reference `TileMetaInfo.propagateToParent:203-244`). */
  def propagateToParent(parentMeta: SplitMeta, tile: GridTile, parent: GridTile): Unit = {
    if (parent.width == tile.width) {
      val dst = tile.y - parent.y
      if (dst == 0) {
        if (parentMeta.firstNonZeroY < 0 && firstNonZeroY >= 0)
          parentMeta.firstNonZeroY = firstNonZeroY
        if (parentMeta.validStartY < 0 && validStartY >= 0)
          parentMeta.validStartY = validStartY
      } else {
        if (parentMeta.lastNonZeroY < 0 && lastNonZeroY >= 0)
          parentMeta.lastNonZeroY = dst + lastNonZeroY
        if (parentMeta.validEndY < 0 && validEndY >= 0)
          parentMeta.validEndY = dst + validEndY
      }
    }
    if (parent.height == tile.height) {
      val dst = tile.x - parent.x
      if (dst == 0) {
        if (parentMeta.firstNonZeroX < 0 && firstNonZeroX >= 0)
          parentMeta.firstNonZeroX = firstNonZeroX
        if (parentMeta.validStartX < 0 && validStartX >= 0)
          parentMeta.validStartX = validStartX
      } else {
        if (parentMeta.lastNonZeroX < 0 && lastNonZeroX >= 0)
          parentMeta.lastNonZeroX = dst + lastNonZeroX
        if (parentMeta.validEndX < 0 && validEndX >= 0)
          parentMeta.validEndX = dst + validEndX
      }
    }
  }
}
