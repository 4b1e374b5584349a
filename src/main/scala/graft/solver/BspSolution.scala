package graft.solver

import scala.collection.mutable.ArrayBuffer

/**
 * A set of tiles covering one solve partition plus the two quality
 * metrics the search optimizes: the worst (largest, normalized >= 1)
 * aspect ratio and the worst (smallest) per-tile count (reference
 * `solver/Solution.java:25-287`).
 */
final class BspSolution(val maxNodes: Long) {
  private val tileBuf = new ArrayBuffer[GridTile]()
  private var worstAR: Double = -1
  private var worstMin: Long = Long.MaxValue

  def tiles: Seq[GridTile] = tileBuf.toSeq
  def isEmpty: Boolean = tileBuf.isEmpty
  def size: Int = tileBuf.length
  def worstAspectRatio: Double = worstAR
  def worstMinNodes: Long = worstMin

  def add(tile: GridTile): Unit = {
    tileBuf += tile
    var ar = tile.aspectRatio
    if (ar < 1.0) ar = 1.0 / ar
    worstAR = math.max(ar, worstAR)
    worstMin = math.min(tile.count, worstMin)
  }

  def merge(other: BspSolution): Unit = {
    if (other.tileBuf.isEmpty) return
    if (tileBuf.isEmpty) {
      worstAR = other.worstAR
      worstMin = other.worstMin
    } else {
      worstAR = math.max(worstAR, other.worstAR)
      worstMin = math.min(worstMin, other.worstMin)
    }
    tileBuf ++= other.tileBuf
  }

  def copy(): BspSolution = {
    val s = new BspSolution(maxNodes)
    tileBuf.foreach(s.add)
    s
  }

  /** "Nice": bounded aspect ratios and every tile at least 1/3 full
    * (reference `Solution.isNice:267-277`). */
  def isNice: Boolean = {
    if (isEmpty) false
    else if (worstAR > BspSolver.NiceMaxAspectRatio) false
    else if (tileBuf.length == 1) true
    else worstMin >= maxNodes / 3
  }

  /**
   * Better-than comparison, exact tie-break order of the reference
   * (`Solution.compareTo:103-132`): emptiness, niceness, worstMinNodes
   * (ignored when both tiny), near-equal-size + very-different-AR
   * special case, tile count, worst AR.
   * @return negative if this is better than `other`.
   */
  def compareTo(other: BspSolution): Int = {
    if (other == null) return -1
    if (other eq this) return 0
    if (isEmpty != other.isEmpty) return if (isEmpty) 1 else -1
    if (isNice != other.isNice) return if (isNice) -1 else 1
    if (worstMin != other.worstMin && math.max(worstMin, other.worstMin) > 1000)
      return if (worstMin > other.worstMin) -1 else 1
    val tileRatio = tileBuf.length.toDouble / other.tileBuf.length
    val arRatio = worstAR / other.worstAR
    if (tileRatio < 1 && tileRatio > 0.99 && arRatio > 1.5) return 1
    if (tileRatio < 1.01 && tileRatio > 1 && arRatio < 0.66666) return -1
    if (tileBuf.length != other.tileBuf.length)
      return if (tileBuf.length < other.tileBuf.length) -1 else 1
    if (worstAR != other.worstAR) return if (worstAR < other.worstAR) -1 else 1
    0
  }

  /**
   * Shrink the outermost tiles toward the data so the final rectangles
   * carry no empty border, without opening holes between tiles: on
   * each side, tiles on the current extreme edge are trimmed toward a
   * running bound so inner neighbours never get exposed (reference
   * `Solution.trimOuterTiles:137-258`).
   *
   * @param bugCompat replicate the reference's TOP-side slip for
   *   byte-parity with real splitter goldens: the reference updates
   *   the TOP running bound under `if (candidate.getMaxX() >
   *   trimToPos)` where every other side compares the trimmed axis
   *   (`Solution.java:242-243` — maxX where it means maxY). Off by
   *   default: the intended semantics (compare maxY) never expose an
   *   inner neighbour, the quirk can.
   */
  def trimOuterTiles(bugCompat: Boolean = false): Unit = {
    if (tileBuf.isEmpty) return
    // mutable boxes; counts are unchanged because only empty rows/cols go
    final class Box(val t: GridTile) {
      var x: Int = t.x; var y: Int = t.y
      var w: Int = t.width; var h: Int = t.height
      def maxX: Int = x + w
      def maxY: Int = y + h
      def view: GridTile = new GridTile(t.g, x, y, w, h, t.count)
    }
    val boxes = tileBuf.map(new Box(_))
    var trimmedAny = true
    while (trimmedAny) {
      trimmedAny = false
      val minX = boxes.map(_.x).min
      val minY = boxes.map(_.y).min
      val maxX = boxes.map(_.maxX).max
      val maxY = boxes.map(_.maxY).max
      // side: 0=left 1=right 2=bottom 3=top, scanned in both directions
      var side = 0
      while (side < 4) {
        var direction = -1
        while (direction <= 1) {
          var bound = if (side == 0 || side == 2) Int.MaxValue else -1
          var go = true
          while (go) {
            // pick the extreme tile on this side, ordered by direction
            var cand: Box = null
            boxes.foreach { b =>
              if (b.t.count != 0) {
                val onEdge = side match {
                  case 0 => b.x == minX
                  case 1 => b.maxX == maxX
                  case 2 => b.y == minY
                  case _ => b.maxY == maxY
                }
                if (onEdge) {
                  if (cand == null) cand = b
                  else side match {
                    case 0 | 1 =>
                      if (direction < 0 && cand.y > b.y) cand = b
                      else if (direction > 0 && cand.maxY < b.maxY) cand = b
                    case _ =>
                      if (direction < 0 && cand.x > b.x) cand = b
                      else if (direction > 0 && cand.maxX < b.maxX) cand = b
                  }
                }
              }
            }
            if (cand == null) go = false
            else {
              val before = (cand.x, cand.y, cand.w, cand.h)
              side match {
                case 0 =>
                  while (cand.x < bound && cand.view.colSum(0) == 0) { cand.x += 1; cand.w -= 1 }
                  if (cand.x < bound) bound = cand.x
                case 1 =>
                  while (cand.maxX > bound && cand.view.colSum(cand.w - 1) == 0) cand.w -= 1
                  if (cand.maxX > bound) bound = cand.maxX
                case 2 =>
                  while (cand.y < bound && cand.view.rowSum(0) == 0) { cand.y += 1; cand.h -= 1 }
                  if (cand.y < bound) bound = cand.y
                case _ =>
                  while (cand.maxY > bound && cand.view.rowSum(cand.h - 1) == 0) cand.h -= 1
                  if ((if (bugCompat) cand.maxX else cand.maxY) > bound) bound = cand.maxY
              }
              if (before == ((cand.x, cand.y, cand.w, cand.h))) go = false
              else trimmedAny = true
            }
          }
          direction += 2
        }
        side += 1
      }
    }
    val trimmed = boxes.map(_.view)
    tileBuf.clear()
    worstAR = -1
    worstMin = Long.MaxValue
    trimmed.foreach(t => if (t.width > 0 && t.height > 0) add(t))
  }

  override def toString: String =
    if (isEmpty) "empty solution"
    else s"${tileBuf.length} tile(s), worst min nodes $worstMin " +
      s"(${100 * worstMin / maxNodes}%), worst aspect ratio ${math.round(worstAR * 100) / 100.0}"
}
