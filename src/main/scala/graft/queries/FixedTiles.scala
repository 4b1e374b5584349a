package graft.queries

import graft.geo.{CoordSynthesis, MapUnits, TileRect}

/**
 * A fixed, fully-covering 3x2 tile grid over the coordinate-synthesis
 * window — the "split-file reuse" scenario (reference
 * `AreaList.read`, `Main.java:198-213`): tile rectangles are known up
 * front, so the point-in-rectangle assignment join can be checked
 * against a plain SQL oracle, including the closed-boundary
 * duplication semantics on interior edges.
 */
object FixedTiles {
  val Resolution = 13
  val StartMapId = 63240001

  val bounds: TileRect = TileRect(
    CoordSynthesis.LatMin, CoordSynthesis.LonMin,
    CoordSynthesis.LatMax, CoordSynthesis.LonMax).roundedTo(Resolution)

  private val shift = 24 - Resolution

  private def lonEdge(i: Int, n: Int): Int =
    if (i == n) bounds.maxLon
    else MapUnits.roundDown(bounds.minLon + (bounds.width.toLong * i / n).toInt, shift)

  private def latEdge(i: Int, n: Int): Int =
    if (i == n) bounds.maxLat
    else MapUnits.roundDown(bounds.minLat + (bounds.height.toLong * i / n).toInt, shift)

  /** 3 columns x 2 rows, exactly tiling `bounds`. */
  val rects: IndexedSeq[TileRect] =
    for {
      row <- 0 until 2
      colI <- 0 until 3
    } yield TileRect(latEdge(row, 2), lonEdge(colI, 3),
      latEdge(row + 1, 2), lonEdge(colI + 1, 3))

  /** DuckDB VALUES clause of the (optionally overlap-extended) tiles:
    * columns (map_id, min_lat, min_lon, max_lat, max_lon). */
  def valuesSql(overlap: Int): String =
    rects.zipWithIndex.map { case (r0, i) =>
      val r = r0.extended(overlap)
      s"(${StartMapId + i}, ${r.minLat}, ${r.minLon}, ${r.maxLat}, ${r.maxLon})"
    }.mkString("(VALUES ", ", ", ")")
}
