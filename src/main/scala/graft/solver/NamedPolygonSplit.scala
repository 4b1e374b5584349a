package graft.solver

import graft.density.DensityGrid
import graft.geo.TileRect
import java.awt.geom.{Area => AwtArea}

/** A named bounding polygon (the `--polygon-desc-file` input shape:
  * user-named regions that may overlap). */
final case class NamedPolygon(name: String, area: AwtArea)

/**
 * Multi-polygon splitting with overlap extraction (reference
 * `SplittableDensityArea.split(List<PolygonDesc>):201-273`): each
 * polygon's distinct part is split on its own; every region shared by
 * an exact set of polygons is extracted by pairwise intersection /
 * subtraction and split separately, so a tile never belongs to an
 * ambiguous mix of requested regions. Driver-side CSG — the polygon
 * count is tiny; the splitting itself reuses the polygon-constrained
 * BSP.
 */
object NamedPolygonSplit {

  /** @return (description, tiles) per solved part; descriptions are
    *         the polygon name or "a and b" for shared parts. */
  def split(grid: DensityGrid, polys: Seq[NamedPolygon], maxNodes: Long,
            searchLimit: Int = BspSolver.DefaultSearchLimit)
  : Seq[(String, List[TileRect])] = {
    if (polys.isEmpty) return Nil
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, List[TileRect])]
    final case class Shared(var area: AwtArea, sharedBy: List[Int])
    val sharedParts = scala.collection.mutable.ArrayBuffer.empty[Shared]

    // distinct part of each polygon; collect pairwise overlaps
    for (i <- polys.indices) {
      val distinct = new AwtArea(polys(i).area)
      for (j <- polys.indices if j != i) {
        val test = new AwtArea(polys(i).area)
        test.intersect(polys(j).area)
        if (!test.isEmpty) {
          distinct.subtract(polys(j).area)
          if (j > i) sharedParts += Shared(test, List(i, j))
        }
      }
      if (!distinct.isEmpty) {
        val tiles = PolygonSupport.split(grid, distinct, maxNodes, searchLimit)
        if (tiles.nonEmpty) out += ((polys(i).name, tiles))
      }
    }

    // refine shared parts against every other polygon, spawning parts
    // shared by larger exact sets (reference :241-271)
    var k = 0
    while (k < sharedParts.length) {
      val si = sharedParts(k)
      var j = 0
      var break = false
      while (!break && j < polys.length) {
        if (!si.sharedBy.contains(j)) {
          val test = new AwtArea(si.area)
          test.intersect(polys(j).area)
          if (!test.isEmpty) {
            si.area.subtract(test)
            if (j > si.sharedBy.last) sharedParts += Shared(test, si.sharedBy :+ j)
          }
          if (si.area.isEmpty) break = true
        }
        j += 1
      }
      k += 1
    }
    sharedParts.foreach { si =>
      if (!si.area.isEmpty) {
        val desc = si.sharedBy.map(polys(_).name).mkString(" and ")
        val tiles = PolygonSupport.split(grid, si.area, maxNodes, searchLimit)
        if (tiles.nonEmpty) out += ((desc, tiles))
      }
    }
    out.toSeq
  }
}
