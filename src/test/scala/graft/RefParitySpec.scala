package graft

import graft.density.DensityGrid
import graft.geo.TileRect
import graft.output.{AreaDef, AreaWriters, PolyWriters}
import graft.solver.{BspSolver, PolygonSupport}
import org.scalatest.funsuite.AnyFunSuite
import java.io.{File, FileWriter}
import scala.collection.immutable.SortedMap
import scala.sys.process._

/**
 * Differential golden test against the ACTUAL reference solver: the
 * reference sources under /root/reference are compiled unmodified
 * (tools/refharness, compile-only shims for the absent fastutil/xmlpull
 * jars) and driven through their own readMap -> round -> subset ->
 * SplittableDensityArea.split -> AreaList.write pipeline
 * (solver/AreasCalculator.java:142-231, Main.java:177-261). The Scala
 * engine solves the identical density grid and the resulting
 * areas.list / template.args are compared BYTE-FOR-BYTE (modulo the
 * timestamp comment line); areas.poly is compared as a geometric set
 * (the two writers' vertex-elision orders differ legitimately).
 */
class RefParitySpec extends AnyFunSuite {

  private val PlanetMinLat = -0x400000
  private val PlanetMinLon = -0x800000
  private val MapId = 63240001
  private val SearchLimit = 200000

  private def repoFile(rel: String) = new File(new File(".").getCanonicalFile, rel)

  private lazy val refClasses: Option[File] = {
    if (!new File("/root/reference/src").isDirectory) None
    else {
      val out = repoFile("target/refharness")
      val marker = new File(out, "graft/refharness/RefSolve.class")
      val driver = repoFile("tools/refharness/driver/RefSolve.java")
      if (!marker.exists() || marker.lastModified < driver.lastModified) {
        val rc = Process(Seq("sh", repoFile("tools/refharness/build.sh").getPath,
          out.getPath)).!(ProcessLogger(_ => (), _ => ()))
        if (rc != 0) None else Some(out)
      } else Some(out)
    }
  }

  /** Deterministic fixture: planet-relative cell histogram + the exact
    * (unaligned) detail bbox of the generating points. */
  private def cellsOf(points: Seq[(Int, Int)], res: Int): (SortedMap[(Int, Int), Int], TileRect) = {
    val shift = 24 - res
    var m = SortedMap.empty[(Int, Int), Int]
    var (minLat, minLon, maxLat, maxLon) = (Int.MaxValue, Int.MaxValue, Int.MinValue, Int.MinValue)
    points.foreach { case (lat, lon) =>
      val x = (lon - PlanetMinLon) >>> shift
      val y = (lat - PlanetMinLat) >>> shift
      m = m.updated((x, y), m.getOrElse((x, y), 0) + 1)
      minLat = math.min(minLat, lat); maxLat = math.max(maxLat, lat)
      minLon = math.min(minLon, lon); maxLon = math.max(maxLon, lon)
    }
    (m, TileRect(minLat, minLon, maxLat, maxLon))
  }

  /** Reference densities.txt debug format (DensityMap.readMap:258-332):
    * detail-bbox line, no-bounds marker, then x,y,count planet cells.
    * The reference's planet grid is lat-clamped to +-85 deg by the
    * DensityMap ctor (RoundingUtils.round), so its row origin sits
    * `rowOffset` whole cells above -0x400000 — file rows must be
    * expressed against THAT origin. */
  private def writeDensities(f: File, detail: TileRect, cells: SortedMap[(Int, Int), Int],
                             res: Int): Unit = {
    val shift = 24 - res
    val refPlanetMinLat =
      graft.geo.MapUnits.roundDown(math.max(PlanetMinLat, graft.geo.MapUnits.toMapUnit(-85.0)), shift)
    val rowOffset = (refPlanetMinLat - PlanetMinLat) >> shift
    val w = new FileWriter(f)
    try {
      w.write(s"${detail.minLat},${detail.minLon},${detail.maxLat},${detail.maxLon}\n")
      w.write("no_bounds_in_input\n")
      cells.foreach { case ((x, y), n) => w.write(s"$x,${y - rowOffset},$n\n") }
    } finally w.close()
  }

  private def refSolve(densities: File, res: Int, maxNodes: Long, outDir: File,
                       numTiles: Int, trim: Boolean, polygon: Option[String]): Unit = {
    val javaBin = new File(new File(System.getProperty("java.home"), "bin"), "java").getPath
    val cmd = Seq(javaBin, "-cp", refClasses.get.getPath, "graft.refharness.RefSolve",
      densities.getPath, res.toString, maxNodes.toString, outDir.getPath,
      numTiles.toString, MapId.toString, SearchLimit.toString,
      if (trim) "1" else "0", polygon.getOrElse(""))
    val log = new StringBuilder
    val rc = Process(cmd).!(ProcessLogger(s => log.append(s).append('\n'),
      s => log.append(s).append('\n')))
    assert(rc == 0, s"RefSolve failed (rc=$rc):\n$log")
  }

  private def mySolve(cells: SortedMap[(Int, Int), Int], detail: TileRect, res: Int,
                      maxNodes: Long, outDir: File, numTiles: Int, trim: Boolean,
                      polygon: Option[java.awt.geom.Area]): Unit = {
    val rounded = detail.roundedTo(res)
    val shift = 24 - res
    val grid = new DensityGrid(rounded, res)
    cells.foreach { case ((px, py), n) =>
      val lon = (px << shift) + PlanetMinLon
      val lat = (py << shift) + PlanetMinLat
      if (lat >= rounded.minLat && lat < rounded.maxLat &&
          lon >= rounded.minLon && lon < rounded.maxLon)
        grid.addToCell(grid.lonToCellX(lon), grid.latToCellY(lat), n)
    }
    val rects: List[TileRect] = polygon match {
      case Some(p) =>
        PolygonSupport.split(grid, p, maxNodes, SearchLimit)
      case None =>
        val s = new BspSolver(grid, SearchLimit)
        s.trimShape = trim
        s.bugCompatTrim = true // byte parity with the genuine binary
        if (numTiles >= 2) s.splitIntoTiles(numTiles)
        else { s.maxNodes = maxNodes; s.split() }
    }
    outDir.mkdirs()
    val areas = rects.zipWithIndex.map { case (r, i) => AreaDef(MapId + i, r) }
    AreaWriters.writeAreasList(new File(outDir, "areas.list").getPath, areas)
    AreaWriters.writeTemplateArgs(new File(outDir, "template.args").getPath,
      areas, outputType = "pbf", startMapId = -1)
    // the reference hardcodes the .poly name line to "area"
    PolyWriters.writePoly(new File(outDir, "areas.poly").getPath, "area", rects)
  }

  private def readNormalized(f: File): Seq[String] = {
    val src = scala.io.Source.fromFile(f)
    try src.getLines().filterNot(_.startsWith("# Generated")).toList
    finally src.close()
  }

  private def assertSameBytes(ref: File, mine: File): Unit = {
    val (r, m) = (readNormalized(ref), readNormalized(mine))
    val firstDiff = r.zipAll(m, "<missing>", "<missing>").zipWithIndex
      .find { case ((a, b), _) => a != b }
    assert(firstDiff.isEmpty && r.length == m.length,
      s"${ref.getName} diverges at line ${firstDiff.map(_._2 + 1).getOrElse(-1)}: " +
        s"ref=${firstDiff.map(_._1._1).getOrElse("")} mine=${firstDiff.map(_._1._2).getOrElse("")} " +
        s"(ref ${r.length} lines, mine ${m.length})")
  }


  private def runCase(name: String, points: Seq[(Int, Int)], maxNodes: Long,
                      res: Int = 13, numTiles: Int = -1, trim: Boolean = true,
                      polyRing: Option[Seq[(Int, Int)]] = None): Unit = {
    assume(refClasses.isDefined, "reference sources unavailable; skipping differential test")
    val base = repoFile(s"target/refparity/$name")
    base.mkdirs()
    val (cells, detail) = cellsOf(points, res)
    val densities = new File(base, "densities.txt")
    writeDensities(densities, detail, cells, res)
    val refOut = new File(base, "ref"); refOut.mkdirs()
    val myOut = new File(base, "mine")
    val polySpec = polyRing.map(_.map { case (lat, lon) => s"$lon,$lat" }.mkString(";"))
    refSolve(densities, res, maxNodes, refOut, numTiles, trim, polySpec)
    mySolve(cells, detail, res, maxNodes, myOut, numTiles, trim,
      polyRing.map(r => PolygonSupport.polygonOf(Seq((r, true)))))
    assertSameBytes(new File(refOut, "areas.list"), new File(myOut, "areas.list"))
    assertSameBytes(new File(refOut, "template.args"), new File(myOut, "template.args"))
    assertSameBytes(new File(refOut, "areas.poly"), new File(myOut, "areas.poly"))
  }

  private def clusteredPoints(seed: Long, n: Int,
                              clusters: Seq[(Int, Int, Int, Int)]): Seq[(Int, Int)] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { _ =>
      val (lat0, lon0, lat1, lon1) = clusters(rnd.nextInt(clusters.length))
      (lat0 + rnd.nextInt(lat1 - lat0), lon0 + rnd.nextInt(lon1 - lon0))
    }
  }

  test("golden parity: dense hotspot inside sparse field") {
    runCase("hotspot",
      clusteredPoints(42L, 24000, Seq(
        (0x100000, 0x200000, 0x1F0000, 0x330000), // broad field
        (0x150000, 0x280000, 0x158000, 0x290000), // metro hotspot
        (0x150000, 0x280000, 0x158000, 0x290000))),
      maxNodes = 2000)
  }

  test("golden parity: islands separated by empty sea (trim clusters)") {
    runCase("islands",
      clusteredPoints(7L, 18000, Seq(
        (-0x080000, -0x100000, -0x040000, -0x0A0000),
        (0x0A0000, 0x080000, 0x0E0000, 0x100000),
        (0x020000, 0x2A0000, 0x060000, 0x300000))),
      maxNodes = 1500)
  }

  test("golden parity: southern-hemisphere band, no trim") {
    runCase("south_notrim",
      clusteredPoints(99L, 15000, Seq(
        (-0x200000, -0x400000, -0x180000, -0x200000),
        (-0x1F0000, -0x300000, -0x1C0000, -0x2C0000))),
      maxNodes = 1800, trim = false)
  }

  test("golden parity: num-tiles bisection mode") {
    runCase("numtiles",
      clusteredPoints(5L, 20000, Seq(
        (0x080000, -0x080000, 0x140000, 0x080000),
        (0x0C0000, -0x020000, 0x0E0000, 0x020000))),
      maxNodes = 0L, numTiles = 7)
  }

  test("golden parity: polygon-constrained L-shape") {
    val ring = Seq( // rectilinear L in map units (lat, lon)
      (0x100000, 0x200000), (0x100000, 0x300000), (0x160000, 0x300000),
      (0x160000, 0x260000), (0x1C0000, 0x260000), (0x1C0000, 0x200000))
    runCase("poly_l",
      clusteredPoints(13L, 16000, Seq(
        (0x100000, 0x200000, 0x1C0000, 0x300000),
        (0x120000, 0x210000, 0x130000, 0x230000))),
      maxNodes = 1200, polyRing = Some(ring))
  }
}
