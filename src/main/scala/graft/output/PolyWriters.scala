package graft.output

import graft.geo.{MapUnits, TileRect}
import java.awt.geom.{Area => AwtArea, PathIterator}
import java.awt.Rectangle
import java.io.{FileWriter, PrintWriter}
import java.util.Locale

/**
 * Polygon outputs: the union of tile rectangles as outer polygons —
 * osmosis `.poly` format (reference `AreaList.writePoly:186-223`) and
 * KML (`kml/KmlWriter.java:30-163`) — plus the matching readers for
 * split-file reuse. Rect-union tracing uses java.awt.geom (JDK), like
 * the reference's own `Utils.areaToShapes`, with collinear-point
 * elision.
 */
object PolyWriters {

  /** Decompose the union of rects into rings of (lat, lon) map-unit
    * vertices, collinear points elided. Outer rings are
    * counter-clockwise in (lon, lat) space; holes clockwise. */
  def unionRings(rects: Seq[TileRect]): Seq[(Seq[(Int, Int)], Boolean)] = {
    val area = new AwtArea()
    rects.foreach { r =>
      area.add(new AwtArea(new Rectangle(r.minLon, r.minLat, r.width, r.height)))
    }
    val rings = scala.collection.mutable.ArrayBuffer.empty[Seq[(Int, Int)]]
    val cur = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    val it = area.getPathIterator(null)
    val coords = new Array[Double](6)
    while (!it.isDone) {
      it.currentSegment(coords) match {
        case PathIterator.SEG_MOVETO =>
          cur.clear()
          cur += ((coords(1).round.toInt, coords(0).round.toInt))
        case PathIterator.SEG_LINETO =>
          cur += ((coords(1).round.toInt, coords(0).round.toInt))
        case PathIterator.SEG_CLOSE =>
          rings += elideCollinear(cur.toSeq)
        case _ => // rect unions only produce line segments
      }
      it.next()
    }
    // awt Area normalizes to even-odd winding, so orientation does not
    // mark holes; classify by containment of an interior sample point
    rings.toSeq.map { ring =>
      val poly = new java.awt.Polygon()
      ring.foreach { case (lat, lon) => poly.addPoint(lon, lat) }
      val (y0, x0) = ring.head
      val inside = Seq((0.5, 0.5), (0.5, -0.5), (-0.5, 0.5), (-0.5, -0.5))
        .map { case (dy, dx) => (x0 + dx, y0 + dy) }
        .find { case (px, py) => poly.contains(px, py) }
      val outer = inside.forall { case (px, py) => area.contains(px, py) }
      (ring, outer)
    }
  }

  private def elideCollinear(ring: Seq[(Int, Int)]): Seq[(Int, Int)] = {
    if (ring.size < 4) return ring
    ring.indices.flatMap { i =>
      val prev = ring((i + ring.size - 1) % ring.size)
      val cur = ring(i)
      val next = ring((i + 1) % ring.size)
      val cross = (cur._1 - prev._1).toLong * (next._2 - cur._2) -
        (cur._2 - prev._2).toLong * (next._1 - cur._1)
      if (cross == 0L) None else Some(cur)
    }
  }

  /** Closed (lon, lat) rings in awt path order — the reference's exact
    * traversal (`Utils.areaToShapes:136-193`): consecutive duplicates
    * skipped, ring closed by repeating its head, sub-4-point rings
    * dropped. Byte parity of areas.poly depends on this ring order. */
  private def refShapes(area: AwtArea): Seq[Seq[(Int, Int)]] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Seq[(Int, Int)]]
    var cur: scala.collection.mutable.ArrayBuffer[(Int, Int)] = null
    var prev: (Int, Int) = null
    def closeRing(): Unit = if (cur != null) {
      if (cur.size > 2 && cur.head != cur.last) cur += cur.head
      if (cur.size > 3) out += cur.toSeq
    }
    val it = area.getPathIterator(null)
    val res = new Array[Float](6)
    while (!it.isDone) {
      val t = it.currentSegment(res)
      val p = (math.round(res(0)), math.round(res(1))) // (lon, lat)
      t match {
        case PathIterator.SEG_MOVETO =>
          closeRing()
          cur = scala.collection.mutable.ArrayBuffer(p); prev = p
        case PathIterator.SEG_LINETO =>
          if (p != prev) cur += p
          prev = p
        case PathIterator.SEG_CLOSE =>
          closeRing(); cur = null; prev = null
        case _ => ()
      }
      it.next()
    }
    out.toSeq
  }

  /** Shoelace orientation over a CLOSED ring, the reference's
    * convention (`Utils.clockwise:251-267`: area <= 0 = clockwise). */
  private def refClockwise(ring: Seq[(Int, Int)]): Boolean =
    ring.size >= 3 && ring.head == ring.last && {
      var area = 0L
      var i = 1
      while (i < ring.size) {
        val (x1, y1) = ring(i - 1); val (x2, y2) = ring(i)
        area += x1.toLong * y2 - x2.toLong * y1
        i += 1
      }
      area <= 0
    }

  /** Osmosis .poly: one section per ring, holes (counter-clockwise)
    * prefixed with `!`. Byte-identical to the reference writer
    * (`AreaList.writePoly:186-223`, RefParitySpec): shapes reversed so
    * outer polygons come first, middle points elided only on pure
    * horizontal/vertical runs, two-space `%f %f` (lon lat) rows. The
    * reference hardcodes the name line to "area". */
  def writePoly(path: String, name: String, rects: Seq[TileRect]): Unit = {
    val area = new AwtArea()
    rects.foreach { r =>
      area.add(new AwtArea(new Rectangle(r.minLon, r.minLat, r.width, r.height)))
    }
    val shapes = refShapes(area).reverse
    val pw = new PrintWriter(new FileWriter(path))
    try {
      pw.println(name)
      shapes.zipWithIndex.foreach { case (shape, i) =>
        pw.println(if (refClockwise(shape)) s"${i + 1}" else s"!${i + 1}")
        shape.indices.foreach { j =>
          val (x, y) = shape(j)
          val skip = j > 0 && j + 1 < shape.size && {
            val (px, py) = shape(j - 1); val (nx, ny) = shape(j + 1)
            (x == nx && x == px) || (y == ny && y == py)
          }
          if (!skip)
            pw.format(Locale.ROOT, "  %f  %f%n",
              Double.box(MapUnits.toDegrees(x)), Double.box(MapUnits.toDegrees(y)))
        }
        pw.println("END")
      }
      pw.println("END")
    } finally pw.close()
  }

  /** The polygon name: the first line of an osmosis .poly file. */
  def readPolyName(path: String): String = {
    val src = scala.io.Source.fromFile(path)
    try {
      val it = src.getLines()
      if (!it.hasNext)
        throw new IllegalArgumentException(s"empty polygon file: $path")
      it.next().trim
    } finally src.close()
  }

  /** Parse an osmosis .poly back into rings of map-unit (lat, lon). */
  def readPoly(path: String): Seq[(Seq[(Int, Int)], Boolean)] = {
    val lines = scala.io.Source.fromFile(path).getLines().toList
    val out = scala.collection.mutable.ArrayBuffer.empty[(Seq[(Int, Int)], Boolean)]
    var i = 1 // skip name
    while (i < lines.length && lines(i).trim != "END") {
      val hole = lines(i).trim.startsWith("!")
      i += 1
      val ring = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
      while (lines(i).trim != "END") {
        val parts = lines(i).trim.split("\\s+")
        ring += ((MapUnits.toMapUnit(parts(1).toDouble), MapUnits.toMapUnit(parts(0).toDouble)))
        i += 1
      }
      i += 1 // END of ring
      if (ring.nonEmpty && ring.head == ring.last) ring.remove(ring.size - 1)
      out += ((ring.toSeq, !hole))
    }
    out.toSeq
  }

  /** KML of named tile rectangles (reference `kml/KmlWriter`). */
  def writeKml(path: String, areas: Seq[AreaDef]): Unit = {
    val pw = new PrintWriter(new FileWriter(path))
    try {
      pw.println("""<?xml version="1.0" encoding="UTF-8"?>""")
      pw.println("""<kml xmlns="http://earth.google.com/kml/2.1">""")
      pw.println("<Document>")
      pw.println("  <Style id=\"transRedPoly\"><LineStyle><width>1.5</width></LineStyle>" +
        "<PolyStyle><color>7d0000ff</color></PolyStyle></Style>")
      areas.foreach { a =>
        val r = a.rect
        def fmt(lat: Int, lon: Int) =
          f"${MapUnits.toDegrees(lon)}%f,${MapUnits.toDegrees(lat)}%f"
        pw.println("  <Placemark>")
        pw.println(s"    <name>${"%08d".format(a.mapId)}</name>")
        pw.println("    <styleUrl>#transRedPoly</styleUrl>")
        pw.println("    <Polygon><outerBoundaryIs><LinearRing><coordinates>")
        pw.println("      " + Seq(
          fmt(r.minLat, r.minLon), fmt(r.maxLat, r.minLon),
          fmt(r.maxLat, r.maxLon), fmt(r.minLat, r.maxLon),
          fmt(r.minLat, r.minLon)).mkString(" "))
        pw.println("    </coordinates></LinearRing></outerBoundaryIs></Polygon>")
        pw.println("  </Placemark>")
      }
      pw.println("</Document>")
      pw.println("</kml>")
    } finally pw.close()
  }

  /** Parse the KML written by [[writeKml]] back to AreaDefs (the KML
    * split-file source, reference `kml/KmlParser.java`). */
  def readKml(path: String): Seq[AreaDef] = {
    val text = scala.io.Source.fromFile(path).mkString
    val pm = """(?s)<Placemark>.*?<name>(\d+)</name>.*?<coordinates>\s*(.*?)\s*</coordinates>""".r
    pm.findAllMatchIn(text).map { m =>
      val coords = m.group(2).trim.split("\\s+").map { p =>
        val a = p.split(",")
        (MapUnits.toMapUnit(a(1).toDouble), MapUnits.toMapUnit(a(0).toDouble))
      }
      val lats = coords.map(_._1)
      val lons = coords.map(_._2)
      AreaDef(m.group(1).toInt, TileRect(lats.min, lons.min, lats.max, lons.max))
    }.toSeq
  }
}
