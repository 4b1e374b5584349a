package graft.formats

import java.io.{InputStream, OutputStream, OutputStreamWriter, Writer}
import java.nio.charset.StandardCharsets.UTF_8
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamReader}

/**
 * OSM XML codec. Reader semantics mirror the reference XML parser
 * (/root/reference/src/uk/me/parabola/splitter/parser/OSMXMLParser.java:
 * state machine :67-104, node/way/relation attrs :106-147, members
 * :164-182, bounds box-or-attrs :184-230, action="delete" skip :71-73);
 * the pull loop runs on the JDK's StAX instead of xmlpull. Writer
 * output is byte-identical to writer/OSMXMLWriter.java (header :62-77,
 * element layout :90-152, attribute escaping :166-192, the 7-decimal
 * coordinate formatting with its two branches :231-247).
 */
object XmlCodec {

  /** OSMXMLWriter.writeDouble from an exact 1e-7 integer. */
  def formatCoord7(v7: Int): String = {
    val value = v7 * 1e-7
    if (value > -1 && value < 1) {
      // DecimalFormat("0.#######") path: trailing zeros trimmed
      if (v7 == 0) "0"
      else {
        val sign = if (v7 < 0) "-" else ""
        var digits = f"${math.abs(v7.toLong)}%07d"
        digits = digits.reverse.dropWhile(_ == '0').reverse
        s"${sign}0.$digits"
      }
    } else {
      // int-insert path: Math.round(value*1e7) == v7 (exact source),
      // trailing zeros KEPT — reference behavior
      val sign = if (v7 < 0) "-" else ""
      val s = math.abs(v7.toLong).toString // >= 8 digits here
      sign + s.substring(0, s.length - 7) + "." + s.substring(s.length - 7)
    }
  }

  /** OSMXMLWriter.writeAttribute escaping. */
  def escapeAttr(value: String): String = {
    val sb = new StringBuilder(value.length + 8)
    var i = 0
    while (i < value.length) {
      value.charAt(i) match {
        case '\'' => sb.append("&apos;")
        case '&' => sb.append("&amp;")
        case '<' => sb.append("&lt;")
        case '\n' => sb.append("&#xa;")
        case '\r' => sb.append("&#xd;")
        case '\t' => sb.append("&#9;")
        case c => sb.append(c)
      }
      i += 1
    }
    sb.toString
  }
}

/**
 * Streaming OSM XML reader over StAX. `mixed = false` assumes the
 * standard nodes→ways→relations file order and stops early once every
 * requested kind is behind us (the reference's !mixed early-abort,
 * OSMXMLParser.java:77-85).
 */
final class OsmXmlReader(in: InputStream, spec: OsmReadSpec = OsmReadSpec(),
    mixed: Boolean = false)
    extends Iterator[OsmEntity] with AutoCloseable {

  private val reader: XMLStreamReader = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.IS_COALESCING, java.lang.Boolean.TRUE)
    f.setProperty(XMLInputFactory.SUPPORT_DTD, java.lang.Boolean.FALSE)
    f.createXMLStreamReader(in, "UTF-8")
  }

  var bounds: Option[OsmBounds] = None

  private var nextEntity: OsmEntity = _
  private var done = false

  private def attr(name: String): String = {
    var i = 0
    while (i < reader.getAttributeCount) {
      if (reader.getAttributeLocalName(i) == name) return reader.getAttributeValue(i)
      i += 1
    }
    null
  }

  private def versionAttr(): Int = {
    val v = attr("version")
    if (v == null) 0 else v.toInt
  }

  private def parseBounds(): Unit = {
    val box = attr("box")
    val parts: Array[String] =
      if (box != null) box.split(",")
      else {
        val names = Array("minlat", "minlon", "maxlat", "maxlon")
        val vals = names.map(attr)
        if (vals.contains(null)) return
        vals
      }
    if (parts.length != 4) return
    try {
      val d = parts.map(p => math.round(p.trim.toDouble * 1e7))
      bounds = Some(OsmBounds(d(0), d(1), d(2), d(3)))
    } catch { case _: NumberFormatException => () }
  }

  /** Consume the current element's children, building the entity. */
  private def parseEntity(kind: String): OsmEntity = {
    val id = attr("id").toLong
    val version = versionAttr()
    var lat7 = 0
    var lon7 = 0
    if (kind == OsmKind.Node) {
      // Convert.parseDouble + toMapUnit in the reference; here the
      // canonical 1e-7 integer (round-half-up like Math.round)
      lat7 = math.round(attr("lat").toDouble * 1e7).toInt
      lon7 = math.round(attr("lon").toDouble * 1e7).toInt
    }
    val tags = Vector.newBuilder[OsmTag]
    val refs = Vector.newBuilder[Long]
    val members = Vector.newBuilder[OsmMember]
    var depth = 1
    while (depth > 0) {
      reader.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          depth += 1
          reader.getLocalName match {
            case "tag" if spec.tags => tags += OsmTag(attr("k"), attr("v"))
            case "nd" => refs += attr("ref").toLong
            case "member" =>
              val t = attr("type")
              if (t == OsmKind.Node || t == OsmKind.Way || t == OsmKind.Relation) {
                val role = attr("role")
                members += OsmMember(t, attr("ref").toLong, if (role == null) "" else role)
              }
            case _ => ()
          }
        case XMLStreamConstants.END_ELEMENT => depth -= 1
        case XMLStreamConstants.END_DOCUMENT =>
          throw new java.io.IOException("truncated OSM XML")
        case _ => ()
      }
    }
    OsmEntity(kind, id, lat7, lon7, hasCoords = kind == OsmKind.Node, version,
      tags.result(), refs.result(), members.result())
  }

  /** Skip the current element including children. */
  private def skipElement(): Unit = {
    var depth = 1
    while (depth > 0) {
      reader.next() match {
        case XMLStreamConstants.START_ELEMENT => depth += 1
        case XMLStreamConstants.END_ELEMENT => depth -= 1
        case XMLStreamConstants.END_DOCUMENT => depth = 0
        case _ => ()
      }
    }
  }

  private def advance(): Unit = {
    nextEntity = null
    while (nextEntity == null && !done) {
      if (!reader.hasNext) { done = true; return }
      reader.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          val name = reader.getLocalName
          val deleted = {
            val a = attr("action"); a != null && a == "delete"
          }
          name match {
            case _ if deleted => skipElement()
            case "node" =>
              if (spec.nodes) nextEntity = parseEntity(OsmKind.Node)
              else skipElement()
            case "way" =>
              if (spec.ways) nextEntity = parseEntity(OsmKind.Way)
              else if (!mixed && !spec.relations) { done = true; return }
              else skipElement()
            case "relation" =>
              if (spec.relations) nextEntity = parseEntity(OsmKind.Relation)
              else if (!mixed) { done = true; return }
              else skipElement()
            case "bounds" | "bound" =>
              parseBounds()
              skipElement()
            case _ => () // osm root / unknown: descend
          }
        case XMLStreamConstants.END_DOCUMENT => done = true
        case _ => ()
      }
    }
  }

  advance()

  override def hasNext: Boolean = nextEntity != null
  override def next(): OsmEntity = {
    val e = nextEntity
    if (e == null) throw new NoSuchElementException
    advance()
    e
  }
  override def close(): Unit = { reader.close(); in.close() }
}

/**
 * OSM XML writer, byte-identical to the reference OSMXMLWriter.
 * `boundsDeg` are the tile bounds in DEGREES exactly as the reference
 * prints them (Double.toString of Utils.toDegrees(map units)).
 * Version policy as in AbstractOSMWriter: "remove" omits version
 * attrs (and declares api 0.5), "fake" forces 1, "keep" passes the
 * entity's version through.
 */
final class OsmXmlWriter(out: OutputStream, versionPolicy: String = "keep") {
  import XmlCodec._

  private val w: Writer = new OutputStreamWriter(out, UTF_8)
  private var headerDone = false

  private def version(e: OsmEntity): Int = versionPolicy match {
    case "remove" => 0
    case "fake" => 1
    case _ => e.version
  }

  def writeHeader(boundsDeg: Option[(Double, Double, Double, Double)]): Unit = {
    w.write("<?xml version='1.0' encoding='UTF-8'?>\n")
    val apiVersion = if (versionPolicy == "remove") "version='0.5'" else "version='0.6'"
    w.write(s"<osm $apiVersion generator='splitter' upload='false'>\n")
    boundsDeg.foreach { case (minLat, minLon, maxLat, maxLon) =>
      w.write("<bounds minlat='" + minLat.toString + "' minlon='" + minLon.toString +
        "' maxlat='" + maxLat.toString + "' maxlon='" + maxLon.toString + "'/>\n")
    }
    headerDone = true
  }

  private def ensureHeader(): Unit = if (!headerDone) writeHeader(None)

  private def writeTags(e: OsmEntity): Unit =
    e.tags.foreach { t =>
      w.write("<tag k='" + escapeAttr(t.key) + "' v='" + escapeAttr(t.value) + "'/>\n")
    }

  def write(e: OsmEntity): Unit = {
    ensureHeader()
    e.kind match {
      case OsmKind.Node =>
        w.write("<node id='" + e.id + "' lat='" + formatCoord7(e.lat7) +
          "' lon='" + formatCoord7(e.lon7))
        if (versionPolicy != "remove") w.write("' version='" + version(e))
        if (e.tags.nonEmpty) {
          w.write("'>\n"); writeTags(e); w.write("</node>\n")
        } else w.write("'/>\n")
      case OsmKind.Way =>
        w.write("<way id='" + e.id)
        if (versionPolicy != "remove") w.write("' version='" + version(e))
        w.write("'>\n")
        e.refs.foreach(r => w.write("<nd ref='" + r + "'/>\n"))
        writeTags(e)
        w.write("</way>\n")
      case OsmKind.Relation =>
        w.write("<relation id='" + e.id)
        if (versionPolicy != "remove") w.write("' version='" + version(e))
        w.write("'>\n")
        e.members.foreach { m =>
          if (m.ref != 0) {
            w.write("<member type='" + escapeAttr(m.mtype) + "' ref='" + m.ref +
              "' role='")
            if (m.role != null) w.write(escapeAttr(m.role))
            w.write("'/>\n")
          }
        }
        writeTags(e)
        w.write("</relation>\n")
      case other => throw new IllegalArgumentException(s"unknown kind $other")
    }
  }

  def finish(): Unit = {
    ensureHeader()
    w.write("</osm>\n")
    w.flush()
  }
}
