package graft

import java.io.{BufferedInputStream, ByteArrayInputStream, ByteArrayOutputStream}
import scala.util.Random

import graft.formats._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Round-trip and cross-format consistency for the OSM file codecs
 * (S1-S3 sources / K1-K3 sink payloads). Golden parity against the
 * REFERENCE o5m/xml parsers is in RefFormatParitySpec.
 */
class FormatsSpec extends AnyFunSuite {

  /** Deterministic corpus: nodes (tagged + bare), ways, relations. */
  def corpus(seed: Int, nNodes: Int = 400, nWays: Int = 60, nRels: Int = 20): Vector[OsmEntity] = {
    val rnd = new Random(seed)
    val keys = Vector("highway", "name", "amenity", "building", "natural", "ref")
    val vals = Vector("yes", "no", "primary", "Café Zum Löwen", "it's <b>&\ttricky\n", "water")
    def tags(n: Int): Vector[OsmTag] =
      Vector.tabulate(n)(i => OsmTag(keys(rnd.nextInt(keys.size)) + (if (i > 2) s"_$i" else ""),
        vals(rnd.nextInt(vals.size))))
    val nodes = Vector.tabulate(nNodes) { i =>
      OsmEntity.node(1000L + i * 3, rnd.between(-850000000, 850000000),
        rnd.between(-1800000000, 1800000000), version = 1 + rnd.nextInt(5),
        tags = if (i % 3 == 0) tags(rnd.nextInt(4)) else Vector.empty)
    }
    val ways = Vector.tabulate(nWays) { i =>
      OsmEntity.way(500000L + i * 7,
        Vector.fill(2 + rnd.nextInt(8))(1000L + rnd.nextInt(nNodes) * 3),
        version = 1 + rnd.nextInt(3), tags = tags(1 + rnd.nextInt(3)))
    }
    val rels = Vector.tabulate(nRels) { i =>
      val members = Vector.fill(1 + rnd.nextInt(5)) {
        rnd.nextInt(3) match {
          case 0 => OsmMember(OsmKind.Node, 1000L + rnd.nextInt(nNodes) * 3, "")
          case 1 => OsmMember(OsmKind.Way, 500000L + rnd.nextInt(nWays) * 7,
            Vector("outer", "inner", "via")(rnd.nextInt(3)))
          case _ => OsmMember(OsmKind.Relation, 900000L + rnd.nextInt(nRels), "subarea")
        }
      }
      OsmEntity.relation(900000L + i, members, version = 1 + rnd.nextInt(2),
        tags = OsmTag("type", "multipolygon") +: tags(rnd.nextInt(2)))
    }
    nodes ++ ways ++ rels
  }

  val testBounds = OsmBounds(-500000000L, -300000000L, 600000000L, 700000000L)

  def o5mBytes(es: Seq[OsmEntity], policy: String = "keep",
      bounds: Option[OsmBounds] = Some(testBounds)): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val w = new O5mWriter(bos, policy)
    bounds.foreach(w.writeBounds)
    es.foreach(w.write)
    w.finish()
    bos.toByteArray
  }

  def o5mRead(bytes: Array[Byte], spec: OsmReadSpec = OsmReadSpec()): (Vector[OsmEntity], Option[OsmBounds]) = {
    val r = new O5mReader(new BufferedInputStream(new ByteArrayInputStream(bytes)), spec)
    val es = r.toVector
    (es, r.bounds)
  }

  def xmlBytes(es: Seq[OsmEntity], policy: String = "keep"): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val w = new OsmXmlWriter(bos, policy)
    w.writeHeader(Some((-50.0, -30.0, 60.0, 70.0)))
    es.foreach(w.write)
    w.finish()
    bos.toByteArray
  }

  def xmlRead(bytes: Array[Byte], spec: OsmReadSpec = OsmReadSpec()): Vector[OsmEntity] =
    new OsmXmlReader(new ByteArrayInputStream(bytes), spec).toVector

  def pbfBytes(es: Seq[OsmEntity], policy: String = "keep"): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val w = new PbfWriter(bos, policy)
    w.writeHeader(Some(testBounds))
    es.foreach(w.write)
    w.finish()
    bos.toByteArray
  }

  def pbfRead(bytes: Array[Byte], spec: OsmReadSpec = OsmReadSpec()): (Vector[OsmEntity], Option[OsmBounds]) = {
    val r = new PbfReader(new ByteArrayInputStream(bytes), spec)
    val es = r.toVector
    (es, r.bounds)
  }

  test("o5m round trip preserves every entity, bounds, versions and tag order") {
    val es = corpus(42)
    val (back, bounds) = o5mRead(o5mBytes(es))
    assert(bounds === Some(testBounds))
    assert(back === es)
  }

  test("o5m string table ring survives wraparound (> 15000 distinct pairs)") {
    // 16k distinct pairs force eviction; repeats of EARLY pairs after the
    // wrap must be re-emitted raw (not as stale refs) and re-read equal
    val many = Vector.tabulate(8200) { i =>
      OsmEntity.node(i.toLong * 2 + 1, i * 100, -i * 50, version = 1,
        tags = Vector(OsmTag(s"k$i", s"v$i"), OsmTag(s"k${i / 2}", s"v${i / 2}")))
    }
    val (back, _) = o5mRead(o5mBytes(many))
    assert(back === many)
  }

  test("o5m dataset-level skipping honors the read spec without desync") {
    val es = corpus(7)
    val bytes = o5mBytes(es)
    val (nodesOnly, _) = o5mRead(bytes, OsmReadSpec(ways = false, relations = false))
    assert(nodesOnly === es.filter(_.kind == OsmKind.Node))
    val (waysOnly, _) = o5mRead(bytes, OsmReadSpec(nodes = false, relations = false))
    assert(waysOnly === es.filter(_.kind == OsmKind.Way))
    val (relsOnly, _) = o5mRead(bytes, OsmReadSpec(nodes = false, ways = false))
    assert(relsOnly === es.filter(_.kind == OsmKind.Relation))
    val (noTags, _) = o5mRead(bytes, OsmReadSpec(tags = false))
    assert(noTags === es.map(_.copy(tags = Vector.empty)))
  }

  test("o5m version policies: remove drops, fake pins 1, keep passes through") {
    val es = corpus(3, nNodes = 20, nWays = 5, nRels = 2)
    val (removed, _) = o5mRead(o5mBytes(es, "remove"))
    assert(removed === es.map(_.copy(version = 0)))
    val (faked, _) = o5mRead(o5mBytes(es, "fake"))
    assert(faked === es.map(_.copy(version = 1)))
  }

  test("xml round trip preserves entities incl. escaping-heavy tags") {
    val es = corpus(11)
    assert(xmlRead(xmlBytes(es)) === es)
  }

  test("xml coordinate formatting matches the reference writer branches") {
    // int-insert branch keeps trailing zeros (OSMXMLWriter.java:231-247)
    assert(XmlCodec.formatCoord7(467000000) === "46.7000000")
    assert(XmlCodec.formatCoord7(-467000000) === "-46.7000000")
    assert(XmlCodec.formatCoord7(123456789) === "12.3456789")
    // DecimalFormat 0.####### branch trims trailing zeros
    assert(XmlCodec.formatCoord7(1234567) === "0.1234567")
    assert(XmlCodec.formatCoord7(-500) === "-0.00005")
    assert(XmlCodec.formatCoord7(5000000) === "0.5")
    assert(XmlCodec.formatCoord7(0) === "0")
    assert(XmlCodec.formatCoord7(10000000) === "1.0000000")
    assert(XmlCodec.formatCoord7(-10000001) === "-1.0000001")
  }

  test("xml attribute escaping is the reference's exact entity set") {
    assert(XmlCodec.escapeAttr("a'b&c<d\ne\rf\tg>h\"i") ===
      "a&apos;b&amp;c&lt;d&#xa;e&#xd;f&#9;g>h\"i")
  }

  test("xml reader skips action=delete and honors skip flags with early stop") {
    val raw =
      """<?xml version='1.0' encoding='UTF-8'?>
        |<osm version='0.6' generator='splitter' upload='false'>
        |<bounds minlat='-1.0' minlon='-2.0' maxlat='3.0' maxlon='4.0'/>
        |<node id='1' lat='10.5' lon='-20.25' version='2'/>
        |<node id='2' lat='0.0000001' lon='0' action='delete'/>
        |<way id='5' version='1'>
        |<nd ref='1'/>
        |<tag k='highway' v='primary'/>
        |</way>
        |<relation id='9' version='1'>
        |<member type='way' ref='5' role='outer'/>
        |</relation>
        |</osm>
        |""".stripMargin.getBytes("UTF-8")
    val all = xmlRead(raw)
    assert(all.map(_.id) === Vector(1L, 5L, 9L))
    assert(all.head.lat7 === 105000000 && all.head.lon7 === -202500000)
    val rd = new OsmXmlReader(new ByteArrayInputStream(raw),
      OsmReadSpec(ways = false, relations = false))
    assert(rd.toVector.map(_.id) === Vector(1L)) // stopped at first way
    assert(rd.bounds === Some(OsmBounds(-10000000L, -20000000L, 30000000L, 40000000L)))
  }

  test("pbf round trip preserves entities across multiple batches and kinds") {
    val es = corpus(99, nNodes = 2500, nWays = 1200, nRels = 30) // > batchLimit
    val (back, bounds) = pbfRead(pbfBytes(es))
    assert(bounds === Some(testBounds))
    assert(back === es)
  }

  test("pbf read spec prunes kinds and tags") {
    val es = corpus(5)
    val bytes = pbfBytes(es)
    val (ways, _) = pbfRead(bytes, OsmReadSpec(nodes = false, relations = false))
    assert(ways === es.filter(_.kind == OsmKind.Way))
    val (noTags, _) = pbfRead(bytes, OsmReadSpec(tags = false))
    assert(noTags === es.map(_.copy(tags = Vector.empty)))
  }

  test("pbf version policies mirror the reference binary writer") {
    val es = corpus(13, nNodes = 10, nWays = 4, nRels = 2)
    // remove: ways/rels lose version; dense nodes still carry no info block
    val (removed, _) = pbfRead(pbfBytes(es, "remove"))
    assert(removed === es.map(_.copy(version = 0)))
    // fake: everything reads back version 1
    val (faked, _) = pbfRead(pbfBytes(es, "fake"))
    assert(faked === es.map(_.copy(version = 1)))
  }

  test("cross-format: identical corpus through o5m, xml and pbf reads identically") {
    val es = corpus(2024)
    val (fromO5m, _) = o5mRead(o5mBytes(es))
    val fromXml = xmlRead(xmlBytes(es))
    val (fromPbf, _) = pbfRead(pbfBytes(es))
    assert(fromO5m === es)
    assert(fromXml === es)
    assert(fromPbf === es)
  }

  // ---- randomized fuzz: writer -> reader must invert on ANY entity mix ----

  /** scalacheck without the scalatestplus bridge (not in the offline cache) */
  private def check(p: org.scalacheck.Prop): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(120), p)
    assert(res.passed, res.status.toString)
  }

  private val fuzzChars = org.scalacheck.Gen.frequency(
    8 -> org.scalacheck.Gen.alphaNumChar,
    2 -> org.scalacheck.Gen.oneOf('é', 'ß', '中', '€', '\'', '"', '<', '>', '&',
      ' ', '\t', '\n', '\r'))
  private val strGen = org.scalacheck.Gen.choose(0, 24)
    .flatMap(n => org.scalacheck.Gen.listOfN(n, fuzzChars)).map(_.mkString)
  // non-empty keys: "" maps to string-table slot 0, the dense-node kv
  // stream's end-of-entity sentinel
  private val keyGen = org.scalacheck.Gen.choose(1, 20)
    .flatMap(n => org.scalacheck.Gen.listOfN(n, fuzzChars)).map(_.mkString)
  private val tagsGen = org.scalacheck.Gen.choose(0, 5).flatMap(n =>
    org.scalacheck.Gen.listOfN(n, org.scalacheck.Gen.zip(keyGen, strGen))
      .map(_.map { case (k, v) => OsmTag(k, v) }.toVector))
  private val idGen = org.scalacheck.Gen.choose(1L, 1L << 40)

  private val entityGen: org.scalacheck.Gen[OsmEntity] = {
    import org.scalacheck.Gen
    val node = for {
      id <- idGen; lat <- Gen.choose(-900000000, 900000000)
      lon <- Gen.choose(-1800000000, 1800000000)
      v <- Gen.choose(1, 9); ts <- tagsGen
    } yield OsmEntity.node(id, lat, lon, version = v, tags = ts)
    val way = for {
      id <- idGen; n <- Gen.choose(0, 10); refs <- Gen.listOfN(n, idGen)
      v <- Gen.choose(1, 9); ts <- tagsGen
    } yield OsmEntity.way(id, refs.toVector, version = v, tags = ts)
    val rel = for {
      id <- idGen; n <- Gen.choose(0, 6)
      ms <- Gen.listOfN(n, for {
        t <- Gen.oneOf(OsmKind.Node, OsmKind.Way, OsmKind.Relation)
        r <- idGen; role <- strGen
      } yield OsmMember(t, r, role))
      v <- Gen.choose(1, 9); ts <- tagsGen
    } yield OsmEntity.relation(id, ms.toVector, version = v, tags = ts)
    Gen.frequency(5 -> node, 3 -> way, 2 -> rel)
  }
  private val corpusGen = org.scalacheck.Gen.choose(0, 40)
    .flatMap(n => org.scalacheck.Gen.listOfN(n, entityGen)).map(_.toVector)

  test("property: o5m, xml and pbf round-trip ANY random entity mix") {
    check(org.scalacheck.Prop.forAll(corpusGen) { es =>
      val (fromO5m, _) = o5mRead(o5mBytes(es))
      val fromXml = xmlRead(xmlBytes(es))
      val (fromPbf, _) = pbfRead(pbfBytes(es))
      fromO5m == es && fromXml == es && fromPbf == es
    })
  }

  test("property: pbf round-trips with tiny batches (block boundary fuzz)") {
    check(org.scalacheck.Prop.forAll(corpusGen) { es =>
      val bos = new ByteArrayOutputStream()
      val w = new PbfWriter(bos, "keep", batchLimit = 3)
      w.writeHeader(Some(testBounds))
      es.foreach(w.write)
      w.finish()
      val (back, _) = pbfRead(bos.toByteArray)
      back == es
    })
  }

  test("xml reader ignores real-world metadata attributes it does not model") {
    // planet dumps carry timestamp/uid/user/changeset/visible on every
    // element; the reader must skip them by name, not by position
    val raw =
      """<?xml version='1.0' encoding='UTF-8'?>
        |<osm version="0.6" generator="openstreetmap-cgimap 2.0.1">
        |<node id="7" lat="1.5" lon="-2.25" version="3" timestamp="2024-01-02T03:04:05Z" uid="42" user="mapper &amp; co" changeset="123456" visible="true"/>
        |<way id="9" version="2" timestamp="2024-01-02T03:04:05Z" uid="42" user="m" changeset="123457">
        |<nd ref="7"/>
        |<tag k="highway" v="residential"/>
        |</way>
        |</osm>
        |""".stripMargin.getBytes("UTF-8")
    val es = xmlRead(raw)
    assert(es.map(e => (e.kind, e.id, e.version)) ===
      Vector((OsmKind.Node, 7L, 3), (OsmKind.Way, 9L, 2)))
    assert(es.head.lat7 === 15000000 && es.head.lon7 === -22500000)
    assert(es(1).refs === Vector(7L) && es(1).tags === Vector(OsmTag("highway", "residential")))
  }

  test("xml inputs read through bz2 and zip wrappers like the reference openFile") {
    import graft.sources.OsmFileSource
    val es = corpus(31, nNodes = 50, nWays = 10, nRels = 3)
    val xml = xmlBytes(es)

    assert(OsmFileSource.formatOf("planet.osm.bz2") === "xml")
    assert(OsmFileSource.formatOf("planet.osm.zip") === "xml")
    assert(OsmFileSource.formatOf("extract.xml.bz2") === "xml")
    intercept[IllegalArgumentException](OsmFileSource.formatOf("planet.tar"))

    // bz2: commons-compress stream (reference strips the BZ magic for
    // the ant-era CBZip2InputStream; the compress codec handles it)
    val bzBytes = {
      val bos = new ByteArrayOutputStream()
      val z = new org.apache.commons.compress.compressors.bzip2.BZip2CompressorOutputStream(bos)
      z.write(xml); z.close()
      bos.toByteArray
    }
    val fromBz = xmlRead2(OsmFileSource.xmlStream("planet.osm.bz2",
      new ByteArrayInputStream(bzBytes)))
    assert(fromBz === es)

    // zip: pick the entry starting with the basename minus .zip —
    // decoys before it must be skipped (Utils.java:101-115)
    val zipBytes = {
      val bos = new ByteArrayOutputStream()
      val z = new java.util.zip.ZipOutputStream(bos)
      z.putNextEntry(new java.util.zip.ZipEntry("README.txt"))
      z.write("not the data".getBytes("UTF-8")); z.closeEntry()
      z.putNextEntry(new java.util.zip.ZipEntry("planet.osm"))
      z.write(xml); z.closeEntry()
      z.close()
      bos.toByteArray
    }
    val fromZip = xmlRead2(OsmFileSource.xmlStream("/data/planet.osm.zip",
      new ByteArrayInputStream(zipBytes)))
    assert(fromZip === es)

    // zip with no matching entry throws like the reference
    val badZip = {
      val bos = new ByteArrayOutputStream()
      val z = new java.util.zip.ZipOutputStream(bos)
      z.putNextEntry(new java.util.zip.ZipEntry("other.osm"))
      z.write(xml); z.closeEntry(); z.close()
      bos.toByteArray
    }
    intercept[java.io.IOException](OsmFileSource.xmlStream("planet.osm.zip",
      new ByteArrayInputStream(badZip)))
  }

  private def xmlRead2(in: java.io.InputStream): Vector[OsmEntity] =
    new OsmXmlReader(in, OsmReadSpec()).toVector

  test("o5m varint codecs invert for the full value range") {
    val values = Seq(0L, 1L, -1L, 63L, 64L, -64L, -65L, 127L, 128L, 8191L,
      Int.MaxValue.toLong, Int.MinValue.toLong, Long.MaxValue / 2, -(Long.MaxValue / 2))
    for (v <- values) {
      val bos = new ByteArrayOutputStream()
      O5mVarint.writeSigned(v, bos)
      val in = new ByteArrayInputStream(bos.toByteArray)
      var result = 0L; var shift = 0; var b = in.read()
      while ((b & 0x80) != 0) { result |= (b & 0x7fL) << shift; shift += 7; b = in.read() }
      result |= b.toLong << shift
      assert(O5mVarint.unzigzag(result) === v, s"value $v")
    }
  }
}
