package graft

import java.io.{BufferedInputStream, ByteArrayInputStream, ByteArrayOutputStream, File, FileInputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files
import java.util.zip.GZIPInputStream
import scala.sys.process._
import scala.util.Random

import graft.formats._
import graft.geo.MapUnits
import org.scalatest.funsuite.AnyFunSuite

/**
 * Differential golden test against the ACTUAL reference format codecs:
 * the unmodified reference writers (O5mMapWriter, OSMXMLWriter) and the
 * o5m parser (O5mMapParser) are compiled from /root/reference
 * (tools/refharness, RefFormats driver) and run on the same corpus as
 * the Scala codecs. Asserts:
 *  - our o5m/xml writer output is BYTE-IDENTICAL to the reference
 *    writers under every version policy (string-table ring, resets,
 *    varints, coordinate formatting all pinned);
 *  - the reference o5m parser reads our bytes back to the exact corpus
 *    (ids, versions, 1e-7 coords, tag order, member types/roles);
 *  - our readers consume reference-written files losslessly.
 */
class RefFormatParitySpec extends AnyFunSuite {

  private val MapId = 63240001

  private def repoFile(rel: String) = new File(new File(".").getCanonicalFile, rel)

  private lazy val refClasses: Option[File] = {
    if (!new File("/root/reference/src").isDirectory) None
    else {
      val out = repoFile("target/refharness")
      val marker = new File(out, "graft/refharness/RefFormats.class")
      val driver = repoFile("tools/refharness/driver/RefFormats.java")
      if (!marker.exists() || marker.lastModified < driver.lastModified) {
        val rc = Process(Seq("sh", repoFile("tools/refharness/build.sh").getPath,
          out.getPath)).!(ProcessLogger(_ => (), _ => ()))
        if (rc != 0) None else Some(out)
      } else Some(out)
    }
  }

  private def javaBin: String =
    new File(new File(System.getProperty("java.home"), "bin"), "java").getPath

  private def runRef(args: String*): Unit = {
    val cmd = Seq(javaBin, "-cp", refClasses.get.getPath, "graft.refharness.RefFormats") ++ args
    val rc = Process(cmd).!(ProcessLogger(_ => (), _ => ()))
    assert(rc == 0, s"RefFormats ${args.head} failed")
  }

  // ---- corpus --------------------------------------------------------------

  /** Deterministic parity corpus. Exercises: negative/positive coords,
    * tag values with every escaped char, a >250-byte pair (must bypass
    * the string table), pair repeats (ring back-references), empty and
    * non-empty roles, all three member types. No `created_by` (the
    * reference Element.addTag silently drops it) and no ref==0 members
    * (the reference XML writer skips those). */
  private def corpus: Vector[OsmEntity] = {
    val rnd = new Random(20260817)
    val keys = Vector("highway", "name", "amenity", "building", "natural", "ref")
    val vals = Vector("yes", "no", "primary", "Café Zum Löwen", "it's <b>&\ttricky\n\rx", "water",
      "x" * 260) // > STW_TAB_STR_MAX: written raw every time, never stored
    def tags(n: Int): Vector[OsmTag] =
      Vector.tabulate(n)(i => OsmTag(keys(rnd.nextInt(keys.size)) + (if (i > 2) s"_$i" else ""),
        vals(rnd.nextInt(vals.size))))
    val nodes = Vector.tabulate(900) { i =>
      OsmEntity.node(1000L + i * 3, rnd.between(-850000000, 850000000),
        rnd.between(-1800000000, 1800000000), version = 1 + rnd.nextInt(5),
        tags = if (i % 3 == 0) tags(rnd.nextInt(4)) else Vector.empty)
    }
    val ways = Vector.tabulate(120) { i =>
      OsmEntity.way(500000L + i * 7,
        Vector.fill(2 + rnd.nextInt(8))(1000L + rnd.nextInt(900) * 3),
        version = 1 + rnd.nextInt(3), tags = tags(1 + rnd.nextInt(3)))
    }
    val rels = Vector.tabulate(40) { i =>
      val members = Vector.fill(1 + rnd.nextInt(5)) {
        rnd.nextInt(3) match {
          case 0 => OsmMember(OsmKind.Node, 1000L + rnd.nextInt(900) * 3, "")
          case 1 => OsmMember(OsmKind.Way, 500000L + rnd.nextInt(120) * 7,
            Vector("outer", "inner", "via")(rnd.nextInt(3)))
          case _ => OsmMember(OsmKind.Relation, 900000L + rnd.nextInt(40), "subarea")
        }
      }
      OsmEntity.relation(900000L + i, members, version = 1 + rnd.nextInt(2),
        tags = OsmTag("type", "multipolygon") +: tags(rnd.nextInt(2)))
    }
    nodes ++ ways ++ rels
  }

  // Tile bounds in map units (the reference Area's native unit) and the
  // derived values each writer actually emits.
  private val (muMinLat, muMinLon, muMaxLat, muMaxLon) = (-2330169, -1398101, 2796203, 3262515)
  /** o5m bbox values: (long)(Utils.toDegrees(mu) * 1e7) truncated. */
  private def deg7(mu: Int): Long = (MapUnits.toDegrees(mu) * 1e7).toLong
  private val o5mBounds = OsmBounds(deg7(muMinLat), deg7(muMinLon), deg7(muMaxLat), deg7(muMaxLon))

  // ---- dump protocol (must mirror RefFormats.java) -------------------------

  private def esc(s: String): String =
    s.flatMap {
      case '\\' => "\\\\"
      case '\t' => "\\t"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case c => c.toString
    }

  private def dumpLine(e: OsmEntity): String = {
    val tags = e.tags.flatMap(t => Seq(esc(t.key), esc(t.value)))
    e.kind match {
      case OsmKind.Node =>
        (Seq("N", e.id, e.version, e.lat7, e.lon7) ++ tags).mkString("\t")
      case OsmKind.Way =>
        (Seq("W", e.id, e.version, e.refs.size) ++ e.refs ++ tags).mkString("\t")
      case _ =>
        val ms = e.members.flatMap(m => Seq(m.mtype, m.ref.toString, esc(m.role)))
        (Seq("R", e.id, e.version, e.members.size) ++ ms ++ tags).mkString("\t")
    }
  }

  private def writeDump(es: Seq[OsmEntity]): File = {
    val f = Files.createTempFile("refmt", ".dump").toFile
    Files.write(f.toPath, es.map(dumpLine).mkString("", "\n", "\n").getBytes(UTF_8))
    f.deleteOnExit()
    f
  }

  /** The B line the reference o5m parser emits for our written bbox:
    * same double pipeline as O5mMapParser.readBBox (100L*v*1e-9 ->
    * Utils.toMapUnit). */
  private def expectedBLine(b: OsmBounds): String = {
    val factor = 1d / 1000000000
    def mu(v7: Long): Int = MapUnits.toMapUnit((100L * v7).toDouble * factor)
    s"B\t${mu(b.minLat7)}\t${mu(b.minLon7)}\t${mu(b.maxLat7)}\t${mu(b.maxLon7)}"
  }

  private def refWrite(fmt: String, es: Seq[OsmEntity], policy: String): Array[Byte] = {
    val dump = writeDump(es)
    val outDir = Files.createTempDirectory("refmt_out").toFile
    runRef(s"write-$fmt", dump.getPath, outDir.getPath, MapId.toString, policy,
      muMinLat.toString, muMinLon.toString, muMaxLat.toString, muMaxLon.toString)
    val ext = if (fmt == "o5m") "o5m" else "osm.gz"
    val f = new File(outDir, f"$MapId%08d.$ext")
    val raw = Files.readAllBytes(f.toPath)
    f.delete(); outDir.delete()
    if (fmt == "o5m") raw
    else { // compare the uncompressed stream (gzip header is container framing)
      val in = new GZIPInputStream(new ByteArrayInputStream(raw))
      val bos = new ByteArrayOutputStream()
      in.transferTo(bos)
      bos.toByteArray
    }
  }

  private def ourO5m(es: Seq[OsmEntity], policy: String): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val w = new O5mWriter(bos, policy)
    w.writeBounds(o5mBounds)
    es.foreach(w.write)
    w.finish()
    bos.toByteArray
  }

  private def ourXml(es: Seq[OsmEntity], policy: String): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val w = new OsmXmlWriter(bos, policy)
    w.writeHeader(Some((MapUnits.toDegrees(muMinLat), MapUnits.toDegrees(muMinLon),
      MapUnits.toDegrees(muMaxLat), MapUnits.toDegrees(muMaxLon))))
    es.foreach(w.write)
    w.finish()
    bos.toByteArray
  }

  private def firstDiff(a: Array[Byte], b: Array[Byte]): String = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n && a(i) == b(i)) i += 1
    s"lengths ${a.length}/${b.length}, first diff at $i: " +
      s"${a.slice(math.max(0, i - 8), i + 8).map(x => f"${x & 0xff}%02x").mkString(" ")} vs " +
      s"${b.slice(math.max(0, i - 8), i + 8).map(x => f"${x & 0xff}%02x").mkString(" ")}"
  }

  private def withHarness(body: => Unit): Unit = {
    assume(refClasses.isDefined, "reference sources/javac unavailable")
    body
  }

  test("o5m writer bytes are identical to the reference O5mMapWriter (keep/fake/remove)") {
    withHarness {
      val es = corpus
      for (policy <- Seq("keep", "fake", "remove")) {
        val ref = refWrite("o5m", es, policy)
        val ours = ourO5m(es, policy)
        assert(ref.sameElements(ours), s"policy=$policy: ${firstDiff(ref, ours)}")
      }
    }
  }

  test("xml writer bytes are identical to the reference OSMXMLWriter (keep/remove)") {
    withHarness {
      val es = corpus
      for (policy <- Seq("keep", "remove")) {
        val ref = refWrite("xml", es, policy)
        val ours = ourXml(es, policy)
        assert(ref.sameElements(ours),
          s"policy=$policy: ${firstDiff(ref, ours)}\nref: ${new String(ref, UTF_8).take(400)}")
      }
    }
  }

  test("the reference o5m parser reads our bytes back to the exact corpus") {
    withHarness {
      val es = corpus
      val o5m = Files.createTempFile("ours", ".o5m").toFile
      Files.write(o5m.toPath, ourO5m(es, "keep"))
      val back = Files.createTempFile("ours", ".dump").toFile
      runRef("parse-o5m", o5m.getPath, back.getPath)
      val lines = new String(Files.readAllBytes(back.toPath), UTF_8).split("\n").toVector
      o5m.delete(); back.delete()
      val expected = expectedBLine(o5mBounds) +: es.map(dumpLine)
      assert(lines.size === expected.size)
      lines.zip(expected).zipWithIndex.foreach { case ((got, want), i) =>
        assert(got === want, s"line $i")
      }
    }
  }

  // ---- PBF golden fixture ---------------------------------------------------
  // The reference PBF writer needs the external crosby protobuf classes
  // (absent in-sandbox), so K2 is pinned by a checked-in golden file
  // instead of a reference byte-compare: see GoldenPbf's scaladoc.

  private def goldenPbfBytes: Array[Byte] = {
    val in = getClass.getResourceAsStream("/golden/golden.pbf")
    assert(in != null, "golden.pbf fixture missing from test resources")
    try in.readAllBytes() finally in.close()
  }

  /** (blockType, inflated payload) frames of a PBF byte stream. */
  private def pbfFrames(bytes: Array[Byte]): Vector[(String, Array[Byte])] = {
    val din = new java.io.DataInputStream(new ByteArrayInputStream(bytes))
    Iterator.continually(PbfCodec.readBlock(din)).takeWhile(_.isDefined)
      .map(_.get).map(b => (b.blockType, PbfCodec.inflateBlob(b.data))).toVector
  }

  test("pbf writer reproduces the checked-in golden fixture byte-for-byte") {
    val golden = goldenPbfBytes
    val fresh = GoldenPbf.bytes
    // Level 1 (diagnosability): the protobuf payloads must match even if
    // a future JDK's Deflater emits different (equally valid) zlib bytes.
    val gf = pbfFrames(golden); val ff = pbfFrames(fresh)
    assert(gf.size === ff.size)
    gf.zip(ff).zipWithIndex.foreach { case (((gt, gp), (ft, fp)), i) =>
      assert(gt === ft, s"frame $i type")
      assert(gp.sameElements(fp), s"frame $i payload: ${firstDiff(gp, fp)}")
    }
    // Level 2: the full file, zlib layer included, on this JDK.
    assert(golden.sameElements(fresh), firstDiff(golden, fresh))
  }

  test("pbf reader decodes the golden fixture to the exact corpus") {
    val r = new PbfReader(new ByteArrayInputStream(goldenPbfBytes))
    val back = r.toVector
    assert(r.bounds === Some(GoldenPbf.bounds))
    assert(back === GoldenPbf.corpus)
  }

  test("our readers consume reference-written o5m and xml losslessly") {
    withHarness {
      val es = corpus
      val refO5m = refWrite("o5m", es, "keep")
      val r = new O5mReader(new BufferedInputStream(new ByteArrayInputStream(refO5m)))
      val fromO5m = r.toVector
      assert(r.bounds === Some(o5mBounds))
      assert(fromO5m === es)

      val refXml = refWrite("xml", es, "keep")
      val xr = new OsmXmlReader(new ByteArrayInputStream(refXml))
      val fromXml = xr.toVector
      assert(fromXml === es)
      // header degrees are full-precision Double.toString; our reader rounds
      val expBounds = OsmBounds(
        math.round(MapUnits.toDegrees(muMinLat) * 1e7), math.round(MapUnits.toDegrees(muMinLon) * 1e7),
        math.round(MapUnits.toDegrees(muMaxLat) * 1e7), math.round(MapUnits.toDegrees(muMaxLon) * 1e7))
      assert(xr.bounds === Some(expBounds))
    }
  }
}
