package graft

import java.io.ByteArrayOutputStream

import graft.formats._

/**
 * The corpus + writer configuration behind the checked-in golden PBF
 * fixture (`src/test/resources/golden/golden.pbf`). The reference's
 * own PBF writer (writer/BinaryMapWriter.java:40-521) needs the
 * external crosby protobuf classes, which are absent in this sandbox,
 * so K2 cannot be byte-compared to the reference binary the way o5m
 * and xml are; this fixture pins the format against silent drift
 * instead: it was produced ONCE by [[bytes]] and RefFormatParitySpec
 * asserts the writer still reproduces it byte-for-byte (and the
 * reader still decodes it to [[corpus]]).
 *
 * Everything here is arithmetic — no RNG, no clock — so the fixture
 * regenerates identically on any JVM. The zlib layer (JDK Deflater,
 * default level) is the one component that could legally change
 * across JDK releases; the spec therefore ALSO compares at the
 * inflated-block level, so a deflate drift is distinguishable from a
 * real format regression.
 *
 * Regenerate (only after an intentional format change):
 *   sbt -batch "Test/runMain graft.GoldenPbf src/test/resources/golden/golden.pbf"
 */
object GoldenPbf {

  val bounds: OsmBounds = OsmBounds(-500000000L, -300000000L, 600000000L, 700000000L)

  /** 50-entity batches: 140 nodes / 60 ways / 12 relations exercise
    * multi-block output for every kind plus dense-node tag streams,
    * delta ids/coords/refs and all three member types. */
  val batchLimit = 50

  def corpus: Vector[OsmEntity] = {
    val keys = Vector("highway", "name", "amenity", "building", "natural", "ref")
    val vals = Vector("yes", "no", "primary", "Café Zum Löwen", "it's <b>&\ttricky\n", "water")
    def tags(i: Int, n: Int): Vector[OsmTag] =
      Vector.tabulate(n)(j => OsmTag(keys((i * 7 + j) % keys.size) + (if (j > 2) s"_$j" else ""),
        vals((i * 11 + j * 3) % vals.size)))
    val nodes = Vector.tabulate(140) { i =>
      OsmEntity.node(1000L + i * 3, ((i * 2654435761L) % 1700000001L - 850000000L).toInt,
        ((i * 40503L * 40503L) % 3600000001L - 1800000000L).toInt,
        version = 1 + i % 5,
        tags = if (i % 3 == 0) tags(i, i % 4) else Vector.empty)
    }
    val ways = Vector.tabulate(60) { i =>
      OsmEntity.way(500000L + i * 7,
        Vector.tabulate(2 + i % 8)(j => 1000L + ((i * 31 + j * 17) % 140) * 3),
        version = 1 + i % 3, tags = tags(i, 1 + i % 3))
    }
    val rels = Vector.tabulate(12) { i =>
      val members = Vector.tabulate(1 + i % 5) { j =>
        (i + j) % 3 match {
          case 0 => OsmMember(OsmKind.Node, 1000L + ((i * 13 + j) % 140) * 3, "")
          case 1 => OsmMember(OsmKind.Way, 500000L + ((i * 5 + j) % 60) * 7,
            Vector("outer", "inner", "via")((i + 2 * j) % 3))
          case _ => OsmMember(OsmKind.Relation, 900000L + (i + j + 1) % 12, "subarea")
        }
      }
      OsmEntity.relation(900000L + i, members, version = 1 + i % 2,
        tags = OsmTag("type", "multipolygon") +: tags(i, i % 2))
    }
    nodes ++ ways ++ rels
  }

  def bytes: Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val w = new PbfWriter(bos, "keep", batchLimit = batchLimit)
    w.writeHeader(Some(bounds))
    corpus.foreach(w.write)
    w.finish()
    bos.toByteArray
  }

  def main(args: Array[String]): Unit = {
    val out = java.nio.file.Paths.get(args.headOption
      .getOrElse("src/test/resources/golden/golden.pbf"))
    java.nio.file.Files.createDirectories(out.getParent)
    java.nio.file.Files.write(out, bytes)
    println(s"wrote ${bytes.length} bytes to $out")
  }
}
