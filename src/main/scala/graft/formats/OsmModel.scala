package graft.formats

/**
 * In-memory model for OSM entities flowing through the format codecs
 * (sources S1-S3 and per-tile sinks K1-K3 of SURVEY.md §2).
 *
 * Coordinates are carried as EXACT 1e-7-degree integers (`lat7`/`lon7`)
 * — the unit all three wire formats use natively (o5m stores
 * `(int)(deg*1e7)` deltas, PBF nanodegrees/granularity=100 is the same
 * unit, XML prints 7 decimal digits) — so a read→write round trip never
 * loses a unit to double rounding. Degrees views are derived
 * (`lat7 * 1e-7`).
 *
 * Reference semantics: elements mirror
 * /root/reference/src/uk/me/parabola/splitter/Element.java:22-85,
 * Node.java:20-50, Way/Relation (id, version, ordered tag list, way
 * refs, relation members with type/ref/role). Tag ORDER is preserved
 * (the reference keeps an ArrayList); the `created_by` drop the
 * reference applies in Element.addTag (Element.java:60-62) is applied
 * by the per-tile SINKS, not by the sources — a source must surface the
 * file's actual content.
 */
object OsmKind {
  val Node = "node"
  val Way = "way"
  val Relation = "relation"
}

final case class OsmTag(key: String, value: String)

/** mtype is "node" | "way" | "relation" (reference Relation.Member). */
final case class OsmMember(mtype: String, ref: Long, role: String)

/**
 * One OSM entity. For nodes `lat7`/`lon7` hold the coordinate;
 * for ways/relations they are 0 and `hasCoords` is false.
 */
final case class OsmEntity(
    kind: String,
    id: Long,
    lat7: Int,
    lon7: Int,
    hasCoords: Boolean,
    version: Int,
    tags: Vector[OsmTag],
    refs: Vector[Long],
    members: Vector[OsmMember]) {
  def lat: Double = lat7 * 1e-7
  def lon: Double = lon7 * 1e-7
}

object OsmEntity {
  def node(id: Long, lat7: Int, lon7: Int, version: Int = 0,
      tags: Vector[OsmTag] = Vector.empty): OsmEntity =
    OsmEntity(OsmKind.Node, id, lat7, lon7, hasCoords = true, version, tags,
      Vector.empty, Vector.empty)

  def way(id: Long, refs: Vector[Long], version: Int = 0,
      tags: Vector[OsmTag] = Vector.empty): OsmEntity =
    OsmEntity(OsmKind.Way, id, 0, 0, hasCoords = false, version, tags, refs,
      Vector.empty)

  def relation(id: Long, members: Vector[OsmMember], version: Int = 0,
      tags: Vector[OsmTag] = Vector.empty): OsmEntity =
    OsmEntity(OsmKind.Relation, id, 0, 0, hasCoords = false, version, tags,
      Vector.empty, members)
}

/** File-level bounding box in 1e-7-degree units. */
final case class OsmBounds(minLat7: Long, minLon7: Long, maxLat7: Long, maxLon7: Long)

/**
 * Which parts of the stream a reader must materialize. Mirrors the
 * reference's MapProcessor skip flags (AbstractMapProcessor
 * skipTags/skipNodes/skipWays/skipRels) that each parser honors —
 * o5m even jumps whole datasets without decoding
 * (O5mMapParser.java:165-182). The Spark source maps DSv2
 * column-pruning / kind-filter pushdown onto these flags.
 */
final case class OsmReadSpec(
    nodes: Boolean = true,
    ways: Boolean = true,
    relations: Boolean = true,
    tags: Boolean = true)
