package graft.formats

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream, EOFException, InputStream, OutputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.{Deflater, Inflater}
import scala.collection.mutable

/**
 * OSM PBF codec implemented directly against the PUBLIC format
 * specification (https://wiki.openstreetmap.org/wiki/PBF_Format and the
 * OSMPBF fileformat.proto / osmformat.proto schemas): a hand-rolled
 * protobuf wire layer (varint / zigzag / length-delimited / packed) —
 * no protobuf runtime needed — plus zlib blob compression via the JDK
 * Deflater/Inflater.
 *
 * Framing: repeated [int32-BE length][BlobHeader][Blob]. BlobHeader
 * {1:type, 3:datasize}; Blob {1:raw | 2:raw_size + 3:zlib_data}.
 * OSMHeader blob: HeaderBlock {1:bbox{1:left,2:right,3:top,4:bottom
 * sint64 nanodeg}, 4:required_features, 16:writingprogram}. OSMData
 * blob: PrimitiveBlock {1:stringtable{1:s*}, 2:group*, 17:granularity,
 * 19:lat_offset, 20:lon_offset}; PrimitiveGroup {1:nodes, 2:dense,
 * 3:ways, 4:relations}; DenseNodes {1:id packed sint64 delta,
 * 5:denseinfo, 8:lat, 9:lon packed sint64 delta, 10:keys_vals packed};
 * Way {1:id, 2:keys, 3:vals, 8:refs packed sint64 delta}; Relation
 * {1:id, 2:keys, 3:vals, 8:roles_sid, 9:memids packed sint64 delta,
 * 10:types packed enum node=0/way=1/relation=2}.
 *
 * The reference emits this format through the osmpbf library
 * (/root/reference/src/uk/me/parabola/splitter/writer/BinaryMapWriter.java:
 * dense nodes :187-232, delta refs :280-301, member types :329-343,
 * header features :484-497, batch limit 1000 :54) and reads it via
 * parser/BinaryMapParser.java — behavior mirrored here, bytes defined
 * by the public spec.
 *
 * Coordinates: nanodeg = offset + granularity*raw; the canonical
 * 1e-7 unit is nanodeg/100 (granularity defaults to 100 so raw IS the
 * 1e-7 value in practice).
 */
object PbfWire {
  @inline def zigzag(n: Long): Long = (n << 1) ^ (n >> 63)
  @inline def unzigzag(u: Long): Long = (u >>> 1) ^ -(u & 1L)

  final class Out(val bos: ByteArrayOutputStream = new ByteArrayOutputStream()) {
    def varint(v: Long): Unit = {
      var u = v
      while ((u & ~0x7fL) != 0) { bos.write(((u & 0x7f) | 0x80).toInt); u >>>= 7 }
      bos.write(u.toInt)
    }
    def key(field: Int, wire: Int): Unit = varint((field.toLong << 3) | wire)
    def int(field: Int, v: Long): Unit = { key(field, 0); varint(v) }
    def sint(field: Int, v: Long): Unit = { key(field, 0); varint(zigzag(v)) }
    def bytes(field: Int, b: Array[Byte]): Unit = {
      key(field, 2); varint(b.length.toLong); bos.write(b, 0, b.length)
    }
    def string(field: Int, s: String): Unit = bytes(field, s.getBytes(UTF_8))
    def message(field: Int, m: Out): Unit = bytes(field, m.toBytes)
    def packedVarint(field: Int, vs: Iterable[Long]): Unit = if (vs.nonEmpty) {
      val p = new Out(); vs.foreach(p.varint); bytes(field, p.toBytes)
    }
    def packedSint(field: Int, vs: Iterable[Long]): Unit = if (vs.nonEmpty) {
      val p = new Out(); vs.foreach(v => p.varint(zigzag(v))); bytes(field, p.toBytes)
    }
    def toBytes: Array[Byte] = bos.toByteArray
  }

  /** Cursor over one serialized message. */
  final class In(buf: Array[Byte], start: Int, end: Int) {
    def this(buf: Array[Byte]) = this(buf, 0, buf.length)
    private var pos = start
    def hasMore: Boolean = pos < end
    def varint(): Long = {
      var result = 0L; var shift = 0
      var b = buf(pos) & 0xff; pos += 1
      while ((b & 0x80) != 0) {
        result |= (b & 0x7fL) << shift; shift += 7
        b = buf(pos) & 0xff; pos += 1
      }
      result | (b.toLong << shift)
    }
    /** returns (field, wire); for wire 2 follow with sub()/rawBytes(). */
    def tag(): (Int, Int) = {
      val k = varint()
      ((k >>> 3).toInt, (k & 7).toInt)
    }
    def sub(): In = {
      val len = varint().toInt
      val s = new In(buf, pos, pos + len)
      pos += len
      s
    }
    def rawBytes(): Array[Byte] = {
      val len = varint().toInt
      val b = java.util.Arrays.copyOfRange(buf, pos, pos + len)
      pos += len
      b
    }
    def str(): String = {
      val len = varint().toInt
      val s = new String(buf, pos, len, UTF_8)
      pos += len
      s
    }
    def skip(wire: Int): Unit = wire match {
      case 0 => varint()
      case 1 => pos += 8
      case 2 => val len = varint().toInt; pos += len // NOT `pos += varint()`: += reads pos before varint() advances it
      case 5 => pos += 4
      case w => throw new java.io.IOException(s"unsupported wire type $w")
    }
    def packedLongs(): Array[Long] = {
      val s = sub()
      val b = mutable.ArrayBuilder.make[Long]
      while (s.hasMore) b += s.varint()
      b.result()
    }
  }

  def deflate(raw: Array[Byte]): Array[Byte] = {
    val d = new Deflater()
    d.setInput(raw); d.finish()
    val out = new ByteArrayOutputStream(raw.length / 2 + 64)
    val tmp = new Array[Byte](8192)
    while (!d.finished()) out.write(tmp, 0, d.deflate(tmp))
    d.end()
    out.toByteArray
  }

  def inflate(z: Array[Byte], rawSize: Int): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(z)
    val out = new Array[Byte](rawSize)
    var off = 0
    while (off < rawSize && !inf.finished()) {
      val n = inf.inflate(out, off, rawSize - off)
      if (n == 0 && inf.needsInput()) throw new java.io.IOException("truncated zlib blob")
      off += n
    }
    inf.end()
    out
  }
}

/** One length-framed file block, pre-inflation. */
final case class PbfBlock(blockType: String, data: Array[Byte])

object PbfCodec {
  import PbfWire._

  // ---- block framing ------------------------------------------------------

  def writeBlock(out: OutputStream, blockType: String, payload: Array[Byte],
      compress: Boolean = true): Unit = {
    val blob = new Out()
    if (compress) {
      blob.int(2, payload.length.toLong)
      blob.bytes(3, deflate(payload))
    } else blob.bytes(1, payload)
    val blobBytes = blob.toBytes
    val header = new Out()
    header.string(1, blockType)
    header.int(3, blobBytes.length.toLong)
    val headerBytes = header.toBytes
    val dos = new DataOutputStream(out)
    dos.writeInt(headerBytes.length)
    dos.write(headerBytes)
    dos.write(blobBytes)
  }

  /** Read the next [len][BlobHeader][Blob] frame; None at EOF. */
  def readBlock(in: DataInputStream): Option[PbfBlock] = {
    val headerLen =
      try in.readInt()
      catch { case _: EOFException => return None }
    val headerBytes = new Array[Byte](headerLen)
    in.readFully(headerBytes)
    var blockType = ""
    var datasize = -1
    val h = new In(headerBytes)
    while (h.hasMore) h.tag() match {
      case (1, 2) => blockType = h.str()
      case (3, 0) => datasize = h.varint().toInt
      case (_, w) => h.skip(w)
    }
    if (datasize < 0) throw new java.io.IOException("BlobHeader missing datasize")
    val blobBytes = new Array[Byte](datasize)
    in.readFully(blobBytes)
    Some(PbfBlock(blockType, inflateBlob(blobBytes)))
  }

  def inflateBlob(blobBytes: Array[Byte]): Array[Byte] = {
    val b = new In(blobBytes)
    var raw: Array[Byte] = null
    var rawSize = -1
    var zlib: Array[Byte] = null
    while (b.hasMore) b.tag() match {
      case (1, 2) => raw = b.rawBytes()
      case (2, 0) => rawSize = b.varint().toInt
      case (3, 2) => zlib = b.rawBytes()
      case (_, w) => b.skip(w)
    }
    if (raw != null) raw
    else if (zlib != null) {
      if (rawSize < 0) throw new java.io.IOException("zlib blob without raw_size")
      inflate(zlib, rawSize)
    } else throw new java.io.IOException("Blob with no payload (unsupported compression?)")
  }

  // ---- header block -------------------------------------------------------

  def headerBlockBytes(bounds: Option[OsmBounds], requiredFeatures: Seq[String],
      writingProgram: String): Array[Byte] = {
    val hb = new Out()
    bounds.foreach { b =>
      val bb = new Out()
      // HeaderBBox sint64 nanodegrees: 1e-7 units * 100
      bb.sint(1, b.minLon7 * 100L)
      bb.sint(2, b.maxLon7 * 100L)
      bb.sint(3, b.maxLat7 * 100L)
      bb.sint(4, b.minLat7 * 100L)
      hb.message(1, bb)
    }
    requiredFeatures.foreach(hb.string(4, _))
    hb.string(16, writingProgram)
    hb.toBytes
  }

  def parseHeaderBounds(headerBlock: Array[Byte]): Option[OsmBounds] = {
    val h = new In(headerBlock)
    var res: Option[OsmBounds] = None
    while (h.hasMore) h.tag() match {
      case (1, 2) =>
        val bb = h.sub()
        var left = 0L; var right = 0L; var top = 0L; var bottom = 0L
        while (bb.hasMore) bb.tag() match {
          case (1, 0) => left = unzigzag(bb.varint())
          case (2, 0) => right = unzigzag(bb.varint())
          case (3, 0) => top = unzigzag(bb.varint())
          case (4, 0) => bottom = unzigzag(bb.varint())
          case (_, w) => bb.skip(w)
        }
        res = Some(OsmBounds(bottom / 100, left / 100, top / 100, right / 100))
      case (_, w) => h.skip(w)
    }
    res
  }

  // ---- primitive block decode --------------------------------------------

  /** Decode one OSMData block into entities, honoring the read spec. */
  def decodePrimitiveBlock(block: Array[Byte], spec: OsmReadSpec = OsmReadSpec()): Vector[OsmEntity] = {
    var strings: Array[String] = Array("")
    var granularity = 100L
    var latOffset = 0L
    var lonOffset = 0L
    val groups = mutable.ArrayBuffer.empty[Array[Byte]]
    val top = new In(block)
    while (top.hasMore) top.tag() match {
      case (1, 2) =>
        val st = top.sub()
        val b = mutable.ArrayBuffer.empty[String]
        while (st.hasMore) st.tag() match {
          case (1, 2) => b += st.str()
          case (_, w) => st.skip(w)
        }
        strings = b.toArray
      case (2, 2) => groups += top.rawBytes()
      case (17, 0) => granularity = top.varint()
      case (19, 0) => latOffset = top.varint()
      case (20, 0) => lonOffset = top.varint()
      case (_, w) => top.skip(w)
    }
    @inline def to7(raw: Long, offset: Long): Int =
      Math.toIntExact(Math.floorDiv(offset + granularity * raw, 100L))

    val out = Vector.newBuilder[OsmEntity]
    for (g <- groups) {
      val gr = new In(g)
      while (gr.hasMore) gr.tag() match {
        case (1, 2) => // plain Node
          val n = gr.sub()
          if (!spec.nodes) () // payload already consumed by sub()
          else {
            var id = 0L; var lat = 0L; var lon = 0L
            var keys = Array.emptyLongArray; var vals = Array.emptyLongArray
            while (n.hasMore) n.tag() match {
              case (1, 0) => id = unzigzag(n.varint())
              case (2, 2) => keys = n.packedLongs()
              case (3, 2) => vals = n.packedLongs()
              case (8, 0) => lat = unzigzag(n.varint())
              case (9, 0) => lon = unzigzag(n.varint())
              case (_, w) => n.skip(w)
            }
            val tags =
              if (spec.tags)
                keys.toVector.zip(vals.toVector).map { case (k, v) =>
                  OsmTag(strings(k.toInt), strings(v.toInt))
                }
              else Vector.empty
            out += OsmEntity(OsmKind.Node, id, to7(lat, latOffset), to7(lon, lonOffset),
              hasCoords = true, 0, tags, Vector.empty, Vector.empty)
          }
        case (2, 2) => // DenseNodes
          val d = gr.sub()
          if (!spec.nodes) ()
          else {
            var ids = Array.emptyLongArray
            var lats = Array.emptyLongArray
            var lons = Array.emptyLongArray
            var keysVals = Array.emptyLongArray
            var versions = Array.emptyLongArray
            while (d.hasMore) d.tag() match {
              case (1, 2) => ids = d.packedLongs().map(unzigzag)
              case (5, 2) =>
                val di = d.sub()
                while (di.hasMore) di.tag() match {
                  case (1, 2) => versions = di.packedLongs()
                  case (_, w) => di.skip(w)
                }
              case (8, 2) => lats = d.packedLongs().map(unzigzag)
              case (9, 2) => lons = d.packedLongs().map(unzigzag)
              case (10, 2) => keysVals = d.packedLongs()
              case (_, w) => d.skip(w)
            }
            var id = 0L; var lat = 0L; var lon = 0L
            var kv = 0
            var i = 0
            while (i < ids.length) {
              id += ids(i); lat += lats(i); lon += lons(i)
              val tags = Vector.newBuilder[OsmTag]
              if (keysVals.nonEmpty) {
                while (kv < keysVals.length && keysVals(kv) != 0) {
                  val k = strings(keysVals(kv).toInt)
                  val v = strings(keysVals(kv + 1).toInt)
                  if (spec.tags) tags += OsmTag(k, v)
                  kv += 2
                }
                kv += 1 // the 0 delimiter
              }
              val version = if (versions.nonEmpty) versions(i).toInt else 0
              out += OsmEntity(OsmKind.Node, id, to7(lat, latOffset), to7(lon, lonOffset),
                hasCoords = true, version, tags.result(), Vector.empty, Vector.empty)
              i += 1
            }
          }
        case (3, 2) => // Way
          val wy = gr.sub()
          if (!spec.ways) ()
          else {
            var id = 0L
            var keys = Array.emptyLongArray; var vals = Array.emptyLongArray
            var refs = Array.emptyLongArray
            var version = 0
            while (wy.hasMore) wy.tag() match {
              case (1, 0) => id = wy.varint()
              case (2, 2) => keys = wy.packedLongs()
              case (3, 2) => vals = wy.packedLongs()
              case (4, 2) =>
                val info = wy.sub()
                while (info.hasMore) info.tag() match {
                  case (1, 0) => version = info.varint().toInt
                  case (_, w) => info.skip(w)
                }
              case (8, 2) =>
                var acc = 0L
                refs = wy.packedLongs().map(unzigzag).map { d => acc += d; acc }
              case (_, w) => wy.skip(w)
            }
            val tags =
              if (spec.tags)
                keys.toVector.zip(vals.toVector).map { case (k, v) =>
                  OsmTag(strings(k.toInt), strings(v.toInt))
                }
              else Vector.empty
            out += OsmEntity(OsmKind.Way, id, 0, 0, hasCoords = false, version,
              tags, refs.toVector, Vector.empty)
          }
        case (4, 2) => // Relation
          val rl = gr.sub()
          if (!spec.relations) ()
          else {
            var id = 0L
            var keys = Array.emptyLongArray; var vals = Array.emptyLongArray
            var roles = Array.emptyLongArray
            var memids = Array.emptyLongArray
            var types = Array.emptyLongArray
            var version = 0
            while (rl.hasMore) rl.tag() match {
              case (1, 0) => id = rl.varint()
              case (2, 2) => keys = rl.packedLongs()
              case (3, 2) => vals = rl.packedLongs()
              case (4, 2) =>
                val info = rl.sub()
                while (info.hasMore) info.tag() match {
                  case (1, 0) => version = info.varint().toInt
                  case (_, w) => info.skip(w)
                }
              case (8, 2) => roles = rl.packedLongs()
              case (9, 2) =>
                var acc = 0L
                memids = rl.packedLongs().map(unzigzag).map { d => acc += d; acc }
              case (10, 2) => types = rl.packedLongs()
              case (_, w) => rl.skip(w)
            }
            val members = (0 until memids.length).toVector.map { i =>
              val t = types(i) match {
                case 0 => OsmKind.Node
                case 1 => OsmKind.Way
                case _ => OsmKind.Relation
              }
              OsmMember(t, memids(i), strings(roles(i).toInt))
            }
            val tags =
              if (spec.tags)
                keys.toVector.zip(vals.toVector).map { case (k, v) =>
                  OsmTag(strings(k.toInt), strings(v.toInt))
                }
              else Vector.empty
            out += OsmEntity(OsmKind.Relation, id, 0, 0, hasCoords = false,
              version, tags, Vector.empty, members)
          }
        case (_, w) => gr.skip(w)
      }
    }
    out.result()
  }
}

/**
 * Streaming PBF reader over a whole file/stream.
 */
final class PbfReader(in: InputStream, spec: OsmReadSpec = OsmReadSpec())
    extends Iterator[OsmEntity] with AutoCloseable {
  private val din = new DataInputStream(in)
  var bounds: Option[OsmBounds] = None

  private var pending: Iterator[OsmEntity] = Iterator.empty
  private var done = false

  @annotation.tailrec
  private def fill(): Unit = {
    if (!pending.hasNext && !done) {
      PbfCodec.readBlock(din) match {
        case None => done = true
        case Some(PbfBlock("OSMHeader", data)) =>
          bounds = PbfCodec.parseHeaderBounds(data)
          fill()
        case Some(PbfBlock("OSMData", data)) =>
          pending = PbfCodec.decodePrimitiveBlock(data, spec).iterator
          fill()
        case Some(_) => fill() // unknown block types must be skipped
      }
    }
  }

  fill()
  override def hasNext: Boolean = { fill(); pending.hasNext }
  override def next(): OsmEntity = { fill(); pending.next() }
  override def close(): Unit = din.close()
}

/**
 * PBF writer: dense nodes, granularity 100, zlib blobs, one primitive
 * group per block, batches of `batchLimit` entities of one kind
 * (the reference's configBatchLimit(1000), BinaryMapWriter.java:54).
 * Version policy: "keep"/"fake" emit DenseInfo/Info (JOSM needs a
 * version ≥ 1 — BinaryMapWriter.java:131-141); "remove" omits info
 * except dense (which pins version 1 like the reference).
 */
final class PbfWriter(out: OutputStream, versionPolicy: String = "keep",
    writingProgram: String = "splitterspark", batchLimit: Int = 1000) {
  import PbfWire._

  private var headerDone = false
  private val batch = mutable.ArrayBuffer.empty[OsmEntity]
  private var batchKind: String = null

  def writeHeader(bounds: Option[OsmBounds]): Unit = {
    val payload = PbfCodec.headerBlockBytes(bounds,
      Seq("OsmSchema-V0.6", "DenseNodes"), writingProgram)
    PbfCodec.writeBlock(out, "OSMHeader", payload)
    headerDone = true
  }

  private def ensureHeader(): Unit = if (!headerDone) writeHeader(None)

  private def writeVersionOf(e: OsmEntity): Int = versionPolicy match {
    case "remove" => 0
    case "fake" => 1
    case _ => e.version
  }

  def write(e: OsmEntity): Unit = {
    ensureHeader()
    if (batchKind != null && (batchKind != e.kind || batch.size >= batchLimit)) flushBatch()
    batchKind = e.kind
    batch += e
  }

  private def stringTable(entities: Seq[OsmEntity]): (mutable.LinkedHashMap[String, Int], Out) = {
    val idx = mutable.LinkedHashMap.empty[String, Int]
    idx.put("", 0)
    def add(s: String): Unit = if (!idx.contains(s)) idx.put(s, idx.size)
    entities.foreach { e =>
      e.tags.foreach { t => add(t.key); add(t.value) }
      e.members.foreach(m => add(m.role))
    }
    val st = new Out()
    idx.keys.foreach(st.string(1, _))
    (idx, st)
  }

  private def flushBatch(): Unit = {
    if (batch.isEmpty) return
    val entities = batch.toVector
    batch.clear()
    val kind = batchKind
    batchKind = null

    val (idx, st) = stringTable(entities)
    val group = new Out()
    kind match {
      case OsmKind.Node =>
        val dense = new Out()
        dense.packedSint(1, deltas(entities.map(_.id)))
        if (versionPolicy != "remove") {
          val di = new Out()
          di.packedVarint(1, entities.map(e => math.max(writeVersionOf(e), 1).toLong))
          di.packedSint(2, entities.map(_ => 0L))
          di.packedSint(3, entities.map(_ => 0L))
          di.packedSint(4, entities.map(_ => 0L))
          di.packedSint(5, entities.map(_ => 0L))
          dense.message(5, di)
        }
        dense.packedSint(8, deltas(entities.map(_.lat7.toLong)))
        dense.packedSint(9, deltas(entities.map(_.lon7.toLong)))
        if (entities.exists(_.tags.nonEmpty)) {
          val kv = mutable.ArrayBuffer.empty[Long]
          entities.foreach { e =>
            e.tags.foreach { t => kv += idx(t.key).toLong; kv += idx(t.value).toLong }
            kv += 0L
          }
          dense.packedVarint(10, kv)
        }
        group.message(2, dense)
      case OsmKind.Way =>
        entities.foreach { e =>
          val wy = new Out()
          wy.int(1, e.id)
          wy.packedVarint(2, e.tags.map(t => idx(t.key).toLong))
          wy.packedVarint(3, e.tags.map(t => idx(t.value).toLong))
          writeInfo(wy, e)
          wy.packedSint(8, deltas(e.refs))
          group.message(3, wy)
        }
      case OsmKind.Relation =>
        entities.foreach { e =>
          val rl = new Out()
          rl.int(1, e.id)
          rl.packedVarint(2, e.tags.map(t => idx(t.key).toLong))
          rl.packedVarint(3, e.tags.map(t => idx(t.value).toLong))
          writeInfo(rl, e)
          rl.packedVarint(8, e.members.map(m => idx(m.role).toLong))
          rl.packedSint(9, deltas(e.members.map(_.ref)))
          rl.packedVarint(10, e.members.map(m => m.mtype match {
            case OsmKind.Node => 0L
            case OsmKind.Way => 1L
            case _ => 2L
          }))
          group.message(4, rl)
        }
      case other => throw new IllegalStateException(s"unknown kind $other")
    }

    val block = new Out()
    block.message(1, st)
    block.message(2, group)
    block.int(17, 100L) // granularity (raw units ARE 1e-7 degrees)
    PbfCodec.writeBlock(out, "OSMData", block.toBytes)
  }

  private def writeInfo(m: Out, e: OsmEntity): Unit =
    if (versionPolicy != "remove") {
      val v = writeVersionOf(e)
      if (v != 0) {
        val info = new Out()
        info.int(1, v.toLong)
        m.message(4, info)
      }
    }

  private def deltas(vs: Seq[Long]): Seq[Long] = {
    var last = 0L
    vs.map { v => val d = v - last; last = v; d }
  }

  def finish(): Unit = {
    ensureHeader()
    flushBatch()
    out.flush()
  }
}
