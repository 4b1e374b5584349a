package graft.sources

import java.io.{BufferedInputStream, InputStream, ObjectInputStream, ObjectOutputStream}
import java.util.zip.GZIPInputStream

import scala.collection.mutable

import graft.formats._
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{EqualTo, Filter, In}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/**
 * OSM file ingestion (sources S1-S3 of SURVEY.md §2) as a Spark DSv2
 * source: `spark.read.format("osm").load("planet.osm.pbf")` yields the
 * entity DataFrame below. The reference's skip-flag machinery
 * (MapProcessor.skipTags/skipNodes/skipWays/skipRels, honored by each
 * parser — parser/O5mMapParser.java:165-182 jumps whole datasets,
 * parser/BinaryMapParser.java skips primitive groups) maps onto
 * Catalyst here: column pruning that drops `tags` stops tag
 * materialization at the decoder, and `kind = 'node'` / `kind IN (...)`
 * filters are pushed into the scan so skipped kinds are never decoded.
 *
 * Scale design: PBF and o5m files are split into byte ranges and
 * decoded IN PARALLEL. For PBF each OSMData block carries its own
 * string table and delta basis, so any block boundary is a valid split
 * point; a reader resyncs to the first block-header signature at or
 * after its range start and owns every block that STARTS inside its
 * range (the classic splittable-container contract, so one
 * planet-sized .pbf fans out across a cluster instead of serializing
 * on one task). For o5m the equivalent entry points are the 0xff RESET
 * markers — delta state and the string-table ring restart there (the
 * same property the reference exploits to seek-skip,
 * O5mMapParser.java:129-201) — but only when tagged with the
 * high-entropy sync dataset [[graft.formats.O5mWriter]] emits in
 * `resetEvery` mode (a bare 1-byte marker is not recognizable from
 * mid-file); the planner probes the file head for the sync signature
 * and plans byte ranges only then, so files written by this engine fan
 * out fully while foreign o5m layouts read sequentially (exactly the
 * reference's behavior for them). xml remains one task per file (one
 * document) — parallelism across files.
 */
object OsmFileSource {
  val schema: StructType = StructType(Seq(
    StructField("kind", StringType, nullable = false),
    StructField("id", LongType, nullable = false),
    StructField("lat7", IntegerType, nullable = false),
    StructField("lon7", IntegerType, nullable = false),
    StructField("version", IntegerType, nullable = false),
    StructField("tags", ArrayType(StructType(Seq(
      StructField("key", StringType, nullable = false),
      StructField("value", StringType, nullable = false))), containsNull = false)),
    StructField("refs", ArrayType(LongType, containsNull = false)),
    StructField("members", ArrayType(StructType(Seq(
      StructField("mtype", StringType, nullable = false),
      StructField("ref", LongType, nullable = false),
      StructField("role", StringType, nullable = false))), containsNull = false))))

  /** Convenience reader (same as format("osm")). */
  def read(spark: SparkSession, paths: String*): DataFrame =
    spark.read.format("osm").load(paths: _*)

  def formatOf(path: String): String = {
    val p = path.toLowerCase
    if (p.endsWith(".pbf")) "pbf"
    else if (p.endsWith(".o5m")) "o5m"
    else if (p.endsWith(".osm") || p.endsWith(".xml") ||
      Seq(".gz", ".bz2", ".zip").exists(c => p.endsWith(".osm" + c) || p.endsWith(".xml" + c)))
      "xml"
    else throw new IllegalArgumentException(
      s"unsupported OSM input (expect .osm[.gz|.bz2|.zip] / .o5m / .pbf): $path")
  }

  /** Decompression for XML inputs, matching the reference's openFile
    * (Utils.java:86-120): gz and bz2 streams, and for zip the first
    * entry whose name starts with the archive's basename minus ".zip"
    * (planet.osm.zip -> an entry named planet.osm*). */
  def xmlStream(path: String, raw: InputStream): InputStream = {
    val p = path.toLowerCase
    if (p.endsWith(".gz")) new GZIPInputStream(raw)
    else if (p.endsWith(".bz2"))
      new org.apache.commons.compress.compressors.bzip2.BZip2CompressorInputStream(raw)
    else if (p.endsWith(".zip")) {
      val zis = new java.util.zip.ZipInputStream(raw)
      val base = new Path(path).getName
      val want = base.substring(0, base.length - 4)
      var entry = zis.getNextEntry
      while (entry != null && !entry.getName.startsWith(want)) entry = zis.getNextEntry
      if (entry == null) throw new java.io.IOException(
        s"no entry starting with $want inside $base")
      zis
    } else raw
  }
}

/** Hadoop Configuration is not Serializable; standard writable wrapper. */
final class SerializableHadoopConf(@transient var value: Configuration) extends Serializable {
  private def writeObject(out: ObjectOutputStream): Unit = {
    out.defaultWriteObject(); value.write(out)
  }
  private def readObject(in: ObjectInputStream): Unit = {
    in.defaultReadObject(); value = new Configuration(false); value.readFields(in)
  }
}

/** DataSourceRegister entry point (META-INF/services). */
final class OsmDataSource extends TableProvider with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "osm"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = OsmFileSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new OsmTable(OsmDataSource.pathsOf(new CaseInsensitiveStringMap(properties)))
}

object OsmDataSource {
  /** Shared mapper (thread-safe once configured) — streaming offsets
    * serialize every micro-batch; don't rebuild it each call. */
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** Real JSON parsing (Jackson ships on Spark's classpath): paths with
    * commas or quotes must round-trip, not split on bare commas. */
  private[sources] def parseJsonStringArray(json: String): Seq[String] = {
    val node = mapper.readTree(json)
    require(node.isArray, s"expected a JSON string array, got: $json")
    (0 until node.size()).map { i =>
      val e = node.get(i)
      require(e.isTextual, s"expected string entries, got: $e")
      e.asText()
    }
  }

  private[sources] def toJsonStringArray(items: Seq[String]): String = {
    val arr = mapper.createArrayNode()
    items.foreach(arr.add)
    mapper.writeValueAsString(arr)
  }

  /** load(path*) arrives as "paths" (JSON array) or single "path". */
  def pathsOf(options: CaseInsensitiveStringMap): Seq[String] = {
    val multi = Option(options.get("paths")).map(parseJsonStringArray).getOrElse(Seq.empty)
    val single = Option(options.get("path")).toSeq
    val all = (multi ++ single).distinct
    if (all.isEmpty) throw new IllegalArgumentException("format(\"osm\") requires a path")
    all
  }
}

final class OsmTable(paths: Seq[String]) extends Table with SupportsRead {
  override def name(): String = s"osm(${paths.mkString(",")})"
  override def schema(): StructType = OsmFileSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new OsmScanBuilder(paths)
}

final class OsmScanBuilder(paths: Seq[String]) extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters {

  private var required: StructType = OsmFileSource.schema
  private var kinds: Option[Set[String]] = None
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, residual) = filters.partition {
      case EqualTo("kind", _: String) => true
      case In("kind", vs) if vs.forall(_.isInstanceOf[String]) => true
      case _ => false
    }
    accepted.foreach {
      case EqualTo("kind", v: String) =>
        kinds = Some(kinds.getOrElse(Set("node", "way", "relation")) intersect Set(v))
      case In("kind", vs) =>
        kinds = Some(kinds.getOrElse(Set("node", "way", "relation"))
          .intersect(vs.map(_.asInstanceOf[String]).toSet))
      case _ => ()
    }
    pushed = accepted
    residual
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = {
    val k = kinds.getOrElse(Set("node", "way", "relation"))
    val spec = OsmReadSpec(
      nodes = k("node"), ways = k("way"), relations = k("relation"),
      tags = required.fieldNames.contains("tags"))
    new OsmScan(paths, required, spec)
  }
}

final case class OsmInputPartition(path: String, format: String, start: Long, end: Long)
  extends InputPartition

final class OsmScan(paths: Seq[String], required: StructType, spec: OsmReadSpec)
    extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"OsmScan(spec=$spec, columns=${required.fieldNames.mkString(",")})"

  override def planInputPartitions(): Array[InputPartition] =
    OsmScan.partitionsOf(OsmScan.discover(paths)).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new OsmReaderFactory(required.fieldNames, spec,
      new SerializableHadoopConf(SparkSession.active.sessionState.newHadoopConf()))

  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new OsmMicroBatchStream(paths, required, spec)
}

object OsmScan {
  /** (path, length) of every non-empty data file under `paths`. */
  def discover(paths: Seq[String]): Seq[(String, Long)] = {
    val conf = SparkSession.active.sessionState.newHadoopConf()
    paths.flatMap { p =>
      val path = new Path(p)
      val fs = path.getFileSystem(conf)
      val files =
        if (fs.getFileStatus(path).isDirectory) fs.listStatus(path).toSeq.filter(_.isFile)
        else Seq(fs.getFileStatus(path))
      files.filter(_.getLen > 0).map(st => (st.getPath.toString, st.getLen))
    }
  }

  /** Stat-per-file variant for callers that only have names (the
    * streaming offsets carry no lengths). */
  def partitionsOfPaths(files: Seq[String]): Seq[InputPartition] = {
    val conf = SparkSession.active.sessionState.newHadoopConf()
    partitionsOf(files.map { f =>
      val path = new Path(f)
      (f, path.getFileSystem(conf).getFileStatus(path).getLen)
    })
  }

  /** Batch-identical partition planning: PBF and o5m files split into
    * byte ranges at `spark.sql.files.maxPartitionBytes`, xml one task
    * per file. Takes (path, length) so the discover() listing's stats
    * are reused — one metadata round-trip per file, not two. */
  def partitionsOf(files: Seq[(String, Long)]): Seq[InputPartition] = {
    val spark = SparkSession.active
    val conf = spark.sessionState.newHadoopConf()
    val maxSplit = spark.sessionState.conf.filesMaxPartitionBytes
    val parts = mutable.ArrayBuffer.empty[InputPartition]
    files.foreach { case (f, len) =>
      val path = new Path(f)
      val fs = path.getFileSystem(conf)
      val fmt = OsmFileSource.formatOf(f)
      val splittable = fmt == "pbf" ||
        (fmt == "o5m" && O5mRangeIterator.isSplittable(fs, path, len))
      if (splittable) {
        var off = 0L
        while (off < len) {
          val n = math.min(maxSplit, len - off)
          parts += OsmInputPartition(f, fmt, off, off + n)
          off += n
        }
      } else parts += OsmInputPartition(f, fmt, 0L, len)
    }
    parts.toSeq
  }
}

/** Offset = the sorted set of files already visible: each micro-batch
  * reads exactly the files that appeared since the previous offset. */
final case class OsmFilesOffset(files: Seq[String])
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = OsmDataSource.toJsonStringArray(files.sorted)
}

object OsmFilesOffset {
  def fromJson(json: String): OsmFilesOffset =
    OsmFilesOffset(OsmDataSource.parseJsonStringArray(json))
}

/**
 * Micro-batch streaming over a watched OSM directory (the diff-ingest
 * pattern: new `.o5m`/`.pbf`/`.osm.gz` drops become batches). Files
 * are assumed immutable once visible — the standard file-stream
 * contract (and how OSM extracts/diffs are published). Each batch
 * plans the SAME partitions as the batch scan, so a new planet-sized
 * PBF drop still fans out across the cluster by byte range.
 */
final class OsmMicroBatchStream(paths: Seq[String], required: StructType,
    spec: OsmReadSpec)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream {
  import org.apache.spark.sql.connector.read.streaming.Offset

  override def initialOffset(): Offset = OsmFilesOffset(Seq.empty)

  override def latestOffset(): Offset =
    OsmFilesOffset(OsmScan.discover(paths).map(_._1).sorted)

  override def deserializeOffset(json: String): Offset =
    OsmFilesOffset.fromJson(json)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val seen = start.asInstanceOf[OsmFilesOffset].files.toSet
    val fresh = end.asInstanceOf[OsmFilesOffset].files.filterNot(seen)
    OsmScan.partitionsOfPaths(fresh).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new OsmReaderFactory(required.fieldNames, spec,
      new SerializableHadoopConf(SparkSession.active.sessionState.newHadoopConf()))

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

final class OsmReaderFactory(fields: Array[String], spec: OsmReadSpec,
    conf: SerializableHadoopConf) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[OsmInputPartition]
    new OsmPartitionReader(p, fields, spec, conf.value)
  }
}

final class OsmPartitionReader(p: OsmInputPartition, fields: Array[String],
    spec: OsmReadSpec, conf: Configuration) extends PartitionReader[InternalRow] {

  private val iter: Iterator[OsmEntity] = {
    val fs = new Path(p.path).getFileSystem(conf)
    p.format match {
      case "pbf" => new PbfRangeIterator(fs, new Path(p.path), p.start, p.end, spec)
      case "o5m" => new O5mRangeIterator(fs, new Path(p.path), p.start, p.end, spec)
      case _ =>
        val raw: InputStream = new BufferedInputStream(fs.open(new Path(p.path)), 1 << 16)
        new OsmXmlReader(OsmFileSource.xmlStream(p.path, raw), spec)
    }
  }

  private var row: InternalRow = _

  private def toRow(e: OsmEntity): InternalRow = {
    val vals = new Array[Any](fields.length)
    var i = 0
    while (i < fields.length) {
      vals(i) = fields(i) match {
        case "kind" => UTF8String.fromString(e.kind)
        case "id" => e.id
        case "lat7" => e.lat7
        case "lon7" => e.lon7
        case "version" => e.version
        case "tags" => new GenericArrayData(e.tags.map(t =>
          new GenericInternalRow(Array[Any](
            UTF8String.fromString(t.key), UTF8String.fromString(t.value)))).toArray[Any])
        case "refs" => new GenericArrayData(e.refs.toArray)
        case "members" => new GenericArrayData(e.members.map(m =>
          new GenericInternalRow(Array[Any](
            UTF8String.fromString(m.mtype), m.ref,
            UTF8String.fromString(m.role)))).toArray[Any])
        case other => throw new IllegalStateException(s"unknown column $other")
      }
      i += 1
    }
    new GenericInternalRow(vals)
  }

  override def next(): Boolean =
    if (iter.hasNext) { row = toRow(iter.next()); true } else false

  override def get(): InternalRow = row

  override def close(): Unit = iter match {
    case c: AutoCloseable => c.close()
    case _ => ()
  }
}

/**
 * Iterates the entities of every PBF file block whose frame starts in
 * [start, end). Resync: a frame begins with a 4-byte big-endian
 * BlobHeader length followed by the BlobHeader message, whose first
 * field is always `1: type` — i.e. bytes 0x0A 0x07 "OSMData" (or 0x09
 * "OSMHeader"). The scanner looks for that signature, validates the
 * frame (sane header length + datasize, and the FOLLOWING frame must
 * also carry the signature or be EOF) and decodes from there; false
 * positives inside compressed payloads fail the two-frame check.
 */
final class PbfRangeIterator(fs: FileSystem, path: Path, start: Long, end: Long,
    spec: OsmReadSpec) extends Iterator[OsmEntity] with AutoCloseable {

  // the signatures MUST initialize before framePos: resync runs in the ctor
  private val SigData: Array[Byte] =
    Array[Byte](0x0a, 0x07, 'O', 'S', 'M', 'D', 'a', 't', 'a')
  private val SigHeader: Array[Byte] =
    Array[Byte](0x0a, 0x09, 'O', 'S', 'M', 'H', 'e', 'a', 'd', 'e', 'r')

  private val fileLen = fs.getFileStatus(path).getLen
  private val in = fs.open(path)
  private var framePos: Long = if (start == 0L) 0L else resync(start)
  private var pending: Iterator[OsmEntity] = Iterator.empty
  private var closed = false

  /** Valid frame at `pos`? Returns the next frame position, or -1. */
  private def frameEndIfValid(pos: Long): Long = {
    if (pos + 4 > fileLen) return -1
    val head = new Array[Byte](4 + 64)
    in.readFully(pos, head, 0, math.min(head.length.toLong, fileLen - pos).toInt)
    val headerLen = ((head(0) & 0xff) << 24) | ((head(1) & 0xff) << 16) |
      ((head(2) & 0xff) << 8) | (head(3) & 0xff)
    if (headerLen < 10 || headerLen > 64 || pos + 4 + headerLen > fileLen) return -1
    val sigOk = SigData.indices.forall(i => head(4 + i) == SigData(i)) ||
      SigHeader.indices.forall(i => head(4 + i) == SigHeader(i))
    if (!sigOk) return -1
    // parse datasize (field 3, varint) from the remaining header bytes
    try {
      val hb = new Array[Byte](headerLen)
      in.readFully(pos + 4, hb, 0, headerLen)
      val h = new PbfWire.In(hb)
      var datasize = -1L
      while (h.hasMore) h.tag() match {
        case (3, 0) => datasize = h.varint()
        case (_, w) => h.skip(w)
      }
      if (datasize <= 0 || datasize > (1L << 25)) -1
      else pos + 4 + headerLen + datasize
    } catch { case _: Exception => -1 }
  }

  /** First valid frame start at or after `from` (may be >= end). */
  private def resync(from: Long): Long = {
    val window = 1 << 20
    val overlap = SigHeader.length + 4
    val buf = new Array[Byte](window)
    var base = from
    while (base < fileLen) {
      val n = math.min(window.toLong, fileLen - base).toInt
      in.readFully(base, buf, 0, n)
      var i = 0
      while (i + SigData.length <= n) {
        if (buf(i) == 0x0a && (buf(i + 1) == 0x07 || buf(i + 1) == 0x09)) {
          val sig = if (buf(i + 1) == 0x07) SigData else SigHeader
          if (i + sig.length <= n && sig.indices.forall(j => buf(i + j) == sig(j))) {
            val cand = base + i - 4 // 4-byte BE length precedes the header
            if (cand >= from) {
              val nxt = frameEndIfValid(cand)
              // two-frame validation kills in-payload false positives
              if (nxt > 0 && (nxt >= fileLen || frameEndIfValid(nxt) > 0)) return cand
            }
          }
        }
        i += 1
      }
      if (base + n >= fileLen) return fileLen
      base += n - overlap // re-scan the tail so straddling signatures are seen
    }
    fileLen
  }

  private def readFrame(pos: Long): (String, Array[Byte], Long) = {
    val lenBuf = new Array[Byte](4)
    in.readFully(pos, lenBuf, 0, 4)
    val headerLen = ((lenBuf(0) & 0xff) << 24) | ((lenBuf(1) & 0xff) << 16) |
      ((lenBuf(2) & 0xff) << 8) | (lenBuf(3) & 0xff)
    val hb = new Array[Byte](headerLen)
    in.readFully(pos + 4, hb, 0, headerLen)
    var blockType = ""
    var datasize = -1
    val h = new PbfWire.In(hb)
    while (h.hasMore) h.tag() match {
      case (1, 2) => blockType = h.str()
      case (3, 0) => datasize = h.varint().toInt
      case (_, w) => h.skip(w)
    }
    val blob = new Array[Byte](datasize)
    in.readFully(pos + 4 + headerLen, blob, 0, datasize)
    (blockType, PbfCodec.inflateBlob(blob), pos + 4 + headerLen + datasize)
  }

  private def fill(): Unit = {
    while (!pending.hasNext && framePos < end && framePos < fileLen) {
      val (blockType, data, nxt) = readFrame(framePos)
      framePos = nxt
      if (blockType == "OSMData")
        pending = PbfCodec.decodePrimitiveBlock(data, spec).iterator
    }
  }

  override def hasNext: Boolean = { fill(); pending.hasNext }
  override def next(): OsmEntity = { fill(); pending.next() }
  override def close(): Unit = if (!closed) { closed = true; in.close() }
}

/**
 * Iterates the entities of every o5m RESET segment whose 0xff marker
 * lies in [start, end). A reset marker clears the delta state and the
 * string-table ring (the property the reference's seek-skip relies on,
 * O5mMapParser.java:129-201 + reset :464-478), so it is a valid
 * parallel entry point exactly like a PBF block header — but the bare
 * 1-byte marker cannot be recognized from the middle of the file (any
 * payload byte can be 0xff, and a frame-walk from a false candidate
 * can lock onto the true dataset lattice and look consistent). Range
 * reads therefore only apply to files whose writer emitted the 19-byte
 * [[graft.formats.O5mConst.SyncSignature]] after every reset
 * ([[graft.formats.O5mWriter]] with `resetEvery` > 0; probed by
 * [[O5mRangeIterator.isSplittable]] before planning ranges): resync
 * scans for that signature, which is as unambiguous as a PBF
 * BlobHeader. Decoding then runs the ordinary sequential
 * [[graft.formats.O5mReader]] from the matched marker and stops at the
 * first reset at or past `end` — by writer construction every reset in
 * such files carries the signature, so the stop position is exactly
 * where the next partition's resync starts: partitions tile the file
 * with no gaps or overlaps.
 */
final class O5mRangeIterator(fs: FileSystem, path: Path, start: Long, end: Long,
    spec: OsmReadSpec) extends Iterator[OsmEntity] with AutoCloseable {
  import graft.formats.O5mConst.SyncSignature

  private val fileLen = fs.getFileStatus(path).getLen
  private val in = fs.open(path)
  private var closed = false

  /** First sync signature start in [from, end), or `end` if none. */
  private def resync(from: Long): Long = {
    val sig = SyncSignature
    val window = 1 << 20
    val buf = new Array[Byte](window)
    var base = from
    val limit = math.min(end, fileLen)
    while (base < limit) {
      val n = math.min(window.toLong, fileLen - base).toInt
      in.readFully(base, buf, 0, n)
      var i = 0
      // candidates must START in [from, end); the signature may finish
      // beyond end (it belongs to this range's last owned position)
      val scanLimit = math.min(n.toLong, limit - base).toInt
      while (i < scanLimit) {
        if (buf(i) == sig(0) && i + sig.length <= n &&
            sig.indices.forall(j => buf(i + j) == sig(j)))
          return base + i
        i += 1
      }
      if (base + n >= fileLen) return end
      // re-scan the tail so signatures straddling windows are seen
      base += math.max(scanLimit - sig.length, 1)
    }
    end
  }

  // one stream serves both roles: positional reads for resync, then a
  // seek + sequential reads for the decoder. A constructor failure
  // (truncated/corrupt range) must close it — the caller never gets a
  // reference to call close() on.
  private val reader: O5mReader =
    try {
      val segStart = if (start == 0L) 0L else resync(start)
      if (segStart >= end || segStart >= fileLen) null
      else {
        in.seek(segStart)
        new O5mReader(new BufferedInputStream(in, 1 << 16), spec,
          stopAtResetFrom = end - segStart)
      }
    } catch { case t: Throwable =>
      try in.close() catch { case _: Exception => () }
      throw t
    }

  override def hasNext: Boolean = reader != null && reader.hasNext
  override def next(): OsmEntity =
    if (reader == null) throw new NoSuchElementException else reader.next()
  override def close(): Unit = if (!closed) {
    closed = true
    if (reader != null) reader.close()
    try in.close() catch { case _: Exception => () }
  }
}

object O5mRangeIterator {
  /** Splittable o5m files carry a sync point right after the header
    * (writer ctor with `resetEvery` > 0), so one 64-byte probe of the
    * file head decides whether byte-range partitions are safe. Pass the
    * already-known file length — the planner statted the file once; a
    * second getFileStatus per file doubles the driver's metadata
    * round-trips on large shard directories. */
  def isSplittable(fs: FileSystem, path: Path, len: Long): Boolean = {
    val sig = graft.formats.O5mConst.SyncSignature
    val n = math.min(64L, len).toInt
    if (n < sig.length) return false
    val head = new Array[Byte](n)
    val in = fs.open(path)
    try in.readFully(0, head, 0, n) finally in.close()
    (0 to n - sig.length).exists(i => sig.indices.forall(j => head(i + j) == sig(j)))
  }
}
