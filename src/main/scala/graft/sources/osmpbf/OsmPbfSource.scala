package graft.sources.osmpbf

import java.util

import graft.sources.osmxml.OsmXmlSource
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 reader for OSM PBF files — the reference's preferred
  * input ("PBF is quickest", README.md:7; S1 in SURVEY.md §2.1).
  *
  * {{{
  *   spark.read.format("osm-pbf").option("kind", "nodes").load("planet.osm.pbf")
  * }}}
  *
  * Wire format per the public spec (wiki.openstreetmap.org/wiki/PBF_Format):
  * a sequence of [4-byte BE length][BlobHeader][Blob] frames; each
  * OSMData blob zlib-compresses a PrimitiveBlock (string table +
  * primitive groups; dense nodes are delta-coded). Decoded with the
  * hand-rolled [[ProtoReader]] and `java.util.zip.Inflater` — no
  * dependencies.
  *
  * Scale model — this is why PBF beats XML at 100 TB: the driver scans
  * only the ~16-byte frame headers to index blob offsets (no
  * decompression), then schedules ONE INPUT PARTITION PER DATA BLOB, so
  * a single planet file parallelizes across the cluster; each reader
  * seeks to its blob, inflates ~8k entities, and streams rows. Schemas
  * match the osm-xml source exactly.
  */
class OsmPbfSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "osm-pbf"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    OsmXmlSource.schemaFor(options.getOrDefault("kind", "nodes"))

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new OsmPbfTable(schema, properties.getOrDefault("kind", "nodes"),
      Option(properties.get("path")).toSeq)
}

private[osmpbf] class OsmPbfTable(schema: StructType, kind: String, paths: Seq[String])
    extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite {
  override def name(): String = s"osm-pbf($kind)"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE)

  /** Write side: one `.osm.pbf` file per task under the target
    * directory (an OSMHeader frame + one OSMData blob per 8k entities),
    * readable back by this source's directory/glob scan — the same
    * blob-parallel layout the read side exploits. Tasks write to a temp
    * name and rename on commit (idempotent under retries); `append`
    * mode only.
    */
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder = {
    require(paths.size == 1, "osm-pbf write needs exactly one target path")
    require(info.schema().fieldNames.sameElements(schema.fieldNames),
      s"osm-pbf($kind) write schema must be ${schema.fieldNames.mkString(", ")}; " +
        s"got ${info.schema().fieldNames.mkString(", ")}")
    new org.apache.spark.sql.connector.write.WriteBuilder {
      override def build(): org.apache.spark.sql.connector.write.Write =
        new org.apache.spark.sql.connector.write.Write {
          override def toBatch: org.apache.spark.sql.connector.write.BatchWrite =
            new PbfBatchWrite(kind, paths.head,
              new graft.sources.SerializableHadoopConf(
                org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf()))
        }
    }
  }

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch
        with org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns {
      private var required: StructType = schema
      override def pruneColumns(requiredSchema: StructType): Unit =
        required = requiredSchema
      override def build(): Scan = this
      override def readSchema(): StructType = required
      override def toBatch: Batch = this

      /** Index (file, offset, compressedLen) per OSMData blob by reading
        * frame headers only.
        */
      override def planInputPartitions(): Array[InputPartition] = {
        val conf = org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf()
        paths.flatMap { p =>
          val hp = new Path(p)
          val fs = hp.getFileSystem(conf)
          val files = fs.globStatus(hp) match {
            case null => Seq.empty
            case gs => gs.toSeq.flatMap(s =>
              if (s.isDirectory) fs.listStatus(s.getPath).filter(_.isFile).toSeq else Seq(s))
          }
          files.flatMap { st =>
            val in = fs.open(st.getPath)
            val parts = scala.collection.mutable.ArrayBuffer.empty[InputPartition]
            try {
              var offset = 0L
              val size = st.getLen
              while (offset < size) {
                val headerLen = in.readInt() // 4-byte BE
                val headerBytes = new Array[Byte](headerLen)
                in.readFully(headerBytes)
                val hr = new ProtoReader(headerBytes)
                var blobType = ""
                var dataSize = 0
                while (hr.hasNext) hr.readTag() match {
                  case (1, 2) => blobType = hr.readString()
                  case (3, 0) => dataSize = hr.readVarint().toInt
                  case (_, wt) => hr.skip(wt)
                }
                val dataOffset = offset + 4 + headerLen
                if (blobType == "OSMData")
                  parts += PbfBlobPartition(st.getPath.toString, dataOffset, dataSize)
                offset = dataOffset + dataSize
                in.seek(offset)
              }
            } finally in.close()
            parts
          }
        }.toArray
      }

      override def createReaderFactory(): PartitionReaderFactory =
        new PbfReaderFactory(kind, schema, required,
          new graft.sources.SerializableHadoopConf(
            org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf()))
    }
}

/** Top-level (serializable) factory — an anonymous one would capture
  * the non-serializable ScanBuilder. Ships the driver's Hadoop conf so
  * session-configured filesystem options reach the executor readers.
  */
private[osmpbf] class PbfReaderFactory(kind: String, full: StructType,
    required: StructType, conf: graft.sources.SerializableHadoopConf)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    graft.sources.Pruning.project(
      new PbfBlobReader(p.asInstanceOf[PbfBlobPartition], kind, conf.value),
      full, required)
}

private[osmpbf] case class PbfBlobPartition(path: String, offset: Long, length: Int)
    extends InputPartition

private[osmpbf] class PbfBatchWrite(kind: String, dir: String,
    conf: graft.sources.SerializableHadoopConf)
    extends org.apache.spark.sql.connector.write.BatchWrite {
  import org.apache.spark.sql.connector.write._

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new PbfDataWriterFactory(kind, dir, conf)
  override def commit(messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

private[osmpbf] class PbfDataWriterFactory(kind: String, dir: String,
    conf: graft.sources.SerializableHadoopConf)
    extends org.apache.spark.sql.connector.write.DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : org.apache.spark.sql.connector.write.DataWriter[InternalRow] =
    new PbfDataWriter(kind, dir, partitionId, taskId, conf.value)
}

private[osmpbf] case class PbfCommitMessage(path: String)
    extends org.apache.spark.sql.connector.write.WriterCommitMessage

/** Buffers rows and flushes one OSMData blob per `blockSize` entities;
  * writes to a task-unique temp file, renamed into place on commit so
  * task retries never leave partial files visible.
  */
private[osmpbf] class PbfDataWriter(kind: String, dir: String,
    partitionId: Int, taskId: Long, conf: org.apache.hadoop.conf.Configuration)
    extends org.apache.spark.sql.connector.write.DataWriter[InternalRow] {

  private val fs = new Path(dir).getFileSystem(conf)
  private val finalPath = new Path(dir, f"part-$partitionId%05d.osm.pbf")
  private val tmpPath = new Path(dir, f".part-$partitionId%05d-$taskId.osm.pbf.tmp")
  private val out = { fs.mkdirs(new Path(dir)); fs.create(tmpPath, true) }
  out.write(OsmPbfEncoder.headerFrame(kind))

  private val buf = scala.collection.mutable.ArrayBuffer.empty[InternalRow]

  private def flush(): Unit = if (buf.nonEmpty) {
    out.write(OsmPbfEncoder.encodeBlock(kind, buf.toSeq))
    buf.clear()
  }

  override def write(row: InternalRow): Unit = {
    buf += row.copy()
    if (buf.size >= OsmPbfEncoder.DefaultBlockSize) flush()
  }

  override def commit(): org.apache.spark.sql.connector.write.WriterCommitMessage = {
    flush(); out.close()
    fs.delete(finalPath, false)
    fs.rename(tmpPath, finalPath)
    PbfCommitMessage(finalPath.toString)
  }

  override def abort(): Unit = { out.close(); fs.delete(tmpPath, false) }
  override def close(): Unit = ()
}

/** Decodes one OSMData blob into rows of the requested kind. */
private[osmpbf] class PbfBlobReader(part: PbfBlobPartition, kind: String,
    conf: org.apache.hadoop.conf.Configuration)
    extends PartitionReader[InternalRow] {

  private val rows: Iterator[InternalRow] = {
    val hp = new Path(part.path)
    val in = hp.getFileSystem(conf).open(hp)
    val compressed = new Array[Byte](part.length)
    try { in.seek(part.offset); in.readFully(compressed) } finally in.close()

    // Blob: 1=raw bytes, 2=raw_size, 3=zlib_data
    var raw: Array[Byte] = null
    var rawSize = -1
    var zlib: Array[Byte] = null
    val br = new ProtoReader(compressed)
    while (br.hasNext) br.readTag() match {
      case (1, 2) => val (o, l) = br.readBytes(); raw = compressed.slice(o, o + l)
      case (2, 0) => rawSize = br.readVarint().toInt
      case (3, 2) => val (o, l) = br.readBytes(); zlib = compressed.slice(o, o + l)
      case (_, wt) => br.skip(wt)
    }
    val block =
      if (raw != null) raw
      else {
        // raw_size is optional in the spec: when absent, loop inflate()
        // growing the buffer until finished() — a fixed guess would
        // silently truncate the block
        val inf = new java.util.zip.Inflater()
        inf.setInput(zlib)
        var out = new Array[Byte](if (rawSize > 0) rawSize else math.max(zlib.length * 4, 1 << 16))
        var n = 0
        while (!inf.finished() && n < Int.MaxValue / 2) {
          if (n == out.length) out = java.util.Arrays.copyOf(out, out.length * 2)
          n += inf.inflate(out, n, out.length - n)
          if (inf.needsInput() && !inf.finished())
            throw new java.io.IOException(s"truncated zlib data in ${part.path}")
        }
        inf.end()
        if (n == out.length) out else java.util.Arrays.copyOf(out, n)
      }
    parsePrimitiveBlock(block)
  }

  private def parsePrimitiveBlock(block: Array[Byte]): Iterator[InternalRow] = {
    val pr = new ProtoReader(block)
    var strings = Array.empty[UTF8String]
    var granularity = 100L
    var latOffset = 0L
    var lonOffset = 0L
    var dateGranularity = 1000L
    val groups = scala.collection.mutable.ArrayBuffer.empty[ProtoReader]
    while (pr.hasNext) pr.readTag() match {
      case (1, 2) => // StringTable: repeated bytes s = 1
        val st = pr.subReader()
        val acc = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
        while (st.hasNext) st.readTag() match {
          case (1, 2) => acc += UTF8String.fromString(st.readString())
          case (_, wt) => st.skip(wt)
        }
        strings = acc.toArray
      case (2, 2) => groups += pr.subReader()
      case (17, 0) => granularity = pr.readVarint()
      case (18, 0) => dateGranularity = pr.readVarint()
      case (19, 0) => latOffset = pr.readVarint()
      case (20, 0) => lonOffset = pr.readVarint()
      case (_, wt) => pr.skip(wt)
    }

    groups.iterator.flatMap { g =>
      val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
      while (g.hasNext) g.readTag() match {
        case (2, 2) if kind == "nodes" => // DenseNodes
          out ++= parseDenseNodes(g.subReader(), strings, granularity,
            latOffset, lonOffset, dateGranularity)
        case (3, 2) if kind == "ways" =>
          out += parseWay(g.subReader(), strings, dateGranularity)
        case (4, 2) if kind == "relations" =>
          out += parseRelation(g.subReader(), strings, dateGranularity)
        case (_, wt) => g.skip(wt)
      }
      out
    }
  }

  private def tsMicros(raw: Long, dateGranularity: Long): Any =
    if (raw == 0) null else java.lang.Long.valueOf(raw * dateGranularity * 1000L)

  private def parseDenseNodes(d: ProtoReader, strings: Array[UTF8String],
      granularity: Long, latOffset: Long, lonOffset: Long,
      dateGranularity: Long): Seq[InternalRow] = {
    var ids = Array.empty[Long]
    var lats = Array.empty[Long]
    var lons = Array.empty[Long]
    var keysVals = Array.empty[Long]
    var versions = Array.empty[Long]
    var timestamps = Array.empty[Long]
    var changesets = Array.empty[Long]
    var uids = Array.empty[Long]
    var usids = Array.empty[Long]
    var visibles = Array.empty[Long]
    // packed (wiretype 2) chunks concatenate; spec-legal UNPACKED
    // encodings (wiretype 0, one value per tag) append too instead of
    // falling into the skip case and silently dropping data
    while (d.hasNext) d.readTag() match {
      case (1, 2) => ids ++= d.packedSVarints()
      case (1, 0) => ids :+= d.readSVarint()
      case (5, 2) => // DenseInfo
        val di = d.subReader()
        while (di.hasNext) di.readTag() match {
          case (1, 2) => versions ++= di.packedVarints()
          case (1, 0) => versions :+= di.readVarint()
          case (2, 2) => timestamps ++= di.packedSVarints()
          case (2, 0) => timestamps :+= di.readSVarint()
          case (3, 2) => changesets ++= di.packedSVarints()
          case (3, 0) => changesets :+= di.readSVarint()
          case (4, 2) => uids ++= di.packedSVarints()
          case (4, 0) => uids :+= di.readSVarint()
          case (5, 2) => usids ++= di.packedSVarints() // user_sid, delta
          case (5, 0) => usids :+= di.readSVarint()
          case (6, 2) => visibles ++= di.packedVarints()
          case (6, 0) => visibles :+= di.readVarint()
          case (_, wt) => di.skip(wt)
        }
      case (8, 2) => lats ++= d.packedSVarints()
      case (8, 0) => lats :+= d.readSVarint()
      case (9, 2) => lons ++= d.packedSVarints()
      case (9, 0) => lons :+= d.readSVarint()
      case (10, 2) => keysVals ++= d.packedVarints()
      case (10, 0) => keysVals :+= d.readVarint()
      case (_, wt) => d.skip(wt)
    }
    val n = ids.length
    var id = 0L; var lat = 0L; var lon = 0L; var ts = 0L; var cs = 0L; var uid = 0L
    var usid = 0L
    var kv = 0
    (0 until n).map { i =>
      id += ids(i); lat += lats(i); lon += lons(i)
      if (timestamps.nonEmpty) ts += timestamps(i)
      if (changesets.nonEmpty) cs += changesets(i)
      if (uids.nonEmpty) uid += uids(i)
      if (usids.nonEmpty) usid += usids(i)
      val keys = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
      val vals = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
      while (kv < keysVals.length && keysVals(kv) != 0) {
        keys += strings(keysVals(kv).toInt)
        vals += strings(keysVals(kv + 1).toInt)
        kv += 2
      }
      kv += 1 // the 0 separator
      new GenericInternalRow(Array[Any](
        id,
        if (versions.nonEmpty) Int.box(versions(i).toInt) else null,
        if (uids.nonEmpty) Int.box(uid.toInt) else null,
        if (timestamps.nonEmpty) tsMicros(ts, dateGranularity) else null,
        if (changesets.nonEmpty) Long.box(cs) else null,
        new ArrayBasedMapData(new GenericArrayData(keys.toArray[Any]),
          new GenericArrayData(vals.toArray[Any])),
        Double.box(1e-9 * (lonOffset + granularity * lon)),
        Double.box(1e-9 * (latOffset + granularity * lat)),
        if (usids.nonEmpty && usid != 0) strings(usid.toInt) else null,
        // visible absent → true (only history files carry deletions)
        Boolean.box(if (visibles.isEmpty) true else visibles(i) != 0L)))
    }
  }

  private def parseWay(w: ProtoReader, strings: Array[UTF8String],
      dateGranularity: Long): InternalRow = {
    var id = 0L
    var keys = Array.empty[Long]
    var vals = Array.empty[Long]
    var refs = Array.empty[Long]
    var version: Any = null
    var ts: Any = null
    var changeset: Any = null
    var uid: Any = null
    var userName: Any = null
    var visible: Any = Boolean.box(true)
    var refDeltas = Array.empty[Long]
    while (w.hasNext) w.readTag() match {
      case (1, 0) => id = w.readVarint()
      case (2, 2) => keys ++= w.packedVarints()
      case (2, 0) => keys :+= w.readVarint()
      case (3, 2) => vals ++= w.packedVarints()
      case (3, 0) => vals :+= w.readVarint()
      case (4, 2) => // Info
        val info = w.subReader()
        while (info.hasNext) info.readTag() match {
          case (1, 0) => version = Int.box(info.readVarint().toInt)
          case (2, 0) => ts = tsMicros(info.readVarint(), dateGranularity)
          case (3, 0) => changeset = Long.box(info.readVarint())
          case (4, 0) => uid = Int.box(info.readVarint().toInt)
          case (5, 0) =>
            val sid = info.readVarint().toInt
            if (sid != 0) userName = strings(sid)
          case (6, 0) => visible = Boolean.box(info.readVarint() != 0L)
          case (_, wt) => info.skip(wt)
        }
      case (8, 2) => refDeltas ++= w.packedSVarints()
      case (8, 0) => refDeltas :+= w.readSVarint()
      case (_, wt) => w.skip(wt)
    }
    var acc = 0L
    refs = refDeltas.map { d => acc += d; acc }
    new GenericInternalRow(Array[Any](
      id, version, uid, ts, changeset,
      new ArrayBasedMapData(
        new GenericArrayData(keys.map(k => strings(k.toInt): Any)),
        new GenericArrayData(vals.map(v => strings(v.toInt): Any))),
      new GenericArrayData(refs), userName, visible))
  }

  /** Relation message (osmformat.proto): roles_sid=8 (string-table
    * indexes), memids=9 (delta-coded sint64), types=10 (enum
    * 0=NODE 1=WAY 2=RELATION → Osmosis N/W/R codes).
    */
  private def parseRelation(r: ProtoReader, strings: Array[UTF8String],
      dateGranularity: Long): InternalRow = {
    var id = 0L
    var keys = Array.empty[Long]
    var vals = Array.empty[Long]
    var roles = Array.empty[Long]
    var memidDeltas = Array.empty[Long]
    var types = Array.empty[Long]
    var version: Any = null
    var ts: Any = null
    var changeset: Any = null
    var uid: Any = null
    var userName: Any = null
    var visible: Any = Boolean.box(true)
    while (r.hasNext) r.readTag() match {
      case (1, 0) => id = r.readVarint()
      case (2, 2) => keys ++= r.packedVarints()
      case (2, 0) => keys :+= r.readVarint()
      case (3, 2) => vals ++= r.packedVarints()
      case (3, 0) => vals :+= r.readVarint()
      case (4, 2) => // Info
        val info = r.subReader()
        while (info.hasNext) info.readTag() match {
          case (1, 0) => version = Int.box(info.readVarint().toInt)
          case (2, 0) => ts = tsMicros(info.readVarint(), dateGranularity)
          case (3, 0) => changeset = Long.box(info.readVarint())
          case (4, 0) => uid = Int.box(info.readVarint().toInt)
          case (5, 0) =>
            val sid = info.readVarint().toInt
            if (sid != 0) userName = strings(sid)
          case (6, 0) => visible = Boolean.box(info.readVarint() != 0L)
          case (_, wt) => info.skip(wt)
        }
      case (8, 2) => roles ++= r.packedVarints()
      case (8, 0) => roles :+= r.readVarint()
      case (9, 2) => memidDeltas ++= r.packedSVarints()
      case (9, 0) => memidDeltas :+= r.readSVarint()
      case (10, 2) => types ++= r.packedVarints()
      case (10, 0) => types :+= r.readVarint()
      case (_, wt) => r.skip(wt)
    }
    val typeCodes = Array(UTF8String.fromString("N"), UTF8String.fromString("W"),
      UTF8String.fromString("R"))
    var acc = 0L
    val members = memidDeltas.indices.map { i =>
      acc += memidDeltas(i)
      new GenericInternalRow(Array[Any](
        typeCodes(types(i).toInt),
        acc,
        if (i < roles.length) strings(roles(i).toInt) else UTF8String.fromString("")))
    }
    new GenericInternalRow(Array[Any](
      id, version, uid, ts, changeset,
      new ArrayBasedMapData(
        new GenericArrayData(keys.map(k => strings(k.toInt): Any)),
        new GenericArrayData(vals.map(v => strings(v.toInt): Any))),
      new GenericArrayData(members.toArray[Any]), userName, visible))
  }

  private var current: InternalRow = _
  override def next(): Boolean = { if (rows.hasNext) { current = rows.next(); true } else false }
  override def get(): InternalRow = current
  override def close(): Unit = ()
}
