package graft.sources.warc

import java.util

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 reader/writer for WARC (Web ARChive, ISO 28500) files
  * — the container format web crawls actually ship in (Common Crawl,
  * Internet Archive), and therefore the native ingest surface of a
  * crawl-scale training-data pipeline:
  *
  * {{{
  *   spark.read.format("warc").load("crawl/seg-00.warc")  // file, dir, or glob; .gz ok
  *   df.write.format("warc").mode("append").save("out/")  // response records
  * }}}
  *
  * Record framing (ISO 28500 §4): a `WARC/1.0` version line, CRLF
  * header lines (`Name: value`), an empty line, `Content-Length` bytes
  * of payload, and a CRLF CRLF record separator. The reader is a
  * streaming parse — constant memory per partition beyond the single
  * in-flight payload — and tolerates both CRLF and bare-LF headers
  * (real crawls contain both).
  *
  * Scale model: one input partition per file, matching how crawls are
  * laid out (Common Crawl ships ~1 GB `.warc.gz` segments by the tens
  * of thousands — file-level parallelism IS the intended splitting;
  * per-record gzip members make mid-file splits impossible without an
  * external index, same constraint as the PBF blob source). Column
  * pruning projects the decoded record to the scan's required columns
  * ([[graft.sources.Pruning]]); a payload-less metadata scan still
  * reads the bytes (the framing requires it) but never materializes
  * them into Spark rows.
  */
class WarcSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "warc"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    WarcSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new WarcTable(schema, Option(properties.get("path")).toSeq)
}

object WarcSource {
  /** The named WARC headers every consumer needs, plus the full header
    * map (WARC headers are extensible) and the raw payload bytes.
    */
  val schema: StructType = StructType(Seq(
    StructField("record_id", StringType),        // WARC-Record-ID
    StructField("record_type", StringType),      // WARC-Type
    StructField("target_uri", StringType),       // WARC-Target-URI (null for warcinfo)
    StructField("warc_date", StringType),        // WARC-Date (ISO 8601, kept verbatim)
    StructField("content_type", StringType),     // Content-Type
    StructField("content_length", LongType),     // Content-Length (payload bytes)
    StructField("headers", MapType(StringType, StringType)),
    StructField("payload", BinaryType)))
}

private[warc] class WarcTable(schema: StructType, paths: Seq[String])
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = "warc"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE)

  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder = {
    require(paths.size == 1, "warc write needs exactly one target path")
    val in = info.schema()
    val gz = "gzip".equalsIgnoreCase(info.options.getOrDefault("compression", ""))
    new org.apache.spark.sql.connector.write.WriteBuilder {
      override def build(): org.apache.spark.sql.connector.write.Write =
        new org.apache.spark.sql.connector.write.Write {
          override def toBatch: org.apache.spark.sql.connector.write.BatchWrite =
            new WarcBatchWrite(paths.head, in, gz,
              new graft.sources.SerializableHadoopConf(
                org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf()))
        }
    }
  }

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch
        with SupportsPushDownRequiredColumns {
      private var required: StructType = schema
      override def pruneColumns(requiredSchema: StructType): Unit =
        required = requiredSchema
      override def build(): Scan = this
      override def readSchema(): StructType = required
      override def toBatch: Batch = this
      override def planInputPartitions(): Array[InputPartition] = {
        val conf = org.apache.spark.sql.SparkSession.active
          .sessionState.newHadoopConf()
        paths.flatMap { p =>
          val hp = new Path(p)
          val fs = hp.getFileSystem(conf)
          val stats = fs.globStatus(hp) match {
            case null => Array.empty[org.apache.hadoop.fs.FileStatus]
            case gs => gs.flatMap { s =>
              if (s.isDirectory) fs.listStatus(s.getPath).filter(_.isFile) else Array(s)
            }
          }
          stats.filter(s => !s.getPath.getName.startsWith("."))
            .map(s => WarcPartition(s.getPath.toString): InputPartition)
        }.toArray
      }
      override def createReaderFactory(): PartitionReaderFactory =
        new WarcReaderFactory(WarcSource.schema, required,
          new graft.sources.SerializableHadoopConf(
            org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf()))
    }
}

private[warc] case class WarcPartition(path: String) extends InputPartition

private[warc] class WarcReaderFactory(full: StructType, required: StructType,
    conf: graft.sources.SerializableHadoopConf) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    graft.sources.Pruning.project(
      new WarcPartitionReader(partition.asInstanceOf[WarcPartition].path, conf.value),
      full, required)
}

/** Streaming parse of one WARC file: version line → headers → payload
  * of exactly Content-Length bytes → record separator. Hadoop codec
  * auto-detection by extension handles `.warc.gz` (the Hadoop gzip
  * stream decodes concatenated members, which is how per-record-gzipped
  * crawl segments are laid out).
  */
private[warc] class WarcPartitionReader(path: String,
    conf: org.apache.hadoop.conf.Configuration)
    extends PartitionReader[InternalRow] {

  private val hp = new Path(path)
  private val in: java.io.InputStream = {
    val raw = hp.getFileSystem(conf).open(hp)
    val codec =
      new org.apache.hadoop.io.compress.CompressionCodecFactory(conf).getCodec(hp)
    val base = if (codec == null) raw else codec.createInputStream(raw)
    new java.io.BufferedInputStream(base, 1 << 16)
  }

  private var row: InternalRow = _

  /** One header/version line, CRLF or LF terminated, terminator
    * stripped; null at EOF before any byte.
    */
  private def readLine(): String = {
    val sb = new java.lang.StringBuilder(64)
    var c = in.read()
    if (c == -1) return null
    while (c != -1 && c != '\n') {
      if (c != '\r') sb.append(c.toChar)
      c = in.read()
    }
    sb.toString
  }

  private def readFully(n: Int): Array[Byte] = {
    val buf = new Array[Byte](n)
    var off = 0
    while (off < n) {
      val r = in.read(buf, off, n - off)
      require(r >= 0, s"truncated WARC payload in $path: got $off of $n bytes")
      off += r
    }
    buf
  }

  override def next(): Boolean = {
    // skip blank separator lines between records
    var line = readLine()
    while (line != null && line.isEmpty) line = readLine()
    if (line == null) return false
    require(line.startsWith("WARC/"),
      s"expected WARC version line in $path, got: ${line.take(60)}")
    val headers = scala.collection.mutable.LinkedHashMap.empty[String, String]
    var h = readLine()
    while (h != null && h.nonEmpty) {
      val i = h.indexOf(':')
      require(i > 0, s"malformed WARC header in $path: ${h.take(60)}")
      headers += h.substring(0, i).trim -> h.substring(i + 1).trim
      h = readLine()
    }
    def get(name: String): String =
      headers.collectFirst { case (k, v) if k.equalsIgnoreCase(name) => v }.orNull
    val len = Option(get("Content-Length")).map(_.toLong).getOrElse(0L)
    require(len <= Int.MaxValue, s"WARC payload over 2 GiB in $path")
    val payload = readFully(len.toInt)
    def utf8(s: String): UTF8String =
      if (s == null) null else UTF8String.fromString(s)
    val ks = headers.keys.toArray[Any].map(k => utf8(k.asInstanceOf[String]): Any)
    val vs = headers.values.toArray[Any].map(v => utf8(v.asInstanceOf[String]): Any)
    row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(Array[Any](
      utf8(get("WARC-Record-ID")),
      utf8(get("WARC-Type")),
      utf8(get("WARC-Target-URI")),
      utf8(get("WARC-Date")),
      utf8(get("Content-Type")),
      len,
      new org.apache.spark.sql.catalyst.util.ArrayBasedMapData(
        new org.apache.spark.sql.catalyst.util.GenericArrayData(ks),
        new org.apache.spark.sql.catalyst.util.GenericArrayData(vs)),
      payload))
    true
  }

  override def get(): InternalRow = row
  override def close(): Unit = in.close()
}
