package graft.sources.osmpbf

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String

/** Pure PBF block encoder (osmformat.proto / fileformat.proto, public
  * wire spec) — the write-side twin of [[PbfBlobReader]]'s decoder.
  * Rows arrive in the source schemas ([[graft.model.OsmModel]]); every
  * `blockSize` entities become one zlib-compressed OSMData blob with a
  * per-block string table and standard granularity (100 nanodeg units,
  * date_granularity 1000).
  *
  * Null metadata degrades to the PBF defaults (0 / absent) — the wire
  * format has no per-entity null markers inside DenseInfo; data
  * extracts always carry full metadata in practice.
  */
object OsmPbfEncoder {

  val DefaultBlockSize = 8000

  /** [4-byte BE length][BlobHeader][Blob] frame. */
  private def frame(blobType: String, raw: Array[Byte]): Array[Byte] = {
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw); deflater.finish()
    val cbuf = new Array[Byte](raw.length + 64)
    val clen = deflater.deflate(cbuf)
    deflater.end()
    val blob = new ProtoWriter
    blob.varintField(2, raw.length.toLong)
    blob.bytesField(3, cbuf.take(clen))
    val blobBytes = blob.toByteArray
    val bh = new ProtoWriter
    bh.stringField(1, blobType)
    bh.varintField(3, blobBytes.length.toLong)
    val bhBytes = bh.toByteArray
    val out = java.nio.ByteBuffer.allocate(4 + bhBytes.length + blobBytes.length)
    out.putInt(bhBytes.length).put(bhBytes).put(blobBytes)
    out.array()
  }

  /** OSMHeader blob (required by osmium-family readers). */
  def headerFrame(kind: String): Array[Byte] = {
    val hb = new ProtoWriter
    hb.stringField(4, "OsmSchema-V0.6")
    if (kind == "nodes") hb.stringField(4, "DenseNodes")
    hb.stringField(16, "graft-spark")
    frame("OSMHeader", hb.toByteArray)
  }

  /** Per-block string table: index 0 is always the empty string. */
  private final class StringTable {
    private val idx = scala.collection.mutable.LinkedHashMap[String, Int]("" -> 0)
    def id(s: UTF8String): Long = id(if (s == null) "" else s.toString)
    def id(s: String): Long = idx.getOrElseUpdate(s, idx.size).toLong
    def write(): ProtoWriter = {
      val w = new ProtoWriter
      idx.keys.foreach(w.stringField(1, _))
      w
    }
  }

  private def tsRaw(row: InternalRow, ord: Int): Long =
    if (row.isNullAt(ord)) 0L else row.getLong(ord) / 1000000L // micros -> sec

  private def units(deg: Double): Long = Math.round(deg * 1e7) // 100-nanodeg units

  /** One OSMData frame from ≤ blockSize node rows (DenseNodes). */
  def encodeNodesBlock(rows: Seq[InternalRow]): Array[Byte] = {
    val st = new StringTable
    val n = rows.size
    val ids, lats, lons, vers, tss, css, uids, usids, vis =
      new Array[Long](n)
    val kvs = scala.collection.mutable.ArrayBuffer.empty[Long]
    var i = 0
    rows.foreach { r =>
      ids(i) = r.getLong(0)
      vers(i) = if (r.isNullAt(1)) 0L else r.getInt(1).toLong
      uids(i) = if (r.isNullAt(2)) 0L else r.getInt(2).toLong
      tss(i) = tsRaw(r, 3)
      css(i) = if (r.isNullAt(4)) 0L else r.getLong(4)
      if (!r.isNullAt(5)) {
        val tags = r.getMap(5)
        var t = 0
        while (t < tags.numElements()) {
          kvs += st.id(tags.keyArray().getUTF8String(t))
          kvs += st.id(tags.valueArray().getUTF8String(t))
          t += 1
        }
      }
      kvs += 0L
      lons(i) = if (r.isNullAt(6)) 0L else units(r.getDouble(6))
      lats(i) = if (r.isNullAt(7)) 0L else units(r.getDouble(7))
      usids(i) = if (r.isNullAt(8)) 0L else st.id(r.getUTF8String(8))
      vis(i) = if (!r.isNullAt(9) && !r.getBoolean(9)) 0L else 1L
      i += 1
    }
    def delta(a: Array[Long]): Seq[Long] =
      a.indices.map(j => if (j == 0) a(0) else a(j) - a(j - 1))
    val di = new ProtoWriter
    di.packedVarintField(1, vers.toIndexedSeq)
    di.packedSVarintField(2, delta(tss))
    di.packedSVarintField(3, delta(css))
    di.packedSVarintField(4, delta(uids))
    di.packedSVarintField(5, delta(usids))
    di.packedVarintField(6, vis.toIndexedSeq)
    val dn = new ProtoWriter
    dn.packedSVarintField(1, delta(ids))
    dn.bytesField(5, di.toByteArray)
    dn.packedSVarintField(8, delta(lats))
    dn.packedSVarintField(9, delta(lons))
    dn.packedVarintField(10, kvs.toSeq)
    val g = new ProtoWriter
    g.bytesField(2, dn.toByteArray)
    finishBlock(st, g)
  }

  private def info(st: StringTable, r: InternalRow): ProtoWriter = {
    val w = new ProtoWriter
    if (!r.isNullAt(1)) w.varintField(1, r.getInt(1).toLong)
    if (!r.isNullAt(3)) w.varintField(2, tsRaw(r, 3))
    if (!r.isNullAt(4)) w.varintField(3, r.getLong(4))
    if (!r.isNullAt(2)) w.varintField(4, r.getInt(2).toLong)
    if (!r.isNullAt(7)) w.varintField(5, st.id(r.getUTF8String(7)))
    if (!r.isNullAt(8) && !r.getBoolean(8)) w.varintField(6, 0L)
    w
  }

  private def tagFields(st: StringTable, w: ProtoWriter, r: InternalRow): Unit = {
    if (r.isNullAt(5)) return
    val tags = r.getMap(5)
    val ks = (0 until tags.numElements()).map(t => st.id(tags.keyArray().getUTF8String(t)))
    val vs = (0 until tags.numElements()).map(t => st.id(tags.valueArray().getUTF8String(t)))
    if (ks.nonEmpty) { w.packedVarintField(2, ks); w.packedVarintField(3, vs) }
  }

  /** One OSMData frame from ≤ blockSize way rows. Way schema ordinal 6
    * is the node-ref array; 7/8 are user_name/visible.
    */
  def encodeWaysBlock(rows: Seq[InternalRow]): Array[Byte] = {
    val st = new StringTable
    val g = new ProtoWriter
    rows.foreach { r =>
      val w = new ProtoWriter
      w.varintField(1, r.getLong(0))
      tagFields(st, w, r)
      w.bytesField(4, info(st, r).toByteArray)
      val refs: ArrayData =
        if (r.isNullAt(6)) ArrayData.toArrayData(Array.empty[Long]) else r.getArray(6)
      val deltas = (0 until refs.numElements()).map { j =>
        if (j == 0) refs.getLong(0) else refs.getLong(j) - refs.getLong(j - 1)
      }
      if (deltas.nonEmpty) w.packedSVarintField(8, deltas)
      g.bytesField(3, w.toByteArray)
    }
    finishBlock(st, g)
  }

  /** One OSMData frame from ≤ blockSize relation rows. Ordinal 6 is the
    * member array (member_type N/W/R, member_id, member_role).
    */
  def encodeRelationsBlock(rows: Seq[InternalRow]): Array[Byte] = {
    val st = new StringTable
    val g = new ProtoWriter
    rows.foreach { r =>
      val w = new ProtoWriter
      w.varintField(1, r.getLong(0))
      tagFields(st, w, r)
      w.bytesField(4, info(st, r).toByteArray)
      if (r.isNullAt(6)) { g.bytesField(4, w.toByteArray) } else {
      val ms: ArrayData = r.getArray(6)
      val nm = ms.numElements()
      if (nm > 0) {
        val roles = (0 until nm).map(j => st.id(ms.getStruct(j, 3).getUTF8String(2)))
        val mids = (0 until nm).map { j =>
          val id = ms.getStruct(j, 3).getLong(1)
          if (j == 0) id else id - ms.getStruct(j - 1, 3).getLong(1)
        }
        val types = (0 until nm).map { j =>
          ms.getStruct(j, 3).getUTF8String(0).toString match {
            case "N" => 0L
            case "W" => 1L
            case _ => 2L
          }
        }
        w.packedVarintField(8, roles)
        w.packedSVarintField(9, mids)
        w.packedVarintField(10, types)
      }
      g.bytesField(4, w.toByteArray)
      }
    }
    finishBlock(st, g)
  }

  private def finishBlock(st: StringTable, group: ProtoWriter): Array[Byte] = {
    val pb = new ProtoWriter
    pb.bytesField(1, st.write().toByteArray)
    pb.bytesField(2, group.toByteArray)
    pb.varintField(17, 100L) // granularity
    pb.varintField(18, 1000L) // date_granularity
    frame("OSMData", pb.toByteArray)
  }

  def encodeBlock(kind: String, rows: Seq[InternalRow]): Array[Byte] = kind match {
    case "nodes" => encodeNodesBlock(rows)
    case "ways" => encodeWaysBlock(rows)
    case _ => encodeRelationsBlock(rows)
  }
}
