package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.read.PartitionReader
import org.apache.spark.sql.types.StructType

/** Column pruning support shared by the OSM sources: decoders assemble
  * the full entity row (the dominant cost is parsing the file bytes,
  * which XML/PBF require regardless), and this wrapper projects to the
  * pruned schema so only the required columns flow into the scan —
  * Spark-side row width, codegen, and shuffle all see the narrow shape.
  */
object Pruning {

  def ordinals(full: StructType, required: StructType): Array[Int] =
    required.fieldNames.map(full.fieldIndex)

  final class ProjectingReader(inner: PartitionReader[InternalRow], idx: Array[Int])
      extends PartitionReader[InternalRow] {
    override def next(): Boolean = inner.next()
    override def get(): InternalRow = {
      val row = inner.get().asInstanceOf[GenericInternalRow]
      val out = new Array[Any](idx.length)
      var i = 0
      while (i < idx.length) { out(i) = row.values(idx(i)); i += 1 }
      new GenericInternalRow(out)
    }
    override def close(): Unit = inner.close()
  }

  def project(inner: PartitionReader[InternalRow],
      full: StructType, required: StructType): PartitionReader[InternalRow] =
    if (required.fieldNames.sameElements(full.fieldNames)) inner
    else new ProjectingReader(inner, ordinals(full, required))
}
