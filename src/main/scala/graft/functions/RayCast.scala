package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, DoubleType, StructType}

/** Point-in-ring test (even-odd rule / ray casting) as a native
  * Catalyst kernel — the codegen'd verify stage of
  * [[graft.operators.GeoJoin.pointsInPolygons]]. Replaces the round-15
  * Scala UDF at the same site: the UDF evaluated interpreted per
  * candidate row (encoder round-trip per ring, the exact class of
  * per-row cost the MarkerCounts / [[TagMatch]] / [[IdHash]] kernels
  * exist to remove) and broke the whole-stage-codegen span across the
  * verify filter. This kernel inlines as one Java loop over the ring's
  * `ArrayData` — no deserialization, no lambda dispatch — and keeps
  * the scan → bbox-prefilter → ray-cast chain in ONE codegen stage
  * (PlanAuditSpec pins it).
  *
  * Semantics are bit-identical to
  * [[graft.operators.GeoJoin.pointInRing]] (the Scala reference both
  * the specs and the property tests compare against): half-open
  * crossing convention (`yi > lat` XOR `yj > lat`, `lon < xint`),
  * `xint = xi + (lat - yi) * (xj - xi) / (yj - yi)` in that
  * association. On-edge points follow the half-open convention;
  * callers whose correctness depends on boundary points must nudge
  * them off the boundary or pre-filter (the catalog query does).
  *
  * Input: (lon DOUBLE, lat DOUBLE, ring ARRAY<STRUCT<lon DOUBLE,
  * lat DOUBLE, ...>>) — the ring CLOSED (first point repeated last),
  * fields read positionally (0 = lon, 1 = lat); extra struct fields
  * are ignored. Null ring/lon/lat → null (standard null-intolerant
  * ternary); ring ELEMENTS must be non-null (enforced by
  * checkInputDataTypes on containsNull where the schema knows it).
  */
case class PointInRing(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_point_in_ring"

  override def checkInputDataTypes(): TypeCheckResult = {
    def bad(msg: String) = TypeCheckResult.TypeCheckFailure(
      s"$prettyName: $msg")
    if (first.dataType != DoubleType || second.dataType != DoubleType)
      bad(s"lon/lat must be DOUBLE, got ${first.dataType.catalogString}/" +
        second.dataType.catalogString)
    else third.dataType match {
      case ArrayType(st: StructType, _)
          if st.length >= 2 && st.fields(0).dataType == DoubleType &&
            st.fields(1).dataType == DoubleType =>
        TypeCheckResult.TypeCheckSuccess
      case other => bad("ring must be ARRAY<STRUCT<lon DOUBLE, lat " +
        s"DOUBLE, ...>>, got ${other.catalogString}")
    }
  }

  /** Struct width for positional `getStruct` reads. */
  private lazy val numFields: Int = third.dataType match {
    case ArrayType(st: StructType, _) => st.length
    case _ => 2
  }

  override def nullSafeEval(lon: Any, lat: Any, ring: Any): Any =
    PointInRing.contains(lon.asInstanceOf[Double], lat.asInstanceOf[Double],
      ring.asInstanceOf[ArrayData], numFields)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (lonV, latV, ringV) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val p = ctx.freshName("p")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      val xj = ctx.freshName("xj")
      val yj = ctx.freshName("yj")
      val row = classOf[InternalRow].getName
      // mirrors PointInRing.contains statement for statement — one
      // getStruct per VERTEX (the previous edge end carries over in
      // locals), same float-op association as GeoJoin.pointInRing
      s"""
         |${ev.value} = false;
         |int $n = $ringV.numElements();
         |if ($n >= 2) {
         |  $row $p = $ringV.getStruct(0, $numFields);
         |  double $xj = $p.getDouble(0);
         |  double $yj = $p.getDouble(1);
         |  for (int $i = 1; $i < $n; $i++) {
         |    double $xi = $xj; double $yi = $yj;
         |    $p = $ringV.getStruct($i, $numFields);
         |    $xj = $p.getDouble(0);
         |    $yj = $p.getDouble(1);
         |    if (($yi > $latV) != ($yj > $latV)) {
         |      if ($lonV < $xi + ($latV - $yi) * ($xj - $xi) / ($yj - $yi))
         |        ${ev.value} = !${ev.value};
         |    }
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): PointInRing =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object PointInRing {

  /** The interpreted path — the single source of truth the generated
    * Java mirrors statement for statement. Edge (i-1, i) per
    * iteration: (xi, yi) carries the previous vertex, so each vertex
    * is materialized once.
    */
  def contains(lon: Double, lat: Double, ring: ArrayData,
      numFields: Int): Boolean = {
    var inside = false
    val n = ring.numElements()
    if (n >= 2) {
      var p = ring.getStruct(0, numFields)
      var xj = p.getDouble(0)
      var yj = p.getDouble(1)
      var i = 1
      while (i < n) {
        val xi = xj; val yi = yj
        p = ring.getStruct(i, numFields)
        xj = p.getDouble(0)
        yj = p.getDouble(1)
        if ((yi > lat) != (yj > lat)) {
          val xint = xi + (lat - yi) * (xj - xi) / (yj - yi)
          if (lon < xint) inside = !inside
        }
        i += 1
      }
    }
    inside
  }
}
