package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, DoubleType, StructType}

/** Region-intersection test for two closed simple rings — the verify
  * kernel of [[graft.operators.GeoJoin.polygonsIntersect]] (the
  * polygon-polygon member of the geo-join family). TRUE iff the two
  * enclosed regions overlap with positive area under the kernel's
  * OPEN-REGION convention:
  *
  *   1. some edge of A STRICTLY crosses some edge of B (both
  *      orientation-sign products negative — the classic proper
  *      segment-intersection test; touching endpoints and collinear
  *      overlap do NOT count), or
  *   2. no edges cross and one ring lies inside the other — decided
  *      by [[PointInRing.contains]] (the half-open ray cast) on the
  *      FIRST vertex of each ring.
  *
  * Boundary contact (shared edges, corner touches) is deliberately
  * outside the contract — the same discipline as [[PointInRing]]:
  * callers whose correctness depends on tangent geometry must nudge
  * off the lattice (the catalog query offsets one relation by a
  * half-step so tangency never occurs). Rings must be CLOSED (first
  * point repeated last) and simple; fields read positionally
  * (0 = lon, 1 = lat).
  *
  * Codegen: the generated Java makes ONE static call into
  * [[RingsIntersect.intersects]] per row — no encoder round-trip, no
  * lambda dispatch, and the filter stays inside the enclosing
  * whole-stage span (the O(edges_a · edges_b) loop is work a UDF
  * would also pay, without the span break). The interpreted and
  * generated paths share the same method, so they are equal by
  * construction.
  */
case class RingsIntersect(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_rings_intersect"

  private def ringCheck(e: Expression, side: String): Option[String] =
    e.dataType match {
      case ArrayType(st: StructType, _)
          if st.length >= 2 && st.fields(0).dataType == DoubleType &&
            st.fields(1).dataType == DoubleType => None
      case other => Some(s"$side ring must be ARRAY<STRUCT<lon DOUBLE, " +
        s"lat DOUBLE, ...>>, got ${other.catalogString}")
    }

  override def checkInputDataTypes(): TypeCheckResult =
    ringCheck(left, "left").orElse(ringCheck(right, "right"))
      .map(m => TypeCheckResult.TypeCheckFailure(s"$prettyName: $m"))
      .getOrElse(TypeCheckResult.TypeCheckSuccess)

  private lazy val nfA: Int = left.dataType match {
    case ArrayType(st: StructType, _) => st.length
    case _ => 2
  }
  private lazy val nfB: Int = right.dataType match {
    case ArrayType(st: StructType, _) => st.length
    case _ => 2
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    RingsIntersect.intersects(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData], nfA, nfB)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (aV, bV) =>
      s"${ev.value} = graft.functions.RingsIntersect.intersects(" +
        s"$aV, $bV, $nfA, $nfB);")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): RingsIntersect =
    copy(left = newLeft, right = newRight)
}

object RingsIntersect {

  /** 2D cross product (b − a) × (c − a) — the orientation of c
    * relative to directed segment a→b.
    */
  private def cross(ax: Double, ay: Double, bx: Double, by: Double,
      cx: Double, cy: Double): Double =
    (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)

  /** Shared by the interpreted path and the generated Java (one
    * static-forwarder call per row). See the class doc for the
    * open-region convention.
    */
  def intersects(a: ArrayData, b: ArrayData, nfA: Int, nfB: Int): Boolean = {
    val nA = a.numElements(); val nB = b.numElements()
    if (nA < 2 || nB < 2) return false
    // 1. strict edge crossings
    var pa = a.getStruct(0, nfA)
    var ax2 = pa.getDouble(0); var ay2 = pa.getDouble(1)
    var i = 1
    while (i < nA) {
      val ax1 = ax2; val ay1 = ay2
      pa = a.getStruct(i, nfA)
      ax2 = pa.getDouble(0); ay2 = pa.getDouble(1)
      var pb = b.getStruct(0, nfB)
      var bx2 = pb.getDouble(0); var by2 = pb.getDouble(1)
      var j = 1
      while (j < nB) {
        val bx1 = bx2; val by1 = by2
        pb = b.getStruct(j, nfB)
        bx2 = pb.getDouble(0); by2 = pb.getDouble(1)
        val o1 = cross(ax1, ay1, ax2, ay2, bx1, by1)
        val o2 = cross(ax1, ay1, ax2, ay2, bx2, by2)
        val o3 = cross(bx1, by1, bx2, by2, ax1, ay1)
        val o4 = cross(bx1, by1, bx2, by2, ax2, ay2)
        if (o1 * o2 < 0 && o3 * o4 < 0) return true
        j += 1
      }
      i += 1
    }
    // 2. no crossings: containment either way (first vertex probe)
    PointInRing.contains(a.getStruct(0, nfA).getDouble(0),
        a.getStruct(0, nfA).getDouble(1), b, nfB) ||
      PointInRing.contains(b.getStruct(0, nfB).getDouble(0),
        b.getStruct(0, nfB).getDouble(1), a, nfA)
  }
}
