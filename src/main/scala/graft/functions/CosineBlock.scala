package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform

/** Tile-evaluated brute-force cosine matching — the kernel behind
  * [[graft.operators.Dedup.embeddingNearDupPairs]] (r19).
  *
  * The naive all-pairs plan (self-join, cosine in the join condition)
  * spends ~95% of its wall in per-pair machinery: 2 µs/pair measured
  * at 20k vectors against ~0.1 µs for the fused 64-dim loop (BASELINE
  * r19). Two intermediate forms closed most of the gap and exposed the
  * next wall each time: per-element `getStruct`/`getArray` blocks
  * (11 s) re-created the accessor cost inside the kernel; a flat
  * single-vector × block form (135 s at sf10g) went MEMORY-BOUND —
  * every pair re-streams its 512-byte block vector from a broadcast
  * two orders larger than cache (~76 GB/s sustained). This form tiles
  * BOTH sides: a call evaluates a whole (row-batch × block) tile, so
  * the block's vectors are re-read against a batch that lives in L2 —
  * bytes per pair collapse by the batch width and the kernel returns
  * to compute-bound.
  *
  * Both inputs are `struct(ids: array<long>, flat: array<double>)` —
  * all m vectors of one uniform dimension d packed end-to-end (the
  * operator groups by `size(v)`, so mixed-dimension corpora split into
  * uniform tiles and cross-dimension pairs drop exactly as the join
  * form dropped them). Reads go through `Platform` when the arrays are
  * `UnsafeArrayData` (raw memory, zero per-pair allocation), with an
  * `ArrayData` fallback for interpreted rows. The fused loop runs in
  * the SAME accumulation order as [[CosineSimilarity]] — `cos` is
  * bit-identical, so the DuckDB oracle's 6-decimal rounding can never
  * diverge. `id_a < id_b` is enforced inside the kernel — cheap test
  * first, fused loop only for the surviving half; each unordered pair
  * is evaluated exactly once ((batch containing a) × (block containing
  * b) is a partition of the ordered-pair space).
  *
  * Output: array<struct<id_a, id_b, cos>> of SURVIVORS only.
  */
case class CosineTileMatches(batch: Expression, block: Expression,
    threshold: Double) extends BinaryExpression {

  override def left: Expression = batch
  override def right: Expression = block

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id_a", LongType, nullable = false),
    StructField("id_b", LongType, nullable = false),
    StructField("cos", DoubleType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "cosine_tile_matches"
  override def nullable: Boolean = true

  private val empty = new GenericArrayData(Array.empty[Any])

  /** (ids, flat, m, d) of one packed side; null ids flags a malformed
    * tile (treated as empty — cannot happen through the operator).
    */
  private def unpackSide(row: InternalRow): (ArrayData, ArrayData, Int, Int) = {
    if (row.isNullAt(0) || row.isNullAt(1)) return (null, null, 0, 0)
    val ids = row.getArray(0)
    val flat = row.getArray(1)
    val m = ids.numElements()
    if (m == 0) return (null, null, 0, 0)
    val total = flat.numElements()
    if (total % m != 0) return (null, null, 0, 0)
    (ids, flat, m, total / m)
  }

  /** Public so generated Java can call it (the KernelCodegen
    * discipline: one virtual call per tile, loops JIT-compiled).
    */
  def kernelPublic(batchAny: Any, blockAny: Any): ArrayData = {
    val (idsA, flatA, mA, dA) = unpackSide(batchAny.asInstanceOf[InternalRow])
    if (idsA == null) return empty
    val (idsB, flatB, mB, dB) = unpackSide(blockAny.asInstanceOf[InternalRow])
    if (idsB == null || dA != dB) return empty
    val d = dA
    // raw bases (UnsafeArrayData) or ArrayData fallback
    def base(a: ArrayData): AnyRef = a match {
      case u: UnsafeArrayData => u.getBaseObject
      case _ => null
    }
    def off(a: ArrayData): Long = a match {
      case u: UnsafeArrayData => u.getBaseOffset +
        UnsafeArrayData.calculateHeaderPortionInBytes(u.numElements())
      case _ => 0L
    }
    val (aB, aOff) = (base(flatA), off(flatA))
    val (bB, bOff) = (base(flatB), off(flatB))
    // batch ids + vectors to locals once per tile (mA·d doubles —
    // L2-resident by construction; the whole point of the tile)
    val aIds = new Array[Long](mA)
    var i = 0
    while (i < mA) { aIds(i) = idsA.getLong(i); i += 1 }
    val aVals = new Array[Double](mA * d)
    if (aB != null) {
      var k = 0
      while (k < mA * d) { aVals(k) = Platform.getDouble(aB, aOff + 8L * k); k += 1 }
    } else {
      var k = 0
      while (k < mA * d) { aVals(k) = flatA.getDouble(k); k += 1 }
    }
    // norms hoisted out of the pair loop: na depends only on the batch
    // row, nb only on the block row. Each is accumulated in the SAME
    // element order as CosineSimilarity's fused loop, so the values
    // (and the resulting cos) stay bit-identical — FP accumulators
    // are independent, only per-accumulator order matters.
    val aNorm = new Array[Double](mA)
    i = 0
    while (i < mA) {
      val ab = i * d
      var na = 0.0; var k = 0
      while (k < d) { val x = aVals(ab + k); na += x * x; k += 1 }
      aNorm(i) = na; i += 1
    }
    val out = new scala.collection.mutable.ArrayBuffer[Any](8)
    val yv = new Array[Double](d)
    val cand = new Array[Int](mA)
    var jB = 0
    while (jB < mB) {
      val idB = idsB.getLong(jB)
      // block vector to a local once per j (mB·d reads total, not per pair)
      if (bB != null) {
        val o = bOff + 8L * jB * d
        var k = 0
        while (k < d) { yv(k) = Platform.getDouble(bB, o + 8L * k); k += 1 }
      } else {
        val o = jB * d
        var k = 0
        while (k < d) { yv(k) = flatB.getDouble(o + k); k += 1 }
      }
      var nb = 0.0
      var k = 0
      while (k < d) { val y = yv(k); nb += y * y; k += 1 }
      // compact the surviving half (id_a < id_b) so the dot loop below
      // runs branch-free, then evaluate FOUR pairs per pass: a single
      // dot chain is loop-carried-latency-bound (~4 cycles/element);
      // four independent accumulator chains turn that into throughput
      // (norm hoist + 4-wide together: 64 -> ~31 s at sf10g, ~2x —
      // BASELINE r19)
      var nc = 0
      var iA = 0
      while (iA < mA) { if (aIds(iA) < idB) { cand(nc) = iA; nc += 1 }; iA += 1 }
      def emit(ci: Int, dot: Double): Unit = {
        val ia = cand(ci)
        val na = aNorm(ia)
        val cos = if (na == 0.0 || nb == 0.0) 0.0
          else dot / (math.sqrt(na) * math.sqrt(nb))
        if (cos >= threshold) out += InternalRow(aIds(ia), idB, cos)
      }
      var c = 0
      while (c + 4 <= nc) {
        val a0 = cand(c) * d; val a1 = cand(c + 1) * d
        val a2 = cand(c + 2) * d; val a3 = cand(c + 3) * d
        var d0 = 0.0; var d1 = 0.0; var d2 = 0.0; var d3 = 0.0
        var k2 = 0
        while (k2 < d) {
          val y = yv(k2)
          d0 += aVals(a0 + k2) * y; d1 += aVals(a1 + k2) * y
          d2 += aVals(a2 + k2) * y; d3 += aVals(a3 + k2) * y
          k2 += 1
        }
        emit(c, d0); emit(c + 1, d1); emit(c + 2, d2); emit(c + 3, d3)
        c += 4
      }
      while (c < nc) {
        val ab = cand(c) * d
        var dot = 0.0
        var k2 = 0
        while (k2 < d) { dot += aVals(ab + k2) * yv(k2); k2 += 1 }
        emit(c, dot)
        c += 1
      }
      jB += 1
    }
    if (out.isEmpty) empty else new GenericArrayData(out.toArray)
  }

  override def nullSafeEval(batchV: Any, blockV: Any): Any =
    kernelPublic(batchV, blockV)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("cosTile", this,
      classOf[CosineTileMatches].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""${ev.value} = $ref.kernelPublic($a, $b);"""
    })
  }

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): CosineTileMatches =
    copy(batch = l, block = r)
}

object CosineBlock {
  /** Column wrapper: all surviving (id_a, id_b, cos) pairs of a
    * (row-batch × block) tile — see [[CosineTileMatches]].
    */
  def tileMatches(batch: Column, block: Column, threshold: Double): Column =
    Bridge.column(CosineTileMatches(Bridge.expression(batch),
      Bridge.expression(block), threshold))
}
