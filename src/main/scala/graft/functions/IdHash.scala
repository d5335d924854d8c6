package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType}

/** graft's portable id hash (version 3 — see
  * [[graft.operators.Sampling.hashVersion]]): reduce the id to
  * [0, 2^62), split at bit 32, multiply each word by its own odd
  * constant (Knuth's 2654435761; xxHash's PRIME32_2 2246822519),
  * xor-fold, then run murmur3's fmix32 finalizer. Output in [0, 2^32).
  *
  * A dedicated kernel expression rather than a `Column` arithmetic
  * chain, for two reasons:
  *
  *   - '''Codegen size.''' Built from `Column` ops, each fmix step
  *     references its input twice, so the expression TREE doubles per
  *     step (~2^5 copies of the whole split-multiply prefix). The
  *     projected Java exceeded 20k lines and crashed Janino
  *     (`InternalCompilerException`), knocking every sampling plan out
  *     of whole-stage codegen — the hash ran interpreted per row. This
  *     kernel inlines as ~10 Java statements and keeps the stage fused.
  *   - '''Exact wrap for free.''' The SQL form needs the 16-bit-halves
  *     multiply to keep every intermediate below 2^63 (ANSI overflow).
  *     Two's-complement Java wraps silently and the wrap preserves low
  *     bits exactly, so `(x * c) & 0xFFFFFFFF` IS `x * c mod 2^32` —
  *     the dance collapses to a mask.
  *
  * The DuckDB oracle mirror ([[graft.queries.SamplingQueries.hashSql]])
  * still implements the ANSI-safe split-multiply form; SamplingSpec pins
  * both to the same independently-computed reference values, and every
  * sampling oracle verifies the lockstep end-to-end.
  */
case class IdHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_id_hash needs a BIGINT id, got ${child.dataType.catalogString}")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_id_hash"

  override def nullSafeEval(input: Any): Any = IdHash.hash(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val h = ctx.freshName("h")
      s"""
         |long $n = $c % 4611686018427387904L;
         |if ($n < 0) $n += 4611686018427387904L;
         |long $h = ((($n & 4294967295L) * 2654435761L) ^
         |           (($n >>> 32) * 2246822519L)) & 4294967295L;
         |$h ^= $h >>> 16;
         |$h = ($h * 2246822507L) & 4294967295L;
         |$h ^= $h >>> 13;
         |$h = ($h * 3266489909L) & 4294967295L;
         |$h ^= $h >>> 16;
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): IdHash =
    copy(child = newChild)
}

object IdHash {

  /** The hash as a plain Scala function — the single source of truth the
    * interpreted path calls and the generated Java mirrors statement for
    * statement. 2246822507 = 0x85ebca6b, 3266489909 = 0xc2b2ae35
    * (murmur3 fmix32 constants).
    */
  def hash(id: Long): Long = {
    var n = id % 4611686018427387904L
    if (n < 0) n += 4611686018427387904L
    var h = (((n & 4294967295L) * 2654435761L) ^ ((n >>> 32) * 2246822519L)) & 4294967295L
    h ^= h >>> 16
    h = (h * 2246822507L) & 4294967295L
    h ^= h >>> 13
    h = (h * 3266489909L) & 4294967295L
    h ^ (h >>> 16)
  }
}
