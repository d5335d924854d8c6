package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleave key — the multi-dimensional clustering
  * key under locality-preserving data layout. `key(bits, d0, d1, ...)`
  * masks each dimension to its low `bits` bits and interleaves them
  * (dimension d owns bit positions `i*dims + d`), so records close in
  * EVERY dimension land close in the one-dimensional sort order. Range-
  * partitioning + sorting by this key bounds each output file's min/max
  * in ALL dimensions at once — the property parquet row-group skipping
  * and Delta/Iceberg-style file pruning monetize: a predicate on any
  * single dimension prunes files, instead of only the leading column of
  * a lexicographic sort.
  *
  * Built as a `bits x dims` shift/and/or chain of built-in expressions
  * — no custom Expression needed: whole-stage codegen flattens it to
  * straight-line Java, and the identical arithmetic is expressible in
  * the DuckDB oracle's SQL (`zorderSqlTerms`). Null in any dimension
  * propagates to a null key (built-in null semantics).
  */
object ZOrder {

  /** Morton key of `dims` columns, `bits` low bits each (cast to long
    * first). Requires `bits * dims <= 63` so the key fits a non-negative
    * BIGINT in both engines.
    */
  def key(bits: Int, dims: Column*): Column = {
    require(dims.size >= 2, "z-order needs at least 2 dimensions")
    require(bits >= 1 && bits * dims.size <= 63,
      s"bits=$bits x dims=${dims.size} must fit in 63 bits")
    val n = dims.size
    val mask = (1L << bits) - 1
    val terms = for {
      (dim, d) <- dims.zipWithIndex
      masked = dim.cast("long").bitwiseAND(lit(mask))
      i <- 0 until bits
    } yield shiftleft(shiftright(masked, i).bitwiseAND(lit(1L)), i * n + d)
    terms.reduce(_ bitwiseOR _)
  }

  /** The same interleave as ANSI-ish SQL over pre-masked BIGINT
    * expressions (one per dimension) — the oracle-side twin of [[key]].
    */
  def sqlTerms(bits: Int, dimExprs: Seq[String]): String = {
    val n = dimExprs.size
    val terms = for {
      (e, d) <- dimExprs.zipWithIndex
      i <- 0 until bits
    } yield s"((($e >> $i) & 1) << ${i * n + d})"
    terms.mkString("(", " | ", ")")
  }
}
