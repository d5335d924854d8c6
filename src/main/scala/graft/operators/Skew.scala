package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for hot-key joins and aggregations.
  *
  * AQE's skew-join handling (`spark.sql.adaptive.skewJoin.enabled`, on
  * by default) covers sort-merge joins at runtime; these helpers cover
  * the cases AQE can't see — a priori known hot keys, and aggregation
  * skew — with the classic salting construction:
  *
  *   - [[saltedJoin]]: the big (skewed) side gets a random-ish salt in
  *     [0, n); the small side is replicated n× with every salt value;
  *     the join key becomes (key, salt), splitting each hot key's rows
  *     across n reducers. Results are identical to the plain join.
  *   - [[saltedAgg]]: two-level aggregation — partial by (key, salt),
  *     final by key. For algebraic aggregates Spark's partial
  *     aggregation already does this per-partition; the explicit salt
  *     level helps when the *grouping* itself is the bottleneck (e.g.
  *     collect_list on hot keys).
  *
  * The salt is derived from stable row content (xxhash64 of all
  * columns), not rand(): deterministic under retries and speculative
  * execution, which a nondeterministic salt is not.
  */
object Skew {

  private def saltCol(df: DataFrame, n: Int): Column =
    pmod(xxhash64(df.columns.map(col).toIndexedSeq: _*), lit(n)).cast("int")

  /** Inner equi-join `big ⋈ small` on `key`, salted `n` ways. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, n: Int): DataFrame = {
    val salted = big.withColumn("__salt", saltCol(big, n))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(n - 1)).cast("array<int>")))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-level salted aggregation: partial aggregate by (key, salt),
    * final merge by key. Caller supplies both levels (e.g. partial
    * `collect_list` → final `flatten(collect_list)`).
    */
  def saltedAgg(df: DataFrame, key: String, n: Int,
      partial: Seq[Column], finalAgg: Seq[Column]): DataFrame =
    df.withColumn("__salt", saltCol(df, n))
      .groupBy(col(key), col("__salt"))
      .agg(partial.head, partial.tail: _*)
      .groupBy(col(key))
      .agg(finalAgg.head, finalAgg.tail: _*)
}
