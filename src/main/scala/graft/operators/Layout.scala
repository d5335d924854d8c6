package graft.operators

import graft.functions.ZOrder
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: cluster a table so that every output
  * partition/file is tight in ALL listed dimensions, not just the
  * leading one. At 100 TB this is the difference between a point/range
  * query reading a handful of files and reading the corpus: parquet
  * min/max row-group stats (and any file-level catalog) prune on
  * whichever dimension the predicate touches.
  *
  * Scale shape: one `repartitionByRange` shuffle on the Morton key
  * (Spark samples the key distribution, so skewed dimensions still
  * yield balanced output files) + an in-partition sort. No driver
  * state, no collect; `numPartitions` is the target file count.
  */
object Layout {

  /** Cluster `df` by the Z-order key of `dims` (each masked to `bits`
    * low bits). Output partitions are contiguous, balanced key ranges,
    * each sorted — the write-side layout for skip-friendly parquet.
    */
  def zorderClustered(df: DataFrame, bits: Int, numPartitions: Int,
      dims: Column*): DataFrame = {
    val keyed = df.withColumn("__zkey", ZOrder.key(bits, dims: _*))
    keyed.repartitionByRange(numPartitions, col("__zkey"))
      .sortWithinPartitions("__zkey")
      .drop("__zkey")
  }

  /** Per-bucket min/max envelope of each dimension after sorting by
    * `key` — the pruning-effectiveness probe. `buckets` plays the role
    * of output files; a dimension's envelopes being narrow means a
    * predicate on it skips buckets. Deterministic (ntile over a total
    * order) so it is oracle-checkable; the WRITE path uses
    * [[zorderClustered]]'s range partitioner instead of a global
    * window.
    */
  def bucketEnvelopes(df: DataFrame, key: Column, tieBreak: Column,
      buckets: Int, dims: (String, Column)*): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.orderBy(key, tieBreak)
    val keyed = df.withColumn("__bucket", ntile(buckets).over(w))
    val aggs = dims.flatMap { case (name, c) =>
      Seq(min(c).as(s"min_$name"), max(c).as(s"max_$name"))
    } :+ count(lit(1)).as("n")
    keyed.groupBy(col("__bucket").as("bucket"))
      .agg(aggs.head, aggs.tail: _*)
      .orderBy(col("bucket"))
  }
}
