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
    * predicate on it skips buckets. Deterministic (ntile semantics
    * over a total order — callers pass a unique `tieBreak`) so it is
    * oracle-checkable.
    *
    * NOT a global window (r19): `ntile(b) OVER (ORDER BY ...)` is an
    * unpartitioned window — Spark moves the ENTIRE relation to one
    * task and sorts it single-threaded (the bench read maxtask ≈ wall,
    * 27.0 of 27.6 s at sf10g; at cluster scale the query simply cannot
    * run). The scalable exact equivalent: range-repartition on
    * (key, tie) so partitions are contiguous key ranges, count rows
    * per partition (ONE collect of O(partitions) longs — bounded
    * driver state, the centroid/loop-state convention), convert the
    * within-partition `monotonically_increasing_id` record number to a
    * global rank with the offset table, and apply ntile's documented
    * assignment arithmetic (first N mod b buckets get ⌈N/b⌉ rows, the
    * rest ⌊N/b⌋) to the rank. Bucket ids are bit-identical to the
    * window form on any total order; the localCheckpoint pins the
    * sorted layout so the offset pass and the envelope pass read one
    * materialization (and record-number assignment cannot drift
    * between them).
    */
  def bucketEnvelopes(df: DataFrame, key: Column, tieBreak: Column,
      buckets: Int, dims: (String, Column)*): DataFrame = {
    val dimCols = dims.map { case (name, c) => c.as(s"__d_$name") }
    val keyed = df.select(key.as("__k") +: tieBreak.as("__t") +: dimCols: _*)
    val parts = math.max(buckets,
      df.sparkSession.sparkContext.defaultParallelism)
    val sorted = keyed
      .repartitionByRange(parts, col("__k"), col("__t"))
      .sortWithinPartitions(col("__k"), col("__t"))
      .withColumn("__mid", monotonically_increasing_id())
      .localCheckpoint()
    // per-partition row counts → global-rank offsets (mid layout:
    // upper bits = partition id, lower 33 = record number in order)
    val counts = sorted.groupBy(shiftright(col("__mid"), 33).as("__pid"))
      .agg(count(lit(1)).as("c")).collect()
      .map(r => (r.getLong(0).toInt, r.getLong(1)))
    val n = counts.map(_._2).sum
    val offs = new Array[Long](parts)
    counts.sortBy(_._1).foreach { case (pid, c) =>
      var p = pid + 1
      while (p < parts) { offs(p) += c; p += 1 }
    }
    val q = n / buckets
    val r = n % buckets
    val cut = (q + 1) * r
    val gidx = element_at(lit(offs), shiftright(col("__mid"), 33).cast("int") + 1) +
      col("__mid").bitwiseAND(lit((1L << 33) - 1))
    val bucket = sorted.withColumn("__gidx", gidx)
      .withColumn("__bucket", expr(
        s"CASE WHEN __gidx < ${cut}L THEN __gidx div ${q + 1}L + 1 " +
          s"ELSE ${r}L + (__gidx - ${cut}L) div ${math.max(q, 1L)}L + 1 END")
        .cast("int"))
    val aggs = dims.flatMap { case (name, _) =>
      Seq(min(col(s"__d_$name")).as(s"min_$name"),
        max(col(s"__d_$name")).as(s"max_$name"))
    } :+ count(lit(1)).as("n")
    bucket.groupBy(col("__bucket").as("bucket"))
      .agg(aggs.head, aggs.tail: _*)
      .orderBy(col("bucket"))
  }
}
