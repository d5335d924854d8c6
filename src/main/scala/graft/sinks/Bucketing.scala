package graft.sinks

import org.apache.spark.sql.DataFrame

/** Bucketed-table support — the co-located-join strategy for repeated
  * big-big joins on a stable key (SURVEY.md §4 maps the reference's
  * spatial CLUSTER/index ideas here).
  *
  * Writing both sides bucketed by the join key into the warehouse means
  * every subsequent join on that key is exchange-free: Spark matches
  * bucket specs and plans a SortMergeJoin with NO shuffle on either
  * side. At 100 TB this converts the dominant repeated cost (full
  * reshuffle of the fact table per join) into a one-time layout cost at
  * write.
  */
object Bucketing {

  /** Persist `df` as a bucketed managed table. `sortCols` pre-sorts
    * within buckets so the sort-merge join skips its sort too.
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
      numBuckets: Int, sortCols: Seq[String] = Nil,
      overwrite: Boolean = true): Unit = {
    var w = df.write.format("parquet").bucketBy(numBuckets, key)
    if (sortCols.nonEmpty) w = w.sortBy(sortCols.head, sortCols.tail: _*)
    if (overwrite) w = w.mode("overwrite")
    w.saveAsTable(table)
  }
}
