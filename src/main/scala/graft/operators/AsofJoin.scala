package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for each probe row, attach the single
  * build row with the greatest build time at-or-before the probe's time
  * within the same key group — the join a feature-store / training-data
  * pipeline needs to pair label events with the latest preceding feature
  * snapshot.
  *
  * Spark has no native as-of join, and the naive encoding (equi-join on
  * key plus a time inequality, then keep the max per probe row) explodes
  * to |all key-time matches| intermediate rows before pruning. This is
  * the linear single-shuffle form instead: union build and probe rows
  * into one relation, hash-partition by key, sort each partition by
  * (time, side), and carry the build payload forward with
  * last(ignoreNulls) over rows UNBOUNDED PRECEDING .. CURRENT. Each
  * probe row then holds exactly the latest build payload at-or-before
  * its time. Build rows sort BEFORE probe rows at equal timestamps, so
  * the match is inclusive (probe.time >= build.time), matching DuckDB's
  * `ASOF JOIN` semantics.
  *
  * Scale model: ONE shuffle of |build| + |probe| rows keyed by the join
  * key, one sort per partition, zero row explosion, no driver state.
  * Survives 100 TB under the usual keyed-window caveat (salt upstream if
  * a single key dominates). Determinism caveat: if build has several
  * rows at the same (key, time), which one wins is sort-order dependent
  * — pre-aggregate build to one row per (key, time) for a deterministic
  * result.
  */
object AsofJoin {

  /** @param probe       left side; every column is kept
    * @param build       right side; must contain `key`, `buildTime` and
    *                    the `payload` columns
    * @param payload     build columns carried onto each probe row (must
    *                    not collide with probe column names)
    * @param buildTimeAs when set, the matched build row's time is
    *                    emitted under this name
    * @param inner       true drops probe rows with no preceding build
    *                    row (ASOF JOIN); false keeps them with null
    *                    payload (ASOF LEFT JOIN)
    */
  def asof(
      probe: DataFrame,
      build: DataFrame,
      key: String,
      probeTime: String,
      buildTime: String,
      payload: Seq[String],
      buildTimeAs: Option[String] = None,
      inner: Boolean = true): DataFrame = {
    val probeCols = probe.columns.toSeq
    require(payload.intersect(probeCols).isEmpty,
      s"payload columns collide with probe columns: ${payload.intersect(probeCols)}")

    // One unified schema; side 0 (build) sorts before side 1 (probe) at
    // equal timestamps so equal-time matches are included. `__bt` (the
    // build row's own time) doubles as the match marker: it is non-null
    // exactly when a preceding build row exists, independent of payload
    // nullability.
    val buildRows = build.select(
      col(key).as("__k") +: col(buildTime).as("__t") +: lit(0).as("__side") +:
        col(buildTime).as("__bt") +:
        (probeCols.map(c => lit(null).cast(probe.schema(c).dataType).as(c)) ++
          payload.map(col)): _*)
    val probeRows = probe.select(
      col(key).as("__k") +: col(probeTime).as("__t") +: lit(1).as("__side") +:
        lit(null).cast(build.schema(buildTime).dataType).as("__bt") +:
        (probeCols.map(col) ++
          payload.map(p => lit(null).cast(build.schema(p).dataType).as(p))): _*)

    val w = Window.partitionBy(col("__k")).orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carry = (payload :+ "__bt").map(p =>
      last(col(p), ignoreNulls = true).over(w).as(p))
    val carried = buildRows.unionByName(probeRows)
      .select(col("__side") +: (probeCols.map(col) ++ carry): _*)
      .filter(col("__side") === 1)
    val joined = if (inner) carried.filter(col("__bt").isNotNull) else carried
    val out = probeCols.map(col) ++ payload.map(col) ++
      buildTimeAs.map(a => col("__bt").as(a)).toSeq
    joined.select(out: _*)
  }
}
