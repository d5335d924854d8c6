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
  * Survives 100 TB under the usual keyed-window caveat; if a single key
  * dominates, apply the salted two-phase pattern
  * [[Sampling.stratifiedByHashSalted]] demonstrates — phase-1 the
  * carry-forward within (key, time-bucket) salts, then stitch bucket
  * boundaries with a per-(key, bucket) last-build row relation. Determinism caveat: if build has several
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
    // equal timestamps so equal-time matches are included. The build
    // time plus ALL payload columns travel as ONE struct (`__b`): a
    // struct literal is non-null for every build row even when payload
    // fields are null, so last(ignoreNulls) carries the whole matched
    // row atomically — carrying columns independently would pair an
    // OLDER row's non-null payload with a NEWER row's time whenever the
    // newest preceding build row has a null payload field (diverging
    // from ASOF JOIN semantics, which return the newer row's null).
    require(!payload.contains("__bt"), "payload column name __bt is reserved")
    val bStruct = struct(col(buildTime).as("__bt") +: payload.map(col): _*)
    val bType = build.select(bStruct.as("__b")).schema("__b").dataType
    val buildRows = build.select(
      col(key).as("__k") +: col(buildTime).as("__t") +: lit(0).as("__side") +:
        bStruct.as("__b") +:
        probeCols.map(c => lit(null).cast(probe.schema(c).dataType).as(c)): _*)
    val probeRows = probe.select(
      col(key).as("__k") +: col(probeTime).as("__t") +: lit(1).as("__side") +:
        lit(null).cast(bType).as("__b") +: probeCols.map(col): _*)

    val w = Window.partitionBy(col("__k")).orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = buildRows.unionByName(probeRows)
      .select(col("__side") +: (probeCols.map(col) :+
        last(col("__b"), ignoreNulls = true).over(w).as("__b")): _*)
      .filter(col("__side") === 1)
    // the carried struct is non-null exactly when a preceding build row
    // exists — the match marker, independent of payload nullability
    val joined = if (inner) carried.filter(col("__b").isNotNull) else carried
    val out = probeCols.map(col) ++
      payload.map(p => col("__b").getField(p).as(p)) ++
      buildTimeAs.map(a => col("__b").getField("__bt").as(a)).toSeq
    joined.select(out: _*)
  }

  /** Skew-safe [[asof]] for a dominant key: the keyed window above
    * serializes ALL of a key's rows through one partition, so a key
    * holding 10% of 100 TB stalls the stage. This variant runs the
    * carry-forward within (key, time-bucket) — the hot key's sort
    * splits across its time range — then fixes up the only rows that
    * lost information (probes whose latest build sits in an EARLIER
    * bucket) with a bucket-level boundary relation: one row per
    * (key, bucket), carry-forwarded over buckets (bounded by the bucket
    * count, not the row count) and joined back on (key, bucket) — a key
    * whose skew is spread over time stays spread in the join. Output is
    * row-for-row [[asof]] (spec-pinned).
    *
    * Times must be integral (e.g. epoch micros); `bucketWidth` is in
    * those units — pick it so a hot key's per-bucket row count fits a
    * partition (e.g. a day of micros for a year-spanning feed).
    *
    * Measured under adversarial skew (SkewGen: one user holds 50% of
    * 100M events; 1h buckets over ~a week; round-10 BASELINE.md): the
    * SLOWEST TASK — which is what a real cluster's wall-clock follows,
    * since the other 999 executors wait on the hot key's partition —
    * drops from 8.4–10.5 s (plain, the hot key's serialized window
    * sort) to 3.1–4.8 s here, with local[32] wall-clock already
    * slightly ahead despite the two extra shuffles. At local[32] the
    * hot task hides behind 31 busy cores, so end-to-end time
    * understates the cluster-scale win; maxtask is the honest metric.
    */
  def asofSalted(
      probe: DataFrame,
      build: DataFrame,
      key: String,
      probeTime: String,
      buildTime: String,
      payload: Seq[String],
      bucketWidth: Long,
      buildTimeAs: Option[String] = None,
      inner: Boolean = true): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val probeCols = probe.columns.toSeq
    require(payload.intersect(probeCols).isEmpty,
      s"payload columns collide with probe columns: ${payload.intersect(probeCols)}")
    require(!payload.contains("__bt"), "payload column name __bt is reserved")

    val bStruct = struct(col(buildTime).as("__bt") +: payload.map(col): _*)
    val bType = build.select(bStruct.as("__b")).schema("__b").dataType
    val buildRows = build.select(
      col(key).as("__k") +: col(buildTime).as("__t") +: lit(0).as("__side") +:
        bStruct.as("__b") +:
        probeCols.map(c => lit(null).cast(probe.schema(c).dataType).as(c)): _*)
    val probeRows = probe.select(
      col(key).as("__k") +: col(probeTime).as("__t") +: lit(1).as("__side") +:
        lit(null).cast(bType).as("__b") +: probeCols.map(col): _*)
    // integer floor-bucket (see RangeJoin for why not floor(t / w))
    val unified = buildRows.unionByName(probeRows).withColumn("__bk",
      expr(s"(__t - pmod(__t, ${bucketWidth}L)) div ${bucketWidth}L"))

    // phase 1: the asof carry-forward, but per (key, BUCKET)
    val w1 = Window.partitionBy(col("__k"), col("__bk"))
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val inBucket = unified
      .select(col("__side") +: col("__k") +: col("__bk") +:
        (probeCols.map(col) :+
          last(col("__b"), ignoreNulls = true).over(w1).as("__b")): _*)
      .filter(col("__side") === 1)

    // bucket-level boundary: latest build per (key, bucket) ...
    val lastPerBucket = unified.filter(col("__side") === 0)
      .groupBy(col("__k"), col("__bk"))
      .agg(max_by(col("__b"), col("__b.__bt")).as("__bb"))
    // ... carry-forwarded to each PROBE bucket over strictly-earlier
    // buckets (probe side orders BEFORE build side at the same bucket,
    // so same-bucket builds — phase 1's job — are excluded). One row
    // per (key, bucket): the dominant key contributes #buckets rows to
    // this window, not #rows. The bucket set comes from the PRE-window
    // frame — deriving it from `inBucket` would re-run the full phase-1
    // carry-forward a second time just to enumerate distinct buckets.
    val probeBuckets = unified.filter(col("__side") === 1)
      .select(col("__k"), col("__bk")).distinct()
      .select(col("__k"), col("__bk"), lit(0).as("__s"),
        lit(null).cast(bType).as("__bb"))
    val w2 = Window.partitionBy(col("__k")).orderBy(col("__bk"), col("__s"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val boundary = probeBuckets
      .unionByName(lastPerBucket.select(col("__k"), col("__bk"),
        lit(1).as("__s"), col("__bb")))
      .select(col("__k"), col("__bk"), col("__s"),
        last(col("__bb"), ignoreNulls = true).over(w2).as("__bb"))
      .filter(col("__s") === 0)
      .drop("__s")

    // fix-up join keyed (key, bucket) — skew stays bucket-spread
    val carried = inBucket.join(boundary, Seq("__k", "__bk"), "left")
      .withColumn("__b", coalesce(col("__b"), col("__bb")))
    val joined = if (inner) carried.filter(col("__b").isNotNull) else carried
    val out = probeCols.map(col) ++
      payload.map(p => col("__b").getField(p).as(p)) ++
      buildTimeAs.map(a => col("__b").getField("__bt").as(a)).toSeq
    joined.select(out: _*)
  }
}
