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

  /** Exact ⌊t/b⌋ on longs (floor semantics for negative t too, via the
    * non-negative pmod) — `floor(col / b)` and Column `/` both round
    * through a DOUBLE, which silently loses micros above 2^53; SQL
    * `div` is true integral division.
    */
  private def floorDiv(t: Column, b: Long): Column =
    call_function("div", t - pmod(t, lit(b)), lit(b))

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

  /** Whale-key-safe sessionization: identical output to the
    * lag+running-sum session window (events_sessionize), computed
    * without ever sorting one user's whole timeline in one task.
    *
    * The plain form partitions the window by user — a whale user owning
    * half the events serializes into ONE window task, and AQE cannot
    * split a window partition. This two-phase form splits each user's
    * timeline into fixed time buckets of `bucketMinutes`:
    *
    *   1. event-level windows run within (user, bucket) — the whale's
    *      sort shards across timeline/bucket tasks;
    *   2. a per-(user, bucket) summary (first/last event time, local
    *      session-start count) feeds ONE tiny per-user window — rows =
    *      non-empty buckets, not events — that decides whether each
    *      bucket's initial event continues the previous bucket's last
    *      session (gap ≤ `gapMinutes` bridges it) and assigns each
    *      bucket its cumulative session-index offset;
    *   3. offsets join back by (user, bucket) and local running sums
    *      complete the global session index.
    *
    * The labeling is bucket-width-invariant (the bridge test compares
    * the same two timestamps the plain lag sees), so any
    * `bucketMinutes` ≥ 1 gives identical sessions; width only tunes
    * parallelism vs per-bucket overhead. Event-level shuffles key on
    * (user, bucket) throughout — nothing is ever keyed on user alone.
    *
    * @return (`userCol`, session_idx, n_events, dur_us) — session_idx
    *         1-based in time order per user, exactly the plain query's
    */
  def sessionizeBucketed(events: DataFrame, userCol: String, tsCol: String,
      idCol: String, gapMinutes: Int = 30,
      bucketMinutes: Int = 120): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(bucketMinutes >= 1, s"bucketMinutes must be >= 1: $bucketMinutes")
    val gapUs = gapMinutes.toLong * 60 * 1000000
    val bUs = bucketMinutes.toLong * 60 * 1000000
    val e = events.select(col(userCol).as("__u"), col(idCol).as("__eid"),
        unix_micros(col(tsCol)).as("__t"))
      .withColumn("__tb", floorDiv(col("__t"), bUs))
    val inBucket = Window.partitionBy(col("__u"), col("__tb"))
      .orderBy(col("__t"), col("__eid"))
    // session-start flag for non-initial events; the bucket-initial
    // event (lag null) stays NULL here — its flag is the bucket-level
    // bridge decision joined back in step 3
    val prevT = lag(col("__t"), 1).over(inBucket)
    val flagged = e.withColumn("__ln",
      when(prevT.isNotNull,
        when(col("__t") - prevT > gapUs, 1L).otherwise(0L)))
    val byUser = Window.partitionBy(col("__u")).orderBy(col("__tb"))
    val prevLast = lag(col("__last_t"), 1).over(byUser)
    val bmeta = flagged.groupBy(col("__u"), col("__tb"))
      .agg(min(col("__t")).as("__first_t"), max(col("__t")).as("__last_t"),
        sum(coalesce(col("__ln"), lit(0L))).as("__k"))
      // empty buckets simply don't appear: lag skips to the previous
      // NON-EMPTY bucket, which holds the previous event by definition
      .withColumn("__nf",
        when(prevLast.isNotNull && col("__first_t") - prevLast <= gapUs, 0L)
          .otherwise(1L))
      .withColumn("__prefix",
        coalesce(sum(col("__nf") + col("__k"))
          .over(byUser.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__u"), col("__tb"), col("__nf"), col("__prefix"))
    flagged.join(bmeta, Seq("__u", "__tb"))
      .withColumn("__sid", col("__prefix") +
        sum(coalesce(col("__ln"), col("__nf")))
          .over(inBucket.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("__u"), col("__sid"))
      .agg(count(lit(1)).as("n_events"),
        (max(col("__t")) - min(col("__t"))).as("dur_us"))
      .select(col("__u").as(userCol), col("__sid").as("session_idx"),
        col("n_events"), col("dur_us"))
  }

  /** Whale-key-safe RANGE-frame rolling aggregate: per event, count
    * and sum of `valueCol` over the key's events in the trailing
    * `rangeUs` microseconds — identical to a
    * `Window.partitionBy(key).orderBy(t).rangeBetween(-rangeUs, 0)`
    * frame, computed without a per-key window.
    *
    * Each event lands in time bucket ⌊t/rangeUs⌋ twice: once as an
    * OWNED row of its own bucket and once as CONTEXT for the next
    * bucket. A trailing frame of width `rangeUs` can only reach into
    * the previous bucket, so the (key, bucket) slice — own rows plus
    * the previous bucket's context copies — contains every frame
    * member of every owned row; the RANGE window runs within the
    * slice and context rows are dropped after. 2× the rows, but every
    * shuffle and sort keys on (key, bucket): a whale key shards across
    * its timeline instead of serializing into one window task.
    *
    * Sum accumulation order within a frame differs from the plain
    * window's — callers comparing the two should round, as the catalog
    * queries do (the frame SETS are identical, float order noise only).
    *
    * @return (`idCol`, `keyCol`, n, s) — frame row count and value sum
    */
  def rollingBucketed(events: DataFrame, keyCol: String, tsCol: String,
      idCol: String, valueCol: String, rangeUs: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(rangeUs >= 1, s"rangeUs must be >= 1: $rangeUs")
    val base = events.select(col(idCol).as("__eid"), col(keyCol).as("__u"),
      unix_micros(col(tsCol)).as("__t"), col(valueCol).as("__v"))
    val own = base.withColumn("__tb", floorDiv(col("__t"), rangeUs))
      .withColumn("__own", lit(true))
    val ctx = base.withColumn("__tb", floorDiv(col("__t"), rangeUs) + 1)
      .withColumn("__own", lit(false))
    val w = Window.partitionBy(col("__u"), col("__tb")).orderBy(col("__t"))
      .rangeBetween(-rangeUs, 0)
    own.unionByName(ctx)
      .select(col("__eid"), col("__u"), col("__own"),
        count(lit(1)).over(w).as("n"), sum(col("__v")).over(w).as("s"))
      .filter(col("__own"))
      .select(col("__eid").as(idCol), col("__u").as(keyCol),
        col("n"), col("s"))
  }
}
