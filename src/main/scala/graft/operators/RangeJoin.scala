package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval-containment) join: attach to each point row the
  * interval rows `[lo, hi]` (inclusive) of the same key that contain the
  * point. Spark plans a raw `p.t BETWEEN i.lo AND i.hi` join as a
  * nested-loop (the only equi-part is the key), which is O(|points| x
  * |intervals-per-key|) — fatal when one key holds many intervals.
  *
  * Binned form instead: pick a bin width, explode each interval to the
  * bins it covers (`sequence(floor(lo/w), floor(hi/w))`), map each point
  * to its single bin, equi-join on (key, bin), and keep the exact
  * containment predicate as a post-filter. Every matching (interval,
  * point) pair meets in exactly one bin — the point's — so no dedup step
  * is needed. Cost: one shuffle of points + intervals x (avg bins per
  * interval), all hash-partitioned; bin width should be near the median
  * interval length (wider = more false candidates per bin, narrower =
  * more interval replication).
  */
object RangeJoin {

  /** @param points    each row has `key` and a numeric/time column `t`
    * @param intervals each row has `key`, `lo`, `hi` (inclusive bounds,
    *                  same type as `t`); extra columns are carried
    * @param binWidth  bin size in the units of `t` (e.g. micros)
    * @return points' columns ++ intervals' non-key columns, one row per
    *         contained (point, interval) pair
    */
  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      key: String,
      t: String,
      lo: String,
      hi: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val iCols = intervals.columns.filter(_ != key).toSeq
    val collide = iCols.intersect(points.columns.toSeq)
    require(collide.isEmpty, s"interval columns collide with point columns: $collide")

    // Pure integer floor-division for bin ids: `floor(col / w)` promotes
    // to double, and a quotient within one ulp of an integer can round a
    // point into the wrong bin — since a match must meet in exactly the
    // point's bin, that silently drops a true pair (and doubles are only
    // exact below 2^53 anyway). `(x - pmod(x, w)) div w` is exact at any
    // Long: the numerator is the floor multiple (pmod is non-negative,
    // so this floors rather than truncates for negative x), and `div`'s
    // truncation is exact on an exact multiple.
    def bin(c: String): Column =
      expr(s"(CAST(`$c` AS BIGINT) - pmod(CAST(`$c` AS BIGINT), ${binWidth}L))" +
        s" div ${binWidth}L")
    val binned = intervals.withColumn("__bin",
      explode(sequence(bin(lo), bin(hi))))
    val p = points.withColumn("__bin", bin(t))
    p.join(binned,
        p(key) === binned(key) && p("__bin") === binned("__bin") &&
          p(t) >= binned(lo) && p(t) <= binned(hi))
      .select(points.columns.map(p(_)).toSeq ++ iCols.map(binned(_)): _*)
  }
}
