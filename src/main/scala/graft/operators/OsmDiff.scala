package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Replication-diff application — the operation behind the reference's
  * dormant `osmosisupdate()` hook (X1, schema.sql:84-92) and osmium's
  * `apply-changes`: an OSM change set carries creates/modifies as rows
  * with `visible = true` and deletes as `visible = false`; applying it
  * to a snapshot keeps, per id, the highest-version row and drops ids
  * whose winner is a delete.
  *
  * Scale: one hash shuffle on `id` into a window (or the equivalent
  * max_by aggregation) — the same cost as any keyed dedup; no driver
  * state, arbitrarily many change batches can be unioned before one
  * apply pass. OSM versions increase strictly per edit, so the
  * version-desc order is total per id within honest data; the change
  * side wins ties defensively (re-applied diffs are idempotent).
  */
object OsmDiff {

  /** Apply `changes` to `base`; both need (id, version, visible, …)
    * with identical schemas. Output: the updated snapshot (all
    * surviving rows, `visible` column retained, always true).
    * The OSM-schema instantiation of [[Upsert.mergeLatest]].
    */
  def applyDiff(base: DataFrame, changes: DataFrame): DataFrame =
    Upsert.mergeLatest(base, changes, idCol = "id", versionCol = "version",
      aliveExpr = col("visible"))
}
