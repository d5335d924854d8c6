package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyed MERGE ("upsert") — the generalized form of the reference's
  * replication-diff application ([[OsmDiff]], X1): per key keep the
  * highest-version row, with the change side winning version ties
  * (idempotent re-apply), and drop keys whose winner is not alive.
  * This is what an incrementally-refreshed training corpus needs —
  * nightly crawl deltas carry new/updated docs as alive rows and
  * takedowns/robots-revocations as dead rows, and the snapshot after
  * apply is a pure function of (base, changes).
  *
  * Scale: ONE hash shuffle on the key into a keyed window — the same
  * cost as any keyed dedup; no driver state; arbitrarily many change
  * batches can be unioned before a single apply pass (see the
  * determinism precondition on [[mergeLatest]] when unioned batches
  * can repeat an (id, version)).
  */
object Upsert {

  /** Apply `changes` to `base` (identical schemas). `aliveExpr`
    * evaluates on the per-key winner; rows where it is false leave the
    * snapshot. Output keeps all input columns.
    *
    * DETERMINISM PRECONDITION: the window orders by (version DESC,
    * side DESC, tieBreak...). With the default empty `tieBreak`, the
    * result is a pure function of (base, changes) only if (id, version)
    * is unique WITHIN each side — true for OSM (id+version is the
    * replication PK) and for any single change batch, but NOT
    * guaranteed when arbitrarily many change batches are unioned. In
    * that case pass `tieBreak` (e.g. a batch sequence number or a
    * stable payload hash) to make the winner — including its alive
    * flag — deterministic; ties are broken by the given columns DESC.
    */
  def mergeLatest(base: DataFrame, changes: DataFrame, idCol: String,
      versionCol: String, aliveExpr: Column,
      tieBreak: Seq[Column] = Nil): DataFrame = {
    val unioned = base.withColumn("__src", lit(0))
      .unionByName(changes.withColumn("__src", lit(1)))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col(versionCol).desc +: col("__src").desc +:
        tieBreak.map(_.desc): _*)
    unioned
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && aliveExpr)
      .drop("__rn", "__src")
  }
}
