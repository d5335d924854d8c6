package graft.sinks

import graft.model.PoiSettings
import org.apache.spark.sql.{DataFrame, SaveMode}

/** Sink surface (SURVEY.md §2.2 K1–K5).
  *
  * The reference bulk-COPYs 10,000-row micro-batches into Postgres with
  * a hard failure on duplicate ids (filter.py:23-77, 58-64;
  * WRITE_AFTER settings_default.py:50). Here:
  *   - parquet is the harness-facing K1 (columnar, splittable);
  *   - JDBC is the capability-parity K1 — `batchsize` IS the K2
  *     micro-batch (executors flush every `writeAfter` rows);
  *   - default SaveMode.ErrorIfExists mirrors the duplicate-load
  *     failure (SURVEY.md §7.4.6);
  *   - the K3 dead-letter branch takes the F6 invalid rows.
  */
object PoiSink {

  /** K1 (harness): parquet. Fails if the target exists, like the
    * reference's PK-violation abort; pass overwrite/append explicitly.
    */
  def writeParquet(df: DataFrame, path: String,
      mode: SaveMode = SaveMode.ErrorIfExists): Unit =
    df.write.mode(mode).parquet(path)

  /** K1+K2 (capability parity): JDBC with micro-batched flushes. Not
    * exercised by the harness (no database in the container); the
    * options are the documented production shape.
    */
  def writeJdbc(df: DataFrame, url: String, table: String,
      settings: PoiSettings, mode: SaveMode = SaveMode.ErrorIfExists): Unit =
    df.write.mode(mode)
      .format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("batchsize", settings.writeAfter)
      .save()

  /** K3: dead-letter dump of rows whose geometry failed to build
    * (reference dumps the buffer to logs/error_obj_list.csv,
    * filter.py:71-77). WKB can't go to CSV, so invalid rows are dumped
    * id-first as parquet.
    */
  def writeDeadLetter(bad: DataFrame, path: String): Unit =
    bad.drop("geom").write.mode(SaveMode.Overwrite).parquet(path)
}
