package graft.sinks

import graft.model.PoiSettings
import org.apache.spark.sql.{DataFrame, SaveMode}

/** One COPY statement's worth of work: opened fresh per flush, closed
  * after. Production impl wraps pgjdbc's CopyManager; tests drive an
  * in-memory recorder.
  */
trait CopyConnection extends AutoCloseable {
  /** Stream `data` (newline-joined TSV rows) as one `COPY ... FROM
    * STDIN`; returns rows written.
    */
  def copyIn(copySql: String, data: String): Long
}

/** Executor-side factory + error hook for [[PoiSink.writeCopyTsv]].
  * Must be serializable — it ships inside the foreachPartition closure.
  */
trait CopyProvider extends Serializable {
  /** A FRESH connection per flush, mirroring the reference's
    * connection-per-10k-buffer lifecycle (filter.py:36-44: each
    * `write_osm_objects` opens its own `psycopg2.connect`).
    */
  def connect(): CopyConnection

  /** K3 dead-letter hook: called with the in-flight buffer when a flush
    * fails, before the failure is rethrown (reference dumps the buffer
    * to logs/error_obj_list.csv then exits, filter.py:71-77).
    */
  def onError(rows: Seq[String], e: Throwable): Unit
}

/** Production [[CopyProvider]]: pgjdbc's CopyManager, reached via
  * reflection so the engine compiles and tests without the postgres
  * driver jar (not in this build; ships with `--jars` on a real
  * cluster). One JDBC connection per flush, per the reference.
  */
final class PgCopyProvider(url: String, deadLetterDir: String)
    extends CopyProvider {
  def connect(): CopyConnection = new CopyConnection {
    private val conn = java.sql.DriverManager.getConnection(url)
    private val base = Class.forName("org.postgresql.core.BaseConnection")
      .asInstanceOf[Class[AnyRef]]
    private val mgr = Class.forName("org.postgresql.copy.CopyManager")
      .getConstructor(base).newInstance(conn.unwrap(base))
    def copyIn(copySql: String, data: String): Long =
      mgr.getClass.getMethod("copyIn", classOf[String], classOf[java.io.Reader])
        .invoke(mgr, copySql, new java.io.StringReader(data))
        .asInstanceOf[java.lang.Long].longValue()
    def close(): Unit = conn.close()
  }

  /** Reference writes logs/error_obj_list.csv (filter.py:72); here one
    * file per failing task so concurrent executors don't clobber.
    */
  def onError(rows: Seq[String], e: Throwable): Unit = {
    val p = java.nio.file.Paths.get(deadLetterDir,
      s"error_obj_list_${java.util.UUID.randomUUID()}.csv")
    java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.write(p, rows.mkString("\n").getBytes("UTF-8"))
  }
}

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

  /** The reference's 7-column COPY target list; the geometry column is
    * `geom` for nodes, `linestring` for ways (filter.py:43).
    */
  def copySql(table: String, geomColumn: String): String =
    s"COPY $table (id, version, user_id, tstamp, changeset_id, tags, " +
      s"$geomColumn) FROM STDIN"

  /** K1/K2 true-COPY shape: stream pre-framed TSV rows (one string
    * column, built with `HstoreCompat.tsvRow`) into Postgres via the
    * COPY protocol, flushing every `writeAfter` rows on a FRESH
    * connection — the reference's exact buffer lifecycle
    * (filter.py:36-57 + WRITE_AFTER, settings_default.py:50). Runs as
    * `foreachPartition`: each executor streams its partitions
    * independently, so ingest bandwidth scales with the cluster, and no
    * row ever transits the driver. A flush failure hands the in-flight
    * buffer to `provider.onError` (K3) and then fails the task — the
    * Spark-job analogue of the reference's `sys.exit(1)`.
    */
  def writeCopyTsv(tsvRows: DataFrame, table: String, geomColumn: String,
      settings: PoiSettings, provider: CopyProvider): Unit = {
    require(tsvRows.schema.length == 1 &&
      tsvRows.schema.head.dataType == org.apache.spark.sql.types.StringType,
      s"writeCopyTsv expects exactly one string column, got ${tsvRows.schema}")
    val sql = copySql(table, geomColumn)
    val writeAfter = settings.writeAfter
    tsvRows.foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
      val buf = new scala.collection.mutable.ArrayBuffer[String](writeAfter)
      def flush(): Unit = if (buf.nonEmpty) {
        val conn = provider.connect()
        try conn.copyIn(sql, buf.mkString("\n"))
        catch { case e: Throwable => provider.onError(buf.toSeq, e); throw e }
        finally conn.close()
        buf.clear()
      }
      rows.foreach { r =>
        buf += r.getString(0)
        if (buf.length >= writeAfter) flush()
      }
      flush()
    }
  }

  /** K3: dead-letter dump of rows whose geometry failed to build
    * (reference dumps the buffer to logs/error_obj_list.csv,
    * filter.py:71-77). WKB can't go to CSV, so invalid rows are dumped
    * id-first as parquet.
    */
  def writeDeadLetter(bad: DataFrame, path: String): Unit =
    bad.drop("geom").write.mode(SaveMode.Overwrite).parquet(path)
}
