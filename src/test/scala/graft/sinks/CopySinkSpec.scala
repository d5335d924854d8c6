package graft.sinks

import graft.SparkSpec
import graft.model.PoiSettings

/** K1/K2 true-COPY shape (filter.py:30-77): partition-level writer
  * streams TSV rows via the COPY protocol in `writeAfter`-row flushes,
  * a fresh connection per flush, dead-lettering the in-flight buffer on
  * failure. No database in the container, so an in-memory recorder
  * stands in for pgjdbc's CopyManager — the framing, buffering, and
  * connection lifecycle under test are exactly what `PgCopyProvider`
  * runs in production.
  */
object RecordingProvider {
  // local-mode executors share the JVM, so a static recorder observes
  // executor-side calls; keyed by run id to isolate tests
  val flushes = new java.util.concurrent.ConcurrentHashMap[String, java.util.List[(String, String)]]()
  val errors = new java.util.concurrent.ConcurrentHashMap[String, java.util.List[Seq[String]]]()
  def reset(runId: String): Unit = {
    flushes.put(runId, java.util.Collections.synchronizedList(new java.util.ArrayList))
    errors.put(runId, java.util.Collections.synchronizedList(new java.util.ArrayList))
  }
}

final class RecordingProvider(runId: String, failOnFlush: Int = -1)
    extends CopyProvider {
  def connect(): CopyConnection = new CopyConnection {
    private var used = false
    def copyIn(copySql: String, data: String): Long = {
      require(!used, "reference opens a FRESH connection per flush; reuse is a bug")
      used = true
      val fl = RecordingProvider.flushes.get(runId)
      if (failOnFlush >= 0 && fl.size() == failOnFlush)
        throw new RuntimeException("injected COPY failure")
      fl.add((copySql, data))
      data.split("\n", -1).length.toLong
    }
    def close(): Unit = ()
  }
  def onError(rows: Seq[String], e: Throwable): Unit =
    RecordingProvider.errors.get(runId).add(rows)
}

class CopySinkSpec extends SparkSpec {
  import spark.implicits._

  private def rows(n: Int) = (0 until n).map(i => s"row_$i").toDF("tsv")

  test("flushes every writeAfter rows on a fresh connection, preserving rows and order") {
    RecordingProvider.reset("t1")
    // 2 partitions x 125 rows, writeAfter=50 -> 3 flushes each (50+50+25)
    PoiSink.writeCopyTsv(rows(250).repartition(2), "nodes", "geom",
      PoiSettings(keys = Seq("k"), writeAfter = 50), new RecordingProvider("t1"))
    val fl = RecordingProvider.flushes.get("t1")
    assert(fl.size() == 6) // one connection per flush, enforced in copyIn
    import scala.jdk.CollectionConverters._
    val sizes = fl.asScala.map(_._2.split("\n", -1).length)
    assert(sizes.count(_ == 50) == 4 && sizes.count(_ == 25) == 2)
    // every row lands exactly once
    val all = fl.asScala.flatMap(_._2.split("\n", -1)).toSet
    assert(all == (0 until 250).map(i => s"row_$i").toSet)
    // COPY target list is the reference's 7 columns with the node geom
    assert(fl.asScala.forall(_._1 ==
      "COPY nodes (id, version, user_id, tstamp, changeset_id, tags, geom) FROM STDIN"))
  }

  test("ways target the linestring geometry column (filter.py:43)") {
    assert(PoiSink.copySql("ways", "linestring") ==
      "COPY ways (id, version, user_id, tstamp, changeset_id, tags, linestring) FROM STDIN")
  }

  test("flush failure dead-letters the in-flight buffer and fails the job (K3)") {
    RecordingProvider.reset("t2")
    val e = intercept[Exception] {
      PoiSink.writeCopyTsv(rows(120).coalesce(1), "nodes", "geom",
        PoiSettings(keys = Seq("k"), writeAfter = 50),
        new RecordingProvider("t2", failOnFlush = 1))
    }
    assert(e.getMessage != null)
    import scala.jdk.CollectionConverters._
    val errs = RecordingProvider.errors.get("t2").asScala
    // exactly the second 50-row buffer was in flight (task may retry;
    // every dead-lettered buffer is that same flush)
    assert(errs.nonEmpty && errs.forall(_.size == 50))
    assert(errs.head.head == "row_50")
  }

  test("TSV framing comes from HstoreCompat.tsvRow (C7 end-to-end)") {
    RecordingProvider.reset("t3")
    import org.apache.spark.sql.functions._
    import graft.functions.HstoreCompat
    val df = Seq((7L, 2, 11L, java.sql.Timestamp.valueOf("2024-05-06 07:08:09"),
        99L, Map("amenity" -> "cafe"), Array[Byte](1, 2)))
      .toDF("id", "version", "user_id", "tstamp", "changeset_id", "tags", "geom")
      .select(HstoreCompat.tsvRow(col("id"), col("version"), col("user_id"),
        col("tstamp"), col("changeset_id"), col("tags"), col("geom")).as("tsv"))
    PoiSink.writeCopyTsv(df, "nodes", "geom",
      PoiSettings(keys = Seq("k")), new RecordingProvider("t3"))
    val data = RecordingProvider.flushes.get("t3").get(0)._2
    assert(data == "7\t2\t11\t2024-05-06 07:08:09\t99\t\"amenity\"=>\"cafe\"\t0102")
  }
}
