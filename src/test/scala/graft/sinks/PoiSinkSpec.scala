package graft.sinks

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.SaveMode

/** Duplicate-load semantics (SURVEY.md §7.4.6): the reference aborts on
  * PK violation when re-run against a populated database
  * (filter.py:58-64); the engine mirrors this with the default
  * ErrorIfExists save mode.
  */
class PoiSinkSpec extends SparkSpec {
  import spark.implicits._

  test("re-running into an existing target fails; append/overwrite are explicit") {
    val out = Files.createTempDirectory("sink").toString + "/t"
    val df = Seq((1L, "a")).toDF("id", "v")
    PoiSink.writeParquet(df, out)
    intercept[Exception] { PoiSink.writeParquet(df, out) } // duplicate load
    PoiSink.writeParquet(df, out, SaveMode.Append)
    assert(spark.read.parquet(out).count() == 2)
    PoiSink.writeParquet(df, out, SaveMode.Overwrite)
    assert(spark.read.parquet(out).count() == 1)
  }

  test("pipeline observe metric reports classified row count (A2)") {
    import graft.operators.PoiPipeline
    import graft.sources.Tables
    import graft.model.PoiSettings
    val settings = PoiSettings(
      keys = Seq("orderstatus", "priority", "name"), minOccurrences = 1000L)
    val r = PoiPipeline.run(Tables.osmNodes(spark, sf()), Tables.osmWays(spark, sf()),
      Tables.classificationDimDf(spark), settings)
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      @volatile var kept: Option[Long] = None
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit = {
        qe.observedMetrics.get("poi_nodes").foreach(row => kept = Some(row.getLong(0)))
      }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val n = r.nodes.count()
      // listener delivery is async
      var tries = 0
      while (listener.kept.isEmpty && tries < 50) { Thread.sleep(100); tries += 1 }
      assert(listener.kept.contains(n))
    } finally spark.listenerManager.unregister(listener)
  }
}
