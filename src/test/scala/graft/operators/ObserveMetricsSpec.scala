package graft.operators

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** A2 — progress counters: the reference logs one line per 1M objects
  * (filter.py:213-228); the declarative analog is `observe()` metrics
  * riding the existing pass. This spec captures them through a
  * QueryExecutionListener, proving they are populated (not just
  * plan decoration).
  */
class ObserveMetricsSpec extends SparkSpec {

  private def captureMetrics(action: => Unit): Map[String, Map[String, Any]] = {
    val seen = scala.collection.mutable.Map.empty[String, Map[String, Any]]
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, duration: Long): Unit =
        qe.observedMetrics.foreach { case (name, row) =>
          seen.synchronized {
            seen(name) = row.schema.fieldNames.zip(row.toSeq).toMap
          }
        }
      override def onFailure(funcName: String, qe: QueryExecution, e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      action
      // listener delivery is async; poll briefly for the metrics
      var waited = 0
      while (seen.synchronized(seen.isEmpty) && waited < 5000) {
        Thread.sleep(50); waited += 50
      }
    } finally spark.listenerManager.unregister(listener)
    seen.toMap
  }

  test("PoiPipeline emits the A2 rows_kept progress metric") {
    val metrics = captureMetrics {
      PoiPipeline.run(
        Tables.osmNodes(spark, sf()), Tables.osmWays(spark, sf()),
        Tables.classificationDimDf(spark),
        graft.queries.PoiQueries.baseSettings).nodesWithCentroids.count()
    }
    val kept = metrics.get("poi_nodes").flatMap(_.get("rows_kept"))
    assert(kept.exists(_.asInstanceOf[Long] > 0), metrics.toString)
  }

  test("jaccard skew cap reports pruned postings (0 on this corpus)") {
    val metrics = captureMetrics {
      Dedup.jaccardPairsGrouped(Tables.documents(spark, sf()),
        "doc_id", "text", k = 3, threshold = 0.8, maxShingleDf = 500).count()
    }
    val pruned = metrics.get("jaccard_skew_cap").flatMap(_.get("pruned_postings"))
    assert(pruned.contains(0L), metrics.toString) // max df 25 << 500
    // with a tight cap the metric counts what was dropped
    val tight = captureMetrics {
      Dedup.jaccardPairsGrouped(Tables.documents(spark, sf()),
        "doc_id", "text", k = 3, threshold = 0.8, maxShingleDf = 2).count()
    }
    val prunedTight = tight.get("jaccard_skew_cap").flatMap(_.get("pruned_postings"))
    assert(prunedTight.exists(_.asInstanceOf[Long] > 0), tight.toString)
  }

  test("pointsNearLines polar routing metric: 0 on OSM-envelope data, " +
      "> 0 iff a segment routed through the polar exact pass; unique " +
      "per-call names compose (r17 ADVICE)") {
    import spark.implicits._
    def pt(lon: Double, lat: Double) =
      Seq((1L, lon, lat)).toDF("id", "lon", "lat")
    def ln(aLon: Double, aLat: Double, bLon: Double, bLat: Double) =
      Seq((10L, Seq((aLon, aLat), (bLon, bLat)))).toDF("lid", "raw")
        .select($"lid", org.apache.spark.sql.functions.expr(
          "transform(raw, p -> named_struct('lon', p._1, 'lat', p._2))")
          .as("path"))
    def polarMetric(m: Map[String, Map[String, Any]]): Option[Any] =
      m.collectFirst { case (k, v) if k.startsWith("pnl_polar_exact_") =>
        v("polar_segments") }
    // equatorward: nothing routes polar (|lat| + margin << 86)
    val calm = captureMetrics {
      GeoJoin.pointsNearLines(pt(10.001, 45.0), ln(10.0, 44.9, 10.0, 45.1),
        "id", "lon", "lat", "lid", "path", radiusM = 500.0).count()
    }
    assert(polarMetric(calm).contains(0L), calm.toString)
    // polar: a segment at 87° N sits past the 86° cosine cap
    val polar = captureMetrics {
      GeoJoin.pointsNearLines(pt(10.001, 87.0), ln(10.0, 86.9, 10.0, 87.1),
        "id", "lon", "lat", "lid", "path", radiusM = 500.0).count()
    }
    assert(polarMetric(polar).exists(_.asInstanceOf[Long] > 0),
      polar.toString)
    // composition: two calls in ONE executed plan — the fixed
    // observation name used to fail analysis with a duplicate
    // CollectMetrics name (r17 ADVICE); unique suffixes make the
    // union analyzable and both metrics observable
    val both = captureMetrics {
      GeoJoin.pointsNearLines(pt(10.001, 45.0), ln(10.0, 44.9, 10.0, 45.1),
          "id", "lon", "lat", "lid", "path", radiusM = 500.0)
        .unionByName(GeoJoin.pointsNearLines(pt(10.001, 87.0),
          ln(10.0, 86.9, 10.0, 87.1),
          "id", "lon", "lat", "lid", "path", radiusM = 500.0))
        .count()
    }
    assert(both.keys.count(_.startsWith("pnl_polar_exact_")) == 2,
      both.toString)
  }
}
