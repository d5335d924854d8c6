package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** One harness-checkable query: a Spark implementation and (when
  * SQL-expressible) its DuckDB oracle twin over the same parquet tables.
  * Column names and row order MUST match between the two (the driver
  * sorts columns by name, then hash-compares values in row order).
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String = "")

object Catalog {
  /** Global orderBy for a query whose TAIL is an expensive per-row
    * kernel (media decode, ellipsoid quadrature, html extraction,
    * WKB assembly): a bare `orderBy` puts RangePartitioning directly
    * above the kernel segment, and its boundary-SAMPLING pass
    * re-executes everything below down to the nearest exchange — the
    * kernel runs twice. Hash-repartitioning on the sort keys first
    * materializes the kernel output once (AQE reads the shuffle files
    * for both the sample and the sort). Measured at sf10g
    * (SortFixProbe, r19): mm_resize_real 4.0×, mm_pixel_stats 2.05×,
    * way_area_ellipsoid_exact 1.95×, poi_geodesic_distance 1.8×,
    * way_linestring 1.6×, multipolygon_assembly 1.4×. Use ONLY where
    * the doubled segment is expensive — for a cheap-scan tail the
    * extra shuffle of full rows LOSES to a rescan, and for a tail
    * already behind an aggregation the sampler reads materialized
    * shuffles anyway (dedup_jaccard_pairs ~1.1×, events_proximity_join
    * no win — left as-written).
    */
  implicit final class OrderByOnce(private val df: DataFrame) {
    def orderByOnce(keys: Column*): DataFrame =
      df.repartition(keys: _*).orderBy(keys: _*)
  }

  def all: Seq[Q] =
    PoiQueries.all ++
    GeoQueries.all ++
    RelationQueries.all ++
    AnalyticsQueries.all ++
    DedupQueries.all ++
    SimilarityQueries.all ++
    TextQueries.all ++
    SamplingQueries.all ++
    MultimodalQueries.all

  def queries: Map[String, (SparkSession, String) => DataFrame] = {
    val names = all.map(_.name)
    require(names.distinct.size == names.size,
      s"duplicate query names: ${names.diff(names.distinct).distinct.mkString(", ")}")
    all.map(q => q.name -> q.run).toMap
  }

  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}
