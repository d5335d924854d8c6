package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

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
