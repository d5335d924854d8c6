package graft.sinks

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** ROADMAP #8 — column statistics + CBO: materialized tables carry
  * ANALYZE statistics, and the cost-based optimizer consumes them
  * (row counts / sizes drive join-side selection at 100 TB, where
  * "which side broadcasts" is the difference between a plan that runs
  * and one that doesn't).
  */
class CboStatsSpec extends SparkSpec {

  test("ANALYZE TABLE populates table + column stats and CBO sees them") {
    spark.sql("DROP TABLE IF EXISTS cust_stats")
    val loc = new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), "cust_stats")
    org.apache.commons.io.FileUtils.deleteQuietly(loc)
    Tables.customer(spark, sf()).write.saveAsTable("cust_stats")
    spark.sql("ANALYZE TABLE cust_stats COMPUTE STATISTICS FOR COLUMNS c_custkey, c_nationkey")

    val desc = spark.sql("DESCRIBE EXTENDED cust_stats")
      .filter(col("col_name") === "Statistics").select("data_type").head().getString(0)
    assert(desc.contains("rows"), desc) // sizeInBytes + rowCount recorded

    val colStats = spark.sql("DESCRIBE EXTENDED cust_stats c_custkey").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(colStats.get("distinct_count").exists(_ != "NULL"), colStats.toString)

    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      val q = spark.table("cust_stats")
        .join(Tables.nation(spark, sf()), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name")).count()
      val stats = q.queryExecution.optimizedPlan.stats
      assert(stats.rowCount.isDefined || stats.sizeInBytes > 0, stats.toString)
    } finally spark.conf.unset("spark.sql.cbo.enabled")
  }
}
