package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Column-statistics + cost-based optimization (SURVEY §4 "column
  * statistics"; ROADMAP item 8): `ANALYZE TABLE ... COMPUTE STATISTICS
  * FOR COLUMNS` on materialized outputs must flow into Catalyst's
  * estimates and CHANGE physical plans — the 100 TB payoff is a join
  * strategy picked from post-filter cardinality instead of raw file
  * size (a selective filter over a huge fact table is broadcast-able;
  * the unfiltered file is not).
  */
class CboStatsSpec extends SparkSpec {
  import spark.implicits._

  private def withCbo[A](f: => A): A = {
    val keys = Seq("spark.sql.cbo.enabled", "spark.sql.cbo.joinReorder.enabled")
    val before = keys.map(k => k -> spark.conf.getOption(k))
    keys.foreach(spark.conf.set(_, "true"))
    try f finally before.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("ANALYZE records exact rowCount; filter estimate shrinks under CBO") {
    val t = "cbo_fact"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    (0L until 10000L).map(i => (i, i % 100, s"p$i")).toDF("id", "grp", "payload")
      .write.saveAsTable(t)
    try {
      spark.sql(s"ANALYZE TABLE $t COMPUTE STATISTICS FOR COLUMNS id, grp")
      withCbo {
        val full = spark.table(t).queryExecution.optimizedPlan.stats
        assert(full.rowCount.contains(BigInt(10000)),
          s"expected exact rowCount from ANALYZE, got ${full.rowCount}")
        // equality filter on a 100-distinct-value column → ~1% estimate
        val filtered = spark.table(t).filter(col("grp") === 7)
          .queryExecution.optimizedPlan.stats
        assert(filtered.rowCount.isDefined)
        val est = filtered.rowCount.get
        assert(est < BigInt(1000) && est > BigInt(0),
          s"filter estimate should be ~100 of 10000, got $est")
      }
    } finally { spark.sql(s"DROP TABLE IF EXISTS $t"): Unit }
  }

  test("column stats flip a join to broadcast that file-size estimation rejects") {
    val fact = "cbo_fact2"; val dim = "cbo_dim2"
    spark.sql(s"DROP TABLE IF EXISTS $fact")
    spark.sql(s"DROP TABLE IF EXISTS $dim")
    // fact: INCOMPRESSIBLE wide payload (distinct digests defeat
    // parquet dictionary/snappy) so the FILE is far over the broadcast
    // threshold; the grp=7 slice is ~100 rows
    (0L until 10000L)
      .map(i => (i, i % 100, java.util.UUID.nameUUIDFromBytes(
        BigInt(i).toByteArray).toString * 6))
      .toDF("id", "grp", "payload")
      .write.saveAsTable(fact)
    (0L until 10000L).map(i => (i, s"d$i")).toDF("id", "name")
      .write.saveAsTable(dim)
    try {
      def joinPlan() = {
        val df = spark.table(dim).join(
          spark.table(fact).filter(col("grp") === 7), "id")
        df.collect() // run to final adaptive plan
        df.queryExecution.executedPlan.toString
      }
      val threshKey = "spark.sql.autoBroadcastJoinThreshold"
      val aqeKey = "spark.sql.adaptive.enabled"
      val before = (spark.conf.get(threshKey), spark.conf.get(aqeKey))
      // AQE off isolates the STATIC decision: AQE would rescue the
      // no-stats plan at runtime; CBO makes it right at compile time
      spark.conf.set(aqeKey, "false")
      // 64 KB: over the ~100-row filtered slice, far under the ~2 MB files
      spark.conf.set(threshKey, (64 * 1024).toString)
      try {
        val statless = joinPlan() // before ANALYZE: file-size estimation
        spark.sql(
          s"ANALYZE TABLE $fact COMPUTE STATISTICS FOR COLUMNS id, grp, payload")
        spark.sql(s"ANALYZE TABLE $dim COMPUTE STATISTICS FOR COLUMNS id")
        val withStats = withCbo { joinPlan() }
        assert(!statless.contains("BroadcastHashJoin"),
          s"file-size estimation should NOT broadcast the 2 MB fact:\n$statless")
        assert(withStats.contains("BroadcastHashJoin"),
          s"CBO + column stats should broadcast the filtered slice:\n$withStats")
      } finally {
        spark.conf.set(threshKey, before._1)
        spark.conf.set(aqeKey, before._2)
      }
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $fact")
      spark.sql(s"DROP TABLE IF EXISTS $dim"): Unit
    }
  }
}
