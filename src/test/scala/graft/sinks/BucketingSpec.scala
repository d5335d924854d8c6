package graft.sinks

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

class BucketingSpec extends SparkSpec {

  test("bucketed-by-key join plans with no shuffle exchange") {
    // clean both catalog entries and any leftover warehouse dirs from a
    // previous JVM (the in-memory catalog forgets them but the
    // location survives on disk)
    Seq("li_bucketed", "ord_bucketed").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
      org.apache.commons.io.FileUtils.deleteQuietly(loc)
    }
    Bucketing.writeBucketed(Tables.lineitem(spark, sf()),
      "li_bucketed", "l_orderkey", numBuckets = 4, sortCols = Seq("l_orderkey"))
    Bucketing.writeBucketed(Tables.orders(spark, sf()),
      "ord_bucketed", "o_orderkey", numBuckets = 4, sortCols = Seq("o_orderkey"))

    val joined = spark.table("li_bucketed")
      .join(spark.table("ord_bucketed"),
        col("l_orderkey") === col("o_orderkey"))
    // disable auto-broadcast so the join strategy under test is SMJ
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      assert(joined.count() == Tables.lineitem(spark, sf()).count())
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }
}
