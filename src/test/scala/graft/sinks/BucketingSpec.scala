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

  test("bucketed POI materialization: way-assembly join is exchange-free") {
    import graft.operators.WayAssembly
    Seq("wn_bucketed", "nd_bucketed").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
      org.apache.commons.io.FileUtils.deleteQuietly(loc)
    }
    val ways = Tables.osmWays(spark, sf())
    // persist the exploded way_nodes relation and the node locations
    // both bucketed by the join key: the J2 join then needs NO shuffle
    // on either side — the 100 TB layout (ROADMAP #4)
    Bucketing.writeBucketed(WayAssembly.wayNodes(ways),
      "wn_bucketed", "node_id", numBuckets = 4, sortCols = Seq("node_id"))
    val nodeLoc = ways
      .select(col("ring"), posexplode(col("nodes")).as(Seq("pos", "node_id")))
      .select(col("node_id"),
        element_at(col("ring"), col("pos") + 1).getField("lon").as("lon"),
        element_at(col("ring"), col("pos") + 1).getField("lat").as("lat"))
    Bucketing.writeBucketed(nodeLoc,
      "nd_bucketed", "node_id", numBuckets = 4, sortCols = Seq("node_id"))

    val joined = spark.table("wn_bucketed")
      .join(spark.table("nd_bucketed"), "node_id")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed assembly join still shuffles:\n$plan")
      // the join output feeds the regroup exactly like assembleRings
      val assembled = joined.groupBy(col("way_id").as("id"))
        .agg(transform(
          sort_array(collect_list(struct(col("pos"), col("lon"), col("lat")))),
          e => struct(e.getField("lon").as("lon"), e.getField("lat").as("lat")))
          .as("ring"))
      assert(assembled.count() == ways.count())
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }
}
