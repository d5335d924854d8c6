package graft.operators

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin equals plain join on skewed keys") {
    // lineitem.l_suppkey is hot (10 suppliers, 60k rows at sf0.001)
    val li = Tables.lineitem(spark, sf()).select("l_suppkey", "l_quantity")
    val supRenamed = Tables.supplier(spark, sf())
      .select(col("s_suppkey").as("l_suppkey"), col("s_name"))
    val plain = li.join(supRenamed, "l_suppkey")
      .groupBy("s_name").agg(round(sum("l_quantity"), 2).as("q"))
    val salted = Skew.saltedJoin(li, supRenamed, "l_suppkey", n = 8)
      .groupBy("s_name").agg(round(sum("l_quantity"), 2).as("q"))
    assert(plain.exceptAll(salted).isEmpty && salted.exceptAll(plain).isEmpty)
    assert(salted.count() > 0)
  }

  test("saltedAgg two-level collect equals direct grouping") {
    val df = Seq((1L, "a"), (1L, "b"), (1L, "c"), (2L, "d")).toDF("k", "v")
    val direct = df.groupBy("k").agg(sort_array(collect_list("v")).as("vs"))
    val salted = Skew.saltedAgg(df, "k", n = 4,
      partial = Seq(collect_list(col("v")).as("vs_part")),
      finalAgg = Seq(sort_array(flatten(collect_list(col("vs_part")))).as("vs")))
    assert(direct.exceptAll(salted).isEmpty && salted.exceptAll(direct).isEmpty)
  }

  test("salt is deterministic across evaluations (retry-safe)") {
    val li = Tables.lineitem(spark, sf())
    val a = Skew.saltedJoin(li,
      Tables.supplier(spark, sf()).select(col("s_suppkey").as("l_suppkey"), col("s_name")),
      "l_suppkey", 8).count()
    val b = Skew.saltedJoin(li,
      Tables.supplier(spark, sf()).select(col("s_suppkey").as("l_suppkey"), col("s_name")),
      "l_suppkey", 8).count()
    assert(a == b && a == li.count()) // inner join keeps every lineitem row
  }
}
