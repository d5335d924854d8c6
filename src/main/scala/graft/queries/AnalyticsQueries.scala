package graft.queries

import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Relational analytics over the harness tables — the aggregate / join /
  * window / set-op operator classes of SURVEY.md §2.5/2.6/2.8 at TPC-H
  * shape, sized for the 100 TB design point (partial aggregation,
  * broadcastable dimensions, single-pass windows).
  *
  * Float policy: every double aggregate is rounded to 2 decimals in BOTH
  * engines; source money columns carry 2–4 decimal digits so sums sit
  * far from rounding boundaries regardless of accumulation order.
  */
object AnalyticsQueries {

  val all: Seq[Q] = Seq(

    Q("q1_pricing_summary",
      (s, dir) => Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(avg(col("l_quantity")), 2).as("avg_qty"),
          round(avg(col("l_extendedprice")), 2).as("avg_price"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus")),
      Some("""SELECT l_returnflag, l_linestatus,
             |       round(sum(l_quantity), 2) AS sum_qty,
             |       round(sum(l_extendedprice), 2) AS sum_base_price,
             |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
             |       round(avg(l_quantity), 2) AS avg_qty,
             |       round(avg(l_extendedprice), 2) AS avg_price,
             |       count(*) AS count_order
             |FROM lineitem
             |GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin),
      doc = "A1: hash aggregate with partial+final (TPC-H Q1 shape)")
  )
}
