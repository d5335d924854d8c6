package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints formatted physical plans for representative queries — the
  * scale audit loop (pushdown, broadcast, codegen spans, shuffle count).
  * Usage: sbt "runMain graft.tools.PlanAudit [queryName ...]"
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("poi_classify_basic", "q5_local_supplier", "dedup_jaccard_pairs")
    val sfDir = "/root/testdata/sf0.001"
    names.foreach { n =>
      println(s"\n========== $n ==========")
      println(graft.SparkEntry.queries(n)(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
