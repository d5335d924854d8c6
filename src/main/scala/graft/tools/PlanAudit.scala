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
    // --final: execute the query first so the AQE final plan (with
    // codegen ids) prints instead of the isFinalPlan=false skeleton —
    // WholeStageCodegen presence is only decidable post-execution
    val (flags, qnames) = args.toSeq.partition(_.startsWith("--"))
    val runFirst = flags.contains("--final")
    val names = if (qnames.nonEmpty) qnames
      else Seq("poi_classify_basic", "q5_local_supplier", "dedup_jaccard_pairs")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      if (runFirst) {
        df.write.format("noop").mode("overwrite").save()
        // executedPlan.toString shows the final adaptive plan with
        // `*(n)` WholeStageCodegen markers; formatted explain of an
        // AQE plan re-prints the isFinalPlan=false skeleton
        println(df.queryExecution.executedPlan.toString)
      } else
        println(df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
