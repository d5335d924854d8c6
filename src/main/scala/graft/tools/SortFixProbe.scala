package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, RepartitionByExpression, Sort}
import org.apache.spark.sql.graft.Bridge

/** A/B for the r19 sort-resampling finding, per catalog query: the
  * as-written form (global orderBy directly over the query body — the
  * RangePartitioning sampler re-executes everything down to the
  * nearest exchange) vs the same query with a hash repartition on the
  * sort keys injected below the Sort (the body materializes once; the
  * sampler reads shuffle files). Prints both timings; apply the fix in
  * the query source only where the win is real — for a cheap-scan tail
  * the extra shuffle LOSES.
  *
  * usage: SortFixProbe <sfDir> <query> [query ...]   (env: SPARK_GRAFT_CPUS, SPARK_GRAFT_REPS)
  */
object SortFixProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(tag: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[sortfix] $tag ${ts.map(t => f"$t%.2f").mkString(" ")}s")
    }
    args.drop(1).foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      df.queryExecution.logical match {
        case s @ Sort(order, true, child, _) =>
          val fixed = Bridge.ofRows(spark, s.copy(child =
            RepartitionByExpression(order.map(_.child), child, None)))
          time(s"$name asis ", df)
          time(s"$name fixed", fixed)
        case _ =>
          println(s"[sortfix] $name: no global Sort at the root, skipped")
      }
    }
    spark.stop()
  }
}
