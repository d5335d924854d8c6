package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.catalyst.plans.physical.RangePartitioning

/** Catalog audit for the r19 sort-resampling discovery: a global sort's
  * RangePartitioning exchange SAMPLES its child before shuffling it, so
  * everything between that exchange and the next exchange below (or the
  * scan) executes TWICE. Cheap when that segment is a bare columnar
  * scan; expensive when per-row kernels (media decode, geodesic
  * quadrature, html extraction) live in it. Prints, per catalog query,
  * the operator names in each resampled segment so the expensive ones
  * can be measured and fixed (repartition-before-sort materializes the
  * segment once).
  */
object SortAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      // AQE wraps everything in AdaptiveSparkPlanExec (leaf to collect);
      // plan SHAPE around the range exchange is what we audit, and that
      // is AQE-independent
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // the doubled segment: nodes strictly below a range exchange, down
    // to (exclusive) the next exchange / reused-stage boundary
    def segment(p: SparkPlan): Seq[String] = p match {
      case _: ShuffleExchangeExec => Seq.empty
      case _: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec =>
        Seq.empty
      case other =>
        other.nodeName +: other.children.flatMap(segment)
    }
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sfDir).queryExecution.executedPlan
        val segs = plan.collect {
          case ex @ ShuffleExchangeExec(_: RangePartitioning, child, _, _) =>
            segment(child)
        }
        segs.filter(_.nonEmpty).foreach { ops =>
          println(s"[sortaudit] $name :: ${ops.mkString(" <- ")}")
        }
      } catch {
        case e: Throwable =>
          println(s"[sortaudit] $name PLAN-ERROR ${e.getClass.getSimpleName}")
      }
    }
    spark.stop()
  }
}
