package graft.sinks

import java.nio.file.Files

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Partitioned-write layout: at 100 TB a corpus is laid out
  * `partitionBy(source, lang)` so per-source/per-language jobs read
  * only their directories. Pins that (a) the layout round-trips, and
  * (b) a partition-column filter becomes a PartitionFilter — pruned at
  * PLANNING time, before any file is opened — not a post-scan filter.
  */
class PartitionLayoutSpec extends SparkSpec {
  import spark.implicits._

  test("partitionBy layout prunes at planning time") {
    val out = Files.createTempDirectory("layout").toString + "/docs"
    Tables.documents(spark, sf()).write
      .partitionBy("lang", "source")
      .parquet(out)

    val back = spark.read.parquet(out)
    val en = back.filter($"lang" === "en" && $"source" === "src0")
    val expected = Tables.documents(spark, sf())
      .filter($"lang" === "en" && $"source" === "src0").count()
    assert(en.count() == expected && expected > 0)

    val plan = en.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      (plan.contains("isnotnull(lang") || plan.contains("lang#")),
      s"expected partition filters in scan:\n$plan")
    // the data filter must NOT appear as a post-scan Filter on the
    // partition columns — pruning happened in the scan node
    val pushedAsPartition = "PartitionFilters: \\[[^\\]]*lang".r
      .findFirstIn(plan).isDefined
    assert(pushedAsPartition, s"lang not in PartitionFilters:\n$plan")

    // pruning is physical: only the matching leaf directory is read
    val files = en.select(input_file_name()).distinct().as[String].collect()
    assert(files.nonEmpty &&
      files.forall(f => f.contains("lang=en") && f.contains("source=src0")),
      files.mkString("\n"))
  }
}
