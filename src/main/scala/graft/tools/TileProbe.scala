package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.sources.Tables

/** One-off: is dedup_embedding's sf10g wall 2x the join stage because
  * the trailing orderBy's range-sampling re-executes the cross join?
  * Times the raw operator (no sort) vs the catalog form (sort).
  */
object TileProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[tileprobe] $tag ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val raw = Dedup.embeddingNearDupPairs(Tables.embeddings(spark, sfDir),
      "vec_id", "embedding", threshold = 0.45)
    time("nosort")(raw.write.format("noop").mode("overwrite").save())
    time("sorted")(raw.orderBy(col("id_a"), col("id_b"))
      .write.format("noop").mode("overwrite").save())
    time("shuffled-then-sorted")(raw.repartition(col("id_a"))
      .orderBy(col("id_a"), col("id_b"))
      .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
