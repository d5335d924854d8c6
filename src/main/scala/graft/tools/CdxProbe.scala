package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Probe for the persisted-CDX-index fetch path (r14 verdict task 6):
  * builds a WARC archive of `copies` × documents, persists the index
  * ONCE, then times point lookups (URI equality — the form that
  * pushes into the parquet scan and prunes range-partitioned row
  * groups) at growing hit counts. The claims under test: fetch cost
  * ∝ HITS with a persisted index, and the per-query CDX text reparse
  * is the corpus-proportional term the persisted table removes.
  * `runMain graft.tools.CdxProbe <sfDir> <copies> [reps]`.
  */
object CdxProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: CdxProbe <sfDir> <copies> [reps]")
    val (sfDir, copies) = (args(0), args(1).toInt)
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.sources.warc.WarcRandomAccess
    def t[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime(); val a = f
      ((System.nanoTime() - t0) / 1e9, a)
    }
    val warcDir = java.nio.file.Files
      .createTempDirectory("graft-cdxprobe-").toString
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
    val nBase = docs.count()
    val corpus = docs
      .crossJoin(spark.range(copies).select(col("id").as("__c")))
      .select((col("doc_id") + col("__c") * 10000000L).as("doc_id"),
        col("text"))
    val (wWrite, _) = t {
      corpus.select(
          concat(lit("<urn:g:"), col("doc_id"), lit(">")).as("record_id"),
          lit("resource").as("record_type"),
          concat(lit("http://c.local/doc/"), col("doc_id")).as("target_uri"),
          lit("2026-01-01T00:00:00Z").as("warc_date"),
          lit("text/plain").as("content_type"),
          encode(col("text"), "UTF-8").as("payload"))
        .repartition(32)
        .write.format("warc").option("compression", "gzip")
        .option("index", "true").mode("append").save(warcDir)
    }
    println(f"[cdxprobe] corpus=${nBase * copies}%d records, " +
      f"write=${wWrite}%.2f s")
    val (wPersist, _) =
      t(WarcRandomAccess.persistIndex(spark, warcDir, partitions = 32))
    println(f"[cdxprobe] persistIndex (once, write-time cost): $wPersist%.2f s")
    def uris(k: Int): Seq[String] = (0 until k).map { j =>
      val id = (j % nBase) + (j / nBase) * 10000000L
      s"http://c.local/doc/$id"
    }
    for (k <- Seq(10, 100, 1000, 10000); r <- 1 to reps) {
      val u = uris(k)
      val (tp, hp) = t(WarcRandomAccess.fetch(
        WarcRandomAccess.readPersistedIndex(spark, warcDir)
          .filter(col("target_uri").isin(u: _*))).count())
      val (tt, ht) = t(WarcRandomAccess.fetch(
        WarcRandomAccess.readIndex(spark, warcDir)
          .filter(col("target_uri").isin(u: _*))).count())
      assert(hp == ht && hp == k, s"hits: persisted=$hp text=$ht want=$k")
      println(f"[cdxprobe] hits=$k%-6d rep=$r " +
        f"persisted=${tp}%6.2f s  text-reparse=${tt}%6.2f s")
    }
    spark.stop()
  }
}
