package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Compaction-policy probe for the streamed CDX index
  * ([[graft.sources.warc.WarcRandomAccess.persistIndexStream]]):
  * appended micro-batches leave the parquet index as many small
  * UNSORTED files — every point lookup must open all of them and can
  * prune nothing (each file's min/max URI range spans the whole key
  * space), where the compacted form ([[graft.sources.warc
  * .WarcRandomAccess.persistIndex]] — range-partitioned, sorted)
  * opens ~one. This probe measures lookup latency against fragment
  * count so the re-compaction threshold is a decision rule, not a
  * guess. `runMain graft.tools.CdxCompactProbe <sfDir> <copies>`.
  */
object CdxCompactProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: CdxCompactProbe <sfDir> <copies>")
    val (sfDir, copies) = (args(0), args(1).toInt)
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
      .createTempDirectory("graft-cdxcompact-").toString
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
    val nBase = docs.count()
    docs.crossJoin(spark.range(copies).select(col("id").as("__c")))
      .select((col("doc_id") + col("__c") * 10000000L).as("doc_id"),
        col("text"))
      .select(
        concat(lit("<urn:g:"), col("doc_id"), lit(">")).as("record_id"),
        lit("resource").as("record_type"),
        concat(lit("http://c.local/doc/"), col("doc_id")).as("target_uri"),
        lit("2026-01-01T00:00:00Z").as("warc_date"),
        lit("text/plain").as("content_type"),
        encode(col("text"), "UTF-8").as("payload"))
      .repartition(32)
      .write.format("warc").option("compression", "gzip")
      .option("index", "true").mode("append").save(warcDir)
    val n = nBase * copies
    println(s"[cdxcompact] archive=$n records")
    // compacted form: range-partitioned + sorted (persistIndex)
    WarcRandomAccess.persistIndex(spark, warcDir, partitions = 32)
    // fragmented forms: what persistIndexStream leaves after F drops —
    // F unsorted appends, each spanning the whole URI space
    val idx = WarcRandomAccess.readPersistedIndex(spark, warcDir)
      .persist()
    idx.count()
    def uris(k: Int): Seq[String] = (0 until k).map { j =>
      val id = (j % nBase) + (j / nBase) * 10000000L
      s"http://c.local/doc/$id"
    }
    for (frags <- Seq(8, 64, 256)) {
      val fragDir = s"$warcDir/_cdxindex_frag$frags"
      idx.withColumn("__f", pmod(xxhash64(col("target_uri")), lit(frags.toLong)))
        .repartition(frags, col("__f")).drop("__f")
        .write.mode("overwrite").parquet(fragDir)
      for (k <- Seq(10, 1000); r <- 1 to 2) {
        val u = uris(k)
        val (tc, hc) = t(WarcRandomAccess.fetch(
          WarcRandomAccess.readPersistedIndex(spark, warcDir)
            .filter(col("target_uri").isin(u: _*))).count())
        val (tf, hf) = t(WarcRandomAccess.fetch(
          spark.read.parquet(fragDir)
            .filter(col("target_uri").isin(u: _*))).count())
        assert(hc == hf && hc == k, s"hits: compact=$hc frag=$hf want=$k")
        println(f"[cdxcompact] frags=$frags%-4d hits=$k%-5d rep=$r " +
          f"compacted=${tc}%6.2f s  fragmented=${tf}%6.2f s")
      }
    }
    spark.stop()
  }
}
