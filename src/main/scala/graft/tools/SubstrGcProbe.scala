package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Allocation/GC profile for the ExactSubstr family (r16 verdict task
  * 5): `text_exact_substr_clean`'s 84–222 s sf10 band is the catalog's
  * largest non-deterministic cost, triple-pointed in r15 to machine
  * variance amplified by heap/GC sensitivity. This probe pins WHERE
  * the sensitivity lives: it times the operator as-is against two
  * persist placements, reporting per-rep GC count/time deltas
  * (GarbageCollectorMXBeans) alongside wall clock —
  *
  *   - `asis`: [[graft.operators.Dedup.exactSubstrClean]] unchanged.
  *     Note its plan evaluates the GramHashes posexplode lineage
  *     TWICE (the df-count branch and the position-join probe branch
  *     read the same grams relation with no common exchange to
  *     reuse);
  *   - `spanpersist`: the SPANS relation (small — one row per doc
  *     with >= 1 duplicated window) persisted + materialized before
  *     the stitch join, cutting the grams lineage re-evaluation out
  *     of the final join's plan;
  *   - `gramspersist`: the GRAMS relation (O(corpus positions) —
  *     deliberately cache-heavy, NOT a scale default) persisted, so
  *     GramHashes runs once; prices what the double evaluation costs.
  *
  * Value-equality (count + checksum over clean text) is asserted
  * across variants. Pair with
  * `SPARK_GRAFT_JVM_EXTRA="-Xlog:gc*:file=/tmp/gc_substr.log:uptime"`
  * for region-level humongous evidence. usage:
  * `SubstrGcProbe <sfDir> [reps]`.
  */
object SubstrGcProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: SubstrGcProbe <sfDir> [reps]")
    val dir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Dedup
    import scala.jdk.CollectionConverters._

    val docs = graft.sources.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
    println(s"[substrgc] corpus=${docs.count()} docs  heap=" +
      s"${Runtime.getRuntime.maxMemory() / (1 << 20)} MB")

    def gc(): (Long, Long) = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.asScala
      .foldLeft((0L, 0L))((a, b) =>
        (a._1 + b.getCollectionCount, a._2 + b.getCollectionTime))

    // the clean stitch, parameterized by where the spans come from —
    // expression copied verbatim from Dedup.exactSubstrClean so the
    // variants differ ONLY in persistence
    def stitch(spansRaw: DataFrame): DataFrame = {
      val spans = spansRaw.groupBy(col("doc_id"))
        .agg(sort_array(collect_list(struct(col("span_start").as("s"),
          col("span_end").as("e")))).as("__spans"))
      docs.join(spans, Seq("doc_id"), "left")
        .withColumn("clean_text",
          when(col("__spans").isNull, col("text")).otherwise(
            expr("""concat(
              aggregate(__spans,
                struct(1 as cur, '' as acc),
                (a, sp) -> struct(sp.e as cur,
                  concat(a.acc, substr(text, a.cur, sp.s - a.cur))),
                a -> a.acc),
              substr(text, element_at(__spans, -1).e))""")))
        .select(col("doc_id"), col("clean_text"))
    }

    // grams-persisted spans: exactSubstrSpans with the position
    // relation cached so GramHashes evaluates once
    def spansGramsPersisted(): (DataFrame, DataFrame) = {
      import org.apache.spark.sql.expressions.Window
      import graft.functions.Sketches
      val k = 30
      val grams = docs.select(col("doc_id"),
          posexplode(Sketches.gramHashes(col("text"), k))
            .as(Seq("__p0", "__h")))
        .select(col("doc_id"), (col("__p0") + 1).as("pos"), col("__h"))
        .persist()
      val dup = grams.groupBy(col("__h"))
        .agg(count(lit(1)).as("__df")).filter(col("__df") >= 2)
        .select(col("__h"))
      val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      val prevEnd = max(col("pos") + lit(k))
        .over(w.rowsBetween(Window.unboundedPreceding, -1))
      val sp = grams.join(dup, "__h")
        .withColumn("__brk", when(col("pos") > prevEnd, 1).otherwise(0))
        .withColumn("__island", sum(col("__brk")).over(w))
        .groupBy(col("doc_id"), col("__island"))
        .agg(min(col("pos")).as("span_start"),
          (max(col("pos")) + lit(30)).as("span_end"))
        .drop("__island")
      (sp, grams)
    }

    def run(name: String, build: () => (DataFrame, Seq[DataFrame])): Unit =
      (1 to reps).foreach { rep =>
        val (c0, t0) = gc()
        val w0 = System.nanoTime()
        val (out, cached) = build()
        val r = out.agg(count(lit(1)),
          sum(pmod(xxhash64(col("doc_id"), col("clean_text")),
            lit(1000000007L)))).head
        val wall = (System.nanoTime() - w0) / 1e9
        val (c1, t1) = gc()
        println(f"[substrgc] $name%-14s rep=$rep rows=${r.getLong(0)} " +
          f"sig=${r.getLong(1)}%012x wall=$wall%7.2f s " +
          f"gcN=${c1 - c0}%-5d gcT=${(t1 - t0) / 1e3}%6.2f s " +
          f"gcFrac=${(t1 - t0) / 1e3 / wall * 100}%5.1f%%")
        cached.foreach(_.unpersist(blocking = true))
        spark.catalog.clearCache()
      }

    // nomat = the pre-r16 single-plan form (spans subtree live inside
    // the stitch join) — the 72-146 s band; ckpt_default = the forced
    // localCheckpoint form (the r17 size gate picks it at this scale
    // anyway; forcing keeps the probe deterministic about what it times)
    run("nomat", () =>
      (Dedup.exactSubstrClean(docs, "doc_id", "text", k = 30,
        textOut = "clean_text", materializeSpans = Some(false)), Nil))
    run("ckpt_default", () =>
      (Dedup.exactSubstrClean(docs, "doc_id", "text", k = 30,
        textOut = "clean_text", materializeSpans = Some(true)), Nil))
    run("spanpersist", () => {
      val sp = Dedup.exactSubstrSpans(docs, "doc_id", "text", k = 30)
        .persist()
      sp.count()
      (stitch(sp), Seq(sp))
    })
    run("gramspersist", () => {
      val (sp, grams) = spansGramsPersisted()
      (stitch(sp), Seq(grams))
    })
    spark.stop()
  }
}
