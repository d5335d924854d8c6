package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener

/** Head-to-head timer for the skew-safe operator variants on a
  * [[SkewGen]] corpus — the adversarial counterpart of [[ScaleProbe]].
  * Each family times the PLAIN form against its salted/capped scale
  * path on identical input and cross-checks that both produce the same
  * result (count + order-independent xxhash64 checksum), so the
  * skew-safety claims in the scaladocs carry measured numbers.
  *
  * usage: SkewProbe <sfDir> <family> [reps]
  *   jaccard     grouped+df-cap vs prefix-filter (exact); prints the
  *               observe("jaccard_skew_cap") pruned-postings metric
  *   jaccard_uncapped  grouped WITHOUT the cap — only run at small sf
  *               (hot postings fan out quadratically by design)
  *   asof        keyed-window asof vs time-bucket-salted asof
  *   stratified  stratifiedByHash vs stratifiedByHashSalted
  *   pack        packLayout vs packLayoutSalted
  *   cc          min-label vs star contraction on the near-dup CHAIN
  *               (edges from minhashLshPairs over the src_chain docs)
  */
object SkewProbe {
  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  /** count + order-independent content checksum of selected columns
    * (mod-reduced so an ANSI sum over full-range xxhash64 longs can't
    * overflow: 2^63 / 1e9 ≈ 9.2e9 rows of headroom)
    */
  private def sig(df: DataFrame, cols: Seq[String]): (Long, Long) = {
    val r = df.agg(count(lit(1)),
      sum(pmod(xxhash64(cols.map(col): _*), lit(1000000007L)))).head
    (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: SkewProbe <sfDir> <family> [reps]")
    val (dir, family) = (args(0), args(1))
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Track the slowest task per timed block: at local[32] a dominant
    // key's serialized window sort hides behind the other 31 cores
    // (wall-clock ≈ total work / 32), but on a real cluster wall-clock
    // ≈ MAX task duration — this is the number the salted variants
    // exist to shrink. The listener bus is async; a short drain sleep
    // before reading keeps the max honest for multi-second tasks.
    val maxTaskMs = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val d = te.taskInfo.duration
          maxTaskMs.getAndUpdate(m => math.max(m, d))
        }
      })
    def maxTask(): Double = {
      Thread.sleep(500)
      maxTaskMs.getAndSet(0L) / 1e3
    }

    // surface the df-cap's observe() metric (string-named metrics only
    // arrive via the listener bus, which is async — poll after the job)
    val pruned = new java.util.concurrent.atomic.AtomicLong(-1L)
    spark.listenerManager.register(new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
          durationNs: Long): Unit =
        qe.observedMetrics.get("jaccard_skew_cap")
          .foreach(r => pruned.set(r.getLong(0)))
      override def onFailure(funcName: String, qe: QueryExecution,
          exception: Exception): Unit = ()
    })
    def prunedMetric(): Long = {
      var waited = 0
      while (pruned.get() < 0 && waited < 50) { Thread.sleep(100); waited += 1 }
      pruned.getAndSet(-1L)
    }

    val docs = graft.sources.Tables.documents(spark, dir)
    def report(name: String, rep: Int, s: Double, n: Long, h: Long,
        extra: String = ""): Unit =
      println(f"[skew] $family%-10s $name%-12s rep=$rep rows=$n sig=$h%016x " +
        f"${s}%.2f s maxtask=${maxTask()}%.2f s$extra")

    (1 to reps).foreach { rep =>
      family match {
        case "jaccard" =>
          val ((nG, hG), tG) = time(sig(
            graft.operators.Dedup.jaccardPairsGrouped(
              docs, "doc_id", "text", k = 3, threshold = 0.8,
              maxShingleDf = 64),
            Seq("id_a", "id_b")))
          report("grouped_cap", rep, tG, nG, hG,
            s" pruned_postings=${prunedMetric()}")
          val ((nP, hP), tP) = time(sig(
            graft.operators.Dedup.jaccardPairsPrefix(
              docs, "doc_id", "text", k = 3, threshold = 0.8),
            Seq("id_a", "id_b")))
          report("prefix", rep, tP, nP, hP,
            if (nP == nG && hP == hG) " MATCH" else " **MISMATCH**")
        case "jaccard_diff" =>
          // characterize WHICH true pairs the df cap loses: pairs found
          // by the exact prefix filter but not by grouped+cap, bucketed
          // by whether both docs carry the hot stop-word prefix (whose
          // pruned postings no longer count toward the intersection)
          val g = graft.operators.Dedup.jaccardPairsGrouped(
            docs, "doc_id", "text", k = 3, threshold = 0.8,
            maxShingleDf = 64).select(col("id_a"), col("id_b"))
          val p = graft.operators.Dedup.jaccardPairsPrefix(
            docs, "doc_id", "text", k = 3, threshold = 0.8)
          val hot = docs.select(col("doc_id"),
            col("text").startsWith(SkewGen.hotPrefix).as("is_hot"))
          val missed = p.select(col("id_a"), col("id_b"), col("jaccard"))
            .join(g.withColumn("__in_g", lit(1)), Seq("id_a", "id_b"), "left")
            .filter(col("__in_g").isNull)
            .join(hot.select(col("doc_id").as("id_a"), col("is_hot").as("ha")), "id_a")
            .join(hot.select(col("doc_id").as("id_b"), col("is_hot").as("hb")), "id_b")
          val r = missed.agg(count(lit(1)),
            sum(when(col("ha") && col("hb"), 1L).otherwise(0L)),
            min(col("jaccard")), max(col("jaccard"))).head
          println(s"[skew] jaccard_diff missed=${r.getLong(0)} " +
            s"both_hot=${r.getLong(1)} jaccard_range=[${r.get(2)}, ${r.get(3)}]")
        case "jaccard_uncapped" =>
          val ((n, h), t) = time(sig(
            graft.operators.Dedup.jaccardPairsGrouped(
              docs, "doc_id", "text", k = 3, threshold = 0.8,
              maxShingleDf = 0),
            Seq("id_a", "id_b")))
          report("grouped_raw", rep, t, n, h)
        case "asof" =>
          val ev = graft.sources.Tables.events(spark, dir)
            .withColumn("t", unix_micros(col("ts")))
          val probe = ev.filter(col("event_type") === "click")
            .select(col("event_id"), col("user_id"), col("t"))
          val build = ev.filter(col("event_type") === "purchase")
            .groupBy(col("user_id"), col("t").as("pt"))
            .agg(round(max(col("value")), 2).as("purchase_value"))
          val cols = Seq("event_id", "purchase_value", "purchase_t")
          val ((nA, hA), tA) = time(sig(graft.operators.AsofJoin.asof(
            probe, build, "user_id", "t", "pt", Seq("purchase_value"),
            buildTimeAs = Some("purchase_t")), cols))
          report("plain", rep, tA, nA, hA)
          val ((nS, hS), tS) = time(sig(graft.operators.AsofJoin.asofSalted(
            probe, build, "user_id", "t", "pt", Seq("purchase_value"),
            bucketWidth = 3600L * 1000 * 1000,
            buildTimeAs = Some("purchase_t")), cols))
          report("salted", rep, tS, nS, hS,
            if (nS == nA && hS == hA) " MATCH" else " **MISMATCH**")
        case "stratified" =>
          val cols = Seq("doc_id", "rk")
          val ((nA, hA), tA) = time(sig(graft.operators.Sampling
            .stratifiedByHash(docs, "lang", "doc_id", n = 20), cols))
          report("plain", rep, tA, nA, hA)
          val ((nS, hS), tS) = time(sig(graft.operators.Sampling
            .stratifiedByHashSalted(docs, "lang", "doc_id", n = 20,
              salts = 8), cols))
          report("salted", rep, tS, nS, hS,
            if (nS == nA && hS == hA) " MATCH" else " **MISMATCH**")
        case "pack" =>
          val cols = Seq("doc_id", "pack_id", "pack_offset")
          val ((nA, hA), tA) = time(sig(graft.operators.Sampling
            .packLayout(docs, "lang", "doc_id", "n_chars", cap = 65536),
            cols))
          report("plain", rep, tA, nA, hA)
          val ((nS, hS), tS) = time(sig(graft.operators.Sampling
            .packLayoutSalted(docs, "lang", "doc_id", "n_chars",
              cap = 65536, buckets = 32), cols))
          report("salted", rep, tS, nS, hS,
            if (nS == nA && hS == hA) " MATCH" else " **MISMATCH**")
        case "cc" =>
          // the SkewGen chain: one simple path, diameter = chainLen —
          // edges derived end-to-end (LSH over the chain docs)
          val chainDocs = docs.filter(col("source") === "src_chain")
          val edges = graft.operators.Dedup.minhashLshPairs(
              chainDocs, "doc_id", "text", k = 3, threshold = 0.8)
            .select(col("id_a"), col("id_b"))
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          val nE = edges.count()
          val ((nM, hM), tM) = time(sig(graft.operators.Dedup
            .connectedComponents(edges, "id_a", "id_b"),
            Seq("id", "component")))
          report("minlabel", rep, tM, nM, hM, s" edges=$nE")
          val ((nS, hS), tS) = time(sig(graft.operators.Dedup
            .connectedComponentsStar(edges, "id_a", "id_b"),
            Seq("id", "component")))
          report("star", rep, tS, nS, hS,
            if (nS == nM && hS == hM) " MATCH" else " **MISMATCH**")
          edges.unpersist()
        case other =>
          sys.error(s"unknown family: $other")
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
