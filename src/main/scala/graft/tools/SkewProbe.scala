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
  *   ccab        star contraction LAZY vs EAGER per-round checkpoint on
  *               the chain edges — the round-10 witness-fold A/B
  *   linededup   C4 span removal on the 7-word-lined corpus — SkewGen's
  *               hot prefix makes line #1 of ~half the docs identical,
  *               so the span-hash groupBy/join carries a df≈N/2 key
  *   semantic    semanticDedup on the embeddings as-is vs with ~25% of
  *               vectors overwritten by ONE shared vector (the "default
  *               embedding" mass a real corpus carries) — the
  *               identical-vector clique is the quadratic hazard
  *   split       splitByGroup over the full corpus with the chain docs'
  *               LSH pairs as the leakage graph; prints the group-size
  *               distribution a user should expect
  *   exactsubstr ExactSubstr spans + clean at k=30 on the skewed
  *               corpus — the hot prefix's 6 fully-interior windows
  *               each carry df ≈ N/2, so the positions⋈dup-hash join
  *               probes a Zipf head (the stats side stays one row per
  *               hash, the AQE-splittable shape linededup proved)
  *   knppl       add-alpha vs Kneser-Ney bigram LM perplexity on the
  *               scale corpus — prices KN's two extra stats relations
  *               and pins that the Zipf word head never makes a whale
  *               task (stats sides are one row per key)
  *   heavyhitters naive full-vocabulary groupBy vs the Misra-Gries
  *               two-pass on a corpus widened to ~3N distinct tokens
  *               (3 unique rare tokens appended per doc)
  *   window      per-user window analytics on the whale-user events
  *               (user 0 owns ~50%): plain sessionize + rolling-1h vs
  *               their time-bucketed two-phase forms
  *   pagerank    integer PageRank on uniform vs IN-whale vs OUT-whale
  *               host graphs (one hub owning half of all edge ends)
  *   fetchstats  hostFetchStats (hierarchical adjacent-gap min) vs the
  *               naive full-history window on uniform vs whale fetch
  *               logs (one host = 50% of fetches)
  *   robots      relational broadcast verdicts vs the plan-literal
  *               projection on a whale URL corpus (one host = 50% of
  *               URLs, 4 rules/host over 1000 hosts)
  *   hamming     fingerprintHammingPairs on uniform vs 25%-identical
  *               fingerprints (the failed-decode/black-frame mass a
  *               real image corpus carries) — as-is vs
  *               collapse-identical-first
  *   crawldiff   crawlDiff's partial-aggregated latest-wins vs the
  *               naive per-URL row_number window, on uniform vs
  *               re-fetch-storm crawls (one URL = 50% of old records)
  *   hostscores  the five-loop host-ranks composition: hostScores'
  *               materialize-edges-once vs five independent loops
  *               re-deriving the corpus edge expression, uniform vs
  *               hub-whale graphs
  *   robotswild  verdictsWildcard (column-pattern regexp_like — RLike
  *               recompiles per row) vs verdictsWildcardLit (patterns
  *               compiled once at plan build) on the whale URL corpus
  *               with wildcard rule sets — prices the ADVICE-noted
  *               recompile cost
  *   mirror      mirrorHosts uncapped vs maxKeyDf-capped vs capped
  *               mirrorHostsLsh on uniform vs parking-clique corpora
  *               (25% of hosts serve ONE shared key — a genuine C²/2
  *               mirror clique)
  *   bm25prune   bm25TopK full scan vs bm25TopKPruned (MaxScore) on a
  *               2M-doc corpus where every doc holds the stop word and
  *               1/1000 hold the rare term — prices the essential-term
  *               semi-join; value equality checked
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
    // shuffle width is its own knob: the geoscale family shuffles
    // ~1e9 exploded key rows, where partitions = cores means ~30M-row
    // sort tasks (the maxtask IS partition volume) — a real cluster
    // sizes partitions to ~128 MB, which this override simulates
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffle)
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
        case "ccab" =>
          // lazy (witness aggregate materializes the checkpoint, one
          // job/round) vs eager (checkpoint count job first, then the
          // witness) on identical chain edges — settles whether the
          // round-10 lazy fold costs or saves on a real loop
          val chainDocs = docs.filter(col("source") === "src_chain")
          val edges = graft.operators.Dedup.minhashLshPairs(
              chainDocs, "doc_id", "text", k = 3, threshold = 0.8)
            .select(col("id_a"), col("id_b"))
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          val nE = edges.count()
          val ((nL, hL), tL) = time(sig(graft.operators.Dedup
            .connectedComponentsStar(edges, "id_a", "id_b"),
            Seq("id", "component")))
          report("star_lazy", rep, tL, nL, hL, s" edges=$nE")
          val ((nEg, hEg), tEg) = time(sig(graft.operators.Dedup
            .connectedComponentsStar(edges, "id_a", "id_b",
              eagerCheckpoint = true),
            Seq("id", "component")))
          report("star_eager", rep, tEg, nEg, hEg,
            if (nEg == nL && hEg == hL) " MATCH" else " **MISMATCH**")
          edges.unpersist()
        case "linededup" =>
          // the text_line_dedup lining (7-word spans) over the skewed
          // corpus: SkewGen's 10-token hot prefix makes span #1 of every
          // hot doc IDENTICAL — the df≈N/2 span the group-by-span-hash
          // join must survive (boilerplate spans ARE the Zipf head)
          val ws = split(col("text"), " ")
          val lined = docs.select(col("doc_id"),
            array_join(transform(sequence(lit(1), size(ws), lit(7)),
              st => array_join(slice(ws, st, lit(7)), " ")), "\n").as("text"))
          if (rep == 1) {
            val r = lined
              .select(explode(split(col("text"), "\n")).as("span"))
              .groupBy(xxhash64(col("span"))).agg(count(lit(1)).as("c"))
              .agg(max(col("c")), count(lit(1))).head
            println(s"[skew] linededup hot_span_df=${r.getLong(0)} " +
              s"distinct_spans=${r.getLong(1)}")
          }
          val ((n, h), t) = time(sig(
            graft.operators.Dedup.lineDedup(lined, "doc_id", "text",
              sep = "\n"),
            Seq("doc_id", "text")))
          report("span_rm", rep, t, n, h)
        case "knppl" =>
          // LM training under a Zipf vocabulary at scale: both models
          // shuffle the full bigram stream once (partial-aggregated, so
          // the "the the"-head combines map-side); every scoring join's
          // stats side carries ONE row per key (bc/left/cont), the
          // AQE-splittable shape linededup/exactsubstr proved. KN adds
          // two more stats relations (continuation + left-context
          // types) derived from bc without rescanning the corpus — the
          // probe prices exactly that delta and pins that neither model
          // has a whale task (maxtask = partition volume, not key df)
          if (rep == 1) {
            val r = docs.select(explode(split(col("text"), " ")).as("w"))
              .groupBy(col("w")).agg(count(lit(1)).as("c"))
              .agg(max(col("c")), count(lit(1))).head
            println(s"[skew] knppl hot_word_df=${r.getLong(0)} " +
              s"vocab=${r.getLong(1)}")
          }
          val ((nA, hA), tA) = time(sig(
            graft.operators.TextAnalysis.perplexityScore(
              docs, "doc_id", "text"),
            Seq("doc_id", "n_bigrams", "perplexity")))
          report("addalpha", rep, tA, nA, hA)
          val ((nK, hK), tK) = time(sig(
            graft.operators.TextAnalysis.knPerplexityScore(
              docs, "doc_id", "text"),
            Seq("doc_id", "n_bigrams", "perplexity")))
          report("kneserney", rep, tK, nK, hK)
        case "exactsubstr_pre" =>
          // run on the UNSKEWED scale corpus: organic dup density only
          // (the planted near-dup pairs) — the regime the winnow
          // prefilter exists for. Compare sigs: equal when every
          // organic shared span is >= w+k-1 chars
          val k = 30
          if (rep == 1) {
            val cand = docs.select(col("doc_id"),
                explode(graft.functions.Sketches.winnowSet(col("text"), k, 16))
                  .as("fp"))
              .groupBy(col("fp")).agg(countDistinct(col("doc_id")).as("d"))
              .filter(col("d") >= 2)
            println(s"[skew] exactsubstr_pre hot_fps=${cand.count()} " +
              s"docs=${docs.count()}")
          }
          val ((n1, h1), t1) = time(sig(
            graft.operators.Dedup.exactSubstrSpans(docs, "doc_id", "text", k),
            Seq("doc_id", "span_start", "span_end")))
          report("full", rep, t1, n1, h1)
          val ((n2, h2), t2) = time(sig(
            graft.operators.Dedup.exactSubstrSpansPrefiltered(
              docs, "doc_id", "text", k, w = 16),
            Seq("doc_id", "span_start", "span_end")))
          report("prefiltered", rep, t2, n2, h2)
        case "exactsubstr" =>
          val k = 30
          if (rep == 1) {
            val r = docs.select(posexplode(
                graft.functions.Sketches.gramHashes(col("text"), k))
                .as(Seq("p", "h")))
              .groupBy(col("h")).agg(count(lit(1)).as("c"))
              .agg(max(col("c")), count(lit(1)),
                sum(when(col("c") >= 2, col("c")).otherwise(0L))).head
            println(s"[skew] exactsubstr hot_gram_df=${r.getLong(0)} " +
              s"distinct_grams=${r.getLong(1)} dup_positions=${r.getLong(2)}")
          }
          val ((n1, h1), t1) = time(sig(
            graft.operators.Dedup.exactSubstrSpans(docs, "doc_id", "text", k),
            Seq("doc_id", "span_start", "span_end")))
          report("spans", rep, t1, n1, h1)
          val ((n2, h2), t2) = time(sig(
            graft.operators.Dedup.exactSubstrClean(docs, "doc_id", "text", k),
            Seq("doc_id", "text")))
          report("clean", rep, t2, n2, h2)
        case "semantic" =>
          val emb = graft.sources.Tables.embeddings(spark, dir)
            .select(col("vec_id"), col("embedding"))
          val ((n0, h0), t0) = time(sig(
            graft.operators.Dedup.semanticDedup(emb, "vec_id", "embedding",
              threshold = 0.9, method = "lsh"),
            Seq("vec_id")))
          report("uniform", rep, t0, n0, h0)
          // identical-vector mass: ~25% of vectors become ONE shared
          // vector (a failed-decode default embedding, an empty-doc
          // vector — the head every production embedding table has).
          // They always share every LSH band, so the candidate set
          // carries a C²/2 clique unless the operator collapses it.
          val proto = emb.orderBy(col("vec_id")).limit(1)
            .select(col("embedding").as("__proto"))
          val skewed = emb.crossJoin(broadcast(proto))
            .select(col("vec_id"),
              when(pmod(hash(col("vec_id")), lit(4)) === 0, col("__proto"))
                .otherwise(col("embedding")).as("embedding"))
          val ((n1, h1), t1) = time(sig(
            graft.operators.Dedup.semanticDedup(skewed, "vec_id", "embedding",
              threshold = 0.9, method = "lsh"),
            Seq("vec_id")))
          report("ident25", rep, t1, n1, h1)
        case "ivfsweep" =>
          // the IVF recall/latency trade curve (ROADMAP r18 candidate
          // (d)): nprobe sweep against brute-force cosine truth over
          // the same ~100 queries. recall@10 = |ivf ∩ truth| / |truth|
          // on (query, neighbor) id pairs; nprobe = |centroids|
          // degenerates to exact (the spec invariant) so the curve's
          // right edge doubles as a correctness check in the probe.
          val emb = graft.sources.Tables.embeddings(spark, dir)
            .select(col("vec_id"), col("embedding"))
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          val n = emb.count()
          val qmod = math.max(1L, n / 100L)
          val kC = 64
          val (cents, tFit) = time {
            val c = graft.operators.Similarity.fitCentroidsKMeans(
                emb, "vec_id", "embedding", k = kC, iterations = 3)
              // ivfTopKProbed reads centroids under the corpus column
              // names (the spec convention)
              .select(col("cid").as("vec_id"), col("cv").as("embedding"))
            c.count(); c
          }
          val queries = emb.filter(pmod(col("vec_id"), lit(qmod)) === 0)
          val (truth, tBrute) = time {
            val t = graft.operators.Similarity.bruteForceTopK(
                emb, queries, "vec_id", "embedding", k = 10)
              .select(col("query_id"), col("neighbor_id"))
              .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
            t.count(); t
          }
          val nTruth = truth.count()
          println(f"[skew] ivfsweep n=$n queries=${n / qmod} " +
            f"fit=$tFit%.1f s brute=$tBrute%.1f s truth_pairs=$nTruth")
          Seq(1, 2, 4, 8, 16, kC).foreach { np =>
            val (got, t) = time {
              val g = graft.operators.Similarity.ivfTopKProbed(
                  emb, cents, pmod(col("__id"), lit(qmod)) === 0,
                  "vec_id", "embedding", k = 10, nprobe = np)
                .select(col("query_id"), col("neighbor_id"))
              (g.count(), g)
            }
            val hit = got._2.join(truth,
              Seq("query_id", "neighbor_id")).count()
            println(f"[skew] ivfsweep nprobe=$np%-3d rep$rep " +
              f"wall=$t%.2f s recall@10=${hit.toDouble / nTruth}%.4f " +
              f"rows=${got._1}")
          }
          truth.unpersist(); emb.unpersist()
        case "split" =>
          val chainDocs = docs.filter(col("source") === "src_chain")
          val pairs = graft.operators.Dedup.minhashLshPairs(
              chainDocs, "doc_id", "text", k = 3, threshold = 0.8)
            .select(col("id_a"), col("id_b"))
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          val nE = pairs.count()
          val out = graft.operators.Sampling.splitByGroup(docs, pairs,
            "doc_id", Seq("train" -> 0.8, "val" -> 0.1))
          val ((n, h), t) = time(sig(out, Seq("doc_id", "split")))
          report("star", rep, t, n, h, s" edges=$nE")
          if (rep == 1) {
            // the leakage-group shape a user should expect from a
            // chain-heavy near-dup graph: one group per component
            val g = out.groupBy(col("group_id")).agg(count(lit(1)).as("c"))
            val r = g.agg(count(lit(1)), max(col("c")),
              sum(when(col("c") > 1, 1L).otherwise(0L))).head
            val bySplit = out.groupBy(col("split")).count().collect()
              .map(x => s"${x.getString(0)}=${x.getLong(1)}").sorted
              .mkString(" ")
            println(s"[skew] split groups=${r.getLong(0)} " +
              s"max_group=${r.getLong(1)} multi_groups=${r.getLong(2)} " +
              s"rows_by_split: $bySplit")
          }
          pairs.unpersist()
        case "window" =>
          // the window-analytics whale: SkewGen routes ~50% of events
          // to user_id 0, so the plain per-user window partition sorts
          // half the table in ONE task. Head-to-head vs the bucketed
          // two-phase forms, value-checked by sig.
          val ev = graft.sources.Tables.events(spark, dir)
          def sessPlain = {
            import org.apache.spark.sql.expressions.Window
            val byUser = Window.partitionBy(col("user_id"))
              .orderBy(col("ts"), col("event_id"))
            val gapUs = unix_micros(col("ts")) -
              unix_micros(lag(col("ts"), 1).over(byUser))
            val newSession =
              when(gapUs.isNull || gapUs > 30L * 60 * 1000000, 1L).otherwise(0L)
            ev.withColumn("session_idx", sum(newSession)
                .over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
              .groupBy(col("user_id"), col("session_idx"))
              .agg(count(lit(1)).as("n_events"),
                (max(unix_micros(col("ts"))) -
                  min(unix_micros(col("ts")))).as("dur_us"))
          }
          val sessCols = Seq("user_id", "session_idx", "n_events", "dur_us")
          val ((nS, hS), tS) = time(sig(sessPlain, sessCols))
          report("sess_plain", rep, tS, nS, hS)
          val ((nB, hB), tB) = time(sig(graft.operators.Skew
            .sessionizeBucketed(ev, "user_id", "ts", "event_id",
              gapMinutes = 30, bucketMinutes = 120), sessCols))
          report("sess_bucket", rep, tB, nB, hB,
            if (nB == nS && hB == hS) " MATCH" else " **MISMATCH**")
          def rollPlain = {
            import org.apache.spark.sql.expressions.Window
            val w = Window.partitionBy(col("user_id"))
              .orderBy(unix_micros(col("ts")))
              .rangeBetween(-3600L * 1000 * 1000, 0)
            ev.select(col("event_id"), col("user_id"),
              count(lit(1)).over(w).as("n_1h"),
              round(sum(col("value")).over(w), 2).as("sum_1h"))
          }
          // sig on the ROUNDED sum: frame sets are identical, only
          // float accumulation order differs between the variants
          val rollCols = Seq("event_id", "user_id", "n_1h", "sum_1h")
          val ((nR, hR), tR) = time(sig(rollPlain, rollCols))
          report("roll_plain", rep, tR, nR, hR)
          val ((nRB, hRB), tRB) = time(sig(graft.operators.Skew
            .rollingBucketed(ev, "user_id", "ts", "event_id", "value",
              rangeUs = 3600L * 1000 * 1000)
            .select(col("event_id"), col("user_id"), col("n").as("n_1h"),
              round(col("s"), 2).as("sum_1h")), rollCols))
          report("roll_bucket", rep, tRB, nRB, hRB,
            if (nRB == nR && hRB == hR) " MATCH" else " **MISMATCH**")
        case "heavyhitters" =>
          // vocabulary-explosion probe: append 3 globally-unique rare
          // tokens per doc so distinct-token count ≈ 3N + base vocab —
          // the regime where a naive full-vocabulary groupBy shuffles
          // billions of near-singleton keys at 100 TB. Head-to-head vs
          // the Misra-Gries two-pass (bounded summaries, candidates
          // broadcast), value-checked by sig on (tok, cnt).
          val wide = docs.select(col("doc_id"), concat(col("text"),
            lit(" q"), (col("doc_id") * 3).cast("string"),
            lit(" q"), (col("doc_id") * 3 + 1).cast("string"),
            lit(" q"), (col("doc_id") * 3 + 2).cast("string")).as("text"))
          // theta = 1/4000: on the ScaleGen corpus the organic vocab
          // sits near-uniform at ~9k occurrences each, so this selects
          // the ~3k organic tokens and rejects the 1.5M rare ones
          def naive = {
            val toks = wide.select(explode(split(col("text"), " ")).as("tok"))
            toks.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
              .crossJoin(broadcast(toks.agg(count(lit(1)).as("n_total"))))
              .filter(col("cnt") * 4000L >= col("n_total"))
              .select(col("tok"), col("cnt"))
          }
          val hhCols = Seq("tok", "cnt")
          val ((nN, hN), tN) = time(sig(naive, hhCols))
          report("naive_group", rep, tN, nN, hN)
          val ((nM, hM), tM) = time(sig(
            graft.operators.TextAnalysis.heavyHitters(wide, "text",
              thetaNum = 1L, thetaDen = 4000L, capacity = 4096)
              .select(col("tok"), col("cnt")), hhCols))
          report("mg_two_pass", rep, tM, nM, hM,
            if (nM == nN && hM == hN) " MATCH" else " **MISMATCH**")
        case "pagerank" =>
          // link-graph skew probe: same ~2-edges-per-doc graph in three
          // shapes — uniform (100k hosts), IN-whale (half of all edges
          // point at ONE hub: the groupBy(dst) sum must partial-
          // aggregate it map-side), OUT-whale (half of all edges leave
          // one hub to distinct targets: the per-round rank-lookup
          // join on src sees a dominant key — the broadcast/AQE-skew
          // territory pageRankInt deliberately leaves AQE on for).
          // Shapes differ, so sigs are per-shape reproducibility pins,
          // not cross-checks; the scale claim is wall/maxtask parity.
          val ids = docs.select(col("doc_id").as("id"))
          def h(c: org.apache.spark.sql.Column) =
            concat(lit("h"), c.cast("string"))
          val second = ids.select(h(pmod(col("id"), lit(100000L))).as("src"),
            h(pmod(col("id") * 13 + 5, lit(100000L))).as("dst"))
          val shapes: Seq[(String, DataFrame)] = Seq(
            "uniform" -> ids.select(
                h(pmod(col("id"), lit(100000L))).as("src"),
                h(pmod(col("id") * 7 + 1, lit(100000L))).as("dst"))
              .unionByName(second),
            "in_whale" -> ids.select(
                h(pmod(col("id"), lit(100000L))).as("src"),
                when(col("id") % 2 === 0, lit("hub"))
                  .otherwise(h(pmod(col("id") * 7 + 1, lit(100000L)))).as("dst"))
              .unionByName(second),
            // a true OUT-whale needs many DISTINCT targets (distinct()
            // caps out-degree at |hosts| otherwise), which widens the
            // node set — so its control is uniform_wide: the SAME
            // ~500k-node graph without the hub
            "uniform_wide" -> ids.select(
                h(pmod(col("id"), lit(100000L))).as("src"),
                h(col("id")).as("dst"))
              .unionByName(second),
            "out_whale" -> ids.select(
                when(col("id") % 2 === 0, lit("hub"))
                  .otherwise(h(pmod(col("id"), lit(100000L)))).as("src"),
                h(col("id")).as("dst")) // distinct targets: edges survive distinct()
              .unionByName(second))
          shapes.foreach { case (name, e) =>
            val ((n, s), t) = time(sig(
              graft.operators.LinkGraph.pageRankInt(e, "src", "dst",
                iterations = 3),
              Seq("node", "rank")))
            report(name, rep, t, n, s)
          }
        case "fetchstats" =>
          // politeness accounting under a whale host: uniform spreads
          // fetches over 1000 hosts; whale routes HALF of them to one.
          // hostFetchStats is the hierarchical (host, minute)-bucketed
          // form; the control is the naive full-host-history window —
          // the shape whose maxtask is one sort of the whale's entire
          // fetch log. Values cross-checked by sig on the full stats row.
          import org.apache.spark.sql.expressions.Window
          val logs: Seq[(String, DataFrame)] = Seq(
            "uniform" -> docs.select(
              concat(lit("http://h"), pmod(col("doc_id"), lit(1000L)),
                lit(".cr/p/"), col("doc_id")).as("target_uri"),
              (col("doc_id") * 37 % 1000000L).as("__sec")),
            "whale" -> docs.select(
              concat(lit("http://"),
                when(col("doc_id") % 2 === 0, lit("whale"))
                  .otherwise(concat(lit("h"), pmod(col("doc_id"), lit(1000L)))),
                lit(".cr/p/"), col("doc_id")).as("target_uri"),
              (col("doc_id") * 37 % 1000000L).as("__sec")))
          logs.foreach { case (name, log0) =>
            val log = log0.select(col("target_uri"),
              date_format(expr("timestamp'2026-02-01 00:00:00' + " +
                "make_dt_interval(0, 0, 0, __sec)"),
                "yyyy-MM-dd'T'HH:mm:ss'Z'").as("warc_date"))
            val cols = Seq("host", "n_fetches", "min_gap_s", "max_per_minute")
            def naive = {
              val f = log.select(
                  lower(regexp_extract(col("target_uri"),
                    "(?i)^https?://([^/:]+)", 1)).as("host"),
                  unix_timestamp(to_timestamp(col("warc_date"))).as("t"))
                .filter(col("host") =!= "" && col("t").isNotNull)
              val byHost = Window.partitionBy(col("host")).orderBy(col("t"))
              f.withColumn("gap", col("t") - lag(col("t"), 1).over(byHost))
                .withColumn("b", expr("t div 60"))
                .withColumn("__mc", count(lit(1)).over(
                  Window.partitionBy(col("host"), col("b"))))
                .groupBy(col("host"))
                .agg(count(lit(1)).as("n_fetches"),
                  min(col("gap")).as("min_gap_s"),
                  max(col("__mc")).as("max_per_minute"))
            }
            val ((nN, hN), tN) = time(sig(naive, cols))
            report(s"${name}_naive", rep, tN, nN, hN)
            val ((nH, hH), tH) = time(sig(graft.operators.CrawlPipeline
              .hostFetchStats(log), cols))
            report(s"${name}_hier", rep, tH, nH, hH,
              if (nH == nN && hH == hN) " MATCH" else " **MISMATCH**")
          }
        case "robots" =>
          // verdict forms under a whale URL corpus: one host owns 50%
          // of URLs; 1000 hosts × 4 rules. The relational broadcast
          // form groups per URL (no whale KEY — the probe pins that)
          // vs the plan-literal pure projection.
          val hostCol = when(col("doc_id") % 2 === 0, lit("whale"))
            .otherwise(concat(lit("h"), pmod(col("doc_id"), lit(1000L))))
          val urls = docs.select(col("doc_id"),
            concat(lit("http://"), hostCol, lit(".rx"),
              element_at(array(lit("/private/ok/"), lit("/private/"),
                lit("/tmp/"), lit("/page/")),
                (pmod(col("doc_id"), lit(4)) + 1).cast("int")),
              col("doc_id")).as("url"))
          val rules = spark.range(1000)
            .select(concat(lit("h"), col("id")).as("hn"))
            .unionByName(spark.range(1).select(lit("whale").as("hn")))
            .select(concat(col("hn"), lit(".rx")).as("host"),
              explode(array(
                struct(lit("/private").as("prefix"), lit(false).as("allow")),
                struct(lit("/private/ok").as("prefix"), lit(true).as("allow")),
                struct(lit("/tmp").as("prefix"), lit(false).as("allow")),
                struct(lit("/x").as("prefix"), lit(false).as("allow"))))
                .as("r"))
            .select(col("host"), col("r.prefix").as("prefix"),
              col("r.allow").as("allow"))
          val vCols = Seq("doc_id", "allowed")
          val ((nR, hR), tR) = time(sig(graft.operators.Robots
            .verdicts(urls, "url", rules), vCols))
          report("relational", rep, tR, nR, hR)
          val ((nL, hL), tL) = time(sig(graft.operators.Robots
            .verdictsLit(urls, "url", rules), vCols))
          report("plan_lit", rep, tL, nL, hL,
            if (nL == nR && hL == hR) " MATCH" else " **MISMATCH**")
        case "robotswild" =>
          // same whale URL corpus as `robots`, wildcard-grade rules
          // (one '$'-anchored, one mid-'*', one plain prefix per host)
          val hostCol2 = when(col("doc_id") % 2 === 0, lit("whale"))
            .otherwise(concat(lit("h"), pmod(col("doc_id"), lit(1000L))))
          val urls = docs.select(col("doc_id"),
            concat(lit("http://"), hostCol2, lit(".wx"),
              element_at(array(lit("/files/ok"), lit("/files/no"),
                lit("/d/x"), lit("/page/")),
                (pmod(col("doc_id"), lit(4)) + 1).cast("int")),
              col("doc_id"),
              when(col("doc_id") % 3 === 0, lit(".pdf")).otherwise(lit("")))
              .as("url"))
          val rules = spark.range(1000)
            .select(concat(lit("h"), col("id")).as("hn"))
            .unionByName(spark.range(1).select(lit("whale").as("hn")))
            .select(concat(col("hn"), lit(".wx")).as("host"),
              explode(array(
                struct(lit("/*.pdf$").as("prefix"), lit(false).as("allow")),
                struct(lit("/files/ok*").as("prefix"), lit(true).as("allow")),
                struct(lit("/d").as("prefix"), lit(false).as("allow"))))
                .as("r"))
            .select(col("host"), col("r.prefix").as("prefix"),
              col("r.allow").as("allow"))
          val wCols = Seq("doc_id", "allowed")
          val ((nW, hW), tW) = time(sig(graft.operators.Robots
            .verdictsWildcard(urls, "url", rules), wCols))
          report("rel_wild", rep, tW, nW, hW)
          val ((nWL, hWL), tWL) = time(sig(graft.operators.Robots
            .verdictsWildcardLit(urls, "url", rules), wCols))
          report("lit_wild", rep, tWL, nWL, hWL,
            if (nWL == nW && hWL == hW) " MATCH" else " **MISMATCH**")
        case "hamming" =>
          // perceptual-hash banding under identical-fingerprint mass:
          // 25% of fingerprints become ONE value (failed decodes,
          // black frames) — every band of the clique collides, so the
          // banded join carries a C²/2 clique unless identical fps
          // collapse FIRST (exact-dup mass is not near-dup work).
          // Bounded to 20k ids: the clique is quadratic BY DESIGN.
          val n = 20000L
          val ids = spark.range(n)
          val shapes2: Seq[(String, DataFrame)] = Seq(
            "uniform" -> ids.select(col("id"), xxhash64(col("id")).as("fp")),
            "ident25" -> ids.select(col("id"),
              when(pmod(hash(col("id")), lit(4)) === 0, lit(0x5A5A5A5A5AL))
                .otherwise(xxhash64(col("id"))).as("fp")))
          shapes2.foreach { case (name, f0) =>
            val f = f0.persist()
            f.count()
            val ((nP, hP), tP) = time(sig(graft.operators.Dedup
              .fingerprintHammingPairs(f, "id", "fp", maxHamming = 3),
              Seq("id_a", "id_b")))
            report(s"${name}_asis", rep, tP, nP, hP)
            // collapse-first: one representative per distinct fp, band
            // only the representatives, then add the id→canonical
            // membership rows (clique edges to the canonical, not all
            // pairs — the CC downstream gets the same components)
            val ((nC, hC), tC) = time {
              val reps = f.groupBy(col("fp")).agg(min(col("id")).as("id"),
                count(lit(1)).as("__m"))
              val repPairs = graft.operators.Dedup.fingerprintHammingPairs(
                reps.select(col("id"), col("fp")), "id", "fp",
                maxHamming = 3)
                .select(col("id_a"), col("id_b"))
              val member = f.join(
                  reps.select(col("fp"), col("id").as("__canon")), Seq("fp"))
                .filter(col("id") =!= col("__canon"))
                .select(col("__canon").as("id_a"), col("id").as("id_b"))
              sig(repPairs.unionByName(member), Seq("id_a", "id_b"))
            }
            report(s"${name}_collapse", rep, tC, nC, hC)
            f.unpersist()
          }
        case "crawldiff" =>
          // cross-crawl diff under a re-fetch STORM: uniform gives
          // every URL one fetch per crawl; storm routes HALF of the
          // old crawl's records to ONE URL (a crawler stuck in a retry
          // loop — real crawl logs carry these). crawlDiff's
          // latest-wins is a partial-aggregated max(struct) — the
          // storm collapses map-side, no whale key ever shuffles. The
          // control is the naive window form (row_number over each
          // URL's fetch history, latest kept): one task sorts the
          // storm URL's entire history. Values cross-checked by sig
          // on (url, status).
          import org.apache.spark.sql.expressions.Window
          def urlOf(idCol: org.apache.spark.sql.Column) =
            concat(lit("http://h"), pmod(idCol, lit(1000L)), lit(".dx/p/"),
              idCol)
          val shapes3: Seq[(String, DataFrame)] = Seq(
            "uniform" -> docs.select(urlOf(col("doc_id")).as("target_uri"),
              col("doc_id")),
            "storm" -> docs.select(
              when(col("doc_id") % 2 === 0, lit("http://h0.dx/p/0"))
                .otherwise(urlOf(col("doc_id"))).as("target_uri"),
              col("doc_id")))
          shapes3.foreach { case (name, oldBase) =>
            val oldCrawl = oldBase.select(
                lit("response").as("record_type"), col("target_uri"),
                date_format(expr("timestamp'2026-01-01 00:00:00' + " +
                  "make_dt_interval(0, 0, 0, doc_id % 86400)"),
                  "yyyy-MM-dd'T'HH:mm:ss'Z'").as("warc_date"),
                encode(concat(lit("body "), col("doc_id")), "UTF-8")
                  .as("payload"))
              .persist()
            val newCrawl = docs.filter(col("doc_id") % 7 =!= 0)
              .select(lit("response").as("record_type"),
                urlOf(col("doc_id")).as("target_uri"),
                lit("2026-02-01T00:00:00Z").as("warc_date"),
                encode(concat(lit("body "),
                  when(col("doc_id") % 5 === 0,
                    concat(col("doc_id"), lit(" v2")))
                    .otherwise(col("doc_id").cast("string"))), "UTF-8")
                  .as("payload"))
              .persist()
            oldCrawl.count(); newCrawl.count()
            val cols = Seq("url", "status")
            def naiveSide(recs: DataFrame, out: String) = {
              val w = Window.partitionBy(col("url"))
                .orderBy(col("__t").desc, col("__h").desc)
              recs.select(col("target_uri").as("url"),
                  unix_timestamp(to_timestamp(col("warc_date"))).as("__t"),
                  xxhash64(col("payload")).as("__h"))
                .withColumn("__rn", row_number().over(w))
                .filter(col("__rn") === 1)
                .select(col("url"), col("__h").as(out))
            }
            val ((nN, hN), tN) = time {
              val joined = naiveSide(oldCrawl, "old_hash")
                .join(naiveSide(newCrawl, "new_hash"), Seq("url"),
                  "full_outer")
                .withColumn("status",
                  when(col("old_hash").isNull, lit("added"))
                    .when(col("new_hash").isNull, lit("gone"))
                    .when(col("old_hash") === col("new_hash"), lit("same"))
                    .otherwise(lit("changed")))
              sig(joined.select(col("url"), col("status")), cols)
            }
            report(s"${name}_window", rep, tN, nN, hN)
            val ((nA, hA), tA) = time(sig(graft.operators.CrawlPipeline
              .crawlDiff(oldCrawl, newCrawl), cols))
            report(s"${name}_agg", rep, tA, nA, hA,
              if (nA == nN && hA == hN) " MATCH" else " **MISMATCH**")
            oldCrawl.unpersist(); newCrawl.unpersist()
          }
        case "hostscores" =>
          // the five-loop host-ranks composition: SHARED materialized
          // edge relation (hostScores — distinct + localCheckpoint
          // once) vs five independent loops each re-deriving the edge
          // expression from the corpus — prices the materialize-once
          // decision on uniform vs hub-whale graphs (one host on half
          // of all edge ends, the pagerank family's whale).
          def hostCol(e: org.apache.spark.sql.Column, whale: Boolean) =
            if (!whale) concat(lit("h"), pmod(e, lit(1000L)))
            else when(e % 2 === 0, lit("hub"))
              .otherwise(concat(lit("h"), pmod(e, lit(1000L))))
          Seq("uniform" -> false, "whale" -> true).foreach {
            case (name, whale) =>
              def edges = docs.select(
                hostCol(col("doc_id"), whale).as("src"),
                hostCol(col("doc_id") * 3 + 1, whale).as("dst"))
              val cols = Seq("node", "pr", "hub", "salsa_hub")
              def independent = {
                import graft.operators.LinkGraph
                val pr = LinkGraph.pageRankInt(edges.distinct(), "src",
                  "dst", 2).withColumnRenamed("rank", "pr")
                val hits = LinkGraph.hitsInt(edges.distinct(), "src",
                  "dst", 2)
                val salsa = LinkGraph.salsaInt(edges.distinct(), "src",
                    "dst", 2)
                  .select(col("node"), col("hub").as("salsa_hub"),
                    col("auth").as("salsa_auth"))
                pr.join(hits, Seq("node")).join(salsa, Seq("node"))
              }
              val ((nI, hI), tI) = time(sig(independent, cols))
              report(s"${name}_indep", rep, tI, nI, hI)
              val ((nS, hS), tS) = time(sig(graft.operators.LinkGraph
                .hostScores(edges, "src", "dst", 2), cols))
              report(s"${name}_shared", rep, tS, nS, hS,
                if (nS == nI && hS == hI) " MATCH" else " **MISMATCH**")
          }
        case "bm25prune" =>
          // MaxScore pruning head-to-head: a query of one stop word
          // (df = N) + one rare term (df ≈ N/1000) against the full
          // scan. The pruned form's aggregation + top-k see only docs
          // containing the rare term; the full form aggregates every
          // stop-word posting. Value equality checked per shape.
          import graft.operators.TextAnalysis
          val nd = 2000000L
          val corpus = spark.range(nd).select(col("id").as("doc_id"),
            concat(lit("the filler w"), pmod(col("id"), lit(9973L)),
              lit(" body text the end"),
              when(pmod(col("id"), lit(1000L)) === 7, lit(" zebra"))
                .otherwise(lit(""))).as("text"))
            .persist()
          corpus.count()
          val terms = Seq("zebra", "the")
          val ((nF, hF), tF) = time(sig(
            TextAnalysis.bm25TopK(corpus, "doc_id", "text", terms, 10),
            Seq("doc_id", "score")))
          report("full", rep, tF, nF, hF)
          val ((nP, hP), tP) = time(sig(
            TextAnalysis.bm25TopKPruned(corpus, "doc_id", "text", terms, 10),
            Seq("doc_id", "score")))
          report("pruned", rep, tP, nP, hP,
            if (nP == nF && hP == hF) " MATCH" else " **MISMATCH**")
          corpus.unpersist()
        case "mirror" =>
          // mirror-host detection under a parking-page clique: 25% of
          // hosts serve ONLY one shared key — every pair of them is a
          // GENUINE mutual mirror (J=1), a C²/2 clique no candidate
          // stage can bound; the maxKeyDf cap removes the key so the
          // output stays the true content mirrors. Bounded to 20k
          // hosts: the clique is quadratic BY DESIGN. LSH runs capped
          // only — uncapped, its band join materializes bands×C²/2
          // candidate rows before the distinct.
          import graft.operators.CrawlPipeline
          val nh = 20000L
          val hostIds = spark.range(nh)
          def pages(parking: Boolean): DataFrame = {
            val base = (if (parking)
                hostIds.filter(pmod(col("id"), lit(4)) =!= 0) else hostIds)
              .select(col("id"),
                explode(sequence(lit(0), lit(19))).as("j"))
              .select(concat(lit("h"), col("id")).as("host"),
                // hosts 2i/2i+1 below 200 share their key set — the
                // planted true mirrors the capped run must still find
                when(col("id") < 200,
                    xxhash64(expr("id DIV 2"), col("j")))
                  .otherwise(xxhash64(col("id"), col("j"))).as("k"))
            if (!parking) base
            else base.unionByName(
              hostIds.filter(pmod(col("id"), lit(4)) === 0)
                .select(concat(lit("h"), col("id")).as("host"),
                  lit(42L).as("k")))
          }
          Seq("uniform" -> pages(false), "parking25" -> pages(true))
            .foreach { case (name, f0) =>
              val f = f0.persist()
              f.count()
              val ((nU, hU), tU) = time(sig(
                CrawlPipeline.mirrorHosts(f, "host", "k", 0.9),
                Seq("host_a", "host_b")))
              report(s"${name}_uncapped", rep, tU, nU, hU)
              val ((nC, hC), tC) = time(sig(
                CrawlPipeline.mirrorHosts(f, "host", "k", 0.9,
                  maxKeyDf = 100), Seq("host_a", "host_b")))
              report(s"${name}_capped", rep, tC, nC, hC)
              val ((nL, hL), tL) = time(sig(
                CrawlPipeline.mirrorHostsLsh(f, "host", "k", 0.9,
                  maxKeyDf = 100), Seq("host_a", "host_b")))
              report(s"${name}_lsh", rep, tL, nL, hL,
                if (nL == nC && hL == hC) " MATCH" else " **MISMATCH**")
              f.unpersist()
            }
        case "geojoin" =>
          // distance self-join shapes: UNIFORM (1M points over ±60°
          // lat — grid cells hold O(1) points, cost ∝ output) and
          // NULL ISLAND (the geo parking-page: 25% of points carry the
          // same bad-geocode coordinate, so they are all GENUINELY
          // within any radius of each other — a C²/2 output clique no
          // candidate stage can bound; bounded to 20k points because
          // the clique is quadratic BY DESIGN). The control is
          // collapse-identical-first: distinct coordinates with
          // multiplicity, pairs over representatives — the clique
          // becomes ONE self-group row, the hamming family's rule.
          import graft.operators.GeoJoin
          def pts(n: Long, nullIsland: Boolean): DataFrame =
            spark.range(n).select(col("id"),
              when(lit(nullIsland) && pmod(col("id"), lit(4)) === 0,
                  lit(0.0))
                .otherwise(pmod(xxhash64(col("id"), lit(1)),
                  lit(360000000L)) / 1e6 - 180).as("lon"),
              when(lit(nullIsland) && pmod(col("id"), lit(4)) === 0,
                  lit(0.0))
                .otherwise(pmod(xxhash64(col("id"), lit(2)),
                  lit(120000000L)) / 1e6 - 60).as("lat"))
          locally {
            val f = pts(1000000L, nullIsland = false).persist(); f.count()
            val ((nR, hR), tR) = time(sig(
              GeoJoin.withinDistance(f, f, "id", "lon", "lat",
                "id", "lon", "lat", 5000.0, selfPairs = true),
              Seq("id_a", "id_b")))
            report("uniform1m", rep, tR, nR, hR)
            f.unpersist()
          }
          locally {
            // kNN at 1M points: the WindowGroupLimit top-k rides the
            // same grid join
            val f = pts(1000000L, nullIsland = false).persist(); f.count()
            val ((nK, hK), tK) = time(sig(
              GeoJoin.nearestNeighbors(f, f, "id", "lon", "lat",
                "id", "lon", "lat", 50000.0, k = 3, excludeSelf = true),
              Seq("id_a", "rank", "id_b")))
            report("knn1m", rep, tK, nK, hK)
            // point-in-polygon at 1M points × 100k small polys, then
            // the WHALE polygon (a continent among buildings): its
            // bbox covers EVERY cell, so it alone emits ~cells keys —
            // the grid-vs-R-tree hazard the scaladoc's split rule is
            // for; measured here, not argued
            import org.apache.spark.sql.functions.{expr => sexpr}
            val polys = spark.range(100000L).select(col("id"),
                (pmod(xxhash64(col("id"), lit(3)), lit(340000000L)) / 1e6
                  - 170).as("lo"),
                (pmod(xxhash64(col("id"), lit(4)), lit(110000000L)) / 1e6
                  - 55).as("la"))
              .select(col("id"), sexpr(
                """array(struct(lo AS lon, la AS lat),
                  |struct(lo + 0.01 AS lon, la AS lat),
                  |struct(lo + 0.01 AS lon, la + 0.01 AS lat),
                  |struct(lo AS lon, la + 0.01 AS lat),
                  |struct(lo AS lon, la AS lat))""".stripMargin)
                .as("ring")).persist()
            polys.count()
            val ((nP, hP), tP) = time(sig(
              GeoJoin.pointsInPolygons(f, polys, "id", "lon", "lat",
                "id", "ring", cellDeg = 0.5),
              Seq("point_id", "poly_id")))
            report("pip1m", rep, tP, nP, hP)
            val whale = spark.range(1).select(lit(100001L).as("id"), sexpr(
              """array(struct(-170.0 AS lon, -55.0 AS lat),
                |struct(170.0 AS lon, -55.0 AS lat),
                |struct(170.0 AS lon, 55.0 AS lat),
                |struct(-170.0 AS lon, 55.0 AS lat),
                |struct(-170.0 AS lon, -55.0 AS lat))""".stripMargin)
              .as("ring"))
            val ((nW, hW), tW) = time(sig(
              GeoJoin.pointsInPolygons(f, polys.unionByName(whale),
                "id", "lon", "lat", "id", "ring", cellDeg = 0.5),
              Seq("point_id", "poly_id")))
            report("pip1m_whale", rep, tW, nW, hW)
            // the DEGRADATION case the auto split exists for (r16
            // verdict task 3): at FINE cellDeg the whale's bbox alone
            // explodes into millions of key rows per geometry —
            // single-pass key fan-out vs pointsInPolygonsAuto's
            // bounded coarse pass, value-equality checked
            def keyRows(p: DataFrame, deg: Double): Long = {
              val lons = transform(col("ring"), q => q.getField("lon"))
              val lats = transform(col("ring"), q => q.getField("lat"))
              p.agg(sum(((floor(array_max(lons) / deg) -
                floor(array_min(lons) / deg) + 1) *
                (floor(array_max(lats) / deg) -
                  floor(array_min(lats) / deg) + 1)).cast("long")))
                .head.getLong(0)
            }
            val all = polys.unionByName(whale)
            val kSingle = keyRows(all, 0.1)
            val ((nF, hF), tF) = time(sig(
              GeoJoin.pointsInPolygons(f, all,
                "id", "lon", "lat", "id", "ring", cellDeg = 0.1),
              Seq("point_id", "poly_id")))
            report("pipwhale_fine", rep, tF, nF, hF, s" keyRows=$kSingle")
            // auto: whale splits to its own coarse grid (cell =
            // side/sqrt(cap)); fine pass covers only the small polys
            val capCells = 4096L
            val kAuto = keyRows(polys, 0.1) +
              keyRows(whale, 340.0 / math.sqrt(capCells.toDouble))
            val ((nA, hA), tA) = time(sig(
              GeoJoin.pointsInPolygonsAuto(f, all,
                "id", "lon", "lat", "id", "ring", cellDeg = 0.1,
                maxCellsPerPoly = capCells),
              Seq("point_id", "poly_id")))
            report("pipwhale_auto", rep, tA, nA, hA,
              s" keyRows=$kAuto" +
                (if (nA == nF && hA == hF) " MATCH" else " **MISMATCH**"))
            polys.unpersist(); f.unpersist()
          }
          locally {
            val f = pts(20000L, nullIsland = true).persist(); f.count()
            val ((nU, hU), tU) = time(sig(
              GeoJoin.withinDistance(f, f, "id", "lon", "lat",
                "id", "lon", "lat", 5000.0, selfPairs = true),
              Seq("id_a", "id_b")))
            report("nullisland_raw", rep, tU, nU, hU)
            // collapse-identical-first: the clique never materializes
            val uniq = f.groupBy(col("lon"), col("lat"))
              .agg(min(col("id")).as("id"), count(lit(1)).as("mult"))
            val ((nC, hC), tC) = time(sig(
              GeoJoin.withinDistance(uniq, uniq, "id", "lon", "lat",
                "id", "lon", "lat", 5000.0, selfPairs = true),
              Seq("id_a", "id_b")))
            val cliqueRows = uniq.filter(col("mult") > 1).count()
            report("nullisland_collapsed", rep, tC, nC, hC,
              s" cliques=$cliqueRows")
            f.unpersist()
          }
          locally {
            // point-to-polyline (r16): 1M points vs 100k 5-vertex
            // roads (random ~0.02° segment steps), then + one
            // TRANSCONTINENTAL whale road (50 segments spanning 300°).
            // The line operator has no polygon-style whale hazard BY
            // CONSTRUCTION — a long line keys the grid per SEGMENT,
            // so its fan-out is (segments × small bbox covers), the
            // sharding we WANT; measured here, not argued.
            import org.apache.spark.sql.functions.{expr => sexpr}
            val f = pts(1000000L, nullIsland = false).persist(); f.count()
            val roads = spark.range(100000L).select(col("id"),
                (pmod(xxhash64(col("id"), lit(5)), lit(340000000L)) / 1e6
                  - 170).as("lo"),
                (pmod(xxhash64(col("id"), lit(6)), lit(110000000L)) / 1e6
                  - 55).as("la"))
              .select(col("id"), sexpr(
                """transform(sequence(0, 4), i ->
                  |struct(lo + i * 0.02 AS lon,
                  |       la + (i % 2) * 0.02 AS lat))""".stripMargin)
                .as("path")).persist()
            roads.count()
            val ((nL, hL), tL) = time(sig(
              GeoJoin.pointsNearLines(f, roads, "id", "lon", "lat",
                "id", "path", radiusM = 1000.0, cellDeg = 0.5),
              Seq("point_id", "line_id")))
            report("pnl1m", rep, tL, nL, hL)
            val whaleRoad = spark.range(1).select(lit(100001L).as("id"),
              sexpr("""transform(sequence(0, 50), i ->
                |struct(-150.0 + i * 6.0 AS lon,
                |       -40.0 + (i % 2) * 2.0 AS lat))""".stripMargin)
                .as("path"))
            val ((nLW, hLW), tLW) = time(sig(
              GeoJoin.pointsNearLines(f, roads.unionByName(whaleRoad),
                "id", "lon", "lat", "id", "path",
                radiusM = 1000.0, cellDeg = 0.5),
              Seq("point_id", "line_id")))
            report("pnl1m_whale", rep, tLW, nLW, hLW)
            roads.unpersist(); f.unpersist()
          }
          locally {
            // polygon-polygon intersect (r16): 200k small rects
            // self-joined (dense enough that ~tens of thousands of
            // pairs overlap), then + the continent whale — its cover
            // fan-out shards the verify exactly like pip1m_whale's
            import org.apache.spark.sql.functions.{expr => sexpr}
            def rects(n: Long, side: Double): DataFrame =
              spark.range(n).select(col("id"),
                  (pmod(xxhash64(col("id"), lit(12)), lit(340000000L)) / 1e6
                    - 170).as("lo"),
                  (pmod(xxhash64(col("id"), lit(13)), lit(110000000L)) / 1e6
                    - 55).as("la"))
                .select(col("id"), sexpr(
                  s"""array(struct(lo AS lon, la AS lat),
                     |struct(lo + $side AS lon, la AS lat),
                     |struct(lo + $side AS lon, la + $side AS lat),
                     |struct(lo AS lon, la + $side AS lat),
                     |struct(lo AS lon, la AS lat))""".stripMargin)
                  .as("ring"))
            val r = rects(200000L, 0.3).persist(); r.count()
            val ((nI, hI), tI) = time(sig(
              GeoJoin.polygonsIntersect(r, r, "id", "ring", "id", "ring",
                cellDeg = 0.5, selfPairs = true),
              Seq("id_a", "id_b")))
            report("ppi200k", rep, tI, nI, hI)
            val whale = spark.range(1).select(lit(200001L).as("id"), sexpr(
              """array(struct(-170.0 AS lon, -55.0 AS lat),
                |struct(170.0 AS lon, -55.0 AS lat),
                |struct(170.0 AS lon, 55.0 AS lat),
                |struct(-170.0 AS lon, 55.0 AS lat),
                |struct(-170.0 AS lon, -55.0 AS lat))""".stripMargin)
              .as("ring"))
            // whale rides the b side: selfPairs keeps id_a < id_b, and
            // every small id pairs BELOW the whale's
            val ((nIW, hIW), tIW) = time(sig(
              GeoJoin.polygonsIntersect(r, r.unionByName(whale),
                "id", "ring", "id", "ring", cellDeg = 0.5,
                selfPairs = true),
              Seq("id_a", "id_b")))
            report("ppi200k_whale", rep, tIW, nIW, hIW)
            // the DEGRADATION shape at fine cellDeg (the pipwhale_fine
            // twin): single-pass makes the continent emit
            // bbox/cellDeg² key rows; the auto split bounds it
            val fineDeg = 0.1
            val ((nIF, hIF), tIF) = time(sig(
              GeoJoin.polygonsIntersect(r, r.unionByName(whale),
                "id", "ring", "id", "ring", cellDeg = fineDeg,
                selfPairs = true),
              Seq("id_a", "id_b")))
            report("ppiwhale_fine", rep, tIF, nIF, hIF)
            val ((nIA, hIA), tIA) = time(sig(
              GeoJoin.polygonsIntersectAuto(r, r.unionByName(whale),
                "id", "ring", "id", "ring", cellDeg = fineDeg,
                selfPairs = true, maxCellsPerPoly = 4096L),
              Seq("id_a", "id_b")))
            report("ppiwhale_auto", rep, tIA, nIA, hIA,
              if (nIA == nIF && hIA == hIF) " MATCH" else " **MISMATCH**")
            r.unpersist()
          }
        case "ppiplanet" =>
          // r17 (VERDICT task 6): the shape where polygonsIntersectAuto
          // actually WINS — the r16 ppiwhale rows honestly recorded
          // auto as NOT a local win at cellDeg 0.1 (3.74M whale key
          // rows are survivable on local[32]). Here the cell is sized
          // for the SMALL geometries' own extent (0.02°, the realistic
          // sizing rule), so the continent whale fans out
          // 17,000 × 5,500 ≈ 93.5M key rows single-pass — the 10⁸
          // regime the r16 row named as the planet hazard — while the
          // smalls emit ≤ 4 cells each. Auto bounds the whale at
          // ≤ maxCellsPerPoly coarse keys.
          locally {
            import graft.operators.GeoJoin
            import org.apache.spark.sql.functions.{expr => sexpr}
            def rects(n: Long, side: Double): DataFrame =
              spark.range(n).select(col("id"),
                  (pmod(xxhash64(col("id"), lit(12)), lit(340000000L)) / 1e6
                    - 170).as("lo"),
                  (pmod(xxhash64(col("id"), lit(13)), lit(110000000L)) / 1e6
                    - 55).as("la"))
                .select(col("id"), sexpr(
                  s"""array(struct(lo AS lon, la AS lat),
                     |struct(lo + $side AS lon, la AS lat),
                     |struct(lo + $side AS lon, la + $side AS lat),
                     |struct(lo AS lon, la + $side AS lat),
                     |struct(lo AS lon, la AS lat))""".stripMargin)
                  .as("ring"))
            val whale = spark.range(1).select(lit(200001L).as("id"), sexpr(
              """array(struct(-170.0 AS lon, -55.0 AS lat),
                |struct(170.0 AS lon, -55.0 AS lat),
                |struct(170.0 AS lon, 55.0 AS lat),
                |struct(-170.0 AS lon, 55.0 AS lat),
                |struct(-170.0 AS lon, -55.0 AS lat))""".stripMargin)
              .as("ring"))
            val r2 = rects(200000L, 0.02).persist(); r2.count()
            val planetDeg = 0.02
            val ((nPF, hPF), tPF) = time(sig(
              GeoJoin.polygonsIntersect(r2, r2.unionByName(whale),
                "id", "ring", "id", "ring", cellDeg = planetDeg,
                selfPairs = true),
              Seq("id_a", "id_b")))
            report("ppiplanet_fine", rep, tPF, nPF, hPF)
            val ((nPA, hPA), tPA) = time(sig(
              GeoJoin.polygonsIntersectAuto(r2, r2.unionByName(whale),
                "id", "ring", "id", "ring", cellDeg = planetDeg,
                selfPairs = true, maxCellsPerPoly = 4096L),
              Seq("id_a", "id_b")))
            report("ppiplanet_auto", rep, tPA, nPA, hPA,
              if (nPA == nPF && hPA == hPF) " MATCH" else " **MISMATCH**")
            r2.unpersist()
          }
        case "geoscale" =>
          // r16 verdict task 7: the band-tiling constants one decade
          // (and two) past the 1M probe, on PLANET-SHAPED density —
          // uniform oceans vs 400 dense cities holding 80% of points
          // (SkewGen-style head) — wall + maxtask at 10M and 100M.
          // Radii shrink with N so expected output stays ~10-50M pairs
          // (the probe prices CANDIDATE volume, not output volume).
          import graft.operators.GeoJoin
          def uni(n: Long): DataFrame = spark.range(n).select(col("id"),
            (pmod(xxhash64(col("id"), lit(1)), lit(360000000L)) / 1e6
              - 180).as("lon"),
            (pmod(xxhash64(col("id"), lit(2)), lit(120000000L)) / 1e6
              - 60).as("lat"))
          def city(n: Long): DataFrame = {
            val cIdx = pmod(xxhash64(col("id"), lit(7)), lit(400L))
            val cLon = pmod(xxhash64(cIdx, lit(8)), lit(340000000L)) / 1e6 - 170
            val cLat = pmod(xxhash64(cIdx, lit(9)), lit(110000000L)) / 1e6 - 55
            val jLon = pmod(xxhash64(col("id"), lit(10)), lit(500000L)) / 1e6 - 0.25
            val jLat = pmod(xxhash64(col("id"), lit(11)), lit(500000L)) / 1e6 - 0.25
            spark.range(n).select(col("id"),
              when(pmod(col("id"), lit(5)) < 4, cLon + jLon)
                .otherwise(pmod(xxhash64(col("id"), lit(1)),
                  lit(360000000L)) / 1e6 - 180).as("lon"),
              when(pmod(col("id"), lit(5)) < 4, cLat + jLat)
                .otherwise(pmod(xxhash64(col("id"), lit(2)),
                  lit(120000000L)) / 1e6 - 60).as("lat"))
          }
          for ((n, label) <- Seq(10000000L -> "10m", 100000000L -> "100m");
               (mode, gen, radius) <- Seq(
                 ("uniform", uni _, if (n == 10000000L) 2000.0 else 500.0),
                 ("city", city _, if (n == 10000000L) 250.0 else 50.0))) {
            // input width gates the MAP side: spark.range defaults to
            // `cores` partitions, so at 100M the explode/shuffle-write
            // tasks would each carry ~30M exploded rows no matter how
            // wide the reduce is — size input splits to ~1M points
            // (what a real ingest's file splits would give)
            val inParts = math.max(cpus.toInt, (n / 1000000L).toInt)
            val f = gen(n).repartition(inParts).persist(); f.count()
            val ((nR, hR), tR) = time(sig(
              GeoJoin.withinDistance(f, f, "id", "lon", "lat",
                "id", "lon", "lat", radius, selfPairs = true),
              Seq("id_a", "id_b")))
            report(s"${mode}_$label", rep, tR, nR, hR, s" radius=$radius")
            f.unpersist()
          }

        case "pnlscale" =>
          // point-to-polyline one decade past its 1M probe (r16):
          // 10M points (both point laws) vs 1M 5-vertex roads = 4M
          // segments, R = 500 m — same input-split sizing lesson as
          // the geoscale distance decade
          import graft.operators.GeoJoin
          def uni(n: Long): DataFrame = spark.range(n).select(col("id"),
            (pmod(xxhash64(col("id"), lit(1)), lit(360000000L)) / 1e6
              - 180).as("lon"),
            (pmod(xxhash64(col("id"), lit(2)), lit(120000000L)) / 1e6
              - 60).as("lat"))
          def city(n: Long): DataFrame = {
            val cIdx = pmod(xxhash64(col("id"), lit(7)), lit(400L))
            val cLon = pmod(xxhash64(cIdx, lit(8)), lit(340000000L)) / 1e6 - 170
            val cLat = pmod(xxhash64(cIdx, lit(9)), lit(110000000L)) / 1e6 - 55
            val jLon = pmod(xxhash64(col("id"), lit(10)), lit(500000L)) / 1e6 - 0.25
            val jLat = pmod(xxhash64(col("id"), lit(11)), lit(500000L)) / 1e6 - 0.25
            spark.range(n).select(col("id"),
              when(pmod(col("id"), lit(5)) < 4, cLon + jLon)
                .otherwise(pmod(xxhash64(col("id"), lit(1)),
                  lit(360000000L)) / 1e6 - 180).as("lon"),
              when(pmod(col("id"), lit(5)) < 4, cLat + jLat)
                .otherwise(pmod(xxhash64(col("id"), lit(2)),
                  lit(120000000L)) / 1e6 - 60).as("lat"))
          }
          locally {
            import org.apache.spark.sql.functions.{expr => sexpr}
            val roads = spark.range(1000000L).select(col("id"),
                (pmod(xxhash64(col("id"), lit(5)), lit(340000000L)) / 1e6
                  - 170).as("lo"),
                (pmod(xxhash64(col("id"), lit(6)), lit(110000000L)) / 1e6
                  - 55).as("la"))
              .select(col("id"), sexpr(
                """transform(sequence(0, 4), i ->
                  |struct(lo + i * 0.02 AS lon,
                  |       la + (i % 2) * 0.02 AS lat))""".stripMargin)
                .as("path"))
              .repartition(cpus.toInt).persist()
            roads.count()
            for ((mode, gen) <- Seq(("uniform", uni _), ("city", city _))) {
              val f = gen(10000000L).repartition(
                math.max(cpus.toInt, 10)).persist(); f.count()
              val ((nL, hL), tL) = time(sig(
                GeoJoin.pointsNearLines(f, roads, "id", "lon", "lat",
                  "id", "path", radiusM = 500.0, cellDeg = 0.25),
                Seq("point_id", "line_id")))
              report(s"pnl_${mode}_10m", rep, tL, nL, hL)
              f.unpersist()
            }
            roads.unpersist()
          }

        case "polarscale" =>
          // dense-polar candidate-volume law for the CELLED polar pass
          // (r18 verdict task 3): density decade × radius sweep × the
          // near-pole cell-collapse regime, wall + maxtask per rep —
          // the same discipline pnlscale used to pin the uniform
          // pass's law. Every point and segment sits poleward of
          // 86.2°, so every segment routes through the exact
          // (band, lon-cell) polar pass: the pass IS the measured
          // object (the fine grid contributes only its always-on
          // cells). The cap rows also exercise the r19 full-circle
          // arm (segments within 0.05° of the pole emit the whole
          // band ring).
          import graft.operators.GeoJoin
          import org.apache.spark.sql.functions.{expr => sexpr}
          def capPts(n: Long, latLo: Double, latSpanMicro: Long,
              seed: Int): DataFrame =
            spark.range(n).select(col("id"),
              (pmod(xxhash64(col("id"), lit(seed)), lit(360000000L))
                / 1e6 - 180).as("lon"),
              (lit(latLo) + pmod(xxhash64(col("id"), lit(seed + 1)),
                lit(latSpanMicro)) / 1e6).as("lat"))
          def capRoads(n: Long, latLo: Double, latSpanMicro: Long,
              seed: Int): DataFrame =
            capPts(n, latLo, latSpanMicro, seed).select(col("id"), sexpr(
              """transform(sequence(0, 1), i ->
                |struct(lon + i * 0.01 AS lon,
                |       lat + i * 0.005 AS lat))""".stripMargin).as("path"))
          def runPolar(name: String, pts: DataFrame, roads: DataFrame,
              r: Double): Unit = {
            val p = pts.repartition(cpus.toInt).persist(); p.count()
            val rd = roads.repartition(cpus.toInt).persist(); rd.count()
            val ((nr, h), t) = time(sig(
              GeoJoin.pointsNearLines(p, rd, "id", "lon", "lat",
                "id", "path", radiusM = r, cellDeg = 0.25),
              Seq("point_id", "line_id")))
            report(name, rep, t, nr, h)
            p.unpersist(); rd.unpersist()
          }
          // density decade at road radius (R = 1 km), lat 86.2–89.0
          for (n <- Seq(100000L, 400000L, 1600000L))
            runPolar(s"pol_d${n / 1000}k_r1k",
              capPts(n, 86.2, 2800000L, 31),
              capRoads(n / 10, 86.2, 2800000L, 37), 1000.0)
          // radius sweep at fixed density (the margin widens, the
          // band's cells coarsen, candidates per cell grow)
          for (r <- Seq(500.0, 2000.0, 8000.0))
            runPolar(s"pol_d400k_r${r.toInt}",
              capPts(400000L, 86.2, 2800000L, 31),
              capRoads(40000L, 86.2, 2800000L, 37), r)
          // near-pole collapse: lat 89.4–89.955, bands trend toward
          // ONE lon cell and the 89.95° cap's full-circle arm fires
          for (r <- Seq(1000.0, 4000.0))
            runPolar(s"pol_cap_r${r.toInt}",
              capPts(100000L, 89.4, 550000L, 41),
              capRoads(5000L, 89.4, 550000L, 43), r)

        case other =>
          sys.error(s"unknown family: $other")
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
