package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Settings for the end-to-end training-corpus pipeline — the LLM-side
  * analogue of [[graft.model.PoiSettings]].
  *
  * @param mixtureRates  per-source keep probabilities (empty = keep all);
  *                      for temperature-balanced recipes compute them
  *                      from corpus counts with
  *                      [[Sampling.temperatureRates]] and pass the
  *                      result here
  * @param defaultRate   keep rate for unlisted sources
  * @param epochs        per-source epoch multiplicities (empty = 1 pass)
  * @param dedupK        word-shingle size for near-dup detection
  * @param dedupThreshold Jaccard threshold for near-duplicates
  * @param lshBands/lshRowsPerBand MinHash banding (recall 1−(1−s^r)^b)
  * @param decontaminateK n-gram size for eval-overlap scrubbing
  * @param maxPerplexity drop docs whose corpus-trained bigram-LM
  *                      perplexity exceeds this (None = stage off);
  *                      docs with < 2 tokens score no perplexity and
  *                      are dropped when the stage is on
  * @param packCap       context-window token budget per pack
  * @param packBuckets   distributed-prefix-scan fan-out for the layout
  * @param numShards     when set, append the dataloader shard contract
  *                      (shard = hash mod n, pos = dense in-shard
  *                      index) to every output row — computed on the
  *                      PACKED layout before epoch replication, so all
  *                      epochs of a doc land on the same shard
  * @param ccMinLabel    opt back into min-label propagation for the
  *                      dedup stage's connected components. Default is
  *                      star contraction: on chain-shaped near-dup
  *                      graphs (template boilerplate on a real crawl)
  *                      star is measured 13× faster (round-10
  *                      BASELINE.md, 10k-doc chain: 6.1–6.6 s vs
  *                      81–88 s), and the labelings are identical
  *                      (both min-id, same recursive-CTE oracle). The
  *                      min-label path remains for clique-shaped pair
  *                      sets where its single-join rounds edge out
  *                      star's two.
  */
final case class CorpusSettings(
    idCol: String = "doc_id",
    textCol: String = "text",
    sourceCol: String = "source",
    stratumCol: String = "lang",
    mixtureRates: Map[String, Double] = Map.empty,
    defaultRate: Double = 1.0,
    epochs: Map[String, Double] = Map.empty,
    defaultEpochs: Double = 1.0,
    dedupK: Int = 3,
    dedupThreshold: Double = 0.8,
    lshBands: Int = 16,
    lshRowsPerBand: Int = 2,
    decontaminateK: Int = 8,
    maxPerplexity: Option[Double] = None,
    packCap: Long = 8192,
    packBuckets: Int = 32,
    numShards: Option[Int] = None,
    ccMinLabel: Boolean = false)

/** The whole training-data recipe as ONE composable operator, each
  * stage the library's own primitive:
  *
  *   mixture-sample → decontaminate → [perplexity quality gate] →
  *   near-dup dedup (LSH → connected components → keep canonical) →
  *   sequence-pack → epoch-upsample
  *
  * Stage order is load-bearing: dedup runs BEFORE upsampling so
  * intentional epoch copies aren't deduped away, and packing runs
  * before upsampling so every epoch replays the SAME pack layout (what
  * a trainer actually does). Every stage is deterministic (portable
  * id-hash, no RNG) and shuffle-shaped for scale: narrow filters,
  * broadcast probes, candidate-bounded dedup, a distributed prefix
  * scan, and a narrow generate. An `observe("corpus_pipeline", …)`
  * metric on the result reports surviving docs and total packed tokens.
  *
  * @param docs       the corpus; must carry id/text/source/stratum cols
  * @param evalCorpus held-out eval docs to scrub against (None = skip)
  * @return one row per (surviving doc × epoch):
  *         all input columns + n_words, pack_id, pack_offset, epoch
  *
  * @note When `maxPerplexity` is set, the mixture+decontaminate frame is
  *       persisted (MEMORY_AND_DISK) for the duration of ONE
  *       materialization: a QueryExecutionListener keyed on this
  *       pipeline's observe() metric unpersists it as soon as the first
  *       action on the returned plan completes (success or failure), so
  *       N pipeline runs in a long-lived session no longer accumulate N
  *       cache entries. If the caller never materializes the result the
  *       cache (and one idle listener) persists until session end —
  *       lazy-persist semantics make that unavoidable without a handle.
  */
object CorpusPipeline {

  /** Per-run sequence for the gate-cache listener's metric key; see
    * [[unpersistOnMaterialize]]. */
  private val gateSeq = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Unpersist `cached` once the first action whose plan carries the
    * observe() metric `metricName` completes — i.e. once the caller has
    * materialized the pipeline result the cache existed to serve. Keyed
    * on a metric (rather than plan identity) because each action
    * re-plans a fresh QueryExecution; the caller passes a PER-RUN
    * UNIQUE metric name (`corpus_pipeline_gate_<seq>`, stamped into the
    * run's plan alongside the stable public `corpus_pipeline` metric),
    * so a session that builds several pipelines — sequentially or
    * concurrently — before materializing them can never release one
    * run's cache from another run's action. The listener unregisters
    * itself after firing, so N pipeline runs leave no listener residue.
    */
  private def unpersistOnMaterialize(cached: DataFrame,
      metricName: String): Unit = {
    val spark = cached.sparkSession
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      private val fired = new java.util.concurrent.atomic.AtomicBoolean(false)
      private def maybe(
          qe: org.apache.spark.sql.execution.QueryExecution): Unit =
        // observedMetrics walks the executed plan; on a failed query
        // that plan may never have been built — treat as "not ours"
        if (scala.util.Try(qe.observedMetrics.contains(metricName))
              .getOrElse(false) &&
            fired.compareAndSet(false, true)) {
          cached.unpersist(false)
          spark.listenerManager.unregister(this)
        }
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = maybe(qe)
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = maybe(qe)
    }
    spark.listenerManager.register(listener)
  }

  def run(docs: DataFrame, evalCorpus: Option[DataFrame],
      s: CorpusSettings): DataFrame = {
    // 1. mixture: per-source deterministic keep rates (narrow filter)
    val mixed =
      if (s.mixtureRates.isEmpty) docs
      else Sampling.mixtureByHash(docs, s.idCol, s.sourceCol,
        s.mixtureRates, s.defaultRate)
    // 2. decontaminate: drop docs sharing eval n-grams (broadcast probe)
    val clean = evalCorpus match {
      case Some(ev) =>
        Decontaminate.decontaminate(mixed, ev, s.idCol, s.textCol,
          s.decontaminateK)
      case None => mixed
    }
    // 2b. optional quality gate: corpus-trained bigram-LM perplexity
    // threshold (CCNet-style). The model trains on the decontaminated
    // survivors — the same corpus the filter then prunes — so the
    // stage is one aggregate pass + an equi-join, no external model.
    // `clean` is PERSISTED when the gate is on: perplexityScore scans
    // it three ways (doc bigrams, bigram counts, unigram counts), the
    // gate joins back onto it, and the dedup stage re-derives it for
    // both the LSH pairs and the keep pass — without the cache the
    // whole mixture+decontaminate lineage would replay ~5×. An EAGER
    // unpersist would drop the cache before the caller runs the lazy
    // result, so the unpersist is deferred to the first completed
    // action on the returned plan (see unpersistOnMaterialize).
    val gateTag = s.maxPerplexity.map(_ =>
      s"corpus_pipeline_gate_${gateSeq.incrementAndGet()}")
    val scored = s.maxPerplexity match {
      case Some(maxPpl) =>
        val cached = clean.persist(
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        unpersistOnMaterialize(cached, gateTag.get)
        val ppl = TextAnalysis.perplexityScore(cached, s.idCol, s.textCol)
          .filter(col("perplexity") <= maxPpl)
          .select(col(s.idCol))
        cached.join(ppl, s.idCol) // inner: < 2-token docs score nothing, drop
      case None => clean
    }
    // 3. near-dup dedup: LSH candidates → components → keep canonical
    val pairs = Dedup.minhashLshPairs(scored, s.idCol, s.textCol,
        k = s.dedupK, threshold = s.dedupThreshold,
        bands = s.lshBands, rowsPerBand = s.lshRowsPerBand)
      .select(col("id_a"), col("id_b"))
    val cc =
      if (s.ccMinLabel)
        Dedup.connectedComponents(pairs, "id_a", "id_b", idOut = "__cid")
      else
        Dedup.connectedComponentsStar(pairs, "id_a", "id_b", idOut = "__cid")
    val kept = scored
      .join(cc, col(s.idCol) === col("__cid"), "left")
      .filter(col("__cid").isNull || col("component") === col(s.idCol))
      .drop("__cid", "component")
    // 4. pack layout: deterministic hash order, distributed prefix scan
    val packed = Sampling.packLayoutSalted(
      kept.withColumn("n_words",
        size(split(col(s.textCol), " ")).cast("long")),
      s.stratumCol, s.idCol, "n_words", s.packCap, s.packBuckets)
    // 4b. optional dataloader shards: (shard, pos) per surviving doc —
    // the same salted prefix scan, computed on the surviving id set
    // only (one narrow projection in, one equi-join on the id out), so
    // every epoch replica of a doc inherits one (shard, pos)
    val sharded = s.numShards match {
      case Some(n) =>
        val sl = Sampling.shardLayout(packed.select(col(s.idCol)),
          s.idCol, n, s.packBuckets)
        packed.join(sl, Seq(s.idCol))
      case None => packed
    }
    // 5. epochs: replicate the packed layout per source multiplicity
    val out =
      if (s.epochs.isEmpty) sharded.withColumn("epoch", lit(1))
      else Sampling.upsampleByEpochs(sharded, s.idCol, s.sourceCol,
        s.epochs, s.defaultEpochs)
    val observed = out.observe("corpus_pipeline",
      count(lit(1)).as("rows_out"),
      sum(col("n_words")).as("tokens_out"))
    // when the gate cached, stamp this run's unique listener key into
    // the plan (a root-level CollectMetrics — no effect on the stages
    // below it) so only THIS run's actions release the gate cache
    gateTag.fold(observed)(tag =>
      observed.observe(tag, count(lit(1)).as("rows_out")))
  }

  /** The per-pack manifest of a [[run]] output — the consumable
    * dataloader artifact: one row per (stratum, pack, epoch) with the
    * ordered doc ids the pack concatenates, doc/token counts riding
    * along ([[Sampling.packManifest]] keyed per epoch, so each epoch
    * replays the identical pack list). One keyed aggregate; per-pack
    * state bounded by `packCap`. Same observe() discipline as [[run]]:
    * a `corpus_manifest` metric reports packs and total tokens.
    */
  def manifest(out: DataFrame, s: CorpusSettings): DataFrame =
    out.groupBy(col(s.stratumCol), col("pack_id"), col("epoch"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_words")).as("n_tokens"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("pack_offset"), col(s.idCol)))),
            x => x.getField(s.idCol).cast("string")),
          ",").as("doc_ids"))
      .observe("corpus_manifest",
        count(lit(1)).as("packs_out"),
        sum(col("n_tokens")).as("tokens_out"))
}
