package graft.operators

import graft.functions.{Sketches, TextFunctions}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Train/eval decontamination — the step a pretraining pipeline runs
  * before anything else ships: mark every training document that shares
  * at least one k-gram with a held-out evaluation corpus, so benchmark
  * text can be scrubbed from the training set (the n-gram-overlap
  * procedure published with GPT-3 appendix C / PaLM; k of 8–13 words in
  * production, smaller here only because the synthetic docs are short).
  *
  * Scale design (100 TB corpus, benchmark-sized eval set): the eval
  * side's distinct shingle set is tiny — thousands of documents —
  * against a corpus of billions, so it broadcasts and the corpus side
  * NEVER shuffles at full width: explode the (codegen'd, per-doc
  * distinct) shingle set, probe the broadcast hash relation, and the
  * per-doc overlap count partial-aggregates map-side before the only
  * (contaminated-ids-sized) shuffle. No all-pairs anything.
  */
object Decontaminate {

  /** @return (`idCol`, n_shared) — one row per CONTAMINATED training
    *         doc, n_shared = how many distinct k-shingles it shares
    *         with the eval corpus. Clean docs don't appear; anti-join
    *         the output against the corpus to get the keep-set.
    */
  def contaminated(train: DataFrame, evalCorpus: DataFrame,
      idCol: String, textCol: String, k: Int = 3): DataFrame = {
    val evalShingles = evalCorpus
      .select(explode(TextFunctions.shingleSet(col(textCol), k)).as("sh"))
      .distinct()
    train
      .select(col(idCol), explode(TextFunctions.shingleSet(col(textCol), k)).as("sh"))
      .join(broadcast(evalShingles), "sh")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shared")) // shingleSet is per-doc distinct
  }

  /** The surviving training set: drop contaminated docs (left-anti on
    * the flag relation — the corpus-side shuffle is still only keyed by
    * id against a contaminated-sized right side).
    */
  def decontaminate(train: DataFrame, evalCorpus: DataFrame,
      idCol: String, textCol: String, k: Int = 3): DataFrame =
    train.join(contaminated(train, evalCorpus, idCol, textCol, k)
      .select(col(idCol)), Seq(idCol), "left_anti")

  /** [[contaminated]] for an eval corpus whose exact shingle set is too
    * big to broadcast as a hash relation: a Bloom filter over the eval
    * shingles broadcasts instead (8 bits/element ≈ 2% fp at any set
    * size), the corpus pre-filters map-side against it — discarding the
    * overwhelmingly-clean bulk without a shuffle — and only the
    * candidate survivors pay the exact shuffle join that removes the
    * false positives. Identical output to [[contaminated]] (a Bloom
    * filter has no false negatives; positives are verified exactly);
    * the cost model shifts from |eval| broadcast bytes to |eval| bits.
    */
  def contaminatedBloom(train: DataFrame, evalCorpus: DataFrame,
      idCol: String, textCol: String, k: Int = 3,
      expectedEvalShingles: Long = 10000000L, fpp: Double = 0.02): DataFrame = {
    val evalShingles = evalCorpus
      .select(explode(TextFunctions.shingleSet(col(textCol), k)).as("sh"))
      .distinct()
    // public sketch API: per-partition filters built on executors,
    // OR-merged at the driver — the merged filter (~10 bits/element at
    // 2% fpp) IS the broadcast, orders of magnitude under the exact
    // string hash relation
    val bf = evalShingles.stat.bloomFilter("sh", expectedEvalShingles, fpp)
    val bc = train.sparkSession.sparkContext.broadcast(bf)
    val mightContain = udf((s: String) => bc.value.mightContainString(s))
    train
      .select(col(idCol), explode(TextFunctions.shingleSet(col(textCol), k)).as("sh"))
      .filter(mightContain(col("sh")))
      .join(evalShingles, "sh") // exact verify: candidates only reach here
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shared"))
  }

  /** [[contaminated]] graded instead of binary: each flagged doc's
    * overlap FRACTION `n_shared / n_shingles(doc)` plus the threshold
    * verdict — the published decontamination recipes differ exactly
    * here (GPT-3 removed on any 13-gram hit; PaLM/Llama drop a doc only
    * when ≥ `minFrac` of its grams are eval-contaminated, so a long doc
    * quoting one benchmark line survives while a verbatim copy dies).
    *
    * Scale shape: the per-doc denominator is a codegen'd `size()` on
    * the same per-doc distinct shingle set the probe explodes — no
    * second scan, no shuffle added; the flagged relation (bounded by
    * docs sharing ≥ 1 gram with the eval set) broadcasts back onto the
    * denominator relation, so the corpus side still never shuffles.
    *
    * @return (`idCol`, n_shared, n_shingles, frac, drop) — one row per
    *         contaminated doc; `drop` = frac ≥ minFrac.
    */
  /** SEMANTIC decontamination — the embedding-space complement of the
    * n-gram procedures above (the published gap they leave: a
    * paraphrased benchmark item shares no 13-gram with its source but
    * sits next to it in embedding space; cf. the contamination audits
    * accompanying GSM8K/MMLU releases). A training item is flagged
    * when its embedding's cosine against ANY eval-set embedding
    * reaches `tau`.
    *
    * Scale shape: the eval side is benchmark-sized (thousands) — it
    * broadcasts, the corpus side NEVER shuffles at full width
    * (BroadcastNestedLoopJoin, one narrow pass of |corpus|·|eval|
    * fused cosines), and only the flagged (id, cos) survivors pay the
    * per-id max/count aggregate, which partial-aggregates map-side.
    * When the eval set outgrows broadcast-nested-loop economics, the
    * sign-LSH band prefilter ([[Dedup.embeddingNearDupPairsSignLsh]]'s
    * candidate stage) bounds the exact-cosine verify the same way the
    * Bloom filter bounds [[contaminatedBloom]]'s exact join.
    *
    * @return (`idCol`, n_eval_hits, max_cos) — one row per
    *         contaminated training item: how many eval embeddings it
    *         matched and the strongest match (rounded 6 dp). Clean
    *         items don't appear; anti-join to get the keep-set.
    */
  def semanticContaminated(corpusEmb: DataFrame, evalEmb: DataFrame,
      idCol: String, vecCol: String, tau: Double): DataFrame = {
    require(tau > 0 && tau <= 1, s"tau must be in (0,1]: $tau")
    val c = corpusEmb.select(col(idCol),
      transform(col(vecCol), x => x.cast("double")).as("__v"))
    val e = evalEmb.select(
      transform(col(vecCol), x => x.cast("double")).as("__ev"))
    c.crossJoin(broadcast(e))
      .select(col(idCol),
        Sketches.cosineSim(col("__v"), col("__ev")).as("__cos"))
      .filter(col("__cos") >= lit(tau))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_eval_hits"),
        round(max(col("__cos")), 6).as("max_cos"))
  }

  def contaminationFraction(train: DataFrame, evalCorpus: DataFrame,
      idCol: String, textCol: String, k: Int = 3,
      minFrac: Double = 0.5): DataFrame = {
    require(minFrac >= 0 && minFrac <= 1, s"minFrac must be in [0,1]: $minFrac")
    val denom = train.select(col(idCol),
      size(TextFunctions.shingleSet(col(textCol), k)).cast("long").as("n_shingles"))
    denom.join(
        broadcast(contaminated(train, evalCorpus, idCol, textCol, k)), Seq(idCol))
      .withColumn("frac", col("n_shared").cast("double") / col("n_shingles"))
      .withColumn("drop", col("frac") >= lit(minFrac))
  }
}
