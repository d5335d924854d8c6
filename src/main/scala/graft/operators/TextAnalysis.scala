package graft.operators

import graft.functions.{Sketches, TextFunctions}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline: token
  * counting, quality scoring, heuristic language ID, and document
  * fingerprinting. Everything is built from codegen'd built-ins (plus
  * the [[graft.functions.RollingHash64]] expression), so each operator
  * is one narrow map stage — no shuffle, no UDF boxing, safe to run
  * inline with the ingest scan at any scale.
  */
object TextAnalysis {

  /** Whitespace-token and regex-token ("BPE-ish" [a-z]+|[0-9]+|other)
    * counts. Output: (id, n_words, n_tokens, n_chars).
    */
  def tokenStats(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol),
      size(TextFunctions.words(col(textCol))).as("n_words"),
      size(regexp_extract_all(col(textCol), lit("[a-z]+|[0-9]+"), lit(0))).as("n_tokens"),
      length(col(textCol)).as("n_chars"))

  /** Default stopword set for quality scoring (vocabulary-appropriate
    * function words).
    */
  val DefaultStopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in")

  /** Quality signals: mean word length, stopword ratio, and a bounded
    * composite score. Output: (id, mean_wlen, stopword_ratio, quality).
    *
    * One fused codegen'd pass ([[graft.functions.MarkerCounts]]): the
    * former `aggregate(transform(length))` + `size(filter(isin))`
    * lambda chain was a CodegenFallback evaluated interpreted per row
    * — on the ingest-inline path that interpretation was the cost.
    * The arithmetic on the struct fields is unchanged expression-for-
    * expression, so results are bit-identical to the lambda form.
    */
  def qualityScore(docs: DataFrame, idCol: String, textCol: String,
      stopwords: Seq[String] = DefaultStopwords): DataFrame = {
    val base = docs.select(col(idCol),
      TextFunctions.markerCounts(col(textCol), Seq(stopwords)).as("__mc"))
    val nWords = col("__mc.n_words")
    val sumLen = col("__mc.sum_len")
    val nStop = element_at(col("__mc.hits"), 1)
    base.select(col(idCol),
      round(sumLen.cast("double") / nWords, 6).as("mean_wlen"),
      round(nStop.cast("double") / nWords, 6).as("stopword_ratio"),
      round(least(nWords.cast("double") / 100.0, lit(1.0)) * 0.5 +
        (lit(1.0) - nStop.cast("double") / nWords) * 0.5, 6).as("quality"))
  }

  /** Gopher-style quality-rule filter (the published MassiveText rule
    * set: word-count bounds, mean-word-length band, symbol-to-word
    * ratio, bullet-line and ellipsis-line fractions, alphabetic-word
    * fraction, minimum stop-word hits). One per-row pass — the word
    * stats ride the fused [[TextFunctions.markerCounts]] kernel and
    * every other signal is a codegen'd `regexp_count`, so the filter
    * fuses into the ingest scan with no shuffle at any scale.
    *
    * Ratios divide exact integer counts; rule comparisons use the
    * same round(,6) values that are emitted, so an oracle evaluating
    * identical arithmetic agrees bit-for-bit. Words are single-space
    * splits (empties kept); lines are `\n` splits.
    *
    * Output: (id, n_words, mean_wlen, symbol_ratio, bullet_ratio,
    * ellipsis_ratio, alpha_ratio, n_stop, pass∈{0,1}).
    */
  def gopherRules(docs: DataFrame, idCol: String, textCol: String,
      stopwords: Seq[String] = DefaultStopwords,
      minWords: Long = 50L, maxWords: Long = 100000L): DataFrame = {
    val base = docs.select(col(idCol), col(textCol).as("__t"),
      TextFunctions.markerCounts(col(textCol), Seq(stopwords)).as("__mc"))
    val g = gopherExprs(col("__t"), col("__mc"), minWords, maxWords)
    base.select(col(idCol), g.nWords.as("n_words"), g.meanWlen.as("mean_wlen"),
      g.symbolRatio.as("symbol_ratio"), g.bulletRatio.as("bullet_ratio"),
      g.ellipsisRatio.as("ellipsis_ratio"), g.alphaRatio.as("alpha_ratio"),
      g.nStop.as("n_stop"), g.pass.as("pass"))
  }

  /** The [[gopherRules]] pass/fail rule as ONE filterable boolean
    * Column over the raw text — the ingest-time (incl. streaming) row
    * filter, when materializing the signal columns isn't needed. Same
    * expressions as [[gopherRules]] (whole-stage codegen's
    * subexpression elimination dedups the shared kernels within the
    * projection).
    */
  def gopherPass(text: Column, stopwords: Seq[String] = DefaultStopwords,
      minWords: Long = 50L, maxWords: Long = 100000L): Column =
    gopherExprs(text, TextFunctions.markerCounts(text, Seq(stopwords)),
      minWords, maxWords).pass === 1

  private final case class GopherCols(nWords: Column, meanWlen: Column,
      symbolRatio: Column, bulletRatio: Column, ellipsisRatio: Column,
      alphaRatio: Column, nStop: Column, pass: Column)

  private def gopherExprs(text: Column, mc: Column, minWords: Long,
      maxWords: Long): GopherCols = {
    val nWords = mc.getField("n_words").cast("long")
    val nStop = element_at(mc.getField("hits"), 1).cast("long")
    val nLines = regexp_count(text, lit("\n")) + lit(1L)
    val meanWlen = round(mc.getField("sum_len").cast("double") / nWords, 6)
    val symbolRatio = round(
      regexp_count(text, lit("#|\\.\\.\\.")).cast("double") / nWords, 6)
    val bulletRatio = round(
      regexp_count(text, lit("(?m)^[-*] ")).cast("double") / nLines, 6)
    val ellipsisRatio = round(
      regexp_count(text, lit("(?m)\\.\\.\\.$")).cast("double") / nLines, 6)
    val alphaRatio = round(
      regexp_count(text, lit("[^ ]*[a-zA-Z][^ ]*")).cast("double") / nWords, 6)
    val pass = (nWords >= minWords && nWords <= maxWords &&
      meanWlen >= 3.0 && meanWlen <= 10.0 &&
      symbolRatio < 0.1 && bulletRatio < 0.9 &&
      ellipsisRatio < 0.3 && alphaRatio > 0.8 &&
      nStop >= 2L).cast("int")
    GopherCols(nWords, meanWlen, symbolRatio, bulletRatio, ellipsisRatio,
      alphaRatio, nStop, pass)
  }

  /** Language-marker word sets for [[langId]], in tie-preference order. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of"),
    "de" -> Seq("der", "die", "und"),
    "es" -> Seq("el", "los", "una"),
    "fr" -> Seq("le", "les", "une"),
    "zh" -> Seq("shi", "bu", "wo"))

  /** Heuristic language ID: argmax of marker-word hit counts, ties
    * resolved by [[LangMarkers]] order, 'und' when no marker hits.
    * Output: (id, lang_pred).
    */
  def langId(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // one fused MarkerCounts pass for all five marker sets (was one
    // interpreted filter(isin) lambda per language per row)
    val base = docs.select(col(idCol),
      TextFunctions.markerCounts(col(textCol), LangMarkers.map(_._2)).as("__mc"))
    val counts: Seq[(String, Column)] = LangMarkers.zipWithIndex.map {
      case ((lang, _), i) => lang -> element_at(col("__mc.hits"), i + 1)
    }
    val g = greatest(counts.map(_._2): _*)
    val pred = counts.foldLeft(when(g === 0, "und")) { case (acc, (lang, c)) =>
      acc.when(c === g, lang)
    }
    base.select(col(idCol), pred.as("lang_pred"))
  }

  /** jusText-style main-content selection over HTML — the boilerplate
    * REMOVAL step between raw extraction ([[TextFunctions.htmlText]],
    * which keeps nav/footer text) and the quality filters: classify
    * each visible block of the page ([[TextFunctions.htmlBlocks]]:
    * text, non-ws chars, chars inside `<a>`) and keep only content-
    * like blocks. The published jusText core, reduced to its
    * deterministic integer form (no float densities — every rule is a
    * cross-multiplied comparison, so any engine reproduces the keep
    * set bit-for-bit):
    *
    *   keep ⟺ n_chars ≥ minChars                        (short rule)
    *        ∧ link_chars·linkDen ≤ n_chars·linkNum      (link density)
    *        ∧ stop_hits·stopDen ≥ n_words·stopNum       (stopword density)
    *
    * Output: (id, main_text = kept blocks joined by `\n` in document
    * order, blocks_kept, blocks_total).
    *
    * Scale shape: ONE codegen'd parse per document (blocks never
    * re-scan the HTML), then the whole classification is PER-ROW —
    * higher-order `filter` over the block array with the MarkerCounts
    * kernel inside the lambda — so the operator is a narrow map with
    * ZERO exchanges (an earlier form exploded + re-aggregated; a
    * per-doc-bounded array never needed a shuffle), and it runs
    * unchanged on a stream in append mode (no aggregation state) —
    * what [[CrawlPipeline]]'s streaming path relies on.
    */
  def htmlMainContent(docs: DataFrame, idCol: String, htmlCol: String,
      stopwords: Seq[String] = DefaultStopwords,
      minChars: Int = 25,
      linkNum: Int = 1, linkDen: Int = 5,
      stopNum: Int = 1, stopDen: Int = 10): DataFrame = {
    val (text, kept, total) = mainContentCols(col(htmlCol), stopwords,
      minChars, linkNum, linkDen, stopNum, stopDen)
    docs.select(col(idCol), text.as("main_text"),
      kept.as("blocks_kept"), total.as("blocks_total"))
  }

  /** The column form of [[htmlMainContent]]:
    * (main_text, blocks_kept, blocks_total) from an html column, all
    * per-row expressions.
    */
  def mainContentCols(html: Column,
      stopwords: Seq[String] = DefaultStopwords,
      minChars: Int = 25,
      linkNum: Int = 1, linkDen: Int = 5,
      stopNum: Int = 1, stopDen: Int = 10): (Column, Column, Column) =
    mainContentColsFromBlocks(TextFunctions.htmlBlocks(html), stopwords,
      minChars, linkNum, linkDen, stopNum, stopDen)

  /** [[mainContentCols]] over an already-extracted block array (e.g.
    * `htmlDoc(html).getField("blocks")` when the title comes from the
    * same single parse).
    */
  def mainContentColsFromBlocks(blocks: Column,
      stopwords: Seq[String] = DefaultStopwords,
      minChars: Int = 25,
      linkNum: Int = 1, linkDen: Int = 5,
      stopNum: Int = 1, stopDen: Int = 10): (Column, Column, Column) = {
    def keep(b: Column): Column = {
      val mc = TextFunctions.markerCounts(b.getField("text"), Seq(stopwords))
      b.getField("n_chars") >= minChars &&
        b.getField("link_chars") * linkDen <=
          b.getField("n_chars") * linkNum &&
        element_at(mc.getField("hits"), 1) * stopDen >=
          mc.getField("n_words") * stopNum
    }
    val kept = filter(blocks, keep _)
    (array_join(transform(kept, b => b.getField("text")), "\n"),
      size(kept).cast("long"),
      size(blocks).cast("long"))
  }

  /** Gopher/FineWeb-style repetition signals — the boilerplate/spam
    * filters a pretraining pipeline runs alongside [[qualityScore]]:
    * the word-mass fraction of the single most frequent word, the
    * fraction of duplicated words (1 − distinct/total), and the
    * fraction of duplicated 2-grams. ONE corpus scan: words and
    * (non-distinct, [[graft.functions.ShingleList]]) bigrams explode
    * from the same codegen'd pass and discriminate for free — a
    * whitespace-split word never contains a space, a 2-gram always
    * does — then one per-(doc, term) count and one per-doc conditional
    * aggregate, both map-side partial. No per-row lambda fallback, no
    * window, no second scan.
    * Output: (id, top_word_frac, dup_word_frac, dup_2gram_frac).
    */
  def repetitionStats(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val terms = docs.select(col(idCol),
      explode(concat(TextFunctions.words(col(textCol)),
        TextFunctions.shingleList(col(textCol), 2))).as("t"))
    val isWord = !col("t").contains(" ")
    terms.groupBy(col(idCol), col("t")).agg(count(lit(1)).as("c"))
      .groupBy(col(idCol)).agg(
        sum(when(isWord, col("c"))).as("n"),
        max(when(isWord, col("c"))).as("mx"),
        sum(when(isWord, lit(1L))).as("d"),
        sum(when(!isWord, col("c"))).as("nb"),
        sum(when(!isWord, lit(1L))).as("db"))
      .select(col(idCol),
        round(col("mx").cast("double") / col("n").cast("double"), 6)
          .as("top_word_frac"),
        round((col("n") - col("d")).cast("double") / col("n").cast("double"), 6)
          .as("dup_word_frac"),
        coalesce(
          round((col("nb") - col("db")).cast("double") / col("nb").cast("double"), 6),
          lit(0.0)).as("dup_2gram_frac"))
  }

  /** Byte-pair-encoding merge training (Sennrich et al. 2016, as used
    * by every BPE/WordPiece-family tokenizer): start from characters,
    * repeatedly count adjacent symbol pairs across the corpus weighted
    * by word frequency, and merge the most frequent pair. The learned
    * merge list IS the tokenizer.
    *
    * Distributed shape: the corpus collapses to (symbol-array, count)
    * word frequencies ONCE — all further rounds run on the vocabulary,
    * which is orders of magnitude smaller than the corpus and shrinks
    * as merges land. Each round is one map-side-combinable pair-count
    * aggregate (explode of zipped array slices) + a driver argmax of
    * ONE row + a narrow merge map; per-round results are persisted and
    * the previous round dropped, so lineage stays flat. Ties break
    * deterministically by (count desc, left, right).
    *
    * @return one row per learned merge: (rank, left, right, pair_count)
    */
  def bpeTrainMerges(docs: DataFrame, textCol: String,
      numMerges: Int): DataFrame = {
    require(numMerges > 0, s"numMerges must be positive: $numMerges")
    val spark = docs.sparkSession
    // The rounds' latency floor is task-scheduling, not compute: the
    // vocabulary (distinct words) is orders of magnitude smaller than
    // the corpus, so running each round's argmax at the CORPUS shuffle
    // width schedules ~2×partitions near-empty tasks per round — and
    // the per-round driver synchronization multiplies that under load.
    // Run the loop at width defaultParallelism/8 (≥ 2): still
    // distributed — a 4000-core cluster keeps a 500-way vocab — but the
    // local[32] demo drops from 64 to ~8 tiny tasks per round.
    // The override lives on a CLONED session (same discipline as the
    // CC loops: isolated SQLConf, shared context/cache — the caller's
    // session is never mutated, nothing to restore); the width applies
    // to the initial vocab groupBy too, so the CACHED vocab carries
    // the narrow layout through every round. The merge table is
    // re-rooted in the caller's session before returning.
    val partsKey = "spark.sql.shuffle.partitions"
    val loopParts = math.max(2, spark.sparkContext.defaultParallelism / 8)
    val loopSession = org.apache.spark.sql.graft.Bridge.cloneSession(spark)
    loopSession.conf.set(partsKey, loopParts.toString)
    org.apache.spark.sql.graft.Bridge.inSession(spark,
      bpeTrainLoop(org.apache.spark.sql.graft.Bridge.inSession(loopSession, docs),
        textCol, numMerges))
  }

  private def bpeTrainLoop(docs: DataFrame, textCol: String,
      numMerges: Int): DataFrame = {
    val spark = docs.sparkSession
    var vocab = docs
      .select(explode(TextFunctions.words(col(textCol))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .select(split(col("w"), "").as("syms"), col("cnt"))
      .persist()
    val mergeUdf = udf((syms: Seq[String], a: String, b: String) => {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
          out += a + b; i += 2 // greedy left-to-right, no overlap
        } else { out += syms(i); i += 1 }
      }
      out.toSeq
    })
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    // ONE action per merge round: the argmax job ALSO materializes the
    // (lazily persisted) current vocab — only then is the previous
    // round's cache dropped, so nothing ever recomputes through deep
    // lineage. The old shape ran a second `persist(); count()` action
    // per round purely to materialize, doubling the per-round driver
    // round-trips (and with them the latency floor under scheduler
    // load). The logical plan grows by one projection per round
    // (linear, not the CC-star 12^k case) — fine for the tens of
    // merges a demo vocab learns; checkpoint if ever in the thousands.
    var prev: Option[DataFrame] = None
    var rank = 0
    var exhausted = false
    while (rank < numMerges && !exhausted) {
      val top = vocab
        .select(explode(arrays_zip(
            slice(col("syms"), lit(1), size(col("syms")) - 1).as("l"),
            slice(col("syms"), lit(2), size(col("syms")) - 1).as("r"))).as("p"),
          col("cnt"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("cnt")).as("n"))
        .orderBy(col("n").desc, col("l"), col("r"))
        .limit(1).collect()
      prev.foreach(_.unpersist()) // vocab is materialized now; parent cache can go
      prev = None
      if (top.isEmpty) exhausted = true
      else {
        val (a, b, n) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((rank, a, b, n))
        val next = vocab
          .select(mergeUdf(col("syms"), lit(a), lit(b)).as("syms"), col("cnt"))
          .persist() // lazy — next round's argmax materializes it
        prev = Some(vocab)
        vocab = next
        rank += 1
      }
    }
    prev.foreach(_.unpersist())
    vocab.unpersist()
    import spark.implicits._
    merges.toSeq.toDF("rank", "left", "right", "pair_count")
  }

  /** Bigram-LM perplexity — the CCNet-style quality signal: train an
    * add-α-smoothed bigram language model ON the corpus itself and
    * score every document by exp(mean −ln p(w₂|w₁)). Repetitive or
    * template text scores LOW, token soup scores HIGH; threshold on
    * the score (or feed it to [[graft.operators.Sampling.curriculumBuckets]])
    * to filter or schedule.
    *
    * p(w₂|w₁) = (c(w₁w₂) + α) / (c(w₁) + α·V) with V = |vocabulary|.
    *
    * Distributed shape, 100 TB-first: per-document bigrams are
    * pre-aggregated to (doc, w₁, w₂, k) BEFORE joining (map-side
    * combine cuts the join input to distinct-bigrams-per-doc), the
    * count model (unigram + bigram tables, vocabulary-sized ≪ corpus)
    * joins on its keys, and the single scalar V rides a broadcast
    * cross join — no driver-side state. Documents with < 2 tokens
    * have no bigrams and yield no row (score is undefined there;
    * filter or coalesce downstream).
    * Output: (id, n_bigrams, perplexity) — perplexity rounded to 6
    * decimals (the ln/exp libm in Spark and an oracle engine agree far
    * beyond 1e-6; summation order differs at ~1e-13 relative).
    */
  def perplexityScore(docs: DataFrame, idCol: String, textCol: String,
      alpha: Double = 0.5): DataFrame = {
    require(alpha > 0, s"alpha must be positive: $alpha")
    val toks = docs.select(col(idCol), TextFunctions.words(col(textCol)).as("__w"))
    val bi = toks.select(col(idCol),
        explode(arrays_zip(
          slice(col("__w"), lit(1), size(col("__w")) - 1).as("w1"),
          slice(col("__w"), lit(2), size(col("__w")) - 1).as("w2"))).as("p"))
      .select(col(idCol), col("p.w1").as("w1"), col("p.w2").as("w2"))
    val uni = toks.select(explode(col("__w")).as("w1"))
      .groupBy(col("w1")).agg(count(lit(1)).as("cu"))
    val vocab = uni.agg(count(lit(1)).as("v"))
    val bigramCounts = bi.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cb"))
    val docBigrams = bi.groupBy(col(idCol), col("w1"), col("w2"))
      .agg(count(lit(1)).as("k"))
    docBigrams
      .join(bigramCounts, Seq("w1", "w2"))
      .join(uni, Seq("w1"))
      .crossJoin(broadcast(vocab))
      .withColumn("__nll", -log((col("cb") + lit(alpha)) /
        (col("cu").cast("double") + lit(alpha) * col("v"))))
      .groupBy(col(idCol))
      .agg(sum(col("k")).as("n_bigrams"),
        round(exp(sum(col("k") * col("__nll")) / sum(col("k"))), 6)
          .as("perplexity"))
  }

  /** CCNet-style head/middle/tail quality buckets: per language, rank
    * documents by LM perplexity and cut into terciles (lowest
    * perplexity = "head", the slice CCNet keeps by default). This exact
    * labeler uses ntile over (perplexity, id) — deterministic and
    * oracle-checkable, but a per-language window is one sort task per
    * language, so at corpus scale use [[pplBucketsByThreshold]]: the
    * same assignment from mergeable approx-percentile cut points (what
    * CCNet itself does — train cut points once, assign by comparison).
    */
  def pplBucketsExact(docs: DataFrame, idCol: String, textCol: String,
      langCol: String, alpha: Double = 0.5): DataFrame = {
    val ppl = perplexityScore(docs, idCol, textCol, alpha)
      .select(col(idCol), col("perplexity"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(langCol)).orderBy(col("perplexity"), col(idCol))
    docs.select(col(idCol), col(langCol)).join(ppl, Seq(idCol))
      .withColumn("__t", ntile(3).over(w))
      .select(col(idCol), col(langCol), col("perplexity"),
        when(col("__t") === 1, "head").when(col("__t") === 2, "middle")
          .otherwise("tail").as("bucket"))
  }

  /** Scale path for [[pplBucketsExact]]: per-language tercile cut
    * points from `percentile_approx` (a mergeable partial-aggregated
    * sketch — no per-language sort, no whale-language window task),
    * broadcast back (|languages| rows) and assigned by comparison.
    * Labels can differ from the exact ntile labeler only for docs whose
    * perplexity sits within the sketch's rank-error of a cut point;
    * PplBucketsSpec measures the agreement.
    */
  def pplBucketsByThreshold(docs: DataFrame, idCol: String, textCol: String,
      langCol: String, alpha: Double = 0.5, accuracy: Int = 10000): DataFrame = {
    val ppl = perplexityScore(docs, idCol, textCol, alpha)
      .select(col(idCol), col("perplexity"))
    val joined = docs.select(col(idCol), col(langCol)).join(ppl, Seq(idCol))
    val cuts = joined.groupBy(col(langCol))
      .agg(percentile_approx(col("perplexity"),
        array(lit(1.0 / 3), lit(2.0 / 3)), lit(accuracy)).as("__cuts"))
    joined.join(broadcast(cuts), Seq(langCol))
      .select(col(idCol), col(langCol), col("perplexity"),
        when(col("perplexity") <= col("__cuts").getItem(0), "head")
          .when(col("perplexity") <= col("__cuts").getItem(1), "middle")
          .otherwise("tail").as("bucket"))
  }

  /** Interpolated Kneser–Ney bigram perplexity — the smoothing family
    * KenLM implements and CCNet actually filters with (Heafield 2011;
    * Chen & Goodman 1999 eq. 4.27), vs [[perplexityScore]]'s add-alpha
    * baseline. Absolute-discount the observed bigram and back off to
    * the CONTINUATION unigram (how many distinct left-contexts a word
    * follows — "Francisco" is frequent but predictable, so it backs
    * off low):
    *
    *   p(w2|w1) = (c(w1,w2) − D)/c(w1·) + D·T(w1)/c(w1·) · N(·w2)/T
    *
    * with c(w1·) = Σ_x c(w1,x), T(w1) = |{x : c(w1,x)>0}|,
    * N(·w2) = |{x : c(x,w2)>0}|, T = total distinct bigram types.
    * Scored bigrams always have c ≥ 1 > D, so the max(·,0) clamp of
    * the general form never binds on the training corpus itself.
    *
    * Scale shape: ALL four model statistics derive from the one
    * partial-aggregated bigram-type count relation `bc` — c(w1·) and
    * T(w1) are a second map-side-combinable groupBy of `bc` on w1,
    * N(·w2) one on w2, T its count — so the corpus pays exactly one
    * full-width shuffle (bigram→count) regardless of model size, and
    * per-doc scoring joins on (w1,w2)/(w1)/(w2) keys that AQE
    * broadcasts when the vocabulary is small. No driver-side model
    * state; the LM "lives" as a distributed relation, which is what
    * lets the same code train on a 100 TB corpus where KenLM's
    * single-node trie cannot.
    *
    * Output: (id, n_bigrams, perplexity) with perplexity =
    * exp(mean −ln p) rounded to 6 dp (absorbs summation order).
    */
  def knPerplexityScore(docs: DataFrame, idCol: String, textCol: String,
      discount: Double = 0.75): DataFrame = {
    require(discount > 0 && discount < 1, s"discount must be in (0,1): $discount")
    // words hash to longs at tokenization (r19): every downstream
    // shuffle/join keys on 8-byte longs instead of word strings — the
    // output depends only on n-gram COUNTS, never on the words, so
    // this is the jaccardPairsPrefix trade (two distinct words
    // colliding merges their n-gram types; ≈2⁻⁶⁴ per pair)
    val toks = docs.select(col(idCol),
      transform(TextFunctions.words(col(textCol)), w => xxhash64(w)).as("__w"))
    val bi = toks.select(col(idCol),
        explode(arrays_zip(
          slice(col("__w"), lit(1), size(col("__w")) - 1).as("w1"),
          slice(col("__w"), lit(2), size(col("__w")) - 1).as("w2"))).as("p"))
      .select(col(idCol), col("p.w1").as("w1"), col("p.w2").as("w2"))
    // the one full-width shuffle: bigram type counts
    val bc = bi.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cb"))
    // left-context totals and continuation-type counts, derived from bc
    val left = bc.groupBy(col("w1"))
      .agg(sum(col("cb")).as("cw1"), count(lit(1)).as("tw1"))
    val cont = bc.groupBy(col("w2")).agg(count(lit(1)).as("nw2"))
    val types = bc.agg(count(lit(1)).as("t"))
    val docBigrams = bi.groupBy(col(idCol), col("w1"), col("w2"))
      .agg(count(lit(1)).as("k"))
    docBigrams
      .join(bc, Seq("w1", "w2"))
      .join(left, Seq("w1"))
      .join(cont, Seq("w2"))
      .crossJoin(broadcast(types))
      .withColumn("__nll", -log(
        (col("cb") - lit(discount)) / col("cw1") +
        lit(discount) * col("tw1") / col("cw1") *
          (col("nw2") / col("t").cast("double"))))
      .groupBy(col(idCol))
      .agg(sum(col("k")).as("n_bigrams"),
        round(exp(sum(col("k") * col("__nll")) / sum(col("k"))), 6)
          .as("perplexity"))
  }

  /** Interpolated Kneser–Ney TRIGRAM perplexity — the order-3 model
    * production quality filters actually ship (CCNet's KenLM models
    * are order ≥ 3). Full three-level interpolation (Chen & Goodman
    * 1999): absolute-discount the trigram, back off to the
    * CONTINUATION bigram (counts of distinct left contexts, not raw
    * counts), then to the continuation unigram:
    *
    *   p3(w3|w1w2) = (c(w1w2w3)−D)/c(w1w2·) + D·T(w1w2)/c(w1w2·)·p2c
    *   p2c(w3|w2)  = (N(·w2w3)−D)/N(·w2·) + D·T2(w2)/N(·w2·)·p1c
    *   p1c(w3)     = N(·w3)/|bigram types|
    *
    * with N(·w2w3) = distinct w1 preceding (w2,w3) in trigram types,
    * N(·w2·) = trigram types with middle w2, T2(w2) = distinct w3
    * after w2 in trigram types, N(·w3) = distinct predecessors in
    * bigram types. Each level hands its discount mass down, so every
    * context's distribution sums to exactly 1 (spec-pinned at both
    * levels). Scored trigrams have c ≥ 1 > D — the clamp never binds
    * on training data.
    *
    * Scale shape: the corpus pays TWO full-width shuffles (trigram and
    * bigram type counts — the bigram relation exists only for the
    * unigram continuation level); all five model statistics are
    * map-side-combinable second aggregates of those two relations, and
    * every scoring join's stats side carries one row per key. Same
    * whale-free shape the `knppl` probe measured for the bigram model.
    *
    * Output: (id, n_trigrams, perplexity) — docs with < 3 words have
    * no trigram and no row; perplexity = exp(mean −ln p3), 6 dp.
    */
  def knTrigramPerplexityScore(docs: DataFrame, idCol: String,
      textCol: String, discount: Double = 0.75): DataFrame = {
    require(discount > 0 && discount < 1, s"discount must be in (0,1): $discount")
    // hashed-word keys — see [[knPerplexityScore]] (r19): counts-only
    // output, long keys through both full-width shuffles and all six
    // scoring joins
    val toks = docs.select(col(idCol),
      transform(TextFunctions.words(col(textCol)), w => xxhash64(w)).as("__w"))
    // greatest(.., 0): a 1-2 word doc must yield an empty slice, not a
    // negative-length slice error
    val triLen = greatest(size(col("__w")) - 2, lit(0))
    val tri = toks.select(col(idCol),
        explode(arrays_zip(
          slice(col("__w"), lit(1), triLen).as("w1"),
          slice(col("__w"), lit(2), triLen).as("w2"),
          slice(col("__w"), lit(3), triLen).as("w3"))).as("p"))
      .select(col(idCol), col("p.w1").as("w1"), col("p.w2").as("w2"),
        col("p.w3").as("w3"))
    val bi = toks.select(
        explode(arrays_zip(
          slice(col("__w"), lit(1), size(col("__w")) - 1).as("w1"),
          slice(col("__w"), lit(2), size(col("__w")) - 1).as("w2"))).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
    // the two full-width shuffles: trigram + bigram type counts
    val tc = tri.groupBy(col("w1"), col("w2"), col("w3"))
      .agg(count(lit(1)).as("c3"))
    val bcB = bi.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cb"))
    // trigram-level stats
    val l2 = tc.groupBy(col("w1"), col("w2"))
      .agg(sum(col("c3")).as("cw12"), count(lit(1)).as("tw12"))
    // continuation-bigram stats (distinct left contexts of (w2,w3))
    val mid = tc.groupBy(col("w2"), col("w3")).agg(count(lit(1)).as("n12"))
    val midl = mid.groupBy(col("w2"))
      .agg(sum(col("n12")).as("nmid"), count(lit(1)).as("t2"))
    // continuation-unigram stats from bigram types
    val cont = bcB.groupBy(col("w2")).agg(count(lit(1)).as("nw3"))
      .withColumnRenamed("w2", "w3")
    val types = bcB.agg(count(lit(1)).as("t"))
    val docTri = tri.groupBy(col(idCol), col("w1"), col("w2"), col("w3"))
      .agg(count(lit(1)).as("k"))
    docTri
      .join(tc, Seq("w1", "w2", "w3"))
      .join(l2, Seq("w1", "w2"))
      .join(mid, Seq("w2", "w3"))
      .join(midl, Seq("w2"))
      .join(cont, Seq("w3"))
      .crossJoin(broadcast(types))
      .withColumn("__p2c",
        (col("n12") - lit(discount)) / col("nmid") +
        lit(discount) * col("t2") / col("nmid") *
          (col("nw3") / col("t").cast("double")))
      .withColumn("__nll", -log(
        (col("c3") - lit(discount)) / col("cw12") +
        lit(discount) * col("tw12") / col("cw12") * col("__p2c")))
      .groupBy(col(idCol))
      .agg(sum(col("k")).as("n_trigrams"),
        round(exp(sum(col("k") * col("__nll")) / sum(col("k"))), 6)
          .as("perplexity"))
  }

  /** BM25 (Okapi, Lucene idf form) top-k retrieval of documents for a
    * literal query-term set — the seed-set selection primitive of a
    * curation pipeline ("find the k corpus docs most like these
    * terms"). Scale shape: document length and the corpus-size/avgdl
    * scalars come from ONE exact integer aggregate over a narrow
    * projection (sum/count of per-doc token counts — no float
    * accumulation), term frequencies from an explode filtered to the
    * query terms (postings for non-query terms never shuffle), df per
    * term from the tf relation itself, and the final global top-k is
    * an orderBy+limit that Spark executes as TakeOrdered (per-partition
    * heap + driver merge of k rows, never a full sort shuffle).
    * idf = ln(1 + (N − df + 0.5)/(df + 0.5)) ≥ 0, so scores are
    * monotone in tf; docs containing no query term score nothing and
    * are absent. Output: (id, score) — score rounded to 6 dp, ordered
    * by (score desc, id), limited to k rows. Ties order on the ROUNDED
    * score then id, so the selected set is reproducible bit-for-bit.
    */
  /** Inverted-index postings emission — the INDEX-BUILD side of
    * [[bm25TopK]]'s query side. Per (term, doc) one posting with
    *   tf      term frequency in the doc,
    *   gap     the d-gap (doc_id − previous posting's doc_id within
    *           the term, ordered by doc_id; the first posting's gap is
    *           the doc id itself — the standard delta layout every
    *           posting-list codec compresses),
    *   vbytes  the posting's varint cost ⌈bitlen(gap)/7⌉, with bitlen
    *           = length(bin(gap)) — `bin` renders without leading
    *           zeros in Spark and DuckDB alike, and bin(0)='0' makes
    *           the doc_id-0 first posting cost 1 byte with no special
    *           case,
    * plus per-term df. This is what a shard planner sums to pack terms
    * into index segments of equal byte budget. Shape: one shuffle to
    * (term, doc) for tf, then windows partitioned BY TERM — the
    * vocabulary distributes, no global sort anywhere; a stop-word's
    * posting list is one partition's window (the df head is bounded by
    * |docs|, the same bound the relation itself has).
    */
  def postingsLayout(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("term")).orderBy(col("doc_id"))
    docs.select(col(idCol).as("doc_id"),
        explode(TextFunctions.words(col(textCol))).as("term"))
      .groupBy(col("term"), col("doc_id"))
      .agg(count(lit(1)).as("tf"))
      .withColumn("gap",
        col("doc_id") - coalesce(lag(col("doc_id"), 1).over(w), lit(0L)))
      .withColumn("vbytes",
        floor((length(bin(col("gap"))) + lit(6)) / lit(7)).cast("long"))
      .withColumn("df", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("term"))))
  }

  /** The per-term CODEC DECISION wired into the index build — the
    * Lucene-style pick between the two layouts
    * `text_postings_codec` only COMPARED until round 15: per term,
    * exact byte accounting for (a) varint d-gaps and (b) 128-gap
    * frame-of-reference blocks (one width byte + n gaps at the
    * block's max bit width — the PFoR family's unpatched baseline),
    * then `codec` = the smaller and `stored_bytes` = its cost. FoR
    * wins on uniform gap runs (dense stop-word lists), varint wins
    * when one outlier gap would widen a whole block. Shape: rides
    * [[postingsLayout]] — term-partitioned windows, the vocabulary
    * distributes, no global sort; the decision itself is one
    * partial-aggregable rollup per term. Output: (term, df,
    * varint_bytes, for_bytes, codec, stored_bytes).
    */
  def postingsCodecPick(docs: DataFrame, idCol: String, textCol: String,
      blockSize: Int = 128): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("term")).orderBy(col("doc_id"))
    val blocks = postingsLayout(docs, idCol, textCol)
      .withColumn("blk",
        ((row_number().over(w) - 1) / blockSize).cast("long"))
      .withColumn("bits", length(bin(col("gap"))))
    val forBytes = blocks.groupBy(col("term"), col("blk"))
      .agg(count(lit(1)).as("n"), max(col("bits")).as("b"))
      .withColumn("blk_bytes",
        lit(1L) + floor((col("n") * col("b") + lit(7)) / lit(8))
          .cast("long"))
      .groupBy(col("term"))
      .agg(sum(col("blk_bytes")).as("for_bytes"))
    blocks.groupBy(col("term"))
      .agg(count(lit(1)).as("df"), sum(col("vbytes")).as("varint_bytes"))
      .join(forBytes, Seq("term"))
      .withColumn("codec",
        when(col("for_bytes") < col("varint_bytes"), lit("for"))
          .otherwise(lit("varint")))
      .withColumn("stored_bytes",
        least(col("for_bytes"), col("varint_bytes")))
  }

  /** PATCHED frame-of-reference — the codec the round-15 record named
    * as the open candidate ("true PFoR/Simple-8b stay candidates"):
    * per 128-gap block, instead of widening every slot to the max bit
    * width (the [[postingsCodecPick]] FoR baseline), choose the width
    * `b` that MINIMIZES total cost when out-of-range gaps become
    * exceptions — the NewPFD decision (Yan, Ding & Suel 2009,
    * "Inverted index compression and query processing with optimized
    * document ordering"). Cost model, exactly accounted per block:
    * `1 (width byte) + ⌈n·b/8⌉ (packed slots) + Σ_exceptions
    * (varint(gap) + 1 position byte)`. The width search is
    * RELATIONAL, not sequential: a per-(block, bitlen) histogram
    * (≤ 64 rows per block) joins the candidate widths on
    * `bits > b`, and the block's cost is a one-row min — no
    * mapPartitions, no per-list state, so the vocabulary distributes
    * exactly like [[postingsLayout]]. The candidate set is
    * 1..`maxWidth` PLUS the block's own max bit-length whenever that
    * exceeds `maxWidth` (r17 ADVICE fix: gaps from 64-bit doc ids can
    * need up to 63 bits, and without the block's max-bits candidate
    * the zero-exception fallback was missing from the search, letting
    * pfor_bytes exceed for_bytes on such blocks). With it,
    * pfor ≤ for holds by construction for EVERY gap distribution
    * (b = max-bits has zero exceptions and matches FoR's cost), so
    * the three-way pick keeps the prior tie rules: pfor only when
    * STRICTLY smaller than both (a patched decode costs more CPU than
    * plain FoR at equal bytes), else the [[postingsCodecPick]] rule.
    * Output: (term, df, varint_bytes, for_bytes, pfor_bytes, codec,
    * stored_bytes).
    */
  def postingsCodecPfor(docs: DataFrame, idCol: String, textCol: String,
      blockSize: Int = 128, maxWidth: Int = 32): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("term")).orderBy(col("doc_id"))
    val blocks = postingsLayout(docs, idCol, textCol)
      .withColumn("blk",
        ((row_number().over(w) - 1) / blockSize).cast("long"))
      .withColumn("bits", length(bin(col("gap"))))
    val bn = blocks.groupBy(col("term"), col("blk"))
      .agg(count(lit(1)).as("n"), max(col("bits")).as("mb"))
    // per-(block, bitlen) exception cost bucket: a gap of `bits` > b
    // patches out at varint bytes + one position byte
    val hist = blocks.groupBy(col("term"), col("blk"), col("bits"))
      .agg((count(lit(1)) + sum(col("vbytes"))).as("exb"))
    // candidate widths 1..maxWidth, plus the block's own max
    // bit-length when it exceeds maxWidth — the zero-exception width
    // that guarantees pfor <= for on >maxWidth-bit gaps (see scaladoc)
    val widths = bn.withColumn("b",
      explode(when(col("mb") > maxWidth,
          concat(sequence(lit(1), lit(maxWidth)), array(col("mb"))))
        .otherwise(sequence(lit(1), lit(maxWidth)))))
      .drop("mb")
    val exc = widths.select(col("term"), col("blk"), col("b"))
      .join(hist, Seq("term", "blk"))
      .filter(col("bits") > col("b"))
      .groupBy(col("term"), col("blk"), col("b"))
      .agg(sum(col("exb")).as("excb"))
    val pfor = widths.join(exc, Seq("term", "blk", "b"), "left")
      .withColumn("cost", lit(1L) +
        floor((col("n") * col("b") + lit(7)) / lit(8)).cast("long") +
        coalesce(col("excb"), lit(0L)))
      .groupBy(col("term"), col("blk"))
      .agg(min(col("cost")).as("pblk"))
      .groupBy(col("term"))
      .agg(sum(col("pblk")).as("pfor_bytes"))
    postingsCodecPick(docs, idCol, textCol, blockSize)
      .drop("codec", "stored_bytes")
      .join(pfor, Seq("term"))
      .withColumn("codec",
        when(col("pfor_bytes") <
            least(col("for_bytes"), col("varint_bytes")), lit("pfor"))
          .when(col("for_bytes") < col("varint_bytes"), lit("for"))
          .otherwise(lit("varint")))
      .withColumn("stored_bytes", least(col("varint_bytes"),
        col("for_bytes"), col("pfor_bytes")))
  }

  /** Positional postings — the phrase-query side of [[postingsLayout]]
    * (the Lucene `.prx` analogue): per (term, doc) the term's token
    * positions as their OWN delta chain with varint accounting.
    * Output: (term, doc_id, tf, pos_bytes) where pos_bytes =
    * Σ ⌈bitlen(posgap)/7⌉ over the term's positions in the doc (first
    * gap = the position itself, 0-based — bin(0)='0' costs 1 byte with
    * no special case). Together with [[postingsLayout]]'s doc-gap
    * bytes this is the full index-size estimator a capacity plan
    * needs. Shape: the window partitions by (term, doc) — strictly
    * finer than the term partitioning, so not even a stop-word's
    * postings serialize into one task here.
    */
  def positionalPostings(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("term"), col("doc_id")).orderBy(col("pos"))
    docs.select(col(idCol).as("doc_id"),
        posexplode(TextFunctions.words(col(textCol))).as(Seq("pos", "term")))
      .withColumn("gap", col("pos").cast("long")
        - coalesce(lag(col("pos"), 1).over(w).cast("long"), lit(0L)))
      .withColumn("__vb",
        floor((length(bin(col("gap"))) + lit(6)) / lit(7)).cast("long"))
      .groupBy(col("term"), col("doc_id"))
      .agg(count(lit(1)).as("tf"), sum(col("__vb")).as("pos_bytes"))
  }

  /** IMPACT-ORDERED postings (Anh & Moffat 2006) — the storage layout
    * that lets a query engine early-terminate: within each term,
    * postings sort by a QUANTIZED score upper bound (the BM25 tf
    * saturation WITHOUT idf — idf is constant within a term, so the
    * within-term order is unchanged by dropping it), highest impact
    * first, truncated to `topPerTerm`. Serving the first block of an
    * impact-ordered list IS the MaxScore/WAND skip structure
    * materialized ([[bm25TopKPruned]] computes the same bound at query
    * time; this bakes it into the index). Quantization: impact =
    * ⌊scale · tf/(tf + k1·((1−b) + b·dl/avgdl))⌋ — exact integer
    * counts into identical double expressions, so both engines land
    * the same buckets (the text_bm25 bit-exactness discipline).
    * Windows partition BY TERM; Catalyst rewrites rank ≤ n to
    * WindowGroupLimit, so a stop-word's postings prune map-side
    * before the term shuffle (the doc_host_cap shape).
    */
  def impactOrderedPostings(docs: DataFrame, idCol: String,
      textCol: String, k1: Double = 1.2, b: Double = 0.75,
      scale: Int = 32, topPerTerm: Int = 8): DataFrame = {
    val toks = docs.select(col(idCol), TextFunctions.words(col(textCol)).as("__w"))
    val dl = toks.select(col(idCol), size(col("__w")).as("dl"))
    val corpus = dl.agg(count(lit(1)).as("n"), sum(col("dl")).as("tot"))
    val tf = toks.select(col(idCol), explode(col("__w")).as("term"))
      .groupBy(col("term"), col(idCol)).agg(count(lit(1)).as("tf"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("term"))
      .orderBy(col("impact").desc, col("tf").desc, col(idCol))
    tf.join(dl, Seq(idCol))
      .crossJoin(broadcast(corpus))
      .withColumn("impact",
        floor(lit(scale.toDouble) * col("tf") /
          (col("tf") + lit(k1) * (lit(1.0 - b) +
            lit(b) * col("dl") / (col("tot").cast("double") / col("n"))))))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= topPerTerm)
      .select(col("term"), col("rk"), col(idCol), col("tf"), col("impact"))
  }

  /** Exact phrase matching over token positions — the query-side
    * consumer [[positionalPostings]] exists to serve: a document
    * matches where the phrase's terms occupy strictly consecutive
    * positions. Relational document-at-a-time: one position relation
    * per phrase term, each equi-joined on (doc, aligned start
    * position) — join i moves ONLY term i's postings, never the
    * corpus, which is the positional index's point (the rarest term
    * bounds the work; a planner would reorder the folds by df).
    * Matches count OVERLAPPING occurrences (standard positional-index
    * semantics: "a a a" contains "a a" twice). Output:
    * (doc_id, n_matches), matching docs only.
    */
  def phraseMatches(docs: DataFrame, idCol: String, textCol: String,
      phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phrase must be non-empty")
    val tp = docs.select(col(idCol).as("doc_id"),
      posexplode(TextFunctions.words(col(textCol))).as(Seq("pos", "term")))
    val first = tp.filter(col("term") === phrase.head)
      .select(col("doc_id"), col("pos").as("p0"))
    val aligned = phrase.zipWithIndex.tail.foldLeft(first) {
      case (acc, (w, i)) =>
        acc.join(tp.filter(col("term") === w)
            .select(col("doc_id"), (col("pos") - i).as("p0")),
          Seq("doc_id", "p0"))
    }
    aligned.groupBy(col("doc_id")).agg(count(lit(1)).as("n_matches"))
  }

  /** Per-doc posting churn over a FETCH SEQUENCE — the batch twin of
    * [[postingsChurnStateful]]: each fetch of a document diffs against
    * the SAME document's previous fetch (ordered by `tsCol`; fetches
    * sharing a timestamp are one fetch), emitting `added` terms (in
    * this fetch, not the previous — a doc's first fetch adds
    * everything) and `removed` terms (in the previous, gone now —
    * visible the moment the changed page arrives, which the
    * end-of-crawl batch [[postingsDiff]] cannot do). All windows
    * partition by doc; the anti-joins move (doc, seq, term) keys only.
    * Output: (doc_id, seq, term, status).
    */
  def postingsChurn(fetches: DataFrame, idCol: String, textCol: String,
      tsCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("__ts"))
    val t = fetches.select(col(idCol).as("doc_id"), col(tsCol).as("__ts"),
        explode(array_distinct(TextFunctions.words(col(textCol))))
          .as("term"))
      .withColumn("seq", dense_rank().over(w))
      .select(col("doc_id"), col("seq"), col("term"))
    val prevShifted = t.select(col("doc_id"),
      (col("seq") + 1).as("seq"), col("term"))
    val added = t.join(prevShifted, Seq("doc_id", "seq", "term"), "left_anti")
      .withColumn("status", lit("added"))
    val fetchSeqs = t.select(col("doc_id"), col("seq")).distinct()
    val removed = prevShifted
      .join(fetchSeqs, Seq("doc_id", "seq")) // a successor fetch exists
      .join(t, Seq("doc_id", "seq", "term"), "left_anti")
      .withColumn("status", lit("removed"))
    added.unionByName(removed)
  }

  /** The KEYED-STATE streaming form of the index-update feed — the
    * honest full-web shape the broadcast probe demanded (BASELINE r14:
    * forcing ~100M previous-snapshot keys through a broadcast dies on
    * driver maxResultSize): per-doc indexed term sets live in the
    * STATE STORE, each arriving fetch diffs against its own doc's
    * state — no broadcast, no static side, and `removed` postings are
    * emitted the moment a changed page arrives. State per doc is its
    * distinct term set (store the 8-byte hashes instead of strings at
    * web scale — swap the select; the feed semantics are unchanged).
    * Event-time timeout evicts docs not re-fetched within
    * `stateTtlMinutes` (a doc re-fetched after eviction re-adds
    * everything — the watermark-bounded contract every streaming
    * stateful operator makes). `fetches` must carry the watermarked
    * event-time column `tsCol`. Output ≡ [[postingsChurn]] on the
    * same fetch log (spec-pinned).
    */
  def postingsChurnStateful(fetches: DataFrame, idCol: String,
      textCol: String, tsCol: String,
      stateTtlMinutes: Int = 1440): org.apache.spark.sql.Dataset[ChurnRow] = {
    import fetches.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val ttlMs = stateTtlMinutes.toLong * 60 * 1000

    def update(key: Long, rows: Iterator[ChurnFetch],
        state: GroupState[ChurnState]): Iterator[ChurnRow] = {
      if (state.hasTimedOut) { state.remove(); Iterator.empty }
      else {
        val arrived = rows.toArray.sortBy(_.ts_us)
        var cur: Set[String] =
          state.getOption.map(_.terms.toSet).getOrElse(Set.empty)
        val out = List.newBuilder[ChurnRow]
        arrived.foreach { f =>
          val next = f.terms.toSet
          (next -- cur).toSeq.sorted
            .foreach(t => out += ChurnRow(t, key, f.ts_us, "added"))
          (cur -- next).toSeq.sorted
            .foreach(t => out += ChurnRow(t, key, f.ts_us, "removed"))
          cur = next
        }
        state.update(ChurnState(cur.toSeq))
        val newest = arrived.map(_.ts_us).max
        state.setTimeoutTimestamp(
          math.max(newest / 1000 + ttlMs, state.getCurrentWatermarkMs() + 1))
        out.result().iterator
      }
    }

    fetches.select(col(idCol).as("doc_id"),
        unix_micros(col(tsCol)).as("ts_us"),
        array_distinct(TextFunctions.words(col(textCol))).as("terms"),
        col(tsCol).as("ts"))
      .as[ChurnFetch]
      .groupByKey(_.doc_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(update)
  }

  /** Posting-level diff between two corpus snapshots — the UPDATE
    * BUDGET an incremental indexer applies after a re-crawl: per
    * (term, doc_id) `added` (the posting exists only in the new
    * snapshot) or `removed` (only in the old); unchanged postings
    * never leave the join (inner-matched rows drop immediately).
    * Both sides reduce to DISTINCT (term, doc_id) before the
    * full-outer equi-join — the [[CrawlPipeline.crawlDiff]] byte
    * discipline at term granularity: document text never crosses the
    * shuffle twice, and the join moves exactly one row per posting.
    */
  def postingsDiff(oldDocs: DataFrame, newDocs: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    def termDocs(d: DataFrame, marker: String) = d
      .select(col(idCol).as("doc_id"),
        explode(TextFunctions.words(col(textCol))).as("term"))
      .distinct()
      .withColumn(marker, lit(1))
    termDocs(oldDocs, "__old")
      .join(termDocs(newDocs, "__new"), Seq("term", "doc_id"), "full_outer")
      .filter(col("__old").isNull || col("__new").isNull)
      .withColumn("status",
        when(col("__old").isNull, lit("added")).otherwise(lit("removed")))
      .select(col("term"), col("doc_id"), col("status"))
  }

  /** [[postingsDiff]]'s ADDED side, LIVE — the per-fetch index-update
    * feed: each arriving document's distinct terms anti-join the
    * previous snapshot's broadcast (doc_id, term) relation; survivors
    * are postings the indexer must add NOW. Stateless append mode —
    * per-doc distinct is `array_distinct` BEFORE the explode (a
    * per-row map, no dedup state), and a doc re-fetched twice in one
    * stream is judged per fetch (live semantics, the
    * [[CrawlPipeline.crawlDiffStream]] contract). `removed` is
    * inherently an end-of-crawl verdict and stays with the batch
    * [[postingsDiff]].
    *
    * Scale honesty: broadcasting the static side gives the
    * low-latency live shape — (term, doc) KEYS of the previous
    * snapshot ship once to every executor — but a full-web posting
    * set does NOT broadcast. MEASURED, not hypothetical: at the sf100
    * scale corpus (~100M postings) the forced broadcast dies on
    * spark.driver.maxResultSize (BASELINE r14 row). So since round 15
    * the default is the sign-LSH auto-switch discipline
    * ([[Dedup.embeddingNearDupPairsSignLsh]]): one narrow `count()`
    * of the snapshot picks broadcast iff it holds ≤ `maxBroadcastRows`
    * keys (4M rows ≈ 160 MB of (long, term) keys — an order under the
    * default 1g maxResultSize). Past the bound the anti-join goes to
    * the planner (the static side shuffles per micro-batch — higher
    * latency, no driver bound; same rows, spec-pinned). Pin
    * `broadcastOld = Some(true/false)` only to reproduce a specific
    * plan. The honest full-web streaming form keys a state store
    * ([[postingsChurnStateful]]) or falls back to the batch
    * [[postingsDiff]] per crawl. Identical expression runs on a batch
    * frame (stream ≡ batch spec-pinned).
    */
  def postingsDiffStream(newDocs: DataFrame, oldPostings: DataFrame,
      idCol: String, textCol: String,
      broadcastOld: Option[Boolean] = None,
      maxBroadcastRows: Long = 4000000L): DataFrame = {
    val old = oldPostings.select(col("doc_id"), col("term"))
    // the auto count() is one narrow scan of the STATIC side, paid once
    // at plan time — never per micro-batch
    val doBroadcast = broadcastOld.getOrElse(old.count() <= maxBroadcastRows)
    newDocs.select(col(idCol).as("doc_id"),
        explode(array_distinct(TextFunctions.words(col(textCol))))
          .as("term"))
      .join(if (doBroadcast) broadcast(old) else old,
        Seq("doc_id", "term"), "left_anti")
      .select(col("term"), col("doc_id"), lit("added").as("status"))
  }

  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k: Int = 10,
      k1: Double = 1.2, b: Double = 0.75): DataFrame =
    bm25Contribs(docs, idCol, textCol, queryTerms, k1, b)
      .groupBy(col(idCol))
      .agg(round(sum(col("__contrib")), 6).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)

  /** The per-(doc, query-term) BM25 contribution relation both
    * [[bm25TopK]] and [[bm25TopKPruned]] aggregate — factored so the
    * pruned form provably scores with the identical expression.
    */
  private def bm25Contribs(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k1: Double, b: Double): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    val toks = docs.select(col(idCol), TextFunctions.words(col(textCol)).as("__w"))
    val dl = toks.select(col(idCol), size(col("__w")).as("dl"))
    // one exact-integer aggregate: corpus size and total token count
    val corpus = dl.agg(count(lit(1)).as("n"), sum(col("dl")).as("tot"))
    val tf = toks.select(col(idCol), explode(col("__w")).as("t"))
      .filter(col("t").isin(queryTerms: _*))
      .groupBy(col(idCol), col("t")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("t")).agg(count(lit(1)).as("df"))
    tf.join(broadcast(dfreq), Seq("t"))
      .join(dl, Seq(idCol))
      .crossJoin(broadcast(corpus))
      .withColumn("__idf",
        log(lit(1.0) + (col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
      .withColumn("__contrib",
        col("__idf") * col("tf") * lit(k1 + 1.0) /
          (col("tf") + lit(k1) * (lit(1.0 - b) +
            lit(b) * col("dl") / (col("tot").cast("double") / col("n")))))
  }

  /** [[bm25TopK]] with MaxScore-style pruning (Turtle & Flood 1995) —
    * EXACT: returns precisely bm25TopK's rows (same rounding and tie
    * rules; the catalog query shares the full-scan oracle, so equality
    * is the checked claim). The MaxScore argument, relationally:
    *
    *   1. per-term upper bounds: ub(t) = max contribution over the
    *      term's postings (|queryTerms| rows — a driver-tiny collect);
    *   2. θ₀ = the k-th best FULL score among docs containing the
    *      highest-ub term (a candidate set that provably holds ≥ k
    *      docs scoring ≥ θ₀, or everything if fewer than k exist);
    *   3. essential terms: sort terms by ub descending and keep the
    *      minimal prefix whose complement's ub sum < θ₀ − 1e-6; a doc
    *      containing ONLY non-essential terms scores below every
    *      θ₀-class doc even after round(,6) (the 1e-6 margin covers
    *      the half-ulp each side of the rounding), so it cannot enter
    *      the top-k under the (rounded score desc, id) order;
    *   4. score ONLY docs containing ≥ 1 essential term, over ALL
    *      their query-term contributions.
    *
    * Shape honesty: the contrib pass still touches every query-term
    * posting — that is where the tight bounds come from, and a batch
    * scan pays it either way. What the essential semi-join prunes is
    * everything DOWNSTREAM: on a stop-word + rare-term query the
    * per-doc aggregation and the top-k see the rare term's postings,
    * not the stop-word's millions. A document-at-a-time WAND that also
    * skips posting-scan work needs ordered index traversal — the
    * storage engine's job ([[postingsLayout]] is that layout), not the
    * batch plan's.
    */
  def bm25TopKPruned(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k: Int = 10,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val scored = bm25Contribs(docs, idCol, textCol, queryTerms, k1, b)
      .select(col(idCol), col("t"), col("__contrib"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ubs = scored.groupBy(col("t")).agg(max(col("__contrib")).as("ub"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val essential: Seq[String] =
      if (ubs.isEmpty) Seq.empty
      else {
        val tStar = ubs.maxBy(_._2)._1
        val cand0 = scored.filter(col("t") === tStar).select(col(idCol))
        val kth = scored.join(cand0, Seq(idCol), "left_semi")
          .groupBy(col(idCol)).agg(sum(col("__contrib")).as("__s"))
          .orderBy(col("__s").desc).limit(k)
          .collect().map(_.getDouble(1))
        if (kth.length < k) ubs.keys.toSeq // < k candidates: no pruning
        else {
          val theta = kth.last - 1e-6
          // drop the maximal low-ub SUFFIX whose ub sum stays below θ:
          // term i is non-essential iff Σ ub(i..end) < θ — the sum
          // INCLUDING i (a doc made only of suffix terms can hold all
          // of them), so the bound uses scanRight's inclusive sums
          val byUbDesc = ubs.toSeq.sortBy(-_._2)
          val suffixIncl = byUbDesc.scanRight(0.0)(_._2 + _).init
          byUbDesc.zip(suffixIncl)
            .filter { case (_, sumFromHere) => sumFromHere >= theta }
            .map(_._1._1)
        }
      }
    val keep =
      if (essential.isEmpty || essential.size == ubs.size) scored
      else scored.join(
        scored.filter(col("t").isin(essential: _*))
          .select(col(idCol)).distinct(),
        Seq(idCol), "left_semi")
    keep.groupBy(col(idCol))
      .agg(round(sum(col("__contrib")), 6).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** Fielded ("BM25F", Robertson et al. 2004, simple form) top-k
    * retrieval — the classic two-field web ranking: what a page SAYS
    * (body) weighted against what the web says ABOUT it (anchor
    * text). Each field's term frequency is length-normalized by that
    * FIELD's own average length, scaled by the field weight, and the
    * weighted pseudo-tf saturates ONCE:
    *
    *   x(t,d) = Σ_f w_f · tf_f / ((1−b) + b·len_f(d)/avglen_f)
    *   score(d) = Σ_t idf(t) · x·(k1+1)/(k1 + x)
    *
    * so a term hit in a short high-weight anchor profile outranks the
    * same hit diluted in a long body — the behavior per-field-BM25-
    * then-add gets wrong (it saturates each field separately). idf
    * counts docs containing the term in ANY field. With one field of
    * weight 1 this reduces algebraically to [[bm25TopK]]'s formula
    * (spec-pinned to 1e-9).
    *
    * Scale shape: same as [[bm25TopK]] per field — postings explode
    * filtered to the query terms, per-field length scalars from one
    * exact integer aggregate each, df/corpus-size broadcast; the
    * per-(doc, term) field pivot is a max-of-when over the tagged
    * union (each (doc, field, term) row lands in exactly one slot, so
    * the pseudo-tf sums in DECLARED field order — deterministic
    * doubles at any field count); global top-k is TakeOrdered on the
    * rounded score.
    */
  def bm25FieldedTopK(docs: DataFrame, idCol: String,
      fields: Seq[(String, Double)], queryTerms: Seq[String], k: Int = 10,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(fields.nonEmpty, "fields must be non-empty")
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    val tokenized = fields.zipWithIndex.map { case ((c, _), i) =>
      docs.select(col(idCol), lit(i).as("__f"),
        TextFunctions.words(col(c)).as("__w"))
    }.reduce(_ unionByName _)
    val dl = tokenized.select(col(idCol), col("__f"), size(col("__w")).as("__dl"))
    // one exact-integer aggregate PER FIELD: corpus size + token total
    val stats = dl.groupBy(col("__f"))
      .agg(count(lit(1)).as("__n"), sum(col("__dl")).as("__tot"))
    val tf = tokenized
      .select(col(idCol), col("__f"), explode(col("__w")).as("__t"))
      .filter(col("__t").isin(queryTerms: _*))
      .groupBy(col(idCol), col("__f"), col("__t")).agg(count(lit(1)).as("__tf"))
    val dfreq = tf.select(col(idCol), col("__t")).distinct()
      .groupBy(col("__t")).agg(count(lit(1)).as("__df"))
    val weight = coalesce(fields.zipWithIndex.map { case ((_, w), i) =>
      when(col("__f") === i, lit(w)) }: _*)
    val wtf = tf.join(dl, Seq(idCol, "__f"))
      .join(broadcast(stats), Seq("__f"))
      .withColumn("__wtf",
        weight * col("__tf") / (lit(1.0 - b) +
          lit(b) * col("__dl") / (col("__tot").cast("double") / col("__n"))))
    val slots = fields.indices.map(i =>
      max(when(col("__f") === i, col("__wtf"))).as(s"__x$i"))
    val byTerm = wtf.groupBy(col(idCol), col("__t"))
      .agg(slots.head, slots.tail: _*)
    val x = fields.indices.map(i => coalesce(col(s"__x$i"), lit(0.0)))
      .reduce(_ + _)
    byTerm
      .join(broadcast(dfreq), Seq("__t"))
      .crossJoin(broadcast(stats.filter(col("__f") === 0)
        .select(col("__n").as("__nd"))))
      .withColumn("__x", x)
      .withColumn("__contrib",
        log(lit(1.0) + (col("__nd") - col("__df") + lit(0.5)) /
            (col("__df") + lit(0.5))) *
          col("__x") * lit(k1 + 1.0) / (lit(k1) + col("__x")))
      .groupBy(col(idCol))
      .agg(round(sum(col("__contrib")), 6).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** Apply a learned BPE merge list ([[bpeTrainMerges]] output order):
    * each word starts as characters and replays the merges in rank
    * order — the standard greedy left-to-right application. One narrow
    * map, so encoding runs inline with the ingest scan at any corpus
    * size. The merge list IS the tokenizer and rides a REAL
    * `sparkContext.broadcast` (not closure capture): a production
    * vocabulary is ~50k merges, and a broadcast ships it to each
    * executor once instead of re-serializing it with every task —
    * see BpeEncodeSpec's 5k-merge replay for the flat-cost check.
    * Output: (id, tokens array<string>, n_tokens).
    */
  def bpeEncode(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val bcMerges = docs.sparkSession.sparkContext.broadcast(merges.toArray)
    val encodeUdf = udf((text: String) => {
      if (text == null) null
      else text.split(" ", -1).filter(_.nonEmpty).flatMap { w =>
        var syms: Array[String] = w.split("")
        bcMerges.value.foreach { case (a, b) =>
          if (syms.length > 1) {
            val out = scala.collection.mutable.ArrayBuffer.empty[String]
            var i = 0
            while (i < syms.length) {
              if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
                out += a + b; i += 2
              } else { out += syms(i); i += 1 }
            }
            syms = out.toArray
          }
        }
        syms
      }.toSeq
    })
    docs.select(col(idCol), encodeUdf(col(textCol)).as("tokens"))
      .withColumn("n_tokens", size(col("tokens")))
  }

  /** Fingerprints: 64-bit-hex prefix of md5 over whitespace-normalized
    * lowercase text (portable, oracle-checkable) plus the Rabin–Karp
    * rolling hash (the windowed-fingerprint primitive).
    * Output: (id, fp_md5, fp_rolling).
    */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val normalized = regexp_replace(lower(col(textCol)), " +", " ")
    docs.select(col(idCol),
      substring(md5(normalized), 1, 16).as("fp_md5"),
      Sketches.rollingHash(normalized).as("fp_rolling"))
  }

  /** Hashed-bag-of-n-grams linear classifier — the fastText shape
    * (Joulin et al. 2016) that CCNet-/LLaMA-/DCLM-style pipelines score
    * quality and domain with: each unigram and word-bigram hashes into
    * one of `weights.length` buckets, and the document's logit is
    *
    *   logit = bias + scale · (Σ_g weights[bucket(g)]) / n_grams
    *
    * Weights are QUANTIZED integers (the production deployment: a
    * trained model quantized to milli-units, `scale` = the
    * dequantization step — the same trade `emb_quantize_int8` pins for
    * embeddings). Integer weights make the per-doc sum EXACT and
    * aggregation-order-free: the one groupBy partial-aggregates a
    * BIGINT map-side, so the result is bit-identical under any
    * partitioning, and an oracle reproduces it without float-sum-order
    * caveats (the final two IEEE double ops — multiply by `scale`,
    * divide by `n_grams` — are each correctly rounded, so they are too).
    *
    * Shuffle profile at 100 TB: the weight table broadcasts as a plan
    * literal (2^20 buckets × 4 bytes = 4 MB; the catalog uses 4096);
    * gram hashing ([[graft.functions.RollingHash64]] →
    * [[graft.functions.IdHash]]) and the bucket lookup
    * (`element_at` on the literal) run inside whole-stage codegen; the
    * only exchange is the partial-aggregated groupBy on the doc id —
    * one BIGINT + one count per doc per partition.
    *
    * Bucketing is oracle-portable end to end: bucket(g) =
    * IdHash(rollingHash61(g)) mod buckets — the text_fingerprint_rolling
    * HUGEINT chain composed with [[graft.queries.SamplingQueries.hashSql]].
    *
    * Output: (id, n_grams, logit). Docs whose text is empty still carry
    * `split`'s single empty token, so every input row scores — including
    * NULL text: `explode_outer` keeps the row through a null gram array
    * and the null-gram weight lookup contributes nothing, so such docs
    * surface as (id, n_grams = 0, logit = NULL) rather than vanishing.
    */
  def classifierScore(docs: DataFrame, idCol: String, textCol: String,
      weights: Array[Int], scale: Double = 1e-3, bias: Double = 0.0,
      addBigrams: Boolean = true): DataFrame = {
    require(weights.nonEmpty, "weights must be non-empty")
    val grams =
      if (addBigrams)
        concat(TextFunctions.words(col(textCol)),
          TextFunctions.shingleList(col(textCol), 2))
      else TextFunctions.words(col(textCol))
    val bucket = pmod(
      Sampling.idHash(Sketches.rollingHash(col("g"))), lit(weights.length.toLong))
    docs.select(col(idCol), explode_outer(grams).as("g"))
      .select(col(idCol),
        element_at(lit(weights), (bucket + 1L).cast("int")).as("w"))
      .groupBy(col(idCol))
      .agg(sum(col("w")).as("__wsum"), count(col("w")).as("n_grams"))
      .select(col(idCol), col("n_grams"),
        (lit(bias) + lit(scale) * col("__wsum") / col("n_grams")).as("logit"))
  }

  /** DSIR importance log-weights (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): score every raw doc
    * by how much more likely its hashed-n-gram bag is under the TARGET
    * distribution than under the RAW distribution,
    *
    *   avg_lw(d) = (1/n_d) · Σ_g [ ln p̂_t(b(g)) − ln p̂_r(b(g)) ],
    *
    * with add-½ smoothed bucket categoricals p̂(b) = (c_b + ½)/(C + B/2)
    * over the same bucket(g) = IdHash(rollingHash61(g)) mod B
    * unigram+bigram stream [[classifierScore]] and [[classifierTrain]]
    * use — one shared, oracle-portable feature chain for the whole
    * quality family. Per-gram averaging makes the score
    * length-comparable (the resampling rank is what DSIR consumes).
    *
    * Distributed shape: two partial-aggregated bucket counts (shuffle
    * carries ≤ B rows each), one O(B) driver collect to build the
    * log-ratio table, then scoring is a narrow map over the raw corpus
    * against a 32 KB plan literal plus one doc-keyed partial-aggregated
    * sum — the corpus text never shuffles, and nothing on the driver
    * grows with corpus size. Target must be a (logical) subset of the
    * modeled vocabulary for the ratio to be meaningful, but any two
    * corpora are accepted.
    */
  def dsirLogWeights(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, buckets: Int = 4096,
      addBigrams: Boolean = true): DataFrame = {
    require(buckets > 0, s"buckets must be positive: $buckets")
    val grams =
      if (addBigrams)
        concat(TextFunctions.words(col(textCol)),
          TextFunctions.shingleList(col(textCol), 2))
      else TextFunctions.words(col(textCol))
    val bucket = pmod(
      Sampling.idHash(Sketches.rollingHash(col("g"))), lit(buckets.toLong))
    def bucketCounts(df: DataFrame): (Array[Long], Long) = {
      val c = new Array[Long](buckets)
      df.select(explode(grams).as("g")).select(bucket.as("__b"))
        .groupBy(col("__b")).agg(count(lit(1)).as("__c"))
        .collect().foreach(r => c(r.getLong(0).toInt) = r.getLong(1))
      (c, c.sum)
    }
    val (tc, tt) = bucketCounts(target)
    val (rc, rt) = bucketCounts(raw)
    val lr: Array[Double] = Array.tabulate(buckets) { b =>
      math.log((tc(b) + 0.5) / (tt + 0.5 * buckets)) -
        math.log((rc(b) + 0.5) / (rt + 0.5 * buckets))
    }
    raw.select(col(idCol), explode(grams).as("g"))
      .select(col(idCol),
        element_at(lit(lr), (bucket + 1L).cast("int")).as("__w"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"), sum(col("__w")).as("__s"))
      .select(col(idCol), col("n_grams"),
        (col("__s") / col("n_grams")).as("avg_log_weight"))
  }

  /** Train the [[classifierScore]] weight table IN-ENGINE: full-batch
    * gradient descent on logistic loss with a hard-sigmoid link, in
    * pure integer arithmetic so the learned weights are exactly
    * reproducible by a SQL oracle that unrolls the rounds as CTEs (the
    * [[bpeTrainMerges]] discipline — fixed round count, no floats, no
    * RNG, no per-row sequencing).
    *
    * Model: margin z_d = Σ_b w[b]·x_{d,b} over the same hashed
    * unigram+bigram buckets [[classifierScore]] reads
    * (bucket(g) = IdHash(rollingHash61(g)) mod `buckets`), probability
    * p = clamp(1/2 + z/(4K), 0, 1) — the "hard sigmoid" rational
    * surrogate (Collobert 2004's piecewise-linear link; gradient
    * (p − y)·x is the logistic gradient with p linearized). Scaled by
    * 4K everything stays integral:
    *
    *   err_d  = clamp(2K + z_d, 0, 4K) − 4K·y_d          ∈ [−4K, 4K]
    *   G[b]   = Σ_d err_d · x_{d,b}
    *   w'[b]  = w[b] − tdiv(G[b], L)     (truncate toward zero)
    *
    * K (`marginScale`) sets the linear band half-width in margin
    * units; L (`lrDenom`) is the inverse learning rate. Round 1 from
    * w = 0 gives w[b] ∝ (positive-class count − negative-class count)
    * of bucket b — the discriminative naive-Bayes-ish start — and
    * later rounds sharpen only where the margin still errs (saturated
    * correct docs contribute zero gradient, perceptron-style).
    *
    * Distributed shape: gram→bucket counts aggregate ONCE
    * (map-side-combined, persisted); each round is one margin
    * aggregate + one gradient aggregate. The weight vector is MODEL
    * STATE, O(`buckets`) and corpus-size-independent — it rides the
    * driver between rounds (collect of ≤ `buckets` rows/round, the
    * same bounded-state call as the k-means centroid collect) and
    * re-enters the plan as a broadcast literal. Rows with NULL text
    * carry no grams and simply contribute nothing.
    *
    * Scale-probed (round 12, 100× ScaleGen corpus): 3 rounds over
    * 500k docs train in 29.0 s at local[32] vs 3.8 s over 5k docs —
    * 7.6× cost for 100× data, because the per-round margin/gradient
    * aggregates ride the once-persisted gram→bucket relation and the
    * driver work is O(buckets) regardless of corpus. The 4096-entry
    * weight literal stayed codegen-safe (no Janino warnings; the r7
    * lesson held at this width).
    *
    * @param label 0/1 integer label column (evaluated against `docs`)
    * @return (bucket, weight) for every bucket with nonzero weight
    */
  def classifierTrain(docs: DataFrame, idCol: String, textCol: String,
      label: Column, buckets: Int = 4096, rounds: Int = 3,
      marginScale: Long = 500L, lrDenom: Long = 4096L,
      addBigrams: Boolean = true): DataFrame = {
    require(buckets > 0 && rounds > 0 && marginScale > 0 && lrDenom > 0,
      s"buckets/rounds/marginScale/lrDenom must be positive")
    val spark = docs.sparkSession
    val k = marginScale
    val grams =
      if (addBigrams)
        concat(TextFunctions.words(col(textCol)),
          TextFunctions.shingleList(col(textCol), 2))
      else TextFunctions.words(col(textCol))
    val bucket = pmod(
      Sampling.idHash(Sketches.rollingHash(col("g"))), lit(buckets.toLong))
    val gx = docs
      .select(col(idCol).as("__id"), label.cast("long").as("__y"),
        explode(grams).as("g"))
      .select(col("__id"), col("__y"), bucket.as("__b"))
      .groupBy(col("__id"), col("__y"), col("__b"))
      .agg(count(lit(1)).as("__x"))
      .persist()
    val w = new Array[Long](buckets)
    try {
      for (_ <- 1 to rounds) {
        // margin under the current weights (broadcast plan literal),
        // then the per-bucket integer gradient — ONE shuffle pair per
        // round, partial-aggregated on both sides
        val wlit = lit(w)
        val err = gx
          .groupBy(col("__id"), col("__y"))
          .agg(sum(element_at(wlit, (col("__b") + 1L).cast("int")) *
            col("__x")).as("__z"))
          .select(col("__id"),
            (least(greatest(lit(2L * k) + col("__z"), lit(0L)), lit(4L * k)) -
              lit(4L * k) * col("__y")).as("__e"))
        val grad = gx.join(err, "__id")
          .groupBy(col("__b"))
          .agg(sum(col("__e") * col("__x")).as("__g"))
          .collect()
        grad.foreach { r =>
          // Java integer division truncates toward zero — the oracle
          // mirrors it as sign(g)·(|g| // L), floor == trunc on |g|
          w(r.getLong(0).toInt) -= r.getLong(1) / lrDenom
        }
      }
    } finally gx.unpersist()
    val out = w.iterator.zipWithIndex
      .collect { case (wt, j) if wt != 0L => (j.toLong, wt) }.toSeq
    import spark.implicits._
    out.toDF("bucket", "weight")
  }

  /** The Misra–Gries frequent-items summary: at most `capacity` live
    * counters; a token absent from a full summary triggers one
    * decrement-all round (the incoming token and one unit of every
    * stored counter cancel — `deficit` counts those rounds, so any
    * token's stored count undercounts its true count by at most
    * `deficit <= tokens/(capacity+1)`). Counter snapshots are
    * restorable, which makes the summary resumable across micro-batches
    * (the streaming twin) as well as mergeable across partitions (the
    * batch operator): restoring counters and continuing is identical to
    * one summary over the concatenated stream.
    */
  final class MisraGries(capacity: Int) extends Serializable {
    private val m = new java.util.HashMap[String, Long](capacity * 2)
    private var np = 0L
    private var dp = 0L
    def tokens: Long = np
    def deficit: Long = dp
    def size: Int = m.size
    def add(t: String): Unit = {
      np += 1L
      val cur = m.get(t)
      if (cur != 0L || m.containsKey(t)) m.put(t, cur + 1L)
      else if (m.size < capacity) m.put(t, 1L)
      else {
        dp += 1L
        val eit = m.entrySet().iterator()
        while (eit.hasNext) {
          val e = eit.next()
          if (e.getValue == 1L) eit.remove()
          else e.setValue(e.getValue - 1L)
        }
      }
    }
    def restore(counts: Iterable[(String, Long)], tokens: Long,
        deficit: Long): Unit = {
      counts.foreach { case (t, w) => m.put(t, w) }
      np = tokens
      dp = deficit
    }
    def foreachCounter(f: (String, Long) => Unit): Unit = {
      val eit = m.entrySet().iterator()
      while (eit.hasNext) { val e = eit.next(); f(e.getKey, e.getValue) }
    }
    def snapshot: Map[String, Long] = {
      val b = Map.newBuilder[String, Long]
      foreachCounter((t, w) => b += (t -> w))
      b.result()
    }
  }

  /** EXACT corpus-wide heavy hitters — every whitespace token whose
    * count is at least `thetaNum/thetaDen` of the N total tokens —
    * without ever shuffling the full token stream's distinct keys.
    *
    * At 100 TB the naive `groupBy(token)` shuffles a key per DISTINCT
    * token (billions of near-singleton keys whose counts are then
    * thrown away by the threshold). This is the classic two-pass
    * sketch-then-verify shape instead:
    *
    *  1. '''Candidates''' — a per-partition Misra–Gries summary
    *     (bounded state: at most `capacity` counters per partition,
    *     built inline with the scan, NO shuffle). Summaries are
    *     count-mergeable; each partition also reports its exact token
    *     count n_p and its exact decrement-round count d_p. Merged-MG
    *     theory gives `mgSum(t) >= count(t) - D` with `D = sum(d_p) <=
    *     N/(capacity+1)`, so filtering on `mgSum + D >= ceil(theta*N)`
    *     yields a GUARANTEED superset of the true heavy hitters — the
    *     shuffle carries only P*capacity summary rows, not the corpus.
    *  2. '''Verify''' — one exact partial-aggregated count restricted
    *     to the candidate set (broadcast semi-join probe on the token
    *     stream; at most ~thetaDen/thetaNum + slack candidates
    *     survive step 1's filter, a guaranteed-tiny broadcast).
    *
    * The result is EXACT (deterministic, partitioning-independent) —
    * the sketch only prunes, never decides. The frequency threshold is
    * evaluated in exact integer cross-multiplication
    * (`cnt * thetaDen >= N * thetaNum`), no float boundary.
    *
    * Tokenization is `split(text, " ")` with trailing empties kept —
    * identical to [[TextFunctions.words]] and DuckDB `string_split`.
    *
    * @param capacity per-partition MG counters; must satisfy
    *   `(capacity+1) * thetaNum > thetaDen` (i.e. capacity+1 > 1/theta)
    *   or the superset guarantee fails — enforced.
    * @return (tok, cnt, n_total) for each heavy hitter
    */
  def heavyHitters(docs: DataFrame, textCol: String,
      thetaNum: Long, thetaDen: Long, capacity: Int = 1024): DataFrame = {
    require(thetaNum > 0 && thetaDen > 0, "theta must be positive")
    require((capacity + 1L) * thetaNum > thetaDen,
      s"capacity+1 (${capacity + 1}) must exceed 1/theta ($thetaDen/$thetaNum) " +
        "or a heavy hitter can vanish from every per-partition summary")
    val spark = docs.sparkSession
    import spark.implicits._
    val summaries = docs.select(col(textCol).cast("string")).as[String]
      .mapPartitions { it =>
        val mg = new MisraGries(capacity)
        while (it.hasNext) {
          val text = it.next()
          if (text != null) {
            val toks = text.split(" ", -1)
            var i = 0
            while (i < toks.length) { mg.add(toks(i)); i += 1 }
          }
        }
        val rows = new scala.collection.mutable.ArrayBuffer[(String, Long, Long, Long)]
        mg.foreachCounter((t, w) => rows += ((t, w, 0L, 0L)))
        rows += ((null, 0L, mg.tokens, mg.deficit))
        rows.iterator
      }.toDF("tok", "w", "np", "dp")
      // tiny after the merge (<= P*capacity + P rows pre-agg); persisted
      // because totals, candidates, and the verify filter all read it
      .groupBy(col("tok"))
      .agg(sum(col("w")).as("w"), sum(col("np")).as("np"), sum(col("dp")).as("dp"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val totals = summaries.filter(col("tok").isNull)
      .select(col("np").as("n_total"), col("dp").as("deficit"))
    val candidates = summaries.filter(col("tok").isNotNull)
      .crossJoin(broadcast(totals))
      .filter((col("w") + col("deficit")) * lit(thetaDen) >=
        col("n_total") * lit(thetaNum))
      .select(col("tok"))
    docs.select(explode(split(col(textCol), " ")).as("tok"))
      .join(broadcast(candidates), Seq("tok"), "left_semi")
      .groupBy(col("tok"))
      .agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(totals.select(col("n_total"))))
      .filter(col("cnt") * lit(thetaDen) >= col("n_total") * lit(thetaNum))
      .select(col("tok"), col("cnt"), col("n_total"))
  }

  /** Collocation mining by pointwise mutual information: the adjacent
    * word pairs that co-occur far more than their unigram frequencies
    * predict (Church & Hanks 1990) — multi-word expressions ("new
    * york", "machine learning") for tokenizer vocab seeding, stop-pair
    * diagnostics, and boilerplate phrase detection.
    *
    * `pmi = ln(c_xy/N_bi) − ln(c_x/N_uni) − ln(c_y/N_uni)`, computed
    * from exact integer counts; `minCount` drops the unstable
    * singleton tail (PMI is maximal for pairs seen once — the
    * textbook failure mode).
    *
    * Scale shape: one scan explodes unigrams + adjacent bigrams; both
    * counts partial-aggregate map-side to vocabulary-sized relations;
    * the two unigram attach joins key on a word each (vocab-sized, not
    * corpus-sized); totals ride one broadcast scalar; top-k compiles
    * to TakeOrderedAndProject (per-partition heaps, no global sort).
    */
  def collocationsPmi(docs: DataFrame, textCol: String,
      minCount: Int = 5, topK: Int = 50): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1: $minCount")
    require(topK >= 1, s"topK must be >= 1: $topK")
    val toks = docs.select(split(col(textCol), " ").as("l"))
    // the two unigram-attach branches share one aggregate subplan —
    // Spark's ReusedExchange dedups it at execution, no persist needed
    val uni = toks.select(explode(col("l")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    val nUni = uni.agg(sum(col("c")).as("n_uni"))
    // adjacent pairs without a join: zip the list with its own tail
    val pairs = toks.select(explode(
        zip_with(
          slice(col("l"), lit(1), greatest(size(col("l")) - 1, lit(0))),
          slice(col("l"), lit(2), greatest(size(col("l")) - 1, lit(0))),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
    val bcnt = pairs.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("n_xy"))
      .filter(col("n_xy") >= minCount)
    val nBi = pairs.agg(count(lit(1)).as("n_bi"))
    val out = bcnt
      .join(uni.select(col("w").as("w1"), col("c").as("c_x")), "w1")
      .join(uni.select(col("w").as("w2"), col("c").as("c_y")), "w2")
      .crossJoin(broadcast(nBi))
      .crossJoin(broadcast(nUni))
      .withColumn("pmi", round(
        log(col("n_xy").cast("double") / col("n_bi")) -
        log(col("c_x").cast("double") / col("n_uni")) -
        log(col("c_y").cast("double") / col("n_uni")), 6))
      .select(col("w1"), col("w2"), col("n_xy"), col("pmi"))
    out.orderBy(col("pmi").desc, col("w1"), col("w2")).limit(topK)
  }
}

/** One arriving fetch for [[TextAnalysis.postingsChurnStateful]] — the
  * watermarked event-time column `ts` must survive into the
  * flatMapGroupsWithState child, so it rides the row.
  */
case class ChurnFetch(doc_id: Long, ts_us: Long, terms: Seq[String],
    ts: java.sql.Timestamp)

/** Per-doc state: the term set currently indexed for the doc. */
case class ChurnState(terms: Seq[String])

/** One posting-churn verdict: `term` was added to / removed from
  * `doc_id`'s postings by the fetch at `ts_us`.
  */
case class ChurnRow(term: String, doc_id: Long, ts_us: Long, status: String)
