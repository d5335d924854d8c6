package graft.queries

import graft.queries.Catalog.OrderByOnce
import graft.functions.TextFunctions
import graft.operators.TextAnalysis
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle-checked text-analysis queries over `documents`. Ratio columns
  * are identical double arithmetic in both engines (same ints, same
  * operation order), rounded to 6 decimals.
  */
object TextQueries {

  private val stopList = "('the', 'a', 'of', 'and', 'to', 'in')"

  /** Deterministic URL injection shared by the URL-filtering pair:
    * every doc links `https://cdn<id%7>.host<id%3>.com/p/<id>`, and
    * every fourth doc also links `http://mirror<id%5>.blocked.net/x`.
    * [[urlInjectedSql]] is the byte-identical DuckDB construction.
    */
  private def urlInjected: org.apache.spark.sql.Column =
    concat(col("text"),
      when(pmod(col("doc_id"), lit(4)) === 0,
        concat(lit(" ref http://mirror"),
          pmod(col("doc_id"), lit(5)).cast("string"),
          lit(".blocked.net/x"))).otherwise(lit("")),
      lit(" visit https://cdn"), pmod(col("doc_id"), lit(7)).cast("string"),
      lit(".host"), pmod(col("doc_id"), lit(3)).cast("string"),
      lit(".com/p/"), col("doc_id").cast("string"))

  private val urlInjectedSql =
    """WITH t AS (SELECT doc_id, source,
      |             text || CASE WHEN doc_id % 4 = 0
      |               THEN ' ref http://mirror' || CAST(doc_id % 5 AS VARCHAR)
      |                 || '.blocked.net/x' ELSE '' END
      |               || ' visit https://cdn' || CAST(doc_id % 7 AS VARCHAR)
      |               || '.host' || CAST(doc_id % 3 AS VARCHAR)
      |               || '.com/p/' || CAST(doc_id AS VARCHAR) AS t2
      |           FROM documents)
      |""".stripMargin

  /** Shared oracle prefix for the ExactSubstr pair: per-position
    * 30-char window hashes (the winnow-family HUGEINT fold — identical
    * to [[graft.functions.GramHashes]] on ASCII), the df>=2 duplicated
    * set, and the gaps-and-islands labeling of duplicated positions.
    * The first-row NULL frame in `brk` falls to ELSE 0, matching the
    * Spark side's when().otherwise(0).
    */
  private val exactSubstrSpanCte =
    """WITH t AS (SELECT doc_id, text FROM documents),
      |g AS (SELECT doc_id, i AS pos,
      |        CAST(list_reduce(
      |          list_prepend([CAST(0 AS HUGEINT)],
      |            list_transform(range(i, i + 30),
      |              j -> [CAST(unicode(substring(text, j, 1)) AS HUGEINT)])),
      |          (acc, x) -> [(acc[1] * 131 + x[1])
      |                       % 2305843009213693951])[1] AS BIGINT) AS h
      |      FROM (SELECT doc_id, text,
      |                   unnest(generate_series(1, length(text) - 30 + 1)) AS i
      |            FROM t)),
      |d AS (SELECT h FROM g GROUP BY h HAVING count(*) >= 2),
      |p AS (SELECT doc_id, pos FROM g JOIN d USING (h)),
      |m AS (SELECT doc_id, pos,
      |        CASE WHEN pos > max(pos + 30) OVER (PARTITION BY doc_id
      |               ORDER BY pos ROWS BETWEEN UNBOUNDED PRECEDING
      |               AND 1 PRECEDING) THEN 1 ELSE 0 END AS brk
      |      FROM p),
      |isl AS (SELECT doc_id, pos,
      |          sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
      |        FROM m)
      |""".stripMargin

  /** Shared gram→bucket CTE chain for the classifier entries: unigrams
    * + word bigrams, rollingHash61 per gram (the HUGEINT fold), IdHash,
    * mod 4096 — `b` is (doc_id, bk), the exact bucket stream
    * [[TextAnalysis.classifierScore]] and [[TextAnalysis.classifierTrain]]
    * aggregate.
    */
  private val clfGramCtes: String = {
    val bkt = s"(${SamplingQueries.hashSql("t61")} % 4096)"
    s"""toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS s FROM documents),
      |uni AS (SELECT doc_id, unnest(s) AS g FROM toks),
      |bi AS (SELECT doc_id, s[i] || ' ' || s[i + 1] AS g
      |       FROM (SELECT doc_id, s, unnest(range(1, len(s))) AS i
      |             FROM toks)),
      |grams AS (SELECT doc_id, g FROM uni
      |          UNION ALL SELECT doc_id, g FROM bi),
      |h AS (
      |  SELECT doc_id, CAST(list_reduce(
      |      list_prepend([CAST(0 AS HUGEINT), CAST(1 AS HUGEINT)],
      |        list_transform(range(1, length(g) + 1),
      |          i -> [CAST(unicode(substring(g, i, 1)) AS HUGEINT),
      |                CAST(0 AS HUGEINT)])),
      |      (acc, x) -> [(acc[1] + x[1] * acc[2]) % 2305843009213693951,
      |                   (acc[2] * 131) % 2305843009213693951])[1] AS BIGINT)
      |    AS t61
      |  FROM grams),
      |b AS (SELECT doc_id, $bkt AS bk FROM h)""".stripMargin
  }

  /** DuckDB oracle CTEs for [[TextAnalysis.classifierTrain]]: the
    * integer full-batch descent UNROLLED one CTE layer per round (the
    * [[bpeOracle]] discipline). Round 1 starts from w = 0, so its error
    * is the closed form 2K − 4K·y; later rounds recompute the margin
    * against the previous weight relation. Truncating division is
    * spelled sign(g)·(|g| // L) so the SQL is insensitive to the
    * engine's negative-`//` convention (floor == trunc on |g|).
    * Produces CTEs up to `w$rounds` with columns (bb, wv).
    */
  private[queries] def clfTrainCtes(rounds: Int, k: Long = 500L,
      l: Long = 4096L): String = {
    require(rounds >= 1)
    def tdiv(x: String) =
      s"(CASE WHEN $x >= 0 THEN $x // $l ELSE -((-($x)) // $l) END)"
    val parts = Seq.newBuilder[String]
    parts += clfGramCtes
    parts += s"""gx AS (SELECT doc_id, bk AS bb, CAST(count(*) AS BIGINT) AS x
      |            FROM b GROUP BY 1, 2)""".stripMargin
    parts += s"""lab AS (SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
      |             FROM documents)""".stripMargin
    parts += s"""g1 AS (SELECT bb, sum((${2 * k} - ${4 * k} * y) * x) AS gr
      |            FROM gx JOIN lab USING (doc_id) GROUP BY bb)""".stripMargin
    parts += s"""w1 AS (SELECT bb, -${tdiv("gr")} AS wv FROM g1)""".stripMargin
    for (r <- 2 to rounds) {
      parts += s"""z$r AS (SELECT gx.doc_id, sum(coalesce(pw.wv, 0) * gx.x) AS z
        |            FROM gx LEFT JOIN w${r - 1} pw USING (bb)
        |            GROUP BY gx.doc_id)""".stripMargin
      parts += s"""e$r AS (SELECT z$r.doc_id,
        |              LEAST(GREATEST(${2 * k} + z, 0), ${4 * k}) - ${4 * k} * y AS err
        |            FROM z$r JOIN lab USING (doc_id))""".stripMargin
      parts += s"""g$r AS (SELECT bb, sum(err * x) AS gr
        |            FROM gx JOIN e$r USING (doc_id) GROUP BY bb)""".stripMargin
      parts += s"""w$r AS (SELECT bb, coalesce(pw.wv, 0) - ${tdiv("gr")} AS wv
        |            FROM g$r LEFT JOIN w${r - 1} pw USING (bb))""".stripMargin
    }
    parts.result().mkString(",\n")
  }

  /** Label column the classifier entries train on: is-English, the
    * language-ID task a fastText-shape model classically learns. */
  /** The 23-host planted graph's HITS and SALSA runs (iterations = 2),
    * shared by doc_link_hits / doc_link_salsa / doc_link_tkc /
    * doc_link_tkc_topk — four queries over the SAME two iteration
    * outputs. Materialized once per JVM per sf dir via [[QueryMemo]]
    * (a parquet spill — the production analogue is a published
    * host-scores table several detectors read).
    */
  private def hitsSalsa23(s: org.apache.spark.sql.SparkSession,
      dir: String): (org.apache.spark.sql.DataFrame,
      org.apache.spark.sql.DataFrame) = {
    def host(e: org.apache.spark.sql.Column) =
      concat(lit("h"), pmod(e, lit(23)).cast("string"), lit(".example"))
    def edges = {
      val docs = Tables.documents(s, dir)
      docs.select(host(col("doc_id")).as("src"),
          host(col("doc_id") * 7 + 1).as("dst"))
        .unionByName(docs.select(host(col("doc_id")).as("src"),
          host(col("doc_id") * 13 + 5).as("dst")))
    }
    (QueryMemo.materialized(s, s"link23_hits|$dir") {
      graft.operators.LinkGraph.hitsInt(edges, "src", "dst", iterations = 2)
    }, QueryMemo.materialized(s, s"link23_salsa|$dir") {
      graft.operators.LinkGraph.salsaInt(edges, "src", "dst", iterations = 2)
    })
  }

  private def clfLabel = when(col("lang") === "en", 1L).otherwise(0L)

  private val clfRounds = 3

  /** Train-ONCE cache for the classifier entries. The integer descent
    * is deterministic (no RNG, no float accumulation order), so the
    * learned weights are a pure function of (corpus, hyperparams) —
    * memoizing per (sessionUUID, sfDir) changes nothing an oracle can
    * observe, it only stops the catalog from paying the 3-round
    * training loop once per entry per invocation (round-11 bench:
    * train 6.3 s + score-that-retrains 7.2 s; with the cache the pair
    * costs one training pass total). Value is the DENSE 4096-long
    * weight table — O(buckets) model state, corpus-size-independent,
    * ~32 KB per (session, dir) key, so the map never needs eviction.
    * WEAK session keys: a closed-and-dropped session's entries become
    * collectable instead of pinning the session for the JVM lifetime.
    */
  private val clfCache =
    new java.util.WeakHashMap[org.apache.spark.sql.SparkSession,
      scala.collection.concurrent.TrieMap[String, Array[Long]]]()

  /** Train on `documents` (memoized — see [[clfCache]]) and return the
    * DENSE 4096-wide weight table (driver-side model state). */
  private def clfTrainedDense(s: org.apache.spark.sql.SparkSession,
      dir: String): Array[Long] = {
    val perSession = clfCache.synchronized {
      clfCache.computeIfAbsent(s,
        _ => scala.collection.concurrent.TrieMap.empty)
    }
    perSession.getOrElseUpdate(dir, {
      val dense = new Array[Long](4096)
      TextAnalysis.classifierTrain(Tables.documents(s, dir), "doc_id", "text",
          clfLabel, buckets = 4096, rounds = clfRounds)
        .collect()
        .foreach(r => dense(r.getLong(0).toInt) = r.getLong(1))
      dense
    })
  }

  /** DuckDB oracle for [[TextAnalysis.bpeTrainMerges]]: the iterative
    * training loop UNROLLED as `numMerges` CTE layers. Layer k derives
    * pair counts `p{k}` from vocabulary `v{k}` (adjacent symbol pairs
    * weighted by word frequency), takes the argmax `m{k}` with the
    * engine's exact tie-break (n DESC, l, r — binary collation both
    * sides), and applies the merge to produce `v{k+1}` via a
    * `list_reduce` that folds symbols left-to-right, merging whenever
    * the last emitted symbol is `l` and the next is `r`. That fold IS
    * the engine's greedy non-overlapping scan: a merged token l||r can
    * never equal l (r is nonempty), so a just-merged site can't
    * re-trigger. The text doubles per round in rendered size but stays
    * a few KB at numMerges = 8.
    */
  private[queries] def bpeOracle(numMerges: Int): String = {
    val parts = Seq.newBuilder[String]
    parts += """v0 AS (
      |  SELECT list_transform(range(1, length(w) + 1),
      |                        i -> substring(w, i, 1)) AS syms,
      |         CAST(count(*) AS BIGINT) AS cnt
      |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
      |  WHERE length(w) > 0
      |  GROUP BY w)""".stripMargin
    for (k <- 0 until numMerges) {
      parts += s"""p$k AS (
        |  SELECT pr[1] AS l, pr[2] AS r, CAST(sum(cnt) AS BIGINT) AS n
        |  FROM (SELECT cnt, unnest(list_transform(range(1, len(syms)),
        |               i -> [syms[i], syms[i + 1]])) AS pr
        |        FROM v$k)
        |  GROUP BY 1, 2)""".stripMargin
      parts += s"""m$k AS (
        |  SELECT $k AS rank, l, r, n FROM p$k ORDER BY n DESC, l, r LIMIT 1)""".stripMargin
      if (k < numMerges - 1)
        parts += s"""v${k + 1} AS (
          |  SELECT list_reduce(list_transform(v.syms, s -> [s]),
          |           (acc, x) -> CASE WHEN acc[len(acc)] = m.l AND x[1] = m.r
          |                            THEN list_append(acc[1:len(acc) - 1], m.l || m.r)
          |                            ELSE list_concat(acc, x) END) AS syms,
          |         v.cnt
          |  FROM v$k v CROSS JOIN m$k m)""".stripMargin
    }
    val union = (0 until numMerges)
      .map(k => s"""SELECT CAST(rank AS INTEGER) AS rank, l AS "left", r AS "right",
        |       n AS pair_count FROM m$k""".stripMargin)
      .mkString("\nUNION ALL\n")
    "WITH " + parts.result().mkString(",\n") + "\n" + union + "\nORDER BY rank"
  }

  val all: Seq[Q] = Seq(

    Q("text_token_stats",
      (s, dir) => TextAnalysis.tokenStats(Tables.documents(s, dir), "doc_id", "text")
        .orderByOnce(col("doc_id")),
      Some("""SELECT doc_id,
             |       CAST(len(string_split(text, ' ')) AS INTEGER) AS n_words,
             |       CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+')) AS INTEGER) AS n_tokens,
             |       CAST(length(text) AS INTEGER) AS n_chars
             |FROM documents ORDER BY doc_id""".stripMargin),
      doc = "token counting: whitespace words + BPE-ish regex tokens"),

    Q("text_quality",
      (s, dir) => TextAnalysis.qualityScore(Tables.documents(s, dir), "doc_id", "text")
        .orderBy(col("doc_id")),
      Some(s"""SELECT doc_id,
              |       round(CAST(list_sum(list_transform(w, x -> len(x))) AS DOUBLE)
              |             / len(w), 6) AS mean_wlen,
              |       round(CAST(len(list_filter(w, x -> x IN $stopList)) AS DOUBLE)
              |             / len(w), 6) AS stopword_ratio,
              |       round(least(CAST(len(w) AS DOUBLE) / 100.0, 1.0) * 0.5
              |             + (1.0 - CAST(len(list_filter(w, x -> x IN $stopList)) AS DOUBLE)
              |                      / len(w)) * 0.5, 6) AS quality
              |FROM (SELECT doc_id, string_split(text, ' ') w FROM documents)
              |ORDER BY doc_id""".stripMargin),
      doc = "quality scoring: mean word length, stopword ratio, composite score"),

    // Gopher/MassiveText rule filter. The single-line synthetic corpus
    // gets a deterministic multi-line tail (bullet lines, ellipsis
    // line, symbols, keyed on doc_id) so the line-based rules vary;
    // same construction both sides. Rules compare the emitted
    // round(,6) ratios, so the integer-count division is boundary-safe
    // across engines.
    Q("text_gopher_rules",
      (s, dir) => {
        val injected = concat(col("text"), lit("\n"),
          when(pmod(col("doc_id"), lit(3)) === 0, lit("- alpha item\n"))
            .otherwise(lit("")),
          when(pmod(col("doc_id"), lit(4)) === 0, lit("ends here...\n"))
            .otherwise(lit("")),
          lit("* bullet 42 ###"))
        TextAnalysis.gopherRules(
            Tables.documents(s, dir).withColumn("text", injected),
            "doc_id", "text")
          .orderByOnce(col("doc_id"))
      },
      Some(s"""WITH t AS (SELECT doc_id,
              |    text || chr(10)
              |      || CASE WHEN doc_id % 3 = 0 THEN '- alpha item' || chr(10)
              |         ELSE '' END
              |      || CASE WHEN doc_id % 4 = 0 THEN 'ends here...' || chr(10)
              |         ELSE '' END
              |      || '* bullet 42 ###' AS tx
              |  FROM documents),
              |sig AS (SELECT doc_id,
              |    CAST(len(string_split(tx, ' ')) AS BIGINT) AS n_words,
              |    round(CAST(list_sum(list_transform(string_split(tx, ' '),
              |            x -> len(x))) AS DOUBLE)
              |          / len(string_split(tx, ' ')), 6) AS mean_wlen,
              |    round(CAST(len(regexp_extract_all(tx, '#|\\.\\.\\.')) AS DOUBLE)
              |          / len(string_split(tx, ' ')), 6) AS symbol_ratio,
              |    round(CAST(len(regexp_extract_all(tx, '(?m)^[-*] ')) AS DOUBLE)
              |          / (len(regexp_extract_all(tx, chr(10))) + 1), 6)
              |      AS bullet_ratio,
              |    round(CAST(len(regexp_extract_all(tx, '(?m)\\.\\.\\.$$')) AS DOUBLE)
              |          / (len(regexp_extract_all(tx, chr(10))) + 1), 6)
              |      AS ellipsis_ratio,
              |    round(CAST(len(regexp_extract_all(tx, '[^ ]*[a-zA-Z][^ ]*'))
              |            AS DOUBLE)
              |          / len(string_split(tx, ' ')), 6) AS alpha_ratio,
              |    CAST(len(list_filter(string_split(tx, ' '),
              |            x -> x IN $stopList)) AS BIGINT) AS n_stop
              |  FROM t)
              |SELECT doc_id, n_words, mean_wlen, symbol_ratio, bullet_ratio,
              |       ellipsis_ratio, alpha_ratio, n_stop,
              |       CAST(n_words >= 50 AND n_words <= 100000
              |         AND mean_wlen >= 3.0 AND mean_wlen <= 10.0
              |         AND symbol_ratio < 0.1 AND bullet_ratio < 0.9
              |         AND ellipsis_ratio < 0.3 AND alpha_ratio > 0.8
              |         AND n_stop >= 2 AS INT) AS pass
              |FROM sig ORDER BY doc_id""".stripMargin),
      doc = "Gopher/MassiveText rule filter: 7 published signals + pass flag, one scan-fused pass"),

    // PII redaction (the C4/Dolma-style cleanup stage). The synthetic
    // corpus carries no organic PII, so each row gets a deterministic
    // injected tail (email + IPv4 + phone derived from doc_id) built
    // identically on both sides; the FULL scrubbed text is the output
    // column, so the hash compare proves byte-identical redaction —
    // pattern semantics must agree between Java regex and DuckDB's
    // RE2 (why scrubPii avoids lookaround). Pure per-row map: no
    // shuffle, codegen'd, scan-fused.
    Q("text_pii_scrub",
      (s, dir) => {
        val injected = concat(col("text"),
          lit(" contact u"), col("doc_id").cast("string"),
          lit("@ex.com from 10.0."),
          pmod(col("doc_id"), lit(256)).cast("string"),
          lit(".7 call 555-123-4567"))
        Tables.documents(s, dir)
          .select(col("doc_id"),
            graft.functions.TextFunctions.scrubPii(injected).as("scrubbed"))
          .orderByOnce(col("doc_id"))
      },
      Some("""SELECT doc_id,
             |       regexp_replace(regexp_replace(regexp_replace(
             |         text || ' contact u' || CAST(doc_id AS VARCHAR)
             |           || '@ex.com from 10.0.'
             |           || CAST(doc_id % 256 AS VARCHAR) || '.7 call 555-123-4567',
             |         '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             |         '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
             |         '\b\d{3}-\d{3}-\d{4}\b', '<PHONE>', 'g') AS scrubbed
             |FROM documents ORDER BY doc_id""".stripMargin),
      doc = "PII scrub: email/IPv4/phone -> placeholder tokens, byte-identical to the RE2 oracle"),

    // Unicode normalization (the stage every corpus runs before any
    // hashing/shingling). The synthetic corpus is ASCII-clean, so each
    // doc gets a deterministic gnarly tail: a decomposed e+combining-
    // acute (NFC-composes to U+00E9), a C0 control, an NBSP (must be
    // PRESERVED — only ASCII whitespace collapses), a tab+newline+space
    // run, and trailing spaces. Identical construction on both sides;
    // the oracle builds the chars with chr() so the SQL stays printable.
    Q("text_normalize",
      (s, dir) => {
        val tail = lit("  A\u0001B e\u0301 X\u00A0Y \t\n end  ")
        Tables.documents(s, dir)
          .select(col("doc_id"),
            graft.functions.TextFunctions
              .normalizeText(concat(col("text"), tail)).as("norm_text"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id,
             |       trim(regexp_replace(regexp_replace(
             |         nfc_normalize(text || '  A' || chr(1) || 'B e' || chr(769)
             |           || ' X' || chr(160) || 'Y ' || chr(9) || chr(10) || ' end  '),
             |         '[\x00-\x08\x0E-\x1F\x7F]', '', 'g'),
             |         '[ \t\n\r\x0B\x0C]+', ' ', 'g')) AS norm_text
             |FROM documents ORDER BY doc_id""".stripMargin),
      doc = "Unicode NFC + control strip + ws collapse + trim, one codegen'd pass vs DuckDB nfc_normalize"),

    // Unicode script profile (the langid-adjacent signal: which writing
    // systems a doc actually uses). Counting rides codegen'd
    // regexp_count with Java script properties; the oracle uses RE2's
    // spelling of the SAME Unicode Script property. The ASCII corpus
    // gets a deterministic multi-script tail (repeat() of one char per
    // script, length keyed on doc_id) so every count column varies.
    Q("text_script_profile",
      (s, dir) => {
        val injected = concat(col("text"), lit(" "),
          expr("repeat('\u0430', CAST(doc_id % 4 AS INT))"),
          expr("repeat('\u4e2d', CAST(doc_id % 3 AS INT))"),
          expr("repeat('\u0645', CAST(doc_id % 2 AS INT))"),
          expr("repeat('\u00e9', CAST(doc_id % 5 AS INT))"))
        def sc(p: String) = regexp_count(injected, lit(p)).cast("long")
        val total = greatest(lit(1L),
          sc("\\p{IsLatin}") + sc("\\p{IsCyrillic}")
            + sc("\\p{IsHan}") + sc("\\p{IsArabic}"))
        Tables.documents(s, dir)
          .select(col("doc_id"),
            sc("\\p{IsLatin}").as("n_latin"),
            sc("\\p{IsCyrillic}").as("n_cyr"),
            sc("\\p{IsHan}").as("n_han"),
            sc("\\p{IsArabic}").as("n_arab"),
            round(sc("\\p{IsLatin}") / total.cast("double"), 6)
              .as("latin_ratio"))
          .orderByOnce(col("doc_id"))
      },
      Some("""WITH t AS (SELECT doc_id,
             |    text || ' ' || repeat(chr(1072), CAST(doc_id % 4 AS INT))
             |         || repeat(chr(20013), CAST(doc_id % 3 AS INT))
             |         || repeat(chr(1605), CAST(doc_id % 2 AS INT))
             |         || repeat(chr(233), CAST(doc_id % 5 AS INT)) AS tx
             |  FROM documents),
             |c AS (SELECT doc_id,
             |    CAST(len(regexp_extract_all(tx, '\p{Latin}')) AS BIGINT) AS n_latin,
             |    CAST(len(regexp_extract_all(tx, '\p{Cyrillic}')) AS BIGINT) AS n_cyr,
             |    CAST(len(regexp_extract_all(tx, '\p{Han}')) AS BIGINT) AS n_han,
             |    CAST(len(regexp_extract_all(tx, '\p{Arabic}')) AS BIGINT) AS n_arab
             |  FROM t)
             |SELECT doc_id, n_latin, n_cyr, n_han, n_arab,
             |       round(n_latin / CAST(greatest(1, n_latin + n_cyr + n_han + n_arab)
             |                            AS DOUBLE), 6) AS latin_ratio
             |FROM c ORDER BY doc_id""".stripMargin),
      doc = "Unicode script counts + latin ratio: Java \\p{IsX} vs RE2 \\p{X}, same Script property"),

    // URL quality filtering (the RefinedWeb/C4 provenance stage). The
    // synthetic corpus carries no organic URLs, so each doc gets a
    // deterministic injected tail: every doc links a cdn host whose
    // registrable domain varies by doc_id%3, and every fourth doc also
    // links a blocklisted mirror. Same construction on both sides;
    // patterns in the RE2/Java common dialect.
    Q("text_url_domains",
      (s, dir) => {
        val t2 = urlInjected
        Tables.documents(s, dir)
          .select(col("doc_id"), explode(TextFunctions.urlHosts(t2)).as("host"))
          .groupBy(TextFunctions.registrableDomain(col("host")).as("domain"))
          .agg(count(lit(1)).as("n_links"),
            countDistinct(col("doc_id")).as("n_docs"))
          .orderBy(col("domain"))
      },
      Some(urlInjectedSql +
        """, h AS (SELECT doc_id,
          |         unnest(regexp_extract_all(lower(t2),
          |                'https?://([a-z0-9.-]+)', 1)) AS host
          |       FROM t)
          |SELECT regexp_extract(host,
          |         '([a-z0-9-]+\.[a-z0-9-]+)$|^([a-z0-9-]+)$', 0) AS domain,
          |       count(*) AS n_links, count(DISTINCT doc_id) AS n_docs
          |FROM h GROUP BY domain ORDER BY domain""".stripMargin),
      doc = "URL host extraction + registrable-domain link stats (RefinedWeb provenance features)"),

    // ...and the blocklist drop itself: a doc is removed when ANY of
    // its links resolves to a blocklisted registrable domain. The
    // flagged set is built with a BROADCAST semi-join against the tiny
    // blocklist dim and applied as a doc-level anti-join — the corpus
    // never shuffles; only (doc_id, domain) links do.
    Q("doc_domain_blocklist",
      (s, dir) => {
        import s.implicits._
        val bl = Seq("blocked.net", "spam.io").toDF("domain")
        val docs = Tables.documents(s, dir).select(col("doc_id"), col("source"),
          urlInjected.as("t2"))
        val flagged = docs
          .select(col("doc_id"), explode(TextFunctions.urlHosts(col("t2"))).as("host"))
          .select(col("doc_id"),
            TextFunctions.registrableDomain(col("host")).as("domain"))
          .join(broadcast(bl), "domain")
          .select(col("doc_id")).distinct()
        docs.join(flagged, Seq("doc_id"), "left_anti")
          .groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
          .orderBy(col("source"))
      },
      Some(urlInjectedSql +
        """, h AS (SELECT doc_id,
          |         unnest(regexp_extract_all(lower(t2),
          |                'https?://([a-z0-9.-]+)', 1)) AS host
          |       FROM t),
          |f AS (SELECT DISTINCT doc_id FROM h
          |      WHERE regexp_extract(host,
          |              '([a-z0-9-]+\.[a-z0-9-]+)$|^([a-z0-9-]+)$', 0)
          |            IN ('blocked.net', 'spam.io'))
          |SELECT source, count(*) AS n_docs FROM t
          |WHERE doc_id NOT IN (SELECT doc_id FROM f)
          |GROUP BY source ORDER BY source""".stripMargin),
      doc = "domain-blocklist document filtering: broadcast semi-join flag, doc-level anti-join"),

    // URL canonicalization + URL-level dedup: three raw forms per doc
    // (mixed case + default port + tracking params + unsorted params +
    // fragment; a clean https twin; an http variant on even ids) must
    // collapse to their canonical URLs — the "same URL, different
    // bytes" dedup key every crawl pipeline applies before any content
    // dedup. The oracle re-implements all five canonicalization rules
    // in DuckDB, so the rule set itself is what's being pinned.
    Q("text_url_canonical",
      (s, dir) => {
        val host = concat(lit("cdn"), pmod(col("doc_id"), lit(7)).cast("string"),
          lit(".host"), pmod(col("doc_id"), lit(3)).cast("string"))
        val id = col("doc_id").cast("string")
        val messy = concat(lit("HTTPS://"), upper(host),
          lit(".COM:443/p/"), id, lit("?utm_source=feed&b=2&a=1#sec"))
        val clean = concat(lit("https://"), host, lit(".com/p/"), id,
          lit("?a=1&b=2"))
        val httpAlt = concat(lit("http://"), host, lit(".com:80/p/"), id)
        val raws = when(pmod(col("doc_id"), lit(2)) === 0,
            array(messy, clean, httpAlt))
          .otherwise(array(messy, clean))
        Tables.documents(s, dir)
          .select(col("doc_id"), explode(raws).as("raw"))
          .select(col("doc_id"), col("raw"),
            TextFunctions.canonicalUrl(col("raw")).as("canonical_url"))
          .groupBy(col("canonical_url"))
          .agg(countDistinct(col("raw")).as("n_raw_forms"),
            countDistinct(col("doc_id")).as("n_docs"))
          .orderBy(col("canonical_url"))
      },
      Some("""WITH u AS (
             |  SELECT doc_id,
             |         unnest(CASE WHEN doc_id % 2 = 0 THEN [
             |             'HTTPS://' || upper('cdn' || CAST(doc_id % 7 AS VARCHAR)
             |               || '.host' || CAST(doc_id % 3 AS VARCHAR))
             |               || '.COM:443/p/' || CAST(doc_id AS VARCHAR)
             |               || '?utm_source=feed&b=2&a=1#sec',
             |             'https://cdn' || CAST(doc_id % 7 AS VARCHAR)
             |               || '.host' || CAST(doc_id % 3 AS VARCHAR)
             |               || '.com/p/' || CAST(doc_id AS VARCHAR) || '?a=1&b=2',
             |             'http://cdn' || CAST(doc_id % 7 AS VARCHAR)
             |               || '.host' || CAST(doc_id % 3 AS VARCHAR)
             |               || '.com:80/p/' || CAST(doc_id AS VARCHAR)
             |           ] ELSE [
             |             'HTTPS://' || upper('cdn' || CAST(doc_id % 7 AS VARCHAR)
             |               || '.host' || CAST(doc_id % 3 AS VARCHAR))
             |               || '.COM:443/p/' || CAST(doc_id AS VARCHAR)
             |               || '?utm_source=feed&b=2&a=1#sec',
             |             'https://cdn' || CAST(doc_id % 7 AS VARCHAR)
             |               || '.host' || CAST(doc_id % 3 AS VARCHAR)
             |               || '.com/p/' || CAST(doc_id AS VARCHAR) || '?a=1&b=2'
             |           ] END) AS raw
             |  FROM documents),
             |c AS (
             |  SELECT doc_id, raw,
             |         regexp_replace(raw, '#.*$', '') AS nofrag,
             |         regexp_extract(regexp_replace(raw, '#.*$', ''),
             |           '^([^?]*)', 1) AS base,
             |         regexp_extract(regexp_replace(raw, '#.*$', ''),
             |           '^[^?]*\?(.*)$', 1) AS q
             |  FROM u),
             |parts AS (
             |  SELECT doc_id, raw,
             |         regexp_replace(
             |           regexp_replace(
             |             lower(regexp_extract(base, '(?i)^(https?://[^/]*)', 1)),
             |             '^(http://.*):80$', '\1'),
             |           '^(https://.*):443$', '\1') AS auth,
             |         regexp_replace(base, '(?i)^https?://[^/]*', '') AS path,
             |         coalesce(array_to_string(
             |           list_sort(list_filter(string_split(q, '&'),
             |             p -> p != '' AND NOT regexp_matches(p,
             |                    '^(utm_[^=]*|fbclid|gclid|ref)='))), '&'), '')
             |           AS q2
             |  FROM c),
             |canon AS (
             |  SELECT doc_id, raw,
             |         auth || (CASE WHEN path = '' THEN '/' ELSE path END)
             |              || (CASE WHEN q2 = '' THEN '' ELSE '?' || q2 END)
             |           AS canonical_url
             |  FROM parts)
             |SELECT canonical_url,
             |       count(DISTINCT raw) AS n_raw_forms,
             |       count(DISTINCT doc_id) AS n_docs
             |FROM canon GROUP BY canonical_url
             |ORDER BY canonical_url""".stripMargin),
      doc = "URL canonicalization (case/port/fragment/tracking-param/param-order) + URL-level dedup grouping"),

    // Per-source quality calibration: raw quality scores aren't
    // comparable across sources (different length/stopword profiles),
    // so pipelines threshold on the per-source PERCENTILE of the score
    // (FineWeb-style per-dump thresholds). Tie-break on doc_id keeps
    // ranks deterministic where rounded scores collide.
    Q("quality_calibrated_by_source",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val docs = Tables.documents(s, dir)
        val q = TextAnalysis.qualityScore(docs, "doc_id", "text")
          .join(docs.select(col("doc_id"), col("source")), "doc_id")
        val w = Window.partitionBy(col("source"))
          .orderBy(col("quality"), col("doc_id"))
        q.select(col("doc_id"), col("source"), col("quality"),
            round(percent_rank().over(w), 6).as("quality_pct"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH q AS (
              |  SELECT doc_id, source,
              |         round(least(CAST(len(w) AS DOUBLE) / 100.0, 1.0) * 0.5
              |               + (1.0 - CAST(len(list_filter(w, x -> x IN $stopList))
              |                             AS DOUBLE) / len(w)) * 0.5, 6) AS quality
              |  FROM (SELECT doc_id, source, string_split(text, ' ') w
              |        FROM documents))
              |SELECT doc_id, source, quality,
              |       round(percent_rank() OVER (
              |         PARTITION BY source
              |         ORDER BY quality, doc_id), 6) AS quality_pct
              |FROM q
              |ORDER BY doc_id""".stripMargin),
      doc = "per-source quality percentile calibration (comparable thresholds across sources)"),

    // In-engine classifier TRAINING: integer full-batch descent on the
    // is-English label, weights exactly reproducible by the oracle's
    // unrolled round CTEs (see clfTrainCtes). The engine's driver loop
    // and the SQL agree because every step is integral: bucket counts,
    // hard-sigmoid error in quarter-K units, truncating-division
    // updates.
    Q("text_classifier_train",
      (s, dir) => {
        import s.implicits._
        // shares the memoized training pass with text_quality_classifier
        // (clfCache); the sparse (bucket, weight) projection of the dense
        // table is exactly classifierTrain's own nonzero-filtered output
        clfTrainedDense(s, dir).iterator.zipWithIndex
          .collect { case (wt, j) if wt != 0L => (j.toLong, wt) }.toSeq
          .toDF("bucket", "weight")
          .orderBy(col("bucket"))
      },
      Some {
        s"""WITH ${clfTrainCtes(clfRounds)}
          |SELECT CAST(bb AS BIGINT) AS bucket, CAST(wv AS BIGINT) AS weight
          |FROM w$clfRounds WHERE wv != 0 ORDER BY bucket""".stripMargin
      },
      doc = "in-engine integer SGD: train the fastText-shape weight table, oracle replays every round"),

    // fastText-shape hashed-n-gram linear classifier scoring with the
    // weights text_classifier_train LEARNS (no synthetic table): the
    // engine trains in its driver loop, the oracle re-derives the same
    // weights via the unrolled CTEs and joins them per gram. Per gram
    // both replay the exact hash chain: t61 = Rabin–Karp mod 2^61−1
    // (HUGEINT list_reduce, ASCII-corpus assumption as in
    // text_fingerprint_rolling), bucket = hashSql(t61) % 4096. Integer
    // gram sums make the aggregate order-free, so the only float ops
    // are the final correctly-rounded multiply + divide — hash-exact.
    Q("text_quality_classifier",
      (s, dir) => TextAnalysis.classifierScore(Tables.documents(s, dir),
        "doc_id", "text", clfTrainedDense(s, dir).map(math.toIntExact))
        .orderBy(col("doc_id")),
      Some {
        // LEFT JOIN back onto documents so NULL-text docs surface as
        // (doc_id, 0, NULL) — mirroring the engine's explode_outer
        // semantics — instead of silently vanishing from the gram CTE
        // (string_split(NULL) unnests to zero rows)
        s"""WITH ${clfTrainCtes(clfRounds)},
          |a AS (SELECT b.doc_id, sum(coalesce(tw.wv, 0)) AS __wsum,
          |             count(*) AS n_grams
          |      FROM b LEFT JOIN w$clfRounds tw ON b.bk = tw.bb
          |      GROUP BY b.doc_id)
          |SELECT d.doc_id,
          |       CAST(coalesce(a.n_grams, 0) AS BIGINT) AS n_grams,
          |       0e0 + (1e-3 * a.__wsum) / a.n_grams AS logit
          |FROM documents d LEFT JOIN a ON d.doc_id = a.doc_id
          |ORDER BY d.doc_id""".stripMargin
      },
      doc = "fastText-shape classifier scoring with the in-engine-trained weight table (exact integer sums)"),

    // DSIR importance resampling (Xie et al. 2023): the en-language
    // slice stands in for the target corpus; every doc is scored by
    // the per-gram average log-likelihood ratio of its hashed
    // unigram+bigram buckets under target vs raw. Rides the exact
    // classifier bucket chain (one shared feature CTE), ln + round(6)
    // per the text_perplexity precedent. A doc's own language drives
    // its score, so the en docs surface at the top — the select query
    // pins the deterministic (rounded weight, doc_id) resample rank.
    Q("text_dsir_weights",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        TextAnalysis.dsirLogWeights(docs, docs.filter(col("lang") === "en"),
            "doc_id", "text")
          .select(col("doc_id"), col("n_grams"),
            round(col("avg_log_weight"), 6).as("avg_log_weight"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH $clfGramCtes,
        |tb AS (SELECT bk FROM b JOIN documents USING (doc_id)
        |       WHERE lang = 'en'),
        |tc AS (SELECT bk, count(*) AS c FROM tb GROUP BY bk),
        |tt AS (SELECT count(*) AS t FROM tb),
        |rc AS (SELECT bk, count(*) AS c FROM b GROUP BY bk),
        |rt AS (SELECT count(*) AS t FROM b),
        |lr AS (SELECT rc.bk,
        |         ln((coalesce(tc.c, 0) + 0.5) / (tt.t + 0.5 * 4096))
        |           - ln((rc.c + 0.5) / (rt.t + 0.5 * 4096)) AS w
        |       FROM rc LEFT JOIN tc USING (bk)
        |       CROSS JOIN tt CROSS JOIN rt),
        |d AS (SELECT doc_id, count(*) AS n, sum(w) AS s
        |      FROM b JOIN lr USING (bk) GROUP BY doc_id)
        |SELECT doc_id, n AS n_grams, round(s / n, 6) AS avg_log_weight
        |FROM d ORDER BY doc_id""".stripMargin),
      doc = "DSIR importance log-weights: hashed-n-gram target/raw likelihood ratio per doc"),

    Q("doc_dsir_select",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val w = TextAnalysis.dsirLogWeights(docs,
            docs.filter(col("lang") === "en"), "doc_id", "text")
          .select(col("doc_id"),
            round(col("avg_log_weight"), 6).as("avg_log_weight"))
        w.orderBy(col("avg_log_weight").desc, col("doc_id")).limit(100)
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH $clfGramCtes,
        |tb AS (SELECT bk FROM b JOIN documents USING (doc_id)
        |       WHERE lang = 'en'),
        |tc AS (SELECT bk, count(*) AS c FROM tb GROUP BY bk),
        |tt AS (SELECT count(*) AS t FROM tb),
        |rc AS (SELECT bk, count(*) AS c FROM b GROUP BY bk),
        |rt AS (SELECT count(*) AS t FROM b),
        |lr AS (SELECT rc.bk,
        |         ln((coalesce(tc.c, 0) + 0.5) / (tt.t + 0.5 * 4096))
        |           - ln((rc.c + 0.5) / (rt.t + 0.5 * 4096)) AS w
        |       FROM rc LEFT JOIN tc USING (bk)
        |       CROSS JOIN tt CROSS JOIN rt),
        |d AS (SELECT doc_id, round(sum(w) / count(*), 6) AS avg_log_weight
        |      FROM b JOIN lr USING (bk) GROUP BY doc_id)
        |SELECT doc_id, avg_log_weight FROM (
        |  SELECT doc_id, avg_log_weight FROM d
        |  ORDER BY avg_log_weight DESC, doc_id LIMIT 100)
        |ORDER BY doc_id""".stripMargin),
      doc = "DSIR resample selection: deterministic top-100 by (rounded weight, doc_id)"),

    Q("text_langid",
      (s, dir) => TextAnalysis.langId(Tables.documents(s, dir), "doc_id", "text")
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
             |       CASE WHEN g = 0 THEN 'und'
             |            WHEN c_en = g THEN 'en'
             |            WHEN c_de = g THEN 'de'
             |            WHEN c_es = g THEN 'es'
             |            WHEN c_fr = g THEN 'fr'
             |            WHEN c_zh = g THEN 'zh' END AS lang_pred
             |FROM (SELECT doc_id, c_en, c_de, c_es, c_fr, c_zh,
             |             greatest(c_en, c_de, c_es, c_fr, c_zh) AS g
             |      FROM (SELECT doc_id,
             |              len(list_filter(w, x -> x IN ('the', 'and', 'of'))) AS c_en,
             |              len(list_filter(w, x -> x IN ('der', 'die', 'und'))) AS c_de,
             |              len(list_filter(w, x -> x IN ('el', 'los', 'una'))) AS c_es,
             |              len(list_filter(w, x -> x IN ('le', 'les', 'une'))) AS c_fr,
             |              len(list_filter(w, x -> x IN ('shi', 'bu', 'wo'))) AS c_zh
             |            FROM (SELECT doc_id, string_split(text, ' ') w FROM documents)))
             |ORDER BY doc_id""".stripMargin),
      doc = "heuristic language ID: marker-word argmax with tie preference order"),

    Q("text_repetition",
      (s, dir) => TextAnalysis.repetitionStats(Tables.documents(s, dir), "doc_id", "text")
        .orderBy(col("doc_id")),
      Some("""WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
             |           FROM documents),
             |wc AS (SELECT doc_id, w, count(*) AS c FROM w GROUP BY 1, 2),
             |wa AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n,
             |              max(c) AS mx, count(*) AS d
             |       FROM wc GROUP BY 1),
             |b AS (SELECT doc_id,
             |             unnest(list_transform(range(1, len(l)),
             |                    i -> l[i] || ' ' || l[i+1])) AS bg
             |      FROM (SELECT doc_id, string_split(text, ' ') AS l
             |            FROM documents)),
             |bc AS (SELECT doc_id, bg, count(*) AS c FROM b GROUP BY 1, 2),
             |ba AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS nb,
             |              count(*) AS db
             |       FROM bc GROUP BY 1)
             |SELECT wa.doc_id,
             |       round(CAST(mx AS DOUBLE) / CAST(n AS DOUBLE), 6) AS top_word_frac,
             |       round(CAST(n - d AS DOUBLE) / CAST(n AS DOUBLE), 6) AS dup_word_frac,
             |       COALESCE(round(CAST(nb - db AS DOUBLE) / CAST(nb AS DOUBLE), 6),
             |                0.0) AS dup_2gram_frac
             |FROM wa LEFT JOIN ba ON wa.doc_id = ba.doc_id
             |ORDER BY wa.doc_id""".stripMargin),
      doc = "Gopher-style repetition signals: top-word mass, duplicate-word and duplicate-2-gram fractions"),

    Q("text_fingerprint",
      (s, dir) => TextAnalysis.fingerprints(Tables.documents(s, dir), "doc_id", "text")
        .select(col("doc_id"), col("fp_md5"))
        .orderByOnce(col("doc_id")),
      Some("""SELECT doc_id,
             |       substr(md5(regexp_replace(lower(text), ' +', ' ', 'g')), 1, 16)
             |         AS fp_md5
             |FROM documents ORDER BY doc_id""".stripMargin),
      doc = "document fingerprint: md5-64 over normalized text"),

    // The mod-2^61-1 Rabin-Karp IS expressible in DuckDB: 128-bit
    // HUGEINT arithmetic makes b·131^i mod p exact, and list_reduce
    // carries (hash, power) as a 2-element accumulator. unicode() of a
    // 1-char substring equals the UTF-8 byte for this ASCII corpus.
    // (Kept golden-pinned too — GoldenOutputSpec — as the
    // engine-independent belt to this oracle's braces.)
    Q("text_fingerprint_rolling",
      (s, dir) => TextAnalysis.fingerprints(Tables.documents(s, dir), "doc_id", "text")
        .select(col("doc_id"), col("fp_rolling"))
        .orderByOnce(col("doc_id")),
      Some("""SELECT doc_id,
             |  CAST(list_reduce(
             |    list_prepend([CAST(0 AS HUGEINT), CAST(1 AS HUGEINT)],
             |      list_transform(range(1, length(t) + 1),
             |        i -> [CAST(unicode(substring(t, i, 1)) AS HUGEINT),
             |              CAST(0 AS HUGEINT)])),
             |    (acc, x) -> [(acc[1] + x[1] * acc[2]) % 2305843009213693951,
             |                 (acc[2] * 131) % 2305843009213693951])[1]
             |    AS BIGINT) AS fp_rolling
             |FROM (SELECT doc_id, regexp_replace(lower(text), ' +', ' ', 'g') AS t
             |      FROM documents)
             |ORDER BY doc_id""".stripMargin),
      doc = "document fingerprint: Rabin-Karp rolling hash (HUGEINT modular oracle)"),

    Q("text_vocab_by_lang",
      (s, dir) => Tables.documents(s, dir)
        .select(col("lang"),
          explode(graft.functions.TextFunctions.words(col("text"))).as("tok"))
        .groupBy(col("lang"))
        .agg(countDistinct(col("tok")).as("vocab"),
          count(lit(1)).as("total_tokens"))
        .orderBy(col("lang")),
      Some("""SELECT lang,
             |       count(DISTINCT tok) AS vocab,
             |       count(*) AS total_tokens
             |FROM (SELECT lang, unnest(string_split(text, ' ')) AS tok
             |      FROM documents)
             |GROUP BY lang ORDER BY lang""".stripMargin),
      doc = "distinct-aggregate: per-language vocabulary size (expand+dedup shuffle)"),

    // Per-doc unigram Shannon entropy (nats) — the "templated text"
    // quality signal: low entropy = repetitive/boilerplate. Computed
    // as ln(n) - sum(c*ln c)/n so the aggregate needs no second pass
    // for n; round(,6) absorbs the unordered-sum last-bit noise (the
    // text_perplexity precedent — both engines use the same libm ln
    // over identical integer counts).
    Q("text_unigram_entropy",
      (s, dir) => {
        val tc = Tables.documents(s, dir)
          .select(col("doc_id"),
            explode(TextFunctions.words(col("text"))).as("tok"))
          .groupBy(col("doc_id"), col("tok"))
          .agg(count(lit(1)).as("c"))
        tc.groupBy(col("doc_id"))
          .agg(sum(col("c")).as("n_words"),
            count(lit(1)).as("vocab"),
            round(log(sum(col("c")).cast("double")) -
              sum(col("c").cast("double") * log(col("c").cast("double"))) /
                sum(col("c")).cast("double"), 6).as("entropy_nats"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH tc AS (
             |  SELECT doc_id, tok, count(*) AS c
             |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
             |        FROM documents)
             |  GROUP BY doc_id, tok)
             |SELECT doc_id,
             |       CAST(sum(c) AS BIGINT) AS n_words,
             |       count(*) AS vocab,
             |       round(ln(CAST(sum(c) AS DOUBLE))
             |             - sum(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE)))
             |               / CAST(sum(c) AS DOUBLE), 6) AS entropy_nats
             |FROM tc GROUP BY doc_id ORDER BY doc_id""".stripMargin),
      doc = "per-doc unigram Shannon entropy (boilerplate signal): ln(n) - sum(c ln c)/n"),

    // Per-source dataset card — the manifest a curated corpus ships
    // with: volume, length, language spread, top language, and exact-
    // duplicate mass per source. Everything is exact integer counts or
    // a single int/int division; top_lang breaks count ties on the
    // lexicographically smallest language.
    Q("doc_dataset_card",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val docs = Tables.documents(s, dir)
        val base = docs.select(col("source"), col("lang"),
          size(TextFunctions.words(col("text"))).cast("long").as("nw"),
          md5(col("text")).as("h"))
        val stats = base.groupBy(col("source")).agg(
          count(lit(1)).as("n_docs"),
          sum(col("nw")).as("n_words"),
          round(sum(col("nw")).cast("double") / count(lit(1)), 6)
            .as("mean_doc_words"),
          countDistinct(col("lang")).as("n_langs"),
          (count(lit(1)) - countDistinct(col("h"))).as("exact_dup_docs"))
        val w = Window.partitionBy(col("source"))
          .orderBy(col("lc").desc, col("lang"))
        val topLang = base.groupBy(col("source"), col("lang"))
          .agg(count(lit(1)).as("lc"))
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") === 1)
          .select(col("source"), col("lang").as("top_lang"))
        stats.join(topLang, "source").orderBy(col("source"))
      },
      Some("""WITH base AS (
             |  SELECT source, lang,
             |         CAST(len(string_split(text, ' ')) AS BIGINT) AS nw,
             |         md5(text) AS h
             |  FROM documents),
             |stats AS (
             |  SELECT source, count(*) AS n_docs,
             |         CAST(sum(nw) AS BIGINT) AS n_words,
             |         round(CAST(sum(nw) AS DOUBLE) / count(*), 6)
             |           AS mean_doc_words,
             |         count(DISTINCT lang) AS n_langs,
             |         count(*) - count(DISTINCT h) AS exact_dup_docs
             |  FROM base GROUP BY source),
             |tl AS (
             |  SELECT source, lang AS top_lang,
             |         row_number() OVER (PARTITION BY source
             |                            ORDER BY count(*) DESC, lang) AS rk
             |  FROM base GROUP BY source, lang)
             |SELECT s.source, s.n_docs, s.n_words, s.mean_doc_words,
             |       s.n_langs, s.exact_dup_docs, tl.top_lang
             |FROM stats s JOIN tl ON tl.source = s.source AND tl.rk = 1
             |ORDER BY s.source""".stripMargin),
      doc = "per-source dataset card: volume, mean length, language spread, top lang, exact-dup mass"),

    // EXACT heavy hitters (tokens with frequency >= 1/500 of the
    // corpus) via per-partition Misra-Gries candidate generation + an
    // exact broadcast-probe verify — the scale-first alternative to
    // groupBy over billions of near-singleton token keys. The sketch
    // only PRUNES (guaranteed superset), so the result is exact and
    // partitioning-independent; the oracle is the naive full groupBy.
    Q("text_heavy_hitters",
      (s, dir) => TextAnalysis.heavyHitters(
          Tables.documents(s, dir), "text", thetaNum = 1L, thetaDen = 500L)
        .orderBy(col("cnt").desc, col("tok")),
      Some("""WITH toks AS (
             |  SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
             |n AS (SELECT count(*) AS n_total FROM toks)
             |SELECT tok, count(*) AS cnt, n.n_total
             |FROM toks CROSS JOIN n
             |GROUP BY tok, n.n_total
             |HAVING count(*) * 500 >= n.n_total
             |ORDER BY cnt DESC, tok""".stripMargin),
      doc = "exact heavy hitters: Misra-Gries per-partition candidates + broadcast verify (never shuffles the vocabulary)"),

    // Exact quantiles of the token-count distribution per language —
    // the length profile a pretraining mix is tuned against. Spark's
    // `percentile` and DuckDB's `quantile_cont` both interpolate
    // linearly; round(,6) absorbs last-bit arithmetic-order noise.
    // At 100 TB swap percentile for approx_percentile (t-digest sketch,
    // map-side combinable) — the exact form shuffles every value.
    Q("text_token_quantiles",
      (s, dir) => Tables.documents(s, dir)
        .select(col("lang"), size(split(col("text"), " ")).as("n_words"))
        .groupBy(col("lang"))
        .agg(
          round(expr("percentile(n_words, 0.25)"), 6).as("p25"),
          round(expr("percentile(n_words, 0.5)"), 6).as("p50"),
          round(expr("percentile(n_words, 0.75)"), 6).as("p75"),
          round(expr("percentile(n_words, 0.95)"), 6).as("p95"),
          count(lit(1)).as("n_docs"))
        .orderBy(col("lang")),
      Some("""SELECT lang,
             |       round(quantile_cont(n_words, 0.25), 6) AS p25,
             |       round(quantile_cont(n_words, 0.50), 6) AS p50,
             |       round(quantile_cont(n_words, 0.75), 6) AS p75,
             |       round(quantile_cont(n_words, 0.95), 6) AS p95,
             |       count(*) AS n_docs
             |FROM (SELECT lang, len(string_split(text, ' ')) AS n_words
             |      FROM documents)
             |GROUP BY lang ORDER BY lang""".stripMargin),
      doc = "exact token-count quantiles per language (percentile agg; t-digest at scale)"),

    // TF-IDF top terms: tf per (doc, term) is one expand+aggregate; df
    // per term is a second aggregate over the SAME expanded relation;
    // the doc-count scalar broadcasts. Restricted to doc_id < 50 on the
    // tf side to bound output; df/N stay corpus-wide (that's the point
    // of idf). Ties broken by term so top-3 is deterministic.
    Q("text_tfidf_top_terms",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val docs = Tables.documents(s, dir)
        val toks = docs.select(col("doc_id"),
          explode(graft.functions.TextFunctions.words(col("text"))).as("term"))
        val df = toks.groupBy(col("term"))
          .agg(countDistinct(col("doc_id")).as("df"))
        val n = docs.agg(count(lit(1)).as("n_docs"))
        val tf = toks.filter(col("doc_id") < 50)
          .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
        val w = Window.partitionBy(col("doc_id"))
          .orderBy(col("tfidf").desc, col("term"))
        tf.join(df, "term").crossJoin(broadcast(n))
          .withColumn("tfidf",
            round(col("tf") * log((col("n_docs") + lit(1)).cast("double")
              / (col("df") + lit(1)).cast("double")), 6))
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 3)
          .select(col("doc_id"), col("rk"), col("term"), col("tf"), col("df"), col("tfidf"))
          .orderBy(col("doc_id"), col("rk"))
      },
      Some("""WITH toks AS (
             |  SELECT doc_id, unnest(string_split(text, ' ')) AS term
             |  FROM documents),
             |df AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY term),
             |n AS (SELECT count(*) AS n_docs FROM documents),
             |tf AS (SELECT doc_id, term, count(*) AS tf
             |       FROM toks WHERE doc_id < 50 GROUP BY doc_id, term),
             |scored AS (
             |  SELECT tf.doc_id, tf.term, tf.tf, df.df,
             |         round(tf.tf * ln((n.n_docs + 1) / CAST(df.df + 1 AS DOUBLE)), 6)
             |           AS tfidf
             |  FROM tf JOIN df USING (term) CROSS JOIN n),
             |ranked AS (
             |  SELECT doc_id, term, tf, df, tfidf,
             |         CAST(row_number() OVER (PARTITION BY doc_id
             |                ORDER BY tfidf DESC, term) AS INTEGER) AS rk
             |  FROM scored)
             |SELECT doc_id, rk, term, tf, df, tfidf
             |FROM ranked WHERE rk <= 3
             |ORDER BY doc_id, rk""".stripMargin),
      doc = "TF-IDF top-3 terms per doc: corpus-wide df + broadcast doc count + per-doc rank"),

    // The INDEX-BUILD side of BM25's query side: per-term posting-list
    // layout with d-gap delta encoding and varint byte accounting —
    // what a shard planner sums to pack terms into equal-byte index
    // segments. The per-term rollup (df, total tf, postings bytes)
    // hash-pins every gap in every posting list (the byte sum is a
    // function of the full gap sequence); df >= 5 keeps the output to
    // the terms a planner actually budgets. Windows partition BY TERM
    // — the vocabulary distributes, no global sort.
    Q("text_postings_layout",
      (s, dir) => TextAnalysis.postingsLayout(
          Tables.documents(s, dir), "doc_id", "text")
        .groupBy(col("term"))
        .agg(count(lit(1)).as("df"), sum(col("tf")).as("total_tf"),
          sum(col("vbytes")).as("postings_bytes"))
        .filter(col("df") >= 5)
        .orderBy(col("term")),
      Some("""WITH t AS (SELECT doc_id,
             |             unnest(string_split(text, ' ')) AS term
             |           FROM documents),
             |tf AS (SELECT term, doc_id, count(*) AS tf
             |       FROM t GROUP BY 1, 2),
             |g AS (SELECT term, doc_id, tf,
             |        doc_id - coalesce(lag(doc_id) OVER (
             |          PARTITION BY term ORDER BY doc_id), 0) AS gap
             |      FROM tf)
             |SELECT term, count(*) AS df,
             |       CAST(sum(tf) AS BIGINT) AS total_tf,
             |       CAST(sum((length(bin(gap)) + 6) // 7) AS BIGINT)
             |         AS postings_bytes
             |FROM g GROUP BY term HAVING count(*) >= 5
             |ORDER BY term""".stripMargin),
      doc = "inverted-index postings layout: d-gap delta encoding + varint byte accounting per term; the shard planner's byte budget, windows partitioned by term"),

    // The PHRASE-QUERY side of the index: positional postings with
    // their own per-(term, doc) delta chain — summed with the doc-gap
    // bytes this is the full index-size estimator. The rollup's byte
    // sum hash-pins every position gap of every posting (a repeated
    // term inside one doc exercises the within-doc chain).
    Q("text_postings_positional",
      (s, dir) => TextAnalysis.positionalPostings(
          Tables.documents(s, dir), "doc_id", "text")
        .groupBy(col("term"))
        .agg(count(lit(1)).as("df"), sum(col("tf")).as("total_tf"),
          sum(col("pos_bytes")).as("positions_bytes"))
        .filter(col("df") >= 5)
        .orderBy(col("term")),
      Some("""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS s
             |              FROM documents),
             |tp AS (SELECT doc_id, s[i] AS term, i - 1 AS pos
             |       FROM (SELECT doc_id, s,
             |               unnest(range(1, len(s) + 1)) AS i
             |             FROM toks)),
             |pg AS (SELECT term, doc_id, pos,
             |         pos - coalesce(lag(pos) OVER (
             |           PARTITION BY term, doc_id ORDER BY pos), 0) AS gap
             |       FROM tp),
             |pd AS (SELECT term, doc_id, count(*) AS tf,
             |         CAST(sum((length(bin(gap)) + 6) // 7) AS BIGINT)
             |           AS pos_bytes
             |       FROM pg GROUP BY 1, 2)
             |SELECT term, count(*) AS df,
             |       CAST(sum(tf) AS BIGINT) AS total_tf,
             |       CAST(sum(pos_bytes) AS BIGINT) AS positions_bytes
             |FROM pd GROUP BY term HAVING count(*) >= 5
             |ORDER BY term""".stripMargin),
      doc = "positional postings (phrase-query index): per-(term, doc) position delta chains with varint accounting; windows partition by (term, doc) — finer than per-term, stop-word-proof"),

    // The INCREMENTAL-INDEX update budget: posting-level churn between
    // two crawl snapshots (the doc_crawl_diff plant law — gone docs at
    // id%7=0, changed docs append a token at id%5=0, new docs arrive
    // at id%13=0 under offset ids), rolled up per term as the
    // adds/deletes an indexer applies instead of rebuilding. Changed
    // docs surface ONLY their changed term (one added posting for
    // 'updated'), gone/new docs surface every term — exactly the
    // shape's point: update cost scales with churn, not corpus.
    Q("text_index_update_budget",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val newDocs = docs.filter(pmod(col("doc_id"), lit(7)) =!= 0)
          .select(col("doc_id"),
            when(pmod(col("doc_id"), lit(5)) === 0,
              concat(col("text"), lit(" updated")))
              .otherwise(col("text")).as("text"))
          .unionByName(docs.filter(pmod(col("doc_id"), lit(13)) === 0)
            .select((col("doc_id") + 100000).as("doc_id"), col("text")))
        TextAnalysis.postingsDiff(docs, newDocs, "doc_id", "text")
          .groupBy(col("term"))
          .agg(sum(when(col("status") === "added", 1L).otherwise(0L))
              .as("n_add"),
            sum(when(col("status") === "removed", 1L).otherwise(0L))
              .as("n_del"))
          .orderBy(col("term"))
      },
      Some("""WITH newd AS (
             |  SELECT doc_id,
             |         CASE WHEN doc_id % 5 = 0 THEN text || ' updated'
             |              ELSE text END AS text
             |  FROM documents WHERE doc_id % 7 <> 0
             |  UNION ALL
             |  SELECT doc_id + 100000, text FROM documents
             |  WHERE doc_id % 13 = 0),
             |ot AS (SELECT DISTINCT doc_id,
             |         unnest(string_split(text, ' ')) AS term
             |       FROM documents),
             |nt AS (SELECT DISTINCT doc_id,
             |         unnest(string_split(text, ' ')) AS term
             |       FROM newd),
             |d AS (SELECT coalesce(ot.term, nt.term) AS term,
             |             CASE WHEN nt.term IS NULL THEN 'removed'
             |                  ELSE 'added' END AS status
             |      FROM ot FULL OUTER JOIN nt
             |        ON ot.term = nt.term AND ot.doc_id = nt.doc_id
             |      WHERE ot.term IS NULL OR nt.term IS NULL)
             |SELECT term,
             |       CAST(count(*) FILTER (status = 'added') AS BIGINT)
             |         AS n_add,
             |       CAST(count(*) FILTER (status = 'removed') AS BIGINT)
             |         AS n_del
             |FROM d GROUP BY term ORDER BY term""".stripMargin),
      doc = "incremental-index update budget: posting-level added/removed churn between crawl snapshots, per-term rollup; distinct (term, doc) relations full-outer join — cost scales with churn, not corpus"),

    // The LIVE side of the update budget (batch twin of
    // TextAnalysis.postingsDiffStream, whose stream ≡ batch pin lives
    // in TextAnalysisSpec): each arriving doc's distinct terms
    // anti-join the previous snapshot's broadcast posting keys —
    // postings to add NOW, judged per fetch, no state. `removed`
    // stays with the batch diff (end-of-crawl verdict).
    Q("text_index_update_live",
      (s, dir) => {
        import graft.functions.TextFunctions
        val docs = Tables.documents(s, dir)
        val newDocs = docs.filter(pmod(col("doc_id"), lit(7)) =!= 0)
          .select(col("doc_id"),
            when(pmod(col("doc_id"), lit(5)) === 0,
              concat(col("text"), lit(" updated")))
              .otherwise(col("text")).as("text"))
          .unionByName(docs.filter(pmod(col("doc_id"), lit(13)) === 0)
            .select((col("doc_id") + 100000).as("doc_id"), col("text")))
        val oldPostings = docs.select(col("doc_id"),
          explode(array_distinct(TextFunctions.words(col("text"))))
            .as("term"))
        TextAnalysis.postingsDiffStream(newDocs, oldPostings,
            "doc_id", "text")
          .groupBy(col("term")).agg(count(lit(1)).as("n_add"))
          .orderBy(col("term"))
      },
      Some("""WITH newd AS (
             |  SELECT doc_id,
             |         CASE WHEN doc_id % 5 = 0 THEN text || ' updated'
             |              ELSE text END AS text
             |  FROM documents WHERE doc_id % 7 <> 0
             |  UNION ALL
             |  SELECT doc_id + 100000, text FROM documents
             |  WHERE doc_id % 13 = 0),
             |ot AS (SELECT DISTINCT doc_id,
             |         unnest(string_split(text, ' ')) AS term
             |       FROM documents),
             |nt AS (SELECT DISTINCT doc_id,
             |         unnest(string_split(text, ' ')) AS term
             |       FROM newd),
             |a AS (SELECT nt.term FROM nt
             |      LEFT JOIN ot ON ot.term = nt.term
             |                  AND ot.doc_id = nt.doc_id
             |      WHERE ot.term IS NULL)
             |SELECT term, count(*) AS n_add
             |FROM a GROUP BY term ORDER BY term""".stripMargin),
      doc = "live index-update feed (batch twin): per-fetch added postings via anti-join against the broadcast previous-snapshot keys; stateless, stream == batch spec-pinned"),

    // The EARLY-TERMINATION storage layout (Anh & Moffat impact
    // ordering): within each term the top-8 postings by quantized
    // score bound, highest first — serving this first block IS the
    // MaxScore skip structure materialized. rank<=n over the per-term
    // window rewrites to WindowGroupLimit (stop-word postings prune
    // map-side, the doc_host_cap shape, PlanAuditSpec-pinned).
    Q("text_postings_impact",
      (s, dir) => TextAnalysis.impactOrderedPostings(
          Tables.documents(s, dir), "doc_id", "text")
        .orderBy(col("term"), col("rk")),
      Some("""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w
             |              FROM documents),
             |dl AS (SELECT doc_id, len(w) AS dl FROM toks),
             |corpus AS (SELECT count(*) AS n, sum(dl) AS tot FROM dl),
             |tf AS (SELECT term, doc_id, count(*) AS tf
             |       FROM (SELECT doc_id, unnest(w) AS term FROM toks)
             |       GROUP BY 1, 2),
             |q AS (SELECT term, tf.doc_id, tf,
             |        CAST(floor(32.0 * tf
             |          / (tf + 1.2 * ((1.0 - 0.75)
             |             + 0.75 * dl.dl
             |               / (CAST(corpus.tot AS DOUBLE) / corpus.n))))
             |          AS BIGINT) AS impact
             |      FROM tf JOIN dl USING (doc_id) CROSS JOIN corpus),
             |r AS (SELECT term, doc_id, tf, impact,
             |        CAST(row_number() OVER (PARTITION BY term
             |          ORDER BY impact DESC, tf DESC, doc_id) AS INTEGER)
             |          AS rk
             |      FROM q)
             |SELECT term, rk, doc_id, tf, impact
             |FROM r WHERE rk <= 8
             |ORDER BY term, rk""".stripMargin),
      doc = "impact-ordered postings (Anh & Moffat): per-term top-8 by quantized tf-saturation bound — the materialized MaxScore skip structure; WindowGroupLimit prunes stop-word postings map-side"),

    // Phrase-query evaluation — the consumer the positional index
    // serves: docs where the 3 phrase terms occupy consecutive
    // positions, overlapping occurrences counted (positional-index
    // semantics). Each join moves one term's postings only.
    Q("text_phrase_match",
      (s, dir) => TextAnalysis.phraseMatches(Tables.documents(s, dir),
          "doc_id", "text", Seq("slow", "hash", "batch"))
        .orderBy(col("doc_id")),
      Some("""WITH tp AS (SELECT doc_id, i - 1 AS pos, s[i] AS term
             |            FROM (SELECT doc_id, s,
             |                    unnest(range(1, len(s) + 1)) AS i
             |                  FROM (SELECT doc_id,
             |                          string_split(text, ' ') AS s
             |                        FROM documents))),
             |m AS (SELECT a.doc_id
             |      FROM tp a
             |      JOIN tp b ON b.doc_id = a.doc_id
             |              AND b.pos = a.pos + 1 AND b.term = 'hash'
             |      JOIN tp c ON c.doc_id = a.doc_id
             |              AND c.pos = a.pos + 2 AND c.term = 'batch'
             |      WHERE a.term = 'slow')
             |SELECT doc_id, count(*) AS n_matches
             |FROM m GROUP BY doc_id ORDER BY doc_id""".stripMargin),
      doc = "exact phrase matching over token positions (the positional index's query side): per-term position relations aligned on start offset — each join moves one term's postings, overlapping matches counted"),

    // Per-doc posting churn over the fetch SEQUENCE (batch twin of the
    // keyed-state streaming form, whose stream ≡ batch pin lives in
    // TextAnalysisSpec): each re-fetch diffs against the same doc's
    // previous fetch — `removed` postings surface the moment the
    // changed page arrives, which the end-of-crawl diff cannot do.
    // The plant re-fetches every 5th doc with its first word dropped
    // and ' updated' appended, so both statuses carry real rows.
    Q("text_index_churn",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val base = 1767225600L
        val f1 = docs.select(col("doc_id"),
          timestamp_seconds(lit(base)).as("ts"), col("text"))
        val f2 = docs.filter(pmod(col("doc_id"), lit(5)) === 0)
          .select(col("doc_id"),
            timestamp_seconds(lit(base) + 100).as("ts"),
            concat(regexp_replace(col("text"), "^[^ ]+ ", ""),
              lit(" updated")).as("text"))
        TextAnalysis.postingsChurn(f1.unionByName(f2),
            "doc_id", "text", "ts")
          .orderBy(col("doc_id"), col("seq"), col("status"), col("term"))
      },
      Some("""WITH f AS (
             |  SELECT doc_id, 1 AS seq, text FROM documents
             |  UNION ALL
             |  SELECT doc_id, 2,
             |         regexp_replace(text, '^[^ ]+ ', '') || ' updated'
             |  FROM documents WHERE doc_id % 5 = 0),
             |t AS (SELECT DISTINCT doc_id, seq,
             |        unnest(string_split(text, ' ')) AS term
             |      FROM f),
             |a AS (SELECT cur.doc_id, cur.seq, cur.term,
             |             'added' AS status
             |      FROM t cur LEFT JOIN t prev
             |        ON prev.doc_id = cur.doc_id
             |       AND prev.seq = cur.seq - 1 AND prev.term = cur.term
             |      WHERE prev.term IS NULL),
             |r AS (SELECT prev.doc_id, prev.seq + 1 AS seq, prev.term,
             |             'removed' AS status
             |      FROM t prev
             |      JOIN (SELECT DISTINCT doc_id, seq FROM t) nxt
             |        ON nxt.doc_id = prev.doc_id AND nxt.seq = prev.seq + 1
             |      LEFT JOIN t cur
             |        ON cur.doc_id = prev.doc_id
             |       AND cur.seq = prev.seq + 1 AND cur.term = prev.term
             |      WHERE cur.term IS NULL)
             |SELECT doc_id, CAST(seq AS INTEGER) AS seq, term, status
             |FROM (SELECT * FROM a UNION ALL SELECT * FROM r)
             |ORDER BY doc_id, seq, status, term""".stripMargin),
      doc = "per-doc posting churn over the fetch sequence: added/removed vs the SAME doc's previous fetch — removes visible per fetch; dense_rank per doc + two anti-joins on (doc, seq, term) keys"),

    // Posting-list CODEC comparison: per-term varint bytes vs
    // frame-of-reference blocks (128-gap blocks, one width byte + n
    // gaps at the block's max bit width — the Lucene/PFoR family's
    // unpatched baseline). The layout decision an index build makes,
    // as a measured relation: FoR wins on uniform gap runs, loses to
    // varint when one outlier gap widens a whole block — both
    // accounted exactly, same bin() bitlen discipline, windows
    // partitioned by term throughout.
    Q("text_postings_codec",
      (s, dir) => TextAnalysis.postingsCodecPick(
          Tables.documents(s, dir), "doc_id", "text")
        .select(col("term"), col("df"), col("varint_bytes"),
          col("for_bytes"))
        .filter(col("df") >= 5)
        .orderBy(col("term")),
      Some("""WITH t AS (SELECT doc_id,
             |             unnest(string_split(text, ' ')) AS term
             |           FROM documents),
             |tf AS (SELECT term, doc_id, count(*) AS tf
             |       FROM t GROUP BY 1, 2),
             |g AS (SELECT term, doc_id,
             |        doc_id - coalesce(lag(doc_id) OVER (
             |          PARTITION BY term ORDER BY doc_id), 0) AS gap,
             |        row_number() OVER (
             |          PARTITION BY term ORDER BY doc_id) AS rn
             |      FROM tf),
             |b AS (SELECT term, gap, (rn - 1) // 128 AS blk,
             |        length(bin(gap)) AS bits,
             |        (length(bin(gap)) + 6) // 7 AS vb
             |      FROM g),
             |fb AS (SELECT term,
             |         CAST(sum(1 + (n * mb + 7) // 8) AS BIGINT)
             |           AS for_bytes
             |       FROM (SELECT term, blk, count(*) AS n,
             |               max(bits) AS mb
             |             FROM b GROUP BY 1, 2)
             |       GROUP BY term)
             |SELECT b.term, count(*) AS df,
             |       CAST(sum(vb) AS BIGINT) AS varint_bytes, fb.for_bytes
             |FROM b JOIN fb ON b.term = fb.term
             |GROUP BY b.term, fb.for_bytes
             |HAVING count(*) >= 5
             |ORDER BY b.term""".stripMargin),
      doc = "posting-list codec comparison: varint vs 128-gap frame-of-reference blocks (width byte + max-bit-width gaps) — the index build's layout decision as an exactly-accounted relation"),

    // The codec DECISION consumed (r14 verdict stretch): per term the
    // Lucene-style pick — the smaller of varint vs FoR — plus its
    // stored byte cost, rolled up per codec so the output reads as the
    // index build's capacity summary: how many terms each codec wins,
    // the bytes they store, and the bytes the pick saves vs all-varint.
    Q("text_postings_codec_pick",
      (s, dir) => {
        import s.implicits._
        // the corpus' df >= 2 terms are all dense (FoR territory), so
        // the varint branch gets a CONSTANT plant: one term in exactly
        // two docs 2^48 ids apart — varint pays the wide gap once
        // (5 + 7 bytes), FoR widens the whole 2-gap block to 49 bits
        // (1 + 13 bytes); sf-independent, so both branches are pinned
        // at every scale the driver verifies
        val plant = Seq(
          (900000000L, "zzcodecpick"),
          (900000000L + (1L << 48), "zzcodecpick")).toDF("doc_id", "text")
        TextAnalysis.postingsCodecPick(
            Tables.documents(s, dir).select($"doc_id", $"text")
              .unionByName(plant), "doc_id", "text")
          .filter(col("df") >= 2)
          .groupBy(col("codec"))
          .agg(count(lit(1)).as("n_terms"),
            sum(col("df")).as("n_postings"),
            sum(col("stored_bytes")).as("stored_bytes"),
            sum(col("varint_bytes") - col("stored_bytes"))
              .as("saved_vs_varint"))
          .orderBy(col("codec"))
      },
      Some("""WITH t AS (SELECT doc_id,
             |             unnest(string_split(text, ' ')) AS term
             |           FROM (SELECT doc_id, text FROM documents
             |                 UNION ALL
             |                 SELECT * FROM (VALUES
             |                   (CAST(900000000 AS BIGINT), 'zzcodecpick'),
             |                   (CAST(281475876710656 AS BIGINT), 'zzcodecpick'))
             |                   v(doc_id, text))),
             |tf AS (SELECT term, doc_id, count(*) AS tf
             |       FROM t GROUP BY 1, 2),
             |g AS (SELECT term, doc_id,
             |        doc_id - coalesce(lag(doc_id) OVER (
             |          PARTITION BY term ORDER BY doc_id), 0) AS gap,
             |        row_number() OVER (
             |          PARTITION BY term ORDER BY doc_id) AS rn
             |      FROM tf),
             |b AS (SELECT term, gap, (rn - 1) // 128 AS blk,
             |        length(bin(gap)) AS bits,
             |        (length(bin(gap)) + 6) // 7 AS vb
             |      FROM g),
             |fb AS (SELECT term,
             |         CAST(sum(1 + (n * mb + 7) // 8) AS BIGINT)
             |           AS for_bytes
             |       FROM (SELECT term, blk, count(*) AS n,
             |               max(bits) AS mb
             |             FROM b GROUP BY 1, 2)
             |       GROUP BY term),
             |pt AS (SELECT b.term, count(*) AS df,
             |         CAST(sum(vb) AS BIGINT) AS varint_bytes,
             |         fb.for_bytes
             |       FROM b JOIN fb ON b.term = fb.term
             |       GROUP BY b.term, fb.for_bytes
             |       HAVING count(*) >= 2),
             |pk AS (SELECT CASE WHEN for_bytes < varint_bytes
             |                   THEN 'for' ELSE 'varint' END AS codec,
             |              df, varint_bytes,
             |              least(for_bytes, varint_bytes) AS stored
             |       FROM pt)
             |SELECT codec, count(*) AS n_terms,
             |       CAST(sum(df) AS BIGINT) AS n_postings,
             |       CAST(sum(stored) AS BIGINT) AS stored_bytes,
             |       CAST(sum(varint_bytes - stored) AS BIGINT)
             |         AS saved_vs_varint
             |FROM pk GROUP BY codec ORDER BY codec""".stripMargin),
      doc = "per-term codec pick consumed: the smaller of varint vs FoR per term (the Lucene decision), rolled up per codec with the byte savings vs all-varint — the index build's capacity summary"),

    // TRUE patched FoR joins the pick (round 16 — the codec the r15
    // record left as "PFoR/Simple-8b stay candidates: their
    // greedy/patch decisions are sequential within a block"). The
    // width search turned out NOT to need a sequential form: a
    // per-(block, bitlen) histogram joined to the 32 candidate widths
    // prices every (b, exceptions) split relationally and the block
    // takes the min — see TextAnalysis.postingsCodecPfor. Plants pin
    // all the interesting branches sf-independently: the codec_pick
    // wide-gap pair keeps varint winning somewhere (12 B vs FoR 14 vs
    // best-patched 16), and a 121-doc run-of-gap-1 with one 2^45
    // outlier IN THE SAME BLOCK is the canonical PFoR case (patch 2
    // exceptions at width 1: 31 B vs varint 131 vs FoR 697). The
    // 'for' branch is planted too — a 128-posting run with every gap
    // exactly 64 (7 bits, first gap included) has NO patch that pays:
    // pfor ties FoR at 113 B < varint 128 B and the tie rule prefers
    // the cheaper decode (this corpus' dense terms all patch
    // profitably somewhere, measured, so the tie needs the plant).
    Q("text_postings_codec_pfor",
      (s, dir) => {
        import s.implicits._
        val plant = (Seq(
          (900000000L, "zzcodecpick"),
          (900000000L + (1L << 48), "zzcodecpick"),
          (900000000L + (1L << 45), "zzpforwin")) ++
          (0 to 120).map(i => (900001000L + i, "zzpforwin")) ++
          (1 to 128).map(i => (64L * i, "zzforwin")))
          .toDF("doc_id", "text")
        TextAnalysis.postingsCodecPfor(
            Tables.documents(s, dir).select($"doc_id", $"text")
              .unionByName(plant), "doc_id", "text")
          .filter(col("df") >= 2)
          .groupBy(col("codec"))
          .agg(count(lit(1)).as("n_terms"),
            sum(col("df")).as("n_postings"),
            sum(col("stored_bytes")).as("stored_bytes"),
            sum(col("varint_bytes") - col("stored_bytes"))
              .as("saved_vs_varint"),
            sum(col("for_bytes") - col("stored_bytes"))
              .as("saved_vs_for"))
          .orderBy(col("codec"))
      },
      Some("""WITH t AS (SELECT doc_id,
             |             unnest(string_split(text, ' ')) AS term
             |           FROM (SELECT doc_id, text FROM documents
             |                 UNION ALL
             |                 SELECT * FROM (VALUES
             |                   (CAST(900000000 AS BIGINT), 'zzcodecpick'),
             |                   (CAST(281475876710656 AS BIGINT), 'zzcodecpick'),
             |                   (CAST(35185272088832 AS BIGINT), 'zzpforwin'))
             |                   v(doc_id, text)
             |                 UNION ALL
             |                 SELECT CAST(900001000 + i AS BIGINT),
             |                        'zzpforwin'
             |                 FROM generate_series(0, 120) s(i)
             |                 UNION ALL
             |                 SELECT CAST(64 * i AS BIGINT), 'zzforwin'
             |                 FROM generate_series(1, 128) s2(i))),
             |tf AS (SELECT term, doc_id, count(*) AS tf
             |       FROM t GROUP BY 1, 2),
             |g AS (SELECT term, doc_id,
             |        doc_id - coalesce(lag(doc_id) OVER (
             |          PARTITION BY term ORDER BY doc_id), 0) AS gap,
             |        row_number() OVER (
             |          PARTITION BY term ORDER BY doc_id) AS rn
             |      FROM tf),
             |b AS (SELECT term, gap, (rn - 1) // 128 AS blk,
             |        length(bin(gap)) AS bits,
             |        (length(bin(gap)) + 6) // 7 AS vb
             |      FROM g),
             |fb AS (SELECT term,
             |         CAST(sum(1 + (n * mb + 7) // 8) AS BIGINT)
             |           AS for_bytes
             |       FROM (SELECT term, blk, count(*) AS n,
             |               max(bits) AS mb
             |             FROM b GROUP BY 1, 2)
             |       GROUP BY term),
             |bn AS (SELECT term, blk, count(*) AS n,
             |         max(bits) AS mb FROM b GROUP BY 1, 2),
             |hist AS (SELECT term, blk, bits,
             |           count(*) + sum(vb) AS exb
             |         FROM b GROUP BY 1, 2, 3),
             |wd AS (SELECT bn.term, bn.blk, bn.n, w.b
             |       FROM bn CROSS JOIN
             |         (SELECT unnest(generate_series(1, 32)) AS b) w
             |       UNION ALL
             |       SELECT term, blk, n, mb AS b FROM bn
             |       WHERE mb > 32),
             |exc AS (SELECT wd.term, wd.blk, wd.b, sum(h.exb) AS excb
             |        FROM wd JOIN hist h
             |          ON h.term = wd.term AND h.blk = wd.blk
             |         AND h.bits > wd.b
             |        GROUP BY 1, 2, 3),
             |pf AS (SELECT term, CAST(sum(mc) AS BIGINT) AS pfor_bytes
             |       FROM (SELECT wd.term, wd.blk,
             |               min(1 + (wd.n * wd.b + 7) // 8
             |                   + coalesce(e.excb, 0)) AS mc
             |             FROM wd LEFT JOIN exc e
             |               ON e.term = wd.term AND e.blk = wd.blk
             |              AND e.b = wd.b
             |             GROUP BY 1, 2)
             |       GROUP BY term),
             |pt AS (SELECT b.term, count(*) AS df,
             |         CAST(sum(vb) AS BIGINT) AS varint_bytes,
             |         fb.for_bytes, pf.pfor_bytes
             |       FROM b JOIN fb ON b.term = fb.term
             |            JOIN pf ON b.term = pf.term
             |       GROUP BY b.term, fb.for_bytes, pf.pfor_bytes
             |       HAVING count(*) >= 2),
             |pk AS (SELECT CASE WHEN pfor_bytes < least(for_bytes, varint_bytes)
             |                   THEN 'pfor'
             |                   WHEN for_bytes < varint_bytes
             |                   THEN 'for' ELSE 'varint' END AS codec,
             |              df, varint_bytes, for_bytes,
             |              least(varint_bytes, for_bytes, pfor_bytes) AS stored
             |       FROM pt)
             |SELECT codec, count(*) AS n_terms,
             |       CAST(sum(df) AS BIGINT) AS n_postings,
             |       CAST(sum(stored) AS BIGINT) AS stored_bytes,
             |       CAST(sum(varint_bytes - stored) AS BIGINT)
             |         AS saved_vs_varint,
             |       CAST(sum(for_bytes - stored) AS BIGINT)
             |         AS saved_vs_for
             |FROM pk GROUP BY codec ORDER BY codec""".stripMargin),
      doc = "patched frame-of-reference joins the codec pick: per 128-gap block the NewPFD width-vs-exceptions min priced relationally (bitlen histogram x candidate widths), three-way pick per term, per-codec capacity rollup"),

    // Index SHARD placement + the skew monitor over it: terms are
    // hash-partitioned into 16 shards (the production layout — no
    // global byte-balancing sort; the hash is the portable t61→IdHash
    // chain the DSIR/vocab queries already mirror in SQL), and the
    // per-shard rollup reports exactly what an index operator watches:
    // term count, posting count, byte total, and the largest single
    // term (the stop-word whose posting list dominates a shard). Same
    // ASCII-corpus caveat as text_fingerprint_rolling.
    Q("text_index_shard_stats",
      (s, dir) => {
        import graft.operators.Sampling
        import graft.functions.Sketches
        TextAnalysis.postingsLayout(Tables.documents(s, dir),
            "doc_id", "text")
          .groupBy(col("term"))
          .agg(count(lit(1)).as("df"), sum(col("vbytes")).as("term_bytes"))
          .withColumn("shard",
            pmod(Sampling.idHash(Sketches.rollingHash(col("term"))),
              lit(16L)))
          .groupBy(col("shard"))
          .agg(count(lit(1)).as("n_terms"), sum(col("df")).as("n_postings"),
            sum(col("term_bytes")).as("shard_bytes"),
            max(col("term_bytes")).as("max_term_bytes"))
          .orderBy(col("shard"))
      },
      Some(s"""WITH t AS (SELECT doc_id,
             |             unnest(string_split(text, ' ')) AS term
             |           FROM documents),
             |tf AS (SELECT term, doc_id, count(*) AS tf
             |       FROM t GROUP BY 1, 2),
             |g AS (SELECT term, doc_id,
             |        doc_id - coalesce(lag(doc_id) OVER (
             |          PARTITION BY term ORDER BY doc_id), 0) AS gap
             |      FROM tf),
             |pt AS (SELECT term, count(*) AS df,
             |         CAST(sum((length(bin(gap)) + 6) // 7) AS BIGINT)
             |           AS term_bytes
             |       FROM g GROUP BY term),
             |h AS (SELECT df, term_bytes, CAST(list_reduce(
             |          list_prepend([CAST(0 AS HUGEINT), CAST(1 AS HUGEINT)],
             |            list_transform(range(1, length(term) + 1),
             |              i -> [CAST(unicode(substring(term, i, 1)) AS HUGEINT),
             |                    CAST(0 AS HUGEINT)])),
             |          (acc, x) -> [(acc[1] + x[1] * acc[2])
             |                         % 2305843009213693951,
             |                       (acc[2] * 131) % 2305843009213693951])[1]
             |        AS BIGINT) AS t61
             |      FROM pt),
             |sh AS (SELECT df, term_bytes,
             |         (${SamplingQueries.hashSql("t61")} % 16) AS shard
             |       FROM h)
             |SELECT shard, count(*) AS n_terms,
             |       CAST(sum(df) AS BIGINT) AS n_postings,
             |       CAST(sum(term_bytes) AS BIGINT) AS shard_bytes,
             |       CAST(max(term_bytes) AS BIGINT) AS max_term_bytes
             |FROM sh GROUP BY shard ORDER BY shard""".stripMargin),
      doc = "hash-partitioned index shards + skew monitor: portable t61/IdHash shard assignment, per-shard term/posting/byte totals and the largest-term column a stop-word dominates"),

    // BM25 seed-set retrieval: top-15 docs for a 3-term query. The
    // same bit-exactness discipline as text_perplexity (exact integer
    // counts into identical double expressions, round(,6) absorbs the
    // per-doc 3-term summation order) plus a rounded-score tie-break
    // so the k-boundary selection is reproducible in both engines.
    Q("text_bm25_topk",
      (s, dir) => TextAnalysis.bm25TopK(Tables.documents(s, dir),
        "doc_id", "text", Seq("vector", "stream", "spark"), k = 15),
      Some(bm25Oracle),
      doc = "BM25 (Okapi/Lucene idf) top-k doc retrieval for a literal query-term set; TakeOrdered global top-k"),

    // MaxScore-pruned BM25 (Turtle & Flood 1995), the query-side
    // answer to "you cannot aggregate-and-rank every posting at
    // 10^10 docs": term upper bounds -> θ from the best term's
    // candidate set -> docs holding only non-essential terms never
    // reach the aggregation. EXACT by a margin argument on the 6-dp
    // rounding (scaladoc) — so it shares the full-scan oracle verbatim:
    // equality IS the checked claim, like the LSH ≡ exact pins.
    Q("text_bm25_topk_pruned",
      (s, dir) => TextAnalysis.bm25TopKPruned(Tables.documents(s, dir),
        "doc_id", "text", Seq("vector", "stream", "spark"), k = 15),
      Some(bm25Oracle),
      doc = "MaxScore-pruned BM25 top-k: term upper bounds + essential-term semi-join prune the rank input; provably equals the full scan (shared oracle)"),

    // Bigram-LM perplexity (CCNet-style quality signal): the corpus
    // trains its own add-0.5-smoothed bigram model; each doc scores
    // exp(mean -ln p(w2|w1)). Identical double arithmetic both sides
    // (same operands into /, ln, exp), round(,6) absorbs summation
    // order; n_bigrams pins the support.
    Q("text_perplexity",
      (s, dir) => TextAnalysis.perplexityScore(Tables.documents(s, dir),
          "doc_id", "text", alpha = 0.5)
        .orderBy(col("doc_id")),
      Some("""WITH toks AS (
             |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
             |bi AS (
             |  SELECT doc_id, pr[1] AS w1, pr[2] AS w2
             |  FROM (SELECT doc_id, unnest(list_transform(range(1, len(w)),
             |               i -> [w[i], w[i + 1]])) AS pr
             |        FROM toks)),
             |uni AS (
             |  SELECT w1, count(*) AS cu
             |  FROM (SELECT doc_id, unnest(w) AS w1 FROM toks) GROUP BY w1),
             |v AS (SELECT count(*) AS v FROM uni),
             |bc AS (SELECT w1, w2, count(*) AS cb FROM bi GROUP BY w1, w2),
             |db AS (SELECT doc_id, w1, w2, count(*) AS k
             |       FROM bi GROUP BY doc_id, w1, w2),
             |nll AS (
             |  SELECT db.doc_id, db.k,
             |         -ln((bc.cb + 0.5) / (CAST(uni.cu AS DOUBLE) + 0.5 * v.v))
             |           AS nll
             |  FROM db JOIN bc USING (w1, w2) JOIN uni USING (w1) CROSS JOIN v)
             |SELECT doc_id,
             |       CAST(sum(k) AS BIGINT) AS n_bigrams,
             |       round(exp(sum(k * nll) / sum(k)), 6) AS perplexity
             |FROM nll
             |GROUP BY doc_id
             |ORDER BY doc_id""".stripMargin),
      doc = "bigram-LM perplexity per doc (CCNet-style quality signal; corpus-trained add-alpha model)"),

    // CCNet head/middle/tail: per-language perplexity terciles over the
    // SAME rounded perplexity relation as text_perplexity (ties broken
    // by doc_id, so the ntile labeling is engine-independent). The
    // catalog runs the exact labeler; the sketch-threshold scale path
    // (percentile_approx cuts + broadcast compare, no per-language
    // sort) is pinned against it in PplBucketsSpec.
    Q("text_ppl_buckets",
      (s, dir) => TextAnalysis.pplBucketsExact(Tables.documents(s, dir),
          "doc_id", "text", "lang", alpha = 0.5)
        .orderBy(col("doc_id")),
      Some("""WITH toks AS (
             |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
             |bi AS (
             |  SELECT doc_id, pr[1] AS w1, pr[2] AS w2
             |  FROM (SELECT doc_id, unnest(list_transform(range(1, len(w)),
             |               i -> [w[i], w[i + 1]])) AS pr
             |        FROM toks)),
             |uni AS (
             |  SELECT w1, count(*) AS cu
             |  FROM (SELECT doc_id, unnest(w) AS w1 FROM toks) GROUP BY w1),
             |v AS (SELECT count(*) AS v FROM uni),
             |bc AS (SELECT w1, w2, count(*) AS cb FROM bi GROUP BY w1, w2),
             |db AS (SELECT doc_id, w1, w2, count(*) AS k
             |       FROM bi GROUP BY doc_id, w1, w2),
             |nll AS (
             |  SELECT db.doc_id, db.k,
             |         -ln((bc.cb + 0.5) / (CAST(uni.cu AS DOUBLE) + 0.5 * v.v))
             |           AS nll
             |  FROM db JOIN bc USING (w1, w2) JOIN uni USING (w1) CROSS JOIN v),
             |p AS (SELECT doc_id,
             |             round(exp(sum(k * nll) / sum(k)), 6) AS perplexity
             |      FROM nll GROUP BY doc_id),
             |t AS (SELECT d.doc_id, d.lang, p.perplexity,
             |             ntile(3) OVER (PARTITION BY d.lang
             |               ORDER BY p.perplexity, d.doc_id) AS tc
             |      FROM documents d JOIN p USING (doc_id))
             |SELECT doc_id, lang, perplexity,
             |       CASE tc WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
             |               ELSE 'tail' END AS bucket
             |FROM t ORDER BY doc_id""".stripMargin),
      doc = "CCNet head/middle/tail per-language perplexity terciles (exact labeler; sketch twin spec'd)"),

    // Interpolated Kneser-Ney bigram perplexity — the KenLM smoothing
    // family (absolute discount + continuation-unigram backoff), the
    // upgrade over text_perplexity's add-alpha model. Same bit-exactness
    // discipline: all four model statistics are exact integer counts
    // fed into identical double expressions on both engines (same
    // operand order: (cb-D)/cw1 + ((D*tw1)/cw1)*(nw2/t)), round(,6)
    // absorbs per-doc summation order.
    Q("text_kn_perplexity",
      (s, dir) => TextAnalysis.knPerplexityScore(Tables.documents(s, dir),
          "doc_id", "text", discount = 0.75)
        .orderBy(col("doc_id")),
      // MATERIALIZED CTEs + explicit ON: DuckDB 1.0's default CTE
      // inlining re-expands the shared count relations and its join
      // optimizer then falls back to CROSS_PRODUCTs (measured 98 s ->
      // seconds on sf0.01)
      Some("""WITH toks AS MATERIALIZED (
             |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
             |bi AS MATERIALIZED (
             |  SELECT doc_id, pr[1] AS w1, pr[2] AS w2
             |  FROM (SELECT doc_id, unnest(list_transform(range(1, len(w)),
             |               i -> [w[i], w[i + 1]])) AS pr
             |        FROM toks)),
             |bc AS MATERIALIZED (
             |  SELECT w1, w2, count(*) AS cb FROM bi GROUP BY w1, w2),
             |lft AS (SELECT w1, sum(cb) AS cw1, count(*) AS tw1
             |        FROM bc GROUP BY w1),
             |cont AS (SELECT w2 AS cw, count(*) AS nw2 FROM bc GROUP BY w2),
             |ty AS (SELECT count(*) AS t FROM bc),
             |db AS MATERIALIZED (
             |  SELECT doc_id, w1, w2, count(*) AS k
             |  FROM bi GROUP BY doc_id, w1, w2),
             |nll AS (
             |  SELECT db.doc_id, db.k,
             |         -ln((bc.cb - 0.75) / lft.cw1
             |             + 0.75 * lft.tw1 / lft.cw1
             |               * (cont.nw2 / CAST(ty.t AS DOUBLE))) AS nll
             |  FROM db
             |  JOIN bc ON bc.w1 = db.w1 AND bc.w2 = db.w2
             |  JOIN lft ON lft.w1 = db.w1
             |  JOIN cont ON cont.cw = db.w2
             |  CROSS JOIN ty)
             |SELECT doc_id,
             |       CAST(sum(k) AS BIGINT) AS n_bigrams,
             |       round(exp(sum(k * nll) / sum(k)), 6) AS perplexity
             |FROM nll
             |GROUP BY doc_id
             |ORDER BY doc_id""".stripMargin),
      doc = "interpolated Kneser-Ney bigram perplexity (KenLM/CCNet smoothing: absolute discount + continuation backoff)"),

    // Order-3 interpolated Kneser-Ney — the full three-level backoff
    // (trigram -> continuation bigram -> continuation unigram)
    // production KenLM filters run. Five exact integer count relations
    // into one mirrored double expression; parens pin evaluation order
    // on both engines; round(,6) absorbs per-doc summation order.
    Q("text_kn3_perplexity",
      (s, dir) => TextAnalysis.knTrigramPerplexityScore(
          Tables.documents(s, dir), "doc_id", "text", discount = 0.75)
        .orderBy(col("doc_id")),
      // same MATERIALIZED + explicit-ON medicine as text_kn_perplexity
      // (inlined CTEs -> CROSS_PRODUCT fallback, minutes instead of
      // seconds)
      Some("""WITH toks AS MATERIALIZED (
             |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
             |tri AS MATERIALIZED (
             |  SELECT doc_id, pr[1] AS w1, pr[2] AS w2, pr[3] AS w3
             |  FROM (SELECT doc_id, unnest(list_transform(range(1, len(w) - 1),
             |               i -> [w[i], w[i + 1], w[i + 2]])) AS pr
             |        FROM toks)),
             |bi AS MATERIALIZED (
             |  SELECT pr[1] AS w1, pr[2] AS w2
             |  FROM (SELECT unnest(list_transform(range(1, len(w)),
             |               i -> [w[i], w[i + 1]])) AS pr
             |        FROM toks)),
             |tc AS MATERIALIZED (
             |  SELECT w1, w2, w3, count(*) AS c3
             |  FROM tri GROUP BY w1, w2, w3),
             |l2 AS (SELECT w1, w2, sum(c3) AS cw12, count(*) AS tw12
             |       FROM tc GROUP BY w1, w2),
             |mid AS MATERIALIZED (
             |  SELECT w2, w3, count(*) AS n12 FROM tc GROUP BY w2, w3),
             |midl AS (SELECT w2, sum(n12) AS nmid, count(*) AS t2
             |         FROM mid GROUP BY w2),
             |bc AS MATERIALIZED (
             |  SELECT w1, w2, count(*) AS cb FROM bi GROUP BY w1, w2),
             |cont AS (SELECT w2 AS cw, count(*) AS nw3 FROM bc GROUP BY w2),
             |ty AS (SELECT count(*) AS t FROM bc),
             |db AS MATERIALIZED (
             |  SELECT doc_id, w1, w2, w3, count(*) AS k
             |  FROM tri GROUP BY doc_id, w1, w2, w3),
             |nll AS (
             |  SELECT db.doc_id, db.k,
             |         -ln((tc.c3 - 0.75) / l2.cw12
             |             + 0.75 * l2.tw12 / l2.cw12
             |               * ((mid.n12 - 0.75) / midl.nmid
             |                  + 0.75 * midl.t2 / midl.nmid
             |                    * (cont.nw3 / CAST(ty.t AS DOUBLE)))) AS nll
             |  FROM db
             |  JOIN tc ON tc.w1 = db.w1 AND tc.w2 = db.w2 AND tc.w3 = db.w3
             |  JOIN l2 ON l2.w1 = db.w1 AND l2.w2 = db.w2
             |  JOIN mid ON mid.w2 = db.w2 AND mid.w3 = db.w3
             |  JOIN midl ON midl.w2 = db.w2
             |  JOIN cont ON cont.cw = db.w3
             |  CROSS JOIN ty)
             |SELECT doc_id,
             |       CAST(sum(k) AS BIGINT) AS n_trigrams,
             |       round(exp(sum(k * nll) / sum(k)), 6) AS perplexity
             |FROM nll
             |GROUP BY doc_id
             |ORDER BY doc_id""".stripMargin),
      doc = "interpolated trigram Kneser-Ney perplexity: full three-level continuation backoff (the order-3 KenLM shape)"),

    // Context-window chunking: overlapping 16-token windows at stride 12
    // (the packing primitive for pretraining / RAG ingestion). One
    // narrow expand per doc — generate window starts with sequence(),
    // slice the token array per start — no shuffle until the oracle
    // ORDER BY. Chunk count scales with doc length, not corpus size.
    Q("text_chunk_windows",
      (s, dir) => Tables.documents(s, dir)
        .filter(col("doc_id") < 100)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .select(col("doc_id"),
          posexplode(sequence(lit(1), size(col("toks")), lit(12))).as(Seq("chunk_idx", "start")),
          col("toks"))
        .select(col("doc_id"), col("chunk_idx"),
          size(slice(col("toks"), col("start"), lit(16))).as("n_tok"),
          array_join(slice(col("toks"), col("start"), lit(16)), " ").as("chunk"))
        .orderBy(col("doc_id"), col("chunk_idx")),
      Some("""WITH t AS (
             |  SELECT doc_id, string_split(text, ' ') AS toks
             |  FROM documents WHERE doc_id < 100),
             |st AS (
             |  SELECT doc_id, toks, unnest(range(1, len(toks) + 1, 12)) AS start
             |  FROM t)
             |SELECT doc_id,
             |       CAST((start - 1) / 12 AS INTEGER) AS chunk_idx,
             |       CAST(len(toks[start:start+15]) AS INTEGER) AS n_tok,
             |       array_to_string(toks[start:start+15], ' ') AS chunk
             |FROM st
             |ORDER BY doc_id, chunk_idx""".stripMargin),
      doc = "overlapping context-window chunking: 16-token windows, stride 12, per-doc expand"),

    // C4-style duplicated-span removal end-to-end: the corpus has no
    // newlines, so each doc is first deterministically lined (7-word
    // spans — the same slice idiom as text_chunk_windows, mirrored in
    // the oracle), then every span occurring in 2+ docs keeps only its
    // lowest-doc_id occurrence and docs are reassembled in order. The
    // testdata's planted near-dup pairs make the rule bite: shared
    // spans vanish from the higher-id twin (4 docs at sf0.01 lose
    // every span and drop entirely).
    Q("text_line_dedup",
      (s, dir) => {
        val ws = split(col("text"), " ")
        val lined = Tables.documents(s, dir).select(col("doc_id"),
          array_join(transform(sequence(lit(1), size(ws), lit(7)),
            st => array_join(slice(ws, st, lit(7)), " ")), "\n").as("text"))
        graft.operators.Dedup.lineDedup(lined, "doc_id", "text", sep = "\n")
          .orderBy(col("doc_id"))
      },
      Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') toks
             |           FROM documents),
             |ld AS (SELECT doc_id,
             |              list_transform(range(1, len(toks) + 1, 7),
             |                st -> array_to_string(toks[st:st+6], ' ')) lines
             |       FROM t),
             |l AS (SELECT doc_id,
             |             unnest(range(1, len(lines) + 1)) pos,
             |             unnest(lines) line
             |      FROM ld),
             |stats AS (SELECT line, count(*) occ, min(doc_id) keeper
             |          FROM l GROUP BY line),
             |k AS (SELECT l.doc_id, l.pos, l.line
             |      FROM l JOIN stats USING (line)
             |      WHERE occ = 1 OR l.doc_id = keeper)
             |SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text
             |FROM k GROUP BY doc_id
             |ORDER BY doc_id""".stripMargin),
      doc = "C4 duplicated-span removal: global span frequency, keep first occurrence, reassemble docs"),

    // ExactSubstr (Lee et al. 2021): maximal character spans whose
    // every 30-char window repeats corpus-wide. The oracle mirrors the
    // operator relationally — the winnow-family HUGEINT k-gram hash per
    // position, df>=2 filter, gaps-and-islands span merge — so the
    // hash compare pins positions exactly. The planted near-dup pairs
    // plus organic boilerplate give ~12k duplicated positions at
    // sf0.01 collapsing into a few hundred spans.
    Q("text_exact_substr_spans",
      (s, dir) => graft.operators.Dedup.exactSubstrSpans(
          Tables.documents(s, dir), "doc_id", "text", k = 30)
        .orderBy(col("doc_id"), col("span_start")),
      Some(exactSubstrSpanCte +
        """SELECT doc_id, CAST(min(pos) AS INTEGER) AS span_start,
          |       CAST(max(pos) + 30 AS INTEGER) AS span_end
          |FROM isl GROUP BY doc_id, island
          |ORDER BY doc_id, span_start""".stripMargin),
      doc = "ExactSubstr duplicate spans: rolling k-gram hashes, df>=2, gaps-and-islands merge"),

    // ...and the removal itself: every duplicated span cut out, docs
    // without one passing through byte-identical. The oracle rebuilds
    // each cleaned text from the span table with lag()-bracketed
    // substrings, so the hash compare proves the aggregate-HOF stitch
    // reproduces the cut corpus byte-for-byte.
    Q("text_exact_substr_clean",
      (s, dir) => graft.operators.Dedup.exactSubstrClean(
          Tables.documents(s, dir), "doc_id", "text", k = 30, textOut = "clean_text")
        .orderBy(col("doc_id")),
      Some(exactSubstrSpanCte +
        """, sp AS (SELECT doc_id, min(pos) AS s, max(pos) + 30 AS e
          |       FROM isl GROUP BY doc_id, island),
          |seg AS (SELECT doc_id, s, e,
          |          coalesce(lag(e) OVER (PARTITION BY doc_id ORDER BY s), 1) AS pe
          |        FROM sp),
          |cln AS (SELECT seg.doc_id,
          |          string_agg(substring(t.text, pe, s - pe), '' ORDER BY s)
          |            || substring(any_value(t.text), max(e)) AS ct
          |        FROM seg JOIN t USING (doc_id)
          |        GROUP BY seg.doc_id)
          |SELECT t.doc_id, coalesce(cln.ct, t.text) AS clean_text
          |FROM t LEFT JOIN cln USING (doc_id)
          |ORDER BY t.doc_id""".stripMargin),
      doc = "ExactSubstr removal: duplicated spans cut, remainder stitched, byte-identical oracle"),

    // PII scrubbing: the corpus has no planted contact strings, so the
    // query synthesizes a deterministic one per doc, then scrubs it —
    // the oracle applies the same construction + regexes, so the check
    // covers the replace mechanics end-to-end. Patterns stay in the
    // RE2/Java-regex common dialect.
    // Train/eval decontamination: docs 0-24 stand in for the eval
    // corpus, the rest is the training set. The 25 planted near-dup
    // pairs guarantee heavy overlaps beyond chance collisions, so the
    // query exercises both regimes.
    Q("text_decontaminate",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        graft.operators.Decontaminate.contaminated(
            docs.filter(col("doc_id") >= 25), docs.filter(col("doc_id") < 25),
            "doc_id", "text", k = 3)
          .orderBy(col("doc_id"))
      },
      Some("""WITH tr AS (SELECT doc_id, string_split(text, ' ') l
             |            FROM documents WHERE doc_id >= 25),
             |ev AS (SELECT string_split(text, ' ') l
             |       FROM documents WHERE doc_id < 25),
             |ts AS (SELECT DISTINCT doc_id,
             |              unnest(list_transform(range(1, len(l) - 1),
             |                     i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2])) AS sh
             |       FROM tr),
             |es AS (SELECT DISTINCT
             |              unnest(list_transform(range(1, len(l) - 1),
             |                     i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2])) AS sh
             |       FROM ev)
             |SELECT doc_id, count(*) AS n_shared
             |FROM ts JOIN es USING (sh)
             |GROUP BY doc_id
             |ORDER BY doc_id""".stripMargin),
      doc = "eval-set decontamination: n-gram overlap flags (broadcast probe, corpus never shuffles)"),

    // Graded decontamination: overlap FRACTION + threshold verdict
    // (PaLM/Llama-style ≥-fraction drop vs GPT-3's any-hit drop). The
    // fraction is rounded to 6 decimals in both engines per the float
    // policy; n_shared/n_shingles are exact integers.
    Q("text_decontaminate_frac",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        graft.operators.Decontaminate.contaminationFraction(
            docs.filter(col("doc_id") >= 25), docs.filter(col("doc_id") < 25),
            "doc_id", "text", k = 3, minFrac = 0.5)
          .select(col("doc_id"), col("n_shared"), col("n_shingles"),
            round(col("frac"), 6).as("frac"), col("drop"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH tr AS (SELECT doc_id, string_split(text, ' ') l
             |            FROM documents WHERE doc_id >= 25),
             |ev AS (SELECT string_split(text, ' ') l
             |       FROM documents WHERE doc_id < 25),
             |ts AS (SELECT DISTINCT doc_id,
             |              unnest(list_transform(range(1, len(l) - 1),
             |                     i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2])) AS sh
             |       FROM tr),
             |es AS (SELECT DISTINCT
             |              unnest(list_transform(range(1, len(l) - 1),
             |                     i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2])) AS sh
             |       FROM ev),
             |den AS (SELECT doc_id, count(*) AS n_shingles FROM ts GROUP BY doc_id),
             |hit AS (SELECT doc_id, count(*) AS n_shared
             |        FROM ts JOIN es USING (sh) GROUP BY doc_id)
             |SELECT h.doc_id, h.n_shared, d.n_shingles,
             |       round(CAST(h.n_shared AS DOUBLE) / d.n_shingles, 6) AS frac,
             |       (CAST(h.n_shared AS DOUBLE) / d.n_shingles) >= 0.5 AS "drop"
             |FROM hit h JOIN den d USING (doc_id)
             |ORDER BY h.doc_id""".stripMargin),
      doc = "graded decontamination: per-doc eval-overlap fraction + ≥0.5 drop verdict " +
        "(same broadcast probe; denominator fused into the corpus scan)"),

    // PMI collocations: exact integer counts; the pmi double is the
    // same ln-of-integer-ratio composition in both engines, rounded to
    // 6 decimals BEFORE the ordering so the top-k cutoff ties break on
    // (w1, w2) identically.
    Q("text_collocations_pmi",
      (s, dir) => TextAnalysis.collocationsPmi(Tables.documents(s, dir), "text",
          minCount = 5, topK = 50)
        .orderBy(col("pmi").desc, col("w1"), col("w2")),
      Some("""WITH d AS (SELECT string_split(text, ' ') AS l FROM documents),
             |uni AS (SELECT unnest(l) AS w FROM d),
             |ucnt AS (SELECT w, count(*) AS c FROM uni GROUP BY w),
             |nu AS (SELECT count(*) AS n_uni FROM uni),
             |pairs AS (SELECT unnest(list_transform(range(1, len(l)),
             |                 i -> [l[i], l[i+1]])) AS pr FROM d),
             |bcnt AS (SELECT pr[1] AS w1, pr[2] AS w2, count(*) AS n_xy
             |         FROM pairs GROUP BY 1, 2 HAVING count(*) >= 5),
             |nb AS (SELECT count(*) AS n_bi FROM pairs)
             |SELECT w1, w2, n_xy,
             |       round(ln(CAST(n_xy AS DOUBLE) / n_bi)
             |             - ln(CAST(ca.c AS DOUBLE) / n_uni)
             |             - ln(CAST(cb.c AS DOUBLE) / n_uni), 6) AS pmi
             |FROM bcnt JOIN ucnt ca ON w1 = ca.w
             |          JOIN ucnt cb ON w2 = cb.w, nb, nu
             |ORDER BY pmi DESC, w1, w2
             |LIMIT 50""".stripMargin),
      doc = "PMI collocation mining (Church & Hanks): top-50 adjacent pairs by " +
        "pointwise mutual information, min count 5 — vocab-sized aggregates, " +
        "TakeOrdered top-k"),

    // BPE merge training (the tokenizer-learning step): iterative
    // corpus-wide pair counting over the collapsed word-frequency
    // vocabulary. The oracle UNROLLS the 8 merge rounds as CTE layers
    // (generated below — each round is pair-count → argmax with the
    // engine's exact (n DESC, l, r) tie-break → list_reduce greedy
    // left-to-right merge application), so the formerly golden-pinned
    // iterative argmax is now DuckDB hash-verified end-to-end. The
    // list_reduce merge is equivalent to the engine's scan because a
    // merged token a||b can never equal a (b is nonempty), so "last
    // output element = a" only holds at genuine merge sites.
    // Golden-pinned too (GoldenOutputSpec) as the engine-independent
    // belt.
    Q("text_bpe_merges",
      (s, dir) => TextAnalysis.bpeTrainMerges(Tables.documents(s, dir), "text",
        numMerges = 8)
        .orderBy(col("rank")),
      Some(bpeOracle(numMerges = 8)),
      doc = "BPE merge training: per-round corpus-wide pair argmax over word frequencies (unrolled-CTE oracle)"),

    // The tokenizer APPLIED — exact token accounting under the trained
    // merges, the number every training-budget decision actually uses
    // (whitespace words and BPE-ish regex counts are proxies; this is
    // the real tokenizer's count). Train-once on the corpus (the 8
    // merges collect driver-side — the tokenizer IS driver-side
    // config, a ~50k-merge broadcast in production), encode is one
    // narrow map. The oracle replays training AND application per
    // word, then reduces to per-doc counts.
    Q("text_bpe_encode",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val merges = TextAnalysis.bpeTrainMerges(docs, "text", numMerges = 8)
          .orderBy(col("rank")).collect()
          .map(r => (r.getString(1), r.getString(2))).toSeq
        TextAnalysis.bpeEncode(docs, "doc_id", "text", merges)
          .select(col("doc_id"), col("n_tokens"))
          .orderByOnce(col("doc_id"))
      },
      Some(bpeEncodeOracle(numMerges = 8)),
      doc = "BPE tokenizer applied: train 8 merges on the corpus, encode every doc, per-doc token count — the exact budget number; oracle replays training + greedy application per word"),

    // MOSS winnowing fingerprints (Schleimer et al. 2003): the
    // sub-linear robust fingerprint set for long-document near-dup
    // detection. The oracle exploits that the DISTINCT selected VALUES
    // are exactly the distinct per-window minima (the rightmost-tie
    // rule picks a position, never changes the value), so SQL window
    // frames + the HUGEINT modular k-gram hash reproduce the set.
    // Also golden-pinned in GoldenOutputSpec.
    Q("text_winnow_fingerprint",
      (s, dir) => Tables.documents(s, dir)
        .select(col("doc_id"),
          explode(graft.functions.Sketches.winnowSet(
            regexp_replace(lower(col("text")), " +", " "), k = 8, w = 16)).as("fp"))
        .orderBy(col("doc_id"), col("fp")),
      Some("""WITH t AS (SELECT doc_id,
             |                  regexp_replace(lower(text), ' +', ' ', 'g') AS t
             |           FROM documents),
             |g AS (SELECT doc_id, i AS pos,
             |        CAST(list_reduce(
             |          list_prepend([CAST(0 AS HUGEINT)],
             |            list_transform(range(i, i + 8),
             |              j -> [CAST(unicode(substring(t, j, 1)) AS HUGEINT)])),
             |          (acc, x) -> [(acc[1] * 131 + x[1])
             |                       % 2305843009213693951])[1] AS BIGINT) AS h
             |      FROM (SELECT doc_id, t,
             |                   unnest(generate_series(1, length(t) - 8 + 1)) AS i
             |            FROM t)),
             |w AS (SELECT doc_id, pos, h,
             |        min(h) OVER (PARTITION BY doc_id ORDER BY pos
             |                     ROWS BETWEEN CURRENT ROW AND 15 FOLLOWING) AS wm,
             |        count(*) OVER (PARTITION BY doc_id) AS n
             |      FROM g)
             |SELECT DISTINCT doc_id, wm AS fp FROM w
             |WHERE pos <= greatest(1, n - 16 + 1)
             |ORDER BY doc_id, fp""".stripMargin),
      doc = "winnowing (MOSS) fingerprint selection: ~2/(w+1) density, shared-substring guarantee"),

    // INTERSECT / EXCEPT set ops (distinct semantics in both engines):
    // which corpus sources feed both of two languages, and which feed
    // one but not the other.
    Q("doc_source_setops",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        def srcs(lang: String) = docs.filter(col("lang") === lang).select(col("source"))
        val both = srcs("en").intersect(srcs("de"))
          .select(lit("intersect_en_de").as("op"), col("source"))
        val only = srcs("en").except(srcs("zh"))
          .select(lit("except_en_zh").as("op"), col("source"))
        both.unionByName(only).orderBy(col("op"), col("source"))
      },
      Some("""SELECT 'intersect_en_de' AS op, source FROM (
             |  SELECT source FROM documents WHERE lang = 'en'
             |  INTERSECT
             |  SELECT source FROM documents WHERE lang = 'de')
             |UNION ALL
             |SELECT 'except_en_zh' AS op, source FROM (
             |  SELECT source FROM documents WHERE lang = 'en'
             |  EXCEPT
             |  SELECT source FROM documents WHERE lang = 'zh')
             |ORDER BY op, source""".stripMargin),
      doc = "INTERSECT / EXCEPT set ops over per-language source sets"),

    // HTML -> text extraction (the crawl pipeline's WET step) on REAL
    // markup: each document is wrapped in a full page — doctype, head
    // with title/style/script boilerplate, comment, nav div, the
    // ESCAPED text in a <p>, a trailing div with a numeric entity —
    // and the codegen'd kernel must strip/decode it back. The oracle
    // cannot parse HTML, so it verifies the ROUND TRIP: title and body
    // rebuilt from the raw text by the documented whitespace-collapse
    // contract (the escape chain &/</> is exactly inverted by entity
    // decode; boilerplate content must vanish or the hash breaks).
    Q("text_html_extract",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val esc = regexp_replace(regexp_replace(regexp_replace(col("text"),
          lit("&"), lit("&amp;")), lit("<"), lit("&lt;")), lit(">"), lit("&gt;"))
        val html = concat(
          lit("<!DOCTYPE html><html><head><title>Doc "), col("doc_id"),
          lit(" &amp; friends</title><style>p { margin: 1>0 }</style>" +
            "<script>var h = \"<p>boiler</p>\";</script></head><body><h1>Doc "),
          col("doc_id"),
          lit("</h1><!-- nav --><p>"), esc,
          lit("</p><div>tail &#33;</div></body></html>"))
        docs.select(col("doc_id"),
            TextFunctions.htmlTitle(html).as("title"),
            TextFunctions.htmlText(html).as("body"))
          .orderByOnce(col("doc_id"))
      },
      Some("""WITH c AS (SELECT doc_id,
             |             trim(regexp_replace(text,
             |                  '[ \t\n\x0B\x0C\r]+', ' ', 'g')) AS t
             |           FROM documents)
             |SELECT doc_id,
             |       'Doc ' || doc_id || ' & friends' AS title,
             |       CASE WHEN t = ''
             |            THEN 'Doc ' || doc_id || chr(10) || 'tail !'
             |            ELSE 'Doc ' || doc_id || chr(10) || t
             |                 || chr(10) || 'tail !'
             |       END AS body
             |FROM c
             |ORDER BY doc_id""".stripMargin),
      doc = "HTML->text extraction (markup strip, entity decode, block breaks) round-trip-oracled over real full-page markup"),

    // jusText-style MAIN-CONTENT selection: each document rendered as
    // a page with a link-dense nav block, the real text in a <p>, a
    // short copyright line, and a link-dense footer. The integer rule
    // set (short / link-density / stopword-density, all cross-
    // multiplied) must keep exactly the content block — and only when
    // ITS OWN stopword density clears the bar, which the oracle
    // recomputes per document from the raw text. Boilerplate blocks
    // are constant, so the oracle proves they were dropped by
    // reproducing main_text WITHOUT them.
    Q("text_html_main_content",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val esc = regexp_replace(regexp_replace(regexp_replace(col("text"),
          lit("&"), lit("&amp;")), lit("<"), lit("&lt;")), lit(">"), lit("&gt;"))
        val html = concat(
          lit("<html><head><title>Doc "), col("doc_id"),
          lit("</title></head><body>" +
            "<div class='nav'><a href='/'>Home</a> <a href='/a'>About</a>" +
            " <a href='/c'>Contact pages</a></div><p>"),
          esc,
          lit("</p><div>Copyright 2026 GraftCorp</div>" +
            "<div><a href='/t'>Terms</a> <a href='/p'>Privacy policy</a>" +
            "</div></body></html>"))
        TextAnalysis.htmlMainContent(
            docs.select(col("doc_id"), html.as("html")), "doc_id", "html")
          .orderByOnce(col("doc_id"))
      },
      Some("""WITH c AS (
             |  SELECT doc_id,
             |         trim(regexp_replace(text,
             |              '[ \t\n\x0B\x0C\r]+', ' ', 'g')) AS t
             |  FROM documents),
             |m AS (
             |  SELECT doc_id, t,
             |         length(replace(t, ' ', '')) AS nc,
             |         len(string_split(t, ' ')) AS nw,
             |         len(list_filter(string_split(t, ' '),
             |             w -> list_contains(['the','a','of','and','to','in'],
             |                                w))) AS hits
             |  FROM c)
             |SELECT doc_id,
             |       CASE WHEN nc >= 25 AND hits * 10 >= nw
             |            THEN t ELSE '' END AS main_text,
             |       CAST(CASE WHEN nc >= 25 AND hits * 10 >= nw
             |                 THEN 1 ELSE 0 END AS BIGINT) AS blocks_kept,
             |       CAST(CASE WHEN t = '' THEN 3 ELSE 4 END AS BIGINT)
             |         AS blocks_total
             |FROM m
             |ORDER BY doc_id""".stripMargin),
      doc = "jusText-style main-content selection: per-block link/stopword/length integer rules keep content, drop nav+footer+copyright boilerplate"),

    // Host-level PageRank from REAL anchor extraction — the crawl
    // quality prior (Common Crawl publishes exactly this artifact):
    // each page's <a href> values come out of the single-pass HTML
    // kernel, hosts resolve by regex, and the INTEGER PageRank
    // (floor-division contributions, cross-multiplied damping) runs 3
    // rounds. The planted link structure is a closed form of doc_id,
    // so the oracle rebuilds the same distinct edge set and replays
    // the iterations as unrolled CTE layers — bit-for-bit, because no
    // float ever enters.
    Q("doc_link_pagerank",
      (s, dir) => {
        import graft.operators.LinkGraph
        def host(e: org.apache.spark.sql.Column) =
          concat(lit("h"), pmod(e, lit(23)).cast("string"), lit(".example"))
        val html = concat(
          lit("<html><body><p>See <a href=\"http://"),
          host(col("doc_id") * 7 + 1),
          lit("/page\">one</a> and <a href='http://"),
          host(col("doc_id") * 13 + 5),
          lit("/x'>two</a> <a href=\"/about\">about</a></p></body></html>"))
        val edges = Tables.documents(s, dir)
          .select(col("doc_id"),
            explode(TextFunctions.htmlLinks(html)).as("href"))
          .select(host(col("doc_id")).as("src"),
            regexp_extract(col("href"), "^https?://([a-z0-9.-]+)", 1).as("dst"))
          .filter(col("dst") =!= "") // relative links have no host
        LinkGraph.pageRankInt(edges, "src", "dst", iterations = 3)
          .withColumnRenamed("rank", "pr")
          .orderBy(col("node"))
      },
      Some("""WITH e AS (
             |  SELECT DISTINCT
             |         'h' || CAST(doc_id % 23 AS VARCHAR) || '.example' AS src,
             |         'h' || CAST((7*doc_id+1) % 23 AS VARCHAR) || '.example' AS dst
             |  FROM documents
             |  UNION
             |  SELECT DISTINCT
             |         'h' || CAST(doc_id % 23 AS VARCHAR) || '.example',
             |         'h' || CAST((13*doc_id+5) % 23 AS VARCHAR) || '.example'
             |  FROM documents),
             |o AS (SELECT src, count(*) AS outd FROM e GROUP BY src),
             |n AS (SELECT DISTINCT src AS node FROM e
             |      UNION SELECT DISTINCT dst FROM e),
             |r0 AS (SELECT node, CAST(1000000000000 AS HUGEINT) AS pr FROM n),
             |s1 AS (SELECT e.dst AS node, sum(r0.pr // o.outd) AS s
             |       FROM e JOIN o USING (src) JOIN r0 ON r0.node = e.src
             |       GROUP BY e.dst),
             |r1 AS (SELECT n.node,
             |              150000000000 + (85 * coalesce(s1.s, 0)) // 100 AS pr
             |       FROM n LEFT JOIN s1 USING (node)),
             |s2 AS (SELECT e.dst AS node, sum(r1.pr // o.outd) AS s
             |       FROM e JOIN o USING (src) JOIN r1 ON r1.node = e.src
             |       GROUP BY e.dst),
             |r2 AS (SELECT n.node,
             |              150000000000 + (85 * coalesce(s2.s, 0)) // 100 AS pr
             |       FROM n LEFT JOIN s2 USING (node)),
             |s3 AS (SELECT e.dst AS node, sum(r2.pr // o.outd) AS s
             |       FROM e JOIN o USING (src) JOIN r2 ON r2.node = e.src
             |       GROUP BY e.dst),
             |r3 AS (SELECT n.node,
             |              150000000000 + (85 * coalesce(s3.s, 0)) // 100 AS pr
             |       FROM n LEFT JOIN s3 USING (node))
             |SELECT node, CAST(pr AS BIGINT) AS pr
             |FROM r3
             |ORDER BY node""".stripMargin),
      doc = "host-level PageRank quality prior: real anchor extraction -> distinct host edges -> 3 integer-exact damped rounds, iteration-replay oracle"),

    // INCREMENTAL PageRank refresh — the nightly-crawl shape: 3 cold
    // rounds establish ranks, then an edge DIFF applies through the
    // keyed MERGE (Upsert.mergeLatest: one host's outlinks retract as
    // dead rows, five hosts gain links to a brand-new hub) and TWO
    // warm rounds run from the old ranks instead of a full recompute
    // (new node seeds at scale, integer exactness end to end). The
    // oracle replays everything: 3 cold CTE layers, the closed-form
    // merged edge set, the warm seed join, 2 more layers.
    Q("doc_link_pagerank_delta",
      (s, dir) => {
        import graft.operators.{LinkGraph, Upsert}
        def host(e: org.apache.spark.sql.Column) =
          concat(lit("h"), pmod(e, lit(23)).cast("string"), lit(".example"))
        val docs = Tables.documents(s, dir)
        val e1 = docs.select(host(col("doc_id")).as("src"),
            host(col("doc_id") * 7 + 1).as("dst"))
          .unionByName(docs.select(host(col("doc_id")).as("src"),
            host(col("doc_id") * 13 + 5).as("dst")))
          .distinct()
        val prior = LinkGraph.pageRankInt(e1, "src", "dst", iterations = 3)
        val key = concat_ws(">", col("src"), col("dst"))
        val base = e1.select(col("src"), col("dst"), key.as("ek"),
          lit(1L).as("v"), lit(true).as("alive"))
        val retract = e1.filter(col("src") === "h3.example")
          .select(col("src"), col("dst"), key.as("ek"),
            lit(2L).as("v"), lit(false).as("alive"))
        val adds = docs
          .select(host(pmod(col("doc_id"), lit(5))).as("src"),
            lit("hub.example").as("dst")).distinct()
          .select(col("src"), col("dst"), key.as("ek"),
            lit(2L).as("v"), lit(true).as("alive"))
        val e2 = Upsert
          .mergeLatest(base, retract.unionByName(adds), "ek", "v", col("alive"))
          .select(col("src"), col("dst"))
        LinkGraph.pageRankInt(e2, "src", "dst", iterations = 2,
            init = Some(prior))
          .withColumnRenamed("rank", "pr")
          .orderBy(col("node"))
      },
      Some("""WITH e AS (
             |  SELECT DISTINCT
             |         'h' || CAST(doc_id % 23 AS VARCHAR) || '.example' AS src,
             |         'h' || CAST((7*doc_id+1) % 23 AS VARCHAR) || '.example' AS dst
             |  FROM documents
             |  UNION
             |  SELECT DISTINCT
             |         'h' || CAST(doc_id % 23 AS VARCHAR) || '.example',
             |         'h' || CAST((13*doc_id+5) % 23 AS VARCHAR) || '.example'
             |  FROM documents),
             |o AS (SELECT src, count(*) AS outd FROM e GROUP BY src),
             |n AS (SELECT DISTINCT src AS node FROM e
             |      UNION SELECT DISTINCT dst FROM e),
             |r0 AS (SELECT node, CAST(1000000000000 AS HUGEINT) AS pr FROM n),
             |s1 AS (SELECT e.dst AS node, sum(r0.pr // o.outd) AS s
             |       FROM e JOIN o USING (src) JOIN r0 ON r0.node = e.src
             |       GROUP BY e.dst),
             |r1 AS (SELECT n.node,
             |              150000000000 + (85 * coalesce(s1.s, 0)) // 100 AS pr
             |       FROM n LEFT JOIN s1 USING (node)),
             |s2 AS (SELECT e.dst AS node, sum(r1.pr // o.outd) AS s
             |       FROM e JOIN o USING (src) JOIN r1 ON r1.node = e.src
             |       GROUP BY e.dst),
             |r2 AS (SELECT n.node,
             |              150000000000 + (85 * coalesce(s2.s, 0)) // 100 AS pr
             |       FROM n LEFT JOIN s2 USING (node)),
             |s3 AS (SELECT e.dst AS node, sum(r2.pr // o.outd) AS s
             |       FROM e JOIN o USING (src) JOIN r2 ON r2.node = e.src
             |       GROUP BY e.dst),
             |r3 AS (SELECT n.node,
             |              150000000000 + (85 * coalesce(s3.s, 0)) // 100 AS pr
             |       FROM n LEFT JOIN s3 USING (node)),
             |e2 AS (SELECT src, dst FROM e WHERE src <> 'h3.example'
             |       UNION
             |       SELECT DISTINCT
             |              'h' || CAST(doc_id % 5 AS VARCHAR) || '.example',
             |              'hub.example'
             |       FROM documents),
             |o2 AS (SELECT src, count(*) AS outd FROM e2 GROUP BY src),
             |n2 AS (SELECT DISTINCT src AS node FROM e2
             |       UNION SELECT DISTINCT dst FROM e2),
             |w0 AS (SELECT n2.node, coalesce(r3.pr, 1000000000000) AS pr
             |       FROM n2 LEFT JOIN r3 USING (node)),
             |s4 AS (SELECT e2.dst AS node, sum(w0.pr // o2.outd) AS s
             |       FROM e2 JOIN o2 USING (src) JOIN w0 ON w0.node = e2.src
             |       GROUP BY e2.dst),
             |r4 AS (SELECT n2.node,
             |              150000000000 + (85 * coalesce(s4.s, 0)) // 100 AS pr
             |       FROM n2 LEFT JOIN s4 USING (node)),
             |s5 AS (SELECT e2.dst AS node, sum(r4.pr // o2.outd) AS s
             |       FROM e2 JOIN o2 USING (src) JOIN r4 ON r4.node = e2.src
             |       GROUP BY e2.dst),
             |r5 AS (SELECT n2.node,
             |              150000000000 + (85 * coalesce(s5.s, 0)) // 100 AS pr
             |       FROM n2 LEFT JOIN s5 USING (node))
             |SELECT node, CAST(pr AS BIGINT) AS pr
             |FROM r5
             |ORDER BY node""".stripMargin),
      doc = "incremental PageRank: keyed-MERGE edge diff (retractions + additions), warm-start delta rounds from prior ranks, full cold+diff+warm iteration-replay oracle"),

    // Personalized (topic-sensitive / TrustRank-shaped) PageRank:
    // teleport mass concentrates on a 3-host trusted seed set, so a
    // host's score reads "how reachable from the seeds" — the spam-
    // demotion / topical-quality prior. Same integer loop, one
    // per-node base column; the oracle replays rounds with a CASE on
    // seed membership.
    Q("doc_link_pagerank_seeded",
      (s, dir) => {
        import graft.operators.LinkGraph
        import s.implicits._
        def host(e: org.apache.spark.sql.Column) =
          concat(lit("h"), pmod(e, lit(23)).cast("string"), lit(".example"))
        val docs = Tables.documents(s, dir)
        val edges = docs.select(host(col("doc_id")).as("src"),
            host(col("doc_id") * 7 + 1).as("dst"))
          .unionByName(docs.select(host(col("doc_id")).as("src"),
            host(col("doc_id") * 13 + 5).as("dst")))
        val seeds = Seq("h0.example", "h5.example", "h10.example").toDF("node")
        LinkGraph.pageRankInt(edges, "src", "dst", iterations = 3,
            seeds = Some(seeds))
          .withColumnRenamed("rank", "pr")
          .orderBy(col("node"))
      },
      Some("""WITH e AS (
             |  SELECT DISTINCT
             |         'h' || CAST(doc_id % 23 AS VARCHAR) || '.example' AS src,
             |         'h' || CAST((7*doc_id+1) % 23 AS VARCHAR) || '.example' AS dst
             |  FROM documents
             |  UNION
             |  SELECT DISTINCT
             |         'h' || CAST(doc_id % 23 AS VARCHAR) || '.example',
             |         'h' || CAST((13*doc_id+5) % 23 AS VARCHAR) || '.example'
             |  FROM documents),
             |o AS (SELECT src, count(*) AS outd FROM e GROUP BY src),
             |n AS (SELECT DISTINCT src AS node FROM e
             |      UNION SELECT DISTINCT dst FROM e),
             |b AS (SELECT node,
             |             CASE WHEN node IN ('h0.example', 'h5.example',
             |                                'h10.example')
             |                  THEN 150000000000 ELSE 0 END AS base
             |      FROM n),
             |r0 AS (SELECT node, CAST(1000000000000 AS HUGEINT) AS pr FROM n),
             |s1 AS (SELECT e.dst AS node, sum(r0.pr // o.outd) AS s
             |       FROM e JOIN o USING (src) JOIN r0 ON r0.node = e.src
             |       GROUP BY e.dst),
             |r1 AS (SELECT b.node,
             |              b.base + (85 * coalesce(s1.s, 0)) // 100 AS pr
             |       FROM b LEFT JOIN s1 USING (node)),
             |s2 AS (SELECT e.dst AS node, sum(r1.pr // o.outd) AS s
             |       FROM e JOIN o USING (src) JOIN r1 ON r1.node = e.src
             |       GROUP BY e.dst),
             |r2 AS (SELECT b.node,
             |              b.base + (85 * coalesce(s2.s, 0)) // 100 AS pr
             |       FROM b LEFT JOIN s2 USING (node)),
             |s3 AS (SELECT e.dst AS node, sum(r2.pr // o.outd) AS s
             |       FROM e JOIN o USING (src) JOIN r2 ON r2.node = e.src
             |       GROUP BY e.dst),
             |r3 AS (SELECT b.node,
             |              b.base + (85 * coalesce(s3.s, 0)) // 100 AS pr
             |       FROM b LEFT JOIN s3 USING (node))
             |SELECT node, CAST(pr AS BIGINT) AS pr
             |FROM r3
             |ORDER BY node""".stripMargin),
      doc = "personalized/topic-sensitive PageRank: teleport concentrated on a trusted seed set (TrustRank shape), per-node integer base, seed-CASE iteration-replay oracle"),

    // HITS hubs & authorities over the same planted host graph — the
    // complementary link prior (PageRank endorses, HITS separates
    // directory hosts from content hosts; link farms are hubs with no
    // authority). The integer rescale (floor-div by
    // g = (max + scale − 1) div scale) replaces the float norm, so
    // the oracle replays both sides of both rounds as CTE layers with
    // a max subquery per rescale.
    Q("doc_link_hits",
      (s, dir) => hitsSalsa23(s, dir)._1.orderBy(col("node")),
      Some("""WITH e AS (
             |  SELECT DISTINCT
             |         'h' || CAST(doc_id % 23 AS VARCHAR) || '.example' AS src,
             |         'h' || CAST((7*doc_id+1) % 23 AS VARCHAR) || '.example' AS dst
             |  FROM documents
             |  UNION
             |  SELECT DISTINCT
             |         'h' || CAST(doc_id % 23 AS VARCHAR) || '.example',
             |         'h' || CAST((13*doc_id+5) % 23 AS VARCHAR) || '.example'
             |  FROM documents),
             |n AS (SELECT DISTINCT src AS node FROM e
             |      UNION SELECT DISTINCT dst FROM e),
             |h0 AS (SELECT node, CAST(1000000000000 AS HUGEINT) AS hub FROM n),
             |a1r AS (SELECT e.dst AS node, sum(h0.hub) AS raw
             |        FROM e JOIN h0 ON h0.node = e.src GROUP BY e.dst),
             |a1m AS (SELECT max(raw) AS m FROM a1r),
             |a1 AS (SELECT n.node, coalesce(a1r.raw, 0)
             |              // ((a1m.m + 1000000000000 - 1) // 1000000000000)
             |              AS auth
             |       FROM n LEFT JOIN a1r USING (node) CROSS JOIN a1m),
             |h1r AS (SELECT e.src AS node, sum(a1.auth) AS raw
             |        FROM e JOIN a1 ON a1.node = e.dst GROUP BY e.src),
             |h1m AS (SELECT max(raw) AS m FROM h1r),
             |h1 AS (SELECT n.node, coalesce(h1r.raw, 0)
             |              // ((h1m.m + 1000000000000 - 1) // 1000000000000)
             |              AS hub
             |       FROM n LEFT JOIN h1r USING (node) CROSS JOIN h1m),
             |a2r AS (SELECT e.dst AS node, sum(h1.hub) AS raw
             |        FROM e JOIN h1 ON h1.node = e.src GROUP BY e.dst),
             |a2m AS (SELECT max(raw) AS m FROM a2r),
             |a2 AS (SELECT n.node, coalesce(a2r.raw, 0)
             |              // ((a2m.m + 1000000000000 - 1) // 1000000000000)
             |              AS auth
             |       FROM n LEFT JOIN a2r USING (node) CROSS JOIN a2m),
             |h2r AS (SELECT e.src AS node, sum(a2.auth) AS raw
             |        FROM e JOIN a2 ON a2.node = e.dst GROUP BY e.src),
             |h2m AS (SELECT max(raw) AS m FROM h2r),
             |h2 AS (SELECT n.node, coalesce(h2r.raw, 0)
             |              // ((h2m.m + 1000000000000 - 1) // 1000000000000)
             |              AS hub
             |       FROM n LEFT JOIN h2r USING (node) CROSS JOIN h2m)
             |SELECT n.node, CAST(h2.hub AS BIGINT) AS hub,
             |       CAST(a2.auth AS BIGINT) AS auth
             |FROM n JOIN h2 USING (node) JOIN a2 USING (node)
             |ORDER BY n.node""".stripMargin),
      doc = "HITS hubs/authorities link prior: integer-exact rescale rounds (floor-div normalization), partitioning-invariant, full iteration-replay oracle"),

    // INCREMENTAL HITS — the nightly-crawl refresh for the
    // hub/authority prior, mirroring doc_link_pagerank_delta: 2 cold
    // rounds establish hubs, an edge diff applies (one host's
    // outlinks retract, five hosts gain links to a new hub host), and
    // ONE warm round resumes from the prior hubs instead of a full
    // recompute (hub is the loop's only carried state — auth derives
    // from it — so the resume is exact, spec-pinned). The oracle
    // replays everything: 2 cold rescale rounds, the closed-form
    // merged edge set, the warm seed join, 1 more rescale round.
    Q("doc_link_hits_delta",
      (s, dir) => {
        import graft.operators.LinkGraph
        def host(e: org.apache.spark.sql.Column) =
          concat(lit("h"), pmod(e, lit(23)).cast("string"), lit(".example"))
        val docs = Tables.documents(s, dir)
        val e1 = docs.select(host(col("doc_id")).as("src"),
            host(col("doc_id") * 7 + 1).as("dst"))
          .unionByName(docs.select(host(col("doc_id")).as("src"),
            host(col("doc_id") * 13 + 5).as("dst")))
        val prior = hitsSalsa23(s, dir)._1 // the same cold run, memoized
        val e2 = e1.filter(col("src") =!= "h3.example").distinct()
          .unionByName(docs
            .select(host(pmod(col("doc_id"), lit(5))).as("src"),
              lit("hub.example").as("dst")).distinct())
        LinkGraph.hitsInt(e2, "src", "dst", iterations = 1,
            init = Some(prior.select(col("node"), col("hub"))))
          .orderBy(col("node"))
      },
      Some("""WITH e AS (
             |  SELECT DISTINCT
             |         'h' || CAST(doc_id % 23 AS VARCHAR) || '.example' AS src,
             |         'h' || CAST((7*doc_id+1) % 23 AS VARCHAR) || '.example' AS dst
             |  FROM documents
             |  UNION
             |  SELECT DISTINCT
             |         'h' || CAST(doc_id % 23 AS VARCHAR) || '.example',
             |         'h' || CAST((13*doc_id+5) % 23 AS VARCHAR) || '.example'
             |  FROM documents),
             |n AS (SELECT DISTINCT src AS node FROM e
             |      UNION SELECT DISTINCT dst FROM e),
             |h0 AS (SELECT node, CAST(1000000000000 AS HUGEINT) AS hub FROM n),
             |a1r AS (SELECT e.dst AS node, sum(h0.hub) AS raw
             |        FROM e JOIN h0 ON h0.node = e.src GROUP BY e.dst),
             |a1m AS (SELECT max(raw) AS m FROM a1r),
             |a1 AS (SELECT n.node, coalesce(a1r.raw, 0)
             |              // ((a1m.m + 1000000000000 - 1) // 1000000000000)
             |              AS auth
             |       FROM n LEFT JOIN a1r USING (node) CROSS JOIN a1m),
             |h1r AS (SELECT e.src AS node, sum(a1.auth) AS raw
             |        FROM e JOIN a1 ON a1.node = e.dst GROUP BY e.src),
             |h1m AS (SELECT max(raw) AS m FROM h1r),
             |h1 AS (SELECT n.node, coalesce(h1r.raw, 0)
             |              // ((h1m.m + 1000000000000 - 1) // 1000000000000)
             |              AS hub
             |       FROM n LEFT JOIN h1r USING (node) CROSS JOIN h1m),
             |a2r AS (SELECT e.dst AS node, sum(h1.hub) AS raw
             |        FROM e JOIN h1 ON h1.node = e.src GROUP BY e.dst),
             |a2m AS (SELECT max(raw) AS m FROM a2r),
             |a2 AS (SELECT n.node, coalesce(a2r.raw, 0)
             |              // ((a2m.m + 1000000000000 - 1) // 1000000000000)
             |              AS auth
             |       FROM n LEFT JOIN a2r USING (node) CROSS JOIN a2m),
             |h2r AS (SELECT e.src AS node, sum(a2.auth) AS raw
             |        FROM e JOIN a2 ON a2.node = e.dst GROUP BY e.src),
             |h2m AS (SELECT max(raw) AS m FROM h2r),
             |h2 AS (SELECT n.node, coalesce(h2r.raw, 0)
             |              // ((h2m.m + 1000000000000 - 1) // 1000000000000)
             |              AS hub
             |       FROM n LEFT JOIN h2r USING (node) CROSS JOIN h2m),
             |e2 AS (SELECT src, dst FROM e WHERE src <> 'h3.example'
             |       UNION
             |       SELECT DISTINCT
             |              'h' || CAST(doc_id % 5 AS VARCHAR) || '.example',
             |              'hub.example'
             |       FROM documents),
             |n2 AS (SELECT DISTINCT src AS node FROM e2
             |       UNION SELECT DISTINCT dst FROM e2),
             |w0 AS (SELECT n2.node, coalesce(h2.hub, 1000000000000) AS hub
             |       FROM n2 LEFT JOIN h2 USING (node)),
             |wa1r AS (SELECT e2.dst AS node, sum(w0.hub) AS raw
             |         FROM e2 JOIN w0 ON w0.node = e2.src GROUP BY e2.dst),
             |wa1m AS (SELECT max(raw) AS m FROM wa1r),
             |wa1 AS (SELECT n2.node, coalesce(wa1r.raw, 0)
             |               // ((wa1m.m + 1000000000000 - 1) // 1000000000000)
             |               AS auth
             |        FROM n2 LEFT JOIN wa1r USING (node) CROSS JOIN wa1m),
             |wh1r AS (SELECT e2.src AS node, sum(wa1.auth) AS raw
             |         FROM e2 JOIN wa1 ON wa1.node = e2.dst GROUP BY e2.src),
             |wh1m AS (SELECT max(raw) AS m FROM wh1r),
             |wh1 AS (SELECT n2.node, coalesce(wh1r.raw, 0)
             |               // ((wh1m.m + 1000000000000 - 1) // 1000000000000)
             |               AS hub
             |        FROM n2 LEFT JOIN wh1r USING (node) CROSS JOIN wh1m)
             |SELECT n2.node, CAST(wh1.hub AS BIGINT) AS hub,
             |       CAST(wa1.auth AS BIGINT) AS auth
             |FROM n2 JOIN wh1 USING (node) JOIN wa1 USING (node)
             |ORDER BY n2.node""".stripMargin),
      doc = "incremental HITS: edge diff (retraction + new hub host) + one warm rescale round from prior hubs, full cold+diff+warm iteration-replay oracle"),

    // SALSA over the same planted host graph — the degree-normalized
    // (random-walk) hubs/authorities variant. No rescale step exists,
    // so the oracle replay is pure join+sum layers; comparing SALSA
    // against HITS on the same graph is the classic
    // tightly-knit-community spam signal (HITS inflates TKC scores,
    // SALSA doesn't).
    Q("doc_link_salsa",
      (s, dir) => hitsSalsa23(s, dir)._2.orderBy(col("node")),
      Some("""WITH e AS (
             |  SELECT DISTINCT
             |         'h' || CAST(doc_id % 23 AS VARCHAR) || '.example' AS src,
             |         'h' || CAST((7*doc_id+1) % 23 AS VARCHAR) || '.example' AS dst
             |  FROM documents
             |  UNION
             |  SELECT DISTINCT
             |         'h' || CAST(doc_id % 23 AS VARCHAR) || '.example',
             |         'h' || CAST((13*doc_id+5) % 23 AS VARCHAR) || '.example'
             |  FROM documents),
             |o AS (SELECT src, count(*) AS outd FROM e GROUP BY src),
             |i AS (SELECT dst, count(*) AS ind FROM e GROUP BY dst),
             |n AS (SELECT DISTINCT src AS node FROM e
             |      UNION SELECT DISTINCT dst FROM e),
             |h0 AS (SELECT node, CAST(1000000000000 AS HUGEINT) AS hub FROM n),
             |a1r AS (SELECT e.dst AS node, sum(h0.hub // o.outd) AS s
             |        FROM e JOIN o USING (src) JOIN h0 ON h0.node = e.src
             |        GROUP BY e.dst),
             |a1 AS (SELECT n.node, coalesce(a1r.s, 0) AS auth
             |       FROM n LEFT JOIN a1r USING (node)),
             |h1r AS (SELECT e.src AS node, sum(a1.auth // i.ind) AS s
             |        FROM e JOIN i USING (dst) JOIN a1 ON a1.node = e.dst
             |        GROUP BY e.src),
             |h1 AS (SELECT n.node, coalesce(h1r.s, 0) AS hub
             |       FROM n LEFT JOIN h1r USING (node)),
             |a2r AS (SELECT e.dst AS node, sum(h1.hub // o.outd) AS s
             |        FROM e JOIN o USING (src) JOIN h1 ON h1.node = e.src
             |        GROUP BY e.dst),
             |a2 AS (SELECT n.node, coalesce(a2r.s, 0) AS auth
             |       FROM n LEFT JOIN a2r USING (node)),
             |h2r AS (SELECT e.src AS node, sum(a2.auth // i.ind) AS s
             |        FROM e JOIN i USING (dst) JOIN a2 ON a2.node = e.dst
             |        GROUP BY e.src),
             |h2 AS (SELECT n.node, coalesce(h2r.s, 0) AS hub
             |       FROM n LEFT JOIN h2r USING (node))
             |SELECT n.node, CAST(h2.hub AS BIGINT) AS hub,
             |       CAST(a2.auth AS BIGINT) AS auth
             |FROM n JOIN h2 USING (node) JOIN a2 USING (node)
             |ORDER BY n.node""".stripMargin),
      doc = "SALSA (degree-normalized hubs/authorities): mass-conserving floor-div rounds, no rescale, pure join+sum iteration-replay oracle; the HITS contrast is the TKC spam signal"),

    // INCREMENTAL SALSA — the doc_link_hits_delta shape for the
    // degree-normalized variant: the memoized 2-round cold run seeds
    // ONE warm round over the diffed edge set (hub is the only carried
    // state here too). NOTE the semantic difference from HITS worth
    // testing: SALSA's degrees are part of the update, so the diff
    // changes BOTH the graph and the normalizers — the oracle replays
    // cold rounds with the old degrees and the warm round with the
    // new ones.
    Q("doc_link_salsa_delta",
      (s, dir) => {
        import graft.operators.LinkGraph
        def host(e: org.apache.spark.sql.Column) =
          concat(lit("h"), pmod(e, lit(23)).cast("string"), lit(".example"))
        val docs = Tables.documents(s, dir)
        val e1 = docs.select(host(col("doc_id")).as("src"),
            host(col("doc_id") * 7 + 1).as("dst"))
          .unionByName(docs.select(host(col("doc_id")).as("src"),
            host(col("doc_id") * 13 + 5).as("dst")))
        val prior = hitsSalsa23(s, dir)._2 // the memoized cold run
        val e2 = e1.filter(col("src") =!= "h3.example").distinct()
          .unionByName(docs
            .select(host(pmod(col("doc_id"), lit(5))).as("src"),
              lit("hub.example").as("dst")).distinct())
        LinkGraph.salsaInt(e2, "src", "dst", iterations = 1,
            init = Some(prior.select(col("node"), col("hub"))))
          .orderBy(col("node"))
      },
      Some("""WITH e AS (
             |  SELECT DISTINCT
             |         'h' || CAST(doc_id % 23 AS VARCHAR) || '.example' AS src,
             |         'h' || CAST((7*doc_id+1) % 23 AS VARCHAR) || '.example' AS dst
             |  FROM documents
             |  UNION
             |  SELECT DISTINCT
             |         'h' || CAST(doc_id % 23 AS VARCHAR) || '.example',
             |         'h' || CAST((13*doc_id+5) % 23 AS VARCHAR) || '.example'
             |  FROM documents),
             |o AS (SELECT src, count(*) AS outd FROM e GROUP BY src),
             |i AS (SELECT dst, count(*) AS ind FROM e GROUP BY dst),
             |n AS (SELECT DISTINCT src AS node FROM e
             |      UNION SELECT DISTINCT dst FROM e),
             |h0 AS (SELECT node, CAST(1000000000000 AS HUGEINT) AS hub FROM n),
             |a1r AS (SELECT e.dst AS node, sum(h0.hub // o.outd) AS s
             |        FROM e JOIN o USING (src) JOIN h0 ON h0.node = e.src
             |        GROUP BY e.dst),
             |a1 AS (SELECT n.node, coalesce(a1r.s, 0) AS auth
             |       FROM n LEFT JOIN a1r USING (node)),
             |h1r AS (SELECT e.src AS node, sum(a1.auth // i.ind) AS s
             |        FROM e JOIN i USING (dst) JOIN a1 ON a1.node = e.dst
             |        GROUP BY e.src),
             |h1 AS (SELECT n.node, coalesce(h1r.s, 0) AS hub
             |       FROM n LEFT JOIN h1r USING (node)),
             |a2r AS (SELECT e.dst AS node, sum(h1.hub // o.outd) AS s
             |        FROM e JOIN o USING (src) JOIN h1 ON h1.node = e.src
             |        GROUP BY e.dst),
             |a2 AS (SELECT n.node, coalesce(a2r.s, 0) AS auth
             |       FROM n LEFT JOIN a2r USING (node)),
             |h2r AS (SELECT e.src AS node, sum(a2.auth // i.ind) AS s
             |        FROM e JOIN i USING (dst) JOIN a2 ON a2.node = e.dst
             |        GROUP BY e.src),
             |h2 AS (SELECT n.node, coalesce(h2r.s, 0) AS hub
             |       FROM n LEFT JOIN h2r USING (node)),
             |e2 AS (SELECT src, dst FROM e WHERE src <> 'h3.example'
             |       UNION
             |       SELECT DISTINCT
             |              'h' || CAST(doc_id % 5 AS VARCHAR) || '.example',
             |              'hub.example'
             |       FROM documents),
             |o2 AS (SELECT src, count(*) AS outd FROM e2 GROUP BY src),
             |i2 AS (SELECT dst, count(*) AS ind FROM e2 GROUP BY dst),
             |n2 AS (SELECT DISTINCT src AS node FROM e2
             |       UNION SELECT DISTINCT dst FROM e2),
             |w0 AS (SELECT n2.node, coalesce(h2.hub, 1000000000000) AS hub
             |       FROM n2 LEFT JOIN h2 USING (node)),
             |wa1r AS (SELECT e2.dst AS node, sum(w0.hub // o2.outd) AS s
             |         FROM e2 JOIN o2 USING (src) JOIN w0 ON w0.node = e2.src
             |         GROUP BY e2.dst),
             |wa1 AS (SELECT n2.node, coalesce(wa1r.s, 0) AS auth
             |        FROM n2 LEFT JOIN wa1r USING (node)),
             |wh1r AS (SELECT e2.src AS node, sum(wa1.auth // i2.ind) AS s
             |         FROM e2 JOIN i2 USING (dst) JOIN wa1 ON wa1.node = e2.dst
             |         GROUP BY e2.src),
             |wh1 AS (SELECT n2.node, coalesce(wh1r.s, 0) AS hub
             |        FROM n2 LEFT JOIN wh1r USING (node))
             |SELECT n2.node, CAST(wh1.hub AS BIGINT) AS hub,
             |       CAST(wa1.auth AS BIGINT) AS auth
             |FROM n2 JOIN wh1 USING (node) JOIN wa1 USING (node)
             |ORDER BY n2.node""".stripMargin),
      doc = "incremental SALSA: edge diff + one warm degree-normalized round from prior hubs (new degrees, old state), full cold+diff+warm iteration-replay oracle"),

    // The TKC detector itself: HITS hub rank vs SALSA hub rank on the
    // SAME graph. A tightly-knit community inflates HITS (mutual
    // reinforcement) but not the degree-normalized SALSA, so a large
    // positive (salsa_rank − hits_rank) gap — "HITS thinks this host
    // matters, the random walk doesn't" — is the classic link-farm
    // flag. Everything integer; ranks are row_numbers under a total
    // (score desc, node) order, so both engines agree exactly. The
    // oracle concatenates the two already-pinned iteration replays
    // and ranks the join.
    Q("doc_link_tkc",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val (h23, s23) = hitsSalsa23(s, dir)
        val hits = h23.select(col("node"), col("hub").as("hits_hub"))
        val salsa = s23.select(col("node"), col("hub").as("salsa_hub"))
        // 23 rows — the global rank windows are driver-trivial here;
        // at web scale this ranking is a top-k/quantile pass instead
        hits.join(salsa, Seq("node"))
          .withColumn("hits_rank", row_number().over(
            Window.orderBy(col("hits_hub").desc, col("node"))).cast("long"))
          .withColumn("salsa_rank", row_number().over(
            Window.orderBy(col("salsa_hub").desc, col("node"))).cast("long"))
          .withColumn("divergence", col("salsa_rank") - col("hits_rank"))
          .orderBy(col("node"))
      },
      Some("""WITH e AS (
             |  SELECT DISTINCT
             |         'h' || CAST(doc_id % 23 AS VARCHAR) || '.example' AS src,
             |         'h' || CAST((7*doc_id+1) % 23 AS VARCHAR) || '.example' AS dst
             |  FROM documents
             |  UNION
             |  SELECT DISTINCT
             |         'h' || CAST(doc_id % 23 AS VARCHAR) || '.example',
             |         'h' || CAST((13*doc_id+5) % 23 AS VARCHAR) || '.example'
             |  FROM documents),
             |o AS (SELECT src, count(*) AS outd FROM e GROUP BY src),
             |i AS (SELECT dst, count(*) AS ind FROM e GROUP BY dst),
             |n AS (SELECT DISTINCT src AS node FROM e
             |      UNION SELECT DISTINCT dst FROM e),
             |h0 AS (SELECT node, CAST(1000000000000 AS HUGEINT) AS hub FROM n),
             |a1r AS (SELECT e.dst AS node, sum(h0.hub) AS raw
             |        FROM e JOIN h0 ON h0.node = e.src GROUP BY e.dst),
             |a1m AS (SELECT max(raw) AS m FROM a1r),
             |a1 AS (SELECT n.node, coalesce(a1r.raw, 0)
             |              // ((a1m.m + 1000000000000 - 1) // 1000000000000)
             |              AS auth
             |       FROM n LEFT JOIN a1r USING (node) CROSS JOIN a1m),
             |h1r AS (SELECT e.src AS node, sum(a1.auth) AS raw
             |        FROM e JOIN a1 ON a1.node = e.dst GROUP BY e.src),
             |h1m AS (SELECT max(raw) AS m FROM h1r),
             |h1 AS (SELECT n.node, coalesce(h1r.raw, 0)
             |              // ((h1m.m + 1000000000000 - 1) // 1000000000000)
             |              AS hub
             |       FROM n LEFT JOIN h1r USING (node) CROSS JOIN h1m),
             |a2r AS (SELECT e.dst AS node, sum(h1.hub) AS raw
             |        FROM e JOIN h1 ON h1.node = e.src GROUP BY e.dst),
             |a2m AS (SELECT max(raw) AS m FROM a2r),
             |a2 AS (SELECT n.node, coalesce(a2r.raw, 0)
             |              // ((a2m.m + 1000000000000 - 1) // 1000000000000)
             |              AS auth
             |       FROM n LEFT JOIN a2r USING (node) CROSS JOIN a2m),
             |h2r AS (SELECT e.src AS node, sum(a2.auth) AS raw
             |        FROM e JOIN a2 ON a2.node = e.dst GROUP BY e.src),
             |h2m AS (SELECT max(raw) AS m FROM h2r),
             |h2 AS (SELECT n.node, coalesce(h2r.raw, 0)
             |              // ((h2m.m + 1000000000000 - 1) // 1000000000000)
             |              AS hub
             |       FROM n LEFT JOIN h2r USING (node) CROSS JOIN h2m),
             |sa1r AS (SELECT e.dst AS node, sum(h0.hub // o.outd) AS s
             |         FROM e JOIN o USING (src) JOIN h0 ON h0.node = e.src
             |         GROUP BY e.dst),
             |sa1 AS (SELECT n.node, coalesce(sa1r.s, 0) AS auth
             |        FROM n LEFT JOIN sa1r USING (node)),
             |sh1r AS (SELECT e.src AS node, sum(sa1.auth // i.ind) AS s
             |         FROM e JOIN i USING (dst) JOIN sa1 ON sa1.node = e.dst
             |         GROUP BY e.src),
             |sh1 AS (SELECT n.node, coalesce(sh1r.s, 0) AS hub
             |        FROM n LEFT JOIN sh1r USING (node)),
             |sa2r AS (SELECT e.dst AS node, sum(sh1.hub // o.outd) AS s
             |         FROM e JOIN o USING (src) JOIN sh1 ON sh1.node = e.src
             |         GROUP BY e.dst),
             |sa2 AS (SELECT n.node, coalesce(sa2r.s, 0) AS auth
             |        FROM n LEFT JOIN sa2r USING (node)),
             |sh2r AS (SELECT e.src AS node, sum(sa2.auth // i.ind) AS s
             |         FROM e JOIN i USING (dst) JOIN sa2 ON sa2.node = e.dst
             |         GROUP BY e.src),
             |sh2 AS (SELECT n.node, coalesce(sh2r.s, 0) AS hub
             |        FROM n LEFT JOIN sh2r USING (node)),
             |j AS (SELECT n.node, CAST(h2.hub AS BIGINT) AS hits_hub,
             |             CAST(sh2.hub AS BIGINT) AS salsa_hub
             |      FROM n JOIN h2 USING (node) JOIN sh2 USING (node)),
             |r AS (SELECT node, hits_hub, salsa_hub,
             |             CAST(row_number() OVER
             |               (ORDER BY hits_hub DESC, node) AS BIGINT)
             |               AS hits_rank,
             |             CAST(row_number() OVER
             |               (ORDER BY salsa_hub DESC, node) AS BIGINT)
             |               AS salsa_rank
             |      FROM j)
             |SELECT node, hits_hub, salsa_hub, hits_rank, salsa_rank,
             |       salsa_rank - hits_rank AS divergence
             |FROM r
             |ORDER BY node""".stripMargin),
      doc = "TKC link-farm detector: HITS hub rank vs SALSA hub rank on the same graph (row_number under a total order), divergence flags mutual-reinforcement inflation"),

    // The WEB-SCALE form of the TKC detector: no global row_number
    // window anywhere (an unpartitioned window is one task sorting
    // every host — dead at 10^8 hosts). The k suspects come off the
    // HITS side as a distributed TakeOrdered top-k, and each one's
    // EXACT global rank in both score relations is a broadcast
    // count-of-greater (k comparisons per scanned row, map-side,
    // partial-aggregated). Values are identical to doc_link_tkc
    // restricted to hits_rank <= k — which is exactly what the oracle
    // replays (the full naive ranking, filtered), so the hash compare
    // proves the sort-free form EQUALS the window form.
    Q("doc_link_tkc_topk",
      (s, dir) => {
        import graft.operators.LinkGraph
        val (h23, s23) = hitsSalsa23(s, dir)
        LinkGraph.tkcTopKFromScores(
            h23.select(col("node"), col("hub").as("hits_hub")),
            s23.select(col("node"), col("hub").as("salsa_hub")), k = 10)
          .orderBy(col("node"))
      },
      Some("""WITH e AS (
             |  SELECT DISTINCT
             |         'h' || CAST(doc_id % 23 AS VARCHAR) || '.example' AS src,
             |         'h' || CAST((7*doc_id+1) % 23 AS VARCHAR) || '.example' AS dst
             |  FROM documents
             |  UNION
             |  SELECT DISTINCT
             |         'h' || CAST(doc_id % 23 AS VARCHAR) || '.example',
             |         'h' || CAST((13*doc_id+5) % 23 AS VARCHAR) || '.example'
             |  FROM documents),
             |o AS (SELECT src, count(*) AS outd FROM e GROUP BY src),
             |i AS (SELECT dst, count(*) AS ind FROM e GROUP BY dst),
             |n AS (SELECT DISTINCT src AS node FROM e
             |      UNION SELECT DISTINCT dst FROM e),
             |h0 AS (SELECT node, CAST(1000000000000 AS HUGEINT) AS hub FROM n),
             |a1r AS (SELECT e.dst AS node, sum(h0.hub) AS raw
             |        FROM e JOIN h0 ON h0.node = e.src GROUP BY e.dst),
             |a1m AS (SELECT max(raw) AS m FROM a1r),
             |a1 AS (SELECT n.node, coalesce(a1r.raw, 0)
             |              // ((a1m.m + 1000000000000 - 1) // 1000000000000)
             |              AS auth
             |       FROM n LEFT JOIN a1r USING (node) CROSS JOIN a1m),
             |h1r AS (SELECT e.src AS node, sum(a1.auth) AS raw
             |        FROM e JOIN a1 ON a1.node = e.dst GROUP BY e.src),
             |h1m AS (SELECT max(raw) AS m FROM h1r),
             |h1 AS (SELECT n.node, coalesce(h1r.raw, 0)
             |              // ((h1m.m + 1000000000000 - 1) // 1000000000000)
             |              AS hub
             |       FROM n LEFT JOIN h1r USING (node) CROSS JOIN h1m),
             |a2r AS (SELECT e.dst AS node, sum(h1.hub) AS raw
             |        FROM e JOIN h1 ON h1.node = e.src GROUP BY e.dst),
             |a2m AS (SELECT max(raw) AS m FROM a2r),
             |a2 AS (SELECT n.node, coalesce(a2r.raw, 0)
             |              // ((a2m.m + 1000000000000 - 1) // 1000000000000)
             |              AS auth
             |       FROM n LEFT JOIN a2r USING (node) CROSS JOIN a2m),
             |h2r AS (SELECT e.src AS node, sum(a2.auth) AS raw
             |        FROM e JOIN a2 ON a2.node = e.dst GROUP BY e.src),
             |h2m AS (SELECT max(raw) AS m FROM h2r),
             |h2 AS (SELECT n.node, coalesce(h2r.raw, 0)
             |              // ((h2m.m + 1000000000000 - 1) // 1000000000000)
             |              AS hub
             |       FROM n LEFT JOIN h2r USING (node) CROSS JOIN h2m),
             |sa1r AS (SELECT e.dst AS node, sum(h0.hub // o.outd) AS s
             |         FROM e JOIN o USING (src) JOIN h0 ON h0.node = e.src
             |         GROUP BY e.dst),
             |sa1 AS (SELECT n.node, coalesce(sa1r.s, 0) AS auth
             |        FROM n LEFT JOIN sa1r USING (node)),
             |sh1r AS (SELECT e.src AS node, sum(sa1.auth // i.ind) AS s
             |         FROM e JOIN i USING (dst) JOIN sa1 ON sa1.node = e.dst
             |         GROUP BY e.src),
             |sh1 AS (SELECT n.node, coalesce(sh1r.s, 0) AS hub
             |        FROM n LEFT JOIN sh1r USING (node)),
             |sa2r AS (SELECT e.dst AS node, sum(sh1.hub // o.outd) AS s
             |         FROM e JOIN o USING (src) JOIN sh1 ON sh1.node = e.src
             |         GROUP BY e.dst),
             |sa2 AS (SELECT n.node, coalesce(sa2r.s, 0) AS auth
             |        FROM n LEFT JOIN sa2r USING (node)),
             |sh2r AS (SELECT e.src AS node, sum(sa2.auth // i.ind) AS s
             |         FROM e JOIN i USING (dst) JOIN sa2 ON sa2.node = e.dst
             |         GROUP BY e.src),
             |sh2 AS (SELECT n.node, coalesce(sh2r.s, 0) AS hub
             |        FROM n LEFT JOIN sh2r USING (node)),
             |j AS (SELECT n.node, CAST(h2.hub AS BIGINT) AS hits_hub,
             |             CAST(sh2.hub AS BIGINT) AS salsa_hub
             |      FROM n JOIN h2 USING (node) JOIN sh2 USING (node)),
             |r AS (SELECT node, hits_hub, salsa_hub,
             |             CAST(row_number() OVER
             |               (ORDER BY hits_hub DESC, node) AS BIGINT)
             |               AS hits_rank,
             |             CAST(row_number() OVER
             |               (ORDER BY salsa_hub DESC, node) AS BIGINT)
             |               AS salsa_rank
             |      FROM j)
             |SELECT node, hits_hub, salsa_hub, hits_rank, salsa_rank,
             |       salsa_rank - hits_rank AS divergence
             |FROM r
             |WHERE hits_rank <= 10
             |ORDER BY node""".stripMargin),
      doc = "web-scale TKC detector: distributed top-k suspects + broadcast count-of-greater exact ranks (no global window/sort in the plan); hash-equals the naive window form filtered to the same top-k"),

    // Dangling-mass redistribution — the textbook PageRank correction
    // for rank sinks, integer-exact: three SINK hosts receive links
    // but link nowhere, so each round their total rank D redistributes
    // as share = D div N inside the damping term (a 1-row broadcast
    // scalar on the Spark side). The oracle replays all three rounds
    // with one dangling-sum CTE + one cross-joined scalar per round.
    Q("doc_link_pagerank_dangling",
      (s, dir) => {
        import graft.operators.LinkGraph
        def host(e: org.apache.spark.sql.Column) =
          concat(lit("h"), pmod(e, lit(23)).cast("string"), lit(".example"))
        val docs = Tables.documents(s, dir)
        val edges = docs.select(host(col("doc_id")).as("src"),
            host(col("doc_id") * 7 + 1).as("dst"))
          .unionByName(docs.select(host(col("doc_id")).as("src"),
            concat(lit("sink"), pmod(col("doc_id"), lit(3)).cast("string"),
              lit(".example")).as("dst")))
        LinkGraph.pageRankInt(edges, "src", "dst", iterations = 3,
            danglingRedistribute = true)
          .withColumnRenamed("rank", "pr")
          .orderBy(col("node"))
      },
      Some("""WITH e AS (
             |  SELECT DISTINCT
             |         'h' || CAST(doc_id % 23 AS VARCHAR) || '.example' AS src,
             |         'h' || CAST((7*doc_id+1) % 23 AS VARCHAR) || '.example' AS dst
             |  FROM documents
             |  UNION
             |  SELECT DISTINCT
             |         'h' || CAST(doc_id % 23 AS VARCHAR) || '.example',
             |         'sink' || CAST(doc_id % 3 AS VARCHAR) || '.example'
             |  FROM documents),
             |o AS (SELECT src, count(*) AS outd FROM e GROUP BY src),
             |n AS (SELECT DISTINCT src AS node FROM e
             |      UNION SELECT DISTINCT dst FROM e),
             |nc AS (SELECT CAST(count(*) AS HUGEINT) AS cnt FROM n),
             |dg AS (SELECT node FROM n
             |       WHERE node NOT IN (SELECT DISTINCT src FROM e)),
             |r0 AS (SELECT node, CAST(1000000000000 AS HUGEINT) AS pr FROM n),
             |d1 AS (SELECT coalesce(sum(r0.pr), 0) AS d
             |       FROM r0 JOIN dg USING (node)),
             |s1 AS (SELECT e.dst AS node, sum(r0.pr // o.outd) AS s
             |       FROM e JOIN o USING (src) JOIN r0 ON r0.node = e.src
             |       GROUP BY e.dst),
             |r1 AS (SELECT n.node, 150000000000
             |              + (85 * (coalesce(s1.s, 0) + d1.d // nc.cnt)) // 100
             |              AS pr
             |       FROM n LEFT JOIN s1 USING (node)
             |       CROSS JOIN d1 CROSS JOIN nc),
             |d2 AS (SELECT coalesce(sum(r1.pr), 0) AS d
             |       FROM r1 JOIN dg USING (node)),
             |s2 AS (SELECT e.dst AS node, sum(r1.pr // o.outd) AS s
             |       FROM e JOIN o USING (src) JOIN r1 ON r1.node = e.src
             |       GROUP BY e.dst),
             |r2 AS (SELECT n.node, 150000000000
             |              + (85 * (coalesce(s2.s, 0) + d2.d // nc.cnt)) // 100
             |              AS pr
             |       FROM n LEFT JOIN s2 USING (node)
             |       CROSS JOIN d2 CROSS JOIN nc),
             |d3 AS (SELECT coalesce(sum(r2.pr), 0) AS d
             |       FROM r2 JOIN dg USING (node)),
             |s3 AS (SELECT e.dst AS node, sum(r2.pr // o.outd) AS s
             |       FROM e JOIN o USING (src) JOIN r2 ON r2.node = e.src
             |       GROUP BY e.dst),
             |r3 AS (SELECT n.node, 150000000000
             |              + (85 * (coalesce(s3.s, 0) + d3.d // nc.cnt)) // 100
             |              AS pr
             |       FROM n LEFT JOIN s3 USING (node)
             |       CROSS JOIN d3 CROSS JOIN nc)
             |SELECT node, CAST(pr AS BIGINT) AS pr
             |FROM r3
             |ORDER BY node""".stripMargin),
      doc = "PageRank with dangling-mass redistribution: per-round sink mass D shares as D div N inside the damping term (1-row broadcast scalar), integer-exact 3-round replay oracle over a graph with real rank sinks"),

    // TrustRank proper (Gyongyi et al.): PageRank seeded at a labeled
    // GOOD set minus PageRank seeded at a labeled SPAM set — the
    // standard spam-demotion score a crawl curation pipeline
    // publishes. Both runs are the existing seeded loop (teleport
    // concentrated on the seed set); the difference is computed
    // host-wise. A strongly negative score means "reachable from spam,
    // not from trust" — the demotion flag. The oracle replays BOTH
    // seeded runs as CASE-base CTE layers and joins them.
    Q("doc_link_trustrank",
      (s, dir) => {
        import graft.operators.LinkGraph
        import s.implicits._
        def host(e: org.apache.spark.sql.Column) =
          concat(lit("h"), pmod(e, lit(23)).cast("string"), lit(".example"))
        val docs = Tables.documents(s, dir)
        val edges = docs.select(host(col("doc_id")).as("src"),
            host(col("doc_id") * 7 + 1).as("dst"))
          .unionByName(docs.select(host(col("doc_id")).as("src"),
            host(col("doc_id") * 13 + 5).as("dst")))
        val good = Seq("h0.example", "h5.example", "h10.example").toDF("node")
        val spam = Seq("h3.example", "h7.example").toDF("node")
        val trust = LinkGraph.pageRankInt(edges, "src", "dst",
            iterations = 2, seeds = Some(good))
          .withColumnRenamed("rank", "trust")
        val spamMass = LinkGraph.pageRankInt(edges, "src", "dst",
            iterations = 2, seeds = Some(spam))
          .withColumnRenamed("rank", "spam_mass")
        trust.join(spamMass, Seq("node"))
          .withColumn("trustrank", col("trust") - col("spam_mass"))
          .orderBy(col("node"))
      },
      Some("""WITH e AS (
             |  SELECT DISTINCT
             |         'h' || CAST(doc_id % 23 AS VARCHAR) || '.example' AS src,
             |         'h' || CAST((7*doc_id+1) % 23 AS VARCHAR) || '.example' AS dst
             |  FROM documents
             |  UNION
             |  SELECT DISTINCT
             |         'h' || CAST(doc_id % 23 AS VARCHAR) || '.example',
             |         'h' || CAST((13*doc_id+5) % 23 AS VARCHAR) || '.example'
             |  FROM documents),
             |o AS (SELECT src, count(*) AS outd FROM e GROUP BY src),
             |n AS (SELECT DISTINCT src AS node FROM e
             |      UNION SELECT DISTINCT dst FROM e),
             |gb AS (SELECT node,
             |              CASE WHEN node IN ('h0.example', 'h5.example',
             |                                 'h10.example')
             |                   THEN 150000000000 ELSE 0 END AS base
             |       FROM n),
             |sb AS (SELECT node,
             |              CASE WHEN node IN ('h3.example', 'h7.example')
             |                   THEN 150000000000 ELSE 0 END AS base
             |       FROM n),
             |r0 AS (SELECT node, CAST(1000000000000 AS HUGEINT) AS pr FROM n),
             |gs1 AS (SELECT e.dst AS node, sum(r0.pr // o.outd) AS s
             |        FROM e JOIN o USING (src) JOIN r0 ON r0.node = e.src
             |        GROUP BY e.dst),
             |gr1 AS (SELECT gb.node,
             |               gb.base + (85 * coalesce(gs1.s, 0)) // 100 AS pr
             |        FROM gb LEFT JOIN gs1 USING (node)),
             |gs2 AS (SELECT e.dst AS node, sum(gr1.pr // o.outd) AS s
             |        FROM e JOIN o USING (src) JOIN gr1 ON gr1.node = e.src
             |        GROUP BY e.dst),
             |gr2 AS (SELECT gb.node,
             |               gb.base + (85 * coalesce(gs2.s, 0)) // 100 AS pr
             |        FROM gb LEFT JOIN gs2 USING (node)),
             |ss1 AS (SELECT e.dst AS node, sum(r0.pr // o.outd) AS s
             |        FROM e JOIN o USING (src) JOIN r0 ON r0.node = e.src
             |        GROUP BY e.dst),
             |sr1 AS (SELECT sb.node,
             |               sb.base + (85 * coalesce(ss1.s, 0)) // 100 AS pr
             |        FROM sb LEFT JOIN ss1 USING (node)),
             |ss2 AS (SELECT e.dst AS node, sum(sr1.pr // o.outd) AS s
             |        FROM e JOIN o USING (src) JOIN sr1 ON sr1.node = e.src
             |        GROUP BY e.dst),
             |sr2 AS (SELECT sb.node,
             |               sb.base + (85 * coalesce(ss2.s, 0)) // 100 AS pr
             |        FROM sb LEFT JOIN ss2 USING (node))
             |SELECT n.node, CAST(gr2.pr AS BIGINT) AS trust,
             |       CAST(sr2.pr AS BIGINT) AS spam_mass,
             |       CAST(gr2.pr AS BIGINT) - CAST(sr2.pr AS BIGINT)
             |         AS trustrank
             |FROM n JOIN gr2 USING (node) JOIN sr2 USING (node)
             |ORDER BY n.node""".stripMargin),
      doc = "TrustRank spam demotion: good-seeded PageRank minus spam-seeded PageRank on the same graph, both integer-exact seeded runs, two-replay CASE-base oracle"),

    // AUTOMATIC TrustRank seed proposal from anchor-text spam
    // features — closing the loop from "the web says X about this
    // host" to the demotion score without hand-labeled seeds. The
    // classic template-stamp signal: a link farm stamps ONE anchor
    // string site-wide (n_texts = 1 across hundreds of inlinks),
    // organic hosts accumulate DIVERSE anchors. Seeds derive
    // relationally from the anchor profile (spam: n_texts = 1 with
    // many links; good: many distinct texts), the farm interlinks as
    // a ring (the TKC shape), and the two seeded integer PR runs
    // produce trust/spam_mass/trustrank per host. The oracle replays
    // the whole chain: closed-form anchors, profile, seed rules as IN
    // subqueries, both 2-round seeded replays.
    Q("doc_trustrank_auto_seeds",
      (s, dir) => {
        import graft.operators.LinkGraph
        import s.implicits._
        val docs = Tables.documents(s, dir)
        // every page (on host h<id%23>) carries one template-stamped
        // anchor to a farm host s<id%3> and one organic anchor to a
        // content host g<id%7>
        val html = concat(
          lit("<p><a href=\"http://s"), pmod(col("doc_id"), lit(3)),
          lit(".example/x\">cheap pills now</a> and <a href='http://g"),
          pmod(col("doc_id"), lit(7)),
          lit(".example/y'>page "), col("doc_id"), lit("</a></p>"))
        val anchors = docs
          .select(col("doc_id"),
            explode(TextFunctions.htmlAnchors(html)).as("a"))
          .select(
            concat(lit("h"), pmod(col("doc_id"), lit(23)), lit(".example"))
              .as("src"),
            regexp_extract(col("a.href"), "^https?://([a-z0-9.-]+)", 1)
              .as("dst"),
            col("a.anchor").as("anchor"))
        val prof = anchors.groupBy(col("dst"))
          .agg(count(lit(1)).as("n_links"),
            countDistinct(col("anchor")).as("n_texts"))
        val spamSeeds = prof
          .filter(col("n_texts") === 1 && col("n_links") > 10)
          .select(col("dst").as("node"))
        val goodSeeds = prof.filter(col("n_texts") > 10)
          .select(col("dst").as("node"))
        // graph: page-host → anchor-target edges, plus the farm's own
        // interlink ring and each content host's outlink to a page host
        val ring = Seq(("s0.example", "s1.example"),
          ("s1.example", "s2.example"), ("s2.example", "s0.example"))
          .toDF("src", "dst")
        val goodOut = (0 until 7)
          .map(k => (s"g$k.example", s"h$k.example")).toDF("src", "dst")
        val edges = anchors.select(col("src"), col("dst"))
          .unionByName(ring).unionByName(goodOut)
        val trust = LinkGraph.pageRankInt(edges, "src", "dst",
            iterations = 2, seeds = Some(goodSeeds))
          .withColumnRenamed("rank", "trust")
        val spamMass = LinkGraph.pageRankInt(edges, "src", "dst",
            iterations = 2, seeds = Some(spamSeeds))
          .withColumnRenamed("rank", "spam_mass")
        trust.join(spamMass, Seq("node"))
          .withColumn("trustrank", col("trust") - col("spam_mass"))
          .orderBy(col("node"))
      },
      Some("""WITH a AS (
             |  SELECT 'h' || CAST(doc_id % 23 AS VARCHAR) || '.example' AS src,
             |         's' || CAST(doc_id % 3 AS VARCHAR) || '.example' AS dst,
             |         'cheap pills now' AS anchor
             |  FROM documents
             |  UNION ALL
             |  SELECT 'h' || CAST(doc_id % 23 AS VARCHAR) || '.example',
             |         'g' || CAST(doc_id % 7 AS VARCHAR) || '.example',
             |         'page ' || CAST(doc_id AS VARCHAR)
             |  FROM documents),
             |prof AS (SELECT dst, count(*) AS n_links,
             |                count(DISTINCT anchor) AS n_texts
             |         FROM a GROUP BY dst),
             |spam_seeds AS (SELECT dst FROM prof
             |               WHERE n_texts = 1 AND n_links > 10),
             |good_seeds AS (SELECT dst FROM prof WHERE n_texts > 10),
             |e AS (SELECT DISTINCT src, dst FROM (
             |        SELECT src, dst FROM a
             |        UNION ALL
             |        SELECT * FROM (VALUES ('s0.example', 's1.example'),
             |          ('s1.example', 's2.example'),
             |          ('s2.example', 's0.example')) AS r(src, dst)
             |        UNION ALL
             |        SELECT 'g' || CAST(k AS VARCHAR) || '.example',
             |               'h' || CAST(k AS VARCHAR) || '.example'
             |        FROM range(7) t(k))),
             |o AS (SELECT src, count(*) AS outd FROM e GROUP BY src),
             |n AS (SELECT DISTINCT src AS node FROM e
             |      UNION SELECT DISTINCT dst FROM e),
             |gb AS (SELECT node,
             |              CASE WHEN node IN (SELECT dst FROM good_seeds)
             |                   THEN 150000000000 ELSE 0 END AS base
             |       FROM n),
             |sb AS (SELECT node,
             |              CASE WHEN node IN (SELECT dst FROM spam_seeds)
             |                   THEN 150000000000 ELSE 0 END AS base
             |       FROM n),
             |r0 AS (SELECT node, CAST(1000000000000 AS HUGEINT) AS pr FROM n),
             |gs1 AS (SELECT e.dst AS node, sum(r0.pr // o.outd) AS s
             |        FROM e JOIN o USING (src) JOIN r0 ON r0.node = e.src
             |        GROUP BY e.dst),
             |gr1 AS (SELECT gb.node,
             |               gb.base + (85 * coalesce(gs1.s, 0)) // 100 AS pr
             |        FROM gb LEFT JOIN gs1 USING (node)),
             |gs2 AS (SELECT e.dst AS node, sum(gr1.pr // o.outd) AS s
             |        FROM e JOIN o USING (src) JOIN gr1 ON gr1.node = e.src
             |        GROUP BY e.dst),
             |gr2 AS (SELECT gb.node,
             |               gb.base + (85 * coalesce(gs2.s, 0)) // 100 AS pr
             |        FROM gb LEFT JOIN gs2 USING (node)),
             |ss1 AS (SELECT e.dst AS node, sum(r0.pr // o.outd) AS s
             |        FROM e JOIN o USING (src) JOIN r0 ON r0.node = e.src
             |        GROUP BY e.dst),
             |sr1 AS (SELECT sb.node,
             |               sb.base + (85 * coalesce(ss1.s, 0)) // 100 AS pr
             |        FROM sb LEFT JOIN ss1 USING (node)),
             |ss2 AS (SELECT e.dst AS node, sum(sr1.pr // o.outd) AS s
             |        FROM e JOIN o USING (src) JOIN sr1 ON sr1.node = e.src
             |        GROUP BY e.dst),
             |sr2 AS (SELECT sb.node,
             |               sb.base + (85 * coalesce(ss2.s, 0)) // 100 AS pr
             |        FROM sb LEFT JOIN ss2 USING (node))
             |SELECT n.node, CAST(gr2.pr AS BIGINT) AS trust,
             |       CAST(sr2.pr AS BIGINT) AS spam_mass,
             |       CAST(gr2.pr AS BIGINT) - CAST(sr2.pr AS BIGINT)
             |         AS trustrank
             |FROM n JOIN gr2 USING (node) JOIN sr2 USING (node)
             |ORDER BY n.node""".stripMargin),
      doc = "automatic TrustRank seeding: template-stamped anchor profiles (n_texts = 1) propose spam seeds, diverse profiles propose good seeds, farm-ring graph, both seeded PR runs + the whole seed-derivation chain replayed in the oracle"),

    // The PUBLISH-GRADE host-scores relation — the artifact a crawl
    // ships (Common Crawl's host ranks): one row per host carrying
    // EVERY link prior as a column — PageRank, HITS hub/authority,
    // SALSA hub/authority, TrustRank (good-seeded minus spam-seeded
    // PR). One call (LinkGraph.hostScores), five integer-exact loops
    // over one distinct edge relation; the oracle composes all five
    // already-pinned iteration replays and joins them on node.
    Q("doc_host_scores",
      (s, dir) => {
        import graft.operators.LinkGraph
        import s.implicits._
        def host(e: org.apache.spark.sql.Column) =
          concat(lit("h"), pmod(e, lit(23)).cast("string"), lit(".example"))
        val docs = Tables.documents(s, dir)
        val edges = docs.select(host(col("doc_id")).as("src"),
            host(col("doc_id") * 7 + 1).as("dst"))
          .unionByName(docs.select(host(col("doc_id")).as("src"),
            host(col("doc_id") * 13 + 5).as("dst")))
        val good = Seq("h0.example", "h5.example", "h10.example").toDF("node")
        val spam = Seq("h3.example", "h7.example").toDF("node")
        LinkGraph.hostScores(edges, "src", "dst", iterations = 2,
            goodSeeds = Some(good), spamSeeds = Some(spam))
          .orderBy(col("node"))
      },
      Some("""WITH e AS (
             |  SELECT DISTINCT
             |         'h' || CAST(doc_id % 23 AS VARCHAR) || '.example' AS src,
             |         'h' || CAST((7*doc_id+1) % 23 AS VARCHAR) || '.example' AS dst
             |  FROM documents
             |  UNION
             |  SELECT DISTINCT
             |         'h' || CAST(doc_id % 23 AS VARCHAR) || '.example',
             |         'h' || CAST((13*doc_id+5) % 23 AS VARCHAR) || '.example'
             |  FROM documents),
             |o AS (SELECT src, count(*) AS outd FROM e GROUP BY src),
             |i AS (SELECT dst, count(*) AS ind FROM e GROUP BY dst),
             |n AS (SELECT DISTINCT src AS node FROM e
             |      UNION SELECT DISTINCT dst FROM e),
             |r0 AS (SELECT node, CAST(1000000000000 AS HUGEINT) AS pr FROM n),
             |ps1 AS (SELECT e.dst AS node, sum(r0.pr // o.outd) AS s
             |        FROM e JOIN o USING (src) JOIN r0 ON r0.node = e.src
             |        GROUP BY e.dst),
             |pr1 AS (SELECT n.node,
             |               150000000000 + (85 * coalesce(ps1.s, 0)) // 100 AS pr
             |        FROM n LEFT JOIN ps1 USING (node)),
             |ps2 AS (SELECT e.dst AS node, sum(pr1.pr // o.outd) AS s
             |        FROM e JOIN o USING (src) JOIN pr1 ON pr1.node = e.src
             |        GROUP BY e.dst),
             |pr2 AS (SELECT n.node,
             |               150000000000 + (85 * coalesce(ps2.s, 0)) // 100 AS pr
             |        FROM n LEFT JOIN ps2 USING (node)),
             |a1r AS (SELECT e.dst AS node, sum(r0.pr) AS raw
             |        FROM e JOIN r0 ON r0.node = e.src GROUP BY e.dst),
             |a1m AS (SELECT max(raw) AS m FROM a1r),
             |a1 AS (SELECT n.node, coalesce(a1r.raw, 0)
             |              // ((a1m.m + 1000000000000 - 1) // 1000000000000)
             |              AS auth
             |       FROM n LEFT JOIN a1r USING (node) CROSS JOIN a1m),
             |h1r AS (SELECT e.src AS node, sum(a1.auth) AS raw
             |        FROM e JOIN a1 ON a1.node = e.dst GROUP BY e.src),
             |h1m AS (SELECT max(raw) AS m FROM h1r),
             |h1 AS (SELECT n.node, coalesce(h1r.raw, 0)
             |              // ((h1m.m + 1000000000000 - 1) // 1000000000000)
             |              AS hub
             |       FROM n LEFT JOIN h1r USING (node) CROSS JOIN h1m),
             |a2r AS (SELECT e.dst AS node, sum(h1.hub) AS raw
             |        FROM e JOIN h1 ON h1.node = e.src GROUP BY e.dst),
             |a2m AS (SELECT max(raw) AS m FROM a2r),
             |a2 AS (SELECT n.node, coalesce(a2r.raw, 0)
             |              // ((a2m.m + 1000000000000 - 1) // 1000000000000)
             |              AS auth
             |       FROM n LEFT JOIN a2r USING (node) CROSS JOIN a2m),
             |h2r AS (SELECT e.src AS node, sum(a2.auth) AS raw
             |        FROM e JOIN a2 ON a2.node = e.dst GROUP BY e.src),
             |h2m AS (SELECT max(raw) AS m FROM h2r),
             |h2 AS (SELECT n.node, coalesce(h2r.raw, 0)
             |              // ((h2m.m + 1000000000000 - 1) // 1000000000000)
             |              AS hub
             |       FROM n LEFT JOIN h2r USING (node) CROSS JOIN h2m),
             |sa1r AS (SELECT e.dst AS node, sum(r0.pr // o.outd) AS s
             |         FROM e JOIN o USING (src) JOIN r0 ON r0.node = e.src
             |         GROUP BY e.dst),
             |sa1 AS (SELECT n.node, coalesce(sa1r.s, 0) AS auth
             |        FROM n LEFT JOIN sa1r USING (node)),
             |sh1r AS (SELECT e.src AS node, sum(sa1.auth // i.ind) AS s
             |         FROM e JOIN i USING (dst) JOIN sa1 ON sa1.node = e.dst
             |         GROUP BY e.src),
             |sh1 AS (SELECT n.node, coalesce(sh1r.s, 0) AS hub
             |        FROM n LEFT JOIN sh1r USING (node)),
             |sa2r AS (SELECT e.dst AS node, sum(sh1.hub // o.outd) AS s
             |         FROM e JOIN o USING (src) JOIN sh1 ON sh1.node = e.src
             |         GROUP BY e.dst),
             |sa2 AS (SELECT n.node, coalesce(sa2r.s, 0) AS auth
             |        FROM n LEFT JOIN sa2r USING (node)),
             |sh2r AS (SELECT e.src AS node, sum(sa2.auth // i.ind) AS s
             |         FROM e JOIN i USING (dst) JOIN sa2 ON sa2.node = e.dst
             |         GROUP BY e.src),
             |sh2 AS (SELECT n.node, coalesce(sh2r.s, 0) AS hub
             |        FROM n LEFT JOIN sh2r USING (node)),
             |gb AS (SELECT node,
             |              CASE WHEN node IN ('h0.example', 'h5.example',
             |                                 'h10.example')
             |                   THEN 150000000000 ELSE 0 END AS base
             |       FROM n),
             |sb AS (SELECT node,
             |              CASE WHEN node IN ('h3.example', 'h7.example')
             |                   THEN 150000000000 ELSE 0 END AS base
             |       FROM n),
             |gs1 AS (SELECT e.dst AS node, sum(r0.pr // o.outd) AS s
             |        FROM e JOIN o USING (src) JOIN r0 ON r0.node = e.src
             |        GROUP BY e.dst),
             |gr1 AS (SELECT gb.node,
             |               gb.base + (85 * coalesce(gs1.s, 0)) // 100 AS pr
             |        FROM gb LEFT JOIN gs1 USING (node)),
             |gs2 AS (SELECT e.dst AS node, sum(gr1.pr // o.outd) AS s
             |        FROM e JOIN o USING (src) JOIN gr1 ON gr1.node = e.src
             |        GROUP BY e.dst),
             |gr2 AS (SELECT gb.node,
             |               gb.base + (85 * coalesce(gs2.s, 0)) // 100 AS pr
             |        FROM gb LEFT JOIN gs2 USING (node)),
             |ss1 AS (SELECT e.dst AS node, sum(r0.pr // o.outd) AS s
             |        FROM e JOIN o USING (src) JOIN r0 ON r0.node = e.src
             |        GROUP BY e.dst),
             |sr1 AS (SELECT sb.node,
             |               sb.base + (85 * coalesce(ss1.s, 0)) // 100 AS pr
             |        FROM sb LEFT JOIN ss1 USING (node)),
             |ss2 AS (SELECT e.dst AS node, sum(sr1.pr // o.outd) AS s
             |        FROM e JOIN o USING (src) JOIN sr1 ON sr1.node = e.src
             |        GROUP BY e.dst),
             |sr2 AS (SELECT sb.node,
             |               sb.base + (85 * coalesce(ss2.s, 0)) // 100 AS pr
             |        FROM sb LEFT JOIN ss2 USING (node))
             |SELECT n.node, CAST(pr2.pr AS BIGINT) AS pr,
             |       CAST(h2.hub AS BIGINT) AS hub,
             |       CAST(a2.auth AS BIGINT) AS auth,
             |       CAST(sh2.hub AS BIGINT) AS salsa_hub,
             |       CAST(sa2.auth AS BIGINT) AS salsa_auth,
             |       CAST(gr2.pr AS BIGINT) AS trust,
             |       CAST(sr2.pr AS BIGINT) AS spam_mass,
             |       CAST(gr2.pr AS BIGINT) - CAST(sr2.pr AS BIGINT)
             |         AS trustrank
             |FROM n JOIN pr2 USING (node) JOIN h2 USING (node)
             |       JOIN a2 USING (node) JOIN sh2 USING (node)
             |       JOIN sa2 USING (node) JOIN gr2 USING (node)
             |       JOIN sr2 USING (node)
             |ORDER BY n.node""".stripMargin),
      doc = "publish-grade host scores: one row per host with PageRank, HITS hub/auth, SALSA hub/auth, and TrustRank columns — five integer-exact loops over one edge relation, all five iteration replays composed in the oracle"),

    // Anchor-text profile per target host — what the web SAYS about a
    // host (the classic relevance/quality signal; search engines have
    // indexed anchor text since PageRank's own paper). The (href,
    // visible text) pairs come out of the single-pass parse; the
    // aggregation is host-keyed and partial-aggregated. One anchor
    // text is shared per target (a site-wide nav label), one is
    // per-document unique — n_texts separates them.
    Q("doc_anchor_text",
      (s, dir) => {
        def host(e: org.apache.spark.sql.Column) =
          concat(lit("h"), pmod(e, lit(23)).cast("string"), lit(".example"))
        val html = concat(
          lit("<p>See <a href=\"http://"), host(col("doc_id") * 7 + 1),
          lit("/x\">site "), pmod(col("doc_id") * 7 + 1, lit(23)),
          lit("</a> and <a href='http://"), host(col("doc_id") * 13 + 5),
          lit("/y'>link "), col("doc_id"), lit("</a></p>"))
        Tables.documents(s, dir)
          .select(explode(TextFunctions.htmlAnchors(html)).as("a"))
          .select(
            regexp_extract(col("a.href"), "^https?://([a-z0-9.-]+)", 1)
              .as("dst_host"),
            col("a.anchor").as("anchor"))
          .groupBy(col("dst_host"))
          .agg(count(lit(1)).as("n_links"),
            countDistinct(col("anchor")).as("n_texts"))
          .orderBy(col("dst_host"))
      },
      Some("""WITH l AS (
             |  SELECT 'h' || CAST((7*doc_id+1) % 23 AS VARCHAR)
             |           || '.example' AS dst_host,
             |         'site ' || CAST((7*doc_id+1) % 23 AS VARCHAR) AS anchor
             |  FROM documents
             |  UNION ALL
             |  SELECT 'h' || CAST((13*doc_id+5) % 23 AS VARCHAR)
             |           || '.example',
             |         'link ' || CAST(doc_id AS VARCHAR)
             |  FROM documents)
             |SELECT dst_host, count(*) AS n_links,
             |       count(DISTINCT anchor) AS n_texts
             |FROM l GROUP BY dst_host
             |ORDER BY dst_host""".stripMargin),
      doc = "anchor-text profile per target host: real (href, visible text) pairs from the parse, host-keyed partial aggregation"),

    // Anchor text as a RETRIEVAL field — the classic two-field web
    // ranking (body + what inlinks say about the page) as one BM25F
    // scorer. Each doc's anchor profile assembles from the planted
    // link structure (source docs describe their target with their own
    // leading words), the profile joins the page text as a second
    // field at weight 2, and the fielded scorer length-normalizes per
    // field BEFORE one shared saturation — so an anchor hit in a short
    // profile outranks the same term diluted in a long body. The
    // oracle replays the whole chain (profile assembly, per-field
    // stats, any-field df, the exact double expression tree) in SQL.
    Q("doc_anchor_bm25",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val anchors = docs.select(
          pmod(col("doc_id") * 7 + 1, lit(97)).as("tgt"),
          array_join(slice(split(col("text"), " "), 1, 3), " ").as("atext"))
        val profile = anchors.groupBy(col("tgt"))
          .agg(concat_ws(" ", array_sort(collect_list(col("atext"))))
            .as("anchor_text"))
        val fielded = docs.join(profile, docs("doc_id") === profile("tgt"),
            "left")
          .select(col("doc_id"), col("text"),
            coalesce(col("anchor_text"), lit("")).as("anchor_text"))
        TextAnalysis.bm25FieldedTopK(fielded, "doc_id",
          Seq(("text", 1.0), ("anchor_text", 2.0)),
          Seq("vector", "stream", "spark"), k = 15)
      },
      Some("""WITH anch AS (
             |  SELECT (7 * doc_id + 1) % 97 AS tgt,
             |         array_to_string(list_slice(string_split(text, ' '), 1, 3),
             |                         ' ') AS atext
             |  FROM documents),
             |prof AS (
             |  SELECT tgt, array_to_string(list_sort(list(atext)), ' ')
             |           AS anchor_text
             |  FROM anch GROUP BY tgt),
             |d AS (
             |  SELECT doc_id, text, coalesce(prof.anchor_text, '') AS anchor
             |  FROM documents LEFT JOIN prof ON documents.doc_id = prof.tgt),
             |toks AS (
             |  SELECT doc_id, 0 AS f, string_split(text, ' ') AS w FROM d
             |  UNION ALL
             |  SELECT doc_id, 1, string_split(anchor, ' ') FROM d),
             |dl AS (SELECT doc_id, f, len(w) AS dl FROM toks),
             |st AS (SELECT f, count(*) AS n, sum(dl) AS tot FROM dl GROUP BY f),
             |tf AS (SELECT doc_id, f, t, count(*) AS tf
             |       FROM (SELECT doc_id, f, unnest(w) AS t FROM toks)
             |       WHERE t IN ('vector', 'stream', 'spark')
             |       GROUP BY doc_id, f, t),
             |dfq AS (SELECT t, count(DISTINCT doc_id) AS df FROM tf GROUP BY t),
             |wtf AS (
             |  SELECT tf.doc_id, tf.f, tf.t,
             |         (CASE tf.f WHEN 0 THEN 1.0 ELSE 2.0 END) * tf.tf
             |           / ((1.0 - 0.75)
             |              + 0.75 * dl.dl / (CAST(st.tot AS DOUBLE) / st.n))
             |           AS wtf
             |  FROM tf JOIN dl USING (doc_id, f) JOIN st USING (f)),
             |x AS (SELECT doc_id, t,
             |             coalesce(max(CASE WHEN f = 0 THEN wtf END), 0.0)
             |             + coalesce(max(CASE WHEN f = 1 THEN wtf END), 0.0) AS x
             |      FROM wtf GROUP BY doc_id, t),
             |nd AS (SELECT n AS nd FROM st WHERE f = 0),
             |sc AS (SELECT x.doc_id,
             |              ln(1.0 + (nd.nd - dfq.df + 0.5) / (dfq.df + 0.5))
             |                * x.x * (1.2 + 1.0) / (1.2 + x.x) AS contrib
             |       FROM x JOIN dfq USING (t) CROSS JOIN nd)
             |SELECT doc_id, round(sum(contrib), 6) AS score
             |FROM sc GROUP BY doc_id
             |ORDER BY score DESC, doc_id
             |LIMIT 15""".stripMargin),
      doc = "anchor text as a retrieval field: BM25F two-field ranking (body weight 1, inlink anchor profile weight 2), per-field normalization, one shared saturation, any-field df"),

    // RRF vs BM25F HEAD-TO-HEAD — the fused hybrid-retrieval eval:
    // the same two fields (body text, inlink anchor profile) enter
    // both fusion strategies — (a) two independent per-field BM25
    // top-15 lists fused by reciprocal-rank fusion, (b) one fielded
    // BM25F score — and each strategy's top-10 is scored by overlap
    // against brute-force cosine ground truth for the same corpus
    // (vec_id ≡ doc_id), the recall-eval discipline of
    // sim_ivf_recall. Honest numbers: lexical retrieval on 3 planted
    // terms against dense-vector truth overlaps weakly by design —
    // the eval measures the STRATEGY GAP, not absolute quality.
    Q("doc_hybrid_fusion_eval",
      (s, dir) => {
        import graft.operators.Similarity
        val docs = Tables.documents(s, dir)
        val anchors = docs.select(
          pmod(col("doc_id") * 7 + 1, lit(97)).as("tgt"),
          array_join(slice(split(col("text"), " "), 1, 3), " ").as("atext"))
        val profile = anchors.groupBy(col("tgt"))
          .agg(concat_ws(" ", array_sort(collect_list(col("atext"))))
            .as("anchor_text"))
        val fielded = docs.join(profile, docs("doc_id") === profile("tgt"),
            "left")
          .select(col("doc_id"), col("text"),
            coalesce(col("anchor_text"), lit("")).as("anchor_text"))
        val terms = Seq("vector", "stream", "spark")
        val lexW = org.apache.spark.sql.expressions.Window
          .orderBy(col("score").desc, col("doc_id"))
        val bodyList = TextAnalysis.bm25TopK(fielded, "doc_id", "text",
            terms, k = 15)
          .withColumn("rank", row_number().over(lexW))
          .select(col("doc_id"), col("rank"))
        val anchorList = TextAnalysis.bm25TopK(fielded, "doc_id",
            "anchor_text", terms, k = 15)
          .withColumn("rank", row_number().over(lexW))
          .select(col("doc_id"), col("rank"))
        val rrfSet = Similarity.rrfFuse(Seq(bodyList, anchorList),
            "doc_id", "rank", k = 10)
          .select(col("doc_id"))
        val bmfSet = TextAnalysis.bm25FieldedTopK(fielded, "doc_id",
            Seq(("text", 1.0), ("anchor_text", 2.0)), terms, k = 10)
          .select(col("doc_id"))
        val emb = Tables.embeddings(s, dir)
        val truth = Similarity.bruteForceTopK(emb,
            emb.filter(col("vec_id") === 0), "vec_id", "embedding", k = 10)
          .select(col("neighbor_id").as("doc_id"))
        def scoreRow(set: org.apache.spark.sql.DataFrame,
            against: org.apache.spark.sql.DataFrame, name: String) =
          set.join(against, Seq("doc_id"))
            .agg(count(lit(1)).as("n_hits"))
            .select(lit(name).as("strategy"), col("n_hits"),
              round(col("n_hits") / lit(10.0), 6).as("overlap_at_10"))
        scoreRow(bmfSet, truth, "bm25f")
          .unionByName(scoreRow(rrfSet, truth, "rrf"))
          // the strategies' agreement with EACH OTHER — the non-vacuous
          // row when lexical-vs-dense truth overlap bottoms out at 0
          .unionByName(scoreRow(rrfSet, bmfSet, "rrf_vs_bm25f"))
          .orderBy(col("strategy"))
      },
      Some("""WITH anch AS (
             |  SELECT (7 * doc_id + 1) % 97 AS tgt,
             |         array_to_string(list_slice(string_split(text, ' '), 1, 3),
             |                         ' ') AS atext
             |  FROM documents),
             |prof AS (
             |  SELECT tgt, array_to_string(list_sort(list(atext)), ' ')
             |           AS anchor_text
             |  FROM anch GROUP BY tgt),
             |d AS (
             |  SELECT doc_id, text, coalesce(prof.anchor_text, '') AS anchor
             |  FROM documents LEFT JOIN prof ON documents.doc_id = prof.tgt),
             |tb AS (SELECT doc_id, string_split(text, ' ') AS w FROM d),
             |dlb AS (SELECT doc_id, len(w) AS dl FROM tb),
             |cb AS (SELECT count(*) AS n, sum(dl) AS tot FROM dlb),
             |tfb AS (SELECT doc_id, t, count(*) AS tf
             |        FROM (SELECT doc_id, unnest(w) AS t FROM tb)
             |        WHERE t IN ('vector', 'stream', 'spark')
             |        GROUP BY doc_id, t),
             |dfb AS (SELECT t, count(*) AS df FROM tfb GROUP BY t),
             |scb AS (
             |  SELECT tfb.doc_id,
             |         ln(1.0 + (cb.n - dfb.df + 0.5) / (dfb.df + 0.5))
             |           * tfb.tf * (1.2 + 1.0)
             |           / (tfb.tf + 1.2 * ((1.0 - 0.75)
             |              + 0.75 * dlb.dl / (CAST(cb.tot AS DOUBLE) / cb.n)))
             |           AS contrib
             |  FROM tfb JOIN dfb USING (t) JOIN dlb USING (doc_id) CROSS JOIN cb),
             |bmb AS (SELECT doc_id, round(sum(contrib), 6) AS score
             |        FROM scb GROUP BY doc_id
             |        ORDER BY score DESC, doc_id LIMIT 15),
             |lexb AS (SELECT doc_id,
             |                row_number() OVER (ORDER BY score DESC, doc_id) AS r
             |         FROM bmb),
             |ta AS (SELECT doc_id, string_split(anchor, ' ') AS w FROM d),
             |dla AS (SELECT doc_id, len(w) AS dl FROM ta),
             |ca AS (SELECT count(*) AS n, sum(dl) AS tot FROM dla),
             |tfa AS (SELECT doc_id, t, count(*) AS tf
             |        FROM (SELECT doc_id, unnest(w) AS t FROM ta)
             |        WHERE t IN ('vector', 'stream', 'spark')
             |        GROUP BY doc_id, t),
             |dfa AS (SELECT t, count(*) AS df FROM tfa GROUP BY t),
             |sca AS (
             |  SELECT tfa.doc_id,
             |         ln(1.0 + (ca.n - dfa.df + 0.5) / (dfa.df + 0.5))
             |           * tfa.tf * (1.2 + 1.0)
             |           / (tfa.tf + 1.2 * ((1.0 - 0.75)
             |              + 0.75 * dla.dl / (CAST(ca.tot AS DOUBLE) / ca.n)))
             |           AS contrib
             |  FROM tfa JOIN dfa USING (t) JOIN dla USING (doc_id) CROSS JOIN ca),
             |bma AS (SELECT doc_id, round(sum(contrib), 6) AS score
             |        FROM sca GROUP BY doc_id
             |        ORDER BY score DESC, doc_id LIMIT 15),
             |lexa AS (SELECT doc_id,
             |                row_number() OVER (ORDER BY score DESC, doc_id) AS r
             |         FROM bma),
             |u AS (SELECT doc_id, r FROM lexb UNION ALL
             |      SELECT doc_id, r FROM lexa),
             |rrfs AS (SELECT doc_id, round(sum(1.0 / (60 + r)), 6) AS rrf
             |         FROM u GROUP BY doc_id
             |         ORDER BY rrf DESC, doc_id LIMIT 10),
             |toks AS (
             |  SELECT doc_id, 0 AS f, string_split(text, ' ') AS w FROM d
             |  UNION ALL
             |  SELECT doc_id, 1, string_split(anchor, ' ') FROM d),
             |dl2 AS (SELECT doc_id, f, len(w) AS dl FROM toks),
             |st AS (SELECT f, count(*) AS n, sum(dl) AS tot FROM dl2 GROUP BY f),
             |tf2 AS (SELECT doc_id, f, t, count(*) AS tf
             |        FROM (SELECT doc_id, f, unnest(w) AS t FROM toks)
             |        WHERE t IN ('vector', 'stream', 'spark')
             |        GROUP BY doc_id, f, t),
             |dfq AS (SELECT t, count(DISTINCT doc_id) AS df FROM tf2 GROUP BY t),
             |wtf AS (
             |  SELECT tf2.doc_id, tf2.f, tf2.t,
             |         (CASE tf2.f WHEN 0 THEN 1.0 ELSE 2.0 END) * tf2.tf
             |           / ((1.0 - 0.75)
             |              + 0.75 * dl2.dl / (CAST(st.tot AS DOUBLE) / st.n))
             |           AS wtf
             |  FROM tf2 JOIN dl2 USING (doc_id, f) JOIN st USING (f)),
             |x AS (SELECT doc_id, t,
             |             coalesce(max(CASE WHEN f = 0 THEN wtf END), 0.0)
             |             + coalesce(max(CASE WHEN f = 1 THEN wtf END), 0.0) AS x
             |      FROM wtf GROUP BY doc_id, t),
             |nd AS (SELECT n AS nd FROM st WHERE f = 0),
             |sc AS (SELECT x.doc_id,
             |              ln(1.0 + (nd.nd - dfq.df + 0.5) / (dfq.df + 0.5))
             |                * x.x * (1.2 + 1.0) / (1.2 + x.x) AS contrib
             |       FROM x JOIN dfq USING (t) CROSS JOIN nd),
             |bmf AS (SELECT doc_id, round(sum(contrib), 6) AS score
             |        FROM sc GROUP BY doc_id
             |        ORDER BY score DESC, doc_id LIMIT 10),
             |e AS (SELECT vec_id,
             |             list_transform(embedding, x -> CAST(x AS DOUBLE)) v
             |      FROM embeddings),
             |scored AS (
             |  SELECT c.vec_id AS doc_id,
             |         (list_inner_product(q.v, c.v)
             |           / (sqrt(list_inner_product(q.v, q.v))
             |              * sqrt(list_inner_product(c.v, c.v)))) AS cs
             |  FROM e q JOIN e c ON c.vec_id != q.vec_id
             |  WHERE q.vec_id = 0),
             |truth AS (SELECT doc_id FROM (
             |            SELECT doc_id,
             |                   row_number() OVER (ORDER BY cs DESC, doc_id) AS r
             |            FROM scored) WHERE r <= 10)
             |SELECT * FROM (
             |  SELECT 'bm25f' AS strategy, count(*) AS n_hits,
             |         round(count(*) / 10.0, 6) AS overlap_at_10
             |  FROM bmf JOIN truth USING (doc_id)
             |  UNION ALL
             |  SELECT 'rrf', count(*),
             |         round(count(*) / 10.0, 6)
             |  FROM rrfs JOIN truth USING (doc_id)
             |  UNION ALL
             |  SELECT 'rrf_vs_bm25f', count(*),
             |         round(count(*) / 10.0, 6)
             |  FROM rrfs JOIN bmf USING (doc_id))
             |ORDER BY strategy""".stripMargin),
      doc = "RRF vs BM25F head-to-head: both fusion strategies over the same two fields scored by top-10 overlap against brute-force cosine truth plus strategy-vs-strategy agreement, fully replayed oracle"),

    // robots.txt compliance filtering: four hosts publish REAL robots
    // bodies (agent-specific group with Allow-override, '*' group with
    // an empty Disallow + comment, blanket Disallow, and a group for a
    // DIFFERENT agent only), a fifth publishes none. The relational
    // parse (gaps-and-islands group ids -> agent resolution -> rule
    // rows) runs on the Spark side; the oracle pins the END-TO-END
    // verdicts from the intended rule table — longest-prefix
    // precedence, Allow ties, fallthrough-to-allowed — per URL.
    // (Parse-level goldens live in RobotsSpec.)
    Q("doc_robots_filter",
      (s, dir) => {
        import graft.operators.Robots
        import s.implicits._
        val robots = Seq(
          ("h0.ex", "User-agent: graftbot\nDisallow: /private\n" +
            "Allow: /private/ok\n\nUser-agent: *\nDisallow: /"),
          ("h1.ex", "User-agent: *\nDisallow: /tmp\nDisallow:\n# note"),
          ("h2.ex", "User-agent: *\nDisallow: /"),
          ("h3.ex", "User-agent: other\nDisallow: /")
        ).toDF("host", "text")
        val rules = Robots.parseRules(robots, "host", "text", "graftbot")
        val urls = Tables.documents(s, dir).select(col("doc_id"),
          concat(lit("http://h"), pmod(col("doc_id"), lit(5)), lit(".ex"),
            element_at(array(lit("/private/ok/"), lit("/private/"),
              lit("/tmp/"), lit("/page/")),
              (pmod(col("doc_id"), lit(4)) + 1).cast("int")),
            col("doc_id")).as("url"))
        Robots.verdicts(urls, "url", rules)
          .select(col("doc_id"), col("url"), col("allowed"))
          .orderByOnce(col("doc_id"))
      },
      Some("""WITH u AS (
             |  SELECT doc_id,
             |         'h' || CAST(doc_id % 5 AS VARCHAR) || '.ex' AS host,
             |         CASE doc_id % 4 WHEN 0 THEN '/private/ok/'
             |              WHEN 1 THEN '/private/' WHEN 2 THEN '/tmp/'
             |              ELSE '/page/' END || CAST(doc_id AS VARCHAR) AS path
             |  FROM documents),
             |r AS (SELECT * FROM (VALUES
             |        ('h0.ex', '/private', false),
             |        ('h0.ex', '/private/ok', true),
             |        ('h1.ex', '/tmp', false),
             |        ('h2.ex', '/', false)) AS t(host, prefix, allow)),
             |v AS (SELECT u.doc_id, r.allow,
             |             row_number() OVER (PARTITION BY u.doc_id
             |               ORDER BY length(r.prefix) DESC, r.allow DESC) AS rn
             |      FROM u JOIN r ON r.host = u.host
             |      WHERE starts_with(u.path, r.prefix))
             |SELECT u.doc_id,
             |       'http://' || u.host || u.path AS url,
             |       coalesce(v.allow, true) AS allowed
             |FROM u LEFT JOIN (SELECT doc_id, allow FROM v WHERE rn = 1) v
             |       USING (doc_id)
             |ORDER BY u.doc_id""".stripMargin),
      doc = "robots.txt compliance filter: relational group parse + broadcast longest-prefix verdicts (Allow ties, fallthrough-allowed), end-to-end verdict oracle"),

    // RFC 9309 WILDCARD matching ('*' spans any chars, trailing '$'
    // anchors the path end) — the rule grammar real robots files use
    // ("Disallow: /*.pdf$"). The Spark side parses the planted bodies,
    // compiles patterns to anchored regexes IN-PLAN
    // (Robots.compileWildcardRules), and resolves precedence on the
    // ORIGINAL pattern's octet count; the oracle pins the compiled
    // rule table (the translation itself is golden-pinned in
    // RobotsSpec) and replays the end-to-end verdicts with RE2. The
    // URL corpus plants every interesting shape: both-rules-match
    // (longer Allow wins), anchor hit vs near-miss ('.pdf' vs
    // '.pdfz'), mid-pattern '*' spanning slashes, a blanket
    // wildcard-free Disallow, and a host with no robots at all.
    Q("doc_robots_wildcard",
      (s, dir) => {
        import graft.operators.Robots
        import s.implicits._
        val robots = Seq(
          ("h0.wx", "User-agent: *\nDisallow: /*.pdf$\nAllow: /files/ok*"),
          ("h1.wx", "User-agent: *\nDisallow: /files/*/tmp"),
          ("h2.wx", "User-agent: *\nDisallow: /")
        ).toDF("host", "text")
        val rules = Robots.parseRules(robots, "host", "text", "graftbot")
        val urls = Tables.documents(s, dir).select(col("doc_id"),
          concat(lit("http://h"), pmod(col("doc_id"), lit(4)), lit(".wx"),
            element_at(array(
              concat(lit("/files/ok"), col("doc_id"), lit(".pdf")),
              concat(lit("/files/no"), col("doc_id"), lit(".pdf")),
              concat(lit("/files/a/tmp/"), col("doc_id")),
              concat(lit("/d/"), col("doc_id"), lit(".pdfz")),
              concat(lit("/page/"), col("doc_id"))),
              (pmod(col("doc_id"), lit(5)) + 1).cast("int"))).as("url"))
        Robots.verdictsWildcard(urls, "url", rules)
          .select(col("doc_id"), col("url"), col("allowed"))
          .orderByOnce(col("doc_id"))
      },
      Some("""WITH u AS (
             |  SELECT doc_id,
             |         'h' || CAST(doc_id % 4 AS VARCHAR) || '.wx' AS host,
             |         CASE doc_id % 5
             |              WHEN 0 THEN '/files/ok' || CAST(doc_id AS VARCHAR) || '.pdf'
             |              WHEN 1 THEN '/files/no' || CAST(doc_id AS VARCHAR) || '.pdf'
             |              WHEN 2 THEN '/files/a/tmp/' || CAST(doc_id AS VARCHAR)
             |              WHEN 3 THEN '/d/' || CAST(doc_id AS VARCHAR) || '.pdfz'
             |              ELSE '/page/' || CAST(doc_id AS VARCHAR) END AS path
             |  FROM documents),
             |r AS (SELECT * FROM (VALUES
             |        ('h0.wx', '^/.*\.pdf$', 7, false),
             |        ('h0.wx', '^/files/ok.*', 10, true),
             |        ('h1.wx', '^/files/.*/tmp', 12, false),
             |        ('h2.wx', '^/', 1, false)) AS t(host, re, plen, allow)),
             |v AS (SELECT u.doc_id, r.allow,
             |             row_number() OVER (PARTITION BY u.doc_id
             |               ORDER BY r.plen DESC, r.allow DESC) AS rn
             |      FROM u JOIN r ON r.host = u.host
             |      WHERE regexp_matches(u.path, r.re))
             |SELECT u.doc_id,
             |       'http://' || u.host || u.path AS url,
             |       coalesce(v.allow, true) AS allowed
             |FROM u LEFT JOIN (SELECT doc_id, allow FROM v WHERE rn = 1) v
             |       USING (doc_id)
             |ORDER BY u.doc_id""".stripMargin),
      doc = "RFC 9309 wildcard robots matching: in-plan pattern->regex compile, octet-count precedence, end-to-end verdict oracle over planted wildcard policies"),

    // Per-host crawl-rate accounting (the politeness audit): fetch
    // timestamps plant as a closed form of doc_id, so both engines
    // reproduce per-host fetch counts, span, smallest inter-fetch gap,
    // telescoped mean gap, and the busiest-minute ceiling. The Spark
    // side computes the adjacent-gap min HIERARCHICALLY (sort within
    // (host, minute), then a per-host pass over bucket summaries) —
    // the whale-host-safe shape — while the oracle uses the naive
    // full-history window, so the decomposition's exactness is what
    // the hash compare checks.
    Q("doc_host_politeness",
      (s, dir) => {
        import graft.operators.CrawlPipeline
        val recs = Tables.documents(s, dir).select(
          concat(lit("http://h"), pmod(col("doc_id"), lit(7)),
            lit(".cr/p/"), col("doc_id")).as("target_uri"),
          date_format(
            expr("timestamp'2026-02-01 00:00:00' + " +
              "make_dt_interval(0, 0, 0, (doc_id * 37) % 9999)"),
            "yyyy-MM-dd'T'HH:mm:ss'Z'").as("warc_date"))
        CrawlPipeline.hostFetchStats(recs).orderBy(col("host"))
      },
      Some("""WITH f AS (
             |  SELECT 'h' || CAST(doc_id % 7 AS VARCHAR) || '.cr' AS host,
             |         CAST(epoch(TIMESTAMP '2026-02-01 00:00:00'
             |              + to_seconds(CAST(doc_id * 37 % 9999 AS BIGINT)))
             |              AS BIGINT) AS t
             |  FROM documents),
             |g AS (SELECT host, t,
             |             t - lag(t) OVER (PARTITION BY host ORDER BY t) AS gap
             |      FROM f),
             |m AS (SELECT host, t // 60 AS b, count(*) AS nb
             |      FROM f GROUP BY host, t // 60),
             |mb AS (SELECT host, max(nb) AS max_per_minute FROM m GROUP BY host),
             |a AS (SELECT host, count(*) AS n_fetches, min(t) AS first_s,
             |             max(t) AS last_s, min(gap) AS min_gap_s
             |      FROM g GROUP BY host)
             |SELECT a.host, a.n_fetches, a.first_s, a.last_s, a.min_gap_s,
             |       CASE WHEN a.n_fetches > 1 THEN
             |         round(CAST(a.last_s - a.first_s AS DOUBLE)
             |               / (a.n_fetches - 1), 6)
             |       END AS mean_gap_s,
             |       mb.max_per_minute
             |FROM a JOIN mb USING (host)
             |ORDER BY host""".stripMargin),
      doc = "per-host crawl-rate/politeness audit: fetch count, span, min/mean inter-fetch gap (hierarchical whale-safe min), busiest-minute ceiling"),

    // The live politeness monitor's relation — per-(host, minute)
    // fetch counts (CrawlPipeline.fetchRateByMinute; identical
    // expression streams with a watermark, spec-pinned twin) — over
    // the same planted fetch log as doc_host_politeness. Epoch-aligned
    // tumbling windows == date_trunc, which is what the oracle pins.
    Q("doc_fetch_rate",
      (s, dir) => {
        import graft.operators.CrawlPipeline
        val recs = Tables.documents(s, dir).select(
          concat(lit("http://h"), pmod(col("doc_id"), lit(7)),
            lit(".cr/p/"), col("doc_id")).as("target_uri"),
          date_format(
            expr("timestamp'2026-02-01 00:00:00' + " +
              "make_dt_interval(0, 0, 0, (doc_id * 37) % 9999)"),
            "yyyy-MM-dd'T'HH:mm:ss'Z'").as("warc_date"))
        CrawlPipeline.fetchRateByMinute(recs)
          .select(col("host"),
            date_format(col("minute_start"), "yyyy-MM-dd HH:mm:ss")
              .as("minute"),
            col("n_fetches"))
          .orderBy(col("host"), col("minute"))
      },
      Some("""WITH f AS (
             |  SELECT 'h' || CAST(doc_id % 7 AS VARCHAR) || '.cr' AS host,
             |         TIMESTAMP '2026-02-01 00:00:00'
             |           + to_seconds(CAST(doc_id * 37 % 9999 AS BIGINT)) AS ts
             |  FROM documents)
             |SELECT host,
             |       strftime(date_trunc('minute', ts),
             |                '%Y-%m-%d %H:%M:%S') AS minute,
             |       count(*) AS n_fetches
             |FROM f GROUP BY host, date_trunc('minute', ts)
             |ORDER BY host, minute""".stripMargin),
      doc = "per-(host, minute) fetch-rate relation (the streaming politeness monitor's batch twin): epoch-aligned tumbling windows, partial-aggregated keyed count"),

    // Declared-vs-measured politeness: hosts publish Crawl-delay (the
    // de-facto directive most non-Google crawlers honor; exact-agent
    // resolution, non-numeric values drop, repeats take the max —
    // parse goldens in RobotsSpec), the fetch log yields the measured
    // min inter-fetch gap, and the join grades compliance per host.
    // Hosts declaring nothing — or fetched once — are compliant by
    // definition (nulls coalesce true). The oracle pins the parsed
    // delay table and recomputes the gaps with the naive window.
    Q("doc_crawl_delay_compliance",
      (s, dir) => {
        import graft.operators.{CrawlPipeline, Robots}
        import s.implicits._
        val robots = Seq(
          ("h0.cr", "User-agent: *\nCrawl-delay: 10\nDisallow: /x"),
          ("h1.cr", "User-agent: graftbot\nCrawl-delay: 2\n\n" +
            "User-agent: *\nCrawl-delay: 60"),
          ("h2.cr", "User-agent: *\nDisallow: /tmp"),
          ("h3.cr", "User-agent: *\nCrawl-delay: abc\nCrawl-delay: 5\n" +
            "Crawl-delay: 7")
        ).toDF("host", "text")
        val delays = Robots.parseCrawlDelay(robots, "host", "text", "graftbot")
        val recs = Tables.documents(s, dir).select(
          concat(lit("http://h"), pmod(col("doc_id"), lit(7)),
            lit(".cr/p/"), col("doc_id")).as("target_uri"),
          date_format(
            expr("timestamp'2026-02-01 00:00:00' + " +
              "make_dt_interval(0, 0, 0, (doc_id * 37) % 9999)"),
            "yyyy-MM-dd'T'HH:mm:ss'Z'").as("warc_date"))
        CrawlPipeline.hostFetchStats(recs)
          .join(delays, Seq("host"), "left")
          .select(col("host"), col("delay_s"), col("min_gap_s"),
            coalesce(col("min_gap_s") >= col("delay_s"), lit(true))
              .as("compliant"))
          .orderBy(col("host"))
      },
      Some("""WITH f AS (
             |  SELECT 'h' || CAST(doc_id % 7 AS VARCHAR) || '.cr' AS host,
             |         CAST(epoch(TIMESTAMP '2026-02-01 00:00:00'
             |              + to_seconds(CAST(doc_id * 37 % 9999 AS BIGINT)))
             |              AS BIGINT) AS t
             |  FROM documents),
             |g AS (SELECT host,
             |             t - lag(t) OVER (PARTITION BY host ORDER BY t) AS gap
             |      FROM f),
             |a AS (SELECT host, min(gap) AS min_gap_s FROM g GROUP BY host),
             |d AS (SELECT * FROM (VALUES
             |        ('h0.cr', CAST(10 AS BIGINT)),
             |        ('h1.cr', CAST(2 AS BIGINT)),
             |        ('h3.cr', CAST(7 AS BIGINT))) AS t(host, delay_s))
             |SELECT a.host, d.delay_s, a.min_gap_s,
             |       coalesce(a.min_gap_s >= d.delay_s, true) AS compliant
             |FROM a LEFT JOIN d USING (host)
             |ORDER BY a.host""".stripMargin),
      doc = "Crawl-delay compliance audit: parsed declared delays (exact-agent, max-of-repeats) vs measured min inter-fetch gap, nulls compliant by definition"),

    // The live rate limiter's relation: per-(host, minute) fetch
    // counts vs the declared Crawl-delay cap — a minute violates when
    // it holds more fetches than ANY delay-compliant schedule could
    // place in an aligned 60 s window (exactly ceil(60/delay)).
    // Streams stateless after the windowed count (stream ≡ batch
    // spec-pinned); here the batch audit runs over a deliberately
    // dense fetch log (~7/min/host) so the h0 cap of 6 actually
    // trips. The oracle pins the parsed delay table (parse goldens in
    // RobotsSpec) and replays counts, caps, and verdicts.
    Q("doc_rate_violations",
      (s, dir) => {
        import graft.operators.{CrawlPipeline, Robots}
        import s.implicits._
        val robots = Seq(
          ("h0.cr", "User-agent: *\nCrawl-delay: 10\nDisallow: /x"),
          ("h1.cr", "User-agent: graftbot\nCrawl-delay: 2\n\n" +
            "User-agent: *\nCrawl-delay: 60"),
          ("h3.cr", "User-agent: *\nCrawl-delay: 7")
        ).toDF("host", "text")
        val delays = Robots.parseCrawlDelay(robots, "host", "text", "graftbot")
        val recs = Tables.documents(s, dir).select(
          concat(lit("http://h"), pmod(col("doc_id"), lit(7)),
            lit(".cr/p/"), col("doc_id")).as("target_uri"),
          date_format(
            expr("timestamp'2026-02-01 00:00:00' + " +
              "make_dt_interval(0, 0, 0, (doc_id * 7) % 600)"),
            "yyyy-MM-dd'T'HH:mm:ss'Z'").as("warc_date"))
        CrawlPipeline.rateViolations(recs, delays)
          .select(col("host"),
            date_format(col("minute_start"), "yyyy-MM-dd HH:mm:ss")
              .as("minute"),
            col("n_fetches"), col("cap"), col("violation"))
          .orderBy(col("host"), col("minute"))
      },
      Some("""WITH f AS (
             |  SELECT 'h' || CAST(doc_id % 7 AS VARCHAR) || '.cr' AS host,
             |         TIMESTAMP '2026-02-01 00:00:00'
             |           + to_seconds(CAST(doc_id * 7 % 600 AS BIGINT)) AS ts
             |  FROM documents),
             |m AS (SELECT host, date_trunc('minute', ts) AS mn,
             |             count(*) AS n_fetches
             |      FROM f GROUP BY host, date_trunc('minute', ts)),
             |d AS (SELECT * FROM (VALUES
             |        ('h0.cr', CAST(10 AS BIGINT)),
             |        ('h1.cr', CAST(2 AS BIGINT)),
             |        ('h3.cr', CAST(7 AS BIGINT))) AS t(host, delay_s))
             |SELECT m.host,
             |       strftime(m.mn, '%Y-%m-%d %H:%M:%S') AS minute,
             |       m.n_fetches,
             |       (60 + d.delay_s - 1) // d.delay_s AS cap,
             |       coalesce(m.n_fetches > (60 + d.delay_s - 1) // d.delay_s,
             |                false) AS violation
             |FROM m LEFT JOIN d USING (host)
             |ORDER BY m.host, minute""".stripMargin),
      doc = "live politeness rate limiter (batch twin): per-minute counts vs ceil(60/delay) caps from parsed Crawl-delay, stateless stream-static join, violations flagged exactly"),

    // The politeness GATE end-to-end (batch twin of
    // CrawlPipeline.fromWarcStreamPolite, whose stream ≡ batch pin
    // lives in CrawlPipelineSpec): synthetic WARC-shaped fetch records
    // flow through the one-stateful-operator gate — declared caps
    // broadcast-joined BEFORE a per-(host, minute) collect — and this
    // query returns the DEAD-LETTER relation: every fetch landing in a
    // minute that exceeds its host's ceil(60/Crawl-delay) cap. The
    // oracle recomputes per-minute counts, joins the declared-delay
    // table, and explodes violating minutes back to their URLs.
    Q("doc_crawl_polite_gate",
      (s, dir) => {
        import graft.operators.{CrawlPipeline, Robots}
        import s.implicits._
        val robots = Seq(
          ("h0.gx", "User-agent: *\nCrawl-delay: 10"),
          ("h1.gx", "User-agent: *\nCrawl-delay: 2")).toDF("host", "text")
        val delays = Robots.parseCrawlDelay(robots, "host", "text", "*")
        val recs = Tables.documents(s, dir).select(
          concat(lit("<urn:g:"), col("doc_id"), lit(">")).as("record_id"),
          lit("response").as("record_type"),
          concat(lit("http://h"), pmod(col("doc_id"), lit(5)),
            lit(".gx/p/"), col("doc_id")).as("target_uri"),
          date_format(
            expr("timestamp'2026-02-01 00:00:00' + " +
              "make_dt_interval(0, 0, 0, (doc_id * 7) % 600)"),
            "yyyy-MM-dd'T'HH:mm:ss'Z'").as("warc_date"),
          lit("text/html").as("content_type"),
          encode(concat(lit("<p>doc "), col("doc_id"), lit("</p>")), "UTF-8")
            .as("payload"))
        val rules = Seq.empty[(String, String, Boolean)]
          .toDF("host", "prefix", "allow")
        CrawlPipeline.fromWarcStreamPolite(recs, rules, delays)._2
          .select(col("url"), col("host"),
            date_format(col("minute_start"), "yyyy-MM-dd HH:mm:ss")
              .as("minute"),
            col("n_fetches"), col("cap"))
          .orderBy(col("url"))
      },
      Some("""WITH f AS (
             |  SELECT 'http://h' || CAST(doc_id % 5 AS VARCHAR) || '.gx/p/'
             |           || CAST(doc_id AS VARCHAR) AS url,
             |         'h' || CAST(doc_id % 5 AS VARCHAR) || '.gx' AS host,
             |         TIMESTAMP '2026-02-01 00:00:00'
             |           + to_seconds(CAST(doc_id * 7 % 600 AS BIGINT)) AS ts
             |  FROM documents),
             |d AS (SELECT * FROM (VALUES
             |        ('h0.gx', CAST(10 AS BIGINT)),
             |        ('h1.gx', CAST(2 AS BIGINT))) AS t(host, delay_s)),
             |m AS (SELECT host, date_trunc('minute', ts) AS mn,
             |             count(*) AS n_fetches
             |      FROM f GROUP BY host, date_trunc('minute', ts)),
             |v AS (SELECT m.host, m.mn, m.n_fetches,
             |             (60 + d.delay_s - 1) // d.delay_s AS cap
             |      FROM m JOIN d USING (host)
             |      WHERE m.n_fetches > (60 + d.delay_s - 1) // d.delay_s)
             |SELECT f.url, f.host,
             |       strftime(v.mn, '%Y-%m-%d %H:%M:%S') AS minute,
             |       v.n_fetches, v.cap
             |FROM f JOIN v ON v.host = f.host
             |              AND date_trunc('minute', f.ts) = v.mn
             |ORDER BY f.url""".stripMargin),
      doc = "politeness gate end-to-end (batch twin of the streaming one-stateful-operator gate): fetches in minutes exceeding the declared ceil(60/Crawl-delay) cap divert to the dead-letter relation; per-minute recount + explode-back oracle"),

    // Cross-crawl DIFF — what changed between two crawls: per URL,
    // added / gone / changed / same, with within-crawl re-fetches
    // resolving latest-wins BEFORE the comparison. Planted fates:
    // every id%7==0 URL disappears (gone), id%5==0 pages change
    // content, id%11==0 pages were RE-FETCHED in the old crawl (their
    // latest payload is the ' v2' body — so even id%5!=0 ones read
    // changed when the new crawl serves the original text), and
    // id%13==0 mint brand-new URLs (added). The oracle reproduces
    // statuses from payload-STRING equality — the Spark side compares
    // xxhash64 of the encoded bytes, so the hash compare pins that the
    // hash-reduction loses nothing.
    Q("doc_crawl_diff",
      (s, dir) => {
        import graft.operators.CrawlPipeline
        val docs = Tables.documents(s, dir)
        def url = concat(lit("http://h"), pmod(col("doc_id"), lit(7)),
          lit(".dx/p/"), col("doc_id"))
        val oldBase = docs.select(
          lit("response").as("record_type"), url.as("target_uri"),
          lit("2026-01-01T00:00:00Z").as("warc_date"),
          encode(col("text"), "UTF-8").as("payload"))
        val oldRefetch = docs.filter(pmod(col("doc_id"), lit(11)) === 0)
          .select(lit("response").as("record_type"), url.as("target_uri"),
            lit("2026-01-02T00:00:00Z").as("warc_date"),
            encode(concat(col("text"), lit(" v2")), "UTF-8").as("payload"))
        val oldCrawl = oldBase.unionByName(oldRefetch)
        val newKept = docs.filter(pmod(col("doc_id"), lit(7)) =!= 0)
          .select(lit("response").as("record_type"), url.as("target_uri"),
            lit("2026-02-01T00:00:00Z").as("warc_date"),
            encode(when(pmod(col("doc_id"), lit(5)) === 0,
              concat(col("text"), lit(" updated"))).otherwise(col("text")),
              "UTF-8").as("payload"))
        val newAdded = docs.filter(pmod(col("doc_id"), lit(13)) === 0)
          .select(lit("response").as("record_type"),
            concat(lit("http://new.dx/p/"), col("doc_id")).as("target_uri"),
            lit("2026-02-01T00:00:00Z").as("warc_date"),
            encode(col("text"), "UTF-8").as("payload"))
        CrawlPipeline.crawlDiff(oldCrawl, newKept.unionByName(newAdded))
          .select(col("url"), col("status"))
          .orderBy(col("url"))
      },
      Some("""WITH oldc AS (
             |  SELECT 'http://h' || CAST(doc_id % 7 AS VARCHAR) || '.dx/p/'
             |           || CAST(doc_id AS VARCHAR) AS url,
             |         CASE WHEN doc_id % 11 = 0 THEN text || ' v2'
             |              ELSE text END AS payload
             |  FROM documents),
             |newc AS (
             |  SELECT 'http://h' || CAST(doc_id % 7 AS VARCHAR) || '.dx/p/'
             |           || CAST(doc_id AS VARCHAR) AS url,
             |         CASE WHEN doc_id % 5 = 0 THEN text || ' updated'
             |              ELSE text END AS payload
             |  FROM documents WHERE doc_id % 7 <> 0
             |  UNION ALL
             |  SELECT 'http://new.dx/p/' || CAST(doc_id AS VARCHAR), text
             |  FROM documents WHERE doc_id % 13 = 0)
             |SELECT coalesce(oldc.url, newc.url) AS url,
             |       CASE WHEN oldc.url IS NULL THEN 'added'
             |            WHEN newc.url IS NULL THEN 'gone'
             |            WHEN oldc.payload = newc.payload THEN 'same'
             |            ELSE 'changed' END AS status
             |FROM oldc FULL OUTER JOIN newc ON newc.url = oldc.url
             |ORDER BY url""".stripMargin),
      doc = "cross-crawl diff: per-URL added/gone/changed/same with latest-wins within-crawl re-fetch resolution; payload bytes never shuffle (url + 8-byte hash per side); string-equality oracle pins the hash reduction"),

    // The LIVE form (batch twin of CrawlPipeline.crawlDiffStream,
    // whose stream ≡ batch pin lives in CrawlPipelineSpec): each new
    // fetch judged as it lands against the PREVIOUS crawl's broadcast
    // (url, hash) relation — added/changed/same per fetch, no state;
    // `gone` is inherently an end-of-crawl verdict and stays with the
    // batch diff. Same planted fates as doc_crawl_diff.
    Q("doc_crawl_diff_live",
      (s, dir) => {
        import graft.operators.CrawlPipeline
        val docs = Tables.documents(s, dir)
        def url = concat(lit("http://h"), pmod(col("doc_id"), lit(7)),
          lit(".dx/p/"), col("doc_id"))
        val oldBase = docs.select(
          lit("response").as("record_type"), url.as("target_uri"),
          lit("2026-01-01T00:00:00Z").as("warc_date"),
          encode(col("text"), "UTF-8").as("payload"))
        val oldRefetch = docs.filter(pmod(col("doc_id"), lit(11)) === 0)
          .select(lit("response").as("record_type"), url.as("target_uri"),
            lit("2026-01-02T00:00:00Z").as("warc_date"),
            encode(concat(col("text"), lit(" v2")), "UTF-8").as("payload"))
        val oldHashes = CrawlPipeline.crawlHashes(
          oldBase.unionByName(oldRefetch))
        val newKept = docs.filter(pmod(col("doc_id"), lit(7)) =!= 0)
          .select(lit("response").as("record_type"), url.as("target_uri"),
            encode(when(pmod(col("doc_id"), lit(5)) === 0,
              concat(col("text"), lit(" updated"))).otherwise(col("text")),
              "UTF-8").as("payload"))
        val newAdded = docs.filter(pmod(col("doc_id"), lit(13)) === 0)
          .select(lit("response").as("record_type"),
            concat(lit("http://new.dx/p/"), col("doc_id")).as("target_uri"),
            encode(col("text"), "UTF-8").as("payload"))
        CrawlPipeline.crawlDiffStream(newKept.unionByName(newAdded),
            oldHashes)
          .select(col("url"), col("status"))
          .orderBy(col("url"))
      },
      Some("""WITH oldc AS (
             |  SELECT 'http://h' || CAST(doc_id % 7 AS VARCHAR) || '.dx/p/'
             |           || CAST(doc_id AS VARCHAR) AS url,
             |         CASE WHEN doc_id % 11 = 0 THEN text || ' v2'
             |              ELSE text END AS payload
             |  FROM documents),
             |newc AS (
             |  SELECT 'http://h' || CAST(doc_id % 7 AS VARCHAR) || '.dx/p/'
             |           || CAST(doc_id AS VARCHAR) AS url,
             |         CASE WHEN doc_id % 5 = 0 THEN text || ' updated'
             |              ELSE text END AS payload
             |  FROM documents WHERE doc_id % 7 <> 0
             |  UNION ALL
             |  SELECT 'http://new.dx/p/' || CAST(doc_id AS VARCHAR), text
             |  FROM documents WHERE doc_id % 13 = 0)
             |SELECT newc.url,
             |       CASE WHEN oldc.url IS NULL THEN 'added'
             |            WHEN oldc.payload = newc.payload THEN 'same'
             |            ELSE 'changed' END AS status
             |FROM newc LEFT JOIN oldc ON oldc.url = newc.url
             |ORDER BY newc.url""".stripMargin),
      doc = "live cross-crawl diff (batch twin of the stream-static form): per-fetch added/changed/same against the previous crawl's broadcast hash relation, stateless"),

    // The ONE-CALL crawl OPERATIONS report — the per-host dashboard a
    // crawl operator actually reads after (or during) a run: fetch
    // volume + politeness stats (hierarchical whale-safe min gap,
    // busiest minute), the host's declared Crawl-delay, how many
    // minutes VIOLATED its cap, and the host's link-graph rank. Four
    // already-oracled relations composed host-keyed; everything
    // integer/exactly-replayable, so the whole dashboard is one oracle.
    Q("doc_crawl_ops_report",
      (s, dir) => {
        import graft.operators.{CrawlPipeline, LinkGraph, Robots}
        import s.implicits._
        def host7(e: org.apache.spark.sql.Column) =
          concat(lit("h"), pmod(e, lit(7)).cast("string"), lit(".cr"))
        val docs = Tables.documents(s, dir)
        val recs = docs.select(
          concat(lit("http://h"), pmod(col("doc_id"), lit(7)),
            lit(".cr/p/"), col("doc_id")).as("target_uri"),
          date_format(
            expr("timestamp'2026-02-01 00:00:00' + " +
              "make_dt_interval(0, 0, 0, (doc_id * 37) % 9999)"),
            "yyyy-MM-dd'T'HH:mm:ss'Z'").as("warc_date"))
        val delays = Robots.parseCrawlDelay(Seq(
          ("h0.cr", "User-agent: *\nCrawl-delay: 10"),
          ("h1.cr", "User-agent: *\nCrawl-delay: 2"),
          ("h3.cr", "User-agent: *\nCrawl-delay: 7")).toDF("host", "text"),
          "host", "text", "*")
        val stats = CrawlPipeline.hostFetchStats(recs)
        val violMin = CrawlPipeline.rateViolations(recs, delays)
          .filter(col("violation"))
          .groupBy(col("host"))
          .agg(count(lit(1)).as("n_violating_minutes"))
        val edges = docs.select(host7(col("doc_id")).as("src"),
          host7(col("doc_id") * 3 + 1).as("dst"))
        val ranks = LinkGraph.pageRankInt(edges, "src", "dst", iterations = 2)
          .select(col("node").as("host"), col("rank").as("pr"))
        stats
          .join(broadcast(delays), Seq("host"), "left")
          .join(violMin, Seq("host"), "left")
          .join(ranks, Seq("host"))
          .select(col("host"), col("n_fetches"), col("min_gap_s"),
            col("max_per_minute"), col("delay_s"),
            coalesce(col("n_violating_minutes"), lit(0L))
              .as("n_violating_minutes"),
            col("pr"))
          .orderBy(col("host"))
      },
      Some("""WITH f AS (
             |  SELECT 'h' || CAST(doc_id % 7 AS VARCHAR) || '.cr' AS host,
             |         CAST(epoch(TIMESTAMP '2026-02-01 00:00:00'
             |              + to_seconds(CAST(doc_id * 37 % 9999 AS BIGINT)))
             |              AS BIGINT) AS t
             |  FROM documents),
             |g AS (SELECT host, t,
             |             t - lag(t) OVER (PARTITION BY host ORDER BY t) AS gap
             |      FROM f),
             |m AS (SELECT host, t // 60 AS b, count(*) AS nb
             |      FROM f GROUP BY host, t // 60),
             |mb AS (SELECT host, max(nb) AS max_per_minute FROM m GROUP BY host),
             |a AS (SELECT host, count(*) AS n_fetches, min(gap) AS min_gap_s
             |      FROM g GROUP BY host),
             |d AS (SELECT * FROM (VALUES
             |        ('h0.cr', CAST(10 AS BIGINT)),
             |        ('h1.cr', CAST(2 AS BIGINT)),
             |        ('h3.cr', CAST(7 AS BIGINT))) AS t(host, delay_s)),
             |v AS (SELECT m.host, count(*) AS n_violating_minutes
             |      FROM m JOIN d USING (host)
             |      WHERE m.nb > (60 + d.delay_s - 1) // d.delay_s
             |      GROUP BY m.host),
             |e AS (SELECT DISTINCT
             |             'h' || CAST(doc_id % 7 AS VARCHAR) || '.cr' AS src,
             |             'h' || CAST((3*doc_id+1) % 7 AS VARCHAR) || '.cr' AS dst
             |      FROM documents),
             |o AS (SELECT src, count(*) AS outd FROM e GROUP BY src),
             |n AS (SELECT DISTINCT src AS node FROM e
             |      UNION SELECT DISTINCT dst FROM e),
             |r0 AS (SELECT node, CAST(1000000000000 AS HUGEINT) AS pr FROM n),
             |s1 AS (SELECT e.dst AS node, sum(r0.pr // o.outd) AS s
             |       FROM e JOIN o USING (src) JOIN r0 ON r0.node = e.src
             |       GROUP BY e.dst),
             |r1 AS (SELECT n.node,
             |              150000000000 + (85 * coalesce(s1.s, 0)) // 100 AS pr
             |       FROM n LEFT JOIN s1 USING (node)),
             |s2 AS (SELECT e.dst AS node, sum(r1.pr // o.outd) AS s
             |       FROM e JOIN o USING (src) JOIN r1 ON r1.node = e.src
             |       GROUP BY e.dst),
             |r2 AS (SELECT n.node,
             |              150000000000 + (85 * coalesce(s2.s, 0)) // 100 AS pr
             |       FROM n LEFT JOIN s2 USING (node))
             |SELECT a.host, a.n_fetches, a.min_gap_s, mb.max_per_minute,
             |       d.delay_s, coalesce(v.n_violating_minutes, 0)
             |         AS n_violating_minutes,
             |       CAST(r2.pr AS BIGINT) AS pr
             |FROM a JOIN mb USING (host)
             |       LEFT JOIN d USING (host)
             |       LEFT JOIN v USING (host)
             |       JOIN r2 ON r2.node = a.host
             |ORDER BY a.host""".stripMargin),
      doc = "one-call crawl operations report: per-host fetch volume + whale-safe politeness stats + declared delay + violating-minute count + link rank, four oracled relations composed into one dashboard oracle"),

    // Crawl-frontier prioritization — the composition the crawl
    // actually schedules from: host QUALITY (integer PageRank over
    // the host link graph) divided by host COST (how much we already
    // fetched there, +1), all integer-exact so the ranking is
    // reproducible. High-rank barely-crawled hosts surface first;
    // heavily-crawled hosts sink regardless of rank. The oracle
    // replays both inputs (2 PR rounds + fetch counts) and the
    // priority division.
    Q("doc_crawl_frontier",
      (s, dir) => {
        import graft.operators.{CrawlPipeline, LinkGraph}
        def host(e: org.apache.spark.sql.Column) =
          concat(lit("h"), pmod(e, lit(7)).cast("string"), lit(".cr"))
        val docs = Tables.documents(s, dir)
        val edges = docs.select(host(col("doc_id")).as("src"),
          host(col("doc_id") * 3 + 1).as("dst"))
        val ranks = LinkGraph.pageRankInt(edges, "src", "dst", iterations = 2)
        val recs = docs.select(
          concat(lit("http://h"), pmod(col("doc_id"), lit(7)),
            lit(".cr/p/"), col("doc_id")).as("target_uri"),
          date_format(
            expr("timestamp'2026-02-01 00:00:00' + " +
              "make_dt_interval(0, 0, 0, (doc_id * 37) % 9999)"),
            "yyyy-MM-dd'T'HH:mm:ss'Z'").as("warc_date"))
        val stats = CrawlPipeline.hostFetchStats(recs)
          .select(col("host"), col("n_fetches"))
        ranks.join(stats, ranks("node") === stats("host"))
          .select(col("host"), col("rank").as("pr"), col("n_fetches"),
            expr("rank div (n_fetches + 1)").as("priority"))
          .orderBy(col("priority").desc, col("host"))
      },
      Some("""WITH e AS (
             |  SELECT DISTINCT
             |         'h' || CAST(doc_id % 7 AS VARCHAR) || '.cr' AS src,
             |         'h' || CAST((3*doc_id+1) % 7 AS VARCHAR) || '.cr' AS dst
             |  FROM documents),
             |o AS (SELECT src, count(*) AS outd FROM e GROUP BY src),
             |n AS (SELECT DISTINCT src AS node FROM e
             |      UNION SELECT DISTINCT dst FROM e),
             |r0 AS (SELECT node, CAST(1000000000000 AS HUGEINT) AS pr FROM n),
             |s1 AS (SELECT e.dst AS node, sum(r0.pr // o.outd) AS s
             |       FROM e JOIN o USING (src) JOIN r0 ON r0.node = e.src
             |       GROUP BY e.dst),
             |r1 AS (SELECT n.node,
             |              150000000000 + (85 * coalesce(s1.s, 0)) // 100 AS pr
             |       FROM n LEFT JOIN s1 USING (node)),
             |s2 AS (SELECT e.dst AS node, sum(r1.pr // o.outd) AS s
             |       FROM e JOIN o USING (src) JOIN r1 ON r1.node = e.src
             |       GROUP BY e.dst),
             |r2 AS (SELECT n.node,
             |              150000000000 + (85 * coalesce(s2.s, 0)) // 100 AS pr
             |       FROM n LEFT JOIN s2 USING (node)),
             |f AS (SELECT 'h' || CAST(doc_id % 7 AS VARCHAR) || '.cr' AS host,
             |             count(*) AS n_fetches
             |      FROM documents GROUP BY host)
             |SELECT f.host, CAST(r2.pr AS BIGINT) AS pr, f.n_fetches,
             |       CAST(r2.pr // (f.n_fetches + 1) AS BIGINT) AS priority
             |FROM r2 JOIN f ON f.host = r2.node
             |ORDER BY priority DESC, f.host""".stripMargin),
      doc = "crawl-frontier prioritization: host PageRank over fetch cost (rank div (n_fetches+1)) - the integer-exact quality/cost schedule a crawler allocates from"),

    // Frontier scheduling v2 — the POLITENESS BUDGET is the cost, not
    // the fetch history: a host's declared Crawl-delay bounds its
    // fetch slots per minute (ceil(60/delay), exactly the rate-limiter
    // cap), so each slot's value is rank div slots and the scheduler
    // fills the most valuable slots first. Crawl-delays parse from
    // planted robots bodies through the SAME group machinery as the
    // rule parse; hosts declaring nothing fall to the 1 s default
    // (60 slots). Integer-exact; the oracle replays 2 PR rounds + the
    // declared-delay table + the slot arithmetic.
    Q("doc_crawl_frontier_slots",
      (s, dir) => {
        import graft.operators.{CrawlPipeline, LinkGraph, Robots}
        import s.implicits._
        def host(e: org.apache.spark.sql.Column) =
          concat(lit("h"), pmod(e, lit(7)).cast("string"), lit(".cr"))
        val docs = Tables.documents(s, dir)
        val edges = docs.select(host(col("doc_id")).as("src"),
          host(col("doc_id") * 3 + 1).as("dst"))
        val ranks = LinkGraph.pageRankInt(edges, "src", "dst", iterations = 2)
        val delays = Robots.parseCrawlDelay(Seq(
          ("h0.cr", "User-agent: *\nCrawl-delay: 10"),
          ("h1.cr", "User-agent: *\nCrawl-delay: 2"),
          ("h3.cr", "User-agent: *\nCrawl-delay: 7")).toDF("host", "text"),
          "host", "text", "*")
        CrawlPipeline.frontierSlots(ranks, delays)
          .orderBy(col("priority").desc, col("host"))
      },
      Some("""WITH e AS (
             |  SELECT DISTINCT
             |         'h' || CAST(doc_id % 7 AS VARCHAR) || '.cr' AS src,
             |         'h' || CAST((3*doc_id+1) % 7 AS VARCHAR) || '.cr' AS dst
             |  FROM documents),
             |o AS (SELECT src, count(*) AS outd FROM e GROUP BY src),
             |n AS (SELECT DISTINCT src AS node FROM e
             |      UNION SELECT DISTINCT dst FROM e),
             |r0 AS (SELECT node, CAST(1000000000000 AS HUGEINT) AS pr FROM n),
             |s1 AS (SELECT e.dst AS node, sum(r0.pr // o.outd) AS s
             |       FROM e JOIN o USING (src) JOIN r0 ON r0.node = e.src
             |       GROUP BY e.dst),
             |r1 AS (SELECT n.node,
             |              150000000000 + (85 * coalesce(s1.s, 0)) // 100 AS pr
             |       FROM n LEFT JOIN s1 USING (node)),
             |s2 AS (SELECT e.dst AS node, sum(r1.pr // o.outd) AS s
             |       FROM e JOIN o USING (src) JOIN r1 ON r1.node = e.src
             |       GROUP BY e.dst),
             |r2 AS (SELECT n.node,
             |              150000000000 + (85 * coalesce(s2.s, 0)) // 100 AS pr
             |       FROM n LEFT JOIN s2 USING (node)),
             |d AS (SELECT * FROM (VALUES
             |        ('h0.cr', CAST(10 AS BIGINT)),
             |        ('h1.cr', CAST(2 AS BIGINT)),
             |        ('h3.cr', CAST(7 AS BIGINT))) AS t(host, delay_s)),
             |x AS (SELECT r2.node AS host, CAST(r2.pr AS BIGINT) AS pr,
             |             coalesce(d.delay_s, 1) AS delay_s
             |      FROM r2 LEFT JOIN d ON d.host = r2.node)
             |SELECT host, pr, delay_s,
             |       (60 + delay_s - 1) // delay_s AS slots_per_min,
             |       CAST(pr // ((60 + delay_s - 1) // delay_s) AS BIGINT)
             |         AS priority
             |FROM x
             |ORDER BY priority DESC, host""".stripMargin),
      doc = "frontier scheduling v2: rank per available fetch slot (ceil(60/Crawl-delay) politeness budget as the cost), declared delays parsed from robots bodies, integer-exact replay oracle"),

    // The WHOLE crawl-side pipeline as one oracled call: documents
    // render as full pages (title, link-dense nav, escaped content,
    // boilerplate), land in a real per-record-gzip WARC TOGETHER WITH
    // robots.txt response records (h0 disallows everything, h1 allows
    // these paths, h2 publishes none), and CrawlPipeline.fromWarc
    // rebuilds the corpus: in-crawl robots gate -> HTML-only -> title
    // + jusText main content + host source. The oracle reproduces
    // every surviving row from the raw text and the planted policy.
    Q("doc_crawl_pipeline",
      (s, dir) => {
        import graft.operators.CrawlPipeline
        import s.implicits._
        val warcDir = java.nio.file.Files
          .createTempDirectory("graft-crawl-q-").toString
        val docs = Tables.documents(s, dir)
        val esc = regexp_replace(regexp_replace(regexp_replace(col("text"),
          lit("&"), lit("&amp;")), lit("<"), lit("&lt;")), lit(">"), lit("&gt;"))
        val host = concat(lit("h"), pmod(col("doc_id"), lit(3)), lit(".ex"))
        val pageHtml = concat(
          lit("<html><head><title>Doc "), col("doc_id"),
          lit("</title></head><body>" +
            "<div class='nav'><a href='/'>Home</a> <a href='/a'>About</a>" +
            " <a href='/c'>Contact pages</a></div><p>"),
          esc,
          lit("</p><div>Copyright 2026 GraftCorp</div>" +
            "<div><a href='/t'>Terms</a> <a href='/p'>Privacy policy</a>" +
            "</div></body></html>"))
        val pages = docs.select(
          concat(lit("<urn:page:"), col("doc_id"), lit(">")).as("record_id"),
          lit("response").as("record_type"),
          concat(lit("http://"), host, lit("/p/"), col("doc_id")).as("target_uri"),
          lit("2026-01-01T00:00:00Z").as("warc_date"),
          lit("text/html").as("content_type"),
          encode(pageHtml, "UTF-8").as("payload"))
        val robots = Seq(
          ("<urn:rob:0>", "response", "http://h0.ex/robots.txt",
            "2026-01-01T00:00:00Z", "text/plain",
            "User-agent: *\nDisallow: /"),
          ("<urn:rob:1>", "response", "http://h1.ex/robots.txt",
            "2026-01-01T00:00:00Z", "text/plain",
            "User-agent: *\nDisallow: /tmp"))
          .toDF("record_id", "record_type", "target_uri", "warc_date",
            "content_type", "body")
          .withColumn("payload", encode(col("body"), "UTF-8")).drop("body")
        pages.unionByName(robots)
          .write.format("warc").option("compression", "gzip")
          .mode("append").save(warcDir)
        CrawlPipeline.fromWarc(s.read.format("warc").load(warcDir))
          .select(
            regexp_extract(col("url"), "/p/(\\d+)$", 1)
              .cast("long").as("doc_id"),
            col("url"), col("source"), col("title"), col("text"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH c AS (
             |  SELECT doc_id,
             |         trim(regexp_replace(text,
             |              '[ \t\n\x0B\x0C\r]+', ' ', 'g')) AS t
             |  FROM documents WHERE doc_id % 3 <> 0),
             |m AS (
             |  SELECT doc_id, t,
             |         length(replace(t, ' ', '')) AS nc,
             |         len(string_split(t, ' ')) AS nw,
             |         len(list_filter(string_split(t, ' '),
             |             w -> list_contains(['the','a','of','and','to','in'],
             |                                w))) AS hits
             |  FROM c)
             |SELECT doc_id,
             |       'http://h' || CAST(doc_id % 3 AS VARCHAR) || '.ex/p/'
             |         || CAST(doc_id AS VARCHAR) AS url,
             |       'h' || CAST(doc_id % 3 AS VARCHAR) || '.ex' AS source,
             |       'Doc ' || CAST(doc_id AS VARCHAR) AS title,
             |       CASE WHEN nc >= 25 AND hits * 10 >= nw
             |            THEN t ELSE '' END AS text
             |FROM m
             |ORDER BY doc_id""".stripMargin),
      doc = "one-call crawl pipeline: WARC (pages + in-crawl robots) -> robots gate -> HTML-only -> title + main content + host source, end-to-end oracled"),

    // The ENVELOPED form — payloads carry the full HTTP response (the
    // Common Crawl layout): the page gate runs on the PARSED status
    // line (404s drop) and the PARSED Content-Type (the WARC
    // content_type column is the useless-on-purpose envelope type
    // 'application/http'), bodies slice out of the envelope, and a
    // 404 robots.txt carries NO rules (RFC 9309 §2.3.1.3 unrestricted
    // — its would-block-everything body must be ignored). Same
    // main-content law as doc_crawl_pipeline; the oracle adds the
    // status-law exclusions.
    Q("doc_crawl_pipeline_http",
      (s, dir) => {
        import graft.operators.CrawlPipeline
        import s.implicits._
        val warcDir = java.nio.file.Files
          .createTempDirectory("graft-crawlhttp-q-").toString
        val docs = Tables.documents(s, dir)
        val esc = regexp_replace(regexp_replace(regexp_replace(col("text"),
          lit("&"), lit("&amp;")), lit("<"), lit("&lt;")), lit(">"), lit("&gt;"))
        val host = concat(lit("h"), pmod(col("doc_id"), lit(3)), lit(".hx"))
        val pageHtml = concat(
          lit("<html><head><title>Doc "), col("doc_id"),
          lit("</title></head><body>" +
            "<div class='nav'><a href='/'>Home</a> <a href='/a'>About</a>" +
            " <a href='/c'>Contact pages</a></div><p>"),
          esc,
          lit("</p><div>Copyright 2026 GraftCorp</div>" +
            "<div><a href='/t'>Terms</a> <a href='/p'>Privacy policy</a>" +
            "</div></body></html>"))
        val statusLine = when(pmod(col("doc_id"), lit(11)) === 0,
          lit("404 Not Found")).otherwise(lit("200 OK"))
        val pages = docs.select(
          concat(lit("<urn:hpage:"), col("doc_id"), lit(">")).as("record_id"),
          lit("response").as("record_type"),
          concat(lit("http://"), host, lit("/p/"), col("doc_id"))
            .as("target_uri"),
          lit("2026-01-01T00:00:00Z").as("warc_date"),
          lit("application/http; msgtype=response").as("content_type"),
          encode(concat(lit("HTTP/1.1 "), statusLine,
            lit("\r\nContent-Type: text/html; charset=UTF-8\r\n\r\n"),
            pageHtml), "UTF-8").as("payload"))
        // h0: enveloped 200 robots blocking everything; h1: a 404
        // robots whose body WOULD block everything — the status gate
        // must discard it (h1 pages survive)
        val robots = Seq(
          ("<urn:hrob:0>", "http://h0.hx/robots.txt", "200 OK"),
          ("<urn:hrob:1>", "http://h1.hx/robots.txt", "404 Not Found"))
          .toDF("record_id", "target_uri", "st")
          .select(col("record_id"), lit("response").as("record_type"),
            col("target_uri"), lit("2026-01-01T00:00:00Z").as("warc_date"),
            lit("application/http; msgtype=response").as("content_type"),
            encode(concat(lit("HTTP/1.1 "), col("st"),
              lit("\r\nContent-Type: text/plain\r\n\r\n" +
                "User-agent: *\nDisallow: /")), "UTF-8").as("payload"))
        pages.unionByName(robots)
          .write.format("warc").option("compression", "gzip")
          .mode("append").save(warcDir)
        CrawlPipeline.fromWarc(s.read.format("warc").load(warcDir),
            CrawlPipeline.CrawlSettings(httpEnvelope = true))
          .select(
            regexp_extract(col("url"), "/p/(\\d+)$", 1)
              .cast("long").as("doc_id"),
            col("url"), col("source"), col("title"), col("text"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH c AS (
             |  SELECT doc_id,
             |         trim(regexp_replace(text,
             |              '[ \t\n\x0B\x0C\r]+', ' ', 'g')) AS t
             |  FROM documents
             |  WHERE doc_id % 3 <> 0 AND doc_id % 11 <> 0),
             |m AS (
             |  SELECT doc_id, t,
             |         length(replace(t, ' ', '')) AS nc,
             |         len(string_split(t, ' ')) AS nw,
             |         len(list_filter(string_split(t, ' '),
             |             w -> list_contains(['the','a','of','and','to','in'],
             |                                w))) AS hits
             |  FROM c)
             |SELECT doc_id,
             |       'http://h' || CAST(doc_id % 3 AS VARCHAR) || '.hx/p/'
             |         || CAST(doc_id AS VARCHAR) AS url,
             |       'h' || CAST(doc_id % 3 AS VARCHAR) || '.hx' AS source,
             |       'Doc ' || CAST(doc_id AS VARCHAR) AS title,
             |       CASE WHEN nc >= 25 AND hits * 10 >= nw
             |            THEN t ELSE '' END AS text
             |FROM m
             |ORDER BY doc_id""".stripMargin),
      doc = "enveloped crawl pipeline (Common Crawl layout): parsed-status 404 drop + parsed media type (WARC column is the envelope type) + enveloped robots with a 404-robots-is-unrestricted pin; same main-content law, end-to-end oracled"),

    // HTTP envelope parse — Common Crawl `response` records hold the
    // FULL HTTP response (status line + headers + body), and the
    // corpus builder needs the envelope split before anything else
    // touches the bytes. Responses are planted from documents with a
    // known law (status by doc_id%10, charset-bearing Content-Type on
    // even ids, Location on 301s), Http.responseParts parses them FOR
    // REAL (regexp/split built-ins over the latin-1 view), and the
    // oracle recomputes every column from the plant arithmetic — the
    // hash compare pins the parser.
    Q("doc_http_parse",
      (s, dir) => {
        import graft.operators.Http
        val docs = Tables.documents(s, dir)
        val st = pmod(col("doc_id"), lit(10))
        val statusLine = when(st === 1, lit("301 Moved Permanently"))
          .when(st === 2, lit("404 Not Found"))
          .when(st === 3, lit("503 Service Unavailable"))
          .otherwise(lit("200 OK"))
        val ctLine = when(pmod(col("doc_id"), lit(2)) === 0,
          lit("text/html; charset=UTF-8")).otherwise(lit("text/plain"))
        val locLine = when(st === 1,
          concat(lit("Location: http://h"),
            pmod(col("doc_id") + 1, lit(5)), lit(".hx/p/"),
            col("doc_id") + 1, lit("\r\n"))).otherwise(lit(""))
        val recs = docs.select(col("doc_id"),
          concat(lit("http://h"), pmod(col("doc_id"), lit(5)),
            lit(".hx/p/"), col("doc_id")).as("url"),
          encode(concat(lit("HTTP/1.1 "), statusLine,
            lit("\r\nContent-Type: "), ctLine, lit("\r\n"), locLine,
            lit("\r\n"), col("text")), "UTF-8").as("payload"))
        Http.responseParts(recs)
          .select(col("doc_id"), col("url"), col("status"),
            col("media_type"), col("charset"), col("location"),
            length(decode(col("body"), "UTF-8")).as("body_chars"))
          .orderByOnce(col("doc_id"))
      },
      Some("""SELECT doc_id,
             |       'http://h' || CAST(doc_id % 5 AS VARCHAR) || '.hx/p/'
             |         || CAST(doc_id AS VARCHAR) AS url,
             |       CAST(CASE doc_id % 10 WHEN 1 THEN 301 WHEN 2 THEN 404
             |            WHEN 3 THEN 503 ELSE 200 END AS INT) AS status,
             |       CASE WHEN doc_id % 2 = 0 THEN 'text/html'
             |            ELSE 'text/plain' END AS media_type,
             |       CASE WHEN doc_id % 2 = 0 THEN 'utf-8' END AS charset,
             |       CASE WHEN doc_id % 10 = 1
             |            THEN 'http://h' || CAST((doc_id+1) % 5 AS VARCHAR)
             |              || '.hx/p/' || CAST(doc_id+1 AS VARCHAR)
             |            END AS location,
             |       length(text) AS body_chars
             |FROM documents
             |ORDER BY doc_id""".stripMargin),
      doc = "HTTP envelope parse: status line + case-insensitive headers + binary-safe body split via the bijective latin-1 view, all scan-fused built-ins; oracle recomputes from the plant law, pinning the parser"),

    // Per-host status-class report — the crawl-health dashboard row:
    // how much of each host's fetch volume was 2xx/3xx/4xx/5xx, and
    // the integer ok-rate. One conditional-count groupBy over the
    // parsed status column: partial-aggregated map-side, whale-safe
    // (a host's report row costs 5 counters, never a collect).
    Q("doc_http_status_report",
      (s, dir) => {
        import graft.operators.Http
        val docs = Tables.documents(s, dir)
        val st = pmod(col("doc_id"), lit(10))
        val statusLine = when(st === 1, lit("301 Moved"))
          .when(st === 2, lit("404 Not Found"))
          .when(st === 3, lit("503 Unavailable"))
          .otherwise(lit("200 OK"))
        val recs = docs.select(
          concat(lit("h"), pmod(col("doc_id"), lit(5)), lit(".hx"))
            .as("host"),
          encode(concat(lit("HTTP/1.1 "), statusLine,
            lit("\r\nContent-Type: text/html\r\n\r\nok")), "UTF-8")
            .as("payload"))
        Http.responseParts(recs)
          .groupBy(col("host"))
          .agg(count(lit(1)).as("n_total"),
            count(when(col("status").between(200, 299), 1)).as("n_ok"),
            count(when(col("status").between(300, 399), 1)).as("n_redirect"),
            count(when(col("status").between(400, 499), 1))
              .as("n_client_err"),
            count(when(col("status").between(500, 599), 1))
              .as("n_server_err"))
          .withColumn("ok_permille", expr("(1000 * n_ok) div n_total"))
          .orderBy(col("host"))
      },
      Some("""WITH r AS (
             |  SELECT 'h' || CAST(doc_id % 5 AS VARCHAR) || '.hx' AS host,
             |         CASE doc_id % 10 WHEN 1 THEN 301 WHEN 2 THEN 404
             |              WHEN 3 THEN 503 ELSE 200 END AS status
             |  FROM documents),
             |a AS (
             |  SELECT host, count(*) AS n_total,
             |         count(*) FILTER (status BETWEEN 200 AND 299) AS n_ok,
             |         count(*) FILTER (status BETWEEN 300 AND 399)
             |           AS n_redirect,
             |         count(*) FILTER (status BETWEEN 400 AND 499)
             |           AS n_client_err,
             |         count(*) FILTER (status BETWEEN 500 AND 599)
             |           AS n_server_err
             |  FROM r GROUP BY host)
             |SELECT host, n_total, n_ok, n_redirect, n_client_err,
             |       n_server_err, (1000 * n_ok) // n_total AS ok_permille
             |FROM a ORDER BY host""".stripMargin),
      doc = "per-host HTTP status-class report: conditional-count groupBy over the parsed status column, partial-aggregated and whale-safe; the crawl-health dashboard row"),

    // Redirect-chain resolution — every redirect source resolved to
    // its final destination by POINTER DOUBLING (2 self-joins follow
    // chains up to 4 hops; O(log chain) rounds, the star-contraction
    // discipline — never one join per hop). Edges come out of the REAL
    // HTTP parse (301 payloads with Location headers planted on
    // doc_id%10 in {1,2,3}, so chains of length 3 end at %10==4
    // terminals), plus a planted 2-cycle that must report unresolved.
    // The oracle replays both doubling rounds as unrolled join layers.
    Q("doc_redirect_chains",
      (s, dir) => {
        import graft.operators.Http
        import s.implicits._
        val docs = Tables.documents(s, dir)
        val st = pmod(col("doc_id"), lit(10))
        val isRedir = st >= 1 && st <= 3
        val statusLine = when(isRedir, lit("301 Moved Permanently"))
          .otherwise(lit("200 OK"))
        val locLine = when(isRedir,
          concat(lit("Location: http://c.hx/p/"), col("doc_id") + 1,
            lit("\r\n"))).otherwise(lit(""))
        val recs = docs.select(lit("response").as("record_type"),
          concat(lit("http://c.hx/p/"), col("doc_id")).as("target_uri"),
          encode(concat(lit("HTTP/1.1 "), statusLine, lit("\r\n"), locLine,
            lit("\r\nbody")), "UTF-8").as("payload"))
        val cycle = Seq(("http://cyc.hx/1", "http://cyc.hx/2"),
          ("http://cyc.hx/2", "http://cyc.hx/1")).toDF("url", "next")
        val edges = Http.redirectEdges(recs).unionByName(cycle)
        Http.resolveRedirects(edges, maxDoublings = 2)
          .orderBy(col("url"))
      },
      Some("""WITH e AS (
             |  SELECT 'http://c.hx/p/' || CAST(doc_id AS VARCHAR) AS url,
             |         'http://c.hx/p/' || CAST(doc_id + 1 AS VARCHAR) AS next
             |  FROM documents WHERE doc_id % 10 IN (1, 2, 3)
             |  UNION ALL
             |  SELECT * FROM (VALUES ('http://cyc.hx/1', 'http://cyc.hx/2'),
             |    ('http://cyc.hx/2', 'http://cyc.hx/1')) AS t(url, next)),
             |f0 AS (SELECT url, next, CAST(1 AS BIGINT) AS hops FROM e),
             |f1 AS (SELECT a.url, coalesce(b.next, a.next) AS next,
             |              a.hops + coalesce(b.hops, 0) AS hops
             |       FROM f0 a LEFT JOIN f0 b ON b.url = a.next),
             |f2 AS (SELECT a.url, coalesce(b.next, a.next) AS next,
             |              a.hops + coalesce(b.hops, 0) AS hops
             |       FROM f1 a LEFT JOIN f1 b ON b.url = a.next),
             |o AS (SELECT DISTINCT url FROM e)
             |SELECT f2.url, f2.next AS final_url, f2.hops,
             |       o.url IS NULL AS resolved
             |FROM f2 LEFT JOIN o ON o.url = f2.next
             |ORDER BY f2.url""".stripMargin),
      doc = "redirect-chain resolution by pointer doubling: 2 self-joins follow chains up to 4 hops, cycles report unresolved; edges from the real HTTP parse; oracle replays the doubling rounds"),

    // Redirect-canonical unification — the URL-level dedup upgrade
    // redirect resolution buys: every URL that 301-chains to the same
    // final target is ONE logical page (http://a → http://b → http://c
    // and http://c itself collapse to c). Canonical = the resolved
    // final_url when the URL redirects, itself otherwise; the rollup
    // groups aliases under their canonical. Same planted chain law as
    // doc_redirect_chains; the oracle reuses the unrolled doubling
    // layers plus the alias-group count.
    Q("doc_redirect_canonical",
      (s, dir) => {
        import graft.operators.Http
        val docs = Tables.documents(s, dir)
        val st = pmod(col("doc_id"), lit(10))
        val isRedir = st >= 1 && st <= 3
        val recs = docs.select(lit("response").as("record_type"),
          concat(lit("http://c2.hx/p/"), col("doc_id")).as("target_uri"),
          encode(concat(lit("HTTP/1.1 "),
            when(isRedir, lit("301 Moved Permanently"))
              .otherwise(lit("200 OK")), lit("\r\n"),
            when(isRedir, concat(lit("Location: http://c2.hx/p/"),
              col("doc_id") + 1, lit("\r\n"))).otherwise(lit("")),
            lit("\r\nbody")), "UTF-8").as("payload"))
        val resolved = Http
          .resolveRedirects(Http.redirectEdges(recs), maxDoublings = 2)
          .filter(col("resolved"))
        docs.select(concat(lit("http://c2.hx/p/"), col("doc_id")).as("url"))
          .join(resolved.select(col("url"), col("final_url")),
            Seq("url"), "left")
          .select(coalesce(col("final_url"), col("url")).as("canonical"))
          .groupBy(col("canonical"))
          .agg(count(lit(1)).as("n_urls"))
          .filter(col("n_urls") > 1)
          .orderBy(col("canonical"))
      },
      Some("""WITH e AS (
             |  SELECT 'http://c2.hx/p/' || CAST(doc_id AS VARCHAR) AS url,
             |         'http://c2.hx/p/' || CAST(doc_id + 1 AS VARCHAR) AS next
             |  FROM documents WHERE doc_id % 10 IN (1, 2, 3)),
             |f0 AS (SELECT url, next FROM e),
             |f1 AS (SELECT a.url, coalesce(b.next, a.next) AS next
             |       FROM f0 a LEFT JOIN f0 b ON b.url = a.next),
             |f2 AS (SELECT a.url, coalesce(b.next, a.next) AS next
             |       FROM f1 a LEFT JOIN f1 b ON b.url = a.next),
             |o AS (SELECT DISTINCT url FROM e),
             |r AS (SELECT f2.url, f2.next AS final
             |      FROM f2 LEFT JOIN o ON o.url = f2.next
             |      WHERE o.url IS NULL),
             |u AS (SELECT 'http://c2.hx/p/' || CAST(doc_id AS VARCHAR)
             |        AS url FROM documents)
             |SELECT coalesce(r.final, u.url) AS canonical,
             |       count(*) AS n_urls
             |FROM u LEFT JOIN r ON r.url = u.url
             |GROUP BY coalesce(r.final, u.url)
             |HAVING count(*) > 1
             |ORDER BY canonical""".stripMargin),
      doc = "redirect-canonical unification: aliases collapse under their pointer-doubling-resolved final URL (the url-dedup upgrade 301 chains require); oracle reuses the doubling layers + alias-group count"),

    // Sitemap parse — sitemaps.org XML built per host from the
    // documents (entity-escaped query strings, lastmod omitted on
    // doc_id%9==0), parsed back by the split/regexp relational parser;
    // the oracle emits the entries straight from the plant law, so the
    // hash compare pins parse(build(x)) == x including entity decode
    // and whitespace trim.
    Q("doc_sitemap_urls",
      (s, dir) => {
        import graft.operators.CrawlPipeline
        val docs = Tables.documents(s, dir)
        val entry = concat(lit("<url><loc> http://h"),
          pmod(col("doc_id"), lit(5)), lit(".sx/p/"), col("doc_id"),
          lit("?a=1&amp;b=2 </loc>"),
          when(pmod(col("doc_id"), lit(9)) =!= 0,
            concat(lit("<lastmod>"),
              date_format(expr("timestamp'2026-01-01 00:00:00' + " +
                "make_dt_interval(0, 0, (doc_id * 13) % 1000, 0)"),
                "yyyy-MM-dd'T'HH:mm:ss'Z'"),
              lit("</lastmod>"))).otherwise(lit("")),
          lit("</url>"))
        val sitemaps = docs
          .groupBy(concat(lit("h"), pmod(col("doc_id"), lit(5)),
            lit(".sx")).as("host"))
          .agg(concat(lit("<?xml version=\"1.0\"?><urlset>"),
            array_join(collect_list(entry), "\n"),
            lit("</urlset>")).as("xml"))
        CrawlPipeline.sitemapEntries(sitemaps, "xml")
          .select(col("host"), col("url"),
            date_format(col("lastmod"), "yyyy-MM-dd HH:mm:ss").as("lastmod"))
          .orderBy(col("url"))
      },
      Some("""SELECT 'h' || CAST(doc_id % 5 AS VARCHAR) || '.sx' AS host,
             |       'http://h' || CAST(doc_id % 5 AS VARCHAR) || '.sx/p/'
             |         || CAST(doc_id AS VARCHAR) || '?a=1&b=2' AS url,
             |       CASE WHEN doc_id % 9 <> 0 THEN
             |         strftime(TIMESTAMP '2026-01-01 00:00:00'
             |           + to_minutes(CAST(doc_id * 13 % 1000 AS BIGINT)),
             |           '%Y-%m-%d %H:%M:%S') END AS lastmod
             |FROM documents
             |ORDER BY url""".stripMargin),
      doc = "sitemap XML parse: per-<url> loc + optional lastmod via split/regexp built-ins with entity decode; build->parse round trip oracled from the plant law"),

    // The RE-CRAWL SCHEDULE — sitemap declarations diffed against the
    // last crawl: new / stale / fresh / unlisted per URL. Both sides
    // reduce to narrow (url, ts) relations before the full-outer join
    // (the crawlDiff bound: urls x ~16 bytes moves, never payloads).
    // Plant: doc_id%13==0 missing from the sitemap (unlisted),
    // %7==0 never fetched (new), %9==0 declares no lastmod (fresh by
    // "nothing says it changed"), else %3==0 postdates the fetch
    // (stale) and the rest predate it (fresh).
    Q("doc_recrawl_schedule",
      (s, dir) => {
        import graft.operators.CrawlPipeline
        val docs = Tables.documents(s, dir)
        def url = concat(lit("http://r.hx/p/"), col("doc_id"))
        val sm = docs.filter(pmod(col("doc_id"), lit(13)) =!= 0)
          .select(url.as("url"),
            when(pmod(col("doc_id"), lit(9)) === 0,
              lit(null).cast("timestamp"))
              .when(pmod(col("doc_id"), lit(3)) === 0,
                lit("2026-03-01 00:00:00").cast("timestamp"))
              .otherwise(lit("2026-01-01 00:00:00").cast("timestamp"))
              .as("lastmod"))
        val cr = docs.filter(pmod(col("doc_id"), lit(7)) =!= 0)
          .select(url.as("url"),
            lit("2026-02-01 00:00:00").cast("timestamp").as("fetch_ts"))
        CrawlPipeline.recrawlSchedule(sm, cr)
          .select(col("url"), col("verdict"))
          .orderBy(col("url"))
      },
      Some("""WITH sm AS (
             |  SELECT 'http://r.hx/p/' || CAST(doc_id AS VARCHAR) AS url,
             |         doc_id
             |  FROM documents WHERE doc_id % 13 <> 0),
             |cr AS (
             |  SELECT 'http://r.hx/p/' || CAST(doc_id AS VARCHAR) AS url
             |  FROM documents WHERE doc_id % 7 <> 0)
             |SELECT coalesce(sm.url, cr.url) AS url,
             |       CASE WHEN cr.url IS NULL THEN 'new'
             |            WHEN sm.url IS NULL THEN 'unlisted'
             |            WHEN sm.doc_id % 9 = 0 THEN 'fresh'
             |            WHEN sm.doc_id % 3 = 0 THEN 'stale'
             |            ELSE 'fresh' END AS verdict
             |FROM sm FULL OUTER JOIN cr ON cr.url = sm.url
             |ORDER BY url""".stripMargin),
      doc = "re-crawl schedule: sitemap lastmod vs last fetch -> new/stale/fresh/unlisted per URL; narrow (url, ts) relations full-outer joined, the crawlDiff byte bound; date-compare verdicts oracled from the plant law"),

    // The LIVE re-crawl trigger (batch twin of
    // CrawlPipeline.recrawlScheduleStream, whose stream ≡ batch pin
    // lives in CrawlPipelineSpec): each declared sitemap entry judged
    // on arrival against the previous crawl's broadcast (url,
    // fetch_ts) relation — new/stale/fresh, stateless; `unlisted` is
    // inherently an end-of-inventory verdict and stays with the batch
    // doc_recrawl_schedule (the crawlDiff `gone` split). Same plant
    // law as doc_recrawl_schedule.
    Q("doc_recrawl_schedule_live",
      (s, dir) => {
        import graft.operators.CrawlPipeline
        val docs = Tables.documents(s, dir)
        def url = concat(lit("http://r.hx/p/"), col("doc_id"))
        val sm = docs.filter(pmod(col("doc_id"), lit(13)) =!= 0)
          .select(url.as("url"),
            when(pmod(col("doc_id"), lit(9)) === 0,
              lit(null).cast("timestamp"))
              .when(pmod(col("doc_id"), lit(3)) === 0,
                lit("2026-03-01 00:00:00").cast("timestamp"))
              .otherwise(lit("2026-01-01 00:00:00").cast("timestamp"))
              .as("lastmod"))
        val cr = docs.filter(pmod(col("doc_id"), lit(7)) =!= 0)
          .select(url.as("url"),
            lit("2026-02-01 00:00:00").cast("timestamp").as("fetch_ts"))
        CrawlPipeline.recrawlScheduleStream(sm, cr)
          .select(col("url"), col("verdict"))
          .orderBy(col("url"))
      },
      Some("""WITH sm AS (
             |  SELECT 'http://r.hx/p/' || CAST(doc_id AS VARCHAR) AS url,
             |         doc_id
             |  FROM documents WHERE doc_id % 13 <> 0),
             |cr AS (
             |  SELECT 'http://r.hx/p/' || CAST(doc_id AS VARCHAR) AS url
             |  FROM documents WHERE doc_id % 7 <> 0)
             |SELECT sm.url,
             |       CASE WHEN cr.url IS NULL THEN 'new'
             |            WHEN sm.doc_id % 9 = 0 THEN 'fresh'
             |            WHEN sm.doc_id % 3 = 0 THEN 'stale'
             |            ELSE 'fresh' END AS verdict
             |FROM sm LEFT JOIN cr ON cr.url = sm.url
             |ORDER BY sm.url""".stripMargin),
      doc = "live re-crawl trigger (batch twin of the stream-static form): per-entry new/stale/fresh against the previous crawl's broadcast fetch-time relation, stateless"),

    // BFS crawl depth — hop distance from the seed host over the link
    // graph (seeds = 0, their outlink targets = 1, …): the depth cap
    // crawl schedulers enforce and the page-quality prior pipelines
    // key on. Exact unit-weight shortest paths; the loop discipline is
    // pageRankInt's (frontier joins edges per round, never the whole
    // visited set). 101 hosts, two out-edge families (3id+1, 7id+2)
    // so the BFS tree branches; the oracle replays the rounds as
    // unrolled frontier/visited layers.
    Q("doc_crawl_depth",
      (s, dir) => {
        import graft.operators.LinkGraph
        import s.implicits._
        val docs = Tables.documents(s, dir)
        def host(e: org.apache.spark.sql.Column) =
          concat(lit("h"), pmod(e, lit(101)))
        val edges = docs.select(host(col("doc_id")).as("src"),
            host(col("doc_id") * 3 + 1).as("dst"))
          .unionByName(docs.select(host(col("doc_id")).as("src"),
            host(col("doc_id") * 7 + 2).as("dst")))
        LinkGraph.bfsDepth(edges, "src", "dst",
            Seq("h0").toDF("node"), maxDepth = 3)
          .orderBy(col("node"))
      },
      Some("""WITH e AS (
             |  SELECT 'h' || CAST(doc_id % 101 AS VARCHAR) AS src,
             |         'h' || CAST((3*doc_id+1) % 101 AS VARCHAR) AS dst
             |  FROM documents
             |  UNION
             |  SELECT 'h' || CAST(doc_id % 101 AS VARCHAR),
             |         'h' || CAST((7*doc_id+2) % 101 AS VARCHAR)
             |  FROM documents),
             |v0 AS (SELECT 'h0' AS node, CAST(0 AS BIGINT) AS depth),
             |n1 AS (SELECT DISTINCT e.dst AS node
             |       FROM e JOIN v0 ON e.src = v0.node
             |       WHERE e.dst NOT IN (SELECT node FROM v0)),
             |v1 AS (SELECT * FROM v0
             |       UNION ALL SELECT node, CAST(1 AS BIGINT) FROM n1),
             |n2 AS (SELECT DISTINCT e.dst AS node
             |       FROM e JOIN n1 ON e.src = n1.node
             |       WHERE e.dst NOT IN (SELECT node FROM v1)),
             |v2 AS (SELECT * FROM v1
             |       UNION ALL SELECT node, CAST(2 AS BIGINT) FROM n2),
             |n3 AS (SELECT DISTINCT e.dst AS node
             |       FROM e JOIN n2 ON e.src = n2.node
             |       WHERE e.dst NOT IN (SELECT node FROM v2)),
             |v3 AS (SELECT * FROM v2
             |       UNION ALL SELECT node, CAST(3 AS BIGINT) FROM n3)
             |SELECT node, depth FROM v3 ORDER BY node""".stripMargin),
      doc = "BFS crawl depth from seed hosts: exact unit-weight hop distance, frontier-joins-edges rounds with early drain; oracle replays the rounds as unrolled frontier/visited layers"),

    // Frontier discovery — which discovered URLs were never crawled,
    // via the BLOOM-PREFILTERED exact form: the crawled set broadcasts
    // as ~10 bits/URL, definite-new URLs pass map-side with no
    // shuffle, and only mightContain survivors (hits + the ~2% fp
    // fraction) pay the exact anti-join. The result is EXACT (no
    // false negatives, positives verified), so the plain anti-join
    // oracle pins the whole path including the fp cleanup.
    Q("doc_frontier_discovery",
      (s, dir) => {
        import graft.operators.LinkGraph
        val docs = Tables.documents(s, dir)
        val discovered = docs.select(
          concat(lit("http://f.hx/p/"),
            pmod(col("doc_id") * 3 + 1, lit(701))).as("url"))
        val crawled = docs.filter(pmod(col("doc_id"), lit(2)) === 0)
          .select(concat(lit("http://f.hx/p/"),
            pmod(col("doc_id"), lit(701))).as("url"))
        LinkGraph.frontierNewUrls(discovered, crawled, useBloom = true,
            expectedCrawled = 100000L)
          .orderBy(col("url"))
      },
      Some("""SELECT DISTINCT 'http://f.hx/p/'
             |         || CAST((3*doc_id+1) % 701 AS VARCHAR) AS url
             |FROM documents
             |EXCEPT
             |SELECT DISTINCT 'http://f.hx/p/'
             |         || CAST(doc_id % 701 AS VARCHAR) AS url
             |FROM documents WHERE doc_id % 2 = 0
             |ORDER BY url""".stripMargin),
      doc = "frontier discovery: never-crawled URLs via Bloom prefilter (broadcast bits, map-side definite-new pass) + exact anti-join fp cleanup; exact result pinned by the plain anti-join oracle"),

    // Sitemap DISCOVERY end-to-end — the loop robots.txt closes:
    // `Sitemap:` directives (GLOBAL, outside agent groups — one host
    // declares two, odd hosts only one) name which sitemap files get
    // fetched, only DECLARED sitemaps' bodies parse, and their
    // entries become the URL inventory. Undeclared map-b files on odd
    // hosts exist but are never fetched — their URLs must NOT appear.
    Q("doc_sitemap_discovery",
      (s, dir) => {
        import graft.operators.{CrawlPipeline, Robots}
        val docsH = Tables.documents(s, dir)
          .withColumn("h", pmod(col("doc_id"), lit(5)))
        val robots = docsH.select(col("h")).distinct().select(
          concat(lit("h"), col("h"), lit(".rs")).as("host"),
          concat(lit("User-agent: *\nDisallow: /x\nSitemap: http://h"),
            col("h"), lit(".rs/map-a.xml"),
            when(pmod(col("h"), lit(2)) === 0,
              concat(lit("\nsitemap: http://h"), col("h"),
                lit(".rs/map-b.xml"))).otherwise(lit(""))).as("text"))
        val declared = Robots.parseSitemaps(robots, "host", "text")
        val entry = concat(lit("<url><loc>http://h"), col("h"),
          lit(".rs/p/"), col("doc_id"), lit("</loc></url>"))
        val bodies = docsH
          .withColumn("sm", concat(lit("http://h"), col("h"),
            lit(".rs/map-"),
            when(pmod(col("doc_id"), lit(2)) === 0, lit("b"))
              .otherwise(lit("a")), lit(".xml")))
          .groupBy(col("sm"))
          .agg(concat(lit("<urlset>"), array_join(collect_list(entry), ""),
            lit("</urlset>")).as("xml"))
        val fetched = declared
          .join(bodies, declared("sitemap_url") === bodies("sm"))
          .select(col("host"), col("sitemap_url"), col("xml"))
        CrawlPipeline.sitemapEntries(fetched, "xml")
          .select(col("host"), col("sitemap_url"), col("url"))
          .orderBy(col("url"), col("sitemap_url"))
      },
      Some("""WITH sel AS (
             |  SELECT doc_id, doc_id % 5 AS h,
             |         CASE WHEN doc_id % 2 = 0 THEN 'b' ELSE 'a' END AS m
             |  FROM documents)
             |SELECT 'h' || CAST(h AS VARCHAR) || '.rs' AS host,
             |       'http://h' || CAST(h AS VARCHAR) || '.rs/map-' || m
             |         || '.xml' AS sitemap_url,
             |       'http://h' || CAST(h AS VARCHAR) || '.rs/p/'
             |         || CAST(doc_id AS VARCHAR) AS url
             |FROM sel
             |WHERE m = 'a' OR h % 2 = 0
             |ORDER BY url, sitemap_url""".stripMargin),
      doc = "sitemap discovery end-to-end: global Sitemap: directives out of robots.txt -> only declared sitemaps fetch -> entries parse into the URL inventory; undeclared files never contribute"),

    // The INDEX-file layer of the discovery loop (r15, rides the
    // sitemapIndexEntries fix): robots declares ONE sitemap per host,
    // but it is a <sitemapindex> naming two child sitemaps — the
    // big-site shape (the 50k-URL cap forces indexes). Chain:
    // parseSitemaps -> fetch index bodies -> sitemapIndexEntries
    // (child URLs; the old parser would have leaked the first child
    // as a bogus PAGE here) -> fetch children -> sitemapEntries ->
    // the page inventory. The oracle replays the plant law: every
    // page reachable through exactly its parity child.
    Q("doc_sitemap_index_chain",
      (s, dir) => {
        import graft.operators.{CrawlPipeline, Robots}
        val docsH = Tables.documents(s, dir)
          .withColumn("h", pmod(col("doc_id"), lit(5)))
        val hosts = docsH.select(col("h")).distinct()
        val robots = hosts.select(
          concat(lit("h"), col("h"), lit(".si")).as("host"),
          concat(lit("User-agent: *\nSitemap: http://h"), col("h"),
            lit(".si/index.xml")).as("text"))
        val declared = Robots.parseSitemaps(robots, "host", "text")
        val indexBodies = hosts.select(
          concat(lit("http://h"), col("h"), lit(".si/index.xml")).as("sm"),
          concat(lit("<sitemapindex><sitemap><loc>http://h"), col("h"),
            lit(".si/map-a.xml</loc></sitemap><sitemap><loc>http://h"),
            col("h"),
            lit(".si/map-b.xml</loc></sitemap></sitemapindex>"))
            .as("xml"))
        val fetchedIdx = declared
          .join(indexBodies, declared("sitemap_url") === indexBodies("sm"))
          .select(col("host"), col("xml"))
        val children = CrawlPipeline.sitemapIndexEntries(fetchedIdx, "xml")
          .select(col("host"), col("sitemap_url"))
        val entry = concat(lit("<url><loc>http://h"), col("h"),
          lit(".si/p/"), col("doc_id"), lit("</loc></url>"))
        val childBodies = docsH
          .withColumn("sm", concat(lit("http://h"), col("h"),
            lit(".si/map-"),
            when(pmod(col("doc_id"), lit(2)) === 0, lit("b"))
              .otherwise(lit("a")), lit(".xml")))
          .groupBy(col("sm"))
          .agg(concat(lit("<urlset>"), array_join(collect_list(entry), ""),
            lit("</urlset>")).as("xml"))
        val fetchedChildren = children
          .join(childBodies, children("sitemap_url") === childBodies("sm"))
          .select(col("host"), col("sitemap_url"), col("xml"))
        CrawlPipeline.sitemapEntries(fetchedChildren, "xml")
          .select(col("host"), col("sitemap_url"), col("url"))
          .orderBy(col("url"), col("sitemap_url"))
      },
      Some("""WITH sel AS (
             |  SELECT doc_id, doc_id % 5 AS h,
             |         CASE WHEN doc_id % 2 = 0 THEN 'b' ELSE 'a' END AS m
             |  FROM documents)
             |SELECT 'h' || CAST(h AS VARCHAR) || '.si' AS host,
             |       'http://h' || CAST(h AS VARCHAR) || '.si/map-' || m
             |         || '.xml' AS sitemap_url,
             |       'http://h' || CAST(h AS VARCHAR) || '.si/p/'
             |         || CAST(doc_id AS VARCHAR) AS url
             |FROM sel
             |ORDER BY url, sitemap_url""".stripMargin),
      doc = "sitemap INDEX chain: robots -> declared index file -> sitemapIndexEntries children -> sitemapEntries pages; every page reachable through exactly its parity child, index files contribute zero page rows"),

    // The COMPOSED re-crawl chain (round 16): every stage is
    // individually oracled above, but composition keeps catching what
    // isolation misses — so the full loop runs as ONE query whose
    // oracle replays it end to end. Robots bodies declare BOTH the
    // sitemap index and the Crawl-delay (one artifact feeds two
    // consumers, as on a real host); discovery walks robots ->
    // sitemapindex -> parity child sitemaps -> page entries with the
    // doc_recrawl_schedule lastmod law; recrawlSchedule diffs against
    // the %7 crawled set; the new ∪ stale fetch set joins
    // frontierSlots' integer-exact priorities (pageRankInt over the
    // %5 host graph, delays from the SAME robots bodies — h4's
    // junk "Crawl-delay: 0" and h2's missing directive both fall to
    // the default, spec'd RFC behavior). Output: the prioritized
    // fetch list a scheduler would drain.
    Q("doc_recrawl_chain",
      (s, dir) => {
        import graft.operators.{CrawlPipeline, LinkGraph, Robots}
        val docs = Tables.documents(s, dir)
          .withColumn("h", pmod(col("doc_id"), lit(5)))
        val hosts = docs.select(col("h")).distinct()
        val hostc = concat(lit("h"), col("h"), lit(".rc"))
        val delayLine = element_at(map(
          lit(0), lit("Crawl-delay: 10\n"), lit(1), lit("Crawl-delay: 2\n"),
          lit(2), lit(""), lit(3), lit("Crawl-delay: 7\n"),
          lit(4), lit("Crawl-delay: 0\n")), col("h").cast("int"))
        val robots = hosts.select(hostc.as("host"), col("h"),
          concat(lit("User-agent: *\n"), delayLine,
            lit("Sitemap: http://h"), col("h"), lit(".rc/index.xml"))
            .as("text"))
        val declared = Robots.parseSitemaps(robots, "host", "text")
        val indexBodies = hosts.select(
          concat(lit("http://h"), col("h"), lit(".rc/index.xml")).as("sm"),
          concat(lit("<sitemapindex><sitemap><loc>http://h"), col("h"),
            lit(".rc/map-a.xml</loc></sitemap><sitemap><loc>http://h"),
            col("h"),
            lit(".rc/map-b.xml</loc></sitemap></sitemapindex>")).as("xml"))
        val children = CrawlPipeline.sitemapIndexEntries(
          declared.join(indexBodies,
              declared("sitemap_url") === indexBodies("sm"))
            .select(col("host"), col("xml")), "xml")
          .select(col("host"), col("sitemap_url"))
        val entry = concat(lit("<url><loc>http://h"), col("h"),
          lit(".rc/p/"), col("doc_id"), lit("</loc>"),
          when(pmod(col("doc_id"), lit(9)) === 0, lit(""))
            .when(pmod(col("doc_id"), lit(3)) === 0,
              lit("<lastmod>2026-03-01 00:00:00</lastmod>"))
            .otherwise(lit("<lastmod>2026-01-01 00:00:00</lastmod>")),
          lit("</url>"))
        val childBodies = docs.filter(pmod(col("doc_id"), lit(13)) =!= 0)
          .withColumn("sm", concat(lit("http://h"), col("h"),
            lit(".rc/map-"),
            when(pmod(col("doc_id"), lit(2)) === 0, lit("b"))
              .otherwise(lit("a")), lit(".xml")))
          .groupBy(col("sm"))
          .agg(concat(lit("<urlset>"), array_join(collect_list(entry), ""),
            lit("</urlset>")).as("xml"))
        val pages = CrawlPipeline.sitemapEntries(
          children.join(childBodies,
              children("sitemap_url") === childBodies("sm"))
            .select(col("host"), col("xml")), "xml")
          .select(col("host"), col("url"), col("lastmod"))
        val crawled = docs.filter(pmod(col("doc_id"), lit(7)) =!= 0)
          .select(concat(lit("http://h"), col("h"), lit(".rc/p/"),
              col("doc_id")).as("url"),
            lit("2026-02-01 00:00:00").cast("timestamp").as("fetch_ts"))
        val todo = CrawlPipeline.recrawlSchedule(
            pages.select(col("url"), col("lastmod")), crawled)
          .filter(col("verdict").isin("new", "stale"))
          .join(pages.select(col("host"), col("url")), Seq("url"))
        val edges = docs.select(hostc.as("src"),
          concat(lit("h"), pmod(col("doc_id") * 3 + 1, lit(5)),
            lit(".rc")).as("dst"))
        val frontier = CrawlPipeline.frontierSlots(
          LinkGraph.pageRankInt(edges, "src", "dst", iterations = 2),
          Robots.parseCrawlDelay(robots, "host", "text", "*"))
        todo.join(frontier, Seq("host"))
          .select(col("url"), col("verdict"), col("host"), col("pr"),
            col("slots_per_min"), col("priority"))
          .orderBy(col("priority").desc, col("url"))
      },
      Some("""WITH sm AS (
             |  SELECT 'http://h' || CAST(doc_id % 5 AS VARCHAR)
             |           || '.rc/p/' || CAST(doc_id AS VARCHAR) AS url,
             |         'h' || CAST(doc_id % 5 AS VARCHAR) || '.rc' AS host,
             |         doc_id
             |  FROM documents WHERE doc_id % 13 <> 0),
             |cr AS (
             |  SELECT 'http://h' || CAST(doc_id % 5 AS VARCHAR)
             |           || '.rc/p/' || CAST(doc_id AS VARCHAR) AS url
             |  FROM documents WHERE doc_id % 7 <> 0),
             |todo AS (
             |  SELECT sm.url, sm.host,
             |         CASE WHEN cr.url IS NULL THEN 'new'
             |              WHEN sm.doc_id % 9 = 0 THEN 'fresh'
             |              WHEN sm.doc_id % 3 = 0 THEN 'stale'
             |              ELSE 'fresh' END AS verdict
             |  FROM sm LEFT JOIN cr ON cr.url = sm.url),
             |e AS (
             |  SELECT DISTINCT
             |         'h' || CAST(doc_id % 5 AS VARCHAR) || '.rc' AS src,
             |         'h' || CAST((3*doc_id+1) % 5 AS VARCHAR) || '.rc' AS dst
             |  FROM documents),
             |o AS (SELECT src, count(*) AS outd FROM e GROUP BY src),
             |n AS (SELECT DISTINCT src AS node FROM e
             |      UNION SELECT DISTINCT dst FROM e),
             |r0 AS (SELECT node, CAST(1000000000000 AS HUGEINT) AS pr FROM n),
             |s1 AS (SELECT e.dst AS node, sum(r0.pr // o.outd) AS s
             |       FROM e JOIN o USING (src) JOIN r0 ON r0.node = e.src
             |       GROUP BY e.dst),
             |r1 AS (SELECT n.node,
             |              150000000000 + (85 * coalesce(s1.s, 0)) // 100 AS pr
             |       FROM n LEFT JOIN s1 USING (node)),
             |s2 AS (SELECT e.dst AS node, sum(r1.pr // o.outd) AS s
             |       FROM e JOIN o USING (src) JOIN r1 ON r1.node = e.src
             |       GROUP BY e.dst),
             |r2 AS (SELECT n.node,
             |              150000000000 + (85 * coalesce(s2.s, 0)) // 100 AS pr
             |       FROM n LEFT JOIN s2 USING (node)),
             |d AS (SELECT * FROM (VALUES
             |        ('h0.rc', CAST(10 AS BIGINT)),
             |        ('h1.rc', CAST(2 AS BIGINT)),
             |        ('h3.rc', CAST(7 AS BIGINT))) AS t(host, delay_s)),
             |f AS (SELECT r2.node AS host, CAST(r2.pr AS BIGINT) AS pr,
             |             coalesce(d.delay_s, 1) AS delay_s
             |      FROM r2 LEFT JOIN d ON d.host = r2.node)
             |SELECT t.url, t.verdict, t.host, f.pr,
             |       (60 + f.delay_s - 1) // f.delay_s AS slots_per_min,
             |       CAST(f.pr // ((60 + f.delay_s - 1) // f.delay_s)
             |            AS BIGINT) AS priority
             |FROM todo t JOIN f USING (host)
             |WHERE t.verdict IN ('new', 'stale')
             |ORDER BY priority DESC, url""".stripMargin),
      doc = "the composed re-crawl chain: robots (sitemap declaration + Crawl-delay from ONE body) -> sitemapindex -> child sitemaps -> page inventory with lastmod -> recrawlSchedule vs the crawled set -> new ∪ stale joined to frontierSlots' integer-exact slot priorities; oracle replays the whole loop"),

    // Per-registered-domain rollup — the unit RefinedWeb/FineWeb-style
    // pipelines cap and calibrate on (www.example.co.uk and
    // a.b.example.co.uk are ONE publisher). registeredDomain is a
    // scan-fused built-in chain (split + tail slices + a suffix-list
    // membership), the rollup one partial-aggregated groupBy; the
    // oracle recomputes the eTLD+1 from the plant law directly, so the
    // hash compare pins the heuristic on all three host shapes.
    Q("doc_domain_rollup",
      (s, dir) => {
        import graft.functions.TextFunctions
        val docs = Tables.documents(s, dir)
        val id = col("doc_id")
        val host = when(pmod(id, lit(3)) === 0,
            concat(lit("www.s"), pmod(id, lit(7)), lit(".co.uk")))
          .when(pmod(id, lit(3)) === 1,
            concat(lit("sub"), pmod(id, lit(5)), lit(".s"), pmod(id, lit(7)),
              lit(".com")))
          .otherwise(concat(lit("s"), pmod(id, lit(7)), lit(".net")))
        docs.select(host.as("host"))
          .withColumn("domain",
            TextFunctions.registeredDomain(col("host")))
          .groupBy(col("domain"))
          .agg(count(lit(1)).as("n_docs"),
            countDistinct(col("host")).as("n_hosts"))
          .orderBy(col("domain"))
      },
      Some("""WITH r AS (
             |  SELECT CASE
             |    WHEN doc_id % 3 = 0 THEN 'www.s' || CAST(doc_id % 7 AS VARCHAR) || '.co.uk'
             |    WHEN doc_id % 3 = 1 THEN 'sub' || CAST(doc_id % 5 AS VARCHAR) || '.s' || CAST(doc_id % 7 AS VARCHAR) || '.com'
             |    ELSE 's' || CAST(doc_id % 7 AS VARCHAR) || '.net' END AS host,
             |  CASE
             |    WHEN doc_id % 3 = 0 THEN 's' || CAST(doc_id % 7 AS VARCHAR) || '.co.uk'
             |    WHEN doc_id % 3 = 1 THEN 's' || CAST(doc_id % 7 AS VARCHAR) || '.com'
             |    ELSE 's' || CAST(doc_id % 7 AS VARCHAR) || '.net' END AS domain
             |  FROM documents)
             |SELECT domain, count(*) AS n_docs,
             |       count(DISTINCT host) AS n_hosts
             |FROM r GROUP BY domain ORDER BY domain""".stripMargin),
      doc = "per-registered-domain rollup: eTLD+1 heuristic (last-2 labels, last-3 over the multi-part suffix list) as scan-fused built-ins + one partial-aggregated groupBy; oracle recomputes the domain from the plant law"),

    // MIRROR-HOST detection (exact form): host pairs whose content-key
    // sets are near-identical — the hosts a crawler collapses to one
    // frontier entry instead of fetching N times. The plant serves one
    // doc slice from two hosts verbatim (m1/m2 — Jaccard 1.0), two
    // hosts with a 2-of-4-slice overlap (p1/p2 — Jaccard exactly 0.5,
    // the inclusive threshold boundary), and a solo long tail whose
    // pages live on one host each (no pair reaches the join). The key
    // is the doc id (production: crawlHashes' 8-byte payload hash);
    // payloads never shuffle either way.
    Q("doc_mirror_hosts",
      (s, dir) => {
        import graft.operators.CrawlPipeline
        val m = pmod(col("doc_id"), lit(10))
        val hosts = when(m < 3, array(lit("m1.example"), lit("m2.example")))
          .when(m === 3, array(lit("p1.example")))
          .when(m.isin(4, 5), array(lit("p1.example"), lit("p2.example")))
          .when(m === 6, array(lit("p2.example")))
          .otherwise(array(concat(lit("s"),
            pmod(col("doc_id"), lit(7)).cast("string"), lit(".example"))))
        val pages = Tables.documents(s, dir)
          .select(explode(hosts).as("host"), col("doc_id"))
        CrawlPipeline.mirrorHosts(pages, "host", "doc_id", threshold = 0.5)
          .orderBy(col("host_a"), col("host_b"))
      },
      Some(mirrorOracle),
      doc = "mirror-host detection (exact): per-host distinct content-key sets -> key self-join -> exact Jaccard; planted full mirror (1.0) and boundary pair (0.5) both surface, solo tail never pairs"),

    // The 10^8-host scale path for the same contract: MinHash
    // signatures per host (32 partial-aggregable mins in ONE groupBy —
    // no collect_set, whale-host safe) + LSH banding for candidates +
    // exact verify of candidates only. Same oracle as the exact form,
    // so LSH ≡ exact is itself the assertion, in-catalog at
    // sf0.01/sf0.1 and spec-pinned on the fixture. Banded at r=1
    // (b=32): the planted boundary pair sits AT the 0.5 threshold,
    // where r=2 banding would miss with P ≈ (1−0.25)¹⁶ ≈ 1% — a
    // hash-exact oracle needs P(miss) = (1−0.5)³² ≈ 2e-10; false
    // candidates from single-coordinate collisions are absorbed by
    // the exact verify. Production tunes (b, r) to its threshold.
    Q("doc_mirror_hosts_lsh",
      (s, dir) => {
        import graft.operators.CrawlPipeline
        val m = pmod(col("doc_id"), lit(10))
        val hosts = when(m < 3, array(lit("m1.example"), lit("m2.example")))
          .when(m === 3, array(lit("p1.example")))
          .when(m.isin(4, 5), array(lit("p1.example"), lit("p2.example")))
          .when(m === 6, array(lit("p2.example")))
          .otherwise(array(concat(lit("s"),
            pmod(col("doc_id"), lit(7)).cast("string"), lit(".example"))))
        val pages = Tables.documents(s, dir)
          .select(explode(hosts).as("host"), col("doc_id"))
        CrawlPipeline.mirrorHostsLsh(pages, "host", "doc_id",
            threshold = 0.5, bands = 32, rowsPerBand = 1)
          .orderBy(col("host_a"), col("host_b"))
      },
      Some(mirrorOracle),
      doc = "mirror-host detection at scale: per-host MinHash via groupBy-min (no set materialization) + LSH banding + exact verify; hash-equals the exact form's oracle on the planted corpus"),

    // Mirror pairs composed into COLLAPSE GROUPS: star-contraction CC
    // over the pair relation -> (host, canonical) — the relation a
    // frontier consults to route every alias of a publisher to one
    // politeness budget. The plant upgrades the full mirror to a
    // 3-host clique (c1/c2/c3 — CC must merge overlapping pairs, not
    // just echo them) and keeps the boundary pair (exactly J=0.5).
    // The oracle closes the same pair relation with a recursive CTE
    // (the dedup_cc_* discipline, on string nodes).
    Q("doc_mirror_clusters",
      (s, dir) => mirrorCanon(s, dir).orderBy(col("host")),
      Some("""WITH RECURSIVE pages AS (
             |  SELECT DISTINCT host, doc_id
             |  FROM (SELECT unnest(CASE
             |          WHEN doc_id % 10 < 3
             |            THEN ['c1.example', 'c2.example', 'c3.example']
             |          WHEN doc_id % 10 = 3 THEN ['p1.example']
             |          WHEN doc_id % 10 IN (4, 5)
             |            THEN ['p1.example', 'p2.example']
             |          WHEN doc_id % 10 = 6 THEN ['p2.example']
             |          ELSE ['s' || CAST(doc_id % 7 AS VARCHAR) || '.example']
             |        END) AS host, doc_id
             |        FROM documents)),
             |sz AS (SELECT host, count(*) AS sz FROM pages GROUP BY host),
             |inter AS (SELECT a.host AS host_a, b.host AS host_b,
             |                 count(*) AS inter
             |          FROM pages a JOIN pages b
             |            ON a.doc_id = b.doc_id AND a.host < b.host
             |          GROUP BY 1, 2),
             |jp AS (SELECT host_a, host_b FROM inter
             |       JOIN sz sa ON host_a = sa.host
             |       JOIN sz sb ON host_b = sb.host
             |       WHERE inter / (sa.sz + sb.sz - inter) >= 0.5),
             |edges AS (SELECT host_a AS u, host_b AS v FROM jp
             |          UNION SELECT host_b, host_a FROM jp),
             |reach(id, r) AS (
             |  SELECT u, v FROM edges
             |  UNION
             |  SELECT e.u, r.r FROM edges e JOIN reach r ON r.id = e.v),
             |comp AS (SELECT id AS host, least(id, min(r)) AS canonical
             |         FROM reach GROUP BY id)
             |SELECT host, canonical FROM comp ORDER BY host""".stripMargin),
      doc = "mirror collapse groups: exact mirror pairs -> star-contraction CC -> (host, canonical); a 3-host clique merges through overlapping pairs, recursive-CTE closure oracle"),

    // Robots-cache FRESHNESS audit (RFC 9309 §2.4: cached robots.txt
    // may be used for up to 24 hours): every page fetch pairs with the
    // LATEST robots fetch at-or-before it on the same host — the
    // feature-store as-of join applied to crawl governance. Verdicts:
    // `never` (no robots fetch preceded the page — h5/h6 never fetch,
    // and every host's pages before its first robots fetch), `fresh`
    // (snapshot ≤ 24 h old), `stale` (older — the crawler broke the
    // cache rule). Two hosts re-fetch robots mid-crawl, so the as-of
    // must pick the newer snapshot exactly at the refetch boundary.
    // One shuffle of pages+robots keyed by host (AsofJoin's
    // union+carry-forward form), no row explosion.
    Q("doc_robots_cache_age",
      (s, dir) => {
        import graft.operators.AsofJoin
        val docs = Tables.documents(s, dir)
        val base = 1767225600L // 2026-01-01T00:00:00Z
        val pages = docs.select(col("doc_id"),
          concat(lit("h"), pmod(col("doc_id"), lit(7)).cast("string"))
            .as("host"),
          (lit(base) + pmod(col("doc_id"), lit(50)) * 3600L).as("t"))
        val ks = docs.select(pmod(col("doc_id"), lit(7)).as("k"))
          .distinct().filter(col("k") < 5)
        def hostOf(k: org.apache.spark.sql.Column) =
          concat(lit("h"), k.cast("string"))
        val robots = ks.select(hostOf(col("k")).as("host"),
            (lit(base) + col("k") * 36000L).as("rt"))
          .unionByName(ks.filter(col("k") < 2)
            .select(hostOf(col("k")).as("host"),
              (lit(base) + col("k") * 36000L + 108000L).as("rt")))
        AsofJoin.asof(pages, robots, key = "host", probeTime = "t",
            buildTime = "rt", payload = Seq.empty,
            buildTimeAs = Some("robots_t"), inner = false)
          .withColumn("verdict",
            when(col("robots_t").isNull, lit("never"))
              .when(col("t") - col("robots_t") <= 86400L, lit("fresh"))
              .otherwise(lit("stale")))
          .orderBy(col("doc_id"))
      },
      Some("""WITH p AS (SELECT doc_id,
             |             'h' || CAST(doc_id % 7 AS VARCHAR) AS host,
             |             CAST(1767225600 + (doc_id % 50) * 3600
             |               AS BIGINT) AS t
             |           FROM documents),
             |k AS (SELECT DISTINCT doc_id % 7 AS k FROM documents
             |      WHERE doc_id % 7 < 5),
             |b AS (SELECT 'h' || CAST(k AS VARCHAR) AS host,
             |             CAST(1767225600 + k * 36000 AS BIGINT) AS rt
             |      FROM k
             |      UNION ALL
             |      SELECT 'h' || CAST(k AS VARCHAR),
             |             CAST(1767225600 + k * 36000 + 108000 AS BIGINT)
             |      FROM k WHERE k < 2)
             |SELECT p.doc_id, p.host, p.t, b.rt AS robots_t,
             |       CASE WHEN b.rt IS NULL THEN 'never'
             |            WHEN p.t - b.rt <= 86400 THEN 'fresh'
             |            ELSE 'stale' END AS verdict
             |FROM p ASOF LEFT JOIN b
             |  ON p.host = b.host AND p.t >= b.rt
             |ORDER BY p.doc_id""".stripMargin),
      doc = "robots-cache freshness audit (RFC 9309 24 h rule): page fetches as-of-join the latest preceding robots fetch per host — never/fresh/stale verdicts incl. the refetch boundary; single-shuffle carry-forward, DuckDB ASOF LEFT JOIN oracle"),

    // WARC revisit planning (ISO 28500 §6.7.2 identical-payload-digest
    // — how Common Crawl stores re-fetched duplicates: headers-only
    // `revisit` records pointing at the first archived copy). The
    // plant gives 500/5000 fetches only 97 distinct payloads, so the
    // archive keeps 97 full responses + the rest as revisits. The
    // digest column stays engine-side (SHA-1 per the WARC profile —
    // collision-safe at archive scale; the oracle groups on
    // the payload text itself — same groups, no hash to mirror);
    // payload bytes never shuffle, one partial-aggregable min(struct)
    // per digest picks the canonical.
    Q("doc_warc_revisit",
      (s, dir) => {
        import graft.operators.CrawlPipeline
        val base = 1767225600L
        val records = Tables.documents(s, dir).select(
          col("doc_id").as("record_id"),
          lit("response").as("record_type"),
          concat(lit("http://h"), pmod(col("doc_id"), lit(7)).cast("string"),
            lit(".rv/p/"), col("doc_id").cast("string")).as("target_uri"),
          date_format(timestamp_seconds(lit(base) + col("doc_id")),
            "yyyy-MM-dd'T'HH:mm:ss'Z'").as("warc_date"),
          encode(concat(lit("content-"),
            pmod(col("doc_id"), lit(97)).cast("string")), "UTF-8")
            .as("payload"))
        CrawlPipeline.revisitRecords(records)
          .select(col("id"), col("url"), col("t"), col("kind"),
            col("refers_to"))
          .orderBy(col("id"))
      },
      Some("""WITH r AS (SELECT doc_id AS id,
             |             'http://h' || CAST(doc_id % 7 AS VARCHAR)
             |               || '.rv/p/' || CAST(doc_id AS VARCHAR) AS url,
             |             CAST(1767225600 + doc_id AS BIGINT) AS t,
             |             'content-' || CAST(doc_id % 97 AS VARCHAR) AS body
             |           FROM documents),
             |c AS (SELECT body, min(id) AS cid FROM r GROUP BY body)
             |SELECT r.id, r.url, r.t,
             |       CASE WHEN r.id = c.cid THEN 'response'
             |            ELSE 'revisit' END AS kind,
             |       CASE WHEN r.id = c.cid THEN NULL
             |            ELSE c.cid END AS refers_to
             |FROM r JOIN c USING (body)
             |ORDER BY r.id""".stripMargin),
      doc = "WARC revisit planning (identical-payload-digest profile): first archived copy stays a response, later identical payloads become headers-only revisit records with WARC-Refers-To; digests shuffle, payloads never"),

    // NEAR-mirror hosts: the template-drifted mirrors exact payload
    // keys can never match — n2 serves every n1 page with a stamp
    // appended (the scraper-clone shape), so page pairs match at
    // Jaccard >= 0.8 while the payload hashes all differ. Since round
    // 15 this runs the DEFAULT (banded MinHash+LSH candidate stage,
    // exact verify — the web-scale shape, 42 s exact vs 11 s banded at
    // the sf10 probe) against the exact-Jaccard oracle; the exact
    // prefix-filtered form keeps its own catalog anchor below
    // (doc_mirror_hosts_near_exact, same oracle). Host score =
    // (matched_a + matched_b) / (size_a + size_b). The solo tail
    // hosts share the corpus' own planted near-dup clusters, so some
    // cross-solo page pairs exist — their host scores stay under the
    // threshold (which the oracle recomputes, either way).
    Q("doc_mirror_hosts_near",
      (s, dir) => {
        import graft.operators.CrawlPipeline
        val docs = Tables.documents(s, dir)
        val m = pmod(col("doc_id"), lit(10))
        val n1 = docs.filter(m < 3).select(lit("n1.example").as("host"),
          (col("doc_id") * 10).as("page_id"), col("text"))
        val n2 = docs.filter(m < 3).select(lit("n2.example").as("host"),
          (col("doc_id") * 10 + 1).as("page_id"),
          concat(col("text"), lit(" v2")).as("text"))
        val solo = docs.filter(m >= 3).select(
          concat(lit("s"), pmod(col("doc_id"), lit(5)).cast("string"),
            lit(".example")).as("host"),
          (col("doc_id") * 10).as("page_id"), col("text"))
        CrawlPipeline.nearMirrorHosts(
            n1.unionByName(n2).unionByName(solo),
            "host", "page_id", "text", hostThreshold = 0.3)
          .orderBy(col("host_a"), col("host_b"))
      },
      Some("""WITH pg AS (
             |  SELECT 'n1.example' AS host, doc_id * 10 AS pid, text
             |  FROM documents WHERE doc_id % 10 < 3
             |  UNION ALL
             |  SELECT 'n2.example', doc_id * 10 + 1, text || ' v2'
             |  FROM documents WHERE doc_id % 10 < 3
             |  UNION ALL
             |  SELECT 's' || CAST(doc_id % 5 AS VARCHAR) || '.example',
             |         doc_id * 10, text
             |  FROM documents WHERE doc_id % 10 >= 3),
             |d AS (SELECT pid, string_split(text, ' ') l FROM pg),
             |sh AS (SELECT DISTINCT pid,
             |         unnest(list_transform(range(1, len(l) - 1),
             |                i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2]))
             |           AS sh
             |       FROM d),
             |cnt AS (SELECT pid, count(*) c FROM sh GROUP BY pid),
             |inter AS (SELECT a.pid id_a, b.pid id_b, count(*) i
             |          FROM sh a JOIN sh b ON a.sh = b.sh AND a.pid < b.pid
             |          GROUP BY 1, 2),
             |jp AS (SELECT id_a, id_b FROM inter
             |       JOIN cnt ca ON id_a = ca.pid
             |       JOIN cnt cb ON id_b = cb.pid
             |       WHERE i / (ca.c + cb.c - i) >= 0.8),
             |cr AS (SELECT least(pa.host, pb.host) AS host_a,
             |              greatest(pa.host, pb.host) AS host_b,
             |              CASE WHEN pa.host < pb.host THEN jp.id_a
             |                   ELSE jp.id_b END AS pma,
             |              CASE WHEN pa.host < pb.host THEN jp.id_b
             |                   ELSE jp.id_a END AS pmb
             |       FROM jp
             |       JOIN pg pa ON jp.id_a = pa.pid
             |       JOIN pg pb ON jp.id_b = pb.pid
             |       WHERE pa.host <> pb.host),
             |sz AS (SELECT host, count(*) sz FROM pg GROUP BY host),
             |agg AS (SELECT host_a, host_b,
             |          count(DISTINCT pma) ma, count(DISTINCT pmb) mb
             |        FROM cr GROUP BY 1, 2)
             |SELECT host_a, host_b, ma AS matched_a, mb AS matched_b,
             |       sa.sz AS size_a, sb.sz AS size_b,
             |       (ma + mb) / (sa.sz + sb.sz) AS score
             |FROM agg
             |JOIN sz sa ON host_a = sa.host
             |JOIN sz sb ON host_b = sb.host
             |WHERE (ma + mb) / (sa.sz + sb.sz) >= 0.3
             |ORDER BY host_a, host_b""".stripMargin),
      doc = "near-mirror hosts (template-drifted clones): banded MinHash+LSH page-pair candidates with exact Jaccard verify (the web-scale default) -> cross-host pair rollup -> symmetric matched-fraction score; catches the mirrors exact payload keys never match"),

    // The exact-pair-source anchor for the query above: identical
    // corpus, identical oracle, `lshPairs = false` — the prefix-
    // filtered exact Jaccard pair stage. Both paths hash-green against
    // ONE oracle is the banding-equality claim made observable in the
    // correctness gate, not just in a spec. EXPECTED-SLOW BY DESIGN:
    // this is the exact ANCHOR of the near-mirror family (97.8 s at
    // sf10g/100× in r18) — its scale-path twin is doc_mirror_hosts_lsh
    // above (in-class at the same scale); read the bench tail as the
    // documented anchor convention (like dedup_embedding vs _lsh:
    // 610.8 s vs 6.9 s = 88×), not a defect.
    Q("doc_mirror_hosts_near_exact",
      (s, dir) => {
        import graft.operators.CrawlPipeline
        val docs = Tables.documents(s, dir)
        val m = pmod(col("doc_id"), lit(10))
        val n1 = docs.filter(m < 3).select(lit("n1.example").as("host"),
          (col("doc_id") * 10).as("page_id"), col("text"))
        val n2 = docs.filter(m < 3).select(lit("n2.example").as("host"),
          (col("doc_id") * 10 + 1).as("page_id"),
          concat(col("text"), lit(" v2")).as("text"))
        val solo = docs.filter(m >= 3).select(
          concat(lit("s"), pmod(col("doc_id"), lit(5)).cast("string"),
            lit(".example")).as("host"),
          (col("doc_id") * 10).as("page_id"), col("text"))
        CrawlPipeline.nearMirrorHosts(
            n1.unionByName(n2).unionByName(solo),
            "host", "page_id", "text", hostThreshold = 0.3,
            lshPairs = false)
          .orderBy(col("host_a"), col("host_b"))
      },
      Some("""WITH pg AS (
             |  SELECT 'n1.example' AS host, doc_id * 10 AS pid, text
             |  FROM documents WHERE doc_id % 10 < 3
             |  UNION ALL
             |  SELECT 'n2.example', doc_id * 10 + 1, text || ' v2'
             |  FROM documents WHERE doc_id % 10 < 3
             |  UNION ALL
             |  SELECT 's' || CAST(doc_id % 5 AS VARCHAR) || '.example',
             |         doc_id * 10, text
             |  FROM documents WHERE doc_id % 10 >= 3),
             |d AS (SELECT pid, string_split(text, ' ') l FROM pg),
             |sh AS (SELECT DISTINCT pid,
             |         unnest(list_transform(range(1, len(l) - 1),
             |                i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2]))
             |           AS sh
             |       FROM d),
             |cnt AS (SELECT pid, count(*) c FROM sh GROUP BY pid),
             |inter AS (SELECT a.pid id_a, b.pid id_b, count(*) i
             |          FROM sh a JOIN sh b ON a.sh = b.sh AND a.pid < b.pid
             |          GROUP BY 1, 2),
             |jp AS (SELECT id_a, id_b FROM inter
             |       JOIN cnt ca ON id_a = ca.pid
             |       JOIN cnt cb ON id_b = cb.pid
             |       WHERE i / (ca.c + cb.c - i) >= 0.8),
             |cr AS (SELECT least(pa.host, pb.host) AS host_a,
             |              greatest(pa.host, pb.host) AS host_b,
             |              CASE WHEN pa.host < pb.host THEN jp.id_a
             |                   ELSE jp.id_b END AS pma,
             |              CASE WHEN pa.host < pb.host THEN jp.id_b
             |                   ELSE jp.id_a END AS pmb
             |       FROM jp
             |       JOIN pg pa ON jp.id_a = pa.pid
             |       JOIN pg pb ON jp.id_b = pb.pid
             |       WHERE pa.host <> pb.host),
             |sz AS (SELECT host, count(*) sz FROM pg GROUP BY host),
             |agg AS (SELECT host_a, host_b,
             |          count(DISTINCT pma) ma, count(DISTINCT pmb) mb
             |        FROM cr GROUP BY 1, 2)
             |SELECT host_a, host_b, ma AS matched_a, mb AS matched_b,
             |       sa.sz AS size_a, sb.sz AS size_b,
             |       (ma + mb) / (sa.sz + sb.sz) AS score
             |FROM agg
             |JOIN sz sa ON host_a = sa.host
             |JOIN sz sb ON host_b = sb.host
             |WHERE (ma + mb) / (sa.sz + sb.sz) >= 0.3
             |ORDER BY host_a, host_b""".stripMargin),
      doc = "near-mirror hosts, exact pair-source anchor: prefix-filtered exact Jaccard page pairs against the SAME oracle as the banded default — the banding-equality claim in the correctness gate"),

    // The revisit loop CLOSED: plan (revisitRecords) -> the
    // deduplicated archive (revisit rows hold NO payload) -> read-back
    // resolution (resolveRevisits) -> every fetch's text recovered —
    // the identity that makes storage dedup safe. The oracle rebuilds
    // each row's text from the plant law and the canonical id from the
    // per-class min, so the whole plan+resolve chain is what the hash
    // compare checks.
    Q("doc_warc_revisit_resolve",
      (s, dir) => {
        import graft.operators.CrawlPipeline
        val base = 1767225600L
        val records = Tables.documents(s, dir).select(
          col("doc_id").as("record_id"),
          lit("response").as("record_type"),
          concat(lit("http://h"), pmod(col("doc_id"), lit(7)).cast("string"),
            lit(".rr/p/"), col("doc_id").cast("string")).as("target_uri"),
          date_format(timestamp_seconds(lit(base) + col("doc_id")),
            "yyyy-MM-dd'T'HH:mm:ss'Z'").as("warc_date"),
          encode(concat(lit("content-"),
            pmod(col("doc_id"), lit(97)).cast("string")), "UTF-8")
            .as("payload"))
        val plan = CrawlPipeline.revisitRecords(records)
          .select(col("id").as("record_id"), col("kind"), col("refers_to"))
        // the deduplicated archive: revisit rows carry no payload
        val archive = records.drop("record_type").join(plan, Seq("record_id"))
          .select(col("record_id"), col("kind").as("record_type"),
            col("target_uri"),
            when(col("kind") === "response", col("payload")).as("payload"),
            col("refers_to"))
        CrawlPipeline.resolveRevisits(archive)
          .select(col("record_id").as("doc_id"),
            decode(col("payload"), "UTF-8").as("text"),
            col("resolved_from"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH c AS (SELECT doc_id % 97 AS k, min(doc_id) AS cid
             |           FROM documents GROUP BY doc_id % 97)
             |SELECT doc_id,
             |       'content-' || CAST(doc_id % 97 AS VARCHAR) AS text,
             |       CASE WHEN doc_id = cid THEN NULL ELSE cid END
             |         AS resolved_from
             |FROM documents JOIN c ON doc_id % 97 = c.k
             |ORDER BY doc_id""".stripMargin),
      doc = "revisit loop closed: plan -> payload-free revisit archive -> read-back resolution through WARC-Refers-To — every fetch's text recovered, the identity that makes storage dedup safe"),

    // Revisit-AWARE WET conversion — what the revisit plan is FOR:
    // text extraction runs once per DISTINCT payload, not once per
    // fetch (500/5000 fetches -> 97 conversions here). The canonical
    // set from revisitRecords semi-joins the records before
    // Wet.convert, so duplicate payloads never reach the HTML
    // extraction (at 100 TB that is the conversion stage's whole
    // budget: recrawl-heavy archives are mostly revisits).
    Q("doc_wet_revisit_dedup",
      (s, dir) => {
        import graft.operators.CrawlPipeline
        import graft.sources.warc.Wet
        val base = 1767225600L
        val records = Tables.documents(s, dir).select(
          concat(lit("<urn:p:"), col("doc_id"), lit(">")).as("record_id"),
          lit("response").as("record_type"),
          concat(lit("http://h"), pmod(col("doc_id"), lit(7)).cast("string"),
            lit(".wd/p/"), col("doc_id").cast("string")).as("target_uri"),
          date_format(timestamp_seconds(lit(base) + col("doc_id")),
            "yyyy-MM-dd'T'HH:mm:ss'Z'").as("warc_date"),
          lit("text/html").as("content_type"),
          encode(concat(lit("<html><body><p>shared body "),
            pmod(col("doc_id"), lit(97)).cast("string"),
            lit("</p></body></html>")), "UTF-8").as("payload"))
        val canon = CrawlPipeline.revisitRecords(records)
          .filter(col("kind") === "response")
          .select(col("id").as("record_id"))
        Wet.convert(records.join(canon, Seq("record_id"), "left_semi"))
          .select(regexp_extract(col("target_uri"), "/p/(\\d+)$", 1)
              .cast("long").as("doc_id"),
            decode(col("payload"), "UTF-8").as("text"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH c AS (SELECT CAST(min(doc_id) AS BIGINT) AS doc_id,
             |             doc_id % 97 AS k
             |           FROM documents GROUP BY doc_id % 97)
             |SELECT doc_id, 'shared body ' || CAST(k AS VARCHAR) AS text
             |FROM c ORDER BY doc_id""".stripMargin),
      doc = "revisit-aware WET conversion: the canonical set semi-joins records before text extraction — one conversion per distinct payload, not per fetch (500 fetches -> 97 conversions)"),

    // MIRROR-AWARE link analysis — the composition the collapse groups
    // exist for: a mirrored publisher splits its inlink mass across
    // aliases, deflating every member below its true rank, so edges
    // canonicalize through the (host, canonical) relation BEFORE
    // PageRank. Edges here are adjacency between consecutive docs'
    // serving hosts (a pure relational law both engines rebuild); the
    // 3-host clique's rank concentrates on c1 instead of splitting
    // three ways. Oracle = the CC closure + endpoint mapping + the
    // standard 2-round integer replay, all existing layers composed.
    Q("doc_link_pagerank_mirrored",
      (s, dir) => {
        import graft.operators.LinkGraph
        val pages = mirrorClusterPages(s, dir)
        val canon = mirrorCanon(s, dir)
        val rawEdges = pages.as("a")
          .join(pages.as("b"), col("b.doc_id") === col("a.doc_id") + 1)
          .select(col("a.host").as("src"), col("b.host").as("dst"))
        val edges = rawEdges
          .join(canon.select(col("host").as("src"),
            col("canonical").as("__cs")), Seq("src"), "left")
          .join(canon.select(col("host").as("dst"),
            col("canonical").as("__cd")), Seq("dst"), "left")
          .select(coalesce(col("__cs"), col("src")).as("src"),
            coalesce(col("__cd"), col("dst")).as("dst"))
          .distinct()
          // the hostScores lesson (BASELINE r14): materialize the edge
          // relation ONCE before the rank loop — otherwise every PR
          // round re-evaluates the pair-join + CC + canonicalize
          // lineage (measured here: 7.5 -> ~2 s)
          .localCheckpoint()
        LinkGraph.pageRankInt(edges, "src", "dst", iterations = 2)
          .withColumnRenamed("rank", "pr")
          .orderBy(col("node"))
      },
      Some("""WITH RECURSIVE pages AS (
             |  SELECT DISTINCT host, doc_id
             |  FROM (SELECT unnest(CASE
             |          WHEN doc_id % 10 < 3
             |            THEN ['c1.example', 'c2.example', 'c3.example']
             |          WHEN doc_id % 10 = 3 THEN ['p1.example']
             |          WHEN doc_id % 10 IN (4, 5)
             |            THEN ['p1.example', 'p2.example']
             |          WHEN doc_id % 10 = 6 THEN ['p2.example']
             |          ELSE ['s' || CAST(doc_id % 7 AS VARCHAR) || '.example']
             |        END) AS host, doc_id
             |        FROM documents)),
             |sz AS (SELECT host, count(*) AS sz FROM pages GROUP BY host),
             |inter AS (SELECT a.host AS host_a, b.host AS host_b,
             |                 count(*) AS inter
             |          FROM pages a JOIN pages b
             |            ON a.doc_id = b.doc_id AND a.host < b.host
             |          GROUP BY 1, 2),
             |jp AS (SELECT host_a, host_b FROM inter
             |       JOIN sz sa ON host_a = sa.host
             |       JOIN sz sb ON host_b = sb.host
             |       WHERE inter / (sa.sz + sb.sz - inter) >= 0.5),
             |mp AS (SELECT host_a AS u, host_b AS v FROM jp
             |       UNION SELECT host_b, host_a FROM jp),
             |reach(id, r) AS (
             |  SELECT u, v FROM mp
             |  UNION
             |  SELECT m.u, r.r FROM mp m JOIN reach r ON r.id = m.v),
             |comp AS (SELECT id AS host, least(id, min(r)) AS canonical
             |         FROM reach GROUP BY id),
             |re AS (SELECT DISTINCT a.host AS src, b.host AS dst
             |       FROM pages a JOIN pages b ON b.doc_id = a.doc_id + 1),
             |e AS (SELECT DISTINCT coalesce(ca.canonical, re.src) AS src,
             |             coalesce(cb.canonical, re.dst) AS dst
             |      FROM re LEFT JOIN comp ca ON re.src = ca.host
             |              LEFT JOIN comp cb ON re.dst = cb.host),
             |o AS (SELECT src, count(*) AS outd FROM e GROUP BY src),
             |-- NOT the `a UNION b` node shape the other replays use:
             |-- inside a WITH RECURSIVE block DuckDB gives every
             |-- UNION-shaped CTE the recursive-union treatment and this
             |-- relation came out with each node TWICE (measured), which
             |-- then doubled every rank sum downstream
             |n AS (SELECT DISTINCT node FROM (
             |        SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
             |r0 AS (SELECT node, CAST(1000000000000 AS HUGEINT) AS pr FROM n),
             |s1 AS (SELECT e.dst AS node, sum(r0.pr // o.outd) AS s
             |       FROM e JOIN o USING (src) JOIN r0 ON r0.node = e.src
             |       GROUP BY e.dst),
             |r1 AS (SELECT n.node,
             |              150000000000 + (85 * coalesce(s1.s, 0)) // 100 AS pr
             |       FROM n LEFT JOIN s1 USING (node)),
             |s2 AS (SELECT e.dst AS node, sum(r1.pr // o.outd) AS s
             |       FROM e JOIN o USING (src) JOIN r1 ON r1.node = e.src
             |       GROUP BY e.dst),
             |r2 AS (SELECT n.node,
             |              150000000000 + (85 * coalesce(s2.s, 0)) // 100 AS pr
             |       FROM n LEFT JOIN s2 USING (node))
             |SELECT node, CAST(pr AS BIGINT) AS pr
             |FROM r2 ORDER BY node""".stripMargin),
      doc = "mirror-aware PageRank: edges canonicalize through the mirror collapse groups before ranking, so a mirrored publisher's inlink mass concentrates instead of splitting; CC closure + 2-round integer replay oracle")
  )

  /** The clusters-plant page relation (c1/c2/c3 full-mirror clique,
    * p1/p2 boundary pair at exactly J=0.5, solo tail) shared by
    * doc_mirror_clusters and doc_link_pagerank_mirrored.
    */
  private def mirrorClusterPages(s: SparkSession, dir: String): DataFrame = {
    val m = pmod(col("doc_id"), lit(10))
    val hosts = when(m < 3,
        array(lit("c1.example"), lit("c2.example"), lit("c3.example")))
      .when(m === 3, array(lit("p1.example")))
      .when(m.isin(4, 5), array(lit("p1.example"), lit("p2.example")))
      .when(m === 6, array(lit("p2.example")))
      .otherwise(array(concat(lit("s"),
        pmod(col("doc_id"), lit(7)).cast("string"), lit(".example"))))
    Tables.documents(s, dir).select(explode(hosts).as("host"), col("doc_id"))
  }

  /** The (host, canonical) collapse groups over the clusters plant —
    * the pair stage + star-CC materialized ONCE per (JVM, sf dir)
    * ([[QueryMemo]]); doc_mirror_clusters and
    * doc_link_pagerank_mirrored are two views of this one relation,
    * the production shape (a crawl maintains ONE alias table that
    * every consumer reads).
    */
  private def mirrorCanon(s: SparkSession, dir: String): DataFrame =
    QueryMemo.materialized(s, s"mirror_canon|$dir") {
      import graft.operators.{CrawlPipeline, Dedup}
      Dedup.connectedComponentsStar(
        CrawlPipeline.mirrorHosts(mirrorClusterPages(s, dir),
          "host", "doc_id", threshold = 0.5),
        "host_a", "host_b", idOut = "host", compOut = "canonical")
    }

  /** DuckDB oracle for [[TextAnalysis.bpeEncode]] over merges trained
    * on the same corpus: the [[bpeOracle]] CTE chain (per-round
    * corpus-wide pair argmax + list_reduce application, word keyed)
    * extended to APPLY the final merge too, then per-doc token counts
    * from the word-level symbol lengths. The list_reduce application
    * is equivalent to the engine's left-to-right scan (a merged token
    * a||b can never equal a — the text_bpe_merges argument). A `def`:
    * referenced from the `all` initializer.
    */
  private def bpeEncodeOracle(numMerges: Int): String = {
    val parts = Seq.newBuilder[String]
    parts += """v0 AS (
      |  SELECT w, list_transform(range(1, length(w) + 1),
      |                        i -> substring(w, i, 1)) AS syms,
      |         CAST(count(*) AS BIGINT) AS cnt
      |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
      |  WHERE length(w) > 0
      |  GROUP BY w)""".stripMargin
    for (k <- 0 until numMerges) {
      parts += s"""p$k AS (
        |  SELECT pr[1] AS l, pr[2] AS r, CAST(sum(cnt) AS BIGINT) AS n
        |  FROM (SELECT cnt, unnest(list_transform(range(1, len(syms)),
        |               i -> [syms[i], syms[i + 1]])) AS pr
        |        FROM v$k)
        |  GROUP BY 1, 2)""".stripMargin
      parts += s"""m$k AS (
        |  SELECT l, r FROM p$k ORDER BY n DESC, l, r LIMIT 1)""".stripMargin
      parts += s"""v${k + 1} AS (
        |  SELECT v.w, list_reduce(list_transform(v.syms, s -> [s]),
        |           (acc, x) -> CASE WHEN acc[len(acc)] = m.l AND x[1] = m.r
        |                            THEN list_append(acc[1:len(acc) - 1], m.l || m.r)
        |                            ELSE list_concat(acc, x) END) AS syms,
        |         v.cnt
        |  FROM v$k v CROSS JOIN m$k m)""".stripMargin
    }
    parts += s"""wl AS (SELECT w, len(syms) AS n FROM v$numMerges)"""
    "WITH " + parts.result().mkString(",\n") + "\n" +
      """SELECT d.doc_id, CAST(coalesce(sum(wl.n), 0) AS BIGINT) AS n_tokens
        |FROM documents d
        |LEFT JOIN (SELECT doc_id, unnest(string_split(text, ' ')) AS w
        |           FROM documents) t
        |  ON d.doc_id = t.doc_id AND length(t.w) > 0
        |LEFT JOIN wl ON t.w = wl.w
        |GROUP BY d.doc_id
        |ORDER BY d.doc_id""".stripMargin
  }

  /** The full-scan BM25 oracle — shared verbatim by text_bm25_topk and
    * text_bm25_topk_pruned (the pruned form's claim is exact equality
    * with the full scan). A `def`: referenced from the `all`
    * initializer above.
    */
  private def bm25Oracle: String =
    """WITH toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |dl AS (SELECT doc_id, len(w) AS dl FROM toks),
      |corpus AS (SELECT count(*) AS n, sum(dl) AS tot FROM dl),
      |tf AS (SELECT doc_id, t, count(*) AS tf
      |       FROM (SELECT doc_id, unnest(w) AS t FROM toks)
      |       WHERE t IN ('vector', 'stream', 'spark')
      |       GROUP BY doc_id, t),
      |dfq AS (SELECT t, count(*) AS df FROM tf GROUP BY t),
      |sc AS (
      |  SELECT tf.doc_id,
      |         ln(1.0 + (corpus.n - dfq.df + 0.5) / (dfq.df + 0.5))
      |           * tf.tf * (1.2 + 1.0)
      |           / (tf.tf + 1.2 * ((1.0 - 0.75)
      |              + 0.75 * dl.dl / (CAST(corpus.tot AS DOUBLE) / corpus.n)))
      |           AS contrib
      |  FROM tf JOIN dfq USING (t) JOIN dl USING (doc_id) CROSS JOIN corpus)
      |SELECT doc_id, round(sum(contrib), 6) AS score
      |FROM sc GROUP BY doc_id
      |ORDER BY score DESC, doc_id
      |LIMIT 15""".stripMargin

  /** The shared mirror-pair oracle: the exact relational Jaccard over
    * the planted (host, doc_id) relation — both the exact and the LSH
    * query hash against it (the LSH query's claim IS that its verified
    * output equals the exact form here). A `def`, not a `val`: it is
    * referenced from the `all` initializer above, which runs first.
    */
  private def mirrorOracle: String =
    """WITH pages AS (
      |  SELECT DISTINCT host, doc_id
      |  FROM (SELECT unnest(CASE
      |          WHEN doc_id % 10 < 3 THEN ['m1.example', 'm2.example']
      |          WHEN doc_id % 10 = 3 THEN ['p1.example']
      |          WHEN doc_id % 10 IN (4, 5) THEN ['p1.example', 'p2.example']
      |          WHEN doc_id % 10 = 6 THEN ['p2.example']
      |          ELSE ['s' || CAST(doc_id % 7 AS VARCHAR) || '.example']
      |        END) AS host, doc_id
      |        FROM documents)),
      |sz AS (SELECT host, count(*) AS sz FROM pages GROUP BY host),
      |inter AS (SELECT a.host AS host_a, b.host AS host_b, count(*) AS inter
      |          FROM pages a JOIN pages b
      |            ON a.doc_id = b.doc_id AND a.host < b.host
      |          GROUP BY 1, 2)
      |SELECT host_a, host_b, sa.sz AS size_a, sb.sz AS size_b, inter,
      |       inter / (sa.sz + sb.sz - inter) AS jaccard
      |FROM inter
      |JOIN sz sa ON host_a = sa.host
      |JOIN sz sb ON host_b = sb.host
      |WHERE inter / (sa.sz + sb.sz - inter) >= 0.5
      |ORDER BY host_a, host_b""".stripMargin
}
