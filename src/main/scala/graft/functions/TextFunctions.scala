package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Tokenization / shingling — the shared text layer under the dedup
  * and text-analysis operators.
  */
object TextFunctions {

  /** Whitespace tokens. */
  def words(text: Column): Column = split(text, " ")

  /** Distinct word-k-gram shingles ("a b c" style), the unit set for
    * Jaccard/MinHash dedup. Empty array when the text has < k words.
    * One fused codegen'd pass ([[ShingleSet]]) — the equivalent
    * built-in chain (split → sequence → transform(concat_ws(slice)) →
    * array_distinct) is a higher-order-function tree that Spark
    * evaluates INTERPRETED per row and re-walks lambda-by-lambda; on
    * the dedup hot path that interpretation dominated runtime.
    */
  def shingleSet(text: Column, k: Int): Column =
    Bridge.column(ShingleSet(Bridge.expression(text), k))

  /** Non-distinct word-k-grams in document order ([[ShingleList]]) —
    * the multiset form repetition statistics need ([[shingleSet]] would
    * collapse exactly the duplicates being measured).
    */
  def shingleList(text: Column, k: Int): Column =
    Bridge.column(ShingleList(Bridge.expression(text), k))

  /** Ordered (a, b) pairs from a sorted long array ([[OrderedPairs]]). */
  def orderedPairs(ids: Column): Column =
    Bridge.column(OrderedPairs(Bridge.expression(ids)))

  /** One-pass word stats + per-set marker hit counts ([[MarkerCounts]])
    * — the shared kernel under `qualityScore`/`langId`.
    */
  /** PII redaction for training corpora: emails, IPv4 addresses, and
    * NNN-NNN-NNNN phone numbers become `<EMAIL>` / `<IP>` / `<PHONE>`
    * placeholder tokens (the convention of the public C4/Dolma-style
    * cleanup recipes). Three chained `regexp_replace` stages — all
    * codegen'd, no UDF — applied email-first so an address's host part
    * can't be half-eaten by the IP pass. The patterns avoid
    * backtracking-only constructs (no lookaround), so they mean the
    * same thing to Java regex and to RE2-family engines (the DuckDB
    * oracle runs the identical patterns).
    *
    * Scale shape: a pure per-row map — embarrassingly parallel, no
    * shuffle, stays inside WholeStageCodegen with the scan.
    */
  /** All URL hostnames in a text, in document order — the feature
    * under RefinedWeb/C4-style URL quality filtering. One codegen'd
    * `regexp_extract_all` (group 1 of an `https?://host` pattern,
    * lookaround-free so Java regex ≡ RE2 ≡ the DuckDB oracle); hosts
    * are lowercased, since URL authorities are case-insensitive.
    * Pure per-row map: no shuffle, scan-fused.
    */
  def urlHosts(text: Column): Column =
    regexp_extract_all(lower(text), lit("https?://([a-z0-9.-]+)"), lit(1))

  /** Registrable domain of a hostname — the last two dot-labels
    * (`cdn3.mirror.example.com` → `example.com`), the grouping key
    * domain blocklists are written against. Regex-anchored so both
    * engines agree; a bare single-label host maps to itself.
    */
  def registrableDomain(host: Column): Column =
    regexp_extract(host, "([a-z0-9-]+\\.[a-z0-9-]+)$|^([a-z0-9-]+)$", 0)

  /** URL canonicalization — the normalization URL-level crawl dedup
    * keys on (every crawl pipeline's first dedup pass is "same URL,
    * keep newest"; raw crawl URLs differ in case, default ports,
    * tracking params, param order, and fragments without differing in
    * content). Rules, all engine-portable:
    *   1. drop the fragment (`#...` never reaches the server);
    *   2. lowercase scheme + authority (case-insensitive per RFC 3986);
    *   3. strip default ports (`:80` http, `:443` https);
    *   4. empty path → `/` (WHATWG: path is never empty);
    *   5. drop tracking params (`utm_*`, `fbclid`, `gclid`, `ref`),
    *      sort the survivors byte-lexicographically, rejoin.
    * Pure per-row built-in chain (regexes + one array sort over a
    * handful of params) — scan-fused, no shuffle, no UDF.
    */
  def canonicalUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val base = regexp_extract(noFrag, "^([^?]*)", 1)
    val query = regexp_extract(noFrag, "^[^?]*\\?(.*)$", 1)
    val auth = lower(regexp_extract(base, "(?i)^(https?://[^/]*)", 1))
    val path = regexp_replace(base, "(?i)^https?://[^/]*", "")
    val authNoPort = regexp_replace(
      regexp_replace(auth, "^(http://.*):80$", "$1"),
      "^(https://.*):443$", "$1")
    val params = filter(split(query, "&"),
      p => !(p === "" || p.rlike("^(utm_[^=]*|fbclid|gclid|ref)=")))
    val sortedQuery = array_join(array_sort(params), "&")
    concat(authNoPort,
      when(path === "", "/").otherwise(path),
      when(sortedQuery === "", "").otherwise(concat(lit("?"), sortedQuery)))
  }

  /** Common multi-part public suffixes for [[registeredDomain]] —
    * the high-mass entries of the public suffix list's ICANN section
    * (the full PSL is a data file a deployment ships alongside;
    * callers with one pass it in).
    *
    * PROVENANCE + refresh discipline (round 16): distilled by hand
    * from publicsuffix.org's ICANN section, snapshot pinned
    * 2026-08-15. A stale list silently mis-rolls hosts under any
    * suffix added to the PSL later (e.g. a new `com.xx` would
    * collapse `a.com.xx` and `b.com.xx` into one publisher
    * `com.xx`). The update path is deliberate, not silent:
    * SuffixListSpec pins this list's exact contents (sorted
    * fingerprint) AND an independently-written canary subset — any
    * edit here fails the spec until the editor re-verifies the
    * canaries against the live PSL and bumps the fingerprint + this
    * date together. Deployments tracking the full PSL pass their
    * file via the `suffixes` parameter and own their refresh cadence.
    */
  val DefaultMultiPartSuffixes: Seq[String] = Seq(
    "co.uk", "ac.uk", "gov.uk", "org.uk", "me.uk", "net.uk", "ltd.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "co.nz", "net.nz", "org.nz", "co.in", "net.in", "org.in",
    "com.br", "net.br", "org.br", "com.cn", "net.cn", "org.cn",
    "com.mx", "com.ar", "com.tr", "com.sg", "com.hk", "com.tw",
    "co.za", "co.kr", "com.my", "com.ph", "com.vn", "com.eg")

  /** Registered domain (eTLD+1): the unit quality pipelines group on
    * — `a.b.example.co.uk` and `www.example.co.uk` are ONE publisher
    * (RefinedWeb/FineWeb cap documents per registered domain, not per
    * host). Heuristic: the last two labels, or the last three when
    * the last two form a multi-part public suffix from `suffixes`.
    * Pure built-ins (one split + tail slices) — scan-fused, no UDF;
    * hosts with ≤ 2 labels (or an IP) pass through unchanged.
    */
  def registeredDomain(host: Column,
      suffixes: Seq[String] = DefaultMultiPartSuffixes): Column = {
    val parts = split(host, "\\.")
    val n = size(parts)
    val last2 = concat_ws(".", element_at(parts, -2), element_at(parts, -1))
    val last3 = concat_ws(".",
      element_at(parts, -3), element_at(parts, -2), element_at(parts, -1))
    when(n <= 2 || host.rlike("^\\d+\\.\\d+\\.\\d+\\.\\d+$"), host)
      .when(last2.isin(suffixes: _*), last3)
      .otherwise(last2)
  }

  def scrubPii(text: Column): Column = {
    val email = regexp_replace(text,
      lit("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"), lit("<EMAIL>"))
    val ip = regexp_replace(email,
      lit("\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"), lit("<IP>"))
    regexp_replace(ip,
      lit("\\b\\d{3}-\\d{3}-\\d{4}\\b"), lit("<PHONE>"))
  }

  def markerCounts(text: Column, sets: Seq[Seq[String]]): Column =
    Bridge.column(MarkerCounts(Bridge.expression(text), sets))

  /** Pipeline text normalization — Unicode NFC composition, control
    * stripping, ASCII-whitespace-run collapse, edge trim — in ONE
    * codegen'd pass ([[NormalizeText]]). The contract (pinned by the
    * DuckDB oracle, which has `nfc_normalize` natively) is exactly:
    *
    *   trim(regexp_replace(regexp_replace(nfc_normalize(s),
    *        '[\x00-\x08\x0E-\x1F\x7F]', ''),      -- controls, not \t\n\v\f\r
    *        '[ \t\n\r\x0B\x0C]+', ' '))           -- ASCII ws runs -> one space
    *
    * Unicode spaces (NBSP U+00A0, U+2007, ...) are deliberately NOT
    * collapsed: RE2-class explicitness keeps Java/DuckDB/any-engine
    * byte agreement, and NBSP is often semantic (numbers, French
    * punctuation). Every serious corpus pipeline runs this exact stage
    * before shingling/hashing so that "é" and "é" dedup
    * together; scan-fused per-row map, no shuffle.
    */
  def normalizeText(text: Column): Column =
    Bridge.column(NormalizeText(Bridge.expression(text)))

  /** Body text of an HTML document — markup stripped, entities
    * decoded, block tags → newlines, in one codegen'd pass
    * ([[HtmlText]]; contract in [[HtmlExtract]]).
    */
  def htmlText(html: Column): Column =
    Bridge.column(HtmlText(Bridge.expression(html)))

  /** `<title>` content of an HTML document ([[HtmlTitle]]). */
  def htmlTitle(html: Column): Column =
    Bridge.column(HtmlTitle(Bridge.expression(html)))

  /** Per-block structure of an HTML document —
    * `array<struct<text, n_chars, link_chars>>` in document order
    * ([[HtmlBlocks]]) — the input relation for jusText-style
    * main-content classification.
    */
  def htmlBlocks(html: Column): Column =
    Bridge.column(HtmlBlocks(Bridge.expression(html)))

  /** `<a href=...>` values of an HTML document in document order
    * ([[HtmlLinks]]) — feeds the crawl link graph.
    */
  def htmlLinks(html: Column): Column =
    Bridge.column(HtmlLinks(Bridge.expression(html)))

  /** (href, visible anchor text) pairs of an HTML document in document
    * order ([[HtmlAnchors]]) — the web-graph anchor-text relation.
    */
  def htmlAnchors(html: Column): Column =
    Bridge.column(HtmlAnchors(Bridge.expression(html)))

  /** `struct<title, blocks>` from ONE parse ([[HtmlDoc]]) — for
    * consumers needing both (two separate columns parse twice).
    */
  def htmlDoc(html: Column): Column =
    Bridge.column(HtmlDoc(Bridge.expression(html)))
}

/** Fused shingle kernel: split on single spaces (empty tokens kept,
  * exactly like `split(text, " ")` / DuckDB `string_split(text, ' ')`),
  * emit each k-gram joined by one space, distinct in first-occurrence
  * order — element-for-element what the built-in chain
  * `array_distinct(transform(sequence(...), concat_ws(" ", slice(words,
  * i+1, k))))` produces, in one pass with one output allocation.
  */
case class ShingleSet(child: Expression, k: Int)
    extends UnaryExpression with KernelCodegen {

  require(k >= 1, "shingle size must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingle_set"

  override def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[UTF8String].toString.split(" ", -1)
    val n = words.length - k + 1
    if (n <= 0) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String](n * 2)
    var i = 0
    while (i < n) {
      val sb = new java.lang.StringBuilder(32)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var p = 0
    while (it.hasNext) { out(p) = UTF8String.fromString(it.next()); p += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleSet =
    copy(child = newChild)
}

/** Fused non-distinct k-gram kernel: like [[ShingleSet]] but keeping
  * every occurrence in document order — one pass, one allocation, same
  * tokenization (`split(text, " ")`, empty tokens kept).
  */
case class ShingleList(child: Expression, k: Int)
    extends UnaryExpression with KernelCodegen {

  require(k >= 1, "shingle size must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingle_list"

  override def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[UTF8String].toString.split(" ", -1)
    val n = words.length - k + 1
    if (n <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      val sb = new java.lang.StringBuilder(32)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j))
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleList =
    copy(child = newChild)
}

/** All ordered pairs (a, b) with a before b from a sorted long array —
  * the posting-list → candidate-pairs step of the grouped inverted
  * index. Fused for the same reason as [[ShingleSet]]: the equivalent
  * `flatten(transform(ids, (x,i) => transform(slice(...), ...)))` is an
  * interpreted higher-order chain evaluated once per posting row.
  * Output: array<struct<id_a: long, id_b: long>>.
  */
case class OrderedPairs(child: Expression)
    extends UnaryExpression with KernelCodegen {

  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id_a",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("id_b",
        org.apache.spark.sql.types.LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "ordered_pairs"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = arr.numElements()
    val out = new Array[Any](n * (n - 1) / 2)
    var p = 0
    var i = 0
    while (i < n) {
      val a = arr.getLong(i)
      var j = i + 1
      while (j < n) {
        out(p) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](a, arr.getLong(j)))
        p += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): OrderedPairs =
    copy(child = newChild)
}

/** Fused word-stat/marker kernel: ONE pass over the `split(text, " ")`
  * tokens (empty tokens kept, same tokenization as [[TextFunctions.words]])
  * computing what `qualityScore` and `langId` previously derived from
  * FOUR-plus interpreted higher-order-function lambdas per row
  * (`aggregate(transform(...))` for summed word length, one
  * `size(filter(isin))` per marker set — Spark evaluates each as
  * CodegenFallback, re-walking the lambda tree per row; these two
  * operators run inline with the ingest scan on every document, so the
  * interpretation cost is ingest-proportional). Output struct:
  *   - n_words:  token count (`size(split(text, " "))` exactly)
  *   - sum_len:  Σ code-point length per token (`length()` semantics)
  *   - hits[i]:  tokens contained in `sets(i)` (the `isin` count)
  */
case class MarkerCounts(child: Expression, sets: Seq[Seq[String]])
    extends UnaryExpression with KernelCodegen {

  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("n_words",
      org.apache.spark.sql.types.IntegerType, nullable = false),
    org.apache.spark.sql.types.StructField("sum_len",
      org.apache.spark.sql.types.IntegerType, nullable = false),
    org.apache.spark.sql.types.StructField("hits",
      ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false),
      nullable = false)))
  override def prettyName: String = "marker_counts"

  @transient private lazy val lookups: Array[java.util.HashSet[String]] =
    sets.map { s =>
      val h = new java.util.HashSet[String](s.size * 2)
      s.foreach(h.add)
      h
    }.toArray

  override def nullSafeEval(input: Any): Any = {
    val tokens = input.asInstanceOf[UTF8String].toString.split(" ", -1)
    val hits = new Array[Any](lookups.length)
    val counts = new Array[Int](lookups.length)
    var sumLen = 0
    var i = 0
    while (i < tokens.length) {
      val t = tokens(i)
      sumLen += t.codePointCount(0, t.length)
      var j = 0
      while (j < counts.length) {
        if (lookups(j).contains(t)) counts(j) += 1
        j += 1
      }
      i += 1
    }
    var j = 0
    while (j < counts.length) { hits(j) = counts(j); j += 1 }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](tokens.length, sumLen, new GenericArrayData(hits)))
  }

  override protected def withNewChildInternal(newChild: Expression): MarkerCounts =
    copy(child = newChild)
}

/** Fused normalization kernel: NFC-compose (java.text.Normalizer — the
  * same Unicode NFC the DuckDB oracle's `nfc_normalize` implements),
  * then one char pass that drops control chars (C0 minus the five ASCII
  * whitespace controls, plus DEL), collapses runs of
  * `[ \t\n\r\x0B\x0C]` to a single space, and trims both edges.
  * Equivalent to the strip-then-collapse-then-trim regex chain because
  * a skipped control between two whitespace chars leaves the run
  * contiguous, exactly as deleting it first would.
  */
case class NormalizeText(child: Expression)
    extends UnaryExpression with KernelCodegen {

  override def dataType: DataType = StringType
  override def prettyName: String = "normalize_text"

  override def nullSafeEval(input: Any): Any = {
    val s = java.text.Normalizer.normalize(
      input.asInstanceOf[UTF8String].toString,
      java.text.Normalizer.Form.NFC)
    val n = s.length
    val sb = new java.lang.StringBuilder(n)
    var pendingSpace = false
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      val isWs = c == ' ' || (c >= '\t' && c <= '\r')
      val isCtl = (c < ' ' && !isWs) || c == '\u007f'
      if (isWs) {
        if (sb.length > 0) pendingSpace = true // leading ws never lands
      } else if (!isCtl) {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        sb.append(c)
      }
      i += 1
    }
    UTF8String.fromString(sb.toString) // trailing ws stays pending -> trimmed
  }

  override protected def withNewChildInternal(newChild: Expression): NormalizeText =
    copy(child = newChild)
}
