package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** HTML → text extraction — the stage between WARC ingest and every
  * text operator in a crawl pipeline (the Common Crawl WET step:
  * response payload → markup stripped, entities decoded, whitespace
  * normalized). One single-pass state machine per document, no DOM, no
  * allocation beyond the output builders — markup-heavy pages are the
  * 100 TB common case and a parse tree per row would dominate the
  * scan. Reference behavior modeled: trafilatura/jusText-class
  * boilerplate handling reduced to its deterministic core (script/
  * style/comment removal, block-level paragraph breaks, entity
  * decode), which keeps the transform oracle-expressible.
  *
  * Contract (pinned by spec + the `text_html_extract` oracle):
  *   - `<script>`/`<style>` element CONTENT is dropped (case-
  *     insensitive close-tag scan); comments `<!-- -->` are dropped.
  *   - `<title>` content goes to the title extraction and NOT into
  *     the body text.
  *   - Block-level tags (open or close: p div br h1-h6 li ul ol table
  *     tr td th section article header footer blockquote pre hr form
  *     dl dt dd) become ONE newline between non-empty runs; inline
  *     tags (b, i, span, a, ...) vanish without breaking the word.
  *   - Entities: the five XML named ones + `&nbsp;` + decimal/hex
  *     numeric refs decode; an unrecognized `&...` stays verbatim.
  *   - Whitespace runs collapse to one space; edges trim. A `<` not
  *     opening a tag (next char not a letter, `/`, `!`, `?`) is
  *     literal text, the browser tokenizer rule for malformed markup.
  *   - Unterminated constructs (tag, comment, script) swallow to end
  *     of input — fail-soft, never throw, truncated crawls are data.
  *
  * The parse additionally yields per-BLOCK structure — visible text,
  * non-whitespace char count, and how many of those chars sit inside
  * `<a>` anchors — which is exactly the signal set jusText-style
  * main-content classification needs (link-dense nav/footer blocks vs
  * text-dense content blocks); see [[HtmlBlocks]] and
  * `TextAnalysis.htmlMainContent`.
  */
object HtmlExtract {

  private val BlockTags: Set[String] = Set(
    "p", "div", "br", "h1", "h2", "h3", "h4", "h5", "h6", "li", "ul",
    "ol", "table", "tr", "td", "th", "section", "article", "header",
    "footer", "blockquote", "pre", "hr", "form", "dl", "dt", "dd")

  /** One visible text block: collapsed text, non-ws char count, and
    * the subset of those chars inside `<a>` anchors.
    */
  final case class Block(text: String, chars: Int, linkChars: Int)

  /** Everything one pass yields, in document order. `hrefs` are raw
    * attribute values (quoted or bare), entity-decoded like text;
    * `anchors` pairs each href-bearing anchor with its visible text
    * (ws-collapsed, may span block tags) — the web-graph anchor-text
    * relation. Anchor nesting follows the browser rule: a new `<a>`
    * implicitly closes an open one.
    */
  final case class Parsed(title: String, blocks: Array[Block],
      hrefs: Array[String], anchors: Array[(String, String)])

  def parseAll(s: String): Parsed = {
    val n = s.length
    val title = new java.lang.StringBuilder(32)
    var titleSpace = false
    val blocks = scala.collection.mutable.ArrayBuffer.empty[Block]
    val cur = new java.lang.StringBuilder(64)
    var curNonWs = 0
    var curLink = 0
    var pendingSpace = false
    var inTitle = false
    var anchorActive = false
    var anchorHref: String = null
    val anchorBuf = new java.lang.StringBuilder(32)
    var anchorSpace = false
    val anchors = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    def endAnchor(): Unit = {
      if (anchorActive && anchorHref != null && anchorBuf.length > 0)
        anchors += ((anchorHref, anchorBuf.toString))
      anchorActive = false; anchorHref = null
      anchorBuf.setLength(0); anchorSpace = false
    }
    val hrefs = scala.collection.mutable.ArrayBuffer.empty[String]
    // href="..." / href='...' / href=bare inside an <a ...> tag body,
    // entities decoded (href values legally contain &amp;)
    def captureHref(from: Int, until: Int): Unit = {
      var k = from
      while (k < until) {
        if (s.regionMatches(true, k, "href", 0, 4) &&
            (k == from || { val p = s.charAt(k - 1)
              !p.isLetterOrDigit && p != '-' })) { // not data-href etc.
          var v = k + 4
          while (v < until && s.charAt(v).isWhitespace) v += 1
          if (v < until && s.charAt(v) == '=') {
            v += 1
            while (v < until && s.charAt(v).isWhitespace) v += 1
            if (v < until) {
              val q = s.charAt(v)
              val (vs, ve) =
                if (q == '"' || q == '\'') {
                  val e = s.indexOf(q, v + 1)
                  (v + 1, if (e < 0 || e > until) until else e)
                } else {
                  var e = v
                  while (e < until && !s.charAt(e).isWhitespace) e += 1
                  (v, e)
                }
              val href = s.substring(vs, ve)
                .replace("&amp;", "&").replace("&#38;", "&")
              hrefs += href
              anchorHref = href
              return
            }
          }
        }
        k += 1
      }
    }
    def endBlock(): Unit =
      if (inTitle) { if (title.length > 0) titleSpace = true }
      else {
        if (anchorActive && anchorBuf.length > 0) anchorSpace = true
        if (cur.length > 0) doEndBlock()
      }
    def doEndBlock(): Unit =
      if (cur.length > 0) {
        blocks += Block(cur.toString, curNonWs, curLink)
        cur.setLength(0); curNonWs = 0; curLink = 0; pendingSpace = false
      }
    def emit(c: Char): Unit = {
      val isWs = c == ' ' || (c >= '\t' && c <= '\r') || c == '\u00a0' // NBSP
      if (inTitle) {
        if (isWs) { if (title.length > 0) titleSpace = true }
        else {
          if (titleSpace) title.append(' ')
          titleSpace = false
          title.append(c)
        }
      } else if (isWs) {
        if (cur.length > 0) pendingSpace = true
        if (anchorActive && anchorBuf.length > 0) anchorSpace = true
      } else {
        if (pendingSpace) cur.append(' ')
        pendingSpace = false
        cur.append(c)
        curNonWs += 1
        if (anchorActive) {
          curLink += 1
          if (anchorSpace) anchorBuf.append(' ')
          anchorSpace = false
          anchorBuf.append(c)
        }
      }
    }
    // end index (exclusive of '>') of a tag starting at `from` (first
    // char after the name), honoring quoted attribute values
    def tagEnd(from: Int): Int = {
      var k = from
      var q = 0.toChar
      while (k < n) {
        val c = s.charAt(k)
        if (q != 0) { if (c == q) q = 0.toChar }
        else if (c == '"' || c == '\'') q = c
        else if (c == '>') return k
        k += 1
      }
      n
    }
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == '<') {
        if (s.regionMatches(i, "<!--", 0, 4)) {
          val e = s.indexOf("-->", i + 4)
          i = if (e < 0) n else e + 3
        } else if (i + 1 < n && (s.charAt(i + 1) == '!' || s.charAt(i + 1) == '?')) {
          i = tagEnd(i + 2) + 1 // doctype / processing instruction
        } else {
          val close = i + 1 < n && s.charAt(i + 1) == '/'
          val nameStart = if (close) i + 2 else i + 1
          // tag names start with a LETTER (the browser tokenizer rule:
          // "<4" or "< " is literal text, not markup)
          var j = nameStart
          if (j < n && s.charAt(j).isLetter) {
            j += 1
            while (j < n && s.charAt(j).isLetterOrDigit) j += 1
          }
          if (j == nameStart) { emit('<'); i += 1 } // literal '<' in text
          else {
            val name = s.substring(nameStart, j).toLowerCase
            val end = tagEnd(j)
            if (!close && (name == "script" || name == "style")) {
              val closeTag = "</" + name
              var k = end + 1
              while (k < n && !s.regionMatches(true, k, closeTag, 0, closeTag.length))
                k += 1
              i = if (k >= n) n else tagEnd(k + closeTag.length) + 1
            } else if (name == "title") {
              if (!close) inTitle = true
              else { inTitle = false; titleSpace = false }
              i = end + 1
            } else {
              if (name == "a") {
                endAnchor() // new <a> implicitly closes an open one
                if (!close) { anchorActive = true; captureHref(j, end) }
              }
              if (BlockTags.contains(name)) endBlock()
              i = end + 1
            }
          }
        }
      } else if (c == '&') {
        val sc = s.indexOf(';', i + 1)
        val decoded: Int =
          if (sc < 0 || sc > i + 10) -1
          else s.substring(i + 1, sc) match {
            case "amp" => '&'
            case "lt" => '<'
            case "gt" => '>'
            case "quot" => '"'
            case "apos" => '\''
            case "nbsp" => ' '
            case e if e.length > 1 && e.charAt(0) == '#' =>
              try {
                val cp =
                  if (e.charAt(1) == 'x' || e.charAt(1) == 'X')
                    Integer.parseInt(e.substring(2), 16)
                  else Integer.parseInt(e.substring(1))
                if (Character.isValidCodePoint(cp)) cp else -1
              } catch { case _: NumberFormatException => -1 }
            case _ => -1
          }
        if (decoded >= 0) {
          Character.toChars(decoded).foreach(emit)
          i = sc + 1
        } else { emit('&'); i += 1 }
      } else { emit(c); i += 1 }
    }
    inTitle = false
    endAnchor()
    endBlock()
    Parsed(title.toString, blocks.toArray, hrefs.toArray, anchors.toArray)
  }

  /** Single pass → (title, blocks in document order). */
  def parse(s: String): (String, Array[Block]) = {
    val p = parseAll(s)
    (p.title, p.blocks)
  }

  /** `wantTitle = false` → body text (blocks joined by `\n`);
    * `true` → title content.
    */
  def extract(s: String, wantTitle: Boolean): String = {
    val (t, blocks) = parse(s)
    if (wantTitle) t
    else {
      val sb = new java.lang.StringBuilder(blocks.iterator.map(_.text.length + 1).sum max 0)
      var first = true
      blocks.foreach { b =>
        if (!first) sb.append('\n')
        first = false
        sb.append(b.text)
      }
      sb.toString
    }
  }
}

/** Codegen'd body-text extraction ([[HtmlExtract.extract]], body mode). */
case class HtmlText(child: Expression)
    extends UnaryExpression with KernelCodegen {
  override def dataType: DataType = StringType
  override def prettyName: String = "html_text"
  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      HtmlExtract.extract(input.asInstanceOf[UTF8String].toString,
        wantTitle = false))
  override protected def withNewChildInternal(newChild: Expression): HtmlText =
    copy(child = newChild)
}

/** Codegen'd `<title>` extraction ([[HtmlExtract.extract]], title mode). */
case class HtmlTitle(child: Expression)
    extends UnaryExpression with KernelCodegen {
  override def dataType: DataType = StringType
  override def prettyName: String = "html_title"
  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      HtmlExtract.extract(input.asInstanceOf[UTF8String].toString,
        wantTitle = true))
  override protected def withNewChildInternal(newChild: Expression): HtmlTitle =
    copy(child = newChild)
}

/** Codegen'd per-block structure ([[HtmlExtract.parse]]):
  * `array<struct<text, n_chars, link_chars>>` in document order — the
  * input relation for jusText-style main-content classification.
  */
case class HtmlBlocks(child: Expression)
    extends UnaryExpression with KernelCodegen {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("text", StringType, nullable = false),
    StructField("n_chars", IntegerType, nullable = false),
    StructField("link_chars", IntegerType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "html_blocks"
  override def nullSafeEval(input: Any): Any = {
    val (_, blocks) =
      HtmlExtract.parse(input.asInstanceOf[UTF8String].toString)
    new GenericArrayData(blocks.map(b =>
      org.apache.spark.sql.catalyst.InternalRow(
        UTF8String.fromString(b.text), b.chars, b.linkChars): Any))
  }
  override protected def withNewChildInternal(newChild: Expression): HtmlBlocks =
    copy(child = newChild)
}

/** Codegen'd anchor-href extraction ([[HtmlExtract.parseAll]]):
  * `array<string>` of `<a href=...>` values in document order — the
  * raw material of the crawl link graph
  * ([[graft.operators.LinkGraph]]).
  */
case class HtmlLinks(child: Expression)
    extends UnaryExpression with KernelCodegen {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "html_links"
  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      HtmlExtract.parseAll(input.asInstanceOf[UTF8String].toString)
        .hrefs.map(UTF8String.fromString(_): Any))
  override protected def withNewChildInternal(newChild: Expression): HtmlLinks =
    copy(child = newChild)
}

/** Codegen'd anchor-text pairs ([[HtmlExtract.parseAll]]):
  * `array<struct<href, anchor>>` — each href-bearing anchor with its
  * visible text. The web-graph anchor-text relation: what the web
  * SAYS about a target is a classic relevance/quality signal, and at
  * crawl scale this is its extraction point.
  */
case class HtmlAnchors(child: Expression)
    extends UnaryExpression with KernelCodegen {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("href", StringType, nullable = false),
    StructField("anchor", StringType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "html_anchors"
  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      HtmlExtract.parseAll(input.asInstanceOf[UTF8String].toString)
        .anchors.map { case (h, a) =>
          org.apache.spark.sql.catalyst.InternalRow(
            UTF8String.fromString(h), UTF8String.fromString(a)): Any
        })
  override protected def withNewChildInternal(newChild: Expression): HtmlAnchors =
    copy(child = newChild)
}

/** One parse → `struct<title, blocks>` — for consumers that need BOTH
  * (the crawl pipeline extracts title and classifies blocks per page;
  * separate [[HtmlTitle]] + [[HtmlBlocks]] columns would run the
  * state machine twice per document, and at crawl scale the parse IS
  * the extraction cost).
  */
case class HtmlDoc(child: Expression)
    extends UnaryExpression with KernelCodegen {
  override def dataType: DataType = StructType(Seq(
    StructField("title", StringType, nullable = false),
    StructField("blocks", ArrayType(StructType(Seq(
      StructField("text", StringType, nullable = false),
      StructField("n_chars", IntegerType, nullable = false),
      StructField("link_chars", IntegerType, nullable = false))),
      containsNull = false), nullable = false)))
  override def prettyName: String = "html_doc"
  override def nullSafeEval(input: Any): Any = {
    val p = HtmlExtract.parseAll(input.asInstanceOf[UTF8String].toString)
    org.apache.spark.sql.catalyst.InternalRow(
      UTF8String.fromString(p.title),
      new GenericArrayData(p.blocks.map(b =>
        org.apache.spark.sql.catalyst.InternalRow(
          UTF8String.fromString(b.text), b.chars, b.linkChars): Any)))
  }
  override protected def withNewChildInternal(newChild: Expression): HtmlDoc =
    copy(child = newChild)
}
