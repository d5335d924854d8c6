package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** HTML → text extraction — the stage between WARC ingest and every
  * text operator in a crawl pipeline (the Common Crawl WET step:
  * response payload → markup stripped, entities decoded, whitespace
  * normalized). One single-pass state machine per document, no DOM, no
  * allocation beyond the output builder — markup-heavy pages are the
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
  *     opening a tag (next char not letter, `/`, `!`) is literal text,
  *     the browser tokenizer rule for malformed markup.
  *   - Unterminated constructs (tag, comment, script) swallow to end
  *     of input — fail-soft, never throw, truncated crawls are data.
  */
object HtmlExtract {

  private val BlockTags: Set[String] = Set(
    "p", "div", "br", "h1", "h2", "h3", "h4", "h5", "h6", "li", "ul",
    "ol", "table", "tr", "td", "th", "section", "article", "header",
    "footer", "blockquote", "pre", "hr", "form", "dl", "dt", "dd")

  /** `wantTitle = false` → body text; `true` → title content. */
  def extract(s: String, wantTitle: Boolean): String = {
    val n = s.length
    val out = new java.lang.StringBuilder(if (wantTitle) 32 else n / 4)
    var pendingSpace = false
    var pendingBreak = false
    var inTitle = false
    def emit(c: Char): Unit = {
      if (inTitle != wantTitle) return
      val isWs = c == ' ' || (c >= '\t' && c <= '\r') || c == '\u00a0' /* NBSP (decoded &nbsp;) */
      if (isWs) { if (out.length > 0) pendingSpace = true }
      else {
        if (out.length > 0) {
          if (pendingBreak) out.append('\n')
          else if (pendingSpace) out.append(' ')
        }
        pendingBreak = false; pendingSpace = false
        out.append(c)
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
              inTitle = !close
              i = end + 1
            } else {
              if (BlockTags.contains(name)) pendingBreak = true
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
            case "nbsp" => ' '
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
    out.toString
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
