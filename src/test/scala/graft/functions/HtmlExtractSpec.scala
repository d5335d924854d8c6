package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The HTML→text contract ([[HtmlExtract]]): each rule pinned on the
  * raw kernel, then the codegen'd column path cross-checked against
  * the kernel on a full page.
  */
class HtmlExtractSpec extends SparkSpec {
  import spark.implicits._

  private def body(s: String) = HtmlExtract.extract(s, wantTitle = false)
  private def title(s: String) = HtmlExtract.extract(s, wantTitle = true)

  test("markup strips; inline tags keep words intact; block tags break") {
    assert(body("<p>one <b>bo</b>ld</p><p>two</p>") == "one bold\ntwo")
    assert(body("<div>a</div><div>b</div>") == "a\nb")
    assert(body("line<br/>break") == "line\nbreak")
    // consecutive block boundaries collapse to ONE newline
    assert(body("<ul><li>x</li><li>y</li></ul>z") == "x\ny\nz")
  }

  test("script/style/comment content drops, case-insensitively") {
    assert(body("a<script>var s = '<p>fake</p>';</script>b") == "ab")
    assert(body("a<SCRIPT src='x.js'>if (1<2) {}</ScRiPt>b") == "ab")
    assert(body("a<style>p > span { color: red }</style>b") == "ab")
    assert(body("a<!-- <p>comment</p> -->b") == "ab")
    // unterminated constructs swallow to end, never throw
    assert(body("a<script>trailing") == "a")
    assert(body("a<!-- open") == "a")
    assert(body("a<p attr='unclosed") == "a")
  }

  test("title goes to the title side only") {
    val h = "<html><head><title>The  Title</title></head><body><p>text</p></body></html>"
    assert(title(h) == "The Title")
    assert(body(h) == "text")
    assert(title("<p>no title</p>") == "")
  }

  test("entities: named, numeric, hex decode; unknown stays; nbsp is whitespace") {
    assert(body("a &amp; b &lt;c&gt; &quot;d&quot; &apos;e&apos;") ==
      "a & b <c> \"d\" 'e'")
    assert(body("x&#65;&#x42;y") == "xABy")
    assert(body("a&nbsp;&nbsp;b") == "a b")
    assert(body("tom &jerry; &unknownentity; &#xZZ; end") ==
      "tom &jerry; &unknownentity; &#xZZ; end")
    // decoded '<' is text, not a new tag
    assert(body("&lt;p&gt;literal&lt;/p&gt;") == "<p>literal</p>")
  }

  test("whitespace collapses; edges trim; bare '<' in text is literal") {
    assert(body("  <p>  a \t\n b  </p>  ") == "a b")
    assert(body("<p>1 < 2 and 3<4</p>") == "1 < 2 and 3<4")
    assert(body("") == "")
    // attribute values with '>' do not end the tag early
    assert(body("""<a href="q?x>y" title='a>b'>link</a>""") == "link")
    // doctype and processing instructions vanish
    assert(body("<!DOCTYPE html><?xml version='1.0'?><p>t</p>") == "t")
  }

  test("blocks: per-block link-char accounting, anchors span block boundaries") {
    val (_, b1) = HtmlExtract.parse(
      "<div><a href='x'>Home page</a> now</div><p>real content here</p>")
    assert(b1.toSeq == Seq(
      HtmlExtract.Block("Home page now", 11, 8), // 'Home page' linked, 'now' not
      HtmlExtract.Block("real content here", 15, 0)))
    // an anchor left open across block tags keeps counting
    val (_, b2) = HtmlExtract.parse("<a>x<div>y</div>z</a>")
    assert(b2.toSeq == Seq(
      HtmlExtract.Block("x", 1, 1),
      HtmlExtract.Block("y", 1, 1),
      HtmlExtract.Block("z", 1, 1)))
    // stray close tags never drive the depth negative
    val (_, b3) = HtmlExtract.parse("</a></a>plain<p><a>link</a></p>")
    assert(b3.toSeq == Seq(
      HtmlExtract.Block("plain", 5, 0),
      HtmlExtract.Block("link", 4, 4)))
    // title text is not a block
    val (t4, b4) = HtmlExtract.parse("<title>T</title><p>b</p>")
    assert(t4 == "T" && b4.toSeq == Seq(HtmlExtract.Block("b", 1, 0)))
  }

  test("links: href capture — quoted, single-quoted, bare, entity-decoded; non-anchors ignored") {
    val p = HtmlExtract.parseAll(
      """<a href="http://a.example/p?x=1&amp;y=2">x</a><a href='/rel'>y</a>""" +
        """<a id="z" href=bare>z</a><a>none</a>""" +
        """<a data-href="decoy" href="/real">w</a>""" +
        """<link href="style.css"><img src="i.png">""")
    assert(p.hrefs.toSeq ==
      Seq("http://a.example/p?x=1&y=2", "/rel", "bare", "/real"))
    // anchor-text pairing: visible text per href-bearing anchor
    assert(p.anchors.toSeq == Seq(
      ("http://a.example/p?x=1&y=2", "x"), ("/rel", "y"),
      ("bare", "z"), ("/real", "w")))
  }

  test("anchors: text spans block tags; implicit close on a new <a>; entities decode") {
    val p = HtmlExtract.parseAll(
      """<a href="/one">first <b>bold</b><div>part</div></a>""" +
        """<a href="/two">A &amp; B""" + // never closed: new <a> / EOF ends it
        """<a href="/three">  spaced   text </a><a href="/empty"></a>""")
    assert(p.anchors.toSeq == Seq(
      ("/one", "first bold part"), // block boundary → one space
      ("/two", "A & B"),
      ("/three", "spaced text")))  // empty-text anchor yields no pair
  }

  test("htmlMainContent: content block kept by its own stopword density, boilerplate dropped") {
    import graft.operators.TextAnalysis
    def page(content: String) =
      "<html><body><div><a href='/'>Home</a> <a href='/a'>About</a></div>" +
        s"<p>$content</p><div>Copyright 2026</div>" +
        "<div><a href='/t'>Terms</a> <a href='/p'>Privacy policy</a></div>" +
        "</body></html>"
    val good = "the quick brown fox and the lazy dog jumped over the fence again"
    val noStops = "zzz www qqq rrr sss ttt uuu vvv kkk xxx yyy zzz mmm nnn"
    val df = Seq(
      (1L, page(good)),
      (2L, page(noStops)), // long enough, zero stopwords → dropped
      (3L, "")             // no blocks at all
    ).toDF("doc_id", "html")
    val got = TextAnalysis.htmlMainContent(df, "doc_id", "html")
      .as[(Long, String, Long, Long)].collect().sortBy(_._1)
    assert(got(0) == ((1L, good, 1L, 4L)), got(0))
    assert(got(1) == ((2L, "", 0L, 4L)), got(1))
    assert(got(2) == ((3L, "", 0L, 0L)), got(2))
  }

  test("htmlDoc: one-parse struct equals the separate title/blocks kernels") {
    val docs = graft.sources.Tables.documents(spark, sf())
      .select($"doc_id", concat(lit("<html><head><title>T"), $"doc_id",
        lit("</title></head><body><div><a href='/'>Nav</a></div><p>"),
        $"text", lit("</p></body></html>")).as("html"))
      .limit(50)
    val combined = docs.select($"doc_id",
      TextFunctions.htmlDoc($"html").getField("title").as("t"),
      TextFunctions.htmlDoc($"html").getField("blocks").as("b"))
    val separate = docs.select($"doc_id",
      TextFunctions.htmlTitle($"html").as("t"),
      TextFunctions.htmlBlocks($"html").as("b"))
    assert(combined.exceptAll(separate).count() == 0)
    assert(separate.exceptAll(combined).count() == 0)
  }

  test("column path (codegen'd kernel) matches the raw kernel on a full page") {
    val pages = (0 until 64).map { i =>
      (i.toLong,
        s"""<!DOCTYPE html><html><head><title>Page $i</title>
           |<style>body { font: 1>0 serif }</style>
           |<script>let html = "<div>nope</div>";</script></head>
           |<body><h1>Page $i</h1>
           |<!-- nav boilerplate -->
           |<div class="nav"><a href="/">Home &gt; Here</a></div>
           |<p>Body &amp; text ${"word " * (i % 5)}</p>
           |<table><tr><td>c$i</td><td>d&#33;</td></tr></table>
           |</body></html>""".stripMargin)
    }
    val df = pages.toDF("id", "html")
    val got = df.select($"id", TextFunctions.htmlTitle($"html").as("t"),
        TextFunctions.htmlText($"html").as("b"))
      .as[(Long, String, String)].collect().sortBy(_._1)
    for ((id, t, b) <- got) {
      assert(t == s"Page $id")
      assert(b == body(pages(id.toInt)._2))
      assert(b.startsWith(s"Page $id\nHome > Here\nBody & text"))
      assert(!b.contains("nope") && !b.contains("serif"))
    }
    // codegen actually engaged: over a parquet scan (a local relation
    // constant-folds to LocalTableScan) the kernel fuses into the
    // scan's WholeStageCodegen stage
    val fromScan = graft.sources.Tables.documents(spark, sf())
      .select(TextFunctions.htmlText(
        concat(lit("<p>"), $"text", lit("</p>"))).as("b"))
    val plan = fromScan.queryExecution.executedPlan.toString
    // "*(1) Project [html_text(...)" — the star IS the codegen marker
    assert(plan.contains("*(1) Project [html_text"), plan)
    assert(fromScan.limit(5).as[String].collect().forall(_ != null))
  }
}
