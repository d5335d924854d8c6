package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** robots.txt parse + verdict contract: group structure, agent
  * resolution, precedence, and the documented edge cases.
  */
class RobotsSpec extends SparkSpec {
  import spark.implicits._

  private val gnarly =
    """# crawler policy
      |User-Agent: GraftBot
      |Disallow: /private   # trailing comment
      |Allow: /private/ok
      |
      |User-agent: other
      |User-agent: *
      |Disallow: /tmp
      |Disallow:
      |Crawl-delay: 10
      |""".stripMargin

  private def robots = Seq(("h.ex", gnarly)).toDF("host", "text")

  test("parseRules: exact-agent group wins; '*' is the fallback; junk lines drop") {
    val mine = Robots.parseRules(robots, "host", "text", agent = "graftbot")
      .as[(String, String, Boolean)].collect().toSet
    assert(mine == Set(("h.ex", "/private", false), ("h.ex", "/private/ok", true)))
    // an agent the file doesn't name falls back to the '*' group; the
    // empty Disallow and the Crawl-delay line contribute no rules
    val other = Robots.parseRules(robots, "host", "text", agent = "nobody")
      .as[(String, String, Boolean)].collect().toSet
    assert(other == Set(("h.ex", "/tmp", false)))
    // BOTH user-agent tokens of a shared group get its rules
    val shared = Robots.parseRules(robots, "host", "text", agent = "other")
      .as[(String, String, Boolean)].collect().toSet
    assert(shared == Set(("h.ex", "/tmp", false)))
  }

  test("verdicts: longest prefix wins, ties go to Allow, unknown hosts pass") {
    val rules = Robots.parseRules(robots, "host", "text", agent = "graftbot")
      // add an exact tie pair on another host: equal lengths → Allow
      .unionByName(Seq(("t.ex", "/p", true), ("t.ex", "/p", false))
        .toDF("host", "prefix", "allow"))
    val urls = Seq(
      "http://h.ex/private/ok/a", // Allow /private/ok (11) > Disallow /private (8)
      "http://h.ex/private/b",    // Disallow
      "http://h.ex:8080/private/c", // port stripped → same Disallow
      "http://h.ex/else",         // no applicable rule
      "http://h.ex",              // empty path → "/": no rule matches
      "http://t.ex/p/x",          // tie → Allow
      "http://nowhere.ex/a"       // host without robots
    ).toDF("url")
    val got = Robots.verdicts(urls, "url", rules)
      .select($"url", $"allowed").as[(String, Boolean)].collect().toMap
    assert(got("http://h.ex/private/ok/a"))
    assert(!got("http://h.ex/private/b"))
    assert(!got("http://h.ex:8080/private/c"))
    assert(got("http://h.ex/else"))
    assert(got("http://h.ex"))
    assert(got("http://t.ex/p/x"))
    assert(got("http://nowhere.ex/a"))
    assert(Robots.filterAllowed(urls, "url", rules).count() == 5)
  }

  test("verdictsLit (plan-literal, zero-shuffle) agrees with the relational form") {
    val rules = Robots.parseRules(robots, "host", "text", agent = "graftbot")
      .unionByName(Seq(("t.ex", "/p", true), ("t.ex", "/p", false))
        .toDF("host", "prefix", "allow"))
    val urls = Seq(
      "http://h.ex/private/ok/a", "http://h.ex/private/b",
      "http://h.ex:8080/private/c", "http://h.ex/else", "http://h.ex",
      "http://t.ex/p/x", "http://nowhere.ex/a").toDF("url")
    val rel = Robots.verdicts(urls, "url", rules)
      .select($"url", $"allowed").as[(String, Boolean)].collect().toMap
    val lit = Robots.verdictsLit(urls, "url", rules)
      .select($"url", $"allowed").as[(String, Boolean)].collect().toMap
    assert(lit == rel, s"lit=$lit rel=$rel")
    // and it is genuinely a pure projection: no exchange in the plan
    val plan = Robots.verdictsLit(urls, "url", rules)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    // empty rule set: everything allowed
    val none = Robots.verdictsLit(urls, "url",
      Seq.empty[(String, String, Boolean)].toDF("host", "prefix", "allow"))
    assert(none.filter(!$"allowed").count() == 0)
  }

  test("rules before any User-agent group are orphans and bind nothing") {
    val r = Seq(("x.ex", "Disallow: /early\nUser-agent: *\nDisallow: /late"))
      .toDF("host", "text")
    val rules = Robots.parseRules(r, "host", "text", "anything")
      .as[(String, String, Boolean)].collect().toSet
    assert(rules == Set(("x.ex", "/late", false)))
  }

  test("parseCrawlDelay: exact-agent group wins, non-numeric drops, " +
      "repeats take the max, silent hosts absent") {
    val r = Seq(
      ("a.ex", "User-agent: graftbot\nCrawl-delay: 2\n\n" +
        "User-agent: *\nCrawl-delay: 60"),
      ("b.ex", "User-agent: *\nCrawl-delay: abc\nCrawl-delay: 5\n" +
        "Crawl-delay: 7\nDisallow: /x"),
      ("c.ex", "User-agent: *\nDisallow: /"),
      // zero means "no delay" and drops; a Long-overflowing digit run
      // (matches ^\d+$ but not the 9-digit bound) drops instead of
      // throwing CAST_OVERFLOW under ANSI mode
      ("d.ex", "User-agent: *\nCrawl-delay: 0\nCrawl-delay: 000"),
      ("e.ex", "User-agent: *\nCrawl-delay: 99999999999999999999"))
      .toDF("host", "text")
    val mine = Robots.parseCrawlDelay(r, "host", "text", "graftbot")
      .as[(String, Long)].collect().toMap
    assert(mine == Map("a.ex" -> 2L, "b.ex" -> 7L), mine.toString)
    // an unnamed agent falls back to the '*' group
    val other = Robots.parseCrawlDelay(r, "host", "text", "nobody")
      .as[(String, Long)].collect().toMap
    assert(other == Map("a.ex" -> 60L, "b.ex" -> 7L), other.toString)
  }

  test("wildcardRegex: compile goldens — '*' expands, trailing '$' anchors, " +
      "metachars and inner '$' stay literal") {
    assert(Robots.wildcardRegex("/a*b.c$") == "^/a.*b\\.c$")
    assert(Robots.wildcardRegex("/*.pdf$") == "^/.*\\.pdf$")
    assert(Robots.wildcardRegex("/plain") == "^/plain")
    assert(Robots.wildcardRegex("/q?x=(1)|[2]{3}+^") ==
      "^/q\\?x=\\(1\\)\\|\\[2\\]\\{3\\}\\+\\^")
    // a '$' that is NOT the last char is a literal dollar, not an anchor
    assert(Robots.wildcardRegex("/pa$th*") == "^/pa\\$th.*")
    // and the relational compiler produces the SAME strings
    val pats = Seq("/a*b.c$", "/*.pdf$", "/plain", "/q?x=(1)|[2]{3}+^",
      "/pa$th*")
    val rel = Robots.compileWildcardRules(
        pats.map(p => ("h.ex", p, false)).toDF("host", "prefix", "allow"))
      .select($"prefix", $"re").as[(String, String)].collect().toMap
    pats.foreach(p => assert(rel(p) == Robots.wildcardRegex(p),
      s"relational compile of '$p': ${rel(p)}"))
  }

  test("verdictsWildcard: '$' anchors, '*' spans, precedence counts the " +
      "original pattern's octets, ties to Allow") {
    val rules = Seq(
      ("w.ex", "/*.pdf$", false),     // 7 octets
      ("w.ex", "/files/ok*", true),   // 10 octets — beats the disallow
      ("w.ex", "/dl/*/tmp", false),
      // octet-count precedence between two wildcard rules
      ("w.ex", "/t/*x$", true),
      ("w.ex", "/t/*$", false)
    ).toDF("host", "prefix", "allow")
    val urls = Seq(
      "http://w.ex/files/ok1.pdf",  // both match → Allow is longer
      "http://w.ex/files/no1.pdf",  // only the pdf disallow
      "http://w.ex/files/no1.pdfz", // '$' anchor: no match → allowed
      "http://w.ex/dl/a/b/tmp/x",   // '*' spans slashes (RFC: any chars)
      "http://w.ex/t/zzx",          // "/t/*x$" (6) beats "/t/*$" (5) → Allow
      "http://w.ex/t/zzq"           // only "/t/*$" → Disallow
    ).toDF("url")
    val got = Robots.verdictsWildcard(urls, "url", rules)
      .select($"url", $"allowed").as[(String, Boolean)].collect().toMap
    assert(got("http://w.ex/files/ok1.pdf"))
    assert(!got("http://w.ex/files/no1.pdf"))
    assert(got("http://w.ex/files/no1.pdfz"))
    assert(!got("http://w.ex/dl/a/b/tmp/x"))
    assert(got("http://w.ex/t/zzx"))
    assert(!got("http://w.ex/t/zzq"))
  }

  test("precedence counts UTF-8 OCTETS, not characters (RFC 9309 'most " +
      "octets'): a shorter-in-chars but longer-in-bytes rule wins") {
    // "/éé*" = 4 chars / 6 octets (allow); "/*abc" = 5 chars / 5 octets
    // (disallow). Both match "/ééabc". Character-count precedence would
    // pick the disallow; the RFC's octet count picks the allow.
    val rules = Seq(
      ("o.ex", "/éé*", true),
      ("o.ex", "/*abc", false)).toDF("host", "prefix", "allow")
    val urls = Seq("http://o.ex/ééabc").toDF("url")
    val rel = Robots.verdictsWildcard(urls, "url", rules)
      .select($"allowed").as[Boolean].head()
    val lit = Robots.verdictsWildcardLit(urls, "url", rules)
      .select($"allowed").as[Boolean].head()
    assert(rel, "relational wildcard form must rank by octets")
    assert(lit, "plan-literal wildcard form must rank by octets")
  }

  test("wildcard forms subsume the prefix forms on wildcard-free rules, " +
      "and the plan-literal twin agrees and stays exchange-free") {
    val rules = Robots.parseRules(robots, "host", "text", agent = "graftbot")
      .unionByName(Seq(("t.ex", "/p", true), ("t.ex", "/p", false),
        ("w.ex", "/*.pdf$", false), ("w.ex", "/files/ok*", true))
        .toDF("host", "prefix", "allow"))
    val urls = Seq(
      "http://h.ex/private/ok/a", "http://h.ex/private/b",
      "http://h.ex:8080/private/c", "http://h.ex/else", "http://h.ex",
      "http://t.ex/p/x", "http://nowhere.ex/a",
      "http://w.ex/files/ok1.pdf", "http://w.ex/x.pdf", "http://w.ex/x.pdfz"
    ).toDF("url")
    val wild = Robots.verdictsWildcard(urls, "url", rules)
      .select($"url", $"allowed").as[(String, Boolean)].collect().toMap
    // prefix-rule subset: identical verdicts to the prefix matcher
    val prefixOnly = Robots.verdicts(urls, "url",
        rules.filter($"host" =!= "w.ex"))
      .select($"url", $"allowed").as[(String, Boolean)].collect().toMap
    prefixOnly.keys.filterNot(_.startsWith("http://w.ex")).foreach { u =>
      assert(wild(u) == prefixOnly(u), s"subsumption broke on $u")
    }
    val litw = Robots.verdictsWildcardLit(urls, "url", rules)
      .select($"url", $"allowed").as[(String, Boolean)].collect().toMap
    assert(litw == wild, s"lit=$litw rel=$wild")
    val plan = Robots.verdictsWildcardLit(urls, "url", rules)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("parseSitemaps: global directive — any case, any position, " +
      "comments strip, duplicates collapse, agent groups ignored") {
    import spark.implicits._
    val robots = Seq(
      ("h1", "Sitemap: http://h1/s1.xml\n" +
        "User-agent: googlebot\nDisallow: /\n" +
        "sitemap:http://h1/s2.xml   # trailing comment\n" +
        "User-agent: *\nAllow: /\n" +
        "SITEMAP:  http://h1/s1.xml"), // dup of s1 → collapses
      ("h2", "User-agent: *\nDisallow: /private\n# Sitemap: http://no"),
      ("h3", "Sitemap:")) // empty value drops
      .toDF("host", "text")
    val got = Robots.parseSitemaps(robots, "host", "text")
      .as[(String, String)].collect().sorted.toSeq
    assert(got == Seq(("h1", "http://h1/s1.xml"), ("h1", "http://h1/s2.xml")))
  }
}
