package graft.operators

import graft.SparkSpec
import graft.functions.Sketches
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("tokenStats: words vs regex tokens vs chars") {
    val got = TextAnalysis.tokenStats(
      Seq((1L, "ab cd3 ef")).toDF("doc_id", "text"), "doc_id", "text").head()
    assert(got.getInt(1) == 3)      // words
    assert(got.getInt(2) == 4)      // ab, cd, 3, ef
    assert(got.getInt(3) == 9)
  }

  test("qualityScore: hand-computed ratios") {
    val got = TextAnalysis.qualityScore(
      Seq((1L, "the cat sat")).toDF("doc_id", "text"), "doc_id", "text").head()
    assert(got.getDouble(1) == math.rint((3 + 3 + 3) / 3.0 * 1e6) / 1e6) // mean_wlen 3.0
    assert(got.getDouble(2) == math.rint(1.0 / 3.0 * 1e6) / 1e6)         // stopword 1/3
  }

  test("bpeTrainMerges: hand-computed merges on a toy corpus, deterministic") {
    // corpus: "low low low lower lowest"
    //   word counts: low:3, lower:1, lowest:1
    //   pair counts round 1: (l,o):5 (o,w):5 (w,e):2 (e,r):1 (e,s):1 (s,t):1
    //   tie (l,o) vs (o,w) breaks on left asc -> (l,o) first
    //   round 2: (lo,w):5 wins; round 3: (low,e):2
    val docs = Seq((1L, "low low low lower lowest")).toDF("doc_id", "text")
    val m = TextAnalysis.bpeTrainMerges(docs, "text", numMerges = 3)
      .as[(Int, String, String, Long)].collect().toSeq
    assert(m == Seq(
      (0, "l", "o", 5L),
      (1, "lo", "w", 5L),
      (2, "low", "e", 2L)))
    // deterministic under repartition
    val m2 = TextAnalysis.bpeTrainMerges(
        docs.union(docs).repartition(7).except(docs.limit(0)).distinct(), "text", 3)
      .as[(Int, String, String, Long)].collect().toSeq
    assert(m2.map(t => (t._1, t._2, t._3)) == m.map(t => (t._1, t._2, t._3)))
  }

  test("bpeEncode: learned merges tokenize as trained; unseen text falls back to chars") {
    val docs = Seq((1L, "low low low lower lowest")).toDF("doc_id", "text")
    val merges = TextAnalysis.bpeTrainMerges(docs, "text", numMerges = 3)
      .as[(Int, String, String, Long)].collect().toSeq
      .sortBy(_._1).map(t => (t._2, t._3)) // rank order is the replay order
    val enc = TextAnalysis.bpeEncode(
        Seq((1L, "low lower"), (2L, "zz")).toDF("doc_id", "text"),
        "doc_id", "text", merges)
      .orderBy($"doc_id")
      .as[(Long, Seq[String], Int)].collect()
    // merges: (l,o), (lo,w), (low,e) → "low"=[low], "lower"=[lowe,r]
    assert(enc(0)._2 == Seq("low", "lowe", "r"))
    assert(enc(0)._3 == 3)
    assert(enc(1)._2 == Seq("z", "z")) // no merge covers zz
  }

  test("markerCounts kernel ≡ the interpreted HOF formulation (lockstep guard)") {
    // the fused MarkerCounts expression replaced aggregate/transform/
    // filter(isin) lambda chains in qualityScore/langId; this is the
    // cross-implementation check — either side drifting alone goes red
    val docs = graft.sources.Tables.documents(spark, sf())
      .select(col("doc_id").as("id"), col("text"))
      .unionByName(Seq(
        (900001L, ""),                      // empty → one empty token
        (900002L, "a  b"),                  // double space → empty token
        (900003L, "the the the"),           // all stopwords
        (900004L, " leading and trailing ") // boundary empties
      ).toDF("id", "text"))
    val stop = TextAnalysis.DefaultStopwords
    val w = split(col("text"), " ")
    val hof = docs.select(col("id"),
      size(w).as("n_words"),
      aggregate(transform(w, x => length(x)), lit(0), (acc, x) => acc + x)
        .as("sum_len"),
      size(filter(w, x => x.isin(stop.map(s => s: Any): _*))).as("hits0"))
      .as[(Long, Int, Int, Int)].collect().sortBy(_._1).toSeq
    val kernel = docs.select(col("id"),
      graft.functions.TextFunctions.markerCounts(col("text"), Seq(stop)).as("mc"))
      .select(col("id"), col("mc.n_words"), col("mc.sum_len"),
        element_at(col("mc.hits"), 1))
      .as[(Long, Int, Int, Int)].collect().sortBy(_._1).toSeq
    assert(kernel == hof)
    // and the public operators agree with their pre-kernel outputs
    val q = TextAnalysis.qualityScore(docs, "id", "text")
      .orderBy("id").collect()
    val nW = size(w).cast("double")
    val nS = size(filter(w, x => x.isin(stop.map(s => s: Any): _*))).cast("double")
    val qOld = docs.select(col("id"),
        round(aggregate(transform(w, x => length(x)), lit(0), (acc, x) => acc + x)
          .cast("double") / size(w), 6).as("mean_wlen"),
        round(nS / size(w), 6).as("stopword_ratio"),
        round(least(nW / 100.0, lit(1.0)) * 0.5 + (lit(1.0) - nS / size(w)) * 0.5, 6)
          .as("quality"))
      .orderBy("id").collect()
    assert(q.toSeq == qOld.toSeq)
  }

  test("bpeEncode: 5000-merge vocabulary (broadcast path) encodes correctly") {
    // production-shaped vocabulary size: the merge list rides a real
    // sparkContext.broadcast — 4999 inert merges pad the table, the
    // live ones must still fire in rank order through the replay
    val merges = Seq(("l", "o"), ("lo", "w")) ++
      (1 to 4998).map(i => (s"⟨x$i⟩", s"⟨y$i⟩"))
    val enc = TextAnalysis.bpeEncode(
        Seq((1L, "low lower zz")).toDF("doc_id", "text"),
        "doc_id", "text", merges)
      .as[(Long, Seq[String], Int)].head()
    assert(enc._2 == Seq("low", "low", "e", "r", "z", "z"))
    assert(enc._3 == 6)
  }

  test("bpeTrainMerges: stops early when no pairs remain") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text") // single-char words
    val m = TextAnalysis.bpeTrainMerges(docs, "text", numMerges = 5)
    assert(m.count() == 0)
  }

  test("perplexityScore: hand-computed bigram model on a toy corpus") {
    // corpus: "a b a b" + "a b" + "solo" → cu(a)=3, cu(b)=3,
    // cu(solo)=1, V=3, cb(a,b)=3, cb(b,a)=1, alpha=0.5
    val docs = Seq((1L, "a b a b"), (2L, "a b"), (3L, "solo"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.perplexityScore(docs, "doc_id", "text")
      .orderBy($"doc_id").as[(Long, Long, Double)].collect()
    val pAB = (3 + 0.5) / (3 + 0.5 * 3) // p(b|a) = 3.5/4.5
    val pBA = (1 + 0.5) / (3 + 0.5 * 3) // p(a|b) = 1.5/4.5
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    val exp1 = r6(math.exp((2 * -math.log(pAB) + -math.log(pBA)) / 3))
    val exp2 = r6(math.exp(-math.log(pAB)))
    assert(got.length == 2) // "solo" has no bigram, no row
    assert(got(0) == ((1L, 3L, exp1)))
    assert(got(1) == ((2L, 1L, exp2)))
    // the natural-text property: a shuffled-vocabulary doc scores
    // HIGHER than a repeated-template doc under the corpus model
    val corpus = Seq((1L, "the cat sat on the mat " * 20),
      (2L, "mat the on sat zq cat xv the xw on"))
      .toDF("doc_id", "text")
    val ppl = TextAnalysis.perplexityScore(corpus, "doc_id", "text")
      .orderBy($"doc_id").as[(Long, Long, Double)].collect()
    assert(ppl(0)._3 < ppl(1)._3, ppl.mkString(", "))
  }

  test("knPerplexityScore: hand-computed Kneser-Ney bigram model") {
    // corpus: "a b a b" + "a b c" → bigram types (a,b):3 (b,a):1 (b,c):1
    //   T=3; left a: cw1=3 tw1=1; b: cw1=2 tw1=2
    //   continuation: nw2(a)=1 nw2(b)=1 nw2(c)=1; D=0.75
    val docs = Seq((1L, "a b a b"), (2L, "a b c")).toDF("doc_id", "text")
    val got = TextAnalysis.knPerplexityScore(docs, "doc_id", "text")
      .orderBy($"doc_id").as[(Long, Long, Double)].collect()
    val pAB = (3 - 0.75) / 3 + 0.75 * 1 / 3.0 * (1 / 3.0) // 5/6
    val pBA = (1 - 0.75) / 2 + 0.75 * 2 / 2.0 * (1 / 3.0) // 0.375
    val pBC = pBA // same counts shape
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    val exp1 = r6(math.exp((2 * -math.log(pAB) + -math.log(pBA)) / 3))
    val exp2 = r6(math.exp((-math.log(pAB) + -math.log(pBC)) / 2))
    assert(got.toSeq == Seq((1L, 3L, exp1), (2L, 2L, exp2)))
  }

  test("knPerplexityScore: p(.|w1) is a proper distribution over the vocab") {
    // the KN invariant the add-alpha model also has but for a different
    // reason: discount mass given back via continuation probabilities
    // sums each context's distribution to exactly 1 over the vocabulary
    val docs = Seq((1L, "a b a b"), (2L, "a b c")).toDF("doc_id", "text")
    val d = 0.75
    // context a: seen (a,b) cb=3, cw1=3, tw1=1; unseen a,c back off only
    val cont = Map("a" -> 1.0, "b" -> 1.0, "c" -> 1.0) // nw2/T with T=3
    val pSeen = (3 - d) / 3 + d * 1 / 3.0 * (cont("b") / 3.0)
    val pUnseen = d * 1 / 3.0 * (cont("a") / 3.0)
    assert(math.abs(pSeen + 2 * pUnseen - 1.0) < 1e-12)
    // and the operator agrees with the closed form for the seen bigram
    val ppl = TextAnalysis.knPerplexityScore(
        docs.filter($"doc_id" === 1L).limit(1).select($"doc_id",
          org.apache.spark.sql.functions.lit("a b").as("text")),
        "doc_id", "text")
      .as[(Long, Long, Double)].head()
    // single-bigram corpus: (1-D)/1 + D*1*(1/1) = 1 exactly → ppl 1.0
    assert(ppl == ((1L, 1L, 1.0)))
  }

  test("knPerplexityScore: predictable-but-frequent words back off low " +
      "(the Kneser-Ney signature add-alpha lacks)") {
    // 'f' is FREQUENT (many tokens) but always follows the single
    // context 'san' — its continuation count is 1. 'r' is rarer but
    // follows many distinct contexts. After a novel context 'x' (seen
    // in training with other continuations), KN must prefer r over f;
    // an add-alpha bigram model scores them identically (both unseen
    // after x, same smoothing mass).
    val docs = Seq(
      (1L, "san f san f san f san f san f san f"),
      (2L, "a r b r c r d r e r"),
      (3L, "x q x q x p")).toDF("doc_id", "text")
    val testF = Seq((10L, "x f")).toDF("doc_id", "text")
    val testR = Seq((11L, "x r")).toDF("doc_id", "text")
    // score test docs under the corpus model: union scoring doc into the
    // corpus changes the model, so instead compare the model terms
    // directly via the two corpora being identical except the last token
    val pplF = TextAnalysis.knPerplexityScore(docs.union(testF), "doc_id", "text")
      .filter($"doc_id" === 10L).as[(Long, Long, Double)].head()._3
    val pplR = TextAnalysis.knPerplexityScore(docs.union(testR), "doc_id", "text")
      .filter($"doc_id" === 11L).as[(Long, Long, Double)].head()._3
    assert(pplR < pplF,
      s"KN should rank the many-context word likelier: r=$pplR f=$pplF")
  }

  test("knTrigramPerplexityScore: hand-computed three-level model") {
    // d1 "a b c a b c": trigram types abc:2 bca:1 cab:1; d2 "a b d": abd:1
    //   l2(a,b): cw12=3 tw12=2; l2(b,c)=l2(c,a): 1,1
    //   mid (b,c)(c,a)(a,b)(b,d) all 1; midl b: nmid=2 t2=2; a,c: 1,1
    //   bigram types (a,b):3 (b,c):2 (c,a):1 (b,d):1 -> T=4, all nw3=1
    val docs = Seq((1L, "a b c a b c"), (2L, "a b d")).toDF("doc_id", "text")
    val got = TextAnalysis.knTrigramPerplexityScore(docs, "doc_id", "text")
      .orderBy($"doc_id").as[(Long, Long, Double)].collect()
    val D = 0.75
    def p2c(n12: Long, nmid: Long, t2: Long, nw3: Long) =
      (n12 - D) / nmid + D * t2 / nmid * (nw3 / 4.0)
    val pABC = (2 - D) / 3 + D * 2 / 3.0 * p2c(1, 2, 2, 1)
    val pBCA = (1 - D) / 1 + D * 1 / 1.0 * p2c(1, 1, 1, 1)
    val pCAB = (1 - D) / 1 + D * 1 / 1.0 * p2c(1, 1, 1, 1)
    val pABD = (1 - D) / 3 + D * 2 / 3.0 * p2c(1, 2, 2, 1)
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    val exp1 = r6(math.exp(
      (2 * -math.log(pABC) + -math.log(pBCA) + -math.log(pCAB)) / 4))
    val exp2 = r6(math.exp(-math.log(pABD)))
    assert(got.toSeq == Seq((1L, 4L, exp1), (2L, 1L, exp2)))
    // a 2-word doc has no trigram and must be absent, not crash
    val tiny = Seq((9L, "x y")).toDF("doc_id", "text")
    assert(TextAnalysis.knTrigramPerplexityScore(
      docs.union(tiny), "doc_id", "text")
      .filter($"doc_id" === 9L).count() == 0)
  }

  test("knTrigramPerplexityScore: both backoff levels are proper distributions") {
    // context (a,b) over vocab {a,b,c,d} with the corpus above:
    // p2c(.|b) sums to 1 (continuation level), and p3(.|a,b) sums to 1
    // (trigram level hands its discount mass down intact)
    val D = 0.75
    def p2cSeen(n12: Long) = (n12 - D) / 2 + D * 2 / 2.0 * (1 / 4.0)
    val p2cUnseen = D * 2 / 2.0 * (1 / 4.0) // backoff-only (a, b)
    val sumP2c = p2cSeen(1) + p2cSeen(1) + 2 * p2cUnseen // c, d, a, b
    assert(math.abs(sumP2c - 1.0) < 1e-12)
    val sumP3 = ((2 - D) + (1 - D)) / 3 + D * 2 / 3.0 * sumP2c
    assert(math.abs(sumP3 - 1.0) < 1e-12)
  }

  test("canonicalUrl: every rule, one assertion each") {
    import graft.functions.TextFunctions
    def canon(raw: String): String =
      Seq(Tuple1(raw)).toDF("u")
        .select(TextFunctions.canonicalUrl($"u")).as[String].head()
    // case + default port + fragment + tracking + param order, together
    assert(canon("HTTPS://Ex.COM:443/p/1?utm_source=x&b=2&a=1#frag")
      == "https://ex.com/p/1?a=1&b=2")
    assert(canon("http://a.com:80/x") == "http://a.com/x")   // http default port
    assert(canon("http://a.com:8080/x") == "http://a.com:8080/x") // real port kept
    assert(canon("https://a.com:80/x") == "https://a.com:80/x")   // not https' default
    assert(canon("http://a.com") == "http://a.com/")          // empty path → /
    assert(canon("http://a.com/P/Q") == "http://a.com/P/Q")   // path case kept
    assert(canon("http://a.com/x?fbclid=1&gclid=2&ref=h") == "http://a.com/x")
    assert(canon("http://a.com/x?z=1&y=2&z=0") == "http://a.com/x?y=2&z=0&z=1")
    // two raw forms of one logical URL collapse; distinct URLs don't
    assert(canon("HTTP://A.com/x?b=1&a=1#s") == canon("http://a.com/x?a=1&b=1"))
    assert(canon("http://a.com/x") != canon("https://a.com/x"))
  }

  test("registeredDomain: eTLD+1 heuristic — plain TLD, multi-part " +
      "suffix, bare domain, deep subdomain, IP passthrough") {
    import graft.functions.TextFunctions
    def rd(h: String): String =
      Seq(Tuple1(h)).toDF("h")
        .select(TextFunctions.registeredDomain($"h")).as[String].head()
    assert(rd("www.example.com") == "example.com")
    assert(rd("a.b.c.example.com") == "example.com")
    assert(rd("example.com") == "example.com")
    assert(rd("www.example.co.uk") == "example.co.uk")
    assert(rd("a.b.example.co.uk") == "example.co.uk")
    assert(rd("example.co.jp") == "example.co.jp") // already eTLD+1
    assert(rd("localhost") == "localhost")
    assert(rd("192.168.0.1") == "192.168.0.1")
  }

  test("bpeTrainMerges restores the loop's shuffle-partitions override") {
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    TextAnalysis.bpeTrainMerges(
      Seq((1L, "low low lower")).toDF("doc_id", "text"), "text", 2).collect()
    assert(spark.conf.get("spark.sql.shuffle.partitions") == before)
  }

  test("repetitionStats: hand-computed fractions, single-word edge") {
    val df = Seq(
      (1L, "a a a b"),      // top a: 3/4; dup words: (4-2)/4; bigrams: {a a, a a, a b} → (3-2)/3
      (2L, "x y z w"),      // no repetition anywhere
      (3L, "solo")          // one word, zero bigrams → dup_2gram_frac 0.0
    ).toDF("doc_id", "text")
    val got = TextAnalysis.repetitionStats(df, "doc_id", "text")
      .orderBy($"doc_id")
      .as[(Long, Double, Double, Double)].collect()
    assert(got(0) == ((1L, 0.75, 0.5, math.rint(1.0 / 3.0 * 1e6) / 1e6)))
    assert(got(1) == ((2L, 0.25, 0.0, 0.0)))
    assert(got(2) == ((3L, 1.0, 0.0, 0.0)))
  }

  test("langId: marker argmax, tie preference, und fallback") {
    val df = Seq(
      (1L, "the cat and dog"),   // en
      (2L, "der hund und die"),  // de
      (3L, "xyz qqq www"),       // und
      (4L, "the der")            // tie en/de → en (preference order)
    ).toDF("doc_id", "text")
    val got = TextAnalysis.langId(df, "doc_id", "text")
      .orderBy("doc_id").select("lang_pred").as[String].collect()
    assert(got.toSeq == Seq("en", "de", "und", "en"))
  }

  test("fingerprints: md5 prefix matches reference impl; rolling hash deterministic") {
    val df = Seq((1L, "Hello  World"), (2L, "hello world")).toDF("doc_id", "text")
    val rows = TextAnalysis.fingerprints(df, "doc_id", "text").orderBy("doc_id").collect()
    // normalization: lower + collapse spaces → both rows identical fingerprints
    assert(rows(0).getString(1) == rows(1).getString(1))
    assert(rows(0).getLong(2) == rows(1).getLong(2))
    val expected = java.security.MessageDigest.getInstance("MD5")
      .digest("hello world".getBytes("UTF-8")).map("%02x".format(_)).mkString.take(16)
    assert(rows(0).getString(1) == expected)
  }

  test("bm25TopK: hand-computed scores, absent-term docs excluded, k bound") {
    // 3 docs, query = {x}: doc 1 has x twice in 4 tokens, doc 2 once in
    // 2 tokens, doc 3 never (must be absent). N=3, df(x)=2,
    // idf = ln(1 + 1.5/2.5); avgdl = 8/3.
    val docs = Seq(
      (1L, "x y x z"),
      (2L, "x y"),
      (3L, "a b")).toDF("doc_id", "text")
    val got = TextAnalysis.bm25TopK(docs, "doc_id", "text", Seq("x"), k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    def score(tf: Long, dl: Long): Double = {
      val idf = math.log(1.0 + (3L - 2L + 0.5) / (2L + 0.5))
      val avgdl = 8.0 / 3L
      val raw = idf * tf * (1.2 + 1.0) /
        (tf + 1.2 * ((1.0 - 0.75) + 0.75 * dl / avgdl))
      BigDecimal(raw).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val s1 = score(2, 4); val s2 = score(1, 2)
    // doc 1: higher tf but longer; compute decides the order
    val expected = Seq(1L -> s1, 2L -> s2).sortBy { case (id, s) => (-s, id) }
    assert(got.toSeq == expected)
    // k truncates: k=1 keeps only the winner
    val top1 = TextAnalysis.bm25TopK(docs, "doc_id", "text", Seq("x"), k = 1)
      .collect().map(_.getLong(0)).toSeq
    assert(top1 == Seq(expected.head._1))
  }

  test("bm25FieldedTopK: hand-computed two-field scores — a short " +
      "high-weight anchor hit outranks a body hit, any-field df") {
    // query {x}; fields body (w=1) + anchor (w=2). doc 1 has x in a
    // long body, doc 2 ONLY in its short anchor profile, doc 3 never.
    // N=3; df(x)=2 counts doc 2's anchor-only hit; avg body len 12/3,
    // avg anchor len 4/3 (the empty profile tokenizes to one "" token,
    // same as the catalog query's coalesce('')).
    val docs = Seq(
      (1L, "x a b c d e f g", ""),
      (2L, "a b", "x y"),
      (3L, "p q", "")).toDF("doc_id", "text", "anchor")
    val got = TextAnalysis.bm25FieldedTopK(docs, "doc_id",
        Seq(("text", 1.0), ("anchor", 2.0)), Seq("x"), k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    def score(x: Double): Double = {
      val idf = math.log(1.0 + (3L - 2L + 0.5) / (2L + 0.5))
      val raw = idf * x * (1.2 + 1.0) / (1.2 + x)
      BigDecimal(raw).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val x1 = 1.0 * 1L / ((1.0 - 0.75) + 0.75 * 8L / (12L.toDouble / 3L)) + 0.0
    val x2 = 0.0 + 2.0 * 1L / ((1.0 - 0.75) + 0.75 * 2L / (4L.toDouble / 3L))
    assert(got.toSeq == Seq(2L -> score(x2), 1L -> score(x1)),
      got.toSeq.toString) // anchor-boosted doc 2 wins; doc 3 absent
  }

  test("bm25FieldedTopK with one weight-1 field reduces to bm25TopK") {
    val docs = Seq(
      (1L, "x y x z"),
      (2L, "x y"),
      (3L, "a b")).toDF("doc_id", "text")
    val plain = TextAnalysis.bm25TopK(docs, "doc_id", "text", Seq("x"), k = 10)
      .as[(Long, Double)].collect().toMap
    val fielded = TextAnalysis.bm25FieldedTopK(docs, "doc_id",
        Seq(("text", 1.0)), Seq("x"), k = 10)
      .as[(Long, Double)].collect().toMap
    // algebraically identical; round(,6) absorbs the operand regrouping
    assert(fielded == plain, s"fielded=$fielded plain=$plain")
  }

  test("classifierScore: independent reimplementation, bigram toggle, empty text") {
    // independent scorer: BigInt Rabin–Karp (base 131, mod 2^61−1) over
    // UTF-8 bytes + the IdHash reference function — same spec the
    // engine kernels implement, rebuilt from the definitions
    val P = BigInt(2).pow(61) - 1
    def t61(s: String): Long =
      s.getBytes("UTF-8").zipWithIndex.map { case (b, i) =>
        BigInt(b & 0xFF) * BigInt(131).modPow(i, P) % P
      }.sum.mod(P).toLong
    val B = 64
    val weights = Array.tabulate(B)(j =>
      (graft.functions.IdHash.hash(j.toLong) % 2001L - 1000L).toInt)
    def score(text: String, bigrams: Boolean): (Long, Double) = {
      val ws = text.split(" ", -1).toSeq
      val grams = if (bigrams) ws ++ ws.zip(ws.drop(1)).map(p => s"${p._1} ${p._2}")
                  else ws
      val s = grams.map(g =>
        weights((graft.functions.IdHash.hash(t61(g)) % B).toInt).toLong).sum
      (grams.size.toLong, 0.0 + (1e-3 * s) / grams.size)
    }
    val docs = Seq((1L, "the cat sat on the mat"), (2L, ""), (3L, "word"),
        (4L, null: String))
      .toDF("doc_id", "text")
    for (bigrams <- Seq(true, false)) {
      val got = TextAnalysis.classifierScore(docs, "doc_id", "text", weights,
          addBigrams = bigrams)
        .orderBy("doc_id")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      val want = Seq((1L, "the cat sat on the mat"), (2L, ""), (3L, "word"))
        .map { case (id, t) =>
          val (n, l) = score(t, bigrams); (id, n, Some(l))
        } :+ ((4L, 0L, None)) // NULL text survives as (id, 0, NULL)
      assert(got.toSeq === want, s"bigrams=$bigrams")
    }
    // empty text still scores: split keeps one empty token
    assert(score("", bigrams = true)._1 === 1L)
    // partitioning-invariant (integer sums are order-free)
    val a = TextAnalysis.classifierScore(docs.repartition(7), "doc_id", "text",
      weights).orderBy("doc_id").collect()
    val b = TextAnalysis.classifierScore(docs.coalesce(1), "doc_id", "text",
      weights).orderBy("doc_id").collect()
    assert(a.toSeq === b.toSeq)
  }

  test("rollingHash: known polynomial value and shift property") {
    val p = (1L << 61) - 1
    def ref(s: String): Long = {
      var h = BigInt(0); var pow = BigInt(1)
      s.getBytes("UTF-8").foreach { b =>
        h = (h + BigInt(b & 0xFF) * pow) % p
        pow = pow * 131 % p
      }
      h.toLong
    }
    val inputs = Seq("a", "ab", "hello world", "", "Ünïcødé £ text")
    val got = inputs.toDF("s").select(Sketches.rollingHash(col("s"))).as[Long].collect()
    assert(got.toSeq == inputs.map(ref))
  }

  test("scrubPii: email/IP/phone redacted, host of an email never half-eaten") {
    val rows = Seq(
      "mail bob.smith+x@corp.example.org now",
      "server at 192.168.0.1 port 80",
      "call 555-123-4567 today",
      "mixed a@b.io 10.0.0.7 555-000-1111",
      "no pii here 1234",                    // short digits untouched
      "v1.2.3.4.5 semvers stay")             // 5 octets: first 4 match
      .toDF("text")
    val got = rows.select(graft.functions.TextFunctions.scrubPii(col("text")))
      .as[String].collect().toSeq
    assert(got(0) == "mail <EMAIL> now")
    assert(got(1) == "server at <IP> port 80")
    assert(got(2) == "call <PHONE> today")
    assert(got(3) == "mixed <EMAIL> <IP> <PHONE>")
    assert(got(4) == "no pii here 1234")
    // \b is a word boundary, not a token boundary: 'v1' has no
    // boundary between v and 1, so the IP match starts at the '2' —
    // a documented (and RE2-identical) quirk of \b-anchored scrubbing
    assert(got(5) == "v1.<IP> semvers stay", got(5))
  }

  test("urlHosts + registrableDomain: extraction order, case folding, bare hosts") {
    val rows = Seq(
      "see https://CDN3.Assets.Example.COM/p/1 then http://mirror.blocked.net/x",
      "plain text no links",
      "ftp://not.matched.org but https://a-b.x9.io/q?z=1",
      "http://localhost/health")
      .toDF("text")
    val hosts = rows.select(
        graft.functions.TextFunctions.urlHosts(col("text")).as("h"))
      .as[Seq[String]].collect().toSeq
    assert(hosts(0) == Seq("cdn3.assets.example.com", "mirror.blocked.net"))
    assert(hosts(1).isEmpty)
    assert(hosts(2) == Seq("a-b.x9.io")) // ftp scheme ignored
    assert(hosts(3) == Seq("localhost"))
    val doms = hosts.flatten.toDF("host")
      .select(graft.functions.TextFunctions.registrableDomain(col("host")))
      .as[String].collect().toSeq
    assert(doms == Seq("example.com", "blocked.net", "x9.io", "localhost"))
  }

  test("dsirLogWeights: target-like docs score above target-unlike; zero-sum sanity") {
    // raw corpus: half 'alpha beta' style (the target), half 'zulu yankee'
    val raw = (0L until 20L).map { i =>
      if (i < 10) (i, "alpha beta gamma alpha beta")
      else (i, "zulu yankee xray zulu yankee")
    }.toDF("doc_id", "text")
    val target = raw.filter(col("doc_id") < 10)
    val got = TextAnalysis.dsirLogWeights(raw, target, "doc_id", "text")
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(got.length == 20)
    val (tgt, rest) = got.partition(_._1 < 10)
    // every target-like doc outranks every target-unlike doc
    assert(tgt.map(_._3).min > rest.map(_._3).max)
    // target-like docs score positive (their grams are ~2x as likely
    // under target as under raw), target-unlike negative
    assert(tgt.forall(_._3 > 0) && rest.forall(_._3 < 0))
    // identical texts get identical weights
    assert(tgt.map(_._3).distinct.length == 1)
    assert(got.forall(_._2 == 9L)) // 5 unigrams + 4 bigrams
  }

  test("gopherRules: hand-computed signals on a multi-line doc") {
    // words (space-split, empties kept): the|a|x\n-|b|c...\n### -> 5
    // lines: "the a x" / "- b c..." / "###" -> 3
    val got = TextAnalysis.gopherRules(
      Seq((1L, "the a x\n- b c...\n###")).toDF("doc_id", "text"),
      "doc_id", "text").head()
    assert(got.getLong(1) == 5L)                        // n_words
    assert(got.getDouble(2) == 3.2)                     // (3+1+3+1+8)/5
    assert(got.getDouble(3) == 0.8)                     // 3x'#' + 1x'...' over 5
    assert(got.getDouble(4) == 0.333333)                // 1 bullet line of 3
    assert(got.getDouble(5) == 0.333333)                // 1 ellipsis-end line of 3
    assert(got.getDouble(6) == 1.0)                     // every word has a letter
    assert(got.getLong(7) == 2L)                        // the, a
    assert(got.getInt(8) == 0)                          // n_words < 50 fails
  }

  test("gopherRules: a clean long doc passes") {
    val text = (("the cats and dogs run to a tree in town " * 6).trim)
    val got = TextAnalysis.gopherRules(
      Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text").head()
    assert(got.getLong(1) == 60L)
    assert(got.getInt(8) == 1)
  }

  private def exactHH(df: org.apache.spark.sql.DataFrame, num: Long,
      den: Long): Set[(String, Long, Long)] = {
    val toks = df.select(explode(split(col("text"), " ")).as("tok"))
    val n = toks.count()
    toks.groupBy("tok").count()
      .filter(col("count") * den >= n * num)
      .as[(String, Long)].collect().map(t => (t._1, t._2, n)).toSet
  }

  test("heavyHitters: exact vs naive groupBy, any partitioning, capacity far below vocab") {
    // 600 distinct rare tokens (one occurrence each) + 2 hot tokens
    // carrying ~40% of mass: vocab 602 >> capacity 13 forces constant
    // Misra-Gries decrement rounds in every partition
    val docs = (0L until 200L).map { i =>
      (i, s"hot cold r${3 * i} r${3 * i + 1} r${3 * i + 2}")
    }.toDF("doc_id", "text")
    val want = exactHH(docs, 1L, 10L) // threshold 100 of 1000: {hot, cold}
    assert(want.map(_._1) == Set("hot", "cold"))
    for (p <- Seq(1, 7, 32)) {
      val got = TextAnalysis.heavyHitters(docs.repartition(p), "text",
          thetaNum = 1L, thetaDen = 10L, capacity = 13)
        .as[(String, Long, Long)].collect().toSet
      assert(got == want, s"partitions=$p")
    }
  }

  test("heavyHitters: integer threshold boundary is inclusive and exact") {
    // 10 tokens total; theta=1/5 -> threshold exactly 2: a count-2
    // token is IN, count-1 is OUT
    val docs = Seq((1L, "a a b b b c d e f g")).toDF("doc_id", "text")
    val got = TextAnalysis.heavyHitters(docs, "text", 1L, 5L, capacity = 8)
      .as[(String, Long, Long)].collect().toSet
    assert(got == Set(("a", 2L, 10L), ("b", 3L, 10L)))
  }

  test("heavyHitters: empty tokens from doubled spaces count like the oracle's") {
    val docs = Seq((1L, "x  x  x y")).toDF("doc_id", "text") // "", "" are tokens
    val got = TextAnalysis.heavyHitters(docs, "text", 1L, 3L, capacity = 8)
      .as[(String, Long, Long)].collect().toSet
    // 6 tokens: x:3, "":2, y:1; threshold ceil(6/3)=2
    assert(got == Set(("x", 3L, 6L), ("", 2L, 6L)))
  }

  test("heavyHitters: rejects a capacity too small for the guarantee") {
    val docs = Seq((1L, "a b")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      TextAnalysis.heavyHitters(docs, "text", 1L, 500L, capacity = 400)
    }
  }

  test("collocationsPmi: hand-computed PMI, minCount prunes, ties break on words") {
    // corpus: "x y" twice, "a b" twice, plus filler making a frequent
    // unigram c that never pairs with itself adjacently twice
    val docs = Seq(
      (1L, "x y c"), (2L, "x y c"), (3L, "a b c"), (4L, "a b c")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.collocationsPmi(docs, "text", minCount = 2, topK = 10)
      .as[(String, String, Long, Double)].collect()
    // unigrams: x2 y2 a2 b2 c4 → N_uni=12; bigrams: xy2 yc2 ab2 bc2 → N_bi=8
    // pmi(x,y) = ln(2/8) - ln(2/12) - ln(2/12) = ln(0.25*36) = ln 9
    // pmi(y,c) = ln(2/8) - ln(2/12) - ln(4/12) = ln(0.25*6*3) = ln 4.5
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    assert(got.length == 4)
    assert(got.take(2).map(t => (t._1, t._2)).toSeq == Seq(("a", "b"), ("x", "y")),
      "equal-pmi head must tie-break on (w1, w2)")
    assert(got.take(2).forall(t => t._4 == r6(math.log(9.0))))
    assert(got.drop(2).map(t => (t._1, t._2)).toSeq == Seq(("b", "c"), ("y", "c")))
    assert(got.drop(2).forall(t => t._4 == r6(math.log(4.5))))
    assert(got.forall(_._3 == 2L))
  }

  test("collocationsPmi: singleton pairs drop below minCount") {
    val docs = Seq((1L, "p q"), (2L, "p r")).toDF("doc_id", "text")
    assert(TextAnalysis.collocationsPmi(docs, "text", minCount = 2, topK = 10)
      .count() == 0)
  }

  test("postingsLayout: hand-computed d-gaps, varint bytes, df — " +
      "incl. the doc_id-0 first posting and a 2-byte gap") {
    val docs = Seq((0L, "a b a"), (5L, "a c"), (133L, "a"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.postingsLayout(docs, "doc_id", "text")
      .select($"term", $"doc_id", $"tf", $"gap", $"vbytes", $"df")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSet
    assert(got == Set(
      // term a: postings 0,5,133 -> gaps 0 (bin '0' = 1 byte), 5
      // (1 byte), 128 (bin length 8 -> 2 bytes); df 3
      ("a", 0L, 2L, 0L, 1L, 3L),
      ("a", 5L, 1L, 5L, 1L, 3L),
      ("a", 133L, 1L, 128L, 2L, 3L),
      ("b", 0L, 1L, 0L, 1L, 1L),
      ("c", 5L, 1L, 5L, 1L, 1L)))
  }

  test("postingsCodecPfor: hand-computed NewPFD costs — patched-win, " +
      "for-tie, varint-win branches; pfor <= for invariant") {
    // x: gaps 4,1,1,1        -> varint 4; FoR 1+ceil(4*3/8)=3;
    //    pfor min at b=3 ties FoR (patching never pays) -> 'for'
    // y: gaps 1, 2^20        -> varint 4; FoR 7; best patch (b=1,
    //    one 21-bit exception: 1+1+(1+3))=6 -> varint still wins
    // z: gaps 8, 1 x 20, 30-bit outlier in ONE block -> varint 26;
    //    FoR 1+ceil(22*30/8)=84; pfor b=1: 1+ceil(22/8)+((1+1)+(1+5))
    //    = 12 -> the canonical patched win
    val docs = (Seq((1L, "y"), (1048577L, "y"), (1073741832L, "z")) ++
      (4L to 7L).map(i => (i, "x")) ++
      (8L to 28L).map(i => (i, "z"))).toDF("doc_id", "text")
    val got = TextAnalysis.postingsCodecPfor(docs, "doc_id", "text")
      .select($"term", $"df", $"varint_bytes", $"for_bytes",
        $"pfor_bytes", $"codec", $"stored_bytes")
      .as[(String, Long, Long, Long, Long, String, Long)].collect().toSet
    assert(got == Set(
      ("x", 4L, 4L, 3L, 3L, "for", 3L),
      ("y", 2L, 4L, 7L, 6L, "varint", 4L),
      ("z", 22L, 26L, 84L, 12L, "pfor", 12L)), got)
    // invariant on a mixed corpus: pfor <= for on every term (b =
    // max-bits reproduces FoR's cost), and stored = 3-way least
    val rnd = new scala.util.Random(5)
    val corpus = (0 until 400).map(i =>
      (i.toLong * (1 + rnd.nextInt(9)),
        (0 until 8).map(_ => s"t${rnd.nextInt(30)}").mkString(" ")))
      .distinct.toDF("doc_id", "text")
    val inv = TextAnalysis.postingsCodecPfor(corpus, "doc_id", "text")
      .select($"varint_bytes", $"for_bytes", $"pfor_bytes", $"stored_bytes")
      .as[(Long, Long, Long, Long)].collect()
    inv.foreach { case (v, f, p, s) =>
      assert(p <= f && s == math.min(v, math.min(f, p)), (v, f, p, s))
    }
    assert(inv.nonEmpty)
    // r17 ADVICE regression: a block whose EVERY gap needs more than
    // maxWidth(=32) bits — 64-bit doc-id territory. Before the
    // block-max-bits candidate joined the width search, all widths
    // 1..32 patched both 50-bit gaps out as exceptions (best:
    // b=1 -> 1+1+2*(1+8) = 20) and pfor_bytes EXCEEDED for_bytes
    // (14), falsifying the scaladoc invariant. With b=50 in the
    // candidate set, pfor ties FoR at 14 and the tie rule keeps the
    // cheaper decode.
    // w: doc_ids 2^49, 2^50 -> gaps 2^49, 2^49 (50 bits each).
    // varint 8+8=16; FoR 1+ceil(2*50/8)=14; pfor min = 14 (b=50).
    val wide = Seq((1L << 49, "w"), (1L << 50, "w")).toDF("doc_id", "text")
    val wgot = TextAnalysis.postingsCodecPfor(wide, "doc_id", "text")
      .select($"term", $"varint_bytes", $"for_bytes", $"pfor_bytes",
        $"codec", $"stored_bytes")
      .as[(String, Long, Long, Long, String, Long)].collect().toSet
    assert(wgot == Set(("w", 16L, 14L, 14L, "for", 14L)), wgot)
    // ...and the mixed-bits shape where patching still wins keeps its
    // sub-FoR min: gaps 1, 2^49 -> b=1 patches the one 50-bit
    // exception for 11 < FoR 14 (varint 9 still smallest overall)
    val mixed = Seq((1L, "m"), (1L + (1L << 49), "m")).toDF("doc_id", "text")
    val mgot = TextAnalysis.postingsCodecPfor(mixed, "doc_id", "text")
      .select($"varint_bytes", $"for_bytes", $"pfor_bytes", $"codec")
      .as[(Long, Long, Long, String)].collect().toSet
    assert(mgot == Set((9L, 14L, 11L, "varint")), mgot)
  }

  test("positionalPostings: within-doc position delta chain — repeated " +
      "term gaps, 0-based first position, cross-doc independence") {
    val docs = Seq((1L, "x y x x"), (2L, "y")).toDF("doc_id", "text")
    val got = TextAnalysis.positionalPostings(docs, "doc_id", "text")
      .select($"term", $"doc_id", $"tf", $"pos_bytes")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got == Set(
      // x in doc 1: positions 0,2,3 -> gaps 0,2,1 -> 3 x 1 byte
      ("x", 1L, 3L, 3L),
      // y in doc 1 at position 1 (gap 1); in doc 2 the chain restarts
      // at position 0 (gap 0) — cross-doc independence
      ("y", 1L, 1L, 1L),
      ("y", 2L, 1L, 1L)))
  }

  test("bm25TopKPruned == bm25TopK: stop-word + rare-term query with " +
      "active pruning; under-k candidate path; single-term query") {
    // 200 docs containing ONLY the stop word, 5 docs with the rare
    // term — MaxScore must prune the stop-word-only docs from the
    // rank input and still return the exact full-scan top-k
    val docs = ((0 until 200).map(i =>
        (i.toLong, s"the filler w$i x${i % 7} more the filler")) ++
      (200 until 205).map(i =>
        (i.toLong, s"zebra the unique w$i")))
      .toDF("doc_id", "text")
    def runBoth(terms: Seq[String], k: Int) = {
      val full = TextAnalysis.bm25TopK(docs, "doc_id", "text", terms, k)
        .as[(Long, Double)].collect().toSeq
      val pruned = TextAnalysis.bm25TopKPruned(docs, "doc_id", "text", terms, k)
        .as[(Long, Double)].collect().toSeq
      assert(pruned == full, s"terms=$terms k=$k\npruned=$pruned\nfull=$full")
    }
    runBoth(Seq("zebra", "the"), 3)    // pruning active: θ from zebra docs
    runBoth(Seq("zebra", "the"), 50)   // k > rare-term df: no-pruning path
    runBoth(Seq("zebra"), 2)           // single term
    runBoth(Seq("the"), 5)             // stop word only — everything ties
  }

  test("postingsDiffStream: streaming added-postings feed == batch; " +
      "re-fetch in a later file is judged per fetch") {
    import org.apache.spark.sql.functions.{array_distinct, explode}
    val dir = java.nio.file.Files
      .createTempDirectory("graft-pdiff-stream-").toString
    val oldDocs = Seq((1L, "a b"), (2L, "b c")).toDF("doc_id", "text")
    val oldPostings = oldDocs.select($"doc_id",
      explode(array_distinct(graft.functions.TextFunctions.words($"text")))
        .as("term"))
    // file 1: doc 1 changed (+d), doc 3 new; file 2: doc 1 re-fetched
    // with one more term (+e — judged against the OLD snapshot, so d
    // reports again: live per-fetch semantics)
    Seq((1L, "a b d"), (3L, "c e")).toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").json(s"$dir/f1")
    Seq((1L, "a b d e")).toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").json(s"$dir/f2")
    val staged = s"$dir/in"
    new java.io.File(staged).mkdirs()
    def stage(from: String): Unit =
      new java.io.File(s"$dir/$from").listFiles()
        .filter(_.getName.endsWith(".json")).foreach { f =>
          java.nio.file.Files.copy(f.toPath,
            java.nio.file.Paths.get(staged, s"$from-${f.getName}"))
        }
    val schema = "doc_id LONG, text STRING"
    val stream = spark.readStream.schema(schema).json(staged)
    val q = TextAnalysis.postingsDiffStream(stream, oldPostings,
        "doc_id", "text")
      .writeStream.format("memory").queryName("pdiff_live")
      .outputMode("append").start()
    stage("f1"); q.processAllAvailable()
    stage("f2"); q.processAllAvailable()
    q.stop()
    val got = spark.table("pdiff_live")
      .select($"term", $"doc_id", $"status")
      .as[(String, Long, String)].collect()
      .groupBy(identity).view.mapValues(_.length).toMap
    // batch twin over the union of both files, plus the re-fetch's
    // duplicate 'd' (per-fetch judging)
    val batch = TextAnalysis.postingsDiffStream(
        Seq((1L, "a b d"), (3L, "c e"), (1L, "a b d e"))
          .toDF("doc_id", "text"),
        oldPostings, "doc_id", "text")
      .as[(String, Long, String)].collect()
      .groupBy(identity).view.mapValues(_.length).toMap
    assert(got == batch, s"stream=$got batch=$batch")
    assert(got(("d", 1L, "added")) == 2) // judged per fetch
    assert(got(("e", 1L, "added")) == 1 && got(("e", 3L, "added")) == 1)
    // the non-broadcast scale path (snapshots past driver maxResultSize)
    // returns the same rows
    val unbroadcast = TextAnalysis.postingsDiffStream(
        Seq((1L, "a b d"), (3L, "c e"), (1L, "a b d e"))
          .toDF("doc_id", "text"),
        oldPostings, "doc_id", "text", broadcastOld = Some(false))
      .as[(String, Long, String)].collect()
      .groupBy(identity).view.mapValues(_.length).toMap
    assert(unbroadcast == batch, s"unbroadcast=$unbroadcast batch=$batch")
    // the AUTO default picks the same path semantics either side of the
    // threshold: forcing the bound to 0 keys selects the shuffle form
    val autoShuffle = TextAnalysis.postingsDiffStream(
        Seq((1L, "a b d"), (3L, "c e"), (1L, "a b d e"))
          .toDF("doc_id", "text"),
        oldPostings, "doc_id", "text", maxBroadcastRows = 0L)
      .as[(String, Long, String)].collect()
      .groupBy(identity).view.mapValues(_.length).toMap
    assert(autoShuffle == batch, s"autoShuffle=$autoShuffle batch=$batch")
  }

  test("postingsChurnStateful: keyed-state stream == relational batch " +
      "churn; removes surface per fetch; state carries across files") {
    import org.apache.spark.sql.functions.{col, timestamp_seconds}
    val dir = java.nio.file.Files
      .createTempDirectory("graft-churn-stream-").toString
    val base = 1767225600L
    // doc 1: three fetches (file boundaries between them — state must
    // carry): "a b" -> "b c" (adds c, removes a) -> "b c" (no-op);
    // doc 2: one fetch
    val f1 = Seq((1L, base, "a b"), (2L, base, "x y"))
    val f2 = Seq((1L, base + 60, "b c"))
    val f3 = Seq((1L, base + 120, "b c"))
    def writeJson(rows: Seq[(Long, Long, String)], name: String): Unit =
      rows.toDF("doc_id", "epoch", "text")
        .coalesce(1).write.mode("overwrite").json(s"$dir/$name")
    writeJson(f1, "f1"); writeJson(f2, "f2"); writeJson(f3, "f3")
    val staged = s"$dir/in"
    new java.io.File(staged).mkdirs()
    def stage(from: String): Unit =
      new java.io.File(s"$dir/$from").listFiles()
        .filter(_.getName.endsWith(".json")).foreach { f =>
          java.nio.file.Files.copy(f.toPath,
            java.nio.file.Paths.get(staged, s"$from-${f.getName}"))
        }
    val stream = spark.readStream
      .schema("doc_id LONG, epoch LONG, text STRING").json(staged)
      .withColumn("ts", timestamp_seconds(col("epoch")))
      .withWatermark("ts", "0 seconds")
    val q = TextAnalysis.postingsChurnStateful(stream, "doc_id", "text", "ts")
      .writeStream.format("memory").queryName("churn_live")
      .outputMode("append").start()
    stage("f1"); q.processAllAvailable()
    stage("f2"); q.processAllAvailable()
    stage("f3"); q.processAllAvailable()
    q.stop()
    val got = spark.table("churn_live")
      .select($"doc_id", $"ts_us", $"term", $"status")
      .as[(Long, Long, String, String)].collect().toSet
    val want = Set(
      (1L, base * 1000000, "a", "added"),
      (1L, base * 1000000, "b", "added"),
      (2L, base * 1000000, "x", "added"),
      (2L, base * 1000000, "y", "added"),
      (1L, (base + 60) * 1000000, "c", "added"),
      (1L, (base + 60) * 1000000, "a", "removed"))
    assert(got == want, s"stream=$got")
    // the relational batch twin agrees (seq stands in for ts)
    val allFetches = (f1 ++ f2 ++ f3).toDF("doc_id", "epoch", "text")
      .withColumn("ts", timestamp_seconds(col("epoch")))
    val batch = TextAnalysis.postingsChurn(allFetches, "doc_id", "text", "ts")
      .select($"doc_id", $"seq", $"term", $"status")
      .as[(Long, Int, String, String)].collect().toSet
    val wantBatch = Set(
      (1L, 1, "a", "added"), (1L, 1, "b", "added"),
      (2L, 1, "x", "added"), (2L, 1, "y", "added"),
      (1L, 2, "c", "added"), (1L, 2, "a", "removed"))
    assert(batch == wantBatch, s"batch=$batch")
  }

  test("phraseMatches: consecutive-position semantics — overlapping " +
      "matches count, scattered terms don't, order matters") {
    val docs = Seq(
      (1L, "x a b y a b"),   // two clean matches of "a b"
      (2L, "a a a"),         // "a a" overlaps: positions 0 and 1
      (3L, "a x b"),         // scattered — no match
      (4L, "b a")            // wrong order — no match
    ).toDF("doc_id", "text")
    val ab = TextAnalysis.phraseMatches(docs, "doc_id", "text", Seq("a", "b"))
      .as[(Long, Long)].collect().toMap
    assert(ab == Map(1L -> 2L))
    val aa = TextAnalysis.phraseMatches(docs, "doc_id", "text", Seq("a", "a"))
      .as[(Long, Long)].collect().toMap
    assert(aa == Map(2L -> 2L))
    val single = TextAnalysis.phraseMatches(docs, "doc_id", "text", Seq("b"))
      .as[(Long, Long)].collect().toMap
    assert(single == Map(1L -> 2L, 3L -> 1L, 4L -> 1L))
  }

  test("postingsDiff: unchanged postings drop; gone/new docs surface " +
      "every term; a changed doc surfaces only its changed terms") {
    val oldDocs = Seq((1L, "a b"), (2L, "b c")).toDF("doc_id", "text")
    val newDocs = Seq((1L, "a b d"), (3L, "c e")).toDF("doc_id", "text")
    val got = TextAnalysis.postingsDiff(oldDocs, newDocs, "doc_id", "text")
      .select($"term", $"doc_id", $"status")
      .as[(String, Long, String)].collect().toSet
    assert(got == Set(
      ("b", 2L, "removed"), ("c", 2L, "removed"), // doc 2 gone
      ("d", 1L, "added"),                         // doc 1 changed: only d
      ("c", 3L, "added"), ("e", 3L, "added")))    // doc 3 new
  }
}
