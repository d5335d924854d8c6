package graft.operators

import graft.SparkSpec
import graft.functions.{Sketches, TextFunctions}
import graft.sources.Tables
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  test("shingleSet: k=3 over short and long texts") {
    val got = Seq("a b c d", "a b", "x y z")
      .toDF("text").select(TextFunctions.shingleSet(col("text"), 3))
      .as[Seq[String]].collect()
    assert(got(0).sorted == Seq("a b c", "b c d"))
    assert(got(1).isEmpty)
    assert(got(2) == Seq("x y z"))
  }

  test("minhash: deterministic, identical sets → identical signatures") {
    val df = Seq("a b c d e f", "a b c d e f", "q r s t u v")
      .toDF("text").select(
        Sketches.minhash(TextFunctions.shingleSet(col("text"), 3), 32).as("sig"))
    val sigs = df.as[Seq[Long]].collect()
    assert(sigs(0) == sigs(1))
    assert(sigs(0) != sigs(2))
    assert(sigs(0).size == 32)
    // deterministic across evaluations
    assert(df.as[Seq[Long]].collect()(0) == sigs(0))
  }

  test("simhash: identical → hamming 0; disjoint → large hamming") {
    for (portable <- Seq(false, true)) {
      val f = Seq("a b c d e f g h", "a b c d e f g h", "q r s t u v w x")
        .toDF("text").select(
          Sketches.simhash(TextFunctions.words(col("text")), portable).as("f"))
        .as[Long].collect()
      assert(f(0) == f(1), s"portable=$portable")
      assert(java.lang.Long.bitCount(f(0) ^ f(2)) > 10, s"portable=$portable")
    }
  }

  test("portable simhash: pinned token hashes match the oracle arithmetic") {
    // a single-token SimHash is the token hash itself (every bit's vote
    // is that token's bit), so the portable token-hash family is
    // pinnable through the public surface. Reference values computed
    // independently in exact arithmetic (rolling61 -> IdHash v3 words),
    // the same chain the dedup_simhash DuckDB oracle emits — a third
    // leg to the engine/oracle lockstep.
    val pins = Seq(
      "hello" -> -1509909043340189158L,
      "a" -> -8679703077701031026L,
      "" -> 1149937279725207552L,
      "world99" -> -6124952676412939618L,
      "the" -> 1043226192125739856L)
    val got = pins.map(_._1).toDF("tok")
      .select(col("tok"), Sketches.simhash(array(col("tok")), portable = true).as("h"))
      .as[(String, Long)].collect().toMap
    pins.foreach { case (tok, h) => assert(got(tok) == h, s"portableTokenHash($tok)") }
    // multi-token vote pin
    val multi = Seq(Seq("a", "b", "c")).toDF("toks")
      .select(Sketches.simhash(col("toks"), portable = true)).as[Long].head()
    assert(multi == -5788364107809592027L)
  }

  test("cosineSim expression: known vectors, zero vector, null") {
    val got = Seq(
      (Seq(1.0, 0.0), Seq(1.0, 0.0)),
      (Seq(1.0, 0.0), Seq(0.0, 1.0)),
      (Seq(1.0, 2.0), Seq(2.0, 4.0)),
      (Seq(0.0, 0.0), Seq(1.0, 1.0))
    ).toDF("a", "b").select(Sketches.cosineSim(col("a"), col("b"))).as[Double].collect()
    assert(got(0) == 1.0 && got(1) == 0.0 && math.abs(got(2) - 1.0) < 1e-15 && got(3) == 0.0)
  }

  test("LSH pairs equal exact Jaccard pairs on testdata (recall check)") {
    val docs = Tables.documents(spark, sf())
    val exact = Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = Dedup.minhashLshPairs(docs, "doc_id", "text", 3, 0.8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty)
    assert(lsh == exact)
  }

  test("grouped and self-join Jaccard implementations agree") {
    val docs = Tables.documents(spark, sf())
    val a = Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.5)
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect().toSet
    val b = Dedup.jaccardPairsGrouped(docs, "doc_id", "text", 3, 0.5)
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect().toSet
    assert(a == b && a.nonEmpty)
  }

  test("prefix-filtered Jaccard equals the self-join implementation") {
    val docs = Tables.documents(spark, sf())
    // 0.5 is below every planted pair's similarity band — a stronger
    // recall check than 0.8 (longer prefixes, more candidates to match)
    for (t <- Seq(0.5, 0.8)) {
      val a = Dedup.jaccardPairs(docs, "doc_id", "text", 3, t)
        .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect().toSet
      val b = Dedup.jaccardPairsPrefix(docs, "doc_id", "text", 3, t)
        .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect().toSet
      assert(a == b && a.nonEmpty, s"threshold $t")
    }
  }

  test("prefix-filtered Jaccard: IEEE boundary pair (subset at exactly J=t) is found") {
    // |a| = 8 shingles ⊂ |b| = 10, J = 8/10 = 0.8 = t. The required
    // index prefix for n=10 is n − ⌈t·n⌉ + 1 = 3, but the REAL-
    // arithmetic identity floor((1−t)·n)+1 evaluates to 2 under IEEE
    // ((1−0.8) → 0.19999999999999996, ×10 → 1.9999…96 → floor 1): b's
    // two df=1 shingles sort first, fill the too-short prefix, and the
    // pair is silently missed. Deterministic regardless of hash order —
    // this pins the +1 slack in the prefix-length expression.
    val aWords = (1 to 10).map(i => s"w$i").mkString(" ")
    val bWords = (1 to 12).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, aWords), (2L, bWords)).toDF("doc_id", "text")
    val got = Dedup.jaccardPairsPrefix(docs, "doc_id", "text", 3, 0.8)
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect().toSet
    assert(got == Set((1L, 2L, 0.8)))
  }

  test("exactCanonical: duplicates map to min id") {
    val df = Seq((1L, "x"), (2L, "y"), (3L, "x")).toDF("doc_id", "text")
    val got = Dedup.exactCanonical(df, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long)].collect()
    assert(got.toSeq == Seq((1L, 1L), (2L, 2L), (3L, 1L)))
  }

  test("exactCanonicalBy: priority beats id; id breaks priority ties") {
    val df = Seq(
      (1L, "x", 1), (2L, "y", 1), (3L, "x", 0), // 3 outranks 1 on priority
      (4L, "y", 1)                              // ties with 2 → id wins
    ).toDF("doc_id", "text", "prio")
    val got = Dedup.exactCanonicalBy(df, "doc_id", "text", $"prio")
      .orderBy("doc_id").as[(Long, Long)].collect()
    assert(got.toSeq == Seq((1L, 3L), (2L, 2L), (3L, 3L), (4L, 2L)))
    // constant priority degenerates to exactCanonical's min-id rule
    val const = Dedup.exactCanonicalBy(df, "doc_id", "text", lit(0))
      .orderBy("doc_id").as[(Long, Long)].collect()
    val minId = Dedup.exactCanonical(df, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long)].collect()
    assert(const.toSeq == minId.toSeq)
  }

  test("winnowPairs: near-identical docs pair strongly, unrelated never") {
    val base = "the quick brown fox jumps over the lazy dog while seventeen " +
      "green bottles stand quietly on the old stone wall near the river bend"
    val docs = Seq(
      (1L, base),
      (2L, base.replace("seventeen", "nineteen")), // one-word edit
      (3L, "completely different content about spark catalyst physical " +
        "plans and adaptive query execution at large scale")
    ).toDF("doc_id", "text")
    val pairs = Dedup.winnowPairs(docs, "doc_id", "text", k = 8, w = 4,
        minShared = 2)
      .as[(Long, Long, Long)].collect()
    assert(pairs.map(p => (p._1, p._2)).toSet == Set((1L, 2L)))
    assert(pairs.head._3 >= 3, s"expected strong overlap, got ${pairs.head._3}")
    // exact duplicates share their ENTIRE fingerprint set
    val dup = Seq((1L, base), (2L, base)).toDF("doc_id", "text")
    val n = Dedup.winnowPairs(dup, "doc_id", "text", k = 8, w = 4, minShared = 1)
      .as[(Long, Long, Long)].head()._3
    val fpCount = dup.select(explode(graft.functions.Sketches.winnowSet(
        regexp_replace(lower($"text"), " +", " "), 8, 4))).distinct().count()
    assert(n == fpCount)
  }

  test("winnowPairs on testdata: pairs agree with the exact-Jaccard planted set") {
    val docs = graft.sources.Tables.documents(spark, sf())
    val jaccard = Dedup.minhashLshPairs(docs, "doc_id", "text",
        k = 3, threshold = 0.8, bands = 16, rowsPerBand = 2)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    val winnow = Dedup.winnowPairs(docs, "doc_id", "text",
        k = 8, w = 8, minShared = 20, maxFpDf = 50)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    // different modality (char-gram fingerprints vs word-shingle
    // Jaccard) — expect majority agreement, not identity
    val hit = winnow.intersect(jaccard).size
    assert(hit >= jaccard.size / 2,
      s"winnow recovered $hit of ${jaccard.size} Jaccard pairs (winnow=${winnow.size})")
    assert((winnow -- jaccard).size <= winnow.size / 2,
      s"too many non-Jaccard extras: ${(winnow -- jaccard).size} of ${winnow.size}")
  }

  test("maxShingleDf skew guard drops hot shingles but keeps planted dups") {
    val docs = Tables.documents(spark, sf())
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.8, maxShingleDf = 1000)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val exact = Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == exact) // cap far above any df in this corpus
  }

  test("keepBest: score-max winner, min-id ties, untouched passthrough, null scores") {
    // components: {1,2,3} (chain), {4,5}; 6 and 7 untouched.
    // docs carry a pre-existing `component` column to pin that keepBest's
    // internal names don't collide with caller columns.
    val docs = Seq(
      (1L, Some(10.0), "a"), (2L, Some(30.0), "b"),
      (3L, Some(30.0), "c"),      // tie 2 vs 3 → min id 2
      (4L, None, "d"),            // null loses ...
      (5L, Some(1.0), "e"),       // ... to any real score
      (6L, Some(0.5), "f"), (7L, None, "g"))
      .toDF("doc_id", "score", "payload")
      .withColumn("component", lit("caller-owned"))
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("id_a", "id_b")
    val kept = Dedup.keepBest(docs, pairs, "doc_id", "score")
    assert(kept.columns.toSeq ==
      Seq("doc_id", "score", "payload", "component")) // caller columns intact
    assert(kept.select("doc_id").as[Long].collect().sorted.toSeq ==
      Seq(2L, 5L, 6L, 7L))
  }

  test("keepBest: all-null-score component degrades to min id; string ids order natively") {
    val docs = Seq(("b", Option.empty[Double]), ("a", Option.empty[Double]),
        ("z", Some(9.0)))
      .toDF("id", "score")
    val pairs = Seq(("a", "b")).toDF("id_a", "id_b")
    val kept = Dedup.keepBest(docs, pairs, "id", "score")
      .select("id").as[String].collect().sorted.toSeq
    assert(kept == Seq("a", "z")) // min string id wins the null cluster
  }

  // --- ExactSubstr (Lee et al. 2021) ---

  /** Naive reference: substring-count every k-window (no hashing),
    * merge overlapping-or-adjacent duplicated windows per doc.
    * Positions 1-based, spans end-exclusive.
    */
  private def naiveSpans(docs: Seq[(Long, String)], k: Int): Map[Long, Seq[(Int, Int)]] = {
    val grams = docs.flatMap { case (id, t) =>
      (0 to t.length - k).map(i => (t.substring(i, i + k), id, i + 1))
    }
    val counts = grams.groupBy(_._1).view.mapValues(_.size).toMap
    grams.filter(g => counts(g._1) >= 2).groupBy(_._2).map { case (id, gs) =>
      val spans = scala.collection.mutable.ArrayBuffer[(Int, Int)]()
      gs.map(_._3).sorted.foreach { p =>
        if (spans.nonEmpty && p <= spans.last._2)
          spans(spans.size - 1) = (spans.last._1, math.max(spans.last._2, p + k))
        else spans += ((p, p + k))
      }
      id -> spans.toSeq
    }
  }

  private def naiveClean(text: String, spans: Seq[(Int, Int)]): String = {
    val sb = new StringBuilder
    var cur = 1
    spans.foreach { case (s, e) => sb.append(text.substring(cur - 1, s - 1)); cur = e }
    sb.append(text.substring(math.min(cur - 1, text.length))).toString
  }

  private val essCorpus = Seq(
    // intra-doc repeat: the boilerplate occurs twice in ONE doc
    1L -> "begin SHARED-BOILERPLATE-SPAN middle filler xyz SHARED-BOILERPLATE-SPAN end",
    // cross-doc repeat with d4
    2L -> "opening words COMMON-FOOTER-TEXT-HERE trailing bits",
    // no duplicated window at k=12 — must pass through untouched
    3L -> "entirely unique content with no repeats at all in this corpus",
    // entirely duplicated: the whole text is the shared footer
    4L -> "COMMON-FOOTER-TEXT-HERE",
    // two SEPARATED duplicated regions — exercises multi-island merge
    5L -> "SHARED-BOILERPLATE-SPAN unrelated unique middle COMMON-FOOTER-TEXT-HERE")

  test("gramHashes: every window hash equals the direct fold; short strings empty") {
    val k = 7
    val texts = Seq("the quick brown fox", "abcdefg", "short", "", "aaaaaaaaaa")
    val got = texts.toDF("t")
      .select(Sketches.gramHashes(col("t"), k)).as[Seq[Long]].collect()
    val P = (1L << 61) - 1
    def fold(s: String): Long =
      s.getBytes("UTF-8").foldLeft(0L) { (acc, b) =>
        (BigInt(acc) * 131 + (b & 0xFF)).mod(P).toLong }
    texts.zip(got).foreach { case (t, hs) =>
      val want = (0 to t.length - k).map(i => fold(t.substring(i, i + k)))
      assert(hs == want, s"gramHashes('$t')")
    }
  }

  test("exactSubstrSpans: matches the naive substring-count reference") {
    val k = 12
    val got = Dedup.exactSubstrSpans(essCorpus.toDF("doc_id", "text"),
        "doc_id", "text", k)
      .as[(Long, Int, Int)].collect()
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).sorted.toSeq).toMap
    val want = naiveSpans(essCorpus, k)
    assert(got == want)
    // the corpus shape is what we think: an intra-doc dup, a clean doc,
    // a fully-covered doc, and a doc with TWO merged islands
    assert(got(1L).size == 2)      // intra-doc repeat -> both sites marked
    assert(!got.contains(3L))      // unique doc absent from span relation
    assert(got(4L) == Seq((1, essCorpus(3)._2.length + 1)))
    assert(got(5L).size == 2)      // two separated islands stay separate
  }

  test("exactSubstrSpansPrefiltered: equals exact above the winnow guarantee; intra-doc caught") {
    val k = 12
    val w = 8 // guarantee: shared spans >= w+k-1 = 19 chars can't be missed
    val df = essCorpus.toDF("doc_id", "text")
    val exact = Dedup.exactSubstrSpans(df, "doc_id", "text", k)
      .as[(Long, Int, Int)].collect().toSet
    val pre = Dedup.exactSubstrSpansPrefiltered(df, "doc_id", "text", k, w)
      .as[(Long, Int, Int)].collect().toSet
    // every planted span is 23+ chars, above the guarantee -> identical
    assert(pre == exact)
    // doc 1's repeat is INTRA-doc: invisible to the cross-doc fp df,
    // caught by the per-row duplicate-window check
    assert(pre.exists(_._1 == 1L))
  }

  test("exactSubstrSpansPrefiltered: never invents spans below the guarantee") {
    val k = 12
    val corpus = Seq(
      1L -> "aaa SHORT-DUP-XX bbb entirely different tail one",
      2L -> "ccc SHORT-DUP-XX ddd some other unrelated tail")
    val df = corpus.toDF("doc_id", "text")
    val exact = Dedup.exactSubstrSpans(df, "doc_id", "text", k)
      .as[(Long, Int, Int)].collect().toSet
    val pre = Dedup.exactSubstrSpansPrefiltered(df, "doc_id", "text", k, w = 16)
      .as[(Long, Int, Int)].collect().toSet
    // the shared window is exactly k chars, below w+k-1: the prefilter
    // may miss it but must never report anything exact would not
    assert(pre.subsetOf(exact))
    assert(exact.nonEmpty) // the exact pass does see the short dup
  }

  test("exactSubstrClean: cut corpus matches the naive reference; passthrough intact") {
    val k = 12
    val got = Dedup.exactSubstrClean(essCorpus.toDF("doc_id", "text"),
        "doc_id", "text", k, textOut = "text")
      .as[(Long, String)].collect().toMap
    val spans = naiveSpans(essCorpus, k)
    essCorpus.foreach { case (id, t) =>
      assert(got(id) == naiveClean(t, spans.getOrElse(id, Nil)), s"doc $id")
    }
    assert(got(3L) == essCorpus(2)._2) // byte-identical passthrough
    assert(got(4L) == "")              // fully-duplicated doc -> empty, kept
  }

  test("exactSubstrClean size gate is ONE-SIDED (r18 ADVICE): compressed " +
      "parquet bytes under the cut cannot skip the checkpoint when true " +
      "chars exceed it; a genuinely small corpus still skips it") {
    // highly compressible text: on-disk snappy bytes << raw chars, the
    // exact regime where the old two-sided stat gate silently skipped
    // the measured -38 s sf10 materialization win
    val docs = (1L to 60L).map(i => (i, ("ab " * 300) + i.toString))
    val dir = java.nio.file.Files.createTempDirectory("essgate").toString
    docs.toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
    val statBytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val chars = docs.map(_._2.length.toLong).sum
    assert(statBytes < BigInt(chars),
      s"corpus no longer compresses below raw chars ($statBytes vs $chars)")
    val cut = (statBytes.toLong + chars) / 2 // stat under, chars over
    val gated = Dedup.exactSubstrClean(df, "doc_id", "text", k = 12,
      materializeMinChars = cut)
    // the probe must have fired and chosen to materialize: the span
    // relation shows up as a checkpointed ExistingRDD scan
    assert(gated.queryExecution.executedPlan.toString
        .contains("ExistingRDD"),
      "gate skipped materialization on a chars-over-cut corpus")
    // and the gated result is still the reference answer
    val want = Dedup.exactSubstrClean(df, "doc_id", "text", k = 12,
        materializeSpans = Some(false))
      .as[(Long, String)].collect().toMap
    val got = gated.as[(Long, String)].collect().toMap
    assert(got == want)
    // a corpus genuinely below the cut (both estimators) stays
    // single-plan: no checkpoint scan in the executed plan
    val small = Dedup.exactSubstrClean(df, "doc_id", "text", k = 12,
      materializeMinChars = chars * 10)
    assert(!small.queryExecution.executedPlan.toString
      .contains("ExistingRDD"))
  }
}
