package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The round-10 corpus additions: temperature mixture, C4-style
  * duplicated-span removal, SemDeDup keep.
  */
class CorpusOpsSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String, String)*) =
    rows.toDF("doc_id", "source", "text")

  test("temperatureRates: alpha=1 keeps the natural mix, alpha=0 equalizes") {
    val df = docs(
      (1, "big", "x"), (2, "big", "x"), (3, "big", "x"), (4, "big", "x"),
      (5, "small", "x"))
    val natural = Sampling.temperatureRates(df, "source", alpha = 1.0)
    assert(natural == Map("big" -> 1.0, "small" -> 1.0))
    val equal = Sampling.temperatureRates(df, "source", alpha = 0.0)
    assert(equal("small") == 1.0)
    assert(equal("big") == 0.25) // n_min/n_i exactly
  }

  test("temperatureRates: alpha=0.5 is sqrt(n_min/n) and feeds mixtureByHash") {
    val rows = (1L to 400L).map(i =>
      (i, if (i <= 320) "big" else "small", "x"))
    val df = docs(rows: _*)
    val r = Sampling.temperatureRates(df, "source", alpha = 0.5)
    assert(r("small") == 1.0)
    assert(r("big") == math.sqrt(80.0 / 320.0)) // = 0.5 exactly
    val kept = Sampling.temperatureMixture(df, "doc_id", "source", alpha = 0.5)
      .groupBy("source").count().as[(String, Long)].collect().toMap
    // the small source survives whole; big is hash-thresholded at 0.5
    assert(kept("small") == 80)
    assert(kept("big") > 100 && kept("big") < 220)
    // deterministic and nested: the alpha=0.5 keep set contains the
    // alpha=0.25 keep set (rates only shrink as alpha drops)
    val lower = Sampling.temperatureMixture(df, "doc_id", "source", alpha = 0.25)
      .select("doc_id").as[Long].collect().toSet
    val higher = Sampling.temperatureMixture(df, "doc_id", "source", alpha = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(lower.subsetOf(higher))
  }

  test("lineDedup: cross-doc spans keep lowest-doc occurrence, intra-doc repeats survive in keeper") {
    val df = Seq(
      (10L, "boiler\nunique ten\nboiler"),   // keeper of "boiler", repeats it
      (20L, "boiler\nunique twenty"),        // loses "boiler"
      (30L, "unique thirty\nboiler"),        // loses "boiler"
      (40L, "boiler")                        // fully pruned -> drops
    ).toDF("doc_id", "text")
    val got = Dedup.lineDedup(df, "doc_id", "text")
      .orderBy("doc_id").as[(Long, String)].collect()
    assert(got.toSeq == Seq(
      10L -> "boiler\nunique ten\nboiler",
      20L -> "unique twenty",
      30L -> "unique thirty"))
  }

  test("lineDedup: custom separator is treated literally") {
    val df = Seq((1L, "a.b"), (2L, "a.c")).toDF("doc_id", "text")
    // '.' must not act as a regex wildcard: splitting on literal '.'
    // gives spans {a,b} / {a,c}; 'a' is duplicated so doc 2 keeps only c
    val got = Dedup.lineDedup(df, "doc_id", "text", sep = ".")
      .orderBy("doc_id").as[(Long, String)].collect()
    assert(got.toSeq == Seq(1L -> "a.b", 2L -> "c"))
  }

  test("minhashLshPairsCross: new-vs-reference pairs only, overlapping id spaces allowed") {
    val ref = Seq(
      (1L, "a b c d e f g h i j k l"),
      (2L, "q r s t u v w x y z aa bb")).toDF("doc_id", "text")
    val fresh = Seq(
      (1L, "a b c d e f g h i j k l"),   // dup of ref doc 1, SAME id
      (9L, "totally different words here nothing shared at all ok then"))
      .toDF("doc_id", "text")
    val got = Dedup.minhashLshPairsCross(fresh, ref, "doc_id", "text",
        k = 3, threshold = 0.8)
      .select("id_new", "id_ref").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 1L)))
    // no within-side pairs ever: ref docs 1~2 are never compared
    val refDups = Seq((1L, "a b c d e"), (2L, "a b c d e")).toDF("doc_id", "text")
    val none = Dedup.minhashLshPairsCross(
        Seq((9L, "x y z w v u t s")).toDF("doc_id", "text"), refDups,
        "doc_id", "text", k = 3, threshold = 0.8)
    assert(none.count() == 0)
  }

  test("semanticDedup keeps one representative per near-dup component (both methods)") {
    // 3 collinear vectors (one component, min id 1 survives), one
    // opposite-direction vector (cos = -1, never a near-dup), one
    // orthogonal singleton
    val df = Seq(
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(2.0f, 0.0f)),
      (7L, Array(4.0f, 0.0f)),
      (8L, Array(-1.0f, 0.0f)),
      (9L, Array(0.0f, 3.0f))
    ).toDF("vec_id", "embedding")
    for (m <- Seq("lsh", "ivf")) {
      val kept = Dedup.semanticDedup(df, "vec_id", "embedding",
          threshold = 0.9, method = m, numCells = 2, nprobe = 1)
        .select("vec_id").as[Long].collect().sorted
      assert(kept.toSeq == Seq(1L, 8L, 9L), s"method=$m")
    }
    intercept[IllegalArgumentException] {
      Dedup.semanticDedup(df, "vec_id", "embedding", 0.9, method = "nope")
    }
  }

  test("semanticDedup: exact-duplicate vector mass collapses without changing survivors") {
    // ids 2..5 share ONE identical vector (the "default embedding"
    // mass); id 1 is collinear with it, so the whole {1..5} set is one
    // component reachable only if member→rep edges rejoin the graph;
    // 9 is an orthogonal singleton. The exact-collapse path must keep
    // exactly min-id-per-component, same as an uncollapsed run would.
    val df = Seq(
      (1L, Array(3.0f, 0.0f)),
      (2L, Array(1.0f, 0.0f)),
      (3L, Array(1.0f, 0.0f)),
      (4L, Array(1.0f, 0.0f)),
      (5L, Array(1.0f, 0.0f)),
      (9L, Array(0.0f, 2.0f))
    ).toDF("vec_id", "embedding")
    val kept = Dedup.semanticDedup(df, "vec_id", "embedding",
        threshold = 0.9, method = "lsh")
      .select("vec_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L, 9L))
    // identical-mass-only corpus: everything collapses to the min id
    val allSame = Seq.tabulate(6)(i => (10L + i, Array(1.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val keptSame = Dedup.semanticDedup(allSame, "vec_id", "embedding",
        threshold = 0.9, method = "lsh")
      .select("vec_id").as[Long].collect().sorted
    assert(keptSame.toSeq == Seq(10L))
  }
}
