package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Mergeable-sketch + null-robustness coverage.
  *
  * At 100 TB, distinct counts are HLL sketches built per partition /
  * per source and OR-merged — never exact sets. Spark 3.5+ ships
  * hll_sketch_agg / hll_union_agg / hll_sketch_estimate; the property
  * that makes them scale is MERGEABILITY: union of per-group sketches
  * must estimate the same set as one global sketch. Pinned here with
  * tolerance against exact counts (same pattern as ApproxQuantileSpec).
  */
class SketchMergeSpec extends SparkSpec {
  import spark.implicits._

  private def docs = spark.range(5000).select(
    $"id".as("doc_id"),
    concat(lit("src"), pmod($"id", lit(4L)).cast("string")).as("source"),
    // ~1500 distinct tokens, skewed across sources
    concat(lit("tok"), pmod($"id" * 31, lit(1500L)).cast("string")).as("token"))

  test("hll: per-source sketches union to the global estimate (mergeable)") {
    val perSource = docs.groupBy($"source")
      .agg(hll_sketch_agg($"token").as("sk"))
    val merged = perSource.agg(
      hll_sketch_estimate(hll_union_agg($"sk")).as("est"))
      .as[Long].head()
    val global = docs.agg(
      hll_sketch_estimate(hll_sketch_agg($"token")).as("est"))
      .as[Long].head()
    val exact = docs.select($"token").distinct().count()
    // union targets a different HLL storage type than the one-pass
    // sketch (DataSketches HLL_8 vs HLL_4), so estimates can differ in
    // the last counts — mergeability means same-set-level agreement,
    // pinned to 0.5%, and both within 5% of exact
    assert(math.abs(merged - global).toDouble / global < 0.005,
      s"merged $merged vs one-pass $global")
    assert(math.abs(merged - exact).toDouble / exact < 0.05,
      s"estimate $merged vs exact $exact")
  }

  test("hll: estimate within 5% per group") {
    val est = docs.groupBy($"source")
      .agg(hll_sketch_estimate(hll_sketch_agg($"token")).as("est"))
      .as[(String, Long)].collect().toMap
    val exact = docs.groupBy($"source")
      .agg(countDistinct($"token").as("n"))
      .as[(String, Long)].collect().toMap
    for ((s, n) <- exact)
      assert(math.abs(est(s) - n).toDouble / n < 0.05, s"$s: ${est(s)} vs $n")
  }

  // Count-min: the frequency-estimate companion to HLL's cardinality.
  // At 100 TB term/domain frequencies are CMS sketches built per
  // partition and counter-added — mergeability is EXACT for CMS (same
  // dims + seed => counter matrices add), unlike HLL's storage-type
  // rounding. Zipf-ish data: token j appears ~2sqrt-decay heavy.
  private def skewed = spark.range(5000).select(
    $"id".as("doc_id"),
    concat(lit("src"), pmod($"id", lit(4L)).cast("string")).as("source"),
    concat(lit("tok"), floor(sqrt($"id")).cast("long").cast("string")).as("token"))

  private def readCms(b: Array[Byte]) =
    org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(b))

  test("cms: per-source sketches counter-add to EXACTLY the global sketch") {
    val eps = 0.001; val conf = 0.99; val seed = 42
    val perSource = skewed.groupBy($"source")
      .agg(count_min_sketch($"token", lit(eps), lit(conf), lit(seed)).as("sk"))
      .as[(String, Array[Byte])].collect()
    val merged = perSource.map(r => readCms(r._2)).reduce { (a, b) =>
      a.mergeInPlace(b); a
    }
    val global = readCms(skewed
      .agg(count_min_sketch($"token", lit(eps), lit(conf), lit(seed)).as("sk"))
      .as[Array[Byte]].head())
    val exact = skewed.groupBy($"token").count()
      .as[(String, Long)].collect().toMap
    for ((t, _) <- exact)
      assert(merged.estimateCount(t) == global.estimateCount(t),
        s"merge must be exact for $t")
  }

  test("cms: estimates never undercount and respect the eps*N bound; top token exact") {
    val eps = 0.001; val n = 5000L
    val sk = readCms(skewed
      .agg(count_min_sketch($"token", lit(eps), lit(0.99), lit(7)).as("sk"))
      .as[Array[Byte]].head())
    val exact = skewed.groupBy($"token").count()
      .as[(String, Long)].collect().toMap
    for ((t, c) <- exact) {
      val est = sk.estimateCount(t)
      assert(est >= c, s"CMS must never undercount: $t $est < $c")
      assert(est <= c + (eps * n).toLong + 1, s"$t overcount $est vs $c")
    }
    val topExact = exact.maxBy(c => (c._2, c._1))._1
    val topCms = exact.keys.maxBy(t => (sk.estimateCount(t), t))
    assert(topCms == topExact, "heavy hitter must survive the sketch")
  }

  test("null text flows safely through the text/dedup surface") {
    val withNulls = Seq(
      (1L, "the quick brown fox jumps"),
      (2L, null.asInstanceOf[String]),
      (3L, "")
    ).toDF("doc_id", "text")
    // kernels: null text → null array → explode drops the row
    assert(withNulls.select($"doc_id",
        explode(graft.functions.TextFunctions.shingleSet($"text", 3)).as("sh"))
      .select($"doc_id").distinct().as[Long].collect().toSet == Set(1L))
    // token stats: null text → null counts, not a crash
    val stats = TextAnalysis.tokenStats(withNulls, "doc_id", "text")
      .orderBy($"doc_id").collect()
    assert(stats.length == 3 && stats(1).isNullAt(1))
    // exact dedup: null text forms its own md5-null group, no crash
    assert(Dedup.exactCanonical(withNulls, "doc_id", "text").count() == 3)
    // repetition stats: null/empty drop out of the explode, no crash
    val rep = TextAnalysis.repetitionStats(withNulls, "doc_id", "text")
    assert(rep.filter($"doc_id" === 1).count() == 1)
  }
}
