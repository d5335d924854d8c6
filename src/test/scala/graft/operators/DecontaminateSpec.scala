package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Eval-set decontamination: overlap flags, keep-set, and the broadcast
  * plan shape (the corpus side must not shuffle to meet the eval set).
  */
class DecontaminateSpec extends SparkSpec {
  import spark.implicits._

  private val train = Seq(
    (100L, "the quick brown fox jumps over the lazy dog"),
    (101L, "completely unrelated text about spark physical plans"),
    (102L, "quick brown fox jumps high today"),
    (103L, "one two three four five six")
  ).toDF("doc_id", "text")

  private val evalSet = Seq(
    (1L, "the quick brown fox jumps far"),
    (2L, "one two three")
  ).toDF("doc_id", "text")

  test("contaminated: counts distinct shared k-shingles per train doc") {
    val got = Decontaminate.contaminated(train, evalSet, "doc_id", "text", k = 3)
      .as[(Long, Long)].collect().toMap
    // 100 shares {the quick brown, quick brown fox, brown fox jumps};
    // 102 shares {quick brown fox, brown fox jumps}; 103 shares
    // {one two three}; 101 shares nothing and must be absent
    assert(got == Map(100L -> 3L, 102L -> 2L, 103L -> 1L))
  }

  test("decontaminate: drops flagged docs, keeps the clean ones") {
    val kept = Decontaminate.decontaminate(train, evalSet, "doc_id", "text", k = 3)
      .select($"doc_id").as[Long].collect().toSet
    assert(kept == Set(101L))
  }

  test("plan: eval shingles broadcast; the corpus probe is map-side") {
    val df = Decontaminate.contaminated(train, evalSet, "doc_id", "text", k = 3)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast probe:\n$plan")
    // structural check: the join's STREAMED (corpus) child subtree must
    // contain no shuffle — the eval side may shuffle inside its own
    // BroadcastExchange (the tiny distinct), and the per-doc count
    // shuffles above the join; neither touches the corpus' path to the
    // probe
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    // AQE wraps materialized stages in QueryStageExec whose subtree is a
    // field, not a child — unwrap while flattening
    def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
      case q: QueryStageExec => q +: flatten(q.plan)
      case other => other +: other.children.flatMap(flatten)
    }
    val exec = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val joins = flatten(exec).collect { case j: BroadcastHashJoinExec => j }
    assert(joins.nonEmpty, s"no BroadcastHashJoin in final plan:\n$exec")
    joins.foreach { j =>
      val shuffles = flatten(j.left).collect { case s: ShuffleExchangeLike => s }
      assert(shuffles.isEmpty,
        s"corpus side shuffled before the probe:\n$exec")
    }
  }

  test("bloom-prefilter path equals the exact broadcast path") {
    val exact = Decontaminate.contaminated(train, evalSet, "doc_id", "text", k = 3)
      .as[(Long, Long)].collect().toSet
    val bloom = Decontaminate.contaminatedBloom(train, evalSet, "doc_id", "text",
        k = 3, expectedEvalShingles = 1000L)
      .as[(Long, Long)].collect().toSet
    assert(bloom == exact)
  }

  test("contaminationFraction: exact fractions and threshold verdicts") {
    val got = Decontaminate.contaminationFraction(
        train, evalSet, "doc_id", "text", k = 3, minFrac = 0.5)
      .select("doc_id", "n_shared", "n_shingles", "frac", "drop")
      .as[(Long, Long, Long, Double, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    // doc 100: 9 words → 7 shingles, 3 shared → 3/7 < 0.5 (kept)
    // doc 102: 6 words → 4 shingles, 2 shared → 0.5 ≥ 0.5 (dropped)
    // doc 103: 6 words → 4 shingles, 1 shared → 0.25 (kept)
    assert(got.keySet == Set(100L, 102L, 103L))
    assert(got(100L) == ((3L, 7L, 3.0 / 7.0, false)))
    assert(got(102L) == ((2L, 4L, 0.5, true)))
    assert(got(103L) == ((1L, 4L, 0.25, false)))
  }

  test("semanticContaminated: hand-computed cosines, clean rows absent") {
    val corpus = Seq(
      (100L, Seq(1f, 0f)),   // cos vs e1 = 1.0, vs e2 = 0.6
      (101L, Seq(0f, 1f)),   // cos vs e1 = 0.0, vs e2 = 0.8
      (102L, Seq(1f, 1f)),   // cos vs e1 = 1/sqrt2, vs e2 = 1.4/sqrt2·1
      (103L, Seq(-1f, 0f))   // negative both — never flagged
    ).toDF("vec_id", "embedding")
    val evalSet = Seq((1L, Seq(1f, 0f)), (2L, Seq(0.6f, 0.8f)))
      .toDF("vec_id", "embedding")
    val got = Decontaminate.semanticContaminated(
        corpus, evalSet, "vec_id", "embedding", tau = 0.7)
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    // 100: hits e1 only (0.6 < 0.7) → max 1.0; 101: hits e2 (0.8);
    // 102: vs e1 = 0.7071 ≥ τ, vs e2 = (0.6+0.8)/sqrt2 = 0.98995 → 2 hits
    assert(got.keySet == Set(100L, 101L, 102L))
    assert(got(100L) == ((1L, 1.0)))
    assert(got(101L)._1 == 1L)
    assert(math.abs(got(101L)._2 - 0.8) < 1e-6)
    assert(got(102L) == ((2L, r6(1.4 / math.sqrt(2) / 1.0))))
  }

  test("semanticContaminated: anti-join keep-set is the unflagged corpus") {
    val corpus = Seq((100L, Seq(1f, 0f)), (101L, Seq(0f, 1f)))
      .toDF("vec_id", "embedding")
    val evalSet = Seq((1L, Seq(1f, 0f))).toDF("vec_id", "embedding")
    val flagged = Decontaminate.semanticContaminated(
      corpus, evalSet, "vec_id", "embedding", tau = 0.9).select($"vec_id")
    val kept = corpus.join(flagged, Seq("vec_id"), "left_anti")
      .select($"vec_id").as[Long].collect().toSet
    assert(kept == Set(101L))
  }

  test("semanticContaminated: corpus side never shuffles before the probe") {
    val corpus = Seq((100L, Seq(1f, 0f)), (101L, Seq(0f, 1f)))
      .toDF("vec_id", "embedding")
    val evalSet = Seq((1L, Seq(1f, 0f))).toDF("vec_id", "embedding")
    val df = Decontaminate.semanticContaminated(
      corpus, evalSet, "vec_id", "embedding", tau = 0.5)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // the eval set rides a BroadcastExchange into a nested-loop join;
    // the only ShuffleExchange in the plan is the per-id final aggregate
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"expected broadcast nested-loop probe:\n$plan")
  }

  test("k larger than a doc's length yields no shingles, never a crash") {
    val tiny = Seq((7L, "two words")).toDF("doc_id", "text")
    assert(Decontaminate.contaminated(tiny, evalSet, "doc_id", "text", k = 3)
      .count() == 0)
  }
}
