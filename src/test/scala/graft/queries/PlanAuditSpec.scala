package graft.queries

import graft.SparkSpec

/** Pins the physical-plan shapes BASELINE.md claims for the headline
  * queries — the properties that make them survive a 100× scale-up. A
  * regression that introduces an extra shuffle, loses a pushed filter,
  * or drops a broadcast fails here, not in a bench three rounds later.
  */
class PlanAuditSpec extends SparkSpec {

  private def plan(name: String): String =
    graft.SparkEntry.queries(name)(spark, sf()).queryExecution.executedPlan.toString

  /** The AQE final plan (codegen spans only materialize post-execution;
    * sf0.001 keeps the collect trivial).
    */
  private def finalPlan(name: String): String = {
    val df = graft.SparkEntry.queries(name)(spark, sf())
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("poi_classify_basic: one narrow kernel stage + the orderByOnce pair") {
    // r19: the classify kernel runs ONCE — orderByOnce materializes it
    // behind a REPARTITION_BY_COL hash exchange so the range sampler
    // reads shuffle files instead of re-executing the tag-match segment
    val p = finalPlan("poi_classify_basic").split("== Initial Plan ==")(0)
    assert(p.contains("REPARTITION_BY_COL"), p)
    assert(p.contains("rangepartitioning"), p)
    // still exactly those two exchanges: kernel -> hash -> range -> sort
    assert("Exchange ".r.findAllIn(p).size == 2, p)
    assert(!p.contains("BroadcastExchange"), p) // dim rides in-plan, not as a join
  }

  test("classify chain over plain source tags is whole-stage-codegen'd") {
    // the synthetic osmNodes derivation wraps tags in map_filter (a
    // CodegenFallback HOF) which blocks the span; a real source's tags
    // column arrives plain and the F1+F4 chain compiles into codegen
    import org.apache.spark.sql.functions._
    val df = spark.range(100).select(col("id"),
      map(lit("amenity"),
        when(col("id") % 2 === 0, lit("cafe")).otherwise(lit("bar"))).as("tags"))
    val classified = graft.operators.PoiClassifier.classify(
      df, Seq(("amenity", "cafe")), PoiQueries.baseSettings)
    assert(classified.count() == 50)
    // "*(1)" is the whole-stage-codegen marker in the plan string:
    // range, filter (incl. the custom tags_any_match), and project all
    // fused into codegen stage 1
    val p = classified.queryExecution.executedPlan.toString
    assert(p.contains("*(1) Filter") && p.contains("*(1) Project"), p)
    assert(!p.contains("Exchange"), p)
  }

  test("q5_local_supplier: date filter pushed to parquet, dims broadcast") {
    val p = plan("q5_local_supplier")
    assert(p.contains("PushedFilters: [IsNotNull(o_orderdate), GreaterThanOrEqual(o_orderdate")
      || p.contains("GreaterThanOrEqual(o_orderdate"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p) // every dim small enough to ship
  }

  test("q3_shipping_priority: filters pushed on both scans") {
    val p = plan("q3_shipping_priority")
    assert(p.contains("PushedFilters"), p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("text/token queries: one kernel pass — orderByOnce'd or single-stage") {
    // text_token_stats and text_fingerprint run their per-doc kernels
    // once behind the orderByOnce hash exchange (r19); text_langid's
    // tail ends in an aggregation so it keeps the bare sort
    for (name <- Seq("text_token_stats", "text_fingerprint")) {
      val p = plan(name)
      assert(p.contains("REPARTITION_BY_COL"), s"$name:\n$p")
      assert("Exchange ".r.findAllIn(p).size == 2, s"$name:\n$p")
      assert(!p.contains("Join"), s"$name:\n$p")
    }
    val p = plan("text_langid")
    assert(!p.contains("Exchange hashpartitioning"), s"text_langid:\n$p")
  }

  test("text_quality/text_langid: the fused marker kernel replaced the HOF lambdas") {
    // the MarkerCounts expression has a real doGenCode; the plan must
    // show it — and must NOT show the interpreted higher-order chain
    // (aggregate/transform/filter lambdas are CodegenFallback per row)
    for (name <- Seq("text_quality", "text_langid")) {
      val p = plan(name)
      assert(p.contains("marker_counts"), s"$name:\n$p")
      assert(!p.contains("aggregate(") && !p.contains("lambdafunction"),
        s"$name still carries an interpreted HOF lambda:\n$p")
    }
  }

  test("dedup_exact: shuffles the 16-byte hash window key, not a join") {
    val p = plan("dedup_exact")
    assert(!p.contains("Join"), p) // window over md5, no self-join
  }

  test("samplers stay narrow: mixture filter and epoch upsampling never shuffle") {
    for (name <- Seq("doc_sample_bernoulli", "doc_mixture_sample",
        "doc_upsample_epochs")) {
      val p = plan(name)
      // the only allowed exchange is the final ORDER BY's range partition
      assert(!p.contains("Exchange hashpartitioning"), s"$name:\n$p")
      assert(!p.contains("Join"), s"$name:\n$p")
    }
  }

  test("shard/pack prefix scan: the bucket-offset lift joins BROADCAST") {
    // packLayoutSalted's offsets side is ≤ strata × buckets rows by
    // construction — at 100 TB it must ship to the big side, never
    // sort-merge it. AQE gets there at runtime on stats; assert it so a
    // refactor that bloats the offsets side (or a conf change that caps
    // broadcasts) fails here.
    for (name <- Seq("doc_shard_layout", "doc_pack_layout_salted")) {
      val p = finalPlan(name)
      assert(p.contains("BroadcastHashJoin"), s"$name:\n$p")
      assert(!p.contains("SortMergeJoin"), s"$name:\n$p")
    }
  }

  test("text_repetition: ONE corpus scan feeds both word and bigram stats") {
    val p = plan("text_repetition")
    val scans = "documents\\.parquet".r.findAllIn(p).length
    assert(scans == 1, s"expected a single corpus scan, saw $scans:\n$p")
  }

  test("text_quality_classifier: gram hashing codegen'd, one agg exchange, no join") {
    // the weight table rides as a plan literal (element_at on a
    // constant array), so the ONLY hash exchange is the doc-id groupBy
    // (partial-aggregated map-side); the sort adds its range exchange
    // the executed AdaptiveSparkPlan renders "== Final Plan ==" AND
    // "== Initial Plan ==" — count exchanges in the final section only
    val p = finalPlan("text_quality_classifier")
      .split("== Initial Plan ==")(0)
    assert(!p.contains("Join"), p)
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(hashExchanges == 1, s"expected one agg exchange, saw $hashExchanges:\n$p")
    // explode + hash chain + bucket lookup fuse into whole-stage codegen
    assert(p.contains("*(1)"), p)
  }

  test("doc_host_cap: rank<=n rewrites to WindowGroupLimit (whale host pre-pruned map-side)") {
    val p = plan("doc_host_cap")
    // two instances — Final above the host exchange, Partial below it
    // (the map-side pre-prune that keeps the whale host from shipping
    // its whole 40%-of-corpus mass)
    val hits = "WindowGroupLimit".r.findAllMatchIn(p).size
    assert(hits == 2, s"expected Partial+Final WindowGroupLimit, got $hits:\n$p")
    val exchangeIdx = p.indexOf("Exchange hashpartitioning")
    assert(exchangeIdx >= 0 && p.indexOf("WindowGroupLimit", exchangeIdx) >= 0,
      s"partial WindowGroupLimit below the exchange missing:\n$p")
  }

  test("text_heavy_hitters: candidate set broadcasts into a semi-join probe") {
    // the verify pass must probe the token stream with a BROADCAST
    // left-semi join on the (guaranteed-tiny) candidate set — a
    // SortMergeJoin here would re-shuffle the full token stream and
    // defeat the Misra-Gries candidate pass entirely
    val p = finalPlan("text_heavy_hitters").split("== Initial Plan ==")(0)
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("doc_link_tkc_topk: no global window/sort — TakeOrdered top-k + " +
      "broadcast count-of-greater ranks") {
    // the web-scale TKC form's whole point: the naive detector's two
    // unpartitioned row_number windows (one task sorting every host)
    // are replaced by a distributed top-k (TakeOrderedAndProject,
    // executed inside the lineage-truncating checkpoint — the final
    // plan reads it back as an RDD scan) and k-row broadcast rank
    // counts. The ORDER BY node at the end is the catalog's
    // presentation sort over k rows, not a ranking pass.
    val p = finalPlan("doc_link_tkc_topk")
    assert(!p.contains("Window"), s"global window leaked back in:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("Scan ExistingRDD"), p)
  }

  test("doc_domain_cap: same WindowGroupLimit map-side pre-prune as the " +
      "host cap — the whale DOMAIN ships n*P rows, not its 40% share") {
    val p = plan("doc_domain_cap")
    val hits = "WindowGroupLimit".r.findAllMatchIn(p).size
    assert(hits == 2, s"expected Partial+Final WindowGroupLimit, got $hits:\n$p")
    val exchangeIdx = p.indexOf("Exchange hashpartitioning")
    assert(exchangeIdx >= 0 && p.indexOf("WindowGroupLimit", exchangeIdx) >= 0,
      s"partial WindowGroupLimit below the exchange missing:\n$p")
  }

  test("text_postings_impact: rank<=8 rewrites to WindowGroupLimit — " +
      "stop-word postings prune map-side before the term shuffle") {
    val p = plan("text_postings_impact")
    val hits = "WindowGroupLimit".r.findAllMatchIn(p).size
    assert(hits == 2, s"expected Partial+Final WindowGroupLimit, got $hits:\n$p")
  }

  test("text_postings_layout: every window partitions by term — no " +
      "unpartitioned window, no global sort before the presentation ORDER BY") {
    val p = plan("text_postings_layout")
    assert(!p.contains("WARN WindowExec"), p)
    // both windows (lag + df count) key on term: each Window node's
    // partition spec must be non-empty
    val windowSpecs = "Window \\[".r.findAllMatchIn(p).size
    assert(windowSpecs > 0, s"expected Window nodes:\n$p")
    assert(!p.contains("Window ["
      + "], "), s"unpartitioned window found:\n$p")
    // exactly one hash exchange feeds both term-keyed windows and the
    // final per-term agg reuses it (same key) — plus the rangepartition
    // for ORDER BY term
    val hashEx = "Exchange hashpartitioning\\(term".r.findAllMatchIn(p).size
    assert(hashEx <= 2, s"term exchanges should be reused, got $hashEx:\n$p")
  }

  test("r19 Safe-surface migration: the geometry-normalizing defaults " +
      "add ZERO exchanges over the manual split-first recipe and at " +
      "most ONE output-sized exchange over the plain join") {
    import org.apache.spark.sql.functions._
    import graft.operators.GeoJoin
    import graft.sources.Tables
    def hashEx(p: String): Int =
      "Exchange hashpartitioning".r.findAllMatchIn(p).size
    val s = spark
    val pts = Tables.orders(s, sf()).select(
      col("o_orderkey").as("id"),
      ((col("o_totalprice") % 300) - 150 + 0.0005).as("lon"),
      ((col("o_orderkey") % 120) - 60 +
        (col("o_orderkey") % 97) / 1000.0 + 0.0005).as("lat"))
    val ways = Tables.osmWays(s, sf())
    // containment: Safe vs manual recipe vs plain
    val safe = GeoJoin.pointsInPolygonsSafe(pts, ways,
      "id", "lon", "lat", "id", "ring", cellDeg = 0.5)
    val manual = {
      val split = GeoJoin.splitAntimeridianRings(ways, "id", "ring")
        .withColumn("pk", struct(col("id"), col("part")))
      GeoJoin.pointsInPolygons(pts, split, "id", "lon", "lat",
          "pk", "ring", cellDeg = 0.5)
        .select(col("point_id"), col("poly_id.id").as("poly_id"))
        .distinct()
    }
    val plain = GeoJoin.pointsInPolygons(pts, ways,
      "id", "lon", "lat", "id", "ring", cellDeg = 0.5)
    val (eSafe, eManual, ePlain) = (
      hashEx(safe.queryExecution.executedPlan.toString),
      hashEx(manual.queryExecution.executedPlan.toString),
      hashEx(plain.queryExecution.executedPlan.toString))
    assert(eSafe <= eManual,
      s"Safe containment added exchanges over the manual recipe: $eSafe vs $eManual")
    assert(eSafe <= ePlain + 1,
      s"Safe containment costs more than the one seam-dedup exchange: $eSafe vs plain $ePlain")
    // near-lines: Safe's across-parts min is its only extra exchange
    val linesRel = ways.filter(pmod(col("id"), lit(5)) === 0)
    val safeNl = GeoJoin.pointsNearLinesSafe(pts, linesRel,
      "id", "lon", "lat", "id", "ring", 20000.0, cellDeg = 0.5)
    val plainNl = GeoJoin.pointsNearLines(pts, linesRel,
      "id", "lon", "lat", "id", "ring", 20000.0, cellDeg = 0.5)
    val (eSafeNl, ePlainNl) = (
      hashEx(safeNl.queryExecution.executedPlan.toString),
      hashEx(plainNl.queryExecution.executedPlan.toString))
    assert(eSafeNl <= ePlainNl + 1,
      s"Safe near-lines costs more than the one across-parts min exchange: $eSafeNl vs plain $ePlainNl")
  }
}
