package graft.operators

import graft.SparkSpec

/** Integer-exact PageRank: hand-computed rounds, order/partitioning
  * invariance (the point of the integer formulation), and the
  * documented dangling-mass behavior.
  */
class LinkGraphSpec extends SparkSpec {
  import spark.implicits._

  private val edges = Seq(
    ("A", "B"), ("A", "C"), ("B", "C"), ("C", "A"), ("D", "C"))

  test("two hand-computed rounds at scale 1000, damping 85/100") {
    // out: A=2 B=1 C=1 D=1; base = 150
    // r1: A=1000, B=575, C=2275, D=150
    // r2: A=150+(85*2275)div 100=2083, B=575,
    //     C=150+(85*(500+575+150))div 100=1191, D=150
    val got = LinkGraph.pageRankInt(edges.toDF("src", "dst"), "src", "dst",
        iterations = 2, scale = 1000L)
      .as[(String, Long)].collect().toMap
    assert(got == Map("A" -> 2083L, "B" -> 575L, "C" -> 1191L, "D" -> 150L),
      got.toString)
  }

  test("zero iterations returns the uniform seed over src ∪ dst") {
    val got = LinkGraph.pageRankInt(edges.toDF("src", "dst"), "src", "dst",
        iterations = 0, scale = 7L)
      .as[(String, Long)].collect().toMap
    assert(got == Map("A" -> 7L, "B" -> 7L, "C" -> 7L, "D" -> 7L))
  }

  test("partitioning-invariant: identical ranks at 1, 7, and 32 partitions") {
    // floor-division contributions make every per-node sum an exact
    // integer — no summation-order float drift for ANY partitioning
    val big = (0L until 500L).flatMap { i =>
      Seq((s"h${i % 23}", s"h${(7 * i + 1) % 23}"),
        (s"h${i % 23}", s"h${(13 * i + 5) % 23}"))
    }
    val ref = LinkGraph.pageRankInt(big.toDF("src", "dst"), "src", "dst",
        iterations = 3)
      .as[(String, Long)].collect().sorted.toSeq
    for (p <- Seq(1, 7, 32)) {
      val got = LinkGraph.pageRankInt(
          big.toDF("src", "dst").repartition(p), "src", "dst",
          iterations = 3)
        .as[(String, Long)].collect().sorted.toSeq
      assert(got == ref, s"partitioning $p changed ranks")
    }
    // duplicate edges collapse: the graph is the DISTINCT edge set
    val dup = LinkGraph.pageRankInt(
        (big ++ big).toDF("src", "dst"), "src", "dst", iterations = 3)
      .as[(String, Long)].collect().sorted.toSeq
    assert(dup == ref)
  }

  test("warm start composes exactly: N cold rounds == M cold + (N-M) warm") {
    val e = edges.toDF("src", "dst")
    val cold3 = LinkGraph.pageRankInt(e, "src", "dst", iterations = 3,
      scale = 1000L).as[(String, Long)].collect().toMap
    val cold2 = LinkGraph.pageRankInt(e, "src", "dst", iterations = 2,
      scale = 1000L)
    val warm1 = LinkGraph.pageRankInt(e, "src", "dst", iterations = 1,
        scale = 1000L, init = Some(cold2))
      .as[(String, Long)].collect().toMap
    assert(warm1 == cold3, s"warm=$warm1 cold=$cold3")
  }

  test("warm start after an edge diff: new nodes seed at scale, " +
      "removed-src nodes keep only inbound rank, dropped nodes vanish") {
    val prior = LinkGraph.pageRankInt(edges.toDF("src", "dst"), "src", "dst",
      iterations = 2, scale = 1000L)
    // diff: D's outlink is gone AND D has no inbound → D drops from
    // the graph; a brand-new node E links into C
    val e2 = Seq(("A", "B"), ("A", "C"), ("B", "C"), ("C", "A"), ("E", "C"))
      .toDF("src", "dst")
    val got = LinkGraph.pageRankInt(e2, "src", "dst", iterations = 1,
        scale = 1000L, init = Some(prior))
      .as[(String, Long)].collect().toMap
    // prior (2 cold rounds): A=2083 B=575 C=1191 D=150; E seeds at 1000
    // round: out A=2 B=1 C=1 E=1
    // A' = 150 + 85*1191 div 100 = 1162
    // B' = 150 + 85*(2083 div 2) div 100 = 1034  (floor at 1041, then 884)
    // C' = 150 + 85*(1041+575+1000) div 100 = 2373
    // E' = 150 (no inbound)
    assert(got == Map("A" -> 1162L, "B" -> 1034L, "C" -> 2373L, "E" -> 150L),
      got.toString)
  }

  test("hitsInt: hand-computed hub/authority rounds with integer rescale") {
    // edges A→B, A→C, C→B; scale 1000; h0 = 1000 everywhere
    // a1 raw: B=2000 C=1000, max 2000 → g=2 → a1: B=1000 C=500 A=0
    // h1 raw: A=1500 C=1000, max 1500 → g=2 → h1: A=750 C=500 B=0
    // a2 raw: B=1250 C=750,  max 1250 → g=2 → a2: B=625 C=375 A=0
    // h2 raw: A=1000 C=625,  max 1000 → g=1 → h2: A=1000 C=625 B=0
    val e = Seq(("A", "B"), ("A", "C"), ("C", "B")).toDF("src", "dst")
    val got = LinkGraph.hitsInt(e, "src", "dst", iterations = 2,
        scale = 1000L)
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got == Map("A" -> (1000L, 0L), "B" -> (0L, 625L),
      "C" -> (625L, 375L)), got.toString)
  }

  test("hitsInt: partitioning-invariant (the integer-rescale point)") {
    val big = (0L until 500L).flatMap { i =>
      Seq((s"h${i % 23}", s"h${(7 * i + 1) % 23}"),
        (s"h${i % 23}", s"h${(13 * i + 5) % 23}"))
    }
    val ref = LinkGraph.hitsInt(big.toDF("src", "dst"), "src", "dst",
        iterations = 2)
      .as[(String, Long, Long)].collect().sorted.toSeq
    for (p <- Seq(1, 7, 32)) {
      val got = LinkGraph.hitsInt(
          big.toDF("src", "dst").repartition(p), "src", "dst",
          iterations = 2)
        .as[(String, Long, Long)].collect().sorted.toSeq
      assert(got == ref, s"partitioning $p changed hub/auth")
    }
  }

  test("seeded (personalized) PageRank: teleport mass only at seeds, " +
      "hand-computed; seeding every node == unseeded") {
    import spark.implicits._
    val e = edges.toDF("src", "dst")
    // seeds = {A}; out A=2 B=1 C=1 D=1; base 150 at A, 0 elsewhere
    // r1: A=150+850=1000, B=0+425=425, C=0+85*(500+1000+1000)div100=2125, D=0
    // r2: A=150+85*2125 div 100=1956, B=425, C=85*(500+425+0)div100=786, D=0
    val got = LinkGraph.pageRankInt(e, "src", "dst", iterations = 2,
        scale = 1000L, seeds = Some(Seq("A").toDF("node")))
      .as[(String, Long)].collect().toMap
    assert(got == Map("A" -> 1956L, "B" -> 425L, "C" -> 786L, "D" -> 0L),
      got.toString)
    // seeding the whole node set is exactly the unseeded computation
    val all = LinkGraph.pageRankInt(e, "src", "dst", iterations = 2,
        scale = 1000L, seeds = Some(Seq("A", "B", "C", "D").toDF("node")))
      .as[(String, Long)].collect().toMap
    val plain = LinkGraph.pageRankInt(e, "src", "dst", iterations = 2,
        scale = 1000L).as[(String, Long)].collect().toMap
    assert(all == plain, s"all-seeded=$all plain=$plain")
  }

  test("salsaInt: hand-computed degree-normalized rounds, no rescale") {
    // edges A→B, A→C, C→B; scale 1200; out A=2 C=1; in B=2 C=1
    // a1: B = 1200div2 + 1200 = 1800, C = 1200div2 = 600, A = 0
    // h1: A = 1800div2 + 600 = 1500, C = 1800div2 = 900, B = 0
    // a2: B = 1500div2 + 900 = 1650, C = 1500div2 = 750
    // h2: A = 1650div2 + 750 = 1575, C = 1650div2 = 825
    val e = Seq(("A", "B"), ("A", "C"), ("C", "B")).toDF("src", "dst")
    val got = LinkGraph.salsaInt(e, "src", "dst", iterations = 2,
        scale = 1200L)
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got == Map("A" -> (1575L, 0L), "B" -> (0L, 1650L),
      "C" -> (825L, 750L)), got.toString)
  }

  test("salsaInt: partitioning-invariant") {
    val big = (0L until 500L).flatMap { i =>
      Seq((s"h${i % 23}", s"h${(7 * i + 1) % 23}"),
        (s"h${i % 23}", s"h${(13 * i + 5) % 23}"))
    }
    val ref = LinkGraph.salsaInt(big.toDF("src", "dst"), "src", "dst",
        iterations = 2)
      .as[(String, Long, Long)].collect().sorted.toSeq
    for (p <- Seq(1, 32)) {
      val got = LinkGraph.salsaInt(
          big.toDF("src", "dst").repartition(p), "src", "dst",
          iterations = 2)
        .as[(String, Long, Long)].collect().sorted.toSeq
      assert(got == ref, s"partitioning $p changed salsa scores")
    }
  }

  test("documented variant: dangling mass drains instead of redistributing") {
    // B has no outlinks: its rank contributes nothing, so total mass
    // strictly decreases — the documented drop-dangling behavior
    val df = Seq(("A", "B")).toDF("src", "dst")
    val r = LinkGraph.pageRankInt(df, "src", "dst", iterations = 1,
        scale = 1000L).as[(String, Long)].collect().toMap
    // A gets only base (nothing links to A); B gets base + 850
    assert(r == Map("A" -> 150L, "B" -> 1000L))
  }

  test("danglingRedistribute: hand-computed round, and total mass is " +
      "conserved to within the documented floor-loss bound") {
    // A→B, B dangling. N=2, base 150, r0 = 1000 each.
    // D = 1000, share = 1000 div 2 = 500
    // A' = 150 + 85*(0 + 500)    div 100 = 575
    // B' = 150 + 85*(1000 + 500) div 100 = 1425   (sum still 2000)
    val df = Seq(("A", "B")).toDF("src", "dst")
    val r = LinkGraph.pageRankInt(df, "src", "dst", iterations = 1,
        scale = 1000L, danglingRedistribute = true)
      .as[(String, Long)].collect().toMap
    assert(r == Map("A" -> 575L, "B" -> 1425L), r.toString)

    // a bigger graph with real sinks: 10 linkers, 7 pure-sink hosts
    val big = (0L until 200L).flatMap { i =>
      Seq((s"h${i % 10}", s"sink${i % 7}"), (s"h${i % 10}", s"h${(i + 3) % 10}"))
    }
    val e = big.toDF("src", "dst")
    val n = 17L // 10 linkers + 7 sinks
    val edgeCount = big.distinct.size.toLong
    val iters = 3
    val got = LinkGraph.pageRankInt(e, "src", "dst", iterations = iters,
        scale = 1000000L, danglingRedistribute = true)
      .as[(String, Long)].collect()
    val total = got.map(_._2).sum
    // per round the floors drop < 1 unit per edge (contributions),
    // < N units of the dangling share, < 1 per node at the damping
    // div, < 1 per node in the base — conservative bound (E + 3N)/round
    val bound = (edgeCount + 3 * n) * iters
    assert(math.abs(n * 1000000L - total) <= bound,
      s"total=$total expected≈${n * 1000000L} bound=$bound")
    // and redistribution strictly dominates the draining default
    val drained = LinkGraph.pageRankInt(e, "src", "dst", iterations = iters,
        scale = 1000000L).as[(String, Long)].collect().map(_._2).sum
    assert(total > drained, s"redistributed=$total drained=$drained")
  }

  test("danglingRedistribute on a graph with NO dangling nodes is a no-op") {
    val e = edges.toDF("src", "dst") // every node has an outlink
    val on = LinkGraph.pageRankInt(e, "src", "dst", iterations = 2,
        scale = 1000L, danglingRedistribute = true)
      .as[(String, Long)].collect().toMap
    assert(on == Map("A" -> 2083L, "B" -> 575L, "C" -> 1191L, "D" -> 150L),
      on.toString)
  }

  test("hitsInt/salsaInt warm start composes exactly: N cold rounds == " +
      "M cold + (N-M) warm (hub is the only carried state)") {
    val big = (0L until 200L).flatMap { i =>
      Seq((s"h${i % 11}", s"h${(7 * i + 1) % 11}"),
        (s"h${i % 11}", s"h${(13 * i + 5) % 11}"))
    }
    val e = big.toDF("src", "dst")
    val hCold3 = LinkGraph.hitsInt(e, "src", "dst", iterations = 3)
      .as[(String, Long, Long)].collect().sorted.toSeq
    val hCold2 = LinkGraph.hitsInt(e, "src", "dst", iterations = 2)
    val hWarm = LinkGraph.hitsInt(e, "src", "dst", iterations = 1,
        init = Some(hCold2))
      .as[(String, Long, Long)].collect().sorted.toSeq
    assert(hWarm == hCold3, s"hits warm=$hWarm cold=$hCold3")
    val sCold3 = LinkGraph.salsaInt(e, "src", "dst", iterations = 3)
      .as[(String, Long, Long)].collect().sorted.toSeq
    val sCold2 = LinkGraph.salsaInt(e, "src", "dst", iterations = 2)
    val sWarm = LinkGraph.salsaInt(e, "src", "dst", iterations = 1,
        init = Some(sCold2))
      .as[(String, Long, Long)].collect().sorted.toSeq
    assert(sWarm == sCold3, s"salsa warm=$sWarm cold=$sCold3")
    // warm start after an edge diff: a brand-new node seeds at scale
    // and enters the next round like any other
    val e2 = (big ++ Seq(("hNew", "h1"))).toDF("src", "dst")
    val hDiff = LinkGraph.hitsInt(e2, "src", "dst", iterations = 1,
        init = Some(hCold2))
      .as[(String, Long, Long)].collect().map(r => r._1).toSet
    assert(hDiff.contains("hNew"))
  }

  test("tkcTopK == the naive global-window ranking, and its plan has " +
      "no Window and takes top-k without a global sort") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val big = (0L until 500L).flatMap { i =>
      Seq((s"h${i % 23}", s"h${(7 * i + 1) % 23}"),
        (s"h${i % 23}", s"h${(13 * i + 5) % 23}"))
    }
    val e = big.toDF("src", "dst")
    val k = 7
    val got = LinkGraph.tkcTopK(e, "src", "dst", iterations = 2, k = k)
    // plan shape: NO Window operator anywhere (the web-scale point),
    // broadcast count-of-greater ranks, and the score inputs arrive as
    // lineage-truncated RDD scans (the top-k ran as
    // TakeOrderedAndProject inside the checkpoint materialization —
    // orderBy+limit planning as TakeOrdered is pinned below)
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    assert(plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("Scan ExistingRDD"), plan)
    // the Spark invariant the operator's top-k relies on: a global
    // orderBy immediately under limit plans as TakeOrderedAndProject
    // (per-partition heaps + driver merge), never a full sort
    val topkPlan = spark.range(100)
      .select(col("id").cast("string").as("node"), col("id").as("s"))
      .orderBy(col("s").desc, col("node")).limit(k)
      .queryExecution.executedPlan.toString
    assert(topkPlan.contains("TakeOrderedAndProject"), topkPlan)
    // values: identical to the naive full-ranking form restricted to
    // the same top-k suspect set
    val hits = LinkGraph.hitsInt(e, "src", "dst", iterations = 2)
      .select(col("node"), col("hub").as("hits_hub"))
    val salsa = LinkGraph.salsaInt(e, "src", "dst", iterations = 2)
      .select(col("node"), col("hub").as("salsa_hub"))
    val naive = hits.join(salsa, Seq("node"))
      .withColumn("hits_rank", row_number().over(
        Window.orderBy(col("hits_hub").desc, col("node"))).cast("long"))
      .withColumn("salsa_rank", row_number().over(
        Window.orderBy(col("salsa_hub").desc, col("node"))).cast("long"))
      .withColumn("divergence", col("salsa_rank") - col("hits_rank"))
      .filter(col("hits_rank") <= k)
      .select(col("node"), col("hits_hub"), col("salsa_hub"),
        col("hits_rank"), col("salsa_rank"), col("divergence"))
      .as[(String, Long, Long, Long, Long, Long)].collect().toSet
    val topk = got.as[(String, Long, Long, Long, Long, Long)]
      .collect().toSet
    assert(topk == naive, s"topk=$topk naive=$naive")
  }

  test("bfsDepth: hand-computed hop distances — branch, shortcut wins, " +
      "cycle, unreachable, early drain") {
    import spark.implicits._
    // a→b→c→d, a→c (shortcut: c at depth 1, d at 2), d→a (back edge —
    // cycle must not revisit), x→y detached (unreachable from a)
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("a", "c"),
      ("d", "a"), ("x", "y")).toDF("src", "dst")
    val got = LinkGraph.bfsDepth(edges, "src", "dst",
        Seq("a").toDF("node"), maxDepth = 5)
      .as[(String, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq(("a", 0L), ("b", 1L), ("c", 1L), ("d", 2L)))
    // depth cap truncates; seeds not in the graph still report depth 0
    val capped = LinkGraph.bfsDepth(edges, "src", "dst",
        Seq("a", "z").toDF("node"), maxDepth = 1)
      .as[(String, Long)].collect().sortBy(_._1).toSeq
    assert(capped == Seq(("a", 0L), ("b", 1L), ("c", 1L), ("z", 0L)))
    // r18: the result is re-rooted in the CALLER's session — a
    // downstream transform must plan under the caller's conf, not the
    // loop clone's narrow shuffle width
    val out = LinkGraph.bfsDepth(edges, "src", "dst",
      Seq("a").toDF("node"), maxDepth = 5)
    assert(out.sparkSession eq spark, "bfsDepth leaked its loop session")
  }

  test("frontierNewUrls: bloom-prefiltered form == exact anti-join") {
    import spark.implicits._
    val discovered = (1 to 500).map(i => s"http://f.ex/p/$i").toDF("url")
    val crawled = (1 to 500).filter(_ % 3 == 0)
      .map(i => s"http://f.ex/p/$i").toDF("url")
    val exact = LinkGraph.frontierNewUrls(discovered, crawled)
      .as[String].collect().sorted.toSeq
    val bloom = LinkGraph.frontierNewUrls(discovered, crawled,
        useBloom = true, expectedCrawled = 1000L)
      .as[String].collect().sorted.toSeq
    assert(exact == bloom)
    assert(exact.size == 500 - 166) // every non-multiple-of-3 is new
    assert(!exact.contains("http://f.ex/p/3") &&
      exact.contains("http://f.ex/p/4"))
    // null urls: both modes DROP them (the bloom UDF used to NPE while
    // the exact anti-join kept the row — the two paths must agree)
    val withNull = discovered
      .unionByName(Seq(Option.empty[String]).toDF("url"))
    val exactN = LinkGraph.frontierNewUrls(withNull, crawled)
      .as[String].collect().sorted.toSeq
    val bloomN = LinkGraph.frontierNewUrls(withNull, crawled,
        useBloom = true, expectedCrawled = 1000L)
      .as[String].collect().sorted.toSeq
    assert(exactN == exact && bloomN == exact)
  }

  test("loopStateRelation coalesces the loop state below session width " +
      "(the r17 per-round scheduling fix)") {
    import spark.implicits._
    // a tiny persisted relation deliberately spread over many partitions
    val wide = (1 to 100).toDF("x").repartition(16).persist()
    wide.count()
    try {
      val loopSession = org.apache.spark.sql.graft.Bridge.cloneSession(spark)
      // narrow loop → the state relation follows the loop width, so
      // every per-round map stage schedules loopParts tasks
      val narrow = Dedup.loopStateRelation(loopSession, wide, 2L)
      assert(narrow.rdd.getNumPartitions == 2)
      assert(narrow.as[Int].collect().sorted.toSeq == (1 to 100))
      narrow.unpersist()
      // loop width >= cached width → passthrough, zero extra passes
      val same = Dedup.loopStateRelation(loopSession, wide, 64L)
      assert(same.rdd.getNumPartitions == 16)
      same.unpersist()
    } finally wide.unpersist()
  }
}
