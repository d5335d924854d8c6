package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def docs = spark.range(1000).select(
    $"id".as("doc_id"),
    (pmod($"id", lit(4L))).cast("string").as("stratum"))

  test("bernoulli: deterministic, partition-layout independent, ~fraction sized") {
    val a = Sampling.bernoulliByHash(docs, "doc_id", 0.2)
      .select($"doc_id").as[Long].collect().toSet
    val b = Sampling.bernoulliByHash(docs.repartition(17), "doc_id", 0.2)
      .select($"doc_id").as[Long].collect().toSet
    assert(a === b)
    assert(a.size > 120 && a.size < 280, s"got ${a.size} of 1000 at fraction 0.2")
  }

  test("bernoulli: sample at larger fraction is a superset (stable splits)") {
    val f10 = Sampling.bernoulliByHash(docs, "doc_id", 0.1)
      .select($"doc_id").as[Long].collect().toSet
    val f30 = Sampling.bernoulliByHash(docs, "doc_id", 0.3)
      .select($"doc_id").as[Long].collect().toSet
    assert(f10.subsetOf(f30))
  }

  test("stratified: exactly n per stratum, deterministic under repartition") {
    val s1 = Sampling.stratifiedByHash(docs, "stratum", "doc_id", 25)
    val counts = s1.groupBy($"stratum").count().as[(String, Long)].collect().toMap
    assert(counts.values.toSet === Set(25L))
    val s2 = Sampling.stratifiedByHash(docs.repartition(13), "stratum", "doc_id", 25)
    assert(s1.select($"doc_id").as[Long].collect().toSet ===
      s2.select($"doc_id").as[Long].collect().toSet)
  }

  test("stratified: small stratum returns all its rows") {
    val tiny = docs.filter($"doc_id" < 6) // strata of size 1-2
    val out = Sampling.stratifiedByHash(tiny, "stratum", "doc_id", 10)
    assert(out.count() === 6)
  }

  test("domain cap vs host cap: a multi-subdomain publisher is " +
      "under-capped 23x by the host cap, exactly capped by the domain cap") {
    import graft.functions.TextFunctions
    import org.apache.spark.sql.expressions.Window
    // the doc_domain_cap plant law: one publisher spread over 23 blog
    // subdomains owning 40% of the corpus
    val planted = spark.range(5000).select(
      $"id".as("doc_id"),
      (pmod($"id", lit(1000L)) + 1L).as("n_chars"),
      when(pmod($"id", lit(5L)) < 2,
          concat(lit("blog"), pmod($"id", lit(23L)).cast("string"),
            lit(".megafarm.example")))
        .otherwise(concat(lit("site"),
          pmod($"id", lit(97L)).cast("string"), lit(".example")))
        .as("host"))
      .withColumn("domain", TextFunctions.registeredDomain($"host"))
    def capped(key: String) = planted
      .withColumn("rk", row_number().over(
        Window.partitionBy(col(key)).orderBy($"n_chars".desc, $"doc_id")))
      .filter($"rk" <= 20)
      .filter($"domain" === "megafarm.example")
      .count()
    val byHost = capped("host")
    val byDomain = capped("domain")
    assert(byDomain === 20L)
    assert(byHost === 23L * 20L,
      s"host cap admits $byHost megafarm docs — the 23-subdomain under-cap")
  }

  test("idHash and the upsample salt are ANSI-safe at any Long id") {
    val ansiBefore = spark.conf.get("spark.sql.ansi.enabled", "true")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try {
      // ids past 3.47e9 overflowed the raw Knuth multiply (ADVICE r3);
      // the split-at-bit-31 reduction must keep every id in range,
      // throw-free
      val big = Seq(Long.MaxValue, Long.MaxValue - 1, 3470000001L, 0L)
        .toDF("doc_id").withColumn("source", lit("s"))
      val hashes = big.select(Sampling.idHash($"doc_id").as("h"))
        .as[Long].collect()
      assert(hashes.forall(h => h >= 0 && h < 4294967296L))
      // pinned reference values (independently computed in exact
      // arithmetic) — the DuckDB oracle mirror must stay in lockstep
      // hash v3 (split mix + fmix32) — recomputed in exact arithmetic
      val pins = Seq(0L -> 0L, 1L -> 301794027L, 42L -> 1716251024L,
        1000L -> 1495803851L, 2147483648L -> 1832674720L,
        2147483690L -> 31986815L, (1L << 40) + 7 -> 3008568897L,
        4611686018427387903L -> 2155639862L)
      val got = pins.map(_._1).toDF("doc_id")
        .select($"doc_id", Sampling.idHash($"doc_id").as("h"))
        .as[(Long, Long)].collect().toMap
      pins.foreach { case (id, h) => assert(got(id) == h, s"idHash($id)") }
      // the epoch-upsampling fractional salt also survives Long.MaxValue
      val up = Sampling.upsampleByEpochs(big, "doc_id", "source", Map("s" -> 1.5))
      assert(up.count() >= 4)
    } finally spark.conf.set("spark.sql.ansi.enabled", ansiBefore)
  }

  test("idHash kernel: codegen path == interpreted model, negatives included") {
    // the generated Java and IdHash.hash are separate implementations of
    // the same v3 chain — evaluate through a real (codegen'd) plan and
    // compare every value against the Scala model
    val ids = ((-1000L to 1000L) ++ Seq(Long.MaxValue, Long.MinValue,
      Long.MinValue + 1, 3470000001L, (1L << 61) + 5, -(1L << 40) - 7)).toSeq
    val got = ids.toDF("doc_id")
      .select($"doc_id", Sampling.idHash($"doc_id").as("h"))
      .as[(Long, Long)].collect().toMap
    ids.foreach { id =>
      assert(got(id) == graft.functions.IdHash.hash(id), s"idHash($id)")
    }
  }

  test("idHash stays inside whole-stage codegen (r7: Column chain crashed Janino)") {
    // the Column-built v3 chain duplicated the tree 2^5-fold, produced
    // >20k lines of generated Java, and threw InternalCompilerException —
    // Spark silently fell back to interpreted projection for EVERY
    // sampling plan. fallback=false turns that silent regression into a
    // test failure.
    val before = spark.conf.get("spark.sql.codegen.fallback", "true")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val out = Sampling.packLayoutSalted(
        Sampling.mixtureByHash(docs.withColumn("source", lit("s")), "doc_id",
            "source", rates = Map("s" -> 0.7), defaultRate = 0.1)
          .withColumn("w", $"doc_id" % 37 + 1),
        "stratum", "doc_id", "w", cap = 512, buckets = 4)
      assert(out.count() > 0)
    } finally spark.conf.set("spark.sql.codegen.fallback", before)
  }

  test("idHash: ids a fixed offset apart never alias (ADVICE r4: 2^31 did)") {
    // the old single-round hash reduced id mod 2^31 before the multiply,
    // so EVERY pair (x, x + 2^31) hashed identically — perfectly
    // correlated split/sample/pack decisions on corpora with ids >= 2^31.
    // The two-round split hash must keep every such pair distinct.
    val xs = (0L until 2000L) ++
      Seq(3470000001L, (1L << 35) + 17, (1L << 45) + 123, (1L << 55) + 9)
    for (delta <- Seq(1L << 31, 1L << 32, 1L << 33, 1L << 40)) {
      val n = xs.toDF("x")
        .filter(Sampling.idHash($"x") === Sampling.idHash($"x" + delta))
        .count()
      assert(n == 0, s"${n} aliased pairs at offset $delta")
    }
  }

  test("pack layout: pack_id is exact past 2^53 (double floor mis-bins)") {
    // cum_before = 2^60-1: floor((2^60-1) / 512.0) promotes to DOUBLE,
    // rounds up to 2^60, and bins into pack 2251799813685248 — one past
    // the true 2251799813685247 (= (2^60-1) div 512). At the 100 TB
    // design point a stratum's running token total crosses 2^53 at
    // ~9e15 tokens, so the integer-div path is the only correct one.
    // doc_id 0 hashes to 0, so it always orders first in the stratum.
    val rows = Seq((0L, "all", (1L << 60) - 1), (1L, "all", 5L))
      .toDF("doc_id", "stratum", "w")
    for (df <- Seq(
        Sampling.packLayout(rows, "stratum", "doc_id", "w", cap = 512),
        Sampling.packLayoutSalted(rows, "stratum", "doc_id", "w", cap = 512))) {
      val out = df.select($"doc_id", $"pack_id", $"pack_offset")
        .as[(Long, Long, Long)].collect().sortBy(_._1)
      assert(out(0) == ((0L, 0L, 0L)))
      assert(out(1) == ((1L, 2251799813685247L, 511L)),
        s"mis-binned: ${out(1)} (double floor would give 2251799813685248)")
      // and the double expression really would have mis-binned:
      val viaDouble = rows.sparkSession.range(1)
        .select(floor(lit((1L << 60) - 1) / 512).cast("long")).as[Long].head()
      assert(viaDouble == 2251799813685248L, "witness: double path rounds up")
    }
  }

  test("mixture: per-source rates, nested (raising a rate only adds docs)") {
    val src = docs.withColumn("source",
      concat(lit("s"), pmod($"doc_id", lit(3L)).cast("string")))
    val m1 = Sampling.mixtureByHash(src, "doc_id", "source",
      Map("s0" -> 1.0, "s1" -> 0.3), defaultRate = 0.0)
    val got = m1.groupBy($"source").count().as[(String, Long)].collect().toMap
    assert(got("s0") == 334)                      // rate 1.0 keeps all of s0
    assert(!got.contains("s2"))                   // default 0.0 drops s2
    assert(got("s1") > 40 && got("s1") < 160, got.toString) // ~30% of 333
    // nested: raising s1's rate keeps every previously-sampled doc
    val m2 = Sampling.mixtureByHash(src, "doc_id", "source",
      Map("s0" -> 1.0, "s1" -> 0.6), defaultRate = 0.0)
    val ids1 = m1.select($"doc_id").as[Long].collect().toSet
    val ids2 = m2.select($"doc_id").as[Long].collect().toSet
    assert(ids1.subsetOf(ids2))
  }

  test("upsample: floor copies + ~fractional extras, epoch indices 1..n") {
    val src = docs.withColumn("source",
      concat(lit("s"), pmod($"doc_id", lit(2L)).cast("string")))
    val up = Sampling.upsampleByEpochs(src, "doc_id", "source",
      Map("s0" -> 3.0, "s1" -> 1.5))
    val perDoc = up.groupBy($"doc_id", $"source").count()
      .as[(Long, String, Long)].collect()
    assert(perDoc.filter(_._2 == "s0").forall(_._3 == 3))
    val s1Counts = perDoc.filter(_._2 == "s1").map(_._3)
    assert(s1Counts.forall(c => c == 1 || c == 2))
    val frac = s1Counts.count(_ == 2).toDouble / s1Counts.length
    assert(frac > 0.4 && frac < 0.6, s"fractional-copy rate $frac")
    // epoch indices are 1..n per doc
    val epochs = up.filter($"doc_id" === 0).select($"epoch").as[Int].collect().sorted
    assert(epochs.sameElements(1 to epochs.length))
    // zero epochs drops the source entirely
    val none = Sampling.upsampleByEpochs(src, "doc_id", "source",
      Map("s0" -> 0.0), defaultEpochs = 1.0)
    assert(none.filter($"source" === "s0").count() == 0)
  }

  test("curriculum buckets: balanced NTILE per stratum, deterministic order") {
    val out = Sampling.curriculumBuckets(docs, "stratum", "doc_id", "doc_id", 4)
    val sizes = out.groupBy($"stratum", $"bucket").count()
      .as[(String, Int, Long)].collect()
    assert(sizes.length == 16)
    assert(sizes.forall { case (_, _, c) => c >= 62 && c <= 63 }) // 250/4
    // bucket ordering follows the order column within each stratum
    val perStratum = out.filter($"stratum" === "0")
      .orderBy($"doc_id").select($"bucket").as[Int].collect()
    assert(perStratum.sorted.sameElements(perStratum))
  }

  test("pack layout: salted prefix scan == plain, incl. one giant stratum") {
    val weighted = docs.withColumn("w", pmod($"doc_id" * 7, lit(40L)) + 1)
    for (buckets <- Seq(1, 4, 16, 256)) {
      val plain = Sampling.packLayout(weighted, "stratum", "doc_id", "w", cap = 100)
        .select($"doc_id", $"pack_id", $"pack_offset")
        .as[(Long, Long, Long)].collect().toSet
      val salted = Sampling.packLayoutSalted(weighted, "stratum", "doc_id", "w",
          cap = 100, buckets = buckets)
        .select($"doc_id", $"pack_id", $"pack_offset")
        .as[(Long, Long, Long)].collect().toSet
      assert(salted === plain, s"buckets=$buckets")
    }
    // a single stratum holding everything — the case the scan exists for
    val one = weighted.withColumn("stratum", lit("all"))
    val p = Sampling.packLayout(one, "stratum", "doc_id", "w", cap = 100)
      .select($"doc_id", $"pack_id", $"pack_offset")
      .as[(Long, Long, Long)].collect().toSet
    val sd = Sampling.packLayoutSalted(one, "stratum", "doc_id", "w", cap = 100)
      .select($"doc_id", $"pack_id", $"pack_offset")
      .as[(Long, Long, Long)].collect().toSet
    assert(sd === p)
  }

  test("packManifest: ordered ids per pack, totals match the layout") {
    val weighted = docs.withColumn("w", pmod($"doc_id" * 7, lit(40L)) + 1)
    val layout = Sampling.packLayout(weighted, "stratum", "doc_id", "w", cap = 100)
    val man = Sampling.packManifest(layout, "stratum", "doc_id", "w")
      .select($"stratum", $"pack_id", $"n_docs", $"n_tokens", $"doc_ids")
      .as[(String, Long, Long, Long, String)].collect()
    val byPack = layout.select($"stratum", $"pack_id", $"doc_id", $"pack_offset", $"w")
      .as[(String, Long, Long, Long, Long)].collect()
      .groupBy(r => (r._1, r._2))
    assert(man.length == byPack.size)
    man.foreach { case (st, pk, nDocs, nTok, ids) =>
      val rows = byPack((st, pk))
      assert(nDocs == rows.length && nTok == rows.map(_._5).sum)
      val want = rows.sortBy(r => (r._4, r._3)).map(_._3).mkString(",")
      assert(ids == want, s"pack ($st, $pk)")
    }
    // every pack starts within the cap: min offset < cap by construction
    // (a doc's WEIGHT may straddle the boundary — pack_id keys on the
    // start offset, so totals can exceed cap; that's the layout's
    // documented cut rule, not a manifest defect)
    byPack.values.foreach { rows => assert(rows.map(_._4).min < 100) }
  }

  test("negativeSamples: k per row, self-exclusive, repartition-stable") {
    val out = Sampling.negativeSamples(docs, "doc_id", k = 4)
    val rows = out.select($"doc_id", $"neg_rank", $"neg_id")
      .as[(Long, Int, Long)].collect()
    assert(rows.length == 4000)
    assert(rows.forall { case (id, _, neg) => neg != id })
    assert(rows.forall { case (_, _, neg) => neg >= 0 && neg < 1000 })
    rows.groupBy(_._1).foreach { case (id, rs) =>
      assert(rs.map(_._2).sorted.sameElements(0 until 4), s"doc $id ranks")
    }
    val again = Sampling.negativeSamples(docs.repartition(17), "doc_id", 4)
      .select($"doc_id", $"neg_rank", $"neg_id").as[(Long, Int, Long)]
      .collect().toSet
    assert(again == rows.toSet)
    // negatives spread across the corpus, not clustered on a few ids
    assert(rows.map(_._3).distinct.length > 900)
    // a 1-row corpus has no valid negative
    assert(Sampling.negativeSamples(docs.limit(1), "doc_id", 4).count() == 0)
  }

  test("tokenBudgetSample: exact greedy prefix, stops at first straddler") {
    val weighted = docs.withColumn("w", pmod($"doc_id" * 7, lit(40L)) + 1)
    val out = Sampling.tokenBudgetSample(weighted, "stratum", "doc_id", "w",
      budget = 500)
    val rows = out.select($"stratum", $"doc_id", $"w", $"cum_before")
      .as[(String, Long, Long, Long)].collect()
    // reference: sequential greedy prefix over hash order per stratum
    val hashes = weighted.select($"doc_id", Sampling.idHash($"doc_id"))
      .as[(Long, Long)].collect().toMap
    val all = weighted.select($"stratum", $"doc_id", $"w")
      .as[(String, Long, Long)].collect()
    val expect = all.groupBy(_._1).toSeq.flatMap { case (st, rs) =>
      var cum = 0L
      rs.sortBy(r => (hashes(r._2), r._2)).takeWhile { r =>
        val fits = cum + r._3 <= 500
        if (fits) cum += r._3
        fits
      }.map(r => (st, r._2))
    }.toSet
    assert(rows.map(r => (r._1, r._2)).toSet == expect)
    // budgets nest: a larger budget only ADDS rows
    val bigger = Sampling.tokenBudgetSample(weighted, "stratum", "doc_id", "w",
        budget = 900)
      .select($"doc_id").as[Long].collect().toSet
    assert(rows.map(_._2).toSet.subsetOf(bigger))
    // per-stratum consumed totals respect the budget
    rows.groupBy(_._1).foreach { case (st, rs) =>
      assert(rs.map(_._3).sum <= 500, s"stratum $st over budget")
    }
  }

  test("shardLayout: dense positions, stable shards, repartition-independent") {
    val out = Sampling.shardLayout(docs, "doc_id", numShards = 8)
    val rows = out.select($"doc_id", $"shard", $"pos")
      .as[(Long, Int, Long)].collect()
    assert(rows.length == 1000)
    assert(rows.forall { case (_, s, _) => s >= 0 && s < 8 })
    // positions are dense 0..n-1 within every shard
    rows.groupBy(_._2).foreach { case (s, rs) =>
      assert(rs.map(_._3).sorted.sameElements(0L until rs.length),
        s"shard $s positions not dense")
    }
    // shards are roughly balanced (uniform hash mod)
    val sizes = rows.groupBy(_._2).view.mapValues(_.length)
    assert(sizes.values.forall(n => n > 80 && n < 170), sizes.toMap.toString)
    // deterministic under repartition
    val again = Sampling.shardLayout(docs.repartition(13), "doc_id", 8)
      .select($"doc_id", $"shard", $"pos").as[(Long, Int, Long)].collect()
    assert(again.toSet == rows.toSet)
    // growth stability: adding rows never changes an existing row's shard
    val grown = Sampling.shardLayout(
        docs.union(spark.range(1000, 1500).select($"id".as("doc_id"),
          lit("x").as("stratum"))), "doc_id", 8)
      .filter($"doc_id" < 1000)
      .select($"doc_id", $"shard").as[(Long, Int)].collect().toMap
    val orig = rows.map(r => r._1 -> r._2).toMap
    assert(grown == orig)
  }

  test("salted two-phase stratified equals the plain form (rows AND ranks)") {
    for (salts <- Seq(1, 4, 16, 64)) {
      val plain = Sampling.stratifiedByHash(docs, "stratum", "doc_id", 25)
        .select($"doc_id", $"stratum", $"rk").as[(Long, String, Int)].collect().toSet
      val salted = Sampling.stratifiedByHashSalted(docs, "stratum", "doc_id", 25,
          salts = salts)
        .select($"doc_id", $"stratum", $"rk").as[(Long, String, Int)].collect().toSet
      assert(salted === plain, s"salts=$salts")
    }
  }

  test("splitByGroup: near-dup groups share a split; unpaired = per-id hash split") {
    val docs = (1L to 40L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 20L)).toDF("id_a", "id_b")
    val out = Sampling.splitByGroup(docs, pairs, "doc_id",
        Seq("train" -> 0.8, "val" -> 0.1))
      .select(col("doc_id"), col("group_id"), col("split"))
      .as[(Long, Long, String)].collect()
    assert(out.length === 40)
    val m = out.map(r => r._1 -> r).toMap
    // the transitive group {1,2,3} keys on min id 1 and shares ONE split
    assert(Seq(1L, 2L, 3L).map(m(_)._2).toSet === Set(1L))
    assert(Seq(1L, 2L, 3L).map(m(_)._3).toSet.size === 1)
    assert(Seq(10L, 20L).map(m(_)._2).toSet === Set(10L))
    assert(Seq(10L, 20L).map(m(_)._3).toSet.size === 1)
    // unpaired docs degrade to exactly the per-id hash carve-up
    def expected(id: Long): String = {
      val h = graft.functions.IdHash.hash(id)
      if (h < 3435973836L) "train" else if (h < 3865470566L) "val" else "test"
    }
    for (id <- 4L to 9L) {
      assert(m(id)._2 === id)
      assert(m(id)._3 === expected(id))
    }
    // grouped docs score on the GROUP id, not their own
    assert(m(3L)._3 === expected(1L))
    assert(m(20L)._3 === expected(10L))
  }

  test("salted phase 1 splits the stratum's shuffle across salt groups") {
    // one giant stratum: the plain form sorts it through ONE window
    // partition; the salted form's first window must key on
    // (stratum, salt), splitting the sort 16 ways
    val one = docs.withColumn("stratum", lit("all"))
    val out = Sampling.stratifiedByHashSalted(one, "stratum", "doc_id", 25)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    val windowSpecs = plan.split("\n").filter(_.contains("Window"))
    // first (inner) window partitions by 2 expressions, second by 1
    assert(plan.contains("pmod"), "salt expression missing from plan")
    assert(windowSpecs.length >= 2, s"expected two window operators:\n$plan")
    assert(out.count() === 25)
  }

  test("fimTransform: PSM pieces reassemble to the original; rate edges; repartition-stable") {
    val docs = graft.sources.Tables.documents(spark, sf()).select(col("doc_id"), col("text"))
    val fim = Sampling.fimTransform(docs, "doc_id", "text", rate = 0.5)
      .as[(Long, String, Boolean)].collect()
    val original = docs.as[(Long, String)].collect().toMap
    assert(fim.exists(_._3) && fim.exists(!_._3), "both fates must occur")
    val Psm = "(?s)^<\\|fim_prefix\\|>(.*)<\\|fim_suffix\\|>(.*)<\\|fim_middle\\|>(.*)$".r
    fim.foreach { case (id, text, applied) =>
      if (!applied) assert(text == original(id))
      else text match {
        case Psm(p, suf, mid) =>
          // the transform is a permutation: nothing lost, nothing added
          assert(p + mid + suf == original(id), s"doc $id does not reassemble")
        case _ => fail(s"doc $id not in PSM format: ${text.take(60)}")
      }
    }
    // rate edges
    assert(Sampling.fimTransform(docs, "doc_id", "text", rate = 0.0)
      .filter(col("fim_applied")).count() == 0)
    assert(Sampling.fimTransform(docs, "doc_id", "text", rate = 1.0)
      .filter(!col("fim_applied")).count() == 0)
    // partitioning never changes any emitted byte
    val again = Sampling.fimTransform(docs.repartition(13), "doc_id", "text",
        rate = 0.5).as[(Long, String, Boolean)].collect().sortBy(_._1)
    assert(again.toSeq == fim.sortBy(_._1).toSeq)
  }

  test("domainReweightInt: exact integer Hedge replay — DRO clamp at " +
      "zero excess, hot domain gains through renormalized rounds, " +
      "partitioning-invariant") {
    // hot: mean loss 600 vs ref 300 -> excess_q = 1_000_000;
    // warm: mean exactly 300 -> clamps to 0; cold: below -> 0
    val docs = Seq(
      (1L, "hot", 600L), (2L, "hot", 600L),
      (3L, "warm", 450L), (4L, "warm", 150L),
      (5L, "cold", 100L)).toDF("doc_id", "source", "loss")
    val scale = 1000000L; val eta = 200000L; val T = 1000000000L
    // scalar mirror of the operator's integer chain
    def replay(excess: Map[String, Long], rounds: Int): Map[String, Long] = {
      var w = excess.map { case (d, _) => d -> scale }
      for (_ <- 1 to rounds) {
        val u = w.map { case (d, x) =>
          d -> (x + x * excess(d) / scale * eta / scale) }
        val tot = u.values.sum
        w = u.map { case (d, x) => d -> x * T / tot }
      }
      w
    }
    val excess = Map("hot" -> 1000000L, "warm" -> 0L, "cold" -> 0L)
    for (rounds <- Seq(1, 3)) {
      val got = Sampling.domainReweightInt(docs, "source", "loss",
          refLoss = 300L, rounds = rounds, etaNum = eta, scale = scale)
        .select($"domain", $"n_docs", $"excess_q", $"weight")
        .as[(String, Long, Long, Long)].collect()
        .map(r => r._1 -> (r._2, r._3, r._4)).toMap
      val want = replay(excess, rounds)
      assert(got.keySet == excess.keySet)
      excess.foreach { case (d, x) =>
        assert(got(d)._2 == x, s"$d excess: got=${got(d)._2} want=$x")
        assert(got(d)._3 == want(d), s"$d weight r$rounds: " +
          s"got=${got(d)._3} want=${want(d)}")
      }
      // renormalization: total <= T with < 1 unit floor loss per domain
      val tot = got.values.map(_._3).sum
      assert(tot <= T && tot > T - excess.size, tot)
      // the DRO direction: only the hot domain gains
      assert(got("hot")._3 > got("warm")._3 &&
        got("warm")._3 == got("cold")._3)
    }
    // partitioning invariance (integer exactness — no float in the state)
    val a = Sampling.domainReweightInt(docs.repartition(7), "source",
        "loss", 300L).orderBy($"domain").collect().toSeq
    val b = Sampling.domainReweightInt(docs.coalesce(1), "source",
        "loss", 300L).orderBy($"domain").collect().toSeq
    assert(a == b)
    // the applied mixture: max-weight domain keeps ALL (threshold =
    // 2^32 exceeds every hash), low domains keep a hash-determined
    // subset; output rows are a subset of the input
    val mix = Sampling.domainReweightMixture(docs, "source", "doc_id",
        "loss", 300L)
      .select($"doc_id", $"source").as[(Long, String)].collect().toSet
    assert(mix.filter(_._2 == "hot") ==
      Set((1L, "hot"), (2L, "hot")), mix)
    assert(mix.subsetOf(docs.select($"doc_id", $"source")
      .as[(Long, String)].collect().toSet))
  }

  test("domainReweightInt overflow clamp (r17 ADVICE): a ~100x-" +
      "reference domain saturates at capQ instead of wrapping the " +
      "renormalization negative and silently dropping the domain") {
    // mega: mean loss 30000 vs ref 300 -> raw excess_q = 99e6, which
    // before the clamp drove u*1e9 past Long.Max by round 2 (the
    // dominant domain holds w ~ 1e9 after renormalization) and
    // produced a NEGATIVE weight the mixture floored into a dropped
    // domain. capQ = min(8*scale^2/etaNum, 9e9) = 4e7 at the defaults.
    val docs = Seq(
      (1L, "mega", 30000L), (2L, "mega", 30000L),
      (3L, "tiny", 300L)).toDF("doc_id", "source", "loss")
    val got = Sampling.domainReweightInt(docs, "source", "loss",
        refLoss = 300L, rounds = 3)
      .select($"domain", $"excess_q", $"weight")
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val capQ = 8L * 1000000L * 1000000L / 200000L
    assert(got("mega")._1 == capQ, got) // raw 99e6 saturates at 4e7
    assert(got("tiny")._1 == 0L)
    assert(got.values.forall(_._2 > 0L), got) // nothing wrapped
    assert(got("mega")._2 > got("tiny")._2)
    val tot = got.values.map(_._2).sum
    assert(tot <= 1000000000L && tot > 1000000000L - 2, tot)
    // the applied mixture keeps the saturated domain's docs (it is
    // the max-weight domain: threshold = 2^32 keeps everything)
    val mix = Sampling.domainReweightMixture(docs, "source", "doc_id",
        "loss", 300L).select($"source").as[String].collect()
    assert(mix.count(_ == "mega") == 2, mix.toSeq)
    // parameter hygiene: the bounds behind capQ's own overflow safety
    intercept[IllegalArgumentException] {
      Sampling.domainReweightInt(docs, "source", "loss", 300L,
        scale = 100L)
    }
    intercept[IllegalArgumentException] {
      Sampling.domainReweightInt(docs, "source", "loss", 300L,
        etaNum = 2000000L)
    }
  }

  test("domainReweightInt input-side guard (r17 verdict): a domain " +
      "whose pre-clamp excess*scale exceeds Long.Max lands exactly on " +
      "capQ via the decimal aggregate instead of wrapping") {
    // one doc with loss 1e13: Σexcess·scale ≈ 1e19 > 2^63 — the old
    // long-typed product wrapped NEGATIVE (greatest already passed, so
    // the wrap reached excess_q and the weights). In decimal the
    // quotient evaluates exactly (~3.3e16) and saturates at capQ.
    val docs = Seq(
      (1L, "whale", 10000000000000L), (2L, "tiny", 300L))
      .toDF("doc_id", "source", "loss")
    val got = Sampling.domainReweightInt(docs, "source", "loss",
        refLoss = 300L, rounds = 3)
      .select($"domain", $"excess_q", $"weight")
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val capQ = 8L * 1000000L * 1000000L / 200000L
    assert(got("whale")._1 == capQ, got)
    assert(got("tiny")._1 == 0L)
    assert(got.values.forall(_._2 > 0L), got) // no wrapped weights
    assert(got("whale")._2 > got("tiny")._2)
  }
}
