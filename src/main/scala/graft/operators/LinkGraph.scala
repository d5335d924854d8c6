package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Crawl link-graph analytics. The host-level PageRank every large
  * crawl publishes (Common Crawl's host ranks) is the standard
  * quality/spam prior for corpus curation — pages on well-linked hosts
  * survive, link farms sink. This implementation is INTEGER-EXACT:
  * ranks are scaled longs, per-edge contributions are floor divisions,
  * and the damping step is a cross-multiplied integer division, so
  * every iteration is independent of summation order and partitioning
  * — the property that lets a relational oracle replay the iterations
  * bit-for-bit (the same fixed-point trick as the in-engine classifier
  * and the DCT hash).
  */
object LinkGraph {

  /** `iterations` rounds of damped PageRank over DISTINCT directed
    * edges. rank₀(v) = `scale`;
    *
    *   rank'(v) = (scale·(dampDen−dampNum)) div dampDen
    *            + (dampNum · Σ_{(u,v)∈E} (rank(u) div out(u))) div dampDen
    *
    * Deliberate exactness-serving deviations from the textbook form,
    * both documented standard variants: dangling mass is dropped (no
    * node here is rank-source-only — every crawl host with an outlink
    * row has out ≥ 1 — and redistribution would need a global scalar
    * per round), and floor division loses < 1 unit per edge per round
    * (relative error ≤ E/(N·scale) — pick `scale` ≫ edges/node).
    *
    * Overflow: one node's incoming mass is < N·scale, and the damping
    * multiply puts it at dampNum·N·scale — keep that under 2⁶³ (e.g.
    * scale 10¹² serves 10⁵ hosts, 10⁹ serves 10⁸). ANSI mode makes a
    * violation a hard error, never a silent wrap.
    *
    * Scale shape: out-degrees join the edge relation ONCE before the
    * loop (persisted); each round is one equi-join rank-lookup + one
    * partial-aggregated groupBy — the textbook distributed PR round.
    * Ranks persist per round and the previous round unpersists, so
    * lineage stays one round deep. The iteration count is a small
    * constant (3–20 in practice), not a fixpoint hunt — no
    * convergence-witness machinery needed.
    *
    * INCREMENTAL refresh: pass `init` = a previous run's (node, rank)
    * output to warm-start after an edge diff ([[Upsert.mergeLatest]]
    * over keyed edge rows is the diff applier) — a few delta rounds
    * from the old fixpoint replace a full cold recompute. Nodes new
    * to the graph seed at `scale`; nodes gone from the graph drop
    * (the node set always comes from the CURRENT edges). Integer
    * exactness makes the warm path auditable: N cold rounds ≡ M cold
    * rounds + (N−M) warm rounds, bit-for-bit (spec-pinned), so a
    * relational oracle replays incremental refreshes the same way it
    * replays cold ones.
    *
    * PERSONALIZED (topic-sensitive, Haveliwala) PageRank: pass
    * `seeds` = a (node) relation and the teleport term concentrates
    * there — non-seeds get base 0, so rank flows FROM the seed set
    * through links and a host's score reads "how reachable from the
    * trusted/topical seeds" (TrustRank-style spam demotion, topical
    * quality priors). One per-node base column replaces the constant;
    * nothing else in the loop changes, so seeded runs keep the exact
    * replay property (seed membership is a CASE in the oracle).
    * Seeds absent from the graph contribute nothing; an empty
    * seed set drains all rank to 0 by round `iterations` (documented,
    * spec-pinned).
    *
    * DANGLING-MASS redistribution: the default drops mass on nodes
    * with no outlinks (true no-op for crawl host graphs, where every
    * src row has out ≥ 1, but a general caller with rank sinks leaks
    * mass every round). `danglingRedistribute = true` adds the
    * textbook correction, kept integer-exact: each round the dangling
    * nodes' total rank D (one partial-aggregated sum over the
    * persisted dangling-node set) rides a 1-row broadcast crossJoin —
    * the [[hitsInt]] rescale shape, never a driver collect — and
    * every node's contribution sum gains share = D div N before the
    * damping division. Floor division drops < N units of D per round
    * (same loss class as the per-edge floors), so total mass is
    * conserved to within (E + N) units per round (spec-pinned), and
    * the replay oracle extends with one sum + one cross-joined scalar
    * per round. Default behavior is unchanged.
    */
  def pageRankInt(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int = 3, scale: Long = 1000000000000L,
      dampNum: Long = 85L, dampDen: Long = 100L,
      init: Option[DataFrame] = None,
      seeds: Option[DataFrame] = None,
      danglingRedistribute: Boolean = false): DataFrame = {
    require(iterations >= 0, "iterations must be >= 0")
    require(dampDen > 0 && dampNum >= 0 && dampNum <= dampDen,
      "damping must satisfy 0 <= dampNum <= dampDen")
    val parent = edges.sparkSession
    val eParent = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct()
    val eoParent = eParent.join(
      eParent.groupBy(col("src")).agg(count(lit(1)).as("__out")),
      "src").persist()
    val edgeCount = eoParent.count()
    // same loop discipline as the CC fixpoints (Dedup.scala): size the
    // per-round shuffles from the measured edge count on a CLONED
    // session — a 10³-host graph runs single-task rounds instead of
    // paying session-width scheduling per iteration, a 10⁹-edge graph
    // keeps full parallelism; the caller's session is never mutated
    val loopSession = org.apache.spark.sql.graft.Bridge.cloneSession(parent)
    val loopParts = Dedup.loopShufflePartitions(
      parent.conf.get("spark.sql.shuffle.partitions", "200"), edgeCount)
    // latency mode ONLY for graphs whose rounds are single-task anyway:
    // there AQE's per-stage barriers are pure overhead. A big graph
    // keeps AQE — a whale OUT-degree host skews the per-round
    // rank-lookup join on `src`, and AQE's skew split is the mitigation
    // (the ranks side is one row per node, the splittable shape).
    if (loopParts <= 1) loopSession.conf.set("spark.sql.adaptive.enabled", "false")
    loopSession.conf.set("spark.sql.shuffle.partitions", loopParts.toString)
    // coalesce the loop state ONCE so per-round MAP stages schedule
    // loopParts tasks, not session width (the r17 core-inversion fix)
    val eo = Dedup.loopStateRelation(loopSession, eoParent, loopParts)
    val base = (scale * (dampDen - dampNum)) / dampDen
    // per-node teleport base: the constant everywhere, or (seeded)
    // the constant on the seed set and 0 elsewhere — carried as a
    // column of the persisted node relation so each round's final
    // projection stays one expression
    val bareNodes = eo.select(col("src").as("node"))
      .unionByName(eo.select(col("dst").as("node"))).distinct()
    val nodes = (seeds match {
      case Some(sd) =>
        val s = org.apache.spark.sql.graft.Bridge.inSession(loopSession,
          sd.select(col("node")).distinct().withColumn("__seed", lit(true)))
        bareNodes.join(s, Seq("node"), "left")
          .select(col("node"),
            when(coalesce(col("__seed"), lit(false)), lit(base))
              .otherwise(lit(0L)).as("__base"))
      case None => bareNodes.select(col("node"), lit(base).as("__base"))
    }).persist()
    var ranks = (init match {
      case Some(prior) =>
        val p = org.apache.spark.sql.graft.Bridge.inSession(loopSession,
          // lineage truncation: a prior produced by a previous loop run
          // carries that whole run's unrolled plan — every warm round's
          // action would re-analyze it (the tkcTopK finding). One k-row
          // materialization cuts it to an RDD scan.
          prior.select(col("node"), col("rank").as("__r0")).localCheckpoint())
        nodes.join(p, Seq("node"), "left")
          .select(col("node"), coalesce(col("__r0"), lit(scale)).as("rank"))
      case None => nodes.select(col("node"), lit(scale).as("rank"))
    }).persist()
    ranks.count()
    // dangling nodes (no outlink row) and N, fixed for the whole run —
    // only materialized when redistribution is on
    val dangling =
      if (!danglingRedistribute) None
      else Some(nodes.select(col("node"))
        .join(eo.select(col("src").as("node")).distinct(),
          Seq("node"), "left_anti").persist())
    val nodeCount = if (danglingRedistribute) nodes.count() else 0L
    var it = 0
    while (it < iterations) {
      val sums = eo.join(ranks, eo("src") === ranks("node"))
        .select(col("dst"), expr("rank div __out").as("__c"))
        .groupBy(col("dst")).agg(sum(col("__c")).as("__s"))
      val next = (dangling match {
        case Some(d) =>
          // D as a 1-row relation; share = D div N floors once per round
          val dMass = ranks.join(d, Seq("node"))
            .agg(coalesce(sum(col("rank")), lit(0L)).as("__d"))
          nodes.join(sums, nodes("node") === sums("dst"), "left")
            .crossJoin(broadcast(dMass))
            .select(col("node"),
              (col("__base") + expr(s"($dampNum * (coalesce(__s, 0) " +
                s"+ __d div $nodeCount)) div $dampDen")).as("rank"))
        case None =>
          nodes.join(sums, nodes("node") === sums("dst"), "left")
            .select(col("node"),
              (col("__base") +
                expr(s"($dampNum * coalesce(__s, 0)) div $dampDen")).as("rank"))
      }).persist()
      next.count()
      ranks.unpersist()
      ranks = next
      it += 1
    }
    dangling.foreach(_.unpersist())
    eo.unpersist()
    eoParent.unpersist()
    nodes.unpersist()
    // re-root the result in the caller's session (cache hit via the
    // shared CacheManager)
    org.apache.spark.sql.graft.Bridge.inSession(parent, ranks)
  }

  /** SALSA (Lempel & Moran) over DISTINCT directed edges — the
    * stochastic hubs/authorities variant: each side's update divides
    * by the crossing degree (auth'(v) = Σ_{u→v} hub(u) div out(u),
    * hub'(u) = Σ_{u→v} auth'(v) div in(v)), i.e. the random walk that
    * steps backward over an in-link then forward over an out-link.
    * Because every update is degree-normalized, total mass is
    * conserved up to floor loss — no rescale step at all (vs
    * [[hitsInt]]'s max-based one), so a round is TWO joins + TWO
    * partial-aggregated sums and the oracle replay has no max
    * subqueries. SALSA resists the tightly-knit-community effect that
    * inflates HITS scores (the TKC spam pattern); running both and
    * comparing IS the spam signal. Floor divisions keep it
    * summation-order/partitioning invariant (spec-pinned); dangling
    * behavior matches [[pageRankInt]] (mass on a no-outlink hub /
    * no-inlink authority drains, documented). Overflow: per-node
    * accumulation < N·scale with no damping multiplier — the roomiest
    * bound in the family.
    */
  def salsaInt(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int = 2, scale: Long = 1000000000000L,
      init: Option[DataFrame] = None): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    val parent = edges.sparkSession
    val eParent = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct()
    // both crossing degrees join the edge relation ONCE before the loop
    val eoParent = eParent
      .join(eParent.groupBy(col("src")).agg(count(lit(1)).as("__out")), "src")
      .join(eParent.groupBy(col("dst")).agg(count(lit(1)).as("__in")), "dst")
      .persist()
    val edgeCount = eoParent.count()
    require(edgeCount > 0, "salsaInt needs a non-empty edge set")
    val loopSession = org.apache.spark.sql.graft.Bridge.cloneSession(parent)
    val loopParts = Dedup.loopShufflePartitions(
      parent.conf.get("spark.sql.shuffle.partitions", "200"), edgeCount)
    if (loopParts <= 1) loopSession.conf.set("spark.sql.adaptive.enabled", "false")
    loopSession.conf.set("spark.sql.shuffle.partitions", loopParts.toString)
    // loop-width map stages — see pageRankInt's coalesce note
    val e = Dedup.loopStateRelation(loopSession, eoParent, loopParts)
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node"))).distinct().persist()
    // warm start: the loop's only carried state is hub (auth derives
    // from it each round), so a prior run's (node, hub) output resumes
    // the iteration exactly — N cold ≡ M cold + (N−M) warm (the
    // pageRankInt init pattern; new nodes seed at scale, dropped
    // nodes vanish with the node set)
    def seedHub: DataFrame = init match {
      case Some(prior) =>
        val p = org.apache.spark.sql.graft.Bridge.inSession(loopSession,
          // lineage truncation — see pageRankInt's init note
          prior.select(col("node"), col("hub").as("__h0")).localCheckpoint())
        nodes.join(p, Seq("node"), "left")
          .select(col("node"), coalesce(col("__h0"), lit(scale)).as("hub"))
      case None => nodes.select(col("node"), lit(scale).as("hub"))
    }
    def side(inRel: DataFrame, inCol: String, valCol: String, degCol: String,
        outKey: String, outCol: String): DataFrame = {
      val raw = e.join(inRel, e(inCol) === inRel("node"))
        .select(col(outKey).as("__k"),
          expr(s"$valCol div $degCol").as("__c"))
        .groupBy(col("__k")).agg(sum(col("__c")).as("__s"))
      nodes.join(raw, nodes("node") === raw("__k"), "left")
        .select(col("node"), coalesce(col("__s"), lit(0L)).as(outCol))
    }
    var hub = seedHub.persist()
    hub.count()
    var auth: DataFrame = null
    var it = 0
    while (it < iterations) {
      val nextAuth = side(hub, "src", "hub", "__out", "dst", "auth").persist()
      nextAuth.count()
      if (auth != null) auth.unpersist()
      auth = nextAuth
      val nextHub = side(auth, "dst", "auth", "__in", "src", "hub").persist()
      nextHub.count()
      hub.unpersist()
      hub = nextHub
      it += 1
    }
    val out = hub.join(auth, Seq("node"))
      .select(col("node"), col("hub"), col("auth"))
    e.unpersist()
    eoParent.unpersist()
    nodes.unpersist()
    org.apache.spark.sql.graft.Bridge.inSession(parent, out)
  }

  /** Kleinberg HITS (hubs & authorities) over DISTINCT directed
    * edges, INTEGER-exact like [[pageRankInt]] — the complementary
    * link prior: PageRank finds endorsed hosts, HITS separates the
    * DIRECTORY hosts (hubs: link to many good authorities) from the
    * CONTENT hosts (authorities: linked by many good hubs) — at crawl
    * scale that split is the link-farm signature (farms are hubs with
    * no authority).
    *
    * Per round: auth'(v) = Σ_{u→v} hub(u), hub'(u) = Σ_{u→v} auth'(v),
    * each rescaled to ≤ `scale` by FLOOR division with
    * g = (max + scale − 1) div scale — the classic normalization made
    * exact: no float norm, so every round is summation-order and
    * partitioning invariant (spec-pinned) and a relational oracle
    * replays iterations as CTE layers with a max subquery per
    * rescale. The max rides a 1-row broadcast crossJoin, never a
    * driver collect.
    *
    * Overflow bound: raw sums ≤ N·scale — scale 10¹² serves ~9·10⁶
    * nodes under ANSI (vs pageRankInt's additional dampNum factor);
    * the rescale caps each round's input at `scale` so rounds never
    * compound. Scale shape: identical to [[pageRankInt]] — out-edges
    * persisted once, per-round one equi-join + one partial-aggregated
    * groupBy per side, measured-width loop shuffles, lineage one
    * round deep.
    */
  def hitsInt(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int = 2, scale: Long = 1000000000000L,
      init: Option[DataFrame] = None): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    val parent = edges.sparkSession
    val eParent = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct().persist()
    val edgeCount = eParent.count()
    require(edgeCount > 0, "hitsInt needs a non-empty edge set")
    val loopSession = org.apache.spark.sql.graft.Bridge.cloneSession(parent)
    val loopParts = Dedup.loopShufflePartitions(
      parent.conf.get("spark.sql.shuffle.partitions", "200"), edgeCount)
    if (loopParts <= 1) loopSession.conf.set("spark.sql.adaptive.enabled", "false")
    loopSession.conf.set("spark.sql.shuffle.partitions", loopParts.toString)
    // loop-width map stages — see pageRankInt's coalesce note
    val e = Dedup.loopStateRelation(loopSession, eParent, loopParts)
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node"))).distinct().persist()
    // one rescaled side: nodes ⟕ raw sums, g from the 1-row max
    def rescale(raw: DataFrame, keyCol: String, outCol: String): DataFrame = {
      val m = raw.agg(max(col("__raw")).as("__m"))
      nodes.join(raw, nodes("node") === raw(keyCol), "left")
        .crossJoin(broadcast(m))
        .select(col("node"),
          expr(s"coalesce(__raw, 0) div ((__m + $scale - 1) div $scale)")
            .as(outCol))
    }
    // warm start: hub is the only carried state (each round derives
    // auth from hub, then hub from auth), so a prior (node, hub)
    // output resumes exactly — N cold ≡ M cold + (N−M) warm
    // (spec-pinned); new nodes seed at scale, dropped nodes vanish
    var hub = (init match {
      case Some(prior) =>
        val p = org.apache.spark.sql.graft.Bridge.inSession(loopSession,
          // lineage truncation — see pageRankInt's init note
          prior.select(col("node"), col("hub").as("__h0")).localCheckpoint())
        nodes.join(p, Seq("node"), "left")
          .select(col("node"), coalesce(col("__h0"), lit(scale)).as("hub"))
      case None => nodes.select(col("node"), lit(scale).as("hub"))
    }).persist()
    hub.count()
    var auth: DataFrame = null
    var it = 0
    while (it < iterations) {
      val nextAuth = rescale(
        e.join(hub, e("src") === hub("node"))
          .groupBy(col("dst")).agg(sum(col("hub")).as("__raw")),
        "dst", "auth").persist()
      nextAuth.count()
      if (auth != null) auth.unpersist()
      auth = nextAuth
      val nextHub = rescale(
        e.join(auth, e("dst") === auth("node"))
          .groupBy(col("src")).agg(sum(col("auth")).as("__raw")),
        "src", "hub").persist()
      nextHub.count()
      hub.unpersist()
      hub = nextHub
      it += 1
    }
    val out = hub.join(auth, Seq("node"))
      .select(col("node"), col("hub"), col("auth"))
    e.unpersist()
    eParent.unpersist()
    nodes.unpersist()
    org.apache.spark.sql.graft.Bridge.inSession(parent, out)
  }

  /** The PUBLISH-GRADE host-scores relation — the artifact a crawl
    * operator actually ships (Common Crawl's host ranks, one row per
    * host, every link prior as a column): damped PageRank, HITS
    * hub/authority, SALSA hub/authority, and (when seed sets are
    * given) TrustRank = good-seeded PR − spam-seeded PR. One call,
    * every score integer-exact from the same distinct edge relation,
    * so the whole relation is reproducible and each column's replay
    * oracle composes. Downstream: join pages on host for quality
    * priors, [[tkcTopKFromScores]] on (hits hub, salsa hub) for the
    * farm detector, [[graft.operators.CrawlPipeline.frontierSlots]]
    * on pr for scheduling.
    *
    * Scale shape: five independent iteration loops over one edge set —
    * each is the measured-width, lineage-truncated loop documented on
    * its own operator; the final assembly is node-keyed joins of
    * O(hosts) relations. Output columns: node, pr, hub, auth,
    * salsa_hub, salsa_auth [, trust, spam_mass, trustrank].
    */
  def hostScores(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int = 2, scale: Long = 1000000000000L,
      goodSeeds: Option[DataFrame] = None,
      spamSeeds: Option[DataFrame] = None): DataFrame = {
    require(goodSeeds.isEmpty == spamSeeds.isEmpty,
      "goodSeeds and spamSeeds come together (TrustRank needs both)")
    // distinct the edge relation ONCE: each of the five loops would
    // otherwise re-scan the caller's (possibly corpus-derived) edge
    // expression — at 5M docs that is five full corpus scans for one
    // tiny host graph. localCheckpoint also truncates the lineage the
    // loops' per-round actions would re-analyze.
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct().localCheckpoint()
    val pr = pageRankInt(e, "src", "dst", iterations, scale)
      .withColumnRenamed("rank", "pr")
    val hits = hitsInt(e, "src", "dst", iterations, scale)
    val salsa = salsaInt(e, "src", "dst", iterations, scale)
      .select(col("node"), col("hub").as("salsa_hub"),
        col("auth").as("salsa_auth"))
    val base = pr.join(hits, Seq("node")).join(salsa, Seq("node"))
    (goodSeeds, spamSeeds) match {
      case (Some(g), Some(sp)) =>
        val trust = pageRankInt(e, "src", "dst", iterations, scale,
            seeds = Some(g)).withColumnRenamed("rank", "trust")
        val spamMass = pageRankInt(e, "src", "dst", iterations, scale,
            seeds = Some(sp)).withColumnRenamed("rank", "spam_mass")
        base.join(trust, Seq("node")).join(spamMass, Seq("node"))
          .withColumn("trustrank", col("trust") - col("spam_mass"))
      case _ => base
    }
  }

  /** The TKC (tightly-knit-community) link-farm detector at WEB scale:
    * HITS hub rank vs SALSA hub rank on the same graph, WITHOUT the
    * global `row_number` windows the naive form uses (an unpartitioned
    * window is a single-task sort of every node — dead at 10⁸ hosts).
    *
    * Shape: the k suspects come off the HITS side as a distributed
    * top-k (`orderBy().limit(k)` plans as TakeOrderedAndProject —
    * per-partition heaps, no global sort), and each suspect's EXACT
    * global rank in both score relations is a count-of-greater: the k
    * suspect rows broadcast against the full relation
    * (BroadcastNestedLoopJoin — k comparisons per scanned row,
    * map-side), and rank = 1 + count of rows strictly ahead under the
    * total (score desc, node) order. No Window anywhere in the plan
    * (PlanAudit-pinned); cost is O(N·k) comparisons + two
    * partial-aggregated counts — the honest exact form. For k beyond
    * a few hundred, bucket ranks by score quantiles instead.
    *
    * Output (one row per top-k HITS hub): node, hits_hub, salsa_hub,
    * hits_rank, salsa_rank, divergence = salsa_rank − hits_rank. A
    * large positive divergence — "HITS thinks this host matters, the
    * random walk doesn't" — is the classic link-farm flag (Lempel &
    * Moran's TKC effect).
    */
  def tkcTopK(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int = 2, k: Int = 100,
      scale: Long = 1000000000000L): DataFrame = {
    require(k >= 1, "k must be >= 1")
    // LINEAGE TRUNCATION: the iteration outputs' logical plans carry
    // the whole unrolled loop (every round's join/agg over the edge
    // scans) — execution hits the loops' caches, but every ACTION here
    // would re-analyze that tree, and the ranking phase runs several.
    // localCheckpoint collapses each score relation to an RDD scan
    // (the per-round discipline the loops themselves use), so the
    // rank plans stay O(1) regardless of iteration count.
    val hits = hitsInt(edges, srcCol, dstCol, iterations, scale)
      .select(col("node"), col("hub").as("hits_hub")).localCheckpoint()
    val salsa = salsaInt(edges, srcCol, dstCol, iterations, scale)
      .select(col("node"), col("hub").as("salsa_hub")).localCheckpoint()
    tkcTopKFromScores(hits, salsa, k)
  }

  /** [[tkcTopK]]'s ranking phase over ALREADY-COMPUTED score
    * relations — `hits` as (node, hits_hub), `salsa` as
    * (node, salsa_hub) — for callers that reuse one HITS/SALSA run
    * across several detectors (or read them from a materialized
    * store). Same plan shape and guarantees as [[tkcTopK]].
    */
  def tkcTopKFromScores(hits: DataFrame, salsa: DataFrame,
      k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    // distributed top-k: TakeOrderedAndProject, never a global sort.
    // The k-row suspect relation feeds three consumers (two broadcast
    // rank probes + the final join); the eager localCheckpoint
    // materializes it once, k rows, O(1) plan
    val top = hits.orderBy(col("hits_hub").desc, col("node")).limit(k)
      .join(salsa, Seq("node")).localCheckpoint()
    // exact global rank of each suspect in `scores`: 1 + |rows strictly
    // ahead| under (score desc, node asc) — k-row broadcast, map-side
    // comparisons, partial-aggregated count
    def rankAgainst(scores: DataFrame, scoreCol: String,
        rankCol: String): DataFrame = {
      val t = top.select(col("node").as("__tn"), col(scoreCol).as("__ts"))
      val ahead = scores.join(broadcast(t),
          col(scoreCol) > col("__ts") ||
            (col(scoreCol) === col("__ts") && col("node") < col("__tn")))
        .groupBy(col("__tn")).agg(count(lit(1)).as("__c"))
      t.select(col("__tn")).join(ahead, Seq("__tn"), "left")
        .select(col("__tn").as("node"),
          (coalesce(col("__c"), lit(0L)) + 1L).as(rankCol))
    }
    top
      .join(rankAgainst(hits, "hits_hub", "hits_rank"), Seq("node"))
      .join(rankAgainst(salsa, "salsa_hub", "salsa_rank"), Seq("node"))
      .withColumn("divergence", col("salsa_rank") - col("hits_rank"))
      .select(col("node"), col("hits_hub"), col("salsa_hub"),
        col("hits_rank"), col("salsa_rank"), col("divergence"))
  }

  /** Breadth-first CRAWL DEPTH from a seed set: the hop distance a
    * frontier-driven crawl assigns every host (seeds = 0, their
    * outlink targets = 1, …) — the depth column crawl schedulers cap
    * on ("crawl to depth 6") and quality pipelines prior on (deep
    * pages are worse on average). Exact shortest hop count: a node
    * first reached at round d can never get a smaller depth later, so
    * the frontier loop IS Dijkstra on unit weights.
    *
    * Scale shape: the same loop discipline as [[pageRankInt]] — edges
    * distinct once, per-round work is one equi-join of the CURRENT
    * frontier (not the whole visited set) against edges plus one
    * anti-join against visited, both persisted and lineage-truncated;
    * rounds stop early when the frontier drains. Deterministic and
    * partitioning-invariant (min-depth is order-free), so an oracle
    * replays rounds as unrolled layers. Unreached nodes are absent
    * from the output (the caller's left join decides their fate).
    *
    * @param seeds (node) relation
    * @return (node, depth) — depth ∈ [0, maxDepth]
    */
  def bfsDepth(edges: DataFrame, srcCol: String, dstCol: String,
      seeds: DataFrame, maxDepth: Int): DataFrame = {
    require(maxDepth >= 0, "maxDepth must be >= 0")
    val parent = edges.sparkSession
    val eParent = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct().persist()
    val edgeCount = eParent.count()
    val loopSession = org.apache.spark.sql.graft.Bridge.cloneSession(parent)
    val loopParts = Dedup.loopShufflePartitions(
      parent.conf.get("spark.sql.shuffle.partitions", "200"), edgeCount)
    if (loopParts <= 1)
      loopSession.conf.set("spark.sql.adaptive.enabled", "false")
    loopSession.conf.set("spark.sql.shuffle.partitions", loopParts.toString)
    // loop-width map stages — see pageRankInt's coalesce note
    val e = Dedup.loopStateRelation(loopSession, eParent, loopParts)
    var visited = org.apache.spark.sql.graft.Bridge.inSession(loopSession,
        seeds.select(col("node")).distinct())
      .withColumn("depth", lit(0L)).persist()
    var frontier = visited
    var d = 1L
    var drained = visited.count() == 0L
    while (d <= maxDepth && !drained) {
      val next = frontier.join(e, frontier("node") === e("src"))
        .select(col("dst").as("node")).distinct()
        .join(visited, Seq("node"), "left_anti")
        .withColumn("depth", lit(d)).persist()
      drained = next.count() == 0L
      if (!drained) {
        // union concatenates partition lists (|visited| + |next| per
        // round — linear growth in task count over rounds); coalesce
        // back to loop width before the checkpoint so every later
        // round's anti-join map side stays loopParts tasks
        val grown = visited.unionByName(next)
          .coalesce(math.max(1L, loopParts).toInt).localCheckpoint()
        visited.unpersist(); visited = grown; frontier = next
      } else next.unpersist()
      d += 1
    }
    e.unpersist()
    eParent.unpersist()
    // re-root in the CALLER's session (r18): bfsDepth was the one loop
    // returning a loop-session-rooted frame — every downstream
    // transform inherited the loop's narrow shuffle width (a caller
    // joining depths onto a corpus-sized relation would shuffle it at
    // loopParts tasks). localCheckpoint also truncates the unrolled
    // round lineage and lets the loop's cache drop (the CC hygiene:
    // returning the persisted frame itself leaks executor cache).
    val out = org.apache.spark.sql.graft.Bridge.inSession(parent,
      visited.localCheckpoint(true))
    visited.unpersist()
    out
  }

  /** Frontier DISCOVERY — which discovered URLs have never been
    * crawled. Exact anti-join semantics; `useBloom = true` keeps the
    * result EXACT but shifts the cost model: a Bloom filter over the
    * crawled set broadcasts (~10 bits/URL at 2% fpp — three orders
    * under the string relation), definite-new URLs pass map-side
    * WITHOUT any shuffle, and only the mightContain survivors (true
    * hits + the fp fraction) pay the exact anti-join that removes
    * false positives. A Bloom filter has no false negatives, so no
    * new URL is ever lost — the [[Decontaminate.contaminatedBloom]]
    * cost shape applied to the crawl frontier.
    */
  def frontierNewUrls(discovered: DataFrame, crawled: DataFrame,
      urlCol: String = "url", useBloom: Boolean = false,
      expectedCrawled: Long = 1000000L, fpp: Double = 0.02): DataFrame = {
    // null urls drop on BOTH paths: the exact left_anti would keep a
    // null row (null never equi-joins), while the bloom UDF would NPE
    // on it — filtering up front makes the two modes agree on every
    // input, and a null URL is not a crawlable frontier entry anyway
    val disc = discovered.select(col(urlCol).as("url"))
      .filter(col("url").isNotNull).distinct()
    val seen = crawled.select(col(urlCol).as("url"))
      .filter(col("url").isNotNull).distinct()
    if (!useBloom) disc.join(seen, Seq("url"), "left_anti")
    else {
      val bf = seen.stat.bloomFilter("url", expectedCrawled, fpp)
      val bc = disc.sparkSession.sparkContext.broadcast(bf)
      val mightContain = udf((s: String) => bc.value.mightContainString(s))
      disc.filter(!mightContain(col("url")))
        .unionByName(disc.filter(mightContain(col("url")))
          .join(seen, Seq("url"), "left_anti"))
    }
  }
}
