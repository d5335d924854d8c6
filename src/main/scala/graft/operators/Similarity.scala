package graft.operators

import graft.functions.Sketches
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StructField, StructType}
import org.apache.spark.storage.StorageLevel

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths, per the standard ANN playbook:
  *   - [[bruteForceTopK]] — exact: broadcast the (small) query set
  *     against a full scan of the corpus; one narrow stage computes
  *     cosine per (query, candidate) with the fused
  *     [[graft.functions.CosineSimilarity]] kernel, then a per-query
  *     window takes top-k. Cost O(|Q|·N); the correctness baseline and
  *     the right tool when |Q| is small.
  *   - [[ivfTopK]] — IVF (inverted-file) ANN: vectors are assigned to
  *     their nearest centroid MAP-SIDE (argmax over a constant-folded
  *     centroid literal — no exchange at all), and a query only scores
  *     candidates in its own cell (nprobe=1; [[ivfTopKProbed]] scans
  *     more cells as the recall knob). Cost O(N·C) narrow assignment +
  *     O(|Q|·N/C) probe. Centroid sets are small by contract (they fit
  *     on the driver and in a literal); that is what makes the
  *     assignment shuffle-free — the previous formulation
  *     (crossJoin + groupBy with the vector in the grouping key)
  *     shuffled one row per corpus vector with the embedding inside the
  *     key, a pure waste at 100 TB.
  */
object Similarity {

  private def asDouble(df: DataFrame, idCol: String, vecCol: String) =
    df.select(col(idCol).as("__id"),
      transform(col(vecCol), x => x.cast("double")).as("v"))

  /** Driver-local centroids, cid-ascending (the tie-break order). */
  private def collectCentroids(centroids: DataFrame, idCol: String,
      vecCol: String): Array[(Any, Array[Double])] = {
    val rows = asDouble(centroids, idCol, vecCol).orderBy(col("__id")).collect()
    require(rows.nonEmpty, "centroid set must be non-empty")
    rows.map(r => (r.get(0), r.getSeq[Double](1).toArray))
  }

  /** Literal `array<struct<cid, cv>>` of the centroid set. All children
    * are foldable, so ConstantFolding collapses the whole thing into a
    * single Literal — evaluated zero times per row.
    */
  private def centroidLit(cents: Array[(Any, Array[Double])],
      idType: DataType): Column =
    array(cents.map { case (cid, cv) =>
      struct(lit(cid).cast(idType).as("cid"),
        array(cv.map(lit).toIndexedSeq: _*).as("cv"))
    }.toIndexedSeq: _*)

  /** Map-side argmax: nearest centroid by cosine, ties to the lowest
    * cid (the literal is cid-ascending and the scan keeps the first
    * max). Purely narrow — no shuffle, no join.
    */
  private def argmaxCell(v: Column, cents: Column, idType: DataType): Column =
    aggregate(cents,
      struct(lit(-2.0).as("cs"), lit(null).cast(idType).as("cid")),
      (acc, c) => {
        val s = Sketches.cosineSim(v, c.getField("cv"))
        when(s > acc.getField("cs"),
          struct(s.as("cs"), c.getField("cid").as("cid"))).otherwise(acc)
      }).getField("cid")

  /** Exact top-k cosine neighbors for each query vector.
    * Output: (query_id, rank, neighbor_id, cos), rank 1..k by cos desc
    * (ties broken by neighbor id).
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val cand = asDouble(corpus, idCol, vecCol)
    val q = asDouble(queries, idCol, vecCol)
      .select(col("__id").as("qid"), col("v").as("qv"))
    val scored = cand.join(broadcast(q), col("__id") =!= col("qid"))
      .select(col("qid"), col("__id").as("nid"),
        Sketches.cosineSim(col("qv"), col("v")).as("cos"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid").as("query_id"), col("rank"),
        col("nid").as("neighbor_id"), col("cos"))
  }

  /** Matryoshka-style truncation: keep the first `d` dimensions and
    * L2-renormalize — the MRL serving trick (Kusupati et al.,
    * "Matryoshka Representation Learning", NeurIPS 2022): a prefix of
    * a nested embedding is itself a usable lower-cost embedding.
    * Renormalization doesn't change cosine RANKING (scale-invariant);
    * it matters for dot-product consumers and quantizers downstream.
    * Zero vectors pass through untouched (no 0/0). One narrow map —
    * runs inline with the scan; output keeps `idCol`/`vecCol` names so
    * it drops into [[bruteForceTopK]]/[[ivfTopK]] unchanged.
    */
  def truncateRenorm(emb: DataFrame, idCol: String, vecCol: String,
      d: Int): DataFrame = {
    require(d > 0, s"d must be positive: $d")
    // norm materializes in its own projection: folded ONCE per row —
    // inlining it in the per-element division lambda would re-run the
    // O(d) fold d times (HOF lambdas evaluate interpreted, no CSE)
    emb.select(col(idCol),
        transform(slice(col(vecCol), lit(1), lit(d)),
          x => x.cast("double")).as("__t"))
      .select(col(idCol), col("__t"),
        aggregate(col("__t"), lit(0.0), (acc, x) => acc + x * x).as("__n2"))
      .select(col(idCol),
        when(col("__n2") === 0.0, col("__t"))
          .otherwise(transform(col("__t"), x => x / sqrt(col("__n2"))))
          .as(vecCol))
  }

  /** Assign every vector to its nearest centroid (max cosine, ties to
    * the lowest centroid id). Output: (__id, v, cell). One narrow
    * stage: the centroid set is collected (small by contract) and
    * folded into a literal; no exchange anywhere in the plan.
    */
  def assignCells(corpus: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String): DataFrame = {
    val idType = centroids.schema(idCol).dataType
    val cents = centroidLit(collectCentroids(centroids, idCol, vecCol), idType)
    asDouble(corpus, idCol, vecCol)
      .select(col("__id"), col("v"),
        argmaxCell(col("v"), cents, idType).as("cell"))
  }

  /** [[assignCells]] keeping the winning cosine too — (__id, v, cell,
    * cs). The argmax struct materializes in its own projection so the
    * O(k·d) fold runs once per row (HOF lambdas are interpreted and
    * never CSE'd).
    */
  def assignCellsScored(corpus: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String): DataFrame = {
    val idType = centroids.schema(idCol).dataType
    val cents = centroidLit(collectCentroids(centroids, idCol, vecCol), idType)
    asDouble(corpus, idCol, vecCol)
      .select(col("__id"), col("v"),
        aggregate(cents,
          struct(lit(-2.0).as("cs"), lit(null).cast(idType).as("cid")),
          (acc, c) => {
            val s = Sketches.cosineSim(col("v"), c.getField("cv"))
            when(s > acc.getField("cs"),
              struct(s.as("cs"), c.getField("cid").as("cid"))).otherwise(acc)
          }).as("__best"))
      .select(col("__id"), col("v"),
        col("__best.cid").as("cell"), col("__best.cs").as("cs"))
  }

  /** Cluster-capped selection — the cluster-balanced curation step of
    * the SemDeDup/DCLM family: embed-cluster the corpus, then keep at
    * most `cap` items per cluster (the most central first), so no
    * single dense mode dominates the training mix. Assignment is the
    * shuffle-free constant-folded argmax ([[assignCellsScored]]); the
    * per-cluster rank is a window over (cos desc, id). At catalog
    * scale that window is exact and cheap (k partitions); at corpus
    * scale the same assignment feeds a per-cluster `percentile_approx`
    * threshold cut instead (the [[graft.operators.TextAnalysis
    * .pplBucketsByThreshold]] pattern) — rank-free, no whale-cluster
    * sort task.
    *
    * Output: (`idCol`, cluster, rk, cos) for the kept items, cos
    * rounded 6 dp.
    */
  def clusterCappedSelect(corpus: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String, cap: Int): DataFrame = {
    require(cap > 0, s"cap must be positive: $cap")
    val w = Window.partitionBy(col("cell"))
      .orderBy(col("cs").desc, col("__id"))
    assignCellsScored(corpus, centroids, idCol, vecCol)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= cap)
      .select(col("__id").as(idCol), col("cell").as("cluster"),
        col("rk"), round(col("cs"), 6).as("cos"))
  }

  /** Deterministic farthest-first traversal (Gonzalez k-center — the
    * deterministic cousin of k-means++ seeding): start from the lowest
    * id, then repeatedly add the point minimizing max-cosine to the
    * chosen set (ties to the lowest id). Spreads initial centroids
    * across the data instead of clustering them at the lowest ids.
    * Each round is one narrow scan + a k-row takeOrdered — i.e. k
    * driver-synchronized full scans total, fine at the catalog's
    * k ≤ 16 but NOT the shape for k in the thousands: at large k,
    * sample the corpus first (seed quality needs only a sample) or
    * switch to `kmeansCentroids`' single-pass-per-iteration updates.
    * Output: (cid, cv).
    */
  def farthestFirstCentroids(corpus: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val idType = corpus.schema(idCol).dataType
    val e = asDouble(corpus, idCol, vecCol).persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val first = e.orderBy(col("__id")).limit(1).collect()(0)
      var chosen = Array[(Any, Array[Double])](
        (first.get(0), first.getSeq[Double](1).toArray))
      while (chosen.length < k) {
        val cents = centroidLit(chosen, idType)
        val maxCos = aggregate(cents, lit(-2.0),
          (acc, c) => greatest(acc, Sketches.cosineSim(col("v"), c.getField("cv"))))
        val next = e.select(col("__id"), col("v"), maxCos.as("mc"))
          .orderBy(col("mc").asc, col("__id").asc)
          .limit(1).collect()(0)
        chosen :+= ((next.get(0), next.getSeq[Double](1).toArray))
      }
      centroidsToDf(corpus, chosen, idType)
    } finally e.unpersist()
  }

  private def centroidsToDf(corpus: DataFrame,
      cents: Array[(Any, Array[Double])], idType: DataType): DataFrame = {
    val schema = StructType(Seq(StructField("cid", idType),
      StructField("cv", ArrayType(DoubleType, containsNull = false))))
    corpus.sparkSession.createDataFrame(
      java.util.Arrays.asList(cents.map { case (cid, cv) =>
        Row(cid, cv.toSeq) }: _*), schema)
  }

  /** Lloyd's k-means over the embedding column. Per iteration: ONE
    * narrow map-side assignment (argmax over the centroid literal — no
    * join, no shuffle) and one groupBy-mean whose shuffle carries only
    * k·dim partial sums (sum/count partial-aggregate map-side). The
    * centroids live on the driver between iterations (k·dim doubles),
    * so lineage does NOT grow with the iteration count — every
    * iteration's plan starts from the persisted corpus, no checkpoint
    * needed. Deterministic: `init = "lowid"` seeds with the k lowest-id
    * vectors; `init = "farthest"` uses [[farthestFirstCentroids]]
    * (also deterministic); ties in assignment go to the lowest
    * centroid id. Returns (cid, cv).
    */
  def fitCentroidsKMeans(corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, iterations: Int, init: String = "lowid"): DataFrame = {
    val idType = corpus.schema(idCol).dataType
    val e = asDouble(corpus, idCol, vecCol).persist(StorageLevel.MEMORY_AND_DISK)
    try {
      var cents: Array[(Any, Array[Double])] = init match {
        case "farthest" =>
          collectCentroids(farthestFirstCentroids(corpus, idCol, vecCol, k),
            "cid", "cv")
        case _ =>
          e.orderBy(col("__id")).limit(k).collect()
            .map(r => (r.get(0), r.getSeq[Double](1).toArray))
      }
      var i = 0
      while (i < iterations) {
        val assigned = e.select(col("v"),
          argmaxCell(col("v"), centroidLit(cents, idType), idType).as("cid"))
        // mean per cell: explode to (cid, dimension, value) so sum/count
        // partial-aggregate map-side — each partition ships only k·dim
        // partial sums into the shuffle — then reassemble the k vectors
        cents = assigned
          .select(col("cid"), posexplode(col("v")).as(Seq("pos", "x")))
          .groupBy(col("cid"), col("pos"))
          .agg(sum(col("x")).as("s"), count(lit(1)).as("n"))
          .groupBy(col("cid"))
          .agg(transform(
            sort_array(collect_list(struct(col("pos"), (col("s") / col("n")).as("m")))),
            p => p.getField("m")).as("cv"))
          .orderBy(col("cid"))
          .collect()
          .map(r => (r.get(0), r.getSeq[Double](1).toArray))
        i += 1
      }
      centroidsToDf(corpus, cents, idType)
    } finally e.unpersist()
  }

  /** Multi-probe assignment: every vector lands in its `nprobe`
    * nearest cells (map-side over the centroid literal, one exploded
    * row per probe). The candidate-generation primitive for
    * cell-bucketed NEAR-DUP joins: two vectors are candidates iff they
    * share a probed cell, so recall grows with nprobe at O(nprobe·N)
    * space — never all-pairs. Output: (__id, v, cell).
    */
  def multiProbeAssign(corpus: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String, nprobe: Int): DataFrame = {
    val idType = centroids.schema(idCol).dataType
    val cents = centroidLit(collectCentroids(centroids, idCol, vecCol), idType)
    val probeOrder = transform(
      array_sort(transform(cents, c => struct(
        (-Sketches.cosineSim(col("v"), c.getField("cv"))).as("ncs"),
        c.getField("cid").as("cid")))),
      s => s.getField("cid"))
    asDouble(corpus, idCol, vecCol)
      .select(col("__id"), col("v"),
        explode(slice(probeOrder, 1, nprobe)).as("cell"))
  }

  /** IVF top-k: probe only the query's own cell (nprobe = 1). Output:
    * (query_id, rank, neighbor_id), rank 1..k by cos desc within cell.
    */
  def ivfTopK(corpus: DataFrame, centroids: DataFrame, queryFilter: Column,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val assigned = assignCells(corpus, centroids, idCol, vecCol)
    val q = assigned.filter(queryFilter)
      .select(col("__id").as("qid"), col("v").as("qv"), col("cell"))
    val scored = assigned.join(q, Seq("cell"))
      .filter(col("__id") =!= col("qid"))
      .select(col("qid"), col("__id").as("nid"),
        Sketches.cosineSim(col("qv"), col("v")).as("cos"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid").as("query_id"), col("rank"), col("nid").as("neighbor_id"))
  }

  /** IVF top-k with multi-cell probing: each query scans its `nprobe`
    * nearest cells (the recall/latency knob). With nprobe = |centroids|
    * this degenerates to exact brute force — the invariant the tests
    * pin. Probe-cell selection is map-side too: sort the per-query
    * cosine scores against the centroid literal and explode the top
    * nprobe cids — no crossJoin, no window over a shuffle.
    * Output: (query_id, rank, neighbor_id).
    */
  def ivfTopKProbed(corpus: DataFrame, centroids: DataFrame,
      queryFilter: Column, idCol: String, vecCol: String,
      k: Int, nprobe: Int): DataFrame = {
    val idType = centroids.schema(idCol).dataType
    val cents = centroidLit(collectCentroids(centroids, idCol, vecCol), idType)
    val assigned = assignCells(corpus, centroids, idCol, vecCol)
    // cid list sorted by (cos desc, cid asc): negate cos so the
    // lexicographic struct sort gives the probe order
    val probeOrder = transform(
      array_sort(transform(cents, c => struct(
        (-Sketches.cosineSim(col("qv"), c.getField("cv"))).as("ncs"),
        c.getField("cid").as("cid")))),
      s => s.getField("cid"))
    val probeCells = assigned.filter(queryFilter)
      .select(col("__id").as("qid"), col("v").as("qv"))
      .select(col("qid"), col("qv"),
        explode(slice(probeOrder, 1, nprobe)).as("cell"))
    val scored = probeCells.join(assigned, Seq("cell"))
      .filter(col("__id") =!= col("qid"))
      .select(col("qid"), col("__id").as("nid"),
        Sketches.cosineSim(col("qv"), col("v")).as("cos"))
      .dropDuplicates("qid", "nid")
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid").as("query_id"), col("rank"), col("nid").as("neighbor_id"))
  }

  /** Product quantization (Jégou/Douze/Schmid, TPAMI 2011 — the FAISS
    * IVFPQ storage path): split each d-dim vector into `m` contiguous
    * subvectors and quantize each against its OWN small codebook
    * (argmin L2, ties to the lowest code id), so a vector stores m
    * small code ids instead of d floats — at m=4 codebooks of 16 codes
    * over 64 float32 dims that is 4 x 4 bits vs 256 bytes, the
    * compression that makes a 100 TB embedding store greppable. Like
    * [[assignCells]], codebooks are small by contract: collected once,
    * folded into per-subspace literals, and the encode is ONE narrow
    * map stage — no exchange anywhere. (The per-row HOF fold is
    * interpreted; at catalog codebook sizes that is m*|codes| fused
    * multiply-adds per row, the same cost class as one centroid
    * assignment. A trained-at-scale path would fuse this into a
    * codegen'd kernel like CosineSimilarity.)
    *
    * `codebook` rows are FULL d-dim vectors (e.g. a trained or sampled
    * subset of the corpus); subspace j's codes are their j-th slices —
    * the fixed-codebook formulation that keeps encode deterministic
    * and oracle-expressible.
    *
    * Output: (id, pq_codes "c0-c1-…-c(m-1)" joined on '-', recon_mae =
    * round(mean |v_i - code_i|, 6)) — the reconstruction error column
    * is the quality gauge a user tunes m / codebook size against.
    */
  def pqEncode(corpus: DataFrame, codebook: DataFrame, idCol: String,
      vecCol: String, m: Int): DataFrame = {
    val cents = collectCentroids(codebook, idCol, vecCol)
    val d = cents.head._2.length
    require(m > 0 && d % m == 0, s"m=$m must divide dim=$d")
    require(cents.forall(_._2.length == d), "codebook dims must agree")
    val sd = d / m
    // per-subspace literal array<struct<cid, cv>> (cid-ascending:
    // collectCentroids orders by id, so first-min wins ties)
    def codesLit(j: Int): Column = array(cents.map { case (cid, cv) =>
      struct(lit(cid).cast("long").as("cid"),
        array(cv.slice(j * sd, (j + 1) * sd).map(lit).toIndexedSeq: _*).as("cv"))
    }.toIndexedSeq: _*)
    // argmin-L2 over the literal, carrying the winning code vector so
    // the reconstruction-error term reuses it without a second argmin
    def best(j: Int): Column = {
      val sub = slice(col("v"), j * sd + 1, sd)
      aggregate(codesLit(j),
        struct(lit(Double.MaxValue).as("d2"), lit(-1L).as("cid"),
          array((0 until sd).map(_ => lit(0.0)): _*).as("cv")),
        (acc, c) => {
          val d2 = aggregate(zip_with(sub, c.getField("cv"),
            (a, b) => (a - b) * (a - b)), lit(0.0), (s, x) => s + x)
          when(d2 < acc.getField("d2"),
            struct(d2.as("d2"), c.getField("cid").as("cid"),
              c.getField("cv").as("cv"))).otherwise(acc)
        })
    }
    val withBest = asDouble(corpus, idCol, vecCol)
      .select(col("__id"), col("v"),
        array((0 until m).map(j => best(j)): _*).as("__b"))
    val codeStr = concat_ws("-",
      transform(col("__b"), b => b.getField("cid").cast("string")))
    val absErrSum = aggregate(col("__b"),
      struct(lit(0.0).as("s"), lit(0).as("j")),
      (acc, b) => struct(
        (acc.getField("s") + aggregate(
          zip_with(slice(col("v"), acc.getField("j") * sd + 1, lit(sd)),
            b.getField("cv"), (a, c) => abs(a - c)),
          lit(0.0), (s, x) => s + x)).as("s"),
        (acc.getField("j") + 1).as("j"))).getField("s")
    withBest.select(col("__id").as(idCol), codeStr.as("pq_codes"),
      round(absErrSum / d, 6).as("recon_mae"))
  }

  /** Reconstruct [[pqEncode]]'d vectors: each of the m codes looks its
    * subvector up in a per-subspace map LITERAL (code id → code
    * vector) and the slices concatenate — one narrow map, no join, no
    * exchange (the codebook ships inside the plan exactly as in
    * [[pqEncode]]). The decode is what an ADC-style search scores
    * against: `bruteForceTopK(pqDecode(...), queries, ...)` is
    * PQ-compressed retrieval, and its recall vs exact is the metric a
    * user tunes m / codebook size against (`sim_pq_recall`).
    *
    * Output: (idCol, vecCol array<double>).
    */
  def pqDecode(encoded: DataFrame, codebook: DataFrame, idCol: String,
      vecCol: String, m: Int): DataFrame = {
    val cents = collectCentroids(codebook, idCol, vecCol)
    val d = cents.head._2.length
    require(m > 0 && d % m == 0, s"m=$m must divide dim=$d")
    val sd = d / m
    val maps = array((0 until m).map { j =>
      map_from_arrays(
        array(cents.map(c => lit(c._1).cast("long")).toIndexedSeq: _*),
        array(cents.map(c => array(c._2.slice(j * sd, (j + 1) * sd)
          .map(lit).toIndexedSeq: _*)).toIndexedSeq: _*))
    }: _*)
    encoded.select(col(idCol),
      flatten(zip_with(
        transform(split(col("pq_codes"), "-"), x => x.cast("long")),
        maps, (c, mp) => element_at(mp, c))).as(vecCol))
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009): merge
    * several ranked candidate lists — lexical BM25, embedding cosine,
    * recency, anything that emits (id, rank) — into one consensus
    * ranking by `rrf(d) = Σ_lists 1/(c + rank_list(d))`. The standard
    * hybrid-retrieval combiner: no score calibration across
    * heterogeneous scorers, only ranks, and `c` (=60 in the paper)
    * damps the head so one list's #1 can't dominate alone.
    *
    * Determinism: each list contributes at most one term per id (ranks
    * are per-list unique), IEEE addition is commutative so the ≤
    * |lists|-term sum is order-exact for 2 lists and round(,6)-stable
    * beyond; the output order ties break on id. Scale shape: inputs
    * are already top-k-bounded lists, so the union/groupBy is k·|lists|
    * rows — driver-free, broadcast-free, and the final top-k is
    * TakeOrderedAndProject.
    *
    * @param rankings each with (`idCol`, `rankCol`), rank 1-based
    * @return (`idCol`, rrf, n_lists) — top `k` by fused score
    */
  def rrfFuse(rankings: Seq[DataFrame], idCol: String, rankCol: String,
      k: Int, c: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    require(k > 0, s"k must be positive: $k")
    require(c >= 0, s"c must be non-negative: $c")
    val unioned = rankings
      .map(_.select(col(idCol), col(rankCol).cast("long").as("__r")))
      .reduce(_ unionByName _)
    unioned.groupBy(col(idCol))
      .agg(round(sum(lit(1.0) / (lit(c.toDouble) + col("__r"))), 6).as("rrf"),
        count(lit(1)).as("n_lists"))
      .orderBy(col("rrf").desc, col(idCol))
      .limit(k)
  }
}
