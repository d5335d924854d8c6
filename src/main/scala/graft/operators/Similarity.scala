package graft.operators

import graft.functions.Sketches
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

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
  *     their nearest centroid once (broadcast cross-join + argmax — a
  *     single narrow pass), and a query only scores candidates in its
  *     own cell (nprobe=1 here; probing more cells is a union of cells).
  *     Cost O(N·C) assignment + O(|Q|·N/C) probe. Centroid choice is
  *     pluggable; harness queries use a deterministic subset so the
  *     result is oracle-checkable (k-means would converge better but
  *     needs iterative fitting).
  */
object Similarity {

  private def asDouble(df: DataFrame, idCol: String, vecCol: String) =
    df.select(col(idCol).as("__id"),
      transform(col(vecCol), x => x.cast("double")).as("v"))

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

  /** Assign every vector to its nearest centroid (max cosine, ties to
    * the lowest centroid id). Output: (__id, v, cell).
    */
  def assignCells(corpus: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String): DataFrame = {
    val e = asDouble(corpus, idCol, vecCol)
    val c = asDouble(centroids, idCol, vecCol)
      .select(col("__id").as("cid"), col("v").as("cv"))
    e.crossJoin(broadcast(c))
      .groupBy(col("__id"), col("v"))
      .agg(max(struct(
        Sketches.cosineSim(col("v"), col("cv")).as("cs"),
        (-col("cid")).as("ncid"))).as("best"))
      .select(col("__id"), col("v"), (-col("best.ncid")).as("cell"))
  }

  /** Lloyd's k-means over the embedding column, expressed entirely as
    * DataFrame ops so it scales like any other aggregation: per
    * iteration one broadcast cross-join assignment (O(N·k) narrow) and
    * one groupBy-mean (single shuffle of k·dim partial sums via partial
    * aggregation). Deterministic: initial centroids are the k
    * lowest-id vectors; ties in assignment go to the lowest centroid id.
    * Returns (cid, cv) — feed to [[ivfTopK]] via a rename, or use
    * [[assignCells]] with any corpus.
    */
  def fitCentroidsKMeans(corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, iterations: Int): DataFrame = {
    val e = asDouble(corpus, idCol, vecCol)
    var centroids = e.orderBy(col("__id")).limit(k)
      .select(col("__id").as("cid"), col("v").as("cv"))
    var i = 0
    while (i < iterations) {
      val assigned = e.crossJoin(broadcast(centroids))
        .groupBy(col("__id"), col("v"))
        .agg(max(struct(
          Sketches.cosineSim(col("v"), col("cv")).as("cs"),
          (-col("cid")).as("ncid"))).as("best"))
        .select(col("v"), (-col("best.ncid")).as("cid"))
      // mean per cell: explode to (cid, dimension, value) so sum/count
      // partial-aggregate map-side — each partition ships only k·dim
      // partial sums into the shuffle — then reassemble the k vectors
      centroids = assigned
        .select(col("cid"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy(col("cid"), col("pos"))
        .agg(sum(col("x")).as("s"), count(lit(1)).as("n"))
        .groupBy(col("cid"))
        .agg(transform(
          sort_array(collect_list(struct(col("pos"), (col("s") / col("n")).as("m")))),
          p => p.getField("m")).as("cv"))
      i += 1
    }
    centroids
  }

  /** IVF top-k: probe only the query's own cell (nprobe = 1). Output:
    * (query_id, rank, neighbor_id), rank 1..k by cos desc within cell.
    */
  def ivfTopK(corpus: DataFrame, centroids: DataFrame, queryFilter: org.apache.spark.sql.Column,
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
    * pin. Output: (query_id, rank, neighbor_id).
    */
  def ivfTopKProbed(corpus: DataFrame, centroids: DataFrame,
      queryFilter: org.apache.spark.sql.Column, idCol: String, vecCol: String,
      k: Int, nprobe: Int): DataFrame = {
    val assigned = assignCells(corpus, centroids, idCol, vecCol)
    val c = asDouble(centroids, idCol, vecCol)
      .select(col("__id").as("cid"), col("v").as("cv"))
    val q = assigned.filter(queryFilter)
      .select(col("__id").as("qid"), col("v").as("qv"))
    val wc = Window.partitionBy(col("qid"))
      .orderBy(Sketches.cosineSim(col("qv"), col("cv")).desc, col("cid"))
    val probeCells = q.crossJoin(broadcast(c))
      .withColumn("crank", row_number().over(wc))
      .filter(col("crank") <= nprobe)
      .select(col("qid"), col("qv"), col("cid").as("cell"))
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
}
