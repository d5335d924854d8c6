package graft.operators

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("bruteForceTopK: ranks are 1..k, self excluded, cos within [-1,1]") {
    val emb = Tables.embeddings(spark, sf())
    val got = Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 3),
      "vec_id", "embedding", k = 4)
    val rows = got.collect()
    assert(rows.length == 12)
    assert(rows.forall(r => r.getLong(2) != r.getLong(0)))
    assert(rows.forall(r => math.abs(r.getDouble(3)) <= 1.0 + 1e-12))
    // top-1 cos >= top-k cos per query
    val byQ = rows.groupBy(_.getLong(0))
    byQ.values.foreach { rs =>
      val sorted = rs.sortBy(_.getInt(1))
      assert(sorted.sliding(2).forall(p => p.head.getDouble(3) >= p.last.getDouble(3)))
    }
  }

  test("truncateRenorm: unit norm, prefix values, zero-vector passthrough") {
    val df = Seq(
      (1L, Seq(3.0f, 4.0f, 100.0f, 100.0f)),
      (2L, Seq(0.0f, 0.0f, 5.0f, 5.0f))) // zero prefix
      .toDF("vec_id", "embedding")
    val out = Similarity.truncateRenorm(df, "vec_id", "embedding", d = 2)
      .orderBy($"vec_id").as[(Long, Seq[Double])].collect()
    assert(out(0)._2 == Seq(0.6, 0.8)) // (3,4)/5
    assert(out(1)._2 == Seq(0.0, 0.0)) // no 0/0 NaN
    // cosine ranking is invariant under the renorm: truncation alone
    // and truncate+renorm rank identically
    val emb = Tables.embeddings(spark, sf())
    val plain = emb.select($"vec_id",
      transform(slice($"embedding", 1, 16), x => x.cast("double")).as("embedding"))
    val renormed = Similarity.truncateRenorm(emb, "vec_id", "embedding", 16)
    def ranks(c: org.apache.spark.sql.DataFrame) =
      Similarity.bruteForceTopK(c, c.filter($"vec_id" < 5), "vec_id", "embedding", 5)
        .select($"query_id", $"rank", $"neighbor_id")
        .as[(Long, Int, Long)].collect().toSet
    assert(ranks(renormed) == ranks(plain))
  }

  test("assignCells: every vector gets exactly one cell from the centroid set") {
    val emb = Tables.embeddings(spark, sf())
    val cells = Similarity.assignCells(emb, emb.filter(col("vec_id") < 8),
      "vec_id", "embedding")
    assert(cells.count() == emb.count())
    val cellIds = cells.select("cell").distinct().as[Long].collect().toSet
    assert(cellIds.subsetOf((0L until 8L).toSet))
    // a centroid's own nearest centroid is itself (cos = 1)
    val own = cells.filter(col("__id") < 8)
      .select("__id", "cell").as[(Long, Long)].collect()
    assert(own.forall(p => p._1 == p._2))
  }

  test("fitCentroidsKMeans: deterministic, improves mean assignment similarity") {
    val emb = Tables.embeddings(spark, sf())
    def meanBestSim(cents: org.apache.spark.sql.DataFrame): Double = {
      val e = emb.select(col("vec_id").as("__id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      e.crossJoin(broadcast(cents))
        .groupBy(col("__id"))
        .agg(max(graft.functions.Sketches.cosineSim(col("v"), col("cv"))).as("best"))
        .agg(avg(col("best"))).head().getDouble(0)
    }
    val init = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"),
        transform(col("embedding"), x => x.cast("double")).as("cv"))
    val fitted = Similarity.fitCentroidsKMeans(emb, "vec_id", "embedding",
      k = 8, iterations = 3)
    assert(fitted.count() <= 8 && fitted.count() > 0)
    // Lloyd iterations should improve (or match) the k-means objective
    assert(meanBestSim(fitted) >= meanBestSim(init) - 1e-9)
    // deterministic across runs
    val again = Similarity.fitCentroidsKMeans(emb, "vec_id", "embedding",
      k = 8, iterations = 3)
    val a = fitted.orderBy("cid").collect().map(_.toString)
    val b = again.orderBy("cid").collect().map(_.toString)
    assert(a.toSeq == b.toSeq)
  }

  test("farthest-first init: deterministic, k distinct centroids, Lloyd improves it") {
    val emb = Tables.embeddings(spark, sf())
    val init = Similarity.farthestFirstCentroids(emb, "vec_id", "embedding", k = 8)
    val ids = init.select("cid").as[Long].collect()
    assert(ids.length == 8 && ids.distinct.length == 8)
    assert(ids.head == 0L) // seeds from the lowest id
    val again = Similarity.farthestFirstCentroids(emb, "vec_id", "embedding", k = 8)
    assert(init.orderBy("cid").collect().map(_.toString).toSeq ==
      again.orderBy("cid").collect().map(_.toString).toSeq)
    def meanBestSim(cents: org.apache.spark.sql.DataFrame): Double = {
      val e = emb.select(col("vec_id").as("__id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      e.crossJoin(broadcast(cents))
        .groupBy(col("__id"))
        .agg(max(graft.functions.Sketches.cosineSim(col("v"), col("cv"))).as("best"))
        .agg(avg(col("best"))).head().getDouble(0)
    }
    val fitted = Similarity.fitCentroidsKMeans(emb, "vec_id", "embedding",
      k = 8, iterations = 3, init = "farthest")
    assert(meanBestSim(fitted) >= meanBestSim(init) - 1e-9)
  }

  test("assignCells plans with NO exchange (map-side argmax over centroid literal)") {
    val emb = Tables.embeddings(spark, sf())
    val cells = Similarity.assignCells(emb, emb.filter(col("vec_id") < 8),
      "vec_id", "embedding")
    val plan = cells.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"assignment shuffles:\n$plan")
    // and the probe side of IVF only exchanges for the join itself —
    // no pre-join shuffle of the assignment
    val ivfPlan = Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 8),
      col("__id") < 5, "vec_id", "embedding", k = 3)
      .queryExecution.executedPlan.toString
    assert(!ivfPlan.contains("Exchange rangepartitioning"), ivfPlan)
  }

  test("clusterCappedSelect: hand-built clusters, cap honored, central-first") {
    // two orthogonal centroids; points at known angles to each
    val cents = Seq((0L, Seq(1f, 0f)), (1L, Seq(0f, 1f))).toDF("vec_id", "embedding")
    val corpus = Seq(
      (10L, Seq(1f, 0f)),      // c0, cos 1.0
      (11L, Seq(4f, 1f)),      // c0, cos ~0.970
      (12L, Seq(2f, 1f)),      // c0, cos ~0.894
      (13L, Seq(0f, 2f)),      // c1, cos 1.0
      (14L, Seq(1f, 3f))       // c1, cos ~0.949
    ).toDF("vec_id", "embedding")
    val got = Similarity.clusterCappedSelect(corpus, cents,
        "vec_id", "embedding", cap = 2)
      .orderBy($"cluster", $"rk")
      .as[(Long, Long, Int, Double)].collect().toSeq
    // cluster 0 keeps 10 (rank 1) and 11; 12 falls to the cap;
    // cluster 1 keeps both its members
    assert(got.map(r => (r._2, r._3, r._1)) ==
      Seq((0L, 1, 10L), (0L, 2, 11L), (1L, 1, 13L), (1L, 2, 14L)))
    assert(got.head._4 == 1.0)
  }

  test("clusterCappedSelect: assignment ties go to the lowest centroid id") {
    val cents = Seq((0L, Seq(1f, 0f)), (1L, Seq(1f, 0f))).toDF("vec_id", "embedding")
    val corpus = Seq((10L, Seq(2f, 0f))).toDF("vec_id", "embedding")
    val got = Similarity.clusterCappedSelect(corpus, cents,
      "vec_id", "embedding", cap = 5).as[(Long, Long, Int, Double)].head()
    assert(got._2 == 0L)
  }

  test("ivfTopKProbed with nprobe = |centroids| equals brute force") {
    val emb = Tables.embeddings(spark, sf())
    val cents = emb.filter(col("vec_id") < 8)
    val probedAll = Similarity.ivfTopKProbed(emb, cents, col("__id") < 5,
      "vec_id", "embedding", k = 3, nprobe = 8)
      .select("query_id", "rank", "neighbor_id")
      .as[(Long, Int, Long)].collect().toSet
    val brute = Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 5),
      "vec_id", "embedding", k = 3)
      .select("query_id", "rank", "neighbor_id")
      .as[(Long, Int, Long)].collect().toSet
    assert(probedAll == brute)
    // and nprobe=1 recall ≤ nprobe=2 recall (both subsets of candidates)
    val p1 = Similarity.ivfTopKProbed(emb, cents, col("__id") < 5,
      "vec_id", "embedding", k = 3, nprobe = 1).count()
    val p2 = Similarity.ivfTopKProbed(emb, cents, col("__id") < 5,
      "vec_id", "embedding", k = 3, nprobe = 2).count()
    assert(p1 <= p2)
  }

  test("ivfTopK: IVF neighbors are a subset of the query's cell") {
    val emb = Tables.embeddings(spark, sf())
    val cents = emb.filter(col("vec_id") < 8)
    val assigned = Similarity.assignCells(emb, cents, "vec_id", "embedding")
      .select("__id", "cell").as[(Long, Long)].collect().toMap
    val got = Similarity.ivfTopK(emb, cents, col("__id") < 5,
      "vec_id", "embedding", k = 3).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(assigned(r.getLong(2)) == assigned(r.getLong(0)))
    }
  }

  test("pqEncode: hand-computed codes, argmin tie to the lowest code id") {
    val cb = Seq((0L, Seq(0.0, 0.0, 10.0, 0.0)),
      (1L, Seq(1.0, 1.0, 9.0, 1.0))).toDF("vec_id", "embedding")
    // sub0 (0.9,1.1): d2 -> c0 2.02, c1 0.02 => 1
    // sub1 (9.5,0.5): d2 -> c0 0.5,  c1 0.5  => tie, lowest cid 0
    val v = Seq((7L, Seq(0.9, 1.1, 9.5, 0.5))).toDF("vec_id", "embedding")
    val got = Similarity.pqEncode(v, cb, "vec_id", "embedding", m = 2).head()
    assert(got.getString(1) == "1-0")
    assert(got.getDouble(2) == 0.3) // (0.1+0.1 + 0.5+0.5)/4
  }

  test("pqEncode: a codebook member reconstructs exactly; deterministic under repartition") {
    val cb = Seq((0L, Seq(0.0, 0.0, 10.0, 0.0)),
      (1L, Seq(1.0, 1.0, 9.0, 1.0))).toDF("vec_id", "embedding")
    val exact = Similarity.pqEncode(cb, cb, "vec_id", "embedding", m = 2)
      .orderBy("vec_id").collect()
    assert(exact.map(_.getString(1)).toSeq == Seq("0-0", "1-1"))
    assert(exact.forall(_.getDouble(2) == 0.0))
    val emb = Tables.embeddings(spark, sf())
    val a = Similarity.pqEncode(emb, emb.filter(col("vec_id") < 16),
      "vec_id", "embedding", m = 4).orderBy("vec_id").collect().toSeq
    val b = Similarity.pqEncode(emb.repartition(7),
      emb.filter(col("vec_id") < 16), "vec_id", "embedding", m = 4)
      .orderBy("vec_id").collect().toSeq
    assert(a == b)
    assert(a.forall(r => r.getString(1).split("-").forall(c =>
      c.toLong >= 0L && c.toLong < 16L)))
  }

  test("pqDecode: inverts pqEncode on codebook members; toy reconstruction") {
    val cb = Seq((0L, Seq(0.0, 0.0, 10.0, 0.0)),
      (1L, Seq(1.0, 1.0, 9.0, 1.0))).toDF("vec_id", "embedding")
    val roundTrip = Similarity.pqDecode(
        Similarity.pqEncode(cb, cb, "vec_id", "embedding", m = 2),
        cb, "vec_id", "embedding", m = 2)
      .orderBy("vec_id").as[(Long, Seq[Double])].collect().toSeq
    assert(roundTrip == Seq((0L, Seq(0.0, 0.0, 10.0, 0.0)),
      (1L, Seq(1.0, 1.0, 9.0, 1.0))))
    // codes "1-0" reconstruct as c1's first half ++ c0's second half
    val v = Seq((7L, Seq(0.9, 1.1, 9.5, 0.5))).toDF("vec_id", "embedding")
    val got = Similarity.pqDecode(
        Similarity.pqEncode(v, cb, "vec_id", "embedding", m = 2),
        cb, "vec_id", "embedding", m = 2)
      .as[(Long, Seq[Double])].head()
    assert(got == ((7L, Seq(1.0, 1.0, 10.0, 0.0))))
  }

  test("pqEncode: m must divide the dimension") {
    val cb = Seq((0L, Seq(0.0, 0.0, 10.0, 0.0))).toDF("vec_id", "embedding")
    intercept[IllegalArgumentException] {
      Similarity.pqEncode(cb, cb, "vec_id", "embedding", m = 3)
    }
  }

  test("rrfFuse: hand-computed fusion, n_lists, id tie-break, top-k cut") {
    val a = Seq((1L, 1), (2L, 2), (3L, 3)).toDF("id", "rank")
    val b = Seq((2L, 1), (4L, 2)).toDF("id", "rank")
    val got = Similarity.rrfFuse(Seq(a, b), "id", "rank", k = 3, c = 60)
      .as[(Long, Double, Long)].collect().toSeq
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    // 2: 1/62 + 1/61 = .032513; 1: 1/61 = .016393; 4: 1/62 = .016129
    assert(got == Seq(
      (2L, r6(1.0 / 62 + 1.0 / 61), 2L),
      (1L, r6(1.0 / 61), 1L),
      (4L, r6(1.0 / 62), 1L)))
    // equal rrf ties break on id: two singletons at the same rank
    val c1 = Seq((9L, 5)).toDF("id", "rank")
    val c2 = Seq((3L, 5)).toDF("id", "rank")
    val tied = Similarity.rrfFuse(Seq(c1, c2), "id", "rank", k = 2)
      .select("id").as[Long].collect().toSeq
    assert(tied == Seq(3L, 9L))
  }
}
