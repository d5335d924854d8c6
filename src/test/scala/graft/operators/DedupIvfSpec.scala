package graft.operators

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

class DedupIvfSpec extends SparkSpec {
  import spark.implicits._

  test("block-evaluated embeddingNearDupPairs == the naive join form " +
      "(pairs AND bit-identical cos), across block counts; null / " +
      "mismatched-dim / zero-vector edge contract preserved") {
    val emb = Tables.embeddings(spark, sf())
    // the pre-r19 naive reference, inline: self-join + cosine filter
    def naive(df: org.apache.spark.sql.DataFrame, t: Double) = {
      val e = df.select(col("vec_id").as("__id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      e.as("a").join(e.as("b"), col("a.__id") < col("b.__id"))
        .select(col("a.__id").as("id_a"), col("b.__id").as("id_b"),
          graft.functions.Sketches.cosineSim(col("a.v"), col("b.v")).as("cos"))
        .filter(col("cos") >= t)
        .as[(Long, Long, Double)].collect()
        .map(r => ((r._1, r._2), r._3)).toMap
    }
    val want = naive(emb, 0.45)
    for (blocks <- Seq(1, 7, 64)) {
      val got = Dedup.embeddingNearDupPairs(emb, "vec_id", "embedding",
          0.45, numBlocks = blocks)
        .as[(Long, Long, Double)].collect()
        .map(r => ((r._1, r._2), r._3)).toMap
      assert(got.keySet == want.keySet, s"blocks=$blocks: " +
        s"missing=${want.keySet -- got.keySet} extra=${got.keySet -- want.keySet}")
      got.foreach { case (k, c) =>
        assert(c == want(k), s"blocks=$blocks cos not bit-identical at $k") }
    }
    // edge contract: null vector and mismatched dims drop their pairs,
    // zero vectors score cos = 0 (kept iff threshold <= 0)
    val weird = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(1.0f, 0.0f)),
      (3L, Seq(0.0f, 0.0f)),                     // zero vector
      (5L, Seq(1.0f, 0.0f, 0.0f)))               // mismatched dim
      .toDF("vec_id", "embedding")
      .unionByName(Seq((4L, Option.empty[Seq[Float]]))
        .toDF("vec_id", "embedding"))             // null vector
    val gotW = Dedup.embeddingNearDupPairs(weird, "vec_id", "embedding",
        -1.0, numBlocks = 3)
      .as[(Long, Long, Double)].collect()
      .map(r => ((r._1, r._2), r._3)).toMap
    val wantW = naive(weird, -1.0)
    assert(gotW.keySet == wantW.keySet,
      s"missing=${wantW.keySet -- gotW.keySet} extra=${gotW.keySet -- wantW.keySet}")
    assert(gotW((1L, 3L)) == 0.0 && gotW((1L, 2L)) == 1.0)
    assert(!gotW.keySet.exists(p => p._1 == 4L || p._2 == 4L ||
      p._1 == 5L || p._2 == 5L))
  }

  test("IVF-bucketed embedding near-dup matches brute force on testdata") {
    val emb = Tables.embeddings(spark, sf())
    val brute = Dedup.embeddingNearDupPairs(emb, "vec_id", "embedding", 0.45)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val ivf = Dedup.embeddingNearDupPairsIvf(emb, "vec_id", "embedding", 0.45,
      numCells = 8, nprobe = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(ivf == brute, s"missing=${brute -- ivf} extra=${ivf -- brute}")
    assert(brute.nonEmpty)
  }

  test("candidate space is sub-quadratic (pairs sharing a probed cell)") {
    val emb = Tables.embeddings(spark, sf())
    val n = emb.count()
    val probed = Similarity.multiProbeAssign(
      emb.select(col("vec_id"), col("embedding")),
      Similarity.farthestFirstCentroids(emb, "vec_id", "embedding", 8)
        .select(col("cid").as("vec_id"), col("cv").as("embedding")),
      "vec_id", "embedding", nprobe = 2)
    val cand = probed.as("a").join(probed.as("b"),
        col("a.cell") === col("b.cell") && col("a.__id") < col("b.__id"))
      .select("a.__id", "b.__id").distinct().count()
    assert(cand < n * (n - 1) / 2, s"cand=$cand n=$n")
  }
  test("sign-LSH near-dup: planted collinear pairs found, equals brute force") {
    val emb = Tables.embeddings(spark, sf()).select(col("vec_id"), col("embedding"))
    val planted = emb.unionByName(
      emb.filter(col("vec_id") < 20)
        .select((col("vec_id") + 100000).as("vec_id"),
          transform(col("embedding"), x => x * lit(2.0f)).as("embedding")))
    val brute = Dedup.embeddingNearDupPairs(planted, "vec_id", "embedding", 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = Dedup.embeddingNearDupPairsSignLsh(planted, "vec_id", "embedding", 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(brute.size == 20) // exactly the planted collinear pairs
    assert(lsh == brute)
  }

  test("wide sign sketch: word 0 equals the 64-bit sketch; wide-bucket config keeps recall") {
    // widening is the SCALE knob (more buckets per band at held recall
    // radius) — word 0 must be bit-identical to SignSketch64 so a
    // widened sketch never loses bits a narrow consumer banded on
    val vecs = Seq(
      (Seq(1.0f, 2.0f, 3.0f), 0), (Seq(-5.0f, 1.0f, -9.0f), 1),
      (Seq(0.25f, -4.0f, 7.5f), 2))
      .toDF("v", "i")
    val rows = vecs.select(
        graft.functions.Sketches.signSketch(col("v")).as("f64"),
        graft.functions.Sketches.signSketchWide(col("v"), 2).as("fw"), col("i"))
      .orderBy("i").as[(Long, Seq[Long], Int)].collect()
    rows.foreach { case (f64, fw, _) =>
      assert(fw.length == 2 && fw.head == f64)
    }
    // the 100×-scale config (words=2, chunkBits=16 → 8 bands × 65536
    // buckets) still finds every planted collinear pair = brute force
    val emb = Tables.embeddings(spark, sf()).select(col("vec_id"), col("embedding"))
    val planted = emb.unionByName(
      emb.filter(col("vec_id") < 20)
        .select((col("vec_id") + 100000).as("vec_id"),
          transform(col("embedding"), x => x * lit(2.0f)).as("embedding")))
    val brute = Dedup.embeddingNearDupPairs(planted, "vec_id", "embedding", 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val wide = Dedup.embeddingNearDupPairsSignLsh(planted, "vec_id", "embedding",
        0.9, chunkBits = 16, sketchWords = 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(brute.size == 20 && wide == brute,
      s"missing=${brute -- wide} extra=${wide -- brute}")
  }

  test("sign sketch: scale-invariant, deterministic, discriminates direction") {
    val got = Seq(
      (Seq(1.0f, 2.0f, 3.0f), 0),
      (Seq(2.0f, 4.0f, 6.0f), 1), // x2 scale, same direction
      (Seq(-5.0f, 1.0f, -9.0f), 2)
    ).toDF("v", "i").select(graft.functions.Sketches.signSketch(col("v")).as("f"), col("i"))
      .orderBy("i").as[(Long, Int)].collect().map(_._1)
    assert(got(0) == got(1)) // collinear -> identical sketch
    assert(got(0) != got(2))
  }
}
