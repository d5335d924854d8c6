package graft.operators

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

class DedupIvfSpec extends SparkSpec {
  import spark.implicits._

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
}
