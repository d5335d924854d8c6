package graft.tools

import org.apache.spark.sql.SparkSession

/** Parameter-sweep timer for the sign-LSH embedding dedup — the knob
  * QueryTime can't reach (catalog queries pin their oracle-checked
  * defaults). Prints rows + seconds per (chunkBits, sketchWords)
  * config so the BASELINE scale table records measured, not argued,
  * numbers.
  *
  * usage: ScaleProbe <sfDir> <threshold> <chunkBits> <sketchWords> [reps] [plant]
  * `plant` > 0 adds that many collinear (×2) copies of the lowest ids
  * — deterministic near-dups for the high-threshold regime, like the
  * dedup_embedding_lsh catalog fixture.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4,
      "usage: ScaleProbe <sfDir> <threshold> <chunkBits> <sketchWords> [reps] [plant]")
    val (dir, threshold) = (args(0), args(1).toDouble)
    val (chunkBits, words) = (args(2).toInt, args(3).toInt)
    val reps = if (args.length > 4) args(4).toInt else 2
    val plant = if (args.length > 5) args(5).toInt else 0
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    val raw = graft.sources.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
    val emb = if (plant <= 0) raw else raw.unionByName(
      raw.orderBy("vec_id").limit(plant)
        .select((col("vec_id") + 1000000000L).as("vec_id"),
          transform(col("embedding"), x => x * lit(2.0f)).as("embedding")))
    (1 to reps).foreach { r =>
      val t0 = System.nanoTime()
      // chunkBits=0 → exact brute-force ground truth
      val n = if (chunkBits == 0)
        graft.operators.Dedup.embeddingNearDupPairs(
          emb, "vec_id", "embedding", threshold).count()
      else graft.operators.Dedup.embeddingNearDupPairsSignLsh(
        emb, "vec_id", "embedding", threshold, chunkBits, words).count()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[probe] signlsh chunkBits=$chunkBits words=$words rep=$r " +
        f"rows=$n ${s}%.2f s")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
