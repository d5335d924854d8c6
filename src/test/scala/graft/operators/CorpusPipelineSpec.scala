package graft.operators

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** The composed pipeline must equal the manual chain of its stages,
  * stage order must protect epoch copies from dedup, and the observe
  * metric must report the output honestly.
  */
class CorpusPipelineSpec extends SparkSpec {
  import spark.implicits._

  private def settings = CorpusSettings(
    mixtureRates = Map("src0" -> 1.0, "src1" -> 0.5),
    defaultRate = 0.4,
    epochs = Map("src0" -> 2.0),
    dedupK = 3, dedupThreshold = 0.8,
    decontaminateK = 3,
    packCap = 512, packBuckets = 8)

  test("composition equals the manual stage chain") {
    val docs = Tables.documents(spark, sf())
    val evalSet = docs.filter($"doc_id" < 25)
    val train = docs.filter($"doc_id" >= 25)
    val s = settings

    val got = CorpusPipeline.run(train, Some(evalSet), s)
      .select($"doc_id", $"pack_id", $"pack_offset", $"epoch")
      .as[(Long, Long, Long, Int)].collect().toSet

    // the same stages, chained by hand
    val mixed = Sampling.mixtureByHash(train, "doc_id", "source",
      s.mixtureRates, s.defaultRate)
    val clean = Decontaminate.decontaminate(mixed, evalSet, "doc_id", "text", 3)
    val cc = Dedup.connectedComponents(
      Dedup.minhashLshPairs(clean, "doc_id", "text", 3, 0.8, 16, 2)
        .select($"id_a", $"id_b"), "id_a", "id_b", idOut = "cid")
    val kept = clean.join(cc, $"doc_id" === $"cid", "left")
      .filter($"cid".isNull || $"component" === $"doc_id")
      .drop("cid", "component")
    val packed = Sampling.packLayoutSalted(
      kept.withColumn("n_words", size(split($"text", " ")).cast("long")),
      "lang", "doc_id", "n_words", 512, 8)
    val manual = Sampling.upsampleByEpochs(packed, "doc_id", "source",
        s.epochs, s.defaultEpochs)
      .select($"doc_id", $"pack_id", $"pack_offset", $"epoch")
      .as[(Long, Long, Long, Int)].collect().toSet

    assert(got == manual && got.nonEmpty)
  }

  test("perplexity quality gate drops exactly the above-threshold docs") {
    val docs = Tables.documents(spark, sf()).filter($"doc_id" >= 25)
    val base = settings.copy(mixtureRates = Map("src0" -> 1.0), defaultRate = 1.0,
      epochs = Map.empty)
    // pick a threshold at the corpus median so the gate provably bites
    val ppl = TextAnalysis.perplexityScore(docs, "doc_id", "text")
    val median = ppl.stat.approxQuantile("perplexity", Array(0.5), 0.0)(0)
    val gated = CorpusPipeline.run(docs, None,
      base.copy(maxPerplexity = Some(median)))
    val open = CorpusPipeline.run(docs, None, base)
    val gatedIds = gated.select($"doc_id").distinct().as[Long].collect().toSet
    val openIds = open.select($"doc_id").distinct().as[Long].collect().toSet
    val badIds = ppl.filter($"perplexity" > median)
      .select($"doc_id").as[Long].collect().toSet
    assert(gatedIds.nonEmpty && badIds.nonEmpty)
    assert(gatedIds.intersect(badIds).isEmpty, "above-threshold doc survived")
    // the gate genuinely removed something (no subset claim: dropping a
    // dup-cluster's canonical doc promotes another member, so the gated
    // survivor set is not necessarily contained in the open one)
    assert(gatedIds.size < openIds.size)
  }

  test("stage order: epoch copies share one pack layout, dedup can't eat them") {
    val docs = Tables.documents(spark, sf()).filter($"doc_id" >= 25)
    val out = CorpusPipeline.run(docs, None, settings)
    // every src0 doc appears exactly twice, with IDENTICAL pack placement
    val src0 = out.filter($"source" === "src0")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n"), countDistinct($"pack_id", $"pack_offset").as("placements"))
      .as[(Long, Long, Long)].collect()
    assert(src0.nonEmpty && src0.forall { case (_, n, p) => n == 2 && p == 1 })
    // offsets respect the context budget
    assert(out.filter($"pack_offset" >= 512 || $"pack_offset" < 0).count() == 0)
  }

  test("shard stage: epoch-stable (shard, pos), dense per shard, equals manual chain") {
    val docs = Tables.documents(spark, sf()).filter($"doc_id" >= 25)
    val out = CorpusPipeline.run(docs, None, settings.copy(numShards = Some(4)))
    // all epoch copies of a doc share ONE (shard, pos)
    val perDoc = out.groupBy($"doc_id")
      .agg(countDistinct($"shard", $"pos").as("p")).as[(Long, Long)].collect()
    assert(perDoc.nonEmpty && perDoc.forall(_._2 == 1))
    // positions are dense 0..n-1 within each shard (over distinct docs)
    val dense = out.select($"shard", $"pos", $"doc_id").distinct()
      .groupBy($"shard")
      .agg(count(lit(1)).as("n"), max($"pos").as("mx"), min($"pos").as("mn"))
      .as[(Int, Long, Long, Long)].collect()
    assert(dense.nonEmpty && dense.forall { case (_, n, mx, mn) => mn == 0 && mx == n - 1 })
    // composition ≡ manual: same run without shards + shardLayout joined on
    val bare = CorpusPipeline.run(docs, None, settings)
    val manual = bare.join(
        Sampling.shardLayout(bare.select($"doc_id").distinct(), "doc_id", 4,
          settings.packBuckets),
        Seq("doc_id"))
      .select($"doc_id", $"epoch", $"shard", $"pos")
      .as[(Long, Int, Int, Long)].collect().toSet
    val got = out.select($"doc_id", $"epoch", $"shard", $"pos")
      .as[(Long, Int, Int, Long)].collect().toSet
    assert(got == manual)
  }

  test("manifest: per-(stratum, pack, epoch) ordered ids reconstruct the layout") {
    val docs = Tables.documents(spark, sf()).filter($"doc_id" >= 25)
    val s = settings
    val out = CorpusPipeline.run(docs, None, s).persist()
    val man = CorpusPipeline.manifest(out, s)
    val rows = man.as[(String, Long, Int, Long, Long, String)].collect()
    assert(rows.nonEmpty)
    // doc counts and token mass agree with the raw layout
    val byKey = out.groupBy($"lang", $"pack_id", $"epoch")
      .agg(count(lit(1)).as("n"), sum($"n_words").as("t"))
      .as[(String, Long, Int, Long, Long)].collect()
      .map(r => ((r._1, r._2, r._3), (r._4, r._5))).toMap
    rows.foreach { case (lang, pack, epoch, nDocs, nTokens, ids) =>
      assert(byKey((lang, pack, epoch)) == ((nDocs, nTokens)))
      assert(ids.split(",").length.toLong == nDocs)
    }
    // ordering within a pack follows pack_offset
    val firstByOffset = out.filter($"epoch" === 1)
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"lang", $"pack_id")
          .orderBy($"pack_offset", $"doc_id")))
      .filter($"rn" === 1)
      .select($"lang", $"pack_id", $"doc_id")
      .as[(String, Long, Long)].collect()
      .map(r => ((r._1, r._2), r._3)).toMap
    rows.filter(_._3 == 1).foreach { case (lang, pack, _, _, _, ids) =>
      assert(ids.split(",").head.toLong == firstByOffset((lang, pack)))
    }
    out.unpersist()
  }

  test("observe metric reports output rows and token mass") {
    val docs = Tables.documents(spark, sf()).filter($"doc_id" >= 25)
    val out = CorpusPipeline.run(docs, None, settings)
    @volatile var metric: Option[(Long, Long)] = None
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution, d: Long): Unit =
        qe.observedMetrics.get("corpus_pipeline").foreach(r =>
          metric = Some((r.getLong(0), r.getLong(1))))
      override def onFailure(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val n = out.count()
      val tokens = out.agg(sum($"n_words")).as[Long].head()
      var tries = 0
      while (metric.isEmpty && tries < 50) { Thread.sleep(100); tries += 1 }
      assert(metric.contains((n, tokens)))
    } finally spark.listenerManager.unregister(listener)
  }
}
