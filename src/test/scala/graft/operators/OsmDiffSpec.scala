package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class OsmDiffSpec extends SparkSpec {
  import spark.implicits._

  private def snap(rows: (Long, Int, Boolean, String)*) =
    rows.toSeq.toDF("id", "version", "visible", "val")

  test("mergeLatest generalizes: custom column names + predicate aliveness") {
    val base = Seq((10L, 1L, "ok", "a"), (11L, 1L, "ok", "b"))
      .toDF("doc_id", "ver", "status", "text")
    val changes = Seq(
      (10L, 2L, "ok", "a2"),        // update wins
      (11L, 2L, "taken_down", "b"), // predicate-dead drops the key
      (12L, 1L, "ok", "c"))         // insert
      .toDF("doc_id", "ver", "status", "text")
    val out = Upsert.mergeLatest(base, changes, "doc_id", "ver",
        aliveExpr = col("status") === "ok")
      .select($"doc_id", $"ver", $"text").as[(Long, Long, String)]
      .collect().sortBy(_._1)
    assert(out.toSeq == Seq((10L, 2L, "a2"), (12L, 1L, "c")))
  }

  test("mergeLatest: tieBreak makes multi-batch (id, version) collisions deterministic") {
    val base = Seq((1L, 1L, "base", true)).toDF("doc_id", "ver", "payload", "alive")
    // two unioned change batches repeat (id=1, ver=2) with different
    // payloads AND aliveness — the case the default ordering cannot
    // decide; batch_seq is the caller-supplied tertiary order
    val changes = Seq(
      (1L, 2L, "batchA", false, 1L),
      (1L, 2L, "batchB", true, 2L))
      .toDF("doc_id", "ver", "payload", "alive", "batch_seq")
    val out = Upsert.mergeLatest(
        base.withColumn("batch_seq", lit(0L)), changes, "doc_id", "ver",
        aliveExpr = col("alive"), tieBreak = Seq(col("batch_seq")))
      .select($"doc_id", $"payload").as[(Long, String)].collect()
    // highest batch_seq wins the tie deterministically → alive row survives
    assert(out.toSeq == Seq((1L, "batchB")))
    // flipped sequence numbers → the dead row wins → key vanishes
    val flipped = Seq(
      (1L, 2L, "batchA", false, 2L),
      (1L, 2L, "batchB", true, 1L))
      .toDF("doc_id", "ver", "payload", "alive", "batch_seq")
    val out2 = Upsert.mergeLatest(
        base.withColumn("batch_seq", lit(0L)), flipped, "doc_id", "ver",
        aliveExpr = col("alive"), tieBreak = Seq(col("batch_seq")))
      .count()
    assert(out2 == 0L)
  }

  test("mergeLatest precondition: (id, version) unique per side in the oracle fixtures") {
    // the doc_apply_diff / osm_apply_diff queries rely on the default
    // (no-tieBreak) ordering being total; this pins the uniqueness
    // precondition their inputs satisfy (see mergeLatest scaladoc)
    val d = graft.sources.Tables.documents(spark, sf())
      .select(col("doc_id"), col("lang"), col("source"))
    val mods = d.filter(col("doc_id") % 10 === 0 && col("doc_id") % 17 =!= 0)
      .withColumn("version", lit(2L))
    val dels = d.filter(col("doc_id") % 17 === 0).withColumn("version", lit(2L))
    val ties = d.filter(col("doc_id") % 13 === 3).withColumn("version", lit(1L))
    val changes = mods.unionByName(dels).unionByName(ties)
    val dup = changes.groupBy("doc_id", "version").count().filter(col("count") > 1)
    assert(dup.isEmpty, "doc_apply_diff change batch repeats an (id, version)")
  }

  test("applyDiff: create, modify, delete, and idempotent re-apply") {
    val base = snap((1L, 1, true, "a"), (2L, 1, true, "b"), (3L, 2, true, "c"))
    val diff = snap(
      (2L, 2, true, "b2"), // modify
      (3L, 3, false, "-"), // delete
      (4L, 1, true, "d")) // create
    val got = OsmDiff.applyDiff(base, diff)
      .select("id", "version", "val").as[(Long, Int, String)]
      .collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, 1, "a"), (2L, 2, "b2"), (4L, 1, "d")))
    // idempotent: applying the same diff to the result changes nothing
    val again = OsmDiff.applyDiff(OsmDiff.applyDiff(base, diff), diff)
      .select("id", "version", "val").as[(Long, Int, String)]
      .collect().sortBy(_._1)
    assert(again.toSeq == got.toSeq)
  }

  test("applyDiff: stale change (lower version) never wins") {
    val base = snap((1L, 5, true, "new"))
    val diff = snap((1L, 3, true, "old"), (1L, 4, false, "-"))
    val got = OsmDiff.applyDiff(base, diff)
      .select("id", "version", "val").as[(Long, Int, String)].collect()
    assert(got.toSeq == Seq((1L, 5, "new")))
  }

  test("applyDiff: same-version conflict prefers the change side") {
    val base = snap((1L, 2, true, "base"))
    val diff = snap((1L, 2, true, "change"))
    val got = OsmDiff.applyDiff(base, diff).select("val").as[String].collect()
    assert(got.toSeq == Seq("change"))
  }
}
