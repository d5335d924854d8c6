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
