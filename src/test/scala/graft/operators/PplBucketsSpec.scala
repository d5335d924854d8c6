package graft.operators

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** The sketch-threshold bucket assignment (the scale path — mergeable
  * percentile_approx cuts, no per-language sort) must agree with the
  * exact ntile labeler except within the sketch's rank error of a cut
  * point, and must keep the tercile sizes balanced.
  */
class PplBucketsSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sf())

  test("threshold labels agree with exact ntile labels away from cut points") {
    val exact = TextAnalysis.pplBucketsExact(docs, "doc_id", "text", "lang")
      .select(col("doc_id"), col("bucket").as("b_exact"))
    val approx = TextAnalysis.pplBucketsByThreshold(docs, "doc_id", "text", "lang")
      .select(col("doc_id"), col("bucket").as("b_approx"))
    val j = exact.join(approx, "doc_id").cache()
    val n = j.count()
    val agree = j.filter(col("b_exact") === col("b_approx")).count()
    assert(n > 0)
    // at accuracy=10000 on a few hundred docs the sketch is exact up to
    // ties AT the cut value itself; demand near-total agreement
    assert(agree.toDouble / n > 0.98, s"agreement $agree/$n")
    j.unpersist()
  }

  test("terciles are balanced per language (exact labeler)") {
    val sizes = TextAnalysis.pplBucketsExact(docs, "doc_id", "text", "lang")
      .groupBy("lang", "bucket").count()
      .groupBy("lang")
      .agg(max("count").as("mx"), min("count").as("mn"), count(lit(1)).as("k"))
      .collect()
    for (r <- sizes) {
      assert(r.getLong(3) == 3, s"lang ${r.getString(0)} must have 3 buckets")
      assert(r.getLong(1) - r.getLong(2) <= 1, "ntile balance within 1")
    }
  }

  test("every labeled doc had >= 2 tokens; buckets cover head/middle/tail") {
    val out = TextAnalysis.pplBucketsExact(docs, "doc_id", "text", "lang")
    val buckets = out.select("bucket").distinct().collect().map(_.getString(0)).toSet
    assert(buckets == Set("head", "middle", "tail"))
  }
}
