package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def docs = spark.range(1000).select(
    $"id".as("doc_id"),
    (pmod($"id", lit(4L))).cast("string").as("stratum"))

  test("bernoulli: deterministic, partition-layout independent, ~fraction sized") {
    val a = Sampling.bernoulliByHash(docs, "doc_id", 0.2)
      .select($"doc_id").as[Long].collect().toSet
    val b = Sampling.bernoulliByHash(docs.repartition(17), "doc_id", 0.2)
      .select($"doc_id").as[Long].collect().toSet
    assert(a === b)
    assert(a.size > 120 && a.size < 280, s"got ${a.size} of 1000 at fraction 0.2")
  }

  test("bernoulli: sample at larger fraction is a superset (stable splits)") {
    val f10 = Sampling.bernoulliByHash(docs, "doc_id", 0.1)
      .select($"doc_id").as[Long].collect().toSet
    val f30 = Sampling.bernoulliByHash(docs, "doc_id", 0.3)
      .select($"doc_id").as[Long].collect().toSet
    assert(f10.subsetOf(f30))
  }

  test("stratified: exactly n per stratum, deterministic under repartition") {
    val s1 = Sampling.stratifiedByHash(docs, "stratum", "doc_id", 25)
    val counts = s1.groupBy($"stratum").count().as[(String, Long)].collect().toMap
    assert(counts.values.toSet === Set(25L))
    val s2 = Sampling.stratifiedByHash(docs.repartition(13), "stratum", "doc_id", 25)
    assert(s1.select($"doc_id").as[Long].collect().toSet ===
      s2.select($"doc_id").as[Long].collect().toSet)
  }

  test("stratified: small stratum returns all its rows") {
    val tiny = docs.filter($"doc_id" < 6) // strata of size 1-2
    val out = Sampling.stratifiedByHash(tiny, "stratum", "doc_id", 10)
    assert(out.count() === 6)
  }

  test("salted two-phase stratified equals the plain form (rows AND ranks)") {
    for (salts <- Seq(1, 4, 16, 64)) {
      val plain = Sampling.stratifiedByHash(docs, "stratum", "doc_id", 25)
        .select($"doc_id", $"stratum", $"rk").as[(Long, String, Int)].collect().toSet
      val salted = Sampling.stratifiedByHashSalted(docs, "stratum", "doc_id", 25,
          salts = salts)
        .select($"doc_id", $"stratum", $"rk").as[(Long, String, Int)].collect().toSet
      assert(salted === plain, s"salts=$salts")
    }
  }

  test("salted phase 1 splits the stratum's shuffle across salt groups") {
    // one giant stratum: the plain form sorts it through ONE window
    // partition; the salted form's first window must key on
    // (stratum, salt), splitting the sort 16 ways
    val one = docs.withColumn("stratum", lit("all"))
    val out = Sampling.stratifiedByHashSalted(one, "stratum", "doc_id", 25)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    val windowSpecs = plan.split("\n").filter(_.contains("Window"))
    // first (inner) window partitions by 2 expressions, second by 1
    assert(plan.contains("pmod"), "salt expression missing from plan")
    assert(windowSpecs.length >= 2, s"expected two window operators:\n$plan")
    assert(out.count() === 25)
  }
}
