package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Efraimidis–Spirakis weighted sampling ([[Sampling.weightedByHash]] /
  * [[Sampling.weightedStratifiedByHash]]).
  */
class WeightedSampleSpec extends SparkSpec {
  import spark.implicits._

  private def pop(n: Int) =
    (1 to n).map(i => (i.toLong, if (i % 10 == 0) 50L else 1L, s"s${i % 3}"))
      .toDF("id", "w", "src")

  /** Driver-side reference of the same A-ES formula. */
  private def refKeys(rows: Seq[(Long, Long)]): Seq[(Long, Double)] = {
    val hashed = rows.toDF("id", "w")
      .select(col("id"), col("w"), Sampling.idHash(col("id")).as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    hashed.map { case (id, w, h) =>
      id -> (-math.log((h + 1).toDouble / 4294967296.0) / w.toDouble)
    }.toSeq
  }

  test("weightedByHash matches the driver-side A-ES reference") {
    val df = pop(500)
    val got = Sampling.weightedByHash(df, "id", "w", k = 40)
      .select("id", "rk").as[(Long, Int)].collect().sortBy(_._2)
    val want = refKeys(pop(500).select("id", "w").as[(Long, Long)].collect().toSeq)
      .sortBy { case (id, k) => (k, id) }.take(40).map(_._1)
    assert(got.map(_._1).toSeq == want)
    assert(got.map(_._2).toSeq == (1 to 40))
  }

  test("weightedByHash is repartition-stable") {
    val a = Sampling.weightedByHash(pop(500), "id", "w", k = 25)
      .select("id", "rk").collect().toSet
    val b = Sampling.weightedByHash(pop(500).repartition(13, col("src")), "id", "w", k = 25)
      .select("id", "rk").collect().toSet
    assert(a == b)
  }

  test("heavier rows are overrepresented") {
    // 10% of ids carry weight 50 vs 1; in a top-100 of 1000 they should
    // dominate (expected inclusion ratio ~50:1, deterministic here).
    val sel = Sampling.weightedByHash(pop(1000), "id", "w", k = 100)
      .select("id").as[Long].collect()
    val heavy = sel.count(_ % 10 == 0)
    assert(heavy > 60, s"heavy rows selected: $heavy of 100 (expected > 60)")
  }

  test("null and non-positive weights are excluded") {
    val df = Seq((1L, Some(5L)), (2L, None), (3L, Some(0L)), (4L, Some(-2L)),
      (5L, Some(1L))).toDF("id", "w")
    val sel = Sampling.weightedByHash(df, "id", "w", k = 10)
      .select("id").as[Long].collect().toSet
    assert(sel == Set(1L, 5L))
  }

  test("weightedStratifiedByHash agrees with per-stratum weightedByHash") {
    val df = pop(300)
    val strat = Sampling.weightedStratifiedByHash(df, "src", "id", "w", n = 10)
      .select("src", "id", "rk").as[(String, Long, Int)].collect()
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).toSet).toMap
    for (s <- Seq("s0", "s1", "s2")) {
      val per = Sampling.weightedByHash(df.filter(col("src") === s), "id", "w", k = 10)
        .select("id", "rk").as[(Long, Int)].collect().toSet
      assert(strat(s) == per, s"stratum $s")
    }
  }

  test("global top-k plans as TakeOrderedAndProject (no full sort)") {
    val plan = Sampling.weightedByHash(pop(500), "id", "w", k = 25)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(2000))
  }
}
