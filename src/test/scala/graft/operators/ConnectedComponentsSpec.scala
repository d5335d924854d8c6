package graft.operators

import graft.SparkSpec

class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def cc(pairs: Seq[(Long, Long)]): Map[Long, Long] =
    Dedup.connectedComponents(pairs.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap

  test("path graph: min label propagates the full chain length") {
    // 1-2-3-4-5-6 needs multiple propagation rounds to reach the tail
    val got = cc(Seq((5L, 6L), (1L, 2L), (3L, 4L), (2L, 3L), (4L, 5L)))
    assert(got === (1L to 6L).map(_ -> 1L).toMap)
  }

  test("star + isolated pair + singleton-free: disjoint components keep distinct roots") {
    val got = cc(Seq((10L, 11L), (10L, 12L), (10L, 13L), (20L, 21L)))
    assert(got === Map(10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L,
      20L -> 20L, 21L -> 20L))
  }

  test("edge direction and duplicates don't matter") {
    val got = cc(Seq((2L, 1L), (1L, 2L), (2L, 3L), (3L, 2L), (2L, 3L)))
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("two merging chains: component id is the global min, not a local one") {
    // 7-8-9 and 3-4 merge via 9-3: everything lands on 3
    val got = cc(Seq((7L, 8L), (8L, 9L), (3L, 4L), (9L, 3L)))
    assert(got.values.toSet === Set(3L))
    assert(got.keySet === Set(3L, 4L, 7L, 8L, 9L))
  }

  test("loop conf overrides never touch the caller's session (cloned-session isolation)") {
    // the AQE/width overrides live on a CLONED session now — the
    // caller's conf must be byte-identical after both variants, after
    // a failing edge pipeline, and (the part a restore-based design
    // could not promise) there is no window where a concurrent query
    // on the caller's session would plan under loop settings
    val aqeBefore = spark.conf.get("spark.sql.adaptive.enabled", "true")
    val partsBefore = spark.conf.get("spark.sql.shuffle.partitions")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a", "b")
    Dedup.connectedComponents(pairs, "a", "b").collect()
    assert(spark.conf.get("spark.sql.adaptive.enabled") == aqeBefore)
    assert(spark.conf.get("spark.sql.shuffle.partitions") == partsBefore)
    Dedup.connectedComponentsStar(pairs, "a", "b").collect()
    assert(spark.conf.get("spark.sql.adaptive.enabled") == aqeBefore)
    assert(spark.conf.get("spark.sql.shuffle.partitions") == partsBefore)
    // a failing edge pipeline must leave the caller untouched too
    val bad = spark.range(2).selectExpr("CAST(id AS LONG) AS a",
      "CAST(raise_error('boom') AS LONG) AS b")
    intercept[Exception] { Dedup.connectedComponents(bad, "a", "b").collect() }
    assert(spark.conf.get("spark.sql.adaptive.enabled") == aqeBefore)
    assert(spark.conf.get("spark.sql.shuffle.partitions") == partsBefore)
    // the result is re-rooted in the CALLER's session (composition
    // with caller frames must stay single-session)
    assert(Dedup.connectedComponents(pairs, "a", "b").sparkSession eq spark)
  }

  test("empty pair relation yields an empty labeling") {
    assert(cc(Seq.empty).isEmpty)
  }

  test("non-numeric shuffle.partitions conf doesn't break the loops (ADVICE r4)") {
    // some managed platforms set spark.sql.shuffle.partitions to free
    // text ("auto") via spark-defaults, where no set-time validation
    // runs (RuntimeConfig.set rejects it, so the loop can't meet it in
    // this OSS test session — the parse helper is what guards it). It
    // must fall back to Spark's default 200, not throw mid-pipeline.
    assert(Dedup.loopShufflePartitions("auto", 10L) == 1L)
    assert(Dedup.loopShufflePartitions("auto", 600000000L) == 200L)
    assert(Dedup.loopShufflePartitions(" 32 ", 600000000L) == 32L)
    assert(Dedup.loopShufflePartitions("32", 10L) == 1L)
    assert(Dedup.loopShufflePartitions("-5", 600000000L) == 200L)
    assert(Dedup.loopShufflePartitions("", 1000000000L) == 200L)
    // and a loop actually runs green under a small numeric width
    val partsBefore = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "7")
    try {
      val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a", "b")
      val got = Dedup.connectedComponents(pairs, "a", "b")
        .as[(Long, Long)].collect().toMap
      assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
    } finally spark.conf.set("spark.sql.shuffle.partitions", partsBefore)
  }
}
