package graft.functions

import graft.SparkSpec
import graft.operators.Layout
import org.apache.spark.sql.functions._

/** Morton key correctness (vs a naive bit-loop reference) and the
  * property the layout exists for: after range-cutting the sorted
  * order into buckets, BOTH dimensions' per-bucket envelopes are
  * narrow, so single-dimension predicates prune buckets — including
  * the trailing dimension a lexicographic sort cannot prune on.
  */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  private def refKey(bits: Int, dims: Seq[Long]): Long = {
    val mask = (1L << bits) - 1
    var out = 0L
    for (d <- dims.indices; i <- 0 until bits) {
      out |= (((dims(d) & mask) >> i) & 1L) << (i * dims.size + d)
    }
    out
  }

  private def sparkKey(bits: Int, dims: Long*): Long =
    Seq(dims).toDF("d")
      .select(ZOrder.key(bits,
        dims.indices.map(i => col("d").getItem(i)): _*).as("k"))
      .collect()(0).getLong(0)

  test("known small interleaves") {
    assert(sparkKey(2, 3L, 1L) == 7L)   // x bits at 0,2; y bit at 1
    assert(sparkKey(2, 0L, 3L) == 10L)  // y bits at 1,3
    assert(sparkKey(4, 5L, 0L) == refKey(4, Seq(5L, 0L)))
  }

  test("matches the bit-loop reference on random dims, 2 and 3 dims") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 40) {
      val bits = 1 + rnd.nextInt(10)
      val d2 = Seq(rnd.nextLong().abs % 4096, rnd.nextLong().abs % 4096)
      assert(sparkKey(bits, d2: _*) == refKey(bits, d2))
      val d3 = Seq.fill(3)(rnd.nextLong().abs % 4096)
      assert(sparkKey(bits, d3: _*) == refKey(bits, d3))
    }
  }

  test("null in any dimension nulls the key") {
    val r = Seq((Some(3L), Option.empty[Long])).toDF("x", "y")
      .select(ZOrder.key(4, col("x"), col("y")).as("k")).collect()(0)
    assert(r.isNullAt(0))
  }

  test("oracle SQL terms mirror the key") {
    assert(ZOrder.sqlTerms(2, Seq("ux", "uy")) ==
      "((((ux >> 0) & 1) << 0) | (((ux >> 1) & 1) << 2) | " +
        "(((uy >> 0) & 1) << 1) | (((uy >> 1) & 1) << 3))")
  }

  test("zorder buckets prune on BOTH dims; lexicographic only on the leading one") {
    val n = 64
    val grid = (for (x <- 0 until n; y <- 0 until n) yield (x.toLong, y.toLong))
      .toDF("x", "y")
    val buckets = 16

    def touched(df: org.apache.spark.sql.DataFrame, key: org.apache.spark.sql.Column,
        dim: String, lo: Long, hi: Long): Long = {
      val env = Layout.bucketEnvelopes(
        df, key, col("x") * n + col("y"), buckets,
        ("x", col("x")), ("y", col("y")))
      env.filter(col(s"max_$dim") >= lo && col(s"min_$dim") <= hi).count()
    }

    val zk = ZOrder.key(6, col("x"), col("y"))
    val lex = col("x") * n + col("y")
    // trailing-dimension predicate: y in a 8-wide band
    val zY = touched(grid, zk, "y", 8, 15)
    val lexY = touched(grid, lex, "y", 8, 15)
    assert(lexY == buckets, "every lex bucket spans the full y range")
    assert(zY <= buckets / 2, s"zorder should prune y-band buckets, touched $zY")
    // leading-dimension predicate: both layouts prune
    val zX = touched(grid, zk, "x", 8, 15)
    val lexX = touched(grid, lex, "x", 8, 15)
    assert(lexX <= buckets / 4)
    assert(zX <= buckets / 2)
  }

  test("zorderClustered: count preserved, schema unchanged, partition key-ranges disjoint") {
    val df = (1 to 5000).map(i => (i.toLong, (i * 2654435761L) % 1024,
      (i * 97L) % 1024)).toDF("id", "a", "b")
    val out = Layout.zorderClustered(df, 10, 8, col("a"), col("b"))
    assert(out.columns.toSeq == Seq("id", "a", "b"))
    assert(out.count() == 5000)
    // recompute the (deterministic) key and check range disjointness
    val ranges = out
      .withColumn("k", ZOrder.key(10, col("a"), col("b")))
      .withColumn("pid", spark_partition_id())
      .groupBy("pid").agg(min("k").as("lo"), max("k").as("hi"))
      .orderBy("lo").collect()
    val nonEmpty = ranges.filter(!_.isNullAt(1))
    for (i <- 1 until nonEmpty.length) {
      assert(nonEmpty(i - 1).getLong(2) <= nonEmpty(i).getLong(1),
        "partition key ranges must not interleave")
    }
  }
}
