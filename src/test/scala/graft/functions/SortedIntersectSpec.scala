package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[SortedLongIntersectSize]] ≡ `size(array_intersect(a, b))` on the
  * inputs the dedup verify stages actually build
  * (`array_sort(array_distinct(...))` bigint arrays) — pinned against
  * the builtin over randomized sorted-distinct arrays plus every edge
  * the merge walk branches on, in BOTH the codegen and interpreted
  * paths (the DataFrame run exercises codegen; the direct
  * `nullSafeEval` call the interpreted twin).
  */
class SortedIntersectSpec extends SparkSpec {

  private def viaBuiltinAndKernel(
      pairs: Seq[(Seq[java.lang.Long], Seq[java.lang.Long])]): Unit = {
    import scala.jdk.CollectionConverters._
    val rows = pairs.map { case (a, b) =>
      org.apache.spark.sql.Row(a.asJava, b.asJava)
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("a",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.LongType, containsNull = true)),
      org.apache.spark.sql.types.StructField("b",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.LongType, containsNull = true))))
    val df = spark.createDataFrame(rows.asJava, schema)
      .select(
        size(array_intersect(col("a"), col("b"))).as("builtin"),
        Sketches.sortedIntersectSize(col("a"), col("b")).as("kernel"))
    val got = df.collect()
    got.foreach { r =>
      assert(r.getInt(0) == r.getInt(1),
        s"builtin=${r.getInt(0)} kernel=${r.getInt(1)}")
    }
  }

  test("matches size(array_intersect) on randomized sorted-distinct long arrays") {
    // deterministic pseudo-random arrays (hash-derived, no RNG state)
    def arr(seed: Long, n: Int, dom: Long): Seq[java.lang.Long] =
      (0 until n).map(i => Long.box(Math.floorMod(
        Sketches.splitmix64(seed * 7919 + i), dom)))
        .distinct.sorted.map(l => l: java.lang.Long)
    val cases = for {
      s <- 1L to 40L
      na = (Sketches.splitmix64(s) & 0x1f).toInt
      nb = (Sketches.splitmix64(s + 100) & 0x1f).toInt
    } yield (arr(s, na, 40L), arr(s + 1, nb, 40L)) // small domain → real overlaps
    viaBuiltinAndKernel(cases)
  }

  test("edges: empty, disjoint, identical, subset, negative longs, both-null") {
    val neg: Seq[java.lang.Long] =
      Seq(Long.box(Long.MinValue), Long.box(-5L), Long.box(0L),
        Long.box(7L), Long.box(Long.MaxValue))
    viaBuiltinAndKernel(Seq(
      (Seq.empty, Seq.empty),
      (Seq.empty, Seq(Long.box(1L))),
      (Seq(Long.box(1L), Long.box(2L)), Seq(Long.box(3L), Long.box(4L))),
      (neg, neg),
      (neg, neg.drop(1).dropRight(1)),
      // nulls sort LAST under array_sort; both-null counts once,
      // one-sided null counts zero — array_intersect semantics
      (Seq(Long.box(1L), null), Seq(Long.box(1L), null)),
      (Seq(Long.box(1L), null), Seq(Long.box(1L), Long.box(2L))),
      (Seq[java.lang.Long](null), Seq[java.lang.Long](null))))
  }

  test("interpreted eval agrees with codegen on the same inputs") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    def ad(xs: Seq[Any]) = new GenericArrayData(xs.toArray)
    val e = SortedLongIntersectSize(null, null)
    assert(e.nullSafeEval(ad(Seq(1L, 3L, 9L)), ad(Seq(1L, 2L, 3L))) == 2)
    assert(e.nullSafeEval(ad(Seq.empty), ad(Seq(1L))) == 0)
    assert(e.nullSafeEval(ad(Seq(1L, null)), ad(Seq(2L, null))) == 1)
    assert(e.nullSafeEval(ad(Seq(1L, null)), ad(Seq(1L, 2L))) == 1)
  }
}
