package graft.operators

import graft.SparkSpec

/** connectedComponentsStar must agree with min-label propagation on
  * every graph — including the long-chain shapes it exists for.
  */
class StarContractionSpec extends SparkSpec {
  import spark.implicits._

  private def both(pairs: Seq[(Long, Long)]): (Map[Long, Long], Map[Long, Long]) = {
    val df = pairs.toDF("a", "b")
    val star = Dedup.connectedComponentsStar(df, "a", "b")
      .as[(Long, Long)].collect().toMap
    val prop = Dedup.connectedComponents(df, "a", "b")
      .as[(Long, Long)].collect().toMap
    (star, prop)
  }

  test("long chain (the case star contraction exists for)") {
    val chain = (1L until 40L).map(i => (i, i + 1))
    val (star, prop) = both(chain)
    assert(star === prop)
    assert(star.values.toSet === Set(1L))
  }

  test("random graphs across densities agree with min-label propagation") {
    val rnd = new scala.util.Random(42)
    for (n <- Seq(20, 60); edges <- Seq(n / 2, n, 3 * n)) {
      val pairs = Seq.fill(edges)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)).filter(p => p._1 != p._2)
      if (pairs.nonEmpty) {
        val (star, prop) = both(pairs)
        assert(star === prop, s"n=$n edges=$edges")
      }
    }
  }

  test("self-loops and duplicate edges are harmless") {
    val (star, prop) = both(Seq((5L, 5L), (1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L)))
    assert(star === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    // min-label keeps the 5-5 self loop as a singleton node; star drops
    // it with the self-loop filter — compare on the shared node set
    assert(star === prop.filter(_._1 != 5L))
  }
}
