package graft.operators

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Pins the documented 100 TB swap for text_token_quantiles: exact
  * `percentile` (shuffles every value) vs `approx_percentile`
  * (map-side-combinable t-digest-style sketch). The sketch at accuracy
  * 1000 must land within 1/1000-quantile-rank of exact — on this
  * distribution that is a tight absolute bound per language.
  */
class ApproxQuantileSpec extends SparkSpec {

  test("approx_percentile tracks exact percentile per language") {
    val nw = Tables.documents(spark, sf("sf0.01"))
      .select(col("lang"), size(split(col("text"), " ")).as("n_words"))
    val both = nw.groupBy(col("lang")).agg(
      expr("percentile(n_words, array(0.25, 0.5, 0.75, 0.95))").as("exact"),
      expr("approx_percentile(n_words, array(0.25, 0.5, 0.75, 0.95), 1000)").as("approx"))
    val rows = both.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ex = r.getSeq[Double](1)
      val ap = r.getSeq[Int](2) // int column -> approx returns the col type
      ex.zip(ap).foreach { case (e, a) =>
        assert(math.abs(e - a.toDouble) <= 3.0,
          s"lang=${r.getString(0)} exact=$e approx=$a")
      }
    }
  }
}
