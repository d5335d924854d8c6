package graft.tools

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ScaleGenSpec extends SparkSpec {
  import spark.implicits._

  test("mogEmbedding: deterministic, unit-free hash seeding — same ids " +
      "regenerate bit-identical vectors; within-cluster cosine far above " +
      "cross-cluster (the structure the replicated corpus lacks)") {
    val dim = 16; val kCl = 8; val noise = 0.3
    def gen() = spark.range(400).select(col("id").as("vec_id"))
      .withColumn("embedding",
        ScaleGen.mogEmbedding(col("vec_id"), dim, kCl, noise))
      .withColumn("cl",
        pmod(xxhash64(lit("mog-cl"), col("vec_id")), lit(kCl.toLong)))
    val a = gen().orderBy("vec_id").as[(Long, Seq[Float], Long)].collect()
    val b = gen().orderBy("vec_id").as[(Long, Seq[Float], Long)].collect()
    assert(a.toSeq == b.toSeq, "regeneration is not bit-identical")
    // every advertised cluster is populated at n=400, k=8
    assert(a.map(_._3).distinct.length == kCl)
    def cos(x: Seq[Float], y: Seq[Float]): Double = {
      val d = x.zip(y).map { case (p, q) => p.toDouble * q }.sum
      d / (math.sqrt(x.map(v => v.toDouble * v).sum) *
        math.sqrt(y.map(v => v.toDouble * v).sum))
    }
    val byCl = a.groupBy(_._3).view.mapValues(_.map(_._2)).toMap
    val within = byCl.values.flatMap(vs =>
      vs.sliding(2).collect { case Array(x, y) => cos(x, y) }).toSeq
    val cross = byCl.toSeq.sortBy(_._1).sliding(2).collect {
      case Seq((_, xs), (_, ys)) => cos(xs.head, ys.head) }.toSeq
    val (wAvg, cAvg) = (within.sum / within.size, cross.sum / cross.size)
    assert(wAvg > 0.85 && wAvg > cAvg + 0.5,
      s"clusters not separated: within=$wAvg cross=$cAvg")
  }
}
