package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** classifierTrain: in-engine integer descent must actually learn (a
  * planted lexical signal separates train-set classes), be bitwise
  * deterministic (the oracle replays every round), and tolerate degenerate
  * rows.
  */
class ClassifierTrainSpec extends SparkSpec {
  import spark.implicits._

  // two lexically-disjoint dialects + shared filler; y = dialect A
  private def corpus(n: Int) = {
    val pos = Seq("good solid prose with real structure",
      "well formed sentence about the weather",
      "clear and useful reference text")
    val neg = Seq("zz qq xx yy spam spam spam",
      "qq zz buy now click here zz",
      "xx yy zz qq qq xx garbage")
    (0 until n).map { i =>
      val y = i % 2
      val base = if (y == 1) pos(i % 3) else neg(i % 3)
      (i.toLong, s"$base filler token $i", y)
    }.toDF("doc_id", "text", "y")
  }

  private def dense(df: org.apache.spark.sql.DataFrame, b: Int): Array[Int] = {
    val w = new Array[Int](b)
    df.collect().foreach(r => w(r.getLong(0).toInt) = r.getLong(1).toInt)
    w
  }

  test("training separates a planted lexical signal") {
    val docs = corpus(40)
    val w = dense(TextAnalysis.classifierTrain(docs, "doc_id", "text",
      col("y"), buckets = 512, rounds = 3, lrDenom = 64L), 512)
    val scored = TextAnalysis.classifierScore(docs, "doc_id", "text", w)
      .join(docs.select(col("doc_id"), col("y")), "doc_id")
      .select(col("y"), col("logit")).as[(Int, Double)].collect()
    val posMin = scored.filter(_._1 == 1).map(_._2).min
    val negMax = scored.filter(_._1 == 0).map(_._2).max
    assert(posMin > negMax,
      s"trained weights do not separate the classes: min(pos)=$posMin <= max(neg)=$negMax")
  }

  test("weights are bitwise deterministic across runs and partitionings") {
    val docs = corpus(30)
    val a = TextAnalysis.classifierTrain(docs, "doc_id", "text", col("y"),
      buckets = 256, rounds = 2, lrDenom = 64L)
      .orderBy("bucket").as[(Long, Long)].collect().toSeq
    val b = TextAnalysis.classifierTrain(docs.repartition(7), "doc_id", "text",
      col("y"), buckets = 256, rounds = 2, lrDenom = 64L)
      .orderBy("bucket").as[(Long, Long)].collect().toSeq
    assert(a.nonEmpty)
    assert(a === b)
  }

  test("a second round changes weights only through still-erring docs") {
    val docs = corpus(30)
    val r1 = TextAnalysis.classifierTrain(docs, "doc_id", "text", col("y"),
      buckets = 256, rounds = 1, lrDenom = 64L)
      .as[(Long, Long)].collect().toMap
    val r3 = TextAnalysis.classifierTrain(docs, "doc_id", "text", col("y"),
      buckets = 256, rounds = 3, lrDenom = 64L)
      .as[(Long, Long)].collect().toMap
    // round 1 from w=0 is the class-count contrast; it must be nonzero
    assert(r1.nonEmpty)
    // training three rounds reuses round 1's result (prefix property of
    // deterministic full-batch descent): every r1 bucket is either kept
    // or moved, never spuriously dropped to an unrelated value
    assert(r3.keySet.intersect(r1.keySet).nonEmpty)
  }

  test("NULL and empty text rows don't crash training and carry no grams") {
    val docs = Seq(
      (1L, "real text here", 1),
      (2L, null.asInstanceOf[String], 0),
      (3L, "", 0),
      (4L, "zz qq spam", 0)).toDF("doc_id", "text", "y")
    val w = TextAnalysis.classifierTrain(docs, "doc_id", "text", col("y"),
      buckets = 128, rounds = 2, lrDenom = 8L)
    assert(w.count() > 0)
  }
}
