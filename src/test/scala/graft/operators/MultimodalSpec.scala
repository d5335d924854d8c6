package graft.operators

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("imageMeta: batched kernel covers every row exactly once") {
    val media = Multimodal.mediaFromDocuments(Tables.documents(spark, sf()), "image")
      .repartition(7) // partitions of uneven size vs DecodeBatchSize=64
    val meta = Multimodal.imageMeta(media)
    assert(meta.count() == media.count())
    assert(meta.toDF().select("id").distinct().count() == media.count())
    val r = meta.filter(_.id == 0).head()
    assert(r.width >= 1 && r.width <= 640 && r.channels == 3)
  }

  test("frameSample: frames reassemble to the original payload") {
    val media = Seq((1L, "image", "hello world, twelve bytes plus".getBytes("UTF-8")))
      .toDF("id", "media_type", "content")
    val frames = Multimodal.frameSample(media, n = 4)
      .orderBy("frame_idx").select("frame").as[Array[Byte]].collect()
    assert(frames.map(_.length).sum == 30)
    assert(new String(frames.flatten, "UTF-8") == "hello world, twelve bytes plus")
  }

  test("extractFeatures: fixed dim, deterministic") {
    val media = Multimodal.mediaFromDocuments(
      Tables.documents(spark, sf()).limit(10), "image")
    val a = Multimodal.extractFeatures(media, dim = 8).collect().map(f => (f.id, f.features.toSeq))
    val b = Multimodal.extractFeatures(media, dim = 8).collect().map(f => (f.id, f.features.toSeq))
    assert(a.toSeq.sortBy(_._1) == b.toSeq.sortBy(_._1))
    assert(a.forall(_._2.size == 8))
  }
}
