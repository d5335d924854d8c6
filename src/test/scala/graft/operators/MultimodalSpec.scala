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

  test("decodeImage: REAL ImageIO round-trip on encoded PNGs, None on non-images") {
    for ((w, h, seed) <- Seq((1, 1, 0L), (64, 48, 7L), (13, 29, 123L))) {
      val bytes = Multimodal.encodePng(w, h, seed)
      // real PNG container: \x89 P N G magic
      assert((bytes(0) & 0xFF) == 0x89 && bytes(1) == 'P'.toByte &&
        bytes(2) == 'N'.toByte && bytes(3) == 'G'.toByte)
      assert(Multimodal.decodeImage(bytes) == Some((w, h, 3)))
    }
    // deterministic fixture bytes (seed-stable across JVMs/rounds)
    assert(Multimodal.encodePng(5, 4, 9L).toSeq ==
      Multimodal.encodePng(5, 4, 9L).toSeq)
    assert(Multimodal.decodeImage("definitely not an image".getBytes("UTF-8")).isEmpty)
  }

  test("imageMeta: REAL decode on PNG payloads, stub fallback on text payloads") {
    val docs = Tables.documents(spark, sf()).limit(20)
    val real = Multimodal.imageMeta(Multimodal.pngMediaFromDocuments(docs)).collect()
    assert(real.length == 20)
    real.foreach { m =>
      assert(m.width == 1 + (m.id % 64).toInt, s"id=${m.id}")
      assert(m.height == 1 + (m.id % 48).toInt, s"id=${m.id}")
      assert(m.channels == 3)
    }
    // text payloads aren't decodable media → documented stub formula
    val stub = Multimodal.imageMeta(
      Multimodal.mediaFromDocuments(docs, "image")).collect()
    stub.foreach(m => assert(m.width <= 640 && m.height <= 480 && m.channels == 3))
  }

  test("decodeAudio: REAL AudioSystem round-trip on PCM WAVs, None on non-audio") {
    for ((sr, ch, n) <- Seq((8000, 1, 100), (44100, 2, 499), (11000, 2, 1))) {
      val bytes = Multimodal.encodeWavPcm16(sr, ch, n, seed = 42L)
      assert(new String(bytes.take(4), "US-ASCII") == "RIFF")
      assert(Multimodal.decodeAudio(bytes) == Some((sr, ch, 16, n.toLong)))
    }
    assert(Multimodal.decodeAudio("not audio at all".getBytes("UTF-8")).isEmpty)
    // a PNG is not audio and a WAV is not an image — readers don't cross
    assert(Multimodal.decodeAudio(Multimodal.encodePng(4, 4, 1L)).isEmpty)
    assert(Multimodal.decodeImage(Multimodal.encodeWavPcm16(8000, 1, 10, 1L)).isEmpty)
  }

  test("resizeImages: REAL scale-to-fit — resized bytes carry the predicted dims") {
    val media = Seq(
      (1L, "image", Multimodal.encodePng(64, 16, 5L)),  // wide: scale 1/2 → 32×8
      (2L, "image", Multimodal.encodePng(10, 48, 6L)),  // tall: scale 2/3 → 6×32
      (3L, "image", Multimodal.encodePng(20, 20, 7L)),  // fits: untouched
      (4L, "image", "not an image".getBytes("UTF-8")))  // stub fallback, clamped
      .toDF("id", "media_type", "content")
    val out = Multimodal.resizeImages(media, maxW = 32, maxH = 32)
      .collect().map(m => m.id -> ((m.width, m.height, m.channels))).toMap
    assert(out(1L) == ((32, 8, 3)))
    assert(out(2L) == ((6, 32, 3)))
    assert(out(3L) == ((20, 20, 3)))
    val (w4, h4, _) = out(4L)
    assert(w4 <= 32 && h4 <= 32)
  }

  test("pixelStats: raster means equal the closed-form pixel function (PNG lossless)") {
    val (w, h, seed) = (7, 5, 3L)
    val media = Seq((1L, "image", Multimodal.encodePng(w, h, seed)),
        (2L, "image", "garbage".getBytes("UTF-8")))
      .toDF("id", "media_type", "content")
    val got = Multimodal.pixelStats(media).collect()
    assert(got.length == 1 && got.head.id == 1L) // non-images dead-letter
    var (sr, sg, sb) = (0L, 0L, 0L)
    for (y <- 0 until h; x <- 0 until w) {
      val v = (seed + 31L * x + 131L * y) & 0xFFFFFF
      sr += (v >> 16) & 0xFF; sg += (v >> 8) & 0xFF; sb += v & 0xFF
    }
    val n = w.toLong * h
    val p = got.head
    assert(p.n_pixels == n)
    assert(p.mean_r == sr.toDouble / n && p.mean_g == sg.toDouble / n &&
      p.mean_b == sb.toDouble / n)
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
