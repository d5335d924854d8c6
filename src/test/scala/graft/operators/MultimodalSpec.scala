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

  test("aHash64: hand-computed bits on a 2-block image") {
    // 2x1 image: left pixel dark, right bright → exactly one grid
    // column boundary at x=1 ((x*8)/2 = 0..3 vs 4..7); block (0,0)
    // holds the dark pixel (below mean), block (0,4) the bright one
    val img = new java.awt.image.BufferedImage(2, 1,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    img.setRGB(0, 0, 0x000000)   // luma 0
    img.setRGB(1, 0, 0xFFFFFF)   // luma 765
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val media = Seq((1L, bos.toByteArray)).toDF("id", "content")
    val got = Multimodal.aHash64(media).head()
    // bright block: 765*2 > 765*1 → bit at idx 0*8+4 = 4 only
    assert(got.ahash == (1L << 4), s"got ${got.ahash.toBinaryString}")
  }

  test("aHash64: invariant under uniform brightness shift, changed by structure") {
    def png(shift: Int, swap: Boolean): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(16, 16,
        java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      for (y <- 0 until 16; x <- 0 until 16) {
        val base = if ((x < 8) ^ swap) 40 else 160 // two luma halves
        val v = base + shift
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val media = Seq(
      (1L, png(0, swap = false)),
      (2L, png(30, swap = false)),  // +30 brightness everywhere
      (3L, png(0, swap = true))     // halves swapped: different structure
    ).toDF("id", "content")
    val got = Multimodal.aHash64(media).collect().map(r => r.id -> r.ahash).toMap
    assert(got(1L) == got(2L), "uniform brightness shift must not change aHash")
    assert(got(1L) != got(3L), "structural change must change aHash")
    assert(java.lang.Long.bitCount(got(1L) ^ got(3L)) == 64) // full inversion
  }

  test("aHash64: kernel matches the closed-form raster formula per block") {
    // the oracle's construction, in-JVM: exact integer block sums over
    // the synthetic pixel function must reproduce the decoded hash
    val (w, h, seed) = (13, 9, 42L)
    val media = Seq((seed, Multimodal.encodePng(w, h, seed)))
      .toDF("id", "content")
    val got = Multimodal.aHash64(media).head().ahash
    val bs = new Array[Long](64); val bn = new Array[Long](64); var tot = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val v = (seed + 262147L * x + 40961L * y) & 0xFFFFFF
      val g = ((v >> 16) & 0xFF) + ((v >> 8) & 0xFF) + (v & 0xFF)
      val i = (y * 8 / h) * 8 + (x * 8 / w)
      bs(i) += g; bn(i) += 1; tot += g
    }
    var want = 0L
    for (i <- 0 until 64) if (bs(i) * (w.toLong * h) > tot * bn(i)) want |= 1L << i
    assert(got == want)
  }

  test("audioFingerprint64: volume-invariant, structure-sensitive, empty-safe") {
    // 128 samples: quiet first half (amp 100), loud second half (1000)
    def wav(samples: Array[Short]) =
      Multimodal.encodeWavPcm16Samples(8000, 1, samples)
    val base = Array.tabulate(128)(i =>
      (if (i < 64) 100 else 1000).toShort)
    val louder = base.map(s => (s * 8).toShort)        // gain x8, no clip
    val swapped = base.reverse                          // structure flipped
    val media = Seq(
      (1L, wav(base)), (2L, wav(louder)), (3L, wav(swapped)),
      (4L, wav(Array.empty[Short]))
    ).toDF("id", "content")
    val got = Multimodal.audioFingerprint64(media).collect()
      .map(r => r.id -> r.afp).toMap
    // loud half = windows 32..63 set (energy strictly above clip mean)
    assert(got(1L) == (0xFFFFFFFFL << 32), got(1L).toBinaryString)
    assert(got(2L) == got(1L), "integer gain must not change the fingerprint")
    assert(got(3L) == 0xFFFFFFFFL, "reversed clip flips the profile")
    assert(got(4L) == 0L)
  }

  test("aHash/audio fingerprints feed the shared banded hamming pair join") {
    // two stamped variants of one image: near-dup pair surfaces with
    // small hamming; an unrelated image pairs with neither
    // unrelated image with genuinely different STRUCTURE (vertical
    // half-split) — two smooth ramps with different seeds share their
    // gradient structure and hash near-identically, which is aHash
    // working as designed, not a usable negative case
    val halves = {
      val img = new java.awt.image.BufferedImage(32, 32,
        java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      for (y <- 0 until 32; x <- 0 until 32) {
        val v = if (y < 16) 30 else 200
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val media = Seq(
      (1L, Multimodal.encodePng(32, 32, seed = 7L)),
      (2L, Multimodal.encodePngStamped(32, 32, seed = 7L)),
      (3L, halves)
    ).toDF("id", "content")
    val fp = Multimodal.aHash64(media).toDF()
    val pairs = graft.operators.Dedup.fingerprintHammingPairs(
        fp, "id", "ahash", maxHamming = 8)
      .as[(Long, Long, Int)].collect()
    val planted = pairs.find(p => (p._1, p._2) == ((1L, 2L)))
    assert(planted.isDefined, s"stamped near-dup missing: ${pairs.mkString(",")}")
    // the stamp touches one grid block (4x4 at 32px/8): few bits flip
    assert(planted.get._3 <= 4, s"stamp flipped too many bits: $planted")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L),
      s"structurally different image paired: ${pairs.mkString(",")}")
  }

  test("pHash64: kernel matches the closed-form raster formula through the integer DCT") {
    // the oracle's construction, in-JVM: 32x32 cell luma sums from the
    // synthetic pixel law, fixed-point DCT with the SAME inlined table,
    // lower-median threshold — must reproduce the decoded-pixel hash
    val (w, h, seed) = (37, 23, 99L)
    val media = Seq((seed, Multimodal.encodePng(w, h, seed)))
      .toDF("id", "content")
    val got = Multimodal.pHash64(media).head().phash
    val cells = Array.ofDim[Long](32, 32)
    for (y <- 0 until h; x <- 0 until w) {
      val v = (seed + 262147L * x + 40961L * y) & 0xFFFFFF
      val g = ((v >> 16) & 0xFF) + ((v >> 8) & 0xFF) + (v & 0xFF)
      cells(x * 32 / w)(y * 32 / h) += g
    }
    val c = new Array[Long](64)
    for (cu <- 0 until 32; cv <- 0 until 32; p <- 0 until 8; q <- 0 until 8)
      c(p * 8 + q) +=
        Multimodal.DctTable(p)(cu) * cells(cu)(cv) * Multimodal.DctTable(q)(cv)
    val med = c.sorted.apply(31)
    var want = 0L
    for (i <- 0 until 64) if (c(i) > med) want |= 1L << i
    assert(got == want, s"got ${got.toBinaryString} want ${want.toBinaryString}")
  }

  test("pHash64: perceptual margins on a textured raster; transpose permutes bits exactly") {
    // 8x8-tile textured fixture (a smooth gradient is adversarial for
    // ANY DCT hash: every gradient has the same low-frequency shape
    // and the AC coefficients cluster at the median, so rank bits
    // jitter — measured, not assumed): stamp flips few bits, a
    // different texture flips many, uniform brightness flips ~none
    // (the shift lands almost entirely in the DC bin)
    def tilePng(seed: Int, stamp: Boolean = false, shift: Int = 0,
        transpose: Boolean = false): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(64, 64,
        java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      for (y <- 0 until 64; x <- 0 until 64) {
        val (tx, ty) = if (transpose) (y, x) else (x, y)
        val v =
          if (stamp && tx < 4 && ty < 4) 255
          else {
            val tv = seed + 131 * (tx / 8) + 277 * (ty / 8)
            // base range [0,200) so shift=20 never clips (clipping
            // would be a structure change, not a brightness shift)
            (((tv * 2654435761L) % 200).toInt + shift) min 255
          }
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val media = Seq(
      (1L, tilePng(5)),
      (2L, tilePng(5, stamp = true)),
      (3L, tilePng(6)),
      (4L, tilePng(5, shift = 20)),
      (5L, tilePng(5, transpose = true)),
      (6L, Array[Byte](1, 2, 3)) // undecodable → no row
    ).toDF("id", "content")
    val got = Multimodal.pHash64(media).collect().map(r => r.id -> r.phash).toMap
    assert(got.size == 5 && !got.contains(6L))
    val stampDist = java.lang.Long.bitCount(got(1L) ^ got(2L))
    val textureDist = java.lang.Long.bitCount(got(1L) ^ got(3L))
    val brightDist = java.lang.Long.bitCount(got(1L) ^ got(4L))
    assert(stampDist <= 8, s"stamp flipped $stampDist bits")
    assert(brightDist <= 4, s"brightness shift flipped $brightDist bits")
    assert(textureDist > 16, s"texture change only flipped $textureDist bits")
    // transposing the raster transposes the cell grid, which swaps
    // C(p,q) ↔ C(q,p) — same multiset, same median, so the bit MATRIX
    // transposes exactly (the symmetric-basis invariant, exact because
    // the fixed-point table is shared by both axes)
    var want = 0L
    for (p <- 0 until 8; q <- 0 until 8)
      if ((got(1L) >>> (p * 8 + q) & 1L) == 1L) want |= 1L << (q * 8 + p)
    assert(got(5L) == want, "transpose must permute bits, not rehash them")
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
      val v = (seed + 262147L * x + 40961L * y) & 0xFFFFFF
      sr += (v >> 16) & 0xFF; sg += (v >> 8) & 0xFF; sb += v & 0xFF
    }
    val n = w.toLong * h
    val p = got.head
    assert(p.n_pixels == n)
    assert(p.mean_r == sr.toDouble / n && p.mean_g == sg.toDouble / n &&
      p.mean_b == sb.toDouble / n)
  }

  test("extractFeatures: REAL per-channel histogram of decoded pixels") {
    // large enough that 262147x walks the R channel across bins
    val (w, h, seed) = (40, 30, 11L)
    val media = Seq((1L, "image", Multimodal.encodePng(w, h, seed)),
        (2L, "image", "not an image".getBytes("UTF-8")))
      .toDF("id", "media_type", "content")
    val got = Multimodal.extractFeatures(media, bins = 4).collect()
    assert(got.length == 1 && got.head.id == 1L) // non-images dead-letter
    // independent recomputation from the closed-form pixel function
    val counts = new Array[Long](12)
    for (y <- 0 until h; x <- 0 until w) {
      val v = (seed + 262147L * x + 40961L * y) & 0xFFFFFF
      counts(((v >> 16) & 0xFF).toInt / 64) += 1
      counts(4 + ((v >> 8) & 0xFF).toInt / 64) += 1
      counts(8 + (v & 0xFF).toInt / 64) += 1
    }
    val n = w.toLong * h
    val want = counts.map(c => (c.toDouble / n).toFloat).toSeq
    assert(got.head.features.toSeq == want)
    // the widened fixture coefficients must exercise EVERY channel's
    // bins (the point of 262147/40961): each channel has >= 2 nonzero
    for (c <- 0 until 3)
      assert(want.slice(c * 4, c * 4 + 4).count(_ > 0f) >= 2, s"channel $c")
    // normalized: each channel's shares sum to ~1
    for (c <- 0 until 3)
      assert(math.abs(want.slice(c * 4, c * 4 + 4).map(_.toDouble).sum - 1.0) < 1e-6)
    // deterministic across evaluations
    val again = Multimodal.extractFeatures(media, bins = 4).collect()
    assert(again.head.features.toSeq == got.head.features.toSeq)
  }

  test("encodeGif/decodeFrames: REAL multi-frame round-trip, lossless pixels") {
    val (w, h, frames, seed) = (13, 9, 5, 21L)
    val bytes = Multimodal.encodeGif(w, h, frames, seed)
    // real GIF container magic
    assert(new String(bytes.take(6), "US-ASCII").startsWith("GIF8"))
    val got = Multimodal.decodeFrames(bytes).get
    assert(got.size == frames)
    for (f <- 0 until frames; y <- 0 until h; x <- 0 until w)
      assert((got(f).getRGB(x, y) & 0xFF) ==
        ((seed + 7L * f + 31L * x + 131L * y) % 256).toInt,
        s"frame $f pixel ($x,$y)")
    assert(Multimodal.decodeFrames("not a gif".getBytes("UTF-8")).isEmpty)
    // format-generic: a single-frame format decodes as exactly one frame
    assert(Multimodal.decodeFrames(Multimodal.encodePng(4, 4, 1L)).get.size == 1)
  }

  test("encodeTiff/decodeFrames: multi-PAGE TIFF round-trip, lossless pixels") {
    val (w, h, frames, seed) = (11, 7, 4, 33L)
    val bytes = Multimodal.encodeTiff(w, h, frames, seed)
    // real TIFF container magic (little- or big-endian header)
    val magic = bytes.take(2).map(_ & 0xFF).toSeq
    assert(magic == Seq(0x49, 0x49) || magic == Seq(0x4D, 0x4D))
    val got = Multimodal.decodeFrames(bytes).get
    assert(got.size == frames)
    for (f <- 0 until frames; y <- 0 until h; x <- 0 until w)
      assert((got(f).getRGB(x, y) & 0xFF) ==
        ((seed + 7L * f + 31L * x + 131L * y) % 256).toInt,
        s"page $f pixel ($x,$y)")
  }

  test("frameSampleDecoded is format-generic: mixed GIF + TIFF media") {
    val media = Seq(
        (1L, "video", Multimodal.encodeGif(6, 4, 5, 1L)),
        (2L, "video", Multimodal.encodeTiff(6, 4, 5, 1L)))
      .toDF("id", "media_type", "content")
    val got = Multimodal.frameSampleDecoded(media, n = 3).collect()
      .groupBy(_.id).map { case (k, v) => k -> v.sortBy(_.frame_idx) }
    // same closed form, same pixels — the container must not matter
    assert(got(1L).map(r => (r.src_frame, r.mean_gray)).toSeq ==
      got(2L).map(r => (r.src_frame, r.mean_gray)).toSeq)
    assert(got(1L).zip(got(2L)).forall { case (a, b) =>
      a.gray.toSeq == b.gray.toSeq })
  }

  test("frameSampleDecoded: even sampling rule + exact means over real frames") {
    // 7 frames sampled to 4: src = floor(i*7/4) = 0, 1, 3, 5
    val media = Seq(
        (1L, "video", Multimodal.encodeGif(6, 4, 7, 1L)),
        (2L, "video", Multimodal.encodeGif(5, 3, 2, 2L)), // fewer than n
        (3L, "video", "junk".getBytes("UTF-8")))          // dead-letters
      .toDF("id", "media_type", "content")
    val got = Multimodal.frameSampleDecoded(media, n = 4).collect()
      .groupBy(_.id).map { case (k, v) => k -> v.sortBy(_.frame_idx) }
    assert(!got.contains(3L))
    assert(got(1L).map(_.src_frame).toSeq == Seq(0, 1, 3, 5))
    assert(got(2L).map(_.src_frame).toSeq == Seq(0, 1))
    for (fr <- got(1L)) {
      var sum = 0L
      for (y <- 0 until 4; x <- 0 until 6)
        sum += ((1L + 7L * fr.src_frame + 31L * x + 131L * y) % 256).toInt
      assert(fr.width == 6 && fr.height == 4)
      assert(fr.mean_gray == sum.toDouble / 24)
      assert(fr.gray.length == 24)
    }
  }

  test("decodePcm16: JDK decode returns exactly the generator's samples, mono and stereo") {
    for ((ch, n, seed) <- Seq((1, 100, 5L), (2, 37, 99L))) {
      val wav = Multimodal.encodeWavPcm16(8000, ch, n, seed)
      val got = Multimodal.decodePcm16(wav).get
      assert(got.length == n * ch)
      for (i <- got.indices)
        assert(got(i) == ((seed + 31L * i) & 0x7FFF).toShort, s"sample $i")
    }
  }

  test("decodePcm16: non-audio payloads return None") {
    assert(Multimodal.decodePcm16("not a wav".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.decodePcm16(Multimodal.encodePng(4, 4, 1L)).isEmpty)
  }

  test("audioWaveStats: exact integer folds match a brute-force pass; junk rows drop") {
    val media = Seq(
        (7L, "audio", Multimodal.encodeWavPcm16(8000, 1, 50, 7L)),
        (8L, "audio", "junk".getBytes("UTF-8")))
      .toDF("id", "media_type", "content")
    val rows = Multimodal.audioWaveStats(media, silenceBelow = 512).collect()
    assert(rows.map(_.id).toSeq == Seq(7L))
    val s = rows(0)
    val ref = (0 until 50).map(i => ((7L + 31L * i) & 0x7FFF).toInt)
    assert(s.n_samples == 50)
    assert(s.peak == ref.max)
    assert(s.sum_abs == ref.map(_.toLong).sum)
    assert(s.sum_sq == ref.map(v => v.toLong * v).sum)
    assert(s.n_silent == ref.count(_ < 512))
  }
}
