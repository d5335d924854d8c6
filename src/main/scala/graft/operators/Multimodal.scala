package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed by batched per-partition
  * kernels.
  *
  * IMAGE DECODE IS REAL: `decodeImage` is JDK-builtin
  * `javax.imageio.ImageIO` (the `java.desktop` module ships PNG/JPEG/
  * BMP/GIF readers — zero added dependencies), run headless inside the
  * batch boundary; payloads no registered reader accepts fall back to
  * the documented deterministic stub formula (`decodeImageStub`), so
  * text-derived fixture payloads stay oracle-checkable. Feature
  * extraction (`extractFeatures`) is REAL decoded-pixel work too —
  * per-channel raster histograms, the normalization-stage shape (a
  * learned-model embedding would drop into the same batch boundary;
  * no ML runtime ships in this container). The machinery
  * around the kernels is the scale-relevant part:
  *   - rows flow `Dataset[(id, bytes)] → mapPartitions → grouped(batch)`
  *     — the executor-side batch boundary where a vectorized decoder,
  *     native library, or GPU kernel takes over (the JVM-side equivalent
  *     of `mapInPandas` batches);
  *   - output schemas are typed case classes, so downstream is ordinary
  *     columnar Spark;
  *   - frame sampling is pure codegen'd SQL over the binary payload
  *     (substring on BinaryType), no kernel needed.
  */
object Multimodal {

  // ImageIO must never touch a display; set before any AWT class loads.
  // Executors are separate JVMs in cluster mode — the property is also
  // (re-)set on first use per JVM via this object's initializer running
  // wherever the decode closures deserialize.
  System.setProperty("java.awt.headless", "true")
  // ImageIO's default stream cache is a TEMP FILE per read/write —
  // three syscall-heavy file round-trips per decoded row. Tiny media
  // payloads decode from heap; this is a multi-× win on the decode
  // kernel and what any server-side ImageIO user sets.
  javax.imageio.ImageIO.setUseCache(false)

  /** Rows per decode batch — sized for decoder/accelerator hand-off,
    * not Spark semantics.
    */
  val DecodeBatchSize = 64

  case class ImageMeta(id: Long, width: Int, height: Int, channels: Int)
  case class MediaFeatures(id: Long, features: Array[Float])

  /** REAL decode — JDK ImageIO. None when no registered reader claims
    * the payload (not an image / unsupported container).
    */
  private[graft] def decodeImage(bytes: Array[Byte]): Option[(Int, Int, Int)] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else Some((img.getWidth, img.getHeight, img.getColorModel.getNumComponents))
    } catch { case _: Exception => None }

  /** STUB fallback — deterministic dims from payload length, for
    * payloads that aren't decodable media (text-derived fixtures).
    */
  private def decodeImageStub(bytes: Array[Byte]): (Int, Int, Int) =
    (1 + bytes.length % 640, 1 + bytes.length % 480, 3)

  /** Deterministic tiny truecolor PNG — REAL encoded bytes for
    * fixtures and the oracle-checked decode queries. Pixel (x, y) =
    * seed + 262147x + 40961y folded into 24-bit RGB. The coefficients
    * are sized so the fixture SPANS the 24-bit range at fixture dims
    * (x ≤ 63 → 262147x reaches 16.5M): with the earlier small
    * coefficients every value stayed < 2^16, which left the R channel
    * constant-zero and the R/G histogram bins of [[extractFeatures]]
    * unexercised by the oracle.
    */
  def encodePng(width: Int, height: Int, seed: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        img.setRGB(x, y, ((seed + 262147L * x + 40961L * y) & 0xFFFFFF).toInt)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }


  /** [[encodePng]] with a white `stamp`×`stamp` top-left corner — the
    * "same image plus a logo overlay" near-duplicate shape perceptual
    * hashing exists to catch (byte-level and exact-raster dedup both
    * miss it; aHash flips only the bits of the touched blocks).
    */
  def encodePngStamped(width: Int, height: Int, seed: Long,
      stamp: Int = 4): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val v = if (x < stamp && y < stamp) 0xFFFFFF
          else ((seed + 262147L * x + 40961L * y) & 0xFFFFFF).toInt
        img.setRGB(x, y, v)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  case class AudioMeta(id: Long, sample_rate: Int, channels: Int,
      bits: Int, n_frames: Long)

  /** Deterministic PCM-16 WAV — a REAL RIFF/WAVE container (44-byte
    * canonical header + seeded samples) for fixtures and the
    * oracle-checked audio queries.
    */
  def encodeWavPcm16(sampleRate: Int, channels: Int, nFrames: Int,
      seed: Long): Array[Byte] =
    encodeWavPcm16Samples(sampleRate, channels,
      Array.tabulate(nFrames * channels)(i => ((seed + 31L * i) & 0x7FFF).toShort))

  /** [[encodeWavPcm16]] for caller-supplied samples (spec fixtures:
    * crafted waveforms, gain variants). `samples.length` must be a
    * channel multiple.
    */
  def encodeWavPcm16Samples(sampleRate: Int, channels: Int,
      samples: Array[Short]): Array[Byte] = {
    require(sampleRate > 0 && channels > 0 && samples.length % channels == 0)
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val ascii = java.nio.charset.StandardCharsets.US_ASCII
    bb.put("RIFF".getBytes(ascii)).putInt(36 + dataLen)
      .put("WAVE".getBytes(ascii))
      .put("fmt ".getBytes(ascii)).putInt(16)
      .putShort(1) // PCM
      .putShort(channels.toShort).putInt(sampleRate)
      .putInt(sampleRate * channels * 2) // byte rate
      .putShort((channels * 2).toShort)  // block align
      .putShort(16)                      // bits per sample
      .put("data".getBytes(ascii)).putInt(dataLen)
    var i = 0
    while (i < samples.length) {
      bb.putShort(samples(i))
      i += 1
    }
    bb.array()
  }

  /** The JDK's registered audio container parsers (WAV/AIFF/AU etc.),
    * resolved ONCE per JVM and kept success-ordered.
    * `AudioSystem.getAudioInputStream` re-walks every provider per
    * call, and each non-matching reader signals by THROWING — on a
    * homogeneous 50k-row WAV batch that is 2+ filled-in exception
    * stacks per row before the WAV reader gets asked, which measured
    * ~4× slower than the image kernel on smaller payloads. Caching the
    * provider list and moving the last-successful reader to the front
    * makes the steady state one try, zero exceptions, same REAL JDK
    * parser.
    */
  @transient private lazy val audioReaders =
    new java.util.concurrent.atomic.AtomicReference[List[javax.sound.sampled.spi.AudioFileReader]]({
      import scala.jdk.CollectionConverters._
      java.util.ServiceLoader
        .load(classOf[javax.sound.sampled.spi.AudioFileReader])
        .asScala.toList
    })

  /** REAL audio decode — the JDK's `javax.sound.sampled` readers (see
    * [[audioReaders]] for why not `AudioSystem` directly). None when
    * no installed reader claims the payload.
    */
  private[graft] def decodeAudio(bytes: Array[Byte]): Option[(Int, Int, Int, Long)] = {
    val readers = audioReaders.get()
    var rest = readers
    while (rest.nonEmpty) {
      val r = rest.head
      try {
        val in = r.getAudioInputStream(new java.io.ByteArrayInputStream(bytes))
        val f = in.getFormat
        val out = (f.getSampleRate.toInt, f.getChannels,
          f.getSampleSizeInBits, in.getFrameLength)
        in.close()
        if (r ne readers.head)
          audioReaders.set(r :: readers.filterNot(_ eq r))
        return Some(out)
      } catch { case _: Exception => () }
      rest = rest.tail
    }
    None
  }

  /** Batched audio decode → typed metadata: REAL AudioSystem first,
    * a deterministic length formula for undecodable payloads (the
    * audio analogue of `decodeImageStub`).
    */
  def audioMeta(media: DataFrame): Dataset[AudioMeta] = {
    import media.sparkSession.implicits._
    media.select(col("id"), col("content")).as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(DecodeBatchSize).flatMap { batch =>
        batch.map { case (id, bytes) =>
          val (sr, ch, bits, n) = decodeAudio(bytes)
            .getOrElse((8000, 1, 16, bytes.length.toLong))
          AudioMeta(id, sr, ch, bits, n)
        }
      })
  }

  /** Media table of REAL PCM WAVs, parameters a closed form of the id
    * so a relational oracle verifies the encode→decode round-trip.
    * Repartitioned for the same reason as [[pngMediaFromDocuments]].
    */
  def wavMediaFromDocuments(docs: DataFrame): DataFrame = {
    val gen = udf((id: Long) => encodeWavPcm16(
      sampleRate = 8000 + (id % 8).toInt * 1000,
      channels = 1 + (id % 2).toInt,
      nFrames = 100 + (id % 400).toInt,
      seed = id))
    docs.repartition(docs.sparkSession.sparkContext.defaultParallelism)
      .select(col("doc_id").as("id"),
        lit("audio").as("media_type"),
        gen(col("doc_id")).as("content"))
  }

  case class WaveStats(id: Long, n_samples: Long, peak: Int,
      sum_abs: Long, sum_sq: Long, n_silent: Long)

  /** REAL PCM sample decode: the claimed reader's `AudioInputStream`
    * (not our own header math) yields the decoded frames; 16-bit
    * signed samples are then read in the stream format's endianness.
    * None when no reader claims the payload or it isn't PCM-16.
    */
  private[graft] def decodePcm16(bytes: Array[Byte]): Option[Array[Short]] = {
    val readers = audioReaders.get()
    var rest = readers
    while (rest.nonEmpty) {
      val r = rest.head
      try {
        val in = r.getAudioInputStream(new java.io.ByteArrayInputStream(bytes))
        try {
          val f = in.getFormat
          if (f.getSampleSizeInBits != 16 ||
              f.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED)
            return None
          val data = in.readAllBytes()
          val out = new Array[Short](data.length / 2)
          val bb = java.nio.ByteBuffer.wrap(data).order(
            if (f.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
            else java.nio.ByteOrder.LITTLE_ENDIAN)
          var i = 0
          while (i < out.length) { out(i) = bb.getShort(); i += 1 }
          if (r ne readers.head)
            audioReaders.set(r :: readers.filterNot(_ eq r))
          return Some(out)
        } finally in.close()
      } catch { case _: Exception => () }
      rest = rest.tail
    }
    None
  }

  /** Waveform quality features over REAL decoded PCM — the audio
    * analogue of the text quality signals: sample count, peak
    * amplitude, exact integer |sample| and sample² sums (ratio/RMS
    * math stays in Spark expressions so the oracle's double arithmetic
    * is reproduced operation-for-operation), and the count of samples
    * under the silence threshold (the silent/clipped-clip filter every
    * audio corpus runs). Batched `mapPartitions` kernel, embarrassingly
    * parallel, no shuffle; undecodable / non-PCM-16 payloads are
    * dropped (the fixture generator always round-trips).
    */
  def audioWaveStats(media: DataFrame, silenceBelow: Int = 512): Dataset[WaveStats] = {
    import media.sparkSession.implicits._
    media.select(col("id"), col("content")).as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(DecodeBatchSize).flatMap { batch =>
        batch.flatMap { case (id, bytes) =>
          decodePcm16(bytes).map { samples =>
            var sumAbs = 0L; var sumSq = 0L; var peak = 0; var silent = 0L
            var i = 0
            while (i < samples.length) {
              val a = math.abs(samples(i).toInt)
              if (a > peak) peak = a
              sumAbs += a
              sumSq += a.toLong * a
              if (a < silenceBelow) silent += 1
              i += 1
            }
            WaveStats(id, samples.length.toLong, peak, sumAbs, sumSq, silent)
          }
        }
      })
  }

  /** REAL batched resize kernel: ImageIO decode → Graphics2D scale to
    * fit (maxW, maxH) preserving aspect (scale ≤ 1, floor dims, min 1
    * px) → PNG re-encode → re-decode, emitting the dims of the ACTUAL
    * resized bytes. Undecodable payloads fall back to the clamped stub
    * formula ([[clampMeta]]'s contract). The scale arithmetic is plain
    * IEEE-double floor so an oracle reproduces it exactly.
    */
  def resizeImages(media: DataFrame, maxW: Int, maxH: Int): Dataset[ImageMeta] = {
    import media.sparkSession.implicits._
    require(maxW > 0 && maxH > 0)
    media.select(col("id"), col("content")).as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(DecodeBatchSize).flatMap { batch =>
        batch.map { case (id, bytes) =>
          val img = try {
            javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
          } catch { case _: Exception => null }
          if (img == null) {
            val (w, h, c) = decodeImageStub(bytes)
            ImageMeta(id, math.min(w, maxW), math.min(h, maxH), c)
          } else {
            val s = math.min(1.0, math.min(
              maxW.toDouble / img.getWidth, maxH.toDouble / img.getHeight))
            val nw = math.max(1, math.floor(img.getWidth * s).toInt)
            val nh = math.max(1, math.floor(img.getHeight * s).toInt)
            val scaled = new java.awt.image.BufferedImage(nw, nh,
              java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
            val g = scaled.createGraphics()
            try g.drawImage(img, 0, 0, nw, nh, null) finally g.dispose()
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(scaled, "png", bos)
            val back = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(bos.toByteArray))
            ImageMeta(id, back.getWidth, back.getHeight,
              back.getColorModel.getNumComponents)
          }
        }
      })
  }

  case class PixelStats(id: Long, n_pixels: Long,
      mean_r: Double, mean_g: Double, mean_b: Double)

  /** REAL feature extraction over DECODED PIXELS: per-channel means of
    * the raster — the simplest genuine image statistic (what a
    * normalization stage computes before training). ImageIO decode +
    * raster walk inside the batch boundary; exact integer sums, ONE
    * double division and no rounding — `CAST(sum AS DOUBLE) / n` is
    * the same IEEE-754 operation in every engine, so the oracle
    * matches bit-for-bit (a 6-dp round would instead sit on half-even
    * vs half-away tie behavior exactly where pixel sums can land).
    * Undecodable payloads yield no row (a real feature extractor has
    * nothing to say about non-media bytes — filter semantics, like
    * dead-lettering).
    */
  def pixelStats(media: DataFrame): Dataset[PixelStats] = {
    import media.sparkSession.implicits._
    media.select(col("id"), col("content")).as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(DecodeBatchSize).flatMap { batch =>
        batch.flatMap { case (id, bytes) =>
          val img = try {
            javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
          } catch { case _: Exception => null }
          if (img == null) None
          else {
            var (sr, sg, sb) = (0L, 0L, 0L)
            var y = 0
            while (y < img.getHeight) {
              var x = 0
              while (x < img.getWidth) {
                val v = img.getRGB(x, y)
                sr += (v >> 16) & 0xFF
                sg += (v >> 8) & 0xFF
                sb += v & 0xFF
                x += 1
              }
              y += 1
            }
            val n = img.getWidth.toLong * img.getHeight
            Some(PixelStats(id, n,
              sr.toDouble / n, sg.toDouble / n, sb.toDouble / n))
          }
        }
      })
  }

  case class AHashRow(id: Long, ahash: Long)

  /** Perceptual average-hash (aHash) over DECODED pixels — the
    * image-level near-dup fingerprint (the classic 8×8 mean-threshold
    * hash): partition the raster into an 8×8 grid, bit(block) =
    * "block mean luma > image mean luma", 64 bits → one long.
    *
    * All comparisons are EXACT cross-multiplied integers
    * (blockSum·nPixels > totalSum·nBlock — no double mean, no
    * rounding), so every bit is reproducible from the synthetic
    * raster formula by the SQL oracle, and the hash is provably
    * invariant under uniform brightness shift (S_b+n_b·d)·N >
    * (S+N·d)·n_b ⟺ S_b·N > S·n_b — the "perceptual" property,
    * pinned by spec rather than hand-waved. Grid cells an image
    * narrower than 8 px never touches contribute 0 > 0 = false,
    * deterministically. The 64 per-image threshold comparisons run in
    * BigInt so the exactness claim holds at any raster size.
    *
    * Scale shape: one batched decode kernel (same boundary as
    * [[pixelStats]]), one long per image out — grouping/joining on
    * the hash afterwards shuffles 16 bytes per image, never pixels.
    * Undecodable payloads yield no row (filter semantics).
    */
  def aHash64(media: DataFrame): Dataset[AHashRow] = {
    import media.sparkSession.implicits._
    media.select(col("id"), col("content")).as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(DecodeBatchSize).flatMap { batch =>
        batch.flatMap { case (id, bytes) =>
          val img = try {
            javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
          } catch { case _: Exception => null }
          if (img == null) None
          else {
            val (w, h) = (img.getWidth, img.getHeight)
            val bs = new Array[Long](64)
            val bn = new Array[Long](64)
            var tot = 0L
            var y = 0
            while (y < h) {
              var x = 0
              val by = y * 8 / h
              while (x < w) {
                val v = img.getRGB(x, y)
                val g = ((v >> 16) & 0xFF) + ((v >> 8) & 0xFF) + (v & 0xFF)
                val i = by * 8 + x * 8 / w
                bs(i) += g; bn(i) += 1; tot += g
                x += 1
              }
              y += 1
            }
            val n = w.toLong * h
            var hash = 0L
            var i = 0
            // 64 BigInt comparisons per IMAGE: exact at any raster size
            // (long cross-products would overflow near gigapixel dims)
            while (i < 64) {
              if (BigInt(bs(i)) * n > BigInt(tot) * bn(i)) hash |= 1L << i
              i += 1
            }
            Some(AHashRow(id, hash))
          }
        }
      })
  }

  case class PHashRow(id: Long, phash: Long)

  /** Integer DCT-II basis, the one table BOTH engines use: T(p)(u) =
    * round(cos(π·(2u+1)·p/64) · 2^14) for kept frequency p ∈ 0..7 and
    * cell index u ∈ 0..31. Computed once here and INLINED as literals
    * into the SQL oracle, so cross-engine cosine/rounding ULP can
    * never flip a bit — the fixed-point trick every integer-DCT codec
    * (JPEG's AAN/LLM kernels) uses to make transforms bit-exact.
    */
  val DctTable: Array[Array[Long]] = Array.tabulate(8, 32) { (p, u) =>
    Math.round(Math.cos(Math.PI * (2 * u + 1) * p / 64.0) * 16384.0)
  }

  /** Perceptual DCT hash (pHash) over DECODED pixels — the
    * low-frequency companion to [[aHash64]]: bin the raster into a
    * 32×32 cell grid of luma SUMS, take the 2-D DCT-II restricted to
    * the 8×8 lowest frequencies with the fixed-point [[DctTable]], and
    * set bit p·8+q iff coefficient C(p,q) is STRICTLY above the lower
    * median (the 32nd-smallest of the 64). Everything after decode is
    * exact integer arithmetic — integer cell binning (cu = x·32/w),
    * integer basis, integer products, a rank-statistic threshold — so
    * the SQL oracle reproduces every bit from the raster formula, the
    * same guarantee aHash carries.
    *
    * Two deliberate deviations from textbook pHash, both in service of
    * exactness: cells carry luma SUMS, not means (means of unevenly
    * sized cells are rationals with per-cell denominators — a common
    * positive rescale per image preserves the >-median bits only when
    * the scale is uniform, which sums are and means are not), and the
    * threshold is the deterministic lower median (no "average of two
    * middles" double). The hash keys on low-frequency structure where
    * aHash keys on local block brightness — a second, decorrelated
    * fingerprint family over the same 16-byte/image pair machinery
    * ([[Dedup.fingerprintHammingPairs]]).
    *
    * Scale shape: identical to aHash — one batched decode kernel, 65k
    * integer multiply-adds per image (1024 cells × 64 coefficients),
    * one long out; downstream joins hashes, never pixels. Coefficient
    * accumulation runs in Long up to 32 Mpixel rasters (|T·T·Σluma| ≤
    * 2^28·765·N < 2^63) and BigInt beyond, so the exactness claim has
    * no size cliff. Undecodable payloads yield no row.
    */
  def pHash64(media: DataFrame): Dataset[PHashRow] = {
    import media.sparkSession.implicits._
    media.select(col("id"), col("content")).as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(DecodeBatchSize).flatMap { batch =>
        batch.flatMap { case (id, bytes) =>
          val img = try {
            javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
          } catch { case _: Exception => null }
          if (img == null) None
          else {
            val (w, h) = (img.getWidth, img.getHeight)
            val cells = new Array[Long](1024) // cu*32 + cv luma sums
            var y = 0
            while (y < h) {
              val cv = y * 32 / h
              var x = 0
              while (x < w) {
                val v = img.getRGB(x, y)
                val g = ((v >> 16) & 0xFF) + ((v >> 8) & 0xFF) + (v & 0xFF)
                cells((x * 32 / w) * 32 + cv) += g
                x += 1
              }
              y += 1
            }
            var hash = 0L
            if (w.toLong * h <= (1L << 25)) {
              val c = new Array[Long](64)
              var cu = 0
              while (cu < 32) {
                var cv = 0
                while (cv < 32) {
                  val s = cells(cu * 32 + cv)
                  if (s != 0L) {
                    var p = 0
                    while (p < 8) {
                      val tp = DctTable(p)(cu) * s
                      var q = 0
                      while (q < 8) {
                        c(p * 8 + q) += tp * DctTable(q)(cv)
                        q += 1
                      }
                      p += 1
                    }
                  }
                  cv += 1
                }
                cu += 1
              }
              val med = c.sorted.apply(31)
              var i = 0
              while (i < 64) {
                if (c(i) > med) hash |= 1L << i
                i += 1
              }
            } else {
              // gigapixel path: same arithmetic, arbitrary precision
              val c = Array.fill(64)(BigInt(0))
              for (cu <- 0 until 32; cv <- 0 until 32) {
                val s = cells(cu * 32 + cv)
                if (s != 0L)
                  for (p <- 0 until 8; q <- 0 until 8)
                    c(p * 8 + q) += BigInt(DctTable(p)(cu)) * s * DctTable(q)(cv)
              }
              val med = c.sorted.apply(31)
              for (i <- 0 until 64) if (c(i) > med) hash |= 1L << i
            }
            Some(PHashRow(id, hash))
          }
        }
      })
  }

  case class AudioFingerprint(id: Long, afp: Long)

  /** Energy-profile audio fingerprint over REAL decoded PCM — the
    * audio analogue of [[aHash64]]: 64 contiguous sample windows
    * (window(i) = i·64/n), bit = "window energy above the clip's mean
    * energy", compared as exact cross-multiplied integer sums of
    * sample² (no doubles, no rounding — every bit reproducible by the
    * sample-law oracle). Because energy scales quadratically and
    * UNIFORMLY under gain, the fingerprint is exactly invariant under
    * integer volume scaling (c²·S_w·N > c²·S·n_w ⟺ S_w·N > S·n_w)
    * until clipping — the perceptual property, spec-pinned. Empty
    * clips fingerprint to 0. One long per clip out of the batched
    * decode kernel; downstream dedup joins hashes, never waveforms
    * (pair machinery: [[Dedup.fingerprintHammingPairs]]).
    */
  def audioFingerprint64(media: DataFrame): Dataset[AudioFingerprint] = {
    import media.sparkSession.implicits._
    media.select(col("id"), col("content")).as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(DecodeBatchSize).flatMap { batch =>
        batch.flatMap { case (id, bytes) =>
          decodePcm16(bytes).map { samples =>
            val n = samples.length.toLong
            var hash = 0L
            if (n > 0) {
              val ws = new Array[Long](64)
              val wn = new Array[Long](64)
              var tot = 0L
              var i = 0
              while (i < samples.length) {
                val a = samples(i).toLong
                val e = a * a
                val w = (i * 64L / n).toInt
                ws(w) += e; wn(w) += 1; tot += e
                i += 1
              }
              // 64 BigInt comparisons per CLIP (not per sample): exact
              // at any clip length — long cross-products would overflow
              // past ~2^21 full-scale samples (a ~50 s clip at 44.1 kHz)
              var b = 0
              while (b < 64) {
                if (BigInt(ws(b)) * n > BigInt(tot) * wn(b)) hash |= 1L << b
                b += 1
              }
            }
            AudioFingerprint(id, hash)
          }
        }
      })
  }

  /** Media table derived from `documents`: the text bytes stand in for
    * an encoded image/video payload (`media_type` tagged by caller).
    */
  def mediaFromDocuments(docs: DataFrame, mediaType: String): DataFrame =
    docs.select(col("doc_id").as("id"),
      lit(mediaType).as("media_type"),
      encode(col("text"), "UTF-8").as("content"))

  /** Media table of REAL encoded PNGs, dims a closed form of the id
    * (width = 1 + id % 64, height = 1 + id % 48) so a relational oracle
    * can verify the decode round-trip without being able to decode.
    *
    * The input is REPARTITIONED to the session's default parallelism
    * first: encode/decode are CPU-bound per-row kernels, and a small
    * single-file corpus arrives as ONE input split — without the
    * spread, every downstream media kernel runs single-threaded
    * regardless of cluster size. (The standard pattern before any
    * expensive per-row stage; at real scale many input files make it
    * a near-no-op.)
    */
  def pngMediaFromDocuments(docs: DataFrame): DataFrame = {
    val gen = udf((id: Long) =>
      encodePng(1 + (id % 64).toInt, 1 + (id % 48).toInt, seed = id))
    docs.repartition(docs.sparkSession.sparkContext.defaultParallelism)
      .select(col("doc_id").as("id"),
        lit("image").as("media_type"),
        gen(col("doc_id")).as("content"))
  }

  /** Batched image decode → typed metadata: REAL ImageIO first, stub
    * formula for undecodable payloads.
    */
  def imageMeta(media: DataFrame): Dataset[ImageMeta] = {
    import media.sparkSession.implicits._
    media.select(col("id"), col("content")).as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(DecodeBatchSize).flatMap { batch =>
        // batch boundary: a vectorized decoder would process `batch`
        // in one call; ImageIO decodes per element within it
        batch.map { case (id, bytes) =>
          val (w, h, c) = decodeImage(bytes).getOrElse(decodeImageStub(bytes))
          ImageMeta(id, w, h, c)
        }
      })
  }

  /** REAL batched feature extraction → fixed-dim float vector per
    * row: decode the image and histogram the raster per channel —
    * `bins` buckets of width 256/bins each for R, G, B, normalized by
    * pixel count. Layout: features[c·bins + b] = |{pixels: channel c
    * in bucket b}| / n. This is the normalization-stage feature shape
    * (a channel-distribution summary) computed from DECODED PIXELS,
    * not a length formula; the exact-integer counts and the single
    * double division then float32 narrowing are the same IEEE-754
    * operations in every engine, so the oracle matches bit-for-bit.
    * Undecodable payloads yield no row (filter semantics, like
    * [[pixelStats]]).
    */
  def extractFeatures(media: DataFrame, bins: Int = 4): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    require(bins > 0 && 256 % bins == 0, s"bins must divide 256: $bins")
    val width = 256 / bins
    media.select(col("id"), col("content")).as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(DecodeBatchSize).flatMap { batch =>
        batch.flatMap { case (id, bytes) =>
          val img = try {
            javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
          } catch { case _: Exception => null }
          if (img == null) None
          else {
            val counts = new Array[Long](3 * bins)
            var y = 0
            while (y < img.getHeight) {
              var x = 0
              while (x < img.getWidth) {
                val v = img.getRGB(x, y)
                counts(((v >> 16) & 0xFF) / width) += 1
                counts(bins + (((v >> 8) & 0xFF) / width)) += 1
                counts(2 * bins + ((v & 0xFF) / width)) += 1
                x += 1
              }
              y += 1
            }
            val n = img.getWidth.toLong * img.getHeight
            Some(MediaFeatures(id, counts.map(c => (c.toDouble / n).toFloat)))
          }
        }
      })
  }

  /** Resize plan step: pure metadata transform (a real resize would be
    * another batched kernel over content + meta).
    */
  def clampMeta(meta: Dataset[ImageMeta], maxW: Int, maxH: Int): DataFrame =
    meta.toDF().select(col("id"),
      least(col("width"), lit(maxW)).as("width"),
      least(col("height"), lit(maxH)).as("height"),
      col("channels"))

  /** Deterministic multi-frame grayscale GIF — REAL container bytes
    * from the JDK's GIF sequence writer (the one multi-frame format
    * `javax.imageio` both writes and reads in-container). Frames are
    * 8-bit indexed with an explicit 256-gray palette, so the encode→
    * decode round-trip is LOSSLESS (no quantizer involved): frame f
    * pixel (x, y) = (seed + 7f + 31x + 131y) mod 256, the closed form
    * the frame-level oracles recompute.
    */
  def encodeGif(width: Int, height: Int, nFrames: Int, seed: Long): Array[Byte] =
    encodeFrameSequence("gif", width, height, nFrames, seed)

  /** Deterministic multi-PAGE grayscale TIFF via the JDK's TIFF plugin
    * (bundled since Java 9) — same closed-form pixels and same indexed
    * 256-gray palette as [[encodeGif]], so the decode round-trip is
    * lossless and the same frame-level oracles apply. Proves the frame
    * kernel ([[decodeFrames]] → [[frameSampleDecoded]]) is
    * format-generic, not GIF-specific.
    */
  def encodeTiff(width: Int, height: Int, nFrames: Int, seed: Long): Array[Byte] =
    encodeFrameSequence("tiff", width, height, nFrames, seed)

  /** Shared multi-frame encoder behind [[encodeGif]]/[[encodeTiff]]:
    * any ImageIO writer whose container supports in-file sequences
    * (`canWriteSequence`). Frames are 8-bit indexed over an explicit
    * 256-gray palette so no quantizer or colorspace transform touches
    * the pixel values in either direction.
    */
  private def encodeFrameSequence(format: String, width: Int, height: Int,
      nFrames: Int, seed: Long): Array[Byte] = {
    require(width > 0 && height > 0 && nFrames > 0 && seed >= 0)
    val grays = Array.tabulate(256)(_.toByte)
    val cm = new java.awt.image.IndexColorModel(8, 256, grays, grays, grays)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName(format).next()
    require(writer.canWriteSequence, s"$format writer lacks sequence support")
    // the JDK GIF writer's default progressive mode writes INTERLACED
    // frames, and the de-interlace round-trip is wrong for tiny frame
    // heights (rows permuted, last row dropped) — sequential scan
    // order is also what the closed-form oracle assumes
    val param = writer.getDefaultWriteParam
    if (param.canWriteProgressive)
      param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DISABLED)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      var f = 0
      while (f < nFrames) {
        val img = new java.awt.image.BufferedImage(width, height,
          java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
        val raster = img.getRaster
        var y = 0
        while (y < height) {
          var x = 0
          while (x < width) {
            raster.setSample(x, y, 0,
              ((seed + 7L * f + 31L * x + 131L * y) % 256).toInt)
            x += 1
          }
          y += 1
        }
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), param)
        f += 1
      }
      writer.endWriteSequence()
    } finally writer.dispose()
    ios.close()
    bos.toByteArray
  }

  /** REAL multi-frame container decode, FORMAT-GENERIC: content-sniff
    * the payload (`ImageIO.getImageReaders` over the stream — magic
    * bytes, not extensions), then read every frame/page the container
    * holds by index. Multi-frame GIF and multi-page TIFF both decode
    * fully; single-frame formats (PNG/JPEG/BMP) yield one frame. None
    * when no registered reader recognizes the bytes or decode fails.
    */
  private[graft] def decodeFrames(
      bytes: Array[Byte]): Option[IndexedSeq[java.awt.image.BufferedImage]] = {
    val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val readers = javax.imageio.ImageIO.getImageReaders(iis)
    if (!readers.hasNext) return None
    val reader = readers.next()
    try {
      reader.setInput(iis, false, true)
      val n = reader.getNumImages(true)
      if (n <= 0) None else Some((0 until n).map(reader.read))
    } catch { case _: Exception => None }
    finally reader.dispose()
  }

  case class DecodedFrame(id: Long, frame_idx: Int, src_frame: Int,
      width: Int, height: Int, mean_gray: Double, gray: Array[Byte])

  /** REAL frame sampling over DECODED video frames (vs [[frameSample]]
    * 's byte-slice fallback for containers the JVM can't decode):
    * container-decode all frames in the batched kernel, keep
    * k = min(n, frames) of them evenly (src = ⌊i·frames/k⌋ — exact
    * integer arithmetic an oracle reproduces), and emit each sampled
    * frame's dims, gray raster, and mean level. Undecodable payloads
    * yield no row; route those to [[frameSample]] if byte slices are
    * an acceptable degraded mode.
    */
  def frameSampleDecoded(media: DataFrame, n: Int): Dataset[DecodedFrame] = {
    require(n > 0, s"n must be positive: $n")
    import media.sparkSession.implicits._
    media.select(col("id"), col("content")).as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(DecodeBatchSize).flatMap { batch =>
        batch.flatMap { case (id, bytes) =>
          decodeFrames(bytes).toSeq.flatMap { frames =>
            val k = math.min(n, frames.size)
            (0 until k).map { i =>
              val src = i * frames.size / k
              val img = frames(src)
              val (w, h) = (img.getWidth, img.getHeight)
              val gray = new Array[Byte](w * h)
              var sum = 0L
              var y = 0
              while (y < h) {
                var x = 0
                while (x < w) {
                  val g = img.getRGB(x, y) & 0xFF
                  sum += g
                  gray(y * w + x) = g.toByte
                  x += 1
                }
                y += 1
              }
              DecodedFrame(id, i, src, w, h,
                sum.toDouble / (w.toLong * h), gray)
            }
          }
        }
      })
  }

  /** Media table of REAL multi-frame GIFs, every parameter a closed
    * form of the id (width = 1 + id%32, height = 1 + id%24, frames =
    * 2 + id%7, seed = id) so a relational oracle verifies frame
    * sampling and frame dedup over actually-decoded frames.
    * Repartitioned for the same reason as [[pngMediaFromDocuments]].
    */
  def gifMediaFromDocuments(docs: DataFrame): DataFrame = {
    val gen = udf((id: Long) => encodeGif(
      width = 1 + (id % 32).toInt,
      height = 1 + (id % 24).toInt,
      nFrames = 2 + (id % 7).toInt,
      seed = id))
    docs.repartition(docs.sparkSession.sparkContext.defaultParallelism)
      .select(col("doc_id").as("id"),
        lit("video").as("media_type"),
        gen(col("doc_id")).as("content"))
  }

  /** Media table of REAL multi-page TIFFs — the [[gifMediaFromDocuments]]
    * construction through the JDK's TIFF plugin, with coprime moduli
    * (17/13/5 vs GIF's 32/24/7) so the two tables exercise different
    * frame shapes. One closed-form oracle verifies the whole
    * encode → sniff → page-decode → sample chain on a second container
    * format.
    */
  def tiffMediaFromDocuments(docs: DataFrame): DataFrame = {
    val gen = udf((id: Long) => encodeTiff(
      width = 1 + (id % 17).toInt,
      height = 1 + (id % 13).toInt,
      nFrames = 2 + (id % 5).toInt,
      seed = id))
    docs.repartition(docs.sparkSession.sparkContext.defaultParallelism)
      .select(col("doc_id").as("id"),
        lit("video").as("media_type"),
        gen(col("doc_id")).as("content"))
  }

  /** Frame sampling: split the payload into `n` equal byte slices —
    * codegen'd binary ops only (substring on BinaryType), one narrow
    * stage. Output: (id, frame_idx, frame bytes).
    */
  def frameSample(media: DataFrame, n: Int): DataFrame =
    media
      .withColumn("flen", expr(s"(octet_length(content) + ${n - 1}) div $n"))
      .select(col("id"),
        posexplode(expr(
          s"transform(sequence(0, ${n - 1}), i -> substring(content, i * flen + 1, flen))"))
          .as(Seq("frame_idx", "frame")))
      .filter(octet_length(col("frame")) > 0)
}
