package graft.queries

import graft.operators.{Dedup, Multimodal}
import graft.queries.Catalog.OrderByOnce
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Oracle-checked multimodal-plumbing queries. `mm_image_meta` runs
  * the REAL JDK ImageIO decoder over real encoded PNG bytes — the
  * payload dims are a closed form of the id, so DuckDB verifies the
  * encode→decode round-trip without decoding anything. The remaining
  * kernels are deterministic stubs over payload byte length (documents
  * are ASCII, so byte length = length(text)), which lets DuckDB
  * reproduce the arithmetic while the Spark side exercises the real
  * plumbing (binary columns, batched mapPartitions kernels, typed
  * schemas).
  */
object MultimodalQueries {

  /** Decoded GIF frames for the documents corpus PLUS the injected
    * byte-identical id+100000 copies (docs with id < 50), decoded ONCE
    * per JVM per sf dir via [[QueryMemo]]. mm_frame_sample_real and
    * mm_frame_dedup_real are two views of this one relation — a real
    * pipeline decodes media once and fans out, and the duplicate
    * payloads still go through the REAL decoder (so "byte-identical
    * GIFs decode to pixel-identical rasters" stays an executed fact,
    * not an assumption). mm_frame_sample_tiff decodes a different
    * container (its own media) and stays standalone. The extra ≤50
    * duplicate decodes the sample view doesn't need cost ~1% of the
    * kernel; sharing saves a full second decode pass (round-12 driver
    * bench: sample_real 9.8 s + dedup_real inside the ~27 s family).
    */
  private def gifFramesWithDups(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    QueryMemo.materialized(s, s"mm_gif_frames|$dir") {
      val media = Multimodal.gifMediaFromDocuments(Tables.documents(s, dir))
      val withDups = media.unionByName(
        media.filter(col("id") < 50)
          .select((col("id") + 100000).as("id"), col("media_type"),
            col("content")))
      Multimodal.frameSampleDecoded(withDups, n = 4).toDF()
    }

  val all: Seq[Q] = Seq(

    // REAL decode: per row the engine ENCODES a truecolor PNG of
    // closed-form dims (1 + id%64 × 1 + id%48) and DECODES it back
    // with javax.imageio inside the batched kernel; the oracle only
    // checks the closed form — any encoder/decoder disagreement on
    // actual pixels/dims/channels goes red
    Q("mm_image_meta",
      (s, dir) => Multimodal.imageMeta(
        Multimodal.pngMediaFromDocuments(Tables.documents(s, dir)))
        .toDF()
        .orderByOnce(col("id")),
      Some("""SELECT doc_id AS id,
             |       CAST(1 + doc_id % 64 AS INTEGER) AS width,
             |       CAST(1 + doc_id % 48 AS INTEGER) AS height,
             |       3 AS channels
             |FROM documents ORDER BY id""".stripMargin),
      doc = "REAL ImageIO round-trip: encode PNG -> batched ImageIO decode -> typed metadata, dims oracle-pinned"),

    // REAL pixel-level features: the engine decodes each PNG and walks
    // the raster for per-channel means; the oracle recomputes them
    // from the fixture's closed-form pixel function (seed + 262147x +
    // 40961y folded into 24-bit RGB) without ever decoding — lossless
    // PNG + exact integer sums + one IEEE division make it bit-exact
    Q("mm_pixel_stats",
      (s, dir) => Multimodal.pixelStats(
        Multimodal.pngMediaFromDocuments(Tables.documents(s, dir)))
        .toDF()
        .orderByOnce(col("id")),
      Some("""WITH d AS (SELECT doc_id, CAST(1 + doc_id % 64 AS BIGINT) AS w,
             |                  CAST(1 + doc_id % 48 AS BIGINT) AS h
             |           FROM documents),
             |xs AS (SELECT doc_id, w, h, unnest(range(0, w)) AS x FROM d),
             |px AS (SELECT doc_id, w, h, x, unnest(range(0, h)) AS y FROM xs),
             |v AS (SELECT doc_id, w, h,
             |             (doc_id + 262147 * x + 40961 * y) % 16777216 AS v
             |      FROM px),
             |a AS (SELECT doc_id, w * h AS n_pixels,
             |             sum(v // 65536) AS sr,
             |             sum((v // 256) % 256) AS sg,
             |             sum(v % 256) AS sb
             |      FROM v GROUP BY doc_id, w, h)
             |SELECT doc_id AS id, n_pixels,
             |       CAST(sr AS DOUBLE) / n_pixels AS mean_r,
             |       CAST(sg AS DOUBLE) / n_pixels AS mean_g,
             |       CAST(sb AS DOUBLE) / n_pixels AS mean_b
             |FROM a ORDER BY id""".stripMargin),
      doc = "REAL decoded-pixel statistics: per-channel raster means vs the closed-form pixel oracle, bit-exact"),

    // REAL audio decode: per row the engine ENCODES a canonical PCM-16
    // RIFF/WAVE container (rate/channels/frames a closed form of the
    // id) and DECODES it back with JDK javax.sound.sampled inside the
    // batched kernel; the oracle checks only the closed form
    Q("mm_audio_meta",
      (s, dir) => Multimodal.audioMeta(
        Multimodal.wavMediaFromDocuments(Tables.documents(s, dir)))
        .toDF()
        .orderByOnce(col("id")),
      Some("""SELECT doc_id AS id,
             |       CAST(8000 + (doc_id % 8) * 1000 AS INTEGER) AS sample_rate,
             |       CAST(1 + doc_id % 2 AS INTEGER) AS channels,
             |       16 AS bits,
             |       CAST(100 + doc_id % 400 AS BIGINT) AS n_frames
             |FROM documents ORDER BY id""".stripMargin),
      doc = "REAL AudioSystem round-trip: encode PCM WAV -> batched JDK decode -> typed metadata, params oracle-pinned"),

    // REAL waveform analysis: the kernel parses the WAV container with
    // the JDK reader and folds the DECODED samples into exact integer
    // sums; the generator's sample law ((id + 31·i) & 0x7FFF) lets the
    // oracle recompute peak/mean/RMS/silence from documents alone. All
    // ratio arithmetic happens in Spark expressions over the exact
    // sums, mirroring the oracle's ops one-for-one.
    Q("mm_audio_wave_stats",
      (s, dir) => Multimodal.audioWaveStats(
          Multimodal.wavMediaFromDocuments(Tables.documents(s, dir)))
        .toDF()
        .select(col("id"), col("n_samples"), col("peak"),
          round(col("sum_abs") / col("n_samples").cast("double"), 6)
            .as("mean_abs"),
          round(sqrt(col("sum_sq") / col("n_samples").cast("double")), 6)
            .as("rms"),
          round(col("n_silent") / col("n_samples").cast("double"), 6)
            .as("silence_ratio"))
        .orderByOnce(col("id")),
      Some("""WITH p AS (SELECT doc_id,
             |             CAST((100 + doc_id % 400) * (1 + doc_id % 2) AS BIGINT) AS ns
             |           FROM documents),
             |s AS (SELECT doc_id, ns, ((doc_id + 31 * i) & 32767) AS v
             |      FROM (SELECT doc_id, ns, unnest(range(0, ns)) AS i FROM p))
             |SELECT doc_id AS id, ns AS n_samples,
             |       CAST(max(v) AS INTEGER) AS peak,
             |       round(sum(v) / CAST(ns AS DOUBLE), 6) AS mean_abs,
             |       round(sqrt(sum(v * v) / CAST(ns AS DOUBLE)), 6) AS rms,
             |       round(sum(CASE WHEN v < 512 THEN 1 ELSE 0 END)
             |             / CAST(ns AS DOUBLE), 6) AS silence_ratio
             |FROM s GROUP BY doc_id, ns ORDER BY id""".stripMargin),
      doc = "REAL PCM decode -> waveform quality features (peak/mean/RMS/silence), sample-law oracled"),

    // REAL resize: decode -> Graphics2D scale-to-fit (IEEE floor
    // arithmetic the oracle reproduces) -> PNG re-encode -> re-decode;
    // the emitted dims come from the RESIZED BYTES, not the formula
    Q("mm_resize_real",
      (s, dir) => Multimodal.resizeImages(
        Multimodal.pngMediaFromDocuments(Tables.documents(s, dir)),
        maxW = 32, maxH = 32)
        .toDF()
        .orderByOnce(col("id")),
      Some("""WITH d AS (SELECT doc_id,
             |                  CAST(1 + doc_id % 64 AS DOUBLE) AS w,
             |                  CAST(1 + doc_id % 48 AS DOUBLE) AS h
             |           FROM documents),
             |s AS (SELECT doc_id, w, h,
             |             LEAST(1.0, 32.0 / w, 32.0 / h) AS sc
             |      FROM d)
             |SELECT doc_id AS id,
             |       CAST(GREATEST(1, FLOOR(w * sc)) AS INTEGER) AS width,
             |       CAST(GREATEST(1, FLOOR(h * sc)) AS INTEGER) AS height,
             |       3 AS channels
             |FROM s ORDER BY id""".stripMargin),
      doc = "REAL batched resize kernel: decode -> scale-to-fit -> re-encode -> re-decode, dims from the actual bytes"),

    // stub-fallback path kept oracled on purpose: text payloads are
    // not decodable media, so imageMeta falls back to the documented
    // length formula — this query pins that fallback contract
    Q("mm_resize_meta",
      (s, dir) => Multimodal.clampMeta(
        Multimodal.imageMeta(
          Multimodal.mediaFromDocuments(Tables.documents(s, dir), "image")),
        maxW = 256, maxH = 256)
        .orderByOnce(col("id")),
      Some("""SELECT doc_id AS id,
             |       CAST(least(1 + length(text) % 640, 256) AS INTEGER) AS width,
             |       CAST(least(1 + length(text) % 480, 256) AS INTEGER) AS height,
             |       3 AS channels
             |FROM documents ORDER BY id""".stripMargin),
      doc = "resize plan step over decoded metadata"),

    // REAL feature extraction: decode each PNG, histogram the raster
    // per channel (4 buckets × R,G,B = a 12-dim vector), emit EVERY
    // dimension exploded; the oracle recomputes the full histogram
    // from the closed-form pixel function. Exact integer counts, one
    // double division, one float32 narrowing — bit-exact both sides.
    Q("mm_features",
      (s, dir) => {
        val f = Multimodal.extractFeatures(
          Multimodal.pngMediaFromDocuments(Tables.documents(s, dir)), bins = 4)
        f.toDF()
          .select(col("id"), posexplode(col("features")).as(Seq("j", "share")))
          .select(col("id"), col("j").cast("int").as("j"),
            col("share").cast("double").as("share"))
          .orderByOnce(col("id"), col("j"))
      },
      Some("""WITH d AS (SELECT doc_id, CAST(1 + doc_id % 64 AS BIGINT) AS w,
             |                  CAST(1 + doc_id % 48 AS BIGINT) AS h
             |           FROM documents),
             |xs AS (SELECT doc_id, w, h, unnest(range(0, w)) AS x FROM d),
             |px AS (SELECT doc_id, w, h, x, unnest(range(0, h)) AS y FROM xs),
             |v AS (SELECT doc_id, w * h AS n,
             |             (doc_id + 262147 * x + 40961 * y) % 16777216 AS v
             |      FROM px),
             |ch AS (SELECT doc_id, n, 0 AS c, v // 65536 AS val FROM v
             |       UNION ALL SELECT doc_id, n, 1, (v // 256) % 256 FROM v
             |       UNION ALL SELECT doc_id, n, 2, v % 256 FROM v),
             |b AS (SELECT doc_id, c, (val * 4) // 256 AS bin, count(*) AS cnt
             |      FROM ch GROUP BY 1, 2, 3),
             |g AS (SELECT DISTINCT d.doc_id, d.w * d.h AS n, cc.c, bb.bin
             |      FROM d, (SELECT unnest(range(0, 3)) AS c) cc,
             |              (SELECT unnest(range(0, 4)) AS bin) bb)
             |SELECT g.doc_id AS id, CAST(g.c * 4 + g.bin AS INTEGER) AS j,
             |       CAST(CAST(CAST(coalesce(b.cnt, 0) AS DOUBLE) / g.n AS FLOAT) AS DOUBLE) AS share
             |FROM g LEFT JOIN b ON g.doc_id = b.doc_id AND g.c = b.c AND g.bin = b.bin
             |ORDER BY id, j""".stripMargin),
      doc = "REAL feature extraction: decoded-pixel per-channel histograms vs the closed-form oracle, bit-exact"),

    Q("mm_frame_sample",
      (s, dir) => Multimodal.frameSample(
        Multimodal.mediaFromDocuments(Tables.documents(s, dir), "video"), n = 4)
        .select(col("id"), col("frame_idx"),
          octet_length(col("frame")).as("frame_len"))
        .orderBy(col("id"), col("frame_idx")),
      Some("""WITH f AS (SELECT doc_id, length(text) AS L,
             |                  (length(text) + 3) // 4 AS flen
             |           FROM documents)
             |SELECT doc_id AS id, CAST(i AS INTEGER) AS frame_idx,
             |       CAST(least(flen, L - i * flen) AS INTEGER) AS frame_len
             |FROM (SELECT doc_id, L, flen, unnest(generate_series(0, 3)) AS i FROM f)
             |WHERE L - i * flen > 0
             |ORDER BY id, frame_idx""".stripMargin),
      doc = "video frame sampling: binary substring slices, codegen only"),

    // REAL frame sampling: per row the engine ENCODES a multi-frame
    // grayscale GIF (dims/frame-count/pixels closed forms of the id),
    // container-DECODES every frame with the JDK GIF reader inside the
    // batched kernel, samples k = min(4, frames) evenly, and emits the
    // decoded dims + exact raster mean; the oracle recomputes all of
    // it from the closed form without decoding. One IEEE division both
    // sides — bit-exact.
    Q("mm_frame_sample_real",
      (s, dir) => gifFramesWithDups(s, dir)
        .filter(col("id") < 100000)
        .select(col("id"), col("frame_idx"), col("src_frame"),
          col("width"), col("height"), col("mean_gray"))
        .orderBy(col("id"), col("frame_idx")),
      Some("""WITH d AS (SELECT doc_id, CAST(1 + doc_id % 32 AS BIGINT) AS w,
             |                  CAST(1 + doc_id % 24 AS BIGINT) AS h,
             |                  CAST(2 + doc_id % 7 AS BIGINT) AS fc
             |           FROM documents),
             |k AS (SELECT *, least(4, fc) AS k FROM d),
             |i AS (SELECT doc_id, w, h, fc, k, unnest(range(0, k)) AS i FROM k),
             |fr AS (SELECT doc_id, w, h, i, (i * fc) // k AS src FROM i),
             |xs AS (SELECT doc_id, w, h, i, src, unnest(range(0, w)) AS x FROM fr),
             |px AS (SELECT doc_id, w, h, i, src, x, unnest(range(0, h)) AS y FROM xs),
             |a AS (SELECT doc_id, i, src, w, h,
             |             sum((doc_id + 7 * src + 31 * x + 131 * y) % 256) AS s
             |      FROM px GROUP BY 1, 2, 3, 4, 5)
             |SELECT doc_id AS id, CAST(i AS INTEGER) AS frame_idx,
             |       CAST(src AS INTEGER) AS src_frame,
             |       CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
             |       CAST(s AS DOUBLE) / (w * h) AS mean_gray
             |FROM a ORDER BY id, frame_idx""".stripMargin),
      doc = "REAL multi-frame decode: encode GIF -> JDK frame-by-frame decode -> even sample -> raster means, bit-exact"),

    // The same decoded-frame pipeline over a SECOND container format:
    // multi-page TIFF through the JDK's bundled TIFF plugin, sniffed
    // by magic bytes (decodeFrames no longer assumes GIF). Coprime
    // dimension moduli (17/13/5) vs the GIF table exercise different
    // frame shapes; the oracle is the identical closed form.
    Q("mm_frame_sample_tiff",
      (s, dir) => Multimodal.frameSampleDecoded(
        Multimodal.tiffMediaFromDocuments(Tables.documents(s, dir)), n = 4)
        .toDF()
        .select(col("id"), col("frame_idx"), col("src_frame"),
          col("width"), col("height"), col("mean_gray"))
        .orderByOnce(col("id"), col("frame_idx")),
      Some("""WITH d AS (SELECT doc_id, CAST(1 + doc_id % 17 AS BIGINT) AS w,
             |                  CAST(1 + doc_id % 13 AS BIGINT) AS h,
             |                  CAST(2 + doc_id % 5 AS BIGINT) AS fc
             |           FROM documents),
             |k AS (SELECT *, least(4, fc) AS k FROM d),
             |i AS (SELECT doc_id, w, h, fc, k, unnest(range(0, k)) AS i FROM k),
             |fr AS (SELECT doc_id, w, h, i, (i * fc) // k AS src FROM i),
             |xs AS (SELECT doc_id, w, h, i, src, unnest(range(0, w)) AS x FROM fr),
             |px AS (SELECT doc_id, w, h, i, src, x, unnest(range(0, h)) AS y FROM xs),
             |a AS (SELECT doc_id, i, src, w, h,
             |             sum((doc_id + 7 * src + 31 * x + 131 * y) % 256) AS s
             |      FROM px GROUP BY 1, 2, 3, 4, 5)
             |SELECT doc_id AS id, CAST(i AS INTEGER) AS frame_idx,
             |       CAST(src AS INTEGER) AS src_frame,
             |       CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
             |       CAST(s AS DOUBLE) / (w * h) AS mean_gray
             |FROM a ORDER BY id, frame_idx""".stripMargin),
      doc = "multi-page TIFF decode via the same frame kernel: format-generic sniff -> page sample -> raster means"),

    // REAL frame dedup: byte-identical GIF payloads (the injected
    // id+100000 copies) decode to pixel-identical frames; canonical =
    // min id per distinct (dims, raster md5). The oracle derives frame
    // identity from the closed form instead — frames are equal iff
    // dims match and (base + 7·src) mod 256 matches (the pixel pattern
    // is fully determined by that offset), so the two sides agree
    // exactly when the decode round-trip is lossless.
    Q("mm_frame_dedup_real",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        gifFramesWithDups(s, dir)
          .select(col("id"), col("frame_idx"),
            min(col("id")).over(Window.partitionBy(
              col("width"), col("height"), md5(col("gray"))))
              .as("canonical_id"))
          .orderBy(col("id"), col("frame_idx"))
      },
      Some("""WITH all_docs AS (
             |  SELECT doc_id FROM documents
             |  UNION ALL
             |  SELECT doc_id + 100000 FROM documents WHERE doc_id < 50),
             |d AS (SELECT doc_id, doc_id % 100000 AS base FROM all_docs),
             |p AS (SELECT doc_id, base, CAST(1 + base % 32 AS BIGINT) AS w,
             |             CAST(1 + base % 24 AS BIGINT) AS h,
             |             CAST(2 + base % 7 AS BIGINT) AS fc
             |      FROM d),
             |k AS (SELECT *, least(4, fc) AS k FROM p),
             |i AS (SELECT doc_id, base, w, h, fc, k,
             |             unnest(range(0, k)) AS i FROM k),
             |fr AS (SELECT doc_id, i, w, h,
             |              (base + 7 * ((i * fc) // k)) % 256 AS off FROM i)
             |SELECT doc_id AS id, CAST(i AS INTEGER) AS frame_idx,
             |       min(doc_id) OVER (PARTITION BY w, h, off) AS canonical_id
             |FROM fr ORDER BY id, frame_idx""".stripMargin),
      doc = "REAL frame-level dedup: decoded-raster hash groups vs the closed-form frame-identity oracle"),

    // Frame-level exact dedup: multimodal feeding the dedup surface.
    // Byte-identical media (the injected doc_id+100000 copies, as in
    // dedup_exact) slice into byte-identical frames, so canonical =
    // min id per distinct frame content maps every injected frame back
    // to its original — the same 16-byte-hash group as dedup_exact,
    // over binary media slices.
    Q("mm_frame_dedup",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val docs = Tables.documents(s, dir)
        val withDups = docs.select(col("doc_id"), col("text")).unionByName(
          docs.filter(col("doc_id") < 50)
            .select((col("doc_id") + 100000).as("doc_id"), col("text")))
        val frames = Multimodal.frameSample(
          Multimodal.mediaFromDocuments(withDups, "video"), n = 4)
        frames.select(col("id"), col("frame_idx"),
            min(col("id")).over(Window.partitionBy(md5(col("frame"))))
              .as("canonical_id"))
          .orderBy(col("id"), col("frame_idx"))
      },
      // documents are ASCII, so character slices equal the Spark side's
      // UTF-8 byte slices (DuckDB's substring has no BLOB overload)
      Some("""WITH all_docs AS (
             |  SELECT doc_id, text FROM documents
             |  UNION ALL
             |  SELECT doc_id + 100000 AS doc_id, text
             |  FROM documents WHERE doc_id < 50),
             |f AS (SELECT doc_id, text,
             |                  (length(text) + 3) // 4 AS flen
             |           FROM all_docs),
             |fr AS (SELECT doc_id AS id, CAST(i AS INTEGER) AS frame_idx,
             |              substring(text, i * flen + 1, flen) AS frame
             |       FROM (SELECT doc_id, text, flen,
             |                    unnest(generate_series(0, 3)) AS i
             |             FROM f)
             |       WHERE length(substring(text, i * flen + 1, flen)) > 0)
             |SELECT id, frame_idx,
             |       min(id) OVER (PARTITION BY frame) AS canonical_id
             |FROM fr
             |ORDER BY id, frame_idx""".stripMargin),
      doc = "frame-level exact dedup: canonical = min id per distinct frame bytes"),

    // Perceptual average-hash image dedup over REAL decoded PNGs: the
    // Spark side encodes, decodes (ImageIO), and hashes actual
    // rasters; the oracle reproduces every bit from the closed-form
    // pixel formula with exact integer arithmetic (cross-multiplied
    // block-vs-global luma sums — no doubles anywhere). Injected
    // id+100000 copies render the SAME image (seed = id % 100000) and
    // must collapse to one canonical.
    Q("mm_image_ahash",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val docs = Tables.documents(s, dir).select(col("doc_id"))
        val ids = docs.unionByName(
          docs.filter(col("doc_id") < 50)
            .select((col("doc_id") + 100000).as("doc_id")))
        val gen = udf((id: Long) => Multimodal.encodePng(
          (1 + id % 64).toInt, (1 + id % 48).toInt, seed = id))
        val media = ids
          .repartition(s.sparkContext.defaultParallelism)
          .select(col("doc_id").as("id"),
            gen(pmod(col("doc_id"), lit(100000))).as("content"))
        Multimodal.aHash64(media).toDF()
          .select(col("id"), col("ahash"),
            min(col("id")).over(Window.partitionBy(col("ahash")))
              .as("canonical_id"))
          .orderBy(col("id"))
      },
      Some("""WITH all_ids AS (
             |  SELECT doc_id FROM documents
             |  UNION ALL
             |  SELECT doc_id + 100000 AS doc_id FROM documents WHERE doc_id < 50),
             |d AS (SELECT doc_id, doc_id % 100000 AS gid FROM all_ids),
             |dim AS (SELECT doc_id, gid,
             |               CAST(1 + gid % 64 AS BIGINT) AS w,
             |               CAST(1 + gid % 48 AS BIGINT) AS h
             |        FROM d),
             |xs AS (SELECT doc_id, gid, w, h, unnest(range(0, w)) AS x FROM dim),
             |px AS (SELECT doc_id, gid, w, h, x, unnest(range(0, h)) AS y FROM xs),
             |lum AS (SELECT doc_id, w, h,
             |               (y * 8) // h AS by, (x * 8) // w AS bx,
             |               ((gid + 262147 * x + 40961 * y) % 16777216) // 65536
             |               + (((gid + 262147 * x + 40961 * y) % 16777216) // 256) % 256
             |               + ((gid + 262147 * x + 40961 * y) % 16777216) % 256 AS g
             |        FROM px),
             |blocks AS (SELECT doc_id, by, bx,
             |                  sum(g) AS sb, count(*) AS nb
             |           FROM lum GROUP BY doc_id, by, bx),
             |tot AS (SELECT doc_id, sum(sb) AS s, sum(nb) AS n
             |        FROM blocks GROUP BY doc_id),
             |bits AS (SELECT b.doc_id, b.by * 8 + b.bx AS idx
             |         FROM blocks b JOIN tot t USING (doc_id)
             |         WHERE b.sb * t.n > t.s * b.nb),
             |hashes AS (
             |  SELECT a.doc_id AS id,
             |         CAST(coalesce(sum(CASE WHEN b.idx = 63
             |                 THEN -9223372036854775808
             |                 ELSE (CAST(1 AS BIGINT) << b.idx) END), 0)
             |              AS BIGINT) AS ahash
             |  FROM all_ids a LEFT JOIN bits b ON b.doc_id = a.doc_id
             |  GROUP BY a.doc_id)
             |SELECT id, ahash,
             |       min(id) OVER (PARTITION BY ahash) AS canonical_id
             |FROM hashes
             |ORDER BY id""".stripMargin),
      doc = "perceptual average-hash (8x8 mean-threshold, exact integer bits) over real decoded PNGs + hash-level dedup"),

    // Perceptual NEAR-dup image pairs: ids < 50 get a +200000 variant
    // that is the SAME image with a white 4x4 "logo" stamp — different
    // bytes, different raster, near-identical perception. aHash flips
    // only the touched blocks' bits, so the banded hamming join
    // (shared 16-bit chunk -> bit_count verify, the dedup_simhash
    // machinery over image fingerprints) recovers the planted pairs.
    // The output ALSO contains pairs among unrelated synthetic rasters
    // — the generator's smooth gradient structure genuinely hashes
    // alike across seeds, which is aHash reporting structural
    // similarity as designed (both engines agree bit-for-bit). BECAUSE
    // every synthetic raster shares that gradient structure, the pair
    // set grows quadratically with corpus size (514k pairs at sf0.1)
    // — a property of this fixture, not of aHash on real photos — so
    // the catalog entry runs on a bounded id < 100 slice; the
    // operator's scale shape is fingerprintHammingPairs' (16-byte
    // rows, banded candidates), already probed via dedup_simhash.
    Q("mm_image_ahash_pairs",
      (s, dir) => {
        val docs = Tables.documents(s, dir).select(col("doc_id"))
          .filter(col("doc_id") < 100)
        val gen = udf((id: Long) => Multimodal.encodePng(
          (1 + id % 64).toInt, (1 + id % 48).toInt, seed = id))
        val genStamped = udf((id: Long) => Multimodal.encodePngStamped(
          (1 + id % 64).toInt, (1 + id % 48).toInt, seed = id))
        val media = docs
          .repartition(s.sparkContext.defaultParallelism)
          .select(col("doc_id").as("id"), gen(col("doc_id")).as("content"))
          .unionByName(docs.filter(col("doc_id") < 50)
            .select((col("doc_id") + 200000).as("id"),
              genStamped(col("doc_id")).as("content")))
        Dedup.fingerprintHammingPairs(
            Multimodal.aHash64(media).toDF(), "id", "ahash", maxHamming = 8)
          .orderBy(col("id_a"), col("id_b"))
      },
      Some("""WITH all_imgs AS (
             |  SELECT doc_id AS id, doc_id AS gid, 0 AS st FROM documents
             |  WHERE doc_id < 100
             |  UNION ALL
             |  SELECT doc_id + 200000 AS id, doc_id AS gid, 1 AS st
             |  FROM documents WHERE doc_id < 50),
             |dim AS (SELECT id, gid, st,
             |               CAST(1 + gid % 64 AS BIGINT) AS w,
             |               CAST(1 + gid % 48 AS BIGINT) AS h
             |        FROM all_imgs),
             |xs AS (SELECT id, gid, st, w, h, unnest(range(0, w)) AS x FROM dim),
             |px AS (SELECT id, gid, st, w, h, x, unnest(range(0, h)) AS y FROM xs),
             |lum AS (SELECT id, w, h,
             |               (y * 8) // h AS by, (x * 8) // w AS bx,
             |               CASE WHEN st = 1 AND x < 4 AND y < 4 THEN 765
             |                    ELSE ((gid + 262147 * x + 40961 * y) % 16777216) // 65536
             |                       + (((gid + 262147 * x + 40961 * y) % 16777216) // 256) % 256
             |                       + ((gid + 262147 * x + 40961 * y) % 16777216) % 256
             |               END AS g
             |        FROM px),
             |blocks AS (SELECT id, by, bx, sum(g) AS sb, count(*) AS nb
             |           FROM lum GROUP BY id, by, bx),
             |tot AS (SELECT id, sum(sb) AS s, sum(nb) AS n
             |        FROM blocks GROUP BY id),
             |bits AS (SELECT b.id, b.by * 8 + b.bx AS idx
             |         FROM blocks b JOIN tot t USING (id)
             |         WHERE b.sb * t.n > t.s * b.nb),
             |hashes AS (
             |  SELECT a.id,
             |         coalesce(sum(CAST(1 AS HUGEINT) << b.idx),
             |                  CAST(0 AS HUGEINT)) AS uh
             |  FROM all_imgs a LEFT JOIN bits b ON b.id = a.id
             |  GROUP BY a.id),
             |fps AS (
             |  SELECT id, uh,
             |         CAST(CASE WHEN uh >= 9223372036854775808
             |                   THEN uh - 18446744073709551616
             |                   ELSE uh END AS BIGINT) AS f
             |  FROM hashes),
             |ch AS (
             |  SELECT id, f, r.c,
             |         CAST((uh // (CAST(1 AS HUGEINT) << (16 * r.c))) % 65536
             |              AS BIGINT) AS cv
             |  FROM fps CROSS JOIN (SELECT unnest(range(0, 4)) AS c) r)
             |SELECT DISTINCT a.id AS id_a, b.id AS id_b,
             |       CAST(bit_count(xor(a.f, b.f)) AS INTEGER) AS hamming
             |FROM ch a JOIN ch b ON a.c = b.c AND a.cv = b.cv AND a.id < b.id
             |WHERE bit_count(xor(a.f, b.f)) <= 8
             |ORDER BY id_a, id_b""".stripMargin),
      doc = "perceptual image near-dup pairs: aHash fingerprints + 16-bit chunk banding + hamming verify over stamped variants"),

    // Energy-profile audio fingerprint over REAL decoded PCM: 64
    // sample windows, bit = window energy above the clip mean, exact
    // cross-multiplied integer sums of sample^2 — the audio analogue
    // of mm_image_ahash, volume-scale invariant by construction
    // (spec-pinned). The oracle rebuilds every bit from the WAV
    // generator's sample law.
    Q("mm_audio_fingerprint",
      (s, dir) => Multimodal.audioFingerprint64(
          Multimodal.wavMediaFromDocuments(Tables.documents(s, dir)))
        .toDF()
        .orderByOnce(col("id")),
      Some("""WITH p AS (SELECT doc_id,
             |             CAST((100 + doc_id % 400) * (1 + doc_id % 2) AS BIGINT)
             |               AS ns
             |           FROM documents),
             |s AS (SELECT doc_id, ns, i, ((doc_id + 31 * i) & 32767) AS v
             |      FROM (SELECT doc_id, ns, unnest(range(0, ns)) AS i FROM p)),
             |w AS (SELECT doc_id, ns, (i * 64) // ns AS wi, v * v AS e FROM s),
             |wins AS (SELECT doc_id, wi, sum(e) AS se, count(*) AS nw
             |         FROM w GROUP BY doc_id, wi),
             |tot AS (SELECT doc_id, sum(se) AS te, sum(nw) AS n
             |        FROM wins GROUP BY doc_id),
             |bits AS (SELECT w.doc_id, w.wi
             |         FROM wins w JOIN tot t USING (doc_id)
             |         WHERE w.se * t.n > t.te * w.nw),
             |hashes AS (
             |  SELECT p.doc_id,
             |         coalesce(sum(CAST(1 AS HUGEINT) << b.wi),
             |                  CAST(0 AS HUGEINT)) AS uh
             |  FROM p LEFT JOIN bits b USING (doc_id)
             |  GROUP BY p.doc_id)
             |SELECT doc_id AS id,
             |       CAST(CASE WHEN uh >= 9223372036854775808
             |                 THEN uh - 18446744073709551616
             |                 ELSE uh END AS BIGINT) AS afp
             |FROM hashes
             |ORDER BY id""".stripMargin),
      doc = "energy-profile audio fingerprint (64 windows, exact integer bits) over real decoded PCM, sample-law oracled"),

    // Perceptual DCT hash (pHash) over REAL decoded PNGs: 32x32 luma
    // cell sums -> fixed-point integer DCT-II (the 8x32 basis table is
    // computed ONCE in Scala and inlined below as literals, so no
    // cross-engine cosine ULP exists) -> bit = coefficient strictly
    // above the lower median. A second fingerprint FAMILY, keyed on
    // low-frequency structure where aHash keys on block brightness;
    // the pair machinery (banded hamming join) is shared and already
    // exercised by mm_image_ahash_pairs/dedup_simhash, so this entry
    // pins the hash bits + hash-level dedup on a bounded slice (the
    // synthetic gradient fixture makes EVERY raster low-frequency-
    // similar, the same quadratic-pairs property the ahash_pairs
    // comment documents).
    Q("mm_image_phash",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val docs = Tables.documents(s, dir).select(col("doc_id"))
          .filter(col("doc_id") < 120)
        val gen = udf((id: Long) => Multimodal.encodePng(
          (1 + id % 64).toInt, (1 + id % 48).toInt, seed = id))
        val genStamped = udf((id: Long) => Multimodal.encodePngStamped(
          (1 + id % 64).toInt, (1 + id % 48).toInt, seed = id))
        val media = docs
          .repartition(s.sparkContext.defaultParallelism)
          .select(col("doc_id").as("id"), gen(col("doc_id")).as("content"))
          .unionByName(docs.filter(col("doc_id") < 40)
            .select((col("doc_id") + 200000).as("id"),
              genStamped(col("doc_id")).as("content")))
        Multimodal.pHash64(media).toDF()
          .select(col("id"), col("phash"),
            min(col("id")).over(Window.partitionBy(col("phash")))
              .as("canonical_id"))
          .orderBy(col("id"))
      },
      Some(s"""WITH all_imgs AS (
             |  SELECT doc_id AS id, doc_id AS gid, 0 AS st FROM documents
             |  WHERE doc_id < 120
             |  UNION ALL
             |  SELECT doc_id + 200000 AS id, doc_id AS gid, 1 AS st
             |  FROM documents WHERE doc_id < 40),
             |dim AS (SELECT id, gid, st,
             |               CAST(1 + gid % 64 AS BIGINT) AS w,
             |               CAST(1 + gid % 48 AS BIGINT) AS h
             |        FROM all_imgs),
             |xs AS (SELECT id, gid, st, w, h, unnest(range(0, w)) AS x FROM dim),
             |px AS (SELECT id, gid, st, w, h, x, unnest(range(0, h)) AS y FROM xs),
             |lum AS (SELECT id,
             |               (x * 32) // w AS cu, (y * 32) // h AS cv,
             |               CASE WHEN st = 1 AND x < 4 AND y < 4 THEN 765
             |                    ELSE ((gid + 262147 * x + 40961 * y) % 16777216) // 65536
             |                       + (((gid + 262147 * x + 40961 * y) % 16777216) // 256) % 256
             |                       + ((gid + 262147 * x + 40961 * y) % 16777216) % 256
             |               END AS g
             |        FROM px),
             |cells AS (SELECT id, cu, cv, sum(g) AS sc
             |          FROM lum GROUP BY id, cu, cv),
             |t AS (SELECT * FROM (VALUES $dctTableValues) AS v(p, u, tv)),
             |coef AS (SELECT c.id, tp.p AS p, tq.p AS q,
             |                sum(CAST(tp.tv AS HUGEINT) * tq.tv * c.sc) AS cf
             |         FROM cells c
             |         JOIN t tp ON tp.u = c.cu
             |         JOIN t tq ON tq.u = c.cv
             |         GROUP BY c.id, tp.p, tq.p),
             |med AS (SELECT id, cf AS m FROM (
             |          SELECT id, cf,
             |                 row_number() OVER (PARTITION BY id
             |                                    ORDER BY cf, p, q) AS rn
             |          FROM coef) WHERE rn = 32),
             |bits AS (SELECT c.id, c.p * 8 + c.q AS idx
             |         FROM coef c JOIN med USING (id) WHERE c.cf > med.m),
             |hashes AS (
             |  SELECT a.id,
             |         coalesce(sum(CAST(1 AS HUGEINT) << b.idx),
             |                  CAST(0 AS HUGEINT)) AS uh
             |  FROM all_imgs a LEFT JOIN bits b ON b.id = a.id
             |  GROUP BY a.id),
             |fps AS (
             |  SELECT id,
             |         CAST(CASE WHEN uh >= 9223372036854775808
             |                   THEN uh - 18446744073709551616
             |                   ELSE uh END AS BIGINT) AS phash
             |  FROM hashes)
             |SELECT id, phash,
             |       min(id) OVER (PARTITION BY phash) AS canonical_id
             |FROM fps
             |ORDER BY id""".stripMargin),
      doc = "perceptual DCT hash (fixed-point integer DCT-II, rank-statistic threshold) over real decoded PNGs + hash-level dedup")
  )

  /** [[Multimodal.DctTable]] as a SQL VALUES literal — the inlining
    * that makes the pHash oracle share the Spark side's exact basis.
    */
  private def dctTableValues: String =
    (for (p <- 0 until 8; u <- 0 until 32)
      yield s"($p,$u,${Multimodal.DctTable(p)(u)})").mkString(",")
}
