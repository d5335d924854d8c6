package graft.queries

import graft.operators.Multimodal
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
        .orderBy(col("id")),
      Some("""SELECT doc_id AS id,
             |       CAST(1 + doc_id % 64 AS INTEGER) AS width,
             |       CAST(1 + doc_id % 48 AS INTEGER) AS height,
             |       3 AS channels
             |FROM documents ORDER BY id""".stripMargin),
      doc = "REAL ImageIO round-trip: encode PNG -> batched ImageIO decode -> typed metadata, dims oracle-pinned"),

    // REAL pixel-level features: the engine decodes each PNG and walks
    // the raster for per-channel means; the oracle recomputes them
    // from the fixture's closed-form pixel function (seed + 31x + 131y
    // folded into 24-bit RGB) without ever decoding — lossless PNG +
    // exact integer sums + one IEEE division make it bit-exact
    Q("mm_pixel_stats",
      (s, dir) => Multimodal.pixelStats(
        Multimodal.pngMediaFromDocuments(Tables.documents(s, dir)))
        .toDF()
        .orderBy(col("id")),
      Some("""WITH d AS (SELECT doc_id, CAST(1 + doc_id % 64 AS BIGINT) AS w,
             |                  CAST(1 + doc_id % 48 AS BIGINT) AS h
             |           FROM documents),
             |xs AS (SELECT doc_id, w, h, unnest(range(0, w)) AS x FROM d),
             |px AS (SELECT doc_id, w, h, x, unnest(range(0, h)) AS y FROM xs),
             |v AS (SELECT doc_id, w, h,
             |             (doc_id + 31 * x + 131 * y) % 16777216 AS v
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
        .orderBy(col("id")),
      Some("""SELECT doc_id AS id,
             |       CAST(8000 + (doc_id % 8) * 1000 AS INTEGER) AS sample_rate,
             |       CAST(1 + doc_id % 2 AS INTEGER) AS channels,
             |       16 AS bits,
             |       CAST(100 + doc_id % 400 AS BIGINT) AS n_frames
             |FROM documents ORDER BY id""".stripMargin),
      doc = "REAL AudioSystem round-trip: encode PCM WAV -> batched JDK decode -> typed metadata, params oracle-pinned"),

    // REAL resize: decode -> Graphics2D scale-to-fit (IEEE floor
    // arithmetic the oracle reproduces) -> PNG re-encode -> re-decode;
    // the emitted dims come from the RESIZED BYTES, not the formula
    Q("mm_resize_real",
      (s, dir) => Multimodal.resizeImages(
        Multimodal.pngMediaFromDocuments(Tables.documents(s, dir)),
        maxW = 32, maxH = 32)
        .toDF()
        .orderBy(col("id")),
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
        .orderBy(col("id")),
      Some("""SELECT doc_id AS id,
             |       CAST(least(1 + length(text) % 640, 256) AS INTEGER) AS width,
             |       CAST(least(1 + length(text) % 480, 256) AS INTEGER) AS height,
             |       3 AS channels
             |FROM documents ORDER BY id""".stripMargin),
      doc = "resize plan step over decoded metadata"),

    Q("mm_features",
      (s, dir) => {
        val f = Multimodal.extractFeatures(
          Multimodal.mediaFromDocuments(Tables.documents(s, dir), "image"), dim = 8)
        f.toDF().select(col("id"),
          round(element_at(col("features"), 1).cast("double"), 6).as("f0"),
          round(element_at(col("features"), 8).cast("double"), 6).as("f7"))
          .orderBy(col("id"))
      },
      Some("""SELECT doc_id AS id,
             |       round(CAST(CAST((length(text) * 1) % 97 AS FLOAT) / CAST(97.0 AS FLOAT) AS DOUBLE), 6) AS f0,
             |       round(CAST(CAST((length(text) * 8) % 97 AS FLOAT) / CAST(97.0 AS FLOAT) AS DOUBLE), 6) AS f7
             |FROM documents ORDER BY id""".stripMargin),
      doc = "batched feature-extraction kernel -> embedding column"),

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
      doc = "frame-level exact dedup: canonical = min id per distinct frame bytes")
  )
}
