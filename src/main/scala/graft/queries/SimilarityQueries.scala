package graft.queries

import graft.queries.Catalog.OrderByOnce
import graft.operators.Similarity
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Oracle-checked similarity-search queries over `embeddings`. Query
  * set = vec_id < 10, IVF centroids = vec_id < 16 — deterministic
  * subsets both engines can name. Ranks compare raw (unrounded) cosine
  * in both engines; random float32 vectors make exact ties (the only
  * rank-instability source) measure-zero.
  */
object SimilarityQueries {

  private def cos(a: String, b: String): String =
    s"""(list_inner_product($a, $b)
       |  / (sqrt(list_inner_product($a, $a)) * sqrt(list_inner_product($b, $b))))""".stripMargin

  val all: Seq[Q] = Seq(

    // Hybrid retrieval: BM25 lexical top-15 (ranks on the rounded
    // score, ties to doc_id) fused with cosine top-15 for query vector
    // 0 (vec_id ≡ doc_id in the testdata) by reciprocal-rank fusion.
    Q("sim_hybrid_rrf",
      (s, dir) => {
        val lexW = org.apache.spark.sql.expressions.Window
          .orderBy(col("score").desc, col("doc_id"))
        val lex = graft.operators.TextAnalysis.bm25TopK(
            Tables.documents(s, dir), "doc_id", "text",
            Seq("vector", "stream", "spark"), k = 15)
          .withColumn("rank", row_number().over(lexW))
          .select(col("doc_id"), col("rank"))
        val emb = Tables.embeddings(s, dir)
        val sem = Similarity.bruteForceTopK(emb,
            emb.filter(col("vec_id") === 0), "vec_id", "embedding", k = 15)
          .select(col("neighbor_id").as("doc_id"), col("rank"))
        Similarity.rrfFuse(Seq(lex, sem), "doc_id", "rank", k = 10)
          .orderBy(col("rrf").desc, col("doc_id"))
      },
      Some(s"""WITH toks AS (
              |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
              |dl AS (SELECT doc_id, len(w) AS dl FROM toks),
              |corpus AS (SELECT count(*) AS n, sum(dl) AS tot FROM dl),
              |tf AS (SELECT doc_id, t, count(*) AS tf
              |       FROM (SELECT doc_id, unnest(w) AS t FROM toks)
              |       WHERE t IN ('vector', 'stream', 'spark')
              |       GROUP BY doc_id, t),
              |dfq AS (SELECT t, count(*) AS df FROM tf GROUP BY t),
              |sc AS (
              |  SELECT tf.doc_id,
              |         ln(1.0 + (corpus.n - dfq.df + 0.5) / (dfq.df + 0.5))
              |           * tf.tf * (1.2 + 1.0)
              |           / (tf.tf + 1.2 * ((1.0 - 0.75)
              |              + 0.75 * dl.dl / (CAST(corpus.tot AS DOUBLE) / corpus.n)))
              |           AS contrib
              |  FROM tf JOIN dfq USING (t) JOIN dl USING (doc_id) CROSS JOIN corpus),
              |bm AS (SELECT doc_id, round(sum(contrib), 6) AS score
              |       FROM sc GROUP BY doc_id
              |       ORDER BY score DESC, doc_id LIMIT 15),
              |lex AS (SELECT doc_id,
              |               row_number() OVER (ORDER BY score DESC, doc_id) AS r
              |        FROM bm),
              |e AS (SELECT vec_id,
              |             list_transform(embedding, x -> CAST(x AS DOUBLE)) v
              |      FROM embeddings),
              |scored AS (
              |  SELECT c.vec_id AS doc_id, ${cos("q.v", "c.v")} AS cs
              |  FROM e q JOIN e c ON c.vec_id != q.vec_id
              |  WHERE q.vec_id = 0),
              |sem AS (SELECT doc_id, r FROM (
              |          SELECT doc_id,
              |                 row_number() OVER (ORDER BY cs DESC, doc_id) AS r
              |          FROM scored) WHERE r <= 15),
              |u AS (SELECT doc_id, r FROM lex UNION ALL SELECT doc_id, r FROM sem)
              |SELECT doc_id, round(sum(1.0 / (60 + r)), 6) AS rrf,
              |       count(*) AS n_lists
              |FROM u GROUP BY doc_id
              |ORDER BY rrf DESC, doc_id
              |LIMIT 10""".stripMargin),
      doc = "hybrid retrieval: BM25 ∪ cosine lists fused by reciprocal-rank " +
        "fusion (rank-only combiner, k-bounded union, TakeOrdered top-k)"),

    Q("sim_topk_bruteforce",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 10),
          "vec_id", "embedding", k = 5)
          .select(col("query_id"), col("rank"), col("neighbor_id"),
            round(col("cos"), 6).as("cos"))
          .orderBy(col("query_id"), col("rank"))
      },
      Some(s"""WITH e AS (SELECT vec_id,
              |                  list_transform(embedding, x -> CAST(x AS DOUBLE)) v
              |           FROM embeddings),
              |scored AS (
              |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
              |         ${cos("q.v", "c.v")} AS cs
              |  FROM e q JOIN e c ON c.vec_id != q.vec_id
              |  WHERE q.vec_id < 10),
              |ranked AS (
              |  SELECT query_id, neighbor_id, cs,
              |         row_number() OVER (PARTITION BY query_id
              |                            ORDER BY cs DESC, neighbor_id) AS rank
              |  FROM scored)
              |SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id,
              |       round(cs, 6) AS cos
              |FROM ranked WHERE rank <= 5
              |ORDER BY query_id, rank""".stripMargin),
      doc = "exact top-k cosine: broadcast query set x corpus scan + window"),

    Q("sim_ivf_topk",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 16),
          col("__id") < 10, "vec_id", "embedding", k = 3)
          .orderBy(col("query_id"), col("rank"))
      },
      Some(s"""WITH e AS (SELECT vec_id,
              |                  list_transform(embedding, x -> CAST(x AS DOUBLE)) v
              |           FROM embeddings),
              |c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 16),
              |asg AS (
              |  SELECT vec_id, cid,
              |         row_number() OVER (PARTITION BY vec_id
              |                            ORDER BY cs DESC, cid) AS rn
              |  FROM (SELECT e.vec_id, c.cid, ${cos("e.v", "c.cv")} AS cs
              |        FROM e CROSS JOIN c)),
              |cell AS (SELECT vec_id, cid AS cell FROM asg WHERE rn = 1),
              |q AS (SELECT vec_id AS qid, cell FROM cell WHERE vec_id < 10),
              |scored AS (
              |  SELECT q.qid AS query_id, ce.vec_id AS neighbor_id,
              |         ${cos("eq.v", "ec.v")} AS cs
              |  FROM q
              |  JOIN cell ce ON ce.cell = q.cell AND ce.vec_id != q.qid
              |  JOIN e eq ON eq.vec_id = q.qid
              |  JOIN e ec ON ec.vec_id = ce.vec_id),
              |ranked AS (
              |  SELECT query_id, neighbor_id,
              |         row_number() OVER (PARTITION BY query_id
              |                            ORDER BY cs DESC, neighbor_id) AS rank
              |  FROM scored)
              |SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id
              |FROM ranked WHERE rank <= 3
              |ORDER BY query_id, rank""".stripMargin),
      doc = "IVF ANN: one-pass centroid assignment, probe own cell (nprobe=1)"),

    // ANN quality evaluation: per-query recall@3 of the IVF path
    // against exact brute force — the metric a user tunes nprobe /
    // centroid count against. Both retrievals are deterministic
    // ((cos DESC, neighbor_id) rank), so recall is a stable fraction,
    // not a sampled estimate. The join is top-k-sized (queries x k
    // rows), never corpus-sized.
    Q("sim_ivf_recall",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val brute = Similarity.bruteForceTopK(emb,
            emb.filter(col("vec_id") < 10), "vec_id", "embedding", k = 3)
          .select(col("query_id"), col("neighbor_id"))
        val ivf = Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 16),
            col("__id") < 10, "vec_id", "embedding", k = 3)
          .select(col("query_id"), col("neighbor_id"), lit(1L).as("__hit"))
        brute.join(ivf, Seq("query_id", "neighbor_id"), "left")
          .groupBy(col("query_id"))
          .agg(round(sum(coalesce(col("__hit"), lit(0L))) / lit(3.0), 6)
            .as("recall_at_3"))
          .orderBy(col("query_id"))
      },
      Some(s"""WITH e AS (SELECT vec_id,
              |                  list_transform(embedding, x -> CAST(x AS DOUBLE)) v
              |           FROM embeddings),
              |bs AS (
              |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
              |         ${cos("q.v", "c.v")} AS cs
              |  FROM e q JOIN e c ON c.vec_id != q.vec_id
              |  WHERE q.vec_id < 10),
              |br AS (
              |  SELECT query_id, neighbor_id,
              |         row_number() OVER (PARTITION BY query_id
              |                            ORDER BY cs DESC, neighbor_id) AS rank
              |  FROM bs),
              |bt AS (SELECT query_id, neighbor_id FROM br WHERE rank <= 3),
              |c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 16),
              |asg AS (
              |  SELECT vec_id, cid,
              |         row_number() OVER (PARTITION BY vec_id
              |                            ORDER BY cs DESC, cid) AS rn
              |  FROM (SELECT e.vec_id, c.cid, ${cos("e.v", "c.cv")} AS cs
              |        FROM e CROSS JOIN c)),
              |cell AS (SELECT vec_id, cid AS cell FROM asg WHERE rn = 1),
              |q AS (SELECT vec_id AS qid, cell FROM cell WHERE vec_id < 10),
              |isc AS (
              |  SELECT q.qid AS query_id, ce.vec_id AS neighbor_id,
              |         ${cos("eq.v", "ec.v")} AS cs
              |  FROM q
              |  JOIN cell ce ON ce.cell = q.cell AND ce.vec_id != q.qid
              |  JOIN e eq ON eq.vec_id = q.qid
              |  JOIN e ec ON ec.vec_id = ce.vec_id),
              |ir AS (
              |  SELECT query_id, neighbor_id,
              |         row_number() OVER (PARTITION BY query_id
              |                            ORDER BY cs DESC, neighbor_id) AS rank
              |  FROM isc),
              |it AS (SELECT query_id, neighbor_id FROM ir WHERE rank <= 3)
              |SELECT bt.query_id,
              |       round(CAST(count(it.query_id) AS DOUBLE) / 3.0, 6)
              |         AS recall_at_3
              |FROM bt LEFT JOIN it ON it.query_id = bt.query_id
              |                    AND it.neighbor_id = bt.neighbor_id
              |GROUP BY bt.query_id ORDER BY bt.query_id""".stripMargin),
      doc = "ANN recall@3 eval: IVF top-k vs exact brute force, deterministic per-query fraction"),

    // Matryoshka truncation eval: top-5 agreement between full-dim and
    // 16-dim-truncated-renormalized retrieval, per query — the metric
    // that decides whether the cheap prefix embedding is servable.
    // Renorm arithmetic is identical on both sides (same operands into
    // x/sqrt(left-fold sum of squares)); ranks compare unrounded cos,
    // same measure-zero-ties argument as the other sim queries.
    Q("emb_matryoshka_agreement",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val full = Similarity.bruteForceTopK(emb,
          emb.filter(col("vec_id") < 10), "vec_id", "embedding", k = 5)
        val tr = Similarity.truncateRenorm(emb, "vec_id", "embedding", d = 16)
        val trTop = Similarity.bruteForceTopK(tr,
          tr.filter(col("vec_id") < 10), "vec_id", "embedding", k = 5)
        full.as("f")
          .join(trTop.as("t"),
            col("f.query_id") === col("t.query_id") &&
              col("f.neighbor_id") === col("t.neighbor_id"), "left")
          .groupBy(col("f.query_id").as("query_id"))
          .agg(sum(when(col("t.neighbor_id").isNotNull, 1).otherwise(0))
            .cast("int").as("n_agree"))
          .orderBy(col("query_id"))
      },
      Some(s"""WITH e AS (SELECT vec_id,
              |                  list_transform(embedding, x -> CAST(x AS DOUBLE)) v
              |           FROM embeddings),
              |tn AS (
              |  SELECT vec_id, v[1:16] AS t,
              |         list_reduce(list_prepend(CAST(0 AS DOUBLE),
              |             list_transform(v[1:16], x -> x * x)),
              |           (a, b) -> a + b) AS n2
              |  FROM e),
              |tr AS (
              |  SELECT vec_id,
              |         CASE WHEN n2 = 0 THEN t
              |              ELSE list_transform(t, x -> x / sqrt(n2)) END AS v
              |  FROM tn),
              |fullr AS (
              |  SELECT query_id, neighbor_id FROM (
              |    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
              |           row_number() OVER (PARTITION BY q.vec_id
              |               ORDER BY ${cos("q.v", "c.v")} DESC, c.vec_id) AS rank
              |    FROM e q JOIN e c ON c.vec_id != q.vec_id
              |    WHERE q.vec_id < 10)
              |  WHERE rank <= 5),
              |trr AS (
              |  SELECT query_id, neighbor_id FROM (
              |    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
              |           row_number() OVER (PARTITION BY q.vec_id
              |               ORDER BY ${cos("q.v", "c.v")} DESC, c.vec_id) AS rank
              |    FROM tr q JOIN tr c ON c.vec_id != q.vec_id
              |    WHERE q.vec_id < 10)
              |  WHERE rank <= 5)
              |SELECT f.query_id,
              |       CAST(sum(CASE WHEN t.neighbor_id IS NOT NULL
              |                     THEN 1 ELSE 0 END) AS INTEGER) AS n_agree
              |FROM fullr f LEFT JOIN trr t
              |  ON f.query_id = t.query_id AND f.neighbor_id = t.neighbor_id
              |GROUP BY f.query_id
              |ORDER BY f.query_id""".stripMargin),
      doc = "matryoshka (MRL) truncation eval: top-5 agreement of 16-dim prefix retrieval vs full-dim"),

    // Int8 symmetric quantization — the vector-store prep step: scale =
    // maxabs/127 per vector, q_i = round(x_i/scale) in [-127,127].
    // Everything is per-row array arithmetic (narrow, no shuffle until
    // the output sort); the scalar summaries (q L1 mass, mean abs
    // reconstruction error) keep the oracle hash over scalars, and both
    // engines run the identical left-fold double arithmetic.
    Q("emb_quantize_int8",
      (s, dir) => {
        Tables.embeddings(s, dir)
          .select(col("vec_id"),
            transform(col("embedding"), x => x.cast("double")).as("v"))
          .withColumn("maxabs", array_max(transform(col("v"), x => abs(x))))
          .withColumn("q", transform(col("v"), x => round(x * lit(127) / col("maxabs"))))
          // NOTE: rounding maxabs in the same select would shadow the
          // input column for the mae expression via lateral column
          // alias resolution (Spark 3.4+) — round only afterwards
          .select(col("vec_id"), col("maxabs"),
            aggregate(col("q"), lit(0L), (acc, x) => acc + abs(x).cast("long")).as("q_l1"),
            round(aggregate(
              zip_with(col("v"), col("q"), (x, q) => abs(x - q * col("maxabs") / lit(127))),
              lit(0.0), (acc, e) => acc + e) / size(col("v")), 6).as("mae"))
          .select(col("vec_id"), round(col("maxabs"), 6).as("maxabs"),
            col("q_l1"), col("mae"))
          .orderByOnce(col("vec_id"))
      },
      Some("""WITH e AS (
             |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) v
             |  FROM embeddings),
             |m AS (
             |  SELECT vec_id, v,
             |         list_max(list_transform(v, x -> abs(x))) AS maxabs
             |  FROM e),
             |q AS (
             |  SELECT vec_id, v, maxabs,
             |         list_transform(v, x -> round(x * 127 / maxabs)) AS qv
             |  FROM m)
             |SELECT vec_id,
             |       round(maxabs, 6) AS maxabs,
             |       CAST(list_sum(list_transform(qv, x -> CAST(abs(x) AS BIGINT)))
             |            AS BIGINT) AS q_l1,
             |       round(list_reduce(list_transform(range(1, len(v) + 1),
             |               i -> abs(v[i] - qv[i] * maxabs / 127)),
             |             (a, b) -> a + b) / len(v), 6) AS mae
             |FROM q
             |ORDER BY vec_id""".stripMargin),
      doc = "int8 symmetric vector quantization: per-vector scale, L1 mass, reconstruction MAE"),

    // Product quantization: 4 subspaces x 16-code codebooks over the
    // 64-dim vectors (codebook = vec_id < 16, the same fixed-subset
    // trick as sim_ivf_topk). Both engines fold subvector L2 in
    // ascending-dimension order, so argmin inputs are bit-identical;
    // codes emit as a '-'-joined string (no cross-engine array-hash
    // ambiguity) and recon_mae rounds the identical double arithmetic.
    Q("emb_pq_encode",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        Similarity.pqEncode(emb, emb.filter(col("vec_id") < 16),
            "vec_id", "embedding", m = 4)
          .orderByOnce(col("vec_id"))
      },
      Some(s"""WITH e AS (SELECT vec_id,
              |                  list_transform(embedding, x -> CAST(x AS DOUBLE)) v
              |           FROM embeddings),
              |cb AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 16),
              |dist AS (
              |  SELECT e.vec_id, s.j, cb.cid,
              |         list_sum(list_transform(range(1, 17),
              |           i -> (e.v[CAST(s.j*16+i AS INT)] - cb.cv[CAST(s.j*16+i AS INT)])
              |              * (e.v[CAST(s.j*16+i AS INT)] - cb.cv[CAST(s.j*16+i AS INT)])))
              |           AS d2,
              |         list_sum(list_transform(range(1, 17),
              |           i -> abs(e.v[CAST(s.j*16+i AS INT)] - cb.cv[CAST(s.j*16+i AS INT)])))
              |           AS ae
              |  FROM e CROSS JOIN range(4) s(j) CROSS JOIN cb),
              |best AS (
              |  SELECT vec_id, j, cid, ae,
              |         row_number() OVER (PARTITION BY vec_id, j
              |                            ORDER BY d2, cid) AS rn
              |  FROM dist)
              |SELECT vec_id,
              |       string_agg(CAST(cid AS VARCHAR), '-' ORDER BY j) AS pq_codes,
              |       round(sum(ae) / 64, 6) AS recon_mae
              |FROM best WHERE rn = 1
              |GROUP BY vec_id ORDER BY vec_id""".stripMargin),
      doc = "product quantization: per-subspace argmin-L2 codes + reconstruction MAE, one narrow map"),

    // PQ retrieval recall: full-precision queries score the PQ-
    // RECONSTRUCTED corpus (the ADC direction) vs exact brute force —
    // the eval that decides whether 64x-compressed vectors are
    // servable, the PQ companion of sim_ivf_recall. Encode, decode,
    // and both rankings are deterministic, so the fraction is stable.
    Q("sim_pq_recall",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val cb = emb.filter(col("vec_id") < 16)
        val recon = Similarity.pqDecode(
          Similarity.pqEncode(emb, cb, "vec_id", "embedding", m = 4),
          cb, "vec_id", "embedding", m = 4)
        val exact = Similarity.bruteForceTopK(emb,
            emb.filter(col("vec_id") < 10), "vec_id", "embedding", k = 3)
          .select(col("query_id"), col("neighbor_id"))
        val approx = Similarity.bruteForceTopK(recon,
            emb.filter(col("vec_id") < 10), "vec_id", "embedding", k = 3)
          .select(col("query_id"), col("neighbor_id"), lit(1L).as("__hit"))
        exact.join(approx, Seq("query_id", "neighbor_id"), "left")
          .groupBy(col("query_id"))
          .agg(round(sum(coalesce(col("__hit"), lit(0L))) / lit(3.0), 6)
            .as("recall_at_3"))
          .orderBy(col("query_id"))
      },
      Some(s"""WITH e AS (SELECT vec_id,
              |                  list_transform(embedding, x -> CAST(x AS DOUBLE)) v
              |           FROM embeddings),
              |cb AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 16),
              |dist AS (
              |  SELECT e.vec_id, s.j, cb.cid,
              |         list_sum(list_transform(range(1, 17),
              |           i -> (e.v[CAST(s.j*16+i AS INT)] - cb.cv[CAST(s.j*16+i AS INT)])
              |              * (e.v[CAST(s.j*16+i AS INT)] - cb.cv[CAST(s.j*16+i AS INT)])))
              |           AS d2
              |  FROM e CROSS JOIN range(4) s(j) CROSS JOIN cb),
              |best AS (
              |  SELECT vec_id, j, cid,
              |         row_number() OVER (PARTITION BY vec_id, j
              |                            ORDER BY d2, cid) AS rn
              |  FROM dist),
              |recon AS (
              |  SELECT b.vec_id,
              |         flatten(list(list_slice(cb.cv, CAST(b.j*16+1 AS INT),
              |                                 CAST((b.j+1)*16 AS INT))
              |                      ORDER BY b.j)) AS rv
              |  FROM best b JOIN cb ON cb.cid = b.cid
              |  WHERE b.rn = 1 GROUP BY b.vec_id),
              |bs AS (
              |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
              |         ${cos("q.v", "c.v")} AS cs
              |  FROM e q JOIN e c ON c.vec_id != q.vec_id
              |  WHERE q.vec_id < 10),
              |br AS (
              |  SELECT query_id, neighbor_id,
              |         row_number() OVER (PARTITION BY query_id
              |                            ORDER BY cs DESC, neighbor_id) AS rank
              |  FROM bs),
              |bt AS (SELECT query_id, neighbor_id FROM br WHERE rank <= 3),
              |ps AS (
              |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
              |         ${cos("q.v", "c.rv")} AS cs
              |  FROM e q JOIN recon c ON c.vec_id != q.vec_id
              |  WHERE q.vec_id < 10),
              |pr AS (
              |  SELECT query_id, neighbor_id,
              |         row_number() OVER (PARTITION BY query_id
              |                            ORDER BY cs DESC, neighbor_id) AS rank
              |  FROM ps),
              |pt AS (SELECT query_id, neighbor_id FROM pr WHERE rank <= 3)
              |SELECT bt.query_id,
              |       round(CAST(count(pt.query_id) AS DOUBLE) / 3.0, 6)
              |         AS recall_at_3
              |FROM bt LEFT JOIN pt ON pt.query_id = bt.query_id
              |                    AND pt.neighbor_id = bt.neighbor_id
              |GROUP BY bt.query_id ORDER BY bt.query_id""".stripMargin),
      doc = "PQ retrieval recall@3: full-precision queries vs the reconstructed corpus, against exact"),

    // Semantic decontamination: corpus items (vec_id >= 25) whose
    // embedding sits within cosine 0.3 of ANY eval-set embedding
    // (vec_id < 25) — the paraphrase-contamination audit n-gram overlap
    // can't see. Eval side broadcasts (BroadcastNestedLoopJoin); the
    // corpus never shuffles at full width; only flagged (id, cos)
    // rows reach the partial-aggregated max/count.
    Q("emb_decontaminate_semantic",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        graft.operators.Decontaminate.semanticContaminated(
            e.filter(col("vec_id") >= 25), e.filter(col("vec_id") < 25),
            "vec_id", "embedding", tau = 0.3)
          .orderBy(col("vec_id"))
      },
      Some(s"""WITH e AS (SELECT vec_id,
              |                  list_transform(embedding, x -> CAST(x AS DOUBLE)) v
              |           FROM embeddings),
              |ev AS (SELECT v AS evv FROM e WHERE vec_id < 25),
              |c AS (SELECT vec_id, v FROM e WHERE vec_id >= 25),
              |p AS (SELECT c.vec_id, ${cos("c.v", "ev.evv")} AS cs
              |      FROM c CROSS JOIN ev)
              |SELECT vec_id, count(*) AS n_eval_hits,
              |       round(max(cs), 6) AS max_cos
              |FROM p WHERE cs >= 0.3
              |GROUP BY vec_id ORDER BY vec_id""".stripMargin),
      doc = "semantic (embedding-cosine) decontamination vs a broadcast eval set — the paraphrase gap of n-gram decontamination"),

    // Cluster-capped selection (SemDeDup/DCLM cluster-balancing): at
    // most 5 per cluster, most-central first. Assignment is the
    // constant-folded argmax (ties to lowest cid — the oracle's
    // (cs DESC, cid) rank mirrors the scan keeping the first strict
    // max); the kept set and ranks are deterministic because random
    // float32 vectors make cosine ties measure-zero.
    Q("emb_cluster_capped",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        Similarity.clusterCappedSelect(emb, emb.filter(col("vec_id") < 16),
            "vec_id", "embedding", cap = 5)
          .orderBy(col("cluster"), col("rk"))
      },
      Some(s"""WITH e AS (SELECT vec_id,
              |                  list_transform(embedding, x -> CAST(x AS DOUBLE)) v
              |           FROM embeddings),
              |c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 16),
              |asg AS (
              |  SELECT vec_id, cid, cs,
              |         row_number() OVER (PARTITION BY vec_id
              |                            ORDER BY cs DESC, cid) AS rn
              |  FROM (SELECT e.vec_id, c.cid, ${cos("e.v", "c.cv")} AS cs
              |        FROM e CROSS JOIN c)),
              |a AS (SELECT vec_id, cid AS cluster, cs FROM asg WHERE rn = 1),
              |rk AS (SELECT vec_id, cluster, cs,
              |              row_number() OVER (PARTITION BY cluster
              |                                 ORDER BY cs DESC, vec_id) AS rk
              |       FROM a)
              |SELECT vec_id, cluster, CAST(rk AS INTEGER) AS rk,
              |       round(cs, 6) AS cos
              |FROM rk WHERE rk <= 5
              |ORDER BY cluster, rk""".stripMargin),
      doc = "cluster-capped selection: constant-folded centroid argmax + per-cluster top-5 most-central (SemDeDup/DCLM balancing)")
  )
}
