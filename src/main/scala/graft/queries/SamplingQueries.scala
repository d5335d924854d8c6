package graft.queries

import graft.operators.Sampling
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Deterministic sampling queries over `documents`. The hash is plain
  * integer arithmetic ((id * 2654435761) % 2^32), so the DuckDB oracle
  * computes the identical sample — which is the point: the sample is an
  * engine-independent function of the data, not of a seed or partition
  * layout.
  */
object SamplingQueries {

  val all: Seq[Q] = Seq(

    Q("doc_sample_bernoulli",
      (s, dir) => Sampling.bernoulliByHash(Tables.documents(s, dir), "doc_id", 0.1)
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id, lang, n_chars
             |FROM documents
             |WHERE (doc_id * 2654435761) % 4294967296 < 429496729
             |ORDER BY doc_id""".stripMargin),
      doc = "deterministic ~10% Bernoulli sample by id hash (narrow filter, no RNG)"),

    Q("doc_sample_stratified",
      (s, dir) => Sampling.stratifiedByHash(Tables.documents(s, dir),
          stratumCol = "lang", idCol = "doc_id", n = 20)
        .select(col("doc_id"), col("lang"), col("rk"))
        .orderBy(col("lang"), col("rk")),
      Some("""SELECT doc_id, lang, rk FROM (
             |  SELECT doc_id, lang,
             |         CAST(row_number() OVER (
             |           PARTITION BY lang
             |           ORDER BY (doc_id * 2654435761) % 4294967296, doc_id)
             |           AS INTEGER) AS rk
             |  FROM documents)
             |WHERE rk <= 20
             |ORDER BY lang, rk""".stripMargin),
      doc = "deterministic stratified sample: 20 docs per language, smallest id-hashes win")
  )
}
