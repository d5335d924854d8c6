package graft.streaming

import graft.functions.TextFunctions
import graft.operators.{Sampling, TextAnalysis}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One-call STREAMING ingest pipeline — the reference's actual runtime
  * shape (a bounded one-pass push stream filtered row-by-row into a
  * sink, filter.py:192-211) generalized to an unbounded corpus stream:
  *
  *   mixture-sample → Gopher quality gate → eval-set decontamination →
  *   exact dedup → (caller's writeStream / microBatchParquetSink)
  *
  * Every stage before dedup is STATELESS per row (hash filter, fused
  * quality kernels, a broadcast shingle probe), so they run unchanged
  * in append mode at any scale; the only streaming state is exact
  * dedup's watermark-bounded hash set
  * ([[EventStream.dedupExactStream]]). This is deliberately the
  * ingest-side SUBSET of [[graft.operators.CorpusPipeline]]: stages
  * that need corpus-global coordination (near-dup connected
  * components, pack layout, epoch replication) belong in the batch
  * pipeline over the accumulated sink — the standard stream-ingest /
  * batch-curate split, same contract as the streaming heavy-hitter
  * candidates vs their batch verify.
  *
  * Decontamination probes a driver-collected eval shingle array via
  * `arrays_overlap` (hash-set probe per row, no UDF, no join, no
  * state). The eval corpus is small by contract — the same
  * bounded-collect class as ANN centroids; for an eval set too big to
  * ship as a literal, run [[graft.operators.Decontaminate]]'s Bloom
  * path batch-side instead.
  */
object CorpusStream {

  final case class StreamSettings(
      idCol: String = "doc_id",
      textCol: String = "text",
      sourceCol: String = "source",
      tsCol: String = "ts",
      mixtureRates: Map[String, Double] = Map.empty,
      defaultRate: Double = 1.0,
      gopherFilter: Boolean = true,
      gopherMinWords: Long = 50L,
      gopherMaxWords: Long = 100000L,
      decontaminateK: Int = 3,
      dedupExact: Boolean = true)

  /** `docs` must already carry a watermark on `tsCol` when `dedupExact`
    * is on (the [[EventStream.dedupExactStream]] contract).
    */
  def run(docs: DataFrame, evalCorpus: Option[DataFrame],
      s: StreamSettings = StreamSettings()): DataFrame = {
    var cur = docs
    if (s.mixtureRates.nonEmpty)
      cur = Sampling.mixtureByHash(cur, s.idCol, s.sourceCol,
        s.mixtureRates, s.defaultRate)
    if (s.gopherFilter)
      cur = cur.filter(TextAnalysis.gopherPass(col(s.textCol),
        minWords = s.gopherMinWords, maxWords = s.gopherMaxWords))
    evalCorpus.foreach { ev =>
      cur = cur.filter(!arrays_overlap(
        TextFunctions.shingleSet(col(s.textCol), s.decontaminateK),
        evalShingleLit(ev, s.textCol, s.decontaminateK)))
    }
    if (s.dedupExact) cur = EventStream.dedupExactStream(cur, s.textCol)
    cur
  }

  /** Distinct eval shingles as a sorted literal array (deterministic
    * plan; collected once at plan build, NOT per micro-batch).
    */
  private def evalShingleLit(evalCorpus: DataFrame, textCol: String,
      k: Int): Column = {
    val sh = evalCorpus
      .select(explode(TextFunctions.shingleSet(col(textCol), k)).as("sh"))
      .distinct().orderBy(col("sh"))
      .collect().map(_.getString(0))
    array(sh.map(lit).toIndexedSeq: _*)
  }
}
