package graft.streaming

import graft.SparkSpec
import graft.operators.{Decontaminate, Sampling, TextAnalysis}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The training-data operators that matter for INGEST-TIME processing
  * are narrow (filters/projections) or stream-static broadcast joins,
  * so they run UNCHANGED on a readStream in append mode — this spec
  * pins that composition: the same operator objects, fed a stream,
  * produce exactly their batch output. (Aggregating operators — dedup
  * clustering, repetition stats — are batch/micro-batch territory by
  * design; `EventStream` covers the stateful streaming surface.)
  */
class StreamingPipelineSpec extends SparkSpec {
  import spark.implicits._

  private val docRows: Seq[(Long, String, String)] = (0L until 200L).map { i =>
    val src = s"src${i % 4}"
    val text = if (i % 7 == 0) "the quick brown fox jumps far today"
    else s"document number $i with some words ${"x" * (i % 5).toInt}"
    (i, src, text)
  }

  test("mixture sampling + langId compose on a stream, append mode, == batch") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Long, String, String)]
    val streamed = in.toDF().toDF("doc_id", "source", "text")
    def pipeline(df: org.apache.spark.sql.DataFrame) =
      TextAnalysis.langId(
        Sampling.mixtureByHash(df, "doc_id", "source",
          Map("src0" -> 1.0, "src1" -> 0.5), defaultRate = 0.25),
        "doc_id", "text")

    val q = pipeline(streamed)
      .writeStream.format("memory").queryName("mix_out").outputMode("append")
      .start()
    in.addData(docRows.take(120))
    q.processAllAvailable()
    in.addData(docRows.drop(120))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("mix_out").as[(Long, String)].collect().toSet
    val want = pipeline(docRows.toDF("doc_id", "source", "text"))
      .as[(Long, String)].collect().toSet
    assert(got == want && got.nonEmpty)
  }

  test("mixture + streaming near-dup compose: pairs == batch LSH over the survivors") {
    implicit val sc = spark.sqlContext
    import org.apache.spark.sql.functions._
    // plant near-dups across the mixture survivors: every 11th doc is
    // a suffix-extended copy of doc (i - 11)
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val rows: Seq[(Long, String, String)] = (0L until 100L).map { i =>
      val text = if (i % 11 == 0) base + (" pad" * (i % 2).toInt)
      else s"unique document $i " + (0 to 12).map(j => s"w$i$j").mkString(" ")
      (i, s"src${i % 4}", text)
    }
    val in = MemoryStream[(Long, String, String)]
    val streamed = in.toDF().toDF("doc_id", "source", "text")
      .withColumn("ts", expr("timestamp_millis(3600000 + doc_id * 1000)"))
      .withWatermark("ts", "10 minutes")
    val mixed = Sampling.mixtureByHash(streamed, "doc_id", "source",
      Map("src0" -> 1.0, "src1" -> 1.0), defaultRate = 0.5)
    val q = EventStream.nearDupStream(mixed, "doc_id", "text", "ts",
        k = 3, threshold = 0.8, bands = 16, rowsPerBand = 2)
      .writeStream.format("memory").queryName("mixdup_out")
      .outputMode("append").start()
    in.addData(rows.take(60))
    q.processAllAvailable()
    in.addData(rows.drop(60))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("mixdup_out")
      .select(col("id_a"), col("id_b")).as[(Long, Long)].collect().toSet
    val batchMixed = Sampling.mixtureByHash(
      rows.toDF("doc_id", "source", "text"), "doc_id", "source",
      Map("src0" -> 1.0, "src1" -> 1.0), defaultRate = 0.5)
    val want = graft.operators.Dedup.minhashLshPairs(
        batchMixed, "doc_id", "text", k = 3, threshold = 0.8,
        bands = 16, rowsPerBand = 2)
      .select(col("id_a"), col("id_b")).as[(Long, Long)].collect().toSet
    assert(want.nonEmpty, "fixture must keep some planted near-dup pairs")
    assert(got == want, s"stream=${got.toSeq.sorted} batch=${want.toSeq.sorted}")
  }

  test("stream-side decontamination: broadcast eval probe works per micro-batch") {
    implicit val sc = spark.sqlContext
    val evalSet = Seq((1L, "the quick brown fox jumps far")).toDF("doc_id", "text")
    val in = MemoryStream[(Long, String, String)]
    val streamed = in.toDF().toDF("doc_id", "source", "text")
    // contaminated() aggregates per doc — fine in update/complete mode;
    // the ingest-time form is the FILTER (keep clean docs), which is a
    // stream-static left-anti... not supported in append streams, so the
    // standard composition is an inner flag-join inversion: keep docs
    // with zero shared shingles via the broadcast bloom/set probe at
    // the row level. Here: flag rows whose shingles hit the eval set.
    import org.apache.spark.sql.functions._
    import graft.functions.TextFunctions
    val evalShingles = evalSet
      .select(explode(TextFunctions.shingleSet(col("text"), 3)).as("sh"))
      .distinct().as[String].collect().toSet
    val hit = udf((t: String) => {
      // the broadcast-set probe, as an ingest-time row filter
      val words = t.split(" ", -1)
      words.sliding(3).exists(w => w.length == 3 && evalShingles(w.mkString(" ")))
    })
    val q = streamed.filter(!hit(col("text")))
      .select(col("doc_id"))
      .writeStream.format("memory").queryName("clean_out").outputMode("append")
      .start()
    in.addData(docRows)
    q.processAllAvailable()
    q.stop()

    val kept = spark.table("clean_out").as[Long].collect().toSet
    val batchKept = Decontaminate.decontaminate(
        docRows.toDF("doc_id", "source", "text"), evalSet, "doc_id", "text", k = 3)
      .select(col("doc_id")).as[Long].collect().toSet
    assert(kept == batchKept)
    assert(docRows.filter(_._1 % 7 == 0).map(_._1).toSet.intersect(kept).isEmpty)
  }

  test("CorpusStream.run: full ingest chain across micro-batches == the batch chain") {
    implicit val sc = spark.sqlContext
    import org.apache.spark.sql.functions._
    def t(min: Int) = new java.sql.Timestamp(3600000L + min * 60000L)
    val longBase = ("the cats and dogs run to a tree in town " * 6).trim
    val evalPhrase = "zebras graze beside the quiet river bend"
    // per-id fates: src b -> mixture-dropped; short text -> gopher-
    // dropped; eval phrase inside -> decontaminated; 10 duplicates 2's
    // text and arrives in batch 2 -> deduped
    val rows: Seq[(Long, java.sql.Timestamp, String, String)] =
      (0L until 12L).map { i =>
        val src = if (i == 5L || i == 11L) "b" else "a"
        val text =
          if (i == 10L) longBase + " copy two"
          else if (i == 4L) "tiny text"
          else if (i == 7L) longBase + " " + evalPhrase
          else longBase + (if (i == 2L) " copy two" else s" item i$i")
        (i, t(i.toInt), src, text)
      }
    val evalDf = Seq((99L, evalPhrase)).toDF("doc_id", "text")
    val settings = CorpusStream.StreamSettings(
      mixtureRates = Map("a" -> 1.0), defaultRate = 0.0)

    val in = MemoryStream[(Long, java.sql.Timestamp, String, String)]
    val stream = CorpusStream.run(
      in.toDF().toDF("doc_id", "ts", "source", "text")
        .withWatermark("ts", "10 minutes"),
      Some(evalDf), settings)
    val q = stream.writeStream.format("memory").queryName("corpus_stream_out")
      .outputMode("append").start()
    in.addData(rows.take(8): _*)
    q.processAllAvailable()
    in.addData(rows.drop(8): _*) // doc 10 dedups against batch-1 state
    q.processAllAvailable()
    q.stop()
    val got = spark.table("corpus_stream_out")
      .select(col("doc_id")).as[Long].collect().toSet

    // the batch chain, each stage the library's own primitive
    val docsDf = rows.toDF("doc_id", "ts", "source", "text")
    val b1 = Sampling.mixtureByHash(docsDf, "doc_id", "source",
      settings.mixtureRates, settings.defaultRate)
    val b2 = b1.filter(TextAnalysis.gopherPass(col("text")))
    val b3 = Decontaminate.decontaminate(b2, evalDf, "doc_id", "text", k = 3)
    val want = graft.operators.Dedup.exactCanonical(b3, "doc_id", "text")
      .filter(col("doc_id") === col("canonical_id"))
      .select(col("doc_id")).as[Long].collect().toSet

    assert(got == want, s"stream=${got.toSeq.sorted} batch=${want.toSeq.sorted}")
    // every stage dropped its intended victim
    assert(!got.contains(5L) && !got.contains(11L)) // src b
    assert(!got.contains(4L))  // gopher: 2 words
    assert(!got.contains(7L))  // contaminated
    assert(got.contains(2L) && !got.contains(10L)) // exact dup, first kept
    assert(got.contains(0L) && got.contains(1L))
  }
}
