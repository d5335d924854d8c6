package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Deterministic scale-up of the driver testdata for stress runs:
  * replicate `documents`/`embeddings`/`events` from a source sf dir
  * `copies`× with per-copy transforms chosen so the WITHIN-copy
  * structure (near-dup clusters, per-user event streams, embedding
  * geometry) is preserved exactly while CROSS-copy similarity is
  * destroyed — so a C-copy corpus has exactly C× the rows, C× the dup
  * pairs, C× the users, and timing ratios measure the ENGINE's
  * scaling, not an artifact of replica collisions:
  *
  *   - documents: copy 0 is verbatim; copy c > 0 renames every
  *     whitespace token t → "t~c". A consistent token bijection
  *     preserves every shingle/Jaccard/MinHash/SimHash relation inside
  *     the copy and shares ZERO shingles (and essentially no token
  *     hashes) across copies.
  *   - embeddings: copy c cyclically rotates the vector by c mod dim
  *     positions and flips the sign once per full wrap (c div dim odd)
  *     — both orthogonal transforms, so norms and all within-copy
  *     cosines/dot-products are exactly preserved, while cross-copy
  *     cosine drops to the random-vector baseline (copies sharing a
  *     rotation — possible once copies exceed the dimension — differ
  *     by a global sign, which sends any above-threshold positive
  *     cosine to its negation, never to a false near-dup).
  *   - events: ids and user_ids shift per copy (new users, same
  *     per-user timelines), so sessionization/asof/funnel output
  *     scales exactly linearly.
  *
  * `usage: ScaleGen <srcSfDir> <dstDir> <copies>`; dst is laid out like
  * a driver sf dir, so Bench/QueryTime run against it unchanged. The
  * tool is ONLY for stress timing — the DuckDB oracle gate stays on the
  * driver's own sf0.01.
  */
object ScaleGen {
  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: ScaleGen <srcSfDir> <dstDir> <copies>")
    val (src, dst, copies) = (args(0), args(1), args(2).toInt)
    require(copies >= 1, s"copies must be >= 1: $copies")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val c = spark.range(copies).select(col("id").cast("int").as("__copy"))

    // Per-copy id offsets are fixed constants; a source whose ids reach
    // the offset would alias across copies (duplicate doc_id/user_id),
    // silently breaking the "exactly C× rows / C× users" invariant every
    // scaling measurement depends on — fail loudly instead.
    def assertIdHeadroom(table: String, idCol: String, offset: Long): Unit = {
      val mx = spark.read.parquet(s"$src/$table.parquet")
        .agg(max(col(idCol))).head.getLong(0)
      require(mx < offset,
        s"$table.$idCol max $mx >= per-copy offset $offset: copies would alias")
    }
    assertIdHeadroom("documents", "doc_id", 1000000L)
    assertIdHeadroom("embeddings", "vec_id", 1000000L)

    // documents: token bijection t → t~c per copy (copy 0 verbatim)
    val docs = spark.read.parquet(s"$src/documents.parquet")
    docs.crossJoin(c).select(
        (col("doc_id") + col("__copy").cast("long") * 1000000L).as("doc_id"),
        when(col("__copy") === 0, col("text")).otherwise(
          array_join(transform(split(col("text"), " "),
            t => concat(t, lit("~"), col("__copy"))), " ")).as("text"),
        col("lang"), col("source"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .repartition(col("doc_id"))
      .write.mode("overwrite").parquet(s"$dst/documents.parquet")

    // embeddings: cyclic rotation by (__copy mod dim) + sign flip per
    // wrap — orthogonal at any copy count (see scaladoc)
    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    emb.crossJoin(c).select(
        (col("vec_id") + col("__copy").cast("long") * 1000000L).as("vec_id"),
        expr("""transform(
                  concat(
                    slice(embedding, pmod(__copy, size(embedding)) + 1,
                          size(embedding) - pmod(__copy, size(embedding))),
                    slice(embedding, 1, pmod(__copy, size(embedding)))),
                  x -> x * cast(1 - 2 * ((__copy div size(embedding)) % 2) as float))
             """).as("embedding"),
        col("label"))
      .repartition(col("vec_id"))
      .write.mode("overwrite").parquet(s"$dst/embeddings.parquet")

    // events: readEvents resolves whichever ts encoding the source
    // generation carries (TIMESTAMP(NANOS)-as-INT64 vs native micros);
    // the copy writes plain TimestampType, which it also reads back
    val ev = graft.sources.Tables.readEvents(spark, s"$src/events.parquet")
    // same aliasing guard for the two event-side id spaces (see above)
    locally {
      val r = ev.agg(max(col("event_id")), max(col("user_id"))).head
      require(r.getLong(0) < 10000000L,
        s"events.event_id max ${r.getLong(0)} >= per-copy offset 10000000")
      require(r.getLong(1) < 100000L,
        s"events.user_id max ${r.getLong(1)} >= per-copy offset 100000")
    }
    ev.crossJoin(c).select(
        (col("event_id") + col("__copy").cast("long") * 10000000L).as("event_id"),
        col("ts"),
        (col("user_id") + col("__copy").cast("long") * 100000L).as("user_id"),
        col("event_type"), col("value"), col("props"))
      .repartition(col("event_id"))
      .write.mode("overwrite").parquet(s"$dst/events.parquet")

    // part + orders scale too (round 15): they derive the OSM-shaped
    // geo tables (osmWays from part, osmNodes/points from orders), so
    // the geo operators get TRUE decade rows instead of riding an
    // unscaled table. The key offsets are multiples of the % 20 / % 2
    // / % 5 / % 10 filter moduli (so per-copy FILTER structure is
    // preserved), but NOT of the % 120 / % 97 coordinate laws
    // (10000000 % 120 = 40, 100000000 % 97 = 81) — copies SCATTER in
    // latitude rather than stacking on one lattice, which combined
    // with the price nudges makes the world denser the realistic way
    // a corpus grows. Oracles recompute from the scaled parquet, so
    // hash correctness never depended on lattice preservation. The
    // other TPC-H tables stay single-copy (not stress-targeted).
    locally {
      val part = spark.read.parquet(s"$src/part.parquet")
      val orders = spark.read.parquet(s"$src/orders.parquet")
      require(part.agg(max(col("p_partkey"))).head.getLong(0) < 10000000L,
        "part.p_partkey would alias across copies")
      require(orders.agg(max(col("o_orderkey"))).head.getLong(0) < 100000000L,
        "orders.o_orderkey would alias across copies")
      part.crossJoin(c).select(
          (col("p_partkey") + col("__copy").cast("long") * 10000000L)
            .as("p_partkey") +:
          part.columns.filter(_ != "p_partkey").map {
            case "p_retailprice" =>
              (col("p_retailprice") + col("__copy") * 0.37).as("p_retailprice")
            case other => col(other)
          }.toIndexedSeq: _*)
        .repartition(col("p_partkey"))
        .write.mode("overwrite").parquet(s"$dst/part.parquet")
      orders.crossJoin(c).select(
          (col("o_orderkey") + col("__copy").cast("long") * 100000000L)
            .as("o_orderkey") +:
          orders.columns.filter(_ != "o_orderkey").map {
            case "o_totalprice" =>
              (col("o_totalprice") + col("__copy") * 0.13).as("o_totalprice")
            case other => col(other)
          }.toIndexedSeq: _*)
        .repartition(col("o_orderkey"))
        .write.mode("overwrite").parquet(s"$dst/orders.parquet")
    }

    // the rest of the TPC-H side isn't stress-targeted; cheap copy so
    // catalog queries that touch those tables still resolve against dst
    Seq("region", "nation", "customer", "supplier", "lineitem")
      .foreach { t =>
        spark.read.parquet(s"$src/$t.parquet")
          .write.mode("overwrite").parquet(s"$dst/$t.parquet")
      }
    println(s"[scalegen] wrote $dst at ${copies}x of $src")
    spark.stop()
  }
}
