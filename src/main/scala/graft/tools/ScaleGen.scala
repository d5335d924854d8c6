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
  * `usage: ScaleGen <srcSfDir> <dstDir> <copies> [mog:<clusters>:<noise>]`;
  * dst is laid out like
  * a driver sf dir, so Bench/QueryTime run against it unchanged. The
  * tool is ONLY for stress timing — the DuckDB oracle gate stays on the
  * driver's own sf0.01.
  *
  * The optional `mog:<clusters>:<noise>` mode (r19 — the verdict's
  * clustered-embedding gap: the replicated corpus keeps cross-copy
  * cosine at the random baseline, so the ivfsweep recall curve could
  * only measure the scan-fraction floor) writes ONLY
  * `embeddings.parquet`: srcRows × copies vectors drawn from a
  * deterministic mixture of Gaussians ([[mogEmbedding]] — hash-seeded
  * centers uniform in [-1,1]^dim, Irwin–Hall(4) pseudo-normal noise
  * scaled by `noise`, ground-truth cluster in `label`). Pair it with
  * an existing replicated dir (symlink the other tables) for probe
  * runs that need documents/events too.
  */
object ScaleGen {
  /** Deterministic clustered embedding for `vecId`: cluster
    * `pmod(xxhash64('mog-cl', id), clusters)`, value per dimension
    * `center(cl, d) + noise · irwinHall4(id, d)`. Everything derives
    * from xxhash64 of literal-tagged keys — no RNG state, so the same
    * (id, dim, clusters, noise) always yields the same vector on any
    * cluster layout, and the corpus regenerates bit-identically.
    * Centers are uniform per dimension in [-1, 1] (expected pairwise
    * center distance ~ sqrt(2·dim/3), ≈ 6.5 at dim 64); the
    * Irwin–Hall(4) sum of four uniforms halved is a pseudo-normal
    * with σ ≈ 0.577, so `noise` = 0.3 gives per-vector displacement
    * ≈ 0.3·0.577·sqrt(dim) ≈ 1.4 — tight, well-separated clusters a
    * real embedding model produces and the replicated corpus cannot.
    */
  def mogEmbedding(vecId: org.apache.spark.sql.Column, dim: Int,
      clusters: Int, noise: Double): org.apache.spark.sql.Column = {
    require(dim > 0 && clusters > 0 && noise >= 0)
    val cl = pmod(xxhash64(lit("mog-cl"), vecId), lit(clusters.toLong))
    def u(tag: String, a: org.apache.spark.sql.Column,
        b: org.apache.spark.sql.Column) =
      pmod(xxhash64(lit(tag), a, b), lit(1000003L)) / 500001.5 - 1.0
    transform(sequence(lit(0), lit(dim - 1)), d => {
      val g = (u("mog-n1", vecId, d) + u("mog-n2", vecId, d) +
        u("mog-n3", vecId, d) + u("mog-n4", vecId, d)) / 2.0
      (u("mog-center", cl, d) + lit(noise) * g).cast("float")
    })
  }

  def main(args: Array[String]): Unit = {
    require(args.length == 3 || args.length == 4,
      "usage: ScaleGen <srcSfDir> <dstDir> <copies> [mog:<clusters>:<noise>]")
    val (src, dst, copies) = (args(0), args(1), args(2).toInt)
    require(copies >= 1, s"copies must be >= 1: $copies")
    val mog = args.lift(3).map { m =>
      val p = m.split(":")
      require(p.length == 3 && p(0) == "mog",
        s"4th arg must be mog:<clusters>:<noise>, got $m")
      (p(1).toInt, p(2).toDouble)
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val c = spark.range(copies).select(col("id").cast("int").as("__copy"))

    if (mog.isDefined) {
      val (kCl, noise) = mog.get
      val emb = spark.read.parquet(s"$src/embeddings.parquet")
      require(emb.agg(max(col("vec_id"))).head.getLong(0) < 1000000L,
        "embeddings.vec_id would alias across copies")
      val dim = emb.select(size(col("embedding"))).head.getInt(0)
      emb.crossJoin(c).select(
          (col("vec_id") + col("__copy").cast("long") * 1000000L)
            .as("vec_id"))
        .withColumn("embedding",
          mogEmbedding(col("vec_id"), dim, kCl, noise))
        .withColumn("label", concat(lit("c"),
          pmod(xxhash64(lit("mog-cl"), col("vec_id")), lit(kCl.toLong))))
        .repartition(col("vec_id"))
        .write.mode("overwrite").parquet(s"$dst/embeddings.parquet")
      println(s"[scalegen] mog embeddings: ${copies} copies x src rows, " +
        s"dim=$dim clusters=$kCl noise=$noise -> $dst/embeddings.parquet")
      spark.stop()
      return
    }

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
