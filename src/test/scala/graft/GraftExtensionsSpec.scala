package graft

class GraftExtensionsSpec extends SparkSpec {

  test("SQL registration exposes the custom expressions") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT cosine_sim(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c,
        |       simhash64(array('a', 'b')) AS sh,
        |       rolling_hash64('hello world') AS rh,
        |       size(minhash_signature(array('a b c'), 16)) AS ms,
        |       tags_any_match(map('amenity', 'cafe'),
        |                      array('amenity=cafe', 'shop=bakery')) AS hit,
        |       tags_any_match(map('amenity', 'bar'),
        |                      array('amenity=cafe')) AS miss,
        |       shingle_set('a b c d', 3) AS shg,
        |       sign_sketch64(array(1.0d, 2.0d)) AS ss,
        |       size(ordered_pairs(array(1L, 2L, 3L))) AS op,
        |       graft_id_hash(42L) AS ih
        |""".stripMargin).head()
    assert(r.getDouble(0) == 1.0)
    assert(r.getLong(1) != 0L)
    assert(r.getLong(2) > 0L)
    assert(r.getInt(3) == 16)
    assert(r.getBoolean(4))
    assert(!r.getBoolean(5))
    assert(r.getSeq[String](6) == Seq("a b c", "b c d"))
    assert(r.getLong(7) == spark.sql(
      "SELECT sign_sketch64(array(2.0d, 4.0d))").head().getLong(0)) // scale-invariant
    assert(r.getInt(8) == 3)
    assert(r.getLong(9) == 1716251024L) // v3 pin, lockstep with SamplingSpec
  }

  test("extensions class injects every builder without error") {
    // A genuinely fresh SparkContext isn't possible in this shared JVM
    // (getOrCreate would return the live session and ignore the
    // extensions conf), so apply the extension object directly.
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
    assert(GraftExtensions.builders.map(_._1).toSet ==
      Set("cosine_sim", "minhash_signature", "simhash64",
        "rolling_hash64", "graft_id_hash", "tags_any_match", "sign_sketch64",
        "shingle_set", "shingle_list", "ordered_pairs", "winnow_set"))
  }
}
