package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** C1 escaping exact-pair goldens (decoded from filter.py:92-100) and
  * C2/C7 serialization (FIXTURES.md §A4).
  */
class HstoreCompatSpec extends SparkSpec {
  import spark.implicits._

  private def sanitizeOne(s: String): String =
    Seq(s).toDF("s").select(HstoreCompat.sanitize(col("s"))).as[String].head()

  test("C1: exact reference escaping pairs, including its quirks") {
    // plain text untouched
    assert(sanitizeOne("cafe") == "cafe")
    // quote → two backslashes + quote
    assert(sanitizeOne("a\"b") == "a\\\\\"b")
    // PAIR of backslashes quadruples; a SINGLE backslash is untouched
    // (reference quirk: "\\\\" in Python source is 2 chars)
    assert(sanitizeOne("a\\b") == "a\\b")
    assert(sanitizeOne("a\\\\b") == "a\\\\\\\\b")
    // LF, CR, LF+CR all → \\r ; TAB → \\t
    assert(sanitizeOne("a\nb") == "a\\\\rb")
    assert(sanitizeOne("a\rb") == "a\\\\rb")
    assert(sanitizeOne("a\n\rb") == "a\\\\rb")
    assert(sanitizeOne("a\tb") == "a\\\\tb")
    // CRLF (the likely-intended case) becomes TWO \\r (reference behavior)
    assert(sanitizeOne("a\r\nb") == "a\\\\r\\\\rb")
  }

  test("C2: hstore serialization with key sort and F9 trim") {
    val df = Seq((1L, Map("b" -> "2", "a" -> "1", "note" -> "x"))).toDF("id", "tags")
    val got = df.select(
      HstoreCompat.tagsAsHstore(col("tags"), trimTags = Seq("note"))).as[String].head()
    assert(got == "\"a\"=>\"1\",\"b\"=>\"2\"")
  }

  test("C7: TSV row shape with hex WKB") {
    val df = Seq((7L, 2, 13, java.sql.Timestamp.valueOf("2024-05-06 07:08:09"),
      99L, Map("k" -> "v"))).toDF("id", "version", "user_id", "tstamp", "changeset_id", "tags")
    val got = df.select(HstoreCompat.tsvRow(
      col("id"), col("version"), col("user_id"), col("tstamp"),
      col("changeset_id"), col("tags"),
      GeoFunctions.wkb_point(lit(2.0), lit(3.0)))).as[String].head()
    val parts = got.split("\t")
    assert(parts.length == 7)
    assert(parts(0) == "7" && parts(3) == "2024-05-06 07:08:09")
    assert(parts(5) == "\"k\"=>\"v\"")
    assert(parts(6) == "0101000000" + "0000000000000040" + "0000000000000840")
  }
}
