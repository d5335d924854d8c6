package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the normalize contract the DuckDB oracle checks globally:
  * NFC-compose, strip C0-controls-minus-ws + DEL, collapse ASCII ws
  * runs, trim - and the deliberate NON-behaviors (NBSP and other
  * Unicode spaces preserved). Non-ASCII and control chars are spelled
  * as escape sequences so the source carries no invisible bytes.
  */
class NormalizeTextSpec extends SparkSpec {
  import spark.implicits._

  private def norm(s: String): String = {
    val out = Seq(Tuple1(s)).toDF("t")
      .select(TextFunctions.normalizeText(col("t")).as("n"))
      .collect()(0)
    if (out.isNullAt(0)) null else out.getString(0)
  }

  test("NFC composes combining sequences") {
    assert(norm("cafe\u0301") == "caf\u00e9")
    // already-composed input is a fixpoint
    assert(norm("caf\u00e9") == "caf\u00e9")
  }

  test("C0 controls and DEL stripped; ASCII ws controls collapse instead") {
    assert(norm("A\u0001B\u0002C\u007f!") == "ABC!")
    assert(norm("A\tB\nC\rD\u000bE\fF") == "A B C D E F")
  }

  test("whitespace runs collapse to one space and edges trim") {
    assert(norm("  a \t\n  b  ") == "a b")
    assert(norm("   \t \n ") == "")
    assert(norm("") == "")
  }

  test("a control inside a ws run does not split the run") {
    // strip-then-collapse semantics: a, ws, ctl, ws, b -> one space
    assert(norm("a \u0002 b") == "a b")
  }

  test("Unicode spaces are preserved, not collapsed") {
    assert(norm("X\u00a0Y") == "X\u00a0Y") // NBSP
    assert(norm("X\u2007Y") == "X\u2007Y") // figure space
    assert(norm(" \u00a0X\u00a0  ") == "\u00a0X\u00a0") // ASCII edges still trim
  }

  test("null in, null out") {
    assert(norm(null) == null)
  }

  test("kernel == NFC + strip + collapse + trim regex-chain reference") {
    val gnarly = Seq(
      "plain ascii text", "e\u0301\u0302 stack", "\u0007 mixed\u0003ctl",
      "tab\tand\u000bvertical", "nb\u00a0sp", "  lead", "trail  ",
      "a \u0001\t b", "\ud83d\ude00 emoji \ud83d\ude00",
      "A\u030aring", "\u212b angstrom sign")
    for (s <- gnarly) {
      val ref = java.text.Normalizer
        .normalize(s, java.text.Normalizer.Form.NFC)
        .replaceAll("[\\x00-\\x08\\x0E-\\x1F\\x7F]", "")
        .replaceAll("[ \\t\\n\\r\\x0B\\x0C]+", " ")
        .replaceAll("^ | $", "")
      assert(norm(s) == ref,
        "input=" + s.map(c => f"\\u${c.toInt}%04x").mkString)
    }
  }
}
