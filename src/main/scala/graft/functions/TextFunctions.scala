package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Tokenization / shingling built entirely from codegen'd built-ins —
  * the shared text layer under the dedup and text-analysis operators.
  */
object TextFunctions {

  /** Whitespace tokens. */
  def words(text: Column): Column = split(text, " ")

  /** Distinct word-k-gram shingles ("a b c" style), the unit set for
    * Jaccard/MinHash dedup. Empty array when the text has < k words.
    */
  def shingleSet(text: Column, k: Int): Column = {
    val w = words(text)
    array_distinct(
      when(size(w) >= k,
        transform(sequence(lit(0), size(w) - k),
          i => concat_ws(" ", slice(w, i + 1, lit(k)))))
        .otherwise(array()))
  }
}
