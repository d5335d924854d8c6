package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Value-level pins for catalog queries: the engine-independent belt
  * to the DuckDB-oracle braces (and the only value gate for
  * text_bpe_merges, whose iterative argmax has no oracle). A rows-only
  * check would keep passing with a broken bit in
  * SimHash64/RollingHash64; these content hashes fail on any value
  * change. Recompute (deliberately) by printing the same aggregate if
  * the kernels' hash definitions are intentionally revised.
  */
class GoldenOutputSpec extends SparkSpec {

  private def contentHash(name: String): (Long, String) = {
    val df = graft.SparkEntry.queries(name)(spark, sf())
    val h = df.select(xxhash64(concat_ws("|",
        df.columns.map(c => col(c).cast("string")).toIndexedSeq: _*)).as("h"))
      .agg(sum(col("h").cast("decimal(38,0)")))
      .head().getDecimal(0).toBigInteger.toString
    (df.count(), h)
  }

  test("dedup_simhash output is bit-stable (golden content hash)") {
    // r8: the catalog query moved to the oracle-portable token-hash
    // family (and gained a full DuckDB oracle); row count cross-checked
    // against an independent exact-arithmetic reference (625 at sf0.001)
    assert(contentHash("dedup_simhash") == ((625L, "-115058100784351564062")))
  }

  test("text_fingerprint_rolling output is bit-stable (golden content hash)") {
    assert(contentHash("text_fingerprint_rolling") == ((500L, "111465474591936582990")))
  }

  test("text_winnow_fingerprint output is bit-stable (golden content hash)") {
    assert(contentHash("text_winnow_fingerprint") ==
      ((13799L, "338014082844834428634")))
  }

  test("dedup_winnow_pairs output is bit-stable (golden content hash)") {
    assert(contentHash("dedup_winnow_pairs") == ((21L, "-38919771205913306528")))
  }

  test("text_bpe_merges output is bit-stable (golden content hash)") {
    assert(contentHash("text_bpe_merges") == ((8L, "-8506858618753235583")))
  }
}
