package graft

import graft.functions.{CosineSimilarity, IdHash, MinHashSignature, OrderedPairs, RollingHash64, ShingleList, ShingleSet, SignSketch64, SimHash64, TagsAnyMatch, WinnowSet}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.unsafe.types.UTF8String

/** SQL surface for graft's custom expressions.
  *
  * Two registration paths:
  *   - `spark.sql.extensions=graft.GraftExtensions` at session build
  *     (the standard plugin route), or
  *   - `GraftExtensions.register(spark)` on a live session.
  *
  * SQL signatures:
  *   - `cosine_sim(array<double>, array<double>) -> double`
  *   - `minhash_signature(array<string>, numHashes int) -> array<bigint>`
  *   - `simhash64(array<string> [, portable boolean]) -> bigint`
  *   - `rolling_hash64(string) -> bigint`
  *   - `graft_id_hash(bigint) -> bigint` (the v3 portable sampling hash)
  *   - `sign_sketch64(array<float|double>) -> bigint` (cosine LSH)
  *   - `shingle_set(string, k int) -> array<string>`
  *   - `shingle_list(string, k int) -> array<string>` (non-distinct)
  *   - `winnow_set(string, k int, w int) -> array<bigint>` (MOSS fingerprints)
  *   - `ordered_pairs(array<bigint>) -> array<struct<id_a,id_b>>`
  *   - `tags_any_match(map<string,string>, array<string 'k=v'>) -> boolean`
  *     (the dimension argument must be a foldable literal array — it IS
  *     the broadcast build side)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  def apply(e: SparkSessionExtensions): Unit =
    GraftExtensions.builders.foreach { case (name, b) =>
      e.injectFunction(
        (org.apache.spark.sql.catalyst.FunctionIdentifier(name),
          new org.apache.spark.sql.catalyst.expressions.ExpressionInfo("graft", name),
          b))
    }
}

object GraftExtensions {

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def boolArg(e: Expression, what: String): Boolean = e match {
    case Literal(v: Boolean, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be a boolean literal, got $other")
  }

  private def pairsArg(e: Expression): Seq[(String, String)] = e match {
    case l: Literal if l.foldable =>
      l.value.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toArray[UTF8String](org.apache.spark.sql.types.StringType)
        .map { s =>
          val kv = s.toString.split("=", 2)
          require(kv.length == 2, s"dimension entry '$s' is not 'key=value'")
          (kv(0), kv(1))
        }.toSeq
    case other =>
      // allow CreateArray of string literals too
      val folded = other match {
        case c if c.foldable =>
          c.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
            .toArray[UTF8String](org.apache.spark.sql.types.StringType)
            .map(_.toString)
        case _ => throw new IllegalArgumentException(
          "tags_any_match dimension must be a foldable array of 'key=value' strings")
      }
      folded.map { s =>
        val kv = s.split("=", 2)
        require(kv.length == 2, s"dimension entry '$s' is not 'key=value'")
        (kv(0), kv(1))
      }.toSeq
  }

  private[graft] val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "cosine_sim" -> (es => CosineSimilarity(es(0), es(1))),
    "minhash_signature" -> (es =>
      MinHashSignature(es(0), intArg(es(1), "minhash_signature numHashes"))),
    "simhash64" -> (es => SimHash64(es(0),
      if (es.length > 1) boolArg(es(1), "simhash64 portable") else false)),
    "rolling_hash64" -> (es => RollingHash64(es(0))),
    "graft_id_hash" -> (es => IdHash(es(0))),
    "sign_sketch64" -> (es => SignSketch64(es(0))),
    "shingle_set" -> (es => ShingleSet(es(0), intArg(es(1), "shingle_set k"))),
    "shingle_list" -> (es => ShingleList(es(0), intArg(es(1), "shingle_list k"))),
    "ordered_pairs" -> (es => OrderedPairs(es(0))),
    "winnow_set" -> (es => WinnowSet(es(0),
      intArg(es(1), "winnow_set k"), intArg(es(2), "winnow_set w"))),
    "tags_any_match" -> (es => TagsAnyMatch(es(0), pairsArg(es(1))))
  )

  /** Imperative registration on an existing session. */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, b) => Bridge.registerFunction(spark, name, b) }
}
