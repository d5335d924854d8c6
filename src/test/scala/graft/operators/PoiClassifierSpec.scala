package graft.operators

import graft.SparkSpec
import graft.functions.TagMatch
import graft.model.PoiSettings
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Unit tests for F1–F4/J1 on tiny in-memory frames (FIXTURES.md §A1
  * representative rows) plus probe-vs-relational cross-check on real
  * testdata.
  */
class PoiClassifierSpec extends SparkSpec {
  import spark.implicits._

  private val settings = PoiSettings(
    keys = Seq("amenity", "shop", "name"),
    minOccurrences = 1000L,
    excludeList = Seq(Seq("amenity=parking")))

  private val dimPairs = Seq(("amenity", "cafe"), ("amenity", "parking"), ("shop", "bakery"))

  private def nodes = Seq(
    (1L, Map("amenity" -> "cafe", "name" -> "X")),          // hit
    (2L, Map.empty[String, String]),                        // F1 drop: no tags
    (3L, Map("amenity" -> "cafe")),                         // hit unless skipNoName
    (4L, Map("amenity" -> "parking", "name" -> "P")),       // F3 exclusion drop
    (5L, Map("amenity" -> "obscure", "name" -> "Y")),       // F4 drop: not in dim
    (6L, Map("amenity" -> "cafe", "shop" -> "bakery", "name" -> "Z")), // 2 matches → 1 row
    (7L, Map("building" -> "yes", "name" -> "B"))           // F4 drop: key not of interest
  ).toDF("id", "tags")

  test("classify: F1 empty-tag drop, F3 exclusion, F4 membership, emit-once") {
    val got = PoiClassifier.classify(nodes, dimPairs, settings)
      .select("id").as[Long].collect().sorted
    assert(got.toSeq == Seq(1L, 3L, 6L))
  }

  test("classify: skipNoName (F2) additionally drops unnamed") {
    val got = PoiClassifier.classify(nodes, dimPairs, settings.copy(skipNoName = true))
      .select("id").as[Long].collect().sorted
    assert(got.toSeq == Seq(1L, 6L))
  }

  test("tags_any_match: null map and no-match maps are false") {
    val df = Seq(
      (1L, Map("a" -> "b")),
      (2L, Map("x" -> "y"))
    ).toDF("id", "tags")
      .filter(TagMatch.tagsAnyMatch(col("tags"), Seq(("a", "b"))))
    assert(df.select("id").as[Long].collect().toSeq == Seq(1L))
  }

  test("exclusion superset semantics: partial combo does not exclude") {
    // combo requires BOTH k=v pairs present (filter.py:170-173 set >= test)
    val df = Seq(
      (1L, Map("amenity" -> "parking", "fee" -> "yes")), // superset → excluded
      (2L, Map("fee" -> "yes"))                          // partial → kept
    ).toDF("id", "tags")
    val excl = Seq(Seq("amenity=parking", "fee=yes"))
    val got = df.filter(!PoiClassifier.matchesExclusion(col("tags"), excl))
      .select("id").as[Long].collect()
    assert(got.toSeq == Seq(2L))
  }

  test("probe and relational classify agree on testdata") {
    val s = PoiSettings(keys = Seq("orderstatus", "priority", "name"), minOccurrences = 1000L)
    val dim = TagDimension.prepare(Tables.classificationDimDf(spark), s)
    val pairs = TagDimension.toPairs(dim, s)
    val objs = Tables.osmNodes(spark, sf())
    val a = PoiClassifier.classify(objs, pairs, s).select("id")
    val b = PoiClassifier.classifyRelational(objs, dim, s).select("id")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    assert(a.count() > 0)
  }

  test("classification is invariant under tag-map key order") {
    val dimP = Seq(("amenity", "cafe"), ("shop", "bakery"))
    val s = PoiSettings(keys = Seq("amenity", "shop", "name"), minOccurrences = 1000L)
    val forward = Seq(
      (1L, Map("amenity" -> "cafe", "shop" -> "x", "name" -> "A")),
      (2L, Map("x" -> "1", "y" -> "2", "shop" -> "bakery"))
    ).toDF("id", "tags")
    val reversed = Seq(
      (1L, Map("name" -> "A", "shop" -> "x", "amenity" -> "cafe")),
      (2L, Map("shop" -> "bakery", "y" -> "2", "x" -> "1"))
    ).toDF("id", "tags")
    val a = PoiClassifier.classify(forward, dimP, s).select("id").as[Long].collect().sorted
    val b = PoiClassifier.classify(reversed, dimP, s).select("id").as[Long].collect().sorted
    assert(a.toSeq == b.toSeq && a.toSeq == Seq(1L, 2L))
  }

  test("dimension prepare: F5 drops ';' values and non-wiki, threshold applies") {
    val s = PoiSettings(keys = Seq("orderstatus", "priority"), minOccurrences = 1000L)
    val pairs = TagDimension.toPairs(
      TagDimension.prepare(Tables.classificationDimDf(spark), s), s)
    assert(pairs == Seq(
      ("orderstatus", "F"), ("orderstatus", "P"), ("priority", "1-URGENT")))
  }
}
