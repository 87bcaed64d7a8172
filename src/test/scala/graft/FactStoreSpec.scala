package graft

import graft.core.{FactDb, FactStore}
import org.apache.spark.sql.Row

/** Version-resolution semantics, mirroring the reference's cardinality
  * test (/root/reference/test/unifydb/query_test.clj:150-175): Bob's
  * "blue" is retracted, Joe's lucky-number is superseded. */
class FactStoreSpec extends SparkSpec {

  private def db(facts: Seq[(Long, String, String, Long, Boolean)],
                 many: Set[String]): FactDb = {
    val rows = facts.map { case (e, a, v, tx, added) =>
      Row(e, a, "s", v, null, null, null, null, tx, added)
    }
    FactDb(
      spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), FactStore.factSchema),
      Map("favorite-colors" -> "vstr", "name" -> "vstr", "lucky" -> "vstr"),
      cardMany = many)
  }

  private val facts = Seq(
    (2L, "name", "Bob", 0L, true),
    (2L, "favorite-colors", "red", 0L, true),
    (2L, "favorite-colors", "green", 0L, true),
    (2L, "favorite-colors", "blue", 0L, true),
    (2L, "favorite-colors", "blue", 1L, false),
    (3L, "name", "Emily", 2L, true),
    (3L, "favorite-colors", "yellow", 2L, true),
    (4L, "lucky", "7", 3L, true),
    (4L, "lucky", "9", 4L, true),
    (4L, "lucky", "9", 5L, false))

  test("cardinality-many keeps all live values, retraction removes one") {
    val snap = db(facts, Set("favorite-colors")).snapshot()
    val colors = snap.filter(snap("a") === "favorite-colors")
      .select("e", "vstr").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(colors === Set((2L, "red"), (2L, "green"), (3L, "yellow")))
  }

  test("cardinality-one keeps latest live value") {
    val snap = db(facts, Set("favorite-colors")).snapshot()
    val lucky = snap.filter(snap("a") === "lucky").select("vstr").collect()
    // 9 was retracted at tx5 -> 7 is the surviving value
    assert(lucky.map(_.getString(0)).toSeq === Seq("7"))
  }

  test("as-of bounds visibility") {
    val snap = db(facts, Set("favorite-colors")).snapshot(asOfTx = 4L)
    val lucky = snap.filter(snap("a") === "lucky").select("vstr").collect()
    assert(lucky.map(_.getString(0)).toSeq === Seq("9")) // retraction not yet visible
  }

  test("historical returns every version") {
    val hist = db(facts, Set.empty).historical()
    assert(hist.filter(hist("a") === "favorite-colors").count() === 5)
  }

  test("entity point read resolves versions and honors asOfTx") {
    val d = db(facts, Set("favorite-colors"))
    // live view: Bob's blue retracted, colors are the two survivors
    val bob = d.entity(2L).collect()
      .map(r => (r.getString(0), r.getString(2))).toSet
    assert(bob === Set(("name", "Bob"),
      ("favorite-colors", "red"), ("favorite-colors", "green")))
    // as-of view before the lucky=9 retraction: 9 is still the value
    val lucky4 = d.entity(4L, asOfTx = 4L).collect()
      .map(r => (r.getString(0), r.getString(2))).toSet
    assert(lucky4 === Set(("lucky", "9")))
    // after the retraction the superseded 7 survives
    val lucky = d.entity(4L).collect()
      .map(r => (r.getString(0), r.getString(2))).toSet
    assert(lucky === Set(("lucky", "7")))
  }

  test("card-one same-tx tie resolves deterministically (largest value wins)") {
    // Two different values asserted for a cardinality-one attribute in
    // the SAME tx: graft pins "largest value wins" via the value-column
    // tie-breakers (the reference's whole-tuple sort is deterministic
    // too, by (value, tx) order — divergence documented in FactStore).
    val tie = Seq(
      (9L, "lucky", "a", 1L, true),
      (9L, "lucky", "b", 1L, true))
    (1 to 3).foreach { _ =>
      val snap = db(tie, Set.empty).snapshot()
      val v = snap.filter(snap("a") === "lucky").select("vstr").collect()
      assert(v.map(_.getString(0)).toSeq === Seq("b"))
    }
  }

  test("melt produces one fact per non-null column value") {
    import spark.implicits._
    val df = Seq((1L, "x", 2.0), (2L, "y", 3.0)).toDF("id", "s", "d")
    val melted = FactStore.melt(df, org.apache.spark.sql.functions.col("id"), 100L, 1L)
    assert(melted.count() === 6) // id, s, d per row
    assert(melted.select("e").distinct().collect().map(_.getLong(0)).toSet === Set(101L, 102L))
  }
}
