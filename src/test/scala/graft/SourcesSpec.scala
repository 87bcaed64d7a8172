package graft

import graft.core.TestData
import graft.operators.SkewJoin
import graft.sources.FactLogIO
import org.apache.spark.sql.functions._
import java.nio.file.Files

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  test("fact log writes partitioned-by-attribute and round-trips") {
    val dir = Files.createTempDirectory("graft-factlog").toString
    val db = TestData.eventsDb(spark, "/root/testdata/sf0.001")
    FactLogIO.write(db, dir, buckets = 2)
    // physical layout: one directory per attribute
    val parts = new java.io.File(s"$dir/facts").listFiles()
      .filter(_.isDirectory).map(_.getName).sorted
    assert(parts.toSeq === Seq("a=active", "a=last_type", "a=last_value", "a=purchase_bucket"))
    val back = FactLogIO.read(spark, dir)
    assert(back.attrTypes === db.attrTypes)
    assert(back.cardMany === db.cardMany)
    assert(back.log.count() === db.log.count())
    // snapshot semantics survive the round-trip
    val a = db.snapshot().filter(col("a") === "active").count()
    val b = back.snapshot().filter(col("a") === "active").count()
    assert(a === b && a > 0)
  }

  test("salted skew join equals the plain join") {
    val big = (1 to 1000).map(i => (if (i % 10 == 0) 1L else i.toLong, i))
      .toDF("k", "payload") // key 1 is hot
    val dim = Seq((1L, "hot"), (2L, "a"), (3L, "b")).toDF("k", "label")
    val plain = big.join(dim, "k").select("k", "payload", "label")
    val salted = SkewJoin.salted(big, dim, "k", salts = 4)
      .select("k", "payload", "label")
    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }
}
