package graft

import graft.core.TestData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row

/** Regression guard for the events.ts physical-encoding drift that
  * broke 8 queries in rounds 9-10: the driver regenerated
  * events.parquet from INT64 TIMESTAMP(NANOS) to timestamp[us]
  * (TIMESTAMP_NTZ in Spark) and the fixed `cast("long")` loader threw
  * DATATYPE_MISMATCH at analysis. TestData.tsNs must map every
  * plausible encoding of the SAME instants to the SAME epoch-nanos,
  * end-to-end through a parquet round-trip, so the next regeneration
  * (millis? tz-adjusted?) is caught by `sbt test`, not a lost round.
  */
class TimestampEncodingSpec extends SparkSpec {

  // instants with microsecond precision (epoch micros)
  private val micros = Seq(0L, 1L, 1696118400000000L, 1696118400123456L,
    -1000000L, 4102444799999999L)

  private def tsNsFor(dir: String): Seq[Long] = {
    val df = spark.read.parquet(dir)
    df.withColumn("ts_ns", TestData.tsNs(df))
      .orderBy("id").select("ts_ns").collect().map(_.getLong(0)).toSeq
  }

  test("tsNs is identical across long-nanos, TIMESTAMP_NTZ, and TIMESTAMP parquet encodings") {
    val tmp = java.nio.file.Files.createTempDirectory("ts_enc").toString
    val rows = micros.zipWithIndex.map { case (us, i) => Row(i.toLong, us) }
    val base = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2),
      StructType(Seq(StructField("id", LongType), StructField("us", LongType))))

    // (a) raw long nanos — what INT64 TIMESTAMP(NANOS) reads as under
    //     spark.sql.legacy.parquet.nanosAsLong (pre-r9 driver encoding)
    base.select(col("id"), (col("us") * 1000).as("ts"))
      .write.mode("overwrite").parquet(s"$tmp/long")
    // (b) TIMESTAMP_NTZ — written as parquet timestamp[us]
    //     isAdjustedToUTC=false, the current driver encoding
    base.select(col("id"), timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"))
      .write.mode("overwrite").parquet(s"$tmp/ntz")
    // (c) with-tz TIMESTAMP — timestamp[us] isAdjustedToUTC=true
    base.select(col("id"), timestamp_micros(col("us")).as("ts"))
      .write.mode("overwrite").parquet(s"$tmp/tz")

    val expected = micros.map(_ * 1000)
    assert(tsNsFor(s"$tmp/long") === expected)
    assert(tsNsFor(s"$tmp/ntz") === expected)
    assert(tsNsFor(s"$tmp/tz") === expected)
  }

  test("the live testdata events loader analyzes and yields plausible epoch nanos") {
    val ev = TestData.events(spark, "/root/testdata/sf0.001")
    val r = ev.agg(min("ts_ns"), max("ts_ns"), count(lit(1))).head()
    assert(r.getLong(2) > 0)
    // sane epoch-nanos range: 2000-01-01 .. 2100-01-01
    assert(r.getLong(0) > 946684800L * 1000000000L)
    assert(r.getLong(1) < 4102444800L * 1000000000L)
  }
}
