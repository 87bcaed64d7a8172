package graft

import graft.core.{FactDb, FactStore}
import graft.datalog._
import graft.datalog.Compiler.Db
import graft.streaming.FactStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming → datalog integration: facts arrive on a stream, each
  * micro-batch appends to the fact log, and the SAME datalog query runs
  * against the growing database — the streaming version of the
  * reference's append-only + query-as-of workflow. */
class StreamingDatalogSpec extends SparkSpec {
  import spark.implicits._

  test("streamed facts are queryable with full version resolution") {
    implicit val sql = spark.sqlContext
    val input = MemoryStream[(Long, java.sql.Timestamp, Long, String, Double)]
    val events = input.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
    val factRows = FactStream.eventFacts(events, userBase = 1000L, txBase = 0L)

    var db = FactDb(
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        FactStore.factSchema),
      Map("last_value" -> "vdbl", "last_type" -> "vstr"))
    val q = factRows.writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = batch.collect()
        db = db.copy(log = db.log.unionAll(
          spark.createDataFrame(spark.sparkContext.parallelize(rows.toSeq, 1),
            FactStore.factSchema)))
      }.start()

    def t(s: String) = java.sql.Timestamp.valueOf(s)
    input.addData((1L, t("2024-01-01 00:00:00"), 7L, "click", 1.0))
    q.processAllAvailable()
    input.addData((2L, t("2024-01-01 00:01:00"), 7L, "purchase", 9.5))
    q.processAllAvailable()
    q.stop()

    val out = Compiler.run(Db(db), Query(
      find = Seq(FVar(V("v"), "v"), FVar(V("tpe"), "tpe")),
      where = And(
        Pattern(V("u"), C("last_value"), V("v")),
        Pattern(V("u"), C("last_type"), V("tpe")))))(spark)
    // cardinality-one: the later purchase event wins
    assert(out.collect().map(r => (r.getDouble(0), r.getString(1))).toSeq ===
      Seq((9.5, "purchase")))
  }

  test("datalog queries run against the compacted streaming log (full loop)") {
    // stream → durable log with periodic compaction → FactLogIO read
    // with base+tail → the SAME datalog query a batch user writes.
    implicit val sql = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-dl").toString
    val input = MemoryStream[(Long, java.sql.Timestamp, Long, String, Double)]
    val events = input.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
    val facts = FactStream.eventFacts(events, userBase = 1000L, txBase = 0L)
    val q = FactStream.ingestWithCompaction(facts, dir, s"$dir/ckpt",
      attrTypes = Map("last_value" -> "vdbl", "last_type" -> "vstr"),
      compactEvery = 1)
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    input.addData((1L, t("2024-01-01 00:00:00"), 7L, "click", 1.0))
    q.processAllAvailable() // batch 0: append + compact (base at tx 1)
    input.addData((2L, t("2024-01-01 00:01:00"), 7L, "purchase", 9.5))
    q.processAllAvailable() // batch 1: tail past the first base, re-base
    q.stop()
    val full = graft.sources.FactLogIO.read(spark, dir)
    val compacted = graft.sources.FactLogIO.withSnapshotBase(spark, dir, full)
    val out = Compiler.run(Db(compacted), Query(
      find = Seq(FVar(V("v"), "v"), FVar(V("tpe"), "tpe")),
      where = And(
        Pattern(V("u"), C("last_value"), V("v")),
        Pattern(V("u"), C("last_type"), V("tpe")))))(spark)
    assert(out.collect().map(r => (r.getDouble(0), r.getString(1))).toSeq ===
      Seq((9.5, "purchase")))
  }
}
