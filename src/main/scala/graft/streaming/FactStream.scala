package graft.streaming

import graft.core.FactStore
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surfaces (SURVEY.md §2E): the streaming
  * counterpart of the transactor — facts arrive as an append-only
  * stream, exactly the reference's insertion paradigm, but expressed as
  * readStream → transform → writeStream.
  */
object FactStream {

  /** Turn a streaming events frame (event_id, ts, user_id, event_type,
    * value) into streaming fact-log rows (same schema as
    * FactStore.factSchema): each event asserts the user's
    * cardinality-one `last_value`/`last_type`, tx = event_id. Works
    * identically on batch frames (Structured Streaming's contract). */
  def eventFacts(events: DataFrame, userBase: Long, txBase: Long): DataFrame = {
    val e = (col("user_id") + lit(userBase)).as("e")
    val tx = (col("event_id") + lit(txBase)).as("tx")
    val lastValue = events.select(e, lit("last_value").as("a"), lit("d").as("vtype"),
      lit(null).cast("string").as("vstr"), lit(null).cast("long").as("vlong"),
      col("value").cast("double").as("vdbl"), lit(null).cast("timestamp").as("vts"),
      lit(null).cast("long").as("vref"), tx, lit(true).as("added"))
    val lastType = events.select(e, lit("last_type").as("a"), lit("s").as("vtype"),
      col("event_type").cast("string").as("vstr"), lit(null).cast("long").as("vlong"),
      lit(null).cast("double").as("vdbl"), lit(null).cast("timestamp").as("vts"),
      lit(null).cast("long").as("vref"), tx, lit(true).as("added"))
    lastValue.unionAll(lastType)
  }

  /** Watermarked sliding-window counts per event_type — the streaming
    * aggregation surface. `ts` must be a timestamp column. */
  def windowedCounts(events: DataFrame, watermark: String = "10 minutes",
                     win: String = "1 hour", slide: String = "30 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), win, slide), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"), col("event_type"), col("n"))

  /** Continuous ingestion into the durable fact-log layout
    * (sources.FactLogIO): append-mode parquet sink `partitionBy("a")` —
    * each micro-batch lands as new files inside the attribute
    * partitions, which IS the append-only paradigm (no compaction
    * needed for correctness; tx-ordered files, row-group tx stats prune
    * as-of reads). Pair with FactLogIO.writeMeta to complete the
    * layout, then FactLogIO.read + snapshot() query it. */
  def writeFactLog(facts: DataFrame, path: String,
                   checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    facts.writeStream
      .format("parquet")
      .option("path", s"$path/facts")
      .option("checkpointLocation", checkpoint)
      .partitionBy("a")
      .outputMode("append")
      .start()

  /** Continuous ingestion WITH periodic index maintenance — the
    * transactor+indexer loop: every micro-batch appends to the durable
    * log; every `compactEvery` batches the resolved snapshot re-bases
    * (FactLogIO.writeSnapshotBase), so snapshot readers keep paying
    * live-set + tail cost no matter how long the stream runs. The
    * compaction is a batch job INSIDE foreachBatch — serialized with
    * ingestion, so no concurrent-writer coordination is needed (the
    * single-writer paradigm the reference's transactor queue gives). */
  def ingestWithCompaction(facts: DataFrame, path: String, checkpoint: String,
                           attrTypes: Map[String, String],
                           cardMany: Set[String] = Set.empty,
                           compactEvery: Int = 10,
                           onCompact: (SparkSession, String) => Unit = (_, _) => ())
      : org.apache.spark.sql.streaming.StreamingQuery =
    facts.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        // idempotent under micro-batch RETRY: each batch owns a
        // batch=<id> partition directory and overwrites only it — a
        // re-delivered batch replaces its own files instead of
        // appending duplicates (the readers' column projection drops
        // the extra partition column).
        batch.write.mode("overwrite").partitionBy("a")
          .parquet(s"$path/facts/batch=$batchId")
        graft.sources.FactLogIO.writeMeta(spark, path, attrTypes, cardMany,
          versioned = true)
        if ((batchId + 1) % compactEvery == 0) {
          val db = graft.sources.FactLogIO.read(spark, path)
          val watermark = db.log.agg(max(col("tx"))).head().getLong(0)
          graft.sources.FactLogIO.writeSnapshotBase(db, path, watermark)
          // index-maintenance hook: derived sidecars (ANN index, stats)
          // refresh INSIDE the same single-writer cycle — no separate
          // coordinator (cf. ingestEmbeddingsWithAnnRefresh)
          onCompact(spark, path)
        }
      }
      .start()

  /** Continuous embedding ingestion WITH ANN-index maintenance — the
    * §2C↔§2E loop: every micro-batch appends (id, vec) rows to the
    * corpus (batch-owned partition dirs, idempotent under retry, same
    * scheme as ingestWithCompaction); every `refreshEvery` batches the
    * sign-LSH AnnIndex sidecar is rebuilt over the corpus-so-far and
    * persisted (Similarity.writeAnnIndex), so annTopKIndexed over the
    * sidecar serves freshly ingested vectors. The rebuild is one
    * map-only signature pass (the 100 TB shape), serialized with
    * ingestion in the single-writer foreachBatch loop. */
  def ingestEmbeddingsWithAnnRefresh(emb: DataFrame, path: String, checkpoint: String,
                                     planes: Int = 8, refreshEvery: Int = 2)
      : org.apache.spark.sql.streaming.StreamingQuery =
    emb.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        batch.write.mode("overwrite").parquet(s"$path/corpus/batch=$batchId")
        if ((batchId + 1) % refreshEvery == 0) {
          val corpus = spark.read.parquet(s"$path/corpus")
          // versioned by batch id + atomic pointer swap: probes running
          // against the previous index keep their complete snapshot
          graft.pipeline.Similarity.writeAnnIndex(
            graft.pipeline.Similarity.annIndex(corpus, "id", "vec", planes),
            s"$path/ann", version = batchId)
          // retire versions older than the previous one (in-flight
          // readers of version N-1 stay valid through the swap);
          // dir names are v<version>-<nonce>, ordered by version prefix
          val annDir = new org.apache.hadoop.fs.Path(s"$path/ann")
          val fs = annDir.getFileSystem(spark.sessionState.newHadoopConf())
          if (fs.exists(annDir))
            fs.listStatus(annDir).toSeq
              .filter { st =>
                val n = st.getPath.getName
                n.matches("v\\d+-.*") &&
                  n.drop(1).takeWhile(_.isDigit).toLong < batchId - refreshEvery
              }
              .foreach(st => fs.delete(st.getPath, true): Unit)
        }
      }
      .start()

  /** Streaming exact dedup — the streaming counterpart of
    * pipeline.Dedup.exact for continuous ingestion: normalize + hash the
    * content, emit only first-seen documents. State is bounded by the
    * watermark (dropDuplicatesWithinWatermark), the property that keeps
    * this runnable forever at ingest scale — an unbounded
    * dropDuplicates state would grow with corpus size. `ts` must be a
    * timestamp event-time column. */
  def dedupStream(docs: DataFrame, watermark: String = "1 hour"): DataFrame =
    docs.withWatermark("ts", watermark)
      .withColumn("text_hash",
        md5(regexp_replace(lower(trim(col("text"))), "\\s+", " ")))
      .dropDuplicatesWithinWatermark("text_hash")

  final case class UserEvent(user_id: Long, event_id: Long, value: Double)
  final case class UserLatest(user_id: Long, last_event_id: Long, last_value: Double,
                              n_events: Long)

  /** Stateful latest-value-per-user — streaming cardinality-one
    * resolution via flatMapGroupsWithState (the reference's
    * `process-facts` latest-wins, maintained incrementally instead of
    * recomputed per query). */
  def latestPerUser(events: Dataset[UserEvent]): Dataset[UserLatest] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[UserLatest, UserLatest](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        case (uid, evs, state: GroupState[UserLatest]) =>
          val prev = state.getOption.getOrElse(UserLatest(uid, Long.MinValue, 0.0, 0L))
          val all = evs.toSeq
          val latest = all.maxBy(_.event_id)
          val next =
            if (latest.event_id > prev.last_event_id)
              UserLatest(uid, latest.event_id, latest.value, prev.n_events + all.size)
            else prev.copy(n_events = prev.n_events + all.size)
          state.update(next)
          Iterator(next)
      }
  }
}
