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

  // ---- pointer-file plumbing shared by the versioned-sidecar sinks ----
  // foreachBatch is AT-LEAST-ONCE: a batch can replay after its sidecar
  // and pointer were already published (crash between pointer write and
  // checkpoint commit). Every sink below therefore (1) no-ops when the
  // pointer already reads v<batchId> — otherwise a replay would either
  // double-merge mergeable state or hit Spark's "cannot overwrite a path
  // that is also being read from" on the v<batchId> dir — and (2) GCs
  // superseded v* dirs after publish (keep current + previous so a
  // reader holding the prior pointer stays valid), bounding disk.

  private[graft] def readPtr(fs: org.apache.hadoop.fs.FileSystem,
                             p: org.apache.hadoop.fs.Path): Option[String] =
    if (fs.exists(p)) {
      val in = fs.open(p)
      try Some(scala.io.Source.fromInputStream(in).mkString.trim) finally in.close()
    } else None

  private[graft] def writePtr(fs: org.apache.hadoop.fs.FileSystem,
                              p: org.apache.hadoop.fs.Path, v: String): Unit = {
    val out = fs.create(p, true)
    try out.write(v.getBytes("UTF-8")) finally out.close()
  }

  /** Delete sidecar version dirs `v<digits>` under `base` except `keep`. */
  private[graft] def gcVersions(fs: org.apache.hadoop.fs.FileSystem,
                                base: String, keep: Set[String]): Unit = {
    val bp = new org.apache.hadoop.fs.Path(base)
    if (fs.exists(bp)) fs.listStatus(bp).foreach { st =>
      val n = st.getPath.getName
      if (st.isDirectory && n.matches("v\\d+") && !keep(n))
        fs.delete(st.getPath, true)
    }
  }

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

  /** Gap-based sessionization on the LIVE event stream — the streaming
    * twin of q_sessionize, via `session_window` (dynamic-gap session
    * merge maintained in the streaming aggregation state). A session's
    * row is emitted exactly once, when the watermark passes its close
    * (append mode), so state per user is bounded by the open-session
    * horizon, not the stream's history. Works identically on batch
    * frames (Structured Streaming's contract) — the batch-parity spec
    * runs THIS function both ways. */
  def sessionCounts(events: DataFrame, gap: String = "30 minutes",
                    watermark: String = "30 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start").as("sess_start"),
        col("session_window.end").as("sess_end"), col("n_events"))

  /** Stream-stream INTERVAL join (the attribution join, streaming twin
    * of q_range_join): for every left event, the right-stream events of
    * the SAME user within `withinSec` seconds AFTER it. Both sides are
    * watermarked, so the join state Structured Streaming buffers is
    * bounded to watermark + interval on each side — the planner derives
    * the eviction bound from the time-range predicate itself; without
    * the range condition this state would grow forever. Equi-key
    * (user_id) keeps it a state-store hash join, never a broadcast of
    * a stream. Works identically on batch frames. */
  def intervalJoin(left: DataFrame, right: DataFrame, withinSec: Long,
                   watermark: String = "10 minutes"): DataFrame = {
    val l = left.select(col("user_id"), col("ts").as("l_ts"),
        col("event_type").as("l_type"))
      .withWatermark("l_ts", watermark)
    val r = right.select(col("user_id").as("r_user"), col("ts").as("r_ts"),
        col("event_type").as("r_type"))
      .withWatermark("r_ts", watermark)
    l.join(r, col("user_id") === col("r_user") &&
        col("r_ts") >= col("l_ts") &&
        col("r_ts") <= col("l_ts") + expr(s"interval $withinSec seconds"))
      .select(col("user_id"), col("l_ts"), col("l_type"),
        col("r_ts"), col("r_type"))
  }

  /** Stream-static ENRICHMENT against the durable fact log: each
    * micro-batch joins the CURRENT snapshot value of `attr` for its
    * user entity. The dimension is re-READ inside foreachBatch — not a
    * static DataFrame captured at stream start, whose cached file
    * index would never see files transacted after launch — so facts
    * written between batches are visible to the next batch: the
    * streaming counterpart of dl_lookup per event, with the batch
    * engine's own time-travel knob (`asOfTx` pins a historical
    * version instead of tracking HEAD). The per-batch join reads only
    * the attribute's partition directory of the durable layout.
    * Enriched rows land in batch-owned dirs (idempotent on replay,
    * the single-writer discipline shared with ingestGatedDocuments). */
  def enrichWithFactLog(events: DataFrame, logPath: String, attr: String,
                        userBase: Long, outPath: String, checkpoint: String,
                        asOfTx: Long = Long.MaxValue): org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val dim = graft.sources.FactLogIO.read(spark, logPath)
          .snapshot(asOfTx)
          .filter(col("a") === attr)
          .select((col("e") - userBase).as("user_id"),
            col("vstr").as(s"${attr}_str"), col("vlong").as(s"${attr}_long"),
            col("vdbl").as(s"${attr}_dbl"))
        batch.join(dim, Seq("user_id"), "left")
          .write.mode("overwrite").parquet(s"$outPath/batch=$batchId")
        ()
      }
      .option("checkpointLocation", checkpoint)
      .start()

  /** INCREMENTAL VIEW MAINTENANCE of the reachability closure over a
    * LIVE edge stream: each micro-batch folds its new edges into the
    * persisted closure with GraphOps.closureDelta — work per batch is
    * Δ-path-sized, never the O(E) refixpoint — and publishes the new
    * version under `path/v<batch>` with an atomic pointer write (the
    * versioned-sidecar discipline the ANN indexes use): readers always
    * see a complete, consistent closure. Single-writer foreachBatch;
    * the closure is the recursive `reach` rule kept current as facts
    * arrive — the materialized-deductive-view surface the reference's
    * interpreter re-derives per query. */
  def ingestEdgesWithClosure(edges: DataFrame, path: String,
                             checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    edges.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        implicit val sp: SparkSession = spark
        val fs = new org.apache.hadoop.fs.Path(path)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        val ptr = new org.apache.hadoop.fs.Path(s"$path/_latest")
        val prevV = readPtr(fs, ptr)
        if (!prevV.contains(s"v$batchId")) { // replay-after-publish no-op
          val prev: DataFrame = prevV match {
            case Some(v) => spark.read.parquet(s"$path/$v")
            case None => batch.sparkSession.emptyDataFrame
              .select(lit(0L).as("src"), lit(0L).as("dst")).limit(0)
          }
          val next = graft.graph.GraphOps.closureDelta(prev,
            batch.select(col("src"), col("dst")))
          next.write.mode("overwrite").parquet(s"$path/v$batchId")
          writePtr(fs, ptr, s"v$batchId")
          gcVersions(fs, path, Set(s"v$batchId") ++ prevV)
        }
        ()
      }
      .option("checkpointLocation", checkpoint)
      .start()

  /** LIVE conversion funnel (the §2B q_funnel twin) by DELTA-SCOPED
    * RECOMPUTE: each micro-batch appends its events to a durable log,
    * then re-runs the SHARED batch operator (operators.Funnel.stages)
    * over ONLY the users the batch touched and upserts their rows into
    * a versioned funnel sidecar (atomic pointer publish, the
    * ANN-index discipline). Per-batch work = affected-users' event
    * slice, not the corpus; and because each affected user is fully
    * recomputed from their complete history, the streamed funnel is
    * EXACT under arbitrary out-of-order arrival — a late signup
    * re-qualifies clicks already on file, which a forward-only state
    * machine cannot undo (spec-pinned). State lives in the LAYOUT
    * (log + sidecar on disk), not executor memory. */
  def ingestFunnel(events: DataFrame, path: String, checkpoint: String,
                   stageTypes: Seq[String] = Seq("signup", "click", "purchase"))
      : org.apache.spark.sql.streaming.StreamingQuery =
    ingestDeltaRecompute(events, path, checkpoint, "user_id")(
      slice => graft.operators.Funnel.stages(slice, stageTypes))

  /** Streaming SCD TYPE-2 (the §2B q_scd2 twin): the per-key validity
    * intervals maintained by the same delta-scoped recompute — a late
    * change legitimately SPLITS an interval already on file (its
    * valid_to moves from the next-known change to the late one), which
    * append-only interval emission cannot repair. Per-batch work =
    * affected keys' change history. */
  def ingestScd2(changes: DataFrame, path: String, checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    ingestDeltaRecompute(changes, path, checkpoint, "user_id") { slice =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us"), col("event_id"))
      slice.withColumn("valid_to", lead(col("ts_us"), 1).over(w))
        .select(col("user_id"), col("value"), col("ts_us").as("valid_from"),
          col("valid_to"), col("valid_to").isNull.as("is_current"))
    }

  /** Streaming RETENTION (the §2B q_retention twin): per-user
    * (cohort_day, day_offset) rows maintained by delta-scoped
    * recompute — a LATE event can shift a user's cohort day EARLIER,
    * which re-bases every offset that user already contributed
    * (forward-only state cannot repair that); the cohort matrix is a
    * trivial count over the per-user sidecar at read time, so the
    * aggregate view needs no corpus-sized streaming state. `events`
    * must carry (user_id, day). */
  def ingestRetention(events: DataFrame, path: String, checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    ingestDeltaRecompute(events, path, checkpoint, "user_id") { slice =>
      val ud = slice.select(col("user_id"), col("day")).distinct()
      val cohort = ud.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
      ud.join(cohort, Seq("user_id"))
        .select(col("user_id"), col("cohort_day"),
          (col("day") - col("cohort_day")).as("day_offset"))
    }

  /** DELTA-SCOPED RECOMPUTE — the generic incremental-view pattern the
    * funnel and SCD2 twins instantiate: per micro-batch, (1) append the
    * batch to a durable log, (2) re-run the BATCH operator over only
    * the keys the batch touched (their full logged history), (3) upsert
    * those keys' rows into a versioned sidecar (atomic pointer
    * publish). Exactness under arbitrary out-of-order arrival falls out
    * of full-history recompute per affected key; per-batch cost is the
    * affected keys' slice, never the corpus; state lives in the LAYOUT,
    * not executor memory. Use when the view is per-key recomputable and
    * key histories are bounded — the sweet spot between full refresh
    * (exact, corpus-priced) and forward-only state (cheap, wrong under
    * late data). */
  def ingestDeltaRecompute(events: DataFrame, path: String, checkpoint: String,
                           keyCol: String, compactEvery: Int = 16)
                          (rebuild: DataFrame => DataFrame)
      : org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        deltaRecomputeStep(batch, batchId, path, keyCol, compactEvery)(rebuild)
      }
      .option("checkpointLocation", checkpoint)
      .start()

  /** One [[ingestDeltaRecompute]] micro-batch — exposed for the replay
    * spec: calling it twice with the same batchId must be a no-op the
    * second time (at-least-once delivery). */
  private[graft] def deltaRecomputeStep(batch: DataFrame, batchId: Long,
                                        path: String, keyCol: String,
                                        compactEvery: Int)
                                       (rebuild: DataFrame => DataFrame): Unit = {
    val spark = batch.sparkSession
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val vptr = new org.apache.hadoop.fs.Path(s"$path/_latest")
    val lptr = new org.apache.hadoop.fs.Path(s"$path/_log")
    val prevV = readPtr(fs, vptr)
    if (!prevV.contains(s"v$batchId")) { // replay-after-publish no-op
      var logDir = readPtr(fs, lptr).getOrElse("log")
      // every compactEvery batches, fold the accumulated per-batch
      // log dirs into ONE (into batch=0 of a fresh pointer-named log
      // dir) BEFORE appending this batch: bounds file count and keeps
      // the full-log scan's open-file cost flat under long streams.
      // Replay-safe: the name guard skips a re-run whose pointer
      // already advanced; dir deletion happens only after publish.
      if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0) {
        val newDir = s"log$batchId"
        if (logDir != newDir && fs.exists(new org.apache.hadoop.fs.Path(s"$path/$logDir"))) {
          spark.read.parquet(s"$path/$logDir").drop("batch")
            .write.mode("overwrite").parquet(s"$path/$newDir/batch=0")
          writePtr(fs, lptr, newDir)
        }
        fs.listStatus(new org.apache.hadoop.fs.Path(path)).foreach { st =>
          val n = st.getPath.getName
          if (st.isDirectory && n.matches("log\\d*") && n != newDir)
            fs.delete(st.getPath, true)
        }
        logDir = newDir
      }
      batch.write.mode("overwrite").parquet(s"$path/$logDir/batch=$batchId")
      val affected = batch.select(col(keyCol)).distinct()
      val slice = spark.read.parquet(s"$path/$logDir")
        .join(broadcast(affected), Seq(keyCol))
      val fresh = rebuild(slice)
      val merged = prevV match {
        case Some(v) =>
          spark.read.parquet(s"$path/$v")
            .join(affected, Seq(keyCol), "left_anti")
            .unionByName(fresh)
        case None => fresh
      }
      merged.write.mode("overwrite").parquet(s"$path/v$batchId")
      writePtr(fs, vptr, s"v$batchId")
      gcVersions(fs, path, Set(s"v$batchId") ++ prevV)
    }
  }

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
    * sign-LSH AnnIndex sidecar refreshes INCREMENTALLY: the plane
    * count is pinned in the published index meta, so the refresh signs
    * ONLY the corpus batches past the covered watermark into one fresh
    * immutable segment and publishes a version whose meta references
    * the prior segments plus the new one (Similarity.writeAnnSegment /
    * publishAnnVersion — a metadata-level merge). Refresh cost is
    * O(new rows) per cycle, not O(corpus) — the property that keeps
    * index maintenance affordable under continuous 100 TB ingest. The
    * bootstrap (no published index yet) and rebuildAnnIndex (the
    * explicit repair/compaction path) are the only full corpus passes.
    * Retention keeps the newest `keepVersions` versions, so a reader's
    * resolved snapshot survives at least keepVersions-1 refresh
    * cycles (readAnnIndex documents the bound). Everything is
    * serialized with ingestion in the single-writer foreachBatch loop,
    * and a retried refresh batch is a no-op (the covered watermark
    * already equals its batch id — nothing new to sign).
    *
    * Compaction: the segment chain is bounded by `maxSegments`. A
    * refresh that would push the published meta past that bound runs
    * the full rebuild instead — one corpus pass that resets the chain
    * to a single segment (the LSM merge step). Without it the chain
    * grows one parquet dir per refresh forever, and every probe pays
    * file-listing + small-file overhead across thousands of segments;
    * with it, amortized refresh cost stays O(new rows) while reads
    * never union more than maxSegments dirs. */
  def ingestEmbeddingsWithAnnRefresh(emb: DataFrame, path: String, checkpoint: String,
                                     planes: Int = 8, refreshEvery: Int = 2,
                                     keepVersions: Int = 3, maxSegments: Int = 16)
      : org.apache.spark.sql.streaming.StreamingQuery =
    emb.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        batch.write.mode("overwrite").parquet(s"$path/corpus/batch=$batchId")
        if ((batchId + 1) % refreshEvery == 0)
          annRefreshStep(spark, path, planes, batchId, keepVersions, maxSegments)
      }
      .start()

  /** One incremental ANN-refresh cycle (the body of
    * [[ingestEmbeddingsWithAnnRefresh]]'s periodic branch, shared with
    * [[ingestCurationPipeline]]): sign only the corpus batches past the
    * covered watermark into a fresh segment, publish, retire old
    * versions; bootstrap or a chain at `maxSegments` falls through to
    * the full rebuild. */
  private[graft] def annRefreshStep(spark: SparkSession, path: String,
                                    planes: Int, batchId: Long,
                                    keepVersions: Int, maxSegments: Int): Unit = {
    import graft.pipeline.Similarity
    val annPath = s"$path/ann"
    Similarity.readAnnMeta(spark, annPath) match {
      case Some(prior) if prior.segments.length < maxSegments =>
        val newDirs = corpusBatchDirs(spark, s"$path/corpus")
          .collect { case (id, p) if id > prior.covered => p }
        if (newDirs.nonEmpty) {
          val newRows = spark.read.parquet(newDirs: _*)
          // plane count AND centering mean are PINNED from the
          // published meta: new segments must bucket identically to
          // the ones already served (and signing with the pinned mean
          // costs no corpus pass — the O(new rows) property). The
          // model refits at the next compaction/rebuild, like IVF's
          // centroid retrain at the chain bound.
          val seg = Similarity.writeAnnSegment(
            Similarity.annIndex(newRows, "id", "vec", prior.planes,
              mean = Some(prior.mean)).assigned,
            annPath)
          Similarity.publishAnnVersion(spark, annPath,
            Similarity.AnnMeta(prior.planes, prior.segments :+ seg,
              covered = batchId, mean = prior.mean),
            version = batchId)
        }
      case Some(prior) => // chain at bound: compact (keep pinned planes)
        rebuildAnnIndex(spark, path, prior.planes, coveredThrough = batchId)
      case None =>
        rebuildAnnIndex(spark, path, planes, coveredThrough = batchId)
    }
    Similarity.retireAnnVersions(spark, annPath, keepVersions)
  }

  /** Continuous embedding ingestion WITH IVF-index maintenance — the
    * IVF analog of [[ingestEmbeddingsWithAnnRefresh]], closing the
    * "served IVF index goes stale under continuous ingest" gap. The
    * centroid MODEL is pinned in the published version (FAISS
    * discipline: train once, add per batch): each refresh assigns ONLY
    * the corpus batches past the covered watermark to the pinned
    * centroids — one fresh immutable cell-clustered segment, O(new
    * rows · nlist), no corpus pass. When the segment chain reaches
    * `maxSegments` the refresh falls through to [[rebuildIvfIndex]]: a
    * full Lloyd retrain + re-assign that resets the chain — the same
    * LSM-style compaction bound as the ANN loop, and the step that
    * lets the model follow distribution drift. Retention keeps the
    * newest `keepVersions` versions (readers' staleness bound, as in
    * readAnnIndex). Everything is serialized in the single-writer
    * foreachBatch loop; a retried refresh batch is a no-op. */
  def ingestEmbeddingsWithIvfRefresh(emb: DataFrame, path: String, checkpoint: String,
                                     nlist: Int = 8, iters: Int = 2,
                                     refreshEvery: Int = 2, keepVersions: Int = 3,
                                     maxSegments: Int = 16)
      : org.apache.spark.sql.streaming.StreamingQuery =
    emb.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        batch.write.mode("overwrite").parquet(s"$path/corpus/batch=$batchId")
        if ((batchId + 1) % refreshEvery == 0) {
          import graft.pipeline.Similarity
          val ivfPath = s"$path/ivf"
          Similarity.readIvfMeta(spark, ivfPath) match {
            case Some(prior) if prior.segments.length < maxSegments =>
              val newDirs = corpusBatchDirs(spark, s"$path/corpus")
                .collect { case (id, p) if id > prior.covered => p }
              if (newDirs.nonEmpty) {
                val cents = Similarity.readIvfIndex(spark, ivfPath).centroids
                val seg = Similarity.writeIvfSegment(
                  Similarity.ivfAssign(spark.read.parquet(newDirs: _*),
                    "id", "vec", cents), ivfPath)
                Similarity.publishIvfVersion(spark, ivfPath, cents,
                  Similarity.IvfMeta(prior.segments :+ seg, covered = batchId),
                  version = batchId)
              }
            case _ => // bootstrap, or chain at bound: full retrain
              rebuildIvfIndex(spark, path, nlist, iters, coveredThrough = batchId)
          }
          Similarity.retireIvfVersions(spark, ivfPath, keepVersions)
        }
      }
      .start()

  /** Full-retrain repair/compaction path for the streaming IVF sidecar:
    * Lloyd over the ENTIRE corpus, re-assign everything into one fresh
    * segment, publish a version referencing only it — resetting the
    * segment chain AND the centroid model. The incremental loop resumes
    * from the published watermark afterwards. */
  def rebuildIvfIndex(spark: SparkSession, path: String, nlist: Int,
                      iters: Int, coveredThrough: Long = -1L): Unit = {
    import graft.pipeline.Similarity
    val dirs = corpusBatchDirs(spark, s"$path/corpus")
    if (dirs.isEmpty) return
    val covered = if (coveredThrough >= 0) coveredThrough else dirs.map(_._1).max
    val corpus = spark.read.parquet(dirs.map(_._2): _*)
    val dim = corpus.select(size(col("vec"))).head().getInt(0)
    val trained = Similarity.ivfIndex(corpus, "id", "vec", dim, nlist, iters)
    val seg = Similarity.writeIvfSegment(trained.assigned, s"$path/ivf")
    Similarity.publishIvfVersion(spark, s"$path/ivf", trained.centroids,
      Similarity.IvfMeta(Seq(seg), covered), version = covered)
  }

  /** The corpus's batch-owned partition dirs as (batchId, path). */
  private def corpusBatchDirs(spark: SparkSession,
                              corpusPath: String): Seq[(Long, String)] = {
    val base = new org.apache.hadoop.fs.Path(corpusPath)
    val fs = base.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(base)) Seq.empty
    else fs.listStatus(base).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.matches("batch=\\d+"))
      .map(st => (st.getPath.getName.stripPrefix("batch=").toLong,
        st.getPath.toString))
      .sortBy(_._1)
  }

  /** Full-rebuild repair/compaction path for the streaming ANN
    * sidecar: re-sign the ENTIRE corpus into one fresh segment and
    * publish a version referencing only it — resetting the segment
    * chain. Use after a suspected corruption, to change the plane
    * count, or to compact a long segment chain; the incremental loop
    * resumes from the published watermark afterwards. */
  def rebuildAnnIndex(spark: SparkSession, path: String, planes: Int,
                      coveredThrough: Long = -1L): Unit = {
    import graft.pipeline.Similarity
    val dirs = corpusBatchDirs(spark, s"$path/corpus")
    if (dirs.isEmpty) return
    val covered = if (coveredThrough >= 0) coveredThrough else dirs.map(_._1).max
    val corpus = spark.read.parquet(dirs.map(_._2): _*)
    // full pass = centering-model refit (annIndex default fits the
    // mean over the whole corpus) — the step that lets the bucketing
    // follow distribution drift, mirroring the IVF retrain
    val idx = Similarity.annIndex(corpus, "id", "vec", planes)
    val seg = Similarity.writeAnnSegment(idx.assigned, s"$path/ann")
    Similarity.publishAnnVersion(spark, s"$path/ann",
      Similarity.AnnMeta(planes, Seq(seg), covered, mean = idx.mean),
      version = covered)
  }

  /** Streaming exact dedup — the streaming counterpart of
    * pipeline.Dedup.exact for continuous ingestion: normalize + hash the
    * content, emit only first-seen documents. State is bounded by the
    * watermark (dropDuplicatesWithinWatermark), the property that keeps
    * this runnable forever at ingest scale — an unbounded
    * dropDuplicates state would grow with corpus size. `ts` must be a
    * timestamp event-time column. */
  def dedupStream(docs: DataFrame, watermark: String = "1 hour"): DataFrame =
    docs.withWatermark("ts", watermark)
      .withColumn("text_hash", graft.pipeline.Dedup.contentHash(col("text")))
      .dropDuplicatesWithinWatermark("text_hash")

  /** LIVE corpus datasheet: the leaf (source, language) cells of
    * TextAnalysis.corpusProfile maintained incrementally over a
    * document stream — the ingest-side dashboard a curation deployment
    * watches (doc counts, exact token sums, mean quality, PII rate,
    * updating per micro-batch). The map side IS the batch operator's
    * fused projection (TextAnalysis.profilePerRow) and the aggregate
    * columns are the batch operator's (profileAggCols), so streamed
    * cells can never drift from the published datasheet. State is one
    * row per (source, language) — bounded by construction, no
    * watermark needed; Spark maintains count/sum/avg as mergeable
    * partials, so the result is order-exact for the integer columns
    * and n·ε-equal (round 6) for the two means. Rollup totals are a
    * trivial downstream sum over this tiny cell relation — they need
    * no corpus-sized state, so the stream does not carry them. */
  def profileStream(docs: DataFrame): DataFrame =
    graft.pipeline.TextAnalysis.profilePerRow(docs)
      .groupBy(col("source"), col("pred_lang"))
      .agg(graft.pipeline.TextAnalysis.profileAggCols.head,
        graft.pipeline.TextAnalysis.profileAggCols.tail: _*)

  /** LIVE PII incidence report (the §2C text_pii_report twin): every
    * aggregate in the report is commutative+associative (occurrence
    * sums, affected-doc counts) and the incidence ratio derives from
    * them post-aggregation, so the streamed report IS the batch
    * operator applied to the unbounded relation — literally the same
    * function (TextAnalysis.piiReport), no separate map/agg
    * restatement, zero possibility of the live report drifting from
    * the published datasheet. Complete-mode output over |sources|
    * rows; state is |sources| aggregation cells, not corpus-sized. */
  def piiStream(docs: DataFrame): DataFrame =
    graft.pipeline.TextAnalysis.piiReport(docs)

  /** LIVE crawl-drift cells (the §2C corpus_drift twin): the
    * per-(source, snapshot) token sums maintained as a streaming
    * aggregation — the sums are exact-decimal and
    * commutative+associative, so the streamed cells are EXACTLY the
    * batch sums of everything ingested; shares/L1/KL derive downstream
    * over the |sources|-row output (TextAnalysis.driftShares), needing
    * no corpus-sized state. Map side IS the batch operator's
    * projection (driftPerRow) and the aggregates are the batch's
    * (driftAggCols), so streamed cells cannot drift from the published
    * datasheet — the profileStream discipline; spec pins streamed
    * cells + driftShares == batch snapshotDrift. */
  def driftStream(docs: DataFrame): DataFrame =
    graft.pipeline.TextAnalysis.driftPerRow(docs)
      .groupBy(col("source"))
      .agg(graft.pipeline.TextAnalysis.driftAggCols.head,
        graft.pipeline.TextAnalysis.driftAggCols.tail: _*)

  /** Streaming NEAR-dup gate — the MinHash/LSH counterpart of
    * [[dedupStream]] for continuous ingestion: each micro-batch is
    * near-deduped within itself by the BATCH operator
    * (Dedup.minhashLshFromSigs + keepSurvivors — reused, not
    * re-stated), then against everything previously admitted via two
    * durable sidecars under `path`: `bands/batch=N` (band, bucket,
    * doc_id) and `sigs/batch=N` (doc_id, sig). A new doc is dropped
    * iff it shares an LSH band bucket with a prior survivor AND the
    * full-signature agreement fraction reaches `estThreshold` — the
    * same candidate→verify shape as the batch path, so candidates stay
    * O(batch × bands), never batch × corpus.
    *
    * Unlike exact streaming dedup (hash set bounded by watermark),
    * near-dup state is inherently corpus-sized — so it lives in the
    * LAYOUT (disk-resident bucketed parquet, the curation pipeline's
    * durable-sidecar discipline), not executor memory; reading only
    * dirs below the current batch id keeps retries idempotent.
    * Signature stage is the map-only codegen'd expression; the band
    * join's prior side grows one small dir per batch (compact by
    * rewriting `bands/`+`sigs/` from the survivors dirs offline). */
  def ingestNearDedup(docs: DataFrame, path: String, checkpoint: String,
                      k: Int = 64, bands: Int = 16,
                      estThreshold: Double = 0.8)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        import graft.pipeline.Dedup
        val b = batch.select(col("doc_id"), col("text"))
        val sigsAll = Dedup.minhashSignatures(b, k).persist()
        try {
          // within-batch: the batch pair generator + survivor policy
          val kept = Dedup.keepSurvivors(b,
            Dedup.minhashLshFromSigs(sigsAll, k, bands, estThreshold))
          val keptSigs = sigsAll.join(kept.select("doc_id"), Seq("doc_id"))
          // cross-batch: band-bucket candidates vs prior survivors,
          // verified on full-signature agreement
          def dirs(sub: String) = corpusBatchDirs(spark, s"$path/$sub")
            .collect { case (id, p) if id < batchId => p }
          val bandDirs = dirs("bands")
          val survivors =
            if (bandDirs.isEmpty) kept
            else {
              val priorBands = spark.read.parquet(bandDirs: _*)
                .select(col("band"), col("bucket"), col("doc_id").as("old_id"))
              val cand = Dedup.bandKeys(keptSigs, k, bands)
                .join(priorBands, Seq("band", "bucket"))
                .select(col("doc_id"), col("old_id")).distinct()
              val priorSigs = spark.read.parquet(dirs("sigs"): _*)
                .select(col("doc_id").as("old_id"), col("sig").as("so"))
              val dupNew = cand
                .join(keptSigs.select(col("doc_id"), col("sig").as("sn")), "doc_id")
                .join(priorSigs, "old_id")
                .withColumn("est_jac",
                  size(filter(zip_with(col("sn"), col("so"), (x, y) => x === y),
                    bb => bb)).cast("double") / k)
                .filter(col("est_jac") >= estThreshold)
                .select(col("doc_id")).distinct()
              kept.join(dupNew, Seq("doc_id"), "left_anti")
            }
          val survSigs = sigsAll.join(survivors.select("doc_id"), Seq("doc_id"))
            .persist()
          try {
            survSigs.write.mode("overwrite").parquet(s"$path/sigs/batch=$batchId")
            Dedup.bandKeys(survSigs, k, bands)
              .write.mode("overwrite").parquet(s"$path/bands/batch=$batchId")
            survivors.write.mode("overwrite")
              .parquet(s"$path/survivors/batch=$batchId")
          } finally survSigs.unpersist(false): Unit
        } finally sigsAll.unpersist(false): Unit
      }
      .start()

  /** LIVE export manifest: TextAnalysis.exportManifest maintained
    * incrementally over the document stream — the release audit record
    * kept current as docs land, so a snapshot cut at any micro-batch
    * boundary ships with its manifest already computed. All three
    * aggregates (count / exact token sum / bit_xor content signature)
    * are commutative+associative, so the streamed state is EXACTLY the
    * batch manifest of everything ingested — not an approximation —
    * and state is bounded at nShards rows regardless of corpus size.
    * The projection IS the batch operator's (manifestPerRow), shared
    * so live and published manifests can never drift. */
  def manifestStream(docs: DataFrame, nShards: Int = 64): DataFrame =
    graft.pipeline.TextAnalysis.manifestPerRow(docs, nShards)
      .groupBy(col("shard"))
      .agg(graft.pipeline.TextAnalysis.manifestAggCols.head,
        graft.pipeline.TextAnalysis.manifestAggCols.tail: _*)

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

  final case class CdcChange(user_id: Long, op: String, new_bal: Double,
                             ts_us: Long, event_id: Long)

  /** Streaming CDC (the §2B q_merge_cdc twin): the latest change per
    * key maintained INCREMENTALLY — state is one row per key (bounded
    * by key cardinality, the dimension-table size, not the changelog
    * volume); a batch emits a key only when its winner changes, under
    * the same (ts_us, event_id) total order the batch
    * CdcMerge.latestPerKey reduces by. The MERGE itself stays the
    * shared batch operator (CdcMerge.applyLatest over this maintained
    * relation), so streamed merge == batch merge by construction —
    * spec-pinned in StreamingSpec. */
  def cdcLatest(changes: Dataset[CdcChange]): Dataset[CdcChange] = {
    import changes.sparkSession.implicits._
    changes.groupByKey(_.user_id)
      .flatMapGroupsWithState[CdcChange, CdcChange](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        case (_, evs, state: GroupState[CdcChange]) =>
          val cand = (state.getOption.iterator ++ evs)
            .maxBy(c => (c.ts_us, c.event_id))
          if (state.getOption.contains(cand)) Iterator.empty
          else { state.update(cand); Iterator(cand) }
      }
  }

  /** LIVE heavy hitters (the §2C text_heavy_hitters twin): the
    * Misra-Gries summary is MERGEABLE, so the streamed state is just
    * the running merge of per-batch sketches — k counters + the token
    * total, published as a versioned sidecar (atomic pointer). The
    * retention guarantee (> N/(k+1) ⇒ retained) survives ANY merge
    * order, so candidates drawn from the live sketch at any point are
    * a sound input to the exact verify pass over the corpus so far —
    * exact output values do not depend on batch boundaries
    * (spec-pinned against the batch operator). State is k+1 rows,
    * independent of stream volume. */
  def ingestHeavyHitters(docs: DataFrame, path: String, checkpoint: String,
                         k: Int = 32): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        heavyHittersStep(batch, batchId, path, k)
      }
      .option("checkpointLocation", checkpoint)
      .start()

  /** One [[ingestHeavyHitters]] micro-batch — exposed for the replay
    * spec. At-least-once replay guard: merging an already-merged batch
    * sketch would permanently inflate the MG counters + __total__. */
  private[graft] def heavyHittersStep(batch: DataFrame, batchId: Long,
                                      path: String, k: Int): Unit = {
    val spark = batch.sparkSession
    import spark.implicits._
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val ptr = new org.apache.hadoop.fs.Path(s"$path/_latest")
    val prevV = readPtr(fs, ptr)
    if (!prevV.contains(s"v$batchId")) {
      val mg = new graft.functions.MisraGries(k)
      val toks = batch.select(
        explode(split(lower(trim(col("text"))), "\\s+")).as("tok"))
      val bSketch = toks.as[String].select(mg.toColumn).head()
      val bN = toks.count()
      val (prevSketch, prevN) = prevV match {
        case Some(v) =>
          val rows = spark.read.parquet(s"$path/$v").collect()
          (rows.filter(_.getString(0) != "__total__")
            .map(r => r.getString(0) -> r.getLong(1)).toMap,
            rows.find(_.getString(0) == "__total__").map(_.getLong(1)).getOrElse(0L))
        case None => (Map.empty[String, Long], 0L)
      }
      val merged = mg.merge(prevSketch, bSketch)
      (merged.toSeq :+ ("__total__", prevN + bN))
        .toDF("tok", "cnt")
        .coalesce(1).write.mode("overwrite").parquet(s"$path/v$batchId")
      writePtr(fs, ptr, s"v$batchId")
      gcVersions(fs, path, Set(s"v$batchId") ++ prevV)
    }
  }

  /** STREAMING coreset (the sample_kcenter twin) by MERGE-AND-REDUCE:
    * each micro-batch runs the batch k-center selector over (previous
    * centers ∪ new vectors) — the classic streaming-coreset
    * construction: re-selecting over the union of an existing coreset
    * and fresh data preserves the coverage guarantee within a constant
    * factor, with state = k rows (id, vec) in a versioned sidecar
    * regardless of stream volume. The selector is the SHARED batch
    * operator (Similarity.kCenterSelect), so the diversity policy
    * cannot drift between paths; spec plants clusters split across
    * batches and pins full coverage. */
  def ingestKCenter(emb: DataFrame, path: String, checkpoint: String,
                    k: Int = 8): org.apache.spark.sql.streaming.StreamingQuery =
    emb.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val fs = new org.apache.hadoop.fs.Path(path)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        val ptr = new org.apache.hadoop.fs.Path(s"$path/_latest")
        val prevV = readPtr(fs, ptr)
        // replay guard: a re-run after publish would read v<batchId> and
        // overwrite the same dir (Spark rejects), wedging the stream
        if (!prevV.contains(s"v$batchId")) {
          val pool = prevV match {
            case Some(v) =>
              spark.read.parquet(s"$path/$v").select(col("id"), col("vec"))
                .unionByName(batch.select(col("id"), col("vec")))
            case None => batch.select(col("id"), col("vec"))
          }
          val centers = graft.pipeline.Similarity
            .kCenterSelect(pool, "id", "vec", k)
            .join(pool, Seq("id"))
            .select(col("id"), col("vec"), col("pick_order"), col("dist_to_prev"))
          centers.coalesce(1).write.mode("overwrite").parquet(s"$path/v$batchId")
          writePtr(fs, ptr, s"v$batchId")
          gcVersions(fs, path, Set(s"v$batchId") ++ prevV)
        }
        ()
      }
      .option("checkpointLocation", checkpoint)
      .start()

  /** Continuous sequence PACKING — the streaming tail of the curation
    * pipeline: per micro-batch, documents get fixed-token-budget pack
    * assignments (TextAnalysis.packSequences, shard-parallel) and land
    * as training rows — pack coordinates PLUS the text payload, so a
    * data loader reads sealed batch dirs directly with no join back to
    * the raw corpus (the text rides the window's one shard shuffle) —
    * in batch-owned partition dirs (idempotent under
    * retry, same scheme as ingestWithCompaction). Packs are scoped
    * (batch, shard): the micro-batch is the natural packing unit under
    * continuous ingest — data loaders consume sealed batches, and
    * cross-batch packing would need unbounded state for no benefit
    * (the token budget is per sequence, not global). */
  def ingestPackedDocuments(docs: DataFrame, path: String, checkpoint: String,
                            budget: Int = 512, shards: Int = 32)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.pipeline.TextAnalysis.packSequences(batch, budget, shards,
            keep = Seq("text"))
          .write.mode("overwrite").parquet(s"$path/packed/batch=$batchId")
      }
      .start()

  /** Streaming ingest GATING — the §2C curation gates applied at the
    * moment documents enter the corpus instead of as a later batch
    * sweep: per micro-batch (a static DataFrame inside the
    * single-writer foreachBatch loop), the fused language+quality
    * projection (TextAnalysis.langQuality — ONE pass over the batch)
    * drops wrong-language / low-quality docs, and benchmark
    * decontamination (TextAnalysis.decontaminate — the tiny eval side
    * broadcast) drops anything sharing an n-token shingle with the
    * static eval corpus. Survivors land in batch-owned partition dirs
    * (idempotent under micro-batch retry, same scheme as
    * ingestWithCompaction), carrying their gate verdict columns;
    * rejects are quarantined alongside with the full verdict row — the
    * drop is auditable, never silent. */
  def ingestGatedDocuments(docs: DataFrame, evalDocs: DataFrame,
                           path: String, checkpoint: String,
                           lang: String = "en", minQuality: Double = 0.5,
                           shingle: Int = 8)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val verdicts = gateVerdicts(batch, evalDocs, lang, minQuality, shingle)
        // persist before the two sinks: the gate computation (the
        // langQuality projection + the eval-shingle broadcast join)
        // executes ONCE per micro-batch and both filtered writes read
        // the cached result — the standard multi-sink foreachBatch
        // discipline; without it each write would re-run the gates.
        val graded = batch.join(verdicts, "doc_id").persist()
        try {
          graded.filter(col("pass")).drop("pass", "contaminated")
            .write.mode("overwrite").parquet(s"$path/corpus/batch=$batchId")
          graded.filter(!col("pass")).drop("pass")
            .write.mode("overwrite").parquet(s"$path/quarantine/batch=$batchId")
        } finally graded.unpersist(false): Unit
      }
      .start()

  /** Per-batch gate verdicts — (doc_id, pred_lang, quality_score,
    * contaminated, pass) — shared by [[ingestGatedDocuments]] and
    * [[ingestCurationPipeline]] so the gate semantics cannot drift
    * between the gate-only and the composed sink. A null gate column
    * (e.g. null text → null pred_lang) must FAIL the gate, not vanish
    * from both outputs: the verdict coalesces to false so null-gated
    * rows are quarantined — the auditable-drop guarantee holds for
    * malformed rows too. */
  private[graft] def gateVerdicts(batch: DataFrame, evalDocs: DataFrame,
                                  lang: String, minQuality: Double,
                                  shingle: Int): DataFrame = {
    import graft.pipeline.TextAnalysis
    val gates = TextAnalysis.langQuality(batch)
      .select(col("doc_id"), col("pred_lang"), col("quality_score"))
    val contaminated = TextAnalysis.decontaminate(batch, evalDocs, shingle)
      .select(col("doc_id"), lit(true).as("contaminated"))
    gates.join(contaminated, Seq("doc_id"), "left")
      .withColumn("contaminated", coalesce(col("contaminated"), lit(false)))
      .withColumn("pass", coalesce(
        col("pred_lang") === lang && col("quality_score") >= minQuality &&
          !col("contaminated"), lit(false)))
  }

  /** The FULL streaming curation pipeline in ONE single-writer stream —
    * the composition a real training-data deployment runs at ingest,
    * wiring the §2E surfaces end-to-end per micro-batch:
    *
    *  1. GATES (shared [[gateVerdicts]]): language + quality +
    *     benchmark decontamination; rejects land in auditable
    *     batch-owned quarantine dirs.
    *  2. CROSS-BATCH EXACT DEDUP: first-seen content hash wins. The
    *     seen-set is a durable hash sidecar appended per batch (state
    *     lives in the layout, not executor memory — restart-safe and
    *     O(1) per batch to extend); within a batch the min doc_id per
    *     hash survives, across batches earlier batches win (a retried
    *     batch re-reads only sidecar dirs BELOW its id — idempotent).
    *  3. PACKING: survivors become fixed-token-budget training rows
    *     (packSequences, text payload riding the one shard shuffle)
    *     in batch-owned `packed/` dirs.
    *  4. EMBED + ANN REFRESH: survivors get deterministic
    *     hashing-trick embeddings (TextAnalysis.hashEmbedding) appended
    *     to the corpus; every `refreshEvery` batches the shared
    *     [[annRefreshStep]] signs ONLY the new batches into the
    *     published segmented index (O(new rows), LSM compaction at the
    *     segment bound).
    *
    * Every stage is serialized in the one foreachBatch writer — no
    * cross-stage coordination, every sink idempotent under retry. The
    * composition spec pins streamed output == the batch pipeline
    * (gates → exact dedup → pack) on the same data. */
  def ingestCurationPipeline(docs: DataFrame, evalDocs: DataFrame,
                             path: String, checkpoint: String,
                             lang: String = "en", minQuality: Double = 0.5,
                             shingle: Int = 8, budget: Int = 512,
                             shards: Int = 32, dims: Int = 64,
                             planes: Int = 8, refreshEvery: Int = 2,
                             keepVersions: Int = 3, maxSegments: Int = 16)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        import graft.pipeline.TextAnalysis
        val verdicts = gateVerdicts(batch, evalDocs, lang, minQuality, shingle)
        val graded = batch.join(verdicts, "doc_id").persist()
        try {
          graded.filter(!col("pass")).drop("pass")
            .write.mode("overwrite").parquet(s"$path/quarantine/batch=$batchId")
          val passed = graded.filter(col("pass")).select(col("doc_id"), col("text"))
          // exact dedup within the batch IS the batch operator
          // (Dedup.exact — min doc_id per content hash; reusing it, not
          // re-stating the normalization, is what keeps the streamed
          // seen-hash keys and the batch pipeline from ever drifting)...
          val firstInBatch = passed
            .join(graft.pipeline.Dedup.exact(passed), Seq("doc_id"))
          // ...then first-seen across batches via the durable seen-hash
          // sidecar (only dirs below this batch id: retry-idempotent)
          val seenDirs = corpusBatchDirs(spark, s"$path/seen")
            .collect { case (id, p) if id < batchId => p }
          // persist the FULL fresh relation: all three sinks below
          // derive from it, and the anti-join against the seen sidecar
          // (whose dir count grows with stream lifetime) must execute
          // once per batch, not once per sink
          val fresh =
            (if (seenDirs.isEmpty) firstInBatch
             else firstInBatch.join(
               spark.read.parquet(seenDirs: _*), Seq("text_hash"), "left_anti"))
              .persist()
          try {
            fresh.select(col("text_hash"))
              .write.mode("overwrite").parquet(s"$path/seen/batch=$batchId")
            TextAnalysis.packSequences(fresh.select(col("doc_id"), col("text")),
                budget, shards, keep = Seq("text"))
              .write.mode("overwrite").parquet(s"$path/packed/batch=$batchId")
            TextAnalysis.hashEmbedding(fresh.select(col("doc_id"), col("text")), dims)
              .select(col("doc_id").as("id"), col("vec"))
              .write.mode("overwrite").parquet(s"$path/corpus/batch=$batchId")
          } finally fresh.unpersist(false): Unit
          if ((batchId + 1) % refreshEvery == 0)
            annRefreshStep(spark, path, planes, batchId, keepVersions, maxSegments)
        } finally graded.unpersist(false): Unit
      }
      .start()

  /** STREAMING DSIR (the §2C sample_importance twin): the maintained
    * state is the per-bucket (n_r, n_t) token-count relation — ≤
    * `buckets` rows no matter the stream volume, and PURELY ADDITIVE,
    * so the merged sidecar after any batch equals the batch operator's
    * counts over every doc ingested so far under ANY batch boundaries
    * (spec-pinned). Scoring is the serving face:
    * [[graft.pipeline.TextAnalysis.dsirScoreAgainst]] against the
    * current sidecar reproduces the batch importanceWeights output
    * exactly once ingestion has covered the corpus. Same versioned
    * sidecar + atomic pointer + batchId-idempotent replay guard + GC
    * discipline as [[ingestHeavyHitters]]. */
  def ingestDsir(docs: DataFrame, isTarget: org.apache.spark.sql.Column,
                 path: String, checkpoint: String,
                 buckets: Int = 1024): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        dsirStep(batch, isTarget, batchId, path, buckets)
      }
      .option("checkpointLocation", checkpoint)
      .start()

  /** One [[ingestDsir]] micro-batch — exposed for the replay/parity
    * specs. Reads the previous version dir and writes a NEW one (never
    * the dir being read), then swings the pointer. */
  private[graft] def dsirStep(batch: DataFrame, isTarget: org.apache.spark.sql.Column,
                              batchId: Long, path: String, buckets: Int): Unit = {
    val spark = batch.sparkSession
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val ptr = new org.apache.hadoop.fs.Path(s"$path/_latest")
    val prevV = readPtr(fs, ptr)
    if (!prevV.contains(s"v$batchId")) {
      val bCnt = graft.pipeline.TextAnalysis.dsirBucketCounts(batch, isTarget, buckets)
      val merged = prevV match {
        case Some(v) => bCnt.unionByName(spark.read.parquet(s"$path/$v"))
          .groupBy(col("b"))
          .agg(sum(col("n_r")).as("n_r"), sum(col("n_t")).as("n_t"))
        case None => bCnt
      }
      merged.coalesce(1).write.mode("overwrite").parquet(s"$path/v$batchId")
      writePtr(fs, ptr, s"v$batchId")
      gcVersions(fs, path, Set(s"v$batchId") ++ prevV)
    }
  }

  /** STREAMING soft-dedup (the §2C dedup_soft twin): continuous
    * ingestion maintains duplication multiplicity as APPEND-ONLY
    * per-batch sidecar dirs (`docs/batch=N`: doc_id, text_hash,
    * n_tokens — the projection IS the batch operator's
    * Dedup.softDedupHashed, so the dedup key can never drift). The
    * near-dup-sidecar discipline: corpus-sized state lives in the
    * LAYOUT (disk-resident parquet), never executor memory; the
    * per-batch write costs one batch, not a corpus rewrite; a replayed
    * batch id overwrites its own dir (idempotent retries). Compact by
    * rewriting the dirs into one offline.
    *
    * The serving face [[softDedupWeights]] is EXACTLY
    * Dedup.softDedup of everything ingested, under ANY batch
    * boundaries (spec-pinned): counts are associative and the weight
    * is a pure function of the final count — it literally runs the
    * batch operator's softDedupFromHashed over the union of dirs. A
    * doc id re-delivered in a DIFFERENT batch (at-least-once sources;
    * the same-batch replay is caught by the dir guard) is collapsed by
    * the serve-time dropDuplicates on doc_id, so delivery duplicates
    * never inflate a cluster. */
  def ingestSoftDedup(docs: DataFrame, path: String, checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        softDedupStep(batch, batchId, path)
      }
      .option("checkpointLocation", checkpoint)
      .start()

  /** One [[ingestSoftDedup]] micro-batch — exposed for specs. */
  private[graft] def softDedupStep(batch: DataFrame, batchId: Long,
                                   path: String): Unit = {
    val spark = batch.sparkSession
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dir = new org.apache.hadoop.fs.Path(s"$path/docs/batch=$batchId")
    if (!fs.exists(dir))
      graft.pipeline.Dedup.softDedupHashed(batch)
        .write.mode("overwrite").parquet(dir.toString)
  }

  /** Serving face: per-doc soft-dedup weights over everything
    * ingested — the batch operator's plan over the sidecar union. */
  def softDedupWeights(spark: org.apache.spark.sql.SparkSession,
                       path: String): DataFrame =
    graft.pipeline.Dedup.softDedupFromHashed(
      spark.read.parquet(s"$path/docs").dropDuplicates("doc_id")
        .select(col("doc_id"), col("text_hash"), col("n_tokens")))

  /** STREAMING novelty (the §2C text_novelty twin): the per-doc
    * distinct (doc_id, sh) shingle stream lands in APPEND-ONLY
    * per-batch sidecar dirs (`sh/batch=N` — the projection IS the
    * batch operator's TextAnalysis.shingleHashes, hashes can never
    * drift); [[noveltyScores]] runs the batch operator's
    * noveltyFromShingles over the dir union, and because min(doc_id)
    * is associative the served first-occurrence — hence every novelty
    * score — is EXACTLY the batch answer over everything ingested,
    * under ANY batch boundaries (spec-pinned). Same dir-guard replay
    * idempotency and serve-time redelivery collapse as
    * [[softDedupStep]]; corpus-sized state lives in the layout,
    * compacted offline like the near-dup sidecar. */
  private[graft] def noveltyStep(batch: DataFrame, batchId: Long,
                                 path: String, n: Int = 8): Unit = {
    val spark = batch.sparkSession
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dir = new org.apache.hadoop.fs.Path(s"$path/sh/batch=$batchId")
    if (!fs.exists(dir))
      graft.pipeline.TextAnalysis.shingleHashes(batch, n)
        .write.mode("overwrite").parquet(dir.toString)
  }

  def ingestNovelty(docs: DataFrame, path: String, checkpoint: String,
                    n: Int = 8): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        noveltyStep(batch, batchId, path, n)
      }
      .option("checkpointLocation", checkpoint)
      .start()

  /** Serving face: per-doc novelty over everything ingested — the
    * batch operator's plan over the sidecar union (redelivered
    * (doc_id, sh) rows collapse in the distinct). */
  def noveltyScores(spark: org.apache.spark.sql.SparkSession,
                    path: String): DataFrame =
    graft.pipeline.TextAnalysis.noveltyFromShingles(
      spark.read.parquet(s"$path/sh").select(col("doc_id"), col("sh"))
        .dropDuplicates("doc_id", "sh"))

  /** STREAMING weighted reservoir (the §2C sample_weighted twin):
    * Efraimidis-Spirakis keys are a DETERMINISTIC function of the id
    * (md5-derived u, key = ln u / w), and top-k is MERGEABLE —
    * top-k(A ∪ B) = top-k(top-k(A) ∪ top-k(B)) — so the k-row sidecar
    * after any batch is EXACTLY the batch operator's sample over
    * everything ingested so far, under ANY batch boundaries (not just
    * distribution-equal; spec-pinned). State = k rows regardless of
    * stream volume; same versioned sidecar + pointer + replay-guard +
    * GC discipline as the other sinks. */
  def ingestWeightedSample(docs: DataFrame, idCol: String, weightCol: String,
                           k: Int, path: String, checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        weightedSampleStep(batch, batchId, path, idCol, weightCol, k)
      }
      .option("checkpointLocation", checkpoint)
      .start()

  /** One [[ingestWeightedSample]] micro-batch — exposed for specs. */
  private[graft] def weightedSampleStep(batch: DataFrame, batchId: Long,
                                        path: String, idCol: String,
                                        weightCol: String, k: Int): Unit = {
    val spark = batch.sparkSession
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val ptr = new org.apache.hadoop.fs.Path(s"$path/_latest")
    val prevV = readPtr(fs, ptr)
    if (!prevV.contains(s"v$batchId")) {
      val bTop = graft.pipeline.TextAnalysis
        .weightedSample(batch.select(col(idCol), col(weightCol)), idCol, weightCol, k)
      // dropDuplicates on id BEFORE the merging re-sample: the same doc
      // id delivered in two different micro-batches (distinct batchIds,
      // so the replay guard doesn't apply) computes identical ES keys
      // and would otherwise occupy TWO of the k reservoir slots,
      // diverging from the batch operator on the deduped corpus.
      val merged = prevV match {
        case Some(v) => graft.pipeline.TextAnalysis.weightedSample(
          bTop.unionByName(spark.read.parquet(s"$path/$v"))
            .dropDuplicates(idCol), idCol, weightCol, k)
        case None => bTop
      }
      merged.coalesce(1).write.mode("overwrite").parquet(s"$path/v$batchId")
      writePtr(fs, ptr, s"v$batchId")
      gcVersions(fs, path, Set(s"v$batchId") ++ prevV)
    }
  }
}
