package graft.sources

import graft.core.{FactDb, FactStore}
import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Durable fact-log layout (SURVEY.md §3): the cluster-scale
  * replacement for the reference's B-tree-over-KV storage
  * (/root/reference/src/unifydb/storage/btree.clj).
  *
  * Layout: parquet `partitionBy("a")` — an attribute-constant pattern
  * prunes to one directory (the AVET-index role) — with `e` spread
  * across `buckets` files per partition via repartition on hash(e), so
  * entity-joins co-locate (the EAVT-index role). Appends are new files
  * inside the partition (the append-only paradigm); `asOfTx` filtering
  * happens at read via the `tx` column, with row-group min/max stats
  * pruning old segments. Metadata (value slots per attribute,
  * cardinality-many set) rides along as a one-row JSON sidecar.
  */
object FactLogIO {

  def write(db: FactDb, path: String, buckets: Int = 8,
            mode: SaveMode = SaveMode.Overwrite): Unit = {
    db.log
      .repartition(buckets, col("e"))
      .sortWithinPartitions(col("e"), col("a"), col("tx"))
      .write.mode(mode)
      .partitionBy("a")
      .parquet(s"$path/facts")
    writeMeta(db.log.sparkSession, path, db.attrTypes, db.cardMany, db.versioned, mode)
  }

  /** The one-row JSON metadata sidecar (value slots per attribute,
    * cardinality-many set, versioned flag) — written separately so
    * streaming writers, which produce only the facts directory, can
    * complete the layout. */
  def writeMeta(spark: SparkSession, path: String, attrTypes: Map[String, String],
                cardMany: Set[String], versioned: Boolean,
                mode: SaveMode = SaveMode.Overwrite): Unit = {
    import spark.implicits._
    Seq((attrTypes.map { case (k, v) => s"$k=$v" }.toSeq.sorted.mkString(","),
        cardMany.toSeq.sorted.mkString(","), versioned))
      .toDF("attr_types", "card_many", "versioned")
      .coalesce(1).write.mode(mode).json(s"$path/meta")
  }

  /** Bucketed-table variant: hash(e) buckets recorded in the catalog, so
    * entity-entity joins between fact tables (or self-joins of pattern
    * scans) are CO-LOCATED — Spark plans them with no Exchange. This is
    * the cluster answer to the reference's EAVT index locality.
    *
    * `partitionByAttr` additionally lays the log out one directory per
    * attribute (the AVET-index role): an attribute-constant pattern
    * scan then PRUNES to its attribute's directory instead of filtering
    * the full log, while hash(e) bucketing still co-locates the
    * entity-joins between those pattern scans. This is the layout a
    * multi-pattern datalog conjunction wants at 100 TB: each clause
    * reads only its attribute, and the conjunction joins plan with no
    * Exchange.
    *
    * Sizing `buckets`: graft sessions disable autoBucketedScan (to keep
    * the single-bucket point-read prune), which pins a bucketed scan to
    * one task per bucket — the bucket count is therefore the scan's
    * parallelism ceiling. Size it to the executor core budget of the
    * deployment (32 for graft's local[32] harness; a 1000-executor
    * cluster writes thousands). */
  def writeBucketedTable(db: FactDb, table: String, buckets: Int = 32,
                         partitionByAttr: Boolean = false): Unit = {
    val w = db.log.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, "e").format("parquet")
      // fine-grained pages (default row-count limit is 20k): with the
      // file sorted by e, the parquet column index then prunes a point
      // read (PointRead.entityDirect's e = eid record filter) to a
      // ~2k-row page instead of decoding a 20k-row one — the difference
      // between ~60 ms and sub-30 ms warm entity reads. Cost is a few
      // extra page headers per column chunk; full-scan throughput is
      // unaffected at these sizes.
      .option("parquet.page.row.count.limit", "2000")
    // `a` is constant inside an attribute directory, so the sort key
    // drops it there (Spark rejects sortBy ∩ partitionBy).
    if (partitionByAttr) w.sortBy("e", "tx").partitionBy("a").saveAsTable(table)
    else w.sortBy("e", "a", "tx").saveAsTable(table)
  }

  /** Index compaction (the reference's B-tree index-build analogue,
    * Datomic-style log+index): materialize the RESOLVED snapshot at
    * `watermark` as a base segment. Subsequent snapshot reads resolve
    * base ∪ facts-after-watermark, so query cost is proportional to
    * the LIVE set + tail — not to total history length. The full log
    * stays untouched for historical / as-of-before-watermark reads.
    *
    * Correct because version resolution is newest-op-wins per value: a
    * base fact re-enters resolution at its original tx, so a tail
    * retraction (newer tx) still cancels it, and a tail assertion
    * still supersedes it for cardinality-one. */
  def writeSnapshotBase(db: FactDb, path: String, watermark: Long): Unit = {
    db.snapshot(watermark)
      .write.mode(SaveMode.Overwrite).parquet(s"$path/base")
    val spark = db.log.sparkSession
    import spark.implicits._
    Seq(watermark).toDF("watermark")
      .coalesce(1).write.mode(SaveMode.Overwrite).json(s"$path/base_meta")
  }

  /** A FactDb whose snapshot() resolves the compacted base + the log
    * tail past the watermark. Historical reads must keep using the
    * original db (the base has dead versions compacted away). */
  def withSnapshotBase(spark: SparkSession, path: String, db: FactDb): FactDb = {
    val watermark = spark.read.json(s"$path/base_meta").head().getAs[Long]("watermark")
    val base = spark.read.parquet(s"$path/base")
      .select(FactStore.factSchema.fieldNames.toIndexedSeq.map(col): _*)
    db.copy(log = base.unionAll(db.log.filter(col("tx") > watermark)),
      versioned = true)
  }

  /** What [[excise]] did: how many physical files were rewritten (vs
    * left untouched) and how many fact rows ceased to exist. */
  final case class ExciseReport(filesRewritten: Long, filesTotal: Long,
                                factsRemoved: Long)

  /** EXCISION — physical removal of every fact VERSION of the given
    * entities from a written layout (the right-to-be-forgotten /
    * Datomic-excise operation): unlike a RETRACTION, which is an
    * ordinary newer fact that hides a value while history keeps it,
    * excision REWRITES storage so the data provably no longer exists —
    * historical and as-of reads included.
    *
    * Surgical by layout, not by scan: [[write]] spreads `e` across
    * hash buckets inside each attribute directory with per-row-group
    * e-min/max stats (sortWithinPartitions), so (1) locating the
    * victims is one pushdown-pruned scan collecting DISTINCT FILE
    * PATHS — an entity lives in exactly ONE bucket file per attribute
    * directory — and (2) only those files are rewritten in place
    * (read one file → filter → atomic single-file replace); every
    * other byte of a 100 TB log is untouched. Cost is
    * O(|attrs(e)| · file), independent of log size.
    *
    * Single-writer discipline (the sidecar rule): not safe under
    * concurrent readers of the same files — run it as the log's
    * maintenance writer. A snapshot-base segment under `path` (from
    * [[writeSnapshotBase]]) is excised too when present.
    *
    * Crash safety: the replacement file is written to a hidden
    * `.excise_tmp_*` dir, then swapped in with a single overwriting
    * rename (`FileContext.rename(..., Options.Rename.OVERWRITE)` —
    * atomic on POSIX and HDFS; on a filesystem without overwrite
    * rename the fallback is delete+rename, whose crash window leaves
    * the bucket file missing — the tmp-dir SWEEP below plus the audit
    * record make recovery mechanical: rerun excise). Leftover
    * `.excise_tmp_*` dirs from an earlier crash are removed up front.
    *
    * Audit trail: every excision appends a JSON record under
    * `path/meta_excise/` (ids, wall-clock, per-run report) — the
    * durable marker that as-of/historical reads changed (the
    * reference's Datomic-style excision fact, re-expressed as a
    * sidecar since the excised log must not re-admit the ids).
    *
    * CALLER CONTRACT: excise mutates files in place, so any
    * same-session cached relation built over `path` (persisted frames,
    * the datalog fixpoint cache) may keep serving the victim's rows —
    * or hit a missing file — until dropped; drop session caches over
    * the path after excising. */
  def excise(spark: SparkSession, path: String, ids: Seq[Long]): ExciseReport = {
    require(ids.nonEmpty, "excise needs at least one entity id")
    val conf = spark.sparkContext.hadoopConfiguration
    def parquetFilesUnder(dir: String): Seq[String] = {
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = p.getFileSystem(conf)
      if (!fs.exists(p)) Seq.empty
      else {
        val it = fs.listFiles(p, true)
        val out = collection.mutable.ArrayBuffer.empty[String]
        while (it.hasNext) {
          val f = it.next().getPath
          if (f.getName.endsWith(".parquet") &&
            !f.toString.contains("/.excise_tmp_")) out += f.toString
        }
        out.toSeq
      }
    }
    /** Total row count from the parquet FOOTER — driver-side metadata,
      * no Spark job (the single-pass discipline: the victim count per
      * file comes from the locate job, kept = footer − victims). */
    def footerRows(fp: org.apache.hadoop.fs.Path): Long = {
      val in = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(fp, conf))
      try in.getRecordCount finally in.close()
    }
    def sweepTmpLeftovers(dir: String): Unit = {
      // DIRECTORY walk, not fs.listFiles (file enumeration): an EMPTY
      // .excise_tmp_ dir — crash between mkdir and the first part-file
      // write — contains no files, so a file-parent walk never finds
      // it and it accumulates forever
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = p.getFileSystem(conf)
      def walk(d: org.apache.hadoop.fs.Path): Unit =
        fs.listStatus(d).foreach { st =>
          if (st.isDirectory) {
            if (st.getPath.getName.startsWith(".excise_tmp_"))
              fs.delete(st.getPath, true): Unit
            else walk(st.getPath)
          }
        }
      if (fs.exists(p)) walk(p)
    }
    def exciseDir(dir: String): (Long, Long, Long) = {
      sweepTmpLeftovers(dir) // crash leftovers from an interrupted run
      val all = parquetFilesUnder(dir)
      if (all.isEmpty) return (0L, 0L, 0L)
      // ONE pushdown-pruned job locates the victim files AND counts the
      // victim rows per file
      val hits = spark.read.parquet(dir)
        .filter(col("e").isin(ids: _*))
        .groupBy(input_file_name().as("f")).count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      var removed = 0L
      hits.foreach { case (f, victims) =>
        val fp = new org.apache.hadoop.fs.Path(f)
        val fs = fp.getFileSystem(conf)
        removed += victims
        val keptN = footerRows(fp) - victims
        if (keptN == 0L) fs.delete(fp, false)
        else {
          // write the replacement beside the original (ONE job per
          // rewritten file), then swap with an overwriting rename —
          // a single atomic step where the filesystem supports it
          val tmp = new org.apache.hadoop.fs.Path(
            fp.getParent, s".excise_tmp_${fp.getName}")
          spark.read.parquet(f).filter(!col("e").isin(ids: _*))
            .coalesce(1).write.mode(SaveMode.Overwrite).parquet(tmp.toString)
          val part = fs.listStatus(tmp).map(_.getPath)
            .find(_.getName.endsWith(".parquet"))
            .getOrElse(sys.error(s"excise: no parquet produced under $tmp"))
          try {
            val fc = org.apache.hadoop.fs.FileContext.getFileContext(fp.toUri, conf)
            fc.rename(part, fp, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
          } catch {
            // UnsupportedOperationException: the filesystem's rename
            // can't overwrite. UnsupportedFileSystemException (an
            // IOException, thrown by getFileContext itself): the scheme
            // has no AbstractFileSystem binding at all — without this
            // arm the excise aborts MID-RUN with some files rewritten
            // and others not. Both land on the documented non-atomic
            // fallback (recovery = the sweep + rerun, guided by the
            // audit record).
            case _: UnsupportedOperationException |
                 _: org.apache.hadoop.fs.UnsupportedFileSystemException =>
              fs.delete(fp, false)
              fs.rename(part, fp)
          }
          fs.delete(tmp, true)
        }
      }
      (hits.size.toLong, all.size.toLong, removed)
    }
    val (f1, t1, r1) = exciseDir(s"$path/facts")
    val (f2, t2, r2) = exciseDir(s"$path/base") // compacted snapshot, if any
    val report = ExciseReport(f1 + f2, t1 + t2, r1 + r2)
    // durable audit record — excision provably happened, with what ids
    val auditDir = new org.apache.hadoop.fs.Path(s"$path/meta_excise")
    val fs = auditDir.getFileSystem(conf)
    fs.mkdirs(auditDir)
    val ts = System.currentTimeMillis()
    val rec = s"""{"excised_ids":[${ids.mkString(",")}],"at_epoch_ms":$ts,""" +
      s""""files_rewritten":${report.filesRewritten},""" +
      s""""facts_removed":${report.factsRemoved}}"""
    // uniquified name + overwrite=false: two excisions in the same
    // millisecond must yield two audit records, never silently one
    val nonce = java.util.UUID.randomUUID.toString.take(8)
    val out = fs.create(
      new org.apache.hadoop.fs.Path(auditDir, s"excise_$ts-$nonce.json"), false)
    try out.write((rec + "\n").getBytes("UTF-8")) finally out.close()
    report
  }

  def read(spark: SparkSession, path: String): FactDb = {
    val meta = spark.read.json(s"$path/meta").head()
    val attrTypes = meta.getAs[String]("attr_types").split(',')
      .filter(_.nonEmpty).map { kv =>
        val Array(k, v) = kv.split('='); (k, v)
      }.toMap
    val cardMany = meta.getAs[String]("card_many").split(',').filter(_.nonEmpty).toSet
    // partitionBy turned `a` into a partition column (read back as the
    // last column) — restore canonical column order.
    val log = spark.read.parquet(s"$path/facts")
      .select(FactStore.factSchema.fieldNames.toIndexedSeq.map(col): _*)
      .select(col("e"), col("a").cast("string").as("a"), col("vtype"),
        col("vstr"), col("vlong"), col("vdbl"), col("vts"), col("vref"),
        col("tx"), col("added"))
    FactDb(log, attrTypes, cardMany, versioned = meta.getAs[Boolean]("versioned"))
  }
}
