package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (SURVEY.md §2C).
  *
  * Scale design: top-k against a probe vector is per-partition top-k
  * (Catalyst's TakeOrderedAndProject — no global sort, no shuffle of
  * the full table); the probe is a broadcast literal. The LSH variant
  * prunes to matching sign-buckets first — the scale path when the
  * corpus is 10^10 vectors: the bucket join replaces the full scan.
  */
object Similarity {

  /** Codegen'd native expression (graft.functions.DotProduct) — same
    * sequential accumulation as the aggregate/zip_with formulation it
    * replaced, with no per-row array allocation. */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.dot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Fused one-pass native cosine (graft.functions.CosineSim): one array
    * traversal instead of three dots, bit-identical accumulation. */
  def cosine(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.cosine(a, b)

  /** Per-dimension corpus mean — the CENTERING MODEL every sign-LSH
    * bucketing in this library subtracts before hashing. Real text
    * embeddings (hashing-trick, most sentence encoders) share a
    * dominant common direction (stopword mass), so RAW sign-LSH
    * concentrates the corpus: 65% of sf0.1 docs landed in ONE bucket
    * (SCALE_r14 bitext probe) — Σ|bucket|² pruning collapses and a
    * bucket self-join goes quadratic. Subtracting the mean before
    * hashing spreads signs; SCORING always uses raw vectors, so
    * emitted cosines are unchanged, and near-identical raw vectors
    * stay near-identical after the translation (the recall contract —
    * only points near the centroid get unstable centered directions,
    * exactly the points with no distinctive content).
    *
    * One map-side-combinable aggregation; |dims| rows collected (a
    * parameter fetch, not a data haul). Like IVF's centroids, the
    * returned mean is a pinned MODEL PARAMETER: persisted index metas
    * carry it, incremental refreshes sign new rows with the pinned
    * mean, and probes must center with the index's own mean. */
  def corpusMean(emb: DataFrame, vecCol: String): Seq[Double] =
    emb.select(posexplode(col(vecCol)).as(Seq("i", "v")))
      .groupBy(col("i")).agg(avg(col("v")).as("m"))
      .collect().sortBy(_.getInt(0)).map(_.getDouble(1)).toSeq

  /** `vec − mean`, for BUCKETING only (never scoring). Nil = identity
    * (a legacy index signed raw). try_element_at: a ragged vector
    * centers as raw rather than throwing under ANSI, and the output
    * length always matches the input vector's. */
  private[graft] def centeredCol(vec: Column, mean: Seq[Double]): Column =
    if (mean.isEmpty) vec
    else {
      val meanLit = array(mean.map(lit): _*)
      transform(vec, (v, i) =>
        v - coalesce(try_element_at(meanLit, i + lit(1)), lit(0.0)))
    }

  /** Driver-side twin of [[centeredCol]] for constant probe vectors —
    * the same "missing mean component = 0" semantics, in the same IEEE
    * doubles, so a probe's signature can never drift from the corpus
    * signing path. */
  private[graft] def centeredConst(probe: Seq[Double],
                                   mean: Seq[Double]): Seq[Double] =
    if (mean.isEmpty) probe
    else probe.zipWithIndex.map { case (x, i) =>
      x - (if (i < mean.length) mean(i) else 0.0)
    }

  /** EMBEDDING-SPACE DATASHEET — per-label centroid norm and spread,
    * the collapse/coverage report an embedding release ships with
    * (near-zero centroid norm = the label's vectors cancel out;
    * near-zero spread = representation collapse). spread is the mean
    * squared distance to the centroid via the shift identity
    * E‖v−c‖² = E‖v‖² − ‖c‖², so NO second pass joins the centroid
    * back against the corpus.
    *
    * Determinism discipline: components are QUANTIZED to 1e-6 ints, so
    * every cross-row sum is exact int64 (component sums, squared-norm
    * sums) and order-independent; the per-dim centroid-squared terms
    * are re-quantized (1e-12 grid) from those exact ints before the
    * per-label sum — the audited double-accumulation divergence class
    * cannot occur on either reduction.
    *
    * Scale: one explode (rows×dim), ONE shuffle to (label, dim) — at
    * most |labels|·dim groups, map-side combinable — then a free
    * |labels|-row rollup. */
  def embedStats(emb: DataFrame, idCol: String, vecCol: String,
                 labelCol: String): DataFrame = {
    val q = round(col("x").cast("double") * 1e6, 0).cast("long")
    val perDim = emb
      .select(col(labelCol).as("label"),
        posexplode(col(vecCol)).as(Seq("dim", "x")))
      .select(col("label"), col("dim"), q.as("q"))
      .groupBy(col("label"), col("dim"))
      // BOTH cross-row sums in DECIMAL(38,0): at q ~ 1e6·|component| a
      // long Σq² wraps silently near 1e12 rows/label, and the plain Σq
      // overflows (throws under Spark 4 ANSI) around ~9e12 rows/label —
      // the datasheet must stay exact at any corpus size (output schema
      // is unaffected; only the final doubles are published)
      .agg(count(lit(1)).as("n"), sum(col("q").cast("decimal(38,0)")).as("sq"),
        sum((col("q") * col("q")).cast("decimal(38,0)")).as("sqq"))
    // centroid component c_d = sq/(n·1e6); its squared term re-lands on
    // an exact 1e-12 integer grid so the 64-term norm² sum is int64
    val cd = col("sq").cast("double") / col("n").cast("double") / 1e6
    perDim
      .select(col("label"), col("n"), col("sqq"),
        round(cd * cd * 1e12, 0).cast("long").as("c2q"))
      .groupBy(col("label"))
      .agg(max(col("n")).as("n_vecs"), sum(col("c2q")).as("c2sum"),
        sum(col("sqq")).as("sqqsum"))
      .select(col("label"), col("n_vecs"),
        round(sqrt(col("c2sum").cast("double") / 1e12), 6).as("centroid_norm"),
        round(col("sqqsum").cast("double") / col("n_vecs").cast("double") / 1e12, 6)
          .as("mean_sq_norm"),
        round(col("sqqsum").cast("double") / col("n_vecs").cast("double") / 1e12
          - col("c2sum").cast("double") / 1e12, 6).as("spread"))
      .orderBy(col("label"))
  }

  /** Exact brute-force cosine top-k vs one probe vector. */
  def topK(emb: DataFrame, idCol: String, vecCol: String,
           probe: Seq[Double], k: Int, excludeId: Option[Long] = None): DataFrame = {
    val p = array(probe.map(lit): _*)
    val scored = emb.select(col(idCol).as("id"),
      round(cosine(col(vecCol), p), 6).as("cos"))
    val filtered = excludeId.fold(scored)(x => scored.filter(col("id") =!= x))
    filtered.orderBy(col("cos").desc, col("id")).limit(k)
  }

  /** Cosine RANGE search: every vector within `minCos` of the probe —
    * the radius-query dual of [[topK]] (dedup wants "everything closer
    * than τ", not "the 10 closest"). Map-only: one codegen'd cosine per
    * row and a filter; no sort, no shuffle, output unbounded by design. */
  def rangeSearch(emb: DataFrame, idCol: String, vecCol: String,
                  probe: Seq[Double], minCos: Double,
                  excludeId: Option[Long] = None): DataFrame = {
    val p = array(probe.map(lit): _*)
    val scored = emb.select(col(idCol).as("id"),
      round(cosine(col(vecCol), p), 6).as("cos"))
    val filtered = excludeId.fold(scored)(x => scored.filter(col("id") =!= x))
    filtered.filter(col("cos") >= minCos)
  }

  /** IVF (inverted-file) approximate top-k: a deterministic k-means
    * coarse quantizer partitions the corpus into `nlist` cells; queries
    * scan only the `nprobe` cells nearest the probe, with exact
    * rescoring inside them. This is the standard billion-vector scale
    * path (cf. FAISS IVF): the cell assignment is a one-off indexing
    * shuffle, after which a query touches ~nprobe/nlist of the data.
    *
    * Determinism: centroid seeds are the `nlist` vectors with smallest
    * xxhash64(id); Lloyd runs a FIXED `iters` count; all averages are
    * exact integer-index groupings. Centroids are model parameters —
    * collecting k×dim doubles to the driver per iteration is the
    * standard (and scale-independent) pattern.
    */
  /** A trained IVF index: per-vector cell assignments + the centroid
    * model. At scale `assigned` is a persisted sidecar (parquet
    * partitioned by cell) and `centroids` is the k×dim model artifact —
    * queries read both instead of re-running Lloyd per probe. */
  final case class IvfIndex(assigned: DataFrame, centroids: Seq[Seq[Double]])

  private[pipeline] def nearestCell(vec: Column, cents: Seq[Seq[Double]]): Column = {
    // squared L2 via dot products; argmin with first-wins tie-break
    val dists = cents.map { c =>
      val cCol = array(c.map(lit): _*)
      dot(vec, vec) - lit(2.0) * dot(vec, cCol) + lit(c.map(x => x * x).sum)
    }
    val arr = array(dists: _*)
    (array_position(arr, array_min(arr)) - 1).cast("int")
  }

  /** Distributed Lloyd's over an (id, vec) frame — the shared k-means
    * core of the IVF coarse quantizer and the PQ sub-codebooks
    * (Quantize). Seeds = the k vectors with smallest xxhash64(id)
    * (content-independent, engine-reproducible); a FIXED `iters`
    * count; per-dimension means through the EXACT decimal path, so the
    * trained centroids are bit-identical regardless of partitioning or
    * accumulation order (a plain double avg() is neither). Each
    * iteration is one assignment projection (codegen'd distance
    * argmin, map-only) + one (cell, dim) reduce; collecting the k×dim
    * model to the driver per iteration is standard and
    * scale-independent. */
  private[pipeline] def lloyd(data: DataFrame, dim: Int, k: Int,
                              iters: Int): Seq[Seq[Double]] = {
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    var centroids: Seq[Seq[Double]] = data
      .orderBy(xxhash64(col("id")), col("id")).limit(k)
      .select("vec").collect().map(_.getSeq[Double](0).toSeq).toSeq
    for (_ <- 0 until iters) {
      val assigned = data.withColumn("cell", nearestCell(col("vec"), centroids))
      val means = assigned
        .select(col("cell"), posexplode(col("vec")).as(Seq("dim", "x")))
        .groupBy("cell", "dim")
        .agg(avg(col("x").cast(DecimalType(30, 15))).cast(DoubleType).as("m"))
        .groupBy("cell").agg(map_from_arrays(
          collect_list(col("dim")), collect_list(col("m"))).as("byDim"))
        .collect().map { r =>
          val m = r.getMap[Int, Double](1)
          r.getInt(0) -> (0 until dim).map(i => m.getOrElse(i, 0.0))
        }.toMap
      centroids = centroids.indices.map(i => means.getOrElse(i, centroids(i)))
    }
    centroids
  }

  /** Greedy K-CENTER coreset selection (Gonzalez 1985 2-approximation;
    * the facility-location flavor of diverse-subset sampling used for
    * curation — pick k maximally-spread exemplars from the embedding
    * corpus). Deterministic: seed = min id; each round adds the point
    * FARTHEST (squared L2, computed from codegen'd dots) from its
    * nearest already-chosen center, ties to the smallest id. k rounds
    * of one map-only distance projection + one max_by reduce; each
    * round collects ONE row (a parameter fetch) — the standard
    * model-sized driver loop (cf. lloyd). Returns (id, pick_order,
    * dist_to_prev) — dist_to_prev is the coverage radius the selection
    * achieved so far, the quantity a curation run monitors. */
  def kCenterSelect(emb: DataFrame, idCol: String, vecCol: String,
                    k: Int): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val data = emb.select(col(idCol).as("id"), col(vecCol).as("vec"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val seed = data.orderBy(col("id")).limit(1)
        .select(col("id"), col("vec")).head()
      var centers = Seq((seed.getLong(0), seed.getSeq[Double](1).toSeq, 0.0))
      var exhausted = false
      while (centers.size < k && !exhausted) {
        val cents = centers.map(_._2)
        // squared L2 to nearest chosen center, via dots (one pass)
        val dists = cents.map { c =>
          val cCol = array(c.map(lit): _*)
          dot(col("vec"), col("vec")) - lit(2.0) * dot(col("vec"), cCol) +
            lit(c.map(x => x * x).sum)
        }
        val nearest = if (dists.size == 1) dists.head else least(dists: _*)
        val far = data
          .withColumn("d", nearest)
          .agg(expr("max_by(named_struct('id', id, 'vec', vec, 'd', d), " +
            "named_struct('d', d, 'nid', -id))").as("f"))
          .select(col("f.id"), col("f.vec"), col("f.d")).head()
        // zero radius = every remaining point coincides with a chosen
        // center (pool smaller than k, or pure duplicates) — further
        // picks add no coverage and would repeat ids
        if (far.getDouble(2) <= 0.0) exhausted = true
        else centers = centers :+ ((far.getLong(0), far.getSeq[Double](1).toSeq,
          far.getDouble(2)))
      }
      centers.zipWithIndex
        .map { case ((id, _, d), i) => (id, i, d) }
        .toDF("id", "pick_order", "dist_to_prev")
    } finally { data.unpersist(); () }
  }

  /** MAXIMAL MARGINAL RELEVANCE re-rank (Carbonell & Goldstein 1998) —
    * the serving-side diversity step: from a relevance-ranked candidate
    * list, greedily pick argmax λ·rel − (1−λ)·max-cosine-to-picked, so
    * near-duplicate hits don't crowd the result page. The candidate
    * list is k-sized BY CONSTRUCTION (it comes out of topK /
    * annTopKIndexed / hybridRetrieve), so the O(k²) greedy loop runs on
    * the driver over collected candidates — bounded model-side work,
    * like the probe-vector fetch; the corpus-sized stage is the
    * candidate generation that precedes this. Deterministic: ties to
    * the smallest id. Returns (id, mmr_order, mmr_score). */
  def mmrRerank(candidates: DataFrame, idCol: String, vecCol: String,
                relCol: String, kFinal: Int,
                lambda: Double = 0.7): DataFrame = {
    val spark = candidates.sparkSession
    import spark.implicits._
    val cand = candidates
      .select(col(idCol).cast("long"), col(vecCol), col(relCol).cast("double"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getDouble(2)))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < math.min(a.length, b.length)) {
        d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      if (na == 0 || nb == 0) 0.0 else d / (math.sqrt(na) * math.sqrt(nb))
    }
    val picked = collection.mutable.ArrayBuffer.empty[(Long, Int, Double)]
    val pickedVecs = collection.mutable.ArrayBuffer.empty[Array[Double]]
    val remaining = collection.mutable.ArrayBuffer(cand: _*)
    while (picked.size < math.min(kFinal, cand.length)) {
      val scored = remaining.map { case (id, v, rel) =>
        val maxSim = if (pickedVecs.isEmpty) 0.0
          else pickedVecs.map(p => cos(v, p)).max
        (id, v, lambda * rel - (1.0 - lambda) * maxSim)
      }
      val best = scored.minBy { case (id, _, s) => (-s, id) }
      val idx = remaining.indexWhere(_._1 == best._1)
      picked += ((best._1, picked.size, best._3))
      pickedVecs += best._2
      remaining.remove(idx): Unit
    }
    picked.toSeq.toDF("id", "mmr_order", "mmr_score")
      .select(col("id"), col("mmr_order"), round(col("mmr_score"), 6).as("mmr_score"))
  }

  /** Train the coarse quantizer + assign every vector to its cell —
    * the one-off indexing pass. */
  def ivfIndex(emb: DataFrame, idCol: String, vecCol: String, dim: Int,
               nlist: Int = 8, iters: Int = 2): IvfIndex = {
    val data = emb.select(col(idCol).as("id"), col(vecCol).as("vec"))
    val centroids = lloyd(data, dim, nlist, iters)
    IvfIndex(data.withColumn("cell", nearestCell(col("vec"), centroids)), centroids)
  }

  /** Query a precomputed IVF index: rank cells by probe distance, scan
    * only the nearest `nprobe` of them with exact rescoring. */
  def ivfTopKIndexed(index: IvfIndex, probe: Seq[Double], k: Int,
                     nprobe: Int = 2, excludeId: Option[Long] = None): DataFrame = {
    val probeCol = array(probe.map(lit): _*)
    // cell ranking uses the SAME algebra and accumulation order as the
    // Catalyst formulation in nearestCell / ivfTopKBatch (p·p − 2·p·c
    // + Σc², sequential sums) — bit-identical distances, so the
    // nprobe cell choice can never diverge between the online and
    // batch paths on near-equidistant centroids (parity contract).
    val pp = probe.map(x => x * x).sum
    val probeCells = index.centroids.zipWithIndex.map { case (c, i) =>
      val pc = probe.zip(c).map { case (a, b) => a * b }.sum
      (i, pp - 2.0 * pc + c.map(x => x * x).sum)
    }.sortBy { case (i, d) => (d, i) }.take(nprobe).map(_._1)
    val cands = index.assigned.filter(col("cell").isin(probeCells: _*))
    val scored = cands.select(col("id"), round(cosine(col("vec"), probeCol), 6).as("cos"))
    val filtered = excludeId.fold(scored)(x => scored.filter(col("id") =!= x))
    filtered.orderBy(col("cos").desc, col("id")).limit(k)
  }

  /** BATCH multi-probe IVF top-k — the IVF analog of
    * [[annTopKBatch]]: every probe's `nprobe` nearest cells are ranked
    * DISTRIBUTED (array_sort over (distance, cell) structs — same
    * first-wins tie order as the driver-side ranking in
    * [[ivfTopKIndexed]], spec-pinned parity), exploded to (cell,
    * probe) rows and joined against the cell-assigned corpus once;
    * exact per-probe top-k via window. N probes cost ONE corpus join
    * instead of N pruned scans. */
  def ivfTopKBatch(index: IvfIndex, probes: DataFrame, idCol: String,
                   vecCol: String, k: Int, nprobe: Int = 2,
                   excludeSelf: Boolean = false): DataFrame = {
    val pvec = col("pvec")
    val dists = index.centroids.zipWithIndex.map { case (c, i) =>
      val cCol = array(c.map(lit): _*)
      struct((dot(pvec, pvec) - lit(2.0) * dot(pvec, cCol) +
        lit(c.map(x => x * x).sum)).as("d"), lit(i).as("cell"))
    }
    val probeCells = slice(array_sort(array(dists: _*)), 1, nprobe)
    val exploded = probes
      .select(col(idCol).as("probe_id"), col(vecCol).as("pvec"))
      .select(col("probe_id"), pvec,
        explode(transform(probeCells, s => s.getField("cell"))).as("cell"))
    batchTopK(exploded.join(index.assigned, Seq("cell")), k, excludeSelf)
  }

  /** One-shot IVF top-k (index trained inline — prefer ivfIndex +
    * ivfTopKIndexed when serving many probes). */
  def ivfTopK(emb: DataFrame, idCol: String, vecCol: String,
              probe: Seq[Double], k: Int, nlist: Int = 8, nprobe: Int = 2,
              iters: Int = 2, excludeId: Option[Long] = None): DataFrame =
    ivfTopKIndexed(ivfIndex(emb, idCol, vecCol, probe.length, nlist, iters),
      probe, k, nprobe, excludeId)

  /** Sign-LSH signature of `vec` over `planes` deterministic
    * pseudo-random hyperplanes (hash-derived components in [-1,1] —
    * reproducible on any cluster). Native one-pass expression
    * (functions.SignLshSig) — no per-plane intermediate arrays. */
  private def sigOf(vec: Column, planes: Int, mean: Seq[Double] = Nil): Column =
    graft.functions.VectorExpressions.signLsh(vec, planes, mean)

  /** [[sigOf]] evaluated on the driver for a CONSTANT probe vector —
    * the same Catalyst expression instance the corpus rows were signed
    * with (one code path, no reimplementation drift), centered with the
    * index's pinned `mean` first ([[centeredConst]]). Probe bucket
    * rings then reach the index scan as pushed-down In filters instead
    * of a broadcast join: over the bucket-clustered sidecar layout,
    * file/row-group stats prune candidates before a vector is read. */
  private def sigOfConst(probe: Seq[Double], planes: Int,
                         mean: Seq[Double]): Long = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    graft.functions.SignLshSig(
      Literal.create(probe.toArray, ArrayType(DoubleType)), planes, mean)
      .eval(null).asInstanceOf[Long]
  }

  /** A built ANN index: the (id, vec, bucket) assignment plus the
    * plane count AND centering mean it was built with — carried IN the
    * artifact (like IvfIndex's centroids) so the query side cannot
    * probe with a mismatched signature width or an uncentered
    * signature (on real text embeddings a raw-signed index megabuckets
    * — see [[corpusMean]] — and every probe degrades toward a corpus
    * scan). `mean = Nil` = a legacy raw-signed index. */
  final case class AnnIndex(assigned: DataFrame, planes: Int,
                            mean: Seq[Double] = Nil)

  /** The ANN index: (id, vec, bucket) with the MEAN-CENTERED sign-LSH
    * signature computed ONCE over the corpus. At scale this is a
    * persisted sidecar column (parquet partitioned by bucket, cf.
    * FactLogIO's layout) written at ingest; queries read it instead of
    * recomputing signatures per probe.
    *
    * `mean`: None (default) fits the centering model here — ONE
    * map-side-combinable aggregation job over `emb` at build time (an
    * indexing pass already scans the corpus once to sign it; cf.
    * [[corpusMean]]). Pass `Some(pinnedMean)` to sign against an
    * EXISTING index's model (the incremental-refresh path — new
    * segments must bucket identically to the published ones), or
    * `Some(Nil)` for raw signing (zero-mean corpora, legacy parity). */
  def annIndex(emb: DataFrame, idCol: String, vecCol: String,
               planes: Int = 8,
               mean: Option[Seq[Double]] = None): AnnIndex = {
    val m = mean.getOrElse(corpusMean(emb, vecCol))
    AnnIndex(emb.select(col(idCol).as("id"), col(vecCol).as("vec"),
      sigOf(col(vecCol), planes, m).as("bucket")), planes, m)
  }

  /** Persist an ANN index as the on-disk sidecar: the (id, vec, bucket)
    * assignment as parquet plus a one-row JSON meta carrying the plane
    * count (the artifact owns its parameters, same discipline as
    * FactLogIO's meta).
    *
    * Refresh-safe: every write lands in a FRESH uniquely-named
    * `v<version>-<nonce>` directory (re-publishing the same version —
    * a retried micro-batch, a periodic rebuild with the default
    * version — never rewrites a directory a reader may hold open) and
    * only then does an atomic pointer-file rename publish it. Readers
    * see the previous complete index or the new complete one, never a
    * half-written mix of new assignments with a stale plane count.
    * Pointer I/O goes through the path's own Hadoop filesystem, so
    * hdfs:// paths work and rename is atomic there; object stores
    * swap in their own commit protocol at this one seam. */
  def writeAnnIndex(index: AnnIndex, path: String, version: Long = 0L): Unit = {
    val spark = index.assigned.sparkSession
    val dirName = freshVersionDir(version)
    val dir = s"$path/$dirName"
    // bucket-clustered files: each output file covers a bucket range,
    // so a probe's pushed-down In(bucket, ring) prunes at file and
    // row-group stats — the sidecar analog of partition pruning without
    // 2^planes directories
    index.assigned.repartitionByRange(col("bucket"))
      .sortWithinPartitions("bucket")
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$dir/assigned")
    import spark.implicits._
    // mean rides the meta beside planes (Jackson doubles round-trip
    // exactly, so read-back probes center bit-identically to signing)
    Seq((index.planes, index.mean)).toDF("planes", "mean")
      .coalesce(1).write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .json(s"$dir/meta")
    publishVersion(spark, path, dirName)
  }

  /** Read the latest published index. Serves both layouts: a
    * single-dir version (writeAnnIndex) and a segmented version
    * (writeAnnSegment + publishAnnVersion), whose assigned set is the
    * union of its immutable segments.
    *
    * Staleness bound: the returned index is pinned to the version the
    * pointer named at resolution time. Under concurrent refresh with
    * retention (`retireAnnVersions(keep = N)`), that version — and
    * every segment it references — stays on disk for at least N-1
    * subsequent refresh cycles; readers older than that must
    * re-resolve.
    *
    * Published versions are immutable, so the parsed meta and assigned
    * scan are cached per (session, path, version): a serving probe
    * re-pays only the pointer read each query, never the meta-JSON
    * read job. A new publish is a new version dir → a cache miss. */
  def readAnnIndex(spark: org.apache.spark.sql.SparkSession, path: String): AnnIndex =
    readLatestVersion(spark, path) match {
      case Some(dirName) =>
        annReadCache.get(spark, path, dirName) {
          val dir = s"$path/$dirName"
          val meta = spark.read.json(s"$dir/meta")
          val row = meta.head()
          val planes = row.getAs[Long]("planes").toInt
          val mean = metaMean(meta.columns, row)
          val assigned =
            if (meta.columns.contains("segments"))
              spark.read.parquet(row.getAs[scala.collection.Seq[String]]("segments")
                .map(s => s"$path/segments/$s").toSeq: _*)
            else spark.read.parquet(s"$dir/assigned")
          AnnIndex(assigned, planes, mean)
        }
      case None => // pre-versioning flat layout
        val meta = spark.read.json(s"$path/meta")
        val row = meta.head()
        AnnIndex(spark.read.parquet(s"$path/assigned"),
          row.getAs[Long]("planes").toInt, metaMean(meta.columns, row))
    }

  /** Centering mean out of a meta row — absent column (a pre-centering
    * index) and empty array (an explicitly raw-signed index) both read
    * as Nil, the raw-signing identity. */
  private def metaMean(columns: Seq[String],
                       row: org.apache.spark.sql.Row): Seq[Double] =
    if (!columns.contains("mean")) Nil
    else Option(row.getAs[scala.collection.Seq[Any]]("mean"))
      .map(_.map(_.asInstanceOf[Number].doubleValue()).toSeq)
      .getOrElse(Nil)

  /** Per-(session, path) read cache holding ONLY the latest resolved
    * version: a new publish REPLACES the prior entry instead of
    * accumulating one per version, and entries belonging to stopped
    * sessions are pruned on access — so a long-running serving process
    * with periodic index refresh pins at most one cached index per
    * live (session, path), never an unbounded version history. */
  private[graft] final class LatestVersionCache[V] {
    private val m = scala.collection.concurrent.TrieMap
      .empty[(org.apache.spark.sql.SparkSession, String), (String, V)]
    def get(spark: org.apache.spark.sql.SparkSession, path: String,
            version: String)(compute: => V): V = {
      m.filterInPlace { case ((s, _), _) => !s.sparkContext.isStopped }
      m.get((spark, path)) match {
        case Some((v, value)) if v == version => value
        case _ =>
          val value = compute
          m.update((spark, path), (version, value))
          value
      }
    }
    private[graft] def size: Int = m.size
  }

  private val annReadCache = new LatestVersionCache[AnnIndex]

  /** Segmented ANN sidecar — the incremental-refresh layout. Each
    * refresh signs ONLY the new corpus rows into a fresh immutable
    * segment under `segments/`, and a published version is a tiny meta
    * file LISTING the segments it comprises plus the plane count and
    * the covered ingest watermark. The "merge" with the prior index is
    * metadata-level (prior segment list + one new name) — no
    * corpus-sized rewrite per refresh, so refresh cost is O(new rows)
    * while every version stays a complete immutable index
    * (log-structured index maintenance; the full rebuild resets the
    * chain as the compaction/repair path). */
  final case class AnnMeta(planes: Int, segments: Seq[String], covered: Long,
                           mean: Seq[Double] = Nil)

  /** Write one immutable signed segment; returns its name (to be
    * referenced from a published version's meta). */
  def writeAnnSegment(assigned: DataFrame, path: String): String = {
    val seg = s"seg-${java.util.UUID.randomUUID.toString.take(8)}"
    assigned.repartitionByRange(col("bucket")).sortWithinPartitions("bucket")
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$path/segments/$seg")
    seg
  }

  /** Publish a segmented version: write its meta under a fresh
    * versioned dir, then the same atomic pointer swap as writeAnnIndex. */
  def publishAnnVersion(spark: org.apache.spark.sql.SparkSession, path: String,
                        meta: AnnMeta, version: Long): Unit = {
    val dirName = freshVersionDir(version)
    import spark.implicits._
    Seq((meta.planes, meta.segments, meta.covered, meta.mean))
      .toDF("planes", "segments", "covered", "mean")
      .coalesce(1).write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .json(s"$path/$dirName/meta")
    publishVersion(spark, path, dirName)
  }

  /** Meta of the latest published version IF it is segmented — None for
    * an unpublished path or a single-dir-layout latest (callers then
    * take the full-rebuild path). */
  def readAnnMeta(spark: org.apache.spark.sql.SparkSession,
                  path: String): Option[AnnMeta] =
    readLatestVersion(spark, path).flatMap(readAnnMeta0(spark, path, _))

  /** Retention for a versioned index path: keep the newest `keep`
    * version dirs (an in-flight reader's resolved version therefore
    * survives at least keep-1 refresh cycles — the staleness bound
    * documented on readAnnIndex), then garbage-collect segments no
    * retained version references (which also reaps segments orphaned
    * by a crash between segment write and publish). */
  def retireAnnVersions(spark: org.apache.spark.sql.SparkSession, path: String,
                        keep: Int): Unit =
    retireVersions(spark, path, keep,
      dir => readAnnMeta0(spark, path, dir).map(_.segments).getOrElse(Nil))

  /** Shared retention walk for the ANN and IVF versioned layouts —
    * parameterized only by how a version dir names its segments. */
  private def retireVersions(spark: org.apache.spark.sql.SparkSession,
                             path: String, keep: Int,
                             segmentsOf: String => Seq[String]): Unit = {
    require(keep >= 1, s"retention must keep at least the published version, got $keep")
    val base = new org.apache.hadoop.fs.Path(path)
    val fs = base.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(base)) return
    val versions = fs.listStatus(base)
      .filter(st => st.isDirectory && st.getPath.getName.matches("v\\d+-.*"))
      .sortBy(st => (versionOf(st.getPath.getName), st.getModificationTime))
    val (dropped, retained) = versions.splitAt(math.max(versions.length - keep, 0))
    val referenced: Set[String] =
      retained.flatMap(st => segmentsOf(st.getPath.getName)).toSet
    dropped.foreach(st => fs.delete(st.getPath, true): Unit)
    val segBase = new org.apache.hadoop.fs.Path(s"$path/segments")
    if (fs.exists(segBase))
      fs.listStatus(segBase)
        .filter(st => !referenced.contains(st.getPath.getName))
        .foreach(st => fs.delete(st.getPath, true): Unit)
  }

  /** readAnnMeta for a NAMED version dir (retention walks all retained
    * versions, not just the pointer's). */
  private def readAnnMeta0(spark: org.apache.spark.sql.SparkSession, path: String,
                           dirName: String): Option[AnnMeta] = {
    val metaPath = s"$path/$dirName/meta"
    val fs = new org.apache.hadoop.fs.Path(metaPath)
      .getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(new org.apache.hadoop.fs.Path(metaPath))) None
    else {
      val meta = spark.read.json(metaPath)
      if (!meta.columns.contains("segments")) None
      else {
        val row = meta.head()
        Some(AnnMeta(row.getAs[Long]("planes").toInt,
          row.getAs[scala.collection.Seq[String]]("segments").toSeq,
          row.getAs[Long]("covered"), metaMean(meta.columns, row)))
      }
    }
  }

  /** Atomic publish/lookup of a versioned index directory (shared by
    * the ANN and IVF sidecars). The pointer names the directory; the
    * version prefix orders directories for retention. */
  private def freshVersionDir(version: Long): String =
    s"v$version-${java.util.UUID.randomUUID.toString.take(8)}"
  private[graft] def publishVersion(spark: org.apache.spark.sql.SparkSession,
                                    path: String, dirName: String): Unit = {
    val conf = spark.sessionState.newHadoopConf()
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(conf)
    val ptr = fs.makeQualified(new org.apache.hadoop.fs.Path(path, "LATEST"))
    val tmp = fs.makeQualified(
      new org.apache.hadoop.fs.Path(path, s"LATEST.tmp-$dirName"))
    val out = fs.create(tmp, true)
    try out.write(dirName.getBytes("UTF-8")) finally out.close()
    // Atomic swap where the filesystem supports it: FileContext.rename
    // with OVERWRITE replaces the pointer in one namespace operation on
    // HDFS-like filesystems (and the local FS), so a concurrent reader
    // sees the old pointer or the new one — never a missing file. On
    // filesystems without a FileContext binding, fall back to
    // delete+rename; readLatestVersion covers the tiny no-pointer
    // window there by retrying and falling back to the newest
    // versioned directory.
    try {
      val fc = org.apache.hadoop.fs.FileContext.getFileContext(ptr.toUri, conf)
      fc.rename(tmp, ptr, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    } catch {
      case _: org.apache.hadoop.fs.UnsupportedFileSystemException =>
        fs.delete(ptr, false)
        require(fs.rename(tmp, ptr), s"failed to publish index pointer $ptr")
    }
  }
  private def versionOf(dirName: String): Long =
    dirName.drop(1).takeWhile(_.isDigit).toLong
  private[graft] def readLatestVersion(spark: org.apache.spark.sql.SparkSession,
                                       path: String): Option[String] = {
    val base = new org.apache.hadoop.fs.Path(path)
    val fs = base.getFileSystem(spark.sessionState.newHadoopConf())
    val ptr = new org.apache.hadoop.fs.Path(path, "LATEST")
    def readPtr(): Option[String] =
      if (!fs.exists(ptr)) None
      else {
        val in = fs.open(ptr)
        try Some(new String(
          org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8").trim)
        finally in.close()
      }
    readPtr().orElse {
      // Pointer absent. Two legitimate states: a pre-versioning flat
      // layout (no v* dirs — report None so callers take their legacy
      // branch) or a publisher mid-swap on a filesystem whose pointer
      // replace is delete+rename. In the latter case versioned dirs
      // exist: retry briefly, then serve the newest versioned
      // directory — a complete, immutable index (at worst one refresh
      // stale), never an unrelated-error failure.
      val versionDirs =
        if (!fs.exists(base)) Array.empty[org.apache.hadoop.fs.FileStatus]
        else fs.listStatus(base).filter(st =>
          st.isDirectory && st.getPath.getName.matches("v\\d+-.*"))
      if (versionDirs.isEmpty) None
      else {
        var retried = readPtr()
        var attempts = 0
        while (retried.isEmpty && attempts < 5) {
          Thread.sleep(20L << attempts) // 20..320 ms backoff
          attempts += 1
          retried = readPtr()
        }
        retried.orElse(Some(versionDirs
          .maxBy(st => (versionOf(st.getPath.getName), st.getModificationTime))
          .getPath.getName))
      }
    }
  }

  /** Persist an IVF index: cell assignments as parquet + the centroid
    * model as parquet rows (cell, vec) — full double precision, the
    * artifact owns its parameters. Same versioned-directory + atomic
    * pointer publish as writeAnnIndex. */
  def writeIvfIndex(index: IvfIndex, path: String, version: Long = 0L): Unit = {
    val spark = index.assigned.sparkSession
    val dirName = freshVersionDir(version)
    val dir = s"$path/$dirName"
    index.assigned.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$dir/assigned")
    import spark.implicits._
    index.centroids.zipWithIndex.map { case (c, i) => (i, c) }
      .toDF("cell", "vec")
      .coalesce(1).write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$dir/centroids")
    publishVersion(spark, path, dirName)
  }

  def readIvfIndex(spark: org.apache.spark.sql.SparkSession, path: String): IvfIndex = {
    val dirName = readLatestVersion(spark, path).getOrElse(
      throw new IllegalStateException(s"no published IVF index at $path (missing LATEST)"))
    // published versions are immutable: cache the collected centroids +
    // assigned scan per version (same discipline as readAnnIndex) — a
    // serving probe re-pays only the pointer read, not the centroid job
    ivfReadCache.get(spark, path, dirName) {
      val dir = s"$path/$dirName"
      val centroids = spark.read.parquet(s"$dir/centroids")
        .orderBy("cell").collect().map(_.getSeq[Double](1).toSeq).toSeq
      val assigned = ivfMeta0(spark, path, dirName) match {
        case Some(meta) => // segmented layout: union of immutable segments
          spark.read.parquet(meta.segments.map(s => s"$path/segments/$s"): _*)
        case None => spark.read.parquet(s"$dir/assigned")
      }
      IvfIndex(assigned, centroids)
    }
  }

  private val ivfReadCache = new LatestVersionCache[IvfIndex]

  /** Assign embeddings to the nearest cell of a FIXED centroid model —
    * the incremental-add path of a served IVF index (FAISS discipline:
    * train once, add per batch, retrain as the compaction step). Pure
    * map-side projection: O(new rows · nlist), no shuffle. */
  def ivfAssign(emb: DataFrame, idCol: String, vecCol: String,
                centroids: Seq[Seq[Double]]): DataFrame =
    emb.select(col(idCol).as("id"), col(vecCol).as("vec"))
      .withColumn("cell", nearestCell(col("vec"), centroids))

  /** Segmented IVF sidecar meta — the IVF analog of [[AnnMeta]]: a
    * published version carries the centroid model (parquet, pinned
    * across incremental refreshes) plus the immutable assignment
    * segments it comprises and the covered ingest watermark. */
  final case class IvfMeta(segments: Seq[String], covered: Long)

  /** Write one immutable cell-clustered assignment segment. */
  def writeIvfSegment(assigned: DataFrame, path: String): String = {
    val seg = s"seg-${java.util.UUID.randomUUID.toString.take(8)}"
    assigned.repartitionByRange(col("cell")).sortWithinPartitions("cell")
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$path/segments/$seg")
    seg
  }

  /** Publish a segmented IVF version: centroid model + meta under a
    * fresh versioned dir, then the same atomic pointer swap as
    * writeIvfIndex. */
  def publishIvfVersion(spark: org.apache.spark.sql.SparkSession, path: String,
                        centroids: Seq[Seq[Double]], meta: IvfMeta,
                        version: Long): Unit = {
    val dirName = freshVersionDir(version)
    import spark.implicits._
    centroids.zipWithIndex.map { case (c, i) => (i, c) }
      .toDF("cell", "vec")
      .coalesce(1).write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$path/$dirName/centroids")
    Seq((meta.segments, meta.covered)).toDF("segments", "covered")
      .coalesce(1).write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .json(s"$path/$dirName/meta")
    publishVersion(spark, path, dirName)
  }

  /** Meta of the latest published IVF version IF it is segmented — None
    * for an unpublished path or a writeIvfIndex single-dir latest
    * (callers then take the full-rebuild path). */
  def readIvfMeta(spark: org.apache.spark.sql.SparkSession,
                  path: String): Option[IvfMeta] =
    readLatestVersion(spark, path).flatMap(ivfMeta0(spark, path, _))

  private def ivfMeta0(spark: org.apache.spark.sql.SparkSession, path: String,
                       dirName: String): Option[IvfMeta] = {
    val metaPath = s"$path/$dirName/meta"
    val fs = new org.apache.hadoop.fs.Path(metaPath)
      .getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(new org.apache.hadoop.fs.Path(metaPath))) None
    else {
      val meta = spark.read.json(metaPath)
      if (!meta.columns.contains("segments")) None
      else {
        val row = meta.head()
        Some(IvfMeta(row.getAs[scala.collection.Seq[String]]("segments").toSeq,
          row.getAs[Long]("covered")))
      }
    }
  }

  /** Retention for a segmented IVF path — identical policy to
    * [[retireAnnVersions]] (the segment-reference walk only reads the
    * meta's `segments` field, which both layouts share). */
  def retireIvfVersions(spark: org.apache.spark.sql.SparkSession, path: String,
                        keep: Int): Unit =
    retireVersions(spark, path, keep,
      dir => ivfMeta0(spark, path, dir).map(_.segments).getOrElse(Nil))

  /** Approximate top-k over a precomputed `annIndex`: multi-probe (the
    * probe's own bucket plus all 1-bit-flip neighbors — DRIVER-computed
    * constants via [[sigOfConst]]), exact rescoring of the surviving
    * candidates only. The corpus-side plan is a pure scan with the
    * bucket ring pushed down as an In filter (PushedFilters): no
    * signature computation per query, no join — bucket-clustered
    * sidecar files prune at their stats. */
  def annTopKIndexed(index: AnnIndex, probe: Seq[Double], k: Int,
                     excludeId: Option[Long] = None): DataFrame = {
    val planes = index.planes
    val probeCol = array(probe.map(lit): _*)
    val sig = sigOfConst(probe, planes, index.mean)
    val buckets = (sig +: (0 until planes).map(b => sig ^ (1L << b))).distinct
    val cands = index.assigned.filter(col("bucket").isin(buckets: _*))
    val scored = cands.select(col("id"), round(cosine(col("vec"), probeCol), 6).as("cos"))
    val filtered = excludeId.fold(scored)(x => scored.filter(col("id") =!= x))
    filtered.orderBy(col("cos").desc, col("id")).limit(k)
  }

  /** Multi-probe width chosen from a candidate budget: with `planes`
    * sign bits the corpus spreads over 2^planes buckets, so probing m
    * buckets yields ≈ m·n/2^planes candidates. The probe ring widens
    * (exact bucket → 1-bit flips → 2-bit flips …) until the EXPECTED
    * candidate count reaches `minCandidates` — the recall/latency knob
    * a fixed 1-bit ring gets wrong when planes is sized for a much
    * larger corpus (sparse buckets → starved top-k). All probe buckets
    * stay plan-time constants; the corpus-side plan is unchanged. */
  def annTopKAdaptive(index: AnnIndex, corpusSize: Long, probe: Seq[Double],
                      k: Int, minCandidates: Int = 1000,
                      excludeId: Option[Long] = None): DataFrame = {
    val planes = index.planes
    val perBucket = math.max(corpusSize.toDouble / math.pow(2.0, planes), 1e-9)
    // Hard cap on enumerated probe buckets, INDEPENDENT of the
    // expected-candidate heuristic: when corpusSize < minCandidates the
    // widening loop would otherwise run to flips == planes and the mask
    // enumeration would materialize up to 2^planes combinations on the
    // driver (hang/OOM for planes ≳ 25). 10k broadcast keys is plenty
    // of recall and always driver-safe.
    val maxProbeBuckets = 10000L
    def choose(n: Int, r: Int): Long = {
      var acc = 1L; var i = 0
      while (i < r) {
        acc = acc * (n - i) / (i + 1)
        if (acc > maxProbeBuckets) return acc // saturated: only compared vs the cap
        i += 1
      }
      acc
    }
    var buckets = 1L
    var flips = 0
    while (buckets * perBucket < minCandidates && flips < planes &&
           buckets + choose(planes, flips + 1) <= maxProbeBuckets) {
      flips += 1
      buckets += choose(planes, flips)
    }
    val maxFlips = flips
    val probeCol = array(probe.map(lit): _*)
    val sig = sigOfConst(probe, planes, index.mean)
    // enumerate masks BY COMBINATION of flipped bit positions — never
    // the 2^planes range (which overflows Int past 30 planes and
    // materializes hundreds of millions of candidates on the driver
    // in the mid-20s)
    val masks = (0 to maxFlips).flatMap(r =>
      (0 until planes).combinations(r).map(_.foldLeft(0L)((m, b) => m | (1L << b))))
    val ringBuckets = masks.map(sig ^ _).distinct
    val cands = index.assigned.filter(col("bucket").isin(ringBuckets: _*))
    val scored = cands.select(col("id"), round(cosine(col("vec"), probeCol), 6).as("cos"))
    val filtered = excludeId.fold(scored)(x => scored.filter(col("id") =!= x))
    filtered.orderBy(col("cos").desc, col("id")).limit(k)
  }

  /** One-shot ANN top-k (index built inline — prefer annIndex +
    * annTopKIndexed when serving many probes). */
  def annTopK(emb: DataFrame, idCol: String, vecCol: String,
              probe: Seq[Double], k: Int, planes: Int = 8,
              excludeId: Option[Long] = None): DataFrame =
    annTopKIndexed(annIndex(emb, idCol, vecCol, planes), probe, k, excludeId)

  /** BATCH multi-probe ANN top-k: score a whole DataFrame of probes
    * (id, vec) against the index in ONE pass — the offline
    * batch-scoring shape. Each probe's own-bucket + 1-bit-flip ring is
    * computed DISTRIBUTED with the same native signature expression
    * the corpus was signed with, exploded to (bucket, probe) rows and
    * joined against the index on bucket, so N probes cost one index
    * join instead of N index scans; exact per-probe top-k via window.
    * Candidate sets (and therefore results) are IDENTICAL to the
    * online per-probe path [[annTopKIndexed]] (spec-pinned) — use that
    * for point serving, this for throughput. */
  def annTopKBatch(index: AnnIndex, probes: DataFrame, idCol: String,
                   vecCol: String, k: Int,
                   excludeSelf: Boolean = false): DataFrame = {
    val planes = index.planes
    val signed = probes.select(col(idCol).as("probe_id"), col(vecCol).as("pvec"))
      .withColumn("sig", sigOf(col("pvec"), planes, index.mean))
    val ring = array((col("sig") +: (0 until planes).map(b =>
      col("sig").bitwiseXOR(lit(1L << b)))): _*)
    val exploded = signed
      .select(col("probe_id"), col("pvec"),
        explode(array_distinct(ring)).as("bucket"))
    batchTopK(exploded.join(index.assigned, Seq("bucket")), k, excludeSelf)
  }

  /** Shared scoring tail of the batch serving paths: exact cosine,
    * optional self-exclusion, per-probe top-k window (cos desc, id). */
  private def batchTopK(joined: DataFrame, k: Int,
                        excludeSelf: Boolean): DataFrame = {
    val scored = joined.select(col("probe_id"), col("id"),
      round(cosine(col("vec"), col("pvec")), 6).as("cos"))
    val filtered =
      if (excludeSelf) scored.filter(col("id") =!= col("probe_id")) else scored
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("probe_id"))
      .orderBy(col("cos").desc, col("id"))
    filtered.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k).drop("__rn")
  }

  /** Margin-based BITEXT MINING (Artetxe & Schwenk 2019, the
    * CCMatrix/LASER mining criterion) — the training-data op that digs
    * translation pairs out of a multilingual corpus for MT / contrastive
    * fine-tuning. For each source-language doc x, its best
    * cross-lingual neighbor y is scored by the RATIO margin
    *
    *   margin(x, y) = cos(x, y) / ((avgK(x) + avgK(y)) / 2)
    *
    * where avgK(·) is the mean cosine to the k nearest cross-lingual
    * neighbors — a pair is mined when its similarity stands OUT of
    * both local neighborhoods (margin ≥ `marginThresh`), which kills
    * the hubness false positives a raw cosine cutoff admits. Emits one
    * datasheet row per source doc (best target, cos, margin, mined
    * flag) — the audit surface; filter on `mined` for the pair list.
    *
    * Shape: the scored relation is ONE pass (|X|·|Y| with `planes` =
    * 0); forward top-k / backward top-k are rank windows over it (the
    * forward ranking reuses the same shuffle as avgK(x)); everything
    * after is k-sized per doc. All arithmetic is the shared md5 /
    * IEEE-double surface, both rankings break ties on the ROUNDED
    * cosine then id — so the exact path is DuckDB-replicated
    * value-for-value.
    *
    * Scale path: `planes` > 0 signs both sides with mean-centered
    * SignLsh and restricts candidates to Hamming ≤ 2 multi-probe ring
    * buckets, scored with the same imperative kernel as the exact path
    * ([[bitextScoreBuckets]]) — Σ|bucket|-bounded, never |X|·|Y|;
    * neighborhood averages then run over the candidate set (the
    * standard ANN-margin approximation; CCMatrix does exactly this
    * over quantized indexes). The approximation's error is ONE-SIDED:
    * restricted neighborhoods deflate avgK, so margins only INFLATE —
    * the scale path never drops an exact-mined pair whose target
    * co-buckets (measured 0 missed at sf0.001/0.01, 1 of 100 at
    * sf0.1) and mines a few extra borderline pairs (≤10%, tunable via
    * `marginThresh`; GroundTruthSpec + BitextScaleProbe parity mode
    * pin both directions). Zero-norm embeddings (empty docs) are
    * excluded up front — they have no direction, and both engines
    * would otherwise emit NaN cosines.
    *
    * CONSTRUCTION IS EAGER (r15/r16): calling this function RUNS the
    * mining jobs (the materialize-once passes are forced so each runs
    * exactly once, then released); the returned DataFrame is the
    * computed datasheet (a per-invocation local checkpoint), not a
    * lazy plan. */
  def bitextMine(emb: DataFrame, idCol: String, vecCol: String,
                 langCol: String, srcLang: String, k: Int = 4,
                 marginThresh: Double = 1.05, planes: Int = 0,
                 ringBits: Int = 2): DataFrame = {
    val (sheet, release) = bitextMinePlan(emb, idCol, vecCol, langCol,
      srcLang, k, marginThresh, planes, ringBits)
    // Materialize the datasheet (one narrow row per source doc — far
    // smaller than either cache inside the plan) so BOTH corpus-sized
    // persists can be released IN-LIBRARY (r16): a non-bench caller —
    // a long-lived session, a loop — no longer accumulates two cached
    // corpus relations per invocation (the r15 design relied on the
    // bench harness's sweep for release). The checkpoint itself is a
    // per-invocation temporary like the caches were; the harness sweep
    // still reclaims it between samples.
    val out = sheet.localCheckpoint(true)
    release()
    out
  }

  /** The LAZY mining plan + a cache-release thunk: the physical plan of
    * the datasheet [[bitextMine]] executes (its checkpoint action runs
    * exactly this), exposed for plan audits. Callers who act on the
    * returned relation must call the thunk afterwards — [[bitextMine]]
    * is the managed wrapper. */
  private[graft] def bitextMinePlan(
      emb: DataFrame, idCol: String, vecCol: String,
      langCol: String, srcLang: String, k: Int = 4,
      marginThresh: Double = 1.05, planes: Int = 0,
      ringBits: Int = 2): (DataFrame, () => Unit) = {
    import org.apache.spark.sql.expressions.Window
    val dotFn = graft.functions.VectorExpressions.dot _
    // NOTE (API contract): construction is EAGER — building this
    // DataFrame runs the mining jobs (materialize-once passes below);
    // the returned relation is the already-computed datasheet.
    // base is MATERIALIZED once (persist, released in-library before
    // return — see the checkpoint at the end of this function):
    // it has 3-4 consumers per action — the X-side collect, the Y side
    // under the scoring kernel, the tgt_lang rejoin, and (planes > 0)
    // the corpusMean aggregation — and the embedding subtree feeding
    // it (hashEmbedding: tokenize + two shuffles) re-evaluated per
    // consumer, ~3× the whole miner's arithmetic (measured r15:
    // train_bitext 5.6 s → 3.1 s from this alone). Narrow rows
    // (id, vec, nrm, lang), spills to disk — corpus-sized but bounded.
    val base = emb.select(col(idCol).as("id"), col(vecCol).as("vec"),
        col(langCol).as("lang"))
      .withColumn("nrm", sqrt(dotFn(col("vec"), col("vec"))))
      .filter(col("nrm") > 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nBase = base.count() // force NOW: every consumer below reads the cache
    val w = kernelWidth(emb.sparkSession, nBase)
    val x = base.filter(col("lang") === srcLang)
    val y = base.filter(col("lang") =!= srcLang)
    // The candidate relation both directions rank over:
    //  - exact path: [[bitextScoreBlocked]] — X broadcast once, one
    //    imperative blocked-scoring pass over Y that emits ONLY
    //    per-partition top-k rows per direction (≈ k·(|Y| + P·|X|)
    //    rows), never materializing the |X|·|Y| pair relation. The
    //    declarative cross join + window formulation materializes
    //    every vec-carrying pair row inside the nested-loop join —
    //    measured 0.8 µs/pair ≈ 9.3 s at sf0.1 vs ~2 s for this pass
    //    (the row copies dominate, not the FMAs). Same broadcast
    //    bound as the BNLJ it replaces: the source-language shard
    //    must fit in a broadcast block; past that, use `planes`.
    //  - bucketed path (`planes` > 0): [[bitextScoreBuckets]] — y
    //    indexed by its (mean-centered) sign bucket, x probes its own
    //    bucket plus all 1-bit flips (multi-probe ring), co-partitioned
    //    by bucket and scored with the SAME imperative FMA kernel as
    //    the exact path. Each y lives in ONE bucket and ring entries
    //    are distinct, so each pair is scored once; forward+backward
    //    emission can duplicate a pair, hence the dedup.
    // tgt_lang deliberately does NOT ride the pair relation (it is
    // only needed on the |X| rank-1 rows — re-joined from the
    // |Y|-sized side at the end).
    // scored is MATERIALIZED once (r15): its two window consumers
    // (forward rank+avg, backward avg) would otherwise each re-run the
    // whole kernel subtree — the dedup exchange they share is NOT
    // reused at runtime (plan audit: 2 MapPartitions stages executed,
    // 0 ReusedExchange), so without the cache the scoring pass ran
    // TWICE per action. k-bounded narrow rows; released in-library
    // before return (see the datasheet checkpoint below).
    val scored = {
      val sc =
        if (planes <= 0)
          // the blocked pass emits per-direction top-k PAIR supersets;
          // dedup (a pair can arrive from both directions) then rank.
          // Any pair it omits is beaten by k emitted pairs on (cos, id)
          // in its direction, so rank ≤ k below is top-k-EXACT.
          bitextScoreBlocked(x, y, k, w).dropDuplicates("src_id", "tgt_id")
        else
          bitextScoreBuckets(x, y, planes, k, ringBits, w)
            .dropDuplicates("src_id", "tgt_id")
      val p = sc.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      p.count(): Unit
      p
    }
    // the rank windows are top-k-exact over BOTH relations: the
    // blocked pass emits per-partition top-k supersets per key, the
    // bucketed path the full candidate set — either way rank ≤ k
    // after the window is the true candidate top-k
    val wf = Window.partitionBy(col("src_id")).orderBy(col("cos").desc, col("tgt_id"))
    val wb = Window.partitionBy(col("tgt_id")).orderBy(col("cos").desc, col("src_id"))
    // best neighbor + neighborhood average fold into ONE k-row-per-src
    // aggregation (min_by on the unique rank instead of a second
    // window consumer)
    val fstats = scored.withColumn("rf", row_number().over(wf))
      .filter(col("rf") <= k)
      .groupBy(col("src_id")).agg(
        avg(col("cos")).as("avg_x"),
        min_by(struct(col("tgt_id"), col("cos")), col("rf")).as("best"))
      .select(col("src_id"), col("best.tgt_id").as("tgt_id"),
        col("best.cos").as("cos"), col("avg_x"))
    val avgY = scored.withColumn("rb", row_number().over(wb))
      .filter(col("rb") <= k)
      .groupBy(col("tgt_id")).agg(avg(col("cos")).as("avg_y"))
    val sheet = fstats.join(avgY, "tgt_id")
      // plain equi-join (AQE broadcasts it at small SF; at scale both
      // sides are corpus-sized relations keyed the same way)
      .join(y.select(col("id").as("tgt_id"), col("lang").as("tgt_lang")),
        "tgt_id")
      .select(col("src_id"), col("tgt_id"), col("tgt_lang"), col("cos"),
        round(col("cos") / ((col("avg_x") + col("avg_y")) / 2), 6).as("margin"))
      .withColumn("mined", col("margin") >= marginThresh)
    (sheet, () => { scored.unpersist(); base.unpersist(); () })
  }

  /** The exact-path scoring kernel of [[bitextMine]]: X (the
    * source-language shard) collected and broadcast ONCE as primitive
    * arrays, then one imperative pass over Y's partitions — for each y
    * row every x cosine is computed in a tight FMA loop and fed into
    * (a) y's own top-k (exact: each y sees ALL of X) and (b) a
    * per-partition top-k accumulator per x. Only those top-k rows are
    * emitted — ≈ k·(|Y| + P·|X|) narrow rows instead of the |X|·|Y|
    * pair relation a cross join materializes (per-pair row copies of
    * two vec arrays dominated that shape: 0.8 µs/pair measured).
    *
    * This is the documented mapPartitions case (SURVEY §3 preference
    * order): a genuine per-partition imperative inner loop — the
    * blocked brute-force kNN every vector engine runs. The driver
    * collect is the SAME bound the BroadcastNestedLoopJoin it replaces
    * had (build side must fit in a broadcast block); past that bound,
    * bitextMine's `planes` path applies. Working state per partition:
    * k·|X| accumulator slots + k rows per processed y.
    *
    * Determinism/oracle parity: cosine accumulates in index order and
    * rounds exactly like Spark's `round(_, 6)` (toString-canonical
    * BigDecimal, HALF_UP); both top-k selections order by (cos desc,
    * id asc) — the same total order the rank windows downstream use.
    */
  /** `round(_, 6)`-exact scalar rounding (toString-canonical BigDecimal,
    * HALF_UP) — shared by both imperative bitext kernels so their
    * cosines match the declarative surface bit-for-bit. */
  private[graft] def round6(d: Double): Double = {
    // Fast path (r15): scaled round-half-away-from-zero. Equal to the
    // BigDecimal result except possibly within ~2e-10 of a .5 decimal
    // boundary: the shortest-decimal repr s of d has |s−d| ≤ ulp(d)/2
    // and the ×1e6 scaling adds ≤ ulp(|d|·1e6)/2: for |d| < 16 (cosines
    // live in [-1, 1]) that totals ≤ ~2.7e-9, well inside the 1e-8
    // guard band — outside the band both representations sit on the
    // same side of every integer+0.5 boundary. Inside the band, or for
    // |d| ≥ 16, fall back to the exact BigDecimal path. This is the
    // per-pair hot loop of both bitext kernels: the BigDecimal path
    // costs a Double.toString alloc + BigDecimal per PAIR; the fast
    // path is a handful of flops. RoundSixSpec pins fast == BigDecimal
    // over 10M random + boundary-adversarial samples.
    val a = math.abs(d) * 1e6
    if (a < 1.6e7) {
      val f = math.floor(a)
      val frac = a - f
      if (frac < 0.49999999 || frac > 0.50000001) {
        val r = (if (frac < 0.5) f else f + 1.0) / 1e6
        return if (d < 0) -r else r
      }
    }
    new java.math.BigDecimal(java.lang.Double.toString(d))
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
  }

  /** Best-first parallel-array top-k insert; (cos desc, id asc) total
    * order — the same order the downstream rank windows use. */
  private def topkInsert(kk: Int, cosA: Array[Double], idA: Array[Long],
                         c: Double, id: Long): Unit = {
    var p = kk
    while (p > 0 && (c > cosA(p - 1) ||
      (c == cosA(p - 1) && id < idA(p - 1)))) p -= 1
    if (p < kk) {
      var q = kk - 1
      while (q > p) { cosA(q) = cosA(q - 1); idA(q) = idA(q - 1); q -= 1 }
      cosA(p) = c; idA(p) = id
    }
  }

  /** Volume-sized kernel width: one task per ~512 Y rows, capped at
    * the session shuffle width, floored at 1. At corpus scale the cap
    * always wins (identical to r15's one-task-per-shuffle-partition);
    * on small inputs this stops over-splitting — measured at sf0.1:
    * 32 tasks of ~80 rows each paid more in per-task fixed cost
    * (broadcast-X deserialization, k·P·|X| emitted superset rows) than
    * the FMAs, and 8 volume-sized tasks ran the exact miner 3.96 →
    * 2.41 s med (paired, n=3). */
  private[graft] def kernelWidth(spark: org.apache.spark.sql.SparkSession,
                                 nRows: Long): Int =
    math.min(spark.sessionState.conf.numShufflePartitions.toLong,
      math.max(1L, (nRows + 511) / 512)).toInt

  private[graft] def bitextScoreBlocked(x: DataFrame, y: DataFrame, k: Int,
                                        width: Int = 0): DataFrame = {
    val spark = x.sparkSession
    import spark.implicits._
    val xRows = x.select(col("id"), col("vec"), col("nrm"))
      .orderBy(col("id")).collect()
    val xIds = xRows.map(_.getLong(0))
    val xVecs = xRows.map(r => r.getSeq[Double](1).toArray)
    val xNrms = xRows.map(_.getDouble(2))
    val bc = spark.sparkContext.broadcast((xIds, xVecs, xNrms))
    val kk = k
    // Spread Y across explicit tasks BEFORE the kernel (r15): the
    // stage's cost is |Y_partition|·|X| FMAs, not its input bytes, so
    // AQE's byte-based partition coalescing (which sees a few MB of
    // narrow rows and packs them into ONE task) serializes the whole
    // quadratic pass onto one core — measured 2.4 s → 0.25 s at
    // sf0.1/local[32]. Hash on the deterministic id (guide §2.5: no
    // rand-derived keys); explicit numPartitions opts this exchange
    // out of AQE coalescing. Width is VOLUME-sized (r16, [[kernelWidth]])
    // with the session shuffle setting as the cap, so the driver's
    // core-count sweep still governs it at scale.
    val w = if (width > 0) width
      else spark.sessionState.conf.numShufflePartitions
    y.select(col("id"), col("vec"), col("nrm"))
      .repartition(w, col("id"))
      .as[(Long, Array[Double], Double)]
      .mapPartitions { it =>
        val (ids, vecs, nrms) = bc.value
        val nx = ids.length
        def insert(cosA: Array[Double], idA: Array[Long],
                   c: Double, id: Long): Unit = topkInsert(kk, cosA, idA, c, id)
        val fCos = Array.fill(nx)(Array.fill(kk)(Double.NegativeInfinity))
        val fTid = Array.fill(nx)(Array.fill(kk)(Long.MaxValue))
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
        it.foreach { case (tid, yv, ynrm) =>
          val bCos = Array.fill(kk)(Double.NegativeInfinity)
          val bSid = Array.fill(kk)(Long.MaxValue)
          var j = 0
          while (j < nx) {
            val xv = vecs(j)
            val n = math.min(xv.length, yv.length)
            var acc = 0.0
            var i = 0
            while (i < n) { acc += xv(i) * yv(i); i += 1 }
            val c = round6(acc / (nrms(j) * ynrm))
            insert(bCos, bSid, c, ids(j))
            insert(fCos(j), fTid(j), c, tid)
            j += 1
          }
          var b = 0
          while (b < kk && bCos(b) != Double.NegativeInfinity) {
            out += ((bSid(b), tid, bCos(b))); b += 1
          }
        }
        var j = 0
        while (j < nx) {
          var b = 0
          while (b < kk && fCos(j)(b) != Double.NegativeInfinity) {
            out += ((ids(j), fTid(j)(b), fCos(j)(b))); b += 1
          }
          j += 1
        }
        out.iterator
      }
      .toDF("src_id", "tgt_id", "cos")
  }

  /** The SCALE-path scoring kernel of [[bitextMine]] (`planes` > 0):
    * ring-bucket candidate generation + the exact path's imperative FMA
    * scoring, fused. Two design points, both measured at sf0.1:
    *
    *  - **Bucketing is mean-CENTERED.** Hashing-trick embeddings share
    *    a dominant common direction (stopword mass), so raw sign-LSH
    *    concentrates the corpus: 65% of sf0.1 docs landed in ONE
    *    bucket (Σ|bucket|² ≈ |Y|²/2 — no pruning left). Subtracting
    *    the corpus mean before hashing spreads signs; SCORING always
    *    uses the raw vectors, so emitted cosines are unchanged.
    *    Near-identical raw vectors stay near-identical after the
    *    translation, so they still co-bucket (the recall contract);
    *    only points near the centroid get unstable centered directions
    *    — exactly the points with no distinctive content to mine.
    *  - **Scoring is imperative, not a join.** The declarative
    *    bucket-join + projection pays ~1 µs/pair in row machinery (the
    *    exact path measured 0.8 µs/pair for its cross join — the row
    *    copies dominate, not the FMAs); co-partitioning both sides by
    *    bucket and running the blocked top-k loop per bucket pays
    *    ~12 ns/pair. Σ|x_ring(b)|·|y(b)| pairs, never |X|·|Y|.
    *
    * Emission mirrors [[bitextScoreBlocked]]: per y, top-k over the x
    * probes of its bucket (all co-partitioned with it → backward top-k
    * is globally EXACT); per x, top-k accumulated across its ring
    * buckets within the partition (a superset across partitions — the
    * downstream rank window finishes it). Per-partition working state:
    * the partition's bucket contents (Σ|bucket| over its buckets — the
    * quantity `planes` sizing bounds) + k slots per resident row. */
  private[graft] def bitextScoreBuckets(x: DataFrame, y: DataFrame, planes: Int,
                                 k: Int, ringBits: Int,
                                 width: Int = 0): DataFrame = {
    val spark = x.sparkSession
    import spark.implicits._
    // corpus mean over both shards (corpusMean doc: the centering model)
    val meanArr = corpusMean(x.select(col("vec")).unionAll(y.select(col("vec"))), "vec")
    val sig = graft.functions.VectorExpressions.signLsh(
      col("vec"), planes, meanArr)
    // multi-probe ring: ALL flips of Hamming ≤ ringBits, generated by
    // combination of flipped plane indices (arbitrary depth — a ring-3
    // sweep measures ring 3, never a silently-capped ring 2). Probe
    // count is Σ_{r≤ringBits} C(planes, r) — the ring depth is the
    // recall/cost knob: each extra bit recovers pairs whose centered
    // signs drift further (near-centroid vectors) but multiplies the
    // replicated probe rows through the bucket shuffle.
    val flips: Seq[Long] = (1 to math.min(math.max(ringBits, 1), planes))
      .flatMap(r => (0 until planes).combinations(r)
        .map(_.foldLeft(0L)((m, b) => m | (1L << b))))
    val ring = array((col("sig") +: flips.map(f =>
      col("sig").bitwiseXOR(lit(f)))): _*)
    val xs = x.withColumn("sig", sig)
      .select(lit(true).as("isx"), col("id"), col("vec"), col("nrm"),
        explode(array_distinct(ring)).as("bucket"))
    val ys = y.select(lit(false).as("isx"), col("id"), col("vec"), col("nrm"),
      sig.as("bucket"))
    val kk = k
    // STREAMING discipline (the 100 TB memory bound): co-partition by
    // bucket and secondary-sort y-rows (isx=false) ahead of x-probes
    // within each bucket. The kernel then buffers ONLY the home side —
    // per-bucket y arrays + k backward slots per y — while the
    // ring-replicated probe side (|X|·|ring| rows, the big one) STREAMS
    // through Spark's spillable sort, scored row by row. Buffering both
    // sides in heap objects OOM'd an 8 GB JVM at 100× rows (the probe
    // replication is ~80× there); live state is now O(max bucket +
    // distinct-x-in-partition · k), corpus-independent given the
    // volume sizing.
    xs.unionAll(ys)
      // explicit numPartitions (r15): this stage is compute-bound
      // (Σ|x_ring(b)|·|y(b)| FMAs over a few MB of narrow rows), so
      // AQE's byte-based coalescing would pack the buckets onto one
      // core; pin explicit tasks instead (same rationale + measurement
      // as the blocked kernel's spread; width volume-sized since r16 —
      // see [[kernelWidth]]).
      .repartition(
        if (width > 0) width
        else x.sparkSession.sessionState.conf.numShufflePartitions,
        col("bucket"))
      .sortWithinPartitions(col("bucket"), col("isx")) // false (y) first
      .as[(Boolean, Long, Array[Double], Double, Long)]
      .mapPartitions { it =>
        import scala.collection.mutable
        // forward top-k per x id, accumulated ACROSS its ring buckets
        // resident in this partition (k-row merge per (x, bucket) —
        // hashmap cost stays off the per-pair hot loop)
        val fAcc = mutable.HashMap.empty[Long, (Array[Double], Array[Long])]
        // current bucket's home side as primitive parallel arrays: the
        // scoring loop below is the hot path (~18 ns/pair incl.
        // inserts, same as the exact kernel)
        var curBucket = Long.MinValue
        var haveBucket = false
        val yIds = mutable.ArrayBuffer.empty[Long]
        val yVecs = mutable.ArrayBuffer.empty[Array[Double]]
        val yNrms = mutable.ArrayBuffer.empty[Double]
        val bCos = mutable.ArrayBuffer.empty[Array[Double]] // backward top-k per y
        val bSid = mutable.ArrayBuffer.empty[Array[Long]]
        val out = mutable.ArrayBuffer.empty[(Long, Long, Double)]
        def flushBucket(): Unit = {
          var j = 0
          while (j < yIds.length) {
            var p = 0
            while (p < kk && bCos(j)(p) != Double.NegativeInfinity) {
              out += ((bSid(j)(p), yIds(j), bCos(j)(p))); p += 1
            }
            j += 1
          }
          yIds.clear(); yVecs.clear(); yNrms.clear(); bCos.clear(); bSid.clear()
        }
        it.foreach { case (isx, id, vec, nrm, b) =>
          if (!haveBucket || b != curBucket) {
            flushBucket(); curBucket = b; haveBucket = true
          }
          if (!isx) {
            yIds += id; yVecs += vec; yNrms += nrm
            bCos += Array.fill(kk)(Double.NegativeInfinity)
            bSid += Array.fill(kk)(Long.MaxValue)
          } else if (yIds.nonEmpty) {
            // an x probe: score against the bucket's y side NOW
            val fc = Array.fill(kk)(Double.NegativeInfinity)
            val ft = Array.fill(kk)(Long.MaxValue)
            var j = 0
            while (j < yIds.length) {
              val yv = yVecs(j)
              val n = math.min(vec.length, yv.length)
              var acc = 0.0
              var i = 0
              while (i < n) { acc += vec(i) * yv(i); i += 1 }
              val c = round6(acc / (nrm * yNrms(j)))
              topkInsert(kk, bCos(j), bSid(j), c, id)
              topkInsert(kk, fc, ft, c, yIds(j))
              j += 1
            }
            // merge this (x, bucket) forward top-k into the partition
            // accumulator (k inserts, off the hot loop)
            val (afc, aft) = fAcc.getOrElseUpdate(id,
              (Array.fill(kk)(Double.NegativeInfinity),
                Array.fill(kk)(Long.MaxValue)))
            var p = 0
            while (p < kk && fc(p) != Double.NegativeInfinity) {
              topkInsert(kk, afc, aft, fc(p), ft(p)); p += 1
            }
          }
        }
        flushBucket()
        fAcc.foreach { case (sid, (fc, ft)) =>
          var j = 0
          while (j < kk && fc(j) != Double.NegativeInfinity) {
            out += ((sid, ft(j), fc(j))); j += 1
          }
        }
        out.iterator
      }
      .toDF("src_id", "tgt_id", "cos")
  }

  /** CONTRASTIVE PAIR MINING — the training-data op ahead of an
    * embedding-model fine-tune (E5/GTE-style): per anchor, one
    * POSITIVE (its nearest neighbor with cos ≥ posThresh) and up to
    * `nHard` HARD NEGATIVES — the closest neighbors BELOW the positive
    * band. Hard negatives are the whole point: random negatives are
    * too easy to teach a margin, and above-band ones are false
    * negatives (near-dups of the anchor), so the band edge IS the
    * mining policy. Anchors with no in-band neighbor emit nothing (no
    * positive → no training pair).
    *
    * Scale shape: candidates come from MEAN-CENTERED SignLsh buckets
    * (the [[corpusMean]] discipline — this op pays Σ|bucket|² directed
    * pairs, so it is the op a raw-signed megabucket kills hardest: on
    * hashing-trick embeddings 65% of docs share one raw bucket and the
    * self-join goes (0.65·n)²; centering spreads the buckets while
    * SCORING stays on raw vectors, so emitted cosines are unchanged),
    * never corpus² (size `planes` so buckets stay small); both
    * per-anchor selections are rank ≤ n windows → map-side
    * WindowGroupLimit. LSH recall applies (a cross-bucket neighbor is
    * unseen) — the standard ANN mining trade-off; the planted-cluster
    * specs (zero-mean AND mean-shifted) pin behavior where signatures
    * agree. */
  def contrastivePairs(emb: DataFrame, idCol: String, vecCol: String,
                       posThresh: Double, nHard: Int = 3,
                       planes: Int = 0, corpusSize: Long = 0L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // planes = 0 sizes adaptively like embeddingNearDup: ~64 vectors
    // per bucket keeps the per-bucket pair cost bounded as the corpus
    // grows — a FIXED plane count is a quadratic time bomb (buckets
    // stay constant while |bucket| grows linearly)
    val nPlanes =
      if (planes > 0) planes
      else {
        val n = (if (corpusSize > 0) corpusSize else emb.count()).max(1L)
        math.max(3, math.ceil(math.log(n / 64.0) / math.log(2.0)).toInt)
      }
    val dotFn = graft.functions.VectorExpressions.dot _
    // centering-model fetch: one aggregation job at plan build (this is
    // a mining pass, not a serving path — cf. annIndex's persisted mean
    // for the serve-many-probes shape)
    val mean = corpusMean(emb, vecCol)
    val sig = graft.functions.VectorExpressions.signLsh(
      col(vecCol), nPlanes, mean)
    val withSig = emb.select(col(idCol).as("id"), col(vecCol).as("vec"),
        sig.as("bucket"))
      .withColumn("nrm", sqrt(dotFn(col("vec"), col("vec"))))
    val pairs = withSig.as("x").join(withSig.as("y"),
        col("x.bucket") === col("y.bucket") && col("x.id") =!= col("y.id"))
      .select(col("x.id").as("anchor"), col("y.id").as("partner"),
        round(dotFn(col("x.vec"), col("y.vec")) / (col("x.nrm") * col("y.nrm")), 6)
          .as("cos"))
    val w = Window.partitionBy(col("anchor"))
      .orderBy(col("cos").desc, col("partner"))
    val pos = pairs.filter(col("cos") >= posThresh)
      .withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
      .select(col("anchor"), col("partner"), lit("positive").as("role"),
        col("cos"), col("rk"))
    val neg = pairs.filter(col("cos") < posThresh)
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= nHard)
      .join(pos.select(col("anchor")), Seq("anchor")) // pair needs a positive
      .select(col("anchor"), col("partner"), lit("hard_negative").as("role"),
        col("cos"), col("rk"))
    pos.unionByName(neg)
  }
}
