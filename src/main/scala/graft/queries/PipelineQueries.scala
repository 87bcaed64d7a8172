package graft.queries

import graft.core.TestData.read
import graft.pipeline.{Dedup, Multimodal, Quantize, Similarity, TextAnalysis}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SURVEY.md §2C — training-data pipeline operators over the
  * documents/embeddings tables. sql-oracle where the algorithm is
  * exhaustively replicable in DuckDB; rows-only where it is inherently
  * probabilistic (LSH candidate generation).
  */
object PipelineQueries {

  /** Spread a corpus scan to the session's shuffle width when the file
    * layout under-splits it (r15). The local corpora ship as ONE
    * single-row-group parquet file, so every scan is one task and the
    * per-row work that fuses into the scan stage — tokenize, shingle,
    * explode, partial aggregation: the EXPENSIVE half of most text
    * operators — ran on one core (ProfileQuery: dedup_containment spent
    * 2×~1 s in 1-task scan stages at local[32]). A deterministic hash
    * repartition on the key costs one narrow shuffle of the raw corpus
    * and parallelizes everything downstream. GATED on the layout: with
    * ≥ width input files (any real at-scale table) it is a no-op, so
    * this is a small-layout corrective, not a local[32] tuning. */
  private def spread(s: SparkSession, df: DataFrame, key: String): DataFrame = {
    // Width is BYTE-sized (r16, VERDICT #2): ~64 KB of compressed
    // corpus per task (the measured knee at sf0.1 — text per-row work
    // expands bytes ~100x, so tasks this small still carry real
    // compute, while a flat session-width split of a sub-MB corpus
    // paid more per-task fixed cost than it parallelized: paired
    // 32-task vs volume-sized runs showed 1.2-1.6x on the heavy text
    // keys). Capped at the session shuffle width — at scale the cap
    // wins long before the gate below even matters.
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val width = BigInt(s.sessionState.conf.numShufflePartitions)
      .min((bytes / 65536).max(1)).toInt
    if (df.inputFiles.length < width) df.repartition(width, col(key)) else df
  }
  private def docs(s: SparkSession, dir: String): DataFrame = read(s, dir, "documents")
  /** docs() spread wide — OPT-IN per call site (r15): the extra
    * exchange pays off only where the scan-fused per-row work is heavy
    * (shingling, LM position streams, tf reduces: measured 0.42-0.68×)
    * and hurts map-only / driver-loop queries (dedup_exact 1.5×,
    * text_bpe_learn 1.3×) — so the default stays the raw scan. */
  private def docsW(s: SparkSession, dir: String): DataFrame =
    spread(s, docs(s, dir), "doc_id")
  private def emb(s: SparkSession, dir: String): DataFrame =
    read(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("vec"))

  /** Probe = embedding of vec_id 0 (a parameter fetch, not a data scan). */
  private def probeVec(s: SparkSession, dir: String): Seq[Double] =
    emb(s, dir).filter(col("vec_id") === 0).head().getSeq[Double](1)

  /** ANN/IVF indexes are PERSISTED sidecars, not in-memory stand-ins:
    * built and written ONCE per (session, dir) via writeAnnIndex /
    * writeIvfIndex (versioned dir + atomic pointer publish), then every
    * query resolves the pointer and reads the artifact back — so
    * correctness runs and Bench measure the real round-trip a cluster
    * deployment pays: Scan parquet over the published version dir, no
    * per-query signature/centroid computation.
    *
    * DEPLOYMENT NOTE: idxRoot is a driver-local temp dir — correct for
    * the single-JVM local[*] harness only. On a cluster the sidecar
    * root must be a shared filesystem path (hdfs://, s3a://, ...)
    * visible to every executor; Similarity's write/publish/read paths
    * already go through the path's own Hadoop filesystem, so only this
    * root changes. */
  private lazy val idxRoot: String =
    java.nio.file.Files.createTempDirectory("graft-index").toString
  private val idxWritten =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String, String), String]
  private val bitextPlanes =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), Int]
  private def annIdx(s: SparkSession, dir: String): Similarity.AnnIndex = {
    val path = idxWritten.getOrElseUpdate((s, dir, "ann"), {
      val p = s"$idxRoot/${math.abs(dir.hashCode.toLong)}/ann"
      Similarity.writeAnnIndex(
        Similarity.annIndex(emb(s, dir), "vec_id", "vec", planes = 8), p)
      p
    })
    Similarity.readAnnIndex(s, path)
  }

  /** Text-retrieval index sidecars (tf / dl / stats / docVecs) for the
    * hybrid serving path — written ONCE per (session, dir) like the
    * ANN/IVF indexes, read back from parquet for every query. tf lands
    * sorted by tok inside each file so a query-term slice prunes via
    * row-group stats instead of scanning the whole relation. */
  private def textIdx(s: SparkSession, dir: String)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame,
         org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    val base = idxWritten.getOrElseUpdate((s, dir, "text"), {
      val p = s"$idxRoot/${math.abs(dir.hashCode.toLong)}/text"
      val tf = TextAnalysis.termFrequencies(docs(s, dir))
      tf.sortWithinPartitions(col("tok")).write.mode("overwrite")
        .parquet(s"$p/tf")
      val tfBack = s.read.parquet(s"$p/tf")
      val dl = TextAnalysis.docLengths(tfBack)
      dl.write.mode("overwrite").parquet(s"$p/dl")
      TextAnalysis.bm25Stats(s.read.parquet(s"$p/dl"))
        .write.mode("overwrite").parquet(s"$p/stats")
      TextAnalysis.hashEmbedding(docs(s, dir), dims = 64)
        .write.mode("overwrite").parquet(s"$p/vecs")
      p
    })
    (s.read.parquet(s"$base/tf"), s.read.parquet(s"$base/dl"),
      s.read.parquet(s"$base/stats"), s.read.parquet(s"$base/vecs"))
  }

  /** ANN sidecar over the HASHING-TRICK doc embeddings — the embedding
    * family the ingest pipeline actually produces (and the one raw
    * sign-LSH megabuckets: these vectors share the stopword-mass
    * direction, which put 65% of sf0.1 docs in ONE bucket before
    * centering). sim_ann above serves the synthetic near-zero-mean
    * table where that pathology cannot show; this index is the benched
    * proof the CENTERED serving path prunes on real-shaped vectors. */
  private def annTextIdx(s: SparkSession, dir: String): Similarity.AnnIndex = {
    val path = idxWritten.getOrElseUpdate((s, dir, "ann_text"), {
      val p = s"$idxRoot/${math.abs(dir.hashCode.toLong)}/ann_text"
      Similarity.writeAnnIndex(
        Similarity.annIndex(
          TextAnalysis.hashEmbedding(docs(s, dir), dims = 64),
          "doc_id", "vec", planes = 8), p)
      p
    })
    Similarity.readAnnIndex(s, path)
  }

  /** Probe for the text-embedding index: the hash embedding of the
    * min-doc_id document (a parameter fetch — one 1-row embed job). */
  private val textProbe =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), Seq[Double]]
  private def textProbeVec(s: SparkSession, dir: String): Seq[Double] =
    textProbe.getOrElseUpdate((s, dir),
      TextAnalysis.hashEmbedding(
          docs(s, dir).orderBy(col("doc_id")).limit(1), dims = 64)
        .head().getSeq[Double](1))

  private def ivfIdx(s: SparkSession, dir: String): Similarity.IvfIndex = {
    val path = idxWritten.getOrElseUpdate((s, dir, "ivf"), {
      val p = s"$idxRoot/${math.abs(dir.hashCode.toLong)}/ivf"
      Similarity.writeIvfIndex(
        Similarity.ivfIndex(emb(s, dir), "vec_id", "vec",
          dim = probeVec(s, dir).length, nlist = 8, iters = 2), p)
      p
    })
    Similarity.readIvfIndex(s, path)
  }

  /** Session-scoped bucketed catalog artifacts, built once per
    * (session, dir) via Catalog.recreate. */
  private val tableCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String, String), DataFrame]
  private def tableName(dir: String, kind: String): String =
    s"graft_${kind}_" + math.abs(dir.hashCode.toLong)
  private def sessionTable(s: SparkSession, dir: String, kind: String)
                          (write: String => Unit): DataFrame =
    tableCache.getOrElseUpdate((s, dir, kind), {
      val table = tableName(dir, kind)
      graft.sources.Catalog.recreate(s, table)(write(table))
      s.table(table)
    })

  /** MinHash signature sidecar on the doc_id-bucketed catalog layout
    * (Dedup.writeMinHashSidecar) — the candidate-verify joins of
    * dedup_minhash then plan with no Exchange on the signature side
    * (PlanAuditSpec). Read back WITH its persisted signature width:
    * the artifact owns k, the query never re-supplies it. */
  private val mhKCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), Int]
  private def mhSidecar(s: SparkSession, dir: String): (DataFrame, Int) = {
    val t = sessionTable(s, dir, "minhash_sidecar") { table =>
      Dedup.writeMinHashSidecar(docs(s, dir), table, k = 64): Unit
    }
    // the artifact still owns k (readMinHashSidecar) — but read the
    // table property ONCE per session, not per query invocation
    // (SHOW TBLPROPERTIES is a driver job; uncached it taxed every
    // bench iteration)
    val k = mhKCache.getOrElseUpdate((s, dir),
      Dedup.readMinHashSidecar(s, tableName(dir, "minhash_sidecar"))._2)
    (t, k)
  }

  /** Token-set sidecar on the doc_id-bucketed catalog layout
    * (Dedup.writeTokenSetSidecar): the exact-Jaccard verify stage's
    * two fetch joins then read the corpus-sized token sets in place —
    * candidates move to the buckets, the token sets never reshuffle
    * (PlanAuditSpec). Shared by dedup_ngram and the cluster/keep-best
    * pipeline (their 1-in-5 sample is a bucketing-preserving filter
    * over the same table). */
  private def tokSidecar(s: SparkSession, dir: String): DataFrame =
    sessionTable(s, dir, "ngram_toks") { table =>
      Dedup.writeTokenSetSidecar(docs(s, dir), table): Unit
    }

  /** PQ model per (session, dir): trained once (deterministic Lloyd's
    * per block), cached like the other model artifacts; the encoded
    * codes are a PERSISTED sidecar table — queries serve from the
    * 64×-compressed (id, code) artifact, never the raw vectors
    * (except the bounded re-rank fetch). */
  private val pqCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), Quantize.PqModel]
  private def pqModel(s: SparkSession, dir: String): Quantize.PqModel =
    pqCache.getOrElseUpdate((s, dir),
      Quantize.pqTrain(emb(s, dir), "vec_id", "vec",
        dim = probeVec(s, dir).length, m = 8, ks = 16, iters = 2))
  private def pqCodes(s: SparkSession, dir: String): DataFrame =
    sessionTable(s, dir, "pq_codes") { table =>
      Quantize.pqEncode(pqModel(s, dir), emb(s, dir), "vec_id", "vec")
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .format("parquet").saveAsTable(table)
    }

  /** Embeddings served from a vec_id-bucketed catalog table — the
    * co-bucketed corpus layout: the rep-vector fetch join in
    * dedup_embed's verify stage never reshuffles the corpus
    * (PlanAuditSpec pins the SMJ shape). */
  private def embBucketed(s: SparkSession, dir: String): DataFrame =
    sessionTable(s, dir, "emb_bucketed") { table =>
      emb(s, dir).write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .bucketBy(32, "vec_id").sortBy("vec_id")
        .format("parquet").saveAsTable(table)
    }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_exact" -> ((s, dir) => Dedup.exact(docs(s, dir))),

    // incremental crawl-snapshot dedup: source 'src0' plays the
    // existing corpus, every other source the new snapshot; survivors
    // are snapshot docs absent from the corpus, keep-min-id within
    "dedup_incremental" -> ((s, dir) => {
      val d = docs(s, dir)
      Dedup.incrementalExact(
        d.filter(col("source") =!= "src0"),
        d.filter(col("source") === "src0"))
    }),

    "dedup_ngram" -> ((s, dir) => Dedup.ngramJaccardFromToks(tokSidecar(s, dir), 0.8)),

    // character-level near-dup pairs: (prefix, length-band) blocking +
    // bounded-Levenshtein verify — the edit-distance complement to the
    // token-set family; block cap = the boilerplate-df discipline; no
    // hashing anywhere, so blocking + verify + rounding replicate in
    // the oracle value-for-value
    "dedup_edit" -> ((s, dir) => Dedup.editDedup(docs(s, dir))),

    "dedup_minhash" -> ((s, dir) => {
      val (sigs, k) = mhSidecar(s, dir)
      Dedup.minhashLshFromSigs(sigs, k = k, bands = 16, estThreshold = 0.8)
    }),

    "dedup_simhash" -> ((s, dir) => Dedup.simhashPairs(docs(s, dir), maxHamming = 8)),

    // CONTRASTIVE PAIR MINING for embedding-model fine-tuning: per
    // anchor one positive (nearest in-band neighbor) + up to 3 hard
    // negatives (closest below-band — informative, not random);
    // SignLsh bucket candidates (never corpus²), rank windows →
    // map-side WindowGroupLimit. rows-only; planted-cluster spec.
    "train_pairs" -> ((s, dir) =>
      Similarity.contrastivePairs(emb(s, dir), "vec_id", "vec",
        posThresh = 0.35, nHard = 3)), // planes sized by volume

    // margin-based bitext mining (Artetxe & Schwenk ratio criterion)
    // over the shared hashing-trick embeddings: per en doc the best
    // cross-lingual neighbor, scored against BOTH local neighborhoods
    // (k=4). Exact path (planes=0) → fully DuckDB-replicated; the
    // SignLsh ring-bucket scale path is spec-pinned against it
    "train_bitext" -> ((s, dir) => {
      val d = docsW(s, dir)
      val embd = TextAnalysis.hashEmbedding(d, dims = 64)
        .join(d.select(col("doc_id"), col("lang")), "doc_id")
      Similarity.bitextMine(embd, "doc_id", "vec", "lang", srcLang = "en")
    }),

    // the SCALE path of the same miner: mean-centered SignLsh ring
    // buckets (Σ|bucket|-bounded, never |X|·|Y|) with volume-sized
    // planes (~128 vectors/bucket, the measured knee), scored by the
    // exact path's imperative kernel. This is the 100 TB design and the
    // headline-benched key; the exact path above stays the oracle.
    // rows-only for the driver; recall + bounded margin inflation vs
    // the exact path are parity-pinned (GroundTruthSpec,
    // BitextScaleProbe parity mode).
    "train_bitext_lsh" -> ((s, dir) => {
      val d = docsW(s, dir)
      val embd = TextAnalysis.hashEmbedding(d, dims = 64)
        .join(d.select(col("doc_id"), col("lang")), "doc_id")
      // plane count is an index-sizing parameter: computed once per
      // (session, dir) — steady-state serving reuses it, like the
      // ANN/IVF sidecar builds above
      // ~128 vectors/bucket: the measured knee of the recall/cost
      // curve under the Hamming≤2 ring (30×: 40 s vs exact 98 s,
      // 98.6% mined-set recall; finer buckets trade recall for little
      // time, coarser pay quadratic per-bucket work)
      val planes = bitextPlanes.getOrElseUpdate((s, dir), {
        val nY = d.filter(col("lang") =!= "en").count()
        math.max(4, (math.log(nY / 128.0) / math.log(2)).ceil.toInt)
      })
      Similarity.bitextMine(embd, "doc_id", "vec", "lang", srcLang = "en",
        planes = planes)
    }),

    "dedup_embed" -> ((s, dir) => {
      // planes = 0 → auto-scaled with corpus size (SURVEY §2C scale
      // path); corpus from the vec_id-bucketed layout so the verify
      // stage's rep-vector fetch joins the corpus in place.
      // The synthetic embeddings carry no near-dups at the probe SFs
      // (0 pairs → the driver's rows-only gate was vacuous), so the
      // query input plants two near-copies of the minimum-id vector
      // (+1e-9 per component): under the MEAN-CENTERED signing, a
      // tiny TRANSLATION preserves centered signs (flip needs a plane
      // dot within ~1e-9 of zero), so they share their source's
      // bucket, whose min id is its rep → cosine ~1.0 pairs at ANY
      // SF. Planted ids derive from max(vec_id)+1/+2 (NOT constants —
      // a large enough SF would collide real ids with a fixed 10M).
      val corpus = embBucketed(s, dir)
      // ONE aggregation job yields both the min-id vector and the max
      // id; the two planted rows explode from it
      val planted = corpus
        .agg(max(col("vec_id")).as("maxid"),
          min_by(col("vec"), col("vec_id")).as("vec"))
        .select(explode(array(col("maxid") + 1, col("maxid") + 2)).as("vec_id"),
          transform(col("vec"), x => x + lit(1e-9)).as("vec"))
      Dedup.embeddingNearDup(corpus.unionByName(planted), "vec_id", "vec",
        threshold = 0.4, planes = 0)
    }),

    "sim_topk" -> ((s, dir) =>
      Similarity.topK(emb(s, dir), "vec_id", "vec", probeVec(s, dir), 10,
        excludeId = Some(0L))),

    // radius query: everything with cosine >= 0.2 of the probe —
    // map-only scan+filter, the shape a near-dup radius pass uses
    "sim_range" -> ((s, dir) =>
      Similarity.rangeSearch(emb(s, dir), "vec_id", "vec", probeVec(s, dir),
        minCos = 0.2, excludeId = Some(0L))),

    "sim_ann" -> ((s, dir) =>
      Similarity.annTopKIndexed(annIdx(s, dir), probeVec(s, dir), 10,
        excludeId = Some(0L))),

    // ANN serving over the HASHING-TRICK doc embeddings — the
    // mean-dominated family the curation pipeline feeds the index
    // (sim_ann's synthetic table is near-zero-mean, exactly where the
    // raw-sign megabucket pathology hides). Same online path: pointer
    // resolve → pushed-down In-ring over the bucket-clustered sidecar
    // (plan-pinned) → exact rescore of the pruned candidates.
    "sim_ann_text" -> ((s, dir) => {
      val probe = textProbeVec(s, dir)
      Similarity.annTopKIndexed(annTextIdx(s, dir), probe, 10)
    }),

    "sim_ivf" -> ((s, dir) =>
      Similarity.ivfTopKIndexed(ivfIdx(s, dir), probeVec(s, dir), 10,
        nprobe = 2, excludeId = Some(0L))),

    // batch multi-probe ANN: the first 16 corpus vectors all score
    // against the index in ONE join pass (throughput serving shape;
    // per-probe parity with sim_ann's online path is spec-pinned)
    "sim_ann_batch" -> ((s, dir) =>
      Similarity.annTopKBatch(annIdx(s, dir),
        emb(s, dir).filter(col("vec_id") < 16), "vec_id", "vec",
        k = 5, excludeSelf = true)),

    // batch multi-probe IVF (same throughput shape over the
    // cell-assigned corpus; per-probe parity spec-pinned)
    "sim_ivf_batch" -> ((s, dir) =>
      Similarity.ivfTopKBatch(ivfIdx(s, dir),
        emb(s, dir).filter(col("vec_id") < 16), "vec_id", "vec",
        k = 5, nprobe = 2, excludeSelf = true)),

    // exploded to one row per (doc, fingerprint hash) so the oracle
    // checks EVERY published fingerprint value, not a per-doc summary
    // (md5-derived gram hash — both engines derive identical sets)
    // PQ compressed-domain ANN: ADC over the persisted (id, code)
    // sidecar (map-only shift/mask/LUT scoring, no shuffle), exact
    // re-rank of the 50 survivors. Recall vs brute force spec-bound.
    "sim_pq" -> ((s, dir) =>
      Quantize.pqTopKReranked(pqModel(s, dir), pqCodes(s, dir), emb(s, dir),
        "vec_id", "vec", probeVec(s, dir), k = 10, rerankDepth = 50,
        excludeId = Some(0L))),

    // Deterministic distributed k-means over the embedding corpus:
    // per-cluster sizes + compactness datasheet.
    "embed_kmeans" -> ((s, dir) =>
      Quantize.kmeansProfile(emb(s, dir), "vec_id", "vec",
        dim = probeVec(s, dir).length, k = 8, iters = 3)),

    "text_winnow" -> ((s, dir) =>
      TextAnalysis.winnow(docs(s, dir))
        .select(col("doc_id"), explode(col("fingerprint")).as("fp"))),

    "text_tokens" -> ((s, dir) => TextAnalysis.tokenCounts(docs(s, dir))),

    "text_quality" -> ((s, dir) => TextAnalysis.quality(docs(s, dir))),

    // character-entropy gate (low entropy = repeated-char / templated
    // junk): native codegen'd one-pass CharEntropy expression, map-only
    // scan. Unlike the deflate gate this native expression IS
    // cross-engine comparable — the code-point histogram matches the
    // oracle's string_split(text, '') characters and both sides share
    // the ln(n) - Σk·ln(k)/n formula + 6-decimal rounding; keep
    // derives from the ROUNDED value so the boundary agrees
    "text_entropy" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"),
          round(graft.functions.CharEntropy.charEntropy(col("text")), 6)
            .as("char_entropy"))
        .withColumn("keep", col("char_entropy") >= 2.6)),

    // gate-calibration sweep: docs/tokens surviving each candidate
    // quality cutoff 0.1..0.9 — 18 conditional aggregates fused into
    // ONE map-side-combinable scan, unpivoted by a map-only stack
    "text_gate_sweep" -> ((s, dir) => TextAnalysis.gateSweep(docs(s, dir))),

    "text_langid" -> ((s, dir) => TextAnalysis.langId(docs(s, dir))),

    "text_fingerprint" -> ((s, dir) => TextAnalysis.fingerprint(docs(s, dir))),

    "text_tfidf" -> ((s, dir) => TextAnalysis.tfidfTop(docsW(s, dir), topK = 3)),

    "text_hashvec" -> ((s, dir) => TextAnalysis.hashVectors(docs(s, dir), dims = 64)),

    // dense hashing-trick document embedding (the embedding stage of
    // the streaming curation pipeline), exploded to (doc_id, dim, val)
    // rows so the oracle can hash-check the full dense vector — zeros
    // included (the array form is what hashEmbedding returns; posexplode
    // is presentation only)
    "text_embed" -> ((s, dir) =>
      TextAnalysis.hashEmbedding(docs(s, dir), dims = 64)
        .select(col("doc_id"), posexplode(col("vec")).as(Seq("dim", "val")))
        .select(col("doc_id"), col("dim").cast("long").as("dim"), col("val"))),

    "text_redact" -> ((s, dir) => TextAnalysis.redact(docs(s, dir))),

    // reproducible stratified sample: 20 docs per predicted language,
    // ranked by an engine-neutral id hash (md5) — exact quotas,
    // bit-identical selection in Spark and the DuckDB oracle.
    // Efraimidis-Spirakis weighted sampling without replacement,
    // weight = n_chars (longer docs favored): map-only hash-derived
    // keys + TakeOrderedAndProject — no corpus shuffle.
    "sample_weighted" -> ((s, dir) =>
      TextAnalysis.weightedSample(
        docs(s, dir).select(col("doc_id"), col("n_chars").as("weight")),
        "doc_id", "weight", k = 40)),

    // BPE tokenizer-training merge scoring: corpus → word vocab (one
    // shuffle) → char-pair explode over vocab only → weighted counts.
    "text_bpe_pairs" -> ((s, dir) => TextAnalysis.bpePairCounts(docs(s, dir), topK = 100)),

    // FULL BPE merge learning (Sennrich 2016): 12 iterations over the
    // reduced (word, count) relation — corpus shuffled ONCE, each
    // round = vocab-sized pair count + 1-row argmax + map-only fold
    // rewrite; deterministic merge table (count desc, lexicographic).
    // rows-only — the loop is not SQL-expressible; parity spec pins
    // the table against an independent reference implementation.
    "text_bpe_learn" -> ((s, dir) => TextAnalysis.bpeLearn(docs(s, dir), merges = 12)),

    // tokenizer APPLICATION + fertility datasheet: encode the corpus
    // with the merge table learned on it (12-rule driver state — the
    // bounded-collect discipline); per-word encode work is
    // vocab-sized, corpus pays one word join + one reduce. rows-only;
    // parity spec pins encode against the reference implementation.
    "text_bpe_encode" -> ((s, dir) => {
      val rules = TextAnalysis.bpeLearn(docs(s, dir), merges = 12)
        .orderBy(col("step")).collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
      TextAnalysis.bpeEncode(docs(s, dir), rules)
    }),

    // model-based quality gate: linear scorer over the hashed
    // bag-of-words (fasttext shape), md5 stand-in weights; no UDF.
    "text_quality_model" -> ((s, dir) =>
      TextAnalysis.qualityModelGate(docs(s, dir), dims = 64)),

    // PMI-ranked adjacent-bigram collocations: phrase discovery over
    // the reduced vocab/bigram relations, never the raw token stream.
    "text_collocations" -> ((s, dir) =>
      TextAnalysis.collocations(docs(s, dir), minCount = 5, topK = 50)),

    // temperature-scaled (T=2) domain mixture datasheet: per-source
    // sampling weights + token allocations out of a 1M-token budget.
    "sample_temperature" -> ((s, dir) =>
      TextAnalysis.temperatureMix(docs(s, dir), budgetTokens = 1000000L)),

    // TOPIC clustering of the text corpus: hashing-trick embeddings,
    // L2-normalized (token MIX, not doc length), deterministic k-means
    // assignment, then a per-topic datasheet with the majority source
    // resolved by a deterministic (count, source) argmax window.
    "doc_topics" -> ((s, dir) => {
      val emb = TextAnalysis.hashEmbedding(docs(s, dir), dims = 16)
      val norm = emb
        .withColumn("nrm", sqrt(aggregate(
          transform(col("vec"), x => x * x), lit(0.0), (a, b) => a + b)))
        .filter(col("nrm") > 0)
        .select(col("doc_id"), transform(col("vec"), x => x / col("nrm")).as("nvec"))
      val assigned = Quantize.kmeansAssign(norm, "doc_id", "nvec",
          dim = 16, k = 4, iters = 3)
        .select(col("id").as("doc_id"), col("cluster").as("topic"))
        .join(docs(s, dir).select(col("doc_id"), col("source")), Seq("doc_id"))
      val bySrc = assigned.groupBy(col("topic"), col("source"))
        .agg(count(lit(1)).as("n"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("topic"))
        .orderBy(col("n").desc, col("source"))
      bySrc.withColumn("rk", row_number().over(w))
        .groupBy(col("topic"))
        .agg(sum(col("n")).as("n_docs"),
          max(when(col("rk") === 1, col("source"))).as("top_source"))
    }),

    "sample_stratified" -> ((s, dir) =>
      TextAnalysis.stratifiedSample(
          TextAnalysis.langId(docs(s, dir)), "pred_lang", "doc_id", perStratum = 20)
        .select(col("doc_id"), col("pred_lang"))),

    "text_chunk" -> ((s, dir) => TextAnalysis.chunk(docs(s, dir), winSize = 64, step = 48)),

    // benchmark decontamination: source 'src0' plays the eval suite,
    // every other source is the training corpus; n=8 token shingles.
    "text_decontam" -> ((s, dir) => {
      val d = docsW(s, dir)
      TextAnalysis.decontaminate(
        d.filter(col("source") =!= "src0"),
        d.filter(col("source") === "src0"), n = 8)
    }),

    // decontamination at eval-set scale: Bloom-sketch prune on the
    // corpus shingle stream + exact verify join — output identical to
    // text_decontam, plan broadcastable even when the eval shingle set
    // is not
    "text_decontam_bloom" -> ((s, dir) => {
      val d = docsW(s, dir)
      TextAnalysis.decontaminateBloom(
        d.filter(col("source") =!= "src0"),
        d.filter(col("source") === "src0"), n = 8)
    }),

    // sharded-export manifest: per-shard doc count / exact token sum /
    // order-insensitive bit_xor content signature (the release audit
    // record; the sink itself is writeTrainingShards, spec-checked)
    "export_manifest" -> ((s, dir) => TextAnalysis.exportManifest(docs(s, dir), nShards = 64)),

    "text_repetition" -> ((s, dir) => TextAnalysis.repetition(docs(s, dir))),

    // near-dup CLUSTER assignment: connected components over the
    // deterministic n-gram-Jaccard pair graph (cluster id = min doc_id
    // in the component) — the canonical-document step that turns pair
    // output into one keeper per duplicate group even when A~B~C
    // chains never pair A with C directly. Reuses the DF-native
    // large-star/small-star CC (O(log n) rounds; handles the full
    // corpus — the sf0.1 graph is ~3M pairs). The QUERY runs on a
    // deterministic 1-in-5 doc sample only so the DuckDB oracle's
    // quadratic recursive-closure check stays tractable at every
    // probe SF — the operator itself has no such bound.
    "dedup_clusters" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      val sampled = tokSidecar(s, dir).filter(col("doc_id") % 5 === 0)
      val pairs = Dedup.ngramJaccardFromToks(sampled, 0.8)
        .select(col("a").as("src"), col("b").as("dst"))
      graft.graph.GraphOps.ccDataFrame(pairs)
        .select(col("node").as("doc_id"), col("component").as("cluster"))
    }),

    "text_logprob" -> ((s, dir) => TextAnalysis.unigramLogProb(docs(s, dir))),

    // CCNet-style BIGRAM LM gate: mean ln p(w|prev) under the corpus
    // bigram MLE (add-1 over the unigram vocab) — conditional context
    // catches shuffled-token junk unigram scoring cannot; one bigram
    // reduce + one rejoin, context totals derived from the reduced
    // relation (no second corpus pass)
    "text_bigram_lm" -> ((s, dir) => TextAnalysis.bigramLogProb(docs(s, dir))),

    // Stupid-Backoff TRIGRAM LM (Brants et al. 2007): counts from a
    // held-out train partition so backoff genuinely fires; each
    // distinct trigram scored once against vocab-sized count
    // relations, ONE corpus-sized position join
    "text_trigram_lm" -> ((s, dir) =>
      TextAnalysis.trigramStupidBackoff(docs(s, dir))),

    // Gopher rule gates (Rae et al. 2021): per-doc rule datasheet,
    // map-only single pass
    "text_gopher" -> ((s, dir) => TextAnalysis.gopherRules(docs(s, dir))),

    // Zipf rank-frequency fit over the top-1000 terms: corpus health
    // one-rower; quantized-log integer normal equations (exact under
    // any accumulation order), top-R head via TakeOrdered not a
    // global window
    "text_zipf" -> ((s, dir) => TextAnalysis.zipfFit(docs(s, dir))),

    // SOFT dedup: every doc kept, weight 1/|exact-hash cluster| —
    // the down-weighting alternative to dropping; one hash shuffle
    "dedup_soft" -> ((s, dir) => Dedup.softDedup(docs(s, dir))),

    // duplication-multiplicity datasheet: clusters/docs/removable per
    // exact-hash cluster size k — "how duplicated is this crawl"
    "dedup_stats" -> ((s, dir) => Dedup.dupStats(docs(s, dir))),

    // novelty: fraction of a doc's distinct 8-token shingles first
    // seen (min doc_id) in that doc — the curriculum-ordering signal
    "text_novelty" -> ((s, dir) => TextAnalysis.noveltyScore(docsW(s, dir))),

    // language-ID confidence margin (fastText-style act-only-when-
    // confident gate); same predLang heuristic as text_langid
    "text_lang_conf" -> ((s, dir) =>
      TextAnalysis.langIdConfidence(docs(s, dir))),

    // corpus n-gram datasheet: distinct/instances/singleton-frac/df
    // tail — the numbers that size a dedup deployment's state
    "corpus_ngram_stats" -> ((s, dir) => TextAnalysis.ngramStats(docsW(s, dir))),

    // Flesch reading-ease gate (dictionary-free syllable proxy):
    // map-only, one codegen'd projection, exact-integer counts
    "text_readability" -> ((s, dir) => TextAnalysis.readability(docs(s, dir))),

    // lexical diversity (TTR/hapax/Guiraud) from ONE sorted-copy
    // boundary scan — map-only, no (doc, tok) corpus shuffle
    "text_lexdiv" -> ((s, dir) => TextAnalysis.lexicalDiversity(docs(s, dir))),

    // PII incidence datasheet per source — the accounting twin of
    // text_redact, sharing its regex constants; map-only + tiny rollup
    "text_pii_report" -> ((s, dir) => TextAnalysis.piiReport(docs(s, dir))),

    // near-dup THRESHOLD SWEEP: one LSH candidate pass at the lowest
    // cutoff, per-threshold pair / removable / representative counts —
    // the datasheet that picks a dedup threshold before the real run
    "dedup_sweep" -> ((s, dir) => {
      val (sigs, k) = mhSidecar(s, dir)
      Dedup.minhashSweep(sigs, k = k, bands = 16)
    }),

    // embedding-space datasheet: per-label centroid norm + spread via
    // the shift identity (no centroid re-join); quantized-exact sums
    "embed_stats" -> ((s, dir) =>
      Similarity.embedStats(
        read(s, dir, "embeddings")
          .select(col("vec_id"), col("embedding").as("vec"), col("label")),
        "vec_id", "vec", "label")),

    // DSIR importance weights (hashed-unigram bucket multinomials,
    // target vs raw): the data-SELECTION step before a training run —
    // fixed-size (1024-bucket) distribution tables regardless of corpus
    // size, so the log-ratio relation broadcasts at 100 TB; two corpus
    // passes total
    "sample_importance" -> ((s, dir) =>
      TextAnalysis.importanceWeights(docsW(s, dir),
        col("source").isin("src0", "src1"))),

    // exact-substring dedup signal (Lee et al. 2022) at 8-token span
    // granularity: per-doc duplicated-span coverage over the corpus
    "dedup_spans" -> ((s, dir) => Dedup.duplicatedSpans(docs(s, dir), n = 8)),

    // asymmetric CONTAINMENT (quote/inclusion) at 8-token shingle
    // granularity: ordered pairs where ≥ half of doc a's distinct
    // shingles appear in doc b — the signal symmetric Jaccard cannot
    // see (a short doc quoted inside a long one); one (doc, sh)
    // self-join over the reduced distinct relation
    "dedup_containment" -> ((s, dir) =>
      Dedup.shingleContainment(docsW(s, dir), n = 8, threshold = 0.5)),

    // the REMOVAL step of exact-substring dedup: cut every token
    // covered by a cross-document duplicated 8-token span
    "dedup_trim" -> ((s, dir) => Dedup.trimDuplicatedSpans(docs(s, dir), n = 8)),

    // corpus datasheet: (source x language) rollup of docs / exact
    // token sums / mean quality / PII rate — one fused scan, one
    // grouping-sets shuffle
    "corpus_profile" -> ((s, dir) => TextAnalysis.corpusProfile(docs(s, dir))),

    // corpus-level leakage report: pairwise cross-source shingle
    // overlap + vocabulary Jaccard between subcorpora
    "text_src_overlap" -> ((s, dir) => TextAnalysis.sourceOverlap(docsW(s, dir), n = 8)),

    // boilerplate inventory: the top shared 8-gram shingles by doc
    // frequency — the accounting half of the containment/overlap
    // maxDf discipline (what the df bound excludes, reviewed instead
    // of silently dropped)
    "text_boilerplate" -> ((s, dir) =>
      TextAnalysis.boilerplateReport(docsW(s, dir), n = 8, minDf = 2, topK = 100)),

    // train/val/test freeze: content-independent md5 basis-point
    // bucketing, engine-reproducible, shuffle-free
    "sample_split" -> ((s, dir) =>
      TextAnalysis.splitAssign(docs(s, dir).select(col("doc_id")), "doc_id")
        .select(col("doc_id"), col("split_bucket"), col("split"))),

    // data-mixing: per-language TOKEN quotas (weight x budget) filled in
    // deterministic md5 order — the domain-reweighting step before a
    // training run; one fused scan + one window shuffle
    "sample_domain_mix" -> ((s, dir) =>
      TextAnalysis.domainMix(docs(s, dir),
        Map("en" -> 0.6, "de" -> 0.15, "fr" -> 0.1, "es" -> 0.1, "zh" -> 0.05),
        totalTokens = 20000L)),

    // CCNet-style perplexity tail-drop: per language keep the top 80%
    // by corpus-unigram mean log-prob
    "text_ppl_filter" -> ((s, dir) => TextAnalysis.pplFilter(docs(s, dir), 0.8)),

    // canonical-doc SELECTION: after near-dup cluster assignment, keep
    // the highest-QUALITY member per cluster (tie: lowest doc_id) —
    // the retention-policy step that turns a cluster map into a kept
    // corpus (min-id keeping throws away the best copy when a clean
    // original clusters with a mangled near-dup). One window shuffle
    // over the cluster map; same 1-in-5 sample as dedup_clusters
    // (oracle-tractability only — the operator has no such bound).
    "dedup_keep_best" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      import org.apache.spark.sql.expressions.Window
      val sampledToks = tokSidecar(s, dir).filter(col("doc_id") % 5 === 0)
      val pairs = Dedup.ngramJaccardFromToks(sampledToks, 0.8)
        .select(col("a").as("src"), col("b").as("dst"))
      val clusters = graft.graph.GraphOps.ccDataFrame(pairs)
        .select(col("node").as("doc_id"), col("component").as("cluster"))
      val quality = TextAnalysis.quality(
          docs(s, dir).filter(col("doc_id") % 5 === 0))
        .select(col("doc_id"), col("quality_score"))
      val w = Window.partitionBy(col("cluster"))
        .orderBy(col("quality_score").desc, col("doc_id"))
      clusters.join(quality, "doc_id")
        .withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
        .select(col("cluster"), col("doc_id"),
          round(col("quality_score"), 6).as("quality_score"))
    }),

    // sequence packing: curated corpus -> fixed-token-budget training
    // rows (concat-and-chunk), shard-parallel with one window shuffle
    "pipeline_pack" -> ((s, dir) =>
      TextAnalysis.packSequences(docs(s, dir), budget = 512, shards = 8)),

    // End-to-end curation pipeline — the composition a real training-data
    // run executes: language gate -> quality gate -> exact-dedup
    // survivors. One pass over the corpus, one hash shuffle (the dedup
    // groupBy); the gates are pushed-down scans feeding it.
    "pipeline_e2e" -> ((s, dir) => {
      val d = docsW(s, dir)
      // ONE corpus pass for the per-row gates (language + quality
      // fused), one shuffle for the relational step (exact dedup)
      val gated = TextAnalysis.langQuality(d)
        .filter(col("pred_lang") === "en" && col("quality_score") >= 0.5)
      val survivors = Dedup.exact(d).select(col("doc_id"))
      gated.join(survivors, "doc_id")
        .select(col("doc_id"), col("n_tokens"), round(col("quality_score"), 6).as("quality_score"))
    }),

    "mm_plumbing" -> ((s, dir) =>
      Multimodal.features(Multimodal.resize(
          Multimodal.decode(Multimodal.asBinary(docs(s, dir))), maxW = 512, maxH = 512))
        .select(col("doc_id"), col("n_bytes"), col("meta.width").as("width"),
          col("meta.height").as("height"), col("meta.format").as("format"),
          size(col("features")).as("n_features"))),

    // video→frames fan-out shape: fixed-size payload slices, every 2nd
    // one emitted as its own row (rows-only; shapes spec-asserted).
    "mm_frames" -> ((s, dir) =>
      Multimodal.frameSample(Multimodal.asBinary(docs(s, dir)), frameSize = 64, stride = 2)
        .select(col("doc_id"), col("frame_idx"), octet_length(col("frame")).as("frame_bytes"))),

    // audio plumbing: payload bytes as PCM16 mono → per-window RMS +
    // zero-crossing features (map-only; planted-waveform spec carries
    // the hard check — text-bytes payloads here exercise the plumbing)
    "mm_audio" -> ((s, dir) =>
      Multimodal.audioFeatures(Multimodal.asBinary(docs(s, dir)), winSamples = 256)
        .select(col("doc_id"), col("win_idx"), col("n_samples"),
          round(col("rms"), 6).as("rms"), col("zero_crossings"))),

    // BM25 keyword relevance against a fixed query term set — the
    // keyword half of hybrid retrieval; one corpus tf shuffle, then
    // query-hit-sized joins only
    "text_bm25" -> ((s, dir) =>
      TextAnalysis.bm25(docsW(s, dir), Seq("spark", "query", "join"))),

    // hybrid BM25 + embedding-cosine retrieval fused by reciprocal-rank
    // fusion — both lists are TakeOrderedAndProject scans; everything
    // after is kPerList-sized. Full SQL oracle: both scorers are
    // md5/arithmetic-deterministic, so DuckDB replicates the fused
    // ranking value-for-value.
    "sim_hybrid" -> ((s, dir) =>
      TextAnalysis.hybridRetrieve(docsW(s, dir), Seq("spark", "query", "join"))),

    // BATCH multi-query BM25: two queries scored in ONE tf join with a
    // map-side WindowGroupLimit top-k per query — the sim_ann_batch
    // amortization applied to keyword retrieval
    "text_bm25_batch" -> ((s, dir) =>
      TextAnalysis.bm25Batch(docsW(s, dir), Map(
        "q1" -> Seq("spark", "query", "join"),
        "q2" -> Seq("hash", "scan", "filter")), topK = 10)),

    // the SERVING path of the same query: tf/dl/stats/docVecs are
    // persisted sidecars written once (the ANN-index discipline), tok-
    // sorted so the query-term slice prunes at the parquet level; a
    // query pays the hit-sized bm25 slice + one vector pass + k-sized
    // fusion — the corpus explode never re-runs. SAME oracle as
    // sim_hybrid (identical output by shared-code construction).
    "sim_hybrid_indexed" -> ((s, dir) => {
      val (tf, dl, stats, vecs) = textIdx(s, dir)
      TextAnalysis.hybridFromIndex(tf, dl, stats, vecs,
        Seq("spark", "query", "join"))
    }),

    // crawl-monitoring DRIFT datasheet: per-source token-mass share in
    // snapshot A vs B (doc_id parity stand-in) with L1/KL contributions
    "corpus_drift" -> ((s, dir) => TextAnalysis.snapshotDrift(docs(s, dir))),

    // MMR diversity re-rank over the cosine top-50 candidates (the
    // serving-side dual of sample_kcenter; k-sized driver loop on a
    // by-construction-bounded candidate list) — rows-only,
    // duplicate-crowding spec
    "sim_mmr" -> ((s, dir) => {
      val e = emb(s, dir)
      val cands = Similarity.topK(e, "vec_id", "vec", probeVec(s, dir), 50,
          excludeId = Some(0L))
        .join(e.select(col("vec_id").as("id"), col("vec")), Seq("id"))
      Similarity.mmrRerank(cands, "id", "vec", "cos", kFinal = 10)
    }),

    // greedy k-center coreset selection (diverse-subset sampling for
    // curation): k maximally-spread exemplars, deterministic
    // (min-id seed, farthest-point rounds with min-id ties) — rows-only,
    // planted-cluster coverage spec
    "sample_kcenter" -> ((s, dir) =>
      Similarity.kCenterSelect(emb(s, dir), "vec_id", "vec", k = 8)
        .select(col("id"), col("pick_order"), round(col("dist_to_prev"), 6)
          .as("dist_to_prev"))),

    // perceptual-hash IMAGE dedup (aHash: decode → 8×8 bilinear →
    // above-mean bits; md5 fallback for the non-image harness payloads)
    // — the image counterpart of dedup_exact; rows-only, planted-image
    // spec carries re-encode/resize invariance
    "mm_image_dedup" -> ((s, dir) =>
      Multimodal.imageDedup(Multimodal.asBinary(docs(s, dir)))),

    // envelope-fingerprint AUDIO dedup (PCM16 window RMS → silence trim
    // → 65-anchor delta-sign bits): gain-rescaled / silence-padded
    // copies merge, distinct envelopes separate — the audio counterpart
    // of mm_image_dedup; rows-only, planted-clip spec carries the
    // invariance checks
    "mm_audio_dedup" -> ((s, dir) =>
      Multimodal.audioDedup(Multimodal.asBinary(docs(s, dir)))),

    // temporal-envelope VIDEO dedup (per-frame mean luma → black-frame
    // trim → 65 midpoint anchors → delta-sign bits): brightness-scaled
    // / black-padded / frame-duplicated (slow-motion) copies merge,
    // distinct clips separate — closes the image/audio/video dedup
    // triangle; rows-only, planted-clip spec carries the invariance
    // checks
    "mm_video_dedup" -> ((s, dir) =>
      Multimodal.videoDedup(Multimodal.asBinary(docs(s, dir)), frameSize = 64)),

    // zlib compression-ratio quality gate (too-compressible = templated
    // junk): native codegen'd expression, map-only scan. rows-only —
    // deflate length is JDK-deterministic, not a cross-engine contract;
    // planted-text spec carries the hard check.
    "text_compress_ratio" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"),
        round(graft.functions.DeflateRatio.deflateRatio(col("text")), 4)
          .as("deflate_ratio"))
        .withColumn("keep", col("deflate_ratio") >= 0.25)),

    // exact heavy hitters via the two-pass Misra-Gries pattern:
    // mergeable k-counter sketch -> candidates -> exact verify of the
    // <=k candidates only; output is deterministic (tokens with
    // count*(k+1) > N, exact counts) so it carries a plain SQL oracle
    "text_heavy_hitters" -> ((s, dir) =>
      TextAnalysis.heavyHitters(docs(s, dir), k = 32)),

    // SemDeDup-style semantic dedup: k-means cluster-scoped cosine
    // near-dup groups over the embedding corpus (candidates Σ|cell|²,
    // never corpus²); rows-only — planted-pair ground truth in
    // GroundTruthSpec (the synthetic embeddings carry no near-dups,
    // so everything is kept here)
    "dedup_semantic" -> ((s, dir) =>
      Dedup.semanticDedup(emb(s, dir), "vec_id", "vec",
        dim = probeVec(s, dir).length, k = 8, minCos = 0.99))
  )

  private val toksSql = "string_split_regex(trim(text), '\\s+')"
  private val stopList = TextAnalysis.Stopwords.map(w => s"'$w'").mkString(", ")

  /** `extra` passes additional documents columns through both nesting
    * levels (e.g. ", text, source" for corpus_profile) — a consumer
    * can then profile per-row WITHOUT re-joining on doc_id, which
    * would silently drop NULL ids and k-plicate duplicate ids (the
    * adversarial-id divergence class of the SURVEY audit table). */
  private def langIdSqlWith(extra: String): String = {
    val inner = extra.replace(", text", "")
    s"""SELECT doc_id$extra,
               CASE WHEN regexp_matches(text, '[\\x{4e00}-\\x{9fff}]') THEN 'zh'
                    WHEN s_de = m AND m > 0 THEN 'de'
                    WHEN s_en = m AND m > 0 THEN 'en'
                    WHEN s_es = m AND m > 0 THEN 'es'
                    WHEN s_fr = m AND m > 0 THEN 'fr'
                    ELSE 'und' END AS pred_lang
        FROM (
          SELECT doc_id, text$inner,
                 len(list_filter(lt, x -> x IN ('der','die','das','und','ist','nicht'))) AS s_de,
                 len(list_filter(lt, x -> x IN ('the','and','of','to','a','in'))) AS s_en,
                 len(list_filter(lt, x -> x IN ('el','los','y','que','por','una'))) AS s_es,
                 len(list_filter(lt, x -> x IN ('le','les','et','une','est','pas'))) AS s_fr,
                 greatest(
                   len(list_filter(lt, x -> x IN ('der','die','das','und','ist','nicht'))),
                   len(list_filter(lt, x -> x IN ('the','and','of','to','a','in'))),
                   len(list_filter(lt, x -> x IN ('el','los','y','que','por','una'))),
                   len(list_filter(lt, x -> x IN ('le','les','et','une','est','pas')))) AS m
          FROM (SELECT doc_id, text$inner,
                       string_split_regex(lower(trim(text)), '\\s+') AS lt
                FROM documents) x) t"""
  }

  /** DuckDB SELECT producing (doc_id, pred_lang) — ONE definition shared
    * by every language-gated oracle so the heuristic cannot drift
    * between them. */
  private val langIdSql: String = langIdSqlWith("")

  // the indexed serving path returns the same rows as the online path
  // (shared scorer + fusion code), so it shares the same oracle.
  // lazy: baseOracle is declared below (vals initialize in order)
  lazy val oracle: Map[String, String] =
    baseOracle + ("sim_hybrid_indexed" -> baseOracle("sim_hybrid"))

  private val baseOracle: Map[String, String] = Map(
    // the frame fan-out is pure integer arithmetic over utf8 byte
    // lengths — fully SQL-replicable, no reason to stay rows-only
    "mm_frames" ->
      """WITH d AS (SELECT doc_id, octet_length(encode(text)) AS nb FROM documents
                    WHERE octet_length(encode(text)) > 0),
              f AS (SELECT doc_id, unnest(range(0, (nb - 1) // 64 + 1)) AS frame_idx, nb
                    FROM d)
         SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
                CAST(least(64, nb - frame_idx * 64) AS INT) AS frame_bytes
         FROM f WHERE frame_idx % 2 = 0""",
    "dedup_exact" ->
      """SELECT min(doc_id) AS doc_id,
                md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS text_hash
         FROM documents GROUP BY 2""",
    // Bloom prune + exact verify == plain anti-join (no false
    // negatives; false positives re-verified), so the oracle is the
    // declarative form. NOT EXISTS, deliberately NOT `NOT IN`: a
    // single NULL corpus hash would make NOT IN return ZERO rows
    // while Spark's left_anti keeps non-matching rows — NOT EXISTS
    // matches left_anti's null semantics exactly (divergence table)
    "dedup_incremental" ->
      """WITH nh AS (SELECT doc_id,
                            md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS text_hash
                     FROM documents WHERE source <> 'src0'),
              ch AS (SELECT DISTINCT
                            md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS text_hash
                     FROM documents WHERE source = 'src0')
         SELECT min(doc_id) AS doc_id, text_hash
         FROM nh WHERE NOT EXISTS
           (SELECT 1 FROM ch WHERE ch.text_hash = nh.text_hash)
         GROUP BY text_hash""",
    // the FULL MinHash+LSH pipeline, value-for-value: Kirsch-
    // Mitzenmacher signatures from the two md5 halves (HUGEINT mod-2^64
    // wraparound folded back to the signed BIGINT bit pattern, signed
    // min — exactly MinHashSigs' Java arithmetic), identical-signature
    // star pairs, then LSH banding. The Spark side buckets by
    // xxhash64(band slice) but the bucket key never reaches the output:
    // grouping by the SLICE VALUES here is the same partition (a hash
    // collision merging two buckets has probability ~2^-64 and would
    // only add a candidate the est-Jaccard verify re-checks anyway).
    // est_jac = agreeing-positions/64 is dyadic — FP-exact both engines.
    "dedup_minhash" ->
      s"""WITH tok AS (SELECT doc_id, unnest(list_distinct($toksSql)) AS tok
                       FROM documents),
              hp AS (SELECT doc_id,
                            ('0x' || substr(md5(tok), 1, 16))::UBIGINT::HUGEINT AS h1,
                            ('0x' || substr(md5(tok), 17, 16))::UBIGINT::HUGEINT AS h2
                     FROM tok),
              hx AS (SELECT doc_id, i,
                            (h1 + i * h2) % 18446744073709551616::HUGEINT AS w
                     FROM hp, (SELECT unnest(range(64)) AS i) ii),
              hs AS (SELECT doc_id, i,
                            CAST(CASE WHEN w >= 9223372036854775808::HUGEINT
                                      THEN w - 18446744073709551616::HUGEINT
                                      ELSE w END AS BIGINT) AS v
                     FROM hx),
              sigs AS (SELECT doc_id, list(mv ORDER BY i) AS sig
                       FROM (SELECT doc_id, i, min(v) AS mv FROM hs GROUP BY 1, 2)
                       GROUP BY 1),
              grp AS (SELECT sig, min(doc_id) AS rep FROM sigs GROUP BY 1),
              identical AS (SELECT g.rep AS a, s.doc_id AS b, 1.0 AS est_jac
                            FROM sigs s JOIN grp g ON s.sig = g.sig
                            WHERE s.doc_id > g.rep),
              banded AS (SELECT g.rep AS doc_id, bs.band,
                                g.sig[bs.band * 4 + 1 : bs.band * 4 + 4] AS key
                         FROM grp g, (SELECT unnest(range(16)) AS band) bs),
              bucketrep AS (SELECT band, key, min(doc_id) AS a
                            FROM banded GROUP BY 1, 2),
              cands AS (SELECT DISTINCT br.a, bd.doc_id AS b
                        FROM banded bd JOIN bucketrep br
                          ON bd.band = br.band AND bd.key = br.key
                        WHERE bd.doc_id > br.a),
              near AS (SELECT a, b, est_jac FROM (
                         SELECT c.a, c.b,
                                len(list_filter(range(1, 65),
                                    j -> sa.sig[j] = sb.sig[j])) / 64.0 AS est_jac
                         FROM cands c JOIN sigs sa ON sa.doc_id = c.a
                                      JOIN sigs sb ON sb.doc_id = c.b) t
                       WHERE est_jac >= 0.8)
         SELECT a, b, est_jac FROM identical
         UNION ALL SELECT a, b, est_jac FROM near""",
    "dedup_ngram" ->
      s"""WITH t AS (SELECT doc_id, list_distinct($toksSql) AS s FROM documents)
          SELECT a.doc_id AS a, b.doc_id AS b,
                 round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                       / len(list_distinct(list_concat(a.s, b.s))), 6) AS jac
          FROM t a JOIN t b ON a.doc_id < b.doc_id
          WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                / len(list_distinct(list_concat(a.s, b.s))) >= 0.8""",
    // same blocking key, block cap, comparison prefix, and rounded
    // boundary as editDedup — deterministic end to end
    "dedup_edit" ->
      """WITH d AS (SELECT doc_id, substr(text, 1, 16) AS pfx,
                           CAST(floor(length(text) / 64) AS BIGINT) AS band,
                           substr(text, 1, 256) AS cmp
                    FROM documents),
              sized AS (SELECT *, count(*) OVER (PARTITION BY pfx, band) AS bc
                        FROM d),
              blk AS (SELECT * FROM sized WHERE bc <= 256),
              pairs AS (
                SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                       levenshtein(a.cmp, b.cmp) AS lev,
                       greatest(length(a.cmp), length(b.cmp)) AS mx
                FROM blk a JOIN blk b
                  ON a.pfx = b.pfx AND a.band = b.band
                 AND a.doc_id < b.doc_id)
         SELECT doc_a, doc_b, lev,
                round(1.0 - CAST(lev AS DOUBLE) / mx, 6) AS edit_sim
         FROM pairs
         WHERE round(1.0 - CAST(lev AS DOUBLE) / mx, 6) >= 0.8""",
    // the FULL simhash near-dup pipeline, value-for-value: md5-derived
    // 64-bit token hash (bit pattern of the first 16 md5 hex digits —
    // UBIGINT here, assembled big-endian byte-wise in HashUtil), per-bit
    // ±1 votes, sign → signature (HUGEINT sum folded back to the signed
    // BIGINT bit pattern), identical-signature star pairs, 16-bit
    // pigeonhole blocks over reps, bucket-min-rep candidates, hamming
    // verify at <= 8. Arithmetic-vs-logical shift on negative sigs is
    // immaterial: every extracted field is masked (& 65535, & 1).
    "dedup_simhash" ->
      s"""WITH tok AS (SELECT doc_id, unnest(list_distinct($toksSql)) AS tok
                       FROM documents),
              hv AS (SELECT doc_id, ('0x' || substr(md5(tok), 1, 16))::UBIGINT AS h
                     FROM tok),
              bits AS (SELECT doc_id, b,
                              sum(CASE WHEN ((h >> b) & 1) = 1 THEN 1 ELSE -1 END) AS vote
                       FROM hv, (SELECT unnest(range(64)) AS b) bs GROUP BY 1, 2),
              raw AS (SELECT doc_id,
                             sum(CASE WHEN vote > 0
                                      THEN (CAST(1 AS UBIGINT) << b)::HUGEINT
                                      ELSE 0 END) AS s
                      FROM bits GROUP BY 1),
              sigs AS (SELECT doc_id,
                              CAST(CASE WHEN s >= 9223372036854775808::HUGEINT
                                        THEN s - 18446744073709551616::HUGEINT
                                        ELSE s END AS BIGINT) AS simhash
                       FROM raw),
              grp AS (SELECT simhash, min(doc_id) AS rep FROM sigs GROUP BY 1),
              identical AS (SELECT g.rep AS a, s.doc_id AS b, 0::INT AS hamming
                            FROM sigs s JOIN grp g USING (simhash)
                            WHERE s.doc_id > g.rep),
              blocked AS (SELECT g.rep AS doc_id, bs.blk,
                                 (g.simhash >> (bs.blk * 16)) & 65535 AS blkval
                          FROM grp g, (SELECT unnest(range(4)) AS blk) bs),
              bucketrep AS (SELECT blk, blkval, min(doc_id) AS a
                            FROM blocked GROUP BY 1, 2),
              cands AS (SELECT DISTINCT br.a, bl.doc_id AS b
                        FROM blocked bl JOIN bucketrep br USING (blk, blkval)
                        WHERE bl.doc_id > br.a),
              near AS (SELECT c.a, c.b,
                              bit_count(xor(sa.simhash, sb.simhash))::INT AS hamming
                       FROM cands c JOIN sigs sa ON sa.doc_id = c.a
                                    JOIN sigs sb ON sb.doc_id = c.b
                       WHERE bit_count(xor(sa.simhash, sb.simhash)) <= 8)
         SELECT a, b, hamming FROM identical
         UNION ALL SELECT a, b, hamming FROM near""",
    "sim_topk" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
              p AS (SELECT v AS pv FROM e WHERE vec_id = 0)
         SELECT vec_id AS id, round(list_cosine_similarity(v, pv), 6) AS cos
         FROM e, p WHERE vec_id <> 0
         ORDER BY cos DESC, id LIMIT 10""",
    "sim_range" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
              p AS (SELECT v AS pv FROM e WHERE vec_id = 0)
         SELECT vec_id AS id, round(list_cosine_similarity(v, pv), 6) AS cos
         FROM e, p WHERE vec_id <> 0
           AND round(list_cosine_similarity(v, pv), 6) >= 0.2""",
    "text_tokens" ->
      s"""SELECT doc_id, len($toksSql) AS ws_tokens,
                 len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS re_tokens
          FROM documents""",
    // same ln(n) - Σk·ln(k)/n shape as the native expression (not the
    // algebraically-equal -Σp·ln(p)) so both engines sum the same
    // float terms; keep compares the rounded value on both sides
    "text_entropy" ->
      """WITH ch AS (SELECT doc_id, unnest(string_split(text, '')) AS c
                     FROM documents),
              cnt AS (SELECT doc_id, c, count(*) AS k FROM ch GROUP BY 1, 2),
              tot AS (SELECT doc_id, CAST(sum(k) AS BIGINT) AS n
                      FROM cnt GROUP BY 1)
         SELECT doc_id,
                round(ln(n) - sum(k * ln(k)) / n, 6) AS char_entropy,
                (round(ln(n) - sum(k * ln(k)) / n, 6) >= 2.6) AS keep
         FROM cnt JOIN tot USING (doc_id)
         GROUP BY doc_id, n""",
    "text_quality" ->
      s"""SELECT doc_id, n_chars, n_tokens, punct_ratio, stop_ratio, mean_word_len,
                 least(n_tokens / 100.0, 1.0) * 0.5 + stop_ratio * 0.3
                   + (1.0 - least(punct_ratio * 5.0, 1.0)) * 0.2 AS quality_score
          FROM (
            SELECT doc_id,
                   CAST(length(text) AS DOUBLE) AS n_chars,
                   CAST(len($toksSql) AS DOUBLE) AS n_tokens,
                   CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9\\s]')) AS DOUBLE)
                     / CAST(length(text) AS DOUBLE) AS punct_ratio,
                   CAST(len(list_filter($toksSql, x -> x IN ($stopList))) AS DOUBLE)
                     / CAST(len($toksSql) AS DOUBLE) AS stop_ratio,
                   CAST(length(text) AS DOUBLE)
                     / CAST(len($toksSql) AS DOUBLE) AS mean_word_len
            FROM documents) t""",
    // same score expression as text_quality; token sums CAST to
    // BIGINT (integer-valued, exact), rate from the same division
    "text_gate_sweep" ->
      s"""WITH q AS (
            SELECT least(n_tokens / 100.0, 1.0) * 0.5 + stop_ratio * 0.3
                     + (1.0 - least(punct_ratio * 5.0, 1.0)) * 0.2 AS s,
                   n_tokens AS nt
            FROM (
              SELECT CAST(len($toksSql) AS DOUBLE) AS n_tokens,
                     CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9\\s]')) AS DOUBLE)
                       / CAST(length(text) AS DOUBLE) AS punct_ratio,
                     CAST(len(list_filter($toksSql, x -> x IN ($stopList))) AS DOUBLE)
                       / CAST(len($toksSql) AS DOUBLE) AS stop_ratio
              FROM documents) t),
          thr AS (SELECT CAST(unnest([0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9])
                    AS DOUBLE) AS threshold)
         SELECT threshold,
                CAST(SUM(CASE WHEN s >= threshold THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_keep,
                count(*) AS n_total,
                round(CAST(SUM(CASE WHEN s >= threshold THEN 1 ELSE 0 END) AS BIGINT)
                      / CAST(count(*) AS DOUBLE), 6) AS keep_rate,
                CAST(SUM(CASE WHEN s >= threshold THEN nt ELSE 0 END) AS BIGINT)
                  AS tokens_kept
         FROM q CROSS JOIN thr
         GROUP BY threshold""",
    "text_langid" -> langIdSql,
    "pipeline_e2e" ->
      s"""WITH lang AS ($langIdSql),
          qual AS (
            SELECT doc_id, n_tokens,
                   least(n_tokens / 100.0, 1.0) * 0.5 + stop_ratio * 0.3
                     + (1.0 - least(punct_ratio * 5.0, 1.0)) * 0.2 AS quality_score
            FROM (
              SELECT doc_id,
                     CAST(len($toksSql) AS DOUBLE) AS n_tokens,
                     CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9\\s]')) AS DOUBLE)
                       / CAST(length(text) AS DOUBLE) AS punct_ratio,
                     CAST(len(list_filter($toksSql, x -> x IN ($stopList))) AS DOUBLE)
                       / CAST(len($toksSql) AS DOUBLE) AS stop_ratio
              FROM documents) t),
          surv AS (SELECT min(doc_id) AS doc_id
                   FROM documents
                   GROUP BY md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')))
          SELECT doc_id, n_tokens, round(quality_score, 6) AS quality_score
          FROM lang JOIN qual USING (doc_id) JOIN surv USING (doc_id)
          WHERE pred_lang = 'en' AND quality_score >= 0.5""",
    // Same A-ES keys as the Spark side: u from md5(doc_id), key
    // ln(u)/w. The output carries no float (ids + integer weights),
    // so FP only orders — and the hash-derived keys are spread far
    // beyond ln()'s ulp, so the k-boundary is engine-stable.
    "sample_weighted" ->
      """WITH k AS (SELECT doc_id, n_chars,
                ((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT)::DOUBLE
                 + 0.5) / 4294967296.0 AS u
         FROM documents)
         SELECT doc_id, n_chars AS weight FROM k
         ORDER BY ln(u) / CAST(n_chars AS DOUBLE) DESC, doc_id LIMIT 40""",
    "text_bpe_pairs" ->
      """WITH words AS (SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS word
                        FROM documents),
              wf AS (SELECT word, COUNT(*) AS f FROM words
                     WHERE length(word) >= 2 GROUP BY 1),
              pe AS (SELECT word, f, unnest(range(1, length(word))) AS i FROM wf)
         SELECT substr(word, CAST(i AS INT), 2) AS pair, CAST(SUM(f) AS BIGINT) AS n
         FROM pe GROUP BY 1 ORDER BY n DESC, pair LIMIT 100""",
    // PMI computed in DOUBLE with the exact expression shape the Spark
    // side uses (cast-first, left-assoc products) → bit-identical
    // before round(6); (pmi, w1, w2) is a total order so the LIMIT
    // picks the same set
    "text_collocations" ->
      """WITH tk AS (SELECT string_split_regex(lower(trim(text)), '\s+') AS tk
                     FROM documents),
              uni AS (SELECT unnest(tk) AS w FROM tk),
              cw AS (SELECT w, COUNT(*) AS cw FROM uni GROUP BY 1),
              tot AS (SELECT COUNT(*) AS ntok FROM uni),
              pe AS (SELECT tk, unnest(range(1, len(tk))) AS i FROM tk
                     WHERE len(tk) >= 2),
              pairs AS (SELECT tk[CAST(i AS INT)] AS w1,
                               tk[CAST(i AS INT) + 1] AS w2 FROM pe),
              big AS (SELECT w1, w2, COUNT(*) AS cxy FROM pairs GROUP BY 1, 2),
              nb AS (SELECT COUNT(*) AS nbig FROM pairs)
         SELECT w1, w2, cxy,
                round(ln((CAST(cxy AS DOUBLE) * ntok * ntok)
                         / (CAST(nbig AS DOUBLE) * c1.cw * c2.cw)), 6) AS pmi
         FROM big JOIN cw c1 ON big.w1 = c1.w JOIN cw c2 ON big.w2 = c2.w, tot, nb
         WHERE cxy >= 5
         ORDER BY pmi DESC, w1, w2 LIMIT 50""",
    // sqrt is IEEE-correctly-rounded (identical in both engines); the
    // normalizing sum is a double over |sources| rows — ulp noise ~10
    // orders below the rounded surface
    "sample_temperature" ->
      """WITH per AS (SELECT source, COUNT(*) AS n_docs,
                 CAST(SUM(len(regexp_extract_all(lower(text),
                   '[a-z]+|[0-9]+|[^a-z0-9\s]'))) AS BIGINT) AS tokens
               FROM documents GROUP BY 1),
              tot AS (SELECT CAST(SUM(tokens) AS BIGINT) AS tt FROM per),
              sc AS (SELECT source, n_docs, tokens,
                            CAST(tokens AS DOUBLE) / tt AS p,
                            sqrt(CAST(tokens AS DOUBLE) / tt) AS sq
                     FROM per, tot),
              nrm AS (SELECT SUM(sq) AS s FROM sc)
         SELECT source, n_docs, tokens, round(p, 6) AS p,
                round(sq / s, 6) AS w,
                CAST(round(sq / s * 1000000) AS BIGINT) AS alloc_tokens
         FROM sc, nrm""",
    "sample_stratified" ->
      s"""WITH lang AS ($langIdSql)
          SELECT doc_id, pred_lang FROM (
            SELECT doc_id, pred_lang,
                   row_number() OVER (PARTITION BY pred_lang
                                      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
            FROM lang) r
          WHERE rn <= 20""",
    "text_redact" ->
      """SELECT doc_id, clean_text, clean_text <> text AS had_pii
         FROM (
           SELECT doc_id, text,
                  regexp_replace(
                    regexp_replace(
                      regexp_replace(text,
                        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
                      '\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b', '[SSN]', 'g'),
                    '\b[0-9]{7,}\b', '[NUMBER]', 'g') AS clean_text
           FROM documents) t""",
    "text_chunk" ->
      """WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
                    FROM documents),
              w AS (SELECT doc_id, toks,
                           unnest(range(0, CAST(floor((len(toks) - 1) / 48.0) AS BIGINT) + 1)) AS i
                    FROM t)
         SELECT doc_id, i AS chunk_idx,
                len(toks[(i*48 + 1):(i*48 + 64)]) AS n_tokens,
                array_to_string(toks[(i*48 + 1):(i*48 + 64)], ' ') AS chunk_text
         FROM w WHERE len(toks[(i*48 + 1):(i*48 + 64)]) > 0""",
    // sigmoid of a length-normalized hashed-BoW dot product; weights
    // md5-derived with the exact expression shape Spark uses
    "text_quality_model" ->
      """WITH hv AS (SELECT doc_id,
                            ('0x' || substr(md5(tok), 1, 8))::BIGINT % 64 AS dim,
                            count(*) AS cnt
                     FROM (SELECT doc_id,
                                  unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok
                           FROM documents) t
                     GROUP BY 1, 2),
              sc AS (SELECT doc_id,
                            SUM(cnt * ((('0x' || substr(md5(CAST(dim AS VARCHAR)), 1, 8))::UBIGINT::DOUBLE
                                        / 4294967296.0) * 2.0 - 1.0))
                            / SUM(cnt) AS raw
                     FROM hv GROUP BY 1)
         SELECT doc_id, round(1.0 / (1.0 + exp(-raw)), 6) AS model_score,
                round(1.0 / (1.0 + exp(-raw)), 6) >= 0.5 AS keep
         FROM sc""",
    "text_hashvec" ->
      """SELECT doc_id,
                ('0x' || substr(md5(tok), 1, 8))::BIGINT % 64 AS dim,
                count(*) AS cnt
         FROM (SELECT doc_id,
                      unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok
               FROM documents) t
         GROUP BY 1, 2""",
    // the text_embed dense vectors re-assembled as lists; cosine via
    // list_cosine_similarity (the sim_topk-certified parity surface);
    // both rankings order by the ROUNDED cos then id, and margin /
    // mined ride the rounded values — the shared boundary discipline
    "train_bitext" ->
      """WITH tok AS (SELECT doc_id,
                             unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok
                      FROM documents),
              cnt AS (SELECT doc_id,
                             ('0x' || substr(md5(tok), 1, 8))::BIGINT % 64 AS dim,
                             CAST(count(*) AS DOUBLE) AS val
                      FROM tok GROUP BY 1, 2),
              dims AS (SELECT unnest(range(64)) AS dim),
              dense AS (SELECT d.doc_id, dims.dim, coalesce(cnt.val, 0.0) AS val
                        FROM (SELECT DISTINCT doc_id FROM documents) d
                        CROSS JOIN dims
                        LEFT JOIN cnt ON cnt.doc_id = d.doc_id AND cnt.dim = dims.dim),
              emb AS (SELECT doc_id, list(val ORDER BY dim) AS v
                      FROM dense GROUP BY 1),
              base AS (SELECT e.doc_id, v, lang
                       FROM emb e JOIN documents d ON d.doc_id = e.doc_id
                       WHERE len(list_filter(v, z -> z <> 0)) > 0),
              x AS (SELECT * FROM base WHERE lang = 'en'),
              y AS (SELECT * FROM base WHERE lang <> 'en'),
              scored AS (SELECT x.doc_id AS src_id, y.doc_id AS tgt_id,
                                y.lang AS tgt_lang,
                                round(list_cosine_similarity(x.v, y.v), 6) AS cos
                         FROM x CROSS JOIN y),
              fwd AS (SELECT *, row_number() OVER (PARTITION BY src_id
                                ORDER BY cos DESC, tgt_id) AS rf FROM scored),
              ax AS (SELECT src_id, avg(cos) AS avg_x FROM fwd
                     WHERE rf <= 4 GROUP BY 1),
              ay AS (SELECT tgt_id, avg(cos) AS avg_y
                     FROM (SELECT *, row_number() OVER (PARTITION BY tgt_id
                                     ORDER BY cos DESC, src_id) AS rb FROM scored) b
                     WHERE rb <= 4 GROUP BY 1),
              best AS (SELECT src_id, tgt_id, tgt_lang, cos FROM fwd WHERE rf = 1)
         SELECT best.src_id, best.tgt_id, best.tgt_lang, best.cos,
                round(best.cos / ((avg_x + avg_y) / 2), 6) AS margin,
                (round(best.cos / ((avg_x + avg_y) / 2), 6) >= 1.05) AS mined
         FROM best JOIN ax USING (src_id) JOIN ay USING (tgt_id)""",
    // dense embedding = text_hashvec's sparse counts scattered over a
    // fixed 0..63 dim range (zeros explicit); same hash, same tokenizer
    "text_embed" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok
                      FROM documents),
              cnt AS (SELECT doc_id,
                        ('0x' || substr(md5(tok), 1, 8))::BIGINT % 64 AS dim,
                        CAST(count(*) AS DOUBLE) AS val
                      FROM tok GROUP BY 1, 2),
              dims AS (SELECT unnest(range(64)) AS dim)
         SELECT d.doc_id, dims.dim, coalesce(cnt.val, 0.0) AS val
         FROM (SELECT DISTINCT doc_id FROM documents) d
         CROSS JOIN dims
         LEFT JOIN cnt ON cnt.doc_id = d.doc_id AND cnt.dim = dims.dim""",
    "text_tfidf" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok
                      FROM documents),
              tf AS (SELECT doc_id, tok, count(*) AS tf FROM tok GROUP BY 1, 2),
              df AS (SELECT tok, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
              n AS (SELECT count(*) AS n FROM documents),
              scored AS (SELECT doc_id, tok, tf * ln((n + 1.0) / (df + 1.0)) AS score
                         FROM tf JOIN df USING (tok), n)
         SELECT doc_id, tok, round(score, 6) AS score FROM (
           SELECT *, row_number() OVER (PARTITION BY doc_id
                                        ORDER BY score DESC, tok) AS rn
           FROM scored) t
         WHERE rn <= 3""",
    // winnowing, value-for-value: outer list ranges over window starts
    // (Spark sequence(0, n) inclusive == range(0, n+1)), inner over the
    // w gram positions; gram hash is the shared md5-derived 60-bit int
    // (divergence table: no xxhash64/engine-private hash in anything
    // oracle-checked). list_distinct before unnest == array_distinct.
    "text_winnow" ->
      """SELECT doc_id, unnest(list_distinct(
                  list_transform(range(0, greatest(length(text) - 8, 0) + 1),
                    j -> list_min(list_transform(range(j + 1, j + 5),
                           i -> ('0x' || substr(md5(substr(text, i, 5)), 1, 15))::BIGINT))))) AS fp
         FROM documents""",
    "text_fingerprint" ->
      """SELECT doc_id,
                md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
                ('0x' || substr(md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')), 1, 6))::BIGINT AS fp_bucket
         FROM documents""",
    "text_decontam" ->
      """WITH toks AS (SELECT doc_id, source,
                              string_split_regex(lower(trim(text)), '\s+') AS t
                       FROM documents),
              sh AS (SELECT DISTINCT doc_id, source,
                            md5(array_to_string(t[(i+1):(i+8)], ' ')) AS sh
                     FROM (SELECT doc_id, source, t,
                                  unnest(range(0, len(t) - 8 + 1)) AS i
                           FROM toks WHERE len(t) >= 8) x),
              ev AS (SELECT DISTINCT sh FROM sh WHERE source = 'src0')
         SELECT s.doc_id, count(*) AS n_contaminated
         FROM sh s JOIN ev USING (sh)
         WHERE s.source <> 'src0'
         GROUP BY 1""",
    // the Bloom path's exact-verify join makes its output identical to
    // text_decontam (no false negatives; false positives re-verified),
    // so the oracle is the same query
    "text_decontam_bloom" ->
      """WITH toks AS (SELECT doc_id, source,
                              string_split_regex(lower(trim(text)), '\s+') AS t
                       FROM documents),
              sh AS (SELECT DISTINCT doc_id, source,
                            md5(array_to_string(t[(i+1):(i+8)], ' ')) AS sh
                     FROM (SELECT doc_id, source, t,
                                  unnest(range(0, len(t) - 8 + 1)) AS i
                           FROM toks WHERE len(t) >= 8) x),
              ev AS (SELECT DISTINCT sh FROM sh WHERE source = 'src0')
         SELECT s.doc_id, count(*) AS n_contaminated
         FROM sh s JOIN ev USING (sh)
         WHERE s.source <> 'src0'
         GROUP BY 1""",
    // ROLLUP null-label semantics match Spark's rollup(); the token sum
    // is integer (DuckDB SUM(BIGINT)→HUGEINT cast back — divergence
    // table); the two double means are round(6) on n·ε-bounded avgs.
    // The quality formula is textually the text_quality oracle's.
    // lang passes text/source THROUGH (langIdSqlWith) instead of
    // re-joining documents on doc_id — a join would drop NULL ids and
    // k-plicate duplicate ids where the Spark operator (join-free,
    // plan-pinned) does neither.
    "corpus_profile" ->
      s"""WITH lang AS (${langIdSqlWith(", text, source")}),
              m AS (
            SELECT source, pred_lang,
                   len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]'))
                     AS n_toks,
                   least(CAST(len($toksSql) AS DOUBLE) / 100.0, 1.0) * 0.5
                     + (CAST(len(list_filter($toksSql, x -> x IN ($stopList))) AS DOUBLE)
                        / CAST(len($toksSql) AS DOUBLE)) * 0.3
                     + (1.0 - least((CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9\\s]')) AS DOUBLE)
                        / CAST(length(text) AS DOUBLE)) * 5.0, 1.0)) * 0.2
                     AS q,
                   CAST(regexp_matches(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')
                     OR regexp_matches(text, '\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b')
                     OR regexp_matches(text, '\\b[0-9]{7,}\\b') AS INT) AS has_pii
            FROM lang)
          SELECT coalesce(source, '<all>') AS source,
                 coalesce(pred_lang, '<all>') AS pred_lang,
                 count(*) AS n_docs,
                 CAST(sum(n_toks) AS BIGINT) AS n_tokens,
                 round(avg(q), 6) AS avg_quality,
                 round(avg(has_pii), 6) AS pii_frac
          FROM m GROUP BY ROLLUP(source, pred_lang)""",
    // NON-distinct spans with multiplicity: a doc repeating a span that
    // also appears elsewhere counts every occurrence. count(*) keeps
    // every integer BIGINT (no SUM→HUGEINT — SURVEY divergence table);
    // the DOUBLE division is exact-int/exact-int, round(6) on both sides.
    // rows keyed (doc_id, md5(text)) exactly like the operator, so
    // duplicate ids with differing texts never mix coverage; every
    // count stays BIGINT; clean_text is token-normalized identically
    // (lower + single space) in both engines
    "dedup_trim" ->
      """WITH toks AS (SELECT doc_id, md5(coalesce(text, '')) AS rk,
                              string_split_regex(lower(trim(coalesce(text, ''))), '\s+') AS t
                       FROM documents WHERE doc_id IS NOT NULL),
              sp AS (SELECT doc_id, rk, i,
                            md5(array_to_string(t[(i+1):(i+8)], ' ')) AS sh
                     FROM (SELECT doc_id, rk, t,
                                  unnest(range(0, len(t) - 8 + 1)) AS i
                           FROM toks WHERE len(t) >= 8) x),
              g AS (SELECT sh FROM sp GROUP BY sh
                    HAVING min(doc_id) <> max(doc_id)),
              covp AS (SELECT DISTINCT doc_id, rk, p
                       FROM (SELECT doc_id, rk, unnest(range(i, i + 8)) AS p
                             FROM sp JOIN g USING (sh)) y),
              cov AS (SELECT doc_id, rk, list_sort(list(p)) AS cv
                      FROM covp GROUP BY 1, 2)
         SELECT t.doc_id,
                coalesce(array_to_string(list_transform(
                  list_filter(range(0, len(t.t)),
                              j -> NOT list_contains(coalesce(cv, []), j)),
                  j -> t.t[j + 1]), ' '), '') AS clean_text,
                CAST(len(coalesce(cv, [])) AS BIGINT) AS n_removed
         FROM toks t LEFT JOIN cov USING (doc_id, rk)""",
    // doc_id IS NOT NULL mirrors the operator's explicit null-id
    // filter (the stage-reuse precondition) — without it the two
    // engines disagree on a corpus carrying NULL ids
    "dedup_spans" ->
      """WITH toks AS (SELECT doc_id,
                              string_split_regex(lower(trim(text)), '\s+') AS t
                       FROM documents
                       WHERE doc_id IS NOT NULL),
              sp AS (SELECT doc_id,
                            md5(array_to_string(t[(i+1):(i+8)], ' ')) AS sh
                     FROM (SELECT doc_id, t,
                                  unnest(range(0, len(t) - 8 + 1)) AS i
                           FROM toks WHERE len(t) >= 8) x),
              g AS (SELECT sh FROM sp GROUP BY sh
                    HAVING min(doc_id) <> max(doc_id)),
              base AS (SELECT doc_id, count(*) AS n_spans FROM sp GROUP BY 1),
              d AS (SELECT doc_id, count(*) AS dup_spans
                    FROM sp JOIN g USING (sh) GROUP BY 1)
         SELECT b.doc_id, b.n_spans,
                coalesce(d.dup_spans, CAST(0 AS BIGINT)) AS dup_spans,
                round(CAST(coalesce(d.dup_spans, 0) AS DOUBLE) / b.n_spans, 6)
                  AS dup_frac
         FROM base b LEFT JOIN d USING (doc_id)""",
    // DISTINCT shingles (unlike dedup_spans' multiplicity form);
    // count(*) never widens, the division is an exact IEEE quotient in
    // both engines so the threshold filter agrees at the boundary
    "dedup_containment" ->
      """WITH toks AS (SELECT doc_id,
                              string_split_regex(lower(trim(text)), '\s+') AS t
                       FROM documents
                       WHERE doc_id IS NOT NULL),
              sp0 AS (SELECT DISTINCT doc_id,
                            md5(array_to_string(t[(i+1):(i+8)], ' ')) AS sh
                     FROM (SELECT doc_id, t,
                                  unnest(range(0, len(t) - 8 + 1)) AS i
                           FROM toks WHERE len(t) >= 8) x),
              sp AS (SELECT doc_id, sh FROM
                       (SELECT doc_id, sh, count(*) OVER (PARTITION BY sh) AS df
                        FROM sp0) d
                     WHERE df <= 256),
              szs AS (SELECT doc_id, count(*) AS n_sh FROM sp GROUP BY 1),
              inter AS (SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS inter
                        FROM sp x JOIN sp y
                          ON x.sh = y.sh AND x.doc_id <> y.doc_id
                        GROUP BY 1, 2)
         SELECT a, b, inter, n_sh,
                round(CAST(inter AS DOUBLE) / n_sh, 6) AS containment
         FROM inter JOIN szs ON szs.doc_id = a
         WHERE CAST(inter AS DOUBLE) / n_sh >= 0.5""",
    "text_boilerplate" ->
      """WITH toks AS (SELECT doc_id,
                              string_split_regex(lower(trim(text)), '\s+') AS t
                       FROM documents
                       WHERE doc_id IS NOT NULL),
              sp AS (SELECT DISTINCT doc_id,
                            md5(array_to_string(t[(i+1):(i+8)], ' ')) AS sh
                     FROM (SELECT doc_id, t,
                                  unnest(range(0, len(t) - 8 + 1)) AS i
                           FROM toks WHERE len(t) >= 8) x)
         SELECT sh, df, example_doc FROM
           (SELECT sh, count(*) AS df, min(doc_id) AS example_doc
            FROM sp GROUP BY 1) d
         WHERE df >= 2
         ORDER BY df DESC, sh ASC
         LIMIT 100""",
    "text_src_overlap" ->
      """WITH toks AS (SELECT source,
                              string_split_regex(lower(trim(text)), '\s+') AS t
                       FROM documents
                       WHERE source IS NOT NULL),
              sh0 AS (SELECT DISTINCT source,
                            md5(array_to_string(t[(i+1):(i+8)], ' ')) AS sh
                     FROM (SELECT source, t,
                                  unnest(range(0, len(t) - 8 + 1)) AS i
                           FROM toks WHERE len(t) >= 8) x),
              sh AS (SELECT source, sh FROM
                       (SELECT source, sh, count(*) OVER (PARTITION BY sh) AS df
                        FROM sh0) d
                     WHERE df <= 256),
              tot AS (SELECT source, count(*) AS n_sh FROM sh GROUP BY 1),
              pairs AS (SELECT a.source AS source_a, b.source AS source_b,
                               count(*) AS shared
                        FROM sh a JOIN sh b
                          ON a.sh = b.sh AND a.source < b.source
                        GROUP BY 1, 2)
         SELECT source_a, source_b, shared,
                round(CAST(shared AS DOUBLE) / (ta.n_sh + tb.n_sh - shared), 6)
                  AS jaccard
         FROM pairs
         JOIN tot ta ON ta.source = source_a
         JOIN tot tb ON tb.source = source_b""",
    // ('0x'||hex8)::BIGINT is always non-negative (< 2^32), so DuckDB's
    // sign-preserving % equals Spark's pmod here (same idiom as
    // text_hashvec — SURVEY divergence table, pmod-vs-% class)
    "sample_split" ->
      """SELECT doc_id, split_bucket,
                CASE WHEN split_bucket < 9000 THEN 'train'
                     WHEN split_bucket < 9500 THEN 'val'
                     ELSE 'test' END AS split
         FROM (SELECT doc_id,
                      ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                        % 10000 AS split_bucket
               FROM documents) t""",
    // shard from md5(doc_id) hex8 is non-negative → % == pmod (same
    // idiom as sample_split); token sum cast back from HUGEINT; the
    // 15-hex-char hash prefix stays under 2^60 so bit_xor agrees on
    // BIGINT in both engines
    "export_manifest" ->
      """WITH d AS (SELECT
                ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                  % 64 AS shard,
                len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS n_toks,
                ('0x' || substr(md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')), 1, 15))::BIGINT AS h
              FROM documents)
         SELECT shard, count(*) AS n_docs,
                CAST(sum(n_toks) AS BIGINT) AS n_tokens,
                bit_xor(h) AS content_sig
         FROM d GROUP BY shard""",
    "text_repetition" ->
      """SELECT doc_id,
                round(1.0 - CAST(len(list_distinct(t)) AS DOUBLE) / len(t), 6)
                  AS dup_token_frac,
                round(CASE WHEN len(t) >= 2 THEN
                        CAST(list_max(list_transform(list_distinct(bg),
                               x -> len(list_filter(bg, y -> y = x)))) AS DOUBLE)
                          / len(bg)
                      ELSE 0.0 END, 6) AS top_bigram_frac
         FROM (SELECT doc_id, t,
                      list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1]) AS bg
               FROM (SELECT doc_id,
                            string_split_regex(lower(trim(text)), '\s+') AS t
                     FROM documents) x) y""",
    "dedup_clusters" ->
      """WITH RECURSIVE
         t AS (SELECT doc_id, list_distinct(string_split_regex(trim(text), '\s+')) AS s
               FROM documents WHERE doc_id % 5 = 0),
         pairs AS (SELECT a.doc_id AS a, b.doc_id AS b
                   FROM t a JOIN t b ON a.doc_id < b.doc_id
                   WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                         / len(list_distinct(list_concat(a.s, b.s))) >= 0.8),
         edges AS (SELECT a, b FROM pairs UNION ALL SELECT b, a FROM pairs),
         reach(node, r) AS (
           SELECT a AS node, a AS r FROM edges
           UNION
           SELECT e.a AS node, reach.r AS r
           FROM edges e JOIN reach ON e.b = reach.node)
         SELECT node AS doc_id, min(r) AS cluster
         FROM reach GROUP BY node""",
    "text_logprob" ->
      """WITH tok AS (SELECT doc_id,
                             unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok
                      FROM documents),
              cnt AS (SELECT tok, count(*) AS cnt FROM tok GROUP BY 1),
              tot AS (SELECT count(*) AS total FROM tok)
         SELECT doc_id, round(avg(ln(cnt / total)), 6) AS mean_logprob
         FROM tok JOIN cnt USING (tok), tot
         GROUP BY 1""",
    "text_bigram_lm" ->
      """WITH t AS (SELECT doc_id,
                           string_split_regex(lower(trim(text)), '\s+') AS tk
                    FROM documents),
              bi AS (SELECT doc_id, tk[i] AS v, tk[i + 1] AS w
                     FROM (SELECT doc_id, tk, unnest(range(1, len(tk))) AS i
                           FROM t WHERE len(tk) >= 2) x),
              cnt AS (SELECT v, w, count(*) AS c_vw FROM bi GROUP BY 1, 2),
              ctx AS (SELECT v, CAST(sum(c_vw) AS BIGINT) AS c_v FROM cnt GROUP BY 1),
              vocab AS (SELECT count(DISTINCT tok) AS vsz
                        FROM (SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok
                              FROM documents) u)
         SELECT doc_id,
                round(avg(ln((c_vw + 1.0) / (c_v + vsz))), 6) AS mean_bigram_logprob
         FROM bi JOIN cnt USING (v, w) JOIN ctx USING (v), vocab
         GROUP BY 1""",
    // Stupid-Backoff trigram scoring: counts from the src0-3 train
    // split; CASE arms mirror the Spark when-chain exactly (c3 present
    // implies its (u,v) context was counted, so no division by NULL)
    "text_trigram_lm" ->
      """WITH t AS (SELECT doc_id, source,
                           string_split_regex(lower(trim(text)), '\s+') AS tk
                    FROM documents),
              pos AS (SELECT doc_id, tk[i] AS u, tk[i + 1] AS v, tk[i + 2] AS w
                      FROM (SELECT doc_id, tk, unnest(range(1, len(tk) - 1)) AS i
                            FROM t WHERE len(tk) >= 3) x),
              train AS (SELECT tk FROM t WHERE source IN ('src0','src1','src2','src3')),
              tri_c AS (SELECT tk[i] AS u, tk[i + 1] AS v, tk[i + 2] AS w,
                               count(*) AS c3
                        FROM (SELECT tk, unnest(range(1, len(tk) - 1)) AS i
                              FROM train WHERE len(tk) >= 3) x GROUP BY 1, 2, 3),
              bi_c AS (SELECT tk[i] AS bv, tk[i + 1] AS bw, count(*) AS c2
                       FROM (SELECT tk, unnest(range(1, len(tk))) AS i
                             FROM train WHERE len(tk) >= 2) x GROUP BY 1, 2),
              uni_c AS (SELECT tok, count(*) AS c1
                        FROM (SELECT unnest(tk) AS tok FROM train) u GROUP BY 1),
              tot AS (SELECT count(*) AS nn
                      FROM (SELECT unnest(tk) AS tok FROM train) u),
              sc AS (SELECT g.u, g.v, g.w,
                            CASE WHEN c3 IS NOT NULL
                                   THEN ln(CAST(c3 AS DOUBLE) / cuv)
                                 WHEN cvw IS NOT NULL
                                   THEN ln(CAST(0.4 AS DOUBLE) * cvw / cv)
                                 WHEN cw IS NOT NULL
                                   THEN ln(CAST(0.16 AS DOUBLE) * cw / nn)
                                 ELSE ln(CAST(0.064 AS DOUBLE) / nn) END AS s
                     FROM (SELECT DISTINCT u, v, w FROM pos) g
                     LEFT JOIN tri_c USING (u, v, w)
                     LEFT JOIN (SELECT bv AS u, bw AS v, c2 AS cuv FROM bi_c) b1
                       USING (u, v)
                     LEFT JOIN (SELECT bv AS v, bw AS w, c2 AS cvw FROM bi_c) b2
                       USING (v, w)
                     LEFT JOIN (SELECT tok AS v, c1 AS cv FROM uni_c) u1 USING (v)
                     LEFT JOIN (SELECT tok AS w, c1 AS cw FROM uni_c) u2 USING (w)
                     CROSS JOIN tot)
         SELECT doc_id, round(avg(s), 6) AS mean_sb_logscore,
                count(*) AS n_positions
         FROM pos JOIN sc USING (u, v, w)
         GROUP BY 1""",
    // Gopher rule gates: statistics + per-rule verdicts, thresholds
    // inlined (30..90 words, 3..10 mean length, symbol<0.1, alpha>=0.8,
    // >=2 stopword types present)
    "text_gopher" ->
      """WITH g AS (SELECT doc_id,
                           string_split_regex(lower(trim(text)), '\s+') AS tk,
                           CAST(len(string_split_regex(lower(trim(text)), '\s+')) AS BIGINT) AS n_words,
                           len(regexp_replace(text, '\s+', '', 'g')) AS n_alpha_chars,
                           len(regexp_extract_all(text, '#|\.\.\.|…')) AS n_sym
                    FROM documents),
              m AS (SELECT doc_id, n_words,
                           round(CAST(n_alpha_chars AS DOUBLE) / n_words, 6) AS mean_word_len,
                           round(CAST(n_sym AS DOUBLE) / n_words, 6) AS symbol_ratio,
                           round(CAST(len(list_filter(tk, x -> regexp_matches(x, '[a-z]'))) AS DOUBLE) / n_words, 6) AS alpha_frac,
                           (CAST(list_contains(tk, 'the') AS INT) + CAST(list_contains(tk, 'be') AS INT)
                            + CAST(list_contains(tk, 'to') AS INT) + CAST(list_contains(tk, 'of') AS INT)
                            + CAST(list_contains(tk, 'and') AS INT) + CAST(list_contains(tk, 'that') AS INT)
                            + CAST(list_contains(tk, 'have') AS INT) + CAST(list_contains(tk, 'with') AS INT)) AS stop_hits
                    FROM g)
         SELECT doc_id, n_words, mean_word_len, symbol_ratio, alpha_frac,
                stop_hits,
                n_words >= 30 AND n_words <= 90 AS r_wordcount,
                mean_word_len >= 3.0 AND mean_word_len <= 10.0 AS r_wordlen,
                symbol_ratio < 0.1 AS r_symbol,
                alpha_frac >= 0.8 AS r_alpha,
                stop_hits >= 2 AS r_stop,
                (n_words >= 30 AND n_words <= 90)
                  AND (mean_word_len >= 3.0 AND mean_word_len <= 10.0)
                  AND symbol_ratio < 0.1 AND alpha_frac >= 0.8
                  AND stop_hits >= 2 AS pass
         FROM m""",
    // Zipf fit: quantized-log (1e-4) integer normal equations — every
    // sum BIGINT-cast (the audited HUGEINT class), deltas computed in
    // BIGINT then cast, so both engines do identical exact arithmetic
    "text_zipf" ->
      """WITH tf AS (SELECT tok, count(*) AS freq
                     FROM (SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok
                           FROM documents) u GROUP BY 1),
              head AS (SELECT tok, freq FROM tf ORDER BY freq DESC, tok ASC LIMIT 1000),
              ranked AS (SELECT freq,
                                row_number() OVER (ORDER BY freq DESC, tok ASC) AS rank
                         FROM head),
              q AS (SELECT CAST(round(ln(rank) * 10000) AS BIGINT) AS xi,
                           CAST(round(ln(freq) * 10000) AS BIGINT) AS yi
                    FROM ranked),
              s AS (SELECT CAST(count(*) AS BIGINT) AS n,
                           CAST(sum(xi) AS BIGINT) AS sx, CAST(sum(yi) AS BIGINT) AS sy,
                           CAST(sum(xi * yi) AS BIGINT) AS sxy,
                           CAST(sum(xi * xi) AS BIGINT) AS sxx,
                           CAST(sum(yi * yi) AS BIGINT) AS syy
                    FROM q),
              d AS (SELECT n, sx, sy,
                           CAST(n * sxx - sx * sx AS DOUBLE) AS dxx,
                           CAST(n * syy - sy * sy AS DOUBLE) AS dyy,
                           CAST(n * sxy - sx * sy AS DOUBLE) AS dxy
                    FROM s)
         SELECT n AS n_terms,
                round(dxy / dxx, 6) AS zipf_slope,
                round((CAST(sy AS DOUBLE) - (dxy / dxx) * CAST(sx AS DOUBLE))
                      / CAST(n AS DOUBLE) / CAST(10000.0 AS DOUBLE), 6) AS intercept,
                round(dxy * dxy / (dxx * dyy), 6) AS r2
         FROM d""",
    // duplication-multiplicity histogram over exact-hash clusters;
    // integer sums BIGINT-cast (the audited HUGEINT class)
    "dedup_stats" ->
      """WITH h AS (SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS text_hash
                    FROM documents),
              c AS (SELECT text_hash, count(*) AS k FROM h GROUP BY 1)
         SELECT k AS cluster_size, count(*) AS n_clusters,
                CAST(sum(k) AS BIGINT) AS n_docs,
                CAST(sum(k - 1) AS BIGINT) AS n_removable
         FROM c GROUP BY 1""",
    // novelty: per-doc fraction of distinct 8-token shingles whose
    // corpus-wide min(doc_id) is this doc; same shingle formulation as
    // text_boilerplate / dedup_spans
    "text_novelty" ->
      """WITH toks AS (SELECT doc_id,
                              string_split_regex(lower(trim(text)), '\s+') AS t
                       FROM documents),
              sp AS (SELECT DISTINCT doc_id,
                            md5(array_to_string(t[(i+1):(i+8)], ' ')) AS sh
                     FROM (SELECT doc_id, t,
                                  unnest(range(0, len(t) - 8 + 1)) AS i
                           FROM toks WHERE len(t) >= 8) x),
              f AS (SELECT sh, min(doc_id) AS first_doc FROM sp GROUP BY 1)
         SELECT doc_id, count(*) AS n_shingles,
                CAST(sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
                round(CAST(sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END) AS BIGINT)
                      / CAST(count(*) AS DOUBLE), 6) AS novelty
         FROM sp JOIN f USING (sh)
         GROUP BY 1""",
    // langid confidence margin: same marker scores as langIdSql, the
    // runner-up resolved off the predicted label so ties break as the
    // shared argmax does; ratio of small ints is exact in double
    "text_lang_conf" ->
      """WITH sc AS (
           SELECT doc_id, text,
                  len(list_filter(lt, x -> x IN ('der','die','das','und','ist','nicht'))) AS s_de,
                  len(list_filter(lt, x -> x IN ('the','and','of','to','a','in'))) AS s_en,
                  len(list_filter(lt, x -> x IN ('el','los','y','que','por','una'))) AS s_es,
                  len(list_filter(lt, x -> x IN ('le','les','et','une','est','pas'))) AS s_fr
           FROM (SELECT doc_id, text,
                        string_split_regex(lower(trim(text)), '\s+') AS lt
                 FROM documents) x),
         lab AS (
           SELECT doc_id, s_de, s_en, s_es, s_fr,
                  greatest(s_de, s_en, s_es, s_fr) AS m,
                  CASE WHEN regexp_matches(text, '[\x{4e00}-\x{9fff}]') THEN 'zh'
                       WHEN s_de = greatest(s_de, s_en, s_es, s_fr) AND s_de > 0 THEN 'de'
                       WHEN s_en = greatest(s_de, s_en, s_es, s_fr) AND s_en > 0 THEN 'en'
                       WHEN s_es = greatest(s_de, s_en, s_es, s_fr) AND s_es > 0 THEN 'es'
                       WHEN s_fr = greatest(s_de, s_en, s_es, s_fr) AND s_fr > 0 THEN 'fr'
                       ELSE 'und' END AS pred_lang
           FROM sc),
         r AS (
           SELECT doc_id, pred_lang,
                  CAST(m AS BIGINT) AS top_score,
                  CAST(CASE pred_lang
                    WHEN 'de' THEN greatest(s_en, s_es, s_fr)
                    WHEN 'en' THEN greatest(s_de, s_es, s_fr)
                    WHEN 'es' THEN greatest(s_de, s_en, s_fr)
                    WHEN 'fr' THEN greatest(s_de, s_en, s_es)
                    ELSE 0 END AS BIGINT) AS runner_up,
                  m
           FROM lab)
         SELECT doc_id, pred_lang, top_score, runner_up,
                CASE WHEN pred_lang = 'zh' THEN CAST(1.0 AS DOUBLE)
                     WHEN top_score = 0 THEN CAST(0.0 AS DOUBLE)
                     ELSE round(CAST(top_score - runner_up AS DOUBLE) / top_score, 6)
                END AS margin,
                (CASE WHEN pred_lang = 'zh' THEN CAST(1.0 AS DOUBLE)
                      WHEN top_score = 0 THEN CAST(0.0 AS DOUBLE)
                      ELSE round(CAST(top_score - runner_up AS DOUBLE) / top_score, 6)
                 END) >= 0.5 AS confident
         FROM r""",
    // corpus shingle-df datasheet; integer sums BIGINT-cast
    "corpus_ngram_stats" ->
      """WITH toks AS (SELECT doc_id,
                              string_split_regex(lower(trim(text)), '\s+') AS t
                       FROM documents),
              sp AS (SELECT DISTINCT doc_id,
                            md5(array_to_string(t[(i+1):(i+8)], ' ')) AS sh
                     FROM (SELECT doc_id, t,
                                  unnest(range(0, len(t) - 8 + 1)) AS i
                           FROM toks WHERE len(t) >= 8) x),
              d AS (SELECT sh, count(*) AS df FROM sp GROUP BY 1)
         SELECT count(*) AS n_distinct,
                CAST(sum(df) AS BIGINT) AS n_instances,
                CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_singletons,
                CAST(max(df) AS BIGINT) AS max_df,
                round(CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT)
                      / CAST(count(*) AS DOUBLE), 6) AS singleton_frac,
                round(CAST(sum(df) AS BIGINT) / CAST(count(*) AS DOUBLE), 6) AS mean_df
         FROM d""",
    // Flesch reading-ease: exact-integer counts (sentence-terminator
    // runs floored at 1, \s+ words, vowel-group syllable proxy), so
    // both engines compute the identical doubles
    "text_readability" ->
      """WITH m AS (SELECT doc_id,
                           CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS BIGINT) AS n_sentences,
                           CAST(len(string_split_regex(lower(trim(text)), '\s+')) AS BIGINT) AS n_words,
                           CAST(len(regexp_extract_all(lower(trim(text)), '[aeiouy]+')) AS BIGINT) AS n_syllables
                    FROM documents)
         SELECT doc_id, n_sentences, n_words, n_syllables,
                round(CAST(n_words AS DOUBLE) / n_sentences, 6) AS words_per_sentence,
                round(CAST(n_syllables AS DOUBLE) / n_words, 6) AS syllables_per_word,
                round(206.835 - 1.015 * (CAST(n_words AS DOUBLE) / n_sentences)
                      - 84.6 * (CAST(n_syllables AS DOUBLE) / n_words), 6) AS flesch,
                (206.835 - 1.015 * (CAST(n_words AS DOUBLE) / n_sentences)
                      - 84.6 * (CAST(n_syllables AS DOUBLE) / n_words)) >= 30.0 AS readable
         FROM m""",
    // lexical diversity: counts are sort-order-invariant run/boundary
    // counts over the sorted token list — exact integers both engines
    "text_lexdiv" ->
      """WITH m AS (SELECT doc_id,
                           list_sort(string_split_regex(lower(trim(text)), '\s+')) AS s
                    FROM documents),
              c AS (SELECT doc_id,
                           CAST(len(s) AS BIGINT) AS n_tokens,
                           CAST(len(list_filter(range(1, len(s) + 1),
                                i -> i = 1 OR s[i] <> s[i-1])) AS BIGINT) AS n_types,
                           CAST(len(list_filter(range(1, len(s) + 1),
                                i -> (i = 1 OR s[i] <> s[i-1])
                                 AND (i = len(s) OR s[i] <> s[i+1]))) AS BIGINT) AS n_hapax
                    FROM m)
         SELECT doc_id, n_tokens, n_types, n_hapax,
                round(CAST(n_types AS DOUBLE) / n_tokens, 6) AS ttr,
                round(CAST(n_hapax AS DOUBLE) / n_types, 6) AS hapax_frac,
                round(CAST(n_types AS DOUBLE) / sqrt(CAST(n_tokens AS DOUBLE)), 6) AS guiraud
         FROM c""",
    // PII incidence per source — same three shapes text_redact scrubs
    "text_pii_report" ->
      """WITH p AS (SELECT source,
                           len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS em,
                           len(regexp_extract_all(text, '\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b')) AS ss,
                           len(regexp_extract_all(text, '\b[0-9]{7,}\b')) AS dg
                    FROM documents)
         SELECT source, count(*) AS n_docs,
                CAST(sum(em) AS BIGINT) AS n_emails,
                CAST(sum(ss) AS BIGINT) AS n_ssns,
                CAST(sum(dg) AS BIGINT) AS n_digit_runs,
                CAST(sum(CASE WHEN em > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_email,
                CAST(sum(CASE WHEN ss > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_ssn,
                CAST(sum(CASE WHEN dg > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_digit,
                CAST(sum(CASE WHEN em > 0 OR ss > 0 OR dg > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_any,
                round(CAST(sum(CASE WHEN em > 0 OR ss > 0 OR dg > 0 THEN 1 ELSE 0 END) AS DOUBLE)
                      / count(*), 6) AS pii_incidence
         FROM p GROUP BY 1""",
    // threshold sweep over the SAME MinHash+LSH candidate set as
    // dedup_minhash (signatures/banding value-for-value, verify at the
    // lowest cutoff 0.5), re-counted per threshold — est_jac is dyadic
    // so the boundary comparisons are FP-exact on both engines
    "dedup_sweep" ->
      s"""WITH tok AS (SELECT doc_id, unnest(list_distinct($toksSql)) AS tok
                       FROM documents),
              hp AS (SELECT doc_id,
                            ('0x' || substr(md5(tok), 1, 16))::UBIGINT::HUGEINT AS h1,
                            ('0x' || substr(md5(tok), 17, 16))::UBIGINT::HUGEINT AS h2
                     FROM tok),
              hx AS (SELECT doc_id, i,
                            (h1 + i * h2) % 18446744073709551616::HUGEINT AS w
                     FROM hp, (SELECT unnest(range(64)) AS i) ii),
              hs AS (SELECT doc_id, i,
                            CAST(CASE WHEN w >= 9223372036854775808::HUGEINT
                                      THEN w - 18446744073709551616::HUGEINT
                                      ELSE w END AS BIGINT) AS v
                     FROM hx),
              sigs AS (SELECT doc_id, list(mv ORDER BY i) AS sig
                       FROM (SELECT doc_id, i, min(v) AS mv FROM hs GROUP BY 1, 2)
                       GROUP BY 1),
              grp AS (SELECT sig, min(doc_id) AS rep FROM sigs GROUP BY 1),
              identical AS (SELECT g.rep AS a, s.doc_id AS b, 1.0 AS est_jac
                            FROM sigs s JOIN grp g ON s.sig = g.sig
                            WHERE s.doc_id > g.rep),
              banded AS (SELECT g.rep AS doc_id, bs.band,
                                g.sig[bs.band * 4 + 1 : bs.band * 4 + 4] AS key
                         FROM grp g, (SELECT unnest(range(16)) AS band) bs),
              bucketrep AS (SELECT band, key, min(doc_id) AS a
                            FROM banded GROUP BY 1, 2),
              cands AS (SELECT DISTINCT br.a, bd.doc_id AS b
                        FROM banded bd JOIN bucketrep br
                          ON bd.band = br.band AND bd.key = br.key
                        WHERE bd.doc_id > br.a),
              near AS (SELECT a, b, est_jac FROM (
                         SELECT c.a, c.b,
                                len(list_filter(range(1, 65),
                                    j -> sa.sig[j] = sb.sig[j])) / 64.0 AS est_jac
                         FROM cands c JOIN sigs sa ON sa.doc_id = c.a
                                      JOIN sigs sb ON sb.doc_id = c.b) t
                       WHERE est_jac >= 0.5),
              allp AS (SELECT a, b, est_jac FROM identical
                       UNION ALL SELECT a, b, est_jac FROM near),
              sw AS (SELECT CAST(t.threshold AS DOUBLE) AS threshold, a, b
                     FROM allp,
                          (SELECT unnest([0.5, 0.6, 0.7, 0.8, 0.9]) AS threshold) t
                     WHERE est_jac >= t.threshold)
         SELECT threshold, count(*) AS n_pairs,
                count(DISTINCT b) AS n_removable,
                count(DISTINCT a) AS n_reps
         FROM sw GROUP BY 1""",
    // embedding-space datasheet: 1e-6-quantized component sums (exact
    // int64 under any order), per-dim centroid-squared terms
    // re-quantized on the 1e-12 grid, shift-identity spread
    "embed_stats" ->
      """WITH e AS (SELECT label, embedding,
                           unnest(range(len(embedding))) AS dim
                    FROM embeddings),
              qv AS (SELECT label, dim,
                            CAST(round(CAST(embedding[dim + 1] AS DOUBLE) * 1e6) AS BIGINT) AS q
                     FROM e),
              pd AS (SELECT label, dim, count(*) AS n,
                            CAST(sum(q) AS BIGINT) AS sq,
                            CAST(sum(q * q) AS BIGINT) AS sqq
                     FROM qv GROUP BY 1, 2),
              t AS (SELECT label, n, sqq,
                           CAST(round((CAST(sq AS DOUBLE) / n / 1e6)
                                      * (CAST(sq AS DOUBLE) / n / 1e6) * 1e12) AS BIGINT) AS c2q
                    FROM pd),
              r AS (SELECT label, max(n) AS n_vecs,
                           CAST(sum(c2q) AS BIGINT) AS c2sum,
                           CAST(sum(sqq) AS BIGINT) AS sqqsum
                    FROM t GROUP BY 1)
         SELECT label, n_vecs,
                round(sqrt(CAST(c2sum AS DOUBLE) / 1e12), 6) AS centroid_norm,
                round(CAST(sqqsum AS DOUBLE) / n_vecs / 1e12, 6) AS mean_sq_norm,
                round(CAST(sqqsum AS DOUBLE) / n_vecs / 1e12
                      - CAST(c2sum AS DOUBLE) / 1e12, 6) AS spread
         FROM r""",
    // soft dedup: weight 1/|exact-hash cluster|, same normalization as
    // dedup_exact
    "dedup_soft" ->
      """WITH h AS (SELECT doc_id,
                           md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS text_hash,
                           CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens
                    FROM documents),
              c AS (SELECT text_hash, count(*) AS cluster_size FROM h GROUP BY 1)
         SELECT doc_id, cluster_size,
                round(CAST(1.0 AS DOUBLE) / cluster_size, 6) AS weight,
                round(n_tokens / CAST(cluster_size AS DOUBLE), 6) AS effective_tokens
         FROM h JOIN c USING (text_hash)""",
    // add-1-smoothed hashed-unigram multinomials; every integer SUM
    // cast to BIGINT (the audited HUGEINT class); keep derives from the
    // ROUNDED weight so the boundary agrees across engines
    "sample_importance" ->
      """WITH tb AS (SELECT doc_id, source IN ('src0', 'src1') AS tgt,
                            ('0x' || substr(md5(tok), 1, 8))::BIGINT % 1024 AS b
                     FROM (SELECT doc_id, source,
                                  unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok
                           FROM documents) u),
              bc AS (SELECT b, count(*) AS n_r,
                            CAST(SUM(CASE WHEN tgt THEN 1 ELSE 0 END) AS BIGINT) AS n_t
                     FROM tb GROUP BY 1),
              tot AS (SELECT CAST(sum(n_r) AS BIGINT) AS nr,
                             CAST(sum(n_t) AS BIGINT) AS nt FROM bc),
              r AS (SELECT b, ln((n_t + 1.0) / (nt + 1024.0))
                             - ln((n_r + 1.0) / (nr + 1024.0)) AS log_ratio
                    FROM bc, tot)
         SELECT doc_id, round(sum(log_ratio), 6) AS log_weight,
                round(sum(log_ratio), 6) > 0.0 AS keep
         FROM tb JOIN r USING (b)
         GROUP BY 1""",
    // token-quota greedy fill in md5 order; windowed SUM cast to BIGINT
    // (never HUGEINT), doc_id tie-break makes the order total — the
    // audited divergence classes all handled by construction
    "sample_domain_mix" ->
      s"""WITH lang AS ($langIdSql),
           t AS (SELECT l.doc_id, l.pred_lang,
                   CAST(len(regexp_extract_all(lower(d.text), '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS BIGINT) AS n_tokens
                 FROM lang l JOIN documents d USING (doc_id)),
           c AS (SELECT doc_id, pred_lang, n_tokens,
                   CAST(SUM(n_tokens) OVER (PARTITION BY pred_lang
                     ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
                 FROM t)
         SELECT doc_id, pred_lang, n_tokens FROM c
         WHERE cum - n_tokens < CASE pred_lang
           WHEN 'en' THEN 12000 WHEN 'de' THEN 3000 WHEN 'fr' THEN 2000
           WHEN 'es' THEN 2000 WHEN 'zh' THEN 1000 ELSE 0 END""",
    // percent_rank = (rank-1)/(n-1) over identical integers in both
    // engines; ranking on the ROUNDED logprob with a doc_id tie-break
    "text_ppl_filter" ->
      s"""WITH lang AS ($langIdSql),
           tok AS (SELECT doc_id,
                          unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok
                   FROM documents),
           cnt AS (SELECT tok, count(*) AS cnt FROM tok GROUP BY 1),
           tot AS (SELECT count(*) AS total FROM tok),
           lp AS (SELECT doc_id, round(avg(ln(cnt / total)), 6) AS mean_logprob
                  FROM tok JOIN cnt USING (tok), tot
                  GROUP BY 1)
         SELECT doc_id, pred_lang, mean_logprob, round(pr, 6) AS ppl_rank
         FROM (SELECT lp.doc_id, lang.pred_lang, lp.mean_logprob,
                 percent_rank() OVER (PARTITION BY lang.pred_lang
                   ORDER BY lp.mean_logprob DESC, lp.doc_id) AS pr
               FROM lp JOIN lang USING (doc_id)) x
         WHERE pr <= 0.8""",
    "dedup_keep_best" ->
      s"""WITH RECURSIVE
         t AS (SELECT doc_id, text,
                      list_distinct(string_split_regex(trim(text), '\\s+')) AS s
               FROM documents WHERE doc_id % 5 = 0),
         pairs AS (SELECT a.doc_id AS a, b.doc_id AS b
                   FROM t a JOIN t b ON a.doc_id < b.doc_id
                   WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                         / len(list_distinct(list_concat(a.s, b.s))) >= 0.8),
         edges AS (SELECT a, b FROM pairs UNION ALL SELECT b, a FROM pairs),
         reach(node, r) AS (
           SELECT a AS node, a AS r FROM edges
           UNION
           SELECT e.a AS node, reach.r AS r
           FROM edges e JOIN reach ON e.b = reach.node),
         clus AS (SELECT node AS doc_id, min(r) AS cluster
                  FROM reach GROUP BY node),
         q AS (SELECT doc_id,
                 least(CAST(len($toksSql) AS DOUBLE) / 100.0, 1.0) * 0.5
                   + (CAST(len(list_filter($toksSql, x -> x IN ($stopList))) AS DOUBLE)
                      / CAST(len($toksSql) AS DOUBLE)) * 0.3
                   + (1.0 - least((CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9\\s]')) AS DOUBLE)
                      / CAST(length(text) AS DOUBLE)) * 5.0, 1.0)) * 0.2
                   AS quality_score
               FROM t)
         SELECT cluster, doc_id, round(quality_score, 6) AS quality_score
         FROM (SELECT cluster, doc_id, quality_score
               FROM clus JOIN q USING (doc_id)
               QUALIFY ROW_NUMBER() OVER (PARTITION BY cluster
                 ORDER BY quality_score DESC, doc_id) = 1) k""",
    // Engine-semantics notes (the r8 driver-red row): shard uses the
    // pmod identity ((x%n)+n)%n to match Spark's pmod on negative ids;
    // the window orders by (doc_id, n_tokens) — a total order up to
    // fully-identical rows, so the output multiset is deterministic
    // under duplicate ids; the windowed SUM is CAST back to BIGINT
    // because DuckDB's SUM(BIGINT) yields HUGEINT, a type the driver's
    // fetch path renders differently than Python's (pipeline_pack was
    // the ONLY oracle of 73 emitting a HUGEINT column); pack uses
    // integer // division, not floats.
    "pipeline_pack" ->
      """WITH t AS (SELECT doc_id,
               CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS BIGINT) AS n_tokens,
               ((doc_id % 8) + 8) % 8 AS shard
             FROM documents),
           c AS (SELECT doc_id, n_tokens, shard,
               CAST(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id, n_tokens
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) - n_tokens AS start
             FROM t)
         SELECT doc_id, n_tokens, shard,
                CAST(start // 512 AS BIGINT) AS pack,
                CAST(start % 512 AS BIGINT) AS pack_offset
         FROM c""",
    "text_heavy_hitters" ->
      """WITH t AS (SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok
                    FROM documents),
              n AS (SELECT count(*) AS n FROM t)
         SELECT tok, count(*) AS cnt
         FROM t, n GROUP BY tok, n.n
         HAVING count(*) * 33 > n.n""",
    // BM25: identical formula with identical association order and the
    // constants written as the same double expressions Scala computes
    // (1.2 + 1.0, 1.0 - 0.75) so both engines evaluate the same IEEE
    // doubles; exact-decimal per-term weight sum = order-independent.
    "text_bm25" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok
                      FROM documents),
              tf AS (SELECT doc_id, tok, count(*) AS tf FROM tok GROUP BY 1, 2),
              dl AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY 1),
              stats AS (SELECT count(*) AS n,
                               CAST(SUM(CAST(dl AS DECIMAL(25,6))) AS DOUBLE) / count(*) AS avgdl
                        FROM dl),
              qtf AS (SELECT * FROM tf WHERE tok IN ('spark', 'query', 'join')),
              dfreq AS (SELECT tok, count(*) AS df FROM qtf GROUP BY 1),
              wt AS (SELECT q.doc_id,
                            ln((n - df + 0.5) / (df + 0.5) + 1.0) * (q.tf * (1.2 + 1.0)) /
                            (q.tf + 1.2 * ((1.0 - 0.75) + 0.75 * dl / avgdl)) AS wt
                     FROM qtf q JOIN dfreq USING (tok) JOIN dl USING (doc_id)
                     CROSS JOIN stats)
         SELECT doc_id, round(CAST(SUM(CAST(wt AS DECIMAL(25,6))) AS DOUBLE), 6) AS bm25
         FROM wt GROUP BY doc_id""",
    "text_bm25_batch" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok
                      FROM documents),
              tf AS (SELECT doc_id, tok, count(*) AS tf FROM tok GROUP BY 1, 2),
              dl AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY 1),
              stats AS (SELECT count(*) AS n,
                               CAST(SUM(CAST(dl AS DECIMAL(25,6))) AS DOUBLE) / count(*) AS avgdl
                        FROM dl),
              qrel AS (SELECT 'q1' AS qid, unnest(['spark','query','join']) AS tok
                       UNION ALL
                       SELECT 'q2', unnest(['hash','scan','filter'])),
              qtf AS (SELECT * FROM tf
                      WHERE tok IN ('spark','query','join','hash','scan','filter')),
              dfreq AS (SELECT tok, count(*) AS df FROM qtf GROUP BY 1),
              wt AS (SELECT qrel.qid, q.doc_id,
                            ln((n - df + 0.5) / (df + 0.5) + 1.0) * (q.tf * (1.2 + 1.0)) /
                            (q.tf + 1.2 * ((1.0 - 0.75) + 0.75 * dl / avgdl)) AS wt
                     FROM qtf q JOIN qrel USING (tok) JOIN dfreq USING (tok)
                     JOIN dl ON q.doc_id = dl.doc_id
                     CROSS JOIN stats),
              sc AS (SELECT qid, doc_id,
                            round(CAST(SUM(CAST(wt AS DECIMAL(25,6))) AS DOUBLE), 6) AS bm25
                     FROM wt GROUP BY 1, 2)
         SELECT qid, rk, doc_id, bm25 FROM (
           SELECT qid, doc_id, bm25,
                  row_number() OVER (PARTITION BY qid
                                     ORDER BY bm25 DESC, doc_id) AS rk
           FROM sc) t
         WHERE rk <= 10""",
    // hybrid retrieval: the text_bm25 pipeline + the text_embed vectors
    // + list_cosine_similarity, ranked per modality (LIMIT 50 under the
    // same (score DESC, doc_id) total order Spark's
    // TakeOrderedAndProject uses), fused by 1/(60+rank) written in the
    // same fixed addition order.
    "sim_hybrid" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok
                      FROM documents),
              tf AS (SELECT doc_id, tok, count(*) AS tf FROM tok GROUP BY 1, 2),
              dl AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY 1),
              stats AS (SELECT count(*) AS n,
                               CAST(SUM(CAST(dl AS DECIMAL(25,6))) AS DOUBLE) / count(*) AS avgdl
                        FROM dl),
              qtf AS (SELECT * FROM tf WHERE tok IN ('spark', 'query', 'join')),
              dfreq AS (SELECT tok, count(*) AS df FROM qtf GROUP BY 1),
              wt AS (SELECT q.doc_id,
                            ln((n - df + 0.5) / (df + 0.5) + 1.0) * (q.tf * (1.2 + 1.0)) /
                            (q.tf + 1.2 * ((1.0 - 0.75) + 0.75 * dl / avgdl)) AS wt
                     FROM qtf q JOIN dfreq USING (tok) JOIN dl USING (doc_id)
                     CROSS JOIN stats),
              bm AS (SELECT doc_id, round(CAST(SUM(CAST(wt AS DECIMAL(25,6))) AS DOUBLE), 6) AS bm25
                     FROM wt GROUP BY doc_id),
              kwtop AS (SELECT doc_id, bm25 FROM bm ORDER BY bm25 DESC, doc_id LIMIT 50),
              kw AS (SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id) AS kw_rank
                     FROM kwtop),
              cnt AS (SELECT doc_id,
                        ('0x' || substr(md5(tok), 1, 8))::BIGINT % 64 AS dim,
                        CAST(count(*) AS DOUBLE) AS val
                      FROM tok GROUP BY 1, 2),
              dims AS (SELECT unnest(range(64)) AS dim),
              dv AS (SELECT d.doc_id, list(coalesce(cnt.val, 0.0) ORDER BY dims.dim) AS v
                     FROM (SELECT DISTINCT doc_id FROM documents) d
                     CROSS JOIN dims
                     LEFT JOIN cnt ON cnt.doc_id = d.doc_id AND cnt.dim = dims.dim
                     GROUP BY d.doc_id),
              qtok AS (SELECT unnest(string_split_regex(lower(trim('spark query join')), '\s+')) AS tok),
              qcnt AS (SELECT ('0x' || substr(md5(tok), 1, 8))::BIGINT % 64 AS dim,
                              CAST(count(*) AS DOUBLE) AS val
                       FROM qtok GROUP BY 1),
              qv AS (SELECT list(coalesce(qcnt.val, 0.0) ORDER BY dims.dim) AS v
                     FROM dims LEFT JOIN qcnt ON qcnt.dim = dims.dim),
              cs AS (SELECT doc_id, round(list_cosine_similarity(dv.v, qv.v), 6) AS cos
                     FROM dv CROSS JOIN qv),
              vtop AS (SELECT doc_id, cos FROM cs ORDER BY cos DESC, doc_id LIMIT 50),
              vr AS (SELECT doc_id, row_number() OVER (ORDER BY cos DESC, doc_id) AS vec_rank
                     FROM vtop)
         SELECT coalesce(kw.doc_id, vr.doc_id) AS doc_id, kw_rank, vec_rank,
                round(coalesce(1.0 / (60.0 + kw_rank), 0.0) +
                      coalesce(1.0 / (60.0 + vec_rank), 0.0), 6) AS rrf
         FROM kw FULL OUTER JOIN vr ON kw.doc_id = vr.doc_id
         ORDER BY rrf DESC, doc_id LIMIT 10""",
    // drift datasheet: exact-decimal conditional token sums; shares
    // normalized by the per-snapshot totals; L1/KL computed from the
    // UNROUNDED shares and rounded at output (same as the operator).
    "corpus_drift" ->
      """WITH base AS (SELECT source,
                        ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 2 = 0 AS in_a,
                        len(string_split_regex(trim(text), '\s+')) AS ntok
                      FROM documents),
              per AS (SELECT source,
                        CAST(SUM(CAST(CASE WHEN in_a THEN ntok ELSE 0 END
                          AS DECIMAL(25,6))) AS DOUBLE) AS tok_a,
                        CAST(SUM(CAST(CASE WHEN in_a THEN 0 ELSE ntok END
                          AS DECIMAL(25,6))) AS DOUBLE) AS tok_b
                      FROM base GROUP BY source),
              sh AS (SELECT source, tok_a, tok_b,
                            tok_a / SUM(tok_a) OVER () AS share_a,
                            tok_b / SUM(tok_b) OVER () AS share_b
                     FROM per)
         SELECT source, tok_a, tok_b,
                round(share_a, 6) AS share_a, round(share_b, 6) AS share_b,
                round(abs(share_a - share_b), 6) AS l1,
                round(CASE WHEN share_a = 0 THEN 0.0
                      ELSE share_a * ln(share_a / nullif(share_b, 0)) END, 6) AS kl_term
         FROM sh"""
  )
}
