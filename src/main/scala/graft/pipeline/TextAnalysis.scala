package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines
  * (SURVEY.md §2C). Everything is built from codegen'd
  * `org.apache.spark.sql.functions` — no UDFs — so the whole pipeline
  * stays inside whole-stage codegen and scales linearly with input
  * splits: there is no shuffle in any of these (per-row transforms).
  */
object TextAnalysis {

  /** BPE-ish token pattern: letter runs, digit runs, single punctuation. */
  val TokenRe = "[a-z]+|[0-9]+|[^a-z0-9\\s]"

  def wsTokens(text: Column): Column =
    size(split(trim(text), "\\s+"))

  def reTokens(text: Column): Column =
    size(regexp_extract_all(lower(text), lit(TokenRe), lit(0)))

  /** Token counting: whitespace + BPE-ish regex counts per document. */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), wsTokens(col("text")).as("ws_tokens"),
      reTokens(col("text")).as("re_tokens"))

  val Stopwords: Seq[String] =
    Seq("the", "a", "and", "of", "to", "in", "is", "it", "on", "for")

  /** The quality metric columns over a `text` column — exposed as
    * column builders so multi-gate pipelines can fuse them with other
    * per-row stages into ONE corpus pass (see langQuality). */
  private def qualityMetricCols: Seq[Column] = {
    val toks = split(trim(col("text")), "\\s+")
    val nToks = size(toks).cast("double")
    val nChars = length(col("text")).cast("double")
    val punct = size(regexp_extract_all(col("text"), lit("[^a-zA-Z0-9\\s]"), lit(0))).cast("double")
    val stops = size(filter(toks, t => t.isin(Stopwords: _*))).cast("double")
    Seq(nChars.as("n_chars"), nToks.as("n_tokens"),
      (punct / nChars).as("punct_ratio"), (stops / nToks).as("stop_ratio"),
      (nChars / nToks).as("mean_word_len"))
  }
  private def qualityScoreCol: Column =
    least(col("n_tokens") / 100.0, lit(1.0)) * 0.5 +
      col("stop_ratio") * 0.3 +
      (lit(1.0) - least(col("punct_ratio") * 5.0, lit(1.0))) * 0.2

  /** Quality scoring: length, punctuation ratio, stopword ratio, mean
    * word length, and a blended score — the standard cheap quality
    * filters applied before expensive model-based scoring. */
  def quality(docs: DataFrame): DataFrame =
    docs.select(col("doc_id") +: qualityMetricCols: _*)
      .withColumn("quality_score", qualityScoreCol)

  /** GATE-CALIBRATION SWEEP — the datasheet consulted before fixing a
    * quality threshold: for each candidate cutoff 0.1..0.9, how many
    * docs and how many tokens survive. ONE corpus scan: all 18
    * conditional aggregates fuse into a single map-side-combinable
    * reduce to one row, unpivoted to 9 report rows by a map-only
    * stack. Token sums are integer-valued doubles (< 2^53), so the
    * distributed sum is exact under any accumulation order. */
  def gateSweep(docs: DataFrame): DataFrame = {
    val q = quality(docs).select(col("quality_score").as("s"),
      col("n_tokens").as("nt"))
    val ts = (1 to 9).map(_ / 10.0)
    val aggs = count(lit(1)).as("total") +:
      ts.zipWithIndex.flatMap { case (t, i) => Seq(
        sum(when(col("s") >= t, 1L).otherwise(0L)).as(s"k$i"),
        sum(when(col("s") >= t, col("nt")).otherwise(0.0))
          .cast("long").as(s"t$i")) }
    val fused = q.agg(aggs.head, aggs.tail: _*)
    // literal 0.1 parses as DECIMAL(1,1) in both engines' SQL — CAST
    // pins the report column to DOUBLE (the audited type surface)
    val stackArgs = ts.zipWithIndex
      .map { case (t, i) => s"CAST($t AS DOUBLE), k$i, t$i" }.mkString(", ")
    fused.select(col("total"),
        expr(s"stack(9, $stackArgs) AS (threshold, n_keep, tokens_kept)"))
      .select(col("threshold"), col("n_keep"), col("total").as("n_total"),
        round(col("n_keep") / col("total").cast("double"), 6).as("keep_rate"),
        col("tokens_kept"))
  }

  /** Stopword profiles per language for the n-gram/stopword language-ID
    * heuristic. Deterministic argmax with alphabetical tie-break. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht"),
    "en" -> Seq("the", "and", "of", "to", "a", "in"),
    "es" -> Seq("el", "los", "y", "que", "por", "una"),
    "fr" -> Seq("le", "les", "et", "une", "est", "pas"))

  /** The language-ID expression over a `text` column: count
    * marker-stopword hits per language, argmax with deterministic
    * tie-break (language code order); CJK characters force "zh". */
  private def predLangCol(text: Column): Column = {
    val toks = split(lower(trim(text)), "\\s+")
    val scores = LangMarkers.map { case (lang, markers) =>
      lang -> size(filter(toks, t => t.isin(markers: _*)))
    }
    // walk languages in order, keep the first one achieving the max
    val maxScore = greatest(scores.map(_._2): _*)
    val pick = scores.reverse.foldLeft(lit("und")) { case (acc, (lang, sc)) =>
      when(sc === maxScore && maxScore > 0, lit(lang)).otherwise(acc)
    }
    when(text.rlike("[\\x{4e00}-\\x{9fff}]"), lit("zh")).otherwise(pick)
  }

  def langId(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), predLangCol(col("text")).as("pred_lang"))

  /** Language-ID CONFIDENCE — the margin gate every production
    * langid deployment runs (fastText-style: act on the label only
    * when the top score clears the runner-up by a margin; low-margin
    * docs are mixed-language or too short to call): per doc the
    * predicted language (same [[predLangCol]] heuristic as
    * text_langid, shared so the label cannot drift), top and
    * runner-up marker scores, relative margin (s1−s2)/s1 and the
    * confident verdict. CJK script evidence is decisive → margin 1;
    * zero evidence ('und') → margin 0. Map-only single pass. */
  def langIdConfidence(docs: DataFrame,
                       minMargin: Double = 0.5): DataFrame = {
    val toks = split(lower(trim(col("text"))), "\\s+")
    val scores = LangMarkers.map { case (lang, markers) =>
      lang -> size(filter(toks, t => t.isin(markers: _*)))
    }.toMap
    val top = greatest(scores.values.toSeq: _*)
    // the runner-up is the best of the three languages that did NOT
    // win — resolved off the predicted label, so ties break exactly
    // as the shared argmax does
    val runnerUp = LangMarkers.map(_._1).foldLeft(lit(0)) {
      case (acc, lang) =>
        val others = scores.collect { case (l, s) if l != lang => s }.toSeq
        when(col("pred_lang") === lang, greatest(others: _*)).otherwise(acc)
    }
    val margin =
      when(col("pred_lang") === "zh", lit(1.0))
        .when(col("top_score") === 0, lit(0.0))
        .otherwise(round((col("top_score") - col("runner_up"))
          .cast("double") / col("top_score"), 6))
    docs.select(col("doc_id"), col("text"),
        predLangCol(col("text")).as("pred_lang"),
        top.cast("long").as("top_score"))
      .withColumn("runner_up", runnerUp.cast("long"))
      .withColumn("margin", margin)
      .withColumn("confident", col("margin") >= minMargin)
      .drop("text")
  }

  /** All row-wise gate columns — language id + quality metrics — in a
    * SINGLE projection: at 100 TB the corpus is scanned once for every
    * per-row gate; joins are reserved for the genuinely relational
    * steps (dedup). pipeline_e2e runs on this. */
  def langQuality(docs: DataFrame): DataFrame =
    docs.select(col("doc_id") +:
        predLangCol(col("text")).as("pred_lang") +: qualityMetricCols: _*)
      .withColumn("quality_score", qualityScoreCol)

  /** Winnowing fingerprint (Schleimer et al., SIGMOD 2003): rolling
    * k-gram hashes, minimum per sliding window, distinct sorted set.
    * Guarantees any shared substring of length >= w+k-1 produces a
    * shared fingerprint hash — the plagiarism/near-dup detection
    * primitive. Pure codegen'd higher-order functions, no UDF.
    *
    * The gram hash is md5-derived (first 60 bits), NOT an
    * engine-private hash: published fingerprints must be re-derivable
    * by whatever engine later probes against them (the same
    * engine-reproducibility argument as [[hashVectors]] and the
    * sample_split freeze), and it makes the whole fingerprint set
    * oracle-checkable value-by-value. */
  def winnow(docs: DataFrame, k: Int = 5, w: Int = 4): DataFrame =
    docs.select(col("doc_id"), expr(
      s"""sort_array(array_distinct(transform(
            sequence(0, greatest(length(text) - $k - ${w - 1}, 0)),
            j -> array_min(transform(sequence(j + 1, j + $w),
                   i -> cast(conv(substr(md5(substr(text, i, $k)), 1, 15), 16, 10) as bigint))))))""").as("fingerprint"))

  /** Top-k TF-IDF terms per document: tf = in-doc term count, idf =
    * ln((N+1)/(df+1)) (smoothed), deterministic (score desc, token)
    * ranking. ONE corpus-sized hash shuffle (the per-doc tf agg); df
    * falls out of tf for free — tf is one row per (doc, token), so
    * document frequency is a plain row count over the already-reduced
    * relation, never a count_distinct re-shuffle of the raw token
    * stream. The corpus size joins in as a broadcast 1-row aggregate,
    * no driver collect. */
  def tfidfTop(docs: DataFrame, topK: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tok = docs.select(col("doc_id"),
      explode(split(lower(trim(col("text"))), "\\s+")).as("tok"))
    val tf = tok.groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n"))
    val scored = tf.join(dfreq, "tok").crossJoin(broadcast(n))
      .withColumn("score", col("tf") * log((col("n") + 1.0) / (col("df") + 1.0)))
    scored.withColumn("rn", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("score").desc, col("tok"))))
      .filter(col("rn") <= topK)
      .select(col("doc_id"), col("tok"), round(col("score"), 6).as("score"))
  }

  /** Feature-hashing bag-of-words: each token hashes (md5-derived, so
    * any engine reproduces it) into one of `dims` buckets; output is
    * the sparse (doc_id, dim, cnt) long form — the hashing-trick text
    * vectorizer feeding linear probes/classifiers. One explode + one
    * hash-shuffle groupBy, map-side combinable. */
  def hashVectors(docs: DataFrame, dims: Int = 64): DataFrame =
    docs.select(col("doc_id"),
        explode(split(lower(trim(col("text"))), "\\s+")).as("tok"))
      .select(col("doc_id"),
        // fused md5-dim (r15): identical value to
        // pmod(conv(substring(md5(tok),1,8),16,10)::long, dims) with no
        // per-token hex/substring/parse allocations (HashDimSpec +
        // text_hashvec/text_embed oracle pin the equality)
        graft.functions.VectorExpressions.hashedDim(col("tok"), dims).as("dim"))
      .groupBy(col("doc_id"), col("dim"))
      .agg(count(lit(1)).as("cnt"))

  /** MODEL-based quality gate (the fasttext-classifier shape): a
    * linear model over the hashed bag-of-words, applied at corpus
    * scale with NO UDF — score = sigmoid(Σ cnt·w(dim) / Σ cnt), i.e. a
    * length-normalized dot product against a weight vector. Weights
    * here are md5-derived stand-ins (deterministic, oracle-shared);
    * a trained model drops its real weights into the same dim-keyed
    * join shape (broadcast — the weight relation is `dims` rows).
    * Cost = the hashVectors reduce + one per-doc reduce; the gate
    * comparison rides the ROUNDED score so the keep set is
    * engine-deterministic. */
  def qualityModelGate(docs: DataFrame, dims: Int = 64): DataFrame = {
    val w = (conv(substring(md5(col("dim").cast("string")), 1, 8), 16, 10)
      .cast("double") / lit(4294967296.0)) * 2.0 - 1.0
    val score = round(lit(1.0) / (lit(1.0) + exp(-col("raw"))), 6)
    hashVectors(docs, dims)
      .withColumn("w", w)
      .groupBy(col("doc_id"))
      .agg((sum(col("cnt") * col("w")) / sum(col("cnt"))).as("raw"))
      .select(col("doc_id"), score.as("model_score"),
        (score >= 0.5).as("keep"))
  }

  /** [[hashVectors]] folded into a DENSE fixed-width embedding column
    * (doc_id, vec: array<double>) — the hashing-trick document vector
    * that feeds the similarity/ANN stages when no learned embedding
    * exists (and the embedding stage of the streaming curation
    * pipeline). Deterministic, one aggregation, no vocabulary state. */
  def hashEmbedding(docs: DataFrame, dims: Int = 64): DataFrame =
    denseFromSparse(docs.select(col("doc_id")).distinct(),
      hashVectors(docs, dims), dims)

  /** Scatter a sparse (doc_id, dim, cnt) relation to corpus-complete
    * dense vectors. EVERY id in `ids` gets a vector — a doc whose text
    * tokenizes to nothing (null text) vanishes from the exploded
    * sparse relation but must come back as the zero vector, both for
    * the oracle (which scatters over all doc_ids) and for downstream
    * stages that assume corpus-complete embeddings. */
  private[pipeline] def denseFromSparse(ids: DataFrame, sparse: DataFrame,
                                        dims: Int): DataFrame = {
    val m = sparse
      .groupBy(col("doc_id"))
      .agg(map_from_entries(
        collect_list(struct(col("dim"), col("cnt").cast("double")))).as("m"))
    ids.join(m, Seq("doc_id"), "left")
      .select(col("doc_id"),
        transform(sequence(lit(0), lit(dims - 1)),
          d => coalesce(element_at(col("m"), d.cast("long")), lit(0.0))).as("vec"))
  }

  /** The PII shapes — ONE definition shared by the [[redact]] scrubber
    * and the [[corpusProfile]]/profileStream pii_frac probe, so the
    * published datasheet always describes exactly what redact scrubs. */
  val PiiEmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PiiSsnRe = "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b"
  val PiiDigitsRe = "\\b[0-9]{7,}\\b"

  /** PII scrubbing: mask email addresses, long digit runs (phone /
    * account numbers), and SSN-shaped patterns — the standard redaction
    * gate before training-data release. Pure regexp_replace chain
    * (codegen'd, no shuffle); emits the scrubbed text + a flag for
    * routing docs that contained PII to quarantine. */
  def redact(docs: DataFrame): DataFrame = {
    val scrubbed = regexp_replace(regexp_replace(regexp_replace(col("text"),
      PiiEmailRe, "[EMAIL]"), PiiSsnRe, "[SSN]"), PiiDigitsRe, "[NUMBER]")
    docs.select(col("doc_id"), scrubbed.as("clean_text"),
      (scrubbed =!= col("text")).as("had_pii"))
  }

  /** PII incidence REPORT — the accounting twin of [[redact]]: per
    * source, total occurrences and affected-document counts for each
    * PII shape redact scrubs, plus the any-PII incidence. The release
    * datasheet ("what did redaction remove, and from where") that
    * pairs with the scrubbed corpus; the shapes are the SAME shared
    * [[PiiEmailRe]]/[[PiiSsnRe]]/[[PiiDigitsRe]] constants, so the
    * report can never describe a different scrubber than the one that
    * ran.
    *
    * Scale: map-only occurrence counting (regexp_extract_all sizes,
    * one codegen'd projection) + a map-side-combinable groupBy to
    * |sources| rows — flat at any corpus size. */
  def piiReport(docs: DataFrame): DataFrame = {
    def occ(re: String) =
      size(regexp_extract_all(col("text"), lit(re), lit(0))).cast("long")
    val perRow = docs.select(col("source"),
      occ(PiiEmailRe).as("em"), occ(PiiSsnRe).as("ss"), occ(PiiDigitsRe).as("dg"))
    perRow.groupBy(col("source")).agg(
        count(lit(1)).as("n_docs"),
        sum(col("em")).as("n_emails"),
        sum(col("ss")).as("n_ssns"),
        sum(col("dg")).as("n_digit_runs"),
        sum((col("em") > 0).cast("long")).as("docs_email"),
        sum((col("ss") > 0).cast("long")).as("docs_ssn"),
        sum((col("dg") > 0).cast("long")).as("docs_digit"),
        sum((col("em") > 0 || col("ss") > 0 || col("dg") > 0).cast("long"))
          .as("docs_any"))
      .withColumn("pii_incidence",
        round(col("docs_any").cast("double") / col("n_docs"), 6))
  }

  /** Overlapping token-window chunking: split each document into
    * `size`-token windows advancing by `step` (overlap = size - step) —
    * the doc→training-sample fan-out. One generate per row, no
    * shuffle; chunk ordinals are deterministic. */
  def chunk(docs: DataFrame, winSize: Int = 64, step: Int = 48): DataFrame = {
    val toks = split(trim(col("text")), "\\s+")
    docs.select(col("doc_id"), toks.as("toks"))
      .select(col("doc_id"),
        posexplode(transform(
          sequence(lit(0),
            greatest(((size(col("toks")) - 1) / lit(step)).cast("int"), lit(0))),
          i => slice(col("toks"), i * step + 1, lit(winSize))))
          .as(Seq("chunk_idx", "chunk")))
      .filter(size(col("chunk")) > 0)
      .select(col("doc_id"), col("chunk_idx"),
        size(col("chunk")).as("n_tokens"),
        array_join(col("chunk"), " ").as("chunk_text"))
  }

  /** Deterministic stratified sampling: within each stratum, rank rows
    * by a content-independent hash of their id (md5 — reproducible in
    * any engine) and keep the first `perStratum`. Unlike Bernoulli
    * sampleBy this gives EXACT quota sizes and bit-reproducible
    * selections across engines/runs — the auditability a training-data
    * freeze needs. One shuffle on the stratum key. */
  def stratifiedSample(df: DataFrame, stratumCol: String, idCol: String,
                       perStratum: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= perStratum)
      .drop("__rn")
  }

  /** Deterministic weighted sampling WITHOUT replacement
    * (Efraimidis-Spirakis A-ES): each row draws a reproducible uniform
    * u from md5 of its id and competes with key ln(u)/w — the k
    * largest keys are exactly a w-weighted sample without replacement.
    * Selection is content-independent and engine-reproducible (the
    * uniform is hash-derived, the output carries no float), so any
    * engine re-derives the same sample — the quality-weighted
    * subsampling step of a data freeze, auditable like
    * [[stratifiedSample]].
    *
    * Scale: the key is a map-only projection and the top-k plans as
    * TakeOrderedAndProject (per-partition heaps + driver merge of k
    * rows, no global sort, no shuffle of the corpus). For corpus-scale
    * k (billions of survivors) switch to the threshold variant: take
    * the k-th key on a sample, keep rows above it map-only, and
    * top-up — same keys, no global ordering at all. */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
                     k: Int): DataFrame = {
    val u = (conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
      .cast("double") + lit(0.5)) / lit(4294967296.0)
    val key = log(u) / col(weightCol).cast("double")
    df.withColumn("__key", key)
      .orderBy(col("__key").desc, col(idCol))
      .limit(k)
      .drop("__key")
  }

  /** BPE merge-candidate counting — the scoring step a byte-pair-
    * encoding tokenizer trainer runs each merge round: count adjacent
    * character pairs inside words, weighted by corpus word frequency.
    * The corpus is reduced to its VOCABULARY first (the one shuffle;
    * 100 TB of text collapses to ~millions of distinct words), then
    * pairs explode over vocab rows only and reduce map-side — the
    * reason real BPE trainers count words before counting pairs. All
    * counts are integers: exact in any engine. */
  def bpePairCounts(docs: DataFrame, topK: Int): DataFrame = {
    val wordFreq = docs
      .select(explode(split(lower(trim(col("text"))), "\\s+")).as("word"))
      .filter(length(col("word")) >= 2)
      .groupBy(col("word")).agg(count(lit(1)).as("f"))
    wordFreq
      .select(explode(transform(sequence(lit(1), length(col("word")) - 1),
        i => col("word").substr(i, lit(2)))).as("pair"), col("f"))
      .groupBy(col("pair")).agg(sum(col("f")).as("n"))
      .orderBy(col("n").desc, col("pair"))
      .limit(topK)
  }

  /** FULL BPE MERGE LEARNING (Sennrich et al. 2016) — the iterative
    * loop [[bpePairCounts]] is one round of: represent each vocabulary
    * word as char symbols (+ the `</w>` end marker), then `merges`
    * times pick the most frequent adjacent symbol pair (count desc,
    * then lexicographic — a total order, so the learned table is
    * deterministic) and fuse it everywhere.
    *
    * Scale shape: the corpus is reduced to (word, count) ONCE (the one
    * corpus shuffle — the reason real BPE trainers count words before
    * counting pairs); every iteration then runs over the vocab
    * relation only: a map-side-combinable pair count, a 1-ROW argmax
    * collect (the bounded driver state, same discipline as the Lloyd /
    * k-center loops), and a map-only fold that rewrites each word's
    * symbol array via codegen'd `aggregate` — leftmost-first
    * non-overlapping exactly because the fused symbol becomes the
    * fold's tail. 100 TB of text is ~millions of distinct words, so
    * iterations cost vocab-sized shuffles regardless of corpus size.
    * Output: the merge table (step, left, right, merged, pair_count) —
    * spec-pinned against an independent in-test reference
    * implementation on a planted corpus. */
  def bpeLearn(docs: DataFrame, merges: Int = 12): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val words = docs
      .select(explode(split(lower(trim(col("text"))), "\\s+")).as("w"))
      .filter(length(col("w")) >= 1)
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
    var vocab = words
      .select(col("cnt"),
        concat(filter(split(col("w"), ""), s => s =!= ""),
          array(lit("</w>"))).as("syms"))
      .localCheckpoint(true)
    val rules = scala.collection.mutable.Buffer.empty[(Int, String, String, String, Long)]
    var step = 1
    var exhausted = false
    while (step <= merges && !exhausted) {
      val top = vocab
        .select(col("cnt"), explode(zip_with(
          slice(col("syms"), lit(1), size(col("syms")) - 1),
          slice(col("syms"), lit(2), size(col("syms")) - 1),
          (x, y) => struct(x.as("l"), y.as("r")))).as("p"))
        .groupBy(col("p.l"), col("p.r"))
        .agg(sum(col("cnt")).as("pc"))
        .orderBy(col("pc").desc, col("l"), col("r"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r, pc) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        val merged = l + r
        rules += ((step, l, r, merged, pc))
        // LAZY checkpoint (r16): the next round's argmax job
        // materializes the rewrite as its first action — lineage stays
        // flat (truncated on materialization) but each merge round now
        // runs ONE job instead of two, and the final round's rewrite
        // (which nothing reads) runs zero. The loop is pure driver-job
        // latency at any SF, so halving the job count halves the query.
        vocab = vocab.withColumn("syms",
            aggregate(
              slice(col("syms"), lit(2), greatest(size(col("syms")) - 1, lit(0))),
              slice(col("syms"), lit(1), lit(1)),
              (acc, s) => when(element_at(acc, lit(-1)) === lit(l) && s === lit(r),
                  concat(slice(acc, lit(1), size(acc) - 1), array(lit(merged))))
                .otherwise(concat(acc, array(s)))))
          .localCheckpoint(false)
        step += 1
      }
    }
    rules.toSeq.toDF("step", "left", "right", "merged", "pair_count")
  }

  /** BPE ENCODE — [[bpeLearn]]'s application half: tokenize the corpus
    * with a learned merge table and report per-doc BPE token counts +
    * FERTILITY (BPE tokens per word — the tokenizer-quality number a
    * vocab is judged by). The merge rules are applied IN LEARNED ORDER
    * (the BPE contract) to the distinct-word vocabulary only — M
    * chained codegen'd folds over the ≤vocab-sized relation — and the
    * corpus then just joins word → token count: the per-word encode
    * work is vocabulary-sized no matter the corpus, and the per-doc
    * reduce is one map-side-combinable shuffle. */
  def bpeEncode(docs: DataFrame, rules: Seq[(String, String)]): DataFrame = {
    val words = docs
      .select(col("doc_id"),
        explode(split(lower(trim(col("text"))), "\\s+")).as("w"))
      .filter(length(col("w")) >= 1)
    val vocab0 = words.select(col("w")).distinct()
      .withColumn("syms",
        concat(filter(split(col("w"), ""), s => s =!= ""), array(lit("</w>"))))
    val encoded = rules.foldLeft(vocab0) { case (v, (l, r)) =>
      v.withColumn("syms",
        aggregate(
          slice(col("syms"), lit(2), greatest(size(col("syms")) - 1, lit(0))),
          slice(col("syms"), lit(1), lit(1)),
          (acc, s) => when(element_at(acc, lit(-1)) === lit(l) && s === lit(r),
              concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
            .otherwise(concat(acc, array(s)))))
    }.select(col("w"), size(col("syms")).cast("long").as("n_bpe"))
    words.join(encoded, Seq("w"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"), sum(col("n_bpe")).as("n_bpe_tokens"))
      .withColumn("fertility",
        round(col("n_bpe_tokens").cast("double") / col("n_words"), 6))
  }

  /** Collocation mining: PMI-ranked adjacent-token bigrams over the
    * corpus — the phrase-discovery pass (e.g. word2vec-style phrase
    * joining, tokenizer-vocab seeding). Three reduce shuffles total
    * (unigram counts, bigram counts, scalar totals); the PMI join
    * touches only the REDUCED vocab/bigram relations, never the token
    * stream, so the post-reduce cost is vocabulary-sized at any corpus
    * scale. PMI is computed in double (never long products — a corpus
    * total squared overflows BIGINT at ~3 B tokens) with the exact
    * expression shape the oracle shares, then rounded; top-K rides
    * TakeOrderedAndProject on the (pmi, w1, w2) total order. */
  def collocations(docs: DataFrame, minCount: Long = 5, topK: Int = 50): DataFrame = {
    val tk = docs.select(split(lower(trim(col("text"))), "\\s+").as("tk"))
    val uni = tk.select(explode(col("tk")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cw"))
    // totals COUNT the exploded streams rather than summing size(tk):
    // size(NULL) is -1 in Spark but len(NULL) is NULL in DuckDB — a
    // null-text doc would silently skew a size-sum on one engine only
    // (the adversarial-null divergence class of the SURVEY audit);
    // explode and unnest agree: null array → no rows.
    val tot = tk.select(explode(col("tk")).as("w")).agg(count(lit(1)).as("ntok"))
    val withPairs = tk.filter(size(col("tk")) >= 2)
    val pairs = withPairs
      .select(explode(transform(sequence(lit(0), size(col("tk")) - 2),
        i => struct(element_at(col("tk"), i + 1).as("w1"),
          element_at(col("tk"), i + 2).as("w2")))).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
    val big = pairs.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cxy"))
    val nb = pairs.agg(count(lit(1)).as("nbig"))
    big.filter(col("cxy") >= minCount)
      .join(uni.select(col("w").as("w1"), col("cw").as("c1")), Seq("w1"))
      .join(uni.select(col("w").as("w2"), col("cw").as("c2")), Seq("w2"))
      .crossJoin(broadcast(tot)).crossJoin(broadcast(nb))
      .withColumn("pmi", round(log(
        (col("cxy").cast("double") * col("ntok") * col("ntok")) /
          (col("nbig").cast("double") * col("c1") * col("c2"))), 6))
      .orderBy(col("pmi").desc, col("w1"), col("w2"))
      .limit(topK)
      .select(col("w1"), col("w2"), col("cxy"), col("pmi"))
  }

  /** Temperature-scaled domain mixture — the multilingual-training
    * reweighting (e.g. mT5 §3.1): per-source sampling weight
    * w_i ∝ p_i^(1/T) with T = 2, i.e. sqrt — chosen because IEEE sqrt
    * is correctly rounded, so the weights are bit-identical in any
    * engine, unlike pow(p, α). The per-source relation is tiny
    * (|sources| rows) — the only corpus-sized work is the one token
    * reduce; the normalizing sum is a double over that handful of
    * rows, and the ulp-level order sensitivity it carries sits ~10
    * orders of magnitude below the round(6)/round-to-integer surface
    * (a DECIMAL cast would NOT help here: Spark's double→decimal goes
    * through the shortest decimal representation while DuckDB rounds
    * the exact binary expansion, which diverges at scale ≥ 15).
    * Returns the datasheet a sampler consumes: share p, weight w, and
    * the token allocation out of `budgetTokens`. */
  def temperatureMix(docs: DataFrame, budgetTokens: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // whole-relation windows (NOT branch-and-rejoin): branching the
    // per-source aggregate into scalar sub-queries re-plans the corpus
    // reduce once per branch — three full scans for one datasheet. The
    // windows collapse to a single-partition pass over the
    // |sources|-row relation, so the corpus is read exactly once and
    // the "single partition" is bounded by the source vocabulary, not
    // the data.
    val w = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    docs
      // null text → null count (NOT size()'s -1), so the token sum
      // skips it on both engines (the adversarial-null class)
      .select(col("source"),
        when(col("text").isNotNull, reTokens(col("text")))
          .cast("long").as("nt"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("tokens"))
      .withColumn("tt", sum(col("tokens")).over(w))
      .withColumn("p", col("tokens").cast("double") / col("tt"))
      .withColumn("sq", sqrt(col("p")))
      .withColumn("s", sum(col("sq")).over(w))
      .withColumn("w", col("sq") / col("s"))
      .select(col("source"), col("n_docs"), col("tokens"),
        round(col("p"), 6).as("p"), round(col("w"), 6).as("w"),
        round(col("w") * budgetTokens).cast("long").as("alloc_tokens"))
  }

  /** THE n-token window-hash expression — md5 of each space-joined
    * n-token slice of a token array. ONE definition shared by every
    * shingle consumer (decontaminate/text_decontam, sourceOverlap,
    * Dedup.duplicatedSpans) so the hash can never drift between the
    * ops — and between their DuckDB oracles, which all share the
    * array_to_string/md5 formulation. */
  private[pipeline] def shingleHashCol(tkCol: Column, n: Int): Column =
    transform(sequence(lit(0), size(tkCol) - n),
      i => md5(array_join(slice(tkCol, i + 1, lit(n)), " ")))

  /** Distinct n-token shingle hashes per key column (lowercased
    * whitespace tokens, md5 of the space-joined shingle — reproducible
    * in any engine). One per-row generate, no shuffle: the unit of
    * benchmark-overlap decontamination. Rows shorter than n tokens
    * yield no shingles. */
  def shingleHashes(docs: DataFrame, n: Int, keyCol: String = "doc_id"): DataFrame = {
    val toks = split(lower(trim(col("text"))), "\\s+")
    docs.select(col(keyCol), toks.as("toks"))
      .filter(size(col("toks")) >= n)
      .select(col(keyCol),
        explode(array_distinct(shingleHashCol(col("toks"), n))).as("sh"))
  }

  /** NOVELTY scoring — the curriculum/ordering signal: per doc, the
    * fraction of its distinct n-token shingles whose corpus-wide FIRST
    * occurrence (min doc_id — deterministic, the ingestion order
    * surrogate) is this doc. A crawl snapshot full of already-seen
    * n-grams scores ~0 and adds little; novelty ~1 is genuinely new
    * text. The aggregate complement of [[Dedup.duplicatedSpans]]'s
    * per-span view. Docs shorter than n tokens are omitted (no
    * shingle evidence).
    *
    * Scale: first-occurrence is a min window over partitionBy(sh) on
    * the per-doc distinct (doc_id, sh) stream — ONE corpus shingle
    * explode and ONE sh exchange, then the doc_id reduce. The
    * groupBy(sh)+rejoin formulation explodes the corpus twice and (at
    * scale, where the distinct-shingle relation cannot broadcast)
    * shuffles it twice more for the SMJ. Plan-pinned. */
  def noveltyScore(docs: DataFrame, n: Int = 8): DataFrame =
    noveltyFromShingles(shingleHashes(docs, n))

  /** The novelty derivation over an already-exploded per-doc distinct
    * (doc_id, sh) relation — the plan both the batch operator and the
    * streaming twin's serving face run (FactStream.noveltyScores), so
    * streamed == batch by construction. min(doc_id) is associative, so
    * first-occurrence over a union of batch sidecars equals the batch
    * corpus answer under any batch boundaries. */
  def noveltyFromShingles(ds: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    ds.withColumn("first_doc",
        min(col("doc_id")).over(Window.partitionBy(col("sh"))))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L))
          .as("n_novel"))
      .select(col("doc_id"), col("n_shingles"), col("n_novel"),
        round(col("n_novel") / col("n_shingles").cast("double"), 6)
          .as("novelty"))
  }

  /** Corpus n-gram DATASHEET — the numbers that size a dedup/decontam
    * deployment before it runs (how many distinct shingles will the
    * state hold? how heavy is the df tail the maxDf cap will trim?):
    * distinct n-token shingles, total per-doc-distinct instances,
    * singleton fraction (shingles seen in exactly one doc — the mass
    * dedup can never act on), max and mean document frequency. ONE
    * shingle reduce (map-side combinable) + a one-row fold. */
  def ngramStats(docs: DataFrame, n: Int = 8): DataFrame = {
    val dfRel = shingleHashes(docs, n)
      .groupBy(col("sh")).agg(count(lit(1)).as("df"))
    dfRel.agg(count(lit(1)).as("n_distinct"),
        sum(col("df")).as("n_instances"),
        sum(when(col("df") === 1, 1L).otherwise(0L)).as("n_singletons"),
        max(col("df")).as("max_df"))
      .select(col("n_distinct"), col("n_instances"), col("n_singletons"),
        col("max_df"),
        round(col("n_singletons") / col("n_distinct").cast("double"), 6)
          .as("singleton_frac"),
        round(col("n_instances") / col("n_distinct").cast("double"), 6)
          .as("mean_df"))
  }

  /** BOILERPLATE REPORT — the accounting half of the maxDf discipline
    * ([[Dedup.shingleContainment]] / [[sourceOverlap]] exclude
    * high-df shingles from pair evidence; this op is where those
    * shingles get LOOKED AT instead of silently dropped): the topK
    * most widely shared n-token shingles with their document
    * frequency and an example doc — the crawl-template/footer
    * inventory a curation run reviews before freezing a corpus.
    * Scale shape: per-doc distinct shingle stream (array_distinct
    * map-side, no corpus-wide distinct shuffle) → one count/min
    * aggregate by sh (map-side combinable) → global top-k via
    * TakeOrderedAndProject (heap per partition, never a full sort).
    * Total order (df desc, sh asc) ⇒ engine-deterministic under
    * ties at the limit boundary. */
  def boilerplateReport(docs: DataFrame, n: Int = 8, minDf: Int = 2,
                        topK: Int = 100): DataFrame =
    shingleHashes(docs.filter(col("doc_id").isNotNull), n)
      .groupBy(col("sh"))
      .agg(count(lit(1)).as("df"), min(col("doc_id")).as("example_doc"))
      .filter(col("df") >= minDf)
      .orderBy(col("df").desc, col("sh").asc)
      .limit(topK)

  /** Benchmark decontamination: flag every training document sharing
    * at least one n-token shingle with the eval/benchmark set, with the
    * count of distinct shared shingles — the contamination gate run
    * before any training-data freeze. The eval side (a benchmark suite,
    * tiny next to a 100 TB corpus) is distinct-reduced and BROADCAST,
    * so the corpus-sized side is a single map-only scan: shingle
    * generate → broadcast hash semijoin → per-doc count, one shuffle
    * (the final groupBy). */
  def decontaminate(train: DataFrame, evalDocs: DataFrame, n: Int = 8): DataFrame = {
    val evalSh = shingleHashes(evalDocs, n).select(col("sh")).distinct()
    shingleHashes(train, n)
      .join(broadcast(evalSh), "sh")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_contaminated"))
  }

  /** [[decontaminate]]'s SCALE path — same exact output, different
    * plan shape for the regime where the eval shingle set itself is
    * too large to broadcast (a union of benchmark suites can carry
    * billions of shingles; the distinct md5 set costs ≥48 B/entry in
    * a broadcast hash relation, while a 1%-fpp Bloom sketch costs
    * ~1.2 B/entry — ~40× smaller, and built distributedly with only
    * the sketch ever reaching the driver).
    *
    * Shape: eval shingles → count (one agg over the SMALL side, sizes
    * the sketch) → `stat.bloomFilter` (distributed build) → corpus
    * shingle stream probed by the codegen'd [[graft.functions.BloomMightContain]]
    * INSIDE the map-only generate stage → only candidates (true
    * matches + fpp×corpus false positives) reach the exact verify
    * join, which therefore shuffles ~fpp of the corpus shingle stream
    * instead of all of it — and needs no broadcast of the eval side.
    * No false negatives (Bloom guarantee), so verify-join output ==
    * [[decontaminate]] exactly, row for row. */
  def decontaminateBloom(train: DataFrame, evalDocs: DataFrame, n: Int = 8,
                         fpp: Double = 0.01): DataFrame = {
    val evalSh = shingleHashes(evalDocs, n).select(col("sh")).distinct()
    val items = math.max(1L, evalSh.count())
    val bloom = evalSh.stat.bloomFilter("sh", items, fpp)
    shingleHashes(train, n)
      .filter(graft.functions.BloomExpressions.bloomMightContain(col("sh"), bloom))
      .join(evalSh, "sh")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_contaminated"))
  }

  /** Pairwise cross-SOURCE contamination matrix: for every pair of
    * sources (subcorpora / crawl snapshots), the number of distinct
    * n-token shingles present in both, plus the Jaccard overlap of the
    * two shingle vocabularies — the corpus-level leakage report run
    * between subcorpora before mixing them into one training set
    * (doc-level flags are [[decontaminate]]; this is the corpus-level
    * roll-up that decides whether two sources are near-copies).
    *
    * Scale shape: per-source shingle vocabularies are reduced FIRST
    * (distinct (source, sh) — one shuffle with partial agg); the pair
    * relation is a self-join on sh of that reduced relation (fan-out
    * bounded by #sources per shingle, and #sources is small by
    * definition); per-source totals are a tiny aggregate broadcast
    * onto the pair rows. The corpus-sized position stream is scanned
    * once and never joined raw. A `maxDf` source-frequency bound
    * (same Lee et al. boilerplate discipline as
    * [[Dedup.shingleContainment]]) excludes shingles present in more
    * than maxDf sources from both the pair evidence and the n_sh
    * totals: without it one boilerplate header shared by every
    * source emits |sources|² pair rows per occurrence. The cap is a
    * window count on the same hash-by-sh exchange the self-join
    * needs — no extra shuffle; capped == uncapped on the organic
    * corpus (source count 8 << 256; spec-pinned). */
  def sourceOverlap(docs: DataFrame, n: Int = 8, maxDf: Int = 256): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // null sources can appear in no pair (the a<b comparison rejects
    // them in both engines) — filtering them up front ALSO makes all
    // three uses of this relation canonically identical, so AQE reuses
    // one materialized (source, sh) stage instead of re-exploding the
    // corpus per reference (plan-pinned)
    val sh = shingleHashes(docs.filter(col("source").isNotNull), n, keyCol = "source")
      .distinct()
      .withColumn("__df", count(lit(1)).over(Window.partitionBy(col("sh"))))
      .filter(col("__df") <= maxDf).drop("__df")
    val tot = sh.groupBy(col("source")).agg(count(lit(1)).as("n_sh"))
    val pairs = sh.as("a")
      .join(sh.as("b"), col("a.sh") === col("b.sh") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
      .agg(count(lit(1)).as("shared"))
    pairs
      .join(broadcast(tot.select(col("source").as("source_a"), col("n_sh").as("na"))),
        "source_a")
      .join(broadcast(tot.select(col("source").as("source_b"), col("n_sh").as("nb"))),
        "source_b")
      .select(col("source_a"), col("source_b"), col("shared"),
        round(col("shared").cast("double") / (col("na") + col("nb") - col("shared")), 6)
          .as("jaccard"))
  }

  /** Deterministic train/val/test split FREEZE: each row's id hashes
    * (md5 → leading 8 hex chars → integer) into one of 10000 basis-
    * point buckets; contiguous bucket ranges assign the split label —
    * [0, trainBp) train, [trainBp, valBp) val, the rest test.
    * Content-independent, engine- and run-reproducible, and a pure
    * shuffle-free projection — the auditable assignment a training-data
    * release records so any engine can re-derive exactly which rows
    * were held out. (Bernoulli `randomSplit` is none of those things:
    * partition-order-dependent and irreproducible across engines.) */
  def splitAssign(df: DataFrame, idCol: String,
                  trainBp: Int = 9000, valBp: Int = 9500): DataFrame = {
    val b = pmod(conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
      .cast("long"), lit(10000L))
    df.withColumn("split_bucket", b)
      .withColumn("split",
        when(col("split_bucket") < trainBp, lit("train"))
          .when(col("split_bucket") < valBp, lit("val"))
          .otherwise(lit("test")))
  }

  /** Deterministic sharded-export MANIFEST — the audit record a
    * training-data release writes next to its shard files: per shard,
    * the doc count, exact token sum, and an order-insensitive content
    * signature (bit_xor of each doc's 60-bit content-hash prefix, so
    * any engine re-reading a shard in any row order re-derives the
    * same signature). Shard assignment is content-independent
    * (md5(doc_id) → [0, nShards), the [[splitAssign]] discipline), so
    * the layout is reproducible and stable under re-export; one
    * map-side-combinable aggregate, one nShards-row output. */
  def exportManifest(docs: DataFrame, nShards: Int = 64): DataFrame =
    manifestPerRow(docs, nShards)
      .groupBy(col("shard"))
      .agg(manifestAggCols.head, manifestAggCols.tail: _*)

  /** The manifest's per-row projection — ONE definition shared by
    * [[exportManifest]] and the streaming manifest
    * (FactStream.manifestStream), so live and published manifests can
    * never drift. */
  private[graft] def manifestPerRow(docs: DataFrame, nShards: Int): DataFrame =
    docs.select(
      pmod(conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long"), lit(nShards.toLong)).as("shard"),
      reTokens(col("text")).cast("long").as("n_toks"),
      conv(substring(Dedup.contentHash(col("text")), 1, 15), 16, 10)
        .cast("long").as("h"))

  /** Manifest aggregates over [[manifestPerRow]]: count / exact sum /
    * bit_xor — each commutative+associative, so they merge exactly
    * across partitions AND micro-batches in any order. */
  private[graft] def manifestAggCols: Seq[Column] = Seq(
    count(lit(1)).as("n_docs"),
    sum(col("n_toks")).as("n_tokens"),
    expr("bit_xor(h)").as("content_sig"))

  /** The export itself: docs land under `outDir/docs/shard=<k>/` (one
    * directory per manifest row, written in parallel straight from the
    * shard column — no pre-shuffle; parquet splits big shards into
    * multiple files) plus the [[exportManifest]] relation at
    * `outDir/manifest/`. A consumer validates a shard by recomputing
    * count/token-sum/bit_xor over the files and comparing to the
    * manifest row — the check GroundTruthSpec performs. */
  def writeTrainingShards(docs: DataFrame, outDir: String, nShards: Int = 64): Unit = {
    val shard = pmod(conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
      .cast("long"), lit(nShards.toLong))
    docs.withColumn("shard", shard)
      .write.mode("overwrite").partitionBy("shard")
      .parquet(s"$outDir/docs")
    exportManifest(docs, nShards)
      .write.mode("overwrite").parquet(s"$outDir/manifest")
  }

  /** Gopher-style repetition signals (Rae et al. 2021 §A1.1): fraction
    * of duplicate tokens and the share of the most frequent bigram —
    * the cheap repetition gates that drop degenerate/boilerplate docs.
    * Pure per-row higher-order functions (docs are bounded; the
    * per-row cost is O(distinct·n) on a ~10² token doc), so the whole
    * operator is a shuffle-free codegen'd projection. */
  def repetition(docs: DataFrame): DataFrame = {
    val toks = split(lower(trim(col("text"))), "\\s+")
    docs.select(col("doc_id"), toks.as("toks"))
      .select(col("doc_id"),
        round(lit(1.0) -
          size(array_distinct(col("toks"))).cast("double") / size(col("toks")), 6)
          .as("dup_token_frac"),
        round(when(size(col("toks")) >= 2, {
          val bg = transform(sequence(lit(1), size(col("toks")) - 1),
            i => concat_ws(" ", element_at(col("toks"), i),
              element_at(col("toks"), i + 1)))
          array_max(transform(array_distinct(bg),
            x => size(filter(bg, y => y === x)))).cast("double") / size(bg)
        }).otherwise(lit(0.0)), 6).as("top_bigram_frac"))
  }

  /** Corpus unigram log-probability score: mean ln p(token) per
    * document, p from whole-corpus token frequencies — the self-trained
    * analog of the CCNet perplexity filter (docs far below the corpus
    * mean are gibberish; far above are boilerplate). Fully distributed:
    * one token-count shuffle, a hash join back on token (the vocabulary
    * is corpus-sized — NOT broadcastable at scale), the corpus total as
    * a broadcast 1-row aggregate, one final per-doc groupBy. */
  def unigramLogProb(docs: DataFrame): DataFrame = {
    val tok = docs.select(col("doc_id"),
      explode(split(lower(trim(col("text"))), "\\s+")).as("tok"))
    val cnt = tok.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
    val total = tok.agg(count(lit(1)).as("total"))
    tok.join(cnt, "tok").crossJoin(broadcast(total))
      .groupBy(col("doc_id"))
      .agg(round(avg(log(col("cnt") / col("total"))), 6).as("mean_logprob"))
  }

  /** DSIR-style IMPORTANCE WEIGHTS (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): score every
    * document by how much more likely its hashed-unigram bag is under
    * the TARGET corpus distribution than under the RAW corpus —
    * log w(x) = Σ_tok [ln p̂_t(b) − ln p̂_r(b)] with add-1-smoothed
    * multinomials over `buckets` md5 feature buckets (the hashing is
    * what keeps the feature space FIXED-SIZE at 100 TB: the
    * distribution tables are `buckets` rows no matter the corpus, so
    * the per-bucket log-ratio relation broadcasts). Two corpus passes:
    * one map-side-combinable groupBy to the bucket counts, one
    * bucket-ratio broadcast join + per-doc sum. `isTarget` marks the
    * in-corpus proxy for the quality target (held-out target corpora
    * union in upstream). keep = resample gate at the even-odds
    * threshold (log w > 0), derived from the ROUNDED weight so both
    * engines agree at the boundary. */
  def importanceWeights(docs: DataFrame, isTarget: Column,
                        buckets: Int = 1024): DataFrame = {
    val tok = dsirTokens(docs, isTarget, buckets)
    // grand totals derive from the ≤buckets-row counts relation inside
    // dsirScoreTokens — never a second corpus pass
    val bcnt = tok.groupBy(col("b"))
      .agg(count(lit(1)).as("n_r"),
        sum(when(col("tgt"), 1L).otherwise(0L)).as("n_t"))
    dsirScoreTokens(tok, bcnt, buckets)
  }

  /** (doc_id, tgt, b): one row per token occurrence with its md5
    * feature bucket — the shared front of the batch operator and the
    * streaming twin. */
  private[graft] def dsirTokens(docs: DataFrame, isTarget: Column,
                                buckets: Int): DataFrame =
    docs.select(col("doc_id"), isTarget.as("tgt"),
      explode(split(lower(trim(col("text"))), "\\s+")).as("tok"))
      .withColumn("b", // fused md5-dim (r15) — see hashVectors
        graft.functions.VectorExpressions.hashedDim(col("tok"), buckets))

  /** Per-bucket DSIR counts of one doc set — ≤`buckets` rows, PURELY
    * ADDITIVE (a sum of per-batch counts equals the whole-corpus
    * counts, any grouping), which is what makes the streaming sidecar
    * exact under arbitrary batch boundaries. */
  def dsirBucketCounts(docs: DataFrame, isTarget: Column,
                       buckets: Int = 1024): DataFrame =
    dsirTokens(docs, isTarget, buckets)
      .groupBy(col("b"))
      .agg(count(lit(1)).as("n_r"),
        sum(when(col("tgt"), 1L).otherwise(0L)).as("n_t"))

  /** Score a tokenized doc set against a (b, n_r, n_t) bucket-count
    * relation: totals derive from the ≤`buckets`-row relation itself
    * (no extra corpus pass), the log-ratio relation broadcasts. */
  private[graft] def dsirScoreTokens(tok: DataFrame, bcnt: DataFrame,
                                     buckets: Int): DataFrame = {
    val totals = bcnt.agg(sum(col("n_r")).as("nr"), sum(col("n_t")).as("nt"))
    val ratio = bcnt.crossJoin(broadcast(totals))
      .select(col("b"),
        (log((col("n_t") + lit(1.0)) / (col("nt") + lit(buckets.toDouble))) -
          log((col("n_r") + lit(1.0)) / (col("nr") + lit(buckets.toDouble))))
          .as("log_ratio"))
    tok.join(broadcast(ratio), Seq("b"))
      .groupBy(col("doc_id"))
      .agg(round(sum(col("log_ratio")), 6).as("log_weight"))
      .withColumn("keep", col("log_weight") > 0.0)
  }

  /** Score any doc set against a maintained bucket-count relation (the
    * serving face of the streaming DSIR sidecar). */
  def dsirScoreAgainst(docs: DataFrame, bucketCounts: DataFrame,
                       buckets: Int = 1024): DataFrame =
    dsirScoreTokens(dsirTokens(docs, lit(false), buckets), bucketCounts, buckets)

  /** BIGRAM LM quality score — the CCNet-style "LM thinks this text is
    * natural" gate one model order above [[unigramLogProb]]: per doc,
    * the mean ln p(wᵢ | wᵢ₋₁) over its bigram positions under the
    * corpus bigram MLE with add-1 smoothing over the unigram vocab
    * (p = (c(v,w)+1)/(c(v,·)+|V|)). Conditioning on context is what
    * catches shuffled-token junk that unigram frequency scoring
    * cannot: the same bag of common words scores high as a fluent
    * sentence and low as a random permutation. One corpus bigram
    * reduce (map-side combinable) + one rejoin keyed by bigram; the
    * context totals reuse the reduced relation, so no second corpus
    * pass. Docs with <2 tokens are omitted (no bigram evidence). */
  def bigramLogProb(docs: DataFrame): DataFrame = {
    val toks = split(lower(trim(col("text"))), "\\s+")
    // one zip_with pair explode — the posexplode + tk[i+1] form
    // re-evaluates the split per POSITION (a per-output-row generator
    // input), turning a linear pass quadratic in document length
    val bi = docs.select(col("doc_id"), toks.as("tk"))
      .filter(size(col("tk")) >= 2)
      .select(col("doc_id"), explode(zip_with(
        slice(col("tk"), lit(1), size(col("tk")) - 1),
        slice(col("tk"), lit(2), size(col("tk")) - 1),
        (x, y) => struct(x.as("v"), y.as("w")))).as("p"))
      .select(col("doc_id"), col("p.v").as("v"), col("p.w").as("w"))
    val cnt = bi.groupBy(col("v"), col("w")).agg(count(lit(1)).as("c_vw"))
    val ctx = cnt.groupBy(col("v")).agg(sum(col("c_vw")).as("c_v"))
    val vocab = docs.select(explode(toks).as("tok")).agg(
      countDistinct(col("tok")).as("vsz"))
    bi.join(cnt, Seq("v", "w")).join(ctx, Seq("v"))
      .crossJoin(broadcast(vocab))
      .groupBy(col("doc_id"))
      .agg(round(avg(log((col("c_vw") + lit(1.0)) / (col("c_v") + col("vsz")))), 6)
        .as("mean_bigram_logprob"))
  }

  /** DOMAIN-MIXTURE sampling — the data-mixing step that turns a
    * curated multi-language corpus into a training mix with target
    * per-domain token proportions: each language's quota is
    * `weight × totalTokens`, and documents fill it greedily in a
    * deterministic md5(doc_id) order (the same reproducible-sample
    * discipline as sample_stratified, but quota'd in TOKENS, which is
    * what a training run budgets). A doc is kept iff the tokens taken
    * BEFORE it are still under its language's quota — the boundary doc
    * is included, languages without a weight get quota 0. The
    * oracle-divergence classes of the SURVEY audit table are all
    * handled: no HUGEINT (BIGINT-cast cumulative sums), total order
    * via the doc_id tie-break, integer quota arithmetic.
    *
    * TWO-PHASE at scale: a naive `Window.partitionBy(pred_lang)`
    * cumulative sum serializes each language through ONE reducer — at
    * 100 TB the majority language is ~60% of the corpus in a single
    * window partition, a genuine scale-killer. Instead: (1) aggregate
    * token sums per (language, 4-hex-char md5 prefix) — 65k coarse
    * buckets whose order IS the md5 order; (2) a cumulative sum over
    * that TINY aggregated relation finds each language's boundary
    * bucket; (3) whole buckets strictly below the boundary keep
    * everything with no window at all, buckets at/after the quota drop
    * everything, and ONLY the boundary bucket (corpus/65k rows) runs
    * the fine-grained cumulative window. Output is IDENTICAL to the
    * naive window (same md5 total order; the oracle stays the direct
    * formulation) — only the plan changes. */
  def domainMix(docs: DataFrame, weights: Map[String, Double],
                totalTokens: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = docs.select(col("doc_id"),
      predLangCol(col("text")).as("pred_lang"),
      reTokens(col("text")).cast("long").as("n_tokens"))
      .withColumn("h", md5(col("doc_id").cast("string")))
      .withColumn("hb", substring(col("h"), 1, 4))
    val quota = weights.foldLeft(lit(0L)) { case (acc, (l, wt)) =>
      when(col("pred_lang") === l, lit((wt * totalTokens).toLong)).otherwise(acc)
    }
    // phase 1: coarse per-bucket token sums — at most langs × 65536
    // rows, so the cumulative window over it is trivially small
    val wb = Window.partitionBy(col("pred_lang")).orderBy(col("hb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cutoffs = base.groupBy(col("pred_lang"), col("hb"))
      .agg(sum(col("n_tokens")).as("bt"))
      .withColumn("cum_before", sum(col("bt")).over(wb) - col("bt"))
      .withColumn("q", quota)
      // fullkeep: every doc's tokens-before is < quota even at the
      // bucket's end; boundary: the quota lands inside; else drop
      .withColumn("fullkeep", col("cum_before") + col("bt") < col("q"))
      .withColumn("boundary", !col("fullkeep") && col("cum_before") < col("q"))
      .filter(col("fullkeep") || col("boundary"))
      .select(col("pred_lang"), col("hb"), col("cum_before"),
        col("q"), col("boundary"))
    // phase 2: surviving buckets join back (broadcast — the cutoff
    // relation is tiny). Full-keep rows pass straight through with NO
    // window; only boundary-bucket rows (≈ corpus/65k per language)
    // enter the fine cumulative window, whose partition is one coarse
    // bucket — never a whole language.
    val joined = base.join(broadcast(cutoffs), Seq("pred_lang", "hb"))
    val out = Seq(col("doc_id"), col("pred_lang"), col("n_tokens"))
    val fullKeep = joined.filter(!col("boundary")).select(out: _*)
    val wf = Window.partitionBy(col("pred_lang"), col("hb"))
      .orderBy(col("h"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val boundary = joined.filter(col("boundary"))
      .withColumn("cum_in", sum(col("n_tokens")).over(wf))
      .filter(col("cum_before") + col("cum_in") - col("n_tokens") < col("q"))
      .select(out: _*)
    fullKeep.unionAll(boundary)
  }

  /** Perplexity TAIL-DROP (the CCNet-style LM filter): per language,
    * rank documents by the corpus-unigram mean log-prob
    * ([[unigramLogProb]] — higher = more typical) and keep the top
    * `keepFrac` by percent_rank. Ranking rides the ROUNDED logprob
    * (the oracle-shared value) with a doc_id tie-break — a total
    * order, so the kept set is engine-deterministic; percent_rank is
    * (rank−1)/(n−1) over identical integers in both engines, so the
    * boundary comparison is bit-identical.
    *
    * DISTRIBUTED ranking: a naive
    * `percent_rank().over(partitionBy(pred_lang))` funnels each
    * language through one reducer — the same 100 TB scale-killer as a
    * single-partition sort. Instead rank = (docs with a strictly
    * better ROUNDED logprob) + (row_number within the tie group):
    * the doc-level window partitions by (language, exact logprob
    * value) — tie-group-sized, never language-sized — and the
    * strictly-better counts come from a cumulative window over the
    * per-(language, value) AGGREGATED relation (one row per distinct
    * rounded value). pr = (rank−1)/(n−1) explicitly, n==1 → 0.0 —
    * the exact arithmetic both engines' percent_rank uses, so the
    * result is bit-identical to the direct oracle formulation. */
  def pplFilter(docs: DataFrame, keepFrac: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lp = langId(docs).join(unigramLogProb(docs), "doc_id")
    val wv = Window.partitionBy(col("pred_lang"), col("mean_logprob"))
      .orderBy(col("doc_id"))
    val ranked = lp.withColumn("r_in", row_number().over(wv))
    val wc = Window.partitionBy(col("pred_lang"))
      .orderBy(col("mean_logprob").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wn = Window.partitionBy(col("pred_lang"))
    val cum = lp.groupBy(col("pred_lang"), col("mean_logprob"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("cum_before", sum(col("cnt")).over(wc) - col("cnt"))
      .withColumn("n", sum(col("cnt")).over(wn))
    val rank = col("cum_before") + col("r_in")
    val pr = when(col("n") === 1, lit(0.0))
      .otherwise((rank - lit(1)).cast("double") / (col("n") - lit(1)).cast("double"))
    ranked.join(cum, Seq("pred_lang", "mean_logprob"))
      .withColumn("pr", pr)
      .filter(col("pr") <= lit(keepFrac))
      .select(col("doc_id"), col("pred_lang"), col("mean_logprob"),
        round(col("pr"), 6).as("ppl_rank"))
  }

  /** The fused per-row projection under [[corpusProfile]] — also the
    * map side of the streaming live datasheet (FactStream
    * .profileStream), so the batch and streaming metrics can never
    * drift apart. */
  private[graft] def profilePerRow(docs: DataFrame): DataFrame = {
    val hasPii = col("text").rlike(PiiEmailRe) || col("text").rlike(PiiSsnRe) ||
      col("text").rlike(PiiDigitsRe)
    docs.select(col("source") +:
        predLangCol(col("text")).as("pred_lang") +:
        reTokens(col("text")).cast("long").as("n_toks") +:
        hasPii.cast("long").as("has_pii") +:
        qualityMetricCols.drop(1): _*)
      .withColumn("quality_score", qualityScoreCol)
  }

  /** The datasheet aggregate columns over [[profilePerRow]] output —
    * shared by the batch rollup and the streaming leaf-cell
    * aggregation. */
  private[graft] def profileAggCols: Seq[Column] = Seq(
    count(lit(1)).as("n_docs"),
    sum(col("n_toks")).as("n_tokens"),
    round(avg(col("quality_score")), 6).as("avg_quality"),
    round(avg(col("has_pii")), 6).as("pii_frac"))

  /** Corpus DATASHEET: the profiling rollup a training-data release
    * publishes — per (source, language) cell plus per-source and
    * whole-corpus totals (ROLLUP), each with document count, exact
    * token sum, mean quality score and the PII-hit rate. Every per-row
    * metric (language id, quality, PII probe) is computed in ONE fused
    * corpus scan; the only shuffle is the grouping-sets aggregate,
    * which is map-side combinable. Token totals ride the integer
    * token count (BIGINT in both engines — no float-sum divergence);
    * the two double means are round(6) on an n·ε-bounded average. */
  def corpusProfile(docs: DataFrame): DataFrame = {
    val perRow = profilePerRow(docs)
    // rollup labels surface as the '<all>' sentinel, not NULL: the
    // datasheet is a published artifact and NULL-vs-NULL ordering is
    // exactly the kind of engine-dependent edge the oracle-divergence
    // table exists to keep out of the comparable surface
    perRow
      .rollup(col("source"), col("pred_lang"))
      .agg(profileAggCols.head, profileAggCols.tail: _*)
      .select(coalesce(col("source"), lit("<all>")).as("source"),
        coalesce(col("pred_lang"), lit("<all>")).as("pred_lang"),
        col("n_docs"), col("n_tokens"), col("avg_quality"), col("pii_frac"))
  }

  /** Greedy sequence PACKING (concat-and-chunk): assign every document
    * to the fixed-`budget`-token training sequence its FIRST token
    * lands in — the step that turns a curated corpus into LM training
    * rows. Documents are concatenated in deterministic doc_id order
    * WITHIN `shards` hash shards and a running token total places each
    * doc: pack = floor(start / budget), pack_offset = start % budget
    * where start = cumulative tokens before the doc.
    *
    * Scale shape: shard-parallel — ONE window shuffle on the shard
    * key, no global sort. A single global concatenation order is
    * pointless at 100 TB (and serializes the window); per-shard
    * deterministic order is exactly what distributed packing pipelines
    * do (each shard's packs are consumed independently by a data
    * loader). Sharding here is doc_id mod (pmod — non-negative even
    * for negative ids, matched by the oracle's ((x%n)+n)%n);
    * production would hash.
    *
    * Determinism under adversarial ids: the window orders by
    * (doc_id, n_tokens) — duplicate doc_ids with differing token
    * counts still get a total order, and fully-identical rows are
    * interchangeable, so the OUTPUT MULTISET is engine-deterministic.
    * pack uses integer `div` (not Double division, which silently
    * loses exactness past 2^53 cumulative tokens).
    *
    * `keep` carries extra input columns (e.g. the text payload for a
    * training-row sink) through the shard window — they ride the ONE
    * existing shuffle instead of costing a join back to the corpus.
    * Kept columns join the window's tie-break order: without that, two
    * rows tied on (doc_id, n_tokens) but differing in a kept column
    * would swap pack coordinates run-to-run, breaking the sealed-dir
    * idempotency the streaming sink relies on. */
  def packSequences(docs: DataFrame, budget: Int, shards: Int = 32,
                    keep: Seq[String] = Nil): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs.select(col("doc_id") +:
      reTokens(col("text")).cast("long").as("n_tokens") +:
      pmod(col("doc_id"), lit(shards.toLong)).as("shard") +:
      keep.map(col): _*)
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("doc_id") +: col("n_tokens") +: keep.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    toks.withColumn("start", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .select(col("doc_id") +: col("n_tokens") +: col("shard") +:
        expr(s"start div ${budget.toLong}").as("pack") +:
        (col("start") % lit(budget.toLong)).as("pack_offset") +:
        keep.map(col): _*)
  }

  /** Content fingerprint: md5 of whitespace-normalized lowercase text,
    * plus a 48-bit numeric bucket of it (for cheap equality joins). */
  def fingerprint(docs: DataFrame): DataFrame = {
    val normalized = regexp_replace(lower(trim(col("text"))), "\\s+", " ")
    docs.select(col("doc_id"), md5(normalized).as("fp"),
      conv(substring(md5(normalized), 1, 6), 16, 10).cast("long").as("fp_bucket"))
  }

  /** BM25 keyword relevance of every document against a fixed query
    * term set (Robertson/Sparck-Jones; the keyword half of hybrid
    * retrieval). ONE corpus-sized shuffle — the (doc, token) tf
    * reduce; doc length and query-term document frequency both derive
    * from that already-reduced relation (Catalyst reuses the
    * exchange), and the per-term weights join only the QUERY-TERM
    * slice of tf, so post-reduce work is query-hit-sized, not
    * corpus-sized. N/avgdl ride in as a broadcast one-row aggregate.
    * Exact-decimal summation of the per-term weights keeps the score
    * independent of partition order (the dsum discipline). */
  def bm25(docs: DataFrame, terms: Seq[String],
           k1: Double = 1.2, b: Double = 0.75): DataFrame =
    // tf materialized once (r16) — same multi-consumer audit as
    // hybridRetrieve: qtf/dl/stats each re-ran the tokenize pipeline
    bm25FromTf(termFrequencies(docs).localCheckpoint(true), terms, k1, b)

  /** The (doc_id, tok, tf) term-frequency relation — THE corpus-sized
    * shuffle of the text-retrieval family; [[bm25FromTf]] and the
    * hybrid embedding branch both derive from it so a fused pipeline
    * pays the corpus explode exactly once (ReusedExchange). */
  def termFrequencies(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        explode(split(lower(trim(col("text"))), "\\s+")).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))

  /** Doc lengths from the tf relation (a reduce over the already-
    * reduced tf — index-build-time work in the serving architecture). */
  private[graft] def docLengths(tf: DataFrame): DataFrame =
    tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))

  /** Corpus stats (N, exact avgdl) from the dl relation — one row. */
  private[graft] def bm25Stats(dl: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    dl.agg(count(lit(1)).as("n"),
      (sum(col("dl").cast(DecimalType(25, 6))).cast(DoubleType) /
        count(lit(1))).as("avgdl"))
  }

  def bm25FromTf(tf: DataFrame, terms: Seq[String],
                 k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val dl = docLengths(tf)
    bm25FromParts(tf, dl, bm25Stats(dl), terms, k1, b)
  }

  /** The query-time half of BM25 — everything here is query-hit-sized
    * or key-sized given prebuilt tf/dl/stats relations (the persisted
    * retrieval-index serving path). */
  private[graft] def bm25FromParts(tf: DataFrame, dl: DataFrame,
                                   stats: DataFrame, terms: Seq[String],
                                   k1: Double = 1.2,
                                   b: Double = 0.75): DataFrame = {
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    val qtf = tf.filter(col("tok").isin(terms: _*))
    val dfreq = qtf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    qtf.join(broadcast(dfreq), "tok")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log((col("n") - col("df") + 0.5) / (col("df") + 0.5) + 1.0))
      .withColumn("wt", col("idf") * (col("tf") * lit(k1 + 1.0)) /
        (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy(col("doc_id"))
      .agg(round(sum(col("wt").cast(DecimalType(25, 6))).cast(DoubleType), 6)
        .as("bm25"))
  }

  /** BATCH multi-query BM25 — N query term-sets scored in ONE pass
    * (the sim_ann_batch amortization applied to keyword retrieval):
    * the queries become a tiny broadcast (qid, tok) relation joined
    * against tf once, weights aggregate per (qid, doc), and the
    * per-query top-k rank filter compiles to a map-side
    * WindowGroupLimit. Per-term df here is CORPUS document frequency
    * (count over tf per token), identical to the single-query scorer's
    * value for every term it shares. */
  def bm25Batch(docs: DataFrame, queries: Map[String, Seq[String]],
                topK: Int = 10, k1: Double = 1.2,
                b: Double = 0.75): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    val spark = docs.sparkSession
    import spark.implicits._
    // tf materialized once (r16) — same multi-consumer audit as
    // hybridRetrieve: dl and the two query-slice consumers each re-ran
    // the tokenize+explode+partial-agg pipeline without it
    val tf = termFrequencies(docs).localCheckpoint(true)
    val dl = docLengths(tf)
    val stats = bm25Stats(dl)
    val qrel = queries.toSeq
      .flatMap { case (qid, terms) => terms.map(qid -> _) }
      .toDF("qid", "tok")
    val allTerms = queries.values.flatten.toSeq.distinct
    val qtf = tf.filter(col("tok").isin(allTerms: _*))
    val dfreq = qtf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val scored = qtf.join(broadcast(qrel), "tok")
      .join(broadcast(dfreq), "tok")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log((col("n") - col("df") + 0.5) / (col("df") + 0.5) + 1.0))
      .withColumn("wt", col("idf") * (col("tf") * lit(k1 + 1.0)) /
        (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy(col("qid"), col("doc_id"))
      .agg(round(sum(col("wt").cast(DecimalType(25, 6))).cast(DoubleType), 6)
        .as("bm25"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("bm25").desc, col("doc_id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= topK)
      .select(col("qid"), col("rk"), col("doc_id"), col("bm25"))
  }

  /** Hybrid retrieval: BM25 keyword top-k fused with hashing-trick
    * embedding cosine top-k by reciprocal-rank fusion
    * (score = Σ 1/(rrfK + rank) over the lists a doc appears in) —
    * the standard BM25+vector serving shape. Each list is a
    * TakeOrderedAndProject (no global sort); rank windows and the
    * fusion join run over the two k-row lists only, so everything
    * after the two scans is kPerList-sized regardless of corpus size.
    * The query's own embedding comes from the SAME hashEmbedding
    * operator applied to the query string (a one-row job; the k×dim
    * collect is a parameter fetch, not a data scan). */
  def hybridRetrieve(docs: DataFrame, terms: Seq[String], dims: Int = 64,
                     kPerList: Int = 50, kFinal: Int = 10,
                     rrfK: Int = 60): DataFrame = {
    // ONE corpus explode+reduce (tf) feeds BOTH scorers: bm25 derives
    // dl/df from it, and the hash embedding folds it by hashed dim —
    // a (doc, dim) reduce over the already-reduced tf, not a second
    // pass over the raw text. MATERIALIZED once (r16): its four
    // consumers (query slice, dl, stats, hashed-dim fold) did NOT
    // share the tf exchange at runtime — the stage audit showed the
    // tokenize+explode+partial-agg pipeline executing FOUR times
    // (~37 s of task time at sf0.1). Per-invocation temporary, swept
    // by the bench/harness; the SERVING path (hybridFromIndex) reads
    // the same relations as persisted sidecars instead.
    val tf = termFrequencies(docs).localCheckpoint(true)
    val sparse = tf.select(col("doc_id"),
        graft.functions.VectorExpressions.hashedDim(col("tok"), dims)
          .as("dim"), col("tf"))
      .groupBy(col("doc_id"), col("dim")).agg(sum(col("tf")).as("cnt"))
    val docVecs = denseFromSparse(docs.select(col("doc_id")).distinct(), sparse, dims)
    hybridFuse(bm25FromTf(tf, terms), docVecs, terms, dims,
      kPerList, kFinal, rrfK)
  }

  /** Hybrid retrieval served from PREBUILT index relations (the
    * deployment shape: tf/dl/stats/docVecs are persisted sidecars
    * written once at index time — cf. the ANN index discipline — so a
    * query pays only the query-hit-sized bm25 slice, one map-only
    * cosine pass over the vectors, and k-sized fusion; the corpus
    * explode never re-runs). Identical output to [[hybridRetrieve]]
    * by construction (shared scorer + fusion code). */
  def hybridFromIndex(tf: DataFrame, dl: DataFrame, stats: DataFrame,
                      docVecs: DataFrame, terms: Seq[String], dims: Int = 64,
                      kPerList: Int = 50, kFinal: Int = 10,
                      rrfK: Int = 60): DataFrame =
    hybridFuse(bm25FromParts(tf, dl, stats, terms), docVecs, terms, dims,
      kPerList, kFinal, rrfK)

  /** The fusion tail shared by the online and indexed paths: rank each
    * modality (TakeOrderedAndProject + a window over k rows), RRF. */
  private def hybridFuse(kwScores: DataFrame, docVecs: DataFrame,
                         terms: Seq[String], dims: Int, kPerList: Int,
                         kFinal: Int, rrfK: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val kwRank = Window.orderBy(col("bm25").desc, col("doc_id"))
    val kw = kwScores
      .orderBy(col("bm25").desc, col("doc_id")).limit(kPerList)
      .withColumn("kw_rank", row_number().over(kwRank))
      .select(col("doc_id"), col("kw_rank"))
    // the query's own embedding: the SAME hashEmbedding operator over a
    // one-row local relation, riding the plan as a broadcast scalar —
    // no separate driver job, no collect
    val spark = docVecs.sparkSession
    val qDoc = spark.createDataFrame(
      java.util.Arrays.asList(org.apache.spark.sql.Row(-1L, terms.mkString(" "))),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType))))
    val qv = hashEmbedding(qDoc, dims).select(col("vec").as("qv"))
    val vecRank = Window.orderBy(col("cos").desc, col("doc_id"))
    val vec = docVecs.crossJoin(broadcast(qv))
      .select(col("doc_id"),
        round(Similarity.cosine(col("vec"), col("qv")), 6).as("cos"))
      .orderBy(col("cos").desc, col("doc_id")).limit(kPerList)
      .withColumn("vec_rank", row_number().over(vecRank))
      .select(col("doc_id"), col("vec_rank"))
    kw.join(vec, Seq("doc_id"), "full_outer")
      .withColumn("rrf", round(
        coalesce(lit(1.0) / (lit(rrfK.toDouble) + col("kw_rank")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(rrfK.toDouble) + col("vec_rank")), lit(0.0)), 6))
      .orderBy(col("rrf").desc, col("doc_id"))
      .limit(kFinal)
      .select(col("doc_id"), col("kw_rank"), col("vec_rank"), col("rrf"))
  }

  /** EXACT heavy hitters with bounded memory — the two-pass
    * Misra-Gries pattern: pass 1 tree-reduces the corpus token stream
    * to ≤k counters (graft.functions.MisraGries, a mergeable summary —
    * any token with frequency > N/(k+1) is guaranteed retained under
    * arbitrary partitioning); pass 2 exact-counts ONLY the ≤k
    * candidates (the isin filter prunes in the map stage) and keeps
    * those over the threshold. Output = exactly the tokens with
    * count·(k+1) > N, with exact counts — deterministic, so it carries
    * a plain GROUP BY / HAVING oracle even though the sketch is
    * approximate. The candidate collect is ≤k rows (a parameter fetch).
    * At 100 TB this replaces a full-vocabulary shuffle with one
    * k-counter reduce + one k-key aggregation. */
  def heavyHitters(docs: DataFrame, k: Int = 32): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    def toks = docs.select(
      explode(split(lower(trim(col("text"))), "\\s+")).as("tok"))
    val sketch = toks.as[String]
      .select(new graft.functions.MisraGries(k).toColumn).head()
    val candidates = sketch.keys.toSeq
    val total = toks.agg(count(lit(1)).as("n"))
    toks.filter(col("tok").isin(candidates: _*))
      .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(total))
      .filter(col("cnt") * (k + 1) > col("n"))
      .select(col("tok"), col("cnt"))
  }

  /** The drift per-row projection — ONE definition shared by the batch
    * [[snapshotDrift]] and the streaming twin (FactStream.driftStream),
    * so the live drift cells can never diverge from the published
    * datasheet (the profileStream discipline). Snapshot split =
    * md5(doc_id) parity, NOT doc_id parity: the synthetic corpus
    * assigns source = doc_id mod |sources|, so raw parity would put
    * each source entirely in one snapshot (degenerate zero shares).
    * The hash split is content-independent and engine-reproducible
    * (the sample_split freeze discipline). */
  private[graft] def driftPerRow(docs: DataFrame): DataFrame = {
    val snapA = pmod(conv(substring(md5(col("doc_id").cast("string")), 1, 8),
      16, 10).cast("long"), lit(2)) === 0
    docs.select(col("source"), snapA.as("in_a"),
      wsTokens(col("text")).cast("long").as("ntok"))
  }

  /** The per-snapshot token sums — exact-decimal conditional sums,
    * commutative+associative, so a streaming aggregation maintains
    * them exactly. */
  private[graft] def driftAggCols: Seq[Column] = {
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    def condSum(c: Column, p: Column): Column =
      sum(when(p, c).otherwise(lit(0L)).cast(DecimalType(25, 6)))
        .cast(DoubleType)
    Seq(condSum(col("ntok"), col("in_a")).as("tok_a"),
      condSum(col("ntok"), !col("in_a")).as("tok_b"))
  }

  /** Shares + L1/KL from the (source, tok_a, tok_b) cell relation —
    * a window over the |sources|-row relation, never a corpus pass. */
  private[graft] def driftShares(cells: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val all = Window.partitionBy()
    cells
      .withColumn("share_a", col("tok_a") / sum(col("tok_a")).over(all))
      .withColumn("share_b", col("tok_b") / sum(col("tok_b")).over(all))
      .select(col("source"), col("tok_a"), col("tok_b"),
        round(col("share_a"), 6).as("share_a"),
        round(col("share_b"), 6).as("share_b"),
        round(abs(col("share_a") - col("share_b")), 6).as("l1"),
        // absent-in-A contributes 0 (lim x·ln x = 0); absent-in-B with
        // mass in A is unbounded drift → NULL (flagged, not ±Inf)
        round(when(col("share_a") === 0, lit(0.0))
          .otherwise(col("share_a") *
            log(col("share_a") / when(col("share_b") =!= 0, col("share_b")))), 6)
          .as("kl_term"))
  }

  /** Snapshot-over-snapshot distribution DRIFT report (crawl
    * monitoring): per source, the token-mass share in snapshot A vs B
    * with L1 and KL contributions — the datasheet a 100 TB ingestion
    * pipeline checks before admitting a new crawl. ONE corpus scan +
    * one |sources|-sized reduce ([[driftPerRow]]/[[driftAggCols]],
    * shared with the streaming twin); the share normalization is a
    * window over that tiny relation ([[driftShares]]). */
  def snapshotDrift(docs: DataFrame): DataFrame =
    driftShares(driftPerRow(docs)
      .groupBy(col("source"))
      .agg(driftAggCols.head, driftAggCols.tail: _*))

  /** The Gopher "must contain ≥2 of these" stopword set (Rae et al.
    * 2021 §A1.1) — membership of TYPES, not token frequency, which is
    * what distinguishes this rule from the stop_ratio in [[quality]]. */
  val GopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** GOPHER-style rule gates — the published rule-based curation
    * filter (Rae et al. 2021 §A1.1) as a per-doc datasheet: each rule's
    * measured statistic, its boolean verdict, and the conjunction.
    * Word-count bounds default to 30..90 (the paper's 50..100k is
    * calibrated to web pages; this corpus' docs span 10..99 words — a
    * bound outside the support would make the rule constant), the
    * other thresholds are the paper's. Rules over LINES (bullet/
    * ellipsis line ratios) are omitted: this corpus has no newlines.
    *
    * Scale: map-only, one pass, no shuffle — and every metric is a
    * plain regexp/length expression, NOT a higher-order array function:
    * an interpreted lambda (filter/transform) splits the projection out
    * of whole-stage codegen AND defeats subexpression elimination, so
    * the tokenizing split would re-run once per metric per row. The
    * regex forms keep the entire gate one codegen'd projection
    * (plan-pinned in PlanAuditSpec). Word membership as a regex:
    * `(^|\s)w(\s|$)` over the normalized text is exactly array
    * membership of a \s+-split token. */
  def gopherRules(docs: DataFrame, minWords: Int = 30, maxWords: Int = 90,
                  minMeanLen: Double = 3.0, maxMeanLen: Double = 10.0,
                  maxSymbolRatio: Double = 0.1, minAlphaFrac: Double = 0.8,
                  minStopHits: Int = 2): DataFrame = {
    val norm = lower(trim(col("text")))
    val nWords = size(split(norm, "\\s+")).cast("long")
    val meanLen = length(regexp_replace(col("text"), "\\s+", ""))
      .cast("double") / nWords
    val symbols = size(regexp_extract_all(col("text"),
      lit("#|\\.\\.\\.|…"), lit(0))).cast("double")
    val alphaWords = size(regexp_extract_all(norm,
      lit("(^|\\s)\\S*[a-z]\\S*"), lit(0))).cast("double")
    val stopHits = GopherStopwords
      .map(w => when(norm.rlike("(^|\\s)" + w + "(\\s|$)"), 1).otherwise(0))
      .reduce(_ + _)
    docs.select(col("doc_id"), nWords.as("n_words"),
        round(meanLen, 6).as("mean_word_len"),
        round(symbols / nWords, 6).as("symbol_ratio"),
        round(alphaWords / nWords, 6).as("alpha_frac"),
        stopHits.as("stop_hits"))
      .withColumn("r_wordcount",
        col("n_words") >= minWords && col("n_words") <= maxWords)
      .withColumn("r_wordlen",
        col("mean_word_len") >= minMeanLen && col("mean_word_len") <= maxMeanLen)
      .withColumn("r_symbol", col("symbol_ratio") < maxSymbolRatio)
      .withColumn("r_alpha", col("alpha_frac") >= minAlphaFrac)
      .withColumn("r_stop", col("stop_hits") >= minStopHits)
      .withColumn("pass", col("r_wordcount") && col("r_wordlen") &&
        col("r_symbol") && col("r_alpha") && col("r_stop"))
  }

  /** LEXICAL-DIVERSITY gate: type-token ratio, hapax fraction and
    * Guiraud index (types/√tokens — the length-robust variant) per
    * doc. Template spam shows pathologically LOW diversity (few types
    * repeated); gibberish/ID dumps show pathologically HIGH (every
    * token unique) — curation gates on both tails.
    *
    * Shape: types and hapaxes come from ONE sorted-copy boundary scan
    * (sort the token array; a token starts a run where it differs from
    * its predecessor, and is a hapax when it also differs from its
    * successor) — map-only, NO corpus-sized (doc, tok) shuffle, which
    * is what the explode+groupBy formulation would pay twice at
    * 100 TB. The interior lambdas cost codegen of this one projection;
    * shuffle-freedom wins at scale. Null-safe <=> comparisons make the
    * array boundaries (s[0], s[n+1] = null) behave as run breaks. */
  def lexicalDiversity(docs: DataFrame): DataFrame = {
    val s = array_sort(split(lower(trim(col("text"))), "\\s+"))
    val pad = concat(array(lit(null).cast("string")), s)
    // try_element_at: the successor probe runs off the end at i = n
    // (null there = run break, exactly the semantics we want)
    def isNew(i: Column) = !(try_element_at(s, i) <=> try_element_at(pad, i))
    def isLast(i: Column) = !(try_element_at(s, i) <=> try_element_at(s, i + lit(1)))
    val idx = sequence(lit(1), size(s))
    val nTok = size(s).cast("long")
    val nTypes = size(filter(idx, i => isNew(i))).cast("long")
    val nHapax = size(filter(idx, i => isNew(i) && isLast(i))).cast("long")
    docs.select(col("doc_id"), nTok.as("n_tokens"), nTypes.as("n_types"),
      nHapax.as("n_hapax"),
      round(nTypes.cast("double") / nTok, 6).as("ttr"),
      round(nHapax.cast("double") / nTypes, 6).as("hapax_frac"),
      round(nTypes.cast("double") / sqrt(nTok.cast("double")), 6).as("guiraud"))
  }

  /** FLESCH reading-ease readability gate (Flesch 1948 — the standard
    * document-difficulty signal a curriculum/quality pipeline keys on):
    * per doc, sentence count (runs of sentence terminators, floored at
    * 1), word count, a syllable PROXY (vowel-group runs — the classic
    * dictionary-free approximation), and the Flesch score
    * 206.835 − 1.015·(words/sentence) − 84.6·(syllables/word), plus a
    * pass flag at the `minScore` gate (30 = "college readable").
    *
    * Determinism discipline: all three counts are exact integers from
    * the same regex semantics on both engines; the score is two
    * divisions and a linear combination of exact ints — identical
    * doubles, identical round(…,6).
    *
    * Scale: map-only, one codegen'd projection, no shuffle — a 100 TB
    * corpus pays exactly one scan. */
  def readability(docs: DataFrame, minScore: Double = 30.0): DataFrame = {
    val norm = lower(trim(col("text")))
    val nSent = greatest(
      size(regexp_extract_all(col("text"), lit("[.!?]+"), lit(0))), lit(1))
      .cast("long")
    val nWords = size(split(norm, "\\s+")).cast("long")
    val nSyll = size(regexp_extract_all(norm, lit("[aeiouy]+"), lit(0)))
      .cast("long")
    val wps = nWords.cast("double") / nSent
    val spw = nSyll.cast("double") / nWords
    val flesch = lit(206.835) - lit(1.015) * wps - lit(84.6) * spw
    docs.select(col("doc_id"), nSent.as("n_sentences"), nWords.as("n_words"),
      nSyll.as("n_syllables"),
      round(wps, 6).as("words_per_sentence"),
      round(spw, 6).as("syllables_per_word"),
      round(flesch, 6).as("flesch"),
      (flesch >= minScore).as("readable"))
  }

  /** ZIPF rank–frequency fit over the corpus head — the one-row corpus
    * health statistic (natural language sits near slope −1; template
    * spam and boilerplate-heavy crawls flatten or steepen it): least
    * squares of ln(freq) on ln(rank) over the top-`topRanks` terms,
    * with slope, intercept and r².
    *
    * Determinism discipline: logs are QUANTIZED to 1e-4 and the whole
    * normal-equation arithmetic runs on exact BIGINT-valued sums (every
    * intermediate < 2^53, so double accumulation is order-independent
    * and DuckDB needs no HUGEINT) — the audited double-sum divergence
    * class cannot occur.
    *
    * Scale: one term-count shuffle (map-side combinable), then the
    * top-R head via distributed TakeOrdered (orderBy+limit with the
    * term tie-break — NOT a global row_number window, which would
    * serialize a 100 TB vocabulary through one reducer); the rank
    * window runs over the R-row head only. */
  def zipfFit(docs: DataFrame, topRanks: Int = 1000): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = docs
      .select(explode(split(lower(trim(col("text"))), "\\s+")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("freq"))
    val head = tf.orderBy(col("freq").desc, col("tok").asc).limit(topRanks)
    val ranked = head.withColumn("rank",
      row_number().over(Window.orderBy(col("freq").desc, col("tok").asc)))
    val xi = round(log(col("rank").cast("double")) * 1e4, 0).cast("long")
    val yi = round(log(col("freq").cast("double")) * 1e4, 0).cast("long")
    val s = ranked.agg(count(lit(1)).as("n"),
      sum(xi).as("sx"), sum(yi).as("sy"), sum(xi * yi).as("sxy"),
      sum(xi * xi).as("sxx"), sum(yi * yi).as("syy"))
    // normal-equation deltas in LONG — n·Σyy can pass 2^53 at large SF,
    // where double accumulation would diverge between engines; the
    // int64 range (9.2e18) holds to freq ~1e12 — then cast the three
    // exact deltas to double for the final divisions.
    // Back out the 1e4 quantization: slope is scale-free, intercept /1e4.
    val dxx = (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
    val dyy = (col("n") * col("syy") - col("sy") * col("sy")).cast("double")
    val dxy = (col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
    s.select(col("n").as("n_terms"),
      round(dxy / dxx, 6).as("zipf_slope"),
      round((col("sy").cast("double") - (dxy / dxx) * col("sx").cast("double"))
        / col("n").cast("double") / 1e4, 6).as("intercept"),
      round(dxy * dxy / (dxx * dyy), 6).as("r2"))
  }

  /** STUPID-BACKOFF trigram LM scoring (Brants et al. 2007 — THE
    * web-scale LM smoothing: no discount estimation, just a fixed 0.4
    * backoff factor, designed for exactly this kind of distributed
    * count infrastructure): per doc, the mean ln S(w|u,v) over its
    * trigram positions, where counts come from a held-out TRAIN
    * partition (`trainPred` sources) so unseen trigrams genuinely back
    * off — scoring a corpus against its own counts never would.
    * S = c(uvw)/c(uv), else 0.4·c(vw)/c(v), else 0.4²·c(w)/N, else
    * a 0.4³/N unseen-word floor.
    *
    * Scale: counts reduce map-side-combinably to vocabulary-sized
    * relations; each DISTINCT scored trigram is scored ONCE against
    * those relations (vocab-sized joins), and the corpus-sized
    * position stream takes exactly ONE shuffle join against the
    * scored-trigram relation, then the per-doc mean. Nothing is ever
    * joined at corpus×vocab grain. */
  def trigramStupidBackoff(docs: DataFrame,
                           trainPred: Column = col("source")
                             .isin("src0", "src1", "src2", "src3")): DataFrame = {
    val toks = split(lower(trim(col("text"))), "\\s+")
    def triPositions(d: DataFrame): DataFrame = {
      val tk = col("tk")
      d.select(col("doc_id"), toks.as("tk"))
        .filter(size(tk) >= 3)
        .select(col("doc_id"), explode(zip_with(
          zip_with(slice(tk, lit(1), size(tk) - 2), slice(tk, lit(2), size(tk) - 2),
            (x, y) => struct(x.as("u"), y.as("v"))),
          slice(tk, lit(3), size(tk) - 2),
          (p, z) => struct(p.getField("u").as("u"),
            p.getField("v").as("v"), z.as("w")))).as("t"))
        .select(col("doc_id"), col("t.u").as("u"), col("t.v").as("v"),
          col("t.w").as("w"))
    }
    def biPairs(d: DataFrame): DataFrame = {
      val tk = col("tk")
      d.select(toks.as("tk")).filter(size(tk) >= 2)
        .select(explode(zip_with(
          slice(tk, lit(1), size(tk) - 1), slice(tk, lit(2), size(tk) - 1),
          (x, y) => struct(x.as("v"), y.as("w")))).as("p"))
        .select(col("p.v").as("bv"), col("p.w").as("bw"))
    }
    val train = docs.filter(trainPred)
    val triC = triPositions(train).groupBy(col("u"), col("v"), col("w"))
      .agg(count(lit(1)).as("c3"))
    val biC = biPairs(train).groupBy(col("bv"), col("bw"))
      .agg(count(lit(1)).as("c2"))
    val uniC = train.select(explode(toks).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("c1"))
    // total train tokens = Σ unigram counts: derived from the reduced
    // uniC relation instead of a FOURTH corpus explode (r15) —
    // identical bigint value, one less pass over the train text.
    // coalesce(·, 0): on an EMPTY train split sum() is NULL where the
    // old count() was 0 — pin the degenerate case to the pre-r15 value.
    val tot = uniC.agg(coalesce(sum(col("c1")), lit(0L)).as("nn"))
    val pos = triPositions(docs)
    // score each DISTINCT trigram once — all joins here are vocab-sized
    val scored = pos.select(col("u"), col("v"), col("w")).distinct()
      .join(triC, Seq("u", "v", "w"), "left")
      .join(biC.select(col("bv").as("u"), col("bw").as("v"),
        col("c2").as("cuv")), Seq("u", "v"), "left")
      .join(biC.select(col("bv").as("v"), col("bw").as("w"),
        col("c2").as("cvw")), Seq("v", "w"), "left")
      .join(uniC.select(col("tok").as("v"), col("c1").as("cv")),
        Seq("v"), "left")
      .join(uniC.select(col("tok").as("w"), col("c1").as("cw")),
        Seq("w"), "left")
      .crossJoin(broadcast(tot))
      .select(col("u"), col("v"), col("w"),
        when(col("c3").isNotNull,
            log(col("c3").cast("double") / col("cuv")))
          .when(col("cvw").isNotNull,
            log(lit(0.4) * col("cvw") / col("cv")))
          .when(col("cw").isNotNull,
            log(lit(0.16) * col("cw") / col("nn")))
          .otherwise(log(lit(0.064) / col("nn"))).as("s"))
    pos.join(scored, Seq("u", "v", "w"))
      .groupBy(col("doc_id"))
      .agg(round(avg(col("s")), 6).as("mean_sb_logscore"),
        count(lit(1)).as("n_positions"))
  }
}
