package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (Jégou et al., "Product Quantization for
  * Nearest Neighbor Search", TPAMI 2011) — the memory-side scale path
  * for similarity search, complementing the scan-side pruning of
  * Similarity's IVF/LSH: each D-dim float vector is cut into `m`
  * sub-vectors and every sub-vector replaced by the index of its
  * nearest centroid in a per-block codebook of `ks` entries. With
  * m=8, ks=16 a 64-dim float vector (256 B) becomes ONE 32-bit code —
  * 64× compression — so the candidate set a 100 TB corpus serves from
  * fits in a fraction of the executors' memory, and search never
  * touches the raw vectors until an (optional) exact re-rank of the
  * few survivors.
  *
  * Search is asymmetric-distance (ADC): the probe builds an m×ks
  * lookup table of sub-dot-products ON THE DRIVER (tiny — model-sized,
  * not data-sized), and every corpus code is scored by m table
  * lookups + adds, entirely in codegen'd Catalyst primitives
  * (shift/mask/element_at) — a map-only projection feeding
  * TakeOrderedAndProject. No UDF, no shuffle, no join.
  *
  * Training reuses Similarity.lloyd per block (deterministic seeds,
  * fixed iterations, exact-decimal means), so codebooks — like every
  * graft model artifact — are bit-reproducible on any cluster.
  */
object Quantize {

  /** A trained PQ model: per-block codebooks.
    * `codebooks(b)(j)` = centroid j of sub-space b (subDim doubles). */
  final case class PqModel(m: Int, ks: Int, subDim: Int,
                           codebooks: Seq[Seq[Seq[Double]]]) {
    require(ks <= 256, "PQ codebook addresses one byte per block")
    /** Bits per block in the packed code word. */
    def bits: Int = if (ks <= 16) 4 else 8
    require(m * bits <= 64, "packed code must fit one long")
  }

  /** Train per-block codebooks over the corpus — one Lloyd's run per
    * sub-space (m small, fixed; each run is the shared deterministic
    * kmeans core). The model is k×m×subDim doubles: parameters, not
    * data — broadcastable anywhere. */
  def pqTrain(emb: DataFrame, idCol: String, vecCol: String, dim: Int,
              m: Int = 8, ks: Int = 16, iters: Int = 2): PqModel = {
    require(dim % m == 0, s"dim $dim not divisible into $m blocks")
    val subDim = dim / m
    val codebooks = (0 until m).map { b =>
      val sub = emb.select(col(idCol).as("id"),
        slice(col(vecCol), b * subDim + 1, subDim).as("vec"))
      Similarity.lloyd(sub, subDim, ks, iters)
    }
    PqModel(m, ks, subDim, codebooks)
  }

  /** Encode every vector to its packed PQ code — a map-only projection
    * (per-block codegen'd argmin, shifted into one long). This is the
    * one pass that touches the raw vectors; everything downstream
    * reads (id, code) only. */
  def pqEncode(model: PqModel, emb: DataFrame, idCol: String,
               vecCol: String): DataFrame = {
    val blockCodes = (0 until model.m).map { b =>
      val sub = slice(col(vecCol), b * model.subDim + 1, model.subDim)
      Similarity.nearestCell(sub, model.codebooks(b)).cast("long") *
        lit(1L << (b * model.bits))
    }
    emb.select(col(idCol).as("id"), blockCodes.reduce(_ + _).as("code"))
  }

  /** ADC approximate cosine of every code vs `probe`, as a codegen'd
    * scoring column over the packed code: per block, shift+mask out
    * the centroid index and look up the probe·centroid dot (and the
    * centroid's norm²) in driver-built literal tables.
    * cos ≈ Σ_b dotLut[b][code_b] / (|probe| · sqrt(Σ_b nrmLut[b][code_b])). */
  private def adcCosine(model: PqModel, probe: Seq[Double]): Column = {
    val mask = (1L << model.bits) - 1
    def lut(vals: Seq[Double], b: Int): Column =
      element_at(array(vals.map(lit): _*),
        (shiftrightunsigned(col("code"), b * model.bits) bitwiseAND mask)
          .cast("int") + 1)
    val dotSum = (0 until model.m).map { b =>
      val sub = probe.slice(b * model.subDim, (b + 1) * model.subDim)
      lut(model.codebooks(b).map(c => c.zip(sub).map { case (x, y) => x * y }.sum), b)
    }.reduce(_ + _)
    val nrmSum = (0 until model.m).map { b =>
      lut(model.codebooks(b).map(c => c.map(x => x * x).sum), b)
    }.reduce(_ + _)
    val pn = math.sqrt(probe.map(x => x * x).sum)
    dotSum / (sqrt(nrmSum) * lit(pn))
  }

  /** Compressed-domain approximate top-k: score all codes via ADC
    * (map-only), heap-select the top k. The corpus-sized input here is
    * (id, long) — the 64×-compressed representation. */
  def pqTopK(model: PqModel, codes: DataFrame, probe: Seq[Double], k: Int,
             excludeId: Option[Long] = None): DataFrame = {
    val scored = codes.select(col("id"),
      round(adcCosine(model, probe), 6).as("approx_cos"))
    val filtered = excludeId.fold(scored)(x => scored.filter(col("id") =!= x))
    filtered.orderBy(col("approx_cos").desc, col("id")).limit(k)
  }

  /** PQ search with exact re-rank: ADC selects `rerankDepth`
    * candidates from the compressed corpus, then ONLY those ids fetch
    * their raw vectors (broadcast semi-join against the candidate
    * list — the corpus-sized vector table never shuffles) for exact
    * cosine, and the true top-k of the candidates is returned. The
    * standard recall-restoring tail of a PQ pipeline: the raw-vector
    * read is rerankDepth rows, not corpus-sized. */
  def pqTopKReranked(model: PqModel, codes: DataFrame, emb: DataFrame,
                     idCol: String, vecCol: String, probe: Seq[Double],
                     k: Int, rerankDepth: Int,
                     excludeId: Option[Long] = None): DataFrame = {
    val cands = pqTopK(model, codes, probe, rerankDepth, excludeId)
      .select(col("id"))
    val p = array(probe.map(lit): _*)
    emb.select(col(idCol).as("id"), col(vecCol).as("vec"))
      .join(broadcast(cands), "id")
      .select(col("id"), round(Similarity.cosine(col("vec"), p), 6).as("cos"))
      .orderBy(col("cos").desc, col("id")).limit(k)
  }

  /** Full-vector k-means as a first-class clustering operator:
    * deterministic Lloyd's (shared core), final assignments + exact
    * per-cluster sizes and the cluster's mean cosine to its centroid
    * (a compactness datasheet). One map-only assignment pass over the
    * corpus + one k-row aggregate. */
  /** Deterministic k-means ASSIGNMENT: train centroids with the shared
    * exact-decimal Lloyd's core and return every row with its cluster
    * id — the building block compositions (topic clustering, IVF
    * cells, PQ codebooks) share. Map-only after the training pass. */
  def kmeansAssign(emb: DataFrame, idCol: String, vecCol: String, dim: Int,
                   k: Int, iters: Int = 3): DataFrame = {
    val data = emb.select(col(idCol).as("id"), col(vecCol).as("vec"))
    val centroids = Similarity.lloyd(data, dim, k, iters)
    data.withColumn("cluster", Similarity.nearestCell(col("vec"), centroids))
  }

  def kmeansProfile(emb: DataFrame, idCol: String, vecCol: String, dim: Int,
                    k: Int, iters: Int = 3): DataFrame = {
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    val data = emb.select(col(idCol).as("id"), col(vecCol).as("vec"))
    val centroids = Similarity.lloyd(data, dim, k, iters)
    val cent = array(centroids.map(c => array(c.map(lit): _*)): _*)
    data
      .withColumn("cluster", Similarity.nearestCell(col("vec"), centroids))
      .withColumn("cos_to_centroid",
        Similarity.cosine(col("vec"), element_at(cent, col("cluster") + 1)))
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_vecs"),
        avg(col("cos_to_centroid").cast(DecimalType(30, 15)))
          .cast(DoubleType).as("mean_cos"))
  }
}
