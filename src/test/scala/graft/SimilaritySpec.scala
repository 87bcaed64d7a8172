package graft

import graft.pipeline.{Similarity, TextAnalysis}
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    .select(col("vec_id"), col("embedding").cast("array<double>").as("vec"))

  private def probe = emb.filter(col("vec_id") === 0).head().getSeq[Double](1)

  test("IVF top-k recalls most of the exact top-k with nprobe=4/8") {
    val exact = Similarity.topK(emb, "vec_id", "vec", probe, 10, Some(0L))
      .collect().map(_.getLong(0)).toSet
    val ivf = Similarity.ivfTopK(emb, "vec_id", "vec", probe, 10,
        nlist = 8, nprobe = 4, excludeId = Some(0L))
      .collect().map(_.getLong(0)).toSet
    assert(ivf.intersect(exact).size >= 5, s"recall too low: $ivf vs $exact")
  }

  test("IVF with nprobe = nlist equals exact top-k") {
    val exact = Similarity.topK(emb, "vec_id", "vec", probe, 10, Some(0L))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val full = Similarity.ivfTopK(emb, "vec_id", "vec", probe, 10,
        nlist = 4, nprobe = 4, excludeId = Some(0L))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(full === exact)
  }

  test("annTopKBatch: per-probe results identical to the online In-filter path") {
    val index = Similarity.annIndex(emb, "vec_id", "vec", planes = 6)
    val probeIds = (0L until 8L).toSeq
    val probes = emb.filter(col("vec_id") < 8)
    val batch = Similarity.annTopKBatch(index, probes, "vec_id", "vec", k = 5)
      .select("probe_id", "id", "cos").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2))))
      .groupBy(_._1).view
      .mapValues(_.map(_._2).toSeq.sortBy { case (id, cos) => (-cos, id) })
      .toMap
    assert(batch.keySet === probeIds.toSet)
    probeIds.foreach { pid =>
      val pvec = emb.filter(col("vec_id") === pid).head().getSeq[Double](1)
      val online = Similarity.annTopKIndexed(index, pvec, k = 5)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(batch(pid) === online,
        s"probe $pid: batch=${batch(pid)} online=$online")
    }
  }

  test("ivfTopKBatch: per-probe results identical to the online path") {
    val index = Similarity.ivfIndex(emb, "vec_id", "vec",
      dim = probe.length, nlist = 8, iters = 2)
    val probeIds = (0L until 8L).toSeq
    val probes = emb.filter(col("vec_id") < 8)
    val batch = Similarity.ivfTopKBatch(index, probes, "vec_id", "vec",
        k = 5, nprobe = 3)
      .select("probe_id", "id", "cos").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2))))
      .groupBy(_._1).view
      .mapValues(_.map(_._2).toSeq.sortBy { case (id, cos) => (-cos, id) })
      .toMap
    assert(batch.keySet === probeIds.toSet)
    probeIds.foreach { pid =>
      val pvec = emb.filter(col("vec_id") === pid).head().getSeq[Double](1)
      val online = Similarity.ivfTopKIndexed(index, pvec, k = 5, nprobe = 3)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(batch(pid) === online,
        s"probe $pid: batch=${batch(pid)} online=$online")
    }
  }

  test("winnowing: shared long substring -> shared fingerprint hash") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "xyzzy quick brown fox jumps over the lazy cat 42424"),
      (3L, "completely unrelated content with other words here!")).toDF("doc_id", "text")
    val fps = TextAnalysis.winnow(docs).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    assert(fps(1L).intersect(fps(2L)).nonEmpty)   // long shared run
    assert(fps(1L).intersect(fps(3L)).isEmpty ||
      fps(1L).intersect(fps(3L)).size < fps(1L).intersect(fps(2L)).size)
  }
}
