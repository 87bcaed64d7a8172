package graft.tools

import graft.pipeline.{Similarity, TextAnalysis}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for [[Similarity.bitextMine]]'s two paths (SCALE_r13):
  * the EXACT path does |X|·|Y| blocked scoring work — linear in rows
  * only while |X| stays fixed, quadratic when both sides grow with the
  * corpus (at copies=100 that is ~10⁴ × the sf0.1 work: ~90 min/pass,
  * which is why the headline 100× probe excludes it) — while the
  * SignLsh ring-bucket path (`planes` > 0, volume-sized here to
  * ~64 vectors/bucket, the train_pairs discipline) does Σ|bucket|
  * work and is the 100 TB design. Recall parity of the bucketed path
  * is spec-pinned on planted ground truth (GroundTruthSpec
  * "bitextMine"); this probe measures the COST separation at scale.
  *
  * Usage: runMain graft.tools.BitextScaleProbe <sfDir> <exact|bucketed>
  * Prints one JSON line with wall seconds, row count and the plane
  * count used.
  */
object BitextScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val mode = if (args.length > 1) args(1) else "bucketed"
    val spark = SparkSession.builder()
      .master("local[" + sys.env.getOrElse("SPARK_GRAFT_CPUS", "32") + "]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val d = spark.read.parquet(s"$dir/documents.parquet")
    def embd = TextAnalysis.hashEmbedding(d, dims = 64)
      .join(d.select(col("doc_id"), col("lang")), "doc_id")
    val nY = d.filter(col("lang") =!= "en").count()
    // volume-sized planes: ~64 vectors per bucket (0 = exact path)
    val planes =
      if (mode == "exact") 0
      else math.max(4, (math.log(nY / 64.0) / math.log(2)).ceil.toInt)

    def run(): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = Similarity.bitextMine(embd, "doc_id", "vec", "lang",
        srcLang = "en", planes = planes).count()
      ((System.nanoTime() - t0) / 1e9, n)
    }
    run() // warmup: JIT + codegen
    val (sec, rows) = run()
    println(
      f"""{"probe":"bitext_scale","mode":"$mode","dir":"$dir","n_tgt":$nY,"planes":$planes,"sec":$sec%.2f,"rows":$rows}""")
    spark.stop()
  }
}
