package graft

import graft.functions.VectorExpressions
import org.apache.spark.sql.functions._

class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    (1L, Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
    (2L, Seq(0.0, 0.0), Seq(1.0, 1.0))).toDF("id", "a", "b")

  test("native dot product matches the functional formulation exactly") {
    val functional = df.select(col("id"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x).as("d"))
    val native = df.select(col("id"), VectorExpressions.dot(col("a"), col("b")).as("d"))
    assert(native.collect().map(r => (r.getLong(0), r.getDouble(1))).toSet ===
      functional.collect().map(r => (r.getLong(0), r.getDouble(1))).toSet)
    assert(native.filter(col("id") === 1).head().getDouble(1) === 32.0)
  }

  test("dot product survives whole-stage codegen (plan + many rows)") {
    val wide = spark.range(1000).select(col("id"),
      transform(sequence(lit(0), lit(63)), i => i.cast("double")).as("v"))
    val out = wide.select(sum(VectorExpressions.dot(col("v"), col("v"))).as("s")).head()
    // sum_{i<64} i^2 = 85344, times 1000 rows
    assert(out.getDouble(0) === 85344000.0)
  }

  test("fused cosine matches the three-dot formulation bit-for-bit") {
    val composed = df.filter(col("id") === 1).select(
      (VectorExpressions.dot(col("a"), col("b")) /
        (sqrt(VectorExpressions.dot(col("a"), col("a"))) *
          sqrt(VectorExpressions.dot(col("b"), col("b"))))).as("c"))
    val fused = df.filter(col("id") === 1)
      .select(VectorExpressions.cosine(col("a"), col("b")).as("c"))
    assert(fused.head().getDouble(0) === composed.head().getDouble(0))
  }

  test("fused cosine survives whole-stage codegen (many rows)") {
    val wide = spark.range(1000).select(col("id"),
      transform(sequence(lit(1), lit(64)), i => i.cast("double")).as("v"))
    // cosine(v, v) == 1.0 up to sqrt(x)*sqrt(x) rounding
    val out = wide.select(sum(VectorExpressions.cosine(col("v"), col("v"))).as("s")).head()
    assert(math.abs(out.getDouble(0) - 1000.0) < 1e-9)
  }

  test("GraftExtensions injects without error") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.functions.GraftExtensions().apply(ext)
  }

  test("graft_dot registers as a SQL function") {
    VectorExpressions.register(spark)
    df.createOrReplaceTempView("vecs")
    val out = spark.sql("SELECT id, graft_dot(a, b) AS d FROM vecs ORDER BY id")
      .collect().map(_.getDouble(1)).toSeq
    assert(out === Seq(32.0, 0.0))
  }
}
