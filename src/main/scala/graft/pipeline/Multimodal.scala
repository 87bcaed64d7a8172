package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (SURVEY.md §2C): media as opaque binary
  * columns + typed metadata structs, with batch decode/feature-extract
  * as per-partition operators.
  *
  * The decode step itself is STUBBED (no image/audio libs in this
  * container): `fakeDecode` derives deterministic pseudo-metadata from
  * the bytes. Everything around it — the binary column, the metadata
  * struct schema, the mapPartitions batch shape (one decoder init per
  * partition, streamed rows), partition sizing — is the real Spark
  * plumbing a production decode (JNI/FFmpeg/JPEG) would plug into.
  */
object Multimodal {

  val MetaSchema: StructType = StructType(Seq(
    StructField("width", IntegerType), StructField("height", IntegerType),
    StructField("format", StringType)))

  /** Attach a binary "media" column (here: utf8 bytes of the text — in a
    * real pipeline this IS the image/audio payload column read from
    * parquet) plus its byte length. */
  def asBinary(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), encode(col("text"), "UTF-8").as("media"))
      .withColumn("n_bytes", octet_length(col("media")))

  /** Batch "decode": mapPartitions so a real decoder would be
    * initialized once per partition, not per row. The stub derives
    * width/height/format deterministically from the payload hash. */
  def decode(withMedia: DataFrame): DataFrame = {
    val spark = withMedia.sparkSession
    val outSchema = StructType(withMedia.schema.fields :+ StructField("meta", MetaSchema))
    val rdd = withMedia.rdd.mapPartitions { rows =>
      // real pipeline: val decoder = NativeDecoder.open() — once per task
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]]("media")
        // ??? <- real decode goes here; deterministic fake below
        val h = java.util.Arrays.hashCode(bytes)
        val meta = Row(math.abs(h % 1920) + 1, math.abs(h % 1080) + 1,
          Seq("jpeg", "png", "webp")(math.abs(h % 3)))
        Row.fromSeq(r.toSeq :+ meta)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Feature extraction over decoded media: emits a fixed-size float
    * vector per row (stub: hash-derived), the shape an embedding model
    * batch-inference step would produce. */
  def features(decoded: DataFrame, dim: Int = 8): DataFrame =
    decoded.withColumn("features",
      transform(sequence(lit(0), lit(dim - 1)),
        i => pmod(xxhash64(col("doc_id"), i), lit(1000L)) / 1000.0))
}
