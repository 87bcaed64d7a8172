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

  /** Batch "resize" to a bounding box: same mapPartitions shape as
    * decode (one scaler per task). The stub clamps the metadata to the
    * box preserving aspect ratio and truncates the payload
    * proportionally — a real implementation swaps in the native scaler
    * at the marked line and everything else stands. */
  def resize(decoded: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    val spark = decoded.sparkSession
    val schema = decoded.schema
    val mediaIdx = schema.fieldIndex("media")
    val metaIdx = schema.fieldIndex("meta")
    val rdd = decoded.rdd.mapPartitions { rows =>
      // real pipeline: val scaler = NativeScaler.open(maxW, maxH) — per task
      rows.map { r =>
        val meta = r.getStruct(metaIdx)
        val (w, h) = (meta.getInt(0), meta.getInt(1))
        val scale = math.min(1.0, math.min(maxW.toDouble / w, maxH.toDouble / h))
        val bytes = r.getAs[Array[Byte]](mediaIdx)
        // ??? <- real rescale goes here; deterministic stand-in below
        val outBytes = bytes.take(math.max(1, (bytes.length * scale * scale).toInt))
        val newMeta = Row(math.max(1, (w * scale).toInt),
          math.max(1, (h * scale).toInt), meta.getString(2))
        Row.fromSeq(r.toSeq.updated(mediaIdx, outBytes).updated(metaIdx, newMeta))
      }
    }
    val out = spark.createDataFrame(rdd, schema)
    // keep derived columns consistent with the truncated payload
    if (schema.fieldNames.contains("n_bytes"))
      out.withColumn("n_bytes", octet_length(col("media")))
    else out
  }

  /** Frame sampling: treat the payload as `frameSize`-byte frames and
    * emit every `stride`-th one as its own row (doc_id, frame_idx,
    * frame). This is the video→frames fan-out shape: a per-row
    * generate (posexplode), no shuffle — downstream per-frame decode /
    * embedding stages inherit the input partitioning. */
  def frameSample(withMedia: DataFrame, frameSize: Int, stride: Int): DataFrame =
    withMedia
      .filter(octet_length(col("media")) > 0) // empty payload = zero frames
      .select(col("doc_id"),
        posexplode(split_binary_frames(col("media"), frameSize)).as(Seq("frame_idx", "frame")))
      .filter(pmod(col("frame_idx"), lit(stride)) === 0)

  /** Chunk a binary column into fixed-size slices (codegen'd builtins:
    * sequence + transform + substr on binary). */
  private def split_binary_frames(media: org.apache.spark.sql.Column, frameSize: Int) =
    transform(
      sequence(lit(0),
        greatest(((octet_length(media) - 1) / lit(frameSize)).cast(IntegerType), lit(0))),
      i => media.substr(i * frameSize + 1, lit(frameSize)))
}
