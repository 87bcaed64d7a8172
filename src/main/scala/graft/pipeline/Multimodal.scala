package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (SURVEY.md §2C): media as opaque binary
  * columns + typed metadata structs, with batch decode/feature-extract
  * as per-partition operators.
  *
  * PNG/JPEG/GIF/BMP decode and resize are REAL, via the JDK's
  * javax.imageio (zero extra dependencies): decode sniffs the format
  * and reads dimensions from the header (no full pixel decode);
  * resize renders through Graphics2D and re-encodes. Payloads ImageIO
  * cannot sniff (e.g. audio/video codecs, or the text-as-bytes test
  * harness) fall back to deterministic pseudo-metadata, keeping the
  * surrounding plumbing — binary column, metadata struct, the
  * mapPartitions batch shape (one decoder init per partition, streamed
  * rows) — exercised end-to-end either way; a production audio/video
  * decoder plugs into the same fallback site.
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

  /** Header-only image probe: sniff the container format and read the
    * dimensions WITHOUT decoding pixels (an ImageReader reads just the
    * header for getWidth/getHeight — the right cost model when decode
    * is only fetching metadata for millions of images). */
  private[graft] def probeImage(bytes: Array[Byte]): Option[(Int, Int, String)] = {
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    if (iis == null) None // no usable stream SPI for this payload
    else try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) None
      else {
        val reader = readers.next()
        // NonFatal, not just IOException: JDK readers throw
        // IllegalArgumentException / ArrayIndexOutOfBounds on fuzzed
        // headers whose magic bytes matched — one malformed payload
        // must never kill a 10^9-row decode job
        try {
          reader.setInput(iis, true, true)
          Some((reader.getWidth(0), reader.getHeight(0),
            reader.getFormatName.toLowerCase))
        } catch { case scala.util.control.NonFatal(_) => None }
        finally reader.dispose()
      }
    } finally iis.close()
  }

  /** Deterministic pseudo-metadata for payloads ImageIO cannot sniff
    * (non-image media; the text-bytes test harness). */
  private def pseudoMeta(bytes: Array[Byte]): Row = {
    val h = java.util.Arrays.hashCode(bytes)
    Row(math.abs(h % 1920) + 1, math.abs(h % 1080) + 1,
      Seq("jpeg", "png", "webp")(math.abs(h % 3)))
  }

  /** Batch decode: mapPartitions so decoder state is initialized once
    * per partition, not per row. PNG/JPEG/GIF/BMP read their real
    * header metadata via ImageIO; unsniffable payloads fall back to
    * deterministic pseudo-metadata. */
  def decode(withMedia: DataFrame): DataFrame = {
    val spark = withMedia.sparkSession
    val outSchema = StructType(withMedia.schema.fields :+ StructField("meta", MetaSchema))
    val rdd = withMedia.rdd.mapPartitions { rows =>
      // once per task: no disk-backed ImageIO cache files on executors
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]]("media")
        val meta = probeImage(bytes) match {
          case Some((w, h, fmt)) => Row(w, h, fmt)
          case None => pseudoMeta(bytes)
        }
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

  /** Real rescale of one image payload: decode pixels, render into the
    * scaled bounding box via Graphics2D (bilinear), re-encode in the
    * source format. JPEG has no alpha channel, so it renders into RGB;
    * everything else keeps ARGB. */
  private[graft] def rescaleImage(bytes: Array[Byte], fmt: String,
                                     newW: Int, newH: Int): Option[Array[Byte]] =
  try {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    if (img == null) None
    else {
      val imgType =
        if (fmt == "jpeg" || fmt == "jpg" || fmt == "bmp")
          java.awt.image.BufferedImage.TYPE_INT_RGB
        else java.awt.image.BufferedImage.TYPE_INT_ARGB
      val out = new java.awt.image.BufferedImage(newW, newH, imgType)
      val g = out.createGraphics()
      try {
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, newW, newH, null): Unit
      } finally g.dispose()
      val baos = new java.io.ByteArrayOutputStream()
      if (javax.imageio.ImageIO.write(out, fmt, baos)) Some(baos.toByteArray)
      else None
    }
  } catch {
    // decode/encode failures on corrupt-but-sniffable payloads
    // (truncated pixel data, CMYK JPEG, …) fall back like unsniffable
    // ones — a single bad image must never fail the resize job
    case scala.util.control.NonFatal(_) => None
  }

  /** Batch resize to a bounding box, aspect-ratio preserving: same
    * mapPartitions shape as decode (scaler state per task, not per
    * row). Image payloads are REALLY rescaled and re-encoded via
    * ImageIO/Graphics2D; unsniffable payloads keep the deterministic
    * stand-in (truncate proportionally to the pixel-count scale). */
  def resize(decoded: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    val spark = decoded.sparkSession
    val schema = decoded.schema
    val mediaIdx = schema.fieldIndex("media")
    val metaIdx = schema.fieldIndex("meta")
    val rdd = decoded.rdd.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false) // once per task
      rows.map { r =>
        val meta = r.getStruct(metaIdx)
        val (w, h) = (meta.getInt(0), meta.getInt(1))
        val scale = math.min(1.0, math.min(maxW.toDouble / w, maxH.toDouble / h))
        val (newW, newH) =
          (math.max(1, (w * scale).toInt), math.max(1, (h * scale).toInt))
        val bytes = r.getAs[Array[Byte]](mediaIdx)
        val outBytes =
          if (scale >= 1.0) bytes // already inside the box: no re-encode
          else rescaleImage(bytes, meta.getString(2), newW, newH)
            .getOrElse(bytes.take(math.max(1, (bytes.length * scale * scale).toInt)))
        val newMeta = Row(newW, newH, meta.getString(2))
        Row.fromSeq(r.toSeq.updated(mediaIdx, outBytes).updated(metaIdx, newMeta))
      }
    }
    val out = spark.createDataFrame(rdd, schema)
    // keep derived columns consistent with the re-encoded payload
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

  val AudioWinSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType), StructField("win_idx", IntegerType),
    StructField("n_samples", IntegerType), StructField("rms", DoubleType),
    StructField("zero_crossings", IntegerType)))

  /** Audio feature extraction: the payload is interpreted as
    * little-endian PCM16 mono samples (the WAV data-chunk layout) —
    * for PCM, "decode" IS the byte reinterpretation, so unlike image
    * pixels there is nothing to stub here. Emits one row per
    * `winSamples`-sample window with RMS energy (full-scale-normalized)
    * and the zero-crossing count — the classic VAD / silence-trim /
    * segmentation features. One mapPartitions pass, no shuffle: the
    * window fan-out inherits the input partitioning exactly like
    * [[frameSample]], and downstream per-window gates (drop silence,
    * route speech/music) stay map-side. A codec decoder (mp3/opus)
    * would plug in ahead of the sample loop, same batch shape. */
  def audioFeatures(withMedia: DataFrame, winSamples: Int = 256): DataFrame = {
    val spark = withMedia.sparkSession
    require(winSamples > 0, "winSamples must be positive")
    val rdd = withMedia.rdd.mapPartitions { rows =>
      rows.flatMap { r =>
        val docId = r.getAs[Long]("doc_id")
        val bytes = r.getAs[Array[Byte]]("media")
        pcmWindowStats(bytes, winSamples).iterator.map {
          case (winIdx, n, rms, zc) => Row(docId, winIdx, n, rms, zc)
        }
      }
    }
    spark.createDataFrame(rdd, AudioWinSchema)
  }

  /** Shared PCM16 window loop: (win_idx, n_samples, rms, zero_crossings)
    * per `winSamples` window — ONE definition so [[audioFeatures]] and
    * [[audioHash]] cannot drift. Null payload = zero windows, not a
    * task-killing NPE. */
  private[graft] def pcmWindowStats(bytes: Array[Byte],
                                    winSamples: Int): Array[(Int, Int, Double, Int)] = {
    val nSamples = if (bytes == null) 0 else bytes.length / 2
    (0 until nSamples by winSamples).toArray.map { start =>
      val end = math.min(start + winSamples, nSamples)
      var i = start
      var sumSq = 0.0
      var zc = 0
      var prevNonNeg = true
      while (i < end) {
        // little-endian int16
        val s = ((bytes(2 * i) & 0xff) | (bytes(2 * i + 1) << 8)).toShort.toInt
        val x = s / 32768.0
        sumSq += x * x
        val nonNeg = s >= 0
        if (i > start && nonNeg != prevNonNeg) zc += 1
        prevNonNeg = nonNeg
        i += 1
      }
      val n = end - start
      (start / winSamples, n, math.sqrt(sumSq / n), zc)
    }
  }

  /** 64-bit AVERAGE HASH (aHash) of an image payload: real decode,
    * bilinear downsample to 8×8, luminance per cell, bit = cell above
    * the mean — the standard perceptual fingerprint that survives
    * re-encoding and resizing (the downsample IS the normalization).
    * Unsniffable payloads fall back to an md5-derived 64-bit content
    * hash, so the non-image test harness still dedups exact payloads.
    * Deterministic for a fixed JDK (one cluster = one answer). */
  /** Hash families: aHash bits can't collide with the md5 fallback or
    * with flat-image hashes because the family rides along as its own
    * grouping column. */
  private[graft] val FamImage: Byte = 0
  private[graft] val FamBinary: Byte = 1
  private[graft] val FamFlat: Byte = 2

  private[graft] def aHash(bytes: Array[Byte]): Option[(Long, Byte)] = try {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    if (img == null) None
    else {
      val small = new java.awt.image.BufferedImage(8, 8,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = small.createGraphics()
      try {
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, 8, 8, null): Unit
      } finally g.dispose()
      val lum = new Array[Int](64)
      var s = 0L
      var i = 0
      while (i < 64) {
        val rgb = small.getRGB(i % 8, i / 8)
        // integer ITU-R 601 luma: deterministic, no float rounding
        lum(i) = (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) +
          114 * (rgb & 0xff)) / 1000
        s += lum(i)
        i += 1
      }
      val mean = s / 64
      var h = 0L
      i = 0
      while (i < 64) { if (lum(i) > mean) h |= (1L << i); i += 1 }
      // a UNIFORM image has no cell strictly above the mean → h == 0 for
      // every solid color; key those by mean luma in their own family so
      // solid-red and solid-blue never false-merge
      if (h == 0L) Some((mean, FamFlat)) else Some((h, FamImage))
    }
  } catch { case scala.util.control.NonFatal(_) => None }

  private val HashSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType), StructField("phash", LongType),
    StructField("hfam", ByteType)))

  /** Per-payload perceptual hash column (mapPartitions batch shape).
    * `hfam` discriminates the hash families (image aHash / flat-image
    * mean / md5 fallback) — they share the 64-bit space, so equality is
    * only meaningful within a family. */
  def imageHashes(withMedia: DataFrame): DataFrame = {
    val spark = withMedia.sparkSession
    val rdd = withMedia.rdd.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val docId = r.getAs[Long]("doc_id")
        val bytes = r.getAs[Array[Byte]]("media")
        val (h, fam) = (if (bytes == null) None else aHash(bytes)).getOrElse {
          // md5-derived content hash for non-image payloads
          val d = java.security.MessageDigest.getInstance("MD5")
            .digest(if (bytes == null) Array.empty[Byte] else bytes)
          (java.nio.ByteBuffer.wrap(d, 0, 8).getLong, FamBinary)
        }
        Row(docId, h, fam)
      }
    }
    spark.createDataFrame(rdd, HashSchema)
  }

  /** IMAGE DEDUP on the perceptual hash: exact-hash groups collapse
    * keep-min-id — the image counterpart of Dedup.exact (re-encoded /
    * resized copies share the hash BY CONSTRUCTION of aHash, so no
    * verify join is needed at the exact-match tier; a hamming tier
    * would ride the SimHash pigeonhole block join if near-dups were
    * wanted). One |distinct-hash|-group shuffle. */
  def imageDedup(withMedia: DataFrame): DataFrame = {
    val h = imageHashes(withMedia)
    val keep = h.groupBy(col("hfam"), col("phash"))
      .agg(min(col("doc_id")).as("keep_id"))
    h.join(keep, Seq("hfam", "phash"))
      .select(col("doc_id"), col("phash"),
        col("keep_id"), (col("doc_id") === col("keep_id")).as("keep"),
        col("hfam"))
  }

  private[graft] val FamAudio: Byte = 3
  private[graft] val FamFlatAudio: Byte = 4

  /** 64-bit AUDIO fingerprint of a PCM16 payload: per-window RMS energy
    * envelope ([[pcmWindowStats]] — the mm_audio loop), leading/trailing
    * silent windows trimmed (rms < `silence`), envelope resampled to 65
    * anchors, bit j = anchor j+1 louder than anchor j. The delta-sign
    * encoding makes the hash invariant to GAIN (positive scaling
    * preserves every comparison — a re-encoded/volume-normalized copy
    * hashes identically) and the trim makes it invariant to
    * window-aligned SILENCE PADDING — the two cheap transforms that
    * defeat exact byte hashing. A constant-envelope clip (every delta
    * flat → all bits 0) keys by its quantized mean energy in its own
    * family, mirroring the flat-image rule. All-silent or sub-2-window
    * payloads return None (no audio signature → md5 fallback family).
    * Reference: the same decode path as mm_audio; for compressed
    * codecs a decoder plugs in ahead of the window loop. */
  private[graft] def audioHash(bytes: Array[Byte], winSamples: Int,
                               silence: Double = 1e-3): Option[(Long, Byte)] = {
    val env = pcmWindowStats(bytes, winSamples).map(_._3)
    val lo = env.indexWhere(_ >= silence)
    val hi = env.lastIndexWhere(_ >= silence)
    if (lo < 0 || hi - lo < 1) None
    else {
      val t = env.slice(lo, hi + 1)
      var h = 0L
      var j = 0
      while (j < 64) {
        val a = t(((j.toLong * (t.length - 1)) / 64).toInt)
        val b = t((((j + 1).toLong * (t.length - 1)) / 64).toInt)
        if (b > a) h |= (1L << j)
        j += 1
      }
      if (h == 0L) Some((math.round(t.sum / t.length * 1e6), FamFlatAudio))
      else Some((h, FamAudio))
    }
  }

  /** Per-payload audio fingerprint column — same batch shape and family
    * discipline as [[imageHashes]]. */
  def audioHashes(withMedia: DataFrame, winSamples: Int = 256): DataFrame = {
    val spark = withMedia.sparkSession
    val rdd = withMedia.rdd.mapPartitions { rows =>
      rows.map { r =>
        val docId = r.getAs[Long]("doc_id")
        val bytes = r.getAs[Array[Byte]]("media")
        val (h, fam) = (if (bytes == null) None else audioHash(bytes, winSamples))
          .getOrElse {
            val d = java.security.MessageDigest.getInstance("MD5")
              .digest(if (bytes == null) Array.empty[Byte] else bytes)
            (java.nio.ByteBuffer.wrap(d, 0, 8).getLong, FamBinary)
          }
        Row(docId, h, fam)
      }
    }
    spark.createDataFrame(rdd, HashSchema)
  }

  /** AUDIO DEDUP on the envelope fingerprint: exact-hash groups collapse
    * keep-min-id per family — the audio counterpart of [[imageDedup]]
    * (identical / gain-rescaled / silence-padded copies share the hash
    * BY CONSTRUCTION of [[audioHash]]). One |distinct-hash|-group
    * shuffle; the fingerprint pass is map-only. */
  def audioDedup(withMedia: DataFrame, winSamples: Int = 256): DataFrame = {
    val h = audioHashes(withMedia, winSamples)
    val keep = h.groupBy(col("hfam"), col("phash"))
      .agg(min(col("doc_id")).as("keep_id"))
    h.join(keep, Seq("hfam", "phash"))
      .select(col("doc_id"), col("phash"),
        col("keep_id"), (col("doc_id") === col("keep_id")).as("keep"),
        col("hfam"))
  }

  private[graft] val FamVideo: Byte = 5
  private[graft] val FamFlatVideo: Byte = 6

  /** 64-bit VIDEO fingerprint: the payload is `frameSize`-byte raw
    * frames (the [[frameSample]] layout); per-frame "luma" = mean
    * unsigned byte value (for raw grayscale frames that IS mean
    * brightness — a codec decoder plugs in ahead of the loop, same
    * shape); leading/trailing BLACK frames trimmed (luma < `black`),
    * the luma-over-time envelope resampled to 65 anchors, bit j =
    * anchor j+1 brighter than anchor j. Same invariance algebra as
    * [[audioHash]], transposed to time-over-frames: delta-sign makes
    * it invariant to global BRIGHTNESS/contrast gain (positive scaling
    * preserves every strict comparison short of clipping), the trim to
    * black-frame padding (leader/trailer), and the 65-anchor temporal
    * resample to uniform frame-rate changes (each frame duplicated k
    * times — slow-motion re-encodes — yields the same anchor
    * sequence). Constant-brightness clips key by quantized mean luma
    * in their own family; sub-2-frame payloads return None (md5
    * fallback family). */
  private[graft] def videoHash(bytes: Array[Byte], frameSize: Int,
                               black: Double = 1.0): Option[(Long, Byte)] = {
    val nFrames = if (bytes == null) 0 else (bytes.length + frameSize - 1) / frameSize
    val env = new Array[Double](nFrames)
    var f = 0
    while (f < nFrames) {
      val start = f * frameSize
      val end = math.min(start + frameSize, bytes.length)
      var s = 0L
      var i = start
      while (i < end) { s += (bytes(i) & 0xff); i += 1 }
      env(f) = s.toDouble / (end - start)
      f += 1
    }
    val lo = env.indexWhere(_ >= black)
    val hi = env.lastIndexWhere(_ >= black)
    if (lo < 0 || hi - lo < 1) None
    else {
      val t = env.slice(lo, hi + 1)
      // midpoint position sampling: anchor j reads t[floor((2j+1)·|t|/130)].
      // Under k-fold frame duplication t'[i] = t[i/k] this is EXACTLY
      // invariant (floor(floor(k·x)/k) = floor(x)), unlike endpoint
      // interpolation — slow-motion re-encodes hash identically.
      @inline def anchor(j: Int): Double = t((((2L * j + 1) * t.length) / 130).toInt)
      var h = 0L
      var j = 0
      while (j < 64) {
        if (anchor(j + 1) > anchor(j)) h |= (1L << j)
        j += 1
      }
      if (h == 0L) Some((math.round(t.sum / t.length * 1e3), FamFlatVideo))
      else Some((h, FamVideo))
    }
  }

  /** Per-payload video fingerprint column — same batch shape and family
    * discipline as [[imageHashes]]/[[audioHashes]]. */
  def videoHashes(withMedia: DataFrame, frameSize: Int = 1024): DataFrame = {
    val spark = withMedia.sparkSession
    val rdd = withMedia.rdd.mapPartitions { rows =>
      rows.map { r =>
        val docId = r.getAs[Long]("doc_id")
        val bytes = r.getAs[Array[Byte]]("media")
        val (h, fam) = (if (bytes == null) None else videoHash(bytes, frameSize))
          .getOrElse {
            val d = java.security.MessageDigest.getInstance("MD5")
              .digest(if (bytes == null) Array.empty[Byte] else bytes)
            (java.nio.ByteBuffer.wrap(d, 0, 8).getLong, FamBinary)
          }
        Row(docId, h, fam)
      }
    }
    spark.createDataFrame(rdd, HashSchema)
  }

  /** VIDEO DEDUP on the temporal-envelope fingerprint — closes the
    * image/audio/video dedup triangle: identical / brightness-scaled /
    * black-padded / frame-duplicated (slow-motion) copies share the
    * hash BY CONSTRUCTION of [[videoHash]]. Exact-hash groups collapse
    * keep-min-id per family; one |distinct-hash|-group shuffle, the
    * fingerprint pass map-only. */
  def videoDedup(withMedia: DataFrame, frameSize: Int = 1024): DataFrame = {
    val h = videoHashes(withMedia, frameSize)
    val keep = h.groupBy(col("hfam"), col("phash"))
      .agg(min(col("doc_id")).as("keep_id"))
    h.join(keep, Seq("hfam", "phash"))
      .select(col("doc_id"), col("phash"),
        col("keep_id"), (col("doc_id") === col("keep_id")).as("keep"),
        col("hfam"))
  }
}
