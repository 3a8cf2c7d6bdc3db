package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Row}

/** Multimodal-column plumbing: image/audio/video payloads travel as opaque
  * `binary` columns next to a typed metadata struct; decode / feature
  * extraction runs partition-batched over the binary payloads.
  *
  * IMAGES use a REAL codec (r14): the JDK's built-in `javax.imageio`
  * PNG reader/writer drives [[encodePng]] / [[decodeImage]] /
  * [[resizeImage]] — lossless encode→decode round-trips verified
  * differentially against a codec-free SQL oracle (PNG is lossless, so
  * the decoded raster equals the deterministic generator's output).
  * AUDIO likewise uses a REAL codec (r14, second half): the JDK's
  * built-in `javax.sound.sampled.AudioSystem` WAV reader/writer drives
  * [[encodeWav]] / [[decodeWav]] — 16-bit PCM is lossless, so the same
  * codec-free differential oracle pattern applies. The stand-in fold
  * ([[decodeStub]]) now covers only UNKNOWN payload formats (the honest
  * production shape: unrecognized media routes to a fallback, known
  * formats decode for real). Everything Spark-side is real and
  * load-bearing at scale: the schema contract, the `mapPartitions`
  * batch shape (one reusable decoder per partition, not per row —
  * exactly how a JNI/FFmpeg binding must be held), kryo-free row
  * encoding, and partition sizing by byte volume rather than row count.
  */
object Multimodal {

  val metadataType: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("n_bytes", LongType),
    StructField("checksum", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType)))

  /** Wrap a text corpus as a fake media table: payload = utf-8 bytes,
    * metadata derived from the payload. Stands in for `spark.read.format
    * ("binaryFile")` + sidecar metadata in a real pipeline.
    */
  def asMediaTable(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol),
      col(textCol).cast(BinaryType).as("payload"),
      struct(
        lit("fake/raw").as("format"),
        octet_length(col(textCol).cast(BinaryType)).cast(LongType).as("n_bytes"),
        crc32(col(textCol).cast(BinaryType)).as("checksum"),
        (pmod(crc32(col(textCol)), lit(640)) + 32).cast(IntegerType).as("width"),
        (pmod(xxhash64(col(textCol)), lit(480)) + 32).cast(IntegerType).as("height"))
        .as("meta"))

  /** Deterministic fallback fold for UNKNOWN payload formats (images
    * decode via the real JDK PNG codec — [[decodeImage]]; audio via the
    * real JDK WAV codec — [[decodeWav]]). Emits `dim` floats derived
    * from payload bytes; a pipeline adding a new media format swaps ONLY
    * this function (same signature: bytes in, fixed-length features out).
    */
  private def decodeStub(payload: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < payload.length) {
      h = (h ^ (payload(i) & 0xffL)) * 0x100000001b3L
      out(i % dim) += ((h >>> 40) & 0xff) / 255.0f
      i += 1
    }
    out
  }

  // Partitioning note (r21): these codec stages inherit their input's
  // partitioning on purpose. A single-file media table scans as ONE
  // partition and serializes every decode behind one task (guide §2.5
  // "input skew") — but the measured fix is to widen the SOURCE before
  // the expensive generation/codec chain (PipelineQueries.spreadDocs:
  // hash-on-id, a few bytes per shuffled row), not to repartition inside
  // each operator: an operator-level repartition lands AFTER the
  // already-computed payload expressions, shuffles payload bytes, and
  // measured as a net LOSS on every narrow-input entry it fired for
  // (stub folds +0.6 s, WAV chain 2.5 -> 5.6 s) while the real-codec
  // entries get their parallelism from the widened source anyway.

  // The FULL 8-byte PNG signature, not just the 4-byte prefix: arbitrary
  // binary payloads on the stub path (resized strides, future media)
  // must not be mis-routed to ImageIO by a 4-byte coincidence.
  private val PngMagic: Array[Byte] =
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def isPng(payload: Array[Byte]): Boolean =
    payload.length >= PngMagic.length &&
      java.util.Arrays.equals(
        java.util.Arrays.copyOf(payload, PngMagic.length), PngMagic)

  // WAV sniffing checks BOTH the RIFF container tag (bytes 0-3) and the
  // WAVE form type (bytes 8-11) — a RIFF prefix alone also matches AVI
  // and WebP containers, which must stay on the fallback path.
  private def isWav(payload: Array[Byte]): Boolean =
    payload.length >= 12 &&
      payload(0) == 'R' && payload(1) == 'I' && payload(2) == 'F' &&
      payload(3) == 'F' && payload(8) == 'W' && payload(9) == 'A' &&
      payload(10) == 'V' && payload(11) == 'E'

  // JPEG sniffing: SOI marker plus the 0xFF that opens the next segment
  // (APPn/DQT/...) — the standard minimal magic.
  private def isJpeg(payload: Array[Byte]): Boolean =
    payload.length >= 3 &&
      (payload(0) & 0xff) == 0xff && (payload(1) & 0xff) == 0xd8 &&
      (payload(2) & 0xff) == 0xff

  /** Row-major RGB byte sequence (r,g,b per pixel) of a decoded image —
    * the feature kernel's input for the REAL image path.
    */
  private def rgbBytes(img: java.awt.image.BufferedImage): Array[Byte] = {
    val w = img.getWidth; val h = img.getHeight
    val out = new Array[Byte](3 * w * h)
    var i = 0
    while (i < w * h) {
      val p = img.getRGB(i % w, i / w)
      out(3 * i) = ((p >> 16) & 0xff).toByte
      out(3 * i + 1) = ((p >> 8) & 0xff).toByte
      out(3 * i + 2) = (p & 0xff).toByte
      i += 1
    }
    out
  }

  /** Partition-batched feature extraction over the payload column.
    * `mapPartitions` (not per-row UDF) so a real decoder is initialized
    * once per partition — the pattern that matters for JNI decoders.
    * Output: (id, features array<float>).
    *
    * r14: PNG payloads (magic-sniffed) take the REAL decode path — the
    * JDK reader inflates them and the feature fold runs over the decoded
    * row-major RGB bytes, not the compressed stream (a feature of the
    * deflate bytes would change whenever the encoder's compression level
    * did). WAV payloads (RIFF+WAVE-sniffed) likewise decode for real:
    * the fold runs over the decoded little-endian PCM sample bytes, not
    * the container (a fold over the file bytes would hash the 44-byte
    * header too, so a header-layout change would masquerade as a signal
    * change). Unknown payloads keep the deterministic fallback fold
    * ([[decodeStub]]); undecodable or NULL payloads yield NULL features.
    */
  def extractFeatures(df: DataFrame, idCol: String, dim: Int = 16): DataFrame = {
    val spark = df.sparkSession
    val inSchema = df.schema
    val idIdx = inSchema.fieldIndex(idCol)
    val payloadIdx = inSchema.fieldIndex("payload")
    val outSchema = StructType(Seq(
      inSchema(idIdx), StructField("features", ArrayType(FloatType, containsNull = false))))
    val rdd = df.rdd.mapPartitions { rows =>
      // Real pipelines initialize the decoder handle here, once.
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](payloadIdx)
        // NULL payload → NULL features (one bad row must not fail the
        // stage; every expression-based operator here is null-tolerant).
        val bytes =
          if (payload == null) null
          else if (isPng(payload)) {
            val img = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(payload))
            if (img == null) null else rgbBytes(img)
          } else if (isWav(payload)) {
            pcmBytes(payload) // real decode: PCM sample bytes, not container
          } else payload
        Row(r.get(idIdx), if (bytes == null) null else decodeStub(bytes, dim))
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Generic media resize — REAL codec path for PNG payloads, opaque
    * fallback for everything else. PNG payloads (magic-sniffed) are
    * decoded with the JDK reader, nearest-neighbor-scaled to
    * width×height with the same integer-division index math as
    * [[resizeImage]] (exactly replayable in SQL), and re-encoded to
    * PNG; an undecodable PNG-sniffed payload yields a NULL payload with
    * metadata kept. JPEG payloads (SOI-sniffed) get the same real
    * decode→scale→re-encode treatment with a JPEG re-encode, so resize
    * composes with [[encodeJpeg]]. WAV payloads (magic-sniffed) NULL
    * through with metadata kept: resize is image-semantic, and
    * stride-sampling PCM bytes would stamp corrupt audio with image
    * width/height. OPAQUE payloads (no codec claims a match) keep the
    * deterministic stride-sampling fallback to the target pixel budget
    * — honest downsampling of bytes the engine cannot interpret. Same
    * partition-batched shape as [[extractFeatures]]: payload in,
    * smaller payload + updated metadata out, decoder handle initialized
    * once per partition. Output schema: (id, payload binary, meta
    * struct) — a media table again, so resize composes with
    * extractFeatures/sampleFrames.
    */
  def resize(df: DataFrame, idCol: String, width: Int, height: Int): DataFrame = {
    require(width > 0 && height > 0, s"resize: target $width x $height must be positive")
    val spark = df.sparkSession
    val inSchema = df.schema
    val idIdx = inSchema.fieldIndex(idCol)
    val payloadIdx = inSchema.fieldIndex("payload")
    val metaIdx = inSchema.fieldIndex("meta")
    val outSchema = StructType(Seq(
      inSchema(idIdx),
      StructField("payload", BinaryType),
      StructField("meta", metadataType)))
    // Opaque-fallback byte budget — Long math (width·height overflows
    // Int at 64k²).
    val budget = math.min(Int.MaxValue.toLong,
      math.max(1L, width.toLong * height.toLong / 64)).toInt
    val rdd = df.rdd.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false) // once per partition
      val baos = new java.io.ByteArrayOutputStream(1 << 12)
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](payloadIdx)
        val meta = r.getStruct(metaIdx)
        if (payload == null) {
          // NULL payload rides through as NULL with its metadata kept —
          // one bad row must not fail the stage.
          Row(r.get(idIdx), null, meta)
        } else if (isPng(payload)) {
          // REAL branch: decode → NN scale → re-encode (shared with
          // resizeImage via nnScalePng, so the codec paths cannot drift).
          val bytes = nnScalePng(payload, width, height, baos)
          if (bytes == null) Row(r.get(idIdx), null, meta)
          else {
            val crc = new java.util.zip.CRC32(); crc.update(bytes)
            Row(r.get(idIdx), bytes,
              Row(meta.getString(0), bytes.length.toLong, crc.getValue, width, height))
          }
        } else if (isJpeg(payload)) {
          // REAL branch for the codec encodeJpeg produces: decode →
          // NN scale (same shared scaler) → re-encode JPEG, so the
          // output format matches the metadata's claim. Stride-sampling
          // compressed JPEG bytes would be corrupt-bytes-with-image-dims
          // — exactly what the WAV branch below exists to prevent.
          val bytes = nnScaleTo("jpg", payload, width, height, baos)
          if (bytes == null) Row(r.get(idIdx), null, meta)
          else {
            val crc = new java.util.zip.CRC32(); crc.update(bytes)
            Row(r.get(idIdx), bytes,
              Row(meta.getString(0), bytes.length.toLong, crc.getValue, width, height))
          }
        } else if (isWav(payload)) {
          // Image-semantic op on sniffable audio: NULL through rather
          // than emit stride-corrupted PCM stamped with image dims.
          Row(r.get(idIdx), null, meta)
        } else {
          val out =
            if (payload.length <= budget) payload
            else {
              val stride = payload.length.toDouble / budget
              Array.tabulate(budget)(i => payload((i * stride).toInt))
            }
          val crc = new java.util.zip.CRC32()
          crc.update(out)
          Row(r.get(idIdx), out,
            Row(meta.getString(0), out.length.toLong, crc.getValue, width, height))
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  // ---------------------------------------------------------------------
  // REAL image codec path (JDK javax.imageio — PNG, lossless).
  // ---------------------------------------------------------------------

  /** Encode an integer-raster column to real PNG payloads → media table
    * (id, payload binary, meta struct). `pixelsCol` is a row-major
    * array<int> of 0xRRGGBB-packed pixels of size `wCol`·`hCol` (the
    * raster can come straight from SQL expressions — the differential
    * entries generate it with `transform(sequence(...))`).
    * Partition-batched: `ImageIO` disk caching is disabled once per
    * partition and the encode buffer is reused — the same handle
    * discipline a JNI codec needs. NULL or size-mismatched rasters emit
    * a NULL payload with metadata kept (one bad row must not fail the
    * stage).
    */
  def encodePng(df: DataFrame, idCol: String, wCol: String, hCol: String,
      pixelsCol: String): DataFrame = {
    val spark = df.sparkSession
    val inSchema = df.schema
    val idIdx = inSchema.fieldIndex(idCol)
    val wIdx = inSchema.fieldIndex(wCol)
    val hIdx = inSchema.fieldIndex(hCol)
    val pxIdx = inSchema.fieldIndex(pixelsCol)
    val outSchema = StructType(Seq(
      inSchema(idIdx), StructField("payload", BinaryType),
      StructField("meta", metadataType)))
    val rdd = df.rdd.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false) // once per partition: no temp-file cache
      val baos = new java.io.ByteArrayOutputStream(1 << 12)
      rows.map { r =>
        val w = r.getInt(wIdx); val h = r.getInt(hIdx)
        val px = if (r.isNullAt(pxIdx)) null else r.getSeq[Int](pxIdx)
        if (px == null || px.length != w * h || w <= 0 || h <= 0)
          Row(r.get(idIdx), null,
            Row("image/png", 0L, 0L, w, h))
        else {
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var i = 0
          while (i < px.length) { img.setRGB(i % w, i / w, px(i)); i += 1 }
          baos.reset()
          javax.imageio.ImageIO.write(img, "png", baos)
          val bytes = baos.toByteArray
          val crc = new java.util.zip.CRC32(); crc.update(bytes)
          Row(r.get(idIdx), bytes,
            Row("image/png", bytes.length.toLong, crc.getValue, w, h))
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Encode (id, w, h, pixels array<int> 0xRRGGBB) rasters to REAL JPEG
    * payloads with the JDK's ImageIO JPEG writer at an explicit quality —
    * the LOSSY sibling of [[encodePng]], here to make the MJPEG video
    * path real (frames a PNG-only container cannot honestly claim to be
    * "video"). Same media-table contract and partition-batched shape;
    * the writer + its param object are created once per partition (the
    * init-once discipline a JNI codec needs). NULL or size-mismatched
    * rasters emit a NULL payload with metadata kept.
    *
    * Because JPEG is lossy, downstream oracles must check DECODE-ERROR
    * BOUNDS (or codec-free facts: dims, frame count), never exact pixel
    * checksums — see q_video_decode_mjpeg.
    */
  def encodeJpeg(df: DataFrame, idCol: String, wCol: String, hCol: String,
      pixelsCol: String, quality: Float = 0.95f): DataFrame = {
    require(quality > 0f && quality <= 1f,
      s"encodeJpeg: quality $quality must be in (0, 1]")
    val spark = df.sparkSession
    val inSchema = df.schema
    val idIdx = inSchema.fieldIndex(idCol)
    val wIdx = inSchema.fieldIndex(wCol)
    val hIdx = inSchema.fieldIndex(hCol)
    val pxIdx = inSchema.fieldIndex(pixelsCol)
    val outSchema = StructType(Seq(
      inSchema(idIdx), StructField("payload", BinaryType),
      StructField("meta", metadataType)))
    val rdd = df.rdd.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
      val param = writer.getDefaultWriteParam
      param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      param.setCompressionQuality(quality)
      val baos = new java.io.ByteArrayOutputStream(1 << 12)
      val out = rows.map { r =>
        val w = r.getInt(wIdx); val h = r.getInt(hIdx)
        val px = if (r.isNullAt(pxIdx)) null else r.getSeq[Int](pxIdx)
        if (px == null || px.length != w * h || w <= 0 || h <= 0)
          Row(r.get(idIdx), null, Row("image/jpeg", 0L, 0L, w, h))
        else {
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var i = 0
          while (i < px.length) { img.setRGB(i % w, i / w, px(i)); i += 1 }
          baos.reset()
          val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
          try {
            writer.setOutput(ios)
            writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
          } finally ios.close()
          val bytes = baos.toByteArray
          val crc = new java.util.zip.CRC32(); crc.update(bytes)
          Row(r.get(idIdx), bytes,
            Row("image/jpeg", bytes.length.toLong, crc.getValue, w, h))
        }
      }
      // Dispose the per-partition writer (it can hold native codec
      // state) once the row iterator is exhausted — the same contract
      // ImageIO.write honors per call with its finally-dispose.
      new Iterator[Row] {
        private var disposed = false
        def hasNext: Boolean = {
          val h = out.hasNext
          if (!h && !disposed) { disposed = true; writer.dispose() }
          h
        }
        def next(): Row = out.next()
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Decode PNG payloads back to (id, width, height, pixels array<int>)
    * with the real JDK reader — the inverse of [[encodePng]]; pixels are
    * row-major 0xRRGGBB ints (`getRGB` masked to 24 bits, exact for
    * 8-bit RGB PNG: no gamma/ICC chunks are written, so the round-trip
    * is lossless bit-for-bit). NULL/undecodable payloads → NULL raster.
    */
  def decodeImage(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    val inSchema = df.schema
    val idIdx = inSchema.fieldIndex(idCol)
    val payloadIdx = inSchema.fieldIndex("payload")
    val outSchema = StructType(Seq(
      inSchema(idIdx),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("pixels", ArrayType(IntegerType, containsNull = false))))
    val rdd = df.rdd.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](payloadIdx)
        val img =
          if (payload == null) null
          else javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
        if (img == null) Row(r.get(idIdx), null, null, null)
        else {
          val w = img.getWidth; val h = img.getHeight
          val px = new Array[Int](w * h)
          var i = 0
          while (i < px.length) {
            px(i) = img.getRGB(i % w, i / w) & 0xffffff; i += 1
          }
          Row(r.get(idIdx), w, h, px.toSeq)
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** REAL image resize: decode PNG → deterministic NEAREST-NEIGHBOR
    * sample to `tw`×`th` (target (tx,ty) ← source (tx·w/tw, ty·h/th),
    * integer division — exactly reproducible in any SQL engine, unlike
    * Graphics2D's implementation-defined interpolation) → re-encode PNG.
    * Media table in, media table out, so it composes with
    * [[decodeImage]]/[[sampleFrames]] like the generic [[resize]].
    */
  def resizeImage(df: DataFrame, idCol: String, tw: Int, th: Int): DataFrame = {
    require(tw > 0 && th > 0, s"resizeImage: target $tw x $th must be positive")
    val spark = df.sparkSession
    val inSchema = df.schema
    val idIdx = inSchema.fieldIndex(idCol)
    val payloadIdx = inSchema.fieldIndex("payload")
    val metaIdx = inSchema.fieldIndex("meta")
    val outSchema = StructType(Seq(
      inSchema(idIdx), StructField("payload", BinaryType),
      StructField("meta", metadataType)))
    val rdd = df.rdd.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      val baos = new java.io.ByteArrayOutputStream(1 << 12)
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](payloadIdx)
        val meta = r.getStruct(metaIdx)
        val bytes =
          if (payload == null) null else nnScalePng(payload, tw, th, baos)
        if (bytes == null) Row(r.get(idIdx), null, meta)
        else {
          val crc = new java.util.zip.CRC32(); crc.update(bytes)
          Row(r.get(idIdx), bytes,
            Row(meta.getString(0), bytes.length.toLong, crc.getValue, tw, th))
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Decode → integer-division nearest-neighbor scale → PNG re-encode of
    * one payload; the ONE implementation behind both [[resizeImage]] and
    * the generic [[resize]]'s PNG branch (two entries exist to prove
    * those paths agree, so the scaler must be literally shared). Returns
    * null when the payload does not decode — including when the PNG
    * reader CLAIMS the stream (the 8-byte magic matched, so it will)
    * but then throws on corrupt/truncated data: ImageIO.read only
    * returns null when NO reader claims the stream, so the
    * one-bad-row-must-not-fail-the-stage contract needs the IOException
    * caught here, not just the null checked. `baos` is the caller's
    * per-partition reuse buffer.
    */
  private def nnScalePng(payload: Array[Byte], tw: Int, th: Int,
      baos: java.io.ByteArrayOutputStream): Array[Byte] =
    nnScaleTo("png", payload, tw, th, baos)

  /** Decode (any ImageIO-readable payload) → NN-scale → re-encode in
    * `format` ("png" or "jpg") — the shared body behind [[nnScalePng]]
    * and resize's JPEG branch.
    */
  private def nnScaleTo(format: String, payload: Array[Byte], tw: Int, th: Int,
      baos: java.io.ByteArrayOutputStream): Array[Byte] = try {
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(payload))
    if (img == null) null
    else {
      val w = img.getWidth; val h = img.getHeight
      val out = new java.awt.image.BufferedImage(
        tw, th, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var ty = 0
      while (ty < th) {
        val sy = ty * h / th
        var tx = 0
        while (tx < tw) {
          out.setRGB(tx, ty, img.getRGB(tx * w / tw, sy))
          tx += 1
        }
        ty += 1
      }
      baos.reset()
      javax.imageio.ImageIO.write(out, format, baos)
      baos.toByteArray
    }
  } catch {
    case _: java.io.IOException => null // corrupt codec-magic payload → NULL row
  }

  // ---------------------------------------------------------------------
  // REAL audio codec path (JDK javax.sound.sampled — WAV/PCM, lossless).
  // ---------------------------------------------------------------------

  /** Audio media metadata: same contract shape as [[metadataType]] with
    * the image dims replaced by the audio ones. `n_samples` is per
    * channel (= frame count).
    */
  val audioMetadataType: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("n_bytes", LongType),
    StructField("checksum", LongType),
    StructField("sample_rate", IntegerType),
    StructField("n_samples", IntegerType)))

  /** JDK audio SPI providers resolved ONCE per JVM (r21):
    * `AudioSystem.write` / `AudioSystem.getAudioInputStream` re-enter
    * the globally SYNCHRONIZED provider registry
    * (`JDK13Services.getProviders`) on every call — invisible while the
    * codec stage ran as one task, but a measured ~3× slowdown once
    * [[balanced]] made it 32-way parallel: every row's encode/decode
    * serialized on the registry lock. These are the same implementation
    * classes AudioSystem itself resolves, so payload bytes and decoded
    * samples are bit-identical — on a stock single-provider JDK. Caveat
    * (r22, ADVICE): raw ServiceLoader order ignores the JDK13Services
    * default-provider preference (`sound.properties` / system property),
    * so on a JVM with multiple or custom audio SPIs provider precedence
    * could differ from AudioSystem's; this deployment ships no such SPI.
    */
  private lazy val wavWriter: javax.sound.sampled.spi.AudioFileWriter = {
    import scala.jdk.CollectionConverters._
    java.util.ServiceLoader.load(classOf[javax.sound.sampled.spi.AudioFileWriter])
      .asScala
      .find(_.isFileTypeSupported(javax.sound.sampled.AudioFileFormat.Type.WAVE))
      .getOrElse(sys.error("no WAVE AudioFileWriter provider on this JVM"))
  }

  private lazy val wavReaders: Seq[javax.sound.sampled.spi.AudioFileReader] = {
    import scala.jdk.CollectionConverters._
    java.util.ServiceLoader.load(classOf[javax.sound.sampled.spi.AudioFileReader])
      .asScala.toSeq
  }

  /** AudioSystem.getAudioInputStream semantics over the cached provider
    * list: first reader that accepts the payload wins; a fresh stream
    * per attempt so provider probing never sees a half-consumed stream.
    */
  private def wavInputStream(
      payload: Array[Byte]): javax.sound.sampled.AudioInputStream = {
    wavReaders.foreach { r =>
      try return r.getAudioInputStream(new java.io.ByteArrayInputStream(payload))
      catch { case _: javax.sound.sampled.UnsupportedAudioFileException => () }
    }
    throw new javax.sound.sampled.UnsupportedAudioFileException(
      "no provider accepted the payload")
  }

  /** Decode a WAV payload to its 16-bit signed PCM samples, or null if
    * the payload is not decodable 16-bit PCM. Shared by [[decodeWav]]
    * and the [[extractFeatures]] audio route.
    */
  private def wavSamples(payload: Array[Byte]): (Int, Int, Array[Int]) = {
    try {
      val in = wavInputStream(payload)
      val fmt = in.getFormat
      if (fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
          fmt.getSampleSizeInBits != 16 || fmt.isBigEndian) null
      else {
        val pcm = in.readAllBytes()
        val n = pcm.length / 2
        val out = new Array[Int](n)
        var i = 0
        while (i < n) {
          // little-endian signed 16-bit: low byte unsigned, high byte signed
          out(i) = ((pcm(2 * i) & 0xff) | (pcm(2 * i + 1) << 8)).toShort.toInt
          i += 1
        }
        (math.round(fmt.getSampleRate), fmt.getChannels, out)
      }
    } catch {
      // undecodable payload = data problem, not a stage failure
      case scala.util.control.NonFatal(_) => null
    }
  }

  /** The decoded little-endian PCM byte stream of a WAV payload (the
    * [[extractFeatures]] fold input for the real audio path), or null.
    */
  private def pcmBytes(payload: Array[Byte]): Array[Byte] = {
    val dec = wavSamples(payload)
    if (dec == null) null
    else {
      val samples = dec._3
      val out = new Array[Byte](2 * samples.length)
      var i = 0
      while (i < samples.length) {
        out(2 * i) = (samples(i) & 0xff).toByte
        out(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
        i += 1
      }
      out
    }
  }

  /** Encode a 16-bit sample column to real WAV payloads → audio media
    * table (id, payload binary, meta struct). `samplesCol` is an
    * array<int> of signed 16-bit mono samples (straight from SQL
    * expressions — the differential entries generate it with
    * `transform(sequence(...))`). Partition-batched like [[encodePng]]:
    * the `AudioFormat` handle and encode buffer are built once per
    * partition. NULL/empty/out-of-range sample arrays emit a NULL
    * payload with metadata kept (one bad row must not fail the stage).
    */
  def encodeWav(df: DataFrame, idCol: String, samplesCol: String,
      sampleRate: Int): DataFrame = {
    // Deliberately NOT [[balanced]] (r21): WAV payloads here are hundreds
    // of bytes and the cached-SPI encode is ~microseconds per row, so the
    // exchange + extra stage cost more than the parallelism returns
    // (measured 2.50 -> 5.61 s warm on the resample chain when widened).
    // A genuinely wide audio table stays wide: this only affects
    // narrow-input fixtures.
    require(sampleRate > 0, s"encodeWav: sample rate $sampleRate must be positive")
    val spark = df.sparkSession
    val inSchema = df.schema
    val idIdx = inSchema.fieldIndex(idCol)
    val sIdx = inSchema.fieldIndex(samplesCol)
    val outSchema = StructType(Seq(
      inSchema(idIdx), StructField("payload", BinaryType),
      StructField("meta", audioMetadataType)))
    val rdd = df.rdd.mapPartitions { rows =>
      // once per partition: the codec format handle + reusable buffer
      val fmt = new javax.sound.sampled.AudioFormat(
        javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
        sampleRate.toFloat, 16, 1, 2, sampleRate.toFloat, false)
      val baos = new java.io.ByteArrayOutputStream(1 << 12)
      rows.map { r =>
        val samples = if (r.isNullAt(sIdx)) null else r.getSeq[Int](sIdx)
        if (samples == null || samples.isEmpty ||
            samples.exists(s => s < Short.MinValue || s > Short.MaxValue))
          Row(r.get(idIdx), null, Row("audio/wav", 0L, 0L, sampleRate, 0))
        else {
          val pcm = new Array[Byte](2 * samples.length)
          var i = 0
          while (i < samples.length) {
            pcm(2 * i) = (samples(i) & 0xff).toByte
            pcm(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
            i += 1
          }
          val ais = new javax.sound.sampled.AudioInputStream(
            new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong)
          baos.reset()
          // Cached SPI writer, not AudioSystem.write — see wavWriter.
          wavWriter.write(
            ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
          val bytes = baos.toByteArray
          val crc = new java.util.zip.CRC32(); crc.update(bytes)
          Row(r.get(idIdx), bytes,
            Row("audio/wav", bytes.length.toLong, crc.getValue, sampleRate,
              samples.length))
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Decode WAV payloads back to (id, sample_rate, channels, samples
    * array<int>) with the real JDK reader — the inverse of [[encodeWav]];
    * 16-bit PCM WAV is lossless, so the round-trip is bit-exact.
    * NULL/undecodable/non-PCM16 payloads → NULL samples.
    */
  def decodeWav(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    val inSchema = df.schema
    val idIdx = inSchema.fieldIndex(idCol)
    val payloadIdx = inSchema.fieldIndex("payload")
    val outSchema = StructType(Seq(
      inSchema(idIdx),
      StructField("sample_rate", IntegerType),
      StructField("channels", IntegerType),
      StructField("samples", ArrayType(IntegerType, containsNull = false))))
    // Same reasoning as encodeWav: decode is cached-SPI cheap, stay narrow.
    val rdd = df.rdd.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](payloadIdx)
        val dec =
          if (payload == null || !isWav(payload)) null else wavSamples(payload)
        if (dec == null) Row(r.get(idIdx), null, null, null)
        else Row(r.get(idIdx), dec._1, dec._2, dec._3.toSeq)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  // ---------------------------------------------------------------------
  // REAL video path: a length-prefixed frame container whose frames are
  // real PNG payloads — pack, then sample + decode with the real codec.
  // ---------------------------------------------------------------------

  /** Video media metadata: the multimodal contract shape with frame
    * count + rate in place of the image dims.
    */
  val videoMetadataType: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("n_bytes", LongType),
    StructField("checksum", LongType),
    StructField("n_frames", IntegerType),
    StructField("fps", IntegerType)))

  // Container layout: "GFV1" magic, 4-byte big-endian frame count, then
  // per frame a 4-byte big-endian length + the frame's PNG bytes — the
  // minimal honest shape of a chunked media container (AVI/MP4 are the
  // same idea with more chunk types).
  private val VideoMagic: Array[Byte] = "GFV1".getBytes("US-ASCII")

  /** Pack an ordered array<binary> of PNG frame payloads into one video
    * payload → media table (id, payload binary, meta struct). NULL or
    * empty frame lists (and lists containing a NULL frame) emit a NULL
    * payload with metadata kept.
    */
  def packFrames(df: DataFrame, idCol: String, framesCol: String,
      fps: Int = 4): DataFrame = {
    val spark = df.sparkSession
    val inSchema = df.schema
    val idIdx = inSchema.fieldIndex(idCol)
    val fIdx = inSchema.fieldIndex(framesCol)
    val outSchema = StructType(Seq(
      inSchema(idIdx), StructField("payload", BinaryType),
      StructField("meta", videoMetadataType)))
    val rdd = df.rdd.mapPartitions { rows =>
      val baos = new java.io.ByteArrayOutputStream(1 << 12)
      rows.map { r =>
        val frames = if (r.isNullAt(fIdx)) null else r.getSeq[Array[Byte]](fIdx)
        if (frames == null || frames.isEmpty || frames.exists(_ == null))
          Row(r.get(idIdx), null, Row("video/gfv", 0L, 0L, 0, fps))
        else {
          baos.reset()
          val out = new java.io.DataOutputStream(baos)
          out.write(VideoMagic)
          out.writeInt(frames.length)
          frames.foreach { f => out.writeInt(f.length); out.write(f) }
          out.flush()
          val bytes = baos.toByteArray
          val crc = new java.util.zip.CRC32(); crc.update(bytes)
          Row(r.get(idIdx), bytes,
            Row("video/gfv", bytes.length.toLong, crc.getValue,
              frames.length, fps))
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** REAL frame sampling: parse the container, keep every `every`-th
    * frame starting at frame 0, decode each kept frame with the real
    * JDK PNG reader, and emit one row per sampled frame:
    * (id, frame, width, height, pixels array<int> of 0xRRGGBB). This is
    * the honest video-pipeline shape — seek by chunk index WITHOUT
    * decoding skipped frames (only kept frames pay the codec), exactly
    * how keyframe sampling over a real container behaves. Malformed
    * containers or undecodable frames yield NULL rasters for the
    * affected frames (one bad row must not fail the stage).
    */
  def sampleDecodedFrames(df: DataFrame, idCol: String, every: Int): DataFrame = {
    require(every > 0, s"sampleDecodedFrames: stride $every must be positive")
    val spark = df.sparkSession
    val inSchema = df.schema
    val idIdx = inSchema.fieldIndex(idCol)
    val payloadIdx = inSchema.fieldIndex("payload")
    val outSchema = StructType(Seq(
      inSchema(idIdx),
      StructField("frame", IntegerType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("pixels", ArrayType(IntegerType, containsNull = false))))
    val rdd = df.rdd.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.flatMap { r =>
        val payload = r.getAs[Array[Byte]](payloadIdx)
        val in =
          if (payload == null || payload.length < VideoMagic.length + 4 ||
              !java.util.Arrays.equals(
                java.util.Arrays.copyOf(payload, VideoMagic.length), VideoMagic))
            null
          else new java.io.DataInputStream(
            new java.io.ByteArrayInputStream(
              payload, VideoMagic.length, payload.length - VideoMagic.length))
        if (in == null) Iterator.empty
        else {
          // Materialize eagerly: a lazy iterator would defer the reads
          // past this try, letting a truncated container's EOF escape
          // the catch and fail the stage. The per-row list is bounded
          // (one container's kept frames), so this holds no more than
          // the decode working set already does.
          val out = List.newBuilder[Row]
          try {
          val nFrames = in.readInt()
          var f = 0
          while (f < nFrames) {
            val len = in.readInt()
            // A corrupt length word (negative, or larger than the bytes
            // that exist) is a data problem like truncation — stop at
            // the frames already read; without this, a negative len
            // throws NegativeArraySizeException (not IOException) out of
            // the catch and a huge one attempts a matching allocation.
            if (len < 0 || len > in.available())
              throw new java.io.IOException(s"corrupt frame length $len")
            if (f % every != 0) in.skipBytes(len) // seek, no decode
            else {
              val bytes = new Array[Byte](len)
              in.readFully(bytes)
              val img = javax.imageio.ImageIO.read(
                new java.io.ByteArrayInputStream(bytes))
              if (img == null) out += Row(r.get(idIdx), f, null, null, null)
              else {
                val w = img.getWidth; val h = img.getHeight
                val px = new Array[Int](w * h)
                var i = 0
                while (i < px.length) {
                  px(i) = img.getRGB(i % w, i / w) & 0xffffff; i += 1
                }
                out += Row(r.get(idIdx), f, w, h, px.toSeq)
              }
            }
            f += 1
          }
          } catch {
            // truncated container: keep the frames read before the
            // break — a data problem, not a stage failure
            case _: java.io.IOException => ()
          }
          out.result().iterator
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Deterministic frame sampling: split the payload into `frames` equal
    * byte windows (≙ video frame extraction), checksum each. Pure
    * expressions — no data leaves the executor row. `substring` operates
    * directly on the BinaryType payload, so windows are true byte offsets
    * and non-UTF-8 payloads (real JPEG/audio bytes) slice losslessly.
    * The checksum is a 16-hex-char (64-bit) md5 PREFIX of the window —
    * engine-portable (any SQL oracle computes the same digest; crc32 is
    * not generally available), same collision budget as the old crc.
    */
  def sampleFrames(df: DataFrame, idCol: String, frames: Int = 4): DataFrame =
    df.select(col(idCol), col("meta.n_bytes").as("n_bytes"),
      posexplode(transform(sequence(lit(0), lit(frames - 1)), f => {
        // Spark's `/` is double division — floor it so window offsets are
        // exact byte positions, not truncated fractional strides.
        val w = greatest(floor(col("meta.n_bytes") / frames).cast(LongType), lit(1L))
        substring(md5(substring(col("payload"),
          (f * w + 1).cast(IntegerType), w.cast(IntegerType))), 1, 16)
      })))
      .withColumnsRenamed(Map("pos" -> "frame", "col" -> "frame_checksum"))
}
