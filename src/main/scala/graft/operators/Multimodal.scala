package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Row}

/** Multimodal-column plumbing: image/audio/video payloads travel as opaque
  * `binary` columns next to a typed metadata struct; decode / feature
  * extraction runs partition-batched over the binary payloads.
  *
  * The decode step itself is STUBBED with a deterministic fake — this
  * container ships no image/audio codecs — but everything Spark-side is
  * real and load-bearing at scale: the schema contract, the
  * `mapPartitions` batch shape (one reusable decoder per partition, not
  * per row — exactly how a JNI/FFmpeg binding must be held), kryo-free
  * row encoding, and partition sizing by byte volume rather than row
  * count.
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

  /** STUB — deterministic fake decoder standing in for a real image/audio
    * decode (???: no codec libraries in this environment). Emits `dim`
    * floats derived from payload bytes; a real implementation swaps ONLY
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

  /** Partition-batched feature extraction over the payload column.
    * `mapPartitions` (not per-row UDF) so a real decoder is initialized
    * once per partition — the pattern that matters for JNI decoders.
    * Output: (id, features array<float>).
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
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](payloadIdx)
        // NULL payload → NULL features (one bad row must not fail the
        // stage; every expression-based operator here is null-tolerant).
        Row(r.get(idIdx), if (payload == null) null else decodeStub(payload, dim))
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** STUB resize — deterministic stride-sampling of the payload bytes to
    * the target pixel budget (???: a real implementation decodes, scales,
    * re-encodes; no codecs in this environment). Same partition-batched
    * shape as [[extractFeatures]]: payload in, smaller payload + updated
    * metadata out, decoder handle initialized once per partition. Output
    * schema: (id, payload binary, meta struct) — a media table again, so
    * resize composes with extractFeatures/sampleFrames.
    */
  def resize(df: DataFrame, idCol: String, width: Int, height: Int): DataFrame = {
    val spark = df.sparkSession
    val inSchema = df.schema
    val idIdx = inSchema.fieldIndex(idCol)
    val payloadIdx = inSchema.fieldIndex("payload")
    val metaIdx = inSchema.fieldIndex("meta")
    val outSchema = StructType(Seq(
      inSchema(idIdx),
      StructField("payload", BinaryType),
      StructField("meta", metadataType)))
    // Stub byte budget — Long math (width·height overflows Int at 64k²).
    val budget = math.min(Int.MaxValue.toLong,
      math.max(1L, width.toLong * height.toLong / 64)).toInt
    val rdd = df.rdd.mapPartitions { rows =>
      // Real pipelines initialize the decoder/scaler here, once.
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](payloadIdx)
        val meta = r.getStruct(metaIdx)
        if (payload == null) {
          // NULL payload rides through as NULL with its metadata kept —
          // one bad row must not fail the stage.
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
