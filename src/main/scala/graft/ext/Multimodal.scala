package graft.ext

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: treat image/audio/video payloads as
  * opaque `binary` columns with typed metadata, and run
  * decode / feature-extract / frame-sample stages as *batched
  * per-partition* transforms — the execution shape a real media
  * pipeline needs at 100 TB (no per-row JVM↔native crossings, bounded
  * memory per task, schema known up front).
  *
  * The actual codec work is STUBBED (this container has no image/audio
  * libraries): [[decodeStub]] derives deterministic fake features from
  * the bytes. The Spark-side contract — binary column + metadata
  * struct, partition-batched UDF shape, explicit output schema — is
  * real and tested; a production deployment swaps `fakeDecode` for a
  * JNI/FFI call without touching any plan structure.
  */
object Multimodal {

  /** Metadata extracted on ingest, cheap and codegen'd: byte length,
    * magic-prefix sniffing, and a content hash for dedup/caching.
    */
  def attachMetadata(df: DataFrame, binCol: String): DataFrame = {
    val b = col(binCol)
    df.withColumn("media_bytes", octet_length(b))
      .withColumn("media_magic", hex(substring(b, 1, 4)))
      .withColumn("media_sha", sha2(b, 256))
      .withColumn(
        "media_kind",
        // Full 8-byte PNG signature 0x89 'P' 'N' 'G' \r \n 0x1A \n; RIFF
        // containers are audio/wav only when the form type at offset 9-12
        // is "WAVE" (AVI/WebP are RIFF too).
        when(
          substring(b, 1, 8) === lit(
            Array(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte,
              '\r'.toByte, '\n'.toByte, 0x1A.toByte, '\n'.toByte)),
          "image/png")
          .when(substring(b, 1, 2) === lit(Array(0xFF.toByte, 0xD8.toByte)), "image/jpeg")
          .when(
            substring(b, 1, 4) === lit("RIFF".getBytes) &&
              substring(b, 9, 4) === lit("WAVE".getBytes),
            "audio/wav")
          .when(
            substring(b, 1, 4) === lit("RIFF".getBytes) &&
              substring(b, 9, 4) === lit("AVI ".getBytes),
            "video/avi")
          .when(
            substring(b, 1, 4) === lit("RIFF".getBytes) &&
              substring(b, 9, 4) === lit("WEBP".getBytes),
            "image/webp")
          .otherwise("application/octet-stream"))
  }

  /** Output schema of the decode stage — declared up front, as any
    * `mapPartitions`-style media stage must be.
    */
  val decodedSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("feature", ArrayType(FloatType))))

  /** The stub decoder: deterministic fake "decode + feature extract"
    * over the raw bytes. A real implementation would hand the byte
    * buffer to a codec here (`???` in spirit); everything around it —
    * batch iteration, explicit schema, per-partition granularity — is
    * the production plumbing.
    */
  def decodeStub(
      spark: SparkSession,
      df: DataFrame,
      idCol: String,
      binCol: String,
      featureDim: Int = 8): DataFrame = {
    require(df.columns.contains(idCol) && df.columns.contains(binCol), s"missing $idCol/$binCol")
    val rows = df.select(col(idCol), col(binCol)).rdd.mapPartitions { it =>
      // batched per-partition loop: one buffer reused, no per-row setup —
      // the shape a native decoder binding needs
      it.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        // ---- fake decode: a real codec call goes here ----
        val w = if (bytes.isEmpty) 0 else 16 + (bytes(0) & 0x3F)
        val h = if (bytes.length < 2) 0 else 16 + (bytes(1) & 0x3F)
        val frames = 1 + (bytes.length % 4)
        val feature = Array.tabulate(featureDim) { i =>
          if (bytes.isEmpty) 0f
          else (bytes(i % bytes.length) & 0xFF) / 255f
        }
        Row(id, w, h, frames, feature.toSeq)
      }
    }
    spark.createDataFrame(rows, decodedSchema)
  }

  /** Resize stage (stub): recompute target dimensions preserving aspect
    * ratio and rescale the fake feature vector — the plumbing contract
    * of an image-resize stage (pure projection over the decoded frame,
    * no shuffle; a real implementation swaps the arithmetic for a
    * resampling kernel over the pixel buffer).
    */
  def resizeStub(decoded: DataFrame, maxSide: Int): DataFrame = {
    val scale = least(
      lit(1.0),
      lit(maxSide) / greatest(col("width"), col("height")).cast("double"))
    decoded
      .withColumn("resized_width", ceil(col("width") * scale).cast("int"))
      .withColumn("resized_height", ceil(col("height") * scale).cast("int"))
      .withColumn("feature", transform(col("feature"), x => x * scale.cast("float")))
  }

  /** Frame sampling plumbing for "video" payloads: deterministically
    * slice the byte stream into `n` equal-offset frames (stub for
    * keyframe extraction), exploded to one row per sampled frame.
    */
  def frameSample(df: DataFrame, idCol: String, binCol: String, n: Int): DataFrame = {
    val b = col(binCol)
    val frameLen = greatest(octet_length(b).cast("int") / n, lit(1))
    df.select(
      col(idCol),
      posexplode(
        transform(
          sequence(lit(0), lit(n - 1)),
          i => b.substr((i * frameLen + 1).cast("int"), frameLen.cast("int")))))
      .withColumnRenamed("pos", "frame_idx")
      .withColumnRenamed("col", "frame_bytes")
      .withColumn("frame_crc", crc32(col("frame_bytes")))
  }
}
