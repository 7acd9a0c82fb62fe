package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: opaque binary payloads + typed metadata,
  * with decode/feature-extraction stages stubbed (codec libraries are
  * out of scope in this environment) while the Spark-side mechanics —
  * schema, batching, partition-parallel decode signature — are real.
  *
  * The reference ingests audio (YouTube → mp4 audio → Whisper transcribe,
  * `notebooks/data_ingest/data_ingest.py:34-77`): a binary-in,
  * features-out pipeline. Here that shape is generalized: a `payload`
  * binary column plus a `modality` tag, decoded per partition.
  *
  * At scale: payloads live in parquet binary columns (or object-store
  * pointers for >100 MB blobs); decode runs inside `mapPartitions` so one
  * task amortizes codec init over its whole partition — the same shape
  * `mapInPandas` gives Python, without row-at-a-time overhead.
  */
object Multimodal {

  /** Attach a payload + modality to the corpus (the testdata carries no
    * true binary column, so text bytes stand in as the opaque payload).
    */
  def withPayload(docs: DataFrame): DataFrame =
    docs
      .withColumn("payload", col("text").cast("binary"))
      .withColumn("modality",
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3).cast("int") + 1))

  /** Typed metadata extraction over opaque payloads (size, digest) —
    * the always-available half of multimodal processing.
    */
  def meta(docs: DataFrame): DataFrame =
    withPayload(docs)
      .select(col("doc_id"), col("modality"),
        octet_length(col("payload")).as("n_bytes"),
        md5(col("payload")).as("digest"))
      .orderBy("doc_id")

  val metaOracle: String =
    """SELECT doc_id,
      |  CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
      |       ELSE 'video' END AS modality,
      |  strlen(text) AS n_bytes,
      |  md5(text) AS digest
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  /** Feature-extraction schema: what a real decoder would emit. */
  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("modality", StringType),
    StructField("frame_index", IntegerType),
    StructField("feature", ArrayType(FloatType))))

  /** Partition-parallel decode + frame-sample. The codec call is the
    * clearly-marked stub: a deterministic fake derives `nFrames` byte
    * windows per payload and hashes each window into a feature — the
    * batching, schema and per-partition amortization are the real
    * contract a codec drops into.
    */
  def extractFeatures(docs: DataFrame, nFrames: Int = 4): DataFrame = {
    val spark = docs.sparkSession
    import org.apache.spark.sql.Row
    val rows = withPayload(docs)
      .select(col("doc_id"), col("modality"), col("payload"))
      .rdd.mapPartitions { it =>
        // STUB: real impl initializes the codec once per partition here.
        it.flatMap { r =>
          val id = r.getLong(0); val mod = r.getString(1)
          val payload = r.getAs[Array[Byte]](2)
          val window = math.max(1, payload.length / nFrames)
          (0 until math.min(nFrames, payload.length)).map { f =>
            val slice = payload.slice(f * window, math.min((f + 1) * window, payload.length))
            // STUB decode: stable per-window pseudo-feature (sum/length/first/last)
            val feat = Array(
              slice.foldLeft(0L)(_ + _).toFloat,
              slice.length.toFloat,
              (if (slice.nonEmpty) slice.head.toFloat else 0f),
              (if (slice.nonEmpty) slice.last.toFloat else 0f))
            Row(id, mod, f, feat.toSeq)
          }
        }
      }
    spark.createDataFrame(rows, featureSchema)
  }

  /** Resize plumbing: binary-in binary-out per-partition transform with
    * typed target dimensions — the image-resize slot of the pipeline.
    * STUB decode/re-encode: the fake "resize" deterministically
    * re-samples the payload bytes to `w*h` length (real impl swaps in a
    * codec after the same per-partition init); schema, batching and
    * dimension metadata are the real contract.
    */
  def resize(docs: DataFrame, w: Int, h: Int): DataFrame = {
    val spark = docs.sparkSession
    import org.apache.spark.sql.Row
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("payload", BinaryType)))
    val rows = withPayload(docs)
      .select(col("doc_id"), col("payload"))
      .rdd.mapPartitions { it =>
        // STUB: real impl initializes the image codec once per partition.
        val n = w * h
        it.map { r =>
          val id = r.getLong(0)
          val p = r.getAs[Array[Byte]](1)
          val out = new Array[Byte](n)
          var i = 0
          // Long index math: i*p.length overflows Int for MB-scale
          // payloads × megapixel targets
          while (i < n) {
            out(i) = if (p.isEmpty) 0 else p(((i.toLong * p.length) / n).toInt)
            i += 1
          }
          Row(id, w, h, out)
        }
      }
    spark.createDataFrame(rows, outSchema)
  }

  // --- REAL image codec path (JDK ImageIO, PNG) ----------------------------

  /** Image side length for the synthesized corpus images. */
  val Side = 16
  val ResizedSide = 8

  /** Synthesize a REAL PNG per document: a [[Side]]² checkerboard whose
    * two colors derive from md5(text) (bytes 0-2 and 3-5). The payload
    * is a genuine image file written by the JDK's PNG encoder — so the
    * decode/resize stages below exercise a real codec, and because the
    * pixel function is known, their outputs are ORACLE-CHECKABLE from
    * the md5 alone (PNG is lossless; the round-trip must be exact).
    * Codec init (ImageIO cache off) happens once per partition — the
    * contract the stubbed generic-modality slots document.
    */
  def encodeImages(docs: DataFrame, side: Int = Side): DataFrame = {
    val spark = docs.sparkSession
    import org.apache.spark.sql.Row
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("png", BinaryType)))
    val rows = docs.select(col("doc_id"), col("text"))
      .rdd.mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false) // per-partition codec init
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { r =>
          val d = md.digest(r.getString(1).getBytes("UTF-8"))
          def c(i: Int) = ((d(i * 3) & 0xff) << 16) | ((d(i * 3 + 1) & 0xff) << 8) | (d(i * 3 + 2) & 0xff)
          val img = new java.awt.image.BufferedImage(side, side,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < side) {
            var x = 0
            while (x < side) {
              img.setRGB(x, y, if ((x + y) % 2 == 0) c(0) else c(1))
              x += 1
            }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          Row(r.getLong(0), bos.toByteArray)
        }
      }
    spark.createDataFrame(rows, outSchema)
  }

  /** REAL decode + feature extraction: ImageIO reads each PNG, features
    * are exact per-channel pixel sums plus dimensions (sums, not means,
    * so the oracle compares exact integers).
    */
  def decodeImageFeatures(images: DataFrame): DataFrame = {
    val spark = images.sparkSession
    import org.apache.spark.sql.Row
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("sum_r", LongType),
      StructField("sum_g", LongType),
      StructField("sum_b", LongType)))
    val rows = images.select(col("doc_id"), col("png"))
      .rdd.mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { r =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1)))
          var (sr, sg, sb) = (0L, 0L, 0L)
          var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) {
              val p = img.getRGB(x, y)
              sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
              x += 1
            }
            y += 1
          }
          Row(r.getLong(0), img.getWidth, img.getHeight, sr, sg, sb)
        }
      }
    spark.createDataFrame(rows, outSchema)
  }

  /** REAL resize: decode, nearest-neighbor resample with explicit source
    * arithmetic (srcX = x·srcW/dstW — deterministic, no library rounding
    * ambiguity), re-encode PNG. Binary-in binary-out, codec once per
    * partition.
    */
  def resizeImages(images: DataFrame, dstW: Int, dstH: Int): DataFrame = {
    val spark = images.sparkSession
    import org.apache.spark.sql.Row
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("png", BinaryType)))
    val rows = images.select(col("doc_id"), col("png"))
      .rdd.mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { r =>
          val src = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1)))
          val dst = new java.awt.image.BufferedImage(dstW, dstH,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < dstH) {
            var x = 0
            while (x < dstW) {
              dst.setRGB(x, y,
                src.getRGB(x * src.getWidth / dstW, y * src.getHeight / dstH))
              x += 1
            }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(dst, "png", bos)
          Row(r.getLong(0), bos.toByteArray)
        }
      }
    spark.createDataFrame(rows, outSchema)
  }

  /** md5-derived color component `idx` (0-5: c1 rgb then c2 rgb) as
    * DuckDB SQL over the document text — the oracle's pixel function.
    */
  private def compSql(idx: Int): String =
    s"CAST('0x' || substring(md5(text), ${idx * 2 + 1}, 2) AS INT)"

  /** Oracle for decode-features: a [[Side]]² checkerboard holds exactly
    * side²/2 pixels of each color, so each channel sum is
    * 128·(c1+c2) — computable from md5(text) without any codec.
    */
  def decodeOracle: String = {
    val half = Side * Side / 2
    s"""SELECT doc_id, $Side AS width, $Side AS height,
       |  CAST($half * (${compSql(0)} + ${compSql(3)}) AS BIGINT) AS sum_r,
       |  CAST($half * (${compSql(1)} + ${compSql(4)}) AS BIGINT) AS sum_g,
       |  CAST($half * (${compSql(2)} + ${compSql(5)}) AS BIGINT) AS sum_b
       |FROM documents
       |ORDER BY doc_id""".stripMargin
  }

  /** Oracle for decode→resize→decode: nearest-neighbor 2:1 downsampling
    * hits only even (x·2, y·2) coordinates, whose parity sum is even —
    * every resized pixel is c1, so channel sums are 64·c1.
    */
  def resizeRealOracle: String = {
    val n = ResizedSide * ResizedSide
    s"""SELECT doc_id, $ResizedSide AS width, $ResizedSide AS height,
       |  CAST($n * ${compSql(0)} AS BIGINT) AS sum_r,
       |  CAST($n * ${compSql(1)} AS BIGINT) AS sum_g,
       |  CAST($n * ${compSql(2)} AS BIGINT) AS sum_b
       |FROM documents
       |ORDER BY doc_id""".stripMargin
  }

  /** Driver query: real PNG encode → real ImageIO decode → features,
    * oracle-checked from the known pixel function.
    */
  def qDecode(s: SparkSession, dir: String): DataFrame =
    decodeImageFeatures(encodeImages(Tables.documents(s, dir)))
      .orderBy("doc_id")

  /** Driver query: real decode → nearest-neighbor resize → re-encode →
    * decode again; oracle-checked.
    */
  def qResizeReal(s: SparkSession, dir: String): DataFrame =
    decodeImageFeatures(
      resizeImages(encodeImages(Tables.documents(s, dir)), ResizedSide, ResizedSide))
      .orderBy("doc_id")

  def qMeta(s: SparkSession, dir: String): DataFrame = meta(Tables.documents(s, dir))

  /** Driver query: binary-in/binary-out resize over the whole corpus
    * (stubbed codec, real partition-parallel batch shape), with a
    * digest instead of raw bytes so the dump stays compact. The digest
    * is md5 over the payload's HEX encoding (not the raw bytes): the
    * oracle engine's md5 accepts only VARCHAR, and hex round-trips the
    * bytes losslessly on both sides — so the stub's byte-resample
    * semantics ARE oracle-gated ([[resizeStubOracle]] rebuilds the
    * resampled payload byte-for-byte from the document text in SQL).
    */
  def qResize(s: SparkSession, dir: String): DataFrame =
    resize(Tables.documents(s, dir), 8, 8)
      .select(col("doc_id"), col("width"), col("height"),
        md5(hex(col("payload"))).as("payload_md5"))
      .orderBy("doc_id")

  /** Oracle for the stubbed resize: replay `out(i) = p[(i·len) / n]`
    * over the UTF-8 bytes of the text (the payload) with pure blob
    * functions — byte `i` of the output is the 2-hex-char slice of the
    * payload's hex string at the resampled offset; empty payloads emit
    * n zero bytes, matching the engine's `p.isEmpty` branch.
    */
  def resizeStubOracle(w: Int = 8, h: Int = 8): String = {
    val n = w * h
    s"""WITH b AS (
       |  SELECT doc_id, hex(encode(text)) AS ph, octet_length(encode(text)) AS len
       |  FROM documents),
       |bytes AS (
       |  SELECT doc_id, i,
       |    CASE WHEN len = 0 THEN '00'
       |         ELSE substring(ph, CAST((i * len) // $n AS INT) * 2 + 1, 2) END AS hx
       |  FROM b, range(0, $n) t(i)),
       |payloads AS (
       |  SELECT doc_id, string_agg(hx, '' ORDER BY i) AS payhex
       |  FROM bytes GROUP BY doc_id)
       |SELECT doc_id, $w AS width, $h AS height, md5(payhex) AS payload_md5
       |FROM payloads
       |ORDER BY doc_id""".stripMargin
  }
}
