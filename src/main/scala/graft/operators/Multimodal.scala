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

  def qMeta(s: SparkSession, dir: String): DataFrame = meta(Tables.documents(s, dir))

  /** Rows-only driver query: binary-in/binary-out resize over the whole
    * corpus (stubbed codec, real partition-parallel batch shape), with a
    * digest instead of raw bytes so the dump stays compact.
    */
  def qResize(s: SparkSession, dir: String): DataFrame =
    resize(Tables.documents(s, dir), 8, 8)
      .select(col("doc_id"), col("width"), col("height"),
        md5(col("payload")).as("payload_md5"))
      .orderBy("doc_id")
}
