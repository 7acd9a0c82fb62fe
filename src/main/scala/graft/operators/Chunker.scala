package graft.operators

import graft.functions.TextFunctions._
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Token-window chunking — the Spark-native preprocessing step behind the
  * reference's chunk corpus (`chunk_size`/`chunk_overlap` throughout
  * `src/evaluation/retrieval_evaluation.py:328-329` and the Week-1
  * preprocessing notebook; reference default 256 tokens, scaled to the
  * synthetic corpus here).
  *
  * Windows start every `size - overlap` tokens:
  *   n_chunks = max(1, ceil((n_tokens - overlap) / stride))
  * so every token is covered, consecutive chunks share `overlap` tokens,
  * and short docs yield exactly one chunk.
  *
  * Scale: tokenize + slice + posexplode are all narrow (no shuffle); at
  * 100 TB chunking is a pure map stage that pipelines into the embedding
  * or indexing job behind it.
  */
object Chunker {
  val ChunkSize = 32
  val Overlap = 8
  val Stride: Int = ChunkSize - Overlap

  def chunk(docs: DataFrame, size: Int = ChunkSize, overlap: Int = Overlap): DataFrame =
    chunkUnsorted(docs, size, overlap).orderBy("doc_id", "chunk_id")

  /** [[chunk]] without the output ordering — the narrow-only form usable
    * inside Structured Streaming (sort is not allowed on unbounded
    * streams; ordering there is the sink's concern).
    */
  /** The shared tokenize → chunk-count → fan-out scaffold: one row per
    * (doc_id, chunk_id) carrying `toks` and `n_chunks` — the single
    * definition of how many chunks a document has, consumed by both the
    * chunker and the small-to-big expansion so they can never disagree.
    */
  private def chunkRows(docs: DataFrame, size: Int, overlap: Int): DataFrame = {
    val stride = size - overlap
    val n = org.apache.spark.sql.functions.size(col("toks"))
    val nChunks = greatest(
      ceil((n - lit(overlap)).cast("double") / stride).cast("int"), lit(1))
    docs.select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("toks"), nChunks.as("n_chunks"),
        explode(sequence(lit(0), nChunks - 1)).as("chunk_id"))
  }

  def chunkUnsorted(docs: DataFrame, size: Int = ChunkSize, overlap: Int = Overlap): DataFrame = {
    val stride = size - overlap
    chunkRows(docs, size, overlap)
      .select(col("doc_id"), col("chunk_id"),
        org.apache.spark.sql.functions.size(
          slice(col("toks"), col("chunk_id") * stride + 1, lit(size))).as("n_tokens"),
        md5(array_join(
          slice(col("toks"), col("chunk_id") * stride + 1, lit(size)), " ")).as("chunk_hash"))
  }

  def chunkSql(size: Int = ChunkSize, overlap: Int = Overlap): String = {
    val stride = size - overlap
    s"""WITH toked AS (
       |  SELECT doc_id,
       |    list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), t -> t <> '') AS toks
       |  FROM documents),
       |ch AS (
       |  SELECT doc_id, toks,
       |    unnest(range(0, greatest(CAST(ceil((len(toks) - $overlap) / $stride.0) AS BIGINT), 1))) AS chunk_id
       |  FROM toked)
       |SELECT doc_id, chunk_id,
       |  len(list_slice(toks, chunk_id * $stride + 1, chunk_id * $stride + $size)) AS n_tokens,
       |  md5(array_to_string(list_slice(toks, chunk_id * $stride + 1, chunk_id * $stride + $size), ' ')) AS chunk_hash
       |FROM ch
       |ORDER BY doc_id, chunk_id""".stripMargin
  }

  def query(s: SparkSession, dir: String): DataFrame = chunk(Tables.documents(s, dir))
  val oracle: String = chunkSql()

  // --- small-to-big expansion ----------------------------------------------

  /** Small-to-big context expansion — the reference's `expanded_content`
    * property (`src/database/properties_template.py:64`: "Expanded window
    * of the content field for additional context", toggled by
    * `small_to_big` in `data_models.py:49`): retrieval matches the small
    * chunk, generation reads the chunk ± one neighbor window. Each chunk
    * row carries its expansion bounds and the expanded window's token
    * count + content hash.
    *
    * Scale: identical narrow shape to [[chunk]] — the expansion is a
    * second slice over the SAME token array in the same map stage; no
    * shuffle, no self-join of chunks against neighbors.
    */
  def chunkExpanded(docs: DataFrame, size: Int = ChunkSize,
                    overlap: Int = Overlap): DataFrame = {
    val stride = size - overlap
    val expFrom = greatest(col("chunk_id") - 1, lit(0))
    val expTo = least(col("chunk_id") + 1, col("n_chunks") - 1)
    val expLen = (expTo - expFrom) * stride + size
    chunkRows(docs, size, overlap)
      .select(col("doc_id"), col("chunk_id"),
        expFrom.as("exp_from"), expTo.as("exp_to"),
        org.apache.spark.sql.functions.size(
          slice(col("toks"), expFrom * stride + 1, expLen)).as("expanded_tokens"),
        md5(array_join(
          slice(col("toks"), expFrom * stride + 1, expLen), " ")).as("expanded_hash"))
      .orderBy("doc_id", "chunk_id")
  }

  def chunkExpandedSql(size: Int = ChunkSize, overlap: Int = Overlap): String = {
    val stride = size - overlap
    val from = s"greatest(chunk_id - 1, 0)"
    val to = s"least(chunk_id + 1, n_chunks - 1)"
    s"""WITH toked AS (
       |  SELECT doc_id,
       |    list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), t -> t <> '') AS toks
       |  FROM documents),
       |ch AS (
       |  SELECT doc_id, toks,
       |    greatest(CAST(ceil((len(toks) - $overlap) / $stride.0) AS BIGINT), 1) AS n_chunks,
       |    unnest(range(0, greatest(CAST(ceil((len(toks) - $overlap) / $stride.0) AS BIGINT), 1))) AS chunk_id
       |  FROM toked)
       |SELECT doc_id, chunk_id,
       |  $from AS exp_from, $to AS exp_to,
       |  len(list_slice(toks, $from * $stride + 1, $to * $stride + $size)) AS expanded_tokens,
       |  md5(array_to_string(list_slice(toks, $from * $stride + 1, $to * $stride + $size), ' ')) AS expanded_hash
       |FROM ch
       |ORDER BY doc_id, chunk_id""".stripMargin
  }

  def qExpand(s: SparkSession, dir: String): DataFrame =
    chunkExpanded(Tables.documents(s, dir))
  val expandOracle: String = chunkExpandedSql()

  // --- sequence packing ----------------------------------------------------

  val PackBudget = 256

  /** Greedy sequence packing: assign documents, in stable (source,
    * doc_id) order, to consecutive training bins of ~`budget` tokens —
    * the standard "pack short documents into fixed-length sequences"
    * pretraining step. A document starts a new bin when the running
    * total would cross the budget boundary (bin = floor(preceding-total
    * / budget); oversized docs own as many bins as they span).
    *
    * Scale: one window per source partition (running sum over narrow
    * rows) — the same shuffle shape as sessionization; no token data
    * moves, only counts.
    */
  def pack(docs: DataFrame, budget: Int = PackBudget): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("source").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.select(col("doc_id"), col("source"),
        org.apache.spark.sql.functions.size(tokens(col("text"))).as("n_tokens"))
      .withColumn("bin_id",
        floor((sum(col("n_tokens")).over(w) - col("n_tokens")) / budget).cast("long"))
      .orderBy("source", "doc_id")
  }

  def packSql(budget: Int = PackBudget): String =
    s"""WITH toked AS (
       |  SELECT doc_id, source, len($TextAnalysisToks) AS n_tokens FROM documents)
       |SELECT doc_id, source, n_tokens,
       |  CAST(floor((sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens)
       |    / $budget) AS BIGINT) AS bin_id
       |FROM toked
       |ORDER BY source, doc_id""".stripMargin

  private def TextAnalysisToks: String = TextAnalysis.sqlToks

  def qPack(s: SparkSession, dir: String): DataFrame = pack(Tables.documents(s, dir))
  val packOracle: String = packSql()
}
