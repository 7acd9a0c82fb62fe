package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Micro-batch GENERATION serving — the engine analog of the reference's
  * streaming chat surface (`stream_chat` token streaming,
  * `src/app_functions.py:90`; `achat_completion`,
  * `src/llm/llm_interface.py:107`): requests arrive as a STREAM, each
  * micro-batch runs the retrieval→span-selection half of the generation
  * pipeline, and the answer leaves the engine INCREMENTALLY — one row
  * per selected span with its rank (the span is the engine's
  * token-chunk unit) — instead of one blocking string. Downstream,
  * assembling the streamed spans in rank order must reproduce the batch
  * extractive answer EXACTLY; that equivalence is the driver gate.
  *
  * A served LLM swaps into the span producer the same way it swaps into
  * [[graft.operators.Generation.extractiveAnswer]]; the streaming
  * contract (request stream in, ranked chunk rows out, order-invariant
  * reassembly) is what this twin pins.
  */
object GenerateStream {

  /** requests(req_id, query) stream → per-request ranked answer spans
    * (req_id, rn, piece) emitted per micro-batch via foreachBatch
    * (generation is a multi-stage plan — retrieval, fan-out, heap —
    * that a single streaming aggregation can't express; batchId gives
    * the sink replay semantics).
    */
  def generateServe(requests: DataFrame, docs: DataFrame)
                   (sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery =
    requests.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val reqs = batch.select(col("req_id"), col("query")).na.drop().collect()
        // request fan-out is per-request by construction (a chat turn);
        // the heavy lifting inside each request is fully distributed
        reqs.foreach { r =>
          val terms = r.getString(1).toLowerCase
            .split("[^a-z0-9]+").toSeq.filter(_.nonEmpty)
          val spans = graft.operators.Generation.answerSpans(docs, terms)
            .withColumn("req_id", lit(r.getLong(0)))
            .select(col("req_id"), col("rn"), col("piece"))
          sink(spans, batchId)
        }
      }
      .start()

  /** Driver query: the benchmark generation request streamed through
    * [[generateServe]]; the accumulated span rows reassemble through
    * [[graft.operators.Generation.assembleSpans]] and must hash-match
    * the batch `rag_answer` oracle.
    */
  /** Shared harness: stream the benchmark generation request through
    * [[generateServe]] and return the accumulated span rows (req_id,
    * rn, piece) as a batch frame for whichever assembly the caller
    * pins.
    */
  private def streamedSpans(s: org.apache.spark.sql.SparkSession,
                            dir: String): DataFrame = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val docs = graft.sources.Tables.documents(s, dir)
    val input = MemoryStream[(Long, String)]
    val holder = new java.util.concurrent.atomic.AtomicReference[Array[org.apache.spark.sql.Row]](Array.empty)
    val q = generateServe(
      input.toDF().select(col("_1").as("req_id"), col("_2").as("query")), docs) {
      (spans, _) => { val b = spans.collect(); holder.updateAndGet(prev => prev ++ b); () }
    }
    input.addData((0L, graft.operators.KeywordSearch.QueryTerms.mkString(" ")))
    q.processAllAvailable(); q.stop()
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("req_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("rn", org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("piece", org.apache.spark.sql.types.StringType)))
    s.createDataFrame(java.util.Arrays.asList(holder.get(): _*), schema)
  }

  def qStreamRagAnswer(s: org.apache.spark.sql.SparkSession,
                       dir: String): DataFrame =
    graft.operators.Generation.assembleSpans(streamedSpans(s, dir))

  /** Driver query: the JSON-mode streaming chat twin (`stream_json_chat`,
    * reference `src/app_functions.py:113`) — the SAME streamed span rows,
    * reassembled as one `{"answer": ..., "n_spans": ...}` JSON object;
    * must hash-match the batch JSON oracle.
    */
  def qStreamJsonChat(s: org.apache.spark.sql.SparkSession,
                      dir: String): DataFrame =
    graft.operators.Generation.assembleJson(streamedSpans(s, dir))
}
