package graft.operators

import graft.functions.TextFunctions._
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The generation slot — the engine-side counterpart of the reference's
  * `chat_completion` (`src/llm/llm_interface.py:68`, and `stream_chat`,
  * `src/app_functions.py:90`): the step that turns retrieved context
  * into an answer. An LLM call is an external service, not an engine
  * operator; what the ENGINE owns is the deterministic data path around
  * the slot — and a real extractive baseline IN it: retrieve → split
  * contexts into token spans → score spans against the query → select
  * the top spans with [rank] citations into one answer string.
  * Swapping a served model into the slot replaces [[extractiveAnswer]]'s
  * span selection with a `chat_completion` call through the
  * [[Inference]] seam; everything upstream (retrieval, assembly) and
  * downstream (answer eval, [[AnswerEval]]) is unchanged.
  *
  * This completes the reference RAG loop as ONE declarative oracle-
  * checked plan: retrieve (BM25/hybrid) → rank → prune → assemble →
  * GENERATE → evaluate.
  *
  * Scale design: generation math runs on k retrieved docs per query
  * (never the corpus); span fan-out is ≤ k·(dl/w) rows; the top-m span
  * pick is a bounded TakeOrderedAndProject; the final concat is one
  * ordered aggregation over m rows.
  */
object Generation {
  val ContextK = 5
  val SpanTokens = 12
  val TopSpans = 3

  /** One row per query batch: the extractive answer with [rank]
    * citations, over the BM25 top-k contexts.
    */
  def extractiveAnswer(docs: DataFrame, terms: Seq[String],
                       k: Int = ContextK, w: Int = SpanTokens,
                       m: Int = TopSpans): DataFrame =
    assembleSpans(answerSpans(docs, terms, k, w, m))

  /** The INCREMENTAL half of generation: the m selected spans as ranked
    * rows (rn, piece) — the unit the streaming chat surface emits one
    * at a time ([[graft.streaming.GenerateStream]]).
    */
  def answerSpans(docs: DataFrame, terms: Seq[String],
                  k: Int = ContextK, w: Int = SpanTokens,
                  m: Int = TopSpans): DataFrame = {
    val cand = KeywordSearch.bm25(docs, terms, k)
      .join(docs.select(col("doc_id").as("d2"), col("text")),
        col("doc_id") === col("d2"))
      .select(col("score"), col("doc_id"), tokens(col("text")).as("tk"))
      // empty-token docs drop BEFORE rank assignment, matching the
      // oracle's WHERE-before-row_number order
      .filter(size(col("tk")) > 0)
      // ≤ k rows by construction: the single-partition window is the
      // right plan (cf. Reranker)
      .withColumn("rk", row_number().over(
        Window.orderBy(desc("score"), asc("doc_id"))))
      .select(col("rk"), col("tk"))
    val qArr = array(terms.map(lit): _*)
    val spans = cand
      .select(col("rk"), col("tk"),
        explode(sequence(lit(0),
          ceil(size(col("tk")).cast("double") / w).cast("int") - 1)).as("i"))
      .select(col("rk"), col("i"),
        slice(col("tk"), col("i") * w + 1, lit(w)).as("span"))
      .withColumn("sc",
        size(filter(col("span"), t => array_contains(qArr, t))))
    val top = spans
      .orderBy(desc("sc"), asc("rk"), asc("i"))
      .limit(m)
      .withColumn("rn", row_number().over(
        Window.orderBy(desc("sc"), asc("rk"), asc("i"))))
      .withColumn("piece",
        concat(lit("["), col("rk").cast("string"), lit("] "),
          array_join(col("span"), " ")))
    top.select(col("rn"), col("piece"))
  }

  /** The blocking half: ordered span concatenation into the one-row
    * answer — identical whether the spans arrived in batch or streamed.
    */
  def assembleSpans(spans: DataFrame): DataFrame =
    spans.agg(
      count(lit(1)).as("n_spans"),
      array_join(transform(array_sort(collect_list(struct(col("rn"), col("piece")))),
        x => x.getField("piece")), " ... ").as("answer"))

  def answerSql(terms: Seq[String], k: Int = ContextK, w: Int = SpanTokens,
                m: Int = TopSpans): String = {
    val termList = terms.map(t => s"'$t'").mkString("[", ", ", "]")
    s"""WITH cand AS (${KeywordSearch.bm25Sql(terms, k)}),
       |ctx AS (
       |  SELECT row_number() OVER (ORDER BY cand.score DESC, cand.doc_id) AS rk,
       |    ${TextAnalysis.sqlToks} AS toks
       |  FROM cand JOIN documents ON cand.doc_id = documents.doc_id
       |  WHERE len(${TextAnalysis.sqlToks}) > 0),
       |fanned AS (
       |  SELECT rk, toks,
       |    unnest(range(0, CAST(ceil(len(toks) / $w.0) AS BIGINT))) AS i
       |  FROM ctx),
       |spans AS (
       |  SELECT rk, i, list_slice(toks, i * $w + 1, (i + 1) * $w) AS span
       |  FROM fanned),
       |scored AS (
       |  SELECT rk, i, span,
       |    len(list_filter(span, t -> list_contains($termList, t))) AS sc
       |  FROM spans),
       |topm AS (
       |  SELECT rk, i, span, sc FROM scored
       |  ORDER BY sc DESC, rk, i LIMIT $m),
       |numbered AS (
       |  SELECT row_number() OVER (ORDER BY sc DESC, rk, i) AS rn,
       |    '[' || CAST(rk AS VARCHAR) || '] ' || array_to_string(span, ' ') AS piece
       |  FROM topm)
       |SELECT count(*) AS n_spans,
       |  coalesce(string_agg(piece, ' ... ' ORDER BY rn), '') AS answer
       |FROM numbered""".stripMargin
  }

  /** JSON-mode assembly (the reference's `stream_json_chat`,
    * `src/app_functions.py:113`, which requests
    * `response_format={"type": "json_object"}`): the SAME spans, wrapped
    * as one JSON object `{"answer": ..., "n_spans": ...}` — the
    * structured-output twin of [[assembleSpans]]. The answer text is
    * normalized tokens + citation brackets (no quotes/backslashes), so
    * the oracle rebuilds the object with plain concatenation.
    */
  def assembleJson(spans: DataFrame): DataFrame =
    assembleSpans(spans).select(
      to_json(struct(col("answer"), col("n_spans"))).as("json_chat"))

  def query(s: SparkSession, dir: String): DataFrame =
    extractiveAnswer(Tables.documents(s, dir), KeywordSearch.QueryTerms)

  val oracle: String = answerSql(KeywordSearch.QueryTerms)

  def jsonOracle: String =
    s"""SELECT '{"answer":"' || answer || '","n_spans":' ||
       |  CAST(n_spans AS VARCHAR) || '}' AS json_chat
       |FROM (${answerSql(KeywordSearch.QueryTerms)})""".stripMargin
}
