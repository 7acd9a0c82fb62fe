package graft.operators

import graft.functions.TextFunctions._
import graft.functions.VectorFunctions._
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Answer-correctness evaluation — the Spark-native
  * `TestCaseGenerator` + `PollingEvaluation.evaluate_answer_correctness`
  * (reference `src/evaluation/llm_evaluation.py:186-378`): build one test
  * case per golden query — (input, actual_output, retrieval_context) from
  * the retriever's top-k — score each case with a panel of judges,
  * mark success at `threshold` (ref default 0.8), and aggregate the
  * polling result (per-case panel mean; overall `evaluation_score`
  * rounded to 3dp exactly as `polling_evaluation` does).
  *
  * The reference's judges are LLM calls (GEval). The inference slot is
  * outside engine scope; the panel here is three DETERMINISTIC lexical
  * judges mirroring the metric's evaluation_steps (L199-203):
  *   - `grounding`  — "compare the actual output with the retrieval
  *     context": fraction of the answer's tokens corroborated by the
  *     OTHER retrieved contexts (ranks 2..k — rank 1 is the answer slot);
  *   - `relevance_f1` — "does the output address the input": token-set F1
  *     between answer and input;
  *   - `coverage`  — "comprehensiveness over the input's key aspects":
  *     fraction of the input's tokens present in the answer.
  * The answer slot (`actual_output`) is the extractive stand-in: the
  * rank-1 retrieved document.
  *
  * Scale: queries broadcast into ONE corpus scan; per-query top-k via the
  * bounded heap (no window); tokenization and all judge arithmetic run on
  * k x |queries| rows — never corpus-wide. A million-query eval at 100 TB
  * is the same single-scan shape as [[VectorSearch.batchTopK]].
  */
object AnswerEval {
  val QueryStride = 100
  val TopK = 5
  val Threshold = 0.8

  private def inter(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double")

  /** One row per test case: the three judge scores, their panel mean, and
    * the threshold verdict. Deterministic ordering by q_id.
    */
  def cases(docs: DataFrame, embs: DataFrame, stride: Int = QueryStride,
            k: Int = TopK, threshold: Double = Threshold): DataFrame = {
    val queries = embs.filter(col("vec_id") % stride === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    // one corpus scan; k winners per query survive the heap
    val ranked = embs.join(broadcast(queries), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        cosineSim(col("embedding"), col("q_emb")).as("raw_score"))
      .groupBy("q_id")
      .agg(topKByScore(col("raw_score"), col("vec_id"), k).as("top"))
      .select(col("q_id"), posexplode(col("top")).as(Seq("i", "t")))
      .select(col("q_id"), (col("i") + 1).as("rn"), col("t.id").as("vec_id"))
    // enrichment above the candidate join: only k x |queries| rows tokenize
    val toked = ranked
      .join(docs.select(col("doc_id"), col("text")), col("vec_id") === col("doc_id"))
      .select(col("q_id"), col("rn"), array_distinct(tokens(col("text"))).as("toks"))
    val actual = toked.filter(col("rn") === 1)
      .select(col("q_id"), col("toks").as("a_toks"))
    val ctx = toked.filter(col("rn") >= 2)
      .select(col("q_id"), explode(col("toks")).as("tok")).distinct()
      .groupBy("q_id").agg(collect_list(col("tok")).as("c_union"))
    val inputs = docs.filter(col("doc_id") % stride === 0)
      .select(col("doc_id").as("q_id"), array_distinct(tokens(col("text"))).as("i_toks"))
    // denominators clamped to >=1: a doc that tokenizes to nothing
    // scores 0, never NaN (NaN semantics diverge between engines)
    val judged = actual.join(ctx, Seq("q_id")).join(inputs, Seq("q_id"))
      .select(col("q_id"),
        round(inter(col("a_toks"), col("c_union")) /
          greatest(size(col("a_toks")), lit(1)), 4).as("grounding"),
        round(lit(2.0) * inter(col("a_toks"), col("i_toks")) /
          greatest(size(col("a_toks")) + size(col("i_toks")), lit(1)).cast("double"), 4)
          .as("relevance_f1"),
        round(inter(col("a_toks"), col("i_toks")) /
          greatest(size(col("i_toks")), lit(1)), 4).as("coverage"))
    judged
      .withColumn("score",
        round((col("grounding") + col("relevance_f1") + col("coverage")) / 3.0, 4))
      .withColumn("success", (col("score") >= threshold).cast("int"))
      .orderBy("q_id")
  }

  /** The polling rollup (`polling_evaluation` L352-357): case count, mean
    * panel score rounded to 3dp, and the threshold pass rate.
    */
  def poll(docs: DataFrame, embs: DataFrame, stride: Int = QueryStride,
           k: Int = TopK, threshold: Double = Threshold): DataFrame =
    cases(docs, embs, stride, k, threshold).agg(
      count(lit(1)).as("n_cases"),
      round(avg(col("score")), 3).as("evaluation_score"),
      round(avg(col("success").cast("double")), 4).as("pass_rate"))

  private def casesSqlBody(stride: Int, k: Int, threshold: Double): String =
    s"""WITH queries AS (
       |  SELECT vec_id AS q_id, embedding AS q_emb
       |  FROM embeddings WHERE vec_id % $stride = 0),
       |scored AS (
       |  SELECT q_id, vec_id,
       |    ${VectorSearch.cosineSql("embedding", "q_emb")} AS raw_score
       |  FROM embeddings JOIN queries ON vec_id <> q_id),
       |ranked AS (
       |  SELECT q_id, vec_id,
       |    row_number() OVER (PARTITION BY q_id ORDER BY raw_score DESC, vec_id) AS rn
       |  FROM scored
       |  QUALIFY rn <= $k),
       |toked AS (
       |  SELECT q_id, rn, list_distinct(${TextAnalysis.sqlToks}) AS toks
       |  FROM ranked JOIN documents ON ranked.vec_id = documents.doc_id),
       |actual AS (SELECT q_id, toks AS a_toks FROM toked WHERE rn = 1),
       |ctx AS (
       |  SELECT q_id, list_distinct(flatten(list(toks))) AS c_union
       |  FROM toked WHERE rn >= 2 GROUP BY q_id),
       |inputs AS (
       |  SELECT doc_id AS q_id, list_distinct(${TextAnalysis.sqlToks}) AS i_toks
       |  FROM documents WHERE doc_id % $stride = 0),
       |judged AS (
       |  SELECT q_id,
       |    round(CAST(len(list_intersect(a_toks, c_union)) AS DOUBLE)
       |      / CAST(greatest(len(a_toks), 1) AS DOUBLE), 4) AS grounding,
       |    round(2.0 * CAST(len(list_intersect(a_toks, i_toks)) AS DOUBLE)
       |      / CAST(greatest(len(a_toks) + len(i_toks), 1) AS DOUBLE), 4) AS relevance_f1,
       |    round(CAST(len(list_intersect(a_toks, i_toks)) AS DOUBLE)
       |      / CAST(greatest(len(i_toks), 1) AS DOUBLE), 4) AS coverage
       |  FROM actual JOIN ctx USING (q_id) JOIN inputs USING (q_id)),
       |cases AS (
       |  SELECT q_id, grounding, relevance_f1, coverage,
       |    round((grounding + relevance_f1 + coverage) / 3.0, 4) AS score
       |  FROM judged)
       |SELECT q_id, grounding, relevance_f1, coverage, score,
       |  CAST(score >= $threshold AS INT) AS success
       |FROM cases""".stripMargin

  def casesSql(stride: Int = QueryStride, k: Int = TopK,
               threshold: Double = Threshold): String =
    casesSqlBody(stride, k, threshold) + "\nORDER BY q_id"

  def pollSql(stride: Int = QueryStride, k: Int = TopK,
              threshold: Double = Threshold): String =
    s"""WITH all_cases AS (
       |${casesSqlBody(stride, k, threshold)})
       |SELECT count(*) AS n_cases,
       |  round(avg(score), 3) AS evaluation_score,
       |  round(avg(CAST(success AS DOUBLE)), 4) AS pass_rate
       |FROM all_cases""".stripMargin

  def queryCases(s: SparkSession, dir: String): DataFrame =
    cases(Tables.documents(s, dir), Tables.embeddings(s, dir))

  val casesOracle: String = casesSql()

  def queryPoll(s: SparkSession, dir: String): DataFrame =
    poll(Tables.documents(s, dir), Tables.embeddings(s, dir))

  val pollOracle: String = pollSql()
}
