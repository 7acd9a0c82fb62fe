package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** RAG prompt assembly — the Spark-native `generate_prompt_series`
  * (reference `src/llm/prompt_templates.py`, used by
  * `src/app_functions.py:65-68`): interleave the ranked, pruned context
  * chunks into a single numbered prompt string per query.
  *
  * In-engine this is an ordered aggregation: sort hits by rank, number
  * them, concatenate — one expression over the (tiny) per-query result,
  * so prompt construction for a million-query batch is still one
  * shuffle-free pass over the top-k table.
  */
object PromptAssembly {

  /** One row: the assembled context block over the pruned BM25 hits. */
  def assemble(ranked: DataFrame): DataFrame =
    ranked
      .withColumn("numbered",
        concat(col("rk").cast("string"), lit(". "), col("snippet")))
      .agg(
        count(lit(1)).as("n_contexts"),
        array_join(transform(array_sort(collect_list(struct(col("rk"), col("numbered")))),
          x => x.getField("numbered")), "\n").as("prompt"))

  def query(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val hits = KeywordSearch.bm25(docs, KeywordSearch.QueryTerms, 5)
      .join(docs.select(col("doc_id").as("d2"), col("text")),
        col("doc_id") === col("d2"))
      .withColumn("snippet", substring(col("text"), 1, 40)).drop("text")
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(desc("score"), asc("doc_id"))))
    assemble(hits.select(col("rk"), col("snippet")))
  }

  val oracle: String =
    s"""WITH cand AS (${KeywordSearch.bm25Sql(KeywordSearch.QueryTerms, 5)}),
       |hits AS (
       |  SELECT row_number() OVER (ORDER BY cand.score DESC, cand.doc_id) AS rk,
       |    substring(text, 1, 40) AS snippet
       |  FROM cand JOIN documents ON cand.doc_id = documents.doc_id)
       |SELECT count(*) AS n_contexts,
       |  string_agg(CAST(rk AS VARCHAR) || '. ' || snippet, chr(10) ORDER BY rk) AS prompt
       |FROM hits""".stripMargin
}
