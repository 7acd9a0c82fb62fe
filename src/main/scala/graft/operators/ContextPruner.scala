package graft.operators

import graft.functions.TextFunctions._
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget context assembly — the Spark-native
  * `validate_token_threshold` (reference `src/app_functions.py:47-88`):
  * given ranked hits, drop from the tail (most irrelevant first) until the
  * prompt fits the token budget. Batch formulation: keep the maximal
  * prefix, in rank order, whose running token total stays within budget —
  * a running-sum window over the (small, already top-k) candidate set.
  */
object ContextPruner {
  val TokenBudget = 400

  def prune(ranked: DataFrame, budget: Int = TokenBudget): DataFrame = {
    val w = Window.orderBy(desc("score"), asc("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranked
      .withColumn("n_tokens", col("n_tokens"))
      .withColumn("cum_tokens", sum("n_tokens").over(w))
      .filter(col("cum_tokens") <= budget)
      .select("doc_id", "score", "n_tokens", "cum_tokens")
      .orderBy(desc("score"), asc("doc_id"))
  }

  def search(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    // join the top-k BEFORE tokenizing: n_tokens is computed for the k
    // candidates only, not the whole corpus (the pre-join projection
    // would tokenize every document to feed a 10-row join)
    val ranked = KeywordSearch.bm25(docs, KeywordSearch.QueryTerms)
      .join(docs.select(col("doc_id").as("d2"), col("text")),
        col("doc_id") === col("d2"))
      .withColumn("n_tokens", tokenCount(col("text")))
      .drop("d2", "text")
    prune(ranked)
  }

  val searchOracle: String =
    s"""WITH cand AS (${KeywordSearch.bm25Sql(KeywordSearch.QueryTerms)}),
       |counted AS (
       |  SELECT cand.doc_id, cand.score,
       |    len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), t -> t <> '')) AS n_tokens
       |  FROM cand JOIN documents ON cand.doc_id = documents.doc_id),
       |running AS (
       |  SELECT doc_id, score, n_tokens,
       |    CAST(sum(n_tokens) OVER (ORDER BY score DESC, doc_id
       |                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
       |  FROM counted)
       |SELECT doc_id, score, n_tokens, cum_tokens
       |FROM running
       |WHERE cum_tokens <= $TokenBudget
       |ORDER BY score DESC, doc_id""".stripMargin
}
