package graft.operators

import graft.functions.TextFunctions._
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Second-stage reranking — the Spark-native `ReRanker.rerank` (reference
  * `src/reranker.py:50-88`): score every first-stage hit against the query
  * with a cross-scorer, sort descending, then
  *   - if a threshold is given and ANY hit clears it → return ALL hits
  *     above the threshold (unlimited — reference L83-87);
  *   - otherwise → top_k.
  *
  * The neural cross-encoder is replaced by a deterministic lexical
  * cross-scorer (token-set Jaccard between query and document) — the
  * model inference is outside engine scope (it would be a batched
  * map-partitions over a served model); the operator semantics
  * (score+sort+threshold/top-k and the fallback branch) are what this
  * engine owns, and they're exact.
  *
  * Scale: candidates are already top-`retrieveLimit` (small); the
  * threshold-existence flag is a single-row aggregate broadcast, not a
  * global window.
  */
object Reranker {
  val RetrieveLimit = 50
  val TopK = 10
  val Threshold = 0.05

  def rerank(candidates: DataFrame, terms: Seq[String], topK: Int = TopK,
             threshold: Double = Threshold): DataFrame = {
    val qArr = array(terms.map(lit): _*)
    val scored = candidates
      .withColumn("cross_score",
        round(size(array_intersect(col("tok_set"), qArr)).cast("double") /
          size(array_union(col("tok_set"), qArr)).cast("double"), 4))
    val flag = scored.agg(
      max((col("cross_score") >= threshold).cast("int")).as("any_above"))
    val ranked = scored.join(broadcast(flag))
      .withColumn("rk", row_number().over(
        Window.orderBy(desc("cross_score"), asc("doc_id"))))
    ranked
      .filter(
        (col("any_above") === 1 && col("cross_score") >= threshold) ||
          (col("any_above") === 0 && col("rk") <= topK))
      .select("doc_id", "score", "cross_score")
      .orderBy(desc("cross_score"), asc("doc_id"))
  }

  /** BM25 first stage (retrieve_limit=50) → lexical cross-rerank. */
  def search(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    // join first, tokenize after: the cross-scorer needs token sets for
    // the top-RetrieveLimit candidates only, not the whole corpus
    val candidates = KeywordSearch.bm25(docs, KeywordSearch.QueryTerms, RetrieveLimit)
      .join(docs.select(col("doc_id").as("d2"), col("text")),
        col("doc_id") === col("d2"))
      .withColumn("tok_set", array_distinct(tokens(col("text"))))
      .drop("d2", "text")
    rerank(candidates, KeywordSearch.QueryTerms)
  }

  val searchOracle: String = {
    val terms = KeywordSearch.QueryTerms
    val qList = terms.map(t => s"'$t'").mkString("[", ", ", "]")
    s"""WITH cand AS (${KeywordSearch.bm25Sql(terms, RetrieveLimit)}),
       |toksets AS (
       |  SELECT doc_id AS d2,
       |    list_distinct(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), t -> t <> '')) AS tok_set
       |  FROM documents),
       |scored AS (
       |  SELECT cand.doc_id, cand.score,
       |    round(CAST(len(list_intersect(tok_set, $qList)) AS DOUBLE)
       |          / CAST(len(list_distinct(list_concat(tok_set, $qList))) AS DOUBLE), 4) AS cross_score
       |  FROM cand JOIN toksets ON cand.doc_id = toksets.d2),
       |flag AS (SELECT max(CASE WHEN cross_score >= $Threshold THEN 1 ELSE 0 END) AS any_above FROM scored),
       |ranked AS (
       |  SELECT doc_id, score, cross_score,
       |    row_number() OVER (ORDER BY cross_score DESC, doc_id) AS rk
       |  FROM scored)
       |SELECT doc_id, score, cross_score
       |FROM ranked, flag
       |WHERE (any_above = 1 AND cross_score >= $Threshold)
       |   OR (any_above = 0 AND rk <= $TopK)
       |ORDER BY cross_score DESC, doc_id""".stripMargin
  }
}
