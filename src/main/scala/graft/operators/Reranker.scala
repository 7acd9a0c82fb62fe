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

  // --- MMR diversification -------------------------------------------------

  /** MMR relevance weight λ; the redundancy weight is kept as its OWN
    * constant (not computed as 1-λ): `1 - 0.7` is 0.30000000000000004 in
    * IEEE doubles while a SQL `0.3` literal is 0.3 — the oracle replays
    * the exact arithmetic only if both engines parse the same literals.
    */
  val MmrLambda = 0.7
  val MmrGamma = 0.3

  /** Maximal-marginal-relevance rerank (Carbonell & Goldstein 1998) —
    * the diversified context-assembly stage RAG serving adds on top of
    * plain similarity ranking: greedily pick the candidate maximizing
    * `λ·rel(d) − (1−λ)·max_{s∈S} sim(d, s)` so near-duplicate passages
    * don't crowd the prompt (the reference assembles top-k directly,
    * notebooks discuss redundant-context pollution; MMR is the standard
    * fix).
    *
    * Scale shape: relevance top-C and the C×C candidate sim matrix are
    * declarative (heap top-k + broadcast self-join over C=50 rows); only
    * the inherently sequential k-step greedy runs imperatively, over ONE
    * packed row (k·C ≈ 500 comparisons) — the corpus is never touched
    * after the first-stage heap.
    */
  def mmrRerank(embs: DataFrame, queryVecId: Long = graft.operators.VectorSearch.QueryVecId,
                c: Int = RetrieveLimit, k: Int = TopK,
                lambda: Double = MmrLambda, gamma: Double = MmrGamma): DataFrame = {
    import graft.functions.VectorFunctions.cosineSim
    val spark = embs.sparkSession
    import spark.implicits._
    val cand = graft.operators.VectorSearch.topK(embs, queryVecId, c)
      .select(col("vec_id"), col("score"))
    val cemb = embs.join(broadcast(cand), Seq("vec_id"))
      .select(col("vec_id"), col("score"), col("embedding"))
    val psim = cemb.as("a")
      .join(broadcast(cemb.select(col("vec_id").as("v2"), col("embedding").as("e2"))),
        col("vec_id") =!= col("v2"))
      .select(col("vec_id").as("d1"), col("v2").as("d2"),
        round(cosineSim(col("embedding"), col("e2")), 6).as("sim"))
    val packed = cemb
      .agg(collect_list(struct(col("vec_id").as("_1"), col("score").as("_2"))).as("rels"))
      .join(psim.agg(collect_list(
        struct(col("d1").as("_1"), col("d2").as("_2"), col("sim").as("_3"))).as("sims")))
      .as[(Seq[(Long, Double)], Seq[(Long, Long, Double)])]
    packed.flatMap { case (rels, sims) =>
      val rel = rels.toMap
      val simMap = sims.map { case (a, b, s) => (a, b) -> s }.toMap
      val ids = rels.map(_._1).sorted
      var picked = List.empty[Long]
      (1 to math.min(k, ids.size)).map { rn =>
        val (bestDoc, bestScore) = ids.filterNot(picked.contains).map { d =>
          val ms = if (picked.isEmpty) 0.0
            else picked.map(p => simMap((d, p))).max
          d -> (lambda * rel(d) - gamma * ms)
        }.minBy { case (d, s) => (-s, d) }
        picked ::= bestDoc
        (rn, bestDoc, bestScore)
      }
    }.toDF("rn", "doc_id", "mmr_score")
      .withColumn("mmr_score", round(col("mmr_score"), 4))
      .orderBy("rn")
  }

  def mmrOracle(queryVecId: Long = graft.operators.VectorSearch.QueryVecId,
                c: Int = RetrieveLimit, k: Int = TopK): String =
    s"""WITH RECURSIVE cand AS (
       |  SELECT vec_id AS doc_id, score FROM (
       |${graft.operators.VectorSearch.topKSql(queryVecId, c)}) t),
       |emb AS (
       |  SELECT vec_id AS doc_id, embedding FROM embeddings
       |  WHERE vec_id IN (SELECT doc_id FROM cand)),
       |psim AS (
       |  SELECT a.doc_id AS d1, b.doc_id AS d2,
       |    round(${graft.operators.VectorSearch.cosineSql("a.embedding", "b.embedding")}, 6) AS sim
       |  FROM emb a JOIN emb b ON a.doc_id <> b.doc_id),
       |sel AS (
       |  (SELECT 1 AS rn, doc_id, $MmrLambda * score AS mmr_score, [doc_id] AS picked
       |   FROM cand ORDER BY score DESC, doc_id LIMIT 1)
       |  UNION ALL
       |  SELECT rn + 1, nxt.doc_id, nxt.mmr_score, list_append(picked, nxt.doc_id)
       |  FROM sel, LATERAL (
       |    SELECT c.doc_id,
       |      $MmrLambda * c.score - $MmrGamma *
       |        (SELECT max(sim) FROM psim
       |         WHERE psim.d1 = c.doc_id AND list_contains(sel.picked, psim.d2)) AS mmr_score
       |    FROM cand c
       |    WHERE NOT list_contains(sel.picked, c.doc_id)
       |    ORDER BY mmr_score DESC, c.doc_id LIMIT 1) nxt
       |  WHERE rn < $k)
       |SELECT rn, doc_id, round(mmr_score, 4) AS mmr_score
       |FROM sel ORDER BY rn""".stripMargin

  def searchMmr(s: SparkSession, dir: String): DataFrame =
    mmrRerank(Tables.embeddings(s, dir))

  val searchMmrOracle: String = mmrOracle()

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
