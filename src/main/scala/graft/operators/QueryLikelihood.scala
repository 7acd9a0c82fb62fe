package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Query-likelihood ranking with DIRICHLET smoothing — the second
  * classic keyword-scoring family beside BM25 (Zhai & Lafferty 2001;
  * Lucene's `LMDirichletSimilarity`), extending the reference's
  * `keyword_search` surface with the language-model ranker production
  * stacks expose as an alternative similarity:
  *
  *   score(d) = Σ_{t∈q} ln( (tf(t,d) + μ·P(t|C)) / (dl(d) + μ) )
  *
  * with P(t|C) = ctf(t)/|C| and μ = 2000 (the published default).
  * Unlike BM25 every document gets a score (absent terms contribute the
  * smoothed background mass, which still depends on dl) — the defined
  * LM semantics, so no tf>0 filter before the heap.
  *
  * Scale design — the BM25 plan shape exactly: per-doc (dl, tf_i) from
  * the shared one-pass [[KeywordSearch.termStats]]; collection stats
  * (|C|, per-query-term ctf) are ONE tiny aggregate broadcast back; the
  * score is a fixed-order map-side expression; top-k through
  * TakeOrderedAndProject. Collection frequencies are computed for query
  * terms only — the vocabulary is never materialized.
  *
  * Precondition (documented): query terms must exist in the corpus
  * (ctf > 0) or P(t|C) = 0 sends every document's score to -∞ — the
  * benchmark terms are corpus vocabulary, the same contract the BM25
  * benchmark query carries.
  */
object QueryLikelihood {
  val Mu = 2000.0
  val TopK = 10

  /** Fixed-evaluation-order QL sum over the conventional stat columns
    * (`tf_i`/`p_i`/`dl`) — the SQL twin renders the same chain.
    */
  private def qlScoreCol(terms: Seq[String]): Column =
    terms.indices.map { i =>
      log((col(s"tf_$i").cast("double") + lit(Mu) * col(s"p_$i")) /
        (col("dl").cast("double") + lit(Mu)))
    }.reduce(_ + _)

  def search(docs: DataFrame, terms: Seq[String] = KeywordSearch.QueryTerms,
             k: Int = TopK, mu: Double = Mu): DataFrame = {
    require(mu == Mu, "mu is baked into the score column; keep the default")
    val base = KeywordSearch.termStats(docs, terms)
    val aggCols = sum(col("dl")).as("c_total") +:
      terms.indices.map(i => sum(col(s"tf_$i")).as(s"ctf_$i"))
    val stats = base.agg(aggCols.head, aggCols.tail: _*)
      .select(terms.indices.map(i =>
        (col(s"ctf_$i").cast("double") / col("c_total").cast("double")).as(s"p_$i")): _*)
    base.join(broadcast(stats))
      .select(col("doc_id"), col("source"), col("lang"),
        round(qlScoreCol(terms), 4).as("score"))
      .orderBy(desc("score"), asc("doc_id"))
      .limit(k)
  }

  def searchSql(terms: Seq[String] = KeywordSearch.QueryTerms,
                k: Int = TopK): String = {
    val tfs = terms.zipWithIndex.map { case (t, i) =>
      s"len(list_filter(toks, t -> t = '$t')) AS tf_$i"
    }.mkString(",\n    ")
    val ctfs = terms.indices.map(i => s"sum(tf_$i) AS ctf_$i").mkString(", ")
    val ps = terms.indices.map(i =>
      s"CAST(ctf_$i AS DOUBLE) / CAST(c_total AS DOUBLE) AS p_$i").mkString(", ")
    val scores = terms.indices.map { i =>
      s"ln((CAST(tf_$i AS DOUBLE) + $Mu * p_$i) / (dl + $Mu))"
    }.mkString("\n    + ")
    s"""WITH toked AS (
       |  SELECT doc_id, source, lang,
       |    list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), t -> t <> '') AS toks
       |  FROM documents),
       |base AS (
       |  SELECT doc_id, source, lang, CAST(len(toks) AS DOUBLE) AS dl,
       |    $tfs
       |  FROM toked WHERE len(toks) > 0),
       |raw_stats AS (
       |  SELECT sum(CAST(dl AS BIGINT)) AS c_total, $ctfs FROM base),
       |stats AS (SELECT $ps FROM raw_stats)
       |SELECT doc_id, source, lang,
       |  round($scores, 4) AS score
       |FROM base, stats
       |ORDER BY score DESC, doc_id
       |LIMIT $k""".stripMargin
  }

  def qSearch(s: SparkSession, dir: String): DataFrame =
    search(Tables.documents(s, dir))

  val searchOracle: String = searchSql()
}
