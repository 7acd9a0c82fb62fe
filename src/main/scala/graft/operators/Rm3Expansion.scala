package graft.operators

import graft.functions.TextFunctions._
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Pseudo-relevance-feedback QUERY EXPANSION — the RM3 relevance-model
  * recipe (Lavrenko & Croft 2001 relevance models; the Anserini/Lucene
  * RM3 default) re-derived as one declarative plan, extending the
  * reference's keyword search surface (`keyword_search`,
  * `src/database/weaviate_interface_v4.py:201`) the way production IR
  * stacks do when recall matters: retrieve a feedback set, mine the
  * terms that characterize it, re-run the search with an interpolated
  * weighted query.
  *
  * Deterministic model (each step exactly replayable in DuckDB):
  *  - round 1: standard BM25 top-F feedback docs (the oracle-gated
  *    `kw_search_bm25` plan at F).
  *  - relevance-model weight per candidate term (originals excluded):
  *    w(t) = Σ_{d∈F} (tf(t,d)/dl(d)) · bm25(d) — the query-likelihood
  *    factor P(q|d) served by the round-1 BM25 score. Rounded 6dp at
  *    the CUT edge so top-E tie-breaks resolve identically in both
  *    engines (the champion-index lesson); fb-doc-ordered summation.
  *  - interpolation: original terms carry λ/|q| each; the top-E
  *    expansion terms share (1-λ) proportionally to w(t).
  *  - round 2: weighted BM25 — score(d) = Σ_t weight(t)·bm25_t(d),
  *    summed in term order, rounded 4dp at the output edge.
  *
  * Scale design: round 1 is the standard heap-top-F BM25; the expansion
  * statistics touch ONLY the F feedback docs (tiny); the weighted query
  * is a ≤(|q|+E)-row broadcast; round 2 is one postings-style pass —
  * explode, broadcast hash probe against the weighted terms, keyed
  * partial-agg tf, per-term df over matched rows only (never the
  * vocabulary), bounded ordered fold per doc, heap top-k. No corpus
  * window, no second tokenization of anything but the corpus scan
  * itself. At 100 TB this is two BM25-shaped passes, which is what RM3
  * costs everywhere.
  */
object Rm3Expansion {
  val FeedbackK = 10
  val ExpandE = 4
  val Lambda = 0.6
  val TopK = 10

  import KeywordSearch.{B, K1}

  /** Sum of `field` over a struct array in SORTED struct order — the
    * pinned-order floating accumulation both engines share
    * (`sum(x ORDER BY key)` in DuckDB).
    */
  private def orderedSum(xs: Column, field: String): Column =
    aggregate(transform(array_sort(xs), x => x.getField(field)),
      lit(0.0), (a, x) => a + x)

  /** The interpolated weighted query `(term, weight)` — ≤(|q|+E) rows:
    * originals at λ/|q|, top-E expansions sharing (1-λ) ∝ w(t).
    * Exposed for the spec.
    */
  def expansionWeights(docs: DataFrame,
                       terms: Seq[String] = KeywordSearch.QueryTerms,
                       fbK: Int = FeedbackK, e: Int = ExpandE,
                       lambda: Double = Lambda): DataFrame =
    expansionWeightsFrom(docs,
      KeywordSearch.bm25(docs, terms, fbK).select(col("doc_id"), col("score")),
      terms.distinct.sorted, e, lambda)

  /** [[expansionWeights]] over an ARBITRARY feedback frame `fb(doc_id,
    * score)` — shared by the exact round 1 ([[expandedSearch]]) and the
    * champion-pruned round 1 ([[expandedSearchPruned]]); the mining math
    * only ever touches the F feedback rows.
    */
  private def expansionWeightsFrom(docs: DataFrame, fb: DataFrame,
                                   qset: Seq[String], e: Int,
                                   lambda: Double): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    // feedback docs' token stream — F rows joined back to their text
    val fbtok = fb.join(docs.select(col("doc_id"), col("text")), Seq("doc_id"))
      .select(col("doc_id"), col("score"),
        size(tokens(col("text"))).cast("double").as("dl"),
        explode(tokens(col("text"))).as("term"))
    val fbtf = fbtok.filter(!col("term").isin(qset: _*))
      .groupBy(col("doc_id"), col("term"))
      .agg(first(col("score")).as("score"), first(col("dl")).as("dl"),
        count(lit(1)).cast("double").as("tf"))
      .select(col("term"), col("doc_id"),
        (col("tf") * col("score") / col("dl")).as("c"))
    val w = fbtf.groupBy("term")
      .agg(collect_list(struct(col("doc_id"), col("c"))).as("cs"))
      .select(col("term"), round(orderedSum(col("cs"), "c"), 6).as("w"))
    val expanded = w.orderBy(desc("w"), asc("term")).limit(e)
    val tot = expanded.agg(collect_list(struct(col("term"), col("w"))).as("ws"))
      .select(orderedSum(col("ws"), "w").as("tot"))
    val expW = expanded.join(broadcast(tot))
      .select(col("term"), (lit(1 - lambda) * col("w") / col("tot")).as("weight"))
    val origW = qset.map(t => (t, lambda / qset.size)).toDF("term", "weight")
    origW.unionByName(expW)
  }

  /** RM3-expanded search: feedback → expansion → weighted second round. */
  def expandedSearch(docs: DataFrame,
                     terms: Seq[String] = KeywordSearch.QueryTerms,
                     fbK: Int = FeedbackK, e: Int = ExpandE,
                     lambda: Double = Lambda, k: Int = TopK): DataFrame = {
    val wterms = expansionWeights(docs, terms, fbK, e, lambda)
    val tokedE = docs.select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
    val dl = tokedE.groupBy("doc_id").agg(count(lit(1)).cast("double").as("dl"))
    val cstats = dl.agg(count(lit(1)).as("n_docs"), avg("dl").as("avgdl"))
    val matches = tokedE.join(broadcast(wterms), col("tok") === col("term"))
      .groupBy(col("doc_id"), col("term"), col("weight"))
      .agg(count(lit(1)).cast("double").as("tf"))
    val dfs = matches.groupBy("term").agg(count(lit(1)).cast("double").as("df"))
    val contrib = matches
      .join(dl, Seq("doc_id"))
      .join(broadcast(dfs), Seq("term"))
      .join(broadcast(cstats))
      .select(col("doc_id"), col("term"),
        (col("weight")
          * log(lit(1.0) + (col("n_docs").cast("double") - col("df") + 0.5) / (col("df") + 0.5))
          * (col("tf") * (K1 + 1))
          / (col("tf") + lit(K1) * (lit(1 - B) + lit(B) * col("dl") / col("avgdl"))))
          .as("c"))
    contrib.groupBy("doc_id")
      .agg(collect_list(struct(col("term"), col("c"))).as("cs"))
      .select(col("doc_id"), round(orderedSum(col("cs"), "c"), 4).as("score"))
      .orderBy(desc("score"), asc("doc_id"))
      .limit(k)
  }

  // --- champion-pruned RM3 --------------------------------------------------

  /** RM3 with BOTH BM25-shaped rounds pruned against the standing
    * champion artifact ([[ChampionIndex]]): round 1's feedback set comes
    * from the query terms' champion lists (the [[ChampionIndex
    * .bm25Champion]] ranking, ≤|q|·M candidate rows), the expansion
    * mining is unchanged (it tokenizes only the F feedback docs), and
    * the weighted second round sums `weight(t) · imp(t, d)` over each
    * weighted term's top-M champion postings instead of re-scanning the
    * corpus — per-query cost (|q|+E)·M candidate rows REGARDLESS of
    * corpus size, the same bound as the rest of the keyword family. The
    * exact [[expandedSearch]] is two full BM25-shaped corpus passes
    * (~N per query; SCALE.md caps it at 100×) — this is its at-scale
    * serving form.
    *
    * Approximation contract (the champion family's): a doc outside all
    * weighted terms' champion lists cannot be retrieved, and a
    * candidate's score counts only the lists it made. With M ≥ the
    * longest postings list NOTHING is pruned and both rounds reproduce
    * the exact RM3 ranking up to the index's 6dp impact rounding
    * (spec-pinned, the full-probe ≡ brute-force pattern).
    *
    * Determinism: round-1 scores replay [[ChampionIndex.bm25Champion]]'s
    * `round(sum(imp), 4)`; the second round's weighted contributions
    * accumulate in term order (struct-sorted fold ≡ `sum(c ORDER BY
    * term)`), rounded 4dp at the output edge.
    */
  def expandedSearchPruned(docs: DataFrame, champs: DataFrame,
                           terms: Seq[String] = KeywordSearch.QueryTerms,
                           fbK: Int = FeedbackK, e: Int = ExpandE,
                           lambda: Double = Lambda, k: Int = TopK): DataFrame = {
    val qset = terms.distinct.sorted
    val fb = champs.filter(col("term").isin(qset: _*))
      .groupBy("doc_id")
      .agg(round(KeywordSearch.fixedPointSum6(col("imp")), 4).as("score"))
      .orderBy(desc("score"), asc("doc_id"))
      .limit(fbK)
    val wterms = expansionWeightsFrom(docs, fb, qset, e, lambda)
    champs.join(broadcast(wterms), Seq("term"))
      .select(col("doc_id"), col("term"), (col("weight") * col("imp")).as("c"))
      .groupBy("doc_id")
      .agg(collect_list(struct(col("term"), col("c"))).as("cs"))
      .select(col("doc_id"), round(orderedSum(col("cs"), "c"), 4).as("score"))
      .orderBy(desc("score"), asc("doc_id"))
      .limit(k)
  }

  /** Driver query: champion-pruned RM3 over the standing artifact. */
  def qSearchPruned(s: SparkSession, dir: String): DataFrame =
    expandedSearchPruned(Tables.documents(s, dir),
      ChampionIndex.cachedChampions(s, dir))

  // --- refreshed RM3 ---------------------------------------------------------

  /** RM3 with both rounds probing the INCREMENTALLY-REFRESHED index
    * ([[IndexRefresh]]) — completing the keyword family on the refresh
    * path (BM25 13i, Dirichlet QL 13j, RM3 here): round 1's feedback
    * comes from the query terms' refreshed champion rows scored with
    * probe-time idf ([[IndexRefresh.requestScored]]), the expansion
    * mining is unchanged (it tokenizes only the F feedback docs of the
    * CURRENT snapshot), and the second round sums
    * `weight(t) · contrib(t, d)` over the weighted terms' refreshed
    * champion rows ([[IndexRefresh.requestContribs]]). The ≤(|q|+E)-row
    * weighted query collects to the driver so both probes stay
    * term-bucket partition-pruned (the bounded-literal convention of
    * [[IndexRefresh.search]]). Same cost bound as the champion form —
    * (|q|+E)·M rows per query, corpus-size-independent — with zero
    * score staleness after every refresh.
    */
  def expandedSearchRefreshed(spark: SparkSession, path: String,
                              docs: DataFrame,
                              terms: Seq[String] = KeywordSearch.QueryTerms,
                              fbK: Int = FeedbackK, e: Int = ExpandE,
                              lambda: Double = Lambda, k: Int = TopK,
                              asOf: Option[Int] = None): DataFrame = {
    val qset = terms.distinct.sorted
    val fb = IndexRefresh.requestScored(spark, path, qset, asOf)
      .select(col("doc_id"), round(col("raw_score"), 4).as("score"))
      .orderBy(desc("score"), asc("doc_id"))
      .limit(fbK)
    val wterms = expansionWeightsFrom(docs, fb, qset, e, lambda)
    val wpairs = wterms.collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    val s = docs.sparkSession
    import s.implicits._
    IndexRefresh.requestContribs(spark, path, wpairs.map(_._1), asOf)
      .join(broadcast(wpairs.toDF("term", "weight")), Seq("term"))
      .select(col("doc_id"), col("term"), (col("weight") * col("contrib")).as("c"))
      .groupBy("doc_id")
      .agg(collect_list(struct(col("term"), col("c"))).as("cs"))
      .select(col("doc_id"), round(orderedSum(col("cs"), "c"), 4).as("score"))
      .orderBy(desc("score"), asc("doc_id"))
      .limit(k)
  }

  /** Driver query: refreshed RM3 over the refreshed standing artifact
    * (current-snapshot universe, the refresh-family convention).
    */
  def qSearchRefreshed(s: SparkSession, dir: String): DataFrame =
    expandedSearchRefreshed(s, IndexRefresh.refreshedArtifact(s, dir),
      CorpusOps.currSnapshot(Tables.documents(s, dir)))

  /** Driver query: refreshed RM3 TIME-TRAVELED (as-of segment 0) —
    * both probe rounds pinned, feedback docs mined from the pinned
    * corpus state; with this every keyword scorer (BM25 13l, QL, RM3)
    * reads at any commit. Oracle: the refreshed-RM3 chain on the
    * PREVIOUS snapshot.
    */
  def qSearchAsOf(s: SparkSession, dir: String): DataFrame =
    expandedSearchRefreshed(s, IndexRefresh.refreshedArtifact(s, dir),
      CorpusOps.prevSnapshot(Tables.documents(s, dir)), asOf = Some(0))

  /** Oracle for the refreshed form: full rebuild of the tf-cut champion
    * index over the current snapshot, probe-time-idf round 1, the same
    * expansion mining, weighted probe-time contributions in term order.
    */
  def expandedSearchRefreshedSql(terms: Seq[String] = KeywordSearch.QueryTerms,
                                 fbK: Int = FeedbackK, e: Int = ExpandE,
                                 lambda: Double = Lambda, k: Int = TopK,
                                 m: Int = IndexRefresh.M,
                                 prevSnapshot: Boolean = false): String = {
    val qset = terms.distinct.sorted
    val qList = qset.map(t => s"'$t'").mkString(", ")
    val origVals = qset.map(t => s"('$t', ${lambda / qset.size})").mkString(", ")
    import KeywordSearch.{B, K1}
    s"""WITH ${if (prevSnapshot) IndexRefresh.prevCte else IndexRefresh.currCte},
       |toked AS (
       |  SELECT doc_id, unnest(${TextAnalysis.sqlToks}) AS term FROM curr),
       |postings AS (
       |  SELECT term, doc_id, count(*) AS tf FROM toked GROUP BY 1, 2),
       |docstats AS (
       |  SELECT doc_id, CAST(len(${TextAnalysis.sqlToks}) AS DOUBLE) AS dl
       |  FROM curr),
       |stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM docstats),
       |dict AS (SELECT term, count(*) AS df FROM postings GROUP BY 1),
       |champs AS (
       |  SELECT term, doc_id, tf, dl FROM (
       |    SELECT p.term, p.doc_id, p.tf, d.dl,
       |      row_number() OVER (PARTITION BY p.term
       |        ORDER BY p.tf DESC, d.dl ASC, p.doc_id ASC) AS crn
       |    FROM postings p JOIN docstats d USING (doc_id))
       |  WHERE crn <= $m),
       |contribs AS (
       |  SELECT c.term, c.doc_id,
       |    round(ln(1 + (CAST(n_docs AS DOUBLE) - CAST(dict.df AS DOUBLE) + 0.5) / (CAST(dict.df AS DOUBLE) + 0.5))
       |      * (CAST(tf AS DOUBLE) * ${K1 + 1})
       |      / (CAST(tf AS DOUBLE) + $K1 * (1 - $B + $B * dl / avgdl)), 6) AS contrib
       |  FROM champs c JOIN dict USING (term), stats),
       |fb AS (
       |  SELECT doc_id, round(${KeywordSearch.fixedPointSum6Sql("contrib")}, 4) AS score
       |  FROM contribs WHERE term IN ($qList)
       |  GROUP BY doc_id
       |  ORDER BY score DESC, doc_id
       |  LIMIT $fbK),
       |fbtok AS (
       |  SELECT f.doc_id, f.score,
       |    CAST(len(${TextAnalysis.sqlToks}) AS DOUBLE) AS fdl,
       |    unnest(${TextAnalysis.sqlToks}) AS term
       |  FROM fb f JOIN curr ON f.doc_id = curr.doc_id),
       |fbtf AS (
       |  SELECT term, doc_id,
       |    CAST(count(*) AS DOUBLE) * any_value(score) / any_value(fdl) AS c
       |  FROM fbtok WHERE term NOT IN ($qList)
       |  GROUP BY term, doc_id),
       |w AS (
       |  SELECT term, round(sum(c ORDER BY doc_id), 6) AS w
       |  FROM fbtf GROUP BY term),
       |expd AS (SELECT term, w FROM w ORDER BY w DESC, term LIMIT $e),
       |tot AS (SELECT sum(w ORDER BY term) AS tot FROM expd),
       |wterms AS (
       |  SELECT term, weight FROM (VALUES $origVals) AS t(term, weight)
       |  UNION ALL
       |  SELECT term, ${1 - lambda} * w / tot FROM expd, tot),
       |weighted AS (
       |  SELECT c.doc_id, c.term, wt.weight * c.contrib AS c
       |  FROM contribs c JOIN wterms wt USING (term))
       |SELECT doc_id, round(sum(c ORDER BY term), 4) AS score
       |FROM weighted
       |GROUP BY doc_id
       |ORDER BY score DESC, doc_id
       |LIMIT $k""".stripMargin
  }

  val searchRefreshedOracle: String = expandedSearchRefreshedSql()
  val searchAsOfOracle: String = expandedSearchRefreshedSql(prevSnapshot = true)

  /** Oracle for the pruned form: DuckDB re-derives the champion index
    * from the raw corpus ([[ChampionIndex.championChampsSqlCtes]] — the
    * standing-index convention), replays the champion round 1, re-mines
    * the expansion from the feedback docs' text, and sums the weighted
    * champion impacts in term order.
    */
  def expandedSearchPrunedSql(terms: Seq[String] = KeywordSearch.QueryTerms,
                              fbK: Int = FeedbackK, e: Int = ExpandE,
                              lambda: Double = Lambda, k: Int = TopK,
                              m: Int = ChampionIndex.M): String = {
    val qset = terms.distinct.sorted
    val qList = qset.map(t => s"'$t'").mkString(", ")
    val origVals = qset.map(t => s"('$t', ${lambda / qset.size})").mkString(", ")
    s"""WITH ${ChampionIndex.championChampsSqlCtes(m)},
       |fb AS (
       |  SELECT doc_id, round(${KeywordSearch.fixedPointSum6Sql("imp")}, 4) AS score
       |  FROM champs WHERE term IN ($qList)
       |  GROUP BY doc_id
       |  ORDER BY score DESC, doc_id
       |  LIMIT $fbK),
       |fbtok AS (
       |  SELECT f.doc_id, f.score,
       |    CAST(len(${TextAnalysis.sqlToks}) AS DOUBLE) AS fdl,
       |    unnest(${TextAnalysis.sqlToks}) AS term
       |  FROM fb f JOIN documents ON f.doc_id = documents.doc_id),
       |fbtf AS (
       |  SELECT term, doc_id,
       |    CAST(count(*) AS DOUBLE) * any_value(score) / any_value(fdl) AS c
       |  FROM fbtok WHERE term NOT IN ($qList)
       |  GROUP BY term, doc_id),
       |w AS (
       |  SELECT term, round(sum(c ORDER BY doc_id), 6) AS w
       |  FROM fbtf GROUP BY term),
       |expd AS (SELECT term, w FROM w ORDER BY w DESC, term LIMIT $e),
       |tot AS (SELECT sum(w ORDER BY term) AS tot FROM expd),
       |wterms AS (
       |  SELECT term, weight FROM (VALUES $origVals) AS t(term, weight)
       |  UNION ALL
       |  SELECT term, ${1 - lambda} * w / tot FROM expd, tot),
       |contrib AS (
       |  SELECT c.doc_id, c.term, wt.weight * c.imp AS c
       |  FROM champs c JOIN wterms wt USING (term))
       |SELECT doc_id, round(sum(c ORDER BY term), 4) AS score
       |FROM contrib
       |GROUP BY doc_id
       |ORDER BY score DESC, doc_id
       |LIMIT $k""".stripMargin
  }

  val searchPrunedOracle: String = expandedSearchPrunedSql()

  def qSearch(s: SparkSession, dir: String): DataFrame =
    expandedSearch(Tables.documents(s, dir))

  /** Fully corpus-derived oracle: DuckDB re-runs round 1, re-MINES the
    * expansion terms and weights, and replays the weighted second round
    * — nothing but the query literals comes from the engine.
    */
  def expandedSearchSql(terms: Seq[String] = KeywordSearch.QueryTerms,
                        fbK: Int = FeedbackK, e: Int = ExpandE,
                        lambda: Double = Lambda, k: Int = TopK): String = {
    val qset = terms.distinct.sorted
    val qList = qset.map(t => s"'$t'").mkString(", ")
    val origVals = qset.map(t => s"('$t', ${lambda / qset.size})").mkString(", ")
    s"""WITH fb AS (${KeywordSearch.bm25Sql(terms, fbK)}),
       |fbtok AS (
       |  SELECT f.doc_id, f.score,
       |    CAST(len(${TextAnalysis.sqlToks}) AS DOUBLE) AS dl,
       |    unnest(${TextAnalysis.sqlToks}) AS term
       |  FROM fb f JOIN documents ON f.doc_id = documents.doc_id),
       |fbtf AS (
       |  SELECT term, doc_id,
       |    CAST(count(*) AS DOUBLE) * any_value(score) / any_value(dl) AS c
       |  FROM fbtok WHERE term NOT IN ($qList)
       |  GROUP BY term, doc_id),
       |w AS (
       |  SELECT term, round(sum(c ORDER BY doc_id), 6) AS w
       |  FROM fbtf GROUP BY term),
       |expd AS (SELECT term, w FROM w ORDER BY w DESC, term LIMIT $e),
       |tot AS (SELECT sum(w ORDER BY term) AS tot FROM expd),
       |wterms AS (
       |  SELECT term, weight FROM (VALUES $origVals) AS t(term, weight)
       |  UNION ALL
       |  SELECT term, ${1 - lambda} * w / tot FROM expd, tot),
       |toked2 AS (
       |  SELECT doc_id, ${TextAnalysis.sqlToks} AS toks FROM documents),
       |base2 AS (
       |  SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl, toks
       |  FROM toked2 WHERE len(toks) > 0),
       |cstats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM base2),
       |dtf AS (
       |  SELECT b.doc_id, w.term, w.weight, b.dl,
       |    CAST(len(list_filter(b.toks, t -> t = w.term)) AS DOUBLE) AS tf
       |  FROM base2 b, wterms w),
       |matched AS (SELECT * FROM dtf WHERE tf > 0),
       |dfs AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM matched GROUP BY term),
       |contrib AS (
       |  SELECT m.doc_id, m.term,
       |    m.weight
       |      * ln(1.0 + (CAST(n_docs AS DOUBLE) - df + 0.5) / (df + 0.5))
       |      * (m.tf * ${K1 + 1})
       |      / (m.tf + $K1 * (${1 - B} + $B * m.dl / avgdl)) AS c
       |  FROM matched m JOIN dfs USING (term), cstats)
       |SELECT doc_id, round(sum(c ORDER BY term), 4) AS score
       |FROM contrib
       |GROUP BY doc_id
       |ORDER BY score DESC, doc_id
       |LIMIT $k""".stripMargin
  }

  val searchOracle: String = expandedSearchSql()
}
