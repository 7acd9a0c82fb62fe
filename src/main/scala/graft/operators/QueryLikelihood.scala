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
    * (`tf_i`/`p_i`/`dl`) — the SQL twin renders the same chain with the
    * same mu.
    */
  private def qlScoreCol(terms: Seq[String], mu: Double): Column =
    terms.indices.map { i =>
      log((col(s"tf_$i").cast("double") + lit(mu) * col(s"p_$i")) /
        (col("dl").cast("double") + lit(mu)))
    }.reduce(_ + _)

  def search(docs: DataFrame, terms: Seq[String] = KeywordSearch.QueryTerms,
             k: Int = TopK, mu: Double = Mu): DataFrame = {
    val base = KeywordSearch.termStats(docs, terms)
    val aggCols = sum(col("dl")).as("c_total") +:
      terms.indices.map(i => sum(col(s"tf_$i")).as(s"ctf_$i"))
    val stats = base.agg(aggCols.head, aggCols.tail: _*)
      .select(terms.indices.map(i =>
        (col(s"ctf_$i").cast("double") / col("c_total").cast("double")).as(s"p_$i")): _*)
    base.join(broadcast(stats))
      .select(col("doc_id"), col("source"), col("lang"),
        round(qlScoreCol(terms, mu), 4).as("score"))
      .orderBy(desc("score"), asc("doc_id"))
      .limit(k)
  }

  def searchSql(terms: Seq[String] = KeywordSearch.QueryTerms,
                k: Int = TopK, mu: Double = Mu): String = {
    val tfs = terms.zipWithIndex.map { case (t, i) =>
      s"len(list_filter(toks, t -> t = '$t')) AS tf_$i"
    }.mkString(",\n    ")
    val ctfs = terms.indices.map(i => s"sum(tf_$i) AS ctf_$i").mkString(", ")
    val ps = terms.indices.map(i =>
      s"CAST(ctf_$i AS DOUBLE) / CAST(c_total AS DOUBLE) AS p_$i").mkString(", ")
    val scores = terms.indices.map { i =>
      s"ln((CAST(tf_$i AS DOUBLE) + $mu * p_$i) / (dl + $mu))"
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

  // --- batch (multi-query) Dirichlet QL ------------------------------------

  /** BATCH Dirichlet-QL ranking — serving parity with batch BM25
    * ([[KeywordSearch.bm25Batch]], op 13c) for the LM scoring family,
    * over the same golden queries (rarest-token assembly off the
    * standing postings artifact, self-excluded). Unlike BM25 the LM
    * score is DENSE — every document scores against every query, absent
    * terms contributing the smoothed background mass — so a naive batch
    * form is |Q|×|corpus|. The plan uses the standard decomposition
    *
    *   score(q,d) = corr(q,d) + qconst(q) − |q|·ln(dl(d) + μ)
    *   corr(q,d)  = Σ_{t∈q: tf>0} [ln(tf + μP(t|C)) − ln(μP(t|C))] ≥ 0
    *   qconst(q)  = Σ_{t∈q} ln(μ·P(t|C))
    *
    * where corr is SPARSE (postings matches only) and the unmatched
    * part orders every query's non-matching docs identically
    * (ascending dl, doc_id tiebreak — exactly the heap's order, since
    * ln is strictly monotone). Hence each query's true top-k is
    * contained in {its postings matches} ∪ {the k+1 globally shortest
    * documents} (+1 covers self-exclusion) — the ranking is EXACT, no
    * approximation, and per-query cost is the batch-BM25 postings-probe
    * bound plus one tiny dl-heap shared by ALL queries. Collection
    * stats (|C|, per-query-term ctf) are one broadcast; the vocabulary
    * is never materialized.
    *
    * Determinism: corr and qconst accumulate in term order
    * (struct-sorted fold ≡ `sum(x ORDER BY term)`); the score is the
    * fixed chain `corr + qconst − nq·ln(dl+μ)`; rounding once at the
    * output edge, the [[KeywordSearch.rankKwScored]] tail.
    */
  private[graft] def qlBatch(docs: DataFrame, postings: DataFrame,
                             stride: Int = KeywordSearch.BatchStride,
                             nTerms: Int = KeywordSearch.BatchTerms,
                             k: Int = KeywordSearch.BatchK,
                             mu: Double = Mu): DataFrame = {
    val sel: DataFrame => DataFrame = _.filter(col("doc_id") % stride === 0)
    val qtoks = KeywordSearch.batchQueryTokens(postings, docs, sel)
    val qdict = KeywordSearch.batchQueryDict(postings, qtoks)
    val qterms = KeywordSearch.batchQueryTermsFrom(qtoks, qdict, nTerms)
    // collection LM: P(t|C) = ctf(t)/|C|, computed for query terms only
    val totals = postings.agg(sum("tf").as("c_total"))
    val ctf = postings
      .join(broadcast(qterms.select("term").distinct()), Seq("term"))
      .groupBy("term").agg(sum("tf").as("ctf"))
    val qp = qterms.join(broadcast(ctf), Seq("term")).join(broadcast(totals))
      .select(col("q_id"), col("term"),
        (col("ctf").cast("double") / col("c_total").cast("double")).as("p"))
    val qconsts = qp
      .groupBy("q_id")
      .agg(collect_list(struct(col("term"),
        log(lit(mu) * col("p")).as("lp"))).as("ls"))
      .select(col("q_id"),
        aggregate(transform(array_sort(col("ls")), x => x.getField("lp")),
          lit(0.0), (a, x) => a + x).as("qconst"),
        size(col("ls")).as("nq"))
    val dls = postings.groupBy("doc_id").agg(first("dl").as("dl"))
    // sparse corrections over postings matches — the batch-BM25 probe shape
    val corr = postings.join(broadcast(qp), Seq("term"))
      .select(col("q_id"), col("doc_id"),
        struct(col("term"),
          (log(col("tf").cast("double") + lit(mu) * col("p")) -
            log(lit(mu) * col("p"))).as("c")).as("tc"))
      .groupBy("q_id", "doc_id")
      .agg(collect_list(col("tc")).as("cs"))
      .select(col("q_id"), col("doc_id"),
        aggregate(transform(array_sort(col("cs")), x => x.getField("c")),
          lit(0.0), (a, x) => a + x).as("corr"))
    // the k+1 globally shortest docs: the only docs that can enter a
    // top-k WITHOUT matching a query term
    val shortest = dls.orderBy(asc("dl"), asc("doc_id")).limit(k + 1)
      .select("doc_id")
    val cand = corr
      .unionByName(qconsts.select("q_id").crossJoin(broadcast(shortest))
        .withColumn("corr", lit(0.0)))
      .groupBy("q_id", "doc_id").agg(max("corr").as("corr"))
    val scored = cand
      .filter(col("doc_id") =!= col("q_id"))
      .join(dls, Seq("doc_id"))
      .join(broadcast(qconsts), Seq("q_id"))
      .select(col("q_id"), col("doc_id"),
        (col("corr") + col("qconst") -
          col("nq").cast("double") * log(col("dl") + lit(mu))).as("raw_score"))
    KeywordSearch.rankKwScored(scored, k)
  }

  /** Driver query: batch QL over the standing postings artifact. */
  def qBatchSearch(s: SparkSession, dir: String): DataFrame =
    qlBatch(Tables.documents(s, dir),
      KeywordSearch.cachedBatchPostings(s, dir))

  def qlBatchSql(stride: Int = KeywordSearch.BatchStride,
                 nTerms: Int = KeywordSearch.BatchTerms,
                 k: Int = KeywordSearch.BatchK, mu: Double = Mu): String =
    s"""WITH toked AS (
       |  SELECT doc_id, unnest(${TextAnalysis.sqlToks}) AS term FROM documents),
       |postings AS (
       |  SELECT doc_id, term, count(*) AS tf FROM toked GROUP BY 1, 2),
       |dl AS (SELECT doc_id, CAST(sum(tf) AS DOUBLE) AS dl FROM postings GROUP BY 1),
       |dict AS (SELECT term, count(*) AS df FROM postings GROUP BY 1),
       |qtoks AS (
       |  SELECT doc_id AS q_id, unnest(list_distinct(${TextAnalysis.sqlToks})) AS term
       |  FROM documents WHERE doc_id % $stride = 0),
       |qterms AS (
       |  SELECT q_id, substring(p, 12, 1000) AS term
       |  FROM (
       |    SELECT q_id, unnest(
       |      (list_sort(list(lpad(CAST(df AS VARCHAR), 10, '0') || '#' || term)))[1:$nTerms]) AS p
       |    FROM qtoks JOIN dict USING (term)
       |    GROUP BY q_id)),
       |totals AS (SELECT sum(tf) AS c_total FROM postings),
       |ctf AS (
       |  SELECT term, sum(tf) AS ctf FROM postings
       |  WHERE term IN (SELECT DISTINCT term FROM qterms)
       |  GROUP BY term),
       |qp AS (
       |  SELECT q_id, qterms.term,
       |    CAST(ctf AS DOUBLE) / CAST(c_total AS DOUBLE) AS p
       |  FROM qterms JOIN ctf USING (term), totals),
       |qconsts AS (
       |  SELECT q_id, sum(ln($mu * p) ORDER BY term) AS qconst,
       |    count(*) AS nq
       |  FROM qp GROUP BY q_id),
       |corr AS (
       |  SELECT qp.q_id, po.doc_id,
       |    sum(ln(CAST(po.tf AS DOUBLE) + $mu * qp.p) - ln($mu * qp.p)
       |        ORDER BY qp.term) AS corr
       |  FROM postings po JOIN qp ON po.term = qp.term
       |  GROUP BY 1, 2),
       |shortest AS (SELECT doc_id FROM dl ORDER BY dl, doc_id LIMIT ${k + 1}),
       |cand AS (
       |  SELECT q_id, doc_id, max(corr) AS corr FROM (
       |    SELECT q_id, doc_id, corr FROM corr
       |    UNION ALL
       |    SELECT q.q_id, s.doc_id, 0.0 AS corr
       |    FROM (SELECT q_id FROM qconsts) q, shortest s)
       |  GROUP BY 1, 2),
       |scored AS (
       |  SELECT c.q_id, c.doc_id,
       |    c.corr + qc.qconst - CAST(qc.nq AS DOUBLE) * ln(dl.dl + $mu) AS raw_score
       |  FROM cand c
       |  JOIN dl USING (doc_id)
       |  JOIN qconsts qc USING (q_id)
       |  WHERE c.doc_id <> c.q_id),
       |ranked AS (
       |  SELECT q_id, doc_id, raw_score,
       |    row_number() OVER (PARTITION BY q_id ORDER BY raw_score DESC, doc_id) AS rn
       |  FROM scored
       |  QUALIFY rn <= $k)
       |SELECT q_id, rn, doc_id, round(raw_score, 4) AS score
       |FROM ranked
       |ORDER BY q_id, rn""".stripMargin

  val qBatchSearchOracle: String = qlBatchSql()
}
