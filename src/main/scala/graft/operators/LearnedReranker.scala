package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A REAL learned model in the cross-encoder slot — the trained
  * counterpart of [[Reranker]]'s deterministic lexical stand-in
  * (reference `src/reranker.py:27` `_cross_encoder_score`: a neural
  * cross-encoder scoring (query, document) pairs). Here the model is an
  * MLlib logistic regression trained ON THE CORPUS: pairs of (query
  * doc, candidate doc) are labeled by embedding-cluster agreement
  * (label(q)==label(d) — the same golden signal the retrieval eval
  * uses), featurized with the lexical pair features a cross-encoder
  * consumes (distinct-term overlap, matched-token count, candidate
  * length), and the fitted coefficients serve through the
  * [[Inference.scorePairsBatched]] seam exactly like ONNX cross-encoder
  * weights would: init once per partition, bounded pair micro-batches,
  * positional re-attach.
  *
  * Oracle contract: ranking uses the LINEAR score (monotone in the
  * sigmoid, so ordering-equivalent) computed in a FIXED expression
  * order over integer-valued features — bitwise reproducible in DuckDB
  * with the trained coefficients embedded as exact double literals (the
  * [[ProductQuantizer]] / [[Word2VecEmbedder]] pattern).
  *
  * Scale: training pairs are query-stride × embedded-universe (bounded
  * by the golden-query design); serving scores k retrieved candidates
  * per query — never the corpus.
  */
object LearnedReranker {
  val CandidateK = 20
  val TopK = 10
  val MaxBatch = 32

  /** (intercept, w_overlap, w_matched, w_dl) */
  type Weights = (Double, Double, Double, Double)

  private val cache = new java.util.concurrent.ConcurrentHashMap[String, Weights]()
  @volatile private var lastDir: Option[String] = None

  /** Pure-JVM tokenizer replica (see [[Word2VecEmbedder]]). */
  private def tokenize(text: String): Seq[String] =
    text.toLowerCase.split("[^a-z0-9]+").toSeq.filter(_.nonEmpty)

  /** The three pair features, integer-valued by construction:
    * distinct query terms present in the doc, doc tokens matching a
    * query term, doc length.
    */
  private def features(queryToks: Seq[String], docToks: Seq[String]): (Long, Long, Long) = {
    val qset = queryToks.toSet
    (qset.count(docToks.toSet.contains).toLong,
      docToks.count(qset.contains).toLong,
      docToks.length.toLong)
  }

  /** The ONE copy of the scoring arithmetic (fixed evaluation order —
    * the oracle replays it verbatim).
    */
  private def linearScore(w: Weights, f: (Long, Long, Long)): Double =
    w._1 + w._2 * f._1 + w._3 * f._2 + w._4 * f._3

  /** SCALE NOTE: training materializes a |corpus|×|queries| pair frame
    * (the broadcast inequality-join below) with per-pair UDF
    * featurization — bounded HERE because the query side is a strided
    * 1/[[KeywordSearch.BatchStride]] sample of the corpus, and MLlib's
    * Vector column forces a UDF regardless. At real corpus scale the
    * pair frame must come from negative SAMPLING instead (per query:
    * its positives + k sampled negatives — |Q|·(1+k) rows, not
    * |Q|·|corpus|); the scoring/serving path is unaffected (it only
    * ever sees candidate pairs).
    */
  private def train(s: SparkSession, dir: String): Weights = {
    import org.apache.spark.ml.classification.LogisticRegression
    import org.apache.spark.ml.functions.array_to_vector
    val docs = Tables.documents(s, dir)
    val embs = Tables.embeddings(s, dir)
    val labeled = docs.join(
      embs.select(col("vec_id").as("doc_id"), col("label")), Seq("doc_id"))
      .select(col("doc_id"), col("text"), col("label"))
    val queries = labeled.filter(col("doc_id") % KeywordSearch.BatchStride === 0)
      .select(col("doc_id").as("q_id"), col("text").as("q_text"), col("label").as("q_label"))
    val toksUdf = udf((t: String) => tokenize(t))
    val featUdf = udf((q: Seq[String], d: Seq[String]) => {
      val f = features(q, d); Array(f._1.toDouble, f._2.toDouble, f._3.toDouble)
    })
    val pairs = labeled.join(broadcast(queries), col("doc_id") =!= col("q_id"))
      .select(
        featUdf(toksUdf(col("q_text")), toksUdf(col("text"))).as("f"),
        (col("label") === col("q_label")).cast("double").as("y"))
    val lr = new LogisticRegression()
      .setFeaturesCol("features").setLabelCol("y").setMaxIter(50).setRegParam(0.01)
    val model = lr.fit(pairs.select(array_to_vector(col("f")).as("features"), col("y")))
    val c = model.coefficients.toArray
    (model.intercept, c(0), c(1), c(2))
  }

  private[graft] def weightsFor(s: SparkSession, dir: String): Weights = {
    val w = cache.computeIfAbsent(dir, train(s, _))
    lastDir = Some(dir)
    w
  }

  /** Score (query, doc-text) pair columns through the inference seam
    * with the trained coefficients — the served-cross-encoder shape.
    */
  def scorePairs(pairs: DataFrame, w: Weights): DataFrame =
    Inference.scorePairsBatched(pairs, "query", "text", "ce_score", MaxBatch)(
      () => w)((wt, ps) => ps.map { case (q, d) =>
        linearScore(wt, features(tokenize(q), tokenize(d)))
      })

  /** Driver query: BM25 top-[[CandidateK]] candidates rescored by the
    * TRAINED cross-scorer, top-[[TopK]] by learned score.
    */
  def qSearch(s: SparkSession, dir: String): DataFrame = {
    val w = weightsFor(s, dir)
    val docs = Tables.documents(s, dir)
    val cand = KeywordSearch.bm25(docs, KeywordSearch.QueryTerms, CandidateK)
      .select(col("doc_id"), col("score").as("bm25_score"))
      .join(docs.select(col("doc_id"), col("text")), Seq("doc_id"))
      .withColumn("query", lit(KeywordSearch.QueryTerms.mkString(" ")))
    scorePairs(cand, w)
      .select(col("doc_id"), col("bm25_score"),
        round(col("ce_score"), 6).as("ce_score"))
      .orderBy(desc("ce_score"), asc("doc_id"))
      .limit(TopK)
  }

  private val emptyOracle =
    "SELECT reranker_model_not_trained_or_ambiguous FROM documents"

  def searchOracle: String = {
    // keyed off lastDir directly (the Word2VecEmbedder convention).
    // CONTRACT this leans on: the driver (Verify) runs every query for
    // ONE dir and then collects oracles for that same dir — lastDir is
    // the dir the oracle's query ran against. A hypothetical driver that
    // batched oracle collection AFTER querying several dirs would embed
    // the last dir's coefficients; if that contract ever changes, key
    // the oracle request by dir explicitly instead.
    val model = lastDir.flatMap(d => Option(cache.get(d)))
    model.fold(emptyOracle) { w =>
      val terms = KeywordSearch.QueryTerms
      val termList = terms.map(t => s"'$t'").mkString("[", ", ", "]")
      s"""WITH cand AS (${KeywordSearch.bm25Sql(terms, CandidateK)}),
         |feats AS (
         |  SELECT cand.doc_id, cand.score AS bm25_score,
         |    CAST(len(list_filter($termList,
         |      t -> list_contains(${TextAnalysis.sqlToks}, t))) AS DOUBLE) AS f1,
         |    CAST(len(list_filter(${TextAnalysis.sqlToks},
         |      t -> list_contains($termList, t))) AS DOUBLE) AS f2,
         |    CAST(len(${TextAnalysis.sqlToks}) AS DOUBLE) AS f3
         |  FROM cand JOIN documents ON cand.doc_id = documents.doc_id)
         |SELECT doc_id, bm25_score,
         |  round(${w._1} + ${w._2} * f1 + ${w._3} * f2 + ${w._4} * f3, 6) AS ce_score
         |FROM feats
         |ORDER BY ce_score DESC, doc_id
         |LIMIT $TopK""".stripMargin
    }
  }
}
