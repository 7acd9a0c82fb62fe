package graft.operators

import graft.functions.TextFunctions._
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A TRAINED document-quality classifier — the learned counterpart of
  * [[TextAnalysis.quality]]'s heuristic rules, mirroring the canonical
  * LLM-corpus recipe (GPT-3 / CCNet / LLaMA quality filtering): fit a
  * linear classifier that separates a high-quality reference domain
  * from the raw crawl, score EVERY document, and band the corpus into
  * head/middle/tail score terciles (CCNet's keep-the-head split).
  * The reference domain here is the corpus's `src0`
  * source — the same golden signal [[CorpusOps.importanceSample]]
  * (DSIR) targets, so the two operators are the classifier-based and
  * importance-weighting-based arms of the same data-selection story.
  *
  * Model: MLlib logistic regression over four integer-valued features
  * (token count, distinct-token count, char length, stopword hits) —
  * integer by construction so the serving arithmetic replays bitwise in
  * DuckDB with the trained coefficients embedded as exact double
  * literals (the [[LearnedReranker]] / [[ProductQuantizer]] pattern).
  * Ranking/keeping uses the LINEAR score (monotone in the sigmoid).
  *
  * Scale shape: training is one featurize pass + LBFGS over
  * vector-assembled rows (at 100 TB you'd train on a [[TextAnalysis
  * .sample]] hash-bucket — the fit composes); serving is a PURE LINEAR
  * SCAN — four codegen'd column expressions and a fused multiply-add,
  * no shuffle, no UDF, exactly what a 1000-executor filter pass needs.
  */
object QualityClassifier {

  /** Fixed stopword probe list (function-word density is the classic
    * "real prose vs boilerplate" signal — Gopher rules use the same).
    */
  val Stopwords = Seq("the", "a", "of", "to", "and", "in", "is", "for", "on", "with")

  val ReferenceSource = "src0"

  /** (intercept, w_ntok, w_ndistinct, w_nchar, w_nstop) */
  type Weights = (Double, Double, Double, Double, Double)

  private val cache = new java.util.concurrent.ConcurrentHashMap[String, Weights]()
  @volatile private var lastDir: Option[String] = None

  /** The four features as codegen column expressions over an already-
    * materialized token array — the ONE definition serving and training
    * share. Callers tokenize ONCE behind an explode(array(..)) Generate
    * barrier (the [[KeywordSearch]] termStats lesson): without it
    * CollapseProject inlines the regex tokenizer into each of the three
    * token-derived features and the scan runs it 3× per row (measured
    * 43 s → one-pass at the 100× replicated scale).
    */
  private def featureCols(text: Column, toks: Column): Seq[Column] = {
    val stopArr = array(Stopwords.map(lit): _*)
    Seq(
      size(toks).cast("double"),
      size(array_distinct(toks)).cast("double"),
      length(text).cast("double"),
      size(filter(toks, t => array_contains(stopArr, t))).cast("double"))
  }

  /** (doc_id, source, text, toks) with the tokenizer run exactly once. */
  private def tokenized(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("source"), col("text"),
      explode(array(tokens(col("text")))).as("toks"))

  private def train(s: SparkSession, dir: String): Weights =
    trainOn(Tables.documents(s, dir))

  private[graft] def trainOn(docs: DataFrame): Weights = {
    import org.apache.spark.ml.classification.LogisticRegression
    import org.apache.spark.ml.functions.array_to_vector
    val feats = tokenized(docs).select(
      array(featureCols(col("text"), col("toks")): _*).as("f"),
      (col("source") === ReferenceSource).cast("double").as("y"))
    val lr = new LogisticRegression()
      .setFeaturesCol("features").setLabelCol("y").setMaxIter(50).setRegParam(0.01)
    val model = lr.fit(feats.select(array_to_vector(col("f")).as("features"), col("y")))
    val c = model.coefficients.toArray
    (model.intercept, c(0), c(1), c(2), c(3))
  }

  private[graft] def weightsFor(s: SparkSession, dir: String): Weights = {
    val w = cache.computeIfAbsent(dir, train(s, _))
    lastDir = Some(dir)
    w
  }

  /** Score every document with the trained linear model — serving is a
    * shuffle-free scan of four codegen expressions.
    */
  def score(docs: DataFrame, w: Weights): DataFrame = {
    val Seq(f1, f2, f3, f4) = featureCols(col("text"), col("toks"))
    val lin = lit(w._1) + lit(w._2) * f1 + lit(w._3) * f2 + lit(w._4) * f3 + lit(w._5) * f4
    tokenized(docs).select(col("doc_id"), col("source"), round(lin, 6).as("q_score"))
  }

  /** Tercile thresholds of the score distribution — CCNet's
    * head/middle/tail banding. `approx_percentile` is the mergeable
    * t-digest sketch (map-side partial, no sort), the 100 TB path; the
    * two scalars are a bounded driver probe folded into the oracle as
    * literals.
    */
  private[graft] def terciles(scored: DataFrame): (Double, Double) = {
    val r = scored.select(
      percentile_approx(col("q_score"), array(lit(1.0 / 3), lit(2.0 / 3)), lit(10000)))
      .head().getSeq[Double](0)
    (r(0), r(1))
  }

  private[graft] def band(score: Column, t: (Double, Double)): Column =
    when(score >= t._2, "head").when(score >= t._1, "middle").otherwise("tail")

  private val bandCache = new java.util.concurrent.ConcurrentHashMap[String, (Weights, (Double, Double))]()

  /** Driver query: the full CCNet-style pipeline — train the domain
    * classifier, score the corpus, band into head/middle/tail terciles
    * (downstream keeps head+middle; the band column IS the filter).
    */
  def qScore(s: SparkSession, dir: String): DataFrame = {
    val (w, t) = bandCache.computeIfAbsent(dir, { d =>
      val wt = weightsFor(s, d)
      (wt, terciles(score(Tables.documents(s, d), wt)))
    })
    score(Tables.documents(s, dir), w)
      .withColumn("band", band(col("q_score"), t))
      .orderBy("doc_id")
  }

  private val emptyOracle =
    "SELECT quality_model_not_trained_or_ambiguous FROM documents"

  /** Per-dir literal-coefficients oracle (dumped after the query runs —
    * SURVEY §6; ambiguous/unpopulated cache fails loudly).
    */
  def scoreOracle: String = {
    val model =
      if (bandCache.size() > 1) None
      else lastDir.flatMap(d => Option(bandCache.get(d)))
    model.fold(emptyOracle) { case (w, t) =>
      val stopList = Stopwords.map(t => s"'$t'").mkString("[", ", ", "]")
      val toks = TextAnalysis.sqlToks
      s"""WITH feats AS (
         |  SELECT doc_id, source,
         |    CAST(len($toks) AS DOUBLE) AS f1,
         |    CAST(len(list_distinct($toks)) AS DOUBLE) AS f2,
         |    CAST(length(text) AS DOUBLE) AS f3,
         |    CAST(len(list_filter($toks, t -> list_contains($stopList, t))) AS DOUBLE) AS f4
         |  FROM documents),
         |scored AS (
         |  SELECT doc_id, source,
         |    round(${w._1} + ${w._2} * f1 + ${w._3} * f2 + ${w._4} * f3 + ${w._5} * f4, 6) AS q_score
         |  FROM feats)
         |SELECT doc_id, source, q_score,
         |  CASE WHEN q_score >= ${t._2} THEN 'head'
         |       WHEN q_score >= ${t._1} THEN 'middle'
         |       ELSE 'tail' END AS band
         |FROM scored
         |ORDER BY doc_id""".stripMargin
    }
  }
}
