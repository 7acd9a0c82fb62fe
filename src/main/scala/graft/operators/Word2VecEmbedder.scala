package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** REAL learned weights through the batched-inference seam — the
  * engine-side answer to the reference's sentence-transformer embedding
  * call (`src/database/weaviate_interface_v4.py:289`
  * `_create_query_vector`): a Word2Vec model is TRAINED on the corpus
  * (MLlib skip-gram, real gradient-learned word vectors — not a hashing
  * stand-in), its weights are materialized to a weight FILE per source
  * dir, and serving loads that file behind [[Inference.embedBatched]]
  * exactly the way an ONNX session would load a sentence-encoder:
  * session-init once per partition, bounded micro-batches, positional
  * re-attach. Pooling is the standard mean-of-word-vectors sentence
  * embedding (the fastText / sentence-transformers mean-pooling shape).
  *
  * Determinism contract for the oracle: in-vocabulary tokens are summed
  * in SORTED token order with double accumulation, then divided by the
  * hit count and truncated to float — so the DuckDB replay
  * (`sum(wv[dim] ORDER BY term)` over the SAME weights as literals,
  * `CAST(.. AS REAL)`) reproduces the pooled vector BITWISE, and the
  * cosine ranking hash-matches. Weights embed into the oracle as exact
  * double literals from the per-dir trained model, the
  * [[ProductQuantizer]] literal-codebook pattern.
  *
  * Scale design: training is one MLlib job (vocab is bounded by
  * minCount; the weight table is vocab×dim — KBs); serving is a pure
  * map over partitions with the weight map in the closure (a broadcast
  * at cluster scale), no shuffle, no per-row model calls.
  */
object Word2VecEmbedder {
  val Dim = 16
  val Seed = 42L
  val MaxBatch = 64
  val TopK = 10
  /** Query document for the benchmark search (the vector benchmark's
    * [[VectorSearch.QueryVecId]] doc).
    */
  val QueryDocId = 42L

  /** (dir → (weightFilePath, word → vector)); one trained model per
    * source dir per JVM, the [[ProductQuantizer]] cache pattern.
    */
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Map[String, Array[Float]]]()
  @volatile private var lastDir: Option[String] = None

  /** Train on the corpus token stream (single partition + fixed seed =
    * deterministic), write the weight file, read it back, return the
    * loaded weights. The round-trip through parquet IS the point: the
    * serving path consumes the weight artifact, not the trainer.
    */
  private def trainAndLoad(s: SparkSession, dir: String): Map[String, Array[Float]] = {
    import org.apache.spark.ml.feature.Word2Vec
    val toked = Tables.documents(s, dir)
      .select(graft.functions.TextFunctions.tokens(col("text")).as("toks"))
      .coalesce(1)
    val model = new Word2Vec()
      .setInputCol("toks").setOutputCol("v")
      .setVectorSize(Dim).setSeed(Seed).setMaxIter(1).setNumPartitions(1)
      .setMinCount(1)
      .fit(toked)
    val path = IndexCache.getOrBuild("w2v_weights", dir) { p =>
      model.getVectors.write.mode("overwrite").parquet(p)
    }
    s.read.parquet(path).collect()
      .map(r => r.getString(0) ->
        r.getAs[org.apache.spark.ml.linalg.Vector](1).toArray.map(_.toFloat))
      .toMap
  }

  private[graft] def weightsFor(s: SparkSession, dir: String): Map[String, Array[Float]] = {
    val w = cache.computeIfAbsent(dir, trainAndLoad(s, _))
    lastDir = Some(dir)
    w
  }

  /** The weights trained for the MOST RECENTLY queried dir — shared by
    * every literal-weights oracle ([[searchOracle]],
    * [[AttentionEncoder.searchOracle]]); None (the loud-failure empty
    * oracle) only before any training. Keyed off `lastDir` directly, so
    * a multi-dir JVM session (e.g. ScaleBench then Verify) still
    * resolves the dir the oracle's query ran against — `lastDir` is
    * unambiguous even when the cache holds several dirs.
    */
  private[graft] def cachedWeights: Option[Map[String, Array[Float]]] =
    lastDir.flatMap(d => Option(cache.get(d)))

  /** Pure-JVM replica of [[graft.functions.TextFunctions.tokens]]. */
  private def tokenize(text: String): Seq[String] =
    text.toLowerCase.split("[^a-z0-9]+").toSeq.filter(_.nonEmpty)

  /** Mean-pool the SORTED in-vocabulary token vectors (double
    * accumulation, float truncation at the edge — the oracle's exact
    * arithmetic); None when no token is in vocabulary.
    */
  private def pool(w: Map[String, Array[Float]], text: String): Option[Array[Float]] = {
    val hits = tokenize(text).filter(w.contains).sorted
    if (hits.isEmpty) None
    else {
      val acc = new Array[Double](Dim)
      hits.foreach { t =>
        val v = w(t)
        var i = 0
        while (i < Dim) { acc(i) += v(i); i += 1 }
      }
      Some(acc.map(x => (x / hits.length).toFloat))
    }
  }

  /** Embed `docs.text` through the inference seam with the learned
    * weights. Docs with no in-vocabulary token carry an empty vector
    * (filtered by consumers — the seam contract is one output per input).
    */
  def embedDocs(docs: DataFrame, weights: Map[String, Array[Float]],
                maxBatch: Int = MaxBatch): DataFrame =
    Inference.embedBatched(docs, "text", "w2v_emb", maxBatch)(() => weights)(
      (w, texts) => texts.map(t => pool(w, t).getOrElse(Array.empty[Float])))

  /** Driver query: cosine top-k over the learned sentence embeddings —
    * the e2e embed→search pipeline with REAL weights in the model slot.
    */
  def qSearch(s: SparkSession, dir: String): DataFrame = {
    val w = weightsFor(s, dir)
    val embedded = embedDocs(
      Tables.documents(s, dir).select(col("doc_id"), col("text")), w)
      .filter(size(col("w2v_emb")) > 0)
      .select(col("doc_id"), col("w2v_emb"))
      .transform(Checkpoints.transient_) // one inference pass feeds both
                                         // the query row and the corpus
                                         // side; released at the query
                                         // boundary
    val q = embedded.filter(col("doc_id") === QueryDocId)
      .select(col("w2v_emb").as("q_emb"))
    embedded.filter(col("doc_id") =!= QueryDocId)
      .join(broadcast(q))
      .select(col("doc_id"),
        round(graft.functions.VectorFunctions.cosineSim(col("w2v_emb"), col("q_emb")), 4)
          .as("score"))
      .orderBy(desc("score"), asc("doc_id"))
      .limit(TopK)
  }

  /** Referencing a nonexistent column makes the oracle FAIL loudly in
    * DuckDB rather than compare as a plausible empty result (the
    * [[ProductQuantizer]] convention).
    */
  private val emptyOracle =
    "SELECT w2v_model_not_trained_or_ambiguous FROM documents"

  /** Weights of the per-dir trained model as exact double literals
    * ([[graft.Verify]] dumps oracles AFTER running queries, so the cache
    * is populated; Float→Double→shortest-decimal round-trips exactly).
    */
  private def weightValues(w: Map[String, Array[Float]]): String =
    w.toSeq.sortBy(_._1).map { case (term, v) =>
      s"('$term', [${v.map(_.toDouble).mkString(", ")}])"
    }.mkString(",\n    ")

  def searchOracle: String = {
    cachedWeights.fold(emptyOracle) { w =>
      s"""WITH wv AS (SELECT * FROM (VALUES
         |    ${weightValues(w)}) AS t(term, v)),
         |toked AS (
         |  SELECT doc_id, unnest(${TextAnalysis.sqlToks}) AS term FROM documents),
         |hits AS (
         |  SELECT doc_id, term, v FROM toked JOIN wv USING (term)),
         |pooled_long AS (
         |  SELECT doc_id, d.i AS dim,
         |    CAST(sum(v[d.i] ORDER BY term) / count(*) AS REAL) AS pv
         |  FROM hits, (SELECT unnest(range(1, ${Dim + 1})) AS i) d
         |  GROUP BY doc_id, d.i),
         |pooled AS (
         |  SELECT doc_id, list(CAST(pv AS DOUBLE) ORDER BY dim) AS e
         |  FROM pooled_long GROUP BY doc_id),
         |q AS (SELECT e AS q_emb FROM pooled WHERE doc_id = $QueryDocId)
         |SELECT doc_id,
         |  round(${VectorSearch.cosineSql("e", "q_emb", Dim)}, 4) AS score
         |FROM pooled, q
         |WHERE doc_id <> $QueryDocId
         |ORDER BY score DESC, doc_id
         |LIMIT $TopK""".stripMargin
    }
  }
}
