package graft

import graft.operators.Word2VecEmbedder
import org.apache.spark.sql.functions._

/** Real learned weights through the inference seam: the Word2Vec model
  * trains on the corpus, round-trips through its weight file, and must
  * behave like any served model — batch-size invariant, order
  * preserving, one output per input.
  */
class Word2VecSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private lazy val weights = Word2VecEmbedder.weightsFor(spark, dir)
  private lazy val docs =
    graft.sources.Tables.documents(spark, dir).select(col("doc_id"), col("text"))

  test("weights are real learned vectors loaded from the weight file") {
    assert(weights.nonEmpty)
    assert(weights.values.forall(_.length == Word2VecEmbedder.Dim))
    // learned, not degenerate: at least one non-zero component, and not
    // all words identical
    assert(weights.values.exists(_.exists(_ != 0f)))
    assert(weights.values.map(_.toSeq).toSet.size > 1)
  }

  test("embedding through the seam is batch-size invariant") {
    def embAt(maxBatch: Int): Map[Long, Seq[Float]] =
      Word2VecEmbedder.embedDocs(docs, weights, maxBatch)
        .select(col("doc_id"), col("w2v_emb")).collect()
        .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val one = embAt(1)
    val big = embAt(64)
    assert(one == big)
  }

  test("seam output equals a direct driver-side computation (order preserved)") {
    val viaSeam = Word2VecEmbedder.embedDocs(docs, weights)
      .select(col("doc_id"), col("w2v_emb")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val direct = docs.select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> pooledRef(r.getString(1)).toSeq).toMap
    assert(viaSeam == direct)
  }

  test("benchmark search returns a full ranked page") {
    val rows = Word2VecEmbedder.qSearch(spark, dir).collect()
    assert(rows.length == Word2VecEmbedder.TopK)
    // scores descend, ties broken by doc_id
    val scores = rows.map(_.getDouble(1)).toSeq
    assert(scores == scores.sorted.reverse)
  }

  /** Independent re-statement of the pooling contract (sorted in-vocab
    * tokens, double accumulation, float truncation).
    */
  private def pooledRef(text: String): Array[Float] = {
    val hits = text.toLowerCase.split("[^a-z0-9]+").toSeq
      .filter(t => t.nonEmpty && weights.contains(t)).sorted
    if (hits.isEmpty) Array.empty[Float]
    else {
      val acc = new Array[Double](Word2VecEmbedder.Dim)
      hits.foreach { t =>
        val v = weights(t)
        (0 until Word2VecEmbedder.Dim).foreach(i => acc(i) += v(i))
      }
      acc.map(x => (x / hits.length).toFloat)
    }
  }
}
