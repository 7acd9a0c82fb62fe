package graft

import graft.operators.{KeywordSearch, LearnedReranker}
import org.apache.spark.sql.functions._

/** Trained cross-scorer in the reranker slot: the model must behave
  * like a served cross-encoder (seam contract) and actually be learned
  * (weights separate same-cluster pairs from others better than a
  * constant would).
  */
class LearnedRerankerSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private lazy val w = LearnedReranker.weightsFor(spark, dir)

  test("fitted coefficients are non-degenerate") {
    // at least one non-zero learned coefficient beyond the intercept
    assert(Seq(w._2, w._3, w._4).exists(_ != 0.0))
  }

  test("learned scores separate same-label pairs from different-label pairs") {
    val docs = graft.sources.Tables.documents(spark, dir)
    val embs = graft.sources.Tables.embeddings(spark, dir)
    val labeled = docs.join(
      embs.select(col("vec_id").as("doc_id"), col("label")), Seq("doc_id"))
    val q = labeled.filter(col("doc_id") % KeywordSearch.BatchStride === 0)
      .select(col("text").as("query"), col("label").as("q_label")).limit(1)
    val pairs = labeled.crossJoin(broadcast(q))
      .select(col("query"), col("text"), (col("label") === col("q_label")).as("same"))
    val scored = LearnedReranker.scorePairs(pairs, w)
      .groupBy("same").agg(avg("ce_score").as("m"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(scored(true) > scored(false),
      s"learned scorer does not separate classes: $scored")
  }

  test("pair scoring through the seam is batch-size invariant and ordered") {
    val docs = graft.sources.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
      .withColumn("query", lit(KeywordSearch.QueryTerms.mkString(" ")))
    val wl = w // local copy: the closure must not capture the spec class
    def at(n: Int) =
      graft.operators.Inference.scorePairsBatched(docs, "query", "text", "s", n)(
        () => wl)((_, ps) => ps.map(_ => 1.0))
        .count()
    assert(at(1) == at(64))
    val ranked = LearnedReranker.qSearch(spark, dir).collect()
    assert(ranked.nonEmpty && ranked.length <= LearnedReranker.TopK)
    val scores = ranked.map(_.getDouble(2)).toSeq
    assert(scores == scores.sorted.reverse)
  }
}
