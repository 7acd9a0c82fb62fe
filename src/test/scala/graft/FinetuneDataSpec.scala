package graft

import graft.operators.FinetuneData
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FinetuneDataSpec extends SparkSpec {
  import spark.implicits._

  test("triplets: disjoint splits, sized from the hash order, negatives non-self") {
    val docs = sources.Tables.documents(spark, TestSpark.Sf001)
    val embs = sources.Tables.embeddings(spark, TestSpark.Sf001)
    val t = FinetuneData.triplets(docs, embs, trainN = 8, valN = 3).cache()
    assert(t.count() == 11)
    assert(t.filter(col("split") === "train").count() == 8)
    assert(t.filter(col("split") === "val").count() == 3)
    // positives are distinct docs; a negative is never its own positive
    assert(t.select("doc_id").distinct().count() == 11)
    assert(t.filter(col("doc_id") === col("neg_id")).count() == 0)
    // selection respects the median-length validation gate
    val med = docs.agg(expr("percentile(n_chars, 0.5)")).as[Double].head()
    val lens = t.join(docs, "doc_id").select(col("n_chars").cast("long")).as[Long].collect()
    assert(lens.forall(_ > med))
    t.unpersist()
  }

  test("anchors are rarity-ordered probes without removal words") {
    val docs = Seq(
      (1L, "alpha beta transcript gamma", 27),
      (2L, "alpha beta epsilon zeta etavery longer text here", 48),
      (3L, "alpha common common words appear here often indeed", 50),
      (4L, "beta common words appear here often indeed again too", 52)
    ).toDF("doc_id", "text", "n_chars")
    val embs = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.9f, 0.1f)),
      (3L, Array(0.0f, 1.0f)), (4L, Array(0.1f, 0.9f))
    ).toDF("vec_id", "embedding")
    val t = FinetuneData.triplets(docs, embs, trainN = 2, valN = 1).collect()
    // no anchor ever contains a removal word
    assert(t.forall(r => FinetuneData.RemovalWords
      .forall(w => !r.getAs[String]("anchor").split(" ").contains(w))))
    // every anchor token comes from its own doc, rarity-ordered means
    // df-1 tokens (unique to the doc) come before shared ones
    val byId = t.map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("anchor")).toMap
    byId.get(2L).foreach { a =>
      assert(a.split(" ").take(3).forall(Seq("epsilon", "zeta", "etavery", "longer", "here", "text").contains))
    }
  }
}
