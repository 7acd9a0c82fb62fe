package graft

import graft.operators.AnswerEval
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AnswerEvalSpec extends SparkSpec {
  import spark.implicits._

  private def docsDf(rows: Seq[(Long, String)]) =
    rows.toDF("doc_id", "text")

  private def embsDf(rows: Seq[(Long, Array[Float])]) =
    rows.toDF("vec_id", "embedding")

  test("exact-duplicate answer scores perfect relevance and coverage") {
    // query 0's nearest neighbor (vec 1) carries IDENTICAL text: the
    // extractive answer slot == the input, so relevance_f1 = coverage = 1
    val docs = docsDf(Seq(
      (0L, "alpha beta gamma"), (1L, "alpha beta gamma"),
      (2L, "alpha delta"), (3L, "epsilon zeta")))
    val embs = embsDf(Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(1.0f, 0.0f)),
      (2L, Array(0.9f, 0.1f)), (3L, Array(0.0f, 1.0f))))
    val c = AnswerEval.cases(docs, embs, stride = 100, k = 3).collect()
    assert(c.length == 1)
    val r = c.head
    assert(r.getAs[Long]("q_id") == 0L)
    assert(r.getAs[Double]("relevance_f1") == 1.0)
    assert(r.getAs[Double]("coverage") == 1.0)
    // grounding: answer tokens {alpha,beta,gamma} vs ctx union of vecs
    // 2,3 = {alpha,delta,epsilon,zeta} -> 1/3
    assert(r.getAs[Double]("grounding") == 0.3333)
    assert(r.getAs[Double]("score") == math.rint((1.0 + 1.0 + 0.3333) / 3.0 * 1e4) / 1e4)
    assert(r.getAs[Int]("success") == (if (r.getAs[Double]("score") >= 0.8) 1 else 0))
  }

  test("poll aggregates the panel mean at 3dp and the pass rate") {
    val docs = docsDf(Seq(
      (0L, "alpha beta gamma"), (1L, "alpha beta gamma"),
      (2L, "alpha delta"), (3L, "epsilon zeta")))
    val embs = embsDf(Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(1.0f, 0.0f)),
      (2L, Array(0.9f, 0.1f)), (3L, Array(0.0f, 1.0f))))
    val p = AnswerEval.poll(docs, embs, stride = 100, k = 3).collect().head
    assert(p.getAs[Long]("n_cases") == 1)
    assert(p.getAs[Double]("evaluation_score") ==
      math.rint(math.rint((2.0 + 0.3333) / 3.0 * 1e4) / 1e4 * 1e3) / 1e3)
    assert(p.getAs[Double]("pass_rate") == 0.0)
  }

  test("real corpus: scores bounded, success consistent with threshold") {
    val docs = sources.Tables.documents(spark, TestSpark.Sf0001)
    val embs = sources.Tables.embeddings(spark, TestSpark.Sf0001)
    val c = AnswerEval.cases(docs, embs).cache()
    val n = c.count()
    assert(n == embs.filter(col("vec_id") % AnswerEval.QueryStride === 0).count())
    val bad = c.filter(
      col("grounding") < 0 || col("grounding") > 1 ||
        col("relevance_f1") < 0 || col("relevance_f1") > 1 ||
        col("coverage") < 0 || col("coverage") > 1 ||
        col("success") =!= (col("score") >= AnswerEval.Threshold).cast("int"))
    assert(bad.count() == 0)
    c.unpersist()
  }
}
