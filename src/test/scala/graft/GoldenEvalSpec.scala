package graft

import graft.operators._
import org.apache.spark.sql.functions._

class GoldenEvalSpec extends SparkSpec {
  import spark.implicits._

  test("loadGolden: the committed golden file parses with the shared schema") {
    val g = GoldenEval.loadGolden(spark).collect()
    assert(g.length == 64)
    assert(g.forall(r => !r.isNullAt(0) && !r.isNullAt(1) && !r.isNullAt(2)))
    // every answer phrase is a prefix of its query (the mining contract)
    assert(g.forall(r => r.getString(1).startsWith(r.getString(2))))
  }

  test("goldenRanked: dense ranks, descending scores, bounded depth") {
    val postings = KeywordSearch.cachedBatchPostings(spark, TestSpark.Sf0001)
    val ranked = GoldenEval.goldenRanked(postings,
      GoldenEval.loadGolden(spark), k = 5).collect()
    val byQ = ranked.groupBy(_.getAs[Long]("q_id"))
    assert(byQ.nonEmpty)
    byQ.foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getAs[Int]("rn"))
      assert(sorted.map(_.getAs[Int]("rn")).toSeq == (1 to rows.length))
      assert(rows.length <= 5)
      val scores = sorted.map(_.getAs[Double]("score")).toSeq
      assert(scores == scores.sorted.reverse)
    }
  }

  test("pruned golden leg: bounded lists, same metric universe as the exact leg") {
    val m = GoldenEval.qGoldenEvalPruned(spark, TestSpark.Sf0001).collect().head
    // every golden query retrieves something through the champion lists
    // on this corpus, and the metrics are sane probabilities
    assert(m.getAs[Long]("n_queries") == 64L)
    val (hr, mrr) = (m.getAs[Double]("hit_rate"), m.getAs[Double]("mrr"))
    assert(hr > 0.0 && hr <= 1.0 && mrr > 0.0 && mrr <= 1.0)
  }

  test("streaming refresh serves the same index as the one-batch refresh") {
    val a = graft.streaming.IndexStream.qStreamIndexRefresh(spark, TestSpark.Sf0001)
      .collect().map(_.toString).toSeq
    val b = graft.operators.IndexRefresh.qRefreshSearch(spark, TestSpark.Sf0001)
      .collect().map(_.toString).toSeq
    assert(a.nonEmpty && a == b)
  }

  test("golden as-of-0 equals a fresh golden eval on the previous snapshot") {
    val dir = TestSpark.Sf0001
    val prevDocs = CorpusOps.prevSnapshot(graft.sources.Tables.documents(spark, dir))
    val p0 = KeywordIndex.postings(prevDocs)
    val postings = p0
      .join(KeywordIndex.docStats(p0).select("doc_id", "dl"), Seq("doc_id"))
      .select("doc_id", "dl", "term", "tf")
    val golden = GoldenEval.loadGolden(spark)
    val expect = GoldenEval.goldenMetrics(prevDocs,
      GoldenEval.goldenRanked(postings, golden), golden).collect().toSeq
    val got = GoldenEval.qGoldenEvalAsOf(spark, dir).collect().toSeq
    assert(got.nonEmpty && got == expect)
  }

  test("goldenMetrics: containment relevance on a hand-built corpus") {
    val docs = Seq(
      (0L, "alpha beta gamma"),
      (1L, "beta gamma delta"),
      (2L, "unrelated words here")
    ).toDF("doc_id", "text")
    // q10 retrieves doc0 at rn1 (answer present -> hit, rr = 1)
    // q11 retrieves doc2 rn1 (miss), doc1 rn2 (answer present -> rr = 1/2)
    // q12 retrieves only doc2 (no answer -> miss, rr = 0)
    val ranked = Seq(
      (10L, 1, 0L, 1.0),
      (11L, 1, 2L, 1.0), (11L, 2, 1L, 0.9),
      (12L, 1, 2L, 1.0)
    ).toDF("q_id", "rn", "doc_id", "score")
    val golden = Seq(
      (10L, "alpha beta x", "alpha beta"),
      (11L, "beta gamma x", "beta gamma"),
      (12L, "zz yy", "zz yy")
    ).toDF("query_id", "query", "answer")
    val m = GoldenEval.goldenMetrics(docs, ranked, golden).collect().head
    assert(m.getAs[Long]("n_queries") == 3L)
    assert(m.getAs[Double]("hit_rate") == math.rint(2.0 / 3 * 10000) / 10000)
    assert(m.getAs[Double]("mrr") == 0.5) // (1 + 1/2 + 0) / 3
  }
}
