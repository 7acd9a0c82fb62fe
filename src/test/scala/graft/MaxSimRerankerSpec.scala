package graft

import graft.operators._
import graft.sources.Tables
import org.apache.spark.sql.functions._

class MaxSimRerankerSpec extends SparkSpec {
  import spark.implicits._

  /** Double cosine with ascending-index accumulation — the
    * CosineSimilarity expression's arithmetic.
    */
  private def cos(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      dot += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  private def tokenize(text: String): Seq[String] =
    text.toLowerCase.split("[^a-z0-9]+").toSeq.filter(_.nonEmpty)

  test("maxsim rerank matches an independent JVM replay over the same candidates") {
    val dir = TestSpark.Sf0001
    val w = Word2VecEmbedder.weightsFor(spark, dir)
    val docs = Tables.documents(spark, dir)
    val qterms = KeywordSearch.QueryTerms.distinct.filter(w.contains).sorted
    assert(qterms.nonEmpty)
    val cand = KeywordSearch.bm25(docs, KeywordSearch.QueryTerms, MaxSimReranker.CandidateK)
      .select(col("doc_id"), col("score").as("bm25_score"))
      .join(docs.select(col("doc_id"), col("text")), Seq("doc_id"))
      .collect()
    // independent replay: distinct in-vocab doc tokens, per-qterm max,
    // qterm-ordered sum, 6dp edge rounding
    val expected = cand.map { r =>
      val dtoks = tokenize(r.getAs[String]("text")).distinct.filter(w.contains)
      var s = 0.0
      qterms.foreach { q => s += dtoks.map(t => cos(w(q), w(t))).max }
      (r.getAs[Long]("doc_id"),
        BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.sortBy { case (id, sc) => (-sc, id) }.take(MaxSimReranker.TopK).toSeq
    val got = MaxSimReranker.qSearch(spark, dir)
      .select("doc_id", "maxsim_score").as[(Long, Double)].collect().toSeq
    assert(got == expected)
  }

  test("batch maxsim reranks exactly the batch-bm25 candidate sets") {
    val dir = TestSpark.Sf001
    val docs = Tables.documents(spark, dir)
    val cand = KeywordSearch.bm25BatchSel(docs,
        _.filter(col("doc_id") % KeywordSearch.BatchStride === 0),
        index = Some(KeywordSearch.cachedBatchPostings(spark, dir)))
      .select("q_id", "doc_id").as[(Long, Long)].collect().toSet
    val reranked = MaxSimReranker.qBatchRerank(spark, dir).collect()
    assert(reranked.map(r =>
      (r.getAs[Long]("q_id"), r.getAs[Long]("doc_id"))).toSet == cand)
    // rn is a dense permutation per query, scores descend
    reranked.groupBy(_.getAs[Long]("q_id")).values.foreach { g =>
      assert(g.map(_.getAs[Int]("rn")).sorted.toSeq == (1 to g.length))
      val byRn = g.sortBy(_.getAs[Int]("rn")).map(_.getAs[Double]("score")).toSeq
      assert(byRn == byRn.sorted.reverse)
    }
  }

  test("champion-candidate batch rerank reranks exactly the champion candidate sets") {
    val dir = TestSpark.Sf001
    val docs = Tables.documents(spark, dir)
    val postings = KeywordSearch.cachedBatchPostings(spark, dir)
    val cand = ChampionIndex.bm25BatchPrunedSel(docs, postings,
        ChampionIndex.cachedChampions(spark, dir),
        _.filter(col("doc_id") % KeywordSearch.BatchStride === 0))
      .select("q_id", "doc_id").as[(Long, Long)].collect().toSet
    val reranked = MaxSimReranker.qBatchRerankPruned(spark, dir).collect()
    assert(reranked.nonEmpty)
    assert(reranked.map(r =>
      (r.getAs[Long]("q_id"), r.getAs[Long]("doc_id"))).toSet == cand)
    // the rerank TAIL is the exact form's: any (q, doc) pair both
    // pipelines retain must carry the identical MaxSim score
    val exactScores = MaxSimReranker.qBatchRerank(spark, dir).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("doc_id")) ->
        r.getAs[Double]("score")).toMap
    val shared = reranked.flatMap { r =>
      val key = (r.getAs[Long]("q_id"), r.getAs[Long]("doc_id"))
      exactScores.get(key).map(e => (key, r.getAs[Double]("score"), e))
    }
    assert(shared.nonEmpty)
    shared.foreach { case (key, p, e) =>
      assert(p == e, s"maxsim score diverged on shared candidate $key: $p vs $e")
    }
  }

  test("maxsim is invariant to token multiplicity (max over support)") {
    val w = Map(
      "spark" -> Array.tabulate(16)(i => if (i == 0) 1f else 0f),
      "hash" -> Array.tabulate(16)(i => if (i == 1) 1f else 0f),
      "filler" -> Array.tabulate(16)(i => if (i == 2) 1f else 0f))
    val docs = Seq(
      (0L, "spark hash filler"),
      (1L, "spark spark hash hash hash filler")).toDF("doc_id", "text")
    val cand = Seq((0L, 1.0), (1L, 1.0)).toDF("doc_id", "bm25_score")
    val scores = MaxSimReranker.rescore(spark, docs, cand, w)
      .select("doc_id", "maxsim_score").as[(Long, Double)].collect().toMap
    assert(scores(0L) == scores(1L))
  }

  test("pruned maxsim retrieval at full depth equals brute-force maxsim ranking") {
    val dir = TestSpark.Sf0001
    val w = Word2VecEmbedder.weightsFor(spark, dir)
    val docs = Tables.documents(spark, dir)
    val postings = KeywordSearch.cachedBatchPostings(spark, dir)
    val qterms = KeywordSearch.QueryTerms.distinct.filter(w.contains).sorted
    // full depth: neighborhood = the whole vocabulary, unbounded lists
    val champsFull = IndexRefresh.cutChampions(postings, m = 1000000)
    val viaIndex = MaxSimReranker.searchPrunedCore(spark, docs, postings,
        champsFull, w, qterms, nearTerms = w.size, k = 1000000)
      .collect().map(_.toString).toSeq
    // brute force: every doc with at least one in-vocab token, scored by
    // the same exact-MaxSim tail (candidates = all docs)
    val brute = MaxSimReranker.searchPrunedCore(spark, docs, postings,
        postings.select("term", "doc_id"), w, qterms,
        nearTerms = w.size, k = 1000000)
      .collect().map(_.toString).toSeq
    assert(viaIndex.nonEmpty && viaIndex == brute)
  }

  test("pruned maxsim: candidate volume is bounded by the probe, scores stay exact") {
    val dir = TestSpark.Sf0001
    val w = Word2VecEmbedder.weightsFor(spark, dir)
    val docs = Tables.documents(spark, dir)
    val postings = KeywordSearch.cachedBatchPostings(spark, dir)
    val qterms = KeywordSearch.QueryTerms.distinct.filter(w.contains).sorted
    val champs = IndexRefresh.cutChampions(postings)
    val pruned = MaxSimReranker.searchPrunedCore(spark, docs, postings,
      champs, w, qterms, MaxSimReranker.NearTerms, MaxSimReranker.TopK)
      .collect()
    assert(pruned.nonEmpty && pruned.length <= MaxSimReranker.TopK)
    // every retrieved doc's score equals the brute-force score for that
    // doc (only the candidate SET is pruned, never the scoring)
    val brute = MaxSimReranker.searchPrunedCore(spark, docs, postings,
        postings.select("term", "doc_id"), w, qterms, w.size, 1000000)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("score")).toMap
    pruned.foreach { r =>
      assert(brute(r.getAs[Long]("doc_id")) == r.getAs[Double]("score"))
    }
  }

  test("maxsim distinguishes docs a mean-pooled bi-encoder cannot") {
    // doc 0 = {u, v}; doc 1 = {m} with E[m] = (E[u] + E[v]) / 2 — the
    // mean-pooled vectors are IDENTICAL, so any bi-encoder scores the
    // docs equally; late interaction keeps per-token vectors and sees
    // the exact query-term match in doc 0.
    val u = Array.tabulate(16)(i => if (i == 0) 1f else 0f)
    val v = Array.tabulate(16)(i => if (i == 1) 1f else 0f)
    val m = u.zip(v).map { case (a, b) => (a + b) / 2 }
    val w = Map("spark" -> u, "data" -> v, "blend" -> m)
    val docs = Seq((0L, "spark data"), (1L, "blend")).toDF("doc_id", "text")
    val cand = Seq((0L, 1.0), (1L, 1.0)).toDF("doc_id", "bm25_score")
    val scores = MaxSimReranker.rescore(spark, docs, cand, w)
      .select("doc_id", "maxsim_score").as[(Long, Double)].collect().toMap
    // query "spark": exact token match in doc 0 scores 1.0; the blended
    // single-vector doc only reaches cos(u, m) = 1/sqrt(2)
    assert(scores(0L) == 1.0)
    assert(scores(1L) < 0.8)
  }
}
