package graft

import graft.operators.{CorpusOps, Events, RetrievalEval, VectorSearch}
import graft.sources.Tables

/** Physical-plan contracts for the scale-critical operators added in R2:
  * these assert the SHAPE that makes the 100 TB story true, so a
  * refactor that silently reintroduces a sort/join/shuffle fails here
  * long before a cluster run would.
  */
class PlanPropertiesSpec extends SparkSpec {

  private val dir = TestSpark.Sf0001

  private def planOf(df: org.apache.spark.sql.DataFrame): String = {
    df.count() // let AQE finalize
    df.queryExecution.executedPlan.toString
  }

  test("as-of join is window-only: no join operator, one user shuffle") {
    val plan = planOf(Events.asofLastPurchase(spark, dir))
    assert(!plan.contains("Join"), s"as-of should not plan any join:\n$plan")
    assert(plan.contains("Window"), "as-of ranks via a single keyed window")
  }

  test("retrieval eval ranks via the bounded heap, never a window sort") {
    Seq(RetrievalEval.query(spark, dir), RetrievalEval.queryNdcg(spark, dir))
      .foreach { df =>
        val plan = planOf(df)
        assert(!plan.contains("Window"), s"eval must not window-sort:\n$plan")
        assert(plan.contains("top_k_by_score"),
          "eval should aggregate through TopKByScore")
      }
  }

  test("batch vector search aggregates through the heap, not a window") {
    val plan = planOf(VectorSearch.batchSearch(spark, dir))
    assert(plan.contains("top_k_by_score") && !plan.contains("Window"))
  }

  test("answer eval ranks through the heap and judges on k-row joins") {
    val plan = planOf(graft.operators.AnswerEval.queryCases(spark, dir))
    assert(!plan.contains("Window"),
      s"answer eval must not window-sort the corpus:\n$plan")
    assert(plan.contains("top_k_by_score"),
      "per-query top-k should run through the bounded heap")
  }

  test("bloom decontamination probes map-side before any join") {
    val plan = planOf(graft.operators.Dedup.qDecontaminateBloom(spark, dir))
    assert(plan.contains("might_contain"),
      s"the bloom probe must appear in the corpus-side plan:\n$plan")
    // the probe is a Filter on the scan side, below the verify join:
    // after the join the condition would reference both sides
    val joinIdx = plan.indexOf("Join")
    val probeIdx = plan.indexOf("might_contain")
    assert(joinIdx >= 0 && probeIdx > joinIdx,
      "bloom filter should sit under (printed after) the verify join")
  }

  test("fine-tune selection is a bounded heap, windows only over the k winners") {
    val plan = planOf(graft.operators.FinetuneData.query(spark, dir))
    assert(plan.contains("TakeOrderedAndProject"),
      s"train/val selection should heap-select, not globally sort:\n$plan")
  }

  test("corpus mixing and split are map-side: no exchange before the output sort") {
    Seq(CorpusOps.mix(Tables.documents(spark, dir)),
      CorpusOps.split(Tables.documents(spark, dir))).foreach { df =>
      val plan = planOf(df)
      // exactly the one rangepartitioning exchange of the final orderBy
      val exchanges = "Exchange".r.findAllIn(plan).length
      val reused = "ReusedExchange".r.findAllIn(plan).length
      assert(exchanges - reused <= 1, s"unexpected shuffles:\n$plan")
    }
  }

  test("grouped search caps per group through the heap, never a corpus window") {
    val plan = planOf(VectorSearch.searchGrouped(spark, dir))
    assert(plan.contains("top_k_by_score") && !plan.contains("Window"),
      s"per-group top-k must aggregate, not window-sort:\n$plan")
  }

  test("small-to-big expansion is narrow: no exchange before the output sort") {
    val plan = planOf(graft.operators.Chunker.qExpand(spark, dir))
    val exchanges = "Exchange".r.findAllIn(plan).length
    val reused = "ReusedExchange".r.findAllIn(plan).length
    assert(exchanges - reused <= 1,
      s"expansion must not shuffle or self-join chunks:\n$plan")
    assert(!plan.contains("Join"), s"no chunk-neighbor join expected:\n$plan")
  }

  test("batch hybrid fusion materializes the dense fan-out join exactly once") {
    val plan = planOf(graft.operators.HybridSearch.batchSearch(spark, dir))
    // the |corpus|x|queries| side is the only SMJ/BHJ on (q_id, doc_id);
    // the normalization stats must come from the sparse aggregates, so
    // the dense join operator appears once in the executed plan
    val dense = plan.linesIterator.count(l =>
      l.contains("Join") && l.contains("q_id") && l.contains("doc_id")
        && l.contains("LeftOuter"))
    assert(dense == 1, s"expected exactly one dense LEFT JOIN, got $dense:\n$plan")
  }

  test("text2sql suite stays fused: a handful of exchanges, not one per question") {
    // the 300-question workload must execute as the two shared-scan
    // conditional-aggregation passes + the few genuine LIMIT-k legs
    // (~4 exchanges), never regress to the per-question union tower
    // (287 exchanges, one parquet scan per question)
    val plan = planOf(graft.operators.Text2Sql.qSuite(spark, dir))
    val ex = plan.linesIterator.count(_.contains("Exchange"))
    val scans = plan.linesIterator.count(_.contains("Scan parquet"))
    assert(ex <= 20, s"fused suite should need few exchanges, got $ex")
    assert(scans <= 25, s"fused suite should scan the table a few times, got $scans")
  }

  test("latest compaction partial-aggregates: no window, no per-key sort") {
    val plan = planOf(Events.latest(spark, dir))
    assert(!plan.contains("Window"), s"compaction must not window:\n$plan")
    // a partial (map-side) aggregate precedes the single shuffle, so each
    // map task sends ONE candidate per key
    assert(plan.contains("partial_max") || plan.contains("partial max")
      || "HashAggregate.*max".r.findFirstIn(plan).isDefined,
      s"expected partial max aggregation:\n$plan")
  }

  test("paginated fetch plans as a bounded heap, not a global sort") {
    val plan = planOf(graft.operators.Catalog.fetchObjectsPage(spark, dir))
    assert(plan.contains("TakeOrderedAndProject"),
      s"offset+limit should ride the top-k heap:\n$plan")
    assert(!plan.contains("Sort "), s"no global sort expected:\n$plan")
  }

  test("shuffle shards: one exchange, sorts are keyed to the shard") {
    val plan = planOf(CorpusOps.shuffleShards(Tables.documents(spark, dir)))
    // shard assignment is map-side; the window partitions by shard — the
    // only non-reused exchanges are the shard hash partitioning and the
    // final output ordering's range partitioning
    val exchanges = "Exchange".r.findAllIn(plan).length -
      "ReusedExchange".r.findAllIn(plan).length
    assert(exchanges <= 2, s"expected ≤2 exchanges (shard hash + output range):\n$plan")
  }
}
