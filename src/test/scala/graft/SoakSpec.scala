package graft

import org.apache.spark.sql.functions._

/** Serving-stream SOAK gate (the r14 verdict's top task): the
  * transient-checkpoint drain must fire at MICRO-BATCH boundaries, not
  * at stream stop. The quantized fused serve registers one bounded
  * query-frame checkpoint per micro-batch
  * ([[graft.operators.VectorRefresh]] `batchAdcParts`); before the
  * per-batch request scope ([[graft.streaming.ServeStream]]
  * `serveBatches`), a stream running thousands of batches between
  * stops re-created the r13 block-residency growth on the deployment
  * clock — each batch left one pinned frame behind, and once the
  * storage pool filled every later batch paid LRU eviction writes for
  * earlier batches' garbage. This drives ≥50 micro-batches through
  * the full doubly-compressed serving chain and asserts BOTH
  * properties a long-lived server needs: block-manager residency flat
  * (persistent-RDD count returns to its warm baseline after every
  * batch) and per-batch wall time flat (windowed medians — the lenient
  * bound absorbs box noise; the monotonic growth pathology blows far
  * past it).
  */
class SoakSpec extends SparkSpec {

  test("50 micro-batches of quantized fused serving hold flat residency and flat latency") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = TestSpark.Sf0001
    val curr = graft.operators.CorpusOps.currSnapshot(
      graft.sources.Tables.documents(spark, dir))
    val kwPath = graft.operators.IndexRefresh.refreshedArtifact(spark, dir)
    val vecPath = graft.operators.VectorRefresh.quantizedArtifact(spark, dir)
    graft.operators.VectorRefresh.captureQuantModel(spark, vecPath)
    // current-snapshot-safe query ids, rotated one per micro-batch — the
    // steady-state request-at-a-time serving shape
    val ids = Seq(0L, 7L, 23L, 42L)
    val nBatches = 50
    val times = scala.collection.mutable.ArrayBuffer[Double]()
    val rdds = scala.collection.mutable.ArrayBuffer[Int]()
    var servedRows = 0L
    val input = MemoryStream[Long]
    val q = graft.streaming.ServeStream.quantizedFusedServe(
      input.toDS().toDF("q_id"), spark, kwPath, vecPath, curr,
      graft.operators.HybridSearch.servingTopC(spark, dir)) { (ranked, _) =>
      servedRows += ranked.collect().length
    }
    (0 until nBatches).foreach { i =>
      val t0 = System.nanoTime()
      input.addData(ids(i % ids.size))
      q.processAllAvailable()
      times += (System.nanoTime() - t0) / 1e9
      rdds += spark.sparkContext.getPersistentRDDs.size
    }
    q.stop()
    assert(servedRows > 0, "the soak stream must actually serve results")
    // RESIDENCY: after the warm-up batches (standing views built) the
    // persistent-RDD count must return to its baseline every batch —
    // the per-batch scope drain releases each batch's transient frames
    // before the next batch starts. Pre-fix this grew by ~1 frame per
    // batch (≈45 extra entries by batch 50).
    val baseline = rdds(4)
    assert(rdds.last <= baseline + 2,
      s"block residency grew over the soak: baseline(after batch 5)=$baseline " +
        s"last=${rdds.last} trace=${rdds.mkString(",")}")
    assert(rdds.drop(5).max <= baseline + 3,
      s"residency spiked mid-soak: ${rdds.mkString(",")}")
    // LATENCY: windowed medians, lenient 2.5x bound — monotonic
    // eviction-churn growth compounds far beyond this over 45 batches,
    // while honest box noise stays well inside it
    def median(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
    val early = median(times.slice(5, 15).toSeq)
    val late = median(times.takeRight(10).toSeq)
    assert(late <= early * 2.5 + 0.05,
      f"per-batch latency grew over the soak: early=$early%.3f late=$late%.3f")
  }
}
