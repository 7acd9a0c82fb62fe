package graft

import org.apache.spark.sql.functions._

/** Dev tool: stage-level profile of `stream_quantized_fused_serve`
  * (r13 verdict task #3 — cut the fresh-JVM constant). Times, in one
  * warm JVM: artifact gates, the stride-id collect, the fused plan's
  * analysis, the fused plan's execution (the batch-equivalent work),
  * and three full serve runs — so the stream-vs-batch delta decomposes
  * into named parts instead of a lump.
  */
object QuantServeProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = GraftSession.local(32)
    s.sparkContext.setLogLevel("ERROR")
    try SparkEntry.entry(s).count() catch { case _: Throwable => }
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"QSP $name ${(System.nanoTime() - t0) / 1e9}%.2f"); r
    }
    import graft.operators.{CorpusOps, HybridSearch, IndexRefresh, VectorRefresh}
    val kwPath = t("artifact_kw")(IndexRefresh.refreshedArtifact(s, dir))
    val vecPath = t("artifact_vec")(VectorRefresh.quantizedArtifact(s, dir))
    t("capture_model")(VectorRefresh.captureQuantModel(s, vecPath))
    val curr = CorpusOps.currSnapshot(graft.sources.Tables.documents(s, dir))
    val ids: Seq[Long] = t("ids_collect") {
      import s.implicits._
      VectorRefresh.currSnapshot(graft.sources.Tables.embeddings(s, dir))
        .filter(col("vec_id") % graft.operators.KeywordSearch.BatchStride === 0)
        .select(col("vec_id")).as[Long].collect().toSeq
    }
    val topC = t("serving_topc")(HybridSearch.servingTopC(s, dir))
    def fusedPlan() = {
      val idDf = {
        import s.implicits._
        ids.toDF("q_id")
      }
      graft.operators.HybridSearch.fusedBatchQuantizedSel(
        s, kwPath, vecPath, curr,
        _.join(broadcast(idDf), col("vec_id") === col("q_id"), "semi"),
        _.join(broadcast(idDf), col("doc_id") === col("q_id"), "semi"),
        topC = topC)
    }
    (1 to 2).foreach { i =>
      val df = t(s"fused_construct_$i")(fusedPlan())
      t(s"fused_analyze_$i")(df.queryExecution.executedPlan)
      t(s"fused_execute_$i")(BenchForce.force(df))
    }
    // sub-stage decomposition of the fused chain
    val idDf = { import s.implicits._; ids.toDF("q_id") }
    (1 to 2).foreach { i =>
      val kparts = t(s"sub_kparts_construct_$i")(
        IndexRefresh.batchScoredSel(s, kwPath, curr,
          _.join(broadcast(idDf), col("doc_id") === col("q_id"), "semi"),
          graft.operators.KeywordSearch.BatchTerms, None))
      t(s"sub_kparts_execute_$i")(BenchForce.force(kparts))
      val queries = t(s"sub_queries_construct_$i")(
        VectorRefresh.liveVectors(s, vecPath)
          .join(broadcast(idDf), col("vec_id") === col("q_id"), "semi")
          .select(col("vec_id").as("q_id"), col("embedding").as("q_emb")))
      val (adcs, probed, tbls) = t(s"sub_adcparts_construct_$i")(
        VectorRefresh.batchAdcParts(s, vecPath, queries,
          graft.operators.IvfIndex.NProbe, None))
      t(s"sub_adc_execute_$i")(BenchForce.force(adcs))
      t(s"sub_probed_execute_$i")(BenchForce.force(probed))
      graft.operators.Checkpoints.releaseTransients()
    }
    (1 to 3).foreach { i =>
      t(s"serve_full_$i")(BenchForce.force(
        SparkEntry.queries("stream_quantized_fused_serve")(s, dir)))
      graft.operators.Checkpoints.releaseTransients()
    }
    s.stop()
  }
}
