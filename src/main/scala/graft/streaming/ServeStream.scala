package graft.streaming

import graft.functions.VectorFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Micro-batch vector serving — the Spark-native answer to "online ANN
  * serving doesn't fit Spark": queries arrive as a STREAM (request log /
  * queue), the corpus is the static side, and each micro-batch scores
  * its whole query batch in one corpus pass (the same amortized shape as
  * [[graft.operators.VectorSearch.batchTopK]]). Latency is micro-batch
  * latency, not per-request — the right Spark trade for backfills,
  * re-ranking queues, and near-line serving; true msec-path serving
  * belongs to a point-lookup system fed by this pipeline's indexes.
  *
  * The per-query top-k runs through the bounded
  * [[org.apache.spark.sql.graftshim.TopKByScore]] aggregate —
  * a TypedImperativeAggregate with merge support, so it is legal as a
  * STREAMING aggregation (partial heaps merge across micro-batches in
  * the state store; output mode `complete`/`update`).
  */
object ServeStream {

  /** The shared serving micro-batch skeleton: distinct non-null q_ids
    * (kept a distributed frame — the rank functions broadcast-semi-join
    * it, so a burst batch never collects to the driver), rank, sink —
    * with the WHOLE body inside a request scope
    * ([[graft.operators.Checkpoints.withRequestScope]]). Every
    * transient checkpoint a batch's plan construction registers (the
    * quantized probe's bounded query frame, a fusion's materialized
    * candidate cut) is fully consumed when its sink returns, so the
    * scope drains it at the BATCH boundary: a serving stream running
    * thousands of micro-batches between stops holds a bounded number
    * of frames at any instant instead of accumulating one per batch
    * until `q.stop()` (the r13 session-state growth mechanism on the
    * deployment clock — SoakSpec pins flat residency over ≥50
    * batches). Scoping (not the global registry) also means a serve
    * stream interleaved with a batch query in the same JVM can never
    * release the other's live frames.
    */
  private def serveBatches(queryIds: DataFrame)
      (rank: DataFrame => DataFrame)
      (sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery =
    queryIds.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        graft.operators.Checkpoints.withRequestScope {
          val ids = batch.select(col("q_id")).na.drop().distinct()
          if (!batch.isEmpty) sink(rank(ids), batchId)
        }
      }
      .start()

  /** Driver query: one micro-batch of hybrid serving under the DuckDB
    * oracle gate. The benchmark query-id set arrives as a memory STREAM,
    * [[hybridServe]] runs its foreachBatch fusion, and the sink's frame
    * is returned — because fused scores are batch-split invariant, a
    * single batch containing the stride queries must hash-match the
    * BATCH fusion's oracle ([[graft.operators.HybridSearch.batchSearchOracle]]).
    */
  def qStreamHybridServe(s: org.apache.spark.sql.SparkSession,
                         dir: String): DataFrame = {
    val docs = graft.sources.Tables.documents(s, dir)
    val embs = graft.sources.Tables.embeddings(s, dir)
    collectServed(s, strideIds(s, dir)) { (queryIds, sink) =>
      hybridServe(queryIds, docs, embs, graft.operators.HybridSearch.BatchK,
        kwIndex = Some(graft.operators.KeywordSearch.cachedBatchPostings(s, dir)),
        kwDict = Some(graft.operators.KeywordSearch.cachedTermDict(s, dir)),
        kwStats = Some(graft.operators.KeywordSearch.cachedCorpusStats(s, dir)))(sink)
    }
  }

  /** Driver query: one micro-batch of KEYWORD serving ([[bm25Serve]],
    * 40f) probing the standing batch postings; a single batch holding
    * the stride queries must hash-match the batch BM25 oracle
    * ([[graft.operators.KeywordSearch.batchSearchOracle]]).
    */
  def qStreamBm25Serve(s: org.apache.spark.sql.SparkSession,
                       dir: String): DataFrame =
    collectServed(s, docStrideIds(s, dir)) { (queryIds, sink) =>
      bm25Serve(queryIds, graft.sources.Tables.documents(s, dir),
        graft.operators.KeywordSearch.BatchK,
        index = Some(graft.operators.KeywordSearch.cachedBatchPostings(s, dir)),
        dict = Some(graft.operators.KeywordSearch.cachedTermDict(s, dir)),
        corpusStats = Some(graft.operators.KeywordSearch.cachedCorpusStats(s, dir)))(sink)
    }

  /** Driver query: one micro-batch of CHAMPION-PRUNED keyword serving
    * ([[championServe]]) probing the standing postings + champion
    * artifacts; a single batch holding the stride queries must
    * hash-match the pruned batch oracle
    * ([[graft.operators.ChampionIndex.batchPrunedOracle]]).
    */
  def qStreamChampionServe(s: org.apache.spark.sql.SparkSession,
                           dir: String): DataFrame =
    collectServed(s, docStrideIds(s, dir)) { (queryIds, sink) =>
      championServe(queryIds, graft.sources.Tables.documents(s, dir),
        graft.operators.KeywordSearch.BatchK,
        graft.operators.KeywordSearch.cachedBatchPostings(s, dir),
        graft.operators.ChampionIndex.cachedChampions(s, dir),
        dict = Some(graft.operators.KeywordSearch.cachedTermDict(s, dir)))(sink)
    }

  /** Driver query: one micro-batch of CHAMPION-PRUNED query-likelihood
    * serving ([[qlChampionServe]]) probing the standing postings + QL
    * champion artifacts; a single batch holding the stride queries must
    * hash-match the pruned batch QL oracle
    * ([[graft.operators.QueryLikelihood.qBatchSearchPrunedOracle]]).
    */
  def qStreamQlChampionServe(s: org.apache.spark.sql.SparkSession,
                             dir: String): DataFrame =
    collectServed(s, docStrideIds(s, dir)) { (queryIds, sink) =>
      qlChampionServe(queryIds, graft.sources.Tables.documents(s, dir),
        graft.operators.KeywordSearch.BatchK,
        graft.operators.KeywordSearch.cachedBatchPostings(s, dir),
        graft.operators.QueryLikelihood.cachedQlChampions(s, dir),
        dict = Some(graft.operators.KeywordSearch.cachedTermDict(s, dir)),
        shortest = Some(graft.operators.QueryLikelihood.cachedShortest(s, dir)))(sink)
    }

  /** Driver query: one micro-batch of keyword serving over the
    * REFRESHED index ([[refreshServe]]) — the full deployment loop in
    * one gate: the LSM artifact ([[graft.operators.IndexRefresh]],
    * base + delta refresh) serves a micro-batch query stream through
    * its champion views; a single batch holding the current-snapshot
    * stride queries must hash-match the full-rebuild batch oracle
    * ([[graft.operators.IndexRefresh.refreshBatchSearchOracle]]).
    */
  def qStreamKwRefreshServe(s: org.apache.spark.sql.SparkSession,
                            dir: String): DataFrame = {
    import graft.operators.{CorpusOps, IndexRefresh}
    val curr = CorpusOps.currSnapshot(graft.sources.Tables.documents(s, dir))
    val path = IndexRefresh.refreshedArtifact(s, dir)
    val ids = strideIdMemo.computeIfAbsent(s"doccurr:$dir", { _ =>
      import s.implicits._
      curr.filter(col("doc_id") % graft.operators.KeywordSearch.BatchStride === 0)
        .select(col("doc_id")).as[Long].collect().toSeq
    })
    collectServed(s, ids) { (queryIds, sink) =>
      refreshServe(queryIds, s, path, curr)(sink)
    }
  }

  /** Driver query: one micro-batch of Dirichlet-QL serving over the
    * REFRESHED index — the LM family's serving stream against the same
    * LSM artifact as [[qStreamKwRefreshServe]]; a single batch holding
    * the current-snapshot stride queries must hash-match the
    * full-rebuild QL oracle
    * ([[graft.operators.IndexRefresh.refreshQlSearchOracle]]).
    */
  def qStreamQlRefreshServe(s: org.apache.spark.sql.SparkSession,
                            dir: String): DataFrame = {
    import graft.operators.{CorpusOps, IndexRefresh}
    val curr = CorpusOps.currSnapshot(graft.sources.Tables.documents(s, dir))
    val path = IndexRefresh.refreshedArtifact(s, dir)
    val ids = strideIdMemo.computeIfAbsent(s"doccurr:$dir", { _ =>
      import s.implicits._
      curr.filter(col("doc_id") % graft.operators.KeywordSearch.BatchStride === 0)
        .select(col("doc_id")).as[Long].collect().toSeq
    })
    collectServed(s, ids) { (queryIds, sink) =>
      qlRefreshServe(queryIds, s, path, curr)(sink)
    }
  }

  /** Micro-batch Dirichlet-QL serving over the REFRESHED index —
    * [[refreshServe]]'s LM twin via
    * [[graft.operators.IndexRefresh.qlBatchSearchSel]]: probe-time
    * impacts from the merged dictionary's cf and the exact Σdl, the
    * k+1-shortest LIVE-docs closure; all score inputs are global
    * artifacts ⇒ batch-split invariant by construction.
    */
  def qlRefreshServe(queryIds: DataFrame, spark: org.apache.spark.sql.SparkSession,
                     path: String, docs: DataFrame)
                    (sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery =
    serveBatches(queryIds)(ids =>
      graft.operators.IndexRefresh.qlBatchSearchSel(
        spark, path, docs,
        _.join(broadcast(ids), col("doc_id") === col("q_id"), "semi")))(sink)

  /** Micro-batch keyword serving over the REFRESHED index — the LSM
    * layout's serving parity with [[championServe]]: each batch's
    * queries probe the refreshed artifact's champion views
    * ([[graft.operators.IndexRefresh.batchSearchSel]] — bucket-pruned
    * dict/champion reads, terms·M candidates per query), scored from
    * the exactly-merged statistics. All score inputs are global
    * artifacts ⇒ batch-split invariant by construction.
    */
  def refreshServe(queryIds: DataFrame, spark: org.apache.spark.sql.SparkSession,
                   path: String, docs: DataFrame)
                  (sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery =
    serveBatches(queryIds)(ids =>
      graft.operators.IndexRefresh.batchSearchSel(
        spark, path, docs,
        _.join(broadcast(ids), col("doc_id") === col("q_id"), "semi")))(sink)

  /** Driver query: one micro-batch of IVF-PRUNED hybrid serving
    * ([[hybridServeIvf]], 40h) probing the standing centroid + postings
    * artifacts; must hash-match the batch IVF fusion oracle
    * ([[graft.operators.HybridSearch.batchSearchIvfOracle]]).
    */
  def qStreamHybridIvfServe(s: org.apache.spark.sql.SparkSession,
                            dir: String): DataFrame = {
    val docs = graft.sources.Tables.documents(s, dir)
    val embs = graft.sources.Tables.embeddings(s, dir)
    collectServed(s, strideIds(s, dir)) { (queryIds, sink) =>
      hybridServeIvf(queryIds, docs, embs,
        graft.operators.IvfIndex.NProbe, graft.operators.HybridSearch.BatchK,
        centroids = Some(graft.operators.IvfIndex.cachedCentroids(s, dir)),
        kwIndex = Some(graft.operators.KeywordSearch.cachedBatchPostings(s, dir)),
        kwDict = Some(graft.operators.KeywordSearch.cachedTermDict(s, dir)),
        kwStats = Some(graft.operators.KeywordSearch.cachedCorpusStats(s, dir)))(sink)
    }
  }

  /** Driver query: one micro-batch of PLAIN (brute-force) vector serving
    * ([[vectorServe]], 40a) — the non-indexed serving baseline: each
    * micro-batch's queries score the whole corpus in one pass. A single
    * batch holding the stride queries must hash-match the batch
    * multi-query search oracle
    * ([[graft.operators.VectorSearch.batchSearchOracle]]).
    */
  def qStreamVectorServe(s: org.apache.spark.sql.SparkSession,
                         dir: String): DataFrame = {
    val embs = graft.sources.Tables.embeddings(s, dir)
    collectServed(s, strideIds(s, dir, graft.operators.VectorSearch.BatchStride),
      idCol = "vec_id") { (queryIds, sink) =>
      vectorServe(queryIds, embs, graft.operators.VectorSearch.BatchK)(sink)
    }
  }

  /** Driver query: one micro-batch of IVF-pruned VECTOR serving
    * ([[vectorServeIvf]], 40h) probing the standing centroid table;
    * must hash-match the batch IVF search oracle
    * ([[graft.operators.IvfIndex.qBatchSearchOracle]]). Output id
    * column is `vec_id` (the vector twin's shape).
    */
  def qStreamVectorIvfServe(s: org.apache.spark.sql.SparkSession,
                            dir: String): DataFrame = {
    val embs = graft.sources.Tables.embeddings(s, dir)
    collectServed(s, strideIds(s, dir, graft.operators.VectorSearch.BatchStride),
      idCol = "vec_id") { (queryIds, sink) =>
      vectorServeIvf(queryIds, embs, graft.operators.IvfIndex.NProbe,
        graft.operators.VectorSearch.BatchK,
        centroids = Some(graft.operators.IvfIndex.cachedCentroids(s, dir)))(sink)
    }
  }

  /** Micro-batch GROUPED vector serving — the streaming leg of 17g's
    * batch twin ([[graft.operators.IvfIndex.batchSearchGrouped]]): each
    * micro-batch's queries walk their nprobe IVF cells and the grouped
    * post-stage (per-(q_id, source) bounded heaps + per-query group
    * ranking) runs over that candidate stream. Scores, cell assignment
    * and group membership depend only on (query, standing centroids,
    * corpus) ⇒ batch-split invariant (spec-pinned).
    */
  def groupedServe(queryIds: DataFrame, embs: DataFrame, docs: DataFrame,
                   groups: Int = graft.operators.VectorSearch.GroupsLimit,
                   perGroup: Int = graft.operators.VectorSearch.ObjectsPerGroup,
                   nprobe: Int = graft.operators.IvfIndex.NProbe,
                   centroids: Option[DataFrame] = None)
                  (sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery =
    serveBatches(queryIds)(ids =>
      graft.operators.IvfIndex.batchSearchGrouped(
        embs, docs, _.join(broadcast(ids), col("vec_id") === col("q_id"), "semi"),
        groups, perGroup, nprobe, centroids))(sink)

  /** Micro-batch AUTOCUT vector serving — each batch's queries get
    * their probe-limited top-C page and the per-query gap/jump cut
    * ([[graft.operators.IvfIndex.batchSearchAutocut]]). A query's cut
    * depends only on its own page ⇒ batch-split invariant.
    */
  def autocutServe(queryIds: DataFrame, embs: DataFrame,
                   candidates: Int = graft.operators.VectorSearch.AutocutCandidates,
                   jumps: Int = graft.operators.VectorSearch.AutocutJumps,
                   nprobe: Int = graft.operators.IvfIndex.NProbe,
                   centroids: Option[DataFrame] = None)
                  (sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery =
    serveBatches(queryIds)(ids =>
      graft.operators.IvfIndex.batchSearchAutocut(
        embs, _.join(broadcast(ids), col("vec_id") === col("q_id"), "semi"),
        candidates, jumps, nprobe, centroids))(sink)

  /** Driver query: one micro-batch of GROUPED vector serving probing
    * the standing centroid artifact; a single batch holding the stride
    * queries must hash-match the batch grouped oracle
    * ([[graft.operators.IvfIndex.qBatchSearchGroupedOracle]]).
    */
  def qStreamGroupedServe(s: org.apache.spark.sql.SparkSession,
                          dir: String): DataFrame = {
    val embs = graft.sources.Tables.embeddings(s, dir)
    val docs = graft.sources.Tables.documents(s, dir)
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("q_id", LongType), StructField("source", StringType),
      StructField("best_score", DoubleType), StructField("rn", IntegerType),
      StructField("vec_id", LongType), StructField("score", DoubleType)))
    collectServed(s, strideIds(s, dir, graft.operators.VectorSearch.BatchStride),
      schema = schema,
      orderCols = Seq(asc("q_id"), desc("best_score"), asc("source"), asc("rn"))) {
      (queryIds, sink) =>
        groupedServe(queryIds, embs, docs,
          centroids = Some(graft.operators.IvfIndex.cachedCentroids(s, dir)))(sink)
    }
  }

  /** Driver query: one micro-batch of AUTOCUT vector serving probing
    * the standing centroid artifact; must hash-match the batch autocut
    * oracle ([[graft.operators.IvfIndex.qBatchSearchAutocutOracle]]).
    */
  def qStreamAutocutServe(s: org.apache.spark.sql.SparkSession,
                          dir: String): DataFrame = {
    val embs = graft.sources.Tables.embeddings(s, dir)
    collectServed(s, strideIds(s, dir, graft.operators.VectorSearch.BatchStride),
      idCol = "vec_id") { (queryIds, sink) =>
      autocutServe(queryIds, embs,
        centroids = Some(graft.operators.IvfIndex.cachedCentroids(s, dir)))(sink)
    }
  }

  /** The benchmark query-id set: a bounded driver-side list by
    * construction — the serving plan itself keeps the id set distributed
    * via the broadcast semi-join.
    */
  /** Driver query: one micro-batch of DOUBLY-COMPRESSED hybrid serving
    * ([[quantizedFusedServe]]) — the quantized fusion 15i as a serving
    * stream: the batch's queries fuse the ADC fan-out over the
    * standing PQ codes with the refreshed champion keyword probe; a
    * single batch holding the current-snapshot stride queries must
    * hash-match the literal-codebook fusion oracle
    * ([[graft.operators.HybridSearch.batchSearchQuantizedFusedOracle]]).
    */
  def qStreamQuantizedFusedServe(s: org.apache.spark.sql.SparkSession,
                                 dir: String): DataFrame = {
    import graft.operators.{CorpusOps, HybridSearch, IndexRefresh, VectorRefresh}
    val curr = CorpusOps.currSnapshot(graft.sources.Tables.documents(s, dir))
    val kwPath = IndexRefresh.refreshedArtifact(s, dir)
    val vecPath = VectorRefresh.quantizedArtifact(s, dir)
    VectorRefresh.captureQuantModel(s, vecPath)
    val ids = strideIdMemo.computeIfAbsent(s"embcurr:$dir", { _ =>
      import s.implicits._
      VectorRefresh.currSnapshot(graft.sources.Tables.embeddings(s, dir))
        .filter(col("vec_id") % graft.operators.KeywordSearch.BatchStride === 0)
        .select(col("vec_id")).as[Long].collect().toSeq
    })
    collectServed(s, ids) { (queryIds, sink) =>
      quantizedFusedServe(queryIds, s, kwPath, vecPath, curr,
        HybridSearch.servingTopC(s, dir))(sink)
    }
  }

  /** Micro-batch doubly-compressed hybrid serving — the quantized
    * fusion via [[graft.operators.HybridSearch.fusedBatchQuantizedSel]]:
    * every score input is a standing artifact (codes, codebook, merged
    * centroids, champion views, merged stats) ⇒ batch-split invariant
    * by construction.
    */
  def quantizedFusedServe(queryIds: DataFrame,
                          spark: org.apache.spark.sql.SparkSession,
                          kwPath: String, vecPath: String, docs: DataFrame,
                          topC: Option[Int])
                         (sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery =
    serveBatches(queryIds)(ids =>
      graft.operators.HybridSearch.fusedBatchQuantizedSel(
        spark, kwPath, vecPath, docs,
        _.join(broadcast(ids), col("vec_id") === col("q_id"), "semi"),
        _.join(broadcast(ids), col("doc_id") === col("q_id"), "semi"),
        topC = topC))(sink)

  // The benchmark query-id sets are STANDING workload definitions per
  // source dir (the IndexCache convention): collect once per JVM, not
  // once per serve run — each collect was a full table scan paid by
  // every timed run of every stream twin.
  private val strideIdMemo = new java.util.concurrent.ConcurrentHashMap[
    String, Seq[Long]]()

  private def strideIds(s: org.apache.spark.sql.SparkSession, dir: String,
                        stride: Int = graft.operators.KeywordSearch.BatchStride): Seq[Long] =
    strideIdMemo.computeIfAbsent(s"emb:$dir:$stride", { _ =>
      import s.implicits._
      graft.sources.Tables.embeddings(s, dir)
        .filter(col("vec_id") % stride === 0)
        .select(col("vec_id")).as[Long].collect().toSeq
    })

  /** The KEYWORD twins' benchmark query-id set: the batch BM25 forms
    * stride over DOCUMENTS (`doc_id % stride`,
    * [[graft.operators.KeywordSearch.batchSearch]]), and the corpora are
    * not 1:1 at every SF (sf0.1: 5000 documents, 2000 embeddings — the
    * recorded invariant), so the keyword serving twins must draw their
    * stream from the same universe or they serve a SUBSET of the batch
    * oracle's queries (caught by the sf0.1 gate this round: 100 vs 250
    * rows).
    */
  private def docStrideIds(s: org.apache.spark.sql.SparkSession, dir: String,
                           stride: Int = graft.operators.KeywordSearch.BatchStride): Seq[Long] =
    strideIdMemo.computeIfAbsent(s"doc:$dir:$stride", { _ =>
      import s.implicits._
      graft.sources.Tables.documents(s, dir)
        .filter(col("doc_id") % stride === 0)
        .select(col("doc_id")).as[Long].collect().toSeq
    })

  /** Shared driver-gate harness: feed `ids` through a memory stream into
    * a serving twin, accumulate every micro-batch's (q_id, rn, doc_id,
    * score) rows, return them as one frame. Rows ACCUMULATE across
    * micro-batches: a single addData yields one batch today, but the
    * harness must not silently drop batches if the ids ever split
    * (batch-split invariance is the property under test).
    */
  private def collectServed(s: org.apache.spark.sql.SparkSession, ids: Seq[Long],
                            idCol: String = "doc_id",
                            schema: org.apache.spark.sql.types.StructType = null,
                            orderCols: Seq[org.apache.spark.sql.Column] = null)
      (start: (DataFrame, (DataFrame, Long) => Unit) =>
        org.apache.spark.sql.streaming.StreamingQuery): DataFrame = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val input = MemoryStream[Long]
    val holder = new java.util.concurrent.atomic.AtomicReference[Array[org.apache.spark.sql.Row]](Array.empty)
    val q = start(input.toDF().select(col("value").as("q_id")),
      (ranked, _) => { val b = ranked.collect(); holder.updateAndGet(prev => prev ++ b); () })
    input.addData(ids: _*)
    q.processAllAvailable(); q.stop()
    // per-batch transients drain INSIDE [[serveBatches]]' request scope
    // (the micro-batch boundary — the deployment-shape fix); this
    // global drain remains as the backstop for anything the HARNESS
    // thread registered while preparing the run (standing-view builds,
    // workload-id derivation)
    graft.operators.Checkpoints.releaseTransients()
    val outSchema = Option(schema).getOrElse(
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("q_id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("rn", org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField(idCol, org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("score", org.apache.spark.sql.types.DoubleType))))
    val ordered = Option(orderCols).getOrElse(Seq(col("q_id"), col("rn")))
    s.createDataFrame(java.util.Arrays.asList(holder.get(): _*), outSchema)
      .orderBy(ordered: _*)
  }

  /** queries(q_id, q_emb) stream × corpus(vec_id, embedding) static →
    * per-query bounded top-k, continuously updated.
    */
  def topKPerQuery(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame =
    queries
      .join(corpus, col("vec_id") =!= col("q_id")) // stream-static join
      .select(col("q_id"),
        cosineSim(col("embedding"), col("q_emb")).as("score"), col("vec_id"))
      .groupBy("q_id")
      .agg(topKByScore(col("score"), col("vec_id"), k).as("top"))

  /** PLAIN micro-batch vector serving — the brute-force twin of
    * [[vectorServeIvf]]: each micro-batch's query set scores the whole
    * static corpus in ONE pass ([[graft.operators.VectorSearch.batchTopKSel]],
    * bounded-heap per-query top-k), amortizing the scan over the batch.
    * Exact (no pruning), so it is both the correctness baseline for the
    * IVF twin and the right shape when recall must be 1.0. Scores depend
    * only on (query, corpus), so results are batch-split invariant.
    */
  def vectorServe(queryIds: DataFrame, embs: DataFrame, k: Int)
                 (sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery =
    serveBatches(queryIds)(ids =>
      graft.operators.VectorSearch.batchTopKSel(
        embs, _.join(broadcast(ids), col("vec_id") === col("q_id"), "semi"), k))(sink)

  /** INDEX-ACCELERATED micro-batch vector serving — the continuously-
    * running path must not brute-force the corpus per query: each
    * micro-batch's queries are assigned their nprobe IVF cells and only
    * those cells' vectors are scanned
    * ([[graft.operators.IvfIndex.batchSearchIvf]]). Cell assignment and
    * global centroids are batch-split invariant, so a query's result is
    * identical whichever micro-batch it arrives in.
    */
  def vectorServeIvf(queryIds: DataFrame, embs: DataFrame, nprobe: Int,
                     k: Int, centroids: Option[DataFrame] = None)
                    (sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery =
    serveBatches(queryIds)(ids =>
      graft.operators.IvfIndex.batchSearchIvf(
        embs, _.join(broadcast(ids), col("vec_id") === col("q_id"), "semi"),
        nprobe, k, centroids))(sink)

  /** INDEX-ACCELERATED micro-batch hybrid serving — [[hybridServe]] with
    * the vector leg pruned to each query's nprobe cells and the keyword
    * leg restricted to the same candidate set
    * ([[graft.operators.HybridSearch.fusedBatchIvfSel]]).
    */
  def hybridServeIvf(queryIds: DataFrame, docs: DataFrame, embs: DataFrame,
                     nprobe: Int, k: Int,
                     centroids: Option[DataFrame] = None,
                     kwIndex: Option[DataFrame] = None,
                     kwDict: Option[DataFrame] = None,
                     kwStats: Option[DataFrame] = None)
                    (sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery =
    serveBatches(queryIds)(ids =>
      graft.operators.HybridSearch.fusedBatchIvfSel(
        docs, embs,
        _.join(broadcast(ids), col("vec_id") === col("q_id"), "semi"),
        _.join(broadcast(ids), col("doc_id") === col("q_id"), "semi"),
        nprobe = nprobe, k = k,
        centroids = centroids, kwIndex = kwIndex,
        kwDict = kwDict, kwStats = kwStats))(sink)

  /** Micro-batch KEYWORD serving — the streaming twin of
    * [[graft.operators.KeywordSearch.bm25Batch]]. BM25 is a multi-stage
    * plan (postings build, query-term df, per-pair reduce, per-query
    * heap), which a single streaming aggregation can't express — so each
    * micro-batch runs the FULL batch plan over its query set via
    * `foreachBatch`, the Structured Streaming idiom for per-batch
    * multi-stage computation. Corpus statistics are global (static
    * side), so a query's scores are identical whichever micro-batch it
    * arrives in — spec-verified against the batch run. `batchId` gives
    * the sink exactly-once replay semantics; at scale the static
    * postings side is the MATERIALIZED index
    * ([[graft.operators.KeywordIndex]]), not a per-batch rebuild.
    */
  def bm25Serve(queryIds: DataFrame, docs: DataFrame, k: Int,
                index: Option[DataFrame] = None,
                dict: Option[DataFrame] = None,
                corpusStats: Option[DataFrame] = None)
               (sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery =
    serveBatches(queryIds)(ids =>
      graft.operators.KeywordSearch.bm25BatchSel(
        docs, _.join(broadcast(ids), col("doc_id") === col("q_id"), "semi"),
        k = k, index = index, dict = dict, corpusStats = corpusStats))(sink)

  /** Micro-batch CHAMPION-PRUNED keyword serving — the at-scale twin of
    * [[bm25Serve]]: each batch's queries probe the standing champion
    * artifact ([[graft.operators.ChampionIndex]]) instead of the full
    * postings, so the per-batch scoring cost is bounded by
    * queries × nTerms × M regardless of corpus size. Impacts are global
    * index constants ⇒ a query's scores are identical whichever
    * micro-batch it arrives in (batch-split invariant by construction).
    */
  def championServe(queryIds: DataFrame, docs: DataFrame, k: Int,
                    postings: DataFrame, champs: DataFrame,
                    dict: Option[DataFrame] = None)
                   (sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery =
    serveBatches(queryIds)(ids =>
      graft.operators.ChampionIndex.bm25BatchPrunedSel(
        docs, postings, champs,
        _.join(broadcast(ids), col("doc_id") === col("q_id"), "semi"), k = k,
        dict = dict))(sink)

  /** Micro-batch CHAMPION-PRUNED query-likelihood serving — the LM
    * scoring family's serving parity with [[championServe]]: each
    * batch's queries probe the standing QL champion artifact
    * ([[graft.operators.QueryLikelihood.cachedQlChampions]] — per-term
    * top-M postings by the query-independent QL impact, dl riding
    * along) plus the k+1-shortest closure, so per-batch cost is
    * queries × nTerms × M + (k+1) regardless of corpus size. Impacts,
    * collection LM constants, and the closure are all global index
    * artifacts ⇒ batch-split invariant by construction.
    */
  def qlChampionServe(queryIds: DataFrame, docs: DataFrame, k: Int,
                      postings: DataFrame, qchamps: DataFrame,
                      dict: Option[DataFrame] = None,
                      shortest: Option[DataFrame] = None)
                     (sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery =
    serveBatches(queryIds)(ids =>
      graft.operators.QueryLikelihood.qlBatchPrunedSel(
        docs, postings, qchamps,
        _.join(broadcast(ids), col("doc_id") === col("q_id"), "semi"), k = k,
        dict = dict, shortest = shortest))(sink)

  /** Micro-batch HYBRID serving — the alpha-fused twin of [[bm25Serve]]:
    * both signals fan out over the micro-batch's query set (vector side
    * one corpus pass, keyword side one postings pass), per-query min-max
    * normalization and fusion run inside the batch plan. Per-query
    * normalization stats + global corpus stats ⇒ fused scores are
    * batch-split invariant (spec-verified against the batch fusion).
    */
  def hybridServe(queryIds: DataFrame, docs: DataFrame, embs: DataFrame,
                  k: Int, kwIndex: Option[DataFrame] = None,
                  kwDict: Option[DataFrame] = None,
                  kwStats: Option[DataFrame] = None)
                 (sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery =
    serveBatches(queryIds)(ids =>
      graft.operators.HybridSearch.fusedBatchSel(
        docs, embs,
        _.join(broadcast(ids), col("vec_id") === col("q_id"), "semi"),
        _.join(broadcast(ids), col("doc_id") === col("q_id"), "semi"),
        k = k, kwIndex = kwIndex, kwDict = kwDict, kwStats = kwStats))(sink)
}
