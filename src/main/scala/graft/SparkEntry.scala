package graft

import graft.operators._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §2 for the operator
  * inventory each entry maps to.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary" -> (Relational.q1PricingSummary _),
    "q3_top_orders" -> (Relational.q3TopOrders _),
    "q5_region_revenue" -> (Relational.q5RegionRevenue _),
    "q6_forecast_revenue" -> (Relational.q6ForecastRevenue _),
    "q_window_top_orders" -> (Relational.windowTopOrders _),
    "q_sql_passthrough" -> (Relational.qSqlPassthrough _),
    "q_events_hourly" -> (Events.hourly _),
    "q_events_sessionize" -> (Events.sessionize _),
    "q_events_asof" -> (Events.asofLastPurchase _),
    "q_events_range_join" -> (RangeJoin.query _),
    "corpus_mix" -> (CorpusOps.qMix _),
    "pipeline_clean_pack" -> (Pipeline.cleanPack _),
    "corpus_quantiles" -> (CorpusOps.qQuantiles _),
    "corpus_split" -> (CorpusOps.qSplit _),
    "kw_search_bm25" -> (KeywordSearch.search _),
    "filter_search_exact" -> (KeywordSearch.searchFilterExact _),
    "filter_search_fuzzy" -> (KeywordSearch.searchFilterFuzzy _),
    "doc_count" -> (KeywordSearch.docCount _),
    "kw_index_dictionary" -> (KeywordIndex.qDictionary _),
    "kw_search_indexed" -> (KeywordIndex.qSearchIndexed _),
    "vector_search_topk" -> (VectorSearch.search _),
    "vector_search_batch" -> (VectorSearch.batchSearch _),
    "vector_search_quantized" -> (VectorSearch.searchQuantized _),
    "e2e_chunk_embed_search" -> (Embedder.query _),
    "prompt_assembly" -> (PromptAssembly.query _),
    "search_render" -> (SearchRender.query _),
    "hybrid_search" -> (HybridSearch.search _),
    "hybrid_search_filtered" -> (HybridSearch.searchFiltered _),
    "vector_search_filtered" -> (VectorSearch.searchFiltered _),
    "rerank_overlap" -> (Reranker.search _),
    "context_prune" -> (ContextPruner.search _),
    "chunk_documents" -> (Chunker.query _),
    "ingest_meta_join" -> (Ingest.query _),
    "text_token_count" -> (TextAnalysis.qTokenCounts _),
    "text_quality" -> (TextAnalysis.qQuality _),
    "text_langid" -> (TextAnalysis.qLangId _),
    "text_fingerprint" -> (TextAnalysis.qFingerprints _),
    "text_lm_score" -> (TextAnalysis.qLmScore _),
    "text_redact" -> (TextAnalysis.qRedact _),
    "text_repetition" -> (TextAnalysis.qRepetition _),
    "corpus_stats" -> (TextAnalysis.qCorpusStats _),
    "corpus_vocab" -> (TextAnalysis.qVocab _),
    "corpus_sample" -> (TextAnalysis.qSample _),
    "dedup_exact" -> (Dedup.qExact _),
    "decontaminate" -> (Dedup.qDecontaminate _),
    "decontaminate_bloom" -> (Dedup.qDecontaminateBloom _),
    "corpus_pack" -> (Chunker.qPack _),
    "dedup_minhash_lsh" -> (Dedup.qMinhashLsh _),
    "dedup_clusters" -> (DedupClusters.query _),
    "dedup_incremental" -> (Dedup.qIncremental _),
    "dedup_simhash" -> (Dedup.qSimhash _),
    "dedup_simhash_pairs" -> ((s, d) => Dedup.simhashPairs(graft.sources.Tables.documents(s, d))),
    "q_events_json" -> (Events.jsonExtract _),
    "dedup_ngram_jaccard" -> (Dedup.qNgramJaccard _),
    "dedup_embedding" -> (Dedup.qEmbeddingNearDup _),
    "dedup_embedding_lsh" -> (Dedup.qEmbeddingNearDupLsh _),
    "lsh_bucket_stats" -> (Dedup.qLshBucketStats _),
    "ivf_build_centroids" -> (IvfIndex.qBuild _),
    "ivf_search" -> (IvfIndex.qSearch _),
    "eval_retrieval" -> (RetrievalEval.query _),
    "eval_ndcg" -> (RetrievalEval.queryNdcg _),
    "eval_answer_cases" -> (AnswerEval.queryCases _),
    "eval_answer_poll" -> (AnswerEval.queryPoll _),
    "finetune_triplets" -> (FinetuneData.query _),
    "multimodal_meta" -> (Multimodal.qMeta _),
    // materialized-index searches: oracle-checked — the partition-pruned
    // on-disk path must reproduce the inline search's result exactly
    "ivf_search_materialized" -> (IvfIndex.qSearchMaterialized _),
    "kw_search_materialized" -> (KeywordIndex.qSearchMaterialized _),
    // rows-only checks (no SQL oracle — k-means codebooks and binary
    // transforms aren't SQL-expressible; the spec suite carries their
    // equivalence proofs)
    "pq_adc_search" -> (ProductQuantizer.qAdcSearch _),
    "ivf_pq_search" -> (ProductQuantizer.qIvfAdcSearch _),
    "multimodal_resize" -> (Multimodal.qResize _)
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "q1_pricing_summary" -> Relational.q1Oracle,
    "q3_top_orders" -> Relational.q3Oracle,
    "q5_region_revenue" -> Relational.q5Oracle,
    "q6_forecast_revenue" -> Relational.q6Oracle,
    "q_window_top_orders" -> Relational.windowTopOrdersOracle,
    "q_sql_passthrough" -> Relational.sqlPassthrough,
    "q_events_hourly" -> Events.hourlyOracle,
    "q_events_sessionize" -> Events.sessionizeOracle,
    "q_events_asof" -> Events.asofOracle,
    "q_events_range_join" -> RangeJoin.oracle,
    "corpus_mix" -> CorpusOps.mixOracle(),
    "pipeline_clean_pack" -> Pipeline.oracle,
    "corpus_quantiles" -> CorpusOps.quantilesOracle,
    "corpus_split" -> CorpusOps.splitOracle,
    "kw_search_bm25" -> KeywordSearch.searchOracle,
    "filter_search_exact" -> KeywordSearch.searchFilterExactOracle,
    "filter_search_fuzzy" -> KeywordSearch.searchFilterFuzzyOracle,
    "doc_count" -> KeywordSearch.docCountOracle,
    "kw_index_dictionary" -> KeywordIndex.dictionaryOracle,
    "kw_search_indexed" -> KeywordIndex.searchIndexedOracle,
    "kw_search_materialized" -> KeywordIndex.searchIndexedOracle,
    "ivf_search_materialized" -> IvfIndex.qSearchMaterializedOracle,
    "vector_search_topk" -> VectorSearch.searchOracle,
    "vector_search_batch" -> VectorSearch.batchSearchOracle,
    "vector_search_quantized" -> VectorSearch.searchQuantizedOracle,
    "e2e_chunk_embed_search" -> Embedder.chunkEmbedSearchOracle,
    "prompt_assembly" -> PromptAssembly.oracle,
    "search_render" -> SearchRender.oracle,
    "hybrid_search" -> HybridSearch.searchOracle,
    "hybrid_search_filtered" -> HybridSearch.searchFilteredOracle,
    "vector_search_filtered" -> VectorSearch.searchFilteredOracle,
    "rerank_overlap" -> Reranker.searchOracle,
    "context_prune" -> ContextPruner.searchOracle,
    "chunk_documents" -> Chunker.oracle,
    "ingest_meta_join" -> Ingest.oracle,
    "text_token_count" -> TextAnalysis.tokenCountsOracle,
    "text_quality" -> TextAnalysis.qualityOracle,
    "text_langid" -> TextAnalysis.langIdOracle,
    "text_fingerprint" -> TextAnalysis.fingerprintsOracle,
    "text_lm_score" -> TextAnalysis.lmScoreOracle,
    "text_redact" -> TextAnalysis.redactOracle,
    "text_repetition" -> TextAnalysis.repetitionOracle,
    "corpus_stats" -> TextAnalysis.corpusStatsOracle,
    "corpus_vocab" -> TextAnalysis.vocabOracle,
    "corpus_sample" -> TextAnalysis.sampleOracle(),
    "dedup_exact" -> Dedup.exactOracle,
    "decontaminate" -> Dedup.decontaminateOracle,
    // equivalence oracle: the bloom-pruned path must reproduce the
    // exact broadcast-probe decontamination bitwise
    "decontaminate_bloom" -> Dedup.decontaminateOracle,
    "corpus_pack" -> Chunker.packOracle,
    "dedup_minhash_lsh" -> Dedup.minhashLshOracle,
    "dedup_clusters" -> DedupClusters.oracle,
    "dedup_incremental" -> Dedup.incrementalOracle,
    "dedup_simhash" -> Dedup.simhashOracle,
    "dedup_simhash_pairs" -> Dedup.simhashPairsOracle,
    "q_events_json" -> Events.jsonExtractOracle,
    "dedup_ngram_jaccard" -> Dedup.ngramJaccardOracle,
    "dedup_embedding" -> Dedup.embeddingNearDupOracle,
    "dedup_embedding_lsh" -> Dedup.embeddingNearDupLshOracle,
    "lsh_bucket_stats" -> Dedup.lshBucketStatsOracle,
    "ivf_build_centroids" -> IvfIndex.buildCentroidsOracle,
    "ivf_search" -> IvfIndex.qSearchOracle,
    "eval_retrieval" -> RetrievalEval.oracle,
    "eval_ndcg" -> RetrievalEval.ndcgOracle,
    "eval_answer_cases" -> AnswerEval.casesOracle,
    "eval_answer_poll" -> AnswerEval.pollOracle,
    "finetune_triplets" -> FinetuneData.oracle,
    "multimodal_meta" -> Multimodal.metaOracle
  )
}
