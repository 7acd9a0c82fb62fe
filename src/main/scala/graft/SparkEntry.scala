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
    "q_text2sql_suite" -> (Text2Sql.qSuite _),
    "q_events_hourly" -> (Events.hourly _),
    "q_events_sliding" -> (Events.sliding _),
    "q_events_sessionize" -> (Events.sessionize _),
    "q_events_asof" -> (Events.asofLastPurchase _),
    "q_events_range_join" -> (RangeJoin.query _),
    "corpus_mix" -> (CorpusOps.qMix _),
    "corpus_mix_temperature" -> (CorpusOps.qMixTemperature _),
    "pipeline_clean_pack" -> (Pipeline.cleanPack _),
    "pipeline_decision_log" -> (Pipeline.decisionLog _),
    "corpus_quantiles" -> (CorpusOps.qQuantiles _),
    "corpus_importance_sample" -> (CorpusOps.qImportanceSample _),
    "corpus_split" -> (CorpusOps.qSplit _),
    "corpus_diff" -> (CorpusOps.qDiff _),
    "kw_search_bm25" -> (KeywordSearch.search _),
    "kw_search_batch" -> (KeywordSearch.batchSearch _),
    "kw_search_batch_pruned" -> (ChampionIndex.batchSearchPruned _),
    "kw_search_champion" -> (ChampionIndex.searchChampion _),
    // RM3 pseudo-relevance-feedback expansion: feedback -> mined
    // weighted terms -> weighted second round; oracle re-mines the
    // expansion from the corpus itself
    "kw_search_rm3" -> (Rm3Expansion.qSearch _),
    // RM3 with BOTH BM25-shaped rounds pruned against the standing
    // champion artifact — per-query cost (|q|+E)*M at any corpus size
    "kw_search_rm3_pruned" -> (Rm3Expansion.qSearchPruned _),
    // Dirichlet-smoothed query-likelihood ranking — the LM scoring
    // family beside BM25 (Lucene LMDirichletSimilarity analog)
    "kw_search_dirichlet" -> (QueryLikelihood.qSearch _),
    // batch QL over the standing postings: sparse corrections + the
    // k+1 globally-shortest candidate closure — EXACT dense LM ranking
    // at the batch-BM25 probe cost
    "kw_search_dirichlet_batch" -> (QueryLikelihood.qBatchSearch _),
    // the LM family's champion form: QL impacts are query-independent,
    // so the same top-M impact-list scheme bounds per-query cost at
    // nTerms*M + (k+1) at any corpus size
    "kw_search_dirichlet_pruned" -> (QueryLikelihood.qBatchSearchPruned _),
    // MaxSim rerank atop the champion-pruned first stage: the whole
    // late-interaction pipeline at per-query cost independent of
    // corpus size (the exact-candidate form is SCALE-capped at 10x)
    "rerank_maxsim_batch_pruned" -> (MaxSimReranker.qBatchRerankPruned _),
    // single-query doubly-pruned hybrid (IVF cells x champion lists) —
    // the facade's pruned-index routing target
    "hybrid_search_pruned" -> (HybridSearch.searchPruned _),
    "filter_search_exact" -> (KeywordSearch.searchFilterExact _),
    "filter_search_fuzzy" -> (KeywordSearch.searchFilterFuzzy _),
    "doc_count" -> (KeywordSearch.docCount _),
    "kw_index_dictionary" -> (KeywordIndex.qDictionary _),
    // incremental index refresh: base built on the previous snapshot,
    // one delta batch applied; oracles replay a FULL REBUILD on the
    // current snapshot (base+delta must be indistinguishable from it)
    "kw_index_refresh" -> (IndexRefresh.qRefreshSearch _),
    "kw_index_refresh_dict" -> (IndexRefresh.qRefreshDict _),
    "kw_search_refreshed_batch" -> (IndexRefresh.qRefreshBatchSearch _),
    "ql_search_refreshed_batch" -> (IndexRefresh.qRefreshQlSearch _),
    "kw_search_rm3_refreshed" -> (Rm3Expansion.qSearchRefreshed _),
    "kw_search_rm3_asof" -> (Rm3Expansion.qSearchAsOf _),
    "kw_search_asof" -> (IndexRefresh.qSearchAsOf _),
    "ql_search_asof" -> (IndexRefresh.qQlSearchAsOf _),
    "kw_index_stats" -> (IndexRefresh.qIndexStats _),
    "kw_compaction_plan" -> (IndexRefresh.qCompactionPlan _),
    "stream_kw_refresh_serve" -> (graft.streaming.ServeStream.qStreamKwRefreshServe _),
    "stream_ql_refresh_serve" -> (graft.streaming.ServeStream.qStreamQlRefreshServe _),
    "ivf_index_refresh" -> (VectorRefresh.qRefreshSearch _),
    "vector_search_asof" -> (VectorRefresh.qSearchAsOf _),
    "vector_search_refreshed_quantized" -> (VectorRefresh.qSearchRefreshedQuantized _),
    "vector_search_refreshed_quantized_batch" -> (VectorRefresh.qBatchSearchRefreshedQuantized _),
    "vector_search_refreshed_quantized_filtered" -> (VectorRefresh.qSearchRefreshedQuantizedFiltered _),
    "vector_index_stats" -> (VectorRefresh.qIndexStats _),
    "kw_search_indexed" -> (KeywordIndex.qSearchIndexed _),
    "vector_search_topk" -> (VectorSearch.search _),
    "vector_search_batch" -> (VectorSearch.batchSearch _),
    "vector_search_batch_ivf" -> (IvfIndex.qBatchSearch _),
    "vector_search_batch_ivf_materialized" -> (IvfIndex.qBatchSearchMaterialized _),
    "vector_search_quantized" -> (VectorSearch.searchQuantized _),
    "vector_search_quantized_materialized" -> (VectorSearch.searchQuantizedMaterialized _),
    "e2e_chunk_embed_search" -> (Embedder.query _),
    "vector_search_parent" -> (Embedder.queryParent _),
    "prompt_assembly" -> (PromptAssembly.query _),
    "rag_answer" -> (Generation.query _),
    "search_render" -> (SearchRender.query _),
    "hybrid_search" -> (HybridSearch.search _),
    "hybrid_search_rrf" -> (HybridSearch.searchRrf _),
    "kw_search_multifield" -> (KeywordSearch.searchMultiField _),
    "dedup_span_profile" -> (Dedup.qSpanProfile _),
    "hybrid_search_batch" -> (HybridSearch.batchSearch _),
    "hybrid_search_batch_ivf" -> (HybridSearch.batchSearchIvf _),
    "hybrid_search_batch_champion" -> (HybridSearch.batchSearchChampion _),
    "hybrid_search_refreshed_batch" -> (HybridSearch.batchSearchRefreshed _),
    "hybrid_search_quantized_batch" -> (HybridSearch.batchSearchQuantizedFused _),
    "hybrid_search_quantized_asof" -> (HybridSearch.batchSearchQuantizedFusedAsOf _),
    "stream_quantized_fused_serve" -> (graft.streaming.ServeStream.qStreamQuantizedFusedServe _),
    "hybrid_search_refreshed_compacted" -> (HybridSearch.batchSearchRefreshedCompacted _),
    "hybrid_search_asof" -> (HybridSearch.batchSearchRefreshedAsOf _),
    "hybrid_search_filtered" -> (HybridSearch.searchFiltered _),
    "vector_search_filtered" -> (VectorSearch.searchFiltered _),
    "rerank_overlap" -> (Reranker.search _),
    "rerank_mmr" -> (Reranker.searchMmr _),
    "context_prune" -> (ContextPruner.search _),
    "chunk_documents" -> (Chunker.query _),
    "chunk_expand" -> (Chunker.qExpand _),
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
    "corpus_pair_stats" -> (TextAnalysis.qPairStats _),
    "bpe_encode" -> (TextAnalysis.qBpeEncode _),
    "bpe_train" -> (TextAnalysis.qBpeTrain _),
    "bpe_encode_learned" -> (TextAnalysis.qBpeEncodeLearned _),
    "quality_classifier" -> (QualityClassifier.qScore _),
    "bpe_compression" -> (TextAnalysis.qBpeCompression _),
    "text_lm_bigram" -> (TextAnalysis.qLmBigram _),
    "vector_search_grouped" -> (VectorSearch.searchGrouped _),
    "vector_search_autocut" -> (VectorSearch.searchAutocut _),
    "vector_search_grouped_pruned" -> (IvfIndex.qSearchGroupedPruned _),
    "vector_search_autocut_pruned" -> (IvfIndex.qSearchAutocutPruned _),
    "vector_search_grouped_batch" -> (IvfIndex.qBatchSearchGrouped _),
    "vector_search_autocut_batch" -> (IvfIndex.qBatchSearchAutocut _),
    "corpus_sample" -> (TextAnalysis.qSample _),
    "corpus_cluster_sample" -> (CorpusOps.qClusterSample _),
    "dedup_exact" -> (Dedup.qExact _),
    "decontaminate" -> (Dedup.qDecontaminate _),
    "decontaminate_bloom" -> (Dedup.qDecontaminateBloom _),
    "corpus_pack" -> (Chunker.qPack _),
    "dedup_minhash_lsh" -> (Dedup.qMinhashLsh _),
    // the hot-bucket cluster report (the guard's skip-with-report half)
    "dedup_lsh_hot_buckets" -> ((s, d) => Dedup.hotBuckets(graft.sources.Tables.documents(s, d))),
    "dedup_clusters" -> (DedupClusters.query _),
    "dedup_incremental" -> (Dedup.qIncremental _),
    "dedup_semantic" -> (Dedup.qSemanticDedup _),
    "dedup_simhash" -> (Dedup.qSimhash _),
    "dedup_simhash_pairs" -> ((s, d) => Dedup.simhashPairs(graft.sources.Tables.documents(s, d))),
    "q_events_json" -> (Events.jsonExtract _),
    "q_events_latest" -> (Events.latest _),
    "q_events_cohort" -> (Events.cohortRetention _),
    "q_events_funnel" -> (Events.funnel _),
    "corpus_shuffle" -> ((s, d) => CorpusOps.shuffleShards(graft.sources.Tables.documents(s, d))),
    "filter_search_compound" -> (KeywordSearch.searchFilterCompound _),
    "fetch_objects_page" -> (Catalog.fetchObjectsPage _),
    "dedup_ngram_jaccard" -> (Dedup.qNgramJaccard _),
    // op 28's headline entry is the LSH-blocked scale path
    // (dedup_embedding_lsh); the corpus-cartesian form is explicitly the
    // brute-force correctness baseline, named as such
    "dedup_embedding_bruteforce" -> (Dedup.qEmbeddingNearDup _),
    "dedup_embedding_lsh" -> (Dedup.qEmbeddingNearDupLsh _),
    "lsh_bucket_stats" -> (Dedup.qLshBucketStats _),
    "ivf_build_centroids" -> (IvfIndex.qBuild _),
    "ivf_search" -> (IvfIndex.qSearch _),
    "ivf_search_filtered" -> (IvfIndex.qSearchFiltered _),
    // filtered ANN over the materialized cell layout: partition-pruned
    // scan + filter-during-walk; oracle IS the inline filtered SQL
    "ivf_search_filtered_materialized" -> (IvfIndex.qSearchFilteredMaterialized _),
    "eval_retrieval" -> (RetrievalEval.query _),
    "eval_ndcg" -> (RetrievalEval.queryNdcg _),
    "eval_retrieval_kw" -> (RetrievalEval.queryKw _),
    "eval_retrieval_hybrid" -> (RetrievalEval.queryHybrid _),
    "eval_retrieval_pruned" -> (RetrievalEval.queryPruned _),
    "eval_retrieval_quantized" -> (RetrievalEval.queryQuantized _),
    "eval_retrieval_quantized_fused" -> (RetrievalEval.queryQuantizedFused _),
    "eval_alpha_sweep" -> (RetrievalEval.queryAlphaSweep _),
    // the sweep a practitioner can afford at scale: same alpha grid and
    // metric tail over the doubly-pruned champion+IVF fusion
    "eval_alpha_sweep_pruned" -> (RetrievalEval.queryAlphaSweepPruned _),
    "eval_champion_sweep" -> (RetrievalEval.queryChampionSweep _),
    // file-driven golden-dataset evaluation (external JSON golden set)
    "eval_retrieval_golden" -> (GoldenEval.qGoldenEval _),
    "eval_retrieval_golden_refreshed" -> (GoldenEval.qGoldenEvalRefreshed _),
    "eval_retrieval_golden_pruned" -> (GoldenEval.qGoldenEvalPruned _),
    "eval_retrieval_golden_asof" -> (GoldenEval.qGoldenEvalAsOf _),
    "eval_retrieval_golden_asof_pruned" -> (GoldenEval.qGoldenEvalAsOfPruned _),
    "kw_index_recut" -> (IndexRefresh.qIndexRecut _),
    "kw_index_recut_sparse" -> (IndexRefresh.qIndexRecutSparse _),
    "eval_answer_cases" -> (AnswerEval.queryCases _),
    "eval_answer_poll" -> (AnswerEval.queryPoll _),
    "finetune_triplets" -> (FinetuneData.query _),
    "multimodal_meta" -> (Multimodal.qMeta _),
    // REAL image codec (JDK ImageIO PNG): encode→decode→features and
    // decode→resize→re-encode→features, oracle-checked from the known
    // generator pixel function (PNG is lossless)
    "multimodal_decode" -> (Multimodal.qDecode _),
    "multimodal_resize_real" -> (Multimodal.qResizeReal _),
    // streaming twins under the oracle gate: each runs the streaming
    // plan to completion over the available input and must hash-match
    // its BATCH twin's oracle SQL
    "stream_events_latest" -> (graft.streaming.EventsStream.qStreamLatest _),
    "stream_events_hourly" -> (graft.streaming.EventsStream.qStreamHourly _),
    "stream_hybrid_serve" -> (graft.streaming.ServeStream.qStreamHybridServe _),
    "stream_bm25_serve" -> (graft.streaming.ServeStream.qStreamBm25Serve _),
    "stream_kw_champion_serve" -> (graft.streaming.ServeStream.qStreamChampionServe _),
    // the LM family's serving twin: micro-batch QL over the standing
    // champion + closure artifacts (batch-split invariant — every
    // score input is a global index constant)
    "stream_ql_champion_serve" -> (graft.streaming.ServeStream.qStreamQlChampionServe _),
    "stream_hybrid_ivf_serve" -> (graft.streaming.ServeStream.qStreamHybridIvfServe _),
    "stream_vector_ivf_serve" -> (graft.streaming.ServeStream.qStreamVectorIvfServe _),
    "stream_vector_serve" -> (graft.streaming.ServeStream.qStreamVectorServe _),
    "stream_vector_grouped_serve" -> (graft.streaming.ServeStream.qStreamGroupedServe _),
    "stream_vector_autocut_serve" -> (graft.streaming.ServeStream.qStreamAutocutServe _),
    "stream_rag_answer" -> (graft.streaming.GenerateStream.qStreamRagAnswer _),
    "stream_json_chat" -> (graft.streaming.GenerateStream.qStreamJsonChat _),
    "stream_events_dedup" -> (graft.streaming.EventsStream.qStreamDedup _),
    "stream_events_sessionize" -> (graft.streaming.EventsStream.qStreamSessionize _),
    "stream_events_asof" -> (graft.streaming.EventsStream.qStreamAsof _),
    "stream_corpus_pack" -> (graft.streaming.CorpusStream.qStreamPack _),
    "stream_clean_ingest" -> (graft.streaming.CorpusStream.qStreamCleanPack _),
    "stream_index_ingest" -> (graft.streaming.IndexStream.qStreamIndexIngest _),
    "stream_index_refresh" -> (graft.streaming.IndexStream.qStreamIndexRefresh _),
    "stream_refresh_compact" -> (graft.streaming.IndexStream.qStreamRefreshCompact _),
    "stream_vector_refresh_compact" -> (graft.streaming.IndexStream.qStreamVectorRefreshCompact _),
    "stream_vector_refresh" -> (graft.streaming.IndexStream.qStreamVectorRefresh _),
    "stream_quantized_refresh_serve" -> (graft.streaming.IndexStream.qStreamQuantizedRefresh _),
    // materialized-index searches: oracle-checked — the partition-pruned
    // on-disk path must reproduce the inline search's result exactly
    "ivf_search_materialized" -> (IvfIndex.qSearchMaterialized _),
    "kw_search_materialized" -> (KeywordIndex.qSearchMaterialized _),
    // PQ family: codebooks train driver-side (deterministic, cached per
    // dir) and embed as literals into the oracle — encode + ADC scoring
    // replay as pure SQL
    // REAL learned weights (corpus-trained Word2Vec, loaded from the
    // materialized weight file) through the batched-inference seam;
    // oracle replays mean-pooling + cosine with the weights as literals
    "embed_w2v_search" -> (Word2VecEmbedder.qSearch _),
    // TRANSFORMER-CLASS encoder (single-head ReLU attention + LayerNorm
    // + FFN over the trained w2v token embeddings) through the same
    // seam; oracle replays the full forward pass in SQL with every
    // parameter tensor as literals
    "embed_attention_search" -> (AttentionEncoder.qSearch _),
    // the same transformer block as a CROSS-ENCODER (joint query+doc
    // sequence, segment embeddings, linear head) in the reranker slot
    "rerank_attention" -> (AttentionEncoder.qRerank _),
    // scale-toolbox layouts under the oracle gate: each writes its
    // layout once (standing artifact) and reads it back; the oracle
    // recomputes rows / join results / the Morton key from the source
    // parquet in DuckDB
    "sink_bucketed_join" -> (graft.sources.Sinks.qBucketedJoin _),
    "sink_time_partitioned" -> (graft.sources.Sinks.qTimePartitioned _),
    "sink_zorder" -> (graft.sources.Sinks.qZOrdered _),
    "q_salted_join" -> (Skew.qSaltedJoin _),
    // trained logistic-regression cross-scorer in the reranker slot,
    // served through the pair-scoring inference seam; linear-score
    // oracle with the fitted coefficients as literals
    "rerank_learned" -> (LearnedReranker.qSearch _),
    // late-interaction (ColBERT MaxSim) multi-vector rerank over the
    // trained w2v token embeddings; literal-weights oracle
    "rerank_maxsim" -> (MaxSimReranker.qSearch _),
    // PLAID-style late interaction as the FIRST stage: per-query-token
    // neighborhoods -> champion candidates -> exact MaxSim on survivors
    "maxsim_search_pruned" -> (MaxSimReranker.qSearchPruned _),
    "rerank_maxsim_batch" -> (MaxSimReranker.qBatchRerank _),
    "pq_adc_search" -> (ProductQuantizer.qAdcSearch _),
    "ivf_pq_search" -> (ProductQuantizer.qIvfAdcSearch _),
    "vector_search_batch_ivf_pq" -> (ProductQuantizer.qBatchIvfAdcSearch _),
    // stub-codec resize, oracle-gated since r9: the byte-resample
    // transform replays in pure SQL blob/hex functions
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
    "q_text2sql_suite" -> Text2Sql.suiteOracle,
    "q_events_hourly" -> Events.hourlyOracle,
    "q_events_sliding" -> Events.slidingOracle,
    "q_events_sessionize" -> Events.sessionizeOracle,
    "q_events_asof" -> Events.asofOracle,
    "q_events_range_join" -> RangeJoin.oracle,
    "corpus_mix" -> CorpusOps.mixOracle(),
    "corpus_mix_temperature" -> CorpusOps.mixTemperatureOracle,
    "pipeline_clean_pack" -> Pipeline.oracle,
    "pipeline_decision_log" -> Pipeline.decisionLogOracle,
    "corpus_quantiles" -> CorpusOps.quantilesOracle,
    "corpus_importance_sample" -> CorpusOps.importanceSampleOracle,
    "corpus_split" -> CorpusOps.splitOracle,
    "corpus_diff" -> CorpusOps.diffOracle,
    "kw_search_bm25" -> KeywordSearch.searchOracle,
    "kw_search_batch" -> KeywordSearch.batchSearchOracle,
    "kw_search_batch_pruned" -> ChampionIndex.batchPrunedOracle,
    "kw_search_champion" -> ChampionIndex.searchChampionOracle,
    "kw_search_rm3" -> Rm3Expansion.searchOracle,
    "kw_search_rm3_pruned" -> Rm3Expansion.searchPrunedOracle,
    "kw_search_dirichlet" -> QueryLikelihood.searchOracle,
    "kw_search_dirichlet_batch" -> QueryLikelihood.qBatchSearchOracle,
    "kw_search_dirichlet_pruned" -> QueryLikelihood.qBatchSearchPrunedOracle,
    "hybrid_search_pruned" -> HybridSearch.searchPrunedOracle,
    // equivalence oracle: the partition-pruned on-disk filtered path
    // must reproduce the inline filtered IVF search exactly
    "ivf_search_filtered_materialized" -> IvfIndex.qSearchFilteredOracle,
    "eval_alpha_sweep_pruned" -> RetrievalEval.alphaSweepPrunedOracle,
    "eval_champion_sweep" -> RetrievalEval.championSweepOracle,
    "hybrid_search_batch" -> HybridSearch.batchSearchOracle,
    "filter_search_exact" -> KeywordSearch.searchFilterExactOracle,
    "filter_search_fuzzy" -> KeywordSearch.searchFilterFuzzyOracle,
    "doc_count" -> KeywordSearch.docCountOracle,
    "kw_index_dictionary" -> KeywordIndex.dictionaryOracle,
    "kw_index_refresh" -> IndexRefresh.refreshSearchOracle,
    "kw_index_refresh_dict" -> IndexRefresh.refreshDictOracle,
    "kw_search_refreshed_batch" -> IndexRefresh.refreshBatchSearchOracle,
    "ql_search_refreshed_batch" -> IndexRefresh.refreshQlSearchOracle,
    "kw_search_rm3_refreshed" -> Rm3Expansion.searchRefreshedOracle,
    "kw_search_rm3_asof" -> Rm3Expansion.searchAsOfOracle,
    "kw_search_asof" -> IndexRefresh.searchAsOfOracle,
    "ql_search_asof" -> IndexRefresh.qlSearchAsOfOracle,
    "kw_index_stats" -> IndexRefresh.indexStatsOracle,
    "kw_compaction_plan" -> IndexRefresh.compactionPlanOracle,
    "stream_kw_refresh_serve" -> IndexRefresh.refreshBatchSearchOracle,
    "stream_ql_refresh_serve" -> IndexRefresh.refreshQlSearchOracle,
    "ivf_index_refresh" -> VectorRefresh.refreshSearchOracle,
    "vector_search_asof" -> VectorRefresh.searchAsOfOracle,
    "vector_search_refreshed_quantized" -> VectorRefresh.searchRefreshedQuantizedOracle,
    "vector_search_refreshed_quantized_batch" -> VectorRefresh.batchSearchRefreshedQuantizedOracle,
    "vector_search_refreshed_quantized_filtered" -> VectorRefresh.searchRefreshedQuantizedFilteredOracle,
    "vector_index_stats" -> VectorRefresh.indexStatsOracle,
    "kw_search_indexed" -> KeywordIndex.searchIndexedOracle,
    "kw_search_materialized" -> KeywordIndex.searchIndexedOracle,
    "ivf_search_materialized" -> IvfIndex.qSearchMaterializedOracle,
    "vector_search_topk" -> VectorSearch.searchOracle,
    "vector_search_batch" -> VectorSearch.batchSearchOracle,
    "vector_search_batch_ivf" -> IvfIndex.qBatchSearchOracle,
    // equivalence oracle: the dynamically-pruned on-disk path must
    // reproduce the inline batch-IVF search exactly
    "vector_search_batch_ivf_materialized" -> IvfIndex.qBatchSearchOracle,
    "hybrid_search_batch_ivf" -> HybridSearch.batchSearchIvfOracle,
    "hybrid_search_batch_champion" -> HybridSearch.batchSearchChampionOracle,
    "hybrid_search_refreshed_batch" -> HybridSearch.batchSearchRefreshedOracle,
    "hybrid_search_quantized_batch" -> HybridSearch.batchSearchQuantizedFusedOracle,
    "hybrid_search_quantized_asof" -> HybridSearch.batchSearchQuantizedFusedAsOfOracle,
    "stream_quantized_fused_serve" -> HybridSearch.batchSearchQuantizedFusedOracle,
    "hybrid_search_refreshed_compacted" -> HybridSearch.batchSearchRefreshedOracle,
    "hybrid_search_asof" -> HybridSearch.batchSearchRefreshedAsOfOracle,
    "vector_search_quantized" -> VectorSearch.searchQuantizedOracle,
    // equivalence oracle: the materialized byte-code copy must reproduce
    // the inline int-code quantized search bitwise
    "vector_search_quantized_materialized" -> VectorSearch.searchQuantizedOracle,
    "e2e_chunk_embed_search" -> Embedder.chunkEmbedSearchOracle,
    "vector_search_parent" -> Embedder.parentSearchOracle,
    "prompt_assembly" -> PromptAssembly.oracle,
    "rag_answer" -> Generation.oracle,
    "search_render" -> SearchRender.oracle,
    "hybrid_search" -> HybridSearch.searchOracle,
    "hybrid_search_rrf" -> HybridSearch.searchRrfOracle,
    "kw_search_multifield" -> KeywordSearch.searchMultiFieldOracle,
    "dedup_span_profile" -> Dedup.spanProfileOracle,
    "hybrid_search_filtered" -> HybridSearch.searchFilteredOracle,
    "vector_search_filtered" -> VectorSearch.searchFilteredOracle,
    "rerank_overlap" -> Reranker.searchOracle,
    "rerank_mmr" -> Reranker.searchMmrOracle,
    "context_prune" -> ContextPruner.searchOracle,
    "chunk_documents" -> Chunker.oracle,
    "chunk_expand" -> Chunker.expandOracle,
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
    "corpus_pair_stats" -> TextAnalysis.pairStatsOracle,
    "bpe_encode" -> TextAnalysis.bpeEncodeOracle,
    "bpe_train" -> TextAnalysis.bpeTrainSql(),
    "bpe_encode_learned" -> TextAnalysis.bpeEncodeLearnedSql(),
    "quality_classifier" -> QualityClassifier.scoreOracle,
    "bpe_compression" -> TextAnalysis.bpeCompressionSql(),
    "text_lm_bigram" -> TextAnalysis.lmBigramOracle,
    "vector_search_grouped" -> VectorSearch.searchGroupedOracle,
    "vector_search_autocut" -> VectorSearch.searchAutocutOracle,
    "vector_search_grouped_pruned" -> IvfIndex.qSearchGroupedPrunedOracle,
    "vector_search_autocut_pruned" -> IvfIndex.qSearchAutocutPrunedOracle,
    "vector_search_grouped_batch" -> IvfIndex.qBatchSearchGroupedOracle,
    "vector_search_autocut_batch" -> IvfIndex.qBatchSearchAutocutOracle,
    "corpus_sample" -> TextAnalysis.sampleOracle(),
    "corpus_cluster_sample" -> CorpusOps.clusterSampleOracle,
    "dedup_exact" -> Dedup.exactOracle,
    "decontaminate" -> Dedup.decontaminateOracle,
    // equivalence oracle: the bloom-pruned path must reproduce the
    // exact broadcast-probe decontamination bitwise
    "decontaminate_bloom" -> Dedup.decontaminateOracle,
    "corpus_pack" -> Chunker.packOracle,
    "dedup_minhash_lsh" -> Dedup.minhashLshOracle,
    "dedup_lsh_hot_buckets" -> Dedup.hotBucketsSql(),
    "dedup_semantic" -> Dedup.semanticDedupOracle,
    "dedup_clusters" -> DedupClusters.oracle,
    "dedup_incremental" -> Dedup.incrementalOracle,
    "dedup_simhash" -> Dedup.simhashOracle,
    "dedup_simhash_pairs" -> Dedup.simhashPairsOracle,
    "q_events_json" -> Events.jsonExtractOracle,
    "q_events_latest" -> Events.latestOracle,
    "q_events_cohort" -> Events.cohortRetentionOracle,
    "q_events_funnel" -> Events.funnelOracle,
    "corpus_shuffle" -> CorpusOps.shuffleShardsOracle(),
    "filter_search_compound" -> KeywordSearch.searchFilterCompoundOracle,
    "fetch_objects_page" -> Catalog.fetchObjectsPageOracle,
    "dedup_ngram_jaccard" -> Dedup.ngramJaccardOracle,
    "dedup_embedding_bruteforce" -> Dedup.embeddingNearDupOracle,
    "dedup_embedding_lsh" -> Dedup.embeddingNearDupLshOracle,
    "lsh_bucket_stats" -> Dedup.lshBucketStatsOracle,
    "ivf_build_centroids" -> IvfIndex.buildCentroidsOracle,
    "ivf_search" -> IvfIndex.qSearchOracle,
    "ivf_search_filtered" -> IvfIndex.qSearchFilteredOracle,
    "eval_retrieval" -> RetrievalEval.oracle,
    "eval_ndcg" -> RetrievalEval.ndcgOracle,
    "eval_retrieval_kw" -> RetrievalEval.kwOracle,
    "eval_retrieval_hybrid" -> RetrievalEval.hybridOracle,
    "eval_retrieval_pruned" -> RetrievalEval.prunedOracle,
    "eval_retrieval_quantized" -> RetrievalEval.quantizedOracle,
    "eval_retrieval_quantized_fused" -> RetrievalEval.quantizedFusedOracle,
    "eval_alpha_sweep" -> RetrievalEval.alphaSweepOracle,
    "eval_retrieval_golden" -> GoldenEval.goldenEvalOracle,
    "eval_retrieval_golden_refreshed" -> GoldenEval.goldenEvalRefreshedOracle,
    "eval_retrieval_golden_pruned" -> GoldenEval.goldenEvalPrunedOracle,
    "eval_retrieval_golden_asof" -> GoldenEval.goldenEvalAsOfOracle,
    "eval_retrieval_golden_asof_pruned" -> GoldenEval.goldenEvalAsOfPrunedOracle,
    "kw_index_recut" -> IndexRefresh.indexRecutOracle,
    "kw_index_recut_sparse" -> IndexRefresh.indexRecutSparseOracle,
    "eval_answer_cases" -> AnswerEval.casesOracle,
    "eval_answer_poll" -> AnswerEval.pollOracle,
    "finetune_triplets" -> FinetuneData.oracle,
    "multimodal_meta" -> Multimodal.metaOracle,
    "multimodal_decode" -> Multimodal.decodeOracle,
    "multimodal_resize_real" -> Multimodal.resizeRealOracle,
    "multimodal_resize" -> Multimodal.resizeStubOracle(),
    // streaming twins replay their batch twins' oracles
    "stream_events_latest" -> Events.latestOracle,
    "stream_events_hourly" -> Events.hourlyOracle,
    "stream_events_dedup" -> Events.dedupedOracle,
    "stream_events_sessionize" -> Events.sessionizeOracle,
    "stream_events_asof" -> Events.asofOracle,
    "stream_corpus_pack" -> Chunker.packOracle,
    "stream_clean_ingest" -> graft.streaming.CorpusStream.cleanPackOracle,
    "stream_index_ingest" -> graft.streaming.IndexStream.indexIngestOracle,
    "stream_index_refresh" -> graft.streaming.IndexStream.streamIndexRefreshOracle,
    "stream_refresh_compact" -> graft.streaming.IndexStream.streamRefreshCompactOracle,
    "stream_vector_refresh_compact" -> graft.streaming.IndexStream.streamVectorRefreshCompactOracle,
    "stream_vector_refresh" -> graft.streaming.IndexStream.streamVectorRefreshOracle,
    "stream_quantized_refresh_serve" -> VectorRefresh.searchRefreshedQuantizedOracle,
    "stream_hybrid_serve" -> HybridSearch.batchSearchOracle,
    "stream_bm25_serve" -> KeywordSearch.batchSearchOracle,
    "stream_kw_champion_serve" -> ChampionIndex.batchPrunedOracle,
    "stream_ql_champion_serve" -> QueryLikelihood.qBatchSearchPrunedOracle,
    "stream_hybrid_ivf_serve" -> HybridSearch.batchSearchIvfOracle,
    "stream_vector_ivf_serve" -> IvfIndex.qBatchSearchOracle,
    "stream_vector_serve" -> VectorSearch.batchSearchOracle,
    "stream_vector_grouped_serve" -> IvfIndex.qBatchSearchGroupedOracle,
    "stream_vector_autocut_serve" -> IvfIndex.qBatchSearchAutocutOracle,
    "stream_rag_answer" -> Generation.oracle,
    "stream_json_chat" -> Generation.jsonOracle,
    // evaluated at dump time, AFTER the queries ran (Verify's order):
    // the oracle embeds the per-dir trained codebooks as literals
    "embed_w2v_search" -> Word2VecEmbedder.searchOracle,
    "embed_attention_search" -> AttentionEncoder.searchOracle,
    "rerank_attention" -> AttentionEncoder.rerankOracle,
    "sink_bucketed_join" -> graft.sources.Sinks.bucketedJoinOracle,
    "sink_time_partitioned" -> graft.sources.Sinks.timePartitionedOracle,
    "sink_zorder" -> graft.sources.Sinks.zOrderedOracle,
    "q_salted_join" -> Skew.saltedJoinOracle,
    "rerank_learned" -> LearnedReranker.searchOracle,
    "rerank_maxsim" -> MaxSimReranker.searchOracle,
    "maxsim_search_pruned" -> MaxSimReranker.searchPrunedOracle,
    "rerank_maxsim_batch" -> MaxSimReranker.batchRerankOracle,
    "rerank_maxsim_batch_pruned" -> MaxSimReranker.batchRerankPrunedOracle,
    "pq_adc_search" -> ProductQuantizer.adcSearchOracle,
    "ivf_pq_search" -> ProductQuantizer.ivfAdcSearchOracle,
    "vector_search_batch_ivf_pq" -> ProductQuantizer.batchIvfAdcSearchOracle
  )
}
