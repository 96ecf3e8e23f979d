package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Each `queries` entry is one operator family from SURVEY §2; each has
  * a DuckDB oracle in `oracleSql` unless the result is not
  * SQL-expressible (sketch bytes), where the driver records a weaker
  * rows-only check.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the full fact_event_by_minute populate (time bucketing, NULL
    * defaults, broadcast dim lookup, grouped aggregation, sketch). */
  def entry(spark: SparkSession): DataFrame =
    Queries.factPopulateFull(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // dimension populate: P1 (filter -> coalesce-project -> distinct), P3 (surrogate keys)
    "dim_populate_full"        -> (Queries.dimPopulateFull _),
    "dim_populate_multi"       -> (Queries.dimPopulateMulti _),
    // P2: incremental anti-join append with continuing ids
    "dim_populate_incremental" -> (Queries.dimPopulateIncremental _),
    // F1-F4/F6: time bucket, defaults, broadcast dim lookup, window, grouped agg
    "fact_populate_full"        -> (Queries.factPopulateFull _),
    "fact_populate_incremental" -> (Queries.factPopulateIncremental _),
    // F5: parent-fact source join (lineitem -> orders) + cross-fact dims
    "fact_populate_parent" -> (Queries.factPopulateParent _),
    // TenantId degenerate dim + count(col) + max/min measures
    "fact_populate_tenant" -> (Queries.factPopulateTenant _),
    // re-aggregability: minute fact rolled to hours == hour-grain populate
    "fact_rollup_hour" -> (Queries.factRollupHour _),
    // incremental maintenance: prior rollup + delta batch == full rollup
    "fact_rollup_incremental" -> (Queries.factRollupIncremental _),
    // F7: exact companion + mergeable register sketch
    "agg_count_distinct_exact" -> (Queries.aggCountDistinctExact _),
    "sketch_count_distinct"    -> (Queries.sketchCountDistinct _),
    // audience overlap from per-segment sketches (inclusion-exclusion)
    "sketch_intersection"      -> (Queries.sketchIntersection _),
    // mergeable registers over a trailing window: rolling 7d distinct
    "sketch_rolling_distinct"  -> (Queries.sketchRollingDistinct _),
    // data-quality: per-FK orphan audit over the declared star joins
    "audit_referential" -> (Queries.auditReferential _),
    // measure-then-salt: heavy join keys + suggested salt factor
    "skew_diagnose"     -> (Queries.skewDiagnose _),
    // E1-E4: derivation layer exposed as rows (golden-checked in tests
    // against the reference doctest outputs)
    "derive_schemas"      -> (Queries.deriveSchemas _),
    "derive_dependencies" -> (Queries.deriveDependencies _),
    "validate_errors"     -> (Queries.validateErrors _),
    // training-data extensions: text analysis + normalization
    "text_stats"     -> (QueriesExt.textStats _),
    "text_normalize" -> (QueriesExt.textNormalize _),
    "text_extract_html" -> (QueriesExt.textExtractHtml _),
    "warc_extract" -> (QueriesExt.warcExtract _),
    "warc_extract_binary" -> (QueriesExt.warcExtractBinary _),
    "warc_charset_body" -> (QueriesExt.warcCharsetBody _),
    "warc_revisit" -> (QueriesExt.warcRevisit _),
    // robots.txt (RFC 9309): record parsing + URL admission
    "crawl_robots_rules"  -> (QueriesExt.crawlRobotsRules _),
    "crawl_robots_filter" -> (QueriesExt.crawlRobotsFilter _),
    "crawl_recrawl_due" -> (QueriesExt.crawlRecrawlDue _),
    "crawl_change_detect" -> (QueriesExt.crawlChangeDetect _),
    "crawl_recrawl_adaptive" -> (QueriesExt.crawlRecrawlAdaptive _),
    "crawl_page_meta" -> (QueriesExt.crawlPageMeta _),
    "decon_semantic" -> (QueriesExt.deconSemantic _),
    "crawl_robots_delays" -> (QueriesExt.crawlRobotsDelays _),
    // per-host polite fetch ordinals + offsets over a frontier
    "crawl_schedule"      -> (QueriesExt.crawlSchedule _),
    "crawl_schedule_ranked" -> (QueriesExt.crawlScheduleRanked _),
    // the YAML pipeline surface end-to-end: sitemap -> normalize ->
    // redirects -> robots -> dedup -> pagerank-ranked schedule
    "crawl_frontier_ranked" -> (QueriesExt.crawlFrontierRanked _),
    // sitemap XML -> frontier URL rows (codegen'd regexp chain)
    "crawl_sitemap_urls"  -> (QueriesExt.crawlSitemapUrls _),
    // HTTP status/header extraction + chunked-transfer decode
    "warc_http_meta"      -> (QueriesExt.warcHttpMeta _),
    // outlink extraction + RFC 3986 resolution (the crawl loop)
    "crawl_extract_links" -> (QueriesExt.crawlExtractLinks _),
    // host-level link graph (the crawl-quality PageRank input)
    "crawl_link_graph"    -> (QueriesExt.crawlLinkGraph _),
    // meta robots / canonical / nofollow-aware follow links
    "crawl_html_meta"     -> (QueriesExt.crawlHtmlMeta _),
    // redirect-chain collapse by pointer doubling (log-depth joins)
    "crawl_redirects"     -> (QueriesExt.crawlRedirects _),
    // RSS/Atom feed entries (the freshness discovery channel)
    "crawl_feed_items"    -> (QueriesExt.crawlFeedItems _),
    // magic-byte MIME routing for multimodal payloads
    "multimodal_sniff"    -> (QueriesExt.multimodalSniff _),
    // materialized fixed-length packing (concat-and-split)
    "text_pack_sequences" -> (QueriesExt.textPackSequences _),
    // PII scrub over deterministically constructed emails/URLs/phones/IPs
    "text_redact"    -> (QueriesExt.textRedact _),
    // URL canonicalization (the crawl fetch-dedup key)
    "text_url_normalize" -> (QueriesExt.textUrlNormalize _),
    // corpus vocabulary: term + document frequencies, top-100
    "text_term_freq" -> (QueriesExt.textTermFreq _),
    // capped inverted-index postings
    "text_postings"  -> (QueriesExt.textPostings _),
    // per-doc characteristic terms (integer-exact ranking, ln score)
    "text_tfidf" -> (QueriesExt.textTfidf _),
    // Okapi BM25 top terms (length-normalized retrieval scorer)
    "text_bm25" -> (QueriesExt.textBm25 _),
    // grouped top-k via the WindowGroupLimit rank rewrite
    "events_topk" -> (QueriesEvents.eventsTopk _),
    // context-window chunking + repetition quality filter
    "text_chunks"     -> (QueriesExt.textChunks _),
    "text_pack"       -> (QueriesExt.textPack _),
    "text_pack_budget" -> (QueriesExt.textPackBudget _),
    "text_curate"     -> (QueriesExt.textCurate _),
    "text_repetition" -> (QueriesExt.textRepetition _),
    "text_lm_score"   -> (QueriesExt.textLmScore _),
    // warehouse data-quality profile
    "table_profile"   -> (QueriesExt.tableProfile _),
    // approx-distinct profile (HLL++), within-eps gated like the sketch
    "table_profile_approx" -> (QueriesExt.tableProfileApprox _),
    // pairwise sufficient statistics (re-aggregable exact moments)
    "table_moments"        -> (QueriesExt.tableMoments _),
    // hardened JSONL ingestion reproduces the parquet table exactly
    "source_jsonl_roundtrip" -> (QueriesExt.sourceJsonlRoundtrip _),
    // merged half-moments == one-shot moments (same full oracle)
    "table_moments_incremental" -> (QueriesExt.tableMomentsIncremental _),
    // benchmark decontamination: n-gram overlap + clean survivor corpus
    "decon_ngram_overlap" -> (QueriesExt.deconNgramOverlap _),
    "decon_clean"         -> (QueriesExt.deconClean _),
    // bloom-shortlist path must reproduce the exact survivor set
    // (checked against the SAME exact oracle)
    "decon_bloom_clean"   -> (QueriesExt.deconBloomClean _),
    // exact heavy hitters through the Misra-Gries two-pass
    "text_heavy_hitters"  -> (QueriesExt.textHeavyHitters _),
    // event streams: gap sessionization + as-of attribution join
    "events_sessionize" -> (QueriesEvents.eventsSessionize _),
    // nightly-load session maintenance == full rebuild (same oracle)
    "events_sessionize_incremental" -> (QueriesEvents.eventsSessionizeIncremental _),
    // first/last/linear multi-touch attribution in exact integer ppm
    "events_attribution" -> (QueriesEvents.eventsAttribution _),
    "events_attribution_walk" -> (QueriesEvents.eventsAttributionWalk _),
    "events_asof_join"  -> (QueriesEvents.eventsAsofJoin _),
    "events_asof_tolerance" -> (QueriesEvents.eventsAsofTolerance _),
    // mirror direction: earliest at-or-after right row (time-to-next)
    "events_asof_forward"   -> (QueriesEvents.eventsAsofForward _),
    "events_debounce"   -> (QueriesEvents.eventsDebounce _),
    "events_paths"      -> (QueriesEvents.eventsPaths _),
    "events_anomaly"    -> (QueriesEvents.eventsAnomaly _),
    "events_interval_join" -> (QueriesEvents.eventsIntervalJoin _),
    "events_conversion"    -> (QueriesEvents.eventsConversion _),
    "events_zorder"        -> (QueriesEvents.eventsZorder _),
    "events_zorder3"       -> (QueriesEvents.eventsZorder3 _),
    "events_props_typed"   -> (QueriesEvents.eventsPropsTyped _),
    "events_histogram"     -> (QueriesEvents.eventsHistogram _),
    "events_histogram_equidepth" -> (QueriesEvents.eventsHistogramEquidepth _),
    // calendar densification: explicit zeros for missing day x type
    "events_gapfill"       -> (QueriesEvents.eventsGapfill _),
    // held-value integration over irregular timelines
    "events_twa"           -> (QueriesEvents.eventsTwa _),
    // exact order-statistic outlier clamping
    "events_winsorize"     -> (QueriesEvents.eventsWinsorize _),
    // per-type CDF (percent_rank) score normalization
    "events_percent_rank"  -> (QueriesEvents.eventsPercentRank _),
    // median/MAD robust z-score (discrete order statistics)
    "events_robust_z"      -> (QueriesEvents.eventsRobustZ _),
    // leakage-free grouped split: whole sources stay in one split
    "sample_splits_grouped" -> (QueriesExt.sampleSplitsGrouped _),
    // distribution-shape-preserving quartile-stratified sample
    "sample_quantile_strata" -> (QueriesExt.sampleQuantileStrata _),
    // added/removed/changed between two keyed snapshots
    "dim_snapshot_diff"    -> (QueriesEvents.dimSnapshotDiff _),
    "dim_merge_latest"     -> (QueriesEvents.dimMergeLatest _),
    "embed_quantize"       -> (QueriesExt.embedQuantize _),
    // distributed k-means: scan-local codegen'd assignment half
    "embed_kmeans_assign"  -> (QueriesExt.embedKmeansAssign _),
    // JL random projection with a regenerable md5-Rademacher matrix
    "embed_random_projection" -> (QueriesExt.embedRandomProjection _),
    // BPE-ish pre-tokenizer pieces + ~4-chars/token LLM budget estimate
    "text_token_estimate"  -> (QueriesExt.textTokenEstimate _),
    // one-scan declarative data-quality expectations + uniqueness
    "table_expectations"   -> (QueriesExt.tableExpectations _),
    // log-free Gini-Simpson lexical diversity (exact integer sums)
    "text_diversity"       -> (QueriesExt.textDiversity _),
    // project-then-search composition: top-5 in JL-projected space
    "embed_knn_projected"  -> (QueriesExt.embedKnnProjected _),
    // SCD Type-2 dimension history (the Type-1 populate family's
    // "what was the value THEN" extension)
    "dim_scd2_history"  -> (QueriesEvents.dimScd2History _),
    // incremental merge must reproduce the one-shot rebuild (checked
    // against the SAME full-history oracle)
    "dim_scd2_incremental" -> (QueriesEvents.dimScd2Incremental _),
    // product analytics over events: funnel, retention, percentiles, pivot
    "events_funnel"      -> (QueriesEvents.eventsFunnel _),
    "events_retention"   -> (QueriesEvents.eventsRetention _),
    "events_percentiles" -> (QueriesEvents.eventsPercentiles _),
    "events_percentiles_approx" -> (QueriesEvents.eventsPercentilesApprox _),
    "events_pivot"       -> (QueriesEvents.eventsPivot _),
    // deterministic hash sampling / split assignment / stratified quota
    "sample_hash"       -> (QueriesExt.sampleHash _),
    "sample_splits"     -> (QueriesExt.sampleSplits _),
    "sample_stratified" -> (QueriesExt.sampleStratified _),
    // corpus mixing: per-domain hash sample sized to a token budget
    "sample_domain_mix" -> (QueriesExt.sampleDomainMix _),
    "sample_domain_mix_epochs" -> (QueriesExt.sampleDomainMixEpochs _),
    // systematic PPS: pick ~k rows proportional to integral weight
    "sample_weighted"   -> (QueriesExt.sampleWeighted _),
    // rolling time-window aggregation + transition matrix
    "events_rolling"     -> (QueriesEvents.eventsRolling _),
    "events_cube"        -> (QueriesEvents.eventsCube _),
    "events_transitions" -> (QueriesEvents.eventsTransitions _),
    // fixed-point integer PageRank over the transition graph
    "events_pagerank"    -> (QueriesEvents.eventsPagerank _),
    // production iteration count, lineage-checkpointed every 3 rounds
    "events_pagerank10"  -> (QueriesEvents.eventsPagerank10 _),
    // degree-oriented triangle counting on the transition graph
    "graph_triangles"    -> (QueriesEvents.graphTriangles _),
    // 2-core of the near-dup pair graph (densely-duplicated heart)
    "graph_kcore"        -> (QueriesExt.graphKcore _),
    // label-propagation communities (template families) on the same graph
    "graph_labelprop"    -> (QueriesExt.graphLabelprop _),
    // dedup family
    "dedup_exact"         -> (QueriesExt.dedupExact _),
    // batch admission against a maintained fingerprint set
    "dedup_incremental"   -> (QueriesExt.dedupIncremental _),
    "dedup_ngram_jaccard" -> (QueriesExt.dedupNgramJaccard _),
    // winnowing (MOSS local fingerprints) + shared-fp candidate pairs
    "text_winnow" -> (QueriesExt.textWinnow _),
    "dedup_winnow_pairs" -> (QueriesExt.dedupWinnowPairs _),
    // prefix-filtered exact Jaccard: same oracle, bounded candidates
    "dedup_jaccard_prefix" -> (QueriesExt.dedupJaccardPrefix _),
    // the production-θ regime of the same operator (short prefixes)
    "dedup_jaccard_prefix_t08" -> (QueriesExt.dedupJaccardPrefixT08 _),
    // per-doc duplicated-span (exact substring) memorization signal
    "text_dup_spans" -> (QueriesExt.textDupSpans _),
    "text_dup_spans_remove" -> (QueriesExt.textDupSpansRemove _),
    "dedup_minhash_lsh"   -> (QueriesExt.dedupMinhashLsh _),
    "dedup_simhash"       -> (QueriesExt.dedupSimhash _),
    // oracle-checked verification companions: LSH pairs subset-of exact
    // pairs with equal jaccard; simhash pairs restricted to the
    // exact-dup subgraph == the recomputed exact-dup pair set
    "dedup_minhash_lsh_verified" -> (QueriesExt.dedupMinhashLshVerified _),
    "dedup_simhash_verified"     -> (QueriesExt.dedupSimhashVerified _),
    // near-dup clustering (connected components over the pair graph)
    "dedup_cluster"       -> (QueriesExt.dedupCluster _),
    "dedup_survivors"     -> (QueriesExt.dedupSurvivors _),
    // keep-the-best-copy policy: per-cluster argmax(n_chars, min id)
    "dedup_survivors_best" -> (QueriesExt.dedupSurvivorsBest _),
    // CCNet/RefinedWeb line-level boilerplate removal
    "text_line_dedup"     -> (QueriesExt.textLineDedup _),
    // windowed token co-occurrence (the PMI/collocation statistic)
    "text_cooccurrence"   -> (QueriesExt.textCooccurrence _),
    // deterministic global shuffle (shard + dense in-shard position)
    "sample_shuffle_shards" -> (QueriesExt.sampleShuffleShards _),
    // deterministic salted join == plain join (skew mitigation)
    "skew_salted_join"    -> (QueriesExt.skewSaltedJoin _),
    // similarity search
    "embed_knn_brute"       -> (QueriesExt.embedKnnBrute _),
    "embed_knn_lsh"         -> (QueriesExt.embedKnnLsh _),
    "embed_knn_ivf"         -> (QueriesExt.embedKnnIvf _),
    "embed_knn_quantized"   -> (QueriesExt.embedKnnQuantized _),
    "embed_knn_pq"          -> (QueriesExt.embedKnnPq _),
    "embed_knn_ivfpq"       -> (QueriesExt.embedKnnIvfPq _),
    // ANN verification companions: union with the exact all-pairs
    // cosine table must equal that table
    "embed_knn_lsh_verified" -> (QueriesExt.embedKnnLshVerified _),
    "embed_knn_ivf_verified" -> (QueriesExt.embedKnnIvfVerified _),
    "embed_knn_quantized_verified" -> (QueriesExt.embedKnnQuantizedVerified _),
    "embed_knn_pq_verified" -> (QueriesExt.embedKnnPqVerified _),
    "embed_knn_ivfpq_verified" -> (QueriesExt.embedKnnIvfPqVerified _),
    // stored-index ANN: train-once -> parquet -> reuse (AnnIndex);
    // identical rows to the retrain path, same soundness oracle
    "embed_knn_ivf_stored"  -> (QueriesExt.embedKnnIvfStored _),
    "embed_knn_pq_stored"   -> (QueriesExt.embedKnnPqStored _),
    "embed_knn_ivfpq_stored" -> (QueriesExt.embedKnnIvfPqStored _),
    "embed_knn_ivfsq_stored" -> (QueriesExt.embedKnnIvfSqStored _),
    "embed_knn_opq_stored"  -> (QueriesExt.embedKnnOpqStored _),
    "embed_knn_ivfopq_stored" -> (QueriesExt.embedKnnIvfOpqStored _),
    "ann_nights_stored"     -> (QueriesExt.annNightsStored _),
    // index lifecycle: drift monitor -> thresholded retrain -> atomic
    // whole-index swap (post-swap == from-scratch, asserted in-gate)
    "ann_retrain_swap"      -> (QueriesExt.annRetrainSwap _),
    "embed_cosine_neardup"  -> (QueriesExt.embedCosineNearDup _),
    // SemDeDup: cluster-then-prune semantic dedup (pair space bounded
    // by the cluster structure, not N^2)
    "embed_semdedup"        -> (QueriesExt.embedSemdedup _),
    "embed_semdedup_flagged" -> (QueriesExt.embedSemdedupFlagged _),
    // multimodal: real JDK codecs (PNG/WAV decode, RIFF/AVI demux)
    "multimodal_decode" -> (QueriesExt.multimodalDecode _),
    "multimodal_frames" -> (QueriesExt.multimodalFrames _),
    "multimodal_resize" -> (QueriesExt.multimodalResize _),
    "multimodal_dhash" -> (QueriesExt.multimodalDhash _),
    "multimodal_neardup" -> (QueriesExt.multimodalNeardup _),
    // real JDK WAV codec round-trip + windowed-energy VAD primitive
    "multimodal_audio" -> (QueriesExt.multimodalAudio _),
    "multimodal_audio_energy" -> (QueriesExt.multimodalAudioEnergy _),
    // perceptual audio fingerprint (sign-of-energy-delta) + near-dup
    "multimodal_audio_fp" -> (QueriesExt.multimodalAudioFp _),
    "multimodal_audio_neardup" -> (QueriesExt.multimodalAudioNeardup _),
    // video frame-container near-dup (per-frame dHash set overlap)
    "multimodal_video_neardup" -> (QueriesExt.multimodalVideoNeardup _),
    // A/V container demux: both streams of one real capture (video
    // frames + interleaved PCM soundtrack through the WAV bridge)
    "multimodal_av_demux" -> (QueriesExt.multimodalAvDemux _),
    "multimodal_mp4_demux" -> (QueriesExt.multimodalMp4Demux _),
    "multimodal_webm_demux" -> (QueriesExt.multimodalWebmDemux _),
    // corpus-learned BPE (trained merge table + real tokenization)
    "text_bpe_vocab" -> (QueriesExt.textBpeVocab _),
    "text_bpe_tokenize" -> (QueriesExt.textBpeTokenize _),
    "text_bpe_bytes" -> (QueriesExt.textBpeBytes _),
    "text_bpe_bytes_tokenize" -> (QueriesExt.textBpeBytesTokenize _),
    // corpus-learned unigram-LM (SentencePiece-family) tokenizer
    "text_unigram_vocab" -> (QueriesExt.textUnigramVocab _),
    "text_unigram_tokenize" -> (QueriesExt.textUnigramTokenize _),
    // trained nearest-class-profile classifier (model-based curation)
    "text_classify_profile" -> (QueriesExt.textClassifyProfile _),
    "text_langid_ngram" -> (QueriesExt.textLangidNgram _)
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "dim_populate_full"         -> Queries.dimPopulateFullSql,
    "dim_populate_multi"        -> Queries.dimPopulateMultiSql,
    "dim_populate_incremental"  -> Queries.dimPopulateIncrementalSql,
    "fact_populate_full"        -> Queries.factPopulateFullSql,
    "fact_populate_incremental" -> Queries.factPopulateIncrementalSql,
    "fact_populate_parent"      -> Queries.factPopulateParentSql,
    "fact_populate_tenant"      -> Queries.factPopulateTenantSql,
    "fact_rollup_hour"          -> Queries.factRollupHourSql,
    "fact_rollup_incremental"   -> Queries.factRollupIncrementalSql,
    "audit_referential"         -> Queries.auditReferentialSql,
    "skew_diagnose"             -> Queries.skewDiagnoseSql,
    "agg_count_distinct_exact"  -> Queries.aggCountDistinctExactSql,
    "sketch_count_distinct"     -> Queries.sketchCountDistinctSql,
    "sketch_intersection"       -> Queries.sketchIntersectionSql,
    "sketch_rolling_distinct"   -> Queries.sketchRollingDistinctSql,
    "dedup_minhash_lsh_verified" -> QueriesExt.dedupNgramJaccardSql,
    "dedup_simhash_verified"     -> QueriesExt.dedupSimhashVerifiedSql,
    "embed_knn_lsh_verified"     -> QueriesExt.embedKnnVerifiedSql,
    "embed_knn_ivf_verified"     -> QueriesExt.embedKnnVerifiedSql,
    "embed_knn_quantized_verified" -> QueriesExt.embedKnnVerifiedSql,
    "embed_knn_pq_verified"      -> QueriesExt.embedKnnVerifiedSql,
    "embed_knn_ivfpq_verified"   -> QueriesExt.embedKnnVerifiedSql,
    "embed_knn_ivf_stored"       -> QueriesExt.embedKnnVerifiedSql,
    "embed_knn_pq_stored"        -> QueriesExt.embedKnnVerifiedSql,
    "embed_knn_ivfpq_stored"     -> QueriesExt.embedKnnVerifiedSql,
    "embed_knn_ivfsq_stored"     -> QueriesExt.embedKnnVerifiedSql,
    "embed_knn_opq_stored"       -> QueriesExt.embedKnnVerifiedSql,
    "embed_knn_ivfopq_stored"    -> QueriesExt.embedKnnVerifiedSql,
    "ann_nights_stored"          -> QueriesExt.annNightsStoredSql,
    "ann_retrain_swap"           -> QueriesExt.annRetrainSwapSql,
    "derive_schemas"            -> Queries.deriveSchemasSql,
    "derive_dependencies"       -> Queries.deriveDependenciesSql,
    "validate_errors"           -> Queries.validateErrorsSql,
    "text_stats"                -> QueriesExt.textStatsSql,
    "text_normalize"            -> QueriesExt.textNormalizeSql,
    "text_extract_html"         -> QueriesExt.textExtractHtmlSql,
    "warc_extract"              -> QueriesExt.warcExtractSql,
    "warc_extract_binary"       -> QueriesExt.warcExtractBinarySql,
    "warc_charset_body"         -> QueriesExt.warcCharsetBodySql,
    "warc_revisit"              -> QueriesExt.warcRevisitSql,
    "crawl_robots_rules"        -> QueriesExt.crawlRobotsRulesSql,
    "crawl_robots_filter"       -> QueriesExt.crawlRobotsFilterSql,
    "crawl_recrawl_due"         -> QueriesExt.crawlRecrawlDueSql,
    "crawl_change_detect"       -> QueriesExt.crawlChangeDetectSql,
    "crawl_recrawl_adaptive"    -> QueriesExt.crawlRecrawlAdaptiveSql,
    "crawl_page_meta"           -> QueriesExt.crawlPageMetaSql,
    "decon_semantic"            -> QueriesExt.deconSemanticSql,
    "crawl_robots_delays"       -> QueriesExt.crawlRobotsDelaysSql,
    "crawl_schedule"            -> QueriesExt.crawlScheduleSql,
    "crawl_schedule_ranked"     -> QueriesExt.crawlScheduleRankedSql,
    "crawl_frontier_ranked"     -> QueriesExt.crawlFrontierRankedSql,
    "crawl_sitemap_urls"        -> QueriesExt.crawlSitemapUrlsSql,
    "warc_http_meta"            -> QueriesExt.warcHttpMetaSql,
    "crawl_extract_links"       -> QueriesExt.crawlExtractLinksSql,
    "crawl_link_graph"          -> QueriesExt.crawlLinkGraphSql,
    "crawl_html_meta"           -> QueriesExt.crawlHtmlMetaSql,
    "crawl_redirects"           -> QueriesExt.crawlRedirectsSql,
    "crawl_feed_items"          -> QueriesExt.crawlFeedItemsSql,
    "multimodal_sniff"          -> QueriesExt.multimodalSniffSql,
    "text_pack_sequences"       -> QueriesExt.textPackSequencesSql,
    "text_redact"               -> QueriesExt.textRedactSql,
    "text_url_normalize"        -> QueriesExt.textUrlNormalizeSql,
    "text_term_freq"            -> QueriesExt.textTermFreqSql,
    "text_postings"             -> QueriesExt.textPostingsSql,
    "text_tfidf"                -> QueriesExt.textTfidfSql,
    "text_bm25"                 -> QueriesExt.textBm25Sql,
    "events_topk"               -> QueriesEvents.eventsTopkSql,
    "text_chunks"               -> QueriesExt.textChunksSql,
    "text_pack"                 -> QueriesExt.textPackSql,
    "text_pack_budget"          -> QueriesExt.textPackBudgetSql,
    "text_curate"               -> QueriesExt.textCurateSql,
    "text_repetition"           -> QueriesExt.textRepetitionSql,
    "text_lm_score"             -> QueriesExt.textLmScoreSql,
    "table_profile"             -> QueriesExt.tableProfileSql,
    "table_profile_approx"      -> QueriesExt.tableProfileApproxSql,
    "table_moments"             -> QueriesExt.tableMomentsSql,
    "source_jsonl_roundtrip"    -> QueriesExt.sourceJsonlRoundtripSql,
    "table_moments_incremental" -> QueriesExt.tableMomentsSql,
    "decon_ngram_overlap"       -> QueriesExt.deconNgramOverlapSql,
    "decon_clean"               -> QueriesExt.deconCleanSql,
    "decon_bloom_clean"         -> QueriesExt.deconCleanSql,
    "text_heavy_hitters"        -> QueriesExt.textHeavyHittersSql,
    "events_sessionize"         -> QueriesEvents.eventsSessionizeSql,
    "events_sessionize_incremental" -> QueriesEvents.eventsSessionizeSql,
    "events_attribution"        -> QueriesEvents.eventsAttributionSql,
    "events_attribution_walk"   -> QueriesEvents.eventsAttributionSql,
    "events_asof_join"          -> QueriesEvents.eventsAsofJoinSql,
    "events_asof_tolerance"     -> QueriesEvents.eventsAsofToleranceSql,
    "events_asof_forward"       -> QueriesEvents.eventsAsofForwardSql,
    "events_debounce"           -> QueriesEvents.eventsDebounceSql,
    "events_paths"              -> QueriesEvents.eventsPathsSql,
    "events_anomaly"            -> QueriesEvents.eventsAnomalySql,
    "events_interval_join"      -> QueriesEvents.eventsIntervalJoinSql,
    "events_conversion"         -> QueriesEvents.eventsConversionSql,
    "events_zorder"             -> QueriesEvents.eventsZorderSql,
    "events_zorder3"            -> QueriesEvents.eventsZorder3Sql,
    "events_props_typed"        -> QueriesEvents.eventsPropsTypedSql,
    "events_histogram"          -> QueriesEvents.eventsHistogramSql,
    "events_histogram_equidepth" -> QueriesEvents.eventsHistogramEquidepthSql,
    "events_twa"                -> QueriesEvents.eventsTwaSql,
    "events_gapfill"            -> QueriesEvents.eventsGapfillSql,
    "events_winsorize"          -> QueriesEvents.eventsWinsorizeSql,
    "events_percent_rank"       -> QueriesEvents.eventsPercentRankSql,
    "events_robust_z"           -> QueriesEvents.eventsRobustZSql,
    "sample_splits_grouped"     -> QueriesExt.sampleSplitsGroupedSql,
    "sample_quantile_strata"    -> QueriesExt.sampleQuantileStrataSql,
    "dim_snapshot_diff"         -> QueriesEvents.dimSnapshotDiffSql,
    "dim_merge_latest"          -> QueriesEvents.dimMergeLatestSql,
    "embed_quantize"            -> QueriesExt.embedQuantizeSql,
    "embed_kmeans_assign"       -> QueriesExt.embedKmeansAssignSql,
    "embed_random_projection"   -> QueriesExt.embedRandomProjectionSql,
    "text_token_estimate"       -> QueriesExt.textTokenEstimateSql,
    "table_expectations"        -> QueriesExt.tableExpectationsSql,
    "text_diversity"            -> QueriesExt.textDiversitySql,
    "embed_knn_projected"       -> QueriesExt.embedKnnProjectedSql,
    "dim_scd2_history"          -> QueriesEvents.dimScd2HistorySql,
    "dim_scd2_incremental"      -> QueriesEvents.dimScd2HistorySql,
    "events_funnel"             -> QueriesEvents.eventsFunnelSql,
    "events_retention"          -> QueriesEvents.eventsRetentionSql,
    "events_percentiles"        -> QueriesEvents.eventsPercentilesSql,
    "events_percentiles_approx" -> QueriesEvents.eventsPercentilesApproxSql,
    "events_pivot"              -> QueriesEvents.eventsPivotSql,
    "sample_hash"               -> QueriesExt.sampleHashSql,
    "sample_splits"             -> QueriesExt.sampleSplitsSql,
    "sample_stratified"         -> QueriesExt.sampleStratifiedSql,
    "sample_domain_mix"         -> QueriesExt.sampleDomainMixSql,
    "sample_domain_mix_epochs"  -> QueriesExt.sampleDomainMixEpochsSql,
    "sample_weighted"           -> QueriesExt.sampleWeightedSql,
    "events_rolling"            -> QueriesEvents.eventsRollingSql,
    "events_cube"               -> QueriesEvents.eventsCubeSql,
    "events_transitions"        -> QueriesEvents.eventsTransitionsSql,
    "events_pagerank"           -> QueriesEvents.eventsPagerankSql,
    "events_pagerank10"         -> QueriesEvents.eventsPagerank10Sql,
    "graph_triangles"           -> QueriesEvents.graphTrianglesSql,
    "graph_kcore"               -> QueriesExt.graphKcoreSql,
    "graph_labelprop"           -> QueriesExt.graphLabelpropSql,
    "dedup_exact"               -> QueriesExt.dedupExactSql,
    "dedup_incremental"         -> QueriesExt.dedupIncrementalSql,
    "dedup_ngram_jaccard"       -> QueriesExt.dedupNgramJaccardSql,
    "text_winnow"               -> QueriesExt.textWinnowSql,
    "dedup_winnow_pairs"        -> QueriesExt.dedupWinnowPairsSql,
    "dedup_jaccard_prefix"      -> QueriesExt.dedupNgramJaccardSql,
    "dedup_jaccard_prefix_t08"  -> QueriesExt.dedupJaccardPrefixT08Sql,
    "text_dup_spans"            -> QueriesExt.textDupSpansSql,
    "text_dup_spans_remove"     -> QueriesExt.textDupSpansRemoveSql,
    "dedup_cluster"             -> QueriesExt.dedupClusterSql,
    "dedup_survivors"           -> QueriesExt.dedupSurvivorsSql,
    "dedup_survivors_best"      -> QueriesExt.dedupSurvivorsBestSql,
    "text_line_dedup"           -> QueriesExt.textLineDedupSql,
    "text_cooccurrence"         -> QueriesExt.textCooccurrenceSql,
    "sample_shuffle_shards"     -> QueriesExt.sampleShuffleShardsSql,
    "skew_salted_join"          -> QueriesExt.skewSaltedJoinSql,
    "embed_knn_brute"           -> QueriesExt.embedKnnBruteSql,
    "embed_cosine_neardup"      -> QueriesExt.embedCosineNearDupSql,
    "embed_semdedup"            -> QueriesExt.embedSemdedupSql,
    "embed_semdedup_flagged"    -> QueriesExt.embedSemdedupFlaggedSql,
    "multimodal_decode"         -> QueriesExt.multimodalDecodeSql,
    "multimodal_frames"         -> QueriesExt.multimodalFramesSql,
    "multimodal_av_demux"       -> QueriesExt.multimodalAvDemuxSql,
    "multimodal_mp4_demux"      -> QueriesExt.multimodalAvDemuxSql,
    "multimodal_webm_demux"     -> QueriesExt.multimodalAvDemuxSql,
    "multimodal_resize"         -> QueriesExt.multimodalResizeSql,
    "multimodal_dhash"          -> QueriesExt.multimodalDhashSql,
    "multimodal_neardup"        -> QueriesExt.multimodalNeardupSql,
    "multimodal_audio"          -> QueriesExt.multimodalAudioSql,
    "multimodal_audio_energy"   -> QueriesExt.multimodalAudioEnergySql,
    "multimodal_audio_fp"       -> QueriesExt.multimodalAudioFpSql,
    "multimodal_audio_neardup"  -> QueriesExt.multimodalAudioNeardupSql,
    "multimodal_video_neardup"  -> QueriesExt.multimodalVideoNeardupSql,
    "text_bpe_vocab"            -> QueriesExt.textBpeVocabSql,
    "text_unigram_vocab"        -> QueriesExt.textUnigramVocabSql,
    "text_unigram_tokenize"     -> QueriesExt.textUnigramTokenizeSql,
    "text_bpe_tokenize"         -> QueriesExt.textBpeTokenizeSql,
    "text_bpe_bytes"            -> QueriesExt.textBpeBytesSql,
    "text_bpe_bytes_tokenize"   -> QueriesExt.textBpeBytesTokenizeSql,
    "text_classify_profile"     -> QueriesExt.textClassifyProfileSql,
    "text_langid_ngram"         -> QueriesExt.textLangidNgramSql
  )
}
