package graft

import graft.queries.{Oracles, Queries}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * `queries` maps every implemented operator from SURVEY.md §2 to a
  * runnable query; `oracleSql` holds the DuckDB-equivalent SQL for the
  * hash-compare correctness gate.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The flagship is the genotyping pipeline itself: discovery, interval
    * join, observer kernel, broadcast score join, wide agg, emission.
    */
  def entry(spark: SparkSession): DataFrame =
    Queries.g2_genotype_calls(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s1_scan_prune" -> (Queries.s1_scan_prune _),
    "s9_gen_dimtable" -> (Queries.s9_gen_dimtable _),
    "p1_filter_conj" -> (Queries.p1_filter_conj _),
    "p2_regex_pred" -> (Queries.p2_regex_pred _),
    "p3_cond_rewrite" -> (Queries.p3_cond_rewrite _),
    "p6_hard_filter_annotate" -> (Queries.p6_hard_filter_annotate _),
    "p6b_filter_matrix" -> (Queries.p6b_filter_matrix _),
    "p8_clamp" -> (Queries.p8_clamp _),
    "j1_interval_point_bcast" -> (Queries.j1_interval_point_bcast _),
    "j2_interval_overlap_shuffle" -> (Queries.j2_interval_overlap_shuffle _),
    "j3_bcast_equijoin" -> (Queries.j3_bcast_equijoin _),
    "j4_semi_join" -> (Queries.j4_semi_join _),
    "j5_anti_join" -> (Queries.j5_anti_join _),
    "j6_pivot" -> (Queries.j6_pivot _),
    "a1_distinct" -> (Queries.a1_distinct _),
    "a2_group_having" -> (Queries.a2_group_having _),
    "a3_wide_agg" -> (Queries.a3_wide_agg _),
    "a4_dedup_keys" -> (Queries.a4_dedup_keys _),
    "a5_typed_agg" -> (Queries.a5_typed_agg _),
    "a6_ratio_agg" -> (Queries.a6_ratio_agg _),
    "a7_array_agg" -> (Queries.a7_array_agg _),
    "a8_rollup" -> (Queries.a8_rollup _),
    "t5_json_extract" -> (Queries.t5_json_extract _),
    "w1_sort_limit" -> (Queries.w1_sort_limit _),
    "w2_running_sum" -> (Queries.w2_running_sum _),
    "w4_top2_margin" -> (Queries.w4_top2_margin _),
    "u1_union" -> (Queries.u1_union _),
    "u3_token_intersect" -> (Queries.u3_token_intersect _),
    "t1_token_count" -> (Queries.t1_token_count _),
    "t2_quality_score" -> (Queries.t2_quality_score _),
    "t3_lang_id" -> (Queries.t3_lang_id _),
    "t4_fingerprint" -> (Queries.t4_fingerprint _),
    "t6_tfidf_topterms" -> (Queries.t6_tfidf_topterms _),
    "t7_repetition" -> (Queries.t7_repetition _),
    "d1_dedup_exact" -> (Queries.d1_dedup_exact _),
    "d2_ngram_jaccard_pairs" -> (Queries.d2_ngram_jaccard_pairs _),
    "e1_cosine_score" -> (Queries.e1_cosine_score _),
    "ev1_time_window_agg" -> (Queries.ev1_time_window_agg _),
    "ev2_sessionize" -> (Queries.ev2_sessionize _),
    "ev3_stream_window" -> (Queries.ev3_stream_window _),
    "ev4_stream_sessions" -> (Queries.ev4_stream_sessions _),
    "ev5_stream_enrich" -> (Queries.ev5_stream_enrich _),
    "ev6_stream_dedup" -> (Queries.ev6_stream_dedup _),
    "ev7_asof_enrich" -> (Queries.ev7_asof_enrich _),
    "ev8_stream_asof_enrich" -> (Queries.ev8_stream_asof_enrich _),
    "ev9_stream_stream_join" -> (Queries.ev9_stream_stream_join _),
    "g1_discover_variants" -> (Queries.g1_discover_variants _),
    "g2_genotype_calls" -> (Queries.g2_genotype_calls _),
    "g3_realign" -> (Queries.g3_realign _),
    "g4_joint_recall" -> (Queries.g4_joint_recall _),
    "g6_gvcf_squareoff" -> (Queries.g6_gvcf_squareoff _),
    "g5_trio_phase" -> (Queries.g5_trio_phase _),
    "w3_coverage_cap" -> (Queries.w3_coverage_cap _),
    "d3_minhash_lsh_pairs" -> (Queries.d3_minhash_lsh_pairs _),
    "d4_simhash_pairs" -> (Queries.d4_simhash_pairs _),
    "e2_ann_topk" -> (Queries.e2_ann_topk _),
    "e3_embedding_dedup" -> (Queries.e3_embedding_dedup _),
    "e12_lsh_neardup" -> (Queries.e12_lsh_neardup _),
    "e4_ivf_topk" -> (Queries.e4_ivf_topk _),
    "e5_kmeans_step" -> (Queries.e5_kmeans_step _),
    "e6_ann_recall" -> (Queries.e6_ann_recall _),
    "e7_quantized_topk" -> (Queries.e7_quantized_topk _),
    "e8_hamming_topk" -> (Queries.e8_hamming_topk _),
    "d5_dup_ngrams" -> (Queries.d5_dup_ngrams _),
    "d6_decontaminate" -> (Queries.d6_decontaminate _),
    "d7_dup_clusters" -> (Queries.d7_dup_clusters _),
    "c1_clean_corpus" -> (Queries.c1_clean_corpus _),
    "c2_sample_mix" -> (Queries.c2_sample_mix _),
    "c4_temperature_mix" -> (Queries.c4_temperature_mix _),
    "c5_domain_cap" -> (Queries.c5_domain_cap _),
    "t8_pii_redact" -> (Queries.t8_pii_redact _),
    "t10_length_quantiles" -> (Queries.t10_length_quantiles _),
    "d8_dup_spans" -> (Queries.d8_dup_spans _),
    "d9_bloom_decontaminate" -> (Queries.d9_bloom_decontaminate _),
    "t11_quality_filter" -> (Queries.t11_quality_filter _),
    "c6_shard_manifest" -> (Queries.c6_shard_manifest _),
    "c7_training_order" -> (Queries.c7_training_order _),
    "c9_prepare_shards" -> (Queries.c9_prepare_shards _),
    "c10_chunk_documents" -> (Queries.c10_chunk_documents _),
    "t13_token_estimate" -> (Queries.t13_token_estimate _),
    "c11_split_assign" -> (Queries.c11_split_assign _),
    "c12_epoch_upsample" -> (Queries.c12_epoch_upsample _),
    "c13_cdc_upsert" -> (Queries.c13_cdc_upsert _),
    "c14_snapshot_diff" -> (Queries.c14_snapshot_diff _),
    "ev13_stream_cdc_upsert" -> (Queries.ev13_stream_cdc_upsert _),
    "ev14_stream_quality_gate" -> (Queries.ev14_stream_quality_gate _),
    "t14_bpe_pairs" -> (Queries.t14_bpe_pairs _),
    "t15_quality_classifier" -> (Queries.t15_quality_classifier _),
    "t16_subword_tokenize" -> (Queries.t16_subword_tokenize _),
    "j7_salted_join" -> (Queries.j7_salted_join _),
    "t12_lm_perplexity" -> (Queries.t12_lm_perplexity _),
    "d10_incremental_dedup" -> (Queries.d10_incremental_dedup _),
    "d11_incremental_minhash" -> (Queries.d11_incremental_minhash _),
    "d12_cluster_keepers" -> (Queries.d12_cluster_keepers _),
    "d13_semantic_prune" -> (Queries.d13_semantic_prune _),
    "d14_contamination_score" -> (Queries.d14_contamination_score _),
    "d15_containment_pairs" -> (Queries.d15_containment_pairs _),
    "d16_dupgraph_rank" -> (Queries.d16_dupgraph_rank _),
    "t17_hll_distinct" -> (Queries.t17_hll_distinct _),
    "ev10_stream_incremental_dedup" -> (Queries.ev10_stream_incremental_dedup _),
    "ev11_stream_neardup" -> (Queries.ev11_stream_neardup _),
    "ev12_stream_ann" -> (Queries.ev12_stream_ann _),
    "e10_kmeans_train" -> (Queries.e10_kmeans_train _),
    "e11_pq_topk" -> (Queries.e11_pq_topk _),
    "e13_ivfpq_topk" -> (Queries.e13_ivfpq_topk _),
    "e14_pq_recall" -> (Queries.e14_pq_recall _),
    "e15_ivfpq_recall" -> (Queries.e15_ivfpq_recall _),
    "t9_url_stats" -> (Queries.t9_url_stats _),
    "c3_pack_sequences" -> (Queries.c3_pack_sequences _),
    "m1_multimodal_meta" -> (Queries.m1_multimodal_meta _),
    "m2_frame_sample" -> (Queries.m2_frame_sample _),
    "m3_image_decode" -> (Queries.m3_image_decode _),
    "m4_image_dhash" -> (Queries.m4_image_dhash _),
    "m5_audio_decode" -> (Queries.m5_audio_decode _),
    "m6_image_neardup" -> (Queries.m6_image_neardup _),
    "m7_mp4_frames" -> (Queries.m7_mp4_frames _),
    "m8_image_neardup_scaled" -> (Queries.m8_image_neardup_scaled _),
    "m9_audio_neardup" -> (Queries.m9_audio_neardup _),
    "e9_batch_ann" -> (Queries.e9_batch_ann _)
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Oracles.sql
}
