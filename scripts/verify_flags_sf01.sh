#!/usr/bin/env bash
# Round-end sf0.1 flag re-verification (one command, see README):
# re-runs the data-dependent-flag queries at sf0.1 and asserts every
# self-verifying boolean flag is TRUE — the check that caught the
# round-5 PQ recall-budget regression, now scripted.
set -euo pipefail
cd "$(dirname "$0")/.."
SF="${1:-/root/testdata/sf0.1}"
OUT="${2:-/tmp/graft_flags_sf01}"
QUERIES="x_pq_ann,x_minhash_neardup,x_hll_rollup,x_approx_quantile,x_winnow_dedup,x_knn_blocked,x_ivfpq_ann,x_simhash,x_lsh_ann,x_neardedup_incremental,x_semdedup,x_hybrid_dedup,x_pca_power,x_pca_top2,x_pca_scores,x_rand_project,x_bigram_nll,x_dsir,x_temperature,x_dup_coverage,x_dedup_keepbest,x_tfidf_topk,x_tfidf_probe,x_rrf_fuse,x_phash_neardup,x_kmeans,x_char_entropy,x_video_neardup,x_leak_split,x_script_profile,x_funnel,x_retention,x_cluster_report,x_components,x_ppr,x_kcore,x_profile,x_event_spikes,x_ivf_probe,x_profile_approx,x_snapshot_diff,x_audio_neardup,x_funnel_deep,x_unigram_train,x_unigram_encode,x_ivf_append,x_audio_windows,x_hits,x_wordpiece,x_dbscan,x_attribution,x_pmi,x_transitions,x_compaction,x_interpolate,x_linkage,x_winsorize,x_drift,x_winsorize_lang,x_paths,x_sessions,x_multitouch,x_join_card,x_sssp,x_basket_pairs,x_kanon,x_trend,x_outliers,x_impute,x_retrieval_eval,x_token_shift,x_qbucket,x_diversity,x_funnel_latency,x_contingency,x_spearman,x_missingness,x_temporal_split,x_cohort_value,x_stickiness,r_hopping_window,x_html_extract,x_bpe_bytes,x_url_canon,x_domain_stats,x_vocab_coverage,x_curation_funnel,x_link_graph,x_nfc,x_pagerank,x_auc,x_reliability,x_confusion,x_resolve_links,x_psl_domains,x_auc_by_group,x_confusion_by_group,x_reliability_by_group,x_trigram_nll,x_kn_nll,x_drift_by_group,x_tfidf_append,x_qbucket_by_lang,x_ppl_buckets,x_moments_append,x_robots_gate,x_shard"

SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-16}" SPARK_GRAFT_QUERIES="$QUERIES" \
  sbt -batch "runMain graft.Verify $SF $OUT"
python3 scripts/check_flags.py "$OUT" x_pq_ann x_minhash_neardup x_hll_rollup \
  x_approx_quantile x_winnow_dedup x_knn_blocked x_ivfpq_ann x_simhash x_lsh_ann \
  x_neardedup_incremental
# Exact-chain queries (no probabilistic flag): their sf0.1 re-proof is
# the full DuckDB oracle, feasible because no chain here is quadratic in
# the corpus (block-local pairs, dim-sized PCA frames, bucket models).
python3 scripts/check.py "$SF" "$OUT" x_semdedup x_hybrid_dedup x_pca_power \
  x_pca_top2 x_pca_scores x_rand_project x_bigram_nll x_dsir x_temperature \
  x_dup_coverage x_dedup_keepbest x_tfidf_topk x_tfidf_probe x_rrf_fuse \
  x_phash_neardup x_kmeans x_char_entropy x_video_neardup x_leak_split \
  x_script_profile x_funnel x_retention x_cluster_report x_components \
  x_ppr x_kcore x_profile x_event_spikes x_ivf_probe x_profile_approx \
  x_audio_neardup x_funnel_deep x_unigram_train x_unigram_encode x_ivf_append \
  x_audio_windows x_hits x_wordpiece x_dbscan x_attribution x_pmi x_transitions x_compaction x_interpolate x_linkage x_winsorize x_drift x_winsorize_lang x_paths x_sessions x_multitouch x_join_card \
  x_sssp x_basket_pairs x_kanon x_trend x_outliers x_impute \
  x_retrieval_eval x_token_shift x_qbucket x_diversity x_funnel_latency \
  x_contingency x_spearman x_missingness x_temporal_split x_cohort_value \
  x_stickiness r_hopping_window \
  x_html_extract x_bpe_bytes x_url_canon x_domain_stats x_vocab_coverage \
  x_curation_funnel x_link_graph x_nfc x_pagerank x_auc x_reliability x_confusion \
  x_resolve_links x_psl_domains x_auc_by_group x_confusion_by_group \
  x_reliability_by_group x_trigram_nll x_kn_nll x_drift_by_group x_tfidf_append \
  x_qbucket_by_lang x_ppl_buckets x_moments_append x_robots_gate x_shard x_snapshot_diff
