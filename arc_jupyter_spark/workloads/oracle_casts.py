"""Oracle-side BIGINT casts closing the driver's HUGEINT channel.

DuckDB types SUM(<integer>) as HUGEINT (int128); the driver fetches
oracle results via pandas/Arrow, where HUGEINT converts to float64
while Spark's side stays int64 — the driver's order-insensitive value
hash then diverges on representation (``4160`` vs ``4160.0``) even
when values are bit-identical (round-3 verdict: 26/50 sampled rows
lost to exactly this; 61/172 latent).

``ORACLE_CASTS`` maps query name -> (full oracle column list, the
int-family columns needing ``CAST(.. AS BIGINT)``). It is generated
by ``tools/dtype_sweep.py --emit-map`` (which compares the Spark
result schema against the pandas dtypes of the oracle fetched with
``.df()``) and consumed by ``workloads.oracle_sql()``, which wraps
each flagged oracle in a plain ANSI outer SELECT applying the casts.
Re-run the sweep after adding queries; ``tools/selfcheck.py``
mirrors the same dtype comparison as a gate.
"""

from __future__ import annotations

ORACLE_CASTS: dict[str, tuple[tuple[str, ...], frozenset[str]]] = {
    "d09_keep_best_dedup": (
        ("source", "n_kept", "tok_kept", "id_sum",),
        frozenset({"id_sum", "tok_kept"}),
    ),
    "d11_passage_dedup": (
        ("source", "n_passages", "n_kept", "kept_tokens",),
        frozenset({"kept_tokens", "n_kept"}),
    ),
    "d14_url_dedup": (
        ("source", "n_kept", "id_sum", "canon_len_sum",),
        frozenset({"canon_len_sum", "id_sum"}),
    ),
    "d15_dup_profile": (
        ("cluster_size", "n_clusters", "n_docs",),
        frozenset({"n_docs"}),
    ),
    "m02_image_features": (
        ("source", "n", "sum_f0_e8", "sum_f1_e8",),
        frozenset({"sum_f0_e8", "sum_f1_e8"}),
    ),
    "m04_audio_meta": (
        ("source", "n_clips", "total_samples", "n_stereo", "total_ms", "max_rate",),
        frozenset({"n_stereo", "total_ms", "total_samples"}),
    ),
    "m05_media_gate_join": (
        ("source", "n_kept", "sum_tokens", "sum_chars",),
        frozenset({"sum_chars", "sum_tokens"}),
    ),
    "m07_scene_change": (
        ("source", "n_videos", "n_frames", "n_scenes",),
        frozenset({"n_scenes"}),
    ),
    "m08_phash_near_dup": (
        ("source", "n_pairs", "id_a_sum", "hamming_sum",),
        frozenset({"id_a_sum"}),
    ),
    "p01_corpus_pipeline": (
        ("lang", "n_docs", "total_cost", "id_sum",),
        frozenset({"id_sum", "total_cost"}),
    ),
    "p02_media_pack_pipeline": (
        ("source", "n_docs", "n_seqs", "total_tokens", "bin_checksum",),
        frozenset({"bin_checksum", "total_tokens"}),
    ),
    "p04_privacy_pipeline": (
        ("shard", "n_docs", "tok_sum", "clean_checksum",),
        frozenset({"clean_checksum", "tok_sum"}),
    ),
    "p06_epoch_mixture": (
        ("source", "epoch", "n_rows", "id_sum",),
        frozenset({"id_sum"}),
    ),
    "p07_crawl_pipeline": (
        ("shard", "n_docs", "n_code", "id_sum", "char_sum", "clean_checksum",),
        frozenset({"char_sum", "clean_checksum", "id_sum", "n_code"}),
    ),
    "q15_string_funcs": (
        ("c_mktsegment", "n", "avg_name_len_e4", "min_prefix", "n_with_one", "max_tag",),
        frozenset({"n_with_one"}),
    ),
    "q38_null_funcs": (
        ("n", "n_flag_n", "disc_with_default",),
        frozenset({"n_flag_n"}),
    ),
    "q56_arc_pipeline": (
        ("l_returnflag", "n", "revenue_e2",),
        frozenset({"revenue_e2"}),
    ),
    "q57_bucketed_join": (
        ("o_orderpriority", "n_lines", "revenue_e2",),
        frozenset({"revenue_e2"}),
    ),
    "q58_arc_udfs": (
        ("sum_i0", "sum_i1", "sum_price_floor", "n",),
        frozenset({"sum_i0", "sum_i1", "sum_price_floor"}),
    ),
    "q59_distribute_by": (
        ("l_suppkey", "n_lines", "price_e2",),
        frozenset({"price_e2"}),
    ),
    "q60_delimited_extract": (
        ("o_orderstatus", "n", "key_sum", "cust_sum",),
        frozenset({"cust_sum", "key_sum"}),
    ),
    "q62_multi_format_union": (
        ("o_orderstatus", "n", "key_sum",),
        frozenset({"key_sum"}),
    ),
    "q64_pipeline_execute": (
        ("n_regionkey", "n_nations", "key_sum",),
        frozenset({"key_sum"}),
    ),
    "q65_http_transform": (
        ("n", "resp_sum",),
        frozenset({"resp_sum"}),
    ),
    "q66_jdbc_roundtrip": (
        ("n_regionkey", "n", "key_sum",),
        frozenset({"key_sum"}),
    ),
    "q69_ml_transform": (
        ("n_regionkey", "score_sum", "n",),
        frozenset({"score_sum"}),
    ),
    "q72_scd2_intervals": (
        ("user_id", "n_versions", "n_open", "total_ms",),
        frozenset({"n_open"}),
    ),
    "q75_incremental_agg": (
        ("o_orderpriority", "n_merged", "total_merged", "consistent",),
        frozenset({"n_merged"}),
    ),
    "q77_dynamic_partition_pruning": (
        ("name", "n", "cents", "dpp_used",),
        frozenset({"cents"}),
    ),
    "q79_interval_range_frame": (
        ("user_id", "ts", "n_trailing_hour", "tot_e6",),
        frozenset({"tot_e6"}),
    ),
    "q80_dq_report": (
        ("rule_name", "col_name", "n_violations", "n_rows", "passed",),
        frozenset({"n_violations"}),
    ),
    "q82_exact_median": (
        ("l_returnflag", "n", "median_x2_qty", "median_x2_cents",),
        frozenset({"median_x2_cents", "median_x2_qty"}),
    ),
    "q85_key_skew_profile": (
        ("n_keys", "n_rows", "max_per_key", "min_per_key", "p50_per_key", "p99_per_key", "heaviest_key", "balance_gap",),
        frozenset({"balance_gap", "heaviest_key", "n_rows", "p50_per_key", "p99_per_key"}),
    ),
    "q86_ivm_join": (
        ("o_orderpriority", "n", "qty_sum", "cents_sum",),
        frozenset({"cents_sum", "qty_sum"}),
    ),
    "st03_sliding_window": (
        ("window_start", "event_type", "n", "sum_value_e6",),
        frozenset({"sum_value_e6"}),
    ),
    "st04_stream_join": (
        ("click_hour", "n_pairs", "sum_purchase_e2", "min_delay_s", "max_delay_s",),
        frozenset({"sum_purchase_e2"}),
    ),
    "st06_stream_sessions": (
        ("user_id", "session_start", "n_events", "session_value_e6",),
        frozenset({"session_value_e6"}),
    ),
    "st07_stream_sink": (
        ("event_type", "n", "sum_value_e6",),
        frozenset({"sum_value_e6"}),
    ),
    "t05_corpus_filter": (
        ("lang", "n_docs", "n_kept", "sum_sr_e8",),
        frozenset({"n_kept", "sum_sr_e8"}),
    ),
    "t06_redaction": (
        ("source", "n_redactions", "n_docs_hit", "total_len_after",),
        frozenset({"n_docs_hit", "n_redactions", "total_len_after"}),
    ),
    "t07_repetition": (
        ("source", "n_docs", "sum_dupfrac_e8", "sum_topbigram_e8",),
        frozenset({"sum_dupfrac_e8", "sum_topbigram_e8"}),
    ),
    "t08_stratified_sample": (
        ("lang", "n_kept", "id_sum",),
        frozenset({"id_sum"}),
    ),
    "t09_budget_select": (
        ("source", "n_docs", "spent", "id_sum",),
        frozenset({"id_sum", "spent"}),
    ),
    "t10_tfidf_topterm": (
        ("source", "n_docs", "n_distinct_top", "alpha_first", "alpha_last", "sum_top_tf",),
        frozenset({"sum_top_tf"}),
    ),
    "t11_decontaminate": (
        ("source", "n_docs", "n_contaminated", "max_shared", "sum_shared",),
        frozenset({"sum_shared"}),
    ),
    "t12_mixture_sample": (
        ("lang", "n_docs", "weight_e6", "alloc_docs", "n_sampled",),
        frozenset({"alloc_docs", "weight_e6"}),
    ),
    "t13_seq_pack": (
        ("source", "n_docs", "n_seqs", "n_split_docs", "total_tokens", "bin_checksum",),
        frozenset({"bin_checksum", "n_split_docs", "total_tokens"}),
    ),
    "t14_token_rarity": (
        ("doc_id", "sum_rarity", "n_tokens",),
        frozenset({"sum_rarity"}),
    ),
    "t15_vocab_stats": (
        ("source", "vocab", "hapax", "total_tokens",),
        frozenset({"hapax", "total_tokens"}),
    ),
    "t16_quality_decile": (
        ("source", "n_kept", "min_score", "max_score", "id_sum",),
        frozenset({"id_sum"}),
    ),
    "t17_source_cap": (
        ("source", "n_kept", "tok_kept", "id_sum",),
        frozenset({"id_sum", "tok_kept"}),
    ),
    "t18_shard_assign": (
        ("shard", "n_docs", "tok_sum", "min_id", "max_id",),
        frozenset({"tok_sum"}),
    ),
    "t19_span_scrub": (
        ("source", "n_docs", "kept_tokens", "text_checksum",),
        frozenset({"kept_tokens", "text_checksum"}),
    ),
    "t26_bigram_surprisal": (
        ("doc_id", "sum_surprisal", "n_bigrams",),
        frozenset({"sum_surprisal"}),
    ),
    "t27_pii_scrub": (
        ("source", "n_email", "n_phone", "n_ipv4", "n_docs_with_pii", "clean_checksum",),
        frozenset({"clean_checksum", "n_docs_with_pii", "n_email", "n_ipv4", "n_phone"}),
    ),
    "t28_dataset_card": (
        ("lang", "n_docs", "total_tokens", "min_tokens", "max_tokens", "n_unique", "n_exact_dups",),
        frozenset({"total_tokens"}),
    ),
    "t31_domain_blocklist": (
        ("source", "n_kept", "min_id", "id_sum",),
        frozenset({"id_sum"}),
    ),
    "t32_html_clean": (
        ("source", "n_docs", "clean_len_sum", "anchor_sum", "n_link_heavy",),
        frozenset({"anchor_sum", "clean_len_sum", "n_link_heavy"}),
    ),
    "t33_code_detect": (
        ("source", "n_code", "n_prose", "score_sum",),
        frozenset({"n_code", "n_prose", "score_sum"}),
    ),
    "t34_hist_quantile": (
        ("q_label", "bin", "bin_lo", "cum_n", "n_total", "merge_exact",),
        frozenset({"cum_n", "n_total"}),
    ),
}


def apply_oracle_casts(name: str, sql: str) -> str:
    """Wrap ``sql`` with an outer SELECT casting flagged columns to
    BIGINT; identity for unflagged queries."""
    if name not in ORACLE_CASTS:
        return sql
    cols, casts = ORACLE_CASTS[name]
    sel = ", ".join(
        f"CAST({c} AS BIGINT) AS {c}" if c in casts else c for c in cols
    )
    return f"SELECT {sel} FROM ({sql}) AS _uncast"
