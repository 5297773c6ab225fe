"""Operator-dense composite queries.

The driver's correctness gate records at most ~50 queries (CORRECTNESS_r01
had exactly 50 entries of 80 declared), so every operator must land inside
one of <=50 declared entries.  This module folds the narrow
queries into 37 composites; the 13 widest queries stay standalone (see
`e02_spark.queries.all_queries`) — 50 declared entries total (the
driver's recording cap).  Every underlying query function and its
oracle SQL is unchanged — a composite is a UNION of its parts normalized to
a shared schema:

    part: string        -- which sub-query the row came from
    s1..sK: string      -- the part's string/boolean columns, in order
    n1..nM: double      -- the part's numeric columns, in order

The DuckDB oracle for a composite is generated from the SAME column-kind
spec, so the casts are mirrored exactly (VARCHAR <-> string cast,
DOUBLE <-> double cast, NULL padding on both sides).  bigint -> double is
exact for every value here (counts and keys far below 2**53); booleans cast
to 'true'/'false' on both engines.  A composite where any part is
rows-only (no oracle) is itself rows-only.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, functions as F

from . import (
    curation_q,
    depgraph_q,
    kimball_q,
    llm_q,
    relational,
    relational2,
    relational3,
    streaming_q,
)

_MODULES = (
    relational,
    relational2,
    relational3,
    kimball_q,
    depgraph_q,
    llm_q,
    curation_q,
    streaming_q,
)

_ALL_Q = {}
_ALL_O = {}
for _m in _MODULES:
    _ALL_Q.update(_m.QUERIES)
    _ALL_O.update(_m.ORACLE)


# Per part: (tag, query_name, [(column, kind)]) with kind "s" (string-ish:
# string or boolean, cast to string/VARCHAR) or "n" (numeric, cast to
# double/DOUBLE).  Column lists mirror each part's output schema exactly;
# tests/test_oracle_parity.py re-verifies the whole registry per run.
SPEC: dict[str, list[tuple[str, str, list[tuple[str, str]]]]] = {
    # D3 inner equi-join + D4 broadcast join
    "q05_join_strategies": [
        ("q05", "q05_join_orders_customer",
         [("c_mktsegment", "s"), ("o_orderstatus", "s"), ("n_orders", "n"), ("total_revenue", "n")]),
        ("q06", "q06_broadcast_dims",
         [("r_name", "s"), ("n_name", "s"), ("n_suppliers", "n"), ("total_acctbal", "n")]),
    ],
    # D5 left/right outer + full outer
    "q07_outer_joins": [
        ("q07", "q07_outer_join_nulls",
         [("c_custkey", "n"), ("c_mktsegment", "s"), ("n_orders", "n"), ("total_spent", "n")]),
        ("q50", "q50_full_outer", [("side", "s"), ("n", "n")]),
        # round 6: fuzz-promoted FULL OUTER null/dangling-key shape
        ("q103", "q103_fuzz_full_outer_nullkeys",
         [("ok", "n"), ("lk", "n"), ("price_c", "n"), ("qty", "n")]),
        # round 8: fuzz-promoted NOT-IN/IN over nullable keys (the
        # three-valued-logic ExistenceJoin edges, deterministic)
        ("q115", "q115_fuzz_null_in_subquery",
         [("branch", "s"), ("n_rows", "n"), ("id_sum", "n")]),
    ],
    # A10+ source-format matrix: CSV + ORC + XML write/read roundtrips,
    # each oracle-checked against the same aggregation on parquet (green
    # iff the roundtrip is lossless). Entry keeps the historical q64 name.
    "q64_csv_roundtrip": [
        ("q64", "q64_csv_roundtrip",
         [("nationkey", "n"), ("n_suppliers", "n"), ("total_bal", "n"),
          ("first_supplier", "s")]),
        ("q106", "q106_orc_roundtrip",
         [("nationkey", "n"), ("n_suppliers", "n"), ("max_bal", "n"),
          ("last_supplier", "s")]),
        ("q107", "q107_xml_roundtrip",
         [("nationkey", "n"), ("n_suppliers", "n"), ("sum_bal", "n"),
          ("min_suppkey", "n")]),
    ],
    # near-dup cluster resolution (large-star/small-star CC) + the
    # integer-exact PageRank over the same pair graph (iterative
    # algorithm, zero floating point, fully hash-checkable)
    "q92_dedup_clusters_star": [
        ("q92", "q92_dedup_clusters_star",
         [("doc_id", "n"), ("cluster_id", "n"), ("cluster_size", "n"),
          ("keep", "s")]),
        ("q108", "q108_pagerank",
         [("node", "n"), ("deg", "n"), ("score", "n")]),
    ],
    # D6 semi/anti EXISTS + D19 set ops
    "q08_set_semantics": [
        ("q08", "q08_semi_anti_exists", [("category", "s"), ("n", "n")]),
        ("q15", "q15_set_ops", [("category", "s"), ("n", "n")]),
    ],
    # D7/D8 theta/range join + D9 as-of join
    "q09_temporal_joins": [
        ("q09", "q09_interval_join_pairs",
         [("type_a", "s"), ("type_b", "s"), ("n_pairs", "n")]),
        ("q10", "q10_asof_latest_view",
         [("purchase_id", "n"), ("user_id", "n"), ("last_view_id", "n"), ("secs_since_view", "n")]),
    ],
    # D12 ROLLUP + GROUPING SETS + D13 HAVING with lead/first_value
    # (q51 folded from standalone in round 10 to free the entry slot the
    # q116 lakehouse-merge family now occupies)
    "q11_rollup_grouping": [
        ("q11", "q11_rollup",
         [("returnflag", "s"), ("linestatus", "s"), ("sum_qty", "n"), ("n_rows", "n")]),
        ("q58", "q58_grouping_sets",
         [("o_orderpriority", "s"), ("o_orderstatus", "s"), ("level_id", "n"),
          ("n_orders", "n"), ("revenue", "n")]),
        ("q51", "q51_having_lead",
         [("yr", "n"), ("mo", "n"), ("revenue", "n"), ("n_orders", "n"),
          ("next_month_revenue", "n"), ("first_month_revenue", "n")]),
    ],
    # D18 top-k per group + max_by/min_by argmax
    "q13_topk_argmax": [
        ("q13", "q13_topk_per_group",
         [("c_mktsegment", "s"), ("rk", "n"), ("o_orderkey", "n"), ("o_totalprice", "n")]),
        ("q63", "q63_argmax",
         [("nationkey", "n"), ("n_customers", "n"), ("richest", "s"), ("poorest", "s")]),
    ],
    # D15/D16 ROWS frames + RANGE frames
    "q14_window_frames": [
        ("q14", "q14_moving_window",
         [("day", "s"), ("revenue", "n"), ("moving_avg_7d", "n"),
          ("running_total", "n"), ("prev_day_revenue", "n")]),
        ("q61", "q61_range_frame",
         [("l_returnflag", "s"), ("qty", "n"), ("n_within_5", "n"), ("price_within_5", "n")]),
    ],
    # D20 string functions + listagg/string_agg
    "q16_string_ops": [
        ("q16", "q16_string_funcs",
         [("p_partkey", "n"), ("name_upper", "s"), ("name_prefix", "s"), ("name_len", "n"),
          ("brand_type", "s"), ("brand_num", "n"), ("name_snake", "s"), ("first_word", "s"),
          ("type_lower", "s")]),
        ("q59", "q59_string_agg",
         [("n_name", "s"), ("n_customers", "n"), ("segments", "s"),
          ("first_name", "s"), ("last_name", "s")]),
    ],
    # D24 map + D25 JSON + VARIANT
    "q22_semistructured": [
        ("q22", "q22_json_props",
         [("event_type", "s"), ("sum_k", "n"), ("min_k", "n"), ("max_k", "n"), ("n", "n")]),
        ("q48", "q48_json_map_funcs",
         [("event_type", "s"), ("sum_k", "n"), ("max_keys", "n"), ("n", "n")]),
        ("q70", "q70_variant_props",
         [("event_type", "s"), ("n_events", "n"), ("n_with_k", "n"),
          ("sum_k", "n"), ("max_k", "n")]),
    ],
    # D21 date rollup + month-sequence generator
    "q23_calendar": [
        ("q23", "q23_date_rollup",
         [("yr", "n"), ("mo", "n"), ("n_orders", "n"), ("revenue", "n")]),
        ("q47", "q47_month_generator", [("month", "s"), ("n_active_orders", "n")]),
    ],
    # E10 tumbling + E12 session + E11 sliding windows (batch twins)
    "q24_time_windows": [
        ("q24", "q24_tumbling_hourly",
         [("hour_start", "s"), ("event_type", "s"), ("n_events", "n"), ("total_value", "n")]),
        ("q25", "q25_session_gap",
         [("user_id", "n"), ("n_sessions", "n"), ("max_session_events", "n")]),
        ("q54", "q54_sliding_window",
         [("window_start", "s"), ("event_type", "s"), ("n_events", "n"), ("total_value", "n")]),
    ],
    # D29 pivot + unpivot/CTE
    "q30_pivot_unpivot": [
        ("q30", "q30_pivot_event_types",
         [("user_id", "n"), ("n_view", "n"), ("n_click", "n"), ("n_signup", "n"),
          ("n_purchase", "n"), ("n_error", "n")]),
        ("q44", "q44_cte_unpivot",
         [("c_mktsegment", "s"), ("status", "s"), ("revenue", "n")]),
    ],
    # D11 approx distinct + D30 sampling + Spark-ML MinHashLSH — all
    # property-checked (booleans / exact-verified pairs), so the composite
    # is fully oracle-checkable despite exercising approximate operators
    "q32_approx_sample": [
        ("q32", "q32_approx_distinct",
         [("l_returnflag", "s"), ("approx_ok", "s"), ("n_rows", "n")]),
        ("q33", "q33_sample", [("l_returnflag", "s"), ("sample_ok", "s")]),
        ("q52", "q52_ml_minhash_lsh",
         [("da", "n"), ("db", "n"), ("jaccard", "n")]),
    ],
    # D27 scalar/correlated subqueries + LATERAL
    "q43_subquery_lateral": [
        ("q43", "q43_subqueries",
         [("c_mktsegment", "s"), ("n_customers", "n"), ("total_bal", "n")]),
        ("q71", "q71_lateral_topn",
         [("n_name", "s"), ("c_name", "s"), ("c_acctbal", "n")]),
    ],
    # D22 math + D14 ranking windows + cume_dist/percent_rank
    "q45_rank_math": [
        ("q45", "q45_math_rank_funcs",
         [("p_partkey", "n"), ("sqrt_price", "n"), ("ln_price", "n"), ("size_dist", "n"),
          ("price_bucket", "n"), ("price_floor", "n"), ("size_hi", "n"), ("size_lo", "n"),
          ("price_rank", "n"), ("quartile", "n"), ("nn_rank", "n")]),
        ("q60", "q60_rank_distribution",
         [("p_size", "n"), ("p_partkey", "n"), ("price_bin", "n"),
          ("pr", "n"), ("cd", "n"), ("bin_n", "n")]),
    ],
    # D10 percentiles/moments + D11 exact COUNT(DISTINCT)
    "q55_agg_stats": [
        ("q55", "q55_percentiles",
         [("o_orderstatus", "s"), ("median_price", "n"), ("p90_price", "n"),
          ("min_price", "n"), ("max_price", "n")]),
        ("q56", "q56_moment_stats",
         [("l_returnflag", "s"), ("n", "n"), ("mean_qty", "n"),
          ("stddev_qty", "n"), ("stddev_price", "n"), ("corr_qty_price", "n")]),
        # round 6: mergeable quantile sketch, rank-error property boolean
        ("q104", "q104_approx_percentile",
         [("o_orderstatus", "s"), ("n_rows", "n"), ("approx_median_ok", "s")]),
        # round 6: mergeable heavy-hitters sketch (accumulate/combine/
        # estimate), exact in the small-domain regime -> hash-checked
        ("q109", "q109_heavy_hitters_sketch",
         [("qty", "n"), ("est_n", "n"), ("rk", "n")]),
        ("q12", "q12_distinct_exact",
         [("l_returnflag", "s"), ("n_parts", "n"), ("n_supps", "n"), ("n_rows", "n")]),
    ],
    # sequential event funnel + cohort retention + regex sequence matching
    "q76_funnel_cohort": [
        ("q76", "q76_event_funnel",
         [("n_signup", "n"), ("n_signup_view", "n"), ("n_full_funnel", "n")]),
        ("q78", "q78_cohort_retention",
         [("cohort_day", "n"), ("day_offset", "n"), ("active_users", "n")]),
        # round 6: MATCH_RECOGNIZE-shape sequence patterns over per-user
        # encoded event strings
        ("q111", "q111_sequence_match",
         [("pattern", "s"), ("n_users", "n"), ("n_matches", "n")]),
    ],
    # C1-C10 kimball mart: UDF-composing-UDF CASE view + TRY_CAST DECIMAL +
    # non-ASCII literal filter (parity: deployer/patch/DWH/kimball/*.sql)
    "q02_kimball_mart": [
        ("q02", "q02_case_channel_mapping",
         [("utm_campaign", "s"), ("product", "s"), ("segment", "s")]),
        ("q03", "q03_try_cast_decimal",
         [("utm_source", "s"), ("utm_content", "s"), ("content_num", "n"), ("channel", "s")]),
        ("q04", "q04_filter_nonascii_literal",
         [("utm_campaign", "s"), ("utm_source", "s")]),
    ],
    # A1-A3/B1-B7 depgraph scan chain + one-hop closure + recursive CTE
    # (parity: .github/scripts/scan_dependencies.py)
    "q17_depgraph_core": [
        ("q17", "q17_extract_explode_callsites",
         [("callee", "s"), ("n_callsites", "n"), ("n_files", "n")]),
        ("q18", "q18_collect_set_deps",
         [("func_name", "s"), ("def_path", "s"), ("used_in_files", "s"),
          ("used_in_functions", "s")]),
        ("q20", "q20_one_hop_closure",
         [("func_name", "s"), ("def_path", "s"), ("files", "s")]),
        ("q72", "q72_recursive_closure",
         [("func_name", "s"), ("def_path", "s"), ("files", "s")]),
    ],
    # B8-B17 glob->regex owner theta-join + review gate state machine
    "q19_ownership_gate": [
        ("q19", "q19_glob_owner_join",
         [("func_name", "s"), ("def_path", "s"), ("teams", "s")]),
        ("q21", "q21_team_gate",
         [("pr", "n"), ("codeowners_approved", "s"), ("facilitators_approved", "s"),
          ("tech_approved", "s"), ("stage", "s")]),
    ],
    # E1 exact dedup (md5-keyed window) + E7 token counts
    "q26_dedup_tokens": [
        ("q26", "q26_exact_dedup",
         [("source", "s"), ("n_before", "n"), ("n_after", "n")]),
        ("q28", "q28_token_counts",
         [("token", "s"), ("n_occurrences", "n"), ("n_docs", "n")]),
    ],
    # E8 lexicon sentiment + BPE-ish tokenizer counts
    "q29_lexicon_bpe": [
        ("q29", "q29_sentiment_lexicon",
         [("doc_id", "n"), ("n_scored", "n"), ("score", "n"), ("label", "s")]),
        ("q57", "q57_bpe_token_counts",
         [("doc_id", "n"), ("n_ws_tokens", "n"), ("n_bpe_tokens", "n"),
          ("n_distinct_bpe", "n")]),
    ],
    # E2 MinHash+LSH near-dup + asymmetric containment (shared LSH front-half)
    "q31_lsh_family": [
        ("q31", "q31_minhash_lsh_neardup",
         [("da", "n"), ("db", "n"), ("jaccard", "n")]),
        ("q75", "q75_containment_neardup",
         [("da", "n"), ("db", "n"), ("containment", "n")]),
    ],
    # SimHash Hamming near-dup + n-gram Jaccard top-k + blocked edit-distance
    "q34_neardup_pairs": [
        ("q34", "q34_simhash_neardup", [("da", "n"), ("db", "n"), ("hamming", "n")]),
        ("q35", "q35_ngram_jaccard_topk",
         [("da", "n"), ("db", "n"), ("inter", "n"), ("jaccard", "n")]),
        ("q73", "q73_fuzzy_name_pairs", [("pa", "n"), ("pb", "n"), ("edit_dist", "n")]),
    ],
    # lang-ID + quality scoring + rolling-hash fingerprint
    "q36_text_metrics": [
        ("q36", "q36_lang_id", [("lang", "s"), ("predicted", "s"), ("n_docs", "n")]),
        ("q37", "q37_quality_score",
         [("doc_id", "n"), ("n_tokens", "n"), ("score", "n"), ("band", "s")]),
        ("q38", "q38_fingerprint",
         [("doc_id", "n"), ("fingerprint", "s"), ("n_shingles", "n")]),
    ],
    # E3-E5 cosine top-k + multi-band sign-LSH near-dup + blocked kNN + IVF ANN
    "q27_embedding_search": [
        ("q27", "q27_cosine_topk", [("vec_id", "n"), ("cosine", "n")]),
        ("q39", "q39_embedding_neardup", [("va", "n"), ("vb", "n"), ("cosine", "n")]),
        ("q40", "q40_knn_per_group",
         [("label", "n"), ("rk", "n"), ("va", "n"), ("vb", "n"), ("cosine", "n")]),
        ("q42", "q42_ann_ivf", [("vec_id", "n"), ("centroid_id", "n"), ("cosine", "n")]),
        # round 7: PQ ADC + IVF-PQ promoted from pytest-only to
        # driver-hash-checked (first-n codebook convention, ops/similarity)
        ("q112", "q112_pq_ann",
         [("vec_id", "n"), ("adc_dist", "n"), ("cosine", "n")]),
        ("q113", "q113_ivfpq_ann",
         [("vec_id", "n"), ("centroid_id", "n"), ("adc_dist", "n"), ("cosine", "n")]),
        ("q99", "q99_semantic_dedup",
         [("vec_id", "n"), ("cluster_id", "n"), ("dup_of", "n"), ("kept", "s")]),
    ],
    # data-quality expectations (declared-rule violations) + one-pass
    # column profiler (discovered shape) — the ingest gate pair
    "q74_data_quality": [
        ("q74", "q74_data_quality",
         [("rule", "s"), ("violations", "n")]),
        ("q110", "q110_profile_documents",
         [("col", "s"), ("n_rows", "n"), ("n_nulls", "n"), ("n_distinct", "n"),
          ("min_num", "n"), ("max_num", "n"), ("min_str", "s"),
          ("max_str", "s"), ("sum_len", "n")]),
    ],
    # Gopher-style repetition gate + benchmark n-gram decontamination
    "q81_curation_gates": [
        ("q81", "q81_repetition_gate",
         [("doc_id", "n"), ("n3", "n"), ("dup3_frac", "n"), ("top2_frac", "n"),
          ("verdict", "s")]),
        ("q82", "q82_decontamination",
         [("source", "s"), ("n_docs", "n"), ("n_flagged", "n"), ("n_hit_grams", "n")]),
        # round 5: PII scrubbing (C4/Dolma-style redaction stage)
        ("q100", "q100_pii_redaction",
         [("lang", "s"), ("n_docs", "n"), ("n_email", "n"), ("n_phone", "n"),
          ("n_ssn", "n"), ("n_ipv4", "n"), ("n_ipv6", "n"),
          ("redacted_chars", "n")]),
    ],
    # hash-deterministic split census + stratified sampling + bigram-LM scoring
    "q83_split_sample_lm": [
        ("q83", "q83_hash_split",
         [("lang", "s"), ("split", "s"), ("n_docs", "n"), ("total_chars", "n")]),
        ("q84", "q84_stratified_sample",
         [("source", "s"), ("target_rate", "n"), ("n_total", "n"), ("n_kept", "n"),
          ("kept_frac", "n")]),
        ("q85", "q85_lm_doc_score",
         [("doc_id", "n"), ("lang", "s"), ("n_bigrams", "n"), ("avg_condp", "n"),
          ("band", "s")]),
        # round 5: token-budget sequence packing (concat-and-chunk blocks)
        # round 6: temperature-based mixture sampling (T=2, sum-free)
        ("q105", "q105_temperature_mixture",
         [("source", "s"), ("n_docs", "n"), ("quota", "n"), ("rate_ppm", "n"),
          ("n_kept", "n"), ("kept_chars", "n")]),
        ("q101", "q101_sequence_packing",
         [("doc_id", "n"), ("lang", "s"), ("n_tokens", "n"), ("first_block", "n"),
          ("n_blocks", "n")]),
    ],
    # source-vocabulary Jaccard + bigram conditional-probability LM
    "q79_lm_stats": [
        ("q79", "q79_source_vocab_similarity",
         [("sa", "s"), ("sb", "s"), ("n_shared", "n"), ("jaccard", "n")]),
        ("q80", "q80_bigram_cond_prob",
         [("lang", "s"), ("w1", "s"), ("w2", "s"), ("bigram_n", "n"),
          ("cond_p", "n"), ("rk", "n")]),
    ],
    # E9 multimodal: JVM metadata summary (q41) + the mapInPandas Python
    # worker path (q94 frame sampling) driver-checked with a byte-exact
    # oracle (frames digest = md5 over sorted base64 frame payloads)
    "q41_multimodal_summary": [
        ("q41", "q41_multimodal_summary",
         [("media_id", "n"), ("kind", "s"), ("n_bytes", "n"),
          ("b64_prefix", "s"), ("aspect", "n")]),
        ("q94", "q94_frame_sample_summary",
         [("media_id", "n"), ("n_frames_sampled", "n"),
          ("total_frame_bytes", "n"), ("frames_digest", "s")]),
    ],
    # D31 vectorized pandas UDF surface: scalar (q46) + GROUPED_AGG UDAF
    # (q89 — exact-decimal so partition ordering can't perturb the hash) +
    # cogrouped applyInPandas (q91 — per-user merge_asof, ties pinned)
    "q46_pandas_udf": [
        ("q46", "q46_pandas_udf",
         [("l_orderkey", "n"), ("l_linenumber", "n"), ("net_price", "n")]),
        ("q89", "q89_pandas_udaf",
         [("l_returnflag", "s"), ("revenue_cents", "n")]),
        ("q91", "q91_cogroup_asof",
         [("user_id", "n"), ("click_id", "n"), ("view_id", "n"), ("gap_us", "n")]),
    ],
    # E17 incremental view maintenance + E14 streaming dedup + E10/E13
    # tumbling windows with watermark — real Structured Streaming jobs run
    # availableNow to completion inside the entry, batch-equal by design
    "q86_streaming_parity": [
        ("q86", "q86_stream_incremental_counts",
         [("event_type", "s"), ("n_events", "n"), ("value_sum", "n")]),
        ("q87", "q87_stream_dedup_agg", [("event_type", "s"), ("n_events", "n")]),
        ("q88", "q88_stream_tumbling",
         [("hour_start", "s"), ("event_type", "s"), ("n_events", "n")]),
        # round 8: A9+/E17+ snapshot-manifest table promoted — clustered
        # overwrite + exactly-once streamed appends + replay-noop proof +
        # manifest-stats-pruned read, hash-checked vs raw orders
        # round 9: + O(metadata) rollback/forward with DESCRIBE-HISTORY
        # provenance pinned (rollback_history_ok)
        # round 10: + AS OF <timestamp> time travel (monotone-clamped
        # commit times) and expire/GC driver-pinned (compact -> expire
        # keep_last=1 physically collects the pre-compact files; the
        # hash-checked aggregate reads the POST-GC table)
        # round 11: + writable refs (branches) — a net-identity MoR
        # round-trip rides a branch and fast-forwards main as one atomic
        # commit (branch_ok); a live branch pins its branch point
        # against expire and survives main's GC (branch_gc_ok)
        ("q114", "q114_snapshot_table",
         [("o_orderpriority", "s"), ("meta_rows_match", "s"),
          ("replay_noop", "s"), ("rollback_history_ok", "s"),
          ("publish_ok", "s"), ("as_of_ts_ok", "s"), ("tag_ok", "s"),
          ("expire_ok", "s"), ("branch_ok", "s"), ("branch_gc_ok", "s"),
          ("bloom_meta_ok", "s"), ("delta_export_ok", "s"),
          ("n_orders", "n"), ("total_price", "n")]),
        # round 8: add-only schema evolution — an append carrying a new
        # column evolves the manifest schema; old files NULL-backfill at
        # read (grouped BY the evolved column so the hash pins it), and
        # time travel keeps the narrower v1 schema.
        # round 9: + hidden partitioning — bucket(16, o_custkey) derived
        # per-file values; a point probe on the SOURCE column resolves
        # through the spec and prunes to a strict file subset — and
        # CHECK constraints (ADD CONSTRAINT validates existing content,
        # a violating append raises pre-commit, version+rows untouched)
        # round 10: + storage-partitioned join (zero shuffle exchange,
        # bucket-co-located snapshot tables) and partition-spec
        # EVOLUTION (metadata-only bucket(16)->bucket(8) change; probes
        # prune both layouts through the spec history)
        ("q120", "q120_schema_evolution",
         [("o_orderstatus", "s"), ("band", "s"), ("n_orders", "n"),
          ("total_price", "n"), ("schema_stable", "s"),
          ("hidden_prune_ok", "s"), ("check_enforced", "s"),
          ("spj_ok", "s"), ("spec_evolution_ok", "s"),
          ("rename_drop_ok", "s")]),
        # round 8: the lakehouse streaming loop — snapshot_stream SOURCE
        # (version offsets, per-file partitions, Arrow reads) through a
        # transform into the exactly-once snapshot sink; replay pinned.
        ("q121", "q121_snapshot_stream",
         [("o_orderpriority", "s"), ("n_orders", "n"), ("total_price", "n"),
          ("meta_rows_match", "s")]),
        # round 9: the streaming CHANGE-FEED consumer — IVM state
        # maintained purely from the snapshot_changes_stream source
        # across a mid-stream MoR merge, with data_change=false
        # maintenance flowing through the open stream as zero rows.
        ("q122", "q122_cdf_stream_ivm",
         [("o_orderpriority", "s"), ("n_orders", "n"), ("total_price", "n"),
          ("ivm_matches_recompute", "s"), ("maintenance_silent", "s")]),
    ],
    # round 10: the MERGE-CHAIN family split out of q86 (the judge's
    # rebalance ask — no composite should exceed ~8 parts, and one
    # 13-part parallel basket let a single part's regression hide under
    # the group wall). Everything here derives from ONE memoized chain:
    # q116 builds write -> delete-merge -> upsert-merge (CoW); q117 reads
    # its v2->v3 CDF; q118 re-runs it merge-on-read and folds; q123
    # re-runs it with equality deletes (zero target reads); q124
    # replicates it into a mirror via the CDF stream + CDC-apply sink;
    # q119 maintains an incremental view (and a persisted MV) from its
    # CDF. Four independent mutation paths converge on the SAME v3
    # oracle CTE — the convergence pin. Round 11 volume split: the CoW
    # chain (q116/q117) keeps FULL volume (its hash IS the volume pin);
    # the MoR (q118), EQ (q123), replication (q124) and MV (q119) legs
    # run the identical scenario at SMALL volume (an eighth, round 13)
    # and all hash against the IDENTICAL small-restricted v3 CTE — so the CoW/MoR/EQ/
    # replication convergence pin is four independent engines on ONE
    # oracle at one scale, plus the full-scale CoW hash on top.
    "q116_lakehouse_merge": [
        ("q116", "q116_merge_upsert",
         [("o_orderstatus", "s"), ("o_orderpriority", "s"), ("n_orders", "n"),
          ("total_price", "n"), ("meta_rows", "n")]),
        ("q117", "q117_change_feed",
         [("_change_type", "s"), ("n_rows", "n"), ("n_keys", "n"),
          ("total_price", "n")]),
        # the SAME merge-chain scenario executed merge-on-read
        # (positional delete vectors) then folded back via
        # snapshot_rewrite_deletes, at small volume — the oracle is
        # the small v3 CTE shared with q119/q123/q124, so the hash
        # pins CoW/MoR convergence; boolean columns pin zero-rewrite
        # writes, metadata
        # row accounting across the rewrite, and the tombstone-delta CDF.
        # (maint_ok additionally pins binpack small-file compaction and
        # metadata-only MIN/MAX agg against a real scan)
        ("q118", "q118_mor_merge",
         [("o_orderstatus", "s"), ("o_orderpriority", "s"), ("n_orders", "n"),
          ("total_price", "n"), ("mor_no_rewrite", "s"),
          ("meta_rows_match", "s"), ("cdf_tomb_delta_ok", "s"),
          ("maint_ok", "s")]),
        # incremental view maintenance (ops/ivm.py) — a v1 aggregate
        # maintained to v3 from the chain's CDF alone, oracle = full
        # recompute over the v3 CTE; + maintained MIN/MAX surviving the
        # delete-bearing delta via recompute-on-retract, + the persisted
        # MV (ops/mv.py) refreshed to the same state.
        # round 10: + the CONTINUOUS MV (mv_stream — CDF stream ->
        # foreachBatch fold, one exactly-once commit per micro-batch)
        # rounds 11/13: feeds from the SMALL chain (streaming_q.
        # _small_chain) — every pinned invariant is feed-size-invariant
        # and the oracle CTE carries the same source restriction
        ("q119", "q119_incremental_view",
         [("o_orderpriority", "s"), ("n_orders", "n"), ("total_price", "n"),
          ("min_price", "n"), ("max_price", "n"),
          ("ivm_matches_recompute", "s"),
          ("persisted_mv_matches", "s"),
          ("streamed_mv_matches", "s")]),
        # EQUALITY-delete merge chain (MoR delete + eq upsert, zero
        # target reads) hashed against the SAME small v3 CTE as
        # q118/q119/q124 — the CoW/MoR/EQ convergence pin — plus eq CDF balance,
        # rewrite folding both delete flavors, and the CDC-apply
        # exactly-once pin (commit_key replay of the delete leg no-ops).
        ("q123", "q123_eq_merge",
         [("o_orderstatus", "s"), ("o_orderpriority", "s"), ("n_orders", "n"),
          ("total_price", "n"), ("eq_zero_reads", "s"), ("cdf_eq_ok", "s"),
          ("meta_restored", "s"), ("cdc_idempotent", "s")]),
        # TABLE REPLICATION — a mirror maintained from the chain's CDF
        # stream through the CDC-apply sink, hashed against the v3 CTE
        # over the same feed (the fourth convergence pin); incremental
        # catch-up and post-fold metadata parity as booleans. round 11:
        # replicates the QUARTER-sized chain — CDC convergence and
        # exactly-once catch-up are feed-size-invariant pins.
        ("q124", "q124_replication",
         [("o_orderstatus", "s"), ("o_orderpriority", "s"), ("n_orders", "n"),
          ("total_price", "n"), ("replicate_incremental", "s"),
          ("mirror_meta_rows_match", "s")]),
    ],
    # E15 stateful gate stream (applyInPandasWithState across 3 real
    # micro-batches, final state -> the batch gate evaluation, oracle = the
    # q21 gate SQL) + E11/E12 sliding/session window STREAMING twins run
    # availableNow in complete mode (batch twins q54/q25 pin the window
    # alignment / gap semantics)
    "q95_stateful_stream": [
        ("q95", "q95_stream_review_gate",
         [("pr", "n"), ("codeowners_approved", "s"), ("facilitators_approved", "s"),
          ("tech_approved", "s"), ("stage", "s")]),
        ("q96", "q96_stream_sliding",
         [("window_start", "s"), ("event_type", "s"), ("n_events", "n")]),
        ("q97", "q97_stream_sessions",
         [("session_start_us", "n"), ("user_id", "n"), ("n_events", "n")]),
        # round 5: E27 incremental corpus dedup — a 4th real streaming job
        # (foreachBatch fold over a persisted LSH band index); verdicts
        # hash-check against the q31 pair SQL on the same staged subset
        ("q102", "q102_incremental_dedup_stream",
         [("da", "n"), ("db", "n"), ("jaccard", "n")]),
    ],
}


def _dims(parts):
    k = max(sum(1 for _, kind in cols if kind == "s") for _, _, cols in parts)
    m = max(sum(1 for _, kind in cols if kind == "n") for _, _, cols in parts)
    return k, m


def _spark_part(df: DataFrame, tag: str, cols, k: int, m: int) -> DataFrame:
    s_cols = [c for c, kind in cols if kind == "s"]
    n_cols = [c for c, kind in cols if kind == "n"]
    sel = [F.lit(tag).alias("part")]
    for i in range(k):
        e = F.col(s_cols[i]).cast("string") if i < len(s_cols) else F.lit(None).cast("string")
        sel.append(e.alias(f"s{i + 1}"))
    for i in range(m):
        e = F.col(n_cols[i]).cast("double") if i < len(n_cols) else F.lit(None).cast("double")
        sel.append(e.alias(f"n{i + 1}"))
    return df.select(*sel)


def _sql_part(sql: str, tag: str, cols, k: int, m: int) -> str:
    s_cols = [c for c, kind in cols if kind == "s"]
    n_cols = [c for c, kind in cols if kind == "n"]
    exprs = [f"'{tag}' AS part"]
    for i in range(k):
        src = f'CAST("{s_cols[i]}" AS VARCHAR)' if i < len(s_cols) else "CAST(NULL AS VARCHAR)"
        exprs.append(f"{src} AS s{i + 1}")
    for i in range(m):
        src = f'CAST("{n_cols[i]}" AS DOUBLE)' if i < len(n_cols) else "CAST(NULL AS DOUBLE)"
        exprs.append(f"{src} AS n{i + 1}")
    return "SELECT " + ", ".join(exprs) + f" FROM (\n{sql}\n) AS sub_{tag}"


# Per-part wall time of the last build of each composite, keyed
# "entry/qname". Only meaningful for parts that do eager work inside the
# part callable (the streaming entries run their whole job there; lazy
# relational parts record ~0). bench.py exports this into
# BENCH_DETAIL.json so fixed per-job streaming cost is attributable.
PART_TIMINGS: dict[str, float] = {}


# Streaming composites run their parts' WHOLE jobs eagerly inside the
# part callable, so sequential part order pays sum-of-walls. These groups
# run concurrently (threads; Spark schedules concurrent jobs in one
# session) — groups execute in order, members of a group together. Only
# parts with the SAME scoped shuffle width may share a group (the
# refcounted scoped_shuffle_partitions enforces it). Results are
# value-identical to sequential execution — every job writes its own
# uniquely-named sink/state and the engine's determinism rules are
# parallelism-independent; the driver's hash check pins it every round.
PARALLEL_GROUPS: dict[str, list[set[str]]] = {
    "q95_stateful_stream": [{"q95", "q97", "q102", "q96"}],
    # ONE group: the wall is the longest single part, not a sum of two
    # phase walls. The streamers (q86/q87/q88/q114) scope the shuffle to
    # 8; q120/q121/q122 run on a CLONE_SESSION at the session-default
    # width. Round 10 moved the merge-chain family (q116-q119/q123/q124)
    # into its own entry so no basket exceeds 7 parts and a part
    # regression can't hide under a 13-part wall.
    "q86_streaming_parity": [
        {"q86", "q87", "q88", "q114", "q120", "q121", "q122"},
    ],
    # Cross-part dependencies serialize through LOCKED memo builders
    # instead of group barriers: q116/q118/q123 all clone the shared v1
    # base (streaming_q._orders_base_table — first caller builds, the
    # rest hard-link), and q117/q119/q124 block on q116's _merge_chain
    # lock then reuse its build (q124 replicates it into a mirror, q119
    # additionally persists an MV from it).
    "q116_lakehouse_merge": [
        {"q116", "q117", "q118", "q119", "q123", "q124"},
    ],
    # Not streaming, but q112/q113 do small eager collects at build time
    # (PQ codebook + query row); building the seven parts concurrently
    # overlaps those job latencies. No part scopes the shuffle width.
    "q27_embedding_search": [
        {"q27", "q39", "q40", "q42", "q112", "q113", "q99"}
    ],
    # Both parts are EAGER iterative algorithms (star-contraction CC and
    # integer PageRank, each a localCheckpoint-per-round driver loop), so
    # sequential part order pays sum-of-loops; concurrent build overlaps
    # the per-round job latencies. Determinism is round-structural
    # (integer-exact, iteration counts data-defined), so parallel build
    # order cannot perturb either result.
    "q92_dedup_clusters_star": [
        {"q92", "q108"}
    ],
}

# Parts that want a DIFFERENT shuffle width than their group run on a
# cloned SparkSession (spark.newSession(): shared SparkContext and
# executors, but an ISOLATED SQLConf) — the per-query shuffle-width
# isolation a multi-tenant Spark deployment gets from separate sessions.
# q96's sliding expansion is 4x the event count and wants the full
# session-default width while its groupmates scope down to 8; q97's
# per-user session state is likewise real parallel work that wants the
# session default — without the clone, the width its streaming query
# captured at .start() depended on whether q95/q102's scoped-to-8 window
# was active at that instant (timing-dependent, usually 8). The clone
# inherits NOTHING runtime-set, so tune_session() is re-applied (UTC
# timezone is correctness-critical for q96's date_format output).
CLONE_SESSION: set[str] = {
    "q96", "q97", "q116", "q117", "q118", "q119", "q120", "q121", "q122",
    "q123", "q124",
}

# Cloned sessions additionally sized to their data: the merge-chain
# family shuffles ~10^5 rows per exchange, where the session-default 32
# partitions is pure task overhead (the six parts race ~dozens of tiny
# jobs on one scheduler). 8 matches the streaming entries'
# _stream_shuffle width. Values are width-invariant — file counts come
# from explicit repartition(n_files), never the shuffle conf — and the
# driver's hash check pins that every round. Round 13 added q120-q122:
# each runs ~a dozen tiny commits/merges whose 32-way exchanges were
# pure task overhead inside the q86 group wall (q122 already set 8 for
# itself; the entry here just moves it before first use).
CLONE_SHUFFLE: dict[str, int] = {
    "q116": 8, "q117": 8, "q118": 8, "q119": 8, "q123": 8, "q124": 8,
    "q120": 8, "q121": 8, "q122": 8,
}

for _name, _groups in PARALLEL_GROUPS.items():
    _declared = {t for g in _groups for t in g}
    _actual = {t for t, _, _ in SPEC[_name]}
    assert _declared == _actual, (
        f"PARALLEL_GROUPS[{_name}] must partition the composite's parts: "
        f"{_declared} != {_actual}"
    )


def _make_query(name, parts):
    k, m = _dims(parts)

    def run_part(spark, sf_dir, tag, qname):
        import time

        if tag in CLONE_SESSION:
            from e02_spark.session import tune_session

            spark = tune_session(spark.newSession())
            w = CLONE_SHUFFLE.get(tag)
            if w is not None:
                spark.conf.set("spark.sql.shuffle.partitions", str(w))
        t0 = time.time()
        df = _ALL_Q[qname](spark, sf_dir)
        PART_TIMINGS[f"{name}/{qname}"] = round(time.time() - t0, 3)
        return df

    def run(spark, sf_dir: str) -> DataFrame:
        groups = PARALLEL_GROUPS.get(name)
        results: dict[str, DataFrame] = {}
        if groups:
            from concurrent.futures import ThreadPoolExecutor

            for group in groups:
                members = [p for p in parts if p[0] in group]
                with ThreadPoolExecutor(max_workers=len(members)) as ex:
                    futs = {
                        tag: ex.submit(run_part, spark, sf_dir, tag, qname)
                        for tag, qname, _ in members
                    }
                    for tag, fut in futs.items():
                        results[tag] = fut.result()
        else:
            for tag, qname, cols in parts:
                results[tag] = run_part(spark, sf_dir, tag, qname)
        dfs = [
            _spark_part(results[tag], tag, cols, k, m)
            for tag, _, cols in parts
        ]
        return reduce(DataFrame.unionByName, dfs)

    return run


def _make_oracle(parts) -> str | None:
    if any(qname not in _ALL_O for _, qname, _ in parts):
        return None  # any rows-only part makes the composite rows-only
    k, m = _dims(parts)
    return "\nUNION ALL\n".join(
        _sql_part(_ALL_O[qname], tag, cols, k, m) for tag, qname, cols in parts
    )


QUERIES = {name: _make_query(name, parts) for name, parts in SPEC.items()}
ORACLE = {
    name: sql
    for name, parts in SPEC.items()
    if (sql := _make_oracle(parts)) is not None
}

# every original query folded into exactly one composite
MERGED: set[str] = {qname for parts in SPEC.values() for _, qname, _ in parts}
