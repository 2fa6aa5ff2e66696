"""Generate PLANS.md: the physical-plan audit for the headline
queries — pushdown, pruning, join strategy, exchange count — the
evidence that each plan is the one you'd want on a cluster.

Usage: python scripts/plan_audit.py [--sf /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from streamz_postgres_spark.plans.scale import explain_summary  # noqa: E402
from streamz_postgres_spark.registry import REGISTRY, _load_all  # noqa: E402
from streamz_postgres_spark.session import get_spark  # noqa: E402

AUDITED = (
    "q_flagship",
    "q_flagship_q3",
    "q_join_multiway",
    "q_join_broadcast",
    "q_join_theta",
    "q_join_salted",
    "q_group_agg",
    "q_window_rank",
    "q_sim_cosine",
    "q_sim_ann_lsh",
    "q_sim_ann_ivf",
    "q_dedup_minhash",
    "q_dedup_simhash",
    "q_dedup_ngram",
    "q_text_tfidf",
    "q_multimodal",
    "q_contamination",
    "q_knn_batch",
    "q_zip_seq",
    "q_range_join_binned",
    "q_runtime_filter",
    "q_chunk_overlap",
    "q_multimodal_dedup",
    "q_text_bm25",
    "q_centroids",
    "q_corpus_pipeline",
    "q_partition_prune",
    # round-4 additions (batch; streaming plans are audited via their
    # run, not explain -- see SCALE.md streaming section)
    "q_ntile_buckets",
    "q_bool_agg",
    "q_gaps_islands",
    "q_sim_threshold_sweep",
    "q_knn_graph",
    "q_dedup_cluster_stats",
    "q_triangle_count",
    "q_pagerank",
    "q_ewma",
    "q_rolling_median",
    "q_event_paths",
    "q_skyline",
    "q_weighted_sample",
    "q_bitmap_distinct",
    "q_pmi_collocations",
    "q_doc_outliers",
    "q_winsorize",
    "q_join_bucketed",
    "q_cohort_retention",
    "q_abtest_welch",
    "q_doc_perplexity",
    "q_mad",
    "q_autocorr",
    "q_changepoint_cusum",
    "q_seasonality",
    "q_boilerplate_spans",
    "q_schema_evolution",
    "q_ann_recall",
    "q_countmin",
    "q_benford",
    "q_zipf_fit",
    # round-5 additions
    "q_dedup_lines",
    "q_asof_forward",
    "q_minhash_containment",
    "q_dedup_url",
    "q_resample_interp",
    "q_embed_quantize",
    "q_retrieval_topk",
    "q_kmv_distinct",
    "q_kmeans_lloyd",
    "q_fuzzy_link",
    "q_trend_ols",
    "q_click_attribution",
    "q_markov_transitions",
    "q_sla_percentiles",
    "q_bitmap_overlap",
    "q_embed_pc1",
    "q_user_features",
    "q_retrieval_prf",
    "q_dedup_semantic",
    "q_data_profile",
    # round-5 late additions (TPC-H classics + corpus diagnostics)
    "q_tpch_q2",
    "q_tpch_q5",
    "q_tpch_q8",
    "q_tpch_q19",
    "q_tpch_q21",
    "q_tpch_q22",
    "q_ngram_coverage",
    "q_shuffle_shard",
    "q_seq_length_hist",
    "q_filter_funnel",
    "q_tpch_q11",
    "q_tpch_q20",
    "q_kanonymity",
    # round-7 additions (batch)
    "q_kll_quantile",
    "q_dedup_substring",
    "q_oov_rate",
    "q_mixture_temperature",
    "q_rollup_cascade",
    "q_lateness_audit",
    "q_cooccurrence_lift",
    "q_skew_report",
    # round-6 additions (batch plans; the streaming percentile twin,
    # enrich-asof, and quantile sketch are audited via their runs)
    "q_knn_hubness",
    "q_decay_score",
    "q_corpus_drift",
    # round-8 additions (batch; q_stream_concurrency and
    # q_cdc_time_travel are audited via their runs)
    "q_dedup_substring_clusters",
    "q_concurrency_profile",
    "q_qualify_sql",
    "q_dedup_minhash_clusters",
    "q_ngram_novelty",
    "q_l_diversity",
    "q_sim_ann_ivf_int8",
    "q_lsh_band_sweep",
    # round-8 continuation batch
    "q_referential_integrity",
    "q_embed_pq",
    "q_sim_ann_adc",
    "q_columns_sql",
    "q_sim_ann_ivfpq",
    "q_corr_matrix",
    # round-8 third-session additions:
    "q_t_closeness",
    "q_graph_assortativity",
    "q_vocab_growth",
    "q_bloom_filter_audit",
    "q_doc_perplexity_kn",
    "q_embed_matryoshka",
    "q_twap",
    "q_ohlc_bars",
    "q_rfm_segmentation",
    "q_gini_concentration",
    "q_seasonal_naive_eval",
    "q_column_entropy_profile",
    # round-9 additions (batch; q_stream_dau_mau is audited via its
    # run):
    "q_pattern_sql",
    "q_rfm_boundaries",
    "q_stats_histogram_approx",
    "q_tpch_q17",
    # round-10 additions:
    "q_pattern_bounds",
    "q_pattern_measures",
    "q_asof_forward_sql",
)


def _batch_remainder() -> tuple:
    """Every registered batch key not in the curated list (r10:
    registry-wide plan evidence, not just headline keys). Streaming
    keys are excluded — building their DataFrame RUNS the bounded
    stream; their plans are audited via their runs (SCALE.md
    streaming section). Keys whose construction executes driver-side
    fixpoint jobs (CC clusters, PageRank, k-means, CDC replays) ARE
    included: the returned frame's plan is the read-out plan the
    cluster would execute, which is exactly what the audit grades."""
    return tuple(
        k
        for k in sorted(REGISTRY)
        if not k.startswith("q_stream_")
        and k not in set(AUDITED)
        and k not in set(_SKIP_AUDIT)
    )


#: batch keys whose plan cannot be summarized statically (none at
#: present; listed here rather than silently skipped if one appears)
_SKIP_AUDIT: tuple = ()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="PLANS.md")
    args = ap.parse_args()

    _load_all()
    spark = get_spark("plan_audit")
    spark.sparkContext.setLogLevel("ERROR")

    lines = [
        "# PLANS — physical-plan audit (generated by scripts/plan_audit.py)",
        "",
        f"Scale factor dir: `{args.sf}`. For each headline query: the",
        "parquet pushdown, the pruned read schema, join strategies and",
        "exchange (shuffle) count. Regenerate after plan-affecting",
        "changes; tests/test_scale_guards.py enforces the invariants.",
        "",
        "Reading note: a BroadcastNestedLoopJoin here is the",
        "broadcast-SCALAR pattern (crossJoin of a 1-row aggregate —",
        "a global count, a boundary array, a codebook), not a",
        "row-pair nested loop: the build side is one row by",
        "construction, so the 'loop' is a constant attach per probe",
        "row. The cartesian guard (False on every plan below) is the",
        "structural check that no true pairwise product exists.",
        "",
    ]
    def _audit(key: str) -> None:
        df = REGISTRY[key].spark_fn(spark, args.sf)
        s = explain_summary(df)
        lines.append(f"## {key}")
        lines.append("")
        lines.append(
            f"- joins: {', '.join(s['joins']) if s['joins'] else 'none'}"
            f" | exchanges: {s['n_exchanges']}"
            f" | cartesian: {s['has_cartesian']}"
            f" | single-partition window: {s['single_partition_windows']}"
        )
        for p in s["pushed_filters"][:6]:
            lines.append(f"- `{p[:160]}`")
        for p in s["read_schemas"][:6]:
            lines.append(f"- `{p[:160]}`")
        lines.append("")

    for key in AUDITED:
        _audit(key)

    rest = _batch_remainder()
    lines.append("---")
    lines.append("")
    lines.append(
        "# Registry-wide batch remainder (every non-streaming key "
        "not in the curated headline set above; same summary)"
    )
    lines.append("")
    for key in rest:
        _audit(key)

    Path(args.out).write_text("\n".join(lines))
    print(f"wrote {args.out} ({len(AUDITED) + len(rest)} queries)")


if __name__ == "__main__":
    main()
