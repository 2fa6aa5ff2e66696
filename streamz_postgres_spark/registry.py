"""Query registry — the engine's public query surface.

Every operator from SURVEY.md §2.7/§2.8 registers here as a named
query: a Spark callable ``(spark, sf_dir) -> DataFrame`` plus (when
SQL-expressible) a DuckDB oracle SQL string the driver cross-checks.

Design rules enforced by convention across all registered queries:

- **Deterministic values.** Double aggregations go through the
  decimal-sum trick (`functions.numeric.dsum`) so Spark and DuckDB
  produce bit-identical doubles regardless of summation order.
- **Matching column names.** Every computed column is aliased the
  same on both sides (driver sorts columns by name before hashing).
- **Timezone independence.** Only NTZ-safe timestamp functions, so
  results don't depend on the driver session's timezone.
- **No driver materialization.** Callables return lazy DataFrames;
  nothing collects.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    spark_fn: SparkQuery
    oracle: str | None  # DuckDB SQL; None => rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, Query] = {}


def register(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
) -> Callable[[SparkQuery], SparkQuery]:
    """Decorator: add a query implementation to the registry."""

    def deco(fn: SparkQuery) -> SparkQuery:
        if name in REGISTRY:
            raise ValueError(f"duplicate query key {name!r}")
        REGISTRY[name] = Query(
            name=name,
            spark_fn=fn,
            oracle=oracle,
            doc=(fn.__doc__ or "").strip(),
            tags=tags,
        )
        return fn

    return deco


def _load_all() -> None:
    """Import all operator modules so their @register calls run."""
    # Imported lazily to avoid import cycles (operators import registry).
    import streamz_postgres_spark.operators  # noqa: F401


# The external verifier checks the first 50 keys of ``queries()`` per
# round, so exposure order IS verification coverage. Keys listed here
# surface first; everything else follows in registration order. Round
# 2: the two round-1 hash fixes, then every key without a driver row
# yet (round-1 checked exactly registry[:50]); the four deferred
# extras (variant/union_distinct/approx_quantile/sample) lead the
# round-3 block at positions 51-54.
DRIVER_PRIORITY: tuple[str, ...] = (
    # round-1 hash-fail fixes — must re-verify
    "q_cast",
    "q_multimodal_meta",
    # scalar-function families
    "q_str_funcs2",
    "q_date_funcs",
    "q_math_funcs",
    "q_cond_funcs",
    "q_array_funcs",
    "q_map_json_funcs",
    # set ops
    "q_union",
    "q_intersect",
    "q_except",
    # stats
    "q_stats_corr",
    "q_percentile",
    # subqueries
    "q_subquery_scalar",
    "q_subquery_in",
    # text analysis
    "q_text_stats",
    "q_text_tokens",
    "q_text_quality",
    "q_text_langid",
    "q_text_tfidf",
    "q_text_fingerprint",
    # batch time windows
    "q_tumbling",
    "q_sliding",
    "q_session",
    "q_partition_batch",
    # UDF surface
    "q_udf_scalar",
    "q_udaf_grouped",
    "q_udtf_explode",
    # window functions
    "q_window_rank",
    "q_window_analytic",
    "q_running_sum",
    "q_moving_avg",
    "q_range_frame",
    "q_topk_per_group",
    "q_dedup",
    "q_latest_per_key",
    # structured streaming twins
    "q_stream_textfile",
    "q_stream_file_sink",
    "q_stream_tumbling",
    "q_stream_sliding",
    "q_stream_tumbling_watermarked",
    "q_stream_session",
    "q_stream_latest_per_key",
    "q_stream_dedup",
    "q_stream_interval_join",
    "q_stream_accumulate",
    # CDC pipeline
    "q_cdc_envelope",
    "q_cdc_apply",
    "q_cdc_materialize",
    "q_cdc_diff",
    # --- 50-key window boundary; round-3 candidates below ---
    "q_variant",
    "q_union_distinct",
    "q_approx_quantile",
    "q_sample",
    # round-2 additions (never driver-checked; lead the round-3 block)
    "q_train_split",
    "q_pack_sequences",
    "q_stratified_sample",
    "q_contamination",
    "q_knn_batch",
    "q_quality_filter",
    "q_dedup_clusters",
    "q_minhash_estimate",
    "q_text_repetition",
    "q_text_entropy",
    "q_sim_ann_multiprobe",
    "q_funnel",
    "q_stream_static_join",
    "q_stream_dedup_watermarked",
    # round-2 late additions (continue the round-3 block)
    "q_range_join_binned",
    "q_runtime_filter",
    "q_lateral_posexplode",
    "q_hll_partial",
    "q_chunk_overlap",
    "q_pii_scrub",
    "q_domain_mix",
    "q_multimodal_dedup",
    "q_stream_join_outer",
    "q_asof_tolerance",
    "q_vocab_topk",
    "q_centroids",
    "q_cogroup",
    "q_agg_salted",
    "q_resample_locf",
    "q_cdc_scd2",
    "q_partition_prune",
    "q_text_bm25",
    "q_corpus_pipeline",
    "q_window_ignore_nulls",
    "q_grouping_id",
    "q_knn_ivf_batch",
    "q_stream_funnel",
    "q_anomaly_zscore",
)


def ordered_registry() -> dict[str, Query]:
    """Registry in driver-exposure order: DRIVER_PRIORITY keys first
    (silently skipping any not registered, e.g. env-gated ones), then
    the rest in registration order."""
    _load_all()
    out: dict[str, Query] = {}
    for k in DRIVER_PRIORITY:
        if k in REGISTRY:
            out[k] = REGISTRY[k]
    for k, q in REGISTRY.items():
        if k not in out:
            out[k] = q
    return out


def all_queries() -> dict[str, SparkQuery]:
    return {k: q.spark_fn for k, q in ordered_registry().items()}


def all_oracle_sql() -> dict[str, str]:
    return {
        k: q.oracle for k, q in ordered_registry().items() if q.oracle is not None
    }
