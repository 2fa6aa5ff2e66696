"""Partition-count invariance: the determinism-at-scale guard.

The whole 100 TB story rests on results NOT depending on the
physical execution shape — partition counts, AQE coalescing, task
scheduling. `spark.sql.shuffle.partitions` is a runtime conf, so we
run the most numerically sensitive queries under wildly different
shuffle widths and require bit-identical row multisets. A failure
here means some operator leaked float-summation order (or another
physical detail) into its results — exactly the class of bug that
makes a cluster run unreproducible.

Keys chosen to cover every determinism mechanism:
- exact decimal sums (`q_group_agg`, `q_stats_corr`)
- running/window frames (`q_running_sum`)
- iterative grid-quantized float (`q_pagerank`)
- HOF float folds over arrays (`q_centroids`, `q_doc_outliers`)
- libm-guarded scores (`q_doc_perplexity`, `q_weighted_sample`)
- round-5 additions: interpolated doubles over mirrored windows
  (`q_resample_interp`), per-vector HOF quantization folds
  (`q_embed_quantize`), order-sensitive reconstruction hash
  (`q_dedup_lines`)
"""

from __future__ import annotations

import pytest

from streamz_postgres_spark.registry import REGISTRY, _load_all
from tests.conftest import SF_DIR

_load_all()

KEYS = (
    "q_group_agg",
    "q_stats_corr",
    "q_running_sum",
    "q_pagerank",
    "q_centroids",
    "q_doc_outliers",
    "q_doc_perplexity",
    "q_weighted_sample",
    "q_resample_interp",
    "q_embed_quantize",
    "q_dedup_lines",
    "q_ngram_coverage",
    "q_shuffle_shard",
    "q_tpch_q8",
)


def _rows(spark, key: str) -> list[tuple]:
    df = REGISTRY[key].spark_fn(spark, SF_DIR)
    cols = sorted(df.columns)
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


@pytest.mark.parametrize("key", KEYS)
def test_results_invariant_to_shuffle_width(spark, key):
    before = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        narrow = _rows(spark, key)
        spark.conf.set("spark.sql.shuffle.partitions", "29")
        wide = _rows(spark, key)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
    assert narrow == wide, f"{key}: results depend on shuffle width"
