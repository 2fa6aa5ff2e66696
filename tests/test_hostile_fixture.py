"""Hostile-fixture parity pins (r12): the oracle gate re-run on a
mutated sf0.001 containing the edge classes the shipped fixtures
never exercise — NULL event values/props, (user_id, ts) ties,
empty/whitespace/NULL document texts, and (v2) negative/zero/x1e3/
repeating-decimal values, pre-epoch timestamps, unicode and
8x-repeated documents, zero-vector and NULL embeddings.

The full-registry sweep lives in scripts/hostile_sweep.py (round
gate); this module pins every key that FAILED a sweep so each fix
stays fixed.

First sweep (NULL/tie classes), nine keys:

- q_ewma / q_weighted_sample: ANSI DIVIDE_BY_ZERO on an all-NULL
  frame / zero weight (now NULL, matching DuckDB's x/0.0),
- q_asof_nearest: the ORACLE desynchronized candidate ts and value
  under per-column IGNORE NULLS (now one struct per direction),
- q_kll_quantile (+ streaming twin's shared readout): NaNs entered
  the sketch and COUNT(*)-vs-collect_list index desync,
- q_multimodal / _frames / _dedup, q_udtf_explode: pandas UDFs
  crashed on NULL payloads,
- q_text_fingerprint: DuckDB's list_prepend(0, NULL) = [0] folded a
  NULL document to the EMPTY document's fingerprint.

v2 sweep (value/time/unicode/embedding classes), 28 keys in four
families:

- ZERO-VECTOR cosine (22 similarity/dedup/knn/graph keys): every
  plain ``dot/(nrm*nrm')`` division ERRORED under ANSI where
  DuckDB's x/0.0 is NULL — all cosine divisions now F.try_divide,
- NULL-embedding fold resurrection (q_array_funcs,
  q_embed_quantize + the sql_dot/sql_l2_norm/sql_int_dot/sql_dist2
  mirrors): DuckDB's list_prepend(seed, NULL) = [seed] folds a NULL
  array to the seed where Spark's aggregate(NULL) is NULL — mirrors
  and inline oracle folds now NULL-guard explicitly,
- micro6 floor-bound overflow (q_trend_ols): pre-epoch x times a
  x1e3 value pushed |x*value| past numeric.py's documented per-row
  bound on the Spark side only — sxy now pre-scales by 2^16 (exact
  exponent shift) like sxx always did,
- byte-vs-codepoint levenshtein (q_str_funcs2): DuckDB's
  levenshtein counts BYTES; the input is now ASCII-folded on both
  sides.
"""

from __future__ import annotations

import pytest

from streamz_postgres_spark.oracle import check_query, duckdb_connection
from streamz_postgres_spark.registry import REGISTRY, _load_all
from tests.conftest import SF_DIR

_load_all()

PINNED = [
    "q_asof_nearest",
    "q_ewma",
    "q_kll_quantile",
    "q_multimodal",
    "q_multimodal_dedup",
    "q_multimodal_frames",
    "q_text_fingerprint",
    "q_udtf_explode",
    "q_weighted_sample",
    # -- v2 sweep pins --------------------------------------------------
    "q_abtest_welch",
    "q_ann_recall",
    "q_array_funcs",
    "q_autocorr",
    "q_dedup_cluster_stats",
    "q_dedup_clusters",
    "q_dedup_embed",
    "q_dedup_semantic",
    "q_doc_outliers",
    "q_embed_matryoshka",
    "q_embed_quantize",
    "q_kmeans_lloyd",
    "q_knn_batch",
    "q_knn_graph",
    "q_knn_hubness",
    "q_knn_ivf_batch",
    "q_retrieval_prf",
    "q_sim_ann_ivf",
    "q_sim_ann_ivf_int8",
    "q_sim_ann_ivfpq",
    "q_sim_ann_lsh",
    "q_sim_ann_multiprobe",
    "q_sim_cosine",
    "q_sim_pairs",
    "q_sim_threshold_sweep",
    "q_str_funcs2",
    "q_trend_ols",
    "q_triangle_count",
]


@pytest.fixture(scope="module")
def hostile_dir():
    from scripts.hostile_sweep import build_hostile_dir

    return build_hostile_dir(SF_DIR)


@pytest.fixture(scope="module")
def hostile_duck(hostile_dir):
    return duckdb_connection(hostile_dir)


def test_hostile_fixture_actually_hostile(hostile_duck):
    """The mutations must exist, or every pin below is vacuous."""
    n_null_val, n_null_props = hostile_duck.execute(
        "SELECT COUNT(*) - COUNT(value), COUNT(*) - COUNT(props) FROM events"
    ).fetchone()
    assert n_null_val > 0 and n_null_props > 0
    (n_ties,) = hostile_duck.execute(
        "SELECT COUNT(*) FROM (SELECT user_id, ts FROM events "
        "GROUP BY user_id, ts HAVING COUNT(*) > 1)"
    ).fetchone()
    assert n_ties > 0
    n_null, n_empty, n_blank = hostile_duck.execute(
        "SELECT COUNT(*) FILTER (text IS NULL), "
        "COUNT(*) FILTER (text = ''), "
        "COUNT(*) FILTER (text = '   ') FROM documents"
    ).fetchone()
    assert n_null > 0 and n_empty > 0 and n_blank > 0
    # v2 classes
    n_neg, n_big, n_pre = hostile_duck.execute(
        "SELECT COUNT(*) FILTER (value < 0), "
        "COUNT(*) FILTER (value > 1e4), "
        "COUNT(*) FILTER (ts < TIMESTAMP '1970-01-01') FROM events"
    ).fetchone()
    assert n_neg > 0 and n_big > 0 and n_pre > 0
    (n_uni,) = hostile_duck.execute(
        "SELECT COUNT(*) FILTER (text LIKE '%世界%') FROM documents"
    ).fetchone()
    assert n_uni > 0
    n_null_emb, n_zero_emb = hostile_duck.execute(
        "SELECT COUNT(*) FILTER (embedding IS NULL), "
        "COUNT(*) FILTER (list_sum(list_transform(embedding, "
        "x -> abs(x))) = 0) FROM embeddings"
    ).fetchone()
    assert n_null_emb > 0 and n_zero_emb > 0


@pytest.mark.parametrize("key", PINNED)
def test_pinned_key_survives_hostile_fixture(
    spark, hostile_duck, hostile_dir, key
):
    ok, msg = check_query(spark, hostile_duck, REGISTRY[key], hostile_dir)
    assert ok, f"{key}: {msg}"
