"""Hostile-fixture parity pins (r12): the oracle gate re-run on a
mutated sf0.001 containing the edge classes the shipped fixtures
never exercise — NULL event values/props, (user_id, ts) ties, and
empty/whitespace/NULL document texts.

The full-registry sweep lives in scripts/hostile_sweep.py (round
gate); this module pins the nine keys that FAILED the first sweep so
each fix stays fixed:

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


@pytest.mark.parametrize("key", PINNED)
def test_pinned_key_survives_hostile_fixture(
    spark, hostile_duck, hostile_dir, key
):
    ok, msg = check_query(spark, hostile_duck, REGISTRY[key], hostile_dir)
    assert ok, f"{key}: {msg}"
