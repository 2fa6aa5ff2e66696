"""Round-10 semantic closures: the live per-match MEASURES twin must
converge to the batch MATCH_RECOGNIZE lowering exactly (same DuckDB
oracle, but the closure here is engine-internal — stream fold vs
batch HOF arithmetic — so a drift in EITHER shows even if both keep
passing their shared oracle on a lucky fixture)."""

from __future__ import annotations

from streamz_postgres_spark.registry import REGISTRY, _load_all
from tests.conftest import SF_DIR

_load_all()


def test_stream_pattern_measures_closes_to_batch(spark):
    batch = sorted(
        map(
            tuple,
            REGISTRY["q_pattern_measures"].spark_fn(spark, SF_DIR).collect(),
        )
    )
    live = sorted(
        map(
            tuple,
            REGISTRY["q_stream_pattern_measures"]
            .spark_fn(spark, SF_DIR)
            .collect(),
        )
    )
    assert batch == live
    assert len(batch) > 0  # the fixture has matches — not vacuous
