"""Every registered query must match its DuckDB oracle at sf0.001
(the driver repeats this at sf0.01). One parametrized test per key
— the same gate the driver applies, run as the default test suite.
"""

from __future__ import annotations

import pytest

from streamz_postgres_spark.oracle import check_query
from streamz_postgres_spark.registry import REGISTRY, _load_all
from tests.conftest import SF_DIR

_load_all()


@pytest.mark.parametrize("key", sorted(REGISTRY))
def test_query_matches_oracle(spark, duck, key):
    ok, msg = check_query(spark, duck, REGISTRY[key], SF_DIR)
    assert ok, f"{key}: {msg}"


def test_driver_contract(spark):
    """entry/queries/oracle_sql satisfy the driver's shape rules."""
    import __spark_entry__ as e

    qs = e.queries()
    osql = e.oracle_sql()
    assert set(osql) <= set(qs)
    assert "q_flagship" in qs
    df = e.entry(spark)
    assert len(df.collect()) > 0
