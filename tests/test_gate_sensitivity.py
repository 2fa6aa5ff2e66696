"""The oracle gate must be able to FAIL — meta-tests proving the
262-green wall is a property of the queries, not of a comparator
that cannot see differences. Each test injects one specific defect
into an otherwise-green query's oracle and asserts the gate reports
exactly that failure class (rowcount / schema / values), including a
value perturbation at the 1e-6 resolution the dsum micro-unit grid
is built around.
"""

from __future__ import annotations

from dataclasses import replace

from streamz_postgres_spark.oracle import check_query
from streamz_postgres_spark.registry import REGISTRY, _load_all
from tests.conftest import SF_DIR

_load_all()

_BASE = "q_group_agg"  # small, fast, double-valued output


def _broken(oracle_sql: str):
    return replace(REGISTRY[_BASE], oracle=oracle_sql)


def test_gate_passes_baseline(spark, duck):
    ok, msg = check_query(spark, duck, REGISTRY[_BASE], SF_DIR)
    assert ok, msg


def test_gate_catches_missing_row(spark, duck):
    q = _broken(
        f"SELECT * FROM ({REGISTRY[_BASE].oracle}) t "
        "ORDER BY 1 LIMIT (SELECT COUNT(*) - 1 FROM "
        f"({REGISTRY[_BASE].oracle}) u)"
    )
    ok, msg = check_query(spark, duck, q, SF_DIR)
    assert not ok and msg.startswith("ROWCOUNT"), msg


def test_gate_catches_renamed_column(spark, duck):
    probe = duck.execute(REGISTRY[_BASE].oracle)
    cols = [d[0] for d in probe.description]
    select = ", ".join(
        [f'"{cols[0]}" AS __not_the_name'] + [f'"{c}"' for c in cols[1:]]
    )
    q = _broken(f"SELECT {select} FROM ({REGISTRY[_BASE].oracle}) t")
    ok, msg = check_query(spark, duck, q, SF_DIR)
    assert not ok and msg.startswith("SCHEMA"), msg


def test_gate_catches_one_microunit_value_shift(spark, duck):
    """A single double column shifted by exactly one micro-unit
    (1e-6) in ONE row must flip the gate — this is the resolution
    the whole dsum design defends."""
    base = REGISTRY[_BASE].oracle
    probe = duck.execute(base)
    cols = [d[0] for d in probe.description]
    first_row = probe.fetchone()
    dcols = [c for c, v in zip(cols, first_row) if isinstance(v, float)]
    assert dcols, f"{_BASE} has no double column to perturb"
    col = dcols[0]
    q = _broken(
        f"""
        WITH base AS ({base}),
        tagged AS (
          SELECT *, row_number() OVER () AS __rn FROM base
        )
        SELECT * EXCLUDE (__rn)
               REPLACE (CASE WHEN __rn = 1 THEN {col} + 1e-6
                             ELSE {col} END AS {col})
        FROM tagged
        """
    )
    ok, msg = check_query(spark, duck, q, SF_DIR)
    assert not ok and msg.startswith("VALUES"), msg
