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


# streaming keys each execute a real micro-batch replay (~2-3 s), so
# they carry the slow marker: the fast inner loop (-m "not slow")
# keeps all batch parity checks; the full suite still runs everything
@pytest.mark.parametrize(
    "key",
    [
        pytest.param(
            k,
            marks=[pytest.mark.slow]
            if "streaming" in REGISTRY[k].tags or "cdc" in REGISTRY[k].tags
            else [],
        )
        for k in sorted(REGISTRY)
    ],
)
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


def test_hostile_type_gate(spark, duck):
    """The replica must reject judge-hostile output types even when
    values match (round-1 lesson: Decimal/Date/HUGEINT hash
    differently under independent canonicalizers). Build a tiny
    query emitting each and assert the gate trips."""
    from pyspark.sql import functions as F

    from streamz_postgres_spark.oracle import hostile_output_types
    from streamz_postgres_spark.registry import Query

    df = spark.range(3).select(
        F.col("id"),
        F.col("id").cast("decimal(10,2)").alias("bad_dec"),
        F.lit("2024-01-01").cast("date").alias("bad_date"),
    )
    q = Query(
        name="_hostile_probe",
        spark_fn=lambda s, d: df,
        oracle="SELECT 1 AS ok, SUM(r_regionkey) AS bad_huge FROM region",
    )
    bad = hostile_output_types(q, df, duck)
    joined = " ".join(bad)
    assert "bad_dec" in joined or "decimal" in joined
    assert "bad_date" in joined or "date" in joined
    assert any("bad_huge" in b for b in bad)

    ok_df = spark.range(3).select(F.col("id"))
    ok_q = Query(
        name="_clean_probe",
        spark_fn=lambda s, d: ok_df,
        oracle="SELECT CAST(SUM(r_regionkey) AS BIGINT) AS fine FROM region",
    )
    assert hostile_output_types(ok_q, ok_df, duck) == []


def test_hostile_type_gate_nonscalar(spark, duck):
    """Round-2 lesson: ARRAY output crashed the driver's hasher
    ("unhashable type: 'list'") even though the local replica
    canonicalizes lists. The gate must flag ANY top-level non-scalar
    output column — array, map, struct — on either engine."""
    from pyspark.sql import functions as F

    from streamz_postgres_spark.oracle import hostile_output_types
    from streamz_postgres_spark.registry import Query

    df = spark.range(3).select(
        F.col("id"),
        F.array(F.lit(1.0), F.lit(2.0)).alias("bad_arr"),
        F.create_map(F.lit("k"), F.lit(1)).alias("bad_map"),
        F.struct(F.lit(1).alias("x")).alias("bad_struct"),
    )
    q = Query(
        name="_nonscalar_probe",
        spark_fn=lambda s, d: df,
        oracle="SELECT [1, 2] AS duck_list, {'x': 1} AS duck_struct",
    )
    bad = hostile_output_types(q, df, duck)
    joined = " ".join(bad)
    for col in ("bad_arr", "bad_map", "bad_struct", "duck_list", "duck_struct"):
        assert col in joined, f"{col} not flagged: {bad}"


@pytest.mark.slow
def test_no_registered_query_emits_hostile_types(spark, duck):
    """Registry-wide sweep: every registered query's OUTPUT schema
    (Spark analysis only — no execution) and oracle result types must
    be hasher-safe. Both rounds' only driver failures (q_cast,
    q_multimodal_meta, q_array_funcs) were exactly this class; this
    test makes it structurally extinct."""
    from streamz_postgres_spark.oracle import hostile_output_types

    offenders = {}
    for key in sorted(REGISTRY):
        q = REGISTRY[key]
        if "streaming" in q.tags:
            # calling spark_fn executes the bounded stream replay;
            # those keys are still gated inside check_query (the
            # parametrized test above), so skip the duplicate run
            continue
        sdf = q.spark_fn(spark, SF_DIR)
        bad = hostile_output_types(q, sdf, duck)
        if bad:
            offenders[key] = bad
    assert not offenders, f"hostile output types: {offenders}"


def test_no_vacuous_oracles(duck):
    """Every oracle must select at least one row at the test scale
    factor: an empty-vs-empty comparison passes the gate while
    proving nothing (the q_tpch_q11-at-sf0.1 lesson — its 0.1%
    threshold selected zero rows there until review caught it).
    DuckDB-only, so this sweep costs milliseconds."""
    empty = [
        k
        for k in sorted(REGISTRY)
        if REGISTRY[k].oracle is not None
        and not duck.execute(
            f"SELECT 1 FROM ({REGISTRY[k].oracle}) LIMIT 1"
        ).fetchall()
    ]
    assert not empty, f"vacuous oracles (0 rows at test SF): {empty}"
