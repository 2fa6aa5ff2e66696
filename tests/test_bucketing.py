"""Bucketed co-located joins: pre-shuffled storage eliminates the
join shuffle entirely — the 100 TB answer for fact-fact joins that
repeat on the same key (lineitem ⋈ orders on orderkey).

Demonstrated end-to-end: write both tables bucketed by the join key
into the warehouse, join them, and assert the physical plan contains
NO shuffle exchange — then check the result matches the plain join.
"""

from __future__ import annotations

import contextlib
import io

import pytest

from pyspark.sql import functions as F

from streamz_postgres_spark.catalog import load_table
from tests.conftest import SF_DIR

N_BUCKETS = 4



pytestmark = pytest.mark.slow

@pytest.fixture(scope="module")
def bucketed(spark):
    li = load_table(spark, SF_DIR, "lineitem")
    o = load_table(spark, SF_DIR, "orders")
    (
        li.write.mode("overwrite")
        .bucketBy(N_BUCKETS, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable("li_bucketed")
    )
    (
        o.write.mode("overwrite")
        .bucketBy(N_BUCKETS, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable("o_bucketed")
    )
    yield
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS o_bucketed")


def test_bucketed_join_has_no_shuffle(spark, bucketed):
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("li_bucketed").join(
            spark.table("o_bucketed"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            j.explain("formatted")
        plan = buf.getvalue()
        assert "Exchange" not in plan, "bucketed join must not shuffle"
        assert "SortMergeJoin" in plan

        got = j.groupBy("o_orderstatus").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
        li = load_table(spark, SF_DIR, "lineitem")
        o = load_table(spark, SF_DIR, "orders")
        want = (
            li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
        assert sorted(map(tuple, got)) == sorted(map(tuple, want))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
