"""Set operators: union all / union distinct / intersect / except.

Reference parity (SURVEY.md §2.4): streamz ``union`` merges streams;
the distinct/except forms cover the relational surface the DuckDB
oracle can check.

Scale notes: UNION ALL is a zero-shuffle concatenation of scans;
INTERSECT/EXCEPT compile to aggregate- or join-based plans with one
hash shuffle on the full row — fine when the deduped sides fit the
usual aggregate budget.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streamz_postgres_spark.catalog import load_table
from streamz_postgres_spark.registry import register


def _high_value(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 180000.0)
        .select("o_custkey")
    )


def _urgent(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )


@register(
    "q_union",
    oracle="""
SELECT o_custkey FROM orders WHERE o_totalprice > 180000.0
UNION ALL
SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
""",
    tags=("setop",),
)
def q_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-preserving union (streamz ``union`` parity)."""
    return _high_value(spark, sf_dir).union(_urgent(spark, sf_dir))


@register(
    "q_union_distinct",
    oracle="""
SELECT o_custkey FROM orders WHERE o_totalprice > 180000.0
UNION
SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
""",
    tags=("setop",),
)
def q_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deduplicating union."""
    return _high_value(spark, sf_dir).union(_urgent(spark, sf_dir)).distinct()


@register(
    "q_intersect",
    oracle="""
SELECT o_custkey FROM orders WHERE o_totalprice > 180000.0
INTERSECT
SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
""",
    tags=("setop",),
)
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers appearing in both selections (distinct semantics)."""
    return _high_value(spark, sf_dir).intersect(_urgent(spark, sf_dir))


@register(
    "q_except",
    oracle="""
SELECT o_custkey FROM orders WHERE o_totalprice > 180000.0
EXCEPT ALL
SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
""",
    tags=("setop",),
)
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset difference (exceptAll), the diff primitive the CDC
    full-refresh loader uses to synthesize deletes (sources/cdc)."""
    return _high_value(spark, sf_dir).exceptAll(_urgent(spark, sf_dir))
