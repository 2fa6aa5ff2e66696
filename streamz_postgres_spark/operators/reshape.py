"""Reshaping operators: pivot / unpivot / ordered string aggregation
/ value binning — the remaining batch surface a reference user would
reach for when laying out reports from a captured table.

Scale notes: pivot with an explicit value list is a single hash
aggregate (one shuffle, columns fixed at plan time — never let Spark
infer pivot values at 100 TB: that's an extra pass); unpivot
(melt/stack) is a zero-shuffle generator; binning is pure
arithmetic pushed into the scan stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streamz_postgres_spark.catalog import load_table
from streamz_postgres_spark.functions.numeric import dsum, sql_dsum
from streamz_postgres_spark.registry import register

_STATUSES = ("F", "O", "P")


@register(
    "q_pivot",
    oracle=f"""
SELECT o_orderpriority,
  {sql_dsum("CASE WHEN o_orderstatus = 'F' THEN o_totalprice END")} AS total_F,
  {sql_dsum("CASE WHEN o_orderstatus = 'O' THEN o_totalprice END")} AS total_O,
  {sql_dsum("CASE WHEN o_orderstatus = 'P' THEN o_totalprice END")} AS total_P,
  COUNT(*) AS n_orders
FROM orders
GROUP BY o_orderpriority
""",
    tags=("reshape",),
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot order totals into one column per status, as ONE
    conditional hash aggregate (same shape as the oracle's CASE
    expansion): one scan, one shuffle. pivot() alone can't carry the
    grand-total count alongside the per-status sums — a second
    aggregate + join would double the scan and add a shuffle."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        *[
            dsum(
                F.when(F.col("o_orderstatus") == s, F.col("o_totalprice"))
            ).alias(f"total_{s}")
            for s in _STATUSES
        ],
        F.count(F.lit(1)).alias("n_orders"),
    )


@register(
    "q_unpivot",
    oracle="""
SELECT s_suppkey, metric, val FROM (
  SELECT s_suppkey, 'acctbal' AS metric, s_acctbal AS val FROM supplier
  UNION ALL
  SELECT s_suppkey, 'nationkey', CAST(s_nationkey AS DOUBLE) FROM supplier
) t
""",
    tags=("reshape",),
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt) supplier metrics to long form — the inverse
    reshape, a zero-shuffle row generator."""
    s = load_table(spark, sf_dir, "supplier")
    return s.select(
        "s_suppkey",
        F.col("s_acctbal").alias("acctbal"),
        F.col("s_nationkey").cast("double").alias("nationkey"),
    ).unpivot("s_suppkey", ["acctbal", "nationkey"], "metric", "val")


@register(
    "q_string_agg",
    oracle="""
SELECT n_regionkey,
       string_agg(n_name, ',' ORDER BY n_name) AS nations,
       COUNT(*) AS n_nations
FROM nation
GROUP BY n_regionkey
""",
    tags=("reshape",),
)
def q_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (listagg): collect_list is
    unordered by contract, so the deterministic form sorts the
    collected array before joining — same result on any
    partitioning."""
    n = load_table(spark, sf_dir, "nation")
    return n.groupBy("n_regionkey").agg(
        F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias(
            "nations"
        ),
        F.count(F.lit(1)).alias("n_nations"),
    )


@register(
    "q_histogram",
    oracle=f"""
SELECT CAST(FLOOR(o_totalprice / 50000.0) AS BIGINT) AS bin,
       COUNT(*) AS n_orders,
       {sql_dsum('o_totalprice')} AS bin_total
FROM orders
GROUP BY 1
""",
    tags=("reshape",),
)
def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width value binning (histogram): pure arithmetic bin
    keys -> one hash aggregate; the building block for distribution
    profiling over 100 TB (combine with sampling for display)."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy(
        F.floor(F.col("o_totalprice") / 50000.0).cast("bigint").alias("bin")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice").alias("bin_total"),
    )
