"""Subquery forms: scalar (correlated) and IN.

Catalyst decorrelates these into joins; the DataFrame formulations
below ARE the decorrelated plans, proving the equivalence the oracle
checks (the DuckDB side keeps the textbook subquery syntax).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streamz_postgres_spark.catalog import load_table
from streamz_postgres_spark.functions.numeric import dsum, sql_dsum
from streamz_postgres_spark.registry import register


@register(
    "q_subquery_scalar",
    oracle=f"""
SELECT {sql_dsum('l_extendedprice')} / 7.0 AS avg_yearly
FROM lineitem l1
WHERE l_quantity < (
  SELECT 0.2 * ({sql_dsum('l_quantity')} / COUNT(l_quantity))
  FROM lineitem l2
  WHERE l2.l_partkey = l1.l_partkey
)
""",
    tags=("subquery",),
)
def q_subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (TPC-H Q17 shape): lines below 20%%
    of their part's average quantity. Expressed as the decorrelated
    aggregate-join — one shuffle on l_partkey, no per-row subquery."""
    li = load_table(spark, sf_dir, "lineitem")
    part_avg = li.groupBy("l_partkey").agg(
        (F.lit(0.2) * (dsum("l_quantity") / F.count("l_quantity"))).alias(
            "qty_threshold"
        )
    )
    return (
        li.join(part_avg, "l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg((dsum("l_extendedprice") / F.lit(7.0)).alias("avg_yearly"))
    )


@register(
    "q_subquery_in",
    oracle=f"""
SELECT o_orderstatus, COUNT(*) AS n_orders, {sql_dsum('o_totalprice')} AS sum_price
FROM orders
WHERE o_custkey IN (
  SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY'
)
GROUP BY o_orderstatus
""",
    tags=("subquery",),
)
def q_subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery as its decorrelated form: left-semi join."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "MACHINERY"
    )
    return (
        o.join(c, o.o_custkey == c.c_custkey, "left_semi")
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("sum_price"),
        )
    )
