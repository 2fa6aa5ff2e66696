"""Python UDF surface (SURVEY §2.6): the escape hatches for logic
Catalyst can't express, each demonstrated with an oracle-checkable
deterministic computation.

streamz parity: ``map(any_python_callable)`` -> Arrow-vectorized
scalar pandas_udf; ``accumulate`` as a per-group UDAF -> GROUPED_AGG
pandas_udf; ``map`` returning an iterable + ``flatten`` -> UDTF
(explode of a UDF-computed array here; mapInPandas/
applyInPandasWithState live in multimodal.py / streaming/).

The 100 TB rule stands: these are the SLOW path (Arrow transfer +
Python execution). Every UDF below has a pure-Catalyst equivalent
elsewhere in the library; they exist to prove the plumbing for the
cases (custom scoring models, tokenizers) that genuinely need
Python. Arrow batching makes them ~10-100x faster than row-at-a-time
``udf()``, which this library never uses.
"""

from __future__ import annotations

from decimal import ROUND_HALF_EVEN, Decimal

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from streamz_postgres_spark.catalog import load_table
from streamz_postgres_spark.registry import register


def _make_net_price():
    @pandas_udf("double")
    def _net_price(ext: pd.Series, disc: pd.Series) -> pd.Series:
        # vectorized scalar UDF: same IEEE ops as the built-in expr
        return ext * (1.0 - disc)

    return _net_price


@register(
    "q_udf_scalar",
    oracle="""
SELECT l_orderkey, l_linenumber,
       l_extendedprice * (1.0 - l_discount) AS net_price
FROM lineitem
WHERE l_quantity > 45.0
""",
    tags=("udf",),
)
def q_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas UDF (streamz ``map(func)`` parity): numpy does
    the same double multiply the JVM would, so the oracle matches
    bit-for-bit — proving the Arrow round-trip is lossless."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45.0)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        _make_net_price()("l_extendedprice", "l_discount").alias("net_price"),
    )


def _make_decimal_sum():
    @pandas_udf("double")
    def _decimal_sum(v: pd.Series) -> float:
        # order-independent UDAF: exact decimal accumulation of
        # doubles (the Python twin of functions.numeric.dsum)
        six = Decimal("0.000001")
        acc = Decimal(0)
        for x in v:
            acc += Decimal(float(x)).quantize(six, rounding=ROUND_HALF_EVEN)
        return float(acc)

    return _decimal_sum


@register(
    "q_udaf_grouped",
    oracle="""
SELECT o_orderstatus,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS total_price,
       COUNT(*) AS n_orders
FROM orders
GROUP BY o_orderstatus
""",
    tags=("udf",),
)
def q_udaf_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas UDF (streamz ``accumulate`` as a
    UDAF): exact-decimal state makes the Python aggregation agree
    with the oracle's decimal sum regardless of row order."""
    @pandas_udf("long")
    def _count(v: pd.Series) -> int:
        # Spark disallows mixing GROUPED_AGG pandas UDFs with JVM
        # aggregates in one agg, so the count is a pandas UDF too
        return len(v)

    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        _make_decimal_sum()("o_totalprice").alias("total_price"),
        _count("o_totalprice").alias("n_orders"),
    )


def _make_bigrams():
    @pandas_udf("array<string>")
    def _bigrams(text: pd.Series) -> pd.Series:
        # variable-length array output -> exploded downstream (UDTF
        # shape: one input row, many output rows)
        def f(t: str) -> list[str]:
            toks = t.split(" ")
            return [f"{a} {b}" for a, b in zip(toks, toks[1:])]

        # NULL text -> NULL array (explode then drops the row, same
        # as the oracle's unnest(NULL)); a bare .map crashes on None
        # (hostile-fixture sweep find, r12)
        return text.map(f, na_action="ignore")

    return _bigrams


@register(
    "q_udtf_explode",
    oracle="""
SELECT doc_id, unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1]))
         AS bigram
FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents) s
""",
    tags=("udf",),
)
def q_udtf_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table-function shape (streamz map-then-flatten parity): a
    Python UDF emits a bigram array per document, exploded to one
    row per bigram."""
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", F.explode(_make_bigrams()("text")).alias("bigram"))


_COGROUP_SCHEMA = (
    "o_orderkey long, o_totalprice double, n_lines long, line_total double"
)


def _reconcile_order(key, orders_pdf: pd.DataFrame, lines_pdf: pd.DataFrame):
    """Cogrouped reconciliation for one order key: header fields from
    the left group, exact-decimal line total from the right (empty
    sides arrive as empty frames)."""
    six = Decimal("0.000001")
    acc = Decimal(0)
    for x in lines_pdf["l_extendedprice"]:
        acc += Decimal(float(x)).quantize(six, rounding=ROUND_HALF_EVEN)
    return pd.DataFrame(
        {
            "o_orderkey": [key[0]],
            "o_totalprice": [
                float(orders_pdf["o_totalprice"].iloc[0])
                if len(orders_pdf)
                else None
            ],
            "n_lines": [len(lines_pdf)],
            "line_total": [float(acc)],
        }
    )


@register(
    "q_cogroup",
    oracle="""
WITH o AS (
  SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 16 = 1
),
la AS (
  SELECT l_orderkey, COUNT(*) AS n_lines,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE)
           AS line_total
  FROM lineitem WHERE l_orderkey % 16 = 1
  GROUP BY l_orderkey
)
SELECT o.o_orderkey, o.o_totalprice,
       COALESCE(la.n_lines, 0) AS n_lines,
       COALESCE(la.line_total, 0.0) AS line_total
FROM o LEFT JOIN la ON o.o_orderkey = la.l_orderkey
""",
    tags=("udf", "cogroup"),
)
def q_cogroup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogrouped applyInPandas (streamz parity: joining two keyed
    streams through arbitrary Python): orders and their lineitems
    meet per order key in ONE pandas function call — both sides
    hash-shuffle on the key once, then Python sees aligned groups
    (an empty frame when a side has no rows, covering the
    outer-join-like cases). The reconciliation itself (header total
    vs exact-decimal line sum) is the classic use: custom per-entity
    logic too procedural for SQL. The oracle expresses the same
    computation relationally, value-checking the cogroup plumbing.
    At 100 TB this costs exactly one co-partitioned shuffle per side
    — same exchange plan as the equivalent join."""
    # explicit key repartition at the session's parallelism (r13,
    # guide §2.5/§4): the cogroup stage's cost is per-GROUP Python
    # round-trips (~9.4k groups at sf0.1), but its shuffle is only
    # ~2 MB — AQE's byte-based coalescing folded it to 2 partitions
    # and ran all those round-trips on 2 cores (measured: 29-35 s
    # wall, 1.9 s CPU). Byte-sized partitions are the wrong model
    # when Python-call count dominates; pinning the exchange width
    # restores 32-way fan-out (measured ~6x). Cogroup reuses this
    # partitioning, so no extra exchange is added.
    p = spark.sparkContext.defaultParallelism
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 16 == 1)
        .repartition(p, "o_orderkey")
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 16 == 1)
        .repartition(p, "l_orderkey")
    )
    return (
        o.groupBy("o_orderkey")
        .cogroup(li.groupBy("l_orderkey"))
        .applyInPandas(_reconcile_order, schema=_COGROUP_SCHEMA)
    )
