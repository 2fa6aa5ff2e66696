"""Vector math over ``array<float>`` columns — JVM-side, no UDFs.

The similarity-search operators (SURVEY.md §2.8) need dot products
and cosine similarity over the 64-dim ``embeddings.embedding``
column. Higher-order functions (``aggregate``/``zip_with``) keep the
arithmetic inside Catalyst expressions — vectorized, codegen'd, no
Python round-trip — which is the scale path: a Pandas-UDF dot product
would ship 100 TB of vectors through Arrow for no reason.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Elementwise dot product of two equal-length float arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a,
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    """NULL when either vector has zero norm: DuckDB's x/0.0 is NULL
    (not inf/NaN), and the session runs ANSI mode where a plain
    division ERRORS on a zero divisor — try_divide matches the
    oracle's NULL on both counts (v2 hostile-fixture find: the
    fixtures never contained a zero vector, so every cosine operator
    crashed on one)."""
    return F.try_divide(dot(a, b), l2_norm(a) * l2_norm(b))


# -- DuckDB SQL mirrors -------------------------------------------------------
# The bit-for-bit parity of every cosine operator depends on the
# oracle folding in EXACTLY the same order/casts as the Spark HOFs
# above; these are the single source of truth for that SQL (used by
# operators/similarity.py and operators/dedup.py — never copy them).


def sql_dot(a: str, b: str) -> str:
    """DuckDB mirror of :func:`dot`: sequential left fold. Casts each
    element to DOUBLE exactly like the Spark side, so it is safe on
    raw ``array<float>`` columns too (a FLOAT*FLOAT product differs
    from the double product in low bits).

    NULL-input guard (v2 hostile-fixture find, the q_text_fingerprint
    class): Spark's ``aggregate(NULL, ...)`` is NULL, but DuckDB's
    ``list_prepend(0.0, NULL)`` is ``[0.0]`` — the seed resurrects a
    NULL list as a zero sum. Every mirror therefore short-circuits NULL
    inputs to NULL explicitly."""
    fold = (
        "list_reduce(list_prepend(0.0, "
        f"list_transform(list_zip({a}, {b}), "
        "p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))), "
        "(x, y) -> x + y)"
    )
    return (
        f"CASE WHEN ({a}) IS NULL OR ({b}) IS NULL THEN NULL "
        f"ELSE {fold} END"
    )


def sql_l2_norm(e: str) -> str:
    """DuckDB mirror of :func:`l2_norm` (NULL-safe, see sql_dot)."""
    fold = (
        "sqrt(list_reduce(list_prepend(0.0, "
        f"list_transform({e}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), "
        "(a, b) -> a + b))"
    )
    return f"CASE WHEN ({e}) IS NULL THEN NULL ELSE {fold} END"


def int_dot(a: Column, b: Column) -> Column:
    """Exact integer dot product of two equal-length BIGINT arrays
    (quantized-level vectors): order-independent by integerness, so
    it is the one dot product that needs no fold-order discipline."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def sql_int_dot(a: str, b: str) -> str:
    """DuckDB mirror of :func:`int_dot` (NULL-safe, see sql_dot)."""
    fold = (
        "list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(list_zip({a}, {b}), p -> p[1] * p[2])), "
        "(x, y) -> x + y)"
    )
    return (
        f"CASE WHEN ({a}) IS NULL OR ({b}) IS NULL THEN NULL "
        f"ELSE {fold} END"
    )


def dist2(a: Column, b: Column) -> Column:
    """Squared L2 distance between two equal-length float arrays,
    as a sequential left fold (same discipline as :func:`dot` —
    the difference is computed ONCE then squared, so the SQL mirror
    must square the identical single subtraction)."""
    return F.aggregate(
        F.zip_with(
            a,
            b,
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def sql_dist2(a: str, b: str) -> str:
    """DuckDB mirror of :func:`dist2` (NULL-safe, see sql_dot)."""
    fold = (
        "list_reduce(list_prepend(0.0, "
        f"list_transform(list_zip({a}, {b}), "
        "p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)) "
        "* (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)))), "
        "(x, y) -> x + y)"
    )
    return (
        f"CASE WHEN ({a}) IS NULL OR ({b}) IS NULL THEN NULL "
        f"ELSE {fold} END"
    )
