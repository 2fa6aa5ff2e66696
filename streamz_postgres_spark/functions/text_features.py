"""Shared text-feature primitives with exact DuckDB SQL mirrors.

The dedup/text operators need hash functions that BOTH engines
compute identically so the driver's value-hash gate can check them.
xxhash64/murmur differ between engines, but md5 is md5 everywhere:
``hash60`` takes the first 15 hex digits of md5 (60 bits, fits
int64) — slower than xxhash64 but bit-identical across engines.
At 100 TB you would swap ``hash60`` for ``F.xxhash64`` (one line
here); every downstream operator is hash-agnostic.

All helpers are Catalyst expressions (codegen, no Python), each with
a ``sql_*`` twin that renders the equivalent DuckDB expression.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Mersenne prime 2^31-1: modulus for rolling fingerprints (keeps
#: acc*31+h inside int64).
FP_MOD = 2_147_483_647


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization (fixtures are single-space word soup)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, " ")


def sql_tokens(expr: str) -> str:
    return f"string_split({expr}, ' ')"


def hash60(col: Column) -> Column:
    """Deterministic 60-bit hash: first 15 hex digits of md5."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def sql_hash60(expr: str) -> str:
    return f"CAST('0x' || substr(md5({expr}), 1, 15) AS BIGINT)"


def seeded_hash60(col: Column, seed: int) -> Column:
    """Independent hash family member j: hash60(s || '#j')."""
    return hash60(F.concat(col, F.lit(f"#{seed}")))


def sql_seeded_hash60(expr: str, seed: int) -> str:
    return sql_hash60(f"({expr}) || '#{seed}'")


def spark_sql_hash60(expr: str) -> str:
    """hash60 as a Spark-SQL expression STRING — for call sites that
    build expr strings (HOF lambdas, selectExpr) rather than Columns.
    Spark's CAST cannot parse a '0x…' literal (that form is the
    DuckDB-side sql_hash60), so the Spark string uses conv(). One
    definition here keeps the build and probe sides of every
    hash-keyed structure (Bloom bits, LSH buckets) on the same
    formula (r10 review find: hand-copied literals in two modules)."""
    return f"CAST(conv(substring(md5({expr}), 1, 15), 16, 10) AS BIGINT)"


def spark_sql_seeded_hash60(expr: str, seed: int) -> str:
    """Spark-SQL string form of :func:`seeded_hash60`."""
    return spark_sql_hash60(f"concat({expr}, '#{seed}')")


#: Mersenne prime 2^61-1 for the double-hashing family.
DH_MOD = (1 << 61) - 1


def double_hash_parts(col: Column) -> tuple[Column, Column]:
    """One md5 -> two independent halves (60 and 56 bits).

    Basis of the Broder-style double-hashing family
    ``h_j = (h1 + j*h2) mod P``: 16 minhash functions for the price
    of ONE md5 per shingle (16x cheaper than 16 seeded md5s — the
    difference between 1 and 16 passes over 100 TB of shingles).
    h2 is capped at 56 bits so ``h1 + j*h2`` stays inside int64 for
    j <= 15; both engines then compute identical exact integers.
    """
    h = F.md5(col)
    h1 = F.conv(F.substring(h, 1, 15), 16, 10).cast("bigint")
    h2 = F.conv(F.substring(h, 16, 14), 16, 10).cast("bigint")
    return h1, h2


def sql_double_hash_parts(expr: str) -> tuple[str, str]:
    return (
        f"CAST('0x' || substr(md5({expr}), 1, 15) AS BIGINT)",
        f"CAST('0x' || substr(md5({expr}), 16, 14) AS BIGINT)",
    )


def shingles(tok: Column, n: int = 3) -> Column:
    """Word n-gram shingles of a token array (order-preserving).

    BINDS ``tok`` ONCE before indexing (r11): the shingle lambda
    reads the array n times per shingle, and a free-variable
    expression inside a higher-order-function lambda is RE-EVALUATED
    on every reference — callers passing ``tokens(col)`` (a split)
    paid a full re-split of the document per element_at, quadratic
    in document length (measured: the KN-perplexity bigram scan at
    the x10 replica dropped 25.4 -> 1.9 s from this binding alone).
    The single-element-array transform is the expression-level `let`:
    its lambda variable is a bound attribute holding the evaluated
    array, so every element_at reads the materialized value. Values
    are unchanged (same shingles, same null/short-array behavior);
    this is engine-local evaluation hygiene, invisible to oracles."""

    def _body(t: Column) -> Column:
        idx = F.when(
            F.size(t) >= n, F.sequence(F.lit(1), F.size(t) - (n - 1))
        ).otherwise(F.array().cast("array<int>"))
        return F.transform(
            idx,
            lambda i: F.concat_ws(
                " ", *[F.element_at(t, i + k) for k in range(n)]
            ),
        )

    return F.element_at(F.transform(F.array(tok), _body), 1)


def sql_shingles(tok_expr: str, n: int = 3) -> str:
    t = f"({tok_expr})"
    parts = " || ' ' || ".join(f"{t}[i + {k}]" for k in range(n))
    return f"list_transform(range(1, len({t}) - {n - 2}), i -> {parts})"
