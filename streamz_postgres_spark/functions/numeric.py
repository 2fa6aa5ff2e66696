"""Deterministic floating-point aggregation helpers.

Floating-point summation is not associative, so a distributed Spark
sum and a DuckDB single-threaded sum over the same doubles disagree
in low-order bits — and any hash-based correctness gate then fails
sporadically. The fix: route double sums through an exact decimal
accumulator and cast back to double at the end. Decimal addition is
exact and associative, so BOTH engines produce the identical double,
independent of partitioning, parallelism, or row order.

The same trick yields deterministic avg / var / stddev by expressing
them algebraically over exact sums:

    avg  = dsum(x) / count(x)
    var  = (dsum(x*x) - dsum(x)^2 / n) / (n - 1)

`SQL_DSUM` mirrors the construction for the DuckDB oracle strings.

DuckDB literal trap (round-7 hypothesis find): a BARE numeric
literal like 900719926.2578125 is typed DECIMAL(16,7) by DuckDB,
whose unscaled integer exceeds 2^53 — the DECIMAL->DOUBLE
conversion then lands one ulp off the IEEE parse, which flips the
floor rule at exact half-micro-unit ties. Oracles reading parquet
are immune (same bits both engines); anything FEEDING doubles to
DuckDB as SQL text must use quoted strings (CAST('<repr>' AS
DOUBLE)) or exponent notation (typed DOUBLE), never bare decimal
literals. Pinned by test_dsum_tie_value_via_string_literal.

Cost note (100 TB): decimal aggregation is still whole-stage-codegen
JVM arithmetic with map-side partial aggregation — it shuffles one
128-bit value per group per partition, exactly like a double sum.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 6 fractional digits captures the fixtures' value resolution; the
# decimal(38,0) micro-unit accumulator keeps ~1e31 of headroom for
# 100 TB-scale sums.
#
# WHY MICRO-UNITS AND NOT cast-to-decimal(38,6) (round-6 finding,
# caught by the hypothesis property test): Spark's double->decimal
# cast rounds the SHORTEST STRING representation (Java BigDecimal
# HALF_UP on Double.toString), while DuckDB rounds the EXACT binary
# value — for a double like 536870912.6132385 (exact expansion
# ...61323845...) Spark yields .613239 and DuckDB .613238. Raw
# fixture columns (<= 2 decimal digits) are grid-aligned and never
# near a 5e-7 tie, which is why the gates stayed green, but any
# division-derived double can land within one ulp of a tie and flip
# the gate. The fix: quantize with floor(x*1e6 + 0.5) — every step
# (power-of-ten multiply, add, floor) is a plain IEEE operation both
# engines compute bit-identically on the SAME double, so there is no
# string anywhere and no tie ambiguity (a tie rounds toward +inf on
# both sides by construction). Per-row range bound: |x| must stay
# below 2^63/1e6 ~ 9.2e12 for the BIGINT micro-units (far above any
# per-row value this engine aggregates; group SUMS then accumulate
# in decimal(38,0)/HUGEINT with ~1e31 headroom).
#
# PRECONDITION (round-6 advisor): inputs must be FINITE. The three
# implementations disagree on NaN/inf — Spark's floor(NaN*1e6+0.5)
# cast contributes NULL->0 micro-units silently, DuckDB's
# CAST(FLOOR(NaN) AS HUGEINT) raises, and Python math.floor(nan)
# raises ValueError inside a streaming-state fold. Every registered
# query feeds dsum from fixture columns or arithmetic over them
# (never a 0/0 or log(<=0) path), and the hypothesis property suite
# generates finite doubles only. Callers introducing a new dsum site
# with a potentially non-finite expression must null it out first
# (F.when(isnan|isinf, None)); nulls are skipped identically by all
# three implementations.
_MICRO = 1e6


def dsum(col: Column | str) -> Column:
    """Order-independent double sum, exact on any partitioning AND
    bit-identical to DuckDB's :func:`sql_dsum` (micro-unit integer
    accumulator; see module comment for why not a decimal cast, and
    for the FINITE-INPUT precondition shared with sql_dsum/micro6)."""
    c = F.col(col) if isinstance(col, str) else col
    micro = F.floor(c * F.lit(_MICRO) + F.lit(0.5)).cast("decimal(38,0)")
    return F.sum(micro).cast("double") / F.lit(_MICRO)


def davg(col: Column | str) -> Column:
    """Order-independent double mean. ``try_divide`` so an all-NULL
    (count = 0) group yields NULL like DuckDB's ``x / 0`` instead of
    raising under ANSI mode (degenerate-cardinality sweep)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.try_divide(dsum(c), F.count(c))


def dvar_samp(col: Column | str) -> Column:
    """Order-independent sample variance via exact sums. Both
    divisions are ``try_divide``: at n = 1 the sample denominator
    (n - 1) is exactly 0 and DuckDB's mirror (:func:`sql_dvar_samp`)
    returns NULL for division by zero, while Spark's ANSI ``/``
    would raise DIVIDE_BY_ZERO (degenerate-cardinality sweep)."""
    c = F.col(col) if isinstance(col, str) else col
    n = F.count(c).cast("double")
    sx = dsum(c)
    sxx = dsum(c * c)
    return F.try_divide(sxx - F.try_divide(sx * sx, n), n - F.lit(1.0))


def dstddev_samp(col: Column | str) -> Column:
    """Order-independent sample standard deviation."""
    return F.sqrt(dvar_samp(col))


def qround(col: Column | str, digits: int) -> Column:
    """Cross-engine-deterministic rounding via pure double arithmetic.

    Engine-native ``round`` differs between Spark (string-based
    BigDecimal HALF_UP on the shortest decimal repr) and DuckDB
    (numeric rounding) for doubles near decimal ties, so oracle-
    checked queries round with ``floor(x * 10^d + 0.5) / 10^d``:
    every step is an exact IEEE op computed identically everywhere.
    """
    c = F.col(col) if isinstance(col, str) else col
    scale = F.lit(float(10**digits))
    return F.floor(c * scale + F.lit(0.5)).cast("double") / scale


def sql_qround(expr: str, digits: int) -> str:
    scale = float(10**digits)
    return f"(CAST(FLOOR(({expr}) * {scale} + 0.5) AS DOUBLE) / {scale})"


def sql_dsum(expr: str) -> str:
    """DuckDB-side mirror of :func:`dsum` for oracle SQL strings
    (same floor-rule micro-units; HUGEINT sum is exact)."""
    return (
        f"(CAST(SUM(CAST(FLOOR(({expr}) * 1000000.0 + 0.5) AS HUGEINT)) "
        f"AS DOUBLE) / 1000000.0)"
    )


def micro6(v: float):
    """Python-side mirror of the dsum quantization for hand-rolled
    streaming-state folds: the exact Decimal the engine-side
    floor(v*1e6 + 0.5) micro-unit rule assigns to ``v``. Finite
    inputs only (math.floor raises on NaN/inf — see module
    precondition note)."""
    import math
    from decimal import Decimal

    return Decimal(math.floor(v * _MICRO + 0.5)).scaleb(-6)


def sql_davg(expr: str) -> str:
    return f"({sql_dsum(expr)} / COUNT({expr}))"


def sql_dvar_samp(expr: str) -> str:
    n = f"CAST(COUNT({expr}) AS DOUBLE)"
    sx = sql_dsum(expr)
    sxx = sql_dsum(f"({expr}) * ({expr})")
    return f"(({sxx} - {sx} * {sx} / {n}) / ({n} - 1.0))"


def sql_dstddev_samp(expr: str) -> str:
    return f"SQRT({sql_dvar_samp(expr)})"
