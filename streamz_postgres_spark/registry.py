"""Query registry — the engine's public query surface.

Every operator from SURVEY.md §2.7/§2.8 registers here as a named
query: a Spark callable ``(spark, sf_dir) -> DataFrame`` plus (when
SQL-expressible) a DuckDB oracle SQL string the driver cross-checks.

Design rules enforced by convention across all registered queries:

- **Deterministic values.** Double aggregations go through the
  decimal-sum trick (`functions.numeric.dsum`) so Spark and DuckDB
  produce bit-identical doubles regardless of summation order.
- **Matching column names.** Every computed column is aliased the
  same on both sides (driver sorts columns by name before hashing).
- **Timezone independence.** Only NTZ-safe timestamp functions, so
  results don't depend on the driver session's timezone.
- **No driver materialization.** Callables return lazy DataFrames;
  nothing collects.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    spark_fn: SparkQuery
    oracle: str | None  # DuckDB SQL; None => rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, Query] = {}


def register(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
) -> Callable[[SparkQuery], SparkQuery]:
    """Decorator: add a query implementation to the registry."""

    def deco(fn: SparkQuery) -> SparkQuery:
        if name in REGISTRY:
            raise ValueError(f"duplicate query key {name!r}")
        REGISTRY[name] = Query(
            name=name,
            spark_fn=fn,
            oracle=oracle,
            doc=(fn.__doc__ or "").strip(),
            tags=tags,
        )
        return fn

    return deco


def _load_all() -> None:
    """Import all operator modules so their @register calls run."""
    # Imported lazily to avoid import cycles (operators import registry).
    import streamz_postgres_spark.operators  # noqa: F401


def all_queries() -> dict[str, SparkQuery]:
    _load_all()
    return {k: q.spark_fn for k, q in REGISTRY.items()}


def all_oracle_sql() -> dict[str, str]:
    _load_all()
    return {k: q.oracle for k, q in REGISTRY.items() if q.oracle is not None}
