"""streamz_postgres_spark — a PySpark-native analytics engine.

A ground-up re-expression of the capability surface of
``roveo/streamz_postgres`` (polling Postgres-CDC feeding a streamz
operator pipeline — see SURVEY.md) as an idiomatic Apache Spark
engine: DataFrame/SQL logical plans optimized by Catalyst, Structured
Streaming for unbounded inputs, plus the large-scale training-data
operators (dedup, similarity search, text analysis, multimodal
columns) a 100 TB pipeline needs.

Layout
------
- ``session``    SparkSession builder with scale-aware defaults
- ``catalog``    fixture-table loader (parquet star schema)
- ``registry``   query registry: name -> (spark callable, oracle SQL)
- ``operators``  relational/window/join/agg/extension operators
- ``functions``  reusable column helpers (deterministic numerics,
                 vector math, text features)
- ``sources``    CDC envelope + pollers, bounded streaming replay
- ``streaming``  Structured Streaming runners for the streamz
                 operator surface (windows, dedup, as-of state)
- ``plans``      scale posture: partitioning/skew/broadcast helpers
"""

from streamz_postgres_spark.api import SparkStream
from streamz_postgres_spark.session import get_spark
from streamz_postgres_spark.catalog import TABLES, load_table, register_views
from streamz_postgres_spark.registry import REGISTRY, all_queries, all_oracle_sql

__all__ = [
    "SparkStream",
    "get_spark",
    "TABLES",
    "load_table",
    "register_views",
    "REGISTRY",
    "all_queries",
    "all_oracle_sql",
]

__version__ = "0.1.0"
