"""SparkSession construction with scale-aware defaults.

Local testing runs ``local[$SPARK_GRAFT_CPUS]`` (default 32) in one
JVM; the configs below are chosen so the SAME logical plans survive a
1000-executor cluster at 100 TB:

- AQE on (runtime shuffle coalescing, skew-join splitting, runtime
  broadcast demotion/promotion) — the single biggest scale lever.
- ``spark.sql.shuffle.partitions`` sized to cores locally; on a real
  cluster AQE coalesces from a high initial number, so plans here do
  not bake in a partition count.
- Session timezone pinned to UTC: every fixture timestamp is NTZ and
  all library code avoids timezone-dependent functions, so results
  are identical under any driver-provided session too.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "streamz_postgres_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a local SparkSession with engine defaults."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
        # ENGINE-WIDE, by design: the events fixture stores
        # TIMESTAMP(NANOS), which Spark's reader rejects; the engine
        # reads nanos as LONG everywhere and rebuilds TimestampNTZ
        # (catalog.load_table / streaming.runner.replay_events).
        # Consequence: any nanos-timestamp parquet read in this
        # session yields LONG, not an error. Declared here at build
        # time so that's a documented engine property; the two read
        # sites re-assert it only because the external driver supplies
        # its own plain session.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Streaming: bounded-replay tests need a deterministic store.
        .config(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
        )
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.sql.warehouse.dir", "/tmp/spark_graft_warehouse")
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
