"""Kafka source/sink builders (SURVEY §2.1: from_kafka /
from_kafka_batched / to_kafka).

No broker exists in this environment, so these are the production
builder functions (untested here, exercised in any cluster with
``kafka.bootstrap.servers``); the payload format is the CDC envelope
from sources/cdc.py, so a Debezium topic plugs straight into
``normalize_envelope`` -> ``apply_changes``.

Exactly-once: the reference's from_kafka_batched checkpoints offsets
manually; Spark's checkpointLocation commit log does the same per
micro-batch, and the file/Kafka sinks are idempotent/transactional
— see streaming/files.py for the demonstrated file-sink ledger.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streamz_postgres_spark.sources.cdc import normalize_envelope


def from_kafka(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming Kafka source -> raw records (key/value binary +
    topic/partition/offset/timestamp metadata)."""
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )
    if max_offsets_per_trigger is not None:
        # backpressure: the micro-batch analogue of streamz buffer/
        # rate_limit (SURVEY §2.3)
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    return reader.load()


def from_kafka_cdc(
    spark: SparkSession, bootstrap_servers: str, topic: str
) -> DataFrame:
    """Kafka topic of Debezium-shaped JSON -> uniform CDC envelope
    (the production replacement for the polling loader)."""
    raw = from_kafka(spark, bootstrap_servers, topic)
    return normalize_envelope(
        raw.select(F.col("value").cast("string").alias("value")), "value"
    )


def to_kafka(
    df: DataFrame,
    bootstrap_servers: str,
    topic: str,
    checkpoint_dir: str,
    key_col: str | None = None,
):
    """Streaming Kafka sink: serialize rows as JSON values (keyed
    writes preserve per-key ordering across partitions). Returns the
    StreamingQuery."""
    cols = [F.to_json(F.struct(*df.columns)).alias("value")]
    if key_col is not None:
        cols.insert(0, F.col(key_col).cast("string").alias("key"))
    return (
        df.select(*cols)
        .writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
