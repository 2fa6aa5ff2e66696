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


def kafka_source_options(
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
) -> dict[str, str]:
    """Option assembly for the Kafka source, exposed as a pure
    function so the contract is unit-testable without a broker."""
    opts = {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": topic,
        "startingOffsets": starting_offsets,
    }
    if max_offsets_per_trigger is not None:
        # backpressure: the micro-batch analogue of streamz buffer/
        # rate_limit (SURVEY §2.3)
        opts["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)
    return opts


def from_kafka(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming Kafka source -> raw records (key/value binary +
    topic/partition/offset/timestamp metadata)."""
    reader = spark.readStream.format("kafka").options(
        **kafka_source_options(
            bootstrap_servers, topic, starting_offsets, max_offsets_per_trigger
        )
    )
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


def kafka_sink_options(
    bootstrap_servers: str, topic: str, checkpoint_dir: str
) -> dict[str, str]:
    """Option assembly for the Kafka sink (pure, broker-free)."""
    return {
        "kafka.bootstrap.servers": bootstrap_servers,
        "topic": topic,
        "checkpointLocation": checkpoint_dir,
    }


def kafka_sink_projection(df: DataFrame, key_col: str | None = None) -> DataFrame:
    """The sink's wire shape: rows serialized to a JSON ``value``,
    optionally keyed (keyed writes preserve per-key ordering across
    partitions). Factored out so the projection is testable on batch
    DataFrames without a broker."""
    cols = [F.to_json(F.struct(*df.columns)).alias("value")]
    if key_col is not None:
        cols.insert(0, F.col(key_col).cast("string").alias("key"))
    return df.select(*cols)


def to_kafka(
    df: DataFrame,
    bootstrap_servers: str,
    topic: str,
    checkpoint_dir: str,
    key_col: str | None = None,
):
    """Streaming Kafka sink. Returns the StreamingQuery."""
    return (
        kafka_sink_projection(df, key_col)
        .writeStream.format("kafka")
        .options(**kafka_sink_options(bootstrap_servers, topic, checkpoint_dir))
        .start()
    )
