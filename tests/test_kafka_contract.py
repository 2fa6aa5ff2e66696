"""Kafka builders, tested to the sandbox boundary (no broker): option
assembly is pure-function checked, and the CDC payload path runs end
to end on literal Debezium-shaped JSON — Kafka message bytes ->
normalize_envelope -> apply_changes — on a batch DataFrame, which is
the same expression tree the streaming reader feeds.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from streamz_postgres_spark.sources.cdc import apply_changes, normalize_envelope
from streamz_postgres_spark.sources.kafka import (
    kafka_sink_options,
    kafka_sink_projection,
    kafka_source_options,
)


def test_source_option_assembly():
    opts = kafka_source_options("broker1:9092,broker2:9092", "cdc.public.orders")
    assert opts == {
        "kafka.bootstrap.servers": "broker1:9092,broker2:9092",
        "subscribe": "cdc.public.orders",
        "startingOffsets": "earliest",
    }
    opts = kafka_source_options(
        "b:9092", "t", starting_offsets="latest", max_offsets_per_trigger=5000
    )
    assert opts["startingOffsets"] == "latest"
    # option values must be strings (DataStreamReader stringifies,
    # but the contract should not rely on it)
    assert opts["maxOffsetsPerTrigger"] == "5000"


def test_sink_option_assembly():
    opts = kafka_sink_options("b:9092", "out-topic", "/tmp/ckpt")
    assert opts == {
        "kafka.bootstrap.servers": "b:9092",
        "topic": "out-topic",
        "checkpointLocation": "/tmp/ckpt",
    }


def test_sink_projection_shape(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id bigint, v string")
    unkeyed = kafka_sink_projection(df)
    assert unkeyed.columns == ["value"]
    keyed = kafka_sink_projection(df, key_col="id")
    assert keyed.columns == ["key", "value"]
    rows = {r["key"]: r["value"] for r in keyed.collect()}
    assert rows["1"] == '{"id":1,"v":"a"}'


_DEBEZIUM_MESSAGES = [
    # create, update, delete for key 1; create for key 2 — latest-wins
    # apply must keep only key 2's row
    '{"op":"c","ts":"2024-01-01T00:00:00","seq":1,'
    '"key":"{\\"id\\":1}","before":null,"after":"{\\"id\\":1,\\"v\\":\\"a\\"}"}',
    '{"op":"u","ts":"2024-01-01T00:00:01","seq":2,'
    '"key":"{\\"id\\":1}","before":"{\\"id\\":1,\\"v\\":\\"a\\"}",'
    '"after":"{\\"id\\":1,\\"v\\":\\"b\\"}"}',
    '{"op":"d","ts":"2024-01-01T00:00:02","seq":3,'
    '"key":"{\\"id\\":1}","before":"{\\"id\\":1,\\"v\\":\\"b\\"}","after":null}',
    '{"op":"c","ts":"2024-01-01T00:00:03","seq":4,'
    '"key":"{\\"id\\":2}","before":null,"after":"{\\"id\\":2,\\"v\\":\\"x\\"}"}',
]


def test_debezium_json_to_applied_state(spark):
    """Literal Kafka message payloads through the full CDC consumer
    path: parse -> envelope -> latest-row-wins apply."""
    raw = spark.createDataFrame(
        [(m,) for m in _DEBEZIUM_MESSAGES], "value string"
    )
    env = normalize_envelope(raw, "value")
    assert env.columns == ["op", "ts", "seq", "key", "before", "after"]
    assert env.count() == 4
    # no message may fail to parse (from_json yields nulls silently)
    assert env.filter(F.col("op").isNull()).count() == 0

    state = apply_changes(env, key="key", seq_cols=["seq"])
    rows = state.collect()
    assert len(rows) == 1
    assert rows[0]["key"] == '{"id":2}'
    assert rows[0]["op"] == "c"
