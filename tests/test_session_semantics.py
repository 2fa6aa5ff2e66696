"""Regression guards for the round-3 streaming red rows.

Root cause of both failures: the fixture generator switched the
events ``ts`` column from parquet TIMESTAMP(NANOS) to timestamp[us],
and ``replay_events`` hard-coded the nanos read path — every
streaming timestamp compressed 1000x, so all of a user's sessions
merged into one and interval joins over-matched ~6x. The batch
catalog adapted (dtype-gated rebuild) which is why only q_stream_*
went red.

Guards here:
 1. replay_events must agree with load_table on the ts values,
    whatever unit the fixture uses (both current fixture and a
    synthesized nanos twin).
 2. Session-window semantics: two events 31 minutes apart are TWO
    sessions — batch and streaming must agree.
"""

from __future__ import annotations

import os
import shutil
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pyspark.sql import functions as F

from streamz_postgres_spark.catalog import load_table
from streamz_postgres_spark.streaming.runner import (
    events_ts_unit,
    replay_events,
    run_to_table,
)
from tests.conftest import SF_DIR


def test_replay_ts_matches_batch_catalog(spark):
    batch = load_table(spark, SF_DIR, "events").select(
        F.min("ts").alias("mn"), F.max("ts").alias("mx"), F.count("*").alias("n")
    ).first()
    streamed = run_to_table(
        replay_events(spark, SF_DIR).select(
            F.min("ts").alias("mn"), F.max("ts").alias("mx"),
            F.count("*").alias("n"),
        ),
        "complete",
        spark,
    ).first()
    assert streamed["n"] == batch["n"]
    assert streamed["mn"] == batch["mn"]
    assert streamed["mx"] == batch["mx"]


@pytest.fixture(scope="module")
def nanos_twin_dir(spark):
    """The current fixture re-written with ts as TIMESTAMP(NANOS) —
    the legacy unit — so the adaptive read path is tested even after
    the generator moved on."""
    d = tempfile.mkdtemp(prefix="events_nanos_")
    tbl = pq.read_table(os.path.join(SF_DIR, "events.parquet"))
    i = tbl.schema.get_field_index("ts")
    tbl = tbl.set_column(i, "ts", tbl.column("ts").cast(pa.timestamp("ns")))
    pq.write_table(tbl, os.path.join(d, "events.parquet"))
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_replay_adapts_to_nanos_fixture(spark, nanos_twin_dir):
    assert events_ts_unit(nanos_twin_dir) == "ns"
    batch = load_table(spark, SF_DIR, "events").select(
        F.min("ts").alias("mn"), F.max("ts").alias("mx")
    ).first()
    streamed = run_to_table(
        replay_events(spark, SF_DIR, directory=nanos_twin_dir).select(
            F.min("ts").alias("mn"), F.max("ts").alias("mx")
        ),
        "complete",
        spark,
    ).first()
    assert streamed["mn"] == batch["mn"]
    assert streamed["mx"] == batch["mx"]


def _toy_events(spark):
    rows = [
        (1, "2024-01-01 00:00:00", 10, "click"),
        (2, "2024-01-01 00:31:00", 10, "purchase"),
        (3, "2024-01-01 00:05:00", 20, "click"),
    ]
    return (
        spark.createDataFrame(
            rows, "event_id long, ts_s string, user_id long, event_type string"
        )
        .withColumn("ts", F.col("ts_s").cast("timestamp_ntz"))
        .drop("ts_s")
    )


def test_session_window_gap_splits_sessions_batch(spark):
    df = _toy_events(spark)
    got = (
        df.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .count()
        .groupBy("user_id")
        .agg(F.count("*").alias("n_sessions"))
    )
    by_user = {r["user_id"]: r["n_sessions"] for r in got.collect()}
    assert by_user == {10: 2, 20: 1}


def test_session_window_exact_gap_boundary(spark):
    """Pin the touch-merge boundary rule (hostile-sweep v6): an
    event EXACTLY gap after the last one EXTENDS the session (the
    per-event windows [t, t+gap) and [t+gap, t+2gap) touch, and
    Spark merges touching windows, like Flink); one microsecond
    MORE splits. Every sessionizing oracle therefore tests
    strictly-greater-than-gap, not >=."""
    rows = [
        # u1: gaps of exactly 30:00 -> ONE session of three events
        (1, "2024-01-10 06:00:00", 1),
        (2, "2024-01-10 06:30:00", 1),
        (3, "2024-01-10 07:00:00", 1),
        # u2: gap of 30:00.000001 -> TWO sessions
        (4, "2024-01-10 06:00:00", 2),
        (5, "2024-01-10 06:30:00.000001", 2),
    ]
    df = (
        spark.createDataFrame(rows, "event_id long, ts_s string, user_id long")
        .withColumn("ts", F.col("ts_s").cast("timestamp_ntz"))
        .drop("ts_s")
    )
    got = (
        df.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .count()
        .groupBy("user_id")
        .agg(F.count("*").alias("n_sessions"))
    )
    by_user = {r["user_id"]: r["n_sessions"] for r in got.collect()}
    assert by_user == {1: 1, 2: 2}


@pytest.mark.slow
def test_session_window_gap_splits_sessions_streaming(spark):
    df = _toy_events(spark)
    d = tempfile.mkdtemp(prefix="toy_sessions_")
    try:
        df.coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "ev"))
        s = (
            spark.readStream.schema(df.schema)
            .format("parquet")
            .load(os.path.join(d, "ev"))
        )
        out = s.groupBy(
            F.session_window("ts", "30 minutes").alias("w"), "user_id"
        ).count()
        t = run_to_table(out, "complete", spark)
        by_user = {
            r["user_id"]: r["n_sessions"]
            for r in t.groupBy("user_id")
            .agg(F.count("*").alias("n_sessions"))
            .collect()
        }
        assert by_user == {10: 2, 20: 1}
    finally:
        shutil.rmtree(d, ignore_errors=True)
