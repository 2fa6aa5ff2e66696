"""Checkpoint recovery: a streaming query stopped and RESTARTED from
the same checkpoint must process each input file exactly once — the
property that makes the file sink's commit log an exactly-once
ledger across driver crashes (what the reference approximates with
manual Kafka offset checkpoints).
"""

from __future__ import annotations

import os
import shutil
import tempfile

import pyarrow.parquet as pq
import pytest

from pyspark.sql import functions as F

from streamz_postgres_spark.catalog import table_path
from tests.conftest import SF_DIR

_SCHEMA = "event_id bigint, user_id bigint, value double"


@pytest.fixture()
def dirs():
    src = tempfile.mkdtemp(prefix="ckpt_src_")
    sink = tempfile.mkdtemp(prefix="ckpt_sink_")
    yield src, sink
    shutil.rmtree(src, ignore_errors=True)
    shutil.rmtree(sink, ignore_errors=True)


def test_restart_from_checkpoint_is_exactly_once(spark, dirs):
    src, sink = dirs
    data, ckpt = os.path.join(sink, "data"), os.path.join(sink, "ckpt")
    t = pq.read_table(
        table_path(SF_DIR, "events"), columns=["event_id", "user_id", "value"]
    )
    half = t.num_rows // 2
    pq.write_table(t.slice(0, half), f"{src}/a.parquet")

    def run_available_now():
        s = spark.readStream.schema(_SCHEMA).parquet(src)
        q = (
            s.writeStream.format("parquet")
            .option("path", data)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # run 1 sees only file a; the query then STOPS (simulated crash /
    # redeploy boundary: new query object, same checkpoint)
    run_available_now()
    assert spark.read.parquet(data).count() == half

    # file b arrives while "down"; the restarted query must pick up
    # exactly the delta — file a is in the checkpoint's seen-set
    pq.write_table(t.slice(half), f"{src}/b.parquet")
    run_available_now()

    got = spark.read.parquet(data)
    assert got.count() == t.num_rows
    # exact multiset over the key: every event exactly once
    dup = got.groupBy("event_id").count().filter(F.col("count") > 1).count()
    assert dup == 0
    assert got.select("event_id").distinct().count() == t.num_rows
