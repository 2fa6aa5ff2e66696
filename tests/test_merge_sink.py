"""Contract tests for the pluggable MERGE seam (streaming/merge.py).

Every test drives the sink THROUGH THE SEAM INTERFACE
(merge_batch / compact / current), not through format-specific
internals, so a Delta-backed implementation must pass the same
suite unchanged the day a Delta runtime exists. The contract under
test: latest-row-wins per key, delete tombstones that cannot be
resurrected by late older updates, idempotent epoch replay, and
lazy current() with tombstones filtered.
"""

from __future__ import annotations

import shutil
import tempfile

import pytest


def _mk(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, last_seq long, current_value double, op string"
    )


@pytest.fixture()
def sink():
    from streamz_postgres_spark.streaming.merge import SnapshotMergeSink

    d = tempfile.mkdtemp(prefix="merge_seam_")
    yield SnapshotMergeSink(
        d, key_cols=["user_id"], seq_col="last_seq", op_col="op"
    )
    shutil.rmtree(d, ignore_errors=True)


def _state(spark, sink):
    cur = sink.current(spark)
    assert cur is not None
    return {
        r.user_id: (r.last_seq, r.current_value)
        for r in cur.collect()
    }


class TestMergeSinkContract:
    def test_latest_wins_within_and_across_epochs(self, spark, sink):
        sink.merge_batch(
            _mk(spark, [(1, 10, 1.0, "u"), (1, 12, 2.0, "u"), (2, 11, 3.0, "u")]),
            0,
        )
        assert _state(spark, sink) == {1: (12, 2.0), 2: (11, 3.0)}
        # an older cross-epoch row must NOT regress key 1
        sink.merge_batch(
            _mk(spark, [(1, 11, 9.0, "u"), (2, 20, 4.0, "u")]), 1
        )
        assert _state(spark, sink) == {1: (12, 2.0), 2: (20, 4.0)}

    def test_tombstone_hides_key_and_blocks_resurrection(self, spark, sink):
        sink.merge_batch(_mk(spark, [(1, 10, 1.0, "u")]), 0)
        sink.merge_batch(_mk(spark, [(1, 20, 0.0, "d")]), 1)
        assert _state(spark, sink) == {}
        # late-arriving OLDER update for the deleted key: the
        # tombstone must keep winning
        sink.merge_batch(_mk(spark, [(1, 15, 5.0, "u")]), 2)
        assert _state(spark, sink) == {}
        # a genuinely NEWER update re-creates the key
        sink.merge_batch(_mk(spark, [(1, 25, 7.0, "u")]), 3)
        assert _state(spark, sink) == {1: (25, 7.0)}

    def test_epoch_replay_is_idempotent(self, spark, sink):
        sink.merge_batch(_mk(spark, [(1, 10, 1.0, "u")]), 0)
        b1 = _mk(spark, [(1, 20, 2.0, "u"), (2, 5, 3.0, "u")])
        sink.merge_batch(b1, 1)
        once = _state(spark, sink)
        # a restarted foreachBatch replays the failed epoch
        sink.merge_batch(b1, 1)
        assert _state(spark, sink) == once == {1: (20, 2.0), 2: (5, 3.0)}

    def test_empty_stream_has_no_current(self, spark, sink):
        assert sink.current(spark) is None

    def test_compact_keeps_only_final_state(self, spark, sink):
        for ep in range(3):
            sink.merge_batch(
                _mk(spark, [(1, 10 + ep, float(ep), "u")]), ep
            )
        sink.compact()
        assert _state(spark, sink) == {1: (12, 2.0)}


def test_pick_merge_sink_selects_best_available(spark):
    """The seam: Delta runtime absent here, so the factory must fall
    back to the snapshot sink (and never raise mid-stream)."""
    from streamz_postgres_spark.streaming.merge import (
        DeltaMergeSink,
        SnapshotMergeSink,
        pick_merge_sink,
    )

    d = tempfile.mkdtemp(prefix="merge_pick_")
    try:
        s = pick_merge_sink(spark, d, ["user_id"], "last_seq", "op")
        delta_capable = False
        try:
            import delta  # noqa: F401

            delta_capable = "DeltaSparkSessionExtension" in (
                spark.conf.get("spark.sql.extensions", "") or ""
            )
        except ImportError:
            pass
        if delta_capable:
            assert isinstance(s, DeltaMergeSink)
        else:
            # package absent OR session lacks the Delta extension:
            # either way the Delta strategy must fail at WIRING
            # time, loudly, and the factory must fall back
            assert isinstance(s, SnapshotMergeSink)
            with pytest.raises(ImportError):
                DeltaMergeSink(spark, d, ["user_id"], "last_seq", "op")
    finally:
        shutil.rmtree(d, ignore_errors=True)
