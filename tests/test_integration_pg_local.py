"""Live CDC integration against a REAL Postgres server, self-hosted.

The docker-compose path (tests/test_integration_live.py) needs a
daemon and a JDBC jar, neither of which this sandbox has — but the
image DOES ship the Postgres server binaries (initdb/pg_ctl/psql
15.x), so this suite boots a throwaway single-user-socket cluster in
a temp dir and exercises the REAL polling-CDC semantics the
reference is built on: xmin-cursor snapshot, incremental polls that
see exactly the committed changes (inserts AND updates — xmin moves
on update), the in-flight-transaction safe_cursor horizon, and the
full PollingCdcSource loop, all through PsqlPollingLoader (same
server-side SQL as JdbcPollingLoader, COPY-CSV transport). Skips
cleanly when the binaries are absent.
"""

from __future__ import annotations

import shutil
import subprocess
import tempfile
import time
from pathlib import Path

import pytest

pytestmark = pytest.mark.slow

_PG_PORT = "55432"  # socket-only cluster; port still names the socket file


def _have_pg() -> bool:
    return all(shutil.which(b) for b in ("initdb", "pg_ctl", "psql"))


def _server_cmd(cmd: list[str]) -> list[str]:
    """Postgres server binaries refuse to run as root; when the test
    session is root (the sandbox), drop to the image's unprivileged
    ``postgres`` user via runuser. Non-root sessions run directly."""
    import os

    if os.geteuid() != 0:
        return cmd
    if not shutil.which("runuser"):
        pytest.skip("root session and no runuser to drop privileges")
    return ["runuser", "-u", "postgres", "--", *cmd]


@pytest.fixture(scope="module")
def pg_dsn():
    """Boot a scratch Postgres cluster (unix socket only, trust
    auth) and yield the psql connection args; tear it down fully."""
    import os
    import pwd

    if not _have_pg():
        pytest.skip("no Postgres server binaries (initdb/pg_ctl/psql)")
    if os.geteuid() == 0:
        try:
            pwd.getpwnam("postgres")
        except KeyError:
            pytest.skip("root session and no postgres user to run as")
    d = Path(tempfile.mkdtemp(prefix="pg_live_"))
    data, sock = d / "data", d / "sock"
    sock.mkdir()
    if os.geteuid() == 0:
        pg_uid = pwd.getpwnam("postgres")
        for p in (d, sock):
            os.chown(p, pg_uid.pw_uid, pg_uid.pw_gid)
    subprocess.run(
        _server_cmd(
            ["initdb", "-D", str(data), "-U", "postgres", "--auth=trust"]
        ),
        check=True,
        capture_output=True,
    )
    subprocess.run(
        _server_cmd(
            [
                "pg_ctl", "-D", str(data), "-w", "-l", str(d / "pg.log"),
                "-o",
                f"-p {_PG_PORT} -k {sock} -c listen_addresses=''",
                "start",
            ]
        ),
        check=True,
        capture_output=True,
    )
    dsn = ["-h", str(sock), "-p", _PG_PORT, "-U", "postgres", "-d", "postgres"]
    # server accepts connections (pg_ctl -w waited, but belt+braces)
    for _ in range(50):
        r = subprocess.run(
            ["psql", *dsn, "-X", "-c", "SELECT 1"], capture_output=True
        )
        if r.returncode == 0:
            break
        time.sleep(0.2)
    else:
        pytest.fail("scratch Postgres did not come up")
    yield dsn
    subprocess.run(
        _server_cmd(["pg_ctl", "-D", str(data), "-m", "immediate", "stop"]),
        capture_output=True,
    )
    shutil.rmtree(d, ignore_errors=True)


def _sql(dsn, sql: str) -> str:
    out = subprocess.run(
        ["psql", *dsn, "-X", "-A", "-t", "-c", sql],
        capture_output=True,
        text=True,
        check=True,
    )
    return out.stdout.strip()


@pytest.fixture()
def fresh_table(pg_dsn):
    _sql(pg_dsn, "DROP TABLE IF EXISTS t_cdc")
    _sql(
        pg_dsn,
        "CREATE TABLE t_cdc (id bigint PRIMARY KEY, v double precision,"
        " note text)",
    )
    return pg_dsn


_SCHEMA = "id bigint, v double, note string"


def _loader(spark, dsn):
    from streamz_postgres_spark.sources.cdc import PsqlPollingLoader

    return PsqlPollingLoader(
        spark=spark, dsn=dsn, table="t_cdc", schema=_SCHEMA
    )


def test_xmin_cursor_loop_live(spark, fresh_table):
    """Snapshot -> commit more (insert + update) -> incremental sees
    exactly the changed rows -> cursor advances -> empty poll."""
    dsn = fresh_table
    _sql(
        dsn,
        "INSERT INTO t_cdc SELECT i, i * 1.5, 'seed' "
        "FROM generate_series(1, 5) i",
    )
    ld = _loader(spark, dsn)
    snap = ld.snapshot()
    assert snap.count() == 5
    assert set(snap.columns) == {"id", "v", "note", "__cursor"}
    cursor = ld.max_cursor()
    assert cursor > 0

    # three inserts in one txn, one update in another: the update
    # rewrites that row's xmin, so it MUST reappear in the poll
    _sql(
        dsn,
        "INSERT INTO t_cdc SELECT i, i * 1.5, 'new' "
        "FROM generate_series(6, 8) i",
    )
    _sql(dsn, "UPDATE t_cdc SET v = 99.0, note = 'upd' WHERE id = 2")
    inc = ld.incremental(cursor)
    rows = {r.id: (r.v, r.note) for r in inc.collect()}
    assert rows == {
        6: (9.0, "new"),
        7: (10.5, "new"),
        8: (12.0, "new"),
        2: (99.0, "upd"),
    }
    # inserts share one txn -> one xmin; the update is a later txn
    cursors = {r.id: r["__cursor"] for r in inc.collect()}
    assert cursors[6] == cursors[7] == cursors[8]
    assert cursors[2] > cursors[6]

    # with nothing in flight the horizon clears every committed row
    safe = ld.safe_cursor()
    assert safe is not None and safe >= ld.max_cursor()
    # cursor caught up -> empty incremental
    assert ld.incremental(ld.max_cursor()).count() == 0


def test_safe_cursor_holds_back_open_transaction(spark, fresh_table):
    """The at-least-once guarantee hinges on safe_cursor: a row
    written by a still-open transaction must keep the horizon BELOW
    that transaction's xid so a poll cannot advance past it."""
    dsn = fresh_table
    _sql(dsn, "INSERT INTO t_cdc VALUES (1, 1.0, 'seed')")
    ld = _loader(spark, dsn)
    quiet = ld.safe_cursor()
    # open a transaction that wrote but did not commit, in a
    # separate long-lived psql process
    proc = subprocess.Popen(
        ["psql", *dsn, "-X"],
        stdin=subprocess.PIPE,
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
        text=True,
    )
    proc.stdin.write(
        "BEGIN;\nINSERT INTO t_cdc VALUES (100, 0.5, 'inflight');\n"
    )
    proc.stdin.flush()
    time.sleep(1.0)  # let the txn register
    try:
        held = ld.safe_cursor()
        open_xid = int(
            _sql(
                dsn,
                "SELECT backend_xid::text::bigint FROM pg_stat_activity "
                "WHERE backend_xid IS NOT NULL "
                "ORDER BY backend_xid::text::bigint LIMIT 1",
            )
        )
        assert held is not None and held < open_xid
        assert held >= (quiet or 0)
    finally:
        proc.stdin.write("COMMIT;\n\\q\n")
        proc.stdin.flush()
        proc.wait(timeout=10)
    # once committed, the horizon passes the row and a poll sees it
    assert ld.safe_cursor() >= open_xid
    ids = {r.id for r in ld.incremental(0).collect()}
    assert 100 in ids


def test_polling_cdc_source_full_loop_live(spark, fresh_table):
    """PollingCdcSource end-to-end against the live server: snapshot
    batch, then a poll batch with exactly the new rows, envelopes
    well-formed, cursor monotone."""
    from pyspark.sql import functions as F

    from streamz_postgres_spark.sources.cdc import PollingCdcSource

    dsn = fresh_table
    _sql(
        dsn,
        "INSERT INTO t_cdc SELECT i, i * 2.0, 'seed' "
        "FROM generate_series(1, 4) i",
    )
    src = PollingCdcSource(_loader(spark, dsn), key_cols=["id"])
    batches = []

    def apply_fn(env, idx):
        batches.append((idx, env.select("op", "seq", "key", "after").collect()))

    src.start(apply_fn)
    assert len(batches) == 1 and len(batches[0][1]) == 4
    assert {r.op for r in batches[0][1]} == {"r"}
    c0 = src.cursor
    assert c0 > 0

    _sql(dsn, "INSERT INTO t_cdc VALUES (10, 5.0, 'polled')")
    n = src.poll_once(apply_fn, 1)
    assert n == 1 and src.cursor >= c0
    (_, rows) = batches[-1]
    assert len(rows) == 1
    import json

    assert json.loads(rows[0].key) == {"id": 10}
    assert json.loads(rows[0].after)["note"] == "polled"
    # quiet poll: no rows, cursor stable
    assert src.poll_once(apply_fn, 2) == 0


def test_write_back_round_trip_live(spark, fresh_table):
    """Full source->consumer->sink cycle against the live server:
    poll a table out through PsqlPollingLoader, materialize the
    latest rows with apply_changes, write them back into a second
    PG table through PsqlTableSink, and verify IN POSTGRES that the
    materialization tracks the source through an update."""
    from pyspark.sql import functions as F

    from streamz_postgres_spark.sources.cdc import (
        PsqlTableSink,
        apply_changes,
        to_envelope,
    )

    dsn = fresh_table
    _sql(
        dsn,
        "INSERT INTO t_cdc SELECT i, i * 1.0, 'v1' "
        "FROM generate_series(1, 6) i",
    )
    ld = _loader(spark, dsn)
    sink = PsqlTableSink(spark=spark, dsn=dsn, table="t_mat")

    snap = to_envelope(ld.snapshot(), ["id"], "r")
    mat = apply_changes(snap)
    n = sink.write(
        mat.select(
            F.get_json_object("after", "$.id").cast("bigint").alias("id"),
            F.get_json_object("after", "$.v").cast("double").alias("v"),
            F.get_json_object("after", "$.note").alias("note"),
        ),
        mode="overwrite",
    )
    assert n == 6
    assert _sql(dsn, "SELECT COUNT(*) || ',' || SUM(v) FROM t_mat") == "6,21"

    # source moves: one update + one insert; poll the delta, apply it
    # over the materialized state, write back, verify in PG
    cursor = ld.max_cursor()
    _sql(dsn, "UPDATE t_cdc SET v = 100.0, note = 'v2' WHERE id = 3")
    _sql(dsn, "INSERT INTO t_cdc VALUES (7, 7.0, 'v1')")
    delta = to_envelope(ld.incremental(cursor), ["id"], "u")
    mat2 = apply_changes(snap.unionByName(delta))
    sink.write(
        mat2.select(
            F.get_json_object("after", "$.id").cast("bigint").alias("id"),
            F.get_json_object("after", "$.v").cast("double").alias("v"),
            F.get_json_object("after", "$.note").alias("note"),
        ),
        mode="overwrite",
    )
    assert _sql(dsn, "SELECT COUNT(*) FROM t_mat") == "7"
    assert _sql(dsn, "SELECT v || '/' || note FROM t_mat WHERE id = 3") == (
        "100/v2"
    )
    assert _sql(dsn, "SELECT note FROM t_mat WHERE id = 7") == "v1"
    ld.close()  # drop the loader's scratch CSVs now that frames are consumed


def test_hostile_values_round_trip_live(spark, fresh_table):
    """Round-7 review finds, pinned live: quotes/newlines inside
    text survive the COPY CSV hop in BOTH directions, NULL and empty
    string stay distinct, and a NULL in a bigint column does not
    become '1.0' (the pandas float64 coercion). Write hostile rows
    through PsqlTableSink, read them back through PsqlPollingLoader,
    and compare exactly."""
    dsn = fresh_table
    from streamz_postgres_spark.sources.cdc import (
        PsqlPollingLoader,
        PsqlTableSink,
    )

    hostile = [
        (1, 1.5, 'he said "hi"'),
        (2, None, "line one\nline two"),
        (3, 2.5, ""),           # empty string, NOT null
        (4, 3.5, None),         # null, NOT empty string
        (5, None, 'comma, "quoted, too", end'),
    ]
    df = spark.createDataFrame(hostile, "id long, v double, note string")
    sink = PsqlTableSink(spark=spark, dsn=dsn, table="t_hostile")
    assert sink.write(df, mode="overwrite") == 5

    # server-side truth checks (no CSV on this path)
    assert _sql(dsn, "SELECT note FROM t_hostile WHERE id = 1") == (
        'he said "hi"'
    )
    assert _sql(dsn, "SELECT v IS NULL FROM t_hostile WHERE id = 2") == "t"
    assert _sql(dsn, "SELECT note = '' FROM t_hostile WHERE id = 3") == "t"
    assert _sql(dsn, "SELECT note IS NULL FROM t_hostile WHERE id = 4") == "t"

    ld = PsqlPollingLoader(
        spark=spark, dsn=dsn, table="t_hostile",
        schema="id long, v double, note string",
    )
    back = {
        r.id: (r.v, r.note)
        for r in ld.snapshot().select("id", "v", "note").collect()
    }
    assert back == {i: (v, n) for i, v, n in hostile}
    ld.close()


def test_pk_cursor_loader_live(spark, fresh_table):
    """The non-xmin cursor path live: a PK cursor has no
    in-flight-transaction horizon (safe_cursor None), so
    PollingCdcSource must fall back to the table-max regression
    check — and a PK cursor must NOT re-emit updates (it tracks
    inserts only, the documented difference from xmin)."""
    from streamz_postgres_spark.sources.cdc import (
        PollingCdcSource,
        PsqlPollingLoader,
    )

    dsn = fresh_table
    _sql(
        dsn,
        "INSERT INTO t_cdc SELECT i, i * 1.0, 'seed' "
        "FROM generate_series(1, 4) i",
    )
    ld = PsqlPollingLoader(
        spark=spark, dsn=dsn, table="t_cdc", schema=_SCHEMA,
        cursor_expr="id",
    )
    assert ld.safe_cursor() is None
    assert ld.max_cursor() == 4

    src = PollingCdcSource(ld, key_cols=["id"])
    seen = []
    src.start(lambda env, idx: seen.append(env.count()))
    assert src.cursor == 4

    # an UPDATE does not move a PK cursor; an INSERT does
    _sql(dsn, "UPDATE t_cdc SET v = 99.0 WHERE id = 2")
    assert src.poll_once(lambda env, idx: seen.append(env.count()), 1) == 0
    _sql(dsn, "INSERT INTO t_cdc VALUES (9, 9.0, 'new')")
    assert src.poll_once(lambda env, idx: seen.append(env.count()), 2) == 1
    assert src.cursor == 9
    # quiet poll exercises the table-max fallback branch (safe=None)
    assert src.poll_once(lambda env, idx: None, 3) == 0
    assert src.cursor == 9
