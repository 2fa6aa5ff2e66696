"""Degenerate-cardinality sweep: the full Spark-vs-DuckDB oracle
gate re-run on EMPTY (0-row, schema-preserved) and SINGLETON (1-row)
copies of every fixture table.

Why this axis exists: at 100 TB an empty input is not an edge case —
a filter that matches nothing, a partition-pruned scan, a day with no
events, a tenant with one row. The determinism contract requires
every key to return its degenerate answer (usually zero rows, or one
all-NULL/zero aggregate row) rather than crash: the classes this
exposes are ANSI ``element_at`` on an empty array, fold seeds read
from a first row that does not exist, ``max()``/``arg_max`` over
nothing feeding arithmetic, 0/0 ratios, percentile/histogram bins
over an empty domain, k-means/centroid iteration with k > n, and
driver-side ``.first()``/broadcast of an empty aggregate. The other
sweep axes (hostile values, row order, partition layout) all keep
the fixture cardinality; this one removes it.

EMPTY: every table truncated to zero rows, exact parquet schema kept
(LIMIT 0 COPY — Spark must still read column types; a key whose plan
depends on data-derived schema would fail here first).

SINGLETON: one deterministic row per table (lowest natural id), with
the events/documents/embeddings row chosen to have non-NULL payloads
so scalar paths execute. Referential integrity is NOT patched — at
one row per table most joins go empty, which is the point: join-
dependent aggregates must survive empty join output too.

Streaming keys run in a separate ``--include-streaming`` half, on
the SINGLETON profile only: an EMPTY feed has no batches to replay
(harness contract), but a one-row feed replays and exercises every
stateful fold's first-row/seed path — the Python-side twin of the
batch half's n=1 divide-by-zero class (a ZeroDivisionError inside a
pandas state fold is a crash, not a NULL).

Usage: python scripts/degenerate_sweep.py [--profile empty|single]
       [--include-streaming] [keys...]
Exit code 0 iff every swept batch key passes its gate on both
profiles (or the one selected with --profile).
"""

from __future__ import annotations

import os
import sys
import tempfile
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

#: table -> natural id used to pick the deterministic singleton row
_IDS = {
    "region": "r_regionkey",
    "nation": "n_nationkey",
    "supplier": "s_suppkey",
    "customer": "c_custkey",
    "part": "p_partkey",
    "orders": "o_orderkey",
    "lineitem": "l_orderkey * 8 + l_linenumber",
    "events": "event_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
}


def build_degenerate_dir(src: str, profile: str) -> str:
    """Copy all tables from ``src`` into a temp dir at degenerate
    cardinality: ``empty`` = 0 rows (schema kept), ``single`` = the
    lowest-id row per table (deterministic, no RNG)."""
    out = tempfile.mkdtemp(prefix=f"degenerate_{profile}_")
    con = duckdb.connect()
    for t, key in _IDS.items():
        if profile == "empty":
            sel = f"SELECT * FROM read_parquet('{src}/{t}.parquet') LIMIT 0"
        else:
            sel = (
                f"SELECT * FROM read_parquet('{src}/{t}.parquet') "
                f"ORDER BY {key} LIMIT 1"
            )
        con.execute(f"COPY ({sel}) TO '{out}/{t}.parquet' (FORMAT PARQUET)")
    con.close()
    return out


def main() -> int:
    from streamz_postgres_spark.oracle import check_query, duckdb_connection
    from streamz_postgres_spark.registry import REGISTRY, _load_all
    from streamz_postgres_spark.session import get_spark

    _load_all()
    args = sys.argv[1:]
    include_streaming = "--include-streaming" in args
    profiles = ["single"] if include_streaming else ["empty", "single"]
    if "--profile" in args:
        i = args.index("--profile")
        profiles = [args[i + 1]]
        del args[i : i + 2]
    only = [a for a in args if not a.startswith("--")]

    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    spark = get_spark()
    keys = only or sorted(REGISTRY)
    fails = []
    for profile in profiles:
        d = build_degenerate_dir(src, profile)
        print(f"[{profile}] fixture at {d} (from {src})", flush=True)
        con = duckdb_connection(d)
        for key in keys:
            q = REGISTRY[key]
            is_stream = "streaming" in q.tags or "cdc" in q.tags
            if is_stream != include_streaming:
                # default run = batch keys only; --include-streaming
                # runs the streaming/cdc twins on the SINGLE profile
                # (an EMPTY feed has no batches to replay — harness
                # contract, see docstring — but a 1-row feed runs and
                # exercises every fold's first-row/seed path)
                continue
            try:
                ok, msg = check_query(spark, con, q, d)
            except Exception as e:  # noqa: BLE001 — triage tool, keep going
                ok, msg = False, f"ERR {type(e).__name__}: {e}"
            status = "ok" if ok else "FAIL"
            print(f"{status:4s} [{profile}] {key}: {msg[:300]}", flush=True)
            if not ok:
                fails.append((profile, key, msg))
    print(f"\n{len(fails)} failures across {len(profiles)} profiles")
    for p, k, m in fails:
        print(f"  [{p}] {k}: {m[:200]}")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
