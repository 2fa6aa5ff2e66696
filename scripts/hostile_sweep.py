"""Hostile-fixture parity sweep: re-run the full Spark-vs-DuckDB
oracle gate on a MUTATED copy of sf0.001 that exercises the edge
classes the shipped fixtures never contain:

- ``events.value`` NULLs (SQL aggregates skip NULLs; HOF folds and
  window frames must agree with the oracle on them),
- ``events.props`` NULLs (JSON extraction on a NULL document),
- (user_id, ts) TIES in events (every tie-break that was "free"
  because the fixture had unique timestamps is now load-bearing),
- empty / whitespace-only / NULL ``documents.text`` rows.

The round-11 advisor found exactly one bug of this class (per-symbol
SUM lowered to a left fold that a single NULL poisons — latent only
because events has no NULLs). This sweep makes the whole class
mechanically discoverable instead of advisor-luck.

Usage: python scripts/hostile_sweep.py [--include-streaming] [keys...]
Exit code 0 iff every swept key passes its gate on the hostile data.
"""

from __future__ import annotations

import os
import sys
import tempfile
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def build_hostile_dir(src: str) -> str:
    """Copy all tables from ``src`` into a temp dir, mutating events
    and documents deterministically (no RNG — reruns are identical)."""
    out = tempfile.mkdtemp(prefix="hostile_sf_")
    con = duckdb.connect()
    passthrough = [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "embeddings",
    ]
    for t in passthrough:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet')) "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
    # events: NULL value on event_id%20==0; NULL props on %23==0;
    # duplicated (user_id, ts) rows (fresh event_ids above the max)
    # for event_id%17==0 with a perturbed value so tie-breaks matter.
    con.execute(
        f"""
        COPY (
          WITH base AS (
            SELECT event_id, ts, user_id, event_type,
                   CASE WHEN event_id % 20 = 0 THEN NULL
                        ELSE value END AS value,
                   CASE WHEN event_id % 23 = 0 THEN NULL
                        ELSE props END AS props
            FROM read_parquet('{src}/events.parquet')
          ), mx AS (SELECT MAX(event_id) AS m FROM base)
          SELECT * FROM base
          UNION ALL
          SELECT b.event_id + mx.m AS event_id, b.ts, b.user_id,
                 b.event_type,
                 b.value * 0.5 AS value, b.props
          FROM base b, mx WHERE b.event_id % 17 = 0
          ORDER BY event_id
        ) TO '{out}/events.parquet' (FORMAT PARQUET)
        """
    )
    # documents: doc_id%97==0 -> empty text, %89==0 -> whitespace-only,
    # %83==0 -> NULL text (n_chars kept consistent where defined).
    con.execute(
        f"""
        COPY (
          SELECT doc_id,
                 CASE WHEN doc_id % 83 = 0 THEN NULL
                      WHEN doc_id % 97 = 0 THEN ''
                      WHEN doc_id % 89 = 0 THEN '   '
                      ELSE text END AS text,
                 lang, source,
                 CASE WHEN doc_id % 83 = 0 THEN NULL
                      WHEN doc_id % 97 = 0 THEN 0
                      WHEN doc_id % 89 = 0 THEN 3
                      ELSE n_chars END AS n_chars
          FROM read_parquet('{src}/documents.parquet')
        ) TO '{out}/documents.parquet' (FORMAT PARQUET)
        """
    )
    con.close()
    return out


def main() -> int:
    from streamz_postgres_spark.oracle import check_query, duckdb_connection
    from streamz_postgres_spark.registry import REGISTRY, _load_all
    from streamz_postgres_spark.session import get_spark

    _load_all()
    include_streaming = "--include-streaming" in sys.argv
    only = [a for a in sys.argv[1:] if not a.startswith("--")]

    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    hostile = build_hostile_dir(src)
    print(f"hostile fixture at {hostile} (from {src})", flush=True)

    spark = get_spark()
    con = duckdb_connection(hostile)
    fails = []
    keys = only or sorted(REGISTRY)
    for key in keys:
        q = REGISTRY[key]
        if not include_streaming and (
            "streaming" in q.tags or "cdc" in q.tags
        ):
            continue
        try:
            ok, msg = check_query(spark, con, q, hostile)
        except Exception as e:  # noqa: BLE001 — triage tool, keep going
            ok, msg = False, f"ERR {type(e).__name__}: {e}"
        status = "ok" if ok else "FAIL"
        print(f"{status:4s} {key}: {msg[:300]}", flush=True)
        if not ok:
            fails.append((key, msg))
    print(f"\n{len(fails)} failures / {len(keys)} keys swept")
    for k, m in fails:
        print(f"  {k}: {m[:200]}")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
