"""Row-order-independence sweep: the full Spark-vs-DuckDB oracle
gate re-run on a VALUE-IDENTICAL copy of the fixtures whose physical
row order is deterministically scrambled (ORDER BY md5 of the row's
natural id).

Why this axis exists: the engine's determinism contract says a
1000-executor run returns the same values as local[32] — which
requires every batch key to be independent of the order rows come
off the scan. The oracle gate alone cannot see an order dependence
(DuckDB is order-independent by SQL semantics and Spark reads the
same file), and the driver fixtures are WRITTEN in id order, so any
accidental reliance on physical order — positional sampling, a
first()/head() without a sort, arrival-order tie-breaks, pandas
index-alignment in a fold — passes silently until a real cluster
reorders the scan. The v5 pandas index-alignment find (fold Series
realigned to pre-sort order) is exactly the class this sweep makes
mechanically discoverable.

Streaming keys are EXCLUDED by design: the replay harness's
documented contract is in-order file feed (a CDC log / compacted
topic), so a scrambled file violates the input contract rather than
exposing a bug — the folds' cross-batch ordering notes cover that
boundary explicitly.

Usage: python scripts/order_sweep.py [keys...]
Exit code 0 iff every swept batch key passes its gate on the
scrambled data.
"""

from __future__ import annotations

import os
import sys
import tempfile
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

#: table -> order-scramble key (md5 of the natural id; deterministic,
#: no RNG — reruns are identical)
_TABLES = {
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


def build_shuffled_dir(src: str) -> str:
    """Copy all tables from ``src`` into a temp dir with rows written
    in md5-scrambled order — identical content, hostile layout."""
    out = tempfile.mkdtemp(prefix="shuffled_sf_")
    con = duckdb.connect()
    for t, key in _TABLES.items():
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet') "
            f"ORDER BY md5(CAST({key} AS VARCHAR))) "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
    con.close()
    return out


def main() -> int:
    from streamz_postgres_spark.oracle import check_query, duckdb_connection
    from streamz_postgres_spark.registry import REGISTRY, _load_all
    from streamz_postgres_spark.session import get_spark

    _load_all()
    only = [a for a in sys.argv[1:] if not a.startswith("--")]

    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    shuffled = build_shuffled_dir(src)
    print(f"shuffled fixture at {shuffled} (from {src})", flush=True)

    spark = get_spark()
    con = duckdb_connection(shuffled)
    fails = []
    keys = only or sorted(REGISTRY)
    for key in keys:
        q = REGISTRY[key]
        if "streaming" in q.tags or "cdc" in q.tags:
            continue  # in-order replay contract, see module docstring
        try:
            ok, msg = check_query(spark, con, q, shuffled)
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
