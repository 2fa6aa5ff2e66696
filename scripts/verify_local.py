"""Local replica of the driver's correctness gate.

Runs every registered query on Spark and its oracle SQL on DuckDB at
the same scale factor, then compares row count, schema, and the
order-insensitive value multiset (see streamz_postgres_spark.oracle).

Usage:
  python scripts/verify_local.py [--sf /root/testdata/sf0.01] [keys...]

Exit code 0 iff every checked query matches (rows-only queries pass
if they run).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from streamz_postgres_spark.oracle import check_query, duckdb_connection  # noqa: E402
from streamz_postgres_spark.registry import REGISTRY, _load_all  # noqa: E402
from streamz_postgres_spark.session import get_spark  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("keys", nargs="*")
    args = ap.parse_args()

    _load_all()
    keys = args.keys or sorted(REGISTRY)
    unknown = [k for k in keys if k not in REGISTRY]
    if unknown:
        print(f"unknown keys: {unknown}")
        return 2

    spark = get_spark("verify_local")
    con = duckdb_connection(args.sf)

    failed = []
    for k in keys:
        try:
            ok, msg = check_query(spark, con, REGISTRY[k], args.sf)
        except Exception as e:  # noqa: BLE001
            ok, msg = False, f"EXC {type(e).__name__}: {str(e)[:300]}"
        print(f"[{'PASS' if ok else 'FAIL'}] {k}: {msg}", flush=True)
        if not ok:
            failed.append(k)

    print(f"\n{len(keys) - len(failed)}/{len(keys)} passed")
    if failed:
        print("failed:", " ".join(failed))
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
