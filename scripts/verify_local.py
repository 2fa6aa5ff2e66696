"""Local replica of the driver's correctness gate.

Runs every registered query on Spark and its oracle SQL on DuckDB at
the same scale factor, then compares:
  1. row count
  2. schema (sorted column names)
  3. order-insensitive value multiset (canonicalized strings)

Usage:
  python scripts/verify_local.py [--sf /root/testdata/sf0.01] [keys...]

Exit code 0 iff every checked query matches (rows-only queries pass
if they run and return >= 0 rows).
"""

from __future__ import annotations

import argparse
import math
import sys
import time
from collections import Counter
from decimal import Decimal
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb  # noqa: E402

from streamz_postgres_spark.catalog import TABLES, table_path  # noqa: E402
from streamz_postgres_spark.registry import REGISTRY, _load_all  # noqa: E402
from streamz_postgres_spark.session import get_spark  # noqa: E402


def canon(v) -> str:
    """Canonicalize one value for order-insensitive comparison."""
    if v is None:
        return "<null>"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # exact doubles expected thanks to the decimal-sum trick; use
        # repr so low-order-bit diffs are VISIBLE, not hidden
        return repr(v)
    if isinstance(v, Decimal):
        return repr(float(v))
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{canon(x)}" for k, x in sorted(v.items())) + "}"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def row_multiset(cols: list[str], rows) -> Counter:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return Counter("|".join(canon(r[i]) for i in order) for r in rows)


def check_one(spark, con, name: str, sf_dir: str) -> tuple[bool, str]:
    q = REGISTRY[name]
    t0 = time.time()
    sdf = q.spark_fn(spark, sf_dir)
    scols = sdf.columns
    srows = sdf.collect()
    t_spark = time.time() - t0
    if q.oracle is None:
        return True, f"rows-only ok ({len(srows)} rows, {t_spark:.1f}s)"
    t0 = time.time()
    ocur = con.execute(q.oracle)
    ocols = [d[0] for d in ocur.description]
    orows = ocur.fetchall()
    t_duck = time.time() - t0
    msg = f"{len(srows)} rows, spark {t_spark:.1f}s duck {t_duck:.1f}s"
    if len(srows) != len(orows):
        return False, f"ROWCOUNT spark={len(srows)} duck={len(orows)} ({msg})"
    if sorted(c.lower() for c in scols) != sorted(c.lower() for c in ocols):
        return False, f"SCHEMA spark={sorted(scols)} duck={sorted(ocols)}"
    ms, mo = row_multiset(scols, srows), row_multiset(ocols, orows)
    if ms != mo:
        diff_s = list((ms - mo).items())[:3]
        diff_o = list((mo - ms).items())[:3]
        return False, f"VALUES spark-only={diff_s} duck-only={diff_o}"
    return True, f"ok ({msg})"


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
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(args.sf, t)}')"
        )

    failed = []
    for k in keys:
        try:
            ok, msg = check_one(spark, con, k, args.sf)
        except Exception as e:  # noqa: BLE001
            ok, msg = False, f"EXC {type(e).__name__}: {str(e)[:300]}"
        status = "PASS" if ok else "FAIL"
        print(f"[{status}] {k}: {msg}", flush=True)
        if not ok:
            failed.append(k)

    print(f"\n{len(keys) - len(failed)}/{len(keys)} passed")
    if failed:
        print("failed:", " ".join(failed))
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
