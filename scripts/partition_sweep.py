"""Partition-layout-independence sweep: the full Spark-vs-DuckDB
oracle gate re-run under a HOSTILE EXECUTION LAYOUT — same fixtures,
same queries, maximally different physical parallelism:

- ``spark.sql.shuffle.partitions = 5`` (vs the engine default of
  $SPARK_GRAFT_CPUS = 32): every hash-partitioned group/join/window
  co-locates a DIFFERENT key mix per task, so any fold or pandas
  group function that leaks state across the keys sharing its task,
  or depends on which keys share a task, changes answers,
- AQE OFF: the default profile's runtime coalescing collapses the
  tiny local shuffles back to one partition, which HIDES layout
  dependence — with AQE off the 5-partition layout actually
  executes, the single-partition-collapse masking is gone,
- ``spark.sql.files.maxPartitionBytes = 64k`` (+ zero open cost):
  the one-file-per-table fixtures split into many input tasks, so
  scan output is no longer one in-id-order partition — rows of the
  same group arrive from DIFFERENT tasks in file order but get
  CONCATENATED in nondeterministic task order after exchange. This
  is the local stand-in for a 1000-executor scan.

Why this axis exists: the determinism contract (SCALE.md) says a
1000-executor run returns the values local[32] returned — which the
oracle gate alone cannot check, because both the driver gate and the
row-order sweep execute one layout. The v5 pandas index-alignment
find (post-sort Series realigned to a positional list) and the tws
NULL-key grouping divergence were both exactly this class: invisible
at one partition count, wrong at another. This sweep makes the class
mechanically discoverable for every batch key at once.

Streaming keys are EXCLUDED by design: the replay harness pins its
own micro-batch boundaries and state-store partitioning (its
cross-batch ordering contract is documented at the folds), and its
results are value-checked against batch oracles that DO run here.

Usage: python scripts/partition_sweep.py [keys...]
Exit code 0 iff every swept batch key passes its gate under the
hostile layout.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    from streamz_postgres_spark.oracle import check_query, duckdb_connection
    from streamz_postgres_spark.registry import REGISTRY, _load_all
    from streamz_postgres_spark.session import get_spark

    _load_all()
    only = [a for a in sys.argv[1:] if not a.startswith("--")]

    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

    spark = get_spark(
        shuffle_partitions=5,
        extra_conf={
            "spark.sql.adaptive.enabled": "false",
            "spark.sql.files.maxPartitionBytes": "65536",
            "spark.sql.files.openCostInBytes": "0",
        },
    )
    got = spark.conf.get("spark.sql.shuffle.partitions")
    if got != "5":  # getOrCreate reused a default-profile session
        raise RuntimeError(
            f"hostile layout not applied (shuffle.partitions={got}); "
            "run this script in a fresh process"
        )
    print(
        f"hostile layout: shuffle=5 AQE=off maxPartitionBytes=64k "
        f"(fixtures: {src})",
        flush=True,
    )

    con = duckdb_connection(src)
    fails = []
    keys = only or sorted(REGISTRY)
    for key in keys:
        q = REGISTRY[key]
        if "streaming" in q.tags or "cdc" in q.tags:
            continue  # replay harness pins its own layout, see docstring
        try:
            ok, msg = check_query(spark, con, q, src)
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
