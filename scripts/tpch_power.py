"""TPC-H power run: execute all 22 classics back-to-back (Q1/Q3 via
the flagship module, Q17 via q_subquery_scalar, the remaining 19
from operators/tpch.py) against one SparkSession and print one JSON
line with per-query and total wall times.

Usage: python scripts/tpch_power.py [--sf /root/testdata/sf0.1] [--runs 3]

The per-query time is the median over --runs full materializations
(count() action) after one warm-up pass of the whole sequence.
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from streamz_postgres_spark.registry import REGISTRY, _load_all  # noqa: E402
from streamz_postgres_spark.session import get_spark  # noqa: E402

POWER_SEQUENCE = (
    ("q1", "q_flagship"),
    ("q2", "q_tpch_q2"),
    ("q3", "q_flagship_q3"),
    ("q4", "q_tpch_q4"),
    ("q5", "q_tpch_q5"),
    ("q6", "q_tpch_q6"),
    ("q7", "q_tpch_q7"),
    ("q8", "q_tpch_q8"),
    ("q9", "q_tpch_q9"),
    ("q10", "q_tpch_q10"),
    ("q11", "q_tpch_q11"),
    ("q12", "q_tpch_q12"),
    ("q13", "q_tpch_q13"),
    ("q14", "q_tpch_q14"),
    ("q15", "q_tpch_q15"),
    ("q16", "q_tpch_q16"),
    ("q17", "q_subquery_scalar"),
    ("q18", "q_tpch_q18"),
    ("q19", "q_tpch_q19"),
    ("q20", "q_tpch_q20"),
    ("q21", "q_tpch_q21"),
    ("q22", "q_tpch_q22"),
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    _load_all()
    spark = get_spark("tpch_power")
    spark.sparkContext.setLogLevel("ERROR")

    for _, key in POWER_SEQUENCE:  # warm-up: JIT, file listing, AQE stats
        REGISTRY[key].spark_fn(spark, args.sf).count()

    times: dict[str, list[float]] = {q: [] for q, _ in POWER_SEQUENCE}
    for _ in range(args.runs):
        for q, key in POWER_SEQUENCE:
            t0 = time.time()
            REGISTRY[key].spark_fn(spark, args.sf).count()
            times[q].append(time.time() - t0)

    med = {q: round(statistics.median(ts), 3) for q, ts in times.items()}
    print(
        json.dumps(
            {
                "metric": "tpch_power_total_sec",
                "value": round(sum(med.values()), 3),
                "unit": "sec",
                "queries": med,
                "sf_dir": args.sf,
            }
        )
    )


if __name__ == "__main__":
    main()
