"""Headline benchmark: runs the engine's flagship queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

  {"metric": "headline_total_sec", "value": <sum of per-query
   medians>, "unit": "sec", "queries": {name: sec, ...}, "sf": ...}

Methodology: a session-wide warm-up pass (every headline query
executed twice, untimed) before any timing, then one per-query
warm-up + median of 5 timed runs of a full execute-and-drain
(count-collect) so scan->shuffle->agg all happen; results never
land on the driver beyond the count.

Why the global pass (round-5 drift audit): single-query probes show
a long JIT ramp early in the session — q_flagship_q3 decays 1.22s ->
0.79s and q_multimodal 1.00s -> 0.43s over their first ~10
executions (whole-stage codegen compilation, Arrow eval paths, the
Python worker pool), after which timings are stable. With only a
per-query warm-up, queries that run EARLY in the bench are timed
mid-ramp, and where on the ramp the median lands varies with machine
state — that, not any plan change, produced the r4 'regressions' of
q_multimodal (0.386 -> 0.643 with no code change) and q_flagship_q3.
Steady state is the right target: at production scale one-time JIT
cost amortizes to nothing.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from streamz_postgres_spark.registry import REGISTRY, _load_all  # noqa: E402
from streamz_postgres_spark.session import get_spark  # noqa: E402

HEADLINE = (
    "q_flagship",
    "q_flagship_q3",
    "q_join_multiway",
    "q_group_agg",
    "q_window_rank",
    "q_sim_cosine",
    "q_dedup_minhash",
    "q_text_tfidf",
    "q_text_langid",
    "q_multimodal",
)

#: round-4 drift audit: two identical back-to-back bench processes
#: differed ~5% total and up to 25% per query with zero code change
#: (7.488 vs 7.899 s; r3's 8.194 on r2's code was the same effect) —
#: machine noise, not plan regressions. Median of 5 instead of 3
#: halves the chance a noisy pair swings the median for every query.
N_RUNS = 5
#: extra samples for queries with documented high run-to-run variance
#: (q_dedup_minhash swings >2x under background load; a wider median
#: keeps one bad sample from looking like a plan regression)
EXTRA_RUNS = {"q_dedup_minhash": 7}


def time_query(spark, name: str, sf_dir: str) -> float:
    fn = REGISTRY[name].spark_fn
    fn(spark, sf_dir).count()  # warm-up
    samples = []
    for _ in range(EXTRA_RUNS.get(name, N_RUNS)):
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        samples.append(time.perf_counter() - t0)
    return statistics.median(samples)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    _load_all()
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # session-wide warm-up: two untimed passes over every query so
    # JIT/codegen/worker-pool ramp is paid before any timing starts
    # (see module docstring)
    for _ in range(2):
        for name in HEADLINE:
            REGISTRY[name].spark_fn(spark, sf_dir).count()

    per_query: dict[str, float] = {}
    for name in HEADLINE:
        per_query[name] = round(time_query(spark, name, sf_dir), 3)

    out = {
        "metric": "headline_total_sec",
        "value": round(sum(per_query.values()), 3),
        "unit": "sec",
        "queries": per_query,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
