"""Scale-curve harness (VERDICT r4 #4): wall time of the heavy
operators at sf0.01 / sf0.1 / sf0.1x10 (generate the latter with
scripts/gen_scale_data.py). Prints one JSON line per query with the
three medians and the growth ratios; results are recorded in
SCALE.md. A ~linear curve (ratio close to the 10x data ratio, modulo
fixed per-job overhead) is the pass condition — superlinear growth
means candidate-pair blowup or a plan that stopped broadcasting.

Usage: python scripts/scale_curve.py [keys...]
"""

from __future__ import annotations

import json
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from streamz_postgres_spark.registry import REGISTRY, _load_all  # noqa: E402
from streamz_postgres_spark.session import get_spark  # noqa: E402

POINTS = (
    ("sf0.01", "/root/testdata/sf0.01"),
    ("sf0.1", "/root/testdata/sf0.1"),
    ("sf0.1x10", "/tmp/spark_graft_scale/sf0.1x10"),
)

DEFAULT_KEYS = (
    "q_dedup_minhash",
    "q_dedup_clusters",
    "q_knn_graph",
    "q_corpus_pipeline",
    "q_stream_tumbling",
)

N_RUNS = 3


def main() -> None:
    import os

    # optional 4th grid point, e.g. SCALE_EXTRA=sf0.1x30=/tmp/.../sf0.1x30
    points = list(POINTS)
    extra = os.environ.get("SCALE_EXTRA")
    if extra:
        label, path = extra.split("=", 1)
        points.append((label, path))
    keys = sys.argv[1:] or list(DEFAULT_KEYS)
    _load_all()
    spark = get_spark("scale_curve")
    spark.sparkContext.setLogLevel("ERROR")
    for name in keys:
        fn = REGISTRY[name].spark_fn
        medians = {}
        for label, sf_dir in points:
            fn(spark, sf_dir).count()  # warm-up
            samples = []
            for _ in range(N_RUNS):
                t0 = time.perf_counter()
                n = fn(spark, sf_dir).count()
                samples.append(time.perf_counter() - t0)
            medians[label] = round(statistics.median(samples), 3)
            medians[f"{label}_rows"] = n
        r1 = medians["sf0.1"] / medians["sf0.01"]
        r10 = medians["sf0.1x10"] / medians["sf0.1"]
        print(
            json.dumps(
                {
                    "query": name,
                    **medians,
                    "ratio_0.01_to_0.1": round(r1, 2),
                    "ratio_0.1_to_x10": round(r10, 2),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
