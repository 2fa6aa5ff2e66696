"""Round-13 profiling harness: per-query wall time via the noop sink
plus stage-level attribution from the Spark REST API.

Usage:
  python scripts/profile_r13.py q_dedup_minhash [more keys...]
  python scripts/profile_r13.py --runs 3 q_flagship

For each key: two untimed warm-ups, then `--runs` timed executions of
``df.write.format("noop").mode("overwrite").save()`` (guide §1.4 —
times the computation, not the sink, and does not let count() prune
aggregates), labelled with setJobDescription so the REST stage dump
can attribute stages to queries. After the timed runs it prints the
stages of the LAST run sorted by executor run time, with shuffle
read/write bytes — the empirical loop of guide §1.1/§7.1 without the
UI (ui.enabled stays on here; the engine session default keeps it
off).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from streamz_postgres_spark.registry import REGISTRY, _load_all  # noqa: E402
from streamz_postgres_spark.session import get_spark  # noqa: E402


def _rest(spark, path: str):
    port = spark.sparkContext.uiWebUrl.rsplit(":", 1)[1]
    app_id = spark.sparkContext.applicationId
    url = f"http://localhost:{port}/api/v1/applications/{app_id}/{path}"
    with urllib.request.urlopen(url) as r:
        return json.load(r)


def profile(spark, key: str, sf_dir: str, runs: int) -> None:
    fn = REGISTRY[key].spark_fn
    sc = spark.sparkContext

    def run():
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    for _ in range(2):
        run()  # warm-up

    times = []
    for i in range(runs):
        sc.setJobDescription(f"{key}#timed{i}")
        # job-id bracket so we can attribute the last run's stages
        before_jobs = {j["jobId"] for j in _rest(spark, "jobs")}
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
        sc.setJobDescription(None)
    jobs = [
        j
        for j in _rest(spark, "jobs")
        if j["jobId"] not in before_jobs
        and (j.get("description") or "").startswith(f"{key}#timed{runs-1}")
    ]
    stage_ids = sorted({s for j in jobs for s in j["stageIds"]})
    stages = []
    for sid in stage_ids:
        try:
            for att in _rest(spark, f"stages/{sid}"):
                stages.append(att)
        except Exception:  # noqa: BLE001
            pass
    stages.sort(key=lambda s: -s.get("executorRunTime", 0))
    print(f"\n=== {key}: runs {[round(t, 3) for t in times]} "
          f"min={min(times):.3f}s  ({len(stages)} stages in last run) ===")
    for s in stages[:14]:
        print(
            f"  stage {s['stageId']:>5} {s['status']:>9} "
            f"run={s['executorRunTime']/1000:7.2f}s "
            f"cpu={s.get('executorCpuTime',0)/1e9:7.2f}s "
            f"tasks={s['numCompleteTasks']:>3} "
            f"in={s['inputBytes']/1e6:8.1f}MB "
            f"sr={s['shuffleReadBytes']/1e6:8.1f}MB "
            f"sw={s['shuffleWriteBytes']/1e6:8.1f}MB  "
            f"{s['name'].splitlines()[0][:70]}"
        )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("keys", nargs="+")
    args = ap.parse_args()
    _load_all()
    spark = get_spark("profile_r13", extra_conf={"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")
    for key in args.keys:
        profile(spark, key, args.sf, args.runs)


if __name__ == "__main__":
    main()
