"""Headline benchmark: runs the engine's flagship queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

  {"metric": "headline_total_sec", "value": <sum of per-query
   medians>, "unit": "sec", "queries": {name: sec, ...}, "sf": ...,
   "load": {...}, "heavy_tail": {...}}

r14 additions (PERF_r13 scaling contract; the headline
metric/value stay byte-compatible): top-level "cpus" (the
$SPARK_GRAFT_CPUS value) and "parallelism"
(sparkContext.defaultParallelism) prove the core count took
effect; a COMPUTE-bound "scaling_probe" (fixed total md5 work,
see _scaling_probe) is timed with the same sentinel discipline
and reported inside "queries" (an added entry, allowed by the
contract) and in a "scaling" object — its 8-vs-32-core wall
ratio resolves where the sub-second sf0.1 headline keys are
scheduling-bound and cannot. "value" remains the sum over the
original HEADLINE set only (the probe is excluded).

The trailing "heavy_tail" object (r10) is a NON-GATING second
section over the registry's wall-clock tail — the five heaviest
keys, where a plan regression would actually show (the headline set
is all sub-2 s and tracks machine noise more than engine cost).
Same sentinel bracketing, 3 samples each; informational in
BASELINE.md, never judged against the 2x gate; SPARK_GRAFT_HEAVY=0
disables it. The headline metric/value/load_flag are byte-compatible
with pre-r10 consumers.

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

CONTENTION GUARD (round-6, after the BENCH_r05 incident): the r5
recorded artifact showed q_join_multiway at 5.0x baseline while a
quiet back-to-back rerun of the identical code measured 0.69x —
machine load during the driver's adjacent correctness sweep, not a
plan change. Evidence that swings 2x with load cannot gate a 2x
threshold, so every timed sample is now bracketed by a fixed-cost
SENTINEL kernel (a pure in-memory codegen aggregation over
spark.range — no I/O, no Python workers, deterministic work). The
sentinel is calibrated at session start (median of 9 runs after its
own warm-up); a sample whose bracketing sentinels exceed
SENTINEL_TOLERANCE x the calibration is discarded as contended and
re-run (up to MAX_ATTEMPTS per needed sample). The JSON gains a
"load" object: sentinel baseline, per-query clean/contended sample
counts, and a top-level load_flag that is true iff any query could
not collect a full set of clean samples — a bench consumer must not
treat a load_flag=true artifact as evidence of a plan regression.
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

#: NON-GATING second section (r9 verdict Next-round #6): the
#: headline set is all sub-2 s at sf0.1 and tracks machine noise
#: more than engine cost; these are the registry's measured
#: wall-clock tail (3.4-8.6 s steady-state at sf0.1), where a plan
#: regression would actually show. Same sentinel bracketing; 3
#: samples each (cost ~2 min total); recorded in BASELINE.md as
#: informational, never against the 2x gate. Disable with
#: SPARK_GRAFT_HEAVY=0.
HEAVY_TAIL = (
    "q_sim_ann_ivfpq",
    "q_doc_perplexity_kn",
    "q_dedup_minhash_clusters",
    "q_bloom_filter_audit",
    "q_dedup_substring_clusters",
)
N_RUNS_HEAVY = 3

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

#: sentinel bracket: a sample is "clean" when both bracketing
#: sentinel runs finish within this factor of the calibrated
#: baseline. 1.8 leaves headroom for JVM GC jitter on a quiet
#: machine (observed quiet spread ~1.3x) while catching the >2x
#: inflation that CPU contention produces.
SENTINEL_TOLERANCE = 1.8
#: total attempts allowed per needed clean sample before giving up
#: and accepting contended samples (keeps worst-case wall bounded:
#: a fully-loaded machine costs ~3x the quiet bench, not forever).
MAX_ATTEMPTS_FACTOR = 3


#: r14 (PERF_r13 scaling contract): the sentinel and the sub-second
#: sf0.1 headline keys are scheduling-bound, so the driver's 8-core
#: vs 32-core comparison could not resolve (every ratio ~= 1,
#: `suspect_cpus_ignored` raised even though session.py honors
#: $SPARK_GRAFT_CPUS). This probe is COMPUTE-bound: a fixed total of
#: per-row JVM work (md5 over the stringified id, crc32-reduced to
#: one long) split over 2x defaultParallelism partitions, so its
#: wall time scales ~1/cores and the core ratio is visible. It is
#: reported as "scaling_probe" inside "queries" (an ADDED entry per
#: the bench contract) and in the "scaling" object, but is EXCLUDED
#: from the headline "value", which remains the sum over HEADLINE —
#: byte-compatible with rounds 1-13.
PROBE_ROWS = 32_000_000


def _scaling_probe(spark) -> None:
    p = spark.sparkContext.defaultParallelism
    spark.range(0, PROBE_ROWS, 1, 2 * p).selectExpr(
        "sum(crc32(md5(cast(id as string)))) as s"
    ).collect()


def _sentinel(spark) -> float:
    """Fixed-cost pure-compute kernel: 16M-row codegen sum over an
    in-memory range, 32 partitions. No I/O, no shuffle beyond the
    final single-row reduce, no Python workers — its runtime moves
    only with available CPU, so it measures machine load, not the
    engine."""
    t0 = time.perf_counter()
    spark.range(0, 16_000_000, 1, 32).selectExpr(
        "sum(id * 2 + 1) as s"
    ).collect()
    return time.perf_counter() - t0


def _calibrate_sentinel(spark) -> float:
    for _ in range(3):  # sentinel has its own JIT ramp
        _sentinel(spark)
    return statistics.median(_sentinel(spark) for _ in range(9))


def time_query(
    spark, name: str, sf_dir: str, sentinel_base: float, n_runs: int = 0
) -> tuple[float, int, int]:
    """Return (median_sec, clean_samples, contended_samples_discarded).

    Collects `n` sentinel-clean samples; a sample bracketed by a slow
    sentinel is discarded and retried. If the attempt budget runs out
    (machine persistently loaded), the median falls back to all
    collected samples and the shortfall shows up in the clean count.
    """
    fn = REGISTRY[name].spark_fn
    fn(spark, sf_dir).count()  # warm-up
    n = n_runs or EXTRA_RUNS.get(name, N_RUNS)
    return _timed_samples(
        spark, lambda: fn(spark, sf_dir).count(), sentinel_base, n
    )


def _timed_samples(
    spark, action, sentinel_base: float, n: int
) -> tuple[float, int, int]:
    """Sentinel-bracketed sampling loop shared by the registry
    queries and the r14 scaling probe (methodology unchanged — this
    is the exact body time_query had since r10)."""
    limit = sentinel_base * SENTINEL_TOLERANCE
    clean: list[float] = []
    contended: list[float] = []
    attempts = 0
    while len(clean) < n and attempts < n * MAX_ATTEMPTS_FACTOR:
        attempts += 1
        s_before = _sentinel(spark)
        t0 = time.perf_counter()
        action()
        elapsed = time.perf_counter() - t0
        # one UNCOUNTED sentinel absorbs post-query JVM churn
        # (ContextCleaner broadcast/shuffle cleanup after the heavy
        # persisted queries reads as a slow bracket and discarded
        # every sample of q_sim_ann_ivfpq in the first heavy_tail
        # run); the counted after-bracket then measures machine
        # load, which is what the guard is for
        _sentinel(spark)
        s_after = _sentinel(spark)
        if max(s_before, s_after) <= limit:
            clean.append(elapsed)
        else:
            contended.append(elapsed)
    samples = clean if len(clean) >= 3 else sorted(clean + contended)
    return statistics.median(samples), len(clean), len(contended)


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

    sentinel_base = _calibrate_sentinel(spark)

    per_query: dict[str, float] = {}
    clean_counts: dict[str, int] = {}
    discarded: dict[str, int] = {}
    for name in HEADLINE:
        med, n_clean, n_cont = time_query(spark, name, sf_dir, sentinel_base)
        per_query[name] = round(med, 3)
        clean_counts[name] = n_clean
        if n_cont:
            discarded[name] = n_cont

    load_flag = any(
        clean_counts[name] < EXTRA_RUNS.get(name, N_RUNS) for name in HEADLINE
    )
    # headline "value" = sum over HEADLINE only — byte-compatible
    # with rounds 1-13 (computed BEFORE the probe entry is added)
    headline_total = round(sum(per_query.values()), 3)

    # r14 scaling probe (see _scaling_probe): timed with the same
    # sentinel discipline, reported as an ADDED queries entry plus a
    # "scaling" object carrying the effective parallelism, so the
    # driver's low-core run can verify cores took effect.
    _scaling_probe(spark)  # JIT warm-up, untimed
    probe_med, probe_clean, probe_cont = _timed_samples(
        spark, lambda: _scaling_probe(spark), sentinel_base, N_RUNS_HEAVY
    )
    per_query["scaling_probe"] = round(probe_med, 3)
    clean_counts["scaling_probe"] = probe_clean
    if probe_cont:
        discarded["scaling_probe"] = probe_cont

    out = {
        "metric": "headline_total_sec",
        "value": headline_total,
        "unit": "sec",
        "queries": per_query,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "cpus": os.environ.get("SPARK_GRAFT_CPUS"),
        "parallelism": spark.sparkContext.defaultParallelism,
        "scaling": {
            "probe_sec": round(probe_med, 3),
            "probe_rows": PROBE_ROWS,
            "probe_partitions": 2 * spark.sparkContext.defaultParallelism,
            "probe_clean_samples": probe_clean,
        },
        "load": {
            "sentinel_baseline_sec": round(sentinel_base, 4),
            "sentinel_tolerance": SENTINEL_TOLERANCE,
            "clean_samples": clean_counts,
            "contended_discarded": discarded,
            "load_flag": load_flag,
        },
    }

    # non-gating heavy-tail section (module constant's rationale);
    # headline totals/load_flag above are unchanged by it
    if os.environ.get("SPARK_GRAFT_HEAVY", "1") != "0":
        heavy_q: dict[str, float] = {}
        heavy_clean: dict[str, int] = {}
        heavy_disc: dict[str, int] = {}
        heavy_err: dict[str, str] = {}
        for name in HEAVY_TAIL:
            # a failure in the informational section must never
            # destroy the gating headline JSON that is already
            # computed (r10 review find) — record and continue
            try:
                med, n_clean, n_cont = time_query(
                    spark, name, sf_dir, sentinel_base, n_runs=N_RUNS_HEAVY
                )
            except Exception as e:  # noqa: BLE001
                heavy_err[name] = f"{type(e).__name__}: {e}"[:200]
                continue
            heavy_q[name] = round(med, 3)
            heavy_clean[name] = n_clean
            if n_cont:
                heavy_disc[name] = n_cont
        out["heavy_tail"] = {
            # a partial total is not comparable round-over-round (a
            # failed key would read as a speedup) — null it when any
            # key errored so consumers can't mistake it for complete
            # (r10 advisor)
            "total_sec": (
                round(sum(heavy_q.values()), 3) if not heavy_err else None
            ),
            "queries": heavy_q,
            "clean_samples": heavy_clean,
            "contended_discarded": heavy_disc,
            "errors": heavy_err,
            "load_flag": any(
                heavy_clean.get(n, 0) < N_RUNS_HEAVY for n in HEAVY_TAIL
            ),
        }

    print(json.dumps(out))


if __name__ == "__main__":
    main()
