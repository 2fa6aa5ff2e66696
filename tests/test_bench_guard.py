"""Regression tests for bench.py's contention sentinel guard
(round-6 verdict #6: the guard is load-bearing for the 2x
performance gate and had no test).

Real CPU load is flaky to generate in CI, so the tests drive
``time_query`` with a monkeypatched sentinel that replays a scripted
load profile and a fake registry entry whose runtime is known. What
must hold:

- a sample bracketed by a slow sentinel is DISCARDED and retried;
- the reported clean/contended counts account for every attempt;
- on a persistently loaded machine the attempt budget bounds wall
  time and the median falls back to the collected samples with a
  clean-count shortfall (which main() turns into load_flag=true).
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench


class _FakeDF:
    def __init__(self, seconds, clock):
        self._seconds = seconds
        self._clock = clock

    def count(self):
        self._clock[0] += self._seconds
        return 0


class _FakeQuery:
    def __init__(self, seconds, clock):
        self.spark_fn = lambda spark, sf_dir: _FakeDF(seconds, clock)


def _run(monkeypatch, sentinel_profile, query_sec=0.5, name="q_fake"):
    """Run bench.time_query against a scripted sentinel profile.

    ``sentinel_profile`` yields one multiplier per sentinel CALL
    (1.0 = quiet, >tolerance = contended); the fake clock makes
    perf_counter deterministic."""
    clock = [0.0]
    calls = iter(sentinel_profile)

    def fake_sentinel(spark):
        mult = next(calls, 1.0)
        return 0.1 * mult

    monkeypatch.setattr(bench, "_sentinel", fake_sentinel)
    monkeypatch.setattr(bench.time, "perf_counter", lambda: clock[0])
    monkeypatch.setitem(bench.REGISTRY, name, _FakeQuery(query_sec, clock))
    return bench.time_query(None, name, "/nowhere", sentinel_base=0.1)


def test_quiet_machine_all_samples_clean(monkeypatch):
    med, n_clean, n_cont = _run(monkeypatch, [1.0] * 100)
    assert n_clean == bench.N_RUNS
    assert n_cont == 0
    assert med == 0.5


def test_contended_samples_discarded_and_retried(monkeypatch):
    # first two samples bracketed by a hot sentinel (2x baseline >
    # tolerance 1.8), later samples quiet: both hot samples must be
    # discarded, the full clean set still collected, and the median
    # unpolluted. Profile: sentinel calls come in (before, UNCOUNTED
    # absorber, after) triples per sample since the r10 churn fix.
    profile = [2.0, 2.0] * 2 + [1.0] * 100
    med, n_clean, n_cont = _run(monkeypatch, profile)
    assert n_clean == bench.N_RUNS
    assert n_cont == 2
    assert med == 0.5


def test_one_hot_bracket_side_is_enough_to_discard(monkeypatch):
    # contention detected by EITHER bracketing sentinel (load can
    # start mid-sample): before=quiet, absorber=quiet, after=hot ->
    # discarded (the absorber run is UNCOUNTED by design — it exists
    # to soak post-query JVM cleanup, so it must not trip the guard)
    profile = [1.0, 1.0, 2.5] + [1.0] * 100
    _, n_clean, n_cont = _run(monkeypatch, profile)
    assert n_clean == bench.N_RUNS
    assert n_cont == 1


def test_persistent_load_bounds_attempts_and_flags(monkeypatch):
    # every sentinel hot: the attempt budget (n * MAX_ATTEMPTS_FACTOR)
    # must bound the loop, zero clean samples must be reported (the
    # shortfall main() turns into load_flag=true), and the median
    # must still be computed from the contended fallback samples.
    budget = bench.N_RUNS * bench.MAX_ATTEMPTS_FACTOR
    profile = [5.0] * (3 * budget + 10)  # 3 sentinel calls/sample
    med, n_clean, n_cont = _run(monkeypatch, profile)
    assert n_clean == 0
    assert n_cont == budget
    assert med == 0.5  # fallback median over contended samples
    # this is exactly the condition main() flags
    assert n_clean < bench.N_RUNS


def test_borderline_sentinel_within_tolerance_is_clean(monkeypatch):
    # 1.8x exactly == limit -> clean (<=, not <)
    profile = [bench.SENTINEL_TOLERANCE] * 2 + [1.0] * 100
    _, n_clean, n_cont = _run(monkeypatch, profile)
    assert n_clean == bench.N_RUNS
    assert n_cont == 0


def test_extra_runs_respected_for_high_variance_queries(monkeypatch):
    assert bench.EXTRA_RUNS, "bench no longer defines EXTRA_RUNS"
    name, n_extra = next(iter(bench.EXTRA_RUNS.items()))
    _, n_clean, _ = _run(monkeypatch, [1.0] * 100, name=name)
    assert n_clean == n_extra
