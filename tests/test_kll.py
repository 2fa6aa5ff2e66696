"""Deterministic KLL sketch invariants (functions/kll.py).

The sketch's value proposition is the EXACT rank-error ledger: for
any insertion order and any merge tree, every quantile read-out must
sit within ``err`` ranks of its target against the exact multiset.
These tests drive the sketch pure-Python (no Spark) over adversarial
orders and merge splits; the streaming integration is covered by the
q_stream_kll_quantile oracle gate.
"""

from __future__ import annotations

import pytest

from streamz_postgres_spark.functions.kll import KLLSketch


def _realized_rank_dist(sorted_vals, est, target):
    lt = sum(1 for v in sorted_vals if v < est)
    le = sum(1 for v in sorted_vals if v <= est)
    return max(0, lt + 1 - target, target - le)


def _check_bound(vals, k, nsplits):
    chunks = [vals[i::nsplits] for i in range(nsplits)]
    sketches = []
    for ch in chunks:
        sk = KLLSketch(k)
        for v in ch:
            sk.add(v)
        sketches.append(sk)
    sk = sketches[0]
    for other in sketches[1:]:
        sk.merge(other)
    assert sk.n == len(vals)
    sv = sorted(vals)
    for q in (0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99):
        t = int((len(vals) - 1) * q) + 1
        dist = _realized_rank_dist(sv, sk.query(t), t)
        assert dist <= sk.err, (q, dist, sk.err)
    return sk


# duplicates + a non-monotone pattern, deterministic (no RNG)
_VALS = [float((i * 2654435761) % 997) / 7 for i in range(20000)]


@pytest.mark.parametrize(
    "order",
    ["asc", "desc", "interleaved"],
)
@pytest.mark.parametrize("nsplits", [1, 8])
def test_rank_error_within_ledger(order, nsplits):
    vals = {
        "asc": sorted(_VALS),
        "desc": sorted(_VALS, reverse=True),
        "interleaved": _VALS,
    }[order]
    _check_bound(vals, k=64, nsplits=nsplits)


def test_ledger_is_meaningfully_small():
    """The bound must be an actual guarantee, not vacuous: at k=256
    over 20k items the ledger stays under 3% of n (the accuracy
    class the round-6 verdict asked for vs the log2-histogram's
    bucket-relative error)."""
    sk = _check_bound(_VALS, k=256, nsplits=4)
    assert sk.err < 0.03 * sk.n


def test_exact_below_k():
    sk = KLLSketch(256)
    for v in range(100):
        sk.add(float(v))
    assert sk.err == 0
    assert sk.size() == 100
    # with zero compactions every read-out is the exact order stat
    for t in (1, 50, 100):
        assert sk.query(t) == float(t - 1)


def test_state_stays_logarithmic():
    sk = KLLSketch(64)
    for v in _VALS:
        sk.add(v)
    import math

    cap = 64 * (2 + math.ceil(math.log2(max(1.0, 2.0 * sk.n / 64))))
    assert sk.size() <= cap


def test_weight_conservation_and_extremes():
    sk = KLLSketch(32)
    for v in _VALS[:5000]:
        sk.add(v)
    # total weight must equal n exactly (odd buffers leave a
    # leftover item instead of dropping weight)
    total_w = sum(len(b) << lvl for lvl, b in enumerate(sk.levels))
    assert total_w == sk.n
    # extremes are rank-bounded, not preserved (compaction may drop
    # the exact min/max -- standard for compacting sketches)
    sv = sorted(_VALS[:5000])
    assert _realized_rank_dist(sv, sk.query(sk.n), sk.n) <= sk.err
    assert _realized_rank_dist(sv, sk.query(1), 1) <= sk.err


def test_json_roundtrip_is_exact():
    sk = KLLSketch(64)
    for v in _VALS[:3000]:
        sk.add(v)
    rt = KLLSketch.from_json(sk.to_json())
    assert rt.n == sk.n and rt.err == sk.err
    assert rt.levels == sk.levels and rt.parity == sk.parity
    for t in (1, 1500, 3000):
        assert rt.query(t) == sk.query(t)


def test_merge_matches_sequential_counts():
    a, b = KLLSketch(64), KLLSketch(64)
    for v in _VALS[:4000]:
        a.add(v)
    for v in _VALS[4000:8000]:
        b.add(v)
    a.merge(b)
    assert a.n == 8000
    # every level buffer below capacity after the merge's compactions
    assert all(len(buf) < 64 for buf in a.levels)


def test_merge_k_mismatch_rejected():
    with pytest.raises(ValueError):
        KLLSketch(64).merge(KLLSketch(128))
