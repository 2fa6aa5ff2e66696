"""Deterministic KLL/MRL-style quantile sketch with an exact
rank-error ledger.

The classic KLL sketch (Karnin-Lang-Liberty 2016) compacts a full
level buffer by sorting it and keeping every other item at doubled
weight, choosing the starting parity by a coin flip. This
implementation replaces the coin with a deterministic per-level
alternating parity (the Manku-Rajagopalan-Lindsay deterministic
lineage), which trades the randomized sqrt-error guarantee for a
WORST-CASE one that is itself computable at run time:

    a compaction at level l (item weight 2^l) shifts any rank
    estimate by at most 2^l, so after C_l compactions at each level
    the total rank error of every quantile read-out is bounded by

        err = sum_l C_l * 2^l

and the sketch simply MAINTAINS that integer ledger as it runs.
This makes the sketch self-calibrating: a consumer can assert
|realized rank - target rank| <= err against exact order statistics,
and the assertion is deterministic — no distributional argument, no
failure probability — which is what lets the oracle gate VALUE-check
the bound (see q_stream_kll_quantile).

Space: the level buffers hold at most k items each across
O(log2(n/k)) levels — O(k log(n/k)) values of state per key,
vs O(n) for the exact multiset. Merge is lossless concatenation
followed by the same compaction rule, and the ledger adds, so
partial sketches from different partitions/batches combine exactly
like any mergeable aggregate.

Determinism note: the SKETCH CONTENTS depend on insertion order (as
every compacting sketch's do), so the estimate itself is not a
cross-engine value-checkable output; the calibration read-out
(exact quantiles + in-bound flags + the ledger-vs-realized check)
is, and that is what the registered query exposes.
"""

from __future__ import annotations

import json

DEFAULT_K = 256


class KLLSketch:
    """Deterministic compacting quantile sketch over doubles.

    ``k`` is the per-level buffer capacity (compaction trigger);
    ``err`` is the exact worst-case rank-error ledger described in
    the module docstring.
    """

    __slots__ = ("k", "levels", "parity", "n", "err")

    def __init__(self, k: int = DEFAULT_K):
        if k < 4:
            raise ValueError("k must be >= 4")
        self.k = int(k)
        self.levels: list[list[float]] = [[]]
        self.parity: list[int] = [0]
        self.n = 0
        self.err = 0

    # -- updates ------------------------------------------------------------

    def add(self, v: float) -> None:
        self.levels[0].append(float(v))
        self.n += 1
        if len(self.levels[0]) >= self.k:
            self._compact(0)

    def merge(self, other: "KLLSketch") -> "KLLSketch":
        if other.k != self.k:
            raise ValueError("cannot merge sketches with different k")
        for lvl, buf in enumerate(other.levels):
            while lvl >= len(self.levels):
                self.levels.append([])
                self.parity.append(0)
            self.levels[lvl].extend(buf)
        self.n += other.n
        self.err += other.err
        for lvl in range(len(self.levels)):
            if len(self.levels[lvl]) >= self.k:
                self._compact(lvl)
        return self

    def _compact(self, lvl: int) -> None:
        """Sort level ``lvl``, promote every other item (alternating
        start parity) at doubled weight, leave at most one leftover
        item in place so total weight is conserved exactly."""
        buf = sorted(self.levels[lvl])
        m_even = len(buf) - (len(buf) & 1)
        take = buf[self.parity[lvl] : m_even : 2]
        self.parity[lvl] ^= 1
        self.err += 1 << lvl
        self.levels[lvl] = buf[m_even:]  # 0 or 1 leftover item
        if lvl + 1 == len(self.levels):
            self.levels.append([])
            self.parity.append(0)
        self.levels[lvl + 1].extend(take)
        if len(self.levels[lvl + 1]) >= self.k:
            self._compact(lvl + 1)

    # -- reads --------------------------------------------------------------

    def query(self, rank: int) -> float | None:
        """Smallest retained value whose cumulative weight reaches
        ``rank`` (1-based). Total weight equals n exactly (weight is
        conserved by compaction), so rank=n returns the max."""
        items = sorted(
            (v, 1 << lvl)
            for lvl, buf in enumerate(self.levels)
            for v in buf
        )
        if not items:
            return None
        cum = 0
        for v, w in items:
            cum += w
            if cum >= rank:
                return v
        return items[-1][0]

    def size(self) -> int:
        """Number of retained items (the state footprint)."""
        return sum(len(b) for b in self.levels)

    # -- state (de)serialization --------------------------------------------

    def to_json(self) -> str:
        # json round-trips Python floats exactly (repr-based), so
        # serialize/deserialize never perturbs a retained value
        return json.dumps(
            {
                "k": self.k,
                "levels": self.levels,
                "parity": self.parity,
                "n": self.n,
                "err": self.err,
            }
        )

    @classmethod
    def from_json(cls, blob: str) -> "KLLSketch":
        d = json.loads(blob)
        sk = cls(d["k"])
        sk.levels = [list(map(float, b)) for b in d["levels"]]
        sk.parity = list(d["parity"])
        sk.n = int(d["n"])
        sk.err = int(d["err"])
        return sk


def calibrated_readout(latest, events):
    """Shared self-calibration read-out for the KLL queries (batch
    q_kll_quantile and streaming q_stream_kll_quantile).

    ``latest``: one row per event_type with the sketch's final
    (n_events, p50_est, p90_est, err_bound, state_items).
    ``events``: the batch events frame the sketch consumed.

    Emits only cross-engine-deterministic columns: the exact
    integer-index order statistics (value-checked against the
    oracle) and flags asserting the sketch's realized rank error
    sits within its ledger and its state within the
    k*(2+ceil(log2(2n/k))) cap — a sketch bug flips a flag and
    fails the hash gate (the q_kmv_distinct calibration pattern).
    The O(n) exact side exists only to AUDIT the sketch (the
    q_ann_recall shape); production consumers read the sketch alone.
    """
    from pyspark.sql import functions as F

    exact = events.groupBy("event_type").agg(
        # count NON-NULL values: collect_list already drops NULLs, so
        # a COUNT(*) would desynchronize the index arithmetic from
        # vals whenever the column is nullable (r12 hostile sweep)
        F.count("value").alias("n_exact"),
        F.sort_array(F.collect_list("value")).alias("vals"),
    ).withColumnRenamed("event_type", "_et")
    # eqNullSafe: a NULL event_type is a legitimate GROUP BY group on
    # both sides, and a plain equi-join would silently drop it (the
    # q_hll_partial class; hostile-sweep v5 find)
    j = latest.join(
        exact, latest["event_type"].eqNullSafe(exact["_et"])
    ).drop("_et")

    def in_bound(est_col: str, target_expr: str):
        lt = F.expr(f"size(filter(vals, v -> v < {est_col}))").cast("bigint")
        le = F.expr(f"size(filter(vals, v -> v <= {est_col}))").cast("bigint")
        t = F.expr(target_expr).cast("bigint")
        dist = F.greatest(lt + 1 - t, t - le, F.lit(0).cast("bigint"))
        return (dist <= F.col("err_bound")).cast("int")

    state_cap = F.expr(
        f"CAST({DEFAULT_K} * (2 + ceil(log2(greatest(2.0 * n_events / "
        f"{DEFAULT_K}, 1.0)))) AS BIGINT)"
    )
    return j.select(
        "event_type",
        F.col("n_exact").cast("bigint").alias("n_events"),
        # try_element_at: an ALL-NULL group has n_exact = 0 and an
        # empty vals array — ANSI element_at(empty, 1) throws where
        # DuckDB's vals[1] is NULL (same class as the v2 zero-divisor
        # finds; latent until a fixture ships an all-NULL group)
        F.expr(
            "try_element_at(vals, CAST((n_exact - 1) DIV 2 AS INT) + 1)"
        ).alias("p50_exact"),
        F.expr(
            "try_element_at(vals, CAST(((n_exact - 1) * 9) DIV 10 AS INT) + 1)"
        ).alias("p90_exact"),
        in_bound("p50_est", "(n_events - 1) DIV 2 + 1").alias("p50_in_bound"),
        in_bound("p90_est", "((n_events - 1) * 9) DIV 10 + 1").alias(
            "p90_in_bound"
        ),
        (F.col("state_items") <= state_cap).cast("int").alias("state_bounded"),
    )


KLL_ORACLE_SQL = """
WITH s AS (
  -- COUNT(value) + FILTER: quantiles are over the NON-NULL values
  -- (DuckDB's list() keeps NULLs, Spark's collect_list drops them —
  -- the FILTER pins both sides to the SQL-aggregate convention;
  -- hostile-fixture sweep find, r12)
  SELECT event_type,
         list(value ORDER BY value) FILTER (value IS NOT NULL) AS vals,
         CAST(COUNT(value) AS BIGINT) AS n_events
  FROM events
  GROUP BY event_type
)
SELECT event_type, n_events,
       vals[CAST((n_events - 1) // 2 AS BIGINT) + 1] AS p50_exact,
       vals[CAST(((n_events - 1) * 9) // 10 AS BIGINT) + 1] AS p90_exact,
       CAST(1 AS INTEGER) AS p50_in_bound,
       CAST(1 AS INTEGER) AS p90_in_bound,
       CAST(1 AS INTEGER) AS state_bounded
FROM s
"""
