"""Scale posture: the helpers and policies that make the operator
library hold up at 100 TB (SURVEY §7 M4).

Policies enforced across the library (see tests/test_scale_guards):
- scans are declarative -> pushdown + pruning always available;
- bounded dims broadcast; big-big joins shuffle on keys under AQE
  (skew-join splitting on);
- candidate generation for similarity/dedup is always a bucketed
  equi-join, never a cross join;
- ordered windows always partition by a key;
- no collect()/driver materialization inside operators;
- doubles aggregate through exact decimal accumulators, so results
  don't depend on partitioning — re-partitioning is always safe.

This module adds the two tools that need code:
- ``salted_join``: explicit skew mitigation for when AQE's runtime
  splitting isn't enough (e.g. one key is 30%% of a 100 TB fact);
- ``explain_summary``: compact plan audit used by the bench and the
  guard tests.
"""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    how: str = "inner",
    salt: int = 8,
) -> DataFrame:
    """Skew-mitigating equi join: split each hot left key into
    ``salt`` sub-keys and replicate the (small-ish) right side once
    per sub-key, so one giant key spreads over ``salt`` tasks.

    The left side gets a DETERMINISTIC salt (hash of the whole row,
    not rand(): retries/speculative tasks must re-produce the same
    salt or shuffle files disagree). The right side explodes a
    literal 0..salt-1 array. Result is value-identical to the plain
    join — q_join_salted's oracle proves it.

    Use when a key histogram shows heavy hitters; for moderate skew
    prefer AQE's skew-join splitting (on by default in session.py).

    Only left-preserving join types are valid: an unmatched RIGHT row
    would be emitted once per salt replica under right/full joins.
    """
    # normalize the same way Spark's JoinType does (case-insensitive,
    # underscores ignored) so every accepted alias passes the guard
    norm = how.lower().replace("_", "")
    if norm not in (
        "inner", "left", "leftouter", "leftsemi", "leftanti", "semi", "anti"
    ):
        raise ValueError(
            f"salted_join supports left-preserving joins only, got {how!r}: "
            "right/full would duplicate unmatched right rows per salt"
        )
    left_cols = left.columns
    salted_l = left.withColumn(
        "__salt",
        F.pmod(F.hash(*[F.col(c) for c in left_cols]), F.lit(salt)).cast("int"),
    )
    salted_r = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = salted_l.join(salted_r, [on, "__salt"], how)
    return out.drop("__salt")


def explain_summary(df: DataFrame) -> dict:
    """Compact audit of a physical plan: pushdown, pruning, join
    strategies, exchanges — the things to check before a query is
    allowed near a cluster."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    s = buf.getvalue()
    # formatted explain prints every node twice (tree + detail); count
    # only detail headers "(4) Exchange" so each shuffle counts once,
    # and ReusedExchange ("(n) ReusedExchange") doesn't match
    n_exchanges = len(re.findall(r"^\(\d+\) Exchange\b", s, re.M))
    # a window is single-partition iff ITS child exchange is
    # SinglePartition — "SinglePartition" anywhere in the plan also
    # fires on harmless global agg/limit stages
    sp_ids = {
        m.group(1)
        for m in re.finditer(r"^\((\d+)\) Exchange\b", s, re.M)
        if "SinglePartition" in s[m.end() : m.end() + 200]
    }
    # a Window's partitioning exchange sits somewhere below it in the
    # tree (often under a Sort): walk down from each Window to the
    # FIRST exchange and check that one
    tree = re.findall(r"^[ :+\-*]*([\w ]+?)\s*\((\d+)\)\s*$", s, re.M)
    sp_window = False
    for i, (name, _) in enumerate(tree):
        if name != "Window":
            continue
        for child, cid in tree[i + 1 :]:
            if child == "Exchange":
                sp_window = sp_window or cid in sp_ids
                break
    out = {
        "pushed_filters": re.findall(r"PushedFilters: \[[^\]]*\]", s),
        "read_schemas": re.findall(r"ReadSchema: [^\n]*", s),
        "joins": sorted(set(re.findall(
            r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin"
            r"|BroadcastNestedLoopJoin|CartesianProduct)", s))),
        "n_exchanges": n_exchanges,
        "has_cartesian": "CartesianProduct" in s,
        "single_partition_windows": sp_window,
    }
    # A localCheckpoint truncates lineage, so the audited plan stops
    # at ExistingRDD and the scan/join evidence below it would go
    # dark. Operators that checkpoint an intermediate stash the
    # pre-checkpoint frame(s) in ``_plan_audit_inner`` — merge their
    # summaries so pushdown/pruning/shuffle accounting still covers
    # the WHOLE computation.
    for inner in getattr(df, "_plan_audit_inner", ()) or ():
        isum = explain_summary(inner)
        out["pushed_filters"] += isum["pushed_filters"]
        out["read_schemas"] += isum["read_schemas"]
        out["joins"] = sorted(set(out["joins"]) | set(isum["joins"]))
        out["n_exchanges"] += isum["n_exchanges"]
        out["has_cartesian"] = out["has_cartesian"] or isum["has_cartesian"]
        out["single_partition_windows"] = (
            out["single_partition_windows"]
            or isum["single_partition_windows"]
        )
    return out
