"""Semantic property tests for the hash-deterministic sampling ops.

The oracle gate proves these queries are cross-engine DETERMINISTIC
(Spark and DuckDB mirror the same salted-md5 expressions), but that
is engine parity, not semantics — it would pass even if the "80/10/10
split" were really 60/20/20. These tests check the statistics the
operators claim:

- q_train_split: realized split fractions are binomially consistent
  with 80/10/10 (scheme-level at n=20k synthetic keys, tight bounds;
  registered query on the real documents table, looser bounds).
- q_domain_mix: realized keep-rate per rate bucket matches the target
  rate (same two levels).
- q_weighted_sample: inclusion frequency under the Efraimidis-
  Spirakis priority is strongly monotone in weight across many salts.

All statistical bounds are ±5 binomial sigma — over repeated CI runs
a correct implementation fails with probability < 1e-5 per assert,
while an off-by-a-bucket or non-uniform-hash bug lands tens of sigma
out.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from streamz_postgres_spark.functions.numeric import qround
from streamz_postgres_spark.functions.text_features import hash60
from streamz_postgres_spark.operators.pipeline import (
    _H60_RANGE,
    _MIX_DEFAULT,
    _MIX_RATES,
    _MIX_SALT,
    _SPLIT_SALT,
    _TRAIN_PCT,
    _VAL_PCT,
)
from streamz_postgres_spark.registry import REGISTRY, _load_all

SF01 = "/root/testdata/sf0.01"
_N = 20_000  # synthetic keys for scheme-level checks


def _sigma(p: float, n: int) -> float:
    return (p * (1 - p) / n) ** 0.5


def _keys(spark, n):
    return spark.range(n).select(F.col("id").cast("string").alias("key"))


def test_train_split_scheme_fractions(spark):
    h = hash60(F.concat(F.col("key"), F.lit(_SPLIT_SALT))) % 100
    split = (
        F.when(h < _TRAIN_PCT, "train")
        .when(h < _TRAIN_PCT + _VAL_PCT, "val")
        .otherwise("test")
    )
    got = {
        r["s"]: r["n"]
        for r in _keys(spark, _N)
        .select(split.alias("s"))
        .groupBy("s")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert sum(got.values()) == _N
    for name, pct in (("train", _TRAIN_PCT), ("val", _VAL_PCT), (
            "test", 100 - _TRAIN_PCT - _VAL_PCT)):
        p = pct / 100
        assert abs(got.get(name, 0) / _N - p) < 5 * _sigma(p, _N), (
            name, got)


def test_train_split_registered_fractions(spark):
    _load_all()
    rows = REGISTRY["q_train_split"].spark_fn(spark, SF01).collect()
    n = len(rows)
    assert n > 0
    counts: dict[str, int] = {}
    for r in rows:
        counts[r.split] = counts.get(r.split, 0) + 1
    for name, pct in (("train", _TRAIN_PCT), ("val", _VAL_PCT), (
            "test", 100 - _TRAIN_PCT - _VAL_PCT)):
        p = pct / 100
        assert abs(counts.get(name, 0) / n - p) < 5 * _sigma(p, n), (
            name, counts, n)


def test_domain_mix_scheme_keep_rates(spark):
    h = hash60(F.concat(F.col("key"), F.lit(_MIX_SALT))) % 100
    rates = sorted(set(_MIX_RATES.values()) | {_MIX_DEFAULT})
    aggs = [
        F.sum((h < r).cast("int")).alias(f"kept_{r}") for r in rates
    ]
    row = _keys(spark, _N).agg(*aggs).collect()[0]
    for r in rates:
        p = r / 100
        assert abs(row[f"kept_{r}"] / _N - p) < 5 * _sigma(p, _N), (r, row)


def test_domain_mix_registered_keep_rates(spark):
    _load_all()
    rows = REGISTRY["q_domain_mix"].spark_fn(spark, SF01).collect()
    assert rows
    for r in rows:
        p = _MIX_RATES.get(r.lang, _MIX_DEFAULT) / 100
        assert r.n_docs > 0
        assert abs(r.n_kept / r.n_docs - p) < 5 * _sigma(p, r.n_docs), (
            r.lang, r.n_kept, r.n_docs, p)


@pytest.mark.slow
def test_weighted_sample_inclusion_monotone_in_weight(spark):
    """Efraimidis-Spirakis top-k with 10x-heavier docs: across 12
    independent salts, heavy docs must dominate inclusions. With 150
    heavy (w=1000) vs 150 light (w=100) and k=50, expected heavy
    share is >90%; a scheme that ignored weight would split 50/50
    (tens of sigma away from the 3x margin asserted)."""
    k = 50
    base = spark.createDataFrame(
        [(str(i), 1000 if i < 150 else 100) for i in range(300)],
        "key string, w int",
    )
    heavy = light = 0
    for j in range(12):
        u = (hash60(F.concat(F.col("key"), F.lit(f"#wtest{j}"))) + 1) / F.lit(
            _H60_RANGE
        )
        pr = qround(F.log(u) / F.col("w"), 9)
        top = (
            base.select("key", "w", pr.alias("p"))
            .orderBy(F.col("p").desc(), "key")
            .limit(k)
            .collect()
        )
        assert len(top) == k
        heavy += sum(1 for r in top if r.w == 1000)
        light += sum(1 for r in top if r.w == 100)
    assert heavy + light == 12 * k
    assert heavy > 3 * light, (heavy, light)
