"""Semantic invariants for the round-8 third-session additions —
properties the DuckDB oracle canNOT establish because both engines
could share the same mistake: t-closeness EMD against closed-form
values on a crafted table, the Bloom filter's zero-false-negative
guarantee, the matryoshka panel staying pinned across scale factors,
streaming-vs-batch vocabulary closure, and window exactness at the
partition boundary.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from streamz_postgres_spark.registry import REGISTRY, _load_all
from tests.conftest import SF_DIR

_load_all()

pytestmark = pytest.mark.slow


def test_t_closeness_matches_closed_form(spark, tmp_path):
    """Crafted customer table with a known EMD: global sensitive
    distribution uniform over two buckets (acctbal 500 and 1500);
    the skewed QI class holds bucket 0 only -> EMD = 0.5 (violates
    t=1/5); the balanced class mirrors the global -> EMD = 0."""
    rows = []
    # class A (nation 1): 4 customers, all bucket 0 -> skewed
    for i in range(4):
        rows.append((1, "SEG", 500.0, i))
    # class B (nation 2): 4 customers, 2 per bucket -> balanced...
    # but the GLOBAL distribution must also be uniform: A contributes
    # 4 to bucket 0, so B carries 0 in bucket 0 and 4 in bucket 1,
    # making the global split 4/4 and B itself fully skewed the
    # other way (EMD 0.5 as well). Add classes C and D mirroring the
    # global exactly instead.
    for i in range(4):
        rows.append((2, "SEG", 1500.0, 10 + i))
    # classes C, D: 2 + 2 across both buckets -> EMD = 0
    for nk in (3, 4):
        rows.append((nk, "SEG", 500.0, 100 + nk * 10))
        rows.append((nk, "SEG", 500.0, 101 + nk * 10))
        rows.append((nk, "SEG", 1500.0, 102 + nk * 10))
        rows.append((nk, "SEG", 1500.0, 103 + nk * 10))
    df = spark.createDataFrame(
        rows, "c_nationkey int, c_mktsegment string, c_acctbal double, c_custkey long"
    )
    df.write.parquet(str(tmp_path / "customer.parquet"))
    out = {
        (r["c_nationkey"], r["c_mktsegment"]): r
        for r in REGISTRY["q_t_closeness"].spark_fn(spark, str(tmp_path)).collect()
    }
    # global: 8 in bucket 0, 8 in bucket 1 (16 total), m = 2
    # class A: P=(1,0) vs Q=(.5,.5): EMD = |1-.5| / (2-1) = 0.5
    assert out[(1, "SEG")]["emd"] == 0.5
    assert out[(1, "SEG")]["violates_t"] == 1
    assert out[(2, "SEG")]["emd"] == 0.5
    # classes C/D mirror the global exactly -> EMD 0, no violation
    assert out[(3, "SEG")]["emd"] == 0.0
    assert out[(3, "SEG")]["violates_t"] == 0
    assert out[(4, "SEG")]["emd"] == 0.0


def test_bloom_audit_has_zero_false_negatives(spark):
    """A Bloom filter may lie positive, NEVER negative: every true
    member must hit, i.e. members-that-hit (= n_hits - n_false_pos)
    must equal n_members exactly."""
    row = REGISTRY["q_bloom_filter_audit"].spark_fn(spark, SF_DIR).collect()[0]
    assert row["n_hits"] - row["n_false_pos"] == row["n_members"]
    assert 0 < row["n_bits_set"] <= 4096
    # the filter must actually reject most non-members at this fill
    assert row["n_hits"] < row["n_probes"]


def test_matryoshka_panel_is_pinned_and_full_dim_agrees(spark):
    """The calibration panel must NOT grow with the corpus (the 10x
    curve regression), and the full-dimension row agrees with itself
    by construction."""
    for sf_dir in (SF_DIR, SF_DIR.replace("sf0.01", "sf0.1")):
        rows = {
            r["k"]: r
            for r in REGISTRY["q_embed_matryoshka"].spark_fn(spark, sf_dir).collect()
        }
        assert rows[64]["n_queries"] == 20  # pinned panel
        assert rows[64]["agree_rate"] == 1.0
        assert rows[8]["n_queries"] == 20


def test_stream_vocab_novelty_closes_to_batch_vocab(spark):
    """Streaming-vs-batch closure: per source, the stream's total
    new-type count must equal the batch vocabulary size (every type
    is new exactly once), and per-doc novelty never exceeds the
    doc's type count."""
    stream = REGISTRY["q_stream_vocab_novelty"].spark_fn(spark, SF_DIR)
    per_source = {
        r["source"]: r["s"]
        for r in stream.groupBy("source")
        .agg(F.sum("n_new_types").alias("s"))
        .collect()
    }
    batch = {
        r["source"]: r["types_total"]
        for r in REGISTRY["q_vocab_growth"].spark_fn(spark, SF_DIR).collect()
    }
    assert per_source == batch
    bad = stream.filter(F.col("n_new_types") > F.col("n_types")).count()
    assert bad == 0


def test_vocab_growth_checkpoints_monotone(spark):
    rows = REGISTRY["q_vocab_growth"].spark_fn(spark, SF_DIR).collect()
    for r in rows:
        assert r["types_q1"] <= r["types_q2"] <= r["types_q3"] <= r["types_total"]
        assert r["types_total"] <= r["tokens_total"]


def test_cume_dist_partition_boundary_exact(spark):
    """The last row of every status partition must carry cd == 1.0
    and rev_share == 1.0 EXACTLY (decimal accumulation, not float
    drift)."""
    df = REGISTRY["q_window_cume_dist"].spark_fn(spark, SF_DIR)
    last = (
        df.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("o_orderstatus").orderBy(
                    F.col("cd").desc(), F.col("o_orderkey")
                )
            ),
        )
        .filter(F.col("rn") == 1)
        .collect()
    )
    assert len(last) > 0
    for r in last:
        assert r["cd"] == 1.0
        assert r["rev_share"] == 1.0
        assert r["abc_class"] == "C"


def test_assortativity_is_a_valid_correlation(spark):
    row = REGISTRY["q_graph_assortativity"].spark_fn(spark, SF_DIR).collect()[0]
    assert -1.0 <= row["assortativity"] <= 1.0
    assert row["n_edges"] > 0


def test_kn_differs_from_add_one_and_is_finite(spark):
    """KN must be a genuinely different model from the add-one
    baseline (continuation counts), and every score finite and
    positive."""
    import math

    kn = {
        r["doc_id"]: r["avg_nll"]
        for r in REGISTRY["q_doc_perplexity_kn"].spark_fn(spark, SF_DIR).collect()
    }
    addone = {
        r["doc_id"]: r["avg_nll"]
        for r in REGISTRY["q_doc_perplexity"].spark_fn(spark, SF_DIR).collect()
    }
    assert set(kn) == set(addone)
    assert all(math.isfinite(v) and v > 0 for v in kn.values())
    assert any(abs(kn[d] - addone[d]) > 1e-6 for d in kn)


def test_stats_histogram_partitions_the_table(spark):
    """Equi-height buckets must partition the table exactly (row
    counts sum to the table), be ordered (hi_i <= lo_{i+1}), and be
    height-balanced within tie tolerance."""
    rows = sorted(
        REGISTRY["q_stats_histogram"].spark_fn(spark, SF_DIR).collect(),
        key=lambda r: r["bucket"],
    )
    total = sum(r["n_rows"] for r in rows)
    n_orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").count()
    assert total == n_orders
    for a, b in zip(rows, rows[1:]):
        assert a["hi"] <= b["lo"]
        assert a["lo"] <= a["hi"]
    target = n_orders / len(rows)
    assert all(abs(r["n_rows"] - target) <= 0.2 * target for r in rows)


def test_sequence_match_flags_consistent(spark):
    """Flag consistency: a converted user's sequence necessarily
    contains a purchase (n_purchases >= 1), and the per-user
    sequence lengths sum to the event count."""
    rows = REGISTRY["q_sequence_match"].spark_fn(spark, SF_DIR).collect()
    assert sum(r["seq_len"] for r in rows) == spark.read.parquet(
        f"{SF_DIR}/events.parquet"
    ).count()
    for r in rows:
        if r["converted"]:
            assert r["n_purchases"] >= 1
        if r["error_after_purchase"]:
            assert r["n_purchases"] >= 1
