"""Property-based checks (hypothesis): the as-of join helper agrees
with a brute-force per-row reference on arbitrary small inputs, and
the PG type mapper round-trips structured types.
"""

from __future__ import annotations

import pytest

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from streamz_postgres_spark.operators.joins import asof_join
from streamz_postgres_spark.sources.pg_types import custom_schema, spark_type_for

_BASE = dt.datetime(2024, 1, 1)

# (key, minute-offset) event lists; right side gets unique (key, ts)
_left_rows = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 50)), min_size=1, max_size=8
)
_right_rows = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 50)), min_size=1, max_size=8,
    unique_by=lambda r: (r[0], r[1]),
)



pytestmark = pytest.mark.slow

def _brute_force(left, right):
    out = {}
    for i, (k, lt) in enumerate(left):
        best = None
        for k2, rt in right:
            if k2 == k and rt <= lt and (best is None or rt > best):
                best = rt
        out[i] = best
    return out


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(left=_left_rows, right=_right_rows)
def test_asof_join_matches_brute_force(spark, left, right):
    ldf = spark.createDataFrame(
        [(i, k, _BASE + dt.timedelta(minutes=m)) for i, (k, m) in enumerate(left)],
        "idx int, k int, ts timestamp_ntz",
    )
    rdf = spark.createDataFrame(
        [(k, _BASE + dt.timedelta(minutes=m), float(m)) for k, m in right],
        "k int, ts timestamp_ntz, v double",
    )
    got = {
        r.idx: (r.asof_ts - _BASE).total_seconds() / 60 if r.asof_ts else None
        for r in asof_join(ldf, rdf, "k", "ts", "ts", ["v"]).collect()
    }
    want = {i: float(m) if m is not None else None
            for i, m in _brute_force(left, right).items()}
    assert got == want


def _brute_force_forward(left, right):
    out = {}
    for i, (k, lt) in enumerate(left):
        best = None
        for k2, rt in right:
            if k2 == k and rt >= lt and (best is None or rt < best):
                best = rt
        out[i] = best
    return out


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(left=_left_rows, right=_right_rows)
def test_asof_forward_matches_brute_force(spark, left, right):
    ldf = spark.createDataFrame(
        [(i, k, _BASE + dt.timedelta(minutes=m)) for i, (k, m) in enumerate(left)],
        "idx int, k int, ts timestamp_ntz",
    )
    rdf = spark.createDataFrame(
        [(k, _BASE + dt.timedelta(minutes=m), float(m)) for k, m in right],
        "k int, ts timestamp_ntz, v double",
    )
    got = {
        r.idx: (r.asof_ts - _BASE).total_seconds() / 60 if r.asof_ts else None
        for r in asof_join(
            ldf, rdf, "k", "ts", "ts", ["v"], direction="forward"
        ).collect()
    }
    want = {i: float(m) if m is not None else None
            for i, m in _brute_force_forward(left, right).items()}
    assert got == want


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(left=_left_rows, right=_right_rows, tol=st.integers(1, 20))
def test_asof_forward_tolerance_matches_brute_force(spark, left, right, tol):
    ldf = spark.createDataFrame(
        [(i, k, _BASE + dt.timedelta(minutes=m)) for i, (k, m) in enumerate(left)],
        "idx int, k int, ts timestamp_ntz",
    )
    rdf = spark.createDataFrame(
        [(k, _BASE + dt.timedelta(minutes=m), float(m)) for k, m in right],
        "k int, ts timestamp_ntz, v double",
    )
    got = {
        r.idx: (r.asof_ts - _BASE).total_seconds() / 60 if r.asof_ts else None
        for r in asof_join(
            ldf, rdf, "k", "ts", "ts", ["v"],
            direction="forward", tolerance=f"{tol} MINUTES",
        ).collect()
    }
    want = {}
    for i, (k, lt) in enumerate(left):
        m = _brute_force_forward([(k, lt)], right)[0]
        want[i] = float(m) if m is not None and m - lt <= tol else None
    assert got == want


_join_rows = st.lists(
    st.tuples(st.integers(0, 3), st.integers(-100, 100)), min_size=0, max_size=12
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(left=_join_rows, right=_join_rows)
def test_salted_join_equals_plain_join(spark, left, right):
    from streamz_postgres_spark.plans.scale import salted_join

    ldf = spark.createDataFrame(left + [(0, 0)], "k int, lv int")
    rdf = spark.createDataFrame(right + [(0, 0)], "k int, rv int")
    got = sorted(
        map(tuple, salted_join(ldf, rdf, on="k", salt=4).select("k", "lv", "rv").collect())
    )
    want = sorted(map(tuple, ldf.join(rdf, "k").select("k", "lv", "rv").collect()))
    assert got == want


_cl_rows = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 30)), min_size=1, max_size=8,
    unique_by=lambda r: (r[0], r[1]),
)


def _cl_brute_force(left, right):
    """combine_latest reference: one output per event of either side.
    A left event sees right events at ts <= its own (ties included:
    the right side sorts first); a right event sees left events at
    strictly earlier ts only."""
    out = []
    for k, t in left:
        lc = max((m for k2, m in left if k2 == k and m <= t), default=None)
        rp = max((m for k2, m in right if k2 == k and m <= t), default=None)
        out.append((k, t, lc, rp))
    for k, t in right:
        lc = max((m for k2, m in left if k2 == k and m < t), default=None)
        rp = max((m for k2, m in right if k2 == k and m <= t), default=None)
        out.append((k, t, lc, rp))
    return out


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(left=_cl_rows, right=_cl_rows)
def test_combine_latest_matches_brute_force(spark, left, right):
    from collections import Counter

    from streamz_postgres_spark.api import SparkStream

    ldf = spark.createDataFrame(
        [(k, _BASE + dt.timedelta(minutes=m), float(m)) for k, m in left],
        "k int, ts timestamp_ntz, lv double",
    )
    rdf = spark.createDataFrame(
        [(k, _BASE + dt.timedelta(minutes=m), float(m)) for k, m in right],
        "k int, ts timestamp_ntz, rv double",
    )
    out = (
        SparkStream(ldf, "ts")
        .combine_latest(SparkStream(rdf, "ts"), on="k",
                        left_values=["lv"], right_values=["rv"])
        .to_df()
        .collect()
    )
    got = Counter(
        (r.k, (r.ts - _BASE).total_seconds() / 60, r.lv, r.rv) for r in out
    )
    want = Counter(
        (k, float(t), float(lc) if lc is not None else None,
         float(rp) if rp is not None else None)
        for k, t, lc, rp in _cl_brute_force(left, right)
    )
    assert got == want


def test_pg_type_mapping():
    assert spark_type_for("bigint") == "BIGINT"
    assert spark_type_for("numeric(12,2)") == "DECIMAL(12,2)"
    assert spark_type_for("integer[]") == "ARRAY<INT>"
    assert spark_type_for("timestamp without time zone") == "TIMESTAMP_NTZ"
    assert spark_type_for("jsonb") == "STRING"
    assert spark_type_for("weird_custom_type") == "STRING"
    assert (
        custom_schema([("id", "bigint"), ("price", "numeric(12,2)")])
        == "id BIGINT, price DECIMAL(12,2)"
    )


# -- prefix-filtered Jaccard vs brute force ---------------------------------

_vocab = [f"w{i}" for i in range(12)]
_doc_strat = st.lists(
    st.lists(st.sampled_from(_vocab), min_size=1, max_size=10),
    min_size=2,
    max_size=8,
)


def _brute_jaccard_pairs(docs, t):
    """All (i, j, n_common, jaccard) with i<j and jaccard >= t over
    token SETS (mirrors the operator's distinct-token semantics)."""
    sets = [set(d) for d in docs]
    out = set()
    for i in range(len(sets)):
        for j in range(i + 1, len(sets)):
            inter = len(sets[i] & sets[j])
            union = len(sets[i] | sets[j])
            if union and inter / union >= t:
                out.add((i, j, inter, inter / union))
    return out


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=_doc_strat, t=st.sampled_from([0.5, 0.8, 0.9]))
def test_prefix_filter_jaccard_matches_brute_force(spark, docs, t):
    """The PPJoin prefix filter must be RECALL-LOSSLESS at any
    threshold: exact same pair set and values as all-pairs brute
    force, on arbitrary small corpora (shared stopwords, identical
    docs, singleton tokens...)."""
    from streamz_postgres_spark.operators.dedup import _prefix_filtered_jaccard

    d = spark.createDataFrame(
        [(i, "en", " ".join(doc)) for i, doc in enumerate(docs)],
        "doc_id bigint, lang string, text string",
    )
    got = {
        (r.doc_a, r.doc_b, r.n_common, r.jaccard)
        for r in _prefix_filtered_jaccard(d, t=t).collect()
    }
    want = _brute_jaccard_pairs(docs, t)
    assert got == want


# -- binned range join == brute force ---------------------------------------

_points = st.lists(st.integers(-40, 40), min_size=1, max_size=12)
_ranges = st.lists(
    st.tuples(st.integers(-40, 40), st.integers(0, 25)),  # (lo, width)
    min_size=1,
    max_size=8,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(points=_points, ranges=_ranges, width=st.sampled_from([1.0, 3.0, 16.0]))
def test_binned_range_join_matches_brute_force(spark, points, ranges, width):
    from streamz_postgres_spark.operators.joins import binned_range_join

    pdf = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(points)], "pid int, p double"
    )
    rdf = spark.createDataFrame(
        [(j, float(lo), float(lo + w)) for j, (lo, w) in enumerate(ranges)],
        "rid int, lo double, hi double",
    )
    got = {
        (r.pid, r.rid)
        for r in binned_range_join(pdf, rdf, "p", "lo", "hi", width).collect()
    }
    want = {
        (i, j)
        for i, v in enumerate(points)
        for j, (lo, w) in enumerate(ranges)
        if lo <= v < lo + w
    }
    assert got == want


# -- chunk windows tile the document exactly --------------------------------

@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    n=st.integers(1, 90),
    size=st.integers(2, 40),
    stride_frac=st.integers(1, 40),
)
def test_chunk_windows_tile_exactly(spark, n, size, stride_frac):
    from streamz_postgres_spark.operators.pipeline import chunk_windows

    stride = max(1, min(size, stride_frac))
    text = " ".join(f"w{i}" for i in range(n))
    d = spark.createDataFrame([(1, text)], "doc_id int, text string")
    rows = sorted(
        chunk_windows(d, "doc_id", "text", size, stride).collect(),
        key=lambda r: r.chunk_id,
    )
    # chunk ids are 0..k-1 dense
    assert [r.chunk_id for r in rows] == list(range(len(rows)))
    for r in rows:
        start = r.chunk_id * stride
        assert r.n_tok == min(n - start, size) and r.n_tok >= 1
        assert r.head_tok == f"w{start}"
        assert r.tail_tok == f"w{min(start + size, n) - 1}"
    # the windows cover every token index exactly
    covered = set()
    for r in rows:
        start = r.chunk_id * stride
        covered.update(range(start, start + r.n_tok))
    assert covered == set(range(n))
    # minimality: the previous window alone would not have covered n-1
    if len(rows) > 1:
        assert (rows[-2].chunk_id * stride) + size < n


# -- asof tolerance == brute force with staleness bound ---------------------

@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(left=_left_rows, right=_right_rows, tol=st.integers(0, 20))
def test_asof_tolerance_matches_brute_force(spark, left, right, tol):
    ldf = spark.createDataFrame(
        [(i, k, _BASE + dt.timedelta(minutes=m)) for i, (k, m) in enumerate(left)],
        "idx int, k int, ts timestamp_ntz",
    )
    rdf = spark.createDataFrame(
        [(k, _BASE + dt.timedelta(minutes=m), float(m)) for k, m in right],
        "k int, ts timestamp_ntz, v double",
    )
    got = {
        r.idx: (r.asof_ts - _BASE).total_seconds() / 60 if r.asof_ts else None
        for r in asof_join(
            ldf, rdf, "k", "ts", "ts", ["v"], tolerance=f"{tol} MINUTES"
        ).collect()
    }
    want = {}
    for i, (k, lt) in enumerate(left):
        best = _brute_force([(k, lt)], right)[0]
        want[i] = float(best) if best is not None and lt - best <= tol else None
    assert got == want


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    vals=st.lists(
        st.floats(
            min_value=-1e9, max_value=1e9,
            allow_nan=False, allow_infinity=False,
        ),
        min_size=1,
        max_size=24,
    ),
    nparts=st.integers(1, 8),
)
def test_dsum_matches_decimal_reference_any_partitioning(spark, vals, nparts):
    """dsum's contract on ARBITRARY doubles: the result equals a
    single-threaded fold of the micro6 quantization (floor(v*1e6 +
    0.5), summed exactly, one division back to double) for every
    partitioning — the property the whole oracle strategy rests on.
    The first version of this test used a decimal-quantize reference
    and FOUND a real bug: Spark's double->decimal cast rounds the
    shortest string repr (HALF_UP) while DuckDB rounds the exact
    binary value, diverging near 1e-6 ties — which is why dsum now
    uses the pure-IEEE floor rule on both engines."""
    from decimal import Decimal

    from streamz_postgres_spark.functions.numeric import dsum, micro6

    expected = float(sum((micro6(v) for v in vals), Decimal(0)))
    df = spark.createDataFrame([(v,) for v in vals], "x double").repartition(
        nparts
    )
    got = df.agg(dsum("x").alias("s")).collect()[0].s
    assert got == expected


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    vals=st.lists(
        st.floats(
            min_value=-1e9, max_value=1e9,
            allow_nan=False, allow_infinity=False,
        ),
        min_size=1,
        max_size=24,
    )
)
def test_dsum_matches_duckdb_on_arbitrary_doubles(spark, duck, vals):
    """The cross-engine half of the dsum contract: Spark dsum and
    DuckDB sql_dsum produce the IDENTICAL double on arbitrary inputs
    — the property every value-hash oracle in the registry rests on
    (and the one the old decimal-cast form violated near 1e-6
    ties)."""
    from streamz_postgres_spark.functions.numeric import dsum, sql_dsum

    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = df.agg(dsum("x").alias("s")).collect()[0].s
    # the literals are QUOTED strings on purpose: DuckDB types a bare
    # numeric literal as DECIMAL, and for >16 significant digits the
    # DECIMAL's unscaled integer exceeds 2^53, so DECIMAL->DOUBLE
    # conversion lands one ulp off the IEEE parse — the hypothesis
    # counterexample 900719926.2578125 reached DuckDB one ulp
    # different from Spark and flipped the floor at an exact
    # half-micro-unit tie. A quoted string parses straight to DOUBLE.
    # (Real oracles are immune: they read the same parquet doubles.)
    lits = ", ".join(f"(CAST('{v!r}' AS DOUBLE))" for v in vals)
    (want,) = duck.execute(
        f"SELECT {sql_dsum('x')} FROM (VALUES {lits}) t(x)"
    ).fetchone()
    assert got == want


def test_dsum_tie_value_via_string_literal(spark, duck):
    """Regression pin for the DuckDB bare-literal DECIMAL trap: the
    exact value hypothesis found (a half-micro-unit tie whose repr
    has 16 significant digits) must agree across engines when fed
    correctly, and the bare-literal form must demonstrably corrupt
    the input — so this test fails loudly if DuckDB ever changes
    either behavior."""
    v = 900719926.2578125
    (via_string,) = duck.execute(
        f"SELECT CAST('{v!r}' AS DOUBLE)"
    ).fetchone()
    assert via_string == v
    (via_bare,) = duck.execute(f"SELECT CAST({v!r} AS DOUBLE)").fetchone()
    assert via_bare != v, (
        "DuckDB now parses bare high-precision literals exactly — "
        "the quoted-string workaround in the dsum property test can "
        "be simplified"
    )
    from streamz_postgres_spark.functions.numeric import dsum, sql_dsum

    df = spark.createDataFrame([(v,)], "x double")
    got = df.agg(dsum("x").alias("s")).collect()[0].s
    (want,) = duck.execute(
        f"SELECT {sql_dsum('x')} FROM (SELECT CAST('{v!r}' AS DOUBLE) x) t"
    ).fetchone()
    assert got == want


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(
        st.text(
            alphabet=st.characters(
                codec="utf-8", exclude_characters="'\\\x00"
            ),
            max_size=40,
        ),
        min_size=1,
        max_size=8,
        unique=True,
    )
)
def test_hash60_cross_engine_on_arbitrary_strings(spark, duck, texts):
    """hash60 (first 15 md5 hex digits as a 60-bit int) must agree
    between Spark and DuckDB on ARBITRARY unicode — the dedup/LSH/
    split/shard operators all assume it. The fixture-based oracle
    runs only exercise fixture text; this drives the property over
    generated strings (quotes/backslash/NUL excluded: they'd need
    SQL-literal escaping, which is the oracle harness's job, not the
    hash's)."""
    from streamz_postgres_spark.functions.text_features import (
        hash60,
        sql_hash60,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(t,) for t in texts], "t string")
    got = {
        r.t: r.h for r in df.select("t", hash60(F.col("t")).alias("h")).collect()
    }
    for t in texts:
        lit = "'" + t.replace("'", "''") + "'"
        (want,) = duck.execute(f"SELECT {sql_hash60(lit)}").fetchone()
        assert got[t] == want, repr(t)


# -- winnowing guarantee (q_dedup_substring) ---------------------------------

def _winnow_fps(text: str, k: int = 24, w: int = 8) -> set:
    """Pure-Python mirror of q_dedup_substring's fingerprint
    extraction (same hash, same first-min selection rule), for
    property-testing the winnowing theorem without Spark."""
    import hashlib

    n = len(text) - k + 1
    if n < w:
        return set()
    hs = [
        int(hashlib.md5(text[i : i + k].encode()).hexdigest()[:15], 16)
        for i in range(n)
    ]
    fps = set()
    for j in range(n - w + 1):
        win = hs[j : j + w]
        p = win.index(min(win))
        fps.add(text[j + p : j + p + k])
    return fps


_chars = st.text(alphabet="abcdefgh ,.", min_size=0, max_size=120)


@given(
    shared=st.text(alphabet="abcdefgh ,.", min_size=31, max_size=60),
    pre_a=_chars,
    post_a=_chars,
    pre_b=_chars,
    post_b=_chars,
)
@settings(max_examples=60, deadline=None)
def test_winnowing_guarantee_shared_span_shares_fingerprint(
    shared, pre_a, post_a, pre_b, post_b
):
    """The theorem q_dedup_substring's docstring claims (Schleimer
    et al. 2003): two documents sharing ANY verbatim span of length
    >= K + W - 1 = 31 chars MUST share at least one winnowing
    fingerprint, wherever the span sits in each document. A
    violation here means the operator can silently miss duplicated
    substrings — the one failure mode a dedup candidate generator
    must not have."""
    a = pre_a + shared + post_a
    b = pre_b + shared + post_b
    fa, fb = _winnow_fps(a), _winnow_fps(b)
    common = fa & fb
    assert common, (
        f"no shared fingerprint for shared span {shared!r} "
        f"(a={a!r}, b={b!r})"
    )
    # and every shared fingerprint is a genuine verbatim 24-char
    # span of both docs (the zero-false-positive claim)
    for g in common:
        assert g in a and g in b and len(g) == 24


# -- binned interval-overlap join == brute force -----------------------------

_intervals = st.lists(
    st.tuples(st.integers(0, 60), st.integers(1, 30)),  # (start, duration)
    min_size=1,
    max_size=10,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ivals=_intervals, width=st.sampled_from([1, 5, 16]))
def test_interval_overlap_pairs_matches_brute_force(spark, ivals, width):
    """The one-bin dedup argument (keep only the bin containing
    greatest(s_a, s_b)) must yield exactly one row per overlapping
    pair for ANY interval layout — including touching intervals
    (e_a == s_b: NOT an overlap under half-open semantics), nested
    intervals, and bin-straddling spans."""
    from pyspark.sql import functions as F

    from streamz_postgres_spark.operators.joins import interval_overlap_pairs

    df = spark.createDataFrame(
        [(i, s, s + d) for i, (s, d) in enumerate(ivals)],
        "iid int, s long, e long",
    )
    sel = interval_overlap_pairs(df, "iid", "s", "e", width).select(
        F.col("a.iid").alias("ia"), F.col("b.iid").alias("ib")
    )
    got = sorted((r.ia, r.ib) for r in sel.collect())
    want = sorted(
        (i, j)
        for i, (si, di) in enumerate(ivals)
        for j, (sj, dj) in enumerate(ivals)
        if i < j and si < sj + dj and sj < si + di
    )
    assert got == want


def test_winnowing_survives_short_documents(spark):
    """Round-7 review find (confirmed live before the fix): a doc
    shorter than K (or K+W-1) used to feed slice() a zero start via
    Spark's descending sequence(1,0) and CRASH the whole job. Short
    docs must simply contribute no fingerprints — and long docs in
    the same corpus must still pair."""
    from streamz_postgres_spark.operators.dedup import _winnow_pairs

    long_text = ("the quick brown fox jumps over the lazy dog and keeps "
                 "running through the meadow at dawn " * 3)
    df = spark.createDataFrame(
        [
            (1, ""),
            (2, "short"),
            (3, "x" * 30),       # one below the 31-char guarantee
            (4, long_text),
            (5, long_text + " tail a"),
            (6, "y" * 31),
        ],
        "doc_id long, text string",
    )
    pairs = _winnow_pairs(spark, "/nonexistent", docs=df).collect()
    got = {(r.doc_a, r.doc_b) for r in pairs}
    assert (4, 5) in got, "long duplicate pair must still be found"
    assert all(a not in (1, 2, 3) and b not in (1, 2, 3) for a, b in got)


def _brute_force_nearest(left, right):
    out = {}
    for i, (k, lt) in enumerate(left):
        back = max((m for k2, m in right if k2 == k and m <= lt), default=None)
        fwd = min((m for k2, m in right if k2 == k and m >= lt), default=None)
        if back is None:
            out[i] = fwd
        elif fwd is None:
            out[i] = back
        else:
            out[i] = back if (lt - back) <= (fwd - lt) else fwd
    return out


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(left=_left_rows, right=_right_rows)
def test_asof_nearest_matches_brute_force(spark, left, right):
    """direction='nearest': closest right row on either side, ties
    to backward — against a per-row brute force."""
    ldf = spark.createDataFrame(
        [(i, k, _BASE + dt.timedelta(minutes=m)) for i, (k, m) in enumerate(left)],
        "idx int, k int, ts timestamp_ntz",
    )
    rdf = spark.createDataFrame(
        [(k, _BASE + dt.timedelta(minutes=m), float(m)) for k, m in right],
        "k int, ts timestamp_ntz, v double",
    )
    got = {
        r.idx: (r.asof_ts - _BASE).total_seconds() / 60 if r.asof_ts else None
        for r in asof_join(
            ldf, rdf, "k", "ts", "ts", ["v"], direction="nearest"
        ).collect()
    }
    want = {i: float(m) if m is not None else None
            for i, m in _brute_force_nearest(left, right).items()}
    assert got == want


# -- MATCH_RECOGNIZE lowering vs a pure-Python reference matcher -------------

_MR_TYPES = ("view", "click", "purchase", "error")
_MR_SYMS = {"view": "V", "click": "C", "purchase": "P"}  # error -> filler

#: per-user event-type index sequences; 1-6 users x 0-12 events
_mr_corpus = st.lists(
    st.lists(st.integers(0, len(_MR_TYPES) - 1), max_size=12),
    min_size=1,
    max_size=6,
)

#: pattern terms: (symbol index, quantifier index); at least one term
#: is forced mandatory so the pattern cannot match empty
_mr_pattern = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 3)),
    min_size=1,
    max_size=4,
)

_QUANT = ("", "*", "+", "?")


def _mr_regex(pattern) -> str:
    syms = ("V", "C", "P")
    terms = [f"{syms[s]}{_QUANT[q]}" for s, q in pattern]
    # force the first term mandatory (strip * / ? down to + / bare)
    s0, q0 = pattern[0]
    terms[0] = f"{syms[s0]}{'+' if _QUANT[q0] in ('*', '+') else ''}"
    return "".join(terms)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpus=_mr_corpus, pattern=_mr_pattern)
def test_match_recognize_lowering_matches_python_reference(
    spark, corpus, pattern
):
    """The lowered MATCH_RECOGNIZE must agree with a brute-force
    Python reference on arbitrary small corpora and random
    non-empty-matchable patterns: same first-match-wins symbol
    classification, same total (ts, event_id) order, same
    non-overlapping left-to-right match count."""
    import re as _re

    from streamz_postgres_spark import sqlext

    regex = _mr_regex(pattern)
    rows = []
    eid = 0
    for u, seq in enumerate(corpus):
        for j, t in enumerate(seq):
            eid += 1
            rows.append(
                (u, eid, _BASE + dt.timedelta(minutes=j), _MR_TYPES[t])
            )
    if not rows:
        return
    spark.createDataFrame(
        rows,
        "user_id int, event_id int, ts timestamp_ntz, event_type string",
    ).createOrReplaceTempView("mr_prop_events")
    try:
        got = {
            r["user_id"]: (r["seq_len"], r["n_matches"], r["matched"])
            for r in sqlext.sql(
                spark,
                f"""SELECT user_id, seq_len, n_matches, matched
                    FROM mr_prop_events
                    MATCH_RECOGNIZE (
                      PARTITION BY user_id
                      ORDER BY ts, event_id
                      PATTERN ({' '.join(_mr_regex(pattern))})
                      DEFINE V AS event_type = 'view',
                             C AS event_type = 'click',
                             P AS event_type = 'purchase'
                    )""",
            ).collect()
        }
    finally:
        spark.catalog.dropTempView("mr_prop_events")
    for u, seq in enumerate(corpus):
        if not seq:
            continue  # empty groups produce no row (no events at all)
        s = "".join(
            _MR_SYMS.get(_MR_TYPES[t], "-") for t in seq
        )  # already in (ts, event_id) order by construction
        n = len(_re.findall(regex, s))
        assert got[u] == (len(seq), n, 1 if n > 0 else 0), (
            f"user {u}: string {s!r} pattern {regex!r}: "
            f"got {got[u]}, want {(len(seq), n, 1 if n > 0 else 0)}"
        )
