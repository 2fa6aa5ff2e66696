"""Live corpus / analytics streaming operators: ingestion-time dedup,
contamination and mixture guards, mergeable sketches, continuous
rollups and windowed percentiles (split from streaming/queries.py in
round 7 — registry keys unchanged).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from streamz_postgres_spark.catalog import load_table
from streamz_postgres_spark.functions.numeric import sql_dsum
from streamz_postgres_spark.registry import register
from streamz_postgres_spark.streaming.runner import replay_events, run_to_table


# -- streaming per-segment OLS trend ----------------------------------------


def _trend_oracle() -> str:
    # importing the module runs @register for q_trend_ols, whose
    # oracle is shared verbatim (same moments, same closed form)
    import streamz_postgres_spark.operators.stats  # noqa: F401

    from streamz_postgres_spark.registry import REGISTRY

    return REGISTRY["q_trend_ols"].oracle


def q_stream_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIVE per-segment OLS trend: the five exact decimal moments of
    q_trend_ols are associative, so the STREAM maintains them as an
    ordinary complete-mode aggregation (state = 5 decimals per
    segment, merged exactly on every micro-batch) and the closed-form
    slope/intercept is a read-side projection over the tiny
    materialized state — 'is this metric drifting' answered
    continuously instead of nightly. Identical oracle to the batch
    twin; same dyadic x² scaling keeps the decimal sums lossless."""
    from streamz_postgres_spark.functions.numeric import dsum
    from streamz_postgres_spark.operators.stats import (
        _TREND_EPOCH,
        _TREND_XX_SCALE,
        _TREND_XY_SCALE,
    )

    s = replay_events(spark, sf_dir)
    x = F.expr(
        f"timestampdiff(SECOND, TIMESTAMP_NTZ '{_TREND_EPOCH}', ts)"
    ).cast("double")
    agg = s.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        dsum(x).alias("sx"),
        dsum("value").alias("sy"),
        # same dyadic pre-scales as the batch twin (sxy added with
        # the v2 hostile fix there — the two must move together, the
        # shared oracle is what catches a drift like this)
        dsum(x * F.col("value") / _TREND_XY_SCALE).alias("sxy_s"),
        dsum(x * x / _TREND_XX_SCALE).alias("sxx_s"),
    )
    tbl = run_to_table(agg, "complete", spark)
    sxx = F.col("sxx_s") * _TREND_XX_SCALE
    sxy = F.col("sxy_s") * _TREND_XY_SCALE
    slope = (F.col("n") * sxy - F.col("sx") * F.col("sy")) / (
        F.col("n") * sxx - F.col("sx") * F.col("sx")
    )
    intercept = (F.col("sy") - slope * F.col("sx")) / F.col("n")
    return tbl.select(
        "event_type",
        F.col("n").cast("bigint").alias("n_events"),
        slope.alias("slope_per_sec"),
        intercept.alias("intercept_at_epoch"),
    )


def _register_stream_trend() -> None:
    register(
        "q_stream_trend",
        oracle=_trend_oracle(),
        tags=("streaming", "stats", "timeseries"),
    )(q_stream_trend)


_register_stream_trend()


# -- streaming bitmap audience overlap --------------------------------------


def _bitmap_overlap_oracle() -> str:
    import streamz_postgres_spark.operators.aggregates  # noqa: F401

    from streamz_postgres_spark.registry import REGISTRY

    return REGISTRY["q_bitmap_overlap"].oracle


def q_stream_bitmap_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIVE audience overlap: the (type, id-bucket) bitmaps are
    maintained as streaming aggregation state (each micro-batch ORs
    new ids in — the q_stream_bitmap_distinct state, bounded by the
    id domain), and the pairwise inclusion-exclusion read-out runs
    over the tiny materialized bitmap table per refresh. Continuous
    reach/overlap dashboards without ever re-expanding user sets;
    identical oracle to the batch twin."""
    from streamz_postgres_spark.operators.aggregates import (
        bitmap_overlap_readout,
    )

    s = replay_events(spark, sf_dir)
    agg = s.groupBy(
        "event_type",
        F.expr("bitmap_bucket_number(user_id)").alias("bkt"),
    ).agg(
        F.expr("bitmap_construct_agg(bitmap_bit_position(user_id))").alias(
            "bm"
        )
    )
    tbl = run_to_table(agg, "complete", spark)
    return bitmap_overlap_readout(tbl)


register(
    "q_stream_bitmap_overlap",
    oracle=_bitmap_overlap_oracle(),
    tags=("streaming", "agg", "bitmap", "analytics"),
)(q_stream_bitmap_overlap)



@register(
    "q_stream_percentile_windowed",
    oracle="""
WITH s AS (
  -- COUNT(value) + FILTER: order statistics over the NON-NULL
  -- values (the q_kll_quantile convention — DuckDB's list() keeps
  -- NULLs where Spark's collect_list drops them, and a COUNT(*)
  -- index would desynchronize; v2 hostile streaming sweep find)
  SELECT date_trunc('hour', ts) AS window_start, event_type,
         list(value ORDER BY value) FILTER (value IS NOT NULL) AS vals,
         CAST(COUNT(value) AS BIGINT) AS n_events
  FROM events
  GROUP BY 1, 2
)
SELECT window_start, event_type, n_events,
       vals[CAST((n_events - 1) // 2 AS BIGINT) + 1] AS p50,
       vals[CAST(((n_events - 1) * 9) // 10 AS BIGINT) + 1] AS p90
FROM s
""",
    tags=("streaming", "stats", "watermark"),
)
def q_stream_percentile_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BOUNDED-STATE percentile twin (round-5 verdict #5):
    q_stream_percentile keeps each key's full value multiset forever
    — exact, but state grows with events per key. This twin keys the
    multiset by (1-hour event-time window, event_type) and declares a
    watermark, so Spark's own streaming-aggregation state management
    EVICTS each window's multiset the moment the watermark passes its
    end: state = open windows only, bounded by event rate x window
    span regardless of stream lifetime — the production shape for a
    latency dashboard. Same integer-index exact order statistics as
    the unbounded baseline (value at (n-1)//2 resp. ((n-1)*9)//10 of
    the sorted window multiset; never float interpolation), checked
    by a full value oracle. Entirely built-in operators: watermarked
    window agg + sort_array(collect_list) + element_at — no custom
    processor, no Python workers. Append mode withholds the window
    containing max(ts) on a bounded input, so the replay stages a
    far-future flush row exactly as q_stream_tumbling_watermarked
    does (the flush window itself is filtered out)."""
    import shutil

    from streamz_postgres_spark.streaming.runner import (
        run_to_table,
        staged_replay_with_flush,
    )

    s, staging = staged_replay_with_flush(spark, sf_dir)
    micros = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    )
    out = (
        s.withColumn("ts_evt", F.timestamp_micros(micros))
        .withWatermark("ts_evt", "0 seconds")
        .groupBy(F.window("ts_evt", "1 hour").alias("w"), "event_type")
        .agg(
            # COUNT(value), matching the NULL-dropping collect_list
            # (the q_kll_quantile convention; v2 hostile find)
            F.count("value").alias("n_events"),
            F.sort_array(F.collect_list("value")).alias("vals"),
        )
        .select(
            F.expr(
                "timestampadd(MICROSECOND, unix_micros(w.start), "
                "TIMESTAMP_NTZ '1970-01-01 00:00:00')"
            ).alias("window_start"),
            "event_type",
            "n_events",
            # try_element_at: an all-NULL window has an empty vals
            # array, where ANSI element_at throws and DuckDB's
            # vals[1] is NULL
            F.expr(
                "try_element_at(vals, CAST((n_events - 1) DIV 2 AS INT) + 1)"
            ).alias("p50"),
            F.expr(
                "try_element_at(vals, "
                "CAST(((n_events - 1) * 9) DIV 10 AS INT) + 1)"
            ).alias("p90"),
        )
        .filter(
            F.col("window_start") < F.lit("2024-06-01").cast("timestamp_ntz")
        )
    )
    try:
        return run_to_table(out, "append", spark)
    finally:
        shutil.rmtree(staging, ignore_errors=True)


# -- streaming rollup cascade (continuous aggregate) ------------------------


def _rollup_cascade_oracle() -> str:
    import streamz_postgres_spark.operators.aggregates  # noqa: F401

    from streamz_postgres_spark.registry import REGISTRY

    return REGISTRY["q_rollup_cascade"].oracle


def q_stream_rollup_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIVE continuous aggregate: the stream maintains HOURLY partial
    state (count + exact DECIMAL sum per hour — the mergeable partial
    of q_rollup_cascade), and the daily level folds over the tiny
    materialized hour table read-side per refresh. This is the
    TimescaleDB continuous-aggregate shape on Structured Streaming:
    late data patches one hour partial in state instead of
    recomputing a day, and higher levels (week/month) stack over the
    same partials without touching raw events. Identical oracle to
    the batch twin proves the cascade merges losslessly."""
    from streamz_postgres_spark.operators.aggregates import (
        hourly_partials,
        rollup_day_fold,
    )

    s = replay_events(spark, sf_dir)
    tbl = run_to_table(hourly_partials(s), "complete", spark)
    return rollup_day_fold(tbl)


register(
    "q_stream_rollup_cascade",
    oracle=_rollup_cascade_oracle(),
    tags=("streaming", "agg", "rollup", "timeseries"),
)(q_stream_rollup_cascade)



# -- streaming mergeable quantile sketch (bounded-state percentiles) --------

#: dyadic pre-scale for the log2 histogram: value*64 is EXACT (a
#: power-of-two multiply never rounds), so the bucket id is a pure
#: integer function of the input on both engines. The GREATEST clamp
#: is load-bearing (round-6 advisor): a negative input would make
#: bin() of a negative BIGINT a 64-char string, and Spark's shiftleft
#: masks the shift count (64 & 63 = 0) while DuckDB's << does not —
#: a silent cross-engine divergence. Clamping to 0 routes all
#: negative values into the lowest bucket identically on both sides.
_QSKETCH_SCALE = 64
_QSKETCH_BUCKET = (
    "shiftleft(CAST(1 AS BIGINT), "
    "CAST(length(bin(CAST(FLOOR(GREATEST(value, 0.0) * "
    f"{_QSKETCH_SCALE}) AS BIGINT))) AS INT))"
)


@register(
    "q_stream_quantile_sketch",
    oracle=f"""
WITH b AS (
  SELECT event_type,
         (CAST(1 AS BIGINT) << length(bin(
            CAST(FLOOR(GREATEST(value, 0.0) * {_QSKETCH_SCALE}) AS BIGINT)))) AS bucket_hi,
         COUNT(*) AS n
  FROM events
  GROUP BY event_type, bucket_hi
),
c AS (
  SELECT event_type, bucket_hi, n,
         SUM(n) OVER (PARTITION BY event_type ORDER BY bucket_hi
                      ROWS UNBOUNDED PRECEDING) AS cum,
         SUM(n) OVER (PARTITION BY event_type) AS n_total
  FROM b
)
SELECT event_type,
       CAST(MAX(n_total) AS BIGINT) AS n_events,
       CAST(MIN(CASE WHEN cum >= (n_total - 1) // 2 + 1
                     THEN bucket_hi END) AS DOUBLE)
         / {_QSKETCH_SCALE} AS p50_est,
       CAST(MIN(CASE WHEN cum >= ((n_total - 1) * 9) // 10 + 1
                     THEN bucket_hi END) AS DOUBLE)
         / {_QSKETCH_SCALE} AS p90_est
FROM c
GROUP BY event_type
""",
    tags=("streaming", "stats", "sketch"),
)
def q_stream_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MERGEABLE-SKETCH percentile path (the third leg of the
    percentile story, promised in SCALE.md): per event type the
    stream maintains a LOG2 HISTOGRAM — one counter per power-of-two
    value bucket — as an ordinary complete-mode aggregation, and the
    quantile estimate is a read-side cumulative walk to the bucket
    containing the exact order-statistic rank ((n-1)//2 + 1 resp.
    ((n-1)*9)//10 + 1). State is O(types x buckets) counters — a few
    hundred bytes per key FOREVER, vs the exact baseline's
    O(events) multiset — and the per-batch partials merge by integer
    addition, the same property a production KLL/t-digest would
    have, demonstrated here with a sketch whose every output is a
    DETERMINISTIC integer function of the inputs, so the driver can
    VALUE-check it (a float t-digest could only be bounds-checked).
    The estimate is the bucket's upper edge: a guaranteed
    at-most-2x-overestimate of the true quantile with error bounded
    by the bucket ratio, the classic HDR-histogram trade. Bucket ids
    use integer bit-length over a dyadic pre-scale (never IEEE log2,
    which rounds differently across engines at exact powers)."""
    s = replay_events(spark, sf_dir)
    agg = s.groupBy(
        "event_type", F.expr(_QSKETCH_BUCKET).alias("bucket_hi")
    ).agg(F.count(F.lit(1)).alias("n"))
    tbl = run_to_table(agg, "complete", spark)
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("bucket_hi")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wtot = Window.partitionBy("event_type")
    c = tbl.select(
        "event_type",
        "bucket_hi",
        F.sum("n").over(wcum).alias("cum"),
        F.sum("n").over(wtot).alias("n_total"),
    )
    return c.groupBy("event_type").agg(
        F.max("n_total").cast("bigint").alias("n_events"),
        (
            F.min(
                F.when(
                    F.expr("cum >= (n_total - 1) DIV 2 + 1"),
                    F.col("bucket_hi"),
                )
            ).cast("double")
            / _QSKETCH_SCALE
        ).alias("p50_est"),
        (
            F.min(
                F.when(
                    F.expr("cum >= ((n_total - 1) * 9) DIV 10 + 1"),
                    F.col("bucket_hi"),
                )
            ).cast("double")
            / _QSKETCH_SCALE
        ).alias("p90_est"),
    )


# -- ingestion-time near-dup detection (streaming MinHash-LSH) --------------


#: Hard bound on a band-bucket's roster (and therefore on state size
#: AND per-arrival pair emission). Buckets are small by construction
#: — a bucket only collects docs colliding on a FULL 4-hash band —
#: but boilerplate/template corpora can make one bucket hot, and an
#: unbounded roster then grows state and per-arrival work linearly
#: forever (round-5 verdict finding #2). 128 is ~8x the largest
#: bucket observed at sf0.1 (17) while capping state at ~20 KB and
#: per-arrival emission at 128 pairs. Docs arriving at a full bucket
#: are still CHECKED (pairs vs the rostered anchors are emitted, so
#: a dupe of an anchor is always caught) but do not become anchors
#: themselves; the overflow count is kept in state for observability.
_LSH_ROSTER_CAP = 128


def _lsh_bucket_fold(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-band-bucket streaming LSH: state is the bucket's roster of
    (doc_id, 16-int minhash signature) plus an overflow counter,
    JSON-encoded. Each arriving doc emits a candidate pair against
    every EARLIER doc in its bucket (state plus earlier-in-batch,
    ordered by doc_id) with the signature-estimated Jaccard, then
    joins the roster — so every colliding pair is emitted exactly
    once, at ingestion time. The roster is capped at _LSH_ROSTER_CAP
    anchors (bounded state, bounded per-arrival work; see the
    constant's docstring for the degradation semantics on a hot
    bucket)."""
    import json

    if state.exists:
        stored = json.loads(state.get[0])
        # pre-cap states were a bare roster list; current is a dict
        roster, overflow = (
            (stored["r"], stored["ov"])
            if isinstance(stored, dict)
            else (stored, 0)
        )
    else:
        roster, overflow = [], 0
    pdf = pd.concat(list(batches), ignore_index=True).sort_values(
        "doc_id"
    ).reset_index(drop=True)
    sig_cols = [f"m{j}" for j in range(16)]
    out_a, out_b, out_est = [], [], []
    # at-least-once feed discipline: a redelivered doc_id (verbatim
    # duplicate row, the v7 hostile class) applies ONCE — skipping it
    # prevents the self-pair (did, did) its copy would emit against
    # the roster and keeps the capped roster from burning a slot on
    # a document it already anchors. Overflowed ids can't be
    # recognized (bounded state by contract); their re-pairs collapse
    # in the read-side max() like any multi-band duplicate.
    seen = {pid for pid, _ in roster}
    for _, row in pdf.iterrows():
        did = int(row["doc_id"])
        if did in seen:
            continue
        seen.add(did)
        sig = [int(row[c]) for c in sig_cols]
        for prev_id, prev_sig in roster:
            matches = sum(1 for x, y in zip(sig, prev_sig) if x == y)
            a, b = (prev_id, did) if prev_id < did else (did, prev_id)
            out_a.append(a)
            out_b.append(b)
            out_est.append(matches / 16.0)
        if len(roster) < _LSH_ROSTER_CAP:
            roster.append((did, sig))
        else:
            overflow += 1
    state.update((json.dumps({"r": roster, "ov": overflow}),))
    yield pd.DataFrame(
        {
            "doc_a": pd.Series(out_a, dtype="int64"),
            "doc_b": pd.Series(out_b, dtype="int64"),
            "est_jaccard": pd.Series(out_est, dtype="float64"),
        }
    )


def _streaming_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.parquet as an unbounded stream (schema pinned from
    the batch catalog read)."""
    from streamz_postgres_spark.catalog import load_table, ship_package

    ship_package(spark)
    schema = load_table(spark, sf_dir, "documents").schema
    return (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("pathGlobFilter", "documents.parquet")
        .load(sf_dir)
    )


def _stream_minhash_sig(df: DataFrame) -> DataFrame:
    """doc_id + the 16 row-local minhash signature columns m0..m15 —
    identical values to the batch explode+groupBy-min pipeline (same
    md5 double-hash family), but computed with ZERO shuffle: the
    signature never leaves its row, which is exactly what an
    ingestion stream needs.

    Restructured r11 (the shingles-binding find applied to the SQL
    HOF form): the old single-projection shape inlined the whole
    shingle+md5 pipeline into EVERY m_j column AND re-split the text
    per element_at inside the shingle lambda — 16 copies of a
    per-document-quadratic scan (value-forced sf0.1: 59 s; x10
    exceeded a 10-minute timeout). Now the token array is let-bound
    (the single-element-array-transform trick), md5 runs ONCE per
    shingle, and the (h1, h2) pair array is materialized as one
    attribute column that a SECOND projection derives all 16 sigs
    from (CollapseProject keeps multi-referenced non-cheap aliases
    un-inlined). Value-forced sf0.1: 4.2 s; x10: 9.4 s —
    value-identical (same md5 family, same min), same zero-shuffle
    posture.

    Guard: sequence(1, n-2) DESCENDS when n < 3 (negative step
    inference) — short docs must produce an empty shingle array,
    mirroring functions.text_features.shingles."""
    from streamz_postgres_spark.functions.text_features import DH_MOD

    hashed = (
        "transform(element_at(transform(array(split(text, ' ')), tk -> "
        "CASE WHEN size(tk) >= 3 THEN "
        "transform(sequence(1, size(tk) - 2), "
        "i -> concat_ws(' ', element_at(tk, i), element_at(tk, i + 1), "
        "element_at(tk, i + 2))) "
        "ELSE CAST(array() AS ARRAY<STRING>) END), 1), "
        "s -> md5(s))"
    )
    pre = df.select(
        "doc_id",
        F.expr(
            f"transform({hashed}, h -> struct("
            "CAST(conv(substring(h, 1, 15), 16, 10) AS BIGINT) AS h1, "
            "CAST(conv(substring(h, 16, 14), 16, 10) AS BIGINT) AS h2))"
        ).alias("__hp"),
    )
    return pre.select(
        "doc_id",
        *[
            F.expr(
                f"array_min(transform(__hp, p -> "
                f"(p.h1 + {j} * p.h2) % {DH_MOD}))"
            ).alias(f"m{j}")
            for j in range(16)
        ],
    )


def q_stream_dedup_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate detection AT INGESTION TIME: the stream
    computes each document's 16-way minhash signature row-locally
    (HOFs, zero shuffle), keys it into its 4 LSH band buckets, and a
    per-bucket stateful roster emits every colliding pair with its
    signature-estimated Jaccard the moment the SECOND document
    arrives — the "reject/flag dupes before they land in the lake"
    shape, versus the batch pipeline's nightly sweep. Pairs colliding
    in several bands are deduplicated read-side (the estimate is a
    pure function of the two signatures, so max == the value). State
    per bucket is HARD-BOUNDED at _LSH_ROSTER_CAP anchors + one
    overflow counter, so a hot boilerplate bucket cannot grow state
    or per-arrival emission forever. Oracle: the batch LSH
    candidate+estimate pipeline (exact parity holds while no bucket
    exceeds the cap — 8x headroom at sf0.1)."""
    src = _streaming_documents(spark, sf_dir)
    sig = _stream_minhash_sig(src).filter(F.col("m0").isNotNull())
    band_key = F.explode(
        F.array(
            *[
                F.concat_ws(
                    ",",
                    F.lit(f"{b}:").alias("p"),
                    *[F.col(f"m{b * 4 + r}") for r in range(4)],
                )
                for b in range(4)
            ]
        )
    )
    banded = sig.withColumn("band_key", band_key)
    out = banded.groupBy("band_key").applyInPandasWithState(
        _lsh_bucket_fold,
        outputStructType="doc_a long, doc_b long, est_jaccard double",
        stateStructType="roster string",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    tbl = run_to_table(out, "append", spark)
    return tbl.groupBy("doc_a", "doc_b").agg(
        F.max("est_jaccard").alias("est_jaccard")
    )


def _ingest_oracle() -> str:
    from streamz_postgres_spark.operators.dedup import (
        _sql_band_keys,
        _sql_est_jaccard,
        _sql_minhash_signature,
    )

    return f"""
WITH sig AS ({_sql_minhash_signature()}),
bands AS (
  {_sql_band_keys()}
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band_key = b.band_key AND a.doc_id < b.doc_id
)
SELECT c.doc_a, c.doc_b, {_sql_est_jaccard()} AS est_jaccard
FROM cand c
JOIN sig sa ON sa.doc_id = c.doc_a
JOIN sig sb ON sb.doc_id = c.doc_b
"""


register(
    "q_stream_dedup_ingest",
    oracle=_ingest_oracle(),
    tags=("streaming", "dedup", "lsh", "stateful"),
)(q_stream_dedup_ingest)


# -- live benchmark-contamination guard -------------------------------------


def _contamination_oracle() -> str:
    import streamz_postgres_spark.operators.pipeline  # noqa: F401

    from streamz_postgres_spark.registry import REGISTRY

    return REGISTRY["q_contamination"].oracle


def q_stream_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIVE eval-set contamination guard: incoming corpus documents
    are checked against the STATIC benchmark shingle set as they
    arrive — flag (or quarantine) leakage before it lands in
    training data, versus the batch pipeline's after-the-fact scan.
    The benchmark side is a bounded static table (broadcast into
    every micro-batch: the stream-static join shape); the stream
    side explodes each doc's DISTINCT shingles row-locally
    (array_distinct before explode — no stream-side dedup state),
    and the per-doc hit count is an ordinary streaming aggregation.
    Identical oracle to batch q_contamination."""
    from streamz_postgres_spark.catalog import load_table
    from streamz_postgres_spark.functions.text_features import (
        shingles,
        tokens,
    )
    from streamz_postgres_spark.operators.pipeline import (
        _BENCH_MOD,
        _CONTAM_NGRAM,
    )

    bench = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % _BENCH_MOD == 0)
        .select(
            F.explode(shingles(tokens("text"), _CONTAM_NGRAM)).alias("shingle")
        )
        .distinct()
    )
    src = _streaming_documents(spark, sf_dir).filter(
        F.col("doc_id") % _BENCH_MOD != 0
    )
    hits = (
        src.select(
            "doc_id",
            F.explode(
                F.array_distinct(shingles(tokens("text"), _CONTAM_NGRAM))
            ).alias("shingle"),
        )
        .join(F.broadcast(bench), "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return run_to_table(hits, "complete", spark)


register(
    "q_stream_contamination",
    oracle=_contamination_oracle(),
    tags=("streaming", "pipeline", "dedup"),
)(q_stream_contamination)


# -- streaming half-life-decayed engagement ----------------------------------


def _decay_oracle() -> str:
    # importing the module runs @register for q_decay_score, whose
    # oracle (fixed anchor, exact power-of-two decay) applies verbatim
    import streamz_postgres_spark.operators.timewindows  # noqa: F401

    from streamz_postgres_spark.registry import REGISTRY

    return REGISTRY["q_decay_score"].oracle


@register(
    "q_stream_decay_score",
    oracle=_decay_oracle(),
    tags=("streaming", "time", "agg", "analytics"),
)
def q_stream_decay_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIVE half-life-decayed engagement: because the decay anchor is
    FIXED (never wall-clock), each event's contribution
    value x 2^(-age_days) is a STATIC per-row value — so the decayed
    score is an ordinary associative sum and the stream maintains it
    as a complete-mode aggregation with exact decimal merge, no
    custom state. (A wall-clock 'now' would instead be a read-side
    multiply by 2^(-Δ) on the same state — decay by a fixed anchor
    commutes with reading at any later time, which is exactly why
    production decayed counters store anchor-relative sums.) State is
    two scalars per user; identical oracle to the batch twin."""
    from streamz_postgres_spark.functions.numeric import dsum
    from streamz_postgres_spark.operators.timewindows import (
        _DECAY_ANCHOR,
        _DECAY_EPOCH,
        _DECAY_MAX_K,
    )

    s = replay_events(spark, sf_dir)
    es = F.expr(
        f"timestampdiff(SECOND, TIMESTAMP_NTZ '{_DECAY_EPOCH}', ts)"
    )
    anchor_es = F.expr(
        f"timestampdiff(SECOND, TIMESTAMP_NTZ '{_DECAY_EPOCH}', "
        f"TIMESTAMP_NTZ '{_DECAY_ANCHOR}')"
    )
    # [0, 62] clamp mirrors the batch twin (round-6 advisor): late
    # data past the anchor must not hit Spark's masked shift count.
    k = F.greatest(
        F.least(
            (anchor_es / 86400).cast("bigint") - (es / 86400).cast("bigint"),
            F.lit(_DECAY_MAX_K),
        ),
        F.lit(0),
    )
    decayed = F.col("value") / F.expr(
        "CAST(shiftleft(CAST(1 AS BIGINT), CAST(k AS INT)) AS DOUBLE)"
    )
    agg = (
        s.withColumn("k", k)
        .select("user_id", decayed.alias("dv"))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("dv").alias("decay_score"),
        )
    )
    return run_to_table(agg, "complete", spark)


# -- live mixture guard (domain shares vs spec, at ingestion time) -----------

#: relative drift tolerance: alert when a source's live share is
#: more than 25% away from the uniform target share
_MIX_GUARD_TOL_PCT = 25


@register(
    "q_stream_mixture_guard",
    oracle=f"""
WITH counts AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents
  GROUP BY source
),
tot AS (
  SELECT CAST(SUM(n_docs) AS BIGINT) AS total,
         CAST(COUNT(*) AS BIGINT) AS n_sources
  FROM counts
)
SELECT c.source, c.n_docs,
       CAST(c.n_docs AS DOUBLE) / t.total AS share,
       CAST(1 AS DOUBLE) / t.n_sources AS target_share,
       CAST(CASE WHEN ABS(c.n_docs * t.n_sources * 100
                          - t.total * 100)
                      > t.total * {_MIX_GUARD_TOL_PCT}
                 THEN 1 ELSE 0 END AS INTEGER) AS drift_alert
FROM counts c CROSS JOIN tot t
ORDER BY c.source
""",
    tags=("streaming", "corpus", "pipeline", "monitoring"),
)
def q_stream_mixture_guard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIVE mixture guard: as corpus documents stream in, maintain
    per-source counts (complete-mode agg — one BIGINT of state per
    source) and flag any source whose live share has drifted more
    than 25% relative from the uniform target — the "is the
    crawler suddenly 80% one domain" alarm that pairs with the batch
    rebalancer (q_mixture_rebalance fixes the mixture; this guard
    notices it breaking, before the batch job runs). The drift test
    is PURE INTEGER arithmetic (|n*K*100 - total*100| > total*tol —
    no float threshold comparison can flap across engines); the
    share columns are single divisions of exact integers, read-side
    only."""
    src = _streaming_documents(spark, sf_dir)
    agg = src.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )
    tbl = run_to_table(agg, "complete", spark)
    tot = tbl.agg(
        F.sum("n_docs").cast("bigint").alias("total"),
        F.count(F.lit(1)).cast("bigint").alias("n_sources"),
    )
    drift = (
        F.abs(
            F.col("n_docs") * F.col("n_sources") * 100
            - F.col("total") * 100
        )
        > F.col("total") * _MIX_GUARD_TOL_PCT
    )
    return (
        tbl.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            (F.col("n_docs").cast("double") / F.col("total")).alias("share"),
            (F.lit(1.0) / F.col("n_sources")).alias("target_share"),
            drift.cast("int").alias("drift_alert"),
        )
        .orderBy("source")
    )


# -- live vocabulary-novelty monitor -----------------------------------------


def _vocab_novelty_fold(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-source streaming vocabulary roster: each arriving doc (in
    doc_id order within the batch) reports how many distinct word
    types it carries and how many of those are NEW versus every
    earlier doc of the same source, then joins the roster. The roster
    is the exact seen-type set (JSON-sorted in state for stable
    round-trips); it grows with the source's VOCABULARY — sublinear
    in docs by Heaps' law — not with the document stream. A 100 TB
    deployment swaps the exact set for a Bloom filter at the same
    fold shape (novelty then carries the filter's false-positive
    rate; the exact form here is what the oracle can value-check)."""
    import json

    roster = set(json.loads(state.get[0])) if state.exists else set()
    pdf = pd.concat(list(batches), ignore_index=True).sort_values(
        "doc_id"
    ).reset_index(drop=True)
    ids, n_types, n_new = [], [], []
    for _, row in pdf.iterrows():
        # a NULL document has no token rows in the oracle's unnest
        # and therefore no output row — str(None) would instead mint
        # a phantom 'None' type (v2 hostile find, NULL-text class)
        if pd.isna(row["text"]):
            continue
        types = set(str(row["text"]).split(" "))
        ids.append(int(row["doc_id"]))
        n_types.append(len(types))
        n_new.append(len(types - roster))
        roster |= types
    state.update((json.dumps(sorted(roster)),))
    yield pd.DataFrame(
        {
            "doc_id": pd.Series(ids, dtype="int64"),
            "source": pd.Series([key[0]] * len(ids), dtype="object"),
            "n_types": pd.Series(n_types, dtype="int64"),
            "n_new_types": pd.Series(n_new, dtype="int64"),
        }
    )


def q_stream_vocab_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIVE vocabulary-novelty monitor: as documents arrive, each one
    reports its distinct-type count and how many types its source has
    never seen before — the streaming twin of q_vocab_growth's
    checkpoints. A source whose per-doc novelty collapses toward zero
    is emitting template/boilerplate spam, and this stream is the
    alarm that fires DURING the crawl instead of at the nightly
    audit. Stateful fold per source (arrival order within a source is
    the novelty order — inherent to the semantics, so the fold
    serializes per source while sources run in parallel); state is
    the seen-type roster, bounded by the source's vocabulary (Heaps-
    sublinear), Bloom-swappable at scale. Oracle: novelty is
    first-occurrence — a type is new in doc d iff min(doc_id) over
    the source's docs containing it equals d — so the batch SQL
    reproduces every per-doc count exactly."""
    src = _streaming_documents(spark, sf_dir)
    out = src.select("source", "doc_id", "text").groupBy(
        "source"
    ).applyInPandasWithState(
        _vocab_novelty_fold,
        outputStructType="doc_id long, source string, n_types long, "
        "n_new_types long",
        stateStructType="roster string",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    tbl = run_to_table(out, "append", spark)
    # read-side redelivery collapse (v7 duplicate class): a verbatim
    # re-delivered doc emits a second row whose n_new_types is 0 (its
    # types are in the roster by then), so max() per doc recovers the
    # first-delivery truth — identical copies share n_types, and the
    # oracle's DISTINCT (source, doc_id, token) sees one doc
    return tbl.groupBy("doc_id", "source").agg(
        F.max("n_types").alias("n_types"),
        F.max("n_new_types").alias("n_new_types"),
    )


def _vocab_novelty_oracle() -> str:
    from streamz_postgres_spark.functions.text_features import sql_tokens

    return f"""
WITH toks AS (
  SELECT DISTINCT source, doc_id, w
  FROM (
    SELECT source, doc_id, unnest({sql_tokens('text')}) AS w
    FROM documents
  ) x
), firsts AS (
  SELECT source, w, MIN(doc_id) AS fd FROM toks GROUP BY source, w
)
SELECT t.doc_id, t.source,
       CAST(COUNT(*) AS BIGINT) AS n_types,
       CAST(SUM(CASE WHEN f.fd = t.doc_id THEN 1 ELSE 0 END) AS BIGINT)
         AS n_new_types
FROM toks t
-- IS NOT DISTINCT FROM: a NULL source is a real GROUP BY group in
-- the live fold (unattributed docs still stream); a plain `=` join
-- would drop its docs from the oracle (hostile-sweep v5 find)
JOIN firsts f ON f.source IS NOT DISTINCT FROM t.source AND f.w = t.w
GROUP BY t.doc_id, t.source
"""


register(
    "q_stream_vocab_novelty",
    oracle=_vocab_novelty_oracle(),
    tags=("streaming", "corpus", "stateful"),
)(q_stream_vocab_novelty)


# -- live Bloom-filter contamination guard -----------------------------------


def q_stream_bloom_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIVE Bloom-filter contamination guard — the SCALE form of
    q_stream_contamination: instead of joining arriving docs against
    the exact benchmark shingle set, each doc probes a broadcast
    m=4096-bit / k=2 Bloom filter built from it (the configuration
    q_bloom_filter_audit prices: ~1.7% measured FP rate at these
    fill levels). The probe is entirely ROW-LOCAL — distinct
    shingles, two md5 positions each, membership via a higher-order
    filter against the ONE-ROW broadcast bit set — so the stream
    never shuffles and the guard's cost per doc is O(shingles),
    independent of benchmark size. At 100 TB the bit set stays a few
    KB broadcast where the exact set would be GBs. Oracle: the
    filter is deterministic (md5 hash60 family), so the batch SQL
    reproduces every per-doc hit count bit-for-bit."""
    from streamz_postgres_spark.functions.text_features import (
        hash60,
        seeded_hash60,
        shingles,
        tokens,
    )
    from streamz_postgres_spark.operators.corpus import (
        _BLOOM_K,
        _BLOOM_M,
        _BLOOM_MOD,
        _BLOOM_N,
    )

    ref = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % _BLOOM_MOD == 0)
        .select(F.explode(shingles(tokens("text"), _BLOOM_N)).alias("s"))
        .distinct()
    )
    h1, h2 = hash60(F.col("s")), seeded_hash60(F.col("s"), 7)
    # the filter is stored PACKED: 32 bits per word, keyed by word
    # index in a map — the probe below is then O(1) per position
    # (element_at on the broadcast map) instead of a linear
    # array_contains scan of every set bit, which the 10x curve
    # measured at 12.5x wall once the filter saturated. 32-bit words
    # keep 1 << (pos % 32) inside positive int64 on both engines
    # (the house variable-shift clamp rule).
    bits = (
        ref.select(
            F.explode(
                F.array(*[(h1 + F.lit(i) * h2) % _BLOOM_M for i in range(_BLOOM_K)])
            ).alias("pos")
        )
        .distinct()
        .select(
            (F.col("pos") / 32).cast("int").alias("widx"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 32 AS INT))").alias(
                "bit"
            ),
        )
        .groupBy("widx")
        .agg(F.expr("bit_or(bit)").alias("word"))
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("widx", "word"))
            ).alias("bw")
        )
    )

    src = _streaming_documents(spark, sf_dir).filter(
        F.col("doc_id") % _BLOOM_MOD != 0
    )
    sh = F.array_distinct(shingles(tokens("text"), _BLOOM_N))

    from streamz_postgres_spark.functions.text_features import (
        spark_sql_hash60,
        spark_sql_seeded_hash60,
    )

    _h1 = spark_sql_hash60("s")
    _h2 = spark_sql_seeded_hash60("s", 7)

    def _probe(pos_expr: str) -> str:
        return (
            f"(coalesce(element_at(bw, CAST(({pos_expr}) DIV 32 AS INT)), "
            f"CAST(0 AS BIGINT)) & shiftleft(CAST(1 AS BIGINT), "
            f"CAST(({pos_expr}) % 32 AS INT))) != 0"
        )

    # bind the two hashes ONCE per shingle (r11 rule: the old form
    # expanded _h1/_h2 into every probe reference — 6 md5 evaluations
    # per shingle where 2 suffice; the probe arithmetic over the
    # bound struct fields is integer-cheap). x10 value-forced:
    # 18.8 -> measured below in SCALE.md.
    hits_expr = (
        "size(filter(transform(sh, s -> "
        f"struct(({_h1}) AS a, ({_h2}) AS b)), t -> "
        f"{_probe(f't.a % {_BLOOM_M}')} AND "
        f"{_probe(f'(t.a + t.b) % {_BLOOM_M}')}))"
    )
    # NULL text -> NULL counts: the oracle's string_split(NULL) is
    # NULL all the way down, while the Spark shingle path collapses a
    # NULL token array to an empty one (v2 hostile find, NULL-text
    # class) — gate both outputs on text IS NOT NULL explicitly
    has_text = F.col("text").isNotNull()
    probed = (
        src.select("doc_id", "text", sh.alias("sh"))
        .crossJoin(F.broadcast(bits))
        .select(
            "doc_id",
            F.when(has_text, F.size("sh")).cast("bigint").alias("n_shingles"),
            F.when(has_text, F.expr(hits_expr))
            .cast("bigint")
            .alias("n_bloom_hits"),
        )
    )
    return run_to_table(probed, "append", spark)


def _bloom_ingest_oracle() -> str:
    from streamz_postgres_spark.functions.text_features import (
        sql_hash60,
        sql_seeded_hash60,
        sql_shingles,
        sql_tokens,
    )
    from streamz_postgres_spark.operators.corpus import (
        _BLOOM_M,
        _BLOOM_MOD,
        _BLOOM_N,
    )

    h1 = sql_hash60("s")
    h2 = sql_seeded_hash60("s", 7)
    lh1 = sql_hash60("ls")
    lh2 = sql_seeded_hash60("ls", 7)
    return f"""
WITH ref AS (
  SELECT DISTINCT s FROM (
    SELECT unnest({sql_shingles(sql_tokens('text'), _BLOOM_N)}) AS s
    FROM documents WHERE doc_id % {_BLOOM_MOD} = 0
  ) t
), bits AS (
  SELECT DISTINCT ({h1} + i * {h2}) % {_BLOOM_M} AS pos
  FROM ref CROSS JOIN (SELECT unnest([0, 1]) AS i) k
), bitset AS (SELECT list(pos) AS bs FROM bits),
probe AS (
  SELECT doc_id,
         list_distinct({sql_shingles(sql_tokens('text'), _BLOOM_N)}) AS sh
  FROM documents WHERE doc_id % {_BLOOM_MOD} <> 0
)
SELECT doc_id,
       CAST(len(sh) AS BIGINT) AS n_shingles,
       CAST(len(list_filter(sh, ls ->
           list_contains(bs, {lh1} % {_BLOOM_M})
           AND list_contains(bs, ({lh1} + {lh2}) % {_BLOOM_M})))
         AS BIGINT) AS n_bloom_hits
FROM probe CROSS JOIN bitset
"""


register(
    "q_stream_bloom_ingest",
    oracle=_bloom_ingest_oracle(),
    tags=("streaming", "corpus", "sketch"),
)(q_stream_bloom_ingest)
