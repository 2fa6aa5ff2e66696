"""Streaming-mode operators, oracle-checked via bounded replay.

Each q_stream_* runs a REAL Structured Streaming query (file-stream
source, state stores, output modes, availableNow trigger) over the
events fixture and returns the materialized sink table; the oracle
is the same SQL as the batch twin, so the driver value-checks true
streaming execution, not a batch re-expression.

streamz parity (SURVEY §2.3/§2.5): timed_window -> q_stream_tumbling;
SDF rolling -> q_stream_sliding; groupby().agg() in update mode ->
q_stream_latest_per_key; unique -> q_stream_dedup; accumulate (per-
key stateful fold) -> q_stream_accumulate (applyInPandasWithState);
stream-stream join within time bound -> q_stream_interval_join.

Watermark policy: bounded replays run in complete/append modes that
do not drop data, keeping results equal to batch semantics (streamz
has no watermarks — SURVEY §2.3 flags this divergence); production
jobs add ``withWatermark`` to bound state, documented per query.

CDC queries (q_cdc_*) drive sources/cdc.py: envelope round-trip,
latest-wins apply with deletes, and snapshot diffing.
"""

from __future__ import annotations

from contextlib import contextmanager
from decimal import ROUND_HALF_EVEN, Decimal
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from streamz_postgres_spark.catalog import load_table
from streamz_postgres_spark.functions.numeric import micro6, sql_dsum
from streamz_postgres_spark.registry import register
from streamz_postgres_spark.sources.cdc import (
    ParquetReplayLoader,
    apply_changes,
    full_refresh_diff,
    to_envelope,
)
from streamz_postgres_spark.streaming.runner import replay_events, run_to_table

#: target dirs of the most recent q_cdc_materialize invocation —
#: released at the start of the next one (the returned DataFrame
#: reads its final snapshot lazily, so the call can't clean its own)
_MATERIALIZE_DIRS: list = []


@register(
    "q_stream_tumbling",
    oracle=f"""
SELECT date_trunc('hour', ts) AS window_start,
       event_type,
       COUNT(*) AS n_events,
       {sql_dsum('value')} AS sum_value
FROM events
GROUP BY date_trunc('hour', ts), event_type
""",
    tags=("streaming", "time"),
)
def q_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window agg as a streaming query (complete mode).
    Production: update mode + withWatermark('ts', <delay>) bounds
    window state; complete mode here keeps bounded-replay results
    identical to batch."""
    from streamz_postgres_spark.functions.numeric import dsum

    s = replay_events(spark, sf_dir)
    out = (
        s.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
    return run_to_table(out, "complete", spark)


@register(
    "q_stream_topk",
    oracle="""
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS window_start, event_type,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events
  GROUP BY date_trunc('hour', ts), event_type
)
SELECT window_start, event_type, n_events, rn
FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY window_start
              ORDER BY n_events DESC, event_type) AS BIGINT) AS rn
  FROM hourly
) t
WHERE rn <= 3
""",
    tags=("streaming", "time", "topk"),
)
def q_stream_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIVE top-3 event types per hourly window: the trending-items
    dashboard query. The STREAM maintains the per-(window, type)
    counts (the only state — O(windows x types), watermark-bounded in
    production); the rank is a read-side window over the tiny
    materialized state, recomputed per refresh because a row's rank
    can change with every micro-batch — ranking inside the stream
    would need update-mode re-emission of whole windows, the classic
    top-k-in-streaming trap. Deterministic tie-break (count desc,
    then type) keeps the cut line engine-stable."""
    s = replay_events(spark, sf_dir)
    agg = (
        s.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
        )
    )
    tbl = run_to_table(agg, "complete", spark)
    rn = F.row_number().over(
        Window.partitionBy("window_start").orderBy(
            F.col("n_events").desc(), "event_type"
        )
    )
    return tbl.withColumn("rn", rn.cast("long")).filter(F.col("rn") <= 3)


@register(
    "q_stream_sliding",
    oracle=f"""
WITH b AS (
  SELECT time_bucket(INTERVAL '30 minutes', ts) AS bucket, value FROM events
), assigned AS (
  SELECT bucket AS window_start, value FROM b
  UNION ALL
  SELECT bucket - INTERVAL '30 minutes' AS window_start, value FROM b
)
SELECT window_start, COUNT(*) AS n_events, {sql_dsum('value')} AS sum_value
FROM assigned
GROUP BY window_start
""",
    tags=("streaming", "time"),
)
def q_stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window agg (1h window / 30min slide), streaming."""
    from streamz_postgres_spark.functions.numeric import dsum

    s = replay_events(spark, sf_dir)
    out = (
        s.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value").alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "sum_value")
    )
    return run_to_table(out, "complete", spark)


@register(
    "q_stream_tumbling_watermarked",
    oracle=f"""
SELECT date_trunc('hour', ts) AS window_start,
       COUNT(*) AS n_events,
       {sql_dsum('value')} AS sum_value
FROM events
GROUP BY date_trunc('hour', ts)
""",
    tags=("streaming", "time", "watermark"),
)
def q_stream_tumbling_watermarked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling window WITH a declared watermark in append mode —
    the production shape: window state is dropped (and the final row
    emitted) only once the watermark passes the window end. Append
    mode withholds the window containing max(ts) forever on a
    bounded input, so the replay stages the events file plus one
    synthetic far-future flush row: the watermark jumps past every
    real window (all emit) while the flush row's own window stays
    withheld — the standard end-of-stream flush for append-mode
    verification. The flush row never reaches the output."""
    import shutil

    from streamz_postgres_spark.functions.numeric import dsum
    from streamz_postgres_spark.streaming.runner import staged_replay_with_flush

    s, staging = staged_replay_with_flush(spark, sf_dir)
    # watermarks require TimestampType; build the instant from epoch
    # micros (tz-free both ways: NTZ -> micros -> instant, and the
    # output instant -> micros -> NTZ) so the UTC-aligned hour grid
    # and emitted wall clocks are session-timezone-independent
    micros = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    )
    out = (
        s.withColumn("ts_evt", F.timestamp_micros(micros))
        .withWatermark("ts_evt", "0 seconds")
        .groupBy(F.window("ts_evt", "1 hour").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value").alias("sum_value"),
        )
        .select(
            F.expr(
                "timestampadd(MICROSECOND, unix_micros(w.start), "
                "TIMESTAMP_NTZ '1970-01-01 00:00:00')"
            ).alias("window_start"),
            "n_events",
            "sum_value",
        )
        # defensive: the flush window is withheld by the watermark,
        # but make the contract explicit
        .filter(F.col("window_start") < F.lit("2024-06-01").cast("timestamp_ntz"))
    )
    try:
        result = run_to_table(out, "append", spark)
    finally:
        shutil.rmtree(staging, ignore_errors=True)
    return result


@register(
    "q_stream_session",
    oracle=f"""
WITH flagged AS (
  SELECT user_id, ts, value,
    CASE WHEN lag(ts) OVER w IS NULL
              OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
         THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), numbered AS (
  SELECT user_id, ts, value,
    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
)
SELECT user_id,
       MIN(ts) AS session_start,
       MAX(ts) + INTERVAL 30 MINUTE AS session_end,
       COUNT(*) AS n_events,
       {sql_dsum('value')} AS sum_value
FROM numbered
GROUP BY user_id, session_id
""",
    tags=("streaming", "session"),
)
def q_stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-min gap) as a streaming stateful agg —
    the operator streamz lacks entirely (SURVEY §2.3): merging
    session state lives in the state store, keyed by user."""
    from streamz_postgres_spark.functions.numeric import dsum

    s = replay_events(spark, sf_dir)
    out = (
        s.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value").alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )
    return run_to_table(out, "complete", spark)


@register(
    "q_stream_latest_per_key",
    oracle="""
SELECT user_id,
       arg_max(value, event_id) AS latest_value,
       max(event_id)            AS latest_event_id
FROM events
GROUP BY user_id
""",
    tags=("streaming", "cdc"),
)
def q_stream_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """streamz ``latest()`` in true streaming form: per-key max_by
    aggregate, complete mode (= SDF emit-updated-aggregate)."""
    s = replay_events(spark, sf_dir)
    out = s.groupBy("user_id").agg(
        F.max_by("value", "event_id").alias("latest_value"),
        F.max("event_id").alias("latest_event_id"),
    )
    return run_to_table(out, "complete", spark)


@register(
    "q_stream_dedup",
    oracle="SELECT DISTINCT user_id, event_type FROM events",
    tags=("streaming", "dedup"),
)
def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming first-occurrence dedup (streamz ``unique`` parity):
    dropDuplicates keyed state emits one row per key. The key SET is
    deterministic (which row represents it is arrival-order, so only
    keys are emitted). Production uses
    dropDuplicatesWithinWatermark to bound the seen-set, mirroring
    streamz's ``unique(maxsize)`` bounded history."""
    s = replay_events(spark, sf_dir)
    out = s.dropDuplicates(["user_id", "event_type"]).select(
        "user_id", "event_type"
    )
    return run_to_table(out, "append", spark)


@register(
    "q_stream_static_join",
    oracle="""
SELECT c_mktsegment,
       COUNT(*) AS n_events,
       CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_purchases
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY c_mktsegment
""",
    tags=("streaming", "join"),
)
def q_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment join — the most common production
    streaming pattern (events stream joined to a slowly-changing
    dimension) and the streaming face of streamz's per-event lookup
    maps. The static side is a broadcast hash join probed per
    micro-batch with NO stream state (unlike stream-stream joins);
    at 100 TB/day of events the dim stays broadcast and the stream
    side never shuffles before the join."""
    s = replay_events(spark, sf_dir)
    dim = F.broadcast(
        load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    )
    out = (
        s.join(dim, s["user_id"] == dim["c_custkey"])
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).cast("long").alias("n_purchases"),
        )
    )
    return run_to_table(out, "complete", spark)


@register(
    "q_stream_dedup_watermarked",
    oracle="SELECT DISTINCT user_id, event_type FROM events",
    tags=("streaming", "dedup", "watermark"),
)
def q_stream_dedup_watermarked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION form of streaming dedup:
    dropDuplicatesWithinWatermark bounds the seen-set by event time —
    state for a key is dropped once the watermark passes it, which is
    what makes infinite-stream dedup feasible (plain dropDuplicates
    state grows forever; streamz ``unique(maxsize)`` bounds by count,
    this bounds by time). The delay (60d) exceeds the fixture's 30-day
    span, so no key expires mid-replay and the output is exactly
    DISTINCT — the same oracle as q_stream_dedup, now with bounded
    state semantics exercised."""
    s = replay_events(spark, sf_dir)
    micros = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    )
    out = (
        s.withColumn("ts_evt", F.timestamp_micros(micros))
        .withWatermark("ts_evt", "60 days")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
        .select("user_id", "event_type")
    )
    return run_to_table(out, "append", spark)


@register(
    "q_stream_interval_join",
    oracle="""
SELECT c.event_id AS click_id, c.user_id,
       p.event_id AS purchase_id, p.value AS purchase_value
FROM (SELECT * FROM events WHERE event_type = 'click') c
JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON c.user_id = p.user_id
 AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
""",
    tags=("streaming", "join"),
)
def q_stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join: purchases within 30 min after a
    click, same user — the Spark-native form of the zip/combine
    compositions streamz users build (SURVEY §2.4). Watermarks bound
    join state in production; inner-join emission itself is
    watermark-independent, so the bounded replay emits every match."""
    s = replay_events(spark, sf_dir)
    clicks = s.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id"),
        F.col("ts").alias("c_ts"),
    )
    purchases = s.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        F.col("value").alias("purchase_value"),
    )
    out = clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 30 MINUTE")),
    ).select("click_id", "user_id", "purchase_id", "purchase_value")
    return run_to_table(out, "append", spark)


@register(
    "q_stream_join_outer",
    oracle="""
SELECT c.event_id AS click_id, c.user_id,
       p.event_id AS purchase_id, p.value AS purchase_value
FROM (SELECT * FROM events
      WHERE event_type = 'click'
        AND ts < TIMESTAMP '2024-01-29 00:00:00') c
LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON c.user_id = p.user_id
 AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
""",
    tags=("streaming", "join", "watermark"),
)
def q_stream_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream LEFT OUTER interval join: every click, paired
    with its within-30-min purchases or a null row if none came.
    Unlike the inner join, outer emission is watermark-DRIVEN: a
    click's null row may only surface once the watermark proves no
    matching purchase can still arrive, so both inputs carry
    watermarks and the left side is restricted to clicks at least a
    day older than the replay's end — the availableNow run then
    flushes every pending state row (Spark keeps running no-data
    batches while eviction is possible) and the result equals the
    batch LEFT JOIN the oracle computes. Production keeps the same
    query without the cutoff and accepts tail rows emitting on the
    NEXT trigger. State: bounded by watermark + 30-min condition."""
    s = replay_events(spark, sf_dir)
    # watermarks require TimestampType; NTZ -> epoch micros ->
    # instant is tz-free in both directions (same trick as the
    # watermarked tumbling query), and no timestamp is emitted so
    # nothing converts back
    micros = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    )
    # Catalyst pushes the branch filters below this shared watermark
    # node, so the watermark clock tracks the FILTERED union of both
    # branches (clicks<cutoff ∪ purchases), NOT the raw stream. The
    # purchase branch runs to the stream's end (Jan 30), which keeps
    # the final watermark a day past the click cutoff — every
    # pre-cutoff click is then provably match-less and its null row
    # flushes. A query that cut off BOTH branches would silently
    # withhold the last ~30 min of null rows; q_stream_join_full
    # documents that trap and its flush-row fix.
    s = s.withColumn("ts_evt", F.timestamp_micros(micros)).withWatermark(
        "ts_evt", "1 minute"
    )
    clicks = (
        s.filter(
            (F.col("event_type") == "click")
            & (F.col("ts") < F.lit("2024-01-29 00:00:00").cast("timestamp_ntz"))
        )
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id"),
            F.col("ts_evt").alias("c_ts"),
        )
    )
    purchases = (
        s.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts_evt").alias("p_ts"),
            F.col("value").alias("purchase_value"),
        )
    )
    out = clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 30 MINUTE")),
        "left_outer",
    ).select("click_id", "user_id", "purchase_id", "purchase_value")
    return run_to_table(out, "append", spark)


@register(
    "q_stream_join_full",
    oracle="""
SELECT c.event_id AS click_id, c.user_id AS click_user,
       p.event_id AS purchase_id, p.user_id AS purchase_user,
       p.value AS purchase_value
FROM (SELECT * FROM events
      WHERE event_type = 'click'
        AND ts < TIMESTAMP '2024-01-29 00:00:00') c
FULL JOIN (SELECT * FROM events
           WHERE event_type = 'purchase'
             AND ts < TIMESTAMP '2024-01-29 00:00:00') p
  ON c.user_id = p.user_id
 AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
""",
    tags=("streaming", "join", "watermark"),
)
def q_stream_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream FULL OUTER interval join — the hardest join
    case: BOTH sides hold state and BOTH emit watermark-proven null
    rows (a click with no purchase within 30 min, and a purchase no
    click preceded).

    The watermark trap this query exists to pin down: Catalyst
    pushes the branch filters BELOW a shared ``withWatermark`` node,
    so the watermark clock tracks max(event time) of the FILTERED
    union, not the raw stream. With both branches cut off at Jan 29
    the watermark caps ~1 min below the cutoff and every click in
    the last 30 min before it is never provably match-less — its
    null row stays in state forever (measured: exactly the latest
    unmatched click went missing). The replay therefore stages the
    events file plus one far-future flush CLICK (user_id -1, ts
    past all data) that survives the click branch's filter and
    drags the watermark past every real row; the flush row's OWN
    null emission needs wm > flush_ts + 30 min, which the final
    wm = flush_ts - delay never reaches, so it stays withheld (the
    same end-of-stream-flush idiom as q_stream_tumbling_watermarked,
    plus a defensive output filter). Production equivalents: idle-
    source watermark advance or heartbeat events. Per-side state is
    bounded by watermark + the 30-min condition."""
    import shutil

    from streamz_postgres_spark.streaming.runner import staged_replay_with_flush

    s, staging = staged_replay_with_flush(spark, sf_dir, event_type="click")
    micros = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    )
    s = s.withColumn("ts_evt", F.timestamp_micros(micros)).withWatermark(
        "ts_evt", "1 minute"
    )
    cutoff = F.col("ts") < F.lit("2024-01-29 00:00:00").cast("timestamp_ntz")
    clicks = s.filter(
        (F.col("event_type") == "click") & (cutoff | (F.col("user_id") == -1))
    ).select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("click_user"),
        F.col("ts_evt").alias("c_ts"),
    )
    purchases = s.filter((F.col("event_type") == "purchase") & cutoff).select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("purchase_user"),
        F.col("ts_evt").alias("p_ts"),
        F.col("value").alias("purchase_value"),
    )
    out = (
        clicks.join(
            purchases,
            (F.col("click_user") == F.col("purchase_user"))
            & (F.col("p_ts") >= F.col("c_ts"))
            & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 30 MINUTE")),
            "full_outer",
        )
        # defensive: the flush click's null row is withheld by the
        # watermark; make the contract explicit
        .filter(F.col("click_user").isNull() | (F.col("click_user") != -1))
        .select(
            "click_id",
            "click_user",
            "purchase_id",
            "purchase_user",
            "purchase_value",
        )
    )
    try:
        return run_to_table(out, "append", spark)
    finally:
        shutil.rmtree(staging, ignore_errors=True)


def _running_totals(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-key stateful fold (streamz ``accumulate`` parity).

    State: (count, exact decimal sum as string). Rows are processed
    in event_id order; the decimal accumulator makes the emitted
    running sums bit-equal to the oracle's decimal window sum.
    """
    if state.exists:
        n, acc_str = state.get
        acc = Decimal(acc_str)
    else:
        n, acc = 0, Decimal(0)
    six = Decimal("0.000001")
    # concatenate BEFORE sorting: a large group arrives as several
    # Arrow chunks and per-chunk sorting would accumulate out of
    # global event order (running values are order-sensitive)
    pdf = pd.concat(list(batches), ignore_index=True).sort_values("event_id")
    sums = []
    for v in pdf["value"]:
        acc += Decimal(float(v)).quantize(six, rounding=ROUND_HALF_EVEN)
        n += 1
        sums.append((float(acc), n))
    state.update((n, str(acc)))
    yield pd.DataFrame(
        {
            "user_id": pdf["user_id"],
            "event_id": pdf["event_id"],
            "value": pdf["value"],
            "running_sum": [s for s, _ in sums],
            "running_n": [c for _, c in sums],
        }
    )


@register(
    "q_stream_accumulate",
    oracle="""
SELECT user_id, event_id, value,
  CAST(SUM(CAST(value AS DECIMAL(38,6)))
       OVER (PARTITION BY user_id ORDER BY event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
    AS running_sum,
  COUNT(*) OVER (PARTITION BY user_id ORDER BY event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    AS running_n
FROM events
""",
    tags=("streaming", "stateful", "udf"),
)
def q_stream_accumulate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary per-key streaming state via applyInPandasWithState:
    running (sum, count) per user emitted per event — the direct
    analogue of streamz ``accumulate(func, start)``. State is two
    scalars per key (bounded); batches arrive via Arrow."""
    s = replay_events(spark, sf_dir)
    out = s.groupBy("user_id").applyInPandasWithState(
        _running_totals,
        outputStructType=(
            "user_id long, event_id long, value double, "
            "running_sum double, running_n long"
        ),
        stateStructType="n long, acc string",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return run_to_table(out, "append", spark)


class _UserTotalsProcessor:
    """transformWithState processor: per-key (count, exact decimal
    sum) in a ValueState, emitting the updated totals per batch —
    the Spark 4 successor to applyInPandasWithState and the richest
    analogue of streamz ``accumulate`` (typed state, timers, TTL)."""

    def init(self, handle) -> None:
        from pyspark.sql.types import (
            LongType,
            StringType,
            StructField,
            StructType,
        )

        # first point our code runs inside the worker: make the pb2
        # runtime importable before any state-server call needs it
        from streamz_postgres_spark.protobuf_shim import install

        install()
        self._state = handle.getValueState(
            "totals",
            StructType(
                [
                    StructField("n", LongType()),
                    StructField("acc", StringType()),
                ]
            ),
        )

    def handleInputRows(self, key, rows, timerValues):
        if self._state.exists():
            n, acc_str = self._state.get()
            acc = Decimal(acc_str)
        else:
            n, acc = 0, Decimal(0)
        for pdf in rows:
            for v in pdf["value"]:
                acc += micro6(float(v))
                n += 1
        self._state.update((n, str(acc)))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "sum_value": [float(acc)]}
        )

    def close(self) -> None:
        pass


def _protobuf_available() -> bool:
    """transformWithStateInPandas speaks protobuf to the JVM; the
    query registers when a runtime is importable OR alias-able from
    the system's vendored pure-Python copy (protobuf_shim.py);
    applyInPandasWithState covers arbitrary streaming state
    regardless, see q_stream_accumulate."""
    from streamz_postgres_spark.protobuf_shim import available

    return available()


@contextmanager
def _tws_environment(spark: SparkSession) -> Iterator[None]:
    """Scope the transformWithStateInPandas execution environment to
    one query, shared by all five TWS queries:

    - vendored protobuf runtime + this library on the WORKER
      PYTHONPATH (``sc.environment`` is captured at UDF creation
      inside transformWithStateInPandas, and the TWS schema-check
      worker touches pb2 before any user code runs);
    - the RocksDB state-store provider (TWS state uses multiple
      column families, which only RocksDB supports; the engine
      session pins it globally but the external driver's plain
      session does not).

    Both are restored to the caller's values on exit — unset confs
    read via ``conf.get(key, None)`` so nothing but genuinely-unset
    is swallowed."""
    from streamz_postgres_spark.protobuf_shim import install, worker_pythonpath

    if not install():  # pragma: no cover - registration already gated
        raise RuntimeError("no protobuf runtime available")
    env = spark.sparkContext.environment
    prev = env.get("PYTHONPATH")
    env["PYTHONPATH"] = worker_pythonpath(prev)
    provider_key = "spark.sql.streaming.stateStore.providerClass"
    rocksdb = (
        "org.apache.spark.sql.execution.streaming."
        "state.RocksDBStateStoreProvider"
    )
    prev_provider = spark.conf.get(provider_key, None)
    spark.conf.set(provider_key, rocksdb)
    try:
        yield
    finally:
        if prev is None:
            env.pop("PYTHONPATH", None)
        else:
            env["PYTHONPATH"] = prev
        if prev_provider is None:
            spark.conf.unset(provider_key)
        else:
            spark.conf.set(provider_key, prev_provider)


def _latest_totals(tbl: DataFrame) -> DataFrame:
    """Collapse an update-mode memory-sink totals table to the LAST
    emission per user. The memory sink appends each micro-batch's
    update rows rather than upserting, so a multi-file fixture (more
    than one replay batch) leaves earlier cumulative emissions behind
    as stale rows; ``n_events`` is monotone per key, so max_by picks
    the final state. No-op on single-batch replays."""
    latest = tbl.groupBy("user_id").agg(
        F.max_by(F.struct("n_events", "sum_value"), F.col("n_events")).alias(
            "s"
        )
    )
    return latest.select("user_id", "s.n_events", "s.sum_value")


_TWS_ORACLE = f"""
SELECT user_id, COUNT(*) AS n_events, {sql_dsum('value')} AS sum_value
FROM events
GROUP BY user_id
"""


def q_stream_transform_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user totals via transformWithStateInPandas (Spark 4 typed
    arbitrary state): ValueState holds (count, exact decimal sum) so
    the emitted doubles match the oracle's decimal aggregation
    exactly. State is O(1) per key and survives across batches via
    the RocksDB store."""
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    cls = type(
        "UserTotalsProcessor", (StatefulProcessor,), dict(_UserTotalsProcessor.__dict__)
    )
    s = replay_events(spark, sf_dir)
    with _tws_environment(spark):
        out = s.groupBy("user_id").transformWithStateInPandas(
            statefulProcessor=cls(),
            outputStructType="user_id long, n_events long, sum_value double",
            outputMode="Update",
            timeMode="None",
        )
        return _latest_totals(run_to_table(out, "update", spark))


if _protobuf_available():  # pragma: no cover - depends on environment
    register(
        "q_stream_transform_state",
        oracle=_TWS_ORACLE,
        tags=("streaming", "stateful", "udf"),
    )(q_stream_transform_state)


# ---------------------------------------------------------------------------
# CDC queries (driving sources/cdc.py)
# ---------------------------------------------------------------------------


def _is_create(df: DataFrame) -> F.Column:
    return F.col("event_type") == "signup"


@register(
    "q_cdc_envelope",
    oracle="""
SELECT CASE WHEN event_id <= 4999 THEN 'r'
            WHEN event_type = 'signup' THEN 'c'
            ELSE 'u' END AS op,
       event_id AS seq,
       user_id AS key_user,
       value AS val
FROM events
""",
    tags=("cdc",),
)
def q_cdc_envelope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC envelope round-trip: snapshot rows become 'r' envelopes,
    incremental rows 'c'/'u'; key and payload travel as JSON and are
    parsed back out — verifying the serialize/normalize path the
    Kafka+Debezium ingestion would use. Snapshot cutoff = event_id
    4999 (half the sf0.01 fixture; scales: the cutoff is an absolute
    cursor, the oracle uses the same constant)."""
    loader = ParquetReplayLoader(spark, sf_dir, snapshot_cursor=4999)
    snap_env = to_envelope(loader.snapshot(), ["user_id"], "r")
    inc = loader.incremental(4999)
    op = F.when(_is_create(inc), "c").otherwise("u")
    inc_env = to_envelope(inc, ["user_id"], op)
    env = snap_env.unionByName(inc_env)
    return env.select(
        "op",
        "seq",
        F.get_json_object("key", "$.user_id").cast("long").alias("key_user"),
        F.get_json_object("after", "$.value").cast("double").alias("val"),
    )


@register(
    "q_cdc_apply",
    oracle="""
SELECT user_id, seq AS last_seq, val AS current_value
FROM (
  SELECT user_id, event_id AS seq, value AS val,
         CASE WHEN event_id % 10 = 0 THEN 'd' ELSE 'u' END AS op,
         row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
  FROM events
) t
WHERE rn = 1 AND op <> 'd'
""",
    tags=("cdc",),
)
def q_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-row-wins CDC apply with deletes: every 10th change is a
    DELETE; apply_changes compacts the envelope stream to current
    state and drops keys whose latest op is a delete — the canonical
    'materialize the captured table' consumer."""
    loader = ParquetReplayLoader(spark, sf_dir, snapshot_cursor=-1)
    changes = loader.incremental(-1)
    op = F.when(F.col("event_id") % 10 == 0, "d").otherwise("u")
    env = to_envelope(changes, ["user_id"], op)
    state = apply_changes(env, key="key", seq_cols=["seq"])
    return state.select(
        F.get_json_object("key", "$.user_id").cast("long").alias("user_id"),
        F.col("seq").alias("last_seq"),
        F.get_json_object("after", "$.value").cast("double").alias(
            "current_value"
        ),
    )


@register(
    "q_cdc_materialize",
    oracle="""
SELECT user_id, seq AS last_seq, val AS current_value
FROM (
  SELECT user_id, event_id AS seq, value AS val,
         CASE WHEN event_id % 10 = 0 THEN 'd' ELSE 'u' END AS op,
         row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
  FROM events
) t
WHERE rn = 1 AND op <> 'd'
""",
    tags=("cdc", "streaming", "sink"),
)
def q_cdc_materialize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE canonical reference use case end-to-end: a CDC change
    stream applied to a materialized table copy. The envelope stream
    runs through writeStream.foreachBatch; each micro-batch MERGEs
    into a parquet target (read current + union batch + latest-wins
    compaction + overwrite — the transactional-sink-free upsert;
    with Delta/Iceberg the body becomes MERGE INTO). The input is
    split into 4 files with maxFilesPerTrigger=1, so four real
    incremental merges run; the final table must equal the oracle's
    latest-row-wins state with deletes applied."""
    import os
    import shutil
    import tempfile

    from streamz_postgres_spark.catalog import load_table

    # previous invocation's target snapshots are released here (the
    # returned DataFrame reads the final snapshot lazily, so this
    # call cannot delete its own)
    while _MATERIALIZE_DIRS:
        shutil.rmtree(_MATERIALIZE_DIRS.pop(), ignore_errors=True)

    # stage the events as 4 files => 4 micro-batches / 4 merges
    staging = tempfile.mkdtemp(prefix="cdc_src_")
    target = tempfile.mkdtemp(prefix="cdc_target_")
    _MATERIALIZE_DIRS.append(target)
    target_data = os.path.join(target, "state")
    e = load_table(spark, sf_dir, "events")
    total = e.count()
    step = total // 4 + 1
    for i in range(4):
        (
            e.filter(
                (F.col("event_id") >= i * step)
                & (F.col("event_id") < (i + 1) * step)
            )
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(os.path.join(staging, f"part{i}"))
        )

    # staged parts are dirs of part-*.parquet; the batch-written ts
    # is already TimestampNTZ so the plain schema read works
    s = (
        spark.readStream.schema(e.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(staging, "part*"))
    )

    last = {"v": -1}

    def merge_batch(batch: DataFrame, epoch_id: int) -> None:
        # snapshot-versioned upsert (what Delta's MERGE does under
        # the hood): read snapshot epoch-1, merge, write snapshot
        # epoch — no overwrite-while-reading, no driver
        # materialization. The version IS the epoch_id, so a restart
        # from the checkpoint resumes against the last committed
        # snapshot instead of starting over (a driver-side counter
        # would reset to -1 and silently discard merged state), and
        # re-running a failed epoch overwrites its own snapshot —
        # idempotent. Deletes stay as TOMBSTONES so a late-arriving
        # older update for a deleted key cannot resurrect it.
        epoch = int(epoch_id)
        changes = batch.select(
            F.col("user_id"),
            F.col("event_id").alias("last_seq"),
            F.col("value").alias("current_value"),
            F.when(F.col("event_id") % 10 == 0, "d").otherwise("u").alias("op"),
        )
        sess = batch.sparkSession
        merged = changes
        prev_path = f"{target_data}_v{epoch - 1}"
        if epoch > 0 and os.path.exists(prev_path):
            merged = sess.read.parquet(prev_path).unionByName(changes)
        w = Window.partitionBy("user_id").orderBy(F.col("last_seq").desc())
        compacted = (
            merged.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        compacted.write.mode("overwrite").parquet(f"{target_data}_v{epoch}")
        last["v"] = max(last["v"], epoch)

    ckpt = tempfile.mkdtemp(prefix="cdc_ckpt_")
    try:
        q = (
            s.writeStream.foreachBatch(merge_batch)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
        shutil.rmtree(staging, ignore_errors=True)
    if last["v"] < 0:  # empty stream: no snapshot was written
        return spark.createDataFrame(
            [], "user_id long, last_seq long, current_value double"
        )
    # superseded snapshots are dead weight once the final one exists
    for v in range(last["v"]):
        shutil.rmtree(f"{target_data}_v{v}", ignore_errors=True)
    final = spark.read.parquet(f"{target_data}_v{last['v']}")
    return final.filter(F.col("op") != "d").select(
        "user_id", "last_seq", "current_value"
    )


@register(
    "q_cdc_diff",
    oracle="""
WITH keyed AS (
  SELECT event_id, user_id,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
  FROM events
),
prev AS (SELECT DISTINCT user_id, k FROM keyed WHERE event_id <= 4999),
cur  AS (SELECT DISTINCT user_id, k FROM keyed WHERE event_id > 4999)
SELECT CASE WHEN p.user_id IS NULL THEN 'c'
            WHEN c.user_id IS NULL THEN 'd' END AS op,
       coalesce(p.user_id, c.user_id) AS user_id,
       coalesce(p.k, c.k) AS k
FROM prev p
FULL JOIN cur c ON p.user_id = c.user_id AND p.k = c.k
WHERE p.user_id IS NULL OR c.user_id IS NULL
""",
    tags=("cdc",),
)
def q_cdc_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-refresh diffing — the delete-detection escape hatch
    (xmin polling can't see deletes; SURVEY §2.1). Diffs the
    (user_id, props.k) key sets active in two halves of the stream
    and emits c/d envelopes."""
    from streamz_postgres_spark.catalog import load_table

    e = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.get_json_object("props", "$.k").cast("long").alias("k"),
    )
    prev = e.filter(F.col("event_id") <= 4999).select("user_id", "k").distinct()
    cur = e.filter(F.col("event_id") > 4999).select("user_id", "k").distinct()
    diff = full_refresh_diff(prev, cur, ["user_id", "k"])
    return diff.select(
        "op",
        F.get_json_object("key", "$.user_id").cast("long").alias("user_id"),
        F.get_json_object("key", "$.k").cast("long").alias("k"),
    )


@register(
    "q_cdc_scd2",
    oracle="""
WITH ch AS (
  SELECT user_id, event_id AS seq, value AS val,
         CASE WHEN event_id % 10 = 0 THEN 'd' ELSE 'u' END AS op,
         lead(event_id) OVER (PARTITION BY user_id ORDER BY event_id)
           AS next_seq
  FROM events
)
SELECT user_id, seq AS valid_from_seq, next_seq AS valid_to_seq,
       val AS value,
       CAST(next_seq IS NULL AS INTEGER) AS is_current
FROM ch
WHERE op <> 'd'
""",
    tags=("cdc", "scd2"),
)
def q_cdc_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 history from the CDC envelope: every non-delete
    change becomes a VERSION row bounded by [its seq, the key's next
    change seq); the open-ended version is current. A delete closes
    the prior version (it bounds it via lead) without emitting one —
    so a deleted key simply has no current row, matching
    apply_changes' latest-wins semantics on the same stream.

    This is the other canonical CDC consumer next to q_cdc_apply:
    apply answers "what is the state now", SCD2 answers "what was
    true when" — an auditable dimension from the same envelope, no
    extra source support. One hash shuffle on the key + per-key sort
    for the lead window, the same cost profile as the apply; at
    100 TB both run incrementally per micro-batch with the open
    versions as the only carried state."""
    loader = ParquetReplayLoader(spark, sf_dir, snapshot_cursor=-1)
    changes = loader.incremental(-1)
    op = F.when(F.col("event_id") % 10 == 0, "d").otherwise("u")
    env = to_envelope(changes, ["user_id"], op)
    w = Window.partitionBy("key").orderBy("seq")
    hist = env.withColumn("next_seq", F.lead("seq").over(w))
    return hist.filter(F.col("op") != "d").select(
        F.get_json_object("key", "$.user_id").cast("long").alias("user_id"),
        F.col("seq").alias("valid_from_seq"),
        F.col("next_seq").alias("valid_to_seq"),
        F.get_json_object("after", "$.value").cast("double").alias("value"),
        F.col("next_seq").isNull().cast("int").alias("is_current"),
    )


@register(
    "q_stream_funnel",
    oracle="""
WITH flagged AS (
  SELECT user_id, ts, event_type,
    CASE WHEN lag(ts) OVER w IS NULL
              OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
         THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), numbered AS (
  SELECT user_id, ts, event_type,
    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
)
SELECT user_id,
       MIN(ts) AS session_start,
       CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_clicks,
       CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_purchases,
       CAST(CASE WHEN MIN(CASE WHEN event_type = 'click' THEN ts END)
                      IS NOT NULL
                  AND MAX(CASE WHEN event_type = 'purchase' THEN ts END)
                      > MIN(CASE WHEN event_type = 'click' THEN ts END)
                 THEN 1 ELSE 0 END AS INTEGER) AS converted
FROM numbered
GROUP BY user_id, session_id
""",
    tags=("streaming", "session", "funnel"),
)
def q_stream_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The conversion funnel as a LIVE streaming query: session
    windows merge in the state store as events arrive, and the
    click→purchase conversion flag is conditional aggregation inside
    each session — the real-time form of q_funnel, checked against
    the identical batch oracle. Production adds a watermark to close
    sessions and emit them incrementally (update mode); the bounded
    replay runs complete mode so the final state equals batch
    semantics exactly."""
    s = replay_events(spark, sf_dir)
    click_ts = F.min(F.when(F.col("event_type") == "click", F.col("ts")))
    purchase_ts = F.max(F.when(F.col("event_type") == "purchase", F.col("ts")))
    out = (
        s.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.sum((F.col("event_type") == "click").cast("long")).alias(
                "n_clicks"
            ),
            F.sum((F.col("event_type") == "purchase").cast("long")).alias(
                "n_purchases"
            ),
            F.coalesce(
                (click_ts.isNotNull() & (purchase_ts > click_ts)).cast("int"),
                F.lit(0),
            ).alias("converted"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "n_clicks",
            "n_purchases",
            "converted",
        )
    )
    return run_to_table(out, "complete", spark)


@register(
    "q_stream_chained_aggs",
    oracle="""
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS h, COUNT(*) AS n
  FROM events
  GROUP BY date_trunc('hour', ts)
)
SELECT CAST(date_trunc('day', h) AS TIMESTAMP) AS day_start,
       CAST(MAX(n) AS BIGINT) AS peak_hourly,
       CAST(SUM(n) AS BIGINT) AS n_events,
       CAST(COUNT(*) AS BIGINT) AS n_hours
FROM hourly
GROUP BY CAST(date_trunc('day', h) AS TIMESTAMP)
""",
    tags=("streaming", "time", "watermark", "chained"),
)
def q_stream_chained_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MULTIPLE stateful operators in one streaming query (Spark 4's
    chained time-window aggregation): hourly counts re-windowed into
    daily peak/total/coverage — two state stores, one pipeline, no
    intermediate sink. The second agg windows over the FIRST agg's
    window column (``F.window(w)`` re-windowing), so hourly rows
    flow into daily state as the watermark closes each hour, and
    each daily row emits once the watermark passes the day.
    Append-mode verification uses the staged flush row to close
    every real hour AND day; the flush row's own hour/day stay
    withheld. This is the streaming form of a rollup cascade — at
    100 TB it replaces the 'hourly job feeding a daily job' pattern
    with one query and exactly-once state."""
    import shutil

    from streamz_postgres_spark.streaming.runner import staged_replay_with_flush

    s, staging = staged_replay_with_flush(spark, sf_dir)
    micros = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    )
    hourly = (
        s.withColumn("ts_evt", F.timestamp_micros(micros))
        .withWatermark("ts_evt", "0 seconds")
        .groupBy(F.window("ts_evt", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    daily = (
        hourly.groupBy(F.window(F.col("w"), "1 day").alias("d"))
        .agg(
            F.max("n").alias("peak_hourly"),
            F.sum("n").alias("n_events"),
            F.count(F.lit(1)).cast("long").alias("n_hours"),
        )
        .select(
            F.expr(
                "timestampadd(MICROSECOND, unix_micros(d.start), "
                "TIMESTAMP_NTZ '1970-01-01 00:00:00')"
            ).alias("day_start"),
            "peak_hourly",
            "n_events",
            "n_hours",
        )
        .filter(F.col("day_start") < F.lit("2024-06-01").cast("timestamp_ntz"))
    )
    try:
        return run_to_table(daily, "append", spark)
    finally:
        shutil.rmtree(staging, ignore_errors=True)


# -- streaming EWMA ---------------------------------------------------------


def _ewma_fold(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-key recursive EWMA (decay 0.5): e_1 = x_1,
    e_t = 0.5*x_t + 0.5*e_{t-1}.

    Every step is two exact halvings plus ONE rounded add, evaluated
    in the same order as the oracle's recursive CTE — so the
    streaming fold and the SQL recursion produce bit-identical
    doubles with no decimal detour. State is a single double."""
    if state.exists:
        (prev,) = state.get
    else:
        prev = None
    pdf = pd.concat(list(batches), ignore_index=True).sort_values("event_id")
    out = []
    for v in pdf["value"]:
        x = float(v)
        prev = x if prev is None else 0.5 * x + 0.5 * prev
        out.append(prev)
    state.update((float(prev),))
    yield pd.DataFrame(
        {
            "user_id": pdf["user_id"],
            "event_id": pdf["event_id"],
            "value": pdf["value"],
            "ewma": out,
        }
    )


@register(
    "q_stream_ewma",
    oracle="""
WITH RECURSIVE t AS (
  SELECT user_id, event_id, value,
         row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
  FROM events
),
r AS (
  SELECT user_id, event_id, value, rn, value AS ewma
  FROM t WHERE rn = 1
  UNION ALL
  SELECT t.user_id, t.event_id, t.value, t.rn,
         0.5 * t.value + 0.5 * r.ewma
  FROM t JOIN r ON t.user_id = r.user_id AND t.rn = r.rn + 1
)
SELECT user_id, event_id, value, ewma FROM r
""",
    tags=("streaming", "stateful", "udf", "timeseries"),
)
def q_stream_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming per-key EWMA via applyInPandasWithState — the live
    twin of the batch q_ewma (which renormalizes a depth-8 kernel;
    here the genuinely recursive filter runs forever on one double
    of state per key). The oracle replays the identical recursion as
    a recursive CTE, row-parity down to the last bit thanks to the
    dyadic decay. This is the canonical 'smoothed metric' monitor: at
    100 TB of events the state store holds |active keys| doubles and
    every micro-batch does one Arrow round-trip per key group."""
    s = replay_events(spark, sf_dir)
    out = s.groupBy("user_id").applyInPandasWithState(
        _ewma_fold,
        outputStructType=(
            "user_id long, event_id long, value double, ewma double"
        ),
        stateStructType="prev double",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return run_to_table(out, "append", spark)


# -- streaming anomaly detection (running z-score) --------------------------


def _anomaly_fold(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-key streaming anomaly flag: each event is tested against
    the mean/variance of the PRIOR events of its key, then folded in.

    State is (n, exact 6-dp decimal sum, exact 12-dp decimal sum of
    squares) — O(1) per key forever. The flag itself is computed in
    pure double arithmetic over the exact-decimal moments, with the
    variance test algebraically cleared of divisions:

        (x*n - s)^2 * (n-1) > 9 * n * (q*n - s^2)

    (i.e. |x - mean| > 3*stddev_sample), the same expression the SQL
    oracle evaluates — every operand is an IEEE double derived from
    the same decimals, so the comparison is bit-deterministic across
    engines and partitionings."""
    six = Decimal("0.000001")
    twelve = Decimal("0.000000000001")
    if state.exists:
        n, s_str, q_str = state.get
        s, q = Decimal(s_str), Decimal(q_str)
    else:
        n, s, q = 0, Decimal(0), Decimal(0)
    pdf = pd.concat(list(batches), ignore_index=True).sort_values("event_id")
    flags, n_prevs = [], []
    for v in pdf["value"]:
        xd = float(v)
        nd, sd, qd = float(n), float(s), float(q)
        if n >= 2:
            lhs = xd * nd - sd
            flag = lhs * lhs * (nd - 1.0) > 9.0 * nd * (qd * nd - sd * sd)
        else:
            flag = False
        n_prevs.append(n)
        flags.append(flag)
        s += Decimal(xd).quantize(six, rounding=ROUND_HALF_EVEN)
        q += Decimal(xd * xd).quantize(twelve, rounding=ROUND_HALF_EVEN)
        n += 1
    state.update((n, str(s), str(q)))
    yield pd.DataFrame(
        {
            "user_id": pdf["user_id"],
            "event_id": pdf["event_id"],
            "value": pdf["value"],
            "n_prev": pd.Series(n_prevs, dtype="int64"),
            "is_anomaly": pd.Series(flags, dtype="bool"),
        }
    )


@register(
    "q_stream_anomaly",
    oracle="""
WITH t AS (
  SELECT user_id, event_id, value,
         CAST(COUNT(*) OVER (PARTITION BY user_id ORDER BY event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS BIGINT) AS n_prev,
         CAST(COALESCE(SUM(CAST(value AS DECIMAL(38,6)))
              OVER (PARTITION BY user_id ORDER BY event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS DOUBLE) AS s,
         CAST(COALESCE(SUM(CAST(value * value AS DECIMAL(38,12)))
              OVER (PARTITION BY user_id ORDER BY event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS DOUBLE) AS q
  FROM events
)
SELECT user_id, event_id, value, n_prev,
       CASE WHEN n_prev >= 2 THEN
         (value * n_prev - s) * (value * n_prev - s) * (n_prev - 1.0)
           > 9.0 * n_prev * (q * n_prev - s * s)
       ELSE FALSE END AS is_anomaly
FROM t
""",
    tags=("streaming", "stateful", "udf", "timeseries"),
)
def q_stream_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming 3-sigma anomaly monitor via applyInPandasWithState:
    each event is flagged against its key's running mean/variance so
    the alert fires IN the stream, not in a nightly batch — the live
    twin of the batch q_anomaly_zscore. State per key is three
    scalars (count + two exact decimal moments); the oracle replays
    the identical prior-window test relationally, value-parity down
    to the boolean. At 100 TB of events: state is |active keys| x 3
    scalars, one Arrow round-trip per key group per micro-batch, and
    a watermark ages out idle keys (documented divergence: bounded
    replay runs without one)."""
    s = replay_events(spark, sf_dir)
    out = s.groupBy("user_id").applyInPandasWithState(
        _anomaly_fold,
        outputStructType=(
            "user_id long, event_id long, value double, n_prev long, "
            "is_anomaly boolean"
        ),
        stateStructType="n long, s string, q string",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return run_to_table(out, "append", spark)


# -- streaming exact distinct via bitmap state ------------------------------


@register(
    "q_stream_bitmap_distinct",
    oracle="""
SELECT date_trunc('hour', ts) AS window_start, event_type,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM events
GROUP BY date_trunc('hour', ts), event_type
""",
    tags=("streaming", "agg", "bitmap"),
)
def q_stream_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct users per hourly window, maintained LIVE: the
    streaming aggregation state is one fixed-32KB bitmap per
    (window, type, id-bucket) — each micro-batch ORs new ids in, so
    state size is bounded by the id domain, not the event count, and
    never re-expands history the way a streaming COUNT(DISTINCT)
    dedup-set would. The popcount rollup over bucket bitmaps is
    read-side presentation on the tiny materialized state (batch
    q_bitmap_distinct is the same two-level pattern). Production:
    update mode + watermark closes old windows and ages their
    bitmaps out of the store."""
    s = replay_events(spark, sf_dir)
    agg = s.groupBy(
        F.window("ts", "1 hour").alias("w"),
        "event_type",
        F.expr("bitmap_bucket_number(user_id)").alias("bkt"),
    ).agg(
        F.expr("bitmap_construct_agg(bitmap_bit_position(user_id))").alias(
            "bm"
        )
    )
    tbl = run_to_table(agg, "complete", spark)
    return tbl.groupBy(
        F.col("w.start").alias("window_start"), "event_type"
    ).agg(F.sum(F.expr("bitmap_count(bm)")).cast("bigint").alias("n_users"))


# -- transformWithState: typed ListState ------------------------------------


class _RecentEventsProcessor:
    """transformWithState processor holding each user's LAST-3 events
    in a typed ListState — the bounded-buffer shape (recent-activity
    feeds, small replay caches) that ValueState can't express and
    applyInPandasWithState forces into one opaque blob. The list is
    merged, sorted, truncated per batch, so state stays 3 rows per
    key forever."""

    def init(self, handle) -> None:
        from pyspark.sql.types import (
            DoubleType,
            LongType,
            StructField,
            StructType,
        )

        from streamz_postgres_spark.protobuf_shim import install

        install()
        self._recent = handle.getListState(
            "recent",
            StructType(
                [
                    StructField("event_id", LongType()),
                    StructField("value", DoubleType()),
                ]
            ),
        )

    def handleInputRows(self, key, rows, timerValues):
        cur = [(int(r[0]), float(r[1])) for r in self._recent.get()]
        for pdf in rows:
            cur.extend(
                (int(i), float(v))
                for i, v in zip(pdf["event_id"], pdf["value"])
            )
        cur.sort()
        cur = cur[-3:]
        self._recent.put([(i, v) for i, v in cur])
        total = 0.0
        for _, v in cur:  # ascending event_id: same fold as the oracle
            total = total + v
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_recent": [len(cur)],
                "recent_ids": [",".join(str(i) for i, _ in cur)],
                "recent_sum": [total],
            }
        )

    def close(self) -> None:
        pass


def q_stream_transform_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-3 events per user via transformWithState ListState (see
    _RecentEventsProcessor). Environment pinning via
    _tws_environment. The sink is collapsed to the last emission per
    user (largest trailing id in ``recent_ids`` — the max event_id
    seen so far, monotone across batches) so a multi-file fixture's
    per-batch cumulative re-emissions can't leave stale rows."""
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    cls = type(
        "RecentEventsProcessor",
        (StatefulProcessor,),
        dict(_RecentEventsProcessor.__dict__),
    )
    s = replay_events(spark, sf_dir)
    with _tws_environment(spark):
        out = s.groupBy("user_id").transformWithStateInPandas(
            statefulProcessor=cls(),
            outputStructType=(
                "user_id long, n_recent long, recent_ids string, "
                "recent_sum double"
            ),
            outputMode="Update",
            timeMode="None",
        )
        tbl = run_to_table(out, "update", spark)
    seq = F.element_at(F.split("recent_ids", ","), -1).cast("long")
    latest = tbl.groupBy("user_id").agg(
        F.max_by(
            F.struct("n_recent", "recent_ids", "recent_sum"), seq
        ).alias("s")
    )
    return latest.select(
        "user_id", "s.n_recent", "s.recent_ids", "s.recent_sum"
    )


_TWS_LIST_ORACLE = """
WITH ranked AS (
  SELECT user_id, event_id, value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY event_id DESC) AS rk
  FROM events
),
last3 AS (SELECT user_id, event_id, value FROM ranked WHERE rk <= 3)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_recent,
       string_agg(CAST(event_id AS VARCHAR), ',' ORDER BY event_id)
         AS recent_ids,
       list_reduce(list_prepend(
         0.0, list(value ORDER BY event_id)), (x, y) -> x + y)
         AS recent_sum
FROM last3
GROUP BY user_id
"""

if _protobuf_available():  # pragma: no cover - depends on environment
    register(
        "q_stream_transform_list",
        oracle=_TWS_LIST_ORACLE,
        tags=("streaming", "stateful", "udf"),
    )(q_stream_transform_list)


# -- transformWithState: typed MapState -------------------------------------


class _TypeCountsProcessor:
    """transformWithState processor keeping per-user event-type
    counts in a typed MapState — the keyed-substate shape (counters
    per category, per-device cursors) that completes the typed-state
    triad next to ValueState (q_stream_transform_state) and
    ListState (q_stream_transform_list). State grows with DISTINCT
    types per user, not events."""

    def init(self, handle) -> None:
        from pyspark.sql.types import (
            LongType,
            StringType,
            StructField,
            StructType,
        )

        from streamz_postgres_spark.protobuf_shim import install

        install()
        self._counts = handle.getMapState(
            "type_counts",
            StructType([StructField("event_type", StringType())]),
            StructType([StructField("n", LongType())]),
        )

    def handleInputRows(self, key, rows, timerValues):
        for pdf in rows:
            for et in pdf["event_type"]:
                k = (str(et),)
                cur = (
                    self._counts.getValue(k)[0]
                    if self._counts.containsKey(k)
                    else 0
                )
                self._counts.updateValue(k, (cur + 1,))
        items = sorted(
            (k[0], v[0]) for k, v in self._counts.iterator()
        )
        yield pd.DataFrame(
            {
                "user_id": [key[0]] * len(items),
                "event_type": [t for t, _ in items],
                "n_events": [n for _, n in items],
            }
        )

    def close(self) -> None:
        pass


def q_stream_transform_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(user, event-type) counts via transformWithState MapState
    (see _TypeCountsProcessor); emitted per batch from the map, so
    the sink holds the complete per-user breakdown after replay.
    Environment pinning via _tws_environment; per-(user, type) counts
    are monotone, so the max per key is the final state even when a
    multi-file fixture replays as several batches."""
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    cls = type(
        "TypeCountsProcessor",
        (StatefulProcessor,),
        dict(_TypeCountsProcessor.__dict__),
    )
    s = replay_events(spark, sf_dir)
    with _tws_environment(spark):
        out = s.groupBy("user_id").transformWithStateInPandas(
            statefulProcessor=cls(),
            outputStructType=(
                "user_id long, event_type string, n_events long"
            ),
            outputMode="Update",
            timeMode="None",
        )
        tbl = run_to_table(out, "update", spark)
    return tbl.groupBy("user_id", "event_type").agg(
        F.max("n_events").alias("n_events")
    )


_TWS_MAP_ORACLE = """
SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n_events
FROM events
GROUP BY user_id, event_type
"""

if _protobuf_available():  # pragma: no cover - depends on environment
    register(
        "q_stream_transform_map",
        oracle=_TWS_MAP_ORACLE,
        tags=("streaming", "stateful", "udf"),
    )(q_stream_transform_map)


# -- transformWithState: event-time timers ----------------------------------


class _InactivityFlushProcessor:
    """transformWithState processor that emits a user's totals ONLY
    when the user goes quiet: every batch folds rows into ValueState
    and (re)arms an event-time timer 30 minutes past the user's last
    event; nothing is emitted inline. When the watermark passes the
    timer, handleExpiredTimer fires once, emits the summary, and
    clears the state — streamz's 'emit on timeout' idiom, impossible
    to express in applyInPandasWithState without hand-rolling timer
    bookkeeping into the state blob."""

    def init(self, handle) -> None:
        from pyspark.sql.types import (
            LongType,
            StringType,
            StructField,
            StructType,
        )

        from streamz_postgres_spark.protobuf_shim import install

        install()
        self._handle = handle
        self._state = handle.getValueState(
            "totals",
            StructType(
                [
                    StructField("n", LongType()),
                    StructField("acc", StringType()),
                ]
            ),
        )

    def handleInputRows(self, key, rows, timerValues):
        if self._state.exists():
            n, acc_str = self._state.get()
            acc = Decimal(acc_str)
        else:
            n, acc = 0, Decimal(0)
        last_ms = None
        for pdf in rows:
            for v in pdf["value"]:
                acc += micro6(float(v))
                n += 1
            batch_max = pdf["ts_evt"].max()
            ms = int(batch_max.value // 1_000_000)
            last_ms = ms if last_ms is None else max(last_ms, ms)
        self._state.update((n, str(acc)))
        for t in self._handle.listTimers():
            self._handle.deleteTimer(t)
        self._handle.registerTimer(last_ms + 30 * 60 * 1000)
        return iter(())

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        if self._state.exists():
            n, acc_str = self._state.get()
            self._state.clear()
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "sum_value": [float(Decimal(acc_str))],
                }
            )

    def close(self) -> None:
        pass


def q_stream_transform_timers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user totals emitted ONLY on 30-minute inactivity, via
    transformWithState EVENT-TIME TIMERS (see
    _InactivityFlushProcessor). The replay stages a far-future flush
    row so the final watermark expires every armed timer — each real
    user emits exactly once; the flush row's own key is dropped
    after the stateful operator (filtering it before would also
    remove it from the watermark node, the documented pushdown
    trap). Environment pinning via _tws_environment."""
    import shutil

    from streamz_postgres_spark.streaming.runner import staged_replay_with_flush

    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    cls = type(
        "InactivityFlushProcessor",
        (StatefulProcessor,),
        dict(_InactivityFlushProcessor.__dict__),
    )
    s, staging = staged_replay_with_flush(spark, sf_dir)
    micros = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    )
    src = s.withColumn("ts_evt", F.timestamp_micros(micros)).withWatermark(
        "ts_evt", "0 seconds"
    )
    from streamz_postgres_spark.streaming.runner import run_to_parquet_resumed

    try:
        with _tws_environment(spark):
            out = src.groupBy("user_id").transformWithStateInPandas(
                statefulProcessor=cls(),
                outputStructType=(
                    "user_id long, n_events long, sum_value double"
                ),
                outputMode="Update",
                timeMode="EventTime",
            ).filter(F.col("user_id") >= 0)
            # two availableNow runs over one checkpoint: the second
            # fires any timer whose end-of-stream expiry batch lost
            # the termination race (observed ~1/10 under load);
            # state checkpointing keeps the union exactly-once.
            # Sink mode is append (parquet supports nothing else);
            # the operator's Update mode is independent, and each
            # user emits exactly once on expiry anyway.
            return run_to_parquet_resumed(out, "append", spark)
    finally:
        shutil.rmtree(staging, ignore_errors=True)


if _protobuf_available():  # pragma: no cover - depends on environment
    register(
        "q_stream_transform_timers",
        oracle=_TWS_ORACLE,
        tags=("streaming", "stateful", "udf", "watermark"),
    )(q_stream_transform_timers)


# -- transformWithState: initial state bootstrap -----------------------------


class _WarmStartTotalsProcessor:
    """transformWithState processor warm-started from a batch
    snapshot: handleInitialState seeds each key's ValueState with
    pre-aggregated (count, exact decimal sum) BEFORE the first
    micro-batch, then handleInputRows folds live rows on top — the
    snapshot + incremental pattern every CDC consumer and metric
    backfill needs (rebuild state from the warehouse, then tail the
    stream). Emission happens on input, so pair with timers for keys
    that may never appear in the stream."""

    def init(self, handle) -> None:
        from pyspark.sql.types import (
            LongType,
            StringType,
            StructField,
            StructType,
        )

        from streamz_postgres_spark.protobuf_shim import install

        install()
        self._state = handle.getValueState(
            "totals",
            StructType(
                [
                    StructField("n", LongType()),
                    StructField("acc", StringType()),
                ]
            ),
        )

    def handleInitialState(self, key, initialState, timerValues) -> None:
        # arrives as a 1-row pandas frame (or a Row, per the API
        # union) — extract scalars either way
        n, acc = initialState["n"], initialState["acc"]
        if hasattr(n, "iloc"):
            n, acc = n.iloc[0], acc.iloc[0]
        self._state.update((int(n), str(acc)))

    def handleInputRows(self, key, rows, timerValues):
        if self._state.exists():
            n, acc_str = self._state.get()
            acc = Decimal(acc_str)
        else:
            n, acc = 0, Decimal(0)
        for pdf in rows:
            for v in pdf["value"]:
                acc += micro6(float(v))
                n += 1
        self._state.update((n, str(acc)))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "sum_value": [float(acc)]}
        )

    def close(self) -> None:
        pass


def q_stream_transform_init(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot + incremental totals via transformWithState
    initialState (see _WarmStartTotalsProcessor): 'historical' events
    (event_id % 10 < 3) are aggregated in ONE batch job whose exact
    decimal sums seed the state, and only the remaining rows flow
    through the stream — yet the emitted totals equal a full-history
    aggregation, which is exactly what the oracle checks. Keys whose
    events ALL fell in the snapshot partition never enter the stream,
    so the processor (which emits on input) never surfaces them; the
    read side unions their seeded totals back in via a left-anti join
    — the snapshot-∪-live serving pattern — so parity holds for ANY
    fixture, not just ones where every user has a live row.
    Environment pinning via _tws_environment."""
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    cls = type(
        "WarmStartTotalsProcessor",
        (StatefulProcessor,),
        dict(_WarmStartTotalsProcessor.__dict__),
    )
    hist = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_id") % 10 < 3)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(38,6)"))
            .cast("string")
            .alias("acc"),
        )
    )
    s = replay_events(spark, sf_dir).filter(F.col("event_id") % 10 >= 3)
    with _tws_environment(spark):
        out = s.groupBy("user_id").transformWithStateInPandas(
            statefulProcessor=cls(),
            outputStructType=(
                "user_id long, n_events long, sum_value double"
            ),
            outputMode="Update",
            timeMode="None",
            initialState=hist.groupBy("user_id"),
        )
        streamed = _latest_totals(run_to_table(out, "update", spark))
    # snapshot-only keys: serve the seed directly (same decimal->
    # double conversion the processor applies on emission)
    absent = hist.join(streamed, "user_id", "left_anti").select(
        "user_id",
        F.col("n").alias("n_events"),
        F.col("acc").cast("decimal(38,6)").cast("double").alias("sum_value"),
    )
    return streamed.unionByName(absent)


if _protobuf_available():  # pragma: no cover - depends on environment
    register(
        "q_stream_transform_init",
        oracle=_TWS_ORACLE,
        tags=("streaming", "stateful", "udf", "cdc"),
    )(q_stream_transform_init)


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
    )

    s = replay_events(spark, sf_dir)
    x = F.expr(
        f"timestampdiff(SECOND, TIMESTAMP_NTZ '{_TREND_EPOCH}', ts)"
    ).cast("double")
    agg = s.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        dsum(x).alias("sx"),
        dsum("value").alias("sy"),
        dsum(x * F.col("value")).alias("sxy"),
        dsum(x * x / _TREND_XX_SCALE).alias("sxx_s"),
    )
    tbl = run_to_table(agg, "complete", spark)
    sxx = F.col("sxx_s") * _TREND_XX_SCALE
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
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


# -- transformWithState: streaming exact percentiles via ListState ----------


class _PercentileProcessor:
    """transformWithState processor maintaining each event-type's
    full value multiset in a typed ListState and emitting exact
    p50/p90 per micro-batch. Percentile indices are PURE INTEGER
    arithmetic over the sorted multiset — value at zero-based index
    (n-1)//2 resp. ((n-1)*9)//10 — never float interpolation, whose
    lower+(hi-lo)*frac vs (lo+hi)/2 formulas differ in the last bit
    across engines.

    State is the full per-key multiset, appended (not rewritten)
    each batch: exact streaming percentiles fundamentally need the
    multiset. At 100 TB this is the documented trade; the BOUNDED
    production twin is q_stream_percentile_windowed (same exact
    read-out over per-hour windows, state evicted by the watermark),
    with this unbounded variant retained as the whole-stream
    correctness baseline."""

    def init(self, handle) -> None:
        from pyspark.sql.types import (
            DoubleType,
            StructField,
            StructType,
        )

        from streamz_postgres_spark.protobuf_shim import install

        install()
        # value-only state: each element is exactly the 8 bytes the
        # percentile needs — order comes from sorting, never arrival
        self._vals = handle.getListState(
            "vals",
            StructType([StructField("value", DoubleType())]),
        )

    def handleInputRows(self, key, rows, timerValues):
        cur = [float(r[0]) for r in self._vals.get()]
        fresh = []
        for pdf in rows:
            fresh.extend((float(v),) for v in pdf["value"])
        self._vals.appendList(fresh)
        cur.extend(v for (v,) in fresh)
        cur.sort()
        n = len(cur)
        yield pd.DataFrame(
            {
                "event_type": [key[0]],
                "n_events": [n],
                "p50": [cur[(n - 1) // 2]],
                "p90": [cur[((n - 1) * 9) // 10]],
            }
        )

    def close(self) -> None:
        pass


def q_stream_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIVE exact p50/p90 per event type via transformWithState
    ListState (see _PercentileProcessor): each micro-batch appends
    its values to the key's multiset and re-reads the exact order
    statistics — the latency-dashboard shape where approximate
    sketches need a correctness baseline. The sink is collapsed to
    the last emission per key (n_events is monotone across batches),
    so multi-file fixtures can't leave stale rows. Environment
    pinning via _tws_environment."""
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    cls = type(
        "PercentileProcessor",
        (StatefulProcessor,),
        dict(_PercentileProcessor.__dict__),
    )
    s = replay_events(spark, sf_dir)
    with _tws_environment(spark):
        out = s.groupBy("event_type").transformWithStateInPandas(
            statefulProcessor=cls(),
            outputStructType=(
                "event_type string, n_events long, p50 double, p90 double"
            ),
            outputMode="Update",
            timeMode="None",
        )
        tbl = run_to_table(out, "update", spark)
    latest = tbl.groupBy("event_type").agg(
        F.max_by(F.struct("n_events", "p50", "p90"), F.col("n_events")).alias(
            "s"
        )
    )
    return latest.select("event_type", "s.n_events", "s.p50", "s.p90")


_TWS_PCTL_ORACLE = """
WITH s AS (
  SELECT event_type,
         list(value ORDER BY value) AS vals,
         COUNT(*) AS n_events
  FROM events
  GROUP BY event_type
)
SELECT event_type, n_events,
       vals[CAST((n_events - 1) // 2 AS BIGINT) + 1] AS p50,
       vals[CAST(((n_events - 1) * 9) // 10 AS BIGINT) + 1] AS p90
FROM s
"""

if _protobuf_available():  # pragma: no cover - depends on environment
    register(
        "q_stream_percentile",
        oracle=_TWS_PCTL_ORACLE,
        tags=("streaming", "stateful", "udf", "stats"),
    )(q_stream_percentile)


@register(
    "q_stream_percentile_windowed",
    oracle="""
WITH s AS (
  SELECT date_trunc('hour', ts) AS window_start, event_type,
         list(value ORDER BY value) AS vals,
         CAST(COUNT(*) AS BIGINT) AS n_events
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
            F.count(F.lit(1)).alias("n_events"),
            F.sort_array(F.collect_list("value")).alias("vals"),
        )
        .select(
            F.expr(
                "timestampadd(MICROSECOND, unix_micros(w.start), "
                "TIMESTAMP_NTZ '1970-01-01 00:00:00')"
            ).alias("window_start"),
            "event_type",
            "n_events",
            F.expr(
                "element_at(vals, CAST((n_events - 1) DIV 2 AS INT) + 1)"
            ).alias("p50"),
            F.expr(
                "element_at(vals, CAST(((n_events - 1) * 9) DIV 10 AS INT) + 1)"
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


# -- streaming SCD2 maintenance ---------------------------------------------


def _scd2_fold(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-key SCD2 state machine: ValueState = the OPEN version
    (seq, value). Each change CLOSES the open version (emitting the
    bounded row exactly once) and — for updates — opens a new one; a
    delete closes without opening. The open version is re-emitted at
    the end of every batch its key appears in (the read side keeps
    the last word per (key, valid_from): max(valid_to) collapses the
    open re-emissions against a later closure)."""
    if state.exists:
        open_seq, open_val = state.get
    else:
        open_seq, open_val = None, None
    pdf = pd.concat(list(batches), ignore_index=True).sort_values("event_id")
    out_from, out_to, out_val = [], [], []
    for eid, val in zip(pdf["event_id"], pdf["value"]):
        eid = int(eid)
        if open_seq is not None:
            out_from.append(open_seq)
            out_to.append(eid)
            out_val.append(open_val)
        if eid % 10 == 0:  # delete: close without re-opening
            open_seq, open_val = None, None
        else:
            open_seq, open_val = eid, float(val)
    if open_seq is not None:
        state.update((open_seq, open_val))
        out_from.append(open_seq)
        out_to.append(None)
        out_val.append(open_val)
    else:
        state.remove()
    yield pd.DataFrame(
        {
            "user_id": [key[0]] * len(out_from),
            "valid_from_seq": pd.Series(out_from, dtype="int64"),
            "valid_to_seq": pd.Series(out_to, dtype="object"),
            "value": pd.Series(out_val, dtype="float64"),
        }
    )


def _scd2_oracle() -> str:
    from streamz_postgres_spark.registry import REGISTRY

    return REGISTRY["q_cdc_scd2"].oracle


def q_stream_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIVE SCD type-2 maintenance from the CDC change stream (the
    streaming twin of q_cdc_scd2): the only carried state is each
    key's OPEN version — closed versions are emitted exactly once,
    in the micro-batch where the superseding change arrives, which
    is precisely the incremental-materialization contract an
    auditable dimension needs. The read side collapses the per-batch
    open-version re-emissions with max(valid_to) per (key,
    valid_from): a later closure always wins over an open row.
    Same oracle as the batch twin."""
    s = replay_events(spark, sf_dir)
    out = s.groupBy("user_id").applyInPandasWithState(
        _scd2_fold,
        outputStructType=(
            "user_id long, valid_from_seq long, valid_to_seq long, "
            "value double"
        ),
        stateStructType="open_seq long, open_val double",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    tbl = run_to_table(out, "append", spark)
    return (
        tbl.groupBy("user_id", "valid_from_seq")
        .agg(
            F.max("valid_to_seq").alias("valid_to_seq"),
            F.max("value").alias("value"),  # constant within a version
        )
        .select(
            "user_id",
            "valid_from_seq",
            "valid_to_seq",
            "value",
            F.col("valid_to_seq").isNull().cast("int").alias("is_current"),
        )
    )


register(
    "q_stream_scd2",
    oracle=_scd2_oracle(),
    tags=("streaming", "cdc", "scd2", "stateful"),
)(q_stream_scd2)


# -- streaming as-of enrichment (facts pick up the live dim version) --------


def _enrich_asof_fold(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-key as-of enrichment state machine: ValueState = the
    latest dimension version (seq, value). 'signup' rows ARE the
    dimension change feed (they update state, emit nothing); every
    other row is a fact, emitted exactly once with the dimension
    version current AT ITS SEQUENCE — the streaming form of the
    batch as-of join. State is one (long, double) pair per key,
    bounded for the stream's lifetime. Correctness relies on per-key
    seq-ordered arrival across batches — the CDC-log contract the
    replay (and any log-compacted topic) provides; rows within a
    batch are sorted here."""
    if state.exists:
        dim_seq, dim_val = state.get
    else:
        dim_seq, dim_val = None, None
    pdf = pd.concat(list(batches), ignore_index=True).sort_values("event_id")
    out_eid, out_type, out_val, out_dseq, out_dval = [], [], [], [], []
    for eid, etype, val in zip(
        pdf["event_id"], pdf["event_type"], pdf["value"]
    ):
        if etype == "signup":
            dim_seq, dim_val = int(eid), float(val)
        else:
            out_eid.append(int(eid))
            out_type.append(str(etype))
            out_val.append(float(val))
            out_dseq.append(dim_seq)
            out_dval.append(dim_val)
    if dim_seq is None:
        state.remove()
    else:
        state.update((dim_seq, dim_val))
    yield pd.DataFrame(
        {
            "user_id": [key[0]] * len(out_eid),
            "event_id": pd.Series(out_eid, dtype="int64"),
            "event_type": pd.Series(out_type, dtype="object"),
            "value": pd.Series(out_val, dtype="float64"),
            "dim_seq": pd.Series(out_dseq, dtype="object"),
            "dim_value": pd.Series(out_dval, dtype="object"),
        }
    )


@register(
    "q_stream_enrich_asof",
    oracle="""
WITH enriched AS (
  SELECT user_id, event_id, event_type, value,
         LAST_VALUE(CASE WHEN event_type = 'signup' THEN event_id END
                    IGNORE NULLS) OVER w AS dim_seq,
         LAST_VALUE(CASE WHEN event_type = 'signup' THEN value END
                    IGNORE NULLS) OVER w AS dim_value
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY event_id
               ROWS UNBOUNDED PRECEDING)
)
SELECT user_id, event_id, event_type, value, dim_seq, dim_value
FROM enriched
WHERE event_type <> 'signup'
""",
    tags=("streaming", "cdc", "join", "stateful"),
)
def q_stream_enrich_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIVE as-of enrichment — the canonical CDC consumer: a fact
    stream picks up the dimension version current AT EACH FACT'S
    sequence number, from an in-band dimension change feed ('signup'
    events play the dim updates; everything else is a fact). The
    batch twin is q_asof_join / the last-ignoreNulls window trick;
    here the same semantics run incrementally with ONE (seq, value)
    pair of state per key and each fact emitted exactly once, in
    append mode — no retraction, no unbounded buffer. Facts arriving
    before any dimension version carry NULL dim columns, exactly as
    the batch as-of does. Oracle: the batch last-ignoreNulls window
    over the full log."""
    s = replay_events(spark, sf_dir)
    out = s.groupBy("user_id").applyInPandasWithState(
        _enrich_asof_fold,
        outputStructType=(
            "user_id long, event_id long, event_type string, "
            "value double, dim_seq long, dim_value double"
        ),
        stateStructType="dim_seq long, dim_val double",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return run_to_table(out, "append", spark)


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
    pdf = pd.concat(list(batches), ignore_index=True).sort_values("doc_id")
    sig_cols = [f"m{j}" for j in range(16)]
    out_a, out_b, out_est = [], [], []
    for _, row in pdf.iterrows():
        did = int(row["doc_id"])
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


def _stream_minhash_sig_cols() -> list:
    """Row-local minhash signature via HOFs — identical values to the
    batch explode+groupBy-min pipeline (same md5 double-hash family),
    but computed with ZERO shuffle: the signature never leaves its
    row, which is exactly what an ingestion stream needs."""
    from streamz_postgres_spark.functions.text_features import DH_MOD

    # guard: sequence(1, n-2) DESCENDS when n < 3 (negative step
    # inference) — short docs must produce an empty shingle array,
    # mirroring functions.text_features.shingles
    shingle_hashes = (
        "transform(CASE WHEN size(split(text, ' ')) >= 3 THEN "
        "transform(sequence(1, size(split(text, ' ')) - 2), "
        "i -> concat_ws(' ', element_at(split(text, ' '), i), "
        "element_at(split(text, ' '), i + 1), "
        "element_at(split(text, ' '), i + 2))) "
        "ELSE CAST(array() AS ARRAY<STRING>) END, "
        "s -> struct(CAST(conv(substring(md5(s), 1, 15), 16, 10) AS BIGINT) "
        "AS h1, CAST(conv(substring(md5(s), 16, 14), 16, 10) AS BIGINT) AS h2))"
    )
    cols = []
    for j in range(16):
        cols.append(
            F.expr(
                f"array_min(transform({shingle_hashes}, "
                f"p -> (p.h1 + {j} * p.h2) % {DH_MOD}))"
            ).alias(f"m{j}")
        )
    return cols


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
    sig = src.select("doc_id", *_stream_minhash_sig_cols()).filter(
        F.col("m0").isNotNull()
    )
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
