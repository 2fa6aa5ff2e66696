"""Timezone independence: the external driver's session timezone is
unknown, so every date-touching query must value-match the oracle
under a non-UTC session. Spark's date_trunc / dayofweek family
silently routes NTZ values through the session zone (this caught a
real cohort-week bug), so the probe flips the runtime tz conf to a
+05:45 zone — misaligned with every hour AND half-hour boundary —
and re-runs the oracle gate on the calendar-heavy keys. The full
registry passed this probe at sf0.01 (180/180); this keeps the
fast core of it in CI."""

from __future__ import annotations

import pytest

from streamz_postgres_spark.oracle import check_query
from streamz_postgres_spark.registry import REGISTRY, _load_all
from tests.conftest import SF_DIR

_load_all()

KEYS = (
    "q_cohort_retention",
    "q_seasonality",
    "q_tumbling",
    "q_session",
    "q_funnel",
    "q_date_funcs",
    "q_resample_locf",
    "q_gaps_islands",
    "q_range_frame",
    # round-5 calendar-touching additions
    "q_rollup_cascade",
    "q_lateness_audit",
    "q_tpch_q7",
    "q_tpch_q8",
    "q_tpch_q12",
    "q_cooccurrence_lift",
    # round-6 calendar-touching additions
    "q_stream_percentile_windowed",
    "q_decay_score",
    # round-7 calendar-touching additions
    "q_sample_by_sql",
    "q_interval_overlap",
)

_TZ = "Asia/Kathmandu"  # +05:45: off every hour and half-hour grid


@pytest.mark.parametrize("key", KEYS)
def test_value_match_under_nonutc_session(spark, duck, key):
    tz_key = "spark.sql.session.timeZone"
    before = spark.conf.get(tz_key)
    spark.conf.set(tz_key, _TZ)
    try:
        ok, msg = check_query(spark, duck, REGISTRY[key], SF_DIR)
    finally:
        spark.conf.set(tz_key, before)
    assert ok, f"{key} under {_TZ}: {msg}"
