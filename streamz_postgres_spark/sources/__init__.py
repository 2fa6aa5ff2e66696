from streamz_postgres_spark.sources.cdc import (
    CDC_ENVELOPE_SCHEMA,
    JdbcPollingLoader,
    ParquetReplayLoader,
    PollingCdcSource,
    apply_changes,
    full_refresh_diff,
    normalize_envelope,
)

__all__ = [
    "CDC_ENVELOPE_SCHEMA",
    "JdbcPollingLoader",
    "ParquetReplayLoader",
    "PollingCdcSource",
    "apply_changes",
    "full_refresh_diff",
    "normalize_envelope",
]
