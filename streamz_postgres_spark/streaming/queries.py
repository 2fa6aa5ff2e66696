"""Streaming query surface — compatibility aggregator.

The original single-module home of every q_stream_*/q_cdc_* query;
split in round 7 into four focused modules (windowed, stateful,
cdc_live, corpus_live) for maintainability. Importing THIS module
still registers every streaming query and re-exports the state-fold
helpers the multibatch/recovery tests drive directly, so existing
import sites keep working and registry keys are unchanged.
"""

from __future__ import annotations

from streamz_postgres_spark.streaming import cdc_live as _cdc_live  # noqa: F401
from streamz_postgres_spark.streaming import corpus_live as _corpus_live  # noqa: F401
from streamz_postgres_spark.streaming import stateful as _stateful  # noqa: F401
from streamz_postgres_spark.streaming import windowed as _windowed  # noqa: F401

from streamz_postgres_spark.streaming.cdc_live import (  # noqa: F401
    _enrich_asof_fold,
    _scd2_fold,
)
from streamz_postgres_spark.streaming.corpus_live import (  # noqa: F401
    _LSH_ROSTER_CAP,
    _lsh_bucket_fold,
    _stream_minhash_sig,
    _streaming_documents,
)
from streamz_postgres_spark.streaming.stateful import (  # noqa: F401
    _anomaly_fold,
    _ewma_fold,
    _kll_fold,
    _latest_totals,
    _PercentileProcessor,
    _protobuf_available,
    _RecentEventsProcessor,
    _tws_environment,
    _TypeCountsProcessor,
    _UserTotalsProcessor,
)
from streamz_postgres_spark.streaming.windowed import (  # noqa: F401
    _combine_latest_fold,
    _running_totals,
    _zip_seq_fold,
    q_stream_accumulate,
)
