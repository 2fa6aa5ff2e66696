"""Hostile-fixture parity sweep: re-run the full Spark-vs-DuckDB
oracle gate on a MUTATED copy of sf0.001 that exercises the edge
classes the shipped fixtures never contain:

- ``events.value`` NULLs (SQL aggregates skip NULLs; HOF folds and
  window frames must agree with the oracle on them),
- ``events.props`` NULLs (JSON extraction on a NULL document),
- (user_id, ts) TIES in events (every tie-break that was "free"
  because the fixture had unique timestamps is now load-bearing),
- empty / whitespace-only / NULL ``documents.text`` rows,
- (v2) NEGATIVE, ZERO, magnitude-scaled (x1e3) and repeating-decimal
  (/3) event values — sign assumptions, x/0, micro6-quantization and
  decimal-rounding parity all become load-bearing. x1e3 and not more:
  variance-class stats fold value^2 through the micro6 rule, whose
  documented per-row bound is |x| < 9.2e12 (numeric.py) — (327.53e3)^2
  ~ 1.1e11 stays inside the engine's contract, (x1e5)^2 would not
  (verified: welch/ols/autocorr diverge there, by contract),
- (v2) PRE-EPOCH timestamps (one user-class shifted -80 years) —
  any div/floor epoch arithmetic that truncates toward zero instead
  of flooring diverges (the class the r12 SAMPLE BY fix was in),
- (v2) unicode documents (CJK + emoji + combining accent + CRLF/tab)
  and 8x-repeated long documents — tokenizer/length/regex parity,
- (v2) ZERO VECTORS and NULL rows in ``embeddings.embedding`` —
  cosine 0/0, NULL-array HOFs, and pandas-UDF None handling.

The round-11 advisor found exactly one bug of this class (per-symbol
SUM lowered to a left fold that a single NULL poisons — latent only
because events has no NULLs). This sweep makes the whole class
mechanically discoverable instead of advisor-luck. NaN is EXCLUDED
by design: the exact-decimal sum discipline casts doubles to
decimal(38,6) on both engines, and both hard-error casting NaN — a
NaN fixture would measure error-message parity, not semantics.

Usage: python scripts/hostile_sweep.py [--include-streaming] [keys...]
Exit code 0 iff every swept key passes its gate on the hostile data.
"""

from __future__ import annotations

import os
import sys
import tempfile
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def build_hostile_dir(src: str, timeshift: bool = True) -> str:
    """Copy all tables from ``src`` into a temp dir, mutating events
    and documents deterministically (no RNG — reruns are identical).

    ``timeshift=False`` omits the pre-epoch (-80 years) mutation:
    Spark's event-time watermark initializes to EPOCH ZERO (1970), so
    any pre-epoch row is born "late" and every watermarked streaming
    aggregation structurally drops it — an engine-level floor, not a
    parity bug. The streaming sweep therefore runs on the unshifted
    profile (all other mutation classes kept); batch keys keep the
    shift, where it exercises real epoch-arithmetic parity."""
    out = tempfile.mkdtemp(prefix="hostile_sf_")
    con = duckdb.connect()
    passthrough = [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem",
    ]
    for t in passthrough:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet')) "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
    # embeddings: vec_id%53==0 -> all-zero vector (cosine 0/0 class);
    # vec_id%59==0 -> NULL embedding (NULL-array HOFs / pandas None).
    con.execute(
        f"""
        COPY (
          SELECT vec_id,
                 CASE WHEN vec_id % 59 = 0 AND vec_id % 53 != 0
                        THEN NULL
                      WHEN vec_id % 53 = 0
                        THEN CAST(list_transform(embedding, x -> 0.0)
                                  AS FLOAT[])
                      ELSE embedding END AS embedding,
                 label
          FROM read_parquet('{src}/embeddings.parquet')
        ) TO '{out}/embeddings.parquet' (FORMAT PARQUET)
        """
    )
    # events: NULL value on event_id%20==0; NULL props on %23==0;
    # duplicated (user_id, ts) rows (fresh event_ids above the max)
    # for event_id%17==0 with a perturbed value so tie-breaks matter.
    # v2 value classes (NULL wins, then first match): %13 -> negated,
    # %29 -> x1e5 magnitude, %43 -> /3 repeating decimal. v2 time
    # class: user_id%11==0 shifts -80 years (pre-epoch floor/div).
    con.execute(
        f"""
        COPY (
          WITH base AS (
            SELECT event_id,
                   CASE WHEN {str(timeshift).lower()} AND user_id % 11 = 0
                        THEN ts - INTERVAL 80 YEAR
                        ELSE ts END AS ts,
                   user_id, event_type,
                   CASE WHEN event_id % 20 = 0 THEN NULL
                        WHEN event_id % 13 = 0 THEN -value
                        WHEN event_id % 29 = 0 THEN value * 1e3
                        WHEN event_id % 43 = 0 THEN value / 3.0
                        ELSE value END AS value,
                   CASE WHEN event_id % 23 = 0 THEN NULL
                        ELSE props END AS props
            FROM read_parquet('{src}/events.parquet')
          ), mx AS (SELECT MAX(event_id) AS m FROM base)
          SELECT * FROM base
          UNION ALL
          SELECT b.event_id + mx.m AS event_id, b.ts, b.user_id,
                 b.event_type,
                 b.value * 0.5 AS value, b.props
          FROM base b, mx WHERE b.event_id % 17 = 0
          ORDER BY event_id
        ) TO '{out}/events.parquet' (FORMAT PARQUET)
        """
    )
    # documents: doc_id%97==0 -> empty text, %89==0 -> whitespace-only,
    # %83==0 -> NULL text (n_chars kept consistent where defined).
    # v2: %101==0 -> unicode-prefixed (CJK + emoji + combining accent
    # + CRLF + tab), %103==0 -> 8x-repeated long document; n_chars
    # recomputed as length(text) for both (code-point length on both
    # engines, combining marks count separately — the parity point).
    uni = (
        "héllo 世界 \U0001f680 café"
        "\r\n\tmixed space "
    )
    con.execute(
        f"""
        COPY (
          WITH mut AS (
            SELECT doc_id,
                   CASE WHEN doc_id % 83 = 0 THEN NULL
                        WHEN doc_id % 97 = 0 THEN ''
                        WHEN doc_id % 89 = 0 THEN '   '
                        WHEN doc_id % 101 = 0 THEN $uni$ || text
                        WHEN doc_id % 103 = 0 THEN repeat(text, 8)
                        ELSE text END AS text,
                   lang, source
            FROM read_parquet('{src}/documents.parquet')
          )
          SELECT doc_id, text, lang, source,
                 length(text) AS n_chars
          FROM mut
        ) TO '{out}/documents.parquet' (FORMAT PARQUET)
        """.replace("$uni$", "'" + uni + "'")
    )
    con.close()
    return out


def main() -> int:
    from streamz_postgres_spark.oracle import check_query, duckdb_connection
    from streamz_postgres_spark.registry import REGISTRY, _load_all
    from streamz_postgres_spark.session import get_spark

    _load_all()
    include_streaming = "--include-streaming" in sys.argv
    only = [a for a in sys.argv[1:] if not a.startswith("--")]

    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    # streaming runs on the unshifted profile — see build_hostile_dir
    # (the Spark watermark floor is the 1970 epoch)
    hostile = build_hostile_dir(src, timeshift=not include_streaming)
    print(f"hostile fixture at {hostile} (from {src})", flush=True)

    spark = get_spark()
    con = duckdb_connection(hostile)
    fails = []
    keys = only or sorted(REGISTRY)
    for key in keys:
        q = REGISTRY[key]
        if not include_streaming and (
            "streaming" in q.tags or "cdc" in q.tags
        ):
            continue
        try:
            ok, msg = check_query(spark, con, q, hostile)
        except Exception as e:  # noqa: BLE001 — triage tool, keep going
            ok, msg = False, f"ERR {type(e).__name__}: {e}"
        status = "ok" if ok else "FAIL"
        print(f"{status:4s} {key}: {msg[:300]}", flush=True)
        if not ok:
            fails.append((key, msg))
    print(f"\n{len(fails)} failures / {len(keys)} keys swept")
    for k, m in fails:
        print(f"  {k}: {m[:200]}")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
