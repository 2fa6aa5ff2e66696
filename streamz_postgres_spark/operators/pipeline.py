"""Training-data pipeline operators beyond the reference surface:
deterministic train/val/test splitting, token-budget sequence
packing, stratified sampling, benchmark-contamination detection, and
batched exact k-NN. These are the steps a 100 TB pretraining corpus
goes through between raw documents and a tokenized training set
(alongside the dedup/similarity/text modules).

Every operator is value-checked against DuckDB: randomness is
replaced by the md5-based ``hash60`` (bit-identical in both engines,
see functions/text_features.py), so "random" splits and samples are
deterministic and exactly reproducible — which is also what you want
in production: a doc's split assignment must not depend on cluster
size, partitioning, or rerun count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from streamz_postgres_spark.catalog import load_table
from streamz_postgres_spark.functions.numeric import qround, sql_qround
from streamz_postgres_spark.functions.text_features import (
    hash60,
    shingles,
    sql_hash60,
    sql_shingles,
    sql_tokens,
    tokens,
)
from streamz_postgres_spark.functions.vector import dot, l2_norm, sql_dot, sql_l2_norm
from streamz_postgres_spark.registry import register

# -- train/val/test split ---------------------------------------------------

_SPLIT_SALT = "#split"
_TRAIN_PCT, _VAL_PCT = 80, 10  # remainder -> test


@register(
    "q_train_split",
    oracle=f"""
SELECT doc_id, lang,
       CASE WHEN h < {_TRAIN_PCT} THEN 'train'
            WHEN h < {_TRAIN_PCT + _VAL_PCT} THEN 'val'
            ELSE 'test' END AS split
FROM (
  SELECT doc_id, lang,
         {sql_hash60(f"CAST(doc_id AS VARCHAR) || '{_SPLIT_SALT}'")} % 100 AS h
  FROM documents
) t
""",
    tags=("pipeline",),
)
def q_train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test split by salted content
    hash of the stable doc key — never by position or RNG, so the
    assignment is identical across reruns, partitionings, and engine
    versions, and adding documents never reassigns existing ones.
    Pure codegen (md5 + modulo): embarrassingly parallel, no shuffle
    at all at any scale."""
    d = load_table(spark, sf_dir, "documents")
    h = hash60(F.concat(F.col("doc_id").cast("string"), F.lit(_SPLIT_SALT))) % 100
    return d.select(
        "doc_id",
        "lang",
        F.when(h < _TRAIN_PCT, "train")
        .when(h < _TRAIN_PCT + _VAL_PCT, "val")
        .otherwise("test")
        .alias("split"),
    )


# -- token-budget sequence packing ------------------------------------------

_PACK_BUDGET = 512
_PACK_SHARDS = 8  # hash-shards per lang; at 100 TB set ~ corpus_tokens / (budget * rows_per_window_partition)
_PACK_SALT = "#pack"


@register(
    "q_pack_sequences",
    oracle=f"""
SELECT doc_id, lang, shard, n_tok,
       CAST(FLOOR((cum - n_tok) / {_PACK_BUDGET}) AS BIGINT) AS bin
FROM (
  SELECT doc_id, lang, shard,
         n_tok,
         SUM(n_tok) OVER (
           PARTITION BY lang, shard ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS cum
  FROM (
    SELECT doc_id, lang,
           {sql_hash60(f"CAST(doc_id AS VARCHAR) || '{_PACK_SALT}'")}
             % {_PACK_SHARDS} AS shard,
           len({sql_tokens('text')}) AS n_tok
    FROM documents
  ) s
) t
""",
    tags=("pipeline", "window"),
)
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: concatenate documents (per (lang, shard), in
    stable doc order) and cut the token stream at a fixed budget;
    each doc is assigned the bin its first token falls in. The
    running-sum window partitions on (lang, hash-shard of doc_id) —
    lang alone has a handful of values, which at 100 TB would funnel
    a whole language's corpus through one window partition; the
    deterministic shard bounds every partition while keeping bins
    reproducible (this per-shard packing is how production packers
    parallelize: bins are local to a shard, shard x bin is the
    global sequence id)."""
    d = load_table(spark, sf_dir, "documents")
    shard = (
        hash60(F.concat(F.col("doc_id").cast("string"), F.lit(_PACK_SALT)))
        % _PACK_SHARDS
    )
    n_tok = F.size(tokens("text"))
    w = (
        Window.partitionBy("lang", "shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return d.select(
        "doc_id",
        "lang",
        shard.alias("shard"),
        n_tok.alias("n_tok"),
    ).select(
        "doc_id",
        "lang",
        "shard",
        "n_tok",
        F.floor((F.sum("n_tok").over(w) - F.col("n_tok")) / _PACK_BUDGET).alias(
            "bin"
        ),
    )


# -- stratified sampling ----------------------------------------------------

_STRATUM_K = 10
_SAMPLE_SALT = "#strat"


@register(
    "q_stratified_sample",
    oracle=f"""
SELECT doc_id, lang, source
FROM (
  SELECT doc_id, lang, source,
         row_number() OVER (
           PARTITION BY lang, source
           ORDER BY {sql_hash60(f"CAST(doc_id AS VARCHAR) || '{_SAMPLE_SALT}'")},
                    doc_id
         ) AS rn
  FROM documents
) t
WHERE rn <= {_STRATUM_K}
""",
    tags=("pipeline", "window"),
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sample: exactly k docs per (lang, source) stratum,
    chosen by salted-hash order — a deterministic 'random' sample
    that is stable across reruns and engines. One window per stratum
    key (balanced shuffle); at 100 TB this is the standard eval-set
    carve-out where uniform sampling would starve rare strata."""
    d = load_table(spark, sf_dir, "documents")
    h = hash60(F.concat(F.col("doc_id").cast("string"), F.lit(_SAMPLE_SALT)))
    w = Window.partitionBy("lang", "source").orderBy(h, "doc_id")
    return (
        d.select("doc_id", "lang", "source", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= _STRATUM_K)
        .drop("rn")
    )


# -- benchmark contamination ------------------------------------------------

_CONTAM_NGRAM = 3  # real pipelines use 8-13; the tiny fixture
# vocabulary needs 3 for the check to have verification density
_BENCH_MOD = 97  # doc_id % 97 == 0 -> "benchmark" set (scales ~1%)


@register(
    "q_contamination",
    oracle=f"""
WITH bench AS (
  SELECT DISTINCT s AS shingle
  FROM (
    SELECT unnest({sql_shingles(sql_tokens('text'), _CONTAM_NGRAM)}) AS s
    FROM documents WHERE doc_id % {_BENCH_MOD} = 0
  ) t
),
corpus AS (
  SELECT DISTINCT doc_id, s AS shingle
  FROM (
    SELECT doc_id,
           unnest({sql_shingles(sql_tokens('text'), _CONTAM_NGRAM)}) AS s
    FROM documents WHERE doc_id % {_BENCH_MOD} <> 0
  ) t
)
SELECT c.doc_id, COUNT(*) AS n_hits
FROM corpus c JOIN bench b ON c.shingle = b.shingle
GROUP BY c.doc_id
""",
    tags=("pipeline", "dedup"),
)
def q_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark contamination scan: which training docs contain any
    word n-gram that also appears in the held-out benchmark set?
    The benchmark shingle set is tiny relative to the corpus, so it
    is BROADCAST and the scan is one shuffle-free probe of every
    corpus shingle (then one agg by doc). This is the n-gram-overlap
    decontamination step (GPT-3 appendix / Dolma-style, public
    methodology) that must run over the full corpus before training."""
    d = load_table(spark, sf_dir, "documents")
    sh = F.explode(shingles(tokens("text"), _CONTAM_NGRAM)).alias("shingle")
    bench = (
        d.filter(F.col("doc_id") % _BENCH_MOD == 0)
        .select(sh)
        .distinct()
    )
    corpus = (
        d.filter(F.col("doc_id") % _BENCH_MOD != 0)
        .select("doc_id", sh)
        .distinct()
    )
    return (
        corpus.join(F.broadcast(bench), "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )


# -- batched exact k-NN -----------------------------------------------------

_KNN_PROBE_MOD = 101  # vec_id % 101 == 0 -> probe batch
_KNN_K = 10


@register(
    "q_knn_batch",
    oracle=f"""
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e,
         {sql_l2_norm('embedding')} AS nrm
  FROM embeddings
),
probe AS (
  SELECT vec_id AS probe_id, e AS pe, nrm AS pnrm
  FROM v WHERE vec_id % {_KNN_PROBE_MOD} = 0
)
SELECT probe_id, vec_id, cosine FROM (
  SELECT p.probe_id, v.vec_id,
         {sql_dot('v.e', 'p.pe')} / (v.nrm * p.pnrm) AS cosine,
         row_number() OVER (
           PARTITION BY p.probe_id
           ORDER BY {sql_dot('v.e', 'p.pe')} / (v.nrm * p.pnrm) DESC, v.vec_id
         ) AS rn
  FROM v, probe p
  WHERE v.vec_id <> p.probe_id
) t
WHERE rn <= {_KNN_K}
""",
    tags=("pipeline", "similarity"),
)
def q_knn_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact k-NN for a BATCH of probe vectors (the retrieval shape:
    many queries at once, not one). The probe batch is broadcast; the
    corpus is scanned once with a codegen'd dot product per (row,
    probe). Top-k is two-phase so no single reducer ever sees a whole
    probe's candidates: phase 1 takes each physical partition's local
    top-k per probe (window over (probe, partition-id) — balanced,
    P×K keys), phase 2 reduces the surviving k×P rows per probe
    (tiny). A single window partitioned by probe_id alone would
    funnel every candidate of one probe through one task at 100 TB."""
    e = load_table(spark, sf_dir, "embeddings")
    v = e.select(
        "vec_id",
        F.col("embedding").alias("e"),
        l2_norm(F.col("embedding")).alias("nrm"),
    )
    probe = F.broadcast(
        v.filter(F.col("vec_id") % _KNN_PROBE_MOD == 0).select(
            F.col("vec_id").alias("probe_id"),
            F.col("e").alias("pe"),
            F.col("nrm").alias("pnrm"),
        )
    )
    cosine = F.try_divide(dot(F.col("e"), F.col("pe")), F.col("nrm") * F.col("pnrm"))
    scored = (
        v.crossJoin(probe)
        .filter(F.col("vec_id") != F.col("probe_id"))
        .select(
            "probe_id",
            "vec_id",
            cosine.alias("cosine"),
            F.spark_partition_id().alias("__pid"),
        )
    )
    w_local = Window.partitionBy("probe_id", "__pid").orderBy(
        F.col("cosine").desc(), "vec_id"
    )
    survivors = scored.withColumn("__rn", F.row_number().over(w_local)).filter(
        F.col("__rn") <= _KNN_K
    )
    w_global = Window.partitionBy("probe_id").orderBy(
        F.col("cosine").desc(), "vec_id"
    )
    return (
        survivors.withColumn("__rn2", F.row_number().over(w_global))
        .filter(F.col("__rn2") <= _KNN_K)
        .select("probe_id", "vec_id", "cosine")
    )


# -- distribution-derived quality filter ------------------------------------

_QF_PCT = 0.25


@register(
    "q_quality_filter",
    oracle=f"""
SELECT doc_id, lang, n_chars
FROM documents
WHERE n_chars >= (
  SELECT quantile_cont(n_chars, {_QF_PCT}) FROM documents
)
""",
    tags=("pipeline", "quality"),
)
def q_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-derived quality cut: drop the shortest quartile
    of documents, with the threshold computed FROM the corpus (the
    two-phase shape every percentile-based quality filter uses at
    scale: a tiny aggregate job produces the cutoff, broadcast to a
    full filter pass — never a global sort). Spark's exact
    interpolated ``percentile`` matches DuckDB's ``quantile_cont``
    bit-for-bit on integer inputs. At 100 TB swap the exact
    percentile for ``approx_percentile`` and keep the identical
    broadcast-filter plan — q_stats_histogram_approx is the
    REGISTERED, rank-audited form of exactly this swap (boundaries
    from the GK sketch, guarantee emitted as oracle-checked
    flags)."""
    d = load_table(spark, sf_dir, "documents")
    thresh = d.agg(
        F.expr(f"percentile(n_chars, {_QF_PCT})").alias("cut")
    )
    return (
        d.crossJoin(F.broadcast(thresh))
        .filter(F.col("n_chars") >= F.col("cut"))
        .select("doc_id", "lang", "n_chars")
    )


# -- overlapping context-window chunking ------------------------------------

_CHUNK_SIZE = 32
_CHUNK_STRIDE = 24


@register(
    "q_chunk_overlap",
    oracle=f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks,
         len(string_split(text, ' ')) AS n
  FROM documents
),
c AS (
  SELECT doc_id, toks, n,
         unnest(range(1 + CAST(ceil(greatest(n - {_CHUNK_SIZE}, 0) / {float(_CHUNK_STRIDE)}) AS BIGINT))) AS chunk_id
  FROM t
)
SELECT doc_id, chunk_id,
       least(n - chunk_id * {_CHUNK_STRIDE}, {_CHUNK_SIZE}) AS n_tok,
       toks[chunk_id * {_CHUNK_STRIDE} + 1] AS head_tok,
       toks[least(chunk_id * {_CHUNK_STRIDE} + {_CHUNK_SIZE}, n)] AS tail_tok
FROM c
""",
    tags=("pipeline", "chunk"),
)
def q_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping context-window chunking: every document becomes
    ceil-covering windows of 32 tokens at stride 24 (the 8-token
    overlap preserves cross-boundary context for training). Chunk
    COUNT is computed arithmetically and the windows materialize via
    explode(sequence)+slice — per-row work linear in output size, no
    self-join, no ordered window, so the op is embarrassingly
    parallel at any scale. Chunk ids are 0-based and per-document,
    independent of partitioning."""
    d = load_table(spark, sf_dir, "documents")
    return chunk_windows(d, "doc_id", "text", _CHUNK_SIZE, _CHUNK_STRIDE)


def chunk_windows(
    d: DataFrame,
    id_col: str,
    text_col: str,
    size: int,
    stride: int,
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """Overlapping token-window chunking (see q_chunk_overlap): emits
    (id, *carry, chunk_id, n_tok, head_tok, tail_tok) with
    ceil-covering windows of ``size`` tokens every ``stride``.
    ``carry`` columns ride along through the explode so callers never
    need a post-chunk rejoin (which would cost a shuffle).
    Property-tested: the windows tile the doc exactly (first starts
    at 0, consecutive starts differ by stride, the last window
    reaches the final token)."""
    t = d.select(
        id_col,
        *carry,
        tokens(text_col).alias("toks"),
        F.size(tokens(text_col)).alias("n"),
    )
    n_chunks = F.lit(1) + F.ceil(
        F.greatest(F.col("n") - size, F.lit(0)) / float(stride)
    ).cast("bigint")
    c = t.withColumn(
        "chunk_id", F.explode(F.sequence(F.lit(0).cast("bigint"), n_chunks - 1))
    )
    start = F.col("chunk_id") * stride
    return c.select(
        id_col,
        *carry,
        "chunk_id",
        F.least(F.col("n") - start, F.lit(size)).alias("n_tok"),
        F.element_at("toks", (start + 1).cast("int")).alias("head_tok"),
        F.element_at(
            "toks", F.least(start + size, F.col("n")).cast("int")
        ).alias("tail_tok"),
    )


# -- PII redaction ----------------------------------------------------------

#: RE2/Java-compatible subset: no backslash classes, so the patterns
#: mean the same thing to Spark (java.util.regex) and DuckDB (RE2).
_EMAIL_RE = "[a-z0-9.]+@[a-z0-9.]+[a-z]"
_PHONE_RE = "[+]1-555-[0-9]{4}"


@register(
    "q_pii_scrub",
    oracle=f"""
WITH aug AS (
  SELECT source,
         text || ' reach me at user' || CAST(doc_id AS VARCHAR)
              || '@mail.example or +1-555-'
              || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS raw
  FROM documents
),
s AS (
  SELECT source, raw,
         len(regexp_extract_all(raw, '{_EMAIL_RE}')) AS n_email,
         len(regexp_extract_all(raw, '{_PHONE_RE}')) AS n_phone,
         regexp_replace(regexp_replace(raw, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                        '{_PHONE_RE}', '<PHONE>', 'g') AS clean
  FROM aug
)
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(n_email) AS BIGINT) AS emails_redacted,
       CAST(SUM(n_phone) AS BIGINT) AS phones_redacted,
       CAST(SUM(len(raw) - len(clean)) AS BIGINT) AS chars_removed
FROM s
GROUP BY source
""",
    tags=("pipeline", "pii"),
)
def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction pass: find-and-replace emails and phone numbers
    with typed placeholder tokens, reporting per-source hit counts
    and byte deltas (the audit trail a compliance pass must emit).
    The fixtures contain no PII, so both engines AUGMENT each doc
    with a deterministic synthetic email+phone first — the operator
    under test is the redaction machinery: pure codegen regexes
    (patterns restricted to the syntax subset java.util.regex and
    RE2 interpret identically), one scan, no shuffle before the
    final small agg. At 100 TB this is scan-bound, exactly as it
    should be."""
    d = load_table(spark, sf_dir, "documents")
    raw = F.concat(
        F.col("text"),
        F.lit(" reach me at user"),
        F.col("doc_id").cast("string"),
        F.lit("@mail.example or +1-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    s = d.select(
        "source",
        raw.alias("raw"),
        F.regexp_count(raw, F.lit(_EMAIL_RE)).alias("n_email"),
        F.regexp_count(raw, F.lit(_PHONE_RE)).alias("n_phone"),
        F.regexp_replace(
            F.regexp_replace(raw, _EMAIL_RE, "<EMAIL>"),
            _PHONE_RE,
            "<PHONE>",
        ).alias("clean"),
    )
    return s.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_email").cast("bigint").alias("emails_redacted"),
        F.sum("n_phone").cast("bigint").alias("phones_redacted"),
        F.sum(F.length("raw") - F.length("clean"))
        .cast("bigint")
        .alias("chars_removed"),
    )


# -- domain-mixture rebalancing ---------------------------------------------

#: Target keep-rate per language (domain). Percents, not floats:
#: the keep test is pure int arithmetic, identical in both engines.
_MIX_RATES = {"en": 90, "de": 50, "fr": 50, "es": 70, "zh": 30}
_MIX_DEFAULT = 50
_MIX_SALT = "#mix"

_MIX_SQL_CASE = "CASE " + " ".join(
    f"WHEN lang = '{k}' THEN {v}" for k, v in _MIX_RATES.items()
) + f" ELSE {_MIX_DEFAULT} END"


@register(
    "q_domain_mix",
    oracle=f"""
WITH w AS (
  SELECT doc_id, lang, n_chars,
         {_MIX_SQL_CASE} AS rate,
         {sql_hash60(f"CAST(doc_id AS VARCHAR) || '{_MIX_SALT}'")} % 100 AS h
  FROM documents
)
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN h < rate THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN h < rate THEN n_chars END) AS BIGINT) AS chars_kept
FROM w
GROUP BY lang
""",
    tags=("pipeline", "mix"),
)
def q_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture rebalancing: downsample each domain (language
    here) to a target keep-rate so the training mixture matches a
    spec, not the crawl's accidental proportions. Keep/drop is a
    salted content-hash Bernoulli trial — deterministic, rerun- and
    partitioning-stable, and independent per doc, so the pass is
    map-only (the agg below is just the audit readout). Rates live
    in a tiny literal map compiled into the plan; at 100 TB with
    thousands of domains it becomes a broadcast weights table joined
    on domain — same plan shape either way."""
    d = load_table(spark, sf_dir, "documents")
    rate = F.lit(_MIX_DEFAULT)
    for k, v in reversed(_MIX_RATES.items()):
        rate = F.when(F.col("lang") == k, v).otherwise(rate)
    h = hash60(F.concat(F.col("doc_id").cast("string"), F.lit(_MIX_SALT))) % 100
    kept = h < F.col("rate")
    return (
        d.select("doc_id", "lang", "n_chars", rate.alias("rate"))
        .withColumn("kept", kept)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("kept").cast("int")).cast("bigint").alias("n_kept"),
            F.sum(F.when(F.col("kept"), F.col("n_chars")))
            .cast("bigint")
            .alias("chars_kept"),
        )
    )


# -- end-to-end corpus build ------------------------------------------------

_CORPUS_MIN_TOK = 20


@register(
    "q_corpus_pipeline",
    oracle=f"""
WITH scored AS (
  SELECT doc_id, text,
         len(string_split(text, ' ')) AS n_tok,
         array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')
           AS canonical
  FROM documents
),
quality AS (SELECT * FROM scored WHERE n_tok >= {_CORPUS_MIN_TOK}),
deduped AS (
  SELECT doc_id, text, n_tok
  FROM (
    SELECT *, row_number() OVER (PARTITION BY canonical ORDER BY doc_id) AS rn
    FROM quality
  ) t WHERE rn = 1
),
split AS (
  SELECT doc_id, n_tok,
         CASE WHEN h < {_TRAIN_PCT} THEN 'train'
              WHEN h < {_TRAIN_PCT + _VAL_PCT} THEN 'val'
              ELSE 'test' END AS split
  FROM (
    SELECT *,
           {sql_hash60(f"CAST(doc_id AS VARCHAR) || '{_SPLIT_SALT}'")} % 100 AS h
    FROM deduped
  ) s
),
chunks AS (
  SELECT doc_id, split,
         unnest(range(1 + CAST(ceil(greatest(n_tok - {_CHUNK_SIZE}, 0)
                                    / {float(_CHUNK_STRIDE)}) AS BIGINT)))
           AS chunk_id,
         n_tok
  FROM split
)
SELECT split,
       COUNT(DISTINCT doc_id) AS n_docs,
       COUNT(*) AS n_chunks,
       CAST(SUM(least(n_tok - chunk_id * {_CHUNK_STRIDE}, {_CHUNK_SIZE}))
            AS BIGINT) AS sum_chunk_tokens
FROM chunks
GROUP BY split
""",
    tags=("pipeline", "flagship"),
)
def q_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus build END TO END in one Catalyst plan — the
    flagship of the extension block: quality gate (min token count)
    → exact dedup (canonical form, min-doc_id winner) → deterministic
    train/val/test split (salted hash) → overlapping chunking, with
    per-split document/chunk/token accounting as the audit readout.

    Composition is the point: each stage is the library operator the
    standalone queries check individually (same constants, same
    helpers), and because every stage is declarative the optimizer
    sees ONE plan — the quality filter runs inside the scan, the
    dedup is the only DATA-sized shuffle, the split adds zero
    exchanges, chunking is output-linear explode with the split
    label carried through (no rejoin), and the closing audit agg
    exchanges O(splits) rows. This mirrors how production corpus
    builds should compose at 100 TB: not four jobs with four
    materializations, one plan whose only wide exchange is the
    dedup (guard-tested: zero joins, ≤3 exchanges)."""
    d = load_table(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id",
        "text",
        F.size(tokens("text")).alias("n_tok"),
        F.array_join(F.array_sort(F.array_distinct(tokens("text"))), " ").alias(
            "canonical"
        ),
    )
    quality = scored.filter(F.col("n_tok") >= _CORPUS_MIN_TOK)
    w = Window.partitionBy("canonical").orderBy("doc_id")
    deduped = (
        quality.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "text", "n_tok")
    )
    h = hash60(F.concat(F.col("doc_id").cast("string"), F.lit(_SPLIT_SALT))) % 100
    split = deduped.select(
        "doc_id",
        "text",
        "n_tok",
        F.when(h < _TRAIN_PCT, "train")
        .when(h < _TRAIN_PCT + _VAL_PCT, "val")
        .otherwise("test")
        .alias("split"),
    )
    chunks = chunk_windows(
        split, "doc_id", "text", _CHUNK_SIZE, _CHUNK_STRIDE, carry=("split",)
    )
    return (
        chunks.groupBy("split")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum("n_tok").cast("bigint").alias("sum_chunk_tokens"),
        )
    )


# -- weighted sampling ------------------------------------------------------

_WSAMPLE_K = 100
_WSAMPLE_SALT = "#wsample"
_H60_RANGE = float(1 << 60)


@register(
    "q_weighted_sample",
    oracle=f"""
SELECT doc_id, n_chars, priority
FROM (
  SELECT doc_id, n_chars,
         {sql_qround(
             "ln((" + sql_hash60(f"CAST(doc_id AS VARCHAR) || '{_WSAMPLE_SALT}'")
             + f" + 1) / {_H60_RANGE!r}) / n_chars",
             9,
         )} AS priority
  FROM documents
) t
ORDER BY priority DESC, doc_id
LIMIT {_WSAMPLE_K}
""",
    tags=("pipeline", "sampling"),
)
def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement, weight = n_chars
    (longer docs proportionally likelier), via the Efraimidis-
    Spirakis one-pass scheme: priority = ln(u) / w with u a salted-
    hash uniform in (0, 1], take the top-k priorities. One map pass
    plus a TakeOrdered top-k — no RNG, no rejection loop, identical
    sample on any cluster shape or rerun. The priority is quantized
    (qround(9)) before ranking because ln() is the one libm call in
    the engine whose last ulp differs between the JVM and C
    runtimes; ties on the quantized grid break by doc_id, so the
    cut line stays deterministic."""
    d = load_table(spark, sf_dir, "documents")
    u = (
        hash60(
            F.concat(F.col("doc_id").cast("string"), F.lit(_WSAMPLE_SALT))
        )
        + F.lit(1)
    ) / F.lit(_H60_RANGE)
    # zero/NULL weight -> NULL priority (never sampled; sorts after
    # every real priority under DESC on both engines). ln(u)/0 is
    # NULL in DuckDB but an ANSI DIVIDE_BY_ZERO crash in Spark, so
    # the division must be conditionally guarded (hostile-fixture
    # sweep find, r12); in Efraimidis-Spirakis terms w -> 0 drives
    # the priority to -inf, so exclusion is the correct limit.
    pr = F.when(
        F.col("n_chars") > 0, qround(F.log(u) / F.col("n_chars"), 9)
    )
    return (
        d.select("doc_id", "n_chars", pr.alias("priority"))
        .orderBy(F.col("priority").desc(), "doc_id")
        .limit(_WSAMPLE_K)
    )


# -- k-anonymity privacy audit ----------------------------------------------

_KANON_K = 5


@register(
    "q_kanonymity",
    oracle=f"""
WITH groups AS (
  SELECT c_nationkey, c_mktsegment, COUNT(*) AS grp_size
  FROM customer
  GROUP BY c_nationkey, c_mktsegment
)
SELECT COUNT(*) AS n_groups,
       CAST(SUM(CASE WHEN grp_size < {_KANON_K} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_risky_groups,
       CAST(SUM(CASE WHEN grp_size < {_KANON_K} THEN grp_size ELSE 0 END)
            AS BIGINT) AS n_risky_rows,
       MIN(grp_size) AS min_group_size,
       MAX(grp_size) AS max_group_size
FROM groups
""",
    tags=("pipeline", "privacy", "agg"),
)
def q_kanonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit before a data release: group the table by
    its quasi-identifier tuple (nation, market segment stand in for
    zip/age/gender) and report how many equivalence classes — and
    how many ROWS — fall below k=5, i.e. are re-identifiable. The
    release gate every anonymized training-data export runs first.

    Two-level aggregate: keyed shuffle on the QI tuple, then a
    constant-size global fold — same cost as any group-by at 100 TB.
    Generalization/suppression loops (coarsen QI, re-audit) reuse
    this exact read-out per iteration."""
    c = load_table(spark, sf_dir, "customer")
    groups = c.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("grp_size")
    )
    risky = F.when(F.col("grp_size") < _KANON_K, 1).otherwise(0)
    risky_rows = F.when(
        F.col("grp_size") < _KANON_K, F.col("grp_size")
    ).otherwise(0)
    return groups.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum(risky).cast("bigint").alias("n_risky_groups"),
        F.sum(risky_rows).cast("bigint").alias("n_risky_rows"),
        F.min("grp_size").alias("min_group_size"),
        F.max("grp_size").alias("max_group_size"),
    )


_LDIV_L = 3  # required distinct sensitive values per QI class
_LDIV_BUCKET = 1000  # acctbal bucket width standing in for the sensitive attr


@register(
    "q_l_diversity",
    oracle=f"""
WITH groups AS (
  SELECT c_nationkey, c_mktsegment,
         CAST(COUNT(*) AS BIGINT) AS grp_size,
         CAST(COUNT(DISTINCT CAST(floor(c_acctbal / {_LDIV_BUCKET})
                                  AS BIGINT)) AS BIGINT) AS n_sensitive
  FROM customer
  GROUP BY c_nationkey, c_mktsegment
)
SELECT COUNT(*) AS n_groups,
       CAST(SUM(CASE WHEN n_sensitive < {_LDIV_L} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_homogeneous_groups,
       CAST(SUM(CASE WHEN n_sensitive < {_LDIV_L} THEN grp_size ELSE 0 END)
            AS BIGINT) AS n_rows_at_risk,
       MIN(n_sensitive) AS min_diversity,
       MAX(n_sensitive) AS max_diversity
FROM groups
""",
    tags=("pipeline", "privacy", "agg"),
)
def q_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit — the release gate k-anonymity alone cannot
    provide (Machanavajjhala et al. 2007): a QI class can satisfy
    k>=5 yet leak the sensitive attribute outright when every member
    shares the same value (the homogeneity attack). Same QI tuple as
    q_kanonymity (nation, market segment); the sensitive attribute
    is the bucketed account balance; a class is HOMOGENEOUS when it
    carries fewer than l={_LDIV_L} distinct sensitive buckets, and
    the audit reports how many classes — and rows — that exposes.
    Run beside q_kanonymity before any anonymized export; the two
    share the release-gate loop (coarsen QI, re-audit).

    Same scale shape as the k-audit: one keyed shuffle on the QI
    tuple (count-distinct folds map-side via the two-phase expand
    over a BOUNDED bucket domain), then a constant-size global
    fold."""
    c = load_table(spark, sf_dir, "customer")
    sens = F.floor(F.col("c_acctbal") / _LDIV_BUCKET).cast("bigint")
    groups = c.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).cast("bigint").alias("grp_size"),
        F.countDistinct(sens).cast("bigint").alias("n_sensitive"),
    )
    homog = F.when(F.col("n_sensitive") < _LDIV_L, 1).otherwise(0)
    rows_risk = F.when(
        F.col("n_sensitive") < _LDIV_L, F.col("grp_size")
    ).otherwise(0)
    return groups.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum(homog).cast("bigint").alias("n_homogeneous_groups"),
        F.sum(rows_risk).cast("bigint").alias("n_rows_at_risk"),
        F.min("n_sensitive").alias("min_diversity"),
        F.max("n_sensitive").alias("max_diversity"),
    )


# -- t-closeness privacy audit ------------------------------------------------

_TCLOSE_NUM = 1  # t = 1/5 as a ratio, so the violation flag is an
_TCLOSE_DEN = 5  # exact integer comparison on both engines


@register(
    "q_t_closeness",
    oracle=f"""
WITH cells AS (
  SELECT c_nationkey, c_mktsegment,
         CAST(floor(c_acctbal / {_LDIV_BUCKET}) AS BIGINT) AS b,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM customer
  WHERE c_acctbal IS NOT NULL
  GROUP BY 1, 2, 3
), grp AS (
  SELECT c_nationkey, c_mktsegment, CAST(SUM(cnt) AS BIGINT) AS grp_size
  FROM cells GROUP BY 1, 2
), gdist AS (
  SELECT b, CAST(SUM(cnt) AS BIGINT) AS g_cnt FROM cells GROUP BY 1
), tot AS (
  SELECT CAST(SUM(g_cnt) AS BIGINT) AS n_total,
         CAST(COUNT(*) AS BIGINT) AS m
  FROM gdist
), grid AS (
  SELECT g.c_nationkey, g.c_mktsegment, g.grp_size, gl.b, gl.g_cnt,
         t.n_total, t.m, COALESCE(c.cnt, 0) AS cnt
  FROM grp g
  CROSS JOIN gdist gl
  CROSS JOIN tot t
  LEFT JOIN cells c
    ON c.c_nationkey = g.c_nationkey
   AND c.c_mktsegment = g.c_mktsegment
   AND c.b = gl.b
), cum AS (
  SELECT c_nationkey, c_mktsegment, grp_size, n_total, m,
         CAST(SUM(cnt)   OVER w AS BIGINT) AS cum_cnt,
         CAST(SUM(g_cnt) OVER w AS BIGINT) AS cum_g
  FROM grid
  WINDOW w AS (PARTITION BY c_nationkey, c_mktsegment ORDER BY b)
)
SELECT c_nationkey, c_mktsegment, grp_size,
       CAST(CAST(SUM(abs(cum_cnt * n_total - cum_g * grp_size))
                 AS BIGINT) AS DOUBLE)
         / CAST(grp_size * n_total * (m - 1) AS DOUBLE) AS emd,
       CAST(CASE WHEN CAST(SUM(abs(cum_cnt * n_total - cum_g * grp_size))
                           AS BIGINT) * {_TCLOSE_DEN}
                      > grp_size * n_total * (m - 1) * {_TCLOSE_NUM}
                 THEN 1 ELSE 0 END AS INTEGER) AS violates_t
FROM cum
GROUP BY c_nationkey, c_mktsegment, grp_size, n_total, m
ORDER BY c_nationkey, c_mktsegment
""",
    tags=("pipeline", "privacy", "window"),
)
def q_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit — the third rung of the release-gate ladder
    (Li, Li, Venkatasubramanian 2007) after q_kanonymity and
    q_l_diversity: a QI class can be k-large AND l-diverse yet still
    leak via a SKEWED sensitive distribution (all-high balances in
    one class). Per class, the Earth Mover's Distance between the
    class's sensitive-bucket distribution and the GLOBAL one, with
    the ordered-attribute ground distance: EMD = sum_i |cumP_i -
    cumQ_i| / (m - 1). A class violates when EMD > t = 1/5.

    Determinism: the cumulative difference is kept in EXACT INTEGER
    cross-multiplied form (|cum_cnt*N - cum_g*grp_size|, a bigint),
    summed exactly, and divided ONCE at the end — and the violation
    flag compares integers (num*5 > den), so neither engine ever
    rounds. Scale: the only input-size work is the (QI, bucket) cell
    count — one keyed shuffle; everything after lives on the bounded
    QI-domain x bucket-domain grid (125 x 11 here), whose zero-fill
    cross join broadcasts both bounded sides. Same shape at 100 TB:
    the audit's cost is the cell count, not the grid."""
    c = load_table(spark, sf_dir, "customer")
    b = F.floor(F.col("c_acctbal") / _LDIV_BUCKET).cast("bigint").alias("b")
    cells = (
        # rows with a NULL sensitive value are excluded from the
        # audit: NULL has no position on the ordered ground distance,
        # and a NULL bucket breaks both the grid equi-join and the
        # engines' (divergent) NULL placement under the cumulative
        # window sort (hostile-sweep v3 find)
        c.filter(F.col("c_acctbal").isNotNull())
        .select("c_nationkey", "c_mktsegment", b)
        .groupBy("c_nationkey", "c_mktsegment", "b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    grp = cells.groupBy("c_nationkey", "c_mktsegment").agg(
        F.sum("cnt").cast("bigint").alias("grp_size")
    )
    glob = cells.groupBy("b").agg(
        F.sum("cnt").cast("bigint").alias("g_cnt")
    )
    tot = glob.agg(
        F.sum("g_cnt").cast("bigint").alias("n_total"),
        F.count(F.lit(1)).cast("bigint").alias("m"),
    )
    grid = (
        grp.crossJoin(F.broadcast(glob))
        .crossJoin(F.broadcast(tot))
        .join(cells, ["c_nationkey", "c_mktsegment", "b"], "left")
        .withColumn("cnt", F.coalesce(F.col("cnt"), F.lit(0).cast("bigint")))
    )
    w = (
        Window.partitionBy("c_nationkey", "c_mktsegment")
        .orderBy("b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = grid.select(
        "c_nationkey",
        "c_mktsegment",
        "grp_size",
        "n_total",
        "m",
        F.sum("cnt").over(w).cast("bigint").alias("cum_cnt"),
        F.sum("g_cnt").over(w).cast("bigint").alias("cum_g"),
    )
    num = F.abs(
        F.col("cum_cnt") * F.col("n_total")
        - F.col("cum_g") * F.col("grp_size")
    )
    den = F.col("grp_size") * F.col("n_total") * (F.col("m") - F.lit(1))
    return (
        cum.groupBy("c_nationkey", "c_mktsegment", "grp_size", "n_total", "m")
        .agg(F.sum(num).cast("bigint").alias("sum_num"))
        .select(
            "c_nationkey",
            "c_mktsegment",
            "grp_size",
            # try_divide: a single-bucket domain (m = 1) zeroes the
            # (m - 1) ground-distance denominator — DuckDB x/0 ->
            # NULL, ANSI / raises (degenerate-cardinality sweep)
            F.try_divide(
                F.col("sum_num").cast("double"), den.cast("double")
            ).alias("emd"),
            F.when(
                F.col("sum_num") * _TCLOSE_DEN > den * _TCLOSE_NUM, 1
            )
            .otherwise(0)
            .cast("int")
            .alias("violates_t"),
        )
        .orderBy("c_nationkey", "c_mktsegment")
    )


# -- data-driven mixture rebalance (downsample to the smallest source) -------

_REBAL_SALT = "#rebal"


@register(
    "q_mixture_rebalance",
    oracle=f"""
WITH counts AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_before FROM documents
  GROUP BY source
),
target AS (SELECT MIN(n_before) AS n_target FROM counts),
kept AS (
  SELECT d.source,
         CASE WHEN ({sql_hash60(f"CAST(doc_id AS VARCHAR) || '{_REBAL_SALT}'")}
                    % c.n_before) < t.n_target
              THEN 1 ELSE 0 END AS keep
  FROM documents d
  JOIN counts c ON c.source = d.source
  CROSS JOIN target t
)
SELECT k.source,
       c.n_before,
       CAST(SUM(k.keep) AS BIGINT) AS n_kept,
       CAST(SUM(k.keep) AS DOUBLE) / c.n_before AS keep_share
FROM kept k JOIN counts c ON c.source = k.source
GROUP BY k.source, c.n_before
ORDER BY k.source
""",
    tags=("pipeline", "sampling", "corpus"),
)
def q_mixture_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DATA-DRIVEN mixture rebalancing — the production form
    q_domain_mix's docstring promises: instead of compiled-in rates,
    the per-source acceptance is computed FROM the observed counts
    (here: downsample every source toward the smallest source's
    volume, the uniform-mixture spec; any target-share vector is the
    same plan with different arithmetic). The keep rule is pure
    integer hashing — keep iff hash60(doc#salt) mod n_source <
    n_target — deterministic, rerun-stable, and exactly
    value-checkable (no float acceptance thresholds). Plan shape:
    one count aggregate (O(sources) rows) broadcast-joined back onto
    the scan, then a map-only Bernoulli pass — the corpus is read
    once and never shuffled, at any scale. The read-out is the
    per-source before/kept audit."""
    d = load_table(spark, sf_dir, "documents")
    counts = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_before")
    )
    target = counts.agg(F.min("n_before").alias("n_target"))
    h = hash60(
        F.concat(F.col("doc_id").cast("string"), F.lit(_REBAL_SALT))
    )
    keep = F.when(
        (h % F.col("n_before")) < F.col("n_target"), 1
    ).otherwise(0)
    return (
        d.join(F.broadcast(counts), "source")
        .crossJoin(F.broadcast(target))
        .select("source", "n_before", keep.alias("keep"))
        .groupBy("source", "n_before")
        .agg(
            F.sum("keep").cast("bigint").alias("n_kept"),
            (F.sum("keep").cast("double") / F.col("n_before")).alias(
                "keep_share"
            ),
        )
        .orderBy("source")
    )


# -- leakage-safe group-aware split ------------------------------------------

_GSPLIT_SALT = "#gsplit"


@register(
    "q_group_split",
    oracle=f"""
WITH assigned AS (
  SELECT doc_id, source,
         CASE WHEN ({sql_hash60(f"source || '{_GSPLIT_SALT}'")} % 100) < 80
                THEN 'train'
              WHEN ({sql_hash60(f"source || '{_GSPLIT_SALT}'")} % 100) < 90
                THEN 'val'
              ELSE 'test' END AS split
  FROM documents
)
SELECT split,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
FROM assigned
GROUP BY split
ORDER BY split
""",
    tags=("pipeline", "sampling"),
)
def q_group_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP-AWARE train/val/test split: the split key is the hash
    of the GROUP (source/domain), not the document — every document
    of a source lands in the same split, so near-duplicates and
    templated siblings within a domain can never straddle the
    train/test boundary (the leakage mode a per-doc split like
    q_train_split cannot prevent, and the reason eval suites split
    by URL domain). Same salted-hash determinism as every sampling
    op: rerun-, partitioning-, and engine-stable, map-only, no
    shuffle before the audit aggregate. Read-out: per-split doc and
    DISTINCT-source counts (sources are provably disjoint across
    splits because the assignment is a function of the source)."""
    d = load_table(spark, sf_dir, "documents")
    h = hash60(F.concat(F.col("source"), F.lit(_GSPLIT_SALT))) % 100
    split = (
        F.when(h < 80, "train").when(h < 90, "val").otherwise("test")
    )
    return (
        d.select(split.alias("split"), "source")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.count_distinct("source").cast("bigint").alias("n_sources"),
        )
        .orderBy("split")
    )


# -- temperature-scaled mixture weights (multilingual sampling standard) -----

#: fixed training-token budget the plan is computed for (the
#: read-out is a PLAN — expected docs per source at this budget)
_TEMP_BUDGET_DOCS = 10_000


@register(
    "q_mixture_temperature",
    oracle=f"""
WITH counts AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents
  GROUP BY source
), t AS (
  SELECT source, n_docs, SQRT(CAST(n_docs AS DOUBLE)) AS w
  FROM counts
), z AS (
  SELECT CAST(SUM(CAST(FLOOR(w * 1000000.0 + 0.5) AS HUGEINT)) AS DOUBLE)
           / 1000000.0 AS z_w,
         CAST(SUM(n_docs) AS BIGINT) AS n_total
  FROM t
)
SELECT t.source, t.n_docs,
       CAST(t.n_docs AS DOUBLE) / z.n_total AS obs_share,
       t.w / z.z_w AS temp_share,
       (t.w / z.z_w) / (CAST(t.n_docs AS DOUBLE) / z.n_total)
         AS resample_factor,
       CAST(FLOOR((t.w / z.z_w) * {_TEMP_BUDGET_DOCS} + 0.5) AS BIGINT)
         AS docs_at_budget
FROM t CROSS JOIN z
""",
    tags=("pipeline", "corpus", "mixture"),
)
def q_mixture_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled mixture weights — the multilingual/
    multi-domain sampling standard (mT5/XLM-R practice, public
    methodology): sample source i proportionally to p_i^alpha so
    low-resource sources are boosted without flattening to uniform.
    alpha is FIXED AT 0.5 deliberately: p^0.5 = sqrt(count), and
    IEEE-754 sqrt is CORRECTLY ROUNDED on every conforming platform
    — the one power that is bit-identical across Spark, DuckDB, and
    any executor, where a libm pow(p, 0.3) would diverge in the last
    bit between engines (the q_decay_score power-of-two lesson,
    applied to fractional powers). The normalizer is a dsum over the
    sqrt weights (order-independent), and each output is one IEEE
    division — bit-exact at any parallelism. Emits the audit a
    mixture pipeline consumes: observed share, temperature share,
    the implied re-sampling factor per source, and expected docs at
    a fixed budget (floor-rule rounded). One O(sources) aggregate;
    the downstream sampler is q_domain_mix/q_mixture_rebalance with
    this as the target-share vector."""
    from streamz_postgres_spark.functions.numeric import dsum

    d = load_table(spark, sf_dir, "documents")
    counts = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )
    t = counts.select(
        "source", "n_docs", F.sqrt(F.col("n_docs").cast("double")).alias("w")
    )
    z = t.agg(
        dsum("w").alias("z_w"),
        F.sum("n_docs").cast("bigint").alias("n_total"),
    )
    temp_share = F.col("w") / F.col("z_w")
    obs_share = F.col("n_docs").cast("double") / F.col("n_total")
    return t.crossJoin(F.broadcast(z)).select(
        "source",
        "n_docs",
        obs_share.alias("obs_share"),
        temp_share.alias("temp_share"),
        (temp_share / obs_share).alias("resample_factor"),
        F.floor(temp_share * _TEMP_BUDGET_DOCS + F.lit(0.5))
        .cast("bigint")
        .alias("docs_at_budget"),
    )


# -- round-7 corpus pipeline: quality -> substring-dedup -> OOV -> mixture ---

_V2_MIN_CHARS = 200
_V2_VOCAB = 500


def _v2_oracle() -> str:
    from streamz_postgres_spark.functions.numeric import sql_dsum
    from streamz_postgres_spark.operators.dedup import _sub_pairs_ctes

    return f"""
WITH quality AS (
  SELECT * FROM documents WHERE n_chars >= {_V2_MIN_CHARS}
), {_sub_pairs_ctes("quality")},
drops AS (SELECT DISTINCT doc_b AS doc_id FROM p),
deduped AS (
  SELECT q.* FROM quality q ANTI JOIN drops USING (doc_id)
), tok AS (
  SELECT doc_id, source, unnest(string_split(text, ' ')) AS tok
  FROM deduped
), vocab AS (
  SELECT tok FROM (
    SELECT tok, row_number() OVER (ORDER BY COUNT(*) DESC, tok) AS rk
    FROM tok GROUP BY tok
  ) r WHERE rk <= {_V2_VOCAB}
), oov AS (
  SELECT t.doc_id, any_value(t.source) AS source,
         COUNT(*) AS n_tok,
         COUNT(*) FILTER (WHERE v.tok IS NULL) AS n_oov
  FROM tok t LEFT JOIN vocab v ON t.tok = v.tok
  GROUP BY t.doc_id
), finals AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_final
  FROM oov WHERE 2 * n_oov <= n_tok GROUP BY source
), init AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_initial
  FROM documents GROUP BY source
), qc AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_quality
  FROM quality GROUP BY source
), dc AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_dedup
  FROM deduped GROUP BY source
), asm AS (
  SELECT i.source, i.n_initial,
         COALESCE(qc.n_quality, 0) AS n_quality,
         COALESCE(dc.n_dedup, 0) AS n_dedup,
         COALESCE(f.n_final, 0) AS n_final
  FROM init i LEFT JOIN qc USING (source) LEFT JOIN dc USING (source)
       LEFT JOIN finals f USING (source)
), z AS (
  SELECT {sql_dsum('SQRT(CAST(n_final AS DOUBLE))')} AS zw FROM asm
)
SELECT asm.source, n_initial, n_quality, n_dedup, n_final,
       SQRT(CAST(n_final AS DOUBLE)) / z.zw AS temp_share
FROM asm CROSS JOIN z
"""


def q_corpus_pipeline_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The round-7 corpus pipeline — the new operators composed into
    ONE lazy plan, audited as a per-source funnel: (1) quality gate
    (n_chars >= {_V2_MIN_CHARS}); (2) EXACT-SUBSTRING dedup over the
    survivors (the q_dedup_substring winnowing stage on the FILTERED
    corpus — drop the higher doc_id of every pair, the keep-first
    rule); (3) tokenizer-coverage gate (q_oov_rate's top-{_V2_VOCAB}
    vocab, rebuilt over the deduped survivors; keep docs with OOV
    rate <= 1/2 via the integer form 2*n_oov <= n_tok — no division
    anywhere); (4) temperature mixture shares (alpha = 0.5, the
    IEEE-exact sqrt) over the final per-source counts. Emits one row
    per source with all four funnel counts plus the share — the
    audit a data-curation run reports. Every stage reuses the
    already-verified building block (shared helper or identical
    expression), and the oracle chains the same CTEs, so the
    COMPOSITION is value-checked end-to-end, not just the pieces.
    Scale posture inherits from the pieces: winnowing re-split, DF
    cap, distributed top-V, broadcast vocab; stage outputs are
    per-source scalars."""
    from streamz_postgres_spark.functions.numeric import dsum
    from streamz_postgres_spark.operators.dedup import _winnow_pairs

    d = load_table(spark, sf_dir, "documents")
    quality = d.filter(F.col("n_chars") >= _V2_MIN_CHARS)
    qp = quality.repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    pairs = _winnow_pairs(spark, sf_dir, docs=qp)
    drops = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    deduped = quality.join(drops, "doc_id", "left_anti")
    from streamz_postgres_spark.operators.corpus import oov_counts

    tok = deduped.select(
        "doc_id", "source", F.explode(tokens("text")).alias("tok")
    )
    oov = oov_counts(tok, _V2_VOCAB, ["source"])
    finals = (
        oov.filter(2 * F.col("n_oov") <= F.col("n_tok"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_final"))
    )
    init = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_initial")
    )
    qc = quality.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_quality")
    )
    dc = deduped.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_dedup")
    )
    asm = (
        init.join(qc, "source", "left")
        .join(dc, "source", "left")
        .join(finals, "source", "left")
        .select(
            "source",
            "n_initial",
            F.coalesce("n_quality", F.lit(0)).alias("n_quality"),
            F.coalesce("n_dedup", F.lit(0)).alias("n_dedup"),
            F.coalesce("n_final", F.lit(0)).alias("n_final"),
        )
    )
    w = F.sqrt(F.col("n_final").cast("double"))
    z = asm.agg(dsum(w).alias("zw"))
    return asm.crossJoin(F.broadcast(z)).select(
        "source",
        "n_initial",
        "n_quality",
        "n_dedup",
        "n_final",
        # try_divide: when every source funnels to n_final = 0 the
        # normalizer zw is exactly 0 (DuckDB 0/0 -> NULL, ANSI /
        # raises; degenerate-cardinality sweep)
        F.try_divide(w, F.col("zw")).alias("temp_share"),
    )


def _register_v2() -> None:
    register(
        "q_corpus_pipeline_v2",
        oracle=_v2_oracle(),
        tags=("pipeline", "corpus", "dedup", "mixture"),
    )(q_corpus_pipeline_v2)


_register_v2()
