"""Corpus-curation diagnostics for LLM training-data pipelines.

Reference parity: SURVEY.md §2.8 (training-data pipeline block) —
these are the read-outs a curation run consults between pipeline
stages: cross-document n-gram contamination, deterministic shard
assignment for training export, the sequence-length distribution
that drives packing/context-length choices, and a per-rule filter
funnel.

All four are pure built-in-function DataFrame plans (no Python UDFs)
with exact-integer outputs or single-division ratios, so the DuckDB
oracles match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from streamz_postgres_spark.catalog import load_table
from streamz_postgres_spark.functions.text_features import (
    hash60,
    seeded_hash60,
    shingles,
    sql_hash60,
    sql_seeded_hash60,
    sql_shingles,
    sql_tokens,
    tokens,
)
from streamz_postgres_spark.registry import register

_COV_N = 5  # word n-gram order for contamination coverage
_COV_SALT = "#cov"


@register(
    "q_ngram_coverage",
    oracle=f"""
WITH g AS (
  SELECT doc_id, source,
         unnest({sql_shingles(sql_tokens('text'), _COV_N)}) AS gram
  FROM documents
),
h AS (
  SELECT doc_id, source,
         {sql_hash60(f"gram || '{_COV_SALT}'")} AS gh
  FROM g
),
df AS (
  SELECT gh, COUNT(DISTINCT doc_id) AS n_docs_with_gram
  FROM h GROUP BY gh
)
SELECT source,
       COUNT(*) AS n_gram_instances,
       CAST(SUM(CASE WHEN n_docs_with_gram > 1 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_dup_instances,
       CAST(SUM(CASE WHEN n_docs_with_gram > 1 THEN 1 ELSE 0 END)
            AS DOUBLE) / COUNT(*) AS dup_share
FROM h JOIN df USING (gh)
GROUP BY source
ORDER BY source
""",
    tags=("corpus", "dedup", "text"),
)
def q_ngram_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document n-gram contamination (RefinedWeb-style
    duplicate-text coverage): per source, the share of word 5-gram
    instances that also occur in at least one OTHER document.

    Scale shape (reworked per round-5 verdict #8, then re-profiled):
    the exploded gram stream is hashed to a 60-bit int immediately,
    so the one WIDE shuffle left (the document-frequency aggregate)
    moves 8-byte keys, never gram strings. Three plan changes, each
    measured on the 10x grid:
    (1) the old instance-vs-df equi-join (a second full-stream
        shuffle) is gone — the denominator is a map-side partial
        count and the numerator a semi-join against the MINORITY
        df>1 gram set, which AQE broadcasts (Zipf head grams that
        survive the filter hit a skew-immune broadcast probe):
        117.9 -> 46.1 s;
    (2) "df>1" is min(doc_id) != max(doc_id) — full map-side
        combine, vs count_distinct's two-phase expand;
    (3) the hashed instance stream is PERSISTED (thread-scoped
        lifecycle slot): profiling showed the interpreted HOF
        shingling, paid once per consumer, dominated everything —
        caching it collapsed the 10x point 46.1 -> 2.6 s (and sf0.1
        5.9 -> 1.0 s). At 100 TB the same staging is a DISK_ONLY
        persist or a written shard, but the pay-shingling-once rule
        is identical. The share is one exact-integer division."""
    from streamz_postgres_spark.lifecycle import persist_scoped

    d = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    inst = d.select(
        "doc_id",
        "source",
        F.explode(shingles(tokens("text"), _COV_N)).alias("gram"),
    ).select(
        "doc_id",
        "source",
        hash60(F.concat(F.col("gram"), F.lit(_COV_SALT))).alias("gh"),
    )
    # the hashed instance stream feeds THREE consumers (df aggregate,
    # per-source totals, semi-join probe); persisting it pays the
    # interpreted HOF shingling + md5 exactly once instead of three
    # times — the dominant cost at 10x (thread-scoped lifecycle slot,
    # released on the next invocation)
    persist_scoped("q_ngram_coverage", inst)
    # "df > 1" needs no distinct COUNT: a gram spans >=2 distinct
    # docs iff min(doc_id) != max(doc_id) over its instances — a
    # single min/max aggregate with full map-side combine, vs
    # count_distinct's two-phase (gh, doc_id)-then-(gh) shuffle pair
    dup_grams = (
        inst.groupBy("gh")
        .agg(F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi"))
        .filter(F.col("lo") != F.col("hi"))
        .select("gh")
    )
    totals = inst.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_gram_instances")
    )
    dups = (
        inst.join(dup_grams, "gh", "left_semi")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_dup_instances"))
    )
    return (
        totals.join(dups, "source", "left")
        .select(
            "source",
            "n_gram_instances",
            F.coalesce(F.col("n_dup_instances"), F.lit(0))
            .cast("bigint")
            .alias("n_dup_instances"),
        )
        .select(
            "source",
            "n_gram_instances",
            "n_dup_instances",
            (
                F.col("n_dup_instances").cast("double")
                / F.col("n_gram_instances")
            ).alias("dup_share"),
        )
        .orderBy("source")
    )


_SHARD_SALT = "#shard"
_N_SHARDS = 16


@register(
    "q_shuffle_shard",
    oracle=f"""
WITH hashed AS (
  SELECT doc_id, n_chars,
         {sql_hash60(f"CAST(doc_id AS VARCHAR) || '{_SHARD_SALT}'")} AS h
  FROM documents
),
placed AS (
  SELECT doc_id, n_chars, h % {_N_SHARDS} AS shard,
         ROW_NUMBER() OVER (
           PARTITION BY h % {_N_SHARDS} ORDER BY h, doc_id
         ) AS pos
  FROM hashed
)
SELECT shard,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(SUM(doc_id * pos) AS BIGINT) AS perm_checksum
FROM placed
GROUP BY shard
ORDER BY shard
""",
    tags=("corpus", "pipeline"),
)
def q_shuffle_shard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle + shard assignment for training
    export: shard = salted-hash % 16, within-shard order by hash
    (tie-broken by doc_id). The checksum sum(doc_id · position)
    pins the ENTIRE permutation, so the oracle proves both engines
    produce the identical shuffle order, not just identical counts.

    Scale shape: the row_number window partitions BY SHARD — at
    100 TB each shard sorts independently (one range-partitioned
    sort per shard, no global sort, no single-partition window).
    The checksum's doc_id·pos products stay far below 2^63 for any
    realistic shard (pos ≤ shard rows, doc_id ≤ 2^40-ish); a
    production export would write the sorted shards directly."""
    d = load_table(spark, sf_dir, "documents")
    h = hash60(F.concat(F.col("doc_id").cast("string"), F.lit(_SHARD_SALT)))
    placed = (
        d.select("doc_id", "n_chars", h.alias("h"))
        .withColumn("shard", F.col("h") % _N_SHARDS)
        .withColumn(
            "pos",
            F.row_number().over(
                Window.partitionBy("shard").orderBy("h", "doc_id")
            ),
        )
    )
    return (
        placed.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            F.sum(F.col("doc_id") * F.col("pos"))
            .cast("bigint")
            .alias("perm_checksum"),
        )
        .orderBy("shard")
    )


@register(
    "q_seq_length_hist",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, len({sql_tokens('text')}) AS n_tok FROM documents
)
SELECT CAST(1 << length(bin(n_tok - 1)) AS BIGINT) AS bucket_hi,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
       MIN(n_tok) AS min_tok,
       MAX(n_tok) AS max_tok
FROM toks
WHERE n_tok > 0
GROUP BY bucket_hi
ORDER BY bucket_hi
""",
    tags=("corpus", "agg", "text"),
)
def q_seq_length_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-length distribution in power-of-two buckets — the
    read-out that drives context-length and packing-budget choices.
    The bucket ceiling is computed with INTEGER bit arithmetic
    (1 << bits(n-1), i.e. the binary-digit count of n_tok-1), never
    log2 on doubles: IEEE log2 at exact powers of two rounds
    differently across engines, bit-length never does.

    Map-side partial agg into ~a dozen groups: shuffle bytes are
    constant in input size."""
    d = load_table(spark, sf_dir, "documents")
    n_tok = F.size(tokens("text"))
    # SQL form: the DataFrame-API shiftleft only takes a literal bit
    # count, but the bucket width varies per row
    bucket = F.expr("shiftleft(CAST(1 AS BIGINT), CAST(length(bin(n_tok - 1)) AS INT))")
    return (
        d.select("doc_id", n_tok.alias("n_tok"))
        .filter(F.col("n_tok") > 0)
        .withColumn("bucket_hi", bucket)
        .groupBy("bucket_hi")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("total_tokens"),
            F.min("n_tok").alias("min_tok"),
            F.max("n_tok").alias("max_tok"),
        )
        .orderBy("bucket_hi")
    )


# Funnel rule thresholds (applied to whitespace tokens / raw chars).
_MIN_CHARS = 200
_MIN_UNIQUE_RATIO = 0.3
_MEAN_WLEN_LO = 2.0
_MEAN_WLEN_HI = 12.0


@register(
    "q_filter_funnel",
    oracle=f"""
WITH feats AS (
  SELECT doc_id,
         n_chars,
         len({sql_tokens('text')}) AS n_tok,
         len(list_distinct({sql_tokens('text')})) AS n_uniq
  FROM documents
),
flags AS (
  SELECT doc_id,
         CASE WHEN n_chars < {_MIN_CHARS} THEN 1 ELSE 0 END AS f_short,
         CASE WHEN CAST(n_uniq AS DOUBLE) / n_tok < {_MIN_UNIQUE_RATIO}
              THEN 1 ELSE 0 END AS f_repetitive,
         CASE WHEN CAST(n_chars - n_tok + 1 AS DOUBLE) / n_tok
                   NOT BETWEEN {_MEAN_WLEN_LO} AND {_MEAN_WLEN_HI}
              THEN 1 ELSE 0 END AS f_gibberish
  FROM feats
  WHERE n_tok > 0
)
SELECT COUNT(*) AS n_docs,
       CAST(SUM(f_short) AS BIGINT) AS n_fail_short,
       CAST(SUM(f_repetitive) AS BIGINT) AS n_fail_repetitive,
       CAST(SUM(f_gibberish) AS BIGINT) AS n_fail_gibberish,
       CAST(SUM(CASE WHEN f_short + f_repetitive + f_gibberish > 0
                THEN 1 ELSE 0 END) AS BIGINT) AS n_fail_any,
       CAST(SUM(CASE WHEN f_short + f_repetitive + f_gibberish = 0
                THEN 1 ELSE 0 END) AS BIGINT) AS n_pass_all
FROM flags
""",
    tags=("corpus", "pipeline", "agg"),
)
def q_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-filter funnel: how many documents each heuristic rule
    rejects individually, how many fail ANY rule, and how many
    survive all — the ablation table a curation run reports before
    committing to a filter stack. Rules: too-short (raw chars),
    repetitive (unique-token ratio), gibberish (mean word length
    outside a sane band, derived from chars/tokens so it needs no
    second tokenization pass).

    One map-side conditional aggregate: a single scan, a few-hundred-
    byte shuffle, regardless of corpus size."""
    d = load_table(spark, sf_dir, "documents")
    tok = tokens("text")
    feats = d.select(
        "doc_id",
        "n_chars",
        F.size(tok).alias("n_tok"),
        F.size(F.array_distinct(tok)).alias("n_uniq"),
    ).filter(F.col("n_tok") > 0)
    mean_wlen = (
        (F.col("n_chars") - F.col("n_tok") + 1).cast("double") / F.col("n_tok")
    )
    flags = feats.select(
        F.when(F.col("n_chars") < _MIN_CHARS, 1).otherwise(0).alias("f_short"),
        F.when(
            F.col("n_uniq").cast("double") / F.col("n_tok") < _MIN_UNIQUE_RATIO, 1
        )
        .otherwise(0)
        .alias("f_repetitive"),
        F.when(
            ~mean_wlen.between(_MEAN_WLEN_LO, _MEAN_WLEN_HI), 1
        )
        .otherwise(0)
        .alias("f_gibberish"),
    )
    any_fail = F.col("f_short") + F.col("f_repetitive") + F.col("f_gibberish")
    return flags.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("f_short").cast("bigint").alias("n_fail_short"),
        F.sum("f_repetitive").cast("bigint").alias("n_fail_repetitive"),
        F.sum("f_gibberish").cast("bigint").alias("n_fail_gibberish"),
        F.sum(F.when(any_fail > 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_fail_any"),
        F.sum(F.when(any_fail == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_pass_all"),
    )


# -- corpus drift gate (reference vs candidate length distribution) ----------


@register(
    "q_corpus_drift",
    oracle="""
WITH feats AS (
  SELECT doc_id % 2 AS half,
         (CAST(1 AS BIGINT) << length(bin(n_chars - 1))) AS bucket_hi
  FROM documents
  WHERE n_chars > 0
),
b AS (
  SELECT bucket_hi,
         CAST(SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_ref,
         CAST(SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_cur
  FROM feats GROUP BY bucket_hi
),
tot AS (
  SELECT CAST(SUM(n_ref) AS BIGINT) AS tot_ref,
         CAST(SUM(n_cur) AS BIGINT) AS tot_cur
  FROM b
)
SELECT bucket_hi, n_ref, n_cur,
       CAST(n_ref AS DOUBLE) / tot_ref AS share_ref,
       CAST(n_cur AS DOUBLE) / tot_cur AS share_cur,
       ABS(CAST(n_ref AS DOUBLE) / tot_ref
           - CAST(n_cur AS DOUBLE) / tot_cur) AS abs_diff
FROM b CROSS JOIN tot
ORDER BY bucket_hi
""",
    tags=("corpus", "pipeline", "stats"),
)
def q_corpus_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus drift gate — the train/serve distribution check a
    curation pipeline runs before accepting a new crawl batch: the
    per-bucket share difference of the document-length distribution
    between a REFERENCE corpus half and a CANDIDATE half (here the
    deterministic even/odd doc_id split; in production, last week's
    accepted shard vs this week's). Total-variation distance is the
    read-out: TV = sum(abs_diff)/2, and per-bucket rows localize
    WHERE the drift sits. Buckets are the house integer-bit-length
    powers of two (cross-engine exact); each share is ONE division
    of exact integers and the difference of two such doubles, so the
    whole report is bit-deterministic on any partitioning. One
    map-side conditional aggregation into ~a dozen buckets + a
    broadcast 1-row totals join: constant shuffle bytes at any
    corpus size."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    b = (
        d.select(
            (F.col("doc_id") % 2).alias("half"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), "
                "CAST(length(bin(n_chars - 1)) AS INT))"
            ).alias("bucket_hi"),
        )
        .groupBy("bucket_hi")
        .agg(
            F.sum(F.when(F.col("half") == 0, 1).otherwise(0))
            .cast("bigint")
            .alias("n_ref"),
            F.sum(F.when(F.col("half") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_cur"),
        )
    )
    tot = b.agg(
        F.sum("n_ref").cast("bigint").alias("tot_ref"),
        F.sum("n_cur").cast("bigint").alias("tot_cur"),
    )
    # try_divide: a corpus whose docs all fall in ONE half leaves the
    # other half's total at exactly 0 — DuckDB's x/0 is NULL, Spark's
    # ANSI / raises (degenerate-cardinality sweep, 1-row fixture).
    share_ref = F.try_divide(F.col("n_ref").cast("double"), F.col("tot_ref"))
    share_cur = F.try_divide(F.col("n_cur").cast("double"), F.col("tot_cur"))
    return (
        b.crossJoin(F.broadcast(tot))
        .select(
            "bucket_hi",
            "n_ref",
            "n_cur",
            share_ref.alias("share_ref"),
            share_cur.alias("share_cur"),
            F.abs(share_ref - share_cur).alias("abs_diff"),
        )
        .orderBy("bucket_hi")
    )


# -- curriculum ordering (difficulty-phased training schedule) ---------------

_CURR_PHASES = 4


@register(
    "q_curriculum_order",
    oracle=f"""
WITH feats AS (
  SELECT doc_id,
         len({sql_tokens('text')}) AS n_tok,
         CAST(len(list_distinct({sql_tokens('text')})) AS DOUBLE)
           / len({sql_tokens('text')}) AS uniq_ratio
  FROM documents
  WHERE len({sql_tokens('text')}) > 0
),
bucketed AS (
  SELECT doc_id, n_tok, uniq_ratio,
         (CAST(1 AS BIGINT) << length(bin(n_tok - 1))) AS bucket_hi,
         NTILE({_CURR_PHASES}) OVER (
           PARTITION BY (CAST(1 AS BIGINT) << length(bin(n_tok - 1)))
           ORDER BY uniq_ratio, doc_id
         ) AS phase
  FROM feats
)
SELECT bucket_hi, CAST(phase AS INTEGER) AS phase,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
       MIN(uniq_ratio) AS min_uniq_ratio,
       MAX(uniq_ratio) AS max_uniq_ratio
FROM bucketed
GROUP BY bucket_hi, phase
ORDER BY bucket_hi, phase
""",
    tags=("corpus", "pipeline", "sampling"),
)
def q_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum ordering for training: within each power-of-two
    LENGTH bucket, documents are ranked by a difficulty proxy (the
    unique-token ratio — repetitive/templated text is 'easy', lexically
    dense text is 'hard') and cut into 4 curriculum
    phases with NTILE — train on phase 1 first, anneal toward phase
    4. Partitioning the rank by length bucket keeps the schedule
    length-stratified, so early phases aren't accidentally dominated
    by short documents.

    Determinism: the NTILE order carries a doc_id tiebreaker (equal
    ratios are common), the ratio is one exact-integer division, and
    the window partitions BY BUCKET — a dozen independent sorts, no
    single-partition window at any scale. Read-out: per (bucket,
    phase) doc/token counts and the ratio range, i.e. the schedule a
    data-loader would consume."""
    d = load_table(spark, sf_dir, "documents")
    toks = tokens("text")
    feats = d.select(
        "doc_id",
        F.size(toks).alias("n_tok"),
        (
            F.size(F.array_distinct(toks)).cast("double") / F.size(toks)
        ).alias("uniq_ratio"),
    ).filter(F.col("n_tok") > 0)
    bucket = F.expr(
        "shiftleft(CAST(1 AS BIGINT), CAST(length(bin(n_tok - 1)) AS INT))"
    )
    w = Window.partitionBy("bucket_hi").orderBy("uniq_ratio", "doc_id")
    return (
        feats.withColumn("bucket_hi", bucket)
        .withColumn("phase", F.ntile(_CURR_PHASES).over(w))
        .groupBy("bucket_hi", "phase")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("total_tokens"),
            F.min("uniq_ratio").alias("min_uniq_ratio"),
            F.max("uniq_ratio").alias("max_uniq_ratio"),
        )
        .orderBy("bucket_hi", "phase")
    )


# -- out-of-vocabulary rate vs the corpus top-V vocabulary -------------------



def oov_counts(tok: DataFrame, vocab_size: int, keys: list) -> DataFrame:
    """Shared OOV stage (q_oov_rate and q_corpus_pipeline_v2): build
    the top-``vocab_size`` vocabulary from ``tok`` (a (doc_id, <keys>,
    tok) frame) via distributed TakeOrdered with the deterministic
    (count desc, token asc) tie-break, broadcast it back, and return
    per-(doc_id, keys) token/OOV counts. One definition so a tie-break
    or null-token fix can never apply to one consumer and not the
    other (round-7 review find)."""
    vocab = (
        tok.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("tok"))
        .limit(vocab_size)
        .select("tok", F.lit(1).alias("in_vocab"))
    )
    return (
        tok.join(F.broadcast(vocab), "tok", "left")
        .groupBy("doc_id", *keys)
        .agg(
            F.count(F.lit(1)).alias("n_tok"),
            F.count_if(F.col("in_vocab").isNull()).alias("n_oov"),
        )
    )


#: vocabulary size: top V tokens by corpus frequency (count desc,
#: token asc as the deterministic tie-break)
_OOV_V = 500


@register(
    "q_oov_rate",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, lang, unnest({sql_tokens('text')}) AS tok FROM documents
), vocab AS (
  SELECT tok FROM (
    SELECT tok, row_number() OVER (ORDER BY COUNT(*) DESC, tok) AS rk
    FROM tok GROUP BY tok
  ) r WHERE rk <= {_OOV_V}
)
SELECT t.doc_id, t.lang,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(COUNT(*) FILTER (WHERE v.tok IS NULL) AS BIGINT) AS n_oov,
       CAST(COUNT(*) FILTER (WHERE v.tok IS NULL) AS DOUBLE) / COUNT(*)
         AS oov_rate
FROM tok t LEFT JOIN vocab v ON t.tok = v.tok
GROUP BY t.doc_id, t.lang
""",
    tags=("corpus", "text", "quality"),
)
def q_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-vocabulary rate per document against the corpus's own
    top-{_OOV_V} token vocabulary — the tokenizer-coverage
    diagnostic run before committing a vocab/tokenizer to a
    training corpus (high-OOV docs are noise, code, or a language
    the vocab underserves). Two-phase: (1) global token counts ->
    top-V with a DETERMINISTIC tie-break (count desc, token asc —
    never hash-order), (2) per-doc conditional count against the
    vocabulary, which Catalyst executes as a BROADCAST join (the
    vocab is V rows by construction) — per-doc work is map-side,
    the only full shuffle is the token-count aggregation, and the
    oov ratio is ONE IEEE division of two exact integers. At 100 TB
    the vocab stage is the q_vocab_topk plan (partial-agg counts)
    and the audit stage stays broadcast — no pairwise anything."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", "lang", F.explode(tokens("text")).alias("tok")
    )
    return oov_counts(tok, _OOV_V, ["lang"]).select(
        "doc_id",
        "lang",
        F.col("n_tok").cast("bigint").alias("n_tokens"),
        F.col("n_oov").cast("bigint").alias("n_oov"),
        (
            F.col("n_oov").cast("double") / F.col("n_tok")
        ).alias("oov_rate"),
    )


_NOV_N = 5  # same word n-gram order as the contamination coverage
_NOV_SALT = "#nov"


@register(
    "q_ngram_novelty",
    oracle=f"""
WITH g AS (
  SELECT DISTINCT doc_id,
         {sql_hash60(f"gram || '{_NOV_SALT}'")} AS gh
  FROM (
    SELECT doc_id,
           unnest({sql_shingles(sql_tokens('text'), _NOV_N)}) AS gram
    FROM documents
  ) raw
),
f AS (
  SELECT doc_id, gh,
         MIN(doc_id) OVER (PARTITION BY gh) AS first_doc
  FROM g
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_grams,
       CAST(SUM(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END)
            AS BIGINT) AS n_novel,
       CAST(SUM(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END)
            AS DOUBLE) / COUNT(*) AS novelty
FROM f GROUP BY doc_id
""",
    tags=("corpus", "dedup", "text"),
)
def q_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document n-gram NOVELTY in arrival order (doc_id = crawl
    order in the fixture): the share of a doc's distinct word
    5-grams that no EARLIER document contains. The marginal-value
    curve a continuously-crawled corpus watches — novelty trending
    to zero means the crawl is re-fetching what it already has, and
    the per-doc score doubles as a curriculum / keep-drop signal
    (complements q_ngram_coverage, which is the symmetric
    contamination share without the order semantics).

    Scale shape: grams are hashed to 60-bit ints immediately (the
    q_ngram_coverage rule — the wide shuffle carries 8-byte keys,
    never gram strings); first-seen is ONE window min over the gram
    hash (a keyed shuffle, no self-join), and the per-doc fold is a
    map-side-combinable count/sum. Short docs (no 5-grams) drop out
    of both engines identically. The share is one exact-integer
    division."""
    d = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    g = (
        d.select(
            "doc_id",
            F.explode(shingles(tokens("text"), _NOV_N)).alias("gram"),
        )
        .select(
            "doc_id",
            hash60(F.concat(F.col("gram"), F.lit(_NOV_SALT))).alias("gh"),
        )
        .distinct()
    )
    w = Window.partitionBy("gh")
    f = g.withColumn("first_doc", F.min("doc_id").over(w))
    novel = F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
    return f.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_grams"),
        F.sum(novel).cast("bigint").alias("n_novel"),
        (F.sum(novel).cast("double") / F.count(F.lit(1))).alias("novelty"),
    )


# -- vocabulary growth (Heaps-law checkpoints) --------------------------------


@register(
    "q_vocab_growth",
    oracle=f"""
WITH d AS (
  SELECT source,
         row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn,
         len({sql_tokens('text')}) AS n_tok,
         {sql_tokens('text')} AS toks
  FROM documents
), tot AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_tok) AS BIGINT) AS tokens_total
  FROM d GROUP BY source
), fr AS (
  SELECT source, w, CAST(MIN(rn) AS BIGINT) AS fr
  FROM (SELECT source, rn, unnest(toks) AS w FROM d) x
  GROUP BY source, w
)
SELECT f.source, t.n_docs, t.tokens_total,
  CAST(SUM(CASE WHEN fr <= (n_docs + 3) // 4 THEN 1 ELSE 0 END)
       AS BIGINT) AS types_q1,
  CAST(SUM(CASE WHEN fr <= (n_docs + 1) // 2 THEN 1 ELSE 0 END)
       AS BIGINT) AS types_q2,
  CAST(SUM(CASE WHEN fr <= (3 * n_docs + 3) // 4 THEN 1 ELSE 0 END)
       AS BIGINT) AS types_q3,
  CAST(COUNT(*) AS BIGINT) AS types_total,
  CAST(COUNT(*) AS DOUBLE) / CAST(t.tokens_total AS DOUBLE)
    AS type_token_ratio
FROM fr f JOIN tot t USING (source)
GROUP BY f.source, t.n_docs, t.tokens_total
ORDER BY f.source
""",
    tags=("corpus", "text"),
)
def q_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-growth (Heaps-law) checkpoints per source: distinct
    word types seen after 25% / 50% / 75% / 100% of the source's
    documents in stable doc_id order, plus the final type/token
    ratio. A healthy natural corpus keeps adding types sublinearly
    (V ~ n^beta, beta ~ 0.5); a source whose curve FLATTENS early is
    template/boilerplate spam and a candidate for aggressive dedup —
    this read-out is how a curation run ranks sources for that
    treatment without fitting anything.

    Exactness: checkpoints are integer ceilings ((n+3) div 4 etc.),
    first-appearance is MIN(row_number) per (source, word), and all
    counts are exact bigints — only the final type/token ratio
    divides, once, in double. Scale: the token explode feeds a
    map-side-combined MIN per (source, word) — the shuffle carries
    the VOCABULARY (types x sources), not the token stream; the
    checkpoint fold is per-source and bounded. The per-source
    row_number runs over doc METADATA (doc_id only), not payloads."""
    d = load_table(spark, sf_dir, "documents")
    wdoc = Window.partitionBy("source").orderBy("doc_id")
    base = d.select(
        "source",
        F.row_number().over(wdoc).alias("rn"),
        F.size(tokens("text")).alias("n_tok"),
        tokens("text").alias("toks"),
    )
    tot = base.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("tokens_total"),
    )
    fr = (
        base.select("source", "rn", F.explode("toks").alias("w"))
        .groupBy("source", "w")
        .agg(F.min("rn").cast("bigint").alias("fr"))
    )
    q1 = F.expr("(n_docs + 3) div 4")
    q2 = F.expr("(n_docs + 1) div 2")
    q3 = F.expr("(3 * n_docs + 3) div 4")
    return (
        fr.join(F.broadcast(tot), "source")
        .groupBy("source", "n_docs", "tokens_total")
        .agg(
            F.sum(F.when(F.col("fr") <= q1, 1).otherwise(0))
            .cast("bigint")
            .alias("types_q1"),
            F.sum(F.when(F.col("fr") <= q2, 1).otherwise(0))
            .cast("bigint")
            .alias("types_q2"),
            F.sum(F.when(F.col("fr") <= q3, 1).otherwise(0))
            .cast("bigint")
            .alias("types_q3"),
            F.count(F.lit(1)).cast("bigint").alias("types_total"),
        )
        .select(
            "source",
            "n_docs",
            "tokens_total",
            "types_q1",
            "types_q2",
            "types_q3",
            "types_total",
            (
                F.col("types_total").cast("double")
                / F.col("tokens_total").cast("double")
            ).alias("type_token_ratio"),
        )
        .orderBy("source")
    )


# -- deterministic Bloom-filter audit -----------------------------------------

_BLOOM_M = 4096  # filter bits
_BLOOM_K = 2  # hash functions (double hashing: h1 + i*h2)
_BLOOM_MOD = 97  # doc_id % 97 == 0 -> reference ("benchmark") docs
_BLOOM_N = 3  # word n-gram order


@register(
    "q_bloom_filter_audit",
    oracle=f"""
WITH ref AS (
  SELECT DISTINCT s FROM (
    SELECT unnest({sql_shingles(sql_tokens('text'), _BLOOM_N)}) AS s
    FROM documents WHERE doc_id % {_BLOOM_MOD} = 0
  ) t
), bits AS (
  SELECT DISTINCT ({sql_hash60('s')}
                   + i * {sql_seeded_hash60('s', 7)}) % {_BLOOM_M} AS pos
  FROM ref CROSS JOIN (SELECT unnest([0, 1]) AS i) k
), probe AS (
  SELECT DISTINCT s FROM (
    SELECT unnest({sql_shingles(sql_tokens('text'), _BLOOM_N)}) AS s
    FROM documents WHERE doc_id % {_BLOOM_MOD} <> 0
  ) t
), hits AS (
  SELECT p.s,
         CAST(COUNT(b.pos) AS BIGINT) = {_BLOOM_K} AS hit,
         MAX(CASE WHEN r.s IS NOT NULL THEN 1 ELSE 0 END) = 1 AS member
  FROM probe p
  CROSS JOIN (SELECT unnest([0, 1]) AS i) k
  LEFT JOIN bits b
    ON ({sql_hash60('p.s')}
        + k.i * {sql_seeded_hash60('p.s', 7)}) % {_BLOOM_M} = b.pos
  LEFT JOIN ref r ON r.s = p.s
  GROUP BY p.s
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM ref) AS n_ref,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM bits) AS n_bits_set,
       CAST(COUNT(*) AS BIGINT) AS n_probes,
       CAST(SUM(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
       CAST(SUM(CASE WHEN member THEN 1 ELSE 0 END) AS BIGINT) AS n_members,
       CAST(SUM(CASE WHEN hit AND NOT member THEN 1 ELSE 0 END)
            AS BIGINT) AS n_false_pos,
       CAST(SUM(CASE WHEN hit AND NOT member THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(SUM(CASE WHEN NOT member THEN 1 ELSE 0 END) AS DOUBLE)
         AS fp_rate
FROM hits
""",
    tags=("corpus", "sketch"),
)
def q_bloom_filter_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Bloom-filter audit: build an m={_BLOOM_M}-bit,
    k={_BLOOM_K}-hash Bloom filter over the benchmark docs' word
    {_BLOOM_N}-grams (double hashing, pos_i = (h1 + i*h2) mod m —
    Kirsch-Mitzenmacher), probe every remaining corpus shingle, and
    report the MEASURED false-positive rate against exact membership.
    This is the calibration read-out for every "swap the exact roster
    for a Bloom filter at scale" note in this engine (the
    q_stream_vocab_novelty / q_contamination production form): before
    a 100 TB run commits to (m, k), this audit prices the FP rate on
    a sample, exactly.

    Determinism: the filter IS deterministic — both hash functions
    are the house md5-based hash60 family, so the set-bit table, the
    per-probe hit verdict, and the FP count are exact integers on
    both engines (no RNG, no sketch library); the one division is the
    final rate. Scale: the bit table is packed 32 bits/word into a
    broadcast map (the q_stream_bloom_ingest form) and each probe
    shingle tests its k positions ROW-LOCALLY — no position explode,
    no position join, no re-group by shingle (r10 tail attack: the
    old explode+join+groupBy shape tripled the probe-side shuffle
    volume); the shuffle carries distinct shingles once, and the
    exact-membership join is the same broadcast the contamination
    scan uses. The md5 per distinct shingle is the remaining floor —
    pinned by cross-engine determinism, same argument as the
    winnowing scan. The ref shingle set and the bit table are
    persist_scoped: ref feeds the filter build, the membership join,
    and n_ref; without the pin each consumer re-ran the
    explode+distinct."""
    from streamz_postgres_spark.lifecycle import persist_scoped

    d = load_table(spark, sf_dir, "documents")
    sh = shingles(tokens("text"), _BLOOM_N)
    ref = (
        d.filter(F.col("doc_id") % _BLOOM_MOD == 0)
        .select(F.explode(sh).alias("s"))
        .distinct()
    )
    probe = (
        d.filter(F.col("doc_id") % _BLOOM_MOD != 0)
        .select(F.explode(sh).alias("s"))
        .distinct()
    )

    def _positions(col: F.Column) -> F.Column:
        h1 = hash60(col)
        h2 = seeded_hash60(col, 7)
        return F.array(
            *[(h1 + F.lit(i) * h2) % _BLOOM_M for i in range(_BLOOM_K)]
        )

    bits = ref.select(
        F.explode(_positions(F.col("s"))).alias("pos")
    ).distinct()
    persist_scoped("q_bloom_filter_audit", ref, bits)
    # 32 bits per word keeps 1 << (pos % 32) inside positive int64 on
    # both engines (the house variable-shift clamp rule)
    bw = (
        bits.select(
            (F.col("pos") / 32).cast("int").alias("widx"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(pos % 32 AS INT))"
            ).alias("bit"),
        )
        .groupBy("widx")
        .agg(F.expr("bit_or(bit)").alias("word"))
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("widx", "word"))
            ).alias("bw")
        )
    )
    from streamz_postgres_spark.functions.text_features import (
        spark_sql_hash60,
        spark_sql_seeded_hash60,
    )

    _h1 = spark_sql_hash60("s")
    _h2 = spark_sql_seeded_hash60("s", 7)

    def _probe_bit(pos_expr: str) -> str:
        return (
            f"(coalesce(element_at(bw, CAST(({pos_expr}) DIV 32 AS INT)), "
            f"CAST(0 AS BIGINT)) & shiftleft(CAST(1 AS BIGINT), "
            f"CAST(({pos_expr}) % 32 AS INT))) != 0"
        )

    # bind the two hashes ONCE per probed shingle (r11 rule): the
    # inline form expanded _h1/_h2 into both halves of every one of
    # the K probes — 4K md5 evaluations per distinct shingle where 2
    # suffice. The struct alias is multi-referenced, so
    # CollapseProject keeps it materialized; the probe arithmetic
    # over t.a/t.b is integer-cheap.
    hit_expr = " AND ".join(
        _probe_bit(f"(t.a + {i} * t.b) % {_BLOOM_M}")
        for i in range(_BLOOM_K)
    )
    hits = (
        probe.crossJoin(F.broadcast(bw))
        .selectExpr(
            "s", "bw", f"struct(({_h1}) AS a, ({_h2}) AS b) AS t"
        )
        .selectExpr("s", f"({hit_expr}) AS hit")
        .join(
            F.broadcast(ref.withColumn("__m", F.lit(1))), "s", "left"
        )
        .select("hit", F.col("__m").isNotNull().alias("member"))
    )
    nref = ref.agg(F.count(F.lit(1)).cast("bigint").alias("n_ref"))
    nbits = bits.agg(F.count(F.lit(1)).cast("bigint").alias("n_bits_set"))
    fp = F.when(F.col("hit") & ~F.col("member"), 1).otherwise(0)
    nonmem = F.when(~F.col("member"), 1).otherwise(0)
    return (
        hits.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_probes"),
            F.sum(F.when(F.col("hit"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_hits"),
            F.sum(F.when(F.col("member"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_members"),
            F.sum(fp).cast("bigint").alias("n_false_pos"),
            (F.sum(fp).cast("double") / F.sum(nonmem).cast("double")).alias(
                "fp_rate"
            ),
        )
        .crossJoin(F.broadcast(nref))
        .crossJoin(F.broadcast(nbits))
        .select(
            "n_ref",
            "n_bits_set",
            "n_probes",
            "n_hits",
            "n_members",
            "n_false_pos",
            "fp_rate",
        )
    )
