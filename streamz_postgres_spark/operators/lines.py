"""Line/paragraph-level exact dedup (CCNet-style).

Large-corpus pipelines dedup at SUB-document granularity: boilerplate
lines (nav bars, cookie banners, license headers) repeat across
millions of pages and survive document-level dedup entirely. The
CCNet/RefinedWeb recipe is: split every document into lines or
paragraphs, keep only the corpus-wide FIRST occurrence of each
normalized line, and rebuild documents from their surviving lines.

The fixture text has no newlines, so a "line" here is a fixed
20-word block — the block boundary is arbitrary to the operator; the
dataflow (explode -> first-occurrence rank on the line HASH ->
reconstruct in order) is exactly the production shape.

Scale notes (100 TB): the explode multiplies rows, not bytes (each
line is a slice of the source text). The first-occurrence decision
shuffles on md5(line) — 32 bytes however long the line is — and the
winner rank uses (doc_id, idx), so the result is deterministic under
any partitioning. Reconstruction is a per-doc sort_array over the
kept lines; state never leaves the executors and nothing collects.
SURVEY §2.8 (dedup family); extends q_dedup_exact / q_boilerplate_spans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from streamz_postgres_spark.catalog import load_table
from streamz_postgres_spark.registry import register

_BLOCK = 20  # words per synthetic "line"


@register(
    "q_dedup_lines",
    oracle=f"""
WITH words AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
blocks AS (
  SELECT doc_id, CAST(t.i AS BIGINT) AS idx,
         array_to_string(w[(t.i * {_BLOCK} + 1):((t.i + 1) * {_BLOCK})], ' ')
           AS line
  FROM words,
       unnest(range(CAST(ceil(len(w) / {_BLOCK}.0) AS BIGINT))) AS t(i)
),
ranked AS (
  SELECT doc_id, idx, line,
         row_number() OVER (PARTITION BY md5(line)
                            ORDER BY doc_id, idx) AS rn
  FROM blocks
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       md5(COALESCE(string_agg(CASE WHEN rn = 1 THEN line END, ' '
                               ORDER BY idx), '')) AS kept_hash
FROM ranked
GROUP BY doc_id
""",
    tags=("dedup", "text", "pipeline"),
)
def q_dedup_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide line dedup + document reconstruction: every
    20-word block keeps only its first (doc_id, idx) occurrence;
    each document reports how many of its lines survive and an md5
    over the surviving text (order-preserving), value-checking the
    reconstruction, not just the counts."""
    d = load_table(spark, sf_dir, "documents")
    w = F.split(F.col("text"), " ")
    n_blocks = F.ceil(F.size(w) / F.lit(float(_BLOCK))).cast("int")
    blocks = d.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_blocks - 1),
                lambda i: F.array_join(
                    F.slice(w, i * _BLOCK + 1, _BLOCK), " "
                ),
            )
        ).alias("idx", "line"),
    ).select("doc_id", F.col("idx").cast("long").alias("idx"), "line")
    # first-occurrence rank on the HASH of the line (32-byte shuffle
    # key at any line length); (doc_id, idx) breaks ties globally
    rn = F.row_number().over(
        Window.partitionBy(F.md5("line")).orderBy("doc_id", "idx")
    )
    ranked = blocks.withColumn("rn", rn)
    kept_sorted = F.transform(
        F.array_sort(
            F.collect_list(
                F.when(
                    F.col("rn") == 1, F.struct("idx", F.col("line"))
                )
            )
        ),
        lambda s: s["line"],
    )
    return ranked.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum((F.col("rn") == 1).cast("int")).cast("bigint").alias("n_kept"),
        F.md5(F.array_join(kept_sorted, " ")).alias("kept_hash"),
    )
