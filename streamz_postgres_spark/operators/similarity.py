"""Similarity search over embedding columns (SURVEY §2.8):
brute-force cosine top-k, all-pairs above threshold, and a
hyperplane-LSH bucketed ANN — all exact-checkable.

Scale ladder (documented per operator):
1. brute-force broadcast-probe top-k — exact, O(n) per probe, the
   right answer up to ~10^8 vectors per probe batch;
2. label/IVF-blocked pairs — candidate space restricted to a block;
3. hyperplane LSH — sign-of-dot-product bucket keys turn ANN into a
   bucket equi-join; at 100 TB add multi-probe + several tables.

The random hyperplanes are a fixed literal matrix (seeded PRNG,
frozen below) shared verbatim by the Spark plan and the DuckDB
oracle, so even the "approximate" path is value-checked.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from streamz_postgres_spark.catalog import load_table
from streamz_postgres_spark.functions.numeric import (
    dsum,
    qround,
    sql_davg,
    sql_dstddev_samp,
    sql_dsum,
    sql_qround,
)
from streamz_postgres_spark.functions.vector import (
    dist2,
    dot,
    int_dot,
    l2_norm,
    sql_dist2,
    sql_dot,
    sql_int_dot,
    sql_l2_norm,
)
from streamz_postgres_spark.registry import register

_DIM = 64
_N_PLANES = 4
_PROBE_VEC_ID = 0
_TOP_K = 20


def _vecs_parallel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """embeddings repartitioned to the session's parallelism — the
    embeddings twin of dedup._docs_parallel (round-6 scale-curve
    catch): a small single-file embeddings table is ONE input split,
    and when the blocked pairwise join broadcasts, every per-block
    cosine lands in that ONE probe task — the 10x replica measured
    3x SLOWER than the 30x replica because the latter's file size
    tipped the join into a 32-way shuffle while the former serialized
    ~54M dot products onto one core. One cheap re-split buys full
    parallelism for the compute-heavy probe stage; at 100 TB inputs
    are already many splits and this is a no-op choice."""
    e = load_table(spark, sf_dir, "embeddings")
    return e.repartition(spark.sparkContext.defaultParallelism, "vec_id")

# IVF: 8 cells seeded from fixed vec_ids (the "trained" centroids —
# at scale these come from a k-means|| sample job, written to a tiny
# broadcast table exactly like this one); probe scans nprobe cells.
_IVF_N_CELLS = 8
_IVF_NPROBE = 2


def _planes() -> list[list[float]]:
    """Fixed pseudo-random hyperplanes (seeded, 4 decimals)."""
    rng = random.Random(42)
    return [
        [round(rng.uniform(-1.0, 1.0), 4) for _ in range(_DIM)]
        for _ in range(_N_PLANES)
    ]


_PLANES = _planes()


def _sql_vec(vals: list[float]) -> str:
    return "[" + ", ".join(f"CAST({v} AS DOUBLE)" for v in vals) + "]"


def _sql_norm(e: str) -> str:
    return sql_l2_norm(e)


@register(
    "q_sim_cosine",
    oracle=f"""
WITH v AS (
  SELECT vec_id, label,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e,
         {_sql_norm('embedding')} AS nrm
  FROM embeddings
),
probe AS (SELECT e AS pe, nrm AS pnrm FROM v WHERE vec_id = {_PROBE_VEC_ID})
SELECT vec_id, label,
       {sql_dot('e', 'pe')} / (nrm * pnrm) AS cosine
FROM v, probe
WHERE vec_id <> {_PROBE_VEC_ID}
ORDER BY cosine DESC, vec_id
LIMIT {_TOP_K}
""",
    tags=("similarity",),
)
def q_sim_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k for one probe vector: the probe is a
    broadcast 1-row dimension, the dot product is a codegen'd
    higher-order fold (no UDF, no Python), and top-k compiles to
    TakeOrderedAndProject — O(n) scan + per-partition heaps, no
    global sort. Exact baseline for the ANN path below."""
    e = load_table(spark, sf_dir, "embeddings")
    v = e.select(
        "vec_id", "label", F.col("embedding").alias("e"),
        l2_norm(F.col("embedding")).alias("nrm"),
    )
    probe = F.broadcast(
        v.filter(F.col("vec_id") == _PROBE_VEC_ID).select(
            F.col("e").alias("pe"), F.col("nrm").alias("pnrm")
        )
    )
    cosine = F.try_divide(dot(F.col("e"), F.col("pe")), F.col("nrm") * F.col("pnrm"))
    return (
        v.crossJoin(probe)
        .filter(F.col("vec_id") != _PROBE_VEC_ID)
        .select("vec_id", "label", cosine.alias("cosine"))
        .orderBy(F.col("cosine").desc(), "vec_id")
        .limit(_TOP_K)
    )


def blocked_cosine_pairs(
    spark: SparkSession, sf_dir: str, threshold: float
) -> DataFrame:
    """All-pairs cosine similarity >= threshold within a label block.
    The label is the blocking key (IVF-cell stand-in): the join is an
    equi join on label, never an unblocked cross join. Shared by
    q_sim_pairs and q_dedup_embed (same pipeline, different
    thresholds). The probe side is re-split first (_vecs_parallel) so
    a single-file input cannot serialize the per-block cosines onto
    one task."""
    e = _vecs_parallel(spark, sf_dir)
    v = e.select(
        "vec_id", "label", F.col("embedding").alias("e"),
        l2_norm(F.col("embedding")).alias("nrm"),
    )
    b = v.select(
        F.col("vec_id").alias("vec_b"),
        F.col("label").alias("label_b"),
        F.col("e").alias("e_b"),
        F.col("nrm").alias("nrm_b"),
    )
    cosine = F.try_divide(dot(F.col("e"), F.col("e_b")), F.col("nrm") * F.col("nrm_b"))
    return (
        v.join(b, (F.col("label") == F.col("label_b")) & (F.col("vec_id") < F.col("vec_b")))
        .select(
            F.col("vec_id").alias("vec_a"), "vec_b", "label",
            cosine.alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def sql_blocked_cosine_pairs(threshold: float) -> str:
    """DuckDB mirror of :func:`blocked_cosine_pairs`."""
    return f"""
WITH v AS (
  SELECT vec_id, label,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e,
         {_sql_norm('embedding')} AS nrm
  FROM embeddings
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label,
       {sql_dot('a.e', 'b.e')} / (a.nrm * b.nrm) AS cosine
FROM v a JOIN v b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE {sql_dot('a.e', 'b.e')} / (a.nrm * b.nrm) >= {threshold}
"""


@register(
    "q_sim_pairs",
    oracle=sql_blocked_cosine_pairs(0.35),
    tags=("similarity",),
)
def q_sim_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-pairs similarity >= 0.35 within a label block (see
    :func:`blocked_cosine_pairs` for the plan shape)."""
    return blocked_cosine_pairs(spark, sf_dir, 0.35)


def _bucket_sql(e: str) -> str:
    bits = []
    for i, plane in enumerate(_PLANES):
        d = sql_dot(e, _sql_vec(plane))
        bits.append(f"(CASE WHEN {d} >= 0 THEN 1 ELSE 0 END) * {1 << i}")
    return " + ".join(bits)


@register(
    "q_sim_ann_lsh",
    oracle=f"""
WITH v AS (
  SELECT vec_id, label,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e,
         {_sql_norm('embedding')} AS nrm
  FROM embeddings
),
hashed AS (
  SELECT vec_id, label, e, nrm, {_bucket_sql('e')} AS bucket FROM v
),
probe AS (SELECT e AS pe, nrm AS pnrm, bucket AS pbucket
          FROM hashed WHERE vec_id = {_PROBE_VEC_ID})
SELECT vec_id, label, bucket,
       {sql_dot('e', 'pe')} / (nrm * pnrm) AS cosine
FROM hashed, probe
WHERE bucket = pbucket AND vec_id <> {_PROBE_VEC_ID}
ORDER BY cosine DESC, vec_id
LIMIT 10
""",
    tags=("similarity", "lsh"),
)
def q_sim_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate NN via random-hyperplane LSH: bucket = sign bits
    of 4 fixed hyperplane dot products; candidates = probe's bucket
    only; exact cosine re-ranking inside the bucket. This turns ANN
    into a bucket equi-join — the scan partitions by bucket and only
    ~1/16 of vectors are ranked. At 100 TB: multiple hash tables +
    multi-probe for recall, same plan shape."""
    e = load_table(spark, sf_dir, "embeddings")
    v = e.select(
        "vec_id", "label", F.col("embedding").alias("e"),
        l2_norm(F.col("embedding")).alias("nrm"),
    )
    bucket = None
    for i, plane in enumerate(_PLANES):
        pl = F.array(*[F.lit(x) for x in plane])
        bit = F.when(dot(F.col("e"), pl) >= 0, F.lit(1)).otherwise(F.lit(0))
        term = bit * F.lit(1 << i)
        bucket = term if bucket is None else bucket + term
    hashed = v.withColumn("bucket", bucket)
    probe = F.broadcast(
        hashed.filter(F.col("vec_id") == _PROBE_VEC_ID).select(
            F.col("e").alias("pe"),
            F.col("nrm").alias("pnrm"),
            F.col("bucket").alias("pbucket"),
        )
    )
    cosine = F.try_divide(dot(F.col("e"), F.col("pe")), F.col("nrm") * F.col("pnrm"))
    return (
        hashed.join(probe, F.col("bucket") == F.col("pbucket"))
        .filter(F.col("vec_id") != _PROBE_VEC_ID)
        .select("vec_id", "label", "bucket", cosine.alias("cosine"))
        .orderBy(F.col("cosine").desc(), "vec_id")
        .limit(10)
    )


@register(
    "q_sim_ann_ivf",
    oracle=f"""
WITH v AS (
  SELECT vec_id, label,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e,
         {_sql_norm('embedding')} AS nrm
  FROM embeddings
),
c AS (
  SELECT vec_id AS cent_id, e AS ce, nrm AS cnrm
  FROM v WHERE vec_id < {_IVF_N_CELLS}
),
scored AS (
  SELECT v.vec_id, v.label, v.e, v.nrm, c.cent_id,
         {sql_dot('v.e', 'c.ce')} / (v.nrm * c.cnrm) AS csim
  FROM v, c
),
assigned AS (
  SELECT vec_id, label, e, nrm, cent_id AS cell FROM (
    SELECT *, row_number() OVER (
      PARTITION BY vec_id ORDER BY csim DESC, cent_id) AS rn
    FROM scored
  ) r WHERE rn = 1
),
pcells AS (
  SELECT cent_id AS pcell FROM scored
  WHERE vec_id = {_PROBE_VEC_ID}
  ORDER BY csim DESC, cent_id LIMIT {_IVF_NPROBE}
),
probe AS (SELECT e AS pe, nrm AS pnrm FROM v WHERE vec_id = {_PROBE_VEC_ID})
SELECT a.vec_id, a.label, a.cell,
       {sql_dot('a.e', 'probe.pe')} / (a.nrm * probe.pnrm) AS cosine
FROM assigned a JOIN pcells ON a.cell = pcells.pcell, probe
WHERE a.vec_id <> {_PROBE_VEC_ID}
ORDER BY cosine DESC, vec_id
LIMIT 10
""",
    tags=("similarity", "ivf"),
)
def q_sim_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: assign every vector to its nearest of 8 fixed
    centroid cells (cosine argmax, ties to the lowest cent_id), then
    search only the probe's nprobe=2 nearest cells with exact cosine
    re-ranking.

    Scale shape: the centroid table is a tiny broadcast dimension
    (real IVF ships its codebook to every node the same way), cell
    assignment is one broadcast-join + map-side-combinable argmax
    groupBy — no window shuffle-and-sort, no cross join — and the
    candidate scan touches ~nprobe/n_cells of the data. At 100 TB the
    assignment is precomputed once and stored as a partition column,
    turning probes into partition-pruned scans."""
    e = load_table(spark, sf_dir, "embeddings")
    v = e.select(
        "vec_id", "label", F.col("embedding").alias("e"),
        l2_norm(F.col("embedding")).alias("nrm"),
    )
    cents = F.broadcast(
        v.filter(F.col("vec_id") < _IVF_N_CELLS).select(
            F.col("vec_id").alias("cent_id"),
            F.col("e").alias("ce"),
            F.col("nrm").alias("cnrm"),
        )
    )
    csim = F.try_divide(dot(F.col("e"), F.col("ce")), F.col("nrm") * F.col("cnrm"))
    scored = v.crossJoin(cents).withColumn("csim", csim)

    # argmax centroid per vector: lexicographic max over
    # (csim, -cent_id) == highest similarity, ties to lowest cent_id.
    # groupBy + max(struct) gets a map-side partial aggregate; label/
    # e/nrm are constant within a group so any_value is deterministic.
    best = F.max(
        F.struct(F.col("csim").alias("c"), (-F.col("cent_id")).alias("nc"))
    ).alias("best")
    assigned = (
        scored.groupBy("vec_id")
        .agg(
            best,
            F.any_value("label").alias("label"),
            F.any_value("e").alias("e"),
            F.any_value("nrm").alias("nrm"),
        )
        .select(
            "vec_id", "label", "e", "nrm",
            (-F.col("best.nc")).alias("cell"),
        )
    )

    pcells = F.broadcast(
        scored.filter(F.col("vec_id") == _PROBE_VEC_ID)
        .orderBy(F.col("csim").desc(), "cent_id")
        .limit(_IVF_NPROBE)
        .select(F.col("cent_id").alias("pcell"))
    )
    probe = F.broadcast(
        v.filter(F.col("vec_id") == _PROBE_VEC_ID).select(
            F.col("e").alias("pe"), F.col("nrm").alias("pnrm")
        )
    )
    cosine = F.try_divide(dot(F.col("e"), F.col("pe")), F.col("nrm") * F.col("pnrm"))
    return (
        assigned.join(pcells, F.col("cell") == F.col("pcell"))
        .crossJoin(probe)
        .filter(F.col("vec_id") != _PROBE_VEC_ID)
        .select("vec_id", "label", "cell", cosine.alias("cosine"))
        .orderBy(F.col("cosine").desc(), "vec_id")
        .limit(10)
    )


@register(
    "q_sim_ann_multiprobe",
    oracle=f"""
WITH v AS (
  SELECT vec_id, label,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e,
         {_sql_norm('embedding')} AS nrm
  FROM embeddings
),
hashed AS (
  SELECT vec_id, label, e, nrm, {_bucket_sql('e')} AS bucket FROM v
),
probe AS (SELECT e AS pe, nrm AS pnrm, bucket AS pbucket
          FROM hashed WHERE vec_id = {_PROBE_VEC_ID}),
probe_buckets AS (
  SELECT pe, pnrm, unnest([pbucket,
                           xor(pbucket, 1), xor(pbucket, 2),
                           xor(pbucket, 4), xor(pbucket, 8)]) AS pb
  FROM probe
)
SELECT vec_id, label, bucket,
       {sql_dot('e', 'pe')} / (nrm * pnrm) AS cosine
FROM hashed h JOIN probe_buckets p ON h.bucket = p.pb
WHERE vec_id <> {_PROBE_VEC_ID}
ORDER BY cosine DESC, vec_id
LIMIT 10
""",
    tags=("similarity", "lsh"),
)
def q_sim_ann_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe LSH ANN: besides the probe's own bucket, also
    probe the 4 buckets at Hamming distance 1 (one hyperplane sign
    flipped — the buckets a near neighbor most likely fell into).
    5 of 16 buckets are scanned instead of 1: the standard
    recall/cost dial (Lv et al., public algorithm) that makes one
    hash table behave like several without re-hashing. Plan shape is
    unchanged — broadcast probe-bucket list, bucket equi-join, exact
    cosine re-rank, TakeOrdered top-k."""
    e = load_table(spark, sf_dir, "embeddings")
    v = e.select(
        "vec_id", "label", F.col("embedding").alias("e"),
        l2_norm(F.col("embedding")).alias("nrm"),
    )
    bucket = None
    for i, plane in enumerate(_PLANES):
        pl = F.array(*[F.lit(x) for x in plane])
        bit = F.when(dot(F.col("e"), pl) >= 0, F.lit(1)).otherwise(F.lit(0))
        term = bit * F.lit(1 << i)
        bucket = term if bucket is None else bucket + term
    hashed = v.withColumn("bucket", bucket)
    probe = (
        hashed.filter(F.col("vec_id") == _PROBE_VEC_ID)
        .select(
            F.col("e").alias("pe"),
            F.col("nrm").alias("pnrm"),
            F.explode(
                F.array(
                    F.col("bucket"),
                    *[
                        F.col("bucket").bitwiseXOR(F.lit(1 << i))
                        for i in range(_N_PLANES)
                    ],
                )
            ).alias("pb"),
        )
    )
    cosine = F.try_divide(dot(F.col("e"), F.col("pe")), F.col("nrm") * F.col("pnrm"))
    return (
        hashed.join(F.broadcast(probe), F.col("bucket") == F.col("pb"))
        .filter(F.col("vec_id") != _PROBE_VEC_ID)
        .select("vec_id", "label", "bucket", cosine.alias("cosine"))
        .orderBy(F.col("cosine").desc(), "vec_id")
        .limit(10)
    )


@register(
    "q_centroids",
    oracle=f"""
WITH ex AS (
  SELECT label,
         generate_subscripts(embedding, 1) - 1 AS dim,
         unnest(embedding) AS v
  FROM embeddings
)
SELECT label, dim,
       {sql_dsum('CAST(v AS DOUBLE)')} / COUNT(*) AS centroid,
       COUNT(*) AS n_vecs
FROM ex
GROUP BY label, dim
""",
    tags=("similarity", "vector"),
)
def q_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroids — the codebook-training step
    behind the IVF index (q_sim_ann_ivf consumes exactly this shape)
    and one Lloyd/k-means iteration's M-step.

    posexplode flattens vectors to (label, dim, value) so the mean is
    a plain hash aggregation: map-side partial sums collapse each
    (label, dim) cell within every partition BEFORE the exchange, so
    shuffle bytes are O(labels × dims), independent of corpus size —
    the property that makes codebook (re)training over 100 TB of
    embeddings a cheap job. Sums run through the exact decimal
    accumulator, so the centroids are bit-identical regardless of
    partitioning (a re-trained codebook reproduces exactly)."""
    from streamz_postgres_spark.functions.numeric import dsum

    e = load_table(spark, sf_dir, "embeddings")
    ex = e.select("label", F.posexplode("embedding").alias("dim", "v"))
    return ex.groupBy("label", "dim").agg(
        (dsum(F.col("v").cast("double")) / F.count(F.lit(1))).alias("centroid"),
        F.count(F.lit(1)).alias("n_vecs"),
    )


_IVFB_PROBE_MOD = 100  # vec_id % 100 == 7 -> 5 probes at sf0.01
_IVFB_K = 5


@register(
    "q_knn_ivf_batch",
    oracle=f"""
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e,
         {_sql_norm('embedding')} AS nrm
  FROM embeddings
),
c AS (
  SELECT vec_id AS cent_id, e AS ce, nrm AS cnrm
  FROM v WHERE vec_id < {_IVF_N_CELLS}
),
scored AS (
  SELECT v.vec_id, v.e, v.nrm, c.cent_id,
         {sql_dot('v.e', 'c.ce')} / (v.nrm * c.cnrm) AS csim
  FROM v, c
),
assigned AS (
  SELECT vec_id, e, nrm, cent_id AS cell FROM (
    SELECT *, row_number() OVER (
      PARTITION BY vec_id ORDER BY csim DESC, cent_id) AS rn
    FROM scored
  ) r WHERE rn = 1
),
pcells AS (
  SELECT vec_id AS probe_id, cent_id AS pcell FROM (
    SELECT *, row_number() OVER (
      PARTITION BY vec_id ORDER BY csim DESC, cent_id) AS rn
    FROM scored WHERE vec_id % {_IVFB_PROBE_MOD} = 7
  ) r WHERE rn <= {_IVF_NPROBE}
),
probe AS (
  SELECT vec_id AS probe_id, e AS pe, nrm AS pnrm
  FROM v WHERE vec_id % {_IVFB_PROBE_MOD} = 7
)
SELECT probe_id, vec_id, cell, cosine FROM (
  SELECT p.probe_id, a.vec_id, a.cell,
         {sql_dot('a.e', 'p.pe')} / (a.nrm * p.pnrm) AS cosine,
         row_number() OVER (
           PARTITION BY p.probe_id
           ORDER BY {sql_dot('a.e', 'p.pe')} / (a.nrm * p.pnrm) DESC, a.vec_id
         ) AS rn
  FROM assigned a
  JOIN pcells pc ON a.cell = pc.pcell
  JOIN probe p ON p.probe_id = pc.probe_id
  WHERE a.vec_id <> p.probe_id
) t
WHERE rn <= {_IVFB_K}
""",
    tags=("similarity", "ivf", "pipeline"),
)
def q_knn_ivf_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched ANN retrieval through the IVF index: every probe in
    the batch searches only its nprobe=2 nearest cells, with exact
    cosine re-ranking of the candidates — q_sim_ann_ivf's index
    strategy × q_knn_batch's many-probes shape, the plan a vector
    store executes for a retrieval batch.

    Scale shape: cell assignment is the broadcast-codebook argmax
    (map-side combinable, precomputed as a partition column in
    production); the probe→cell map is tiny and broadcast, so the
    candidate generation is ONE equi-join on cell id touching
    ~nprobe/n_cells of the corpus; per-probe top-k is the two-phase
    window (partition-local then global) so no task ever sees a
    whole probe's candidate set."""
    e = load_table(spark, sf_dir, "embeddings")
    v = e.select(
        "vec_id",
        F.col("embedding").alias("e"),
        l2_norm(F.col("embedding")).alias("nrm"),
    )
    cents = F.broadcast(
        v.filter(F.col("vec_id") < _IVF_N_CELLS).select(
            F.col("vec_id").alias("cent_id"),
            F.col("e").alias("ce"),
            F.col("nrm").alias("cnrm"),
        )
    )
    csim = F.try_divide(dot(F.col("e"), F.col("ce")), F.col("nrm") * F.col("cnrm"))
    scored = v.crossJoin(cents).withColumn("csim", csim)
    best = F.max(
        F.struct(F.col("csim").alias("c"), (-F.col("cent_id")).alias("nc"))
    ).alias("best")
    assigned = (
        scored.groupBy("vec_id")
        .agg(best, F.any_value("e").alias("e"), F.any_value("nrm").alias("nrm"))
        .select("vec_id", "e", "nrm", (-F.col("best.nc")).alias("cell"))
    )

    is_probe = F.col("vec_id") % _IVFB_PROBE_MOD == 7
    w_cells = Window.partitionBy("vec_id").orderBy(
        F.col("csim").desc(), "cent_id"
    )
    pcells = F.broadcast(
        scored.filter(is_probe)
        .withColumn("rn", F.row_number().over(w_cells))
        .filter(F.col("rn") <= _IVF_NPROBE)
        .select(F.col("vec_id").alias("probe_id"), F.col("cent_id").alias("pcell"))
    )
    probe = F.broadcast(
        v.filter(is_probe).select(
            F.col("vec_id").alias("probe_id"),
            F.col("e").alias("pe"),
            F.col("nrm").alias("pnrm"),
        )
    )
    cosine = F.try_divide(dot(F.col("e"), F.col("pe")), F.col("nrm") * F.col("pnrm"))
    cands = (
        assigned.join(pcells, assigned.cell == pcells.pcell)
        .join(probe, "probe_id")
        .filter(F.col("vec_id") != F.col("probe_id"))
        .select(
            "probe_id",
            "vec_id",
            "cell",
            cosine.alias("cosine"),
            F.spark_partition_id().alias("__pid"),
        )
    )
    w_local = Window.partitionBy("probe_id", "__pid").orderBy(
        F.col("cosine").desc(), "vec_id"
    )
    w_global = Window.partitionBy("probe_id").orderBy(
        F.col("cosine").desc(), "vec_id"
    )
    return (
        cands.withColumn("__rn", F.row_number().over(w_local))
        .filter(F.col("__rn") <= _IVFB_K)
        .withColumn("__rn2", F.row_number().over(w_global))
        .filter(F.col("__rn2") <= _IVFB_K)
        .select("probe_id", "vec_id", "cell", "cosine")
    )


_SWEEP_THRESHOLDS = (0.30, 0.40, 0.50, 0.60, 0.70, 0.80)


@register(
    "q_sim_threshold_sweep",
    oracle=f"""
WITH pairs AS ({sql_blocked_cosine_pairs(0.30)})
SELECT t.threshold,
       CAST(COALESCE(SUM(CASE WHEN p.cosine >= t.threshold
                              THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_pairs
FROM (SELECT CAST(unnest({list(_SWEEP_THRESHOLDS)}) AS DOUBLE)
        AS threshold) t
LEFT JOIN pairs p ON TRUE
GROUP BY t.threshold
""",
    tags=("similarity", "report"),
)
def q_sim_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold-calibration sweep: near-dup pair counts at each
    candidate cosine cutoff, from ONE pass over the blocked pair
    space — the report that picks a semantic-dedup threshold before
    committing a 100 TB run to it. Pairs are computed once at the
    loosest threshold; each stricter count is a conditional agg over
    the same rows (map-side combined), so the sweep costs exactly
    one blocked all-pairs pass regardless of how many thresholds it
    reports."""
    pairs = blocked_cosine_pairs(spark, sf_dir, _SWEEP_THRESHOLDS[0])
    counts = pairs.agg(
        *[
            F.count_if(F.col("cosine") >= F.lit(t)).alias(f"t{i}")
            for i, t in enumerate(_SWEEP_THRESHOLDS)
        ]
    )
    # one wide row -> (threshold, n_pairs) rows; stack is a map-only
    # reshape of a single row
    stack_expr = ", ".join(
        f"CAST({t} AS DOUBLE), t{i}" for i, t in enumerate(_SWEEP_THRESHOLDS)
    )
    return counts.select(
        F.expr(
            f"stack({len(_SWEEP_THRESHOLDS)}, {stack_expr}) "
            "AS (threshold, n_pairs)"
        )
    ).select("threshold", F.col("n_pairs").cast("long").alias("n_pairs"))


_KNN_GRAPH_K = 3


@register(
    "q_knn_graph",
    oracle=f"""
WITH v AS (
  SELECT vec_id, label,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e,
         {_sql_norm('embedding')} AS nrm
  FROM embeddings
),
pairs AS (
  SELECT a.vec_id, b.vec_id AS neighbor,
         {sql_dot('a.e', 'b.e')} / (a.nrm * b.nrm) AS cosine
  FROM v a JOIN v b ON a.label = b.label AND a.vec_id <> b.vec_id
),
ranked AS (
  SELECT vec_id, neighbor, cosine,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY cosine DESC, neighbor) AS rk
  FROM pairs
)
SELECT vec_id, neighbor, cosine, CAST(rk AS BIGINT) AS rk
FROM ranked WHERE rk <= {_KNN_GRAPH_K}
""",
    tags=("similarity", "graph"),
)
def q_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The kNN GRAPH over the whole corpus (every vector's top-k
    in-block neighbors) — the structure SemDeDup-style semantic
    dedup and prototype-based data selection build first. Candidates
    come from the label block (the IVF-cell stand-in), so the pair
    space is sum(block^2), never corpus^2; ranking is a per-vector
    window over the block pairs with a deterministic (cosine,
    neighbor-id) tie-break. At 100 TB the block assignment comes
    from the learned IVF codebook (q_sim_ann_ivf) and k stays small,
    so shuffle volume is O(corpus x k) edges out. Probe side re-split
    first (_vecs_parallel) — single-file inputs must not serialize
    the per-block cosines onto one task."""
    e = _vecs_parallel(spark, sf_dir)
    v = e.select(
        "vec_id", "label", F.col("embedding").alias("e"),
        l2_norm(F.col("embedding")).alias("nrm"),
    )
    b = v.select(
        F.col("vec_id").alias("neighbor"),
        F.col("label").alias("label_b"),
        F.col("e").alias("e_b"),
        F.col("nrm").alias("nrm_b"),
    )
    cosine = F.try_divide(dot(F.col("e"), F.col("e_b")), F.col("nrm") * F.col("nrm_b"))
    pairs = v.join(
        b,
        (F.col("label") == F.col("label_b"))
        & (F.col("vec_id") != F.col("neighbor")),
    ).select("vec_id", "neighbor", cosine.alias("cosine"))
    w = Window.partitionBy("vec_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor")
    )
    return (
        pairs.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= _KNN_GRAPH_K)
        .select("vec_id", "neighbor", "cosine", "rk")
    )


# -- centroid-distance outliers ---------------------------------------------

_OUTLIER_Z = -2.0


@register(
    "q_doc_outliers",
    oracle=f"""
WITH v AS (
  SELECT vec_id, label,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e,
         {_sql_norm('embedding')} AS nrm
  FROM embeddings
),
ex AS (
  SELECT label, generate_subscripts(embedding, 1) - 1 AS dim,
         CAST(unnest(embedding) AS DOUBLE) AS val
  FROM embeddings
),
cd AS (
  SELECT label, dim, {sql_dsum('val')} / COUNT(*) AS c
  FROM ex GROUP BY label, dim
),
ce AS (SELECT label, list(c ORDER BY dim) AS ce FROM cd GROUP BY label),
scored AS (
  SELECT v.vec_id, v.label,
         {sql_dot('v.e', 'ce.ce')} / (v.nrm * {sql_l2_norm('ce.ce')})
           AS cos_centroid
  FROM v JOIN ce ON v.label = ce.label
),
stats AS (
  SELECT label,
         {sql_davg('cos_centroid')} AS mu,
         {sql_dstddev_samp('cos_centroid')} AS sigma
  FROM scored GROUP BY label
)
SELECT s.vec_id, s.label, s.cos_centroid,
       (s.cos_centroid - st.mu) / st.sigma AS z
FROM scored s JOIN stats st ON s.label = st.label
WHERE (s.cos_centroid - st.mu) / st.sigma < {_OUTLIER_Z}
""",
    tags=("similarity", "vector", "stats"),
)
def q_doc_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding outliers: vectors whose cosine to their label
    centroid sits more than 2 sigma below the label's mean — the
    standard embedding-space screen for mislabeled / off-topic /
    garbage documents before training. Three cheap aggregations
    compose: the centroid M-step (shuffle O(labels × dims), same as
    q_centroids), a broadcast join scoring every vector against its
    centroid with the deterministic HOF dot, and per-label moment
    stats from exact decimal sums. No pairwise anything — the whole
    screen is linear in the corpus and the flag threshold is
    bit-stable across engines and partitionings."""
    from streamz_postgres_spark.functions.numeric import (
        davg,
        dstddev_samp,
        dsum,
    )

    e = load_table(spark, sf_dir, "embeddings")
    v = e.select(
        "vec_id", "label", F.col("embedding").alias("e"),
        l2_norm(F.col("embedding")).alias("nrm"),
    )
    ex = e.select("label", F.posexplode("embedding").alias("dim", "val"))
    cd = ex.groupBy("label", "dim").agg(
        (dsum(F.col("val").cast("double")) / F.count(F.lit(1))).alias("c")
    )
    ce = cd.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "c"))),
            lambda x: x.c,
        ).alias("ce")
    )
    scored = v.join(F.broadcast(ce), "label").select(
        "vec_id",
        "label",
        (F.try_divide(dot(F.col("e"), F.col("ce")), F.col("nrm") * l2_norm(F.col("ce"))))
        .alias("cos_centroid"),
    )
    stats = scored.groupBy(F.col("label").alias("slabel")).agg(
        davg("cos_centroid").alias("mu"),
        dstddev_samp("cos_centroid").alias("sigma"),
    )
    # try_divide: a one-vector label has sigma NULL (n-1 = 0) and a
    # constant-cosine label has sigma exactly 0 — DuckDB yields NULL
    # (row then fails the < z filter on both engines), Spark's ANSI /
    # would raise (degenerate-cardinality sweep)
    z = F.try_divide(F.col("cos_centroid") - F.col("mu"), F.col("sigma"))
    return (
        scored.join(F.broadcast(stats), F.col("label") == F.col("slabel"))
        .filter(z < _OUTLIER_Z)
        .select("vec_id", "label", "cos_centroid", z.alias("z"))
    )


# -- ANN quality evaluation -------------------------------------------------

_RECALL_K = 10


@register(
    "q_ann_recall",
    oracle=f"""
WITH v AS (
  SELECT vec_id, label,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e,
         {_sql_norm('embedding')} AS nrm
  FROM embeddings
),
hashed AS (
  SELECT vec_id, e, nrm, {_bucket_sql('e')} AS bucket FROM v
),
probes AS (
  SELECT vec_id AS pid, e AS pe, nrm AS pnrm, bucket AS pbucket
  FROM hashed WHERE vec_id % {_IVFB_PROBE_MOD} = 7
),
exact AS (
  SELECT pid, vec_id FROM (
    SELECT p.pid, h.vec_id,
           row_number() OVER (
             PARTITION BY p.pid
             ORDER BY {sql_dot('h.e', 'p.pe')} / (h.nrm * p.pnrm) DESC,
                      h.vec_id) AS rk
    FROM hashed h CROSS JOIN probes p
    WHERE h.vec_id <> p.pid
  ) t WHERE rk <= {_RECALL_K}
),
ann AS (
  SELECT pid, vec_id FROM (
    SELECT p.pid, h.vec_id,
           row_number() OVER (
             PARTITION BY p.pid
             ORDER BY {sql_dot('h.e', 'p.pe')} / (h.nrm * p.pnrm) DESC,
                      h.vec_id) AS rk
    FROM hashed h JOIN probes p ON h.bucket = p.pbucket
    WHERE h.vec_id <> p.pid
  ) t WHERE rk <= {_RECALL_K}
)
SELECT exact.pid,
       CAST(COUNT(*) AS BIGINT) AS n_exact,
       CAST(COUNT(ann.vec_id) AS BIGINT) AS n_hit,
       CAST(COUNT(ann.vec_id) AS DOUBLE) / {_RECALL_K}.0 AS recall_at_k
FROM exact
LEFT JOIN ann ON exact.pid = ann.pid AND exact.vec_id = ann.vec_id
GROUP BY exact.pid
""",
    tags=("similarity", "lsh", "eval"),
)
def q_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@{_RECALL_K} of the hyperplane-LSH index against exact
    brute force, per probe — the eval harness you run BEFORE trusting
    an ANN index on a corpus (and after every re-train/re-hash). Both
    arms share one hashed scan: the exact arm is a broadcast-probe
    cross scoring (the q_knn_batch shape — linear, not quadratic,
    because probes are a tiny fixed panel), the ANN arm is the bucket
    equi-join, and recall is a left-join hit count between the two
    top-k sets. Deterministic (cosine, vec_id) ranking on both arms
    makes the metric bit-stable. At 100 TB: sample the probe panel,
    same plan; the exact arm's cost is |panel| x corpus dot products
    — the price of ground truth, paid on a sample."""
    e = load_table(spark, sf_dir, "embeddings")
    v = e.select(
        "vec_id", F.col("embedding").alias("e"),
        l2_norm(F.col("embedding")).alias("nrm"),
    )
    bucket = None
    for i, plane in enumerate(_PLANES):
        pl = F.array(*[F.lit(x) for x in plane])
        bit = F.when(dot(F.col("e"), pl) >= 0, F.lit(1)).otherwise(F.lit(0))
        term = bit * F.lit(1 << i)
        bucket = term if bucket is None else bucket + term
    hashed = v.withColumn("bucket", bucket)
    probes = F.broadcast(
        hashed.filter(F.col("vec_id") % _IVFB_PROBE_MOD == 7).select(
            F.col("vec_id").alias("pid"),
            F.col("e").alias("pe"),
            F.col("nrm").alias("pnrm"),
            F.col("bucket").alias("pbucket"),
        )
    )
    cosine = F.try_divide(dot(F.col("e"), F.col("pe")), F.col("nrm") * F.col("pnrm"))
    rk = Window.partitionBy("pid").orderBy(
        F.col("cosine").desc(), F.col("vec_id")
    )

    def topk(joined: DataFrame) -> DataFrame:
        return (
            joined.filter(F.col("vec_id") != F.col("pid"))
            .select("pid", "vec_id", cosine.alias("cosine"))
            .withColumn("rk", F.row_number().over(rk))
            .filter(F.col("rk") <= _RECALL_K)
            .select("pid", "vec_id")
        )

    exact = topk(hashed.crossJoin(probes))
    ann = topk(
        hashed.join(probes, F.col("bucket") == F.col("pbucket"))
    ).select(F.col("pid").alias("apid"), F.col("vec_id").alias("avid"))
    hits = exact.join(
        ann,
        (F.col("pid") == F.col("apid")) & (F.col("vec_id") == F.col("avid")),
        "left",
    )
    return hits.groupBy("pid").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_exact"),
        F.count("avid").cast("bigint").alias("n_hit"),
        (F.count("avid").cast("double") / _RECALL_K).alias("recall_at_k"),
    )


# -- int8 embedding quantization audit --------------------------------------


@register(
    "q_embed_quantize",
    oracle=f"""
WITH v AS (
  SELECT vec_id, label,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
),
scaled AS (
  -- NULL guards: list_prepend(0.0, NULL) = [0.0] resurrects a NULL
  -- embedding as scale 0.0 / error 0.0 where Spark's aggregate(NULL)
  -- is NULL (v2 hostile-fixture find, NULL-embedding class)
  SELECT vec_id, label, e,
         CASE WHEN e IS NULL THEN NULL ELSE
         list_reduce(list_prepend(0.0,
           list_transform(e, x -> abs(x))), (a, b) -> greatest(a, b))
           / 127.0 END AS s
  FROM v
),
dq AS (
  SELECT vec_id, label, e, s,
         CASE WHEN s = 0 THEN e
              ELSE list_transform(e, x -> floor(x / s + 0.5) * s)
         END AS q
  FROM scaled
)
SELECT vec_id, label, s AS qscale,
       CASE WHEN e IS NULL THEN NULL ELSE
       list_reduce(list_prepend(0.0,
         list_transform(list_zip(e, q),
                        p -> abs(CAST(p[1] AS DOUBLE)
                                 - CAST(p[2] AS DOUBLE)))),
         (a, b) -> greatest(a, b)) END AS max_abs_err,
       {sql_dot('e', 'q')} / ({sql_l2_norm('e')} * {sql_l2_norm('q')})
         AS cos_fidelity
FROM dq
""",
    tags=("similarity", "vector", "compression"),
)
def q_embed_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization audit for the embedding store —
    the compression every 100 TB vector corpus runs before ANN
    serving (4x smaller, SIMD int8 dot products): per-vector scale =
    max|x|/127, levels = round-half-up(x/scale), and the two numbers
    that decide if it's safe: worst reconstruction error and cosine
    fidelity between the original and dequantized vector. All
    arithmetic is JVM-side HOFs (zero UDFs) with the identical fold
    order mirrored in SQL, so even the quantization error itself is
    value-checked bit-for-bit. Map-only: no shuffle anywhere."""
    e = load_table(spark, sf_dir, "embeddings")
    ed = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    v = e.select("vec_id", "label", ed.alias("e"))
    s = (
        F.aggregate(
            F.col("e"), F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x))
        )
        / F.lit(127.0)
    )
    scaled = v.withColumn("s", s)
    q = F.when(F.col("s") == 0, F.col("e")).otherwise(
        F.transform(
            F.col("e"),
            lambda x: F.floor(x / F.col("s") + F.lit(0.5)) * F.col("s"),
        )
    )
    dq = scaled.withColumn("q", q)
    max_err = F.aggregate(
        F.zip_with(F.col("e"), F.col("q"), lambda a, b: F.abs(a - b)),
        F.lit(0.0),
        lambda acc, x: F.greatest(acc, x),
    )
    cos = F.try_divide(dot(F.col("e"), F.col("q")), l2_norm(F.col("e")) * l2_norm(F.col("q"))
    )
    return dq.select(
        "vec_id",
        "label",
        F.col("s").alias("qscale"),
        max_err.alias("max_abs_err"),
        cos.alias("cos_fidelity"),
    )


# -- k-means (Lloyd) over embeddings ----------------------------------------

_KM_K = 8
_KM_SQL_ITER = """
a{i} AS (
  SELECT vec_id, e, nrm, cl FROM (
    SELECT v.vec_id, v.e, v.nrm, c.cl,
           row_number() OVER (
             PARTITION BY v.vec_id
             ORDER BY {dot} / (v.nrm * c.cnrm) DESC, c.cl) AS rn
    FROM v, c{j}pan c
  ) t WHERE rn = 1
),
m{i} AS (
  SELECT cl, dim, {mean} AS c
  FROM (
    SELECT cl, generate_subscripts(e, 1) - 1 AS dim, unnest(e) AS val
    FROM a{i}
  ) ex
  GROUP BY cl, dim
),
c{i}pan AS (
  SELECT cl, ce, {cnrm} AS cnrm FROM (
    SELECT cl, list(c ORDER BY dim) AS ce FROM m{i} GROUP BY cl
  ) g
)
"""


def _km_sql_iter(i: int, j: str) -> str:
    return _KM_SQL_ITER.format(
        i=i,
        j=j,
        dot=sql_dot("v.e", "c.ce"),
        mean=f"{sql_dsum('val')} / COUNT(*)",
        cnrm=sql_l2_norm("ce"),
    )


#: shared SQL prefix building a2 (final assignment) + c2pan (final
#: centroids) — used by q_kmeans_lloyd and q_dedup_semantic
_KM_SQL_PREFIX = f"""
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e,
         {_sql_norm('embedding')} AS nrm
  FROM embeddings
),
c0pan AS (
  SELECT vec_id AS cl, e AS ce, nrm AS cnrm FROM v WHERE vec_id < {_KM_K}
),
{_km_sql_iter(1, '0')},
{_km_sql_iter(2, '1')}
"""


def kmeans_assignments(spark: SparkSession, sf_dir: str):
    """Two Lloyd iterations over the embeddings; returns
    ``(assignments (vec_id, e, nrm, cl), centroids (cl, ce))`` —
    shared by q_kmeans_lloyd (summary read-out) and q_dedup_semantic
    (within-cluster near-dup pruning). See q_kmeans_lloyd for the
    determinism recipe."""
    from streamz_postgres_spark.functions.numeric import dsum

    e = load_table(spark, sf_dir, "embeddings")
    v = e.select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("e"),
        l2_norm(F.col("embedding")).alias("nrm"),
    )
    cent = v.filter(F.col("vec_id") < _KM_K).select(
        F.col("vec_id").alias("cl"), F.col("e").alias("ce")
    )

    def assign(cent):
        pan = F.broadcast(cent.withColumn("cnrm", l2_norm(F.col("ce"))))
        csim = F.try_divide(dot(F.col("e"), F.col("ce")), F.col("nrm") * F.col("cnrm"))
        w = Window.partitionBy("vec_id").orderBy(F.col("csim").desc(), "cl")
        return (
            v.crossJoin(pan)
            .withColumn("csim", csim)
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("vec_id", "e", "nrm", "cl")
        )

    def update(assigned):
        # NOTE (r13): the PQ-style single-groupBy rewrite (per-dim
        # decimal sums, see _pq_model.update) was A/B'd here and is
        # 3.4x SLOWER at 64 dims (median 4.6 s vs 1.36 s interleaved)
        # — 128 aggregate buffers evaluated per input row lose to the
        # exploded codegen path once the width triples. Kept as the
        # two-stage exploded aggregation on purpose; the rewrite only
        # pays at PQ's 16-dim subspaces.
        ex = assigned.select("cl", F.posexplode("e").alias("dim", "val"))
        cd = ex.groupBy("cl", "dim").agg(
            (dsum("val") / F.count(F.lit(1))).alias("c")
        )
        return cd.groupBy("cl").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "c"))),
                lambda x: x.c,
            ).alias("ce")
        )

    a2 = assign(update(assign(cent)))
    return a2, update(a2)


@register(
    "q_kmeans_lloyd",
    oracle=f"""
{_KM_SQL_PREFIX}
SELECT a2.cl AS cluster,
       CAST(COUNT(*) AS BIGINT) AS n_vecs,
       {sql_davg(sql_dot('a2.e', 'c.ce') + ' / (a2.nrm * c.cnrm)')} AS avg_cos
FROM a2 JOIN c2pan c ON a2.cl = c.cl
GROUP BY a2.cl
""",
    tags=("similarity", "vector", "clustering"),
)
def q_kmeans_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-means over the embedding corpus: TWO full Lloyd iterations
    (assign to nearest of {k} centroids by cosine -> recompute
    centroids as exact per-dim decimal means), seeded with the first
    {k} vectors, read out as per-cluster size and mean cosine to the
    final centroid. Every step is engine-deterministic — HOF dot
    products fold in dim order, per-dim means use the exact decimal
    accumulator, centroid arrays are assembled in sorted dim order,
    ties break on cluster id — so the oracle value-checks the WHOLE
    iterative clustering, not a summary.

    Scale shape: each iteration is one broadcast of the K x d
    codebook + a row_number over K candidate rows per vector (the
    q_sim_ann_ivf assignment), then the q_centroids M-step whose
    shuffle is O(K x d) after map-side combine — at 100 TB the
    iteration cost is two scans, no pairwise anything. More
    iterations = chain more rounds (production would loop with
    localCheckpoint like connected_components)."""
    from streamz_postgres_spark.functions.numeric import davg, dsum

    a2, m2 = kmeans_assignments(spark, sf_dir)
    pan = F.broadcast(m2.withColumn("cnrm", l2_norm(F.col("ce"))))
    cos = F.try_divide(dot(F.col("e"), F.col("ce")), F.col("nrm") * F.col("cnrm"))
    return (
        a2.join(pan, "cl")
        .select(F.col("cl").alias("cluster"), cos.alias("cos"))
        .groupBy("cluster")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
            davg("cos").alias("avg_cos"),
        )
    )


# -- dominant direction (power iteration) -----------------------------------

_PC_SQL_ITER = """
d{i} AS (
  SELECT v.vec_id, v.label, v.e, v.nrm2,
         {dot} AS t
  FROM v JOIN p{j} c ON v.label = c.label
),
s{i} AS (
  SELECT label, dim, {mean} AS s
  FROM (
    SELECT label, t, generate_subscripts(e, 1) - 1 AS dim,
           unnest(e) AS val
    FROM d{i}
  ) ex
  GROUP BY label, dim
),
p{i} AS (
  SELECT label,
         list_transform(ve, x -> x / {norm}) AS ce
  FROM (
    SELECT label, list(s ORDER BY dim) AS ve FROM s{i} GROUP BY label
  ) g
)
"""


def _pc_sql_iter(i: int, j: str) -> str:
    return _PC_SQL_ITER.format(
        i=i,
        j=j,
        dot=sql_dot("v.e", "c.ce"),
        mean=f"{sql_dsum('t * val')} / COUNT(*)",
        norm=sql_l2_norm("ve"),
    )


@register(
    "q_embed_pc1",
    oracle=f"""
WITH v AS (
  SELECT vec_id, label,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e,
         {_sql_norm('embedding')} * {_sql_norm('embedding')} AS nrm2
  FROM embeddings
),
dims AS (SELECT len(embedding) AS d FROM embeddings LIMIT 1),
p0 AS (
  SELECT label,
         list_transform(e, x -> 0.125) AS ce
  FROM (SELECT DISTINCT label, e FROM (
          SELECT label, e, row_number() OVER (PARTITION BY label
                   ORDER BY vec_id) AS rn FROM v) t WHERE rn = 1) seed
),
{_pc_sql_iter(1, '0')},
{_pc_sql_iter(2, '1')}
SELECT d.label,
       CAST(COUNT(*) AS BIGINT) AS n_vecs,
       {sql_dsum('(t_f * t_f)')} / {sql_dsum('nrm2')} AS anisotropy
FROM (
  SELECT v.vec_id, v.label, v.nrm2, {sql_dot('v.e', 'c.ce')} AS t_f
  FROM v JOIN p2 c ON v.label = c.label
) d
GROUP BY d.label
""",
    tags=("similarity", "vector", "stats"),
)
def q_embed_pc1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dominant-direction (top principal component, uncentered) per
    label via TWO power iterations — the anisotropy diagnostic: what
    fraction of a label's embedding energy lies along one direction
    (the 'all vectors share a huge common component' pathology of
    embedding spaces that silently breaks cosine retrieval). Each
    iteration scores every vector against the current direction (HOF
    dot, dim-ordered fold), accumulates t·x_j per dimension through
    exact decimal sums, reassembles the direction in sorted dim
    order and normalizes — the q_kmeans_lloyd parity recipe applied
    to an eigenvector solver. Readout per label: vector count and
    anisotropy = Σ(x·v)² / Σ|x|² ∈ (0, 1]. Scale: per iteration one
    broadcast of the L×d direction panel + an O(L×d) decimal-agg
    shuffle; linear in the corpus, no pairwise work."""
    from streamz_postgres_spark.functions.numeric import dsum

    e = load_table(spark, sf_dir, "embeddings")
    v = e.select(
        "vec_id",
        "label",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("e"),
        (l2_norm(F.col("embedding")) * l2_norm(F.col("embedding"))).alias(
            "nrm2"
        ),
    )
    # v0 = uniform 1/8 direction (d=64 -> unit norm), one row per label
    p = v.groupBy("label").agg(
        F.transform(F.first("e"), lambda _: F.lit(0.125)).alias("ce")
    )

    def power_iter(p):
        pan = F.broadcast(p)
        t = dot(F.col("e"), F.col("ce"))
        scored = v.join(pan, "label").select("label", "e", t.alias("t"))
        ex = scored.select(
            "label", "t", F.posexplode("e").alias("dim", "val")
        )
        sd = ex.groupBy("label", "dim").agg(
            (dsum(F.col("t") * F.col("val")) / F.count(F.lit(1))).alias("s")
        )
        ve = sd.groupBy("label").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "s"))),
                lambda x: x.s,
            ).alias("ve")
        )
        return ve.select(
            "label",
            F.transform(
                F.col("ve"), lambda x: x / l2_norm(F.col("ve"))
            ).alias("ce"),
        )

    p2 = power_iter(power_iter(p))
    t_f = dot(F.col("e"), F.col("ce"))
    scored = v.join(F.broadcast(p2), "label").select(
        "label", "nrm2", t_f.alias("t_f")
    )
    return scored.groupBy("label").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
        (dsum(F.col("t_f") * F.col("t_f")) / dsum("nrm2")).alias("anisotropy"),
    )


# -- SemDeDup: semantic dedup within k-means clusters -----------------------

_SEMDEDUP_COS = 0.55


@register(
    "q_dedup_semantic",
    oracle=f"""
{_KM_SQL_PREFIX}
, pairs AS (
  SELECT a.cl, a.vec_id AS keep_id, b.vec_id AS prune_id
  FROM a2 a JOIN a2 b
    ON a.cl = b.cl AND a.vec_id < b.vec_id
  WHERE {sql_dot('a.e', 'b.e')} / (a.nrm * b.nrm) >= {_SEMDEDUP_COS}
),
pruned AS (SELECT DISTINCT cl, prune_id FROM pairs)
SELECT a2.cl AS cluster,
       CAST(COUNT(*) AS BIGINT) AS n_vecs,
       CAST(COUNT(p.prune_id) AS BIGINT) AS n_pruned,
       CAST(COUNT(p.prune_id) AS DOUBLE) / COUNT(*) AS prune_frac
FROM a2
LEFT JOIN pruned p ON p.cl = a2.cl AND p.prune_id = a2.vec_id
GROUP BY a2.cl
""",
    tags=("dedup", "similarity", "clustering"),
)
def q_dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (public method, Abbas et al.): semantic dedup that
    only compares vectors WITHIN their k-means cluster — the
    clustering (two value-checked Lloyd iterations, shared with
    q_kmeans_lloyd) is the blocking structure, so the pairwise pass
    is O(Σ cluster²) instead of O(n²) and cluster count scales with
    the corpus (the bounded-block contract SCALE.md measures). A
    vector is pruned when any lower-id cluster-mate has cosine ≥
    {_SEMDEDUP_COS}; the read-out reports per-cluster size, pruned
    count and prune fraction — the dataset-shrink decision number.
    The label-blocked q_dedup_embed covers the fixed-taxonomy case;
    this is the learned-blocking version a real curation run uses."""
    a2, _ = kmeans_assignments(spark, sf_dir)
    # pin the pair-enumeration fan-out (r13, guide §2.5): the
    # within-cluster self-join is the O(Σ cluster²) cosine pass, but
    # its ~1 MB of shuffle bytes made AQE coalesce it onto ONE task
    # (measured 2.8 s CPU serial) — byte-based sizing starves
    # compute-dense stages. Hash on cl keeps the self-join
    # co-partitioned (no extra exchange for the join itself).
    a2 = a2.repartition(spark.sparkContext.defaultParallelism, "cl")
    b = a2.select(
        F.col("cl").alias("cl_b"),
        F.col("vec_id").alias("vec_b"),
        F.col("e").alias("e_b"),
        F.col("nrm").alias("nrm_b"),
    )
    cos = F.try_divide(dot(F.col("e"), F.col("e_b")), F.col("nrm") * F.col("nrm_b"))
    pruned = (
        a2.join(
            b,
            (F.col("cl") == F.col("cl_b"))
            & (F.col("vec_id") < F.col("vec_b")),
        )
        .withColumn("cos", cos)
        .filter(F.col("cos") >= _SEMDEDUP_COS)
        .select("cl", F.col("vec_b").alias("prune_id"))
        .distinct()
    )
    flagged = a2.alias("L").join(
        pruned.alias("P"),
        (F.col("L.cl") == F.col("P.cl"))
        & (F.col("L.vec_id") == F.col("P.prune_id")),
        "left",
    )
    return flagged.groupBy(F.col("L.cl").alias("cluster")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
        F.count("P.prune_id").cast("bigint").alias("n_pruned"),
        (F.count("P.prune_id").cast("double") / F.count(F.lit(1))).alias(
            "prune_frac"
        ),
    )


@register(
    "q_sim_ann_ivf_int8",
    oracle=f"""
WITH v AS (
  SELECT vec_id, label,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e,
         {_sql_norm('embedding')} AS nrm
  FROM embeddings
),
qz AS (
  SELECT vec_id, label, e, nrm, s,
         CASE WHEN s = 0
              THEN list_transform(e, x -> CAST(0 AS BIGINT))
              ELSE list_transform(e,
                     x -> CAST(floor(x / s + 0.5) AS BIGINT))
         END AS lvl
  FROM (
    SELECT vec_id, label, e, nrm,
           list_reduce(list_prepend(0.0,
             list_transform(e, x -> abs(x))), (a, b) -> greatest(a, b))
             / 127.0 AS s
    FROM v
  ) sc
),
c AS (
  SELECT vec_id AS cent_id, e AS ce, nrm AS cnrm
  FROM v WHERE vec_id < {_IVF_N_CELLS}
),
scored AS (
  SELECT q.vec_id, q.label, q.e, q.nrm, q.s, q.lvl, c.cent_id,
         {sql_dot('q.e', 'c.ce')} / (q.nrm * c.cnrm) AS csim
  FROM qz q, c
),
assigned AS (
  SELECT vec_id, label, e, nrm, s, lvl, cent_id AS cell FROM (
    SELECT *, row_number() OVER (
      PARTITION BY vec_id ORDER BY csim DESC, cent_id) AS rn
    FROM scored
  ) r WHERE rn = 1
),
pcells AS (
  SELECT cent_id AS pcell FROM scored
  WHERE vec_id = {_PROBE_VEC_ID}
  ORDER BY csim DESC, cent_id LIMIT {_IVF_NPROBE}
),
probe AS (
  SELECT e AS pe, nrm AS pnrm, s AS ps, lvl AS plvl
  FROM qz WHERE vec_id = {_PROBE_VEC_ID}
)
SELECT a.vec_id, a.label, a.cell,
       ((CAST({sql_int_dot('probe.plvl', 'a.lvl')} AS DOUBLE)
         * probe.ps) * a.s) / (probe.pnrm * a.nrm) AS approx_cos,
       {sql_dot('a.e', 'probe.pe')} / (a.nrm * probe.pnrm) AS cosine
FROM assigned a JOIN pcells ON a.cell = pcells.pcell, probe
WHERE a.vec_id <> {_PROBE_VEC_ID}
ORDER BY approx_cos DESC, vec_id
LIMIT 10
""",
    tags=("similarity", "ivf", "compression"),
)
def q_sim_ann_ivf_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF probe SERVED FROM THE int8 STORE — the memory-bound ANN
    shape a 100 TB vector corpus actually deploys (FAISS
    IVF+scalar-quantizer class): the codebook assignment happens
    offline in float (same argmax stage as q_sim_ann_ivf), but the
    candidate RANKING runs on q_embed_quantize's symmetric int8
    levels — an exact INTEGER dot product rescaled by the two
    per-vector scales — so the serving tier holds 4x less memory and
    the hot loop is SIMD int8 multiply-adds. The read-out returns,
    per top-10 candidate, the quantized score it was RANKED by next
    to the exact float cosine — making the quantization-induced
    ranking error directly visible (the audit q_embed_quantize does
    per-vector, completed at the search level). Every number is
    value-checked: the level vectors are integers, the integer dot
    is exact in any order, and the rescale is a fixed
    parenthesization both engines evaluate identically. Scale shape:
    centroids broadcast, assignment is a map-side-combinable argmax,
    the probe touches nprobe/n_cells of the data, and the int8
    payload never shuffles wider than the float path it replaces."""
    e = load_table(spark, sf_dir, "embeddings")
    v = e.select(
        "vec_id", "label", F.col("embedding").alias("e"),
        l2_norm(F.col("embedding")).alias("nrm"),
    )
    s = (
        F.aggregate(
            F.col("e"),
            F.lit(0.0),
            lambda acc, x: F.greatest(acc, F.abs(x.cast("double"))),
        )
        / F.lit(127.0)
    )
    lvl = F.when(
        F.col("s") == 0,
        F.transform(F.col("e"), lambda x: F.lit(0).cast("long")),
    ).otherwise(
        F.transform(
            F.col("e"),
            lambda x: F.floor(x.cast("double") / F.col("s") + F.lit(0.5)),
        )
    )
    qz = v.withColumn("s", s).withColumn("lvl", lvl)

    cents = F.broadcast(
        v.filter(F.col("vec_id") < _IVF_N_CELLS).select(
            F.col("vec_id").alias("cent_id"),
            F.col("e").alias("ce"),
            F.col("nrm").alias("cnrm"),
        )
    )
    csim = F.try_divide(dot(F.col("e"), F.col("ce")), F.col("nrm") * F.col("cnrm"))
    scored = qz.crossJoin(cents).withColumn("csim", csim)
    best = F.max(
        F.struct(F.col("csim").alias("c"), (-F.col("cent_id")).alias("nc"))
    ).alias("best")
    assigned = (
        scored.groupBy("vec_id")
        .agg(
            best,
            F.any_value("label").alias("label"),
            F.any_value("e").alias("e"),
            F.any_value("nrm").alias("nrm"),
            F.any_value("s").alias("s"),
            F.any_value("lvl").alias("lvl"),
        )
        .select(
            "vec_id", "label", "e", "nrm", "s", "lvl",
            (-F.col("best.nc")).alias("cell"),
        )
    )

    pcells = F.broadcast(
        scored.filter(F.col("vec_id") == _PROBE_VEC_ID)
        .orderBy(F.col("csim").desc(), "cent_id")
        .limit(_IVF_NPROBE)
        .select(F.col("cent_id").alias("pcell"))
    )
    probe = F.broadcast(
        qz.filter(F.col("vec_id") == _PROBE_VEC_ID).select(
            F.col("e").alias("pe"),
            F.col("nrm").alias("pnrm"),
            F.col("s").alias("ps"),
            F.col("lvl").alias("plvl"),
        )
    )
    approx = F.try_divide(
        (
            int_dot(F.col("plvl"), F.col("lvl")).cast("double")
            * F.col("ps")
        )
        * F.col("s"),
        F.col("pnrm") * F.col("nrm"),
    )
    cosine = F.try_divide(dot(F.col("e"), F.col("pe")), F.col("nrm") * F.col("pnrm"))
    return (
        assigned.join(pcells, F.col("cell") == F.col("pcell"))
        .crossJoin(probe)
        .filter(F.col("vec_id") != _PROBE_VEC_ID)
        .select(
            "vec_id", "label", "cell",
            approx.alias("approx_cos"),
            cosine.alias("cosine"),
        )
        .orderBy(F.col("approx_cos").desc(), "vec_id")
        .limit(10)
    )


# -- product quantization (PQ): shared model + two read-outs -----------------

_PQ_M = 4  # subspaces (64-dim fixture embeddings -> 16 dims each)
_PQ_W = 16
_PQ_K = 8  # codewords per subspace
_ADC_QMOD = 100  # query set: vec_id % 100 == 7 (the q_knn_ivf_batch probe recipe)
_ADC_QSEL = 7
_ADC_K = 5

# Shared DuckDB CTE prefix for the PQ model (mirrors _pq_model below
# fold-for-fold): v = double vectors + norms, sub = fixed subspace
# slices, c0 = seed codebooks, a0 = seed assignment, m1/c1 = one
# exact-decimal Lloyd update, a1 = final assignment with codes.
# Never copy these CTEs into an oracle — interpolate the helper.


def _sql_pq_prefix() -> str:
    return f"""v AS (
  SELECT vec_id, label,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e,
         {sql_l2_norm("list_transform(embedding, x -> CAST(x AS DOUBLE))")}
           AS nrm
  FROM embeddings
),
sub AS (
  SELECT vec_id, label, CAST(ms.m AS INTEGER) AS m,
         e[(ms.m * {_PQ_W} + 1):((ms.m + 1) * {_PQ_W})] AS sv
  FROM v CROSS JOIN (SELECT unnest(range({_PQ_M})) AS m) ms
),
c0 AS (
  SELECT m, vec_id AS cl, sv AS ce FROM sub WHERE vec_id < {_PQ_K}
),
a0 AS (
  SELECT vec_id, label, m, sv, cl FROM (
    SELECT s.vec_id, s.label, s.m, s.sv, c.cl,
           row_number() OVER (
             PARTITION BY s.vec_id, s.m
             ORDER BY {sql_dot('s.sv', 'c.ce')} DESC, c.cl) AS rn
    FROM sub s JOIN c0 c ON s.m = c.m
  ) t WHERE rn = 1
),
m1 AS (
  SELECT m, cl, dim, {sql_dsum('val')} / COUNT(*) AS c
  FROM (
    SELECT m, cl, generate_subscripts(sv, 1) - 1 AS dim, unnest(sv) AS val
    FROM a0
  ) ex
  GROUP BY m, cl, dim
),
c1 AS (
  SELECT m, cl, list(c ORDER BY dim) AS ce FROM m1 GROUP BY m, cl
),
a1 AS (
  SELECT vec_id, label, m, cl, ip, sv, ce FROM (
    SELECT s.vec_id, s.label, s.m, s.sv, c.cl, c.ce,
           {sql_dot('s.sv', 'c.ce')} AS ip,
           row_number() OVER (
             PARTITION BY s.vec_id, s.m
             ORDER BY {sql_dot('s.sv', 'c.ce')} DESC, c.cl) AS rn
    FROM sub s JOIN c1 c ON s.m = c.m
  ) t WHERE rn = 1
)"""


def _pq_model(spark: SparkSession, sf_dir: str):
    """Shared PQ model: returns ``(v, sub, c1, a1)`` — double
    vectors with norms, subspace slices, the trained codebook
    (m, cl, ce), and the final coded assignment (vec_id, label, m,
    sv, cl, ip, ce). Used by q_embed_pq (codebook/encoding audit)
    and q_sim_ann_adc (ADC top-k serving); SQL twin:
    :func:`_sql_pq_prefix`. Determinism recipe shared with
    q_kmeans_lloyd: fixed spans, dot/sql_dot fold order, ties on
    codeword id, exact micro-unit centroid means, arrays assembled
    in sorted dim order."""
    from streamz_postgres_spark.functions.numeric import dsum

    e = load_table(spark, sf_dir, "embeddings")
    ed = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    v = e.select(
        "vec_id",
        "label",
        ed.alias("e"),
        l2_norm(ed).alias("nrm"),
    )
    slices = F.array(
        *[F.slice("e", m * _PQ_W + 1, _PQ_W) for m in range(_PQ_M)]
    )
    sub = v.select(
        "vec_id", "label", F.posexplode(slices).alias("m", "sv")
    )
    seeds = sub.filter(F.col("vec_id") < _PQ_K).select(
        "m", F.col("vec_id").alias("cl"), F.col("sv").alias("ce")
    )

    def assign(cb: DataFrame) -> DataFrame:
        ip = dot(F.col("sv"), F.col("ce"))
        w = Window.partitionBy("vec_id", "m").orderBy(
            F.col("ip").desc(), "cl"
        )
        return (
            sub.join(F.broadcast(cb), "m")
            .withColumn("ip", ip)
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
        )

    def update(assigned: DataFrame) -> DataFrame:
        # NOTE (r13, measured then kept as-is): two candidate
        # rewrites were interleaved-A/B'd under q_sim_ann_ivfpq and
        # BOTH regressed it — a single-groupBy per-dimension
        # decimal-sum update (median 3.53 s vs 2.71 s: 32 aggregate
        # buffers per row lose to this exploded codegen path even at
        # 16 dims) and a persist_scoped pin of c1 (3.51 s vs 2.71 s:
        # the cache-fill job plus InMemoryRelation machinery on a
        # 32-row codebook costs more than the duplicate broadcast
        # subtrees it removes). The exploded two-stage aggregation
        # below is the measured optimum.
        ex = assigned.select(
            "m", "cl", F.posexplode("sv").alias("dim", "val")
        )
        cd = ex.groupBy("m", "cl", "dim").agg(
            (dsum("val") / F.count(F.lit(1))).alias("c")
        )
        return cd.groupBy("m", "cl").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "c"))),
                lambda x: x.c,
            ).alias("ce")
        )

    c1 = update(assign(seeds))
    a1 = assign(c1)
    return v, sub, c1, a1


@register(
    "q_embed_pq",
    oracle=f"""
WITH {_sql_pq_prefix()}
SELECT vec_id, label, m, cl AS code, ip AS ip_score,
       {sql_dist2('sv', 'ce')} AS sq_err
FROM a1
""",
    tags=("similarity", "vector", "compression"),
)
def q_embed_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization (Jégou et al. 2011) over the embedding
    store — the compression stage BETWEEN int8 (4x) and binary
    hashing on the 100 TB memory ladder (PQ{_PQ_M}x{_PQ_K} stores
    {_PQ_M} small codes per vector: 64x smaller than float32, the
    representation IVF-PQ serving shelves actually hold). The vector
    is split into {_PQ_M} x {_PQ_W}-dim subspaces; each subspace
    trains its OWN {_PQ_K}-codeword codebook (seeded with the first
    {_PQ_K} vectors' subvectors, one exact-decimal Lloyd update —
    the q_kmeans_lloyd recipe per subspace), and every vector is
    encoded as its per-subspace argmax-inner-product codeword
    (MIPS-flavored PQ: codewords chosen by the same inner-product
    objective ADC scoring uses, so encode and serve agree). Read-out
    per (vector, subspace): the code, its winning inner product,
    and the EXACT squared reconstruction error — the two per-cell
    numbers that decide codebook health (dead codewords, distortion
    outliers) before a PQ index ships. Serving twin: q_sim_ann_adc.

    Determinism: see :func:`_pq_model`. Scale shape: the codebook is
    O(M x K x w) — broadcast at any corpus size; assignment is a
    per-row argmax over K broadcast rows (no shuffle); the ONLY
    shuffles are the O(M x K x w)-output centroid update and the
    subspace explode, both map-side-combined. At 100 TB: same plan,
    more Lloyd rounds chained like connected_components."""
    _, _, _, a1 = _pq_model(spark, sf_dir)
    return a1.select(
        "vec_id",
        "label",
        "m",
        F.col("cl").alias("code"),
        F.col("ip").alias("ip_score"),
        dist2(F.col("sv"), F.col("ce")).alias("sq_err"),
    )


@register(
    "q_sim_ann_adc",
    oracle=f"""
WITH {_sql_pq_prefix()},
qv AS (
  SELECT vec_id AS qid, e AS qe, nrm AS qnrm FROM v
  WHERE vec_id % {_ADC_QMOD} = {_ADC_QSEL}
),
lut AS (
  SELECT s.vec_id AS qid, s.m, c.cl, {sql_dot('s.sv', 'c.ce')} AS ip
  FROM sub s JOIN c1 c ON s.m = c.m
  WHERE s.vec_id % {_ADC_QMOD} = {_ADC_QSEL}
),
parts AS (
  SELECT l.qid, a.vec_id,
         SUM(CASE WHEN a.m = 0 THEN l.ip ELSE 0.0 END) AS p0,
         SUM(CASE WHEN a.m = 1 THEN l.ip ELSE 0.0 END) AS p1,
         SUM(CASE WHEN a.m = 2 THEN l.ip ELSE 0.0 END) AS p2,
         SUM(CASE WHEN a.m = 3 THEN l.ip ELSE 0.0 END) AS p3
  FROM a1 a JOIN lut l ON a.m = l.m AND a.cl = l.cl
  WHERE a.vec_id <> l.qid
  GROUP BY l.qid, a.vec_id
),
ranked AS (
  SELECT qid, vec_id, p0 + p1 + p2 + p3 AS adc,
         row_number() OVER (
           PARTITION BY qid
           ORDER BY p0 + p1 + p2 + p3 DESC, vec_id) AS rnk
  FROM parts
)
SELECT r.qid, r.vec_id, CAST(r.rnk AS INTEGER) AS rnk,
       r.adc AS adc_score,
       {sql_dot('cv.e', 'q.qe')} / (cv.nrm * q.qnrm) AS cosine
FROM ranked r
JOIN v cv ON cv.vec_id = r.vec_id
JOIN qv q ON q.qid = r.qid
WHERE r.rnk <= {_ADC_K}
""",
    tags=("similarity", "vector", "ann", "compression"),
)
def q_sim_ann_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ADC (asymmetric distance computation) top-k serving from the
    PQ codes — how an IVF-PQ index actually answers queries at
    100 TB: the query stays FULL precision, candidates stay
    {_PQ_M}-byte codes, and each query precomputes a tiny
    M x K lookup table (inner product of its subvector against every
    codeword) so scoring a candidate is {_PQ_M} table lookups + adds,
    never a decode. Per query (the q_knn_ivf_batch probe recipe:
    vec_id %% {_ADC_QMOD} == {_ADC_QSEL}), the top-{_ADC_K} by ADC
    score with the EXACT cosine beside it — the rank-vs-truth gap IS
    the PQ recall audit, the number you watch when trading codebook
    size against recall (companion read-outs: q_embed_pq for
    codebook health, q_ann_recall for the IVF stage).

    Plan: the LUT is Q x M x K rows — broadcast; scoring joins the
    code table to the LUT on (m, code) and folds the {_PQ_M}
    partials per (query, candidate) in fixed subspace order (each
    partial is a conditional sum over exactly one non-zero element,
    so the fold is IEEE-exact and engine-identical). One keyed
    shuffle on (qid, vec_id); top-k via rank window per query. At
    100 TB compose with the IVF cell router (q_sim_ann_ivf) so the
    code scan covers only nprobe cells instead of the full corpus —
    the ADC stage itself is already candidate-count-linear with
    {_PQ_M}-byte rows."""
    v, sub, c1, a1 = _pq_model(spark, sf_dir)
    is_q = F.col("vec_id") % _ADC_QMOD == _ADC_QSEL
    lut = (
        sub.filter(is_q)
        .select(F.col("vec_id").alias("qid"), "m", "sv")
        .join(F.broadcast(c1), "m")
        .select(
            "qid", "m", "cl", dot(F.col("sv"), F.col("ce")).alias("ip")
        )
    )
    codes = a1.select("vec_id", "m", "cl")
    parts = (
        codes.join(F.broadcast(lut), ["m", "cl"])
        .filter(F.col("vec_id") != F.col("qid"))
        .groupBy("qid", "vec_id")
        .agg(
            *[
                F.sum(
                    F.when(F.col("m") == i, F.col("ip")).otherwise(
                        F.lit(0.0)
                    )
                ).alias(f"p{i}")
                for i in range(_PQ_M)
            ]
        )
    )
    adc = (
        (F.col("p0") + F.col("p1")) + F.col("p2")
    ) + F.col("p3")
    w = Window.partitionBy("qid").orderBy(F.col("adc").desc(), "vec_id")
    ranked = (
        parts.withColumn("adc", adc)
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _ADC_K)
    )
    qv = v.filter(is_q).select(
        F.col("vec_id").alias("qid"),
        F.col("e").alias("qe"),
        F.col("nrm").alias("qnrm"),
    )
    cos = F.try_divide(dot(F.col("e"), F.col("qe")), F.col("nrm") * F.col("qnrm"))
    return (
        ranked.join(v.select("vec_id", "e", "nrm"), "vec_id")
        .join(F.broadcast(qv), "qid")
        .select(
            "qid",
            "vec_id",
            F.col("rnk").cast("int").alias("rnk"),
            F.col("adc").alias("adc_score"),
            cos.alias("cosine"),
        )
    )


@register(
    "q_sim_ann_ivfpq",
    oracle=f"""
WITH {_sql_pq_prefix()},
cc AS (
  SELECT vec_id AS cent_id, e AS ce, nrm AS cnrm
  FROM v WHERE vec_id < {_IVF_N_CELLS}
),
cscored AS (
  SELECT v.vec_id, c.cent_id,
         {sql_dot('v.e', 'c.ce')} / (v.nrm * c.cnrm) AS csim
  FROM v, cc c
),
cells AS (
  SELECT vec_id, cent_id AS cell FROM (
    SELECT *, row_number() OVER (
      PARTITION BY vec_id ORDER BY csim DESC, cent_id) AS rn
    FROM cscored
  ) r WHERE rn = 1
),
qcells AS (
  SELECT vec_id AS qid, cent_id AS pcell FROM (
    SELECT *, row_number() OVER (
      PARTITION BY vec_id ORDER BY csim DESC, cent_id) AS rn
    FROM cscored WHERE vec_id % {_ADC_QMOD} = {_ADC_QSEL}
  ) r WHERE rn <= {_IVF_NPROBE}
),
cand AS (
  SELECT q.qid, ce.vec_id
  FROM qcells q JOIN cells ce ON ce.cell = q.pcell
  WHERE ce.vec_id <> q.qid
),
lut AS (
  SELECT s.vec_id AS qid, s.m, c.cl, {sql_dot('s.sv', 'c.ce')} AS ip
  FROM sub s JOIN c1 c ON s.m = c.m
  WHERE s.vec_id % {_ADC_QMOD} = {_ADC_QSEL}
),
parts AS (
  SELECT cd.qid, cd.vec_id,
         SUM(CASE WHEN a.m = 0 THEN l.ip ELSE 0.0 END) AS p0,
         SUM(CASE WHEN a.m = 1 THEN l.ip ELSE 0.0 END) AS p1,
         SUM(CASE WHEN a.m = 2 THEN l.ip ELSE 0.0 END) AS p2,
         SUM(CASE WHEN a.m = 3 THEN l.ip ELSE 0.0 END) AS p3
  FROM cand cd
  JOIN a1 a ON a.vec_id = cd.vec_id
  JOIN lut l ON l.qid = cd.qid AND l.m = a.m AND l.cl = a.cl
  GROUP BY cd.qid, cd.vec_id
),
ranked AS (
  SELECT qid, vec_id, p0 + p1 + p2 + p3 AS adc,
         row_number() OVER (
           PARTITION BY qid
           ORDER BY p0 + p1 + p2 + p3 DESC, vec_id) AS rnk
  FROM parts
)
SELECT r.qid, r.vec_id, CAST(r.rnk AS INTEGER) AS rnk,
       ce.cell,
       r.adc AS adc_score,
       {sql_dot('cv.e', 'q.e')} / (cv.nrm * q.nrm) AS cosine
FROM ranked r
JOIN cells ce ON ce.vec_id = r.vec_id
JOIN v cv ON cv.vec_id = r.vec_id
JOIN v q ON q.vec_id = r.qid
WHERE r.rnk <= {_ADC_K}
""",
    tags=("similarity", "vector", "ann", "ivf", "compression"),
)
def q_sim_ann_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ end to end — the industry-standard 100 TB ANN serving
    pipeline, composed from this repo's two audited halves: the IVF
    coarse quantizer routes each query to its nprobe={_IVF_NPROBE}
    nearest of {_IVF_N_CELLS} cells (the q_sim_ann_ivf recipe), and
    ONLY the vectors in those cells are scored — by ADC over the
    {_PQ_M}-byte PQ codes (the q_sim_ann_adc recipe), never by
    decoding. Per query: top-{_ADC_K} by ADC with the routed cell
    and the exact cosine beside each hit, so one read-out shows both
    stages' loss (cell routing recall x code quantization error).

    Plan: both codebooks (coarse {_IVF_N_CELLS} x d, PQ M x K x w)
    are broadcast; cell assignment is the map-side-combinable argmax
    groupBy; the candidate set is a cell-equi-join (touching
    ~nprobe/n_cells of the corpus — the whole point of IVF); ADC
    scoring joins candidates to codes and folds the {_PQ_M}
    IEEE-exact partials in fixed subspace order. At 100 TB the cell
    id is a partition column, so the candidate join is a
    partition-pruned scan and the PQ store is the only data read."""
    v, sub, c1, a1 = _pq_model(spark, sf_dir)
    cents = F.broadcast(
        v.filter(F.col("vec_id") < _IVF_N_CELLS).select(
            F.col("vec_id").alias("cent_id"),
            F.col("e").alias("ce"),
            F.col("nrm").alias("cnrm"),
        )
    )
    csim = F.try_divide(dot(F.col("e"), F.col("ce")), F.col("nrm") * F.col("cnrm"))
    cscored = v.select("vec_id", "e", "nrm").crossJoin(cents).withColumn(
        "csim", csim
    )
    # argmax cell per vector, map-side combinable (q_sim_ann_ivf)
    best = F.max(
        F.struct(F.col("csim").alias("c"), (-F.col("cent_id")).alias("nc"))
    ).alias("best")
    cells = (
        cscored.groupBy("vec_id")
        .agg(best)
        .select("vec_id", (-F.col("best.nc")).alias("cell"))
    )
    is_q = F.col("vec_id") % _ADC_QMOD == _ADC_QSEL
    wq = Window.partitionBy("vec_id").orderBy(
        F.col("csim").desc(), "cent_id"
    )
    qcells = (
        cscored.filter(is_q)
        .withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= _IVF_NPROBE)
        .select(F.col("vec_id").alias("qid"), F.col("cent_id").alias("pcell"))
    )
    cand = (
        cells.join(F.broadcast(qcells), F.col("cell") == F.col("pcell"))
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id", "cell")
    )
    lut = (
        sub.filter(is_q)
        .select(F.col("vec_id").alias("qid"), "m", "sv")
        .join(F.broadcast(c1), "m")
        .select(
            "qid", "m", "cl", dot(F.col("sv"), F.col("ce")).alias("ip")
        )
    )
    codes = a1.select("vec_id", "m", "cl")
    parts = (
        cand.join(codes, "vec_id")
        .join(F.broadcast(lut), ["qid", "m", "cl"])
        .groupBy("qid", "vec_id")
        .agg(
            F.any_value("cell").alias("cell"),
            *[
                F.sum(
                    F.when(F.col("m") == i, F.col("ip")).otherwise(
                        F.lit(0.0)
                    )
                ).alias(f"p{i}")
                for i in range(_PQ_M)
            ],
        )
    )
    adc = ((F.col("p0") + F.col("p1")) + F.col("p2")) + F.col("p3")
    w = Window.partitionBy("qid").orderBy(F.col("adc").desc(), "vec_id")
    ranked = (
        parts.withColumn("adc", adc)
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _ADC_K)
    )
    qv = v.filter(is_q).select(
        F.col("vec_id").alias("qid"),
        F.col("e").alias("qe"),
        F.col("nrm").alias("qnrm"),
    )
    cos = F.try_divide(dot(F.col("e"), F.col("qe")), F.col("nrm") * F.col("qnrm"))
    return (
        ranked.join(v.select("vec_id", "e", "nrm"), "vec_id")
        .join(F.broadcast(qv), "qid")
        .select(
            "qid",
            "vec_id",
            F.col("rnk").cast("int").alias("rnk"),
            "cell",
            F.col("adc").alias("adc_score"),
            cos.alias("cosine"),
        )
    )


# -- matryoshka truncation audit ----------------------------------------------

_MRL_KS = (8, 16, 64)  # prefix dims audited (64 = full)
_MRL_QMOD = 25  # vec_id % 25 == 0 within the panel range -> 20 queries
#: the query panel is FIXED-SIZE by design (vec_id < 500): a
#: truncation calibration needs a pinned probe panel, not a panel
#: that grows with the corpus — without the bound the audit is a
#: quadratic Q x N scan at scale (the 10x curve measured 32x wall);
#: with it, wall is linear in the candidate store
_MRL_PANEL_MAX = 500


@register(
    "q_embed_matryoshka",
    oracle=f"""
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
),
q AS (SELECT vec_id AS qid, e AS qe FROM v
     WHERE vec_id % {_MRL_QMOD} = 0 AND vec_id < {_MRL_PANEL_MAX}),
ks AS (SELECT unnest({list(_MRL_KS)}) AS k),
pairs AS (
  SELECT ks.k, q.qid, v.vec_id,
         {sql_dot('(v.e)[1:ks.k]', '(q.qe)[1:ks.k]')}
           / ({sql_l2_norm('(v.e)[1:ks.k]')}
              * {sql_l2_norm('(q.qe)[1:ks.k]')}) AS cos
  FROM v CROSS JOIN q CROSS JOIN ks
  WHERE v.vec_id <> q.qid
),
top1 AS (
  SELECT k, qid, vec_id, cos,
         row_number() OVER (PARTITION BY k, qid
                            ORDER BY cos DESC, vec_id) AS rn
  FROM pairs
),
t1 AS (SELECT k, qid, vec_id, cos FROM top1 WHERE rn = 1),
full_t1 AS (SELECT qid, vec_id AS full_top FROM t1 WHERE k = {_MRL_KS[-1]})
SELECT t1.k,
       CAST(COUNT(*) AS BIGINT) AS n_queries,
       CAST(SUM(CASE WHEN t1.vec_id = f.full_top THEN 1 ELSE 0 END)
            AS BIGINT) AS n_top1_agree,
       CAST(SUM(CASE WHEN t1.vec_id = f.full_top THEN 1 ELSE 0 END)
            AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS agree_rate,
       {sql_qround(f"{sql_dsum(sql_qround('t1.cos', 6))} / COUNT(*)", 6)}
         AS mean_top1_cos
FROM t1 JOIN full_t1 f ON t1.qid = f.qid
GROUP BY t1.k
ORDER BY t1.k
""",
    tags=("similarity", "embedding"),
)
def q_embed_matryoshka(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka truncation audit (Kusupati '22 / MRL serving): for
    each query, the exact top-1 neighbor under the FIRST-k embedding
    dims (k = 8 / 16 / 64) versus the full-dimension answer —
    top-1 agreement rate and mean retained cosine per k. This is the
    read-out that decides how hard an embedding store can truncate
    (2x-8x smaller vectors, ANN candidate generation in the prefix,
    re-rank in full precision) before retrieval quality moves. Run
    beside q_embed_quantize / q_embed_pq: truncation, scalar
    quantization, and product quantization are the three compression
    axes, now each with its audit.

    Determinism: prefix slices fold in the same element order on
    both engines (the shared dot/norm discipline), top-1 breaks ties
    on vec_id, and the mean cosine is qround(6)-then-exact-decimal.
    Scale: queries x k is a bounded broadcast; candidates re-split
    via _vecs_parallel; at 100 TB the candidate side is IVF-routed
    (compose with q_sim_ann_ivf) so each query scores nprobe cells,
    not the corpus — the audit shape is unchanged."""
    e = _vecs_parallel(spark, sf_dir)
    v = e.select("vec_id", F.col("embedding").alias("e"))
    q = v.filter(
        (F.col("vec_id") % _MRL_QMOD == 0)
        & (F.col("vec_id") < _MRL_PANEL_MAX)
    ).select(F.col("vec_id").alias("qid"), F.col("e").alias("qe"))
    qk = q.withColumn(
        "k", F.explode(F.array(*[F.lit(k) for k in _MRL_KS]))
    )
    ek = F.slice(F.col("e"), 1, F.col("k"))
    qek = F.slice(F.col("qe"), 1, F.col("k"))
    cos = F.try_divide(dot(ek, qek), l2_norm(ek) * l2_norm(qek))
    pairs = (
        v.crossJoin(F.broadcast(qk))
        .filter(F.col("vec_id") != F.col("qid"))
        .select("k", "qid", "vec_id", cos.alias("cos"))
    )
    w = Window.partitionBy("k", "qid").orderBy(
        F.col("cos").desc(), "vec_id"
    )
    t1 = (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    full_t1 = (
        t1.filter(F.col("k") == _MRL_KS[-1])
        .select("qid", F.col("vec_id").alias("full_top"))
    )
    agree = F.when(F.col("vec_id") == F.col("full_top"), 1).otherwise(0)
    return (
        t1.join(F.broadcast(full_t1), "qid")
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_queries"),
            F.sum(agree).cast("bigint").alias("n_top1_agree"),
            (F.sum(agree).cast("double") / F.count(F.lit(1)).cast("double")).alias(
                "agree_rate"
            ),
            qround(
                dsum(qround(F.col("cos"), 6)) / F.count(F.lit(1)), 6
            ).alias("mean_top1_cos"),
        )
        .orderBy("k")
    )
