"""Generate a bench-only N-fold replica of the sf0.1 fixture for
scale-curve measurement (VERDICT r4 #4). No oracle runs against this
data — it exists to check that the heavy operators' wall time grows
~linearly past the 17 MB fixture, where candidate-pair blowup or AQE
broadcast demotion would first show up.

Replication is deliberately DECORRELATED across replicas so data
volume grows without creating artificial cross-replica duplicate
structure (which would legitimately blow up candidate pairs and make
the curve read as a bug):

- events: event_id/user_id offset per replica (key cardinality grows
  linearly; timestamps unchanged so windows get denser, the realistic
  shape for a busier stream).
- documents: every word suffixed with the replica tag. Shingle sets
  within a replica are isomorphic to the original (in-replica
  near-dup structure replicates exactly); across replicas shingles
  share nothing, so MinHash/LSH collisions across replicas are
  band-collision noise only.
- embeddings: vector rotated by replica index. Rotation preserves
  all in-replica pairwise cosines (per-replica cluster structure
  identical) while cross-replica pairs decorrelate like random
  vectors. Labels (the IVF-cell stand-in that blocks candidate
  pairs) are offset per replica: a 10x corpus gets 10x cells of the
  SAME size, modeling the production rule that the codebook is
  re-fit as the corpus grows so cell population stays bounded.
  Keeping cell count fixed instead makes candidate pairs grow
  quadratically — measured and documented in SCALE.md as the
  blocking-cardinality failure mode.

Non-scaled tables are symlinked from the source dir so registered
queries can read the directory like any sf dir.

Usage: python scripts/gen_scale_data.py [--times 10]
       [--src /root/testdata/sf0.1] [--out /tmp/spark_graft_scale]
"""

from __future__ import annotations

import argparse
import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
)

#: per-replica key offsets; _assert_offsets_safe aborts if a base
#: fixture ever grows keys into an offset's range (silent duplicate
#: keys would corrupt every scale curve with no error — ADVICE r5)
OFFSETS = {
    "events": ("event_id", 10_000_000),
    "events_user": ("user_id", 1_000_000),
    "documents": ("doc_id", 10_000_000),
    "orders": ("o_orderkey", 100_000_000),
    "part": ("p_partkey", 10_000_000),
    "embeddings": ("vec_id", 10_000_000),
}


def _assert_offsets_safe(con, src: str, times: int) -> None:
    checks = (
        ("events", "event_id", OFFSETS["events"][1]),
        ("events", "user_id", OFFSETS["events_user"][1]),
        ("documents", "doc_id", OFFSETS["documents"][1]),
        ("orders", "o_orderkey", OFFSETS["orders"][1]),
        ("lineitem", "l_orderkey", OFFSETS["orders"][1]),
        ("lineitem", "l_partkey", OFFSETS["part"][1]),
        ("part", "p_partkey", OFFSETS["part"][1]),
        ("embeddings", "vec_id", OFFSETS["embeddings"][1]),
    )
    for tbl, col, off in checks:
        (mx,) = con.sql(
            f"SELECT MAX({col}) FROM read_parquet('{src}/{tbl}.parquet')"
        ).fetchone()
        if mx >= off:
            raise SystemExit(
                f"{tbl}.{col} max {mx} >= replica offset {off}: replica "
                f"keys would collide; raise the offset before generating"
            )


def gen(src: str, out: str, times: int) -> str:
    dest = os.path.join(out, f"sf0.1x{times}")
    os.makedirs(dest, exist_ok=True)

    con = duckdb.connect()
    _assert_offsets_safe(con, src, times)
    # events: offset ids per replica, keep ts/type/value/props
    con.sql(
        f"""
        COPY (
          SELECT e.event_id + r.i * 10_000_000 AS event_id,
                 e.ts,
                 e.user_id + r.i * 1_000_000 AS user_id,
                 e.event_type, e.value, e.props
          FROM read_parquet('{src}/events.parquet') e,
               (SELECT unnest(range({times})) AS i) r
          ORDER BY event_id
        ) TO '{dest}/events.parquet' (FORMAT PARQUET)
        """
    )
    # documents: per-word replica suffix decorrelates shingles
    con.sql(
        f"""
        COPY (
          SELECT d.doc_id + r.i * 10_000_000 AS doc_id,
                 CASE WHEN r.i = 0 THEN d.text
                      ELSE array_to_string(
                             list_transform(string_split(d.text, ' '),
                                            x -> x || '_r' || r.i), ' ')
                 END AS text,
                 d.lang, d.source, d.n_chars
          FROM read_parquet('{src}/documents.parquet') d,
               (SELECT unnest(range({times})) AS i) r
          ORDER BY doc_id
        ) TO '{dest}/documents.parquet' (FORMAT PARQUET)
        """
    )
    # orders/lineitem: offset orderkeys per replica, keep customer/
    # supplier/part keys — the realistic growth mode (same entities,
    # 10x the fact rows), so fact⋈fact joins and fact⋈dim broadcasts
    # scale while dimension tables stay fixed
    con.sql(
        f"""
        COPY (
          SELECT o.o_orderkey + r.i * 100_000_000 AS o_orderkey,
                 o.o_custkey, o.o_orderstatus, o.o_totalprice,
                 o.o_orderdate, o.o_orderpriority
          FROM read_parquet('{src}/orders.parquet') o,
               (SELECT unnest(range({times})) AS i) r
          ORDER BY o_orderkey
        ) TO '{dest}/orders.parquet' (FORMAT PARQUET)
        """
    )
    # l_partkey is offset in lockstep with the part replica below:
    # replica i's facts reference replica i's parts, so per-replica
    # fact⋈part join structure is identical and the part dimension
    # grows with the facts (part scales with SF in TPC-H, unlike
    # region/nation). supplier/customer stay fixed (keys untouched).
    con.sql(
        f"""
        COPY (
          SELECT l.l_orderkey + r.i * 100_000_000 AS l_orderkey,
                 l.l_partkey + r.i * 10_000_000 AS l_partkey,
                 l.l_suppkey, l.l_linenumber,
                 l.l_quantity, l.l_extendedprice, l.l_discount,
                 l.l_tax, l.l_returnflag, l.l_linestatus, l.l_shipdate
          FROM read_parquet('{src}/lineitem.parquet') l,
               (SELECT unnest(range({times})) AS i) r
          ORDER BY l_orderkey, l_linenumber
        ) TO '{dest}/lineitem.parquet' (FORMAT PARQUET)
        """
    )
    # part: offset keys per replica; the FIRST name token (the
    # fuzzy-link blocking key) gets the replica suffix, so blocks
    # share nothing across replicas — block COUNT scales 10x, block
    # SIZE is invariant (the documented blocking-cardinality rule).
    # Token 2+ unchanged keeps q_fuzzy_link's dirty-feed synthesis
    # and q9's '%green%' / q20's 'forest%' predicates intact.
    con.sql(
        f"""
        COPY (
          SELECT p.p_partkey + r.i * 10_000_000 AS p_partkey,
                 CASE WHEN r.i = 0 THEN p.p_name
                      ELSE string_split(p.p_name, ' ')[1] || '_r' || r.i
                           || substr(p.p_name,
                                     length(string_split(p.p_name, ' ')[1]) + 1)
                 END AS p_name,
                 p.p_brand, p.p_type, p.p_size, p.p_retailprice
          FROM read_parquet('{src}/part.parquet') p,
               (SELECT unnest(range({times})) AS i) r
          ORDER BY p_partkey
        ) TO '{dest}/part.parquet' (FORMAT PARQUET)
        """
    )
    # embeddings: rotate the vector by replica index (pyarrow keeps
    # the exact list<float> physical type)
    t = pq.read_table(f"{src}/embeddings.parquet")
    vecs = [list(v) for v in t.column("embedding").to_pylist()]
    ids = t.column("vec_id").to_pylist()
    labels = t.column("label").to_pylist()
    out_ids, out_vecs, out_labels = [], [], []
    n_labels = max(labels) + 1
    for i in range(times):
        for vid, vec, lab in zip(ids, vecs, labels):
            k = i % len(vec)
            out_ids.append(vid + i * 10_000_000)
            out_vecs.append(vec[k:] + vec[:k])
            out_labels.append(lab + i * n_labels)  # re-fit cells
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(out_ids, pa.int64()),
                "embedding": pa.array(out_vecs, pa.list_(pa.float32())),
                "label": pa.array(out_labels, pa.int32()),
            }
        ),
        f"{dest}/embeddings.parquet",
    )
    for tbl in TABLES:
        link = f"{dest}/{tbl}.parquet"
        if not os.path.exists(link):
            os.symlink(f"{src}/{tbl}.parquet", link)
    return dest


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--times", type=int, default=10)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/spark_graft_scale")
    a = ap.parse_args()
    dest = gen(a.src, a.out, a.times)
    for f in sorted(os.listdir(dest)):
        p = os.path.join(dest, f)
        if not os.path.islink(p):
            print(f, round(os.path.getsize(p) / 1e6, 1), "MB")
    print(dest)


if __name__ == "__main__":
    main()
