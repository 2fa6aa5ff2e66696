"""Delta Lake availability probe — the Kafka-probe pattern applied
to the MERGE seam's untested arm (r9 verdict Next-round #5).

``streaming/merge.py`` picks between two MERGE sinks:
``SnapshotMergeSink`` (parquet snapshot rewrite — contract-tested,
runs everywhere) and ``DeltaMergeSink`` (native ``MERGE INTO`` on a
Delta table — requires the delta-spark package and its Scala
extension jars). A user on a Delta lake runs the Delta arm, so its
status must be pinned EVIDENCE each round, not silence.

The probe attempts, in order:
1. import deltalake / delta / delta.tables (any Python binding);
2. locate delta-spark jars on disk (io.delta / delta-core /
   delta-spark patterns under the usual jar roots);
3. if either exists, build a Delta-capable SparkSession
   (spark.sql.extensions=io.delta.sql.DeltaSparkSessionExtension)
   and round-trip a tiny MERGE (the DeltaMergeSink contract test).

Exit 0 with a one-line verdict either way; the README records the
result beside the Kafka probe. Run: ``python scripts/probe_delta.py``.
"""

from __future__ import annotations

import glob
import importlib
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def probe() -> dict:
    out: dict = {"python_binding": None, "jars": [], "merge_roundtrip": None}

    for mod in ("delta", "deltalake", "delta.tables"):
        try:
            importlib.import_module(mod)
            out["python_binding"] = mod
            break
        except ImportError:
            continue

    jar_roots = [
        "/root/.ivy2/jars", "/root/.m2/repository", "/opt/spark/jars",
        "/usr/local/lib/python*/site-packages/pyspark/jars",
        str(Path(sys.prefix) / "lib" / "python*" / "site-packages"
            / "pyspark" / "jars"),
    ]
    for root in jar_roots:
        for pat in ("*delta-spark*.jar", "*delta-core*.jar",
                    "*delta-storage*.jar"):
            out["jars"].extend(glob.glob(f"{root}/**/{pat}", recursive=True))

    if out["python_binding"] is None and not out["jars"]:
        out["verdict"] = (
            "IMPOSSIBLE here: no delta-spark Python binding, no Delta "
            "jars on disk, and no network to fetch them — "
            "DeltaMergeSink stays behind the seam (SnapshotMergeSink "
            "is the tested arm); q_cdc_time_travel value-checks the "
            "versionAsOf contract against the snapshot sink"
        )
        return out

    # something is present — attempt the real round-trip
    try:
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[2]")
            .config("spark.sql.extensions",
                    "io.delta.sql.DeltaSparkSessionExtension")
            .config("spark.sql.catalog.spark_catalog",
                    "org.apache.spark.sql.delta.catalog.DeltaCatalog")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
        import tempfile

        with tempfile.TemporaryDirectory() as d:
            spark.range(3).selectExpr("id", "id AS v").write.format(
                "delta"
            ).save(f"{d}/t")
            spark.read.format("delta").load(f"{d}/t").count()
            # an ACTUAL MERGE INTO — a write/read round trip succeeds
            # via the datasource alone even when the Delta SQL
            # extension failed to activate (pre-existing session,
            # mismatched jars), and MERGE is exactly what
            # DeltaMergeSink needs (r10 review find)
            spark.range(2).selectExpr(
                "id", "id * 10 AS v"
            ).createOrReplaceTempView("__delta_probe_src")
            spark.sql(
                f"MERGE INTO delta.`{d}/t` t "
                "USING __delta_probe_src s ON t.id = s.id "
                "WHEN MATCHED THEN UPDATE SET * "
                "WHEN NOT MATCHED THEN INSERT *"
            )
        out["merge_roundtrip"] = True
        out["verdict"] = "Delta AVAILABLE — run the DeltaMergeSink contract tests"
    except Exception as e:  # noqa: BLE001
        out["merge_roundtrip"] = False
        out["verdict"] = f"Delta artifacts present but session failed: {e}"
    return out


if __name__ == "__main__":
    print(json.dumps(probe(), indent=2, default=str))
