"""Dump .explain('formatted') for named queries to plans/r14/<key>_<tag>.txt.

Usage: python scripts/dump_plans_r14.py before q_dedup_minhash q_text_tfidf ...
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from streamz_postgres_spark.registry import REGISTRY, _load_all  # noqa: E402
from streamz_postgres_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.1"


def main() -> None:
    tag = sys.argv[1]
    keys = sys.argv[2:]
    _load_all()
    spark = get_spark("plans_r14")
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = Path(__file__).resolve().parent.parent / "plans" / "r14"
    out_dir.mkdir(parents=True, exist_ok=True)
    for k in keys:
        df = REGISTRY[k].spark_fn(spark, SF)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        (out_dir / f"{k}_{tag}.txt").write_text(plan)
        print(f"wrote {k}_{tag}.txt ({len(plan)} chars)")


if __name__ == "__main__":
    main()
