"""Capture .explain("formatted") for bench queries into plans/<tag>/<query>_<suffix>.txt.

Usage: python tools/capture_plans.py <tag> <suffix> [query ...]
e.g. python tools/capture_plans.py r10 before            # all bench queries
     python tools/capture_plans.py r10 after q42_dedup_minhash_lsh
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag = sys.argv[1]
    suffix = sys.argv[2]
    only = set(sys.argv[3:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from ai_batch_processing_spark.registry import load_all
    from ai_batch_processing_spark.session import get_spark

    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag
    )
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark("capture_plans")
    spark.sparkContext.setLogLevel("ERROR")
    jvm = spark.sparkContext._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")

    for name, spec in sorted(load_all().items()):
        if only and name not in only:
            continue
        if not only and not spec.bench:
            continue
        df = spec.fn(spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(mode)
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w", encoding="utf-8") as fh:
            fh.write(f"# {name} — explain('formatted') at {sf_dir}\n\n")
            fh.write(plan.rstrip() + "\n")
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
