"""Order-insensitive output fingerprints for named queries at a given sf dir.

Usage: python tools/snapshot_outputs.py <out.json> <sf_dir> <query> [query ...]

Fingerprint: sorted row-tuples of the stringified frame (14-sig-digit float
canonicalization, matching tools/check_correctness's tolerance spirit),
sha256-hashed. Used to prove a rewrite computes the identical result.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def frame_fingerprint(pdf) -> str:
    import numpy as np

    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    rows = []
    for tup in pdf.itertuples(index=False, name=None):
        parts = []
        for v in tup:
            if isinstance(v, float) or isinstance(v, np.floating):
                parts.append(f"{float(v):.14g}")
            elif isinstance(v, (list, tuple, np.ndarray)):
                parts.append(str(list(v)))
            else:
                parts.append(str(v))
        rows.append("\x1f".join(parts))
    rows.sort()
    h = hashlib.sha256()
    for r in rows:
        h.update(r.encode("utf-8", "surrogatepass"))
        h.update(b"\x1e")
    return f"{len(rows)}:{h.hexdigest()}"


def main() -> None:
    out_path = sys.argv[1]
    sf_dir = sys.argv[2]
    names = sys.argv[3:]

    from ai_batch_processing_spark.registry import load_all
    from ai_batch_processing_spark.session import get_spark

    specs = load_all()
    spark = get_spark("snapshot_outputs")
    spark.sparkContext.setLogLevel("ERROR")
    result = {}
    for name in names:
        pdf = specs[name].fn(spark, sf_dir).toPandas()
        result[name] = frame_fingerprint(pdf)
        print(f"{name}: {result[name]}")
    existing = {}
    if os.path.exists(out_path):
        with open(out_path) as fh:
            existing = json.load(fh)
    existing.update({f"{sf_dir}::{k}": v for k, v in result.items()})
    with open(out_path, "w") as fh:
        json.dump(existing, fh, indent=1, sort_keys=True)
    spark.stop()


if __name__ == "__main__":
    main()
