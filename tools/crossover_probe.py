"""Spark-vs-DuckDB crossover: key-shifted sf0.1 replicas, both engines timed.

Round-1 verdict asked for proof, not rhetoric: at sf0.1 most bench
queries finish in milliseconds of data work, so Spark's ~0.4-0.5 s
scheduling floor dominates wall-clock and single-node DuckDB wins every
micro-query. This probe synthesizes N× replicas of sf0.1 (fact tables get
key-shifted copies; dimension tables are shared via symlink, so joins and
group keys keep their real shape) and times the SAME registered query on
Spark (collect) and its DuckDB oracle (fetchall) at each multiplier —
the table shows where DuckDB's linearly-growing wall crosses Spark's
near-flat line.

Run: ``python tools/crossover_probe.py [mult ...]`` (default 1 10 100).
Writes CROSSOVER.md; synthesized data lives under /tmp/spark_graft_xsf.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
WORK = "/tmp/spark_graft_xsf"
# fact tables: replicate with per-copy key shifts; the offset is one
# shared constant per key DOMAIN (orderkey spans lineitem+orders, doc/vec
# id spans documents+embeddings) so joins keep lining up across replicas.
# Everything else symlinks to sf0.1 (dimensions don't grow).
OFFSET = 10_000_000  # far above every sf0.1 key domain (max ~600k)
SHIFT = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
LINKED = ["region", "nation", "customer", "supplier", "part", "events"]
QUERIES = [
    "q01_pricing_summary",
    "q02_shipping_priority",
    "q03_region_revenue",
    "q40_dedup_exact",
    "q73_training_data_filter",
    "q99_nation_trade_volume",
    "q100_product_profit",
    # token-heavy corpus statistics: genuinely CPU-bound per row, the
    # regime where the engines compare on data-path work, not floors
    "q112_tfidf_top_terms",
    "q114_unigram_surprise",
]


def synthesize(spark, mult: int) -> str:
    from pyspark.sql import functions as F

    out = f"{WORK}/x{mult}"
    if os.path.isdir(out):
        return out  # replicas are deterministic; reuse across runs
    os.makedirs(out, exist_ok=True)
    for t in LINKED:
        os.symlink(f"{SRC}/{t}.parquet", f"{out}/{t}.parquet")
    for t, keys in SHIFT.items():
        if mult == 1:
            os.symlink(f"{SRC}/{t}.parquet", f"{out}/{t}.parquet")
            continue
        df = spark.read.parquet(f"{SRC}/{t}.parquet")
        copies = [
            df.select(
                *[
                    (F.col(c) + i * OFFSET).alias(c) if c in keys else F.col(c)
                    for c in df.columns
                ]
            )
            for i in range(mult)
        ]
        u = copies[0]
        for c in copies[1:]:
            u = u.unionAll(c)
        # one file-set per table dir; parquet subdir keeps duck_con's
        # '{dir}/{t}.parquet' glob working (DuckDB reads dirs of parquet)
        u.repartition(max(4, mult)).write.mode("overwrite").parquet(f"{out}/{t}.parquet")
    return out


def main() -> None:
    mults = [int(a) for a in sys.argv[1:]] or [1, 10, 100]
    import duckdb

    from ai_batch_processing_spark.registry import load_all
    from ai_batch_processing_spark.session import get_spark
    from ai_batch_processing_spark.testing import TABLES

    def dir_con(d: str) -> duckdb.DuckDBPyConnection:
        # like testing.duck_con, but Spark-written tables are DIRECTORIES
        # of part files — glob those for DuckDB
        con = duckdb.connect()
        for t in TABLES:
            p = f"{d}/{t}.parquet"
            src = f"read_parquet('{p}/*.parquet')" if os.path.isdir(p) and not os.path.islink(p) else f"'{p}'"
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM {src}")
        return con

    specs = load_all()

    results: dict[str, dict[int, tuple[float, float]]] = {q: {} for q in QUERIES}
    for mult in mults:
        # fresh session per multiplier: accumulated broadcasts / old-gen GC
        # state from earlier multipliers inflated later walls ~3× (measured
        # q03 x100: 9.9s mid-sequence vs 3.2s isolated) — isolation makes
        # the numbers comparable run-to-run
        spark = get_spark("crossover_probe")
        spark.sparkContext.setLogLevel("ERROR")
        for q in QUERIES:  # warm each plan shape (JIT/codegen)
            specs[q].fn(spark, "/root/testdata/sf0.001").count()
        spark.catalog.clearCache()
        d = synthesize(spark, mult)
        con = dir_con(d)
        for q in QUERIES:
            spec = specs[q]
            # min of 2 runs per engine: the first Spark run at a new data
            # scale pays JIT/GC transients unrelated to the plan (measured
            # 11.7s → 5.6s steady on an identical q03 plan); DuckDB gets
            # the same treatment for symmetry
            duck_wall = spark_wall = float("inf")
            for _ in range(2):
                t0 = time.time()
                con.execute(spec.oracle).fetchall()
                duck_wall = min(duck_wall, time.time() - t0)
            for _ in range(2):
                t0 = time.time()
                spec.fn(spark, d).collect()
                spark_wall = min(spark_wall, time.time() - t0)
                spark.catalog.clearCache()
            results[q][mult] = (duck_wall, spark_wall)
            print(
                f"# x{mult} {q}: duckdb={duck_wall:.2f}s spark={spark_wall:.2f}s",
                file=sys.stderr,
            )
        con.close()
        spark.stop()

    lines = [
        "# CROSSOVER — Spark vs single-node DuckDB on growing data",
        "",
        "Generated by `tools/crossover_probe.py`. xN = N key-shifted replicas",
        "of sf0.1 (fact tables replicated, dimensions shared), both engines",
        "running the SAME registered query / oracle pair end-to-end",
        "(collect/fetchall), warmed, caches cleared between runs, local[32].",
        "",
        "The claim under test (BASELINE.md): sf0.1 walls are dominated by",
        "Spark's fixed ~0.4-0.5 s scheduling floor, so the ≤2× bar must be",
        "read at the scale where queries do real data work. The table shows",
        "where DuckDB's linear growth crosses Spark's near-flat line.",
        "",
        "| query | engine | " + " | ".join(f"x{m} (s)" for m in mults) + " |",
        "|---|---|" + "---|" * len(mults),
    ]
    for q in QUERIES:
        duck = [f"{results[q][m][0]:.2f}" for m in mults]
        spk = [f"{results[q][m][1]:.2f}" for m in mults]
        lines.append(f"| {q} | duckdb | " + " | ".join(duck) + " |")
        lines.append(f"| {q} | spark | " + " | ".join(spk) + " |")
        ratios = [results[q][m][1] / max(results[q][m][0], 1e-9) for m in mults]
        cross = next((m for m, r in zip(mults, ratios) if r <= 2.0), None)
        lines.append(
            f"| {q} | spark/duck ratio | "
            + " | ".join(f"{r:.1f}×" for r in ratios)
            + " |"
        )
        print(
            f"# {q}: crossover (≤2×) at x{cross}" if cross else f"# {q}: no crossover in range",
            file=sys.stderr,
        )
    lines.append("")
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "CROSSOVER.md")
    with open(path, "w", encoding="utf-8") as fh:
        fh.write("\n".join(lines))
    print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
