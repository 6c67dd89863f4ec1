"""Export sinks — reference S6-S9 re-expressed as Spark writes.

Reference export rules preserved (main.py:681-914, EXPORT_ANALYSIS.md):
- results sorted by ``row_index`` so output order == input order
  (main.py:697)
- column order: ``group, main_content, <original columns sorted>,
  [prompt], response, timestamp`` (main.py:703-733)
- missing values default to ``""`` (main.py:716-733)
- per-row text files named ``result_{i}_{sanitized group}``; sanitization
  keeps [A-Za-z0-9 _-], empty → ``unknown`` (main.py:807-809)

Consolidated exports use ``coalesce(1)`` — correct for result-sized data
(an export a human downloads); raw-scale output should use the plain
partitioned writers instead.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ai_batch_processing_spark.registry import register

RESERVED = ["group", "main_content", "prompt", "response", "timestamp", "row_index", "error"]


def export_projection(df: DataFrame, include_prompt: bool = True) -> DataFrame:
    """Reorder to the reference's export schema and default nulls to ''.

    Keeps ``row_index`` ordering applied; the index column itself is not
    part of the export row (main.py:713-733).
    """
    originals = sorted(c for c in df.columns if c not in RESERVED)
    ordered = ["group", "main_content", *originals]
    if include_prompt and "prompt" in df.columns:
        ordered.append("prompt")
    ordered.append("response")
    if "timestamp" in df.columns:
        ordered.append("timestamp")
    out = df.orderBy("row_index") if "row_index" in df.columns else df
    cols = [F.coalesce(F.col(c).cast("string"), F.lit("")).alias(c) for c in ordered if c in df.columns]
    return out.select(*cols)


def write_consolidated_json(df: DataFrame, path: str, include_prompt: bool = True) -> None:
    """S6: one JSON-lines file with the export projection applied."""
    export_projection(df, include_prompt).coalesce(1).write.mode("overwrite").json(path)


def write_consolidated_csv(df: DataFrame, path: str, include_prompt: bool = True) -> None:
    """S7: one CSV file, header on, export projection applied."""
    export_projection(df, include_prompt).coalesce(1).write.mode("overwrite").csv(path, header=True)


def sanitize_group_expr(col: Column | str) -> Column:
    """Filename sanitization (main.py:807-809): keep [A-Za-z0-9 _-]; empty → 'unknown'."""
    c = F.col(col) if isinstance(col, str) else col
    cleaned = F.trim(F.regexp_replace(c.cast("string"), "[^A-Za-z0-9 _-]", ""))
    return F.when(cleaned == "", F.lit("unknown")).otherwise(cleaned)


def individual_file_rows(df: DataFrame, structured: bool = True) -> DataFrame:
    """S8 row shape: (filename, body) per result row.

    ``structured=True`` writes the INPUT/PROMPT/RESPONSE/TIMESTAMP body
    (main.py:791-804); otherwise the bare response.
    """
    filename = F.concat(
        F.lit("result_"),
        F.col("row_index").cast("string"),
        F.lit("_"),
        sanitize_group_expr("group"),
        F.lit(".txt"),
    )
    if structured:
        ts = F.coalesce(F.col("timestamp").cast("string"), F.lit("")) if "timestamp" in df.columns else F.lit("")
        body = F.concat(
            F.lit("INPUT: "), F.coalesce(F.col("main_content"), F.lit("")),
            F.lit("\n\nPROMPT: "), F.coalesce(F.col("prompt"), F.lit("")),
            F.lit("\n\nRESPONSE: "), F.coalesce(F.col("response"), F.lit("")),
            F.lit("\n\nTIMESTAMP: "), ts,
        )
    else:
        body = F.coalesce(F.col("response"), F.lit(""))
    return df.select(filename.alias("filename"), body.alias("body"))


def write_individual_files(df: DataFrame, out_dir: str, structured: bool = True) -> int:
    """S8: one text file per result row under ``out_dir``.

    Executed with ``foreachPartition`` so files are written in parallel by
    the tasks that hold the rows (``out_dir`` must be a shared filesystem
    on a real cluster). One-file-per-row is inherently export-sized — the
    reference zips these for download; callers can zip ``out_dir``.
    Returns the number of files written.
    """
    os.makedirs(out_dir, exist_ok=True)
    rows = individual_file_rows(df, structured)

    def write_partition(it):
        for row in it:
            with open(os.path.join(out_dir, row.filename), "w", encoding="utf-8") as fh:
                fh.write(row.body)

    rows.foreachPartition(write_partition)
    return len(os.listdir(out_dir))


def export_zip(
    df: DataFrame,
    zip_path: str,
    format_type: str = "both",
    include_prompt: bool = True,
    structured: bool = True,
) -> str:
    """S9 parity: one downloadable ZIP (main.py:820-914).

    ``format_type``: ``json`` / ``csv`` → consolidated file only;
    ``individual`` → one text file per row under ``individual/``;
    ``both`` → ``individual/*`` plus ``consolidated/results.{json,csv}``.

    Spark writes everything in parallel to a staging dir; only the final
    ZIP assembly is a driver-side walk (the reference builds the whole
    archive in RAM — main.py:858; here rows never pass through the
    driver). Returns ``zip_path``.
    """
    import shutil
    import tempfile
    import zipfile

    staging = tempfile.mkdtemp(prefix="abps_export_")
    try:
        members: list[tuple[str, str]] = []  # (arcname, local path)
        if format_type in ("json", "both"):
            out = os.path.join(staging, "json")
            write_consolidated_json(df, out, include_prompt)
            part = next(p for p in os.listdir(out) if p.startswith("part-"))
            members.append(("consolidated/results.json", os.path.join(out, part)))
        if format_type in ("csv", "both"):
            out = os.path.join(staging, "csv")
            write_consolidated_csv(df, out, include_prompt)
            part = next(p for p in os.listdir(out) if p.startswith("part-"))
            members.append(("consolidated/results.csv", os.path.join(out, part)))
        if format_type in ("individual", "both"):
            out = os.path.join(staging, "individual")
            write_individual_files(df, out, structured)
            members.extend(
                (f"individual/{name}", os.path.join(out, name)) for name in sorted(os.listdir(out))
            )
        if not members:
            raise ValueError(f"unknown format_type: {format_type!r}")
        with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
            for arcname, local in members:
                zf.write(local, arcname)
        return zip_path
    finally:
        shutil.rmtree(staging, ignore_errors=True)


def write_partitioned_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    sort_by: list[str] | None = None,
    target_rows_per_file: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Scale-path parquet writer: controls file count and in-file ordering.

    The consolidated writers above are for human-download exports; THIS is
    how pipeline output should land at scale:

    - ``target_rows_per_file`` repartitions before the write so each task
      emits one right-sized file — the small-files problem (one file per
      shuffle partition per partition-dir) is death at 100 TB.
    - ``sort_by`` sorts within partitions before writing, so parquet
      row-group min/max stats become selective and later scans with
      filters on those columns skip whole row groups (poor-man's
      Z-order for the single-column case).
    """
    out = df
    if target_rows_per_file is not None:
        n_rows = df.count()
        n_files = max(1, -(-n_rows // target_rows_per_file))
        out = (
            out.repartition(n_files, *[F.col(c) for c in partition_by])
            if partition_by
            else out.repartition(n_files)
        )
    if sort_by:
        out = out.sortWithinPartitions(*sort_by)
    writer = out.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


# ---------------------------------------------------------------------------
# Z-order layout (space-filling-curve clustering for multi-column pruning)
# ---------------------------------------------------------------------------
def zorder_value(a: Column, b: Column, a_min: Column, a_max: Column, b_min: Column, b_max: Column, bits: int = 16) -> Column:
    """Morton (Z-order) value interleaving two columns' ``bits``-bit
    rank buckets — pure Catalyst, no UDF.

    Each column scales to [0, 2^bits) against its (min, max) range
    (broadcast 1-row aggregates — never driver-side), then bit i of a
    lands at position 2i and bit i of b at 2i+1. Rows close in zvalue are
    close in BOTH dimensions, so sorting the file layout by zvalue gives
    parquet row-group min/max stats that prune 2-D box predicates —
    single-column sort layouts only ever prune one of the two.
    """
    span_a = (a_max - a_min + 1).cast("double")
    span_b = (b_max - b_min + 1).cast("double")
    scale = float(1 << bits)
    qa = F.least(F.lit((1 << bits) - 1), F.floor((a - a_min).cast("double") / span_a * scale).cast("long"))
    qb = F.least(F.lit((1 << bits) - 1), F.floor((b - b_min).cast("double") / span_b * scale).cast("long"))
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (
            z
            + F.shiftleft(F.shiftright(qa, i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(F.shiftright(qb, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def write_zordered_parquet(
    df: DataFrame, path: str, col_a: str, col_b: str, bits: int = 16, n_files: int | None = None
) -> None:
    """Write ``df`` as parquet laid out along the (col_a, col_b) Z-curve.

    Range-partition on the zvalue (distributed sort — each output file
    covers a compact Z-range, i.e. a small rectangle in (a, b) space),
    then sort within partitions so row-group min/max stats are tight for
    BOTH columns. A reader filtering ``a BETWEEN .. AND b BETWEEN ..``
    prunes most files/row-groups on footer stats alone — the layout
    half of what engines with native Z-ORDER clustering do.
    """
    from ai_batch_processing_spark.session import shuffle_partitions

    mins = df.agg(
        F.min(col_a).alias("_amin"), F.max(col_a).alias("_amax"),
        F.min(col_b).alias("_bmin"), F.max(col_b).alias("_bmax"),
    )
    z = zorder_value(
        F.col(col_a), F.col(col_b),
        F.col("_amin"), F.col("_amax"), F.col("_bmin"), F.col("_bmax"), bits
    )
    n = n_files or shuffle_partitions(df.sparkSession)
    (
        df.crossJoin(F.broadcast(mins))
        .withColumn("_z", z)
        .repartitionByRange(n, "_z")
        .sortWithinPartitions("_z")
        .drop("_z", "_amin", "_amax", "_bmin", "_bmax")
        .write.mode("overwrite")
        .parquet(path)
    )


@register(
    "q145_zorder_values",
    oracle="""
        WITH rng AS (
            SELECT MIN(l_orderkey) AS amin, MAX(l_orderkey) AS amax,
                   MIN(l_partkey) AS bmin, MAX(l_partkey) AS bmax
            FROM lineitem
        ),
        q AS (
            SELECT l_orderkey, l_partkey, l_linenumber,
                   LEAST(65535, CAST(FLOOR(CAST(l_orderkey - amin AS DOUBLE)
                        / CAST(amax - amin + 1 AS DOUBLE) * 65536.0) AS BIGINT)) AS qa,
                   LEAST(65535, CAST(FLOOR(CAST(l_partkey - bmin AS DOUBLE)
                        / CAST(bmax - bmin + 1 AS DOUBLE) * 65536.0) AS BIGINT)) AS qb
            FROM lineitem CROSS JOIN rng
        )
        SELECT l_orderkey, l_partkey, l_linenumber,
               CAST((SELECT SUM(
                   (((qa >> CAST(i AS INT)) & 1) << CAST(2 * i AS INT))
                 + (((qb >> CAST(i AS INT)) & 1) << CAST(2 * i + 1 AS INT)))
                 FROM generate_series(0, 15) s(i)) AS BIGINT) AS zvalue
        FROM q
        ORDER BY l_orderkey, l_linenumber
    """,
    doc=(
        "Morton/Z-order values over (l_orderkey, l_partkey): 16-bit rank "
        "buckets against broadcast min/max aggregates, bits interleaved by "
        "a generated Catalyst expression — the clustering key behind "
        "write_zordered_parquet's 2-D-prunable file layout."
    ),
    tags=("layout", "zorder", "io"),
)
def q145_zorder_values(spark, sf_dir: str) -> DataFrame:
    from ai_batch_processing_spark.session import load_tables

    li = load_tables(spark, sf_dir, ["lineitem"])["lineitem"]
    mins = li.agg(
        F.min("l_orderkey").alias("_amin"), F.max("l_orderkey").alias("_amax"),
        F.min("l_partkey").alias("_bmin"), F.max("l_partkey").alias("_bmax"),
    )
    z = zorder_value(
        F.col("l_orderkey"), F.col("l_partkey"),
        F.col("_amin"), F.col("_amax"), F.col("_bmin"), F.col("_bmax"), 16
    )
    return (
        li.crossJoin(F.broadcast(mins))
        .select("l_orderkey", "l_partkey", "l_linenumber", z.alias("zvalue"))
        .orderBy("l_orderkey", "l_linenumber")
    )
