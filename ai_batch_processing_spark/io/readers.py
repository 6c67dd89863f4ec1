"""Ingest layer — reference parsers re-expressed as Spark reads (SURVEY.md S1-S5).

Reference semantics preserved:
- extension dispatch ``.csv/.json/.txt`` (main.py:82-97)
- CSV: header row = schema, reject empty/blank headers, drop all-blank rows
  (main.py:117-158)
- JSON: array of objects, schema from the objects, STRICT key-set
  consistency with per-object diagnostics (main.py:160-211)
- TXT: delimiter sniffing comma→pipe→tab with a "header, not prose"
  heuristic, else a single ``content`` column (main.py:213-285)

Differences by design: files are read distributed (no 10 MB cap — that cap
was the reference's memory strategy, main.py:24), and column types may be
inferred instead of all-string when ``infer_types=True``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class IngestError(ValueError):
    """Ingest-time validation failure (parity with reference HTTP 400s)."""


_HEADER_CHARSET_OK = staticmethod  # placeholder for lint friendliness


def _valid_header(name: str) -> bool:
    """Reference header charset: [A-Za-z0-9_] (main.py:265-267)."""
    return bool(name) and name.replace("_", "").isalnum()


def read_table(spark: SparkSession, path: str, infer_types: bool = False) -> DataFrame:
    """Extension-dispatched ingest (main.py:92-97)."""
    ext = os.path.splitext(path)[1].lower()
    if ext == ".csv":
        return read_csv_strict(spark, path, infer_types=infer_types)
    if ext == ".json":
        return read_json_strict(spark, path)
    if ext == ".txt":
        return read_txt_sniffed(spark, path)
    if ext == ".parquet":
        from ai_batch_processing_spark.session import _read_parquet_compat

        return _read_parquet_compat(spark, path)
    if ext == ".orc":
        # ORC ships with Spark (native vectorized reader, predicate pushdown
        # and column pruning like parquet); no extra packages needed.
        return spark.read.orc(path)
    if ext == ".avro":
        # no spark-avro jar in this environment: pure-Python container
        # decoder over binaryFile (see io/avro.py; one task per file)
        from ai_batch_processing_spark.io.avro import read_avro

        return read_avro(spark, path)
    raise IngestError(
        f"Unsupported file format: {ext} (expected .csv/.json/.txt/.parquet/.orc/.avro)"
    )


def read_csv_strict(spark: SparkSession, path: str, infer_types: bool = False) -> DataFrame:
    """CSV scan with the reference's validation (main.py:117-158).

    Header row becomes the schema; empty/blank header cells are rejected;
    rows where every cell is blank are dropped. The scan itself is a
    distributed ``spark.read.csv``; only the one-line header check touches
    the driver.
    """
    df = spark.read.csv(path, header=True, inferSchema=infer_types, mode="FAILFAST")
    if not df.columns:
        raise IngestError("CSV file is empty")
    for c in df.columns:
        if c is None or not c.strip() or c.startswith("_c"):
            raise IngestError("CSV file has invalid or missing column headers")
    # blank-row drop (main.py:139-147): all-whitespace row ≅ every trimmed
    # string cell empty/null.
    non_blank = None
    for c in df.columns:
        cond = F.trim(F.col(c).cast("string")) != ""
        non_blank = cond if non_blank is None else (non_blank | cond)
    return df.filter(non_blank) if non_blank is not None else df


def read_json_strict(spark: SparkSession, path: str) -> DataFrame:
    """JSON array-of-objects scan with strict schema consistency
    (main.py:160-211).

    Spark's reader silently nulls missing keys and unions extra ones; the
    reference instead REJECTS any object whose key set differs from the
    first object's, reporting per-object indices. We reproduce that with a
    distributed validation pass over the parsed objects' key sets before
    returning the DataFrame.
    """
    df = spark.read.json(path, multiLine=True)
    if df.isEmpty():
        raise IngestError("JSON file contains an empty array or no objects")
    if any(c.startswith("_corrupt") for c in df.columns):
        raise IngestError("JSON file must contain an array of objects")

    expected = sorted(df.columns)
    # Key-set per object: re-parse each object as a map and compare key sets.
    raw = spark.read.text(path, wholetext=True)
    objects = raw.select(
        F.posexplode(
            F.from_json(F.col("value"), "array<map<string,string>>")
        ).alias("idx", "obj")
    )
    keyset = objects.select(
        "idx", F.array_sort(F.map_keys("obj")).alias("keys")
    )
    bad = keyset.filter(F.col("keys") != F.array(*[F.lit(c) for c in expected]))
    bad_rows = bad.select("idx", F.to_json("keys").alias("keys")).limit(10).collect()
    if bad_rows:
        detail = "; ".join(
            f"object {r.idx}: keys {r.keys} != expected {expected}" for r in bad_rows
        )
        raise IngestError(f"Inconsistent JSON object structure: {detail}")
    return df


# TXT sniffing (main.py:225-238): examine the FIRST LINE only.
def _sniff_delimiter(first_line: str) -> str | None:
    if "," in first_line:
        parts = [p.strip() for p in first_line.split(",")]
        # "looks like a header, not prose": ≥2 tokens, each short, no spaces
        # (main.py:226-231).
        if len(parts) >= 2 and all(p and len(p) < 30 and " " not in p for p in parts):
            return ","
    if "|" in first_line:
        return "|"
    if "\t" in first_line:
        return "\t"
    return None


def read_txt_sniffed(spark: SparkSession, path: str) -> DataFrame:
    """TXT scan with format sniffing (main.py:213-285).

    Structured mode: sniffed delimiter + validated headers + strict arity
    (FAILFAST). Simple mode: one ``content`` column, blank lines dropped.
    The sniff reads one line on the driver; the data scan is distributed.
    """
    with open(path, encoding="utf-8") as fh:  # driver-side: first line only
        first_line = fh.readline().rstrip("\n")
    delim = _sniff_delimiter(first_line)
    if delim is not None:
        headers = [h.strip() for h in first_line.split(delim)]
        if all(_valid_header(h) for h in headers):
            return spark.read.csv(path, header=True, sep=delim, mode="FAILFAST")
    df = spark.read.text(path).withColumnRenamed("value", "content")
    return df.select(F.trim("content").alias("content")).filter(F.col("content") != "")
