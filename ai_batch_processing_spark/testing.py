"""Shared correctness-comparison helpers (DuckDB oracle vs Spark result).

Mirrors the driver's gate: row count + column names + order-insensitive
values. Used by ``tools/check_correctness.py`` and the pytest suite.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for c in pdf.columns:
        if pd.api.types.is_datetime64_any_dtype(pdf[c]):
            pdf[c] = pd.to_datetime(pdf[c]).astype("datetime64[us]")
        elif pdf[c].dtype == object:
            pdf[c] = pdf[c].map(lambda v: str(v) if v is not None else None)
    if len(pdf):
        pdf = pdf.sort_values(by=list(pdf.columns), kind="mergesort").reset_index(drop=True)
    return pdf


def compare_frames(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    """Return a list of problems; empty list = match."""
    problems: list[str] = []
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"row count: spark={len(spark_pdf)} duck={len(duck_pdf)}")
    scols, dcols = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    if scols != dcols:
        problems.append(f"columns: spark={scols} duck={dcols}")
        return problems
    if problems:
        return problems
    s, d = normalize(spark_pdf), normalize(duck_pdf)
    for c in s.columns:
        sv, dv = s[c], d[c]
        # The driver's hash gate does NOT coerce numeric KIND: int64-vs-float64
        # drift (e.g. DuckDB HUGEINT from SUM over integers → float64)
        # hash-mismatches even when values are equal ("3" vs "3.0"), while
        # integer-width drift (int32 vs int64) hashes identically. Surface
        # kind drift here so oracles stay type-exact (VERDICT r1 #1).
        if sv.dtype.kind != dv.dtype.kind and {sv.dtype.kind, dv.dtype.kind} <= {
            "i", "u", "f", "b", "O", "M",
        } and not ({sv.dtype.kind, dv.dtype.kind} <= {"i", "u"}):
            problems.append(f"dtype kind drift in {c!r}: spark={sv.dtype} duck={dv.dtype}")
        if pd.api.types.is_float_dtype(sv) or pd.api.types.is_float_dtype(dv):
            ok = np.allclose(
                sv.astype(float),
                dv.astype(float),
                rtol=0,
                atol=1e-9,
                equal_nan=True,
            )
        elif sv.dtype == object:
            ok = sv.fillna("\0NULL").equals(dv.fillna("\0NULL"))
        else:
            ok = sv.isna().equals(dv.isna()) and (sv.dropna().values == dv.dropna().values).all()
        if not ok:
            mism = ~((sv == dv) | (sv.isna() & dv.isna()))
            idx = mism[mism].index[:3].tolist()
            problems.append(
                f"values differ in {c!r} at {idx}: spark={sv.loc[idx].tolist()} duck={dv.loc[idx].tolist()}"
            )
    return problems
