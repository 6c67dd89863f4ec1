"""Catalog: ingest validation, registration, multi-table, reset."""

from __future__ import annotations

import pytest

from ai_batch_processing_spark.catalog import Catalog
from ai_batch_processing_spark.io.readers import IngestError


def test_ingest_registers_view_and_schema(spark, tmp_path):
    p = tmp_path / "people.csv"
    p.write_text("name,age\nana,31\nbo,22\n")
    cat = Catalog(spark)
    df = cat.ingest(str(p))
    assert cat.names() == ["people"]
    assert cat.schema("people") == ["name", "age"]
    assert spark.sql("SELECT COUNT(*) AS n FROM people").first().n == 2
    assert df.count() == 2
    cat.reset()


def test_multi_table_join_via_sql(spark, tmp_path):
    (tmp_path / "a.csv").write_text("k,v\n1,x\n2,y\n")
    (tmp_path / "b.csv").write_text("k,w\n1,10\n3,30\n")
    cat = Catalog(spark)
    cat.ingest(str(tmp_path / "a.csv"))
    cat.ingest(str(tmp_path / "b.csv"))
    out = spark.sql("SELECT a.k, v, w FROM a JOIN b ON a.k = b.k").collect()
    assert len(out) == 1 and out[0].v == "x"
    cat.reset()
    assert cat.names() == []


def test_ingest_rejects_unknown_extension_and_size_cap(spark, tmp_path):
    bad = tmp_path / "data.xlsx"
    bad.write_text("nope")
    cat = Catalog(spark)
    with pytest.raises(IngestError, match="Unsupported file format"):
        cat.ingest(str(bad))
    big = tmp_path / "big.csv"
    big.write_text("a,b\n" + "1,2\n" * 3_000_000)  # >10 MB
    with pytest.raises(IngestError, match="too large"):
        cat.ingest(str(big), enforce_size_cap=True)
    cat.ingest(str(big))  # no cap by default: a 100 TB engine ingests it
    cat.reset()
