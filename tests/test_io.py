"""Ingest parsers (S1-S5) and export sinks (S6-S9) — reference semantics."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from ai_batch_processing_spark.io import (
    IngestError,
    read_csv_strict,
    read_json_strict,
    read_table,
    read_txt_sniffed,
    export_projection,
    sanitize_group_expr,
    write_consolidated_csv,
    write_consolidated_json,
    write_individual_files,
)


# --------------------------------------------------------------------------
# CSV (main.py:117-158)
# --------------------------------------------------------------------------
def test_csv_header_schema_and_blank_row_drop(spark, tmp_path):
    p = tmp_path / "t.csv"
    p.write_text("topic,audience\nAI,Students\n   ,  \nSpark,Engineers\n")
    df = read_csv_strict(spark, str(p))
    assert df.columns == ["topic", "audience"]
    assert df.count() == 2  # all-blank row dropped


def test_csv_quoted_commas(spark, tmp_path):
    p = tmp_path / "t.csv"
    p.write_text('a,b\n"x, y",z\n')
    rows = read_csv_strict(spark, str(p)).collect()
    assert rows[0].a == "x, y"


def test_csv_missing_headers_rejected(spark, tmp_path):
    p = tmp_path / "t.csv"
    p.write_text(",\n1,2\n")
    with pytest.raises(IngestError):
        read_csv_strict(spark, str(p))


# --------------------------------------------------------------------------
# JSON (main.py:160-211)
# --------------------------------------------------------------------------
def test_json_array_of_objects(spark, tmp_path):
    p = tmp_path / "t.json"
    p.write_text(json.dumps([{"a": "1", "b": "2"}, {"a": "3", "b": "4"}]))
    df = read_json_strict(spark, str(p))
    assert sorted(df.columns) == ["a", "b"]
    assert df.count() == 2


def test_json_inconsistent_keys_rejected_with_index(spark, tmp_path):
    p = tmp_path / "t.json"
    p.write_text(json.dumps([{"a": "1", "b": "2"}, {"a": "3"}, {"a": "5", "b": "6", "c": "7"}]))
    with pytest.raises(IngestError, match="object 1"):
        read_json_strict(spark, str(p))


def test_json_empty_array_rejected(spark, tmp_path):
    p = tmp_path / "t.json"
    p.write_text("[]")
    with pytest.raises(IngestError):
        read_json_strict(spark, str(p))


# --------------------------------------------------------------------------
# TXT sniffing (main.py:213-285)
# --------------------------------------------------------------------------
def test_txt_comma_header(spark, tmp_path):
    p = tmp_path / "t.txt"
    p.write_text("topic,audience\nAI,Students\n")
    df = read_txt_sniffed(spark, str(p))
    assert df.columns == ["topic", "audience"]


def test_txt_pipe_and_tab(spark, tmp_path):
    p1 = tmp_path / "p.txt"
    p1.write_text("a|b\n1|2\n")
    assert read_txt_sniffed(spark, str(p1)).columns == ["a", "b"]
    p2 = tmp_path / "tab.txt"
    p2.write_text("a\tb\n1\t2\n")
    assert read_txt_sniffed(spark, str(p2)).columns == ["a", "b"]


def test_txt_prose_with_commas_falls_to_simple(spark, tmp_path):
    # "looks like prose, not a header" heuristic (main.py:226-231)
    p = tmp_path / "t.txt"
    p.write_text("This is a sentence, with a comma in it\nsecond line\n\n")
    df = read_txt_sniffed(spark, str(p))
    assert df.columns == ["content"]
    assert df.count() == 2  # blank line dropped


def test_txt_sniff_order_comma_before_pipe(spark, tmp_path):
    p = tmp_path / "t.txt"
    p.write_text("a,b\nx|y,z|w\n")
    assert read_txt_sniffed(spark, str(p)).columns == ["a", "b"]


def test_read_table_dispatch_and_unknown_ext(spark, tmp_path):
    p = tmp_path / "t.csv"
    p.write_text("a\n1\n")
    assert read_table(spark, str(p)).columns == ["a"]
    with pytest.raises(IngestError, match="Unsupported"):
        read_table(spark, str(tmp_path / "t.xlsx"))


def test_orc_roundtrip_preserves_schema_and_rows(spark, tmp_path):
    src = spark.createDataFrame(
        [(1, "alpha", 1.5), (2, "beta", None)], "id long, name string, score double"
    )
    path = str(tmp_path / "t.orc")
    src.write.orc(path)
    back = read_table(spark, path)
    assert dict(back.dtypes) == dict(src.dtypes)
    assert sorted((r.id, r.name, r.score) for r in back.collect()) == [
        (1, "alpha", 1.5),
        (2, "beta", None),
    ]


# --------------------------------------------------------------------------
# exports (main.py:681-914)
# --------------------------------------------------------------------------
def _results(spark):
    return spark.createDataFrame(
        [
            ("g1", "hello", "prompt-0", "resp-0", 1, "AI", None),
            ("g!!!", "world", "prompt-1", "resp-1", 0, "ML", "x"),
        ],
        "group string, main_content string, prompt string, response string, "
        "row_index long, topic string, note string",
    )


def test_export_projection_column_order_and_null_default(spark):
    out = export_projection(_results(spark))
    # group, main_content, originals sorted, prompt, response (no timestamp col)
    assert out.columns == ["group", "main_content", "note", "topic", "prompt", "response"]
    rows = out.collect()
    assert rows[0].group == "g!!!"  # row_index 0 first (order restored)
    assert rows[0].note == "x"
    assert rows[1].note == ""  # null → '' default


def test_export_projection_without_prompt(spark):
    out = export_projection(_results(spark), include_prompt=False)
    assert "prompt" not in out.columns


def test_consolidated_json_roundtrip(spark, tmp_path):
    path = str(tmp_path / "out_json")
    write_consolidated_json(_results(spark), path)
    files = [f for f in os.listdir(path) if f.endswith(".json")]
    assert len(files) == 1  # consolidated = single file
    lines = [json.loads(l) for l in open(os.path.join(path, files[0]))]
    assert lines[0]["response"] == "resp-1"  # row_index order restored
    assert lines[1]["response"] == "resp-0"


def test_consolidated_csv_roundtrip(spark, tmp_path):
    path = str(tmp_path / "out_csv")
    write_consolidated_csv(_results(spark), path, include_prompt=False)
    files = [f for f in os.listdir(path) if f.endswith(".csv")]
    assert len(files) == 1
    header = open(os.path.join(path, files[0])).readline().strip()
    assert header == "group,main_content,note,topic,response"


def test_sanitize_group_expr(spark):
    df = spark.createDataFrame([("ok name-1_2",), ("!!!",), ("a/b",)], "g string")
    out = [r.s for r in df.select(sanitize_group_expr("g").alias("s")).collect()]
    assert out == ["ok name-1_2", "unknown", "ab"]  # main.py:807-809


def test_individual_files(spark, tmp_path):
    out_dir = str(tmp_path / "individual")
    n = write_individual_files(_results(spark), out_dir)
    assert n == 2
    names = sorted(os.listdir(out_dir))
    assert names == ["result_0_g.txt", "result_1_g1.txt"]  # sanitized group names
    body = open(os.path.join(out_dir, "result_1_g1.txt")).read()
    assert "INPUT: hello" in body and "RESPONSE: resp-0" in body


def test_export_zip_both(spark, tmp_path):
    import json
    import zipfile

    from ai_batch_processing_spark.io.writers import export_zip

    df = spark.createDataFrame(
        [("a", "hi", "p1", "r1", 0, "x"), ("b/!", "yo", "p2", "r2", 1, "y")],
        "group string, main_content string, prompt string, response string, row_index long, extra string",
    )
    zp = str(tmp_path / "out.zip")
    export_zip(df, zp, format_type="both")
    with zipfile.ZipFile(zp) as zf:
        names = sorted(zf.namelist())
        assert "consolidated/results.json" in names
        assert "consolidated/results.csv" in names
        individual = [n for n in names if n.startswith("individual/")]
        assert len(individual) == 2
        # sanitized group in filename: 'b/!' → 'b'
        assert any("_b" in n for n in individual)
        first = json.loads(zf.read("consolidated/results.json").decode().splitlines()[0])
        assert list(first)[:2] == ["group", "main_content"]  # export column order


def test_write_partitioned_parquet_controls_files_and_order(spark, tmp_path):
    import glob

    from ai_batch_processing_spark.io.writers import write_partitioned_parquet

    df = spark.range(10_000).selectExpr("id", "id % 3 as part", "cast(id * 7 % 1000 as long) as v")
    out = str(tmp_path / "out")
    write_partitioned_parquet(
        df, out, partition_by=["part"], sort_by=["v"], target_rows_per_file=2000
    )
    # partition dirs exist; file count bounded by target sizing (not one
    # file per shuffle partition x dir)
    files = glob.glob(f"{out}/part=*/part-*.parquet")
    dirs = {f.split("/part=")[1].split("/")[0] for f in files}
    assert dirs == {"0", "1", "2"}
    assert len(files) <= 8  # 10k rows / 2k per file, +slack for partition skew
    back = spark.read.parquet(out)
    assert back.count() == 10_000
    # in-file ordering: row-group stats selective => reading with a tight
    # filter touches a subset; functional check of sorted-ness per file
    import pyarrow.parquet as pq

    meta = pq.ParquetFile(files[0]).metadata
    col_idx = [meta.schema.column(i).name for i in range(meta.num_columns)].index("v")
    rg0 = meta.row_group(0).column(col_idx).statistics
    assert rg0.has_min_max


def test_zorder_layout_prunes_2d_box_queries(spark, sf_dir, tmp_path):
    """Z-ordered parquet must localize a 2-D box predicate: the matching
    rows of `a BETWEEN .. AND b BETWEEN ..` live in far fewer files than
    under a single-column sort of the same data — both columns' file-level
    min/max stay tight, which is the whole point of the curve."""
    from pyspark.sql import functions as F

    from ai_batch_processing_spark.io.writers import write_zordered_parquet
    from ai_batch_processing_spark.session import load_tables

    li = load_tables(spark, sf_dir, ["lineitem"])["lineitem"].select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    zpath, spath = str(tmp_path / "zord"), str(tmp_path / "sorted")
    write_zordered_parquet(li, zpath, "l_orderkey", "l_partkey", n_files=32)
    li.repartitionByRange(32, "l_orderkey").sortWithinPartitions("l_orderkey").write.parquet(spath)

    amax = li.agg(F.max("l_orderkey")).collect()[0][0]
    bmax = li.agg(F.max("l_partkey")).collect()[0][0]
    box = (
        (F.col("l_orderkey") < amax * 0.25) & (F.col("l_partkey") < bmax * 0.25)
    )

    def files_touched(path):
        return (
            spark.read.parquet(path)
            .filter(box)
            .select(F.input_file_name().alias("f"))
            .distinct()
            .count()
        )

    nz, ns = files_touched(zpath), files_touched(spath)
    # single-col sort: every file in the orderkey quartile matches (partkey
    # spans everything) ≈ 8 files; z-order: only the files whose rectangle
    # intersects the quarter-quarter box
    assert nz < ns
    # and the data itself round-trips
    assert spark.read.parquet(zpath).count() == li.count()
