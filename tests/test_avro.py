from __future__ import annotations

import math


SCHEMA = {
    "type": "record",
    "name": "doc",
    "fields": [
        {"name": "doc_id", "type": "long"},
        {"name": "text", "type": ["null", "string"]},
        {"name": "score", "type": "double"},
        {"name": "ok", "type": "boolean"},
        {"name": "payload", "type": "bytes"},
        {"name": "small", "type": "int"},
        {"name": "ratio", "type": "float"},
    ],
}


def _rows(n, offset=0):
    return [
        {
            "doc_id": i + offset,
            "text": None if i % 7 == 3 else f"doc number {i + offset} é中",
            "score": i * 0.125,  # binary-exact
            "ok": i % 2 == 0,
            "payload": bytes([i % 256, (i * 3) % 256]),
            "small": -i,
            "ratio": float(i),
        }
        for i in range(n)
    ]


def test_avro_roundtrip_null_and_deflate_codecs(spark, tmp_path):
    from ai_batch_processing_spark.io.avro import read_avro, write_avro_file

    d = tmp_path / "av"
    d.mkdir()
    write_avro_file(_rows(250), SCHEMA, str(d / "a.avro"), codec="null", block_size=64)
    write_avro_file(
        _rows(250, offset=1000), SCHEMA, str(d / "b.avro"), codec="deflate", block_size=100
    )
    df = read_avro(spark, str(d))
    got = {r.doc_id: r for r in df.collect()}
    assert len(got) == 500
    for i in (0, 3, 17, 249):
        r = got[i]
        assert r.text == (None if i % 7 == 3 else f"doc number {i} é中")
        assert r.score == i * 0.125
        assert r.ok == (i % 2 == 0)
        assert bytes(r.payload) == bytes([i % 256, (i * 3) % 256])
        assert r.small == -i
        assert math.isclose(r.ratio, float(i))
    assert got[1003].text is None  # nullable union survives the deflate file


def test_avro_zigzag_negative_and_boundary_longs(spark, tmp_path):
    from ai_batch_processing_spark.io.avro import read_avro, write_avro_file

    schema = {
        "type": "record",
        "name": "t",
        "fields": [{"name": "v", "type": "long"}],
    }
    vals = [0, -1, 1, -2, 63, 64, -64, -65, 2**31, -(2**31), 2**62, -(2**62)]
    d = tmp_path / "zz"
    d.mkdir()
    write_avro_file([{"v": v} for v in vals], schema, str(d / "z.avro"))
    got = sorted(r.v for r in read_avro(spark, str(d)).collect())
    assert got == sorted(vals)


def test_avro_rejects_unsupported_shapes(tmp_path):
    import pytest
    from ai_batch_processing_spark.io.avro import write_avro_file

    nested = {
        "type": "record",
        "name": "t",
        "fields": [{"name": "m", "type": {"type": "map", "values": "string"}}],
    }
    with pytest.raises(ValueError, match="primitive"):
        write_avro_file([], nested, str(tmp_path / "x.avro"))
