"""Multimodal plumbing: binary payloads, metadata, Arrow-batched extraction."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from ai_batch_processing_spark.operators.multimodal import (
    attach_payload,
    decode_image,
    extract_media_features,
    fake_decode_features,
    sample_frames,
)


def _docs(spark):
    return spark.createDataFrame(
        [(1, "hello world"), (2, "x" * 200)],
        "doc_id long, text string",
    )


def test_attach_payload_metadata(spark):
    out = attach_payload(_docs(spark)).collect()
    row = out[0]
    assert bytes(row.payload) == b"hello world"
    assert row.media_meta.n_bytes == 11
    assert row.media_meta.md5 == hashlib.md5(b"hello world").hexdigest()
    assert row.media_meta.media_type == "image/fake"


def _pil_available() -> bool:
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


def test_real_decode_raises_without_pil():
    if _pil_available():  # container normally has no PIL; guard anyway
        pytest.skip("PIL present — raw decode works for real")
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG...")


def test_decode_features_stub_mode_falls_back():
    """Without PIL, the capability gate must hand back the deterministic
    fake — same plan, stub features."""
    from ai_batch_processing_spark.operators.multimodal import decode_features

    if _pil_available():
        pytest.skip("PIL present — stub path not reachable")
    p = b"payload bytes"
    assert decode_features(p) == fake_decode_features(p)


def test_decode_features_pil_mode_uses_real_decoder(monkeypatch):
    """With an importable PIL, the SAME function decodes for real — pinned
    by injecting a stub PIL module (both modes covered in one container)."""
    import sys
    import types

    from ai_batch_processing_spark.operators import multimodal

    class _Img:
        width, height, format = 320, 200, "PNG"

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    pil = types.ModuleType("PIL")
    pil.Image = types.SimpleNamespace(open=lambda buf: _Img())
    monkeypatch.setitem(sys.modules, "PIL", pil)
    assert multimodal.decode_features(b"anything") == (320, 200, "png")


def test_extract_media_features_schema_and_determinism(spark):
    df = attach_payload(_docs(spark))
    out = extract_media_features(df).collect()
    assert {"width", "height", "format"} <= set(out[0].asDict())
    expected = fake_decode_features(b"hello world")
    assert (out[0].width, out[0].height, out[0].format) == expected
    assert all(16 <= r.width < 256 for r in out)


def test_sample_frames_one_to_many(spark):
    df = attach_payload(_docs(spark))
    frames = sample_frames(df.select("doc_id", "payload"), every_n_bytes=64).collect()
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert len(by_doc[1]) == 1  # 11 bytes → 1 frame
    assert len(by_doc[2]) == 3  # 200 bytes → 3 frames of 64
    assert bytes(by_doc[2][0].frame_bytes) == b"x" * 64
    assert [r.frame_idx for r in sorted(by_doc[2], key=lambda r: r.frame_idx)] == [0, 1, 2]


def test_metadata_filter_prunes_before_decode(spark):
    # predicate on metadata never touches payload bytes: plan has no Python
    # stage before the filter.
    df = attach_payload(_docs(spark)).filter(F.col("media_meta.n_bytes") > 100)
    assert df.count() == 1
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan


def test_resize_respects_bounds_and_aspect(spark):
    from ai_batch_processing_spark.operators.multimodal import (
        attach_payload,
        fake_decode_features,
        resize_images,
    )

    df = spark.createDataFrame(
        [(1, "some fairly long text payload standing in for image bytes " * 4), (2, "tiny")],
        "id long, text string",
    )
    out = resize_images(attach_payload(df), max_width=32, max_height=32).collect()
    by_id = {r.id: r for r in out}
    for r in out:
        assert r.width <= 32 and r.height <= 32
    # original dims recomputed from the pre-resize payload
    orig = {r.id: fake_decode_features(r.text.encode()) for r in df.collect()}
    for i, (w, h, _f) in orig.items():
        r = by_id[i]
        if w <= 32 and h <= 32:
            assert r.resized == "no" and bytes(r.payload) == r.text.encode()
        else:
            assert r.resized == "yes" and len(r.payload) < len(r.text.encode())
            # aspect ratio preserved within integer rounding
            assert abs(r.width / r.height - w / h) < 0.2


def test_phash_locality_sensitive_and_near_dup_pairs(spark):
    from ai_batch_processing_spark.operators.multimodal import (
        attach_payload,
        media_near_dup_pairs,
        phash64,
    )

    base = b"the quick brown fox jumps over the lazy dog " * 20
    # identical → hamming 0; one-byte edit → small distance; different → far
    h0, h1 = phash64(base), phash64(base[:-1] + b"!")
    h2 = phash64(b"completely different payload content entirely unrelated " * 20)
    def ham(a, b):
        return bin(a ^ b).count("1")
    assert ham(h0, h1) <= 6  # near-identical payloads stay close
    assert ham(h0, h2) > 10  # unrelated payloads are far

    docs = spark.createDataFrame(
        [(1, base.decode()), (2, base.decode()), (3, "unrelated words " * 40)],
        "doc_id long, text string",
    )
    pairs = media_near_dup_pairs(attach_payload(docs), max_hamming=3).collect()
    assert [(p.id_a, p.id_b, p.hamming) for p in pairs] == [(1, 2, 0)]
