"""Streaming extraction scaffold + multimodal decode-stub plumbing."""

from __future__ import annotations

import os

import pytest


def test_streaming_extraction_available_now(spark, tmp_path):
    from readability_py_spark.plans.bench_extract import build_pages_df
    from readability_py_spark.streaming.extract_stream import (
        pages_stream,
        run_to_memory_sink,
        streaming_extraction,
    )

    in_dir = str(tmp_path / "pages_in")
    pages = build_pages_df(spark, 40)
    pages.write.parquet(in_dir)
    n_expected = (
        pages.filter("lang != ''").select("url").distinct().count()
    )

    stream = streaming_extraction(pages_stream(spark, in_dir))
    assert stream.isStreaming
    run_to_memory_sink(stream, "extracted_stream")
    out = spark.sql("SELECT * FROM extracted_stream")
    rows = out.collect()
    assert len(rows) == n_expected
    assert all(r["metrics"]["parse_ok"] for r in rows)


def test_media_decode_stub_matches_core(spark):
    import hashlib

    from readability_py_spark.operators.multimodal import q_media_decode_stub
    from readability_py_spark.session import load_table

    sf = "/root/testdata/sf0.001"
    out = {r["doc_id"]: r for r in q_media_decode_stub(spark, sf).collect()}
    docs = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, sf, "documents").limit(20).collect()
    }
    for doc_id, text in docs.items():
        h = hashlib.md5(text.encode()).hexdigest()
        r = out[doc_id]
        assert r["width"] == 64 + int(h[0:2], 16)
        assert r["height"] == 64 + int(h[2:4], 16)
        assert r["media_type"] == "application/octet-stream"


def test_media_magic_sniff():
    from readability_py_spark.operators.multimodal import sniff_media_type

    assert sniff_media_type(b"\xff\xd8\xff\xe0rest") == "image/jpeg"
    assert sniff_media_type(b"\x89PNG\r\n") == "image/png"
    assert sniff_media_type(b"plain text") == "application/octet-stream"


def test_decode_real_is_gated():
    from readability_py_spark.operators.multimodal import decode_real

    with pytest.raises(NotImplementedError):
        decode_real(b"\xff\xd8\xff")
