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


def test_streaming_kill_resume_exactly_once(spark, tmp_path):
    """The streaming face claims exactly-once via checkpointing
    (VERDICT r2 item 5): stop the file-drop stream after a first batch
    of input, drop more files, restart from the SAME checkpoint, and
    verify no url was extracted twice and the union equals a full
    uninterrupted run."""
    from readability_py_spark.streaming.extract_stream import (
        pages_stream,
        run_to_parquet_sink,
        streaming_extraction,
    )

    in_dir = str(tmp_path / "pages_in")
    out_dir = str(tmp_path / "extracted_out")
    ckpt = str(tmp_path / "ckpt")

    # Controlled event times (generate_pages_rows' own +1day dup rows
    # would push run 1's watermark past ALL of batch B, correctly
    # dropping it as late — not the scenario under test): batch A =
    # rows 0-29 at t+0..29s, batch B = rows 30-59 at t+30..59s PLUS a
    # re-delivery of row 0's url at t+5min — inside the watermark, so
    # the RESTORED dedup state must drop it (state recovery, not just
    # source-file tracking).
    import datetime

    from readability_py_spark.sources.fixtures import generate_page_row

    schema = (
        "url string, warc_ts timestamp, html binary, text string, lang string"
    )

    def _tup(r):
        return (r["url"], r["warc_ts"], r["html"], r["text"], r["lang"])

    rows = [generate_page_row(k) for k in range(60)]
    redelivered = dict(rows[0])
    redelivered["warc_ts"] = rows[0]["warc_ts"] + datetime.timedelta(minutes=5)
    batch_a = spark.createDataFrame([_tup(r) for r in rows[:30]], schema)
    batch_b = spark.createDataFrame(
        [_tup(r) for r in rows[30:]] + [_tup(redelivered)], schema
    )

    def _valid_urls(df):
        return {
            r["url"]
            for r in df.filter(
                "lang != '' AND html IS NOT NULL AND octet_length(html) > 0"
            )
            .select("url")
            .distinct()
            .collect()
        }

    urls_a, urls_b = _valid_urls(batch_a), _valid_urls(batch_b)
    assert urls_a and urls_b
    assert urls_a & urls_b == {rows[0]["url"]}  # the re-delivery only

    # run 1: only batch A exists; drain and stop (the "kill": the
    # query terminates with B still undelivered)
    batch_a.write.mode("overwrite").parquet(in_dir)
    q1 = run_to_parquet_sink(
        streaming_extraction(pages_stream(spark, in_dir)), out_dir, ckpt
    )
    assert not q1.isActive
    got1 = {r["url"] for r in spark.read.parquet(out_dir).select("url").collect()}
    assert got1 == urls_a

    # drop batch B, restart from the same checkpoint: only B's files
    # may be consumed (A's are committed in the checkpoint)
    batch_b.write.mode("append").parquet(in_dir)
    run_to_parquet_sink(
        streaming_extraction(pages_stream(spark, in_dir)), out_dir, ckpt
    )
    out = spark.read.parquet(out_dir).select("url").collect()
    urls = [r["url"] for r in out]
    assert len(urls) == len(set(urls)), "a url was extracted twice"
    assert set(urls) == urls_a | urls_b, "resume lost or duplicated pages"


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


def test_streaming_sessionize_matches_batch_twin(spark, tmp_path):
    """The applyInPandasWithState sessionizer must emit exactly the
    sessions the batch lag+cumsum sessionizer computes over the same
    fully-drained input: gap-closed sessions flush with the data,
    open sessions flush when a later file-drop advances the watermark
    past their timeout (driven through a checkpointed parquet sink
    with a restart between drops, so timeout state also survives
    recovery)."""
    from pyspark.sql import functions as F

    from readability_py_spark.operators.relational import (
        q_sessionize_events,
    )
    from readability_py_spark.streaming.extract_stream import (
        run_to_parquet_sink,
    )
    from readability_py_spark.streaming.sessionize_stream import (
        EVENTS_SCHEMA,
        events_stream,
        streaming_sessionize,
    )

    sf = "/root/testdata/sf0.001"
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    ev = (
        spark.read.parquet(os.path.join(sf, "events.parquet"))
        .select("event_id", "ts", "user_id", "event_type", "value")
        .orderBy("ts", "event_id")
        .collect()
    )
    half = ev[: len(ev) // 2], ev[len(ev) // 2 :]

    # drop 1: first half (time-ordered split, so no cross-drop lates)
    spark.createDataFrame(half[0], EVENTS_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)
    run_to_parquet_sink(
        streaming_sessionize(events_stream(spark, in_dir)), out_dir, ckpt
    )

    # drop 2: second half + a far-future sentinel that pushes the
    # watermark past every real session's timeout, restart from the
    # same checkpoint
    sentinel_uid = 10**9
    import datetime as dt

    far = dt.datetime(2030, 1, 1)
    rows2 = [tuple(r) for r in half[1]] + [
        (10**9, far, sentinel_uid, "click", 0.0)
    ]
    spark.createDataFrame(rows2, EVENTS_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)
    run_to_parquet_sink(
        streaming_sessionize(events_stream(spark, in_dir)), out_dir, ckpt
    )

    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in spark.read.parquet(out_dir).collect()
        if r.user_id != sentinel_uid
    }
    expect = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in q_sessionize_events(spark, sf)
        .groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .collect()
    }
    assert got == expect
