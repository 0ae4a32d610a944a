"""Streaming incremental-ingest dedup (streaming/incremental_stream.py):
foreachBatch reuse of the batch operator, self-maintaining index, and
idempotent epoch-scoped sinks under checkpoint restart."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from .conftest import SF_SMOKE


def _splits(spark):
    """Deterministic corpus split mirroring q_dedup_incremental: ~80%
    stored corpus, ~20% incoming snapshot, the snapshot further split
    into two micro-batch files by parity."""
    docs = spark.read.parquet(os.path.join(SF_SMOKE, "documents.parquet")).select(
        "doc_id", "text"
    )
    old = docs.filter(F.col("doc_id") % 5 != 0)
    new = docs.filter(F.col("doc_id") % 5 == 0)
    snap_a = new.filter((F.col("doc_id") / 5).cast("long") % 2 == 0)
    snap_b = new.filter((F.col("doc_id") / 5).cast("long") % 2 == 1)
    return old, new, snap_a, snap_b


def _drop(df, stage_dir: str, in_dir: str, name: str) -> None:
    """Write df as ONE parquet file and move it into the watched
    drop directory (staging outside so the file source never sees
    _SUCCESS/.crc clutter or a half-written file)."""
    df.coalesce(1).write.mode("overwrite").parquet(stage_dir)
    part = next(f for f in os.listdir(stage_dir) if f.endswith(".parquet"))
    os.rename(os.path.join(stage_dir, part), os.path.join(in_dir, name))
    shutil.rmtree(stage_dir)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_streaming_incremental_ingest(spark, tmp_path):
    from readability_py_spark.operators.dedup import release_caches
    from readability_py_spark.operators.incremental import (
        build_corpus_index,
        dedup_incremental_from,
    )
    from readability_py_spark.streaming.incremental_stream import (
        read_index,
        read_verdicts,
        run_incremental_ingest,
        write_index_epoch,
    )

    old, _, snap_a, snap_b = _splits(spark)
    in_dir = str(tmp_path / "drops")
    index_dir = str(tmp_path / "index")
    out_dir = str(tmp_path / "verdicts")
    stage = str(tmp_path / "stage")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(in_dir)

    write_index_epoch(old, index_dir, "base")

    # drop snapshot A as one file, drain
    _drop(snap_a, stage, in_dir, "a.parquet")
    run_incremental_ingest(spark, in_dir, index_dir, out_dir, ckpt)

    rows_a = _rows(read_verdicts(spark, out_dir))
    # batch twin: one micro-batch against the base index must equal the
    # batch operator on the same inputs (same code path by construction,
    # but this pins the wiring: schema, index round-trip through parquet)
    fps, sigs, sh = build_corpus_index(old)
    want_a = dedup_incremental_from(snap_a, fps, sigs, sh)
    assert rows_a == _rows(want_a)
    release_caches()

    # a doc unique in A, duplicated verbatim into B → the self-
    # maintained index must flag it exact_dup against A's doc_id
    uniq = min(r[0] for r in rows_a if r[1] == "unique")
    echo_id = 10_000_005  # %5==0: belongs to the snapshot keyspace
    echo = snap_a.filter(F.col("doc_id") == uniq).select(
        F.lit(echo_id).cast("long").alias("doc_id"), "text"
    )
    _drop(snap_b.unionByName(echo), stage, in_dir, "b.parquet")
    run_incremental_ingest(spark, in_dir, index_dir, out_dir, ckpt)

    all_rows = _rows(read_verdicts(spark, out_dir))
    # exactly-once: A's epoch is NOT reprocessed or duplicated — its
    # verdict rows survive byte-identical, and only B's docs are new
    ids_a = {r[0] for r in rows_a}
    assert [r for r in all_rows if r[0] in ids_a] == rows_a
    assert len(all_rows) == len(rows_a) + snap_b.count() + 1
    echo_rows = [r for r in all_rows if r[0] == echo_id]
    assert len(echo_rows) == 1
    assert echo_rows[0][1] == "exact_dup"
    assert echo_rows[0][2] == uniq

    # the index now carries base + both epochs' uniques
    fps2, _, _ = read_index(spark, index_dir)
    n_unique = sum(1 for r in all_rows if r[1] == "unique")
    assert fps2.count() == old.count() + n_unique
    release_caches()
