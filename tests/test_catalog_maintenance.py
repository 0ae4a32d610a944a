"""Catalog maintenance: small-file compaction + snapshot expiry.

Checkpointed ingest (plans/extract_job, streaming/incremental_stream)
commits one snapshot per run/epoch, so a long-lived table accumulates
many small files — scan cost degrades with file count, not bytes. The
catalog's compact() is Iceberg's rewrite_data_files and
expire_snapshots() is Iceberg's expiry, over the same commit-log
protocol the rest of the repo already relies on."""

from __future__ import annotations

import os

from pyspark.sql import functions as F


def _n_parquet_files(catalog, table: str) -> int:
    n = 0
    for s in catalog.live_snapshots(table):
        sdir = catalog._snap_dir(table, s["snapshot_id"])
        n += sum(1 for fn in os.listdir(sdir) if fn.endswith(".parquet"))
    return n


def test_compact_and_expire_lifecycle(spark, tmp_path):
    from readability_py_spark.sources.catalog import LocalTableCatalog

    cat = LocalTableCatalog(str(tmp_path))
    # five small appends, 4 files each → 20 live files
    for i in range(5):
        df = (
            spark.range(i * 10, (i + 1) * 10)
            .select(F.col("id").alias("doc_id"), (F.col("id") * 2).alias("v"))
            .repartition(4)
        )
        cat.append(df, "t", lineage={"batch": i})
    assert _n_parquet_files(cat, "t") == 20
    before = {(r.doc_id, r.v) for r in cat.read(spark, "t").collect()}
    assert len(before) == 50

    # compaction: one new baseline snapshot, tiny table → 1 file
    rec = cat.compact(spark, "t")
    assert rec["kind"] == "compaction"
    assert len(rec["replaces"]) == 5
    assert rec["total_rows"] == 50
    after = {(r.doc_id, r.v) for r in cat.read(spark, "t").collect()}
    assert after == before  # same rows, never a lost or doubled row
    assert _n_parquet_files(cat, "t") == 1
    # reads union from the baseline forward only
    assert [s["snapshot_id"] for s in cat.live_snapshots("t")] == [
        rec["snapshot_id"]
    ]
    # time travel to a replaced snapshot still works pre-expiry
    old_id = rec["replaces"][0]
    assert cat.read_snapshot(spark, "t", old_id).count() == 10

    # appends after the baseline stack on top of it
    df = spark.range(100, 110).select(
        F.col("id").alias("doc_id"), (F.col("id") * 2).alias("v")
    )
    app = cat.append(df, "t")
    assert app["total_rows"] == 60
    assert cat.read(spark, "t").count() == 60
    assert len(cat.live_snapshots("t")) == 2

    # expiry reclaims exactly the replaced snapshots
    expired = cat.expire_snapshots("t")
    assert sorted(expired) == sorted(rec["replaces"])
    assert cat.read(spark, "t").count() == 60
    assert not os.path.exists(cat._snap_dir("t", old_id))
    try:
        cat.read_snapshot(spark, "t", old_id)
        raise AssertionError("expired snapshot must not be readable")
    except KeyError:
        pass
    # the log now holds only the live chain; a second expiry is a no-op
    assert {s["snapshot_id"] for s in cat.snapshots("t")} == {
        rec["snapshot_id"],
        app["snapshot_id"],
    }
    assert cat.expire_snapshots("t") == []


def test_compact_is_crash_safe_before_commit(spark, tmp_path):
    """A compaction dir written but never committed (crash between the
    rewrite and the log append) is an orphan: reads keep unioning the
    old snapshots and see exactly the same rows."""
    from readability_py_spark.sources.catalog import LocalTableCatalog

    cat = LocalTableCatalog(str(tmp_path))
    for i in range(2):
        cat.append(
            spark.range(i * 5, (i + 1) * 5).select(
                F.col("id").alias("doc_id")
            ),
            "t",
        )
    # simulate the crash: land a rewrite in a snapshot-private dir
    # without appending to the commit log
    orphan = cat._snap_dir("t", "deadbeefdeadbeef")
    cat.read(spark, "t").coalesce(1).write.parquet(orphan)
    assert cat.read(spark, "t").count() == 10
    assert len(cat.live_snapshots("t")) == 2
