"""Streaming face of incremental-ingest dedup: a snapshot-drop
directory consumed micro-batch by micro-batch, each batch deduplicated
against the STORED corpus index and the surviving uniques' index rows
appended back — so batch N+1 dedups against (original corpus + every
unique already ingested). This is the recurring 100 TB job
(operators/incremental.py) in its continuous form.

Architecture: ``foreachBatch`` reusing the batch operator
``dedup_incremental_from`` verbatim — the Spark-documented pattern for
stream workloads that need full batch semantics (multi-join + window
best-match selection are not expressible as an append-mode streaming
plan). One code path for batch and streaming means the oracle-certified
batch semantics ARE the streaming semantics.

Exactly-once: the checkpoint makes micro-batch *inputs* exactly-once
(replay re-presents the same files with the same epoch id); both sinks
are made idempotent by scoping every write to an ``epoch_<id>``
subdirectory written with mode=overwrite, so a replayed epoch
overwrites its own partial output instead of duplicating it. (At
production scale both sinks are table-format transactional appends —
Iceberg/Delta — exactly like the snapshot catalog stand-in,
sources/catalog.py.)

Scale shape per micro-batch: identical to the batch operator — the old
side is consumed ONLY by keyed equi-joins over the stored index
relations (fingerprint join, band-signature probe, shingle lookup);
old text never enters, and the per-epoch index append is map-only over
the batch's unique docs. State is on disk (the index), not in the
streaming state store, so executor memory is O(batch), not O(corpus).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.dedup import release_caches
from ..operators.incremental import build_corpus_index, dedup_incremental_from

DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)

_INDEX_TABLES = ("fps", "sigs", "shingles")


def docs_stream(spark: SparkSession, input_dir: str) -> DataFrame:
    """File-drop source: each new parquet file under input_dir is a
    micro-batch of incoming (doc_id, text) documents."""
    return (
        spark.readStream.schema(DOCS_SCHEMA)
        .format("parquet")
        .load(input_dir)
    )


def _epoch_dir(index_dir: str, table: str, epoch) -> str:
    return os.path.join(index_dir, table, f"epoch_{epoch}")


def write_index_epoch(
    docs: DataFrame, index_dir: str, epoch="base"
) -> None:
    """Persist one epoch of index relations (exact fingerprints,
    MinHash band signatures, shingle sets) for ``docs``. Overwriting
    the epoch subdirectory makes a replayed epoch idempotent."""
    fps, sigs, sh = build_corpus_index(docs)
    for table, df in (("fps", fps), ("sigs", sigs), ("shingles", sh)):
        df.write.mode("overwrite").parquet(_epoch_dir(index_dir, table, epoch))
    release_caches()


def read_index(
    spark: SparkSession, index_dir: str
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Load the current stored index: the union of every committed
    epoch (glob over epoch_* subdirectories — at scale, a table-format
    snapshot read)."""
    fps, sigs, sh = (
        spark.read.parquet(os.path.join(index_dir, t, "epoch_*"))
        for t in _INDEX_TABLES
    )
    return fps, sigs, sh


def run_incremental_ingest(
    spark: SparkSession,
    input_dir: str,
    index_dir: str,
    out_dir: str,
    checkpoint_dir: str,
) -> None:
    """Drain every pending snapshot file (availableNow) through the
    incremental dedup, appending verdicts to ``out_dir`` and unique
    docs' index rows back to ``index_dir``."""

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        old_fps, old_sigs, old_sh = read_index(spark, index_dir)
        verdicts = dedup_incremental_from(
            batch_df, old_fps, old_sigs, old_sh
        ).persist()
        verdicts.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"epoch_{epoch_id}")
        )
        uniques = batch_df.join(
            verdicts.filter(F.col("verdict") == "unique").select("doc_id"),
            "doc_id",
            "left_semi",
        )
        # index append BEFORE the epoch commits: a crash here replays
        # the whole epoch, and both writes are epoch-scoped overwrites
        write_index_epoch(uniques, index_dir, epoch_id)
        verdicts.unpersist(blocking=False)
        release_caches()

    q = (
        docs_stream(spark, input_dir)
        .writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_verdicts(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(out_dir, "epoch_*"))
