"""Structured Streaming scaffold for the extraction pipeline.

The north rule is resumable *batch* (SURVEY.md §7.4), but the engine
exposes the streaming face for completeness: a pages stream (e.g. a
WARC-drop directory or Kafka topic at production scale) flows through
the same Arrow-batch extractor; checkpointing gives exactly-once file
sinks. Late data is handled by watermarking warc_ts for windowed
metric aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..plans.extract_job import EXTRACT_SCHEMA, extract_batch

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ]
)


def pages_stream(spark: SparkSession, input_dir: str) -> DataFrame:
    """File-drop source: each new parquet file in input_dir is a
    micro-batch of pages."""
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .format("parquet")
        .load(input_dir)
    )


def streaming_extraction(pages: DataFrame) -> DataFrame:
    """Transform a pages stream into an extracted-articles stream.

    No url-dedup window here (global dedup is a batch concern; in
    streaming it becomes dropDuplicatesWithinWatermark: with plain
    dropDuplicates(["url"]) the event-time column is not part of the
    dedup key, so state is NEVER evicted and grows unboundedly on a
    real stream — the watermark only bounds state when the engine may
    drop keys older than it, which is exactly what the
    WithinWatermark variant (Spark 3.5+) guarantees)."""
    filtered = (
        pages.withWatermark("warc_ts", "1 hour")
        .dropDuplicatesWithinWatermark(["url"])
        .filter(
            (F.col("lang") != "") & F.col("html").isNotNull()
            & (F.octet_length("html") > 0)
        )
        .select("url", "html")
    )
    return filtered.mapInPandas(extract_batch, EXTRACT_SCHEMA)


def streaming_metrics(pages: DataFrame) -> DataFrame:
    """Windowed corpus metrics with late-data tolerance: docs and bytes
    per (10-minute window, lang)."""
    return (
        pages.withWatermark("warc_ts", "30 minutes")
        .groupBy(F.window("warc_ts", "10 minutes"), F.col("lang"))
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum(F.octet_length("html")).alias("bytes"),
        )
    )


def run_to_parquet_sink(
    stream: DataFrame, out_dir: str, checkpoint_dir: str
):
    """Checkpointed parquet sink, drained with availableNow — the
    exactly-once production shape: the checkpoint records which source
    files each committed micro-batch consumed, so a killed-and-
    restarted query never re-extracts a page it already committed
    (proved by tests/test_streaming_and_media.py::
    test_streaming_kill_resume_exactly_once)."""
    q = (
        stream.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    # awaitTermination returns False on timeout with the query still
    # active — returning then would hand the caller a silently
    # half-written sink (advisor round 3). Stop and raise instead;
    # the checkpoint makes the next run resume exactly-once.
    if not q.awaitTermination(180):
        q.stop()
        raise TimeoutError(
            "availableNow drain did not finish within 180s; "
            "sink is partial — rerun resumes from the checkpoint"
        )
    return q


def run_to_memory_sink(
    stream: DataFrame, name: str, output_mode: str = "append"
):
    """Drive a stream to completion over currently-available input
    (used by tests; production uses a parquet/Kafka sink + checkpoint)."""
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(120):
        q.stop()
        raise TimeoutError(f"memory sink '{name}' did not drain within 120s")
    return q
