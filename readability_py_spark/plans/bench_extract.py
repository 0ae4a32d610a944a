"""Extraction throughput benchmark (the BASELINE.md headline metric).

Generates a deterministic synthetic pages corpus (seeded; no external
data), runs the full extraction plan (scan → filter → dedup →
repartition → mapInPandas → count), and reports docs/sec + MB/s.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.fixtures import generate_pages_rows


def build_pages_df(spark: SparkSession, n_rows: int, seed: int = 42) -> DataFrame:
    rows = generate_pages_rows(n_rows, seed=seed)
    data = [
        (r["url"], r["warc_ts"], r["html"], r["text"], r["lang"]) for r in rows
    ]
    return spark.createDataFrame(
        data, "url string, warc_ts timestamp, html binary, text string, lang string"
    )


def bench_extraction(spark: SparkSession, sf_dir: str | None = None) -> dict:
    from .extract_job import extraction_plan

    n_docs = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "8000"))
    pages = build_pages_df(spark, n_docs)
    pages = pages.persist()
    total_rows = pages.count()  # materialize input outside the timing
    total_bytes = pages.select(
        F.sum(F.octet_length("html")).alias("b")
    ).collect()[0]["b"]

    # Warm the Python workers: the first pandas-UDF stage pays each
    # worker's pyspark+pandas+pyarrow import (~40 s across 32 cold
    # workers on this box) — a real long-running job amortizes that to
    # zero, so it stays out of the timed window.
    import pandas as pd

    def _noop(it):
        for pdf in it:
            yield pd.DataFrame({"n": [len(pdf)]})

    pages.repartition(int(spark.conf.get("spark.sql.shuffle.partitions"))).mapInPandas(
        _noop, "n long"
    ).count()

    # min-of-N reps (default 2): single-rep numbers on this box are
    # hostage to hypervisor steal spikes (see bench.py note)
    n_reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2"))
    wall = None
    for _ in range(n_reps):
        t0 = time.monotonic()
        extracted = extraction_plan(pages)
        n_out = extracted.count()
        rep = time.monotonic() - t0
        wall = rep if wall is None else min(wall, rep)
    pages.unpersist()
    return {
        "extract_input_rows": total_rows,
        "extract_docs": n_out,
        "extract_wall_sec": round(wall, 3),
        "extract_docs_per_sec": round(n_out / wall, 1),
        "extract_mb_per_sec": round(total_bytes / wall / 1e6, 2),
    }
