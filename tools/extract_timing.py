#!/usr/bin/env python3
"""Steal-gated extraction-throughput reps — the extract_docs_per_sec
analogue of tools/query_timing.py, for closing bench-drift scares on
the extras row (VERDICT r5 "What's wrong" #1).

Runs N reps of the exact plan bench.py's extras row times
(plans/bench_extract.extraction_plan over the synthetic pages corpus),
samples /proc/stat steal around each rep, and reports the clean-best
docs/sec.

Usage:
    SPARK_GRAFT_CPUS=32 SPARK_GRAFT_REPS=6 SPARK_GRAFT_STEAL_GATE=1.0 \
        SPARK_GRAFT_BENCH_DOCS=8000 python tools/extract_timing.py
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def cpu_stat() -> list[int]:
    parts = open("/proc/stat").readline().split()
    return list(map(int, parts[1:9]))


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    n_reps = int(os.environ.get("SPARK_GRAFT_REPS", "6"))
    gate = float(os.environ.get("SPARK_GRAFT_STEAL_GATE", "1.0"))
    n_docs = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "8000"))

    from readability_py_spark.plans.bench_extract import build_pages_df
    from readability_py_spark.plans.extract_job import extraction_plan
    from readability_py_spark.session import build_session

    spark = build_session(
        app_name="rps-extract-timing",
        master=f"local[{cpus}]",
        shuffle_partitions=str(max(int(cpus), 8)),
    )
    spark.sparkContext.setLogLevel("ERROR")
    pages = build_pages_df(spark, n_docs).persist()
    pages.count()

    # warm Python workers outside the timed reps (see bench_extract)
    import pandas as pd

    def _noop(it):
        for pdf in it:
            yield pd.DataFrame({"n": [len(pdf)]})

    pages.repartition(int(cpus)).mapInPandas(_noop, "n long").count()

    reps: list[tuple[float, float, int]] = []
    for _ in range(n_reps):
        before = cpu_stat()
        t0 = time.monotonic()
        n_out = extraction_plan(pages).count()
        wall = time.monotonic() - t0
        after = cpu_stat()
        d = [b - a for a, b in zip(before, after)]
        total = sum(d) or 1
        reps.append((round(wall, 3), round(100.0 * d[7] / total, 2), n_out))
    clean = sorted((w, s, n) for w, s, n in reps if s < gate)
    best = clean[0] if clean else None
    print(
        json.dumps(
            {
                "metric": "extract_docs_per_sec_steal_gated",
                "docs": n_docs,
                "cpus": int(cpus),
                "steal_gate_pct": gate,
                "clean_reps": len(clean),
                "clean_min_wall": best[0] if best else None,
                "clean_docs_per_sec": (
                    round(best[2] / best[0], 1) if best else None
                ),
                "reps": [[w, s] for w, s, _ in reps],
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
