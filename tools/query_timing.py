#!/usr/bin/env python3
"""Steal-gated single-query timing — the per-query analogue of
tools/paired_scaling.py's discipline, for plan-change A/Bs.

This box carries a noisy neighbor (hypervisor steal up to 60%), so
un-gated sub-2-second wall clocks are meaningless: round 3 recorded a
"+33% regression" on revenue_by_nation that two steal-clean reps later
showed to be faster than ever. This tool runs N reps of one (or more)
queries() entries, samples /proc/stat steal around each rep, and
reports only reps whose steal stayed under the gate.

Usage:
    python tools/query_timing.py revenue_by_nation [more names...]
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
        SPARK_GRAFT_REPS=8 SPARK_GRAFT_STEAL_GATE=1.0 \
        python tools/query_timing.py pipeline_gate

Prints one JSON line per query:
    {"query": ..., "clean_min": ..., "clean_reps": N, "reps": [[wall, steal], ...]}
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
    return list(map(int, parts[1:9]))  # user nice system idle iowait irq softirq steal


def main() -> None:
    names = sys.argv[1:]
    if not names:
        print("usage: query_timing.py <query_name> [...]", file=sys.stderr)
        sys.exit(2)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    n_reps = int(os.environ.get("SPARK_GRAFT_REPS", "6"))
    gate = float(os.environ.get("SPARK_GRAFT_STEAL_GATE", "1.0"))

    from readability_py_spark.operators import merged_queries
    from readability_py_spark.operators.dedup import release_caches
    from readability_py_spark.session import build_session

    spark = build_session(
        app_name="rps-query-timing",
        master=f"local[{cpus}]",
        shuffle_partitions=str(max(int(cpus), 8)),
    )
    spark.sparkContext.setLogLevel("ERROR")
    q, _ = merged_queries(include_retired=True)
    unknown = [n for n in names if n not in q]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        sys.exit(2)

    # warm codegen/scan/python-worker machinery outside the timed reps
    spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).limit(
        100
    ).write.format("noop").mode("overwrite").save()

    warmup = os.environ.get("SPARK_GRAFT_QT_WARMUP", "1") == "1"
    for name in names:
        fn = q[name]
        if warmup:
            # one un-timed rep of the query itself: sub-second
            # expression-heavy queries are dominated by codegen + JIT
            # on their first execution in a fresh session, which the
            # bench harness (where every query runs after dozens of
            # others) never pays — without this, clean_min measures
            # session coldness, not the plan (observed: doc_fingerprint
            # 0.39s cold-session vs 0.26s in-bench)
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            release_caches()
        reps: list[tuple[float, float]] = []
        for _ in range(n_reps):
            before = cpu_stat()
            t0 = time.monotonic()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            wall = time.monotonic() - t0
            after = cpu_stat()
            d = [b - a for a, b in zip(before, after)]
            total = sum(d) or 1
            reps.append((round(wall, 3), round(100.0 * d[7] / total, 2)))
            release_caches()
        clean = sorted(w for w, s in reps if s < gate)
        print(
            json.dumps(
                {
                    "query": name,
                    "sf": sf_dir,
                    "cpus": int(cpus),
                    "steal_gate_pct": gate,
                    "clean_reps": len(clean),
                    "clean_min": clean[0] if clean else None,
                    "reps": reps,
                }
            )
        )
    spark.stop()


if __name__ == "__main__":
    main()
