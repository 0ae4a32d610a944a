#!/usr/bin/env python3
"""Retry-cascade cost profile (round-3, VERDICT r2 item 7).

The extraction metrics show ~1/3 of the bench corpus re-parses up to
4x (the reference's retry cascade mutates settings and starts over,
readability.py:762-777). At cluster scale that retry tail IS the
straggler story, so this tool produces the evidence:

1. Single-process latency histogram by retry count: sample the seeded
   corpus, time extract_document per doc, bucket by metrics.retries.
2. Spark speculation A/B on the skewed corpus (Zipf-hot host + 1-2 MB
   outliers): same job, spark.speculation on vs off.

Usage:
  python tools/retry_profile.py histogram [n_docs]
  python tools/retry_profile.py spec-ab <pages_dir>

Each subcommand prints one JSON line; paste results into BENCH.md.
NOTE: run only on a quiet machine (see CLAUDE.md noisy-neighbor rule)
and never concurrently with a scaling measurement.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def histogram(n_docs: int = 4000) -> dict:
    from readability_py_spark.core.arc90 import extract_document
    from readability_py_spark.sources.fixtures import generate_pages_rows

    rows = generate_pages_rows(n_docs, seed=42)
    buckets: dict[int, list[float]] = {}
    for r in rows:
        t0 = time.perf_counter()
        res = extract_document(r["html"], url=r["url"])
        dt = (time.perf_counter() - t0) * 1000.0
        buckets.setdefault(res["metrics"]["retries"], []).append(dt)
    total_ms = sum(sum(v) for v in buckets.values())
    out = {}
    for retries in sorted(buckets):
        lat = sorted(buckets[retries])
        n = len(lat)
        out[str(retries)] = {
            "docs": n,
            "doc_share_pct": round(100.0 * n / len(rows), 1),
            "avg_ms": round(sum(lat) / n, 2),
            "p95_ms": round(lat[int(0.95 * (n - 1))], 2),
            "max_ms": round(lat[-1], 2),
            "time_share_pct": round(100.0 * sum(lat) / total_ms, 1),
        }
    return {"metric": "retry_latency_histogram", "n_docs": len(rows), "by_retries": out}


def spec_ab(pages_dir: str) -> dict:
    """Same extraction job with speculation off vs on. In local mode a
    speculative copy runs in the SAME shared-memory JVM, so this
    measures the overhead side of the trade; the straggler-rescue
    benefit needs distinct executors (documented in BENCH.md)."""
    zip_path = os.path.join(REPO, ".data", "engine.zip")
    results = {}
    for label, extra in (
        ("spec_off", []),
        (
            "spec_on",
            [
                "--conf", "spark.speculation=true",
                "--conf", "spark.speculation.multiplier=2",
                "--conf", "spark.speculation.quantile=0.75",
            ],
        ),
    ):
        cmd = [
            "spark-submit", "--master", "local[32]",
            "--driver-memory", "16g", "--py-files", zip_path,
            *extra,
            os.path.join(REPO, "tools", "spark_job.py"),
            "--input", pages_dir, "--label", label,
        ]
        proc = subprocess.run(cmd, capture_output=True, text=True, timeout=1800)
        for line in proc.stdout.splitlines():
            line = line.strip()
            if line.startswith("{"):
                r = json.loads(line)
                results[label] = {
                    "wall_sec": r["wall_sec"],
                    "docs_per_sec": r["docs_per_sec"],
                    "max_partition_docs": r.get("max_partition_docs"),
                    "steal_pct": r.get("steal_pct"),
                }
                break
        else:
            raise RuntimeError(f"no JSON from {label}: {proc.stderr[-1000:]}")
    off, on = results["spec_off"], results["spec_on"]
    return {
        "metric": "speculation_ab",
        "input": pages_dir,
        **results,
        "wall_delta_pct": round(
            100.0 * (on["wall_sec"] - off["wall_sec"]) / off["wall_sec"], 1
        ),
    }


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "histogram"
    if mode == "histogram":
        n = int(sys.argv[2]) if len(sys.argv) > 2 else 4000
        print(json.dumps(histogram(n)))
    elif mode == "spec-ab":
        print(json.dumps(spec_ab(sys.argv[2])))
    else:
        raise SystemExit(f"unknown mode {mode}")


if __name__ == "__main__":
    main()
