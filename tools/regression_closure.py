#!/usr/bin/env python3
"""Quiet-window-waiting wrapper for the steal-gated per-query reps
(VERDICT r5 "What's wrong" #1 closure): keeps probing /proc/stat until
the hypervisor neighbor is quiet, then runs tools/query_timing.py /
tools/extract_timing.py passes for whatever targets still lack a
clean measurement, accumulating results into regression_closure.json.

The r3-established discipline: a ≤1%-steal rep is the only timing
evidence this box admits; windows can take hours to appear, so this
runs unattended with a deadline.

Usage:
    REGRESSION_BUDGET_SEC=7200 python tools/regression_closure.py \
        dedup_latest_event doc_fingerprint top_orders_per_cust \
        minhash_lsh_dups __extract__
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "regression_closure.json")


def steal_sample(sec: float = 20.0) -> float:
    def stat():
        p = open("/proc/stat").readline().split()
        return list(map(int, p[1:9]))

    a = stat()
    time.sleep(sec)
    b = stat()
    d = [y - x for x, y in zip(a, b)]
    return 100.0 * d[7] / (sum(d) or 1)


def main() -> None:
    targets = sys.argv[1:]
    if not targets:
        print("usage: regression_closure.py <query|__extract__> ...", file=sys.stderr)
        sys.exit(2)
    deadline = time.monotonic() + float(
        os.environ.get("REGRESSION_BUDGET_SEC", "7200")
    )
    book: dict = {}
    if os.path.exists(OUT):
        book = json.load(open(OUT))
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.1",
        SPARK_GRAFT_CPUS="32",
        SPARK_GRAFT_REPS="4",
        SPARK_GRAFT_STEAL_GATE="1.0",
    )
    while time.monotonic() < deadline:
        todo = [
            t
            for t in targets
            if not (book.get(t) or {}).get(
                "clean_min" if t != "__extract__" else "clean_docs_per_sec"
            )
        ]
        if not todo:
            break
        if os.getloadavg()[0] > 1.5:
            time.sleep(60)
            continue
        s = steal_sample(20)
        if s >= 0.8:
            print(f"window dirty ({s:.1f}% steal), waiting", file=sys.stderr)
            time.sleep(90)
            continue
        print(f"window clean ({s:.2f}% steal): running {todo}", file=sys.stderr)
        if todo[0] == "__extract__":
            r = subprocess.run(
                [sys.executable, os.path.join(REPO, "tools/extract_timing.py")],
                env=env, capture_output=True, text=True, timeout=900,
            )
            lines = [l for l in r.stdout.splitlines() if l.startswith("{")]
            if lines:
                book["__extract__"] = json.loads(lines[-1])
        else:
            # one query per window probe: a long multi-query pass can
            # outlive the quiet window that admitted it
            r = subprocess.run(
                [sys.executable, os.path.join(REPO, "tools/query_timing.py"),
                 todo[0]],
                env=env, capture_output=True, text=True, timeout=900,
            )
            for line in r.stdout.splitlines():
                if line.startswith("{"):
                    rec = json.loads(line)
                    prev = book.get(rec["query"]) or {}
                    if rec.get("clean_min") is not None and (
                        prev.get("clean_min") is None
                        or rec["clean_min"] < prev["clean_min"]
                    ):
                        book[rec["query"]] = rec
                    elif rec["query"] not in book:
                        book[rec["query"]] = rec
        with open(OUT, "w") as fh:
            json.dump(book, fh, indent=1)
    print(json.dumps(book, indent=1))


if __name__ == "__main__":
    main()
