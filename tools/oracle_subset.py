#!/usr/bin/env python3
"""Run the DuckDB oracle comparison for a SUBSET of pairs — the fast
per-change verification loop of an optimization round (the full
tools/oracle_sweep.py stays the end-of-round assurance pass).

Usage: python tools/oracle_subset.py SF_DIR name [name ...]
Exit 1 on any mismatch/error.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    from oracle_harness import compare  # tests/oracle_harness.py

    from readability_py_spark.operators import merged_queries
    from readability_py_spark.operators.dedup import release_caches
    from readability_py_spark.session import build_session

    spark = build_session(
        app_name="rps-oracle-subset",
        master="local[8]",
        shuffle_partitions="8",
    )
    spark.sparkContext.setLogLevel("ERROR")
    q, o = merged_queries(include_retired=True)
    ok = bad = 0
    for name in names:
        if name not in o:
            print(f"SKIP {name}: no oracle pair")
            continue
        try:
            res = compare(q[name](spark, sf_dir), o[name], sf_dir)
        except Exception as e:  # noqa: BLE001
            bad += 1
            print(f"ERR  {name}: {e}", flush=True)
            release_caches()
            continue
        release_caches()
        if res.get("cols_match") and res.get("rows_match") and res.get(
            "values_match"
        ):
            ok += 1
            print(f"OK   {name}")
        else:
            bad += 1
            print(f"FAIL {name}: {json.dumps(res)[:400]}", flush=True)
    print(f"subset @ {sf_dir}: {ok} ok / {bad} bad of {len(names)}")
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
