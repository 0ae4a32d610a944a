#!/usr/bin/env python3
"""Rehearse the driver's correctness gate exactly: run every DRIVER
queries() entry (the ≤50-entry dict, not the retired extras) against
its oracle at sf0.01 through the type-tagged harness, and print a
CORRECTNESS_r{N}.json-shaped JSON object.

Round 3 taught that local green at sf0.001 does not guarantee the
driver's record: the driver evaluates at most 50 entries (order
matters) and runs at sf0.01 (recall-sensitive near-dup queries and
bucket caps are SF-dependent). This runs the same set, same SF, same
comparison discipline, before the driver does.

Usage:
    python tools/driver_rehearsal.py            # full rehearsal
    python tools/driver_rehearsal.py name ...   # subset
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    from readability_py_spark.operators import merged_queries
    from readability_py_spark.operators.dedup import release_caches
    from readability_py_spark.session import build_session
    from tests.oracle_harness import compare

    spark = build_session(
        app_name="rps-driver-rehearsal", master="local[8]", shuffle_partitions="8"
    )
    spark.sparkContext.setLogLevel("ERROR")
    # include_retired: a rehearsal's whole point is vetting a query
    # BEFORE it rotates into the driver dict, so LOCAL_ONLY/RETIRED
    # names must be addressable; the no-args default still rehearses
    # exactly the current driver dict
    q_all, o_all = merged_queries(include_retired=True)
    q, o = merged_queries()
    names = sys.argv[1:] or list(q)
    if sys.argv[1:]:
        q, o = q_all, o_all
    out: dict[str, dict] = {}
    n_green = 0
    for name in names:
        if name not in o:
            rows = q[name](spark, SF_DIR).count()
            out[name] = {"rows_match": None, "schema_match": None,
                         "hash_match": None, "spark_rows": rows,
                         "oracle_rows": None, "err": "no_oracle"}
        else:
            try:
                r = compare(q[name](spark, SF_DIR), o[name], SF_DIR)
                out[name] = {
                    "rows_match": r["rows_match"],
                    "schema_match": r["cols_match"],
                    "hash_match": r["values_match"],
                    "spark_rows": r["spark_rows"],
                    "oracle_rows": r["duck_rows"],
                    "err": None if r["values_match"] else str(r["first_diff"])[:200],
                }
                n_green += bool(r["values_match"])
            except Exception as e:  # mirror the driver's err records
                out[name] = {"rows_match": False, "schema_match": False,
                             "hash_match": False, "spark_rows": None,
                             "oracle_rows": None, "err": str(e)[:200]}
        release_caches()
        status = out[name]
        flag = "green" if status["hash_match"] else (status["err"] or "MISMATCH")
        print(f"  {name}: {flag}", file=sys.stderr)
    print(json.dumps(out, indent=2))
    print(
        f"hash-green {n_green} / oracle-paired "
        f"{sum(1 for n in names if n in o)} / total {len(names)}",
        file=sys.stderr,
    )
    spark.stop()


if __name__ == "__main__":
    main()
