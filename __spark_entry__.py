"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in the ``readability_py_spark`` package; this file
is only the wiring.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: synthesize a Common-Crawl-style pages table from the
    sf0.001 documents (deterministic HTML around each text), run the
    Arc90 extraction pipeline inside Arrow batches, and aggregate
    per-lang extraction metrics."""
    from readability_py_spark.plans.extract_job import flagship

    return flagship(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from readability_py_spark.operators import merged_queries

    q, _ = merged_queries()
    return q


def oracle_sql() -> dict[str, str]:
    from readability_py_spark.operators import merged_queries

    _, o = merged_queries()
    return o
