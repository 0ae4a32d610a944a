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


def _ship_package(spark: SparkSession) -> None:
    """Make the engine importable inside Spark Python workers even when
    the driver process runs from a different cwd: driver-side sys.path
    edits don't propagate to workers, so ship a zip via addPyFile
    (idempotent per session)."""
    sc = spark.sparkContext
    if getattr(sc, "_rps_package_shipped", False):
        return
    import zipfile

    zip_path = os.path.join(_REPO, ".data", "engine_entry.zip")
    pkg = os.path.join(_REPO, "readability_py_spark")
    sources = [
        os.path.join(root, f)
        for root, _dirs, files in os.walk(pkg)
        for f in files
        if f.endswith(".py")
    ]
    newest_src = max(os.path.getmtime(p) for p in sources)
    if not os.path.exists(zip_path) or os.path.getmtime(zip_path) < newest_src:
        os.makedirs(os.path.dirname(zip_path), exist_ok=True)
        with zipfile.ZipFile(zip_path, "w") as zf:
            for full in sources:
                zf.write(full, os.path.relpath(full, _REPO))
    try:
        sc.addPyFile(zip_path)
    except Exception:
        pass  # already added or unsupported; cwd-based import may still work
    sc._rps_package_shipped = True


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: synthesize a Common-Crawl-style pages table from the
    sf0.001 documents (deterministic HTML around each text), run the
    Arc90 extraction pipeline inside Arrow batches, and aggregate
    per-lang extraction metrics."""
    _ship_package(spark)
    from readability_py_spark.plans.extract_job import flagship

    return flagship(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from readability_py_spark.operators import merged_queries

    q, _ = merged_queries()

    def _wrap(fn):
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            _ship_package(spark)
            return fn(spark, sf_dir)

        wrapped.__name__ = getattr(fn, "__name__", "query")
        return wrapped

    return {name: _wrap(fn) for name, fn in q.items()}


def oracle_sql() -> dict[str, str]:
    from readability_py_spark.operators import merged_queries

    _, o = merged_queries()
    return o
