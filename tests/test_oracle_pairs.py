"""Every queries() entry with an oracle must match DuckDB exactly —
the local mirror of the driver's CORRECTNESS gate (run at sf0.001 for
speed; the driver runs sf0.01)."""

from __future__ import annotations

import pytest

from .conftest import SF_SMOKE
from .oracle_harness import compare


def _pairs():
    from readability_py_spark.operators import merged_queries

    # include_retired: entries outside the driver's 50-query budget
    # stay locally oracle-verified here
    q, o = merged_queries(include_retired=True)
    return [(name, q[name], o[name]) for name in sorted(o)]


@pytest.mark.parametrize("name,fn,sql", _pairs(), ids=[p[0] for p in _pairs()])
def test_oracle_pair(spark, name, fn, sql):
    df = fn(spark, SF_SMOKE)
    result = compare(df, sql, SF_SMOKE)
    assert result["cols_match"], f"{name}: columns differ {result}"
    assert result["rows_match"], (
        f"{name}: rowcount {result['spark_rows']} vs {result['duck_rows']}"
    )
    assert result["values_match"], f"{name}: values differ: {result['first_diff']}"


def test_every_query_has_callable():
    from readability_py_spark.operators import merged_queries

    q, o = merged_queries()
    assert set(o) <= set(q)
    assert len(q) >= 25


def test_driver_query_budget():
    """The driver evaluates AT MOST 50 queries() entries (round 3: 52
    defined, exactly the first 50 scored, the rest silently absent).
    Keep the driver dict within budget, with the flagship extraction
    queries FIRST so they can never fall off the scoreboard again."""
    from readability_py_spark.operators import (
        DRIVER_QUERY_BUDGET,
        RETIRED,
        merged_queries,
    )

    q, o = merged_queries()
    assert len(q) <= DRIVER_QUERY_BUDGET, (
        f"{len(q)} driver queries > budget {DRIVER_QUERY_BUDGET}: "
        f"retire a strict sub-plan (see RETIRED in operators/__init__)"
    )
    names = list(q)
    assert names[0] == "extract_articles"
    assert names[1] == "extract_footnotes"
    assert not (RETIRED & set(q))
    # retired entries must still exist and stay locally oracle-verified
    # (minhash_signatures_fast was a rows-only driver entry — no DuckDB
    # xxhash64 — so its local verification is the pytest equivalence
    # pin vs the md5 family, not an oracle pair)
    qa, oa = merged_queries(include_retired=True)
    assert RETIRED <= set(qa)
    assert RETIRED - {"minhash_signatures_fast"} <= set(oa)
