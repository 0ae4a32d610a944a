"""Every queries() entry with an oracle must match DuckDB exactly —
the local mirror of the driver's CORRECTNESS gate (run at sf0.001 for
speed; the driver runs sf0.01)."""

from __future__ import annotations

import pytest

from .conftest import SF_SMOKE
from .oracle_harness import compare


def _pairs():
    from readability_py_spark.operators import merged_queries

    q, o = merged_queries()
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
