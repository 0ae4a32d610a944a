"""Round-4 operator tests: url normalization edge cases (advisor r3),
map-only repetition stats, JPEG header decode, Gopher line rules,
pipeline composition, and the xxhash64 MinHash fast path."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from .conftest import SF_SMOKE

URL_CASES = [
    # adjacent tracking params collapse in one pass (advisor r3 medium)
    (
        "http://EX.com:80/Path?utm_source=a&utm_medium=b&id=3#f",
        "http://ex.com/Path?id=3",
    ),
    # a longer adjacent run, mixed families
    (
        "http://h.com/p?ref=a&gclid=b&fbclid=c&q=1&utm_z=9",
        "http://h.com/p?q=1",
    ),
    # trailing run of tracking params
    ("http://h.com/p?id=1&utm_x=2&ref=3", "http://h.com/p?id=1"),
    # all-tracking query vanishes entirely
    ("http://h.com/?utm_a=1&utm_b=2", "http://h.com/"),
    # default ports are scheme-conditioned (advisor r3 low)
    ("http://h.com:80/x", "http://h.com/x"),
    ("https://h.com:443/x", "https://h.com/x"),
    ("https://h.com:80/x", "https://h.com:80/x"),
    ("http://h.com:443/x", "http://h.com:443/x"),
    # authority lowercased, path case preserved, fragment dropped
    ("HTTPS://WWW.Ex.COM/AbC?id=2#frag", "https://www.ex.com/AbC?id=2"),
]


def test_normalize_url_edge_cases_spark(spark):
    from readability_py_spark.operators.urls import normalize_url

    df = spark.createDataFrame([(u,) for u, _ in URL_CASES], ["u"])
    got = [r[0] for r in df.select(normalize_url(F.col("u"))).collect()]
    assert got == [want for _, want in URL_CASES]


def test_normalize_url_edge_cases_duckdb_twin():
    """The DuckDB dialect must normalize the exact same strings to the
    exact same outputs — otherwise the oracle verifies bugs instead of
    catching them (the advisor-r3 failure mode)."""
    from readability_py_spark.operators.urls import _duck_normalize

    con = duckdb.connect()
    for raw, want in URL_CASES:
        lit = "'" + raw.replace("'", "''") + "'"
        got = con.execute(f"SELECT {_duck_normalize(lit)}").fetchone()[0]
        assert got == want, f"{raw!r}: duckdb gave {got!r}, want {want!r}"
    con.close()
