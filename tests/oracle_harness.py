"""Local mirror of the driver's Spark-vs-DuckDB comparison.

Runs a queries() DataFrame and its oracle SQL on the same parquet
tables, then compares row count, column names, and order-insensitive
values.

Driver-faithfulness (round-2 fix): the driver's value hash
distinguishes numeric *types*, not just printed values — DuckDB
``SUM(integer)`` comes back through Arrow as ``decimal128(38,0)``
while Spark returns int64, and the driver flagged six queries round 1
that the old stringifying harness called equal.  So now:

- the DuckDB result is fetched via ``fetch_arrow_table()`` (the same
  typed path the driver reads), so HUGEINT sums surface as
  ``decimal.Decimal`` rather than being silently collapsed to ``int``
  by ``fetchall()``;
- every cell is canonicalized with a *type tag* (``i:`` int, ``f:``
  float, ``d:`` decimal, ``s:`` str, ...), so an int64 150 and a
  decimal128 150 no longer compare equal.
"""

from __future__ import annotations

import datetime as _dt
import decimal as _dec
import math
import os

import duckdb

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )
    return con


def _canon_cell(v) -> str:
    if v is None:
        return "<null>"
    if isinstance(v, bool):  # before int: bool is an int subclass
        return f"b:{v}"
    if isinstance(v, float):
        if math.isnan(v):
            return "f:nan"
        return f"f:{repr(round(v, 9))}"
    if isinstance(v, _dec.Decimal):
        # Decimal stays Decimal-tagged: the driver distinguishes a
        # decimal128 sum from an int64 sum even when values are equal.
        return f"d:{v}"
    if isinstance(v, int):
        return f"i:{v}"
    if isinstance(v, _dt.datetime):
        return "t:" + v.replace(tzinfo=None).isoformat()
    if isinstance(v, _dt.date):
        return "D:" + v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return "x:" + v.hex()
    if isinstance(v, list):
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    return f"s:{v}"


def canon_rows(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_canon_cell(r[i]) for i in order) for r in rows)


def _duck_typed_rows(con, oracle_sql: str) -> tuple[list[str], list[tuple]]:
    """Fetch through Arrow so DuckDB's result types survive (HUGEINT →
    decimal128 → decimal.Decimal), matching what the driver hashes."""
    tbl = con.execute(oracle_sql).fetch_arrow_table()
    cols = tbl.schema.names
    pylists = [col.to_pylist() for col in tbl.columns]
    rows = list(zip(*pylists)) if cols else []
    if not pylists:
        rows = []
    return list(cols), rows


def compare(spark_df, oracle_sql: str, sf_dir: str) -> dict:
    scols = [f.name for f in spark_df.schema.fields]
    srows = [tuple(r) for r in spark_df.collect()]
    con = duck_con(sf_dir)
    dcols, drows = _duck_typed_rows(con, oracle_sql)
    con.close()

    out = {
        "spark_rows": len(srows),
        "duck_rows": len(drows),
        "spark_cols": sorted(scols),
        "duck_cols": sorted(dcols),
        "cols_match": sorted(scols) == sorted(dcols),
        "rows_match": len(srows) == len(drows),
        "values_match": False,
        "first_diff": None,
    }
    if not (out["cols_match"] and out["rows_match"]):
        return out
    cs = canon_rows(scols, srows)
    cd = canon_rows(dcols, drows)
    out["values_match"] = cs == cd
    if not out["values_match"]:
        for a, b in zip(cs, cd):
            if a != b:
                out["first_diff"] = {"spark": a, "duck": b}
                break
        else:
            out["first_diff"] = {"spark": "<len mismatch>", "duck": ""}
    return out
