"""Local mirror of the driver's Spark-vs-DuckDB comparison.

Runs a queries() DataFrame and its oracle SQL on the same parquet
tables, then compares row count, column names, and order-insensitive
values (every cell canonicalized to a string; floats via repr of the
rounded double; timestamps via isoformat).
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
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(round(v, 9))
    if isinstance(v, _dec.Decimal):
        return repr(round(float(v), 9))
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    return str(v)


def canon_rows(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_canon_cell(r[i]) for i in order) for r in rows)


def compare(spark_df, oracle_sql: str, sf_dir: str) -> dict:
    scols = [f.name for f in spark_df.schema.fields]
    srows = [tuple(r) for r in spark_df.collect()]
    con = duck_con(sf_dir)
    res = con.execute(oracle_sql)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
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
