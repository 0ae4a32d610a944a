"""Corpus-level operators: relational surface + training-data pipeline ops.

Each module exports ``QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]]``
and ``ORACLES: dict[str, str]`` (DuckDB ANSI SQL twins; omitted for
non-SQL-expressible ops, which the driver checks rows-only).
"""

from __future__ import annotations


def merged_queries():
    from . import dedup, multimodal, relational, similarity, textstats, urls
    from ..plans import extract_job

    q: dict = {}
    o: dict = {}
    for mod in (relational, dedup, similarity, textstats, multimodal, urls):
        q.update(mod.QUERIES)
        o.update(mod.ORACLES)
    q["extract_articles"] = extract_job.extract_articles_query
    o["extract_articles"] = extract_job.ORACLE_EXTRACT_ARTICLES
    q["extract_footnotes"] = extract_job.extract_footnotes_query
    o["extract_footnotes"] = extract_job.ORACLE_EXTRACT_FOOTNOTES
    return q, o
