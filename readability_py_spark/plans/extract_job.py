"""Flagship extraction job plan (SURVEY.md §3.4).

Logical plan:
  scan(pages) → filter(lang/nonempty) → left-anti join(done-manifest,
  broadcast) → dedup-latest(url, warc_ts) over a SINGLE hash(url)
  exchange (window or max_by-agg strategy, see extraction_plan) →
  mapInPandas(extract_batch, Arrow) → sink(parquet) + done-manifest
  append + per-partition metrics.

Scale design notes (100 TB / 1000 executors):
- the only Python crossing is the single mapInPandas stage; everything
  else is JVM-side and Catalyst-optimized (filter + column pruning push
  into the scan).
- repartition on pmod(hash(url), P) gives uniform work distribution
  regardless of host skew (a Zipf-hot host spreads across all P
  partitions because the key is the url, not the host). P defaults to
  spark.sql.shuffle.partitions; at cluster scale submit with P ≈ 2-3×
  total cores.
- the done-manifest is a url list, small relative to the corpus →
  broadcast anti-join; at 10^12 rows it becomes a bucketed sort-merge
  anti-join (AQE picks this automatically once it exceeds the
  broadcast threshold).
- resumability is data-level: output + manifest are written per run;
  a rerun anti-joins the manifest and only extracts the remainder.
"""

from __future__ import annotations

import os
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..session import load_table

EXTRACT_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("article_html", T.StringType()),
        T.StructField("article_text", T.StringType()),
        T.StructField(
            "footnotes",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("href", T.StringType()),
                        T.StructField("text", T.StringType()),
                    ]
                )
            ),
        ),
        T.StructField(
            "metrics",
            T.StructType(
                [
                    T.StructField("candidate_count", T.IntegerType()),
                    T.StructField("top_score", T.DoubleType()),
                    T.StructField("link_density", T.DoubleType()),
                    T.StructField("retries", T.IntegerType()),
                    T.StructField("parse_ok", T.BooleanType()),
                ]
            ),
        ),
        T.StructField("part_id", T.IntegerType()),
    ]
)


def extract_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batch extraction UDF: one fresh Arc90 pipeline per document
    (the reference's retry cascade mutates its settings, so state can
    never be reused across documents — readability.py:762-777)."""
    yield from _extract_batches(batches, {})


def make_extract_batch(settings: dict):
    """Extraction UDF with job-level settings (footnote_links etc);
    the settings dict is captured by cloudpickle and applied per doc."""

    def _fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        yield from _extract_batches(batches, settings)

    return _fn


def _extract_batches(
    batches: Iterator[pd.DataFrame], settings: dict
) -> Iterator[pd.DataFrame]:
    from pyspark import TaskContext

    from ..core.arc90 import extract_document

    tc = TaskContext.get()
    part_id = tc.partitionId() if tc is not None else -1

    for pdf in batches:
        out = {k.name: [] for k in EXTRACT_SCHEMA.fields}
        for url, html in zip(pdf["url"], pdf["html"]):
            raw = bytes(html) if html is not None else b""
            try:
                res = extract_document(raw, url=url, **settings)
                out["url"].append(url)
                out["title"].append(res["title"])
                out["article_html"].append(res["article_html"])
                out["article_text"].append(res["article_text"])
                out["footnotes"].append(
                    [{"href": h, "text": t} for h, t in res["footnotes"]]
                )
                m = res["metrics"]
                out["metrics"].append(
                    {
                        "candidate_count": int(m["candidate_count"]),
                        "top_score": float(m["top_score"]),
                        "link_density": float(m["link_density"]),
                        "retries": int(m["retries"]),
                        "parse_ok": True,
                    }
                )
            except Exception:
                out["url"].append(url)
                out["title"].append(None)
                out["article_html"].append(None)
                out["article_text"].append(None)
                out["footnotes"].append([])
                out["metrics"].append(
                    {
                        "candidate_count": 0,
                        "top_score": 0.0,
                        "link_density": 0.0,
                        "retries": 0,
                        "parse_ok": False,
                    }
                )
            out["part_id"].append(part_id)
        yield pd.DataFrame(out)


def extraction_plan(
    pages: DataFrame,
    done_urls: DataFrame | None = None,
    num_partitions: int | None = None,
    settings: dict | None = None,
    dedup: str = "window",
    assume_clustered: bool = False,
) -> DataFrame:
    """Build the full logical plan over a pages DataFrame
    (url, warc_ts, html, text, lang).

    ``assume_clustered=True`` declares the input already hash-clustered
    on url (an Iceberg/parquet table bucketed by url at ingest — the
    production layout). The plan then skips its repartition entirely:
    the dedup window rides the bucketed scan's HashPartitioning and
    the WHOLE extraction job runs with ZERO exchanges (verified by
    tests/test_operators_r2.py::test_bucketed_extraction_zero_exchange).
    At 10^12 rows this converts the one full-payload shuffle into a
    one-time ingest cost amortized over every downstream extraction.

    ``dedup`` picks the dedup-latest strategy — both are a SINGLE
    full-payload exchange (zero when assume_clustered); they differ in
    where duplicate payloads die:

    - ``"window"`` (default): repartition(n, url) [REPARTITION_BY_NUM —
      exempt from AQE coalescing, so the CPU-bound UDF stage keeps n
      perfectly even tasks] → partition-local row_number window (the
      hash partitioning satisfies the window's distribution → no
      second exchange). Duplicates cross the wire. Best when dup rate
      is low — measured fastest at both 8 and 32 cores on the bench
      corpus (0% dups): the agg variant cost +23%@8 / +80%@32 there,
      the latter mostly from AQE coalescing the agg exchange unevenly
      (808-1709 docs/task → straggler tail in the Python stage).
    - ``"agg"``: groupBy(url).agg(max_by(html, struct(warc_ts, h))) —
      partial_max_by runs MAP-SIDE, so at Common-Crawl dup rates
      (30-60%) most duplicate payloads never pay shuffle bytes. The
      exchange width follows spark.sql.shuffle.partitions — set it at
      job submission (``num_partitions`` is NOT applied here: a
      repartition before the groupBy would defeat the map-side
      combine, and mutating the session conf from inside a plan
      builder leaks into unrelated queries — advisor r2). Pair it
      with spark.sql.adaptive.coalescePartitions.enabled=false to
      keep the UDF stage evenly parallel.

    Both tie-break equal warc_ts on xxhash64(html) (deterministic at
    any partitioning; xxhash64, not md5 — ~10x cheaper JVM-side).
    Never hand-roll pmod(hash(url), n) partitioning: repartition
    hashes the expression AGAIN and the 0..n-1 bucket ids collide —
    observed 18 skewed tasks instead of 32."""
    spark = pages.sparkSession
    p = pages.filter(
        (F.col("lang") != "") & F.col("html").isNotNull()
        & (F.octet_length("html") > 0)
    ).select("url", "warc_ts", "html")
    if done_urls is not None:
        # broadcast anti-join BEFORE the exchange: already-done urls
        # never pay shuffle bytes
        p = p.join(F.broadcast(done_urls.select("url")), "url", "left_anti")
    n = num_partitions or (4 * spark.sparkContext.defaultParallelism)
    if dedup == "agg":
        p = p.groupBy("url").agg(
            F.expr("max_by(html, struct(warc_ts, xxhash64(html)))").alias(
                "html"
            )
        )
    else:
        from pyspark.sql import Window

        if not assume_clustered:
            p = p.repartition(n, F.col("url"))
        p = (
            p.withColumn(
                "_rn",
                F.row_number().over(
                    Window.partitionBy("url").orderBy(
                        F.desc("warc_ts"), F.desc(F.xxhash64(F.col("html")))
                    )
                ),
            )
            .filter(F.col("_rn") == 1)
            # column pruning: the UDF only ever sees (url, html)
            .select("url", "html")
        )
    fn = make_extract_batch(settings) if settings else extract_batch
    return p.mapInPandas(fn, EXTRACT_SCHEMA)


def run_extract_job(
    spark: SparkSession,
    pages: DataFrame,
    out_dir: str,
    num_partitions: int | None = None,
) -> dict:
    """Resumable run: anti-join the done manifest, extract, append a
    snapshot (with lineage) + manifest, return per-run metrics.

    A killed run resumes per-partition: urls whose output committed are
    in the manifest and are anti-joined away; the remainder re-extracts
    (idempotent — extraction is deterministic per url)."""
    from ..sources.catalog import LocalTableCatalog

    catalog = LocalTableCatalog(out_dir)
    done = None
    if catalog.exists("done_manifest"):
        done = catalog.read(spark, "done_manifest")
    extracted = extraction_plan(pages, done_urls=done, num_partitions=num_partitions)
    snap = catalog.append(
        extracted,
        "extracted",
        lineage={
            "job": "extract",
            "resumed": done is not None,
            "num_partitions": num_partitions,
        },
    )
    # THIS run's rows only (incremental snapshot read, never a full
    # table scan — at 10^12 rows the full reread round 1 did here is
    # an O(table) cost per checkpoint commit). The urls are new by
    # construction: extraction_plan already anti-joined the manifest.
    this_run = catalog.read_snapshot(spark, "extracted", snap["snapshot_id"])
    new_done = this_run.select("url").distinct()
    catalog.append(new_done, "done_manifest", lineage={"for_snapshot": snap["snapshot_id"]})
    stats = (
        this_run.groupBy("part_id")
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.avg("metrics.top_score").alias("avg_top_score"),
            F.avg("metrics.link_density").alias("avg_link_density"),
            F.sum("metrics.retries").alias("retries"),
            F.sum(F.when(~F.col("metrics.parse_ok"), 1).otherwise(0)).alias(
                "parse_errors"
            ),
        )
        .collect()
    )
    return {
        "partitions": len(stats),
        "docs": sum(r["docs"] for r in stats),
        "parse_errors": sum(r["parse_errors"] for r in stats),
        "snapshot_id": snap["snapshot_id"],
        "per_partition": [r.asDict() for r in stats],
    }


# ---------------------------------------------------------------------------
# Flagship over driver testdata: wrap documents.text in a deterministic
# page template so the full Arrow-UDF extraction path runs on sf tables.
# ---------------------------------------------------------------------------

# Constant comma-rich filler: guarantees the content div scores well and
# survives every conditional-clean rule, so extraction is exactly
# (filler + ' ' + normalized doc text) — which gives the mapInPandas
# path a closed-form DuckDB oracle.
FILLER = (
    "This synthetic page exists so that the extraction engine, with its "
    "scoring rules, comma counts, and link density checks, always picks "
    "this content division, keeps both paragraphs, and emits a stable, "
    "deterministic article body for verification, auditing, and "
    "benchmarking purposes across every engine and scale factor."
)


def pages_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    title = F.concat(F.lit("Doc "), F.col("doc_id").cast("string"),
                     F.lit(" from "), F.col("source"))
    html_str = F.concat(
        F.lit("<html><head><title>"),
        title,
        F.lit("</title></head><body>"),
        F.lit('<div id="nav"><a href="/">Home</a> <a href="/x.html">More</a></div>'),
        F.lit('<div class="article-content"><p>'),
        F.lit(FILLER),
        F.lit("</p><p>"),
        F.col("text"),
        F.lit("</p></div>"),
        F.lit('<div id="footer"><p>Copyright 2026.</p></div>'),
        F.lit("</body></html>"),
    )
    return docs.select(
        F.concat(
            F.lit("http://"),
            F.col("source"),
            F.lit(".example.com/doc-"),
            F.col("doc_id").cast("string"),
            F.lit(".html"),
        ).alias("url"),
        F.lit("2026-01-01 00:00:00").cast("timestamp").alias("warc_ts"),
        F.encode(html_str, "utf-8").alias("html"),
        F.col("text"),
        F.when(F.col("lang").isNull(), "en").otherwise(F.col("lang")).alias("lang"),
        F.col("doc_id"),
    )


def extract_articles_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """queries() entry: full mapInPandas extraction over template pages;
    oracle-checkable because the template makes extraction closed-form."""
    pages = pages_from_documents(spark, sf_dir)
    extracted = extraction_plan(pages)
    return extracted.select(
        "url",
        "title",
        "article_text",
        F.col("metrics.parse_ok").alias("parse_ok"),
    )


ORACLE_EXTRACT_ARTICLES = rf"""
SELECT concat('http://', source, '.example.com/doc-', CAST(doc_id AS VARCHAR), '.html') AS url,
       concat('Doc ', CAST(doc_id AS VARCHAR), ' from ', source) AS title,
       trim(regexp_replace(concat('{FILLER}', ' ', trim(text)), '\s+', ' ', 'g')) AS article_text,
       TRUE AS parse_ok
FROM documents
"""


def linked_pages_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Template pages with one absolute reference link per document —
    used to drive the footnote-generation path through the UDF."""
    docs = load_table(spark, sf_dir, "documents")
    ref_url = F.concat(
        F.lit("http://ref.example.org/d"),
        F.col("doc_id").cast("string"),
        F.lit(".html"),
    )
    html_str = F.concat(
        F.lit("<html><head><title>Linked "),
        F.col("doc_id").cast("string"),
        F.lit("</title></head><body>"),
        F.lit('<div class="article-content"><p>'),
        F.lit(FILLER),
        F.lit('</p><p>See <a href="'),
        ref_url,
        F.lit('">the cited reference material</a> for details, details, details.</p></div>'),
        F.lit("</body></html>"),
    )
    return docs.select(
        F.concat(
            F.lit("http://"), F.col("source"),
            F.lit(".example.com/linked-"), F.col("doc_id").cast("string"),
            F.lit(".html"),
        ).alias("url"),
        F.lit("2026-01-01 00:00:00").cast("timestamp").alias("warc_ts"),
        F.encode(html_str, "utf-8").alias("html"),
        F.lit("").alias("text"),
        F.lit("en").alias("lang"),
        F.col("doc_id"),
    )


def extract_footnotes_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """queries() entry: footnote generation through the Arrow UDF
    (footnote_links=True), exploded to a (url, href, text) link table —
    the UDTF face of the footnotes array column."""
    pages = linked_pages_from_documents(spark, sf_dir)
    extracted = extraction_plan(pages, settings={"footnote_links": True})
    fn = extracted.select("url", F.explode("footnotes").alias("f"))
    return fn.select(
        "url",
        F.col("f.href").alias("href"),
        F.col("f.text").alias("fn_text"),
    )


ORACLE_EXTRACT_FOOTNOTES = """
SELECT concat('http://', source, '.example.com/linked-', CAST(doc_id AS VARCHAR), '.html') AS url,
       concat('http://ref.example.org/d', CAST(doc_id AS VARCHAR), '.html') AS href,
       concat('http://ref.example.org/d', CAST(doc_id AS VARCHAR), '.html') AS fn_text
FROM documents
"""


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver smoke entry: extraction over template pages synthesized
    from sf documents, aggregated to per-lang metrics."""
    pages = pages_from_documents(spark, sf_dir)
    extracted = extraction_plan(pages)
    langs = pages.select("url", "lang")
    return (
        extracted.join(langs, "url")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum(F.when(F.col("metrics.parse_ok"), 1).otherwise(0)).alias(
                "parse_ok_docs"
            ),
            F.round(F.avg("metrics.top_score"), 4).alias("avg_top_score"),
            F.round(F.avg(F.length("article_text")), 4).alias("avg_text_len"),
        )
    )
