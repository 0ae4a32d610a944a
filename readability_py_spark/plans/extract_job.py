"""Flagship extraction job plan.

Stage layout (SURVEY.md §3.4):
  scan(pages) → filter(lang/nonempty) → anti-join(done-manifest)
  → repartition(pmod(hash(url), P)) → mapInPandas(extract_batch)
  → sink + per-partition metrics agg.

Until the byte-faithful core extractor lands (M0), ``flagship`` runs
the plan skeleton with a lightweight text-stat extractor so the driver
smoke check exercises the real stage layout end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import load_table


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-lang extraction metrics over the synthesized pages corpus."""
    docs = load_table(spark, sf_dir, "documents")
    norm_len = F.length(F.regexp_replace(F.trim(F.col("text")), r"\s+", " "))
    score = (
        F.lit(1)
        + F.regexp_count(F.col("text"), F.lit(","))
        + F.least(F.floor(norm_len / 100), F.lit(3)).cast("int")
    )
    return (
        docs.filter(F.col("n_chars") > 0)
        .withColumn("score", score)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum("score").alias("score_sum"),
            F.round(F.avg(F.col("n_chars")), 4).alias("avg_chars"),
        )
    )
