"""Time-series join operators Spark lacks natively: as-of join and
range (interval-containment) join, expressed as compositions of
existing DataFrame ops so Catalyst keeps full visibility (SURVEY.md
§2.2 joins family; reference has no analogue — single-document tool —
these are the §2.3 event-pipeline consumers).

Both are LOCAL_ONLY (the 50-entry driver dict is full): full
queries()+oracle_sql() pairs verified by the local typed harness via
``merged_queries(include_retired=True)``, with DuckDB's native
``ASOF LEFT JOIN`` / inequality join as genuinely independent oracle
algorithms.

Scale shapes (the reason these exist as named operators):

- **As-of join**: the naive formulation is an inequality join
  (``a.ts >= b.ts`` + argmax), which Spark can only execute as a
  broadcast-nested-loop or cartesian — quadratic at 100 TB. The
  scalable form here is the classic union+window rewrite: tag both
  streams, union, one hash shuffle on the key, one partition-local
  sort, ``last(..., ignorenulls)`` running window. Zero joins in the
  plan; cost is one exchange of (A+B), identical to a plain groupBy.
- **Range join**: naive is again an inequality join. The scalable
  form buckets time into fixed-width epochs: each interval explodes
  into the (few) buckets it covers, each probe row computes its single
  bucket, and the match becomes a (key, bucket) **equi-join** followed
  by the exact range filter — shuffle-hash-joinable, skew-salvageable,
  never nested-loop. Bucket width is chosen so intervals span ≤ 2
  buckets (width == max interval length).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..session import load_table

# Window length for the range join (and its bucket width — equal by
# construction so every interval covers at most 2 buckets). 4h keeps
# the oracle non-thin at sf0.001 (10 matched windows vs 1 at 30min).
RANGE_WINDOW_SEC = 14400


def q_events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each ``purchase`` event matched to the latest
    ``click`` by the same user at-or-before its timestamp (the
    attribution query every event pipeline runs).

    Plan: ONE scan with a two-type filter and an in-row is_probe tag
    (r6 rewrite of the earlier tag+union form — no Union node, and the
    exchanged row is exactly 4 columns), ONE shuffle on user_id,
    running ``last(ignorenulls)`` window — the whole as-of is a single
    exchange (plan-asserted), no join operator and no
    pre-aggregation. Ordering (ts, is_probe, event_id) encodes both
    semantics knobs: a click sorts before a purchase at the same
    timestamp (tag 0 < 1 → inclusive match, exactly DuckDB's
    ``p.ts >= c.ts``), and same-timestamp clicks sort by event_id so
    the running ``last`` picks the max-event_id winner — the same
    deterministic tie-break the oracle materializes with its
    pre-dedup GROUP BY (DuckDB's ASOF leaves same-timestamp ties
    unspecified, so the oracle must resolve them before the as-of).
    """
    ev = load_table(spark, sf_dir, "events")
    # the exchanged row is exactly 4 columns — (user_id, ts, is_probe,
    # event_id); the probe/match ids are DERIVED after the window from
    # is_probe + event_id instead of being carried as two extra long
    # columns through the shuffle (the r6 as-of scaling pair measured
    # this plan memory/shuffle-bandwidth-bound at local[32], so every
    # exchanged byte is wall time)
    tagged = ev.filter(
        F.col("event_type").isin("click", "purchase")
    ).select(
        "user_id",
        "ts",
        (F.col("event_type") == "purchase").cast("int").alias("is_probe"),
        "event_id",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_probe", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    click_only = F.when(F.col("is_probe") == 0, F.col("event_id"))
    matched = tagged.withColumn(
        "m_event_id", F.last(click_only, ignorenulls=True).over(w)
    ).withColumn(
        "m_ts",
        F.last(F.when(F.col("is_probe") == 0, F.col("ts")), ignorenulls=True).over(w),
    )
    return matched.filter(F.col("is_probe") == 1).select(
        F.col("event_id").alias("p_event_id"),
        "user_id",
        F.coalesce("m_event_id", F.lit(-1)).alias("c_event_id"),
        F.coalesce(
            F.unix_timestamp("ts") - F.unix_timestamp("m_ts"), F.lit(-1)
        ).alias("gap_sec"),
    )


# DuckDB executes this with its native ASOF algorithm (sort + merge) —
# an independent implementation of the same semantics, not a
# re-statement of the union+window rewrite.
ORACLE_EVENTS_ASOF_JOIN = """
WITH clicks AS (
  SELECT user_id, ts, MAX(event_id) AS c_event_id
  FROM events WHERE event_type = 'click' GROUP BY user_id, ts
),
purchases AS (
  SELECT event_id AS p_event_id, user_id, ts
  FROM events WHERE event_type = 'purchase'
)
SELECT p.p_event_id, p.user_id,
       COALESCE(c.c_event_id, -1) AS c_event_id,
       COALESCE(CAST(date_diff('second', c.ts, p.ts) AS BIGINT), -1) AS gap_sec
FROM purchases p ASOF LEFT JOIN clicks c
  ON p.user_id = c.user_id AND p.ts >= c.ts
"""


def q_range_count_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval-containment) join: count + sum the ``error``
    events falling inside each user's 4-hour post-``signup`` window
    (``signup.ts <= error.ts < signup.ts + 4h``).

    Plan: both sides derive an epoch bucket of width == the window
    length, so every interval covers at most 2 buckets and every
    probe row exactly 1 — each matching pair therefore meets exactly
    once and the pre-filter join is a plain **equi-join** on
    (user_id, bucket), then the exact range predicate + aggregation.
    The interval's end bucket is the bucket of its last contained
    second, ``floor((start + w - 1) / w)`` — NOT ``floor((start+w)/w)``
    (which is always start's bucket + 1, so ``array_distinct`` never
    collapsed anything and every window shuffled into 2 buckets;
    advisor r5) — so a boundary-aligned window genuinely explodes into
    ONE bucket. Windows with zero errors keep inner-join semantics
    (not emitted).
    """
    ev = load_table(spark, sf_dir, "events")
    win_w = RANGE_WINDOW_SEC
    # w_end is NOT carried through the shuffle — it is w_start plus a
    # constant, so it is re-derived after the join (same slimming as
    # the as-of rewrite: the equi-join exchanges one fewer timestamp
    # column per window replica)
    windows = (
        ev.filter(F.col("event_type") == "signup")
        .select(
            F.col("event_id").alias("w_event_id"),
            "user_id",
            F.col("ts").alias("w_start"),
        )
        .withColumn(
            "bucket",
            F.explode(
                F.array_distinct(
                    F.array(
                        F.floor(F.unix_timestamp("w_start") / win_w),
                        F.floor(
                            (F.unix_timestamp("w_start") + win_w - 1) / win_w
                        ),
                    )
                )
            ),
        )
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id",
        F.col("ts").alias("e_ts"),
        "value",
        F.floor(F.unix_timestamp("ts") / win_w).alias("bucket"),
    )
    w_end = F.col("w_start") + F.expr(f"INTERVAL {win_w} SECONDS")
    return (
        windows.join(errors, on=["user_id", "bucket"])
        .filter((F.col("e_ts") >= F.col("w_start")) & (F.col("e_ts") < w_end))
        .groupBy("w_event_id", "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_errors"),
            (
                F.round(
                    F.sum(F.col("value").cast("decimal(18,4)")).cast("double"), 4
                )
                + F.lit(0.0)
            ).alias("err_value_sum"),
        )
    )


ORACLE_RANGE_COUNT_JOIN = f"""
WITH w AS (
  SELECT event_id AS w_event_id, user_id, ts AS w_start,
         ts + INTERVAL {RANGE_WINDOW_SEC} SECOND AS w_end
  FROM events WHERE event_type = 'signup'
),
e AS (
  SELECT user_id, ts AS e_ts, value
  FROM events WHERE event_type = 'error'
)
SELECT w.w_event_id, w.user_id,
       CAST(COUNT(*) AS BIGINT) AS n_errors,
       ROUND(CAST(SUM(CAST(e.value AS DECIMAL(18,4))) AS DOUBLE), 4) + 0.0
         AS err_value_sum
FROM w JOIN e
  ON w.user_id = e.user_id AND e.e_ts >= w.w_start AND e.e_ts < w.w_end
GROUP BY w.w_event_id, w.user_id
"""


QUERIES = {
    "events_asof_join": q_events_asof_join,
    "range_count_join": q_range_count_join,
}

ORACLES = {
    "events_asof_join": ORACLE_EVENTS_ASOF_JOIN,
    "range_count_join": ORACLE_RANGE_COUNT_JOIN,
}


def q_events_rollup_multires(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style multi-resolution continuous aggregate: hourly,
    daily, and monthly event rollups where each coarser resolution is
    computed FROM the finer one's partials, never from raw events —
    the incremental-rollup pattern of a time-series store. The hourly
    relation is eager-persisted (it feeds its own output branch AND
    the daily rollup; lazy persist + multi-reference recomputes
    concurrently under AQE), so the plan scans events exactly once and
    the daily/monthly aggregations run over |hours| and |days| rows.

    Sums stay exact decimals through every rollup level (associative,
    partition-order-proof) and only become rounded doubles at the
    output — which is also why partial-aggregate reuse is legal here.

    The DuckDB oracle computes each resolution INDEPENDENTLY from raw
    events, so the hash match proves the hierarchical reuse correct.
    """
    from .dedup import _persist

    ev = load_table(spark, sf_dir, "events")
    hourly = _persist(
        ev.groupBy(F.date_trunc("hour", "ts").alias("bucket")).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,4)")).alias("vdec"),
        ),
        eager=True,
    )
    daily = hourly.groupBy(
        F.date_trunc("day", "bucket").alias("bucket")
    ).agg(F.sum("n").alias("n"), F.sum("vdec").alias("vdec"))
    monthly = daily.groupBy(
        F.date_trunc("month", "bucket").alias("bucket")
    ).agg(F.sum("n").alias("n"), F.sum("vdec").alias("vdec"))

    def out(df: DataFrame, res: str) -> DataFrame:
        return df.select(
            F.lit(res).alias("resolution"),
            "bucket",
            "n",
            F.round(F.col("vdec").cast("double"), 4).alias("value_sum"),
        )

    return (
        out(hourly, "hour")
        .unionByName(out(daily, "day"))
        .unionByName(out(monthly, "month"))
    )


# independent per-resolution recomputation from raw events (DuckDB
# date_trunc returns DATE for day/month — cast back to TIMESTAMP to
# match Spark's always-TIMESTAMP date_trunc)
ORACLE_EVENTS_ROLLUP_MULTIRES = """
SELECT 'hour' AS resolution, date_trunc('hour', ts) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 4) AS value_sum
FROM events GROUP BY 2
UNION ALL
SELECT 'day', CAST(date_trunc('day', ts) AS TIMESTAMP),
       CAST(COUNT(*) AS BIGINT),
       ROUND(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 4)
FROM events GROUP BY 2
UNION ALL
SELECT 'month', CAST(date_trunc('month', ts) AS TIMESTAMP),
       CAST(COUNT(*) AS BIGINT),
       ROUND(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 4)
FROM events GROUP BY 2
"""

QUERIES["events_rollup_multires"] = q_events_rollup_multires
ORACLES["events_rollup_multires"] = ORACLE_EVENTS_ROLLUP_MULTIRES
