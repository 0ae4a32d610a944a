"""Deduplication operators for the training-data pipeline.

Four families, each a `queries()` entry with a DuckDB oracle twin:

- exact:        md5 fingerprint groupBy (one shuffle on the hash key)
- n-gram Jaccard: length-banded blocking → pair join → set Jaccard
- MinHash+LSH:  shingle → k md5-minhashes → band signatures → bucket
                join → Jaccard verify (the scale path: candidate pairs
                come from equi-join on band signature, never O(n²))
- SimHash:      32-bit sign-of-sums signature per doc + banded
                hamming-distance pair search

Hash discipline: all hashing is md5-over-utf8 (identical in Spark and
DuckDB), so even the MinHash/SimHash pipelines are oracle-checkable.
MinHash "hash family" h_i(s) = md5(i || ':' || s) compared as hex
strings (lexicographic min == numeric min on fixed-width hex).

Scale notes (100 TB): exact dedup shuffles once on the fingerprint;
MinHash shuffles shingles (explode factor ~#shingles × k, bounded by
distinct-shingle cap) then joins on band signature, which is uniform by
construction; Jaccard verify touches only candidate pairs. The plain
banded-Jaccard query is the small-scale oracle twin — at corpus scale
only the LSH path runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..session import load_table

MINHASH_K = 12
MINHASH_BAND_SIZE = 3  # 4 bands of 3
JACCARD_THRESHOLD = 0.5
SIMHASH_BITS = 32


def _shingled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents + distinct bigram word-shingle set.

    The scan is repartitioned before shingling: the testdata tables are
    single parquet files (one input split), and shingle+minhash work is
    CPU-bound — without this the whole map stage runs on one core. At
    100 TB the input has thousands of splits and Catalyst would already
    parallelize; the explicit repartition only matters when input
    splits < cores."""
    docs = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    w = F.split(F.col("text"), " ")
    shingles = F.array_distinct(
        F.when(
            F.size(w) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size(w) - 1),
                lambda i: F.concat(
                    F.element_at(w, i), F.lit(" "), F.element_at(w, i + 1)
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))
    )
    return docs.select("doc_id", "lang", "n_chars", shingles.alias("sh"))


_SH_DUCK = """
  SELECT doc_id, lang, n_chars,
         list_distinct(
           CASE WHEN len(string_split(text,' ')) >= 2 THEN
             list_transform(range(1, len(string_split(text,' '))), i ->
               string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1])
           ELSE [] END) AS sh
  FROM documents
"""


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: one shuffle on md5(text); keeps the smallest doc_id
    as the representative (deterministic at any partitioning)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.withColumn("fp", F.md5(F.encode(F.col("text"), "utf-8")))
        .groupBy("fp")
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("dup_cnt"),
        )
    )


ORACLE_DEDUP_EXACT = """
SELECT md5(text) AS fp, MIN(doc_id) AS keep_doc_id, COUNT(*) AS dup_cnt
FROM documents GROUP BY 1
"""


def q_ngram_jaccard_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by bigram-shingle Jaccard, blocked on
    (lang, n_chars//100) so the pair join is banded, not O(n²)."""
    d = _shingled(spark, sf_dir).withColumn(
        "band", (F.col("n_chars") / 100).cast("long")
    ).persist()  # reused by both sides of the pair join
    a = d.alias("a")
    b = d.alias("b")
    inter = F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh")))
    union = F.size(F.col("a.sh")) + F.size(F.col("b.sh")) - inter
    jacc = inter.cast("double") / union
    return (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.band") == F.col("b.band"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("a_id"),
            F.col("b.doc_id").alias("b_id"),
            F.round(jacc, 4).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
    )


ORACLE_NGRAM_JACCARD_DUPS = f"""
WITH d AS ({_SH_DUCK}),
banded AS (SELECT doc_id, lang, n_chars // 100 AS band, sh FROM d),
pairs AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
         ROUND(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
               / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 4) AS jaccard
  FROM banded a JOIN banded b
    ON a.lang = b.lang AND a.band = b.band AND a.doc_id < b.doc_id
)
SELECT a_id, b_id, jaccard FROM pairs WHERE jaccard >= {JACCARD_THRESHOLD}
"""


def _minhash_col(i: int) -> F.Column:
    """h_i = min over shingles of md5(i || ':' || s) — computed map-only
    inside the row via array expressions (no explode, no shuffle; the
    whole signature build is embarrassingly parallel at 100 TB)."""
    return F.array_min(
        F.transform(
            F.col("sh"),
            lambda s: F.md5(F.encode(F.concat(F.lit(f"{i}:"), s), "utf-8")),
        )
    )


def q_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc MinHash band signatures (the LSH index one would persist
    alongside the corpus): 4 bands × 3 md5-minhashes, map-only."""
    d = _shingled(spark, sf_dir).filter(F.size("sh") > 0)
    n_bands = MINHASH_K // MINHASH_BAND_SIZE
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.concat_ws(
                    ",",
                    *[
                        _minhash_col(i)
                        for i in range(
                            b * MINHASH_BAND_SIZE, (b + 1) * MINHASH_BAND_SIZE
                        )
                    ],
                ).alias("band_sig"),
            )
            for b in range(n_bands)
        ]
    )
    return d.select(
        "doc_id", F.explode(bands).alias("bs")
    ).select("doc_id", F.col("bs.band").alias("band"), F.col("bs.band_sig").alias("band_sig"))


def _duck_minhash_sig() -> str:
    n_bands = MINHASH_K // MINHASH_BAND_SIZE
    band_exprs = []
    for b in range(n_bands):
        mins = " || ',' || ".join(
            f"list_min(list_transform(sh, s -> md5('{i}:' || s)))"
            for i in range(b * MINHASH_BAND_SIZE, (b + 1) * MINHASH_BAND_SIZE)
        )
        band_exprs.append(f"SELECT doc_id, {b} AS band, {mins} AS band_sig FROM d WHERE len(sh) > 0")
    return "\nUNION ALL\n".join(band_exprs)


ORACLE_MINHASH_SIGNATURES = f"""
WITH d AS ({_SH_DUCK})
SELECT doc_id, CAST(band AS INT) AS band, band_sig FROM (
{_duck_minhash_sig()}
)
"""


def q_minhash_lsh_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full MinHash-LSH dedup: candidates = equi-join on band signature
    (uniform shuffle key — no quadratic blowup), then exact-Jaccard
    verify at the same threshold as the banded-Jaccard query.

    The signature and shingle-set relations are cached: both sides of
    the candidate self-join and the verify join reuse them (at corpus
    scale these would be persisted index tables, not recomputed)."""
    sig = q_minhash_signatures(spark, sf_dir).persist()
    a = sig.alias("a")
    b = sig.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_sig") == F.col("b.band_sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id")
        )
        .distinct()
    )
    d = _shingled(spark, sf_dir).select("doc_id", "sh").persist()
    da = d.alias("da")
    db = d.alias("db")
    inter = F.size(F.array_intersect(F.col("da.sh"), F.col("db.sh")))
    union = F.size(F.col("da.sh")) + F.size(F.col("db.sh")) - inter
    jacc = inter.cast("double") / union
    return (
        cand.join(da, cand.a_id == F.col("da.doc_id"))
        .join(db, cand.b_id == F.col("db.doc_id"))
        .select("a_id", "b_id", F.round(jacc, 4).alias("jaccard"))
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
    )


ORACLE_MINHASH_LSH_DUPS = f"""
WITH d AS ({_SH_DUCK}),
sig AS (
{_duck_minhash_sig()}
),
cand AS (
  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
  FROM sig a JOIN sig b
    ON a.band = b.band AND a.band_sig = b.band_sig AND a.doc_id < b.doc_id
),
verified AS (
  SELECT c.a_id, c.b_id,
         ROUND(CAST(len(list_intersect(da.sh, db.sh)) AS DOUBLE)
               / (len(da.sh) + len(db.sh) - len(list_intersect(da.sh, db.sh))), 4) AS jaccard
  FROM cand c JOIN d da ON c.a_id = da.doc_id JOIN d db ON c.b_id = db.doc_id
)
SELECT a_id, b_id, jaccard FROM verified WHERE jaccard >= {JACCARD_THRESHOLD}
"""


def _simhash_sql(dialect: str) -> str:
    """Generate the 32-bit SimHash query for either dialect.

    Signature = for each bit b: sign of Σ_tokens (±1 by bit b of
    md5-32(token)); identical token hashing in both engines via
    hex-prefix of md5. Dialect differences: hex→int cast and shift ops.
    """
    if dialect == "spark":
        h32 = "CAST(conv(substr(md5(tok), 1, 8), 16, 10) AS BIGINT)"
        shr = lambda x, b: f"shiftright({x}, {b})"
    else:
        h32 = "CAST('0x' || substr(md5(tok), 1, 8) AS BIGINT)"
        shr = lambda x, b: f"({x} >> {b})"
    bit_sums = ",\n         ".join(
        f"SUM(CASE WHEN ({shr('h32', b)} & 1) = 1 THEN 1 ELSE -1 END) AS s{b}"
        for b in range(SIMHASH_BITS)
    )
    sig = " + ".join(
        f"(CASE WHEN s{b} > 0 THEN {1 << b} ELSE 0 END)"
        for b in range(SIMHASH_BITS)
    )
    if dialect == "spark":
        toks = (
            "SELECT /*+ REPARTITION(32) */ doc_id,"
            " explode(array_distinct(split(text, ' '))) AS tok"
            " FROM documents"
        )
    else:
        toks = (
            "SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok"
            " FROM documents"
        )
    return f"""
WITH toks AS ({toks}),
hashed AS (SELECT doc_id, {h32} AS h32 FROM toks),
bits AS (
  SELECT doc_id,
         {bit_sums}
  FROM hashed GROUP BY doc_id
)
SELECT doc_id, CAST({sig} AS BIGINT) AS simhash FROM bits
"""


def q_simhash_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_simhash_sql("spark"))


ORACLE_SIMHASH_DOCS = _simhash_sql("duckdb")


def _simhash_pairs_sql(dialect: str) -> str:
    """SimHash near-dup pairs: band on the high 16 bits (equi-join — the
    scale-safe candidate generator), keep hamming distance ≤ 6/32."""
    base = _simhash_sql(dialect).strip()
    if dialect == "spark":
        shr16 = "shiftright(simhash, 16)"
        ham = "bit_count(a.simhash ^ b.simhash)"
    else:
        shr16 = "(simhash >> 16)"
        ham = "bit_count(xor(a.simhash, b.simhash))"
    return f"""
WITH sig AS ({base}),
banded AS (SELECT doc_id, simhash, {shr16} AS hi16 FROM sig)
SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       CAST({ham} AS INT) AS hamming
FROM banded a JOIN banded b ON a.hi16 = b.hi16 AND a.doc_id < b.doc_id
WHERE {ham} <= 6
"""


def q_simhash_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_simhash_pairs_sql("spark"))


ORACLE_SIMHASH_DUP_PAIRS = _simhash_pairs_sql("duckdb")


QUERIES = {
    "dedup_exact": q_dedup_exact,
    "ngram_jaccard_dups": q_ngram_jaccard_dups,
    "minhash_signatures": q_minhash_signatures,
    "minhash_lsh_dups": q_minhash_lsh_dups,
    "simhash_docs": q_simhash_docs,
    "simhash_dup_pairs": q_simhash_dup_pairs,
}

ORACLES = {
    "dedup_exact": ORACLE_DEDUP_EXACT,
    "ngram_jaccard_dups": ORACLE_NGRAM_JACCARD_DUPS,
    "minhash_signatures": ORACLE_MINHASH_SIGNATURES,
    "minhash_lsh_dups": ORACLE_MINHASH_LSH_DUPS,
    "simhash_docs": ORACLE_SIMHASH_DOCS,
    "simhash_dup_pairs": ORACLE_SIMHASH_DUP_PAIRS,
}
