"""Text-analysis operators for the training-data pipeline: language ID,
quality scoring, token counting, document fingerprinting — all as
JVM-side expressions (no Python in the hot path), each with a DuckDB
oracle twin.

These mirror, at corpus level, the reference's in-document scalar ops
(inner-text stats, comma scoring — readability.py:1215-1233, 634-668);
the per-document extraction equivalents run inside the Arrow UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import load_table

# BPE-ish tokenizer: letter runs, digit runs, single punctuation marks.
BPE_PATTERN = r"[a-z]+|[0-9]+|[^a-z0-9\s]"

STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in"],
    "de": ["der", "die", "und", "das", "ein"],
    "fr": ["le", "la", "les", "et", "des"],
    "es": ["el", "los", "las", "y", "una"],
}


def _stop_pattern(lang: str) -> str:
    return r"\b(" + "|".join(STOPWORDS[lang]) + r")\b"


def q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace tokens + BPE-ish regex tokens per document."""
    docs = load_table(spark, sf_dir, "documents")
    low = F.lower(F.col("text"))
    return docs.select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("ws_tokens"),
        F.regexp_count(low, F.lit(BPE_PATTERN)).alias("bpe_tokens"),
        F.length("text").alias("chars"),
    )


ORACLE_TOKEN_STATS = rf"""
SELECT doc_id,
       len(regexp_split_to_array(trim(text), '\s+')) AS ws_tokens,
       len(regexp_extract_all(lower(text), '{BPE_PATTERN}')) AS bpe_tokens,
       length(text) AS chars
FROM documents
"""


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-hit language ID: per-language hit counts → argmax with a
    fixed precedence (en > de > fr > es), 'und' when nothing hits."""
    docs = load_table(spark, sf_dir, "documents")
    low = F.lower(F.col("text"))
    hits = {l: F.regexp_count(low, F.lit(_stop_pattern(l))) for l in STOPWORDS}
    best = F.greatest(*hits.values())
    pred = (
        F.when(best == 0, F.lit("und"))
        .when(hits["en"] == best, F.lit("en"))
        .when(hits["de"] == best, F.lit("de"))
        .when(hits["fr"] == best, F.lit("fr"))
        .otherwise(F.lit("es"))
    )
    return docs.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        *[hits[l].alias(f"hits_{l}") for l in STOPWORDS],
        pred.alias("pred_lang"),
    )


def _duck_hits(lang: str) -> str:
    return f"len(regexp_extract_all(lower(text), '{_stop_pattern(lang)}'))"


ORACLE_LANG_ID = f"""
WITH h AS (
  SELECT doc_id, lang AS labeled_lang,
         {_duck_hits('en')} AS hits_en,
         {_duck_hits('de')} AS hits_de,
         {_duck_hits('fr')} AS hits_fr,
         {_duck_hits('es')} AS hits_es
  FROM documents
)
SELECT doc_id, labeled_lang, hits_en, hits_de, hits_fr, hits_es,
       CASE WHEN greatest(hits_en, hits_de, hits_fr, hits_es) = 0 THEN 'und'
            WHEN hits_en = greatest(hits_en, hits_de, hits_fr, hits_es) THEN 'en'
            WHEN hits_de = greatest(hits_en, hits_de, hits_fr, hits_es) THEN 'de'
            WHEN hits_fr = greatest(hits_en, hits_de, hits_fr, hits_es) THEN 'fr'
            ELSE 'es' END AS pred_lang
FROM h
"""


def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style quality features: word count, mean word length,
    punctuation ratio, stopword ratio, and a composite score."""
    docs = load_table(spark, sf_dir, "documents")
    low = F.lower(F.col("text"))
    words = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    letters = F.length(F.regexp_replace(low, r"\s+", ""))
    punct = F.regexp_count(low, F.lit(r"[^a-z0-9\s]"))
    stop_hits = F.regexp_count(low, F.lit(_stop_pattern("en")))
    mean_wlen = F.round(letters.cast("double") / words, 4)
    punct_ratio = F.round(punct.cast("double") / F.greatest(letters, F.lit(1)), 4)
    stop_ratio = F.round(stop_hits.cast("double") / words, 4)
    score = F.round(
        F.least(F.lit(1.0), words.cast("double") / 100.0) * (1.0 - punct_ratio),
        4,
    )
    return docs.select(
        "doc_id",
        words.alias("words"),
        mean_wlen.alias("mean_word_len"),
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stopword_ratio"),
        score.alias("quality"),
    )


ORACLE_QUALITY_SCORE = rf"""
WITH s AS (
  SELECT doc_id,
         len(regexp_split_to_array(trim(text), '\s+')) AS words,
         length(regexp_replace(lower(text), '\s+', '', 'g')) AS letters,
         len(regexp_extract_all(lower(text), '[^a-z0-9\s]')) AS punct,
         len(regexp_extract_all(lower(text), '{_stop_pattern('en')}')) AS stop_hits
  FROM documents
)
SELECT doc_id, words,
       ROUND(CAST(letters AS DOUBLE) / words, 4) AS mean_word_len,
       ROUND(CAST(punct AS DOUBLE) / greatest(letters, 1), 4) AS punct_ratio,
       ROUND(CAST(stop_hits AS DOUBLE) / words, 4) AS stopword_ratio,
       ROUND(least(1.0, CAST(words AS DOUBLE) / 100.0)
             * (1.0 - ROUND(CAST(punct AS DOUBLE) / greatest(letters, 1), 4)), 4) AS quality
FROM s
"""


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalization-invariant fingerprint: md5 over lowercased text with
    non-alphanumerics collapsed — the key for fuzzy-exact dedup."""
    docs = load_table(spark, sf_dir, "documents")
    norm = F.trim(
        F.regexp_replace(F.lower(F.col("text")), r"[^a-z0-9]+", " ")
    )
    return docs.select(
        "doc_id",
        F.md5(F.encode(norm, "utf-8")).alias("fingerprint"),
        F.length(norm).alias("norm_len"),
    )


ORACLE_DOC_FINGERPRINT = r"""
SELECT doc_id,
       md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fingerprint,
       length(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS norm_len
FROM documents
"""


def q_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary: top-50 whitespace tokens by document
    frequency — the vocab-building face of a training-data pipeline.
    Scale shape: explode → two-phase count (partial map-side combine
    comes free with groupBy) → global top-k via TakeOrdered (orderBy +
    limit never materializes a full sort at scale). Deterministic
    tie-break on the token string."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.array_distinct(F.split("text", " "))).alias("tok")
    ).filter(F.col("tok") != "")
    return (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("doc_freq"))
        .orderBy(F.desc("doc_freq"), F.asc("tok"))
        .limit(50)
    )


ORACLE_VOCAB_TOPK = """
SELECT tok, CAST(COUNT(*) AS BIGINT) AS doc_freq FROM (
  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok
  FROM documents
) WHERE tok <> ''
GROUP BY tok ORDER BY doc_freq DESC, tok ASC LIMIT 50
"""


QUERIES = {
    "vocab_topk": q_vocab_topk,
    "token_stats": q_token_stats,
    "lang_id": q_lang_id,
    "quality_score": q_quality_score,
    "doc_fingerprint": q_doc_fingerprint,
}

ORACLES = {
    "vocab_topk": ORACLE_VOCAB_TOPK,
    "token_stats": ORACLE_TOKEN_STATS,
    "lang_id": ORACLE_LANG_ID,
    "quality_score": ORACLE_QUALITY_SCORE,
    "doc_fingerprint": ORACLE_DOC_FINGERPRINT,
}
