"""Round-6 operator tests: gated multimodal keyed repartitions
(VERDICT r5 "What's wrong" #2), the range-join end-bucket collapse
(advisor r5), shared tokenization in dedup_groups, and incremental
dedup against a stored corpus index."""

from __future__ import annotations

from pyspark.sql import functions as F

from .conftest import SF_SMOKE


def _final_plan(df) -> str:
    plan = df._jdf.queryExecution().executedPlan().toString().lower()
    return plan.split("== initial plan ==")[0]


def _full_plan(df) -> str:
    """The UNtruncated executed-plan string. _final_plan cuts at the
    first '== initial plan ==' marker to drop the adaptive duplicate —
    but a query whose eager-persisted cache BUILD plan itself went
    adaptive (any persist above a gated repartition, r7) embeds a
    nested finished AdaptiveSparkPlan, and the cut at ITS marker
    silently drops the rest of the OUTER plan. Use this for plans with
    persisted-relation subtrees; nested cache-build initial sections
    stay in the string, so assertions must tolerate them."""
    return df._jdf.queryExecution().executedPlan().toString().lower()


# ---------------------------------------------------------------------------
# multimodal keyed-repartition gating
# ---------------------------------------------------------------------------


def test_media_decode_presplit_payloads_are_exchange_free(spark):
    """On a pre-split payload table the gated keyed balance must NOT
    fire: the decode plan is scan → mapInPandas with zero exchanges
    (a real media corpus is always multi-split; the old unconditional
    form shuffled 1× the binary payloads for nothing)."""
    from readability_py_spark.operators.multimodal import (
        frame_sample_plan,
        media_decode_plan,
    )
    from readability_py_spark.session import load_table

    n = 2 * spark.sparkContext.defaultParallelism
    payloads = (
        load_table(spark, SF_SMOKE, "documents")
        .select("doc_id", F.encode(F.col("text"), "utf-8").alias("payload"))
        .repartition(n)
    )
    plan = _final_plan(media_decode_plan(payloads.cache()))
    # the only exchange allowed is the one inside the .repartition(n)
    # input itself; count exchanges in the decode plan ABOVE the cached
    # input: cache() makes the input an InMemoryRelation leaf
    assert "exchange" not in plan.split("inmemorytablescan")[0], plan

    videos = payloads.withColumn("duration_ms", F.lit(3000)).withColumn(
        "fps", F.lit(10)
    )
    plan2 = _final_plan(frame_sample_plan(videos.cache()))
    assert "exchange" not in plan2.split("inmemorytablescan")[0], plan2
    payloads.unpersist()
    videos.unpersist()


def test_media_decode_single_split_still_parallelizes(spark):
    """Single-split input (the testdata shape) keeps the keyed balance:
    CPU-bound decode must not run on one core."""
    from readability_py_spark.operators.multimodal import media_decode_plan
    from readability_py_spark.session import load_table

    payloads = load_table(spark, SF_SMOKE, "documents").select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )
    assert (
        payloads.rdd.getNumPartitions()
        < spark.sparkContext.defaultParallelism
    )
    plan = _final_plan(media_decode_plan(payloads))
    assert "exchange hashpartitioning(doc_id" in plan, plan
    # explicit width always wins; assume_clustered always skips
    forced = _final_plan(media_decode_plan(payloads, num_partitions=7))
    assert "exchange hashpartitioning(doc_id" in forced
    skipped = _final_plan(media_decode_plan(payloads, assume_clustered=True))
    assert "exchange" not in skipped, skipped


# ---------------------------------------------------------------------------
# range join: boundary-aligned windows explode into ONE bucket
# ---------------------------------------------------------------------------


def test_dedup_incremental_from_stored_catalog_index(spark, tmp_path):
    """The real incremental shape: the corpus index (fingerprints, band
    signatures, shingles) is PERSISTED via the snapshot catalog by a
    prior ingest, and the incremental job consumes the stored tables —
    the old side is file scans + keyed equi-joins, never re-shingled.

    Asserts (a) the stored-index run matches the self-contained driver
    query exactly, and (b) no scan in the job reads OLD text — shingling
    needs text, the function never receives the old documents relation,
    and every warehouse (stored-index) scan's readSchema carries only
    its index columns — so re-shingling the corpus is impossible by
    construction, and the plan proves it."""
    from readability_py_spark.operators.incremental import (
        NEW_MOD,
        build_corpus_index,
        dedup_incremental_from,
        q_dedup_incremental,
    )
    from readability_py_spark.sources.catalog import LocalTableCatalog
    from readability_py_spark.session import load_table

    docs = load_table(spark, SF_SMOKE, "documents")
    old_docs = docs.filter(F.col("doc_id") % NEW_MOD != 0).select(
        "doc_id", "text"
    )
    new_docs = docs.filter(F.col("doc_id") % NEW_MOD == 0).select(
        "doc_id", "text"
    )

    # ingest-time job: persist the index next to the data
    cat = LocalTableCatalog(str(tmp_path / "warehouse"))
    fps, sigs, sh = build_corpus_index(old_docs)
    cat.append(fps, "corpus_fps")
    cat.append(sigs, "corpus_sigs")
    cat.append(sh, "corpus_shingles")

    # incremental job: stored index only (no old text anywhere)
    out = dedup_incremental_from(
        new_docs,
        cat.read(spark, "corpus_fps"),
        cat.read(spark, "corpus_sigs"),
        cat.read(spark, "corpus_shingles"),
    )
    got = sorted(map(tuple, out.collect()))
    expect = sorted(map(tuple, q_dedup_incremental(spark, SF_SMOKE).collect()))
    assert got == expect
    # the synthetic corpus has no exact text dup straddling the split
    # (dedup_exact shows every fingerprint unique), so the real-corpus
    # path exercises the near + unique channels; the exact channel and
    # priority are pinned below on a constructed corpus
    assert any(v == "near_dup" for _, v, _, _ in got)
    assert any(v == "unique" for _, v, _, _ in got)

    # presence assertions run on the PRE-adaptive physical plan: AQE's
    # empty-relation propagation prunes whole channels at runtime when
    # a stage comes back empty (the exact channel here — this corpus
    # has no exact dup), which would hide the scans being asserted on.
    # Classify scans by their (never-truncated) output column list:
    # re-shingling the old corpus would need a text scan WITHOUT the
    # new-snapshot filter, and the stored index must enter as scans.
    plan = out._jdf.queryExecution().sparkPlan().toString().lower()
    scan_cols, scan_lines = [], []
    for line in plan.splitlines():
        low = line.strip()
        if "filescan parquet [" in low:
            cols = low.split("filescan parquet [", 1)[1].split("]", 1)[0]
            scan_cols.append(cols)
            scan_lines.append(low)
    for cols, low in zip(scan_cols, scan_lines):
        if "text#" in cols:  # a scan reading document text…
            assert "% 5) = 0" in low, low  # …is always the NEW snapshot
    joined = " ".join(scan_cols)
    assert "fp#" in joined, plan  # stored fingerprints scanned
    assert "band_sig#" in joined, plan  # stored signatures scanned
    assert any(
        "sh#" in c and "text#" not in c for c in scan_cols
    ), plan  # stored shingles scanned (never rebuilt from text)


def test_dedup_incremental_channels_and_priority(spark):
    """Channel semantics on a constructed corpus: byte-identical text →
    exact_dup (even though it would also LSH-match); identical shingle
    SET but different text → near_dup with jaccard 1.0 (deterministic:
    identical shingles ⇒ identical signatures ⇒ every band matches);
    no overlap → unique with match_id -1."""
    from readability_py_spark.operators.incremental import (
        build_corpus_index,
        dedup_incremental_from,
    )

    old = spark.createDataFrame(
        [(1, "a b c d"), (2, "p q p q p"), (3, "z z1 z2")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(10, "a b c d"), (20, "p q p q"), (30, "m n o")],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.verdict, r.match_id, r.jaccard)
        for r in dedup_incremental_from(new, *build_corpus_index(old)).collect()
    }
    assert got == {
        10: ("exact_dup", 1, 1.0),
        20: ("near_dup", 2, 1.0),
        30: ("unique", -1, 0.0),
    }


def test_range_join_end_bucket_collapses_aligned_windows(spark):
    """floor((start + w - 1) / w) is the bucket of the window's last
    contained second, so a bucket-aligned window must produce exactly
    one (bucket) row after array_distinct (advisor r5: the old
    floor((start+w)/w) was ALWAYS start's bucket + 1 and never
    collapsed)."""
    from readability_py_spark.operators.timeseries import RANGE_WINDOW_SEC

    w = RANGE_WINDOW_SEC
    df = spark.createDataFrame(
        [(0,), (w,), (w // 2,)], "start_sec long"
    ).select(
        "start_sec",
        F.array_distinct(
            F.array(
                F.floor(F.col("start_sec") / w),
                F.floor((F.col("start_sec") + w - 1) / w),
            )
        ).alias("buckets"),
    )
    got = {r.start_sec: list(r.buckets) for r in df.collect()}
    assert got[0] == [0]
    assert got[w] == [1]
    assert got[w // 2] == [0, 1]


# ---------------------------------------------------------------------------
# snapshot_diff (crawl delta)
# ---------------------------------------------------------------------------


def test_snapshot_diff_statuses_match_the_split_arithmetic(spark):
    """The deterministic snapshot synthesis pins every status class:
    doc_id %3==0 exists only in B (added), %3==1 only in A (removed),
    %3==2 in both — changed iff %SNAP_REV_MOD==0, else unchanged."""
    from readability_py_spark.operators.incremental import (
        SNAP_REV_MOD,
        q_snapshot_diff,
    )

    rows = q_snapshot_diff(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        want = (
            "added"
            if r.doc_id % 3 == 0
            else "removed"
            if r.doc_id % 3 == 1
            else ("changed" if r.doc_id % SNAP_REV_MOD == 0 else "unchanged")
        )
        assert r.status == want, (r.doc_id, r.status, want)
        assert (r.old_fp == "") == (r.status == "added")
        assert (r.new_fp == "") == (r.status == "removed")
        if r.status == "unchanged":
            assert r.old_fp == r.new_fp
        if r.status == "changed":
            assert r.old_fp != r.new_fp
    # the key space is the union of both snapshots, each key once
    ids = [r.doc_id for r in rows]
    assert len(ids) == len(set(ids))


def test_snapshot_diff_never_ships_text(spark):
    """Both sides reduce to (doc_id, md5) projections before the
    full-outer join: no text column may survive past the scans (at
    100 TB the diff moves fingerprints, never documents)."""
    from readability_py_spark.operators.incremental import q_snapshot_diff

    df = q_snapshot_diff(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().sparkPlan().toString()
    for line in plan.splitlines():
        if "SortMergeJoin" in line or "ShuffledHashJoin" in line:
            assert "text" not in line, line
    # join keys are the doc ids; the exchanged schema is id + one fp
    assert "FullOuter" in plan or "full_outer" in plan.lower(), plan


# ---------------------------------------------------------------------------
# decontaminate_bloom (broadcast-Bloom decontamination front)
# ---------------------------------------------------------------------------


def test_decontaminate_bloom_contract_vs_exact(spark):
    """The Bloom contract vs the driver-certified exact operator:
    zero false negatives (every exactly-contaminated doc is flagged)
    and a bounded doc-level false-positive rate at the documented
    sizing (~13 bits/gram, k=5)."""
    from readability_py_spark.operators.textstats import (
        q_decontaminate,
        q_decontaminate_bloom,
    )

    exact = {
        r.doc_id: r.contaminated
        for r in q_decontaminate(spark, SF_SMOKE).collect()
    }
    bloom = {
        r.doc_id: r.flagged
        for r in q_decontaminate_bloom(spark, SF_SMOKE).collect()
    }
    assert set(bloom) == set(exact)
    contaminated = {d for d, c in exact.items() if c}
    flagged = {d for d, f in bloom.items() if f}
    assert contaminated <= flagged  # no false negatives, ever
    clean = len(exact) - len(contaminated)
    fps = len(flagged - contaminated)
    assert fps <= max(1, int(0.05 * clean)), (fps, clean)


def test_decontaminate_bloom_corpus_side_is_exchange_free(spark, tmp_path):
    """Same shape guarantee as exact decontaminate: on a multi-split
    corpus the probe side is scan → in-row gram/probe expressions →
    broadcast join; only the tiny eval slice shuffles."""
    from readability_py_spark.operators.textstats import q_decontaminate_bloom
    from readability_py_spark.session import load_table

    sf = str(tmp_path)
    (
        load_table(spark, SF_SMOKE, "documents")
        .repartition(32)
        .write.parquet(f"{sf}/documents.parquet")
    )
    df = q_decontaminate_bloom(spark, sf)
    df.write.format("noop").mode("overwrite").save()
    plan = df._jdf.queryExecution().executedPlan().toString().lower()
    plan = plan.split("== initial plan ==")[0]
    assert "roundrobin" not in plan, plan
    assert "hashpartitioning(doc_id" not in plan, plan


# ---------------------------------------------------------------------------
# shuffle_shards (deterministic global shuffle + split)
# ---------------------------------------------------------------------------


def test_shuffle_shards_has_no_global_sort(spark):
    """The scale contract: shard positions come from per-(split, shard)
    windows, never a corpus-wide Window.orderBy (which collapses to one
    partition). The plan must carry a hash exchange on the window keys
    and no SinglePartition exchange anywhere."""
    from readability_py_spark.operators.packing import q_shuffle_shards

    df = q_shuffle_shards(spark, SF_SMOKE)
    # exchanges materialize in EnsureRequirements — read the executed
    # plan, not sparkPlan() (which still shows the bare Window)
    plan = _final_plan(df)
    assert "singlepartition" not in plan, plan
    assert "hashpartitioning(split" in plan, plan


def test_shuffle_shards_split_rates_and_contiguous_positions(spark):
    """90/5/5 hash split converges at corpus size, shard routing uses
    independent hash bits, and positions are a contiguous 1..n ranking
    inside every (split, shard) cell (the materialized shard order)."""
    from readability_py_spark.operators.packing import (
        SHUFFLE_SHARDS,
        q_shuffle_shards,
    )

    rows = q_shuffle_shards(spark, SF_SMOKE).collect()
    n = len(rows)
    assert n > 0
    frac_train = sum(r.split == "train" for r in rows) / n
    frac_val = sum(r.split == "val" for r in rows) / n
    assert 0.85 <= frac_train <= 0.95, frac_train
    assert 0.02 <= frac_val <= 0.09, frac_val
    cells: dict = {}
    for r in rows:
        assert 0 <= r.shard < SHUFFLE_SHARDS
        cells.setdefault((r.split, r.shard), []).append(r.pos)
    for key, poss in cells.items():
        assert sorted(poss) == list(range(1, len(poss) + 1)), key


# ---------------------------------------------------------------------------
# ngram_lm_score (corpus-trained bigram LM quality scoring)
# ---------------------------------------------------------------------------


def test_ngram_lm_score_shares_one_bigram_build(spark):
    """The exploded bigram relation feeds three consumers (bigram
    counts, context counts, the scoring side); the multi-reference rule
    demands ONE eager-persisted build, visible as >= 3 InMemoryTableScan
    consumers in the plan. No SinglePartition collapse anywhere."""
    from readability_py_spark.operators.lm import q_ngram_lm_score

    df = q_ngram_lm_score(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().sparkPlan().toString()
    assert plan.count("InMemoryTableScan") >= 3, plan
    assert "SinglePartition" not in plan, plan


def test_ngram_lm_score_is_a_real_lm(spark):
    """Sanity on the model semantics: every score is positive (it is a
    negative log of a probability < 1), a doc made entirely of the
    corpus's most common bigrams would score lower than a doc of
    singletons — proxied by checking the scores are not constant — and
    only docs with >= 2 tokens appear."""
    from readability_py_spark.operators.lm import q_ngram_lm_score

    rows = q_ngram_lm_score(spark, SF_SMOKE).collect()
    assert rows
    assert all(r.avg_nll > 0 for r in rows)
    assert all(r.n_bigrams >= 1 for r in rows)
    assert len({r.avg_nll for r in rows}) > 1


# ---------------------------------------------------------------------------
# hint placement: expensive builds must compute ABOVE the exchange
# ---------------------------------------------------------------------------


def _build_above_exchange(df, marker: str) -> None:
    """Assert the expensive-build marker expression sits ABOVE the
    parallelizing exchange in the physical plan (tree printing puts
    parents first, so the marker's first line index must be smaller).
    Guards the r6 hint-placement bug: a REPARTITION hint in the SAME
    select block as a CPU-heavy projection repartitions that block's
    OUTPUT, so the build computed below the exchange — serially on the
    single-split scan (the whole 17-20 s winnow build was one core).
    The hint must live in an inner subquery over the raw columns."""
    lines = _final_plan(df).splitlines()
    marker_i = [i for i, l in enumerate(lines) if marker in l]
    exchange_i = [i for i, l in enumerate(lines) if "exchange" in l]
    assert marker_i, "\n".join(lines)
    assert exchange_i, "hint did not fire on the single-split scan"
    assert min(marker_i) < min(exchange_i), "\n".join(lines)


def test_hinted_builds_run_above_the_exchange(spark):
    from readability_py_spark.operators.dedup import q_simhash_docs
    from readability_py_spark.operators.textstats import (
        q_quality_classifier,
        q_winnow_fingerprint,
    )

    # winnow: md5 gram build + the Generate carrying the normalized
    # text (the per-gram-lambda regexp hoist) both above the exchange
    df = q_winnow_fingerprint(spark, SF_SMOKE)
    _build_above_exchange(df, "md5")
    _build_above_exchange(df, "generate")
    _build_above_exchange(q_simhash_docs(spark, SF_SMOKE), "md5")
    _build_above_exchange(q_quality_classifier(spark, SF_SMOKE), "md5")


# ---------------------------------------------------------------------------
# late-r6 operators: boilerplate_lines + dsir_importance
# ---------------------------------------------------------------------------


def test_boilerplate_lines_shares_one_line_build(spark):
    """The exploded line relation feeds two consumers (frequency build
    + join-back) — the multi-reference rule demands ONE eager persist,
    visible as >= 2 InMemoryTableScans; the join-back must be an
    equi-join (never a nested loop over corpus lines)."""
    from readability_py_spark.operators.textstats import q_boilerplate_lines

    df = q_boilerplate_lines(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().sparkPlan().toString()
    assert plan.count("InMemoryTableScan") >= 2, plan
    assert "NestedLoop" not in plan, plan


def test_boilerplate_lines_finds_cross_doc_boilerplate(spark):
    """The sf0.001 corpus has measured cross-doc duplicate 3-word
    chunks within sources, so the operator must flag some docs while
    keeping the bounds sane (n_boiler <= n_lines, frac in [0, 1])."""
    from readability_py_spark.operators.textstats import q_boilerplate_lines

    rows = q_boilerplate_lines(spark, SF_SMOKE).collect()
    assert rows
    assert all(0 <= r.n_boiler <= r.n_lines for r in rows)
    assert all(0.0 <= r.boiler_frac <= 1.0 for r in rows)
    assert all(r.clean == (r.n_boiler == 0) for r in rows)
    assert any(not r.clean for r in rows)


def test_dsir_importance_model_is_broadcast_and_feats_shared(spark):
    """The exploded hashed-feature relation feeds five consumers
    (target counts, raw counts, two 1-row totals, the scoring side) —
    one eager persist (>= 4 InMemoryTableScans; Catalyst may merge the
    count-only subtrees) — and the fixed-size model (<= DSIR_BUCKETS
    rows) joins back as a BroadcastHashJoin: the corpus side never
    shuffles for the scoring join."""
    from readability_py_spark.operators.lm import q_dsir_importance

    df = q_dsir_importance(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().sparkPlan().toString()
    assert plan.count("InMemoryTableScan") >= 4, plan
    assert "BroadcastHashJoin" in plan, plan


def test_dsir_importance_weights_favor_the_target_slice(spark):
    """DSIR semantics: documents from the target distribution
    (lang='en') must average a strictly higher log importance weight
    than the rest of the corpus (measured +0.42 vs -1.80 at sf0.001)."""
    from readability_py_spark.operators.lm import (
        DSIR_TARGET_LANG,
        q_dsir_importance,
    )
    from readability_py_spark.session import load_table

    w = q_dsir_importance(spark, SF_SMOKE)
    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "lang")
    means = {
        r.is_t: r.m
        for r in w.join(docs, "doc_id")
        .groupBy((F.col("lang") == DSIR_TARGET_LANG).alias("is_t"))
        .agg(F.avg("log_iw").alias("m"))
        .collect()
    }
    assert means[True] > means[False] + 0.5, means


# ---------------------------------------------------------------------------
# bm25_search (full-text relevance top-k)
# ---------------------------------------------------------------------------


def test_bm25_search_plan_is_takeordered_and_shuffle_free(spark):
    """The scale contract: per-doc tf is in-row (no corpus explode), the
    corpus stats collapse to a broadcast 1-row aggregate, and the top-k
    is TakeOrderedAndProject — no hash exchange of doc rows anywhere
    (the only exchange is the 1-row stats agg's SinglePartition)."""
    from readability_py_spark.operators.search import q_bm25_search

    df = q_bm25_search(spark, SF_SMOKE)
    plan = _full_plan(df)
    assert "takeorderedandproject" in plan, plan
    assert "hashpartitioning" not in plan, plan
    assert "broadcastnestedloopjoin" in plan, plan  # 1-row stats side


def test_bm25_search_ranking_semantics(spark):
    """Every hit contains a query term, scores are positive and
    non-increasing in rank order, and a doc made rare-term-heavier
    ranks above one with the same tf of a common term (idf monotone)."""
    from readability_py_spark.operators.search import (
        BM25_TOP_K,
        QUERY_TERMS,
        q_bm25_search,
    )

    rows = q_bm25_search(spark, SF_SMOKE).collect()
    assert 0 < len(rows) <= BM25_TOP_K
    scores = [r.score for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(r.score > 0 and r.tf_total > 0 for r in rows)
    # returned docs genuinely contain a query term
    import duckdb

    ids = ",".join(str(r.doc_id) for r in rows)
    terms = " OR ".join(
        f"len(list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),"
        f" x -> x = '{t}')) > 0"
        for t in QUERY_TERMS
    )
    n_ok = duckdb.sql(
        f"SELECT count(*) FROM '{SF_SMOKE}/documents.parquet' "
        f"WHERE doc_id IN ({ids}) AND ({terms})"
    ).fetchone()[0]
    assert n_ok == len(rows)


# ---------------------------------------------------------------------------
# domain_mixture (temperature-smoothed source reweighting)
# ---------------------------------------------------------------------------


def test_domain_mixture_rebalances_toward_small_sources(spark):
    """Shares and target shares each sum to ~1, every source keeps a
    positive weight, and the alpha=0.5 rule upweights low-resource
    sources: weight order is the inverse of token-count order."""
    import duckdb

    from readability_py_spark.operators.packing import q_domain_mixture

    rows = q_domain_mixture(spark, SF_SMOKE).collect()
    assert len(rows) >= 2
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-2
    assert abs(sum(r.target_share for r in rows) - 1.0) < 1e-2
    assert all(r.weight > 0 for r in rows)
    by_tokens = sorted(rows, key=lambda r: r.n_tokens)
    weights = [r.weight for r in by_tokens]
    assert weights == sorted(weights, reverse=True), weights
    n_docs = duckdb.sql(
        f"SELECT count(*) FROM '{SF_SMOKE}/documents.parquet'"
    ).fetchone()[0]
    assert sum(r.n_docs for r in rows) == n_docs


# ---------------------------------------------------------------------------
# semdedup (IVF-cell semantic dedup, keeper-pool capped)
# ---------------------------------------------------------------------------


def test_semdedup_plan_broadcasts_pool_and_never_shuffles_vectors(spark):
    """The scale contract: cell assignment is map-only; the only
    full-corpus exchange is the keeper-pool rank window over the SLIM
    (vec_id, cell) projection; the pool (≤ cells × POOL rows) is
    broadcast into both its vector fetch and the comparison join, so
    the vector column never crosses a shuffle (no sort-merge join
    anywhere); the final window shuffles surviving candidates only."""
    from readability_py_spark.operators.similarity import q_semdedup

    df = q_semdedup(spark, SF_SMOKE)
    plan = _full_plan(df)
    assert plan.count("broadcasthashjoin") == 2, plan
    assert "sortmergejoin" not in plan, plan
    assert "hashpartitioning(cell" in plan, plan  # pool-rank window
    assert "hashpartitioning(vec_id" in plan, plan  # keeper-select window
    # the pool-rank window reads the persisted relation through the
    # slim 2-column projection, never the vectors
    slim = [
        ln
        for ln in plan.splitlines()
        if "inmemorytablescan" in ln and " v#" not in ln and "kv" not in ln
    ]
    assert slim, plan


def test_semdedup_drop_semantics(spark):
    """Every dropped row names an earlier-id keeper in the same cell at
    or above the threshold, and a vec_id is dropped at most once (the
    keeper is the minimal qualifying pool member)."""
    from readability_py_spark.operators.similarity import (
        SEMDEDUP_COS,
        q_semdedup,
    )

    rows = q_semdedup(spark, SF_SMOKE).collect()
    assert rows  # non-degenerate at the smoke SF
    assert all(r.keeper_id < r.vec_id for r in rows)
    assert all(r.cosine >= SEMDEDUP_COS for r in rows)
    ids = [r.vec_id for r in rows]
    assert len(ids) == len(set(ids))


# ---------------------------------------------------------------------------
# bpe_merge_step (distributed BPE tokenizer-training primitive)
# ---------------------------------------------------------------------------


def test_bpe_merge_step_plan_and_semantics(spark):
    """Top-k is TakeOrderedAndProject (never a global sort); the only
    exchanges are the word-freq and pair partial-aggs. Output: every
    merge candidate is a 2-char symbol pair, counts are positive and
    non-increasing, and word-final pairs (end-of-word marker) exist."""
    from readability_py_spark.operators.lm import (
        BPE_EOW,
        BPE_TOP_MERGES,
        q_bpe_merge_step,
    )

    df = q_bpe_merge_step(spark, SF_SMOKE)
    plan = _final_plan(df)
    assert "takeorderedandproject" in plan, plan
    assert plan.count("exchange hashpartitioning") <= 2, plan
    rows = df.collect()
    assert 0 < len(rows) <= BPE_TOP_MERGES
    assert all(len(r.pair) == 2 for r in rows)
    counts = [r.pair_count for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert all(c > 0 for c in counts)
    assert any(r.pair.endswith(BPE_EOW) for r in rows)


# ---------------------------------------------------------------------------
# url_blocklist (UT1-style policy gate)
# ---------------------------------------------------------------------------


def test_url_blocklist_plan_and_channels(spark):
    """The blocklist joins broadcast (never a corpus shuffle: no
    hashpartitioning anywhere — the whole gate is map-side), and both
    channels fire at the smoke SF: domain blocks, keyword blocks, and
    unblocked docs all present; domain wins the reason on overlap."""
    from readability_py_spark.operators.urls import (
        BLOCKED_HOSTS,
        q_url_blocklist,
    )

    df = q_url_blocklist(spark, SF_SMOKE)
    plan = _final_plan(df)
    assert "broadcasthashjoin" in plan, plan
    assert "hashpartitioning" not in plan, plan
    rows = df.collect()
    reasons = {r.reason for r in rows}
    assert reasons == {None, "domain", "keyword"}, reasons
    assert all((r.reason is not None) == r.blocked for r in rows)
    for r in rows:
        if r.host in set(BLOCKED_HOSTS):
            assert r.reason == "domain", r


# ---------------------------------------------------------------------------
# unicode_nfc (Arrow-vectorized NFC canonicalization)
# ---------------------------------------------------------------------------


def test_unicode_nfc_channels_and_plan(spark):
    """Map-only Arrow-UDF plan (ArrowEvalPython, zero exchanges on a
    pre-split input is covered by the maybe_parallelize gate tests) —
    and all three injection channels behave: decomposed docs change
    and SHRINK to their precomposed codepoint count, precomposed and
    raw-ASCII docs pass through unchanged."""
    from readability_py_spark.operators.textstats import q_unicode_nfc

    df = q_unicode_nfc(spark, SF_SMOKE)
    plan = _final_plan(df)
    assert "arrowevalpython" in plan, plan
    rows = df.collect()
    assert rows
    for r in rows:
        if r.doc_id % 3 == 0:
            assert r.changed and r.n_after < r.n_before, r
        else:
            assert not r.changed and r.n_after == r.n_before, r


# ---------------------------------------------------------------------------
# vocab_cardinality (+ HLL sketch twin)
# ---------------------------------------------------------------------------


def test_vocab_cardinality_approx_error_bound(spark):
    """The sketch contract (the price_quartiles_approx pattern): the
    HLL++ estimate tracks the exact distinct count within a small
    relative error at rsd=0.02 (3x headroom on the configured rsd),
    and the non-sketch column (n_tokens) is exactly equal."""
    from readability_py_spark.operators.textstats import (
        q_vocab_cardinality,
        q_vocab_cardinality_approx,
    )

    exact = {r.lang: r for r in q_vocab_cardinality(spark, SF_SMOKE).collect()}
    approx = {
        r.lang: r for r in q_vocab_cardinality_approx(spark, SF_SMOKE).collect()
    }
    assert set(exact) == set(approx) and len(exact) >= 3
    for lang, e in exact.items():
        a = approx[lang]
        assert a.n_tokens == e.n_tokens
        rel = abs(a.n_vocab_approx - e.n_vocab) / e.n_vocab
        assert rel <= 0.06, (lang, e.n_vocab, a.n_vocab_approx, rel)


# ---------------------------------------------------------------------------
# pdf_text_extract (PDF layout parse face)
# ---------------------------------------------------------------------------


def test_pdf_text_extract_parse_semantics(spark):
    """Map-only plan (no exchange of any kind) and real parse
    semantics: page census matches the synthesis arithmetic, the
    extracted text carries one show-text per page in document order,
    and version tracks doc parity."""
    from readability_py_spark.operators.multimodal import q_pdf_text_extract

    df = q_pdf_text_extract(spark, SF_SMOKE)
    plan = _final_plan(df)
    assert "exchange" not in plan, plan
    rows = df.collect()
    assert rows
    for r in rows:
        want_pages = r.doc_id % 3 + 1
        assert r.n_pages == want_pages, r
        assert r.pdf_version == ("1.4" if r.doc_id % 2 == 0 else "1.7"), r
        assert r.text.count(" page ") == want_pages, r
        for i in range(1, want_pages + 1):
            assert f"Doc {r.doc_id} page {i}" in r.text, r
        assert r.n_bytes > 80
