"""Physical-plan shape regression tests — the 100 TB posture, asserted.

Correctness tests say the answer is right at sf0.01; these say the *plan*
is the one that survives a 1000-executor / 100 TB scale-up:

- filters reach the parquet scan (PushedFilters non-empty),
- projections prune the scan (ReadSchema carries only needed columns),
- dimension joins broadcast (no shuffle of the fact table's join key),
- no accidental CartesianProduct anywhere,
- no row-at-a-time Python UDF (BatchEvalPython) in any plan,
- aggregations are two-phase (map-side partial combine).

Each assertion mirrors a bullet in SCALE.md.
"""

from __future__ import annotations

import contextlib
import io

import pytest

from dodo_spark import registry

ALL = registry.queries()


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def plans(spark, sf_dir):
    cache: dict[str, str] = {}

    def get(name: str) -> str:
        if name not in cache:
            cache[name] = plan_of(ALL[name](spark, sf_dir))
        return cache[name]

    return get


def test_filter_pushdown_reaches_scan(plans):
    plan = plans("scan_project_filter")
    assert "PushedFilters: [" in plan
    # at least one concrete pushed predicate, not an empty list
    assert "PushedFilters: []" not in plan


def test_column_pruning(plans):
    plan = plans("scan_project_filter")
    # the lineitem scan must not read all 16 columns; ReadSchema should
    # carry only the handful the query touches
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert read_schema, plan
    assert all(line.count(",") < 8 for line in read_schema), read_schema


@pytest.mark.parametrize(
    "name",
    [
        "join_inner", "join_left", "join_semi", "join_anti", "subquery_in",
        "analytics_shipping_priority", "analytics_revenue_by_nation",
    ],
)
def test_dim_joins_broadcast(plans, name):
    """nation/region/supplier-sized sides must broadcast — shuffling the
    fact table on a join key a broadcast would avoid is the #1 scale bug."""
    assert "BroadcastHashJoin" in plans(name)


def test_full_outer_is_sort_merge(plans):
    # large-large full outer cannot broadcast; SMJ (or shuffled hash) is
    # the correct shape — and definitely not a nested loop
    plan = plans("join_full")
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan


@pytest.mark.parametrize("name", sorted(ALL))
def test_no_cartesian_product(plans, name):
    plan = plans(name)
    if name == "join_cross":  # the one deliberate cross join (A4)
        return
    assert "CartesianProduct" not in plan, name


@pytest.mark.parametrize("name", sorted(ALL))
def test_no_row_at_a_time_python(plans, name):
    """Python in the hot path must be Arrow-batched (ArrowEvalPython /
    mapInPandas), never per-row BatchEvalPython."""
    assert "BatchEvalPython" not in plans(name), name


# Global windows over PROVABLY BOUNDED frames (post-aggregate tables whose
# row count is a domain cardinality, not data volume) — same class as the
# 1-row BNLJ broadcasts:
#   corpus_resample_importance  SUM() OVER () on the per-lang plan table
#   source_jsonl_corpus         corrupt-line total over the per-lang rollup
#   corpus_mix_waterfill        prefix/suffix sums over the per-domain frame
GLOBAL_WINDOW_ALLOWED = {
    "corpus_resample_importance",
    "source_jsonl_corpus",
    "corpus_mix_waterfill",
}


@pytest.mark.parametrize("name", sorted(ALL))
def test_no_global_window(plans, name):
    """No registered plan may contain a Window with empty partitionBy — that
    funnels every row into ONE task (the analytics_top_supplier round-1 bug).
    In formatted explain a fully-specified Window's Arguments line carries
    three bracketed lists ([funcs], [partSpec], [orderSpec]); two lists is
    ambiguous (either partition-only — fine — or order-only — the bug), so
    the tiebreaker is whether the plan funnels into a SinglePartition
    exchange (formatted mode renders it on the Exchange's Arguments line —
    the old 'Exchange SinglePartition' single-line form never appears there,
    which made the original assertion vacuous)."""
    if name in GLOBAL_WINDOW_ALLOWED:
        return
    plan = plans(name)
    for line in plan.splitlines():
        if "windowspecdefinition" in line and line.strip().startswith("Arguments:"):
            if line.count("], [") < 2:
                assert "SinglePartition" not in plan, (name, line)


# Non-equi/broadcast-nested-loop joins that are deliberate:
#   join_cross        A4, the cross-join operator itself
#   dedup_embedding   brute-force oracle baseline, hard-gated at
#                     EMBEDDING_BRUTE_MAX_ROWS (scale path: similarity_lsh)
#   dedup_ngram       brute-force tier bounded to the oracle subset
#                     (scale path for the same measure: dedup_near)
#   similarity_topk   broadcasts the tiny query side over the corpus scan —
#                     the corpus never shuffles, which IS the scale shape
#   stats_histogram   1-row min/max broadcast crossJoin
#   analytics_inactive_rich  1-row global-average broadcast crossJoin (Q22)
BNLJ_ALLOWED = {
    "join_cross",
    "dedup_embedding",
    "dedup_ngram",
    "similarity_topk",
    "similarity_knn_classify",  # composes similarity_topk's broadcast-query scan
    "stats_histogram",
    "analytics_inactive_rich",
    "events_intersect_count",  # 1-row broadcast global-type-count cross join
    # contract row assembly: brute-force reference (bounded broadcast-query
    # scan, same shape as similarity_topk) + 1-row aggregate cross joins
    "similarity_ivf_kmeans",
    "dedup_simhash_capped",  # 1-row skipped-mass audit broadcast cross join
    "search_hybrid_rrf",  # 1-row broadcast probe-embedding cross join
    "similarity_pq",  # bounded broadcast-query ADC scan + contract cross joins
    "text_cooccur",  # 1-row doc-count broadcast cross join onto the pair list
    # grid-bounded triangular join of coarse-block totals (two-phase prefix
    # sum) + 1-row total-count broadcast
    "stats_equidepth",
    # Q11: 1-row global supply-total broadcast cross join (the scalar
    # subquery bound), same class as analytics_inactive_rich
    "analytics_important_stock",
    # 1-row global token-count broadcast onto the candidate recount (the
    # n/k heavy-hitter threshold)
    "agg_heavy_hitters",
    # 1-row digit-total broadcast onto the 9-row Benford expectation
    "stats_benford",
    # 1-row actual-join-count broadcast onto each sampled estimate row
    "profile_join_cardinality",
    # 1-row tercile-boundary broadcast onto the per-customer metrics
    "analytics_rfm_segments",
    # 1-row node-count broadcast into each PageRank iteration (the
    # teleport term (1-d)/N)
    "graph_pagerank",
    # 1-row corpus-global minTs broadcast onto the decoded statements
    # (each client's first statement is scheduled from the corpus start —
    # src/replay.go:220-240's minTs rule)
    "replay_speed",
    # 1-row x 1-row group-moment broadcast join (the two-sample combine)
    "stats_ttest",
    # 1-row cross-split-pair-count broadcast (the no_leakage contract)
    "split_leakage_safe",
    # 1-row (n, k) totals broadcast onto the k-row observed counts
    "stats_chi_square",
    # r5: the IVF centroid array rides a 1-row broadcast crossJoin
    # (_centroid_frame — scan-side cell assignment with codegen-cacheable
    # source; the literal-expression form recompiled ~2s/call)
    "similarity_ivf",
    "similarity_ivf_pruned",
    "ann_dispatch",
    # r6: same 1-row centroid broadcast, plus versioned-index read-back
    "similarity_ivf_append",
    # r6: 1-row token-budget broadcast onto the <=n_domains mixture rows
    "corpus_mix_waterfill",
    # r6 closing batch: 1-row sqrt-mass total broadcast onto the <=n_sources
    # mixture rows (temperature weights)
    "corpus_mix_temperature",
    # r6 closing batch: 1-row support-total broadcast onto the pair list
    # (the scale-free edge threshold) + 1-row scalar-assembly cross joins
    "graph_triangles",
    # r7: 1-row limiting-domain + tie-min broadcasts onto the <=n_domains
    # plan rows (mixture execution)
    "corpus_resample_importance",
    # r7: 4-row threshold-literal + 1-row totals broadcasts onto the
    # |classes|-row equivalence-class table
    "profile_k_anonymity",
    # r7: the similarity_ivf 1-row centroid broadcast, reused for the
    # SemDeDup cell assignment
    "dedup_semantic_cells",
    # r7: same bounded threshold/totals broadcasts as profile_k_anonymity
    "profile_l_diversity",
    # r7: 1-row stage-count broadcasts assembling the 2-row report
    "corpus_dedup_funnel",
    # r7: the 1-row bloom-bitmap broadcast onto the fact scan
    "join_bloom_prune",
    # r7: 1-row theta/exact-count broadcasts assembling the sketch report
    "agg_kmv_theta",
    # r7: 1-row pooled-moments broadcast onto the 2-variant report
    "events_cuped",
    # r7: the 3-row query-vector broadcast of the D7 scoring kernel
    "similarity_mmr",
    # r7: 1-row checked-count broadcasts assembling the report rows
    "profile_expectations",
    # r7: the 1-row chosen-level broadcast onto the 7-level ladder report
    "anonymize_k_generalize",
}


@pytest.mark.parametrize("name", sorted(ALL))
def test_no_unbounded_nested_loop_join(plans, name):
    """Any BroadcastNestedLoopJoin outside the explicit whitelist is an
    accidental O(n*m) plan."""
    if name in BNLJ_ALLOWED:
        return
    assert "BroadcastNestedLoopJoin" not in plans(name), name


def test_text_match_tokens_filters_postings_before_any_exchange(plans):
    """The inverted-index MATCH key must filter the exploded posting list
    SCAN-SIDE: in formatted explain (ids increase bottom-up from the scan)
    the term Filter must sit between Generate and the first Exchange —
    shuffling unfiltered postings would move the whole token stream."""
    import re

    plan = plans("text_match_tokens")
    ids = {}
    for m in re.finditer(r"^\s*(?:[+\-:*\s]*)\((\d+)\)\s+(\w+)", plan, re.M):
        ids.setdefault(m.group(2), []).append(int(m.group(1)))
    assert "Generate" in ids and "Filter" in ids and "Exchange" in ids, sorted(ids)
    gen = min(ids["Generate"])
    tok_filter = min(i for i in ids["Filter"] if i > gen)
    first_exchange = min(ids["Exchange"])
    assert gen < tok_filter < first_exchange, (gen, tok_filter, first_exchange)
    # and the whole key needs exactly the two aggregate exchanges
    assert len(set(ids["Exchange"])) == 2, ids["Exchange"]


def test_text_match_phrase_single_posting_exchange(plans):
    """MATCH_PHRASE must keep the no-self-join shape: the phrase-term
    Filter sits between Generate and the first Exchange (only the two
    terms' positional postings shuffle), there is NO join operator at
    all (adjacency resolves via per-doc position-set intersection inside
    one aggregate), and the key pays exactly the two aggregate
    exchanges."""
    import re

    plan = plans("text_match_phrase")
    assert "Join" not in plan, plan
    ids = {}
    for m in re.finditer(r"^\s*(?:[+\-:*\s]*)\((\d+)\)\s+(\w+)", plan, re.M):
        ids.setdefault(m.group(2), []).append(int(m.group(1)))
    gen = min(ids["Generate"])
    tok_filter = min(i for i in ids["Filter"] if i > gen)
    first_exchange = min(ids["Exchange"])
    assert gen < tok_filter < first_exchange, (gen, tok_filter, first_exchange)
    assert len(set(ids["Exchange"])) == 2, ids["Exchange"]


@pytest.mark.parametrize("name", ["agg_group", "agg_distinct", "dedup_exact"])
def test_two_phase_aggregation(plans, name):
    """Partial (map-side) + final HashAggregate — the combine must happen
    before the shuffle or the shuffle carries every input row."""
    plan = plans(name)
    assert plan.count("HashAggregate") >= 2, name


@pytest.mark.parametrize("name", ["dedup_near", "similarity_lsh"])
def test_lsh_joins_are_bucketed_not_cross(plans, name):
    """The LSH tiers exist to avoid the O(n²) pair scan; their joins must
    be equi-joins on the band/bucket key."""
    plan = plans(name)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_whole_stage_codegen_on_hot_path(spark, sf_dir):
    # "formatted" under AQE hides codegen spans; "codegen" mode lists the
    # generated subtrees — the agg pipeline must be inside one
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        ALL["agg_group"](spark, sf_dir).explain("codegen")
    assert "WholeStageCodegen" in buf.getvalue()


def test_bucketed_join_is_shuffle_free(spark, sf_dir):
    """Both fact tables bucketed on the join key -> the join plan has no
    Exchange: the Doris DISTRIBUTED BY analogue actually removes the
    shuffle (SCALE.md §2)."""
    from dodo_spark.catalog import load_table
    from dodo_spark.sources.writers import write_bucketed

    write_bucketed(load_table(spark, sf_dir, "orders"), "orders_b", 4, ["o_orderkey"])
    write_bucketed(
        load_table(spark, sf_dir, "lineitem"), "lineitem_b", 4, ["l_orderkey"]
    )
    # disable broadcast: at 100 TB neither fact side broadcasts — this is
    # exactly the case bucketing exists for
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("orders_b").join(
            spark.table("lineitem_b"),
            spark.table("orders_b").o_orderkey == spark.table("lineitem_b").l_orderkey,
        )
        plan = plan_of(joined)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "Exchange" not in plan, plan
    assert "SortMergeJoin" in plan
    for t in ("orders_b", "lineitem_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


@pytest.mark.parametrize("hint,expect", [("broadcast", True), ("shuffle", False)])
def test_join_hint_flips_strategy(spark, sf_dir, hint, expect):
    """A7 distributeType surface: [broadcast] pins BroadcastHashJoin even
    with auto-broadcast off; [shuffle] suppresses it even for a tiny side
    (reference DorisParser.g4:1229-1238)."""
    from dodo_spark.catalog import load_table
    from dodo_spark.operators.relational import hinted_join

    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    # broadcast hint must override a disabled threshold; shuffle hint must
    # override an auto-broadcast-eligible side
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1" if hint == "broadcast" else "10485760")
    try:
        plan = plan_of(hinted_join(s, n, s.s_nationkey == n.n_nationkey, distribute=hint))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert ("BroadcastHashJoin" in plan) is expect, plan


def test_join_hint_unknown_rejected(spark, sf_dir):
    from dodo_spark.catalog import load_table
    from dodo_spark.operators.relational import hinted_join

    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    with pytest.raises(ValueError, match="distribution hint"):
        hinted_join(s, n, s.s_nationkey == n.n_nationkey, distribute="colocate")


def test_analytics_dim_hint_threads_through(spark, sf_dir):
    from dodo_spark.operators.analytics import analytics_revenue_by_nation

    plan = plan_of(analytics_revenue_by_nation(spark, sf_dir, dim_hint="shuffle"))
    assert "ShuffledHashJoin" in plan, plan


def test_ivf_pruned_reads_only_probed_partitions(spark, sf_dir):
    """The IVF serving path must push the probe-cell list into
    PartitionFilters — each query touches N_PROBE directories, not the
    corpus."""
    from dodo_spark.operators.similarity import similarity_ivf_pruned

    plan = plan_of(similarity_ivf_pruned(spark, sf_dir))
    pf = [l for l in plan.splitlines() if "PartitionFilters" in l and "cell" in l]
    assert pf and any(" IN " in l for l in pf), plan


def test_market_share_reuses_nat_exchange(spark, sf_dir):
    """The per-(year,nation) aggregate feeds BOTH the total branch and the
    share join; Spark must compute it once (ReusedExchange on the second
    consumer), not re-scan lineitem twice. AQE finalizes reuse at runtime,
    so assert on the executed plan."""
    from dodo_spark.operators.analytics import analytics_market_share

    df = analytics_market_share(spark, sf_dir)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in plan, plan


def test_lm_novelty_topk_is_take_ordered(plans):
    """text_lm_novelty's final top-k must compile to TakeOrderedAndProject
    (per-partition partial top-k + merge), not a global sort or a
    single-partition window — the claim its docstring makes for the
    100 TB posture."""
    plan = plans("text_lm_novelty")
    assert "TakeOrderedAndProject" in plan, plan


def test_join_bucketed_key_join_is_exchange_free(spark, sf_dir):
    """The oracle-checked join_bucketed key must actually exercise the
    bucket layout: its fact-fact join subtree plans with zero Exchange
    (the only shuffle in the full key is the final aggregate)."""
    from dodo_spark.operators.relational import bucketed_fact_join

    plan = plan_of(bucketed_fact_join(spark, sf_dir))
    assert "SortMergeJoin" in plan, plan
    assert "Exchange" not in plan, plan


@pytest.mark.parametrize("name", sorted(ALL))
def test_registry_plans_lint_error_free(plans, name):
    """The plan-lint CLI's error-severity checks (cartesian, row-Python
    UDF, global window) must hold for every registered key — the linter
    and the registry enforce the same contract, so a key the linter
    would reject is a regression in either the key or the linter."""
    from dodo_spark.plans.lint import lint_plan_text

    errors = [
        f
        for f in lint_plan_text(plans(name))
        if f["severity"] == "error"
        and not (f["code"] == "GLOBAL_WINDOW" and name in GLOBAL_WINDOW_ALLOWED)
    ]
    assert not errors, (name, errors)


def test_bpe_encode_single_scan_no_udf(plans):
    """text_bpe_encode's dictionary-trick claim: ONE corpus scan (the
    merge-replace chain runs on post-aggregation vocabulary rows, so
    Catalyst must not clone a second scan branch), pure codegen string
    ops (no Python boundary), and no join operator at all."""
    import re

    plan = plans("text_bpe_encode")
    # count scan NODES (the formatted plan prints each node once in the
    # tree and once in the detail section)
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1, plan
    for marker in ("ArrowEvalPython", "BatchEvalPython", "Join"):
        assert marker not in plan, (marker, plan)


def test_simhash_stats_kernel_materialized_once(spark, sf_dir):
    """r14 third session: AQE broadcasts the banded posting side of the
    simhash self-join, so without a materialization the mapInArrow vote
    kernel would run once per join side AND the pair enumeration would
    read an AQE-coalesced (bytes-sized, ~1-partition) probe at scale.
    The eager checkpoint in _dedup_simhash_shared is the guard: the
    executed stats plan must read the fingerprint frame as an RDD scan
    and contain NO MapInArrow (the kernel ran once, in the checkpoint
    job), and the probe side must keep the spread scan's parallelism."""
    import re

    from dodo_spark.operators.dedup import dedup_simhash_stats

    df = dedup_simhash_stats(spark, sf_dir)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "MapInArrow" not in plan, plan
    assert re.search(r"Scan ExistingRDD", plan), plan
