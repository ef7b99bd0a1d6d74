"""Text-operator unit tests (spread_scan et al.)."""


def test_spread_scan_conditional(spark):
    """spread_scan repartitions a below-core-count input up to core count
    (single-split local files serialize per-doc kernels) and is a NO-OP
    when the source already has >= cores partitions (at warehouse scale
    file splits provide the parallelism — no shuffle added)."""
    from dodo_spark.operators.text import spread_scan

    p = spark.sparkContext.defaultParallelism
    narrow = spark.range(100).coalesce(1)
    assert spread_scan(narrow).rdd.getNumPartitions() == p
    wide = spark.range(100).repartition(p + 4)
    out = spread_scan(wide)
    assert out.rdd.getNumPartitions() == p + 4
    assert out is wide  # no-op returns the input plan unchanged


def test_pack_sequences_accounting(spark, sf_dir):
    """Sequence packing invariants: per-lang token mass is conserved, a
    sequence never starts more docs than fit, split counts are sane, and
    seq ids tile the per-lang token stream contiguously from 0."""
    from pyspark.sql import functions as F

    from dodo_spark.catalog import load_table
    from dodo_spark.operators.text import (
        PACK_SEQ_TOKENS,
        _ws_tokens,
        corpus_pack_sequences,
    )

    out = corpus_pack_sequences(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents")
    truth = {
        r["lang"]: (r["toks"], r["n"])
        for r in docs.select("lang", F.size(_ws_tokens()).alias("t"))
        .filter(F.col("t") > 0)
        .groupBy("lang")
        .agg(F.sum("t").alias("toks"), F.count("*").alias("n"))
        .collect()
    }
    by_lang: dict = {}
    for r in out:
        by_lang.setdefault(r["lang"], []).append(r)
    assert set(by_lang) == set(truth)
    for lang, rows in by_lang.items():
        toks, n_docs = truth[lang]
        assert sum(r["tokens_started"] for r in rows) == toks  # conservation
        assert sum(r["docs_started"] for r in rows) == n_docs
        seqs = sorted(r["seq_id"] for r in rows)
        # every sequence the stream touches has at least one doc START or
        # is fully covered by a long doc spanning it; started seqs are a
        # subset of 0..n_seq-1 with the first always 0
        assert seqs[0] == 0
        assert seqs[-1] <= (toks - 1) // PACK_SEQ_TOKENS
        for r in rows:
            assert 0 <= r["split_docs"] <= r["docs_started"]


def test_mix_waterfill_invariants(spark, sf_dir):
    """Waterfilling invariants: takes never exceed availability, saturated
    domains give everything, the budget is filled to within flooring slack,
    and unsaturated takes are weight-proportional."""
    from dodo_spark.operators.text import corpus_mix_waterfill

    rows = corpus_mix_waterfill(spark, sf_dir).collect()
    budget = sum(r["avail_tokens"] for r in rows) // 2
    take_sum = sum(r["take_tokens"] for r in rows)
    assert budget - len(rows) <= take_sum <= budget
    unsat = []
    for r in rows:
        assert 0 <= r["take_tokens"] <= r["avail_tokens"]
        if r["saturated"]:
            assert r["take_tokens"] == r["avail_tokens"]
        else:
            unsat.append(r)
    assert unsat, "some domain must be unsaturated (budget < total)"
    # weight-proportional within integer flooring: take/weight equal ±1 unit
    levels = [r["take_tokens"] / r["target_weight"] for r in unsat]
    assert max(levels) - min(levels) <= 1 / min(r["target_weight"] for r in unsat)


def test_waterfill_matches_python_reference_randomized(spark):
    """Property check of the waterfilling closed form against a greedy
    pure-Python reference over randomized domain mixes: identical takes
    and saturation flags on every case, including all-saturated-but-one,
    tiny budgets, and ratio ties."""
    import random

    from dodo_spark.operators.text import waterfill_allocate

    def ref(avail: dict, w: dict, b: int):
        items = sorted(avail, key=lambda d: (avail[d] / w[d], d))
        sat, prefix = set(), 0
        suffix_w = sum(w.values())
        for d in items:
            if avail[d] * suffix_w < (b - prefix) * w[d]:
                sat.add(d)
                prefix += avail[d]
                suffix_w -= w[d]
            else:
                break  # ratios ascend: once one holds, the rest hold
        out = {}
        unsat_w = sum(w[d] for d in avail if d not in sat)
        remaining = b - prefix
        for d in avail:
            out[d] = (
                (avail[d], True)
                if d in sat
                else (remaining * w[d] // unsat_w, False)
            )
        return out

    rng = random.Random(42)
    for case in range(12):
        n = rng.randint(2, 6)
        doms = [f"d{i}" for i in range(n)]
        avail = {d: rng.randint(1, 10_000) for d in doms}
        w = {d: rng.randint(1, 500) for d in doms}
        total = sum(avail.values())
        b = rng.randint(1, max(1, total - 1))  # budget < total: >=1 unsat
        adf = spark.createDataFrame(
            [(d, avail[d], w[d]) for d in doms],
            "lang STRING, avail_tokens BIGINT, w BIGINT",
        )
        bdf = spark.createDataFrame([(b,)], "b BIGINT")
        got = {
            r["lang"]: (r["take_tokens"], r["saturated"])
            for r in waterfill_allocate(adf, bdf).collect()
        }
        assert got == ref(avail, w, b), f"case {case}: avail={avail} w={w} b={b}"
