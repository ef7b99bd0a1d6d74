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


def test_est_scan_splits_matches_real_partitions(spark, tmp_path):
    """r14 (r13 advisor): the file-size split estimate must mirror
    FilePartition's BIN-PACKING, not per-file ceil — on a many-small-
    files input the old estimate exceeded the real partition count and
    spread_scan silently skipped the repartition. Pin the estimate to
    Spark's actual scan partitioning for one-big-file and
    many-small-files shapes."""
    from dodo_spark.operators.text import _est_scan_splits

    p = spark.sparkContext.defaultParallelism
    one = str(tmp_path / "one")
    spark.range(50000).coalesce(1).write.parquet(one)
    many = str(tmp_path / "many")
    spark.range(20000).repartition(24).write.parquet(many)
    for path in (one, many):
        df = spark.read.parquet(path)
        est = _est_scan_splits(df, p)
        real = df.rdd.getNumPartitions()
        assert est == real, (path, est, real)


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


def test_lm_novelty_scoring_invariants(spark, sf_dir):
    """LM-novelty: every flagged doc has >= 1 bigram, avg_df is exactly
    sum_df/n_bigrams (one IEEE division), output ascends by avg_df with
    doc_id tiebreak, and df-mass is consistent (a doc's sum_df is at
    least n_bigrams — every bigram occurs in at least its own doc)."""
    from dodo_spark.operators.text import NOVELTY_TOPK, text_lm_novelty

    rows = text_lm_novelty(spark, sf_dir).collect()
    assert 0 < len(rows) <= NOVELTY_TOPK
    prev = None
    for r in rows:
        assert r["n_bigrams"] >= 1
        assert r["sum_df"] >= r["n_bigrams"]
        assert r["avg_df"] == r["sum_df"] / r["n_bigrams"]
        key = (r["avg_df"], r["doc_id"])
        assert prev is None or prev < key
        prev = key


def test_mix_temperature_upsamples_low_resource(spark, sf_dir):
    """Temperature mixture (alpha=0.5): weights sum to ~1, every source's
    weight share exceeds its token share iff it is below-average sized
    (the low-resource upsampling property), and epochs = budget*w/n."""
    from dodo_spark.operators.text import MIX_BUDGET, corpus_mix_temperature

    rows = corpus_mix_temperature(spark, sf_dir).collect()
    assert len(rows) >= 2
    tot_tokens = sum(r["n_tokens"] for r in rows)
    wsum = sum(r["weight"] for r in rows)
    assert abs(wsum - 1.0) < 1e-9
    for r in rows:
        share = r["n_tokens"] / tot_tokens
        # sqrt temperature: weight/share = (1/sqrt(n_i)) / (sum sqrt / tot)
        # => weight > share iff n_i < (tot / sum_sqrt)^2 (below pivot size)
        assert r["epochs"] == (MIX_BUDGET * r["weight"]) / r["n_tokens"]
        if share < min(x["n_tokens"] for x in rows) / tot_tokens + 1e-12:
            assert r["weight"] >= share  # smallest source is upsampled
    big = max(rows, key=lambda r: r["n_tokens"])
    assert big["weight"] <= big["n_tokens"] / tot_tokens + 1e-12  # downsampled


def test_graph_triangles_invariants(spark, sf_dir):
    """Triangle counting: the support filter keeps a PROPER sparse subgraph
    (not the near-complete raw co-occurrence clique), counts are mutually
    consistent (3*triangles <= wedges holds by closure), and clustering is
    the single exact division."""
    from dodo_spark.operators.graph import graph_triangles

    r = graph_triangles(spark, sf_dir).collect()[0]
    max_edges = r["n_nodes"] * (r["n_nodes"] - 1) // 2
    assert 0 < r["n_edges"] < max_edges  # sparse: threshold dropped pairs
    assert 3 * r["n_triangles"] <= r["n_wedges"]
    assert r["n_triangles"] > 0
    assert r["global_clustering"] == 3 * r["n_triangles"] / r["n_wedges"]


def _docs_fixture(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows, "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
    )
    d = str(tmp_path)
    df.coalesce(1).write.parquet(f"{d}/documents.parquet")
    return d


def _fixture_oracle(d, sql):
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet/*.parquet')"
    )
    return con.sql(sql).df()


def test_filter_funnel_every_stage_drops(spark, tmp_path):
    """Crafted corpus where each of the six cascade rules drops at least
    one doc — proves attrition attributes to the FIRST failing rule (a
    doc failing several rules counts only once) and stays hash-identical
    to the oracle on all branches."""
    from dodo_spark import registry
    from tests.parity import assert_parity

    rows = [
        (0, "short", "en", "web", 5),                                  # min_chars
        (1, "word " * 25000, "en", "web", 125000),                     # max_chars
        (2, "alpha beta gamma delta", "en", "web", 22),                # min_tokens
        (3, "abcdefghijklmnop abcdefghijklmnopq supercalifragilistic "
            "extraordinarily incomprehensibilities", "en", "web", 95), # mean high
        (4, "a b c d e f g h i j k l", "en", "web", 23),               # mean low
        (5, "!!!! ???? $$$$ %%%% word word2 word3", "en", "web", 36),  # symbols
        (6, "dup dup dup dup dup dup dup dup", "en", "web", 31),       # ttr
        (7, "the quick brown fox jumps over the lazy dog today",
            "en", "web", 49),                                          # survivor
    ]
    d = _docs_fixture(spark, tmp_path, rows)
    got = registry.queries()["corpus_filter_funnel"](spark, d)
    rep = {r["stage"]: (r["evaluated"], r["dropped"], r["surviving"])
           for r in got.collect()}
    assert rep == {
        1: (8, 1, 7), 2: (7, 1, 6), 3: (6, 1, 5),
        4: (5, 2, 3), 5: (3, 1, 2), 6: (2, 1, 1),
    }
    assert_parity(
        got,
        _fixture_oracle(d, registry.oracle_sql()["corpus_filter_funnel"]),
        "funnel_fixture",
    )


def test_bpe_pairs_multibyte_and_ranking(spark, tmp_path):
    """Character (not byte) pair semantics on multibyte text, total
    ranking under count ties, and lowercasing — identical across
    engines."""
    from dodo_spark import registry
    from tests.parity import assert_parity

    rows = [
        (0, "héllo héllo", "fr", "web", 11),
        (1, "héllo 世界语 ZZ zz", "zh", "web", 14),
    ]
    d = _docs_fixture(spark, tmp_path, rows)
    got = registry.queries()["text_bpe_pairs"](spark, d)
    by_pair = {r["pair"]: (r["rank"], r["n"]) for r in got.collect()}
    assert by_pair["hé"] == (1, 3)          # multibyte pair, count 3
    assert by_pair["zz"][1] == 2            # ZZ + zz lowercased together
    assert by_pair["世界"][1] == 1          # CJK adjacent pair, char-based
    ranks = [r["rank"] for r in got.orderBy("rank").collect()]
    assert ranks == list(range(1, len(ranks) + 1))  # total, gap-free
    assert_parity(
        got,
        _fixture_oracle(d, registry.oracle_sql()["text_bpe_pairs"]),
        "bpe_fixture",
    )


def test_resample_importance_invariants(spark, sf_dir):
    """The limiting domain keeps every doc; every other domain never
    exceeds its target take; the hash gate is deterministic (two runs
    agree) and kept counts track take within the O(sqrt(n)) jitter the
    doc promises."""
    from dodo_spark import registry

    fn = registry.queries()["corpus_resample_importance"]
    rows = {r["lang"]: r for r in fn(spark, sf_dir).collect()}
    limiting = [r for r in rows.values() if r["limiting"]]
    assert len(limiting) == 1
    lim = limiting[0]
    assert lim["kept_docs"] == lim["take_docs"] == lim["n_docs"]
    for r in rows.values():
        assert r["take_docs"] <= r["n_docs"]
        jitter = 4 * max(1, int(r["n_docs"] ** 0.5))
        assert abs(r["kept_docs"] - r["take_docs"]) <= jitter, r
    again = {r["lang"]: r for r in fn(spark, sf_dir).collect()}
    assert {k: v["kept_docs"] for k, v in rows.items()} == {
        k: v["kept_docs"] for k, v in again.items()
    }


def test_ngram_lm_counts_known_fixture(spark, tmp_path):
    """Hand-checkable Kneser-Ney inputs: counts, left-context diversity
    (distinct predecessors of w2 anywhere in the corpus), right-context
    diversity — and oracle parity on the same fixture."""
    from dodo_spark import registry
    from tests.parity import assert_parity

    rows = [
        (0, "a b a b c", "en", "web", 9),
        (1, "x b", "en", "web", 3),
    ]
    d = _docs_fixture(spark, tmp_path, rows)
    got = registry.queries()["text_ngram_lm_counts"](spark, d)
    by_pair = {(r["w1"], r["w2"]): r for r in got.collect()}
    top = by_pair[("a", "b")]
    assert top["rank"] == 1 and top["n"] == 2
    assert top["left_contexts"] == 2   # b follows both 'a' and 'x'
    assert top["right_contexts"] == 1  # 'a' is only ever followed by 'b'
    assert by_pair[("b", "c")]["n"] == 1
    assert_parity(
        got,
        _fixture_oracle(d, registry.oracle_sql()["text_ngram_lm_counts"]),
        "lm_counts_fixture",
    )


def test_match_phrase_exact_adjacency(spark, tmp_path):
    """MATCH_PHRASE semantics on crafted docs: adjacency required (both
    terms present but separated ≠ match; reversed order ≠ match),
    multiple occurrences counted exactly, case-insensitive, and the
    per-lang rollup splits docs/hits correctly. Cross-checked against
    the registered DuckDB oracle on the same fixture."""
    from dodo_spark.operators.relational import text_match_phrase
    from tests.parity import assert_parity

    rows = [
        (1, "a table hash b", "en", "s", 14),          # one hit
        (2, "table hash x table hash", "en", "s", 23), # two hits, one doc
        (3, "table x hash", "en", "s", 12),            # separated: no
        (4, "hash table", "en", "s", 10),              # reversed: no
        (5, "TABLE HASH", "de", "s", 10),              # case-folded hit
        (6, "nothing here", "fr", "s", 12),            # neither term
    ]
    d = _docs_fixture(spark, tmp_path, rows)
    got = {
        r["lang"]: (r["phrase_docs"], r["phrase_hits"])
        for r in text_match_phrase(spark, d).collect()
    }
    assert got == {"en": (2, 3), "de": (1, 1)}

    from dodo_spark.registry import REGISTRY

    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{d}/documents.parquet/*.parquet')"
    )
    assert_parity(
        text_match_phrase(spark, d),
        con.sql(REGISTRY["text_match_phrase"].oracle).df(),
        "text_match_phrase@fixture",
    )


def test_word_ngrams_null_and_short_text_yield_empty_array(spark):
    """r11 advisor: the zip_with-folded n-gram build must keep the
    documented contract for NULL text — an EMPTY array, not NULL (the
    greatest() clamp skips a NULL size but slice/zip_with propagate NULL
    without the coalesce). Short docs (< n tokens) stay empty too."""
    from pyspark.sql import functions as F

    from dodo_spark.operators.text import NGRAM_N, _word_ngrams

    df = spark.createDataFrame(
        [(0, None), (1, ""), (2, "one two"), (3, "a b c d e f")],
        "doc_id BIGINT, text STRING",
    ).select("doc_id", _word_ngrams("text").alias("grams"))
    got = {r["doc_id"]: r["grams"] for r in df.collect()}
    assert got[0] == []  # NULL text -> empty array, not NULL
    assert got[1] == []
    assert got[2] == []  # fewer than NGRAM_N tokens
    assert len(got[3]) == 6 - NGRAM_N + 1
    assert got[3][0] == "a b c d e"


def test_word_ngrams_fold_equals_naive_form_fuzz(spark):
    """Pins the r11 'byte-identical' claim with a committed fuzz: the
    zip_with-folded n-gram build must equal the naive per-position
    transform(sequence) form on random whitespace-noisy docs (multiple
    spaces, tabs, unicode tokens, 0..n+4 token counts)."""
    import random

    from pyspark.sql import functions as F

    from dodo_spark.operators.text import NGRAM_N, _word_ngrams, _ws_tokens

    rng = random.Random(20260816)
    words = ["fox", "汉字", "a", "B9", "dog", "étoile", "x"]
    seps = [" ", "  ", "\t", " \t "]

    def doc():
        n = rng.randrange(0, NGRAM_N + 5)
        return rng.choice(seps).join(rng.choice(words) for _ in range(n))

    rows = [(i, doc()) for i in range(120)]
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")

    toks = _ws_tokens("text")
    naive = F.when(
        F.size(toks) >= NGRAM_N,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (NGRAM_N - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, NGRAM_N)),
        ),
    ).otherwise(F.array().cast("array<string>"))

    mism = (
        df.select(
            "doc_id",
            _word_ngrams("text").alias("fold"),
            naive.alias("naive"),
        )
        .filter(F.col("fold") != F.col("naive"))
        .collect()
    )
    assert not mism, mism[:3]


def test_bpe_token_count_hand_computed(spark):
    """Exact BPE semantics of the wrapped-token merge-replace kernel,
    against hand-applied merges. The wrapped representation is what the
    cases pin: 'ther' must NOT fire the (th, e) merge across the [er]
    token boundary (a separator-only scheme would, because 'er' merely
    starts with 'e'); 'aaaa' shows boundary sentinels don't break
    adjacent runs; 'rere' pins merge-ORDER sensitivity ((e, r) fires
    before (r, e), so the result is [r][er][e], not [re][re])."""
    from pyspark.sql import functions as F

    from dodo_spark.operators.text import _bpe_token_count

    cases = [
        ("the", 1),    # (t,h) then (th,e)
        ("and", 1),    # (a,n) then (an,d)
        ("fox", 3),    # no merge fires
        ("thin", 2),   # [th][in]
        ("onion", 3),  # [on][i][on] — (i,n) never adjacent
        ("ther", 2),   # [th][er]; (th,e) must NOT cross into [er]
        ("aaaa", 4),   # no (a,a) merge; runs stay singles
        ("inin", 2),   # [in][in] — consecutive matches share no chars
        ("rere", 3),   # [r][er][e] — (e,r) precedes (r,e)
        ("a", 1),
        ("er", 1),
        ("汉字", 2),   # multibyte chars split per CHARACTER
    ]
    df = spark.createDataFrame([(w,) for w, _ in cases], "w STRING")
    got = {
        r["w"]: r["n"]
        for r in df.select("w", _bpe_token_count(F.col("w")).alias("n")).collect()
    }
    bad = [(w, want, got[w]) for w, want in cases if got[w] != want]
    assert not bad, bad
