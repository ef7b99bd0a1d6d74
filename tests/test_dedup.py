"""Dedup-tier unit tests beyond the oracle keys — most importantly a guard
for the F.transform lambda-arity trap: a two-parameter lambda receives the
array index as its second argument, which once collapsed the 8 minhash
functions into one (single-hash LSH that still passed small-scale parity)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dodo_spark.operators.dedup import NUM_HASHES, _shingles, _window_key_fn


def test_minhash_orderings_are_independent(spark):
    """Each of the 8 per-hash minima must be a DIFFERENT function of the
    shingle set: for a multi-shingle doc the 8 window keys of one digest
    differ, and across hashes the minima must not all coincide."""
    df = spark.createDataFrame(
        [("x" * 200,), ("the quick brown fox jumps over the lazy dog " * 5,)],
        "text string",
    )
    hashed = df.select(_shingles().alias("sh")).withColumn(
        "shh", F.transform("sh", lambda s: F.md5(s))
    )
    sig = hashed.select(
        F.size("sh").alias("n_shingles"),
        *[
            F.array_min(F.transform("shh", _window_key_fn(4 * i + 1))).alias(f"mh{i}")
            for i in range(NUM_HASHES)
        ],
    ).collect()
    for r in sig:
        values = [r[f"mh{i}"] for i in range(NUM_HASHES)]
        # windows at different offsets of a digest can't all be equal
        assert len(set(values)) > 1, values
        # every key is window(4 hex) + full digest(32 hex)
        assert all(len(v) == 36 for v in values)


def test_minhash_identical_docs_identical_signature(spark):
    text = "alpha bravo charlie delta echo foxtrot golf hotel " * 4
    df = spark.createDataFrame([(text,), (text,)], "text string")
    hashed = df.select(_shingles().alias("sh")).withColumn(
        "shh", F.transform("sh", lambda s: F.md5(s))
    )
    sig = hashed.select(
        *[
            F.array_min(F.transform("shh", _window_key_fn(4 * i + 1))).alias(f"mh{i}")
            for i in range(NUM_HASHES)
        ]
    ).collect()
    assert tuple(sig[0]) == tuple(sig[1])


def test_connected_components_long_chain(spark):
    """A chain graph of diameter 60 (far beyond the old 20-iteration linear
    cap) must fully cluster to label 0 — pointer doubling makes the round
    count O(log diameter), and non-convergence must raise, never silently
    return wrong labels."""
    from dodo_spark.operators.dedup import connected_components

    n = 61  # edges 0-1, 1-2, ..., 59-60: diameter 60
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "src BIGINT, dst BIGINT"
    )
    labels = connected_components(pairs, "src", "dst", max_iters=12)
    rows = labels.collect()
    assert len(rows) == n
    assert all(r["label"] == 0 for r in rows)


def test_connected_components_raises_on_cap(spark):
    import pytest

    from dodo_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], "src BIGINT, dst BIGINT"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(pairs, "src", "dst", max_iters=2)


def test_connected_components_two_components(spark):
    from dodo_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (11, 12), (12, 10)], "src BIGINT, dst BIGINT"
    )
    got = {r["id"]: r["label"] for r in connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10}


def test_simhash_cap_skips_dense_buckets_keeps_sparse_pairs(spark, tmp_path):
    """The over-dense-bucket cap must (a) drop the degenerate cluster's
    quadratic pair mass, (b) still find near-dup pairs whose shared bands
    are sparse, and (c) report the skipped mass in the audit columns."""
    from dodo_spark.operators.dedup import (
        SIMHASH_BUCKET_CAP,
        dedup_simhash_capped,
        dedup_simhash_stats,
    )

    spam = "buy cheap pills now limited offer click here today"
    uniq_a = "the migratory patterns of arctic terns span both hemispheres yearly"
    uniq_b = "the migratory patterns of arctic terns span both hemispheres"  # near-dup of a
    rows = [(i, spam, "en", "web", len(spam)) for i in range(SIMHASH_BUCKET_CAP + 50)]
    rows += [(9001, uniq_a, "en", "web", len(uniq_a)),
             (9002, uniq_b, "en", "web", len(uniq_b))]
    df = spark.createDataFrame(
        rows, "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
    )
    d = str(tmp_path)
    df.coalesce(1).write.parquet(f"{d}/documents.parquet")

    capped = dedup_simhash_capped(spark, d).collect()
    assert capped, "sparse near-dup pair must survive the cap"
    row = capped[0]
    assert row["buckets_skipped"] >= 1
    assert row["postings_skipped"] >= SIMHASH_BUCKET_CAP
    capped_pairs = sum(r["pair_cnt"] for r in capped)
    # uncapped stats enumerate the dense cluster's ~n^2/2 identical pairs
    uncapped_pairs = sum(
        r["pair_cnt"] for r in dedup_simhash_stats(spark, d).collect()
    )
    n_spam = SIMHASH_BUCKET_CAP + 50
    assert uncapped_pairs >= n_spam * (n_spam - 1) // 2
    # capped output keeps the sparse pair and drops the quadratic mass
    assert 1 <= capped_pairs <= 10, (capped_pairs, uncapped_pairs)


def test_dedup_embedding_brute_force_gate(spark, sf_dir):
    import pytest

    from dodo_spark.operators.dedup import dedup_embedding

    with pytest.raises(ValueError, match="similarity_lsh"):
        dedup_embedding(spark, sf_dir, max_rows=3)


# --- winnowing guarantee (property-based) ----------------------------------

def _py_winnow_fps(text: str, k: int = 8, w: int = 4) -> set:
    """Pure-python mirror of the text_winnow/dedup_winnow kernel
    (polynomial Rabin-Karp k-gram hash over code points, WINNOW_B/M)."""
    from dodo_spark.operators.text import WINNOW_B, WINNOW_M

    if len(text) < k + w - 1:
        return set()
    codes = [ord(c) for c in text]

    def kh(i: int) -> int:
        a = 0
        for c in codes[i : i + k]:
            a = (a * WINNOW_B + c) % WINNOW_M
        return a

    hs = [kh(i) for i in range(len(text) - k + 1)]
    return {min(hs[i : i + w]) for i in range(len(hs) - w + 1)}


def test_py_winnow_matches_spark_kernel(spark, tmp_path):
    """The python mirror must compute the same fingerprint sets as the
    Spark kernel (checksum + count per doc)."""
    import os

    from pyspark.sql import functions as F

    from dodo_spark.operators.text import text_winnow

    rows = [(0, "the quick brown fox jumps over the lazy dog", "en", "s", 44),
            (1, "pack my box with five dozen liquor jugs!!", "en", "s", 42),
            (2, "short", "en", "s", 5)]
    df = spark.createDataFrame(
        rows, "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
    )
    d = str(tmp_path / "wd")
    df.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    got = {r["doc_id"]: (r["n_fingerprints"], r["fp_checksum"])
           for r in text_winnow(spark, d).collect()}
    for doc_id, text, *_ in rows:
        fps = _py_winnow_fps(text)
        if not fps:
            assert doc_id not in got  # sub-(k+w-1) docs excluded scan-side
        else:
            assert got[doc_id] == (len(fps), sum(fps)), doc_id


from hypothesis import given, settings
from hypothesis import strategies as st

_alpha = st.text(alphabet="abcdefg ", min_size=0, max_size=60)


@given(prefix_a=_alpha, suffix_a=_alpha, prefix_b=_alpha, suffix_b=_alpha,
       shared=st.text(alphabet="hijklmnop", min_size=11, max_size=40))
@settings(max_examples=200, deadline=None)
def test_winnow_guarantee_shared_substring_shares_fingerprint(
    prefix_a, suffix_a, prefix_b, suffix_b, shared
):
    """Schleimer et al.'s winnowing guarantee: any shared substring of
    length >= k + w - 1 (= 11 here) contributes at least one shared
    fingerprint — regardless of what surrounds it. (Checked on the pure
    mirror; the Spark kernel is asserted identical above.)"""
    a = prefix_a + shared + suffix_a
    b = prefix_b + shared + suffix_b
    assert _py_winnow_fps(a) & _py_winnow_fps(b)


def test_incremental_near_gate_semantics(spark, sf_dir):
    """The near-dup ingest gate: every rejected batch doc matches the batch
    predicate (doc_id % 2 == 0), every reported match clears the Jaccard
    threshold, and every REDELIVERED doc (in both base and batch) is
    rejected at jaccard exactly 1.0 — the redelivery-rejection contract."""
    from dodo_spark import registry
    from dodo_spark.catalog import load_table
    from dodo_spark.operators.dedup import JACCARD_THRESHOLD

    rows = registry.queries()["dedup_incremental_near"](spark, sf_dir).collect()
    assert rows, "generated corpus contains near-dups; gate must fire"
    got = {r["batch_doc"]: r for r in rows}
    for r in rows:
        assert r["batch_doc"] % 2 == 0
        assert r["base_doc"] % 3 != 0
        assert r["jaccard"] >= JACCARD_THRESHOLD
    redelivered = [
        r[0]
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .filter("doc_id % 2 = 0 AND doc_id % 3 != 0")
        .collect()
    ]
    assert redelivered
    for doc in redelivered:
        assert doc in got, f"redelivered doc {doc} not rejected"
        assert got[doc]["jaccard"] == 1.0


def test_semantic_cells_attrition_identities(spark, sf_dir):
    """SemDeDup per-cell report: kept + dropped == vectors, cell sizes sum
    to the corpus, dropped never exceeds pair count, and the keep-min-id
    rule leaves NO epsilon-similar pair among kept vectors (drop b iff a
    lower-id similar cellmate exists, so any similar pair implies its
    higher id was dropped)."""
    from pyspark.sql import functions as F

    from dodo_spark import registry
    from dodo_spark.catalog import load_table
    from dodo_spark.functions.vectors import cosine
    from dodo_spark.operators.dedup import SEMDEDUP_THRESHOLD, _semdedup_cells

    rows = registry.queries()["dedup_semantic_cells"](spark, sf_dir).collect()
    n_corpus = load_table(spark, sf_dir, "embeddings").count()
    assert sum(r["n_vectors"] for r in rows) == n_corpus
    assert sum(r["n_dropped"] for r in rows) > 0  # epsilon actually bites
    for r in rows:
        assert r["n_kept"] + r["n_dropped"] == r["n_vectors"]
        assert r["n_dropped"] <= r["n_dup_pairs"]

    # reconstruct the kept set (same quantizer cells as the key) and
    # assert it is epsilon-separated per cell
    cells = _semdedup_cells(spark, str(sf_dir))
    a, b = cells.alias("a"), cells.alias("b")
    sim_pairs = a.join(
        b,
        (F.col("a.cell") == F.col("b.cell"))
        & (F.col("a.vec_id") < F.col("b.vec_id")),
    ).filter(cosine(F.col("a.sv"), F.col("b.sv")) >= SEMDEDUP_THRESHOLD)
    dropped = sim_pairs.select(F.col("b.vec_id").alias("vec_id")).distinct()
    kept = cells.join(dropped, "vec_id", "left_anti")
    ka, kb = kept.alias("a"), kept.alias("b")
    still_similar = (
        ka.join(
            kb,
            (F.col("a.cell") == F.col("b.cell"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .filter(cosine(F.col("a.sv"), F.col("b.sv")) >= SEMDEDUP_THRESHOLD)
        .count()
    )
    assert still_similar == 0


def test_dedup_funnel_both_stages_drop(spark, tmp_path):
    """Crafted corpus where BOTH cascade stages drop: exact copies fall at
    stage 1 (keep-min-id), near-identical variants at stage 2, and a doc
    that is BOTH an exact copy and a near-dup counts only at stage 1 —
    plus oracle parity on the fixture."""
    import duckdb

    from dodo_spark import registry
    from tests.parity import assert_parity

    long = ("the quick brown fox jumps over the lazy dog and keeps "
            "running through the quiet forest until the morning light")
    near = long.replace("morning", "evening")
    rows = [
        (0, long, "en", "web", len(long)),
        (1, long, "en", "web", len(long)),        # exact copy -> stage 1
        (2, near, "en", "web", len(near)),        # near-dup    -> stage 2
        (3, long + " ", "en", "web", len(long)),  # trim-equal  -> stage 1
        (4, "completely different text about spark shuffles and joins "
            "written at length to clear the shingle width", "en", "web", 100),
    ]
    d = str(tmp_path)
    spark.createDataFrame(
        rows, "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
    ).coalesce(1).write.parquet(f"{d}/documents.parquet")

    got = registry.queries()["corpus_dedup_funnel"](spark, d)
    rep = {r["stage"]: (r["evaluated"], r["dropped"], r["surviving"])
           for r in got.collect()}
    assert rep[1] == (5, 2, 3)   # docs 1 and 3 fall to exact
    assert rep[2] == (3, 1, 2)   # doc 2 falls to near; 0 and 4 survive

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet/*.parquet')"
    )
    assert_parity(
        got, con.sql(registry.oracle_sql()["corpus_dedup_funnel"]).df(), "ddfunnel"
    )


def test_span_windows_exact_semantics(spark, tmp_path):
    """Hand-checkable span report: a doc sharing exactly one 8-token
    window with another is flagged with shared=1; a doc with no complete
    window or no cross-doc window is absent; within-doc repetition alone
    does NOT flag (distinct-doc rule) — plus oracle parity."""
    import duckdb

    from dodo_spark import registry
    from tests.parity import assert_parity

    span = "one two three four five six seven eight"          # 8 tokens
    rows = [
        (0, span + " tail_a word_a pad_a more_a x_a y_a z_a w_a", "en", "w", 1),
        (1, span + " tail_b word_b pad_b more_b x_b y_b z_b w_b", "en", "w", 1),
        (2, "totally unrelated words that fill one whole window here",
         "en", "w", 1),                                        # unique window
        (3, "short doc", "en", "w", 1),                        # < 8 tokens
        (4, span + " " + span, "en", "w", 1),                  # shares w/ 0,1
        (5, ("rep " * 16).strip(), "en", "w", 1),              # self-repeat only
    ]
    d = str(tmp_path)
    spark.createDataFrame(
        rows, "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
    ).coalesce(1).write.parquet(f"{d}/documents.parquet")

    got = registry.queries()["dedup_span_windows"](spark, d)
    rep = {r["doc_id"]: (r["n_windows"], r["shared_windows"], r["shared_pm"])
           for r in got.collect()}
    assert rep[0] == (2, 1, 500)   # first window shared, tail unique
    assert rep[1] == (2, 1, 500)
    assert rep[4] == (2, 2, 1000)  # both its windows are the shared span
    assert 2 not in rep and 3 not in rep and 5 not in rep

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet/*.parquet')"
    )
    assert_parity(
        got, con.sql(registry.oracle_sql()["dedup_span_windows"]).df(), "spans"
    )
