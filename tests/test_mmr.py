"""MMR diversification behavior (operators/mmr.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dodo_spark.functions.vectors import scaled_vec
from dodo_spark.operators.mmr import mmr_rerank


def _cands(spark, rows):
    """rows: (query_id, cand_id, rel, vec)."""
    df = spark.createDataFrame(
        rows, "query_id BIGINT, cand_id BIGINT, rel DOUBLE, v ARRAY<FLOAT>"
    )
    return df.select(
        "query_id", "cand_id", "rel", scaled_vec("v").alias("sv")
    )


def test_mmr_defers_near_duplicate_of_top_pick(spark):
    """cand 2 is an exact duplicate of top-relevance cand 1; plain
    ranking would put it second, MMR must push the orthogonal cand 3
    ahead of it (sim(dup)=1 → score 0.7·0.9 − 0.3·1 < 0.7·0.5 − 0.3·0)."""
    rows = [
        (0, 1, 0.95, [1.0, 0.0, 0.0]),
        (0, 2, 0.90, [1.0, 0.0, 0.0]),
        (0, 3, 0.50, [0.0, 1.0, 0.0]),
    ]
    out = {
        r["mmr_rank"]: r["cand_id"]
        for r in mmr_rerank(_cands(spark, rows)).collect()
    }
    assert out[1] == 1 and out[2] == 3 and out[3] == 2


def test_mmr_first_pick_is_relevance_argmax(spark):
    rows = [
        (0, 7, 0.2, [1.0, 0.0, 0.0]),
        (0, 8, 0.8, [0.0, 1.0, 0.0]),
    ]
    got = (
        mmr_rerank(_cands(spark, rows))
        .filter("mmr_rank = 1")
        .collect()[0]
    )
    assert got["cand_id"] == 8 and got["mmr_score"] == 0.8


def test_mmr_exhausts_small_groups_without_padding(spark):
    rows = [(0, i, 0.5, [float(i), 1.0, 0.0]) for i in range(3)]
    out = mmr_rerank(_cands(spark, rows))
    assert out.count() == 3
    assert out.agg(F.max("mmr_rank")).collect()[0][0] == 3


def test_mmr_groups_are_independent(spark):
    rows = [
        (0, 1, 0.9, [1.0, 0.0, 0.0]),
        (0, 2, 0.1, [0.0, 1.0, 0.0]),
        (1, 1, 0.1, [1.0, 0.0, 0.0]),
        (1, 2, 0.9, [0.0, 1.0, 0.0]),
    ]
    out = mmr_rerank(_cands(spark, rows)).collect()
    first = {r["query_id"]: r["cand_id"] for r in out if r["mmr_rank"] == 1}
    assert first == {0: 1, 1: 2}


def test_mmr_matches_pure_python_reference(spark):
    """The applyInPandas greedy loop must equal a from-scratch pure-
    Python MMR on the same inputs — ids, ranks, AND float scores
    exactly (all dots are exact integers, so no summation-order slack).
    Randomized over seeds; deterministic inputs per seed."""
    import math
    import random

    for seed in (1, 7, 42):
        rng = random.Random(seed)
        n = rng.randint(3, 12)
        rows = []
        vecs = {}
        for cid in range(n):
            v = [rng.randint(-1000, 1000) for _ in range(4)]
            if not any(v):
                v[0] = 1
            vecs[cid] = v
            rows.append((0, cid, rng.uniform(-1, 1), v))
        df = spark.createDataFrame(
            rows, "query_id BIGINT, cand_id BIGINT, rel DOUBLE, sv ARRAY<BIGINT>"
        )
        got = {
            r["mmr_rank"]: (r["cand_id"], r["mmr_score"])
            for r in mmr_rerank(df).collect()
        }

        # pure-python reference (same op order as the numpy kernel)
        rel = {cid: r for (_q, cid, r, _v) in rows}

        def sim(a, b):
            da = float(sum(x * y for x, y in zip(vecs[a], vecs[b])))
            na = math.sqrt(float(sum(x * x for x in vecs[a])))
            nb = math.sqrt(float(sum(x * x for x in vecs[b])))
            return da / (na * nb)

        chosen = [min(sorted(rel), key=lambda c: (-rel[c], c))]
        want = {1: (chosen[0], rel[chosen[0]])}
        k = min(8, n)
        while len(chosen) < k:
            best, best_score = None, None
            for c in sorted(rel):
                if c in chosen:
                    continue
                s = 0.7 * rel[c] - 0.3 * max(sim(c, ch) for ch in chosen)
                if best is None or s > best_score:
                    best, best_score = c, s
            chosen.append(best)
            want[len(chosen)] = (best, best_score)
        assert got == want, (seed, got, want)
