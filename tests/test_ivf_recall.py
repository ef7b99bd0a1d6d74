"""IVF centroid quality: trained (seeded-sample k-means) vs fixed first-16.

The pathological corpus for the fixed quantizer: ALL 16 fixed centroids
(vec_id < 16) sit inside one tiny tight cluster A, so A's points scatter
one-per-cell across near-duplicate centroids — a query's true neighbors
(the rest of A) land in 15 different cells and 2 probes recover almost
none of them. Spherical k-means trained on a bounded sample dedicates ~1
cell to A (2% of mass) and splits the big cluster B across the rest, so
the query's probe captures all of A. Everything is seeded/deterministic.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

from dodo_spark.operators.similarity import (
    N_QUERIES,
    similarity_ivf,
    similarity_ivf_kmeans,
    similarity_topk,
)


def _trained_topk(spark, sf_dir):
    """The trained-IVF answer set (the key itself now returns the contract
    row; the top-k it certifies is built from the same pieces)."""
    from pyspark.sql import functions as F

    from dodo_spark.catalog import load_table
    from dodo_spark.functions.vectors import scaled_vec
    from dodo_spark.operators.similarity import (
        _ivf_index,
        _ivf_topk,
        train_centroids_kmeans,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    v = emb.select("vec_id", scaled_vec("embedding").alias("sv"))
    cents = train_centroids_kmeans(v)
    cells, probes = _ivf_index(spark, sf_dir, centroids=cents)
    return _ivf_topk(cells, probes)

DIM = 64


@pytest.fixture(scope="module")
def skewed_dir(spark, tmp_path_factory):
    rng = np.random.default_rng(42)
    a = rng.normal(size=DIM)
    a /= np.linalg.norm(a)
    b = -a  # maximally separated direction
    rows = []
    for i in range(20):  # cluster A: tiny, tight, holds ALL fixed centroids
        v = a + 0.05 * rng.normal(size=DIM)
        rows.append((i, v / np.linalg.norm(v)))
    for i in range(20, 1020):  # cluster B: the bulk
        v = b + 0.05 * rng.normal(size=DIM)
        rows.append((i, v / np.linalg.norm(v)))
    df = spark.createDataFrame(
        [(i, [float(x) for x in v], int(i % 3)) for i, v in rows],
        "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT",
    )
    path = str(tmp_path_factory.mktemp("skewed_sf"))
    df.coalesce(4).write.mode("overwrite").parquet(os.path.join(path, "embeddings.parquet"))
    return path


def _recall(exact_df, approx_df) -> float:
    exact = {}
    for r in exact_df.collect():
        exact.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    approx = {}
    for r in approx_df.collect():
        approx.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    per_q = [
        len(exact[q] & approx.get(q, set())) / len(exact[q]) for q in exact
    ]
    assert len(per_q) == N_QUERIES
    return sum(per_q) / len(per_q)


def test_kmeans_centroids_fix_skewed_recall(spark, skewed_dir):
    exact = similarity_topk(spark, skewed_dir)
    fixed = similarity_ivf(spark, skewed_dir)
    trained = _trained_topk(spark, skewed_dir)

    r_fixed = _recall(exact, fixed)
    r_trained = _recall(exact, trained)
    # fixed first-16 collapses on this corpus; trained must not
    assert r_trained >= 0.8, (r_trained, r_fixed)
    assert r_trained > r_fixed, (r_trained, r_fixed)


def test_kmeans_contract_row_on_skewed_corpus(spark, skewed_dir):
    """The verify key's oracle contract (recall lift over chance probing,
    cell balance, full assignment) must hold on the clustered corpus too."""
    [row] = similarity_ivf_kmeans(spark, skewed_dir).collect()
    assert row["n_queries"] == N_QUERIES
    assert row["corpus_assigned"] == 1020
    assert row["recall_lift_ok"] is True
    assert row["balance_ok"] is True


def test_kmeans_centroids_deterministic(spark, skewed_dir):
    """Same seed + same corpus -> identical centroid literals (retry- and
    rerun-stable, like every other plan in the repo)."""
    from dodo_spark.catalog import load_table
    from dodo_spark.functions.vectors import scaled_vec
    from dodo_spark.operators.similarity import train_centroids_kmeans
    from pyspark.sql import functions as F

    emb = load_table(spark, skewed_dir, "embeddings")
    v = emb.select("vec_id", scaled_vec("embedding").alias("sv"))
    c1 = train_centroids_kmeans(v)
    c2 = train_centroids_kmeans(v.repartition(7))
    assert c1 == c2


def test_pq_contract_row_on_skewed_corpus(spark, skewed_dir):
    """similarity_pq's contract must hold on a clustered corpus too: on
    two tight antipodal clusters the codebooks nail the cluster structure,
    so recall and reconstruction error are far better than the isotropic
    testdata the bounds were grounded on."""
    from dodo_spark.operators.similarity import similarity_pq

    [row] = similarity_pq(spark, skewed_dir).collect()
    assert row["corpus_encoded"] == 1020
    assert row["bytes_raw"] == 256 and row["bytes_code"] == 8
    assert row["codes_ok"] is True
    assert row["recall_ok"] is True
    assert row["mse_ok"] is True


def test_pq_codebooks_deterministic(spark, skewed_dir):
    """Same seed + same corpus -> identical codebooks regardless of
    partitioning (the crc32-ordered bounded sample is partition-stable)."""
    from pyspark.sql import functions as F

    from dodo_spark.catalog import load_table
    from dodo_spark.functions.vectors import scaled_vec
    from dodo_spark.operators.similarity import train_pq_codebooks

    emb = load_table(spark, skewed_dir, "embeddings")
    v = emb.select("vec_id", scaled_vec("embedding").alias("sv"))
    b1 = train_pq_codebooks(v)
    b2 = train_pq_codebooks(v.repartition(7))
    assert b1 == b2


def test_pq_encoding_is_scan_side(spark, sf_dir):
    """PQ encoding must be a scan-side projection: no exchange between the
    parquet scan and the codes column (the codebooks are literals)."""
    from pyspark.sql import functions as F

    from dodo_spark.catalog import load_table
    from dodo_spark.functions.vectors import scaled_vec
    from dodo_spark.operators.similarity import _pq_encode, train_pq_codebooks

    emb = load_table(spark, sf_dir, "embeddings")
    v = emb.select("vec_id", scaled_vec("embedding").alias("sv"))
    enc = _pq_encode(v, train_pq_codebooks(v)).select("vec_id", "codes")
    plan = enc._sc._jvm.PythonSQLUtils.explainString(enc._jdf.queryExecution(), "formatted")
    assert "Exchange" not in plan, plan
