"""MMR (maximal marginal relevance) diversified re-ranking — the
retrieval-pipeline operator between ANN search and a context window:
from each query's top-N relevance candidates, greedily select k items
maximizing ``0.7·rel(c) − 0.3·max_{s∈S} sim(c, s)`` (Carbonell &
Goldstein, SIGIR'98), so near-duplicate passages don't crowd out
coverage. The first pick is the pure-relevance argmax and reports its
relevance as the score.

Execution shape: candidate generation is the existing brute-force
cosine top-N (broadcast queries, scan-side scoring — D7); the greedy
selection is inherently sequential PER QUERY but embarrassingly
parallel ACROSS queries, so it runs as one Arrow-batched
``applyInPandas`` over query groups — each group is N=24 candidates,
a 24×24 exact-integer Gram matrix and a k=8 loop in numpy. At 100 TB
the expensive part (scoring the corpus) stays JVM-side and bounded;
the Python boundary sees only k·|queries| candidate rows.

Cross-engine exactness: candidate vectors ride the scaled-long kernel
(``functions/vectors.py``), so every dot product is an exact integer
even in float64 matmul (64-dim products stay < 2^53); relevance and
pairwise similarity are then one division of correctly-rounded doubles,
and the MMR score uses literal 0.7/0.3 coefficients in BOTH engines
(never ``1 − λ``, whose rounding differs from the literal). The DuckDB
oracle replays the greedy loop as k UNROLLED CTE steps — argmax with
the same (score DESC, cand_id) tie-break — so selection order itself
is hash-verified.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

N_Q = 3  # vec_id < 3 are the query vectors
N_CAND = 24  # relevance candidates per query entering MMR
K_MMR = 8  # diversified picks per query

_OUT_SCHEMA = (
    "query_id bigint, cand_id bigint, mmr_rank bigint, mmr_score double"
)


def _mmr_group(pdf):
    import numpy as np
    import pandas as pd

    pdf = pdf.sort_values("cand_id").reset_index(drop=True)
    V = np.asarray([list(x) for x in pdf["sv"]], dtype=np.float64)
    n = np.sqrt((V * V).sum(axis=1))
    S = (V @ V.T) / (n[:, None] * n[None, :])
    rel = pdf["rel"].to_numpy(dtype=np.float64)
    ids = pdf["cand_id"].to_numpy()
    k = min(K_MMR, len(pdf))
    # ids ascend, so argmax's first-occurrence rule IS the
    # (score DESC, cand_id ASC) tie-break the oracle uses
    chosen = [int(np.argmax(rel))]
    scores = [float(rel[chosen[0]])]
    while len(chosen) < k:
        score = 0.7 * rel - 0.3 * S[:, chosen].max(axis=1)
        score[chosen] = -np.inf
        j = int(np.argmax(score))
        chosen.append(j)
        scores.append(float(score[j]))
    return pd.DataFrame(
        {
            "query_id": pdf["query_id"].iloc[0],
            "cand_id": ids[chosen],
            "mmr_rank": np.arange(1, len(chosen) + 1, dtype=np.int64),
            "mmr_score": scores,
        }
    )


def mmr_rerank(cands: DataFrame) -> DataFrame:
    """Greedy MMR over candidate groups. ``cands``: (query_id, cand_id,
    rel, sv) with sv the scaled-long vector; one Arrow batch per query
    group, bounded at the candidate count by construction."""
    return cands.groupBy("query_id").applyInPandas(_mmr_group, _OUT_SCHEMA)


def _mmr_oracle() -> str:
    from dodo_spark.functions.vectors import sql_cosine, sql_scaled_vec

    steps = []
    for s in range(2, K_MMR + 1):
        steps.append(f"""
        pick{s} AS MATERIALIZED (
          SELECT query_id, cand_id, mmr_score, {s} AS mmr_rank FROM (
            SELECT c.query_id, c.cand_id,
                   0.7 * c.rel - 0.3 * ms.m AS mmr_score,
                   row_number() OVER (
                     PARTITION BY c.query_id
                     ORDER BY (0.7 * c.rel - 0.3 * ms.m) DESC, c.cand_id
                   ) AS rn
            FROM cands c
            JOIN (SELECT p.query_id, p.a_id, MAX(p.sim) AS m
                  FROM psim p JOIN chosen{s - 1} ch
                    ON p.query_id = ch.query_id AND p.b_id = ch.cand_id
                  GROUP BY p.query_id, p.a_id) ms
              ON ms.query_id = c.query_id AND ms.a_id = c.cand_id
            WHERE NOT EXISTS (SELECT 1 FROM chosen{s - 1} ch
                              WHERE ch.query_id = c.query_id
                                AND ch.cand_id = c.cand_id)
          ) WHERE rn = 1
        ), chosen{s} AS MATERIALIZED (
          SELECT * FROM chosen{s - 1}
          UNION ALL SELECT query_id, cand_id FROM pick{s}
        )""")
    union = " UNION ALL ".join(
        f"SELECT * FROM pick{s}" for s in range(1, K_MMR + 1)
    )
    return f"""
    WITH v AS MATERIALIZED (
      SELECT vec_id, {sql_scaled_vec("embedding")} AS sv FROM embeddings
    ), q AS (
      SELECT vec_id AS query_id, sv AS qv FROM v WHERE vec_id < {N_Q}
    ), scored AS MATERIALIZED (
      SELECT q.query_id, v.vec_id AS cand_id,
             {sql_cosine("q.qv", "v.sv")} AS rel, v.sv
      FROM q JOIN v ON v.vec_id != q.query_id
    ), cands AS MATERIALIZED (
      SELECT query_id, cand_id, rel, sv FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY rel DESC, cand_id) AS rn
        FROM scored)
      WHERE rn <= {N_CAND}
    ), psim AS MATERIALIZED (
      SELECT a.query_id, a.cand_id AS a_id, b.cand_id AS b_id,
             {sql_cosine("a.sv", "b.sv")} AS sim
      FROM cands a JOIN cands b
        ON a.query_id = b.query_id AND a.cand_id != b.cand_id
    ), pick1 AS MATERIALIZED (
      SELECT query_id, cand_id, rel AS mmr_score, 1 AS mmr_rank FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY rel DESC, cand_id) AS rn
        FROM cands)
      WHERE rn = 1
    ), chosen1 AS MATERIALIZED (SELECT query_id, cand_id FROM pick1),{",".join(steps)}
    SELECT query_id, cand_id, CAST(mmr_rank AS BIGINT) AS mmr_rank,
           mmr_score
    FROM ({union})
    ORDER BY query_id, mmr_rank
    """


def _register_mmr() -> None:
    from dodo_spark.functions.vectors import cosine, scaled_vec
    from dodo_spark.operators.similarity import _emb
    from dodo_spark.registry import register

    @register(
        "similarity_mmr",
        oracle=_mmr_oracle(),
        doc="MMR diversified re-ranking (Carbonell & Goldstein SIGIR'98; "
        "the dedup-at-retrieval step of a RAG pipeline, downstream of "
        "D7 ANN): per query, greedy k=8 selection maximizing 0.7·rel − "
        "0.3·max-sim-to-chosen over the 24 top-cosine candidates. "
        "Candidate scoring is the scan-side D7 kernel; the sequential "
        "greedy loop runs per query group in one Arrow-batched "
        "applyInPandas over exact-integer Gram matrices. The oracle "
        "unrolls all 8 greedy steps as CTEs with the identical "
        "(score DESC, cand_id) argmax, so the SELECTION ORDER — not "
        "just the final set — is hash-verified cross-engine.",
    )
    def similarity_mmr(spark: SparkSession, sf_dir: str) -> DataFrame:
        emb = _emb(spark, sf_dir)
        v = emb.select("vec_id", scaled_vec("embedding").alias("sv"))
        q = F.broadcast(
            v.filter(F.col("vec_id") < N_Q).select(
                F.col("vec_id").alias("query_id"), F.col("sv").alias("qv")
            )
        )
        scored = q.join(v, F.col("vec_id") != F.col("query_id")).select(
            "query_id",
            F.col("vec_id").alias("cand_id"),
            cosine(F.col("qv"), F.col("sv")).alias("rel"),
            "sv",
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("rel").desc(), F.col("cand_id")
        )
        cands = (
            scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= N_CAND)
            .drop("rn")
        )
        return mmr_rerank(cands).orderBy("query_id", "mmr_rank")


_register_mmr()
