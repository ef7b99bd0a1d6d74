"""Hybrid retrieval: lexical rank x vector rank fused with RRF.

The standard first stage of a modern RAG / retrieval pipeline: a lexical
ranked list (posting-list term frequency, the ``text_rank_search`` family)
and a dense ranked list (embedding cosine, the ``similarity_topk`` family)
are fused with Reciprocal Rank Fusion — score(d) = Σ 1/(K + rank_i(d)) —
which needs no score calibration between the two retrievers (Cormack &
Clarke, SIGIR'09; the fusion used by Elasticsearch/OpenSearch hybrid
search). The reference's engine has no retrieval surface (its MATCH_* is
an inverted-index predicate, DorisParser.g4:1513); this extends that
family the way a training-data curation pipeline uses it: find documents
both lexically AND semantically close to a probe.

Determinism contract: both ranks are integers from exact comparisons
(integer tf; cosine over scaled-long vectors per functions/vectors.py),
and the RRF score is a fixed sequence of IEEE double ops (1/(K+r), one
add) on identical inputs — bit-identical across engines, no float
accumulation anywhere.

Scale shape: each retriever ends in a per-partition top-R heap
(TakeOrderedAndProject) — the ONLY global ordering ever computed is over
the 2R fused candidates, a driver-bounded set. The corpus is scanned
once per retriever, never shuffled on document identity; the fusion join
is R x R row broadcast territory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dodo_spark.catalog import load_table
from dodo_spark.functions.vectors import cosine, scaled_vec, sql_cosine, sql_scaled_vec
from dodo_spark.operators.relational import MATCH_TERMS
from dodo_spark.registry import register

RRF_K = 60  # standard RRF constant
LIST_R = 50  # depth of each retriever's ranked list
FINAL_K = 20  # fused results returned
QUERY_VEC_ID = 0  # the dense probe: embeddings row 0 (paired with doc 0)

_TERMS_SQL = ", ".join(f"'{t}'" for t in MATCH_TERMS)


@register(
    "search_hybrid_rrf",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(list_filter(
               regexp_split_to_array(lower(text), '\\s+'), x -> x != '')) AS token
      FROM documents
    ), tf AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS tf
      FROM toks WHERE token IN ({_TERMS_SQL})
      GROUP BY doc_id
    ), text_top AS (
      SELECT doc_id, tf FROM tf ORDER BY tf DESC, doc_id LIMIT {LIST_R}
    ), text_ranked AS (
      SELECT doc_id,
             CAST(row_number() OVER (ORDER BY tf DESC, doc_id) AS BIGINT)
               AS text_rank
      FROM text_top
    ), v AS (
      SELECT vec_id, {sql_scaled_vec("embedding")} AS sv FROM embeddings
    ), q AS (
      SELECT sv AS qv FROM v WHERE vec_id = {QUERY_VEC_ID}
    ), scored AS (
      SELECT v.vec_id, {sql_cosine("v.sv", "q.qv")} AS cos_sim
      FROM v, q WHERE v.vec_id <> {QUERY_VEC_ID}
    ), vec_top AS (
      SELECT vec_id, cos_sim FROM scored ORDER BY cos_sim DESC, vec_id LIMIT {LIST_R}
    ), vec_ranked AS (
      SELECT vec_id,
             CAST(row_number() OVER (ORDER BY cos_sim DESC, vec_id) AS BIGINT)
               AS vec_rank
      FROM vec_top
    ), fused AS (
      SELECT COALESCE(t.doc_id, e.vec_id) AS doc_id,
             t.text_rank, e.vec_rank,
             COALESCE(1.0 / ({RRF_K} + t.text_rank), 0.0)
               + COALESCE(1.0 / ({RRF_K} + e.vec_rank), 0.0) AS rrf_score
      FROM text_ranked t FULL OUTER JOIN vec_ranked e ON e.vec_id = t.doc_id
    )
    SELECT doc_id, text_rank, vec_rank, rrf_score
    FROM fused ORDER BY rrf_score DESC, doc_id LIMIT {FINAL_K}
    """,
    doc="Hybrid search with Reciprocal Rank Fusion: lexical list = top-"
    f"{LIST_R} docs by exact-integer term frequency over the posting "
    "list (text_rank_search family), dense list = top-"
    f"{LIST_R} by scaled-long cosine to the probe embedding "
    "(similarity_topk family), fused by score = 1/(K+rank_text) + "
    "1/(K+rank_vec) with absent-list terms contributing 0 (full outer "
    "join of the two lists). Each retriever bounds itself with "
    "TakeOrderedAndProject (per-partition heaps, no global window over "
    "the corpus); ranks are then assigned on the R-row bounded lists by "
    "a window PARTITIONED on the probe id — the multi-probe serving "
    f"shape, each partition <= {LIST_R} rows by construction.",
)
def search_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    return hybrid_search(spark, sf_dir)


def hybrid_search(
    spark: SparkSession,
    sf_dir: str,
    terms: tuple[str, ...] = MATCH_TERMS,
    query_vec_id: int = QUERY_VEC_ID,
    list_r: int = LIST_R,
    final_k: int = FINAL_K,
    rrf_k: int = RRF_K,
) -> DataFrame:
    """Parameterized hybrid retrieval (the CLI `search` verb's engine);
    the verify key pins the defaults so the oracle stays static."""
    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select(
            "doc_id",
            F.explode(
                F.filter(F.split(F.lower("text"), r"\s+", -1), lambda x: x != "")
            ).alias("token"),
        )
        .filter(F.col("token").isin(*terms))
        .groupBy("doc_id")
        .agg(F.count("*").alias("tf"))
    )
    # top-R by TakeOrdered (per-partition heaps); the row_number window then
    # only ever sees LIST_R rows and is partitioned by the probe id — the
    # multi-probe serving shape, where each query ranks its own candidates
    text_top = (
        tf.orderBy(F.col("tf").desc(), "doc_id")
        .limit(list_r)
        .withColumn("query_id", F.lit(query_vec_id))
    )
    text_ranked = text_top.select(
        "doc_id",
        F.row_number()
        .over(Window.partitionBy("query_id").orderBy(F.col("tf").desc(), "doc_id"))
        .cast("bigint")
        .alias("text_rank"),
    )

    emb = load_table(spark, sf_dir, "embeddings")
    v = emb.select("vec_id", scaled_vec("embedding").alias("sv"))
    qv = v.filter(F.col("vec_id") == query_vec_id).select(
        F.col("vec_id").alias("query_id"), F.col("sv").alias("qv")
    )
    scored = (
        v.filter(F.col("vec_id") != query_vec_id)
        .crossJoin(F.broadcast(qv))
        .select("query_id", "vec_id", cosine(F.col("sv"), F.col("qv")).alias("cos_sim"))
    )
    vec_top = scored.orderBy(F.col("cos_sim").desc(), "vec_id").limit(list_r)
    vec_ranked = vec_top.select(
        "vec_id",
        F.row_number()
        .over(Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), "vec_id"))
        .cast("bigint")
        .alias("vec_rank"),
    )

    fused = text_ranked.join(
        vec_ranked, vec_ranked.vec_id == text_ranked.doc_id, "full_outer"
    ).select(
        F.coalesce("doc_id", "vec_id").alias("doc_id"),
        "text_rank",
        "vec_rank",
        (
            F.coalesce(F.lit(1.0) / (rrf_k + F.col("text_rank")), F.lit(0.0))
            + F.coalesce(F.lit(1.0) / (rrf_k + F.col("vec_rank")), F.lit(0.0))
        ).alias("rrf_score"),
    )
    return fused.orderBy(F.col("rrf_score").desc(), "doc_id").limit(final_k)
