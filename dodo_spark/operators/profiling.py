"""Data-profiling operators: sketch-based heavy hitters and functional-
dependency checking — the warehouse-hygiene surface next to
``operators.stats`` (reference analogue: the per-column stats dump
``src/save.go:162`` and the genconf inference that consumes it; FD checks
are the table-rule form of the same profiling pass).

Both are exact-answer keys with a sketch/scan design that survives 100 TB:

- ``agg_heavy_hitters``: a per-partition mergeable Misra-Gries summary
  (Agarwal et al., "Mergeable Summaries", PODS'12) bounds the candidate
  set to ``partitions × k`` rows regardless of corpus size; the pigeonhole
  guarantee (a token with global freq > n/k exceeds its partition quota
  n_p/k somewhere) makes the union of partition candidates a provable
  superset of every true heavy hitter, and an exact recount of only the
  candidates reproduces the exact answer the SQL oracle computes.
- ``stats_fd_check``: one grouped countDistinct per candidate dependency,
  emitting (groups, violations, holds) per rule — no row expansion.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dodo_spark.catalog import load_table
from dodo_spark.registry import register

# Misra-Gries bucket count; threshold for "heavy" is total_tokens / MG_K.
MG_K = 64


def _mg_partition_candidates(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Mergeable Misra-Gries over one partition's token batches.

    Summary update is vectorized: add the batch's value_counts, then if
    more than MG_K counters survive, subtract the (K+1)-largest weight and
    drop non-positive counters — the mergeable-summary decrement step,
    which preserves est >= true - n_p/MG_K for every token."""
    summary = pd.Series(dtype="int64")
    for pdf in it:
        batch = pdf["tok"].value_counts()
        summary = summary.add(batch, fill_value=0)
        if len(summary) > MG_K:
            cut = summary.nlargest(MG_K + 1).iloc[-1]
            summary = summary - cut
            summary = summary[summary > 0]
    yield pd.DataFrame({"tok": summary.index.astype(str)})


@register(
    "agg_heavy_hitters",
    oracle=f"""
    WITH toks AS (
      SELECT UNNEST(STRING_SPLIT(text, ' ')) AS tok FROM documents),
    cnt AS (
      SELECT tok, CAST(COUNT(*) AS BIGINT) AS freq
      FROM toks WHERE tok <> '' GROUP BY tok)
    SELECT tok, freq
    FROM cnt
    WHERE freq > (SELECT SUM(freq) FROM cnt) / {MG_K}.0
    ORDER BY freq DESC, tok
    """,
    doc="Vocabulary heavy hitters over the document corpus, exact answer "
    "through a Misra-Gries candidate sketch: per-partition mergeable MG "
    "summaries (Arrow-batched mapInPandas, vectorized value_counts + "
    "decrement) emit <= k candidates per partition; their union is a "
    "pigeonhole-provable superset of every token with freq > n/k; an "
    "exact recount restricted to broadcast candidates + the global token "
    "count reproduces the oracle's exact HAVING answer. At 100 TB the "
    "full token multiset is never shuffled — only partitions*k candidate "
    "rows plus the recount of a handful of tokens move.",
)
def agg_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.split(F.col("text"), " ")).alias("tok")
    ).filter(F.col("tok") != "")
    candidates = (
        toks.mapInPandas(_mg_partition_candidates, "tok string").distinct()
    )
    total = toks.agg(F.count("*").alias("n_total"))
    return (
        toks.join(F.broadcast(candidates), "tok", "left_semi")
        .groupBy("tok")
        .agg(F.count("*").alias("freq"))
        .join(F.broadcast(total))
        .filter(F.col("freq") > F.col("n_total") / F.lit(float(MG_K)))
        .select("tok", "freq")
        .orderBy(F.col("freq").desc(), "tok")
    )


# Candidate dependencies checked over `part` — a mix of true FDs (the key
# determines everything) and expected violations (brand does not determine
# type in this corpus).
FD_RULES = [
    ("p_partkey", "p_name"),
    ("p_brand", "p_type"),
    ("p_type", "p_brand"),
    ("p_size", "p_type"),
]


def _fd_rule_sql(det: str, dep: str) -> str:
    return f"""
    SELECT '{det}' AS det, '{dep}' AS dep,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_violating,
           (SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) = 0) AS holds
    FROM (SELECT {det}, COUNT(DISTINCT {dep}) AS nd
          FROM part GROUP BY {det})"""


@register(
    "stats_fd_check",
    oracle=" UNION ALL ".join(_fd_rule_sql(d, p) for d, p in FD_RULES)
    + " ORDER BY det, dep",
    doc="Functional-dependency profiling: for each candidate rule X -> Y, "
    "group by X, count determinant groups and groups with more than one "
    "distinct Y (violations), emit holds = no violation. One grouped "
    "two-phase countDistinct per rule — no joins, no row expansion; each "
    "rule is an independent single-shuffle aggregate, so a 100 TB profile "
    "pass runs rules in parallel against one cached scan. The profiling "
    "twin of stats_column (reference per-column stats dump src/save.go).",
)
def stats_fd_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    frames = []
    for det, dep in FD_RULES:
        grp = part.groupBy(det).agg(F.countDistinct(dep).alias("nd"))
        frames.append(
            grp.agg(
                F.lit(det).alias("det"),
                F.lit(dep).alias("dep"),
                F.count("*").alias("n_groups"),
                F.sum((F.col("nd") > 1).cast("bigint")).alias("n_violating"),
                (F.sum((F.col("nd") > 1).cast("bigint")) == 0).alias("holds"),
            )
        )
    out = frames[0]
    for f_ in frames[1:]:
        out = out.unionAll(f_)
    return out.orderBy("det", "dep")
