"""Text-analysis operators over ``documents`` (SURVEY.md §2.D, D8 + the
training-data-pipeline surface: language-ID, quality scoring, token
counting, fingerprinting).

Everything is built-in expressions (codegen'd, no Python UDFs): at 100 TB
these are embarrassingly parallel scan-side projections; the only shuffles
are the final small aggregations.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from dodo_spark.catalog import load_table
from dodo_spark.registry import register

# tiny stopword list intersecting the synthetic corpus vocabulary
STOPWORDS = ("the", "a", "of", "and", "to")
# BPE-ish pre-tokenizer: letter runs, digit runs, single punctuation marks
TOKEN_RE = r"[a-z]+|[0-9]+|[^a-z0-9\s]"


def _ws_tokens(col: str = "text") -> Column:
    """Non-empty whitespace tokens (trailing-empty semantics differ between
    engines, so empties are filtered explicitly)."""
    return F.filter(F.split(F.col(col), r"\s+", -1), lambda x: x != "")


@register(
    "text_stats",
    oracle="""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS docs,
           CAST(SUM(length(text)) AS BIGINT) AS chars_total,
           CAST(SUM(len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '')))
                AS BIGINT) AS tokens_total,
           CAST(SUM(length(text)) AS DOUBLE) / COUNT(*) AS avg_chars,
           CAST(COUNT(DISTINCT source) AS BIGINT) AS sources
    FROM documents
    GROUP BY lang
    """,
    doc="D8: corpus statistics per language — doc counts, char/token totals, "
    "source fan-in.",
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.count("*").alias("docs"),
        F.sum(F.length("text")).alias("chars_total"),
        F.sum(F.size(_ws_tokens())).cast("bigint").alias("tokens_total"),
        (F.sum(F.length("text")).cast("double") / F.count("*")).alias("avg_chars"),
        F.countDistinct("source").alias("sources"),
    )


@register(
    "text_tokens",
    oracle=f"""
    SELECT doc_id,
           CAST(len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x != ''))
                AS INTEGER) AS ws_tokens,
           CAST(len(regexp_extract_all(lower(text), '{TOKEN_RE}')) AS INTEGER) AS bpe_tokens,
           CAST(length(text) AS INTEGER) AS chars
    FROM documents
    """,
    doc="token counting: whitespace tokens + a BPE-ish regex pre-tokenization "
    "(letter runs / digit runs / punctuation marks).",
)
def text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(_ws_tokens()).alias("ws_tokens"),
        F.size(F.regexp_extract_all(F.lower("text"), F.lit(TOKEN_RE), F.lit(0))).alias(
            "bpe_tokens"
        ),
        F.length("text").cast("int").alias("chars"),
    )


_STOP_SQL = "[" + ", ".join(f"'{w}'" for w in STOPWORDS) + "]"


@register(
    "text_quality",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x != '') AS toks,
             CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS BIGINT) AS alpha_chars,
             CAST(length(text) AS BIGINT) AS chars
      FROM documents
    )
    SELECT doc_id,
           CAST(len(toks) AS INTEGER) AS n_tokens,
           CAST(alpha_chars AS DOUBLE) / chars AS alpha_ratio,
           CAST(len(list_filter(toks, x -> list_contains({_STOP_SQL}, x))) AS DOUBLE)
             / len(toks) AS stopword_ratio,
           CAST(alpha_chars AS DOUBLE) / chars * 0.4
             + (1.0 - CAST(len(list_filter(toks, x -> list_contains({_STOP_SQL}, x)))
                      AS DOUBLE) / len(toks)) * 0.3
             + least(CAST(len(toks) AS DOUBLE) / 100.0, 1.0) * 0.3 AS quality_score
    FROM t
    """,
    doc="quality scoring: alpha-char ratio, stopword ratio, length factor "
    "combined into a heuristic [0,1] score (the C4/Gopher-style rule family).",
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower("text"), r"\s+", -1), lambda x: x != "")
    t = docs.select(
        "doc_id",
        toks.alias("toks"),
        F.length(F.regexp_replace("text", "[^a-z]", "")).cast("bigint").alias("alpha_chars"),
        F.length("text").cast("bigint").alias("chars"),
    )
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS])
    n_tokens = F.size("toks")
    stop_hits = F.size(F.filter(F.col("toks"), lambda x: F.array_contains(stop_arr, x)))
    alpha_ratio = F.col("alpha_chars").cast("double") / F.col("chars")
    stop_ratio = stop_hits.cast("double") / n_tokens
    score = (
        alpha_ratio * 0.4
        + (F.lit(1.0) - stop_ratio) * 0.3
        + F.least(n_tokens.cast("double") / 100.0, F.lit(1.0)) * 0.3
    )
    return t.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        alpha_ratio.alias("alpha_ratio"),
        stop_ratio.alias("stopword_ratio"),
        score.alias("quality_score"),
    )


# language markers: first match wins (CJK chars -> zh; else stopword sets)
_LANG_MARKERS = [
    ("de", ("der", "die", "das", "und", "ist")),
    ("fr", ("le", "les", "est", "et", "dans")),
    ("es", ("el", "los", "es", "y", "como")),
    ("en", STOPWORDS),
]


@register(
    "text_lang_id",
    oracle="""
    WITH scored AS (
      SELECT lang,
             CASE
               WHEN regexp_matches(text, '[\\x{4e00}-\\x{9fff}]') THEN 'zh'
    """
    + "".join(
        f"""           WHEN len(list_filter(list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x != ''),
                     x -> list_contains([{", ".join(f"'{w}'" for w in words)}], x))) > 0 THEN '{lang}'
"""
        for lang, words in _LANG_MARKERS
    )
    + """
               ELSE 'unknown' END AS predicted
      FROM documents
    )
    SELECT lang, predicted, CAST(COUNT(*) AS BIGINT) AS docs
    FROM scored GROUP BY lang, predicted
    """,
    doc="language-ID heuristic (marker stopwords + CJK codepoint check), "
    "confusion-matrix output against the labeled lang column.",
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower("text"), r"\s+", -1), lambda x: x != "")
    pred = F.when(F.col("text").rlike("[一-鿿]"), "zh")
    for lang, words in _LANG_MARKERS:
        marker_arr = F.array(*[F.lit(w) for w in words])
        hits = F.size(F.filter(toks, lambda x: F.array_contains(marker_arr, x)))
        pred = pred.when(hits > 0, lang)
    pred = pred.otherwise("unknown")
    return (
        docs.select("lang", pred.alias("predicted"))
        .groupBy("lang", "predicted")
        .agg(F.count("*").alias("docs"))
    )


@register(
    "text_fingerprint",
    oracle="""
    SELECT doc_id,
           list_min(list_transform(
             generate_series(1, greatest(length(text) - 7, 1), 4),
             i -> md5(substring(text, i, 8)))) AS fingerprint
    FROM documents
    """,
    doc="document fingerprinting: min-hash over rolling char 8-grams "
    "(stride 4) — a winnowing-style content fingerprint stable under "
    "row order; md5 so the oracle computes identical digests.",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length("text") - 7, F.lit(1)), F.lit(4)),
        lambda i: F.md5(F.col("text").substr(i, F.lit(8))),
    )
    return docs.select("doc_id", F.array_min(grams).alias("fingerprint"))


# --------------------------------------------------------------------------
# end-to-end corpus cleaning pipeline (the LLM-training-data flagship)
# --------------------------------------------------------------------------
QUALITY_KEEP = 0.45


def _corpus_clean_oracle() -> str:
    from dodo_spark.operators.dedup import _minhash_oracle

    return f"""
    WITH q AS (
      SELECT doc_id FROM (
        SELECT doc_id,
               CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS DOUBLE)
                 / length(text) * 0.4
               + (1.0 - CAST(len(list_filter(
                     list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x != ''),
                     x -> list_contains({_STOP_SQL}, x))) AS DOUBLE)
                   / len(list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x != ''))) * 0.3
               + least(CAST(len(list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x != ''))
                            AS DOUBLE) / 100.0, 1.0) * 0.3 AS quality_score
        FROM documents
      ) WHERE quality_score >= {QUALITY_KEEP}
    ), keepers AS (
      SELECT MIN(d.doc_id) AS doc_id
      FROM documents d JOIN q ON q.doc_id = d.doc_id
      GROUP BY md5(lower(trim(d.text)))
    ), pairs AS (
      {_minhash_oracle()}
    )
    SELECT k.doc_id FROM keepers k
    WHERE k.doc_id NOT IN (SELECT doc_b FROM pairs)
    """


@register(
    "corpus_clean",
    oracle=_corpus_clean_oracle(),
    doc="End-to-end training-corpus cleaning pipeline: quality-score filter "
    f"(keep >= {QUALITY_KEEP}) -> exact dedup keeping the min doc_id per "
    "content hash -> near-dup removal dropping every doc that is the "
    "larger member of a verified MinHash pair (canonical-min rule). "
    "Composes text_quality + dedup_exact + dedup_near semantics in one "
    "dataflow: two shuffles (content hash, band key) plus one broadcast "
    "anti-join — the shape of a real 100 TB corpus-cleaning job.",
)
def corpus_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dodo_spark.operators.dedup import dedup_near

    docs = load_table(spark, sf_dir, "documents")
    q = (
        text_quality(spark, sf_dir)
        .filter(F.col("quality_score") >= QUALITY_KEEP)
        .select("doc_id")
    )
    keepers = (
        docs.join(q, "doc_id")
        .groupBy(F.md5(F.lower(F.trim(F.col("text")))).alias("content_hash"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    dropped = dedup_near(spark, sf_dir).select(F.col("doc_b").alias("doc_id")).distinct()
    return keepers.join(dropped, "doc_id", "left_anti")
