"""Text-analysis operators over ``documents`` (SURVEY.md §2.D, D8 + the
training-data-pipeline surface: language-ID, quality scoring, token
counting, fingerprinting).

Everything is built-in expressions (codegen'd, no Python UDFs): at 100 TB
these are embarrassingly parallel scan-side projections; the only shuffles
are the final small aggregations.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dodo_spark.catalog import load_table
from dodo_spark.registry import register

# tiny stopword list intersecting the synthetic corpus vocabulary
STOPWORDS = ("the", "a", "of", "and", "to")
# BPE-ish pre-tokenizer: letter runs, digit runs, single punctuation marks
TOKEN_RE = r"[a-z]+|[0-9]+|[^a-z0-9\s]"
# winnowing kernel (text_winnow + dedup_winnow); defined before any operator
# so dedup.py can import them even while this module is mid-initialization
WINNOW_K = 8  # k-gram length (chars)
WINNOW_W = 4  # winnowing window (hashes)
# Polynomial (Rabin-Karp-style) k-gram hash over Unicode code points:
#   h = fold(codes[i..i+k-1], 0, (a, c) -> (a*B + c) % M)
# with M = 2^31-1 (Mersenne prime) so every intermediate fits int64
# exactly ((M-1)*B + max_codepoint < 2^40) — engine-identical integer
# arithmetic, and ~10x cheaper than the previous md5-per-position kernel
# (one md5 + hex-substring + base-conv per position vs k fused int ops).
# Cross-engine parity of ascii()/substring() code points is fuzz-tested
# (tests/test_parity.py::test_winnow_hash_cross_engine_fuzz).
WINNOW_B = 257  # polynomial base
WINNOW_M = 2147483647  # modulus 2^31-1


def _est_scan_splits(df, parallelism: int) -> int | None:
    """Estimate the scan's split count from its input files WITHOUT the
    plan->RDD conversion (``df.rdd.getNumPartitions()`` costs ~80ms of
    driver analysis per call — r13 profile: ~35 call sites x 3 bench
    runs of pure overhead). Mirrors Spark's FilePartition math:
    maxSplitBytes = min(maxPartitionBytes, max(openCostInBytes,
    totalBytes/parallelism)); each file contributes
    ceil(size/maxSplitBytes). Returns None when the frame is not a
    plain local file scan (caller falls back to the exact probe)."""
    import os
    from urllib.parse import unquote, urlparse

    try:
        files = df.inputFiles()
    except Exception:  # noqa: BLE001 — probe is best-effort
        return None
    if not files:
        return None
    spark = df.sparkSession
    try:
        mpb = int(spark.conf.get("spark.sql.files.maxPartitionBytes"))
        open_cost = int(
            spark.conf.get("spark.sql.files.openCostInBytes", "4194304")
        )
    except (TypeError, ValueError):
        return None  # suffixed forms ("128m"): fall back to exact probe
    sizes = []
    for f in files:
        u = urlparse(f)
        if u.scheme not in ("", "file"):
            return None
        try:
            sizes.append(os.path.getsize(unquote(u.path)))
        except OSError:
            return None
    total = sum(sizes) + open_cost * len(sizes)
    max_split = min(mpb, max(open_cost, total // max(1, parallelism)))
    # mirror FilePartition.getFilePartitions exactly (r13 advisor): split
    # each file into <= max_split pieces, then greedily BIN-PACK the
    # pieces (sorted descending, open-cost charged per piece) — the
    # per-file ceil() alone overestimates on many-small-files inputs,
    # which silently skipped the spread on a source that really had
    # fewer partitions than cores
    pieces: list[int] = []
    for s in sizes:
        r = s
        while r > 0:
            take = min(r, max_split)
            pieces.append(take)
            r -= take
        if s == 0:
            pieces.append(0)
    pieces.sort(reverse=True)
    parts = 0
    cur = 0
    for p in pieces:
        if cur + p > max_split and cur > 0:
            parts += 1
            cur = 0
        cur += p + open_cost
    if cur > 0:
        parts += 1
    return parts


def spread_scan(df) -> "DataFrame":
    """Round-robin repartition a CPU-heavy scan input up to core count when
    the source provides fewer splits: a single-file, single-row-group local
    input gives the whole corpus to ONE task, serializing per-doc kernels
    (winnowing measured 5.7s serial vs ~1s spread at sf0.1). No-op when the
    source already has >= cores partitions — at warehouse scale file splits
    provide the parallelism and no shuffle is added."""
    spark = df.sparkSession
    p = max(1, spark.sparkContext.defaultParallelism)
    est = _est_scan_splits(df, p)
    if est is None:
        est = df.rdd.getNumPartitions()
    if est < p:
        return df.repartition(p)
    return df


def _winnow_doc_fps_np(texts: list):
    """(doc_idx, fps) — DISTINCT winnowing fingerprints per document, the
    vectorized numpy twin of the winnow_codes/hashes_spark SQL kernel +
    window-min + array_distinct (guide §4.2: the per-position polynomial
    fold is interpreted HOF cost in Spark expressions; here it is K fused
    vector ops over the batch's concatenated code points). Bit-exact with
    the expression kernel: same code points (``ord``), same int64
    arithmetic mod 2^31-1 (every intermediate < 2^40), fuzz-tested in
    tests/test_parity.py. ``doc_idx`` is non-decreasing (np.unique order);
    callers may assume per-doc runs are contiguous. Docs shorter than
    K+W-1 (excluded upstream by the length filter both consumers apply)
    contribute zero fingerprints instead of raising."""
    import numpy as np

    n = len(texts)
    if n == 0:
        return (
            np.empty(0, dtype=np.int64),
            np.empty(0, dtype=np.int64),
        )
    lens = np.fromiter((len(t) for t in texts), dtype=np.int64, count=n)
    codes = np.frombuffer(
        "".join(texts).encode("utf-32-le", "surrogatepass"), dtype="<u4"
    ).astype(np.int64)
    starts = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=starts[1:])
    # one k-gram hash per position: fold over K shifted views of the
    # concatenated codes, with cross-document windows masked out by
    # construction (positions are generated per doc)
    n_hash = np.maximum(lens - (WINNOW_K - 1), 0)
    total_h = int(n_hash.sum())
    doc_of_h = np.repeat(np.arange(n, dtype=np.int64), n_hash)
    h_start = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(n_hash, out=h_start[1:])
    within = np.arange(total_h, dtype=np.int64) - np.repeat(
        h_start[:-1], n_hash
    )
    pos = starts[doc_of_h] + within
    acc = np.zeros(total_h, dtype=np.int64)
    for j in range(WINNOW_K):
        acc *= WINNOW_B
        acc += codes[pos + j]
        acc %= WINNOW_M
    # window minimum over W consecutive hashes inside each doc
    n_win = np.maximum(n_hash - (WINNOW_W - 1), 0)
    total_w = int(n_win.sum())
    doc_of_w = np.repeat(np.arange(n, dtype=np.int64), n_win)
    w_start = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(n_win, out=w_start[1:])
    wwithin = np.arange(total_w, dtype=np.int64) - np.repeat(
        w_start[:-1], n_win
    )
    wpos = h_start[doc_of_w] + wwithin
    m = acc[wpos]
    for j in range(1, WINNOW_W):
        np.minimum(m, acc[wpos + j], out=m)
    # distinct per doc: fingerprints are < 2^31, so (doc_idx << 31 | fp)
    # is collision-free in int64 and np.unique dedups per doc in one pass
    key = (doc_of_w << np.int64(31)) | m
    uk = np.unique(key)
    return uk >> np.int64(31), uk & np.int64((1 << 31) - 1)


def winnow_fps_stats_arrow(df) -> "DataFrame":
    """(doc_id, lang, n_fingerprints, fp_checksum) via one mapInArrow over
    (doc_id, lang, text) — count and exact-int64 sum of each doc's
    distinct winnowing fingerprints. Replaces the interpreted
    per-position HOF fold (guide §4.2); the caller applies the
    min-length filter and spread_scan first."""
    import pyarrow as pa
    from pyspark.sql import types as T

    in_fields = {f.name: f for f in df.schema.fields}
    out_schema = T.StructType(
        [
            in_fields["doc_id"],
            in_fields["lang"],
            T.StructField("n_fingerprints", T.LongType(), True),
            T.StructField("fp_checksum", T.LongType(), True),
        ]
    )

    def fn(batches):
        import numpy as np

        for batch in batches:
            if batch.num_rows == 0:
                continue
            texts = batch.column("text").to_pylist()
            doc_idx, fps = _winnow_doc_fps_np(texts)
            counts = np.bincount(doc_idx, minlength=len(texts)).astype(
                np.int64
            )
            sums = np.zeros(len(texts), dtype=np.int64)
            if len(fps):
                seg = np.flatnonzero(np.diff(doc_idx)) + 1
                run_starts = np.concatenate(([0], seg))
                sums[doc_idx[run_starts]] = np.add.reduceat(fps, run_starts)
            yield pa.record_batch(
                [
                    batch.column("doc_id"),
                    batch.column("lang"),
                    pa.array(counts, type=pa.int64()),
                    pa.array(sums, type=pa.int64()),
                ],
                names=["doc_id", "lang", "n_fingerprints", "fp_checksum"],
            )

    return df.select("doc_id", "lang", "text").mapInArrow(fn, out_schema)


def winnow_fps_postings_arrow(df) -> "DataFrame":
    """(doc_id, f) exploded distinct winnowing fingerprints via one
    mapInArrow over (doc_id, text) — the posting-list form dedup_winnow
    joins on. Same kernel as winnow_fps_stats_arrow."""
    import pyarrow as pa
    from pyspark.sql import types as T

    in_fields = {f.name: f for f in df.schema.fields}
    out_schema = T.StructType(
        [in_fields["doc_id"], T.StructField("f", T.LongType(), True)]
    )

    def fn(batches):
        for batch in batches:
            if batch.num_rows == 0:
                continue
            texts = batch.column("text").to_pylist()
            doc_idx, fps = _winnow_doc_fps_np(texts)
            yield pa.record_batch(
                [
                    batch.column("doc_id").take(pa.array(doc_idx)),
                    pa.array(fps, type=pa.int64()),
                ],
                names=["doc_id", "f"],
            )

    return df.select("doc_id", "text").mapInArrow(fn, out_schema)


def winnow_codes_spark() -> str:
    """Spark SQL expr: per-character Unicode code points of `text`."""
    return "transform(sequence(1, length(text)), p -> ascii(substring(text, p, 1)))"


def winnow_hashes_spark() -> str:
    """Spark SQL expr: per-position k-gram polynomial hashes from `codes`."""
    return (
        f"transform(sequence(1, greatest(1, size(codes) - {WINNOW_K - 1})), "
        f"i -> aggregate(slice(codes, i, {WINNOW_K}), 0L, "
        f"(a, c) -> (a * {WINNOW_B} + CAST(c AS BIGINT)) % {WINNOW_M}))"
    )


def sql_winnow_hs(select_cols: str) -> str:
    """DuckDB subquery body: ({select_cols}, h) where h is the per-position
    k-gram hash list — the oracle twin of winnow_codes/hashes_spark."""
    return f"""
      SELECT {select_cols},
             list_transform(
               generate_series(1, greatest(1, len(codes) - {WINNOW_K} + 1)),
               i -> list_reduce(list_prepend(CAST(0 AS BIGINT),
                      codes[CAST(i AS INTEGER):CAST(i + {WINNOW_K} - 1 AS INTEGER)]),
                      (a, c) -> (a * {WINNOW_B} + c) % {WINNOW_M})) AS h
      FROM (SELECT *, list_transform(generate_series(1, len(text)),
              p -> ascii(substring(text, CAST(p AS INTEGER), 1))) AS codes
            FROM documents WHERE len(text) >= {WINNOW_K + WINNOW_W - 1}) src"""


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


# --------------------------------------------------------------------------
# benchmark decontamination + repetition + PII redaction
# --------------------------------------------------------------------------
NGRAM_N = 5  # word n-gram width for decontamination / repetition
BENCH_DOCS = 20  # doc_id < BENCH_DOCS plays the held-out benchmark set


def _word_ngrams(col: str = "text", n: int = NGRAM_N) -> Column:
    """Word n-grams as space-joined strings; empty array when the doc has
    fewer than n tokens (matches the oracle's empty generate_series).

    Built by zip_with-folding n shifted slices of the token array
    (grams[i] = t[i] || ' ' || ... || t[i+n-1]) instead of a
    transform(sequence) of per-position slice+concat_ws calls — n-1
    array-level passes over the doc rather than one slice allocation per
    gram position, ~3x faster at sf0.1 and byte-identical output
    (equality fuzzed across the corpus and short-doc edge cases). The
    greatest(...,0) clamp makes slices empty below n tokens, so the
    short-doc result is the same empty array the old when() produced;
    NULL text also stays an empty array (greatest() skips the NULL size,
    but slice/zip_with would propagate NULL — the coalesce pins the
    documented contract for null input too)."""
    toks = _ws_tokens(col)
    m = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    parts = [F.slice(toks, j + 1, m) for j in range(n)]
    out = parts[0]
    for p in parts[1:]:
        out = F.zip_with(out, p, lambda a, b: F.concat(a, F.lit(" "), b))
    return F.coalesce(out, F.array().cast("array<string>"))


_SQL_TOKS = "list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '')"
_SQL_NGRAMS_CTE = f"""
    WITH toks AS (
      SELECT doc_id, {_SQL_TOKS} AS t FROM documents
    ), ngi AS (
      SELECT doc_id, t,
             unnest(generate_series(1, greatest(len(t) - {NGRAM_N - 1}, 0))) AS i
      FROM toks
    ), ng AS (
      SELECT doc_id, array_to_string(t[i:i+{NGRAM_N - 1}], ' ') AS ng FROM ngi
    )"""


@register(
    "text_decontaminate",
    oracle=f"""
    {_SQL_NGRAMS_CTE}, bench AS (
      SELECT DISTINCT ng FROM ng WHERE doc_id < {BENCH_DOCS}
    ), corp AS (
      SELECT DISTINCT doc_id, ng FROM ng WHERE doc_id >= {BENCH_DOCS}
    )
    -- corpus doc list comes from documents, NOT from the n-gram stream:
    -- a doc shorter than the n-gram width has no n-grams but is still a
    -- (trivially clean) corpus member, matching the Spark plan
    SELECT d.doc_id,
           CAST(COUNT(b.ng) > 0 AS BOOLEAN) AS contaminated,
           CAST(COUNT(b.ng) AS BIGINT) AS matched_ngrams
    FROM (SELECT doc_id FROM documents WHERE doc_id >= {BENCH_DOCS}) d
    LEFT JOIN corp c ON c.doc_id = d.doc_id
    LEFT JOIN bench b ON b.ng = c.ng
    GROUP BY d.doc_id
    """,
    doc="Benchmark decontamination (training-data hygiene): flag every "
    f"corpus doc sharing a {NGRAM_N}-gram with the held-out benchmark set "
    f"(doc_id < {BENCH_DOCS}) — the standard n-gram-overlap test run "
    "before training. Plan shape: per-doc n-grams dedupe SCAN-SIDE "
    "(array_distinct — the corpus n-gram stream is never shuffled), the "
    "tiny benchmark n-gram set BROADCASTS, and the match join is INNER "
    "so only HITS shuffle for the per-doc count (at 100 TB almost every "
    "doc is clean, so that shuffle is near-empty); clean docs rejoin via "
    "a doc_id-only left join.",
)
def text_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread_scan(load_table(spark, sf_dir, "documents"))
    ngd = docs.select(
        "doc_id", F.explode(F.array_distinct(_word_ngrams())).alias("ng")
    )
    bench = ngd.filter(F.col("doc_id") < BENCH_DOCS).select("ng").distinct()
    matches = (
        ngd.filter(F.col("doc_id") >= BENCH_DOCS)
        .join(F.broadcast(bench), "ng")
        .groupBy("doc_id")
        .agg(F.count("*").alias("m"))
    )
    corpus_docs = docs.filter(F.col("doc_id") >= BENCH_DOCS).select("doc_id")
    hit = F.coalesce(F.col("m"), F.lit(0))
    return corpus_docs.join(matches, "doc_id", "left").select(
        "doc_id",
        (hit > 0).alias("contaminated"),
        hit.cast("bigint").alias("matched_ngrams"),
    )


@register(
    "text_repetition",
    oracle=f"""
    {_SQL_NGRAMS_CTE}
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS ngrams_total,
           CAST(COUNT(DISTINCT ng) AS BIGINT) AS ngrams_distinct,
           1.0 - CAST(COUNT(DISTINCT ng) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
             AS dup_ratio
    FROM ng GROUP BY doc_id
    """,
    doc="Within-document repetition (Gopher-style quality signal): the "
    f"fraction of duplicated word {NGRAM_N}-grams per doc. Computed "
    "entirely scan-side (ngram array -> size vs array_distinct size): "
    "no explode, NO shuffle — the cheapest possible shape for a per-doc "
    "signal at 100 TB. Docs shorter than the n-gram width drop out, "
    "matching the oracle's empty generate_series.",
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the zip_with n-gram fold is a heavy per-doc kernel: spread the scan
    # so a single-split local input doesn't serialize it on one task
    # (r13 profile: 1.6s in ONE job on 32 cores); no-op at warehouse
    # scale where file splits provide the parallelism
    docs = spread_scan(load_table(spark, sf_dir, "documents"))
    grams = _word_ngrams()
    # explode(array(...)) barrier: pins the n-gram fold ABOVE the spread
    # exchange (a bare filter on size(g) would be pushed below it, back
    # onto the single scan task) and evaluates it ONCE (the filter used
    # to recompute the whole chain — predicates are exempt from codegen
    # subexpression elimination, and the lambda chain runs interpreted)
    g = docs.select(
        "doc_id", F.explode(F.array(grams)).alias("g")
    ).filter(F.size("g") > 0)
    total = F.size("g").cast("bigint")
    distinct = F.size(F.array_distinct("g")).cast("bigint")
    return g.select(
        "doc_id",
        total.alias("ngrams_total"),
        distinct.alias("ngrams_distinct"),
        (F.lit(1.0) - distinct.cast("double") / total.cast("double")).alias("dup_ratio"),
    )


PII_EMAIL_RE = r"[a-z0-9.]+@[a-z0-9.]+"
PII_PHONE_RE = r"[0-9]{3}-555-[0-9]{4}"


@register(
    "text_pii_redact",
    oracle=f"""
    WITH synth AS (
      SELECT c_custkey,
             'contact ' || lower(replace(c_name, '#', '')) || '@example.com'
             || ' or call ' || lpad(CAST(c_custkey % 1000 AS VARCHAR), 3, '0')
             || '-555-' || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0')
             || ' about order ' || CAST(c_custkey AS VARCHAR) AS body
      FROM customer WHERE c_custkey < 500
    )
    SELECT c_custkey,
           regexp_replace(regexp_replace(body, '{PII_EMAIL_RE}', '[EMAIL]', 'g'),
                          '{PII_PHONE_RE}', '[PHONE]', 'g') AS redacted,
           CAST(len(regexp_extract_all(body, '{PII_EMAIL_RE}')) AS BIGINT) AS emails_found,
           CAST(len(regexp_extract_all(body, '{PII_PHONE_RE}')) AS BIGINT) AS phones_found
    FROM synth
    """,
    doc="PII redaction (training-data hygiene): regex-scrub emails and "
    "phone numbers to typed placeholders, with per-doc found-counts for "
    "the scrub audit. Pure scan-side regexp_replace/extract_all — "
    "codegen'd, no shuffle, no Python. PII text is synthesized "
    "deterministically from the customer table so both engines see the "
    "same corpus (the testdata has no real PII).",
)
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 500)
    k = F.col("c_custkey")
    body = F.concat(
        F.lit("contact "),
        F.lower(F.regexp_replace("c_name", "#", "")),
        F.lit("@example.com or call "),
        F.lpad((k % 1000).cast("string"), 3, "0"),
        F.lit("-555-"),
        F.lpad((k % 10000).cast("string"), 4, "0"),
        F.lit(" about order "),
        k.cast("string"),
    )
    syn = cust.select("c_custkey", body.alias("body"))
    red = F.regexp_replace(
        F.regexp_replace("body", PII_EMAIL_RE, "[EMAIL]"), PII_PHONE_RE, "[PHONE]"
    )
    return syn.select(
        "c_custkey",
        red.alias("redacted"),
        F.size(F.regexp_extract_all("body", F.lit(PII_EMAIL_RE), 0)).cast("bigint").alias("emails_found"),
        F.size(F.regexp_extract_all("body", F.lit(PII_PHONE_RE), 0)).cast("bigint").alias("phones_found"),
    )


CHUNK_CHARS = 200
CHUNK_STRIDE = 150  # 50-char overlap between consecutive chunks


@register(
    "text_chunk_split",
    oracle=f"""
    WITH sized AS (
      SELECT doc_id, text,
             1 + (greatest(0, len(text) - {CHUNK_CHARS}) + {CHUNK_STRIDE} - 1)
                   // {CHUNK_STRIDE} AS n_chunks
      FROM documents
    ), chunks AS (
      SELECT doc_id, unnest(generate_series(0, n_chunks - 1)) AS chunk_id
      FROM sized
    )
    SELECT c.doc_id, CAST(c.chunk_id AS BIGINT) AS chunk_id,
           substr(s.text, 1 + c.chunk_id * {CHUNK_STRIDE}, {CHUNK_CHARS})
             AS chunk_text,
           CAST(len(substr(s.text, 1 + c.chunk_id * {CHUNK_STRIDE},
                           {CHUNK_CHARS})) AS BIGINT) AS chunk_chars
    FROM chunks c JOIN sized s ON s.doc_id = c.doc_id
    """,
    doc="RAG-style document chunking: sliding character windows of "
    f"{CHUNK_CHARS} chars with {CHUNK_CHARS - CHUNK_STRIDE}-char overlap "
    "(the standard retrieval-corpus preprocessing step before embedding). "
    "Chunk count is exact integer arithmetic (ceil-div on non-negative "
    "lengths, engine-identical), chunk ids come from sequence+explode and "
    "the chunk text from substr — one scan-side Generate, NO shuffle, no "
    "Python; short docs still yield exactly one chunk. At 100 TB this is "
    "the map stage feeding the embedding UDF: output rows ~ L/stride per "
    "doc, partition sizes grow by the same factor, nothing exchanges.",
)
def text_chunk_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    extra = F.greatest(F.lit(0).cast("bigint"), F.length("text") - CHUNK_CHARS)
    n_chunks = F.lit(1) + (extra + (CHUNK_STRIDE - 1)) / F.lit(CHUNK_STRIDE)
    sized = docs.select(
        "doc_id", "text", F.floor(n_chunks).cast("bigint").alias("n_chunks")
    )
    chunks = sized.select(
        "doc_id",
        "text",
        F.explode(F.sequence(F.lit(0).cast("bigint"), F.col("n_chunks") - 1)).alias(
            "chunk_id"
        ),
    )
    chunk_text = F.substring(
        F.col("text"), F.lit(1) + (F.col("chunk_id") * CHUNK_STRIDE).cast("int"), CHUNK_CHARS
    )
    return chunks.select(
        "doc_id",
        F.col("chunk_id").cast("bigint").alias("chunk_id"),
        chunk_text.alias("chunk_text"),
        F.length(chunk_text).cast("bigint").alias("chunk_chars"),
    )


LONG_WORD_CHARS = 7


@register(
    "text_readability",
    oracle=f"""
    WITH per_doc AS (
      SELECT lang,
             CAST(len(list_filter(regexp_split_to_array(text, '\\s+'),
                                  x -> x != '')) AS BIGINT) AS words,
             CAST(greatest(1, len(regexp_extract_all(text, '[.!?]'))) AS BIGINT)
               AS sentences,
             CAST(len(list_filter(regexp_split_to_array(text, '\\s+'),
                                  x -> length(x) >= {LONG_WORD_CHARS})) AS BIGINT)
               AS long_words
      FROM documents
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS docs,
           CAST(SUM(words) AS BIGINT) AS words_total,
           CAST(SUM(sentences) AS BIGINT) AS sentences_total,
           CAST(SUM(long_words) AS BIGINT) AS long_words_total,
           CAST(SUM(words) AS DOUBLE) / SUM(sentences) AS words_per_sentence,
           CAST(SUM(long_words) AS DOUBLE) / SUM(words) AS long_word_ratio
    FROM per_doc GROUP BY lang
    """,
    doc="Readability metrics per language (the complexity signal next to "
    "text_quality in corpus curation — a syllable-free LIX/Flesch "
    "surrogate): words per sentence and long-word ratio from exact "
    "integer token/sentence/long-word counts (sentence count floors at 1 "
    "so fragment docs divide cleanly); the two ratios are single double "
    "divisions of identical exact integers. Pure scan-side regex + "
    "filter, one tiny shuffle on lang.",
)
def text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", r"\s+", -1), lambda x: x != "")
    words = F.size(toks).cast("bigint")
    sentences = F.greatest(
        F.lit(1).cast("bigint"), F.size(F.regexp_extract_all("text", F.lit("[.!?]"), 0)).cast("bigint")
    )
    long_words = F.size(
        F.filter(toks, lambda x: F.length(x) >= LONG_WORD_CHARS)
    ).cast("bigint")
    per_doc = docs.select(
        "lang", words.alias("words"), sentences.alias("sentences"), long_words.alias("long_words")
    )
    return per_doc.groupBy("lang").agg(
        F.count("*").alias("docs"),
        F.sum("words").cast("bigint").alias("words_total"),
        F.sum("sentences").cast("bigint").alias("sentences_total"),
        F.sum("long_words").cast("bigint").alias("long_words_total"),
        (F.sum("words").cast("double") / F.sum("sentences")).alias("words_per_sentence"),
        (F.sum("long_words").cast("double") / F.sum("words")).alias("long_word_ratio"),
    )


COOC_MIN_DF = 20  # vocabulary bound: tokens must appear in >= this many docs
COOC_MIN_LEN = 4  # and be at least this long (drops particles/stopwords)
COOC_MIN_PAIR = 5  # pair support floor
COOC_TOP_K = 20


@register(
    "text_cooccur",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(list_distinct(list_filter(
               regexp_split_to_array(lower(text), '\\s+'),
               x -> length(x) >= {COOC_MIN_LEN}))) AS t
      FROM documents
    ), df AS (
      SELECT t, CAST(COUNT(*) AS BIGINT) AS df FROM toks
      GROUP BY t HAVING COUNT(*) >= {COOC_MIN_DF}
    ), posts AS (
      SELECT toks.doc_id, toks.t, df.df FROM toks JOIN df ON df.t = toks.t
    ), pairs AS (
      SELECT a.t AS t1, b.t AS t2,
             CAST(COUNT(*) AS BIGINT) AS n_ab,
             MIN(a.df) AS n_a, MIN(b.df) AS n_b
      FROM posts a JOIN posts b ON b.doc_id = a.doc_id AND a.t < b.t
      GROUP BY a.t, b.t HAVING COUNT(*) >= {COOC_MIN_PAIR}
    ), nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents)
    SELECT t1, t2, n_ab,
           (CAST(n_ab AS DOUBLE) * (SELECT n FROM nd))
             / (CAST(n_a AS DOUBLE) * n_b) AS lift
    FROM pairs
    ORDER BY lift DESC, t1, t2 LIMIT {COOC_TOP_K}
    """,
    doc="Collocation mining (co-occurrence lift, the integer core of "
    "PMI-based phrase detection): per-doc DISTINCT tokens filter against "
    "an IN-PLAN vocabulary (df >= threshold, no driver literals — the "
    "oracle derives the same vocabulary), surviving postings self-join "
    "per doc into ordered pairs, and lift = P(ab)/(P(a)P(b)) is a single "
    "double division of exact integer counts (log-free, so "
    "engine-identical; ranking by lift == ranking by PMI since log is "
    "monotone). Scale shape: the pair join is bucketed by doc_id and "
    "bounded by the VOCABULARY selectivity per doc, not raw token count "
    "— the df filter is what keeps v_doc^2 small, exactly how production "
    "collocation miners bound their pair space. Top-k is "
    "TakeOrderedAndProject.",
)
def text_cooccur(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.filter(
                    F.split(F.lower("text"), r"\s+", -1),
                    lambda x: F.length(x) >= COOC_MIN_LEN,
                )
            )
        ).alias("t"),
        # postings feed both the df table and the pair join; checkpoint so
        # the tokenize+explode scan runs once, not once per consumer
    ).localCheckpoint(eager=False)
    df = (
        toks.groupBy("t")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") >= COOC_MIN_DF)
    )
    posts = toks.join(F.broadcast(df), "t").select("doc_id", "t", "df")
    a = posts.alias("a")
    b = posts.alias("b")
    pairs = (
        a.join(b, (F.col("b.doc_id") == F.col("a.doc_id")) & (F.col("a.t") < F.col("b.t")))
        .groupBy(F.col("a.t").alias("t1"), F.col("b.t").alias("t2"))
        .agg(
            F.count("*").alias("n_ab"),
            F.min("a.df").alias("n_a"),
            F.min("b.df").alias("n_b"),
        )
        .filter(F.col("n_ab") >= COOC_MIN_PAIR)
    )
    n_docs = docs.agg(F.count("*").alias("n"))
    lift = (F.col("n_ab").cast("double") * F.col("n")) / (
        F.col("n_a").cast("double") * F.col("n_b")
    )
    return (
        pairs.crossJoin(F.broadcast(n_docs))
        .select("t1", "t2", "n_ab", lift.alias("lift"))
        .orderBy(F.col("lift").desc(), "t1", "t2")
        .limit(COOC_TOP_K)
    )


@register(
    "text_winnow",
    oracle=f"""
    WITH hs AS (
      {sql_winnow_hs("doc_id, lang")}
    ), fp AS (
      SELECT doc_id, lang,
             list_distinct(list_transform(
               generate_series(1, len(h) - {WINNOW_W} + 1),
               i -> list_min(h[CAST(i AS INTEGER):CAST(i + {WINNOW_W} - 1 AS INTEGER)])))
               AS fps
      FROM hs
    )
    SELECT doc_id, lang,
           CAST(len(fps) AS BIGINT) AS n_fingerprints,
           CAST(list_sum(fps) AS BIGINT) AS fp_checksum
    FROM fp
    """,
    doc="Winnowing document fingerprints (the MOSS local-fingerprinting "
    f"algorithm, Schleimer et al. SIGMOD'03): {WINNOW_K}-gram hashes, "
    f"then the minimum of every {WINNOW_W}-hash window is selected — "
    "guaranteeing any shared substring of length >= k+w-1 contributes a "
    "shared fingerprint, the property substring-level dedup needs that "
    "whole-doc minhash (dedup_near) lacks. Entirely scan-side "
    "higher-order functions (transform over positions, array_min over "
    "slices, array_distinct) — no shuffle, no Python. Hashes are "
    "polynomial Rabin-Karp k-gram hashes over code points in exact int64 "
    "arithmetic (WINNOW_B/WINNOW_M, engine-identical; replaced the "
    "md5-per-position kernel for ~2x wall-clock at identical plan "
    "shape). Sub-(k+w-1) docs are excluded scan-side.",
)
def text_winnow(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(
        F.length("text") >= WINNOW_K + WINNOW_W - 1
    )
    # r14: the interpreted per-position HOF fold (transform + aggregate +
    # slice per k-gram) moved to the vectorized numpy kernel behind ONE
    # mapInArrow (guide §4.2) — same fingerprints bit-exactly
    # (tests/test_parity.py fuzzes the two kernels against each other);
    # spread_scan still provides the task parallelism on single-split
    # local inputs.
    return winnow_fps_stats_arrow(spread_scan(docs))


ER_BLOCK_CHARS = 3  # blocking key: name prefix (perturbation never touches it)
ER_MAX_EDIT = 2  # match threshold


@register(
    "entity_resolution",
    oracle=f"""
    WITH registry AS (
      SELECT DISTINCT p_name AS clean_name FROM part
    ), dirty AS (
      -- deterministic corruption: delete one mid-string character (never
      -- inside the blocking prefix), keyed by the part key
      SELECT p_partkey, p_name AS orig_name,
             substring(p_name, 1,
                       CAST(4 + p_partkey % (strlen(p_name) - 4) AS INTEGER) - 1)
             || substring(p_name,
                          CAST(4 + p_partkey % (strlen(p_name) - 4) AS INTEGER) + 1)
               AS dirty_name
      FROM part
    ), cand AS (
      SELECT d.p_partkey, d.orig_name, d.dirty_name, r.clean_name,
             levenshtein(d.dirty_name, r.clean_name) AS lev
      FROM dirty d JOIN registry r
        ON substring(r.clean_name, 1, {ER_BLOCK_CHARS})
           = substring(d.dirty_name, 1, {ER_BLOCK_CHARS})
      WHERE levenshtein(d.dirty_name, r.clean_name) <= {ER_MAX_EDIT}
    ), best AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY p_partkey
                                   ORDER BY lev, clean_name) AS rn
      FROM cand
    )
    SELECT substring(d.dirty_name, 1, {ER_BLOCK_CHARS}) AS block,
           CAST(COUNT(*) AS BIGINT) AS n_dirty,
           CAST(COUNT(b.p_partkey) AS BIGINT) AS n_matched,
           CAST(SUM(CASE WHEN b.clean_name = d.orig_name THEN 1 ELSE 0 END)
                AS BIGINT) AS n_correct
    FROM dirty d LEFT JOIN (SELECT * FROM best WHERE rn = 1) b
      ON b.p_partkey = d.p_partkey
    GROUP BY block ORDER BY block
    """,
    doc="Entity resolution / record linkage (the dedup family's fuzzy "
    "cousin — matching dirty strings back to a clean registry): dirty "
    "records are the part names with one deterministically-deleted "
    "mid-string character; candidates come from a BLOCKED join (prefix "
    "block key — the standard way record linkage avoids the n x m cross "
    "product; the broadcastable registry makes the block join a map-side "
    "lookup), scored by built-in levenshtein (JVM-side in Spark, native "
    "in DuckDB — identical edit-distance definition), best match per "
    "record by (distance, name) tiebreak, and the rollup reports match "
    "and accuracy counts per block. At 100 TB the registry side is the "
    "broadcast dimension and dirty records never shuffle.",
)
def entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    part = load_table(spark, sf_dir, "part")
    registry = part.select(F.col("p_name").alias("clean_name")).distinct()
    dirty = part.select(
        "p_partkey",
        F.col("p_name").alias("orig_name"),
        F.concat(
            F.expr(f"substring(p_name, 1, (4 + p_partkey % (length(p_name) - 4)) - 1)"),
            F.expr(f"substring(p_name, (4 + p_partkey % (length(p_name) - 4)) + 1)"),
        ).alias("dirty_name"),
    )
    cand = (
        dirty.join(
            F.broadcast(registry),
            F.substring("clean_name", 1, ER_BLOCK_CHARS)
            == F.substring("dirty_name", 1, ER_BLOCK_CHARS),
        )
        .withColumn("lev", F.levenshtein("dirty_name", "clean_name"))
        .filter(F.col("lev") <= ER_MAX_EDIT)
    )
    w = Window.partitionBy("p_partkey").orderBy("lev", "clean_name")
    best = cand.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    joined = dirty.join(
        best.select("p_partkey", "clean_name"), "p_partkey", "left"
    )
    return (
        joined.groupBy(F.substring("dirty_name", 1, ER_BLOCK_CHARS).alias("block"))
        .agg(
            F.count("*").alias("n_dirty"),
            F.count("clean_name").alias("n_matched"),
            F.sum(F.when(F.col("clean_name") == F.col("orig_name"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_correct"),
        )
        .orderBy("block")
    )


BOILER_MIN_DOCS = 2  # a chunk shared by >= this many docs is boilerplate


@register(
    "text_boilerplate_chunks",
    oracle=f"""
    WITH sized AS (
      SELECT doc_id, text,
             1 + (greatest(0, len(text) - {CHUNK_CHARS}) + {CHUNK_STRIDE} - 1)
                   // {CHUNK_STRIDE} AS n_chunks
      FROM documents
    ), chunks AS (
      SELECT doc_id,
             md5(substr(text, 1 + CAST(i AS INTEGER) * {CHUNK_STRIDE},
                        {CHUNK_CHARS})) AS chunk_md5,
             CAST(len(substr(text, 1 + CAST(i AS INTEGER) * {CHUNK_STRIDE},
                             {CHUNK_CHARS})) AS BIGINT) AS chunk_chars
      FROM sized, unnest(generate_series(0, n_chunks - 1)) AS t(i)
    )
    SELECT chunk_md5,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS occurrences,
           CAST(MIN(chunk_chars) AS BIGINT) AS chunk_chars
    FROM chunks
    GROUP BY chunk_md5
    HAVING COUNT(DISTINCT doc_id) >= {BOILER_MIN_DOCS}
    """,
    doc="Boilerplate-chunk detection (the training-data cleanup that "
    "removes repeated headers/footers/navigation text): the corpus is "
    "chunked with text_chunk_split's sliding-window formula, chunks "
    "group on their md5 digest computed scan-side — only 16-byte "
    "digests and counters shuffle, never chunk text, multimodal_dedup's "
    "scale idiom — and any chunk appearing in >= "
    f"{BOILER_MIN_DOCS} distinct documents surfaces with its document "
    "reach and occurrence mass. Downstream cleanup is a broadcast "
    "anti-join of this (small) digest set against the chunk stream.",
)
def text_boilerplate_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    extra = F.greatest(F.lit(0).cast("bigint"), F.length("text") - CHUNK_CHARS)
    n_chunks = F.floor(
        F.lit(1) + (extra + (CHUNK_STRIDE - 1)) / F.lit(CHUNK_STRIDE)
    ).cast("bigint")
    chunks = docs.select(
        "doc_id",
        "text",
        F.explode(F.sequence(F.lit(0).cast("bigint"), n_chunks - 1)).alias("i"),
    )
    chunk_text = F.substring(
        F.col("text"), F.lit(1) + (F.col("i") * CHUNK_STRIDE).cast("int"), CHUNK_CHARS
    )
    per = chunks.select(
        "doc_id",
        F.md5(chunk_text).alias("chunk_md5"),
        F.length(chunk_text).cast("bigint").alias("chunk_chars"),
    )
    return (
        per.groupBy("chunk_md5")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count("*").alias("occurrences"),
            F.min("chunk_chars").alias("chunk_chars"),
        )
        .filter(F.col("n_docs") >= BOILER_MIN_DOCS)
    )


# --------------------------------------------------------------------------
# sequence packing + domain mixing (training-data pipeline, round 6)
# --------------------------------------------------------------------------
PACK_SEQ_TOKENS = 256  # power of two: x/256 is exact in binary FP, so
# floor(cum/L) is bit-identical across engines


@register(
    "corpus_pack_sequences",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang,
             len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x != ''))
             AS t
      FROM documents
    ), nz AS (
      SELECT * FROM toks WHERE t > 0
    ), c AS (
      SELECT lang, doc_id, t,
             SUM(t) OVER (PARTITION BY lang ORDER BY doc_id
                          ROWS UNBOUNDED PRECEDING) AS cum
      FROM nz
    ), s AS (
      SELECT lang, t,
             CAST(floor((cum - t) / {PACK_SEQ_TOKENS}.0) AS BIGINT) AS seq_first,
             CAST(floor((cum - 1) / {PACK_SEQ_TOKENS}.0) AS BIGINT) AS seq_last
      FROM c
    )
    SELECT lang, seq_first AS seq_id,
           CAST(COUNT(*) AS BIGINT) AS docs_started,
           CAST(SUM(CASE WHEN seq_last != seq_first THEN 1 ELSE 0 END)
                AS BIGINT) AS split_docs,
           CAST(SUM(t) AS BIGINT) AS tokens_started
    FROM s GROUP BY lang, seq_first ORDER BY lang, seq_id
    """,
    doc="Training-data sequence packing (concat-and-chunk, the GPT-style "
    "pretraining layout): documents are concatenated in doc_id order and "
    "cut into fixed context windows of "
    f"{PACK_SEQ_TOKENS} whitespace tokens; each doc lands at "
    "[cum-t, cum) in its shard's token stream, so its first/last sequence "
    "ids are pure floor-divisions of a running sum — one window cumsum "
    "per shard, no sequential loop. Packing is PER-LANG shard "
    "(partitionBy lang), the scale posture: a 100 TB corpus packs each "
    "shard independently (no global sort, shards = parallelism), exactly "
    "how packed-sequence writers shard in practice. Output per (lang, "
    "sequence): docs started, docs split across a boundary (the "
    "cross-document-attention accounting the training side needs), and "
    "tokens contributed. Sequence capacity is a power of two so the "
    "floor-division is exact in binary FP on both engines; zero-token "
    "docs are excluded (they occupy no stream position).",
)
def corpus_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    L = PACK_SEQ_TOKENS
    toks = docs.select(
        "doc_id", "lang", F.size(_ws_tokens()).cast("bigint").alias("t")
    ).filter(F.col("t") > 0)
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = toks.withColumn("cum", F.sum("t").over(w))
    s = c.select(
        "lang",
        "t",
        F.floor((F.col("cum") - F.col("t")) / F.lit(float(L))).alias("seq_first"),
        F.floor((F.col("cum") - 1) / F.lit(float(L))).alias("seq_last"),
    )
    return (
        s.groupBy("lang", F.col("seq_first").alias("seq_id"))
        .agg(
            F.count("*").alias("docs_started"),
            F.sum((F.col("seq_last") != F.col("seq_first")).cast("bigint")).alias(
                "split_docs"
            ),
            F.sum("t").alias("tokens_started"),
        )
        .orderBy("lang", "seq_id")
    )


# target mixture for corpus_mix_waterfill, in PER-MILLE integers so every
# window sum and comparison is exact integer arithmetic (float weights would
# ride multi-add window sums whose association order may differ by an ulp
# between engines); deliberately over-weights zh so the smallest domain
# SATURATES at the test corpora (the interesting branch)
MIX_WEIGHTS_PM = {"zh": 500, "en": 200, "de": 100, "es": 100, "fr": 100}


def _mix_weight_sql() -> str:
    return (
        "CASE lang "
        + " ".join(f"WHEN '{k}' THEN {v}" for k, v in sorted(MIX_WEIGHTS_PM.items()))
        + " ELSE 0 END"
    )


@register(
    "corpus_mix_waterfill",
    oracle=f"""
    WITH avail AS (
      SELECT lang,
             CAST(SUM(len(list_filter(regexp_split_to_array(text, '\\s+'),
                                      x -> x != ''))) AS BIGINT) AS avail_tokens,
             CAST({_mix_weight_sql()} AS BIGINT) AS w
      FROM documents GROUP BY lang
    ), budget AS (
      SELECT CAST(SUM(avail_tokens) // 2 AS BIGINT) AS b FROM avail
    ), ranked AS (
      SELECT lang, avail_tokens, w,
             COALESCE(SUM(avail_tokens) OVER (
               ORDER BY CAST(avail_tokens AS DOUBLE) / w, lang
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS prefix_avail,
             SUM(w) OVER (ORDER BY CAST(avail_tokens AS DOUBLE) / w, lang
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS suffix_w
      FROM avail
    ), flagged AS (
      SELECT r.*, b,
             avail_tokens * suffix_w < (b - prefix_avail) * w AS saturated
      FROM ranked r, budget
    ), final AS (
      SELECT f.*,
             b - COALESCE(SUM(CASE WHEN saturated THEN avail_tokens END)
                          OVER (), 0) AS remaining,
             SUM(CASE WHEN NOT saturated THEN w ELSE 0 END) OVER () AS unsat_w
      FROM flagged f
    )
    SELECT lang, avail_tokens,
           CAST(w AS DOUBLE) / 1000 AS target_weight,
           CAST(CASE WHEN saturated THEN avail_tokens
                     ELSE remaining * w // unsat_w END AS BIGINT) AS take_tokens,
           saturated
    FROM final ORDER BY lang
    """,
    doc="Training-data domain mixing by WATERFILLING: given per-domain "
    "available token mass and target mixture weights, allocate a total "
    "token budget (half the corpus here) so every domain gets "
    "budget*weight tokens unless it cannot supply them — saturated "
    "domains contribute everything they have and the shortfall "
    "redistributes over the rest in weight proportion (the closed-form "
    "threshold: sort domains by avail/weight ascending; a domain "
    "saturates iff its ratio is below the water level computed assuming "
    "all smaller-ratio domains already saturated). One per-domain "
    "aggregate plus window arithmetic over the handful of domain rows — "
    "the 100 TB cost is the token count itself, which any mixing plan "
    "needs. Weights are per-mille INTEGERS and the saturation test is "
    "cross-multiplied, so every sum/comparison/allocation is exact "
    "integer arithmetic (the one double is a single IEEE division used "
    "only for ordering — deterministic on both engines); the zh-heavy "
    "target exercises the saturated branch on the test corpora.",
)
def corpus_mix_waterfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    expr = None
    for k, v in sorted(MIX_WEIGHTS_PM.items()):
        expr = (
            F.when(F.col("lang") == k, F.lit(v))
            if expr is None
            else expr.when(F.col("lang") == k, F.lit(v))
        )
    weight = expr.otherwise(F.lit(0)).cast("bigint")

    avail = docs.groupBy("lang").agg(
        F.sum(F.size(_ws_tokens())).cast("bigint").alias("avail_tokens")
    ).withColumn("w", weight)
    budget = avail.agg(
        F.floor(F.sum("avail_tokens") / 2).cast("bigint").alias("b")
    )
    return waterfill_allocate(avail, budget)


def waterfill_allocate(avail: DataFrame, budget: DataFrame) -> DataFrame:
    """The waterfilling core over any (lang, avail_tokens BIGINT, w BIGINT)
    frame and a 1-row (b BIGINT) budget — exact integer arithmetic
    throughout (see corpus_mix_waterfill's key doc); exposed separately
    so property tests can drive it with arbitrary domain mixes.
    Every domain's weight must be > 0 (a zero weight means "exclude the
    domain" — filter it out before allocating; the ratio ordering
    divides by w)."""
    ratio = F.col("avail_tokens").cast("double") / F.col("w")
    ow = Window.orderBy(ratio, F.col("lang"))
    ranked = (
        avail.crossJoin(F.broadcast(budget))  # 1-row budget broadcast
        .withColumn(
            "prefix_avail",
            F.coalesce(
                F.sum("avail_tokens").over(
                    ow.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .withColumn(
            "suffix_w",
            F.sum("w").over(ow.rowsBetween(Window.currentRow, Window.unboundedFollowing)),
        )
        .withColumn(
            "saturated",
            F.col("avail_tokens") * F.col("suffix_w")
            < (F.col("b") - F.col("prefix_avail")) * F.col("w"),
        )
    )
    fw = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    final = ranked.withColumn(
        "remaining",
        F.col("b")
        - F.coalesce(
            F.sum(F.when(F.col("saturated"), F.col("avail_tokens"))).over(fw),
            F.lit(0),
        ),
    ).withColumn(
        "unsat_w",
        F.sum(F.when(~F.col("saturated"), F.col("w")).otherwise(F.lit(0))).over(fw),
    )
    return final.select(
        "lang",
        "avail_tokens",
        (F.col("w").cast("double") / 1000).alias("target_weight"),
        F.when(F.col("saturated"), F.col("avail_tokens"))
        .otherwise(F.expr("remaining * w DIV unsat_w"))
        .cast("bigint")
        .alias("take_tokens"),
        "saturated",
    ).orderBy("lang")


def _register_pack_greedy() -> None:
    from dodo_spark.registry import register

    @register(
        "corpus_pack_greedy",
        oracle=f"""
        WITH toks AS (
          SELECT doc_id, lang,
                 len(list_filter(regexp_split_to_array(text, '\\s+'),
                                 x -> x != '')) AS t
          FROM documents
        ), nz AS (
          SELECT * FROM toks WHERE t > 0
        ), sized AS (
          SELECT lang, doc_id, t,
                 ROW_NUMBER() OVER (PARTITION BY lang
                                    ORDER BY t DESC, doc_id) AS rnk,
                 CAST(ceil(SUM(t) OVER (PARTITION BY lang)
                           / {PACK_SEQ_TOKENS}.0) AS BIGINT) AS n_bins
          FROM nz
        ), binned AS (
          SELECT lang, (rnk - 1) % n_bins AS bin_id, t FROM sized
        )
        SELECT lang, CAST(bin_id AS BIGINT) AS bin_id,
               CAST(COUNT(*) AS BIGINT) AS docs,
               CAST(SUM(t) AS BIGINT) AS tokens
        FROM binned GROUP BY lang, bin_id ORDER BY lang, bin_id
        """,
        doc="WHOLE-DOCUMENT packing (the no-split alternative to "
        "corpus_pack_sequences' concat-and-chunk — the strategy used when "
        "cross-document attention must never occur): within each lang "
        "shard, docs are ranked by token count descending and dealt "
        "round-robin across ceil(shard_total/capacity) bins — the classic "
        "longest-processing-time balancing approximation, expressed as "
        "one PER-SHARD rank + a modulo (partitionBy lang keeps the sort "
        "sharded — no global window, same scale posture as the sibling "
        "key). Output per (lang, bin): docs and exact token mass (bin "
        "spread = the balance quality a packing report needs). "
        "Power-of-two capacity keeps ceil exact in binary FP.",
    )
    def corpus_pack_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
        docs = load_table(spark, sf_dir, "documents")
        toks = docs.select(
            "doc_id", "lang", F.size(_ws_tokens()).cast("bigint").alias("t")
        ).filter(F.col("t") > 0)
        w_shard = Window.partitionBy("lang").rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
        sized = toks.withColumn(
            "rnk",
            F.row_number().over(
                Window.partitionBy("lang").orderBy(F.col("t").desc(), "doc_id")
            ),
        ).withColumn(
            "n_bins",
            F.ceil(F.sum("t").over(w_shard) / F.lit(float(PACK_SEQ_TOKENS)))
            .cast("bigint"),
        )
        return (
            sized.select(
                "lang", ((F.col("rnk") - 1) % F.col("n_bins")).alias("bin_id"), "t"
            )
            .groupBy("lang", "bin_id")
            .agg(F.count("*").alias("docs"), F.sum("t").alias("tokens"))
            .orderBy("lang", "bin_id")
        )


_register_pack_greedy()


# --------------------------------------------------------------------------
# LM-novelty scoring + temperature mixture weights (round 6, closing batch)
# --------------------------------------------------------------------------
NOVELTY_TOPK = 25  # docs flagged for review (lowest avg bigram df)
MIX_ALPHA_NOTE = "alpha = 0.5 (sqrt)"  # mT5/XLM-R temperature exponent
MIX_QSCALE = 1 << 20  # sqrt quantization: power of two => exact FP scaling
MIX_BUDGET = 1_000_000  # sampled-token budget the epochs column amortizes


@register(
    "text_lm_novelty",
    oracle=f"""
    WITH w AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '') AS ws
      FROM documents
    ), occ AS (
      SELECT doc_id,
             unnest(list_transform(generate_series(1, len(ws) - 1),
                                   i -> ws[i] || ' ' || ws[i + 1])) AS bigram
      FROM w WHERE len(ws) >= 2
    ), df AS (
      SELECT bigram, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
      FROM occ GROUP BY bigram
    ), per AS (
      SELECT o.doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
             CAST(SUM(df) AS BIGINT) AS sum_df
      FROM occ o JOIN df USING (bigram) GROUP BY o.doc_id
    )
    SELECT doc_id, n_bigrams, sum_df,
           CAST(sum_df AS DOUBLE) / n_bigrams AS avg_df
    FROM per ORDER BY avg_df, doc_id LIMIT {NOVELTY_TOPK}
    """,
    doc="LM-novelty scoring — the exact-arithmetic twin of perplexity "
    "filtering (CCNet-style: docs whose n-grams a corpus LM finds "
    "improbable are flagged for review). A doc's score is the average "
    "corpus DOCUMENT FREQUENCY of its word bigrams: low avg_df = the doc "
    "is built from bigrams the rest of the corpus rarely uses — the same "
    "ordering an unsmoothed corpus-trained bigram LM induces, but in "
    "integer counts + ONE final IEEE division per doc instead of a "
    "float log-prob accumulation (which is engine-order-dependent and "
    "cannot be hash-verified). Shape: explode bigram OCCURRENCES -> one "
    "groupBy(bigram) for df -> posting-list equi-join back -> per-doc "
    "integer aggregate -> global top-k via sort+limit (TakeOrdered — "
    "distributed partial top-k per partition, NO single-partition "
    f"window). The {NOVELTY_TOPK} flagged docs order by (avg_df, doc_id) "
    "so ties are deterministic. At 100 TB: the df table shuffles on the "
    "bigram key (bucketable); a bounded-vocab corpus can broadcast it "
    "instead — both standard equi-join postures, never all-pairs.",
)
def text_lm_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread_scan(load_table(spark, sf_dir, "documents"))
    ws = _ws_tokens()
    bigrams = F.transform(
        F.sequence(F.lit(1), F.size(ws) - 1),
        lambda i: F.concat_ws(
            " ", F.element_at(ws, i), F.element_at(ws, i + F.lit(1))
        ),
    )
    # when-guard instead of a filter: `size(ws) >= 2` as a PREDICATE embeds
    # the whole word-split chain and Catalyst pushes it below the spread
    # exchange onto the single scan task (and predicates are exempt from
    # codegen CSE, so the chain evaluated twice). The guard lives inside
    # the Generate input, runs once per row post-spread, and explode of
    # the empty array drops short docs exactly like the filter did.
    guarded = F.when(F.size(ws) >= 2, bigrams).otherwise(
        F.array().cast("array<string>")
    )
    # hash-partition the occurrence stream on the bigram key ONCE: the df
    # aggregate and the posting join-back both want hash(bigram), so the
    # two consumers share this single exchange via ReuseExchange and the
    # corpus scan + split + explode evaluate once, not once per branch
    # (guide §2.4: operations keyed the same way share one exchange).
    occ = docs.select("doc_id", F.explode(guarded).alias("bigram")).repartition(
        "bigram"
    )
    df_tab = occ.groupBy("bigram").agg(F.countDistinct("doc_id").alias("df"))
    per = (
        occ.join(df_tab, "bigram")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_bigrams"), F.sum("df").alias("sum_df"))
    )
    return (
        per.select(
            "doc_id",
            "n_bigrams",
            "sum_df",
            (F.col("sum_df").cast("double") / F.col("n_bigrams")).alias("avg_df"),
        )
        .orderBy("avg_df", "doc_id")
        .limit(NOVELTY_TOPK)
    )


@register(
    "corpus_mix_temperature",
    oracle=f"""
    WITH t AS (
      SELECT source,
             len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x != ''))
             AS tk
      FROM documents
    ), p AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(tk) AS BIGINT) AS n_tokens
      FROM t GROUP BY source
    ), q AS (
      SELECT *, CAST(floor(sqrt(CAST(n_tokens AS DOUBLE)) * {MIX_QSCALE}.0)
                     AS BIGINT) AS qsqrt
      FROM p
    ), s AS (
      SELECT *, (SELECT CAST(SUM(qsqrt) AS BIGINT) FROM q) AS q_total FROM q
    ), w AS (
      SELECT *, CAST(qsqrt AS DOUBLE) / q_total AS weight FROM s
    )
    SELECT source, n_docs, n_tokens, weight,
           ({MIX_BUDGET}.0 * weight) / n_tokens AS epochs
    FROM w ORDER BY source
    """,
    doc="Temperature-scaled mixture sampling weights over sources — the "
    f"mT5/XLM-R low-resource upsampling rule, {MIX_ALPHA_NOTE}: "
    "p_i proportional to n_i^alpha, so small sources are sampled more "
    "than their token share and large ones less (the complement of "
    "corpus_mix_waterfill's hard-cap allocation). Engine-exactness: "
    "sqrt is IEEE-754 correctly rounded on both engines, scaling by the "
    f"power-of-two {MIX_QSCALE} is exact, and floor quantizes to BIGINT "
    "— so the normalizing SUM is an integer sum (order-independent), "
    "and weight / epochs are short chains of single IEEE ops on "
    "identical operands. epochs = budget * p_i / n_i makes the "
    "upsampling visible (epochs > budget/total for low-resource "
    "sources). Shape: one tiny groupBy(source) + a 1-row broadcast "
    "total (whitelisted BNLJ audit pattern) — at 100 TB the scan "
    "dominates and the mixture table stays KB-sized.",
)
def corpus_mix_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    per = (
        docs.select("source", F.size(_ws_tokens()).cast("bigint").alias("tk"))
        .groupBy("source")
        .agg(F.count("*").alias("n_docs"), F.sum("tk").alias("n_tokens"))
    )
    q = per.withColumn(
        "qsqrt",
        F.floor(
            F.sqrt(F.col("n_tokens").cast("double")) * F.lit(float(MIX_QSCALE))
        ).cast("bigint"),
    )
    total = q.agg(F.sum("qsqrt").alias("q_total"))
    w = q.crossJoin(F.broadcast(total)).withColumn(
        "weight", F.col("qsqrt").cast("double") / F.col("q_total")
    )
    return w.select(
        "source",
        "n_docs",
        "n_tokens",
        "weight",
        ((F.lit(float(MIX_BUDGET)) * F.col("weight")) / F.col("n_tokens")).alias(
            "epochs"
        ),
    ).orderBy("source")


# --------------------------------------------------------------------------
# BPE pair counting — distributed vocab induction, first merge iteration
# --------------------------------------------------------------------------
BPE_TOP_K = 20


@register(
    "text_bpe_pairs",
    oracle=f"""
    WITH words AS (
      SELECT unnest(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                                x -> x != '')) AS w
      FROM documents
    ), pairs AS (
      SELECT unnest([substring(w, CAST(i AS INT), 2) FOR i IN range(1, len(w))])
             AS pair
      FROM words WHERE len(w) >= 2
    ), counted AS (
      SELECT pair, CAST(COUNT(*) AS BIGINT) AS n FROM pairs GROUP BY pair
    )
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY n DESC, pair) AS BIGINT) AS rank,
           pair, n
    FROM counted ORDER BY n DESC, pair LIMIT {BPE_TOP_K}
    """,
    doc="Distributed BPE vocabulary induction, first merge iteration "
    f"(tokenizer training over the corpus): count every adjacent "
    f"character pair inside whitespace words of the lowercased text and "
    f"rank the top {BPE_TOP_K} merge candidates (ties break on the pair "
    "string so the ranking is total). Plan shape: the pair stream is "
    "generated SCAN-SIDE (explode of a transform over sequence — whole-"
    "stage codegen, no Python), the groupBy partial-aggregates map-side "
    "so the single shuffle carries |distinct pairs| per partition (a few "
    "thousand — bounded by alphabet², not corpus size), and the top-K is "
    "TakeOrdered, never a global sort. Iterating BPE to a full vocab "
    "re-runs this count on re-segmented words; each iteration is the "
    "same linear scan, which is how distributed tokenizer training "
    "actually spends its time at 100 TB. Character-based substring on "
    "both engines keeps multibyte (CJK) pairs identical.",
)
def text_bpe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread_scan(load_table(spark, sf_dir, "documents"))
    words = docs.select(
        F.explode(_ws_tokens_lower()).alias("w")
    ).filter(F.length("w") >= 2)
    pairs = words.select(
        F.explode(
            F.expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")
        ).alias("pair")
    )
    counted = pairs.groupBy("pair").agg(F.count("*").cast("bigint").alias("n"))
    # top-K FIRST (TakeOrdered — distributed, never a global sort), then
    # rank the K-row result; the single-partition window touches only K rows
    topk = counted.orderBy(F.desc("n"), F.asc("pair")).limit(BPE_TOP_K)
    return (
        topk.withColumn(
            "rank",
            F.row_number().over(Window.orderBy(F.desc("n"), F.asc("pair"))).cast("bigint"),
        )
        .select("rank", "pair", "n")
        .orderBy("rank")
    )


def _ws_tokens_lower() -> Column:
    return F.filter(F.split(F.lower("text"), r"\s+", -1), lambda x: x != "")


# --------------------------------------------------------------------------
# BPE merge APPLICATION (the inference side of text_bpe_pairs' training
# side): encode the corpus under a fixed ordered merge list
# --------------------------------------------------------------------------
# a fixed, ordered merge table (common-English bigrams, then two
# second-round merges over first-round outputs) — constants so the DuckDB
# twin is a static literal; a trained table plugs into the same chain
BPE_MERGES = [
    ("t", "h"), ("i", "n"), ("e", "r"), ("a", "n"), ("o", "n"), ("r", "e"),
    ("th", "e"), ("an", "d"),
]
# every token is WRAPPED \x1e…\x1f (record/unit separators — absent from
# whitespace tokens), not merely separator-joined. Wrapping is what makes
# plain string replace() exactly equal a BPE merge pass: the pattern
# \x1e a \x1f \x1e b \x1f can only align on WHOLE tokens (a separator-only
# scheme would merge (th, e) into the unrelated sequence [th][er], whose
# second token merely STARTS with "e"), and because each match ends at one
# token's closer while the next token carries its own opener, consecutive
# matches share no characters — a run like [a][a][a][a] under merge (a, a)
# becomes [aa][aa], the leftmost-non-overlapping result BPE specifies.
_BPE_OPEN = "\x1e"
_BPE_CLOSE = "\x1f"


def _bpe_token_count(word: Column) -> Column:
    """Exact BPE token count of one word under BPE_MERGES.

    The word becomes a wrapped-token sequence \\x1ec\\x1f per char; each
    merge (a, b) in order is one leftmost-non-overlapping ``replace`` of
    the wrapped pair with the wrapped merged token — the same greedy pass
    a BPE encoder applies per learned merge, identical semantics in
    Spark and DuckDB (probed cross-engine). Token count = count of
    closers. Everything is whole-stage-codegen string ops: no UDF, no
    shuffle.

    Domain: whitespace tokens (the caller's tokenizer filters empties;
    the \\x1e/\\x1f sentinels are record/unit separator control chars
    that whitespace splitting can never emit inside a token — a corpus
    that embedded raw control chars in words would need a pre-clean
    pass, same as any tokenizer)."""
    s = F.array_join(
        F.transform(
            F.split(word, ""),
            lambda c: F.concat(F.lit(_BPE_OPEN), c, F.lit(_BPE_CLOSE)),
        ),
        "",
    )
    for a, b in BPE_MERGES:
        s = F.call_function(
            "replace",
            s,
            F.lit(_BPE_OPEN + a + _BPE_CLOSE + _BPE_OPEN + b + _BPE_CLOSE),
            F.lit(_BPE_OPEN + a + b + _BPE_CLOSE),
        )
    stripped = F.call_function("replace", s, F.lit(_BPE_CLOSE), F.lit(""))
    return F.length(s) - F.length(stripped)


def _bpe_oracle() -> str:
    s = ("array_to_string(list_transform(string_split(w, ''),"
         " c -> chr(30) || c || chr(31)), '')")
    for a, b in BPE_MERGES:
        pat = f"chr(30) || '{a}' || chr(31) || chr(30) || '{b}' || chr(31)"
        rep = f"chr(30) || '{a}{b}' || chr(31)"
        s = f"replace({s}, {pat}, {rep})"
    return f"""
    WITH words AS (
      SELECT lang, unnest(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                                      x -> x != '')) AS w
      FROM documents
    ), wc AS (
      SELECT lang, w, CAST(COUNT(*) AS BIGINT) AS cnt FROM words GROUP BY 1, 2
    ), dict AS (
      SELECT DISTINCT w FROM wc
    ), enc AS (
      SELECT w, CAST(length(w) AS BIGINT) AS n_chars,
             CAST(length(m) - length(replace(m, chr(31), '')) AS BIGINT)
               AS n_tokens
      FROM (SELECT w, {s} AS m FROM dict)
    )
    SELECT lang,
           CAST(SUM(cnt) AS BIGINT) AS n_words,
           CAST(SUM(cnt * n_chars) AS BIGINT) AS n_chars,
           CAST(SUM(cnt * n_tokens) AS BIGINT) AS n_tokens,
           CAST(SUM(cnt * (n_chars - n_tokens)) AS BIGINT) AS merges_fired,
           CAST(SUM(cnt * n_tokens) AS DOUBLE) / SUM(cnt) AS tokens_per_word
    FROM wc JOIN enc USING (w)
    GROUP BY lang ORDER BY lang
    """


@register(
    "text_bpe_encode",
    oracle=_bpe_oracle(),
    doc="BPE merge APPLICATION — the inference side of text_bpe_pairs' "
    "training side: encode the whole corpus under a fixed ordered merge "
    "list and report per-language token statistics (words, chars, "
    "tokens, merges fired, tokens/word). Scale shape is the classic "
    "dictionary trick: the merge-replace chain runs once per (lang, "
    "word) VOCABULARY row (~1e7 rows at 100 TB — the per-language "
    "dictionary), never on the ~1e11-row word-instance stream, which "
    "only feeds the count aggregation (map-side partial, one shuffle "
    "bounded by vocabulary size). Each merge is one leftmost-"
    "non-overlapping replace() over a unit-separated char sequence — "
    "identical semantics in Spark and DuckDB (cross-engine probed), "
    "pure codegen string ops, no UDF, ONE corpus scan (a separate "
    "distinct-word frame would double-scan: Catalyst rewrites the "
    "distinct into a second scan branch rather than reusing the count "
    "exchange).",
)
def text_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread_scan(load_table(spark, sf_dir, "documents"))
    wc = (
        docs.select("lang", F.explode(_ws_tokens_lower()).alias("w"))
        .groupBy("lang", "w")
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )
    # encode on the post-aggregation vocabulary rows: the replace chain
    # runs |per-lang vocab| times, not once per word instance
    enc = wc.select(
        "lang",
        "cnt",
        F.length("w").cast("bigint").alias("n_chars"),
        _bpe_token_count(F.col("w")).cast("bigint").alias("n_tokens"),
    )
    return (
        enc.groupBy("lang")
        .agg(
            F.sum("cnt").cast("bigint").alias("n_words"),
            F.sum(F.col("cnt") * F.col("n_chars")).cast("bigint").alias("n_chars"),
            F.sum(F.col("cnt") * F.col("n_tokens")).cast("bigint").alias("n_tokens"),
            F.sum(F.col("cnt") * (F.col("n_chars") - F.col("n_tokens")))
            .cast("bigint")
            .alias("merges_fired"),
            (
                F.sum(F.col("cnt") * F.col("n_tokens")).cast("double")
                / F.sum("cnt")
            ).alias("tokens_per_word"),
        )
        .orderBy("lang")
    )


# --------------------------------------------------------------------------
# importance resampling — execute a target mixture by deterministic
# per-doc downsampling
# --------------------------------------------------------------------------
_RESAMPLE_MOD = 2147483647      # 2^31 - 1
_RESAMPLE_MULT = 2654435761     # Knuth multiplicative constant


def _resample_hash_sql(col: str = "doc_id") -> str:
    """Seedless per-doc hash in [0, 2^31-1), identical on both engines:
    operands pre-reduce mod 2^31 so the product stays far under 2^63
    (the [[cross-engine-exactness]] split-hash rule)."""
    return f"(({col} % 2147483648) * {_RESAMPLE_MULT}) % {_RESAMPLE_MOD}"


@register(
    "corpus_resample_importance",
    oracle=f"""
    WITH avail AS (
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST({_mix_weight_sql()} AS BIGINT) AS w
      FROM documents
      GROUP BY lang HAVING CAST({_mix_weight_sql()} AS BIGINT) > 0
    ), lim AS (
      SELECT n_docs AS n_lim, w AS w_lim
      FROM avail ORDER BY CAST(n_docs AS DOUBLE) / w, lang LIMIT 1
    ), plan_rows AS (
      SELECT lang, n_docs, w,
             least(n_docs, n_lim * w // w_lim) AS take_docs,
             (n_docs * w_lim = n_lim * w
              AND lang = (SELECT min(a2.lang) FROM avail a2
                          WHERE a2.n_docs * w_lim = n_lim * a2.w)) AS limiting,
             CAST({_RESAMPLE_MOD} AS BIGINT)
               * least(n_docs, n_lim * w // w_lim) // n_docs AS h_cut
      FROM avail, lim
    ), kept AS (
      SELECT d.lang, CAST(COUNT(*) AS BIGINT) AS kept_docs
      FROM documents d JOIN plan_rows p ON d.lang = p.lang
      WHERE {_resample_hash_sql("d.doc_id")} < p.h_cut
      GROUP BY d.lang
    )
    SELECT p.lang, p.n_docs, p.take_docs,
           COALESCE(k.kept_docs, 0) AS kept_docs,
           CAST(COALESCE(k.kept_docs, 0) * 1000000
                // SUM(COALESCE(k.kept_docs, 0)) OVER () AS BIGINT)
             AS achieved_share_pm,
           p.limiting
    FROM plan_rows p LEFT JOIN kept k ON p.lang = k.lang
    ORDER BY p.lang
    """,
    doc="Importance RESAMPLING to a target mixture — the doc-granular "
    "EXECUTION step that corpus_mix_waterfill only plans: the most "
    "under-represented domain relative to its target weight (the "
    "'limiting' domain, ratio-ordered with a lang tiebreak like the "
    "waterfill) keeps everything, and every other domain downsamples to "
    "w * n_limiting/w_limiting docs via a SEEDLESS deterministic hash "
    "gate — keep iff hash(doc_id) < (2^31-1) * take/n — so the kept set "
    "is reproducible run-to-run, engine-to-engine, and under any "
    "partitioning. Plan shape for 100 TB: per-domain counts are one "
    "tiny groupBy; the 5-row plan table broadcasts back onto the scan "
    "and the gate is a pure per-row predicate — NO per-domain sort, no "
    "rank shuffle (a rank-exact variant would need a total order per "
    "domain, i.e. a multi-billion-row sort per lang; the hash gate "
    "trades ±O(sqrt(n)) count jitter for a scan-side filter, the "
    "standard production choice). All thresholds are exact integer "
    "cross-multiplications (int64-safe to ~4e9 docs per domain); "
    "achieved shares are per-million integers.",
)
def corpus_resample_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    weight = F.expr(_mix_weight_sql()).cast("bigint")
    avail = (
        docs.groupBy("lang")
        .agg(F.count("*").cast("bigint").alias("n_docs"))
        .withColumn("w", weight)
        .filter(F.col("w") > 0)
    )
    # the per-domain plan is |domains| rows (5 here) but is referenced by
    # three downstream branches — localCheckpoint it eagerly so the corpus
    # scan behind the counts runs ONCE, not once per consumer (same move
    # as graph_pagerank's edge list)
    avail = avail.localCheckpoint(eager=True)
    lim = (
        avail.orderBy(F.col("n_docs").cast("double") / F.col("w"), "lang")
        .limit(1)
        .select(F.col("n_docs").alias("n_lim"), F.col("w").alias("w_lim"))
    )
    plan = (
        avail.crossJoin(F.broadcast(lim))  # 1-row limiting-domain broadcast
        .withColumn(
            "take_docs", F.least(F.col("n_docs"), F.expr("n_lim * w DIV w_lim"))
        )
        .withColumn(
            "h_cut",
            F.expr(f"CAST({_RESAMPLE_MOD} AS BIGINT) * take_docs DIV n_docs"),
        )
    )
    # deterministic 'limiting' flag: same ratio AND first lang among exact
    # ratio ties (cross-multiplied equality, no float compare)
    tie_min = plan.filter(
        F.expr("n_docs * w_lim = n_lim * w")
    ).agg(F.min("lang").alias("lim_lang"))
    plan = plan.crossJoin(F.broadcast(tie_min)).withColumn(
        "limiting",
        F.expr("n_docs * w_lim = n_lim * w AND lang = lim_lang"),
    )
    kept = (
        docs.join(F.broadcast(plan.select("lang", "h_cut")), "lang")
        .filter(F.expr(f"{_resample_hash_sql()} < h_cut"))
        .groupBy("lang")
        .agg(F.count("*").cast("bigint").alias("kept_docs"))
    )
    tot = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        plan.join(F.broadcast(kept), "lang", "left")
        .withColumn("kept_docs", F.coalesce("kept_docs", F.lit(0)))
        .withColumn("total_kept", F.sum("kept_docs").over(tot))
        .withColumn(
            "achieved_share_pm",
            F.expr("kept_docs * 1000000 DIV total_kept").cast("bigint"),
        )
        .select(
            "lang", "n_docs", "take_docs", "kept_docs",
            "achieved_share_pm", "limiting",
        )
        .orderBy("lang")
    )


# --------------------------------------------------------------------------
# filter funnel — Gopher-style quality-rule cascade with per-rule attrition
# --------------------------------------------------------------------------
# (name, predicate) over the shared feature columns chars / n_tokens /
# word_chars / n_distinct / alnum — every predicate is engine-neutral SQL
# and exact INTEGER arithmetic (ratio thresholds are cross-multiplied), so
# the same string drives both Spark and the DuckDB oracle.
FUNNEL_RULES = [
    ("min_chars", "chars >= 20"),
    ("max_chars", "chars <= 100000"),
    ("min_tokens", "n_tokens >= 5"),
    ("mean_word_len", "2 * n_tokens <= word_chars AND word_chars <= 12 * n_tokens"),
    ("symbol_ratio", "10 * (word_chars - alnum) <= 3 * word_chars"),
    ("type_token_ratio", "2 * n_distinct >= n_tokens"),
]


def _funnel_oracle_sql() -> str:
    aggs, rows = [], []
    prefix = "TRUE"
    for i, (name, pred) in enumerate(FUNNEL_RULES, start=1):
        aggs.append(
            f"CAST(SUM(CASE WHEN {prefix} THEN 1 ELSE 0 END) AS BIGINT) AS e{i},"
            f" CAST(SUM(CASE WHEN ({prefix}) AND NOT ({pred}) THEN 1 ELSE 0 END)"
            f" AS BIGINT) AS d{i}"
        )
        rows.append(
            f"SELECT CAST({i} AS BIGINT) AS stage, '{name}' AS rule,"
            f" e{i} AS evaluated, d{i} AS dropped, e{i} - d{i} AS surviving"
            f" FROM agg"
        )
        prefix = f"({prefix}) AND ({pred})"
    return f"""
    WITH feats AS (
      SELECT length(text) AS chars,
             len(list_filter(regexp_split_to_array(text, '\\s+'),
                             x -> x != '')) AS n_tokens,
             COALESCE(list_sum(list_transform(
               list_filter(regexp_split_to_array(text, '\\s+'), x -> x != ''),
               x -> len(x))), 0) AS word_chars,
             len(list_distinct(list_transform(
               list_filter(regexp_split_to_array(text, '\\s+'), x -> x != ''),
               x -> lower(x)))) AS n_distinct,
             length(regexp_replace(text, '[^A-Za-z0-9]', '', 'g')) AS alnum
      FROM documents
    ), agg AS (
      SELECT {", ".join(aggs)} FROM feats
    )
    {" UNION ALL ".join(rows)}
    ORDER BY stage
    """


@register(
    "corpus_filter_funnel",
    oracle=_funnel_oracle_sql(),
    doc="Quality-filter FUNNEL report (the Gopher/C4-style rule cascade "
    "every corpus build runs before training): six ordered rules — char "
    "bounds, token floor, mean word length, symbol ratio, type/token "
    "ratio — each applied to the SURVIVORS of the previous, with "
    "per-stage evaluated/dropped/surviving counts so attrition is "
    "attributable to the rule that caused it (corpus_clean emits the "
    "final keepers; this emits WHY docs left). Every threshold is an "
    "integer cross-multiplication over five scan-side feature columns, "
    "so counts hash exactly across engines. Plan shape: ONE pass — all "
    "features and all 6 prefix-conditioned sums compute in a single "
    "scan + partial-aggregate (the shuffle carries one row per "
    "partition), then the 1-row totals explode into the 6-row report; "
    "cost at 100 TB is the scan itself, which any filtering pass pays. "
    "The rules are deliberately ASCII-alphabet-biased (as the published "
    "ones were); on a real multilingual crawl the symbol_ratio row "
    "surfaces the CJK attrition that bias causes — the attrition report "
    "is exactly where such a bias becomes visible. On the synthetic "
    "corpora the binding rule is type_token_ratio (repeated-word docs); "
    "the per-rule branches are unit-tested on a crafted corpus where "
    "every stage drops.",
)
def corpus_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread_scan(load_table(spark, sf_dir, "documents"))
    t = _ws_tokens()
    feats = docs.select(
        F.length("text").cast("bigint").alias("chars"),
        F.size(t).cast("bigint").alias("n_tokens"),
        F.expr(
            "aggregate(transform(filter(split(text, '\\\\s+'), x -> x != ''),"
            " x -> length(x)), CAST(0 AS BIGINT), (a, x) -> a + x)"
        ).alias("word_chars"),
        F.size(
            F.array_distinct(F.transform(t, lambda x: F.lower(x)))
        ).cast("bigint").alias("n_distinct"),
        F.length(F.regexp_replace("text", "[^A-Za-z0-9]", "")).cast("bigint").alias("alnum"),
    )
    aggs = []
    prefix = F.lit(True)
    for i, (_name, pred) in enumerate(FUNNEL_RULES, start=1):
        p = F.expr(pred)
        aggs.append(F.sum(prefix.cast("bigint")).alias(f"e{i}"))
        aggs.append(F.sum((prefix & ~p).cast("bigint")).alias(f"d{i}"))
        prefix = prefix & p
    totals = feats.agg(*aggs)
    report = F.array(
        *[
            F.struct(
                F.lit(i).cast("bigint").alias("stage"),
                F.lit(name).alias("rule"),
                F.col(f"e{i}").alias("evaluated"),
                F.col(f"d{i}").alias("dropped"),
                (F.col(f"e{i}") - F.col(f"d{i}")).alias("surviving"),
            )
            for i, (name, _pred) in enumerate(FUNNEL_RULES, start=1)
        ]
    )
    return (
        totals.select(F.explode(report).alias("r"))
        .select("r.stage", "r.rule", "r.evaluated", "r.dropped", "r.surviving")
        .orderBy("stage")
    )


# --------------------------------------------------------------------------
# n-gram LM counts — the Kneser-Ney smoothing inputs, distributed
# --------------------------------------------------------------------------
LM_TOP_K = 15


@register(
    "text_ngram_lm_counts",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '\\s+'),
                                 x -> x != '') AS t
      FROM documents
    ), big AS (
      SELECT unnest([{{'w1': t[CAST(i AS INT)], 'w2': t[CAST(i AS INT)+1]}}
                     FOR i IN range(1, len(t))], recursive := true)
      FROM toks WHERE len(t) >= 2
    ), counts AS (
      SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS n FROM big GROUP BY w1, w2
    ), topk AS (
      SELECT w1, w2, n,
             CAST(ROW_NUMBER() OVER (ORDER BY n DESC, w1, w2) AS BIGINT) AS rank
      FROM counts ORDER BY n DESC, w1, w2 LIMIT {LM_TOP_K}
    ), left_div AS (
      SELECT w2, CAST(COUNT(*) AS BIGINT) AS left_contexts FROM counts GROUP BY w2
    ), right_div AS (
      SELECT w1, CAST(COUNT(*) AS BIGINT) AS right_contexts FROM counts GROUP BY w1
    )
    SELECT t.rank, t.w1, t.w2, t.n, l.left_contexts, r.right_contexts
    FROM topk t JOIN left_div l ON t.w2 = l.w2
                JOIN right_div r ON t.w1 = r.w1
    ORDER BY t.rank
    """,
    doc="Distributed n-gram language-model counts — the Kneser-Ney "
    f"smoothing inputs over the corpus: bigram counts c(w1,w2) plus, for "
    f"the top {LM_TOP_K} bigrams, the continuation diversities the KN "
    "discount needs — left_contexts = |{{w: c(w,w2)>0}}| (how many "
    "distinct predecessors w2 follows; the numerator of the KN "
    "continuation probability) and right_contexts = |{{w: c(w1,w)>0}}| "
    "(the N1+(w1·) normalizer). Plan shape: bigrams generate SCAN-SIDE "
    "(transform over sequence, whole-stage codegen), ONE groupBy builds "
    "the count table, and both diversity tables are groupBys OVER THE "
    "COUNT TABLE (vocab-sized, orders of magnitude smaller than the "
    "corpus — counting distinct contexts from counts, not from raw "
    "bigram occurrences, is what makes KN preprocessing feasible at "
    "100 TB); the top-K is TakeOrdered and joins the diversity tables "
    "with the K-row side broadcast.",
)
def text_ngram_lm_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread_scan(load_table(spark, sf_dir, "documents"))
    # explode(array(...)) barrier: without it the size predicate embeds
    # the whole tokenize chain and is pushed below the spread exchange
    # onto the single scan task, evaluating the chain twice (r13 profile)
    toks = docs.select(
        F.explode(F.array(_ws_tokens_lower())).alias("t")
    ).filter(F.size("t") >= 2)
    big = toks.select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(t) - 1),"
                " i -> struct(t[i-1] AS w1, t[i] AS w2))"
            )
        ).alias("p")
    ).select("p.w1", "p.w2")
    counts = big.groupBy("w1", "w2").agg(F.count("*").cast("bigint").alias("n"))
    counts = counts.localCheckpoint(eager=True)  # 3 consumers, 1 build
    topk = (
        counts.orderBy(F.desc("n"), "w1", "w2")
        .limit(LM_TOP_K)
        .withColumn(
            "rank",
            F.row_number()
            .over(Window.orderBy(F.desc("n"), "w1", "w2"))
            .cast("bigint"),
        )
    )
    left_div = counts.groupBy("w2").agg(
        F.count("*").cast("bigint").alias("left_contexts")
    )
    right_div = counts.groupBy("w1").agg(
        F.count("*").cast("bigint").alias("right_contexts")
    )
    return (
        F.broadcast(topk)
        .join(left_div, "w2")
        .join(right_div, "w1")
        .select("rank", "w1", "w2", "n", "left_contexts", "right_contexts")
        .orderBy("rank")
    )


DOMAIN_CAP_K = 10


@register(
    "corpus_domain_cap",
    oracle=f"""
    WITH ranked AS (
      SELECT source, doc_id, n_chars,
             ROW_NUMBER() OVER (
               PARTITION BY source ORDER BY n_chars DESC, doc_id
             ) AS rk
      FROM documents
    )
    SELECT source,
           CAST(COUNT(*) FILTER (WHERE rk <= {DOMAIN_CAP_K}) AS BIGINT)
             AS kept,
           CAST(COUNT(*) FILTER (WHERE rk > {DOMAIN_CAP_K}) AS BIGINT)
             AS dropped,
           CAST(SUM(n_chars) FILTER (WHERE rk <= {DOMAIN_CAP_K}) AS BIGINT)
             AS kept_chars,
           CAST(MIN(doc_id) FILTER (WHERE rk <= {DOMAIN_CAP_K}) AS BIGINT)
             AS first_kept
    FROM ranked GROUP BY source ORDER BY source
    """,
    doc="Per-domain quota capping (the web-corpus over-representation "
    "control: no single domain may contribute more than K documents, "
    "keeping the longest first): rank documents within each source by "
    "(n_chars DESC, doc_id) — a PARTITIONED window, one shuffle on "
    "source, never a global sort — keep rank <= K, and report per-source "
    "kept/dropped attrition plus the kept character mass. At 100 TB the "
    "domain key is the partition column, so the window state per task is "
    "one domain's postings; skewed mega-domains split under AQE and only "
    "their top-K heap survives the scan. The deterministic (length, id) "
    "priority makes the cap reproducible across runs and engines — a "
    "policy knob, not a sample.",
)
def corpus_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread_scan(load_table(spark, sf_dir, "documents"))
    k = F.col("rk") <= DOMAIN_CAP_K
    ranked = docs.withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("source").orderBy(F.desc("n_chars"), "doc_id")
        ),
    )
    return (
        ranked.groupBy("source")
        .agg(
            F.count(F.when(k, 1)).alias("kept"),
            F.count(F.when(~k, 1)).alias("dropped"),
            F.sum(F.when(k, F.col("n_chars"))).cast("bigint").alias("kept_chars"),
            F.min(F.when(k, F.col("doc_id"))).cast("bigint").alias("first_kept"),
        )
        .orderBy("source")
    )


LM_SCORE_TOP_K = 25
# interpolated-KN probability, quantized to integer micro-units so the
# per-doc mean accumulates EXACTLY (BIGINT sum) instead of in
# order-dependent float addition; the probability itself is +,-,*,/ over
# exact-integer count inputs in one shared expression tree (the text_bm25
# determinism discipline), so the quantized value is engine-identical
_KN_P = (
    "((GREATEST(cb - 0.75, 0.0) / cu)"
    " + ((0.75 / cu) * nf) * (nc / {nt}))"
)


@register(
    "text_lm_score_kn",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '\\s+'),
                                 x -> x != '') AS t
      FROM documents
    ), big AS (
      SELECT doc_id,
             unnest([{{'w1': t[CAST(i AS INT)], 'w2': t[CAST(i AS INT)+1]}}
                     FOR i IN range(1, len(t))], recursive := true)
      FROM toks WHERE len(t) >= 2
    ), counts AS (
      SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS cb FROM big GROUP BY w1, w2
    ), uni AS (
      SELECT w1, CAST(SUM(cb) AS BIGINT) AS cu,
             CAST(COUNT(*) AS BIGINT) AS nf
      FROM counts GROUP BY w1
    ), cont AS (
      SELECT w2, CAST(COUNT(*) AS BIGINT) AS nc FROM counts GROUP BY w2
    ), nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS nt FROM counts),
    q AS (
      SELECT b.doc_id,
             CAST(FLOOR({_KN_P.format(nt="(SELECT nt FROM nt)")}
                        * 1000000.0) AS BIGINT) AS q
      FROM big b
      JOIN counts c ON c.w1 = b.w1 AND c.w2 = b.w2
      JOIN uni u ON u.w1 = b.w1
      JOIN cont x ON x.w2 = b.w2
    ), agg AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
             CAST(SUM(q) AS BIGINT) AS sum_q
      FROM q GROUP BY doc_id
    )
    SELECT doc_id, n_bigrams, sum_q,
           CAST((CAST(sum_q AS DOUBLE) / n_bigrams) / 1000000.0 AS DOUBLE)
             AS score
    FROM agg ORDER BY score ASC, doc_id LIMIT {LM_SCORE_TOP_K}
    """,
    doc="Interpolated Kneser-Ney bigram LM scoring of every document "
    "against the corpus-trained model (the CCNet-style LM quality "
    "filter, completing the family whose count inputs "
    "text_ngram_lm_counts builds): P(w2|w1) = max(c12-d,0)/c1 + "
    "(d/c1)*N1+(w1.)*Pcont(w2), d=0.75, evaluated as one shared "
    "expression tree over exact-integer counts and QUANTIZED to integer "
    "micro-units before the per-doc mean, so the aggregate is an exact "
    "BIGINT sum — no order-dependent float accumulation anywhere (log "
    "is avoided by scoring mean probability, not log-perplexity; libm "
    "never enters the plan). Output: the K lowest-scoring (most "
    "out-of-distribution) documents. Plan shape: the count/diversity "
    "tables are VOCAB-sized aggregates of one checkpointed bigram-count "
    "build; the scoring pass is one scan joining those tables (all "
    "broadcast-able at any corpus size since vocab lags corpus growth).",
)
def text_lm_score_kn(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread_scan(load_table(spark, sf_dir, "documents"))
    # explode(array(...)) barrier: keeps the tokenize chain above the
    # spread exchange and single-evaluated (see text_ngram_lm_counts)
    toks = docs.select(
        "doc_id", F.explode(F.array(_ws_tokens_lower())).alias("t")
    ).filter(F.size("t") >= 2)
    big = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(t) - 1),"
                " i -> struct(t[i-1] AS w1, t[i] AS w2))"
            )
        ).alias("p"),
    ).select("doc_id", "p.w1", "p.w2")
    counts = (
        big.groupBy("w1", "w2")
        .agg(F.count("*").cast("bigint").alias("cb"))
        .localCheckpoint(eager=True)  # 4 consumers, 1 build
    )
    uni = counts.groupBy("w1").agg(
        F.sum("cb").cast("bigint").alias("cu"),
        F.count("*").cast("bigint").alias("nf"),
    )
    cont = counts.groupBy("w2").agg(F.count("*").cast("bigint").alias("nc"))
    n_total = counts.count()  # 1 driver scalar off the checkpoint

    scored = (
        big.join(counts, ["w1", "w2"])
        .join(F.broadcast(uni), "w1")
        .join(F.broadcast(cont), "w2")
        .selectExpr(
            "doc_id",
            f"CAST(FLOOR({_KN_P.format(nt=n_total)} * 1000000.0) AS BIGINT)"
            " AS q",
        )
    )
    agg = scored.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_bigrams"),
        F.sum("q").cast("bigint").alias("sum_q"),
    )
    return (
        agg.selectExpr(
            "doc_id",
            "n_bigrams",
            "sum_q",
            "CAST((CAST(sum_q AS DOUBLE) / n_bigrams) / 1000000.0 AS DOUBLE)"
            " AS score",
        )
        .orderBy("score", "doc_id")
        .limit(LM_SCORE_TOP_K)
    )


SHUFFLE_SHARDS = 8


@register(
    "corpus_shard_shuffle",
    oracle=f"""
    WITH k AS (
      SELECT doc_id, {_resample_hash_sql("doc_id")} AS h,
             {_resample_hash_sql("doc_id")} % {SHUFFLE_SHARDS} AS shard
      FROM documents
    ), agg AS (
      SELECT CAST(shard AS BIGINT) AS shard,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(MIN(h) AS BIGINT) AS first_h
      FROM k GROUP BY shard
    )
    SELECT a.shard, a.n_docs,
           CAST(MIN(k.doc_id) AS BIGINT) AS first_doc, a.first_h
    FROM agg a JOIN k ON k.shard = a.shard AND k.h = a.first_h
    GROUP BY a.shard, a.n_docs, a.first_h
    ORDER BY a.shard
    """,
    doc="Deterministic training-order shuffle + sharding (the 'global "
    "shuffle' every training run needs, reproducible across reruns and "
    "engines with NO stored permutation): each doc's position is a "
    "seedless multiplicative hash of its id (the split-hash pre-reduce "
    "rule keeps the product exact), shard = h mod S, within-shard order "
    "= (h, doc_id). Output: per-shard doc counts (uniformity evidence) "
    "and each shard's first document under the shuffled order — a "
    "two-step argmin (per-shard MIN(h), then MIN(doc_id) at that hash) "
    "that stays exact at ANY id magnitude, no packing, no window. At "
    "100 TB the shuffle is one hash "
    "projection + repartitionByRange on h: no stored permutation table, "
    "any shard re-derivable independently — which is what makes "
    "mid-training resharding and elastic re-runs cheap.",
)
def corpus_shard_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    k = docs.selectExpr(
        "doc_id",
        f"{_resample_hash_sql('doc_id')} AS h",
    ).selectExpr("doc_id", "h", f"h % {SHUFFLE_SHARDS} AS shard")
    agg = k.groupBy(F.col("shard").cast("bigint").alias("shard")).agg(
        F.count("*").alias("n_docs"),
        F.min("h").cast("bigint").alias("first_h"),
    )
    return (
        F.broadcast(agg)
        .join(
            k,
            (k["shard"] == agg["shard"]) & (k["h"] == agg["first_h"]),
        )
        .groupBy(agg["shard"], "n_docs", "first_h")
        .agg(F.min("doc_id").cast("bigint").alias("first_doc"))
        .select("shard", "n_docs", "first_doc", "first_h")
        .orderBy("shard")
    )
