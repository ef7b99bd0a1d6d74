"""SQL identifier anonymization (SURVEY.md §2.B B14; reference
``src/anonymizer.go:89-218``, listener ``src/parser/custom.go:21-226``).

The reference parses SQL with the full Doris ANTLR grammar and rewrites
identifiers from the token stream. A 111k-line parser port is out of scope
(SURVEY §7.3); this is a token-level pass with the same observable rules:

- table/column/db identifiers -> 8-byte hex hash (``hash``) or a stable
  short alias a, b, ..., z, aa, ba, ... (``minihash``; successor function
  ``anonymizer.go:189-212``, little-endian increment skipping keywords)
- lowercased before hashing (identifiers are case-insensitive)
- identifiers shorter than the min length are kept (hash mode)
- keywords, function names (word followed by '('), string literals,
  numbers, variables (@x, @@x) are preserved
- comments are redacted to ``'***'`` (``custom.go:14-19`` props list)

Hash function delta: blake3 is not in the environment; md5-prefix is used.
Same shape (8-byte hex), different digests — documented, and irrelevant to
the minihash mode whose aliases are dictionary-ordered, not digest-valued.

Distributed form: a two-phase pass — collect the distinct identifier
vocabulary (bounded: schemas have thousands of names, not billions), build
the rename dictionary once on the driver, broadcast it, rewrite with a
pandas UDF (Arrow-batched; string rewriting has no relational shape).
"""

from __future__ import annotations

import hashlib
import re

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from dodo_spark.catalog import load_table
from dodo_spark.registry import register

ANONYMIZE_HASH_BYTES = 8
ANONYMIZE_MIN_LENGTH = 3

# SQL keywords never rewritten and never used as minihash aliases (the
# reference loads the full grammar keyword list; this covers the surface
# our tokenizer can meet)
KEYWORDS = {
    w
    for w in """
    select from where group by having order limit offset join inner left right
    full outer cross semi anti on using as and or not in exists between like
    rlike regexp is null true false case when then else end cast convert
    distinct all union intersect except minus with values insert into
    overwrite update delete create table view database if replace partition
    distributed buckets properties engine key duplicate unique aggregate
    comment default char varchar int integer bigint smallint tinyint largeint
    float double decimal boolean date datetime timestamp string text json
    jsonb variant array map struct bitmap hll asc desc nulls first last
    interval day month year hour minute second week quarter over rows range
    unbounded preceding following current row desc asc by olap
    """.split()
}

# property keys whose VALUES carry identifiers and must be rewritten
# (reference src/parser/custom.go:14-19)
ID_BEARING_PROPS = {"bloom_filter_columns", "function_column.sequence_col"}

_TOKEN_RE = re.compile(
    r"""
    (?P<comment>/\*.*?\*/|--[^\n]*)
  | (?P<string>'(?:[^'\\]|\\.|'')*'|"(?:[^"\\]|\\.)*")
  | (?P<bquote>`[^`]*`)
  | (?P<variable>@@?[A-Za-z_][A-Za-z_0-9]*)
  | (?P<number>\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)
  | (?P<word>[A-Za-z_][A-Za-z_0-9]*)
  | (?P<other>.)
    """,
    re.S | re.X,
)


def _hash_id(identifier: str) -> str:
    lower = identifier.lower()
    h = hashlib.md5(lower.encode()).hexdigest()[: ANONYMIZE_HASH_BYTES * 2]
    # an identifier must not BEGIN with a digit: a leading-digit name
    # re-tokenizes as number+word (breaking a second anonymization pass
    # and Spark parse survival). Remap the first nibble bijectively to a
    # letter (0-9 -> g-p; a-f unchanged) — found by fuzzing the hash
    # mode over the reference's own fixture corpus (round 8).
    if h[0].isdigit():
        h = chr(ord("g") + int(h[0])) + h[1:]
    return h


class MiniDict:
    """Stable short-alias dictionary: a, b, ..., z, aa, ba, ..., za, ab, ...
    (the reference's little-endian successor, anonymizer.go:189-212),
    skipping keywords."""

    def __init__(self) -> None:
        self.dict: dict[str, str] = {}
        self.last: str | None = None

    @staticmethod
    def _succ(word: str) -> str:
        out = []
        for i, c in enumerate(word):
            if c != "z":
                out.append(chr(ord(c) + 1))
                out.extend(word[i + 1 :])
                return "".join(out)
            out.append("a")
        out.append("a")
        return "".join(out)

    def save(self, path: str) -> None:
        """Persist the alias dictionary (reference --anonymize-minihash-dict:
        a saved dict keeps aliases STABLE across runs — the same table gets
        the same short name in every dump anonymized against it)."""
        import json as _json

        with open(path, "w", encoding="utf-8") as f:
            _json.dump({"dict": self.dict, "last": self.last}, f)

    @classmethod
    def load(cls, path: str) -> "MiniDict":
        import json as _json

        with open(path, encoding="utf-8") as f:
            payload = _json.load(f)
        out = cls()
        out.dict = dict(payload["dict"])
        out.last = payload["last"]
        return out

    def alias(self, hashed: str) -> str:
        if hashed in self.dict:
            return self.dict[hashed]
        # round-8 _hash_id remaps a leading digit nibble to g-p; a dict
        # persisted BEFORE that change keys this identifier under the
        # digit-leading form. Migrate the entry in place so saved dicts
        # keep aliases stable across the upgrade (the save/load contract).
        if "g" <= hashed[0] <= "p":
            legacy = str(ord(hashed[0]) - ord("g")) + hashed[1:]
            if legacy in self.dict:
                self.dict[hashed] = self.dict.pop(legacy)
                return self.dict[hashed]
        if self.last is None:
            self.last = "a"
        else:
            nxt = self._succ(self.last)
            while nxt in KEYWORDS:
                nxt = self._succ(nxt)
            self.last = nxt
        self.dict[hashed] = self.last
        return self.last


def _is_function_call(sql: str, end: int) -> bool:
    m = re.match(r"\s*\(", sql[end:])
    return m is not None


def _rewrite_sql(sql: str, lookup) -> str:
    """THE tokenizer state machine — the single shared walker used by the
    local path (anonymize_sql), the vocabulary collector, and the
    distributed pandas UDF, so all three see identical token/identifier
    decisions (comment redaction, id-bearing property values, object-name-
    after-keyword, function-call preservation).

    ``lookup(identifier) -> replacement`` decides the rewrite per identifier.
    """
    out = []
    # property-value rewrite state ("bloom_filter_columns" = "a,b" — the
    # VALUE literal carries identifiers, reference custom.go:14-19, 170)
    prop_state = 0  # 0: idle, 1: saw id-bearing key, 2: saw '='
    last_word: str | None = None
    for m in _TOKEN_RE.finditer(sql):
        kind = m.lastgroup
        tok = m.group()
        if kind == "comment":
            out.append("/*'***'*/" if tok.startswith("/*") else "--'***'")
        elif kind == "string":
            inner = tok[1:-1]
            if prop_state == 2:
                ids = [lookup(p.strip()) if p.strip() else p for p in inner.split(",")]
                out.append(tok[0] + ",".join(ids) + tok[-1])
                prop_state = 0
            else:
                prop_state = 1 if inner.lower() in ID_BEARING_PROPS else 0
                out.append(tok)
        elif kind in ("variable", "number"):
            out.append(tok)
        elif kind == "other":
            if tok == "=" and prop_state == 1:
                prop_state = 2
            elif not tok.isspace():
                prop_state = 0
            out.append(tok)
        elif kind == "bquote":
            out.append("`" + lookup(tok[1:-1]) + "`")
        elif kind == "word":
            low = tok.lower()
            # "CREATE TABLE t1 (" — a name after TABLE/VIEW/DATABASE is an
            # identifier even when '(' follows (not a function call)
            after_object_kw = last_word in ("table", "view", "database")
            if low in KEYWORDS or (
                _is_function_call(sql, m.end()) and not after_object_kw
            ):
                out.append(tok)
            else:
                out.append(lookup(tok))
            last_word = low
    return "".join(out)


def anonymize_sql(
    sql: str,
    method: str = "hash",
    mini: MiniDict | None = None,
    reserve: set[str] | None = None,
    min_length: int | None = None,
) -> str:
    """Rewrite one SQL string. ``mini`` carries dictionary state across
    statements for a consistent minihash mapping; ``reserve`` lists
    identifiers (case-insensitive) left untouched (reference
    --anonymize-reserve-ids); ``min_length`` overrides the keep-short
    threshold of the hash method (reference --anonymize-id-min-length)."""
    if method not in ("hash", "minihash"):
        return sql
    mini = mini if mini is not None else MiniDict()
    reserve_l = {r.lower() for r in reserve} if reserve else None
    return _rewrite_sql(
        sql,
        lambda ident: _rewrite_id(ident, method, mini, reserve_l, min_length),
    )


def _rewrite_id(
    identifier: str,
    method: str,
    mini: MiniDict,
    reserve: set[str] | None = None,
    min_length: int | None = None,
) -> str:
    if reserve and identifier.lower() in reserve:
        return identifier
    ml = ANONYMIZE_MIN_LENGTH if min_length is None else min_length
    if method == "hash" and len(identifier) < ml:
        return identifier
    hashed = _hash_id(identifier)
    return hashed if method == "hash" else mini.alias(hashed)


def collect_identifiers(sql: str) -> list[str]:
    """Identifier vocabulary of one statement, in token order — by
    construction exactly the identifiers _rewrite_sql would rewrite
    (including those inside id-bearing property values)."""
    ids: list[str] = []

    def record(ident: str) -> str:
        ids.append(ident)
        return ident

    _rewrite_sql(sql, record)
    return ids


def anonymize_statements(
    spark: SparkSession,
    df: DataFrame,
    sql_col: str = "stmt",
    method: str = "minihash",
    max_vocab: int = 1_000_000,
) -> DataFrame:
    """Distributed two-phase anonymization with one consistent dictionary.

    Phase 1 collects the distinct identifier vocabulary (driver-side,
    bounded by schema size — ``max_vocab`` guards the collect and raises
    rather than OOM the driver on a degenerate corpus); phase 2 broadcasts
    the rename map and rewrites with an Arrow-batched pandas UDF."""
    vocab_rows = (
        df.select(F.explode(_extract_ids_udf()(F.col(sql_col))).alias("id"))
        .where(F.col("id") != "")
        .distinct()
        .limit(max_vocab + 1)
        .collect()
    )
    if len(vocab_rows) > max_vocab:
        raise ValueError(
            f"anonymize_statements: identifier vocabulary exceeds max_vocab={max_vocab}; "
            "the dictionary-order semantics require a driver-side dictionary — "
            "split the corpus or raise max_vocab explicitly"
        )
    mini = MiniDict()
    rename: dict[str, str] = {}
    for v in sorted({r["id"].lower() for r in vocab_rows}):
        if method == "hash" and len(v) < ANONYMIZE_MIN_LENGTH:
            continue  # same keep-short rule as _rewrite_id
        hashed = _hash_id(v)
        rename[v] = hashed if method == "hash" else mini.alias(hashed)
    bc = spark.sparkContext.broadcast(rename)

    @pandas_udf("string")
    def rewrite(s: pd.Series) -> pd.Series:
        table = bc.value
        # identical walker to the local path; missing entries (kept-short
        # ids) pass through with original case
        return s.map(lambda sql: _rewrite_sql(sql, lambda i: table.get(i.lower(), i)))

    return df.withColumn("anonymized", rewrite(F.col(sql_col)))


def _extract_ids_udf():
    @pandas_udf("array<string>")
    def extract(s: pd.Series) -> pd.Series:
        return s.map(collect_identifiers)

    return extract


@register(
    "anonymize_stable",
    # Derivational oracle: the two-phase path assigns minihash aliases in
    # sorted-vocabulary order, so the full rewrite is predictable. Vocab of
    # the synthetic corpus, sorted: custkey->a, customer_dim->b, id->c,
    # o_orderkey->d, o_totalprice->e, orders_tbl->f, revenue_0..4->g..k;
    # the '-- secret note' comment redacts to --'***' with the newline kept.
    oracle="""
    SELECT o_orderkey,
           'SELECT e, ' || list_extract(['g','h','i','j','k'], CAST(o_orderkey % 5 AS INTEGER) + 1)
           || ' FROM `f` JOIN b ON a = c --''***''' || chr(10)
           || 'WHERE d = ' || CAST(o_orderkey AS VARCHAR) AS anonymized
    FROM orders WHERE o_orderkey < 200
    """,
    doc="B14: stable SQL anonymization — consistent minihash aliases across "
    "a statement corpus; same identifier -> same alias everywhere; keywords, "
    "functions, literals, variables preserved; comments redacted "
    "(reference src/anonymizer.go:89-218, src/parser/custom.go:21-226). "
    "Full derivational oracle: aliases follow sorted-vocabulary order.",
)
def anonymize_stable(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 200)
    stmt = F.concat(
        F.lit("SELECT o_totalprice, revenue_"),
        (F.col("o_orderkey") % 5).cast("string"),
        F.lit(" FROM `orders_tbl` JOIN customer_dim ON custkey = id -- secret note\n"),
        F.lit("WHERE o_orderkey = "),
        F.col("o_orderkey").cast("string"),
    )
    df = o.select("o_orderkey", stmt.alias("stmt"))
    out = anonymize_statements(spark, df, "stmt", method="minihash")
    return out.select("o_orderkey", "anonymized")


# ---------------------------------------------------------------------------
# k-anonymity GENERALIZATION — the mechanism profile_k_anonymity's audit
# feeds: pick the minimal quasi-identifier coarsening that meets k
# ---------------------------------------------------------------------------
K_GEN_K = 20

# generalization ladder over (c_nationkey, c_mktsegment, c_acctbal):
#   0-2: acctbal in $100 / $400 / $1600 buckets
#   3:   acctbal suppressed
#   4:   + segment suppressed
#   5:   + nation coarsened to 5-nation groups
#   6:   everything suppressed (one class — always k-anonymous at n >= k)
_K_GEN_LEVELS = 7


@register(
    "anonymize_k_generalize",
    oracle=f"""
    WITH base AS (
      SELECT c_nationkey AS nat, c_mktsegment AS seg,
             CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      FROM customer
    ), lev AS (
      SELECT b.*, l.level FROM base b,
             (VALUES (0),(1),(2),(3),(4),(5),(6)) l(level)
    ), q AS (
      SELECT level,
             CASE WHEN level <= 4 THEN CAST(nat AS VARCHAR)
                  WHEN level = 5 THEN
                    CAST(CAST(FLOOR(nat / 5.0) AS BIGINT) AS VARCHAR)
                  ELSE '*' END AS qa,
             CASE WHEN level <= 3 THEN seg ELSE '*' END AS qb,
             CASE WHEN level = 0 THEN
                    CAST(CAST(FLOOR(cents / 10000.0) AS BIGINT) AS VARCHAR)
                  WHEN level = 1 THEN
                    CAST(CAST(FLOOR(cents / 40000.0) AS BIGINT) AS VARCHAR)
                  WHEN level = 2 THEN
                    CAST(CAST(FLOOR(cents / 160000.0) AS BIGINT) AS VARCHAR)
                  ELSE '*' END AS qc
      FROM lev
    ), classes AS (
      SELECT level, qa, qb, qc, COUNT(*) AS sz
      FROM q GROUP BY level, qa, qb, qc
    ), per_level AS (
      SELECT level, CAST(COUNT(*) AS BIGINT) AS n_classes,
             CAST(MIN(sz) AS BIGINT) AS min_class
      FROM classes GROUP BY level
    ), chosen AS (
      SELECT MIN(level) AS c FROM per_level WHERE min_class >= {K_GEN_K}
    )
    SELECT CAST(level AS BIGINT) AS level, n_classes, min_class,
           (min_class >= {K_GEN_K}) AS meets_k,
           (level = (SELECT c FROM chosen)) AS chosen
    FROM per_level ORDER BY level
    """,
    doc="k-anonymity GENERALIZATION (the mechanism consuming "
    "profile_k_anonymity's audit): a 7-level ladder coarsens the "
    "quasi-identifiers (acctbal $100/$400/$1600 buckets -> suppressed; "
    "then segment; then nation to 5-nation groups; then full "
    "suppression) and the MINIMAL level whose worst equivalence class "
    "reaches k=20 is chosen. Evaluated SET-BASED: one scan exploded "
    "x7 levels (map-side), one groupBy over (level, QI tuple), so "
    "adding ladder rungs never rescans the base table — at 100 TB the "
    "ladder evaluation costs one aggregate, not one pass per rung. "
    "Full per-level report (classes, worst class, meets_k) with the "
    "chosen level flagged; the top rung is a single class, so a "
    "feasible level always exists at n >= k.",
)
def anonymize_k_generalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    lev = cust.select(
        F.col("c_nationkey").alias("nat"),
        F.col("c_mktsegment").alias("seg"),
        (F.col("c_acctbal").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents"),
    ).withColumn("level", F.explode(F.sequence(F.lit(0), F.lit(_K_GEN_LEVELS - 1))))
    nat, seg, cents, level = (F.col(c) for c in ("nat", "seg", "cents", "level"))
    qa = (
        F.when(level <= 4, nat.cast("string"))
        .when(level == 5, F.floor(nat / 5.0).cast("bigint").cast("string"))
        .otherwise("*")
    )
    qb = F.when(level <= 3, seg).otherwise("*")
    qc = (
        F.when(level == 0, F.floor(cents / 10000.0).cast("bigint").cast("string"))
        .when(level == 1, F.floor(cents / 40000.0).cast("bigint").cast("string"))
        .when(level == 2, F.floor(cents / 160000.0).cast("bigint").cast("string"))
        .otherwise("*")
    )
    classes = (
        lev.select(level.alias("level"), qa.alias("qa"), qb.alias("qb"), qc.alias("qc"))
        .groupBy("level", "qa", "qb", "qc")
        .agg(F.count("*").alias("sz"))
    )
    per_level = classes.groupBy("level").agg(
        F.count("*").cast("bigint").alias("n_classes"),
        F.min("sz").cast("bigint").alias("min_class"),
    )
    chosen = per_level.filter(F.col("min_class") >= K_GEN_K).agg(
        F.min("level").alias("c")
    )
    return (
        per_level.crossJoin(F.broadcast(chosen))
        .select(
            F.col("level").cast("bigint").alias("level"),
            "n_classes",
            "min_class",
            (F.col("min_class") >= K_GEN_K).alias("meets_k"),
            (F.col("level") == F.col("c")).alias("chosen"),
        )
        .orderBy("level")
    )
