"""JSONL corpus ingestion: round-trip fidelity + corrupt-line quarantine."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_jsonl_roundtrip_hostile_content(spark, tmp_path):
    """Text with quotes, backslashes, newlines, tabs, and multibyte chars
    survives the JSONL export/import byte-for-byte."""
    from dodo_spark.sources.jsonl import read_jsonl_corpus, write_jsonl_corpus

    hostile = 'quote " backslash \\ newline \n tab \t cjk 世界 acc é end'
    rows = [
        (0, hostile, "zh", "web", len(hostile)),
        (1, '{"looks": "like json"}', "en", "web", 22),
        (2, "", "en", "web", 0),  # empty text survives too
    ]
    df = spark.createDataFrame(
        rows, "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
    )
    path = str(tmp_path / "corpus")
    write_jsonl_corpus(df, path)
    back = read_jsonl_corpus(spark, path)
    assert back.filter(F.col("_corrupt").isNotNull()).count() == 0
    got = {r["doc_id"]: r["text"] for r in back.collect()}
    assert got == {0: hostile, 1: '{"looks": "like json"}', 2: ""}


def test_jsonl_corrupt_lines_quarantined_with_payload(spark, tmp_path):
    """Malformed lines land whole in _corrupt (auditable quarantine) and
    never surface as parsed rows; valid lines in the same file still
    parse."""
    from dodo_spark.sources.jsonl import read_jsonl_corpus

    lines = [
        '{"doc_id": 1, "text": "ok", "lang": "en", "source": "web", "n_chars": 2}',
        '{"doc_id": 2, "text": "torn',
        "plainly not json",
    ]
    path = tmp_path / "mixed"
    path.mkdir()
    (path / "part-00000.txt").write_text("\n".join(lines) + "\n")
    back = read_jsonl_corpus(spark, str(path))
    corrupt = {r["_corrupt"] for r in back.filter(F.col("_corrupt").isNotNull()).collect()}
    assert corrupt == {'{"doc_id": 2, "text": "torn', "plainly not json"}
    ok = back.filter(F.col("_corrupt").isNull()).collect()
    assert len(ok) == 1 and ok[0]["doc_id"] == 1 and ok[0]["text"] == "ok"
