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


def test_streaming_jsonl_ingest_exactly_once_restart(spark, tmp_path):
    """Restarting the JSONL ingest stream against the same checkpoint
    re-delivers no batch: version list and content are unchanged (the
    exactly-once contract), and corrupt lines never reach the table."""
    from dodo_spark.sources.jsonl import (
        stream_jsonl_to_versioned,
        write_jsonl_corpus,
    )
    from dodo_spark.sources.versioned import list_versions, read_version

    df = spark.createDataFrame(
        [(i, f"doc {i}", "en", "web", 5) for i in range(6)],
        "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT",
    )
    landing = str(tmp_path / "landing")
    write_jsonl_corpus(df, landing)
    (tmp_path / "landing" / "bad.txt").write_text('{"torn\nnot json\n')

    table = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ckpt")
    stream_jsonl_to_versioned(spark, landing, table, checkpoint_dir=ckpt)
    versions = list_versions(table)
    got = {r["doc_id"] for r in read_version(spark, table).collect()}
    assert got == set(range(6))  # clean rows only; corrupt never ingested

    # restart with the same checkpoint: no new files -> no new versions
    stream_jsonl_to_versioned(spark, landing, table, checkpoint_dir=ckpt)
    assert list_versions(table) == versions
    assert {r["doc_id"] for r in read_version(spark, table).collect()} == got


def test_cli_ingest_jsonl_batch_and_corrupt_exit(spark, tmp_path, capsys):
    """CLI batch ingest: first call commits v0, second appends v1, corrupt
    lines are reported, and --fail-on-corrupt flips the exit code."""
    from dodo_spark.cli import main
    from dodo_spark.sources.jsonl import write_jsonl_corpus
    from dodo_spark.sources.versioned import list_versions, read_version

    df = spark.createDataFrame(
        [(i, f"doc {i}", "en", "web", 5) for i in range(4)],
        "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT",
    )
    landing = str(tmp_path / "landing")
    write_jsonl_corpus(df, landing)
    table = str(tmp_path / "tbl")
    assert main(["ingest-jsonl", "--input", landing, "--table", table]) == 0
    assert "v0 (0 corrupt line(s) quarantined)" in capsys.readouterr().out
    assert list_versions(table) == [0]

    (tmp_path / "landing2").mkdir()
    (tmp_path / "landing2" / "a.txt").write_text(
        '{"doc_id": 9, "text": "late", "lang": "en", "source": "web", "n_chars": 4}\n'
        "garbage line\n"
    )
    rc = main(["ingest-jsonl", "--input", str(tmp_path / "landing2"),
               "--table", table, "--fail-on-corrupt"])
    assert rc == 1  # corrupt line present -> nonzero under --fail-on-corrupt
    out = capsys.readouterr().out
    assert "1 corrupt line(s) quarantined" in out
    assert list_versions(table) == [0, 1]  # the clean row still committed
    got = {r["doc_id"] for r in read_version(spark, table).collect()}
    assert got == {0, 1, 2, 3, 9}


def test_jsonl_roundtrip_fuzz(spark, tmp_path):
    """Seeded random hostile text (JSON metacharacters, control chars,
    backslash runs, CJK + astral unicode, embedded newlines/tabs, empty
    and NULL) through the JSONL export/import — every value must round
    trip exactly, no line may tear, and nothing may land in _corrupt."""
    import random

    from pyspark.sql import functions as F

    from dodo_spark.sources.jsonl import read_jsonl_corpus, write_jsonl_corpus

    rng = random.Random(13)
    alphabet = [
        '"', "\\", "{", "}", "[", "]", ":", ",", "\n", "\r", "\t", "\x00",
        "\x1b", "a", "7", " ", "é", "汉", "☆", "🦆", " ", " ",
    ]

    def s():
        if rng.random() < 0.1:
            return None
        return "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 40)))

    rows = [(i, s(), s(), s(), rng.randrange(-5, 10**12)) for i in range(120)]
    df = spark.createDataFrame(
        rows, "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
    )
    path = str(tmp_path / "fuzz")
    write_jsonl_corpus(df, path)
    back = read_jsonl_corpus(spark, path)
    assert back.filter(F.col("_corrupt").isNotNull()).count() == 0
    got = {
        r["doc_id"]: (r["text"], r["lang"], r["source"], r["n_chars"])
        for r in back.collect()
    }
    want = {i: (t, l, src, n) for i, t, l, src, n in rows}
    diffs = [(k, got[k], want[k]) for k in want if got.get(k) != want[k]]
    assert len(got) == len(want)
    assert not diffs, diffs[:3]
