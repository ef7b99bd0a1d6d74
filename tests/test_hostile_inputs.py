"""Adversarial-input hardening of the text/log surface (round-13 ask #2).

The audit-log extractor, the SQL unescaper, the anonymizer tokenizer and
the BPE encode kernel all parse UNTRUSTED text (a log dump, a statement
corpus, a crawled document set). These tests pin their behavior on inputs
a well-formed corpus never produces — multi-MiB single lines, NUL/control
chars inside fields (including each kernel's own sentinel characters),
unterminated string literals and comments, mixed/odd unicode (the
reference tolerates mixed encodings per src/misc.go:116-130) — so hostile
input degrades to a DOCUMENTED normalization or a clean rejection, never
to silently wrong fields or a cross-engine hash divergence.

Each behavior pinned here is stated in the operator's docstring; where a
pre-clean pass exists (the audit extractor strips its own two splice
sentinel chars), the test proves both the normalization and that ordinary
fields are untouched by it.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from dodo_spark.sources.auditlog import (
    extract_statements,
    sql_unescape_duckdb,
    unescape_stmt,
)


def _line(stmt: str, qid: str = "abc-123", state: str = "OK") -> str:
    """One well-formed Doris audit line around an arbitrary stmt payload."""
    return (
        "2024-01-01 12:00:00,123 [query] |Client=10.0.0.1:9030|User=u1"
        f"|Db=db1|State={state}|ErrorCode=0|Time=42|ScanBytes=0"
        f"|QueryId={qid}|IsQuery=true|FeIp=10.0.0.2|Stmt={stmt}|CpuTimeMS=7"
    )


def _extract(spark, lines: list[str]):
    df = spark.createDataFrame([(ln,) for ln in lines], "line STRING")
    return {
        r["query_id"]: r
        for r in extract_statements(df, "line").collect()
    }


# --------------------------------------------------------------------------
# surface 1: audit-log extractor (B3) — splice-sentinel injection + huge line
# --------------------------------------------------------------------------
def test_auditlog_splice_sentinel_injection(spark):
    """The extractor splices its 9 regex groups with the \\x00\\x1f sentinel
    pair before splitting. A hostile stmt CONTAINING those control chars
    must not shear the field split (wrong query_id / truncated stmt) —
    the documented normalization is that NUL and US are stripped from the
    record up front (they cannot appear in the '|'-delimited printable log
    format), and every other field survives byte-for-byte."""
    hostile = [
        _line("SELECT '\x00\x1f' AS both_sentinels", qid="q-both"),
        _line("SELECT a\x00b FROM t", qid="q-nul"),
        _line("SELECT a\x1fb FROM t", qid="q-us"),
        _line("\x00\x1fSELECT leading", qid="q-lead"),
        _line("SELECT trailing\x1f\x00", qid="q-trail"),
        _line("SELECT plain FROM t", qid="q-clean"),
    ]
    got = _extract(spark, hostile)
    assert set(got) == {"q-both", "q-nul", "q-us", "q-lead", "q-trail", "q-clean"}
    for r in got.values():  # no field shear anywhere
        assert r["ts"] == "2024-01-01 12:00:00.123"
        assert r["client"] == "10.0.0.1:9030"
        assert r["user"] == "u1"
        assert r["db"] == "db1"
        assert r["state"] == "OK"
        assert r["duration_ms"] == 42
        assert r["is_query"] is True
    assert got["q-both"]["stmt"] == "SELECT '' AS both_sentinels"
    assert got["q-nul"]["stmt"] == "SELECT ab FROM t"
    assert got["q-us"]["stmt"] == "SELECT ab FROM t"
    assert got["q-lead"]["stmt"] == "SELECT leading"
    assert got["q-trail"]["stmt"] == "SELECT trailing"
    assert got["q-clean"]["stmt"] == "SELECT plain FROM t"


def test_auditlog_huge_single_line(spark):
    """A 10 MiB single-line statement (the audit plugin truncates long
    statements, but a replayed/concatenated dump may not) parses without
    error and the stmt payload survives intact — the one-pass
    regexp_replace+split pipeline is linear in line length, no
    backtracking blowup."""
    payload = "SELECT " + ("x" * (10 * 1024 * 1024)) + " FROM t"
    got = _extract(spark, [_line(payload, qid="q-huge")])
    assert got["q-huge"]["stmt"] == payload
    assert got["q-huge"]["duration_ms"] == 42


def test_auditlog_malformed_lines_reject_cleanly(spark):
    """Garbage that does not match the record pattern is FILTERED, not
    mis-parsed: binary noise, half a record, an empty line, a field
    injection attempting to fake a later field inside Stmt."""
    rows = [
        "\x00\x01\x02 binary noise",
        "2024-01-01 12:00:00,1 [query] |Client=only-half-a-record",
        "",
        _line("SELECT ok", qid="q-ok"),
        # pipe-delimited injection INSIDE stmt: lazy (.+?) stops at the
        # first '|CpuTimeMS=' so the faked tail stays out of the stmt
        _line("SELECT evil|CpuTimeMS=0|Stmt=faked", qid="q-inj"),
    ]
    got = _extract(spark, rows)
    assert set(got) == {"q-ok", "q-inj"}
    assert got["q-inj"]["stmt"] == "SELECT evil"


# --------------------------------------------------------------------------
# surface 2: SQL unescape (B6) — unterminated literals/comments, cross-engine
# --------------------------------------------------------------------------
HOSTILE_STMTS = [
    # unterminated single-quoted literal: the literal token can't match, so
    # the tail tokenizes as chars and its escapes ARE rewritten (documented
    # fallback — the reference's tokenizer degrades the same way)
    "SELECT 'unterminated \\n tail",
    # unterminated block comment
    "SELECT 1 /* never closed \\t x",
    # line comment with backslash (the token stops at '\\' by design so the
    # \\n that ENDS the comment is still rewritten)
    "SELECT 1 -- note \\n next",
    # trailing lone backslash (the '\\.' token needs a char after it)
    "SELECT x \\",
    # NUL + control chars around escapes
    "A\x00B\\nC\x01D",
    # doubled-quote escape inside a literal, then a real escape outside
    "SELECT 'it''s \\n kept'\\nFROM t",
    # escaped quote inside a literal (backslash form)
    "SELECT 'a\\'b \\n c' \\t d",
    # odd unicode: BOM, RTL mark, combining mark, replacement char
    "﻿SELECT ‏'́�' \\n x",
    # empty string
    "",
    # a 1 MiB statement: escapes sprinkled through a long literal-free body
    ("SELECT col \\n FROM t WHERE x = 1 AND " + "y" * (1 << 20) + " \\t z"),
]


def test_unescape_hostile_cross_engine(spark):
    """Every hostile statement unescapes to the SAME bytes on Spark and on
    the DuckDB oracle twin — the tokenizer alternation degrades
    identically on both engines, so hostile input can never produce a
    wrong (diverging) parity hash."""
    rows = [(i, s) for i, s in enumerate(HOSTILE_STMTS)]
    rows.append((len(rows), None))  # NULL stays NULL on both engines
    df = spark.createDataFrame(rows, "i INT, stmt STRING")
    got = {
        r["i"]: r["u"]
        for r in df.select("i", unescape_stmt(F.col("stmt")).alias("u")).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (i INT, stmt VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = dict(
        con.execute(f"SELECT i, {sql_unescape_duckdb('stmt')} FROM t").fetchall()
    )
    diffs = [
        (i, repr(got[i])[:120], repr(want[i])[:120])
        for i in got
        if got[i] != want[i]
    ]
    assert not diffs, diffs[:3]
    assert got[len(HOSTILE_STMTS)] is None  # NULL in -> NULL out
    # and the documented fallbacks hold
    assert got[0] == "SELECT 'unterminated \n tail"      # rewritten in tail
    assert got[2] == "SELECT 1 -- note \n next"          # comment ends at \n
    assert got[5] == "SELECT 'it''s \\n kept'\nFROM t"   # literal protected
    assert got[8] == ""


def test_unescape_terminated_literal_protects_escapes(spark):
    """Sanity inverse of the fallback: a TERMINATED literal keeps its \\n
    verbatim while the same escape outside is rewritten."""
    df = spark.createDataFrame([("x '\\n' y \\n z",)], "stmt STRING")
    out = df.select(unescape_stmt(F.col("stmt")).alias("u")).collect()[0]["u"]
    assert out == "x '\\n' y \n z"


# --------------------------------------------------------------------------
# surface 3: anonymizer tokenizer (B14) — unterminated quotes, control chars
# --------------------------------------------------------------------------
ANON_HOSTILE = [
    "SELECT secret_column FROM `unterminated_backtick",
    "SELECT 'unterminated literal FROM secret_table",
    'SELECT "unterminated dquote FROM secret_table',
    "SELECT /* unterminated comment secret_table",
    "SELECT a\x00secret_one\x00b, secret_two FROM t",
    "\x1e\x1fSELECT secret_three FROM \x07t2\x07",
    "SELECT ćol, seçret FROM t",  # non-ASCII letters split words
    "SELECT secret_four FROM t -- trailing comment with secret_five",
    "@@version, @var, 1.5e-3, secret_six(",
    "",
]


def test_anonymizer_hostile_never_crashes_and_is_deterministic():
    """The token walker must terminate and be deterministic on every
    hostile statement; collect_identifiers and the rewrite walker must
    agree (the two-phase distributed path depends on that identity); and
    no >=3-char identifier it collected may survive a hash-mode rewrite."""
    from dodo_spark.anonymize import (
        MiniDict,
        anonymize_sql,
        collect_identifiers,
    )

    for sql in ANON_HOSTILE:
        ids = collect_identifiers(sql)
        out1 = anonymize_sql(sql, method="hash")
        out2 = anonymize_sql(sql, method="hash")
        assert out1 == out2  # deterministic
        mini_out = anonymize_sql(sql, method="minihash", mini=MiniDict())
        assert isinstance(mini_out, str)
        import re as _re

        for ident in ids:
            if len(ident) >= 3 and ident.isascii():
                # whole-token survival only: a 1-char id like 'a' may
                # legitimately appear inside hashes/keywords
                assert not _re.search(
                    rf"\b{_re.escape(ident)}\b", out1
                ), (sql, ident, out1)


def test_anonymizer_unterminated_tokens_degrade_to_chars():
    """An unterminated backtick/literal cannot form its token, so the tail
    tokenizes as words + chars: identifiers in the tail are still
    rewritten (no secret leaks through an unclosed quote) and keywords
    are still preserved."""
    from dodo_spark.anonymize import anonymize_sql

    out = anonymize_sql("SELECT secret_column FROM `unterminated_backtick")
    assert "secret_column" not in out
    assert "unterminated_backtick" not in out
    assert out.startswith("SELECT ")
    assert " FROM `" in out  # the lone backtick passes through as a char

    out2 = anonymize_sql("SELECT 'unterminated literal FROM secret_table")
    assert "secret_table" not in out2


def test_anonymizer_unicode_identifiers_documented():
    """Identifier tokens are ASCII [A-Za-z_][A-Za-z_0-9]* — the reference
    grammar's identifier class. A non-ASCII letter SPLITS a word, so the
    ASCII fragments around it are rewritten independently and the
    non-ASCII char passes through (documented; mixed-encoding corpora per
    reference src/misc.go:116-130 keep their non-ASCII bytes)."""
    from dodo_spark.anonymize import anonymize_sql

    out = anonymize_sql("SELECT seçret FROM t")
    assert "ç" in out
    assert "secret" not in out  # neither fragment can reassemble the word
    assert "seçret" not in out


def test_anonymizer_megabyte_statement():
    """A 1 MiB statement (one long IN-list) rewrites in one pass without
    pathological backtracking — the token regex is alternation-of-atoms
    with no nested quantifiers."""
    from dodo_spark.anonymize import anonymize_sql

    sql = (
        "SELECT secret_col FROM secret_tbl WHERE id IN ("
        + ",".join(str(i) for i in range(200_000))
        + ")"
    )
    assert len(sql) > (1 << 20)
    out = anonymize_sql(sql)
    assert "secret_col" not in out and "secret_tbl" not in out
    assert out.count(",") == sql.count(",")  # numbers all preserved


# --------------------------------------------------------------------------
# surface 4: BPE encode kernel — sentinel chars inside words, cross-engine
# --------------------------------------------------------------------------
def _hostile_docs(spark, tmp_path):
    """documents.parquet whose words embed the BPE kernel's OWN wrap
    sentinels (\\x1e/\\x1f), other control chars, multibyte unicode and a
    100k-char word."""
    texts = [
        "the\x1ein and ther\x1fthe",          # sentinels inside words
        "a\x01b\x02c the rethe anthe",        # other control chars
        "汉字 the 🦆er iń",              # multibyte + combining
        "thethethe " + "in" * 50_000,         # 100k-char word
        "the the the and and in",             # plain control group
    ]
    rows = [(i, t, "xx", "web", len(t)) for i, t in enumerate(texts)]
    df = spark.createDataFrame(
        rows, "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
    )
    d = str(tmp_path)
    df.coalesce(1).write.parquet(f"{d}/documents.parquet")
    return d


def test_bpe_encode_sentinel_words_cross_engine(spark, tmp_path):
    """The kernel's docstring documents its domain edge: a corpus that
    embeds the \\x1e/\\x1f wrap sentinels inside words is outside the
    whitespace-token domain and would need a pre-clean pass. This pins
    what the kernel does WITHOUT one: both engines run the identical
    wrap-replace-count chain, so even sentinel-bearing words produce the
    SAME numbers on Spark and DuckDB — a hostile corpus can skew its own
    token counts but can never produce a cross-engine parity divergence
    (a wrong hash)."""
    from dodo_spark import registry

    d = _hostile_docs(spark, tmp_path)
    sp = registry.queries()["text_bpe_encode"](spark, d).toPandas()

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet/*.parquet')"
    )
    want = con.execute(registry.oracle_sql()["text_bpe_encode"]).df()
    assert len(sp) == len(want) == 1
    for c in ("n_words", "n_chars", "n_tokens", "merges_fired"):
        assert int(sp[c].iloc[0]) == int(want[c].iloc[0]), c
    assert abs(
        float(sp["tokens_per_word"].iloc[0]) - float(want["tokens_per_word"].iloc[0])
    ) < 1e-12
    # merges DID fire (the corpus contains real 'th'/'in'/'the' material),
    # so the agreement above exercises the replace chain, not a no-op
    assert int(sp["merges_fired"].iloc[0]) > 0


def test_bpe_kernel_sentinel_word_is_normalized_not_wrong(spark):
    """Unit form of the same edge: a word carrying a raw \\x1e or \\x1f
    still yields a POSITIVE, deterministic token count bounded by its
    character count (the spurious boundaries can only prevent merges,
    never corrupt the count function itself)."""
    from dodo_spark.operators.text import _bpe_token_count

    words = ["th\x1ee", "\x1fthe", "the\x1e", "t\x1fh\x1ee", "the"]
    df = spark.createDataFrame([(w,) for w in words], "w STRING")
    got = {
        r["w"]: r["n"]
        for r in df.select(
            "w", _bpe_token_count(F.col("w")).cast("int").alias("n")
        ).collect()
    }
    assert got["the"] == 1           # clean word fully merges
    for w, n in got.items():
        # a raw \x1f (the kernel's own token-closer) inside a word adds one
        # spurious closer to the count; a raw \x1e adds boundaries that can
        # only PREVENT merges. Both are deterministic, bounded skew — never
        # a corrupt count, and never cross-engine divergence (test above).
        assert 1 <= n <= len(w) + w.count("\x1f"), (repr(w), n)


# --------------------------------------------------------------------------
# surface 5: corpus tokenizer/stats on a multi-MiB single-line document
# --------------------------------------------------------------------------
def test_text_surface_10mib_single_line_document(spark, tmp_path):
    """A 10 MiB single-line document (no whitespace at all in the tail —
    the worst case for a whitespace tokenizer: ONE 10M-char token) flows
    through the text stats surface without error and with exact counts.
    At 100 TB this is the 'one pathological crawl page' case: per-row
    cost stays linear, nothing buffers more than the row."""
    from dodo_spark import registry

    big = "lead tok " + "z" * (10 * 1024 * 1024)
    rows = [
        (1, big, "en", "web", len(big)),
        (2, "small doc two tokens", "en", "web", 20),
    ]
    df = spark.createDataFrame(
        rows, "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
    )
    d = str(tmp_path)
    df.coalesce(1).write.parquet(f"{d}/documents.parquet")

    got = {
        r["doc_id"]: r
        for r in registry.queries()["text_tokens"](spark, d).collect()
    }
    assert got[1]["chars"] == len(big)
    assert got[1]["ws_tokens"] == 3
    assert got[2]["ws_tokens"] == 4


# --------------------------------------------------------------------------
# surface 6: multimodal header parser on hostile binary payloads
# --------------------------------------------------------------------------
class TestMediaHeaderHostile:
    """parse_media_header struct-unpacks untrusted binary. Its contract on
    hostile bytes: NEVER raise (a poison payload must not kill a 100 TB
    scan), always return (fmt in the known set, int-or-None fields). A
    truncated magic (e.g. a PNG cut before IHDR) is classified "unknown"
    rather than half-parsed — documented fail-closed behavior."""

    FMTS = {"png", "wav", "jpeg", "gif", "unknown"}

    def _check(self, payload: bytes):
        from dodo_spark.multimodal import parse_media_header

        fmt, w, h, sr = parse_media_header(payload)
        assert fmt in self.FMTS
        for v in (w, h, sr):
            assert v is None or (isinstance(v, int) and v >= 0)
        return fmt, w, h, sr

    def test_truncated_magics_fail_closed(self):
        cases = {
            b"": "unknown",
            b"\x89PNG\r\n\x1a\n": "unknown",          # magic, no IHDR
            b"\x89PNG\r\n\x1a\n" + b"\x00" * 10: "unknown",  # cut mid-IHDR
            b"RIFF1234WAVE": "unknown",                # no fmt chunk
            b"GIF89a": "unknown",                      # no screen size
            b"\xff\xd8": "jpeg",                       # bare SOI: fmt known,
        }                                              # dims honestly None
        for payload, want in cases.items():
            fmt, w, h, sr = self._check(payload)
            assert fmt == want, (payload, fmt)
            if payload == b"\xff\xd8":
                assert (w, h, sr) == (None, None, None)

    def test_jpeg_hostile_segment_lengths_terminate(self):
        # zero-length segment still advances (i += 2 + seg_len with
        # seg_len>=0 moves past the marker pair); a seg_len pointing past
        # the end exits the scan bound; 0xFF fill bytes are tolerated
        for tail in (b"\xff\xfe\x00\x00" * 50,          # seg_len=0 chain
                     b"\xff\xfe\xff\xff" + b"A" * 20,   # overshoot length
                     b"\xff" * 64,                      # fill-byte run
                     b"\xff\xc0\x00\x05\x08\x00"):      # SOF cut mid-dims
            self._check(b"\xff\xd8" + tail)

    def test_fuzz_arbitrary_bytes_never_raise(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        @settings(max_examples=300, deadline=None)
        @given(st.binary(max_size=128))
        def fuzz(payload):
            self._check(payload)

        fuzz()

    def test_fuzz_corrupted_real_headers(self):
        """Flip bytes inside WELL-FORMED headers — the adversarial middle
        ground between valid files and random noise."""
        import struct

        from hypothesis import given, settings
        from hypothesis import strategies as st

        png = b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR" + struct.pack(">II", 640, 480) + b"\x08\x02" + b"\x00" * 7
        wav = b"RIFF" + struct.pack("<I", 36) + b"WAVEfmt " + struct.pack("<IHHI", 16, 1, 1, 44100) + b"\x00" * 8
        jpg = b"\xff\xd8\xff\xc0" + struct.pack(">H", 11) + b"\x08" + struct.pack(">HH", 480, 640) + b"\x03" + b"\x00" * 4
        gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\x00" * 4

        @settings(max_examples=200, deadline=None)
        @given(
            st.sampled_from([png, wav, jpg, gif]),
            st.integers(min_value=0, max_value=30),
            st.integers(min_value=0, max_value=255),
        )
        def fuzz(base, pos, val):
            if pos < len(base):
                base = base[:pos] + bytes([val]) + base[pos + 1:]
            self._check(base)

        fuzz()


# --------------------------------------------------------------------------
# surface 7: JSONL corpus ingest — hostile lines and hostile payloads
# --------------------------------------------------------------------------
class TestJsonlHostile:
    """The JSONL reader (sources/jsonl.py) parses untrusted crawl-dump
    lines with an explicit schema + PERMISSIVE _corrupt capture. Pinned
    here (each probed against live JacksonParser semantics):

    - a document whose JSON genuinely CONTAINS a ``_corrupt`` field parses
      clean — the injected field is ignored, never mistaken for the
      parser's own corrupt marker, never mis-quarantines the row;
    - duplicate keys: last occurrence wins (Jackson stream order), row
      stays clean;
    - ``{}`` is VALID JSON: an all-null clean row (missing fields -> null
      is the PERMISSIVE contract), not a quarantined line — downstream
      gates filter on doc_id IS NOT NULL (the streaming path does);
    - array-wrapped and bare-scalar lines quarantine whole;
    - hostile PAYLOADS (NUL, control chars, quotes, newlines, emoji,
      lone-surrogate-free unicode) survive the write->read round trip
      byte-for-byte — to_json escapes keep one doc per line.
    """

    def _read(self, spark, tmp_path, lines: list[str]):
        from dodo_spark.sources.jsonl import read_jsonl_corpus

        p = tmp_path / "hostile.jsonl"
        p.write_text("\n".join(lines) + "\n", encoding="utf-8")
        return read_jsonl_corpus(spark, str(tmp_path)).collect()

    def test_corrupt_field_injection_is_ignored(self, spark, tmp_path):
        rows = self._read(spark, tmp_path, [
            '{"doc_id": 1, "text": "x", "lang": "en", "source": "w",'
            ' "n_chars": 1, "_corrupt": "injected marker"}',
        ])
        [r] = rows
        assert r["doc_id"] == 1 and r["text"] == "x"
        assert r["_corrupt"] is None  # injection cannot fake a quarantine

    def test_duplicate_keys_last_wins_and_stays_clean(self, spark, tmp_path):
        rows = self._read(spark, tmp_path, [
            '{"doc_id": 3, "doc_id": 4, "text": "dup", "lang": "en",'
            ' "source": "w", "n_chars": 3}',
        ])
        [r] = rows
        assert r["doc_id"] == 4 and r["_corrupt"] is None

    def test_empty_object_is_allnull_clean_row(self, spark, tmp_path):
        rows = self._read(spark, tmp_path, ["{}"])
        [r] = rows
        assert r["_corrupt"] is None
        assert all(r[c] is None for c in ("doc_id", "text", "lang"))

    def test_structural_garbage_quarantines_whole_line(self, spark, tmp_path):
        lines = [
            '[{"doc_id": 8, "text": "array-wrapped"}]',
            "null",
            '"just a string"',
            "{unquoted: keys}",
        ]
        rows = self._read(spark, tmp_path, lines)
        assert sorted(r["_corrupt"] for r in rows) == sorted(lines)
        assert all(r["doc_id"] is None for r in rows)

    def test_invalid_utf8_degrades_to_replacement_chars(self, spark, tmp_path):
        # raw 0xFF 0xFE inside the text field: spark.read.text decodes with
        # U+FFFD replacement (the reference tolerates mixed encodings,
        # src/misc.go:116-130); the row parses CLEAN, nothing is dropped
        p = tmp_path / "bad.jsonl"
        p.write_bytes(
            b'{"doc_id": 9, "text": "bad \xff\xfe bytes", "lang": "en",'
            b' "source": "w", "n_chars": 4}\n'
        )
        from dodo_spark.sources.jsonl import read_jsonl_corpus

        [r] = read_jsonl_corpus(spark, str(tmp_path)).collect()
        assert r["doc_id"] == 9 and r["_corrupt"] is None
        assert r["text"] == "bad �� bytes"

    def test_hostile_payload_round_trip_byte_exact(self, spark, tmp_path):
        from dodo_spark.sources.jsonl import (
            read_jsonl_corpus,
            write_jsonl_corpus,
        )

        texts = [
            "nul \x00 us \x1f bel \x07 inside",
            'quotes " and \\ backslashes \\" mixed',
            "raw\nnewline and\ttab and\r\ncrlf",
            "emoji \U0001f600 combining é rtl שלום",
            "{\"looks\": \"like json\"}",
            "x" * (1024 * 1024),  # 1 MiB single token
        ]
        rows = [(i, t, "en", "w", len(t)) for i, t in enumerate(texts)]
        df = spark.createDataFrame(
            rows,
            "doc_id BIGINT, text STRING, lang STRING, source STRING,"
            " n_chars BIGINT",
        )
        out = str(tmp_path / "rt")
        write_jsonl_corpus(df, out)
        got = {
            r["doc_id"]: r for r in read_jsonl_corpus(spark, out).collect()
        }
        assert len(got) == len(texts)  # raw \n never tears a line
        for i, t in enumerate(texts):
            assert got[i]["text"] == t, f"doc {i} mutated in round trip"
            assert got[i]["_corrupt"] is None


# --------------------------------------------------------------------------
# surface 8: CSV emit dialect (C13) on hostile values
# --------------------------------------------------------------------------
class TestCsvDialectHostile:
    """The gendata CSV emitter writes the reference dialect ('☆' separator,
    '\\N' nulls — src/gendata.go:16-19). Hostile values exercise the
    quoting boundary; pinned behavior on a same-dialect Spark read-back:

    - a value CONTAINING the '☆' separator, embedded quotes, or raw
      newlines is quoted/escaped by the writer and survives byte-exact
      (newlines need the multiLine read option — one quoted record, the
      line is never torn);
    - two DOCUMENTED LOSSY edges inherent to the dialect itself, not the
      writer: a string value that IS the literal '\\N' marker emits
      indistinguishably from NULL, and a bare empty string reads back as
      NULL (Doris stream load has the same ambiguity — '\\N' IS the null
      word, and an unquoted empty field carries no empty-vs-null bit).
    """

    def _round_trip(self, spark, tmp_path, vals):
        from dodo_spark.gendata.plan import CSV_NULL, CSV_SEP, GendataPlan

        d = str(tmp_path / "csv")
        df = spark.createDataFrame(vals, "id BIGINT, v STRING")
        GendataPlan.write_csv(df, d)
        back = (
            spark.read.option("sep", CSV_SEP)
            .option("nullValue", CSV_NULL)
            .option("emptyValue", "")
            .option("multiLine", "true")
            .schema("id BIGINT, v STRING")
            .csv(d)
        )
        return {r["id"]: r["v"] for r in back.collect()}

    def test_separator_quote_newline_survive_byte_exact(self, spark, tmp_path):
        from dodo_spark.gendata.plan import CSV_SEP

        vals = [
            (1, "with" + CSV_SEP + "sep"),
            (2, 'has "quote" inside'),
            (3, "line1\nline2"),
            (4, CSV_SEP * 5),
            (5, '"' + CSV_SEP + '\n' + '"'),
        ]
        got = self._round_trip(spark, tmp_path, vals)
        for i, v in vals:
            assert got[i] == v, f"id {i} mutated: {got[i]!r} != {v!r}"

    def test_null_word_and_empty_are_documented_lossy(self, spark, tmp_path):
        from dodo_spark.gendata.plan import CSV_NULL

        got = self._round_trip(
            spark, tmp_path, [(1, CSV_NULL), (2, None), (3, "")]
        )
        # the literal '\N' string, real NULL, and '' all read back NULL —
        # the dialect has no way to spell them apart; callers that must
        # preserve such values route through parquet, not the CSV emit
        assert got == {1: None, 2: None, 3: None}


# --------------------------------------------------------------------------
# surface 9: replay meta-comment decoder (B7) on hostile replay files
# --------------------------------------------------------------------------
class TestReplayDecodeHostile:
    """decode_replay_sqls parses ``/*dodo{json}*/ stmt`` lines from an
    untrusted replay file (reference meta-comment format,
    src/replay.go:427-442). Pinned hostile behavior:

    - a line with NO meta comment is FILTERED, never mis-parsed;
    - malformed meta JSON (including a meta sheared early by a ``}*/``
      sequence inside a string value — the non-greedy brace match ends at
      the first ``}*/``) degrades to NULL meta fields + intact stmt,
      never to silently WRONG field values;
    - a stmt that itself contains a ``/*dodo{...}*/`` sequence keeps it
      verbatim in the stmt (the head anchor binds the FIRST meta only);
    - non-numeric durationMs coalesces to 0 (the schema cast nulls it).
    """

    def _decode(self, spark, lines):
        from dodo_spark.plans.replay import decode_replay_sqls

        df = spark.createDataFrame([(s,) for s in lines], "replay_sql STRING")
        return decode_replay_sqls(df).collect()

    def test_no_meta_is_filtered_not_misparsed(self, spark):
        rows = self._decode(spark, [
            "SELECT bare_statement",
            "/*dodo not-even-braces*/ SELECT x",
            "",
        ])
        assert rows == []

    def test_malformed_meta_json_nulls_fields_keeps_stmt(self, spark):
        rows = self._decode(spark, [
            "/*dodo{not json at all}*/ SELECT a FROM t",
        ])
        [r] = rows
        assert r["stmt"] == "SELECT a FROM t"
        assert r["client"] is None and r["ts"] is None
        assert r["duration_ms"] == 0  # coalesced, never NULL

    def test_meta_sheared_by_brace_star_slash_in_string(self, spark):
        # '}*/' INSIDE a JSON string value ends the non-greedy meta match
        # early: the extracted "json" is truncated garbage -> all-NULL
        # fields; the tail (the rest of the would-be meta + stmt) lands in
        # stmt verbatim. Documented degradation: nothing is silently wrong.
        hostile = '/*dodo{"ts":"2024-01-01","client":"evil}*/ SELECT tail'
        [r] = self._decode(spark, [hostile])
        assert r["client"] is None and r["ts"] is None
        assert r["duration_ms"] == 0
        assert r["stmt"] == "SELECT tail"

    def test_nested_meta_in_stmt_survives_verbatim(self, spark):
        line = (
            '/*dodo{"ts":"2024-01-01 00:00:00.000","client":"c1",'
            '"user":"u","db":"d","queryId":"q1","durationMs":5}*/ '
            "SELECT '/*dodo{\"client\":\"fake\"}*/' AS payload"
        )
        [r] = self._decode(spark, [line])
        assert r["client"] == "c1" and r["query_id"] == "q1"
        assert r["stmt"] == "SELECT '/*dodo{\"client\":\"fake\"}*/' AS payload"

    def test_nonnumeric_duration_coalesces_to_zero(self, spark):
        line = (
            '/*dodo{"ts":"t","client":"c","user":"u","db":"d",'
            '"queryId":"q","durationMs":"not-a-number"}*/ SELECT 1'
        )
        [r] = self._decode(spark, [line])
        assert r["duration_ms"] == 0 and r["client"] == "c"
