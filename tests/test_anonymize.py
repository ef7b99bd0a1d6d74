"""Anonymizer unit tests, mirroring the reference's golden assertions
(src/anonymizer_test.go:7-57 successor sequence; src/parser/custom_test.go:
10-39 preservation rules)."""

from __future__ import annotations

from dodo_spark.anonymize import (
    KEYWORDS,
    MiniDict,
    anonymize_sql,
    collect_identifiers,
)


def test_minihash_successor_golden():
    # little-endian increment with carry (anonymizer.go:189-212)
    succ = MiniDict._succ
    assert succ("a") == "b"
    assert succ("z") == "aa"
    assert succ("aa") == "ba"
    assert succ("za") == "ab"
    assert succ("zz") == "aaa"
    assert succ("zza") == "aab"  # the reference's golden case


def test_minihash_sequence_skips_keywords():
    mini = MiniDict()
    seen = [mini.alias(f"h{i}") for i in range(100)]
    assert seen[0] == "a"
    assert len(set(seen)) == 100  # all distinct
    assert not (set(seen) & KEYWORDS)  # never a keyword (e.g. 'as', 'by', 'in')


def test_minihash_alias_stable():
    mini = MiniDict()
    a1 = mini.alias("same")
    _ = mini.alias("other")
    assert mini.alias("same") == a1


def test_anonymize_preserves_non_identifiers():
    sql = (
        "SELECT CONCAT(col_one, 'lit''eral'), @user_var, @@global_var, 42, 3.14 "
        "FROM tbl_x WHERE col_one > 10 -- note\n"
    )
    out = anonymize_sql(sql, method="hash")
    # function name, keywords, literals, variables, numbers survive
    assert "CONCAT(" in out
    assert "'lit''eral'" in out
    assert "@user_var" in out and "@@global_var" in out
    assert "42" in out and "3.14" in out
    # identifiers do not
    assert "col_one" not in out and "tbl_x" not in out
    # comment redacted (custom.go comment rule)
    assert "note" not in out and "'***'" in out


def test_anonymize_consistent_within_statement():
    out = anonymize_sql("SELECT aaa FROM bbb WHERE aaa = 1", method="minihash")
    # same identifier -> same alias in both positions
    toks = out.replace("=", " ").split()
    sel, whe = toks[1], toks[5]
    assert sel == whe


def test_anonymize_backquoted_same_as_bare():
    mini = MiniDict()
    a = anonymize_sql("SELECT `colx` FROM t1", method="minihash", mini=mini)
    b = anonymize_sql("SELECT colx FROM t1", method="minihash", mini=mini)
    assert a.replace("`", "") == b


def test_hash_mode_short_identifiers_kept():
    # < ANONYMIZE_MIN_LENGTH chars are kept in hash mode (anonymizer.go)
    out = anonymize_sql("SELECT ab FROM xyz", method="hash")
    assert " ab " in out
    assert "xyz" not in out


def test_collect_identifiers_order_and_filtering():
    ids = collect_identifiers(
        "SELECT func(col_a), col_b FROM db1.tbl WHERE col_a IN (1,2)"
    )
    assert ids == ["col_a", "col_b", "db1", "tbl", "col_a"]


def test_engine_clause_preserved():
    out = anonymize_sql(
        "CREATE TABLE t1 (c1 int) ENGINE=OLAP DUPLICATE KEY(c1)", method="minihash"
    )
    assert "ENGINE=OLAP" in out
    assert " t1 " not in out and "(c1 " not in out


def test_id_bearing_property_values_rewritten():
    # reference custom.go:14-19: bloom_filter_columns VALUE carries ids
    mini = MiniDict()
    out = anonymize_sql(
        'CREATE TABLE t1 (col_a int, col_b int) ENGINE=OLAP '
        'PROPERTIES ("bloom_filter_columns" = "col_a,col_b", '
        '"replication_num" = "3")',
        method="minihash",
        mini=mini,
    )
    # key preserved, value ids rewritten consistently with the column defs
    assert '"bloom_filter_columns"' in out
    assert "col_a" not in out and "col_b" not in out
    # non-id property value untouched
    assert '"replication_num" = "3"' in out
    # the rewritten ids in the property equal the rewritten column names
    import re

    cols = re.search(r"\((\w+) int, (\w+) int\)", out)
    prop = re.search(r'"bloom_filter_columns" = "(\w+),(\w+)"', out)
    assert cols and prop and (cols.group(1), cols.group(2)) == (prop.group(1), prop.group(2))


# --------------------------------------------------------------------------
# property-based: random identifier soups (hypothesis)
# --------------------------------------------------------------------------
from hypothesis import given, settings
from hypothesis import strategies as st

_ident = st.from_regex(r"[a-z_][a-z_0-9]{2,10}", fullmatch=True).filter(
    lambda s: s not in KEYWORDS
)


@settings(max_examples=50, deadline=None)
@given(ids=st.lists(_ident, min_size=1, max_size=6), lit=st.integers(0, 10**6))
def test_property_anonymize_consistent_and_total(ids, lit):
    """For any identifier set: (1) no source identifier survives, (2) the
    same identifier maps to the same alias at every occurrence, (3)
    keywords/literals survive verbatim, (4) a second pass with the same
    dictionary is a fixed point on structure."""
    sql = (
        "SELECT " + ", ".join(ids) + f", {lit} FROM " + ids[0] + " WHERE " + ids[-1] + " > 1"
    )
    mini = MiniDict()
    out = anonymize_sql(sql, method="minihash", mini=mini)
    for i in ids:
        assert f" {i} " not in f" {out} "
    assert f"{lit}" in out and "SELECT" in out and "WHERE" in out
    # consistency: occurrences of ids[0] (select list + FROM) share one alias
    toks = out.replace(",", " ").split()
    alias_first = toks[1]
    assert toks[toks.index("FROM") + 1] == alias_first
    # stability: anonymizing the output with the SAME dict keeps aliases
    # (aliases are themselves identifiers; they must map consistently too)
    again = anonymize_sql(out, method="minihash", mini=mini)
    assert again.count("SELECT") == 1 and f"{lit}" in again


def test_distributed_matches_local_on_prop_values_and_short_ids(spark):
    """The pandas-UDF path must apply the SAME tokenizer state machine as
    anonymize_sql: id-bearing property values rewritten, hash-mode short
    identifiers kept (regression: the UDF once skipped both rules)."""
    from dodo_spark.anonymize import anonymize_sql, anonymize_statements

    sqls = [
        'CREATE TABLE secret_tbl (col_one INT) PROPERTIES ("bloom_filter_columns" = "col_one,col_two")',
        "SELECT ab, long_column FROM secret_tbl WHERE ab = 5",
    ]
    df = spark.createDataFrame([(s,) for s in sqls], "stmt STRING")
    got = {
        r["stmt"]: r["anonymized"]
        for r in anonymize_statements(spark, df, "stmt", method="hash").collect()
    }
    for s in sqls:
        assert got[s] == anonymize_sql(s, method="hash"), s
    # the property VALUE identifiers must actually be rewritten
    assert "col_one" not in got[sqls[0]].split("PROPERTIES")[1]
    # short id 'ab' kept by the min-length rule, long ones hashed
    assert " ab = 5" in got[sqls[1]]
    assert "long_column" not in got[sqls[1]]


def test_anonymize_vocab_guard(spark):
    import pytest

    from dodo_spark.anonymize import anonymize_statements

    df = spark.createDataFrame(
        [(f"SELECT col_{i} FROM tbl_{i}",) for i in range(40)], "stmt STRING"
    )
    with pytest.raises(ValueError, match="max_vocab"):
        anonymize_statements(spark, df, "stmt", max_vocab=10)


def test_minihash_dict_persists_across_runs(tmp_path):
    """Reference --anonymize-minihash-dict: a saved dictionary keeps
    aliases stable across separate invocations — the same identifier maps
    to the same short name in a later run, and new identifiers continue
    the alias sequence instead of restarting it."""
    from dodo_spark.anonymize import MiniDict, anonymize_sql

    d = tmp_path / "dict.json"
    m1 = MiniDict()
    out1 = anonymize_sql("SELECT col_one FROM table_x", method="minihash", mini=m1)
    m1.save(str(d))

    m2 = MiniDict.load(str(d))
    out2 = anonymize_sql(
        "SELECT col_one, col_two FROM table_x", method="minihash", mini=m2
    )
    # same ids -> same aliases as run 1
    a_col, a_tab = out1.replace("SELECT ", "").replace(" FROM ", " ").split()
    assert f"SELECT {a_col}," in out2 and out2.endswith(a_tab)
    # the new id got a FRESH alias (sequence continued, no collision)
    new_alias = out2.split(",")[1].split()[0]
    assert new_alias not in (a_col, a_tab)


def test_reserve_ids_and_min_length():
    """--anonymize-reserve-ids keeps listed identifiers verbatim (case-
    insensitive); --anonymize-id-min-length widens the keep-short rule."""
    from dodo_spark.anonymize import anonymize_sql

    out = anonymize_sql(
        "SELECT keep_me, secret_col FROM t2", method="hash",
        reserve={"KEEP_ME", "t2"},
    )
    assert "keep_me" in out and "t2" in out and "secret_col" not in out
    out = anonymize_sql(
        "SELECT abcd, abcdefgh FROM t9", method="hash", min_length=6
    )
    assert "abcd" in out and "abcdefgh" not in out


def test_cli_anonymize_dict_roundtrip(tmp_path):
    """CLI: two runs sharing --minihash-dict produce consistent aliases."""
    from dodo_spark.cli import main

    d = tmp_path / "dict.json"
    s1, s2 = tmp_path / "a.sql", tmp_path / "b.sql"
    o1, o2 = tmp_path / "a.out", tmp_path / "b.out"
    s1.write_text("SELECT alpha_col FROM big_table")
    s2.write_text("SELECT alpha_col FROM other_table")
    assert main(["anonymize", "--input", str(s1), "--output", str(o1),
                 "--method", "minihash", "--minihash-dict", str(d)]) == 0
    assert main(["anonymize", "--input", str(s2), "--output", str(o2),
                 "--method", "minihash", "--minihash-dict", str(d)]) == 0
    alias1 = o1.read_text().split()[1]
    assert o2.read_text().split()[1] == alias1  # alpha_col alias stable


def test_minihash_dict_migrates_pre_r8_hash_keys(tmp_path):
    """A dictionary persisted BEFORE the round-8 leading-digit remap
    keys its aliases under digit-leading hashes; alias() must migrate
    those entries in place so the same identifier keeps the same alias
    across the upgrade (the save/load stability contract)."""
    import json

    from dodo_spark.anonymize import MiniDict, _hash_id, anonymize_sql

    ident = "orders"  # md5('orders') starts with a digit -> was remapped
    import hashlib

    old_hash = hashlib.md5(ident.encode()).hexdigest()[:16]
    assert old_hash[0].isdigit(), "pick an identifier with digit-leading md5"
    new_hash = _hash_id(ident)
    assert new_hash != old_hash and not new_hash[0].isdigit()

    # simulate a pre-upgrade dict: the identifier already has alias 'q'
    legacy_path = str(tmp_path / "dict.json")
    with open(legacy_path, "w") as f:
        json.dump({"dict": {old_hash: "q"}, "last": "q"}, f)
    mini = MiniDict.load(legacy_path)
    out = anonymize_sql(f"SELECT x FROM {ident}", method="minihash", mini=mini)
    assert " q" in out  # kept the saved alias, no fresh assignment
    assert mini.dict[new_hash] == "q" and old_hash not in mini.dict
