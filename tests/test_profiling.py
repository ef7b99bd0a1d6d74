"""Misra-Gries heavy-hitter guarantee, exercised where it matters: a vocab
far larger than MG_K, so the decrement path actually evicts counters. The
registry key's parity test proves exact end-to-end equality on the real
corpus; this proves the sketch's candidate-superset property — the thing
the exactness DEPENDS on — under adversarial skew."""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from dodo_spark.operators.profiling import MG_K, _mg_partition_candidates


def _run_mg(tokens: list[str], n_batches: int = 3) -> set[str]:
    chunks = np.array_split(np.asarray(tokens, dtype=object), n_batches)
    out = list(
        _mg_partition_candidates(
            iter(pd.DataFrame({"tok": c}) for c in chunks if len(c))
        )
    )
    return set(pd.concat(out)["tok"]) if out else set()


def test_mg_captures_all_heavy_hitters_under_zipf_skew():
    rng = np.random.default_rng(7)
    # zipf over a 5000-token vocab, 200k draws: a handful of tokens exceed
    # n/MG_K, thousands of tail tokens force constant evictions
    draws = rng.zipf(1.3, size=200_000)
    draws = draws[draws <= 5000]
    tokens = [f"tok{int(d)}" for d in draws]
    n = len(tokens)
    freq = pd.Series(tokens).value_counts()
    heavy = set(freq[freq > n / MG_K].index)
    assert heavy, "fixture must contain at least one true heavy hitter"
    candidates = _run_mg(tokens, n_batches=5)
    assert len(candidates) <= MG_K
    assert heavy <= candidates, heavy - candidates


@settings(max_examples=25, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=300), min_size=1, max_size=2000),
    st.integers(min_value=1, max_value=4),
)
def test_mg_superset_property(vals, n_batches):
    tokens = [f"t{v}" for v in vals]
    n = len(tokens)
    freq = pd.Series(tokens).value_counts()
    heavy = set(freq[freq > n / MG_K].index)
    candidates = _run_mg(tokens, n_batches=n_batches)
    assert heavy <= candidates


def test_suggest_expectations_roundtrip(spark, sf_dir, tmp_path, capsys):
    """Suggested expectations accept the table they were derived from
    (with slack), reject an out-of-envelope batch, and print as JSON from
    the profile verb."""
    import json

    from dodo_spark.catalog import load_table
    from dodo_spark.cli import main
    from dodo_spark.operators.stats import suggest_expectations
    from dodo_spark.sources.versioned import (
        ExpectationViolation,
        append_version,
        write_version,
    )

    exp = suggest_expectations(spark, sf_dir, "nation")
    assert "n_nationkey_invariants" in exp
    pred = exp["n_nationkey_invariants"]
    assert "IS NOT NULL" in pred and "BETWEEN" in pred

    table = str(tmp_path / "vt")
    nation = load_table(spark, sf_dir, "nation")
    write_version(nation, table, 0, expectations=exp)  # self-accepts

    bad = nation.limit(1).selectExpr(
        "CAST(9999 AS INT) AS n_nationkey", "n_name", "n_regionkey"
    )
    import pytest as _pytest

    with _pytest.raises(ExpectationViolation, match="n_nationkey_invariants"):
        append_version(bad, table, 1, expectations=exp)

    assert main(["profile", "--sf-dir", sf_dir,
                 "--suggest-expectations", "nation"]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out == exp


def test_k_anonymity_report_invariants(spark, sf_dir):
    """classes_below and records_at_risk are monotone in k; thresholds at
    or below the minimum class size report zero risk; totals are
    k-independent."""
    from dodo_spark import registry

    rows = registry.queries()["profile_k_anonymity"](spark, sf_dir).collect()
    assert [r["k"] for r in rows] == sorted(r["k"] for r in rows)
    below = [r["classes_below"] for r in rows]
    risk = [r["records_at_risk"] for r in rows]
    assert below == sorted(below) and risk == sorted(risk)
    assert len({(r["total_classes"], r["min_class_size"]) for r in rows}) == 1
    for r in rows:
        if r["k"] <= r["min_class_size"]:
            assert r["classes_below"] == 0 and r["records_at_risk"] == 0
        assert r["records_at_risk"] >= r["classes_below"]  # classes nonempty


def test_l_diversity_report_invariants(spark, sf_dir):
    """classes_below/records_at_risk monotone in l_req; thresholds at or
    below min_l report zero; the l-audit is bounded by the k-audit's
    class structure (diversity can never exceed class size)."""
    from dodo_spark import registry

    rows = registry.queries()["profile_l_diversity"](spark, sf_dir).collect()
    below = [r["classes_below"] for r in rows]
    risk = [r["records_at_risk"] for r in rows]
    assert below == sorted(below) and risk == sorted(risk)
    assert len({(r["min_l"], r["total_classes"]) for r in rows}) == 1
    for r in rows:
        if r["l_req"] <= r["min_l"]:
            assert r["classes_below"] == 0 and r["records_at_risk"] == 0
        assert r["records_at_risk"] >= r["classes_below"]
        assert r["classes_below"] <= r["total_classes"]
