"""Driver-gate replica: every registered verify key vs its DuckDB oracle.

Keys without an oracle get the driver's weaker rows-only check (runs, has a
stable schema, >= 0 rows; non-empty where we know the data guarantees it).
"""

from __future__ import annotations

import pytest

from dodo_spark import registry
from tests.parity import assert_parity, duckdb_con, run_oracle

ALL = registry.queries()
ORACLES = registry.oracle_sql()


@pytest.fixture(scope="module")
def oracle_con(sf_dir):
    con = duckdb_con(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(ALL))
def test_verify_key(name, spark, sf_dir, oracle_con):
    fn = ALL[name]
    df = fn(spark, sf_dir)
    if name in ORACLES:
        assert_parity(df, run_oracle(oracle_con, ORACLES[name]), name)
    else:
        rows = df.count()
        assert rows >= 0
        assert len(df.schema.fields) > 0


def test_entry(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0


def test_registry_contract():
    """Every registered key must have an oracle twin unless explicitly
    whitelisted as engine-internal — prevents silent rows-only drift."""
    from dodo_spark import registry

    qs, os_ = registry.queries(), registry.oracle_sql()
    NO_ORACLE_OK = {"agg_ndv_approx"}  # HLL sketch values are engine-internal
    missing = set(qs) - set(os_) - NO_ORACLE_OK
    assert not missing, f"keys without oracle: {sorted(missing)}"
    assert list(qs), "registry is empty"
