"""Every registered (query, oracle) pair must match DuckDB at sf0.01 —
the same check the driver's correctness gate runs."""

from __future__ import annotations

import pytest

from custom_vector_database_spark import queries_registry as reg
from tests.oracle_harness import duck_connection, run_pair


@pytest.fixture(scope="module")
def duck(sf_oracle):
    con = duck_connection(sf_oracle)
    yield con
    con.close()


def _oracle_keys():
    return sorted(reg.ORACLES)


@pytest.mark.parametrize("name", _oracle_keys())
def test_oracle_parity(spark, duck, sf_oracle, name):
    errs = run_pair(spark, duck, reg.QUERIES[name], reg.ORACLES[name], sf_oracle, name)
    assert not errs, "\n".join(errs)


@pytest.mark.parametrize("name", sorted(reg.QUERIES))
def test_all_queries_run_smoke(spark, sf_smoke, name):
    """Every registered query (oracle or not) must execute AND return rows
    at sf0.001 — all registered queries are expected non-empty there."""
    df = reg.QUERIES[name](spark, sf_smoke)
    assert df.count() > 0, name


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(e.oracle_sql()) <= set(e.queries())
