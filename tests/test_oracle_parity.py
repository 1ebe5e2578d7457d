"""Differential tests: every registry entry with an oracle must match
DuckDB at sf=0.01 — the same gate the driver applies."""

from __future__ import annotations

import pytest

from trading212_etl_spark import registry

from .oracle_harness import compare, duckdb_conn

SF_CORRECTNESS = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb_conn(SF_CORRECTNESS)
    yield con
    con.close()


def all_oracle_names():
    return sorted(registry.ORACLES)


@pytest.mark.parametrize("name", all_oracle_names())
def test_oracle_parity(name, spark, oracle_con):
    spark_df = registry.QUERIES[name](spark, SF_CORRECTNESS)
    res = oracle_con.execute(registry.ORACLES[name])
    oracle_desc = res.description
    oracle_pdf = res.fetchdf()
    errs = compare(name, spark_df, oracle_pdf, oracle_desc=oracle_desc)
    assert not errs, "\n".join(errs)


def test_every_query_runs_rows_only(spark):
    """Entries without an oracle still must run and return a DataFrame."""
    for name, fn in registry.QUERIES.items():
        if name in registry.ORACLES:
            continue
        df = fn(spark, SF_CORRECTNESS)
        assert df.count() >= 0, name
