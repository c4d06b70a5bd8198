"""Smoke: every registered query runs at sf0.001 and returns a stable schema.

The full value-level check against DuckDB is scripts/check_oracle.py (and the
driver's t2 gate at sf0.01); here we assert the plumbing cheaply.
"""

from __future__ import annotations

import pytest

from experimentsplan_datapipeline_spark.plans.queries import ORACLE, QUERIES


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_runs(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    assert df.columns, name
    assert df.count() >= 0


def test_every_oracle_has_query():
    assert set(ORACLE) <= set(QUERIES)


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())
