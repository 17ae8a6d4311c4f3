"""Differential oracle parity — the local mirror of the driver's
CORRECTNESS gate. Every registered query with an oracle must match DuckDB
exactly (row count, column names, order-insensitive canonical values)."""

from __future__ import annotations

import pytest

from cpt_database_sync_spark.plans.registry import all_specs
from tests.parity import run_query_pair

SPECS = all_specs()
WITH_ORACLE = sorted(n for n, s in SPECS.items() if s.oracle is not None)
ROWS_ONLY = sorted(n for n, s in SPECS.items() if s.oracle is None)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_parity(name, spark, oracle_con, sf_dir):
    spec = SPECS[name]
    problems, nrows = run_query_pair(spark, oracle_con, spec.fn, spec.oracle, sf_dir)
    assert not problems, f"{name}: " + "; ".join(problems)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(name, spark, sf_dir):
    spec = SPECS[name]
    df = spec.fn(spark, sf_dir)
    rows = df.collect()
    assert rows is not None
    assert len(df.columns) > 0
