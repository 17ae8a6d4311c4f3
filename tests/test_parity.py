"""Differential oracle parity — the local mirror of the driver's
CORRECTNESS gate. Every registered query with an oracle must match DuckDB
exactly (row count, column names, order-insensitive value comparison), and
every registered query's DISPLAY schema must be decimal-free (the r11
driver hash-red class)."""

from __future__ import annotations

import pytest

from cpt_database_sync_spark.plans.registry import all_specs
from tests.parity import run_query_pair

SPECS = all_specs()
WITH_ORACLE = sorted(n for n, s in SPECS.items() if s.oracle is not None)
ROWS_ONLY = sorted(n for n, s in SPECS.items() if s.oracle is None)

# Tiering (VERDICT r13 next #2) — see tests/tiers.py for the policy.
from tests.tiers import tier_keeps


def _tier_skip(name: str) -> None:
    if not tier_keeps(name):
        pytest.skip(
            "slow tier — SPARK_GRAFT_TEST_TIER=full runs the registry-wide "
            "sweep"
        )


def assert_no_decimal_display(name: str, df) -> None:
    """Registry-wide display-schema lint (VERDICT r11 next #1) — see
    tests.parity.decimal_display_offenders. Oracle-backed queries get
    the same lint inside run_query_pair; this wrapper covers the
    rows-only class so the lint is truly registry-wide."""
    from tests.parity import decimal_display_offenders

    offenders = decimal_display_offenders(df)
    assert not offenders, (
        f"{name}: display schema exposes DecimalType in {offenders} — "
        "cast to BIGINT/DOUBLE/STRING at the display edge "
        "(the r11 driver hash-red class)"
    )


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_parity(name, spark, oracle_con, sf_dir):
    _tier_skip(name)
    spec = SPECS[name]
    problems, nrows = run_query_pair(
        spark, oracle_con, spec.fn, spec.oracle, sf_dir, name=name
    )
    assert not problems, f"{name}: " + "; ".join(problems)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(name, spark, sf_dir):
    _tier_skip(name)
    spec = SPECS[name]
    df = spec.fn(spark, sf_dir)
    assert_no_decimal_display(name, df)
    rows = df.collect()
    assert rows is not None
    assert len(df.columns) > 0
