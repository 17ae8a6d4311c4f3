"""Non-finite measure doctrine (README §Correctness model).

NaN/±Inf in a measure column are data-quality defects a 100 TB pipeline
WILL see (failed upstream computations, overflow in feature code). The
engine's contract, pinned here:

1. The exact-decimal lanes REFUSE non-finite input loudly on BOTH
   engines — Spark's ANSI decimal cast and DuckDB's decimal cast each
   raise. A sync/aggregation engine whose doctrine is exactness must
   not silently NULL a corrupt measure into a sum; the failure is
   consistent, immediate, and attributable.
2. ``dq_expectations`` carries the quarantine rule (`totalprice_finite`)
   that counts non-finite rows — the screen a pipeline runs BEFORE the
   decimal lanes.
3. Once the non-finite rows are quarantined, the previously-refusing
   operators agree with the oracle again (the r8 sweep showed the
   pandas UDF lane additionally conflates NaN with NULL — float64
   pandas has one sentinel for both — and percentile interpolation over
   ±Inf is engine-specific: both resolved by the same screen).
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest

from tests.parity import run_query_pair

from cpt_database_sync_spark.plans.registry import all_specs
from cpt_database_sync_spark.sources.tables import ALL_TABLES

FLOATY = {
    "events": ["value"],
    "lineitem": ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
    "orders": ["o_totalprice"],
    "customer": ["c_acctbal"],
    "supplier": ["s_acctbal"],
    "part": ["p_retailprice"],
}


def _build(sf_dir: str, out: str, quarantine: bool) -> str:
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out, exist_ok=True)
    for t in ALL_TABLES:
        dst = os.path.join(out, f"{t}.parquet")
        if os.path.exists(dst):
            continue
        tab = pq.read_table(os.path.join(sf_dir, f"{t}.parquet")).slice(0, 200)
        n = len(tab)
        cols = []
        for field in tab.schema:
            col = tab.column(field.name).combine_chunks()
            if field.name in FLOATY.get(t, []):
                vals = col.to_pylist()
                for i in range(n):
                    m = i % 10
                    if m == 0:
                        vals[i] = float("nan")
                    elif m == 1:
                        vals[i] = float("inf")
                    elif m == 2:
                        vals[i] = float("-inf")
                if quarantine:
                    vals = [
                        None if (v is not None and not math.isfinite(v)) else v
                        for v in vals
                    ]
                col = pa.array(vals, type=field.type)
            cols.append(col)
        pq.write_table(pa.table(cols, schema=tab.schema), dst)
    return out


@pytest.fixture(scope="module")
def nan_sf_dir(sf_dir):
    from cpt_database_sync_spark.sources.sync import scratch_dir

    return _build(sf_dir, os.path.join(scratch_dir(), "sf_nan"), False)


@pytest.fixture(scope="module")
def quarantined_sf_dir(sf_dir):
    """The same corpus after the dq screen: non-finite measures NULLed
    (a real pipeline would route the rows to a quarantine sink; NULLing
    keeps row counts comparable here)."""
    from cpt_database_sync_spark.sources.sync import scratch_dir

    return _build(sf_dir, os.path.join(scratch_dir(), "sf_nan_q"), True)


def test_dq_screen_counts_nonfinite(spark, nan_sf_dir):
    from cpt_database_sync_spark.sources.catalog import dq_expectations

    rows = {r["rule"]: r["n_violations"] for r in
            dq_expectations(spark, nan_sf_dir).collect()}
    # 200 orders rows, lanes 0/1/2 of each 10 → 60 non-finite
    assert rows["totalprice_finite"] == 60


def test_nonfinite_failure_modes_are_the_documented_ones(spark, nan_sf_dir):
    """Pin the asymmetry that makes the screen MANDATORY rather than
    optional: Spark's double→DECIMAL cast silently NULLs NaN/±Inf (even
    under ANSI — only integer casts raise), so a decimal-lane aggregate
    quietly computes over a filtered corpus; DuckDB's decimal cast
    aborts loudly. Neither engine preserves the defect, and they
    disagree with each other — a pipeline must quarantine non-finite
    measures BEFORE these lanes, not rely on either failure mode."""
    spec = all_specs()["agg_stats"]
    rows = spec.fn(spark, nan_sf_dir).collect()  # Spark: silent NULL-skip
    assert len(rows) > 0
    con = duckdb.connect()
    for t in ALL_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{nan_sf_dir}/{t}.parquet'"
        )
    with pytest.raises(Exception, match="[Oo]ut of [Rr]ange"):  # DuckDB: abort
        con.execute(spec.oracle).fetchall()
    # and Spark's INTEGER casts do abort — the loud half of its behavior
    from pyspark.sql import functions as F

    from cpt_database_sync_spark.sources.tables import load

    with pytest.raises(Exception, match="CAST_OVERFLOW"):
        load(spark, nan_sf_dir, "events").select(
            F.col("value").cast("bigint")
        ).collect()


def test_quarantined_corpus_restores_parity(spark, quarantined_sf_dir):
    """The keys that refused or diverged on non-finite input are green
    again once the screen has run — covering the decimal lanes, the
    percentile interpolation, and the pandas UDF lane."""
    con = duckdb.connect()
    for t in ALL_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{quarantined_sf_dir}/{t}.parquet'"
        )
    specs = all_specs()
    failures = []
    for name in (
        "agg_stats", "agg_hash", "agg_percentile", "agg_approx_percentile",
        "anomaly_zscore", "corr_matrix", "rollup_cube", "sql_tpch_q1",
        "udf_scalar", "udaf_pandas", "udf_grouped", "attribution_linear",
        "drift_psi", "pivot_table", "join_inner",
    ):
        spec = specs[name]
        try:
            problems, _ = run_query_pair(
                spark, con, spec.fn, spec.oracle, quarantined_sf_dir
            )
            if problems:
                failures.append(f"{name}: {problems[0]}")
        except Exception as e:  # noqa: BLE001
            failures.append(f"{name}: EXCEPTION {type(e).__name__}: {e}")
    assert not failures, "\n".join(failures)
