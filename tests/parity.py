"""Differential-compare machinery mirroring the driver's correctness gate:
row-count + column names + order-insensitive value comparison with columns
sorted by name. Used by test_parity.py and runnable standalone:

    python tests/parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import datetime
import decimal
import math


def canon_value(v):
    """Canonicalize one cell for cross-engine comparison."""
    if v is None:
        return None
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # exact: engines must agree bit-for-bit
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if isinstance(v, (list, tuple)):
        return tuple(canon_value(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, canon_value(x)) for k, x in v.items()))
    return v


def canon_rows(columns: list[str], rows: list[tuple]) -> list[tuple]:
    """Sort columns by name, canonicalize values, sort rows."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(canon_value(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return out


def compare(spark_cols, spark_rows, ora_cols, ora_rows) -> list[str]:
    """Return a list of mismatch descriptions (empty = parity)."""
    problems = []
    if sorted(spark_cols) != sorted(ora_cols):
        problems.append(f"columns differ: spark={sorted(spark_cols)} oracle={sorted(ora_cols)}")
        return problems
    if len(spark_rows) != len(ora_rows):
        problems.append(f"row count differs: spark={len(spark_rows)} oracle={len(ora_rows)}")
    a = canon_rows(list(spark_cols), spark_rows)
    b = canon_rows(list(ora_cols), ora_rows)
    if a != b:
        # find first differing row for diagnostics
        for i, (x, y) in enumerate(zip(a, b)):
            if x != y:
                problems.append(f"first value mismatch at sorted-row {i}:\n  spark={x}\n  oracle={y}")
                break
        else:
            problems.append(f"row multiset differs in tail (lengths {len(a)} vs {len(b)})")
    return problems


def decimal_display_offenders(sdf) -> list[str]:
    """Display-schema lint (VERDICT r11 next #1): DecimalType column
    names in a query's DISPLAY schema, at any nesting depth. The
    driver's value-hash canonicalizes Decimal cells differently than
    this harness — the only 5 driver hash-red rows in 11 rounds were
    exactly the 5 keys exposing a raw DECIMAL display column. Exact
    decimal lanes stay INTERNAL; the display edge is string/bigint/
    double/bool/date/timestamp only. repr() of a nested type spells
    out every child type, so the substring check covers arrays/
    structs/maps without walking them."""
    return [
        f.name for f in sdf.schema.fields if "DecimalType" in repr(f.dataType)
    ]


# Keys whose plan legitimately carries an UNPARTITIONED window — each
# one runs over a provably bounded relation (catalog / vocabulary /
# calendar / chunk-aggregate sized), never the corpus. The r11 verdict
# flagged the rank family for sorting the corpus-scaled distinct-value
# relation on a single task; that class is now extinct (the two-level
# chunk device) and THIS allowlist keeps it extinct: a new key whose
# plan funnels through a single-partition window fails parity until it
# is consciously justified here (the decimal-lint governance pattern).
# Audited registry-wide at r12 (14 keys; tests/test_plans.py carries
# the per-shape gates):
UNPARTITIONED_WINDOW_ALLOWLIST = {
    "bm25_retrieval",        # |top-k candidates| rank, docstring-costed
    "data_skew_profile",     # |distinct keys| rollup rank
    "doc_length_histogram",  # |64-token bins| cumulative share (domain-sized)
    "funnel_latency",        # |chunks| prefix above the ceiling (two-level
                             # device; chunks = event-time span in hours,
                             # domain-bounded — the mann_whitney_u class)
    "join_lateral",          # ANSI lateral demo over the |orders/custkey| rows
    "kaplan_meier",          # |event calendar| suffix sum
    "kruskal_wallis",        # |chunks|-row prefix (the two-level device)
    "mann_whitney_u",        # |chunks|-row prefix (the two-level device)
    "rfm_segments",          # |customers| NTILEs below the ceiling; above it
                             # the two-level lane prefixes |chunks|-row aggregates only (r13)
    "rolling_corr",          # |calendar days| relation
    "skyline_pareto",        # |parts| dimension dominance sort
    "sql_ansi_extras",       # ANSI window-surface demo, |orders| bounded slice
    "vocab_growth",          # |chunks| position prefix (two-level device,
                             # r13) + |deciles| grid
    "weighted_sample",       # |sample k| rank
    "zipf_fit",              # |vocab| rank, docstring-costed
}

_UNPART_WINDOW_RE = r"windowspecdefinition\(\w+#\d+L? (?:ASC|DESC)"


def unpartitioned_window_offense(name: str, sdf) -> str | None:
    """Single-partition-window lint: keys outside the allowlist must
    not plan any window without a partition spec (Spark's "Moving all
    data to a single partition" funnel — the r11 scale finding)."""
    import re

    if name in UNPARTITIONED_WINDOW_ALLOWLIST:
        return None
    plan = sdf._jdf.queryExecution().executedPlan().toString()
    if re.search(_UNPART_WINDOW_RE, plan):
        return (
            f"{name}: plan contains an UNPARTITIONED window (single-"
            "partition funnel) — partition it, use the two-level chunk "
            "device, or justify the key in "
            "UNPARTITIONED_WINDOW_ALLOWLIST"
        )
    return None


def run_query_pair(spark, con, fn, oracle_sql: str, sf_dir: str, name: str | None = None):
    sdf = fn(spark, sf_dir)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]
    if name is not None:
        offense = unpartitioned_window_offense(name, sdf)
        if offense:
            return [offense], len(spark_rows)
    offenders = decimal_display_offenders(sdf)
    if offenders:
        return (
            [
                f"display schema exposes DecimalType in {offenders} — "
                "cast to BIGINT/DOUBLE/STRING at the display edge "
                "(the r11 driver hash-red class)"
            ],
            len(spark_rows),
        )
    res = con.execute(oracle_sql)
    ora_cols = [d[0] for d in res.description]
    ora_rows = res.fetchall()
    return compare(spark_cols, spark_rows, ora_cols, ora_rows), len(spark_rows)


def main():
    import sys

    import duckdb

    from cpt_database_sync_spark.plans.registry import all_specs
    from cpt_database_sync_spark.session import get_spark
    from cpt_database_sync_spark.sources.tables import ALL_TABLES

    argv = [a for a in sys.argv[1:] if a != "--vanilla"]
    vanilla = "--vanilla" in sys.argv[1:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.001"
    only = set(argv[1:])
    if vanilla:
        # Mirror the DRIVER: a plain SparkSession with none of the engine's
        # session.py configs (default 200 shuffle partitions, no pinned TZ —
        # machine TZ is UTC, matching the driver host). Any key whose result
        # depends on partition count / task order / session conf fails HERE
        # before it fails in a driver rotation. A pre-existing configured
        # session would be silently returned by getOrCreate and defeat the
        # gate — stop it first so the vanilla build is genuine.
        from pyspark.sql import SparkSession

        active = SparkSession.getActiveSession()
        if active is not None:
            active.stop()
        spark = (
            SparkSession.builder.appName("parity-vanilla")
            .master("local[8]")
            .getOrCreate()
        )
    else:
        spark = get_spark(app_name="parity", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in ALL_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    specs = all_specs()
    n_pass = n_fail = n_rows_only = 0
    for name, spec in sorted(specs.items()):
        if only and name not in only:
            continue
        try:
            if spec.oracle is None:
                n = fn_rows = len(spec.fn(spark, sf_dir).collect())
                print(f"  ROWS-ONLY {name}: {n} rows")
                n_rows_only += 1
                continue
            problems, nrows = run_query_pair(
                spark, con, spec.fn, spec.oracle, sf_dir, name=name
            )
            if problems:
                n_fail += 1
                print(f"✗ {name} ({nrows} rows)")
                for p in problems:
                    print(f"    {p}")
            else:
                n_pass += 1
                print(f"✓ {name} ({nrows} rows)")
        except Exception as e:
            n_fail += 1
            print(f"✗ {name} EXCEPTION: {type(e).__name__}: {e}")
    print(f"\npass={n_pass} fail={n_fail} rows_only={n_rows_only}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    import os
    import sys as _sys

    _sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    main()
