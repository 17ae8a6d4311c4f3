"""Physical-plan inspection helpers.

The scale contract of this engine is encoded in plan shapes, not comments:
filters must reach the parquet scan (PushedFilters), projections must prune
the ReadSchema, small dims must broadcast, top-k must plan
TakeOrderedAndProject, aggregations must be partial+final. These helpers
make those properties assertable (tests/test_plans.py) so a regression in
plan quality fails CI the same way a wrong result would.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    """The physical plan as text (what .explain() prints)."""
    return df._jdf.queryExecution().explainString(  # noqa: SLF001
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(  # noqa: SLF001
            mode
        )
    )


def read_schema_columns(df: DataFrame) -> list[str]:
    """Column names inside the parquet scan's ReadSchema (pruned set)."""
    plan = plan_string(df)
    cols: list[str] = []
    for line in plan.splitlines():
        line = line.strip()
        if line.startswith("ReadSchema:"):
            schema = line.split("struct<", 1)[-1].rstrip(">")
            cols.extend(f.split(":")[0] for f in schema.split(",") if ":" in f)
    return cols


def pushed_filters(df: DataFrame) -> str:
    plan = plan_string(df)
    return "\n".join(
        line.strip() for line in plan.splitlines() if "PushedFilters:" in line
    )


def has_operator(df: DataFrame, op: str) -> bool:
    return op in plan_string(df)
