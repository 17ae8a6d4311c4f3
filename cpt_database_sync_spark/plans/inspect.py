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


def shuffle_key_lists(plan: str) -> list[list[str]]:
    """Every `hashpartitioning(...)` clause in a plan string, parsed with
    BALANCED parentheses into its ordered key expressions (the trailing
    numPartitions argument dropped, `#exprId` suffixes stripped).

    A naive `hashpartitioning\\(([^)]*)\\)` regex truncates at the FIRST
    `)`, so a key like `md5(cast(text#2 as binary))#3` silently vanishes
    from the capture and a "shuffle keys ⊆ {...}" gate asserts nothing.
    This parser keeps expression keys whole — `md5(cast(text as binary))`
    comes back as one element a gate can reject.
    """
    out: list[list[str]] = []
    needle = "hashpartitioning("
    i = 0
    while True:
        start = plan.find(needle, i)
        if start < 0:
            break
        j = start + len(needle)
        depth = 1
        args: list[str] = []
        cur: list[str] = []
        while j < len(plan) and depth > 0:
            ch = plan[j]
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    break
            if ch == "," and depth == 1:
                args.append("".join(cur).strip())
                cur = []
            else:
                cur.append(ch)
            j += 1
        args.append("".join(cur).strip())
        # last argument is numPartitions; keys keep expression text with
        # per-plan #exprId suffixes removed so gates compare names
        import re

        keys = [re.sub(r"#\d+L?", "", a) for a in args[:-1]]
        out.append(keys)
        i = j + 1
    return out


def shuffle_key_sets(plan: str) -> list[set[str]]:
    """`shuffle_key_lists` with each clause's keys as a set."""
    return [set(keys) for keys in shuffle_key_lists(plan)]
