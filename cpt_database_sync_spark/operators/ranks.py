"""Distributed exact-rank devices — the two-level chunked row_number
and the closed-form NTILE, shared by the dimension-rank family
(``gini_concentration``, ``lorenz_deciles``, ``rfm_segments``,
``curriculum_stages``'s scalar variant lives with its operator).

The problem class (VERDICT r11/r12): rank statistics need a total
order, and the naive plan — ``Window.orderBy(...)`` (optionally
partitioned by a low-cardinality group) — funnels the whole relation
(or each group's whole slice) through ONE task's sort at any corpus
size. The device here is the ``concurrency_peak`` / ``spearman_corr``
two-level shape applied to row_number: a monotone chunk key over the
leading order column makes chunks contiguous ranges of the total
order, so chunk-local row_numbers (full parallelism, corpus-fraction
tasks) shift to global ranks by the chunk's incoming row balance — a
prefix over the chunk AGGREGATES only (|groups|×|chunks| rows,
partitioned by the group when one exists). NTILE then needs no ordered
pass at all: it is a closed form over (rank, n) with both engines'
shared remainder rule.

Reference basis: none — the reference moves rows in table order
(`sync/QueryBuilder.java:46-75`); rank analytics are part of the
rebuilt surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def two_level_row_number(
    df: DataFrame,
    chunk: Column,
    order_cols: list,
    group_cols: tuple[str, ...] = (),
    out: str = "r",
    total_col: str | None = None,
) -> DataFrame:
    """Global 1-based row_number ``out`` per group over the total
    ``order_cols`` order, without any task ever sorting more than one
    chunk's slice.

    ``chunk`` MUST be monotone non-decreasing in the leading order
    column (e.g. ``F.expr("cents div 10000000")``): truncating and
    flooring integer division are both monotone for a fixed positive
    divisor, so chunks are contiguous ranges of the total order and
    (chunk ASC, order_cols ASC) IS the global order. The chunk balance
    is a prefix over the chunk-AGGREGATE relation — |groups|×|chunks|
    rows, partitioned by the group when ``group_cols`` is set; the
    ungrouped form's |chunks|-row unpartitioned prefix is the audited
    bounded class (``tests/parity.py::UNPARTITIONED_WINDOW_ALLOWLIST``,
    the mann_whitney_u justification). Bit-identical to the
    single-window ``row_number`` (differential twins per consumer).

    ``total_col`` additionally emits the PER-GROUP row count (the n a
    closed-form NTILE needs) — computed on the chunk-aggregate
    relation and carried through the same broadcast join, so no second
    pass over ``df`` ever plans.
    """
    g = list(group_cols)
    chunked = df.withColumn("_chunk", chunk)
    w_local = Window.partitionBy(*g, "_chunk").orderBy(*order_cols)
    totals = chunked.groupBy(*g, "_chunk").agg(
        F.count(F.lit(1)).cast("long").alias("_ctot")
    )
    w_prefix = (
        (Window.partitionBy(*g) if g else Window)
        .orderBy("_chunk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_total = Window.partitionBy(*g) if g else Window.partitionBy()
    extra = (
        [F.sum("_ctot").over(w_total).cast("long").alias(total_col)]
        if total_col
        else []
    )
    bal = totals.select(
        *g,
        "_chunk",
        F.coalesce(F.sum("_ctot").over(w_prefix), F.lit(0)).alias("_bal"),
        *extra,
    )
    return (
        chunked.join(F.broadcast(bal), [*g, "_chunk"])
        .withColumn(out, F.col("_bal") + F.row_number().over(w_local))
        .drop("_chunk", "_bal")
    )


def group_quantiles_cont(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    qs: dict[str, float],
    chunk_width: float,
) -> DataFrame:
    """Exact ``percentile(value, q)`` per group WITHOUT a per-group
    value sort — the 100 TB lane for the exact-percentile family
    (``iqr_fences``, ``tail_cvar``; their small lanes keep Spark's
    built-in exact Percentile aggregate, whose per-group value buffer
    is the scale hazard the r12 verdict names).

    Device: per-(group, value) rollup → two-level cumulative counts
    (chunk-local running sums over contiguous ``value`` ranges, plus a
    prefix over the |groups|×|chunks|-row chunk aggregates — the
    ``_rank_avg2_two_level`` shape) → each requested quantile's TWO
    bracketing order statistics looked up by rank in one conditional
    aggregation → Spark's own Percentile interpolation applied as a
    closed-form column expression.

    Bit-identity contract (differential twins per consumer): Spark's
    exact Percentile computes position = q·(n−1), brackets it with
    lower = floor(position), higher = ceil(position), returns the lower
    order statistic outright when higher == lower OR both brackets land
    on the same value, else interpolates
    (higher − position)·v_lo + (position − lower)·v_hi
    (sql/catalyst PercentileBase.getPercentile). The expressions below
    are that arithmetic verbatim — the same doubles multiplied and
    added in the same order — so both lanes agree to the bit.

    Returns one row per group: ``group_cols`` + ``n`` (BIGINT non-NULL
    count) + one double column per ``qs`` key. NULL group keys survive
    (groupBy keeps them; no equi-join on the group key happens here —
    callers joining the result back drop NULL groups exactly as their
    small lane's join does).
    """
    g = list(group_cols)
    rel = df.groupBy(*g, value_col).agg(
        F.count(F.lit(1)).cast("long").alias("_cnt")
    )
    chunked = rel.withColumn(
        "_chunk", F.floor(F.col(value_col) / chunk_width).cast("long")
    )
    w_local = (
        Window.partitionBy(*g, "_chunk")
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = chunked.select(
        *g,
        value_col,
        "_cnt",
        "_chunk",
        F.sum("_cnt").over(w_local).alias("_lcum"),
    )
    totals = chunked.groupBy(*g, "_chunk").agg(
        F.sum("_cnt").alias("_ctot")
    )
    w_prefix = (
        (Window.partitionBy(*g) if g else Window)
        .orderBy("_chunk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_total = Window.partitionBy(*g) if g else Window.partitionBy()
    bal = totals.select(
        *g,
        "_chunk",
        F.coalesce(F.sum("_ctot").over(w_prefix), F.lit(0)).alias("_bal"),
        F.sum("_ctot").over(w_total).cast("long").alias("_n"),
    )
    cum = local.join(F.broadcast(bal), [*g, "_chunk"]).select(
        *g,
        value_col,
        "_cnt",
        "_n",
        (F.col("_bal") + F.col("_lcum")).cast("long").alias("_cum"),
    )
    # Each 1-based rank r is covered by exactly one rollup row:
    # the one with min_rank = cum − cnt + 1 ≤ r ≤ cum.
    aggs = [F.max("_n").alias("n")]
    for name, q in qs.items():
        pos = F.lit(float(q)) * (F.col("_n") - 1).cast("double")
        for side, rank in (("lo", F.floor(pos) + 1), ("hi", F.ceil(pos) + 1)):
            covers = (F.col("_cum") - F.col("_cnt") + 1 <= rank) & (
                rank <= F.col("_cum")
            )
            aggs.append(
                F.max(F.when(covers, F.col(value_col))).alias(
                    f"_{name}_{side}"
                )
            )
    res = cum.groupBy(*g).agg(*aggs)
    for name, q in qs.items():
        pos = F.lit(float(q)) * (F.col("n") - 1).cast("double")
        lo, hi = F.floor(pos), F.ceil(pos)
        v_lo, v_hi = F.col(f"_{name}_lo"), F.col(f"_{name}_hi")
        res = res.withColumn(
            name,
            F.when((lo == hi) | (v_lo == v_hi), v_lo).otherwise(
                (hi.cast("double") - pos) * v_lo
                + (pos - lo.cast("double")) * v_hi
            ),
        )
    return res.select(*g, "n", *qs.keys())


def ntile_col_sql(rank_col: str, n_col: str, k: int) -> str:
    """NTILE(k) of the 1-based rank column over a PER-GROUP row-count
    column as closed-form SQL — the column-operand twin of
    ``llm_text.ntile_stage_sql`` (there n is a driver scalar; here each
    group carries its own n). Both engines' remainder rule: the first
    n mod k buckets take the extras. All exact BIGINT ``div``
    arithmetic; the n < k degenerate (every bucket ≤ 1 row, stage =
    rank) is the first CASE arm, so the ``div (n div k)`` in the last
    arm can never see a zero divisor (CASE evaluates lazily on both
    engines)."""
    base = f"({n_col} div {k})"
    m = f"({n_col} % {k})"
    wide = f"({base} + 1)"
    return (
        f"CAST(CASE WHEN {n_col} < {k} THEN {rank_col}"
        f" WHEN {rank_col} <= {m} * {wide}"
        f" THEN ({rank_col} - 1) div {wide} + 1"
        f" ELSE {m} + ({rank_col} - 1 - {m} * {wide}) div {base} + 1"
        f" END AS INT)"
    )
