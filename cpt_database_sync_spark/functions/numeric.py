"""Exact-arithmetic helpers for cross-engine reproducible aggregates.

Summing IEEE doubles is order-dependent; Spark and the DuckDB oracle would
differ in the low bits because their partial-aggregation orders differ. The
reference side-steps this by keeping DECIMAL exact end-to-end
(``sync/StandardReadMappings.java:79-96`` carries DECIMAL(p,s) exactly, with
HALF_UP only at scale-reduction edges). We adopt the same discipline: cast
the double input to a DECIMAL lane, aggregate exactly (order-insensitive),
and emit DOUBLE.

Two subtleties make the emitted doubles bit-identical across engines:

1. Intermediate decimal precision must stay ≤ 38 or Spark applies a lossy
   scale reduction — keep input casts tight (e.g. DECIMAL(6,4) for a
   discount in [0,1]) and literals at DECIMAL(1,0).
2. The final decimal→double conversion is only correctly rounded in every
   engine when the *unscaled* value fits in 2^53 (DuckDB's int128→double
   path rounds twice above that). So we rescale the exact sum to
   DECIMAL(18, s) first — exact for this data (all money columns are 2 dp;
   products of three such values terminate at scale 6) — and only then cast
   to double. DECIMAL(18,6) holds sums up to 1e12, comfortably beyond the
   bench scale; at much larger SFs widen the precision and keep
   unscaled < 2^53 by reducing scale only when the data's true scale allows.

Per-row double arithmetic (a*b, a-b on the same operands) is IEEE-exact and
needs no such treatment — only multi-row accumulation does.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import DecimalType

# Output lane for exact sums: 18 digits total keeps the unscaled value
# < 2^53 so decimal→double is correctly rounded everywhere.
OUT_PRECISION = 18


def dec(col: Column, precision: int = 12, scale: int = 4) -> Column:
    """Cast to an exact decimal lane (default fits money values < 1e8)."""
    return col.cast(DecimalType(precision, scale))


def out_double(col: Column, out_scale: int) -> Column:
    """Rescale an exact decimal to the output lane and emit double."""
    return col.cast(DecimalType(OUT_PRECISION, out_scale)).cast("double")


def dsum(
    col: Column, precision: int = 12, scale: int = 4, out_scale: int | None = None
) -> Column:
    """Order-insensitive exact sum of a double column, emitted as double."""
    if out_scale is None:
        out_scale = min(scale, 6)
    return out_double(F.sum(dec(col, precision, scale)), out_scale)


def davg(
    col: Column, precision: int = 12, scale: int = 4, out_scale: int | None = None
) -> Column:
    """Exact-sum-based average: decimal-sum cast to double, divided by count.

    Same operand pair on both engines → identical double division result.
    """
    return dsum(col, precision, scale, out_scale) / F.count(F.lit(1))


# DuckDB-side SQL fragments mirroring the helpers above (used in oracles).
def sql_out_double(expr: str, out_scale: int) -> str:
    return f"CAST(CAST({expr} AS DECIMAL({OUT_PRECISION},{out_scale})) AS DOUBLE)"


def sql_dsum(
    expr: str, precision: int = 12, scale: int = 4, out_scale: int | None = None
) -> str:
    if out_scale is None:
        out_scale = min(scale, 6)
    return sql_out_double(f"SUM(CAST({expr} AS DECIMAL({precision},{scale})))", out_scale)


def sql_davg(
    expr: str, precision: int = 12, scale: int = 4, out_scale: int | None = None
) -> str:
    return f"{sql_dsum(expr, precision, scale, out_scale)} / COUNT(*)"
