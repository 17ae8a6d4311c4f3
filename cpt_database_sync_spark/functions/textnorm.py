"""Shared text-normalization expressions.

Whitespace-fold + lowercase is the canonical key for exact/incremental
dedup AND the first stage of the cleaning pipeline — the Spark and
DuckDB forms must stay in lockstep or dedup classifications silently
diverge from the normalize/pipeline operators. This is the single
definition; operators must not inline their own copies.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def norm_ws(col: Column | str = "text") -> Column:
    """lower → collapse whitespace runs to one space → trim."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def sql_norm_ws(col: str = "text") -> str:
    """DuckDB mirror of ``norm_ws`` (for oracle SQL strings)."""
    return f"trim(regexp_replace(lower({col}), '\\s+', ' ', 'g'))"
