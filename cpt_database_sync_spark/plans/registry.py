"""Central query registry — the driver contract's backbone.

Every operator module registers its queries here with an optional DuckDB
oracle SQL string. ``__spark_entry__.py`` exposes the registry as the
``queries()`` / ``oracle_sql()`` contract; ``tests/test_parity.py`` runs the
same differential comparison locally that the driver runs at sf0.01.

A query is a callable ``(SparkSession, sf_dir: str) -> DataFrame``. Column
names of the Spark result and the oracle result MUST match exactly (the
driver sorts columns by name before value-hashing).
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL over the pre-registered table views
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


_REGISTRY: dict[str, QuerySpec] = {}

# Modules whose import populates the registry. Order matters only for
# readability of listings.
_QUERY_MODULES = [
    "cpt_database_sync_spark.operators.relational",
    "cpt_database_sync_spark.operators.stats",
    "cpt_database_sync_spark.operators.asof",
    "cpt_database_sync_spark.functions.scalar",
    "cpt_database_sync_spark.functions.typelattice",
    "cpt_database_sync_spark.sources.catalog",
    "cpt_database_sync_spark.sources.sync",
    "cpt_database_sync_spark.sources.formats",
    "cpt_database_sync_spark.plans.sqlfront",
    "cpt_database_sync_spark.operators.udf",
    "cpt_database_sync_spark.streaming.windows",
    "cpt_database_sync_spark.streaming.incremental",
    "cpt_database_sync_spark.streaming.stateful",
    "cpt_database_sync_spark.operators.llm_dedup",
    "cpt_database_sync_spark.operators.llm_similarity",
    "cpt_database_sync_spark.operators.llm_text",
    "cpt_database_sync_spark.operators.multimodal",
]


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator: add a query to the registry."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QuerySpec(name, fn, oracle, fn.__doc__ or "", tuple(tags))
        return fn

    return deco


def _load_all() -> None:
    for mod in _QUERY_MODULES:
        importlib.import_module(mod)


def all_specs() -> dict[str, QuerySpec]:
    """All registered specs, oracle-backed queries first.

    The driver runs correctness checks in dict order and may cut off after
    a budget; ordering exact-oracle queries ahead of rows-only ones means a
    cutoff costs only weak checks, never an exact-parity verification.
    """
    _load_all()
    ordered = sorted(
        _REGISTRY.values(), key=lambda s: s.oracle is None
    )  # stable: preserves registration order within each group
    return {s.name: s for s in ordered}


def all_queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in all_specs().items()}


def all_oracles() -> dict[str, str]:
    return {
        name: spec.oracle for name, spec in all_specs().items() if spec.oracle is not None
    }
