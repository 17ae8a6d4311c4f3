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
import json
import re
from collections.abc import Callable
from dataclasses import dataclass, field
from pathlib import Path

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
    "cpt_database_sync_spark.operators.analytics",
    "cpt_database_sync_spark.operators.timeseries",
    "cpt_database_sync_spark.operators.graph",
    "cpt_database_sync_spark.functions.scalar",
    "cpt_database_sync_spark.functions.typelattice",
    "cpt_database_sync_spark.sources.catalog",
    "cpt_database_sync_spark.sources.sync",
    "cpt_database_sync_spark.sources.formats",
    "cpt_database_sync_spark.plans.sqlfront",
    "cpt_database_sync_spark.plans.tpch",
    "cpt_database_sync_spark.operators.udf",
    "cpt_database_sync_spark.streaming.windows",
    "cpt_database_sync_spark.streaming.incremental",
    "cpt_database_sync_spark.streaming.stateful",
    "cpt_database_sync_spark.operators.llm_dedup",
    "cpt_database_sync_spark.operators.llm_similarity",
    "cpt_database_sync_spark.operators.llm_text",
    "cpt_database_sync_spark.operators.llm_retrieval",
    "cpt_database_sync_spark.operators.llm_quality",
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


def _last_verified_round(root: Path | None = None) -> dict[str, int]:
    """Per query: the most recent round whose CORRECTNESS_r*.json shows it
    fully green (rows+schema+hash for oracle-backed; rows for rows-only).

    Failed or errored rows do NOT count as verified, so a query that went
    red resurfaces at the front of the budget next round. ``root`` is the
    directory holding the evidence files; defaults to the repo checkout
    (and may legitimately contain none, e.g. an installed package — the
    caller falls back to a static order in that case).
    """
    last: dict[str, int] = {}
    if root is None:
        root = Path(__file__).resolve().parents[2]
    for f in sorted(root.glob("CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)", f.name)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            rows = json.loads(f.read_text())
        except (OSError, json.JSONDecodeError):
            continue
        for name, res in rows.items():
            if not isinstance(res, dict) or res.get("err"):
                continue
            green = res.get("rows_match") and res.get("schema_match", True) and (
                res.get("hash_match") is not False
            )
            if green:
                last[name] = max(last.get(name, 0), rnd)
    return last


def all_specs() -> dict[str, QuerySpec]:
    """All registered specs, least-recently-driver-verified first.

    The driver runs correctness checks in dict order and cuts off after a
    fixed budget (50 in rounds 1-2); with >50 registered queries a static
    order permanently shadows the tail. Ordering by the last round each
    query was driver-green (never-checked and red queries first, ties by
    registration order) guarantees every query cycles through the budget
    window across rounds.

    With no CORRECTNESS evidence on disk (fresh checkout / installed
    package) the rotation key is uniform, so fall back to the original
    guarantee: oracle-backed queries sort before rows-only ones, ties by
    registration order.
    """
    _load_all()
    last = _last_verified_round()
    order = {name: i for i, name in enumerate(_REGISTRY)}
    if not last:
        ordered = sorted(
            _REGISTRY.values(),
            key=lambda s: (s.oracle is None, order[s.name]),
        )
    else:
        # "reverify:rN"-tagged queries had their implementation changed
        # while building round N: treat them as never-verified so the
        # driver's budget re-checks them first. SELF-CLEARING: the boost
        # applies only while the newest CORRECTNESS round on disk is
        # < N — once round-N evidence exists (the driver re-verified the
        # changed code), the tag stops boosting, so a forgotten tag
        # cannot pin its queries to the head of every future round and
        # starve the LRU tail.
        newest = max(last.values())

        def rank(s: QuerySpec) -> int:
            for t in s.tags:
                if t.startswith("reverify:r") and newest < int(t[10:]):
                    return -1
            return last.get(s.name, -1)

        ordered = sorted(
            _REGISTRY.values(), key=lambda s: (rank(s), order[s.name])
        )
    return {s.name: s for s in ordered}


def all_queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in all_specs().items()}


def all_oracles() -> dict[str, str]:
    return {
        name: spec.oracle for name, spec in all_specs().items() if spec.oracle is not None
    }
