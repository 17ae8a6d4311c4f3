"""cpt-database-sync-spark — a PySpark-native analytics engine.

A brand-new engine with the query / data-processing capabilities of the
reference `ZhangLe1993/cpt-database-sync` (a Presto-connector-based JDBC
table-sync tool), re-expressed Spark-first:

- the reference's actual surface (typed columnar scan, projection pushdown,
  type-mapping lattice, batched transactional load — see ``sources/`` and
  ``functions/typelattice.py``),
- the relational closure an analytics engine needs (joins, aggregations,
  windows, set ops, scalar/semi-structured functions — ``operators/``),
- the sync path recast as Structured Streaming (``streaming/``),
- LLM-data-pipeline operators (dedup, similarity search, text analysis,
  multimodal plumbing — ``operators/llm_*``).

Everything is declarative DataFrame/SQL so Catalyst + AQE pick the physical
strategy; Python UDFs appear only where built-ins cannot express the
semantics, always Arrow-batched.
"""

from cpt_database_sync_spark.session import get_spark
from cpt_database_sync_spark.plans.registry import all_oracles, all_queries

__all__ = ["get_spark", "all_queries", "all_oracles"]

__version__ = "0.1.0"
