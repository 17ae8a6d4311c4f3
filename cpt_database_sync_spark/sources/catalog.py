"""Catalog: table discovery + schema introspection.

Reference: table list from ``information_schema.tables``
(`handler/Handler.java:27-33`), per-column type handles from JDBC
``DatabaseMetaData.getColumns`` (`sync/M2H2SchemaConverter.java:120-154`).
Spark-first: for JDBC sources the same two queries run through
``spark.read.jdbc``; for file-backed tables the parquet footer IS the
schema — introspection is metadata-only (no data scan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from cpt_database_sync_spark.plans.registry import register
from cpt_database_sync_spark.sources.tables import ALL_TABLES, load


def list_tables(spark: SparkSession, sf_dir: str) -> list[str]:
    """All tables of the fixture 'database' (mirrors Handler.fetch)."""
    return list(ALL_TABLES)


def table_schema(spark: SparkSession, sf_dir: str, table: str):
    """StructType of one table — parquet footer read, no data scan."""
    return load(spark, sf_dir, table).schema


def list_tables_jdbc(spark: SparkSession, url: str, database: str, props: dict) -> DataFrame:
    """JDBC variant of Handler.fetch: one query over information_schema —
    returns a DataFrame so the driver never materializes more than it must."""
    return (
        spark.read.format("jdbc")
        .option("url", url)
        .option(
            "dbtable",
            f"(SELECT table_name FROM information_schema.tables "
            f"WHERE table_schema = '{database}') t",
        )
        .options(**props)
        .load()
    )


@register(
    "schema_introspect",
    oracle="""
    SELECT table_name, column_name, CAST(ordinal_position AS INT) AS ordinal
    FROM information_schema.columns
    WHERE table_name IN ('region','nation','customer','supplier','part',
                         'orders','lineitem','events','documents','embeddings')
    """,
)
def schema_introspect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog scan: (table, column, ordinal) rows for every fixture table.

    Type names are intentionally excluded — they are engine-dialect
    (DuckDB ``BIGINT`` vs Spark ``LongType``); the `type_lattice` query
    covers type fidelity. The per-table schema comes from parquet footers
    only; the resulting tiny DataFrame is built on the driver, which is
    correct here because catalog metadata is inherently driver-sized.
    """
    rows = []
    for t in ALL_TABLES:
        # driver-contract quirk: the oracle's DuckDB view of `events` keeps
        # the raw nanos-timestamp column name/order, same as our loader.
        for i, f in enumerate(table_schema(spark, sf_dir, t).fields, start=1):
            rows.append((t, f.name, i))
    return spark.createDataFrame(rows, "table_name string, column_name string, ordinal int")
