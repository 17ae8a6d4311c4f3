"""Fixture-table loaders.

The test fixtures are a TPC-H-ish star schema plus ``events`` (streaming),
``documents`` (text/dedup) and ``embeddings`` (similarity) — see
``/root/repo/FIXTURES.md``. At 100 TB these would be partitioned parquet /
Iceberg tables; the loaders stay the same because ``spark.read.parquet``
handles partition discovery + pruning declaratively.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

ALL_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimensions it is always safe (and profitable) to broadcast in joins:
# at sf1000 `region` is still 5 rows and `nation` 25.
BROADCAST_DIMS = ("region", "nation")


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table. Column pruning / predicate pushdown reach the
    parquet scan automatically because this returns an unmaterialized
    DataFrame (check ``.explain``: PushedFilters / ReadSchema).

    ``events.ts`` has shipped in two physical encodings across fixture
    generations: parquet TIMESTAMP(NANOS) (which Spark's vectorized reader
    rejects — read as raw int64 nanos via ``nanosAsLong`` and convert with
    integer division, not float `/`, to keep epoch-nanos exact) and plain
    TIMESTAMP(MICROS) (read natively). Dispatch on the loaded schema so both
    generations work.
    """
    if name not in ALL_TABLES:
        raise KeyError(f"unknown table {name!r}; known: {ALL_TABLES}")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if isinstance(df.schema["ts"].dataType, LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        else:
            # TIMESTAMP(MICROS) arrives as TIMESTAMP_NTZ; downstream code
            # (unix_micros, watermarks) wants the session-TZ timestamp type.
            # Session TZ is pinned to UTC (session.py) so the cast is exact.
            df = df.withColumn("ts", F.col("ts").cast("timestamp_ltz"))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str, names=ALL_TABLES) -> None:
    """Register fixture tables as temp views for the SQL API."""
    for name in names:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
