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
from pyspark.sql.types import LongType, StructType

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

# Footer-probe memo: fixture files are immutable within a session, and
# size-dispatch sites probe at every operator call.
_ROWCOUNT_CACHE: dict[tuple[str, str], int] = {}


def table_rowcount(sf_dir: str, name: str) -> int:
    """Exact row count of one fixture table from parquet FOOTER metadata —
    the catalog statistics probe the size dispatches run when the caller
    supplies no hint (VERDICT r12 next #3: "derive the hint from data").

    Metadata-only: reads the footer (and, for a partitioned directory,
    each part file's footer), never row groups — O(files) driver-side
    I/O, no Spark job, no scan. This is exactly the statistic a real
    catalog (Hive/Iceberg/Delta) serves from its manifest at 100 TB; on
    raw parquet the footers ARE that manifest. Returns 0 when the probe
    cannot answer (exotic layout), which callers treat as "unknown —
    keep the caller-visible default lane".
    """
    key = (sf_dir, name)
    if key not in _ROWCOUNT_CACHE:
        import os  # noqa: PLC0415

        import pyarrow.parquet as pq  # noqa: PLC0415

        path = f"{sf_dir}/{name}.parquet"
        try:
            if os.path.isdir(path):
                n = sum(
                    pq.read_metadata(os.path.join(root, f)).num_rows
                    for root, _, files in os.walk(path)
                    for f in files
                    if f.endswith(".parquet")
                )
            else:
                n = pq.read_metadata(path).num_rows
        except (OSError, ValueError):
            n = 0
        _ROWCOUNT_CACHE[key] = n
    return _ROWCOUNT_CACHE[key]


def normalize_events_ts(df: DataFrame) -> DataFrame:
    """Normalize ``events.ts`` to the session-TZ timestamp lane.

    ``events.ts`` has shipped in two physical encodings across fixture
    generations; this is the single dispatch point shared by the batch
    loader and the streaming source (``streaming/windows.events_stream``):

    - parquet TIMESTAMP(NANOS): Spark's vectorized reader rejects it —
      read as raw int64 nanos via ``nanosAsLong`` (arrives as LongType)
      and convert with integer division, not float `/`, to keep
      epoch-nanos exact;
    - plain TIMESTAMP(MICROS): arrives as TIMESTAMP_NTZ; downstream code
      (unix_micros, watermarks) wants the session-TZ timestamp type.
      Session TZ is pinned to UTC (session.py) so the cast is exact.
    """
    if isinstance(df.schema["ts"].dataType, LongType):
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df.withColumn("ts", F.col("ts").cast("timestamp_ltz"))


# Physical schema of events.parquet, memoized per sf_dir: the probe is
# metadata-only but readStream construction calls it per query — once per
# fixture dir is enough (fixture schemas don't change mid-session).
_EVENTS_SCHEMA_CACHE: dict[str, StructType] = {}


def events_raw_schema(spark: SparkSession, sf_dir: str) -> StructType:
    """Pre-normalization schema of ``events.parquet`` (``ts`` as int64
    nanos or TIMESTAMP_NTZ micros, see ``normalize_events_ts``)."""
    # conf is per-SESSION but the memo is per-process: set it on every
    # call so a later session hitting the cache can still scan the
    # nanos-encoded file at micro-batch time.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    if sf_dir not in _EVENTS_SCHEMA_CACHE:
        _EVENTS_SCHEMA_CACHE[sf_dir] = spark.read.parquet(
            f"{sf_dir}/events.parquet"
        ).schema
    return _EVENTS_SCHEMA_CACHE[sf_dir]


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table. Column pruning / predicate pushdown reach the
    parquet scan automatically because this returns an unmaterialized
    DataFrame (check ``.explain``: PushedFilters / ReadSchema).

    ``events`` is ts-normalized via ``normalize_events_ts`` (dual physical
    encodings across fixture generations).
    """
    if name not in ALL_TABLES:
        raise KeyError(f"unknown table {name!r}; known: {ALL_TABLES}")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        return normalize_events_ts(spark.read.parquet(f"{sf_dir}/{name}.parquet"))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str, names=ALL_TABLES) -> None:
    """Register fixture tables as temp views for the SQL API."""
    for name in names:
        load(spark, sf_dir, name).createOrReplaceTempView(name)


def materialize_stamped(src_path: str, out_dir: str, build_fn) -> str:
    """Run ``build_fn(out_dir)`` only when the source's (mtime, size)
    stamp changed — the shared freshness gate for derived on-disk
    artifacts (IVF cell indexes, MinHash signature indexes). Plan-only
    callers (explain / plan gates) and repeated bench trials reuse the
    artifact instead of paying a corpus-scale rebuild per call, which is
    the behavior a persisted 100 TB index actually has; a regenerated
    fixture changes the stamp and forces a rebuild, so oracles always
    see fresh derivations. The ``_``-prefixed marker is invisible to
    Spark directory scans. Returns ``out_dir``."""
    import os  # noqa: PLC0415

    st = os.stat(src_path)
    stamp = f"{st.st_mtime_ns}:{st.st_size}"
    marker = os.path.join(out_dir, "_SRC_STAMP")
    try:
        with open(marker) as fh:
            if fh.read() == stamp:
                return out_dir
    except OSError:
        pass
    build_fn(out_dir)
    with open(marker, "w") as fh:
        fh.write(stamp)
    return out_dir
