"""Source/sink format coverage: CSV, JSON, ORC, partitioned parquet.

The reference's only transport is JDBC row-copy (`sync/JdbcRecordCursor.java`,
`sync/JdbcPageSink.java`); an analytics engine additionally needs the file
formats a lake lands data in. Each query here round-trips a fixture table
through one format — write to scratch, read back with an explicit schema —
and is oracle-checked against the original parquet, so what's verified is
the format codec's TYPE FIDELITY (timestamps, doubles, quoted strings,
nulls), the exact surface where text formats silently corrupt data.

Scale notes: every writer/reader here is the distributed task-per-partition
path (no driver materialization); `sink_partitioned` additionally shows the
write-side layout that makes 100 TB reads cheap — dynamic partition
overwrite + partition-pruned scans.

Format matrix: {parquet, orc, csv, json, jsonl, xml, jdbc} are covered by
registered keys. AVRO is NOT: the ``spark-avro`` datasource module jar is
absent from this container (only core avro-1.12 libs ship;
``format("avro")`` raises FAILED_TO_FIND_DATA_SOURCE, probed r9) and
installs are off-limits. On a deployment with the module on the classpath,
``source_avro`` is ``source_orc`` with format("avro") — the same
round-trip contract, no engine changes.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cpt_database_sync_spark.plans.registry import register
from cpt_database_sync_spark.sources.sync import scratch_dir
from cpt_database_sync_spark.sources.tables import load


def _fmt_dir(name: str) -> str:
    return os.path.join(scratch_dir(), "formats", name)


_ORDERS_COLS = [
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
]

_ORDERS_SCHEMA = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("o_custkey", T.LongType()),
        T.StructField("o_orderstatus", T.StringType()),
        T.StructField("o_totalprice", T.DoubleType()),
        T.StructField("o_orderdate", T.TimestampType()),
        T.StructField("o_orderpriority", T.StringType()),
    ]
)

_ORDERS_ORACLE = """
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
           o_orderdate, o_orderpriority
    FROM orders
"""


@register("source_csv", oracle=_ORDERS_ORACLE)
def source_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV round-trip of orders: header + quoted strings + ISO timestamps.

    Read back with an EXPLICIT schema (schema inference on CSV is both a
    correctness and a perf trap at scale — it scans the data twice and
    guesses types per-file). Doubles survive because Spark writes
    shortest-roundtrip decimal text; the oracle equality proves it.
    """
    out = _fmt_dir("orders_csv")
    src = load(spark, sf_dir, "orders").select(*_ORDERS_COLS)
    # one microsecond-precision pattern pinned for BOTH timestamp kinds:
    # the fixture column is TIMESTAMP_NTZ, which the writer formats with
    # timestampNTZFormat (timestampFormat alone is silently ignored for it)
    ts_fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    (
        src.write.mode("overwrite")
        .option("header", "true")
        .option("timestampFormat", ts_fmt)
        .option("timestampNTZFormat", ts_fmt)
        .csv(out)
    )
    return (
        spark.read.schema(_ORDERS_SCHEMA)
        .option("header", "true")
        .option("timestampFormat", ts_fmt)
        .option("timestampNTZFormat", ts_fmt)
        .csv(out)
    )


@register(
    "source_json",
    oracle="""
    SELECT event_id, user_id, event_type, value, props
    FROM events
    """,
)
def source_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines round-trip of events (sans ts — covered by streaming).

    ``props`` is a JSON document carried as a string column: the writer
    escapes it as a JSON string value and the reader (explicit schema, so
    no inference pass) returns it byte-identical — the engine does not
    reinterpret nested payloads unless asked to (`from_json` is the opt-in,
    see semi_structured). Doubles round-trip via shortest-representation.
    """
    out = _fmt_dir("events_json")
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )
    src = load(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value", "props"
    )
    src.write.mode("overwrite").json(out)
    return spark.read.schema(schema).json(out)


@register(
    "source_orc",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
           l_returnflag, l_shipdate
    FROM lineitem
    WHERE l_orderkey <= 1000
    """,
)
def source_orc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC round-trip (the other columnar lake format Spark ships a
    vectorized reader for). Binary columnar → trivially exact; included so
    the format matrix {parquet, orc, csv, json, jdbc} is complete."""
    out = _fmt_dir("lineitem_orc")
    src = load(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        "l_extendedprice",
        "l_returnflag",
        "l_shipdate",
    )
    src.filter(F.col("l_orderkey") <= 1000).write.mode("overwrite").orc(out)
    return spark.read.orc(out)


@register(
    "sink_partitioned",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
    FROM lineitem
    WHERE l_returnflag = 'R'
    """,
)
def sink_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-layout partitioned sink + partition-pruned read-back.

    Writes lineitem partitioned by l_returnflag (3 partitions here; day(ts)
    at the 100 TB target), then reads ONE partition back. The filter is
    satisfied by directory pruning — zero data files of the other
    partitions are opened (PartitionFilters in the scan node, gated in
    tests/test_plans.py). Dynamic partition overwrite makes re-runs replace
    only the partitions they touch — the idempotent bulk-sink pattern
    incremental_append uses at row granularity.
    """
    out = _fmt_dir("lineitem_by_flag")
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        src = load(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"
        )
        src.write.mode("overwrite").partitionBy("l_returnflag").parquet(out)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    # explicit schema: a partitioned write of an EMPTY frame leaves no
    # data files or directories, and schema inference then fails on the
    # bare _SUCCESS marker; stating the schema also skips footer
    # inference on the happy path (partition values still come from the
    # directory names).
    return (
        spark.read.schema(src.schema).parquet(out)
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
    )


_DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


@register(
    "sink_jsonl",
    oracle="SELECT doc_id, text, lang, source, n_chars FROM documents",
)
def sink_jsonl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSONL (newline-delimited JSON) round-trip of the documents table —
    the interchange format LLM training corpora actually ship in (one
    JSON object per line, splittable, appendable).

    Write is the distributed task-per-partition text writer; read-back
    uses an explicit schema (schema inference over JSONL is a full extra
    pass at 100 TB — never pay it twice). The oracle compares against
    the original parquet, so what's verified is the codec's type and
    string fidelity (unicode escapes, int64 width) across the round
    trip. At scale, pair with compression (zstd) and
    ``maxRecordsPerFile`` to keep shard sizes trainer-friendly.
    """
    out = _fmt_dir("documents_jsonl")
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    docs.write.mode("overwrite").json(out)
    return spark.read.schema(_DOCS_SCHEMA).json(out)


@register(
    "schema_evolution",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice,
           CAST(NULL AS VARCHAR) AS o_orderpriority,
           'v1' AS batch
    FROM orders WHERE o_orderkey % 2 = 0
    UNION ALL
    SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority, 'v2' AS batch
    FROM orders WHERE o_orderkey % 2 = 1
    """,
)
def schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema drift across sync batches: a v2 producer adds a column and
    the combined read must surface v1 rows with NULLs — the evolution
    case the reference cannot represent (its converter emits one fixed
    CREATE per sync, `sync/M2H2SchemaConverter.java:48-118`).

    Two parquet batches with different schemas land in one dataset;
    ``mergeSchema`` unions the footers at planning time (schema work is
    metadata-only — no data rewrite, unlike the reference's drop+recreate,
    which would lose the old rows entirely). At 100 TB this is the
    standard additive-column path: old files are never touched, the scan
    fills missing columns with NULL.
    """
    import shutil

    target = _fmt_dir("evolution")
    shutil.rmtree(target, ignore_errors=True)
    o = load(spark, sf_dir, "orders")
    v1 = o.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_custkey", "o_totalprice", F.lit("v1").alias("batch")
    )
    v2 = o.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority",
        F.lit("v2").alias("batch"),
    )
    v1.write.mode("append").parquet(target)
    v2.write.mode("append").parquet(target)
    merged = spark.read.option("mergeSchema", "true").parquet(target)
    return merged.select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority", "batch"
    )


@register(
    "file_lineage",
    oracle="""
    SELECT 'documents.parquet' AS file_name,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
    FROM documents
    GROUP BY file_name
    """,
)
def file_lineage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row provenance via the hidden ``_metadata`` file columns: which
    physical file produced each row — at 100 TB the mechanism that traces
    a bad training sample back to its shard (and the audit column a
    curated dataset persists next to the data; no schema change needed,
    the lineage is free at scan time).

    Aggregated per source file here (one fixture file per table, so the
    oracle pins the basename); a production pipeline selects
    ``_metadata.file_path`` / ``row_index`` per row. Map-only +
    |files|-row aggregation.
    """
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (
        d.select(
            F.element_at(F.split(F.col("_metadata.file_path"), "/"), -1).alias(
                "file_name"
            ),
            "doc_id",
        )
        .groupBy("file_name")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
    )


COMPACT_TARGET_BYTES = 32 * 1024 * 1024
COMPACT_FRAGMENTS = 64


@register("compact_small_files", oracle="SELECT * FROM events")
def compact_small_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction — the table-maintenance pass every 100 TB
    ingest pipeline schedules: streaming and incremental sinks emit one
    file per micro-batch task, and thousands of KB-scale files tax the
    scan planner (footer reads, task scheduling) far more than the bytes
    justify. Here the events table is first fragmented into 64 files
    (COMPACT_FRAGMENTS — a streaming sink's aftermath), then rewritten
    into ceil(bytes / COMPACT_TARGET_BYTES=32MB) size-targeted
    files — sizing from the ACTUAL on-disk bytes, not row counts, so the
    same code lands on ~target-size files at any scale or schema width.

    The rewrite is a round-robin repartition (no key skew; at 100 TB
    compaction jobs run per partition directory, preserving the
    partition layout). Identity oracle: compaction must not change,
    drop, or duplicate a single row — the same guarantee FileStreamSink
    compaction needs before swapping manifests.
    """
    frag_dir = _fmt_dir("events_fragmented")
    comp_dir = _fmt_dir("events_compacted")
    ev = load(spark, sf_dir, "events")
    ev.repartition(COMPACT_FRAGMENTS).write.mode("overwrite").parquet(frag_dir)
    total_bytes = sum(
        e.stat().st_size
        for e in os.scandir(frag_dir)
        if e.name.endswith(".parquet")
    )
    n_out = max(1, -(-total_bytes // COMPACT_TARGET_BYTES))
    frag = spark.read.parquet(frag_dir)
    frag.repartition(n_out).write.mode("overwrite").parquet(comp_dir)
    return spark.read.parquet(comp_dir).select(*ev.columns)


RETENTION_CUTOFF_DAY = "2024-01-15"


@register(
    "partition_retention",
    oracle=f"""
    SELECT event_id, ts, user_id, event_type, value, props
    FROM events WHERE CAST(ts AS DATE) >= DATE '{RETENTION_CUTOFF_DAY}'
    """,
)
def partition_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention expiry as PARTITION DROPS — the other table-maintenance
    pass (next to ``compact_small_files``) a 100 TB pipeline schedules:
    with the sink laid out day(ts)-partitioned, expiring a retention
    window deletes whole partition directories — a metadata/file
    operation that never opens, rewrites, or shuffles surviving data.
    Row-level retention (DELETE WHERE) would rewrite every file; the
    partition layout turns it into O(expired partitions) directory
    removals, which is why retention policy dictates partition
    granularity at scale.

    The oracle is the surviving window (``ts >= cutoff day``): exact
    only because partition boundaries align with the retention predicate
    — the layout-design point this operator demonstrates.
    """
    import shutil  # noqa: PLC0415

    out = _fmt_dir("events_by_day")
    ev = load(spark, sf_dir, "events")
    by_day = ev.withColumn("day", F.date_format("ts", "yyyy-MM-dd"))
    by_day.write.mode("overwrite").partitionBy("day").parquet(out)
    for name in os.listdir(out):
        if name.startswith("day=") and name[4:] < RETENTION_CUTOFF_DAY:
            shutil.rmtree(os.path.join(out, name))
    # explicit schema — see sink_partitioned: an empty partitioned write
    # (or a retention pass that dropped EVERY partition) leaves nothing
    # to infer from, and that read must yield an empty frame, not fail.
    return spark.read.schema(by_day.schema).parquet(out).select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )


_CORRECTED_DAYS = ("2024-01-05", "2024-01-06")

_PARTIAL_OVERWRITE_SQL = f"""
    SELECT event_id, user_id, event_type,
           CASE WHEN CAST(CAST(ts AS DATE) AS VARCHAR)
                     IN {_CORRECTED_DAYS!r} THEN value * 2
                ELSE value END AS value,
           CAST(CAST(ts AS DATE) AS VARCHAR) AS day
    FROM events
"""


@register("sink_partial_overwrite", oracle=_PARTIAL_OVERWRITE_SQL)
def sink_partial_overwrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Surgical partition correction — the backfill move a 100 TB lake
    runs daily: a bug is found in two days of data, the fix job rewrites
    ONLY those two day-directories (dynamic partition overwrite), and
    every other partition's files are untouched bytes (no read, no
    rewrite, no tombstones). `sink_partitioned` shows the layout; this
    shows the repair semantics on top of it.

    The correction (value × 2) is an exact IEEE operation, so the
    oracle can state the whole expected table as one CASE expression:
    untouched partitions must equal the original rows bit-for-bit —
    which is precisely the property dynamic overwrite guarantees and
    a blind full rewrite only approximates (new files, new order, new
    statistics). Write volume is O(|corrected days|), not O(table).
    """
    out = _fmt_dir("events_by_day")
    base = load(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        F.col("ts").cast("date").cast("string").alias("day"),
    )
    base.write.mode("overwrite").partitionBy("day").parquet(out)
    corrected = base.filter(F.col("day").isin(*_CORRECTED_DAYS)).withColumn(
        "value", F.col("value") * 2
    )
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        corrected.write.mode("overwrite").partitionBy("day").parquet(out)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("day", T.StringType()),
        ]
    )
    return spark.read.schema(schema).parquet(out).select(
        "event_id", "user_id", "event_type", "value", "day"
    )


# Morton (Z-order) interleave of two 8-bit quantized dims — one fully
# parenthesized integer expression valid in BOTH SQL dialects, so the
# Spark column and the DuckDB oracle share the exact text.
_Z_EXPR = " + ".join(
    f"((((u >> {k}) & 1) << {2 * k + 1}) + (((d >> {k}) & 1) << {2 * k}))"
    for k in range(8)
)
# the demo query box: users 64..127 (u 8..15) × Jan-06..Jan-10 (d 5..9)
_ZBOX = "(min_u <= 15 AND max_u >= 8 AND min_d <= 9 AND max_d >= 5)"

_ZORDER_SQL = f"""
    WITH quant AS (
      SELECT LEAST(user_id >> 3, 255) AS u,
             LEAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)), 255) AS d
      FROM events
    ),
    z AS (SELECT u, d, ({_Z_EXPR}) >> 6 AS zbucket FROM quant)
    SELECT zbucket,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           MIN(u) AS min_u, MAX(u) AS max_u,
           MIN(d) AS min_d, MAX(d) AS max_d,
           {_ZBOX} AS scanned
    FROM z GROUP BY zbucket
"""


@register("zorder_layout", oracle=_ZORDER_SQL)
def zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton-curve) layout for multi-dimensional data
    skipping — what Delta's OPTIMIZE ZORDER BY does, built from
    first principles: quantize (user, day) to 8 bits each, interleave
    the bits so nearby (user, day) pairs share z-prefixes, and cluster
    files by z-ranges. Each output row is one z-bucket (a file in the
    production layout) with its per-dim min/max — exactly the footer
    statistics a scan prunes with — plus whether a 2-D box query
    (users 64–127 × Jan 6–10) would have to open it.

    Why it matters at 100 TB: partitioning can prune ONE dimension;
    a linear sort gives perfect pruning on its leading key and none on
    the other. Z-clustering bounds BOTH dims inside every file, so a
    2-D box touches O(√files)-ish instead of all of them (the unit
    test measures this against a day-sorted layout on the same data).
    The bucket grid here is a fixed z-prefix (deterministic ⇒ exactly
    oracle-checkable); production would repartitionByRange on the full
    z-value — same locality, sampled boundaries. Map-only quantize +
    interleave (one shared integer expression, whole-stage codegen),
    one |buckets|-row aggregation.
    """
    ev = load(spark, sf_dir, "events")
    quant = ev.select(
        F.expr("LEAST(user_id >> 3, 255)").alias("u"),
        F.least(
            F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")),
            F.lit(255),
        ).alias("d"),
    )
    z = quant.select("u", "d", F.expr(f"({_Z_EXPR}) >> 6").alias("zbucket"))
    return z.groupBy("zbucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.min("u").alias("min_u"),
        F.max("u").alias("max_u"),
        F.min("d").alias("min_d"),
        F.max("d").alias("max_d"),
        F.expr(_ZBOX).alias("scanned"),
    )


_CORRUPT_SQL = """
    WITH parsed AS (
      SELECT doc_id, lang FROM documents WHERE doc_id % 10 <> 0
    )
    SELECT 'parsed' AS status, lang,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM parsed GROUP BY lang
    UNION ALL
    SELECT 'corrupt', CAST(NULL AS VARCHAR),
           CAST(COUNT(*) AS BIGINT)
    FROM documents WHERE doc_id % 10 = 0
    HAVING COUNT(*) > 0
"""


@register("source_json_corrupt", oracle=_CORRUPT_SQL)
def source_json_corrupt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-tolerant JSONL ingestion — real corpus drops always contain
    broken lines (truncated uploads, interleaved logs), and the wrong
    default is a job abort at line 40-billion. PERMISSIVE mode with a
    ``_corrupt_record`` column turns each bad line into a quarantine ROW
    instead: parsed rows flow on, corrupt ones are counted (and in
    production, written to a quarantine sink for replay). This is the
    file-format analogue of the reference's swallowed error flag
    (`sync/JdbcRecordCursor.java` §2A#14) done right: errors become
    data, not silence.

    The fixture corrupts every 10th document (its JSON object loses the
    final byte — a truncated upload); the oracle states exactly which rows must
    survive and how many must quarantine — so the parser's line
    accounting is value-checked, not just its happy path. Map-only
    scan; the corrupt-line check costs nothing extra at 100 TB because
    the parser must tokenize every line anyway.
    """
    out = _fmt_dir("documents_jsonl_corrupt")
    docs = load(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    # produce the JSONL text ourselves so corruption is deterministic:
    # every 10th doc's object is truncated mid-string
    # corruption = drop the object's closing byte: ALWAYS invalid JSON,
    # whatever the payload (a fixed-prefix cut left short objects — e.g.
    # a NULL-text doc's {"doc_id":N} — intact, silently un-corrupting
    # them and breaking the closed-form oracle)
    line = F.to_json(F.struct("doc_id", "lang", "text"))
    corrupted = docs.select(
        F.when(
            F.col("doc_id") % 10 == 0,
            line.substr(F.lit(1), F.length(line) - 1),
        ).otherwise(line).alias("value")
    )
    corrupted.write.mode("overwrite").text(out)
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("lang", T.StringType()),
            T.StructField("text", T.StringType()),
            T.StructField("_corrupt_record", T.StringType()),
        ]
    )
    read = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(out)
    )
    # one grouped aggregation classifies every line (a corrupt-only
    # projection is disallowed by Spark -- and single-pass is the right
    # plan anyway: status and lang are grouping expressions on one scan)
    ok = F.col("_corrupt_record").isNull()
    return (
        read.groupBy(
            F.when(ok, F.lit("parsed")).otherwise(F.lit("corrupt")).alias("status"),
            F.when(ok, F.col("lang")).alias("lang"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


@register(
    "source_xml",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
           o_orderdate, o_orderpriority
    FROM orders WHERE o_orderkey <= 2000
    """,
)
def source_xml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML round-trip — Spark 4's built-in XML source (the format
    enterprise feeds still arrive in). One row element per record,
    distributed writer/reader like every other lane here; read-back
    uses the explicit schema (XML inference is an extra full pass AND
    type-lossy — everything is text without it). The oracle compares
    against the original parquet, so what's checked is the codec's
    type fidelity across text serialization: int64 width, double
    round-trip (Spark writes shortest-roundtrip decimal strings),
    timestamp formatting — precisely where XML pipelines silently
    corrupt. Completes the format matrix
    {parquet, orc, csv, json, jsonl, xml, jdbc}.
    """
    out = _fmt_dir("orders_xml")
    src = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 2000)
    (
        src.write.mode("overwrite")
        .format("xml")
        .option("rootTag", "orders")
        .option("rowTag", "order")
        .save(out)
    )
    return (
        spark.read.schema(_ORDERS_SCHEMA)
        .format("xml")
        .option("rowTag", "order")
        .load(out)
    )


SORTED_SINK_FILES = 8


@register(
    "sink_sorted_global",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_shipdate, l_extendedprice
    FROM lineitem
    """,
)
def sink_sorted_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOTALLY-ORDERED sink: write lineitem globally sorted by
    (l_shipdate, l_orderkey, l_linenumber) across N range-partitioned
    files — the layout that makes a time-range query open only the files
    whose [min, max] footer stats overlap the predicate. zorder_layout
    interleaves MULTI-dimensional keys; this is the one-dimensional
    workhorse every time-series table ships with.

    Physics: ``repartitionByRange`` SAMPLES the sort key to pick N−1
    balanced split points (one pass over a reservoir sample, not the
    data), then each output file sorts locally — a total order without
    any single-node global sort. File k's max ≤ file k+1's min
    (asserted file-by-file from real footer boundaries in
    tests/test_units.py), so parquet row-group pruning composes with
    file pruning. The ties-broken key makes the file boundaries
    deterministic GIVEN the sampled splits; content (the oracle's
    concern) is an identity regardless. At 100 TB the same write runs
    per day-partition, giving day-dir pruning above file pruning.
    """
    out = _fmt_dir("lineitem_sorted")
    cols = ["l_orderkey", "l_linenumber", "l_shipdate", "l_extendedprice"]
    src = load(spark, sf_dir, "lineitem").select(*cols)
    key = [F.col("l_shipdate"), F.col("l_orderkey"), F.col("l_linenumber")]
    (
        src.repartitionByRange(SORTED_SINK_FILES, *key)
        .sortWithinPartitions(*key)
        .write.mode("overwrite")
        .parquet(out)
    )
    return spark.read.parquet(out).select(*cols)


@register(
    "join_partition_pruned",
    oracle="""
    SELECT
      CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
      CAST(COUNT(*) AS BIGINT) AS n_orders,
      CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(18,2))
           AS DOUBLE) AS revenue
    FROM orders
    WHERE EXTRACT(YEAR FROM o_orderdate) >= 2000
    GROUP BY EXTRACT(YEAR FROM o_orderdate)
    """,
)
def join_partition_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DYNAMIC partition pruning — the join-driven cousin of
    sink_partitioned's static pruning: the fact is laid out in year
    partitions, the filter lives on a DIMENSION table (is_recent), and
    the years to scan are only known after the dim filter runs. Spark
    plants the dim's build side as a runtime subquery INSIDE the fact
    scan's PartitionFilters (``dynamicpruning#``, gated in
    tests/test_plans.py), so the join reads two year-directories instead
    of seven — at 100 TB with day partitions and a "current campaign"
    dim this is the difference between scanning 36 TB and 50 GB.

    Both tables are materialized to parquet first (DPP needs real
    file-source partitions on the probe side and a filterable build
    side); the dim derives from the fact's own year spine, labeled
    era = 'current' for year ≥ 2000. The dim filter is a COMPARISON
    (era = 'current'), deliberately: Spark's PartitionPruning rule
    gates on ``isLikelySelective``, which recognizes comparisons/IN/
    LIKE but NOT a bare boolean column — `filter(col("is_recent"))`
    silently never prunes (measured here; the gate would catch a
    regression either way). The oracle collapses the join+label to the
    equivalent single-table predicate.
    """
    fact_dir = _fmt_dir("orders_by_year")
    dim_dir = _fmt_dir("year_dim")
    orders = load(spark, sf_dir, "orders").withColumn(
        "o_year", F.year("o_orderdate")
    )
    orders.write.mode("overwrite").partitionBy("o_year").parquet(fact_dir)
    (
        orders.select("o_year")
        .distinct()
        .withColumn(
            "era",
            F.when(F.col("o_year") >= 2000, F.lit("current")).otherwise(
                F.lit("archive")
            ),
        )
        .write.mode("overwrite")
        .parquet(dim_dir)
    )
    # explicit schema — see sink_partitioned: empty partitioned writes
    # leave nothing for inference (the dim's plain write always leaves a
    # schema-bearing part file, so only the fact needs it).
    fact = spark.read.schema(orders.schema).parquet(fact_dir)
    dim = spark.read.parquet(dim_dir).filter(F.col("era") == "current")
    return (
        fact.join(dim, "o_year")
        .groupBy(F.col("o_year").cast("int").alias("o_year"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(12,2)"))
            .cast("decimal(18,2)")
            .cast("double")
            .alias("revenue"),
        )
    )


MANIFEST_SHARDS = 8


@register(
    "export_manifest",
    oracle=f"""
    SELECT
      CAST(doc_id % {MANIFEST_SHARDS} AS BIGINT) AS shard,
      CAST(COUNT(*) AS BIGINT) AS n_rows,
      CAST(SUM(n_chars) AS BIGINT) AS n_chars,
      md5(string_agg(md5(text), '' ORDER BY doc_id)) AS content_hash
    FROM documents
    GROUP BY doc_id % {MANIFEST_SHARDS}
    """,
)
def export_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Release manifest — the reproducibility receipt shipped WITH a
    training-data export: per shard, the row count, size, and an
    ORDER-CANONICAL content hash (md5 of the doc_id-sorted per-doc
    hashes). Two exports are the same dataset iff manifests match —
    regardless of task scheduling, file count, or row order inside
    files, which is exactly what raw output-file checksums CANNOT give
    on a distributed writer (file bytes depend on partitioning). The
    consumer re-derives the manifest after download; file_lineage
    answers "which file did this row come from", this answers "is the
    release byte-equivalent".

    Physics: per-doc md5 is map-side; each shard's canonical hash needs
    its docs' hashes IN ORDER — collect_list + sort_array per shard
    (shard sizes are |docs|/shards; at 100 TB shard finer or tree-hash:
    hash runs of 10⁶ docs, then hash the run hashes — same canonical
    property, bounded memory). One shuffle on the shard key.
    """
    docs = load(spark, sf_dir, "documents")
    return (
        docs.select(
            (F.col("doc_id") % MANIFEST_SHARDS).alias("shard"),
            "doc_id",
            "n_chars",
            F.md5("text").alias("h"),
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("n_chars").alias("n_chars"),
            # collect only hashable docs (collect_list drops the NULL
            # entries the `when` produces): NULL-text docs contribute no
            # hash material, and a shard with NOTHING hashable gets a
            # NULL manifest hash — the oracle's string_agg-skips-NULLs /
            # md5(NULL) behavior, not md5 of the empty string
            F.sort_array(
                F.collect_list(
                    F.when(F.col("h").isNotNull(), F.struct("doc_id", "h"))
                )
            ).alias("hs"),
        )
        .select(
            "shard",
            "n_rows",
            "n_chars",
            F.when(F.size("hs") == 0, F.lit(None).cast("string"))
            .otherwise(
                F.md5(F.array_join(F.transform(F.col("hs"), lambda s: s["h"]), ""))
            )
            .alias("content_hash"),
        )
    )


# Cuboid routed to answer the "by linestatus" serving query: bits are
# (l_returnflag, l_linestatus, yr) most-significant-first, 1 = rolled
# away — keep only l_linestatus => 101b = 5.
_CUBE_ROUTE_GID = 5

_CUBE_SCHEMA = T.StructType(
    [
        T.StructField("l_returnflag", T.StringType()),
        T.StructField("l_linestatus", T.StringType()),
        T.StructField("yr", T.IntegerType()),
        T.StructField("sum_qty_dec", T.DecimalType(24, 2)),
        T.StructField("cnt", T.LongType()),
        T.StructField("gid", T.LongType()),
    ]
)


def _cube_lattice_dir(spark: SparkSession, sf_dir: str) -> str:
    """Materialize the full (returnflag, linestatus, year) cube lattice
    — all 8 cuboids from ONE pass over the fact table — as parquet
    partitioned by grouping_id, rebuilt only when the source fixture
    changes (``materialize_stamped``)."""
    from cpt_database_sync_spark.sources.tables import (  # noqa: PLC0415
        materialize_stamped,
    )

    src = os.path.join(sf_dir, "lineitem.parquet")
    out = os.path.join(
        scratch_dir(), "cube_lattice", os.path.basename(sf_dir.rstrip("/"))
    )

    def build(d: str) -> None:
        li = load(spark, sf_dir, "lineitem").withColumn(
            "yr", F.year("l_shipdate")
        )
        cube = li.cube("l_returnflag", "l_linestatus", "yr").agg(
            F.sum(F.col("l_quantity").cast("decimal(14,2)"))
            .cast("decimal(24,2)")
            .alias("sum_qty_dec"),
            F.count(F.lit(1)).alias("cnt"),
            F.grouping_id().alias("gid"),
        )
        cube.write.mode("overwrite").partitionBy("gid").parquet(d)

    return materialize_stamped(src, out, build)


@register(
    "cube_lattice_route",
    oracle=f"""
    SELECT l_linestatus,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(14,2))) AS DECIMAL(18,2))
                AS DOUBLE) AS sum_qty,
           CAST(count(*) AS BIGINT) AS n_rows,
           {_CUBE_ROUTE_GID} AS routed_gid
    FROM lineitem GROUP BY l_linestatus
    """,
)
def cube_lattice_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized cube lattice + cuboid ROUTING (the Kylin/Druid
    rollup-serving design): one GROUPING-SETS pass persists all 8
    (returnflag, linestatus, year) cuboids partitioned by grouping_id;
    a serving query then reads the SMALLEST cuboid that contains its
    answer — here "total quantity by linestatus" routes to gid=5
    (returnflag and year rolled away), a partition-pruned point read of
    a |linestatus|-row directory. Query latency becomes independent of
    fact-table size: at 100 TB the lattice build is one shuffle, every
    dashboard query after it is a file-footer-sized read (plan-gated:
    the scan carries a gid PartitionFilter and reads only that cuboid).

    grouping_id is what disambiguates a REAL NULL dimension value from
    a rolled-away dimension (the standard lattice trick) — the
    payload-nulls fixture exercises exactly that: NULL linestatus rows
    form their own group INSIDE gid=5 rather than colliding with the
    rolled-up rows of other cuboids.

    Exactness: cuboid measures accumulate in the DECIMAL(14,2)->(24,2)
    lane; the routed read re-emits them through the DECIMAL(18,2)
    rescale -> double rule (numeric.py). Since the routed cuboid IS the
    answer grain, no re-aggregation happens at read time — the oracle
    aggregates the raw fact table directly and must agree.

    The read-back passes the explicit lattice schema: an EMPTY fact
    table materializes a row-less lattice whose parquet directory has
    no partition dirs to infer types from (the r8 empty-write lesson).
    """
    d = _cube_lattice_dir(spark, sf_dir)
    lattice = spark.read.schema(_CUBE_SCHEMA).parquet(d)
    routed = lattice.filter(F.col("gid") == _CUBE_ROUTE_GID)
    return routed.select(
        "l_linestatus",
        F.col("sum_qty_dec").cast("decimal(18,2)").cast("double").alias("sum_qty"),
        F.col("cnt").alias("n_rows"),
        F.lit(_CUBE_ROUTE_GID).alias("routed_gid"),
    )
