"""Scalar function library + semi-structured (JSON) access.

The reference has no scalar functions at all — its expression surface is
the identity copy of column values (`sync/JdbcRecordCursor.java:126-163`).
This module is the declared extension (SURVEY.md §2B `scalar_funcs`,
`semi_structured`): string/date/math/conditional built-ins, all JVM-side
and whole-stage-codegen'd — never Python UDFs for these.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cpt_database_sync_spark.plans.registry import register
from cpt_database_sync_spark.sources.tables import load


@register(
    "scalar_funcs",
    oracle="""
    SELECT
      o_orderkey,
      lower(o_orderpriority)                       AS lp,
      upper(o_orderstatus)                         AS us,
      substr(o_orderpriority, 1, 3)                AS pfx,
      o_orderstatus || '-' || o_orderpriority      AS tag,
      CAST(length(o_orderpriority) AS INT)         AS plen,
      CAST(year(o_orderdate) AS INT)               AS yr,
      CAST(month(o_orderdate) AS INT)              AS mo,
      CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS mon_ts,
      CAST(date_diff('day', o_orderdate, TIMESTAMP '2002-01-01') AS INT) AS days_left,
      abs(o_totalprice - 250000.0)                 AS dist_mid,
      CASE WHEN o_totalprice > 250000.0 THEN 'big' ELSE 'small' END AS size_class,
      CASE WHEN o_orderstatus = 'F' THEN 'done'
           WHEN o_orderstatus = 'O' THEN 'open'
           ELSE 'partial' END                      AS status_word
    FROM orders
    """,
)
def scalar_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String/date/math/conditional scalar pack over orders.

    Every expression is a Catalyst built-in (whole-stage codegen); per-row
    double math (abs/sub) is IEEE-exact so it needs no decimal lane.
    """
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.lower("o_orderpriority").alias("lp"),
        F.upper("o_orderstatus").alias("us"),
        F.substring("o_orderpriority", 1, 3).alias("pfx"),
        # F.concat (not concat_ws): NULL if any input is NULL, matching the
        # oracle's concat(a,'-',b) semantics.
        F.concat(F.col("o_orderstatus"), F.lit("-"), F.col("o_orderpriority")).alias("tag"),
        F.length("o_orderpriority").alias("plen"),
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.date_trunc("month", "o_orderdate").alias("mon_ts"),
        F.datediff(F.lit("2002-01-01").cast("date"), F.col("o_orderdate")).alias(
            "days_left"
        ),
        F.abs(F.col("o_totalprice") - 250000.0).alias("dist_mid"),
        F.when(F.col("o_totalprice") > 250000.0, "big")
        .otherwise("small")
        .alias("size_class"),
        F.when(F.col("o_orderstatus") == "F", "done")
        .when(F.col("o_orderstatus") == "O", "open")
        .otherwise("partial")
        .alias("status_word"),
    )


@register(
    "semi_structured",
    oracle="""
    SELECT
      event_id,
      json_extract_string(props, '$.k')                    AS k_str,
      CAST(json_extract_string(props, '$.k') AS INTEGER)   AS k_int,
      CAST(json_extract_string(props, '$.k') AS INTEGER) % 10 AS k_mod
    FROM events
    """,
)
def semi_structured(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON column access over ``events.props``.

    ``get_json_object`` evaluates JVM-side with a shared parse per row;
    for fixed schemas ``from_json`` (used in the streaming module) is the
    vectorizable path. The reference's model is flat relational — JSON is
    a [TARGET] extension (SURVEY.md §1.2: getObject unsupported,
    `sync/JdbcRecordCursor.java:165-168`).
    """
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k")
    return ev.select(
        "event_id",
        k.alias("k_str"),
        k.cast("int").alias("k_int"),
        (k.cast("int") % 10).alias("k_mod"),
    )


_HOF_SQL = """
    WITH a AS (
      SELECT l_orderkey,
             list(CAST(l_quantity AS BIGINT)
                  ORDER BY l_linenumber, CAST(l_quantity AS BIGINT)) AS qtys
      FROM lineitem
      WHERE l_quantity IS NOT NULL
      GROUP BY l_orderkey
    )
    SELECT l_orderkey,
           len(qtys)                                                AS n_items,
           array_to_string(list_transform(qtys, x -> x * 2), ',')   AS doubled,
           COALESCE(array_to_string(list_filter(qtys, x -> x >= 25), ','),
                    '')                                              AS big,
           CAST(len(list_filter(qtys, x -> x >= 25)) > 0 AS INT)    AS has_big,
           list_reduce(list_prepend(CAST(0 AS BIGINT), qtys),
                       (acc, x) -> acc + x)                          AS total,
           array_to_string(list_sort(qtys), ',')                    AS sorted_qtys
    FROM a
    WHERE l_orderkey <= 100
"""


@register(
    "hof_surface",
    oracle=_HOF_SQL,
)
def hof_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The higher-order-function surface in one query: per-order quantity
    arrays put through transform / filter / exists / aggregate /
    array_sort. HOFs run inside whole-stage codegen on the JVM — this is
    the idiom that keeps per-element logic off the Python path (the same
    machinery minhash/simhash/fingerprint build on). The DuckDB oracle
    uses its list_* equivalents; element order is pinned by collecting in
    (l_linenumber, quantity) order on both sides — l_linenumber
    alone is not unique in the fixture, so the quantity tie-break keeps
    the arrays deterministic. Array-typed outputs are serialized to
    canonical comma-joined strings (array_join / array_to_string) so the
    driver's pandas canonicalizer can sort and hash them — the HOF
    lambdas are unchanged, only the output surface is flattened.
    """
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 100)
    a = (
        li.select(
            "l_orderkey",
            "l_linenumber",
            F.col("l_quantity").cast("bigint").alias("q"),
        )
        # NULL quantities are excluded on BOTH engines before collecting:
        # a NULL element NULL-poisons exists/aggregate on the Spark side
        # while DuckDB's list lane drops it — pinning the exclusion makes
        # the array contract explicit instead of engine-accidental
        .filter(F.col("q").isNotNull())
        .groupBy("l_orderkey")
        .agg(
            F.array_sort(F.collect_list(F.struct("l_linenumber", "q"))).alias("sq")
        )
        .select(
            "l_orderkey", F.expr("transform(sq, s -> s.q)").alias("qtys")
        )
    )
    return a.select(
        "l_orderkey",
        F.size("qtys").cast("bigint").alias("n_items"),
        F.expr(
            "array_join(transform(qtys, x -> CAST(x * 2 AS STRING)), ',')"
        ).alias("doubled"),
        F.expr(
            "array_join(transform(filter(qtys, x -> x >= 25),"
            " x -> CAST(x AS STRING)), ',')"
        ).alias("big"),
        F.expr("CAST(exists(qtys, x -> x >= 25) AS INT)").alias("has_big"),
        F.expr(
            "aggregate(qtys, CAST(0 AS BIGINT), (acc, x) -> acc + x)"
        ).alias("total"),
        F.expr(
            "array_join(transform(array_sort(qtys), x -> CAST(x AS STRING)), ',')"
        ).alias("sorted_qtys"),
    )


@register(
    "map_type_surface",
    # The map ops run Spark-side; the oracle recomputes every emitted
    # value directly from the JSON scalar, so the MapType plumbing is
    # value-checked end to end (the multimodal strategy).
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS INT)          AS k_val,
           CAST(json_extract(props, '$.k') AS INT) % 10     AS bucket,
           CASE WHEN props IS NULL THEN NULL ELSE 2 END      AS n_keys,
           CASE WHEN props IS NULL THEN NULL
                ELSE 'bucket,k' END                           AS keys_sorted,
           CAST(json_extract(props, '$.k') AS INT) * 2
             + (CAST(json_extract(props, '$.k') AS INT) % 10) * 2 AS doubled_sum,
           CAST(CAST(json_extract(props, '$.k') AS INT) >= 50 AS INT)
             + CAST(CAST(json_extract(props, '$.k') AS INT) % 10 >= 50 AS INT)
                                                             AS n_big
    FROM events
    """,
)
def map_type_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType column surface: parse the JSON props into map<string,int>,
    extend it with a derived entry (map_concat), then exercise the map
    HOF family — element_at, map_keys, transform_values, map_filter —
    reducing each to a scalar the oracle recomputes from the raw JSON.

    All ops are JVM-side expressions over the map (no UDF, map entries
    never leave the row), so the surface is map-only and codegen'd at
    any scale — the schema shape (map of tags/features per event) is the
    standard semi-structured alternative to exploding key-value tables.
    """
    ev = load(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,int>")
    m2 = F.map_concat(
        m, F.create_map(F.lit("bucket"), F.element_at(m, "k") % 10)
    )
    doubled = F.transform_values(m2, lambda k, v: v * 2)
    big = F.map_filter(m2, lambda k, v: v >= 50)
    return ev.select(
        "event_id",
        F.element_at(m2, "k").alias("k_val"),
        F.element_at(m2, "bucket").alias("bucket"),
        F.size(m2).alias("n_keys"),
        F.array_join(F.array_sort(F.map_keys(m2)), ",").alias("keys_sorted"),
        F.aggregate(
            F.map_values(doubled), F.lit(0), lambda acc, v: acc + v
        ).alias("doubled_sum"),
        F.size(big).alias("n_big"),
    )


@register(
    "variant_surface",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS INTEGER) AS k_int,
           CAST(CAST(json_extract(props, '$.k') AS INTEGER) AS VARCHAR) AS k_str,
           json_extract(props, '$.missing') IS NULL AS missing_is_null
    FROM events
    """,
)
def variant_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VariantType (Spark 4): semi-structured payloads parsed ONCE into
    the binary variant encoding and extracted with typed paths —
    ``from_json`` needs the full schema up front (semi_structured),
    variant keeps open schemas queryable with per-path type assertion,
    which is the shingle of modern lakehouse JSON columns.

    ``parse_json`` → ``variant_get(path, type)`` stays JVM-side; at
    100 TB the parse happens at ingest and the variant column is stored
    (parquet variant encoding), so queries pay only the typed path read.
    The oracle recomputes every extraction from the raw JSON string with
    DuckDB's json_extract — same values, engine-independent.
    """
    ev = load(spark, sf_dir, "events")
    g = "variant_get(parse_json(props), '$.k', 'int')"
    return ev.select(
        "event_id",
        F.expr(g).alias("k_int"),
        F.expr(f"CAST({g} AS STRING)").alias("k_str"),
        F.expr(
            "variant_get(parse_json(props), '$.missing', 'string') IS NULL"
        ).alias("missing_is_null"),
    )


@register(
    "scalar_try_functions",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_discount = 0 THEN NULL
                ELSE l_extendedprice / l_discount END AS safe_ratio,
           TRY_CAST(l_returnflag AS INTEGER) AS flag_as_int,
           TRY_CAST(CAST(CAST(l_quantity AS BIGINT) AS VARCHAR) AS INTEGER) AS qty_as_int
    FROM lineitem WHERE l_orderkey <= 200
    """,
)
def scalar_try_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ``try_*`` error-handling surface: ANSI mode makes malformed
    casts and zero divisions RAISE (the fail-fast the reference's broken
    error flag never achieved — `utils/Utils.java:33` sets a flag no one
    reads, `sync/M2H2DataMigrator.java` ploughs on); ``try_divide`` /
    ``try_cast`` opt individual expressions back into NULL-on-error — a
    per-expression policy instead of the reference's per-pipeline
    nothing. NULL results here are VALUES the oracle checks, so the
    error-to-NULL mapping is verified, not assumed: a non-numeric string
    casts to NULL, a numeric-looking one to its value, zero denominators
    to NULL.
    """
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 200)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.try_divide("l_extendedprice", "l_discount").alias("safe_ratio"),
        F.col("l_returnflag").try_cast("int").alias("flag_as_int"),
        F.col("l_quantity").cast("bigint").cast("string").try_cast("int").alias("qty_as_int"),
    )


@register(
    "datetime_surface",
    oracle="""
    SELECT
      event_id,
      CAST(EXTRACT(YEAR FROM ts) AS INT)    AS y,
      CAST(EXTRACT(QUARTER FROM ts) AS INT) AS q,
      CAST(EXTRACT(WEEK FROM ts) AS INT)    AS iso_week,
      CAST(EXTRACT(DOY FROM ts) AS INT)     AS doy,
      CAST(EXTRACT(ISODOW FROM ts) AS INT)  AS iso_dow,
      CAST(EXTRACT(HOUR FROM ts) AS INT)    AS hr,
      CAST(EXTRACT(MINUTE FROM ts) AS INT)  AS mi,
      CAST(date_trunc('day', ts) AS DATE)   AS day
    FROM events WHERE event_id <= 500
    """,
)
def datetime_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime field-extraction matrix, ALIGNED across engines — the
    alignment is the content, because the defaults disagree: DuckDB's
    EXTRACT(DOW) is 0=Sunday while Spark's dayofweek()/EXTRACT(DOW) is
    1=Sunday (measured; the classic cross-system off-by-one that
    corrupts every day-of-week rollup moved between engines). The
    portable target is ISO numbering (1=Monday…7=Sunday): Spark
    computes ((dayofweek+5) mod 7)+1, the oracle uses DuckDB's ISODOW —
    same numbers, both engines. weekofyear/WEEK are both ISO weeks;
    YEAR/QUARTER/DOY/HOUR/MINUTE agree natively. A pipeline that pins
    THIS op's contract can swap engines under its calendar features.

    Physics: pure map-side projection (all JVM datetime intrinsics,
    codegen'd); the only cost is the scan.
    """
    ev = load(spark, sf_dir, "events").filter(F.col("event_id") <= 500)
    return ev.select(
        "event_id",
        F.year("ts").alias("y"),
        F.quarter("ts").alias("q"),
        F.weekofyear("ts").alias("iso_week"),
        F.dayofyear("ts").alias("doy"),
        (((F.dayofweek("ts") + 5) % 7) + 1).alias("iso_dow"),
        F.hour("ts").alias("hr"),
        F.minute("ts").alias("mi"),
        F.date_trunc("day", "ts").cast("date").alias("day"),
    )
