"""User-defined function surface: scalar UDF, vectorized pandas UDF,
grouped-map applyInPandas.

The reference's only extension point is the per-type ``ReadFunction``
lambda (`sync/ReadMapping.java:24-38`, method refs like ``ResultSet::getLong``
at `sync/StandardReadMappings.java:67-69`) — engine-internal, not
user-facing. [TARGET] exposes the standard PySpark trio.

Scale notes: pandas UDFs move data JVM↔Python in Arrow batches (~10-100×
faster than row-at-a-time Python UDFs); the row UDF below exists to cover
the API surface and is deliberately kept off large inputs. The semantics of
each UDF are chosen order-insensitive (per-row math, group min/max/count)
so results are deterministic and SQL-oracle-checkable.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StringType

from cpt_database_sync_spark.plans.registry import register
from cpt_database_sync_spark.sources.tables import load


@F.pandas_udf(DoubleType())
def _discounted_price(price: pd.Series, discount: pd.Series) -> pd.Series:
    # per-row IEEE ops — identical to the SQL expression on both engines
    return price * (1.0 - discount)


@F.udf(StringType())
def _flag_word(flag: str) -> str:
    return {"R": "returned", "A": "acknowledged", "N": "none"}.get(flag, "unknown")


_UDF_SCALAR_ORACLE = """
    SELECT
      l_orderkey,
      l_linenumber,
      l_extendedprice * (1.0 - l_discount) AS discounted,
      CASE l_returnflag
        WHEN 'R' THEN 'returned'
        WHEN 'A' THEN 'acknowledged'
        WHEN 'N' THEN 'none'
        ELSE 'unknown' END AS flag_word
    FROM lineitem
    WHERE l_orderkey <= 500
    """


@register("udf_scalar", oracle=_UDF_SCALAR_ORACLE)
def udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized pandas UDF (Arrow path) + row-at-a-time Python UDF.

    Both compute SQL-expressible per-row functions so the oracle can verify
    the Python round-trip bit-for-bit.
    """
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 500)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        _discounted_price("l_extendedprice", "l_discount").alias("discounted"),
        _flag_word("l_returnflag").alias("flag_word"),
    )


@register(
    "udf_grouped",
    oracle="""
    SELECT
      l_returnflag,
      l_linestatus,
      COUNT(*) AS n_rows,
      min(l_quantity) AS min_qty,
      max(l_quantity) AS max_qty,
      min(l_extendedprice) AS min_price,
      max(l_extendedprice) AS max_price
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)
def udf_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map UDF (applyInPandas): per-group pandas computation.

    The group lands in one pandas DataFrame (the group must fit in executor
    memory — at 100 TB salt wide groups or pre-aggregate). min/max/count
    are order-insensitive, so the result is deterministic and
    oracle-checkable.
    """
    li = load(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"
    )

    def summarize(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "l_returnflag": [pdf["l_returnflag"].iloc[0]],
                "l_linestatus": [pdf["l_linestatus"].iloc[0]],
                "n_rows": [len(pdf)],
                "min_qty": [pdf["l_quantity"].min()],
                "max_qty": [pdf["l_quantity"].max()],
                "min_price": [pdf["l_extendedprice"].min()],
                "max_price": [pdf["l_extendedprice"].max()],
            }
        )

    return li.groupBy("l_returnflag", "l_linestatus").applyInPandas(
        summarize,
        schema=(
            "l_returnflag string, l_linestatus string, n_rows bigint, "
            "min_qty double, max_qty double, min_price double, max_price double"
        ),
    )


@register(
    "udf_map_partitions",
    oracle="""
    SELECT
      l_orderkey,
      l_linenumber,
      CAST(l_quantity / 50.0 AS DOUBLE) AS qty_norm
    FROM lineitem
    WHERE l_quantity > 25
    """,
)
def udf_map_partitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas: streaming per-partition transform in Arrow batches —
    the UDTF-ish shape (N rows in, M rows out: here a vectorized
    filter+project emitting fewer rows than it reads). The transform is
    row-wise, so the result is invariant to Arrow batch boundaries and
    exact-oracle-checkable; batch_summaries below keeps the
    batch-granularity demo."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )

    def heavy_lines(batches):
        for pdf in batches:
            keep = pdf[pdf["l_quantity"] > 25]
            yield pd.DataFrame(
                {
                    "l_orderkey": keep["l_orderkey"],
                    "l_linenumber": keep["l_linenumber"],
                    "qty_norm": keep["l_quantity"].astype("float64") / 50.0,
                }
            )

    return li.mapInPandas(
        heavy_lines, schema="l_orderkey bigint, l_linenumber int, qty_norm double"
    )


def batch_summaries(df: DataFrame) -> DataFrame:
    """One summary row per Arrow batch (batch boundaries are
    engine-internal — inherently non-deterministic output, kept as the
    per-batch mapInPandas demo, not a registered query)."""

    def batch_stats(batches):
        for pdf in batches:
            yield pd.DataFrame({"batch_rows": [len(pdf)]})

    return df.mapInPandas(batch_stats, schema="batch_rows bigint")


@register("udf_surface", oracle=_UDF_SCALAR_ORACLE)
def udf_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY.md §2B checklist key for the UDF trio; returns the
    pandas-UDF + Python-UDF projection (see also udf_grouped /
    udf_map_partitions for applyInPandas and mapInPandas)."""
    return udf_scalar(spark, sf_dir)


@register(
    "udaf_pandas",
    oracle="""
    SELECT l_returnflag,
           (max(l_extendedprice) + min(l_extendedprice)) / 2.0 AS midrange_price,
           max(l_quantity) - min(l_quantity) AS qty_spread
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def udaf_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-vectorized user-defined AGGREGATE (pandas_udf GROUPED_AGG):
    the missing quadrant of the UDF matrix (scalar / grouped-map /
    map-partitions / grouped-AGG). Each group's column arrives as one
    pandas Series and the UDAF returns a scalar — Spark runs it as a real
    aggregate expression (usable alongside built-ins in one ``agg`` call).

    Semantics are order-insensitive (midrange = (max+min)/2, spread =
    max-min) so the Python aggregation is deterministic and the SQL
    oracle checks it bit-for-bit. Scale note: GROUPED_AGG buffers each
    group per column — fine for bounded groups; unbounded groups should
    pre-aggregate or use a mergeable sketch instead.
    """

    @F.pandas_udf("double")
    def midrange(v: pd.Series) -> float:
        return (float(v.max()) + float(v.min())) / 2.0

    @F.pandas_udf("double")
    def spread(v: pd.Series) -> float:
        return float(v.max()) - float(v.min())

    li = load(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice", "l_quantity"
    )
    return li.groupBy("l_returnflag").agg(
        midrange("l_extendedprice").alias("midrange_price"),
        spread("l_quantity").alias("qty_spread"),
    )


@register(
    "udtf_surface",
    oracle="""
    SELECT doc_id, word, pos FROM (
      SELECT doc_id,
             unnest(string_split(text, ' ')) AS word,
             CAST(unnest(range(len(string_split(text, ' ')))) AS INT) AS pos
      FROM documents WHERE doc_id < 40
    ) WHERE word <> ''
    """,
)
def udtf_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark 4): a user-defined TABLE function expanded with
    LATERAL — the N-in/M-out extension point as a first-class SQL
    relation, completing the UDF matrix begun in udf_scalar.

    The UDTF tokenizes with position; the oracle replays it as
    unnest+range. Like the row UDF, a Python UDTF runs row-at-a-time in
    the Python worker — API-surface coverage, deliberately kept on a
    small slice; the vectorized production path for this exact job is
    the built-in split+posexplode (sequence_chunking) or mapInPandas.
    """
    from pyspark.sql.functions import udtf  # noqa: PLC0415

    @udtf(returnType="word: string, pos: int")
    class SplitWords:
        def eval(self, text: str):  # noqa: ANN001
            if text is None:
                return  # NULL text expands to no rows (oracle: unnest(NULL))
            for i, w in enumerate(text.split(" ")):
                if w:
                    yield w, i

    spark.udtf.register("split_words", SplitWords)
    load(spark, sf_dir, "documents").filter(F.col("doc_id") < 40).select(
        "doc_id", "text"
    ).createOrReplaceTempView("udtf_docs")
    return spark.sql(
        "SELECT d.doc_id, s.word, s.pos "
        "FROM udtf_docs d, LATERAL split_words(text) s"
    )


@register(
    "udf_map_arrow",
    oracle="""
    SELECT
      l_orderkey,
      l_linenumber,
      CAST(l_extendedprice * 0.9 AS DOUBLE) AS discounted
    FROM lineitem
    WHERE l_returnflag = 'R'
    """,
)
def udf_map_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow: the zero-copy lane below mapInPandas — the UDF
    receives raw ``pyarrow.RecordBatch``es with no pandas conversion at
    all, which matters when the payload is large binary/list columns
    (multimodal bytes, embeddings) where the pandas detour costs a copy
    per batch. Semantics here are a vectorized filter+project (pure
    Arrow compute kernels), row-wise and batch-invariant, so the SQL
    oracle checks it exactly like udf_map_partitions.
    """
    import pyarrow as pa  # noqa: PLC0415
    import pyarrow.compute as pc  # noqa: PLC0415

    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice", "l_returnflag"
    )

    def returned_lines(batches):
        for batch in batches:
            keep = pc.equal(batch.column(3), "R")
            filtered = batch.filter(keep)
            yield pa.RecordBatch.from_arrays(
                [
                    filtered.column(0),
                    filtered.column(1),
                    pc.multiply(filtered.column(2), 0.9),
                ],
                names=["l_orderkey", "l_linenumber", "discounted"],
            )

    return li.mapInArrow(
        returned_lines,
        schema="l_orderkey bigint, l_linenumber int, discounted double",
    )


_COGROUP_ORACLE = """
    SELECT
      p.event_id,
      p.user_id,
      CAST(p.value AS DOUBLE) AS purchase_value,
      (SELECT c.value FROM events c
       WHERE c.user_id = p.user_id
         AND c.event_type = 'click'
         AND c.ts <= p.ts
       ORDER BY c.ts DESC, c.event_id DESC
       LIMIT 1) AS last_click_value
    FROM events p
    WHERE p.event_type = 'purchase'
    """


@register("udf_cogrouped", oracle=_COGROUP_ORACLE)
def udf_cogrouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogrouped-map UDF — ``a.groupBy(k).cogroup(b.groupBy(k))
    .applyInPandas`` — the two-input lane of the UDF matrix: BOTH sides
    shuffle on the key and each Python worker receives the key's two
    pandas frames together. The canonical use is exactly this: a per-key
    ``pd.merge_asof`` (purchases ⟵ most recent prior click per user),
    the pandas spelling of operators/asof.py's union-trick as-of join.

    Determinism contract: clicks sort by (ts, event_id) so merge_asof's
    backward search resolves equal-timestamp ties to the max event_id —
    the same total order the oracle's ORDER BY ts DESC, event_id DESC
    LIMIT 1 picks. Users with no clicks get NULL (empty right frame);
    click-only users contribute zero rows.

    Scale: one shuffle per side keyed by user_id — the same exchange a
    join would pay — then per-key work is pandas-local. Skewed keys are
    the hazard (one key = one worker invocation); the JVM-side as-of in
    operators/asof.py is the preferred form precisely because it has no
    per-key materialization, but when per-key logic genuinely needs
    pandas (model scoring, curve fitting), THIS is the shape. Citation:
    the reference has no two-input operator at all — its one dataflow is
    single-table (`sync/QueryBuilder.java:46-75`).
    """
    ev = load(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    # The click side carries DISTINCT column names (c_*): both sides
    # descend from the same scan, and with identical names/attribute ids
    # Spark's CoGroup planning collapsed the right-side projection to the
    # key column alone at sf0.1 (worker frames arrived as ['user_id']) —
    # renaming gives the right side its own attributes and is also the
    # honest schema for a two-input operator.
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("c_event_id"),
        "user_id",
        F.col("ts").alias("c_ts"),
        F.col("value").alias("c_value"),
    )

    def asof_merge(purch: pd.DataFrame, clk: pd.DataFrame) -> pd.DataFrame:
        # Either side can arrive EMPTY — and an empty cogroup frame may
        # carry no columns at all (observed at sf0.1: a purchase-only
        # user's click frame has no 'ts' to sort on), so both degenerate
        # branches run before any column access, with explicit dtypes.
        if purch.empty:
            return pd.DataFrame(
                {
                    "event_id": pd.Series(dtype="int64"),
                    "user_id": pd.Series(dtype="int64"),
                    "purchase_value": pd.Series(dtype="float64"),
                    "last_click_value": pd.Series(dtype="float64"),
                }
            )
        purch = purch.sort_values("ts", kind="mergesort")
        if len(clk):
            clk = clk.sort_values(["c_ts", "c_event_id"], kind="mergesort")
            merged = pd.merge_asof(
                purch,
                clk[["c_ts", "c_value"]].rename(
                    columns={"c_ts": "ts", "c_value": "last_click_value"}
                ),
                on="ts",
                direction="backward",
            )
            last_click = merged["last_click_value"]
        else:
            merged = purch
            last_click = pd.Series([float("nan")] * len(purch), dtype="float64")
        return pd.DataFrame(
            {
                "event_id": merged["event_id"].to_numpy(),
                "user_id": merged["user_id"].to_numpy(),
                "purchase_value": merged["value"].to_numpy(),
                "last_click_value": last_click.to_numpy(),
            }
        )

    return (
        purchases.groupBy("user_id")
        .cogroup(clicks.groupBy("user_id"))
        .applyInPandas(
            asof_merge,
            schema=(
                "event_id bigint, user_id bigint, "
                "purchase_value double, last_click_value double"
            ),
        )
    )


@register("udf_scalar_iter", oracle=_UDF_SCALAR_ORACLE)
def udf_scalar_iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterator-of-batches pandas UDF (SCALAR_ITER) — the lane whose
    point is AMORTIZED PER-WORKER SETUP: the function body runs once per
    executor task, does its expensive initialization (model load,
    tokenizer build, dictionary mmap — here a stand-in lookup table),
    then streams Arrow batches through. A plain SCALAR pandas UDF
    re-enters per batch and would pay the setup each time; at 100 TB
    with a 2 GB model the difference is the job. Same oracle as
    udf_scalar — the per-row math is identical, only the execution
    contract differs, which is exactly what the shared oracle proves.
    """
    @F.pandas_udf(DoubleType())
    def discounted_iter(
        batches: Iterator[Tuple[pd.Series, pd.Series]],
    ) -> Iterator[pd.Series]:
        # once-per-task setup happens HERE (before the loop)
        one = 1.0
        for price, discount in batches:
            yield price * (one - discount)

    @F.pandas_udf(StringType())
    def flag_word_iter(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        words = {"R": "returned", "A": "acknowledged", "N": "none"}  # setup
        for flags in batches:
            yield flags.map(lambda f: words.get(f, "unknown"))

    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 500)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        discounted_iter("l_extendedprice", "l_discount").alias("discounted"),
        flag_word_iter("l_returnflag").alias("flag_word"),
    )
