"""As-of join — the classic time-series operator Spark lacks natively.

Semantics: for each left row, the single right row with the same key and
the greatest right.ts ≤ left.ts (attribution, trades↔quotes, sensor
alignment). Implemented as a composition of built-in operators — union +
ignore-nulls window carry-forward — which costs exactly ONE shuffle on the
key (the same lower bound a native as-of join has). No Python in the path.

The demonstration query attributes each 'purchase' event to the user's
most recent 'view' event; the DuckDB oracle uses its native ASOF JOIN, so
the composition is verified against a first-class implementation.

Scale notes: one hash shuffle + one sort per side — identical shape to a
window query. Skewed keys (one user with millions of events) are the same
skew problem windows have; AQE skew handling or key-salting with
range-limited as-of both apply.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cpt_database_sync_spark.plans.registry import register
from cpt_database_sync_spark.sources.tables import load


def _asof_carry(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
    direction: str = "backward",
    tolerance_sec: int | None = None,
) -> DataFrame:
    """Shared one-shuffle as-of construction, both directions.

    Union the two sides with a tag ordering right rows *before* left rows
    in traversal order at equal timestamps (so ts-equality matches,
    mirroring `<=` / `>=`); traversal is ascending time for backward,
    descending for forward. The right row rides as ONE struct (payload
    columns + its timestamp ``_rts``): a struct of nulls is still
    non-null, so ``last(ignorenulls)`` carries all fields of the SAME
    nearest row — carrying columns independently would let a null payload
    value pair with a different row's timestamp. Output keeps ``_rts``
    (the matched right timestamp); callers drop it or derive lags.
    """
    lcols = [c for c in left.columns if c != key]
    struct_fields = [
        *[F.col(c) for c in right_payload],
        F.col(right_ts).alias("_rts"),
    ]
    null_struct_type = (
        "struct<"
        + ",".join(
            [f"{c}:{right.schema[c].dataType.simpleString()}" for c in right_payload]
            + [f"_rts:{right.schema[right_ts].dataType.simpleString()}"]
        )
        + ">"
    )
    tagged_left = left.select(
        F.col(key),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_tag"),
        *[F.col(c) for c in lcols if c != left_ts],
        F.lit(None).cast(null_struct_type).alias("_p"),
    )
    tagged_right = right.select(
        F.col(key),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_tag"),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in lcols
            if c != left_ts
        ],
        F.struct(*struct_fields).alias("_p"),
    )
    unioned = tagged_left.unionByName(tagged_right)
    order = F.col("_ts") if direction == "backward" else F.col("_ts").desc()
    w = (
        Window.partitionBy(key)
        .orderBy(order, "_tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = F.last("_p", ignorenulls=True).over(w).alias("_p")
    out = (
        unioned.select(
            key,
            F.col("_ts").alias(left_ts),
            "_tag",
            *[c for c in lcols if c != left_ts],
            carried,
        )
        .filter(F.col("_tag") == 1)
        .drop("_tag")
    )
    if tolerance_sec is not None:
        lag = F.unix_micros(F.col("_p._rts")) - F.unix_micros(F.col(left_ts))
        if direction == "backward":
            lag = -lag
        out = out.withColumn(
            "_p", F.when(lag <= tolerance_sec * 1_000_000, F.col("_p"))
        )
    return out.select(
        key,
        left_ts,
        *[c for c in lcols if c != left_ts],
        *[F.col(f"_p.{c}").alias(c) for c in right_payload],
        F.col("_p._rts").alias("_rts"),
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
) -> DataFrame:
    """Left as-of join: attach to each left row the latest right row with
    right_ts <= left_ts for the same key (null payload when none exists).
    See ``_asof_carry`` for the construction."""
    return _asof_carry(
        left, right, key, left_ts, right_ts, right_payload, direction="backward"
    ).drop("_rts")


@register(
    "join_asof",
    oracle="""
    SELECT
      p.user_id,
      p.ts AS purchase_ts,
      p.event_id AS purchase_id,
      v.event_id AS view_id,
      v.ts AS view_ts
    FROM (SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN
         (SELECT user_id, ts, event_id FROM events WHERE event_type = 'view') v
      ON p.user_id = v.user_id AND v.ts <= p.ts
    """,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attribution as-of join: each purchase matched to the user's most
    recent prior (or simultaneous) view. Oracle: DuckDB's native ASOF JOIN."""
    ev = load(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("purchase_id")
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id",
        F.col("ts").alias("view_ts_src"),
        F.col("event_id").alias("view_id"),
    )
    # carry both the view's id and its timestamp as payload
    views = views.select(
        "user_id",
        F.col("view_ts_src").alias("ts"),
        "view_id",
        F.col("view_ts_src").alias("view_ts"),
    )
    out = asof_join(
        purchases,
        views,
        key="user_id",
        left_ts="ts",
        right_ts="ts",
        right_payload=["view_id", "view_ts"],
    )
    return out.select(
        "user_id",
        F.col("ts").alias("purchase_ts"),
        "purchase_id",
        "view_id",
        "view_ts",
    )


@register(
    "agg_skew_salted",
    oracle="""
    SELECT
      CASE WHEN l_orderkey % 10 < 8 THEN 0 ELSE l_orderkey % 100 END AS hot_key,
      COUNT(*) AS n_rows,
      CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) AS DECIMAL(18,4)) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY 1
    """,
)
def agg_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation over a deliberately skewed key (80% of
    rows land on key 0).

    Phase 1 aggregates on (key, salt) — the hot key splits across
    SALT_BUCKETS reducers; phase 2 merges the partials per key. Decimal
    partials re-aggregate exactly, so the result equals the unsalted GROUP
    BY (the oracle). For skewed *joins* the same salt column pairs with an
    exploded small side; for plain aggregation Spark's map-side combine
    often suffices — salting is the explicit fallback when one reducer key
    still dominates.
    """
    SALT_BUCKETS = 16
    li = load(spark, sf_dir, "lineitem")
    hot_key = F.when(F.col("l_orderkey") % 10 < 8, F.lit(0).cast("bigint")).otherwise(
        F.col("l_orderkey") % 100
    )
    salted = li.select(
        hot_key.alias("hot_key"),
        (F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(SALT_BUCKETS))).alias(
            "salt"
        ),
        F.col("l_quantity").cast("decimal(12,4)").alias("qty"),
    )
    partial = salted.groupBy("hot_key", "salt").agg(
        F.count(F.lit(1)).alias("pn"), F.sum("qty").alias("pq")
    )
    return partial.groupBy("hot_key").agg(
        F.sum("pn").alias("n_rows"),
        F.sum("pq").cast("decimal(18,4)").cast("double").alias("sum_qty"),
    )


_SKEW_JOIN_ORACLE = """
    WITH dim AS (
      SELECT o_orderkey % 100 AS hot_key,
             CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS DOUBLE) AS sum_price
      FROM orders GROUP BY 1
    ),
    fact AS (
      SELECT CASE WHEN l_orderkey % 10 < 8 THEN 0 ELSE l_orderkey % 100 END AS hot_key,
             l_quantity
      FROM lineitem
    )
    SELECT f.hot_key,
           COUNT(*) AS n_rows,
           CAST(CAST(SUM(CAST(f.l_quantity AS DECIMAL(12,4))) AS DECIMAL(18,4)) AS DOUBLE) AS sum_qty,
           max(d.sum_price) AS dim_price
    FROM fact f JOIN dim d ON f.hot_key = d.hot_key
    GROUP BY f.hot_key
"""


@register("join_skew_salted", oracle=_SKEW_JOIN_ORACLE)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resistant equi-join: 80% of fact rows share one key.

    The standard salt/replicate decomposition: the fact side gets a
    deterministic salt in [0, SALT_BUCKETS); the dim side is exploded once
    per salt value, so the join key becomes (key, salt) and the hot key's
    rows spread over SALT_BUCKETS reducers instead of one straggler. The
    result is identical to the unsalted join (the oracle). At 100 TB this
    is the manual fallback when AQE's skew-join split (which handles most
    cases automatically) can't help — e.g. a shuffle-hash join whose build
    side AQE won't split, or pre-AQE engines.

    The dim side carries a MERGE hint: salting only matters on the
    *shuffled* path (a broadcast join has no reducer for the salt to
    split), so the plan is pinned to the sort-merge join the technique
    exists for — the fact shuffle hashes on (hot_key, salt), spreading the
    hot key across reducers. tests/test_plans.py gates this shape.
    """
    SALT_BUCKETS = 16
    o = load(spark, sf_dir, "orders")
    dim = (
        o.groupBy((F.col("o_orderkey") % 100).alias("hot_key"))
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(12,2)"))
            .cast("decimal(18,2)")
            .cast("double")
            .alias("sum_price")
        )
        # replicate each dim row once per salt bucket
        .withColumn(
            "salt", F.explode(F.array(*[F.lit(s) for s in range(SALT_BUCKETS)]))
        )
    )
    li = load(spark, sf_dir, "lineitem")
    hot_key = F.when(F.col("l_orderkey") % 10 < 8, F.lit(0).cast("bigint")).otherwise(
        F.col("l_orderkey") % 100
    )
    fact = li.select(
        hot_key.alias("hot_key"),
        (F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(SALT_BUCKETS)))
        .cast("int")
        .alias("salt"),
        F.col("l_quantity").cast("decimal(12,4)").alias("qty"),
    )
    joined = fact.join(dim.hint("merge"), ["hot_key", "salt"])
    return joined.groupBy("hot_key").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("qty").cast("decimal(18,4)").cast("double").alias("sum_qty"),
        F.max("sum_price").alias("dim_price"),
    )


#: AQE skew-split tuning for ``join_skew_aqe``. The skew detector's
#: defaults (256 MB partition threshold, factor 5) are sized for real
#: clusters; the demonstration fixture is a few MB, so the thresholds
#: scale down to make the SAME mechanism observably fire at test scale.
#: At 100 TB you would keep the defaults and drop every line except
#: (possibly) ``forceOptimizeSkewedJoin``.
#:
#: Two non-obvious preconditions, both discovered empirically and both
#: real at any scale:
#:  - Detection runs on COMPRESSED map-output bytes of the columns that
#:    SURVIVE pruning into the join shuffle. A hot partition whose only
#:    shuffled payload is the (constant) hot key itself LZ4-compresses
#:    hundreds-fold and can sit below any byte threshold — the fact
#:    side must actually carry payload bytes for the detector to see
#:    the skew (here: the quantity and extendedprice measures).
#:  - Split granularity is the MAP side: a skewed reduce partition is
#:    subdivided along mapper-output boundaries, so a shuffle fed by a
#:    single map task (this fixture's one-file parquet scan) cannot be
#:    split at all. At 100 TB a scan arrives as thousands of splits and
#:    this never binds; at fixture scale the fact side is repartitioned
#:    to SKEW_AQE_FACT_MAPPERS tasks first to restore the real shape.
SKEW_AQE_CONF: tuple[tuple[str, str], ...] = (
    ("spark.sql.adaptive.enabled", "true"),
    ("spark.sql.adaptive.skewJoin.enabled", "true"),
    ("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0"),
    ("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB"),
    ("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB"),
    # The join feeds a groupBy on the SAME key, so the skew split would
    # break the join output's partitioning guarantee the aggregate wants
    # to reuse; without force, OptimizeSkewedJoin declines. Forcing
    # trades one (tiny, post-aggregate-able) extra exchange for removing
    # the straggler — at 80 % hot-key concentration the straggler IS the
    # job's wall clock, so the trade is right whenever skew is this bad.
    ("spark.sql.adaptive.forceOptimizeSkewedJoin", "true"),
    # Pin the shuffled sort-merge path: a broadcast join has no reducer
    # partition for the splitter to act on (and AQE would happily
    # convert this small dim side at test scale).
    ("spark.sql.autoBroadcastJoinThreshold", "-1"),
    ("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1"),
)

#: Map tasks feeding the fact-side join shuffle at fixture scale (see
#: SKEW_AQE_CONF: split granularity is mapper boundaries).
SKEW_AQE_FACT_MAPPERS = 16

_SKEW_AQE_ORACLE = """
    WITH dim AS (
      SELECT o_orderkey % 100 AS hot_key,
             CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS DOUBLE) AS dim_price
      FROM orders GROUP BY 1
    ),
    fact AS (
      SELECT CASE WHEN l_orderkey % 10 < 8 THEN 0 ELSE l_orderkey % 100 END AS hot_key,
             l_quantity, l_extendedprice
      FROM lineitem
    )
    SELECT f.hot_key,
           COUNT(*) AS n_rows,
           CAST(CAST(SUM(CAST(f.l_quantity AS DECIMAL(12,4))) AS DECIMAL(18,4)) AS DOUBLE) AS sum_qty,
           CAST(CAST(SUM(CAST(f.l_extendedprice AS DECIMAL(14,2))) AS DECIMAL(20,2)) AS DOUBLE) AS sum_price_fact,
           max(d.dim_price) AS dim_price
    FROM fact f JOIN dim d ON f.hot_key = d.hot_key
    GROUP BY f.hot_key
"""


@register("join_skew_aqe", oracle=_SKEW_AQE_ORACLE)
def join_skew_aqe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME 80 %-hot-key join as ``join_skew_salted``, handled by
    Spark's own AQE skew-join split instead of manual salting — the
    mechanism a 100 TB deployment reaches for FIRST (VERDICT r8 next
    #3): at runtime AQE reads the shuffle map statistics, detects the
    oversized hot partition on the fact side, splits it into
    advisory-sized sub-partitions and replicates the matching dim
    partition across them — exactly the salt/replicate decomposition
    of ``join_skew_salted``, but derived from measured sizes with no
    query rewrite and no salt arity to guess. Result is identical to
    the plain join (the oracle is the plain-SQL join; the fact side
    additionally carries l_extendedprice so the hot shuffle partition
    holds real measure bytes — see SKEW_AQE_CONF on why a pruned-to-
    the-key shuffle hides the skew from the byte-based detector).

    Runs on ``spark.newSession()`` — same SparkContext, isolated SQL
    conf — so the scaled-down skew thresholds (see ``SKEW_AQE_CONF``)
    can never leak into the caller's session; the returned DataFrame
    carries its own session, so downstream ``collect()`` executes
    under these confs regardless of who triggers it.

    tests/test_plans.py gates that the split actually fires (the
    executed adaptive plan's sort-merge join is marked ``skew=true``)
    and that results match ``join_skew_salted`` row-for-row — when
    AQE alone suffices, prefer it; hand-salting remains for the cases
    it declines (shuffled-hash build sides, pre-AQE engines).
    """
    s2 = spark.newSession()
    for k, v in SKEW_AQE_CONF:
        s2.conf.set(k, v)
    o = load(s2, sf_dir, "orders")
    dim = o.groupBy((F.col("o_orderkey") % 100).alias("hot_key")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(12,2)"))
        .cast("decimal(18,2)")
        .cast("double")
        .alias("dim_price")
    )
    # Materialize the dim (≤100 rows). OptimizeSkewedJoin pattern-
    # matches SMJ(Sort(ShuffleStage), Sort(ShuffleStage)) with BOTH
    # shuffles ENSURE_REQUIREMENTS-origin; an in-flight aggregate whose
    # output partitioning already satisfies the join key leaves its
    # HashAggregate between Sort and stage and the rule silently
    # no-ops. A checkpointed dim — the realistic shape: dims arrive as
    # materialized tables — joins through a fresh join-key exchange the
    # rule can act on.
    dim = dim.localCheckpoint(eager=False)
    li = load(s2, sf_dir, "lineitem")
    hot_key = F.when(F.col("l_orderkey") % 10 < 8, F.lit(0).cast("bigint")).otherwise(
        F.col("l_orderkey") % 100
    )
    # Fixture artifact, not a scale pattern: multi-mapper input so the
    # skew splitter has map-output boundaries to cut along (a real
    # cluster scan has thousands of mappers and skips this exchange).
    fact = li.repartition(SKEW_AQE_FACT_MAPPERS).select(
        hot_key.alias("hot_key"),
        F.col("l_quantity").cast("decimal(12,4)").alias("qty"),
        F.col("l_extendedprice").cast("decimal(14,2)").alias("price"),
    )
    joined = fact.join(dim.hint("merge"), "hot_key")
    return joined.groupBy("hot_key").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("qty").cast("decimal(18,4)").cast("double").alias("sum_qty"),
        F.sum("price").cast("decimal(20,2)").cast("double").alias("sum_price_fact"),
        F.max("dim_price").alias("dim_price"),
    )


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
    tolerance_sec: int | None = None,
) -> DataFrame:
    """Forward as-of join: attach the EARLIEST right row with
    right_ts >= left_ts per key, optionally only within a tolerance
    window (beyond it the payload is null — any farther match is worse,
    so nulling the nearest is exact). See ``_asof_carry``."""
    return _asof_carry(
        left, right, key, left_ts, right_ts, right_payload,
        direction="forward", tolerance_sec=tolerance_sec,
    )


_FWD_TOL_DAYS = 3


@register(
    "join_asof_forward",
    oracle=f"""
    SELECT
      v.user_id,
      v.event_id AS view_id,
      v.ts AS view_ts,
      CASE WHEN p.ts <= v.ts + INTERVAL {_FWD_TOL_DAYS} DAY
           THEN p.event_id END AS next_purchase_id,
      CASE WHEN p.ts <= v.ts + INTERVAL {_FWD_TOL_DAYS} DAY
           THEN CAST(date_diff('second', v.ts, p.ts) AS BIGINT)
           END AS lag_sec
    FROM (SELECT user_id, ts, event_id FROM events WHERE event_type = 'view') v
    ASOF LEFT JOIN
         (SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase') p
      ON v.user_id = p.user_id AND p.ts >= v.ts
    """,
)
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion-lag as-of join: each view matched to the user's next
    purchase within {tol} days (forward direction + tolerance — the two
    as-of axes ``join_asof`` doesn't cover). Oracle: DuckDB native
    forward ASOF JOIN with the tolerance as a post-CASE (exact: any
    match farther than the nearest is also beyond tolerance)."""
    ev = load(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("event_id").alias("view_id")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("next_purchase_id")
    )
    out = asof_join_forward(
        views,
        purchases,
        key="user_id",
        left_ts="ts",
        right_ts="ts",
        right_payload=["next_purchase_id"],
        tolerance_sec=_FWD_TOL_DAYS * 86400,
    )
    return out.select(
        "user_id",
        "view_id",
        F.col("ts").alias("view_ts"),
        "next_purchase_id",
        # date_diff('second') truncates EACH side to seconds then
        # subtracts — mirror with per-side integer division, not a float
        # division of the micro difference (off by one near boundaries)
        (
            F.expr("unix_micros(_rts) div 1000000")
            - F.expr("unix_micros(ts) div 1000000")
        ).cast("bigint").alias("lag_sec"),
    )


_NEAREST_SQL = """
    WITH p AS (
      SELECT user_id, ts, event_id AS purchase_id
      FROM events WHERE event_type = 'purchase'
    ),
    v AS (
      SELECT user_id, ts AS view_ts, event_id AS view_id
      FROM events WHERE event_type = 'view'
    ),
    cand AS (
      SELECT p.user_id, p.ts, p.purchase_id, v.view_id, v.view_ts,
             abs(epoch_us(p.ts) - epoch_us(v.view_ts)) AS adt
      FROM p LEFT JOIN v ON p.user_id = v.user_id
    )
    SELECT user_id, ts AS purchase_ts, purchase_id, view_id, view_ts
    FROM cand
    QUALIFY row_number() OVER (
      PARTITION BY purchase_id ORDER BY adt, view_ts, view_id) = 1
"""


@register("join_asof_nearest", oracle=_NEAREST_SQL)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-in-time as-of join, either direction — the sensor-fusion
    matcher (pandas ``merge_asof(direction='nearest')``): each purchase
    takes whichever view is closest in time, before OR after, ties to
    the earlier view. Completes the as-of family: `join_asof` looks
    back, `join_asof_forward` looks ahead, this takes the min.

    Spark side: one backward carry + one forward carry (each a
    last-non-null window over the SAME user-keyed sort — the
    `_asof_carry` machinery both siblings use), then a per-row
    min-struct pick between the two candidates — O(n log n) in each
    user's events, never the all-pairs product (the ORACLE is the
    quadratic per-user cross join + rank, kept deliberately naive as a
    cross-check; per-user row counts make that affordable at oracle
    scale only). The tie-break struct (|Δt|, view_ts, view_id) is a
    total order, so the pick is deterministic on both engines.
    """
    ev = load(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("purchase_id")
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id",
        "ts",
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
    )
    both = None
    for direction in ("backward", "forward"):
        c = _asof_carry(
            purchases,
            views,
            key="user_id",
            left_ts="ts",
            right_ts="ts",
            right_payload=["view_id", "view_ts"],
            direction=direction,
        ).select("user_id", "ts", "purchase_id", "view_id", "view_ts")
        both = c if both is None else both.unionByName(c)
    adt = F.abs(F.unix_micros("view_ts") - F.unix_micros("ts"))
    ranked = both.withColumn(
        "_pick",
        F.struct(
            F.coalesce(adt, F.lit(2**62)).alias("adt"),
            F.coalesce(F.unix_micros("view_ts"), F.lit(2**62)).alias("vts"),
            F.coalesce("view_id", F.lit(2**62)).alias("vid"),
        ),
    )
    best = ranked.groupBy("user_id", "ts", "purchase_id").agg(
        F.min_by(F.struct("view_id", "view_ts"), F.col("_pick")).alias("m")
    )
    return best.select(
        "user_id",
        F.col("ts").alias("purchase_ts"),
        "purchase_id",
        F.col("m.view_id").alias("view_id"),
        F.col("m.view_ts").alias("view_ts"),
    )


ASOF_TOLERANCE_SEC = 3600


@register(
    "join_asof_tolerance",
    oracle=f"""
    SELECT
      p.user_id,
      p.ts AS purchase_ts,
      p.event_id AS purchase_id,
      CASE WHEN epoch_us(p.ts) - epoch_us(v.ts)
                <= CAST({ASOF_TOLERANCE_SEC} AS BIGINT) * 1000000
           THEN v.event_id END AS view_id,
      CASE WHEN epoch_us(p.ts) - epoch_us(v.ts)
                <= CAST({ASOF_TOLERANCE_SEC} AS BIGINT) * 1000000
           THEN v.ts END AS view_ts
    FROM (SELECT user_id, ts, event_id FROM events
          WHERE event_type = 'purchase') p
    ASOF LEFT JOIN
         (SELECT user_id, ts, event_id FROM events
          WHERE event_type = 'view') v
      ON p.user_id = v.user_id AND v.ts <= p.ts
    """,
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-lookback as-of join (pandas ``merge_asof(tolerance=…)``):
    the latest prior view counts only within {tol} s — beyond that the
    attribution window has closed and the match nulls out (stale
    attribution is the classic over-crediting bug this bound exists
    for). Same single-sort carry as `join_asof`; the tolerance is a
    post-carry filter on the carried timestamp, costing nothing extra.
    The streaming twin is `stream_join`'s interval condition — the
    tolerance IS what makes as-of state watermark-evictable at 100 TB
    (an unbounded lookback means unbounded state).
    """
    ev = load(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("purchase_id")
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id",
        "ts",
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
    )
    out = _asof_carry(
        purchases,
        views,
        key="user_id",
        left_ts="ts",
        right_ts="ts",
        right_payload=["view_id", "view_ts"],
        direction="backward",
        tolerance_sec=ASOF_TOLERANCE_SEC,
    )
    return out.select(
        "user_id",
        F.col("ts").alias("purchase_ts"),
        "purchase_id",
        "view_id",
        "view_ts",
    )
