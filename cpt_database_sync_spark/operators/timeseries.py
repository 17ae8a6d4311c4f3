"""Time-series diagnostics over the daily event rollup: autocorrelation,
CUSUM changepoint localization, and day-of-week seasonality — the
monitoring layer a metrics store runs ON the replicated data the
reference merely moves (`handler/Handler.java:42-55` is its whole
surface; it can copy an events table but answer nothing about it).

All three extend the exact-moment discipline of `trend_fit`
(operators/stats.py): ONE map-side-combined daily rollup, then moments
over |days|x|types|-sized data, exact integer/decimal accumulation, a
single correctly-rounded double conversion per moment, and an identical
IEEE closed form on both engines. Day numbering is epoch-day
(days since 1970-01-01) so day-of-week is the portable ``dn % 7``
(0 = Thursday) — Spark's ``dayofweek`` and DuckDB's ``dayofweek``
disagree on origin, the modulus does not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cpt_database_sync_spark.plans.registry import register
from cpt_database_sync_spark.session import bounded_cache
from cpt_database_sync_spark.sources.tables import load

# Autocorrelation horizon: one week of daily lags captures the weekly
# cycle the fixtures (and most product metrics) actually have.
ACF_MAX_LAG = 7

_EPOCH = "1970-01-01"


def _dn(ts_col: str = "ts") -> F.Column:
    """Epoch-day number of a timestamp column (exact integer)."""
    return F.datediff(F.col(ts_col).cast("date"), F.lit(_EPOCH).cast("date"))


_DAILY_COUNT_CTE = f"""
    daily AS (
      SELECT event_type,
             date_diff('day', DATE '{_EPOCH}', CAST(ts AS DATE)) AS dn,
             count(*) AS c
      FROM events GROUP BY 1, 2
    )
"""


_AUTOCORR_SQL = f"""
    WITH {_DAILY_COUNT_CTE},
    pairs AS (
      SELECT a.event_type, k.lag_k, a.c AS x, b.c AS y
      FROM daily a
      JOIN (SELECT unnest(range(1, {ACF_MAX_LAG} + 1)) AS lag_k) k ON TRUE
      JOIN daily b ON b.event_type = a.event_type AND b.dn = a.dn + k.lag_k
    ),
    m AS (
      SELECT event_type, lag_k,
             CAST(count(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(y * y) AS BIGINT) AS syy,
             CAST(SUM(x * y) AS BIGINT) AS sxy
      FROM pairs GROUP BY 1, 2
    )
    SELECT event_type,
           CAST(lag_k AS INT) AS lag_k,
           n AS n_pairs,
           round((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy)
                 / sqrt((n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx)
                        * (n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy)),
                 9) AS acf
    FROM m
"""


@register("autocorr_daily", oracle=_AUTOCORR_SQL)
def autocorr_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1..7 autocorrelation of the per-type daily event-count series
    — "does this metric have a weekly cycle" as the sample
    cross-correlation of the series against itself shifted k days
    (the ACF a forecasting pipeline inspects before picking a model).

    Days are paired by CALENDAR adjacency (dn and dn+k must both be
    observed), not by row position, so sparse series skip gaps rather
    than misalign across them. Counts are exact BIGINTs, every moment
    is an exact integer sum (magnitudes < 2^53 at any bench scale —
    at 1e9 events/day widen the moment lane to DECIMAL), the Pearson
    closed form runs in identical IEEE doubles on both engines, and a
    constant series (zero variance) yields NULL via try_divide — the
    same n*sxx-sx*sx=0 surface `trend_fit` pins.

    Physics: one map-side-combined count shuffle builds the daily
    rollup; the lag expansion (x7) and self-join run on |days|x|types|
    rows — broadcast-sized from sf0.001 through 100 TB, because the
    rollup never grows with raw volume, only with the calendar.
    """
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", _dn().alias("dn")).agg(
        F.count(F.lit(1)).alias("c")
    )
    lags = spark.range(1, ACF_MAX_LAG + 1).select(F.col("id").alias("lag_k"))
    a = daily.crossJoin(F.broadcast(lags))
    b = daily.select(
        F.col("event_type").alias("bt"), F.col("dn").alias("bdn"), F.col("c").alias("y")
    )
    pairs = a.join(
        b,
        (F.col("bt") == F.col("event_type"))
        & (F.col("bdn") == F.col("dn") + F.col("lag_k")),
    ).select("event_type", "lag_k", F.col("c").alias("x"), "y")
    m = pairs.groupBy("event_type", "lag_k").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxx = F.col("sxx").cast("double")
    syy = F.col("syy").cast("double")
    sxy = F.col("sxy").cast("double")
    acf = F.try_divide(
        n * sxy - sx * sy, F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    )
    return m.select(
        "event_type",
        F.col("lag_k").cast("int").alias("lag_k"),
        F.col("n").cast("long").alias("n_pairs"),
        F.round(acf, 9).alias("acf"),
    )


_CUSUM_SQL = f"""
    WITH {_DAILY_COUNT_CTE},
    tot AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n_days,
             CAST(SUM(c) AS BIGINT) AS total
      FROM daily GROUP BY 1
    ),
    walk AS (
      SELECT d.event_type, d.dn, t.n_days, t.total,
             CAST(SUM(d.c) OVER (PARTITION BY d.event_type ORDER BY d.dn
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS prefix,
             CAST(row_number() OVER (PARTITION BY d.event_type ORDER BY d.dn)
                  AS BIGINT) AS j
      FROM daily d JOIN tot t USING (event_type)
    ),
    scored AS (
      SELECT event_type, dn, n_days,
             n_days * prefix - j * total AS ns,
             row_number() OVER (
               PARTITION BY event_type
               ORDER BY abs(n_days * prefix - j * total) DESC, dn) AS rnk
      FROM walk
    )
    SELECT event_type, n_days, dn AS cp_dn, ns AS ns_at_cp
    FROM scored WHERE rnk = 1
"""


@register("cusum_changepoint", oracle=_CUSUM_SQL)
def cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint localization over the per-type daily count
    series: the day j maximizing |S_j| where S_j = prefix_j - j*mean is
    the cumulative deviation of the observed walk from a constant-rate
    one — the standard level-shift detector (Page's CUSUM) a volume
    monitor runs on every metric.

    Exactness without division: the statistic is emitted scaled by
    n_days (ns_j = n*prefix_j - j*total, an exact BIGINT), so the
    argmax — which is invariant under the positive scaling — needs no
    mean, no decimal, no rounding doctrine at all; both engines rank
    identical integers. Ties on |ns| break to the earliest day.
    A single observed day yields ns = 0 (no shift is detectable).

    Physics: the daily rollup is the only raw-data shuffle (map-side
    combined); the prefix walk and ranking window run on rollup-sized
    data clustered by the same event_type key, and the per-type totals
    join broadcasts. At 1e9 events/day the products stay < 2^63 until
    the calendar itself passes ~10^4 days of 10^14-count traffic.
    """
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", _dn().alias("dn")).agg(
        F.count(F.lit(1)).alias("c")
    )
    return cusum_finalize(daily)


def cusum_finalize(daily: DataFrame) -> DataFrame:
    """Shared CUSUM walk + argmax over a (event_type, dn, c) daily-count
    relation — the batch operator and its streaming serving twin
    (``stream_cusum``) both end here, so stream-maintained counts feed
    EXACTLY the batch expression tree (integer-exact, one oracle for
    both)."""
    tot = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"), F.sum("c").alias("total")
    )
    w = Window.partitionBy("event_type").orderBy("dn")
    walk = (
        daily.join(F.broadcast(tot), "event_type")
        .withColumn("prefix", F.sum("c").over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("j", F.row_number().over(w).cast("long"))
    )
    scored = walk.select(
        "event_type",
        "dn",
        F.col("n_days").cast("long").alias("n_days"),
        (F.col("n_days") * F.col("prefix") - F.col("j") * F.col("total")).alias("ns"),
    )
    rnk = Window.partitionBy("event_type").orderBy(F.abs(F.col("ns")).desc(), "dn")
    return (
        scored.withColumn("rnk", F.row_number().over(rnk))
        .filter(F.col("rnk") == 1)
        .select("event_type", "n_days", F.col("dn").alias("cp_dn"), F.col("ns").alias("ns_at_cp"))
    )


_SEASON_SQL = f"""
    WITH daily AS (
      SELECT event_type,
             date_diff('day', DATE '{_EPOCH}', CAST(ts AS DATE)) AS dn,
             CAST(SUM(CAST(value AS DECIMAL(14,6))) AS DECIMAL(20,6)) AS dv
      FROM events GROUP BY 1, 2
    ),
    per_dow AS (
      SELECT event_type, dn % 7 AS dow,
             CAST(count(*) AS BIGINT) AS n_days,
             CAST(SUM(dv) AS DECIMAL(28,6)) AS sum_d
      FROM daily GROUP BY 1, 2
    ),
    overall AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n_all,
             CAST(SUM(dv) AS DECIMAL(28,6)) AS total
      FROM daily GROUP BY 1
    )
    SELECT p.event_type,
           CAST(p.dow AS INT) AS dow,
           p.n_days,
           round(CAST(p.sum_d AS DOUBLE) / p.n_days, 9) AS dow_avg,
           round((CAST(p.sum_d AS DOUBLE) * o.n_all)
                 / (p.n_days * CAST(o.total AS DOUBLE)), 9) AS season_idx
    FROM per_dow p JOIN overall o USING (event_type)
"""


@register("seasonality_dow", oracle=_SEASON_SQL)
def seasonality_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonal index per event type: mean daily value-sum
    on each weekday divided by the overall mean daily value-sum — the
    multiplicative seasonal profile (>1 = hot day) that feeds both
    seasonal adjustment and anomaly baselines (TimescaleDB-style
    time_bucket analytics the reference's copy loop cannot answer).

    dow is the portable ``epoch_day % 7`` (0 = Thursday): Spark and
    DuckDB number weekdays differently, the modulus is engine-free.
    Exactness: daily sums accumulate in the DECIMAL(14,6)->(20,6) lane
    (order-insensitive), per-dow and overall sums widen to (28,6) whose
    unscaled values stay < 2^53 at bench scales (the numeric.py
    emission rule; widen and rescale at larger SFs), then ONE double
    conversion per moment and the identical-IEEE ratio
    (sum_d*n_all)/(n_days*total) — algebraically (dow mean)/(grand
    mean) without ever dividing decimals. A type whose value column is
    entirely NULL propagates NULL through SUM to both ratios on both
    engines; try_divide covers the degenerate zero-total corpus.

    Physics: one map-side-combined rollup shuffle; both re-aggregations
    and the final join are |days|x|types|-sized; the overall relation
    broadcasts.
    """
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", _dn().alias("dn")).agg(
        F.sum(F.col("value").cast("decimal(14,6)")).cast("decimal(20,6)").alias("dv")
    )
    per_dow = daily.groupBy(
        "event_type", (F.col("dn") % 7).alias("dow")
    ).agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("dv").cast("decimal(28,6)").alias("sum_d"),
    )
    overall = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_all"),
        F.sum("dv").cast("decimal(28,6)").alias("total"),
    )
    j = per_dow.join(F.broadcast(overall), "event_type")
    sum_d = F.col("sum_d").cast("double")
    total = F.col("total").cast("double")
    return j.select(
        "event_type",
        F.col("dow").cast("int").alias("dow"),
        F.col("n_days").cast("long").alias("n_days"),
        F.round(F.try_divide(sum_d, F.col("n_days")), 9).alias("dow_avg"),
        F.round(
            F.try_divide(sum_d * F.col("n_all"), F.col("n_days") * total), 9
        ).alias("season_idx"),
    )


# Centered moving-average half-width for the additive decomposition:
# ±3 days = the 7-day window that absorbs exactly one weekly cycle, so
# the trend line is seasonality-free by construction (the classical
# decompose choice for daily data with weekly period).
DECOMP_HALF = 3

_DECOMP_SQL = f"""
    WITH {_DAILY_COUNT_CTE},
    t AS (
      SELECT event_type, dn, c,
             SUM(c) OVER (PARTITION BY event_type ORDER BY dn
                          RANGE BETWEEN {DECOMP_HALF} PRECEDING
                                AND {DECOMP_HALF} FOLLOWING) AS t7,
             COUNT(*) OVER (PARTITION BY event_type ORDER BY dn
                            RANGE BETWEEN {DECOMP_HALF} PRECEDING
                                  AND {DECOMP_HALF} FOLLOWING) AS k7
      FROM daily
    ),
    full7 AS (
      SELECT event_type, dn, c, t7, 7 * c - t7 AS detr7
      FROM t WHERE k7 = 7
    ),
    season AS (
      SELECT event_type, dn % 7 AS dow,
             CAST(SUM(detr7) AS BIGINT) AS s_num,
             CAST(COUNT(*) AS BIGINT) AS s_den
      FROM full7 GROUP BY 1, 2
    )
    SELECT f.event_type,
           CAST(f.dn AS BIGINT) AS dn,
           CAST(f.c AS BIGINT) AS n_events,
           CAST(f.t7 AS BIGINT) AS trend7,
           round(CAST(f.t7 AS DOUBLE) / 7, 9) AS trend,
           round(CAST(s.s_num AS DOUBLE) / (7 * s.s_den), 9) AS seasonal,
           round(CAST(f.c AS DOUBLE)
                 - CAST(f.t7 AS DOUBLE) / 7
                 - CAST(s.s_num AS DOUBLE) / (7 * s.s_den), 9) AS resid
    FROM full7 f JOIN season s
      ON s.event_type = f.event_type AND s.dow = f.dn % 7
"""


@register("seasonal_decompose", oracle=_DECOMP_SQL)
def seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical ADDITIVE decomposition of the per-type daily count
    series — count = trend + seasonal + residual — the standard first
    look at any product metric (statsmodels' seasonal_decompose with a
    7-day period): trend is the centered 7-day moving average, the
    seasonal component is the mean detrended value per day-of-week,
    and what's left is the residual an alerting pipeline thresholds
    (`anomaly_zscore`'s input, with the calendar structure removed —
    `seasonality_dow` reports the weekly SHAPE, this one removes it
    from the series).

    Exactness (the module discipline): the 7-day window is a
    calendar-RANGE frame over epoch-day dn with an explicit
    completeness count, so sparse series drop incomplete/gapped
    windows rather than average the wrong days; trend and the
    detrended series stay in scaled-integer lanes (t7 = window sum,
    detr7 = 7·c − t7 — no division until display), the per-DOW
    seasonal means are exact integer (num, den) pairs, and every
    displayed double is ONE identical IEEE expression on exact ints,
    rounded to 9 dp on both engines.

    Physics: one map-side-combined daily rollup; the window pass and
    the DOW aggregation run over |days|×|types| rows (calendar-sized,
    broadcast-scale at any corpus volume); the season join is a
    broadcast. Nothing rescans raw events after the rollup.
    """
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", _dn().alias("dn")).agg(
        F.count(F.lit(1)).alias("c")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("dn")
        .rangeBetween(-DECOMP_HALF, DECOMP_HALF)
    )
    # full7 feeds BOTH the output join and the season aggregate; cut
    # lineage here (calendar-sized relation, the _trade_flows
    # discipline) so raw events are scanned exactly once — plan-gated.
    full7 = (
        daily.withColumn("t7", F.sum("c").over(w))
        .withColumn("k7", F.count(F.lit(1)).over(w))
        .filter(F.col("k7") == 7)
        .withColumn("detr7", F.lit(7) * F.col("c") - F.col("t7"))
        .localCheckpoint(eager=False)
    )
    # fresh attribute names on the aggregate side: season shares lineage
    # with full7, so a name-keyed equality would resolve both sides to
    # the SAME attribute (trivially-true predicate) — the bfs_hops
    # aliasing discipline
    season = (
        full7.groupBy("event_type", (F.col("dn") % 7).alias("dow"))
        .agg(
            F.sum("detr7").cast("bigint").alias("s_num"),
            F.count(F.lit(1)).cast("bigint").alias("s_den"),
        )
        .select(
            F.col("event_type").alias("s_et"), "dow", "s_num", "s_den"
        )
    )
    j = full7.join(
        F.broadcast(season),
        (F.col("event_type") == F.col("s_et"))
        & (F.col("dn") % 7 == F.col("dow")),
    )
    trend_d = F.col("t7").cast("double") / 7
    seas_d = F.col("s_num").cast("double") / (F.lit(7) * F.col("s_den"))
    return j.select(
        "event_type",
        F.col("dn").cast("long").alias("dn"),
        F.col("c").cast("long").alias("n_events"),
        F.col("t7").cast("long").alias("trend7"),
        F.round(trend_d, 9).alias("trend"),
        F.round(seas_d, 9).alias("seasonal"),
        F.round(F.col("c").cast("double") - trend_d - seas_d, 9).alias("resid"),
    )


# Holt double-exponential smoothing: level/trend smoothing factors and
# the forecast horizon. 0.5 is exactly representable in binary, so the
# per-step arithmetic stays in the "identical IEEE op on identical
# operands" regime with no representation error in the constants.
HOLT_ALPHA = 0.5
HOLT_BETA = 0.5
HOLT_H = 7

_HOLT_SQL = f"""
    WITH RECURSIVE {_DAILY_COUNT_CTE},
    seq AS (
      SELECT event_type,
             row_number() OVER (PARTITION BY event_type ORDER BY dn) AS i,
             CAST(c AS DOUBLE) AS x
      FROM daily WHERE dn IS NOT NULL AND event_type IS NOT NULL
    ),
    h(event_type, i, l, b) AS (
      SELECT event_type, i, x, CAST(0 AS DOUBLE) FROM seq WHERE i = 1
      UNION ALL
      SELECT s.event_type, s.i,
             CAST({HOLT_ALPHA} AS DOUBLE) * s.x
               + CAST({1 - HOLT_ALPHA} AS DOUBLE) * (h.l + h.b),
             CAST({HOLT_BETA} AS DOUBLE)
               * ((CAST({HOLT_ALPHA} AS DOUBLE) * s.x
                   + CAST({1 - HOLT_ALPHA} AS DOUBLE) * (h.l + h.b)) - h.l)
               + CAST({1 - HOLT_BETA} AS DOUBLE) * h.b
      FROM h JOIN seq s ON s.event_type = h.event_type AND s.i = h.i + 1
    ),
    fin AS (SELECT event_type, MAX(i) AS n_days FROM seq GROUP BY event_type)
    SELECT f.event_type,
           CAST(f.n_days AS BIGINT) AS n_days,
           h.l AS level,
           h.b AS trend,
           h.l + {HOLT_H} * h.b AS forecast_h
    FROM fin f
    JOIN h ON h.event_type = f.event_type AND h.i = f.n_days
"""


@register("holt_linear_forecast", oracle=_HOLT_SQL)
def holt_linear_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double-exponential smoothing over the per-type daily count
    series — the forecasting step that completes the time-series family
    (autocorr finds the cycle, seasonality/decompose isolate it, CUSUM
    localizes shifts; THIS extrapolates): level l_t = α·x_t +
    (1−α)·(l_{t−1}+b_{t−1}), trend b_t = β·(l_t−l_{t−1}) + (1−β)·b_{t−1},
    h-step forecast l_n + h·b_n. Initialization l_1 = x_1, b_1 = 0 (the
    zero-trend start; the x_2−x_1 variant differs only in a constant
    exponential decay). Gaps in the series are fold steps like any other
    observation (gap-blind smoothing, the standard business-series
    treatment — `gapfill_daily` is the densify lane when spacing must be
    physical).

    Exactness (the `running_balance_clamped` doctrine): exponential
    smoothing is a non-associative ordered FOLD — no prefix-sum
    decomposition exists, window functions cannot express it — so both
    engines replay the IDENTICAL sequential IEEE recurrence over the
    dn-sorted daily counts: Spark as a HOF ``aggregate`` fold, the
    oracle as a RECURSIVE CTE stepping i → i+1 (α = β = 0.5 are exact
    binary constants), giving bit-equal level/trend/forecast with no
    decimal lane and no display rounding. The oracle deliberately does
    NOT use DuckDB ``list_reduce``: v1.0.0 updates the accumulator
    struct field-by-field IN PLACE, so a later field's expression sees
    an earlier field's NEW value (probed: two identical field
    expressions evaluate to different results) — the recursive CTE has
    no such write-order semantics. NULL-day rows (null ts) have no
    position in a time series, and NULL-type rows no series identity
    (the oracle's equi-joins would drop the NULL group Spark's groupBy
    keeps) — both are out of contract on both sides (also sidestepping
    the Spark-NULLS-FIRST / DuckDB-NULLS-LAST sort divergence).

    Physics: one map-side-combined daily rollup is the only corpus-
    sized stage; the fold runs over each type's |days|-length array —
    calendar-sized, thousands of steps at most at any corpus volume.
    Unbounded-key deployments run the same recurrence as stateful
    streaming (one (l, b) state row per key, `stream_stateful`'s shape).
    """
    ev = load(spark, sf_dir, "events")
    daily = (
        ev.groupBy("event_type", _dn().alias("dn"))
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("dn").isNotNull() & F.col("event_type").isNotNull())
    )
    newl = (
        f"CAST({HOLT_ALPHA} AS DOUBLE) * x"
        f" + CAST({1 - HOLT_ALPHA} AS DOUBLE) * (acc.l + acc.b)"
    )
    fold = F.expr(
        f"""
        aggregate(
          transform(sort_array(collect_list(struct(dn, c))),
                    s -> CAST(s.c AS DOUBLE)),
          named_struct('l', CAST(0 AS DOUBLE), 'b', CAST(0 AS DOUBLE),
                       'n', CAST(0 AS BIGINT)),
          (acc, x) -> CASE WHEN acc.n = 0
            THEN named_struct('l', x, 'b', CAST(0 AS DOUBLE),
                              'n', CAST(1 AS BIGINT))
            ELSE named_struct(
              'l', {newl},
              'b', CAST({HOLT_BETA} AS DOUBLE) * (({newl}) - acc.l)
                   + CAST({1 - HOLT_BETA} AS DOUBLE) * acc.b,
              'n', acc.n + 1)
          END)
        """
    )
    return daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        fold.alias("st"),
    ).select(
        "event_type",
        "n_days",
        F.col("st.l").alias("level"),
        F.col("st.b").alias("trend"),
        (F.col("st.l") + F.lit(HOLT_H) * F.col("st.b")).alias("forecast_h"),
    )


# Scalar Kalman filter (random-walk state, noisy observation): process
# variance Q and observation variance R are exact binary constants so
# the per-step arithmetic stays in the identical-IEEE-ops regime.
KALMAN_Q = 0.25
KALMAN_R = 1.0

_KALMAN_STEP = {
    # the predicted variance, gain, level and posterior variance — ONE
    # canonical expression text per quantity, substituted into both the
    # Spark HOF fold and the recursive-CTE oracle so the two engines
    # run the IDENTICAL IEEE op sequence (the holt_linear_forecast
    # doctrine). {p}/{l}/{x} are the accumulator/observation slots.
    "pp": f"({{p}} + CAST({KALMAN_Q} AS DOUBLE))",
    "k": f"(({{p}} + CAST({KALMAN_Q} AS DOUBLE))"
    f" / (({{p}} + CAST({KALMAN_Q} AS DOUBLE)) + CAST({KALMAN_R} AS DOUBLE)))",
}
_KALMAN_L = "({l} + {k} * ({x} - {l}))"
_KALMAN_P = "((CAST(1 AS DOUBLE) - {k}) * {pp})"


def _kalman_exprs(l: str, p: str, x: str) -> tuple[str, str, str]:
    """(l', p', k) step expressions over accumulator slots l, p and
    observation x — one definition feeding both engines."""
    pp = _KALMAN_STEP["pp"].format(p=p)
    k = _KALMAN_STEP["k"].format(p=p)
    return (
        _KALMAN_L.format(l=l, k=k, x=x),
        _KALMAN_P.format(k=k, pp=pp),
        k,
    )


def _kalman_sql() -> str:
    nl, np_, nk = _kalman_exprs("h.l", "h.p", "s.x")
    return f"""
    WITH RECURSIVE {_DAILY_COUNT_CTE},
    seq AS (
      SELECT event_type,
             row_number() OVER (PARTITION BY event_type ORDER BY dn) AS i,
             CAST(c AS DOUBLE) AS x
      FROM daily WHERE dn IS NOT NULL AND event_type IS NOT NULL
    ),
    h(event_type, i, l, p, k) AS (
      SELECT event_type, i, x, CAST(1 AS DOUBLE), CAST(0 AS DOUBLE)
      FROM seq WHERE i = 1
      UNION ALL
      SELECT s.event_type, s.i, {nl}, {np_}, {nk}
      FROM h JOIN seq s ON s.event_type = h.event_type AND s.i = h.i + 1
    ),
    fin AS (SELECT event_type, MAX(i) AS n_days FROM seq GROUP BY event_type)
    SELECT f.event_type,
           CAST(f.n_days AS BIGINT) AS n_days,
           h.l AS level,
           h.p AS var_post,
           h.k AS gain
    FROM fin f
    JOIN h ON h.event_type = f.event_type AND h.i = f.n_days
"""


@register("kalman_filter_1d", oracle=_kalman_sql())
def kalman_filter_1d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar Kalman filter over the per-type daily count series — the
    optimal-gain counterpart to the FIXED-gain smoothers already in the
    family (`ewma_smoothing` α is constant; `holt_linear_forecast` adds
    a trend but keeps α, β constant): random-walk state with process
    noise Q and observation noise R, per step the predicted variance
    pp = p + Q sets the gain k = pp/(pp+R), the level moves k of the
    way to the observation, and the posterior variance contracts to
    (1−k)·pp. The gain therefore ANNEALS — large while the estimate is
    uncertain, converging to the steady-state Riccati fixed point — the
    standard sensor-fusion / metric-denoising primitive. Init l₁ = x₁,
    p₁ = 1, k₁ = 0.

    Exactness: a non-associative ordered fold, same doctrine as
    `holt_linear_forecast` — Spark replays it as a HOF ``aggregate``
    over the dn-sorted daily array, the oracle as a recursive CTE
    stepping i → i+1, and BOTH substitute the same canonical step
    expression text (``_kalman_exprs``) so each step runs the identical
    IEEE op sequence and the outputs are bit-equal raw doubles (Q, R
    are exact binary constants; no list_reduce — DuckDB v1.0.0 mutates
    struct accumulators field-by-field). NULL-day / NULL-type rows are
    out of contract on both sides as in every series op.

    Physics: one map-side-combined daily rollup is the only
    corpus-sized stage; the fold is calendar-sized per type. Unbounded
    keys run the recurrence as stateful streaming ((l, p) state row per
    key — `stream_holt`'s shape).

    Reference has no time-series surface at all (SURVEY §2B); this is
    BASELINE-mandated analytics closure.
    """
    ev = load(spark, sf_dir, "events")
    daily = (
        ev.groupBy("event_type", _dn().alias("dn"))
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("dn").isNotNull() & F.col("event_type").isNotNull())
    )
    nl, np_, nk = _kalman_exprs("acc.l", "acc.p", "x")
    fold = F.expr(
        f"""
        aggregate(
          transform(sort_array(collect_list(struct(dn, c))),
                    s -> CAST(s.c AS DOUBLE)),
          named_struct('l', CAST(0 AS DOUBLE), 'p', CAST(0 AS DOUBLE),
                       'k', CAST(0 AS DOUBLE), 'n', CAST(0 AS BIGINT)),
          (acc, x) -> CASE WHEN acc.n = 0
            THEN named_struct('l', x, 'p', CAST(1 AS DOUBLE),
                              'k', CAST(0 AS DOUBLE), 'n', CAST(1 AS BIGINT))
            ELSE named_struct('l', {nl}, 'p', {np_}, 'k', {nk},
                              'n', acc.n + 1)
          END)
        """
    )
    return daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        fold.alias("st"),
    ).select(
        "event_type",
        "n_days",
        F.col("st.l").alias("level"),
        F.col("st.p").alias("var_post"),
        F.col("st.k").alias("gain"),
    )


_THEIL_SEN_SQL = f"""
    WITH {_DAILY_COUNT_CTE},
    d AS (
      SELECT event_type, dn, CAST(c AS DOUBLE) AS x
      FROM daily WHERE dn IS NOT NULL AND event_type IS NOT NULL
    ),
    slopes AS (
      SELECT a.event_type,
             (b.x - a.x) / CAST(b.dn - a.dn AS DOUBLE) AS s
      FROM d a JOIN d b
        ON a.event_type = b.event_type AND a.dn < b.dn
    ),
    fit AS (
      SELECT event_type,
             COUNT(*) AS n_pairs,
             quantile_cont(s, 0.5) AS slope
      FROM slopes GROUP BY event_type
    )
    SELECT f.event_type,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(MAX(f.n_pairs) AS BIGINT) AS n_pairs,
           MAX(f.slope) AS slope,
           quantile_cont(d.x - f.slope * CAST(d.dn AS DOUBLE), 0.5)
             AS intercept
    FROM fit f JOIN d ON d.event_type = f.event_type
    GROUP BY f.event_type
"""


@register("theil_sen_trend", oracle=_THEIL_SEN_SQL)
def theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend per event type — the median of all
    pairwise slopes over the daily count series, with the median-
    residual intercept: the robust counterpart to `trend_fit`'s OLS
    (29% breakdown point — a spiked day drags a least-squares slope but
    not the slope MEDIAN), the standard trend estimator for noisy ops
    series.

    Exactness: each pairwise slope is one exact-integer-count
    subtraction and one IEEE division; the median is the same
    ``percentile`` ↔ ``quantile_cont`` interpolation pairing
    `agg_percentile` pins; the intercept pass reuses the now-scalar
    slope per type (one broadcast join), so every float op runs on
    identical operands in identical order — raw doubles, no rounding
    hedge. NULL-day/-type rows are out of series contract as in every
    ts op.

    Physics: the pair join runs over the DAILY relation — calendar-
    sized (|days|² per type, ~400 pairs per type-month), never the
    corpus; one map-side-combined rollup is the only corpus-sized
    stage, and the intercept join broadcasts a |types|-row fit
    relation. At planetary day counts (10⁴ days = 5·10⁷ pairs/key) the
    same shape holds; beyond that the repeated-median variant samples
    pairs per point — documented swap, not needed at any realistic
    calendar span.
    """
    ev = load(spark, sf_dir, "events")
    daily = (
        ev.groupBy("event_type", _dn().alias("dn"))
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("dn").isNotNull() & F.col("event_type").isNotNull())
        .select("event_type", "dn", F.col("c").cast("double").alias("x"))
    )
    daily = bounded_cache("theil_sen.daily", daily)
    a = daily.alias("a")
    b = daily.alias("b")
    slopes = a.join(
        b,
        (F.col("a.event_type") == F.col("b.event_type"))
        & (F.col("a.dn") < F.col("b.dn")),
    ).select(
        F.col("a.event_type").alias("event_type"),
        (
            (F.col("b.x") - F.col("a.x"))
            / (F.col("b.dn") - F.col("a.dn")).cast("double")
        ).alias("s"),
    )
    fit = slopes.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.percentile("s", 0.5).alias("slope"),
    ).withColumnRenamed("event_type", "f_et")
    j = daily.join(
        F.broadcast(fit), F.col("event_type") == F.col("f_et")
    )
    return j.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.max("n_pairs").cast("long").alias("n_pairs"),
        F.max("slope").alias("slope"),
        F.percentile(
            F.col("x") - F.col("slope") * F.col("dn").cast("double"), 0.5
        ).alias("intercept"),
    )


ROLLCORR_DAYS = 14  # trailing window width (calendar RANGE frame)

_ROLLCORR_EXPR = (
    "round((CAST(k AS DOUBLE) * CAST(sxy AS DOUBLE)"
    " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
    " / NULLIF(sqrt((CAST(k AS DOUBLE) * CAST(sxx AS DOUBLE)"
    " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
    " * (CAST(k AS DOUBLE) * CAST(syy AS DOUBLE)"
    " - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), CAST(0 AS DOUBLE)), 9)"
)

_ROLLCORR_SQL = f"""
    WITH daily AS (
      SELECT date_diff('day', DATE '{_EPOCH}', CAST(ts AS DATE)) AS dn,
             SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS x,
             SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS y
      FROM events WHERE ts IS NOT NULL
      GROUP BY 1
    ),
    win AS (
      SELECT dn, x, y,
             COUNT(*) OVER w AS k,
             SUM(x) OVER w AS sx, SUM(y) OVER w AS sy,
             SUM(CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0))) OVER w AS sxx,
             SUM(CAST(y AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0))) OVER w AS syy,
             SUM(CAST(x AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0))) OVER w AS sxy
      FROM daily
      WINDOW w AS (ORDER BY dn
                   RANGE BETWEEN {ROLLCORR_DAYS - 1} PRECEDING AND CURRENT ROW)
    )
    SELECT CAST(dn AS BIGINT) AS dn,
           CAST(x AS BIGINT) AS clicks,
           CAST(y AS BIGINT) AS purchases,
           {_ROLLCORR_EXPR} AS corr14
    FROM win WHERE k = {ROLLCORR_DAYS}
"""


@register("rolling_corr", oracle=_ROLLCORR_SQL)
def rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing {ROLLCORR_DAYS}-day Pearson correlation between the
    click and purchase daily series — the co-movement monitor behind
    "did conversions decouple from traffic?" alerts (`autocorr_daily`
    correlates a series with itself; this correlates two): r =
    (kΣxy − ΣxΣy) / √((kΣx² − (Σx)²)(kΣy² − (Σy)²)) over a calendar
    RANGE frame with an explicit completeness gate, so sparse/gapped
    calendars drop incomplete windows rather than correlate the wrong
    days (the seasonal_decompose discipline).

    Exactness: daily counts are exact ints; all six window sums are
    exact (products in DECIMAL(19,0)² — BIGINT x·y overflows near 3e9
    events/day at deployment scale); the one display expression (four
    subtractions, a multiply, a correctly-rounded IEEE sqrt, one
    division) is the identical tree on both engines (shared
    _ROLLCORR_EXPR text), NULL on a zero-variance window. Spark's own
    ``corr`` window aggregate is NOT used: its streaming accumulation
    is float-order-dependent, unverifiable bit-for-bit.

    Physics: one map-side-combined daily rollup is the only
    corpus-sized stage; the window runs over the |days|-sized calendar
    relation (an unpartitioned window is correct HERE because the input
    is calendar-sized, never the corpus — same argument as
    seasonal_decompose's trend pass). NULL ts rows carry no calendar
    position and are out of contract on both sides.
    """
    ev = load(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    # when/otherwise, not a bare boolean cast: NULL event_type must count
    # 0 like the oracle's CASE (a NULL-typed day would otherwise sum NULL)
    daily = ev.groupBy(_dn().alias("dn")).agg(
        F.sum(
            F.when(F.col("event_type") == "click", 1).otherwise(0)
        ).alias("x"),
        F.sum(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("y"),
    )
    w = Window.orderBy("dn").rangeBetween(-(ROLLCORR_DAYS - 1), 0)
    xd = F.col("x").cast("decimal(19,0)")
    yd = F.col("y").cast("decimal(19,0)")
    win = daily.select(
        "dn",
        "x",
        "y",
        F.count(F.lit(1)).over(w).alias("k"),
        F.sum("x").over(w).alias("sx"),
        F.sum("y").over(w).alias("sy"),
        F.sum(xd * xd).over(w).alias("sxx"),
        F.sum(yd * yd).over(w).alias("syy"),
        F.sum(xd * yd).over(w).alias("sxy"),
    )
    return win.filter(F.col("k") == ROLLCORR_DAYS).select(
        F.col("dn").cast("long").alias("dn"),
        F.col("x").cast("long").alias("clicks"),
        F.col("y").cast("long").alias("purchases"),
        F.expr(_ROLLCORR_EXPR).alias("corr14"),
    )


XCORR_MAX_LAG = 7  # sweep purchase-vs-click alignment over ±7 days

_XCORR_EXPR = (
    "round((CAST(k AS DOUBLE) * CAST(sxy AS DOUBLE)"
    " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
    " / NULLIF(sqrt((CAST(k AS DOUBLE) * CAST(sxx AS DOUBLE)"
    " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
    " * (CAST(k AS DOUBLE) * CAST(syy AS DOUBLE)"
    " - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), CAST(0 AS DOUBLE)), 9)"
)

_XCORR_SQL = f"""
    WITH daily AS (
      SELECT date_diff('day', DATE '{_EPOCH}', CAST(ts AS DATE)) AS dn,
             SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS x,
             SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS y
      FROM events WHERE ts IS NOT NULL
      GROUP BY 1
    ),
    lags AS (SELECT (i - {XCORR_MAX_LAG}) AS lag
             FROM range({2 * XCORR_MAX_LAG + 1}) t(i)),
    pairs AS (
      SELECT l.lag, a.x, b.y
      FROM lags l
      JOIN daily a ON TRUE
      JOIN daily b ON b.dn = a.dn + l.lag
    ),
    agg AS (
      SELECT lag,
             COUNT(*) AS k,
             SUM(x) AS sx, SUM(y) AS sy,
             SUM(CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0))) AS sxx,
             SUM(CAST(y AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0))) AS syy,
             SUM(CAST(x AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0))) AS sxy
      FROM pairs GROUP BY lag
    )
    SELECT CAST(lag AS INT) AS lag,
           CAST(k AS BIGINT) AS n_days,
           {_XCORR_EXPR} AS xcorr
    FROM agg
"""


@register("cross_correlation_lag", oracle=_XCORR_SQL)
def cross_correlation_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-correlation sweep of purchases against clicks over ±{XCORR_MAX_LAG}
    days of alignment — the lead/lag detector ("purchases follow clicks
    by how many days?") that turns `rolling_corr`'s co-movement monitor
    into an alignment measurement: for each lag L, Pearson r between
    click[t] and purchase[t+L] over all aligned calendar days; the
    argmax lag is the conversion delay a forecasting feature encodes.

    Exactness: the rolling_corr lanes verbatim — exact integer daily
    counts, exact DECIMAL(19,0)² product sums, one shared display
    expression with a correctly-rounded sqrt, NULL on zero variance.
    The lag dimension is generated (range), not data-dependent, so both
    engines sweep identical lags even on an empty calendar (zero output
    rows both sides — the join has no days to align).

    Physics: one map-side-combined daily rollup; the sweep is a
    broadcast of the 15-row lag dimension against the |days|-sized
    calendar relation joined to itself on a shifted key — all
    calendar-scale, nothing corpus-sized past the rollup. At 100 TB
    the shape is unchanged: lag sweeps run over rollups, never events.
    """
    ev = load(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    daily = ev.groupBy(_dn().alias("dn")).agg(
        F.sum(
            F.when(F.col("event_type") == "click", 1).otherwise(0)
        ).alias("x"),
        F.sum(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("y"),
    ).localCheckpoint(eager=False)
    lags = spark.range(2 * XCORR_MAX_LAG + 1).select(
        (F.col("id") - XCORR_MAX_LAG).cast("int").alias("lag")
    )
    a = daily.select(F.col("dn").alias("adn"), "x")
    b = daily.select(F.col("dn").alias("bdn"), "y")
    pairs = (
        a.crossJoin(F.broadcast(lags))
        .join(b, F.col("bdn") == F.col("adn") + F.col("lag"))
    )
    xd = F.col("x").cast("decimal(19,0)")
    yd = F.col("y").cast("decimal(19,0)")
    agg = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(xd * xd).alias("sxx"),
        F.sum(yd * yd).alias("syy"),
        F.sum(xd * yd).alias("sxy"),
    )
    return agg.select(
        F.col("lag").cast("int").alias("lag"),
        F.col("k").cast("long").alias("n_days"),
        F.expr(_XCORR_EXPR).alias("xcorr"),
    )


_BINSEG_SQL = f"""
    WITH {_DAILY_COUNT_CTE},
    walk AS (
      SELECT event_type, dn,
             CAST(SUM(c) OVER (PARTITION BY event_type ORDER BY dn
                               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS prefix,
             CAST(row_number() OVER (PARTITION BY event_type ORDER BY dn)
                  AS BIGINT) AS j,
             CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n,
             CAST(SUM(c) OVER (PARTITION BY event_type) AS BIGINT) AS total
      FROM daily
    ),
    cp1 AS (
      SELECT event_type, j AS j1, prefix AS prefix1
      FROM (
        SELECT event_type, j, prefix,
               row_number() OVER (
                 PARTITION BY event_type
                 ORDER BY abs(n * prefix - j * total) DESC, dn) AS rnk
        FROM walk
      ) WHERE rnk = 1
    ),
    seg AS (
      SELECT w.event_type, w.dn, w.j, w.prefix, w.n, w.total,
             c.j1, c.prefix1,
             CASE WHEN w.j <= c.j1 THEN 'left' ELSE 'right' END AS side,
             CASE WHEN w.j <= c.j1
                  THEN c.j1 * w.prefix - w.j * c.prefix1
                  ELSE (w.n - c.j1) * (w.prefix - c.prefix1)
                       - (w.j - c.j1) * (w.total - c.prefix1)
             END AS ns2
      FROM walk w JOIN cp1 c USING (event_type)
    ),
    lvl2 AS (
      SELECT event_type, side, dn, ns2,
             row_number() OVER (PARTITION BY event_type, side
                                ORDER BY abs(ns2) DESC, dn) AS rnk
      FROM seg
    ),
    lvl1 AS (
      SELECT w.event_type, 1 AS lvl, 'all' AS side, w.dn,
             w.n * w.prefix - w.j * w.total AS ns
      FROM walk w JOIN cp1 c USING (event_type) WHERE w.j = c.j1
    )
    SELECT event_type, CAST(lvl AS INT) AS lvl, side,
           CAST(dn AS BIGINT) AS cp_dn, CAST(ns AS BIGINT) AS ns
    FROM (
      SELECT * FROM lvl1
      UNION ALL
      SELECT event_type, 2 AS lvl, side, dn, ns2 AS ns
      FROM lvl2 WHERE rnk = 1
    )
"""


@register("binseg_changepoints", oracle=_BINSEG_SQL)
def binseg_changepoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BINARY SEGMENTATION over the per-type daily series — the
    multi-changepoint extension of `cusum_changepoint` (one shift is
    rarely the whole story: a ramp-up AND a regression look like one
    smeared shift to single-CUSUM): level 1 is the global CUSUM argmax;
    the series then splits there and each side reports ITS OWN argmax
    of the segment-relative statistic ns'_j = len·(prefix_j −
    prefix_{a−1}) − pos·(segment total) — the classic top-down
    segmentation step, emitted as (type, level, side, day, ns).

    Exactness (the cusum_changepoint doctrine, recursively applied):
    every statistic is an exact BIGINT product difference — no mean, no
    division, no float anywhere; argmax ties break to the earliest day
    at both levels; both engines rank identical integers. A
    single-day series yields ns = 0 rows at every level (no shift
    detectable); segment statistics are IDENTICALLY defined on both
    sides, so empty right segments (changepoint at the last day)
    vanish identically.

    Physics: the daily rollup is the only raw-data shuffle; the walk,
    the level-1 argmax, the broadcast of the |types|-row cp1 relation,
    and both level-2 argmaxes all run over calendar-sized data
    clustered by the same event_type key. Deeper trees repeat the same
    broadcast-join + rank step — depth scales with changepoints
    sought, never with volume.
    """
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", _dn().alias("dn")).agg(
        F.count(F.lit(1)).alias("c")
    )
    w = Window.partitionBy("event_type").orderBy("dn")
    walk = (
        daily.select("event_type", "dn", "c")
        .withColumn(
            "prefix",
            F.sum("c").over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("bigint"),
        )
        .withColumn("j", F.row_number().over(w).cast("bigint"))
        .withColumn(
            "n", F.count(F.lit(1)).over(Window.partitionBy("event_type")).cast("bigint")
        )
        .withColumn(
            "total", F.sum("c").over(Window.partitionBy("event_type")).cast("bigint")
        )
        .localCheckpoint(eager=False)
    )
    ns1 = F.col("n") * F.col("prefix") - F.col("j") * F.col("total")
    rnk1 = Window.partitionBy("event_type").orderBy(F.abs(ns1).desc(), "dn")
    cp1 = (
        walk.withColumn("rnk", F.row_number().over(rnk1))
        .filter(F.col("rnk") == 1)
        .select(
            F.col("event_type").alias("ct"),
            F.col("j").alias("j1"),
            F.col("prefix").alias("prefix1"),
        )
    )
    seg = walk.join(F.broadcast(cp1), F.col("event_type") == F.col("ct"))
    is_left = F.col("j") <= F.col("j1")
    ns2 = F.when(
        is_left,
        F.col("j1") * F.col("prefix") - F.col("j") * F.col("prefix1"),
    ).otherwise(
        (F.col("n") - F.col("j1")) * (F.col("prefix") - F.col("prefix1"))
        - (F.col("j") - F.col("j1")) * (F.col("total") - F.col("prefix1"))
    )
    lvl2_base = seg.select(
        "event_type",
        F.when(is_left, F.lit("left")).otherwise(F.lit("right")).alias("side"),
        "dn",
        ns2.alias("ns2"),
    )
    rnk2 = Window.partitionBy("event_type", "side").orderBy(
        F.abs(F.col("ns2")).desc(), "dn"
    )
    lvl2 = (
        lvl2_base.withColumn("rnk", F.row_number().over(rnk2))
        .filter(F.col("rnk") == 1)
        .select(
            "event_type",
            F.lit(2).cast("int").alias("lvl"),
            "side",
            F.col("dn").cast("long").alias("cp_dn"),
            F.col("ns2").cast("long").alias("ns"),
        )
    )
    lvl1 = seg.filter(F.col("j") == F.col("j1")).select(
        "event_type",
        F.lit(1).cast("int").alias("lvl"),
        F.lit("all").alias("side"),
        F.col("dn").cast("long").alias("cp_dn"),
        ns1.cast("long").alias("ns"),
    )
    return lvl1.unionByName(lvl2)


# Hampel identifier: window half-width (±3 days), threshold K, and the
# Gaussian MAD-to-sigma consistency constant (an exact decimal literal,
# identical on both engines).
HAMPEL_HALF = 3
HAMPEL_K = 3.0
HAMPEL_C = 1.4826


def _median_of_sorted(a: str, size_fn: str, at, intdiv: str) -> str:
    """Median-of-sorted-array expression text: odd length → middle,
    even → midpoint of the two middles. One construction, parameterized
    by each engine's array vocabulary (size/len, element_at/[], div///),
    so both run the identical arithmetic."""
    n = f"{size_fn}({a})"
    return (
        f"CASE WHEN {n} % 2 = 1 THEN {at(a, f'({n} + 1) {intdiv} 2')} "
        f"ELSE ({at(a, f'{n} {intdiv} 2')} "
        f"+ {at(a, f'{n} {intdiv} 2 + 1')}) / 2.0 END"
    )


def _spark_med(a: str) -> str:
    return _median_of_sorted(
        a, "size", lambda arr, i: f"element_at({arr}, CAST({i} AS INT))", "div"
    )


def _duck_med(a: str) -> str:
    return _median_of_sorted(a, "len", lambda arr, i: f"{arr}[{i}]", "//")


_HAMPEL_SQL = f"""
    WITH {_DAILY_COUNT_CTE},
    d AS (
      SELECT event_type, dn, CAST(c AS DOUBLE) AS x
      FROM daily WHERE dn IS NOT NULL AND event_type IS NOT NULL
    ),
    fr AS (
      SELECT event_type, dn, x,
             list_sort(list(x) OVER (PARTITION BY event_type ORDER BY dn
                       ROWS BETWEEN {HAMPEL_HALF} PRECEDING
                       AND {HAMPEL_HALF} FOLLOWING)) AS a
      FROM d
    ),
    med AS (
      SELECT event_type, dn, x, a, {_duck_med("a")} AS med
      FROM fr
    ),
    mad AS (
      SELECT event_type, dn, x, med,
             {_duck_med("list_sort(list_transform(a, v -> abs(v - med)))")}
               AS mad
      FROM med
    )
    SELECT event_type, CAST(dn AS BIGINT) AS dn, x, med, mad,
           abs(x - med) > {HAMPEL_K} * {HAMPEL_C} * mad AS is_outlier,
           CASE WHEN abs(x - med) > {HAMPEL_K} * {HAMPEL_C} * mad
                THEN med ELSE x END AS repaired
    FROM mad
"""


@register("hampel_filter", oracle=_HAMPEL_SQL)
def hampel_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hampel outlier identifier over the per-type daily series — the
    ROLLING robust detector completing the anomaly lane: `anomaly_mad`
    flags against the GLOBAL per-type median/MAD (a level shift late in
    the series drags the global center); the Hampel filter re-centers
    in a ±{HAMPEL_HALF}-day window (rolling median) and re-scales by
    the window's own MAD, so a spike is judged against its LOCAL
    neighborhood — the standard telemetry de-spiker, emitted here with
    the repaired series (spike → window median) alongside the flags.

    Exactness: both engines materialize the IDENTICAL sorted window
    array (same (event_type, dn) frame, exact-count doubles) and
    compute median and MAD through ONE shared expression construction
    (`_median_of_sorted` — parameterized only by array vocabulary), so
    every med/mad/flag/repair is identical IEEE ops on identical
    operands: raw doubles, no rounding hedge ({HAMPEL_C} is the same
    decimal literal text on both sides). Warm-up frames at series edges
    shrink symmetrically on both engines (same ROWS frame). NULL-day/
    -type rows are out of series contract as in every ts op.

    Physics: one map-side-combined daily rollup is the only
    corpus-sized stage; the window runs over the calendar-sized daily
    relation clustered by type, each frame carrying ≤ {2 * HAMPEL_HALF + 1}
    doubles — O(1) state per open frame at any corpus volume (the
    `window_rolling_median` argument, plus the per-frame HOF work).
    """
    ev = load(spark, sf_dir, "events")
    daily = (
        ev.groupBy("event_type", _dn().alias("dn"))
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("dn").isNotNull() & F.col("event_type").isNotNull())
        .select("event_type", "dn", F.col("c").cast("double").alias("x"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("dn")
        .rowsBetween(-HAMPEL_HALF, HAMPEL_HALF)
    )
    fr = daily.select(
        "event_type",
        "dn",
        "x",
        F.array_sort(F.collect_list("x").over(w)).alias("a"),
    )
    med = fr.select(
        "event_type", "dn", "x", "a", F.expr(_spark_med("a")).alias("med")
    )
    mad = med.select(
        "event_type",
        "dn",
        "x",
        "med",
        F.expr(
            _spark_med("array_sort(transform(a, v -> abs(v - med)))")
        ).alias("mad"),
    )
    out = F.abs(F.col("x") - F.col("med")) > (
        F.lit(HAMPEL_K) * F.lit(HAMPEL_C) * F.col("mad")
    )
    return mad.select(
        "event_type",
        F.col("dn").cast("long").alias("dn"),
        "x",
        "med",
        "mad",
        out.alias("is_outlier"),
        F.when(out, F.col("med")).otherwise(F.col("x")).alias("repaired"),
    )


# --- Wald-Wolfowitz runs test --------------------------------------------

# Tie-exact normal approximation over exact integer run counts:
# E[R] = 1 + 2*n1*n2/n, Var[R] = 2*n1*n2*(2*n1*n2 - n) / (n^2 * (n-1)).
_RUNS_Z_EXPR = (
    "round((CAST(n_runs AS DOUBLE)"
    " - (1 + 2 * CAST(n_plus AS DOUBLE) * CAST(n_minus AS DOUBLE)"
    " / CAST(n_signed AS DOUBLE)))"
    " / NULLIF(sqrt(2 * CAST(n_plus AS DOUBLE) * CAST(n_minus AS DOUBLE)"
    " * (2 * CAST(n_plus AS DOUBLE) * CAST(n_minus AS DOUBLE)"
    " - CAST(n_signed AS DOUBLE))"
    " / (CAST(n_signed AS DOUBLE) * CAST(n_signed AS DOUBLE)"
    " * CAST(n_signed - 1 AS DOUBLE))), CAST(0 AS DOUBLE)), 9)"
)

_RUNS_SQL = f"""
    WITH {_DAILY_COUNT_CTE},
    d AS (
      SELECT event_type, dn, c FROM daily
      WHERE dn IS NOT NULL AND event_type IS NOT NULL
    ),
    med AS (
      SELECT event_type, quantile_cont(CAST(c AS DOUBLE), 0.5) AS med
      FROM d GROUP BY 1
    ),
    s AS (
      SELECT d.event_type, d.dn,
             CASE WHEN CAST(d.c AS DOUBLE) > m.med THEN 1 ELSE -1 END AS sgn
      FROM d JOIN med m ON d.event_type = m.event_type
      WHERE CAST(d.c AS DOUBLE) <> m.med
    ),
    r AS (
      SELECT event_type, sgn,
             CASE WHEN LAG(sgn) OVER (PARTITION BY event_type ORDER BY dn)
                       IS DISTINCT FROM sgn THEN 1 ELSE 0 END AS brk
      FROM s
    ),
    m2 AS (
      SELECT event_type,
             CAST(SUM(CASE WHEN sgn = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_plus,
             CAST(SUM(CASE WHEN sgn = -1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_minus,
             CAST(COUNT(*) AS BIGINT) AS n_signed,
             CAST(SUM(brk) AS BIGINT) AS n_runs
      FROM r GROUP BY 1
    )
    SELECT event_type, n_plus, n_minus, n_runs,
           {_RUNS_Z_EXPR} AS z
    FROM m2
"""


@register("runs_test", oracle=_RUNS_SQL)
def runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test per event type: is the daily count
    series RANDOM around its median, or does it cluster (trend /
    regime persistence → too few runs) or oscillate (negative
    autocorrelation → too many)? The classic nonparametric
    randomness check that complements `autocorr_daily` (which
    measures linear lag correlation; this counts sign runs and is
    distribution-free). Days equal to the median are dropped
    (standard treatment); a run is a maximal same-sign stretch.

    Exactness: the median is the `agg_percentile` pairing
    (``percentile`` ↔ ``quantile_cont`` — identical interpolation,
    and count-vs-median comparisons are exact: counts are integers,
    the interpolated median is an exact x.0/x.5 double). Run breaks
    come off one LAG window (IS DISTINCT FROM — first row opens run
    #1 on both engines); n+, n-, R are exact BIGINTs; the z closed
    form is the same text on both engines, round-9.

    Physics: one map-side-combined daily rollup is the only
    corpus-sized stage; the median, the sign pass, and the LAG all
    run on the |days|x|types| relation. The per-type broadcast of
    the 1-row median relation is a |types|-row join. Scale-invariant
    by construction.
    """
    ev = load(spark, sf_dir, "events")
    daily = (
        ev.groupBy("event_type", _dn().alias("dn"))
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("dn").isNotNull() & F.col("event_type").isNotNull())
    )
    daily = bounded_cache("runs_test.daily", daily)
    med = daily.groupBy("event_type").agg(
        F.percentile(F.col("c").cast("double"), 0.5).alias("med")
    ).withColumnRenamed("event_type", "m_et")
    s = (
        daily.join(F.broadcast(med), F.col("event_type") == F.col("m_et"))
        .filter(F.col("c").cast("double") != F.col("med"))
        .select(
            "event_type",
            "dn",
            F.when(F.col("c").cast("double") > F.col("med"), F.lit(1))
            .otherwise(F.lit(-1))
            .alias("sgn"),
        )
    )
    w = Window.partitionBy("event_type").orderBy("dn")
    r = s.select(
        "event_type",
        "sgn",
        F.when(
            ~F.lag("sgn").over(w).eqNullSafe(F.col("sgn")), F.lit(1)
        )
        .otherwise(F.lit(0))
        .alias("brk"),
    )
    m2 = r.groupBy("event_type").agg(
        F.sum(F.when(F.col("sgn") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_plus"),
        F.sum(F.when(F.col("sgn") == -1, 1).otherwise(0))
        .cast("long")
        .alias("n_minus"),
        F.count(F.lit(1)).cast("long").alias("n_signed"),
        F.sum("brk").cast("long").alias("n_runs"),
    )
    return m2.select(
        "event_type",
        "n_plus",
        "n_minus",
        "n_runs",
        F.expr(_RUNS_Z_EXPR).alias("z"),
    )


# --- Page-Hinkley drift detector ------------------------------------------

PH_BURN_DAYS = 7     # reference-mean burn-in window (first W days)
PH_DELTA_X2 = 1      # 2*delta: tolerated drift per step (delta = 0.5)
PH_LAMBDA = 50.0     # alarm threshold on the drift depth

_PH_SQL = f"""
    WITH {_DAILY_COUNT_CTE},
    d AS (
      SELECT event_type, dn, CAST(c AS BIGINT) AS c,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY dn) AS i
      FROM daily WHERE dn IS NOT NULL AND event_type IS NOT NULL
    ),
    burn AS (
      SELECT event_type,
             CAST(SUM(c) AS BIGINT) AS s_burn,
             CAST(COUNT(*) AS BIGINT) AS w_burn
      FROM d WHERE i <= {PH_BURN_DAYS} GROUP BY 1
    ),
    cum AS (
      SELECT d.event_type, d.dn, d.i, b.s_burn, b.w_burn,
             2 * b.w_burn * SUM(d.c) OVER (PARTITION BY d.event_type
                                           ORDER BY d.dn)
               - d.i * (2 * b.s_burn + {PH_DELTA_X2} * b.w_burn) AS m2
      FROM d JOIN burn b ON d.event_type = b.event_type
    ),
    depth AS (
      SELECT event_type, dn, w_burn, m2,
             m2 - MIN(m2) OVER (PARTITION BY event_type ORDER BY dn)
               AS dep2w
      FROM cum
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           round(MAX(CAST(dep2w AS DOUBLE) / (2 * w_burn)), 9)
             AS max_depth,
           CAST(MIN(CASE WHEN CAST(dep2w AS DOUBLE) / (2 * w_burn)
                              > {PH_LAMBDA} THEN dn END) AS BIGINT)
             AS alarm_dn
    FROM depth GROUP BY 1
"""


@register("page_hinkley", oracle=_PH_SQL)
def page_hinkley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page-Hinkley upward-drift detector per event type: the
    cumulative deviation m_t = sum(x_i - mu0 - delta) against its
    running minimum; depth_t = m_t - min(m_s, s<=t) exceeding lambda
    raises the alarm. Complements `cusum_changepoint` (which
    LOCALIZES the single best split against the global mean —
    retrospective) with the SEQUENTIAL detector that a monitoring
    plane runs forward: the alarm day is the first day the drift
    depth clears the threshold, exactly the semantics of the
    streaming PH test with a burn-in reference mean mu0 = mean of
    the first {PH_BURN_DAYS} days (the deployable variant — the
    textbook expanding-mean form re-estimates mu under drift, which
    both delays detection and breaks integer exactness).

    Exactness: everything before the display division is exact
    BIGINT — m2 = 2W*cumsum(x) - i*(2*S_W + 2*delta*W) is the PH
    statistic scaled by 2W (delta = 1/2 enters as the integer
    {PH_DELTA_X2} = 2*delta), the running MIN and the depth are
    integer window ops, and the only doubles are the round-9 display
    depth and the threshold compare (exact: integer/2W against a
    literal). Burn-in shorter than W days (degenerate fixtures) just
    uses the days that exist.

    Physics: one map-side-combined daily rollup; the burn-in
    relation is |types| rows (broadcast); cumsum + running-min are
    ONE ordered window pass per type over the |days|x|types|
    relation. The streaming twin keeps (cumsum, min, i) as per-key
    state — `stream_cusum`'s shape; at 100 TB the batch form's only
    corpus-sized stage is still the rollup.
    """
    ev = load(spark, sf_dir, "events")
    daily = (
        ev.groupBy("event_type", _dn().alias("dn"))
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("dn").isNotNull() & F.col("event_type").isNotNull())
        .select("event_type", "dn", F.col("c").cast("long").alias("c"))
    )
    wo = Window.partitionBy("event_type").orderBy("dn")
    # Cache AFTER the row-number window: both consumers (burn-in fit,
    # cumulative pass) read the numbered relation, so the type-keyed
    # sort runs once.
    d = bounded_cache(
        "page_hinkley.d", daily.withColumn("i", F.row_number().over(wo))
    )
    burn = (
        d.filter(F.col("i") <= PH_BURN_DAYS)
        .groupBy("event_type")
        .agg(
            F.sum("c").cast("long").alias("s_burn"),
            F.count(F.lit(1)).cast("long").alias("w_burn"),
        )
        .withColumnRenamed("event_type", "b_et")
    )
    cum = d.join(F.broadcast(burn), F.col("event_type") == F.col("b_et")).select(
        "event_type",
        "dn",
        "w_burn",
        (
            2 * F.col("w_burn") * F.sum("c").over(wo)
            - F.col("i")
            * (2 * F.col("s_burn") + PH_DELTA_X2 * F.col("w_burn"))
        ).alias("m2"),
    )
    depth = cum.select(
        "event_type",
        "dn",
        "w_burn",
        (F.col("m2") - F.min("m2").over(wo)).alias("dep2w"),
    )
    dd = F.col("dep2w").cast("double") / (2 * F.col("w_burn"))
    return depth.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.round(F.max(dd), 9).alias("max_depth"),
        F.min(F.when(dd > PH_LAMBDA, F.col("dn")))
        .cast("long")
        .alias("alarm_dn"),
    )


# --- Mann-Kendall trend test ----------------------------------------------

# Tie-corrected normal approximation with continuity correction:
# Var(S) = (n(n-1)(2n+5) - sum_t t(t-1)(2t+5)) / 18,
# z = (S - sgn(S)) / sqrt(Var)  (0 when S = 0).
_MK_Z_EXPR = (
    "round(CASE WHEN s_stat > 0 THEN (CAST(s_stat AS DOUBLE) - 1)"
    " / NULLIF(sqrt((CAST(n AS DOUBLE) * (n - 1) * (2 * n + 5)"
    " - CAST(tie_term AS DOUBLE)) / 18), CAST(0 AS DOUBLE))"
    " WHEN s_stat < 0 THEN (CAST(s_stat AS DOUBLE) + 1)"
    " / NULLIF(sqrt((CAST(n AS DOUBLE) * (n - 1) * (2 * n + 5)"
    " - CAST(tie_term AS DOUBLE)) / 18), CAST(0 AS DOUBLE))"
    " ELSE CAST(0 AS DOUBLE) END, 9)"
)

_MK_SQL = f"""
    WITH {_DAILY_COUNT_CTE},
    d AS (
      SELECT event_type, dn, CAST(c AS BIGINT) AS x
      FROM daily WHERE dn IS NOT NULL AND event_type IS NOT NULL
    ),
    s AS (
      SELECT a.event_type,
             CAST(SUM(CASE WHEN b.x > a.x THEN 1
                           WHEN b.x < a.x THEN -1 ELSE 0 END) AS BIGINT)
               AS s_stat,
             CAST(COUNT(*) AS BIGINT) AS n_pairs
      FROM d a JOIN d b
        ON a.event_type = b.event_type AND a.dn < b.dn
      GROUP BY 1
    ),
    ties AS (
      SELECT event_type,
             CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_term
      FROM (SELECT event_type, x, CAST(COUNT(*) AS BIGINT) AS t
            FROM d GROUP BY 1, 2)
      GROUP BY 1
    ),
    nn AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM d GROUP BY 1
    )
    SELECT nn.event_type, nn.n, s.s_stat,
           {_MK_Z_EXPR} AS z
    FROM nn
    JOIN s ON s.event_type = nn.event_type
    JOIN ties t ON t.event_type = nn.event_type
"""


@register("mann_kendall", oracle=_MK_SQL)
def mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall monotonic-trend test per event type: S = Σ
    sign(x_j − x_i) over all day pairs i < j, with the tie-corrected
    variance and continuity-corrected z. The SIGNIFICANCE companion to
    `theil_sen_trend` (which estimates the slope; this tests whether a
    monotone trend exists at all) — together they are the standard
    nonparametric trend kit for ops/metric series.

    Exactness: S and the tie term Σ t(t−1)(2t+5) are exact BIGINTs;
    the z closed form (continuity correction: S∓1, z=0 at S=0) is one
    shared expression text, round-9. Single-day series: Var = 0 →
    NULL via NULLIF on both engines.

    Physics: the pair join runs over the CALENDAR-sized daily relation
    (`theil_sen_trend`'s physics — |days|² per type, never the
    corpus); the tie rollup and n are |days|-sized; the three
    |types|-row relations join broadcast-small. At planetary day
    counts the O(n log n) inversion-count form replaces the pair join
    (documented swap; the pair join is exact ground truth at any
    realistic calendar span).
    """
    ev = load(spark, sf_dir, "events")
    daily = (
        ev.groupBy("event_type", _dn().alias("dn"))
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("dn").isNotNull() & F.col("event_type").isNotNull())
        .select("event_type", "dn", F.col("c").cast("long").alias("x"))
    )
    daily = bounded_cache("mann_kendall.daily", daily)
    a = daily.alias("a")
    b = daily.alias("b")
    s = (
        a.join(
            b,
            (F.col("a.event_type") == F.col("b.event_type"))
            & (F.col("a.dn") < F.col("b.dn")),
        )
        .groupBy(F.col("a.event_type").alias("event_type"))
        .agg(
            F.sum(
                F.when(F.col("b.x") > F.col("a.x"), 1)
                .when(F.col("b.x") < F.col("a.x"), -1)
                .otherwise(0)
            )
            .cast("long")
            .alias("s_stat")
        )
    )
    ties = (
        daily.groupBy("event_type", "x")
        .agg(F.count(F.lit(1)).cast("long").alias("t"))
        .groupBy("event_type")
        .agg(
            F.sum(
                F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
            )
            .cast("long")
            .alias("tie_term")
        )
        .withColumnRenamed("event_type", "t_et")
    )
    nn = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    ).withColumnRenamed("event_type", "n_et")
    j = (
        nn.join(F.broadcast(s), F.col("n_et") == F.col("event_type"))
        .join(F.broadcast(ties), F.col("n_et") == F.col("t_et"))
    )
    return j.select(
        F.col("n_et").alias("event_type"),
        "n",
        "s_stat",
        F.expr(_MK_Z_EXPR).alias("z"),
    )


# --- Grubbs max studentized deviate ----------------------------------------

_GRUBBS_EXPR = (
    # inner divisor NULLIF-guarded: n = 1 has no sample variance — ANSI
    # Spark would abort on 0/0 where the contract (and DuckDB) is NULL
    "round(CAST(maxdev2n AS DOUBLE)"
    " / NULLIF(CAST(n AS DOUBLE)"
    " * sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)"
    " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
    " / NULLIF(CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE),"
    " CAST(0 AS DOUBLE))), CAST(0 AS DOUBLE)), 9)"
)

_GRUBBS_SQL = f"""
    WITH {_DAILY_COUNT_CTE},
    d AS (
      SELECT event_type, dn, CAST(c AS BIGINT) AS x
      FROM daily WHERE dn IS NOT NULL AND event_type IS NOT NULL
    ),
    m AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(x * x) AS BIGINT) AS sxx
      FROM d GROUP BY 1
    ),
    dev AS (
      -- |x - mean| scaled by n stays integral: |n*x - sx|
      SELECT d.event_type, d.dn,
             ABS(m.n * d.x - m.sx) AS dev_n
      FROM d JOIN m ON d.event_type = m.event_type
    ),
    pick AS (
      SELECT event_type,
             CAST(MAX(dev_n) AS BIGINT) AS maxdev2n,
             CAST(MIN(CASE WHEN dev_n = md THEN dn END) AS BIGINT)
               AS argmax_dn
      FROM (SELECT event_type, dn, dev_n,
                   MAX(dev_n) OVER (PARTITION BY event_type) AS md
            FROM dev)
      GROUP BY 1
    )
    SELECT m.event_type, m.n, p.argmax_dn,
           {_GRUBBS_EXPR} AS g_stat
    FROM m JOIN pick p ON p.event_type = m.event_type
"""


@register("grubbs_outlier", oracle=_GRUBBS_SQL)
def grubbs_outlier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grubbs max studentized deviate per event type: G = max|x − x̄|/s
    over the daily count series, plus the day achieving it (earliest on
    ties — the determinism pin). The PARAMETRIC single-outlier screen
    complementing `anomaly_mad` (robust center) and `hampel_filter`
    (local window): G against the t-based critical value is the
    classical lab-data outlier test; this emits the statistic and the
    suspect day (the critical-value compare needs a t quantile — a
    client-side constant, deliberately out of engine scope).

    Exactness: the deviation |x − x̄| scaled by n stays integral
    (|n·x − Σx| — exact BIGINT, so the argmax and its tie-break are
    exact integer comparisons); the one double expression divides the
    integer max by n·s with s from exact moments (sample variance,
    n−1), shared text round-9; constant series → NULL via NULLIF.

    Physics: one map-side-combined rollup; the deviation pass and the
    argmax window run on the |days|×|types| relation; the |types|-row
    moment relation broadcasts. Scale-invariant.
    """
    ev = load(spark, sf_dir, "events")
    d = (
        ev.groupBy("event_type", _dn().alias("dn"))
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("dn").isNotNull() & F.col("event_type").isNotNull())
        .select("event_type", "dn", F.col("c").cast("long").alias("x"))
    )
    d = bounded_cache("grubbs.daily", d)
    m = d.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    ).withColumnRenamed("event_type", "m_et")
    dev = d.join(F.broadcast(m), F.col("event_type") == F.col("m_et")).select(
        "event_type",
        "dn",
        "n",
        "sx",
        "sxx",
        F.abs(F.col("n") * F.col("x") - F.col("sx")).alias("dev_n"),
    )
    w = Window.partitionBy("event_type")
    pick = (
        dev.withColumn("md", F.max("dev_n").over(w))
        .groupBy("event_type")
        .agg(
            F.max("dev_n").cast("long").alias("maxdev2n"),
            F.min(F.when(F.col("dev_n") == F.col("md"), F.col("dn")))
            .cast("long")
            .alias("argmax_dn"),
            F.max("n").cast("long").alias("n"),
            F.max("sx").cast("long").alias("sx"),
            F.max("sxx").cast("long").alias("sxx"),
        )
    )
    return pick.select(
        "event_type",
        "n",
        "argmax_dn",
        F.expr(_GRUBBS_EXPR).alias("g_stat"),
    )


# --- Kendall tau-b ---------------------------------------------------------

# Doubled tie terms keep every input integral (the `mann_whitney_u`
# device: n1_2 = sum t(t-1) = 2*n1, n0_2 = n(n-1) = 2*n0), so
# tau_b = (C-D)/sqrt((n0-n1)(n0-n2)) = 2(C-D)/sqrt((n0_2-n1_2)(n0_2-n2_2)).
_TAU_EXPR = (
    "round(2 * CAST(nc - nd AS DOUBLE)"
    " / NULLIF(sqrt((CAST(n AS DOUBLE) * (n - 1) - n1_2)"
    " * (CAST(n AS DOUBLE) * (n - 1) - n2_2)), CAST(0 AS DOUBLE)), 9)"
)

_KENDALL_SQL = f"""
    WITH d AS (
      SELECT event_type, dn,
             CAST(COUNT(*) AS BIGINT) AS x,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS y
      FROM (SELECT event_type,
                   date_diff('day', DATE '{_EPOCH}', CAST(ts AS DATE)) AS dn,
                   user_id
            FROM events)
      WHERE event_type IS NOT NULL AND dn IS NOT NULL
      GROUP BY 1, 2
    ),
    p AS (
      SELECT a.event_type,
             CAST(SUM(CASE WHEN (b.x > a.x AND b.y > a.y)
                             OR (b.x < a.x AND b.y < a.y)
                           THEN 1 ELSE 0 END) AS BIGINT) AS nc,
             CAST(SUM(CASE WHEN (b.x > a.x AND b.y < a.y)
                             OR (b.x < a.x AND b.y > a.y)
                           THEN 1 ELSE 0 END) AS BIGINT) AS nd
      FROM d a JOIN d b
        ON a.event_type = b.event_type AND a.dn < b.dn
      GROUP BY 1
    ),
    tx AS (
      SELECT event_type, CAST(SUM(t * (t - 1)) AS BIGINT) AS n1_2
      FROM (SELECT event_type, x, CAST(COUNT(*) AS BIGINT) AS t
            FROM d GROUP BY 1, 2)
      GROUP BY 1
    ),
    ty AS (
      SELECT event_type, CAST(SUM(t * (t - 1)) AS BIGINT) AS n2_2
      FROM (SELECT event_type, y, CAST(COUNT(*) AS BIGINT) AS t
            FROM d GROUP BY 1, 2)
      GROUP BY 1
    ),
    nn AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM d GROUP BY 1
    )
    SELECT nn.event_type, nn.n, p.nc, p.nd, {_TAU_EXPR} AS tau_b
    FROM nn
    JOIN p ON p.event_type = nn.event_type
    JOIN tx ON tx.event_type = nn.event_type
    JOIN ty ON ty.event_type = nn.event_type
"""


@register("kendall_tau", oracle=_KENDALL_SQL)
def kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau-b rank correlation between two DAILY series per
    event type — daily event volume vs daily distinct users: is a
    high-volume day driven by breadth (more users, tau near 1) or by
    depth (the same users firing more, tau near 0)? Completes the
    association kit: `corr_matrix` (Pearson, linear), `spearman_corr`
    (ranks within a group), `mann_kendall` (ONE series against time);
    this is two series against each other with the tie-corrected
    tau-b denominator.

    Exactness: both daily series are exact BIGINTs (a count and a
    distinct count); concordant/discordant pair counts are exact
    BIGINTs off strict integer compares; the doubled tie terms
    n1_2 = Σt(t−1) stay integral (the `mann_whitney_u` doubling
    device — no /2 division ever happens), and tau-b is one shared
    closed-form text, round-9. All-tied series: denominator 0 → NULL
    via NULLIF on both engines.

    Physics: one map-side-combined daily rollup (the distinct-user
    count is the one expand — `distinct_users_cumulative`'s honest
    cost), cached and consumed four ways (`mann_kendall`'s physics);
    the pair join runs over the CALENDAR-sized relation, never the
    corpus; the |types|-row results join broadcast-small. The
    O(n log n) merge-count swap replaces the pair join at planetary
    day counts (documented).
    """
    ev = load(spark, sf_dir, "events")
    daily = (
        ev.select(
            "event_type", _dn().alias("dn"), "user_id"
        )
        .filter(F.col("dn").isNotNull() & F.col("event_type").isNotNull())
        .groupBy("event_type", "dn")
        .agg(
            F.count(F.lit(1)).cast("long").alias("x"),
            F.countDistinct("user_id").cast("long").alias("y"),
        )
    )
    daily = bounded_cache("kendall_tau.daily", daily)
    a = daily.alias("a")
    b = daily.alias("b")
    conc = (
        (F.col("b.x") > F.col("a.x")) & (F.col("b.y") > F.col("a.y"))
    ) | ((F.col("b.x") < F.col("a.x")) & (F.col("b.y") < F.col("a.y")))
    disc = (
        (F.col("b.x") > F.col("a.x")) & (F.col("b.y") < F.col("a.y"))
    ) | ((F.col("b.x") < F.col("a.x")) & (F.col("b.y") > F.col("a.y")))
    p = (
        a.join(
            b,
            (F.col("a.event_type") == F.col("b.event_type"))
            & (F.col("a.dn") < F.col("b.dn")),
        )
        .groupBy(F.col("a.event_type").alias("event_type"))
        .agg(
            F.sum(F.when(conc, 1).otherwise(0)).cast("long").alias("nc"),
            F.sum(F.when(disc, 1).otherwise(0)).cast("long").alias("nd"),
        )
    )

    def tie2(col: str, out: str, key: str) -> DataFrame:
        return (
            daily.groupBy("event_type", col)
            .agg(F.count(F.lit(1)).cast("long").alias("t"))
            .groupBy("event_type")
            .agg(
                F.sum(F.col("t") * (F.col("t") - 1))
                .cast("long")
                .alias(out)
            )
            .withColumnRenamed("event_type", key)
        )

    tx = tie2("x", "n1_2", "tx_et")
    ty = tie2("y", "n2_2", "ty_et")
    nn = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    ).withColumnRenamed("event_type", "n_et")
    j = (
        nn.join(F.broadcast(p), F.col("n_et") == F.col("event_type"))
        .join(F.broadcast(tx), F.col("n_et") == F.col("tx_et"))
        .join(F.broadcast(ty), F.col("n_et") == F.col("ty_et"))
    )
    return j.select(
        F.col("n_et").alias("event_type"),
        "n",
        "nc",
        "nd",
        F.expr(_TAU_EXPR).alias("tau_b"),
    )


# --- Turning-point randomness test ------------------------------------------

# E[T] = 2(n-2)/3, Var[T] = (16n - 29)/90 for an i.i.d. continuous
# series; one shared closed form over exact integers.
_TP_Z_EXPR = (
    "round((CAST(n_turning AS DOUBLE) - 2 * (CAST(n AS DOUBLE) - 2) / 3)"
    " / NULLIF(sqrt((16 * CAST(n AS DOUBLE) - 29) / 90),"
    " CAST(0 AS DOUBLE)), 9)"
)

_TP_SQL = f"""
    WITH {_DAILY_COUNT_CTE},
    d AS (
      SELECT event_type, dn, CAST(c AS BIGINT) AS x
      FROM daily WHERE dn IS NOT NULL AND event_type IS NOT NULL
    ),
    lagged AS (
      SELECT event_type, x,
             lag(x)  OVER (PARTITION BY event_type ORDER BY dn) AS xp,
             lead(x) OVER (PARTITION BY event_type ORDER BY dn) AS xn
      FROM d
    ),
    t AS (
      SELECT event_type,
             CAST(SUM(CASE WHEN (xp < x AND x > xn)
                             OR (xp > x AND x < xn)
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_turning
      FROM lagged WHERE xp IS NOT NULL AND xn IS NOT NULL
      GROUP BY 1
    ),
    nn AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM d GROUP BY 1
    )
    SELECT nn.event_type, nn.n, t.n_turning, {_TP_Z_EXPR} AS z
    FROM nn JOIN t ON t.event_type = nn.event_type
"""


@register("turning_points", oracle=_TP_SQL)
def turning_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Turning-point randomness test per event type: the count of
    strict local extrema in the daily series (x_{i-1} < x_i > x_{i+1}
    or the mirror) against the i.i.d. expectation 2(n-2)/3 —
    distribution-free OSCILLATION check complementing `runs_test`
    (median-sign clustering) and `autocorr_daily` (linear lag
    dependence): too few turning points means trending/sticky, too
    many means alternating over-dispersion. Ties break neither arm
    (strict compares; the continuous-data convention, identical on
    both engines).

    Exactness: the extremum predicate is strict integer comparison
    over exact daily counts; boundary days (no lag or no lead) are
    out of scope via IS NOT NULL on both sides; T and n are exact
    BIGINTs and z is one shared closed-form text, round-9 (n <= 1:
    Var > 0 always, no guard needed; the NULLIF is belt-and-braces
    for the n=0 vacuous row that cannot occur).

    Physics: one map-side-combined daily rollup, ONE type-keyed
    window pass producing lag and lead together, a |types|-row join
    (broadcast). Calendar-sized after the first rollup at any corpus
    volume.
    """
    ev = load(spark, sf_dir, "events")
    daily = (
        ev.groupBy("event_type", _dn().alias("dn"))
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("dn").isNotNull() & F.col("event_type").isNotNull())
        .select("event_type", "dn", F.col("c").cast("long").alias("x"))
    )
    daily = bounded_cache("turning_points.daily", daily)
    w = Window.partitionBy("event_type").orderBy("dn")
    lagged = daily.select(
        "event_type",
        "x",
        F.lag("x").over(w).alias("xp"),
        F.lead("x").over(w).alias("xn"),
    )
    turning = (
        (F.col("xp") < F.col("x")) & (F.col("x") > F.col("xn"))
    ) | ((F.col("xp") > F.col("x")) & (F.col("x") < F.col("xn")))
    t = (
        lagged.filter(F.col("xp").isNotNull() & F.col("xn").isNotNull())
        .groupBy("event_type")
        .agg(
            F.sum(F.when(turning, 1).otherwise(0))
            .cast("long")
            .alias("n_turning")
        )
        .withColumnRenamed("event_type", "t_et")
    )
    nn = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    j = nn.join(F.broadcast(t), F.col("event_type") == F.col("t_et"))
    return j.select(
        "event_type", "n", "n_turning", F.expr(_TP_Z_EXPR).alias("z")
    )


# --- Ljung-Box portmanteau test ----------------------------------------------

# Per-(type, lag) autocorrelation: the UNROUNDED acf closed form over
# exact pair moments (autocorr_daily's display expression without the
# round), shared text on both engines.
_LB_RHO_RAW = (
    "(n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy)"
    " / NULLIF(sqrt((n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx)"
    " * (n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy)),"
    " CAST(0 AS DOUBLE))"
)
# Per-lag Q contribution rho_k^2/(nd - k) over the series length nd;
# one shared term text, folded in LAG ORDER (the anova device).
_LB_TERM = (
    f"({_LB_RHO_RAW}) * ({_LB_RHO_RAW})"
    " / NULLIF(CAST(nd AS DOUBLE) - lag_k, CAST(0 AS DOUBLE))"
)
_LB_Q_EXPR = (
    "round(CAST(nd AS DOUBLE) * (CAST(nd AS DOUBLE) + 2) * qsum, 9)"
)

_LJUNG_BOX_SQL = f"""
    WITH {_DAILY_COUNT_CTE},
    d AS (
      SELECT event_type, dn, CAST(c AS BIGINT) AS x
      FROM daily WHERE dn IS NOT NULL AND event_type IS NOT NULL
    ),
    nn AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS nd FROM d GROUP BY 1
    ),
    pairs AS (
      SELECT a.event_type, k.lag_k, a.x AS px, b.x AS py
      FROM d a
      JOIN (SELECT unnest(range(1, {ACF_MAX_LAG} + 1)) AS lag_k) k ON TRUE
      JOIN d b ON b.event_type = a.event_type AND b.dn = a.dn + k.lag_k
    ),
    m AS (
      SELECT event_type, lag_k,
             CAST(count(*) AS BIGINT) AS n,
             CAST(SUM(px) AS BIGINT) AS sx,
             CAST(SUM(py) AS BIGINT) AS sy,
             CAST(SUM(px * px) AS BIGINT) AS sxx,
             CAST(SUM(py * py) AS BIGINT) AS syy,
             CAST(SUM(px * py) AS BIGINT) AS sxy
      FROM pairs GROUP BY 1, 2
    ),
    terms AS (
      SELECT m.event_type, m.lag_k, nn.nd, {_LB_TERM} AS term
      FROM m JOIN nn ON nn.event_type = m.event_type
    ),
    folded AS (
      SELECT event_type,
             CAST(MAX(nd) AS BIGINT) AS nd,
             CAST(COUNT(*) AS INT) AS h,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
                                      list(COALESCE(term, CAST(0 AS DOUBLE))
                                           ORDER BY lag_k)),
                         (acc, x) -> acc + x) AS qsum
      FROM terms GROUP BY 1
    )
    SELECT event_type, nd, h, {_LB_Q_EXPR} AS q_stat
    FROM folded
"""


@register("ljung_box", oracle=_LJUNG_BOX_SQL)
def ljung_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung-Box portmanteau test per event type: Q = n(n+2) Σ_{k≤h}
    ρ_k²/(n−k) over the first 7 (``ACF_MAX_LAG``) daily
    autocorrelations — turns
    `autocorr_daily`'s per-lag DIAGNOSTICS into one whiteness TEST
    statistic (χ²_h under independence; the standard residual check
    after `trend_fit`/`holt_linear_forecast` claim to have explained a
    series). ρ_k is the per-lag pair-Pearson estimator
    `autocorr_daily` reports (documented: the overlapping-pairs form,
    not the single-mean acvf — both engines identically).

    Exactness: all pair moments are exact BIGINTs off the SAME rollup
    shape as `autocorr_daily`; each ρ_k and each Q contribution is one
    shared expression text over those exact operands; the ≤7 per-type
    contributions fold in LAG ORDER on both engines (the
    `anova_oneway` device); Q is one shared closed form, round-9.
    Degenerate lags (zero-variance pair sets → ρ NULL) contribute 0
    via COALESCE on both sides.

    Physics: one map-side-combined daily rollup (cached, consumed by
    the pair join, its own lag-shift side, and the length rollup); the
    lag join fans each CALENDAR-sized row out 7 ways — never
    corpus-sized; the fold list is ≤7 long per type.
    """
    ev = load(spark, sf_dir, "events")
    daily = (
        ev.groupBy("event_type", _dn().alias("dn"))
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("dn").isNotNull() & F.col("event_type").isNotNull())
        .select("event_type", "dn", F.col("c").cast("long").alias("x"))
    )
    daily = bounded_cache("ljung_box.daily", daily)
    nn = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("nd")
    ).withColumnRenamed("event_type", "n_et")
    lags = spark.range(1, ACF_MAX_LAG + 1).select(
        F.col("id").cast("long").alias("lag_k")
    )
    a = daily.alias("a")
    b = daily.alias("b")
    pairs = (
        a.crossJoin(F.broadcast(lags))
        .join(
            b,
            (F.col("b.event_type") == F.col("a.event_type"))
            & (F.col("b.dn") == F.col("a.dn") + F.col("lag_k")),
        )
        .select(
            F.col("a.event_type").alias("event_type"),
            "lag_k",
            F.col("a.x").alias("px"),
            F.col("b.x").alias("py"),
        )
    )
    m = pairs.groupBy("event_type", "lag_k").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("px").cast("long").alias("sx"),
        F.sum("py").cast("long").alias("sy"),
        F.sum(F.col("px") * F.col("px")).cast("long").alias("sxx"),
        F.sum(F.col("py") * F.col("py")).cast("long").alias("syy"),
        F.sum(F.col("px") * F.col("py")).cast("long").alias("sxy"),
    )
    terms = m.join(F.broadcast(nn), F.col("n_et") == F.col("event_type")).select(
        "event_type", "lag_k", "nd", F.expr(_LB_TERM).alias("term")
    )
    folded = terms.groupBy("event_type").agg(
        F.max("nd").cast("long").alias("nd"),
        F.count(F.lit(1)).cast("int").alias("h"),
        F.expr(
            "aggregate(transform(sort_array(collect_list(named_struct("
            "'lag_k', lag_k, 'term', COALESCE(term, CAST(0 AS DOUBLE))))),"
            " x -> x.term), CAST(0 AS DOUBLE), (acc, x) -> acc + x)"
        ).alias("qsum"),
    )
    return folded.select(
        "event_type", "nd", "h", F.expr(_LB_Q_EXPR).alias("q_stat")
    )


# --- Cox-Stuart trend test ----------------------------------------------

# Sign test over first-half/second-half day pairs: z = (2*plus - m)
# / sqrt(m) with m = non-tied pairs; one shared closed form.
_CS_Z_EXPR = (
    "round((2 * CAST(plus AS DOUBLE) - CAST(m AS DOUBLE))"
    " / NULLIF(sqrt(CAST(m AS DOUBLE)), CAST(0 AS DOUBLE)), 9)"
)

_COX_STUART_SQL = f"""
    WITH {_DAILY_COUNT_CTE},
    d AS (
      SELECT event_type, dn, CAST(c AS BIGINT) AS x
      FROM daily WHERE dn IS NOT NULL AND event_type IS NOT NULL
    ),
    r AS (
      SELECT event_type, x, i, nd, (nd + 1) // 2 AS cshift
      FROM (
        SELECT event_type, x,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY dn) AS i,
               CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT)
                 AS nd
        FROM d
      )
    ),
    p AS (
      SELECT a.event_type, a.nd,
             CAST(SUM(CASE WHEN b.x > a.x THEN 1 ELSE 0 END) AS BIGINT)
               AS plus,
             CAST(SUM(CASE WHEN b.x <> a.x THEN 1 ELSE 0 END) AS BIGINT)
               AS m
      FROM r a JOIN r b
        ON b.event_type = a.event_type
       AND b.i = a.i + a.cshift
      GROUP BY 1, 2
    )
    SELECT event_type, nd, plus, m, {_CS_Z_EXPR} AS z
    FROM p
"""


@register("cox_stuart", oracle=_COX_STUART_SQL)
def cox_stuart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cox-Stuart trend test per event type: pair each first-half day
    with its second-half counterpart c = ⌈n/2⌉ positions later and
    sign-test the increases — the SIMPLEST distribution-free trend
    check (a sign test in disguise), complementing `mann_kendall`
    (all-pairs S, more power, O(n²)) with an O(n) statistic whose
    null is exactly Binomial(m, ½). Ties drop from m (the standard
    convention); the odd middle element pairs with nothing and drops.

    Exactness: the pairing index i + ⌈n/2⌉ is exact integer
    arithmetic over ROW_NUMBER in dn order (a total order — dn is
    unique per type); plus/m are exact BIGINTs off strict integer
    compares; z is one shared closed form, round-9 (m = 0, the
    all-tied/single-day case → NULL via NULLIF on both engines).

    Physics: one map-side-combined daily rollup, one type-keyed rank
    window, ONE equi-join on the derived pair index (each row joins
    at most once — linear, not the O(n²) pair join), a |types|-row
    rollup. Calendar-sized throughout.
    """
    ev = load(spark, sf_dir, "events")
    daily = (
        ev.groupBy("event_type", _dn().alias("dn"))
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("dn").isNotNull() & F.col("event_type").isNotNull())
        .select("event_type", "dn", F.col("c").cast("long").alias("x"))
    )
    daily = bounded_cache("cox_stuart.daily", daily)
    w = Window.partitionBy("event_type").orderBy("dn")
    wc = Window.partitionBy("event_type")
    r = daily.select(
        "event_type",
        "x",
        F.row_number().over(w).alias("i"),
        F.count(F.lit(1)).over(wc).cast("long").alias("nd"),
    ).withColumn("cshift", F.expr("(nd + 1) DIV 2"))
    a = r.alias("a")
    b = r.alias("b")
    p = (
        a.join(
            b,
            (F.col("b.event_type") == F.col("a.event_type"))
            & (F.col("b.i") == F.col("a.i") + F.col("a.cshift")),
        )
        .groupBy(
            F.col("a.event_type").alias("event_type"),
            F.col("a.nd").alias("nd"),
        )
        .agg(
            F.sum(F.when(F.col("b.x") > F.col("a.x"), 1).otherwise(0))
            .cast("long")
            .alias("plus"),
            F.sum(F.when(F.col("b.x") != F.col("a.x"), 1).otherwise(0))
            .cast("long")
            .alias("m"),
        )
    )
    return p.select(
        "event_type", "nd", "plus", "m", F.expr(_CS_Z_EXPR).alias("z")
    )


# --- Paired sign test --------------------------------------------------------

SIGN_A = "click"
SIGN_B = "view"

_SIGN_SQL = f"""
    WITH {_DAILY_COUNT_CTE},
    d AS (
      SELECT dn,
             CAST(SUM(CASE WHEN event_type = '{SIGN_A}' THEN c ELSE 0 END)
                  AS BIGINT) AS xa,
             CAST(SUM(CASE WHEN event_type = '{SIGN_B}' THEN c ELSE 0 END)
                  AS BIGINT) AS xb
      FROM daily
      WHERE dn IS NOT NULL AND event_type IN ('{SIGN_A}', '{SIGN_B}')
      GROUP BY 1
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
             CAST(SUM(CASE WHEN xa > xb THEN 1 ELSE 0 END) AS BIGINT)
               AS plus,
             CAST(SUM(CASE WHEN xa <> xb THEN 1 ELSE 0 END) AS BIGINT) AS m
      FROM d
    )
    SELECT n_days, plus, m, {_CS_Z_EXPR} AS z
    FROM s
"""


@register("sign_test", oracle=_SIGN_SQL)
def sign_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paired sign test: on each observed day, does 'click' volume
    exceed 'view' volume (``SIGN_A``/``SIGN_B``)? — the PAIRED
    two-sample test completing the
    battery (`mann_whitney_u` compares two UNPAIRED samples; pairing
    by day blocks out the shared daily level, so a consistent small
    excess is detected even when day-to-day swings dwarf it). Days
    where the two counts tie drop from m (the standard convention);
    the null is exactly Binomial(m, ½) and z is the same normal
    approximation `cox_stuart` uses (the SAME closed-form text).

    Exactness: both daily series come from ONE conditional rollup of
    the shared daily relation (absent types count 0 on a day either
    type fired — identical CASE/WHEN semantics both engines); plus/m
    are exact BIGINTs off strict integer compares; z is the shared
    `_CS_Z_EXPR` text, round-9, all-tied → NULL via NULLIF.

    Physics: one map-side-combined daily rollup, a |days|-row
    re-rollup, a single-row fold. Calendar-sized after the first
    pass.
    """
    ev = load(spark, sf_dir, "events")
    daily = (
        ev.groupBy("event_type", _dn().alias("dn"))
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(
            F.col("dn").isNotNull()
            & F.col("event_type").isin(SIGN_A, SIGN_B)
        )
    )
    d = daily.groupBy("dn").agg(
        F.sum(F.when(F.col("event_type") == SIGN_A, F.col("c")).otherwise(0))
        .cast("long")
        .alias("xa"),
        F.sum(F.when(F.col("event_type") == SIGN_B, F.col("c")).otherwise(0))
        .cast("long")
        .alias("xb"),
    )
    s = d.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum(F.when(F.col("xa") > F.col("xb"), 1).otherwise(0))
        .cast("long")
        .alias("plus"),
        F.sum(F.when(F.col("xa") != F.col("xb"), 1).otherwise(0))
        .cast("long")
        .alias("m"),
    )
    return s.select("n_days", "plus", "m", F.expr(_CS_Z_EXPR).alias("z"))
