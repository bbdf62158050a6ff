"""Eighth analytics-surface batch: equi-depth histograms (the
quantile-bucket profile, complementing agg_histogram's equi-WIDTH
buckets), inter-purchase interval statistics, trailing-window z-score
anomaly detection in a fully integer domain, geohash-style cell
density, DBSCAN core-point detection via the grid join, bitemporal
as-of reconstruction, and value-distribution drift (TVD).

Oracle discipline per queries_core.py: money in BIGINT cents before
any aggregation, comparisons cross-multiplied instead of divided,
row_number with total tiebreaks, every ratio reported as an exact
integer ppm or a single final division of exact integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table

QUERIES: dict = {}
ORACLES: dict[str, str] = {}


def _q(name: str, sql: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLES[name] = sql
        return fn

    return deco


# shared constants
EQUI_DEPTH_BUCKETS = 10
INTERPURCHASE_MIN_ORDERS = 3
ZSCORE_BASELINE = 7  # trailing full days required
ZSCORE_K = 3  # flag beyond 3 sigma


# ---------------------------------------------------------------------------
# Equi-depth histogram: ntile over a total order with a deterministic
# tiebreak. The dual of agg_histogram (equi-width): depth buckets are
# what optimizers and drift monitors actually store, because each
# bucket carries the same mass.
# ---------------------------------------------------------------------------

_EQUI_SQL = f"""
WITH c AS (
  SELECT o_orderkey, CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
  FROM orders),
b AS (
  SELECT cents,
         ntile({EQUI_DEPTH_BUCKETS}) OVER (ORDER BY cents, o_orderkey) AS bucket
  FROM c)
SELECT CAST(bucket AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n,
       CAST(min(cents) AS BIGINT) AS min_cents,
       CAST(max(cents) AS BIGINT) AS max_cents,
       CAST(sum(cents) AS BIGINT) AS sum_cents
FROM b GROUP BY bucket ORDER BY bucket
"""


@_q("histogram_equi_depth", _EQUI_SQL)
def histogram_equi_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (quantile-bucket) histogram of order totals: ntile
    over (cents, orderkey) -- the tiebreak makes bucket membership
    deterministic even at repeated values, which is what lets the
    oracle hash the bucket BOUNDS, not just counts. Scale note: ntile
    needs a total order (one global sort); production equi-depth at
    100 TB samples or sketches instead -- this is the exact-reference
    implementation those approximations are validated against."""
    o = load_table(spark, sf_dir, "orders")
    c = o.select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
    )
    w = Window.orderBy("cents", "o_orderkey")
    b = c.withColumn("bucket", F.ntile(EQUI_DEPTH_BUCKETS).over(w))
    return (
        b.groupBy("bucket")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.min("cents").cast("long").alias("min_cents"),
            F.max("cents").cast("long").alias("max_cents"),
            F.sum("cents").cast("long").alias("sum_cents"),
        )
        .select(F.col("bucket").cast("long").alias("bucket"), "n",
                "min_cents", "max_cents", "sum_cents")
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# Inter-purchase intervals: per-customer gap stats via one lag window.
# The everyday lifecycle metric (repeat-purchase cadence) and the
# input to churn heuristics.
# ---------------------------------------------------------------------------

_INTERP_SQL = f"""
WITH o AS (
  SELECT o_custkey, CAST(o_orderdate AS DATE) AS d, o_orderkey FROM orders),
g AS (
  SELECT o_custkey,
         date_diff('day',
           lag(d) OVER (PARTITION BY o_custkey ORDER BY d, o_orderkey),
           d) AS gap
  FROM o),
s AS (
  SELECT o_custkey,
         count(*) AS n_orders,
         count(gap) AS n_gaps,
         min(gap) AS min_gap,
         max(gap) AS max_gap,
         sum(gap) AS sum_gap
  FROM g GROUP BY o_custkey)
SELECT CAST(o_custkey AS BIGINT) AS custkey,
       CAST(n_orders AS BIGINT) AS n_orders,
       CAST(min_gap AS BIGINT) AS min_gap_days,
       CAST(max_gap AS BIGINT) AS max_gap_days,
       CAST(sum_gap // n_gaps AS BIGINT) AS avg_gap_days
FROM s WHERE n_orders >= {INTERPURCHASE_MIN_ORDERS}
ORDER BY custkey
"""


@_q("customer_interpurchase_stats", _INTERP_SQL)
def customer_interpurchase_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer inter-purchase gap statistics (repeat-purchase
    cadence): one lag window partitioned by customer, one groupBy --
    both shuffle on the same key, so AQE coalesces them into one
    exchange. Gaps in whole days, mean as integer DIV: exact."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", F.col("o_orderdate").cast("date").alias("d"), "o_orderkey"
    )
    w = Window.partitionBy("o_custkey").orderBy("d", "o_orderkey")
    g = o.withColumn("gap", F.datediff(F.col("d"), F.lag("d").over(w)))
    return (
        g.groupBy("o_custkey")
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.count("gap").alias("n_gaps"),
            F.min("gap").cast("long").alias("min_gap_days"),
            F.max("gap").cast("long").alias("max_gap_days"),
            F.sum("gap").alias("sum_gap"),
        )
        .where(F.col("n_orders") >= INTERPURCHASE_MIN_ORDERS)
        .select(
            F.col("o_custkey").cast("long").alias("custkey"),
            "n_orders",
            "min_gap_days",
            "max_gap_days",
            F.expr("sum_gap DIV n_gaps").cast("long").alias("avg_gap_days"),
        )
        .orderBy("custkey")
    )


# ---------------------------------------------------------------------------
# Trailing z-score anomaly detection, zero floats: flag day d when
# |x_d - mean(base)| > K * std(base) over the previous ZSCORE_BASELINE
# full days -- cross-multiplied to (n*x - s)^2 > K^2 * (n*q - s^2),
# exact BIGINTs end to end. Bound: daily cents ~2e7 at sf0.1 ->
# n*q ~ 2e16, squares ~2e16, 450x below BIGINT overflow (re-derive
# before running at sf >= 1 with e2 money).
# ---------------------------------------------------------------------------

_ZSCORE_SQL = f"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY event_type, CAST(ts AS DATE)),
w AS (
  SELECT event_type, day, cents,
         count(*) OVER tw AS base_n,
         sum(cents) OVER tw AS s,
         sum(cents * cents) OVER tw AS q
  FROM daily
  WINDOW tw AS (PARTITION BY event_type ORDER BY day
                ROWS BETWEEN {ZSCORE_BASELINE} PRECEDING AND 1 PRECEDING))
SELECT event_type, day,
       CAST(cents AS BIGINT) AS cents,
       CAST(({ZSCORE_BASELINE} * cents - s)
            * ({ZSCORE_BASELINE} * cents - s) AS BIGINT) AS lhs,
       CAST({ZSCORE_K * ZSCORE_K} * ({ZSCORE_BASELINE} * q - s * s) AS BIGINT) AS rhs,
       ({ZSCORE_BASELINE} * cents - s) * ({ZSCORE_BASELINE} * cents - s)
         > {ZSCORE_K * ZSCORE_K} * ({ZSCORE_BASELINE} * q - s * s) AS is_anomaly
FROM w WHERE base_n = {ZSCORE_BASELINE}
ORDER BY event_type, day
"""


@_q("timeseries_zscore_anomaly", _ZSCORE_SQL)
def timeseries_zscore_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-revenue anomaly flags per event type: trailing-7-day
    baseline, 3-sigma test cross-multiplied into exact BIGINTs (no
    sqrt, no division -- the flag AND both test sides are
    value-checked). One window per type partition; at 100 TB the
    daily pre-aggregation collapses the stream before any window
    state exists."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(
        F.sum(F.round(F.col("value") * 100, 0).cast("long"))
        .cast("long")
        .alias("cents")
    )
    tw = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-ZSCORE_BASELINE, -1)
    )
    n, k2 = ZSCORE_BASELINE, ZSCORE_K * ZSCORE_K
    w = (
        daily.withColumn("base_n", F.count("*").over(tw))
        .withColumn("s", F.sum("cents").over(tw))
        .withColumn("q", F.sum(F.col("cents") * F.col("cents")).over(tw))
        .where(F.col("base_n") == n)
    )
    dev = F.lit(n) * F.col("cents") - F.col("s")
    var_num = F.lit(n) * F.col("q") - F.col("s") * F.col("s")
    return w.select(
        "event_type",
        "day",
        F.col("cents").cast("long").alias("cents"),
        (dev * dev).cast("long").alias("lhs"),
        (F.lit(k2) * var_num).cast("long").alias("rhs"),
        (dev * dev > F.lit(k2) * var_num).alias("is_anomaly"),
    ).orderBy("event_type", "day")
