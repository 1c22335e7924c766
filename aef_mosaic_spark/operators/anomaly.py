"""Rolling z-score anomaly detection over an event stream — the
standard "flag events > k sigma from the trailing-window mean" monitor
(telemetry QA, fraud screens, sensor-drift gates on ingest), as pure
window arithmetic with an ALL-INTEGER decision law.

Law (exact in both engines, no sqrt, no float variance):
  vc   = floor(value * 100 + 0.5)          -- integer cents
  over the trailing frame [win PRECEDING, 1 PRECEDING] per user,
  ordered by (epoch_sec, event_id):
  n, s = sum(vc), ss = sum(vc^2)
  flag iff n >= min_n AND (n*vc - s)^2 > k^2 * (n*ss - s^2)
which is (vc - mean)^2 > k^2 * var scaled by n^2 — exact integer
algebra, order-free, engine-independent. Bounds: |vc| < 2^20 keeps
every term < 2^52 at win <= 64 (Cauchy-Schwarz gives s^2 <= n*ss).

Scale shape (100 TB): ONE hash exchange on user_id; the three window
aggregates share a single frame over the same sort — Spark computes
them in one window physical node. No global window, no Python.

Behavioral reference: reference engine has no anomaly surface; same
events-table extension family as q120/q124 (operators/sessions.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_WIN = 20
DEFAULT_MIN_N = 10
DEFAULT_K = 3


def rolling_anomalies(events: DataFrame, win: int = DEFAULT_WIN,
                      min_n: int = DEFAULT_MIN_N, k: int = DEFAULT_K,
                      user_col: str = "user_id", ts_col: str = "ts",
                      id_col: str = "event_id",
                      value_col: str = "value") -> DataFrame:
    """-> flagged events only: (user_id, event_id, es, vcents,
    win_n)."""
    w = (Window.partitionBy(user_col)
         .orderBy("es", id_col)
         .rowsBetween(-win, -1))
    e = (events
         .withColumn("es", F.unix_timestamp(F.col(ts_col)))
         .withColumn("vcents",
                     F.floor(F.col(value_col) * 100 + F.lit(0.5))
                     .cast("long")))
    stats = (e.withColumn("win_n", F.count(F.lit(1)).over(w))
             .withColumn("_s", F.sum("vcents").over(w))
             .withColumn("_ss",
                         F.sum(F.col("vcents") * F.col("vcents")).over(w)))
    dev = F.col("win_n") * F.col("vcents") - F.col("_s")
    var_n2 = (F.col("win_n") * F.col("_ss")
              - F.col("_s") * F.col("_s"))
    return (stats
            .where((F.col("win_n") >= min_n)
                   & (dev * dev > F.lit(k * k) * var_n2))
            .select(user_col, id_col, "es", "vcents", "win_n"))


# ------------------------------------------------------------------ #
# CUSUM changepoint detection — recursion eliminated into windows     #
# ------------------------------------------------------------------ #

CUSUM_H = 6


def cusum_changepoints(events: DataFrame, h: int = CUSUM_H,
                       user_col: str = "user_id", ts_col: str = "ts",
                       id_col: str = "event_id",
                       value_col: str = "value") -> DataFrame:
    """Two-sided CUSUM level-shift detection (Page 1954) per key ->
    flagged events (user_id, event_id, es, s_pos, s_neg, aad_n).

    The textbook statistic is a recursion — s_i = max(0, s_{i-1} +
    x_i - ref - slack) — which no window frame expresses directly.
    It unrolls exactly: with C_i the running sum of the slack-adjusted
    deviations (C_0 = 0),
        s_i = C_i - min(0, min_{j<=i} C_j)
    (induction: max(0, C_i - m_{i-1}) = C_i - min(C_i, m_{i-1})), so
    running-sum + running-min windows compute it; the negative side
    mirrors with its own adjusted series. Without the slack term ANY
    noisy series drifts past every threshold (measured 999/1000 rows
    flagged on the events table — the v1 bug this slack fixes).

    All-integer law (exact in both engines): vc = floor(value*100 +
    0.5) cents; deviations are scaled by the key's row count n_k so
    the key mean stays exact, and the noise scale is the key's
    average absolute deviation in the same units:
        dev_i = n_k * vc_i - S_k
        aad_n = (sum |dev_i|) div n_k
        slack = aad_n div 2                 (the standard k = 0.5 sigma)
        flag iff s_pos > h * aad_n or s_neg > h * aad_n.
    Constant series: aad_n = 0 -> s = 0 -> clean. h=6 flags ~1-3% on
    the heavy-tailed events table; a planted level shift saturates
    immediately (pytest).

    Scale shape (100 TB): ONE hash exchange on user_id; n_k/S_k/aad_n
    are whole-partition frames and the running sums/extrema share the
    ordered frame over the same sort — no second pass, no join, no
    Python."""
    wk = Window.partitionBy(user_col)
    wo = (Window.partitionBy(user_col)
          .orderBy("es", id_col)
          .rowsBetween(Window.unboundedPreceding, 0))
    e = (events
         .withColumn("es", F.unix_timestamp(F.col(ts_col)))
         .withColumn("vc", F.floor(F.col(value_col) * 100 + F.lit(0.5))
                     .cast("long")))
    e = (e.withColumn("n_k", F.count(F.lit(1)).over(wk))
         .withColumn("_sk", F.sum("vc").over(wk))
         .withColumn("_dev", F.col("n_k") * F.col("vc") - F.col("_sk")))
    e = (e.withColumn("_aad", F.expr("sum(abs(_dev))").over(wk))
         .withColumn("_aad", F.expr("_aad div n_k"))
         .withColumn("_sl", F.expr("_aad div 2")))
    e = (e.withColumn("_cp", F.sum(F.col("_dev") - F.col("_sl")).over(wo))
         .withColumn("_cn", F.sum(-F.col("_dev") - F.col("_sl")).over(wo)))
    e = (e.withColumn("_cpmin", F.least(F.lit(0), F.min("_cp").over(wo)))
         .withColumn("_cnmin", F.least(F.lit(0), F.min("_cn").over(wo))))
    s_pos = F.col("_cp") - F.col("_cpmin")
    s_neg = F.col("_cn") - F.col("_cnmin")
    lim = F.lit(h) * F.col("_aad")
    return (e.where((s_pos > lim) | (s_neg > lim))
            .select(user_col, id_col, "es",
                    s_pos.alias("s_pos"), s_neg.alias("s_neg"),
                    F.col("_aad").cast("long").alias("aad_n")))


def cusum_changepoints_sql(table: str = "events",
                           h: int = CUSUM_H) -> str:
    """DuckDB twin — identical integer law; window functions cannot
    nest, so the running sums and their running minima live in
    successive CTEs."""
    return f"""
    WITH e AS (SELECT user_id, event_id,
                      floor(epoch(ts))::BIGINT AS es,
                      floor(value * 100 + 0.5e0)::BIGINT AS vc
               FROM {table}),
    kk AS (SELECT *,
                  count(*) OVER (PARTITION BY user_id) AS n_k,
                  sum(vc) OVER (PARTITION BY user_id) AS sk
           FROM e),
    dd AS (SELECT *, (n_k * vc - sk)::BIGINT AS dev FROM kk),
    aa AS (SELECT *,
                  (sum(abs(dev)) OVER (PARTITION BY user_id)
                   // n_k)::BIGINT AS aad
           FROM dd),
    c1 AS (SELECT *,
                  sum(dev - aad // 2) OVER w AS cp,
                  sum(-dev - aad // 2) OVER w AS cn
           FROM aa
           WINDOW w AS (PARTITION BY user_id ORDER BY es, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW)),
    cc AS (SELECT *,
                  least(0, min(cp) OVER w) AS cpmin,
                  least(0, min(cn) OVER w) AS cnmin
           FROM c1
           WINDOW w AS (PARTITION BY user_id ORDER BY es, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW))
    SELECT user_id, event_id, es,
           (cp - cpmin)::BIGINT AS s_pos,
           (cn - cnmin)::BIGINT AS s_neg,
           aad AS aad_n
    FROM cc
    WHERE (cp - cpmin) > {h} * aad
       OR (cn - cnmin) > {h} * aad
    """


def rolling_anomalies_sql(table: str = "events",
                          win: int = DEFAULT_WIN,
                          min_n: int = DEFAULT_MIN_N,
                          k: int = DEFAULT_K) -> str:
    """DuckDB twin — identical integer law; floor(epoch()) matches
    Spark unix_timestamp (fractional-second gotcha, CLAUDE.md)."""
    return f"""
    WITH e AS (SELECT user_id, event_id,
                      floor(epoch(ts))::BIGINT AS es,
                      floor(value * 100 + 0.5e0)::BIGINT AS vcents
               FROM {table}),
    st AS (SELECT *,
                  count(*) OVER w AS win_n,
                  sum(vcents) OVER w AS s,
                  sum(vcents * vcents) OVER w AS ss
           FROM e
           WINDOW w AS (PARTITION BY user_id ORDER BY es, event_id
                        ROWS BETWEEN {win} PRECEDING
                                 AND 1 PRECEDING))
    SELECT user_id, event_id, es, vcents, win_n::BIGINT AS win_n
    FROM st
    WHERE win_n >= {min_n}
      AND (win_n * vcents - s)::BIGINT * (win_n * vcents - s)::BIGINT
          > {k * k} * (win_n * ss - s * s)::BIGINT
    """


# ------------------------------------------------------------------ #
# Seasonal profile decomposition — hour-of-day index + residual gate  #
# ------------------------------------------------------------------ #

SEASONAL_MICRO = 10 ** 6
SEASONAL_ANOM_U = 200 * SEASONAL_MICRO


def seasonal_profile(events: DataFrame,
                     anom_u: int = SEASONAL_ANOM_U) -> DataFrame:
    """Hour-of-day seasonal decomposition per event_type ->
    (event_type, hour, n, mean_u, seasonal_u, n_anom): the classical
    additive split value = level + seasonal + residual at its
    smallest (CCNet-era monitoring: "is this hour's traffic shape
    normal for this stream").  mean_u is the hour-slot mean in exact
    integer micro-units; seasonal_u = hour mean - type mean (the
    seasonal index); n_anom counts events whose deseasonalized
    residual |v_u - mean_u(slot)| exceeds anom_u.

    Law (exact integer, both engines): v_u = floor(value*1e6 + 0.5),
    means are truncating BIGINT division of nonnegative sums (no
    negative-division hazard; seasonal_u may be negative but is never
    divided again).

    Scale shape: pass 1 is ONE map-side-combinable groupBy onto the
    (type, hour)-sized profile (type means derive FROM that agg —
    the scan-audit law, no second corpus agg); pass 2 re-scans events
    joined BROADCAST to the <=|types|*24-row profile for the residual
    gate. Two corpus scans total, zero wide shuffles of the big side
    (the q109 two-pass global-statistic shape)."""
    v_u = F.expr("CAST(floor(value * 1e6 + 0.5e0) AS BIGINT)")
    base = events.select(
        "event_type",
        F.expr("(CAST(unix_timestamp(ts) AS BIGINT) div 3600) % 24")
        .cast("int").alias("hour"),
        v_u.alias("v_u"))
    prof = (base.groupBy("event_type", "hour")
            .agg(F.count(F.lit(1)).cast("long").alias("n"),
                 F.sum("v_u").cast("long").alias("s"))
            .localCheckpoint(eager=False))        # 2 consumers below
    tmean = (prof.groupBy("event_type")
             .agg(F.expr("CAST(sum(s) div sum(n) AS BIGINT)")
                  .alias("tmean_u")))
    prof = (prof
            .join(F.broadcast(tmean), "event_type")
            .select("event_type", "hour", "n",
                    F.expr("s div n").cast("long").alias("mean_u"),
                    F.expr("s div n - tmean_u").cast("long")
                    .alias("seasonal_u")))
    anom = (base.join(F.broadcast(prof.select("event_type", "hour",
                                              "mean_u")),
                      ["event_type", "hour"])
            .where(F.expr(f"abs(v_u - mean_u) > {anom_u}"))
            .groupBy("event_type", "hour")
            .agg(F.count(F.lit(1)).cast("long").alias("n_anom")))
    return (prof.join(anom, ["event_type", "hour"], "left")
            .select("event_type", "hour", "n", "mean_u", "seasonal_u",
                    F.coalesce("n_anom", F.lit(0)).cast("long")
                    .alias("n_anom")))


def seasonal_profile_sql(events: str = "events",
                         anom_u: int = SEASONAL_ANOM_U) -> str:
    """DuckDB twin of seasonal_profile (epoch() floors to match
    Spark unix_timestamp)."""
    return f"""
    WITH base AS MATERIALIZED (
      SELECT event_type,
             ((floor(epoch(ts))::BIGINT // 3600) % 24)::INT AS hour,
             CAST(floor(value * 1e6 + 0.5e0) AS BIGINT) AS v_u
      FROM {events}),
    prof0 AS MATERIALIZED (
      SELECT event_type, hour, count(*)::BIGINT AS n,
             sum(v_u)::BIGINT AS s
      FROM base GROUP BY event_type, hour),
    tm AS (SELECT event_type,
                  (sum(s)::BIGINT // sum(n)::BIGINT)::BIGINT AS tmean_u
           FROM prof0 GROUP BY event_type),
    prof AS MATERIALIZED (
      SELECT p.event_type, p.hour, p.n,
             (p.s // p.n)::BIGINT AS mean_u,
             (p.s // p.n - t.tmean_u)::BIGINT AS seasonal_u
      FROM prof0 p JOIN tm t USING (event_type)),
    an AS (
      SELECT b.event_type, b.hour, count(*)::BIGINT AS n_anom
      FROM base b JOIN prof p USING (event_type, hour)
      WHERE abs(b.v_u - p.mean_u) > {anom_u}
      GROUP BY b.event_type, b.hour)
    SELECT prof.event_type, prof.hour, prof.n, prof.mean_u,
           prof.seasonal_u,
           coalesce(an.n_anom, 0)::BIGINT AS n_anom
    FROM prof LEFT JOIN an USING (event_type, hour)
    """


# ------------------------------------------------------------------ #
# Lag-k autocorrelation (ACF) per key series                          #
# ------------------------------------------------------------------ #

ACF_LAGS = (1, 2, 3)


def acf(events: DataFrame, lags=ACF_LAGS, user_col: str = "user_id",
        ts_col: str = "ts", id_col: str = "event_id",
        value_col: str = "value") -> DataFrame:
    """Per-series autocorrelation at small lags -> (user_id, lag, n,
    num, den, acf_q): the "is this stream self-similar / periodic"
    diagnostic that complements q144's CUSUM (level shifts) and q159's
    seasonal profile (calendar shape).

    Integer floor-mean centering law (exact in both engines):
      vc  = floor(value*100 + 0.5)              cents
      m   = S_k div n_k                          (truncating BIGINT)
      r_t = vc_t - m
      num_k = sum_t r_t * r_{t+k}   den = sum_t r_t^2   (BIGINTs)
      acf_q = floor(1e6 * num_k / den + 0.5) / 1e6
    Centering on the floor mean (not n*x - S) keeps r_t at deviation
    scale, so den ~ n * spread^2 stays far from 2^63 at ANY series
    length — the n-scaled dev of q132/q144 squares to n^3 * spread^2
    and overflows around n ~ 2000 at cent scale.

    Rows with n <= lag+1 or den = 0 (constant series) are excluded:
    the statistic is undefined there.

    Scale shape: ONE hash exchange on user_col; the whole-partition
    n/S frames, the lead() lags, and the stacked per-lag products all
    ride the same sort; the final groupBy is map-side combinable onto
    |users| * |lags| rows. No joins, no Python.
    """
    wk = Window.partitionBy(user_col)
    wo = Window.partitionBy(user_col).orderBy("es", id_col)
    e = (events
         .withColumn("es", F.unix_timestamp(F.col(ts_col)))
         .withColumn("vc", F.floor(F.col(value_col) * 100 + F.lit(0.5))
                     .cast("long")))
    e = (e.withColumn("n", F.count(F.lit(1)).over(wk))
         .withColumn("_s", F.sum("vc").over(wk))
         .withColumn("r", F.expr("vc - _s div n")))
    for k in lags:
        e = e.withColumn(f"_l{k}", F.lead("r", k).over(wo))
    stacked = e.select(
        user_col, "n", "r",
        F.explode(F.array(*[
            F.struct(F.lit(k).cast("long").alias("lag"),
                     (F.col("r") * F.col(f"_l{k}")).alias("prod"))
            for k in lags])).alias("t"))
    return (stacked
            .groupBy(user_col, F.col("t.lag").alias("lag"))
            .agg(F.first("n").cast("long").alias("n"),
                 F.sum("t.prod").cast("long").alias("num"),
                 F.sum(F.expr("r * r")).cast("long").alias("den"))
            .where((F.col("n") > F.col("lag") + 1) & (F.col("den") > 0))
            .select(user_col, "lag", "n", "num", "den",
                    F.expr("floor(1e6 * CAST(num AS DOUBLE)"
                           " / CAST(den AS DOUBLE) + 0.5e0) / 1e6")
                    .alias("acf_q")))


def acf_sql(table: str = "events", lags=ACF_LAGS) -> str:
    """DuckDB twin — identical floor-mean integer law; the per-lag
    stack becomes a UNION ALL over the lead columns."""
    leads = ",\n                  ".join(
        f"lead(r, {k}) OVER w AS l{k}" for k in lags)
    arms = "\nUNION ALL\n".join(
        f"SELECT user_id, {k}::BIGINT AS lag, n, r, r * l{k} AS prod"
        f" FROM rr" for k in lags)
    return f"""
    WITH e AS (SELECT user_id, event_id,
                      floor(epoch(ts))::BIGINT AS es,
                      floor(value * 100 + 0.5e0)::BIGINT AS vc
               FROM {table}),
    kk AS (SELECT *,
                  count(*) OVER (PARTITION BY user_id) AS n,
                  sum(vc) OVER (PARTITION BY user_id) AS s
           FROM e),
    r0 AS (SELECT user_id, event_id, es, n,
                  (vc - s // n)::BIGINT AS r
           FROM kk),
    rr AS (SELECT user_id, event_id, es, n, r,
                  {leads}
           FROM r0
           WINDOW w AS (PARTITION BY user_id ORDER BY es, event_id)),
    st AS ({arms})
    SELECT user_id, lag, any_value(n)::BIGINT AS n,
           sum(prod)::BIGINT AS num, sum(r * r)::BIGINT AS den,
           floor(1e6 * CAST(sum(prod) AS DOUBLE)
                 / CAST(sum(r * r) AS DOUBLE) + 0.5e0) / 1e6 AS acf_q
    FROM st
    GROUP BY user_id, lag
    HAVING any_value(n) > lag + 1 AND sum(r * r) > 0
    """


def daily_completeness(events: DataFrame, ts_col: str = "ts"
                       ) -> DataFrame:
    """Ingest-completeness audit -> one row per observed UTC day:
    (day_idx, n_events, gap_before): day_idx = floor(epoch) div
    86400; gap_before = days since the previous OBSERVED day (1 =
    contiguous, k > 1 = k-1 missing days before this one, 0 for the
    first day).  The "did yesterday's partition actually land"
    monitor every scheduled pipeline needs.

    Scale shape: ONE map-side-combinable groupBy collapses the corpus
    to |days| rows; the lag window then runs over that tiny table (a
    single-task window over ~10^3-10^4 rows, not the corpus)."""
    from pyspark.sql import Window

    days = (events
            .select(F.expr(f"CAST(unix_timestamp({ts_col}) AS BIGINT)"
                           " div 86400").alias("day_idx"))
            .groupBy("day_idx")
            .agg(F.count(F.lit(1)).cast("long").alias("n_events")))
    w = Window.orderBy("day_idx")
    return days.withColumn(
        "gap_before",
        F.coalesce(F.col("day_idx") - F.lag("day_idx").over(w),
                   F.lit(0)).cast("long"))


def daily_completeness_sql(table: str = "events") -> str:
    return f"""
    WITH d AS (SELECT floor(epoch(ts))::BIGINT // 86400 AS day_idx,
                      count(*)::BIGINT AS n_events
               FROM {table} GROUP BY 1)
    SELECT day_idx, n_events,
           coalesce(day_idx - lag(day_idx) OVER (ORDER BY day_idx),
                    0)::BIGINT AS gap_before
    FROM d
    """
