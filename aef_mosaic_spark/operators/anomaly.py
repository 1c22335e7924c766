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
