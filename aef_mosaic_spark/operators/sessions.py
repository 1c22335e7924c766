"""Gap-based sessionization over an event stream — the standard
"split a user's event history into sessions wherever the gap exceeds
T" operator (web analytics, training-data telemetry, crawl-session
reconstruction), expressed as the canonical one-exchange Spark plan:

    window lag -> gap flag -> running sum (session index) ->
    one groupBy (user, session) for session-level stats

Scale shape (100 TB): BOTH windows and the final groupBy partition by
user_id, so the whole operator is ONE hash exchange on user_id; the
per-user window is bounded by that user's event count (no global
window, no single-task key — the q86 lesson). Skewed mega-users are a
data property; the window itself is sequential per user by semantics.

Exact-parity law: timestamps are reduced to whole epoch seconds
(floor(epoch(ts)) on DuckDB vs unix_timestamp on Spark — CLAUDE.md),
ties within a second break on event_id, and the float `value` column
is quantized to integer MICRO-units per row BEFORE the sum so the
session total is an order-free BIGINT (distributed float sums are
summation-order-dependent).

Behavioral reference: the reference engine has no sessionizer (its
events surface is windowed aggregation only); this is part of the
training-data-pipeline extension surface, same family as
q114_retention_cohorts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_GAP_SEC = 1800


def sessionize(events: DataFrame, user_col: str = "user_id",
               ts_col: str = "ts", id_col: str = "event_id",
               gap_sec: int = DEFAULT_GAP_SEC) -> DataFrame:
    """Per-event session assignment: input columns + `es` (epoch sec)
    + `session_idx` (0-based per user, in time order)."""
    w = (Window.partitionBy(user_col)
         .orderBy("es", id_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    lag_w = Window.partitionBy(user_col).orderBy("es", id_col)
    e = events.withColumn("es", F.unix_timestamp(F.col(ts_col)))
    flagged = e.withColumn(
        "_new",
        F.when(F.col("es") - F.lag("es").over(lag_w) > gap_sec, 1)
        .otherwise(0))
    # first event per user: lag is NULL -> when() falls to otherwise(0)
    # -> running sum starts at 0 for session_idx 0.
    return (flagged
            .withColumn("session_idx", F.sum("_new").over(w))
            .drop("_new"))


def session_stats(events: DataFrame, user_col: str = "user_id",
                  ts_col: str = "ts", id_col: str = "event_id",
                  value_col: str = "value",
                  gap_sec: int = DEFAULT_GAP_SEC) -> DataFrame:
    """-> (user_id, session_idx, n_events, n_types, start_es, end_es,
    duration_sec, value_micro) — one row per session."""
    s = sessionize(events, user_col, ts_col, id_col, gap_sec)
    return (s.withColumn(
                "_vmicro",
                F.floor(F.col(value_col) * 1000000 + F.lit(0.5))
                .cast("long"))
            .groupBy(user_col, "session_idx")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.countDistinct("event_type").alias("n_types"),
                 F.min("es").alias("start_es"),
                 F.max("es").alias("end_es"),
                 (F.max("es") - F.min("es")).alias("duration_sec"),
                 F.sum("_vmicro").alias("value_micro")))


DEFAULT_FUNNEL = ("view", "click", "purchase")


def session_funnel(events: DataFrame, steps=DEFAULT_FUNNEL,
                   user_col: str = "user_id", ts_col: str = "ts",
                   id_col: str = "event_id",
                   gap_sec: int = DEFAULT_GAP_SEC) -> DataFrame:
    """Ordered funnel conversion within sessions -> one row per
    session-start week: (wk, n_sessions, reached_1..reached_K,
    conv_K_micro). A session reaches step k at the EARLIEST event of
    type steps[k] at-or-after its step-(k-1) time (same-second
    ordering counts — the law is min-es-based, deterministic, and
    identical in the SQL twin).

    Plan: sessionize's user_id exchange, then K chained window passes
    on (user, session) — each materializes the previous step time
    before the next conditional min references it (no nested window
    exprs) — then two vocabulary-small groupBys. Still ONE wide
    exchange end-to-end; the windows and the session groupBy all share
    the user_id-prefixed partitioning.
    """
    s = sessionize(events, user_col, ts_col, id_col, gap_sec)
    w = Window.partitionBy(user_col, "session_idx")
    prev = None
    for k, st in enumerate(steps):
        cond = F.col("event_type") == st
        if prev is not None:
            cond = cond & (F.col("es") >= F.col(prev))
        col = f"_t{k}"
        s = s.withColumn(col, F.min(F.when(cond, F.col("es"))).over(w))
        prev = col
    per = s.groupBy(user_col, "session_idx").agg(
        F.floor(F.min("es") / 604800).alias("wk"),
        *[F.max(F.col(f"_t{k}").isNotNull().cast("int"))
          .alias(f"_r{k}") for k in range(len(steps))])
    aggs = [F.count(F.lit(1)).alias("n_sessions")] + \
        [F.sum(f"_r{k}").alias(f"reached_{k + 1}")
         for k in range(len(steps))]
    out = per.groupBy("wk").agg(*aggs)
    last = f"reached_{len(steps)}"
    return out.withColumn(
        "conv_micro",
        F.expr(f"({last} * 2000000 + n_sessions) div (2 * n_sessions)"))


def session_funnel_sql(table: str = "events", steps=DEFAULT_FUNNEL,
                       gap_sec: int = DEFAULT_GAP_SEC) -> str:
    """DuckDB twin of session_funnel — identical chained min-es law."""
    step_ctes, prev_cte, prev_col = [], "sess", None
    for k, st in enumerate(steps):
        cond = f"event_type = '{st}'"
        if prev_col is not None:
            cond += f" AND es >= {prev_col}"
        step_ctes.append(
            f"s{k} AS (SELECT *, min(CASE WHEN {cond} THEN es END) "
            f"OVER (PARTITION BY user_id, session_idx) AS t{k} "
            f"FROM {prev_cte})")
        prev_cte, prev_col = f"s{k}", f"t{k}"
    reach = ", ".join(
        f"max(CASE WHEN t{k} IS NOT NULL THEN 1 ELSE 0 END) AS r{k}"
        for k in range(len(steps)))
    sums = ", ".join(f"sum(r{k})::BIGINT AS reached_{k + 1}"
                     for k in range(len(steps)))
    last = f"(sum(r{len(steps) - 1})::BIGINT)"
    return f"""
    WITH e AS (SELECT user_id, event_id, event_type,
                      floor(epoch(ts))::BIGINT AS es
               FROM {table}),
    flagged AS (
      SELECT *, CASE WHEN es - lag(es) OVER w > {gap_sec} THEN 1
                     ELSE 0 END AS nw
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY es, event_id)),
    sess AS (
      SELECT *, (sum(nw) OVER (PARTITION BY user_id ORDER BY es,
                 event_id ROWS BETWEEN UNBOUNDED PRECEDING AND
                 CURRENT ROW))::BIGINT AS session_idx
      FROM flagged),
    {', '.join(step_ctes)},
    per AS (SELECT user_id, session_idx,
                   floor(min(es) / 604800)::BIGINT AS wk, {reach}
            FROM {prev_cte} GROUP BY user_id, session_idx)
    SELECT wk, count(*)::BIGINT AS n_sessions, {sums},
           ({last} * 2000000 + count(*)) // (2 * count(*)) AS conv_micro
    FROM per GROUP BY wk
    """


def session_stats_sql(table: str = "events",
                      gap_sec: int = DEFAULT_GAP_SEC) -> str:
    """DuckDB twin of session_stats over the testdata events table.
    floor(epoch(ts)) matches Spark unix_timestamp (fractional-second
    gotcha); integer micro-unit sum is order-free in both engines."""
    return f"""
    WITH e AS (SELECT user_id, event_id, event_type,
                      floor(epoch(ts))::BIGINT AS es,
                      floor(value * 1000000 + 0.5e0)::BIGINT AS vmicro
               FROM {table}),
    flagged AS (
      SELECT *, CASE WHEN es - lag(es) OVER w > {gap_sec} THEN 1
                     ELSE 0 END AS nw
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY es, event_id)),
    sess AS (
      SELECT *, (sum(nw) OVER (PARTITION BY user_id ORDER BY es,
                 event_id ROWS BETWEEN UNBOUNDED PRECEDING AND
                 CURRENT ROW))::BIGINT AS session_idx
      FROM flagged)
    SELECT user_id, session_idx,
           count(*)::BIGINT AS n_events,
           count(DISTINCT event_type)::BIGINT AS n_types,
           min(es) AS start_es, max(es) AS end_es,
           max(es) - min(es) AS duration_sec,
           (sum(vmicro))::BIGINT AS value_micro
    FROM sess GROUP BY user_id, session_idx
    """


# ------------------------------------------------------------------ #
# Stay-point detection — spatial sessionization over trajectories    #
# ------------------------------------------------------------------ #

STAY_CELL = 400        # grid cell size (milli-units)
STAY_MIN_SEC = 3600    # minimum dwell to call it a stay


def stay_points(fixes: DataFrame, user_col: str = "user_id",
                ts_col: str = "es", id_col: str = "event_id",
                x_col: str = "xm", y_col: str = "ym",
                cell: int = STAY_CELL,
                min_sec: int = STAY_MIN_SEC) -> DataFrame:
    """Grid-cell stay-point detection (the Li/Zheng 2008 trajectory
    primitive, discretized): a stay is a maximal run of consecutive
    fixes in the SAME cell whose dwell time >= min_sec ->
    (user_id, stay_idx, cell_x, cell_y, n_fixes, start_es, end_es,
    dwell_sec).

    Same one-exchange shape as sessionize: the lag window, the
    run-index cumsum, and the (user, run) groupBy all partition by
    user — sessionization keyed on SPACE change instead of time gap.
    Integer cell quantization keeps the law exact in both engines
    (the reference's geodetic clustering analog without float
    distance)."""
    w = (Window.partitionBy(user_col)
         .orderBy(ts_col, id_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    lag_w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    f = fixes.withColumn("_cx", F.expr(f"{x_col} div {cell}")) \
             .withColumn("_cy", F.expr(f"{y_col} div {cell}"))
    moved = (F.col("_cx") != F.lag("_cx").over(lag_w)) | \
            (F.col("_cy") != F.lag("_cy").over(lag_w))
    runs = (f.withColumn("_new", F.when(moved, 1).otherwise(0))
            .withColumn("stay_idx", F.sum("_new").over(w)))
    return (runs.groupBy(user_col, "stay_idx")
            .agg(F.min("_cx").alias("cell_x"),
                 F.min("_cy").alias("cell_y"),
                 F.count(F.lit(1)).alias("n_fixes"),
                 F.min(ts_col).alias("start_es"),
                 F.max(ts_col).alias("end_es"),
                 (F.max(ts_col) - F.min(ts_col)).alias("dwell_sec"))
            .where(F.col("dwell_sec") >= min_sec))


def event_fixes(events: DataFrame, anchor_sec: int = 7200,
                jitter: int = 50) -> DataFrame:
    """Deterministic trajectory fixes from the events table: each
    user occupies an h32-derived anchor cell per anchor_sec block
    (moving every block) with a small per-event jitter — md5 law,
    identical in the SQL twin."""
    from ..functions.hashes import h32_col

    def anchor(tag):
        return h32_col(F.concat(
            F.lit(tag), F.col("user_id").cast("string"), F.lit("|"),
            F.expr(f"CAST(es div {anchor_sec} AS STRING)"))) % 100000

    def jit(tag):
        return h32_col(F.concat(F.lit(tag),
                                F.col("event_id").cast("string"))) % jitter

    return (events
            .withColumn("es", F.unix_timestamp(F.col("ts")))
            .select("user_id", "event_id", "es",
                    (anchor("sx") + jit("jx")).alias("xm"),
                    (anchor("sy") + jit("jy")).alias("ym")))


def stay_points_sql(table: str = "events", anchor_sec: int = 7200,
                    jitter: int = 50, cell: int = STAY_CELL,
                    min_sec: int = STAY_MIN_SEC) -> str:
    from ..functions.hashes import h32_sql
    ax = h32_sql(f"'sx' || user_id::VARCHAR || '|' || (es // {anchor_sec})::VARCHAR")
    ay = h32_sql(f"'sy' || user_id::VARCHAR || '|' || (es // {anchor_sec})::VARCHAR")
    jx = h32_sql("'jx' || event_id::VARCHAR")
    jy = h32_sql("'jy' || event_id::VARCHAR")
    return f"""
    WITH fx AS (
      SELECT user_id, event_id, es,
             ({ax} % 100000 + {jx} % {jitter}) // {cell} AS cx,
             ({ay} % 100000 + {jy} % {jitter}) // {cell} AS cy
      FROM (SELECT user_id, event_id,
                   floor(epoch(ts))::BIGINT AS es FROM {table})),
    flagged AS (
      SELECT *, CASE WHEN cx <> lag(cx) OVER w
                       OR cy <> lag(cy) OVER w THEN 1 ELSE 0 END AS nw
      FROM fx WINDOW w AS (PARTITION BY user_id ORDER BY es, event_id)),
    runs AS (
      SELECT *, (sum(nw) OVER (PARTITION BY user_id ORDER BY es,
                 event_id ROWS BETWEEN UNBOUNDED PRECEDING AND
                 CURRENT ROW))::BIGINT AS stay_idx
      FROM flagged)
    SELECT user_id, stay_idx,
           min(cx) AS cell_x, min(cy) AS cell_y,
           count(*)::BIGINT AS n_fixes,
           min(es) AS start_es, max(es) AS end_es,
           max(es) - min(es) AS dwell_sec
    FROM runs GROUP BY user_id, stay_idx
    HAVING max(es) - min(es) >= {min_sec}
    """


def stay_transitions(stays: DataFrame, user_col: str = "user_id"
                     ) -> DataFrame:
    """Origin-destination flow matrix over consecutive stay points
    (the trajectory-mining OD aggregation: home->work edges, site
    transition graphs) -> (from_x, from_y, to_x, to_y, n_trips,
    n_users). Consecutive = next stay of the same user in start_es
    order (stay_idx tiebreak). Same single user exchange; the OD
    groupBy output is cell-pair-sized."""
    w = Window.partitionBy(user_col).orderBy("start_es", "stay_idx")
    t = (stays
         .withColumn("_tx", F.lead("cell_x").over(w))
         .withColumn("_ty", F.lead("cell_y").over(w))
         .where(F.col("_tx").isNotNull()))
    return (t.groupBy(F.col("cell_x").alias("from_x"),
                      F.col("cell_y").alias("from_y"),
                      F.col("_tx").alias("to_x"),
                      F.col("_ty").alias("to_y"))
            .agg(F.count(F.lit(1)).alias("n_trips"),
                 F.countDistinct(user_col).alias("n_users")))


def stay_transitions_sql(table: str = "events", **stay_kwargs) -> str:
    """DuckDB twin: q137's stay CTE + one lead window + groupBy."""
    inner = stay_points_sql(table, **stay_kwargs)
    return f"""
    WITH stays AS ({inner}),
    t AS (SELECT user_id, cell_x, cell_y,
                 lead(cell_x) OVER w AS tx, lead(cell_y) OVER w AS ty
          FROM stays
          WINDOW w AS (PARTITION BY user_id ORDER BY start_es, stay_idx))
    SELECT cell_x AS from_x, cell_y AS from_y, tx AS to_x, ty AS to_y,
           count(*)::BIGINT AS n_trips,
           count(DISTINCT user_id)::BIGINT AS n_users
    FROM t WHERE tx IS NOT NULL
    GROUP BY cell_x, cell_y, tx, ty
    """


# ------------------------------------------------------------------ #
# Co-traveler detection (shared space-time keys)                      #
# ------------------------------------------------------------------ #

COTRAVEL_MIN_SHARED = 3
COTRAVEL_MAX_OCCUPANCY = 50


def co_travelers(fixes: DataFrame, user_col: str = "user_id",
                 cell_cols=("cx", "cy"), tb_col: str = "tb",
                 min_shared: int = COTRAVEL_MIN_SHARED,
                 max_occupancy: int = COTRAVEL_MAX_OCCUPANCY
                 ) -> DataFrame:
    """User pairs observed together in >= min_shared distinct
    (cell, time-bucket) keys -> (user_a, user_b, n_shared): convoy /
    co-movement detection over sparse location fixes.

    Law: presence is DISTINCT per (user, cell, tb) — dwell length in
    one key counts once; keys whose occupancy exceeds max_occupancy
    (distinct users) are excluded BEFORE pairing: a stadium cell-hour
    carries no co-movement signal and is exactly the quadratic hot
    join key (the q170 df-cap argument in space-time).  Pairs ordered
    user_a < user_b.

    Scale shape: one distinct on (user, cell, tb); occupancy counted
    by ONE window over the same exchange; the self-join fan-out is
    then bounded by max_occupancy^2 per key; final groupBy is
    map-side combinable onto the pair table."""
    from pyspark.sql import Window

    cc = list(cell_cols)
    pres = (fixes.select(F.col(user_col).alias("u"), *cc,
                         F.col(tb_col).alias("tb"))
            .distinct())
    w = Window.partitionBy(*cc, "tb")
    pres = (pres.withColumn("occ", F.count(F.lit(1)).over(w))
            .where(F.col("occ") <= max_occupancy)
            .drop("occ"))
    a = pres.select(F.col("u").alias("user_a"), *cc, "tb")
    b = pres.select(F.col("u").alias("user_b"), *cc, "tb")
    return (a.join(b, cc + ["tb"])
            .where(F.col("user_a") < F.col("user_b"))
            .groupBy("user_a", "user_b")
            .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
            .where(F.col("n_shared") >= min_shared))


def co_travelers_sql(source_sql: str, user_col: str = "user_id",
                     cell_cols=("cx", "cy"), tb_col: str = "tb",
                     min_shared: int = COTRAVEL_MIN_SHARED,
                     max_occupancy: int = COTRAVEL_MAX_OCCUPANCY
                     ) -> str:
    cc = ", ".join(cell_cols)
    on = " AND ".join(f"b.{c} = a.{c}" for c in cell_cols)
    return f"""
    WITH pres0 AS (
      SELECT DISTINCT {user_col} AS u, {cc}, {tb_col} AS tb
      FROM ({source_sql})),
    pres AS MATERIALIZED (
      SELECT u, {cc}, tb FROM (
        SELECT *, count(*) OVER (PARTITION BY {cc}, tb) AS occ
        FROM pres0)
      WHERE occ <= {max_occupancy})
    SELECT a.u AS user_a, b.u AS user_b, count(*)::BIGINT AS n_shared
    FROM pres a JOIN pres b ON {on} AND b.tb = a.tb AND a.u < b.u
    GROUP BY 1, 2
    HAVING count(*) >= {min_shared}
    """


# ------------------------------------------------------------------ #
# Event-type Markov transition matrix                                 #
# ------------------------------------------------------------------ #

def markov_transitions(events: DataFrame, user_col: str = "user_id",
                       ts_col: str = "ts", id_col: str = "event_id",
                       type_col: str = "event_type") -> DataFrame:
    """First-order Markov transition estimates over per-user event
    streams -> (from_type, to_type, n, total, p_ppm): the behavioral
    "what happens after X" matrix (funnel diagnostics, anomaly
    priors, session simulation).

    Law: transitions are adjacent pairs in (unix_timestamp, event_id)
    order per user; p_ppm = 1e6 * n div total (exact integer parts
    per million over the from-state's outgoing count).

    Scale shape: ONE hash exchange on user for the lead() window,
    then a map-side-combinable groupBy onto the |types|^2 matrix;
    row totals derive FROM that aggregate (scan-audit law), never a
    second corpus pass."""
    from pyspark.sql import Window

    wo = Window.partitionBy(user_col).orderBy("es", id_col)
    pairs = (events
             .withColumn("es", F.unix_timestamp(F.col(ts_col)))
             .withColumn("_to", F.lead(type_col).over(wo))
             .where(F.col("_to").isNotNull())
             .groupBy(F.col(type_col).alias("from_type"),
                      F.col("_to").alias("to_type"))
             .agg(F.count(F.lit(1)).cast("long").alias("n"))
             .localCheckpoint(eager=False))
    totals = pairs.groupBy("from_type").agg(F.sum("n").cast("long")
                                            .alias("total"))
    return (pairs.join(F.broadcast(totals), "from_type")
            .select("from_type", "to_type", "n", "total",
                    F.expr("(1000000 * n) div total").cast("long")
                    .alias("p_ppm")))


def markov_transitions_sql(table: str = "events") -> str:
    return f"""
    WITH e AS (SELECT user_id, event_id, event_type,
                      floor(epoch(ts))::BIGINT AS es
               FROM {table}),
    pr AS (SELECT event_type AS from_type,
                  lead(event_type) OVER (PARTITION BY user_id
                                         ORDER BY es, event_id)
                  AS to_type
           FROM e),
    m AS MATERIALIZED (
      SELECT from_type, to_type, count(*)::BIGINT AS n
      FROM pr WHERE to_type IS NOT NULL
      GROUP BY 1, 2),
    t AS (SELECT from_type, sum(n)::BIGINT AS total FROM m
          GROUP BY from_type)
    SELECT m.from_type, m.to_type, m.n, t.total,
           ((1000000 * m.n) // t.total)::BIGINT AS p_ppm
    FROM m JOIN t USING (from_type)
    """


# ------------------------------------------------------------------ #
# Threshold episodes — gaps-and-islands over a value gate             #
# ------------------------------------------------------------------ #

EPISODE_VCENTS = 40000


def threshold_episodes(events: DataFrame, vcents: int = EPISODE_VCENTS,
                       user_col: str = "user_id", ts_col: str = "ts",
                       id_col: str = "event_id",
                       value_col: str = "value") -> DataFrame:
    """Maximal runs of consecutive above-threshold events per key ->
    (user_id, ep_start_es, n_events, dur_s, vmax_c): episode /
    exceedance detection (alarm storms, fever spells, load spikes) —
    the gaps-and-islands pattern under an integer value gate.

    Law: state = (floor(value*100 + 0.5) >= vcents); island id = the
    running count of state CHANGES in (es, id) order (lag + cumsum),
    so consecutive above-gate events share an id; episodes keyed by
    their first event's timestamp (deterministic).

    Scale shape: one user exchange shared by the lag window, the
    cumsum, and the episode groupBy — the q120 sessionization plan
    with a value gate instead of a time gap."""
    from pyspark.sql import Window

    wo = Window.partitionBy(user_col).orderBy("es", id_col)
    wrun = (Window.partitionBy(user_col).orderBy("es", id_col)
            .rowsBetween(Window.unboundedPreceding, 0))
    e = (events
         .withColumn("es", F.unix_timestamp(F.col(ts_col)))
         .withColumn("vc", F.floor(F.col(value_col) * 100
                                   + F.lit(0.5)).cast("long"))
         .withColumn("st", (F.col("vc") >= vcents).cast("int")))
    # change flag from the PARAMETERIZED window (ADVICE r5 #1: the
    # old F.expr hardcoded user_id/event_id, so non-default column
    # names either failed to resolve or silently keyed on a stray
    # user_id column); same plan for the default names
    prev = F.lag("st").over(wo)
    e = (e.withColumn(
            "_chg",
            F.when(prev.isNull() | (prev != F.col("st")), F.lit(1))
            .otherwise(F.lit(0)))
         .withColumn("_run", F.sum("_chg").over(wrun)))
    return (e.where(F.col("st") == 1)
            .groupBy(user_col, "_run")
            .agg(F.min("es").cast("long").alias("ep_start_es"),
                 F.count(F.lit(1)).cast("long").alias("n_events"),
                 (F.max("es") - F.min("es")).cast("long")
                 .alias("dur_s"),
                 F.max("vc").cast("long").alias("vmax_c"))
            .drop("_run")
            .select(user_col, "ep_start_es", "n_events", "dur_s",
                    "vmax_c"))


def threshold_episodes_sql(table: str = "events",
                           vcents: int = EPISODE_VCENTS) -> str:
    return f"""
    WITH e AS (SELECT user_id, event_id,
                      floor(epoch(ts))::BIGINT AS es,
                      floor(value * 100 + 0.5e0)::BIGINT AS vc
               FROM {table}),
    s AS (SELECT *, (vc >= {vcents})::INT AS st FROM e),
    c AS (SELECT *,
                 CASE WHEN lag(st) OVER w IS NULL THEN 1
                      WHEN lag(st) OVER w != st THEN 1 ELSE 0 END
                 AS chg
          FROM s
          WINDOW w AS (PARTITION BY user_id ORDER BY es, event_id)),
    r AS (SELECT *, sum(chg) OVER (PARTITION BY user_id
                                   ORDER BY es, event_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                            AND CURRENT ROW) AS run
          FROM c)
    SELECT user_id, min(es)::BIGINT AS ep_start_es,
           count(*)::BIGINT AS n_events,
           (max(es) - min(es))::BIGINT AS dur_s,
           max(vc)::BIGINT AS vmax_c
    FROM r WHERE st = 1
    GROUP BY user_id, run
    """
