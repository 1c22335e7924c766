"""Trajectory-similarity join — partial directed Hausdorff distance
with cell-blocked candidate search, oracle-twinned.

Why this op: "which users/vehicles/vessels move together" is the
standard co-movement primitive (convoy / companion detection, GPS
account linking, fleet dedup). The textbook statistic for "trajectory
A stays close to trajectory B" is the directed Hausdorff distance
H(A->B) = max over a of min over b of d(a, b); the robust form used
in practice is the PARTIAL directed Hausdorff (Huttenlocher, Rucklidge
1993): require only a quantile of A's points to be matched, so a few
GPS glitches don't disqualify a genuine companion pair.

Law (all-integer, exact in both engines): points are integer
coordinates; a point a MATCHES B when some b has
d2(a, b) <= thresh^2. For each directed user pair (ua -> ub):
    n_a       = |A|
    matched_n = #{a in A : a matches B}
    h2        = max over matched a of (min over b of d2(a, b))
emit iff 2 * matched_n >= n_a (the half-coverage partial Hausdorff).
h2 is the exact squared partial-Hausdorff distance at that coverage.

Scale shape (100 TB): NO user x user product anywhere. Points hash to
thresh-cells once; the probe side explodes into its 9 covering
neighbor cells (the J1/q130 blocking law), ONE equi-join on the cell
key produces only true <=thresh candidate point pairs, then two
groupBys — (ua, ub, a_pt) for the min, (ua, ub) for the max/count —
and one broadcast join of the per-user point counts. Pair output is
bounded by users that genuinely co-locate, never the quadratic user
product; a dense mega-cell is a data property (raise thresh
granularity), same as DBSCAN.

Behavioral reference: reference engine has no trajectory surface;
this extends the q137/q140 stay-point family (operators/sessions.py)
with a cross-user similarity output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashes import h32_col, h32_sql

TRAJ_GROUPS = 7
TRAJ_ANCHOR_SEC = 345600   # 4-day blocks: ~8 shared anchors over
                           # the 30-day events span, so planted
                           # companions co-occupy most blocks
TRAJ_JITTER = 60
TRAJ_FIELD = 100000
TRAJ_THRESH = 150
TRAJ_USER_CAP = 150


def traj_fixes(events: DataFrame, groups: int = TRAJ_GROUPS,
               anchor_sec: int = TRAJ_ANCHOR_SEC,
               jitter: int = TRAJ_JITTER,
               user_cap: int = TRAJ_USER_CAP) -> DataFrame:
    """Deterministic co-moving trajectories from the events table:
    users in the same residue class (user_id % groups) share the
    h32-derived anchor cell per time block — planted companions —
    with a per-event jitter; md5 law, identical in SQL. user_cap
    bounds the oracle's brute-force cost (the q130 POINT_CAP
    precedent)."""
    def anchor(tag):
        return h32_col(F.concat(
            F.lit(tag),
            (F.col("user_id") % groups).cast("string"), F.lit("|"),
            F.expr(f"CAST(es div {anchor_sec} AS STRING)"))) % TRAJ_FIELD

    def jit(tag):
        return h32_col(F.concat(F.lit(tag),
                                F.col("event_id").cast("string"))) % jitter

    return (events
            .where(F.col("user_id") < user_cap)
            .withColumn("es", F.unix_timestamp(F.col("ts")))
            .select("user_id", "event_id",
                    (anchor("sx") + jit("jx")).alias("xm"),
                    (anchor("sy") + jit("jy")).alias("ym")))


def hausdorff_pairs(fixes: DataFrame,
                    thresh: int = TRAJ_THRESH) -> DataFrame:
    """Directed partial-Hausdorff companion pairs over (user_id,
    event_id, xm, ym) -> (ua, ub, n_a, matched_n, h2); emitted iff
    2*matched_n >= n_a and ua != ub."""
    t2 = thresh * thresh
    a = fixes.select(F.col("user_id").alias("ua"),
                     F.col("event_id").alias("ae"),
                     F.col("xm").cast("long").alias("ax"),
                     F.col("ym").cast("long").alias("ay"),
                     F.expr(f"xm div {thresh}").alias("_cx"),
                     F.expr(f"ym div {thresh}").alias("_cy"))
    b = (fixes.select(F.col("user_id").alias("ub"),
                      F.col("xm").cast("long").alias("bx"),
                      F.col("ym").cast("long").alias("by"),
                      F.expr(f"xm div {thresh}").alias("_bcx"),
                      F.expr(f"ym div {thresh}").alias("_bcy"))
         .withColumn("_dx", F.explode(F.array(*[F.lit(i) for i in (-1, 0, 1)])))
         .withColumn("_dy", F.explode(F.array(*[F.lit(i) for i in (-1, 0, 1)])))
         .select("ub", "bx", "by",
                 (F.col("_bcx") + F.col("_dx")).alias("_cx"),
                 (F.col("_bcy") + F.col("_dy")).alias("_cy")))
    d2 = ((F.col("ax") - F.col("bx")) * (F.col("ax") - F.col("bx"))
          + (F.col("ay") - F.col("by")) * (F.col("ay") - F.col("by")))
    # shuffle_hash: the 9x-exploded side must never be the broadcast
    # build (Catalyst's estimate is explode-blind — the q130 lesson)
    per_pt = (a.hint("shuffle_hash").join(b, on=["_cx", "_cy"])
              .where((F.col("ua") != F.col("ub")) & (d2 <= F.lit(t2)))
              .groupBy("ua", "ub", "ae")
              .agg(F.min(d2).alias("_d2min")))
    n_a = fixes.groupBy(F.col("user_id").alias("ua")) \
        .agg(F.count(F.lit(1)).cast("long").alias("n_a"))
    return (per_pt.groupBy("ua", "ub")
            .agg(F.count(F.lit(1)).cast("long").alias("matched_n"),
                 F.max("_d2min").cast("long").alias("h2"))
            .join(F.broadcast(n_a), "ua")
            .where(2 * F.col("matched_n") >= F.col("n_a"))
            .select("ua", "ub", "n_a", "matched_n", "h2"))


def hausdorff_pairs_sql(table: str = "events",
                        groups: int = TRAJ_GROUPS,
                        anchor_sec: int = TRAJ_ANCHOR_SEC,
                        jitter: int = TRAJ_JITTER,
                        thresh: int = TRAJ_THRESH,
                        user_cap: int = TRAJ_USER_CAP) -> str:
    """DuckDB twin: brute-force point join under the box prefilter
    (|dx| <= thresh AND |dy| <= thresh is implied by d2 <= thresh^2,
    so the prefilter is semantics-free; the oracle never re-implements
    the cell blocking)."""
    ax = h32_sql(f"'sx' || (user_id % {groups})::VARCHAR || '|' "
                 f"|| (es // {anchor_sec})::VARCHAR")
    ay = h32_sql(f"'sy' || (user_id % {groups})::VARCHAR || '|' "
                 f"|| (es // {anchor_sec})::VARCHAR")
    jx = h32_sql("'jx' || event_id::VARCHAR")
    jy = h32_sql("'jy' || event_id::VARCHAR")
    t2 = thresh * thresh
    return f"""
    WITH fx AS MATERIALIZED (
      SELECT user_id, event_id,
             ({ax} % {TRAJ_FIELD} + {jx} % {jitter})::BIGINT AS xm,
             ({ay} % {TRAJ_FIELD} + {jy} % {jitter})::BIGINT AS ym
      FROM (SELECT user_id, event_id,
                   floor(epoch(ts))::BIGINT AS es
            FROM {table} WHERE user_id < {user_cap})),
    mind AS (
      SELECT a.user_id AS ua, b.user_id AS ub, a.event_id AS ae,
             min((a.xm - b.xm) * (a.xm - b.xm)
                 + (a.ym - b.ym) * (a.ym - b.ym))::BIGINT AS d2min
      FROM fx a JOIN fx b
        ON a.user_id <> b.user_id
       AND abs(a.xm - b.xm) <= {thresh}
       AND abs(a.ym - b.ym) <= {thresh}
       AND (a.xm - b.xm) * (a.xm - b.xm)
           + (a.ym - b.ym) * (a.ym - b.ym) <= {t2}
      GROUP BY a.user_id, b.user_id, a.event_id),
    na AS (SELECT user_id AS ua, count(*)::BIGINT AS n_a
           FROM fx GROUP BY user_id)
    SELECT m.ua, m.ub, na.n_a,
           count(*)::BIGINT AS matched_n,
           max(d2min)::BIGINT AS h2
    FROM mind m JOIN na ON na.ua = m.ua
    GROUP BY m.ua, m.ub, na.n_a
    HAVING 2 * count(*) >= na.n_a
    """


# ------------------------------------------------------------------ #
# Trajectory resampling — fixed time-grid linear interpolation        #
# ------------------------------------------------------------------ #

RESAMPLE_GRID_SEC = 3600


def timed_fixes(events: DataFrame, groups: int = TRAJ_GROUPS,
                anchor_sec: int = TRAJ_ANCHOR_SEC,
                jitter: int = TRAJ_JITTER,
                user_cap: int = TRAJ_USER_CAP) -> DataFrame:
    """traj_fixes with the epoch second retained ->
    (user_id, es, xm, ym), ONE row per (user_id, es): simultaneous
    fixes collapse by min(xm), min(ym) — a documented deterministic
    law so the lead-window segments are unambiguous in both engines."""
    def anchor(tag):
        return h32_col(F.concat(
            F.lit(tag),
            (F.col("user_id") % groups).cast("string"), F.lit("|"),
            F.expr(f"CAST(es div {anchor_sec} AS STRING)"))) % TRAJ_FIELD

    def jit(tag):
        return h32_col(F.concat(F.lit(tag),
                                F.col("event_id").cast("string"))) % jitter

    return (events
            .where(F.col("user_id") < user_cap)
            .withColumn("es", F.unix_timestamp(F.col("ts")))
            .select("user_id", "es",
                    (anchor("sx") + jit("jx")).alias("xm"),
                    (anchor("sy") + jit("jy")).alias("ym"))
            .groupBy("user_id", "es")
            .agg(F.min("xm").alias("xm"), F.min("ym").alias("ym")))


def resample_trajectories(fixes: DataFrame,
                          grid_sec: int = RESAMPLE_GRID_SEC) -> DataFrame:
    """Resample each user's fix sequence onto the fixed epoch grid
    (multiples of grid_sec) by linear interpolation between bracketing
    fixes -> (user_id, gs, xg, yg): the alignment pass every
    trajectory-mining stack runs first (uniform sampling makes
    sequences comparable across devices with different report rates).

    Law (exact integer, both engines): consecutive fixes (es0, p0) ->
    (es1, p1) cover grid epochs gs = g*grid_sec with es0 <= gs < es1
    (half-open; an epoch equal to the LAST fix of a user is excluded
    — documented);
        p(gs) = (p0*(es1 - gs) + p1*(gs - es0)) div (es1 - es0)
    — every term nonnegative, so truncating and flooring division
    agree and there is no negative-division cross-engine hazard.

    Scale shape: ONE user_id exchange for the lead window (the q120
    sessionization exchange), then a narrow explode of
    sequence(g_lo, g_hi) per segment — output rows are bounded by
    span/grid_sec per user, never |fixes|^2; no join anywhere."""
    w = Window.partitionBy("user_id").orderBy("es")
    seg = (fixes
           .select("user_id",
                   F.col("es").alias("es0"),
                   F.col("xm").alias("x0"), F.col("ym").alias("y0"),
                   F.lead("es").over(w).alias("es1"),
                   F.lead("xm").over(w).alias("x1"),
                   F.lead("ym").over(w).alias("y1"))
           .where(F.col("es1").isNotNull()))
    g = F.lit(int(grid_sec))
    seg = seg.select(
        "*",
        F.expr(f"(es0 + {grid_sec} - 1) div {grid_sec}").alias("g_lo"),
        F.expr(f"(es1 - 1) div {grid_sec}").alias("g_hi"))
    return (seg.where(F.col("g_lo") <= F.col("g_hi"))
            .select("user_id", "es0", "es1", "x0", "y0", "x1", "y1",
                    F.explode(F.sequence("g_lo", "g_hi")).alias("gi"))
            .select("user_id", (F.col("gi") * g).alias("gs"),
                    F.expr("(x0 * (es1 - gi * {g}) + x1 * (gi * {g} - es0))"
                           " div (es1 - es0)".format(g=grid_sec))
                    .cast("long").alias("xg"),
                    F.expr("(y0 * (es1 - gi * {g}) + y1 * (gi * {g} - es0))"
                           " div (es1 - es0)".format(g=grid_sec))
                    .cast("long").alias("yg")))


def resample_trajectories_sql(events: str = "events",
                              grid_sec: int = RESAMPLE_GRID_SEC,
                              groups: int = TRAJ_GROUPS,
                              anchor_sec: int = TRAJ_ANCHOR_SEC,
                              jitter: int = TRAJ_JITTER,
                              user_cap: int = TRAJ_USER_CAP) -> str:
    """DuckDB twin of resample_trajectories(timed_fixes(events)).
    generate_series is not lateral-joinable with column args — unnest
    it in the SELECT list (the q-series gotcha); epoch() floors to
    integer seconds to match Spark unix_timestamp."""
    ax = h32_sql(f"'sx' || (user_id % {groups})::VARCHAR || '|' "
                 f"|| (es // {anchor_sec})::VARCHAR")
    ay = h32_sql(f"'sy' || (user_id % {groups})::VARCHAR || '|' "
                 f"|| (es // {anchor_sec})::VARCHAR")
    jx = h32_sql("'jx' || event_id::VARCHAR")
    jy = h32_sql("'jy' || event_id::VARCHAR")
    G = grid_sec
    return f"""
    WITH te AS (
      SELECT user_id, event_id, floor(epoch(ts))::BIGINT AS es
      FROM {events} WHERE user_id < {user_cap}),
    fx AS (
      SELECT user_id, es,
             min({ax} % {TRAJ_FIELD} + {jx} % {jitter})::BIGINT AS xm,
             min({ay} % {TRAJ_FIELD} + {jy} % {jitter})::BIGINT AS ym
      FROM te GROUP BY user_id, es),
    seg AS (
      SELECT user_id, es AS es0, xm AS x0, ym AS y0,
             lead(es) OVER w AS es1,
             lead(xm) OVER w AS x1, lead(ym) OVER w AS y1
      FROM fx WINDOW w AS (PARTITION BY user_id ORDER BY es)),
    segg AS (
      SELECT *, (es0 + {G} - 1) // {G} AS g_lo, (es1 - 1) // {G} AS g_hi
      FROM seg WHERE es1 IS NOT NULL),
    ex AS (
      SELECT user_id, es0, es1, x0, y0, x1, y1,
             unnest(generate_series(g_lo, g_hi)) AS gi
      FROM segg WHERE g_lo <= g_hi)
    SELECT user_id, (gi * {G})::BIGINT AS gs,
           ((x0 * (es1 - gi * {G}) + x1 * (gi * {G} - es0))
            // (es1 - es0))::BIGINT AS xg,
           ((y0 * (es1 - gi * {G}) + y1 * (gi * {G} - es0))
            // (es1 - es0))::BIGINT AS yg
    FROM ex
    """


# ------------------------------------------------------------------ #
# Trajectory simplification — one-pass SED significance filter        #
# ------------------------------------------------------------------ #

SIMPLIFY_TOL = 40


def simplify_trajectories(fixes: DataFrame,
                          tol: int = SIMPLIFY_TOL) -> DataFrame:
    """One-pass trajectory simplification by synchronized Euclidean
    distance (SED — Meratnia & de By 2004, the time-ratio law TD-TR
    builds on) -> (user_id, es, xm, ym, sed2): keep a fix iff its
    squared deviation from the position linearly interpolated AT ITS
    TIMESTAMP between its two temporal neighbors exceeds tol^2;
    endpoints are always kept (sed2 = -1 sentinel).  Dropping a kept
    row loses real signal; dropped rows are within tol of the linear
    prediction — the standard lossy GPS compression gate.

    Law (exact integer, both engines): with neighbors (ta, pa) and
    (tc, pc) and tb strictly between,
        p' = (pa*(tc - tb) + pc*(tb - ta)) div (tc - ta)   [q153 law]
        sed2 = (xb - x'b)^2 + (yb - y'b)^2
    All interpolation terms nonnegative; deviations are bounded by the
    coordinate field (~1e5) so sed2 < 2^63 with huge margin.

    Scale shape: ONE user_id exchange for the lag/lead windows, zero
    joins — a per-row verdict, unlike Douglas-Peucker's recursive
    global argmax (which needs per-trajectory applyInPandas; this
    one-pass gate is the distributable opening-window building
    block)."""
    w = Window.partitionBy("user_id").orderBy("es")
    d = fixes.select(
        "user_id", "es", "xm", "ym",
        F.lag("es").over(w).alias("ta"),
        F.lag("xm").over(w).alias("xa"),
        F.lag("ym").over(w).alias("ya"),
        F.lead("es").over(w).alias("tc"),
        F.lead("xm").over(w).alias("xc"),
        F.lead("ym").over(w).alias("yc"))
    xi = "((xa * (tc - es) + xc * (es - ta)) div (tc - ta))"
    yi = "((ya * (tc - es) + yc * (es - ta)) div (tc - ta))"
    sed2 = F.expr(f"(xm - {xi}) * (xm - {xi}) + (ym - {yi}) * (ym - {yi})")
    d = d.withColumn(
        "sed2",
        F.when(F.col("ta").isNull() | F.col("tc").isNull(),
               F.lit(-1)).otherwise(sed2).cast("long"))
    return (d.where((F.col("sed2") < 0) | (F.col("sed2") > tol * tol))
            .select("user_id", "es", "xm", "ym", "sed2"))


def simplify_trajectories_sql(events: str = "events",
                              tol: int = SIMPLIFY_TOL,
                              groups: int = TRAJ_GROUPS,
                              anchor_sec: int = TRAJ_ANCHOR_SEC,
                              jitter: int = TRAJ_JITTER,
                              user_cap: int = TRAJ_USER_CAP) -> str:
    """DuckDB twin of simplify_trajectories(timed_fixes(events))."""
    ax = h32_sql(f"'sx' || (user_id % {groups})::VARCHAR || '|' "
                 f"|| (es // {anchor_sec})::VARCHAR")
    ay = h32_sql(f"'sy' || (user_id % {groups})::VARCHAR || '|' "
                 f"|| (es // {anchor_sec})::VARCHAR")
    jx = h32_sql("'jx' || event_id::VARCHAR")
    jy = h32_sql("'jy' || event_id::VARCHAR")
    xi = "((xa * (tc - es) + xc * (es - ta)) // (tc - ta))"
    yi = "((ya * (tc - es) + yc * (es - ta)) // (tc - ta))"
    return f"""
    WITH te AS (
      SELECT user_id, event_id, floor(epoch(ts))::BIGINT AS es
      FROM {events} WHERE user_id < {user_cap}),
    fx AS (
      SELECT user_id, es,
             min({ax} % {TRAJ_FIELD} + {jx} % {jitter})::BIGINT AS xm,
             min({ay} % {TRAJ_FIELD} + {jy} % {jitter})::BIGINT AS ym
      FROM te GROUP BY user_id, es),
    nb AS (
      SELECT user_id, es, xm, ym,
             lag(es) OVER w AS ta, lag(xm) OVER w AS xa,
             lag(ym) OVER w AS ya,
             lead(es) OVER w AS tc, lead(xm) OVER w AS xc,
             lead(ym) OVER w AS yc
      FROM fx WINDOW w AS (PARTITION BY user_id ORDER BY es)),
    v AS (
      SELECT user_id, es, xm, ym,
             CASE WHEN ta IS NULL OR tc IS NULL THEN -1
                  ELSE (xm - {xi}) * (xm - {xi})
                       + (ym - {yi}) * (ym - {yi})
             END::BIGINT AS sed2
      FROM nb)
    SELECT user_id, es, xm, ym, sed2
    FROM v WHERE sed2 < 0 OR sed2 > {tol * tol}
    """
