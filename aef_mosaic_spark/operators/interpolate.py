"""Inverse-distance-weighted (IDW) grid interpolation — scattered
integer points -> regular raster grid (Shepard 1968), cell-blocked
neighbor search, all-integer weight law, oracle-twinned.

Why this op: turning sparse station/sample observations into a
continuous surface is the standard vector->raster interpolation step
(climate surfaces, ground-truth densification for training rasters);
the naive form is a grid x points cross join.

Law (exact in both engines):
  grid node g, point p with integer coords and integer value v
  (cents); candidates at squared distance d2 <= R^2;
  w(p) = WSCALE div (d2 + 1)            -- integer hyperbolic weight
  pred(g) = sum(w * v) div sum(w)       -- integer division
Bounds at WSCALE 10^6: w <= 10^6, |v| < 2^26 cents, so a node with
<= 10^4 in-radius points stays < 2^63 (document denser inputs by
lowering WSCALE).

Scale shape (100 TB): points hash to R-cells once; grid nodes are
emitted into their 9 covering neighbor cells (the SMALL side takes
the 9x, points are never replicated); one equi-join on the cell key +
one groupBy(grid node). No cross join, no driver loop; nodes with
zero in-radius points produce no row (inner-join semantics,
documented).

Behavioral reference: reference engine samples rasters AT points
(operators/raster_vector.py q60); this is the inverse direction,
completing the vector<->raster pair.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

WSCALE = 10 ** 6
GRID_N = 48       # 48 x 48 nodes
GRID_STEP = 660
RADIUS = 700
FIELD = 32000


def idw_grid(spark: SparkSession, points: DataFrame,
             n: int = GRID_N, step: int = GRID_STEP,
             radius: int = RADIUS) -> DataFrame:
    """points: (id, xm, ym, v) integer coords/value -> (gx, gy,
    n_pts, pred) for every grid node with >= 1 point within radius."""
    grid = (spark.range(n * n)
            .select((F.col("id") % n).alias("gx"),
                    F.expr(f"id div {n}").alias("gy"))
            .select("gx", "gy",
                    (F.col("gx") * step).alias("gxm"),
                    (F.col("gy") * step).alias("gym")))
    gcells = (grid
              .withColumn("_dx", F.explode(F.array(*[F.lit(i) for i in (-1, 0, 1)])))
              .withColumn("_dy", F.explode(F.array(*[F.lit(i) for i in (-1, 0, 1)])))
              .select("gx", "gy", "gxm", "gym",
                      (F.expr(f"gxm div {radius}") + F.col("_dx")).alias("_cx"),
                      (F.expr(f"gym div {radius}") + F.col("_dy")).alias("_cy")))
    p = points.select(
        F.col("xm").cast("long").alias("_px"),
        F.col("ym").cast("long").alias("_py"),
        F.col("v").cast("long").alias("_v"),
        F.expr(f"xm div {radius}").alias("_cx"),
        F.expr(f"ym div {radius}").alias("_cy"))
    d2 = ((F.col("gxm") - F.col("_px")) * (F.col("gxm") - F.col("_px"))
          + (F.col("gym") - F.col("_py")) * (F.col("gym") - F.col("_py")))
    w = F.expr(f"{WSCALE} div (_d2 + 1)")
    return (gcells.join(p, on=["_cx", "_cy"])
            .withColumn("_d2", d2)
            .where(F.col("_d2") <= radius * radius)
            .withColumn("_w", w)
            .groupBy("gx", "gy")
            .agg(F.count(F.lit(1)).alias("n_pts"),
                 F.expr("sum(_w * _v) div sum(_w)").alias("pred")))


def order_samples(orders: DataFrame) -> DataFrame:
    """Deterministic sample points from orders: integer coords spread
    over the FIELD, value = o_totalprice in cents."""
    return orders.selectExpr(
        "o_orderkey AS id",
        f"(o_orderkey * 7919) % {FIELD} AS xm",
        f"(o_orderkey * 104729) % {FIELD} AS ym",
        "CAST(floor(o_totalprice * 100 + 0.5e0) AS BIGINT) AS v")


def idw_orders_sql(table: str = "orders", n: int = GRID_N,
                   step: int = GRID_STEP, radius: int = RADIUS) -> str:
    """DuckDB twin: brute-force grid x points theta join (the oracle
    never re-implements the blocking)."""
    return f"""
    WITH pts AS (
      SELECT (o_orderkey * 7919) % {FIELD} AS xm,
             (o_orderkey * 104729) % {FIELD} AS ym,
             floor(o_totalprice * 100 + 0.5e0)::BIGINT AS v
      FROM {table}),
    grid AS (
      SELECT (g % {n})::BIGINT AS gx, (g // {n})::BIGINT AS gy,
             ((g % {n}) * {step})::BIGINT AS gxm,
             ((g // {n}) * {step})::BIGINT AS gym
      FROM (SELECT unnest(generate_series(0, {n * n - 1})) AS g)),
    cand AS (
      SELECT gx, gy,
             ((gxm - xm) * (gxm - xm) + (gym - ym) * (gym - ym)) AS d2,
             v
      FROM grid JOIN pts
        ON (gxm - xm) * (gxm - xm) + (gym - ym) * (gym - ym)
           <= {radius * radius})
    SELECT gx, gy, count(*)::BIGINT AS n_pts,
           (sum(({WSCALE} // (d2 + 1)) * v)::BIGINT
            // sum({WSCALE} // (d2 + 1))::BIGINT) AS pred
    FROM cand GROUP BY gx, gy
    """


# ------------------------------------------------------------------ #
# KDE heatmap — join-free kernel splatting                            #
# ------------------------------------------------------------------ #

KDE_STEP = 250
KDE_R = 600


def kde_heatmap(points: DataFrame, step: int = KDE_STEP,
                radius: int = KDE_R) -> DataFrame:
    """Kernel-density heatmap over integer points -> (cx, cy, n_pts,
    density): Epanechnikov-family kernel splatted from each point onto
    every grid cell whose CENTER lies within `radius`.

    All-integer law (exact in both engines): distances are measured
    in DOUBLED units so the half-unit cell center stays integral —
      ddx = 2*cx*step + step - 2*px
      w   = max(0, 4*radius^2 - (ddx^2 + ddy^2))   (the kernel)
      density(cell) = sum w,  n_pts = count of w > 0 contributions.
    Bounds: w <= 4*radius^2 (1.44e6 at the default), so a cell
    tolerates ~6e12 contributing points before BIGINT overflow.

    Scale shape (100 TB): this is the OPPOSITE blocking choice from
    idw_grid — there the fixed-size grid absorbs the 9x emission and
    a join finds the points; here each POINT emits its own bounded
    (2r+1)^2 cell contributions via one explode, so the whole op is
    scan -> explode -> ONE groupBy(cell): join-free, embarrassingly
    parallel, the map-side combine absorbs local density before the
    single exchange. That is the right shape when points vastly
    outnumber touched cells (GPS heatmaps); idw_grid's shape wins
    when the grid rivals the points."""
    r = radius // step + 1
    seq = F.sequence(F.lit(-r), F.lit(r))
    p = points.select(
        (2 * F.col("xm").cast("long")).alias("_px2"),
        (2 * F.col("ym").cast("long")).alias("_py2"),
        F.expr(f"xm div {step}").alias("_bx"),
        F.expr(f"ym div {step}").alias("_by"))
    cells = (p.withColumn("_dx", F.explode(seq))
             .withColumn("_dy", F.explode(seq))
             .select((F.col("_bx") + F.col("_dx")).alias("cx"),
                     (F.col("_by") + F.col("_dy")).alias("cy"),
                     "_px2", "_py2"))
    ddx = (2 * F.col("cx") * step + step) - F.col("_px2")
    ddy = (2 * F.col("cy") * step + step) - F.col("_py2")
    w = F.lit(4 * radius * radius) - (ddx * ddx + ddy * ddy)
    return (cells.withColumn("_w", w)
            .where(F.col("_w") > 0)
            .groupBy("cx", "cy")
            .agg(F.count(F.lit(1)).cast("long").alias("n_pts"),
                 F.sum("_w").cast("long").alias("density")))


def kde_orders_sql(points_sql: str, step: int = KDE_STEP,
                   radius: int = KDE_R) -> str:
    """DuckDB twin: identical splat law; constant-arg generate_series
    (column-arg lateral is the documented DuckDB trap, CLAUDE.md).
    `points_sql` must yield (id, xm, ym)."""
    r = radius // step + 1
    return f"""
    WITH pts AS ({points_sql}),
    splat AS (
      SELECT (xm // {step} + dx)::BIGINT AS cx,
             (ym // {step} + dy)::BIGINT AS cy,
             (2 * (xm // {step} + dx) * {step} + {step} - 2 * xm)
               AS ddx,
             (2 * (ym // {step} + dy) * {step} + {step} - 2 * ym)
               AS ddy
      FROM pts
      CROSS JOIN (SELECT unnest(generate_series(-{r}, {r})) AS dx) xs
      CROSS JOIN (SELECT unnest(generate_series(-{r}, {r})) AS dy) ys)
    SELECT cx, cy, count(*)::BIGINT AS n_pts,
           sum({4 * radius * radius} - (ddx * ddx + ddy * ddy))::BIGINT
             AS density
    FROM splat
    WHERE {4 * radius * radius} - (ddx * ddx + ddy * ddy) > 0
    GROUP BY cx, cy
    """


# ------------------------------------------------------------------ #
# Areal interpolation — box values redistributed to grid cells        #
# ------------------------------------------------------------------ #

def areal_interpolation(boxes: DataFrame, value_col: str,
                        box_id: str = "box_id") -> DataFrame:
    """Area-weighted reallocation of box-level values onto the
    1-degree cell grid -> (cx, cy, n_boxes, val_u): the classical
    areal-interpolation / dasymetric-lite step (census polygons ->
    analysis raster).  Each box's integer value spreads over the
    cells it intersects proportionally to exact overlap area.

    All-integer law: box edges snap to decidegrees (floor(deg*10 +
    0.5)); cell edges are multiples of 10 decidegrees; overlap widths
    are min/max differences of BIGINTs, so every area is exact; the
    per-cell share is val * 1e6 * area div total_area (truncating
    BIGINT micro-units — conservation holds to < 1 micro-unit *
    cells-per-box).  Degenerate boxes (zero decidegree extent) are
    excluded.

    Scale shape: covered-cell fan-out is a sequence() explode bounded
    by the box footprint (no join at all until the final cell
    groupBy, which is map-side combinable onto the lattice)."""
    b = (boxes.selectExpr(
        f"{box_id} AS bid",
        f"CAST({value_col} AS BIGINT) AS v",
        "CAST(floor(min_lon * 10 + 0.5e0) AS BIGINT) AS bx0",
        "CAST(floor(min_lat * 10 + 0.5e0) AS BIGINT) AS by0",
        "CAST(floor(max_lon * 10 + 0.5e0) AS BIGINT) AS bx1",
        "CAST(floor(max_lat * 10 + 0.5e0) AS BIGINT) AS by1")
        .where("bx1 > bx0 AND by1 > by0")
        .withColumn("atot", F.expr("(bx1 - bx0) * (by1 - by0)")))
    cells = (b
             .withColumn("cx", F.expr(
                 "explode(sequence(CAST(floor(bx0 / 10e0) AS BIGINT),"
                 " CAST(floor((bx1 - 1) / 10e0) AS BIGINT)))"))
             .withColumn("cy", F.expr(
                 "explode(sequence(CAST(floor(by0 / 10e0) AS BIGINT),"
                 " CAST(floor((by1 - 1) / 10e0) AS BIGINT)))"))
             .withColumn("w", F.expr(
                 "least(bx1, (cx + 1) * 10) - greatest(bx0, cx * 10)"))
             .withColumn("h", F.expr(
                 "least(by1, (cy + 1) * 10) - greatest(by0, cy * 10)")))
    return (cells
            .withColumn("val_u",
                        F.expr("(v * 1000000 * w * h) div atot"))
            .groupBy("cx", "cy")
            .agg(F.count(F.lit(1)).cast("long").alias("n_boxes"),
                 F.sum("val_u").cast("long").alias("val_u")))


def areal_interpolation_sql(boxes_sql: str, value_col: str,
                            box_id: str = "box_id") -> str:
    """DuckDB twin — generate_series is not lateral-joinable with a
    column argument, and two unnests in ONE select ZIP instead of
    crossing, so cx and cy each get their own CTE."""
    return f"""
    WITH b AS (
      SELECT {box_id} AS bid, CAST({value_col} AS BIGINT) AS v,
             CAST(floor(min_lon * 10 + 0.5e0) AS BIGINT) AS bx0,
             CAST(floor(min_lat * 10 + 0.5e0) AS BIGINT) AS by0,
             CAST(floor(max_lon * 10 + 0.5e0) AS BIGINT) AS bx1,
             CAST(floor(max_lat * 10 + 0.5e0) AS BIGINT) AS by1
      FROM ({boxes_sql})
      WHERE CAST(floor(max_lon * 10 + 0.5e0) AS BIGINT)
            > CAST(floor(min_lon * 10 + 0.5e0) AS BIGINT)
        AND CAST(floor(max_lat * 10 + 0.5e0) AS BIGINT)
            > CAST(floor(min_lat * 10 + 0.5e0) AS BIGINT)),
    bx AS (SELECT *, (bx1 - bx0) * (by1 - by0) AS atot,
                  unnest(generate_series(
                    CAST(floor(bx0 / 10e0) AS BIGINT),
                    CAST(floor((bx1 - 1) / 10e0) AS BIGINT))) AS cx
           FROM b),
    bxy AS (SELECT *,
                   unnest(generate_series(
                     CAST(floor(by0 / 10e0) AS BIGINT),
                     CAST(floor((by1 - 1) / 10e0) AS BIGINT))) AS cy
            FROM bx),
    sh AS (SELECT cx, cy,
                  (least(bx1, (cx + 1) * 10) - greatest(bx0, cx * 10))
                  * (least(by1, (cy + 1) * 10) - greatest(by0, cy * 10))
                  AS area, v, atot
           FROM bxy)
    SELECT cx, cy, count(*)::BIGINT AS n_boxes,
           sum((v * 1000000 * area) // atot)::BIGINT AS val_u
    FROM sh GROUP BY cx, cy
    """


# ------------------------------------------------------------------ #
# Huff gravity model (spatial interaction / catchment probabilities)  #
# ------------------------------------------------------------------ #

HUFF_WSCALE = 10 ** 9
HUFF_RADIUS_DEG = 4


def huff_probabilities(points: DataFrame, sites: DataFrame,
                       weight_col: str = "w",
                       radius_deg: int = HUFF_RADIUS_DEG,
                       point_id: str = "point_id",
                       site_id: str = "site_id",
                       lon_col: str = "lon", lat_col: str = "lat",
                       broadcast_sites: bool = True) -> DataFrame:
    """Huff (1963) gravity model -> (point_id, site_id, score, p_q):
    the probability a demand point patronizes each site, score_ij =
    w_j / d_ij^2 normalized over the sites within radius_deg — the
    classical retail-catchment / facility-allocation layer.

    Integer law (the q134 IDW weight recipe, re-ranged): the exact
    BIGINT squared microdegree distance is first floor-divided into
    squared-half-centidegree units ds = d2 div 10^10 + 1 (ds in
    1..~3200 at radius 4 deg — quantizing the DECAY, not the
    distance test, and regularizing the self-distance pole), then
    score = w * WSCALE div ds; p = score / sum(score) over the
    point's in-range sites, quantized half-up at 1e6.  Points with no
    in-range site emit nothing.  Range-bounded like q177 (the bound
    IS the semantics — a shopper 400 km away is not a fractional
    customer).

    Scale shape: the ring-1 blocked equi-join (cell = radius,
    provable Chebyshev cover; sites BROADCAST by default — the q177
    lesson: a block-keyed shuffle join makes a mega-city block one
    straggler partition, broadcast_sites=False only for site tables
    beyond executor memory), then ONE window sum per point over
    candidate groups bounded by local site density.

    Overflow: score <= w * WSCALE ~ 10^15 and per-point sums run over
    at most local-density sites — orders of magnitude of headroom
    below 2^63, with full precision at the far edge of the radius
    (ds_max ~ 3200 keeps >= 5 significant digits in the smallest
    score)."""
    from pyspark.sql import Window

    ru = radius_deg * 1_000_000
    qp = (points.select(
        F.col(point_id).alias("pid"),
        F.expr(f"CAST(floor({lon_col} * 1e6 + 0.5e0) AS BIGINT)")
        .alias("px"),
        F.expr(f"CAST(floor({lat_col} * 1e6 + 0.5e0) AS BIGINT)")
        .alias("py"))
        .withColumn("bx", F.expr(f"CAST(floor(px / {ru}e0) AS BIGINT)"))
        .withColumn("by", F.expr(f"CAST(floor(py / {ru}e0) AS BIGINT)")))
    qs = (sites.select(
        F.col(site_id).alias("sid"),
        F.col(weight_col).cast("long").alias("wgt"),
        F.expr(f"CAST(floor({lon_col} * 1e6 + 0.5e0) AS BIGINT)")
        .alias("sx"),
        F.expr(f"CAST(floor({lat_col} * 1e6 + 0.5e0) AS BIGINT)")
        .alias("sy"))
        .withColumn("bx", F.expr(f"CAST(floor(sx / {ru}e0) AS BIGINT)"))
        .withColumn("by", F.expr(f"CAST(floor(sy / {ru}e0) AS BIGINT)")))
    off = F.explode(F.array(*[
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
        for dx in (-1, 0, 1) for dy in (-1, 0, 1)])).alias("o")
    lhs = (qp.select("pid", "px", "py", "bx", "by", off)
           .select("pid", "px", "py",
                   (F.col("bx") + F.col("o.dx")).alias("bx"),
                   (F.col("by") + F.col("o.dy")).alias("by")))
    rhs = F.broadcast(qs) if broadcast_sites else qs
    lhs2 = lhs if broadcast_sites else lhs.hint("shuffle_hash")
    cand = (lhs2.join(rhs, ["bx", "by"])
            .where(F.expr(f"greatest(abs(px - sx), abs(py - sy))"
                          f" <= {ru}"))
            .select("pid", "sid",
                    F.expr(f"(wgt * {HUFF_WSCALE}) div"
                           f" (((px - sx) * (px - sx)"
                           f" + (py - sy) * (py - sy))"
                           f" div 10000000000 + 1)")
                    .alias("score")))
    w = Window.partitionBy("pid")
    return (cand
            .withColumn("_tot", F.sum("score").over(w))
            .select(F.col("pid").alias(point_id),
                    F.col("sid").alias(site_id), "score",
                    F.expr("floor(CAST(score AS DOUBLE)"
                           " / CAST(_tot AS DOUBLE) * 1e6 + 0.5e0)"
                           " / 1e6").alias("p_q")))


def huff_probabilities_sql(points_sql: str, sites_sql: str,
                           weight_col: str = "w",
                           radius_deg: int = HUFF_RADIUS_DEG,
                           point_id: str = "point_id",
                           site_id: str = "site_id",
                           lon_col: str = "lon",
                           lat_col: str = "lat") -> str:
    ru = radius_deg * 1_000_000
    offs = ", ".join(f"({dx}, {dy})"
                     for dx in (-1, 0, 1) for dy in (-1, 0, 1))
    return f"""
    WITH p AS (SELECT {point_id} AS pid,
               CAST(floor({lon_col} * 1e6 + 0.5e0) AS BIGINT) AS px,
               CAST(floor({lat_col} * 1e6 + 0.5e0) AS BIGINT) AS py
               FROM ({points_sql})),
    s AS (SELECT {site_id} AS sid, CAST({weight_col} AS BIGINT) AS wgt,
          CAST(floor({lon_col} * 1e6 + 0.5e0) AS BIGINT) AS sx,
          CAST(floor({lat_col} * 1e6 + 0.5e0) AS BIGINT) AS sy
          FROM ({sites_sql})),
    pb AS (SELECT *, CAST(floor(px / {ru}e0) AS BIGINT) AS bx,
                  CAST(floor(py / {ru}e0) AS BIGINT) AS by FROM p),
    sb AS (SELECT *, CAST(floor(sx / {ru}e0) AS BIGINT) AS bx,
                  CAST(floor(sy / {ru}e0) AS BIGINT) AS by FROM s),
    cand AS MATERIALIZED (
      SELECT pb.pid, sb.sid,
             (sb.wgt * {HUFF_WSCALE}) //
             (((pb.px - sb.sx) * (pb.px - sb.sx)
               + (pb.py - sb.sy) * (pb.py - sb.sy))
              // 10000000000 + 1) AS score
      FROM pb
      JOIN (VALUES {offs}) o(dx, dy) ON true
      JOIN sb ON sb.bx = pb.bx + o.dx AND sb.by = pb.by + o.dy
      WHERE greatest(abs(pb.px - sb.sx), abs(pb.py - sb.sy)) <= {ru}),
    tt AS (SELECT *, sum(score) OVER (PARTITION BY pid) AS tot
           FROM cand)
    SELECT pid AS {point_id}, sid AS {site_id}, score,
           floor(CAST(score AS DOUBLE) / CAST(tot AS DOUBLE)
                 * 1e6 + 0.5e0) / 1e6 AS p_q
    FROM tt
    """
