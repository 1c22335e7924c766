"""Spatial autocorrelation statistics over binned point grids.

Global Moran's I (Moran 1950) and local Getis-Ord Gi* hotspot
z-scores (Getis & Ord 1992) with queen-contiguity (8-neighbor)
weights over occupied lattice cells — the two canonical "is this map
spatially random" diagnostics a tiling engine feeds (reference
parity: aef-mosaic exposes zonal + density products; these are the
significance layer on top, computed the same cells-first way as
q145's KDE heatmap).

Binning law (shared with functions/tiles.py): microdegree integer
quantization ix = floor(lon*1e6 + 0.5), then floor-division into
cells of `cell_deg` degrees — floor(ix / c) with c = cell_deg*1e6 as
a DOUBLE divide (exact parity: both engines round the same IEEE
quotient, and at |ix| <= 1.8e8 the true quotient is never within an
ulp of an integer unless it IS one).  Units are OCCUPIED cells only
(absent cells are not lattice members — the standard treatment for
point-derived lattices); x_i = point count per cell.

All-integer interior, one quantized double at the very end:
  dev_i   = n*x_i - S                      (n cells, S = sum x)
  Moran I = (n / S0) * sum_ij w_ij dev_i dev_j / sum_i dev_i^2
            with w_ij = 1 for the 8 queen neighbors, S0 = directed
            neighbor-pair count; num/den/S0 are exact BIGINTs, the
            final ratio is one double expression quantized half-up
            at 1e6 (identical IEEE path in both engines).
  Gi*     = A*sqrt(n-1) / sqrt(B*C) per cell, with (all BIGINT)
              A = n*sum_{j in N+(i)} x_j - S*W_i   (N+ includes self)
              B = n*sum x^2 - S^2
              C = n*W_i - W_i^2
            — the textbook z-score with numerator and denominator
            both multiplied by n^2 so every intermediate is integer;
            sqrt is correctly rounded in both engines.

Scale shape (100 TB of points): ONE map-side-combinable groupBy
collapses points onto the (lattice-sized) cells table; everything
after — the 8/9-offset self-join, the scalar totals, the final agg —
runs on |cells| rows (~1e4-1e6), broadcast-joinable.  The cells agg
is localCheckpointed (scan-audit law: 3 consumers would otherwise
re-scan the corpus 3x).  Multi-scale Moran derives coarser lattices
FROM the checkpointed finest lattice by halving cell keys
(floor(floor(a/b)/2) == floor(a/2b)), never re-scanning points.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MORAN_CELL_DEGS = (4, 8, 16)
GI_CELL_DEG = 8

_Q6 = "floor(({expr}) * 1e6 + 0.5e0) / 1e6"


def bin_cells(points: DataFrame, cell_deg: int,
              lon_col: str = "lon", lat_col: str = "lat") -> DataFrame:
    """-> (cx, cy, x): occupied cells with point counts."""
    c = cell_deg * 1_000_000
    cx = F.expr(f"CAST(floor(CAST(floor({lon_col} * 1e6 + 0.5e0) AS BIGINT)"
                f" / {c}e0) AS BIGINT)")
    cy = F.expr(f"CAST(floor(CAST(floor({lat_col} * 1e6 + 0.5e0) AS BIGINT)"
                f" / {c}e0) AS BIGINT)")
    return (points.select(cx.alias("cx"), cy.alias("cy"))
            .groupBy("cx", "cy")
            .agg(F.count(F.lit(1)).cast("long").alias("x")))


def _cells_sql(source_sql: str, cell_deg: int,
               lon_col: str = "lon", lat_col: str = "lat") -> str:
    c = cell_deg * 1_000_000
    return (f"SELECT CAST(floor(CAST(floor({lon_col} * 1e6 + 0.5e0) AS"
            f" BIGINT) / {c}e0) AS BIGINT) AS cx,"
            f" CAST(floor(CAST(floor({lat_col} * 1e6 + 0.5e0) AS BIGINT)"
            f" / {c}e0) AS BIGINT) AS cy,"
            f" count(*)::BIGINT AS x"
            f" FROM ({source_sql}) GROUP BY 1, 2")


_OFFS8 = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)
          if (dx, dy) != (0, 0)]
_OFFS9 = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]


def _neighbor_join(cells: DataFrame, offs) -> DataFrame:
    """Directed (i -> j) neighbor pairs via offset explode + equi-join
    on the cell key — never a range/cross join; both sides are the
    lattice-sized cells table."""
    off = F.explode(F.array(*[
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
        for dx, dy in offs])).alias("o")
    lhs = (cells.select(F.col("cx").alias("icx"), F.col("cy").alias("icy"),
                        F.col("x").alias("xi"), off)
           .select("icx", "icy", "xi",
                   (F.col("icx") + F.col("o.dx")).alias("cx"),
                   (F.col("icy") + F.col("o.dy")).alias("cy")))
    return lhs.join(cells.withColumnRenamed("x", "xj"), ["cx", "cy"])


def morans_i(points: DataFrame, cell_degs=MORAN_CELL_DEGS,
             lon_col: str = "lon", lat_col: str = "lat") -> DataFrame:
    """-> one row per lattice scale: (cell_deg, n_cells, s0, num,
    den, moran_i).  cell_degs must be doubling (each scale derives
    from the previous by halving keys — one corpus scan total)."""
    degs = sorted(cell_degs)
    for a, b in zip(degs, degs[1:]):
        if b != 2 * a:
            raise ValueError("cell_degs must double at each scale")
    cells = bin_cells(points, degs[0], lon_col, lat_col) \
        .localCheckpoint(eager=True)
    out = None
    for deg in degs:
        if deg != degs[0]:
            cells = (cells
                     .select(F.expr("CAST(floor(cx / 2e0) AS BIGINT)")
                             .alias("cx"),
                             F.expr("CAST(floor(cy / 2e0) AS BIGINT)")
                             .alias("cy"), "x")
                     .groupBy("cx", "cy")
                     .agg(F.sum("x").cast("long").alias("x"))
                     .localCheckpoint(eager=True))
        tot = cells.agg(F.count(F.lit(1)).cast("long").alias("n"),
                        F.sum("x").cast("long").alias("s"))
        pairs = (_neighbor_join(cells, _OFFS8)
                 .crossJoin(F.broadcast(tot))
                 .agg(F.count(F.lit(1)).cast("long").alias("s0"),
                      F.sum(F.expr("(n * xi - s) * (n * xj - s)"))
                      .cast("long").alias("num")))
        den = (cells.crossJoin(F.broadcast(tot))
               .agg(F.first("n").alias("n_cells"),
                    F.sum(F.expr("(n * x - s) * (n * x - s)"))
                    .cast("long").alias("den")))
        q6 = _Q6.format(
            expr="CAST(n_cells AS DOUBLE) * CAST(num AS"
                 " DOUBLE) / (CAST(s0 AS DOUBLE)"
                 " * CAST(den AS DOUBLE))")
        row = (pairs.crossJoin(F.broadcast(den))
               .select(F.lit(deg).cast("long").alias("cell_deg"),
                       "n_cells", "s0", "num", "den",
                       F.expr(f"CASE WHEN s0 * den = 0 THEN NULL"
                              f" ELSE {q6} END").alias("moran_i")))
        out = row if out is None else out.unionByName(row)
    return out


def morans_i_sql(source_sql: str, cell_degs=MORAN_CELL_DEGS,
                 lon_col: str = "lon", lat_col: str = "lat") -> str:
    """DuckDB twin — nested CTE lattices (cells4 -> cells8 -> ...),
    identical halving law."""
    degs = sorted(cell_degs)
    ctes = [f"c0 AS MATERIALIZED ({_cells_sql(source_sql, degs[0], lon_col, lat_col)})"]
    for i in range(1, len(degs)):
        ctes.append(
            f"c{i} AS MATERIALIZED (SELECT"
            f" CAST(floor(cx / 2e0) AS BIGINT) AS cx,"
            f" CAST(floor(cy / 2e0) AS BIGINT) AS cy,"
            f" sum(x)::BIGINT AS x FROM c{i-1} GROUP BY 1, 2)")
    offs = ", ".join(f"({dx}, {dy})" for dx, dy in _OFFS8)
    selects = []
    for i, deg in enumerate(degs):
        selects.append(f"""
  SELECT {deg}::BIGINT AS cell_deg, t.n AS n_cells, p.s0, p.num, d.den,
         CASE WHEN p.s0 * d.den = 0 THEN NULL ELSE
         floor(CAST(t.n AS DOUBLE) * CAST(p.num AS DOUBLE)
               / (CAST(p.s0 AS DOUBLE) * CAST(d.den AS DOUBLE))
               * 1e6 + 0.5e0) / 1e6 END AS moran_i
  FROM (SELECT count(*)::BIGINT AS n, sum(x)::BIGINT AS s FROM c{i}) t,
       (SELECT count(*)::BIGINT AS s0,
               sum((t.n * a.x - t.s) * (t.n * b.x - t.s))::BIGINT AS num
        FROM c{i} a
        JOIN (VALUES {offs}) o(dx, dy) ON true
        JOIN c{i} b ON b.cx = a.cx + o.dx AND b.cy = a.cy + o.dy,
        (SELECT count(*)::BIGINT AS n, sum(x)::BIGINT AS s FROM c{i}) t) p,
       (SELECT sum((t.n * x - t.s) * (t.n * x - t.s))::BIGINT AS den
        FROM c{i},
        (SELECT count(*)::BIGINT AS n, sum(x)::BIGINT AS s FROM c{i}) t) d""")
    return ("WITH " + ",\n".join(ctes) + "\n"
            + "\nUNION ALL\n".join(selects))


def getis_ord_hotspots(points: DataFrame, cell_deg: int = GI_CELL_DEG,
                       lon_col: str = "lon", lat_col: str = "lat",
                       group_col: str | None = None) -> DataFrame:
    """-> per occupied cell: (cx, cy, x, wi, gi_z) — the local Gi*
    z-score (self-inclusive 9-neighborhood).  Cells whose
    neighborhood is the whole lattice (C = 0) are excluded (the
    statistic is undefined there).  With group_col (e.g. a time
    bucket), every lattice, total, and neighborhood is computed
    independently per group — the per-slice Gi* that emerging-hotspot
    analysis stacks over time."""
    gcols = [group_col] if group_col else []
    c = cell_deg * 1_000_000
    cxe = F.expr(f"CAST(floor(CAST(floor({lon_col} * 1e6 + 0.5e0) AS"
                 f" BIGINT) / {c}e0) AS BIGINT)")
    cye = F.expr(f"CAST(floor(CAST(floor({lat_col} * 1e6 + 0.5e0) AS"
                 f" BIGINT) / {c}e0) AS BIGINT)")
    cells = (points.select(*gcols, cxe.alias("cx"), cye.alias("cy"))
             .groupBy(*gcols, "cx", "cy")
             .agg(F.count(F.lit(1)).cast("long").alias("x"))
             .localCheckpoint(eager=True))
    if group_col:
        tot = cells.groupBy(group_col).agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("x").cast("long").alias("s"),
            F.sum(F.expr("x * x")).cast("long").alias("sxx"))
    else:
        tot = cells.agg(F.count(F.lit(1)).cast("long").alias("n"),
                        F.sum("x").cast("long").alias("s"),
                        F.sum(F.expr("x * x")).cast("long").alias("sxx"))
    off = F.explode(F.array(*[
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
        for dx, dy in _OFFS9])).alias("o")
    lhs = (cells.select(*gcols, F.col("cx").alias("icx"),
                        F.col("cy").alias("icy"),
                        F.col("x").alias("xi"), off)
           .select(*gcols, "icx", "icy", "xi",
                   (F.col("icx") + F.col("o.dx")).alias("cx"),
                   (F.col("icy") + F.col("o.dy")).alias("cy")))
    joined = lhs.join(cells.withColumnRenamed("x", "xj"),
                      gcols + ["cx", "cy"])
    hood = (joined
            .groupBy(*gcols, F.col("icx").alias("cx"),
                     F.col("icy").alias("cy"))
            .agg(F.first("xi").alias("x"),
                 F.count(F.lit(1)).cast("long").alias("wi"),
                 F.sum("xj").cast("long").alias("swx")))
    joined_tot = (hood.join(F.broadcast(tot), gcols) if group_col
                  else hood.crossJoin(F.broadcast(tot)))
    return (joined_tot
            .withColumn("_a", F.expr("n * swx - s * wi"))
            .withColumn("_b", F.expr("n * sxx - s * s"))
            .withColumn("_c", F.expr("n * wi - wi * wi"))
            .where(F.expr("_c > 0 AND _b > 0"))
            .select(*gcols, "cx", "cy", "x", "wi",
                    F.expr(_Q6.format(
                        expr="CAST(_a AS DOUBLE)"
                             " * sqrt(CAST(n - 1 AS DOUBLE))"
                             " / sqrt(CAST(_b AS DOUBLE)"
                             " * CAST(_c AS DOUBLE))"))
                    .alias("gi_z")))


def getis_ord_sql(source_sql: str, cell_deg: int = GI_CELL_DEG,
                  lon_col: str = "lon", lat_col: str = "lat") -> str:
    offs = ", ".join(f"({dx}, {dy})" for dx, dy in _OFFS9)
    return f"""
    WITH cells AS MATERIALIZED (
      {_cells_sql(source_sql, cell_deg, lon_col, lat_col)}),
    tot AS (SELECT count(*)::BIGINT AS n, sum(x)::BIGINT AS s,
                   sum(x * x)::BIGINT AS sxx FROM cells),
    hood AS (
      SELECT a.cx, a.cy, any_value(a.x) AS x,
             count(*)::BIGINT AS wi, sum(b.x)::BIGINT AS swx
      FROM cells a
      JOIN (VALUES {offs}) o(dx, dy) ON true
      JOIN cells b ON b.cx = a.cx + o.dx AND b.cy = a.cy + o.dy
      GROUP BY a.cx, a.cy),
    z AS (SELECT h.cx, h.cy, h.x, h.wi,
                 (t.n * h.swx - t.s * h.wi)::BIGINT AS a,
                 (t.n * t.sxx - t.s * t.s)::BIGINT AS b,
                 (t.n * h.wi - h.wi * h.wi)::BIGINT AS c,
                 t.n AS n
          FROM hood h, tot t)
    SELECT cx, cy, x, wi,
           floor(CAST(a AS DOUBLE) * sqrt(CAST(n - 1 AS DOUBLE))
                 / sqrt(CAST(b AS DOUBLE) * CAST(c AS DOUBLE))
                 * 1e6 + 0.5e0) / 1e6 AS gi_z
    FROM z WHERE c > 0 AND b > 0
    """


# ------------------------------------------------------------------ #
# Emerging hotspots: per-time-bucket Gi* + Mann-Kendall trend          #
# ------------------------------------------------------------------ #

MK_MIN_BUCKETS = 3


def emerging_hotspots(points: DataFrame, cell_deg: int = GI_CELL_DEG,
                      min_buckets: int = MK_MIN_BUCKETS,
                      group_col: str = "tb", lon_col: str = "lon",
                      lat_col: str = "lat") -> DataFrame:
    """Space-time hotspot trend (the ESRI "emerging hot spot" shape):
    Gi* per time bucket, then the Mann-Kendall trend statistic over
    each cell's z-series -> (cx, cy, n_t, s_mk, trend in
    emerging|fading|stable).

    Law: per-bucket Gi* is the exact q168 integer law computed
    independently per bucket; z is then frozen to the BIGINT
    micro-units zu = floor(gi_z * 1e6 + 0.5) so the MK sign
    comparisons are integer-exact.  S_MK = sum over bucket pairs
    i < j of sign(zu_j - zu_i); cells present (with a defined Gi*) in
    fewer than min_buckets buckets are excluded.

    Scale shape: the corpus collapses to |buckets| x |cells| rows in
    getis_ord's single groupBy; the MK self-join runs on that small z
    table (checkpointed — 3 consumers), with <= |buckets|^2 rows per
    cell."""
    z = (getis_ord_hotspots(points, cell_deg, lon_col=lon_col,
                            lat_col=lat_col, group_col=group_col)
         .select(F.col(group_col).alias("tb"), "cx", "cy",
                 F.expr("CAST(floor(gi_z * 1e6 + 0.5e0) AS BIGINT)")
                 .alias("zu"))
         .localCheckpoint(eager=True))
    a, b = z.alias("a"), z.alias("b")
    mk = (a.join(b, ["cx", "cy"])
          .where(F.col("a.tb") < F.col("b.tb"))
          .groupBy("cx", "cy")
          .agg(F.sum(F.expr("CASE WHEN b.zu > a.zu THEN 1"
                            " WHEN b.zu < a.zu THEN -1 ELSE 0 END"))
               .cast("long").alias("s_mk")))
    nt = z.groupBy("cx", "cy").agg(F.count(F.lit(1)).cast("long")
                                   .alias("n_t"))
    return (nt.where(F.col("n_t") >= min_buckets)
            .join(mk, ["cx", "cy"])
            .select("cx", "cy", "n_t", "s_mk",
                    F.expr("CASE WHEN s_mk > 0 THEN 'emerging'"
                           " WHEN s_mk < 0 THEN 'fading'"
                           " ELSE 'stable' END").alias("trend")))


def emerging_hotspots_sql(source_sql: str, cell_deg: int = GI_CELL_DEG,
                          min_buckets: int = MK_MIN_BUCKETS,
                          lon_col: str = "lon", lat_col: str = "lat",
                          tb_col: str = "tb") -> str:
    """DuckDB twin — source_sql must yield (tb, lon, lat)."""
    c = cell_deg * 1_000_000
    offs = ", ".join(f"({dx}, {dy})" for dx, dy in _OFFS9)
    return f"""
    WITH cells AS MATERIALIZED (
      SELECT {tb_col} AS tb,
             CAST(floor(CAST(floor({lon_col} * 1e6 + 0.5e0) AS BIGINT)
                        / {c}e0) AS BIGINT) AS cx,
             CAST(floor(CAST(floor({lat_col} * 1e6 + 0.5e0) AS BIGINT)
                        / {c}e0) AS BIGINT) AS cy,
             count(*)::BIGINT AS x
      FROM ({source_sql}) GROUP BY 1, 2, 3),
    tot AS (SELECT tb, count(*)::BIGINT AS n, sum(x)::BIGINT AS s,
                   sum(x * x)::BIGINT AS sxx FROM cells GROUP BY tb),
    hood AS (
      SELECT a.tb, a.cx, a.cy, any_value(a.x) AS x,
             count(*)::BIGINT AS wi, sum(b.x)::BIGINT AS swx
      FROM cells a
      JOIN (VALUES {offs}) o(dx, dy) ON true
      JOIN cells b ON b.tb = a.tb AND b.cx = a.cx + o.dx
                  AND b.cy = a.cy + o.dy
      GROUP BY 1, 2, 3),
    z AS MATERIALIZED (
      SELECT h.tb, h.cx, h.cy,
             floor(CAST(t.n * h.swx - t.s * h.wi AS DOUBLE)
                   * sqrt(CAST(t.n - 1 AS DOUBLE))
                   / sqrt(CAST(t.n * t.sxx - t.s * t.s AS DOUBLE)
                          * CAST(t.n * h.wi - h.wi * h.wi AS DOUBLE))
                   * 1e6 + 0.5e0)::BIGINT AS zu
      FROM hood h JOIN tot t USING (tb)
      WHERE t.n * h.wi - h.wi * h.wi > 0
        AND t.n * t.sxx - t.s * t.s > 0),
    mk AS (SELECT a.cx, a.cy,
                  sum(CASE WHEN b.zu > a.zu THEN 1
                           WHEN b.zu < a.zu THEN -1 ELSE 0 END)::BIGINT
                  AS s_mk
           FROM z a JOIN z b ON b.cx = a.cx AND b.cy = a.cy
                            AND a.tb < b.tb
           GROUP BY 1, 2),
    nt AS (SELECT cx, cy, count(*)::BIGINT AS n_t FROM z GROUP BY 1, 2)
    SELECT nt.cx, nt.cy, nt.n_t, mk.s_mk,
           CASE WHEN mk.s_mk > 0 THEN 'emerging'
                WHEN mk.s_mk < 0 THEN 'fading'
                ELSE 'stable' END AS trend
    FROM nt JOIN mk ON mk.cx = nt.cx AND mk.cy = nt.cy
    WHERE nt.n_t >= {min_buckets}
    """


# ------------------------------------------------------------------ #
# Ripley's K profile (naive, no edge correction)                      #
# ------------------------------------------------------------------ #

RIPLEY_RADII_MDEG = (500_000, 1_000_000, 2_000_000)


def ripley_k(points: DataFrame, radii_mdeg=RIPLEY_RADII_MDEG,
             id_col: str = "point_id", lon_col: str = "lon",
             lat_col: str = "lat") -> DataFrame:
    """Multi-distance clustering profile -> one row per radius:
    (r_mdeg, n_points, n_pairs, mean_neighbors_q): the (uncorrected)
    Ripley K numerator — ordered point pairs within Euclidean
    microdegree distance r — and the mean neighbor count pairs/n.
    Reading: mean_neighbors growing faster than r^2 = clustering at
    that scale; slower = dispersion.

    Law: distances are exact BIGINT squared microdegrees (dx^2 + dy^2
    <= r^2, |dx| <= 3.6e8 so the sum stays < 2^63); self-pairs
    excluded by id; every ordered pair is produced exactly once (the
    offset that maps a's block to b's block is unique).

    Scale shape: the q130 DBSCAN eps-cell blocking — block size = max
    radius, 9-offset explode on the LEFT side then an equi-join on
    the block key, so candidate fan-out is bounded by local density,
    never all-pairs; per-radius counts are conditional aggregates
    over the ONE join (shuffle_hash hint: Catalyst's size estimate is
    explode-blind and would broadcast the 9x side — the measured
    q130 lesson)."""
    rmax = max(radii_mdeg)
    pts = (points.select(
        F.col(id_col).alias("pid"),
        F.expr(f"CAST(floor({lon_col} * 1e6 + 0.5e0) AS BIGINT)")
        .alias("ix"),
        F.expr(f"CAST(floor({lat_col} * 1e6 + 0.5e0) AS BIGINT)")
        .alias("iy"))
        .withColumn("bx", F.expr(f"CAST(floor(ix / {rmax}e0) AS BIGINT)"))
        .withColumn("by", F.expr(f"CAST(floor(iy / {rmax}e0) AS BIGINT)"))
        .localCheckpoint(eager=True))
    tot = pts.agg(F.count(F.lit(1)).cast("long").alias("n_points"))
    off = F.explode(F.array(*[
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
        for dx, dy in _OFFS9])).alias("o")
    lhs = (pts.select(F.col("pid").alias("pa"), F.col("ix").alias("ax"),
                      F.col("iy").alias("ay"), "bx", "by", off)
           .select("pa", "ax", "ay",
                   (F.col("bx") + F.col("o.dx")).alias("bx"),
                   (F.col("by") + F.col("o.dy")).alias("by")))
    joined = (lhs.hint("shuffle_hash")
              .join(pts.select(F.col("pid").alias("pb"), "ix", "iy",
                               "bx", "by"), ["bx", "by"])
              .where(F.col("pa") != F.col("pb"))
              .withColumn("d2", F.expr("(ax - ix) * (ax - ix)"
                                       " + (ay - iy) * (ay - iy)")))
    counts = joined.agg(*[
        F.sum(F.expr(f"CASE WHEN d2 <= {r * r} THEN 1 ELSE 0 END"))
        .cast("long").alias(f"p{r}") for r in radii_mdeg])
    stack = ", ".join(f"{r}L, p{r}" for r in radii_mdeg)
    return (counts.crossJoin(F.broadcast(tot))
            .selectExpr("n_points",
                        f"stack({len(radii_mdeg)}, {stack})"
                        " AS (r_mdeg, n_pairs)")
            .select("r_mdeg", "n_points", "n_pairs",
                    F.expr(_Q6.format(
                        expr="CAST(n_pairs AS DOUBLE)"
                             " / CAST(n_points AS DOUBLE)"))
                    .alias("mean_neighbors_q")))


def ripley_k_sql(source_sql: str, radii_mdeg=RIPLEY_RADII_MDEG,
                 id_col: str = "point_id", lon_col: str = "lon",
                 lat_col: str = "lat") -> str:
    rmax = max(radii_mdeg)
    offs = ", ".join(f"({dx}, {dy})" for dx, dy in _OFFS9)
    arms = ", ".join(
        f"sum(CASE WHEN d2 <= {r * r} THEN 1 ELSE 0 END)::BIGINT"
        f" AS p{r}" for r in radii_mdeg)
    sel = "\nUNION ALL\n".join(
        f"SELECT {r}::BIGINT AS r_mdeg, t.n_points, c.p{r} AS n_pairs,"
        f" floor(CAST(c.p{r} AS DOUBLE) / CAST(t.n_points AS DOUBLE)"
        f" * 1e6 + 0.5e0) / 1e6 AS mean_neighbors_q FROM c, t"
        for r in radii_mdeg)
    return f"""
    WITH pts AS MATERIALIZED (
      SELECT {id_col} AS pid,
             CAST(floor({lon_col} * 1e6 + 0.5e0) AS BIGINT) AS ix,
             CAST(floor({lat_col} * 1e6 + 0.5e0) AS BIGINT) AS iy
      FROM ({source_sql})),
    blk AS MATERIALIZED (
      SELECT pid, ix, iy,
             CAST(floor(ix / {rmax}e0) AS BIGINT) AS bx,
             CAST(floor(iy / {rmax}e0) AS BIGINT) AS by
      FROM pts),
    j AS (SELECT (a.ix - b.ix) * (a.ix - b.ix)
                 + (a.iy - b.iy) * (a.iy - b.iy) AS d2
          FROM blk a
          JOIN (VALUES {offs}) o(dx, dy) ON true
          JOIN blk b ON b.bx = a.bx + o.dx AND b.by = a.by + o.dy
           AND a.pid != b.pid),
    c AS (SELECT {arms} FROM j),
    t AS (SELECT count(*)::BIGINT AS n_points FROM blk)
    {sel}
    """


# ------------------------------------------------------------------ #
# Colocation pattern mining (participation ratios)                    #
# ------------------------------------------------------------------ #

COLOC_RADIUS_MDEG = 2_000_000


def colocation_patterns(points: DataFrame,
                        type_col: str = "etype",
                        id_col: str = "pid",
                        radius_mdeg: int = COLOC_RADIUS_MDEG,
                        lon_col: str = "lon",
                        lat_col: str = "lat") -> DataFrame:
    """Spatial colocation mining (Shekhar & Huang 2001) -> one row
    per ORDERED type pair: (type_a, type_b, n_a, n_near, pr_q) where
    pr = |{a in A with >= 1 B instance within r}| / |A| — the
    participation ratio; min over the two directions is the
    participation index.  "Which feature types systematically occur
    near each other" — the categorical sibling of Ripley's K.

    Law: Euclidean BIGINT squared-microdegree distance (d2 <= r^2),
    self-pairs excluded by id, participation counts are DISTINCT
    a-instances (an a with many nearby b counts once).

    Scale shape: the q174 eps-cell blocked join (cell = r, 9-offset
    explode on the left, shuffle_hash pinned), then distinct on
    (type_a, type_b, a-id) and a groupBy onto the |types|^2 table;
    totals derive from ONE type-count aggregate broadcast back."""
    pts = (points.select(
        F.col(id_col).alias("pid"), F.col(type_col).alias("t"),
        F.expr(f"CAST(floor({lon_col} * 1e6 + 0.5e0) AS BIGINT)")
        .alias("ix"),
        F.expr(f"CAST(floor({lat_col} * 1e6 + 0.5e0) AS BIGINT)")
        .alias("iy"))
        .withColumn("bx", F.expr(f"CAST(floor(ix / {radius_mdeg}e0)"
                                 f" AS BIGINT)"))
        .withColumn("by", F.expr(f"CAST(floor(iy / {radius_mdeg}e0)"
                                 f" AS BIGINT)"))
        .localCheckpoint(eager=True))
    totals = pts.groupBy(F.col("t").alias("type_a")).agg(
        F.count(F.lit(1)).cast("long").alias("n_a"))
    off = F.explode(F.array(*[
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
        for dx in (-1, 0, 1) for dy in (-1, 0, 1)])).alias("o")
    lhs = (pts.select(F.col("pid").alias("pa"), F.col("t").alias("ta"),
                      F.col("ix").alias("ax"), F.col("iy").alias("ay"),
                      "bx", "by", off)
           .select("pa", "ta", "ax", "ay",
                   (F.col("bx") + F.col("o.dx")).alias("bx"),
                   (F.col("by") + F.col("o.dy")).alias("by")))
    near = (lhs.hint("shuffle_hash")
            .join(pts.select(F.col("pid").alias("pb"),
                             F.col("t").alias("tb_"), "ix", "iy",
                             "bx", "by"), ["bx", "by"])
            .where((F.col("pa") != F.col("pb"))
                   & (F.col("ta") != F.col("tb_"))
                   & (F.expr("(ax - ix) * (ax - ix)"
                             " + (ay - iy) * (ay - iy)")
                      <= radius_mdeg * radius_mdeg))
            .select(F.col("ta").alias("type_a"),
                    F.col("tb_").alias("type_b"), "pa")
            .distinct())
    return (near.groupBy("type_a", "type_b")
            .agg(F.count(F.lit(1)).cast("long").alias("n_near"))
            .join(F.broadcast(totals), "type_a")
            .select("type_a", "type_b", "n_a", "n_near",
                    F.expr(_Q6.format(
                        expr="CAST(n_near AS DOUBLE)"
                             " / CAST(n_a AS DOUBLE)")).alias("pr_q")))


def colocation_patterns_sql(source_sql: str,
                            type_col: str = "etype",
                            id_col: str = "pid",
                            radius_mdeg: int = COLOC_RADIUS_MDEG,
                            lon_col: str = "lon",
                            lat_col: str = "lat") -> str:
    offs = ", ".join(f"({dx}, {dy})"
                     for dx in (-1, 0, 1) for dy in (-1, 0, 1))
    return f"""
    WITH pts AS MATERIALIZED (
      SELECT {id_col} AS pid, {type_col} AS t,
             CAST(floor({lon_col} * 1e6 + 0.5e0) AS BIGINT) AS ix,
             CAST(floor({lat_col} * 1e6 + 0.5e0) AS BIGINT) AS iy
      FROM ({source_sql})),
    blk AS MATERIALIZED (
      SELECT *, CAST(floor(ix / {radius_mdeg}e0) AS BIGINT) AS bx,
             CAST(floor(iy / {radius_mdeg}e0) AS BIGINT) AS by
      FROM pts),
    near AS (
      SELECT DISTINCT a.t AS type_a, b.t AS type_b, a.pid AS pa
      FROM blk a
      JOIN (VALUES {offs}) o(dx, dy) ON true
      JOIN blk b ON b.bx = a.bx + o.dx AND b.by = a.by + o.dy
       AND a.pid != b.pid AND a.t != b.t
       AND (a.ix - b.ix) * (a.ix - b.ix)
           + (a.iy - b.iy) * (a.iy - b.iy)
           <= {radius_mdeg}::BIGINT * {radius_mdeg}::BIGINT),
    tot AS (SELECT t AS type_a, count(*)::BIGINT AS n_a
            FROM blk GROUP BY 1)
    SELECT n.type_a, n.type_b, t.n_a, count(*)::BIGINT AS n_near,
           floor(CAST(count(*) AS DOUBLE) / CAST(t.n_a AS DOUBLE)
                 * 1e6 + 0.5e0) / 1e6 AS pr_q
    FROM near n JOIN tot t ON t.type_a = n.type_a
    GROUP BY n.type_a, n.type_b, t.n_a
    """


# ------------------------------------------------------------------ #
# Geary's C — the difference-based autocorrelation twin of Moran      #
# ------------------------------------------------------------------ #

def gearys_c(points: DataFrame, cell_deg: int = GI_CELL_DEG,
             lon_col: str = "lon", lat_col: str = "lat") -> DataFrame:
    """Geary's C (Geary 1954) over the occupied queen lattice -> one
    row (cell_deg, n_cells, s0, diff_num, den, geary_c): C =
    (n-1) * sum_ij w_ij (x_i - x_j)^2 / (2 S0 sum_i (x_i - xbar)^2).
    Moran reads GLOBAL structure (cross-products against the mean),
    Geary reads LOCAL structure (squared neighbor differences) —
    together they are the standard autocorrelation pair; C < 1 means
    positive autocorrelation.

    Integer law: the numerator's difference term scaled by n^2 —
    (n x_i - n x_j)^2 — pairs with the q167 denominator sum (n x_i -
    S)^2 = n^2 * sum (x_i - xbar)^2, so the n^2 cancels in the ratio
    and every intermediate is BIGINT; one quantized double at the
    end, NULL for degenerate lattices."""
    cells = bin_cells(points, cell_deg, lon_col, lat_col) \
        .localCheckpoint(eager=True)
    tot = cells.agg(F.count(F.lit(1)).cast("long").alias("n"),
                    F.sum("x").cast("long").alias("s"))
    pairs = (_neighbor_join(cells, _OFFS8)
             .crossJoin(F.broadcast(tot))
             .agg(F.count(F.lit(1)).cast("long").alias("s0"),
                  F.sum(F.expr("(n * xi - n * xj) * (n * xi - n * xj)"))
                  .cast("long").alias("diff_num")))
    den = (cells.crossJoin(F.broadcast(tot))
           .agg(F.first("n").alias("n_cells"),
                F.sum(F.expr("(n * x - s) * (n * x - s)"))
                .cast("long").alias("den")))
    q6 = _Q6.format(
        expr="CAST(n_cells - 1 AS DOUBLE) * CAST(diff_num AS DOUBLE)"
             " / (2e0 * CAST(s0 AS DOUBLE) * CAST(den AS DOUBLE))")
    return (pairs.crossJoin(F.broadcast(den))
            .select(F.lit(cell_deg).cast("long").alias("cell_deg"),
                    "n_cells", "s0", "diff_num", "den",
                    F.expr(f"CASE WHEN s0 * den = 0 THEN NULL"
                           f" ELSE {q6} END").alias("geary_c")))


def gearys_c_sql(source_sql: str, cell_deg: int = GI_CELL_DEG,
                 lon_col: str = "lon", lat_col: str = "lat") -> str:
    offs = ", ".join(f"({dx}, {dy})" for dx, dy in _OFFS8)
    return f"""
    WITH cells AS MATERIALIZED (
      {_cells_sql(source_sql, cell_deg, lon_col, lat_col)}),
    t AS (SELECT count(*)::BIGINT AS n, sum(x)::BIGINT AS s
          FROM cells),
    p AS (SELECT count(*)::BIGINT AS s0,
                 sum((t.n * a.x - t.n * b.x)
                     * (t.n * a.x - t.n * b.x))::BIGINT AS diff_num
          FROM cells a
          JOIN (VALUES {offs}) o(dx, dy) ON true
          JOIN cells b ON b.cx = a.cx + o.dx AND b.cy = a.cy + o.dy,
          t),
    d AS (SELECT sum((t.n * x - t.s) * (t.n * x - t.s))::BIGINT AS den
          FROM cells, t)
    SELECT {cell_deg}::BIGINT AS cell_deg, t.n AS n_cells, p.s0,
           p.diff_num, d.den,
           CASE WHEN p.s0 * d.den = 0 THEN NULL ELSE
           floor(CAST(t.n - 1 AS DOUBLE) * CAST(p.diff_num AS DOUBLE)
                 / (2e0 * CAST(p.s0 AS DOUBLE) * CAST(d.den AS DOUBLE))
                 * 1e6 + 0.5e0) / 1e6 END AS geary_c
    FROM t, p, d
    """


# ------------------------------------------------------------------ #
# Empirical semivariogram — the kriging precursor                     #
# ------------------------------------------------------------------ #

VARIOGRAM_BINS_MDEG = (500_000, 1_000_000, 2_000_000)


def semivariogram(points: DataFrame, value_col: str = "v",
                  bins_mdeg=VARIOGRAM_BINS_MDEG,
                  id_col: str = "point_id", lon_col: str = "lon",
                  lat_col: str = "lat") -> DataFrame:
    """Empirical (Matheron) semivariogram -> one row per distance
    band: (r_lo_mdeg, r_hi_mdeg, n_pairs, gamma_num, gamma_q):
    gamma(h) = sum (z_i - z_j)^2 / (2 N(h)) over ordered point pairs
    whose separation falls in the band — the spatial-continuity curve
    that precedes any kriging/interpolation choice (read: where the
    curve sills is the correlation range; q134's IDW radius should
    sit inside it).

    Law: distances are exact BIGINT squared microdegrees banded at
    the bin edges (lo^2 < d2 <= hi^2, first band starts > 0); values
    are integer (cents); gamma_num = sum of squared value diffs is
    BIGINT; gamma_q = gamma_num / (2 n_pairs) quantized half-up at
    1e6.  Ordered pairs count each unordered pair twice in BOTH num
    and n_pairs, so gamma is unchanged.

    Scale shape: the q174 blocked pair join at max-bin radius with
    per-band conditional aggregates over the ONE join."""
    rmax = max(bins_mdeg)
    pts = (points.select(
        F.col(id_col).alias("pid"),
        F.col(value_col).cast("long").alias("v"),
        F.expr(f"CAST(floor({lon_col} * 1e6 + 0.5e0) AS BIGINT)")
        .alias("ix"),
        F.expr(f"CAST(floor({lat_col} * 1e6 + 0.5e0) AS BIGINT)")
        .alias("iy"))
        .withColumn("bx", F.expr(f"CAST(floor(ix / {rmax}e0) AS BIGINT)"))
        .withColumn("by", F.expr(f"CAST(floor(iy / {rmax}e0) AS BIGINT)"))
        .localCheckpoint(eager=True))
    off = F.explode(F.array(*[
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
        for dx in (-1, 0, 1) for dy in (-1, 0, 1)])).alias("o")
    lhs = (pts.select(F.col("pid").alias("pa"), F.col("v").alias("va"),
                      F.col("ix").alias("ax"), F.col("iy").alias("ay"),
                      "bx", "by", off)
           .select("pa", "va", "ax", "ay",
                   (F.col("bx") + F.col("o.dx")).alias("bx"),
                   (F.col("by") + F.col("o.dy")).alias("by")))
    joined = (lhs.hint("shuffle_hash")
              .join(pts.select(F.col("pid").alias("pb"),
                               F.col("v").alias("vb"), "ix", "iy",
                               "bx", "by"), ["bx", "by"])
              .where(F.col("pa") != F.col("pb"))
              .select(F.expr("(ax - ix) * (ax - ix)"
                             " + (ay - iy) * (ay - iy)").alias("d2"),
                      F.expr("(va - vb) * (va - vb)").alias("dv2")))
    lo = [0] + list(bins_mdeg[:-1])
    aggs = []
    for l, h in zip(lo, bins_mdeg):
        cond = f"d2 > {l * l} AND d2 <= {h * h}"
        aggs.append(F.sum(F.expr(f"CASE WHEN {cond} THEN 1 ELSE 0"
                                 f" END")).cast("long").alias(f"n{h}"))
        aggs.append(F.sum(F.expr(f"CASE WHEN {cond} THEN dv2 ELSE 0"
                                 f" END")).cast("long").alias(f"g{h}"))
    counts = joined.agg(*aggs)
    stack = ", ".join(f"{l}L, {h}L, n{h}, g{h}"
                      for l, h in zip(lo, bins_mdeg))
    return (counts
            .selectExpr(f"stack({len(bins_mdeg)}, {stack})"
                        " AS (r_lo_mdeg, r_hi_mdeg, n_pairs,"
                        " gamma_num)")
            .select("r_lo_mdeg", "r_hi_mdeg", "n_pairs", "gamma_num",
                    F.expr("CASE WHEN n_pairs = 0 THEN NULL ELSE"
                           " floor(CAST(gamma_num AS DOUBLE)"
                           " / (2e0 * CAST(n_pairs AS DOUBLE)) * 1e6"
                           " + 0.5e0) / 1e6 END").alias("gamma_q")))


def semivariogram_sql(source_sql: str, value_col: str = "v",
                      bins_mdeg=VARIOGRAM_BINS_MDEG,
                      id_col: str = "point_id", lon_col: str = "lon",
                      lat_col: str = "lat") -> str:
    rmax = max(bins_mdeg)
    offs = ", ".join(f"({dx}, {dy})"
                     for dx in (-1, 0, 1) for dy in (-1, 0, 1))
    lo = [0] + list(bins_mdeg[:-1])
    arms = ", ".join(
        f"sum(CASE WHEN d2 > {l * l} AND d2 <= {h * h} THEN 1 ELSE 0"
        f" END)::BIGINT AS n{h},"
        f" sum(CASE WHEN d2 > {l * l} AND d2 <= {h * h} THEN dv2"
        f" ELSE 0 END)::BIGINT AS g{h}"
        for l, h in zip(lo, bins_mdeg))
    sel = "\nUNION ALL\n".join(
        f"SELECT {l}::BIGINT AS r_lo_mdeg, {h}::BIGINT AS r_hi_mdeg,"
        f" n{h} AS n_pairs, g{h} AS gamma_num,"
        f" CASE WHEN n{h} = 0 THEN NULL ELSE"
        f" floor(CAST(g{h} AS DOUBLE) / (2e0 * CAST(n{h} AS DOUBLE))"
        f" * 1e6 + 0.5e0) / 1e6 END AS gamma_q FROM c"
        for l, h in zip(lo, bins_mdeg))
    return f"""
    WITH pts AS MATERIALIZED (
      SELECT {id_col} AS pid, CAST({value_col} AS BIGINT) AS v,
             CAST(floor({lon_col} * 1e6 + 0.5e0) AS BIGINT) AS ix,
             CAST(floor({lat_col} * 1e6 + 0.5e0) AS BIGINT) AS iy
      FROM ({source_sql})),
    blk AS MATERIALIZED (
      SELECT *, CAST(floor(ix / {rmax}e0) AS BIGINT) AS bx,
             CAST(floor(iy / {rmax}e0) AS BIGINT) AS by
      FROM pts),
    j AS (SELECT (a.ix - b.ix) * (a.ix - b.ix)
                 + (a.iy - b.iy) * (a.iy - b.iy) AS d2,
                 (a.v - b.v) * (a.v - b.v) AS dv2
          FROM blk a
          JOIN (VALUES {offs}) o(dx, dy) ON true
          JOIN blk b ON b.bx = a.bx + o.dx AND b.by = a.by + o.dy
           AND a.pid != b.pid),
    c AS (SELECT {arms} FROM j)
    {sel}
    """


# ------------------------------------------------------------------ #
# Local Moran (LISA) — per-cell cluster/outlier classification        #
# ------------------------------------------------------------------ #

def local_moran(points: DataFrame, cell_deg: int = GI_CELL_DEG,
                lon_col: str = "lon", lat_col: str = "lat") -> DataFrame:
    """Anselin's local Moran I_i (LISA, 1995) -> per occupied cell:
    (cx, cy, x, wi, ii_q, quadrant): I_i = n * dev_i * sum_j w_ij
    dev_j / den with dev = n*x - S and den = sum dev^2 (the q167
    denominators — n-scalings cancel exactly), quadrant = HH/LL
    clusters vs HL/LH outliers by the signs of dev_i and its
    neighborhood sum.  Completes the 2x2 with q167/q191 (global) and
    q168 (local z): LISA is what maps WHICH cells drive the global
    statistic.

    All BIGINT until one quantized double; cells with no neighbors
    (wi = 0 after the 8-offset join) emit quadrant 'isolate' and
    NULL ii_q, as do degenerate lattices (den = 0)."""
    cells = bin_cells(points, cell_deg, lon_col, lat_col) \
        .localCheckpoint(eager=True)
    tot = cells.agg(F.count(F.lit(1)).cast("long").alias("n"),
                    F.sum("x").cast("long").alias("s"))
    den_t = (cells.crossJoin(F.broadcast(tot))
             .agg(F.sum(F.expr("(n * x - s) * (n * x - s)"))
                  .cast("long").alias("den")))
    hood = (_neighbor_join(cells, _OFFS8)
            .crossJoin(F.broadcast(tot))
            .groupBy(F.col("icx").alias("cx"), F.col("icy").alias("cy"))
            .agg(F.count(F.lit(1)).cast("long").alias("wi"),
                 F.sum(F.expr("n * xj - s")).cast("long")
                 .alias("sumdev")))
    base = (cells.join(hood, ["cx", "cy"], "left")
            .crossJoin(F.broadcast(tot))
            .crossJoin(F.broadcast(den_t))
            .withColumn("wi", F.coalesce("wi", F.lit(0)))
            .withColumn("sumdev", F.coalesce("sumdev", F.lit(0)))
            .withColumn("_dev", F.expr("n * x - s")))
    q6 = _Q6.format(expr="CAST(n AS DOUBLE) * CAST(_dev AS DOUBLE)"
                         " * CAST(sumdev AS DOUBLE)"
                         " / CAST(den AS DOUBLE)")
    return base.select(
        "cx", "cy", "x", "wi",
        F.expr(f"CASE WHEN wi = 0 OR den = 0 THEN NULL"
               f" ELSE {q6} END").alias("ii_q"),
        F.expr("CASE WHEN wi = 0 THEN 'isolate'"
               " WHEN _dev >= 0 AND sumdev >= 0 THEN 'HH'"
               " WHEN _dev < 0 AND sumdev < 0 THEN 'LL'"
               " WHEN _dev >= 0 THEN 'HL' ELSE 'LH' END")
        .alias("quadrant"))


def local_moran_sql(source_sql: str, cell_deg: int = GI_CELL_DEG,
                    lon_col: str = "lon", lat_col: str = "lat") -> str:
    offs = ", ".join(f"({dx}, {dy})" for dx, dy in _OFFS8)
    return f"""
    WITH cells AS MATERIALIZED (
      {_cells_sql(source_sql, cell_deg, lon_col, lat_col)}),
    t AS (SELECT count(*)::BIGINT AS n, sum(x)::BIGINT AS s
          FROM cells),
    d AS (SELECT sum((t.n * x - t.s) * (t.n * x - t.s))::BIGINT AS den
          FROM cells, t),
    hood AS (
      SELECT a.cx, a.cy, count(*)::BIGINT AS wi,
             sum(t.n * b.x - t.s)::BIGINT AS sumdev
      FROM cells a
      JOIN (VALUES {offs}) o(dx, dy) ON true
      JOIN cells b ON b.cx = a.cx + o.dx AND b.cy = a.cy + o.dy, t
      GROUP BY a.cx, a.cy),
    z AS (SELECT c.cx, c.cy, c.x,
                 coalesce(h.wi, 0)::BIGINT AS wi,
                 coalesce(h.sumdev, 0)::BIGINT AS sumdev,
                 (t.n * c.x - t.s)::BIGINT AS dev, t.n AS n, d.den
          FROM cells c LEFT JOIN hood h ON h.cx = c.cx AND h.cy = c.cy,
               t, d)
    SELECT cx, cy, x, wi,
           CASE WHEN wi = 0 OR den = 0 THEN NULL ELSE
           floor(CAST(n AS DOUBLE) * CAST(dev AS DOUBLE)
                 * CAST(sumdev AS DOUBLE) / CAST(den AS DOUBLE)
                 * 1e6 + 0.5e0) / 1e6 END AS ii_q,
           CASE WHEN wi = 0 THEN 'isolate'
                WHEN dev >= 0 AND sumdev >= 0 THEN 'HH'
                WHEN dev < 0 AND sumdev < 0 THEN 'LL'
                WHEN dev >= 0 THEN 'HL' ELSE 'LH' END AS quadrant
    FROM z
    """


def semivariogram_directional(points: DataFrame, value_col: str = "v",
                              bins_mdeg=VARIOGRAM_BINS_MDEG,
                              id_col: str = "point_id",
                              lon_col: str = "lon",
                              lat_col: str = "lat") -> DataFrame:
    """Directional semivariogram -> (direction, r_lo_mdeg, r_hi_mdeg,
    n_pairs, gamma_num, gamma_q) with direction = 'EW' when the pair
    separation is closer to east-west (|dx| >= |dy|) else 'NS' — the
    anisotropy diagnostic on top of q192: EW and NS curves that sill
    at different ranges mean direction-dependent continuity (and an
    isotropic interpolator like q134's IDW is leaving signal on the
    table).  Same blocked join, same integer law; the direction tag
    is one integer comparison on the exact dx/dy."""
    rmax = max(bins_mdeg)
    pts = (points.select(
        F.col(id_col).alias("pid"),
        F.col(value_col).cast("long").alias("v"),
        F.expr(f"CAST(floor({lon_col} * 1e6 + 0.5e0) AS BIGINT)")
        .alias("ix"),
        F.expr(f"CAST(floor({lat_col} * 1e6 + 0.5e0) AS BIGINT)")
        .alias("iy"))
        .withColumn("bx", F.expr(f"CAST(floor(ix / {rmax}e0) AS BIGINT)"))
        .withColumn("by", F.expr(f"CAST(floor(iy / {rmax}e0) AS BIGINT)"))
        .localCheckpoint(eager=True))
    off = F.explode(F.array(*[
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
        for dx in (-1, 0, 1) for dy in (-1, 0, 1)])).alias("o")
    lhs = (pts.select(F.col("pid").alias("pa"), F.col("v").alias("va"),
                      F.col("ix").alias("ax"), F.col("iy").alias("ay"),
                      "bx", "by", off)
           .select("pa", "va", "ax", "ay",
                   (F.col("bx") + F.col("o.dx")).alias("bx"),
                   (F.col("by") + F.col("o.dy")).alias("by")))
    joined = (lhs.hint("shuffle_hash")
              .join(pts.select(F.col("pid").alias("pb"),
                               F.col("v").alias("vb"), "ix", "iy",
                               "bx", "by"), ["bx", "by"])
              .where(F.col("pa") != F.col("pb"))
              .select(F.expr("CASE WHEN abs(ax - ix) >= abs(ay - iy)"
                             " THEN 'EW' ELSE 'NS' END")
                      .alias("direction"),
                      F.expr("(ax - ix) * (ax - ix)"
                             " + (ay - iy) * (ay - iy)").alias("d2"),
                      F.expr("(va - vb) * (va - vb)").alias("dv2")))
    lo = [0] + list(bins_mdeg[:-1])
    arms = " ".join(
        f"WHEN d2 > {l * l} AND d2 <= {h * h} THEN {h}"
        for l, h in zip(lo, bins_mdeg))
    lomap = {h: l for l, h in zip(lo, bins_mdeg)}
    tagged = joined.withColumn(
        "r_hi_mdeg", F.expr(f"CASE {arms} ELSE NULL END").cast("long")) \
        .where(F.col("r_hi_mdeg").isNotNull())
    lo_arms = " ".join(f"WHEN r_hi_mdeg = {h} THEN {l}"
                       for h, l in lomap.items())
    return (tagged
            .groupBy("direction", "r_hi_mdeg")
            .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"),
                 F.sum("dv2").cast("long").alias("gamma_num"))
            .withColumn("r_lo_mdeg",
                        F.expr(f"CASE {lo_arms} END").cast("long"))
            .select("direction", "r_lo_mdeg", "r_hi_mdeg", "n_pairs",
                    "gamma_num",
                    F.expr("floor(CAST(gamma_num AS DOUBLE)"
                           " / (2e0 * CAST(n_pairs AS DOUBLE)) * 1e6"
                           " + 0.5e0) / 1e6").alias("gamma_q")))


def semivariogram_directional_sql(source_sql: str, value_col: str = "v",
                                  bins_mdeg=VARIOGRAM_BINS_MDEG,
                                  id_col: str = "point_id",
                                  lon_col: str = "lon",
                                  lat_col: str = "lat") -> str:
    rmax = max(bins_mdeg)
    offs = ", ".join(f"({dx}, {dy})"
                     for dx in (-1, 0, 1) for dy in (-1, 0, 1))
    lo = [0] + list(bins_mdeg[:-1])
    arms = " ".join(f"WHEN d2 > {l * l} AND d2 <= {h * h} THEN {h}"
                    for l, h in zip(lo, bins_mdeg))
    lo_arms = " ".join(f"WHEN r_hi_mdeg = {h} THEN {l}"
                       for l, h in zip(lo, bins_mdeg))
    return f"""
    WITH pts AS MATERIALIZED (
      SELECT {id_col} AS pid, CAST({value_col} AS BIGINT) AS v,
             CAST(floor({lon_col} * 1e6 + 0.5e0) AS BIGINT) AS ix,
             CAST(floor({lat_col} * 1e6 + 0.5e0) AS BIGINT) AS iy
      FROM ({source_sql})),
    blk AS MATERIALIZED (
      SELECT *, CAST(floor(ix / {rmax}e0) AS BIGINT) AS bx,
             CAST(floor(iy / {rmax}e0) AS BIGINT) AS by
      FROM pts),
    j AS (SELECT CASE WHEN abs(a.ix - b.ix) >= abs(a.iy - b.iy)
                      THEN 'EW' ELSE 'NS' END AS direction,
                 (a.ix - b.ix) * (a.ix - b.ix)
                 + (a.iy - b.iy) * (a.iy - b.iy) AS d2,
                 (a.v - b.v) * (a.v - b.v) AS dv2
          FROM blk a
          JOIN (VALUES {offs}) o(dx, dy) ON true
          JOIN blk b ON b.bx = a.bx + o.dx AND b.by = a.by + o.dy
           AND a.pid != b.pid),
    tg AS (SELECT direction, dv2,
                  (CASE {arms} ELSE NULL END)::BIGINT AS r_hi_mdeg
           FROM j)
    SELECT direction,
           (CASE {lo_arms} END)::BIGINT AS r_lo_mdeg,
           r_hi_mdeg, count(*)::BIGINT AS n_pairs,
           sum(dv2)::BIGINT AS gamma_num,
           floor(CAST(sum(dv2) AS DOUBLE)
                 / (2e0 * CAST(count(*) AS DOUBLE)) * 1e6 + 0.5e0)
           / 1e6 AS gamma_q
    FROM tg WHERE r_hi_mdeg IS NOT NULL
    GROUP BY direction, r_hi_mdeg
    """
