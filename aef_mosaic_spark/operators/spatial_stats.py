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
                       lon_col: str = "lon",
                       lat_col: str = "lat") -> DataFrame:
    """-> per occupied cell: (cx, cy, x, wi, gi_z) — the local Gi*
    z-score (self-inclusive 9-neighborhood).  Cells whose
    neighborhood is the whole lattice (C = 0) are excluded (the
    statistic is undefined there)."""
    cells = bin_cells(points, cell_deg, lon_col, lat_col) \
        .localCheckpoint(eager=True)
    tot = cells.agg(F.count(F.lit(1)).cast("long").alias("n"),
                    F.sum("x").cast("long").alias("s"),
                    F.sum(F.expr("x * x")).cast("long").alias("sxx"))
    hood = (_neighbor_join(cells, _OFFS9)
            .groupBy(F.col("icx").alias("cx"), F.col("icy").alias("cy"))
            .agg(F.first("xi").alias("x"),
                 F.count(F.lit(1)).cast("long").alias("wi"),
                 F.sum("xj").cast("long").alias("swx")))
    return (hood.crossJoin(F.broadcast(tot))
            .withColumn("_a", F.expr("n * swx - s * wi"))
            .withColumn("_b", F.expr("n * sxx - s * s"))
            .withColumn("_c", F.expr("n * wi - wi * wi"))
            .where(F.expr("_c > 0 AND _b > 0"))
            .select("cx", "cy", "x", "wi",
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
