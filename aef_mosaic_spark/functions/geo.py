"""Great-circle scalar functions — Column exprs with exact DuckDB
twins (no UDFs; the same closed forms both engines evaluate in
doubles).

haversine_km: spherical distance (mean Earth radius 6371.0088 km,
IUGG), the standard "how far apart" refine after a cell-key candidate
join when data is lon/lat rather than projected.
initial_bearing_deg: forward azimuth at the start point, degrees in
[0, 360).

Both are rounded via the floor(x*1e6+0.5)/1e6 law (engine round()
half-tie divergence, CLAUDE.md) when used in gate queries.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0088


def haversine_km(lon1: Column, lat1: Column,
                 lon2: Column, lat2: Column) -> Column:
    p1, p2 = F.radians(lat1), F.radians(lat2)
    dp = F.radians(lat2 - lat1)
    dl = F.radians(lon2 - lon1)
    a = (F.sin(dp / 2) * F.sin(dp / 2)
         + F.cos(p1) * F.cos(p2) * F.sin(dl / 2) * F.sin(dl / 2))
    return 2 * EARTH_RADIUS_KM * F.asin(F.sqrt(F.least(a, F.lit(1.0))))


def _ring_terms(ring: str, n_vertices: int, dialect: str):
    """Unrolled per-edge (x_i, y_i, x_j, y_j) 1-based index exprs for
    a flat [x0,y0,x1,y1,...] ring column. Unrolled because the vertex
    count is a plan-time constant and lambda exprs carry the no-CSE
    hazard in both engines (CLAUDE.md)."""
    def el(i):
        return (f"element_at({ring}, {i})" if dialect == "spark"
                else f"{ring}[{i}]")
    edges = []
    for i in range(n_vertices):
        j = (i + 1) % n_vertices
        edges.append((el(2 * i + 1), el(2 * i + 2),
                      el(2 * j + 1), el(2 * j + 2)))
    return edges


def ring_metrics_exprs(ring: str, n_vertices: int,
                       dialect: str) -> dict[str, str]:
    """area (shoelace, absolute), perimeter, centroid (vertex mean) —
    planar coordinate units; quantize downstream via the 6dp floor
    law when gate-compared."""
    edges = _ring_terms(ring, n_vertices, dialect)
    shoe = " + ".join(f"({xi}) * ({yj}) - ({xj}) * ({yi})"
                      for xi, yi, xj, yj in edges)
    per = " + ".join(f"sqrt((({xj}) - ({xi})) * (({xj}) - ({xi})) + "
                     f"(({yj}) - ({yi})) * (({yj}) - ({yi})))"
                     for xi, yi, xj, yj in edges)
    cx = " + ".join(f"({xi})" for xi, _, _, _ in edges)
    cy = " + ".join(f"({yi})" for _, yi, _, _ in edges)
    return {"area": f"abs({shoe}) / 2",
            "perimeter": per,
            "centroid_x": f"({cx}) / {n_vertices}",
            "centroid_y": f"({cy}) / {n_vertices}"}


def haversine_km_sql(lon1: str, lat1: str, lon2: str, lat2: str) -> str:
    p1, p2 = f"radians({lat1})", f"radians({lat2})"
    dp = f"radians({lat2} - {lat1})"
    dl = f"radians({lon2} - {lon1})"
    a = (f"(sin({dp}/2) * sin({dp}/2) + cos({p1}) * cos({p2}) "
         f"* sin({dl}/2) * sin({dl}/2))")
    return f"(2 * {EARTH_RADIUS_KM!r} * asin(sqrt(least({a}, 1e0))))"


def initial_bearing_deg(lon1: Column, lat1: Column,
                        lon2: Column, lat2: Column) -> Column:
    p1, p2 = F.radians(lat1), F.radians(lat2)
    dl = F.radians(lon2 - lon1)
    y = F.sin(dl) * F.cos(p2)
    x = F.cos(p1) * F.sin(p2) - F.sin(p1) * F.cos(p2) * F.cos(dl)
    return F.pmod(F.degrees(F.atan2(y, x)) + 360.0, F.lit(360.0))


def initial_bearing_deg_sql(lon1: str, lat1: str,
                            lon2: str, lat2: str) -> str:
    p1, p2 = f"radians({lat1})", f"radians({lat2})"
    dl = f"radians({lon2} - {lon1})"
    y = f"(sin({dl}) * cos({p2}))"
    x = f"(cos({p1}) * sin({p2}) - sin({p1}) * cos({p2}) * cos({dl}))"
    # fmod then +360 fmod again == Spark pmod for this range
    return f"fmod(fmod(degrees(atan2({y}, {x})), 360e0) + 360e0, 360e0)"
