"""Web-mercator XYZ tile addressing (slippy-map z/x/y + morton key)
as Column exprs with exact DuckDB twins.

The tile grid is the public OSM/slippy scheme: at zoom z the world is
2^z x 2^z tiles; x = floor((lon+180)/360 * 2^z); y from the mercator
projection ln(tan(pi/4 + lat/2)). This is the key a tile-serving /
tile-sharded layout partitions on — same role as the reference's
internal chunk keyspace (src/index/output_grid.rs behavior), web-tile
law instead of a projected chunk grid.

Exact-parity recipe (the q79 family, pushed further):
 1. lon/lat quantize to integer MICRODEGREES first (exact in both
    engines: floor(v*1e6+0.5)::BIGINT).
 2. x is then PURE integer math: (ilon + 180e6) * 2^z // 360e6 —
    bit-exact, no float anywhere (2^z * 360e6 < 2^63 for z <= 34).
 3. y needs one transcendental (ln∘tan) evaluated on the QUANTIZED
    lat; the resulting [0,1] fraction is quantized to 1e-7 half-up
    into an integer BEFORE the tile multiply, so a few-ulp libm vs
    java.lang.Math divergence cannot flip floor() at a tile boundary
    (boundary-adjacent quotients are >= 1e-7 away by construction).
 4. the morton key is an UNROLLED sum of (bit << position) terms
    generated per-dialect in Python — no lambdas (DuckDB re-evaluates
    inlined list exprs per call), no column-valued shift counts
    (PySpark Column-API gotcha), just 2*z literal-shift terms that
    whole-stage codegen folds into one expression.

Scale: zero-exchange, zero-UDF — rides the scan; the morton key is a
range-partition / clustering key (locality like grid.hilbert_d, but
addressable from raw lon/lat with no grid object).

Both dialects are generated from ONE template; the only divergences
are integer division (`div` vs `//`) and shift spelling
(shiftleft/shiftright functions vs `<<`/`>>` operators).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEFAULT_ZOOM = 12

# web-mercator validity: |lat| <= atan(sinh(pi)) = 85.05112878 deg
MAX_LAT_MICRO = 85_051_128


def _texprs(lon_sql: str, lat_sql: str, zoom: int,
            dialect: str) -> dict[str, str]:
    """tile_x / tile_y / morton SQL strings for one dialect
    ('spark' | 'duckdb') from lon/lat column expressions."""
    n = 1 << zoom
    if dialect == "spark":
        def idiv(a, b):
            return f"(({a}) div {b})"
        def shl(a, k):
            return f"shiftleft({a}, {k})"
        def shr(a, k):
            return f"shiftright({a}, {k})"
    elif dialect == "duckdb":
        def idiv(a, b):
            return f"(({a}) // {b})"
        def shl(a, k):
            return f"(({a}) << {k})"
        def shr(a, k):
            return f"(({a}) >> {k})"
    else:
        raise ValueError(dialect)

    ilon = f"(floor(({lon_sql}) * 1000000 + 0.5e0))::BIGINT" \
        if dialect == "duckdb" else \
        f"CAST(floor(({lon_sql}) * 1000000 + 0.5d) AS BIGINT)"
    ilat_raw = f"(floor(({lat_sql}) * 1000000 + 0.5e0))::BIGINT" \
        if dialect == "duckdb" else \
        f"CAST(floor(({lat_sql}) * 1000000 + 0.5d) AS BIGINT)"
    ilat = (f"greatest(least({ilat_raw}, {MAX_LAT_MICRO}), "
            f"{-MAX_LAT_MICRO})")

    tx = f"least({idiv(f'({ilon} + 180000000) * {n}', 360000000)}, " \
         f"{n - 1})"
    # mercator y fraction in [0,1], quantized 1e-7 before the tile
    # multiply; floor() then exact integer division in BOTH engines
    # (never ::BIGINT on a raw double — DuckDB rounds, Spark truncates)
    yfrac = (f"(1e0 - ln(tan(pi()/4 + (({ilat}) / 1000000e0) "
             f"* pi()/360e0)) / pi()) / 2e0")
    yq = f"(floor(({yfrac}) * 10000000 + 0.5e0))::BIGINT" \
        if dialect == "duckdb" else \
        f"CAST(floor(({yfrac}) * 10000000 + 0.5d) AS BIGINT)"
    ty = f"least({idiv(f'({yq}) * {n}', 10000000)}, {n - 1})"

    # unrolled interleave over named refs (caller projects tile_x /
    # tile_y first — repo law: materialize shared subexprs, no CSE
    # assumptions inside generated expressions)
    terms = []
    for i in range(zoom):
        terms.append(shl(f"({shr('tile_x', i)}) & 1", 2 * i))
        terms.append(shl(f"({shr('tile_y', i)}) & 1", 2 * i + 1))
    morton = " + ".join(terms)
    return {"tile_x": tx, "tile_y": ty, "morton": morton}


def with_tile_keys(df, lon_col: str = "lon", lat_col: str = "lat",
                   zoom: int = DEFAULT_ZOOM):
    """Adds tile_x, tile_y (long) then morton (long) — two projections
    so the morton terms reference the MATERIALIZED tile columns."""
    e = _texprs(lon_col, lat_col, zoom, "spark")
    out = df.withColumn("tile_x", F.expr(e["tile_x"])) \
            .withColumn("tile_y", F.expr(e["tile_y"]))
    return out.withColumn("morton", F.expr(e["morton"]))


def tile_heatmap_pyramid(df, id_col: str = "point_id",
                         lon_col: str = "lon", lat_col: str = "lat",
                         base_zoom: int = DEFAULT_ZOOM,
                         levels=(12, 10, 8)):
    """Multi-zoom point-density tiles -> (zoom, tx, ty, n_points,
    id_sum): the vector twin of the raster overview pyramid, built the
    scale-correct way — ONE corpus pass aggregates the finest zoom,
    then every coarser level rolls up from the previous AGGREGATE
    (tile-count-sized, not corpus-sized; parent key = child key >> 2
    per level). id_sum is the order-free BIGINT integrity checksum the
    rollup must conserve level-to-level."""
    if sorted(levels, reverse=True) != list(levels) \
            or levels[0] != base_zoom:
        raise ValueError("levels must descend from base_zoom")
    base = (with_tile_keys(df, lon_col, lat_col, zoom=base_zoom)
            .groupBy("tile_x", "tile_y")
            .agg(F.count(F.lit(1)).alias("n_points"),
                 F.sum(id_col).alias("id_sum"))
            .select(F.lit(base_zoom).alias("zoom"),
                    F.col("tile_x").alias("tx"),
                    F.col("tile_y").alias("ty"),
                    "n_points", "id_sum"))
    # the base aggregate feeds every coarser level AND the output
    # union; without a cut each consumer re-executes the corpus scan
    # (measured 3x "Scan parquet"). Checkpoint the tile-count-sized
    # aggregate once — the corpus is read exactly once, rollups are
    # tile-bound.
    base = base.localCheckpoint()
    parts = [base]
    prev = base
    prev_zoom = base_zoom
    for z in levels[1:]:
        k = prev_zoom - z
        nxt = (prev.groupBy(
                   F.expr(f"shiftright(tx, {k})").alias("tx"),
                   F.expr(f"shiftright(ty, {k})").alias("ty"))
               .agg(F.sum("n_points").alias("n_points"),
                    F.sum("id_sum").alias("id_sum"))
               .select(F.lit(z).alias("zoom"), "tx", "ty",
                       "n_points", "id_sum"))
        parts.append(nxt)
        prev, prev_zoom = nxt, z
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def tile_heatmap_pyramid_sql(table: str, id_col: str, lon_sql: str,
                             lat_sql: str, base_zoom: int = DEFAULT_ZOOM,
                             levels=(12, 10, 8)) -> str:
    """DuckDB twin: chained rollup CTEs from the base-zoom aggregate."""
    e = _texprs(lon_sql, lat_sql, base_zoom, "duckdb")
    ctes = [f"""keyed AS (SELECT {id_col} AS _id,
                      {e['tile_x']} AS tile_x, {e['tile_y']} AS tile_y
               FROM {table}),
    l{base_zoom} AS (SELECT {base_zoom} AS zoom, tile_x AS tx,
                     tile_y AS ty, count(*)::BIGINT AS n_points,
                     sum(_id)::BIGINT AS id_sum
              FROM keyed GROUP BY tile_x, tile_y)"""]
    prev = base_zoom
    for z in levels[1:]:
        k = prev - z
        ctes.append(
            f"l{z} AS (SELECT {z} AS zoom, (tx >> {k}) AS tx, "
            f"(ty >> {k}) AS ty, sum(n_points)::BIGINT AS n_points, "
            f"sum(id_sum)::BIGINT AS id_sum "
            f"FROM l{prev} GROUP BY (tx >> {k}), (ty >> {k}))")
        prev = z
    union = " UNION ALL ".join(
        f"SELECT zoom, tx, ty, n_points, id_sum FROM l{z}"
        for z in levels)
    return "WITH " + ",\n    ".join(ctes) + "\n    " + union


def tile_keys_sql(table: str, id_col: str, lon_sql: str, lat_sql: str,
                  zoom: int = DEFAULT_ZOOM) -> str:
    """DuckDB twin: (id, tile_x, tile_y, morton) over `table`."""
    e = _texprs(lon_sql, lat_sql, zoom, "duckdb")
    return f"""
    WITH t AS (SELECT {id_col},
                      {e['tile_x']} AS tile_x,
                      {e['tile_y']} AS tile_y
               FROM {table})
    SELECT {id_col}, tile_x, tile_y, ({e['morton']})::BIGINT AS morton
    FROM t
    """


# ------------------------------------------------------------------ #
# Geohash — base-32 interleaved cell keys (Niemeyer 2008)             #
# ------------------------------------------------------------------ #

GEOHASH_PRECISION = 6
GEOHASH_B32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def _ghexprs(lon_sql: str, lat_sql: str, precision: int,
             dialect: str) -> dict[str, str]:
    """gx / gy / gh (integer) / geohash (string) SQL for one dialect.
    Same exactness recipe as the tile keys: micro-degree integer
    quantization FIRST, then pure integer shift/divide — no float
    survives past the quantizer.  gx gets ceil(5p/2) bits, gy the
    rest (lon first, the geohash law); gh is the MSB-first
    interleave; the string is p unrolled base-32 substr lookups."""
    total = 5 * precision
    nlon = (total + 1) // 2
    nlat = total // 2
    if dialect == "spark":
        def idiv(a, b):
            return f"(({a}) div {b})"
        def shl(a, k):
            return f"shiftleft({a}, {k})"
        def shr(a, k):
            return f"shiftright({a}, {k})"
        ilon = f"CAST(floor(({lon_sql}) * 1000000 + 0.5d) AS BIGINT)"
        ilat = f"CAST(floor(({lat_sql}) * 1000000 + 0.5d) AS BIGINT)"
    elif dialect == "duckdb":
        def idiv(a, b):
            return f"(({a}) // {b})"
        def shl(a, k):
            return f"(({a}) << {k})"
        def shr(a, k):
            return f"(({a}) >> {k})"
        ilon = f"(floor(({lon_sql}) * 1000000 + 0.5e0))::BIGINT"
        ilat = f"(floor(({lat_sql}) * 1000000 + 0.5e0))::BIGINT"
    else:
        raise ValueError(dialect)

    gx = (f"least({idiv(f'({ilon} + 180000000) * {1 << nlon}', 360000000)}"
          f", {(1 << nlon) - 1})")
    gy = (f"least({idiv(f'({ilat} + 90000000) * {1 << nlat}', 180000000)}"
          f", {(1 << nlat) - 1})")
    terms = []
    for t in range(total):
        if t % 2 == 0:
            j = nlon - 1 - t // 2
            bit = f"({shr('gx', j)}) & 1"
        else:
            j = nlat - 1 - (t - 1) // 2
            bit = f"({shr('gy', j)}) & 1"
        terms.append(shl(bit, total - 1 - t))
    gh = " + ".join(terms)
    chars = [f"substr('{GEOHASH_B32}', "
             f"CAST(({shr('gh', 5 * (precision - 1 - k))}) & 31 AS INT)"
             f" + 1, 1)" for k in range(precision)]
    geohash = ("concat(" + ", ".join(chars) + ")") if dialect == "spark" \
        else (" || ".join(chars))
    return {"gx": gx, "gy": gy, "gh": gh, "geohash": geohash}


def with_geohash(df, lon_col: str = "lon", lat_col: str = "lat",
                 precision: int = GEOHASH_PRECISION):
    """Adds gx, gy, then gh (long) and geohash (string) — three
    projections so each generated expression references MATERIALIZED
    inputs (repo law: no CSE assumptions inside generated exprs).
    Zero exchange, zero UDF — rides the scan like the tile keys."""
    e = _ghexprs(lon_col, lat_col, precision, "spark")
    out = df.withColumn("gx", F.expr(e["gx"]).cast("long")) \
            .withColumn("gy", F.expr(e["gy"]).cast("long"))
    out = out.withColumn("gh", F.expr(e["gh"]).cast("long"))
    return out.withColumn("geohash", F.expr(e["geohash"]))


def geohash_sql(table: str, id_col: str, lon_sql: str, lat_sql: str,
                precision: int = GEOHASH_PRECISION) -> str:
    """DuckDB twin of with_geohash (projection chain via CTEs)."""
    e = _ghexprs("lon", "lat", precision, "duckdb")
    return f"""
    WITH src AS (SELECT {id_col} AS id, {lon_sql} AS lon,
                        {lat_sql} AS lat FROM {table}),
    g1 AS (SELECT id, ({e['gx']})::BIGINT AS gx,
                  ({e['gy']})::BIGINT AS gy FROM src),
    g2 AS (SELECT id, gx, gy, ({e['gh']})::BIGINT AS gh FROM g1)
    SELECT id, gx, gy, gh, {e['geohash']} AS geohash FROM g2
    """


# ------------------------------------------------------------------ #
# Morton range decomposition — bbox -> contiguous key intervals       #
# ------------------------------------------------------------------ #

def morton_ranges(tx0: int, tx1: int, ty0: int, ty1: int, zoom: int,
                  max_ranges: int = 64) -> list[tuple[int, int]]:
    """Exact quadtree decomposition of the tile rectangle
    [tx0..tx1] x [ty0..ty1] into disjoint, sorted, merged morton key
    intervals [lo, hi] (inclusive) — the index-pruning primitive for
    morton-clustered tables (BENCH 10l): a bbox probe becomes a
    union of CONTIGUOUS key ranges, each of which maps to a run of
    parquet row groups / icelite files under the clustered layout.

    An axis-aligned power-of-2 quad block holds a contiguous morton
    interval, so the recursion emits whole blocks where the rect
    fully covers them and splits otherwise; adjacent intervals merge.
    If more than max_ranges survive, the smallest inter-range gaps
    are greedily merged — the result then OVER-covers and callers
    must keep the exact tx/ty residual predicate (the standard
    range-scan refinement); with max_ranges = None the decomposition
    is exact and the residual is unnecessary."""
    n = 1 << zoom
    if not (0 <= tx0 <= tx1 < n and 0 <= ty0 <= ty1 < n):
        raise ValueError("tile rect out of range for zoom")
    out: list[list[int]] = []

    def rec(x: int, y: int, size: int, lo: int) -> None:
        if x > tx1 or x + size - 1 < tx0 or y > ty1 or y + size - 1 < ty0:
            return
        if x >= tx0 and x + size - 1 <= tx1 \
                and y >= ty0 and y + size - 1 <= ty1:
            out.append([lo, lo + size * size - 1])
            return
        h = size // 2
        q = h * h
        rec(x, y, h, lo)
        rec(x + h, y, h, lo + q)
        rec(x, y + h, h, lo + 2 * q)
        rec(x + h, y + h, h, lo + 3 * q)

    rec(0, 0, n, 0)
    out.sort()
    merged: list[list[int]] = []
    for lo, hi in out:
        if merged and lo == merged[-1][1] + 1:
            merged[-1][1] = hi
        else:
            merged.append([lo, hi])
    if max_ranges is not None:
        while len(merged) > max_ranges:
            gi = min(range(len(merged) - 1),
                     key=lambda i: merged[i + 1][0] - merged[i][1])
            merged[gi][1] = merged[gi + 1][1]
            del merged[gi + 1]
    return [(lo, hi) for lo, hi in merged]


def morton_range_predicate(ranges, col: str = "morton") -> str:
    """OR-of-BETWEEN SQL predicate (valid in both dialects)."""
    return "(" + " OR ".join(
        f"{col} BETWEEN {lo} AND {hi}" for lo, hi in ranges) + ")"
