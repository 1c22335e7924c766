"""Flexible-schema index normalization (reference S3:
extract_tiles_from_batch, /root/reference/src/index/input_index.rs:
215-318 — columns found by synonym lists, f32->f64 coercion, int
tile_id -> string, defaults for optional columns).

Spark-first: a single `select` of `coalesce` over alias columns +
casts + `fillna` defaults — pure built-ins, fully Catalyst-visible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# synonym lists mirror the reference's find_column tables
SYNONYMS: dict[str, list[str]] = {
    "tile_id": ["tile_id", "id", "name", "fid"],
    "path": ["s3_path", "path", "uri", "url", "location"],
    "min_x": ["min_x", "xmin", "left", "utm_west"],
    "min_y": ["min_y", "ymin", "bottom", "utm_south"],
    "max_x": ["max_x", "xmax", "right", "utm_east"],
    "max_y": ["max_y", "ymax", "top", "utm_north"],
    "min_lon": ["min_lon", "lon_min", "west"],
    "min_lat": ["min_lat", "lat_min", "south"],
    "max_lon": ["max_lon", "lon_max", "east"],
    "max_lat": ["max_lat", "lat_max", "north"],
    "crs": ["crs", "srs", "epsg"],
    "resolution": ["resolution", "res", "pixel_size"],
    "year": ["year", "yr"],
}
DEFAULTS = {"resolution": 10.0, "year": 2024}  # input_index.rs:295-302, 334-347
_TYPES = {
    "tile_id": "string", "path": "string", "crs": "string",
    "year": "int", "resolution": "double",
    **{c: "double" for c in (
        "min_x", "min_y", "max_x", "max_y",
        "min_lon", "min_lat", "max_lon", "max_lat")},
}


def normalize_index(df: DataFrame, required: tuple[str, ...] = ("tile_id",)) -> DataFrame:
    """Resolve synonyms -> canonical columns with canonical types.
    Missing optional columns get reference defaults; missing required
    ones raise (mirroring the reference's hard error)."""
    cols = {c.lower(): c for c in df.columns}
    out = []
    for canon, names in SYNONYMS.items():
        present = [cols[n] for n in names if n in cols]
        if present:
            expr = F.coalesce(*[F.col(p) for p in present]).cast(_TYPES[canon])
        elif canon in DEFAULTS:
            expr = F.lit(DEFAULTS[canon]).cast(_TYPES[canon])
        elif canon in required:
            raise ValueError(f"required column {canon!r} not found "
                             f"(synonyms tried: {names})")
        else:
            continue
        out.append(expr.alias(canon))
    passthrough = [
        F.col(c) for c in df.columns
        if c.lower() not in {n for ns in SYNONYMS.values() for n in ns}
    ]
    return df.select(*out, *passthrough)
