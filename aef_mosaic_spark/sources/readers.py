"""Reader-side utilities: windowed pixel reads, path parsing, tile
ordering (reference operators S4/S13/X12/O3).

The reference's COG windowed read fetches only the internal TIFF tiles
overlapping a pixel window over HTTP (cog_reader.rs:628-736). Here
pixels live in the table's `bytes` column, so a window read is
decode + numpy slice inside mapInPandas (SURVEY S4) — the I/O-saving
role is played by Parquet column/row-group pruning instead.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from aef_mosaic_spark import codecs


def parse_s3_uri(uri: str) -> tuple[str, str]:
    """'s3://bucket/key...' -> (bucket, key) (reference store.rs:17-25)."""
    m = re.match(r"^s3://([^/]+)/(.+)$", uri)
    if not m:
        raise ValueError(f"not an s3 uri: {uri!r}")
    return m.group(1), m.group(2)


def strip_bucket_col(path: Column) -> Column:
    """s3://bucket/key -> key as a Column expr (reference X12,
    cog_reader.rs:1074-1085)."""
    return F.regexp_replace(path, r"^s3://[^/]+/", "")


def read_window(images: DataFrame, x0: int, y0: int, w: int, h: int,
                clamp: bool = True) -> DataFrame:
    """Windowed pixel read: decode each image once, slice the
    (clamped) window, re-emit as raw payload (reference S4,
    read_window cog_reader.rs:628-736; out-of-range handling mirrors
    its clip semantics)."""
    def _gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for t in pdf.itertuples(index=False):
                img = codecs.decode(bytes(t.bytes), t.fmt, t.w, t.h)
                xa, ya = (max(0, x0), max(0, y0)) if clamp else (x0, y0)
                xb = min(t.w, x0 + w) if clamp else x0 + w
                yb = min(t.h, y0 + h) if clamp else y0 + h
                if xa >= xb or ya >= yb:
                    continue
                win = np.ascontiguousarray(img[:, ya:yb, xa:xb])
                rows.append({
                    "image_id": t.image_id, "bytes": win.tobytes(),
                    "w": int(xb - xa), "h": int(yb - ya), "fmt": "raw",
                    "x0": int(xa), "y0": int(ya),
                })
            yield pd.DataFrame(rows, columns=[
                "image_id", "bytes", "w", "h", "fmt", "x0", "y0"])

    return images.mapInPandas(
        _gen, schema="image_id string, bytes binary, w int, h int, "
                     "fmt string, x0 int, y0 int")


def order_tiles_hilbert(images: DataFrame, res_bits: int = 16) -> DataFrame:
    """Sort tiles by the Hilbert index of their WGS84 centroid on a
    2^res_bits grid (reference O3, stages.rs:52-57, 139-144) via
    repartitionByRange — spatially adjacent tiles land in the same
    partitions/files (Z-ORDER-style clustering)."""
    from aef_mosaic_spark.grid import hilbert_d

    def _h(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = 1 << res_bits
        for pdf in it:
            cx = (pdf["min_lon"].to_numpy() + pdf["max_lon"].to_numpy()) / 2.0
            cy = (pdf["min_lat"].to_numpy() + pdf["max_lat"].to_numpy()) / 2.0
            ix = np.clip(((cx + 180.0) / 360.0 * n).astype(np.int64), 0, n - 1)
            iy = np.clip(((cy + 90.0) / 180.0 * n).astype(np.int64), 0, n - 1)
            pdf = pdf.copy()
            pdf["_hilbert"] = hilbert_d(ix, iy, res_bits)
            yield pdf

    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                       for f in images.schema.fields) + ", _hilbert long"
    keyed = images.mapInPandas(_h, schema=schema)
    return keyed.repartitionByRange("_hilbert").sortWithinPartitions("_hilbert") \
                .drop("_hilbert")
