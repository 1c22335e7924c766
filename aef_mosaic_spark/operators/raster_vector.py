"""Raster -> vector: sample mosaic pixel values at point locations.

The inverse direction of the tiling pipeline (north rule
"raster<->vector"): given the chunked mosaic table and a table of
points in the grid CRS, return each point's pixel value — the
point-lookup / zonal-sampling primitive (training-label extraction,
QA spot checks).

Spark-first: the point -> chunk-key assignment is the SAME floor
arithmetic as the write path (grid.crs_to_pixel), the join is a plain
equi-join on (time_idx, row_idx, col_idx) — chunk keys are the
co-location mechanism in BOTH directions — and the byte extraction is
a JVM expression over the binary chunk column
(conv(hex(substring(chunk, off, 1)))), so no Python touches pixels.
At scale the chunk side is huge and the point side shuffles to it;
AQE broadcasts whichever side is small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from aef_mosaic_spark.grid import OutputGrid


def sample_chunks_at_points(chunks: DataFrame, points: DataFrame,
                            grid: OutputGrid, band: int = 0,
                            x_col: str = "x", y_col: str = "y",
                            chunk_col: str = "chunk_bytes") -> DataFrame:
    """-> points' columns + (time_idx,row_idx,col_idx,px,py,value).

    Points outside the grid drop out (inner join can only hit real
    chunks; the px/py clamp-free floor math yields keys no chunk has).
    `value` is the uint8 pixel of `band` at the point's pixel center.
    """
    gx0, _, _, gy1 = grid.bounds
    res = grid.resolution
    pxg = F.floor((F.col(x_col) - gx0) / res).cast("long")
    pyg = F.floor((gy1 - F.col(y_col)) / res).cast("long")
    p = (points
         .withColumn("_pxg", pxg).withColumn("_pyg", pyg)
         .withColumn("row_idx", (F.col("_pyg") / grid.chunk_h)
                     .cast("int"))
         .withColumn("col_idx", (F.col("_pxg") / grid.chunk_w)
                     .cast("int"))
         .withColumn("px", (F.col("_pxg") % grid.chunk_w).cast("int"))
         .withColumn("py", (F.col("_pyg") % grid.chunk_h).cast("int"))
         .where((F.col("_pxg") >= 0) & (F.col("_pyg") >= 0))
         .drop("_pxg", "_pyg"))
    off = (F.lit(band * grid.chunk_h * grid.chunk_w)
           + F.col("py") * grid.chunk_w + F.col("px") + 1).cast("int")
    joined = p.join(chunks.select("time_idx", "row_idx", "col_idx",
                                  F.col(chunk_col).alias("_chunk")),
                    ["time_idx", "row_idx", "col_idx"])
    return (joined
            .withColumn("_off", off)
            .withColumn("value",
                        F.conv(F.hex(F.expr("substring(_chunk, _off, 1)")),
                               16, 10).cast("int"))
            .drop("_chunk", "_off"))
