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


def zonal_stats(chunks: DataFrame, boxes: DataFrame, grid: OutputGrid,
                band: int = 0, chunk_col: str = "chunk_bytes",
                broadcast: bool | str = "auto",
                broadcast_threshold: int = 1_000_000) -> DataFrame:
    """Zonal statistics: per-box pixel sum/count/mean of `band` over
    the chunked mosaic -> (box_id, time_idx, n_px, px_sum, mean_value).

    Plan (classic two-level raster aggregation):
    1. analytic box -> chunk-range floor inversion (the write path's
       J2 math, boxes already in grid CRS) + explode -> groupBy chunk
       key with collect_list(window) — each chunk key carries the small
       list of box windows touching it, so the kernel decodes each
       chunk buffer ONCE no matter how many boxes overlap it;
    2. equi-join window-lists to chunk rows — only chunks a box touches
       are ever read;
    3. mapInPandas partial: decode once, numpy-sum each clipped window;
    4. groupBy(box) final merge (associative ints, map-side combine).

    Join strategy (`broadcast`):
    - "auto" (default): count the per-chunk-key window-list rows (a
      cheap job over the small vector side) and broadcast only when
      <= `broadcast_threshold`; at 10^8 zones the exploded side OOMs
      every executor if force-broadcast, so above the threshold the
      join is a shuffle join on chunk keys with AQE picking the
      strategy. The chunk BYTES are exchanged at most once per chunk
      (never once per box — the window lists are pre-grouped), and the
      exchange is elided entirely when the chunk table is stored
      bucketed by chunk key (sources.bucketed).
    - True / False: force the branch (tests; callers that know).

    Skew note: a chunk overlapped by k boxes carries a k-element
    window list (40 B/struct) in ONE row — ~40 MB at k=10^6, still a
    single task but bounded memory; beyond that, split the box set
    (e.g. by box_id ranges) and union the partials — the final
    groupBy(box) merge is associative, so any partition of the boxes
    composes exactly.
    """
    import numpy as np
    import pandas as pd

    gx0, _, _, gy1 = grid.bounds
    res, chh, chw = grid.resolution, grid.chunk_h, grid.chunk_w
    nb = grid.num_bands

    b = (boxes
         .withColumn("_c0", F.greatest(F.floor((F.col("min_x") - gx0)
                                               / (chw * res)), F.lit(0))
                     .cast("int"))
         .withColumn("_c1", F.least(F.ceil((F.col("max_x") - gx0)
                                           / (chw * res)) - 1,
                                    F.lit(grid.chunk_cols - 1)).cast("int"))
         .withColumn("_r0", F.greatest(F.floor((gy1 - F.col("max_y"))
                                               / (chh * res)), F.lit(0))
                     .cast("int"))
         .withColumn("_r1", F.least(F.ceil((gy1 - F.col("min_y"))
                                           / (chh * res)) - 1,
                                    F.lit(grid.chunk_rows - 1)).cast("int"))
         .where((F.col("_c0") <= F.col("_c1")) & (F.col("_r0") <= F.col("_r1")))
         .withColumn("row_idx", F.explode(F.sequence("_r0", "_r1")))
         .withColumn("col_idx", F.explode(F.sequence("_c0", "_c1")))
         .drop("_c0", "_c1", "_r0", "_r1"))
    # decode-once grouping: one row per touched chunk key, windows as a
    # struct list (a chunk overlapped by k boxes is decoded once, not k
    # times, and its bytes are never replicated k ways by the join)
    grouped = b.groupBy("time_idx", "row_idx", "col_idx").agg(
        F.collect_list(F.struct("box_id", "min_x", "min_y",
                                "max_x", "max_y")).alias("blist"))
    if broadcast == "auto":
        broadcast = grouped.count() <= broadcast_threshold
    left = F.broadcast(grouped) if broadcast else grouped
    joined = left.join(
        chunks.select("time_idx", "row_idx", "col_idx",
                      F.col(chunk_col).alias("cbytes")),
        ["time_idx", "row_idx", "col_idx"])

    def _partial(it):
        for pdf in it:
            rows = []
            # NB itertuples drops underscore-prefixed attrs: plain names
            for t in pdf.itertuples(index=False):
                arr = np.frombuffer(t.cbytes, np.uint8).reshape(nb, chh, chw)
                for bx in t.blist:
                    # box window clipped to this chunk, pixel-index space
                    px0 = max(int(np.floor((bx["min_x"] - gx0) / res))
                              - t.col_idx * chw, 0)
                    px1 = min(int(np.ceil((bx["max_x"] - gx0) / res))
                              - t.col_idx * chw, chw)
                    py0 = max(int(np.floor((gy1 - bx["max_y"]) / res))
                              - t.row_idx * chh, 0)
                    py1 = min(int(np.ceil((gy1 - bx["min_y"]) / res))
                              - t.row_idx * chh, chh)
                    if px0 >= px1 or py0 >= py1:
                        continue
                    win = arr[band, py0:py1, px0:px1]
                    rows.append({"box_id": bx["box_id"],
                                 "time_idx": int(t.time_idx),
                                 "n_px": int(win.size),
                                 "px_sum": int(win.astype(np.int64).sum())})
            yield pd.DataFrame(rows, columns=["box_id", "time_idx",
                                              "n_px", "px_sum"])

    partials = joined.mapInPandas(
        _partial, schema="box_id long, time_idx int, n_px long, px_sum long")
    return (partials.groupBy("box_id", "time_idx")
            .agg(F.sum("n_px").alias("n_px"), F.sum("px_sum").alias("px_sum"))
            .withColumn("mean_value",
                        F.round(F.col("px_sum") / F.col("n_px"), 6)))


def rasterize_boxes(boxes: DataFrame, grid: OutputGrid,
                    value_col: str = "value", mode: str = "last",
                    box_id_col: str = "box_id") -> DataFrame:
    """Vector -> raster burn-in: render axis-aligned boxes into uint8
    single-band chunk canvases over the output grid (the
    GDAL-rasterize analog; completes the north rule's raster<->vector
    pair — sample_chunks_at_points/zonal_stats read rasters FOR
    vectors, this writes rasters FROM vectors: label masks, region-id
    planes, density heatmaps).

    -> (row_idx int, col_idx int, chunk binary, n_boxes int,
        burned_px int), one row per TOUCHED chunk only.

    modes (all deterministic):
      'last'  — painter's order, ascending box_id: the highest box_id
                covering a pixel wins (GDAL's default semantics with
                a defined feature order);
      'max'   — per-pixel max of burned values (order-independent);
      'count' — per-pixel overlap count, saturated at 255 (value_col
                ignored; density/coverage plane).

    Pixel coverage uses zonal_stats' exact convention (floor(min)/
    ceil(max) pixel-index span: every pixel the box touches), so a
    zonal_stats over a rasterize_boxes output reads back exactly the
    burned windows.

    Scale shape: the analytic box -> chunk-range inversion (the write
    path's J2 floor math) + explode assigns each box to only the
    chunks it touches; groupBy(chunk) -> applyInPandas burns each
    canvas once. No chunk ever materializes unless a box touches it
    (10^12-pixel grids stay virtual), the shuffle payload is box
    structs (tens of bytes), never pixels, and per-chunk work is
    boxes-per-chunk-bounded — the same skew argument as zonal_stats'
    window lists.
    """
    import numpy as np
    import pandas as pd

    if mode not in ("last", "max", "count"):
        raise ValueError(f"unknown rasterize mode {mode!r}")
    gx0, _, _, gy1 = grid.bounds
    res, chh, chw = grid.resolution, grid.chunk_h, grid.chunk_w

    b = (boxes
         .select(F.col(box_id_col).cast("long").alias("box_id"),
                 "min_x", "min_y", "max_x", "max_y",
                 (F.lit(0) if mode == "count"
                  else F.col(value_col)).cast("int").alias("val"))
         .withColumn("_c0", F.greatest(F.floor((F.col("min_x") - gx0)
                                               / (chw * res)), F.lit(0))
                     .cast("int"))
         .withColumn("_c1", F.least(F.ceil((F.col("max_x") - gx0)
                                           / (chw * res)) - 1,
                                    F.lit(grid.chunk_cols - 1)).cast("int"))
         .withColumn("_r0", F.greatest(F.floor((gy1 - F.col("max_y"))
                                               / (chh * res)), F.lit(0))
                     .cast("int"))
         .withColumn("_r1", F.least(F.ceil((gy1 - F.col("min_y"))
                                           / (chh * res)) - 1,
                                    F.lit(grid.chunk_rows - 1)).cast("int"))
         .where((F.col("_c0") <= F.col("_c1"))
                & (F.col("_r0") <= F.col("_r1")))
         .withColumn("row_idx", F.explode(F.sequence("_r0", "_r1")))
         .withColumn("col_idx", F.explode(F.sequence("_c0", "_c1")))
         .drop("_c0", "_c1", "_r0", "_r1"))

    def _burn(pdf: pd.DataFrame) -> pd.DataFrame:
        r = int(pdf.iloc[0]["row_idx"])
        c = int(pdf.iloc[0]["col_idx"])
        acc = np.zeros((chh, chw),
                       np.int32 if mode == "count" else np.uint8)
        touched = np.zeros((chh, chw), bool)
        for t in pdf.sort_values("box_id").itertuples(index=False):
            px0 = max(int(np.floor((t.min_x - gx0) / res)) - c * chw, 0)
            px1 = min(int(np.ceil((t.max_x - gx0) / res)) - c * chw, chw)
            py0 = max(int(np.floor((gy1 - t.max_y) / res)) - r * chh, 0)
            py1 = min(int(np.ceil((gy1 - t.min_y) / res)) - r * chh, chh)
            if px0 >= px1 or py0 >= py1:
                continue
            win = acc[py0:py1, px0:px1]
            v = min(max(int(t.val), 0), 255)
            if mode == "last":
                win[:] = v
            elif mode == "max":
                np.maximum(win, v, out=win)
            else:
                win += 1
            touched[py0:py1, px0:px1] = True
        canvas = (np.minimum(acc, 255).astype(np.uint8)
                  if mode == "count" else acc)
        return pd.DataFrame([{
            "row_idx": r, "col_idx": c, "chunk": canvas.tobytes(),
            "n_boxes": int(pdf["box_id"].nunique()),
            "burned_px": int(touched.sum()),
        }])

    return b.groupBy("row_idx", "col_idx").applyInPandas(
        _burn, schema=("row_idx int, col_idx int, chunk binary, "
                       "n_boxes int, burned_px int"))


def zonal_majority(chunks: DataFrame, boxes: DataFrame, grid: OutputGrid,
                   band: int = 0, chunk_col: str = "chunk_bytes",
                   broadcast: bool | str = "auto",
                   broadcast_threshold: int = 1_000_000) -> DataFrame:
    """Zonal MAJORITY (mode) of `band` per box ->
    (box_id, time_idx, majority_value, major_cnt, n_px): the
    categorical sibling of zonal_stats — the standard GIS "majority
    class per zone" used on classified rasters (land-cover per
    parcel).  Ties break to the SMALLEST pixel value (documented).

    Plan: identical decode-once window-list shape as zonal_stats
    (same join-strategy auto-branch); the partial emits per-(box,
    value) bincounts (<= 256 rows per box-window, never per-pixel
    rows), the merge is groupBy(box, value) sum -> groupBy(box)
    struct-max — all associative, map-side combinable."""
    import numpy as np
    import pandas as pd

    gx0, _, _, gy1 = grid.bounds
    res, chh, chw = grid.resolution, grid.chunk_h, grid.chunk_w
    nb = grid.num_bands

    b = (boxes
         .withColumn("_c0", F.greatest(F.floor((F.col("min_x") - gx0)
                                               / (chw * res)), F.lit(0))
                     .cast("int"))
         .withColumn("_c1", F.least(F.ceil((F.col("max_x") - gx0)
                                           / (chw * res)) - 1,
                                    F.lit(grid.chunk_cols - 1)).cast("int"))
         .withColumn("_r0", F.greatest(F.floor((gy1 - F.col("max_y"))
                                               / (chh * res)), F.lit(0))
                     .cast("int"))
         .withColumn("_r1", F.least(F.ceil((gy1 - F.col("min_y"))
                                           / (chh * res)) - 1,
                                    F.lit(grid.chunk_rows - 1)).cast("int"))
         .where((F.col("_c0") <= F.col("_c1"))
                & (F.col("_r0") <= F.col("_r1")))
         .withColumn("row_idx", F.explode(F.sequence("_r0", "_r1")))
         .withColumn("col_idx", F.explode(F.sequence("_c0", "_c1")))
         .drop("_c0", "_c1", "_r0", "_r1"))
    grouped = b.groupBy("time_idx", "row_idx", "col_idx").agg(
        F.collect_list(F.struct("box_id", "min_x", "min_y",
                                "max_x", "max_y")).alias("blist"))
    if broadcast == "auto":
        broadcast = grouped.count() <= broadcast_threshold
    left = F.broadcast(grouped) if broadcast else grouped
    joined = left.join(
        chunks.select("time_idx", "row_idx", "col_idx",
                      F.col(chunk_col).alias("cbytes")),
        ["time_idx", "row_idx", "col_idx"])

    def _partial(it):
        for pdf in it:
            rows = []
            for t in pdf.itertuples(index=False):
                arr = np.frombuffer(t.cbytes, np.uint8).reshape(nb, chh, chw)
                for bx in t.blist:
                    px0 = max(int(np.floor((bx["min_x"] - gx0) / res))
                              - t.col_idx * chw, 0)
                    px1 = min(int(np.ceil((bx["max_x"] - gx0) / res))
                              - t.col_idx * chw, chw)
                    py0 = max(int(np.floor((gy1 - bx["max_y"]) / res))
                              - t.row_idx * chh, 0)
                    py1 = min(int(np.ceil((gy1 - bx["min_y"]) / res))
                              - t.row_idx * chh, chh)
                    if px0 >= px1 or py0 >= py1:
                        continue
                    win = arr[band, py0:py1, px0:px1]
                    bc = np.bincount(win.ravel(), minlength=256)
                    nz = np.nonzero(bc)[0]
                    for v in nz:
                        rows.append({"box_id": bx["box_id"],
                                     "time_idx": int(t.time_idx),
                                     "val": int(v),
                                     "cnt": int(bc[v])})
            yield pd.DataFrame(rows, columns=["box_id", "time_idx",
                                              "val", "cnt"])

    partials = joined.mapInPandas(
        _partial, schema="box_id long, time_idx int, val int, cnt long")
    per_val = (partials.groupBy("box_id", "time_idx", "val")
               .agg(F.sum("cnt").cast("long").alias("cnt")))
    return (per_val.groupBy("box_id", "time_idx")
            .agg(F.max(F.struct(F.col("cnt"),
                                (-F.col("val")).alias("nv"))).alias("_m"),
                 F.sum("cnt").cast("long").alias("n_px"))
            .select("box_id", "time_idx",
                    (-F.col("_m.nv")).cast("long").alias("majority_value"),
                    F.col("_m.cnt").cast("long").alias("major_cnt"),
                    "n_px"))
