"""Single-process NumPy oracle for the mosaic pipeline.

Independent (non-Spark) reimplementation of assign -> reproject ->
composite used as the golden reference in tests, playing the role the
reference's Rust engine would play if it could run here (SURVEY.md §5:
validated against the reference's numeric test vectors — mean(10,20)=15
with half-away-from-zero rounding, top-down row convention, NODATA
skip). Deliberately written as a per-tile/per-pixel loop, structured
differently from the Spark operators, so a bug in one is unlikely to
hide in both.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from aef_mosaic_spark import codecs, proj
from aef_mosaic_spark.grid import OutputGrid


def oracle_assignments(images: pd.DataFrame, grid: OutputGrid) -> set[tuple]:
    """{(image_id, time_idx, row_idx, col_idx)} by brute force: for
    every tile x every chunk, exact bbox intersection test in grid CRS."""
    out = set()
    for t in images.itertuples(index=False):
        ti = grid.time_idx_for_year(t.year)
        if ti is None:
            continue
        b = proj.transform_bounds(
            (t.min_x, t.min_y, t.max_x, t.max_y), t.crs, grid.crs, densify=5
        )
        for r in range(grid.chunk_rows):
            for c in range(grid.chunk_cols):
                cb = grid.chunk_bounds(r, c)
                if b[0] < cb[2] and b[2] > cb[0] and b[1] < cb[3] and b[3] > cb[1]:
                    out.add((t.image_id, ti, r, c))
    return out


def _round_half_away(s: float, c: float) -> int:
    if s >= 0:
        return int((s + c // 2) // c)
    return -int((-s + c // 2) // c)


def oracle_mosaic(images: pd.DataFrame, grid: OutputGrid, mode: str = "mean",
                  weights: dict | None = None) -> dict:
    """{(time_idx,row_idx,col_idx): {canvas, n_tiles, valid_px}}.

    Naive: full per-time canvases, per-tile scatter of every source
    pixel's footprint via forward+inverse mapping of target pixels
    over the tile's grid-CRS bbox.
    """
    nb = grid.num_bands
    canv_sum = {}
    canv_cnt = {}
    canv_last = {}
    canv_wsum = {}
    canv_wcnt = {}
    canv_vals: dict = {}  # median: per-ti list of per-pixel values
    tiles_per_chunk: dict[tuple, set] = {}
    weights = weights or {}

    def key_order(t):  # deterministic last-on-top order, same as engine
        import hashlib

        return int.from_bytes(hashlib.md5(t.image_id.encode()).digest()[:8], "big", signed=True)

    rows = sorted(images.itertuples(index=False), key=key_order)
    for t in rows:
        ti = grid.time_idx_for_year(t.year)
        if ti is None:
            continue
        img = codecs.decode(t.bytes, t.fmt, t.w, t.h)[:nb]
        gb = proj.transform_bounds(
            (t.min_x, t.min_y, t.max_x, t.max_y), t.crs, grid.crs, densify=5
        )
        # global target pixel range covered by this tile's grid bbox
        C0 = max(0, int(np.floor((gb[0] - grid.bounds[0]) / grid.resolution)))
        C1 = min(grid.width, int(np.ceil((gb[2] - grid.bounds[0]) / grid.resolution)))
        R0 = max(0, int(np.floor((grid.bounds[3] - gb[3]) / grid.resolution)))
        R1 = min(grid.height, int(np.ceil((grid.bounds[3] - gb[1]) / grid.resolution)))
        if C0 >= C1 or R0 >= R1:
            continue
        cols = np.arange(C0, C1)
        rws = np.arange(R0, R1)
        wx = grid.bounds[0] + (cols + 0.5) * grid.resolution
        wy = grid.bounds[3] - (rws + 0.5) * grid.resolution
        WX, WY = np.meshgrid(wx, wy)
        sx, sy = proj.transform_points(WX.ravel(), WY.ravel(), grid.crs, t.crs)
        sc = np.floor((sx - t.min_x) / t.resolution).astype(np.int64).reshape(WX.shape)
        sr = np.floor((t.max_y - sy) / t.resolution).astype(np.int64).reshape(WX.shape)
        valid = (sc >= 0) & (sc < t.w) & (sr >= 0) & (sr < t.h)
        if not valid.any():
            continue
        if ti not in canv_sum:
            canv_sum[ti] = np.zeros((nb, grid.height, grid.width), np.int64)
            canv_cnt[ti] = np.zeros((grid.height, grid.width), np.int64)
            canv_last[ti] = np.zeros((nb, grid.height, grid.width), np.int64) - 1
            canv_wsum[ti] = np.zeros((nb, grid.height, grid.width), np.float64)
            canv_wcnt[ti] = np.zeros((grid.height, grid.width), np.float64)
        vals = img[:, np.clip(sr, 0, t.h - 1), np.clip(sc, 0, t.w - 1)]
        sub_sum = canv_sum[ti][:, R0:R1, C0:C1]
        sub_cnt = canv_cnt[ti][R0:R1, C0:C1]
        sub_last = canv_last[ti][:, R0:R1, C0:C1]
        sub_sum += vals * valid
        sub_cnt += valid
        sub_last[:, valid] = vals[:, valid]
        w = float(weights.get(t.image_id, 1.0))
        canv_wsum[ti][:, R0:R1, C0:C1] += vals * (valid * w)
        canv_wcnt[ti][R0:R1, C0:C1] += valid * w
        if mode == "median":
            canv_vals.setdefault(ti, []).append((R0, R1, C0, C1, vals, valid))
        # chunk membership for n_tiles (bbox-level, same as engine)
        for r in range(R0 // grid.chunk_h, (R1 - 1) // grid.chunk_h + 1):
            for c in range(C0 // grid.chunk_w, (C1 - 1) // grid.chunk_w + 1):
                # count tile only if any valid pixel lands in this chunk
                rs = slice(max(R0, r * grid.chunk_h) - R0,
                           min(R1, (r + 1) * grid.chunk_h) - R0)
                cs = slice(max(C0, c * grid.chunk_w) - C0,
                           min(C1, (c + 1) * grid.chunk_w) - C0)
                if valid[rs, cs].any():
                    tiles_per_chunk.setdefault((ti, r, c), set()).add(t.image_id)

    out = {}
    for (ti, r, c), ids in tiles_per_chunk.items():
        ys = slice(r * grid.chunk_h, (r + 1) * grid.chunk_h)
        xs = slice(c * grid.chunk_w, (c + 1) * grid.chunk_w)
        cnt = canv_cnt[ti][ys, xs]
        if mode == "mean":
            s = canv_sum[ti][:, ys, xs]
            canvas = np.zeros_like(s)
            nz = cnt > 0
            for b in range(nb):
                sb = s[b]
                vec = np.vectorize(_round_half_away, otypes=[np.int64])
                canvas[b][nz] = vec(sb[nz], cnt[nz])
            canvas = canvas.astype(np.uint8)
        elif mode == "weighted":
            ws = canv_wsum[ti][:, ys, xs]
            wc = canv_wcnt[ti][ys, xs]
            canvas = np.where(wc > 0, np.rint(ws / np.maximum(wc, 1e-12)), 0
                              ).astype(np.uint8)
        elif mode == "median":
            # lower median (ascending index (c-1)//2), same definition
            # as the engine; per-chunk brute stack over the tile list
            h = ys.stop - ys.start
            wd = xs.stop - xs.start
            vals_px = [[[] for _ in range(wd)] for _ in range(h)]
            for R0, R1, C0, C1, vals, valid in canv_vals.get(ti, []):
                for rr in range(max(R0, ys.start), min(R1, ys.stop)):
                    for cc in range(max(C0, xs.start), min(C1, xs.stop)):
                        if valid[rr - R0, cc - C0]:
                            vals_px[rr - ys.start][cc - xs.start].append(
                                vals[:, rr - R0, cc - C0])
            canvas = np.zeros((nb, h, wd), np.uint8)
            for rr in range(h):
                for cc in range(wd):
                    vs = vals_px[rr][cc]
                    if vs:
                        arr = np.sort(np.stack(vs, axis=0), axis=0)
                        canvas[:, rr, cc] = arr[(len(vs) - 1) // 2]
        else:  # last
            last = canv_last[ti][:, ys, xs]
            canvas = np.where(last >= 0, last, 0).astype(np.uint8)
        out[(ti, r, c)] = {
            "canvas": canvas,
            "n_tiles": len(ids),
            "valid_px": int((cnt > 0).sum()),
        }
    return out
