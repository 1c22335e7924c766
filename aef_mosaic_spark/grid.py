"""Output chunk grid math — the *derived keyspace* of the engine.

Reimplements the semantics of the reference OutputGrid
(/root/reference/src/index/output_grid.rs:72-414): a virtual 4-D
array (time, band, y, x) over `bounds` in `crs` at `resolution`,
chunked (chunk_h x chunk_w), with

- dimensions rounded UP to chunk multiples so every chunk is
  full-size (output_grid.rs:125-142),
- TOP-DOWN row convention: pixel row 0 starts at max_y (the
  reference's own production bug lived here — regression-tested,
  output_grid.rs:567-659),
- pixel-center +0.5 world<->pixel math (output_grid.rs:397-414),
- analytic tile->chunk-range inversion (chunks_for_bounds,
  output_grid.rs:315-384) — the O(chunks_per_tile) join pattern,
- Hilbert-curve chunk ordering for locality (output_grid.rs:15-48).

All pure python/numpy; the Spark side re-expresses the same floor
arithmetic as Column expressions (see operators/spatial_join.py) so
Catalyst sees plain comparisons/sequences it can optimize.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

NODATA = -128  # int8 fill value (reference src/transform/mosaic.rs:20)


def hilbert_d(x: np.ndarray, y: np.ndarray, order: int) -> np.ndarray:
    """Vectorized (x, y) -> Hilbert curve distance at `order` bits.

    Standard public xy->d algorithm (rot/reflect per level); matches
    the locality role of the reference hilbert_index
    (/root/reference/src/index/output_grid.rs:15-37). Pure int64
    numpy bit ops — runs vectorized inside a pandas UDF.
    """
    x = np.asarray(x, dtype=np.int64).copy()
    y = np.asarray(y, dtype=np.int64).copy()
    d = np.zeros_like(x)
    s = np.int64(1) << (order - 1)
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        # rotate quadrant
        swap = ry == 0
        flip = swap & (rx == 1)
        x_f, y_f = x.copy(), y.copy()
        x[flip] = s - 1 - x_f[flip]
        y[flip] = s - 1 - y_f[flip]
        x_s = x.copy()
        x[swap] = y[swap]
        y[swap] = x_s[swap]
        s >>= 1
    return d


def hilbert_order_for(max_dim: int) -> int:
    """ceil(log2(max_dim)) with floor 1 (reference output_grid.rs:40-48)."""
    order = 1
    while (1 << order) < max_dim:
        order += 1
    return order


@dataclass(frozen=True)
class OutputGrid:
    """Chunk-aligned output grid in `crs`.

    bounds: (min_x, min_y, max_x, max_y) in output CRS.
    years: sorted list; time_idx = index into it.
    """

    bounds: tuple[float, float, float, float]
    crs: str
    resolution: float
    years: tuple[int, ...]
    num_bands: int = 3
    chunk_h: int = 256
    chunk_w: int = 256
    width: int = field(init=False)
    height: int = field(init=False)

    def __post_init__(self) -> None:
        min_x, min_y, max_x, max_y = self.bounds
        raw_w = max(1, int(np.ceil((max_x - min_x) / self.resolution)))
        raw_h = max(1, int(np.ceil((max_y - min_y) / self.resolution)))
        # round UP to full chunks (reference output_grid.rs:125-142)
        w = ((raw_w + self.chunk_w - 1) // self.chunk_w) * self.chunk_w
        h = ((raw_h + self.chunk_h - 1) // self.chunk_h) * self.chunk_h
        object.__setattr__(self, "width", w)
        object.__setattr__(self, "height", h)

    # --- chunk counts ------------------------------------------------
    @property
    def chunk_rows(self) -> int:
        return self.height // self.chunk_h

    @property
    def chunk_cols(self) -> int:
        return self.width // self.chunk_w

    @property
    def num_chunks(self) -> int:
        return len(self.years) * self.chunk_rows * self.chunk_cols

    def time_idx_for_year(self, year: int) -> int | None:
        try:
            return self.years.index(year)
        except ValueError:
            return None

    # --- world <-> pixel (top-down; row 0 at max_y) -------------------
    def crs_to_pixel(self, x: np.ndarray, y: np.ndarray):
        """World -> fractional pixel (col, row); pixel centers at +0.5
        (reference output_grid.rs:397-405)."""
        col = (np.asarray(x, np.float64) - self.bounds[0]) / self.resolution
        row = (self.bounds[3] - np.asarray(y, np.float64)) / self.resolution
        return col, row

    def pixel_to_crs(self, col: np.ndarray, row: np.ndarray):
        """Pixel-center -> world (reference output_grid.rs:407-414)."""
        x = self.bounds[0] + (np.asarray(col, np.float64) + 0.5) * self.resolution
        y = self.bounds[3] - (np.asarray(row, np.float64) + 0.5) * self.resolution
        return x, y

    # --- chunk geometry ------------------------------------------------
    def chunk_bounds(self, row_idx: int, col_idx: int):
        """Native-CRS bounds of chunk (reference output_grid.rs:263-285)."""
        x0 = self.bounds[0] + col_idx * self.chunk_w * self.resolution
        x1 = x0 + self.chunk_w * self.resolution
        y1 = self.bounds[3] - row_idx * self.chunk_h * self.resolution
        y0 = y1 - self.chunk_h * self.resolution
        return (x0, y0, x1, y1)

    def chunk_ranges_for_bounds(self, bounds) -> tuple[int, int, int, int] | None:
        """Native-CRS bbox -> inclusive (row_min, row_max, col_min,
        col_max) of intersecting chunks, clipped to the grid — the
        analytic inverted join (reference output_grid.rs:315-384).
        Returns None when disjoint from the grid."""
        min_x, min_y, max_x, max_y = bounds
        gx0, gy0, gx1, gy1 = self.bounds
        # grid covers rounded-up extent
        gx1 = gx0 + self.width * self.resolution
        gy0 = gy1 - self.height * self.resolution
        if min_x >= gx1 or max_x <= gx0 or min_y >= gy1 or max_y <= gy0:
            return None
        cw = self.chunk_w * self.resolution
        ch = self.chunk_h * self.resolution
        col_min = int(np.floor((min_x - gx0) / cw))
        col_max = int(np.ceil((max_x - gx0) / cw)) - 1
        row_min = int(np.floor((gy1 - max_y) / ch))
        row_max = int(np.ceil((gy1 - min_y) / ch)) - 1
        col_min = max(col_min, 0)
        row_min = max(row_min, 0)
        col_max = min(col_max, self.chunk_cols - 1)
        row_max = min(row_max, self.chunk_rows - 1)
        if col_min > col_max or row_min > row_max:
            return None
        return (row_min, row_max, col_min, col_max)

    def hilbert_for_chunks(self, row_idx: np.ndarray, col_idx: np.ndarray) -> np.ndarray:
        order = hilbert_order_for(max(self.chunk_rows, self.chunk_cols))
        return hilbert_d(np.asarray(col_idx), np.asarray(row_idx), order)

    def enumerate_chunks(self, hilbert: bool = True) -> list[tuple[int, int, int]]:
        """All (time_idx, row_idx, col_idx), Hilbert-ordered within each
        time slice (reference output_grid.rs:221-244)."""
        rr, cc = np.meshgrid(
            np.arange(self.chunk_rows), np.arange(self.chunk_cols), indexing="ij"
        )
        rr, cc = rr.ravel(), cc.ravel()
        if hilbert and len(rr):
            order = np.argsort(self.hilbert_for_chunks(rr, cc), kind="stable")
            rr, cc = rr[order], cc[order]
        return [
            (t, int(r), int(c))
            for t in range(len(self.years))
            for r, c in zip(rr, cc)
        ]

    def to_dict(self) -> dict:
        return {
            "bounds": list(self.bounds),
            "crs": self.crs,
            "resolution": self.resolution,
            "years": list(self.years),
            "num_bands": self.num_bands,
            "chunk_h": self.chunk_h,
            "chunk_w": self.chunk_w,
            "width": self.width,
            "height": self.height,
        }

    @staticmethod
    def from_dict(d: dict) -> "OutputGrid":
        return OutputGrid(
            bounds=tuple(d["bounds"]),
            crs=d["crs"],
            resolution=d["resolution"],
            years=tuple(d["years"]),
            num_bands=d["num_bands"],
            chunk_h=d["chunk_h"],
            chunk_w=d["chunk_w"],
        )
