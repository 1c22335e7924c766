"""Grid invariants mirroring the reference's regression tests
(/root/reference/src/index/output_grid.rs:418-854): round-up to chunk
multiples, TOP-DOWN rows, pixel round-trips, analytic chunk ranges."""

import numpy as np

from aef_mosaic_spark.grid import NODATA, OutputGrid, hilbert_d, hilbert_order_for


def g(**kw):
    base = dict(
        bounds=(500000.0, 4090000.0, 520000.0, 4110000.0),
        crs="EPSG:32610",
        resolution=10.0,
        years=(2023, 2024),
        num_bands=3,
        chunk_h=256,
        chunk_w=256,
    )
    base.update(kw)
    return OutputGrid(**base)


def test_dims_rounded_up_to_chunks():
    # the reference's 391-px -> 512 case (output_grid.rs dimension tests)
    gr = g(bounds=(0.0, 0.0, 3910.0, 3910.0))
    assert gr.width == 512 and gr.height == 512
    assert gr.chunk_rows == 2 and gr.chunk_cols == 2


def test_top_down_row_zero_at_max_y():
    gr = g()
    cb = gr.chunk_bounds(0, 0)
    assert cb[3] == gr.bounds[3]  # row 0 touches max_y
    last = gr.chunk_bounds(gr.chunk_rows - 1, 0)
    assert last[1] < cb[1]


def test_pixel_roundtrip():
    gr = g()
    cols = np.array([0, 5, 100, 2047])
    rows = np.array([0, 7, 999, 2047])
    x, y = gr.pixel_to_crs(cols, rows)
    c2, r2 = gr.crs_to_pixel(x, y)
    assert np.allclose(np.floor(c2), cols)
    assert np.allclose(np.floor(r2), rows)


def test_pixel_center_convention():
    gr = g()
    x, y = gr.pixel_to_crs(np.array([0]), np.array([0]))
    assert x[0] == gr.bounds[0] + 5.0  # +0.5 px at 10 m
    assert y[0] == gr.bounds[3] - 5.0


def test_chunk_ranges_basic():
    gr = g()
    # a box inside chunk (1, 0): rows top-down
    rng = gr.chunk_ranges_for_bounds((500100, 4104000, 501500, 4105000))
    assert rng == (1, 2, 0, 0)


def test_chunk_ranges_disjoint():
    gr = g()
    assert gr.chunk_ranges_for_bounds((900000, 4090000, 901000, 4091000)) is None


def test_chunk_ranges_clip():
    gr = g()
    rng = gr.chunk_ranges_for_bounds((400000, 4000000, 600000, 4200000))
    assert rng == (0, gr.chunk_rows - 1, 0, gr.chunk_cols - 1)


def test_chunk_ranges_exact_boundary():
    gr = g()
    # box exactly on a chunk boundary must not leak into the neighbor
    cb = gr.chunk_bounds(1, 1)
    rng = gr.chunk_ranges_for_bounds(cb)
    assert rng == (1, 1, 1, 1)


def test_hilbert_bijective_and_local():
    order = 5
    n = 1 << order
    xx, yy = np.meshgrid(np.arange(n), np.arange(n))
    d = hilbert_d(xx.ravel(), yy.ravel(), order)
    assert sorted(d.tolist()) == list(range(n * n))  # bijection
    # successive hilbert indices are grid neighbors (locality property)
    pos = np.empty((n * n, 2), np.int64)
    pos[d] = np.stack([xx.ravel(), yy.ravel()], axis=1)
    steps = np.abs(np.diff(pos, axis=0)).sum(axis=1)
    assert (steps == 1).all()


def test_hilbert_order_for():
    assert hilbert_order_for(1) == 1
    assert hilbert_order_for(8) == 3
    assert hilbert_order_for(9) == 4


def test_enumerate_chunks():
    gr = g(bounds=(0.0, 0.0, 5120.0, 5120.0))
    chunks = gr.enumerate_chunks()
    assert len(chunks) == gr.num_chunks == 2 * 2 * 2
    assert len(set(chunks)) == len(chunks)


def test_time_idx():
    gr = g()
    assert gr.time_idx_for_year(2023) == 0
    assert gr.time_idx_for_year(2024) == 1
    assert gr.time_idx_for_year(1999) is None


def test_serde_roundtrip():
    gr = g()
    assert OutputGrid.from_dict(gr.to_dict()) == gr


def test_nodata_constant():
    assert NODATA == -128  # reference mosaic.rs:20


def test_reference_original_bug_scenario():
    """Reproduces the reference's production-bug regression test
    (/root/reference/src/index/output_grid.rs:797-853): grid over the
    SF-area WGS84 box in UTM 10N at 10 m, chunk 1024; pixel (row=838,
    col=886) must land inside chunk (0,0)'s bounds, and chunk (0,0)
    must sit at the grid TOP (max_y ~ 4189403, not ~4182887 as in the
    bottom-up bug)."""
    from aef_mosaic_spark import proj

    utm = proj.transform_bounds((-122.5, 37.7, -122.3, 37.85),
                                "EPSG:4326", "EPSG:32610")
    gr = OutputGrid(bounds=utm, crs="EPSG:32610", resolution=10.0,
                    years=(2024,), num_bands=64, chunk_h=1024, chunk_w=1024)
    row, col = 838, 886
    x, y = gr.pixel_to_crs(np.array([col]), np.array([row]))
    cb = gr.chunk_bounds(row // 1024, col // 1024)  # chunk (0, 0)
    assert cb[0] <= x[0] <= cb[2]
    assert cb[1] <= y[0] <= cb[3]
    # top-down: chunk (0,0) max_y is the grid top (the bug had ~4182887)
    assert cb[3] > 4185000.0
    # world_y of the pixel ~ 4181018 (reference's recorded value)
    assert abs(y[0] - 4181018) < 2000
