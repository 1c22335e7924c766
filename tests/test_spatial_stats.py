"""Moran's I / Getis-Ord Gi* vs NumPy goldens on planted lattices."""

import numpy as np
import pandas as pd
import pytest

from aef_mosaic_spark.operators.spatial_stats import (bin_cells,
                                                      getis_ord_hotspots,
                                                      morans_i)


def _points_df(spark, cells, per_cell, cell_deg=4):
    """One point cluster per (cx, cy) lattice cell, `per_cell[i]`
    points each, all landing inside the cell."""
    rows = []
    pid = 0
    for (cx, cy), k in zip(cells, per_cell):
        for j in range(k):
            rows.append((pid, cx * cell_deg + 0.5 + (j % 3) * 0.7,
                         cy * cell_deg + 0.5 + (j % 2) * 0.9))
            pid += 1
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["point_id", "lon", "lat"]))


def _golden_moran(cells, x):
    n = len(cells)
    s = sum(x)
    idx = {c: v for c, v in zip(cells, x)}
    num = s0 = 0
    for (cx, cy), xi in idx.items():
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                if (dx, dy) == (0, 0):
                    continue
                xj = idx.get((cx + dx, cy + dy))
                if xj is None:
                    continue
                s0 += 1
                num += (n * xi - s) * (n * xj - s)
    den = sum((n * xi - s) ** 2 for xi in x)
    return n * num / (s0 * den)


def test_moran_checkerboard_negative(spark):
    # alternating high/low lattice -> strong NEGATIVE autocorrelation
    cells = [(cx, cy) for cx in range(4) for cy in range(4)]
    x = [9 if (cx + cy) % 2 == 0 else 1 for cx, cy in cells]
    got = {r["cell_deg"]: r for r in
           morans_i(_points_df(spark, cells, x), cell_degs=(4,)).collect()}
    exp = _golden_moran(cells, x)
    assert got[4]["moran_i"] == pytest.approx(exp, abs=2e-6)
    # queen weights keep 4/8 same-colour diagonal neighbors, so the
    # checkerboard reads -1/7, not the rook -1
    assert got[4]["moran_i"] < -0.1


def test_moran_gradient_positive(spark):
    # smooth left-to-right gradient -> positive autocorrelation
    cells = [(cx, cy) for cx in range(6) for cy in range(4)]
    x = [1 + 3 * cx for cx, cy in cells]
    got = morans_i(_points_df(spark, cells, x), cell_degs=(4,)).collect()
    exp = _golden_moran(cells, x)
    assert got[0]["moran_i"] == pytest.approx(exp, abs=2e-6)
    assert got[0]["moran_i"] > 0.3


def test_moran_nested_scales_match_direct_binning(spark):
    # the halved coarse lattice must equal binning points directly at
    # the coarse size
    cells = [(cx, cy) for cx in range(8) for cy in range(8)]
    x = [1 + ((cx * 7 + cy * 13) % 5) for cx, cy in cells]
    pts = _points_df(spark, cells, x, cell_deg=4)
    multi = {r["cell_deg"]: r
             for r in morans_i(pts, cell_degs=(4, 8)).collect()}
    direct = morans_i(pts, cell_degs=(8,)).collect()[0]
    for k in ("n_cells", "s0", "num", "den", "moran_i"):
        assert multi[8][k] == direct[k], k


def test_moran_constant_lattice_null(spark):
    cells = [(cx, cy) for cx in range(3) for cy in range(3)]
    got = morans_i(_points_df(spark, cells, [5] * 9),
                   cell_degs=(4,)).collect()
    assert got[0]["moran_i"] is None and got[0]["den"] == 0


def test_gi_star_flags_the_hotspot(spark):
    # flat field of 2s with one 3x3 block of 30s -> the block center
    # carries the max z-score and it is strongly positive
    cells = [(cx, cy) for cx in range(8) for cy in range(8)]
    x = [30 if (3 <= cx <= 5 and 3 <= cy <= 5) else 2
         for cx, cy in cells]
    out = getis_ord_hotspots(_points_df(spark, cells, x, cell_deg=8),
                             cell_deg=8).collect()
    assert len(out) == 64
    top = max(out, key=lambda r: r["gi_z"])
    assert (top["cx"], top["cy"]) == (4, 4)
    assert top["gi_z"] > 5.0
    # golden z at the center: textbook formula
    n, xs = 64, np.array(x, dtype=float)
    sj = 9 * 30.0
    wi = 9
    xbar, sdev = xs.mean(), xs.std(ddof=0)
    exp = (sj - xbar * wi) / (sdev * np.sqrt((n * wi - wi * wi) / (n - 1)))
    assert top["gi_z"] == pytest.approx(exp, rel=1e-9, abs=2e-6)


def test_bin_cells_negative_coordinates_floor(spark):
    # floor (not truncate-toward-zero) binning for negative lon/lat
    pts = spark.createDataFrame(
        pd.DataFrame({"point_id": [0, 1], "lon": [-0.5, 0.5],
                      "lat": [-170.0 + 1e-6, 0.5]}))
    got = {(r["cx"], r["cy"]): r["x"]
           for r in bin_cells(pts, 4).collect()}
    assert (-1, -43) in got and (0, 0) in got


def test_moran_requires_doubling_scales(spark):
    with pytest.raises(ValueError):
        morans_i(_points_df(spark, [(0, 0)], [1]), cell_degs=(4, 12))


# ------------------------------------------------------------------ #
# emerging hotspots + Ripley K                                        #
# ------------------------------------------------------------------ #

def test_emerging_hotspots_trend_direction(spark):
    from aef_mosaic_spark.operators.spatial_stats import emerging_hotspots
    cells = [(cx, cy) for cx in range(5) for cy in range(5)]
    rows, pid = [], 0
    for tb in range(4):
        for (cx, cy) in cells:
            if (cx, cy) == (2, 2):
                k = [5, 10, 20, 30][tb]      # rising hotspot
            elif (cx, cy) == (0, 0):
                k = [30, 20, 10, 5][tb]      # fading hotspot
            else:
                k = 5
            for j in range(k):
                rows.append((pid, tb, cx * 4 + 0.5 + (j % 3) * 0.8,
                             cy * 4 + 0.5 + (j % 2) * 0.9))
                pid += 1
    pts = spark.createDataFrame(
        pd.DataFrame(rows, columns=["point_id", "tb", "lon", "lat"]))
    got = {(r["cx"], r["cy"]): r
           for r in emerging_hotspots(pts, cell_deg=4).collect()}
    assert got[(2, 2)]["trend"] == "emerging"
    assert got[(2, 2)]["s_mk"] == 6          # strictly rising z: C(4,2)
    assert got[(0, 0)]["trend"] == "fading"
    assert got[(0, 0)]["s_mk"] == -6
    assert all(r["n_t"] == 4 for r in got.values())


def test_ripley_k_matches_bruteforce_and_detects_clustering(spark):
    from aef_mosaic_spark.operators.spatial_stats import ripley_k
    rng = np.random.RandomState(3)
    # clustered: 20 tight blobs; dispersed: uniform over the same box
    blobs = rng.uniform(-40, 40, (20, 2))
    clustered = np.concatenate([
        b + rng.uniform(-0.2, 0.2, (15, 2)) for b in blobs])
    uniform = rng.uniform(-40, 40, (300, 2))

    def run(arr):
        pdf = pd.DataFrame({"point_id": np.arange(len(arr)),
                            "lon": arr[:, 0], "lat": arr[:, 1]})
        out = {r["r_mdeg"]: r for r in
               ripley_k(spark.createDataFrame(pdf)).collect()}
        # brute-force golden at every radius, same integer law
        ix = np.floor(arr * 1e6 + 0.5).astype(np.int64)
        d2 = ((ix[:, None, :] - ix[None, :, :]).astype(np.int64) ** 2
              ).sum(-1)
        np.fill_diagonal(d2, np.iinfo(np.int64).max)
        for r_mdeg, row in out.items():
            exp = int((d2 <= r_mdeg * r_mdeg).sum())
            assert row["n_pairs"] == exp, r_mdeg
        return out

    c, u = run(clustered), run(uniform)
    assert c[500000]["mean_neighbors_q"] > 5 * u[500000]["mean_neighbors_q"]


def test_colocation_participation_golden(spark):
    from aef_mosaic_spark.operators.spatial_stats import (
        colocation_patterns)
    # type A at x=0,2,4..; type B at x+0.5 near HALF the A's; type C
    # far away -> pr(A,B) = 0.5, pr(B,A) = 1.0, no (A,C) rows
    rows = []
    pid = 0
    for i in range(10):
        rows.append((pid, "A", 10.0 * i, 0.0)); pid += 1
    for i in range(5):
        rows.append((pid, "B", 10.0 * i + 0.5, 0.5)); pid += 1
    for i in range(4):
        rows.append((pid, "C", 10.0 * i, 200.0)); pid += 1
    pts = spark.createDataFrame(
        pd.DataFrame(rows, columns=["pid", "etype", "lon", "lat"]))
    got = {(r["type_a"], r["type_b"]): r
           for r in colocation_patterns(pts).collect()}
    assert got[("A", "B")]["pr_q"] == pytest.approx(0.5)
    assert got[("A", "B")]["n_a"] == 10 and got[("A", "B")]["n_near"] == 5
    assert got[("B", "A")]["pr_q"] == pytest.approx(1.0)
    assert ("A", "C") not in got and ("C", "A") not in got


def test_co_travelers_convoys_and_occupancy_cap(spark):
    import pandas as pd
    from aef_mosaic_spark.operators.sessions import co_travelers
    rows = []
    # convoy: users 1,2 share cells across 5 hours; user 3 overlaps
    # only twice (below min_shared=3); hour 100 is a CROWD key (60
    # users in one cell) that must not create pairs
    for t in range(5):
        rows += [(1, 7 + t, 0, t), (2, 7 + t, 0, t)]
    rows += [(3, 7, 0, 0), (3, 8, 0, 1)]
    for u in range(100, 160):
        rows.append((u, 5, 5, 100))
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["user_id", "cx", "cy", "tb"]))
    got = {(r["user_a"], r["user_b"]): r["n_shared"]
           for r in co_travelers(df).collect()}
    assert got == {(1, 2): 5}
    # raising the cap above the crowd size lets the crowd pair
    got2 = co_travelers(df, max_occupancy=100).count()
    assert got2 == 1 + 0  # crowd keys shared only ONCE -> still below
    # min_shared; lower min_shared to see them
    got3 = co_travelers(df, min_shared=1, max_occupancy=100).count()
    assert got3 > 1000


def test_morton_ranges_exact_capped_and_disjoint():
    from aef_mosaic_spark.functions.tiles import morton_ranges

    def deinterleave(m):
        x = y = 0
        for i in range(16):
            x |= ((m >> (2 * i)) & 1) << i
            y |= ((m >> (2 * i + 1)) & 1) << i
        return x, y

    r = morton_ranges(130, 169, 90, 113, 8, max_ranges=None)
    # sorted, disjoint, merged
    for (l0, h0), (l1, h1) in zip(r, r[1:]):
        assert h0 + 1 < l1
    cells = {deinterleave(m) for lo, hi in r for m in range(lo, hi + 1)}
    assert cells == {(x, y) for x in range(130, 170)
                     for y in range(90, 114)}
    # capped version over-covers but never under-covers
    r16 = morton_ranges(130, 169, 90, 113, 8, max_ranges=16)
    assert len(r16) <= 16
    c16 = {deinterleave(m) for lo, hi in r16 for m in range(lo, hi + 1)}
    assert cells <= c16
    # aligned block is ONE range
    assert morton_ranges(0, 255, 0, 255, 8, max_ranges=None) \
        == [(0, 65535)]
    import pytest as _pt
    with _pt.raises(ValueError):
        morton_ranges(0, 256, 0, 10, 8)


def test_gearys_c_direction_and_golden(spark):
    from aef_mosaic_spark.operators.spatial_stats import gearys_c
    # gradient -> C < 1 (positive autocorrelation); checkerboard ->
    # C > 1 (negative)
    cells = [(cx, cy) for cx in range(6) for cy in range(4)]
    grad = [1 + 3 * cx for cx, cy in cells]
    chk = [9 if (cx + cy) % 2 == 0 else 1 for cx, cy in cells]

    def golden(xs):
        n, s = len(cells), sum(xs)
        idx = dict(zip(cells, xs))
        num = s0 = 0
        for (cx, cy), xi in idx.items():
            for dx in (-1, 0, 1):
                for dy in (-1, 0, 1):
                    if (dx, dy) == (0, 0):
                        continue
                    xj = idx.get((cx + dx, cy + dy))
                    if xj is None:
                        continue
                    s0 += 1
                    num += (n * xi - n * xj) ** 2
        den = sum((n * xi - s) ** 2 for xi in xs)
        return (n - 1) * num / (2 * s0 * den)

    # queen diagonals dilute the checkerboard (the Moran -1/7
    # effect): C reads ~1.07, still on the negative side of 1
    for xs, lo, hi in ((grad, 0.0, 0.7), (chk, 1.0, 3.0)):
        got = gearys_c(_points_df(spark, cells, xs),
                       cell_deg=4).collect()[0]
        assert got["geary_c"] == pytest.approx(golden(xs), abs=2e-6)
        assert lo < got["geary_c"] < hi


def test_semivariogram_golden_and_monotone(spark):
    from aef_mosaic_spark.operators.spatial_stats import semivariogram
    rng = np.random.RandomState(17)
    # values = smooth function of position + noise -> gamma grows
    # with distance
    n = 400
    lon = rng.uniform(-10, 10, n)
    lat = rng.uniform(-10, 10, n)
    v = (lon * 300 + lat * 200 + rng.normal(0, 40, n)).astype(np.int64)
    pdf = pd.DataFrame({"point_id": np.arange(n), "lon": lon,
                        "lat": lat, "v": v})
    got = {r["r_hi_mdeg"]: r for r in semivariogram(
        spark.createDataFrame(pdf)).collect()}
    # brute-force golden, same integer law
    ix = np.floor(np.stack([lon, lat], 1) * 1e6 + 0.5).astype(np.int64)
    d2 = ((ix[:, None, :] - ix[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d2, -1)
    dv2 = (v[:, None] - v[None, :]) ** 2
    lo = [0, 500000, 1000000]
    for l, h in zip(lo, (500000, 1000000, 2000000)):
        m = (d2 > l * l) & (d2 <= h * h)
        npairs, gnum = int(m.sum()), int(dv2[m].sum())
        assert (got[h]["n_pairs"], got[h]["gamma_num"]) == (npairs, gnum)
        exp = np.floor(gnum / (2 * npairs) * 1e6 + 0.5) / 1e6
        assert got[h]["gamma_q"] == pytest.approx(exp, abs=1e-9)
    assert got[500000]["gamma_q"] < got[1000000]["gamma_q"] \
        < got[2000000]["gamma_q"]


def test_local_moran_quadrants_and_golden(spark):
    from aef_mosaic_spark.operators.spatial_stats import local_moran
    # left half high (20), right half low (2): interior cells are HH
    # or LL clusters with positive I_i; the boundary columns read as
    # the transition
    cells = [(cx, cy) for cx in range(6) for cy in range(4)]
    x = [20 if cx < 3 else 2 for cx, cy in cells]
    got = {(r["cx"], r["cy"]): r for r in local_moran(
        _points_df(spark, cells, x), cell_deg=4).collect()}
    assert got[(0, 1)]["quadrant"] == "HH" and got[(0, 1)]["ii_q"] > 0
    assert got[(5, 1)]["quadrant"] == "LL" and got[(5, 1)]["ii_q"] > 0
    # golden at one cell
    n, s = len(cells), sum(x)
    idx = dict(zip(cells, x))
    den = sum((n * xi - s) ** 2 for xi in x)
    sumdev = sum(n * idx[(0 + dx, 1 + dy)] - s
                 for dx in (-1, 0, 1) for dy in (-1, 0, 1)
                 if (dx, dy) != (0, 0) and (0 + dx, 1 + dy) in idx)
    exp = np.floor(n * (n * 20 - s) * sumdev / den * 1e6 + 0.5) / 1e6
    assert got[(0, 1)]["ii_q"] == pytest.approx(exp, abs=1e-9)
    # an isolated far-away cell reads 'isolate'
    cells2 = cells + [(50, 50)]
    x2 = x + [5]
    got2 = {(r["cx"], r["cy"]): r for r in local_moran(
        _points_df(spark, cells2, x2), cell_deg=4).collect()}
    assert got2[(50, 50)]["quadrant"] == "isolate"
    assert got2[(50, 50)]["ii_q"] is None


def test_directional_variogram_detects_anisotropy(spark):
    from aef_mosaic_spark.operators.spatial_stats import (
        semivariogram_directional)
    rng = np.random.RandomState(23)
    n = 400
    lon = rng.uniform(-10, 10, n)
    lat = rng.uniform(-10, 10, n)
    # value varies with LON only -> EW pairs see big diffs, NS small
    v = (lon * 500).astype(np.int64)
    got = {(r["direction"], r["r_hi_mdeg"]): r
           for r in semivariogram_directional(
               spark.createDataFrame(pd.DataFrame(
                   {"point_id": np.arange(n), "lon": lon, "lat": lat,
                    "v": v}))).collect()}
    for h in (500000, 1000000, 2000000):
        assert got[("EW", h)]["gamma_q"] > 3 * got[("NS", h)]["gamma_q"]
    # conservation vs the omnidirectional q192 law: per band, the
    # EW + NS pair counts and numerators partition the total
    from aef_mosaic_spark.operators.spatial_stats import semivariogram
    omni = {r["r_hi_mdeg"]: r for r in semivariogram(
        spark.createDataFrame(pd.DataFrame(
            {"point_id": np.arange(n), "lon": lon, "lat": lat,
             "v": v}))).collect()}
    for h in (500000, 1000000, 2000000):
        assert (got[("EW", h)]["n_pairs"] + got[("NS", h)]["n_pairs"]
                == omni[h]["n_pairs"])
        assert (got[("EW", h)]["gamma_num"] + got[("NS", h)]["gamma_num"]
                == omni[h]["gamma_num"])
