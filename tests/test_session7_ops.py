"""Session-7 operators: ACF, containment dedup, morphology, histogram
matching."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from aef_mosaic_spark.operators.anomaly import acf


def _series_df(spark, per_user_values, t0=1_700_000_000):
    rows = []
    eid = 0
    for uid, vals in per_user_values.items():
        for i, v in enumerate(vals):
            rows.append((eid, uid, pd.Timestamp(t0 + i * 60, unit="s"),
                         float(v)))
            eid += 1
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["event_id", "user_id", "ts", "value"]))


def _golden_acf(vals, k):
    vc = np.array([int(np.floor(v * 100 + 0.5)) for v in vals],
                  dtype=np.int64)
    n = len(vc)
    r = vc - vc.sum() // n
    num = int((r[:-k] * r[k:]).sum())
    den = int((r * r).sum())
    return num, den, np.floor(1e6 * num / den + 0.5) / 1e6


def test_acf_alternating_series(spark):
    vals = [10.0, 0.0] * 10
    got = {r["lag"]: r for r in
           acf(_series_df(spark, {1: vals})).collect()}
    for k in (1, 2, 3):
        num, den, a = _golden_acf(vals, k)
        assert (got[k]["num"], got[k]["den"]) == (num, den)
        assert got[k]["acf_q"] == pytest.approx(a, abs=1e-9)
    assert got[1]["acf_q"] < -0.9 and got[2]["acf_q"] > 0.85


def test_acf_constant_and_short_series_excluded(spark):
    got = acf(_series_df(spark, {1: [5.0] * 10, 2: [1.0, 2.0]})).collect()
    # user 1 constant -> den 0; user 2 too short for every lag but 1?
    # n=2 fails n > lag+1 even at lag 1
    assert got == []


def test_acf_random_matches_golden(spark):
    rng = np.random.RandomState(7)
    series = {u: rng.randint(0, 500, 40) / 2.0 for u in range(5)}
    got = {(r["user_id"], r["lag"]): r
           for r in acf(_series_df(spark, series)).collect()}
    for u, vals in series.items():
        for k in (1, 2, 3):
            num, den, a = _golden_acf(list(vals), k)
            assert got[(u, k)]["num"] == num
            assert got[(u, k)]["acf_q"] == pytest.approx(a, abs=1e-9)


# ------------------------------------------------------------------ #
# containment_pairs                                                   #
# ------------------------------------------------------------------ #

def _docs_df(spark, docs):
    return spark.createDataFrame(
        pd.DataFrame(docs, columns=["doc_id", "text"]))


def test_containment_excerpt_is_directional(spark):
    from aef_mosaic_spark.operators.dedup import containment_pairs
    words = [f"tok{i}x" for i in range(200)]
    parent = " ".join(words)
    excerpt = " ".join(words[:30])
    other = " ".join(f"z{i}q" for i in range(150))
    out = {(r["id_src"], r["id_dst"]): r for r in
           containment_pairs(_docs_df(spark, [(1, parent), (2, excerpt),
                                              (3, other)]),
                             "doc_id", "text",
                             threshold=0.5).collect()}
    # excerpt fully contained in parent; parent NOT in excerpt
    assert out[(2, 1)]["containment"] == 1.0
    assert (1, 2) not in out and (1, 3) not in out and (3, 1) not in out
    # jaccard for the same pair would be 28/198 ~ 0.14
    assert out[(2, 1)]["inter"] == 28


def test_containment_df_cap_drops_boilerplate(spark):
    from aef_mosaic_spark.operators.dedup import containment_pairs
    # the shared 3-gram "the same header" appears in every doc; with
    # max_df below the corpus size it cannot create pairs
    docs = [(i, f"the same header u{i}a u{i}b u{i}c u{i}d") for i in range(9)]
    out = containment_pairs(_docs_df(spark, docs), "doc_id", "text",
                            threshold=0.1, max_df=5).collect()
    assert out == []
    # raising the cap above the corpus size lets it back in
    out2 = containment_pairs(_docs_df(spark, docs), "doc_id", "text",
                             threshold=0.1, max_df=50).collect()
    assert len(out2) == 9 * 8


# ------------------------------------------------------------------ #
# morphology + histogram matching                                     #
# ------------------------------------------------------------------ #

from aef_mosaic_spark.grid import OutputGrid
from aef_mosaic_spark.operators.focal import (histogram_match, match_luts,
                                              morphology,
                                              morphology_oracle_np)

CHH = CHW = 32
NB = 2
NR = NC = 3


@pytest.fixture(scope="module")
def mgrid():
    return OutputGrid(
        bounds=(0.0, 0.0, CHW * NC * 10.0, CHH * NR * 10.0),
        crs="EPSG:32610", resolution=10.0, years=(2023,),
        num_bands=NB, chunk_h=CHH, chunk_w=CHW,
    )


def _mchunks(skip=()):
    rows, canvas = [], np.zeros((NB, CHH * NR, CHW * NC), np.uint8)
    for ri in range(NR):
        for ci in range(NC):
            if (ri, ci) in skip:
                continue
            yy, xx = np.mgrid[0:CHH, 0:CHW]
            arr = np.stack([
                ((yy * 5 + xx * 11 + ri * 37 + ci * 19 + b * 73) % 241
                 ).astype(np.uint8) for b in range(NB)])
            # plant a bright speck and a dark pinhole per chunk
            arr[:, 4, 4] = 255
            arr[:, 20, 20] = 0
            canvas[:, ri * CHH:(ri + 1) * CHH,
                   ci * CHW:(ci + 1) * CHW] = arr
            rows.append({"time_idx": 0, "row_idx": ri, "col_idx": ci,
                         "chunk": arr.tobytes()})
    return rows, canvas


def _mcollect(df):
    return {(r.time_idx, r.row_idx, r.col_idx):
            np.frombuffer(r.chunk, np.uint8).reshape(NB, CHH, CHW)
            for r in df.collect()}


@pytest.mark.parametrize("op", ["open", "close"])
def test_morphology_matches_stitched_golden(spark, mgrid, op):
    rows, canvas = _mchunks()
    sdf = spark.createDataFrame(pd.DataFrame(rows))
    golden = morphology_oracle_np(canvas, op, 1)
    got = _mcollect(morphology(sdf, mgrid, op=op, radius=1))
    assert len(got) == NR * NC
    for (t, ri, ci), arr in got.items():
        exp = golden[:, ri * CHH:(ri + 1) * CHH, ci * CHW:(ci + 1) * CHW]
        np.testing.assert_array_equal(arr, exp)


def test_morphology_sparse_mask_law(spark, mgrid):
    skip = ((1, 1),)
    rows, canvas = _mchunks(skip=skip)
    mask = np.ones((CHH * NR, CHW * NC), bool)
    for ri, ci in skip:
        mask[ri * CHH:(ri + 1) * CHH, ci * CHW:(ci + 1) * CHW] = False
    sdf = spark.createDataFrame(pd.DataFrame(rows))
    golden = morphology_oracle_np(canvas, "close", 1, mask=mask)
    got = _mcollect(morphology(sdf, mgrid, op="close", radius=1))
    assert len(got) == NR * NC - 1
    for (t, ri, ci), arr in got.items():
        exp = golden[:, ri * CHH:(ri + 1) * CHH, ci * CHW:(ci + 1) * CHW]
        np.testing.assert_array_equal(arr, exp)


def test_morphology_semantics_speck_and_pinhole(spark, mgrid):
    rows, _ = _mchunks()
    sdf = spark.createDataFrame(pd.DataFrame(rows))
    opened = _mcollect(morphology(sdf, mgrid, op="open"))[(0, 1, 1)]
    closed = _mcollect(morphology(sdf, mgrid, op="close"))[(0, 1, 1)]
    src = np.frombuffer(rows[4]["chunk"], np.uint8).reshape(NB, CHH, CHW)
    # opening kills the isolated bright speck; closing fills the
    # isolated dark pinhole
    assert src[0, 4, 4] == 255 and opened[0, 4, 4] < 255
    assert src[0, 20, 20] == 0 and closed[0, 20, 20] > 0
    with pytest.raises(ValueError):
        morphology(sdf, mgrid, op="erode")


def test_histogram_match_self_is_identity(spark, mgrid):
    rows, _ = _mchunks()
    sdf = spark.createDataFrame(pd.DataFrame(rows))
    got = _mcollect(histogram_match(sdf, sdf, mgrid))
    src = _mcollect(spark.createDataFrame(pd.DataFrame(rows)).select(
        "time_idx", "row_idx", "col_idx", "chunk",))
    for k in src:
        np.testing.assert_array_equal(got[k], src[k])


def test_histogram_match_golden_and_monotone(spark, mgrid):
    rows, canvas = _mchunks()
    # reference: a brightened copy (tone curve shifted up)
    ref_rows = []
    for r in rows:
        arr = np.frombuffer(r["chunk"], np.uint8).reshape(NB, CHH, CHW)
        ref_rows.append({**r, "chunk": np.clip(arr.astype(np.int32)
                                               + 40, 0, 255)
                         .astype(np.uint8).tobytes()})
    src = spark.createDataFrame(pd.DataFrame(rows))
    ref = spark.createDataFrame(pd.DataFrame(ref_rows))
    from aef_mosaic_spark.operators.focal import global_histogram
    luts = match_luts(global_histogram(src, mgrid).collect(),
                      global_histogram(ref, mgrid).collect(), NB)
    assert all(np.all(np.diff(luts[b].astype(int)) >= 0)
               for b in range(NB))
    got = _mcollect(histogram_match(src, ref, mgrid))
    for (t, ri, ci), arr in got.items():
        a = canvas[:, ri * CHH:(ri + 1) * CHH, ci * CHW:(ci + 1) * CHW]
        exp = np.stack([luts[b][a[b]] for b in range(NB)])
        np.testing.assert_array_equal(arr, exp)
    # matched means move toward the reference's (+40) brightness
    src_mean = canvas.mean()
    got_mean = np.mean([a.mean() for a in got.values()])
    assert got_mean > src_mean + 25


# ------------------------------------------------------------------ #
# Otsu threshold + mask                                                #
# ------------------------------------------------------------------ #

def test_otsu_threshold_matches_textbook_float(spark):
    from aef_mosaic_spark.operators.focal import otsu_thresholds
    rng = np.random.RandomState(5)
    # clearly bimodal histogram: peaks near 60 and 190
    vals = np.concatenate([
        np.clip(rng.normal(60, 12, 40000), 0, 255),
        np.clip(rng.normal(190, 15, 25000), 0, 255)]).astype(np.uint8)
    h = np.bincount(vals, minlength=256)
    rows = [{"band": 0, "bin": i, "cnt": int(c)}
            for i, c in enumerate(h) if c]
    got = otsu_thresholds(rows, 1)[0]
    # textbook float implementation
    p = h / h.sum()
    best_t, best_v = 0, -1.0
    for t in range(255):
        w0, w1 = p[:t + 1].sum(), p[t + 1:].sum()
        if w0 == 0 or w1 == 0:
            continue
        mu0 = (np.arange(t + 1) * p[:t + 1]).sum() / w0
        mu1 = (np.arange(t + 1, 256) * p[t + 1:]).sum() / w1
        v = w0 * w1 * (mu0 - mu1) ** 2
        if v > best_v:
            best_t, best_v = t, v
    # the empty gap between the two modes is a variance PLATEAU: every
    # t in it ties exactly, so the float reference lands anywhere in
    # the plateau by rounding noise; the integer law takes the
    # smallest.  Assert got achieves the max and is the first to.
    def var_at(t):
        w0, w1 = p[:t + 1].sum(), p[t + 1:].sum()
        mu0 = (np.arange(t + 1) * p[:t + 1]).sum() / w0
        mu1 = (np.arange(t + 1, 256) * p[t + 1:]).sum() / w1
        return w0 * w1 * (mu0 - mu1) ** 2
    assert var_at(got) == pytest.approx(best_v, rel=1e-9)
    assert got <= best_t
    assert var_at(got - 1) < best_v * (1 - 1e-9)
    assert 90 < got < 170


def test_otsu_mask_two_level_image(spark, mgrid):
    from aef_mosaic_spark.operators.focal import otsu_mask
    rows = []
    for ri in range(NR):
        for ci in range(NC):
            arr = np.full((NB, CHH, CHW), 40, np.uint8)
            arr[:, :CHH // 2, :] = 200       # top half bright
            rows.append({"time_idx": 0, "row_idx": ri, "col_idx": ci,
                         "chunk": arr.tobytes()})
    sdf = spark.createDataFrame(pd.DataFrame(rows))
    masks, ths = otsu_mask(sdf, mgrid)
    # two spikes tie across every t in [40, 199]; smallest-t law
    assert ths == [40] * NB
    got = _mcollect(masks)
    for arr in got.values():
        assert set(np.unique(arr[:, :CHH // 2, :])) == {255}
        assert set(np.unique(arr[:, CHH // 2:, :])) == {0}


# ------------------------------------------------------------------ #
# sieve filter                                                          #
# ------------------------------------------------------------------ #

def test_sieve_matches_stitched_golden_and_crosses_chunks(spark, mgrid):
    from aef_mosaic_spark.operators.regions import (sieve_chunks,
                                                    sieve_golden_np)
    H, W = CHH * NR, CHW * NC
    mask = np.zeros((H, W), bool)
    # large blob (survives)
    mask[10:30, 10:40] = True
    # small specks in several chunks (erased)
    for r, c in ((5, 70), (40, 5), (70, 70), (90, 20)):
        mask[r:r + 2, c:c + 2] = True
    # thin region CROSSING a chunk border: per-chunk fragments are
    # each < min_pixels but the stitched total is >= — it must SURVIVE
    mask[CHH - 3:CHH + 3, 50:54] = True    # 24 px spanning rows 29..34
    # small region crossing a border whose TOTAL is still small ->
    # erased even though it spans two chunks
    mask[CHH - 1:CHH + 1, 90:92] = True    # 4 px across the border
    rows = []
    for ri in range(NR):
        for ci in range(NC):
            sub = mask[ri * CHH:(ri + 1) * CHH, ci * CHW:(ci + 1) * CHW]
            arr = np.zeros((NB, CHH, CHW), np.uint8)
            arr[0] = sub.astype(np.uint8) * 255
            rows.append({"time_idx": 0, "row_idx": ri, "col_idx": ci,
                         "chunk": arr.tobytes()})
    sdf = spark.createDataFrame(pd.DataFrame(rows))
    out = sieve_chunks(sdf, mgrid, threshold=128, band=0, min_pixels=16)
    got = {(r.time_idx, r.row_idx, r.col_idx):
           (np.frombuffer(r.chunk, np.uint8).reshape(CHH, CHW),
            r.n_erased) for r in out.collect()}
    golden = sieve_golden_np(mask, 16).astype(np.uint8) * 255
    total_erased = 0
    for (t, ri, ci), (arr, ne) in got.items():
        exp = golden[ri * CHH:(ri + 1) * CHH, ci * CHW:(ci + 1) * CHW]
        np.testing.assert_array_equal(arr, exp)
        total_erased += ne
    assert total_erased == int(mask.sum() - (golden > 0).sum())
    # the cross-border 24px region survived; the 4px one did not
    assert golden[CHH, 50] > 0 and golden[CHH, 90] == 0
    assert golden[5, 70] == 0 and golden[15, 20] > 0


# ------------------------------------------------------------------ #
# spatial kNN join / areal interpolation / Benford                    #
# ------------------------------------------------------------------ #

def test_spatial_knn_matches_bruteforce(spark):
    from aef_mosaic_spark.operators.spatial_join import spatial_knn_join
    rng = np.random.RandomState(11)
    pts = rng.uniform(-30, 30, (200, 2))
    sts = rng.uniform(-30, 30, (60, 2))
    pdf = pd.DataFrame({"point_id": np.arange(200),
                        "lon": pts[:, 0], "lat": pts[:, 1]})
    sdf = pd.DataFrame({"site_id": np.arange(60),
                        "lon": sts[:, 0], "lat": sts[:, 1]})
    got = {}
    for r in spatial_knn_join(spark.createDataFrame(pdf),
                              spark.createDataFrame(sdf),
                              k=3, radius_deg=4).collect():
        got.setdefault(r["point_id"], []).append(
            (r["rank"], r["site_id"], r["d2"]))
    ip = np.floor(pts * 1e6 + 0.5).astype(np.int64)
    isx = np.floor(sts * 1e6 + 0.5).astype(np.int64)
    ru = 4_000_000
    n_checked = 0
    for i in range(200):
        dx = ip[i, 0] - isx[:, 0]
        dy = ip[i, 1] - isx[:, 1]
        inr = np.maximum(np.abs(dx), np.abs(dy)) <= ru
        cand = sorted((int(dx[j] * dx[j] + dy[j] * dy[j]), j)
                      for j in np.flatnonzero(inr))[:3]
        exp = [(r + 1, j, d2) for r, (d2, j) in enumerate(cand)]
        assert sorted(got.get(i, [])) == exp, i
        n_checked += len(exp)
    assert n_checked > 100   # the scenario actually exercises matches


def test_areal_interpolation_conservation_and_overlap(spark):
    from aef_mosaic_spark.operators.interpolate import areal_interpolation
    # one box exactly covering 2x1 cells -> 50/50 split; one box
    # 25%/75% split across a cell edge
    b = pd.DataFrame([
        (1, 0.0, 0.0, 2.0, 1.0, 10),
        (2, 4.5, 0.0, 6.5, 1.0, 8),
    ], columns=["box_id", "min_lon", "min_lat", "max_lon", "max_lat",
                "v"])
    got = {(r["cx"], r["cy"]): r for r in
           areal_interpolation(spark.createDataFrame(b), "v").collect()}
    assert got[(0, 0)]["val_u"] == 5_000_000
    assert got[(1, 0)]["val_u"] == 5_000_000
    # box 2: [45, 65] decideg -> cell 4 gets 5/20, cell 5 10/20, cell 6 5/20
    assert got[(4, 0)]["val_u"] == 2_000_000
    assert got[(5, 0)]["val_u"] == 4_000_000
    assert got[(6, 0)]["val_u"] == 2_000_000
    total = sum(r["val_u"] for r in got.values())
    assert total == 18_000_000   # conservation (exact here)


def test_benford_conforming_vs_uniform(spark):
    from aef_mosaic_spark.functions.features import (BENFORD_P_U,
                                                     benford_audit)
    rng = np.random.RandomState(2)
    # log-uniform magnitudes follow Benford; linear-uniform do not
    conf = np.power(10.0, rng.uniform(0, 4, 20000))
    unif = rng.uniform(1, 9.999, 20000) * 1000
    df = pd.DataFrame({
        "grp": ["conf"] * 20000 + ["unif"] * 20000,
        "value": np.concatenate([conf, unif])})
    got = {(r["grp"], r["digit"]): r for r in
           benford_audit(spark.createDataFrame(df), "value",
                         "grp").collect()}
    assert len(got) == 18
    chi_conf = sum(got[("conf", d)]["dev_q"] for d in range(1, 10))
    chi_unif = sum(got[("unif", d)]["dev_q"] for d in range(1, 10))
    assert chi_unif > 50 * max(chi_conf, 1e-9)
    # exact law spot check
    r = got[("unif", 1)]
    a = r["n_d"] * 1_000_000 - r["n"] * BENFORD_P_U[0]
    exp = np.floor(a * a / (1e6 * r["n"] * BENFORD_P_U[0]) * 1e6
                   + 0.5) / 1e6
    assert r["dev_q"] == pytest.approx(exp, abs=1e-9)


def test_benford_missing_digit_surfaces(spark):
    from aef_mosaic_spark.functions.features import benford_audit
    df = pd.DataFrame({"grp": ["g"] * 50,
                       "value": [200.0 + i for i in range(50)]})
    got = {r["digit"]: r for r in
           benford_audit(spark.createDataFrame(df), "value",
                         "grp").collect()}
    assert got[2]["n_d"] == 50
    assert all(got[d]["n_d"] == 0 for d in range(1, 10) if d != 2)
    assert got[1]["dev_q"] > 0


# ------------------------------------------------------------------ #
# Huff gravity catchment                                               #
# ------------------------------------------------------------------ #

def test_huff_probabilities_golden(spark):
    from aef_mosaic_spark.operators.interpolate import (HUFF_WSCALE,
                                                        huff_probabilities)
    # one point, three sites: nearer/heavier sites take more share
    pts = pd.DataFrame({"point_id": [1], "lon": [0.0], "lat": [0.0]})
    sts = pd.DataFrame({
        "site_id": [10, 20, 30, 40],
        "w": [10, 10, 40, 10],
        "lon": [0.5, 1.0, 1.0, 99.0],   # site 40 out of range
        "lat": [0.0, 0.0, 0.0, 0.0]})
    got = {r["site_id"]: r for r in huff_probabilities(
        spark.createDataFrame(pts),
        spark.createDataFrame(sts)).collect()}
    assert set(got) == {10, 20, 30}
    # golden integer law
    def score(w, deg):
        d2 = int(np.floor(deg * 1e6 + 0.5)) ** 2
        return (w * HUFF_WSCALE) // (d2 // 10_000_000_000 + 1)
    s = {10: score(10, 0.5), 20: score(20, 1.0) if False else score(10, 1.0),
         30: score(40, 1.0)}
    tot = sum(s.values())
    for sid in (10, 20, 30):
        assert got[sid]["score"] == s[sid]
        exp = np.floor(s[sid] / tot * 1e6 + 0.5) / 1e6
        assert got[sid]["p_q"] == pytest.approx(exp, abs=1e-9)
    # nearer beats farther at equal weight; heavier beats lighter at
    # equal distance
    assert got[10]["p_q"] > got[20]["p_q"]
    assert got[30]["p_q"] == pytest.approx(4 * got[20]["p_q"], rel=1e-4)
    assert sum(r["p_q"] for r in got.values()) == pytest.approx(1.0, abs=1e-5)


# ------------------------------------------------------------------ #
# basin labels                                                          #
# ------------------------------------------------------------------ #

def test_basin_labels_match_stitched_golden(spark, mgrid):
    from aef_mosaic_spark.operators.focal import (basin_labels,
                                                  basins_oracle_np,
                                                  focal_chunks,
                                                  focal_oracle_np)
    rows, canvas = _mchunks()
    sdf = spark.createDataFrame(pd.DataFrame(rows))
    d8 = focal_chunks(sdf, mgrid, op="d8", radius=1)
    got = {(r.time_idx, r.row_idx, r.col_idx):
           np.frombuffer(r.chunk, np.uint8).reshape(4, CHH, CHW)
           for r in basin_labels(d8, mgrid, iters=6, band=0).collect()}
    golden = basins_oracle_np(focal_oracle_np(canvas, "d8", 1)[0],
                              iters=6)
    assert len(got) == NR * NC
    for (t, ri, ci), arr in got.items():
        exp = golden[:, ri * CHH:(ri + 1) * CHH, ci * CHW:(ci + 1) * CHW]
        np.testing.assert_array_equal(arr, exp)


def test_basin_labels_ramp_semantics(spark, mgrid):
    from aef_mosaic_spark.operators.focal import basin_labels
    # synthetic D8 grid: everything flows EAST (code 1); sinks in the
    # last column (code 0). After enough iters every cell carries the
    # label of its row's LAST cell; off-raster never happens.
    W = CHW * NC
    rows = []
    for ri in range(NR):
        for ci in range(NC):
            d8 = np.full((NB, CHH, CHW), 1, np.uint8)
            if ci == NC - 1:
                d8[:, :, -1] = 0
            rows.append({"time_idx": 0, "row_idx": ri, "col_idx": ci,
                         "chunk": d8.tobytes()})
    sdf = spark.createDataFrame(pd.DataFrame(rows))
    got = {(r.row_idx, r.col_idx):
           np.frombuffer(r.chunk, np.uint8).reshape(4, CHH, CHW)
           for r in basin_labels(sdf, mgrid, iters=W, band=0).collect()}
    for (ri, ci), arr in got.items():
        lab = ((arr[0].astype(np.uint32) << 24)
               | (arr[1].astype(np.uint32) << 16)
               | (arr[2].astype(np.uint32) << 8)
               | arr[3].astype(np.uint32))
        for rr in range(CHH):
            grow = ri * CHH + rr
            exp = grow * W + (W - 1) + 1   # the row's sink id
            assert (lab[rr] == exp).all()


def test_mask_confusion_golden(spark, mgrid):
    from aef_mosaic_spark.operators.focal import mask_confusion
    rng = np.random.RandomState(9)
    rows_a, rows_b = [], []
    gold = {}
    for ri in range(NR):
        for ci in range(NC):
            ma = rng.rand(CHH, CHW) < 0.3
            mb = rng.rand(CHH, CHW) < 0.3
            for rows, m in ((rows_a, ma), (rows_b, mb)):
                arr = np.zeros((NB, CHH, CHW), np.uint8)
                arr[0] = m.astype(np.uint8) * 255
                rows.append({"time_idx": 0, "row_idx": ri,
                             "col_idx": ci, "chunk": arr.tobytes()})
            gold[(ri, ci)] = (int((ma & mb).sum()), int((ma & ~mb).sum()),
                              int((~ma & mb).sum()), int((~ma & ~mb).sum()))
    got = {(r.row_idx, r.col_idx): r for r in mask_confusion(
        spark.createDataFrame(pd.DataFrame(rows_a)),
        spark.createDataFrame(pd.DataFrame(rows_b)), mgrid).collect()}
    assert len(got) == NR * NC
    for k, (tp, fp, fn, tn) in gold.items():
        r = got[k]
        assert (r.tp, r.fp, r.fn, r.tn) == (tp, fp, fn, tn)
        assert tp + fp + fn + tn == CHH * CHW
        exp = np.floor(tp / (tp + fp + fn) * 1e6 + 0.5) / 1e6
        assert r.iou_q == pytest.approx(exp, abs=1e-9)


# ------------------------------------------------------------------ #
# burstiness / entropy / gini                                          #
# ------------------------------------------------------------------ #

def test_burstiness_periodic_vs_bursty(spark):
    from aef_mosaic_spark.functions.features import burstiness
    rows, eid = [], 0
    t0 = 1_700_000_000
    # user 1: perfectly periodic (B = -1); user 2: bursty clusters
    for i in range(30):
        rows.append((eid, 1, pd.Timestamp(t0 + i * 60, unit="s"), 0.0))
        eid += 1
    t = t0
    for burst in range(6):
        for j in range(5):
            rows.append((eid, 2, pd.Timestamp(t, unit="s"), 0.0))
            eid += 1
            t += 1
        t += 3600
    df = spark.createDataFrame(pd.DataFrame(
        rows, columns=["event_id", "user_id", "ts", "value"]))
    got = {r["user_id"]: r for r in burstiness(df).collect()}
    assert got[1]["burstiness_q"] == -1.0      # zero variance
    # 5-in-a-row bursts an hour apart read ~0.37 (sigma ~ 2.2x mu)
    assert got[2]["burstiness_q"] > 0.3
    # golden law check for user 2
    gaps = np.array([1] * 4 + ([3601] + [1] * 4) * 5, dtype=np.int64)
    n, s, ss = len(gaps), int(gaps.sum()), int((gaps ** 2).sum())
    d = n * ss - s * s
    exp = np.floor((np.sqrt(d) - s) / (np.sqrt(d) + s) * 1e6 + 0.5) / 1e6
    assert got[2]["burstiness_q"] == pytest.approx(exp, abs=1e-9)
    assert (got[2]["n_gaps"], got[2]["s"], got[2]["ss"]) == (n, s, ss)


def test_behavioral_entropy_bounds(spark):
    from aef_mosaic_spark.functions.features import behavioral_entropy
    rows = []
    for i in range(40):
        rows.append((1, "click"))                    # monoculture
        rows.append((2, ["a", "b", "c", "d"][i % 4]))  # uniform over 4
    df = spark.createDataFrame(pd.DataFrame(rows,
                                            columns=["user_id",
                                                     "event_type"]))
    got = {r["user_id"]: r for r in behavioral_entropy(df).collect()}
    assert got[1]["entropy_u"] == 0
    # uniform over 4 -> ln 4 = 1.386294 micro-nats, integer law:
    n, n_t = 40, 10
    lnq = lambda x: int(np.floor(np.log(x) * 1e6 + 0.5))
    exp = lnq(n) - (4 * n_t * lnq(n_t)) // n
    assert got[2]["entropy_u"] == exp
    assert abs(got[2]["entropy_u"] - 1_386_294) < 5


def test_spend_gini_extremes(spark):
    from aef_mosaic_spark.functions.features import spend_gini
    rows = []
    # group 0: equal spenders -> G ~ 0; group 1: one whale -> G -> 1
    for c in range(10):
        rows.append((0, c, 100.0))
        rows.append((1, 100 + c, 10000.0 if c == 9 else 1.0))
    df = spark.createDataFrame(pd.DataFrame(
        rows, columns=["c_nationkey", "o_custkey", "o_totalprice"]))
    got = {r["c_nationkey"]: r for r in spend_gini(df).collect()}
    assert got[0]["gini_q"] == pytest.approx(0.0, abs=1e-9)
    assert got[1]["gini_q"] > 0.85
    # golden integer law for group 1
    xs = sorted([1] * 9 + [10000])
    n, sx = 10, sum(xs)
    six = sum((i + 1) * x for i, x in enumerate(xs))
    exp = np.floor((2 * six - (n + 1) * sx) / (n * sx) * 1e6 + 0.5) / 1e6
    assert got[1]["gini_q"] == pytest.approx(exp, abs=1e-9)


def test_texture_stats_golden_and_discrimination(spark, mgrid):
    from aef_mosaic_spark.operators.focal import texture_stats
    rng = np.random.RandomState(21)
    rows = []
    acc = {}
    for ri in range(NR):
        for ci in range(NC):
            smooth = np.tile(np.arange(CHW, dtype=np.uint8), (CHH, 1))
            noisy = rng.randint(0, 256, (CHH, CHW)).astype(np.uint8)
            arr = np.stack([smooth, noisy])
            rows.append({"time_idx": 0, "row_idx": ri, "col_idx": ci,
                         "chunk": arr.tobytes()})
            for b in range(NB):
                d2 = np.diff(arr[b].astype(np.int64), axis=1) ** 2
                c, h, n = acc.get(b, (0, 0, 0))
                acc[b] = (c + int(d2.sum()),
                          h + int((1_000_000 // (1 + d2)).sum()),
                          n + d2.size)
    got = {r["band"]: r for r in texture_stats(
        spark.createDataFrame(pd.DataFrame(rows)), mgrid).collect()}
    for b in range(NB):
        c, h, n = acc[b]
        assert (got[b]["contrast_sum"], got[b]["homog_u"],
                got[b]["n_pairs"]) == (c, h, n)
        exp_q = np.floor(c / n * 1e6 + 0.5) / 1e6
        assert got[b]["contrast_q"] == pytest.approx(exp_q, abs=1e-9)
    # the smooth gradient band reads ~1; the noise band reads ~10^4
    assert got[1]["contrast_q"] > 1000 * got[0]["contrast_q"]
    assert got[0]["homog_u"] > got[1]["homog_u"]


def test_raster_correlation_golden_and_extremes(spark, mgrid):
    from aef_mosaic_spark.operators.focal import raster_correlation
    rng = np.random.RandomState(33)
    rows_a, rows_b = [], []
    cases = {}
    for ri in range(NR):
        for ci in range(NC):
            base = rng.randint(0, 200, (CHH, CHW)).astype(np.uint8)
            if (ri, ci) == (0, 0):        # perfect linear relation
                other = (base // 2 + 30).astype(np.uint8)
            elif (ri, ci) == (0, 1):      # inverted -> r ~ -1
                other = (200 - base).astype(np.uint8)
            elif (ri, ci) == (0, 2):      # constant -> NULL
                other = np.full((CHH, CHW), 7, np.uint8)
            else:                          # independent noise
                other = rng.randint(0, 200, (CHH, CHW)).astype(np.uint8)
            cases[(ri, ci)] = (base, other)
            for rows, m in ((rows_a, base), (rows_b, other)):
                arr = np.zeros((NB, CHH, CHW), np.uint8)
                arr[0] = m
                rows.append({"time_idx": 0, "row_idx": ri,
                             "col_idx": ci, "chunk": arr.tobytes()})
    got = {(r.row_idx, r.col_idx): r for r in raster_correlation(
        spark.createDataFrame(pd.DataFrame(rows_a)),
        spark.createDataFrame(pd.DataFrame(rows_b)), mgrid).collect()}
    for k, (pa, pb) in cases.items():
        a, b = pa.astype(np.int64), pb.astype(np.int64)
        n = a.size
        va = n * (a * a).sum() - a.sum() ** 2
        vb = n * (b * b).sum() - b.sum() ** 2
        if va <= 0 or vb <= 0:
            assert got[k]["corr_q"] is None
            continue
        exp = np.floor((n * (a * b).sum() - a.sum() * b.sum())
                       / (np.sqrt(va) * np.sqrt(vb)) * 1e6 + 0.5) / 1e6
        assert got[k]["corr_q"] == pytest.approx(exp, abs=1e-9), k
    assert got[(0, 0)]["corr_q"] > 0.98
    assert got[(0, 1)]["corr_q"] < -0.99
    assert got[(0, 2)]["corr_q"] is None
    assert abs(got[(1, 1)]["corr_q"]) < 0.1


def test_orientation_histogram_planted_gradients(spark, mgrid):
    from aef_mosaic_spark.operators.focal import orientation_histogram
    rows = []
    for ri in range(NR):
        for ci in range(NC):
            arr = np.zeros((NB, CHH, CHW), np.uint8)
            if ci == 0:
                # brightness increases left->right: gx > 0, gy = 0
                arr[0] = np.tile(np.arange(CHW, dtype=np.uint8) * 3,
                                 (CHH, 1))
            elif ci == 1:
                # increases top->bottom: raster gy_down > 0 -> y-up
                # gradient points SOUTH (octant 6)
                arr[0] = np.tile((np.arange(CHH, dtype=np.uint8)
                                  * 3)[:, None], (1, CHW))
            else:
                arr[0] = ((np.mgrid[0:CHH, 0:CHW][0] * 3
                           + np.mgrid[0:CHH, 0:CHW][1] * 3) % 251
                          ).astype(np.uint8)
            rows.append({"time_idx": 0, "row_idx": ri, "col_idx": ci,
                         "chunk": arr.tobytes()})
    got = {(r.row_idx, r.col_idx): r for r in orientation_histogram(
        spark.createDataFrame(pd.DataFrame(rows)), mgrid).collect()}
    for ri in range(NR):
        # interior of col-0 chunks: pure east gradient -> octant 0
        r0 = got[(ri, 0)]
        assert r0["dominant"] == 0 and r0["b0"] > r0["n_edges"] * 0.5
        # col-1: brightness grows downward -> y-up gradient SOUTH
        r1 = got[(ri, 1)]
        assert r1["dominant"] == 6 and r1["b6"] > r1["n_edges"] * 0.5
        # col-2: diagonal wave -> dominated by a diagonal octant
        r2 = got[(ri, 2)]
        assert r2["dominant"] in (5, 6, 7)
        assert sum(r2[f"b{k}"] for k in range(8)) == r2["n_edges"]


def test_threshold_episodes_islands(spark):
    from aef_mosaic_spark.operators.sessions import threshold_episodes
    # pattern: 3 above, 2 below, 1 above, 4 below, 2 above
    vals = [500, 600, 550, 10, 20, 700, 5, 5, 5, 5, 450, 480]
    got = sorted(
        (r["ep_start_es"], r["n_events"], r["dur_s"], r["vmax_c"])
        for r in threshold_episodes(
            _series_df(spark, {1: [float(v) for v in vals]}),
            vcents=40000).collect())
    t0 = 1_700_000_000
    assert got == [
        (t0 + 0 * 60, 3, 120, 60000),
        (t0 + 5 * 60, 1, 0, 70000),
        (t0 + 10 * 60, 2, 60, 48000),
    ]


def test_spend_hhi_extremes(spark):
    from aef_mosaic_spark.functions.features import spend_hhi
    rows = []
    for c in range(10):
        rows.append((0, c, 100.0))                        # equal
        rows.append((1, 100 + c, 9100.0 if c == 0 else 100.0))
    df = spark.createDataFrame(pd.DataFrame(
        rows, columns=["c_nationkey", "o_custkey", "o_totalprice"]))
    got = {r["c_nationkey"]: r for r in spend_hhi(df).collect()}
    assert got[0]["hhi_q"] == pytest.approx(0.1, abs=1e-9)   # 1/n
    xs = [9100] + [100] * 9
    exp = np.floor(sum(x * x for x in xs) / sum(xs) ** 2 * 1e6
                   + 0.5) / 1e6
    assert got[1]["hhi_q"] == pytest.approx(exp, abs=1e-9)
    assert got[1]["hhi_q"] > 0.8


def test_embedding_audit_flags_bad_vectors(spark):
    from aef_mosaic_spark.functions.vectors import embedding_audit
    rows = [
        ("a", [3.0, 4.0] + [0.0] * 62),       # norm 5
        ("a", [0.0001] * 64),                  # collapsed -> subunit
        ("a", [1.0, 0.0, 0.0]),                # wrong dim
        ("b", [2.0] + [0.0] * 63),             # norm 2
    ]
    df = spark.createDataFrame(pd.DataFrame(rows,
                                            columns=["label",
                                                     "embedding"]))
    got = {r["label"]: r for r in embedding_audit(df).collect()}
    assert got["a"]["n_vecs"] == 3
    assert got["a"]["n_bad_dim"] == 1
    # only the collapsed vector: the wrong-dim one has norm exactly 1
    # (nu == 1e6, not < 1e6)
    assert got["a"]["n_subunit"] == 1
    assert got["b"]["sum_norm_u"] == 2_000_000
    assert got["b"]["avg_norm_u"] == 2_000_000


def test_daily_completeness_detects_gaps(spark):
    from aef_mosaic_spark.operators.anomaly import daily_completeness
    t0 = 1_700_000_000
    day = t0 // 86400
    # events on days d, d+1, d+4 (2-day hole)
    rows = []
    eid = 0
    for off, n in ((0, 3), (1, 2), (4, 5)):
        for j in range(n):
            rows.append((eid, 1, pd.Timestamp((day + off) * 86400
                                              + j * 100, unit="s"),
                         1.0))
            eid += 1
    df = spark.createDataFrame(pd.DataFrame(
        rows, columns=["event_id", "user_id", "ts", "value"]))
    got = sorted((r["day_idx"], r["n_events"], r["gap_before"])
                 for r in daily_completeness(df).collect())
    assert got == [(day, 3, 0), (day + 1, 2, 1), (day + 4, 5, 3)]


def test_threshold_episodes_nondefault_columns(spark):
    """ADVICE r5 #1: the change flag must come from the parameterized
    window — non-default column names used to raise (or silently key
    on a stray user_id column)."""
    from aef_mosaic_spark.operators.sessions import threshold_episodes
    import pandas as pd

    t0 = 1_700_000_000
    vals = [500, 600, 10, 700]
    rows = [{"uid": 7, "eid": i, "when": pd.Timestamp(t0 + i * 60, unit="s"),
             "metric": float(v)} for i, v in enumerate(vals)]
    df = spark.createDataFrame(pd.DataFrame(rows))
    got = sorted((r["ep_start_es"], r["n_events"], r["vmax_c"])
                 for r in threshold_episodes(
                     df, vcents=40000, user_col="uid", ts_col="when",
                     id_col="eid", value_col="metric").collect())
    assert got == [(t0, 2, 60000), (t0 + 3 * 60, 1, 70000)]
