"""Tests for the session-4 operators: gap sessionization, web-mercator
tile keys, JS corpus drift, bi-temporal change detection."""

import datetime
import math

import numpy as np
import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------- sessions

def _ev(spark, rows):
    return spark.createDataFrame(
        [(i, datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=s),
          u, t, v) for i, (s, u, t, v) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double")


def test_sessionize_gap_boundaries(spark):
    from aef_mosaic_spark.operators.sessions import sessionize
    # user 1: events at 0, 100, 2000 (gap 1900 > 1800 -> new session),
    # 2100; user 2: single event
    df = _ev(spark, [(0, 1, "a", 1.0), (100, 1, "b", 1.0),
                     (2000, 1, "a", 1.0), (2100, 1, "c", 1.0),
                     (50, 2, "a", 1.0)])
    got = {(r.user_id, r.event_id): r.session_idx
           for r in sessionize(df).collect()}
    assert got == {(1, 0): 0, (1, 1): 0, (1, 2): 1, (1, 3): 1, (2, 4): 0}


def test_sessionize_exact_gap_is_same_session(spark):
    from aef_mosaic_spark.operators.sessions import sessionize
    df = _ev(spark, [(0, 1, "a", 1.0), (1800, 1, "a", 1.0),
                     (3601, 1, "a", 1.0)])
    got = sorted(r.session_idx for r in sessionize(df).collect())
    assert got == [0, 0, 1]  # gap == 1800 keeps, 1801 splits


def test_session_stats_values(spark):
    from aef_mosaic_spark.operators.sessions import session_stats
    df = _ev(spark, [(0, 1, "a", 1.25), (100, 1, "b", 0.5),
                     (5000, 1, "a", 2.0)])
    rows = {(r.user_id, r.session_idx): r
            for r in session_stats(df).collect()}
    s0 = rows[(1, 0)]
    assert (s0.n_events, s0.n_types, s0.duration_sec) == (2, 2, 100)
    assert s0.value_micro == 1_750_000
    s1 = rows[(1, 1)]
    assert (s1.n_events, s1.duration_sec, s1.value_micro) == \
        (1, 0, 2_000_000)


def test_session_window_partitions_by_user(spark):
    # the at-scale contract: ONE exchange on user_id, no global window
    from aef_mosaic_spark.operators.sessions import session_stats
    plan = session_stats(_ev(spark, [(0, 1, "a", 1.0)]))._jdf \
        .queryExecution().executedPlan().toString()
    # the window exchange must hash on user_id (a global window would
    # show SinglePartition), and there must be exactly one exchange
    # shape: hashpartitioning(user_id ...)
    assert "hashpartitioning(user_id" in plan
    assert "SinglePartition" not in plan


def test_sessionize_reconciles_with_native_session_window(spark):
    """Batch sessionize == Spark's native F.session_window aggregation
    on the same (second-floored) events — same session count and the
    same per-session event counts. The tie law also agrees: both keep
    an event exactly gap seconds after its predecessor in the same
    session (session_window merges on next.start <= prev.end — pinned
    by the synthetic case below)."""
    from aef_mosaic_spark.operators.sessions import session_stats
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    b = sorted((r.user_id, r.n_events)
               for r in session_stats(ev).collect())
    fl = ev.withColumn("tsf", F.timestamp_seconds(F.unix_timestamp("ts")))
    nw = (fl.groupBy(F.session_window("tsf", "30 minutes").alias("w"),
                     "user_id")
            .agg(F.count(F.lit(1)).alias("n_events")))
    n = sorted((r.user_id, r.n_events) for r in nw.collect())
    assert b == n and len(b) > 100


def test_sessionize_exact_gap_tie_semantics_vs_native(spark):
    # pin the tie law: BOTH keep an exactly-gap-later event in the
    # same session (native merges inclusively); one second more splits
    from aef_mosaic_spark.operators.sessions import session_stats
    df = _ev(spark, [(0, 1, "a", 1.0), (1800, 1, "a", 1.0)])
    ours = session_stats(df).collect()
    assert len(ours) == 1 and ours[0].n_events == 2
    nat = (df.groupBy(F.session_window("ts", "30 minutes"), "user_id")
             .agg(F.count(F.lit(1)).alias("n")).collect())
    assert sorted(r.n for r in nat) == [2]
    df2 = _ev(spark, [(0, 1, "a", 1.0), (1801, 1, "a", 1.0)])
    assert len(session_stats(df2).collect()) == 2
    nat2 = (df2.groupBy(F.session_window("ts", "30 minutes"), "user_id")
               .agg(F.count(F.lit(1)).alias("n")).collect())
    assert sorted(r.n for r in nat2) == [1, 1]


# ------------------------------------------------------------------- tiles

def _golden_tile(lon, lat, zoom):
    """Pure-python twin of the quantized tile law."""
    n = 1 << zoom
    ilon = math.floor(lon * 1e6 + 0.5)
    ilat = max(min(math.floor(lat * 1e6 + 0.5), 85_051_128), -85_051_128)
    tx = min((ilon + 180_000_000) * n // 360_000_000, n - 1)
    latr = (ilat / 1e6) * math.pi / 180.0
    yfrac = (1.0 - math.log(math.tan(math.pi / 4 + latr / 2))
             / math.pi) / 2.0
    yq = math.floor(yfrac * 1e7 + 0.5)
    ty = min(yq * n // 10_000_000, n - 1)
    return tx, ty


def _golden_morton(tx, ty, zoom):
    m = 0
    for i in range(zoom):
        m |= ((tx >> i) & 1) << (2 * i)
        m |= ((ty >> i) & 1) << (2 * i + 1)
    return m


@pytest.mark.parametrize("zoom", [3, 12])
def test_tile_keys_match_golden(spark, zoom):
    from aef_mosaic_spark.functions.tiles import with_tile_keys
    pts = [(-179.95, -84.9), (-0.05, 0.0), (0.0, 51.5), (139.7, 35.7),
           (179.95, 84.9), (180.0, 90.0), (-180.0, -90.0),
           (12.4924, 41.8902), (0.1, -0.1)]
    df = spark.createDataFrame(
        [(i, lo, la) for i, (lo, la) in enumerate(pts)],
        "pid long, lon double, lat double")
    got = {r.pid: (r.tile_x, r.tile_y, r.morton)
           for r in with_tile_keys(df, zoom=zoom).collect()}
    for i, (lo, la) in enumerate(pts):
        tx, ty = _golden_tile(lo, la, zoom)
        assert got[i] == (tx, ty, _golden_morton(tx, ty, zoom)), (i, lo, la)


def test_tile_keys_textbook_agreement_away_from_boundaries(spark):
    # away from tile edges the quantized law equals the textbook
    # slippy formula (floor on raw doubles)
    from aef_mosaic_spark.functions.tiles import with_tile_keys
    zoom = 10
    n = 1 << zoom
    rng = np.random.RandomState(42)
    pts = [(float(lo), float(la))
           for lo, la in zip(rng.uniform(-179, 179, 200),
                             rng.uniform(-80, 80, 200))]
    df = spark.createDataFrame(
        [(i, lo, la) for i, (lo, la) in enumerate(pts)],
        "pid long, lon double, lat double")
    got = {r.pid: (r.tile_x, r.tile_y)
           for r in with_tile_keys(df, zoom=zoom).collect()}
    for i, (lo, la) in enumerate(pts):
        tx = math.floor((lo + 180.0) / 360.0 * n)
        latr = math.radians(la)
        ty = math.floor(
            (1.0 - math.log(math.tan(math.pi / 4 + latr / 2)) / math.pi)
            / 2.0 * n)
        # quantization can move a point across an edge only within
        # 1e-6 deg; random points are never that close
        assert got[i] == (tx, ty), (i, lo, la)


def test_tile_keys_zero_exchange(spark):
    from aef_mosaic_spark.functions.tiles import with_tile_keys
    df = spark.range(100).selectExpr(
        "id", "(id % 360) - 179.5e0 AS lon", "(id % 160) - 79.5e0 AS lat")
    plan = with_tile_keys(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan


def test_session_funnel_order_law(spark):
    """Step k counts only at-or-after step k-1: a purchase BEFORE the
    click does not convert; one that follows does."""
    from aef_mosaic_spark.operators.sessions import session_funnel
    rows = [
        # user 1: view -> click -> purchase (full conversion)
        (0, 1, "view", 1.0), (10, 1, "click", 1.0),
        (20, 1, "purchase", 1.0),
        # user 2: purchase arrives BEFORE the click -> stops at click
        (0, 2, "view", 1.0), (5, 2, "purchase", 1.0),
        (10, 2, "click", 1.0),
        # user 3: click with no prior view -> reaches nothing
        (0, 3, "click", 1.0), (5, 3, "purchase", 1.0),
    ]
    out = session_funnel(_ev(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.n_sessions, r.reached_1, r.reached_2, r.reached_3) == \
        (3, 2, 2, 1)
    # conv = 1/3 half-up in micro units
    assert r.conv_micro == (1 * 2_000_000 + 3) // 6


def test_session_funnel_same_second_counts(spark):
    from aef_mosaic_spark.operators.sessions import session_funnel
    rows = [(0, 1, "view", 1.0), (0, 1, "click", 1.0),
            (0, 1, "purchase", 1.0)]
    r = session_funnel(_ev(spark, rows)).collect()[0]
    assert (r.reached_1, r.reached_2, r.reached_3) == (1, 1, 1)


def test_tile_heatmap_pyramid_conserves_mass(spark):
    from aef_mosaic_spark.functions.tiles import tile_heatmap_pyramid
    df = spark.range(5000).selectExpr(
        "id AS point_id",
        "(id * 7) % 3600 / 10e0 - 179.9e0 AS lon",
        "(id * 13) % 1690 / 10e0 - 84.5e0 AS lat")
    out = tile_heatmap_pyramid(df).collect()
    by_zoom = {}
    for r in out:
        by_zoom.setdefault(r.zoom, []).append(r)
    assert set(by_zoom) == {12, 10, 8}
    tot = 5000 * 4999 // 2
    for z, rows in by_zoom.items():
        assert sum(r.n_points for r in rows) == 5000, z
        assert sum(r.id_sum for r in rows) == tot, z
    # every level-10 tile is the shifted parent of its level-12 kids
    kids = {(r.tx >> 2, r.ty >> 2) for r in by_zoom[12]}
    assert {(r.tx, r.ty) for r in by_zoom[10]} == kids


# ------------------------------------------------------------------- drift

def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, "
                                       "text string")


def test_drift_identical_sources_near_zero(spark):
    from aef_mosaic_spark.functions.drift import source_js_drift
    rows = [(i, f"s{i % 2}", "alpha beta gamma delta") for i in range(40)]
    out = {r.source: r.jsd_micro
           for r in source_js_drift(_docs(spark, rows)).collect()}
    assert all(v == 0 for v in out.values()), out


def test_drift_disjoint_sources_near_ln2(spark):
    from aef_mosaic_spark.functions.drift import source_js_drift
    rows = [(i, "s0", "aa bb cc dd") for i in range(20)] + \
           [(100 + i, "s1", "xx yy zz ww") for i in range(20)]
    out = {r.source: r.jsd_micro
           for r in source_js_drift(_docs(spark, rows)).collect()}
    ln2_micro = 693_147
    for v in out.values():
        assert abs(v - ln2_micro) <= 5, out


def test_drift_shifted_source_ranks_highest(spark):
    from aef_mosaic_spark.functions.drift import source_js_drift
    rows = ([(i, "s0", "common words shared tokens") for i in range(30)]
            + [(50 + i, "s1", "common words shared tokens")
               for i in range(30)]
            + [(90 + i, "s2", "common words weird jargon")
               for i in range(30)])
    out = {r.source: r.jsd_micro
           for r in source_js_drift(_docs(spark, rows)).collect()}
    assert out["s2"] > out["s0"] and out["s2"] > out["s1"]
    assert out["s0"] == out["s1"]


def test_ring_metrics_known_rectangle(spark):
    from aef_mosaic_spark.functions.geo import ring_metrics_exprs
    e = ring_metrics_exprs("ring", 4, "spark")
    row = spark.sql(
        "SELECT array(0d,0d, 4d,0d, 4d,3d, 0d,3d) AS ring").selectExpr(
        f"{e['area']} AS a", f"{e['perimeter']} AS p",
        f"{e['centroid_x']} AS cx", f"{e['centroid_y']} AS cy"
    ).collect()[0]
    assert (row.a, row.p, row.cx, row.cy) == (12.0, 14.0, 2.0, 1.5)


def test_ring_metrics_diamond_area_law(spark):
    # the _quads diamond (left, bottom, right, top) has area 2*wx*wy
    import __spark_entry__ as entry
    quads = entry._quads(spark, "/root/testdata/sf0.001").limit(50)
    from aef_mosaic_spark.functions.geo import ring_metrics_exprs
    e = ring_metrics_exprs("ring", 4, "spark")
    rows = quads.selectExpr(
        "quad_id", f"{e['area']} AS a",
        "(max_lon - min_lon) * (max_lat - min_lat) / 2 AS expect"
    ).collect()
    assert len(rows) == 50
    for r in rows:
        assert abs(r.a - r.expect) < 1e-9, r


def test_source_overlap_identical_and_disjoint(spark):
    from aef_mosaic_spark.functions.drift import source_overlap_matrix
    rows = ([(i, "sA", "alpha beta gamma delta") for i in range(5)]
            + [(10 + i, "sB", "alpha beta gamma delta")
               for i in range(5)]
            + [(20 + i, "sC", "xx yy zz ww") for i in range(5)])
    out = {(r.source_a, r.source_b): r.jaccard_micro
           for r in source_overlap_matrix(_docs(spark, rows)).collect()}
    assert out[("sA", "sB")] == 1_000_000      # identical vocab: exact
    assert out[("sA", "sC")] == 0 and out[("sB", "sC")] == 0


def test_source_overlap_half_shared_estimate(spark):
    from aef_mosaic_spark.functions.drift import source_overlap_matrix
    shared = " ".join(f"s{i}" for i in range(40))
    a_only = " ".join(f"a{i}" for i in range(40))
    b_only = " ".join(f"b{i}" for i in range(40))
    rows = [(1, "sA", shared + " " + a_only),
            (2, "sB", shared + " " + b_only)]
    r = source_overlap_matrix(_docs(spark, rows)).collect()[0]
    # true J = 40/120 = 1/3; 64-perm std ~ 0.059 -> assert 3 sigma
    assert abs(r.jaccard_micro / 1e6 - 1 / 3) < 0.18, r


def test_image_stats_matches_float_reference(spark):
    """The exact-integer brightness/contrast/entropy land within one
    quantum of the straightforward float statistics, per image."""
    import math

    from aef_mosaic_spark import codecs, generator
    from aef_mosaic_spark.functions.multimodal import image_stats

    images = generator.images_df(spark, 24)
    got = {r.image_id: r for r in image_stats(images).collect()}
    pdf = generator.images_pdf(24)
    assert len(got) == 24
    for t in pdf.itertuples(index=False):
        img = codecs.decode(bytes(t.bytes), t.fmt, t.w, t.h)
        flat = img.astype(np.float64).ravel()
        r = got[t.image_id]
        assert r.n_px == flat.size
        assert abs(r.brightness_milli / 1000 - flat.mean()) < 0.001
        assert abs(r.contrast_milli / 1000 - flat.std()) < 0.002
        p = np.bincount(img.ravel(), minlength=256) / flat.size
        h = float(-(p[p > 0] * np.log(p[p > 0])).sum())
        assert abs(r.entropy_micro / 1e6 - h) < 1e-4
        assert r.p_min == int(flat.min()) and r.p_max == int(flat.max())


def test_image_stats_uniform_image_zero_entropy(spark):
    from aef_mosaic_spark.functions.multimodal import image_stats
    df = spark.createDataFrame(
        [("u1", bytes([77]) * (3 * 8 * 8), 8, 8, "raw", "c")],
        "image_id string, bytes binary, w int, h int, fmt string, "
        "caption string")
    r = image_stats(df).collect()[0]
    assert (r.entropy_micro, r.contrast_milli, r.brightness_milli) == \
        (0, 0, 77000)
    assert r.p_min == 77 and r.p_max == 77


# ----------------------------------------------------------- change detect

def test_temporal_change_numpy_parity(spark):
    from aef_mosaic_spark import generator
    from aef_mosaic_spark.operators import mosaic as M
    from aef_mosaic_spark.operators.mosaic import temporal_change
    # reuse the flagship fixture recipe from __spark_entry__
    import __spark_entry__ as entry
    grid = entry._flagship_grid()
    images = generator.images_df(spark, 80)
    chunks = M.mosaic(images, grid, mode="mean").persist()
    got = {(r.row_idx, r.col_idx): r for r in
           temporal_change(chunks, grid, 0, 1, threshold=4,
                           chunk_col="chunk").collect()}
    # golden: recompute from the composed chunks in pure numpy
    nb, chh, chw = grid.num_bands, grid.chunk_h, grid.chunk_w
    by_time = {}
    for r in chunks.collect():
        by_time[(r.time_idx, r.row_idx, r.col_idx)] = \
            np.frombuffer(r.chunk, np.uint8).reshape(nb, chh, chw)
    keys = {(ri, ci) for (t, ri, ci) in by_time}
    n_checked = 0
    for (ri, ci) in keys:
        a = by_time.get((0, ri, ci))
        b = by_time.get((1, ri, ci))
        if a is None or b is None:
            assert (ri, ci) not in got
            continue
        va = (a.astype(np.int64) > 0) & (b.astype(np.int64) > 0)
        d = np.abs(a.astype(np.int64) - b.astype(np.int64)) * va
        n = int(va.sum())
        row = got[(ri, ci)]
        assert row.valid_px == n
        assert row.changed_px == int(((d > 4) & va).sum())
        assert row.mad_milli == ((2000 * int(d.sum()) + n) // (2 * n)
                                 if n else 0)
        assert row.mask_bytes == ((d > 4) & va).astype("<u1").tobytes()
        n_checked += 1
    chunks.unpersist()
    assert n_checked >= 4


def test_temporal_change_threshold_monotone(spark):
    from aef_mosaic_spark import generator
    from aef_mosaic_spark.operators import mosaic as M
    from aef_mosaic_spark.operators.mosaic import temporal_change
    import __spark_entry__ as entry
    grid = entry._flagship_grid()
    images = generator.images_df(spark, 80)
    chunks = M.mosaic(images, grid, mode="mean").persist()
    lo = {(r.row_idx, r.col_idx): r.changed_px for r in
          temporal_change(chunks, grid, 0, 1, threshold=2,
                          chunk_col="chunk").collect()}
    hi = {(r.row_idx, r.col_idx): r.changed_px for r in
          temporal_change(chunks, grid, 0, 1, threshold=8,
                          chunk_col="chunk").collect()}
    chunks.unpersist()
    assert set(lo) == set(hi)
    assert all(lo[k] >= hi[k] for k in lo)


def test_zipf_slope_exact_law(spark):
    """Hand corpus: frequencies 8/4/2/1 over 4 words -> exact
    bit-length points and OLS slope from the integer law."""
    from aef_mosaic_spark.functions.drift import zipf_slope
    text = " ".join(["a"] * 8 + ["b"] * 4 + ["c"] * 2 + ["d"])
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    r = zipf_slope(docs).collect()[0]
    assert r.n_vocab == 4 and r.n_tokens == 15
    # points (x=bitlen(rank)-1, y=bitlen(f)-1):
    #   rank1/f8 -> (0,3); rank2/f4 -> (1,2); rank3/f2 -> (1,1);
    #   rank4/f1 -> (2,0)
    xs, ys = [0, 1, 1, 2], [3, 2, 1, 0]
    n = 4
    sx, sy = sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sxx = sum(a * a for a in xs)
    num, den = 100 * (n * sxy - sx * sy), n * sxx - sx * sx
    exp_slope = int(num / den) if num * den > 0 else -(abs(num) // den)
    # Spark div truncates toward zero
    exp_slope = num // den if num % den == 0 else (
        -((-num) // den) if num < 0 else num // den)
    assert r.slope_centi == exp_slope
    assert r.slope_centi < 0                     # decreasing, Zipf-like


def test_geohash_matches_reference(spark):
    """with_geohash vs the textbook bisection algorithm on classic
    published examples + hash-spread points (away from cell
    boundaries, where the microdegree quantizer is exact)."""
    from aef_mosaic_spark.functions.tiles import (GEOHASH_B32,
                                                  with_geohash)

    def ref_geohash(lat, lon, precision):
        lat_lo, lat_hi, lon_lo, lon_hi = -90.0, 90.0, -180.0, 180.0
        bits, out, even = 0, [], True
        ch = 0
        for _ in range(precision * 5):
            if even:
                mid = (lon_lo + lon_hi) / 2
                ch = ch * 2 + (1 if lon >= mid else 0)
                lon_lo, lon_hi = (mid, lon_hi) if lon >= mid else (lon_lo, mid)
            else:
                mid = (lat_lo + lat_hi) / 2
                ch = ch * 2 + (1 if lat >= mid else 0)
                lat_lo, lat_hi = (mid, lat_hi) if lat >= mid else (lat_lo, mid)
            even = not even
            bits += 1
            if bits == 5:
                out.append(GEOHASH_B32[ch])
                bits, ch = 0, 0
        return "".join(out)

    pts = [(1, -5.603, 42.605),               # classic ezs42 example
           (2, 10.40744, 57.64911),           # u4pruy...
           (3, 0.1, 0.1), (4, -179.9, -84.3), (5, 139.7004, 35.6581)]
    df = spark.createDataFrame(pts, "point_id long, lon double, lat double")
    got = {r.point_id: r.geohash for r in with_geohash(df).collect()}
    for pid, lon, lat in pts:
        assert got[pid] == ref_geohash(lat, lon, 6), (pid, got[pid])
    assert got[1].startswith("ezs42")
