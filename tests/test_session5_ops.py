"""Tests for the session-5 operators: interval overlap join, DBSCAN,
blocked entity resolution, rolling anomaly, triangles, IDW."""

import datetime
import itertools

import pytest
from pyspark.sql import functions as F


# ------------------------------------------------------------ intervals

def _iv(spark, rows):
    return spark.createDataFrame(
        rows, "key long, iid long, start long, end long")


def test_interval_join_basic_and_exactly_once(spark):
    from aef_mosaic_spark.operators.intervals import concurrent_intervals
    # long intervals spanning many buckets must still emit ONCE
    df = _iv(spark, [
        (1, 1, 0, 100),    # overlaps 2 and 3
        (1, 2, 50, 60),
        (1, 3, 100, 120),  # touches 1 at exactly 100 (closed)
        (1, 4, 200, 210),  # overlaps nothing
        (2, 5, 0, 100),    # other key: no cross-key pairs
    ])
    out = concurrent_intervals(df, bucket=8).collect()
    pairs = sorted((r.l_id, r.r_id, r.overlap_len) for r in out)
    assert pairs == [(1, 2, 11), (1, 3, 1)]
    assert len(pairs) == len(set((a, b) for a, b, _ in pairs))


def test_interval_join_matches_bruteforce(spark):
    from aef_mosaic_spark.operators.intervals import concurrent_intervals
    rows = [(k, i, (i * 37) % 500, (i * 37) % 500 + (i * 13) % 60)
            for i in range(120) for k in [i % 3]]
    df = _iv(spark, rows)
    got = sorted((r.l_id, r.r_id) for r in
                 concurrent_intervals(df, bucket=16).collect())
    want = sorted(
        (a[1], b[1]) for a, b in itertools.combinations(rows, 2)
        if a[0] == b[0] and a[1] < b[1]
        and a[2] <= b[3] and b[2] <= a[3])
    assert got == want


# -------------------------------------------------------------- dbscan

def _pts(spark, rows):
    return spark.createDataFrame(rows, "id long, xm long, ym long")


def test_dbscan_roles_and_labels(spark):
    from aef_mosaic_spark.operators.clustering import dbscan
    # cluster A: 5 mutually-close points (all within eps=10 of each
    # other) -> all core, label = min id = 0
    a = [(i, 100 + i, 100) for i in range(5)]
    # border: within eps of cores 102..104 but only 4 neighbors
    # (self included) < min_pts=5
    border = [(10, 112, 100)]
    # noise: isolated
    noise = [(20, 10000, 10000)]
    out = {r.id: (r.role, r.cluster_id)
           for r in dbscan(_pts(spark, a + border + noise),
                           eps=10, min_pts=5).collect()}
    for i in range(5):
        assert out[i] == ("core", 0)
    assert out[10] == ("border", 0)
    assert out[20] == ("noise", None)


def test_dbscan_cross_cell_neighbors(spark):
    from aef_mosaic_spark.operators.clustering import neighbor_pairs
    # points eps apart but straddling a cell boundary must pair
    df = _pts(spark, [(1, 79, 0), (2, 81, 0)])
    got = {(r.a, r.b) for r in neighbor_pairs(df, eps=80).collect()}
    assert (1, 2) in got and (2, 1) in got


def test_dbscan_two_separate_clusters(spark):
    from aef_mosaic_spark.operators.clustering import dbscan
    a = [(i, i, 0) for i in range(4)]
    b = [(10 + i, 1000 + i, 0) for i in range(4)]
    out = {r.id: r.cluster_id
           for r in dbscan(_pts(spark, a + b), eps=5, min_pts=3).collect()}
    assert {out[i] for i in range(4)} == {0}
    assert {out[10 + i] for i in range(4)} == {10}


# ------------------------------------------------------------- linkage

def test_linkage_planted_duplicates_full_recall(spark):
    from aef_mosaic_spark.operators.linkage import (
        blocked_pairs, dirty_records)
    cust = spark.range(60).selectExpr("id AS c_custkey")
    recs = dirty_records(cust)
    pairs = {(r.rec_a, r.rec_b)
             for r in blocked_pairs(recs).collect()}
    for c in range(0, 60, 3):
        assert (c * 10, c * 10 + 1) in pairs, c


def test_linkage_pair_emitted_once(spark):
    from aef_mosaic_spark.operators.linkage import blocked_pairs
    # identical strings share BOTH blocks -> must still appear once
    recs = spark.createDataFrame(
        [(1, "abcdef"), (2, "abcdef"), (3, "zzzzzz")],
        "rec_id long, name string")
    out = [(r.rec_a, r.rec_b, r.dist) for r in
           blocked_pairs(recs).collect()]
    assert out == [(1, 2, 0)]


def test_linkage_distance_gate(spark):
    from aef_mosaic_spark.operators.linkage import blocked_pairs
    recs = spark.createDataFrame(
        [(1, "abcdef"), (2, "abcxyf")],  # dist 2: kept
        "rec_id long, name string")
    assert blocked_pairs(recs, max_dist=2).count() == 1
    assert blocked_pairs(recs, max_dist=1).count() == 0


# ------------------------------------------------------------- anomaly

def _ev(spark, rows):
    return spark.createDataFrame(
        [(i, datetime.datetime(2024, 1, 1)
          + datetime.timedelta(seconds=10 * i), u, "t", v)
         for i, (u, v) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double")


def test_anomaly_flags_spike_after_warmup(spark):
    from aef_mosaic_spark.operators.anomaly import rolling_anomalies
    rows = [(1, 100.0 + (i % 2))    # stable: alternating 100/101
            for i in range(15)] + [(1, 500.0)]
    out = rolling_anomalies(_ev(spark, rows), win=20, min_n=10, k=3) \
        .collect()
    assert [r.event_id for r in out] == [15]
    assert out[0].vcents == 50000


def test_anomaly_min_n_gate(spark):
    from aef_mosaic_spark.operators.anomaly import rolling_anomalies
    # spike arrives with only 5 prior events -> not enough history
    rows = [(1, 100.0 + (i % 2)) for i in range(5)] + [(1, 500.0)]
    assert rolling_anomalies(_ev(spark, rows),
                             win=20, min_n=10).count() == 0


def test_anomaly_stable_series_clean(spark):
    from aef_mosaic_spark.operators.anomaly import rolling_anomalies
    rows = [(1, 100.0 + (i % 3)) for i in range(40)]
    assert rolling_anomalies(_ev(spark, rows)).count() == 0


# ----------------------------------------------------------- triangles

def test_triangles_k4(spark):
    from aef_mosaic_spark.operators.graph import triangle_counts
    edges = spark.createDataFrame(
        [(a, b) for a, b in itertools.combinations(range(4), 2)],
        "a long, b long")
    out = {r.node: r.n_tri for r in triangle_counts(edges).collect()}
    # K4 has 4 triangles; each node sits in 3 of them
    assert out == {0: 3, 1: 3, 2: 3, 3: 3}


def test_triangles_match_bruteforce_on_hub_graph(spark):
    from aef_mosaic_spark.operators.graph import triangle_counts
    # hub 0 connected to all; ring among 1..12 -> exercises the
    # degree orientation on a skewed graph
    e = [(0, i) for i in range(1, 13)] + \
        [(i, i + 1) for i in range(1, 12)] + [(1, 12)]
    es = {tuple(sorted(p)) for p in e}
    want = {}
    for a, b, c in itertools.combinations(range(13), 3):
        if {(a, b), (a, c), (b, c)} <= es:
            for n in (a, b, c):
                want[n] = want.get(n, 0) + 1
    edges = spark.createDataFrame(sorted(es), "a long, b long")
    got = {r.node: r.n_tri for r in triangle_counts(edges).collect()}
    assert got == want


# ----------------------------------------------------------------- idw

def test_idw_exact_hit_returns_value(spark):
    from aef_mosaic_spark.operators.interpolate import idw_grid
    pts = spark.createDataFrame([(1, 660, 660, 12345)],
                                "id long, xm long, ym long, v long")
    out = {(r.gx, r.gy): (r.n_pts, r.pred)
           for r in idw_grid(spark, pts, n=4, step=660,
                             radius=700).collect()}
    assert out[(1, 1)] == (1, 12345)  # d2=0 -> w=WSCALE -> pred=v


def test_idw_integer_law_matches_python(spark):
    from aef_mosaic_spark.operators.interpolate import WSCALE, idw_grid
    pts = [(i, (i * 301) % 2000, (i * 407) % 2000, 1000 + i * 17)
           for i in range(50)]
    df = spark.createDataFrame(pts, "id long, xm long, ym long, v long")
    n, step, radius = 4, 660, 700
    got = {(r.gx, r.gy): (r.n_pts, r.pred)
           for r in idw_grid(spark, df, n=n, step=step,
                             radius=radius).collect()}
    want = {}
    for gx in range(n):
        for gy in range(n):
            num = den = cnt = 0
            for _, x, y, v in pts:
                d2 = (gx * step - x) ** 2 + (gy * step - y) ** 2
                if d2 <= radius * radius:
                    w = WSCALE // (d2 + 1)
                    num += w * v
                    den += w
                    cnt += 1
            if cnt:
                want[(gx, gy)] = (cnt, num // den)
    assert got == want
