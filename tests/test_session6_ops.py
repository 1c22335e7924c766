"""Session-6 operators: k-core peel, RA link prediction, CUSUM
changepoints, KDE splat heatmap — hand-computed parity + law checks."""

import datetime

import pandas as pd
from pyspark.sql import functions as F

from aef_mosaic_spark.operators.anomaly import cusum_changepoints
from aef_mosaic_spark.operators.graph import k_core, ra_link_prediction
from aef_mosaic_spark.operators.interpolate import KDE_R, KDE_STEP, kde_heatmap


def _edges(spark, pairs):
    return spark.createDataFrame(
        pd.DataFrame(pairs, columns=["a", "b"]).astype("int64"))


# ------------------------------------------------------------------ #
# k-core                                                              #
# ------------------------------------------------------------------ #

def test_k_core_peels_tail(spark):
    # K4 on 1..4 plus a pendant chain 4-5-6: 2-core = the K4 exactly
    # (5 and 6 peel off in two rounds)
    k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    e = _edges(spark, k4 + [(4, 5), (5, 6)])
    got = {r.node: r.deg for r in k_core(e, k=2, iters=4).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_k_core_fixed_rounds_is_prefix_of_peel(spark):
    # a 4-chain under k=2 peels one endpoint layer per round:
    # after 1 round nodes {2,3} remain edge (2,3); after 2 rounds empty
    e = _edges(spark, [(1, 2), (2, 3), (3, 4)])
    one = {r.node for r in k_core(e, k=2, iters=1).collect()}
    assert one == {2, 3}
    assert k_core(e, k=2, iters=2).count() == 0


def test_k_core_whole_graph_survives(spark):
    # cycle: every node has degree 2 forever under k=2
    e = _edges(spark, [(1, 2), (2, 3), (3, 4), (1, 4)])
    got = {r.node: r.deg for r in k_core(e, k=2, iters=6).collect()}
    assert got == {1: 2, 2: 2, 3: 2, 4: 2}


# ------------------------------------------------------------------ #
# RA link prediction                                                  #
# ------------------------------------------------------------------ #

def test_ra_hand_computed(spark):
    # path 1-3, 2-3, 1-4, 2-4: candidates (1,2) via z=3 (deg 2) and
    # z=4 (deg 2) -> ra = 2 * (10^6 div 2); (3,4) via z=1, z=2 same.
    e = _edges(spark, [(1, 3), (2, 3), (1, 4), (2, 4)])
    got = {(r.u, r.v): (r.common_n, r.ra_score)
           for r in ra_link_prediction(e, min_common=2).collect()}
    assert got == {(1, 2): (2, 1000000), (3, 4): (2, 1000000)}


def test_ra_excludes_existing_edges(spark):
    # triangle + apex: (1,2) are adjacent -> never emitted even with
    # common neighbor 3
    e = _edges(spark, [(1, 2), (1, 3), (2, 3), (3, 4), (1, 4), (2, 4)])
    got = ra_link_prediction(e, min_common=1).collect()
    pairs = {(r.u, r.v) for r in got}
    assert (1, 2) not in pairs and (1, 3) not in pairs


def test_ra_max_deg_drops_hub_wedges(spark):
    # star center 9 with leaves 1..4 plus wedge 1-5-2: capping deg<=2
    # removes the hub's wedges, keeping only z=5's pair
    star = [(i, 9) for i in range(1, 5)]
    e = _edges(spark, star + [(1, 5), (2, 5)])
    capped = {(r.u, r.v): r.common_n
              for r in ra_link_prediction(e, min_common=1,
                                          max_deg=2).collect()}
    # z=5 keeps (1,2); z=1 and z=2 (deg 2) each see {5,9} -> (5,9);
    # every wedge through the deg-4 hub 9 is gone, so (3,4) is not
    assert capped == {(1, 2): 1, (5, 9): 2}
    exact = {(r.u, r.v) for r in
             ra_link_prediction(e, min_common=1).collect()}
    assert (3, 4) in exact  # the hub wedge the cap dropped


# ------------------------------------------------------------------ #
# CUSUM changepoints                                                  #
# ------------------------------------------------------------------ #

def _events(spark, vals, user=1):
    t0 = datetime.datetime(2024, 1, 1)
    rows = [{"user_id": user, "event_id": i,
             "ts": t0 + datetime.timedelta(seconds=i), "value": float(v)}
            for i, v in enumerate(vals)]
    return spark.createDataFrame(pd.DataFrame(rows))


def test_cusum_flags_level_shift_both_sides(spark):
    # 30 at level 10, then 30 at level 30: the reference is the key's
    # own mean (20), so the retrospective CUSUM flags BOTH regimes —
    # the low half accumulates on the negative side, the high half on
    # the positive side (never the other way around)
    vals = [10.0] * 30 + [30.0] * 30
    got = cusum_changepoints(_events(spark, vals), h=6).collect()
    assert got, "level shift must be detected"
    lim = 6 * got[0].aad_n
    for r in got:
        if r.event_id < 30:
            assert r.s_neg > lim and r.s_pos <= lim
        elif r.event_id >= 40:
            # away from the boundary the residual s_neg has decayed
            assert r.s_pos > lim and r.s_neg <= lim
    assert any(r.event_id >= 40 for r in got)
    assert any(r.event_id < 30 for r in got)


def test_cusum_stable_series_clean(spark):
    # pure noise around a level: the slack term keeps s bounded
    vals = [10.0, 10.01, 9.99] * 20
    assert cusum_changepoints(_events(spark, vals), h=6).count() == 0
    # exactly-constant series: aad = 0, statistics 0, clean
    assert cusum_changepoints(_events(spark, [7.0] * 25), h=0).count() == 0


def test_cusum_matches_textbook_recursion(spark):
    # brute-force the textbook slack recursion with the same integer
    # law; h=0 emits every row with a positive statistic
    vals = [5.0, 5.0, 9.0, 1.0, 5.0, 12.0, 12.0, 12.0, 2.0, 5.0]
    n = len(vals)
    vc = [int(v * 100 + 0.5) for v in vals]
    s = sum(vc)
    d = [n * x - s for x in vc]
    aad = sum(abs(x) for x in d) // n
    sl = aad // 2
    sp = sn = 0
    expect = {}
    for i, di in enumerate(d):
        sp = max(0, sp + di - sl)
        sn = max(0, sn - di - sl)
        expect[i] = (sp, sn)
    got = {r.event_id: (r.s_pos, r.s_neg)
           for r in cusum_changepoints(_events(spark, vals), h=0).collect()}
    for i, (esp, esn) in expect.items():
        if esp > 0 or esn > 0:
            assert got[i] == (esp, esn)
        else:
            assert i not in got


# ------------------------------------------------------------------ #
# KDE heatmap                                                         #
# ------------------------------------------------------------------ #

def test_kde_single_point_splat(spark):
    # one point dead-center of cell (2,2): w = 4R^2 - d2 over the
    # doubled lattice, checked against a python replica
    pts = spark.createDataFrame(pd.DataFrame(
        [{"id": 1, "xm": 2 * KDE_STEP + KDE_STEP // 2,
          "ym": 2 * KDE_STEP + KDE_STEP // 2}]))
    got = {(r.cx, r.cy): r.density for r in kde_heatmap(pts).collect()}
    px2 = 2 * (2 * KDE_STEP + KDE_STEP // 2)
    r = KDE_R // KDE_STEP + 1
    expect = {}
    for dx in range(-r, r + 1):
        for dy in range(-r, r + 1):
            cx, cy = 2 + dx, 2 + dy
            ddx = 2 * cx * KDE_STEP + KDE_STEP - px2
            ddy = 2 * cy * KDE_STEP + KDE_STEP - px2
            w = 4 * KDE_R * KDE_R - (ddx * ddx + ddy * ddy)
            if w > 0:
                expect[(cx, cy)] = w
    assert got == expect


def test_kde_density_additive(spark):
    # density is a plain sum: duplicating every point doubles density
    pdf = pd.DataFrame([{"id": i, "xm": 100 + 37 * i, "ym": 900 - 13 * i}
                        for i in range(20)])
    one = {(r.cx, r.cy): (r.n_pts, r.density)
           for r in kde_heatmap(spark.createDataFrame(pdf)).collect()}
    two = {(r.cx, r.cy): (r.n_pts, r.density)
           for r in kde_heatmap(
               spark.createDataFrame(pd.concat([pdf, pdf]))).collect()}
    assert two == {k: (n * 2, d * 2) for k, (n, d) in one.items()}


# ------------------------------------------------------------------ #
# trajectory similarity (partial directed Hausdorff)                  #
# ------------------------------------------------------------------ #

def _fixes(spark, rows):
    return spark.createDataFrame(pd.DataFrame(
        rows, columns=["user_id", "event_id", "xm", "ym"]).astype("int64"))


def test_hausdorff_companions_and_far_user(spark):
    from aef_mosaic_spark.operators.trajectory import hausdorff_pairs
    # users 1 and 2 walk the same line 40 apart; user 3 is far away
    rows = []
    for i in range(10):
        rows.append((1, 100 + i, 1000 + 100 * i, 5000))
        rows.append((2, 200 + i, 1000 + 100 * i, 5040))
        rows.append((3, 300 + i, 90000 + 100 * i, 90000))
    got = {(r.ua, r.ub): (r.n_a, r.matched_n, r.h2)
           for r in hausdorff_pairs(_fixes(spark, rows),
                                    thresh=150).collect()}
    # every point of 1 has the 40-away twin; symmetric
    assert got == {(1, 2): (10, 10, 1600), (2, 1): (10, 10, 1600)}


def test_hausdorff_half_coverage_gate_is_directed(spark):
    from aef_mosaic_spark.operators.trajectory import hausdorff_pairs
    # user 1: 10 points spaced 400 (> thresh + shadow offset); user 2
    # shadows only the first 4 -> H(1->2) matches 4/10 (fails the
    # gate), H(2->1) matches 4/4 (passes)
    rows = []
    for i in range(10):
        rows.append((1, 100 + i, 1000 + 400 * i, 5000))
    for i in range(4):
        rows.append((2, 200 + i, 1000 + 400 * i, 5030))
    got = {(r.ua, r.ub): (r.n_a, r.matched_n, r.h2)
           for r in hausdorff_pairs(_fixes(spark, rows),
                                    thresh=150).collect()}
    assert got == {(2, 1): (4, 4, 900)}


def test_hausdorff_cross_cell_match(spark):
    from aef_mosaic_spark.operators.trajectory import hausdorff_pairs
    # neighbors straddling a thresh-cell boundary still match: point
    # at 149 and point at 151 sit in different cells at thresh=150
    rows = [(1, 1, 149, 149), (2, 2, 151, 151)]
    got = {(r.ua, r.ub): r.h2
           for r in hausdorff_pairs(_fixes(spark, rows),
                                    thresh=150).collect()}
    assert got == {(1, 2): 8, (2, 1): 8}


def test_hausdorff_matches_bruteforce_on_planted_law(spark):
    from aef_mosaic_spark.operators.trajectory import (hausdorff_pairs,
                                                       traj_fixes)
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    fixes = traj_fixes(ev)
    pts = [(r.user_id, r.event_id, r.xm, r.ym) for r in fixes.collect()]
    t2 = 150 * 150
    from collections import defaultdict
    by = defaultdict(list)
    for u, e, x, y in pts:
        by[u].append((x, y))
    expect = {}
    for ua, apts in by.items():
        for ub, bpts in by.items():
            if ua == ub:
                continue
            mins = []
            for ax, ay in apts:
                best = min((ax - bx) ** 2 + (ay - by_) ** 2
                           for bx, by_ in bpts)
                if best <= t2:
                    mins.append(best)
            if 2 * len(mins) >= len(apts):
                expect[(ua, ub)] = (len(apts), len(mins), max(mins))
    got = {(r.ua, r.ub): (r.n_a, r.matched_n, r.h2)
           for r in hausdorff_pairs(fixes).collect()}
    assert got == expect and got


# ------------------------------------------------------------------ #
# q152 Pareto skyline                                                 #
# ------------------------------------------------------------------ #

def test_skyline_matches_bruteforce(spark):
    """Window+broadcast skyline == the O(n^2) dominance definition,
    including ties (identical points both survive)."""
    from aef_mosaic_spark.operators.skyline import skyline_2d
    rows = [(i, (i * 37) % 23, float((i * 91) % 50)) for i in range(200)]
    rows += [(900, 5, 3.0), (901, 5, 3.0)]          # exact tie pair
    df = spark.createDataFrame(rows, "id long, size long, price double")
    got = {r.id for r in skyline_2d(df, "id", "price", "size").collect()}
    pts = {i: (s, p) for i, s, p in rows}
    brute = set()
    for x, (sx, px) in pts.items():
        dominated = any(
            (py <= px and sy >= sx and (py < px or sy > sx))
            for y, (sy, py) in pts.items() if y != x)
        if not dominated:
            brute.add(x)
    assert got == brute
    assert {900, 901} & got == ({900, 901} if 900 in brute else set())


# ------------------------------------------------------------------ #
# q153 trajectory resampling                                          #
# ------------------------------------------------------------------ #

def test_resample_trajectories_exact(spark):
    """Hand-checkable segments: half-open coverage, exact integer
    interpolation, per-user independence."""
    from aef_mosaic_spark.operators.trajectory import resample_trajectories
    fixes = spark.createDataFrame(
        [(1, 100, 0, 1000), (1, 350, 500, 500), (1, 400, 600, 0),
         (2, 95, 70, 70), (2, 105, 80, 80)],
        "user_id long, es long, xm long, ym long")
    got = {(r.user_id, r.gs): (r.xg, r.yg)
           for r in resample_trajectories(fixes, grid_sec=100).collect()}
    # user 1 seg [100,350): epochs 100,200,300; seg [350,400): none
    #   (g_lo=4 > g_hi=3); epoch 400 == last fix -> excluded
    # user 2 seg [95,105): epoch 100
    assert set(got) == {(1, 100), (1, 200), (1, 300), (2, 100)}
    assert got[(1, 100)] == (0, 1000)
    # x(200) = (0*150 + 500*100) div 250 = 200; y = (1000*150+500*100)/250
    assert got[(1, 200)] == (200, 800)
    assert got[(1, 300)] == (400, 600)
    assert got[(2, 100)] == ((70 * 5 + 80 * 5) // 10, 75)


def test_simplify_trajectories_sed(spark):
    """Endpoints always kept; a fix on the time-interpolated line is
    dropped; a deviating fix is kept with its exact sed2."""
    from aef_mosaic_spark.operators.trajectory import simplify_trajectories
    fixes = spark.createDataFrame(
        [(1, 0, 100, 100), (1, 50, 150, 100), (1, 100, 200, 100),
         (1, 150, 300, 400), (1, 200, 400, 100),
         (2, 0, 7, 7)],
        "user_id long, es long, xm long, ym long")
    got = {(r.user_id, r.es): r.sed2
           for r in simplify_trajectories(fixes, tol=40).collect()}
    # (1, 50) is exactly on the line 0->100 (sed2 = 0) -> dropped
    # (1, 150): interp between (100,(200,100)) and (200,(400,100)) is
    #   (300, 100); deviation (0, 300) -> sed2 = 90000 > 1600 -> kept
    # (1, 100): interp between (50,(150,100)) and (150,(300,400)) is
    #   (225, 250); sed2 = 25^2 + 150^2 = 23125 -> kept
    assert set(got) == {(1, 0), (1, 100), (1, 150), (1, 200), (2, 0)}
    assert got[(1, 100)] == 23125
    assert got[(1, 150)] == 90000
    assert got[(1, 0)] == -1 and got[(2, 0)] == -1
    # tighter tolerance keeps the near-line fix too
    got0 = {(r.user_id, r.es)
            for r in simplify_trajectories(fixes, tol=0).collect()}
    assert (1, 50) not in got0          # sed2 == 0 is never > 0


def test_association_rules_hand_counts(spark):
    """4 baskets, hand-counted supports: {1,2,3},{1,2},{1,3},{2}."""
    from aef_mosaic_spark.operators.basket import association_rules
    rows = [(10, 1), (10, 2), (10, 3), (11, 1), (11, 2), (12, 1),
            (12, 3), (13, 2), (10, 1)]          # dup line collapses
    li = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    got = {(r.pa, r.pb): r for r in association_rules(li).collect()}
    assert set(got) == {(1, 2), (1, 3)}          # (2,3) seen once only
    r = got[(1, 2)]
    # n=4, c1=3, c2=3, c12=2
    assert (r.n_ab, r.n_a, r.n_b) == (2, 3, 3)
    assert r.supp_ppm == 2 * 10**6 // 4
    assert r.conf_ab_ppm == 2 * 10**6 // 3
    assert r.lift_ppm == (2 * 4 * 10**6) // 9
    r13 = got[(1, 3)]
    assert (r13.n_ab, r13.n_a, r13.n_b) == (2, 3, 2)
    assert r13.lift_ppm == (2 * 4 * 10**6) // 6


def test_quadtree_leaves_invariants(spark):
    """Planted hot cluster + sparse field: leaf counts conserve the
    point total, non-depth-capped leaves respect the cap, hot region
    splits deeper than the sparse field."""
    from aef_mosaic_spark.operators.quadtree import (FIELD_BITS,
                                                     quadtree_leaves)
    # 500 points inside one 256-wide box + 50 spread across the field
    hot = [(i, 1000 + (i * 37) % 256, 2000 + (i * 91) % 256)
           for i in range(500)]
    sparse = [(1000 + i, (i * 8191) % (1 << FIELD_BITS),
               (i * 12289) % (1 << FIELD_BITS)) for i in range(50)]
    pts = spark.createDataFrame(hot + sparse, "id long, xm long, ym long")
    leaves = quadtree_leaves(pts, cap=64, max_depth=6).collect()
    assert sum(r.n for r in leaves) == 550
    for r in leaves:
        if r.level < 6:
            assert r.n <= 64, r
        # cell coordinates live inside the level's grid
        assert 0 <= r.cx < (1 << r.level) and 0 <= r.cy < (1 << r.level)
    # the hot box must push past the first levels; sparse leaves stay
    # shallow
    assert max(r.level for r in leaves if r.n > 1) >= 4
    assert min(r.level for r in leaves) <= 2


def test_quadtree_assign_consistent_with_leaves(spark):
    """Grouping the assignment by leaf reproduces the leaf table
    exactly; every point is assigned exactly once."""
    from aef_mosaic_spark.operators.quadtree import (quadtree_assign,
                                                     quadtree_leaves)
    pts = spark.createDataFrame(
        [(i, 1000 + (i * 37) % 256, 2000 + (i * 91) % 256)
         for i in range(500)]
        + [(1000 + i, (i * 8191) % (1 << 17), (i * 12289) % (1 << 17))
           for i in range(50)],
        "id long, xm long, ym long")
    asg = quadtree_assign(pts, cap=64, max_depth=6).collect()
    assert len(asg) == 550
    assert len({r.id for r in asg}) == 550
    from collections import Counter
    got = Counter((r.level, r.cx, r.cy) for r in asg)
    exp = {(r.level, r.cx, r.cy): r.n
           for r in quadtree_leaves(pts, cap=64, max_depth=6).collect()}
    assert dict(got) == exp


def test_seasonal_profile_hand_values(spark):
    """Two types, planted hourly shape: exact micro-unit means,
    seasonal index sums to ~0 over slots, anomaly counted."""
    import datetime as dt
    from aef_mosaic_spark.operators.anomaly import seasonal_profile
    base = dt.datetime(2024, 1, 1)
    rows = []
    # type A: value = 10 at hour 0, 30 at hour 1 (3 days each)
    for d in range(3):
        rows.append((dt.datetime(2024, 1, 1 + d, 0, 15), "A", 10.0))
        rows.append((dt.datetime(2024, 1, 1 + d, 1, 15), "A", 30.0))
    # one outlier in A hour 0 (value 400 -> residual > 200 units)
    rows.append((dt.datetime(2024, 1, 4, 0, 15), "A", 400.0))
    # type B flat
    rows.append((base, "B", 5.0))
    ev = spark.createDataFrame(rows, "ts timestamp, event_type string, "
                                     "value double")
    got = {(r.event_type, r.hour): r
           for r in seasonal_profile(ev).collect()}
    a0, a1 = got[("A", 0)], got[("A", 1)]
    assert a0.n == 4 and a1.n == 3
    assert a0.mean_u == (3 * 10 + 400) * 10**6 // 4    # 107.5 units
    assert a1.mean_u == 30 * 10**6
    tmean = (3 * 10 + 400 + 3 * 30) * 10**6 // 7
    assert a0.seasonal_u == a0.mean_u - tmean
    assert a1.seasonal_u == a1.mean_u - tmean
    # |400 - 107.5| = 292.5 > 200 -> 1 anomaly; |10 - 107.5| < 200
    assert a0.n_anom == 1 and a1.n_anom == 0
    assert got[("B", 0)].seasonal_u == 0


def test_woe_iv_hand_math(spark):
    """Two buckets with opposite class balance: exact smoothed
    micro-nat WOE and IV contribution signs."""
    import math
    from aef_mosaic_spark.functions.features import woe_iv
    rows = ([("purchase", 10.0)] * 30 + [("view", 10.0)] * 10
            + [("purchase", 60.0)] * 5 + [("view", 60.0)] * 55)
    ev = spark.createDataFrame(rows, "event_type string, value double")
    got = {r.bucket: r for r in woe_iv(ev, bucket_width=50).collect()}
    b0, b1 = got[0], got[1]
    # smoothed: b0 pos 31 neg 11; b1 pos 6 neg 56; P 37 N 67
    assert (b0.n_pos, b0.n_neg, b1.n_pos, b1.n_neg) == (31, 11, 6, 56)
    P, N = 37, 67
    w0 = math.floor(math.log((31 * N) / (11 * P)) * 1e6 + 0.5)
    w1 = math.floor(math.log((6 * N) / (56 * P)) * 1e6 + 0.5)
    assert b0.woe_micro == w0 and b1.woe_micro == w1
    assert b0.woe_micro > 0 > b1.woe_micro
    # iv contributions positive in both buckets (share gap * woe same
    # sign), via the exact integer law
    c0 = ((31 * 10**6 // P - 11 * 10**6 // N) * w0) // 10**6
    assert b0.iv_contrib_micro == c0 and c0 > 0
    assert b1.iv_contrib_micro > 0


def test_table_diff_classifies(spark):
    """Hand snapshots: classification and the empty-diff identity."""
    from aef_mosaic_spark.operators.diff import table_diff
    old = spark.createDataFrame(
        [(1, 10, "a"), (2, 20, "b"), (3, 30, "c"), (4, None, "d")],
        "k long, v long, s string")
    new = spark.createDataFrame(
        [(1, 10, "a"), (2, 25, "b"), (4, None, "d"), (5, 50, "e")],
        "k long, v long, s string")
    got = {r.k: r.change
           for r in table_diff(old, new, ["k"], ["v", "s"]).collect()}
    # 1 unchanged (absent), 2 updated, 3 deleted, 4 unchanged despite
    # NULL v (null-safe compare), 5 inserted
    assert got == {2: "update", 3: "delete", 5: "insert"}
    assert table_diff(old, old, ["k"], ["v", "s"]).count() == 0
