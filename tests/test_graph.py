"""Fixed-iteration integer PageRank: hand-computed parity, mass
conservation, and the deterministic domain-link graph law."""

import pandas as pd
from pyspark.sql import functions as F

from aef_mosaic_spark.operators.graph import (PR_SCALE, domain_link_edges,
                                              domain_pagerank, pagerank)


def test_pagerank_hand_computed(spark):
    # A->B(1), A->C(1), B->C(1), C->A(1); scale 1000, one iteration:
    # scale//3 = 333, base = 15*333//100 = 49
    # shares: A 333//2=166, B 333, C 333
    # in: A=333, B=166, C=166+333=499
    # r1: A=49+283=332, B=49+141=190, C=49+424=473
    edges = spark.createDataFrame(pd.DataFrame([
        {"src": "A", "dst": "B", "w": 1},
        {"src": "A", "dst": "C", "w": 1},
        {"src": "B", "dst": "C", "w": 1},
        {"src": "C", "dst": "A", "w": 1},
    ]))
    got = {r.node: r.rank_scaled
           for r in pagerank(edges, iters=1, scale=1000).collect()}
    assert got == {"A": 332, "B": 190, "C": 473}


def test_pagerank_mass_conservation_and_determinism(spark):
    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    r1 = {r.node: r.rank_scaled for r in domain_pagerank(d).collect()}
    r2 = {r.node: r.rank_scaled for r in domain_pagerank(d).collect()}
    assert r1 == r2 and len(r1) > 1
    total = sum(r1.values())
    # integer floors only ever lose mass: never above scale, and the
    # loss is bounded by ~2 units per node per iteration stage
    assert total <= PR_SCALE
    assert total >= PR_SCALE - len(r1) * 5 * 200
    assert all(v > 0 for v in r1.values())


def test_domain_link_edges_law(spark):
    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    e = domain_link_edges(d)
    # every document emits exactly one link: out-weight == doc count
    out = {r.src: r.total
           for r in e.groupBy("src")
           .agg(F.sum("w").cast("long").alias("total")).collect()}
    cnt = {r.source: r.n for r in
           d.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert out == cnt
    # dsts are a subset of the node set
    nodes = {r.source for r in d.select("source").distinct().collect()}
    assert {r.dst for r in e.select("dst").distinct().collect()} <= nodes


def test_hop_distance_path_graph(spark):
    """Path 1-2-...-8 plus isolated edge (20,21): seeds {1, 20};
    distances are exact within T hops, absent beyond."""
    from aef_mosaic_spark.operators.graph import hop_distance
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 8)] + [(20, 21)], "a long, b long")
    seeds = spark.createDataFrame([(1,), (20,)], "node long")
    got = {r.node: r.dist for r in hop_distance(edges, seeds, iters=3).collect()}
    assert got == {1: 0, 2: 1, 3: 2, 4: 3, 20: 0, 21: 1}
    # a seed with no edges still reports dist 0; full run reaches all
    got8 = {r.node: r.dist
            for r in hop_distance(edges, seeds, iters=8).collect()}
    assert got8[8] == 7 and got8[5] == 4
    # min over both seeds: add a shortcut edge 21-5 -> node 5 is 2 hops
    edges2 = edges.unionByName(
        spark.createDataFrame([(5, 21)], "a long, b long"))
    got2 = {r.node: r.dist
            for r in hop_distance(edges2, seeds, iters=8).collect()}
    assert got2[5] == 2 and got2[8] == 5


def test_label_propagation_two_cliques(spark):
    """Two 4-cliques joined by one bridge edge: LPA assigns each
    clique its minimum member label; the bridge does not merge them."""
    from aef_mosaic_spark.operators.graph import label_propagation
    cl1 = [(a, b) for a in (1, 2, 3, 4) for b in (1, 2, 3, 4) if a < b]
    cl2 = [(a, b) for a in (10, 11, 12, 13) for b in (10, 11, 12, 13)
           if a < b]
    edges = spark.createDataFrame(cl1 + cl2 + [(4, 10)],
                                  "a long, b long")
    got = {r.node: r.label
           for r in label_propagation(edges, iters=4).collect()}
    assert {got[n] for n in (1, 2, 3)} == {1}
    assert {got[n] for n in (11, 12, 13)} == {10}
    assert len({got[1], got[11]}) == 2          # communities distinct


def test_weighted_sssp_bellman_ford(spark):
    """Weighted min-propagation: the heavy direct edge loses to the
    lighter two-hop path once T allows it."""
    from aef_mosaic_spark.operators.graph import hop_distance
    edges = spark.createDataFrame(
        [(1, 2, 10), (1, 3, 2), (3, 2, 3), (2, 4, 1)],
        "a long, b long, w long")
    seeds = spark.createDataFrame([(1,)], "node long")
    d1 = {r.node: r.dist
          for r in hop_distance(edges, seeds, iters=1,
                                weight_col="w").collect()}
    assert d1[2] == 10 and d1[3] == 2          # direct edges only
    d3 = {r.node: r.dist
          for r in hop_distance(edges, seeds, iters=3,
                                weight_col="w").collect()}
    assert d3 == {1: 0, 3: 2, 2: 5, 4: 6}      # 1-3-2 beats 1-2
