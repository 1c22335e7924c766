"""N-vs-4N core scaling pair for the iterative graph family (LPA +
BFS hop distance) — BENCH 10q.

Same-session back-to-back A/B (host drift rule): a deterministic
planted-community edge table (N nodes in 100-node communities, ~9
intra-community edges per node + 1% inter-community bridges) is
written once to /dev/shm parquet, then label_propagation(iters=4)
and hop_distance(iters=4) run at local[4] and local[16], median of
`reps`.  Each round is join + groupBy over the full edge table — the
shape that must scale on a real cluster.  The forcing action is a
tiny order-independent checksum (count, distinct labels, sum of
node*label), which doubles as the cross-master identity check.

Usage: python scripts/graph_bench.py [n_nodes] [reps]
Prints one JSON line.
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

N_NODES = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
PATH = "/dev/shm/graph_bench_edges"


def _write_edges(spark):
    # community c = node div 100; each node links to 9 pseudo-random
    # peers in its community (hash stride) and every 100th node
    # bridges to the next community — distinct canonical (a < b)
    base = spark.range(N_NODES).selectExpr("id AS u")
    intra = base.selectExpr(
        "u",
        "explode(sequence(1, 9)) AS k").selectExpr(
        "u",
        "(u div 100) * 100 + ((u % 100) + k * 17 + (u * 2654435761) % 7 + 1)"
        " % 100 AS v")
    bridge = base.where("u % 100 = 0 AND u + 100 < " + str(N_NODES)) \
        .selectExpr("u", "u + 100 AS v")
    e = (intra.unionByName(bridge)
         .where("u <> v")
         .selectExpr("least(u, v) AS a", "greatest(u, v) AS b")
         .distinct())
    e.repartition(32).write.mode("overwrite").parquet(PATH)


def _checksum(labels, key):
    row = labels.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct(key).alias("d"),
        F.sum(F.col("node") * F.col(key)).cast("long").alias("s")
    ).collect()[0]
    return (row.n, row.d, row.s)


def main():
    from aef_mosaic_spark.operators.graph import (hop_distance,
                                                  label_propagation)
    from aef_mosaic_spark.session import get_spark

    if not os.path.exists(PATH):
        s0 = get_spark(app_name="graph-bench-gen", master="local[16]",
                       extra_conf={"spark.sql.shuffle.partitions": "32"})
        _write_edges(s0)
        s0.stop()

    out, idents = {}, {"lpa": set(), "bfs": set()}
    for master, sp in (("local[4]", 16), ("local[16]", 64)):
        spark = get_spark(app_name="graph-bench", master=master,
                          extra_conf={"spark.sql.shuffle.partitions":
                                      str(sp)})
        edges = spark.read.parquet(PATH)
        seeds = (edges.select(F.col("a").alias("node"))
                 .where("node % 1000 = 0").distinct())
        runs = {"lpa": lambda: _checksum(
                    label_propagation(edges, iters=4), "label"),
                "bfs": lambda: _checksum(
                    hop_distance(edges, seeds, iters=4), "dist")}
        for name, fn in runs.items():
            fn()                                   # warm-up
            times = []
            for _ in range(REPS):
                t0 = time.time()
                idents[name].add(fn())
                times.append(round(time.time() - t0, 2))
            out[(name, master)] = sorted(times)
        spark.stop()
    for name, s in idents.items():
        assert len(s) == 1, f"{name} results differ across masters: {s}"
    res = {"n_nodes": N_NODES, "reps": REPS}
    for name in ("lpa", "bfs"):
        t4 = out[(name, "local[4]")]
        t16 = out[(name, "local[16]")]
        res[name] = {
            "times_4": t4, "times_16": t16,
            "median_4": t4[len(t4) // 2], "median_16": t16[len(t16) // 2],
            "efficiency_median": round(
                t4[len(t4) // 2] / t16[len(t16) // 2] / 4.0, 3),
            "min_4": t4[0], "min_16": t16[0],
            "efficiency_min": round(t4[0] / t16[0] / 4.0, 3),
        }
    print(json.dumps(res))
    shutil.rmtree(PATH, ignore_errors=True)


if __name__ == "__main__":
    main()
