"""Quadtree vs uniform grid under skew — occupancy evidence (BENCH 10r).

A 5M-point corpus with 90% of points in 10 hot 512-wide boxes and 10%
uniform over the 2^17 field is partitioned two ways: the adaptive
quadtree (cap 4096, depth 8) and a uniform grid chosen to have at
least as many OCCUPIED cells as the quadtree has leaves (so the
comparison favors the grid).  Reported: leaf/cell count and the
occupancy distribution (mean / p99 / max points per partition) plus
the quadtree assignment wall time at local[16].  The max is the
straggler task at scale — the number that decides whether a uniform
grid works on skewed data.

Usage: python scripts/quadtree_bench.py [n_points] [cap] [depth]
Prints one JSON line.
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
CAP = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
DEPTH = int(sys.argv[3]) if len(sys.argv) > 3 else 8


def _occupancy(cells):
    counts = sorted(r.n for r in cells)
    total = sum(counts)
    return {
        "partitions": len(counts),
        "mean": round(total / len(counts), 1),
        "p99": counts[int(len(counts) * 0.99) - 1],
        "max": counts[-1],
    }


def main():
    from aef_mosaic_spark.operators.quadtree import (FIELD_BITS,
                                                     quadtree_assign,
                                                     quadtree_leaves)
    from aef_mosaic_spark.session import get_spark

    spark = get_spark(app_name="quadtree-bench", master="local[16]",
                      extra_conf={"spark.sql.shuffle.partitions": "64"})
    field = 1 << FIELD_BITS
    # 90% hot: 10 boxes of width 512 at hash-spread anchors; 10% field
    pts = spark.range(N).selectExpr(
        "id",
        f"""CASE WHEN id % 10 = 0
             THEN (id * 2654435761) % {field}
             ELSE ((id % 10) * 12289 * 7 + 40960) % ({field} - 512)
                  + (id * 48271) % 512 END AS xm""",
        f"""CASE WHEN id % 10 = 0
             THEN (id * 1099511627) % {field}
             ELSE ((id % 10) * 24593 * 5 + 20480) % ({field} - 512)
                  + (id * 69621) % 512 END AS ym""").persist()
    pts.count()

    t0 = time.time()
    leaves = quadtree_leaves(pts, cap=CAP, max_depth=DEPTH).collect()
    t_leaves = round(time.time() - t0, 2)
    qt = _occupancy(leaves)

    # uniform grid: smallest level with >= as many occupied cells
    for lvl in range(1, DEPTH + 1):
        w = 1 << (FIELD_BITS - lvl)
        grid = (pts.groupBy(F.expr(f"xm div {w}").alias("cx"),
                            F.expr(f"ym div {w}").alias("cy"))
                .agg(F.count(F.lit(1)).alias("n"))).collect()
        if len(grid) >= qt["partitions"]:
            break
    un = _occupancy(grid)

    t0 = time.time()
    n_assigned = quadtree_assign(pts, cap=CAP, max_depth=DEPTH).count()
    t_assign = round(time.time() - t0, 2)

    print(json.dumps({
        "n_points": N, "cap": CAP, "depth": DEPTH,
        "quadtree": qt, "uniform_grid": {**un, "level": lvl},
        "max_ratio": round(un["max"] / qt["max"], 1),
        "assign_rows": n_assigned,
        "t_leaves_s": t_leaves, "t_assign_s": t_assign,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
