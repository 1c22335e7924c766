"""N-vs-4N core scaling pair for distributed DBSCAN (BENCH 10n).

Same-session back-to-back A/B (host drift rule): a deterministic
clustered point table (N/50 well-separated square clusters of ~46
points + 8% field noise — same local geometry as q130: half-width
200, eps 80, min_pts 5) is written once to /dev/shm parquet, then the
full dbscan pipeline (cell-blocked neighbor join -> core flags ->
pre-contracted CC -> border attach) runs at local[4] and local[16],
median of `reps`. The forcing action is the (role, count,
sum(cluster_id)) signature — sum over the joined label column so
Catalyst cannot eliminate the CC subtree (the 7o join-elimination
trap); the signature is also the cross-run identity check.

Usage: python scripts/dbscan_bench.py [n_rows] [reps]
Prints one JSON line.
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, ".")

N_ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
PATH = "/dev/shm/dbscan_bench_points"
CLUSTER = 50          # target points per cluster (pre-noise)
SPACING = 1200        # center grid pitch: clusters never merge


def _write_points(spark):
    c = max(N_ROWS // CLUSTER, 1)
    g = int(c ** 0.5) + 1
    df = spark.range(N_ROWS).selectExpr(
        "id",
        f"id % {c} AS cid",
        # integer LCG offsets in [-200, 200] (no oracle here, so the
        # md5 law is not required; cheap and deterministic)
        f"CAST((id * 48271) % 401 AS BIGINT) - 200 AS ox",
        f"CAST((id * 69621) % 401 AS BIGINT) - 200 AS oy",
    ).selectExpr(
        "id",
        f"CASE WHEN id % 12 = 0 THEN (id * 2654435761) % {g * SPACING} "
        f"     ELSE (cid % {g}) * {SPACING} + 600 + ox END AS xm",
        f"CASE WHEN id % 12 = 0 THEN (id * 1103515245) % {g * SPACING} "
        f"     ELSE (cid div {g}) * {SPACING} + 600 + oy END AS ym",
    )
    df.repartition(32).write.mode("overwrite").parquet(PATH)


def main():
    from pyspark.sql import functions as F

    from aef_mosaic_spark.operators.clustering import dbscan
    from aef_mosaic_spark.session import get_spark

    if not os.path.exists(PATH):
        s0 = get_spark(app_name="dbscan-bench-gen", master="local[16]",
                       extra_conf={"spark.sql.shuffle.partitions": "32"})
        _write_points(s0)
        s0.stop()

    out, signatures = {}, set()
    for master, sp in (("local[4]", 16), ("local[16]", 64)):
        spark = get_spark(app_name="dbscan-bench", master=master,
                          extra_conf={"spark.sql.shuffle.partitions":
                                      str(sp)})
        pts = spark.read.parquet(PATH)
        times = []
        for i in range(REPS + 1):   # rep 0 = warm-up
            t0 = time.time()
            sig = sorted(map(tuple, dbscan(pts).groupBy("role").agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("cluster_id").alias("label_sum")).collect()))
            dt = round(time.time() - t0, 2)
            if i:
                times.append(dt)
                signatures.add(tuple(sig))
        out[master] = sorted(times)
        spark.stop()
    assert len(signatures) == 1, "results differ across runs/masters"
    sig = {r[0]: (r[1], int(r[2] or 0)) for r in next(iter(signatures))}
    med4 = out["local[4]"][len(out["local[4]"]) // 2]
    med16 = out["local[16]"][len(out["local[16]"]) // 2]
    print(json.dumps({
        "n_rows": N_ROWS, "reps": REPS, "roles": sig,
        "times": out, "median_4": med4, "median_16": med16,
        "efficiency_median": round(med4 / med16 / 4.0, 3),
        "min_4": out["local[4]"][0], "min_16": out["local[16]"][0],
        "speedup_min": round(out["local[4]"][0] / out["local[16]"][0], 2),
        "efficiency_min": round(
            out["local[4]"][0] / out["local[16]"][0] / 4.0, 3),
    }))
    shutil.rmtree(PATH, ignore_errors=True)


if __name__ == "__main__":
    main()
