"""N-vs-4N core scaling pair for the range-bounded spatial kNN join
(BENCH 10t).

2M demand points (90% in ten hot 3-degree metro boxes) probing 20k
sites (1% in ONE hot box, 99% uniform) — the skewed-density case the
ring-1 blocking must absorb: points in the mega-box see its ~200
metro sites plus background (~260 candidates), the rest ~55, about
2.1e8 joined rows total.  (First cut put 60% of the sites in the hot
boxes -> ~3000 candidates/point, 13.5e9 joined rows, unusable at
local[4] — the bench itself demonstrated that PROBE-side density,
not point density, sets the join cost; bound site density per ring
window when sizing the radius.)  Forcing action = (count, sum(d2), sum(site_id * rank)) so
Catalyst cannot drop the window or the join; the signature is the
cross-run identity check.

Usage: python scripts/spatial_knn_bench.py [n_points] [reps]
Prints one JSON line.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")

N_POINTS = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
N_SITES = max(N_POINTS // 100, 1000)
PPATH = "/dev/shm/sknn_points"
SPATH = "/dev/shm/sknn_sites"

# ten hot 3-degree metro boxes; coordinates deterministic in id
_HOT = ("CASE WHEN id % 10 < 9 THEN"
        "  (id % 10) * 31 % 300 - 150 + (id * 48271) % 3000 / 1000e0"
        " ELSE (id * 2654435761) % 340000 / 1000e0 - 170e0 END")
_HOTY = ("CASE WHEN id % 10 < 9 THEN"
         "  (id % 10) * 17 % 140 - 70 + (id * 69621) % 3000 / 1000e0"
         " ELSE (id * 1103515245) % 160000 / 1000e0 - 80e0 END")


def _write(spark):
    spark.range(N_POINTS).selectExpr(
        "id AS point_id", f"{_HOT} AS lon", f"{_HOTY} AS lat") \
        .repartition(32).write.mode("overwrite").parquet(PPATH)
    # sites: 1% in hot box 0, 99% uniform background
    spark.range(N_SITES).selectExpr(
        "id AS site_id",
        f"CASE WHEN id % 100 = 0 THEN"
        f"  (id % 10) * 31 % 300 - 150 + (id * 16807) % 3000 / 1000e0"
        f" ELSE (id * 2654435761) % 340000 / 1000e0 - 170e0 END AS lon",
        f"CASE WHEN id % 100 = 0 THEN"
        f"  (id % 10) * 17 % 140 - 70 + (id * 22695477) % 3000 / 1000e0"
        f" ELSE (id * 1103515245) % 160000 / 1000e0 - 80e0 END AS lat",
    ).repartition(8).write.mode("overwrite").parquet(SPATH)


def main():
    from pyspark.sql import functions as F

    from aef_mosaic_spark.operators.spatial_join import spatial_knn_join
    from aef_mosaic_spark.session import get_spark

    if not os.path.exists(PPATH):
        s0 = get_spark(app_name="sknn-gen", master="local[16]",
                       extra_conf={"spark.sql.shuffle.partitions": "32"})
        _write(s0)
        s0.stop()

    out = {"n_points": N_POINTS, "n_sites": N_SITES}
    signatures = set()
    for master, sp in (("local[4]", 16), ("local[16]", 64)):
        spark = get_spark(app_name="sknn-bench", master=master,
                          extra_conf={"spark.sql.shuffle.partitions":
                                      str(sp)})
        pts = spark.read.parquet(PPATH)
        sites = spark.read.parquet(SPATH)
        for bc in (True, False):
            key = f"{master}|{'broadcast' if bc else 'shuffle'}"
            times = []
            for i in range(REPS + 1):   # rep 0 = warm-up
                t0 = time.time()
                sig = tuple(spatial_knn_join(pts, sites, k=3,
                                             radius_deg=4,
                                             broadcast_sites=bc)
                            .agg(F.count(F.lit(1)), F.sum("d2"),
                                 F.sum(F.col("site_id")
                                       * F.col("rank")))
                            .collect()[0])
                dt = time.time() - t0
                if i:
                    times.append(round(dt, 2))
                signatures.add(sig)
            out[key] = sorted(times)
        spark.stop()
    assert len(signatures) == 1, signatures   # both plans, both masters
    out["signature"] = [str(v) for v in list(signatures)[0]]
    for strat in ("broadcast", "shuffle"):
        t4 = min(out[f"local[4]|{strat}"])
        t16 = min(out[f"local[16]|{strat}"])
        out[f"efficiency_{strat}"] = round(t4 / t16 / 4.0, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
