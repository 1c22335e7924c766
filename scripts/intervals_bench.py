"""N-vs-4N core scaling pair for the keyed interval-overlap join
(BENCH 10p).

20M deterministic intervals over 2M keys (10 per key, each key's
intervals confined to a 2000-unit window so overlaps actually occur)
plus ten planted mega-keys at 2k intervals each — the skew case the
bucket blocking must absorb without a per-key cartesian. The forcing
action is (count, sum(overlap_len), sum(l_id)) so Catalyst cannot
eliminate the join; the signature is the cross-run identity check.

Usage: python scripts/intervals_bench.py [n_rows] [reps]
Prints one JSON line.
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, ".")

N_ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
PATH = "/dev/shm/intervals_bench"


def _write(spark):
    n_keys = N_ROWS // 10
    df = spark.range(N_ROWS).selectExpr(
        "id AS iid",
        # 0.01% of rows land on 10 mega-keys
        f"CASE WHEN id % 10000 < 10 THEN id % 10000 "
        f"     ELSE 10 + (id * 2654435761) % {n_keys} END AS key",
    ).selectExpr(
        "key", "iid",
        # each key's intervals live in a deterministic 2000-wide
        # window; durations 1..30
        "key * 40 % 1000000 + (iid * 48271) % 2000 AS start",
        "key * 40 % 1000000 + (iid * 48271) % 2000"
        " + 1 + iid % 30 AS end",
    )
    df.repartition(32).write.mode("overwrite").parquet(PATH)


def main():
    from pyspark.sql import functions as F

    from aef_mosaic_spark.operators.intervals import concurrent_intervals
    from aef_mosaic_spark.session import get_spark

    if not os.path.exists(PATH):
        s0 = get_spark(app_name="iv-bench-gen", master="local[16]",
                       extra_conf={"spark.sql.shuffle.partitions": "32"})
        _write(s0)
        s0.stop()

    out, signatures = {}, set()
    for master, sp in (("local[4]", 16), ("local[16]", 64)):
        spark = get_spark(app_name="iv-bench", master=master,
                          extra_conf={"spark.sql.shuffle.partitions":
                                      str(sp)})
        iv = spark.read.parquet(PATH)
        times = []
        for i in range(REPS + 1):   # rep 0 = warm-up
            t0 = time.time()
            sig = tuple(concurrent_intervals(iv).agg(
                F.count(F.lit(1)), F.sum("overlap_len"),
                F.sum("l_id")).collect()[0])
            dt = round(time.time() - t0, 2)
            if i:
                times.append(dt)
                signatures.add(sig)
        out[master] = sorted(times)
        spark.stop()
    assert len(signatures) == 1, "results differ across runs/masters"
    sig = next(iter(signatures))
    med4 = out["local[4]"][len(out["local[4]"]) // 2]
    med16 = out["local[16]"][len(out["local[16]"]) // 2]
    print(json.dumps({
        "n_rows": N_ROWS, "reps": REPS,
        "pairs": sig[0], "overlap_sum": sig[1],
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
