"""A/B: HyperLogLog distinct vs exact countDistinct at replicated
scale (BENCH 10j).

Workload: sf0.1 events (100k rows) replicated R times with the
replica index folded into the value -> R*100k rows, ~R*100k distinct
values, grouped by event_type (5 groups).  The exact plan must
shuffle every distinct (group, value) pair; the HLL plan shuffles at
most groups x 256 register partials per map task.

Usage: python scripts/sketch_bench.py [R] [reps]
Prints one JSON line per variant per rep plus a summary.
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from aef_mosaic_spark.functions.sketches import hll_distinct  # noqa: E402
from aef_mosaic_spark.session import get_spark  # noqa: E402


def _shuffle_write_bytes(spark) -> int:
    """Total shuffle-write bytes across all completed stages, via the
    UI REST API (same counter the Spark UI shows)."""
    import urllib.request
    base = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    with urllib.request.urlopen(
            f"{base}/api/v1/applications/{app_id}/stages?status=complete"
    ) as r:
        stages = json.load(r)
    return sum(s.get("shuffleWriteBytes", 0) for s in stages)


def main():
    R = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark(app_name="sketch-bench", master="local[16]",
                      extra_conf={"spark.sql.shuffle.partitions": "16",
                                  "spark.ui.enabled": "true"})
    e = spark.read.parquet("/root/testdata/sf0.1/events.parquet")
    repl = spark.range(R).withColumnRenamed("id", "r")
    big = (e.select("event_type", "event_id").crossJoin(repl)
           .select("event_type",
                   F.concat_ws("_", "event_id", "r").alias("v")))
    big = big.persist()
    n = big.count()
    print(json.dumps({"rows": n, "replicas": R}))

    out = {"exact": [], "hll": []}
    sw = {"exact": 0, "hll": 0}
    est_rows = exact_rows = None
    for _ in range(reps):
        s0 = _shuffle_write_bytes(spark)
        t0 = time.time()
        exact_rows = sorted(map(tuple, (
            big.groupBy("event_type")
               .agg(F.countDistinct("v").alias("n")).collect())))
        out["exact"].append(round(time.time() - t0, 2))
        sw["exact"] = _shuffle_write_bytes(spark) - s0
        s0 = _shuffle_write_bytes(spark)
        t0 = time.time()
        est_rows = sorted(map(tuple, (
            hll_distinct(big, ["event_type"], "v")
            .select("event_type", "approx_distinct").collect())))
        out["hll"].append(round(time.time() - t0, 2))
        sw["hll"] = _shuffle_write_bytes(spark) - s0
    err = max(abs(a[1] - b[1]) / b[1]
              for a, b in zip(est_rows, exact_rows))
    print(json.dumps({"exact_s": out["exact"], "hll_s": out["hll"],
                      "shuffle_write_bytes": sw,
                      "max_rel_err": round(err, 4),
                      "exact": exact_rows, "est": est_rows}))


if __name__ == "__main__":
    main()
