"""Spatial clustering job — the spark-submit surface for distributed
DBSCAN (operators/clustering.py): read a point table, assign
core/border/noise roles + density-cluster labels, commit an icelite
table with per-cluster summary metrics.

    spark-submit --master local[16] --driver-memory 16g \
      --py-files dist/engine.zip jobs/cluster_job.py \
      --input /data/points.parquet --output /tmp/clusters \
      --id-col id --x-col xm --y-col ym --eps 80 --min-pts 5

Prints ONE metrics JSON line on success. --summary additionally
commits <output>_summary (one row per cluster: size, bbox, role
mix) — the downstream join target when per-point rows are too big.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

for _v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True,
                    help="parquet path of the point table")
    ap.add_argument("--output", required=True,
                    help="icelite table path for per-point assignments")
    ap.add_argument("--id-col", default="id")
    ap.add_argument("--x-col", default="xm")
    ap.add_argument("--y-col", default="ym")
    ap.add_argument("--eps", type=int, default=80,
                    help="integer neighborhood radius (coordinate units)")
    ap.add_argument("--min-pts", type=int, default=5,
                    help="core threshold, self included")
    ap.add_argument("--summary", action="store_true",
                    help="also commit <output>_summary per-cluster stats")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from aef_mosaic_spark.operators.clustering import dbscan
    from aef_mosaic_spark.sources.icelite import Icelite

    spark = SparkSession.builder.getOrCreate()
    t0 = time.time()
    pts = spark.read.parquet(args.input)
    out = dbscan(pts, eps=args.eps, min_pts=args.min_pts,
                 id_col=args.id_col, x_col=args.x_col,
                 y_col=args.y_col).persist()

    roles = {r["role"]: r["n"] for r in
             out.groupBy("role").agg(F.count(F.lit(1)).alias("n"))
             .collect()}
    n_clusters = out.where(F.col("cluster_id").isNotNull()) \
        .select("cluster_id").distinct().count()

    props = {"config": json.dumps(
        {"eps": args.eps, "min_pts": args.min_pts,
         "id_col": args.id_col, "x_col": args.x_col,
         "y_col": args.y_col, "input": args.input},
        sort_keys=True)}
    snap_id = Icelite(args.output).append(
        out, properties=props,
        summary={"operation": "dbscan", **{f"n_{k}": v
                                           for k, v in roles.items()}})

    if args.summary:
        # bbox/size per cluster needs coordinates: one join of the
        # (id, cluster) assignment back to the (small-per-row) point
        # table, then a cluster-count-sized groupBy
        joined = out.where(F.col("cluster_id").isNotNull()).join(
            pts.select(F.col(args.id_col).alias("id"),
                       F.col(args.x_col).alias("_x"),
                       F.col(args.y_col).alias("_y")), "id")
        summ = joined.groupBy("cluster_id").agg(
            F.count(F.lit(1)).alias("n_points"),
            F.sum((F.col("role") == "core").cast("int")).alias("n_core"),
            F.min("_x").alias("min_x"), F.max("_x").alias("max_x"),
            F.min("_y").alias("min_y"), F.max("_y").alias("max_y"))
        Icelite(args.output + "_summary").append(
            summ, properties=props,
            summary={"operation": "dbscan-summary"})

    out.unpersist()
    print(json.dumps({
        "snapshot_id": snap_id, "wall_s": round(time.time() - t0, 3),
        "eps": args.eps, "min_pts": args.min_pts,
        "n_points": sum(roles.values()), "n_clusters": n_clusters,
        **{f"n_{k}": v for k, v in sorted(roles.items())},
    }))


if __name__ == "__main__":
    main()
