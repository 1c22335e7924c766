"""Spatial analytics job: run one point-analytics operator over a
points parquet and commit the result as a lineage-tracked icelite
table — the vector-side sibling of jobs/raster_job.py.

Usage:
  spark-submit --py-files dist/engine.zip jobs/analytics_job.py \
    --points /data/points.parquet --analysis hotspots \
    --output /tables/hotspots_w1
  # --analysis moran | hotspots | emerging | ripley | colocation
  #            | knn | huff
  # knn/huff need --sites <parquet> (site_id, [w,] lon, lat)
  # emerging needs a tb column (--tb-col) on the points
  # colocation needs a type column (--type-col)

Points schema: (point_id, lon, lat [, tb] [, etype]).  Output table
properties record the analysis, its full config, the input path and
row count — the same lineage contract as raster_job's derived
products.  Prints ONE metrics JSON line on success.
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

ANALYSES = ("moran", "hotspots", "emerging", "ripley", "colocation",
            "knn", "huff")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", required=True, help="points parquet")
    ap.add_argument("--output", required=True, help="output table path")
    ap.add_argument("--analysis", required=True, choices=ANALYSES)
    ap.add_argument("--sites", default=None,
                    help="sites parquet (knn / huff)")
    ap.add_argument("--cell-deg", type=int, default=8)
    ap.add_argument("--radius-deg", type=int, default=4)
    ap.add_argument("--k", type=int, default=3)
    ap.add_argument("--min-buckets", type=int, default=3)
    ap.add_argument("--tb-col", default="tb")
    ap.add_argument("--type-col", default="etype")
    ap.add_argument("--id-col", default="point_id")
    ap.add_argument("--weight-col", default="w")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    from aef_mosaic_spark.sources.icelite import Icelite

    if args.analysis in ("knn", "huff") and not args.sites:
        ap.error(f"--analysis {args.analysis} requires --sites")
    if os.path.exists(args.output):
        raise FileExistsError(
            f"{args.output} exists; analytics tables are cheap — "
            "write to a fresh path or remove the old table")

    spark = SparkSession.builder.getOrCreate()
    t0 = time.time()
    points = spark.read.parquet(args.points)
    n_in = points.count()
    cfg: dict = {"analysis": args.analysis}

    if args.analysis == "moran":
        from aef_mosaic_spark.operators.spatial_stats import (
            MORAN_CELL_DEGS, morans_i)
        out_df = morans_i(points)
        cfg.update(cell_degs=list(MORAN_CELL_DEGS))
    elif args.analysis == "hotspots":
        from aef_mosaic_spark.operators.spatial_stats import (
            getis_ord_hotspots)
        out_df = getis_ord_hotspots(points, cell_deg=args.cell_deg)
        cfg.update(cell_deg=args.cell_deg)
    elif args.analysis == "emerging":
        from aef_mosaic_spark.operators.spatial_stats import (
            emerging_hotspots)
        out_df = emerging_hotspots(points, cell_deg=args.cell_deg,
                                   min_buckets=args.min_buckets,
                                   group_col=args.tb_col)
        cfg.update(cell_deg=args.cell_deg, min_buckets=args.min_buckets,
                   tb_col=args.tb_col)
    elif args.analysis == "ripley":
        from aef_mosaic_spark.operators.spatial_stats import (
            RIPLEY_RADII_MDEG, ripley_k)
        out_df = ripley_k(points, id_col=args.id_col)
        cfg.update(radii_mdeg=list(RIPLEY_RADII_MDEG))
    elif args.analysis == "colocation":
        from aef_mosaic_spark.operators.spatial_stats import (
            colocation_patterns)
        out_df = colocation_patterns(points, type_col=args.type_col,
                                     id_col=args.id_col)
        cfg.update(type_col=args.type_col)
    elif args.analysis == "knn":
        from aef_mosaic_spark.operators.spatial_join import (
            spatial_knn_join)
        sites = spark.read.parquet(args.sites)
        out_df = spatial_knn_join(points, sites, k=args.k,
                                  radius_deg=args.radius_deg,
                                  point_id=args.id_col)
        cfg.update(k=args.k, radius_deg=args.radius_deg,
                   sites=args.sites)
    else:   # huff
        from aef_mosaic_spark.operators.interpolate import (
            huff_probabilities)
        sites = spark.read.parquet(args.sites)
        out_df = huff_probabilities(points, sites,
                                    weight_col=args.weight_col,
                                    radius_deg=args.radius_deg,
                                    point_id=args.id_col)
        cfg.update(radius_deg=args.radius_deg, sites=args.sites,
                   weight_col=args.weight_col)

    dst = Icelite(args.output)
    snap_id = dst.append(
        out_df,
        properties={
            "derived_from": args.points,
            "analysis": args.analysis,
            "analysis_config": json.dumps(cfg, sort_keys=True),
            "n_input_points": str(n_in),
        },
        summary={"operation": f"analytics-{args.analysis}"})
    n_out = dst.read(spark).count()
    print(json.dumps({
        "snapshot_id": snap_id, "analysis": args.analysis,
        "n_input": n_in, "rows_out": n_out,
        "wall_s": round(time.time() - t0, 3)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
