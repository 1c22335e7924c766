"""spark-submit entry point for the mosaic pipeline (north rule: the
whole job runs via `spark-submit --py-files dist/engine.zip` at two
cluster sizes).

  spark-submit --master local[8]  --py-files dist/engine.zip \\
      jobs/mosaic_job.py --generate 1200 --output /tmp/out --resume

On a real cluster the same invocation takes --master yarn/k8s and the
images come from an existing table (--images-dir) instead of the
deterministic generator.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

for _v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")  # see aef_mosaic_spark.session

from pyspark.sql import SparkSession


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--images-dir", help="parquet dir of the image+caption table")
    ap.add_argument("--generate", type=int, default=0,
                    help="generate N deterministic synthetic tiles instead")
    ap.add_argument("--output", required=True)
    ap.add_argument("--mode", default="mean", choices=["mean", "last", "weighted"])
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--analyze", action="store_true", help="plan-only report")
    ap.add_argument("--bounds", default="499000,4095000,530000,4125000")
    ap.add_argument("--crs", default="EPSG:32610")
    ap.add_argument("--resolution", type=float, default=10.0)
    ap.add_argument("--years", default="2023,2024")
    ap.add_argument("--shuffle-partitions", type=int, default=0)
    ap.add_argument("--no-warmup", action="store_true",
                    help="skip the python-worker warmup before timing")
    ap.add_argument("--composite-salt", type=int, default=0,
                    help=">1 enables the two-level skew-splitting compositor")
    ap.add_argument("--cluster-output", action="store_true",
                    help="Hilbert-cluster chunk rows in the sink")
    ap.add_argument("--progress-interval", type=float, default=None,
                    help="print active-stage task progress every N "
                         "seconds and report per-stage time in metrics")
    ap.add_argument("--approx-px", type=float, default=None,
                    help="opt-in approximate reprojection budget in "
                         "source pixels (reference uses 0.75); default "
                         "= exact per-pixel transform")
    ap.add_argument("--commit-groups", type=int, default=1,
                    help=">1 commits the run as K row-band snapshots "
                         "(incremental checkpointing: a crash loses at "
                         "most one band)")
    args = ap.parse_args(argv)

    from aef_mosaic_spark.grid import OutputGrid
    from aef_mosaic_spark.plans.pipeline import MosaicJob

    builder = SparkSession.builder.appName("aef-mosaic-run")
    if args.shuffle_partitions:
        builder = builder.config("spark.sql.shuffle.partitions",
                                 str(args.shuffle_partitions))
    builder = (
        builder.config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # bound per-batch worker memory for wide binary rows (the 10000
        # default makes ~270MB pandas batches -> allocation churn)
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "1024")
        .config("spark.executorEnv.OMP_NUM_THREADS", "1")
        .config("spark.executorEnv.OPENBLAS_NUM_THREADS", "1")
        .config("spark.executorEnv.MKL_NUM_THREADS", "1")
    )
    spark = builder.getOrCreate()

    bounds = tuple(float(v) for v in args.bounds.split(","))
    if len(bounds) != 4:
        ap.error(f"--bounds needs 4 comma-separated values "
                 f"(min_x,min_y,max_x,max_y), got {len(bounds)}")
    grid = OutputGrid(
        bounds=bounds,
        crs=args.crs,
        resolution=args.resolution,
        years=tuple(int(y) for y in args.years.split(",")),
        num_bands=3, chunk_h=256, chunk_w=256,
    )
    if args.generate:
        from aef_mosaic_spark.generator import images_df

        images = images_df(spark, args.generate)
        n_in = args.generate
    else:
        images = spark.read.parquet(args.images_dir)
        n_in = None

    if not args.no_warmup:
        # spawn + warm the python worker pool (imports numpy/pandas in
        # every worker) so the measured run reflects steady-state
        # throughput, not one-time process startup
        import pandas as pd  # noqa: F401

        def _noop(it):
            import numpy  # noqa: F401
            import pandas  # noqa: F401

            from aef_mosaic_spark import codecs, proj  # noqa: F401
            yield from it

        spark.range(256, numPartitions=256).mapInPandas(
            _noop, schema="id long").count()

    job = MosaicJob(grid, mode=args.mode, cluster_output=args.cluster_output,
                    composite_salt=args.composite_salt,
                    approx_px=args.approx_px)
    if args.analyze:
        print(json.dumps(job.analyze(spark, images)))
        return 0
    t0 = time.time()
    if args.commit_groups > 1:
        metrics = job.run_incremental(spark, images, args.output,
                                      groups=args.commit_groups,
                                      resume=args.resume)
    else:
        metrics = job.run(spark, images, args.output, resume=args.resume,
                          progress_interval_s=args.progress_interval)
    metrics["spark_master"] = spark.sparkContext.master
    metrics["n_input"] = n_in
    metrics["wall_total_s"] = round(time.time() - t0, 3)
    print(json.dumps(metrics))
    return 0


if __name__ == "__main__":
    sys.exit(main())
