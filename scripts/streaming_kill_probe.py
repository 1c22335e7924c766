"""Streaming resilience probe: kill an executor DURING the streaming
ingest on local-cluster[2,4,4096] and verify exactly-once.

The incremental pipeline (readStream -> patch reprojection ->
foreachBatch icelite appends, idempotent on batch_id) must survive an
executor SIGKILL mid-stream: Spark retries the microbatch's tasks on
the relaunched executor, the batch_id dedup absorbs any foreachBatch
replay, and the compacted chunks must be bit-exact with the one-shot
batch mosaic of the same tiles.

Usage: spark-submit --master local-cluster[2,4,4096] \\
         --py-files dist/engine.zip scripts/streaming_kill_probe.py
(or just `python scripts/streaming_kill_probe.py`, which execs
spark-submit itself). Prints one JSON verdict line; exit 0 on success.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import threading
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _kill_one_executor_soon(delay_s: float = 8.0):
    def _run():
        time.sleep(delay_s)
        out = subprocess.run(
            ["pgrep", "-f", "CoarseGrainedExecutorBackend"],
            capture_output=True, text=True).stdout.split()
        if out:
            os.kill(int(out[0]), 9)
            print(f"[probe] killed executor pid {out[0]}", file=sys.stderr)

    t = threading.Thread(target=_run, daemon=True)
    t.start()
    return t


def probe():
    sys.path.insert(0, ROOT)
    import shutil

    from pyspark.sql import SparkSession

    from aef_mosaic_spark import generator
    from aef_mosaic_spark.grid import OutputGrid
    from aef_mosaic_spark.operators import mosaic as M
    from aef_mosaic_spark.streaming import ingest as SI

    spark = (SparkSession.builder.appName("streaming-kill-probe")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .getOrCreate())
    base = "/tmp/stream_kill_probe"
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(base)
    grid = OutputGrid(bounds=(499000.0, 4095000.0, 509240.0, 4105240.0),
                      crs="EPSG:32610", resolution=10.0, years=(2023, 2024),
                      num_bands=3, chunk_h=256, chunk_w=256)
    images = spark.createDataFrame(generator.images_pdf(60),
                                   generator.IMAGE_SCHEMA)
    want = {(r.time_idx, r.row_idx, r.col_idx): bytes(r.chunk)
            for r in M.mosaic(images, grid, mode="mean").collect()}

    in_dir = f"{base}/in"
    images.repartition(6).write.parquet(in_dir)  # 6 microbatch files
    stream = SI.read_image_stream(spark, in_dir, max_files_per_trigger=1)
    _kill_one_executor_soon(8.0)
    SI.stream_patches_to_table(stream, grid, f"{base}/patches",
                               f"{base}/ckpt", timeout_s=600)
    got = {(r.time_idx, r.row_idx, r.col_idx): bytes(r.chunk)
           for r in SI.compact_chunks(spark, f"{base}/patches", grid).collect()}
    ok = got == want and len(want) > 0
    print(json.dumps({"chunks": len(want), "bit_identical": got == want,
                      "ok": ok}))
    shutil.rmtree(base, ignore_errors=True)
    return 0 if ok else 1


def main():
    if os.environ.get("SPARK_ENV_LOADED") or "pyspark" in sys.modules:
        return probe()
    # not under spark-submit yet: exec ourselves on local-cluster
    cmd = ["spark-submit", "--master", "local-cluster[2,4,4096]",
           "--driver-memory", "8g",
           "--conf", "spark.local.dir=/dev/shm/spark-local",
           "--py-files", os.path.join(ROOT, "dist/engine.zip"),
           os.path.abspath(__file__)]
    return subprocess.call(cmd)


if __name__ == "__main__":
    sys.exit(main())
