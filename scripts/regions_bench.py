"""Incremental region maintenance vs full relabel (BENCH 10o).

A G x G chunk table (64x64 single-band chunks, deterministic two-blob
masks, some blobs straddling chunk borders) is committed to icelite;
the full --stage regions derivation persists the fragment index; then
K chunks are MERGE-updated in the source and the incremental path
(CDC -> fragments for changed chunks only -> group-replace merge ->
fragment-sized re-assemble) is timed against a from-scratch
label_regions of the updated table. Region outputs are asserted
identical.

Usage: python scripts/regions_bench.py [grid_n] [n_changed]
Prints one JSON line.
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, ".")

GRID_N = int(sys.argv[1]) if len(sys.argv) > 1 else 40
N_CHANGED = int(sys.argv[2]) if len(sys.argv) > 2 else 16
BASE = "/dev/shm/regions_bench"
CH = 256


def _chunk_bytes_expr():
    """mapInPandas generator: per chunk, a deterministic mask with a
    filled square whose position/size hash from the key; ~1/3 of
    squares touch the chunk border so stitching is exercised."""
    import numpy as np
    import pandas as pd

    def gen(it):
        for pdf in it:
            rows = []
            for t in pdf.itertuples(index=False):
                ri, ci = int(t.row_idx), int(t.col_idx)
                h = (ri * 1000003 + ci * 7919) & 0x7FFFFFFF
                # coarse noise upsampled 8x: chunky multi-region
                # masks whose blobs regularly touch chunk borders
                rng = np.random.RandomState(h)
                coarse = rng.rand(CH // 8, CH // 8) < 0.35
                a = np.where(np.kron(coarse, np.ones((8, 8), bool)),
                             np.uint8(200), np.uint8(0))
                rows.append((0, ri, ci, a[None].tobytes()))
            yield pd.DataFrame(rows, columns=[
                "time_idx", "row_idx", "col_idx", "chunk"])
    return gen


def main():
    from pyspark.sql import functions as F

    import jobs.raster_job as RJ
    from aef_mosaic_spark.grid import OutputGrid
    from aef_mosaic_spark.operators.regions import label_regions
    from aef_mosaic_spark.session import get_spark
    from aef_mosaic_spark.sources.icelite import Icelite

    shutil.rmtree(BASE, ignore_errors=True)
    os.makedirs(BASE)
    src_path, out_path = f"{BASE}/mosaic", f"{BASE}/regions"
    spark = get_spark("regions-bench", master="local[16]",
                      extra_conf={"spark.sql.shuffle.partitions": "64"})
    grid = OutputGrid(
        bounds=(0.0, 0.0, GRID_N * CH * 10.0, GRID_N * CH * 10.0),
        crs="EPSG:32610", resolution=10.0, years=(2023,),
        num_bands=1, chunk_h=CH, chunk_w=CH)
    keys = (spark.range(GRID_N * GRID_N)
            .selectExpr(f"CAST(id div {GRID_N} AS INT) AS row_idx",
                        f"CAST(id % {GRID_N} AS INT) AS col_idx"))
    chunks = keys.mapInPandas(
        _chunk_bytes_expr(),
        schema="time_idx int, row_idx int, col_idx int, chunk binary")
    src_t = Icelite(src_path)
    src_t.append(chunks.repartition(32), partition_by=["time_idx"],
                 properties={"grid": json.dumps(grid.to_dict())})

    t0 = time.time()
    RJ.main(["--table", src_path, "--output", out_path,
             "--stage", "regions", "--threshold", "128"])
    t_full = round(time.time() - t0, 2)
    n_regions = Icelite(out_path).read(spark).count()

    # update N_CHANGED chunks: clear half, move the blob in the rest
    import numpy as np
    import pandas as pd
    upd_rows = []
    for i in range(N_CHANGED):
        ri, ci = (i * 7) % GRID_N, (i * 13) % GRID_N
        a = np.zeros((CH, CH), np.uint8)
        if i % 2:
            a[5:100, 5:100] = 200
        upd_rows.append((0, ri, ci, a[None].tobytes()))
    upd = spark.createDataFrame(
        pd.DataFrame(upd_rows, columns=[
            "time_idx", "row_idx", "col_idx", "chunk"]))
    src_t.merge(spark, upd, key_cols=["time_idx", "row_idx", "col_idx"],
                partition_by=["time_idx"])

    t0 = time.time()
    RJ.main(["--table", src_path, "--output", out_path,
             "--stage", "regions", "--threshold", "128",
             "--incremental"])
    t_inc = round(time.time() - t0, 2)

    got = {tuple(r) for r in Icelite(out_path).read(spark).collect()}
    want = {tuple(r) for r in label_regions(
        src_t.read(spark), grid, threshold=128).collect()}
    assert got == want, "incremental != from-scratch"

    print(json.dumps({
        "chunks": GRID_N * GRID_N, "changed": N_CHANGED,
        "regions": len(got), "regions_before": n_regions,
        "full_s": t_full, "incremental_s": t_inc,
        "speedup": round(t_full / t_inc, 2),
    }))
    shutil.rmtree(BASE, ignore_errors=True)


if __name__ == "__main__":
    main()
