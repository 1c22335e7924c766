"""N-vs-4N core scaling pair for temporal_trend (BENCH 10k).

Same-session back-to-back A/B (the host drifts ~50% across a day, so
only paired runs are valid — CLAUDE.md): a deterministic T-layer
chunk stack is written once to /dev/shm parquet, then the per-pixel
OLS trend runs at local[4] and local[16], median of `reps`, forced by
an aggregate OVER the output bytes (never a bare count — Catalyst
cannot eliminate the applyInPandas stage, but the crc32 agg also
guards against partial-column pruning).

Usage: python scripts/trend_bench.py [reps]   (default 3)
Prints one JSON line.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402

CHH = CHW = 128
NB = 3
N_ROWS = N_COLS = 48
T = 8


def _write_stack(path: str) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq
    rows = {"time_idx": [], "row_idx": [], "col_idx": [], "chunk": []}
    yy, xx = np.mgrid[0:CHH, 0:CHW]
    for t in range(T):
        for ri in range(N_ROWS):
            for ci in range(N_COLS):
                arr = np.stack([
                    ((yy * 3 + xx * 5 + t * (ri + ci + b) + 1) % 251
                     ).astype(np.uint8) for b in range(NB)])
                rows["time_idx"].append(t)
                rows["row_idx"].append(ri)
                rows["col_idx"].append(ci)
                rows["chunk"].append(arr.tobytes())
    pq.write_table(pa.table(rows), path)


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    from aef_mosaic_spark.grid import OutputGrid
    from aef_mosaic_spark.operators.mosaic import temporal_trend
    from aef_mosaic_spark.session import get_spark

    path = "/dev/shm/trend_bench_stack.parquet"
    if not os.path.exists(path):
        _write_stack(path)

    grid = OutputGrid(
        bounds=(0.0, 0.0, CHW * N_COLS * 10.0, CHH * N_ROWS * 10.0),
        crs="EPSG:32610", resolution=10.0, years=tuple(range(2016, 2016 + T)),
        num_bands=NB, chunk_h=CHH, chunk_w=CHW)

    out = {}
    sums = set()
    for master, sp in (("local[4]", 16), ("local[16]", 64)):
        spark = get_spark(app_name="trend-bench", master=master,
                          extra_conf={"spark.sql.shuffle.partitions": str(sp)})
        from pyspark.sql import functions as F
        # NO .persist(): MEMORY-caching ~1 GB of deserialized binary
        # rows degrades GEOMETRICALLY per action at local[16] on this
        # host (9.5 -> 17 -> 60 s; same signature as BENCH 9c) while
        # the raw parquet re-scan is served by the OS page cache at a
        # flat ~7 s. Warm the page cache + python worker pool off the
        # clock instead.
        src = spark.read.parquet(path)
        temporal_trend(src, grid, chunk_col="chunk") \
            .agg(F.sum(F.crc32(F.col("slope_bytes")))).collect()
        times = []
        for _ in range(reps):
            t0 = time.time()
            row = (temporal_trend(src, grid, chunk_col="chunk")
                   .agg(F.sum(F.crc32(F.col("slope_bytes"))).alias("s"),
                        F.sum("fit_px").alias("fp")).collect()[0])
            times.append(round(time.time() - t0, 2))
            sums.add((row.s, row.fp))
        out[master] = sorted(times)
        spark.stop()
    assert len(sums) == 1, f"results differ across runs: {sums}"
    med4 = out["local[4]"][len(out["local[4]"]) // 2]
    med16 = out["local[16]"][len(out["local[16]"]) // 2]
    print(json.dumps({
        "chunks": T * N_ROWS * N_COLS, "groups": N_ROWS * N_COLS,
        "t_layers": T, "reps": reps, "times": out,
        "median_4": med4, "median_16": med16,
        "speedup": round(med4 / med16, 2),
        "efficiency": round(med4 / med16 / 4.0, 3),
        "checksum": list(sums)[0][0],
    }))
    os.unlink(path)


if __name__ == "__main__":
    main()
