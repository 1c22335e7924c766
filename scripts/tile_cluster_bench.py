"""Layout A/B: morton-clustered vs hash-ordered icelite files under a
bbox probe (BENCH 10l).

The 100 TB claim behind q121's morton key: a 1-D sort on the
space-filling curve gives every data file a NARROW [min, max] range in
BOTH tile_x and tile_y (curve locality), so icelite's manifest-stats
pruning answers a 2-D bbox probe by opening only the files whose tile
ranges overlap — the same data written in arrival (hash) order puts
the full key range in every file and must open all of them. Same
rows, same query, same filters; only the layout differs.

Probe cost is measured as files opened (df.inputFiles after manifest
pruning) + bytes on disk of those files + wall time of the filtered
aggregate; the row RESULT is asserted identical across layouts.

Usage: python scripts/tile_cluster_bench.py [n_rows] [n_files]
Prints one JSON line.
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, ".")

N_ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
N_FILES = int(sys.argv[2]) if len(sys.argv) > 2 else 64
BASE = "/dev/shm/tile_cluster_bench"
ZOOM = 12

# bbox probe ~ one metro area: 0.5 x 0.4 deg
BBOX = (-0.3, 51.3, 0.2, 51.7)   # lon_min, lat_min, lon_max, lat_max


def _tile_range(bbox, zoom):
    import math
    n = 1 << zoom

    def t(lon, lat):
        ilon = math.floor(lon * 1e6 + 0.5)
        ilat = max(min(math.floor(lat * 1e6 + 0.5), 85_051_128),
                   -85_051_128)
        tx = min((ilon + 180_000_000) * n // 360_000_000, n - 1)
        latr = (ilat / 1e6) * math.pi / 180.0
        yfrac = (1.0 - math.log(math.tan(math.pi / 4 + latr / 2))
                 / math.pi) / 2.0
        ty = min(math.floor(yfrac * 1e7 + 0.5) * n // 10_000_000, n - 1)
        return tx, ty

    x0, y1 = t(bbox[0], bbox[1])   # south-west: max y (y grows south)
    x1, y0 = t(bbox[2], bbox[3])
    return (x0, x1), (y0, y1)


def main():
    from pyspark.sql import functions as F

    from aef_mosaic_spark.functions.tiles import with_tile_keys
    from aef_mosaic_spark.session import get_spark
    from aef_mosaic_spark.sources.icelite import Icelite

    shutil.rmtree(BASE, ignore_errors=True)
    os.makedirs(BASE)
    spark = get_spark(app_name="tile-cluster-bench", master="local[16]",
                      extra_conf={"spark.sql.shuffle.partitions":
                                  str(N_FILES)})
    # deterministic global point cloud, densified around cities so the
    # probe bbox holds a realistic share of rows
    pts = spark.range(N_ROWS).selectExpr(
        "id AS point_id",
        "CASE WHEN id % 5 = 0 THEN -0.4e0 + ((id * 2654435761) % 1000000) / 1000000e0 "
        "     ELSE ((id * 2654435761) % 360000000) / 1000000e0 - 180e0 END AS lon",
        "CASE WHEN id % 5 = 0 THEN 51.2e0 + ((id * 40503) % 600000) / 1000000e0 "
        "     ELSE ((id * 40503) % 170000000) / 1000000e0 - 85e0 END AS lat")
    keyed = with_tile_keys(pts, zoom=ZOOM)

    t_rand = Icelite(os.path.join(BASE, "hash_order"))
    t_rand.append(keyed.repartition(N_FILES, "point_id"))
    t_clus = Icelite(os.path.join(BASE, "morton_clustered"))
    t_clus.append(keyed.repartition(N_FILES, "point_id"))
    t_clus.compact(spark, cluster_by=["morton"], target_files=N_FILES)

    (xlo, xhi), (ylo, yhi) = _tile_range(BBOX, ZOOM)
    filters = {"tile_x": (xlo, xhi), "tile_y": (ylo, yhi)}

    out = {"n_rows": N_ROWS, "n_files": N_FILES, "zoom": ZOOM,
           "bbox": BBOX, "tile_x": [xlo, xhi], "tile_y": [ylo, yhi]}
    results = {}
    for name, tbl in (("hash_order", t_rand), ("morton_clustered", t_clus)):
        t0 = time.time()
        df = tbl.read(spark, filters=filters) \
            .where((F.col("tile_x") >= xlo) & (F.col("tile_x") <= xhi)
                   & (F.col("tile_y") >= ylo) & (F.col("tile_y") <= yhi))
        row = df.agg(F.count("*").alias("n"),
                     F.sum("point_id").alias("s")).collect()[0]
        wall = round(time.time() - t0, 2)
        files = df.inputFiles()
        results[name] = (row.n, row.s)
        out[name] = {
            "files_opened": len(files),
            "mb_opened": round(sum(
                os.path.getsize(f.replace("file:", "")) for f in files)
                / 1e6, 1),
            "rows_out": row.n, "wall_s": wall,
        }
    assert results["hash_order"] == results["morton_clustered"], results
    a, b = out["hash_order"], out["morton_clustered"]
    out["prune_ratio_files"] = round(
        a["files_opened"] / max(b["files_opened"], 1), 1)
    out["prune_ratio_mb"] = round(a["mb_opened"] / max(b["mb_opened"], 0.1), 1)
    print(json.dumps(out))
    shutil.rmtree(BASE, ignore_errors=True)


if __name__ == "__main__":
    main()
