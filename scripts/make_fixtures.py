"""Materialize the golden fixture tables (FIXTURES.md §3) from the
NumPy oracle into fixtures/ — committed artifacts that pin the
engine's semantics across rounds (any change to assignment,
reprojection, compositing, or kNN ranking breaks
tests/test_golden_fixtures.py)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from aef_mosaic_spark import generator, oracle
from aef_mosaic_spark.grid import OutputGrid

N_TILES = 60
GRID = OutputGrid(
    bounds=(499000.0, 4095000.0, 509240.0, 4105240.0),
    crs="EPSG:32610", resolution=10.0, years=(2023, 2024),
    num_bands=3, chunk_h=256, chunk_w=256,
)
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "fixtures")


def main():
    os.makedirs(OUT, exist_ok=True)
    images = generator.images_pdf(N_TILES)

    a = sorted(oracle.oracle_assignments(images, GRID))
    pq.write_table(pa.table({
        "image_id": [x[0] for x in a],
        "time_idx": pa.array([x[1] for x in a], pa.int32()),
        "row_idx": pa.array([x[2] for x in a], pa.int32()),
        "col_idx": pa.array([x[3] for x in a], pa.int32()),
    }), f"{OUT}/golden_assignments.parquet")

    for mode in ("mean", "last"):
        m = oracle.oracle_mosaic(images, GRID, mode=mode)
        keys = sorted(m)
        pq.write_table(pa.table({
            "time_idx": pa.array([k[0] for k in keys], pa.int32()),
            "row_idx": pa.array([k[1] for k in keys], pa.int32()),
            "col_idx": pa.array([k[2] for k in keys], pa.int32()),
            "chunk_bytes": [m[k]["canvas"].tobytes() for k in keys],
            "n_tiles": pa.array([m[k]["n_tiles"] for k in keys], pa.int32()),
            "valid_px": pa.array([m[k]["valid_px"] for k in keys], pa.int64()),
        }), f"{OUT}/golden_chunks_{mode}.parquet")

    # golden kNN: exact Hamming top-5 over the generated phashes
    ph = images.phash.to_numpy(np.int64)
    ids = images.image_id.tolist()
    rows = []
    M64 = (1 << 64) - 1  # phash is signed int64; Hamming over 64 bits

    for qi in range(10):
        d = [(((int(ph[qi]) ^ int(ph[j])) & M64).bit_count(), ids[j])
             for j in range(len(ids)) if j != qi]
        for rank, (dist, iid) in enumerate(sorted(d)[:5], start=1):
            rows.append((ids[qi], iid, rank, dist))
    pq.write_table(pa.table({
        "query_id": [r[0] for r in rows],
        "neighbor_id": [r[1] for r in rows],
        "rank": pa.array([r[2] for r in rows], pa.int32()),
        "dist": pa.array([r[3] for r in rows], pa.int32()),
    }), f"{OUT}/golden_knn.parquet")
    print(f"fixtures written to {OUT}")


if __name__ == "__main__":
    main()
