"""Engine output vs the COMMITTED golden fixtures (FIXTURES.md §3) —
pins assignment/reprojection/compositing/kNN semantics across rounds.
Regenerate deliberately with scripts/make_fixtures.py if semantics
change on purpose."""

import os

import pandas as pd
import pyarrow.parquet as pq
import pytest

from aef_mosaic_spark import generator
from aef_mosaic_spark.grid import OutputGrid
from aef_mosaic_spark.operators import knn as K
from aef_mosaic_spark.operators import mosaic as M

FIX = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "fixtures")
GRID = OutputGrid(
    bounds=(499000.0, 4095000.0, 509240.0, 4105240.0),
    crs="EPSG:32610", resolution=10.0, years=(2023, 2024),
    num_bands=3, chunk_h=256, chunk_w=256,
)


@pytest.fixture(scope="module")
def images_sdf(spark):
    return spark.createDataFrame(generator.images_pdf(60),
                                 generator.IMAGE_SCHEMA)


def test_assignments_match_golden(spark, images_sdf):
    want = {tuple(r) for r in
            pq.read_table(f"{FIX}/golden_assignments.parquet").to_pylist()
            for r in [(r["image_id"], r["time_idx"], r["row_idx"], r["col_idx"])]}
    got = {(r.image_id, r.time_idx, r.row_idx, r.col_idx)
           for r in M.assignments(images_sdf, GRID).collect()}
    assert got == want


@pytest.mark.parametrize("mode", ["mean", "last"])
def test_chunks_match_golden(spark, images_sdf, mode):
    g = pq.read_table(f"{FIX}/golden_chunks_{mode}.parquet").to_pylist()
    want = {(r["time_idx"], r["row_idx"], r["col_idx"]):
            (r["chunk_bytes"], r["n_tiles"], r["valid_px"]) for r in g}
    got = {(r.time_idx, r.row_idx, r.col_idx):
           (bytes(r.chunk), r.n_tiles, r.valid_px)
           for r in M.mosaic(images_sdf, GRID, mode=mode).collect()}
    assert set(got) == set(want)
    for k in want:
        assert got[k][1] == want[k][1] and got[k][2] == want[k][2], k
        assert got[k][0] == bytes(want[k][0]), k


def test_knn_matches_golden(spark, images_sdf):
    g = pq.read_table(f"{FIX}/golden_knn.parquet").to_pylist()
    want = {(r["query_id"], r["neighbor_id"], r["rank"], r["dist"]) for r in g}
    qids = sorted({r["query_id"] for r in g})
    queries = images_sdf.where(images_sdf.image_id.isin(qids)).selectExpr(
        "image_id AS query_id", "phash")
    items = images_sdf.selectExpr("image_id AS item_id", "phash")
    got = {(r.query_id, r.item_id, r.rank, r.dist)
           for r in K.knn_hamming_exact(queries, items, k=5).collect()}
    assert got == want
