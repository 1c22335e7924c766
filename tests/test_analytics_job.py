"""analytics_job CLI: committed tables equal direct operator output;
lineage properties recorded; refusals."""

import json

import numpy as np
import pandas as pd
import pytest

from aef_mosaic_spark.sources.icelite import Icelite
from jobs.analytics_job import main as analytics_main


@pytest.fixture(scope="module")
def points_pq(spark, tmp_path_factory):
    rng = np.random.RandomState(4)
    n = 3000
    pdf = pd.DataFrame({
        "point_id": np.arange(n),
        "lon": rng.uniform(-60, 60, n),
        "lat": rng.uniform(-40, 40, n),
        "tb": rng.randint(0, 4, n),
        "etype": np.array(["A", "B", "C"])[rng.randint(0, 3, n)],
    })
    p = str(tmp_path_factory.mktemp("pts") / "points.parquet")
    spark.createDataFrame(pdf).write.parquet(p)
    return p


@pytest.fixture(scope="module")
def sites_pq(spark, tmp_path_factory):
    rng = np.random.RandomState(5)
    n = 200
    pdf = pd.DataFrame({
        "site_id": np.arange(n),
        "w": rng.randint(1, 50, n),
        "lon": rng.uniform(-60, 60, n),
        "lat": rng.uniform(-40, 40, n),
    })
    p = str(tmp_path_factory.mktemp("sts") / "sites.parquet")
    spark.createDataFrame(pdf).write.parquet(p)
    return p


def _rows(spark, path):
    return sorted(tuple(r) for r in Icelite(path).read(spark).collect())


def test_hotspots_analysis_matches_direct(spark, tmp_path, points_pq):
    from aef_mosaic_spark.operators.spatial_stats import (
        getis_ord_hotspots)
    out = str(tmp_path / "hot")
    analytics_main(["--points", points_pq, "--output", out,
                    "--analysis", "hotspots", "--cell-deg", "8"])
    got = _rows(spark, out)
    exp = sorted(tuple(r) for r in getis_ord_hotspots(
        spark.read.parquet(points_pq), cell_deg=8).collect())
    assert got == exp and len(got) > 0
    props = Icelite(out).properties()
    assert props["analysis"] == "hotspots"
    assert props["derived_from"] == points_pq
    assert json.loads(props["analysis_config"])["cell_deg"] == 8


def test_knn_analysis_matches_direct(spark, tmp_path, points_pq,
                                     sites_pq):
    from aef_mosaic_spark.operators.spatial_join import spatial_knn_join
    out = str(tmp_path / "knn")
    analytics_main(["--points", points_pq, "--output", out,
                    "--analysis", "knn", "--sites", sites_pq,
                    "--k", "2"])
    got = _rows(spark, out)
    exp = sorted(tuple(r) for r in spatial_knn_join(
        spark.read.parquet(points_pq), spark.read.parquet(sites_pq),
        k=2, radius_deg=4).collect())
    assert got == exp and len(got) > 0


def test_emerging_analysis_and_refusals(spark, tmp_path, points_pq):
    from aef_mosaic_spark.operators.spatial_stats import (
        emerging_hotspots)
    out = str(tmp_path / "emg")
    analytics_main(["--points", points_pq, "--output", out,
                    "--analysis", "emerging", "--cell-deg", "16"])
    got = _rows(spark, out)
    exp = sorted(tuple(r) for r in emerging_hotspots(
        spark.read.parquet(points_pq), cell_deg=16).collect())
    assert got == exp and len(got) > 0
    # existing output refused
    with pytest.raises(FileExistsError):
        analytics_main(["--points", points_pq, "--output", out,
                        "--analysis", "emerging"])
    # knn without sites refused at argparse level
    with pytest.raises(SystemExit):
        analytics_main(["--points", points_pq,
                        "--output", str(tmp_path / "x"),
                        "--analysis", "knn"])
