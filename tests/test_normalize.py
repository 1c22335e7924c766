"""S3 synonym-resolution normalization (reference
input_index.rs:215-318: flexible column names, type coercion,
defaults, hard error on missing required)."""

import pandas as pd
import pytest

from aef_mosaic_spark.operators.normalize import normalize_index


def test_synonyms_coercion_defaults(spark):
    raw = spark.createDataFrame(pd.DataFrame({
        "fid": [1, 2],                      # int tile_id -> string
        "uri": ["s3://b/1.tif", "s3://b/2.tif"],
        "xmin": pd.array([1.0, 2.0], dtype="float32"),  # f32 -> f64
        "ymin": pd.array([1.0, 2.0], dtype="float32"),
        "xmax": pd.array([3.0, 4.0], dtype="float32"),
        "ymax": pd.array([3.0, 4.0], dtype="float32"),
        "extra": ["a", "b"],                # passthrough
    }))
    out = normalize_index(raw)
    assert dict(out.dtypes)["tile_id"] == "string"
    assert dict(out.dtypes)["min_x"] == "double"
    rows = {r.tile_id: r for r in out.collect()}
    assert rows["1"].path == "s3://b/1.tif"
    assert rows["1"].resolution == 10.0  # default (input_index.rs:295-299)
    assert rows["1"].year == 2024        # default (input_index.rs:334-347)
    assert rows["2"].extra == "b"


def test_first_synonym_wins(spark):
    raw = spark.createDataFrame(pd.DataFrame({
        "tile_id": ["a"], "id": ["b"],
        "path": ["p1"], "url": ["p2"],
    }))
    r = normalize_index(raw).collect()[0]
    assert r.tile_id == "a" and r.path == "p1"


def test_missing_required_raises(spark):
    raw = spark.createDataFrame(pd.DataFrame({"foo": [1]}))
    with pytest.raises(ValueError, match="tile_id"):
        normalize_index(raw)
