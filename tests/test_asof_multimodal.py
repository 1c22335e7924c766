"""asof_join operator vs pandas.merge_asof; multimodal plumbing."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from aef_mosaic_spark import codecs, generator
from aef_mosaic_spark.functions import multimodal as MM
from aef_mosaic_spark.operators.asof import asof_join


def test_asof_backward_matches_pandas(spark):
    rng = np.random.RandomState(11)
    left = pd.DataFrame({
        "lid": np.arange(300),
        "k": rng.randint(0, 5, 300),
        "t": rng.randint(0, 1000, 300),
    }).astype({"t": "int64"})
    right = pd.DataFrame({
        "k": rng.randint(0, 5, 80),
        "t": rng.randint(0, 1000, 80),
        "val": rng.randint(0, 100, 80).astype("int64"),
    })
    # drop duplicate (k, t) on the right: at equal keys+times the
    # matched row is ambiguous in both engines
    right = right.drop_duplicates(["k", "t"])
    got = asof_join(
        spark.createDataFrame(left), spark.createDataFrame(right),
        left_on="t", right_on="t", left_by="k", right_by="k",
        value_cols=["val"],
    ).toPandas().sort_values("lid").reset_index(drop=True)
    want = pd.merge_asof(
        left.sort_values("t", kind="stable"), right.sort_values("t"),
        on="t", by="k", direction="backward",
    ).sort_values("lid").reset_index(drop=True)
    assert (got["asof_val"].fillna(-1) == want["val"].fillna(-1)).all()


def test_asof_forward(spark):
    left = pd.DataFrame({"lid": [1, 2, 3], "k": [1, 1, 1], "t": [5, 15, 25]})
    right = pd.DataFrame({"k": [1, 1], "t": [10, 20], "val": [100, 200]})
    got = {r.lid: r.asof_val for r in asof_join(
        spark.createDataFrame(left), spark.createDataFrame(right),
        left_on="t", right_on="t", left_by="k", right_by="k",
        value_cols=["val"], direction="forward").collect()}
    assert got == {1: 100, 2: 200, 3: None}


def test_audio_features_plumbing(spark):
    pdf = pd.DataFrame({
        "audio_id": ["a1", "a2"],
        "bytes": [b"payload-1", b"payload-2"],
        "sample_rate": [8000, 8000],
        "n_channels": [1, 1],
        "fmt": ["wav", "wav"],
        "caption": ["first clip", "second clip"],
    })
    out = MM.audio_features(spark.createDataFrame(pdf, MM.AUDIO_SCHEMA)).collect()
    by_id = {r.audio_id: r for r in out}
    assert by_id["a1"].n_samples == 4096
    assert 0 < by_id["a1"].rms < 1
    assert by_id["a1"].caption == "first clip"  # caption invariant
    # deterministic
    out2 = MM.audio_features(spark.createDataFrame(pdf, MM.AUDIO_SCHEMA)).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))


def test_audio_real_decode_is_marked_stub(spark):
    with pytest.raises(NotImplementedError):
        MM._decode_audio_impl(b"x", "wav", 8000, 1)


def test_frame_sampling_plumbing(spark):
    pdf = pd.DataFrame({
        "video_id": ["v1"], "bytes": [b"video-payload"],
        "w": [16], "h": [8], "fps": [30.0], "n_frames": [25],
        "fmt": ["mp4"], "caption": ["clip"],
    })
    rows = MM.sample_frames(spark.createDataFrame(pdf, MM.VIDEO_SCHEMA),
                            every_n=10).collect()
    assert [r.frame_idx for r in sorted(rows, key=lambda r: r.frame_idx)] == [0, 10, 20]
    f = np.frombuffer(rows[0].frame, np.uint8).reshape(3, 8, 16)
    assert f.min() >= 20


def test_resize_images_real(spark):
    images = spark.createDataFrame(generator.images_pdf(6),
                                   schema=generator.IMAGE_SCHEMA)
    out = MM.resize_images(images, 32, 32).collect()
    assert len(out) == 6
    for r in out:
        img = np.frombuffer(r.bytes, np.uint8).reshape(3, 32, 32)
        assert r.fmt == "raw" and img.shape == (3, 32, 32)
        assert r.phash == codecs.phash64(img)


def test_image_integrity_corruption_matrix(spark):
    """Decode-free integrity check vs the pinned corrupted fixture:
    each corruption class (mod-16 residue, scripts/make_query_fixtures)
    is caught exactly where the declared fmt allows — and the
    documented blind spots (truncated png/qdct, flipped raw byte,
    lying w on png) stay ok=True, honestly."""
    from aef_mosaic_spark.functions.multimodal import image_integrity_cols

    imgs = spark.read.parquet("fixtures/images_bytes_240.parquet")
    cols = image_integrity_cols(F.col("bytes"), F.col("w"),
                                F.col("h"), F.col("fmt"))
    rows = imgs.select("image_id", "fmt",
                       *[c.alias(n) for n, c in cols.items()]).collect()
    assert len(rows) == 240
    # expectations[(class, fmt)] = (header_ok, size_ok)
    exp = {
        (0, "raw"): (True, True), (0, "png"): (True, True),
        (0, "ppm"): (True, True), (0, "qdct"): (True, True),
        # truncation: exact-size fmts catch it; png/qdct cannot
        (1, "raw"): (True, False), (1, "ppm"): (True, False),
        (1, "png"): (True, True), (1, "qdct"): (True, True),
        # flipped first byte: every headered fmt catches it; raw cannot
        (2, "raw"): (True, True), (2, "png"): (False, True),
        (2, "ppm"): (False, True), (2, "qdct"): (False, True),
        # lying w: raw/ppm by size, ppm/qdct by header; png cannot
        (3, "raw"): (True, False), (3, "png"): (True, True),
        (3, "ppm"): (False, False), (3, "qdct"): (False, True),
    }
    for r in rows:
        i = int(r["image_id"].split("_")[1])
        cls = (i % 16) // 4
        want_h, want_s = exp[(cls, r["fmt"])]
        assert r["header_ok"] is want_h, (r["image_id"], r["fmt"], cls)
        assert r["size_ok"] is want_s, (r["image_id"], r["fmt"], cls)
        assert r["ok"] is (want_h and want_s)
    # every corruption class is detected on at least one fmt, and the
    # clean class is clean everywhere
    caught = {cls for (cls, _), (h, s) in exp.items() if not (h and s)}
    assert caught == {1, 2, 3}
