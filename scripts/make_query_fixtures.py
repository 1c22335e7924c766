"""Regenerate the pinned-query golden fixtures (fixtures/golden_q*.parquet).

These pin the OUTPUT of the deterministic, sf-independent queries
(q30/q31/q32/q40/q41) so the DuckDB oracle can hash-check them — the
reference's own test style of pinning real numbers
(/root/reference/src/index/output_grid.rs:797-853). Run ONLY when the
semantics change on purpose; a surprise diff is a regression.

Usage: python scripts/make_query_fixtures.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")

import __spark_entry__ as entrymod  # noqa: E402
from aef_mosaic_spark.session import get_spark  # noqa: E402

PINNED = ["q30_mosaic_chunks", "q31_mosaic_last_on_top",
          "q32_image_assignments", "q40_resize_images",
          "q41_audio_features", "q55_video_frames",
          "q76_overview_chunks", "q78_training_patches",
          "q104_mosaic_median", "q105_rasterize_boxes",
          "q106_focal_chunks", "q108_temporal_composite",
          "q109_histogram_stretch", "q112_terrain",
          "q115_temporal_trend", "q116_aspect", "q123_temporal_change",
          "q127_image_stats", "q136_region_labels",
          "q141_cluster_hulls", "q146_d8_flow", "q148_flow_accumulation",
          "q149_focal_median", "q150_distance_transform",
          "q166_contour_segments", "q171_morphology",
          "q172_histogram_match", "q175_otsu_mask", "q176_sieve",
          "q184_basin_labels", "q185_mask_agreement",
          "q190_texture_stats", "q193_raster_correlation",
          "q195_focal_tri", "q197_orientation_histogram"]
FIX = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "fixtures")


def make_images_bytes_fixture(n: int = 240) -> str:
    """INPUT fixture for q101_image_integrity: generator images with
    real encoded bytes plus deterministic corruptions (pure function
    of the index, so regeneration is byte-identical). fmt cycles with
    period 4 (raw/png/ppm/qdct), so classes are chosen mod 16 — every
    corruption class hits every fmt:
      i % 16 in 4..7   -> last 5 bytes truncated
      i % 16 in 8..11  -> first byte bit-flipped
      i % 16 in 12..15 -> declared w off by one (metadata lies)
      i % 16 in 0..3   -> clean
    """
    from aef_mosaic_spark.generator import images_pdf

    pdf = images_pdf(n)[["image_id", "bytes", "w", "h", "fmt",
                         "caption"]].copy()
    for i in range(n):
        cls = (i % 16) // 4
        if cls == 1:
            pdf.at[i, "bytes"] = pdf.at[i, "bytes"][:-5]
        elif cls == 2:
            b = bytearray(pdf.at[i, "bytes"])
            b[0] ^= 0xFF
            pdf.at[i, "bytes"] = bytes(b)
        elif cls == 3:
            pdf.at[i, "w"] = int(pdf.at[i, "w"]) + 1
    out = os.path.join(FIX, f"images_bytes_{n}.parquet")
    pdf.to_parquet(out, index=False)
    print(f"wrote {out}: {len(pdf)} rows")
    return out


def main():
    # optional argv filter: regenerate only the named fixtures
    only = set(sys.argv[1:])
    if not only:
        make_images_bytes_fixture()
    spark = get_spark(app_name="make-query-fixtures", master="local[16]",
                      extra_conf={"spark.sql.shuffle.partitions": "16"})
    qs = entrymod.queries()
    os.makedirs(FIX, exist_ok=True)
    for name in PINNED:
        if only and name not in only:
            continue
        # sf dir is irrelevant for these queries (generator-derived
        # inputs) but the callable signature requires one
        pdf = qs[name](spark, "/root/testdata/sf0.001").toPandas()
        pdf = pdf.sort_values(list(pdf.columns)).reset_index(drop=True)
        out = os.path.join(FIX, f"golden_{name}.parquet")
        pdf.to_parquet(out, index=False)
        print(f"wrote {out}: {len(pdf)} rows, cols={list(pdf.columns)}")


if __name__ == "__main__":
    main()
