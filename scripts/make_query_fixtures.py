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
          "q76_overview_chunks", "q78_training_patches"]
FIX = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "fixtures")


def main():
    spark = get_spark(app_name="make-query-fixtures", master="local[16]",
                      extra_conf={"spark.sql.shuffle.partitions": "16"})
    qs = entrymod.queries()
    os.makedirs(FIX, exist_ok=True)
    for name in PINNED:
        # sf dir is irrelevant for these queries (generator-derived
        # inputs) but the callable signature requires one
        pdf = qs[name](spark, "/root/testdata/sf0.001").toPandas()
        pdf = pdf.sort_values(list(pdf.columns)).reset_index(drop=True)
        out = os.path.join(FIX, f"golden_{name}.parquet")
        pdf.to_parquet(out, index=False)
        print(f"wrote {out}: {len(pdf)} rows, cols={list(pdf.columns)}")


if __name__ == "__main__":
    main()
