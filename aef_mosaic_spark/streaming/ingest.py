"""Incremental mosaic ingestion (streaming tile arrival).

The reference reruns the whole bounded pipeline with checkpoint-resume
when new COGs land. The Spark-native unbounded design splits the
compositor into its associative half and a compaction:

  image stream --readStream--> reproject to PATCH rows (stateless,
  mapInPandas works in streaming) --foreachBatch--> append to an
  icelite `patches` table (snapshot per microbatch = exactly-once via
  the stream checkpoint + atomic snapshot commit)

  compact_chunks(): composite all patches per chunk key on demand —
  mean/last/weighted are associative over patches, so late tiles only
  re-touch the chunks they overlap.

This keeps per-microbatch work O(new tiles) while preserving
bit-exact parity with the one-shot batch mosaic (test-verified).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from aef_mosaic_spark.generator import IMAGE_SCHEMA
from aef_mosaic_spark.grid import OutputGrid
from aef_mosaic_spark.operators import mosaic as M
from aef_mosaic_spark.sources.icelite import Icelite


def read_image_stream(spark: SparkSession, input_dir: str,
                      max_files_per_trigger: int = 1) -> DataFrame:
    return (
        spark.readStream.schema(IMAGE_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )


def stream_patches_to_table(images_stream: DataFrame, grid: OutputGrid,
                            table_path: str, checkpoint_dir: str,
                            timeout_s: int = 300):
    """Run the stateless prefix (grid bounds -> chunk ranges ->
    decode-once patch reprojection) on the stream; each microbatch
    commits one icelite snapshot of patch rows."""
    table = Icelite(table_path)

    def _sink(batch_df: DataFrame, batch_id: int):
        ranged = M.with_chunk_ranges(M.with_grid_bounds(batch_df, grid), grid)
        patches = M.reproject_patches(ranged, grid)
        table.append(
            patches,
            partition_by=["time_idx"],
            summary={"operation": "stream-patches", "batch_id": batch_id},
        )

    q = (
        images_stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)
    return table


def compact_chunks(spark: SparkSession, patches_table: str, grid: OutputGrid,
                   mode: str = "mean") -> DataFrame:
    """Composite the accumulated patch table into chunk rows."""
    patches = Icelite(patches_table).read(spark)
    return M.composite_chunks(patches, grid, mode=mode)
