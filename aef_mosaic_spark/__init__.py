"""aef_mosaic_spark — a PySpark-native spatial-join + tiling engine.

A from-scratch reimplementation of the *semantics* of the reference
single-node pipeline (geospatial-jeff/aef-mosaic, studied read-only at
/root/reference) as idiomatic Spark DataFrame operators + vectorized
Arrow/pandas UDF kernels:

- spatially indexed tile scan -> reproject -> mosaic -> chunked write
  (reference: src/lib.rs:1-13) expressed as one Spark DAG
  ``scan -> explode(chunk keys) -> shuffle -> applyInPandas -> write``
- H3/S2-style cell encoding, point-in-polygon and kNN re-expressed as
  salted broadcast/range joins on cell keys
- an icelite (Iceberg-style) partitioned Parquet sink with snapshot
  checkpoints, resume via anti-join, and per-partition lineage/metrics

No code is ported from the reference; citations in docstrings point to
the reference behavior each component reproduces.
"""

__version__ = "0.1.0"

from aef_mosaic_spark.session import get_spark  # noqa: F401
