"""Deterministic sampling operators for training-data pipelines.

Corpus assembly needs REPRODUCIBLE sampling: the same doc set in and
the same config must select the same rows on any cluster, at any
parallelism, on either engine (Spark or the DuckDB oracle). So no
rand()/sample(): selection is a pure function of the row key via the
md5-derived h32 (functions/hashes.py — the only hash identical in
both engines), bucketed into [0, 10000).

stratified_sample: per-stratum keep rates (e.g. lang -> rate) — the
classic corpus-mix knob (downsample dominant languages / sources).
A row is kept iff h32(salt:id) % 10000 < rate * 10000. Pure Column
exprs: the filter pushes into the scan stage, no shuffle at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from aef_mosaic_spark.functions.hashes import h32_col, h32_sql

BUCKETS = 10000


def sample_bucket_col(id_col: str, salt: str):
    """Deterministic bucket in [0, 10000) from the row key."""
    return F.pmod(h32_col(F.concat(F.lit(f"{salt}:"),
                                   F.col(id_col).cast("string"))),
                  F.lit(BUCKETS)).cast("int")


def sample_bucket_sql(id_expr: str, salt: str) -> str:
    keyed = f"('{salt}:' || {id_expr}::VARCHAR)"
    return f"({h32_sql(keyed)} % {BUCKETS})::INT"


def stratified_sample(df: DataFrame, id_col: str, strata_col: str,
                      rates: dict[str, float], default_rate: float = 0.0,
                      salt: str = "sample-v1") -> DataFrame:
    """Keep each row with its stratum's rate, deterministically.
    -> input columns + (bucket int). Rows in strata not present in
    `rates` use default_rate (0.0 = drop)."""
    bucket = sample_bucket_col(id_col, salt)
    rate = F.lit(float(default_rate))
    for k, v in sorted(rates.items()):
        rate = F.when(F.col(strata_col) == k, F.lit(float(v))).otherwise(rate)
    return (df.withColumn("bucket", bucket)
            .where(F.col("bucket") < rate * BUCKETS))


def stratified_sample_sql(table: str, id_col: str, strata_col: str,
                          rates: dict[str, float],
                          default_rate: float = 0.0,
                          salt: str = "sample-v1") -> str:
    """DuckDB twin: identical h32 bucket arithmetic and rate CASE."""
    h = h32_sql(f"('{salt}:' || {id_col}::VARCHAR)")
    cases = " ".join(
        f"WHEN {strata_col} = '{k}' THEN {float(v)!r}e0"
        for k, v in sorted(rates.items()))
    rate = f"(CASE {cases} ELSE {float(default_rate)!r}e0 END)"
    return f"""
    SELECT *, ({h} % {BUCKETS})::INT AS bucket
    FROM {table}
    WHERE ({h} % {BUCKETS}) < {rate} * {BUCKETS}
    """
