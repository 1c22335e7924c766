"""Bucketed (co-partitioned) tables for repeated keyed joins.

At 100 TB the image/caption table is joined on image_id over and over
(metadata enrichment, dedup verdicts, caption updates). Bucketing both
sides by the join key at WRITE time removes the shuffle from every
subsequent join: Spark's bucketed scan reports the hash partitioning,
so SortMergeJoin consumes both sides exchange-free (the same trick as
the reference's pre-sharded index files, but done by the table format).

Spark-first specifics: bucketBy is only available via saveAsTable
(data-source tables carry bucket metadata in the catalog); the bucket
count must match on both sides; spark.sql.sources.bucketing.enabled is
on by default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, bucket_cols: list[str],
                   num_buckets: int = 16,
                   sort_cols: list[str] | None = None,
                   path: str | None = None) -> None:
    """Persist df as a bucketed parquet data-source table."""
    w = df.write.mode("overwrite").format("parquet") \
        .bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)


def joined_bucketed(spark: SparkSession, left: str, right: str,
                    on: list[str]) -> DataFrame:
    """Join two same-bucketed tables on their bucket key."""
    return spark.table(left).join(spark.table(right), on)


def plan_has_shuffle(df: DataFrame) -> bool:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "Exchange hashpartitioning" in plan or "ShuffleExchange" in plan
