"""SparkSession factory with scale-oriented defaults.

The reference tunes a single node (tokio workers / rayon pool /
bounded channels, /root/reference/src/main.rs:92-108). Our analog is
Spark conf: AQE (runtime re-plan + skew-join splitting), Arrow-batched
Python exchange (all heavy kernels are pandas/Arrow UDFs, never
per-row Python), and shuffle-partition sizing.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Defaults chosen for the sandbox (local[32], 128 GiB). On a real
# cluster the same conf names apply; shuffle partitions should be
# ~2-3x total cores and maxPartitionBytes left at 128 MiB so a 100 TB
# scan yields ~800k input splits (fine for a 1000-executor cluster).
_DEFAULT_CONF = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Arrow batch size bounds per-UDF-call memory for binary image rows.
    "spark.sql.execution.arrow.maxRecordsPerBatch": "1024",
    "spark.sql.shuffle.partitions": "64",
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
    "spark.sql.session.timeZone": "UTC",
    "spark.ui.enabled": "false",
    # single BLAS thread per python worker (see get_spark docstring)
    "spark.executorEnv.OMP_NUM_THREADS": "1",
    "spark.executorEnv.OPENBLAS_NUM_THREADS": "1",
    "spark.executorEnv.MKL_NUM_THREADS": "1",
}


def get_spark(
    app_name: str = "aef-mosaic-spark",
    master: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default
    ``local[*]``) so the same entry point runs at two parallelism
    levels (local[8] vs local[32]) for the scaling-efficiency
    protocol in BASELINE.md.
    """
    # one numpy/BLAS thread per python worker: Spark supplies the
    # process-level parallelism; nested OpenBLAS/MKL threads (numpy
    # einsum in the codecs) oversubscribe cores and *reduce* throughput
    for var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
        os.environ.setdefault(var, "1")
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"
    builder = SparkSession.builder.appName(app_name).master(master)
    conf = dict(_DEFAULT_CONF)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
