"""Containment near-dup (q170) bench — BENCH 10s.

Two claims:

1. STRUCTURAL: the document-frequency cap on shingles is the join
   bound.  Synthetic corpus where every source's docs share a
   12-token boilerplate header — without the cap those header grams
   are hot join keys producing O(docs_per_source^2) candidate rows
   per source; with the cap they are excluded from blocking entirely.
   We count the inverted-index join's output rows both ways.

2. SCALING: the capped operator end-to-end at local[4] vs local[16]
   on the same corpus (planted excerpt twins for every 5th doc), with
   a forcing aggregate (count, sum(inter), sum(na)) whose value is
   the cross-run identity check.

Usage: python scripts/containment_bench.py [n_docs] [reps]
Prints one JSON line.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 60_000
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
N_SRC = 100
BODY_TOKENS = 60
EXCERPT_TOKENS = 25
PATH = "/dev/shm/containment_bench"


def _write(spark):
    header = ("concat_ws(' ', transform(sequence(1, 12),"
              " j -> concat('hdr', CAST(id % {ns} AS STRING), '_',"
              " CAST(j AS STRING))))").format(ns=N_SRC)
    body = ("concat_ws(' ', transform(sequence(1, {bt}),"
            " j -> substring(md5(concat(CAST(id AS STRING), '_',"
            " CAST(j AS STRING))), 1, 10)))").format(bt=BODY_TOKENS)
    base = spark.range(N_DOCS).selectExpr(
        "id AS doc_id", f"concat({header}, ' ', {body}) AS text")
    exc_body = ("concat_ws(' ', transform(sequence(1, {et}),"
                " j -> substring(md5(concat(CAST(id AS STRING), '_',"
                " CAST(j AS STRING))), 1, 10)))").format(et=EXCERPT_TOKENS)
    excerpts = spark.range(N_DOCS).where("id % 5 = 0").selectExpr(
        f"id + {N_DOCS} AS doc_id",
        f"concat({header}, ' ', {exc_body}) AS text")
    base.unionByName(excerpts).repartition(32) \
        .write.mode("overwrite").parquet(PATH)


def _candidate_rows(spark, docs, max_df):
    """Inverted-index join output size (the operator's internals,
    counted before pair-grouping)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F
    n = 3
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    grams = F.array_distinct(F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
        lambda i: F.concat_ws(" ", *[F.element_at(toks,
                                                  (i + j + 1).cast("int"))
                                     for j in range(n)])))
    gdf = docs.select("doc_id", F.explode(grams).alias("gram"))
    rare = (gdf.withColumn("dfreq",
                           F.count(F.lit(1)).over(Window.partitionBy("gram")))
            .where(F.col("dfreq") <= max_df).select("doc_id", "gram"))
    a, b = rare.alias("a"), rare.alias("b")
    return (a.join(b, "gram")
            .where(F.col("a.doc_id") != F.col("b.doc_id")).count())


def main():
    from pyspark.sql import functions as F

    from aef_mosaic_spark.operators.dedup import containment_pairs
    from aef_mosaic_spark.session import get_spark

    if not os.path.exists(PATH):
        s0 = get_spark(app_name="cont-bench-gen", master="local[16]",
                       extra_conf={"spark.sql.shuffle.partitions": "32"})
        _write(s0)
        s0.stop()

    out = {"n_docs": N_DOCS, "n_src": N_SRC}

    # --- structural: candidate rows with vs without the df cap -----
    spark = get_spark(app_name="cont-bench-struct", master="local[16]",
                      extra_conf={"spark.sql.shuffle.partitions": "64"})
    docs = spark.read.parquet(PATH)
    t0 = time.time()
    out["cand_rows_capped"] = _candidate_rows(spark, docs, 50)
    out["struct_capped_sec"] = round(time.time() - t0, 1)
    t0 = time.time()
    out["cand_rows_uncapped"] = _candidate_rows(spark, docs, 1 << 40)
    out["struct_uncapped_sec"] = round(time.time() - t0, 1)
    out["cand_blowup_x"] = round(out["cand_rows_uncapped"]
                                 / max(out["cand_rows_capped"], 1), 1)
    spark.stop()

    # --- scaling: capped operator at local[4] vs local[16] ---------
    signatures = set()
    for master, sp in (("local[4]", 16), ("local[16]", 64)):
        spark = get_spark(app_name="cont-bench", master=master,
                          extra_conf={"spark.sql.shuffle.partitions":
                                      str(sp)})
        docs = spark.read.parquet(PATH)
        times = []
        for i in range(REPS + 1):   # rep 0 = warm-up
            t0 = time.time()
            sig = tuple(containment_pairs(docs, "doc_id", "text",
                                          threshold=0.6)
                        .agg(F.count(F.lit(1)), F.sum("inter"),
                             F.sum("na")).collect()[0])
            dt = time.time() - t0
            if i:
                times.append(round(dt, 2))
            signatures.add(sig)
        out[master] = sorted(times)
        spark.stop()
    assert len(signatures) == 1, signatures
    out["signature"] = list(signatures)[0]
    t4, t16 = min(out["local[4]"]), min(out["local[16]"])
    out["speedup_4_to_16"] = round(t4 / t16, 2)
    out["efficiency"] = round(t4 / t16 / 4.0, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
