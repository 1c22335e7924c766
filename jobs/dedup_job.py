"""Corpus dedup job — the spark-submit surface for the near-dup
cluster pipeline (mosaic_job's sibling for the caption/text side of
the image+caption table).

Reads a parquet corpus, assigns every row a near-dup cluster
(MinHash-LSH candidates -> exact Jaccard verify -> connected
components), and commits an icelite table of (id, cluster_id, keep)
with per-stage metrics — the keep-list a training pipeline joins
against (left-semi on keep = true).

    spark-submit --master local[16] --driver-memory 16g \
      --py-files dist/engine.zip jobs/dedup_job.py \
      --input /root/testdata/sf0.1/documents.parquet \
      --id-col doc_id --text-col text --threshold 0.8 \
      --output /tmp/dedup_out

Prints ONE metrics JSON line on success.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

for _v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True,
                    help="parquet path of the corpus")
    ap.add_argument("--output", required=True,
                    help="icelite table path for the cluster/keep list")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--mode", choices=["text", "semdedup"], default="text",
                    help="text = MinHash near-dup clusters; semdedup = "
                         "embedding cluster-then-prune (Abbas 2023)")
    ap.add_argument("--vec-col", default="embedding")
    ap.add_argument("--tau", type=float, default=0.95)
    ap.add_argument("--n-lists", type=int, default=16)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--threshold", type=float, default=0.8)
    ap.add_argument("--minhash-k", type=int, default=16)
    ap.add_argument("--bands", type=int, default=4)
    ap.add_argument("--pairs", action="store_true",
                    help="also commit the verified pair table "
                         "(WARNING: quadratic in dup-clique size — "
                         "BENCH 7f; clusters are the scale output)")
    ap.add_argument("--pairs-in", default=None, metavar="TABLE",
                    help="icelite table of verified pairs (id_a, id_b)"
                         " — e.g. a prior run's --pairs output. Skips"
                         " the minhash + verify stages (the dominant"
                         " cost) and re-clusters from the persisted"
                         " graph; --threshold/--minhash-k/--bands are"
                         " then ignored")
    args = ap.parse_args(argv)
    if args.pairs_in and args.mode == "semdedup":
        ap.error("--pairs-in applies to --mode text only")
    if args.pairs_in and args.pairs:
        ap.error("--pairs-in already persists the pair table; "
                 "--pairs would just re-commit a copy")

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from aef_mosaic_spark.operators import dedup as D
    from aef_mosaic_spark.sources.icelite import Icelite

    spark = SparkSession.builder.getOrCreate()
    t0 = time.time()
    df = spark.read.parquet(args.input)
    n_docs = df.count()

    if args.mode == "semdedup":
        sd = D.semdedup(df, args.id_col, args.vec_col, tau=args.tau,
                        n_lists=args.n_lists, dim=args.dim)
        out = sd.select(args.id_col, "list", "cent_sim",
                        (~F.col("pruned")).alias("keep"))
        table = Icelite(args.output)
        snap = table.append(out, properties={
            "mode": "semdedup", "tau": str(args.tau),
            "n_lists": str(args.n_lists), "input": args.input,
        }, summary={"operation": "semdedup"})
        stats = table.read(spark).agg(
            F.count(F.lit(1)).alias("rows"),
            F.sum(F.col("keep").cast("long")).alias("kept")).collect()[0]
        print(json.dumps({
            "snapshot_id": snap,
            "wall_s": round(time.time() - t0, 3),
            "docs": n_docs,
            "clusters_kept": int(stats.kept),
            "removed": n_docs - int(stats.kept),
            "removed_frac": round(1.0 - stats.kept / max(n_docs, 1), 6),
            "docs_per_sec": round(n_docs / (time.time() - t0), 1),
        }))
        return 0

    if args.pairs_in:
        pairs = Icelite(args.pairs_in).read(spark)
        props = {"pairs_in": args.pairs_in, "input": args.input}
    else:
        pairs = D.minhash_near_duplicates(
            df, args.id_col, args.text_col, threshold=args.threshold,
            k=args.minhash_k, bands=args.bands)
        props = {
            "threshold": str(args.threshold),
            "minhash_k": str(args.minhash_k),
            "bands": str(args.bands),
            "input": args.input,
        }
    cc = D.near_duplicate_clusters(df, args.id_col, args.text_col,
                                   pairs=pairs)
    out = cc.select(
        args.id_col, "cluster_id",
        (F.col(args.id_col) == F.col("cluster_id")).alias("keep"))

    table = Icelite(args.output)
    snap = table.append(out, properties=props,
                        summary={"operation": "dedup-clusters"})
    stats = table.read(spark).agg(
        F.count(F.lit(1)).alias("rows"),
        F.sum(F.col("keep").cast("long")).alias("kept")).collect()[0]
    metrics = {
        "snapshot_id": snap,
        "wall_s": round(time.time() - t0, 3),
        "docs": n_docs,
        "clusters_kept": int(stats.kept),
        "removed": n_docs - int(stats.kept),
        "removed_frac": round(1.0 - stats.kept / max(n_docs, 1), 6),
        "docs_per_sec": round(n_docs / (time.time() - t0), 1),
    }
    if args.pairs:
        pt = Icelite(args.output + "_pairs")
        pt.append(pairs, summary={"operation": "dedup-pairs"})
        metrics["pairs"] = pt.read(spark).count()
    print(json.dumps(metrics))
    return 0


if __name__ == "__main__":
    sys.exit(main())
