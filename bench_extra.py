"""r06 optimization measurement harness (guide §1: measure first).

NOT the driver bench — bench.py is frozen. This file isolates each
headline query's expensive sub-plans with the noop sink (guide §1.4),
labels jobs (§1.5), and dumps .explain("formatted") to plans/r06/.

Usage:
  python bench_extra.py [--plans] [--parts P1,P2,...] [--reps N] [--tag T]

Parts: mosaic, mosaic_scan, sigs, cand, minhash, verify, clusters,
dsir_weights, dsir, simhash, spatial_join, knn, ann_lsh, pricing, asof
(default: all). Prints one JSON line per part: {part, times, median}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
PLANS_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "plans", "r06")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--plans", action="store_true",
                    help="dump explain(formatted) per part")
    ap.add_argument("--parts", default="")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--tag", default="before")
    args = ap.parse_args()

    from aef_mosaic_spark.session import get_spark

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g")
    spark = get_spark(app_name="bench-extra-r06", master=f"local[{CPUS}]",
                      extra_conf={"spark.sql.shuffle.partitions": "64",
                                  "spark.local.dir": "/dev/shm/spark-local"})
    sc = spark.sparkContext

    import __spark_entry__ as E
    from aef_mosaic_spark import generator
    from aef_mosaic_spark.grid import OutputGrid
    from aef_mosaic_spark.operators import dedup as D
    from aef_mosaic_spark.operators import mosaic as M
    from aef_mosaic_spark.operators.importance import (dsir_weights,
                                                       importance_resample)

    qs = E.queries()
    sf = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1])
    n_tiles = max(120, int(48000 * sf))
    grid = OutputGrid(bounds=(499000.0, 4095000.0, 560000.0, 4156000.0),
                      crs="EPSG:32610", resolution=10.0, years=(2023, 2024),
                      num_bands=3, chunk_h=256, chunk_w=256)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")

    import tempfile
    pq_dir = os.path.join(tempfile.gettempdir(), f"bench_images_{n_tiles}")
    if not os.path.exists(os.path.join(pq_dir, "_SUCCESS")):
        generator.images_df(spark, n_tiles).write.mode("overwrite").parquet(pq_dir)

    def part_mosaic():
        return M.mosaic(generator.images_df(spark, n_tiles), grid, mode="mean") \
            .select("n_tiles")

    def part_mosaic_scan():
        return M.mosaic(spark.read.parquet(pq_dir), grid, mode="mean") \
            .select("n_tiles")

    def part_gen_only():
        return generator.images_df(spark, n_tiles)

    def part_patches_only():
        return M.tiles_to_patches(spark.read.parquet(pq_dir), grid)

    def part_sigs():
        return D.minhash_signatures(docs, "doc_id", "text", k=16)

    def part_cand():
        return D.minhash_candidate_pairs(docs, "doc_id", "text", k=16, bands=4)

    def part_minhash():
        return D.minhash_near_duplicates(docs, "doc_id", "text",
                                         threshold=0.8, k=16, bands=4)

    def part_clusters():
        return D.near_duplicate_clusters(docs, "doc_id", "text",
                                         threshold=0.8, k=16, bands=4)

    def part_dsir_weights():
        return dsir_weights(docs, "doc_id", "text", "lang", "en")

    def part_dsir():
        w = dsir_weights(docs, "doc_id", "text", "lang", "en")
        return importance_resample(w, "doc_id", "weight", k=200)

    def part_simhash():
        return D.simhash_near_duplicates(docs, "doc_id", "text", max_hamming=8)

    parts = {
        "mosaic": part_mosaic,
        "mosaic_scan": part_mosaic_scan,
        "gen_only": part_gen_only,
        "patches_only": part_patches_only,
        "sigs": part_sigs,
        "cand": part_cand,
        "minhash": part_minhash,
        "clusters": part_clusters,
        "dsir_weights": part_dsir_weights,
        "dsir": part_dsir,
        "simhash": part_simhash,
        "spatial_join": lambda: qs["q12_point_in_box_join"](spark, SF_DIR),
        "knn": lambda: qs["q16_knn_cosine"](spark, SF_DIR),
        "ann_lsh": lambda: qs["q17_ann_cosine_lsh"](spark, SF_DIR),
        "pricing": lambda: qs["q01_pricing_summary"](spark, SF_DIR),
        "asof": lambda: qs["q07_asof_join"](spark, SF_DIR),
    }
    sel = [p for p in args.parts.split(",") if p] or list(parts)

    # warmup (mirrors bench.py): JVM + python worker pool
    spark.read.parquet(f"{SF_DIR}/region.parquet").count()
    spark.range(64).repartition(int(CPUS)).mapInPandas(
        lambda it: it, "id long").count()

    os.makedirs(PLANS_DIR, exist_ok=True)
    out = {}
    for name in sel:
        fn = parts[name]
        if args.plans:
            try:
                df = fn()
                plan = df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode
                    .fromString("formatted"))
                with open(os.path.join(PLANS_DIR,
                                       f"{name}_{args.tag}.txt"), "w") as fh:
                    fh.write(plan)
            except Exception as exc:  # plan dump must never kill timing
                print(f"plan dump failed for {name}: {exc}", file=sys.stderr)
        times = []
        for r in range(args.reps):
            sc.setJobDescription(f"{name}[{args.tag}] rep{r}")
            t0 = time.time()
            noop(fn())
            times.append(round(time.time() - t0, 3))
        sc.setJobDescription(None)
        s = sorted(times)
        med = s[len(s) // 2] if len(s) % 2 else (s[len(s)//2-1]+s[len(s)//2])/2
        out[name] = {"times": times, "median": med}
        print(json.dumps({"part": name, "tag": args.tag, "times": times,
                          "median": med}), flush=True)
    print(json.dumps({"tag": args.tag, "total_median":
                      round(sum(v["median"] for v in out.values()), 3)}))
    spark.stop()


if __name__ == "__main__":
    main()
