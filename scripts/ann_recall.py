"""ANN recall@k evaluation — LSH / IVF / PQ / IVF+PQ against the
exact kNN on the fixture embedding corpus (VERDICT r4 #5).

The oracle-parity codebooks are deterministic hash-ordered seeds plus
ONE Lloyd step (so the DuckDB twin can re-derive them). This harness
measures what that costs in recall vs the opt-in deterministic
refinement (`ivf_centroids(refine_iters=N)` / `pq_codebooks(iters=N)`
— seeded init, fixed iterations, 6dp-rounded means, bit-reproducible
at any parallelism), and how probe width buys recall back.

    python scripts/ann_recall.py [sf_dir] [k]     # default sf0.1, k=10

Prints one markdown table (paste target: BENCH/BASELINE.md §10c) and
one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    n_queries = 100
    dim = 64

    from pyspark.sql import functions as F

    from aef_mosaic_spark.operators import knn as K
    from aef_mosaic_spark.session import get_spark

    spark = get_spark(app_name="ann-recall")
    emb = (spark.read.parquet(f"{sf_dir}/embeddings.parquet")
           .withColumn("embedding",
                       F.col("embedding").cast("array<double>")))
    queries = emb.where(F.col("vec_id") < n_queries).selectExpr(
        "vec_id AS query_id", "embedding")
    items = emb.selectExpr("vec_id AS item_id", "embedding")
    n_items = items.count()

    exact = K.knn_cosine_exact(queries, items, k=k).cache()
    exact.count()

    rows = []

    def run(name, fn):
        t0 = time.time()
        approx = fn()
        r = K.recall_at_k(approx, exact)
        rows.append((name, round(r, 4), round(time.time() - t0, 2)))
        print(f"  {name:42s} recall@{k}={r:.4f}  [{rows[-1][2]}s]",
              file=sys.stderr)

    # sign-LSH: probe width = signature Hamming radius
    for rad in (1, 2):
        run(f"lsh n_planes=8 probe_radius={rad}",
            lambda rad=rad: K.ann_cosine_lsh(
                queries, items, k=k, dim=dim, n_planes=8,
                max_sig_hamming=rad))

    # IVF: oracle-default centroids (1 Lloyd step) vs refined (5)
    for iters in (1, 5):
        cents = K.ivf_centroids(items.select("item_id", "embedding"),
                                "embedding", n_lists=16, dim=dim,
                                refine_iters=iters)
        for n_probe in (2, 4, 8):
            run(f"ivf n_lists=16 n_probe={n_probe} lloyd={iters}",
                lambda c=cents, p=n_probe: K.ann_cosine_ivf(
                    queries, items, k=k, dim=dim, n_lists=16,
                    n_probe=p, centroids=c))

    # PQ (compressed-domain exhaustive): 1 vs 5 Lloyd steps/subspace
    uq = K.unit_normalized(queries, "embedding", "_u").select(
        "query_id", F.col("_u").alias("embedding"))
    ui = K.unit_normalized(items, "embedding", "_u").select(
        "item_id", F.col("_u").alias("embedding"))
    for iters in (1, 5):
        books = K.pq_codebooks(ui, "embedding", dim=dim, m=4, ksub=8,
                               iters=iters)
        run(f"pq m=4 ksub=8 lloyd={iters}",
            lambda b=books: K.ann_cosine_pq(queries, items, k=k,
                                            dim=dim, m=4, ksub=8,
                                            books=b))

    # code-size sweep: the oracle-parity default (m=4, ksub=8 = 12
    # bits/vector) vs production-sized codes — recall at this extreme
    # compression is bounded by CODE SIZE, not codebook training
    for m_, ksub_ in ((8, 16), (16, 16)):
        books = K.pq_codebooks(ui, "embedding", dim=dim, m=m_,
                               ksub=ksub_, iters=5)
        run(f"pq m={m_} ksub={ksub_} lloyd=5 "
            f"({m_ * (ksub_.bit_length() - 1)} bits/vec)",
            lambda b=books, m_=m_, ks=ksub_: K.ann_cosine_pq(
                queries, items, k=k, dim=dim, m=m_, ksub=ks, books=b))

    # PQ + exact rerank of a 4x shortlist (the production pattern)
    run("pq_rerank m=4 ksub=8 shortlist=4x",
        lambda: K.ann_cosine_pq_rerank(queries, items, k=k, dim=dim,
                                       m=4, ksub=8, shortlist_mult=4))

    # IVF+PQ composite, default vs refined both stages
    run("ivfpq n_lists=16 n_probe=4 lloyd=1",
        lambda: K.ann_cosine_ivfpq(queries, items, k=k, dim=dim,
                                   n_lists=16, n_probe=4, m=4, ksub=8))
    cents5 = K.ivf_centroids(items.select("item_id", "embedding"),
                             "embedding", n_lists=16, dim=dim,
                             refine_iters=5)
    books5 = K.pq_codebooks(ui, "embedding", dim=dim, m=4, ksub=8,
                            iters=5)
    run("ivfpq n_lists=16 n_probe=4 lloyd=5",
        lambda: K.ann_cosine_ivfpq(queries, items, k=k, dim=dim,
                                   n_lists=16, n_probe=4, m=4, ksub=8,
                                   centroids=cents5, books=books5))

    print(f"\n| method | recall@{k} | wall_s |")
    print("|---|---|---|")
    for name, r, t in rows:
        print(f"| {name} | {r} | {t} |")
    print(json.dumps({
        "sf_dir": sf_dir, "k": k, "n_queries": n_queries,
        "n_items": n_items,
        "recall": {name: r for name, r, _ in rows},
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
