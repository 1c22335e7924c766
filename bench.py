"""Benchmark harness (driver contract): headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Headline set = the engine's load-bearing paths:
  mosaic       : deterministic image table -> assign -> reproject ->
                 mean-composite (tiles mosaicked/sec, the BASELINE metric)
  spatial_join : point-in-box cell equi-join at sf scale
                 (images/points spatially joined/sec)
  knn_cosine   : exact cosine top-k, broadcast probes
  ann_lsh      : multiprobe sign-LSH ANN (scale path)
  minhash      : MinHash-LSH near-dup PAIRS over documents — the
                 worst-case-OUTPUT twin (this corpus really contains
                 ~2.8M near-dup pairs at sf0.1; pair enumeration is
                 measured-quadratic in clique size, BENCH 7f)
  clusters     : near-dup CLUSTER ASSIGNMENT over the same corpus
                 (MinHash-LSH -> verify -> connected components) —
                 the O(n)-output shape users should run at scale
  simhash      : banded SimHash near-dup
  pricing      : TPC-H-Q1-style relational aggregate
  asof         : union+window merge-asof events x orders

Run `python bench.py --scaling` to produce the N-vs-4N parallelism
table for BENCH/BASELINE.md instead of the single JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

N_TILES_PER_SF = 48000  # at sf0.1 -> 4800 synthetic tiles


def _build(spark, sf_dir):
    import __spark_entry__ as E
    from aef_mosaic_spark import generator
    from aef_mosaic_spark.grid import OutputGrid
    from aef_mosaic_spark.operators import mosaic as M

    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    n_tiles = max(120, int(N_TILES_PER_SF * sf))
    grid = OutputGrid(
        bounds=(499000.0, 4095000.0, 560000.0, 4156000.0),
        crs="EPSG:32610", resolution=10.0, years=(2023, 2024),
        num_bands=3, chunk_h=256, chunk_w=256,
    )
    qs = E.queries()

    def run_mosaic():
        images = generator.images_df(spark, n_tiles)
        rows = M.mosaic(images, grid, mode="mean").select("n_tiles").collect()
        return n_tiles, sum(r.n_tiles for r in rows)

    # parquet-backed variant: tiles pre-materialized (untimed) so the
    # measurement is scan(pushdown) -> reproject -> composite, the
    # production shape over an existing image table
    import tempfile

    pq_dir = os.path.join(tempfile.gettempdir(),
                          f"bench_images_{n_tiles}")
    if not os.path.exists(os.path.join(pq_dir, "_SUCCESS")):
        generator.images_df(spark, n_tiles).write.mode("overwrite").parquet(pq_dir)

    def run_mosaic_scan():
        images = spark.read.parquet(pq_dir)
        rows = M.mosaic(images, grid, mode="mean").select("n_tiles").collect()
        return n_tiles, sum(r.n_tiles for r in rows)

    def run_clusters():
        # FULL corpus (not q73's oracle-bounded subset): the O(n)
        # cluster-assignment output shape, tracked beside minhash's
        # worst-case pair enumeration round-over-round
        from aef_mosaic_spark.operators import dedup as D

        d = spark.read.parquet(f"{sf_dir}/documents.parquet")
        cc = D.near_duplicate_clusters(d, "doc_id", "text",
                                       threshold=0.8, k=16, bands=4)
        return cc.count(), 0

    bench = {
        "mosaic": run_mosaic,
        "mosaic_scan": run_mosaic_scan,
        "spatial_join": lambda: (qs["q12_point_in_box_join"](spark, sf_dir).count(), 0),
        "knn_cosine": lambda: (qs["q16_knn_cosine"](spark, sf_dir).count(), 0),
        "ann_lsh": lambda: (qs["q17_ann_cosine_lsh"](spark, sf_dir).count(), 0),
        "minhash": lambda: (qs["q23_minhash_near_dup"](spark, sf_dir).count(), 0),
        "clusters": run_clusters,
        "simhash": lambda: (qs["q26_simhash_near_dup"](spark, sf_dir).count(), 0),
        "dsir": lambda: (qs["q103_importance_resample"](spark, sf_dir).count(), 0),
        "pricing": lambda: (qs["q01_pricing_summary"](spark, sf_dir).count(), 0),
        "asof": lambda: (qs["q07_asof_join"](spark, sf_dir).count(), 0),
    }
    return sf, n_tiles, bench


def _median(xs):
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2.0


def _canary_cpu_sec() -> float:
    """Fixed single-thread numpy workload (sort + elementwise — no
    BLAS, so thread-pool config can't change it). This host drifts
    ~50% slower late in the day (BENCH 9d/VERDICT r4): two rounds'
    bench JSONs are comparable only after dividing by their canaries.
    A canary far off its band also flags concurrent-job contamination
    (the 73%-sys-time signature of two Spark jobs sharing the bus).

    Measured as min of 3 AFTER one untimed warm-up pass: the first
    numpy workload after VM idle reads up to ~25x slow (frequency
    ramp + lazy page-in on this firecracker host — measured 6.7 /
    0.69 / 0.27 s back-to-back), which is startup artifact, not the
    host-speed term the canary exists to capture."""
    import numpy as np

    def one_pass() -> float:
        rng = np.random.default_rng(0)
        x = rng.random(2_000_000)
        t0 = time.time()
        for _ in range(5):
            y = np.sort(x)
            x = np.roll(y, 1)
            x[0] = float((y[:1000] * y[:1000]).sum()) % 1.0
        return time.time() - t0

    one_pass()
    return round(min(one_pass() for _ in range(3)), 3)


def _canary_spark_sec(spark) -> float:
    """Fixed tiny Spark shuffle (range -> hash agg -> exchange ->
    count), run AFTER warmup: times the JVM+shuffle machinery at the
    session's parallelism, independent of the benchmark data. Min of
    3 — same steady-state rationale as the CPU canary."""
    def one_pass() -> float:
        t0 = time.time()
        (spark.range(0, 4_000_000, 1, 8)
         .selectExpr("id % 997 AS k", "id AS v")
         .groupBy("k").sum("v").count())
        return time.time() - t0

    return round(min(one_pass() for _ in range(3)), 3)


def run_once(master: str, sf_dir: str, shuffle_partitions: int | None = None,
             reps: int = 1):
    """Time each headline query ``reps`` times; report the per-query
    MEDIAN (single-rep numbers on this host swing ±10-15% rep-to-rep —
    VERDICT r2 'What's wrong #1') plus min/max spread."""
    from aef_mosaic_spark.session import get_spark

    cpus = master.split("[")[1].rstrip("]")
    sp = shuffle_partitions or (int(cpus) * 2 if cpus.isdigit() else 64)
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g")
    spark = get_spark(app_name=f"bench-{master}", master=master,
                      extra_conf={"spark.sql.shuffle.partitions": str(sp),
                                  "spark.local.dir": "/dev/shm/spark-local"})
    sf, n_tiles, bench = _build(spark, sf_dir)
    # warmup actions so JVM AND python-worker startup aren't billed to
    # q1: the parquet count spins the JVM; the tiny mapInPandas spins
    # the Arrow python worker pool (mosaic's first rep otherwise pays
    # it — the recurring ~8.5 s first-rep maxima in the spread fields)
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    import pandas as _pd  # noqa: F401

    spark.range(64).repartition(int(cpus) if cpus.isdigit() else 8) \
        .mapInPandas(lambda it: it, "id long").count()
    canaries = {"canary_cpu_sec": _canary_cpu_sec(),
                "canary_spark_sec": _canary_spark_sec(spark)}
    queries = {}
    spreads = {}
    results = {}
    for name, fn in bench.items():
        times = []
        for _ in range(reps):
            t0 = time.time()
            results[name] = fn()
            times.append(time.time() - t0)
        queries[name] = round(_median(times), 3)
        spreads[name] = [round(min(times), 3), round(max(times), 3)]
    spark.stop()
    return sf, n_tiles, queries, results, spreads, canaries


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    if "--scaling" in sys.argv:
        # N vs 4N parallelism pair chosen where the host itself still
        # scales linearly (multiprocessing ceiling: 4->16 procs = 0.93
        # efficiency, 8->32 = 0.69 — shared memory bandwidth); see
        # BENCH/BASELINE.md
        rows = []
        canaries = {}
        for master, sp in (("local[4]", 16), ("local[16]", 64)):
            sf, n_tiles, queries, _, _, canaries = run_once(
                master, sf_dir, sp)
            total = sum(queries.values())
            rows.append((master, queries, total, n_tiles))
            print(f"{master}: total={total:.2f}s  " +
                  " ".join(f"{k}={v:.2f}" for k, v in queries.items()),
                  file=sys.stderr)
        qn, q4n = rows[0][1], rows[1][1]
        out = {
            "sf": sf,
            "masters": ["local[4]", "local[16]"],
            "n_sec": round(rows[0][2], 2),
            "n4_sec": round(rows[1][2], 2),
            # headline metric (north rule): mosaic throughput scaling;
            # the suite total mixes output-bound queries (minhash emits
            # ~2.8M pairs regardless of cores) with tiny fixed-latency
            # ones — per-query numbers are reported for both levels
            "mosaic_scaling_efficiency": round(
                qn["mosaic"] / q4n["mosaic"] / 4.0, 3),
            "suite_scaling_efficiency": round(rows[0][2] / rows[1][2] / 4.0, 3),
            "queries_n": qn,
            "queries_n4": q4n,
            "mosaic_tiles": rows[0][3],
            **canaries,
            "note": "definitive 48k-tile spark-submit evidence in BENCH/BASELINE.md",
        }
        print(json.dumps(out))
        return

    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    sf, n_tiles, queries, results, spreads, canaries = run_once(
        f"local[{cpus}]", sf_dir, reps=reps)
    total = round(sum(queries.values()), 3)
    print(json.dumps({
        "metric": "headline_total_sec",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "reps": reps,
        "stat": "median",
        "spread_min_max": spreads,
        "sf": sf,
        # host-speed canaries (VERDICT r4 #2): this host drifts up to
        # ~50% between sessions, so two rounds' totals are comparable
        # only canary-normalized: value_a / value_b should be read
        # against canary_a / canary_b. A canary far off its recorded
        # band (BENCH/BASELINE.md §10) also flags concurrent-job
        # contamination of the run itself.
        **canaries,
        "throughput": {
            "tiles_mosaicked_per_sec": round(n_tiles / queries["mosaic"], 2),
            "points_joined_per_sec": round(
                results["spatial_join"][0] and
                _points_count(sf_dir) / queries["spatial_join"], 2),
        },
        "note": ("headline set grew in r4 ('clusters': full-corpus "
                 "near-dup cluster assignment, the O(n) dedup output "
                 "shape, beside 'minhash', the worst-case "
                 "pair-enumeration twin) and r5 ('dsir': importance "
                 "weights + Gumbel resample over the documents "
                 "corpus); subtract queries.clusters and queries.dsir "
                 "to compare totals against BENCH_r03 and earlier"),
    }))


def _points_count(sf_dir: str) -> int:
    import pyarrow.parquet as pq

    return pq.read_metadata(f"{sf_dir}/orders.parquet").num_rows


if __name__ == "__main__":
    main()
