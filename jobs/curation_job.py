"""Corpus curation job — the spark-submit surface for the full
training-data assembly pipeline over a text corpus (the caption/text
side of the image+caption table; mosaic_job and dedup_job's sibling).

Stages (each optional via flags, all pure DataFrame ops):

  1. quality   — fixed-weight logistic quality model (functions/text),
                 drop rows under --min-quality
  2. pii       — redact emails/phones/IPv4 in place (RE2-safe)
  3. spans     — duplicated n-gram span stats; drop rows whose
                 duplicated-gram ratio exceeds --max-dup-ratio
  4. dedup     — near-dup clusters (MinHash-LSH -> verify -> CC),
                 keep the HIGHEST-QUALITY member per cluster
  5. mixture   — per-domain token budgets (h32-ordered greedy fill)

Commits the surviving rows as an icelite table (zstd), optionally
tagged, with a per-stage row-count funnel in the snapshot summary and
ONE metrics JSON line on stdout.

    spark-submit --master local[16] --driver-memory 16g \
      --py-files dist/engine.zip jobs/curation_job.py \
      --input /root/testdata/sf0.1/documents.parquet \
      --id-col doc_id --text-col text --domain-col source \
      --min-quality 0.4 --max-dup-ratio 0.6 --dedup \
      --budget src0=20000 --budget src1=20000 --default-budget 5000 \
      --tag dataset-v1 --output /tmp/curated

Scale notes: every stage is a filter/groupBy/window over the corpus —
no collect() of row-sized data, no Python UDFs; the only iterative
piece is connected components (localCheckpoint per round). The funnel
numbers come from ONE count per enabled stage (each a cheap
count-aggregate job over the cached frame).
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


def _parse_budgets(items: list[str]) -> dict[str, int]:
    out = {}
    for it in items:
        k, _, v = it.partition("=")
        if not _ or not v.isdigit():
            raise SystemExit(f"--budget expects NAME=TOKENS, got {it!r}")
        out[k] = int(v)
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True,
                    help="icelite table path for the curated corpus")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--domain-col", default="source")
    ap.add_argument("--min-quality", type=float, default=None,
                    help="drop rows with quality_classifier < X")
    ap.add_argument("--redact-pii", action="store_true")
    ap.add_argument("--max-dup-ratio", type=float, default=None,
                    help="drop rows whose duplicated 8-gram ratio > X")
    ap.add_argument("--clean-spans", action="store_true",
                    help="instead of (or before) dropping, CUT "
                         "duplicated 8-gram regions from every doc "
                         "except the min-id owner (Lee 2022 part 2)")
    ap.add_argument("--dedup", action="store_true",
                    help="near-dup clusters; keep best-quality member")
    ap.add_argument("--threshold", type=float, default=0.8)
    ap.add_argument("--budget", action="append", default=[],
                    metavar="DOMAIN=TOKENS")
    ap.add_argument("--default-budget", type=int, default=0)
    ap.add_argument("--tag", default=None,
                    help="tag the committed snapshot (immutable ref)")
    ap.add_argument("--analyze", action="store_true",
                    help="plan-only: print per-stage physical-plan "
                         "shape (exchanges/joins/python stages) and "
                         "exit without reading data or committing")
    args = ap.parse_args(argv)
    budgets = _parse_budgets(args.budget)

    from pyspark.sql import SparkSession, Window
    from pyspark.sql import functions as F

    from aef_mosaic_spark.functions import text as T
    from aef_mosaic_spark.operators import dedup as D
    from aef_mosaic_spark.operators.sampling import token_budget_mixture
    from aef_mosaic_spark.operators.spans import duplicated_span_stats
    from aef_mosaic_spark.sources.icelite import Icelite

    spark = SparkSession.builder.getOrCreate()
    t0 = time.time()
    idc, txt = args.id_col, args.text_col

    _prev = []

    def _stage(d, name, funnel):
        # cache each stage boundary: funnel counts and downstream
        # stages reuse the materialized frame instead of recomputing
        # the whole lineage per count (and CC's localCheckpoint keeps
        # the plan short); previous stage cache is dropped eagerly
        d = d.persist()
        funnel[name] = d.count()
        while _prev:
            _prev.pop().unpersist()
        _prev.append(d)
        return d

    if args.analyze:
        # plan-only report: build each stage's lineage, never execute.
        # The dedup stage is iterative (connected components cuts
        # lineage with localCheckpoint per round) so it is described,
        # not planned.
        import re

        def shape(d):
            s = d._jdf.queryExecution().executedPlan().toString()
            return {
                "exchanges": len(re.findall(r"Exchange (hash|range|Single)", s)),
                "broadcast_joins": len(re.findall(r"BroadcastHashJoin", s)),
                "python_stages": len(re.findall(
                    r"MapInPandas|ArrowEvalPython|BatchEvalPython"
                    r"|FlatMapGroupsInPandas", s)),
            }

        d0 = spark.read.parquet(args.input)
        rep: dict = {"analyze": True,
                     "input_partitions": d0.rdd.getNumPartitions()}
        d = d0.withColumn("q_score", T.quality_classifier_col(F.col(txt)))
        if args.min_quality is not None:
            d = d.where(F.col("q_score") >= args.min_quality)
            rep["quality"] = shape(d)
        if args.redact_pii:
            d = d.withColumn(txt, T.pii_redact_col(F.col(txt)))
            rep["pii"] = shape(d)
        if args.max_dup_ratio is not None:
            spans = duplicated_span_stats(d, idc, txt, n=8)
            bad = spans.where(F.col("dup_ratio") > args.max_dup_ratio) \
                       .select(F.col(idc))
            d = d.join(bad, idc, "left_anti")
            rep["spans"] = shape(d)
        if args.dedup:
            rep["dedup"] = ("iterative: minhash-LSH candidates -> exact "
                            "verify -> connected components "
                            "(localCheckpoint per round)")
        if budgets or args.default_budget:
            kept = token_budget_mixture(d, idc, args.domain_col, txt,
                                        budgets, args.default_budget)
            rep["mixture"] = shape(d.join(kept.select(idc), idc,
                                          "left_semi"))
        print(json.dumps(rep))
        return 0

    funnel: dict[str, int] = {}
    df = _stage(spark.read.parquet(args.input), "input", funnel)

    df = df.withColumn("q_score",
                       T.quality_classifier_col(F.col(txt)))
    if args.min_quality is not None:
        df = _stage(df.where(F.col("q_score") >= args.min_quality),
                    "after_quality", funnel)

    if args.redact_pii:
        df = df.withColumn(txt, T.pii_redact_col(F.col(txt)))

    if args.max_dup_ratio is not None:
        spans = duplicated_span_stats(df, idc, txt, n=8)
        bad = spans.where(F.col("dup_ratio") > args.max_dup_ratio) \
                   .select(F.col(idc))
        df = _stage(df.join(bad, idc, "left_anti"),
                    "after_spans", funnel)

    if args.clean_spans:
        from aef_mosaic_spark.operators.spans import remove_duplicated_spans
        cleaned = remove_duplicated_spans(df, idc, txt, n=8) \
            .select(idc, F.col("clean_text"))
        df = _stage(
            df.drop(txt).join(cleaned, idc)
            .withColumnRenamed("clean_text", txt),
            "after_clean_spans", funnel)

    if args.dedup:
        cc = D.near_duplicate_clusters(df, idc, txt,
                                       threshold=args.threshold)
        w = Window.partitionBy("cluster_id").orderBy(
            F.col("q_score").desc(), F.col(idc).asc())
        keep = (df.select(idc, "q_score").join(cc, idc)
                .withColumn("_rn", F.row_number().over(w))
                .where("_rn = 1").select(idc))
        df = _stage(df.join(keep, idc, "left_semi"),
                    "after_dedup", funnel)

    if budgets or args.default_budget:
        kept = token_budget_mixture(df, idc, args.domain_col, txt,
                                    budgets, args.default_budget)
        df = _stage(df.join(kept.select(idc), idc, "left_semi"),
                    "after_mixture", funnel)

    funnel["output"] = funnel[list(funnel)[-1]]
    # per-domain observability: docs + tokens of the FINAL corpus
    # (one small aggregate over the cached last stage)
    from aef_mosaic_spark.functions.text import token_count_col
    domain_rows = (df.groupBy(args.domain_col)
                   .agg(F.count(F.lit(1)).alias("docs"),
                        F.sum(token_count_col(F.col(txt)).cast("long"))
                        .alias("tokens"))
                   .collect())
    domain_stats = {r[args.domain_col]: {"docs": r["docs"],
                                         "tokens": int(r["tokens"])}
                    for r in domain_rows}
    table = Icelite(args.output)
    snap = table.append(
        df,
        properties={"input": args.input,
                    "pipeline": "quality/pii/spans/dedup/mixture"},
        summary={"operation": "curate", "funnel": funnel,
                 "domains": domain_stats})
    if args.tag:
        table.tag(args.tag, snapshot_id=snap)
    while _prev:  # release the final stage cache (library callers)
        _prev.pop().unpersist()
    wall = time.time() - t0
    print(json.dumps({
        "snapshot_id": snap,
        "wall_s": round(wall, 3),
        "funnel": funnel,
        "docs_per_sec": round(funnel["input"] / wall, 1),
        "tag": args.tag,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
