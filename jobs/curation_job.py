"""Corpus curation job — the spark-submit surface for the full
training-data assembly pipeline over a text corpus (the caption/text
side of the image+caption table; mosaic_job and dedup_job's sibling).

Stages (each optional via flags, all pure DataFrame ops):

  1. gopher    — the Gopher rule battery (Rae 2021 A1.1) as the first
                 hard gate (--gopher drops rows failing any rule)
  2. quality   — fixed-weight logistic quality model (functions/text),
                 drop rows under --min-quality
  3. pii       — redact emails/phones/IPv4 in place (RE2-safe)
  4. spans     — duplicated n-gram span stats; drop rows whose
                 duplicated-gram ratio exceeds --max-dup-ratio
  5. dedup     — near-dup clusters (MinHash-LSH -> verify -> CC),
                 keep the HIGHEST-QUALITY member per cluster
  6. spatial   — at most --spatial-cap docs per spatial cell (the
                 anti-city-oversampling knob for geo-tagged corpora)
  7. dsir      — DSIR importance weights vs --dsir-target (Xie 2023);
                 keep rows with weight >= --min-dsir-weight, OR a
                 Gumbel-top-k importance resample of --dsir-sample-k
                 rows (prob ~ exp(weight), without replacement)
  8. mixture   — per-domain token budgets (h32-ordered greedy fill)

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
    ap.add_argument("--gopher", action="store_true",
                    help="drop rows failing any Gopher rule "
                         "(Rae 2021 A1.1) — the first hard gate")
    ap.add_argument("--min-quality", type=float, default=None,
                    help="drop rows with quality_classifier < X")
    ap.add_argument("--dsir-target", default=None, metavar="VALUE",
                    help="DSIR target split value (with --dsir-col "
                         "and --min-dsir-weight): keep rows whose "
                         "hashed-ngram importance weight vs the "
                         "target distribution is high enough")
    ap.add_argument("--dsir-col", default="lang")
    ap.add_argument("--min-dsir-weight", type=float, default=None)
    ap.add_argument("--dsir-sample-k", type=int, default=None,
                    help="instead of a weight threshold, keep a "
                         "Gumbel-top-k importance RESAMPLE of k docs "
                         "(prob ~ exp(weight), w/o replacement — "
                         "Xie 2023 §2; deterministic)")
    ap.add_argument("--redact-pii", action="store_true")
    ap.add_argument("--max-dup-ratio", type=float, default=None,
                    help="drop rows whose duplicated 8-gram ratio > X")
    ap.add_argument("--clean-spans", action="store_true",
                    help="instead of (or before) dropping, CUT "
                         "duplicated 8-gram regions from every doc "
                         "except the min-id owner (Lee 2022 part 2)")
    ap.add_argument("--decontaminate", default=None,
                    choices=("exact", "bloom"),
                    help="drop docs sharing a winnowing fingerprint "
                         "with the benchmark set: exact = broadcast "
                         "semi-join of the full fp set; bloom = fixed "
                         "8 KB filter (superset, zero false negatives)")
    ap.add_argument("--bench-fp", default=None, metavar="PARQUET",
                    help="benchmark fingerprint table (column `fp`); "
                         "default: the deterministic doc_id%%17==3 "
                         "stand-in slice (which flags itself and is "
                         "dropped too)")
    ap.add_argument("--dedup", action="store_true",
                    help="near-dup clusters; keep best-quality member")
    ap.add_argument("--threshold", type=float, default=0.8)
    ap.add_argument("--spatial-cap", type=int, default=None,
                    help="keep at most N docs per spatial cell "
                         "(anti-city-oversampling for geo-tagged "
                         "corpora; needs --lon-col/--lat-col)")
    ap.add_argument("--spatial-res", type=int, default=6,
                    help="cell resolution for --spatial-cap")
    ap.add_argument("--lon-col", default="lon")
    ap.add_argument("--lat-col", default="lat")
    ap.add_argument("--budget", action="append", default=[],
                    metavar="DOMAIN=TOKENS")
    ap.add_argument("--default-budget", type=int, default=0)
    ap.add_argument("--tag", default=None,
                    help="tag the committed snapshot (immutable ref)")
    ap.add_argument("--resume", action="store_true",
                    help="checkpoint every stage to --stage-store and "
                         "resume a killed run from the last completed "
                         "stage (config-hash guarded)")
    ap.add_argument("--stage-store", default=None,
                    help="icelite table for stage checkpoints "
                         "(default: <output>_stages)")
    ap.add_argument("--analyze", action="store_true",
                    help="plan-only: print per-stage physical-plan "
                         "shape (exchanges/joins/python stages) and "
                         "exit without reading data or committing")
    args = ap.parse_args(argv)
    budgets = _parse_budgets(args.budget)
    if args.bench_fp and not args.decontaminate:
        ap.error("--bench-fp requires --decontaminate")
    n_dsir_modes = sum(x is not None
                       for x in (args.min_dsir_weight,
                                 args.dsir_sample_k))
    if args.dsir_target is None:
        if n_dsir_modes:
            ap.error("--min-dsir-weight/--dsir-sample-k need "
                     "--dsir-target")
    elif n_dsir_modes != 1:
        ap.error("--dsir-target needs exactly one of "
                 "--min-dsir-weight or --dsir-sample-k")

    from pyspark.sql import SparkSession, Window
    from pyspark.sql import functions as F

    from aef_mosaic_spark.functions import text as T
    from aef_mosaic_spark.operators import dedup as D
    from aef_mosaic_spark.operators.sampling import (
        spatially_balanced_sample, token_budget_mixture)
    from aef_mosaic_spark.operators.spans import duplicated_span_stats
    from aef_mosaic_spark.sources.icelite import Icelite

    spark = SparkSession.builder.getOrCreate()
    t0 = time.time()
    idc, txt = args.id_col, args.text_col

    def _decon_stage(d):
        # decontamination: shared by the run and --analyze paths
        from aef_mosaic_spark.functions.bloom import (bloom_build,
                                                      bloom_probe)
        g = d.select(F.col(idc).alias("_did"),
                     T.winnow_grams_col(F.col(txt)).alias("_g"))
        fps = g.select("_did", F.explode(
            T.winnow_mins_col(F.col("_g"))).alias("fp")).distinct()
        if args.bench_fp:
            bench = spark.read.parquet(args.bench_fp) \
                .select("fp").distinct()
        else:
            bench = fps.where(F.col("_did") % 17 == 3) \
                .select("fp").distinct()
        if args.decontaminate == "exact":
            bad = (fps.join(F.broadcast(bench), "fp", "left_semi")
                   .select(F.col("_did").alias(idc)).distinct())
        else:
            probed = bloom_probe(fps, bloom_build(bench))
            bad = (probed.where(F.col("bloom_hit") == 1)
                   .select(F.col("_did").alias(idc)).distinct())
        return d.join(bad, idc, "left_anti")

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
        if args.gopher:
            d = d.where(T.gopher_rules_cols(F.col(txt))["keep"])
            rep["gopher"] = shape(d)
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
        if args.decontaminate:
            d = _decon_stage(d)
            rep["decontaminate"] = shape(d)
        if args.spatial_cap is not None:
            kept = spatially_balanced_sample(
                d, idc, args.lon_col, args.lat_col,
                res=args.spatial_res, cap=args.spatial_cap)
            d = d.join(kept.select(idc), idc, "left_semi")
            rep["spatial_cap"] = shape(d)
        if args.dsir_target is not None:
            from aef_mosaic_spark.operators.importance import (
                dsir_weights, importance_resample)
            w = dsir_weights(d, idc, txt, args.dsir_col,
                             args.dsir_target)
            if args.dsir_sample_k is not None:
                keep = importance_resample(w, idc, "weight",
                                           k=args.dsir_sample_k)
            else:
                keep = w.where(F.col("weight") >= args.min_dsir_weight)
            d = d.join(keep.select(idc), idc, "left_semi")
            rep["dsir"] = shape(d)
        if budgets or args.default_budget:
            kept = token_budget_mixture(d, idc, args.domain_col, txt,
                                        budgets, args.default_budget)
            rep["mixture"] = shape(d.join(kept.select(idc), idc,
                                          "left_semi"))
        print(json.dumps(rep))
        return 0

    # ---- declarative stage list (order is the pipeline contract) ----
    stage_list: list = []
    if args.gopher:
        stage_list.append(("after_gopher", lambda d: d.where(
            T.gopher_rules_cols(F.col(txt))["keep"])))
    if args.min_quality is not None:
        stage_list.append(("after_quality", lambda d: d.where(
            F.col("q_score") >= args.min_quality)))
    if args.redact_pii:
        stage_list.append(("after_pii", lambda d: d.withColumn(
            txt, T.pii_redact_col(F.col(txt)))))
    if args.max_dup_ratio is not None:
        def _spans_stage(d):
            spans = duplicated_span_stats(d, idc, txt, n=8)
            bad = spans.where(F.col("dup_ratio") > args.max_dup_ratio) \
                       .select(F.col(idc))
            return d.join(bad, idc, "left_anti")
        stage_list.append(("after_spans", _spans_stage))
    if args.clean_spans:
        def _clean_stage(d):
            from aef_mosaic_spark.operators.spans import (
                remove_duplicated_spans)
            cleaned = remove_duplicated_spans(d, idc, txt, n=8) \
                .select(idc, F.col("clean_text"))
            return (d.drop(txt).join(cleaned, idc)
                    .withColumnRenamed("clean_text", txt))
        stage_list.append(("after_clean_spans", _clean_stage))
    if args.dedup:
        def _dedup_stage(d):
            cc = D.near_duplicate_clusters(d, idc, txt,
                                           threshold=args.threshold)
            w = Window.partitionBy("cluster_id").orderBy(
                F.col("q_score").desc(), F.col(idc).asc())
            keep = (d.select(idc, "q_score").join(cc, idc)
                    .withColumn("_rn", F.row_number().over(w))
                    .where("_rn = 1").select(idc))
            return d.join(keep, idc, "left_semi")
        stage_list.append(("after_dedup", _dedup_stage))
    if args.decontaminate:
        stage_list.append(("after_decontaminate", _decon_stage))
    if args.spatial_cap is not None:
        def _spatial_stage(d):
            kept = spatially_balanced_sample(
                d, idc, args.lon_col, args.lat_col,
                res=args.spatial_res, cap=args.spatial_cap)
            return d.join(kept.select(idc), idc, "left_semi")
        stage_list.append(("after_spatial_cap", _spatial_stage))
    if args.dsir_target is not None:
        def _dsir_stage(d):
            from aef_mosaic_spark.operators.importance import (
                dsir_weights, importance_resample)
            w = dsir_weights(d, idc, txt, args.dsir_col,
                             args.dsir_target)
            if args.dsir_sample_k is not None:
                keep = importance_resample(w, idc, "weight",
                                           k=args.dsir_sample_k)
            else:
                keep = w.where(F.col("weight") >= args.min_dsir_weight)
            return d.join(keep.select(idc), idc, "left_semi")
        stage_list.append(("after_dsir", _dsir_stage))
    if budgets or args.default_budget:
        def _mix_stage(d):
            kept = token_budget_mixture(d, idc, args.domain_col, txt,
                                        budgets, args.default_budget)
            return d.join(kept.select(idc), idc, "left_semi")
        stage_list.append(("after_mixture", _mix_stage))

    import hashlib
    cfg_hash = hashlib.md5(json.dumps({
        "input": args.input, "min_quality": args.min_quality,
        "gopher": args.gopher,
        "redact_pii": args.redact_pii,
        "max_dup_ratio": args.max_dup_ratio,
        "clean_spans": args.clean_spans, "dedup": args.dedup,
        "threshold": args.threshold, "budgets": budgets,
        "decontaminate": args.decontaminate, "bench_fp": args.bench_fp,
        "default_budget": args.default_budget,
        "spatial_cap": args.spatial_cap,
        "spatial_res": args.spatial_res if args.spatial_cap else None,
        "dsir": ([args.dsir_col, args.dsir_target,
                  args.min_dsir_weight, args.dsir_sample_k]
                 if args.dsir_target is not None else None),
    }, sort_keys=True).encode()).hexdigest()

    funnel: dict[str, int] = {}
    work = Icelite(args.stage_store or args.output + "_stages") \
        if args.resume else None
    start_idx = 0
    if work is not None and work.exists():
        # stage-checkpoint resume: config must match, completed stages
        # (a prefix of the current list, newest-first in history) are
        # loaded instead of recomputed
        props = work.properties()
        if props.get("config_hash") != cfg_hash:
            raise SystemExit("resume refused: config_hash mismatch "
                             "(pipeline flags differ from the "
                             "checkpointed run)")
        done = [h["summary"]["stage"] for h in reversed(work.history())
                if h.get("summary", {}).get("stage") not in (None, "input")]
        names = [n for n, _ in stage_list]
        while start_idx < len(done) and start_idx < len(names) \
                and done[start_idx] == names[start_idx]:
            start_idx += 1
        # oldest-first so a stage re-run after a mid-stage crash keeps
        # its NEWEST row count (history() is newest-first; forward
        # iteration would let the stale pre-crash row win)
        for h in reversed(work.history()):
            st = h.get("summary", {})
            if st.get("stage") in names[:start_idx] or \
                    st.get("stage") == "input":
                funnel[st["stage"]] = st["rows"]
        funnel = {k: funnel[k] for k in ["input"] + names[:start_idx]
                  if k in funnel}

    if start_idx > 0:
        df = _stage(work.read(spark), f"resumed@{start_idx}",
                    {"_": 0})  # cache; funnel already restored
    else:
        df = _stage(spark.read.parquet(args.input), "input", funnel)
        df = df.withColumn("q_score",
                           T.quality_classifier_col(F.col(txt)))
        if work is not None:
            work.overwrite(df, properties={"config_hash": cfg_hash},
                           summary={"stage": "input",
                                    "rows": funnel["input"]})

    for name, fn in stage_list[start_idx:]:
        df = _stage(fn(df), name, funnel)
        if work is not None:
            work.overwrite(df, properties={"config_hash": cfg_hash},
                           summary={"stage": name,
                                    "rows": funnel[name]})

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
                    "pipeline": "gopher/quality/pii/spans/dedup/"
                                "spatial/dsir/mixture"},
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
