"""Session-7 operators: ACF, containment dedup, morphology, histogram
matching."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from aef_mosaic_spark.operators.anomaly import acf


def _series_df(spark, per_user_values, t0=1_700_000_000):
    rows = []
    eid = 0
    for uid, vals in per_user_values.items():
        for i, v in enumerate(vals):
            rows.append((eid, uid, pd.Timestamp(t0 + i * 60, unit="s"),
                         float(v)))
            eid += 1
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["event_id", "user_id", "ts", "value"]))


def _golden_acf(vals, k):
    vc = np.array([int(np.floor(v * 100 + 0.5)) for v in vals],
                  dtype=np.int64)
    n = len(vc)
    r = vc - vc.sum() // n
    num = int((r[:-k] * r[k:]).sum())
    den = int((r * r).sum())
    return num, den, np.floor(1e6 * num / den + 0.5) / 1e6


def test_acf_alternating_series(spark):
    vals = [10.0, 0.0] * 10
    got = {r["lag"]: r for r in
           acf(_series_df(spark, {1: vals})).collect()}
    for k in (1, 2, 3):
        num, den, a = _golden_acf(vals, k)
        assert (got[k]["num"], got[k]["den"]) == (num, den)
        assert got[k]["acf_q"] == pytest.approx(a, abs=1e-9)
    assert got[1]["acf_q"] < -0.9 and got[2]["acf_q"] > 0.85


def test_acf_constant_and_short_series_excluded(spark):
    got = acf(_series_df(spark, {1: [5.0] * 10, 2: [1.0, 2.0]})).collect()
    # user 1 constant -> den 0; user 2 too short for every lag but 1?
    # n=2 fails n > lag+1 even at lag 1
    assert got == []


def test_acf_random_matches_golden(spark):
    rng = np.random.RandomState(7)
    series = {u: rng.randint(0, 500, 40) / 2.0 for u in range(5)}
    got = {(r["user_id"], r["lag"]): r
           for r in acf(_series_df(spark, series)).collect()}
    for u, vals in series.items():
        for k in (1, 2, 3):
            num, den, a = _golden_acf(list(vals), k)
            assert got[(u, k)]["num"] == num
            assert got[(u, k)]["acf_q"] == pytest.approx(a, abs=1e-9)


# ------------------------------------------------------------------ #
# containment_pairs                                                   #
# ------------------------------------------------------------------ #

def _docs_df(spark, docs):
    return spark.createDataFrame(
        pd.DataFrame(docs, columns=["doc_id", "text"]))


def test_containment_excerpt_is_directional(spark):
    from aef_mosaic_spark.operators.dedup import containment_pairs
    words = [f"tok{i}x" for i in range(200)]
    parent = " ".join(words)
    excerpt = " ".join(words[:30])
    other = " ".join(f"z{i}q" for i in range(150))
    out = {(r["id_src"], r["id_dst"]): r for r in
           containment_pairs(_docs_df(spark, [(1, parent), (2, excerpt),
                                              (3, other)]),
                             "doc_id", "text",
                             threshold=0.5).collect()}
    # excerpt fully contained in parent; parent NOT in excerpt
    assert out[(2, 1)]["containment"] == 1.0
    assert (1, 2) not in out and (1, 3) not in out and (3, 1) not in out
    # jaccard for the same pair would be 28/198 ~ 0.14
    assert out[(2, 1)]["inter"] == 28


def test_containment_df_cap_drops_boilerplate(spark):
    from aef_mosaic_spark.operators.dedup import containment_pairs
    # the shared 3-gram "the same header" appears in every doc; with
    # max_df below the corpus size it cannot create pairs
    docs = [(i, f"the same header u{i}a u{i}b u{i}c u{i}d") for i in range(9)]
    out = containment_pairs(_docs_df(spark, docs), "doc_id", "text",
                            threshold=0.1, max_df=5).collect()
    assert out == []
    # raising the cap above the corpus size lets it back in
    out2 = containment_pairs(_docs_df(spark, docs), "doc_id", "text",
                             threshold=0.1, max_df=50).collect()
    assert len(out2) == 9 * 8
