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
