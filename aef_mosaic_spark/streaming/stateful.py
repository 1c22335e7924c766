"""Custom stateful streaming operators via applyInPandasWithState.

The reference keeps only bounded in-flight state (channels +
checkpoint set); these are the unbounded-keyed-state extensions a
streaming training-data pipeline needs: first-seen dedup and running
per-key aggregates that survive across microbatches.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def streaming_dedup_first_seen(df: DataFrame, key_col: str,
                               id_col: str) -> DataFrame:
    """Emit each id at most once across the whole stream (keyed state =
    set of seen ids per key). Batch analog: dropDuplicates([id])."""
    out_schema = f"{key_col} long, {id_col} long"
    state_schema = "seen array<long>"

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        seen = set(state.get[0]) if state.exists else set()
        fresh = []
        for pdf in pdfs:
            for v in pdf[id_col]:
                v = int(v)
                if v not in seen:
                    seen.add(v)
                    fresh.append({key_col: int(key[0]), id_col: v})
        state.update((sorted(seen),))
        yield pd.DataFrame(fresh, columns=[key_col, id_col])

    return df.groupBy(key_col).applyInPandasWithState(
        fn, outputStructType=out_schema, stateStructType=state_schema,
        outputMode="append", timeoutConf=GroupStateTimeout.NoTimeout)


def streaming_running_stats(df: DataFrame, key_col: str,
                            value_col: str) -> DataFrame:
    """Running count/sum/max per key across microbatches."""
    out_schema = f"{key_col} long, n long, total double, mx double"
    state_schema = "n long, total double, mx double"

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        n, total, mx = state.get if state.exists else (0, 0.0, float("-inf"))
        for pdf in pdfs:
            vals = pdf[value_col]
            n += len(vals)
            total += float(vals.sum())
            if len(vals):
                mx = max(mx, float(vals.max()))
        state.update((n, total, mx))
        yield pd.DataFrame([{key_col: int(key[0]), "n": n,
                             "total": round(total, 6), "mx": mx}])

    return df.groupBy(key_col).applyInPandasWithState(
        fn, outputStructType=out_schema, stateStructType=state_schema,
        outputMode="update", timeoutConf=GroupStateTimeout.NoTimeout)
