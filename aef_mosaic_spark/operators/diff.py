"""Row-level table diff — the ETL regression primitive (insert /
delete / update between two keyed snapshots).

Why this op: every pipeline that republishes a table needs "what
changed" — for CDC validation, for incremental downstream refresh
(the icelite read_incremental sibling at VALUE level rather than
file level), and for catching silent upstream regressions.

Law: one FULL OUTER equi-join on the key columns;
    delete  = key present only in `old`
    insert  = key present only in `new`
    update  = key in both, any compare column differs
Unchanged rows emit nothing (the diff of two 100 TB snapshots that
agree is empty, not 100 TB).  NULL-safe comparison via the <=>
operator (IS NOT DISTINCT FROM in the oracle).

Scale shape: the join shuffles both sides once on the key — the
minimum possible for a value-level diff; with both snapshots stored
bucketed by key (sources/bucketed.py) the exchange is elided
entirely.  Compare columns are checked with a boolean OR chain, no
row-hash materialization.
"""
from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def table_diff(old: DataFrame, new: DataFrame, keys: list[str],
               compare_cols: list[str]) -> DataFrame:
    """-> (change, keys...): 'insert' | 'delete' | 'update' rows only."""
    o = old.select(*keys, *compare_cols)
    n = new.select(*keys, *compare_cols)
    o2 = o.select(*[F.col(c).alias(f"_o_{c}") for c in keys + compare_cols],
                  F.lit(1).alias("_in_o"))
    n2 = n.select(*[F.col(c).alias(f"_n_{c}") for c in keys + compare_cols],
                  F.lit(1).alias("_in_n"))
    cond = reduce(lambda a, b: a & b,
                  [o2[f"_o_{k}"].eqNullSafe(n2[f"_n_{k}"]) for k in keys])
    j = o2.join(n2, cond, "full_outer")
    differs = reduce(
        lambda a, b: a | b,
        [~F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}"))
         for c in compare_cols])
    change = (F.when(F.col("_in_n").isNull(), F.lit("delete"))
              .when(F.col("_in_o").isNull(), F.lit("insert"))
              .when(differs, F.lit("update")))
    return (j.select(change.alias("change"),
                     *[F.coalesce(F.col(f"_o_{k}"), F.col(f"_n_{k}"))
                       .alias(k) for k in keys])
            .where(F.col("change").isNotNull()))


def table_diff_sql(old_sql: str, new_sql: str, keys: list[str],
                   compare_cols: list[str]) -> str:
    """DuckDB twin of table_diff over two SELECTs."""
    on = " AND ".join(f"o.{k} IS NOT DISTINCT FROM n.{k}" for k in keys)
    differs = " OR ".join(f"o.{c} IS DISTINCT FROM n.{c}"
                          for c in compare_cols)
    keysel = ", ".join(f"coalesce(o.{k}, n.{k}) AS {k}" for k in keys)
    anyokey = f"o.{keys[0]}"
    anynkey = f"n.{keys[0]}"
    return f"""
    WITH o AS ({old_sql}), n AS ({new_sql})
    SELECT CASE WHEN {anynkey} IS NULL THEN 'delete'
                WHEN {anyokey} IS NULL THEN 'insert'
                WHEN {differs} THEN 'update' END AS change,
           {keysel}
    FROM o FULL OUTER JOIN n ON {on}
    WHERE ({anynkey} IS NULL) OR ({anyokey} IS NULL) OR ({differs})
    """
