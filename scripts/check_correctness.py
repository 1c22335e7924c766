"""Local stand-in for the driver's correctness gate: run every
queries() entry on Spark and its oracle_sql() twin on DuckDB at the
given sf dir; compare row count, column names, and an order-insensitive
value hash. Usage: python scripts/check_correctness.py [sf_dir] [only...]
"""

from __future__ import annotations

import hashlib
import sys
import time

sys.path.insert(0, ".")

import duckdb  # noqa: E402
import pyarrow as pa  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from aef_mosaic_spark.session import get_spark  # noqa: E402

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    import decimal

    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        if v != v:
            return "NaN"
        return f"{v:.9g}"
    return str(v)


def value_hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x01".join(norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.md5()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(app_name="check", master="local[16]",
                      extra_conf={"spark.sql.shuffle.partitions": "16"})
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = n_rows_only = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:
            print(f"FAIL {name}: spark error: {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"rows-only {name}: {len(srows)} rows [{time.time()-t0:.1f}s]")
            n_rows_only += 1
            if len(srows) == 0:
                print(f"  WARNING {name}: zero rows")
            continue
        try:
            # Arrow-faithful fetch, like the round driver: DuckDB
            # HUGEINT / un-cast aggregates surface as decimal128 here,
            # which the driver renders differently from Spark's
            # int64/float64 (silent hash mismatch at the gate even
            # though float(Decimal) compares equal). Fail loudly
            # instead of normalizing the difference away.
            atbl = con.sql(oracles[name]).fetch_arrow_table()
            ocols = [c.lower() for c in atbl.column_names]
            bad = [f"{c}: {t}" for c, t in
                   zip(atbl.column_names, atbl.schema.types)
                   if pa.types.is_decimal(t)]
            if bad:
                print(f"FAIL {name}: oracle emits decimal columns "
                      f"[{', '.join(bad)}] — cast ::BIGINT/::DOUBLE in "
                      f"the oracle SQL or the driver hash-mismatches")
                n_fail += 1
                continue
            orows = [tuple(col[i].as_py() for col in atbl.columns)
                     for i in range(atbl.num_rows)]
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue
        sdec = [f.name for f in sdf.schema.fields
                if f.dataType.typeName().startswith("decimal")]
        if sdec:
            print(f"FAIL {name}: Spark result has decimal columns "
                  f"{sdec} — cast to bigint/double for a stable "
                  f"driver hash")
            n_fail += 1
            continue
        ok_cols = sorted(c.lower() for c in scols) == sorted(ocols)
        ok_count = len(srows) == len(orows)
        sh = value_hash([tuple(r) for r in srows], [c.lower() for c in scols])
        oh = value_hash(orows, ocols)
        ok_hash = sh == oh
        status = "PASS" if (ok_cols and ok_count and ok_hash) else "FAIL"
        extra = ""
        if not ok_cols:
            extra += f" cols spark={sorted(scols)} duck={sorted(ocols)}"
        if not ok_count:
            extra += f" rows spark={len(srows)} duck={len(orows)}"
        if ok_cols and ok_count and not ok_hash:
            extra += " value-hash mismatch"
        print(f"{status} {name}: {len(srows)} rows [{time.time()-t0:.1f}s]{extra}")
        if status == "PASS":
            n_pass += 1
        else:
            n_fail += 1
            if ok_cols and ok_count and not ok_hash:
                # show a few differing rows for debugging
                sset = {tuple(norm_cell(v) for v in r) for r in
                        [tuple(r[scols.index(c)] for c in sorted(scols, key=str.lower))
                         for r in srows]}
                oset = {tuple(norm_cell(v) for v in r) for r in
                        [tuple(r[ocols.index(c)] for c in sorted(ocols))
                         for r in orows]}
                print("   spark-only:", list(sset - oset)[:3])
                print("   duck-only :", list(oset - sset)[:3])
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
