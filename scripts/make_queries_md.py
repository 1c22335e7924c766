"""Regenerate QUERIES.md — the auto-extracted driver-gate inventory
(query name -> oracle kind -> first in-function comment)."""

import inspect
import re
import sys

sys.path.insert(0, ".")

import __spark_entry__ as E  # noqa: E402


def main():
    qs = E.queries()
    oracles = E.oracle_sql()
    lines = ["# QUERIES — driver-gate inventory (auto-generated)\n",
             "Every `queries()` entry with its oracle kind. Regenerate with",
             "`python scripts/make_queries_md.py`.\n",
             "| query | oracle | summary |", "|---|---|---|"]
    for name, fn in qs.items():
        src = inspect.getsource(fn)
        m = re.search(r"#\s*(.+)", src)
        summary = m.group(1).strip() if m else ""
        if name in oracles:
            sql = oracles[name].strip().lower()
            if sql.startswith("select * from read_parquet"):
                okind = "pinned fixture"
            elif "fixtures" in sql:
                okind = "SQL twin (over pinned raster fixture)"
            else:
                okind = "SQL twin"
        else:
            okind = "rows-only"
        lines.append(f"| {name} | {okind} | {summary[:90]} |")
    open("QUERIES.md", "w").write("\n".join(lines) + "\n")
    print(f"wrote QUERIES.md: {len(qs)} queries")


if __name__ == "__main__":
    main()
