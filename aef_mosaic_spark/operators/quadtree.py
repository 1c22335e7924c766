"""Adaptive quadtree decomposition — top-down split-until-cap over a
point table (Finkel & Bentley 1974; the PR-quadtree leaf law).

Why this op: a uniform grid (q121 tiles, q130 eps-cells) puts a
mega-city and an empty ocean in same-sized cells; every skew problem
the engine salts around (DBSCAN mega-cells, KDE hot tiles, icelite
file clustering) is the symptom.  The adaptive tiling is the cure the
spatial-indexing literature standardized on: split any cell holding
more than `cap` points into its 4 children, stop at `max_depth`.  The
leaf table IS the balanced partitioning: every leaf holds <= cap
points (except depth-capped ones), so downstream per-cell work is
bounded by construction.

Law (exact integer, both engines): coordinates in [0, 2^FIELD_BITS);
the level-l cell of a point is (x div 2^(FIELD_BITS-l),
y div 2^(FIELD_BITS-l)).  Level 0 is the root.  A cell at level l
(l >= 1) becomes a LEAF iff its point count is <= cap, or l ==
max_depth; otherwise its points descend to level l+1.  Points whose
ancestors never satisfied the cap exit at max_depth.  Output one row
per non-empty leaf: (level, cx, cy, n).

Scale shape (100 TB): each level is ONE groupBy(cell) count on the
still-descending points + ONE broadcast semi/anti join against the
(tiny, cell-sized) leaf list — never a point x point or cell x cell
product; the descending set shrinks monotonically.  max_depth is
fixed so the DuckDB oracle unrolls into chained CTEs (the
q119/q142/q151/q155 fixed-T law).
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FIELD_BITS = 17          # coordinate field [0, 131072) covers TRAJ_FIELD
QT_CAP = 64
QT_MAX_DEPTH = 6


def quadtree_leaves(pts: DataFrame, cap: int = QT_CAP,
                    max_depth: int = QT_MAX_DEPTH,
                    x: str = "xm", y: str = "ym") -> DataFrame:
    """Non-empty quadtree leaf cells of an integer point table ->
    (level, cx, cy, n)."""
    remaining = pts.select(F.col(x).alias("_x"), F.col(y).alias("_y"))
    leaves = None
    for lvl in range(1, max_depth + 1):
        shift = FIELD_BITS - lvl
        cells = remaining.select(
            F.expr(f"_x div {1 << shift}").alias("cx"),
            F.expr(f"_y div {1 << shift}").alias("cy"))
        counts = cells.groupBy("cx", "cy").agg(
            F.count(F.lit(1)).cast("long").alias("n"))
        if lvl == max_depth:
            leaf_l = counts
        else:
            leaf_l = counts.where(F.col("n") <= cap)
        leaf_l = leaf_l.select(F.lit(lvl).cast("int").alias("level"),
                               "cx", "cy", "n")
        leaves = leaf_l if leaves is None else leaves.unionByName(leaf_l)
        if lvl < max_depth:
            keyed = remaining.select(
                "_x", "_y",
                F.expr(f"_x div {1 << shift}").alias("cx"),
                F.expr(f"_y div {1 << shift}").alias("cy"))
            big = counts.where(F.col("n") > cap).select("cx", "cy")
            remaining = (keyed.join(F.broadcast(big), ["cx", "cy"], "semi")
                         .select("_x", "_y")
                         .localCheckpoint(eager=False))
    return leaves


def quadtree_points_sql(points_sql: str, cap: int = QT_CAP,
                        max_depth: int = QT_MAX_DEPTH,
                        x: str = "xm", y: str = "ym") -> str:
    """DuckDB twin of quadtree_leaves over `points_sql` (a SELECT
    producing integer columns x/y): fixed depth unrolls into chained
    MATERIALIZED CTEs, one (counts, leaves, survivors) triple per
    level."""
    ctes = [f"r0 AS MATERIALIZED (SELECT {x} AS _x, {y} AS _y "
            f"FROM ({points_sql}))"]
    sel = []
    for lvl in range(1, max_depth + 1):
        w = 1 << (FIELD_BITS - lvl)
        ctes.append(f"""c{lvl} AS MATERIALIZED (
      SELECT _x // {w} AS cx, _y // {w} AS cy, count(*)::BIGINT AS n
      FROM r{lvl - 1} GROUP BY 1, 2)""")
        if lvl == max_depth:
            sel.append(f"SELECT {lvl}::INT AS level, cx, cy, n FROM c{lvl}")
        else:
            sel.append(f"SELECT {lvl}::INT AS level, cx, cy, n "
                       f"FROM c{lvl} WHERE n <= {cap}")
            ctes.append(f"""r{lvl} AS MATERIALIZED (
      SELECT p._x, p._y FROM r{lvl - 1} p
      JOIN c{lvl} c ON c.cx = p._x // {w} AND c.cy = p._y // {w}
      WHERE c.n > {cap})""")
    return ("WITH " + ",\n    ".join(ctes) + "\n    "
            + "\n    UNION ALL ".join(sel))


def quadtree_assign(pts: DataFrame, cap: int = QT_CAP,
                    max_depth: int = QT_MAX_DEPTH,
                    id_col: str = "id",
                    x: str = "xm", y: str = "ym") -> DataFrame:
    """Assign every point its quadtree LEAF cell -> (id, level, cx,
    cy): the partition key that makes q157's decomposition actionable
    (repartition by (level, cx, cy) and every task holds <= cap
    points except depth-capped hot cells).  Same descent law as
    quadtree_leaves; grouping the output by (level, cx, cy) with a
    count reproduces the leaf table exactly (tested)."""
    remaining = pts.select(F.col(id_col).alias("id"),
                           F.col(x).alias("_x"), F.col(y).alias("_y"))
    parts = []
    for lvl in range(1, max_depth + 1):
        shift = FIELD_BITS - lvl
        keyed = remaining.select(
            "id", "_x", "_y",
            F.expr(f"_x div {1 << shift}").alias("cx"),
            F.expr(f"_y div {1 << shift}").alias("cy"))
        if lvl == max_depth:
            parts.append(keyed.select(
                "id", F.lit(lvl).cast("int").alias("level"), "cx", "cy"))
            break
        counts = keyed.groupBy("cx", "cy").agg(
            F.count(F.lit(1)).alias("n"))
        small = counts.where(F.col("n") <= cap).select("cx", "cy")
        parts.append(
            keyed.join(F.broadcast(small), ["cx", "cy"], "semi")
            .select("id", F.lit(lvl).cast("int").alias("level"),
                    "cx", "cy"))
        big = counts.where(F.col("n") > cap).select("cx", "cy")
        remaining = (keyed.join(F.broadcast(big), ["cx", "cy"], "semi")
                     .select("id", "_x", "_y")
                     .localCheckpoint(eager=False))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def quadtree_assign_sql(points_sql: str, cap: int = QT_CAP,
                        max_depth: int = QT_MAX_DEPTH,
                        id_col: str = "id",
                        x: str = "xm", y: str = "ym") -> str:
    """DuckDB twin of quadtree_assign."""
    ctes = [f"r0 AS MATERIALIZED (SELECT {id_col} AS id, {x} AS _x, "
            f"{y} AS _y FROM ({points_sql}))"]
    sel = []
    for lvl in range(1, max_depth + 1):
        w = 1 << (FIELD_BITS - lvl)
        if lvl == max_depth:
            sel.append(f"SELECT id, {lvl}::INT AS level, "
                       f"_x // {w} AS cx, _y // {w} AS cy FROM r{lvl - 1}")
            break
        ctes.append(f"""c{lvl} AS MATERIALIZED (
      SELECT _x // {w} AS cx, _y // {w} AS cy, count(*)::BIGINT AS n
      FROM r{lvl - 1} GROUP BY 1, 2)""")
        sel.append(f"""SELECT p.id, {lvl}::INT AS level, c.cx, c.cy
      FROM r{lvl - 1} p
      JOIN c{lvl} c ON c.cx = p._x // {w} AND c.cy = p._y // {w}
      WHERE c.n <= {cap}""")
        ctes.append(f"""r{lvl} AS MATERIALIZED (
      SELECT p.id, p._x, p._y FROM r{lvl - 1} p
      JOIN c{lvl} c ON c.cx = p._x // {w} AND c.cy = p._y // {w}
      WHERE c.n > {cap})""")
    return ("WITH " + ",\n    ".join(ctes) + "\n    "
            + "\n    UNION ALL ".join(sel))
