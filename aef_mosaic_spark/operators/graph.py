"""Domain-authority PageRank — fixed-iteration power method in exact
integer arithmetic, oracle-twinned.

Why this op: web-curation pipelines rank source domains by link
authority and use the score as a quality prior (the CommonCrawl /
RefinedWeb-style curation signal; Page et al. 1999). The engine
already scores documents intrinsically (q85/q99/q113); this adds the
graph-structural signal over the `source` column.

Graph law (deterministic, derivable in both engines): nodes = the
distinct sources, indexed 0..N-1 in lexicographic order; every
document emits ONE link from its own source to the source whose index
is h32(doc_id) mod N (the md5 h32 law, functions/hashes.py); edge
weight = link count. Every node has out-links by construction, so
there is no dangling-mass branch.

Rank law (SCALE = 10^12, damping 85/100, T fixed iterations — all
integer, so Spark and DuckDB agree bit-for-bit):
    r_0(v)     = SCALE div N
    share_i(u) = r_i(u) div out_w(u)
    in_i(v)    = sum_u w(u, v) * share_i(u)
    r_{i+1}(v) = (15 * (SCALE div N)) div 100 + (85 * in_i(v)) div 100
Bounds: r <= SCALE, in <= N * SCALE, 85 * in < 2^63 for N < 10^5
domains at SCALE 10^12 (document larger node sets by lowering SCALE).

Scale shape: ranks live partitioned by node; each iteration is ONE
equi-join of the (node, rank) table onto the pre-grouped edge table
plus ONE groupBy(dst) — the textbook distributed power method. The
node-index window runs over the DOMAIN table (thousands of rows at
web scale, not documents); if the node table ever rivals the corpus,
swap in sampling.sharded_keyed_rank. The per-iteration
localCheckpoint cuts join lineage exactly like connected_components
(operators/dedup.py).
"""
from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashes import h32_col, h32_sql

PR_SCALE = 10 ** 12
PR_DAMP_NUM = 85          # /100
PR_ITERS = 5


def domain_link_edges(docs: DataFrame, doc_id: str = "doc_id",
                      source: str = "source") -> DataFrame:
    """The deterministic domain link graph -> (src, dst, w)."""
    nodes = docs.select(F.col(source).alias("node")).distinct()
    idx = F.row_number().over(Window.orderBy("node")) - 1
    nodes = nodes.select("node", idx.alias("idx"))
    n = nodes.count()
    links = docs.select(
        F.col(source).alias("src"),
        (h32_col(F.col(doc_id).cast("string")) % n).alias("dst_idx"))
    return (links.join(F.broadcast(nodes),
                       links.dst_idx == nodes.idx)
            .groupBy("src", F.col("node").alias("dst"))
            .agg(F.count(F.lit(1)).cast("long").alias("w")))


def pagerank(edges: DataFrame, iters: int = PR_ITERS,
             scale: int = PR_SCALE) -> DataFrame:
    """Fixed-iteration integer PageRank over a weighted edge table ->
    (node, rank_scaled). Every src must have out-weight > 0 (holds
    for domain_link_edges by construction)."""
    nodes = (edges.select(F.col("src").alias("node"))
             .unionByName(edges.select(F.col("dst").alias("node")))
             .distinct())
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank_scaled", F.lit(0).cast("long"))
    base = (15 * (scale // n)) // 100
    outw = edges.groupBy("src").agg(F.sum("w").cast("long").alias("out_w"))
    ew = edges.join(outw, "src")
    ranks = nodes.withColumn("rank_scaled",
                             F.lit(scale // n).cast("long"))
    for _ in range(iters):
        contrib = (ew.join(ranks, ew.src == ranks.node)
                   .select(F.col("dst").alias("node"),
                           (F.col("w") * F.expr("rank_scaled div out_w"))
                           .alias("c")))
        inflow = contrib.groupBy("node").agg(
            F.sum("c").cast("long").alias("in_r"))
        ranks = (nodes.join(inflow, "node", "left")
                 .select("node",
                         (F.lit(base)
                          + F.expr(f"({PR_DAMP_NUM} * coalesce(in_r, 0))"
                                   f" div 100")).cast("long")
                         .alias("rank_scaled"))
                 .localCheckpoint(eager=False))
    return ranks


def domain_pagerank(docs: DataFrame, doc_id: str = "doc_id",
                    source: str = "source",
                    iters: int = PR_ITERS) -> DataFrame:
    """domain_link_edges + pagerank -> (node, rank_scaled)."""
    return pagerank(domain_link_edges(docs, doc_id, source), iters=iters)


def domain_pagerank_sql(src_table: str, doc_id: str = "doc_id",
                        source: str = "source", iters: int = PR_ITERS,
                        scale: int = PR_SCALE) -> str:
    """DuckDB twin: the fixed iteration count unrolls into chained
    CTEs; `//` on BIGINT integer-divides (the DOUBLE `//` trap does
    not apply), every sum is ::BIGINT-cast."""
    h = h32_sql(f"{doc_id}::VARCHAR")
    ctes = [f"""nodes AS (
        SELECT node, (row_number() OVER (ORDER BY node) - 1)::BIGINT AS idx
        FROM (SELECT DISTINCT {source} AS node FROM {src_table})),
    nn AS (SELECT count(*)::BIGINT AS n FROM nodes),
    links AS (SELECT d.{source} AS src,
                     {h} % (SELECT n FROM nn) AS dst_idx
              FROM {src_table} d),
    edges AS (SELECT src, nd.node AS dst, count(*)::BIGINT AS w
              FROM links JOIN nodes nd ON nd.idx = links.dst_idx
              GROUP BY src, nd.node),
    outw AS (SELECT src, sum(w)::BIGINT AS out_w
             FROM edges GROUP BY src),
    r0 AS (SELECT node, ({scale} // (SELECT n FROM nn))::BIGINT
                  AS rank_scaled FROM nodes)"""]
    for i in range(iters):
        ctes.append(f"""r{i + 1} AS (
        SELECT nd.node,
               ((15 * ({scale} // (SELECT n FROM nn))) // 100
                + ({PR_DAMP_NUM} * coalesce(s.in_r, 0)) // 100)::BIGINT
                 AS rank_scaled
        FROM nodes nd LEFT JOIN (
            SELECT e.dst AS node,
                   sum(e.w * (r.rank_scaled // o.out_w))::BIGINT AS in_r
            FROM edges e
            JOIN r{i} r ON r.node = e.src
            JOIN outw o ON o.src = e.src
            GROUP BY e.dst) s ON s.node = nd.node)""")
    return ("WITH " + ",\n    ".join(ctes)
            + f"\n    SELECT node, rank_scaled FROM r{iters}")
