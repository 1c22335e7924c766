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


# ------------------------------------------------------------------ #
# Triangle counting — degree-ordered orientation (the m^1.5 bound)   #
# ------------------------------------------------------------------ #

def customer_edges(orders: DataFrame, customer: DataFrame) -> DataFrame:
    """Deterministic undirected test graph over customers: each order
    links its customer to the customer indexed h32('t'||orderkey) mod
    C (md5 law); canonical (a < b), distinct, self-loops dropped.
    Used by q133 and its oracle twin."""
    c = customer.count()
    h = h32_col(F.concat(F.lit("t"), F.col("o_orderkey").cast("string")))
    raw = orders.select(F.col("o_custkey").alias("u"), (h % c).alias("v"))
    return (raw.where(F.col("u") != F.col("v"))
            .select(F.least("u", "v").alias("a"),
                    F.greatest("u", "v").alias("b"))
            .distinct())


def triangle_counts(edges: DataFrame) -> DataFrame:
    """Per-node triangle participation over an undirected canonical
    (a < b) edge table -> (node, n_tri), nodes in >= 1 triangle only.

    Scale shape: edges are oriented low-rank -> high-rank by
    (degree, node) — the classic degree orientation that bounds wedge
    enumeration by O(m^1.5) instead of sum(deg^2) on skewed graphs
    (hub nodes get the HIGH rank, so their out-degree stays small).
    Then one self-join builds wedges and one equi-join closes them;
    the rank table is node-sized and broadcast-eligible. The global
    row_number window runs over the NODE table (domain-scale, not the
    corpus — the q119 precedent; swap in sharded_keyed_rank if nodes
    ever rival edges)."""
    deg = (edges.select(F.col("a").alias("node"))
           .unionByName(edges.select(F.col("b").alias("node")))
           .groupBy("node").agg(F.count(F.lit(1)).alias("deg")))
    rk = deg.select(
        "node",
        F.row_number().over(Window.orderBy("deg", "node")).alias("rk"))
    e = (edges
         .join(rk.select(F.col("node").alias("a"),
                         F.col("rk").alias("rka")), "a")
         .join(rk.select(F.col("node").alias("b"),
                         F.col("rk").alias("rkb")), "b"))
    dir_e = (e.select(
        F.when(F.col("rka") < F.col("rkb"), F.col("a")).otherwise(F.col("b")).alias("src"),
        F.when(F.col("rka") < F.col("rkb"), F.col("rka")).otherwise(F.col("rkb")).alias("src_rk"),
        F.when(F.col("rka") < F.col("rkb"), F.col("b")).otherwise(F.col("a")).alias("dst"),
        F.when(F.col("rka") < F.col("rkb"), F.col("rkb")).otherwise(F.col("rka")).alias("dst_rk"))
        .localCheckpoint())  # 3 consumers below — the scan-audit law
    e1 = dir_e.select(F.col("src").alias("x"), F.col("dst").alias("y"),
                      F.col("dst_rk").alias("y_rk"))
    e2 = dir_e.select(F.col("src").alias("x"), F.col("dst").alias("z"),
                      F.col("dst_rk").alias("z_rk"))
    wedge = (e1.join(e2, "x")
             .where(F.col("y_rk") < F.col("z_rk")))
    closer = dir_e.select(F.col("src").alias("y"), F.col("dst").alias("z"))
    tri = wedge.join(closer, ["y", "z"]).select("x", "y", "z")
    return (tri.select(F.explode(F.array("x", "y", "z")).alias("node"))
            .groupBy("node").agg(F.count(F.lit(1)).alias("n_tri")))


# ------------------------------------------------------------------ #
# k-core decomposition — fixed-round peel                             #
# ------------------------------------------------------------------ #

KCORE_K = 4
KCORE_ITERS = 6


def k_core(edges: DataFrame, k: int = KCORE_K,
           iters: int = KCORE_ITERS) -> DataFrame:
    """T-round k-core peel over an undirected canonical (a < b) edge
    table -> (node, deg): nodes surviving `iters` rounds of "drop
    every node with degree < k", with their degree in the surviving
    subgraph (Seidman 1983 cores; the standard iterative peel).

    Determinism law: both engines run EXACTLY `iters` rounds, so the
    result is engine-independent even when the peel has not reached
    its fixpoint; `iters` >= the peel depth gives the true k-core
    (converges in <= |V| rounds, in practice a handful — each round
    either removes a node or is the fixpoint).  At scale, run the
    same loop to fixpoint with a cheap `count()` convergence probe;
    the fixed-T form exists so the DuckDB oracle unrolls into chained
    CTEs (the q119 PageRank precedent).

    Scale shape: each round is ONE groupBy(node) degree agg + TWO
    semi-joins of the edge table against the (small) surviving-node
    set; edges stay hash-partitioned, the node set is
    broadcast-eligible. localCheckpoint per round cuts the join
    lineage exactly like connected_components (operators/dedup.py).
    """
    e = edges.select("a", "b")
    for _ in range(iters):
        deg = (e.select(F.col("a").alias("node"))
               .unionByName(e.select(F.col("b").alias("node")))
               .groupBy("node").agg(F.count(F.lit(1)).alias("deg")))
        alive = deg.where(F.col("deg") >= k).select("node")
        e = (e.join(alive.select(F.col("node").alias("a")), "a", "semi")
             .join(alive.select(F.col("node").alias("b")), "b", "semi")
             .select("a", "b")
             .localCheckpoint(eager=False))
    return (e.select(F.col("a").alias("node"))
            .unionByName(e.select(F.col("b").alias("node")))
            .groupBy("node").agg(F.count(F.lit(1)).cast("long").alias("deg")))


def customer_k_core_sql(orders: str = "orders",
                        customer: str = "customer",
                        k: int = KCORE_K,
                        iters: int = KCORE_ITERS) -> str:
    """DuckDB twin of k_core(customer_edges(...)): the fixed round
    count unrolls into chained CTEs (q119 precedent)."""
    h = h32_sql("'t' || o_orderkey::VARCHAR")
    # every e_i / a_i is referenced 2-3x downstream; DuckDB inlines
    # CTEs per reference, so without MATERIALIZED the unrolled chain
    # expands 3^iters copies of the base scan (measured: fd
    # exhaustion at iters=6) — the CLAUDE.md CTE-materialize gotcha
    ctes = [f"""raw AS MATERIALIZED (
      SELECT o_custkey AS u,
             {h} % (SELECT count(*) FROM {customer}) AS v
      FROM {orders}),
    e0 AS MATERIALIZED (
      SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b
      FROM raw WHERE u <> v)"""]
    for i in range(iters):
        ctes.append(f"""a{i + 1} AS MATERIALIZED (
      SELECT node FROM (
        SELECT node, count(*) AS deg FROM (
          SELECT a AS node FROM e{i}
          UNION ALL SELECT b FROM e{i}) GROUP BY node)
      WHERE deg >= {k}),
    e{i + 1} AS MATERIALIZED (
      SELECT e.a, e.b FROM e{i} e
      JOIN a{i + 1} x ON x.node = e.a
      JOIN a{i + 1} y ON y.node = e.b)""")
    return ("WITH " + ",\n    ".join(ctes) + f"""
    SELECT node, count(*)::BIGINT AS deg FROM (
      SELECT a AS node FROM e{iters}
      UNION ALL SELECT b FROM e{iters})
    GROUP BY node""")


# ------------------------------------------------------------------ #
# Link prediction — resource-allocation index over common neighbors  #
# ------------------------------------------------------------------ #

RA_SCALE = 10 ** 6
RA_MIN_COMMON = 2


def ra_link_prediction(edges: DataFrame, min_common: int = RA_MIN_COMMON,
                       scale: int = RA_SCALE,
                       max_deg: int | None = None) -> DataFrame:
    """Resource-allocation link prediction (Zhou, Lu & Zhang 2009)
    over an undirected canonical (a < b) edge table -> (u, v,
    common_n, ra_score) for NON-adjacent pairs with >= min_common
    common neighbors; ra_score = sum over common neighbors z of
    scale div deg(z) — all integer, so Spark and DuckDB agree
    bit-for-bit (the 1/log(deg) Adamic-Adar variant would drag libm
    into the comparison; RA is the published exact-integer sibling).

    Scale shape: ONE symmetrized adjacency pass -> degree groupBy ->
    wedge self-join keyed on the shared neighbor z -> pair groupBy ->
    anti-join against the edge table. Wedge count is sum(deg^2): on
    hub-skewed graphs pass max_deg to skip hub wedges (the standard
    documented approximation — a hub's 1/deg contribution is
    negligible by construction); default None is exact, which is what
    the oracle checks. The adjacency+degree table is multi-consumer
    -> localCheckpoint (the scan-audit law, CLAUDE.md)."""
    adj = (edges.select(F.col("a").alias("z"), F.col("b").alias("nbr"))
           .unionByName(edges.select(F.col("b").alias("z"),
                                     F.col("a").alias("nbr"))))
    deg = adj.groupBy("z").agg(F.count(F.lit(1)).alias("deg"))
    ad = adj.join(deg, "z")
    if max_deg is not None:
        ad = ad.where(F.col("deg") <= max_deg)
    ad = ad.repartition("z").localCheckpoint()
    left = ad.select("z", F.col("nbr").alias("u"), "deg")
    right = ad.select("z", F.col("nbr").alias("v"))
    wedges = (left.join(right, "z")
              .where(F.col("u") < F.col("v")))
    scored = (wedges.groupBy("u", "v")
              .agg(F.count(F.lit(1)).cast("long").alias("common_n"),
                   F.sum(F.expr(f"{scale} div deg")).cast("long")
                   .alias("ra_score")))
    return (scored
            .join(edges.select(F.col("a").alias("u"),
                               F.col("b").alias("v")),
                  ["u", "v"], "left_anti")
            .where(F.col("common_n") >= min_common))


def customer_ra_links_sql(orders: str = "orders",
                          customer: str = "customer",
                          min_common: int = RA_MIN_COMMON,
                          scale: int = RA_SCALE) -> str:
    """DuckDB twin — identical integer RA law over customer_edges."""
    h = h32_sql("'t' || o_orderkey::VARCHAR")
    return f"""
    WITH raw AS (
      SELECT o_custkey AS u,
             {h} % (SELECT count(*) FROM {customer}) AS v
      FROM {orders}),
    edges AS (
      SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b
      FROM raw WHERE u <> v),
    adj AS (SELECT a AS z, b AS nbr FROM edges
            UNION ALL SELECT b, a FROM edges),
    deg AS (SELECT z, count(*)::BIGINT AS deg FROM adj GROUP BY z),
    ad AS (SELECT adj.z, adj.nbr, deg.deg FROM adj JOIN deg USING (z)),
    scored AS (
      SELECT l.nbr AS u, r.nbr AS v,
             count(*)::BIGINT AS common_n,
             sum({scale} // l.deg)::BIGINT AS ra_score
      FROM ad l JOIN ad r ON l.z = r.z AND l.nbr < r.nbr
      GROUP BY l.nbr, r.nbr)
    SELECT u, v, common_n, ra_score
    FROM scored s
    WHERE NOT EXISTS (SELECT 1 FROM edges e
                      WHERE e.a = s.u AND e.b = s.v)
      AND common_n >= {min_common}
    """


def customer_triangles_sql(orders: str = "orders",
                           customer: str = "customer") -> str:
    """DuckDB twin — identical degree-orientation law."""
    h = h32_sql("'t' || o_orderkey::VARCHAR")
    return f"""
    WITH raw AS (
      SELECT o_custkey AS u,
             {h} % (SELECT count(*) FROM {customer}) AS v
      FROM {orders}),
    edges AS (
      SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b
      FROM raw WHERE u <> v),
    deg AS (SELECT node, count(*)::BIGINT AS deg FROM (
              SELECT a AS node FROM edges
              UNION ALL SELECT b FROM edges) GROUP BY node),
    rk AS (SELECT node, row_number() OVER (ORDER BY deg, node) AS rk
           FROM deg),
    dir_e AS (
      SELECT CASE WHEN ra.rk < rb.rk THEN e.a ELSE e.b END AS src,
             CASE WHEN ra.rk < rb.rk THEN ra.rk ELSE rb.rk END AS src_rk,
             CASE WHEN ra.rk < rb.rk THEN e.b ELSE e.a END AS dst,
             CASE WHEN ra.rk < rb.rk THEN rb.rk ELSE ra.rk END AS dst_rk
      FROM edges e JOIN rk ra ON ra.node = e.a
                   JOIN rk rb ON rb.node = e.b),
    tri AS (
      SELECT e1.x, e1.y, e2.z
      FROM (SELECT src AS x, dst AS y, dst_rk AS y_rk FROM dir_e) e1
      JOIN (SELECT src AS x, dst AS z, dst_rk AS z_rk FROM dir_e) e2
        USING (x)
      JOIN (SELECT src AS y, dst AS z FROM dir_e) e3
        ON e3.y = e1.y AND e3.z = e2.z
      WHERE e1.y_rk < e2.z_rk)
    SELECT node, count(*)::BIGINT AS n_tri FROM (
      SELECT x AS node FROM tri
      UNION ALL SELECT y FROM tri
      UNION ALL SELECT z FROM tri)
    GROUP BY node
    """


# ------------------------------------------------------------------ #
# Multi-source BFS hop distance — fixed-round min-propagation        #
# ------------------------------------------------------------------ #

BFS_ITERS = 6
BFS_SEED_MOD = 41


def hop_distance(edges: DataFrame, seeds: DataFrame,
                 iters: int = BFS_ITERS,
                 weight_col: str | None = None) -> DataFrame:
    """T-round multi-source BFS over an undirected canonical (a < b)
    edge table -> (node, dist): the hop distance from every reached
    node to its nearest seed (unreached nodes emit no row).  The
    proximity signal behind "distance to a trusted/spam domain" and
    graph-expansion dedup policies.

    Determinism law: exactly `iters` rounds of
    dist(v) = min(dist(v), min over neighbors u of dist(u) + 1); each
    round extends the correct frontier by one hop, so the result at
    round T is exact for every node within T hops and absent beyond —
    the graph twin of the q148/q150 one-pixel-per-round stencil law,
    fixed T so the DuckDB oracle unrolls into chained CTEs.

    Scale shape: the dist table carries only REACHED nodes (grows one
    frontier ring per round, never |V| until saturation); each round
    is ONE equi-join of dist onto the symmetrized edge table + ONE
    groupBy(node) min — the textbook distributed BFS (Pregel's hello
    world).  localCheckpoint per round cuts join lineage exactly like
    connected_components (operators/dedup.py); at true scale replace
    the fixed T with a convergence count() probe.

    weight_col: when given, edges carry a positive integer weight and
    the recursion is dist(v) = min(dist(v), dist(u) + w(u,v)) — T
    rounds of Bellman-Ford, exact for every node whose shortest path
    has <= T edges (same fixed-T determinism law; the unweighted form
    is the w == 1 special case)."""
    w = (F.col(weight_col).cast("long") if weight_col
         else F.lit(1).cast("long"))
    sym = (edges.select(F.col("a").alias("u"), F.col("b").alias("v"),
                        w.alias("w"))
           .unionByName(
               edges.select(F.col("b").alias("u"), F.col("a").alias("v"),
                            w.alias("w"))))
    dist = seeds.select("node").distinct() \
        .withColumn("dist", F.lit(0).cast("long"))
    for _ in range(iters):
        hop = (dist.join(sym, dist.node == sym.u)
               .select(F.col("v").alias("node"),
                       (F.col("dist") + F.col("w")).alias("dist")))
        dist = (dist.unionByName(hop)
                .groupBy("node")
                .agg(F.min("dist").cast("long").alias("dist"))
                .localCheckpoint(eager=False))
    return dist


def customer_hop_distance_sql(orders: str = "orders",
                              customer: str = "customer",
                              iters: int = BFS_ITERS,
                              seed_mod: int = BFS_SEED_MOD) -> str:
    """DuckDB twin of hop_distance(customer_edges(...), seeds) with
    seeds = graph nodes where node % seed_mod == 0; the fixed round
    count unrolls into chained MATERIALIZED CTEs (the k_core fd
    lesson: every d_i is referenced twice downstream)."""
    h = h32_sql("'t' || o_orderkey::VARCHAR")
    ctes = [f"""raw AS MATERIALIZED (
      SELECT o_custkey AS u,
             {h} % (SELECT count(*) FROM {customer}) AS v
      FROM {orders}),
    e0 AS MATERIALIZED (
      SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b
      FROM raw WHERE u <> v),
    sym AS MATERIALIZED (
      SELECT a AS u, b AS v FROM e0
      UNION ALL SELECT b, a FROM e0),
    d0 AS MATERIALIZED (
      SELECT node, 0::BIGINT AS dist FROM (
        SELECT DISTINCT u AS node FROM sym) WHERE node % {seed_mod} = 0)"""]
    for i in range(iters):
        ctes.append(f"""d{i + 1} AS MATERIALIZED (
      SELECT node, min(dist)::BIGINT AS dist FROM (
        SELECT node, dist FROM d{i}
        UNION ALL
        SELECT s.v AS node, d.dist + 1 AS dist
        FROM d{i} d JOIN sym s ON s.u = d.node)
      GROUP BY node)""")
    return ("WITH " + ",\n    ".join(ctes)
            + f"\n    SELECT node, dist FROM d{iters}")


# ------------------------------------------------------------------ #
# Label-propagation communities — fixed-round synchronous LPA        #
# ------------------------------------------------------------------ #

LPA_ITERS = 4


def label_propagation(edges: DataFrame, iters: int = LPA_ITERS) -> DataFrame:
    """T-round synchronous label propagation (Raghavan 2007) over an
    undirected canonical (a < b) edge table -> (node, label): start
    with label(v) = v; each round every node adopts the most frequent
    label among its NEIGHBORS, ties broken by the smallest label.
    Communities are the label groups after T rounds — the missing
    classic next to connected_components (components ignore density)
    and k_core (cores ignore assignment).

    Determinism law: synchronous updates + min-label tie-break make
    every round a pure function of the previous labeling, so a fixed
    T is engine-independent (synchronous LPA can oscillate on
    bipartite structure — fixed T sidesteps convergence entirely,
    the q119/q142/q151 precedent).

    Scale shape: each round is ONE equi-join of the (node, label)
    table onto the symmetrized edges + ONE groupBy(v, label) count +
    ONE groupBy(v) struct-max (count, then smallest label) — no
    windows, no node x node anything; localCheckpoint per round cuts
    join lineage (operators/dedup.py precedent)."""
    sym = (edges.select(F.col("a").alias("u"), F.col("b").alias("v"))
           .unionByName(
               edges.select(F.col("b").alias("u"), F.col("a").alias("v"))))
    labels = (sym.select(F.col("u").alias("node")).distinct()
              .withColumn("label", F.col("node").cast("long")))
    for _ in range(iters):
        cnt = (sym.join(labels, sym.u == labels.node)
               .groupBy(F.col("v").alias("node"), "label")
               .agg(F.count(F.lit(1)).alias("cnt")))
        labels = (cnt.groupBy("node")
                  .agg(F.max(F.struct(F.col("cnt"),
                                      (-F.col("label")).alias("nl")))
                       .alias("_m"))
                  .select("node",
                          (-F.col("_m.nl")).cast("long").alias("label"))
                  .localCheckpoint(eager=False))
    return labels


def customer_lpa_sql(orders: str = "orders", customer: str = "customer",
                     iters: int = LPA_ITERS) -> str:
    """DuckDB twin of label_propagation(customer_edges(...)): fixed
    rounds unroll into chained MATERIALIZED CTEs; the struct-max
    argmin is spelled as max-count join + min(label)."""
    h = h32_sql("'t' || o_orderkey::VARCHAR")
    ctes = [f"""raw AS MATERIALIZED (
      SELECT o_custkey AS u,
             {h} % (SELECT count(*) FROM {customer}) AS v
      FROM {orders}),
    e0 AS MATERIALIZED (
      SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b
      FROM raw WHERE u <> v),
    sym AS MATERIALIZED (
      SELECT a AS u, b AS v FROM e0
      UNION ALL SELECT b, a FROM e0),
    l0 AS MATERIALIZED (
      SELECT DISTINCT u::BIGINT AS node, u::BIGINT AS label FROM sym)"""]
    for i in range(iters):
        ctes.append(f"""c{i + 1} AS MATERIALIZED (
      SELECT s.v, l.label, count(*) AS cnt
      FROM sym s JOIN l{i} l ON l.node = s.u
      GROUP BY s.v, l.label),
    m{i + 1} AS MATERIALIZED (
      SELECT v, max(cnt) AS mc FROM c{i + 1} GROUP BY v),
    l{i + 1} AS MATERIALIZED (
      SELECT c.v::BIGINT AS node, min(c.label)::BIGINT AS label
      FROM c{i + 1} c JOIN m{i + 1} m ON m.v = c.v AND c.cnt = m.mc
      GROUP BY c.v)""")
    return ("WITH " + ",\n    ".join(ctes)
            + f"\n    SELECT node, label FROM l{iters}")


def customer_sssp_sql(orders: str = "orders",
                      customer: str = "customer",
                      iters: int = BFS_ITERS,
                      seed_mod: int = BFS_SEED_MOD) -> str:
    """DuckDB twin of the WEIGHTED hop_distance (T-round
    Bellman-Ford) over customer_edges with w = 1 + h32('w'|a|'_'|b)
    % 9 — same unrolled-CTE shape as the unweighted twin."""
    h = h32_sql("'t' || o_orderkey::VARCHAR")
    hw = h32_sql("'w' || a::VARCHAR || '_' || b::VARCHAR")
    ctes = [f"""raw AS MATERIALIZED (
      SELECT o_custkey AS u,
             {h} % (SELECT count(*) FROM {customer}) AS v
      FROM {orders}),
    e0 AS MATERIALIZED (
      SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b
      FROM raw WHERE u <> v),
    ew AS MATERIALIZED (
      SELECT a, b, (1 + {hw} % 9)::BIGINT AS w FROM e0),
    sym AS MATERIALIZED (
      SELECT a AS u, b AS v, w FROM ew
      UNION ALL SELECT b, a, w FROM ew),
    d0 AS MATERIALIZED (
      SELECT node, 0::BIGINT AS dist FROM (
        SELECT DISTINCT u AS node FROM sym) WHERE node % {seed_mod} = 0)"""]
    for i in range(iters):
        ctes.append(f"""d{i + 1} AS MATERIALIZED (
      SELECT node, min(dist)::BIGINT AS dist FROM (
        SELECT node, dist FROM d{i}
        UNION ALL
        SELECT s.v AS node, d.dist + s.w AS dist
        FROM d{i} d JOIN sym s ON s.u = d.node)
      GROUP BY node)""")
    return ("WITH " + ",\n    ".join(ctes)
            + f"\n    SELECT node, dist FROM d{iters}")
