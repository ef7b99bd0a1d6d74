"""Iterative graph algorithms over the warehouse tables — the family the
reference's replay surface cannot express (dodo delegates to Doris SQL;
iterative dataflows need a driver loop). Spark expresses each iteration as
a join+aggregate stage, so K iterations = K shuffles on the edge key, each
bucketable at scale; the companion connected-components operator is
``operators.dedup.dedup_clusters`` (pointer doubling).

``graph_pagerank`` is deliberately EXACT-INTEGER: ranks are scaled to
10^12 and every step uses integer multiply / floor-div / sum, which both
engines evaluate identically — so a fixed 3-iteration unrolled recursive
CTE is a bit-exact DuckDB oracle for an iterative algorithm that is
usually "rows-only checkable". Damping 0.85 is the rational 85/100.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dodo_spark.catalog import load_table
from dodo_spark.registry import register

PR_SCALE = 10**12
PR_ITERS = 3
_TOPK = 30


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Undirected bipartite customer↔supplier trade graph: an edge per
    distinct (custkey, suppkey) pair observed in orders⋈lineitem, emitted
    in both directions. Node ids are disjoint: c<k> customers, s<k>
    suppliers."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = (
        li.join(o, o.o_orderkey == li.l_orderkey)
        .select(
            F.concat(F.lit("c"), F.col("o_custkey")).alias("cnode"),
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("snode"),
        )
        .distinct()
    )
    fwd = pairs.select(F.col("cnode").alias("src"), F.col("snode").alias("dst"))
    return fwd.unionAll(pairs.select(F.col("snode").alias("src"), F.col("cnode").alias("dst")))


@register(
    "graph_pagerank",
    oracle=f"""
    WITH pairs AS (
      SELECT DISTINCT 'c' || o.o_custkey AS cnode, 's' || l.l_suppkey AS snode
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey),
    edges AS (
      SELECT cnode AS src, snode AS dst FROM pairs
      UNION ALL
      SELECT snode AS src, cnode AS dst FROM pairs),
    deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS outdeg
            FROM edges GROUP BY src),
    n AS (SELECT COUNT(*) AS n_nodes FROM deg),
    pr0 AS (SELECT src AS node, {PR_SCALE} // n_nodes AS pr FROM deg, n),
    pr1 AS (
      SELECT e.dst AS node,
             (15 * {PR_SCALE}) // (100 * MIN(n.n_nodes))
               + (85 * CAST(SUM(p.pr // d.outdeg) AS BIGINT)) // 100 AS pr
      FROM edges e
      JOIN pr0 p ON p.node = e.src
      JOIN deg d ON d.src = e.src
      CROSS JOIN n
      GROUP BY e.dst),
    pr2 AS (
      SELECT e.dst AS node,
             (15 * {PR_SCALE}) // (100 * MIN(n.n_nodes))
               + (85 * CAST(SUM(p.pr // d.outdeg) AS BIGINT)) // 100 AS pr
      FROM edges e
      JOIN pr1 p ON p.node = e.src
      JOIN deg d ON d.src = e.src
      CROSS JOIN n
      GROUP BY e.dst),
    pr3 AS (
      SELECT e.dst AS node,
             (15 * {PR_SCALE}) // (100 * MIN(n.n_nodes))
               + (85 * CAST(SUM(p.pr // d.outdeg) AS BIGINT)) // 100 AS pr
      FROM edges e
      JOIN pr2 p ON p.node = e.src
      JOIN deg d ON d.src = e.src
      CROSS JOIN n
      GROUP BY e.dst)
    SELECT node, pr FROM pr3
    ORDER BY pr DESC, node
    LIMIT {_TOPK}
    """,
    doc=f"Exact-integer PageRank ({PR_ITERS} unrolled iterations, damping "
    "85/100, ranks scaled to 10^12) over the bipartite customer↔supplier "
    "trade graph, top-30 by final rank. Every arithmetic step is integer "
    "multiply / floor-div / bigint sum — bit-identical across engines, so "
    "an ITERATIVE algorithm gets a full value-hash oracle instead of the "
    "usual rows-only tier. Spark plan: each iteration is one "
    "edges⋈ranks broadcast-or-shuffle hash join + one aggregate on dst; "
    "the edge list shuffles ONCE to build degrees and is reused; at "
    "100 TB, pre-partitioning edges and ranks on the node key makes every "
    "iteration a co-partitioned join with no re-shuffle of the edge set — "
    "the standard Pregel-on-SQL layout. No dangling nodes by "
    "construction (every node has >=1 edge in an undirected graph).",
)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = _edges(spark, sf_dir)
    # edges feeds the degree build plus one join per iteration; checkpoint
    # so the multi-consumer plan scans and dedups the pair list once
    # instead of once per iteration (same idiom as dedup_clusters).
    edges = edges.localCheckpoint(eager=False)
    # deg feeds the node count, the contribution base AND the rank init;
    # checkpoint it so the degree aggregate runs once for all three
    deg = edges.groupBy("src").agg(
        F.count("*").alias("outdeg")
    ).localCheckpoint(eager=False)
    # |V| is ONE scalar consumed by every iteration's teleport term: pull
    # it to the driver once (Python floor-div on positive ints == Spark
    # div bit-for-bit) instead of re-joining a 1-row broadcast per
    # iteration — r14 interleaved A/B (with the dst-repartition below):
    # 0.85x of the r13 form, identical top-30
    n_val = deg.count()
    teleport = (15 * PR_SCALE) // (100 * n_val)
    ranks = deg.select(
        F.col("src").alias("node"),
        F.lit(PR_SCALE // n_val).cast("bigint").alias("pr"),
    )
    # the (edges ⋈ deg) contribution base is consumed once per iteration;
    # checkpoint it so the join runs once instead of PR_ITERS times
    # (measured at sf0.1: 9.4→5.6 s cold, 5.2→4.7 s warm). A
    # repartition("src") before the checkpoint was tried and REVERTED:
    # the local checkpoint does not carry the hash partitioning into the
    # iteration joins here, so it paid an extra full shuffle for nothing
    # (3.5→4.5 s warm at sf0.1). On a cluster the same intent is
    # expressed by bucketing the edge list on src (writers.write_bucketed).
    # broadcast the PER-NODE side (deg here, ranks in the iteration):
    # without the hint the planner broadcast the checkpointed EDGE side
    # (unknown LogicalRDD stats), shipping the ~10x-bigger contribution
    # base once per iteration (guide §3.1: broadcast the side that
    # fits). Node tables are |V|-sized vs the |E|-sized edge list; at
    # the extreme scale where even |V| outgrows a broadcast, the
    # documented posture is the bucketed co-partitioned layout below.
    # r14: the contribution base is REPARTITIONED ON dst instead of
    # checkpointed — every iteration's subtree below this exchange is
    # canonically identical, so runtime exchange reuse computes the
    # edges⋈deg join + shuffle once for all PR_ITERS iterations (the
    # checkpoint achieved the same single computation but DROPPED the
    # partitioning metadata in Spark 4.1, so each iteration paid its own
    # groupBy(dst) exchange); with the base already hash-partitioned on
    # dst and the broadcast join preserving partitioning, the
    # per-iteration aggregate needs NO further shuffle. On a cluster the
    # same intent is a bucketed-on-dst edge layout
    # (writers.write_bucketed). Interleaved A/B at sf0.1 (two sessions):
    # repartition+driver-n 0.85x vs the r13 checkpoint form, top-30
    # identical.
    contrib_base = edges.join(F.broadcast(deg), "src").repartition("dst")
    for _ in range(PR_ITERS):
        ranks = (
            contrib_base.join(F.broadcast(ranks), ranks.node == F.col("src"))
            .select(
                F.col("dst"),
                F.expr("pr div outdeg").alias("contrib"),
            )
            .groupBy("dst")
            .agg(F.sum("contrib").cast("bigint").alias("sum_contrib"))
            .select(
                F.col("dst").alias("node"),
                (
                    F.lit(teleport).cast("bigint")
                    + F.expr("(85 * sum_contrib) div 100")
                ).alias("pr"),
            )
        )
    return ranks.orderBy(F.col("pr").desc(), "node").limit(_TOPK)


@register(
    "graph_triangles",
    oracle="""
    WITH p AS (
      SELECT a.l_suppkey AS u, b.l_suppkey AS v,
             CAST(COUNT(DISTINCT a.l_orderkey) AS BIGINT) AS s
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
      GROUP BY 1, 2
    ), tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS np, CAST(SUM(s) AS BIGINT) AS ts
      FROM p
    ), e AS (
      SELECT u, v FROM p, tot WHERE s * np > ts
    ), nodes AS (
      SELECT u AS node FROM e UNION SELECT v FROM e
    ), deg AS (
      SELECT node, CAST(COUNT(*) AS BIGINT) AS d
      FROM (SELECT u AS node FROM e UNION ALL SELECT v FROM e)
      GROUP BY node
    ), tri AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
      FROM e e1 JOIN e e2 ON e2.u = e1.v
                JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
    ), agg AS (
      SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM nodes) AS n_nodes,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM e) AS n_edges,
             (SELECT CAST(SUM(d * (d - 1) / 2) AS BIGINT) FROM deg) AS n_wedges,
             (SELECT n_triangles FROM tri) AS n_triangles
    )
    SELECT n_nodes, n_edges, n_wedges, n_triangles,
           CAST(3 * n_triangles AS DOUBLE) / n_wedges AS global_clustering
    FROM agg
    """,
    doc="Triangle counting + global clustering coefficient over the "
    "co-supplier graph — the third graph-family member beside "
    "graph_pagerank and dedup_clusters' connected components. Edges are "
    "supplier pairs sharing an order (lineitem self-equi-join on the "
    "order key) kept only at ABOVE-AVERAGE co-occurrence support: "
    "s * n_pairs > sum_s is a pure integer comparison, so the threshold "
    "is scale-free AND engine-exact (no float average), and it keeps "
    "the graph sparse instead of the near-complete raw co-occurrence "
    "clique. Each triangle is counted ONCE via id-ordered edge "
    "orientation (u < v): edges (u,v),(v,w) wedge-join on the shared "
    "middle node, then a closing equi-join probes (u,w) — the classic "
    "compact-forward shape, two shuffle equi-joins and ZERO all-pairs "
    "products. Wedge count comes from the degree table (sum d*(d-1)/2, "
    "exact integers), never materializing open wedges; clustering = "
    "3*triangles/wedges is one IEEE division on exact integers. At "
    "100 TB: orient by DEGREE instead of id (low-degree endpoint first) "
    "to bound the heaviest wedge posting list — the standard skew "
    "refinement; the joins bucket on the node key either way. Scalar "
    "assembly is 1-row broadcasts (whitelisted BNLJ audit pattern).",
)
def graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    a, b = li.alias("a"), li.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_suppkey") < F.col("b.l_suppkey")),
        )
        .groupBy(
            F.col("a.l_suppkey").alias("u"), F.col("b.l_suppkey").alias("v")
        )
        .agg(F.countDistinct("a.l_orderkey").alias("s"))
        # consumed twice (support total + edge filter): checkpoint so the
        # lineitem self-join + distinct-count runs once, not once per branch
        .localCheckpoint(eager=False)
    )
    tot = pairs.agg(
        F.count("*").alias("np"), F.sum("s").cast("bigint").alias("ts")
    )
    e = (
        pairs.crossJoin(F.broadcast(tot))
        .filter(F.col("s") * F.col("np") > F.col("ts"))
        .select("u", "v")
        .localCheckpoint(eager=False)
    )
    ends = e.select(F.col("u").alias("node")).unionAll(
        e.select(F.col("v").alias("node"))
    )
    deg = ends.groupBy("node").agg(F.count("*").alias("d"))
    n_nodes = deg.agg(F.count("*").alias("n_nodes"))
    n_edges = e.agg(F.count("*").alias("n_edges"))
    n_wedges = deg.agg(
        F.sum((F.col("d") * (F.col("d") - 1)) / 2).cast("bigint").alias("n_wedges")
    )
    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    tri = (
        e1.join(e2, F.col("e2.u") == F.col("e1.v"))
        .join(
            e3,
            (F.col("e3.u") == F.col("e1.u")) & (F.col("e3.v") == F.col("e2.v")),
        )
        .agg(F.count("*").alias("n_triangles"))
    )
    return (
        n_nodes.crossJoin(F.broadcast(n_edges))
        .crossJoin(F.broadcast(n_wedges))
        .crossJoin(F.broadcast(tri))
        .select(
            "n_nodes",
            "n_edges",
            "n_wedges",
            "n_triangles",
            ((F.lit(3) * F.col("n_triangles")).cast("double") / F.col("n_wedges")).alias(
                "global_clustering"
            ),
        )
    )
