"""Link-graph analytics over crawl output: distributed PageRank and
connected components.

A crawl's link graph (``link_graph`` query / ``extract.links``) is the
input to frontier prioritization — the reference has no analogue (its
frontier is a FIFO deque, ``dude/base.py:361-376``), but a 10^10-URL
frontier needs a priority signal, and PageRank over the already-extracted
edge table is the classic one.

Spark-first shape: each iteration is one join (ranks ⋈ edges on src, both
sides hash-partitioned on the same key) + one hash aggregate on dst. No
driver-side per-node state; the only driver scalar is |V| (one count job
up front). Lineage grows linearly with iterations — for big iteration
counts callers should localCheckpoint/checkpoint every ~10 rounds, same
policy as the crawl loop's seen-set folds (crawl.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def pagerank(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    iters: int = 3,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """PageRank, simple form (dangling mass dropped, not redistributed —
    the variant that needs no per-iteration driver collect; documented
    deviation from the dangling-redistribution form).

    rank_0(v) = 1/N
    rank_{i+1}(v) = (1-d)/N + d * Σ_{(u,v)∈E} rank_i(u) / outdeg(u)

    ``nodes``: one-column DataFrame of the full vertex set; derived as
    src∪dst when omitted (which silently drops isolated vertices — pass it
    explicitly when the graph may have them).
    """
    if nodes is None:
        nodes = (
            edges.select(F.col(src_col).alias("node"))
            .unionByName(edges.select(F.col(dst_col).alias("node")))
            .distinct()
        )
    else:
        nodes = nodes.toDF("node")
    n = nodes.count()  # the one driver scalar; |V| only, no vertex data
    out_deg = edges.groupBy(src_col).agg(F.count("*").alias("deg"))
    deg_edges = edges.join(out_deg, src_col)  # reused across iterations
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for _ in range(iters):
        sums = (
            deg_edges.join(ranks.withColumnRenamed("node", src_col), src_col)
            .groupBy(dst_col)
            .agg(F.sum(F.col("rank") / F.col("deg")).alias("s"))
        )
        ranks = (
            nodes.join(sums, nodes["node"] == sums[dst_col], "left")
            .select(
                "node",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping) * F.coalesce(F.col("s"), F.lit(0.0))
                ).alias("rank"),
            )
        )
    return ranks


def _large_star(edges: DataFrame) -> DataFrame:
    """One large-star round: every node connects its strictly-larger
    neighbors to the minimum of its closed neighborhood (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", alternating algorithm).
    One symmetric explode + one hash aggregate + one equi-join — all keyed
    on the node id, no driver state."""
    nbrs = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    m = (
        nbrs.groupBy("src")
        .agg(F.min("dst").alias("mn"))
        .select("src", F.least(F.col("src"), F.col("mn")).alias("m"))
    )
    return (
        nbrs.join(m, "src")
        .filter(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """One small-star round: orient edges toward the smaller endpoint, then
    every node rewires its smaller neighbors (and itself) to the minimum."""
    oriented = edges.select(
        F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
    )
    m = oriented.groupBy("src").agg(F.min("dst").alias("m"))
    return (
        oriented.join(m, "src")
        .select(
            F.when(F.col("dst") == F.col("m"), F.col("src"))
            .otherwise(F.col("dst"))
            .alias("src"),
            F.col("m").alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def connected_components(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    max_iters: int = 16,
) -> DataFrame:
    """Connected components via the alternating large-star/small-star
    algorithm — the transitive-closure engine behind chained near-dup
    collapse (a one-hop keep-min maps A≈B≈C to TWO representatives; the
    closure maps the whole chain to one).

    Returns ``(node, component)`` for every node in the edge set, where
    ``component`` is the minimum node id of the component.

    100 TB shape: each round is a bounded number of hash-partitioned
    joins/aggregates on the node id (the same BSP shape as :func:`pagerank`);
    the edge set contracts toward star graphs in O(log n) rounds regardless
    of component diameter — unlike naive min-label propagation, whose round
    count is the graph DIAMETER (a 10^6-long url chain would need 10^6
    rounds). Convergence is detected with one scalar action per round
    (count + order-independent xor-of-xxhash64 checksum of the edge set); lineage
    is truncated per round with localCheckpoint, the crawl loop's policy.
    The only driver state is that scalar pair.
    """
    cur = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint()
    )
    prev_sig = None
    for _ in range(max_iters):
        cur = _small_star(_large_star(cur)).localCheckpoint(eager=False)
        # bit_xor (not sum): order-independent, cannot overflow under ANSI
        # mode, and the edge set is distinct so xor-cancellation is moot
        row = cur.agg(
            F.count("*").alias("n"),
            F.expr("bit_xor(xxhash64(src, dst))").alias("h"),
        ).collect()[0]
        sig = (row["n"], row["h"])
        if sig == prev_sig:
            break
        prev_sig = sig
    # converged edge set is a star forest: (node → component-min) for every
    # non-root node; add the roots themselves
    roots = (
        cur.select(F.col("dst").alias("node"))
        .distinct()
        .join(cur.select(F.col("src").alias("node")).distinct(), "node", "left_anti")
        .select("node", F.col("node").alias("component"))
    )
    return (
        cur.select(F.col("src").alias("node"), F.col("dst").alias("component"))
        .unionByName(roots)
    )
