"""Link-graph analytics over crawl output: distributed PageRank.

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
