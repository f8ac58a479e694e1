"""URL frontier: canonicalization, hashing, seen-set dedupe, seeding.

The reference's frontier is a ``collections.deque`` popped FIFO with **no**
visited-set (``dude/base.py:75``, ``:361-376`` — a URL can be re-enqueued).
At 10^10-URL scale the frontier is a table and dedupe is mandatory
(BASELINE.json north_rule): candidates are anti-joined against a
hash-partitioned *seen* set keyed by ``xxhash64(canonical_url)``.
FIFO/BFS order is carried explicitly as ``(depth, seq)`` columns — never
partition order.

Frontier schema::

    url string, url_hash bigint, host string, depth int, priority int,
    seq bigint, method string, status string, round int

``priority`` (north_rule "priority queue"): higher fetches first WITHIN a
politeness-budget-limited round — the per-host budget window ranks by
(priority desc, depth, seq), so the priority queue is realized as the same
host-bucketed window ranking that enforces crawl delays, not a driver-side
heap. Default 0 everywhere = exact reference FIFO order; a crawl assigns
priorities to discovered links via ``CrawlConfig.priority_expr``.
"""

from __future__ import annotations

from typing import Iterable, Optional, Sequence

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

FRONTIER_COLS = [
    "url", "url_hash", "host", "depth", "priority", "seq", "method", "status", "round",
]


def canonicalize(col):
    """Minimal canonical form: strip fragment + trailing-slash normalize
    (the reference's only normalizations are ``urljoin`` absolutization and
    ``rstrip('/')`` self-compare, ``beautifulsoup_scraper.py:82-85``)."""
    return F.regexp_replace(col, r"#.*$", "")


def with_url_meta(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Attach host + 64-bit hash (JVM-side, codegen'd — no Python)."""
    return df.withColumn("host", F.parse_url(F.col(url_col), F.lit("HOST"))).withColumn(
        "url_hash", F.xxhash64(F.col(url_col))
    )


def seed_frontier(
    spark: SparkSession,
    urls: Sequence[str],
    requests: Optional[Iterable] = None,
) -> DataFrame:
    """Round-0 frontier from the seed list (reference ``base.py:402-406``:
    ``deque(urls)`` preserves order → ``seq``). ``@start_requests`` seeds are
    drained *after* plain URLs (``optional/utils.py:48-66``) → higher seq."""
    rows = [(u, i, "GET") for i, u in enumerate(urls)]
    base = len(rows)
    for j, req in enumerate(requests or []):
        rows.append((req.url, base + j, req.method))
    df = spark.createDataFrame(rows, "url string, seq long, method string")
    df = df.coalesce(max(1, min(len(rows) // 4096 + 1, 32)))
    return (
        with_url_meta(df)
        .withColumn("depth", F.lit(0))
        .withColumn("priority", F.lit(0))
        .withColumn("status", F.lit("pending"))
        .withColumn("round", F.lit(0))
        .select(*FRONTIER_COLS)
    )


def allowed_domains_filter(frontier: DataFrame, allowed_hosts: DataFrame) -> DataFrame:
    """P1 (``base.py:364-367``): drop URLs whose host is outside the seed
    hosts. Broadcast left-semi join — the allowed set is tiny by
    construction (distinct seed hosts)."""
    return frontier.join(F.broadcast(allowed_hosts), on="host", how="left_semi")


def dedupe_candidates(
    candidates: DataFrame,
    seen: Optional[DataFrame],
    order_cols: Sequence[str] = ("depth", "seq"),
    broadcast_seen: bool = False,
) -> DataFrame:
    """L5: anti-join candidates against the seen set on ``url_hash``.

    Also dedupes *within* the batch keeping the smallest ``order_cols``
    (first discovery wins — FIFO semantics). The crawl driver tracks the
    seen-set size exactly (it assigns every seq), so it sets
    ``broadcast_seen`` deterministically while the set is small — a
    broadcast-hash anti-join that never shuffles the candidate side. At
    cluster scale both sides are hash-partitioned on ``url_hash`` so the
    anti-join is a co-located shuffle; a Bloom sidecar pre-filter is a
    planned optimization (SURVEY §4.3) — the exact anti-join remains the
    authority either way.
    """
    w = Window.partitionBy("url_hash").orderBy(*order_cols)
    first = (
        candidates.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    if seen is None:
        return first
    seen_keys = seen.select("url_hash")
    if broadcast_seen:
        seen_keys = F.broadcast(seen_keys)
    return first.join(seen_keys, on="url_hash", how="left_anti")
