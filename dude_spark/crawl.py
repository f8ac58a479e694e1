"""The crawl driver loop — BSP supersteps over the frontier table.

The reference's execution loop (``dude/base.py:361-376`` +
``optional/beautifulsoup_scraper.py:58-94``) pops one URL at a time:
robots gate → sleep(crawl_delay) → fetch → parse → follow links → extract →
save. Here one crawl **round** is one DataFrame job over the whole pending
frontier (SURVEY §3.4):

    pending → allowed-domains semi-join → robots gate (broadcast dim)
            → per-host budget rank (window) → fetch-join against the pages
              table → extraction mapInPandas (one HTML parse per page)
            → results append  +  new links → canonicalize → seen anti-join
            → seq assignment → next frontier

State (frontier / seen / results / round metrics) is checkpointed per round
to parquet directories when ``state_dir`` is set — the sandbox stand-in for
Iceberg snapshot commits — making the crawl resumable from the last committed
round. Without ``state_dir`` the loop keeps state in memory and truncates
lineage with ``localCheckpoint`` each round.

Ordering parity: the reference's FIFO order is reproduced exactly by the
``(depth, seq)`` columns; ``seq`` is a dense global append order assigned by
a distributed two-pass zip-index (range repartition → per-partition counts →
offset + local row_number) — no single-task global window.
"""

from __future__ import annotations

import os
import shutil
import time
from dataclasses import dataclass, field
from typing import List, Optional, Sequence, Union

from pyspark.sql import DataFrame, SparkSession, functions as F

from .api import CompiledPlan, Scraper
from .extract import EXTRACT_SCHEMA, make_extract_iterator
from .frontier import (
    FRONTIER_COLS,
    allowed_domains_filter,
    canonicalize,
    dedupe_candidates,
    seed_frontier,
    with_url_meta,
)
from .politeness import adblock_filter, budget_rank, compile_robots, robots_gate

RESULT_SCHEMA = EXTRACT_SCHEMA + ", depth int, seq bigint, round int"


@dataclass
class CrawlConfig:
    follow_urls: bool = True
    link_mode: str = "anchors"  # 'anchors' (bs4) | 'all' (lxml iterlinks)
    pages: int = 1               # S6: navigate-loop page cap per URL (scraper.py:35)
    adblock_rules: Optional[List[str]] = None  # P4 blocklist
    max_rounds: int = 64
    round_seconds: int = 60          # politeness budget window per round
    max_per_host: Optional[int] = None
    dedupe: str = "seen"             # 'seen' | 'none' (reference parity)
    state_dir: Optional[str] = None  # parquet round checkpoints (resumable)
    ignore_robots_txt: bool = False
    frontier_partitions: Optional[int] = None
    # materialize the gated+ranked frontier per round. False (default) keeps
    # the round at ~5 Spark jobs — the gate/rank pipeline is narrow and
    # re-evaluates cheaply from the frontier checkpoint. Set True when the
    # per-round frontier is huge enough that recomputing the politeness
    # window twice costs more than one extra materialization.
    persist_ranked: bool = False


@dataclass
class RoundMetrics:
    round: int
    fetched: int
    extracted_rows: int
    new_urls: int
    deferred: int
    seconds: float


@dataclass
class CrawlResult:
    results: DataFrame            # EXTRACT_SCHEMA + depth/seq/round, kind='data'
    trace: DataFrame              # fetched URLs: url, depth, seq, round (FIFO order = seq)
    seen: DataFrame               # url, url_hash
    metrics: List[RoundMetrics] = field(default_factory=list)


def assign_global_seq(
    df: DataFrame, order_cols: Sequence[str], start: int, out_col: str = "seq"
) -> tuple[DataFrame, int]:
    """Dense global sequence in ``order_cols`` order, starting at ``start``.

    Distributed zip-index: range-repartition on the order key, count rows per
    partition (one cheap pass), broadcast cumulative offsets, then local
    row_number inside mapInPandas. O(n/p) per task — no global single
    partition, unlike ``row_number() over (ORDER BY ...)``.

    Returns ``(numbered_df, total_rows)`` — the total comes free from the
    sizing pass, so callers never need a separate ``count()``.
    """
    import pandas as pd

    n_part = max(df.sparkSession.sparkContext.defaultParallelism, 1)
    # NOTE: repartitionByRange samples its input to pick boundaries, so the
    # upstream pipeline is evaluated twice. Callers should hand in a plan
    # anchored on checkpointed/cached data (the crawl loop reads from the
    # round's extraction checkpoint, so the re-evaluated part is narrow).
    parted = df.repartitionByRange(n_part, *[F.col(c) for c in order_cols]).sortWithinPartitions(
        *[F.col(c) for c in order_cols]
    )
    # The partition id must travel WITH the rows: when the numbered output is
    # later composed into a bigger plan (e.g. unioned with another DataFrame)
    # TaskContext.partitionId() is re-indexed and would misalign the offsets.
    parted = parted.withColumn("_pid", F.spark_partition_id())
    parted = parted.localCheckpoint(eager=True)  # pin partitioning for both passes

    sizes = {
        r["_pid"]: r["n"]
        for r in parted.groupBy("_pid").agg(F.count("*").alias("n")).collect()
    }
    offsets = {}
    acc = start
    for pid in sorted(sizes):
        offsets[pid] = acc
        acc += sizes[pid]
    total = acc - start

    schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in parted.schema.fields
        if f.name != "_pid"
    )

    def number(batches):
        off = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if off is None:
                off = offsets[int(pdf["_pid"].iat[0])]
            pdf = pdf.drop(columns=["_pid"])
            pdf[out_col] = range(off, off + len(pdf))
            off += len(pdf)
            yield pdf

    out_schema = f"{schema}, {out_col} bigint"
    return parted.mapInPandas(number, out_schema), total


class CrawlJob:
    def __init__(
        self,
        spark: SparkSession,
        scraper: Scraper,
        pages: DataFrame,
        robots: Optional[DataFrame] = None,
        config: Optional[CrawlConfig] = None,
    ):
        self.spark = spark
        self.scraper = scraper
        self.plan: CompiledPlan = scraper.compile()
        self.pages = pages.select("url", "html")
        self.robots = robots
        self.cfg = config or CrawlConfig()

    # -- state checkpointing ---------------------------------------------
    def _round_dir(self, kind: str, rnd: int) -> str:
        return os.path.join(self.cfg.state_dir, kind, f"round={rnd}")

    def _persist(self, df: DataFrame, kind: str, rnd: int) -> DataFrame:
        if self.cfg.state_dir:
            path = self._round_dir(kind, rnd)
            df.write.mode("overwrite").parquet(path)
            return self.spark.read.parquet(path)
        return df.localCheckpoint(eager=True)

    def last_committed_round(self) -> int:
        """Resume support: highest round with a committed frontier dir."""
        if not self.cfg.state_dir:
            return -1
        base = os.path.join(self.cfg.state_dir, "frontier")
        if not os.path.isdir(base):
            return -1
        rounds = [
            int(d.split("=", 1)[1])
            for d in os.listdir(base)
            if d.startswith("round=") and os.path.exists(os.path.join(base, d, "_SUCCESS"))
        ]
        return max(rounds, default=-1)

    # -- the loop -----------------------------------------------------------
    def run(self, urls: Sequence[str], resume: bool = False) -> CrawlResult:
        cfg = self.cfg
        spark = self.spark
        self.scraper.run_event("startup")

        start_round = 0
        if resume and (r := self.last_committed_round()) >= 0:
            frontier = spark.read.parquet(self._round_dir("frontier", r))
            # seen = every URL ever enqueued = union of all committed
            # frontier snapshots, distinct on url_hash
            base = os.path.join(cfg.state_dir, "frontier")
            seen = (
                spark.read.parquet(os.path.join(base, "round=*"))
                .select("url", "url_hash")
                .dropDuplicates(["url_hash"])
            )
            start_round = r + 1
        else:
            if cfg.state_dir and os.path.isdir(cfg.state_dir):
                shutil.rmtree(cfg.state_dir)
            frontier = seed_frontier(spark, list(urls), self.scraper.requests)
            frontier = self._persist(frontier, "frontier", -1)
            seen = frontier.select("url", "url_hash")

        allowed_hosts = (
            seed_frontier(spark, list(urls), self.scraper.requests)
            .select("host")
            .distinct()
        )
        allowed_hosts = F.broadcast(allowed_hosts)
        # robots parsed ONCE per host (vs per-URL re-fetch in the reference,
        # base.py:383-388); cached + broadcast into every round's gate.
        compiled_robots = None
        if self.robots is not None and not cfg.ignore_robots_txt:
            compiled_robots = compile_robots(self.robots).cache()
            compiled_robots.count()

        extract_it = make_extract_iterator(
            self.plan,
            follow_urls=cfg.follow_urls,
            link_mode=cfg.link_mode,
            passthrough=["depth", "seq"],
        )
        result_schema = EXTRACT_SCHEMA + ", depth int, seq bigint"

        results_parts: List[DataFrame] = []
        trace_parts: List[DataFrame] = []
        metrics: List[RoundMetrics] = []
        max_seq = int(
            frontier.agg(F.coalesce(F.max("seq"), F.lit(-1))).collect()[0][0]
        )
        n_pending = frontier.count()

        for rnd in range(start_round, cfg.max_rounds):
            t0 = time.time()
            if n_pending == 0:
                break

            gated = allowed_domains_filter(frontier, allowed_hosts)
            if cfg.adblock_rules:
                gated = adblock_filter(gated, cfg.adblock_rules)
            gated = robots_gate(gated, compiled_robots)
            ranked = budget_rank(
                gated, round_seconds=cfg.round_seconds, max_per_host=cfg.max_per_host
            )
            if cfg.persist_ranked:
                ranked = self._persist(ranked, "ranked", rnd)
            fetch_set = ranked.filter(F.col("fetch_now")).select(*FRONTIER_COLS)
            deferred = (
                ranked.filter(~F.col("fetch_now"))
                .select(*FRONTIER_COLS)
                .withColumn("round", F.lit(rnd + 1))
            )
            counts = ranked.groupBy("fetch_now").count().collect()
            n_fetched = sum(r["count"] for r in counts if r["fetch_now"])
            n_deferred = sum(r["count"] for r in counts if not r["fetch_now"])

            # The fetch: frontier ⋈ pages. AQE broadcasts the (budget-capped)
            # frontier side when small; at warehouse scale both sides are
            # bucketed by url_hash (SURVEY §2.6).
            fetched = fetch_set.join(self.pages, on="url", how="inner")

            self.scraper.run_event("pre-setup")
            extracted = fetched.select("url", "html", "depth", "seq").mapInPandas(
                extract_it, schema=result_schema
            )
            extracted = self._persist(extracted, "extracted", rnd)
            self.scraper.run_event("post-setup")

            extractions = [extracted]
            # S6 navigate loop: re-extract up to cfg.pages times following the
            # first matching navigate rule (driver-bounded sub-loop; stops on
            # no-match/unchanged URL — the kernel already applies O4)
            if cfg.pages > 1 and self.plan.navigate_rules:
                current = extracted
                for pn in range(2, cfg.pages + 1):
                    nav = (
                        current.filter(F.col("kind") == "navigate")
                        .select(
                            canonicalize(F.col("link")).alias("url"),
                            "depth", "seq",
                        )
                        .dropDuplicates(["url"])
                    )
                    fetched_n = nav.join(self.pages, on="url", how="inner")
                    if fetched_n.isEmpty():
                        break
                    current = self._persist(
                        fetched_n.select("url", "html", "depth", "seq")
                        .withColumn("page_number", F.lit(pn))
                        .mapInPandas(extract_it, schema=result_schema),
                        f"extracted_p{pn}", rnd,
                    )
                    extractions.append(current)
                if len(extractions) > 1:
                    extracted = extractions[0]
                    for e in extractions[1:]:
                        extracted = extracted.unionByName(e)

            data_rows = extracted.filter(F.col("kind") == "data").withColumn(
                "round", F.lit(rnd)
            )
            results_parts.append(data_rows)
            trace_parts.append(
                fetch_set.select("url", "depth", "seq").withColumn("round", F.lit(rnd))
            )

            # -- frontier expansion -----------------------------------------
            new_frontier = None
            n_new = 0
            if cfg.follow_urls:
                links = (
                    extracted.filter(F.col("kind") == "link")
                    .select(
                        canonicalize(F.col("link")).alias("url"),
                        (F.col("depth") + 1).alias("depth"),
                        F.col("seq").alias("parent_seq"),
                        F.col("link_seq"),
                    )
                )
                links = with_url_meta(links)
                links = allowed_domains_filter(links, allowed_hosts)
                if cfg.dedupe == "seen":
                    cands = dedupe_candidates(
                        links, seen, order_cols=("parent_seq", "link_seq")
                    )
                else:
                    cands = links
                new_frontier, n_new = assign_global_seq(
                    cands, ["parent_seq", "link_seq"], start=max_seq + 1
                )
                new_frontier = (
                    new_frontier.withColumn("method", F.lit("GET"))
                    .withColumn("status", F.lit("pending"))
                    .withColumn("round", F.lit(rnd + 1))
                    .select(*FRONTIER_COLS)
                )
                prev_max = max_seq
                max_seq += n_new

            frontier = deferred if new_frontier is None else deferred.unionByName(new_frontier)
            frontier = self._persist(frontier, "frontier", rnd)
            if cfg.follow_urls and cfg.dedupe == "seen" and n_new:
                # the persisted frontier is the durable source for the seen
                # delta (rows with seq > prev_max are this round's additions)
                # — keeps the seen lineage anchored on checkpoints/parquet.
                seen = seen.unionByName(
                    frontier.filter(F.col("seq") > prev_max).select("url", "url_hash")
                )
            n_pending = n_deferred + n_new

            metrics.append(
                RoundMetrics(
                    round=rnd,
                    fetched=n_fetched,
                    extracted_rows=-1,  # not counted in the hot loop
                    new_urls=n_new,
                    deferred=n_deferred,
                    seconds=time.time() - t0,
                )
            )
            if cfg.state_dir:
                import json

                mdir = os.path.join(cfg.state_dir, "rounds")
                os.makedirs(mdir, exist_ok=True)
                with open(os.path.join(mdir, f"round={rnd}.json"), "w") as f:
                    json.dump(metrics[-1].__dict__, f)

        self.scraper.run_event("shutdown")
        empty = self.spark.createDataFrame([], RESULT_SCHEMA)
        results = empty
        for p in results_parts:
            results = results.unionByName(p)
        trace = self.spark.createDataFrame([], "url string, depth int, seq bigint, round int")
        for p in trace_parts:
            trace = trace.unionByName(p)
        return CrawlResult(results=results, trace=trace, seen=seen, metrics=metrics)
