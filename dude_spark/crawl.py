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
import threading
import time
from contextlib import contextmanager
from dataclasses import dataclass, field
from typing import List, Optional, Sequence, Union

from pyspark.sql import DataFrame, SparkSession, functions as F

from .api import CompiledPlan, Scraper
from .extract import EXTRACT_SCHEMA, make_extract_iterator
from .frontier import (
    FRONTIER_COLS,
    allowed_domains_filter,
    bloom_words,
    canonicalize,
    dedupe_candidates,
    merge_bloom_words,
    seed_frontier,
    with_url_meta,
)
from .politeness import (
    INLINE_ROBOTS_MAX,
    LOCAL_ROBOTS_MAX,
    adblock_blocked_expr,
    compile_robots,
    compile_robots_rows,
    fast_budget_rank,
    inline_robots_cols,
    robots_gate,
)

RESULT_SCHEMA = EXTRACT_SCHEMA + ", depth int, seq bigint, round int"
# the crawl frontier carries crawl_delay, attached once at append time by the
# robots gate, so the per-round politeness budget needs no robots join
CRAWL_COLS = FRONTIER_COLS + ["crawl_delay"]
# DDL twin of CRAWL_COLS — schema of driver-built LocalRelation frontiers
# (the hybrid small-round path, CrawlConfig.driver_frontier_max)
CRAWL_DDL = (
    "url string, url_hash bigint, host string, depth int, priority int, "
    "seq bigint, method string, status string, round int, crawl_delay int"
)

# Allowed-domain sets up to this size inline as one In(host, literals)
# predicate in the link gate (hash-set probe, single-expression analysis);
# larger sets fall back to a broadcast semi-join. Separate from
# INLINE_ROBOTS_MAX because an In list stays cheap far past the point where
# a per-host robots CASE/WHEN expression tree stops being worth folding.
INLINE_ALLOWED_MAX = 4096


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
    # SQL expression assigning each DISCOVERED link's frontier priority
    # (columns in scope: url, host, url_hash, depth, crawl_delay). Higher
    # fetches first within a budget-limited round (frontier.py schema note);
    # None → 0 everywhere = exact reference FIFO.
    priority_expr: Optional[str] = None
    # 'zlib' → the pages table's html column holds per-page zlib-compressed
    # bytes, decoded inside the extraction kernel (extract.py). The 100 TB
    # posture: payloads stay small through every scan/join/cache/Arrow hop
    # (Common-Crawl WARC records are per-page-compressed at rest anyway);
    # decode cost parallelizes in the Python workers with the parse.
    page_codec: Optional[str] = None
    # Durable per-round state commits (parquet dirs ≙ Iceberg snapshots),
    # resumable via run(resume=True). THIS IS THE DEFAULT AT CLUSTER SCALE:
    # the no-state_dir mode anchors round state in localCheckpoint (executor-
    # local, non-reliable storage) — fine on one box, but an executor loss
    # mid-round kills the job on a real cluster. Benchmarks use the in-memory
    # mode deliberately to measure the engine, not the commit I/O.
    state_dir: Optional[str] = None
    ignore_robots_txt: bool = False
    frontier_partitions: Optional[int] = None
    # row-count ceilings below which the driver (which knows the exact sizes
    # — it counts every round) forces broadcast-hash joins instead of leaving
    # the choice to AQE, whose stats through localCheckpoint boundaries are
    # unreliable: fetch_set broadcast into the pages join, seen-set broadcast
    # into the candidate anti-join. Above the ceiling both joins fall back to
    # shuffle joins (at warehouse scale: co-partitioned on url_hash).
    broadcast_fetch_max: int = 500_000
    broadcast_seen_max: int = 2_000_000
    # Bloom sidecar (north_rule "partitioned Bloom-filter URL-seen set"):
    # when the seen set is past broadcast_seen_max, maintain a bloom word
    # table of this many bits (see frontier.bloom_words) incrementally per
    # round; definitely-new candidates then skip the exact anti-join's
    # shuffle. None = off (locally the broadcast anti-join wins; at
    # warehouse scale set ~10 bits per expected URL).
    bloom_bits: Optional[int] = None
    bloom_k: int = 4
    # partition count for the compacted seen set. The seen table is
    # re-compacted (repartition on url_hash + checkpoint) every round so the
    # candidate anti-join scans a BOUNDED number of partitions instead of an
    # ever-growing union lineage of per-round snapshots — without this the
    # per-round task count grows by defaultParallelism each round (O(R²)
    # tasks over the crawl, worse at higher core counts: the exact anti-
    # scaling failure the north_rule forbids). At warehouse scale this is
    # the hash-partitioned seen table with Bloom sidecars (SURVEY §4.3);
    # locally a small fixed partition count keeps scheduling overhead flat.
    seen_partitions: int = 8
    # Fold cadence for the seen set: per-round deltas APPEND (O(delta)
    # storage, no data motion); every this-many deltas the parts compact
    # into one url_hash-partitioned base. Amortized O(seen/k) movement per
    # round instead of a full seen reshuffle every round — at 10^10 URLs
    # the per-round reshuffle would dominate the whole round.
    seen_compact_every: int = 8
    # Hybrid frontier (the per-round scheduling-floor fix): when a round's
    # post-anti-join candidate set fits under this cap, the driver collects
    # the candidates (already canonicalized, gated, and seen-filtered BY
    # SPARK — no second implementation of any URL semantics) and performs
    # the within-batch dedupe + dense seq numbering locally; the next
    # frontier is then a LocalRelation. A LocalRelation broadcast-builds
    # with NO Spark job (driver-side collect of itself), needs no
    # checkpoint, and no numbering shuffle/python stage — the round's
    # machinery collapses to ONE job (extract → link pipeline → broadcast
    # anti-join → collect). Wide rounds (cap exceeded, detected by a
    # limit-guarded collect) fall back to the fully distributed path, which
    # is the 100 TB regime: there the per-round floor amortizes into round
    # width and the distributed numbering is the right shape. 0 disables.
    driver_frontier_max: int = 65536


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


_CONF_OVERRIDE_LOCK = threading.RLock()


@contextmanager
def _conf_override(spark: SparkSession, pairs: dict):
    """Set runtime SQL confs for one driver-side operation, then restore.

    Spark's runtime-conf is session-global, so any concurrent planner
    thread COULD observe the temporary value. A module lock serializes all
    dude_spark override sections (two concurrent crawls on one session
    can't interleave set/restore); the residual assumption — user driver
    threads outside dude_spark don't plan Arrow conversions mid-override —
    is documented per ADVICE r4 and holds for the single-threaded driver
    the engine targets."""
    conf = spark.conf
    _CONF_OVERRIDE_LOCK.acquire()
    old = {k: conf.get(k, None) for k in pairs}
    for k, v in pairs.items():
        conf.set(k, v)
    try:
        yield
    finally:
        try:
            for k, v in old.items():
                if v is not None:
                    conf.set(k, v)
                else:
                    conf.unset(k)
        finally:
            _CONF_OVERRIDE_LOCK.release()


def _local_relation(spark: SparkSession, pdf, ddl: str) -> DataFrame:
    """True LocalRelation (``LocalTableScan``) from a pandas frame.

    The list-based ``createDataFrame`` path parallelizes to a pickled
    Python RDD — every later scan of it (broadcast builds, the fetch join)
    then launches Python-worker tasks, which is exactly the per-round
    overhead the hybrid frontier exists to remove. The Arrow path converts
    driver-side into JVM rows: scans are JVM-only and a broadcast of it
    builds with NO Spark job. The Arrow batch size is raised for the one
    conversion (the session default of 128 rows exists for ~150 KB page
    payloads, not 10-column frontier rows; at 128 a 15k-row frontier would
    shred into ~120 batches/partitions)."""
    with _conf_override(
        spark, {"spark.sql.execution.arrow.maxRecordsPerBatch": "8388608"}
    ):
        return spark.createDataFrame(pdf, ddl)


def assign_global_seq(
    df: DataFrame, order_cols: Sequence[str], start: int, out_col: str = "seq",
    rows_hint: Optional[int] = None,
    count_hosts: Optional[Sequence[str]] = None,
    key_bounds: Optional[tuple] = None,
) -> tuple[DataFrame, int, Optional[dict]]:
    """Dense global sequence in ``order_cols`` order, starting at ``start``.

    Distributed zip-index: range-partition on the order key, count rows per
    range (one cheap pass), broadcast cumulative offsets, then local
    row_number inside mapInPandas. O(n/p) per task — no global single
    partition, unlike ``row_number() over (ORDER BY ...)``.

    Two partitioning strategies:

    - ``key_bounds=(lo, hi)`` (inclusive bounds of ``order_cols[0]``, known
      driver-side): rows bucket by ``floor((key - lo) * n / width)`` — a
      DETERMINISTIC contiguous range split with no sampling pass, so the
      upstream pipeline is planned and evaluated exactly once (the sizing
      aggregation below is the single materializing job). The crawl loop
      always knows its parents' seq bounds, so this is its path: one job
      per round instead of sample-job + sizing-job. Buckets are hash-placed
      into partitions (a partition may hold several buckets, each bucket
      whole); the numbering pass re-seeds its offset at bucket boundaries.
    - otherwise: ``repartitionByRange``, which SAMPLES its input to pick
      boundaries — the pipeline is evaluated twice, so callers should hand
      in a plan anchored on checkpointed/cached data.

    Returns ``(numbered_df, total_rows, host_counts)`` — the total comes
    free from the sizing pass, so callers never need a separate ``count()``.
    When ``count_hosts`` is given (a bounded host list — the crawl passes
    its delay-carrying hosts), the same sizing job also returns per-host row
    counts for those hosts, piggybacked on the one aggregation: the sizing
    groupBy key becomes (range-id, host-or-null) so the extra collect is
    ≤ ranges × (len(count_hosts)+1) rows, and the caller's politeness
    pre-check needs no separate frontier-scan job next round.
    """
    n_part = max(df.sparkSession.sparkContext.defaultParallelism, 1)
    if rows_hint is not None:
        # Task count must track DATA, not cores: every python-stage task pays
        # a serialized handshake through the single pyspark daemon (~20ms),
        # so 32 near-empty numbering tasks cost more than 2 full ones.
        n_part = max(1, min(n_part, rows_hint // 4096 + 1))
    order_exprs = [F.col(c) for c in order_cols]
    if key_bounds is not None:
        lo, hi = int(key_bounds[0]), int(key_bounds[1])
        width = max(1, hi - lo + 1)
        key = F.col(order_cols[0]).cast("bigint")
        bucket = F.least(
            F.lit(n_part - 1),
            F.greatest(
                F.lit(0),
                ((key - F.lit(lo)) * F.lit(n_part) / F.lit(width)).cast("int"),
            ),
        )
        parted = (
            df.withColumn("_rid", bucket)
            .repartition(n_part, "_rid")
            .sortWithinPartitions("_rid", *order_exprs)
        )
    else:
        parted = df.repartitionByRange(n_part, *order_exprs).sortWithinPartitions(
            *order_exprs
        )
        # The partition id must travel WITH the rows: when the numbered
        # output is later composed into a bigger plan (e.g. unioned with
        # another DataFrame) TaskContext.partitionId() is re-indexed and
        # would misalign the offsets.
        parted = parted.withColumn("_rid", F.spark_partition_id())
    # lazy checkpoint: the sizing collect below is the materializing action —
    # one job instead of an eager-checkpoint job plus a count job. The
    # numbering pass then reads the stored blocks with pinned partitioning.
    _dbg = bool(os.environ.get("DUDE_SPARK_DEBUG_TIMING"))
    _ts = time.time()
    parted = parted.localCheckpoint(eager=False)
    if _dbg:
        print(f"    [seq_plan] {time.time() - _ts:.2f}s", flush=True)
        _ts = time.time()

    host_counts: Optional[dict] = None
    if count_hosts:
        grouped = (
            parted.groupBy(
                "_rid",
                F.when(F.col("host").isin(list(count_hosts)), F.col("host")).alias("_h"),
            )
            .agg(F.count("*").alias("n"))
            .collect()
        )
        sizes: dict = {}
        host_counts = {}
        for r in grouped:
            sizes[r["_rid"]] = sizes.get(r["_rid"], 0) + r["n"]
            if r["_h"] is not None:
                host_counts[r["_h"]] = host_counts.get(r["_h"], 0) + r["n"]
    else:
        sizes = {
            r["_rid"]: r["n"]
            for r in parted.groupBy("_rid").agg(F.count("*").alias("n")).collect()
        }
    if _dbg:
        print(f"    [seq_job] {time.time() - _ts:.2f}s", flush=True)
    offsets = {}
    acc = start
    for rid in sorted(sizes):
        offsets[rid] = acc
        acc += sizes[rid]
    total = acc - start

    schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in parted.schema.fields
        if f.name != "_rid"
    )

    def number(batches):
        import numpy as np

        cur_rid = None
        off = 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rids = pdf["_rid"].to_numpy()
            seqs = np.empty(len(pdf), dtype=np.int64)
            # range-ids are contiguous runs (rows sorted by _rid first);
            # re-seed the offset at each run boundary
            change = np.flatnonzero(rids[1:] != rids[:-1]) + 1
            bounds = [0, *change.tolist(), len(rids)]
            for i in range(len(bounds) - 1):
                b, e = bounds[i], bounds[i + 1]
                rid = int(rids[b])
                if rid != cur_rid:
                    cur_rid = rid
                    off = offsets[rid]
                seqs[b:e] = np.arange(off, off + (e - b))
                off += e - b
            pdf = pdf.drop(columns=["_rid"])
            pdf[out_col] = seqs
            yield pdf

    out_schema = f"{schema}, {out_col} bigint"
    return parted.mapInPandas(number, out_schema), total, host_counts


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

    def _persist(self, df: DataFrame, kind: str, rnd: int, eager: bool = True) -> DataFrame:
        if self.cfg.state_dir:
            path = self._round_dir(kind, rnd)
            df.write.mode("overwrite").parquet(path)
            return self.spark.read.parquet(path)
        return df.localCheckpoint(eager=eager)

    def _commit_local_frontier(self, pdf, rnd: int) -> None:
        """Driver-side parquet commit of a hybrid round's frontier snapshot.

        Durability in state_dir mode is a WRITE-path property: resume only
        needs every round's frontier snapshot on disk before the next round
        starts. When the round ran driver-resident (the hybrid path), the
        snapshot rows already sit in a pandas frame — a pyarrow write is
        ~ms where the equivalent Spark job costs ~0.3s/round. Layout and
        schema are byte-compatible with `_persist`'s Spark write (same
        frontier/round=N/_SUCCESS marker, same CRAWL_DDL column types), so
        `last_committed_round` and the resume reader cannot tell which path
        committed a given round.
        """
        import pyarrow as pa
        import pyarrow.parquet as pq

        path = self._round_dir("frontier", rnd)
        shutil.rmtree(path, ignore_errors=True)
        os.makedirs(path, exist_ok=True)
        schema = pa.schema([
            ("url", pa.string()), ("url_hash", pa.int64()),
            ("host", pa.string()), ("depth", pa.int32()),
            ("priority", pa.int32()), ("seq", pa.int64()),
            ("method", pa.string()), ("status", pa.string()),
            ("round", pa.int32()), ("crawl_delay", pa.int32()),
        ])
        tbl = pa.Table.from_pandas(
            pdf[list(schema.names)], schema=schema, preserve_index=False
        )
        pq.write_table(tbl, os.path.join(path, "part-00000.parquet"))
        open(os.path.join(path, "_SUCCESS"), "w").close()

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

        from urllib.parse import urlparse

        def _host_of(u: str) -> str:
            """HOST with the same semantics as the frontier's
            ``parse_url(url, 'HOST')`` column (with_url_meta): userinfo and
            port stripped, case preserved. ``urlparse(u).netloc`` keeps both
            — comparing it against the frontier host column silently drops
            every row for seeds with an explicit port."""
            netloc = urlparse(u).netloc.rsplit("@", 1)[-1]
            if netloc.startswith("["):  # IPv6 literal
                return netloc[: netloc.index("]") + 1] if "]" in netloc else netloc
            return netloc.split(":", 1)[0]

        seed_urls = list(urls)
        allowed = sorted(
            {_host_of(u) for u in seed_urls}
            | {_host_of(r.url) for r in (self.scraper.requests or [])}
        )

        # robots parsed ONCE per host (vs per-URL re-fetch in the reference,
        # base.py:383-388). A small dim (the overwhelmingly common case — one
        # robots.txt per allowed host) is collected and CONSTANT-FOLDED into
        # literal gate expressions; a huge dim stays a cached broadcast-join
        # dimension. Either way the driver learns up front exactly which
        # hosts carry a crawl delay — those are the only hosts the politeness
        # window ever needs to rank (fast_budget_rank).
        robots_rows = None
        compiled_robots = None
        delayed_hosts: List[str] = []
        if self.robots is not None and not cfg.ignore_robots_txt:
            # size-probe the RAW dim (no python UDF in the probe): a small
            # dim is compiled entirely driver-side — parsing ≤64 tiny text
            # files is microseconds, while the former compile-then-take
            # spark pass cost two single-task sub-jobs (~5s at local[32])
            # of pure serial floor per crawl. Big dims stay distributed.
            raw_head = self.robots.select("host", "robots_txt").take(
                LOCAL_ROBOTS_MAX + 1
            )
            if len(raw_head) <= INLINE_ROBOTS_MAX:
                allowed_set = set(allowed)
                robots_rows = compile_robots_rows(
                    [r for r in raw_head if r["host"] in allowed_set]
                )
                delayed_hosts = sorted(
                    r["host"] for r in robots_rows if r["crawl_delay"]
                )
                delay_by_host = {
                    r["host"]: int(r["crawl_delay"])
                    for r in robots_rows
                    if r["crawl_delay"]
                }
            elif len(raw_head) <= LOCAL_ROBOTS_MAX:
                # mid-tier dim: still compiled driver-side (one python loop
                # over the taken rows) but too many hosts to constant-fold
                # into a CASE/WHEN chain — re-enter the compiled rows as a
                # LocalRelation so each round's robots broadcast-join builds
                # from driver memory with no python job and no cache scan
                # (event-log: the cached-DF broadcast cost two ~0.3s jobs
                # per round; a LocalTableScan broadcast costs ~0.03s).
                # Hosts with no rules and no delay are dropped: the join is
                # left + fail-open, so absence ≡ allow/0.
                import pandas as pd

                allowed_set = set(allowed)
                mid_rows = [
                    r for r in compile_robots_rows(
                        [r for r in raw_head if r["host"] in allowed_set]
                    )
                    if r["rules"] or r["crawl_delay"]
                ]
                cr_pdf = pd.DataFrame({
                    "host": [r["host"] for r in mid_rows],
                    "crawl_delay": [int(r["crawl_delay"]) for r in mid_rows],
                    "rules": [r["rules"] for r in mid_rows],
                })
                compiled_robots = _local_relation(
                    spark, cr_pdf,
                    "host string, crawl_delay int,"
                    " rules array<struct<path string, allow boolean>>",
                )
                delayed_hosts = sorted(
                    r["host"] for r in mid_rows if r["crawl_delay"]
                )
                delay_by_host = {
                    r["host"]: int(r["crawl_delay"])
                    for r in mid_rows
                    if r["crawl_delay"]
                }
            else:
                compiled_robots = compile_robots(self.robots).cache()
                delayed = (
                    compiled_robots.filter("crawl_delay > 0")
                    .select("host", "crawl_delay")
                    .collect()
                )
                delayed_hosts = [r["host"] for r in delayed]
                delay_by_host = {r["host"]: int(r["crawl_delay"]) for r in delayed}

        allowed_df = None
        _gate_cache: dict = {}

        def gate_append(df: DataFrame) -> DataFrame:
            """Static per-URL gates, applied ONCE when a URL enters the
            frontier — they are properties of the URL, not of the round, so
            evaluating them at append time leaves the per-round hot path with
            zero joins. The reference applies P1/P2 at pop time and P4 at
            request time (base.py:364-391, optional/utils.py:31-46); with a
            static robots/blocklist dimension the fetched set and order are
            identical (a disallowed URL contributes nothing to the trace or
            the expansion in either model). Attaches ``crawl_delay``.

            The gate Column trees (host isin, ABP regex alternations, the
            constant-folded robots CASE/WHEN chains) are built ONCE and
            reused every round: unresolved Columns are input-independent
            templates, and rebuilding them is hundreds of py4j round-trips
            per round — a measured slice of the per-round floor."""
            nonlocal allowed_df
            key = "source_url" in df.columns
            if key not in _gate_cache:
                c: dict = {}
                # The allowed-domain gate inlines as a single In(host,
                # literals) predicate — analysis cost is one expression and
                # evaluation is a hash-set probe, so it tolerates far more
                # hosts than the robots CASE/WHEN fold (INLINE_ROBOTS_MAX):
                # inlining it drops one broadcast-join build from every
                # round's link plan. Past the cap, a broadcast semi-join.
                c["allowed"] = (
                    F.col("host").isin(allowed)
                    if len(allowed) <= INLINE_ALLOWED_MAX
                    else None
                )
                c["abp"] = (
                    adblock_blocked_expr(
                        cfg.adblock_rules, source_col="source_url" if key else None
                    )
                    if cfg.adblock_rules
                    else None
                )
                c["robots"] = (
                    inline_robots_cols(robots_rows)
                    if robots_rows is not None
                    else None
                )
                _gate_cache[key] = c
            c = _gate_cache[key]
            if c["allowed"] is not None:
                out = df.filter(c["allowed"])
            else:
                if allowed_df is None:
                    allowed_df = spark.createDataFrame(
                        [(h,) for h in allowed], "host string"
                    )
                out = allowed_domains_filter(df, F.broadcast(allowed_df))
            if c["abp"] is not None:
                out = out.filter(~c["abp"])
            if c["robots"] is not None:
                out = out.filter(c["robots"][0]).withColumn(
                    "crawl_delay", c["robots"][1]
                )
            elif compiled_robots is not None:
                out = robots_gate(out, compiled_robots)
            else:
                out = out.withColumn("crawl_delay", F.lit(0))
            return out

        # Incrementally-maintained bloom sidecar of the seen set (word
        # table, see frontier.bloom_words); None until cfg.bloom_bits set.
        seen_bloom: Optional[DataFrame] = None

        # Driver-tracked per-(delayed-)host pending counts. When known, the
        # politeness over-budget pre-check costs ZERO jobs: the counts ride
        # along on the seq-assignment sizing aggregation each round (see
        # assign_global_seq count_hosts). None = unknown → fall back to one
        # counting job. Counts are pre-gate upper bounds where cheaper to
        # compute (seeds) — an over-estimate only ever ranks a host that
        # didn't need it (correct, marginally slower), never skips one.
        pending_by_host: Optional[dict] = None
        delayed_set = set(delayed_hosts)

        start_round = 0
        # Driver-side pandas mirror of the seen set — live while the ENTIRE
        # seen history is driver-visible (local seeds + only small-mode
        # rounds so far); lets compaction be a pandas concat instead of a
        # repartition+checkpoint job. None once any distributed delta enters.
        seen_local_pdfs: Optional[list] = None
        resume_max_seq: Optional[int] = None
        if resume and (r := self.last_committed_round()) >= 0:
            frontier = spark.read.parquet(self._round_dir("frontier", r))
            if "priority" not in frontier.columns:  # pre-priority state dirs
                frontier = frontier.withColumn("priority", F.lit(0))
            # seen = every URL ever enqueued = union of all committed
            # frontier snapshots, distinct on url_hash
            base = os.path.join(cfg.state_dir, "frontier")
            all_snaps = spark.read.parquet(os.path.join(base, "round=*"))
            seen = (
                all_snaps.select("url", "url_hash")
                .dropDuplicates(["url_hash"])
            )
            # TRUE seq high-water mark: max over ALL committed snapshots,
            # not just the pending frontier — a round that discovers no new
            # links commits a deferred-only snapshot whose rows all carry
            # OLD seqs, so max(pending.seq) under-recovers and the resumed
            # crawl would re-issue seqs already assigned to URLs fetched in
            # between (duplicate seq = broken (url, seq) parity).
            resume_max_seq = int(
                all_snaps.agg(
                    F.coalesce(F.max("seq"), F.lit(-1)).alias("m")
                ).collect()[0]["m"]
            )
            start_round = r + 1
        else:
            if cfg.state_dir and os.path.isdir(cfg.state_dir):
                shutil.rmtree(cfg.state_dir)
            # seeds carry a NULL source_url: no referrer → first-party, so
            # $third-party/$domain= rules correctly never block a seed
            frontier = gate_append(
                seed_frontier(spark, seed_urls, self.scraper.requests)
                .withColumn("source_url", F.lit(None).cast("string"))
            ).select(*CRAWL_COLS)
            if (
                cfg.driver_frontier_max > 0
                and len(seed_urls) + len(list(self.scraper.requests or []))
                <= cfg.driver_frontier_max
            ):
                # hybrid path seed: collect the (Spark-gated) seed frontier
                # once and re-enter it as a LocalRelation — then round 0's
                # fetch broadcast AND the seen-set broadcast build with no
                # Spark job while the crawl stays in the small-round regime.
                # state_dir mode rides the same path: durability only needs
                # the snapshot ON DISK (driver-side pyarrow commit below),
                # not a Spark-written one.
                import pandas as pd

                seed_rows = [tuple(r) for r in frontier.collect()]
                if seed_rows:
                    seed_pdf = pd.DataFrame(seed_rows, columns=CRAWL_COLS)
                    frontier = _local_relation(spark, seed_pdf, CRAWL_DDL)
                    seen_local_pdfs = [seed_pdf[["url", "url_hash"]]]
                else:
                    seed_pdf = pd.DataFrame(columns=CRAWL_COLS)
                    frontier = spark.createDataFrame([], CRAWL_DDL)
                    seen_local_pdfs = []
                if cfg.state_dir:
                    self._commit_local_frontier(seed_pdf, -1)
            else:
                frontier = self._persist(frontier, "frontier", -1)
            seen = frontier.select("url", "url_hash")
            if delayed_set:
                # seed host counts are known driver-side (pre-gate upper bound)
                pending_by_host = {}
                for u in seed_urls + [r.url for r in (self.scraper.requests or [])]:
                    h = _host_of(u)
                    if h in delayed_set:
                        pending_by_host[h] = pending_by_host.get(h, 0) + 1

        import numpy as _np

        # Sorted int64 mirror of every seen url_hash, live exactly as long
        # as seen_local_pdfs (bounded by broadcast_seen_max ⇒ ≤16 MB at the
        # 2M default). While live, hybrid rounds anti-join DRIVER-SIDE via
        # searchsorted instead of a Spark broadcast anti-join — the
        # per-round broadcast build re-scanned the ENTIRE seen union
        # (event-log: one 8·⌈deltas⌉-task job per round, growing until
        # compaction) and rebuilt a driver hash relation of O(seen) rows
        # every round; the mirror makes the per-round cost O(delta log
        # seen) instead. Identical semantics: the broadcast anti-join
        # removed whole url_hash groups, exactly what the membership test
        # does.
        seen_hash_sorted: Optional[_np.ndarray] = None
        if seen_local_pdfs is not None:
            seen_hash_sorted = _np.sort(
                _np.concatenate(
                    [p["url_hash"].to_numpy(dtype="int64") for p in seen_local_pdfs]
                )
                if seen_local_pdfs
                else _np.empty(0, dtype="int64")
            )
        elif (
            resume
            and start_round > 0
            and cfg.driver_frontier_max > 0
            and cfg.dedupe == "seen"
        ):
            # Rebuild the mirror from the committed snapshots (hash column
            # only — 8 B/row, ≤16 MB at the broadcast_seen_max bound) so a
            # resumed crawl re-enters the driver-side anti-join immediately
            # instead of paying the per-round broadcast anti-join. Overflow
            # of the limit guard ⇒ the seen set outgrew the hybrid regime —
            # leave the mirror off and stay fully distributed. The url
            # strings stay distributed either way (seen_local_pdfs remains
            # None ⇒ compaction keeps the repartition path).
            hash_tbl = (
                seen.select("url_hash")
                .limit(cfg.broadcast_seen_max + 1)
                .toArrow()
            )
            if hash_tbl.num_rows <= cfg.broadcast_seen_max:
                seen_hash_sorted = _np.sort(
                    hash_tbl.column("url_hash").to_numpy().astype("int64")
                )

        extract_it = make_extract_iterator(
            self.plan,
            follow_urls=cfg.follow_urls,
            link_mode=cfg.link_mode,
            passthrough=["depth", "seq"],
            codec=cfg.page_codec,
        )
        result_schema = EXTRACT_SCHEMA + ", depth int, seq bigint"

        # Hoisted per-round expression templates (see gate_append note:
        # unresolved Columns are input-independent; rebuilding them every
        # round is pure py4j overhead on the per-round floor).
        _kind_link = F.col("kind") == "link"
        _link_select = [
            canonicalize(F.col("link")).alias("url"),
            # referring page → ABP $third-party/$domain= context
            F.col("url").alias("source_url"),
            (F.col("depth") + 1).alias("depth"),
            F.col("seq").alias("parent_seq"),
            F.col("link_seq"),
        ]
        _prio_col = (
            F.expr(cfg.priority_expr).cast("int")
            if cfg.priority_expr
            else F.lit(0)
        )

        results_parts: List[DataFrame] = []
        trace_parts: List[DataFrame] = []
        metrics: List[RoundMetrics] = []
        first = frontier.agg(
            F.coalesce(F.max("seq"), F.lit(-1)).alias("m"),
            F.coalesce(F.min("seq"), F.lit(0)).alias("lo"),
            F.count("*").alias("n"),
        ).collect()[0]
        max_seq, n_pending = int(first["m"]), int(first["n"])
        if resume_max_seq is not None and resume_max_seq > max_seq:
            max_seq = resume_max_seq
        # Lower bound of any pending frontier row's seq — with max_seq it
        # brackets every link's parent_seq, which lets assign_global_seq
        # range-split deterministically (no sampling job). Conservative is
        # fine (only bucket balance depends on it): deferred rows keep old
        # seqs, so the bound only advances on deferral-free rounds.
        frontier_lo = int(first["lo"])
        seen_n = max_seq + 1  # driver-exact seen-set size (it assigns every seq)

        _dbg = bool(os.environ.get("DUDE_SPARK_DEBUG_TIMING"))

        # Seen set as LSM-ish parts: one compacted base + per-round delta
        # checkpoints, re-unioned into the `seen` view each fold. Handles
        # back the live parts; on compaction the superseded parts' handles
        # retire and are unpersisted once the next materializing job has
        # realized the new base — without that, block-manager storage grows
        # O(rounds × seen size) over a long crawl. (state_dir mode has no
        # such chain — each round re-reads parquet.)
        seen_base: DataFrame = seen
        seen_deltas: List[DataFrame] = []
        live_handles: List = []
        retired_handles: List = []

        def _rebuild_seen() -> None:
            """Re-enter Spark with the deferred driver-resident seen set.

            While every seen part is driver-visible and the mirror is
            live, the per-round fold is pandas-only (the Spark `seen` view
            has no reader — see the deferred branch of the fold). The
            first consumer that needs a DataFrame (a distributed fallback
            round's anti-join, the end-of-crawl CrawlResult) rebuilds it
            here in one concat + LocalRelation."""
            nonlocal seen, seen_base, seen_deltas
            if seen_local_pdfs is None:
                return
            import pandas as pd

            merged = (
                pd.concat(seen_local_pdfs, ignore_index=True)
                if seen_local_pdfs
                else pd.DataFrame({"url": pd.Series(dtype="object"),
                                   "url_hash": pd.Series(dtype="int64")})
            )
            seen_local_pdfs[:] = [merged]
            seen = _local_relation(spark, merged, "url string, url_hash bigint")
            seen_base, seen_deltas = seen, []

        def _ckpt_rdd_handle(df: DataFrame):
            """JVM RDD behind a localCheckpoint'd DataFrame (LogicalRDD)."""
            try:
                return df._jdf.queryExecution().analyzed().rdd()
            except Exception:
                return None

        def _t(label: str, since: list) -> None:
            if _dbg:
                now = time.time()
                print(f"    [{label}] {now - since[0]:.2f}s", flush=True)
                since[0] = now

        for rnd in range(start_round, cfg.max_rounds):
            t0 = time.time()
            _since = [t0]
            if n_pending == 0:
                break
            _t('round_start', _since)

            # Politeness: rows were gated at append time and carry
            # crawl_delay, so when no allowed host has a delay and no hot-
            # host cap is set, the WHOLE pending frontier is fetchable —
            # zero politeness jobs. Otherwise only the delay-carrying hosts'
            # rows pay the window shuffle (fast_budget_rank).
            over_budget = delayed_hosts
            if cfg.max_per_host is None and delayed_hosts:
                # Only a delay-carrying host whose pending count exceeds its
                # budget forces the ranking window. The per-host counts are
                # normally already known driver-side (piggybacked on last
                # round's sizing aggregation — zero extra jobs); only after a
                # resume or a ranked round do they need one counting job.
                if pending_by_host is None:
                    pending_by_host = {
                        r["host"]: r["count"]
                        for r in frontier.filter(F.col("host").isin(delayed_hosts))
                        .groupBy("host")
                        .count()
                        .collect()
                    }
                over_budget = sorted(
                    h
                    for h, n in pending_by_host.items()
                    if n > max(1, cfg.round_seconds // delay_by_host[h])
                )
            if cfg.max_per_host is None and not over_budget:
                fetch_set = frontier
                deferred = None
                n_fetched, n_deferred = n_pending, 0
            else:
                ranked = fast_budget_rank(
                    frontier,
                    over_budget,
                    round_seconds=cfg.round_seconds,
                    max_per_host=cfg.max_per_host,
                )
                # lazy checkpoint, materialized ONCE by the counts job just
                # below; fetch_set and deferred then read the stored blocks
                ranked = ranked.localCheckpoint(eager=False)
                fetch_set = ranked.filter(F.col("fetch_now")).select(*CRAWL_COLS)
                deferred = (
                    ranked.filter(~F.col("fetch_now"))
                    .select(*CRAWL_COLS)
                    .withColumn("round", F.lit(rnd + 1))
                )
                counts = ranked.groupBy("fetch_now").count().collect()
                n_fetched = sum(r["count"] for r in counts if r["fetch_now"])
                n_deferred = sum(r["count"] for r in counts if not r["fetch_now"])
                _t('counts', _since)

            # The fetch: frontier ⋈ pages. AQE broadcasts the (budget-capped)
            # frontier side when small; at warehouse scale both sides are
            # bucketed by url_hash (SURVEY §2.6).
            if n_fetched <= cfg.broadcast_fetch_max:
                fetched = self.pages.join(F.broadcast(fetch_set), on="url", how="inner")
            else:
                fetched = fetch_set.join(self.pages, on="url", how="inner")
            # Size the python extraction stage by page count, not core count:
            # the join output inherits the pages table's partitioning, so a
            # 50-URL round would otherwise run 32 near-empty pandas-UDF tasks
            # each paying the worker handshake. ~128 pages/task amortizes it;
            # big rounds keep the scan partitioning (no extra shuffle).
            par = self.spark.sparkContext.defaultParallelism
            est_parts = max(1, min(par, n_fetched // 128 + 1))
            if est_parts < par:
                fetched = fetched.repartition(est_parts)

            # pre/post-setup receive the round's DataFrame (page-table
            # analogue of the reference's live-page argument, base.py:504-530)
            _t('fetch_plan', _since)
            self.scraper.run_event("pre-setup", fetched)
            extracted = fetched.select("url", "html", "depth", "seq").mapInPandas(
                extract_it, schema=result_schema
            )
            # Memory mode: CACHE, don't checkpoint. persist() is plan-lazy —
            # no per-round driver-side .rdd planning pass (measured 270-430ms
            # of the round floor); the round's one materializing job builds
            # the cache and later readers (results, the link pipeline) hit
            # it. Lineage stays bounded: the plan roots at this round's
            # frontier leaf (LocalRelation or checkpoint RDD), never at a
            # previous round. Recompute-on-eviction is safe (deterministic
            # kernel over stable inputs). state_dir mode keeps the durable
            # parquet commit.
            if cfg.state_dir:
                extracted = self._persist(extracted, "extracted", rnd, eager=False)
            else:
                extracted = extracted.persist()
            _t('extract_ckpt', _since)
            self.scraper.run_event("post-setup", extracted)

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
                fetch_set.select("url", "depth", "seq", "method").withColumn(
                    "round", F.lit(rnd)
                )
            )

            # -- frontier expansion -----------------------------------------
            # Runs regardless of cfg.follow_urls: the kernel only emits
            # auto-extracted links when follow_urls=True, but handler-driven
            # follow_url() rows (reference base.py:358-359) must reach the
            # frontier in either mode. With no link rows the expansion is one
            # cheap empty-input sizing job.
            links = extracted.filter(_kind_link).select(*_link_select)
            links = with_url_meta(links)
            links = gate_append(links)
            links = links.withColumn("priority", _prio_col)
            _t('link_plan', _since)

            # Hybrid small-round path (cfg.driver_frontier_max): collect the
            # post-anti-join candidates under a limit guard and number them
            # driver-side. Everything URL-semantic — canonicalize, gates,
            # hashing, the seen anti-join itself — was computed BY SPARK in
            # the one collect job; the driver only sorts by (parent_seq,
            # link_seq), keeps the first row per url_hash (identical to
            # dedupe_candidates' window semantics: the anti-join removes
            # whole url_hash groups, so it commutes with per-group
            # keep-first) and assigns the dense seq. The next frontier is
            # then a LocalRelation: it broadcast-builds into the fetch join
            # with NO Spark job, needs no checkpoint, and the round's
            # machinery collapses to ONE job. Wide rounds (limit overflow)
            # fall back to the distributed path below — the 100 TB regime,
            # where the per-round floor amortizes into round width anyway.
            local_round = False
            local_pdf = None  # next-frontier pandas frame (driver-side rounds)
            new_frontier = None
            n_new = 0
            new_host_counts: Optional[dict] = None
            if (
                cfg.driver_frontier_max > 0
                and cfg.dedupe == "seen"
                and seen_n <= cfg.broadcast_seen_max
            ):
                if seen_hash_sorted is not None:
                    # Driver-resident seen mirror is complete: skip the
                    # Spark anti-join entirely — collect the GATED links
                    # (under a 4× transfer guard; links:candidates is
                    # bounded by the page out-degree) and anti-join by
                    # searchsorted below. The round's plan then has ONE
                    # broadcast (the fetch set) and the per-round cost no
                    # longer re-scans O(seen).
                    collect_cap = cfg.driver_frontier_max * 4
                    anti_plan = links.limit(collect_cap + 1)
                else:
                    collect_cap = cfg.driver_frontier_max
                    anti_plan = links.join(
                        F.broadcast(seen.select("url_hash")),
                        on="url_hash",
                        how="left_anti",
                    ).limit(collect_cap + 1)
                _t('cand_plan', _since)
                # Arrow collect, NOT .collect(): Row-pickle deserialization
                # of a wide round's candidates is ~1-2s of single-threaded
                # driver time — pure serial fraction on the scaling curve.
                # The Arrow table lands in columnar batches and every step
                # below is vectorized. initialNumPartitions is scoped HERE
                # (not session-wide, ADVICE r4): this one limit-guarded
                # collect should scan all partitions in ONE job instead of
                # the incremental 1-then-4× executeTake ramp, but unrelated
                # small .take()/.isEmpty() queries should keep the default.
                # AQE is scoped OFF for this one query: the plan is
                # broadcast-joins + a limit with ZERO shuffle exchanges, so
                # adaptive re-planning can't improve it — but AQE
                # materializes every broadcast query stage as its own job
                # with a driver re-optimization barrier between them
                # (event-log measured: 4-6 jobs/round with 0.4-1.4s driver
                # gaps — ~1.9s/round of the 2→8 scaling residue). Static
                # planning runs the whole round as ONE job whose broadcast
                # builds overlap execution on the driver thread.
                with _conf_override(
                    spark, {
                        "spark.sql.limit.initialNumPartitions": "4096",
                        "spark.sql.adaptive.enabled": "false",
                    }
                ):
                    cand_tbl = anti_plan.toArrow()
                _t('cand_collect', _since)
                cpdf = None
                if cand_tbl.num_rows <= collect_cap:
                    import numpy as np
                    import pandas as pd

                    cpdf = cand_tbl.to_pandas()
                    if seen_hash_sorted is not None and len(cpdf):
                        # anti-join vs the sorted mirror: membership by
                        # searchsorted — O(links·log seen), no Spark job
                        uh = cpdf["url_hash"].to_numpy(dtype="int64")
                        if seen_hash_sorted.size:
                            pos = np.searchsorted(seen_hash_sorted, uh)
                            pos[pos == seen_hash_sorted.size] = 0
                            cpdf = cpdf[seen_hash_sorted[pos] != uh]
                    # candidate-count guard: same boundary as the broadcast
                    # path (wide rounds stay fully distributed)
                    if len(cpdf) > cfg.driver_frontier_max:
                        cpdf = None
                if cpdf is not None:
                    local_round = True
                    # arrival order, then keep-first per url_hash — identical
                    # to dedupe_candidates' window semantics ((parent_seq,
                    # link_seq) is unique, so stability is moot)
                    cpdf = (
                        cpdf.sort_values(
                            ["parent_seq", "link_seq"], ignore_index=True
                        )
                        .drop_duplicates("url_hash", keep="first")
                        .reset_index(drop=True)
                    )
                    n_new = len(cpdf)
                    if cfg.max_per_host is None and delayed_hosts:
                        hc = cpdf["host"][cpdf["host"].isin(delayed_set)]
                        new_host_counts = {
                            k: int(v) for k, v in hc.value_counts().items()
                        }
                    if n_new:
                        # int columns arrive float64 iff nulls were present
                        # (possible only via a null-yielding priority_expr);
                        # nullable Int dtypes keep them null through Arrow
                        for c, dt in (
                            ("depth", "Int32"), ("priority", "Int32"),
                            ("crawl_delay", "Int32"),
                        ):
                            if cpdf[c].dtype.kind == "f":
                                cpdf[c] = cpdf[c].astype(dt)
                        # RangeIndex after reset_index → Series align with
                        # the fresh seq column; nullable Int dtypes survive
                        local_pdf = pd.DataFrame({
                            "url": cpdf["url"],
                            "url_hash": cpdf["url_hash"],
                            "host": cpdf["host"],
                            "depth": cpdf["depth"],
                            "priority": cpdf["priority"],
                            "seq": np.arange(
                                max_seq + 1, max_seq + 1 + n_new, dtype="int64"
                            ),
                            "method": "GET",
                            "status": "pending",
                            "round": rnd + 1,
                            "crawl_delay": cpdf["crawl_delay"],
                        })
                        new_frontier = _local_relation(
                            spark, local_pdf, CRAWL_DDL
                        )
            if not local_round:
                if cfg.dedupe == "seen":
                    # deferred seen parts (driver-resident regime) must be
                    # re-entered into Spark before the anti-join reads them
                    _rebuild_seen()
                    use_broadcast = seen_n <= cfg.broadcast_seen_max
                    if cfg.bloom_bits and not use_broadcast and seen_bloom is None:
                        # first over-threshold round: build the sidecar from
                        # the full seen set once; deltas fold in per round
                        seen_bloom = bloom_words(
                            seen, m_bits=cfg.bloom_bits, k=cfg.bloom_k
                        ).localCheckpoint(eager=False)
                    cands = dedupe_candidates(
                        links, seen, order_cols=("parent_seq", "link_seq"),
                        broadcast_seen=use_broadcast,
                        bloom=seen_bloom if not use_broadcast else None,
                        bloom_bits=cfg.bloom_bits or (1 << 23),
                        bloom_k=cfg.bloom_k,
                    )
                else:
                    cands = links
                # key_bounds: every link's parent_seq is a fetch_set seq,
                # which lies in [frontier_lo, max_seq] — so assign_global_seq
                # range-splits deterministically with NO sampling pass. Its
                # sizing aggregation is then the round's ONE materializing
                # job (extraction + link pipeline + dedupe + shuffle +
                # counts), and no cands checkpoint is needed: the pipeline
                # is planned and evaluated exactly once.
                new_frontier, n_new, new_host_counts = assign_global_seq(
                    cands, ["parent_seq", "link_seq"], start=max_seq + 1,
                    rows_hint=n_fetched * 4,
                    count_hosts=delayed_hosts if cfg.max_per_host is None else None,
                    key_bounds=(frontier_lo, max_seq),
                )
            _t('assign_seq', _since)
            # next round's politeness pre-check: the new frontier is exactly
            # these candidates (+ deferred rows, whose per-host counts we do
            # not track — unknown after a ranked round)
            if deferred is None and new_host_counts is not None:
                pending_by_host = new_host_counts
            else:
                pending_by_host = None
            # the sizing job above ran the anti-join → the current seen
            # parts (and any freshly compacted base) are materialized;
            # blocks retired by the last compaction are dead — free them
            for h in retired_handles:
                try:
                    h.unpersist(False)
                except Exception:
                    pass
            retired_handles.clear()
            if not local_round:
                # distributed path: attach the static columns the driver-side
                # path already embedded in its LocalRelation rows
                new_frontier = (
                    new_frontier.withColumn("method", F.lit("GET"))
                    .withColumn("status", F.lit("pending"))
                    .withColumn("round", F.lit(rnd + 1))
                    .select(*CRAWL_COLS)
                ) if n_new else None
            prev_max = max_seq
            max_seq += n_new
            seen_n += n_new
            if deferred is None:
                # no old-seq rows remain pending: next round's frontier is
                # exactly this round's delta (tightens the range-split bound)
                frontier_lo = prev_max + 1

            frontier_local = False
            if deferred is None and new_frontier is None:
                frontier = spark.createDataFrame([], frontier.schema)
                frontier_local = True
            elif deferred is None:
                frontier = new_frontier
                frontier_local = local_round
            elif new_frontier is None:
                frontier = deferred
            else:
                frontier = deferred.unionByName(new_frontier)
            # lazy: in memory mode the next round's first job (the sizing/
            # sampling pass, whose fetch join reads this frontier)
            # materializes the checkpoint — no dedicated per-round barrier.
            # state_dir mode stays an eager per-round commit (durability is
            # the point there), but a driver-resident frontier commits via
            # the ~ms pyarrow write instead of a Spark job — Spark keeps
            # reading the LocalRelation. A LocalRelation frontier needs no
            # lineage truncation at all in memory mode.
            if cfg.state_dir and frontier_local:
                import pandas as pd

                self._commit_local_frontier(
                    local_pdf if local_pdf is not None
                    else pd.DataFrame(columns=CRAWL_COLS),
                    rnd,
                )
            elif cfg.state_dir or not frontier_local:
                frontier = self._persist(frontier, "frontier", rnd, eager=False)
            _t('frontier_ckpt', _since)
            if cfg.dedupe == "seen" and n_new:
                # NOT gated on cfg.follow_urls: frontier expansion runs in
                # either mode (handler follow_url() rows reach the frontier
                # even with follow_urls=False), so the delta must fold into
                # `seen` whenever dedupe is on — otherwise a follow cycle
                # among non-seed pages refetches them every round.
                # Fold this round's delta (persisted frontier rows with
                # seq > prev_max) as an APPEND: only the delta checkpoints
                # (O(delta) storage, zero data motion); the anti-join reads
                # base ∪ deltas. Every seen_compact_every folds the parts
                # compact into one url_hash-partitioned base — amortized
                # O(seen/k) movement per round, vs the former full seen
                # reshuffle every round (a scale-killer at 10^10 URLs).
                if local_round:
                    # driver-side round: the delta rows are already local —
                    # a LocalRelation delta needs no checkpoint, no handle
                    delta_pdf = local_pdf[["url", "url_hash"]]
                    if (
                        seen_local_pdfs is not None
                        and seen_hash_sorted is not None
                        and seen_bloom is None
                    ):
                        # DEFERRED seen: while every part is driver-visible
                        # and the mirror is live, the Spark-side `seen`
                        # view has NO reader (the anti-join runs against
                        # the sorted mirror), so skip the per-round
                        # LocalRelation build, the union re-plan and the
                        # compaction bookkeeping entirely — the whole fold
                        # is a pandas append + mirror merge. The first
                        # consumer that needs a DataFrame calls
                        # _rebuild_seen() (distributed fallback round,
                        # end-of-crawl result).
                        seen_local_pdfs.append(delta_pdf)
                        delta = None
                    else:
                        # only reachable with seen_local_pdfs None (the
                        # resume-with-mirror regime: hashes are driver-
                        # resident, urls are not) — a local round with the
                        # bloom sidecar live is impossible, since bloom
                        # birth requires seen_n past the hybrid gate's own
                        # broadcast_seen_max bound
                        delta = _local_relation(
                            spark, delta_pdf, "url string, url_hash bigint"
                        )
                    if seen_hash_sorted is not None:
                        # fold the delta into the sorted mirror (merge of
                        # two sorted runs; numpy sort is O(n) on this shape)
                        seen_hash_sorted = _np.sort(
                            _np.concatenate([
                                seen_hash_sorted,
                                local_pdf["url_hash"].to_numpy(dtype="int64"),
                            ])
                        )
                else:
                    delta = (
                        frontier.filter(F.col("seq") > prev_max)
                        .select("url", "url_hash")
                        .localCheckpoint(eager=False)
                    )
                    h = _ckpt_rdd_handle(delta)
                    if h is not None:
                        live_handles.append(h)
                    # a distributed delta left the driver-visible regime
                    seen_local_pdfs = None
                    seen_hash_sorted = None
                if delta is not None:
                    seen_deltas.append(delta)
                    seen = seen_base
                    for d in seen_deltas:
                        seen = seen.unionByName(d)
                    if len(seen_deltas) >= cfg.seen_compact_every:
                        # a delta only exists outside the driver-visible
                        # regime (see the deferred branch above — pandas
                        # compaction lives in _rebuild_seen), so compaction
                        # here is always the distributed repartition
                        seen = seen.repartition(
                            cfg.seen_partitions, "url_hash"
                        ).localCheckpoint(eager=False)
                        nh = _ckpt_rdd_handle(seen)
                        retired_handles.extend(live_handles)
                        live_handles = [nh] if nh is not None else []
                        seen_base, seen_deltas = seen, []
                    if seen_bloom is not None:
                        # fold the round's delta into the sidecar (word-
                        # level bit_or; no rescan of the full seen set)
                        seen_bloom = merge_bloom_words(
                            seen_bloom,
                            bloom_words(
                                delta, m_bits=cfg.bloom_bits, k=cfg.bloom_k
                            ),
                        ).localCheckpoint(eager=False)
            n_pending = n_deferred + n_new
            _t('seen_fold', _since)

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
        _rebuild_seen()  # deferred driver-resident parts → CrawlResult.seen
        empty = self.spark.createDataFrame([], RESULT_SCHEMA)
        results = empty
        for p in results_parts:
            results = results.unionByName(p)
        trace = self.spark.createDataFrame(
            [], "url string, depth int, seq bigint, method string, round int"
        )
        for p in trace_parts:
            trace = trace.unionByName(p)
        return CrawlResult(results=results, trace=trace, seen=seen, metrics=metrics)
