"""Measure Spark's per-round scheduling floor with an (effectively) empty
round: a chain corpus — page i links only to page i+1 — makes every crawl
round fetch exactly ONE page, so round wall time is almost pure per-round
machinery (driver plan analysis, job scheduling, broadcast builds,
python-stage handshakes, checkpoint bookkeeping) with negligible parallel
work.

The point of running it at two parallelism levels: the floor is
core-count-INDEPENDENT. Whatever it measures is a fixed per-round serial
residue — the quantity that makes a many-round crawl's measured scaling
efficiency sit below the wide-round (one-round) figure — not work that a
bigger cluster would speed up or slow down. At warehouse round widths
(millions of pages/round at the 10^10-URL target) the same seconds amortize
into round wall time.

Usage: python tools/round_floor.py [cpus=8] [n_pages=16]
Prints one JSON line:
  {"cpus": N, "rounds": R, "seconds": S, "sec_per_round": S/R,
   "ms_per_round_by_stage": {...}}
The per-stage itemization re-parses the crawl loop's
DUDE_SPARK_DEBUG_TIMING lines for the timed run, so the floor is
attributed to named loop stages (plan analysis, the one materializing
job, checkpoint folds) rather than asserted.
Warm-up: one full chain crawl (JIT + python-worker fork excluded), then the
timed crawl on the same session.
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main() -> None:
    cpus = sys.argv[1] if len(sys.argv) > 1 else "8"
    n_pages = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    os.environ["SPARK_GRAFT_CPUS"] = cpus
    os.environ["DUDE_SPARK_DEBUG_TIMING"] = "1"
    from dude_spark.api import Scraper
    from dude_spark.crawl import CrawlConfig, CrawlJob
    from dude_spark.session import get_spark

    spark = get_spark(app_name="round_floor", master=f"local[{cpus}]")

    rows = [
        (
            f"https://chain.test/page-{i}.html",
            f'<html><body><a href="page-{i + 1}.html">next</a>'
            f"<p class=\"t\">p{i}</p></body></html>",
        )
        for i in range(n_pages)
    ]
    pages = spark.createDataFrame(rows, "url string, html string").cache()
    pages.count()

    def run() -> tuple[int, float]:
        app = Scraper()

        @app.select(css="p.t")
        def t(element):
            return {"t": element.text_content()}

        job = CrawlJob(
            spark, app, pages,
            config=CrawlConfig(
                follow_urls=True, max_rounds=n_pages + 2, round_seconds=3600
            ),
        )
        t0 = time.time()
        res = job.run(["https://chain.test/page-0.html"])
        res.results.count()
        return len(res.metrics), time.time() - t0

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        run()  # warm-up: python-worker fork + JIT + first-plan costs
        rounds, secs = run()
    # attribute the timed run's floor to the crawl loop's named stages
    hits = re.findall(r"\[(\w+)\] ([0-9.]+)s", buf.getvalue())
    timed = hits[len(hits) // 2 :]  # second (timed) crawl's lines
    sums: dict = {}
    counts: dict = {}
    for label, sec in timed:
        sums[label] = sums.get(label, 0.0) + float(sec)
        counts[label] = counts.get(label, 0) + 1
    by_stage = {
        k: round(sums[k] / counts[k] * 1000)
        for k in sorted(sums, key=lambda k: -sums[k])
        if sums[k] / counts[k] >= 0.001
    }
    print(
        json.dumps(
            {
                "cpus": int(cpus),
                "rounds": rounds,
                "seconds": round(secs, 2),
                "sec_per_round": round(secs / max(rounds, 1), 3),
                "ms_per_round_by_stage": by_stage,
            }
        )
    )


if __name__ == "__main__":
    main()
