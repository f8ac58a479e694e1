"""No-Spark scaling control for BENCH/BASELINE.md.

Measures the parse+extract kernel's multiprocessing speedup curve on the
same synthetic pages the crawl bench uses — zero Spark, zero coordination,
fork-shared input (no IPC in the measured window). This isolates the
HARDWARE's contribution to the local[8]→local[32] efficiency number: HTML
parsing is allocation-heavy, and a single socket's memory bandwidth
saturates well before 32 cores. A real N→4N executor scale-out adds a
memory subsystem per node, which threads on one box cannot model.

Usage: python tools/scaling_control.py [replicate] [pad]
Prints one JSON line: {"procs": {...pages/sec...}, "speedup_1_to_8": ...}
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROWS: list = []


def _parse_range(args):
    lo, hi, step = args
    from dude_spark.api import Scraper
    from dude_spark.extract import extract_page_rows

    app = Scraper()

    @app.group(css=".custom-group")
    @app.select(css=".title")
    def title(element):
        return {"title": element.text_content()}

    @app.select(css="a.url", group_css=".custom-group")
    def item_href(element):
        return {"item_href": element.get("href")}

    plan = app.compile()
    n = 0
    for i in range(lo, hi, step):
        extract_page_rows(plan, "https://x.test/p.html", ROWS[i], follow_urls=True)
        n += 1
    return n


def main() -> None:
    global ROWS
    replicate = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    pad = int(sys.argv[2]) if len(sys.argv) > 2 else int(os.environ.get("SPARK_GRAFT_PAD", "150"))

    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")  # light session just to synthesize
    from dude_spark.session import get_spark
    import bench

    spark = get_spark(app_name="scaling_control")
    pages = bench.replicated_pages(spark, bench.SF_DIR, replicate, pad=pad)
    ROWS = [bytes(r["html"]) for r in pages.select("html").collect()]
    spark.stop()

    mp.set_start_method("fork", force=True)
    n = len(ROWS)
    out = {}
    for procs in (1, 2, 4, 8, 16, 32):
        t0 = time.time()
        with mp.Pool(procs) as p:
            done = sum(p.map(_parse_range, [(i, n, procs) for i in range(procs)]))
        dt = time.time() - t0
        out[procs] = round(done / dt, 1)
    print(json.dumps({
        "pages": n,
        "pad": pad,
        "pages_per_sec_by_procs": out,
        "speedup_1_to_8": round(out[8] / out[1], 2),
        "speedup_8_to_32": round(out[32] / out[8], 2),
        "eff_2_to_8": round(out[8] / out[2] / 4, 3),
        "eff_8_to_32": round(out[32] / out[8] / 4, 3),
    }))


if __name__ == "__main__":
    main()
