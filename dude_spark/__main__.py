"""CLI — the engine's analogue of ``dude scrape`` (reference
``dude/__init__.py:49-249``).

The reference fetches live HTTP; this engine crawls a **pages table**
(parquet/Iceberg of ``url, html, ...`` rows — BASELINE.json input_hint), so
the one extra required flag is ``--pages-table``. User scripts register
rules exactly like reference scripts do, against the module-level singleton
(``import dude_spark as dude; @dude.select(...)``) — registration happens at
import (``dude/__init__.py:205-210``).

Example::

    python -m dude_spark scrape --url https://host-0.test/page-0.html \
        --pages-table /data/pages.parquet --output out.json \
        --follow-urls script.py
"""

from __future__ import annotations

import argparse
import importlib.util
import sys
from pathlib import Path


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="dude_spark")
    sub = p.add_subparsers(dest="command", required=True)
    s = sub.add_parser("scrape", help="Run the crawl/extract pipeline")
    s.add_argument("paths", nargs="+", help="User script(s) registering rules")
    s.add_argument("--url", action="append", required=True, dest="urls")
    s.add_argument("--pages-table", required=True, help="parquet of (url, html, ...)")
    s.add_argument("--robots-table", default=None, help="parquet of (host, robots_txt)")
    s.add_argument("--pages", type=int, default=1, help="navigate-loop cap (S6)")
    s.add_argument("--output", default=None)
    s.add_argument("--format", default="json")
    s.add_argument("--follow-urls", action="store_true")
    s.add_argument("--save-per-page", action="store_true",
                   help="append per-round to --output directory (distributed)")
    s.add_argument("--ignore-robots-txt", action="store_true")
    s.add_argument("--max-rounds", type=int, default=64)
    s.add_argument("--round-seconds", type=int, default=60)
    s.add_argument("--state-dir", default=None, help="checkpoint dir (resumable)")
    s.add_argument("--resume", action="store_true")
    s.add_argument("--master", default=None)
    s.add_argument("--page-codec", default=None, choices=["zlib"],
                   help="html column holds per-page-compressed bytes "
                        "(decoded in the extraction kernel)")
    s.add_argument("--dedupe", default="seen", choices=["seen", "none"],
                   help="'none' = strict reference parity (no URL-seen set)")
    return p


def import_script(path: str) -> None:
    """Import the user script — decorators register into the singleton
    (reference importlib flow, ``dude/__init__.py:205-210``)."""
    name = Path(path).stem
    spec = importlib.util.spec_from_file_location(name, path)
    assert spec and spec.loader, f"cannot import {path}"
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    from .api import app
    from .crawl import CrawlConfig, CrawlJob
    from .flatten import flatten
    from .session import get_spark
    from .sinks import dispatch_save, save_distributed

    spark = get_spark(app_name="dude_spark_cli", master=args.master)
    for path in args.paths:
        # handlers pickle by module reference → the script must be importable
        # on executor workers too (≙ spark-submit --py-files script.py)
        spark.sparkContext.addPyFile(str(Path(path).resolve()))
        import_script(path)
    pages = spark.read.parquet(args.pages_table)
    robots = spark.read.parquet(args.robots_table) if args.robots_table else None
    cfg = CrawlConfig(
        follow_urls=args.follow_urls,
        pages=args.pages,
        max_rounds=args.max_rounds,
        round_seconds=args.round_seconds,
        ignore_robots_txt=args.ignore_robots_txt,
        state_dir=args.state_dir,
        page_codec=args.page_codec,
        dedupe=args.dedupe,
    )
    job = CrawlJob(spark, app, pages, robots=robots, config=cfg)
    res = job.run(args.urls, resume=args.resume)
    flat = flatten(res.results)
    if args.save_per_page and args.output:
        save_distributed(flat, args.output, format=args.format)
    else:
        dispatch_save(flat, format=args.format, output=args.output,
                      save_rules=app.save_rules)
    return 0


if __name__ == "__main__":
    sys.exit(main())
