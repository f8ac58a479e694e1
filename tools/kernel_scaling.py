"""Stage-sliced 2→8 scaling attribution for the crawl's hot job.

The 9-round crawl's one materializing job per round is scan → broadcast
fetch join → Arrow transfer → (zlib inflate + parse + extract) in Python →
link pipeline → anti-join → collect. The published 9-round 2→8 efficiency
trails the no-Spark control (r4: 0.56-0.64 engine vs 0.87-0.90 control);
this harness pins WHERE by timing four NESTED slices of that job over the
exact bench corpus, engine-at-2 / engine-at-8 / control-at-{2,8} all
back-to-back inside one drift window:

  scan    — spark JVM columnar-cache scan only (sum(length(html)))
  arrow   — + Arrow JVM→Python transfer, trivial kernel (len(pdf))
  inflate — + per-page zlib.decompress in the kernel
  parse   — + the full extraction kernel (the crawl's extract_it)

Differences between consecutive slices isolate each layer's seconds; the
per-layer 2→8 ratio against the control's says which layer is serial or
contended. Usage:

  python tools/kernel_scaling.py                 # 3 windows, prints JSON
  python tools/kernel_scaling.py --leg 8         # one engine leg (internal)

Corpus = bench.py's breadth corpus at $SPARK_GRAFT_SF_DIR (default sf0.1,
replicate 8, pad 450, zlib codec) — materialized by bench.py if absent.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPLICATE = os.environ.get("SPARK_GRAFT_SCALING_REPLICATE", "8")
PAD = os.environ.get("SPARK_GRAFT_SCALING_PAD", "450")
REPS = int(os.environ.get("SPARK_GRAFT_KERNEL_REPS", "2"))


def _corpus_path() -> str:
    return os.path.join(
        os.environ.get("TMPDIR", "/tmp"),
        f"bench_pages_breadth_{os.path.basename(SF_DIR.rstrip('/'))}"
        f"_{REPLICATE}_{PAD}_zlib.parquet",
    )


def run_leg(cpus: str) -> dict:
    """One engine leg: session at local[cpus], timed nested slices."""
    from pyspark.sql import functions as F

    from dude_spark.api import Scraper
    from dude_spark.extract import EXTRACT_SCHEMA, make_extract_iterator
    from dude_spark.session import get_spark

    spark = get_spark(app_name="kernel_scaling", master=f"local[{cpus}]")
    path = _corpus_path()
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        raise SystemExit(
            f"corpus missing at {path}; run bench.py once to materialize"
        )
    pages = spark.read.parquet(path).select("url", "html").cache()
    n_pages = pages.count()

    app = Scraper()

    @app.group(css=".custom-group")
    @app.select(css=".title")
    def title(element):
        return {"title": element.text_content()}

    @app.select(css="a.url", group_css=".custom-group")
    def item_href(element):
        return {"item_href": element.get("href")}

    extract_it = make_extract_iterator(
        app.compile(), follow_urls=True, codec="zlib"
    )

    def arrow_kernel(batches):
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame({"n": [len(pdf)]})

    def inflate_kernel(batches):
        import zlib

        import pandas as pd

        for pdf in batches:
            n = sum(len(zlib.decompress(bytes(h))) for h in pdf["html"])
            yield pd.DataFrame({"n": [n]})

    jobs = {
        "scan": lambda: pages.agg(F.sum(F.length("html"))).collect(),
        "arrow": lambda: pages.mapInPandas(arrow_kernel, "n long").count(),
        "inflate": lambda: pages.mapInPandas(inflate_kernel, "n long").count(),
        "parse": lambda: pages.mapInPandas(
            extract_it, schema=EXTRACT_SCHEMA
        ).count(),
    }
    # warm: python worker fork + pandas/pyarrow import + JIT of the
    # columnar→Arrow path (measured out at both levels, as in bench.py)
    for fn in jobs.values():
        fn()
    out = {}
    for name, fn in jobs.items():
        best = min(_timed(fn) for _ in range(REPS))
        out[name] = round(best, 3)
    out["pages"] = n_pages
    if os.environ.get("SPARK_GRAFT_KERNEL_CRAWL"):
        # same-session, same-window 9-round crawl leg: residue = crawl −
        # parse-slice is then drift-free (both numbers share the window
        # AND the session). run_crawl_bench re-warms; cheap here (cache
        # + workers are hot).
        import bench

        crawl = bench.run_crawl_bench(spark, SF_DIR, int(REPLICATE))
        out["crawl"] = crawl["seconds"]
        out["crawl_rounds"] = crawl["rounds"]
        out["residue"] = round(crawl["seconds"] - out["parse"], 3)
    return out


def _timed(fn) -> float:
    t0 = time.time()
    fn()
    return time.time() - t0


def _run_sub(cpus: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=cpus)
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--leg", cpus],
        env=env, capture_output=True, text=True, timeout=3600,
    )
    lines = out.stdout.strip().splitlines()
    if not lines:
        sys.stderr.write(out.stderr[-2000:] + "\n")
        raise RuntimeError(f"kernel leg local[{cpus}] failed")
    return json.loads(lines[-1])


def _run_control(levels) -> dict:
    tools_dir = os.path.dirname(os.path.abspath(__file__))
    out = subprocess.run(
        [sys.executable, os.path.join(tools_dir, "scaling_control.py"),
         REPLICATE, PAD, ",".join(str(x) for x in levels)],
        capture_output=True, text=True, timeout=1800,
    )
    res = json.loads(out.stdout.strip().splitlines()[-1])
    return {int(k): v for k, v in res["pages_per_sec_by_procs"].items()}


def main() -> None:
    if "--leg" in sys.argv:
        cpus = sys.argv[sys.argv.index("--leg") + 1]
        print(json.dumps(run_leg(cpus)))
        return
    windows = []
    n_win = int(os.environ.get("SPARK_GRAFT_KERNEL_WINDOWS", "3"))
    for w in range(n_win):
        e8 = _run_sub("8")
        e2 = _run_sub("2")
        ctl = _run_control([2, 8])
        row = {"engine8": e8, "engine2": e2,
               "control_pages_per_sec": {str(k): v for k, v in ctl.items()}}
        # per-slice efficiency: slice seconds scale 2→8 by (t2/t8)/4
        for k in ("scan", "arrow", "inflate", "parse"):
            if e8[k] > 0:
                row[f"eff_{k}"] = round((e2[k] / e8[k]) / 4.0, 3)
        # layer deltas (seconds attributable to each layer alone)
        for hi, lo, name in (
            ("arrow", "scan", "arrow_only"),
            ("inflate", "arrow", "inflate_only"),
            ("parse", "inflate", "parse_only"),
        ):
            d8, d2 = e8[hi] - e8[lo], e2[hi] - e2[lo]
            row[f"sec8_{name}"], row[f"sec2_{name}"] = round(d8, 3), round(d2, 3)
            if d8 > 0.05:
                row[f"eff_{name}"] = round((d2 / d8) / 4.0, 3)
        row["eff_control"] = round((ctl[8] / ctl[2]) / 4.0, 3)
        windows.append(row)
        print(json.dumps(row), flush=True)

    def med(xs):
        s = sorted(xs)
        n = len(s)
        return round(s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2, 3)

    summary = {"windows": windows}
    for k in ("eff_scan", "eff_arrow", "eff_inflate", "eff_parse",
              "eff_arrow_only", "eff_inflate_only", "eff_parse_only",
              "eff_control"):
        vals = [w[k] for w in windows if k in w]
        if vals:
            summary[f"{k}_median"] = med(vals)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
