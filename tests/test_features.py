"""Setup rules (E8), navigate/pages loop (S6/E9/O4), adblock (P4), CLI."""

import json

import pytest
from pyspark.sql import functions as F

from dude_spark.api import Scraper
from dude_spark.corpus import pages_df, robots_df, seeds
from dude_spark.crawl import CrawlConfig, CrawlJob
from dude_spark.extract import extract_page
from dude_spark.flatten import flatten
from dude_spark.politeness import adblock_filter

SF = "/root/testdata/sf0.001"


def test_setup_rule_mutates_dom_before_scrape(dude_html):
    app = Scraper()

    @app.select(css=".custom-group", setup=True)
    def mark(element):
        element.attrib["data-marked"] = "yes"

    @app.select(css=".custom-group")
    def read(element):
        return {"marked": element.get("data-marked") or "no"}

    rows = [r for r in extract_page(app.compile(), "https://x/", dude_html) if r["kind"] == "data"]
    assert [r["data"]["marked"] for r in rows] == ["yes"] * 3


def test_setup_priority_order(dude_html):
    app = Scraper()
    calls = []

    @app.select(css=":root", setup=True, priority=5)
    def second(element):
        element.attrib["v"] = element.get("v", "") + "b"

    @app.select(css=":root", setup=True, priority=1)
    def first(element):
        element.attrib["v"] = element.get("v", "") + "a"

    @app.select(css=":root")
    def read(element):
        return {"v": element.get("v")}

    rows = [r for r in extract_page(app.compile(), "https://x/", dude_html) if r["kind"] == "data"]
    assert rows[0]["data"]["v"] == "ab"  # priority asc (base.py:604-605)


def test_navigate_emits_next_and_stops_on_self(dude_html):
    app = Scraper()

    @app.select(css="a", navigate=True)
    def nav(element):
        return element.get("href")

    @app.select(css=".title")
    def t(element):
        return {"t": element.text_content()}

    rows = extract_page(app.compile(), "https://dwmc.ron.sh/", dude_html)
    navs = [r for r in rows if r["kind"] == "navigate"]
    assert [n["link"] for n in navs] == ["https://dwmc.ron.sh/url-1.html"]  # first match only (O4)

    # first matching element resolves to the current URL → unchanged → stop
    rows2 = extract_page(app.compile(), "https://dwmc.ron.sh/url-1.html", dude_html)
    assert [r["link"] for r in rows2 if r["kind"] == "navigate"] == []


def test_pages_loop_multi_extraction(spark):
    """pages=3: each seed re-extracts along the a.next navigate chain with
    incremented _page_number (S6, lxml_scraper.py:75-94 loop shape)."""
    app = Scraper()

    @app.select(css="a.next", navigate=True)
    def nav(element):
        return element.get("href")

    @app.select(css=".title", group_css=".custom-group")
    def title(element):
        return {"title": element.text_content()}

    pages = pages_df(spark, SF).select("url", "html")
    job = CrawlJob(
        spark, app, pages,
        config=CrawlConfig(follow_urls=False, pages=3, max_rounds=1, round_seconds=3600),
    )
    res = job.run(["https://host-1.test/page-0.html"])
    flat = flatten(res.results)
    got = {(r["_page_number"], r["_page_url"]) for r in flat.collect()}
    # page-0 → navigate page-1 → navigate page-3 (first a.next each time)
    assert (1, "https://host-1.test/page-0.html") in got
    assert (2, "https://host-1.test/page-1.html") in got
    assert (3, "https://host-1.test/page-3.html") in got
    assert max(p for p, _ in got) == 3  # bounded by pages=3


def test_adblock_filter(spark):
    df = spark.createDataFrame(
        [
            ("https://ads.example.com/banner.js",),
            ("https://ok.test/page.html",),
            ("https://sub.tracker.net/x",),
            ("https://ok.test/ads/pixel.gif",),
        ],
        "url string",
    )
    out = adblock_filter(df, ["||tracker.net^", "/banner\\.js/", "ads/pixel"])
    urls = {r["url"] for r in out.collect()}
    assert urls == {"https://ok.test/page.html"}


def test_adblock_easylist_excerpt(spark, caplog):
    """A raw EasyList excerpt: comments/headers and element-hiding lines are
    dropped, $-type options decide document applicability, and unsupported
    context options are ignored with a warning — never matched as literal
    pattern text (the r2 behavior silently mis-filtered real lists)."""
    import logging as _logging

    from dude_spark.politeness import _abp_parse_line, _warned_abp_options

    df = spark.createDataFrame(
        [
            ("https://x.test/ads/popunder.html",),     # $popup rule → blocked
            ("https://x.test/js/analytics.js",),       # $script rule → NOT blocked (document ctx)
            ("https://cdn.trk.example/pixel",),        # $third-party: option ignored, pattern applies
            ("https://x.test/landing$image.html",),    # literal '$image' in URL must not confuse parse
            ("https://x.test/clean.html",),
            ("https://x.test/paywall/ok.html",),       # @@...$document exception
        ],
        "url string",
    )
    easylist = [
        "[Adblock Plus 2.0]",
        "! Title: EasyList excerpt",
        "! Homepage: https://easylist.to/",
        "x.test##.ad-banner",                 # element hiding: not a URL rule
        "x.test#@#.ad-ok",                    # element-hiding exception
        "/ads/popunder*$popup",               # popup → applies to documents
        "/js/analytics.js$script",            # script-only → can't match a document fetch
        "||trk.example^$third-party",         # unsupported ctx option: ignored with warning
        "/paywall/$document",
        "@@/paywall/ok$document",
    ]
    _warned_abp_options.clear()
    with caplog.at_level(_logging.WARNING, logger="dude_spark.politeness"):
        out = {r["url"] for r in adblock_filter(df, easylist).collect()}
    assert out == {
        "https://x.test/js/analytics.js",
        "https://x.test/landing$image.html",
        "https://x.test/clean.html",
        "https://x.test/paywall/ok.html",
    }
    assert any("third-party" in r.message for r in caplog.records)
    # warning is once-per-option
    assert ("third-party" in _warned_abp_options)
    # a '$' with a non-option tail stays in the pattern
    assert _abp_parse_line("/landing$image.html") == (
        "block", "/landing$image.html", None,
    )


def test_adblock_abp_grammar(spark):
    df = spark.createDataFrame(
        [
            ("https://x.test/ads/banner_300x250.png",),   # wildcard rule
            ("https://x.test/track?id=1",),               # separator rule
            ("https://x.test/trackers.html",),            # '^' must NOT match mid-word
            ("http://start.test/a",),                     # start anchor
            ("https://notstart.test/start.test/a",),      # start anchor must not match
            ("https://x.test/allowed/ads/banner_1x1.png",),  # @@ exception
            ("https://x.test/clean.html",),
        ],
        "url string",
    )
    rules = [
        "/ads/banner_*.png",
        "/track^",
        "|http://start.test",
        "@@*allowed*",
    ]
    out = {r["url"] for r in adblock_filter(df, rules).collect()}
    assert out == {
        "https://x.test/trackers.html",
        "https://notstart.test/start.test/a",
        "https://x.test/allowed/ads/banner_1x1.png",
        "https://x.test/clean.html",
    }


def test_event_hooks_receive_round_dataframe(spark):
    app = Scraper()
    seen_counts = []

    @app.select(css=".title", group_css=".custom-group")
    def t(element):
        return {"t": element.text_content()}

    @app.pre_setup()
    def on_pre(df):  # page-table analogue of the live-page arg (base.py:504-530)
        seen_counts.append(df.count())

    @app.shutdown()
    def on_done():  # zero-arg hooks still work
        seen_counts.append("done")

    pages = pages_df(spark, SF).select("url", "html")
    job = CrawlJob(
        spark, app, pages, robots=robots_df(spark),
        config=CrawlConfig(follow_urls=False, max_rounds=1, round_seconds=3600),
    )
    job.run(seeds()[:3])
    assert seen_counts == [3, "done"]


def test_crawl_with_adblock_excludes_items(spark):
    app = Scraper()

    @app.select(css=".title", group_css=".custom-group")
    def t(element):
        return {"t": element.text_content()}

    pages = pages_df(spark, SF).select("url", "html")
    job = CrawlJob(
        spark, app, pages, robots=robots_df(spark),
        config=CrawlConfig(
            max_rounds=10, round_seconds=3600,
            adblock_rules=["/item-\\d+-\\d+\\.html/"],
        ),
    )
    res = job.run(seeds()[:4])
    assert res.trace.filter("url like '%item-%'").count() == 0
    assert res.trace.count() > 4  # real pages still crawled


def test_cli_end_to_end(spark, tmp_path):
    from dude_spark.__main__ import main
    import dude_spark.api as api

    # fresh singleton for the CLI run
    old = api.app
    api.app = Scraper()
    try:
        script = tmp_path / "rules.py"
        script.write_text(
            "from dude_spark.api import app\n"
            "@app.group(css='.custom-group')\n"
            "@app.select(css='.title')\n"
            "def title(element):\n"
            "    return {'title': element.text_content()}\n"
        )
        pages_pq = str(tmp_path / "pages.parquet")
        pages_df(spark, SF).select("url", "html").write.parquet(pages_pq)
        out = tmp_path / "out.json"
        rc = main([
            "scrape", str(script),
            "--url", "https://host-1.test/page-0.html",
            "--pages-table", pages_pq,
            "--output", str(out),
            "--max-rounds", "1",
        ])
        assert rc == 0
        data = json.loads(out.read_text())
        assert [d["title"] for d in data] == ["Title 1-1", "Title 1-2"]
        assert data[0]["_page_number"] == 1
    finally:
        api.app = old


def test_event_hook_kwargs_only_gets_no_payload(spark):
    """Regression (r2 advice, api.py run_event): a hook declared as
    ``def hook(**kwargs)`` has no positional-capable parameter — it must be
    called bare, not handed the round DataFrame positionally."""
    app = Scraper()
    calls = []

    @app.select(css=".title", group_css=".custom-group")
    def t(element):
        return {"t": element.text_content()}

    @app.pre_setup()
    def kw_hook(**kwargs):
        calls.append(dict(kwargs))

    pages = pages_df(spark, SF).select("url", "html")
    job = CrawlJob(
        spark, app, pages, robots=robots_df(spark),
        config=CrawlConfig(follow_urls=False, max_rounds=1, round_seconds=3600),
    )
    job.run(seeds()[:2])
    assert calls == [{}]


def test_adblock_context_options(spark):
    """$third-party / $~third-party / $domain= evaluated against a
    referring-page column (reference feeds source_url to braveblock,
    optional/utils.py:36-43). Seeds (NULL source) are first-party."""
    from dude_spark.politeness import adblock_filter

    df = spark.createDataFrame(
        [
            # (url, source_url)
            ("https://ads.example/a.html", "https://news.test/index.html"),  # 3p
            ("https://ads.example/b.html", "https://sub.ads.example/x"),     # 1p (same registrable)
            ("https://ads.example/c.html", None),                            # seed
            ("https://news.test/same.html", "https://news.test/index.html"), # 1p
            ("https://trk.test/p.html", "https://partner.test/x"),           # domain= hit
            ("https://trk.test/q.html", "https://other.test/x"),             # domain= miss
            ("https://first.test/f.html", "https://first.test/index.html"),  # ~third-party hit
        ],
        "url string, source_url string",
    )
    rules = [
        "||ads.example^$third-party",     # blocks a (3p), not b (1p) or c (seed)
        "/p\\.html/$domain=partner.test|~x.partner.test",
        "/f\\.html/$~third-party",        # first-party only
    ]
    out = {r["url"] for r in adblock_filter(df, rules, source_col="source_url").collect()}
    assert out == {
        "https://ads.example/b.html",
        "https://ads.example/c.html",
        "https://news.test/same.html",
        "https://trk.test/q.html",
    }
