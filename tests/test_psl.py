"""Public-suffix-list registrable-domain (psl.py) + its $third-party use.

PSL semantics under test (publicsuffix.org algorithm): longest rule wins,
``!exception`` beats ``*.wildcard``, unknown TLDs fall back to the
implicit ``*`` rule (last two labels), single-label hosts map to
themselves. The reference gets eTLD+1 from braveblock
(optional/utils.py:31-46); this is our from-scratch Spark-expression twin.
"""

import pyspark.sql.functions as F
import pytest

from dude_spark import psl


CASES = [
    # multi-label ICANN suffixes from the embedded subset
    ("shop.host-9.co.uk", "host-9.co.uk"),
    ("www.host-10.co.uk", "host-10.co.uk"),
    ("deep.x.com.au", "x.com.au"),
    ("x.com.au", "x.com.au"),
    # implicit * rule: unknown TLD → last two labels
    ("host-3.test", "host-3.test"),
    ("a.b.example.com", "example.com"),
    # single label
    ("localhost", "localhost"),
    # wildcard *.ck: public suffix is <label>.ck → registrable = 3 labels
    ("a.b.ck", "a.b.ck"),
    # exception !www.ck beats *.ck
    ("foo.www.ck", "www.ck"),
    ("www.ck", "www.ck"),
    # label boundaries: xco.uk must NOT match the co.uk rule
    ("xco.uk", "xco.uk"),
    ("foo.xco.uk", "xco.uk"),
]


def test_registrable_psl_semantics(spark):
    df = spark.createDataFrame([(h,) for h, _ in CASES], "host string")
    got = {
        r["host"]: r["reg"]
        for r in df.select(
            "host", psl.registrable(F.col("host")).alias("reg")
        ).collect()
    }
    for host, want in CASES:
        assert got[host] == want, f"registrable({host}) = {got[host]} != {want}"


def test_load_psl_file_format(spark, tmp_path):
    lines = [
        "// ===BEGIN ICANN DOMAINS===",
        "",
        "uk",
        "co.uk  // trailing comment after whitespace",
        "*.nom.br",
        "!special.nom.br",
    ]
    p = tmp_path / "psl.dat"
    p.write_text("\n".join(lines))
    old = psl._current
    try:
        n = psl.load_public_suffix_list(str(p))
        assert n == 3  # 1-label rules fold into the implicit default
        df = spark.createDataFrame(
            [("a.b.nom.br",), ("x.special.nom.br",), ("s.co.uk",)],
            "host string",
        )
        got = {
            r["host"]: r["reg"]
            for r in df.select(
                "host", psl.registrable(F.col("host")).alias("reg")
            ).collect()
        }
        assert got["a.b.nom.br"] == "a.b.nom.br"       # wildcard suffix
        assert got["x.special.nom.br"] == "special.nom.br"  # exception
        assert got["s.co.uk"] == "s.co.uk"             # normal 2-label rule
    finally:
        psl._current = old


def test_third_party_uses_psl(spark):
    """The co.uk discriminator: src www.host-10.co.uk vs url
    shop.host-9.co.uk is THIRD-party under the PSL (host-10.co.uk !=
    host-9.co.uk) but first-party under a last-two-labels approximation
    (co.uk == co.uk) — the adblock_gate oracle row depends on this."""
    from dude_spark.politeness import adblock_filter

    rows = [
        ("https://shop.host-9.co.uk/p1.html", "https://www.host-10.co.uk/i.html"),
        ("https://shop.host-9.co.uk/p2.html", "https://www.host-9.co.uk/i.html"),
    ]
    df = spark.createDataFrame(rows, "url string, source_url string")
    kept = [
        r["url"]
        for r in adblock_filter(
            df, ["||host-9.co.uk^$third-party"], source_col="source_url"
        ).collect()
    ]
    assert kept == ["https://shop.host-9.co.uk/p2.html"]
