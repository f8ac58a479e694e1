"""Public-suffix-list registrable-domain support (eTLD+1).

The PSL (publicsuffix.org — openly published suffix data) is the canonical
map from host to registrable domain; ABP ``$third-party`` is defined over
registrable domains, and the reference gets this for free from
``braveblock`` (``optional/utils.py:31-46``). ``DEFAULT_RULES`` embeds the
common ICANN multi-label suffixes so co.uk-style hosts resolve correctly
out of the box; deployments ship the full list file via
:func:`load_public_suffix_list` (standard PSL file format: ``//`` comments,
``*.`` wildcard rules, ``!`` exception rules).

Spark-first shape: the rule set compiles to ONE regex alternation per
suffix depth, evaluated as a short CASE/WHEN chain of ``regexp_extract``
inside the caller's projection — codegen'd JVM-side, no join, no UDF. A
constant dimension this small belongs in the instruction stream; the
broadcast-join alternative would pay a hash build + probe per row for what
is a literal label-suffix test. (At the full 9k-rule PSL the per-depth
alternation is ~100 KB of regex — still a constant folded once per task;
if a codegen limit is ever hit, chunk the alternation into a few extracts
OR'd together, not a join.)

PSL semantics implemented: longest matching rule wins; ``!exception``
beats ``*.wildcard``; a host that IS exactly a public suffix has no
registrable domain (we fall back to the host's last two labels — the
conservative choice for third-party comparison). Unknown TLDs use the
implicit ``*`` rule: last two labels.
"""

from __future__ import annotations

import os
import re
from typing import Iterable, List, Tuple

from pyspark.sql import Column, functions as F

# Embedded subset of the ICANN section: the high-traffic multi-label
# suffixes plus the canonical wildcard/exception examples. NOT the full
# list — load_public_suffix_list() installs one.
DEFAULT_RULES = """
ac.uk co.uk gov.uk ltd.uk me.uk net.uk org.uk plc.uk sch.uk
ac.jp co.jp go.jp ne.jp or.jp
asn.au com.au edu.au gov.au id.au net.au org.au
com.br gov.br net.br org.br
ac.nz co.nz govt.nz net.nz org.nz
co.in firm.in gen.in ind.in net.in org.in
ac.za co.za gov.za net.za org.za
com.cn edu.cn gov.cn net.cn org.cn
com.tw net.tw org.tw
com.hk edu.hk gov.hk net.hk org.hk
com.sg edu.sg gov.sg net.sg org.sg
com.mx edu.mx gob.mx net.mx org.mx
com.ar net.ar org.ar
ac.kr co.kr go.kr ne.kr or.kr re.kr
ac.il co.il gov.il net.il org.il
com.tr gov.tr net.tr org.tr
com.my gov.my net.my org.my
ac.th co.th go.th in.th or.th
com.vn net.vn org.vn
com.ph net.ph org.ph
ac.id co.id go.id or.id web.id
com.ng gov.ng org.ng
ac.ke co.ke go.ke or.ke
com.ua net.ua org.ua
com.pl edu.pl net.pl org.pl
com.eg com.sa org.sa com.pk net.pk org.pk
*.ck !www.ck *.mm *.np
""".split()


def _parse_rules(lines: Iterable[str]) -> Tuple[List[str], List[str], List[str]]:
    """PSL file format → (normal, wildcard-TLD-suffixes, exceptions)."""
    normal: List[str] = []
    wild: List[str] = []
    exc: List[str] = []
    for raw in lines:
        line = raw.strip().lower()
        if not line or line.startswith("//"):
            continue
        line = line.split()[0]  # the spec: rule ends at first whitespace
        if line.startswith("!"):
            exc.append(line[1:])
        elif line.startswith("*."):
            wild.append(line[2:])
        elif "." in line:  # 1-label rules are the implicit default already
            normal.append(line)
    return normal, wild, exc


class _CompiledPSL:
    """Per-depth ``([^.]+\\.(?:alt))$`` extraction patterns, deepest first,
    preceded by exception patterns (PSL precedence)."""

    def __init__(self, normal: List[str], wild: List[str], exc: List[str]):
        self.n_rules = len(normal) + len(wild) + len(exc)
        pats: List[str] = []
        if exc:
            # exception rule e: e itself is registrable for any host in e
            alt = "|".join(re.escape(e) for e in sorted(exc))
            pats.append(r"(?:^|\.)(" + alt + r")$")
        by_depth: dict = {}
        for s in normal:
            by_depth.setdefault(s.count(".") + 1, set()).add(re.escape(s))
        for t in wild:
            # *.t: suffix = <label>.t → registrable = <label>.<label>.t
            by_depth.setdefault(t.count(".") + 2, set()).add(
                r"[^.]+\." + re.escape(t)
            )
        for depth in sorted(by_depth, reverse=True):
            alt = "|".join(sorted(by_depth[depth]))
            pats.append(r"([^.]+\.(?:" + alt + r"))$")
        self.patterns = pats


_current = _CompiledPSL(*_parse_rules(DEFAULT_RULES))


def load_public_suffix_list(source) -> int:
    """Install a full PSL: ``source`` is a file path or an iterable of
    lines in the standard publicsuffix.org format. Returns the rule count.
    Affects DataFrames PLANNED afterwards (the expression is baked at plan
    time — same contract as any literal dimension)."""
    global _current
    if isinstance(source, (str, os.PathLike)):
        with open(source, encoding="utf-8") as f:
            lines = f.read().splitlines()
    else:
        lines = list(source)
    _current = _CompiledPSL(*_parse_rules(lines))
    return _current.n_rules


def registrable(host: Column) -> Column:
    """Registrable domain (eTLD+1) of a lowercase host column, per the
    installed PSL; implicit-``*`` fallback = last two labels; single-label
    hosts map to themselves."""
    two = F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)
    expr = F.when(two == "", host).otherwise(two)
    for pat in reversed(_current.patterns):
        hit = F.regexp_extract(host, pat, 1)
        expr = F.when(hit != "", hit).otherwise(expr)
    return expr
