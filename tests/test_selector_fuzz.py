"""Grammar fuzz of the CSS/XPath SELECTOR engines (VERDICT r3 #8).

test_dom_fuzz.py differentially tests the *tree builder*; this suite fuzzes
the *selector parsers/evaluators*:

1. **Parity fuzz**: random selectors are generated AST-FIRST from the
   documented grammar subset (dom.py:13-44), rendered to selector strings
   for ``css_select``/``xpath_select``, and independently evaluated by a
   naive spec-following interpreter over the same clean tree (plain
   recursive predicates over element lists — no shared code with dom.py's
   compiled matchers). Any divergence is a parser/evaluator bug.
2. **Rejection fuzz**: off-grammar strings — curated unsupported features
   and random junk mutations — must raise ``ValueError`` (the documented
   contract: unsupported forms raise loudly), never mis-select silently
   and never escape with a non-ValueError crash.

Both run on deterministic seeds (no flaky randomness).
"""

from __future__ import annotations

import random

import pytest

from dude_spark.dom import Element, css_select, parse_html, xpath_select

N_ITER = 400  # trees × selectors per block; 4 blocks below


# --------------------------------------------------------------------------
# Random clean tree
# --------------------------------------------------------------------------

TAGS = ["div", "span", "p", "ul", "li", "a", "em", "section"]
CLASSES = ["alpha", "beta", "gamma", "x1"]
ATTRS = ["data-x", "href", "title"]
VALS = ["one", "two", "three", "al-pha", ""]
LANGS = ["en", "en-US", "fr", "de-CH"]


def gen_tree(rng: random.Random) -> Element:
    def node(depth: int) -> str:
        tag = rng.choice(TAGS)
        attrs = []
        if rng.random() < 0.6:
            attrs.append(
                f'class="{" ".join(rng.sample(CLASSES, rng.randint(1, 2)))}"'
            )
        if rng.random() < 0.3:
            attrs.append(f'id="id{rng.randint(0, 30)}"')
        if rng.random() < 0.5:
            attrs.append(f'{rng.choice(ATTRS)}="{rng.choice(VALS)}"')
        if rng.random() < 0.2:
            attrs.append(f'lang="{rng.choice(LANGS)}"')
        inner = f"t{rng.randint(0, 9)}" if rng.random() < 0.5 else ""
        if depth < 3 and rng.random() < 0.7:
            inner += "".join(node(depth + 1) for _ in range(rng.randint(1, 3)))
        a = (" " + " ".join(attrs)) if attrs else ""
        return f"<{tag}{a}>{inner}</{tag}>"

    return parse_html(f"<html><body>{node(0)}{node(0)}</body></html>")


def _elem_children(el: Element):
    return [c for c in el.children if isinstance(c, Element)]


def _descendants(el: Element):
    out = []
    for c in _elem_children(el):
        out.append(c)
        out.extend(_descendants(c))
    return out


def naive_text_content(el: Element) -> str:
    """Independent text_content: descendant text in document order."""
    return "".join(
        naive_text_content(c) if isinstance(c, Element) else c
        for c in el.children
    )


# --------------------------------------------------------------------------
# CSS: AST generation + naive evaluation + rendering
# --------------------------------------------------------------------------


def gen_compound(rng: random.Random, allow_not: bool = True) -> dict:
    comp = {"tag": rng.choice(TAGS) if rng.random() < 0.6 else None, "parts": []}
    n_parts = rng.randint(0 if comp["tag"] else 1, 2)
    for _ in range(n_parts):
        kind = rng.choice(
            ["class", "id", "attr", "nth", "first", "last", "lang"]
            # :is/:has/:nth-child(An+B of S) only at nesting depth 0
            # (allow_not doubles as the nesting guard) — bounded grammar
            + (["not", "is", "has", "nth_of"] if allow_not else [])
        )
        if kind == "class":
            comp["parts"].append(("class", rng.choice(CLASSES)))
        elif kind == "id":
            comp["parts"].append(("id", f"id{rng.randint(0, 30)}"))
        elif kind == "attr":
            op = rng.choice(["", "=", "^=", "$=", "*=", "~="])
            val = rng.choice([v for v in VALS if v] if op else [""])
            comp["parts"].append(("attr", rng.choice(ATTRS), op, val if op else None))
        elif kind == "nth":
            comp["parts"].append(("nth", rng.randint(1, 4)))
        elif kind == "nth_of":
            # :nth-child(An+B of S) / :nth-last-child(An+B of S)
            a = rng.choice([0, 1, 2, 3])
            b = rng.randint(0 if a else 1, 3)
            chains = [gen_chain(rng, nested=True)
                      for _ in range(rng.randint(1, 2))]
            comp["parts"].append(("nth_of", a, b, chains, rng.random() < 0.5))
        elif kind == "lang":
            codes = rng.sample(["en", "en-us", "fr", "de", "de-ch"],
                               rng.randint(1, 2))
            comp["parts"].append(("lang", codes))
        elif kind == "first":
            comp["parts"].append(("first",))
        elif kind == "last":
            comp["parts"].append(("last",))
        elif kind == "is":
            chains = [
                gen_chain(rng, nested=True)
                for _ in range(rng.randint(1, 2))
            ]
            comp["parts"].append(("is", chains, rng.random() < 0.5))
        elif kind == "has":
            comb = rng.choice([" ", ">", "+", "~"])
            comp["parts"].append(("has", comb, gen_chain(rng, nested=True)))
        else:
            inner = gen_compound(rng, allow_not=False)
            inner["parts"] = inner["parts"][:1]  # :not(simple)
            comp["parts"].append(("not", inner))
    return comp


def render_compound(comp: dict) -> str:
    s = comp["tag"] or ("" if comp["parts"] else "*")
    for part in comp["parts"]:
        k = part[0]
        if k == "class":
            s += f".{part[1]}"
        elif k == "id":
            s += f"#{part[1]}"
        elif k == "attr":
            _, name, op, val = part
            s += f"[{name}]" if op == "" else f'[{name}{op}"{val}"]'
        elif k == "nth":
            s += f":nth-child({part[1]})"
        elif k == "nth_of":
            _, a, b, chains, is_last = part
            anb = str(b) if a == 0 else (f"{a}n+{b}" if b else f"{a}n")
            name = "nth-last-child" if is_last else "nth-child"
            lst = ", ".join(render_chain(c) for c in chains)
            s += f":{name}({anb} of {lst})"
        elif k == "lang":
            s += f":lang({', '.join(part[1])})"
        elif k == "first":
            s += ":first-child"
        elif k == "last":
            s += ":last-child"
        elif k == "is":
            name = "is" if part[2] else "where"
            s += f":{name}({', '.join(render_chain(c) for c in part[1])})"
        elif k == "has":
            comb = part[1]
            pre = "" if comb == " " else f"{comb} "
            s += f":has({pre}{render_chain(part[2])})"
        else:
            s += f":not({render_compound(part[1])})"
    return s or "*"


def match_compound(el: Element, comp: dict) -> bool:
    if el.tag in ("#document",):
        return False
    if comp["tag"] and el.tag != comp["tag"]:
        return False
    for part in comp["parts"]:
        k = part[0]
        if k == "class":
            ok = part[1] in (el.get("class") or "").split()
        elif k == "id":
            ok = el.get("id") == part[1]
        elif k == "attr":
            _, name, op, val = part
            v = el.get(name)
            if op == "":
                ok = v is not None
            elif v is None:
                ok = False
            elif op == "=":
                ok = v == val
            elif op == "^=":
                ok = val != "" and v.startswith(val)
            elif op == "$=":
                ok = val != "" and v.endswith(val)
            elif op == "*=":
                ok = val != "" and val in v
            else:  # ~=
                ok = val in v.split()
        elif k == "nth_of":
            _, a, b, chains, is_last = part
            root = el
            while root.parent is not None:
                root = root.parent

            def _of(x: Element) -> bool:
                return any(match_chain(x, c, root) for c in chains)

            if not _of(el):
                ok = False
            else:
                sibs = (
                    _elem_children(el.parent) if el.parent is not None else [el]
                )
                matched = [s for s in sibs if _of(s)]
                idx, n = matched.index(el) + 1, len(matched)
                if is_last:
                    idx = n - idx + 1
                if a == 0:
                    ok = idx == b
                else:
                    d = idx - b
                    ok = d % a == 0 and d // a >= 0
        elif k == "lang":
            cur, av = el, None
            while cur is not None:
                v = cur.get("lang")
                if v is not None:
                    av = v.lower()
                    break
                cur = cur.parent
            ok = av is not None and any(
                av == c or av.startswith(c + "-") for c in part[1]
            )
        elif k in ("nth", "first", "last"):
            if el.parent is None:
                sibs = [el]
            else:
                sibs = _elem_children(el.parent)
            if k == "nth":
                ok = sibs.index(el) + 1 == part[1]
            elif k == "first":
                ok = sibs[0] is el
            else:
                ok = sibs[-1] is el
        elif k == "is":
            root = el
            while root.parent is not None:
                root = root.parent
            ok = any(match_chain(el, c, root) for c in part[1])
        elif k == "has":
            ok = naive_relative(el, part[1], part[2])
        else:  # not
            ok = not match_compound(el, part[1])
        if not ok:
            return False
    return True


def _is_strict_ancestor(anc: Element, el: Element) -> bool:
    p = el.parent
    while p is not None:
        if p is anc:
            return True
        p = p.parent
    return False


def naive_relative(el: Element, comb: str, chain: list) -> bool:
    """Independent :has() semantics: exists d matching the chain whose
    LEFTMOST compound lands on an element related to ``el`` by ``comb``."""
    comps = [chain[0]] + [c for _, c in chain[1:]]
    combs = [None] + [cb for cb, _ in chain[1:]]

    def anchor_ok(a: Element) -> bool:
        if comb == " ":
            return _is_strict_ancestor(el, a)
        if comb == ">":
            return a.parent is el
        if el.parent is None:
            return False
        sibs = _elem_children(el.parent)
        i = sibs.index(el)
        if comb == "+":
            return i + 1 < len(sibs) and a is sibs[i + 1]
        return a in sibs[i + 1:]

    def rec(e: Element, idx: int) -> bool:
        if not match_compound(e, comps[idx]):
            return False
        if idx == 0:
            return anchor_ok(e)
        cb = combs[idx]
        if cb == ">":
            return e.parent is not None and rec(e.parent, idx - 1)
        if cb == " ":
            p = e.parent
            while p is not None:
                if rec(p, idx - 1):
                    return True
                p = p.parent
            return False
        sibs = _elem_children(e.parent) if e.parent is not None else [e]
        i = sibs.index(e)
        if cb == "+":
            return i > 0 and rec(sibs[i - 1], idx - 1)
        return any(rec(s, idx - 1) for s in sibs[:i])

    root = el
    while root.parent is not None:
        root = root.parent
    doc = [root] + _descendants(root)
    return any(rec(d, len(comps) - 1) for d in doc)


def gen_chain(rng: random.Random, nested: bool = False) -> list:
    """[comp0, (comb, comp1), ...] — up to 3 compounds. ``nested`` chains
    (inside :is/:has) stay shorter and cannot nest further."""
    allow = not nested
    chain = [gen_compound(rng, allow_not=allow)]
    for _ in range(rng.randint(0, 1 if nested else 2)):
        chain.append(
            (rng.choice([" ", ">", "+", "~"]),
             gen_compound(rng, allow_not=allow))
        )
    return chain


def render_chain(chain: list) -> str:
    s = render_compound(chain[0])
    for comb, comp in chain[1:]:
        s += (" " if comb == " " else f" {comb} ") + render_compound(comp)
    return s


def match_chain(el: Element, chain: list, scope: Element) -> bool:
    comps = [chain[0]] + [c for _, c in chain[1:]]
    combs = [None] + [comb for comb, _ in chain[1:]]

    def in_scope(e: Element) -> bool:
        p = e
        while p is not None:
            if p is scope:
                return True
            p = p.parent
        return False

    def rec(e: Element, idx: int) -> bool:
        if not match_compound(e, comps[idx]):
            return False
        if idx == 0:
            return in_scope(e)
        comb = combs[idx]
        if comb == ">":
            return e.parent is not None and rec(e.parent, idx - 1)
        if comb == " ":
            p = e.parent
            while p is not None:
                if rec(p, idx - 1):
                    return True
                p = p.parent
            return False
        sibs = _elem_children(e.parent) if e.parent is not None else [e]
        i = sibs.index(e)
        if comb == "+":
            return i > 0 and rec(sibs[i - 1], idx - 1)
        # '~'
        return any(rec(s, idx - 1) for s in sibs[:i])

    return rec(el, len(comps) - 1)


def naive_css(scope: Element, group: list) -> list:
    cands = [scope] + _descendants(scope)
    out = []
    for el in cands:
        if any(match_chain(el, chain, scope) for chain in group):
            out.append(el)
    return out


@pytest.mark.parametrize("block", range(4))
def test_css_selector_parity_fuzz(block: int) -> None:
    rng = random.Random(1000 + block)
    for it in range(N_ITER):
        root = gen_tree(rng)
        group = [gen_chain(rng) for _ in range(rng.randint(1, 2))]
        sel = ", ".join(render_chain(c) for c in group)
        got = css_select(root, sel)
        want = naive_css(root, group)
        assert [id(e) for e in got] == [id(e) for e in want], (
            f"seed={1000 + block}/{it} selector={sel!r}\n"
            f"got={[e.tag for e in got]} want={[e.tag for e in want]}"
        )


# --------------------------------------------------------------------------
# XPath: AST generation + naive evaluation + rendering
# --------------------------------------------------------------------------

CMP_OPS = ["=", "!=", "<", ">", "<=", ">="]


# -- string-expression sub-grammar (r5: the _str_of tail) -------------------

STR_LITS = ["one", "e", "al", "", "t w"]
TR_FROM = ["abc", "on", "etw", "o"]
TR_TO = ["ABC", "ON", "", "0"]


def gen_strexpr(rng: random.Random, depth: int = 0):
    kinds = ["sattr", "slit"]
    if depth < 2:
        kinds += ["sconcat", "sns", "stranslate", "sbefore", "safter"]
    k = rng.choice(kinds)
    if k == "sattr":
        return ("sattr", rng.choice(ATTRS + ["class"]))
    if k == "slit":
        return ("slit", rng.choice(STR_LITS))
    if k == "sconcat":
        return ("sconcat",
                [gen_strexpr(rng, depth + 1) for _ in range(rng.randint(2, 3))])
    if k == "sns":
        return ("sns", gen_strexpr(rng, depth + 1))
    if k == "stranslate":
        return ("stranslate", gen_strexpr(rng, depth + 1),
                rng.choice(TR_FROM), rng.choice(TR_TO))
    return (k, gen_strexpr(rng, depth + 1), gen_strexpr(rng, depth + 1))


def render_strexpr(s) -> str:
    k = s[0]
    if k == "sattr":
        return f"@{s[1]}"
    if k == "slit":
        return f"'{s[1]}'"
    if k == "sconcat":
        return "concat(" + ", ".join(render_strexpr(x) for x in s[1]) + ")"
    if k == "sns":
        return f"normalize-space({render_strexpr(s[1])})"
    if k == "stranslate":
        return f"translate({render_strexpr(s[1])}, '{s[2]}', '{s[3]}')"
    fn = "substring-before" if k == "sbefore" else "substring-after"
    return f"{fn}({render_strexpr(s[1])}, {render_strexpr(s[2])})"


def eval_strexpr(s, el: Element) -> str:
    """Independent spec evaluation of the string sub-grammar (coercion:
    a missing attribute reads as '' — node-set existential rules apply
    only at the top level of =/!= and are handled by the callers)."""
    k = s[0]
    if k == "sattr":
        return el.attrib.get(s[1]) or ""
    if k == "slit":
        return s[1]
    if k == "sconcat":
        return "".join(eval_strexpr(x, el) for x in s[1])
    if k == "sns":
        return " ".join(eval_strexpr(s[1], el).split())
    if k == "stranslate":
        src, frm, to = eval_strexpr(s[1], el), s[2], s[3]
        out = []
        for ch in src:
            i = frm.find(ch)  # first occurrence wins
            if i == -1:
                out.append(ch)
            elif i < len(to):
                out.append(to[i])
            # else: over-long from deletes the character
        return "".join(out)
    a = eval_strexpr(s[1], el)
    b = eval_strexpr(s[2], el)
    if b == "":  # libxml2 parity: '' precedes nothing, follows everything
        return "" if k == "sbefore" else a
    pre, sep, post = a.partition(b)
    if not sep:
        return ""
    return pre if k == "sbefore" else post


def _bare_attr_missing(s, el: Element) -> bool:
    """A top-level BARE @attr side of =/!= is a node-set: when the
    attribute is absent the node-set is empty and the comparison is false
    regardless of operator (XPath 1.0 §3.4)."""
    return s[0] == "sattr" and s[1] not in el.attrib


def gen_pred(rng: random.Random, depth: int = 0):
    kinds = ["posbare", "poscmp", "last", "attr", "attreq", "contains",
             "count", "strlen", "strpath", "path",
             "strcmp2", "strfn2", "boolattr", "attrcmp"]
    if depth < 1:
        kinds += ["and", "or", "not"]
    k = rng.choice(kinds)
    if k == "posbare":
        return ("posbare", rng.randint(1, 4))
    if k == "poscmp":
        return ("poscmp", rng.choice(CMP_OPS), rng.randint(1, 4))
    if k == "last":
        return ("last",)
    if k == "attr":
        return ("attr", rng.choice(ATTRS + ["class", "id"]))
    if k == "attreq":
        # wrap flag: render @a as string(@a) — DIFFERENT semantics since
        # r5's spec alignment: bare @a is a node-set (missing attribute →
        # both = and != false), string(@a) coerces missing to ''
        return ("attreq", rng.choice(ATTRS), rng.choice([v for v in VALS if v]),
                rng.random() < 0.3, rng.random() < 0.4)
    if k == "strcmp2":
        # X = Y / X != Y over arbitrary string expressions
        return ("strcmp2", gen_strexpr(rng), gen_strexpr(rng),
                rng.random() < 0.4)
    if k == "strfn2":
        # contains/starts-with over arbitrary string expressions
        return ("strfn2", rng.choice(["contains", "starts-with"]),
                gen_strexpr(rng), gen_strexpr(rng))
    if k == "boolattr":
        # wrap flag: boolean(normalize-space(@a)) is the STRING form
        # (non-empty), bare boolean(@a) the node-set form (presence)
        return ("boolattr", rng.choice(ATTRS + ["class"]), rng.random() < 0.5)
    if k == "attrcmp":
        return ("attrcmp", rng.choice(ATTRS + ["class"]),
                rng.choice(ATTRS + ["class"]), rng.random() < 0.4)
    if k == "contains":
        return ("contains", rng.choice(ATTRS), rng.choice(["on", "e", "al"]),
                rng.random() < 0.4)
    if k == "count":
        return ("count", rng.choice(TAGS), rng.choice(CMP_OPS), rng.randint(0, 3))
    if k == "strlen":
        return ("strlen", rng.choice(ATTRS), rng.choice(CMP_OPS), rng.randint(0, 6),
                rng.random() < 0.4)
    if k == "strpath":
        # node-set string(): string value of the FIRST child named tag
        return ("strpath", rng.choice(TAGS), rng.choice(["t0", "t1", "t2", "e"]))
    if k == "path":
        # location-path existence: [tag], [.//tag], [tag1/tag2]
        form = rng.choice(["child", "desc", "two"])
        if form == "two":
            return ("path", form, rng.choice(TAGS), rng.choice(TAGS))
        return ("path", form, rng.choice(TAGS), None)
    if k == "not":
        return ("not", gen_pred(rng, depth + 1))
    return (k, gen_pred(rng, depth + 1), gen_pred(rng, depth + 1))


def render_pred(p) -> str:
    k = p[0]
    if k == "posbare":
        return str(p[1])
    if k == "poscmp":
        return f"position() {p[1]} {p[2]}"
    if k == "last":
        return "last()"
    if k == "attr":
        return f"@{p[1]}"
    if k == "attreq":
        arg = f"string(@{p[1]})" if p[4] else f"@{p[1]}"
        return f"{arg} {'!=' if p[3] else '='} '{p[2]}'"
    if k == "strcmp2":
        return (f"{render_strexpr(p[1])} {'!=' if p[3] else '='} "
                f"{render_strexpr(p[2])}")
    if k == "strfn2":
        return f"{p[1]}({render_strexpr(p[2])}, {render_strexpr(p[3])})"
    if k == "boolattr":
        return (f"boolean(normalize-space(@{p[1]}))" if p[2]
                else f"boolean(@{p[1]})")
    if k == "attrcmp":
        return f"@{p[1]} {'!=' if p[3] else '='} @{p[2]}"
    if k == "contains":
        arg = f"string(@{p[1]})" if p[3] else f"@{p[1]}"
        return f"contains({arg}, '{p[2]}')"
    if k == "count":
        return f"count({p[1]}) {p[2]} {p[3]}"
    if k == "strlen":
        arg = f"string(@{p[1]})" if p[4] else f"@{p[1]}"
        return f"string-length({arg}) {p[2]} {p[3]}"
    if k == "strpath":
        return f"contains(string({p[1]}), '{p[2]}')"
    if k == "path":
        if p[1] == "child":
            return p[2]
        if p[1] == "desc":
            return f".//{p[2]}"
        return f"{p[2]}/{p[3]}"
    if k == "not":
        return f"not({render_pred(p[1])})"
    return f"({render_pred(p[1])}) {k} ({render_pred(p[2])})"


def eval_pred(p, el: Element, pos: int, total: int) -> bool:
    k = p[0]
    cmp = {
        "=": lambda a, b: a == b, "!=": lambda a, b: a != b,
        "<": lambda a, b: a < b, ">": lambda a, b: a > b,
        "<=": lambda a, b: a <= b, ">=": lambda a, b: a >= b,
    }
    if k == "posbare":
        return pos == p[1]
    if k == "poscmp":
        return cmp[p[1]](pos, p[2])
    if k == "last":
        return pos == total
    if k == "attr":
        return p[1] in el.attrib
    if k == "attreq":
        if not p[4] and p[1] not in el.attrib:
            return False  # bare @a: empty node-set → = and != both false
        eq = (el.attrib.get(p[1]) or "") == p[2]
        return not eq if p[3] else eq
    if k == "strcmp2":
        if _bare_attr_missing(p[1], el) or _bare_attr_missing(p[2], el):
            return False
        eq = eval_strexpr(p[1], el) == eval_strexpr(p[2], el)
        return not eq if p[3] else eq
    if k == "strfn2":
        # function arguments coerce through string() — no existential rule
        x = eval_strexpr(p[2], el)
        y = eval_strexpr(p[3], el)
        return (y in x) if p[1] == "contains" else x.startswith(y)
    if k == "boolattr":
        if p[2]:
            return bool(" ".join((el.attrib.get(p[1]) or "").split()))
        return p[1] in el.attrib
    if k == "attrcmp":
        if p[1] not in el.attrib or p[2] not in el.attrib:
            return False
        eq = el.attrib[p[1]] == el.attrib[p[2]]
        return not eq if p[3] else eq
    if k == "contains":
        return p[2] in (el.attrib.get(p[1]) or "")
    if k == "count":
        n = sum(1 for c in _elem_children(el) if c.tag == p[1])
        return cmp[p[2]](n, p[3])
    if k == "strlen":
        return cmp[p[2]](len(el.attrib.get(p[1]) or ""), p[3])
    if k == "strpath":
        first = next((c for c in _elem_children(el) if c.tag == p[1]), None)
        return first is not None and p[2] in naive_text_content(first)
    if k == "path":
        if p[1] == "child":
            return any(c.tag == p[2] for c in _elem_children(el))
        if p[1] == "desc":
            return any(d.tag == p[2] for d in _descendants(el))
        return any(
            c.tag == p[2] and any(g.tag == p[3] for g in _elem_children(c))
            for c in _elem_children(el)
        )
    if k == "not":
        return not eval_pred(p[1], el, pos, total)
    if k == "and":
        return eval_pred(p[1], el, pos, total) and eval_pred(p[2], el, pos, total)
    return eval_pred(p[1], el, pos, total) or eval_pred(p[2], el, pos, total)


def gen_xpath(rng: random.Random) -> list:
    """[(axis, tag, preds), ...] — 1..3 steps, first is always //."""
    steps = []
    for i in range(rng.randint(1, 3)):
        axis = "//" if (i == 0 or rng.random() < 0.5) else "/"
        tag = rng.choice(TAGS + ["*"])
        preds = [gen_pred(rng) for _ in range(rng.randint(0, 2))]
        steps.append((axis, tag, preds))
    return steps


def render_xpath(steps: list) -> str:
    s = "."
    for axis, tag, preds in steps:
        s += axis + tag + "".join(f"[{render_pred(p)}]" for p in preds)
    return s


def naive_xpath(scope: Element, steps: list) -> list:
    nodes = [scope]
    for axis, tag, preds in steps:
        nxt = []
        for n in nodes:
            if axis == "//":
                # abbreviated //: child groups of n and of every descendant
                # (position is per PARENT's child list — XPath 1.0 expansion)
                groups = [_elem_children(ctx) for ctx in [n] + _descendants(n)]
            else:
                groups = [_elem_children(n)]
            for grp in groups:
                cur = [e for e in grp if tag == "*" or e.tag == tag]
                for p in preds:
                    tot = len(cur)
                    cur = [
                        e for i, e in enumerate(cur, 1) if eval_pred(p, e, i, tot)
                    ]
                nxt.extend(cur)
        seen: set = set()
        nodes = []
        for e in sorted(nxt, key=lambda x: x.order):
            if id(e) not in seen:
                seen.add(id(e))
                nodes.append(e)
    return nodes


@pytest.mark.parametrize("block", range(4))
def test_xpath_selector_parity_fuzz(block: int) -> None:
    rng = random.Random(2000 + block)
    for it in range(N_ITER):
        root = gen_tree(rng)
        steps = gen_xpath(rng)
        expr = render_xpath(steps)
        got = xpath_select(root, expr)
        want = naive_xpath(root, steps)
        assert [id(e) for e in got] == [id(e) for e in want], (
            f"seed={2000 + block}/{it} xpath={expr!r}\n"
            f"got={[e.tag for e in got]} want={[e.tag for e in want]}"
        )


# --------------------------------------------------------------------------
# Rejection fuzz: off-grammar must raise ValueError, never mis-select
# --------------------------------------------------------------------------

CSS_UNSUPPORTED = [
    "div:hover", "a:visited", "p::before", "p::after",
    "div:lang()", "div:nth-child(2n of)", "div:nth-col(2)",
    ":focus-within", "div:dir(ltr)", "div:has(a", ":is(div,, p)",
]
XPATH_UNSUPPORTED = [
    # substring-after/translate/number/boolean moved to SUPPORTED in r5
    # (generalized string-expression grammar) — replaced with forms that
    # stay off-grammar: wrong arity, unknown functions, variables, id().
    ".//div[name(@x) = 'div']", ".//div[lang('en')]",
    ".//div[substring-after(@x) = 'b']", ".//div[$var = 1]",
    ".//div[string(@x, 'y')]", ".//div[id('a')]", ".//div[string(p]",
    ".//div[translate(@x, 'a') = 'b']",
    ".//div[number(frob()) = 1]", "div/p",  # no leading / or //
]

JUNK_TOKENS = [":!", "[[", "]]", "((", "::", "@@", "$x", "?", "%%", "[a?='v']"]


def test_unsupported_selectors_raise_valueerror() -> None:
    root = parse_html("<div><p class='alpha'>x</p></div>")
    for sel in CSS_UNSUPPORTED:
        with pytest.raises(ValueError):
            css_select(root, sel)
    for xp in XPATH_UNSUPPORTED:
        with pytest.raises(ValueError):
            xpath_select(root, xp)


def test_mutated_selectors_never_crash_nonvalueerror() -> None:
    """Valid selectors with random junk spliced in: every outcome must be
    either a clean result list or ValueError — no IndexError/KeyError/
    AttributeError escapes (those would be parser bugs), and no hang."""
    rng = random.Random(3000)
    root = gen_tree(rng)
    for it in range(300):
        base = (
            render_chain(gen_chain(rng))
            if it % 2 == 0
            else render_xpath(gen_xpath(rng))
        )
        pos = rng.randint(0, len(base))
        junk = rng.choice(JUNK_TOKENS)
        mutated = base[:pos] + junk + base[pos:]
        fn = css_select if it % 2 == 0 else xpath_select
        try:
            res = fn(root, mutated)
            assert isinstance(res, list)
        except ValueError:
            pass  # the documented rejection path
