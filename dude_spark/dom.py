"""Minimal HTML DOM + selector engine (pure stdlib).

This is the executor-side extraction kernel of the engine. The runtime image
has no lxml/bs4/cssselect, so we implement the selector surface the reference
engine exposes (CSS / XPath / text-contains / regex — see
``/root/reference/dude/rule.py:6-11`` and the per-backend ``_get_elements``
implementations, e.g. ``/root/reference/dude/optional/lxml_scraper.py:181-199``)
on top of ``html.parser``.

Semantics are pinned to the reference's lxml backend:

- CSS (and untyped ``selector=``) — evaluated with *descendant-or-self*
  scope relative to the context element (lxml's ``Element.cssselect``).
  Supported subset: tag, ``.class``, ``#id``, ``[attr]`` with operators
  ``= ~= ^= $= *= |=`` (plus the CSS4 ``[attr=v i]`` ASCII
  case-insensitive flag; ``s`` keeps the default), ``*``, ``:root``,
  structural pseudo-classes (``:first-child :last-child :only-child
  :empty :nth-child(an+b|odd|even) :nth-last-child :first-of-type
  :last-of-type :nth-of-type :nth-last-of-type :not(compound)``),
  ``:is(sel-list)``/``:where(sel-list)`` (any-of over complex selectors,
  matched document-wide per CSS4), ``:has(rel-sel)`` (relative selector
  with optional leading ``>``/``+``/``~`` combinator; descendant
  default), compound selectors, combinators (descendant, ``>``, ``+``,
  ``~`` — matched with backtracking, bounded to the context subtree),
  and selector groups (``,`` — split at top level only, so commas inside
  ``:is(...)``/``[...]`` nest correctly). Results in document order.
- XPath — subset: ``.//name``, ``//name``, ``./name``, ``*``/``node()``
  wildcards, ``..``, explicit axes (``following-sibling:: preceding-
  sibling:: parent:: self:: child:: descendant:: ancestor::
  ancestor-or-self::``), top-level ``|`` union (node-sets merge in
  document order, deduped), chained steps, predicates applied
  sequentially (positional predicates re-rank per parent after earlier
  filters, lxml parity) with nestable ``or``/``and``/``not()``/parens
  over atoms ``contains(@a,'s')``, ``contains(text(),'s')``,
  ``starts-with(@a|text(),'s')``, ``re:test(text(),pat[,flags])``,
  ``text()='v'``, ``@a='v'``, ``@a!='v'``, ``[@a]``,
  ``normalize-space(.|text()|@a)`` under ``=``/``!=``/``contains``/
  ``starts-with``, ``substring(.|text()|@a, start[, len]) = 'v'``
  (integer positions), ``name()``/``local-name()`` ``=``/``!=`` a string
  (HTML: both equal the tag), and numeric expressions over the position
  context
  (``position()``, ``last()``, ``count(relpath)``,
  ``string-length(.|text()|@a|normalize-space(...))``, integers,
  ``+ - * div mod``, parens, comparisons — XPath 1.0 double semantics,
  numeric predicate values positional per §2.4); plus trailing
  ``/@attr`` and ``/text()`` value steps.
- TEXT selector ``s`` — lxml translation ``.//*[contains(text(), s)]``
  (``lxml_scraper.py:186-188``): *first direct text node* contains ``s``
  (XPath 1.0 node-set→string takes the first node).
- REGEX selector — lxml translation ``.//*[re:test(text(), pat, 'i')]``
  (``lxml_scraper.py:189-193``): ``re.search`` on the first direct text
  node, case-insensitive.

The Element API mirrors the slice of lxml handlers use in the reference's
tests/examples: ``.tag``, ``.attrib``, ``.get(name)``, ``.text``,
``.text_content()``, iteration over children, and ``.cssselect/.xpath``.
"""

from __future__ import annotations

import re
from functools import lru_cache as _lru_cache
from html import unescape
from typing import Iterator, List, Optional, Tuple, Union

VOID_ELEMENTS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)

__all__ = ["Element", "parse_html", "css_select", "xpath_select", "select"]

_ATTR = re.compile(
    r"([^\s=/>]+)(?:\s*=\s*(?:\"([^\"]*)\"|'([^']*)'|([^\s>]*)))?"
)


def _parse_attrs(raw: str) -> dict:
    """Attribute string → dict, html.parser semantics: names lowercased,
    first occurrence wins, bare attrs ⇒ '', entity refs decoded."""
    d: dict = {}
    for m in _ATTR.finditer(raw):
        name = m.group(1).lower()
        if name in d:
            continue
        if m.group(2) is not None:
            v = m.group(2)
        elif m.group(3) is not None:
            v = m.group(3)
        elif m.group(4):
            v = m.group(4)
        else:
            v = ""
        if "&" in v:
            v = unescape(v)
        d[name] = v
    return d


class Element:
    """A DOM element node. Children are ``Element`` or ``str`` (text).

    Perf notes (this object is the hot allocation of the whole engine —
    one per tag across every crawled page):

    - attributes are parsed LAZILY from the raw tag slice on first
      ``.attrib`` access; the CSS matcher pre-filters on the raw string
      (substring test, C-level) so the dict is only built for plausible
      candidates — filler markup never pays attribute parsing;
    - every element carries the document's flat element array (``_nodes``,
      document order) plus its subtree extent (``order``..``end``), so
      scoped iteration is a LIST SLICE, not a recursive generator walk.
    """

    __slots__ = ("tag", "_raw_attrs", "_attrib", "parent", "children", "order", "end", "_nodes")

    def __init__(self, tag: str, raw_attrs: str, parent: Optional["Element"], order: int):
        self.tag = tag
        self._raw_attrs = raw_attrs
        self._attrib: Optional[dict] = None
        self.parent = parent
        self.children: List[Union[Element, str]] = []
        self.order = order
        self.end = order + 1
        self._nodes: List["Element"] = ()

    @property
    def attrib(self) -> dict:
        a = self._attrib
        if a is None:
            raw = self._raw_attrs
            a = self._attrib = _parse_attrs(raw) if raw else {}
        return a

    # -- lxml-flavoured accessors -------------------------------------------
    def get(self, name: str, default=None):
        return self.attrib.get(name, default)

    def __getitem__(self, key):
        """str key → attribute (bs4 ``element["href"]`` style, used by the
        reference's fixtures ``tests/test_bs4.py:41-43``); int/slice →
        child elements (lxml style)."""
        if isinstance(key, str):
            return self.attrib[key]
        elems = [c for c in self.children if isinstance(c, Element)]
        return elems[key]

    @property
    def text(self) -> Optional[str]:
        """First child node if it is text (lxml ``.text``)."""
        if self.children and isinstance(self.children[0], str):
            return self.children[0]
        return None

    def first_text(self) -> str:
        """First *direct* text child ('' if none) — XPath ``text()`` coercion."""
        for c in self.children:
            if isinstance(c, str):
                return c
        return ""

    def text_content(self) -> str:
        """All descendant text concatenated in document order (lxml)."""
        out: List[str] = []
        stack: List[Union[Element, str]] = [self]
        # iterative DFS preserving order
        def walk(node: "Element") -> None:
            for c in node.children:
                if isinstance(c, str):
                    out.append(c)
                else:
                    walk(c)

        walk(self)
        return "".join(out)

    # bs4-flavoured alias used in reference fixtures (tests/test_bs4.py:28-43)
    def get_text(self) -> str:
        return self.text_content()

    def iter(self) -> List["Element"]:
        """self + all descendant elements, document order (flat-array slice)."""
        return self._nodes[self.order : self.end]

    def iterdescendants(self) -> List["Element"]:
        return self._nodes[self.order + 1 : self.end]

    def cssselect(self, expr: str) -> List["Element"]:
        return css_select(self, expr)

    def xpath(self, expr: str):
        return xpath_select(self, expr)

    def classes(self) -> List[str]:
        return self.attrib.get("class", "").split()

    def __repr__(self) -> str:  # pragma: no cover
        return f"<Element {self.tag} @{self.order}>"


# One master token regex: the scan itself runs in C. Quoted attribute values
# may contain '>'.
_TOKEN = re.compile(
    r"<(?:"
    r"!--.*?(?:--\s*>|$)"                 # comment ('-- >' closes: html.parser)
    r"|!\[CDATA\[.*?(?:\]\s*\]\s*>|$)"    # CDATA (dropped, like a comment)
    r"|![^>]*>"                           # doctype / declaration
    r"|\?[^>]*>"                          # processing instruction
    # end tag: html.parser's endtagfind shape (optional leading space, name
    # charset [-.a-zA-Z0-9:_]) so '</ a >' closes <a> but '</x y>' does not
    r"|/\s*(?P<ctag>[a-zA-Z][-.a-zA-Z0-9:_]*)\s*>"
    # any other '</...>' is a bogus comment (HTML5 end-tag-open state;
    # html.parser emits handle_comment) — consumed through '>' and dropped
    r"|/[^>]*>"
    r"|(?P<tag>[a-zA-Z][^\s>/]*)"         # start tag name
    r"(?P<attrs>(?:\"[^\"]*\"|'[^']*'|[^>])*?)"
    r"(?P<selfc>/?)>"
    r")",
    re.DOTALL,
)
_RAWTEXT_END = {
    "script": re.compile(r"</script\s*>", re.IGNORECASE),
    "style": re.compile(r"</style\s*>", re.IGNORECASE),
}
# attrs slice ending inside an unquoted attribute value: the '/' the token
# regex captured as self-closing actually belongs to the value (HTML5
# unquoted-attribute-value state consumes '/'; html.parser agrees —
# '<a href=foo/>' is an OPEN anchor with href='foo/')
_UNQUOTED_VAL_END = re.compile(r"=\s*[^\s\"'>]*$")


def parse_html(html: Union[str, bytes]) -> Element:
    """Parse HTML and return the root *element* (e.g. ``<html>``).

    Falls back to the document node if there is no single root element,
    mirroring ``lxml.html.fromstring`` which returns the root element.

    Custom regex tokenizer instead of ``html.parser.HTMLParser``: ~3× less
    per-page CPU and far fewer allocations (attribute dicts are deferred —
    see :class:`Element`), which matters twice at scale: per-core throughput
    AND multi-core scaling, since HTML parsing is allocation/memory-bandwidth
    bound long before it is ALU bound.
    """
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", errors="replace")
    doc = Element("#document", "", None, 0)
    nodes: List[Element] = [doc]
    doc._nodes = nodes
    stack = [doc]
    pos = 0
    n = len(html)
    find = html.find
    match = _TOKEN.match
    while pos < n:
        lt = find("<", pos)
        if lt < 0:
            lt = n
        if lt > pos:
            text = html[pos:lt]
            if "&" in text:
                text = unescape(text)
            top_children = stack[-1].children
            if top_children and type(top_children[-1]) is str:
                top_children[-1] += text
            else:
                top_children.append(text)
            pos = lt
            if pos >= n:
                break
        m = match(html, lt)
        if m is None:
            # lone '<' — literal text (html.parser 'invalid markup' tolerance)
            top_children = stack[-1].children
            if top_children and type(top_children[-1]) is str:
                top_children[-1] += "<"
            else:
                top_children.append("<")
            pos = lt + 1
            continue
        pos = m.end()
        tag = m.group("tag")
        if tag is not None:
            if not tag.islower():
                tag = tag.lower()
            top = stack[-1]
            raw_attrs = m.group("attrs")
            selfc = m.group("selfc")
            if selfc and raw_attrs and _UNQUOTED_VAL_END.search(raw_attrs):
                raw_attrs += "/"  # fold the '/' back into the unquoted value
                selfc = ""
            el = Element(tag, raw_attrs, top, len(nodes))
            el._nodes = nodes
            nodes.append(el)
            top.children.append(el)
            if selfc or tag in VOID_ELEMENTS:
                pass  # end already = order + 1
            elif tag in _RAWTEXT_END:
                end_m = _RAWTEXT_END[tag].search(html, pos)
                if end_m is None:
                    if pos < n:
                        el.children.append(html[pos:])
                    pos = n
                else:
                    if end_m.start() > pos:
                        el.children.append(html[pos : end_m.start()])
                    pos = end_m.end()
            else:
                stack.append(el)
            continue
        ctag = m.group("ctag")
        if ctag is not None:
            if not ctag.islower():
                ctag = ctag.lower()
            if ctag in VOID_ELEMENTS:
                continue
            # close the nearest matching open tag (tolerant of mis-nesting)
            for i in range(len(stack) - 1, 0, -1):
                if stack[i].tag == ctag:
                    cnt = len(nodes)
                    for j in range(i, len(stack)):
                        stack[j].end = cnt
                    del stack[i:]
                    break
        # comments / doctype / PI: dropped

    cnt = len(nodes)
    for el in stack:
        el.end = cnt
    roots = [c for c in doc.children if isinstance(c, Element)]
    if len(roots) == 1:
        return roots[0]
    return doc


# ---------------------------------------------------------------------------
# CSS subset engine
# ---------------------------------------------------------------------------

_CSS_TOKEN = re.compile(
    r"""
    (?P<tag>\*|[a-zA-Z][\w-]*)
  | \.(?P<cls>[\w-]+)
  | \#(?P<id>[\w-]+)
  | \[(?P<attr>[\w-]+)(?:(?P<op>[~^$*|]?=)(?:"(?P<dval>[^"]*)"|'(?P<sval>[^']*)'|(?P<val>[^\]"'\s]*))(?:\s+(?P<aflag>[iIsS]))?)?\s*\]
  | :(?P<pseudo>[\w-]+)(?:\((?P<parg>[^()"']*)\))?  # quoted/nested args → balanced rescan
    """,
    re.VERBOSE,
)

_NTH = re.compile(r"^\s*(?:(?P<a>[+-]?\d*)n\s*(?P<b>[+-]\s*\d+)?|(?P<idx>[+-]?\d+))\s*$")


def _parse_nth(arg: str) -> Tuple[int, int]:
    """nth-child argument → (a, b) of an+b; supports odd/even/N/an+b."""
    arg = arg.strip().lower()
    if arg == "odd":
        return 2, 1
    if arg == "even":
        return 2, 0
    m = _NTH.match(arg)
    if not m:
        raise ValueError(f"unsupported :nth-child() argument: {arg!r}")
    if m.group("idx") is not None:
        return 0, int(m.group("idx"))
    a_s = m.group("a")
    a = 1 if a_s in ("", "+") else (-1 if a_s == "-" else int(a_s))
    b = int(m.group("b").replace(" ", "")) if m.group("b") else 0
    return a, b


def _parse_nth_pseudo(kind: str, arg: str) -> tuple:
    """``:nth-child()``/``:nth-last-child()`` argument → pseudo tuple.

    Plain ``An+B|odd|even`` → ``(kind, a, b)``; the CSS4
    ``An+B of <selector-list>`` form (index counted among siblings
    matching the list) → ``(kind, a, b, [chain, ...])``.
    """
    parts = _split_top(arg, "of")
    if len(parts) == 1:
        return (kind, *_parse_nth(arg))
    if len(parts) != 2:
        raise ValueError(f"unsupported :{kind}-child() argument: {arg!r}")
    a, b = _parse_nth(parts[0])
    chains = [_parse_css_chain(p) for p in _split_selector_list(parts[1])]
    return (kind, a, b, chains)


class _Compound:
    __slots__ = ("tag", "classes", "id", "attrs", "root", "pseudos")

    def __init__(self) -> None:
        self.tag: Optional[str] = None
        self.classes: List[str] = []
        self.id: Optional[str] = None
        # (name, op, val); op ∈ {'=', '~=', '^=', '$=', '*=', '|='}, val None
        # for bare [attr]
        self.attrs: List[Tuple[str, str, Optional[str]]] = []
        self.root = False
        # ('nth', a, b) | ('nth-type', a, b) | ('last',) | ('last-type',)
        # | ('only',) | ('empty',) | ('not', _Compound)
        self.pseudos: List[tuple] = []

    @staticmethod
    def _attr_op(av: str, op: str, val: str) -> bool:
        if op.endswith("i"):  # `[attr=v i]` flag: val pre-lowercased at parse
            av, op = av.lower(), op[:-1]
        if op == "=":
            return av == val
        if op == "~=":
            return val in av.split()
        if op == "|=":
            return av == val or av.startswith(val + "-")
        if not val:
            return False  # ^=/$=/*= with empty value match nothing (CSS spec)
        if op == "^=":
            return av.startswith(val)
        if op == "$=":
            return av.endswith(val)
        return val in av  # *=

    def _sibling_position(self, el: Element, of_type: bool) -> Tuple[int, int]:
        """(1-based index, count) among the parent's element children
        (optionally same-tag only)."""
        p = el.parent
        if p is None:
            return 1, 1
        sibs = [
            c for c in p.children
            if isinstance(c, Element) and (not of_type or c.tag == el.tag)
        ]
        return sibs.index(el) + 1, len(sibs)

    def _pseudo_match(self, el: Element) -> bool:
        for ps in self.pseudos:
            kind = ps[0]
            if kind in ("nth", "nth-type", "nth-last", "nth-last-type"):
                a, b = ps[1], ps[2]
                if len(ps) == 4:
                    # An+B `of S`: index among siblings matching the
                    # selector list (el itself must match S)
                    root = _doc_root(el)
                    chains = ps[3]

                    def _of(x: Element) -> bool:
                        return any(
                            _css_chain_matches(x, ch, root) for ch in chains
                        )

                    if not _of(el):
                        return False
                    p = el.parent
                    sibs = [
                        c
                        for c in (p.children if p is not None else [el])
                        if isinstance(c, Element) and _of(c)
                    ]
                    idx, n = sibs.index(el) + 1, len(sibs)
                else:
                    idx, n = self._sibling_position(el, kind.endswith("type"))
                if kind.startswith("nth-last"):
                    idx = n - idx + 1  # :nth-last-*: position from the end
                if a == 0:
                    if idx != b:
                        return False
                else:
                    d = idx - b
                    if d % a != 0 or d // a < 0:
                        return False
            elif kind in ("last", "last-type"):
                idx, n = self._sibling_position(el, kind == "last-type")
                if idx != n:
                    return False
            elif kind == "only":
                idx, n = self._sibling_position(el, False)
                if n != 1:
                    return False
            elif kind == "empty":
                for c in el.children:
                    if isinstance(c, Element) or (isinstance(c, str) and c):
                        return False
            elif kind == "lang":
                cur: Optional[Element] = el
                av = None
                while cur is not None:
                    v = cur.get("lang")
                    if v is not None:
                        av = v.lower()
                        break
                    cur = cur.parent
                if av is None or not any(
                    av == c or av.startswith(c + "-") for c in ps[1]
                ):
                    return False
            elif kind == "is":
                # :is(sel-list) / :where(): matches if ANY selector in the
                # list matches; complex selectors are matched against the
                # whole document (CSS4 — :is args are not scope-bounded)
                root = _doc_root(el)
                if not any(
                    _css_chain_matches(el, ch, root) for ch in ps[1]
                ):
                    return False
            elif kind == "has":
                full, marker, combin = ps[1]
                root = _doc_root(el)
                marker.target = el
                try:
                    if combin in (" ", ">"):
                        cands = (d for d in el.iter() if d is not el)
                    else:  # '+'/'~': following siblings' subtrees
                        cands = []
                        p = el.parent
                        if p is not None:
                            sibs = [
                                c for c in p.children if isinstance(c, Element)
                            ]
                            for s in sibs[sibs.index(el) + 1:]:
                                cands.extend(s.iter())
                    # the marker compound pins the relative selector's anchor
                    # to `el`; _css_chain_matches enforces the combinator
                    if not any(
                        _css_chain_matches(d, full, root) for d in cands
                    ):
                        return False
                finally:
                    marker.target = None
            else:  # ('not', compound)
                if ps[1].matches(el):
                    return False
        return True

    def matches(self, el: Element) -> bool:
        if self.tag is not None and self.tag != "*" and el.tag != self.tag:
            return False
        if self.root:
            # :root = element whose parent is the document node
            if el.parent is not None and el.parent.tag != "#document":
                return False
        if self.id is None and not self.classes and not self.attrs:
            return self._pseudo_match(el) if self.pseudos else True
        if el._attrib is None:
            # attrs not parsed yet: cheap substring pre-reject on the raw tag
            # slice (a matching id/class/attr name must appear literally in
            # it) — only plausible candidates pay the dict build below.
            # Skipped when the raw slice is entity-encoded ('&'): the decoded
            # value may match even though the encoded text doesn't. Attribute
            # NAMES are matched against the lowercased raw (the attrib dict
            # lowercases names, so '<p DATA-FOO>' must not be pre-rejected
            # for '[data-foo]'); id/class VALUES are case-sensitive, so the
            # original-case test is a valid necessary condition for them.
            raw = el._raw_attrs
            if "&" not in raw:
                if self.id is not None and self.id not in raw:
                    return False
                for c in self.classes:
                    if c not in raw:
                        return False
                if self.attrs:
                    raw_l = raw.lower()
                    for name, _op, _val in self.attrs:
                        if name not in raw_l:
                            return False
        attrib = el.attrib
        if self.id is not None and attrib.get("id") != self.id:
            return False
        if self.classes:
            cls = attrib.get("class", "").split()
            for c in self.classes:
                if c not in cls:
                    return False
        for name, op, val in self.attrs:
            if name not in attrib:
                return False
            if val is not None and not self._attr_op(attrib[name], op, val):
                return False
        if self.pseudos and not self._pseudo_match(el):
            return False
        return True


class _ScopeMarker:
    """Pseudo-compound matching only the :has() anchor element; ``target``
    is pinned per-candidate during evaluation (single-threaded per task)."""

    __slots__ = ("target",)

    def __init__(self) -> None:
        self.target: Optional[Element] = None

    def matches(self, el: Element) -> bool:
        return el is self.target


def _doc_root(el: Element) -> Element:
    while el.parent is not None:
        el = el.parent
    return el


def _split_selector_list(expr: str) -> List[str]:
    """Split a selector list on top-level commas only (commas inside
    ``()``/``[]`` — e.g. ``:is(a, b)`` — belong to the nested selector).
    Quote-aware: brackets/commas inside ``"..."``/``'...'`` (attribute
    values like ``[title="a]b"]``) don't affect nesting depth."""
    parts: List[str] = []
    depth = 0
    q: Optional[str] = None
    buf = ""
    for ch in expr:
        if q:
            if ch == q:
                q = None
        elif ch in "\"'":
            q = ch
        elif ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        if ch == "," and depth == 0 and q is None:
            parts.append(buf)
            buf = ""
        else:
            buf += ch
    parts.append(buf)
    out = [s.strip() for s in parts]
    if any(not p for p in out):
        raise ValueError(f"empty selector in list: {expr!r}")
    return out


def _parse_has_arg(arg: str):
    """Parse a :has() relative selector: optional leading combinator
    (``>``, ``+``, ``~``; default descendant) + complex selector. Returns
    (chain-with-scope-marker, marker, combinator)."""
    arg = arg.strip()
    combin = " "
    if arg and arg[0] in ">+~":
        combin = arg[0]
        arg = arg[1:].strip()
    chain = _parse_css_chain(arg)
    marker = _ScopeMarker()
    full = [(" ", marker), (combin, chain[0][1])] + chain[1:]
    return full, marker, combin


def _parse_compound(s: str) -> _Compound:
    comp = _Compound()
    pos = 0
    while pos < len(s):
        m = _CSS_TOKEN.match(s, pos)
        if not m:
            raise ValueError(f"unsupported CSS selector fragment: {s[pos:]!r}")
        next_pos = m.end()
        if m.group("tag"):
            # HTML element/attribute names are ASCII case-insensitive
            # (lxml's HTML translator lowercases them); id/class values
            # stay case-sensitive
            comp.tag = m.group("tag").lower()
        elif m.group("cls"):
            comp.classes.append(m.group("cls"))
        elif m.group("id"):
            if comp.id is None:
                comp.id = m.group("id")
            else:
                # a second #id in one compound is an AND (unsatisfiable
                # unless equal), not an overwrite — keep it as an attr test
                comp.attrs.append(("id", "=", m.group("id")))
        elif m.group("attr"):
            op = m.group("op") or "="
            if m.group("dval") is not None:
                val = m.group("dval")
            elif m.group("sval") is not None:
                val = m.group("sval")
            else:
                val = m.group("val")
            # `[attr="v" i]`: ASCII case-insensitive value match (CSS4);
            # `s` forces the case-sensitive default
            if (m.group("aflag") or "").lower() == "i" and val is not None:
                val = val.lower()
                op = op + "i"
            comp.attrs.append((m.group("attr").lower(), op, val))
        elif m.group("pseudo"):
            name = m.group("pseudo").lower()
            arg = m.group("parg")
            if arg is None and next_pos < len(s) and s[next_pos] == "(":
                # nested parens (e.g. :not(em:nth-child(2))): the token
                # regex's [^()]* arg can't span them — rescan balanced
                end = _balanced_arg(s, next_pos)
                arg = s[next_pos + 1 : end - 1]
                next_pos = end
            if name == "root":
                comp.root = True
            elif name == "first-child":
                comp.pseudos.append(("nth", 0, 1))
            elif name == "last-child":
                comp.pseudos.append(("last",))
            elif name == "only-child":
                comp.pseudos.append(("only",))
            elif name == "empty":
                comp.pseudos.append(("empty",))
            elif name == "first-of-type":
                comp.pseudos.append(("nth-type", 0, 1))
            elif name == "last-of-type":
                comp.pseudos.append(("last-type",))
            elif name == "nth-child" and arg is not None:
                comp.pseudos.append(_parse_nth_pseudo("nth", arg))
            elif name == "nth-of-type" and arg is not None:
                comp.pseudos.append(("nth-type", *_parse_nth(arg)))
            elif name == "nth-last-child" and arg is not None:
                comp.pseudos.append(_parse_nth_pseudo("nth-last", arg))
            elif name == "nth-last-of-type" and arg is not None:
                comp.pseudos.append(("nth-last-type", *_parse_nth(arg)))
            elif name == "not" and arg is not None:
                comp.pseudos.append(("not", _parse_compound(arg.strip())))
            elif name in ("is", "where") and arg is not None:
                comp.pseudos.append((
                    "is",
                    [_parse_css_chain(p) for p in _split_selector_list(arg)],
                ))
            elif name == "has" and arg is not None:
                comp.pseudos.append(("has", _parse_has_arg(arg)))
            elif name == "lang" and arg is not None:
                # :lang(en) / CSS4 comma list :lang(fr, es). Matches when
                # the element's inherited language (nearest ancestor-or-
                # self @lang) equals a code or is a hyphen-extension of it
                # (XPath lang() semantics, ASCII case-insensitive) — the
                # lxml.cssselect translation target.
                codes = [
                    c.strip().strip("\"'").lower()
                    for c in arg.split(",")
                    if c.strip().strip("\"'")
                ]
                if not codes:
                    raise ValueError(f"empty :lang() argument: {arg!r}")
                comp.pseudos.append(("lang", codes))
            else:
                raise ValueError(f"unsupported CSS pseudo-class: :{name}")
        pos = next_pos
    return comp


def _parse_css_chain(sel: str) -> List[Tuple[str, _Compound]]:
    """Parse one complex selector into [(combinator, compound), ...].

    combinator (the relation to the PREVIOUS compound): ' ' descendant,
    '>' child, '+' adjacent sibling, '~' general sibling; first entry's
    combinator is the 'self-or-descendant' scope marker.
    """
    parts: List[Tuple[str, _Compound]] = []
    buf = ""
    i = 0
    sel = sel.strip()
    combin = " "
    while i < len(sel):
        ch = sel[i]
        if ch == "[":
            # quote-aware ']' scan: [title="a]b"] must not cut at the
            # quoted bracket
            q: Optional[str] = None
            j = i + 1
            while j < len(sel):
                c = sel[j]
                if q:
                    if c == q:
                        q = None
                elif c in "\"'":
                    q = c
                elif c == "]":
                    break
                j += 1
            if j >= len(sel):
                raise ValueError(f"unbalanced '[' in CSS selector: {sel!r}")
            buf += sel[i : j + 1]
            i = j + 1
        elif ch == "(":
            # balanced quote-aware scan — :has(em:nth-child(2)) nests
            # parens, and [x=")"] hides one in a string
            j = _balanced_arg(sel, i)
            buf += sel[i:j]
            i = j
        elif ch in " >+~":
            if buf:
                parts.append((combin, _parse_compound(buf)))
                buf = ""
                combin = " "
            if ch in ">+~":
                combin = ch
            i += 1
        else:
            buf += ch
            i += 1
    if buf:
        parts.append((combin, _parse_compound(buf)))
    if not parts:
        raise ValueError(f"empty CSS selector: {sel!r}")
    if parts[0][0] != " ":  # leading combinator ('> x') unsupported
        raise ValueError(f"unsupported CSS selector start: {sel!r}")
    return parts


def _css_chain_matches(
    el: Element, chain: List[Tuple[str, _Compound]], scope: Element, idx: int = -1
) -> bool:
    """Match ``el`` against ``chain[..idx]`` rightmost-first with
    backtracking (needed for mixed sibling/descendant chains like
    ``a + b c``), bounded to the ``scope`` subtree (lxml cssselect
    translates 'div p' on an element to descendant-or-self steps, so every
    compound must land on scope-or-descendant)."""
    if idx < 0:
        idx = len(chain) - 1
    if not chain[idx][1].matches(el):
        return False
    if idx == 0:
        return True
    combin = chain[idx][0]
    if combin == ">":
        p = el.parent
        return (
            p is not None
            and p.order >= scope.order
            and _css_chain_matches(p, chain, scope, idx - 1)
        )
    if combin in "+~":
        if el is scope or el.parent is None:
            return False
        sibs = [c for c in el.parent.children if isinstance(c, Element)]
        i = sibs.index(el)
        if combin == "+":
            return i > 0 and _css_chain_matches(sibs[i - 1], chain, scope, idx - 1)
        return any(_css_chain_matches(s, chain, scope, idx - 1) for s in sibs[:i])
    anc = el.parent
    while anc is not None and anc.order >= scope.order:
        if _css_chain_matches(anc, chain, scope, idx - 1):
            return True
        anc = anc.parent
    return False


def css_select(scope: Element, expr: str) -> List[Element]:
    """All elements under ``scope`` (self included — lxml descendant-or-self
    translation) matching ``expr``, in document order."""
    chains = [_parse_css_chain(s) for s in _split_selector_list(expr)]
    out: List[Element] = []
    for el in scope.iter():
        for chain in chains:
            if _css_chain_matches(el, chain, scope):
                out.append(el)
                break
    return out


# ---------------------------------------------------------------------------
# XPath subset engine
# ---------------------------------------------------------------------------

_XP_PRED = re.compile(
    r"""^\s*(?:
      contains\(\s*@(?P<cattr>[\w-]+)\s*,\s*(?P<q1>["'])(?P<cval>.*?)(?P=q1)\s*\)
    | contains\(\s*text\(\)\s*,\s*(?P<q2>["'])(?P<tval>.*?)(?P=q2)\s*\)
    | starts-with\(\s*@(?P<sattr>[\w-]+)\s*,\s*(?P<q6>["'])(?P<sval>.*?)(?P=q6)\s*\)
    | starts-with\(\s*text\(\)\s*,\s*(?P<q7>["'])(?P<stval>.*?)(?P=q7)\s*\)
    | re:test\(\s*text\(\)\s*,\s*(?P<q3>["'])(?P<rpat>.*?)(?P=q3)\s*(?:,\s*(?P<q4>["'])(?P<rflags>.*?)(?P=q4)\s*)?\)
    | text\(\)\s*=\s*(?P<q8>["'])(?P<teq>.*?)(?P=q8)
    | @(?P<eattr>[\w-]+)\s*(?P<neq>!)?=\s*(?P<q5>["'])(?P<eval>.*?)(?P=q5)
    | (?P<nsfn>contains|starts-with)\(\s*normalize-space\(\s*(?P<nsarg1>\.|text\(\)|@[\w-]+)?\s*\)\s*,\s*(?P<q9>["'])(?P<nsv1>.*?)(?P=q9)\s*\)
    | normalize-space\(\s*(?P<nsarg2>\.|text\(\)|@[\w-]+)?\s*\)\s*(?P<nsneq>!)?=\s*(?P<q10>["'])(?P<nsv2>.*?)(?P=q10)
    | (?P<namefn>name|local-name)\(\s*\)\s*(?P<namneq>!)?=\s*(?P<q11>["'])(?P<namval>.*?)(?P=q11)
    | @(?P<xattr>[\w-]+)
    | position\(\)\s*(?P<pcmp><=|>=|<|>|=)\s*(?P<pval>\d+)
    | (?P<last>last\(\))
    | (?P<pos>\d+)
    )\s*$""",
    re.VERBOSE,
)


def _split_top(s: str, word: str) -> List[str]:
    """Split ``s`` on the keyword ``word`` (e.g. 'or'/'and') at top level —
    outside quotes, parens, and brackets; the keyword must be
    whitespace-delimited."""
    out: List[str] = []
    depth = 0
    q: Optional[str] = None
    i = last = 0
    L = len(s)
    wl = len(word)
    while i < L:
        c = s[i]
        if q:
            if c == q:
                q = None
        elif c in "\"'":
            q = c
        elif c in "([":
            depth += 1
        elif c in ")]":
            depth -= 1
        elif (
            depth == 0
            and s.startswith(word, i)
            and i > 0
            and s[i - 1].isspace()
            and i + wl < L
            and s[i + wl].isspace()
        ):
            out.append(s[last:i])
            i += wl
            last = i
            continue
        i += 1
    out.append(s[last:])
    return out


class _Step:
    __slots__ = ("axis", "name", "preds")

    def __init__(self, axis: str, name: str, preds: List[str]):
        self.axis = axis  # 'child' | 'descendant'
        self.name = name  # tag name | '*' | '@attr' | 'text()'
        self.preds = preds


def _parse_xpath(expr: str) -> List[_Step]:
    """Parse + VALIDATE one XPath location path. Predicates are grammar-
    checked here, at parse time — an off-grammar predicate raises even when
    no candidate node ever reaches it (lazy-only rejection would let a
    typo'd selector silently return [] on pages where the step tag doesn't
    occur). Cached: see :func:`_parsed_xpath`."""
    s = expr.strip()
    if s.startswith("."):
        s = s[1:]
    steps: List[_Step] = []
    i = 0
    while i < len(s):
        if s.startswith("//", i):
            axis = "descendant"
            i += 2
        elif s.startswith("/", i):
            axis = "child"
            i += 1
        else:
            raise ValueError(f"unsupported XPath (expected / or //): {expr!r}")
        # read node test
        j = i
        while j < len(s) and s[j] not in "/[":
            j += 1
        name = s[i:j].strip()
        if not name:
            raise ValueError(f"unsupported XPath step in {expr!r}")
        i = j
        preds: List[str] = []
        while i < len(s) and s[i] == "[":
            depth = 1
            k = i + 1
            while k < len(s) and depth:
                if s[k] == "[":
                    depth += 1
                elif s[k] == "]":
                    depth -= 1
                k += 1
            preds.append(s[i + 1 : k - 1])
            i = k
        for p in preds:
            _validate_pred(p)
        steps.append(_Step(axis, name, preds))
    if not steps:
        raise ValueError(f"empty XPath: {expr!r}")
    return steps


@_lru_cache(maxsize=2048)
def _parse_xpath_cached(expr: str) -> List[_Step]:
    """LRU-cached parse: the extraction kernel re-evaluates the same rule
    selectors on every page, so parse+validate cost is paid once per
    distinct expression. _Step lists are read-only after construction."""
    return _parse_xpath(expr)


def _validate_pred(pred: str) -> None:
    """Grammar check of one predicate (same decomposition as _pred_eval:
    or → and → parens/not → atom); raises ValueError on off-grammar."""
    ors = _split_top(pred, "or")
    if len(ors) > 1:
        for p in ors:
            _validate_pred(p)
        return
    ands = _split_top(pred, "and")
    if len(ands) > 1:
        for p in ands:
            _validate_pred(p)
        return
    atom = pred.strip()
    if atom.startswith("(") and atom.endswith(")"):
        return _validate_pred(atom[1:-1])
    if atom.startswith("not(") and atom.endswith(")"):
        return _validate_pred(atom[4:-1])
    if _XP_PRED.match(atom) or _XP_SUBSTR.match(atom) or _strcmp_match(atom):
        return
    if _numeric_valid(atom):
        return
    if _path_pred_ok(atom):
        return
    if _generic_str_pred(None, atom, 1, 1, validate=True):
        return
    raise ValueError(f"unsupported XPath predicate: {atom!r}")


# strict node-test for location-path predicates: (axis::)?(name|*|..|
# text()|@attr). The main step tokenizer reads names loosely; existence
# predicates validate each step against THIS so off-grammar atoms still
# raise loudly instead of silently becoming empty-node-set → False.
_XP_NODETEST = re.compile(
    r"^(?:[\w-]+::)?(?:[\w-]+|\*|\.\.|text\(\)|@[\w-]+)$"
)


def _path_pred_ok(atom: str) -> bool:
    """True iff ``atom`` is a location-path existence predicate (XPath 1.0
    boolean conversion of a node-set): ``[p]``, ``[a/p[@class='x']]``,
    ``[.//div]``, ``[//p]`` (absolute), ``[following-sibling::div]``,
    ``[a | b]``. Validation = full parse of each union branch (nested
    predicates recurse) + strict node-test check per step."""
    p = atom.strip()
    if not p or p.startswith("@"):
        return False  # bare @attr is _XP_PRED's; '@a=...' isn't a path
    try:
        for br in _split_union(p):
            b = br.strip()
            if not b:
                return False
            b = b if b.startswith((".", "/")) else "./" + b
            for step in _parse_xpath(b):
                if not _XP_NODETEST.match(step.name):
                    return False
        return True
    except ValueError:
        return False


def _path_pred_eval(el: Element, atom: str) -> bool:
    """Evaluate a location-path existence predicate: non-empty node-set →
    True. Leading ``//`` is ABSOLUTE (from the document root) per XPath
    1.0; relative forms evaluate from the context node."""
    truth = False
    for br in _split_union(atom.strip()):
        b = br.strip()
        if b.startswith("/"):
            base = _doc_root(el)
            res = xpath_select(base, "." + b)
        else:
            res = xpath_select(el, b if b.startswith(".") else "./" + b)
        if res:
            truth = True
    return truth


def _numeric_valid(pred: str) -> bool:
    parts = _NUM_CMP.split(pred, maxsplit=1)
    exprs = [parts[0], parts[2]] if len(parts) == 3 else [pred]
    return all(
        _num_of(e, 1, 1, el=None, validate=True) is not None for e in exprs
    )


def _pred_eval(el: Element, pred: str, position: int, total: int) -> bool:
    """XPath predicate: top-level ``or`` → any, then ``and`` → all, then
    atoms (``not(...)`` recurses)."""
    ors = _split_top(pred, "or")
    if len(ors) > 1:
        return any(_pred_eval(el, p, position, total) for p in ors)
    ands = _split_top(pred, "and")
    if len(ands) > 1:
        return all(_pred_eval(el, p, position, total) for p in ands)
    atom = pred.strip()
    if atom.startswith("(") and atom.endswith(")"):
        return _pred_eval(el, atom[1:-1], position, total)
    if atom.startswith("not(") and atom.endswith(")"):
        return not _pred_eval(el, atom[4:-1], position, total)
    return _pred_atom(el, atom, position, total)


def _balanced_arg(s: str, start: int) -> int:
    """Index just past the ')' closing the paren at ``start`` (quote-aware)."""
    depth = 0
    q: Optional[str] = None
    for i in range(start, len(s)):
        c = s[i]
        if q:
            if c == q:
                q = None
        elif c in "\"'":
            q = c
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                return i + 1
    raise ValueError(f"unbalanced parens in {s!r}")


def _rel_nodes(el: "Element", path: str) -> List:
    """Node-set of a RELATIVE location path from ``el`` (the argument form
    of ``count()``): bare steps (``a``, ``p[...]``, ``*``, explicit axes,
    ``@attr``, ``text()``) are child-axis per XPath 1.0; ``.//``/``./``//
    ``//`` forms pass through to :func:`xpath_select` unchanged."""
    p = path.strip()
    if not p.startswith((".", "/")):
        p = "./" + p
    return xpath_select(el, p)


class _NumParse:
    """XPath 1.0 numeric expressions over the position context:
    integers, ``position()``, ``last()``, ``count(path)``,
    ``string-length(arg)``, ``+ - * div mod``, parens."""

    _TOK = re.compile(
        r"\s*(?:(?P<num>\d+)|(?P<pos>position\(\))|(?P<lst>last\(\))"
        r"|(?P<cnt>count\()|(?P<slen>string-length\()|(?P<numf>number\()"
        r"|(?P<op>div|mod|[+\-*()]))"
    )

    def __init__(self, s: str, position: int, total: int,
                 el: Optional["Element"] = None, validate: bool = False):
        self.toks: List = []
        i = 0
        while i < len(s):
            m = self._TOK.match(s, i)
            if not m:
                if s[i:].strip():
                    raise ValueError(s)
                break
            if m.group("cnt") or m.group("slen") or m.group("numf"):
                op = m.end() - 1  # index of the '(' consumed by the token
                end = _balanced_arg(s, op)
                arg = s[op + 1 : end - 1]
                if validate:
                    # syntax-only: check the argument grammar, value := 1
                    if m.group("cnt"):
                        p = arg.strip()
                        _parse_xpath(p if p.startswith((".", "/")) else "./" + p)
                    elif m.group("numf"):
                        # number(X): string-expression OR location path
                        # (number(node-set) = number(string(node-set)));
                        # strict node-test so number(frob()) raises instead
                        # of silently evaluating an empty node-set to NaN
                        if not _valid_strarg(arg) and not _path_pred_ok(arg):
                            raise ValueError(s)
                    elif not _valid_strarg(arg):
                        raise ValueError(s)
                    self.toks.append(1)
                elif el is None:
                    raise ValueError(s)
                elif m.group("cnt"):
                    self.toks.append(len(_rel_nodes(el, arg)))
                elif m.group("numf"):
                    self.toks.append(_xpath_number_of(el, arg))
                else:
                    self.toks.append(len(_string_value_of(el, arg)))
                i = end
                continue
            i = m.end()
            if m.group("num"):
                self.toks.append(int(m.group("num")))
            elif m.group("pos"):
                self.toks.append(position)
            elif m.group("lst"):
                self.toks.append(total)
            else:
                self.toks.append(m.group("op"))
        self.i = 0

    def _peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else None

    def expr(self) -> float:
        v = self.term()
        while self._peek() in ("+", "-"):
            op = self.toks[self.i]
            self.i += 1
            w = self.term()
            v = v + w if op == "+" else v - w
        return v

    def term(self) -> float:
        v = self.factor()
        while self._peek() in ("*", "div", "mod"):
            op = self.toks[self.i]
            self.i += 1
            w = self.factor()
            # XPath 1.0 numbers are doubles: `div` is TRUE division
            # (`last() div 2` = 2.5, which as a positional predicate
            # matches nothing — lxml parity); `mod` keeps the sign of the
            # dividend (math.fmod), unlike Python's `%`
            if op == "*":
                v = v * w
            elif op == "div":
                v = v / w
            else:
                import math

                v = math.fmod(v, w)
        return v

    def factor(self) -> float:
        t = self._peek()
        if t == "(":
            self.i += 1
            v = self.expr()
            if self._peek() != ")":
                raise ValueError("unbalanced paren")
            self.i += 1
            return v
        if isinstance(t, (int, float)):
            self.i += 1
            return t
        raise ValueError(f"bad numeric token: {t!r}")


# XPath 1.0 literals have NO escape mechanism: a '...' literal cannot
# contain ', so [^'] / [^"] is the exact grammar (and keeps "'a' = 'b'"
# from matching as ONE literal with an interior quote).
_STR_LIT = re.compile(r"""^(?:'(?P<v1>[^']*)'|"(?P<v2>[^"]*)")$""")
_FN_CALL = re.compile(r"^([\w-]+)\(")
_ATTR_REF = re.compile(r"^@[\w-]+$")


def _fn_call(a: str) -> Optional[Tuple[str, str]]:
    """``(name, inner)`` iff ``a`` is exactly one ``name( ... )`` call whose
    closing paren is the LAST character (quote-aware balance), else None."""
    m = _FN_CALL.match(a)
    if not m:
        return None
    try:
        end = _balanced_arg(a, m.end() - 1)
    except ValueError:
        return None
    if end != len(a):
        return None
    return m.group(1), a[m.end() : end - 1]


def _split_args(s: str) -> List[str]:
    """Split a function-argument list on top-level commas (outside quotes,
    parens, and brackets)."""
    out: List[str] = []
    depth = 0
    q: Optional[str] = None
    last = 0
    for i, c in enumerate(s):
        if q:
            if c == q:
                q = None
        elif c in "\"'":
            q = c
        elif c in "([":
            depth += 1
        elif c in ")]":
            depth -= 1
        elif c == "," and depth == 0:
            out.append(s[last:i])
            last = i + 1
    out.append(s[last:])
    return out


def _str_of(el: Optional[Element], a: str, validate: bool = False) -> str:
    """Recursive XPath 1.0 string-expression evaluator (the argument
    grammar of contains/starts-with/string-length/= comparisons):

    literal | '' | '.' | text() | @attr | normalize-space(X?) |
    string(X | relative-path) | concat(X, X, ...) | translate(X, X, X) |
    substring-before(X, X) | substring-after(X, X) | substring(X, int[, int])

    ``validate=True`` grammar-checks without an element (node-valued leaves
    yield ''). Raises ValueError on off-grammar input either way — parse
    time and eval time reject identically, so a typo'd selector can never
    silently become an empty match (same contract as _validate_pred)."""
    a = a.strip()
    m = _STR_LIT.match(a)
    if m:
        v1 = m.group("v1")
        return v1 if v1 is not None else m.group("v2")
    if a in ("", "."):
        return "" if validate else el.text_content()
    if a == "text()":
        return "" if validate else el.first_text()
    if _ATTR_REF.match(a):
        return "" if validate else (el.attrib.get(a[1:]) or "")
    fc = _fn_call(a)
    if fc is None:
        raise ValueError(f"unsupported string argument: {a!r}")
    fn, inner = fc
    if fn == "normalize-space":
        return " ".join(_str_of(el, inner, validate).split())
    if fn == "string":
        try:
            return _str_of(el, inner, validate)
        except ValueError:
            pass
        # node-set → string value of the FIRST node in document order
        # ('' when empty) — XPath 1.0 §4.2 string() conversion. Strict
        # node-test per step so string(frob()) raises instead of silently
        # becoming an empty node-set → ''.
        p = inner.strip()
        for step in _parse_xpath(p if p.startswith((".", "/")) else "./" + p):
            if not _XP_NODETEST.match(step.name):
                raise ValueError(f"unsupported string argument: {a!r}")
        if validate:
            return ""
        nodes = _rel_nodes(el, inner)
        if not nodes:
            return ""
        first = nodes[0]
        return first.text_content() if isinstance(first, Element) else str(first)
    if fn == "concat":
        args = _split_args(inner)
        if len(args) < 2:
            raise ValueError(f"concat() needs >=2 arguments: {a!r}")
        return "".join(_str_of(el, x, validate) for x in args)
    if fn == "translate":
        args = _split_args(inner)
        if len(args) != 3:
            raise ValueError(f"translate() needs 3 arguments: {a!r}")
        s, frm, to = (_str_of(el, x, validate) for x in args)
        out = []
        for ch in s:
            j = frm.find(ch)  # first occurrence wins (XPath 1.0 §4.2)
            if j < 0:
                out.append(ch)
            elif j < len(to):
                out.append(to[j])
            # else: char is deleted
        return "".join(out)
    if fn in ("substring-before", "substring-after"):
        args = _split_args(inner)
        if len(args) != 2:
            raise ValueError(f"{fn}() needs 2 arguments: {a!r}")
        s = _str_of(el, args[0], validate)
        t = _str_of(el, args[1], validate)
        if t == "":
            # '' occurs at position 0: nothing precedes it, everything
            # follows it (libxml2 parity)
            return "" if fn == "substring-before" else s
        pre, sep, post = s.partition(t)
        if not sep:
            return ""
        return pre if fn == "substring-before" else post
    if fn == "substring":
        args = _split_args(inner)
        if len(args) not in (2, 3):
            raise ValueError(f"substring() needs 2-3 arguments: {a!r}")
        s = _str_of(el, args[0], validate)
        try:
            start = int(args[1])
            length = int(args[2]) if len(args) == 3 else None
        except ValueError:
            raise ValueError(
                f"substring() positions must be integers: {a!r}"
            ) from None
        return _xpath_substring(s, start, length)
    raise ValueError(f"unsupported string argument: {a!r}")


def _valid_strarg(a: str) -> bool:
    """Grammar check of one string-expression (see :func:`_str_of`)."""
    try:
        _str_of(None, a, validate=True)
        return True
    except ValueError:
        return False


_XP_NUM_LEXEME = re.compile(r"-?(\d+(\.\d*)?|\.\d+)")


def _xpath_number_of(el: Element, arg: str) -> float:
    """XPath 1.0 number(): trimmed string that is a numeric lexeme → its
    IEEE double, anything else → NaN; number(node-set) converts through
    string() (first node's string value)."""
    try:
        s = _str_of(el, arg)
    except ValueError:
        s = _str_of(el, f"string({arg})")
    t = s.strip()
    return float(t) if _XP_NUM_LEXEME.fullmatch(t) else float("nan")


def _num_of(
    s: str, position: int, total: int, el: Optional["Element"] = None,
    validate: bool = False,
) -> Optional[float]:
    try:
        p = _NumParse(s, position, total, el, validate)
        v = p.expr()
        return v if p.i == len(p.toks) and p.toks else None
    except (ValueError, ZeroDivisionError, IndexError):
        return None


_NUM_CMP = re.compile(r"(!=|<=|>=|=|<|>)")


def _numeric_pred(
    pred: str, position: int, total: int, el: Optional["Element"] = None
) -> Optional[bool]:
    """Arithmetic predicate: ``last() - 1``, ``position() mod 2 = 1``,
    ``count(.//a) >= 2``, ``string-length(@href) > 10`` ... Returns None
    if not numeric."""
    parts = _NUM_CMP.split(pred, maxsplit=1)
    if len(parts) == 3:
        lhs, cmp_op, rhs = parts
        lv = _num_of(lhs, position, total, el)
        rv = _num_of(rhs, position, total, el)
        if lv is None or rv is None:
            return None
        return {
            "=": lv == rv, "!=": lv != rv, "<": lv < rv, ">": lv > rv,
            "<=": lv <= rv, ">=": lv >= rv,
        }[cmp_op]
    v = _num_of(pred, position, total, el)
    # XPath 1.0 §2.4: ANY numeric predicate value is positional —
    # [count(p)] ≡ [position() = count(p)] (lxml parity)
    return None if v is None else position == v


_XP_SUBSTR = re.compile(
    r"""^\s*substring\(\s*(?P<arg>\.|text\(\)|@[\w-]+)\s*,
    \s*(?P<start>-?\d+)\s*(?:,\s*(?P<len>-?\d+)\s*)?\)
    \s*(?P<neq>!)?=\s*(?P<q>["'])(?P<val>.*?)(?P=q)\s*$""",
    re.VERBOSE,
)

# string(...) in comparison position: string(X) = 'v', contains(string(X),
# 'v'), starts-with(string(X), 'v') — X validated via _valid_strarg (which
# accepts '', '.', text(), @attr, normalize-space(...), nested string(...),
# or a relative location path whose FIRST node's string value is taken).
_XP_STRCMP = re.compile(
    r"""^\s*(?:
      (?P<fn>contains|starts-with)\(\s*(?P<farg>string\(.*\))\s*,\s*(?P<q1>["'])(?P<fval>.*?)(?P=q1)\s*\)
    | (?P<earg>string\(.*\))\s*(?P<neq>!)?=\s*(?P<q2>["'])(?P<eval>.*?)(?P=q2)
    )\s*$""",
    re.VERBOSE,
)


def _strcmp_match(atom: str):
    """``_XP_STRCMP`` match with the string() argument grammar-checked;
    None when the atom is not a (valid) string()-comparison."""
    m = _XP_STRCMP.match(atom)
    if m and _valid_strarg(m.group("farg") or m.group("earg")):
        return m
    return None


def _string_value_of(el: Element, arg: str) -> str:
    """String value of a predicate-function argument — full recursive
    string-expression grammar; see :func:`_str_of`."""
    return _str_of(el, arg)


def _split_eq(s: str) -> Tuple[str, Optional[str], str]:
    """Split on the first top-level ``=`` / ``!=`` (outside quotes, parens,
    brackets); ``<=`` / ``>=`` are NOT equality and yield (s, None, '')."""
    depth = 0
    q: Optional[str] = None
    for i, c in enumerate(s):
        if q:
            if c == q:
                q = None
        elif c in "\"'":
            q = c
        elif c in "([":
            depth += 1
        elif c in ")]":
            depth -= 1
        elif c == "=" and depth == 0:
            if i > 0 and s[i - 1] == "!":
                return s[: i - 1], "!=", s[i + 1 :]
            if i > 0 and s[i - 1] in "<>":
                return s, None, ""
            return s[:i], "=", s[i + 1 :]
    return s, None, ""


def _generic_str_pred(
    el: Optional[Element], atom: str, position: int, total: int,
    validate: bool = False,
) -> Optional[bool]:
    """Generalized string-expression predicate — the grammar tail the
    fixed-shape regexes (_XP_PRED/_XP_STRCMP) don't reach:

    - ``contains(X, Y)`` / ``starts-with(X, Y)`` with ARBITRARY
      string-expressions on both sides (the common class-match idiom
      ``contains(concat(' ', @class, ' '), ' x ')``)
    - ``X = Y`` / ``X != Y`` over string-expressions (``translate(@c,
      'ABC', 'abc') = 'x'``)
    - ``boolean(X)``: node-set form (``@attr`` presence, location path)
      checked BEFORE the string form — boolean(@a) is true for a PRESENT
      but empty attribute, where string conversion would say false

    Returns None when ``atom`` is not of this shape or off-grammar (the
    caller raises its own error); ``validate=True`` grammar-checks only.
    """
    try:
        fc = _fn_call(atom.strip())
        if fc and fc[0] in ("contains", "starts-with"):
            args = _split_args(fc[1])
            if len(args) != 2:
                return None
            x = _str_of(el, args[0], validate)
            y = _str_of(el, args[1], validate)
            if validate:
                return True
            return (y in x) if fc[0] == "contains" else x.startswith(y)
        if fc and fc[0] == "boolean":
            inner = fc[1].strip()
            if _ATTR_REF.match(inner):
                return True if validate else inner[1:] in el.attrib
            if _path_pred_ok(inner):
                return True if validate else _path_pred_eval(el, inner)
            v = _num_of(inner, position, total, el, validate)
            if v is not None:
                import math

                return True if validate else (v != 0 and not math.isnan(v))
            s = _str_of(el, inner, validate)
            return True if validate else s != ""
        lhs, op, rhs = _split_eq(atom)
        if op is not None:
            # a bare @attr side is a NODE-SET: comparison is existential
            # (XPath 1.0 §3.4) — a missing attribute makes BOTH = and !=
            # false, unlike string coercion which would compare against ''
            ln = _ATTR_REF.match(lhs.strip()) is not None
            rn = _ATTR_REF.match(rhs.strip()) is not None
            x = _str_of(el, lhs, validate)
            y = _str_of(el, rhs, validate)
            if validate:
                return True
            if ln and lhs.strip()[1:] not in el.attrib:
                return False
            if rn and rhs.strip()[1:] not in el.attrib:
                return False
            return (x == y) if op == "=" else (x != y)
    except ValueError:
        return None
    return None


def _xpath_substring(s: str, start: int, length: Optional[int]) -> str:
    """XPath 1.0 substring(): 1-based start; out-of-range clamps (integer
    subset — fractional positions would need the round-half-up dance)."""
    begin = max(start - 1, 0)
    if length is None:
        return s[begin:]
    end = start - 1 + length  # exclusive, in 0-based coords
    return s[begin:end] if end > begin else ""


def _pred_atom(el: Element, pred: str, position: int, total: int) -> bool:
    m = _XP_PRED.match(pred)
    if not m:
        ms = _XP_SUBSTR.match(pred)
        if ms:
            v = _xpath_substring(
                _string_value_of(el, ms.group("arg")),
                int(ms.group("start")),
                int(ms.group("len")) if ms.group("len") is not None else None,
            )
            eq = v == ms.group("val")
            return not eq if ms.group("neq") else eq
        mc = _strcmp_match(pred)
        if mc:
            v = _string_value_of(el, mc.group("farg") or mc.group("earg"))
            if mc.group("fn") == "contains":
                return mc.group("fval") in v
            if mc.group("fn") == "starts-with":
                return v.startswith(mc.group("fval"))
            eq = v == mc.group("eval")
            return not eq if mc.group("neq") else eq
        r = _numeric_pred(pred, position, total, el)
        if r is not None:
            return r
        if _path_pred_ok(pred):
            return _path_pred_eval(el, pred)
        g = _generic_str_pred(el, pred, position, total)
        if g is not None:
            return g
        raise ValueError(f"unsupported XPath predicate: {pred!r}")
    if m.group("cattr"):
        return m.group("cval") in (el.attrib.get(m.group("cattr")) or "")
    if m.group("tval") is not None:
        return m.group("tval") in el.first_text()
    if m.group("sattr"):
        return (el.attrib.get(m.group("sattr")) or "").startswith(m.group("sval"))
    if m.group("stval") is not None:
        return el.first_text().startswith(m.group("stval"))
    if m.group("rpat") is not None:
        flags = re.IGNORECASE if "i" in (m.group("rflags") or "") else 0
        return re.search(m.group("rpat"), el.first_text(), flags) is not None
    if m.group("teq") is not None:
        return el.first_text() == m.group("teq")
    if m.group("eattr"):
        # bare @attr is a NODE-SET: comparison is existential (XPath 1.0
        # §3.4, lxml parity) — a MISSING attribute makes both = and !=
        # false. string(@attr) = 'v' is the coercion form (missing → '').
        v = el.attrib.get(m.group("eattr"))
        if v is None:
            return False
        return (v != m.group("eval")) if m.group("neq") else (v == m.group("eval"))
    if m.group("nsfn"):
        v = _normalize_space_of(el, m.group("nsarg1"))
        if m.group("nsfn") == "contains":
            return m.group("nsv1") in v
        return v.startswith(m.group("nsv1"))
    if m.group("nsv2") is not None:
        eq = _normalize_space_of(el, m.group("nsarg2")) == m.group("nsv2")
        return not eq if m.group("nsneq") else eq
    if m.group("namefn"):
        # HTML has no namespaces: name() == local-name() == the tag
        eq = el.tag == m.group("namval")
        return not eq if m.group("namneq") else eq
    if m.group("xattr"):
        return m.group("xattr") in el.attrib
    if m.group("pcmp"):
        v = int(m.group("pval"))
        return {
            "=": position == v, "<": position < v, ">": position > v,
            "<=": position <= v, ">=": position >= v,
        }[m.group("pcmp")]
    if m.group("last"):
        return position == total
    if m.group("pos"):
        return position == int(m.group("pos"))
    return False  # pragma: no cover


def _normalize_space_of(el: Element, arg: Optional[str]) -> str:
    """XPath normalize-space(): strip + collapse runs of whitespace.

    Argument subset: '' / '.' (string value of the context node = full text
    content), 'text()' (first text node — consistent with the text()
    atoms above), '@attr'.
    """
    if arg in (None, "", "."):
        s = el.text_content()
    elif arg == "text()":
        s = el.first_text()
    else:  # '@attr'
        s = el.attrib.get(arg[1:]) or ""
    return " ".join(s.split())


def _split_union(s: str) -> List[str]:
    """Split on top-level '|' (outside quotes/parens/brackets)."""
    out: List[str] = []
    depth = 0
    q: Optional[str] = None
    last = 0
    for i, c in enumerate(s):
        if q:
            if c == q:
                q = None
        elif c in "\"'":
            q = c
        elif c in "([":
            depth += 1
        elif c in ")]":
            depth -= 1
        elif c == "|" and depth == 0:
            out.append(s[last:i])
            last = i + 1
    out.append(s[last:])
    return out


def _elem_siblings(el: Element) -> List[Element]:
    if el.parent is None:
        return [el]
    return [c for c in el.parent.children if isinstance(c, Element)]


def xpath_select(scope: Element, expr: str):
    """Evaluate the XPath subset; returns elements, attribute strings, or
    text strings depending on the final step."""
    union = _split_union(expr)
    if len(union) > 1:
        results = [xpath_select(scope, part) for part in union]
        if all(isinstance(x, Element) for r in results for x in r):
            # node-set union: document order, deduped (XPath 1.0 '|')
            seen: set = set()
            merged: List[Element] = []
            for el in sorted(
                (e for r in results for e in r), key=lambda e: e.order
            ):
                if id(el) not in seen:
                    seen.add(id(el))
                    merged.append(el)
            return merged
        # strings (attribute/text results) lose node identity in this
        # engine: concatenate in branch order (documented subset)
        flat: List = []
        for r in results:
            flat.extend(r)
        return flat
    steps = _parse_xpath_cached(expr)
    nodes: List[Element] = [scope]
    for step in steps:
        if step.name.startswith("@"):
            attr = step.name[1:]
            return [n.attrib[attr] for n in nodes if attr in n.attrib]
        if step.name == "text()":
            out: List[str] = []
            for n in nodes:
                out.extend(c for c in n.children if isinstance(c, str))
            return out
        # explicit axis (following-sibling::p, parent::div, ..) overrides
        # the '/'-vs-'//' axis
        axis, name = step.axis, step.name
        explicit_axis = "::" in name
        if explicit_axis:
            axis, _, name = name.partition("::")
        elif name == "..":
            axis, name = "parent", "*"
        nxt: List[Element] = []
        for n in nodes:
            # Each entry in `groups` is one evaluation context for positional
            # predicates. XPath 1.0: abbreviated `//li[2]` expands to
            # /descendant-or-self::node()/child::li[2] — position is relative
            # to each PARENT's child list (lxml parity); explicit
            # `descendant::li[2]` is position in the full descendant list.
            if axis == "descendant" and not explicit_axis:
                groups = [
                    [c for c in ctx.children if isinstance(c, Element)]
                    for ctx in (n, *n.iterdescendants())
                ]
            elif axis == "descendant":
                groups = [list(n.iterdescendants())]
            elif axis == "child":
                groups = [[c for c in n.children if isinstance(c, Element)]]
            elif axis == "following-sibling":
                sibs = _elem_siblings(n)
                groups = [sibs[sibs.index(n) + 1 :]]
            elif axis == "preceding-sibling":
                # reverse axis: position 1 = nearest preceding (XPath 1.0)
                sibs = _elem_siblings(n)
                groups = [sibs[: sibs.index(n)][::-1]]
            elif axis in ("ancestor", "ancestor-or-self"):
                # reverse axis: position 1 = self (or-self) / nearest
                # ancestor; #document excluded (lxml returns elements only)
                cand = [n] if axis == "ancestor-or-self" else []
                p = n.parent
                while p is not None and p.tag != "#document":
                    cand.append(p)
                    p = p.parent
                groups = [cand]
            elif axis == "following":
                # all elements after n's subtree in document order
                # (flat-array slice; excludes descendants by construction)
                groups = [list(n._nodes[n.end :])]
            elif axis == "preceding":
                # reverse axis, position 1 = nearest preceding; excludes
                # ancestors (their subtree extent spans n.order)
                groups = [
                    [
                        m
                        for m in n._nodes[: n.order][::-1]
                        if m.end <= n.order and m.tag != "#document"
                    ]
                ]
            elif axis == "parent":
                groups = [[n.parent] if n.parent is not None else []]
            elif axis == "self":
                groups = [[n]]
            else:
                raise ValueError(f"unsupported XPath axis: {axis!r} in {expr!r}")
            for cand in groups:
                if name in ("node()", "*"):
                    cur = list(cand)
                else:
                    cur = [el for el in cand if el.tag == name]
                # predicates apply SEQUENTIALLY (XPath 1.0): each filters the
                # node list produced so far; position()/last() are relative to
                # that list per context
                for p in step.preds:
                    tot = len(cur)
                    cur = [
                        el
                        for i, el in enumerate(cur, 1)
                        if _pred_eval(el, p, i, tot)
                    ]
                nxt.extend(cur)
        # dedupe preserving document order (descendant axes can overlap)
        seen = set()
        nodes = []
        for el in sorted(nxt, key=lambda e: e.order):
            if id(el) not in seen:
                seen.add(id(el))
                nodes.append(el)
    return nodes


# ---------------------------------------------------------------------------
# Unified selector dispatch (reference: lxml_scraper.py:181-199)
# ---------------------------------------------------------------------------

def select(scope: Element, selector_type: str, selector_str: str) -> List[Element]:
    """Evaluate a typed selector relative to ``scope``; elements only.

    ``selector_type`` ∈ {any, css, xpath, text, regex} (rule.py:6-11);
    ANY is treated as CSS (lxml_scraper.py:184 "assume CSS").
    """
    t = selector_type.lower()
    if t in ("any", "css"):
        return css_select(scope, selector_str)
    if t == "xpath":
        res = xpath_select(scope, selector_str)
        return [r for r in res if isinstance(r, Element)]
    if t == "text":
        needle = selector_str
        return [
            el for el in scope.iterdescendants() if needle in el.first_text()
        ]
    if t == "regex":
        pat = re.compile(selector_str, re.IGNORECASE)
        return [
            el for el in scope.iterdescendants() if pat.search(el.first_text())
        ]
    raise ValueError(f"unknown selector type: {selector_type!r}")
