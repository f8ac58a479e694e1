"""Declarative extraction kernels — picklable handler factories.

In the reference, handlers are arbitrary user functions ``element -> dict``
(``dude/base.py:532-563``). These factories cover every extraction pattern in
the reference's tests and examples (``tests/test_bs4.py:25-43``: text_content,
attribute, empty; ``tests/conftest.py:138-169``: generator) as named,
serializable callables so the compiled plan ships cleanly to executors.
Arbitrary user callables remain fully supported — anything picklable works.
"""

from __future__ import annotations

import re
from functools import partial
from typing import Callable, Dict

from .dom import Element


def _text(key: str, element: Element) -> Dict[str, str]:
    return {key: element.text_content()}


def _first_text(key: str, element: Element) -> Dict[str, str]:
    return {key: element.first_text()}


def _attr(key: str, name: str, element: Element):
    v = element.get(name)
    return {key: v} if v is not None else {}


def _regex_group(key: str, pattern: str, group: int, element: Element) -> Dict[str, str]:
    m = re.search(pattern, element.text_content())
    return {key: m.group(group)} if m else {}


def _empty(element: Element) -> Dict[str, str]:
    """Reference empty-handler fixture: falsy result → row dropped
    (``base.py:553-554``, ``tests/test_bs4.py:31-33``)."""
    return {}


def _gen_texts(key: str, element: Element):
    """Generator handler: one row per direct text fragment, element_index
    re-numbered 0..n (``base.py:541-551``)."""
    for frag in (c for c in element.children if isinstance(c, str)):
        s = frag.strip()
        if s:
            yield {key: s}


def text(key: str) -> Callable:
    return partial(_text, key)


def first_text(key: str) -> Callable:
    return partial(_first_text, key)


def attr(key: str, name: str) -> Callable:
    return partial(_attr, key, name)


def regex_group(key: str, pattern: str, group: int = 0) -> Callable:
    return partial(_regex_group, key, pattern, group)


def empty() -> Callable:
    return _empty


def gen_texts(key: str) -> Callable:
    return partial(_gen_texts, key)
