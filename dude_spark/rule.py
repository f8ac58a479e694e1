"""Rule / Selector model — the engine's logical-plan nodes.

Mirrors the reference's ``dude/rule.py`` semantics exactly (Selector typing
``rule.py:6-11``, ``to_str`` ordering key ``rule.py:21-37,56-57``, Rule tuple
``rule.py:60-67``, ``rule_sorter``/``rule_grouper``/``rule_filter``
``rule.py:70-86``) but as plain serializable dataclasses so rules can be
broadcast to Spark executors and compiled into the extraction pandas UDF.
"""

from __future__ import annotations

import fnmatch
import re
from dataclasses import dataclass, field
from typing import Callable, Optional, Tuple, Union

__all__ = ["Selector", "RuleSpec", "rule_sorter", "rule_grouper", "rule_filter"]

_PREFIX = re.compile(r"^(css|xpath|text)=(.*)$", re.DOTALL)
_REGEX_FORM = re.compile(r"^text=/(.*)/i?$", re.DOTALL)

# Field precedence and typed-string templates. The TEMPLATE OUTPUTS
# ('css=...', 'xpath=...', 'text=...', 'text=/.../i') are the reference's
# rule-ordering sort keys (dude/rule.py:21-37, 56-57) and must stay
# byte-identical to reproduce E6 rule ordering; the code around them is
# restated field-table style rather than the reference's if-chains.
_FIELDS = ("selector", "css", "xpath", "text", "regex")
_TYPED = {"css": "css={}", "xpath": "xpath={}", "text": "text={}", "regex": "text=/{}/i"}


@dataclass(frozen=True)
class Selector:
    """Exactly one of the fields is set (reference ``rule.py:14-57``)."""

    selector: Optional[str] = None
    css: Optional[str] = None
    xpath: Optional[str] = None
    text: Optional[str] = None
    regex: Optional[str] = None

    @staticmethod
    def parse(s: str) -> "Selector":
        """Parse the prefixed string form (``css=...`` / ``xpath=...`` /
        ``text=...`` / ``text=/regex/i`` — reference ``rule.py:21-32``)."""
        m = _REGEX_FORM.match(s)
        if m:
            return Selector(regex=m.group(1))
        m = _PREFIX.match(s)
        if m:
            return Selector(**{m.group(1): m.group(2)})
        return Selector(selector=s)

    def _first(self) -> tuple:
        """(field_name, value) of the first truthy field in precedence
        order, else (None, None)."""
        for name in _FIELDS:
            v = getattr(self, name)
            if v:
                return name, v
        return None, None

    def to_str(self, with_type: bool = False) -> str:
        name, value = self._first()
        if not with_type or self.selector:
            assert value is not None
            return value
        if name in _TYPED:
            return _TYPED[name].format(value)
        return _TYPED["regex"].format(self.regex)

    def selector_type(self) -> str:
        name, _ = self._first()
        if name is None:
            raise ValueError("No selector specified.")
        return "any" if name == "selector" else name

    def __bool__(self) -> bool:
        return self._first()[1] is not None

    def __str__(self) -> str:
        return self._first()[1] or ""

    def __lt__(self, other: "Selector") -> bool:
        return self.to_str(with_type=True) < other.to_str(with_type=True)


@dataclass(frozen=True)
class RuleSpec:
    """Serializable rule (reference ``Rule`` NamedTuple ``rule.py:60-67``).

    ``handler`` is any picklable callable ``element -> dict | generator``;
    declarative kernels live in :mod:`dude_spark.kernels`.
    """

    group: Selector
    selector: Selector
    url_matcher: Union[str, Callable] = "*"
    handler: Optional[Callable] = None
    handler_name: str = ""
    setup: bool = False
    navigate: bool = False
    priority: int = 100

    def replace_group(self, group: Selector) -> "RuleSpec":
        return RuleSpec(
            group=group,
            selector=self.selector,
            url_matcher=self.url_matcher,
            handler=self.handler,
            handler_name=self.handler_name,
            setup=self.setup,
            navigate=self.navigate,
            priority=self.priority,
        )


def rule_sorter(rule: RuleSpec) -> Tuple[str, str]:
    """Reference ``rule_sorter`` (``rule.py:70-71``) via ``Selector.__lt__``
    keys (``rule.py:56-57``): sort by typed selector strings."""
    return rule.group.to_str(with_type=True), rule.selector.to_str(with_type=True)


def rule_grouper(rule: RuleSpec) -> Selector:
    return rule.group


def rule_filter(url: str, setup: bool = False, navigate: bool = False) -> Callable:
    """Reference ``rule_filter`` (``rule.py:78-86``): fnmatch glob or callable."""

    def wrapper(rule: RuleSpec) -> bool:
        if rule.setup is not setup or rule.navigate is not navigate:
            return False
        m = rule.url_matcher
        return bool(m(url)) if callable(m) else fnmatch.fnmatch(url, m)

    return wrapper
