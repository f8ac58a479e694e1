"""Save-rule registry + built-in sinks (S7-S11, ``dude/storage.py``).

Semantics pinned to the reference dispatcher (``dude/base.py:624-666``):
output-file extension **overrides** the format (``:626-627``); unknown format
→ ``KeyError``; sink returning falsy → raise; empty data → skip. Built-ins:
json / csv (union of keys across rows, sorted headers —
``storage.py:70-82``) / yaml.

Two operating modes per sink:

- **single-file** (reference-parity): flattened rows collected to the driver
  and written byte-compatibly with the reference's ``storage.py``. Only for
  small exports — guarded by ``max_driver_rows``.
- **distributed**: ``DataFrameWriter`` append of the flattened table
  (parquet/json/csv directory) — the 100 TB path; per-page (= per-round)
  saves are directory appends.
"""

from __future__ import annotations

import csv as _csv
import json as _json
import logging
import sys
from pathlib import Path
from typing import Callable, Dict, List, Optional, Tuple

from pyspark.sql import DataFrame

logger = logging.getLogger(__name__)


# -- reference-compatible row sinks (dude/storage.py:8-90) -------------------

def _table_headers(data: List[dict]) -> List[str]:
    headers: set = set()
    for item in data:
        headers.update(item.keys())
    return sorted(headers)


def save_json(data: List[dict], output: Optional[str]) -> bool:
    if output is not None:
        with open(output, "w") as f:
            _json.dump(data, f, indent=2, default=str)
        logger.info("Data saved to %s", output)
    else:
        _json.dump(data, sys.stdout, indent=2, default=str)
    return True


def save_csv(data: List[dict], output: Optional[str]) -> bool:
    headers = _table_headers(data)
    if output is not None:
        with open(output, "w", newline="") as f:
            writer = _csv.DictWriter(f, fieldnames=headers)
            writer.writeheader()
            writer.writerows(data)
        logger.info("Data saved to %s", output)
    else:
        writer = _csv.DictWriter(sys.stdout, fieldnames=headers)
        writer.writeheader()
        writer.writerows(data)
    return True


def save_yaml(data: List[dict], output: Optional[str]) -> bool:
    import yaml

    if output is not None:
        with open(output, "w") as f:
            yaml.safe_dump(data, f, sort_keys=False)
        logger.info("Data saved to %s", output)
    else:
        yaml.safe_dump(data, sys.stdout, sort_keys=False)
    return True


BUILTIN_SINKS: Dict[Tuple[str, bool], Callable] = {}
for fmt, fn in (("json", save_json), ("csv", save_csv), ("yml", save_yaml), ("yaml", save_yaml)):
    BUILTIN_SINKS[(fmt, False)] = fn
    BUILTIN_SINKS[(fmt, True)] = fn


def flattened_to_rows(flattened: DataFrame, max_driver_rows: int = 200_000) -> List[dict]:
    """Flattened DF → list of reference-shaped dicts (meta + merged data)."""
    n = flattened.count()
    if n > max_driver_rows:
        raise ValueError(
            f"single-file sink on {n} rows exceeds max_driver_rows="
            f"{max_driver_rows}; use save_distributed()"
        )
    rows = []
    for r in flattened.collect():
        d = {
            "_page_number": r["_page_number"],
            "_page_url": r["_page_url"],
            "_group_id": r["_group_id"],
            "_group_index": r["_group_index"],
            "_element_index": r["_element_index"],
        }
        d.update(r["data"] or {})
        rows.append(d)
    return rows


def dispatch_save(
    flattened: DataFrame,
    format: str = "json",
    output: Optional[str] = None,
    save_per_page: bool = False,
    save_rules: Optional[Dict[Tuple[str, bool], Callable]] = None,
) -> None:
    """Reference ``_save`` (``base.py:624-666``): extension override, KeyError
    on unknown format, raise on sink failure, skip on empty."""
    if output:
        extension = Path(output).suffix.lower()[1:]
        format = extension
    registry = dict(BUILTIN_SINKS)
    registry.update(save_rules or {})
    handler = registry[format, save_per_page]  # KeyError propagates (test_playwright_sync.py:269-273)
    data = flattened_to_rows(flattened)
    if not len(data):
        logger.info("No data was scraped. Skipped saving.")
        return
    if not handler(data, output):
        raise Exception("Failed to save output %s." % {"output": output, "format": format})


def resolve_sink(
    format: str,
    output: Optional[str],
    save_per_page: bool = False,
    save_rules: Optional[Dict[Tuple[str, bool], Callable]] = None,
) -> Tuple[str, str]:
    """Dispatch decision only (no save): → (resolved_format, handler_name).

    Pins the reference's dispatch semantics (``base.py:624-666``) as data:
    the output-file extension OVERRIDES the requested format
    (``base.py:626-627``), custom ``@save`` rules shadow built-ins for their
    (format, is_per_page) key, and an unknown key resolves to ``'KeyError'``
    (``tests/test_playwright_sync.py:269-273``).
    """
    if output:
        format = Path(output).suffix.lower()[1:]
    registry = dict(BUILTIN_SINKS)
    registry.update(save_rules or {})
    try:
        handler = registry[format, save_per_page]
    except KeyError:
        return format, "KeyError"
    return format, getattr(handler, "__name__", "handler")


def save_distributed(
    flattened: DataFrame, output_dir: str, format: str = "parquet", mode: str = "append"
) -> None:
    """The scale path: directory append of the flattened table (per-round
    micro-batch ≙ reference save_per_page, ``base.py:125-139``)."""
    w = flattened.write.mode(mode)
    if format == "csv":
        from .flatten import pivot_data

        pivot_data(flattened).write.mode(mode).option("header", True).csv(output_dir)
    elif format == "json":
        w.json(output_dir)
    else:
        w.parquet(output_dir)
